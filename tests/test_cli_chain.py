"""Full CLI dress rehearsal on a DTU-format synthetic fixture.

VERDICT r1 #7: run cli/train -> cli/evaluate --mesh --rendering ->
cli/eval_dtu end-to-end on DTU-shaped inputs so the first real-data run
isn't also the first integration test.  Matches the reference protocol
surfaces eval_spurfies.py:24-194 and evals/eval_dtu.py:60-265.
"""

import json
import os

import numpy as np
import pytest

TINY_OVERRIDES = [
    "expname=dtu_pn",
    "dataset.data_dir=dtu",
    "dataset.img_res=[48,64]",
    "dataset.scan_id=24",
    "loss.local_weight=0",            # no MVS ckpt in the fixture
    "model.max_shading_pts=16",
    "model.ray_sampler.near=0.5",
    "model.ray_sampler.far=3.0",
    "model.ray_sampler.n_samples=16",
    "model.ray_sampler.n_samples_eval=32",
    "model.ray_sampler.n_samples_extra=8",
    "model.ray_sampler.max_total_iters=2",
    "train.num_pixels=128",
    "train.fast_iters=1",
    "train.eval_iters=1",             # smoke-chain renders need speed,
    #                                   not sampler convergence
    "train.opt_steps=100",
    "train.render_freq=100",
    "train.checkpoint_freq=100",
]


@pytest.mark.slow
def test_dtu_cli_chain(tmp_path, monkeypatch):
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    monkeypatch.chdir(tmp_path)

    # the shipped pretrained local prior: without it the SDF has no zero
    # crossing after a handful of steps and the mesh is empty
    prior_src = os.path.join(repo_root, "artifacts")
    if os.path.isdir(os.path.join(prior_src, "local_prior")):
        os.symlink(prior_src, "artifacts")

    from spurfies_tpu.data.synthetic import export_synthetic_dtu
    export_synthetic_dtu("data", scan_id=24, n_views=49, img_res=(48, 64),
                         n_points=2000, gt_root="data/dtu_eval")

    # ---- train ----
    from spurfies_tpu.cli import train as cli_train
    cli_train.main(["--scans", "scan24"] + TINY_OVERRIDES)
    assert os.path.isdir("exps")

    # ---- evaluate: mesh + NVS metrics ----
    from spurfies_tpu.cli import evaluate as cli_eval
    cli_eval.main(["--scans", "scan24", "--mesh", "--rendering",
                   "--resolution", "48", "--max-views", "2"]
                  + TINY_OVERRIDES)
    summary_path = os.path.join("results", "dtu_pn_scan24", "summary.json")
    with open(summary_path) as f:
        summary = json.load(f)
    assert summary["mesh"]["n_verts"] > 0
    assert np.isfinite(summary["nvs"]["mean_psnr"])
    assert 0.0 <= summary["nvs"]["mean_ssim"] <= 1.0
    assert len(summary["nvs"]["psnr"]) == 2          # --max-views honored
    mesh_path = summary["mesh"]["path"]
    assert os.path.exists(mesh_path)
    # rendered artifacts on disk (reference eval_XXX.png protocol)
    pngs = [p for p in os.listdir(os.path.dirname(mesh_path))
            if p.startswith("eval_")]
    assert len(pngs) == 2

    # ---- DTU Chamfer protocol ----
    from spurfies_tpu.cli import eval_dtu as cli_dtu
    cli_dtu.main(["--scans", "24", "--meshes", "results",
                  "--data-root", "data", "--gt-root", "data/dtu_eval",
                  "--out", "results/chamfer.json"])
    with open("results/chamfer.json") as f:
        cham = json.load(f)
    overall = cham["per_scan"]["24"]["overall"]
    assert np.isfinite(overall)
    # 20 steps from a random prior won't be accurate; just sanity-bound it
    # (units are the fixture's world units; sphere diameter is 2.0)
    assert 0.0 < overall < 10.0
