"""End-to-end acceptance chain at the production budget (VERDICT r4 #7).

Drives the real CLI surfaces — cli/train (100k steps) -> cli/evaluate
--mesh --rendering -> cli/eval_dtu (clean + Chamfer) — on the synthetic
DTU-protocol scene, the closest legal proxy for the reference's
"DTU scan24 Chamfer within 2%" acceptance while real DTU data is absent
from the container (reference protocol: eval_spurfies.py:24-194 +
evals/eval_dtu.py:60-265; budget: config/ours.yaml:7, 100k steps x 1024
rays).

Unlike tests/test_cli_chain.py (a 100-step smoke), this uses the
production knobs: full error-bound sampler, 1024 rays/step, default
model config, 15k checkpoint cadence, mesh at the protocol's 512 grid.

    python scripts/acceptance_chain.py [--steps 100000] \
        [--workdir /tmp/acceptance_r05] [--out artifacts/acceptance_chain_r05.json]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100_000)
    ap.add_argument("--img-res", type=int, nargs=2, default=(192, 256))
    ap.add_argument("--mesh-resolution", type=int, default=512)
    ap.add_argument("--max-views", type=int, default=4)
    ap.add_argument("--workdir", default="/tmp/acceptance_r05")
    ap.add_argument("--out",
                    default=os.path.join(REPO, "artifacts",
                                         "acceptance_chain_r05.json"))
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    os.chdir(args.workdir)
    # the shipped self-pretrained local prior (tests/test_cli_chain.py
    # does the same; without it the SDF has no zero crossing early on)
    if not os.path.exists("artifacts"):
        os.symlink(os.path.join(REPO, "artifacts"), "artifacts")

    h, w = args.img_res
    overrides = [
        "expname=dtu_pn",
        "dataset.data_dir=dtu",
        f"dataset.img_res=[{h},{w}]",
        "dataset.scan_id=24",
        "loss.local_weight=0",        # no vismvsnet ckpt in the container
        f"train.opt_steps={args.steps}",
        "train.num_pixels=1024",
        "train.fast_iters=1",
        "train.render_freq=15000",
        "train.checkpoint_freq=15000",
    ]

    record = {"steps": args.steps, "img_res": [h, w],
              "mesh_resolution": args.mesh_resolution,
              "overrides": overrides, "stages": {}}

    def stage(name, fn):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        record["stages"][name] = {"wall_s": round(dt, 1)}
        print(f"[acceptance] {name}: {dt:.1f}s", flush=True)
        return out

    # ---- fixture (DTU layout incl. GT stl points for Chamfer) ----
    def make_fixture():
        from spurfies_tpu.data.synthetic import export_synthetic_dtu
        export_synthetic_dtu("data", scan_id=24, n_views=49,
                             img_res=(h, w), gt_root="data/dtu_eval")
    stage("fixture", make_fixture)

    # ---- train (production budget) ----
    def train():
        from spurfies_tpu.cli import train as cli_train
        cli_train.main(["--scans", "scan24"] + overrides)
    stage("train", train)

    # ---- evaluate: mesh (protocol 512 grid) + NVS renders/metrics ----
    def evaluate():
        from spurfies_tpu.cli import evaluate as cli_eval
        cli_eval.main(["--scans", "scan24", "--mesh", "--rendering",
                       "--resolution", str(args.mesh_resolution),
                       "--max-views", str(args.max_views)] + overrides)
        with open(os.path.join("results", "dtu_pn_scan24",
                               "summary.json")) as f:
            return json.load(f)
    summary = stage("evaluate", evaluate)
    record["nvs"] = summary["nvs"]
    record["mesh"] = {k: summary["mesh"][k]
                      for k in ("n_verts", "n_faces") if k in summary["mesh"]}

    # ---- DTU Chamfer protocol (clean + distance) ----
    def chamfer():
        from spurfies_tpu.cli import eval_dtu as cli_dtu
        cli_dtu.main(["--scans", "24", "--meshes", "results",
                      "--data-root", "data", "--gt-root", "data/dtu_eval",
                      "--out", "results/chamfer.json"])
        with open("results/chamfer.json") as f:
            return json.load(f)
    cham = stage("chamfer", chamfer)
    record["chamfer"] = cham["per_scan"]["24"]

    record["total_wall_s"] = round(
        sum(s["wall_s"] for s in record["stages"].values()), 1)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1)
    print(f"[acceptance] done -> {args.out}")
    print(json.dumps({k: record[k] for k in ("nvs", "chamfer",
                                             "total_wall_s")}, indent=1))


if __name__ == "__main__":
    main()
