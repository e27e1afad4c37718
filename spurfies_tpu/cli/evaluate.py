"""Evaluation CLI — mesh extraction + NVS metrics.

Reference surface: ``python eval_spurfies.py --conf dtu_pn --scan_ids 24
--eval_mesh --eval_rendering`` (eval_spurfies.py:377-515).

    python -m spurfies_tpu.cli.evaluate --config configs/dtu_pn.yaml \
        --scans scan24 --mesh --rendering [--resolution 512]
"""

import argparse
import json
import os

import numpy as np

from spurfies_tpu.config import Config, apply_overrides, load_yaml
from spurfies_tpu.cli.train import apply_scene_overrides, load_scene_data
from spurfies_tpu.utils.experiment import ExperimentDir, get_logger

log = get_logger()

DEFAULT_SCANS = {
    # eval_spurfies.py:446-452
    "dtu": ["21", "24", "34", "37", "38", "40", "82", "106", "110", "114",
            "118"],
    "mipnerf": ["garden", "stump"],
}


def eval_scene(cfg: Config, scan: str, do_mesh: bool, do_render: bool,
               resolution: int = 512, out_root: str = "results",
               max_views=None, auto_iso: bool = False, eval_ids=None):
    import jax
    from spurfies_tpu.model import field
    from spurfies_tpu.train.trainer import Trainer

    cfg = apply_scene_overrides(cfg, scan)
    sd = load_scene_data(cfg, scan)
    trainer = Trainer(cfg, sd.points, sd.colors, sd.train_views())

    exp = ExperimentDir.latest(cfg.exps_folder, cfg.expname, scan)
    if exp is None:
        raise FileNotFoundError(
            f"no checkpoint for {cfg.expname}_{scan} under {cfg.exps_folder}"
        )
    trainer.restore_checkpoint(exp.checkpoint_path("latest"))
    log.info(f"{scan}: restored step {int(trainer.state.step)}")

    out_dir = os.path.join(out_root, f"{cfg.expname}_{scan}")
    os.makedirs(out_dir, exist_ok=True)
    summary = {"scan": scan, "step": int(trainer.state.step)}

    if do_mesh:
        from spurfies_tpu.eval.mesh_extract import (
            extract_mesh,
            grid_bounds_dtu,
            save_mesh_ply,
        )

        params = {"frozen": trainer.frozen, "train": trainer.state.params}

        def sdf_fn(x):
            import jax.numpy as jnp
            return field.sdf_probe(
                params["frozen"], params["train"]["feats_geometry"],
                trainer.scene, jnp.asarray(x), cfg.model.k, cfg.model.r,
                cfg.model.rbf, need_grad=False,
            )

        bbs_path = os.path.join(cfg.dataset.data_dir_root, "dtu", "bbs.npz")
        if cfg.dataset.data_dir == "dtu" and os.path.exists(bbs_path):
            lo, hi = grid_bounds_dtu(bbs_path, int(scan.replace("scan", "")),
                                     sd.scale_mat)
        elif cfg.dataset.data_dir == "mipnerf":
            from spurfies_tpu.eval.mesh_extract import MIPNERF_BOUNDS
            lo, hi = MIPNERF_BOUNDS[scan]
        else:
            lo = np.asarray(cfg.model.scene_lo)
            hi = np.asarray(cfg.model.scene_hi)

        level = 0.0
        if auto_iso or cfg.eval.auto_iso:
            # extraction-level debias of the pseudo-loss depth skew
            # (see eval/mesh_extract.calibrate_iso_level)
            from spurfies_tpu.eval.mesh_extract import calibrate_iso_level
            level = calibrate_iso_level(trainer.scene.points, sdf_fn)
            summary["auto_iso_level"] = level
            log.info(f"{scan}: auto-calibrated iso level {level:+.4f}")
        verts, faces = extract_mesh(
            sdf_fn, lo, hi, resolution=resolution, scale_mat=sd.scale_mat,
            level=level,
        )
        mesh_path = os.path.join(out_dir, f"mesh_{scan}.ply")
        save_mesh_ply(mesh_path, verts, faces)
        summary["mesh"] = {"path": mesh_path, "n_verts": int(len(verts)),
                           "n_faces": int(len(faces))}
        log.info(f"{scan}: mesh {len(verts)} verts -> {mesh_path}")

    if do_render:
        from spurfies_tpu.eval.lpips_jax import make_lpips_fn
        from spurfies_tpu.eval.nvs import evaluate_views

        lpips_fn = make_lpips_fn()  # None when vgg/lpips weights absent
        if lpips_fn is None:
            log.info(f"{scan}: LPIPS weights not found under ckpt/ — "
                     "reporting PSNR/SSIM only")
        res = evaluate_views(trainer.render_image, trainer.state.params, sd,
                             out_dir=out_dir, lpips_fn=lpips_fn,
                             max_views=max_views, view_ids=eval_ids)
        summary["eval_ids"] = [int(v) for v in res["ids"]]
        summary["nvs"] = {k: res[k] for k in
                          ("mean_psnr", "mean_ssim", "psnr", "ssim")}
        if "mean_lpips" in res:
            summary["nvs"]["lpips"] = res["lpips"]
            summary["nvs"]["mean_lpips"] = res["mean_lpips"]
        log.info(f"{scan}: PSNR {res['mean_psnr']:.2f} "
                 f"SSIM {res['mean_ssim']:.4f}"
                 + (f" LPIPS {res['mean_lpips']:.4f}"
                    if "mean_lpips" in res else ""))

    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    return summary


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--scans", default=None)
    ap.add_argument("--mesh", action="store_true")
    ap.add_argument("--rendering", action="store_true")
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument("--max-views", type=int, default=None,
                    help="cap the number of eval views rendered")
    ap.add_argument("--eval-ids", default=None,
                    help="comma-separated view ids to score (subset of "
                         "the eval split); default = protocol order")
    ap.add_argument("--auto-iso", action="store_true",
                    help="extract at the self-calibrated iso level "
                         "(debiases the pseudo-loss depth skew)")
    ap.add_argument("--out", default="results")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args(argv)

    cfg = load_yaml(args.config) if args.config else Config()
    cfg = apply_overrides(cfg, args.overrides)

    scans = (
        args.scans.split(",") if args.scans
        else DEFAULT_SCANS.get(cfg.dataset.data_dir,
                               [str(cfg.dataset.scan_id)])
    )
    summaries = [
        eval_scene(cfg, s.strip(), args.mesh, args.rendering,
                   args.resolution, args.out, max_views=args.max_views,
                   auto_iso=args.auto_iso,
                   eval_ids=[int(v) for v in args.eval_ids.split(",")]
                   if args.eval_ids else None)
        for s in scans
    ]
    if any("nvs" in s for s in summaries):
        ps = [s["nvs"]["mean_psnr"] for s in summaries if "nvs" in s]
        log.info(f"GLOBAL mean PSNR over {len(ps)} scans: {np.mean(ps):.2f}")


if __name__ == "__main__":
    main()
