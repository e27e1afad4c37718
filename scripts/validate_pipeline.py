"""End-to-end quality validation on the analytic sphere scene.

Runs the full pipeline the way a real scene would: pretrained local prior ->
per-scene latent optimization -> mesh extraction -> Chamfer against the
analytic surface + NVS PSNR.  Prints a JSON summary.

    python scripts/validate_pipeline.py [--steps 2000] [--prior artifacts/local_prior]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--prior", default="artifacts/local_prior")
    ap.add_argument("--resolution", type=int, default=128)
    ap.add_argument("--tag", default="", help="echoed into the JSON output")
    ap.add_argument("overrides", nargs="*",
                    help="dotted config overrides, e.g. "
                         "loss.fd_eikonal_weight=0.01")
    args = ap.parse_args()

    import jax
    import numpy as np

    from spurfies_tpu.config import (
        Config,
        ModelConfig,
        TrainConfig,
        apply_overrides,
    )
    from spurfies_tpu.data.synthetic import make_synthetic_scene
    from spurfies_tpu.train.trainer import Trainer

    cfg = Config(
        model=ModelConfig(),
        train=TrainConfig(num_pixels=1024, fast_iters=1),
    )
    if args.overrides:
        cfg = apply_overrides(cfg, args.overrides)
    radius = 0.5
    pts, cols, views = make_synthetic_scene(
        n_points=8000, n_views=3, img_res=(128, 128), radius=radius
    )
    trainer = Trainer(cfg, pts, cols, views)

    if os.path.isdir(args.prior):
        from spurfies_tpu.prior.pretrain import load_prior
        trainer.load_frozen(load_prior(os.path.abspath(args.prior)))
        prior = "pretrained"
    else:
        prior = "random"

    t0 = time.perf_counter()
    losses = []
    trainer.run(args.steps, window=min(500, args.steps),
                callback=lambda s, m: losses.append(
                    (s, float(m["rgb_loss"]), float(m["psnr"]))
                ))
    jax.block_until_ready(trainer.state.params)
    train_time = time.perf_counter() - t0

    # mesh + chamfer vs analytic sphere
    from spurfies_tpu.eval.mesh_extract import extract_mesh
    from spurfies_tpu.model import field

    def sdf_fn(x):
        import jax.numpy as jnp
        return field.sdf_probe(
            trainer.frozen, trainer.state.params["feats_geometry"],
            trainer.scene, jnp.asarray(x), cfg.model.k, cfg.model.r,
            cfg.model.rbf,
        )

    verts, faces = extract_mesh(
        sdf_fn, [-0.8, -0.8, -0.8], [0.8, 0.8, 0.8],
        resolution=args.resolution,
    )
    if len(verts):
        r = np.linalg.norm(verts, axis=-1)
        mesh_err = float(np.mean(np.abs(r - radius)))
        mesh_bias = float(np.mean(r - radius))   # signed: offset vs shell
    else:
        mesh_err = mesh_bias = float("nan")

    # auto-calibrated iso level (pseudo-loss depth-skew debias)
    from spurfies_tpu.eval.mesh_extract import calibrate_iso_level
    iso = calibrate_iso_level(trainer.scene.points, sdf_fn)
    verts_c, _ = extract_mesh(
        sdf_fn, [-0.8, -0.8, -0.8], [0.8, 0.8, 0.8],
        resolution=args.resolution, level=iso,
    )
    if len(verts_c):
        rc = np.linalg.norm(verts_c, axis=-1)
        mesh_err_cal = float(np.mean(np.abs(rc - radius)))
        mesh_bias_cal = float(np.mean(rc - radius))
    else:
        mesh_err_cal = mesh_bias_cal = float("nan")

    # NVS on train view 0
    h = w = 128
    out = trainer.render_image(
        trainer.state.params, np.asarray(trainer.views["uv"]),
        trainer.views["pose"][0], trainer.views["intrinsics"][0],
        jax.random.PRNGKey(0),
    )
    pred = out["rgb_values"].reshape(h, w, 3)
    gt = np.asarray(views["rgb"][0]).reshape(h, w, 3)
    mask = np.asarray(views["mask"][0]).reshape(h, w, 1) > 0.5
    mse = float(np.mean(((pred - gt) ** 2)[np.repeat(mask, 3, -1)]))
    psnr = -10 * np.log10(mse + 1e-12)

    print(json.dumps({
        "tag": args.tag,
        "prior": prior,
        "steps": args.steps,
        "train_time_s": round(train_time, 1),
        "rays_per_sec": round(args.steps * 1024 / train_time, 0),
        "final_rgb_loss": losses[-1][1] if losses else None,
        "mesh_verts": int(len(verts)),
        "mesh_mean_radius_err": round(mesh_err, 5),
        "mesh_signed_bias": round(mesh_bias, 5),
        "auto_iso_level": round(iso, 5),
        "mesh_err_auto_iso": round(mesh_err_cal, 5),
        "mesh_bias_auto_iso": round(mesh_bias_cal, 5),
        "masked_psnr": round(psnr, 2),
    }, indent=2))


if __name__ == "__main__":
    main()
