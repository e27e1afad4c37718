"""Eval-render throughput at DTU-like shapes (TPU), with an eval_iters
ablation: the reference evaluates NVS with the full 5-iteration
error-bound sampler (conf max_total_iters, ray_sampler.py:357); fewer
iterations only coarsen quadrature, so a quality-gated reduced-iteration
eval mode is a legitimate speed knob (VERDICT r2 #7).

    python scripts/bench_eval.py [--res 384 512] [--iters 5 3 2 1]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, nargs=2, default=(384, 512))
    ap.add_argument("--iters", type=int, nargs="+", default=(5, 3, 2, 1))
    ap.add_argument("--steps", type=int, default=300,
                    help="train steps before timing eval (sampling "
                    "patterns converge)")
    args = ap.parse_args()

    from spurfies_tpu.config import Config, ModelConfig, TrainConfig
    from spurfies_tpu.data.synthetic import make_synthetic_scene
    from spurfies_tpu.train.trainer import Trainer, make_render_fn

    print(f"devices: {jax.devices()}", flush=True)
    h, w = args.res
    pts, cols, views = make_synthetic_scene(n_points=8000, n_views=3,
                                            img_res=(h, w))
    cfg = Config(model=ModelConfig(),
                 train=TrainConfig(num_pixels=1024, fast_iters=1))
    trainer = Trainer(cfg, pts, cols, views)
    trainer.run(args.steps, window=50)
    float(trainer.state.params["beta"])

    uv = jnp.asarray(views["uv"])
    pose = jnp.asarray(views["pose"][0])
    intr = jnp.asarray(views["intrinsics"][0])
    gt = np.asarray(views["rgb"][0]).reshape(h, w, 3)
    key = jax.random.PRNGKey(0)
    tp = trainer.state.params

    ref_rgb = None
    for it in args.iters:
        render = make_render_fn(cfg, iters=it)
        out = render(tp, trainer.scene, trainer.frozen, uv, pose, intr, key)
        float(jnp.sum(out["rgb_values"]))          # compile + warm
        t0 = time.perf_counter()
        out = render(tp, trainer.scene, trainer.frozen, uv, pose, intr, key)
        rgb = np.asarray(out["rgb_values"]).reshape(h, w, 3)
        dt = time.perf_counter() - t0
        rays_s = h * w / dt
        mask = np.asarray(out["ray_mask"]).reshape(h, w)
        mse = float(np.mean((rgb[mask] - gt[mask]) ** 2)) if mask.any() else 0
        psnr = -10 * np.log10(max(mse, 1e-12))
        if ref_rgb is None:
            ref_rgb = rgb
            drift = 0.0
        else:
            drift = float(np.abs(rgb - ref_rgb)[mask].mean())
        print(f"eval_iters={it}: {dt * 1e3:8.1f} ms  {rays_s:9.0f} rays/s  "
              f"masked_psnr={psnr:.2f}  "
              f"L1_vs_iters{args.iters[0]}={drift:.5f}", flush=True)


if __name__ == "__main__":
    main()
