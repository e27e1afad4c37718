"""Measure the in-step valid-pair fraction on converged bench scenes.

Calibrates model.pair_budget_frac: the fused pair-MLP runs on every
[R*S, K] slot; this prints how many are actually valid after 300/2000
steps of training (sampling concentrates near the surface as beta anneals,
so the fraction GROWS with convergence — budget from the converged number).

    python scripts/micro_pairs.py [--steps 300]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def frac_for(trainer, cfg, key):
    """Reproduce the step's ray batch -> sampler -> query -> compaction,
    report mean valid fractions over 8 batches."""
    from spurfies_tpu.model.renderer import render_rays

    fracs = []
    ray_fracs = []
    for i in range(8):
        key, k1, k2 = jax.random.split(key, 3)
        views = trainer.views
        total_px = views["uv"].shape[0]
        pix = jax.random.choice(k1, total_px, (cfg.train.num_pixels,),
                                replace=False)
        v = int(jax.random.randint(k2, (), 0, views["rgb"].shape[0]))
        inputs = {
            "uv": views["uv"][pix][None],
            "pose": views["pose"][v][None],
            "intrinsics": views["intrinsics"][v][None],
        }
        params = {"frozen": trainer.frozen, "train": trainer.state.params}
        out = render_rays(params, trainer.scene, inputs, key,
                          cfg.model, train=True, iters=cfg.train.fast_iters)
        nv = np.asarray(out["nbr_valid"])       # [R, S, K]
        fracs.append(nv.mean())
        ray_fracs.append(np.asarray(out["ray_mask"]).mean())
    return float(np.mean(fracs)), float(np.mean(ray_fracs))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    args = ap.parse_args()

    from spurfies_tpu.config import Config, ModelConfig, TrainConfig
    from spurfies_tpu.data.synthetic import (make_dust3r_like_scene,
                                             make_synthetic_scene)
    from spurfies_tpu.train.trainer import Trainer

    for name, scene in [
        ("sphere8k", make_synthetic_scene(n_points=8000, n_views=3,
                                          img_res=(192, 256))),
        ("dust3r", make_dust3r_like_scene()),
    ]:
        cfg = Config(model=ModelConfig(),
                     train=TrainConfig(num_pixels=1024, fast_iters=1))
        trainer = Trainer(cfg, *scene)
        trainer.run(args.steps, window=50)
        f, rf = frac_for(trainer, cfg, jax.random.PRNGKey(5))
        print(f"{name:9s} steps={args.steps}  valid_pair_frac={f:.4f}  "
              f"ray_hit_frac={rf:.4f}", flush=True)


if __name__ == "__main__":
    main()
