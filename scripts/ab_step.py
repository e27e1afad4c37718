"""Step-timing A/B across config variants, at bench scenes, on TPU.

Each variant is a named set of dotted overrides on the bench config
(1024 rays, fast=1, k=8).  Reports ms/step and rays/s per scene.  Quality
is NOT measured here — gate separately with validate_pipeline (PSNR is
noisy at 2k steps; use rgb-L1 + mesh err, NOTES_ROUND2).

    python scripts/ab_step.py                  # default round-3 variants
    python scripts/ab_step.py k4=model.k=4 big=train.num_pixels=4096
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

DEFAULT_VARIANTS = [
    ("base", []),
    ("k4", ["model.k=4"]),
    ("k4_occ", ["model.k=4", "model.occ_compact=true"]),
    ("rays4096", ["train.num_pixels=4096"]),
    ("rays4096_k4", ["train.num_pixels=4096", "model.k=4"]),
]


def _sync(x):
    return float(jnp.sum(x).astype(jnp.float32))


def time_variant(overrides, pts, cols, views):
    from spurfies_tpu.config import (Config, ModelConfig, TrainConfig,
                                     apply_overrides)
    from spurfies_tpu.train.trainer import Trainer

    cfg = Config(model=ModelConfig(),
                 train=TrainConfig(num_pixels=1024, fast_iters=1))
    if overrides:
        cfg = apply_overrides(cfg, overrides)
    trainer = Trainer(cfg, pts, cols, views)
    trainer.run(300, window=50)
    _sync(trainer.state.params["beta"])
    t0 = time.perf_counter()
    trainer.run(200, window=50)
    _sync(trainer.state.params["beta"])
    ms = (time.perf_counter() - t0) / 200 * 1e3
    return ms, cfg.train.num_pixels


def main():
    variants = DEFAULT_VARIANTS
    if len(sys.argv) > 1:
        variants = []
        for arg in sys.argv[1:]:
            name, _, ovr = arg.partition("=")
            variants.append((name, ovr.split(",") if ovr else []))

    from spurfies_tpu.data.synthetic import (make_dust3r_like_scene,
                                             make_synthetic_scene)

    print(f"devices: {jax.devices()}", flush=True)
    d = make_dust3r_like_scene()
    s = make_synthetic_scene(n_points=8000, n_views=3, img_res=(192, 256))
    for scene_name, scene in [("sphere8k", s), ("dust3r", d)]:
        for name, ovr in variants:
            ms, npix = time_variant(ovr, *scene)
            print(f"{scene_name:9s} {name:14s} {ms:8.2f} ms/step "
                  f"({npix / ms * 1e3:8.0f} rays/s)", flush=True)


if __name__ == "__main__":
    main()
