"""A/B step timing: occ_compact off vs on, at bench.py shapes, on TPU.

    python scripts/ab_occ_compact.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _sync(x):
    return float(jnp.sum(x).astype(jnp.float32))


def time_variant(occ, pts, cols, views):
    from spurfies_tpu.config import Config, ModelConfig, TrainConfig
    from spurfies_tpu.train.trainer import Trainer

    cfg = Config(model=ModelConfig(occ_compact=occ),
                 train=TrainConfig(num_pixels=1024, fast_iters=1))
    trainer = Trainer(cfg, pts, cols, views)
    trainer.run(300, window=50)
    _sync(trainer.state.params["beta"])
    t0 = time.perf_counter()
    trainer.run(200, window=50)
    _sync(trainer.state.params["beta"])
    dt = (time.perf_counter() - t0) / 200 * 1e3
    # quality proxy: final loss over a fixed probe batch is noisy; report
    # rays/s only — quality gate runs separately via validate_pipeline.
    return dt


def main():
    from spurfies_tpu.data.synthetic import (
        make_dust3r_like_scene, make_synthetic_scene)

    print(f"devices: {jax.devices()}", flush=True)
    d = make_dust3r_like_scene()
    s = make_synthetic_scene(n_points=8000, n_views=3, img_res=(192, 256))
    for name, scene in [("sphere8k", s), ("dust3r", d)]:
        for occ in (False, True):
            ms = time_variant(occ, *scene)
            print(f"{name} occ_compact={occ}: {ms:.2f} ms/step "
                  f"({1024 / ms * 1e3:.0f} rays/s)", flush=True)


if __name__ == "__main__":
    main()
