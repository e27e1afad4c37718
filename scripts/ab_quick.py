"""Quick single-scene step-timing A/B (dust3r bench scene only).

    python scripts/ab_quick.py [name=ov1,ov2 ...]

Each variant reuses the process-wide compilation cache; ~3 min/variant.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    from spurfies_tpu.config import (Config, ModelConfig, TrainConfig,
                                     apply_overrides)
    from spurfies_tpu.data.synthetic import make_dust3r_like_scene
    from spurfies_tpu.train.trainer import Trainer

    variants = []
    for arg in sys.argv[1:]:
        name, _, ovs = arg.partition("=")
        variants.append((name, [o for o in ovs.split(",") if o]))
    if not variants:
        variants = [("base", [])]

    pts, cols, views = make_dust3r_like_scene()
    for name, ovs in variants:
        cfg = Config(model=ModelConfig(),
                     train=TrainConfig(num_pixels=1024, fast_iters=1))
        if ovs:
            cfg = apply_overrides(cfg, ovs)
        trainer = Trainer(cfg, pts, cols, views)
        trainer.run(300, window=50)
        float(jnp.sum(trainer.state.params["beta"]))
        t0 = time.perf_counter()
        trainer.run(200, window=50)
        float(jnp.sum(trainer.state.params["beta"]))
        ms = (time.perf_counter() - t0) / 200 * 1e3
        print(f"dust3r {name:<24} {ms:6.2f} ms/step "
              f"({cfg.train.num_pixels / ms * 1e3:8.0f} rays/s)", flush=True)


if __name__ == "__main__":
    main()
