"""Measure the per-ray valid shading-column distribution at bench shapes.

max_shading_pts (S=80, reference config) sets the static width of the
pair grid that the SDF/color kernels and scatters run over; columns past
a ray's last valid sample are masked filler.  If the p99 valid count is
well under 80, a scene-adaptive S cap cuts the hot-path work
proportionally with reference-identical truncation semantics (the
reference also truncates, just at 80).

    python scripts/micro_scols.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from spurfies_tpu.config import Config, ModelConfig, TrainConfig
    from spurfies_tpu.data.synthetic import (make_dust3r_like_scene,
                                             make_synthetic_scene)
    from spurfies_tpu.train.trainer import Trainer

    print(f"devices: {jax.devices()}", flush=True)
    for name, scene in [
        ("sphere8k", make_synthetic_scene(n_points=8000, n_views=3,
                                          img_res=(192, 256))),
        ("dust3r", make_dust3r_like_scene()),
    ]:
        cfg = Config(model=ModelConfig(),
                     train=TrainConfig(num_pixels=1024, fast_iters=1))
        trainer = Trainer(cfg, *scene)
        # warm the latents a little so the sampler concentrates as in
        # real training, then inspect the render-path column validity
        trainer.run(200, window=50)

        from spurfies_tpu.model.renderer import render_rays

        counts = []
        for s in range(8):
            key = jax.random.PRNGKey(100 + s)
            views = trainer.views
            n_views, n_pix_total = views["rgb"].shape[0], views["rgb"].shape[1]
            kv, kp = jax.random.split(key)
            vi = jax.random.randint(kv, (), 0, n_views)
            pix = jax.random.choice(kp, n_pix_total, (1024,), replace=False)
            h = int(np.sqrt(n_pix_total))
            uv = jnp.stack([pix % (n_pix_total // h), pix // (n_pix_total // h)],
                           -1).astype(jnp.float32)
            inputs = {
                "uv": uv[None],
                "pose": views["pose"][vi][None],
                "intrinsics": views["intrinsics"][vi][None],
            }
            params = {"frozen": trainer.frozen, "train": trainer.state.params}
            out = render_rays(params, trainer.scene, inputs, key, cfg.model,
                              train=True, iters=1)
            # columns with >=1 valid neighbor, per ray
            v = np.asarray(jnp.sum(out["valid_pt"], axis=-1))
            counts.append(v)
        c = np.concatenate(counts)
        hit = c[c > 0]
        print(f"{name:9s} rays={c.size} hit={hit.size} "
              f"mean={hit.mean():.1f} p50={np.percentile(hit, 50):.0f} "
              f"p90={np.percentile(hit, 90):.0f} "
              f"p99={np.percentile(hit, 99):.0f} max={hit.max()}",
              flush=True)


if __name__ == "__main__":
    main()
