"""Shipped-prior integration: load artifacts/local_prior into a Trainer."""

import os

import numpy as np
import pytest

PRIOR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts", "local_prior")


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(PRIOR),
                    reason="shipped prior artifact missing")
def test_shipped_prior_loads_and_trains():
    from spurfies_tpu.config import (
        Config, ModelConfig, SamplerConfig, TrainConfig,
    )
    from spurfies_tpu.data.synthetic import make_synthetic_scene
    from spurfies_tpu.prior.pretrain import load_prior
    from spurfies_tpu.train.trainer import Trainer

    cfg = Config(
        model=ModelConfig(
            max_shading_pts=16,
            ray_sampler=SamplerConfig(near=0.5, far=3.0, n_samples=16,
                                      n_samples_eval=32, n_samples_extra=8),
        ),
        train=TrainConfig(num_pixels=96, fast_iters=1),
    )
    pts, cols, views = make_synthetic_scene(n_points=2000, n_views=2,
                                            img_res=(32, 32))
    trainer = Trainer(cfg, pts, cols, views)
    frozen = load_prior(PRIOR)
    assert frozen["F_geometry"][0]["w"].shape == (35, 256)
    trainer.load_frozen(frozen)

    metrics = []
    trainer.run(40, window=20, callback=lambda s, m: metrics.append(m))
    assert np.isfinite(metrics[-1]["loss"])
    assert metrics[-1]["rgb_loss"] < metrics[0]["rgb_loss"] * 1.5
