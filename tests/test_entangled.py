"""Legacy entangled-latent ablation model (reference pointneus.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spurfies_tpu.config import (
    Config,
    ModelConfig,
    SamplerConfig,
    TrainConfig,
)
from spurfies_tpu.core.embedder import encoding_dim
from spurfies_tpu.data.synthetic import make_synthetic_scene
from spurfies_tpu.model import field
from spurfies_tpu.model.networks import init_model_params
from spurfies_tpu.model.neural_points import build_scene
from spurfies_tpu.train.trainer import Trainer

ECFG = ModelConfig(
    entangled=True,
    max_shading_pts=16,
    ray_sampler=SamplerConfig(near=0.5, far=3.0, n_samples=32),
)


def test_param_shapes():
    p = init_model_params(jax.random.PRNGKey(0), ECFG)
    assert p["frozen"] == {}
    assert p["train"]["F"][0]["w"].shape == (64 + encoding_dim(4, 3), 256)
    assert p["train"]["T"][0]["w"].shape == (256, 1)
    assert p["train"]["R"][0]["w"].shape == (256 + encoding_dim(6, 3), 256)


def test_inverse_distance_weights():
    x_pi = jnp.asarray([[[0.01, 0, 0], [0.02, 0, 0]]])
    valid = jnp.ones((1, 2), dtype=bool)
    w, norm = field.inverse_distance_weights(x_pi, valid)
    np.testing.assert_allclose(np.asarray(w[0]), [100.0, 50.0], rtol=1e-4)
    np.testing.assert_allclose(float(norm[0, 0]), 150.0, rtol=1e-4)


def test_single_latent_scene():
    rng = np.random.default_rng(0)
    v = rng.normal(size=(1000, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    pts = (0.5 * v).astype(np.float32)
    scene, latents = build_scene(jax.random.PRNGKey(0), pts, ECFG)
    assert set(latents) == {"feats"}
    assert latents["feats"].shape[1] == 64


@pytest.mark.slow
def test_entangled_e2e():
    cfg = Config(model=ECFG, train=TrainConfig(num_pixels=96, fast_iters=1))
    pts, cols, views = make_synthetic_scene(n_points=2000, n_views=2,
                                            img_res=(32, 32))
    trainer = Trainer(cfg, pts, cols, views)
    metrics = []
    trainer.run(60, window=30, callback=lambda s, m: metrics.append(m))
    assert np.isfinite(metrics[-1]["loss"])
    assert metrics[-1]["rgb_loss"] < metrics[0]["rgb_loss"]
