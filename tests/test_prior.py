"""Local-geometry-prior pretraining tests."""

import numpy as np
import pytest

from spurfies_tpu.prior.shapes import random_shape_sdf, sample_shape


class TestShapes:
    def test_surface_samples_on_surface(self, rng):
        sh = sample_shape(rng, n_surface=500, n_query=500, spacing=0.05)
        assert len(sh["surface"]) > 20
        assert sh["query"].shape == (500, 3)

    def test_query_sdf_signs(self, rng):
        # queries straddle the surface: both signs present
        sh = sample_shape(rng, n_surface=500, n_query=2000, spacing=0.05)
        assert (sh["query_sdf"] > 0).any()
        assert (sh["query_sdf"] < 0).any()
        # near-surface sampling: sdf magnitudes are small
        assert np.percentile(np.abs(sh["query_sdf"]), 90) < 0.15

    def test_sdf_fn_metric_property(self, rng):
        """|sdf(a) - sdf(b)| <= |a - b| (1-Lipschitz for true SDFs)."""
        for _ in range(5):
            f, _ = random_shape_sdf(rng)
            a = rng.uniform(-0.8, 0.8, (200, 3))
            b = a + rng.normal(0, 0.05, (200, 3))
            lhs = np.abs(f(a) - f(b))
            rhs = np.linalg.norm(a - b, axis=-1)
            assert np.all(lhs <= rhs + 5e-3)


@pytest.mark.slow
def test_pretrain_learns_sdf():
    """Short pretraining run must drive SDF L1 well below its start."""
    from spurfies_tpu.prior.pretrain import PriorConfig, pretrain

    cfg = PriorConfig(
        n_shapes=4, n_surface_cap=1024, n_query=2048, batch_queries=512,
        spacing=0.04, steps=400, seed=0,
    )
    params, history = pretrain(cfg, log_every=100)
    assert len(history) == 4
    first, last = history[0], history[-1]
    assert last["coverage"] > 0.3
    assert last["sdf_l1"] < first["sdf_l1"]
    assert last["sdf_l1"] < 0.05, f"prior did not learn: {history}"


@pytest.mark.slow
def test_prior_save_load_roundtrip(tmp_path):
    import jax
    from spurfies_tpu.prior.pretrain import (
        PriorConfig,
        init_prior_params,
        load_prior,
        save_prior,
    )

    params = init_prior_params(jax.random.PRNGKey(0), PriorConfig())
    path = str(tmp_path / "prior")
    save_prior(path, params)
    dec = load_prior(path)
    np.testing.assert_allclose(
        np.asarray(dec["F_geometry"][0]["w"]),
        np.asarray(params["decoder"]["F_geometry"][0]["w"]),
    )
