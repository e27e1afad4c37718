"""Loss-stack golden tests + NaN regressions."""

import jax
import jax.numpy as jnp
import numpy as np

from spurfies_tpu.config import LossConfig
from spurfies_tpu.model.losses import (
    eikonal_loss,
    mask_bce_loss,
    rgb_loss,
    total_loss,
)


class TestEikonal:
    def test_unit_gradients_zero(self):
        g = jnp.zeros((4, 3)).at[:, 0].set(1.0)
        valid = jnp.ones(4, dtype=bool)
        np.testing.assert_allclose(float(eikonal_loss(g, valid)), 0.0,
                                   atol=1e-7)

    def test_value(self):
        g = jnp.zeros((2, 3)).at[:, 0].set(2.0)
        valid = jnp.ones(2, dtype=bool)
        np.testing.assert_allclose(float(eikonal_loss(g, valid)), 1.0,
                                   rtol=1e-6)

    def test_masked(self):
        g = jnp.stack([jnp.asarray([1.0, 0, 0]), jnp.asarray([5.0, 0, 0])])
        valid = jnp.asarray([True, False])
        np.testing.assert_allclose(float(eikonal_loss(g, valid)), 0.0,
                                   atol=1e-7)

    def test_zero_grad_rows_backward_finite(self):
        """Regression: invalid rows with exactly-zero gradients must not
        produce NaN in the backward pass (norm-at-zero)."""
        def f(x):
            g = jnp.stack([x, jnp.zeros(3)])
            valid = jnp.asarray([True, False])
            return eikonal_loss(g, valid)

        grad = jax.grad(f)(jnp.asarray([0.5, 0.5, 0.0]))
        assert np.all(np.isfinite(np.asarray(grad)))

        # even an all-invalid batch stays finite
        def f2(x):
            g = jnp.stack([x * 0.0, jnp.zeros(3)])
            return eikonal_loss(g, jnp.asarray([False, False]))

        grad2 = jax.grad(f2)(jnp.asarray([1.0, 2.0, 3.0]))
        assert np.all(np.isfinite(np.asarray(grad2)))


class TestMaskBCE:
    def test_perfect_prediction(self):
        w = jnp.asarray([[0.999], [0.001]])
        gt = jnp.asarray([[1.0], [0.0]])
        v = float(mask_bce_loss(w, gt))
        assert v < 0.01

    def test_clip_saturation_finite(self):
        w = jnp.asarray([[0.0], [1.0]])
        gt = jnp.asarray([[1.0], [0.0]])
        assert np.isfinite(float(mask_bce_loss(w, gt)))


class TestTotal:
    def test_weighting(self):
        cfg = LossConfig()
        outputs = {
            "rgb_values": jnp.zeros((4, 3)),
            "grad_theta": jnp.zeros((4, 2, 3)).at[..., 0].set(1.0),
            "valid_pt": jnp.ones((4, 2), dtype=bool),
            "weights": jnp.full((4, 2), 0.499),
            "tv_loss": jnp.asarray(2.0),
            "pseudo_pts_loss": jnp.asarray(3.0),
            "local_loss": jnp.asarray(4.0),
        }
        gt = {
            "rgb": jnp.zeros((4, 3)),
            "mask": jnp.ones((4, 3)),
        }
        loss, parts = total_loss(outputs, gt, cfg)
        # rgb 0, eik 0; tv 0.01*2; pseudo 0.5*3; local 0.5*4
        expected = 0.02 + 1.5 + 2.0 + float(parts["mask_loss"])
        np.testing.assert_allclose(float(loss), expected, rtol=1e-5)

    def test_rgb_kinds(self):
        a = jnp.zeros((2, 3))
        b = jnp.full((2, 3), 0.5)
        np.testing.assert_allclose(float(rgb_loss(a, b, "l1")), 0.5)
        np.testing.assert_allclose(float(rgb_loss(a, b, "mse")), 0.25)
