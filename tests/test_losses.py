"""Loss-stack golden tests + NaN regressions."""

import jax
import pytest
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


class TestBeyondReferenceLosses:
    """cloud_anchor + fd_eikonal (gated, 0 = reference behavior)."""

    @pytest.fixture(scope="class")
    def scene_setup(self):
        from spurfies_tpu.config import ModelConfig, SamplerConfig
        from spurfies_tpu.model.networks import init_model_params
        from spurfies_tpu.model.neural_points import build_scene
        rng = np.random.default_rng(5)
        v = rng.normal(size=(1500, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        pts = (0.5 * v).astype(np.float32)
        cfg = ModelConfig(
            max_shading_pts=16,
            ray_sampler=SamplerConfig(near=0.5, far=3.0, n_samples=16,
                                      n_samples_eval=32, n_samples_extra=8),
        )
        scene, latents = build_scene(jax.random.PRNGKey(0), pts, cfg,
                                     rng.uniform(0, 255, (1500, 3)))
        params = init_model_params(jax.random.PRNGKey(1), cfg)
        params["train"].update(latents)
        return cfg, scene, params

    def test_cloud_anchor_finite_and_grads(self, scene_setup):
        from spurfies_tpu.model.renderer import cloud_anchor_loss
        cfg, scene, params = scene_setup

        def loss(geo):
            p = {"frozen": params["frozen"],
                 "train": dict(params["train"], feats_geometry=geo)}
            return cloud_anchor_loss(p, scene, jax.random.PRNGKey(2), cfg,
                                     n_points=256)

        val = loss(params["train"]["feats_geometry"])
        assert np.isfinite(float(val)) and float(val) >= 0
        g = jax.grad(loss)(params["train"]["feats_geometry"])
        # the anchor MUST produce latent gradients (that's its purpose)
        assert float(jnp.sum(jnp.abs(g))) > 0

    def test_fd_eikonal_restores_latent_gradients(self, scene_setup):
        """The analytic eikonal has zero latent gradient a.e. (piecewise-
        linear frozen decoder); the FD version must not."""
        from spurfies_tpu.model import field
        from spurfies_tpu.model.renderer import fd_eikonal_loss
        from spurfies_tpu.ops.voxel_grid import query_grid
        cfg, scene, params = scene_setup

        x = scene.points[:64] + 0.01
        idx, _ = query_grid(x, scene.table, scene.spec, k=cfg.k)
        out = {
            "valid_pt": (idx >= 0).any(-1).reshape(1, -1),
            "xyz": x.reshape(1, -1, 3),
            "nbr_idx": idx.reshape(1, -1, cfg.k),
            "nbr_valid": (idx >= 0).reshape(1, -1, cfg.k),
        }

        def fd(geo):
            p = {"frozen": params["frozen"],
                 "train": dict(params["train"], feats_geometry=geo)}
            return fd_eikonal_loss(p, scene, out, jax.random.PRNGKey(3),
                                   cfg)

        val = fd(params["train"]["feats_geometry"])
        assert np.isfinite(float(val))
        g = jax.grad(fd)(params["train"]["feats_geometry"])
        assert float(jnp.sum(jnp.abs(g))) > 0

        # subsampled variant (loss.fd_eikonal_points): same expected
        # pressure, finite and nonzero latent gradients
        def fd_sub(geo):
            p = {"frozen": params["frozen"],
                 "train": dict(params["train"], feats_geometry=geo)}
            return fd_eikonal_loss(p, scene, out, jax.random.PRNGKey(3),
                                   cfg, n_sub=32)

        assert np.isfinite(float(fd_sub(params["train"]["feats_geometry"])))
        gs = jax.grad(fd_sub)(params["train"]["feats_geometry"])
        assert float(jnp.sum(jnp.abs(gs))) > 0

        # contrast: analytic eikonal latent-gradient is exactly zero
        def analytic(geo):
            _, gr = field.sdf_and_grad(params["frozen"], geo, scene.points,
                                       idx, idx >= 0, x, cfg.rbf)
            return jnp.mean((jnp.linalg.norm(gr, axis=-1) - 1.0) ** 2)

        ga = jax.grad(analytic)(params["train"]["feats_geometry"])
        np.testing.assert_allclose(np.asarray(ga), 0.0, atol=1e-10)

    def test_weights_zero_means_reference_loss(self):
        from spurfies_tpu.config import LossConfig
        from spurfies_tpu.model.losses import total_loss
        out = {
            "rgb_values": jnp.zeros((4, 3)),
            "grad_theta": jnp.ones((4, 2, 3)),
            "valid_pt": jnp.ones((4, 2), bool),
            "weights": jnp.full((4, 2), 0.4),
        }
        gt = {"rgb": jnp.zeros((1, 4, 3)), "mask": jnp.ones((1, 4, 3))}
        base, parts0 = total_loss(out, gt, LossConfig())
        out2 = dict(out, cloud_anchor_loss=jnp.asarray(5.0),
                    fd_eikonal_loss=jnp.asarray(7.0))
        same, _ = total_loss(out2, gt, LossConfig())
        np.testing.assert_allclose(float(base), float(same))
        more, _ = total_loss(
            out2, gt, LossConfig(cloud_anchor_weight=0.1,
                                 fd_eikonal_weight=0.1))
        assert float(more) > float(same)


class TestFdAnnealing:
    def test_schedule_values(self):
        import jax.numpy as jnp

        from spurfies_tpu.config import LossConfig
        from spurfies_tpu.model.losses import fd_eikonal_weight_at

        cfg = LossConfig(fd_eikonal_weight=0.01, fd_eikonal_anneal_init=1.0,
                         fd_eikonal_anneal_steps=2000)
        w0 = float(fd_eikonal_weight_at(cfg, jnp.asarray(0)))
        w_half = float(fd_eikonal_weight_at(cfg, jnp.asarray(1000)))
        w_end = float(fd_eikonal_weight_at(cfg, jnp.asarray(2000)))
        w_late = float(fd_eikonal_weight_at(cfg, jnp.asarray(50000)))
        assert abs(w0 - 1.0) < 1e-6            # starts at anneal_init
        assert abs(w_half - 0.1) < 1e-6        # geometric midpoint
        assert abs(w_end - 0.01) < 1e-8        # lands on the final weight
        assert abs(w_late - 0.01) < 1e-8       # stays constant after

    def test_disabled_is_constant(self):
        from spurfies_tpu.config import LossConfig
        from spurfies_tpu.model.losses import fd_eikonal_weight_at

        cfg = LossConfig(fd_eikonal_weight=0.05)
        assert fd_eikonal_weight_at(cfg, None) == 0.05

    def test_trainer_threads_step(self):
        """Annealed fd config trains end-to-end (step reaches the loss)."""
        import dataclasses

        import numpy as np

        from spurfies_tpu.config import (
            Config, LossConfig, ModelConfig, SamplerConfig, TrainConfig,
        )
        from spurfies_tpu.data.synthetic import make_synthetic_scene
        from spurfies_tpu.train.trainer import Trainer

        cfg = Config(
            model=ModelConfig(
                max_shading_pts=8,
                ray_sampler=SamplerConfig(near=0.5, far=3.0, n_samples=8,
                                          n_samples_eval=16,
                                          n_samples_extra=4),
            ),
            loss=LossConfig(fd_eikonal_weight=0.01,
                            fd_eikonal_anneal_init=1.0,
                            fd_eikonal_anneal_steps=10),
            train=TrainConfig(num_pixels=32, fast_iters=1),
        )
        pts, cols, views = make_synthetic_scene(n_points=500, n_views=2,
                                                img_res=(16, 16))
        tr = Trainer(cfg, pts, cols, views)
        losses = []
        tr.run(4, window=2,
               callback=lambda s, m: losses.append(float(m["loss"])))
        assert all(np.isfinite(l) for l in losses)
