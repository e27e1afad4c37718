"""Parity tests for the fused pair-MLP Pallas kernel (interpret mode on the
CPU mesh; the real kernel runs on TPU only)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spurfies_tpu.config import ModelConfig
from spurfies_tpu.model import field
from spurfies_tpu.model.networks import init_model_params
from spurfies_tpu.ops.pallas_mlp import (
    pair_sdf_value,
    pair_sdf_value_and_input_grad,
)


@pytest.fixture(scope="module")
def frozen():
    params = init_model_params(jax.random.PRNGKey(0), ModelConfig())
    return params["frozen"]


@pytest.fixture(scope="module")
def u(frozen):
    rng = np.random.default_rng(1)
    gfeat = rng.normal(0, 0.3, (64, 32)).astype(np.float32)
    x_pi = rng.normal(0, 0.03, (64, 3)).astype(np.float32)
    return jnp.asarray(np.concatenate([gfeat, x_pi], -1))


def _ref_s(frozen, u):
    return field.pair_sdf(frozen, u[:, :32], u[:, 32:])


class TestKernelParity:
    def test_value(self, frozen, u):
        s_ref = _ref_s(frozen, u)
        s_k = pair_sdf_value(frozen, u, jnp.float32)
        np.testing.assert_allclose(np.asarray(s_k), np.asarray(s_ref),
                                   rtol=1e-5, atol=1e-6)

    def test_value_and_grad(self, frozen, u):
        s_k, r_k = pair_sdf_value_and_input_grad(frozen, u, jnp.float32)
        s_ref = _ref_s(frozen, u)
        np.testing.assert_allclose(np.asarray(s_k), np.asarray(s_ref),
                                   rtol=1e-5, atol=1e-6)
        r_ref = jax.vmap(jax.grad(lambda uu: _ref_s(frozen, uu[None])[0]))(u)
        np.testing.assert_allclose(np.asarray(r_k), np.asarray(r_ref),
                                   rtol=1e-4, atol=1e-6)

    def test_custom_vjp_matches_autodiff(self, frozen, u):
        c = jnp.asarray(np.random.default_rng(2).normal(size=(64,))
                        .astype(np.float32))

        def loss_kernel(uu):
            s, _ = pair_sdf_value_and_input_grad(frozen, uu, jnp.float32)
            return jnp.sum(s * c)

        def loss_ref(uu):
            return jnp.sum(_ref_s(frozen, uu) * c)

        gk = jax.grad(loss_kernel)(u)
        gr = jax.grad(loss_ref)(u)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                                   rtol=1e-4, atol=1e-6)

    def test_gradient_cotangent_is_zero_everywhere(self, frozen, u):
        """The piecewise-linearity fact the custom VJP relies on: the XLA
        autodiff pullback through the input-gradient output is exactly 0
        (d lrelu'/dx == 0 a.e.), so dropping it in the kernel VJP is not
        an approximation but the same number."""
        def eik_ref(uu):
            r = jax.vmap(jax.grad(lambda one: _ref_s(frozen, one[None])[0])
                         )(uu)
            g = r[:, 32:]
            return jnp.sum((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)

        g = jax.grad(eik_ref)(u)
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-12)


class TestRowsKernelParity:
    """The gx kernels take raw gathered rows [latent | pos] + query x and
    assemble u = [latent | x - pos] in VMEM (pallas_mlp.pair_sdf_rows_*)."""

    def _gx_inputs(self, u):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(0, 0.3, (u.shape[0], 3))
                        .astype(np.float32))
        pos = x - u[:, 32:]                   # so that x - pos == x_pi
        g = jnp.concatenate([u[:, :32], pos], axis=1)
        return g, x

    def test_rows_value(self, frozen, u):
        from spurfies_tpu.ops.pallas_mlp import pair_sdf_rows_value
        g, x = self._gx_inputs(u)
        s_k, xpi = pair_sdf_rows_value(frozen, g, x, jnp.float32)
        np.testing.assert_allclose(np.asarray(xpi), np.asarray(u[:, 32:]),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(s_k), np.asarray(_ref_s(
            frozen, u)), rtol=1e-5, atol=1e-5)

    def test_rows_grad(self, frozen, u):
        from spurfies_tpu.ops.pallas_mlp import pair_sdf_rows_grad
        g, x = self._gx_inputs(u)
        s_k, r_k, xpi = pair_sdf_rows_grad(frozen, g, x, jnp.float32)
        np.testing.assert_allclose(np.asarray(xpi), np.asarray(u[:, 32:]),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(s_k), np.asarray(_ref_s(
            frozen, u)), rtol=1e-5, atol=1e-5)
        r_ref = jax.vmap(jax.grad(lambda uu: _ref_s(frozen, uu[None])[0]))(u)
        np.testing.assert_allclose(np.asarray(r_k), np.asarray(r_ref),
                                   rtol=1e-4, atol=1e-5)

    def test_rows_vjp_matches_autodiff(self, frozen, u):
        """g/x cotangents of the rows kernel == autodiff through the
        reference assembly u = [g_lat | x - g_pos]."""
        from spurfies_tpu.ops.pallas_mlp import pair_sdf_rows_grad
        g, x = self._gx_inputs(u)
        c = jnp.asarray(np.random.default_rng(4).normal(size=(u.shape[0],))
                        .astype(np.float32))

        def loss_kernel(gg, xx):
            s, _, _ = pair_sdf_rows_grad(frozen, gg, xx, jnp.float32)
            return jnp.sum(s * c)

        def loss_ref(gg, xx):
            uu = jnp.concatenate([gg[:, :32], xx - gg[:, 32:]], axis=1)
            return jnp.sum(_ref_s(frozen, uu) * c)

        gk_g, gk_x = jax.grad(loss_kernel, argnums=(0, 1))(g, x)
        gr_g, gr_x = jax.grad(loss_ref, argnums=(0, 1))(g, x)
        np.testing.assert_allclose(np.asarray(gk_g), np.asarray(gr_g),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gk_x), np.asarray(gr_x),
                                   rtol=1e-4, atol=1e-6)


class TestFusedFieldPath:
    def test_sdf_and_grad_fused_matches_dense(self):
        from spurfies_tpu.model.neural_points import build_scene
        from spurfies_tpu.ops.voxel_grid import query_grid

        cfg = ModelConfig()
        rng = np.random.default_rng(7)
        v = rng.normal(size=(2000, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        pts = (0.5 * v).astype(np.float32)
        scene, latents = build_scene(jax.random.PRNGKey(0), pts, cfg,
                                     rng.uniform(0, 255, (2000, 3)))
        params = init_model_params(jax.random.PRNGKey(1), cfg)
        frozen = params["frozen"]
        geo = latents["feats_geometry"]

        x = scene.points[:32] + 0.01
        idx, _ = query_grid(x, scene.table, scene.spec, k=cfg.k)
        valid = idx >= 0

        field.set_fused_mlp("off")
        s_d, g_d = field.sdf_and_grad(frozen, geo, scene.points, idx,
                                      valid, x, cfg.rbf)
        sp_d = field.sdf_probe(frozen, geo, scene, x, cfg.k, cfg.r, cfg.rbf)

        try:
            field.set_fused_mlp("on", jnp.float32)
            s_f, g_f = field.sdf_and_grad(frozen, geo, scene.points, idx,
                                          valid, x, cfg.rbf)
            sp_f = field.sdf_probe(frozen, geo, scene, x, cfg.k, cfg.r,
                                   cfg.rbf)
        finally:
            field.set_fused_mlp("auto", jnp.float32)

        np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_d),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_d),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(sp_f), np.asarray(sp_d),
                                   rtol=1e-5, atol=1e-5)


class TestFusedColor:
    @pytest.fixture(scope="class")
    def setup(self):
        from spurfies_tpu.model.neural_points import build_scene
        from spurfies_tpu.ops.voxel_grid import query_grid

        cfg = ModelConfig()
        rng = np.random.default_rng(11)
        v = rng.normal(size=(2000, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        pts = (0.5 * v).astype(np.float32)
        scene, latents = build_scene(jax.random.PRNGKey(0), pts, cfg,
                                     rng.uniform(0, 255, (2000, 3)))
        params = init_model_params(jax.random.PRNGKey(1), cfg)
        params["train"].update(latents)
        tp = params["train"]

        m = 160   # not a multiple of the 128-point tile: exercises padding
        x = scene.points[:m] + jnp.asarray(
            rng.normal(0, 0.01, (m, 3)).astype(np.float32))
        idx, _ = query_grid(x, scene.table, scene.spec, k=cfg.k)
        valid = idx >= 0
        dirs = jnp.asarray(rng.normal(size=(m, 3)).astype(np.float32))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        return scene, tp, x, idx, valid, dirs

    def _rgb(self, setup, mode):
        scene, tp, x, idx, valid, dirs = setup
        try:
            field.FUSED_COLOR = mode == "on"
            field.set_fused_mlp(mode, jnp.float32)
            return field.aggregate_color(
                tp, tp["feats_color"], scene.points, idx, valid, x, dirs,
                45.0, 6, 3, compute_dtype=None,
            )
        finally:
            field.FUSED_COLOR = False
            field.set_fused_mlp("auto", jnp.float32)

    def test_forward_parity(self, setup):
        rgb_ref = self._rgb(setup, "off")
        rgb_k = self._rgb(setup, "on")
        np.testing.assert_allclose(np.asarray(rgb_k), np.asarray(rgb_ref),
                                   rtol=1e-4, atol=1e-5)

    def test_grad_parity(self, setup):
        scene, tp, x, idx, valid, dirs = setup
        c = jnp.asarray(np.random.default_rng(5)
                        .normal(size=(x.shape[0], 3)).astype(np.float32))

        def loss(p, mode):
            try:
                field.FUSED_COLOR = mode == "on"
                field.set_fused_mlp(mode, jnp.float32)
                rgb = field.aggregate_color(
                    p, p["feats_color"], scene.points, idx, valid, x, dirs,
                    45.0, 6, 3, compute_dtype=None,
                )
            finally:
                field.FUSED_COLOR = False
                field.set_fused_mlp("auto", jnp.float32)
            return jnp.sum(rgb * c)

        g_ref = jax.grad(lambda p: loss(p, "off"))(tp)
        g_k = jax.grad(lambda p: loss(p, "on"))(tp)

        np.testing.assert_allclose(
            np.asarray(g_k["feats_color"]), np.asarray(g_ref["feats_color"]),
            rtol=1e-3, atol=1e-5,
        )
        for li in range(len(tp["F_color"])):
            for key in ("w", "b"):
                np.testing.assert_allclose(
                    np.asarray(g_k["F_color"][li][key]),
                    np.asarray(g_ref["F_color"][li][key]),
                    rtol=1e-3, atol=2e-4,
                    err_msg=f"F_color[{li}].{key}",
                )
        for li in range(len(tp["R"])):
            for key in ("w", "b"):
                np.testing.assert_allclose(
                    np.asarray(g_k["R"][li][key]),
                    np.asarray(g_ref["R"][li][key]),
                    rtol=1e-3, atol=2e-4,
                    err_msg=f"R[{li}].{key}",
                )
