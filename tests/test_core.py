"""Golden-value tests for the core math lib (SURVEY §4 test pyramid)."""

import jax.numpy as jnp
import numpy as np
import pytest

from spurfies_tpu.core import cameras
from spurfies_tpu.core.density import get_beta, laplace_density
from spurfies_tpu.core.embedder import encoding_dim, positional_encoding
from spurfies_tpu.core.metrics import psnr
from spurfies_tpu.core.quadrature import composite, expected_depth, render_weights


class TestEmbedder:
    def test_dims(self):
        assert encoding_dim(6, 3) == 39   # position encoding (F_color input)
        assert encoding_dim(3, 3) == 21   # view encoding (R input)

    def test_values(self):
        x = jnp.array([[0.5, -0.25, 1.0]])
        out = positional_encoding(x, 2)
        assert out.shape == (1, 15)
        # order: [x, sin(1x), cos(1x), sin(2x), cos(2x)]
        np.testing.assert_allclose(out[0, :3], x[0], rtol=1e-6)
        np.testing.assert_allclose(out[0, 3:6], np.sin(x[0]), rtol=1e-6)
        np.testing.assert_allclose(out[0, 6:9], np.cos(x[0]), rtol=1e-6)
        np.testing.assert_allclose(out[0, 9:12], np.sin(2 * x[0]), rtol=1e-6)
        np.testing.assert_allclose(out[0, 12:15], np.cos(2 * x[0]), rtol=1e-6)

    def test_zero_multires_identity(self):
        x = jnp.ones((4, 3))
        np.testing.assert_array_equal(positional_encoding(x, 0), x)


class TestDensity:
    def test_beta(self):
        assert np.isclose(get_beta(jnp.asarray(-0.1), 1e-4), 0.1001)

    def test_laplace_zero_sdf(self):
        # at sdf=0: alpha * 0.5
        beta = jnp.asarray(0.1)
        np.testing.assert_allclose(laplace_density(jnp.asarray(0.0), beta), 5.0)

    def test_laplace_signs(self):
        beta = jnp.asarray(0.1)
        # deep inside (sdf<0) -> density ~ alpha; far outside -> 0
        np.testing.assert_allclose(
            laplace_density(jnp.asarray(-10.0), beta), 10.0, rtol=1e-5
        )
        np.testing.assert_allclose(
            laplace_density(jnp.asarray(10.0), beta), 0.0, atol=1e-5
        )

    def test_laplace_analytic(self):
        # alpha*(0.5 + 0.5*sign(s)*expm1(-|s|/beta))
        s, b = 0.05, 0.1
        expected = (1 / b) * (0.5 + 0.5 * np.expm1(-s / b))
        np.testing.assert_allclose(
            laplace_density(jnp.asarray(s), jnp.asarray(b)), expected, rtol=1e-5
        )

    def test_abs_density(self):
        # reference AbsDensity (density.py:33-35): density = |sdf|
        from spurfies_tpu.core.density import abs_density
        s = jnp.array([-2.0, -0.5, 0.0, 0.5, 2.0])
        np.testing.assert_allclose(abs_density(s), np.abs(np.asarray(s)))

    def test_simple_density(self):
        # reference SimpleDensity (density.py:38-47): density = relu(sdf)
        from spurfies_tpu.core.density import simple_density
        s = jnp.array([-2.0, -0.5, 0.0, 0.5, 2.0])
        np.testing.assert_allclose(
            simple_density(s), np.maximum(np.asarray(s), 0.0)
        )

    def test_single_variance(self):
        # golden vs reference SingleVarianceNetwork (density.py:49-66)
        # torch: exp(0.3*10).clip(1e-6,1e6) = 20.08553695678711
        from spurfies_tpu.core.density import (
            single_variance, single_variance_forward,
        )
        v = jnp.asarray(0.3)
        np.testing.assert_allclose(single_variance(v), 20.085537, rtol=1e-6)
        # clipping
        np.testing.assert_allclose(single_variance(jnp.asarray(-5.0)), 1e-6)
        np.testing.assert_allclose(single_variance(jnp.asarray(5.0)), 1e6)
        out = single_variance_forward(jnp.zeros((5, 3)), v)
        assert out.shape == (5, 1)
        np.testing.assert_allclose(out, 20.085537, rtol=1e-6)


class TestQuadrature:
    def test_opaque_wall(self):
        # huge density at sample 1 -> all weight there
        deltas = jnp.array([[0.1, 0.1, 0.1]])
        dens = jnp.array([[0.0, 1e6, 0.0]])
        w = render_weights(deltas, dens)
        np.testing.assert_allclose(w[0, 1], 1.0, atol=1e-5)
        np.testing.assert_allclose(w[0, 0], 0.0, atol=1e-6)
        np.testing.assert_allclose(w[0, 2], 0.0, atol=1e-6)

    def test_manual_two_sample(self):
        deltas = jnp.array([[0.5, 0.5]])
        dens = jnp.array([[1.0, 2.0]])
        w = render_weights(deltas, dens)
        a1 = 1 - np.exp(-0.5)
        a2 = 1 - np.exp(-1.0)
        t2 = np.exp(-0.5)
        np.testing.assert_allclose(w[0], [a1, a2 * t2], rtol=1e-5)

    def test_zero_delta_noop(self):
        deltas = jnp.array([[0.0, 0.0]])
        dens = jnp.array([[5.0, 5.0]])
        np.testing.assert_allclose(render_weights(deltas, dens), 0.0)

    def test_composite_depth(self):
        w = jnp.array([[0.25, 0.75]])
        z = jnp.array([[1.0, 3.0]])
        np.testing.assert_allclose(expected_depth(w, z)[0, 0], 2.5, rtol=1e-5)
        rgb = jnp.array([[[1.0, 0, 0], [0, 1.0, 0]]])
        np.testing.assert_allclose(composite(w, rgb)[0], [0.25, 0.75, 0.0])


class TestCameras:
    def _simple_cam(self):
        K = np.eye(4)
        K[0, 0], K[1, 1] = 100.0, 100.0
        K[0, 2], K[1, 2] = 50.0, 40.0
        pose = np.eye(4)
        pose[:3, 3] = [1.0, 2.0, 3.0]
        return K, pose

    def test_center_pixel_ray(self):
        K, pose = self._simple_cam()
        uv = jnp.array([[[50.0, 40.0]]])
        dirs, loc = cameras.get_camera_params(
            uv, jnp.asarray(pose)[None], jnp.asarray(K)[None]
        )
        np.testing.assert_allclose(loc[0], [1, 2, 3], atol=1e-6)
        # principal ray = +z in cam frame = pose z-column in world
        np.testing.assert_allclose(dirs[0, 0], [0, 0, 1], atol=1e-6)

    def test_project_unproject_roundtrip(self, rng):
        K, pose = self._simple_cam()
        # random rotation
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        w, x, y, z = q
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ])
        pose[:3, :3] = R
        uv = rng.uniform(0, 80, size=(1, 64, 2)).astype(np.float32)
        dirs, loc = cameras.get_camera_params(
            jnp.asarray(uv), jnp.asarray(pose, dtype=jnp.float32)[None],
            jnp.asarray(K, dtype=jnp.float32)[None],
        )
        depth = rng.uniform(1.0, 4.0, size=(1, 64, 1)).astype(np.float32)
        world = loc[:, None, :] + dirs * depth
        x_pix, y_pix, z_cam = cameras.project(
            world, jnp.asarray(pose, dtype=jnp.float32)[None],
            jnp.asarray(K, dtype=jnp.float32)[None],
        )
        np.testing.assert_allclose(x_pix[0], uv[0, :, 0], atol=1e-2)
        np.testing.assert_allclose(y_pix[0], uv[0, :, 1], atol=1e-2)
        assert np.all(np.asarray(z_cam) > 0)

    def test_decompose_P_roundtrip(self, rng):
        K = np.eye(3)
        K[0, 0], K[1, 1] = 320.0, 330.0
        K[0, 2], K[1, 2] = 128.0, 96.0
        theta = 0.3
        R = np.array([
            [np.cos(theta), -np.sin(theta), 0],
            [np.sin(theta), np.cos(theta), 0],
            [0, 0, 1.0],
        ])
        c = np.array([0.5, -0.2, 2.0])
        t = -R @ c
        P = K @ np.hstack([R, t[:, None]])
        intr, pose = cameras.load_K_Rt_from_P(P)
        np.testing.assert_allclose(intr[:3, :3], K, atol=1e-6)
        np.testing.assert_allclose(pose[:3, :3], R.T, atol=1e-6)
        np.testing.assert_allclose(pose[:3, 3], c, atol=1e-6)

    def test_sphere_intersections(self):
        loc = jnp.array([[0.0, 0.0, -2.0]])
        dirs = jnp.array([[0.0, 0.0, 1.0]])
        ints = cameras.get_sphere_intersections(loc, dirs, r=1.0)
        np.testing.assert_allclose(ints[0], [1.0, 3.0], atol=1e-6)


def test_psnr():
    a = jnp.zeros((4, 3))
    b = jnp.full((4, 3), 0.1)
    np.testing.assert_allclose(psnr(a, b), 20.0, rtol=1e-5)
    m = jnp.zeros((4, 1)).at[0].set(1.0)
    np.testing.assert_allclose(psnr(a, b, m), 20.0, rtol=1e-5)
