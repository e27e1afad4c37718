"""Local (feature-consistency) loss components vs torch references."""

import jax.numpy as jnp
import numpy as np
import pytest

from spurfies_tpu.model.local_loss import (
    find_surface_depth,
    grid_sample_bilinear,
    local_feature_loss,
    project_mvs,
)


class TestFindSurface:
    def test_single_crossing(self):
        z = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
        sdf = jnp.asarray([[0.5, 0.1, -0.1, -0.5]])
        valid = jnp.ones((1, 4), dtype=bool)
        d, m = find_surface_depth(sdf, z, valid)
        assert bool(m[0])
        np.testing.assert_allclose(float(d[0]), 2.5, atol=1e-5)

    def test_backward_facing_only(self):
        # sign change but increasing sdf (exit crossing) -> not a surface
        z = jnp.asarray([[1.0, 2.0, 3.0]])
        sdf = jnp.asarray([[-0.5, 0.5, 1.0]])
        valid = jnp.ones((1, 3), dtype=bool)
        _, m = find_surface_depth(sdf, z, valid)
        assert not bool(m[0])

    def test_filler_ignored(self):
        z = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
        sdf = jnp.asarray([[1000.0, 0.1, -0.1, 1000.0]])
        valid = jnp.asarray([[False, True, True, False]])
        d, m = find_surface_depth(sdf, z, valid)
        assert bool(m[0])
        np.testing.assert_allclose(float(d[0]), 2.5, atol=1e-5)

    def test_first_crossing_wins(self):
        z = jnp.asarray([[1.0, 2.0, 3.0, 4.0, 5.0]])
        sdf = jnp.asarray([[0.2, -0.2, 0.2, 0.2, -0.2]])
        valid = jnp.ones((1, 5), dtype=bool)
        d, m = find_surface_depth(sdf, z, valid)
        np.testing.assert_allclose(float(d[0]), 1.5, atol=1e-5)


class TestGridSample:
    def test_vs_torch(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        rng = np.random.default_rng(0)
        feat = rng.normal(size=(1, 4, 9, 13)).astype(np.float32)  # NCHW
        # random pixel coords (in feature scale), some out of range
        xy = rng.uniform(-2, 15, size=(50, 2)).astype(np.float32)

        h, w = 9, 13
        gx = (xy[:, 0] / w) * 2 - 1
        gy = (xy[:, 1] / h) * 2 - 1
        grid = torch.from_numpy(
            np.stack([gx, gy], -1)[None, :, None, :]
        )
        ref = F.grid_sample(
            torch.from_numpy(feat), grid, mode="bilinear",
            padding_mode="zeros", align_corners=False,
        )[0, :, :, 0].T.numpy()

        ours = grid_sample_bilinear(
            jnp.asarray(feat[0].transpose(1, 2, 0)), jnp.asarray(xy)
        )
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


class TestProjection:
    def test_known_camera(self):
        ext = np.eye(4, dtype=np.float32)
        K = np.eye(4, dtype=np.float32)
        K[0, 0] = K[1, 1] = 100.0
        K[0, 2], K[1, 2] = 32.0, 24.0
        cam = jnp.asarray(np.stack([ext, K]))
        pts = jnp.asarray([[0.0, 0.0, 2.0], [0.1, -0.1, 1.0]])
        xy, z = project_mvs(pts, cam)
        np.testing.assert_allclose(np.asarray(xy[0]), [32.0, 24.0],
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(xy[1]), [42.0, 14.0],
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(z), [2.0, 1.0], atol=1e-6)


class TestLocalLoss:
    def test_identical_views_zero(self, rng):
        """Same feature map + same camera -> perfect correlation -> 0."""
        feat = rng.normal(size=(16, 20, 8)).astype(np.float32)
        ext = np.eye(4, dtype=np.float32)
        ext[2, 3] = 2.0  # camera behind points
        K = np.eye(4, dtype=np.float32)
        K[0, 0] = K[1, 1] = 20.0
        K[0, 2], K[1, 2] = 20.0, 16.0
        cam = np.stack([ext, K])
        pts = rng.uniform(-0.2, 0.2, (32, 3)).astype(np.float32)
        mask = jnp.ones(32, dtype=bool)
        loss = local_feature_loss(
            jnp.asarray(pts), mask, jnp.asarray(feat),
            jnp.asarray(feat)[None], jnp.asarray(cam),
            jnp.asarray(cam)[None], jnp.asarray(1.0),
            jnp.asarray([0.0, 0.0, 0.0]),
        )
        np.testing.assert_allclose(float(loss), 0.0, atol=1e-5)

    def test_different_views_positive(self, rng):
        # slightly perturbed features: corr < 1 but corr_loss < 0.5 so the
        # reference's diff_mask keeps them (feat_utils.py:436-440)
        feat1 = rng.normal(size=(16, 20, 8)).astype(np.float32)
        feat2 = (feat1 + 0.2 * rng.normal(size=(16, 20, 8))).astype(
            np.float32
        )
        ext = np.eye(4, dtype=np.float32)
        ext[2, 3] = 2.0
        K = np.eye(4, dtype=np.float32)
        K[0, 0] = K[1, 1] = 20.0
        K[0, 2], K[1, 2] = 20.0, 16.0
        cam = np.stack([ext, K])
        pts = rng.uniform(-0.2, 0.2, (64, 3)).astype(np.float32)
        loss = local_feature_loss(
            jnp.asarray(pts), jnp.ones(64, dtype=bool), jnp.asarray(feat1),
            jnp.asarray(feat2)[None], jnp.asarray(cam),
            jnp.asarray(cam)[None], jnp.asarray(1.0),
            jnp.asarray([0.0, 0.0, 0.0]),
        )
        assert float(loss) > 0.0
