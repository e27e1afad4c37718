"""Global alignment optimizer: recovers synthetic similarity transforms."""

import numpy as np
import pytest

from spurfies_tpu.prep.alignment import (
    AlignConfig,
    align_pointmaps,
    quat_to_rot,
    scale_preset_poses,
)


def test_quat_to_rot_identity():
    import jax.numpy as jnp
    R = quat_to_rot(jnp.asarray([1.0, 0, 0, 0]))
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)


def test_quat_to_rot_orthonormal(rng):
    import jax.numpy as jnp
    q = rng.normal(size=4)
    R = np.asarray(quat_to_rot(jnp.asarray(q)))
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_scale_preset_poses():
    poses = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
    poses[:, :3, 3] = [[1, 0, 0], [0, 2, 0], [0, 0, 3]]
    scaled, s = scale_preset_poses(poses, 0.225)
    mean = np.linalg.norm(scaled[:, :3, 3], axis=-1).mean()
    np.testing.assert_allclose(mean, 0.225, rtol=1e-5)


@pytest.mark.slow
def test_alignment_fuses_consistent_pairs(rng):
    """Three views of one cloud, each pair observed with a random
    similarity offset; alignment must converge to a consistent fusion."""
    P = 400
    gt = rng.uniform(-0.5, 0.5, (P, 3)).astype(np.float32)

    # pairwise observations: edge frames are scaled/shifted copies
    edges = np.array([[0, 1], [1, 2], [0, 2]])
    xi, xj = [], []
    for e in range(3):
        scale = rng.uniform(0.7, 1.4)
        shift = rng.uniform(-0.2, 0.2, 3)
        xi.append((gt - shift) / scale)
        xj.append((gt + 0.01 * rng.normal(size=(P, 3)) - shift) / scale)
    xi = np.stack(xi).astype(np.float32)
    xj = np.stack(xj).astype(np.float32)
    conf = np.full((3, P), 20.0, dtype=np.float32)

    out = align_pointmaps(edges, xi, xj, conf, conf, n_views=3,
                          cfg=AlignConfig(iters=300))
    assert out["loss"] < 0.05
    # fused per-view points agree with each other
    d01 = np.linalg.norm(out["points"][0] - out["points"][1], axis=-1)
    assert float(np.mean(d01)) < 0.05
