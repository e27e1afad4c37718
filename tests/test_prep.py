"""Point-cloud prep pipeline tests."""

import json
import os

import numpy as np

from spurfies_tpu.prep.pointcloud import (
    export_scene,
    filter_by_confidence,
    greedy_spacing_subsample,
    normalize_unit_cube,
    prepare_scene,
)


class TestSubsample:
    def test_spacing_respected(self, rng):
        pts = rng.uniform(0, 1, (3000, 3)).astype(np.float32)
        keep = greedy_spacing_subsample(pts, spacing=0.1)
        out = pts[keep]
        from sklearn.neighbors import KDTree
        d = KDTree(out).query(out, k=2)[0][:, 1]
        assert np.all(d >= 0.1 - 1e-6)
        assert len(out) > 100  # still covers the cube

    def test_dense_cluster_reduced(self, rng):
        pts = rng.normal(0, 0.001, (500, 3)).astype(np.float32)
        keep = greedy_spacing_subsample(pts, spacing=0.025)
        assert len(keep) == 1


class TestNormalize:
    def test_unit_cube(self, rng):
        pts = rng.uniform(-3, 7, (500, 3))
        poses = np.tile(np.eye(4), (3, 1, 1))
        poses[:, :3, 3] = rng.uniform(-3, 7, (3, 3))
        out, op, scale, center = normalize_unit_cube(pts, poses)
        assert out.min() >= -1.0 - 1e-9 and out.max() <= 1.0 + 1e-9
        assert abs(out.max() - 1.0) < 0.02 or abs(out.min() + 1.0) < 0.02
        # cameras transformed consistently
        np.testing.assert_allclose(
            op[0, :3, 3], (poses[0, :3, 3] - center) * scale, rtol=1e-6
        )


def test_confidence_filter(rng):
    pts = rng.uniform(0, 1, (100, 3))
    conf = np.linspace(0, 20, 100)
    out, _ = filter_by_confidence(pts, None, conf, 10.0)
    assert len(out) == 50


def test_export_scene(tmp_path, rng):
    pts = rng.uniform(-1, 1, (50, 3)).astype(np.float32)
    cols = rng.integers(0, 255, (50, 3)).astype(np.uint8)
    poses = np.tile(np.eye(4), (3, 1, 1))
    K = np.eye(3)
    K[0, 0] = K[1, 1] = 100.0
    export_scene(str(tmp_path), "duck", pts, cols, poses, K, (64, 48))
    assert os.path.exists(tmp_path / "duck.ply")
    with open(tmp_path / "duck.json") as f:
        meta = json.load(f)
    assert meta["fl_x"] == 100.0
    assert len(meta["frames"]) == 3

    # loadable by the own_data pipeline protocol
    from spurfies_tpu.data.ply import load_ply
    p2, c2 = load_ply(str(tmp_path / "duck.ply"))
    np.testing.assert_allclose(p2, pts, rtol=1e-6)


def test_prepare_scene_end_to_end(rng):
    pts = rng.uniform(-2, 2, (2000, 3))
    conf = rng.uniform(0, 20, 2000)
    poses = np.tile(np.eye(4), (3, 1, 1))
    out, cols, op, scale, center = prepare_scene(
        pts, None, conf, 10.0, spacing=0.1, normalize=True, poses=poses
    )
    assert out.min() >= -1.001 and out.max() <= 1.001
    assert len(out) < 2000


def test_fuse_view_confidence_asymmetric():
    """View v's points must carry view v's own confidences (the round-1
    bug maxed different views' maps together and tiled view 0's vector)."""
    from spurfies_tpu.cli.prep_pointcloud import fuse_view_confidence

    # 3 views, complete graph; distinct constant conf per (edge, slot)
    edges = [(0, 1), (0, 2), (1, 2)]
    P = 4
    conf_i = np.stack([
        np.full(P, 5.0),    # edge (0,1): view 0 seen at 5
        np.full(P, 1.0),    # edge (0,2): view 0 seen at 1
        np.full(P, 9.0),    # edge (1,2): view 1 seen at 9
    ])
    conf_j = np.stack([
        np.full(P, 2.0),    # edge (0,1): view 1 seen at 2
        np.full(P, 7.0),    # edge (0,2): view 2 seen at 7
        np.full(P, 3.0),    # edge (1,2): view 2 seen at 3
    ])
    out = fuse_view_confidence(edges, conf_i, conf_j, 3)
    assert out.shape == (3, P)
    np.testing.assert_allclose(out[0], 5.0)   # max(5, 1)
    np.testing.assert_allclose(out[1], 9.0)   # max(2, 9)
    np.testing.assert_allclose(out[2], 7.0)   # max(7, 3)
