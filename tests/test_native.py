"""Native kernel parity vs Python implementations."""

import numpy as np
import pytest

from spurfies_tpu.native import load_native, nn_dist, radius_dedup, \
    spacing_subsample


@pytest.fixture(scope="module")
def lib():
    lib = load_native()
    if lib is None:
        pytest.skip("native lib unavailable (no compiler)")
    return lib


class TestNative:
    def test_spacing_subsample_parity(self, lib, rng):
        pts = rng.uniform(0, 1, (5000, 3)).astype(np.float32)
        keep = spacing_subsample(pts, 0.08)
        out = pts[keep]
        from sklearn.neighbors import KDTree
        d = KDTree(out).query(out, k=2)[0][:, 1]
        assert np.all(d >= 0.08 - 1e-6)
        # greedy first-come: first point always kept
        assert 0 in keep

    def test_radius_dedup(self, lib, rng):
        pts = rng.uniform(0, 10, (3000, 3)).astype(np.float32)
        keep = radius_dedup(pts, 0.5)
        out = pts[keep]
        from sklearn.neighbors import KDTree
        d = KDTree(out).query(out, k=2)[0][:, 1]
        assert np.all(d >= 0.5 - 1e-5)

    def test_nn_dist_vs_kdtree(self, lib, rng):
        pts = rng.uniform(0, 1, (2000, 3)).astype(np.float32)
        q = rng.uniform(0, 1, (500, 3)).astype(np.float32)
        ours = nn_dist(q, pts, cell=0.1, max_dist=20.0)
        from sklearn.neighbors import KDTree
        ref = KDTree(pts).query(q)[0][:, 0]
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)

    def test_large_cloud_fast(self, lib, rng):
        import time
        pts = rng.uniform(0, 1, (500_000, 3)).astype(np.float32)
        t0 = time.perf_counter()
        keep = spacing_subsample(pts, 0.02)
        dt = time.perf_counter() - t0
        assert dt < 5.0, f"native subsample too slow: {dt:.1f}s"
        assert len(keep) > 1000
