"""Voxel-grid kNN vs brute-force oracle (SURVEY §4: kernel unit tests)."""

import jax.numpy as jnp
import numpy as np
import pytest

from spurfies_tpu.ops import (
    VoxelGridSpec,
    build_grid,
    build_query_table,
    compact_rays,
    knn_brute,
    query_grid,
    voxel_downsample,
)

SPEC = VoxelGridSpec()  # reference defaults: 0.025*3 cells over ±1


def _random_cloud(rng, n=2000, scale=0.8):
    return rng.uniform(-scale, scale, size=(n, 3)).astype(np.float32)


class TestBuildGrid:
    def test_all_points_in_table(self, rng):
        pts = _random_cloud(rng, 500)
        table = build_grid(jnp.asarray(pts), SPEC)
        present = np.asarray(table).ravel()
        present = set(present[present >= 0].tolist())
        assert present == set(range(500))  # sparse cloud: nothing dropped

    def test_cap_drops_excess(self):
        # 40 points in the same cell, cap 26 -> 26 kept
        pts = jnp.asarray(
            np.full((40, 3), 0.01, dtype=np.float32)
            + np.random.default_rng(1).uniform(0, 0.001, (40, 3)).astype(np.float32)
        )
        table = build_grid(pts, SPEC)
        kept = np.asarray(table).ravel()
        assert (kept >= 0).sum() == SPEC.max_pts_per_cell

    def test_out_of_range_dropped(self):
        pts = jnp.asarray(np.array([[5.0, 5.0, 5.0], [0.0, 0.0, 0.0]],
                                   dtype=np.float32))
        table = build_grid(pts, SPEC)
        kept = np.asarray(table).ravel()
        kept = kept[kept >= 0]
        assert kept.tolist() == [1]


class TestQueryTable:
    def test_candidates_cover_radius(self, rng):
        """Every point within radius of a cell box appears in its list."""
        pts = _random_cloud(rng, 1500, scale=0.4)
        qt = build_query_table(jnp.asarray(pts), SPEC, r=2.0)
        idx = np.asarray(qt.idx)
        radius = SPEC.radius(2.0)
        dims = SPEC.dims
        lo = np.asarray(SPEC.lo)
        # check 50 random occupied cells
        occupied = np.nonzero((idx >= 0).any(-1))[0]
        for c in occupied[:: max(1, len(occupied) // 50)]:
            izc = c % dims[2]
            iyc = (c // dims[2]) % dims[1]
            ixc = c // (dims[2] * dims[1])
            blo = lo + np.array([ixc, iyc, izc]) * SPEC.cell_size
            bhi = blo + SPEC.cell_size
            d = np.maximum(blo - pts, 0) + np.maximum(pts - bhi, 0)
            near = np.nonzero((d ** 2).sum(-1) <= radius ** 2)[0]
            listed = set(idx[c][idx[c] >= 0].tolist())
            missing = set(near.tolist()) - listed
            # only allowed to miss when the cap overflowed
            assert not missing or (idx[c] >= 0).all()


class TestQueryParity:
    @pytest.mark.parametrize("r", [2.0, 4.0])
    def test_matches_bruteforce(self, rng, r):
        pts = _random_cloud(rng, 3000)
        x = rng.uniform(-0.9, 0.9, size=(512, 3)).astype(np.float32)
        qt = build_query_table(jnp.asarray(pts), SPEC, r=r)
        gi, gd = query_grid(jnp.asarray(x), qt, SPEC, k=8)
        bi, bd = knn_brute(jnp.asarray(x), jnp.asarray(pts), k=8,
                           radius=SPEC.radius(r))
        gi, gd, bi, bd = map(np.asarray, (gi, gd, bi, bd))
        # same validity pattern and same distances (sets may tie-break
        # differently; distances must match exactly)
        np.testing.assert_array_equal(gi >= 0, bi >= 0)
        np.testing.assert_allclose(
            np.where(np.isfinite(gd), gd, 0),
            np.where(np.isfinite(bd), bd, 0),
            rtol=1e-4, atol=1e-6,
        )

    def test_radius_respected(self, rng):
        pts = _random_cloud(rng, 3000)
        x = rng.uniform(-0.9, 0.9, size=(256, 3)).astype(np.float32)
        qt = build_query_table(jnp.asarray(pts), SPEC, r=2.0)
        gi, gd = query_grid(jnp.asarray(x), qt, SPEC, k=8)
        gd = np.asarray(gd)
        assert np.all(gd[np.isfinite(gd)] <= SPEC.radius(2.0) ** 2 + 1e-9)

    def test_isolated_query_no_neighbors(self, rng):
        pts = jnp.asarray(np.zeros((10, 3), dtype=np.float32))
        x = jnp.asarray(np.full((4, 3), 0.9, dtype=np.float32))
        qt = build_query_table(pts, SPEC, r=2.0)
        gi, gd = query_grid(x, qt, SPEC, k=8)
        assert np.all(np.asarray(gi) == -1)

    def test_out_of_grid_query(self, rng):
        pts = _random_cloud(rng, 100, scale=0.3)
        x = jnp.asarray(np.array([[3.0, 3.0, 3.0]], dtype=np.float32))
        qt = build_query_table(jnp.asarray(pts), SPEC, r=2.0)
        gi, _ = query_grid(x, qt, SPEC, k=8)
        assert np.all(np.asarray(gi) == -1)

    def test_nearest_first_ordering(self, rng):
        pts = _random_cloud(rng, 2000)
        x = rng.uniform(-0.5, 0.5, size=(128, 3)).astype(np.float32)
        qt = build_query_table(jnp.asarray(pts), SPEC, r=4.0)
        _, gd = query_grid(jnp.asarray(x), qt, SPEC, k=8)
        gd = np.asarray(gd)
        # valid (finite) distances are a prefix; within it, non-decreasing
        d = np.diff(gd, axis=-1)
        finite_pair = np.isfinite(gd[:, 1:])
        assert np.all(d[finite_pair] >= -1e-9)
        # and no finite after an inf (prefix property)
        assert not np.any(np.isfinite(gd[:, 1:]) & ~np.isfinite(gd[:, :-1]))


class TestCompactRays:
    def test_basic(self):
        valid = jnp.asarray(np.array([
            [0, 1, 1, 0, 1],
            [0, 0, 0, 0, 0],
            [1, 1, 1, 1, 1],
        ], dtype=bool))
        sel, ok = compact_rays(valid, 3)
        np.testing.assert_array_equal(np.asarray(sel[0]), [1, 2, 4])
        assert np.asarray(ok[0]).all()
        assert not np.asarray(ok[1]).any()
        np.testing.assert_array_equal(np.asarray(sel[2]), [0, 1, 2])

    def test_cap(self):
        valid = jnp.ones((2, 10), dtype=bool)
        sel, ok = compact_rays(valid, 4)
        np.testing.assert_array_equal(np.asarray(sel), [[0, 1, 2, 3]] * 2)
        assert np.asarray(ok).all()


class TestShrinkQueryTable:
    def test_exact_after_shrink(self, rng):
        from spurfies_tpu.model.neural_points import shrink_query_table

        pts = jnp.asarray(_random_cloud(rng, 800, scale=0.3))
        qt = build_query_table(pts, SPEC, r=2.0)
        qt_s, spec_s = shrink_query_table(qt, SPEC)
        assert spec_s.qcap <= SPEC.qcap
        q = jnp.asarray(_random_cloud(rng, 300, scale=0.35))
        i0, d0 = query_grid(q, qt, SPEC, k=8)
        i1, d1 = query_grid(q, qt_s, spec_s, k=8)
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        np.testing.assert_allclose(np.asarray(d0), np.asarray(d1))

    def test_dense_cell_keeps_full_width(self):
        from spurfies_tpu.model.neural_points import shrink_query_table

        # >96 points inside one query neighborhood -> no shrink possible
        rng = np.random.default_rng(3)
        pts = jnp.asarray(
            rng.uniform(-0.02, 0.02, size=(200, 3)).astype(np.float32))
        spec = VoxelGridSpec(max_pts_per_cell=128)
        qt = build_query_table(pts, spec, r=2.0)
        qt_s, spec_s = shrink_query_table(qt, spec)
        assert spec_s.qcap == spec.qcap
        assert qt_s.idx.shape == qt.idx.shape


class TestOccupancyBitmap:
    def test_superset_of_has_neighbor(self, rng):
        """Wherever query_grid finds ANY neighbor, the fine bitmap must
        read occupied (the probe/ray prefilters rely on this), and the
        bitmap must be strictly tighter than marking everything."""
        from spurfies_tpu.ops.voxel_grid import (
            build_occupancy_bitmap,
            fine_occupancy,
        )
        pts = _random_cloud(rng, 800, scale=0.5)
        qt = build_query_table(jnp.asarray(pts), SPEC, r=2.0)
        occ = build_occupancy_bitmap(jnp.asarray(pts), SPEC, r=2.0)

        x = _random_cloud(rng, 4000, scale=0.9)
        idx, _ = query_grid(jnp.asarray(x), qt, SPEC, k=4)
        has = np.asarray(idx >= 0).any(axis=-1)
        marked = np.asarray(fine_occupancy(jnp.asarray(x), occ, SPEC))
        assert (marked | ~has).all()          # superset
        assert marked.mean() < 1.0            # and it actually prunes

    def test_out_of_range_unoccupied(self, rng):
        from spurfies_tpu.ops.voxel_grid import (
            build_occupancy_bitmap,
            fine_occupancy,
        )
        pts = _random_cloud(rng, 100, scale=0.5)
        occ = build_occupancy_bitmap(jnp.asarray(pts), SPEC, r=2.0)
        x = jnp.asarray([[5.0, 5.0, 5.0], [-3.0, 0.0, 0.0]])
        assert not np.asarray(fine_occupancy(x, occ, SPEC)).any()

    def test_tighter_than_coarse_candidate_test(self, rng):
        """The point of the fine bitmap: strictly fewer positions marked
        than the coarse cell-candidate-list test."""
        from spurfies_tpu.ops.voxel_grid import (
            _cell_ids,
            build_occupancy_bitmap,
            fine_occupancy,
        )
        # thin shell — the geometry where coarse over-selection is worst
        v = rng.normal(size=(2000, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        pts = (0.5 * v).astype(np.float32)
        qt = build_query_table(jnp.asarray(pts), SPEC, r=2.0)
        occ = build_occupancy_bitmap(jnp.asarray(pts), SPEC, r=2.0)

        x = _random_cloud(rng, 8000, scale=0.9)
        cid = _cell_ids(jnp.asarray(x), SPEC)
        in_g = np.asarray(cid < SPEC.num_cells)
        coarse = np.asarray(
            (qt.idx[jnp.where(cid < SPEC.num_cells, cid, 0), 0] >= 0)
        ) & in_g
        fine = np.asarray(fine_occupancy(jnp.asarray(x), occ, SPEC))
        assert (coarse | ~fine).all()          # fine implies coarse
        assert fine.mean() < 0.8 * coarse.mean()


class TestVoxelDownsample:
    def test_reduces_and_preserves(self, rng):
        pts = _random_cloud(rng, 5000, scale=0.5)
        out, _, keep = voxel_downsample(pts, vox_res=20)
        assert out.shape[0] < 5000
        assert out.shape[0] > 100
        # every kept point is an original point
        np.testing.assert_allclose(out, pts[keep])

    def test_one_per_voxel(self):
        # two tight clusters -> 2 points
        a = np.full((50, 3), 0.1) + np.random.default_rng(0).normal(0, 1e-4, (50, 3))
        b = np.full((50, 3), -0.4) + np.random.default_rng(1).normal(0, 1e-4, (50, 3))
        pts = np.vstack([a, b]).astype(np.float32)
        out, _, _ = voxel_downsample(pts, vox_res=5)
        assert out.shape[0] == 2

    def test_colors_carried(self, rng):
        pts = _random_cloud(rng, 1000, scale=0.5)
        cols = rng.uniform(0, 255, size=(1000, 3)).astype(np.float32)
        out, oc, keep = voxel_downsample(pts, 20, cols)
        np.testing.assert_allclose(oc, cols[keep])
