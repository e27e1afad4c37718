"""Pallas fused select kernel vs the XLA query path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spurfies_tpu.ops.pallas_select import select_knn_pallas
from spurfies_tpu.ops.voxel_grid import (
    VoxelGridSpec,
    _cell_ids,
    build_query_table,
    query_grid,
)

SPEC = VoxelGridSpec()


@pytest.mark.slow
def test_pallas_matches_xla(rng):
    pts = rng.uniform(-0.7, 0.7, (3000, 3)).astype(np.float32)
    x = rng.uniform(-0.8, 0.8, (2048, 3)).astype(np.float32)
    qt = build_query_table(jnp.asarray(pts), SPEC, r=2.0)

    xi = jnp.asarray(x)
    cid = _cell_ids(xi, SPEC)
    in_grid = cid < SPEC.num_cells
    cid = jnp.where(in_grid, cid, 0)
    cand = jnp.where(in_grid[:, None], qt.idx[cid], -1)
    cpos = qt.pos[cid]

    interpret = jax.default_backend() != "tpu"
    pi, pd = select_knn_pallas(
        xi, cand, cpos, k=8, radius2=float(SPEC.radius(2.0)) ** 2,
        tile=256, interpret=interpret,
    )
    gi, gd = query_grid(xi, qt, SPEC, k=8)

    pi, pd, gi, gd = map(np.asarray, (pi, pd, gi, gd))
    np.testing.assert_array_equal(pi >= 0, gi >= 0)
    fin = np.isfinite(gd)
    np.testing.assert_allclose(
        np.where(fin, pd, 0), np.where(fin, gd, 0), rtol=1e-5, atol=1e-8
    )


def test_packed_kernel_matches_xla(rng):
    """Packed-key variant: same neighbor SETS as the XLA path; d2 within
    the 15-bit mantissa rounding (~0.4% relative); order may swap only
    between near-tied distances."""
    pts = rng.uniform(-0.7, 0.7, (2000, 3)).astype(np.float32)
    x = rng.uniform(-0.8, 0.8, (512, 3)).astype(np.float32)
    qt = build_query_table(jnp.asarray(pts), SPEC, r=2.0)

    xi = jnp.asarray(x)
    cid = _cell_ids(xi, SPEC)
    in_grid = cid < SPEC.num_cells
    cid = jnp.where(in_grid, cid, 0)
    cand = jnp.where(in_grid[:, None], qt.idx[cid], -1)
    cpos = qt.pos[cid]

    interpret = jax.default_backend() != "tpu"
    pi, pd = select_knn_pallas(
        xi, cand, cpos, k=8, radius2=float(SPEC.radius(2.0)) ** 2,
        tile=256, interpret=interpret, packed=True,
    )
    gi, gd = query_grid(xi, qt, SPEC, k=8)

    pi, pd, gi, gd = map(np.asarray, (pi, pd, gi, gd))
    np.testing.assert_array_equal(pi >= 0, gi >= 0)
    fin = np.isfinite(gd)
    np.testing.assert_allclose(
        np.where(fin, pd, 0), np.where(fin, gd, 0), rtol=5e-3, atol=1e-8
    )
    # neighbor SETS match row-wise (order may swap on near-ties)
    for a, b in zip(pi, gi):
        assert set(a[a >= 0].tolist()) == set(b[b >= 0].tolist())


def test_packed_gate_via_query_grid(rng):
    """query_grid flips to the packed kernel only when n_points fits 15
    bits (static gate; CPU still takes the XLA path — just check the
    plumbing exists)."""
    from spurfies_tpu.ops.voxel_grid import QueryTable

    pts = rng.uniform(-0.5, 0.5, (100, 3)).astype(np.float32)
    qt = build_query_table(jnp.asarray(pts), SPEC, r=2.0)
    assert qt.n_points == 100
    leaves, treedef = jax.tree_util.tree_flatten(qt)
    qt2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert qt2.n_points == 100 and qt2.r == qt.r
