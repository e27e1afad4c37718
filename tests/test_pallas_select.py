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
