"""Parity tests for the banked scatter-add kernel (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from spurfies_tpu.ops.pallas_scatter import scatter_add_rows


def _ref(ct, idx, n):
    out = np.zeros((n, ct.shape[1]), np.float32)
    for i, r in zip(idx, ct):
        if 0 <= i < n:
            out[i] += r
    return out


@pytest.mark.parametrize("m,d,n", [(4096, 32, 512), (2048, 64, 96)])
def test_scatter_parity(rng, m, d, n):
    idx = rng.integers(-3, n + 3, size=m).astype(np.int32)
    ct = rng.normal(size=(m, d)).astype(np.float32)
    out = scatter_add_rows(jnp.asarray(ct), jnp.asarray(idx), n,
                           tile=512, interpret=True)
    np.testing.assert_allclose(np.asarray(out), _ref(ct, idx, n),
                               rtol=1e-5, atol=1e-5)


def test_scatter_duplicates_heavy(rng):
    # everything lands on 3 rows — worst-case serialization correctness
    m, d, n = 1024, 32, 8
    idx = rng.integers(0, 3, size=m).astype(np.int32)
    ct = rng.normal(size=(m, d)).astype(np.float32)
    out = scatter_add_rows(jnp.asarray(ct), jnp.asarray(idx), n,
                           tile=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), _ref(ct, idx, n),
                               rtol=1e-4, atol=1e-4)


def test_scatter_large_n_falls_back(rng):
    # accumulator over VMEM budget -> XLA fallback, same semantics
    m, d, n = 512, 64, 200_000
    idx = rng.integers(0, n, size=m).astype(np.int32)
    ct = rng.normal(size=(m, d)).astype(np.float32)
    out = scatter_add_rows(jnp.asarray(ct), jnp.asarray(idx), n, tile=512,
                           interpret=True)
    assert out.shape == (n, d)
    # spot-check a few occupied rows
    ref_rows = _ref(ct, idx, n)
    nz = np.nonzero(ref_rows.any(axis=1))[0][:20]
    np.testing.assert_allclose(np.asarray(out)[nz], ref_rows[nz],
                               rtol=1e-5, atol=1e-5)
