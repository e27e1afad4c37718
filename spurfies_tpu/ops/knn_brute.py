"""Brute-force radius-kNN: the reference oracle for the voxel-grid kernel.

O(M*N) distances via one big matmul-friendly computation; used in tests to
verify :mod:`spurfies_tpu.ops.voxel_grid` (SURVEY §7 build step 2a) and as a
fallback for unbounded scenes where a dense table would be large.
"""

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k", "chunk"))
def knn_brute(x: jnp.ndarray, points: jnp.ndarray, k: int = 8,
              radius: float = 0.05, chunk: int = 4096):
    """k nearest points within ``radius`` of each query.

    Args:
      x: ``[M, 3]`` queries; points: ``[N, 3]``.

    Returns:
      (idx ``[M, k]`` int32, -1 where missing; d2 ``[M, k]``, inf invalid).
    """
    m = x.shape[0]
    r2 = radius * radius
    pad = (-m) % chunk
    xp = jnp.pad(x, ((0, pad), (0, 0)))

    # |x - p|^2 = |x|^2 - 2 x.p + |p|^2 — the cross term is a matmul (MXU).
    # HIGHEST precision: the default bf16 TPU matmul loses ~1e-3 on d^2,
    # which flips validity for neighbors near the radius boundary.
    p_sq = jnp.sum(points ** 2, axis=-1)

    def one_chunk(xc):
        d2 = (
            jnp.sum(xc ** 2, axis=-1, keepdims=True)
            - 2.0 * jnp.matmul(xc, points.T,
                               precision=jax.lax.Precision.HIGHEST)
            + p_sq[None, :]
        )
        d2 = jnp.maximum(d2, 0.0)
        d2 = jnp.where(d2 <= r2, d2, jnp.inf)
        neg, idx = jax.lax.top_k(-d2, k)
        top_d2 = -neg
        idx = jnp.where(jnp.isfinite(top_d2), idx, -1)
        return idx.astype(jnp.int32), top_d2

    idx, d2 = jax.lax.map(one_chunk, xp.reshape(-1, chunk, 3))
    return idx.reshape(-1, k)[:m], d2.reshape(-1, k)[:m]
