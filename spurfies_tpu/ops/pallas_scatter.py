"""Pallas TPU kernel: row scatter-add (latent-gradient accumulation).

The train step's latent cotangents are scatter-adds of pair rows into the
point-latent tables: geometry ``[M*K, 32] -> [N, 32]`` and color
``[M*K, 64] -> [N, 64]`` (the VJPs of the neighbor gathers in
model/field.py).  XLA's unsorted scatter-add runs ~16 GB/s-effective on
TPU (profile_step.py: 4.15 ms for a 262k x 64 scatter); this kernel keeps
the whole accumulator resident in VMEM across grid steps and serializes
only the per-row dynamic-index add.

Bank trick: ``B`` independent accumulator copies; row ``t*B + j`` lands in
bank ``j``, so the B adds inside one loop iteration touch disjoint buffers
and Mosaic can overlap them; a final cross-bank reduce runs in XLA.

Falls back to XLA's ``.at[].add`` when the accumulator would not fit VMEM
(large point clouds) — callers never need to branch.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for the banked accumulator (bytes).  Must leave room not
# just for this kernel's ct tile + double buffering but for a SECOND
# concurrently-scheduled kernel: XLA overlaps the color and geometry
# latent scatters (and/or the fused pair-MLP kernel) in the same scoped
# vmem region — a 10 MB budget compiled fine in the dense train graph but
# hit "scoped vmem limit exceeded (19.22M > 16M)" once the ray-compacted
# graph changed the schedule.
_TRUE_ACC_BUDGET = 12 * 2 ** 20  # lane-padded VMEM bytes for the banks
_MAX_BANKS = 8


def _scatter_kernel(idx_ref, ct_ref, out_ref, *, banks, rows):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    def body(t, carry):
        base = t * banks
        for j in range(banks):
            i = idx_ref[base + j]
            row = ct_ref[pl.ds(base + j, 1), :]
            out_ref[j, pl.ds(i, 1), :] += row
        return carry

    jax.lax.fori_loop(0, rows // banks, body, 0)


@partial(jax.jit, static_argnames=("n", "tile", "interpret"))
def scatter_add_rows(ct: jnp.ndarray, idx: jnp.ndarray, n: int,
                     tile: int = 4096, interpret: bool = False):
    """``out[idx[m]] += ct[m]`` with a VMEM-resident accumulator.

    Args:
      ct: ``[M, D]`` f32 rows to accumulate.
      idx: ``[M]`` int32 targets; out-of-range (< 0 or >= n) rows are
        dropped (they land on a dump row).
      n: number of output rows (static).

    Returns ``[n, D]`` f32.
    """
    m, d = ct.shape
    # dump row for invalid/padding indices, then sublane-align
    np_rows = -(-(n + 1) // 8) * 8
    # the f32 (8,128) tiling pads the lane dim: a [rows, d<128] bank
    # occupies rows x 128 lanes in VMEM (r5 fix — budgeting nominal bytes
    # let the accumulator blow the 16 MB scoped-vmem stack limit on
    # hardware once the schedule changed)
    d_lanes = -(-d // 128) * 128
    bank_bytes = np_rows * d_lanes * 4
    banks = min(_MAX_BANKS, max(1, _TRUE_ACC_BUDGET // bank_bytes))

    # NEGATIVE RESULT (r4, don't retry): splitting wide rows (d=64) into
    # two d=32 scatters to regain banks (3 -> 6) wins standalone (2.14 ->
    # ~1.25 ms micro) but LOSES in the train graph (24.51 vs 23.64
    # ms/step) — the two column slices + concat materialize extra [M, 32]
    # HBM traffic and the halves serialize against the graph's other VMEM
    # -resident kernels.

    if banks < 1 or bank_bytes > _TRUE_ACC_BUDGET:
        return jnp.zeros((n, d), ct.dtype).at[
            jnp.clip(idx, 0, n - 1)
        ].add(jnp.where(((idx >= 0) & (idx < n))[:, None], ct, 0.0))

    idx = jnp.where((idx >= 0) & (idx < n), idx, n).astype(jnp.int32)
    pad = (-m) % tile
    if pad:
        ct = jnp.pad(ct, ((0, pad), (0, 0)))
        idx = jnp.pad(idx, (0, pad), constant_values=n)
    mp = m + pad

    out = pl.pallas_call(
        partial(_scatter_kernel, banks=banks, rows=tile),
        grid=(mp // tile,),
        in_specs=[
            pl.BlockSpec((tile,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((banks, np_rows, d), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((banks, np_rows, d), jnp.float32),
        interpret=interpret,
    )(idx, ct)
    return jnp.sum(out, axis=0)[:n]
