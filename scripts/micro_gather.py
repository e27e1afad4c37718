"""Microbench: in-kernel row gather from a VMEM-resident point table.

Decides the r4 in-kernel pair-compaction design (VERDICT r3 #1): the fused
pair-MLP kernels currently read XLA-pre-gathered ``[M*K, D+3]`` rows from
HBM; moving the gather INSIDE the kernel (table is ~6k x 40 f32 = <1 MB,
VMEM-resident) removes that HBM intermediate and lets compacted row
streams skip invalid pairs.  The unknown is the throughput of a
per-row dynamic VMEM read loop (Mosaic serializes scalar-indexed reads);
this measures it against XLA's ``table[idx]`` gather at production shapes.

    python scripts/micro_gather.py [--rows 655360] [--n 6144]
"""

import argparse
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(idx_ref, table_ref, out_ref, *, rows, unroll):
    def body(t, carry):
        base = t * unroll
        for j in range(unroll):
            i = idx_ref[base + j]
            out_ref[pl.ds(base + j, 1), :] = table_ref[pl.ds(i, 1), :]
        return carry

    jax.lax.fori_loop(0, rows // unroll, body, 0)


@partial(jax.jit, static_argnames=("tile", "unroll", "interpret"))
def gather_rows_pallas(table, idx, tile=2048, unroll=8, interpret=False):
    m = idx.shape[0]
    n, d = table.shape
    pad = (-m) % tile
    if pad:
        idx = jnp.pad(idx, (0, pad))
    mp = m + pad
    out = pl.pallas_call(
        partial(_gather_kernel, rows=tile, unroll=unroll),
        grid=(mp // tile,),
        in_specs=[
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((n, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, d), table.dtype),
        interpret=interpret,
    )(idx, table)
    return out[:m]


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.asarray(out).ravel()[0])        # axon: force host readback
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=655360)
    ap.add_argument("--n", type=int, default=6144)
    ap.add_argument("--d", type=int, default=40)
    args = ap.parse_args()

    interpret = jax.default_backend() != "tpu"
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(args.n, args.d)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, args.n, args.rows), jnp.int32)

    xla = jax.jit(lambda t, i: t[i])
    ms_xla = timeit(xla, table, idx)
    print(f"xla gather       [{args.rows}, {args.d}]: {ms_xla:7.2f} ms")

    for tile in (1024, 2048, 4096):
        for unroll in (4, 8, 16):
            f = partial(gather_rows_pallas, tile=tile, unroll=unroll,
                        interpret=interpret)
            got = f(table, idx[:4096])
            np.testing.assert_allclose(np.asarray(got),
                                       np.asarray(table)[idx[:4096]])
            ms = timeit(f, table, idx)
            print(f"pallas tile={tile:5d} unroll={unroll:2d}: "
                  f"{ms:7.2f} ms")


if __name__ == "__main__":
    main()
