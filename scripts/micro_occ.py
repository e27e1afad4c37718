"""Micro-benchmark: fine-occupancy bitmap gather variants on TPU.

fine_occupancy's one-int-per-position gather measured 2.0 ms of the
33.6 ms train step (trace r3) — far above speed-of-light for 131k random
lookups in a ~0.5 MB table.  Candidates: the bool (i8) gather as shipped,
wider table element types (i32 avoids sub-word lowering), and a packed
uint32-word bitmap (gather one word per 32 cells + bit test — 16 KB table
fits VMEM-resident easily).

    python scripts/micro_occ.py [--m 131072]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    # tunnel dispatch floor ~2 ms: time a burst, not single calls
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=131072)
    ap.add_argument("--cells", type=int, default=80 ** 3)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    occ_np = rng.random(args.cells) < 0.1
    cid_np = rng.integers(0, args.cells, args.m).astype(np.int32)

    occ_b = jnp.asarray(occ_np)
    occ_i8 = jnp.asarray(occ_np.astype(np.int8))
    occ_i32 = jnp.asarray(occ_np.astype(np.int32))
    pad = (-args.cells) % 32
    packed_np = np.packbits(
        np.pad(occ_np, (0, pad)).reshape(-1, 32), axis=1,
        bitorder="little",
    ).view(np.uint32).ravel()
    occ_w = jnp.asarray(packed_np)
    cid = jnp.asarray(cid_np)

    @jax.jit
    def f_bool(t, c):
        return t[c]

    @jax.jit
    def f_i8(t, c):
        return t[c] != 0

    @jax.jit
    def f_i32(t, c):
        return t[c] != 0

    @jax.jit
    def f_packed(t, c):
        w = t[c >> 5]
        return (w >> (c & 31).astype(jnp.uint32)) & 1 != 0

    # row-gather + lane select: XLA gathers whole rows fast (the query
    # table's [C, 3, qcap] row gather moves 100x the bytes in 1/3 the
    # time); fetch the 128-cell row containing the bit, then pick the
    # lane with a compare-iota reduce (no second gather).
    padr = (-args.cells) % 128
    rows = jnp.asarray(
        np.pad(occ_np, (0, padr)).astype(np.int8).reshape(-1, 128))
    lanes = jnp.arange(128, dtype=jnp.int32)

    @jax.jit
    def f_row(t, c):
        r = t[c >> 7]                                  # [M, 128] i8
        hit = lanes[None, :] == (c & 127)[:, None]
        return jnp.sum(jnp.where(hit, r, 0), axis=1) != 0

    # packed rows: 128 u32 words per row = 4096 cells per row
    padw = (-occ_w.shape[0]) % 128
    wrows = jnp.asarray(
        np.pad(np.asarray(occ_w), (0, padw)).reshape(-1, 128))

    @jax.jit
    def f_wrow(t, c):
        w = c >> 5
        r = t[w >> 7]                                  # [M, 128] u32
        hit = lanes[None, :] == (w & 127)[:, None]
        word = jnp.sum(jnp.where(hit, r, 0).astype(jnp.uint32), axis=1)
        return (word >> (c & 31).astype(jnp.uint32)) & 1 != 0

    ref = occ_np[cid_np]
    for name, fn, tab in (("bool", f_bool, occ_b), ("i8", f_i8, occ_i8),
                          ("i32", f_i32, occ_i32),
                          ("packed_u32", f_packed, occ_w),
                          ("row_i8", f_row, rows),
                          ("row_u32", f_wrow, wrows)):
        got = np.asarray(fn(tab, cid))
        assert (got == ref).all(), name
        ms = timeit(fn, tab, cid)
        print(f"{name:>12}: {ms:7.3f} ms for {args.m} lookups")


if __name__ == "__main__":
    main()
