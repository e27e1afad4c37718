"""Standalone TPU microbench: latent scatter-add strategies.

The train step's two biggest non-MLP costs are the latent-gather VJPs:
color [262k, 64] -> [N, 64] and geometry [655k, 32] -> [N, 32] scatter-adds
(profile_step.py: latent_scatter_262k_ms ~4 ms standalone).  Candidates:

  xla_f32    jnp .at[].add, f32 cotangents (what autodiff emits today)
  xla_bf16   same with bf16 cotangents (halves scatter element bytes)
  sort_seg   sort pairs by target row + segment_sum (sorted-scatter lowering)
  onehot_mm  blocked one-hot matmul on the MXU (FLOPs traded for regularity)
  pallas     banked VMEM-resident accumulator (ops/pallas_scatter.py)

    python scripts/micro_scatter.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *a, n=20):
    for _ in range(3):
        out = fn(*a)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)

    for m, d, n_pts in [(262144, 64, 8192), (655360, 32, 8192),
                        (655360, 32, 65536)]:
        # ray-sample-local indices: consecutive queries share neighbors
        # (walk a blocky index pattern like real kNN results do)
        base = np.repeat(rng.integers(0, n_pts, size=m // 64), 64)
        seg = np.clip(base + rng.integers(0, 32, size=m), 0, n_pts - 1)
        seg = jnp.asarray(seg, jnp.int32)
        ct = jnp.asarray(rng.normal(size=(m, d)).astype(np.float32))

        @jax.jit
        def xla_f32(ct, seg=seg, n_pts=n_pts, d=d):
            return jnp.zeros((n_pts, d), jnp.float32).at[seg].add(ct)

        @jax.jit
        def xla_bf16(ct, seg=seg, n_pts=n_pts, d=d):
            out = jnp.zeros((n_pts, d), jnp.bfloat16).at[seg].add(
                ct.astype(jnp.bfloat16))
            return out.astype(jnp.float32)

        @jax.jit
        def sort_seg(ct, seg=seg, n_pts=n_pts):
            order = jnp.argsort(seg)
            return jax.ops.segment_sum(ct[order], seg[order],
                                       num_segments=n_pts,
                                       indices_are_sorted=True)

        @jax.jit
        def onehot_mm(ct, seg=seg, n_pts=n_pts, m=m):
            # blocked over target rows: [m] idx -> bf16 one-hot [TB, m] per
            # block, MXU matmul into [TB, d]
            tb = 2048
            ctb = ct.astype(jnp.bfloat16)

            def blk(i):
                oh = (seg[None, :] == (i * tb + jnp.arange(tb)[:, None])
                      ).astype(jnp.bfloat16)
                return jnp.dot(oh, ctb, preferred_element_type=jnp.float32)

            outs = jax.lax.map(blk, jnp.arange(n_pts // tb))
            return outs.reshape(n_pts, -1)

        from spurfies_tpu.ops.pallas_scatter import scatter_add_rows

        @jax.jit
        def pallas(ct, seg=seg, n_pts=n_pts):
            return scatter_add_rows(ct, seg, n_pts)

        row = {"m": m, "d": d, "n": n_pts,
               "xla_f32": timeit(xla_f32, ct),
               "xla_bf16": timeit(xla_bf16, ct),
               "sort_seg": timeit(sort_seg, ct),
               "pallas": timeit(pallas, ct)}
        if n_pts <= 8192:
            row["onehot_mm"] = timeit(onehot_mm, ct)
        print({k: (round(v, 2) if isinstance(v, float) else v)
               for k, v in row.items()}, flush=True)


if __name__ == "__main__":
    main()
