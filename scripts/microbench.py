"""Primitive microbenchmarks for the hot-path building blocks.

These are the measurements that drove (and falsified) the round-2 perf
decisions — keep them runnable so future tuning starts from numbers, not
intuition.  Prints one line per primitive.

    python scripts/microbench.py [--quick]

Backend notes (NOTES_ROUND2): on the tunneled TPU, sort-family calls cost
~1.5-5 ms nearly independent of size (per-call overhead dominates), a
vmapped jnp.searchsorted lowers to a pathological gather loop (157 ms at
eval shapes), and AoS ``[N, 3]`` row gathers pad 3 -> 128 lanes.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *a, n=10):
    for _ in range(3):
        out = fn(*a)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    n = 5 if args.quick else 15

    def row(tag, ms):
        print(f"{tag:<46s} {ms:8.2f} ms", flush=True)

    # sort family at hot-path shapes
    z = jnp.asarray(rng.uniform(0, 4.5, (1024, 98)).astype(np.float32))
    row("jnp.sort [1024,98]", timeit(jax.jit(lambda a: jnp.sort(a, -1)), z,
                                     n=n))
    w = jnp.asarray(rng.random((1024, 80)).astype(np.float32))
    row("lax.top_k [1024,80]->32",
        timeit(jax.jit(lambda a: jax.lax.top_k(a, 32)), w, n=n))

    # sample_pdf (comparison-count searchsorted)
    from spurfies_tpu.model.sampler import sample_pdf
    bins = jnp.sort(
        jnp.asarray(rng.uniform(0, 4.5, (1024, 128)).astype(np.float32)), -1
    )
    pdf = jnp.asarray(rng.random((1024, 127)).astype(np.float32))
    row("sample_pdf [1024,128]->64",
        timeit(jax.jit(
            lambda b, p: sample_pdf(jax.random.PRNGKey(0), b, p, 64, False)
        ), bins, pdf, n=n))

    # kNN query at probe scale
    from spurfies_tpu.config import ModelConfig
    from spurfies_tpu.model.neural_points import build_scene
    from spurfies_tpu.ops.voxel_grid import query_grid

    v = rng.normal(size=(8000, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    pts = (0.5 * v).astype(np.float32)
    scene, _ = build_scene(jax.random.PRNGKey(0), pts, ModelConfig(),
                           rng.uniform(0, 255, (8000, 3)))
    m = 131072 if not args.quick else 16384
    npts = len(np.asarray(scene.points))
    x = jnp.asarray(
        np.asarray(scene.points)[rng.integers(0, npts, m)]
        + rng.normal(0, 0.06, (m, 3)).astype(np.float32)
    )
    row(f"query_grid [{m}] k=8",
        timeit(jax.jit(
            lambda xx: query_grid(xx, scene.table, scene.spec, k=8)
        ), x, n=n))

    # fused pair-MLP kernels
    from spurfies_tpu.model.networks import init_model_params
    from spurfies_tpu.ops.pallas_mlp import (
        pair_sdf_value,
        pair_sdf_value_and_input_grad,
    )
    frozen = init_model_params(jax.random.PRNGKey(1), ModelConfig())["frozen"]
    pairs = 655360 if not args.quick else 65536
    u = jnp.asarray(np.concatenate(
        [rng.normal(0, 0.3, (pairs, 32)), rng.normal(0, 0.03, (pairs, 3))],
        -1,
    ).astype(np.float32))
    row(f"pair_sdf_value [{pairs}] (bf16)",
        timeit(lambda: pair_sdf_value(frozen, u, jnp.bfloat16), n=n))
    row(f"pair_sdf_value_and_input_grad [{pairs}]",
        timeit(lambda: pair_sdf_value_and_input_grad(frozen, u,
                                                     jnp.bfloat16), n=n))


if __name__ == "__main__":
    main()
