"""Tile-size sweep for the fused pair-SDF Pallas kernels (TPU).

The kernels re-fetch the 6 weight blocks every grid step, so larger tiles
amortize weight DMA + grid overhead against VMEM headroom (tile 4096 rows
x 256 wide bf16 activations + gates ~ 12 MB, near the 16 MB/core budget).

    python scripts/sweep_tile.py
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
    from spurfies_tpu.model.networks import init_model_params
    from spurfies_tpu.config import ModelConfig
    from spurfies_tpu.ops import pallas_mlp

    print(f"devices: {jax.devices()}", flush=True)
    params = init_model_params(jax.random.PRNGKey(0), ModelConfig())
    frozen = params["frozen"]

    # production pair-row counts: sdf_and_grad ~82k pts x 8 = 655k rows;
    # sampler probe 131k x 8 = 1.05M rows (value-only)
    rng = np.random.default_rng(0)
    u_grad = jnp.asarray(rng.normal(size=(655360, 35)).astype(np.float32))
    u_val = jnp.asarray(rng.normal(size=(1048576, 35)).astype(np.float32))

    for tile in (512, 1024, 2048, 4096, 8192):
        pallas_mlp.set_tile(tile)
        try:
            ms_g = timeit(
                lambda u: pallas_mlp.pair_sdf_value_and_input_grad(
                    frozen, u), u_grad)
        except Exception as e:  # noqa: BLE001 - VMEM overflow at big tiles
            ms_g = float("nan")
            print(f"  grad tile={tile}: {type(e).__name__}", flush=True)
        try:
            ms_v = timeit(lambda u: pallas_mlp.pair_sdf_value(frozen, u),
                          u_val)
        except Exception as e:  # noqa: BLE001
            ms_v = float("nan")
            print(f"  value tile={tile}: {type(e).__name__}", flush=True)
        print(f"tile={tile:5d}  grad@655k {ms_g:7.2f} ms   "
              f"value@1.05M {ms_v:7.2f} ms", flush=True)
    pallas_mlp.set_tile(1024)


if __name__ == "__main__":
    main()
