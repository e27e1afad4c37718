"""Sub-segment timing of the color path (aggregate_color) on TPU.

The in-step color cost at production shapes ([M=32k shading points, K=8])
is ~7.5 ms fwd / ~12.2 ms fwd+bwd while its matmul FLOPs (~117 GFLOP bf16
fwd) are worth <1 ms — it is gather/elementwise/HBM bound, not MXU bound.
This harness times each stage in isolation to locate the traffic.

    python scripts/micro_color.py
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
    from spurfies_tpu.config import ModelConfig
    from spurfies_tpu.model import field
    from spurfies_tpu.model.networks import init_model_params, mlp_apply

    print(f"devices: {jax.devices()}", flush=True)
    M, K, N = 32768, 8, 8192
    key = jax.random.PRNGKey(0)
    params = init_model_params(key, ModelConfig())
    tp = params["train"]
    points = jax.random.normal(key, (N, 3))
    latents = jax.random.normal(key, (N, 64)) * 0.01
    idx = jax.random.randint(key, (M, K), 0, N)
    valid = jnp.ones((M, K), bool)
    x = jax.random.normal(key, (M, 3)) * 0.5
    dirs = jax.random.normal(key, (M, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    full = jax.jit(lambda tp, lat: field.aggregate_color(
        tp, lat, points, idx, valid, x, dirs, 45.0))
    print(f"color_fwd_full      {timeit(full, tp, latents):7.2f} ms")

    def fwd_loss(tp, lat):
        return jnp.sum(field.aggregate_color(tp, lat, points, idx, valid,
                                             x, dirs, 45.0))
    fb = jax.jit(jax.grad(fwd_loss, argnums=(0, 1)))
    print(f"color_fwdbwd_full   {timeit(fb, tp, latents):7.2f} ms")

    gather = jax.jit(lambda lat: field.gather_latents(latents, idx))
    print(f"gather_cfeat        {timeit(gather, latents):7.2f} ms")

    gather_b = jax.jit(lambda lat: field.gather_latents(
        lat.astype(jnp.bfloat16), idx))
    print(f"gather_cfeat_bf16   {timeit(gather_b, latents):7.2f} ms")

    penc = jax.jit(lambda x_pi: field.positional_encoding(x_pi, 6))
    x_pi = x[:, None, :] - points[jnp.maximum(idx, 0)]
    print(f"posenc_xpi          {timeit(penc, x_pi):7.2f} ms")

    field_in = jnp.concatenate(
        [field.positional_encoding(x_pi, 6),
         latents[jnp.maximum(idx, 0)]], axis=-1)
    mlp = jax.jit(lambda tp, fi: mlp_apply(tp["F_color"], fi,
                                           compute_dtype=jnp.bfloat16))
    print(f"F_color_mlp_only    {timeit(mlp, tp, field_in):7.2f} ms")

    def mlp_loss(tp, fi):
        return jnp.sum(mlp_apply(tp["F_color"], fi,
                                 compute_dtype=jnp.bfloat16))
    mlp_fb = jax.jit(jax.grad(mlp_loss, argnums=(0, 1)))
    print(f"F_color_mlp_fwdbwd  {timeit(mlp_fb, tp, field_in):7.2f} ms")

    def mlp_bf16_out(layers, x):
        # variant: matmul OUTPUT requested in bf16 (epilogue add/lrelu in
        # bf16) — avoids any f32 [M, 256] materialization between layers
        from spurfies_tpu.model.networks import LEAKY_SLOPE
        x = x.astype(jnp.bfloat16)
        for i, layer in enumerate(layers):
            w = layer["w"].astype(jnp.bfloat16)
            b = layer["b"].astype(jnp.bfloat16)
            x = jnp.dot(x, w, preferred_element_type=jnp.bfloat16) + b
            if i < len(layers) - 1:
                x = jax.nn.leaky_relu(x, LEAKY_SLOPE)
        return x

    mlp_b = jax.jit(lambda tp, fi: mlp_bf16_out(tp["F_color"], fi))
    print(f"F_color_bf16out     {timeit(mlp_b, tp, field_in):7.2f} ms")

    field_in_b = field_in.astype(jnp.bfloat16)
    print(f"F_color_bf16in      {timeit(mlp_b, tp, field_in_b):7.2f} ms")

    def mlp_b_loss(tp, fi):
        return jnp.sum(mlp_bf16_out(tp["F_color"], fi).astype(jnp.float32))
    mlp_b_fb = jax.jit(jax.grad(mlp_b_loss, argnums=(0, 1)))
    print(f"F_color_bf16out_fb  {timeit(mlp_b_fb, tp, field_in):7.2f} ms")

    feat = mlp_apply(tp["F_color"], field_in, compute_dtype=jnp.bfloat16)
    w = jnp.abs(jax.random.normal(key, (M, K)))

    def agg_r(tp, feat):
        a = jnp.sum(w[..., None] * feat, axis=-2) / K
        dir_enc = field.positional_encoding(dirs, 3)
        return mlp_apply(tp["R"], jnp.concatenate([dir_enc, a], -1),
                         final_act="sigmoid", compute_dtype=jnp.bfloat16)
    print(f"agg_plus_R          {timeit(jax.jit(agg_r), tp, feat):7.2f} ms")


if __name__ == "__main__":
    main()
