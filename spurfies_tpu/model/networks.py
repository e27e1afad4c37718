"""MLP parameter trees for the neural-point field.

Architecture spec from reference ``spurfies/model/pointneus_disent.py:70-110``:
  * F_geometry: 5x Linear(35->256->..->256), LeakyReLU(0.01) after the first
    4, no activation after the last.  FROZEN (pretrained local prior).
  * T: Linear(256->1), no activation.  FROZEN.
  * F_color: 4x Linear(103->256->..->256), LeakyReLU after the first 3.
  * R: Linear(277->256)->LReLU->Linear(256->256)->LReLU->Linear(256->3)
    -> sigmoid.

Pure-pytree params (no framework modules): the frozen/trainable split and the
torch-checkpoint remapping (train.py:124-143) are simple dict surgery.  Init
matches torch.nn.Linear defaults: U(-1/sqrt(fan_in), +1/sqrt(fan_in)) for
both W and b.
"""

import math

import jax
import jax.numpy as jnp

from spurfies_tpu.config import ModelConfig
from spurfies_tpu.core.embedder import encoding_dim

LEAKY_SLOPE = 0.01  # torch nn.LeakyReLU default


def linear_init(key, fan_in: int, fan_out: int, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(fan_in)
    wk, bk = jax.random.split(key)
    w = jax.random.uniform(wk, (fan_in, fan_out), dtype, -bound, bound)
    b = jax.random.uniform(bk, (fan_out,), dtype, -bound, bound)
    return {"w": w, "b": b}


def mlp_init(key, dims, dtype=jnp.float32):
    keys = jax.random.split(key, len(dims) - 1)
    return [
        linear_init(k, dims[i], dims[i + 1], dtype) for i, k in enumerate(keys)
    ]


def mlp_apply(layers, x, final_act=None, hidden_act="leaky_relu",
              compute_dtype=None):
    """Apply an MLP; activation after every layer except the last.

    compute_dtype: run matmuls in this dtype (bfloat16 for MXU) while keeping
    params in f32; output is cast back to x.dtype.
    """
    in_dtype = x.dtype
    for i, layer in enumerate(layers):
        w, b = layer["w"], layer["b"]
        # With a compute dtype, the matmul OUTPUT is requested in that dtype
        # too (the MXU still accumulates f32 internally and rounds once);
        # asking for f32 out + casting after the bias/activation makes XLA
        # materialize a f32 [M, 256] between every layer — measured 6.45 vs
        # 4.19 ms fwd (9.15 vs 5.72 fwd+bwd) at [262k, 103] on v5e.
        pet = jnp.float32 if compute_dtype is None else compute_dtype
        if compute_dtype is not None:
            x = x.astype(compute_dtype)
            w = w.astype(compute_dtype)
            b = b.astype(compute_dtype)
        x = jnp.dot(x, w, preferred_element_type=pet) + b
        if i < len(layers) - 1:
            if hidden_act == "leaky_relu":
                x = jax.nn.leaky_relu(x, LEAKY_SLOPE)
            elif hidden_act == "relu":
                x = jax.nn.relu(x)
    if final_act == "sigmoid":
        x = jax.nn.sigmoid(x)
    elif final_act == "leaky_relu":
        x = jax.nn.leaky_relu(x, LEAKY_SLOPE)
    return x.astype(in_dtype)


def init_model_params(key, cfg: ModelConfig):
    """Build the full parameter pytree, split frozen/trainable.

    Disentangled (default): ``{"frozen": {F_geometry, T},
    "train": {F_color, R, beta}}``; per-scene latents are added by
    neural_points.build_scene.

    Entangled (legacy ablation, reference pointneus.py:51-69): one trunk
    F([latent64, posenc4(x_pi)]) feeding both T (sdf) and R (color); all
    trainable, so frozen is empty.
    """
    kg, kt, kc, kr = jax.random.split(key, 4)
    fdim = cfg.feature_vector_size

    if cfg.entangled:
        f_in = fdim + encoding_dim(4, 3)          # 64 + 27
        r_in = 256 + encoding_dim(6, 3)           # 256 + 39
        train = {
            "F": mlp_init(kg, [f_in, 256, 256, 256, 256]),
            "T": mlp_init(kt, [256, 1]),
            "R": mlp_init(kr, [r_in, 256, 256, 3]),
            "beta": jnp.asarray(cfg.density.beta_init, dtype=jnp.float32),
        }
        return {"frozen": {}, "train": train}

    geo_in = fdim // 2 + 3
    color_in = fdim + encoding_dim(cfg.pos_multires, 3)
    r_in = 256 + encoding_dim(cfg.view_multires, 3)

    frozen = {
        "F_geometry": mlp_init(kg, [geo_in, 256, 256, 256, 256, 256]),
        "T": mlp_init(kt, [256, 1]),
    }
    train = {
        "F_color": mlp_init(kc, [color_in, 256, 256, 256, 256]),
        "R": mlp_init(kr, [r_in, 256, 256, 3]),
        "beta": jnp.asarray(cfg.density.beta_init, dtype=jnp.float32),
    }
    return {"frozen": frozen, "train": train}
