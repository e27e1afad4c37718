"""DUSt3R-style two-view stereo network in JAX (CroCo architecture).

Completes SURVEY §2.1.3: the reference consumes DUSt3R point clouds from an
external torch submodule (empty in the snapshot); here the inference network
itself is TPU-native: ViT-L encoder with 2D rotary attention, two
cross-attending ViT-B decoders, and per-patch regression heads producing
(pointmap, confidence) for each view — feeding prep.alignment and
prep.pointcloud.

Architecture (CroCo v2 / DUSt3R lineage):
  * patch embed 16x16 conv, no cls token;
  * encoder: 24 x [LN -> RoPE2D-MHA -> LN -> GELU-MLP(4x)], dim 1024/16h;
  * decoder: embed 1024->768, 12 x [self-attn (RoPE2D) -> cross-attn to the
    other view's tokens -> MLP], separate weight sets per view;
  * linear head: per-patch Linear(768 -> 16*16*4) -> unshuffle -> [H, W, 4]
    = xyz + confidence; exp-mode postprocess (conf = 1 + exp(c)).

Weight conversion from the released torch checkpoint is provided on a
best-effort key mapping (convert_dust3r); exact numerical parity against
the upstream model must be validated once the checkpoint artifact is
available (zero-egress here) — block/attention/RoPE numerics are unit-tested
against torch equivalents in tests/test_dust3r_net.py.
"""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Dust3rConfig:
    img_size: tuple = (384, 512)   # (H, W)
    patch: int = 16
    enc_dim: int = 1024
    enc_depth: int = 24
    enc_heads: int = 16
    dec_dim: int = 768
    dec_depth: int = 12
    dec_heads: int = 12
    rope_freq: float = 100.0

    @property
    def grid(self):
        return (self.img_size[0] // self.patch,
                self.img_size[1] // self.patch)

    @property
    def n_tokens(self):
        gh, gw = self.grid
        return gh * gw


# ---------------------------------------------------------------------------
# RoPE2D
# ---------------------------------------------------------------------------

def rope2d_angles(positions: jnp.ndarray, head_dim: int,
                  freq: float = 100.0):
    """cos/sin tables for 2D rotary embedding.

    positions: ``[N, 2]`` (y, x) patch coordinates.  The head dim is split
    in halves: first half rotated by y, second by x (CroCo RoPE2D).

    Returns (cos ``[N, head_dim//2]``, sin) where each half-table has
    head_dim//4 distinct frequencies duplicated across the pair dims.
    """
    d4 = head_dim // 4
    inv = 1.0 / (freq ** (jnp.arange(d4) / d4))          # [d4]
    ang_y = positions[:, 0:1] * inv[None]                # [N, d4]
    ang_x = positions[:, 1:2] * inv[None]
    ang = jnp.concatenate([ang_y, ang_x], axis=-1)       # [N, d2]
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """Rotate pairs (x[2i], x[2i+1]) within each half.

    x: ``[..., N, D]`` with D = 2 * len(cos[-1]); interleaved-pair rotation
    (torch RoPE2D convention: stack [-x2, x1]).
    """
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    out1 = x1 * cos - x2 * sin
    out2 = x2 * cos + x1 * sin
    out = jnp.stack([out1, out2], axis=-1)
    return out.reshape(x.shape)


# ---------------------------------------------------------------------------
# Layers (pure-pytree params like model/networks.py)
# ---------------------------------------------------------------------------

def _linear(key, din, dout):
    bound = 1.0 / np.sqrt(din)
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (din, dout), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (dout,), jnp.float32, -bound, bound),
    }


def _ln(dim):
    return {"g": jnp.ones((dim,)), "b": jnp.zeros((dim,))}


def layer_norm(p, x, eps=1e-6):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


def linear(p, x):
    return jnp.dot(x, p["w"], preferred_element_type=jnp.float32) + p["b"]


def attention(p, xq, xkv, heads, rope_q=None, rope_k=None):
    """MHA; optional rotary embedding on q and k.

    xq: ``[Nq, D]``; xkv: ``[Nk, D]``; rope_*: (cos, sin) tables.
    """
    nq, d = xq.shape
    nk = xkv.shape[0]
    hd = d // heads

    q = linear(p["q"], xq).reshape(nq, heads, hd).transpose(1, 0, 2)
    k = linear(p["k"], xkv).reshape(nk, heads, hd).transpose(1, 0, 2)
    v = linear(p["v"], xkv).reshape(nk, heads, hd).transpose(1, 0, 2)

    if rope_q is not None:
        q = apply_rope(q, *rope_q)
    if rope_k is not None:
        k = apply_rope(k, *rope_k)

    att = jnp.einsum("hqd,hkd->hqk", q, k) / np.sqrt(hd)
    att = jax.nn.softmax(att, axis=-1)
    out = jnp.einsum("hqk,hkd->hqd", att, v)
    out = out.transpose(1, 0, 2).reshape(nq, d)
    return linear(p["proj"], out)


def mlp_block(p, x):
    return linear(p["fc2"], jax.nn.gelu(linear(p["fc1"], x)))


def _attn_params(key, dim):
    ks = jax.random.split(key, 4)
    return {
        "q": _linear(ks[0], dim, dim),
        "k": _linear(ks[1], dim, dim),
        "v": _linear(ks[2], dim, dim),
        "proj": _linear(ks[3], dim, dim),
    }


def _block_params(key, dim, cross=False):
    ks = jax.random.split(key, 6)
    p = {
        "ln1": _ln(dim),
        "attn": _attn_params(ks[0], dim),
        "ln2": _ln(dim),
        "mlp": {
            "fc1": _linear(ks[1], dim, 4 * dim),
            "fc2": _linear(ks[2], 4 * dim, dim),
        },
    }
    if cross:
        p["ln_cross"] = _ln(dim)
        p["ln_ctx"] = _ln(dim)
        p["cross"] = _attn_params(ks[3], dim)
    return p


def init_dust3r(key, cfg: Dust3rConfig = Dust3rConfig()):
    ks = jax.random.split(key, 8)
    params = {
        "patch_embed": {
            "w": 0.02 * jax.random.normal(
                ks[0], (cfg.patch, cfg.patch, 3, cfg.enc_dim)
            ),
            "b": jnp.zeros((cfg.enc_dim,)),
        },
        "enc_blocks": [
            _block_params(k, cfg.enc_dim)
            for k in jax.random.split(ks[1], cfg.enc_depth)
        ],
        "enc_norm": _ln(cfg.enc_dim),
        "decoder_embed": _linear(ks[2], cfg.enc_dim, cfg.dec_dim),
        "dec_blocks": [
            _block_params(k, cfg.dec_dim, cross=True)
            for k in jax.random.split(ks[3], cfg.dec_depth)
        ],
        "dec_blocks2": [
            _block_params(k, cfg.dec_dim, cross=True)
            for k in jax.random.split(ks[4], cfg.dec_depth)
        ],
        "dec_norm": _ln(cfg.dec_dim),
        "head1": _linear(ks[5], cfg.dec_dim, cfg.patch * cfg.patch * 4),
        "head2": _linear(ks[6], cfg.dec_dim, cfg.patch * cfg.patch * 4),
    }
    return params


def enc_block(p, x, rope, heads):
    x = x + attention(p["attn"], layer_norm(p["ln1"], x),
                      layer_norm(p["ln1"], x), heads,
                      rope_q=rope, rope_k=rope)
    return x + mlp_block(p["mlp"], layer_norm(p["ln2"], x))


def dec_block(p, x, ctx, rope, rope_ctx, heads):
    h = layer_norm(p["ln1"], x)
    x = x + attention(p["attn"], h, h, heads, rope_q=rope, rope_k=rope)
    x = x + attention(
        p["cross"], layer_norm(p["ln_cross"], x),
        layer_norm(p["ln_ctx"], ctx), heads,
        rope_q=rope, rope_k=rope_ctx,
    )
    return x + mlp_block(p["mlp"], layer_norm(p["ln2"], x))


def patchify(params, img, cfg):
    """img [H, W, 3] -> tokens [N, enc_dim] via strided conv."""
    x = jax.lax.conv_general_dilated(
        img[None], params["patch_embed"]["w"],
        (cfg.patch, cfg.patch), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0] + params["patch_embed"]["b"]
    return x.reshape(-1, cfg.enc_dim)


def _positions(cfg):
    gh, gw = cfg.grid
    yy, xx = np.mgrid[0:gh, 0:gw]
    return jnp.asarray(
        np.stack([yy, xx], -1).reshape(-1, 2).astype(np.float32)
    )


def encode(params, img, cfg: Dust3rConfig):
    pos = _positions(cfg)
    rope = rope2d_angles(pos, cfg.enc_dim // cfg.enc_heads, cfg.rope_freq)
    x = patchify(params, img, cfg)
    for blk in params["enc_blocks"]:
        x = enc_block(blk, x, rope, cfg.enc_heads)
    return layer_norm(params["enc_norm"], x)


def decode_pair(params, feat1, feat2, cfg: Dust3rConfig):
    pos = _positions(cfg)
    rope = rope2d_angles(pos, cfg.dec_dim // cfg.dec_heads, cfg.rope_freq)
    x1 = linear(params["decoder_embed"], feat1)
    x2 = linear(params["decoder_embed"], feat2)
    for b1, b2 in zip(params["dec_blocks"], params["dec_blocks2"]):
        x1n = dec_block(b1, x1, x2, rope, rope, cfg.dec_heads)
        x2n = dec_block(b2, x2, x1, rope, rope, cfg.dec_heads)
        x1, x2 = x1n, x2n
    return (layer_norm(params["dec_norm"], x1),
            layer_norm(params["dec_norm"], x2))


def _head(p, tokens, cfg):
    gh, gw = cfg.grid
    out = linear(p, tokens)                       # [N, p*p*4]
    out = out.reshape(gh, gw, cfg.patch, cfg.patch, 4)
    out = out.transpose(0, 2, 1, 3, 4).reshape(
        gh * cfg.patch, gw * cfg.patch, 4
    )
    xyz, conf = out[..., :3], out[..., 3]
    # exp-mode postprocess: distance-preserving expm1 on the norm,
    # confidence 1 + exp(c)
    n = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    pts = xyz / jnp.maximum(n, 1e-8) * jnp.expm1(n)
    return pts, 1.0 + jnp.exp(conf)


@partial(jax.jit, static_argnames=("cfg",))
def infer_pair(params, img1, img2, cfg: Dust3rConfig = Dust3rConfig()):
    """Two-view inference.

    Args:
      img1/img2: ``[H, W, 3]`` in [-1, 1] (DUSt3R normalization).

    Returns dict with ``pts1`` ``[H, W, 3]`` (view-1 geometry in view-1
    frame), ``pts2`` (view-2 geometry in view-1 frame), ``conf1/conf2``.
    """
    f1 = encode(params, img1, cfg)
    f2 = encode(params, img2, cfg)
    d1, d2 = decode_pair(params, f1, f2, cfg)
    pts1, conf1 = _head(params["head1"], d1, cfg)
    pts2, conf2 = _head(params["head2"], d2, cfg)
    return {"pts1": pts1, "conf1": conf1, "pts2": pts2, "conf2": conf2}


# ---------------------------------------------------------------------------
# torch checkpoint conversion (best-effort key mapping; parity validation
# requires the released artifact, unavailable in this environment)
# ---------------------------------------------------------------------------

def convert_dust3r(path_or_state, cfg: Dust3rConfig = Dust3rConfig()):
    if isinstance(path_or_state, (str, bytes)):
        import torch
        state = torch.load(path_or_state, map_location="cpu",
                           weights_only=False)
    else:
        state = path_or_state
    if "model" in state:
        state = state["model"]

    def np_(k):
        return np.asarray(state[k].detach().numpy(), dtype=np.float32)

    def lin(prefix):
        return {"w": jnp.asarray(np_(f"{prefix}.weight").T),
                "b": jnp.asarray(np_(f"{prefix}.bias"))}

    def ln(prefix):
        return {"g": jnp.asarray(np_(f"{prefix}.weight")),
                "b": jnp.asarray(np_(f"{prefix}.bias"))}

    def attn(prefix, dim):
        # torch croco uses fused qkv
        qkv_w = np_(f"{prefix}.qkv.weight")        # [3D, D]
        qkv_b = np_(f"{prefix}.qkv.bias")
        return {
            "q": {"w": jnp.asarray(qkv_w[:dim].T),
                  "b": jnp.asarray(qkv_b[:dim])},
            "k": {"w": jnp.asarray(qkv_w[dim:2 * dim].T),
                  "b": jnp.asarray(qkv_b[dim:2 * dim])},
            "v": {"w": jnp.asarray(qkv_w[2 * dim:].T),
                  "b": jnp.asarray(qkv_b[2 * dim:])},
            "proj": lin(f"{prefix}.proj"),
        }

    def cross_attn(prefix, dim):
        return {
            "q": lin(f"{prefix}.projq"),
            "k": lin(f"{prefix}.projk"),
            "v": lin(f"{prefix}.projv"),
            "proj": lin(f"{prefix}.proj"),
        }

    def block(prefix, dim, cross=False):
        p = {
            "ln1": ln(f"{prefix}.norm1"),
            "attn": attn(f"{prefix}.attn", dim),
            "ln2": ln(f"{prefix}.norm2"),
            "mlp": {"fc1": lin(f"{prefix}.mlp.fc1"),
                    "fc2": lin(f"{prefix}.mlp.fc2")},
        }
        if cross:
            p["ln_cross"] = ln(f"{prefix}.norm3")
            p["ln_ctx"] = ln(f"{prefix}.norm_y")
            p["cross"] = cross_attn(f"{prefix}.cross_attn", dim)
        return p

    pe_w = np_("patch_embed.proj.weight")          # [D, 3, p, p]
    params = {
        "patch_embed": {
            "w": jnp.asarray(pe_w.transpose(2, 3, 1, 0)),
            "b": jnp.asarray(np_("patch_embed.proj.bias")),
        },
        "enc_blocks": [
            block(f"enc_blocks.{i}", cfg.enc_dim)
            for i in range(cfg.enc_depth)
        ],
        "enc_norm": ln("enc_norm"),
        "decoder_embed": lin("decoder_embed"),
        "dec_blocks": [
            block(f"dec_blocks.{i}", cfg.dec_dim, cross=True)
            for i in range(cfg.dec_depth)
        ],
        "dec_blocks2": [
            block(f"dec_blocks2.{i}", cfg.dec_dim, cross=True)
            for i in range(cfg.dec_depth)
        ],
        "dec_norm": ln("dec_norm"),
        "head1": lin("downstream_head1.proj"),
        "head2": lin("downstream_head2.proj"),
    }
    return params
