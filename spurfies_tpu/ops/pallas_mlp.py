"""Fused Pallas kernel for the frozen pair-SDF MLP (value + input-gradient).

The hot loop of the whole pipeline is the frozen local-prior MLP evaluated
per (shading point, neighbor) pair: 6 matmuls (35->256, 4x 256->256,
256->1) on ~655k rows per step (reference pointneus_disent.py:300-323 and
its double backprop).  In XLA this is HBM-bandwidth-bound: every layer's
[655k, 256] activation roundtrips HBM (measured ~46 TF/s-equivalent f32 and
bf16-insensitive — ops/NOTES in BENCH history).  This kernel keeps weights
AND activations in VMEM; HBM sees only the [M, 35] input and the [M, 36]
output (value + full input-gradient).

Two structural facts make the whole autodiff story collapse:

  1. The net is FROZEN — no weight cotangents are ever needed.
  2. Linear + LeakyReLU is piecewise linear, so the input-Hessian is zero
     almost everywhere.  The input gradient r = ds/du is locally constant,
     and the VJP of (s, g) w.r.t. u under cotangents (s_bar, g_bar) is
     exactly s_bar * r — the g_bar term vanishes (JAX's autodiff of the
     XLA path computes the same zero: d(lrelu')/dx == 0 a.e.).  The
     reference's double backprop (eikonal -> latents) has the identical
     a.e.-zero structure.

So: forward kernel = one MXU sweep up (storing pre-activations in VMEM) +
one sweep down (transposed weights) => s and r; backward = elementwise.

Weights are padded host-side to lane-friendly shapes (35 -> 40 rows is
fine for Mosaic; the K dimension need not be 128).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spurfies_tpu.model.networks import LEAKY_SLOPE

IN_DIM = 35          # geo latent 32 + x_pi 3
HID = 256


def _flatten_frozen(frozen):
    """frozen {F_geometry: [6? layers], T: [1]} -> list of (w, b)."""
    layers = [(l["w"], l["b"]) for l in frozen["F_geometry"]]
    layers += [(l["w"], l["b"]) for l in frozen["T"]]
    return layers


def _mlp_kernel(*refs, compute_dtype, n_layers, n_act):
    """Up sweep (value) + down sweep (input gradient), all in VMEM.

    In bf16 mode matmul outputs stay bf16 (MXU still accumulates f32
    internally) and LeakyReLU is a single ``maximum`` — the VPU
    elementwise work between matmuls, not the MXU, limits this kernel.
    Down-sweep weights arrive pre-transposed (host-side) so Mosaic never
    transposes in-kernel.

    Layers 0..n_act-1 carry LeakyReLU; the rest are linear.  The frozen
    net's two trailing linear layers (F_geometry[4] 256->256 and T 256->1)
    arrive PRE-FUSED host-side into one 256->1 layer (_prep_layers) —
    exact, and removes a [T,256]x[256,256] matmul from EACH sweep.
    """
    u_ref = refs[0]
    ws = refs[1:1 + n_layers]
    wts = refs[1 + n_layers:1 + 2 * n_layers]
    bs = refs[1 + 2 * n_layers:1 + 3 * n_layers]
    out_s_ref, out_r_ref = refs[-2], refs[-1]

    acc_t = jnp.float32   # Mosaic requires 32-bit matmul accumulators

    x = u_ref[...].astype(compute_dtype)
    gates = []
    for i in range(n_layers):
        w = ws[i][...].astype(compute_dtype)
        b = bs[i][...].astype(acc_t)
        a = jnp.dot(x, w, preferred_element_type=acc_t) + b
        if i < n_act:
            # lrelu(a) = max(a, slope*a) for slope in (0, 1)
            x = jnp.maximum(a, LEAKY_SLOPE * a)
            gates.append(
                jnp.where(a > 0, 1.0, LEAKY_SLOPE).astype(compute_dtype)
            )
            x = x.astype(compute_dtype)
        else:
            x = a.astype(compute_dtype)
    out_s_ref[...] = x[:, :1].astype(jnp.float32)

    # down sweep: r = ds/du with pre-transposed weights.  The trailing
    # linear layers' transposes are likewise pre-fused into wts[-1].
    t = u_ref.shape[0]
    delta = jnp.broadcast_to(
        wts[n_layers - 1][...].astype(compute_dtype), (t, HID)
    )
    for i in range(n_act - 1, -1, -1):
        delta = delta * gates[i]
        wt = wts[i][...].astype(compute_dtype)
        delta = jnp.dot(delta, wt, preferred_element_type=acc_t).astype(
            compute_dtype
        )
    out_r_ref[...] = delta.astype(jnp.float32)


@partial(jax.jit,
         static_argnames=("tile", "compute_dtype", "interpret", "n_act"))
def _fused_mlp_call(u, ws, bs, tile=1024, compute_dtype=jnp.bfloat16,
                    interpret=False, n_act=4):
    m = u.shape[0]
    n_layers = len(ws)
    pad = (-m) % tile
    if pad:
        u = jnp.pad(u, ((0, pad), (0, 0)))
    mp = m + pad
    wts = tuple(w.T for w in ws)

    grid = (mp // tile,)
    in_specs = [pl.BlockSpec((tile, u.shape[1]), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for arr in list(ws) + list(wts) + list(bs):
        in_specs.append(
            pl.BlockSpec(arr.shape, lambda i, nd=arr.ndim: (0,) * nd,
                         memory_space=pltpu.VMEM)
        )

    s, r = pl.pallas_call(
        partial(_mlp_kernel, compute_dtype=compute_dtype,
                n_layers=n_layers, n_act=n_act),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, u.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, 1), jnp.float32),
            jax.ShapeDtypeStruct((mp, u.shape[1]), jnp.float32),
        ],
        interpret=interpret,
    )(u, *ws, *wts, *bs)
    return s[:m, 0], r[:m]


def _value_kernel(*refs, compute_dtype, n_layers, n_act):
    u_ref = refs[0]
    ws = refs[1:1 + n_layers]
    bs = refs[1 + n_layers:1 + 2 * n_layers]
    out_s_ref = refs[-1]
    acc_t = jnp.float32   # Mosaic requires 32-bit matmul accumulators
    x = u_ref[...].astype(compute_dtype)
    for i in range(n_layers):
        w = ws[i][...].astype(compute_dtype)
        b = bs[i][...].astype(acc_t)
        a = jnp.dot(x, w, preferred_element_type=acc_t) + b
        if i < n_act:
            x = jnp.maximum(a, LEAKY_SLOPE * a).astype(compute_dtype)
        else:
            x = a.astype(compute_dtype)
    out_s_ref[...] = x[:, :1].astype(jnp.float32)


@partial(jax.jit,
         static_argnames=("tile", "compute_dtype", "interpret", "n_act"))
def _fused_value_call(u, ws, bs, tile=1024, compute_dtype=jnp.bfloat16,
                      interpret=False, n_act=4):
    m = u.shape[0]
    n_layers = len(ws)
    pad = (-m) % tile
    if pad:
        u = jnp.pad(u, ((0, pad), (0, 0)))
    mp = m + pad

    in_specs = [pl.BlockSpec((tile, u.shape[1]), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for arr in list(ws) + list(bs):
        in_specs.append(
            pl.BlockSpec(arr.shape, lambda i, nd=arr.ndim: (0,) * nd,
                         memory_space=pltpu.VMEM)
        )
    s = pl.pallas_call(
        partial(_value_kernel, compute_dtype=compute_dtype,
                n_layers=n_layers, n_act=n_act),
        grid=(mp // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, 1), jnp.float32),
        interpret=interpret,
    )(u, *ws, *bs)
    return s[:m, 0]


def _mlp_kernel_gx(*refs, compute_dtype, n_layers, n_act, d):
    """Gather-row variant of :func:`_mlp_kernel`.

    Inputs are the RAW gathered table rows ``g = [latent | point_pos]``
    plus per-row query positions ``x``; the pair feature
    ``u = [latent | x - pos]`` is assembled IN VMEM (f32 subtract, then
    the compute-dtype cast — bit-identical to the XLA assembly), which
    removes the [M*K, D+3] where-pass + HBM round trip the XLA assembly
    costs (measured 2.2 ms of the 33.6 ms train step, trace r3).  The
    first-layer matmul splits into latent and x_pi parts host-side
    (u @ W0 == g_lat @ W0_lat + x_pi @ W0_pos).  x_pi is also emitted so
    the caller's RBF weights read a [M*K, 3] array instead of re-slicing
    the gather output.
    """
    g_ref, x_ref = refs[0], refs[1]
    w_lat, w_pos = refs[2], refs[3]
    ws = refs[4:3 + n_layers]            # layers 1..n_layers-1
    wts = refs[3 + n_layers:3 + 2 * n_layers]
    bs = refs[3 + 2 * n_layers:3 + 3 * n_layers]
    out_s_ref, out_r_ref, out_xpi_ref = refs[-3], refs[-2], refs[-1]

    acc_t = jnp.float32
    g = g_ref[...]                                     # [T, d+3] f32
    xpi = x_ref[...] - g[:, d:]                        # [T, 3] f32
    out_xpi_ref[...] = xpi

    a = (
        jnp.dot(g[:, :d].astype(compute_dtype),
                w_lat[...].astype(compute_dtype),
                preferred_element_type=acc_t)
        + jnp.dot(xpi.astype(compute_dtype),
                  w_pos[...].astype(compute_dtype),
                  preferred_element_type=acc_t)
        + bs[0][...].astype(acc_t)
    )
    x = jnp.maximum(a, LEAKY_SLOPE * a)
    gates = [jnp.where(a > 0, 1.0, LEAKY_SLOPE).astype(compute_dtype)]
    x = x.astype(compute_dtype)
    for i in range(1, n_layers):
        w = ws[i - 1][...].astype(compute_dtype)
        b = bs[i][...].astype(acc_t)
        a = jnp.dot(x, w, preferred_element_type=acc_t) + b
        if i < n_act:
            x = jnp.maximum(a, LEAKY_SLOPE * a)
            gates.append(
                jnp.where(a > 0, 1.0, LEAKY_SLOPE).astype(compute_dtype)
            )
            x = x.astype(compute_dtype)
        else:
            x = a.astype(compute_dtype)
    out_s_ref[...] = x[:, :1].astype(jnp.float32)

    t = g_ref.shape[0]
    delta = jnp.broadcast_to(
        wts[n_layers - 1][...].astype(compute_dtype), (t, HID)
    )
    for i in range(n_act - 1, -1, -1):
        delta = delta * gates[i]
        wt = wts[i][...].astype(compute_dtype)
        delta = jnp.dot(delta, wt, preferred_element_type=acc_t).astype(
            compute_dtype
        )
    out_r_ref[...] = delta.astype(jnp.float32)


def _value_kernel_gx(*refs, compute_dtype, n_layers, n_act, d):
    g_ref, x_ref = refs[0], refs[1]
    w_lat, w_pos = refs[2], refs[3]
    ws = refs[4:3 + n_layers]
    bs = refs[3 + n_layers:3 + 2 * n_layers]
    out_s_ref, out_xpi_ref = refs[-2], refs[-1]

    acc_t = jnp.float32
    g = g_ref[...]
    xpi = x_ref[...] - g[:, d:]
    out_xpi_ref[...] = xpi
    a = (
        jnp.dot(g[:, :d].astype(compute_dtype),
                w_lat[...].astype(compute_dtype),
                preferred_element_type=acc_t)
        + jnp.dot(xpi.astype(compute_dtype),
                  w_pos[...].astype(compute_dtype),
                  preferred_element_type=acc_t)
        + bs[0][...].astype(acc_t)
    )
    x = jnp.maximum(a, LEAKY_SLOPE * a).astype(compute_dtype)
    for i in range(1, n_layers):
        w = ws[i - 1][...].astype(compute_dtype)
        b = bs[i][...].astype(acc_t)
        a = jnp.dot(x, w, preferred_element_type=acc_t) + b
        if i < n_act:
            x = jnp.maximum(a, LEAKY_SLOPE * a).astype(compute_dtype)
        else:
            x = a.astype(compute_dtype)
    out_s_ref[...] = x[:, :1].astype(jnp.float32)


def _wb_specs(arrs):
    return [
        pl.BlockSpec(a.shape, lambda i, nd=a.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for a in arrs
    ]


@partial(jax.jit,
         static_argnames=("tile", "compute_dtype", "interpret", "n_act"))
def _fused_mlp_gx_call(g, x, ws, bs, tile=1024,
                       compute_dtype=jnp.bfloat16, interpret=False,
                       n_act=4):
    m, dim = g.shape
    d = dim - 3
    n_layers = len(ws)
    pad = (-m) % tile
    if pad:
        g = jnp.pad(g, ((0, pad), (0, 0)))
        x = jnp.pad(x, ((0, pad), (0, 0)))
    mp = m + pad
    w_lat, w_pos = ws[0][:d], ws[0][d:]
    wts = tuple(w.T for w in ws)

    row = lambda i: (i, 0)  # noqa: E731
    in_specs = [
        pl.BlockSpec((tile, dim), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 3), row, memory_space=pltpu.VMEM),
    ] + _wb_specs([w_lat, w_pos] + list(ws[1:]) + list(wts) + list(bs))

    s, r, xpi = pl.pallas_call(
        partial(_mlp_kernel_gx, compute_dtype=compute_dtype,
                n_layers=n_layers, n_act=n_act, d=d),
        grid=(mp // tile,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((tile, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, dim), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 3), row, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, 1), jnp.float32),
            jax.ShapeDtypeStruct((mp, dim), jnp.float32),
            jax.ShapeDtypeStruct((mp, 3), jnp.float32),
        ],
        interpret=interpret,
    )(g, x, w_lat, w_pos, *ws[1:], *wts, *bs)
    return s[:m, 0], r[:m], xpi[:m]


@partial(jax.jit,
         static_argnames=("tile", "compute_dtype", "interpret", "n_act"))
def _fused_value_gx_call(g, x, ws, bs, tile=1024,
                         compute_dtype=jnp.bfloat16, interpret=False,
                         n_act=4):
    m, dim = g.shape
    d = dim - 3
    n_layers = len(ws)
    pad = (-m) % tile
    if pad:
        g = jnp.pad(g, ((0, pad), (0, 0)))
        x = jnp.pad(x, ((0, pad), (0, 0)))
    mp = m + pad
    w_lat, w_pos = ws[0][:d], ws[0][d:]

    row = lambda i: (i, 0)  # noqa: E731
    in_specs = [
        pl.BlockSpec((tile, dim), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 3), row, memory_space=pltpu.VMEM),
    ] + _wb_specs([w_lat, w_pos] + list(ws[1:]) + list(bs))

    s, xpi = pl.pallas_call(
        partial(_value_kernel_gx, compute_dtype=compute_dtype,
                n_layers=n_layers, n_act=n_act, d=d),
        grid=(mp // tile,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((tile, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 3), row, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, 1), jnp.float32),
            jax.ShapeDtypeStruct((mp, 3), jnp.float32),
        ],
        interpret=interpret,
    )(g, x, w_lat, w_pos, *ws[1:], *bs)
    return s[:m, 0], xpi[:m]


# Grid tiles (rows per kernel invocation), tuned per kernel on TPU v5e
# (scripts/sweep_tile.py). Re-swept after the bf16 host-side weight prep
# landed: both kernels now peak at 1024 rows (grad@655k 11.36 ms at 1024
# vs 11.81/11.69 at 512/2048; value@1.05M 10.10 at 1024 vs 11.16 at the
# old 4096 default — the smaller working set pipelines better once the
# weight blocks are bf16).
VALUE_TILE = 1024
GRAD_TILE = 1024


def set_tile(tile: int, value_tile: int | None = None):
    """Kernel row-tile knob (perf A/B; VMEM bounds the maximum).

    ``set_tile(t)`` sets both kernels; ``set_tile(g, v)`` sets them
    separately (grad, value)."""
    global VALUE_TILE, GRAD_TILE
    GRAD_TILE = tile
    VALUE_TILE = tile if value_tile is None else value_tile


def _prep_layers(frozen, compute_dtype):
    """Host-side weight prep: cast + linear-tail fusion.

    Cast to the compute dtype HOST-SIDE (outside the grid): the weight
    blocks are re-fetched per grid step, so f32 refs cost 2x the HBM
    traffic of bf16 ones; in-kernel casts also burn VPU cycles every tile
    for the same rounding.

    LINEAR-TAIL FUSION: the net's activations stop after layer n_act-1
    (LeakyReLU follows F_geometry layers 0..3 only; F_geometry[4] and T
    are both plain linear — reference pointneus_disent.py:86-98).  Their
    composition collapses EXACTLY (in f32, before the cast) into one
    256->1 layer: WV = W4 @ W_T, bV = b4 @ W_T + b_T.  That removes a
    [T,256]x[256,256] matmul from the up sweep AND from the down sweep
    (~2 of 9 big matmuls), with one fewer bf16 rounding.

    Returns (ws, bs, n_act).
    """
    layers = _flatten_frozen(frozen)
    n_act = len(frozen["F_geometry"]) - 1
    f32 = jnp.float32
    w_tail, b_tail = layers[n_act]
    wv = w_tail.astype(f32)
    bv = b_tail.astype(f32)
    for w, b in layers[n_act + 1:]:
        bv = bv @ w.astype(f32) + b.astype(f32)
        wv = wv @ w.astype(f32)
    fused = layers[:n_act] + [(wv, bv)]
    ws = tuple(w.astype(compute_dtype) for w, _ in fused)
    bs = tuple((b[None] if b.ndim == 1 else b) for _, b in fused)
    return ws, bs, n_act


def pair_sdf_value(frozen, u, compute_dtype=jnp.bfloat16):
    """Value-only fused MLP (no-grad probe paths — sampler importance,
    marching-cubes probe): one up sweep, half the grad kernel's work."""
    ws, bs, n_act = _prep_layers(frozen, compute_dtype)
    tile = min(VALUE_TILE, max(256, 1 << (u.shape[0] - 1).bit_length()))
    return _fused_value_call(u, ws, bs, compute_dtype=compute_dtype,
                             tile=tile, n_act=n_act, **_kernel_kwargs(u))


def _kernel_kwargs(u):
    # tests / CPU fall back to the interpreter; TPU runs the real kernel
    interpret = jax.default_backend() != "tpu"
    return {"interpret": interpret}


def _fwd_impl(frozen, u, compute_dtype):
    ws, bs, n_act = _prep_layers(frozen, compute_dtype)
    tile = min(GRAD_TILE, max(256, 1 << (u.shape[0] - 1).bit_length()))
    return _fused_mlp_call(
        u, ws, bs, compute_dtype=compute_dtype, tile=tile, n_act=n_act,
        **_kernel_kwargs(u),
    )


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def pair_sdf_value_and_input_grad(frozen, u, compute_dtype=jnp.bfloat16):
    """(s [M], r [M, 35]) = frozen MLP value + full input gradient.

    Differentiable w.r.t. ``u`` (cotangent s_bar * r, exact a.e. — see
    module docstring); frozen receives zero cotangents (it is frozen).
    """
    return _fwd_impl(frozen, u, compute_dtype)


def _vjp_fwd(frozen, u, compute_dtype):
    s, r = _fwd_impl(frozen, u, compute_dtype)
    return (s, r), (frozen, r)


def _vjp_bwd(compute_dtype, res, cot):
    frozen, r = res
    s_bar, _g_bar = cot      # g_bar pullback is 0 a.e. (piecewise linear)
    u_bar = s_bar[:, None] * r
    zero_frozen = jax.tree_util.tree_map(jnp.zeros_like, frozen)
    return zero_frozen, u_bar


pair_sdf_value_and_input_grad.defvjp(_vjp_fwd, _vjp_bwd)


def pair_sdf_rows_value(frozen, g, x, compute_dtype=jnp.bfloat16):
    """Value-only fused MLP on RAW gathered rows ``g = [latent | pos]``
    and query positions ``x`` ([M, 3] row-expanded); the pair feature
    ``[latent | x - pos]`` assembles in VMEM.  Probe paths only (not
    differentiable — callers sit under stop_gradient).

    Returns (s [M], x_pi [M, 3])."""
    ws, bs, n_act = _prep_layers(frozen, compute_dtype)
    tile = min(VALUE_TILE, max(256, 1 << (g.shape[0] - 1).bit_length()))
    return _fused_value_gx_call(g, x, ws, bs, compute_dtype=compute_dtype,
                                tile=tile, n_act=n_act, **_kernel_kwargs(g))


def _gx_impl(frozen, g, x, compute_dtype):
    ws, bs, n_act = _prep_layers(frozen, compute_dtype)
    tile = min(GRAD_TILE, max(256, 1 << (g.shape[0] - 1).bit_length()))
    return _fused_mlp_gx_call(g, x, ws, bs, compute_dtype=compute_dtype,
                              tile=tile, n_act=n_act, **_kernel_kwargs(g))


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def pair_sdf_rows_grad(frozen, g, x, compute_dtype=jnp.bfloat16):
    """(s [M], r [M, D+3], x_pi [M, 3]) from raw gathered rows.

    ``r`` is the input gradient w.r.t. the assembled pair feature
    ``u = [latent | x - pos]`` (same as pair_sdf_value_and_input_grad).
    Differentiable: with u_lat = g_lat and u_pos = x - g_pos, the VJP
    routes s_bar * r_lat to the latent columns of ``g``, and ±s_bar *
    r_pos to g_pos / x (plus the linear x_pi-output pullback); the r
    pullback is 0 a.e. (piecewise-linear — module docstring)."""
    return _gx_impl(frozen, g, x, compute_dtype)


def _gx_vjp_fwd(frozen, g, x, compute_dtype):
    s, r, xpi = _gx_impl(frozen, g, x, compute_dtype)
    return (s, r, xpi), (frozen, r)


def _gx_vjp_bwd(compute_dtype, res, cot):
    frozen, r = res
    s_bar, _r_bar, xpi_bar = cot
    d = r.shape[1] - 3
    sr = s_bar[:, None] * r
    g_bar = jnp.concatenate([sr[:, :d], -sr[:, d:] - xpi_bar], axis=1)
    x_bar = sr[:, d:] + xpi_bar
    zero_frozen = jax.tree_util.tree_map(jnp.zeros_like, frozen)
    return zero_frozen, g_bar, x_bar


pair_sdf_rows_grad.defvjp(_gx_vjp_fwd, _gx_vjp_bwd)


# ---------------------------------------------------------------------------
# Fused-aggregation kernels (r5): gather-rows MLP + RBF weighting + per-point
# aggregation in ONE pass.  The r4 step trace showed the pair-level HBM
# round trips AROUND the MLP kernel — the [M*K, 3] x_pi / [M*K] s outputs,
# the rbf-weight glue (slice_multiply/broadcast/div fusions, ~1.7 ms), the
# [M*K, 35] f32 r round trip and the backward's s_bar*r expansion — cost
# more than the MLP math itself.  Here the kernel emits only PER-POINT
# aggregates (num = sum_k w*s, den = sum_k w, gagg = sum_k w*ds/dx) plus the
# two per-pair residuals the backward needs (w f32, r_lat bf16), and the
# backward kernel fuses the cotangent expansion with the banked latent
# scatter so no [M*K, ·] cotangent ever hits HBM.
#
# Pair rows arrive POINT-MAJOR ([M, K] flattened row-major: the K neighbor
# rows of one shading point are consecutive), so per-point reductions and
# per-point -> per-pair broadcasts are exact 0/1 matmuls against in-kernel
# iota-compare band matrices (MXU, trivial FLOPs) — no cross-layout
# reshapes for Mosaic to relayout.
#
# Invalid pairs are encoded in the INDEX (idx = N -> a dump table row whose
# position is 1e9): d2 ~ 1e18 makes w = exp(-rbf^2 d2) EXACTLY 0, which
# zeroes the pair out of num/den/gagg and the backward scatter — no
# validity mask input at all.  (reference semantics: rbf_weights masks by
# valid, pointneus_disent.py:241-247.)
# ---------------------------------------------------------------------------

DUMP_POS = 1.0e9        # dump-row position: w = exp(-rbf^2 * ~1e18) == 0


def _band_matrices(rows: int, pts: int, k: int, dtype):
    """E [pts, rows] (per-point sum) and Et [rows, pts] (per-point
    broadcast): E[p, t] = (t // k == p), built from iota compares."""
    t_ids = jax.lax.broadcasted_iota(jnp.int32, (pts, rows), 1) // k
    p_ids = jax.lax.broadcasted_iota(jnp.int32, (pts, rows), 0)
    e = (t_ids == p_ids).astype(dtype)
    tt = jax.lax.broadcasted_iota(jnp.int32, (rows, pts), 0) // k
    pp = jax.lax.broadcasted_iota(jnp.int32, (rows, pts), 1)
    et = (tt == pp).astype(dtype)
    return e, et


def _mlp_kernel_agg(*refs, compute_dtype, n_layers, n_act, d, k, rbf2,
                    r_dtype=jnp.bfloat16):
    """Fused fwd: gathered rows -> MLP value + input grad -> RBF weights ->
    per-point (num, den, gagg) + per-pair residuals (w, r_lat bf16)."""
    g_ref, xp_ref = refs[0], refs[1]
    w_lat, w_pos = refs[2], refs[3]
    ws = refs[4:3 + n_layers]
    wts = refs[3 + n_layers:3 + 2 * n_layers]
    bs = refs[3 + 2 * n_layers:3 + 3 * n_layers]
    out_pt_ref, out_w_ref, out_r_ref = refs[-3], refs[-2], refs[-1]

    acc_t = jnp.float32
    rows = g_ref.shape[0]
    pts = rows // k
    e, et = _band_matrices(rows, pts, k, acc_t)

    g = g_ref[...]                                      # [T, d+3] f32
    xp_rows = jnp.dot(et, xp_ref[...],
                      preferred_element_type=acc_t)     # [T, 3] exact 0/1
    xpi = xp_rows - g[:, d:]
    d2 = jnp.sum(xpi * xpi, axis=-1, keepdims=True)     # [T, 1]
    w = jnp.exp(-rbf2 * d2)                             # [T, 1] f32
    out_w_ref[...] = w

    a = (
        jnp.dot(g[:, :d].astype(compute_dtype),
                w_lat[...].astype(compute_dtype),
                preferred_element_type=acc_t)
        + jnp.dot(xpi.astype(compute_dtype),
                  w_pos[...].astype(compute_dtype),
                  preferred_element_type=acc_t)
        + bs[0][...].astype(acc_t)
    )
    x = jnp.maximum(a, LEAKY_SLOPE * a)
    gates = [jnp.where(a > 0, 1.0, LEAKY_SLOPE).astype(compute_dtype)]
    x = x.astype(compute_dtype)
    for i in range(1, n_layers):
        a = jnp.dot(x, ws[i - 1][...].astype(compute_dtype),
                    preferred_element_type=acc_t) + bs[i][...].astype(acc_t)
        if i < n_act:
            x = jnp.maximum(a, LEAKY_SLOPE * a)
            gates.append(
                jnp.where(a > 0, 1.0, LEAKY_SLOPE).astype(compute_dtype)
            )
            x = x.astype(compute_dtype)
        else:
            x = a.astype(compute_dtype)
    s = x[:, :1].astype(acc_t)                          # [T, 1]

    delta = jnp.broadcast_to(
        wts[n_layers - 1][...].astype(compute_dtype), (rows, HID)
    )
    for i in range(n_act - 1, -1, -1):
        delta = delta * gates[i]
        delta = jnp.dot(delta, wts[i][...].astype(compute_dtype),
                        preferred_element_type=acc_t).astype(compute_dtype)
    r = delta.astype(acc_t)                             # [T, d+3]
    out_r_ref[...] = r[:, :d].astype(r_dtype)

    # per-point aggregation: one [P, T] x [T, 5] f32 matmul (exact sums)
    cols = jnp.concatenate([w * s, w, w * r[:, d:]], axis=1)   # [T, 5]
    out_pt_ref[...] = jnp.dot(e, cols, preferred_element_type=acc_t)


def _value_kernel_agg(*refs, compute_dtype, n_layers, n_act, d, k, rbf2):
    """Value-only fused fwd + aggregation: per-point (num, den) only
    (no-grad probe paths)."""
    g_ref, xp_ref = refs[0], refs[1]
    w_lat, w_pos = refs[2], refs[3]
    ws = refs[4:3 + n_layers]
    bs = refs[3 + n_layers:3 + 2 * n_layers]
    out_pt_ref = refs[-1]

    acc_t = jnp.float32
    rows = g_ref.shape[0]
    pts = rows // k
    e, et = _band_matrices(rows, pts, k, acc_t)

    g = g_ref[...]
    xp_rows = jnp.dot(et, xp_ref[...], preferred_element_type=acc_t)
    xpi = xp_rows - g[:, d:]
    d2 = jnp.sum(xpi * xpi, axis=-1, keepdims=True)
    w = jnp.exp(-rbf2 * d2)

    a = (
        jnp.dot(g[:, :d].astype(compute_dtype),
                w_lat[...].astype(compute_dtype),
                preferred_element_type=acc_t)
        + jnp.dot(xpi.astype(compute_dtype),
                  w_pos[...].astype(compute_dtype),
                  preferred_element_type=acc_t)
        + bs[0][...].astype(acc_t)
    )
    x = jnp.maximum(a, LEAKY_SLOPE * a).astype(compute_dtype)
    for i in range(1, n_layers):
        a = jnp.dot(x, ws[i - 1][...].astype(compute_dtype),
                    preferred_element_type=acc_t) + bs[i][...].astype(acc_t)
        if i < n_act:
            x = jnp.maximum(a, LEAKY_SLOPE * a).astype(compute_dtype)
        else:
            x = a.astype(compute_dtype)
    s = x[:, :1].astype(acc_t)

    cols = jnp.concatenate([w * s, w], axis=1)          # [T, 2]
    out_pt_ref[...] = jnp.dot(e, cols, preferred_element_type=acc_t)


def _agg_bwd_kernel(sb_ref, w_ref, r_ref, idx_ref, acc_ref, ct_ref, *,
                    banks, rows, k, d):
    """Backward: ct = (num_bar[point] * w * r_lat) expanded IN VMEM, then
    banked scatter-add into the latent-grad accumulator (same bank trick
    as ops/pallas_scatter)."""
    @pl.when(pl.program_id(0) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    pts = rows // k
    _, et = _band_matrices(rows, pts, k, jnp.float32)
    sb_rows = jnp.dot(et, sb_ref[...],
                      preferred_element_type=jnp.float32)     # [T, 1]
    ct_ref[...] = (sb_rows * w_ref[...]) * r_ref[...].astype(jnp.float32)

    def body(t, carry):
        base = t * banks
        for j in range(banks):
            i = idx_ref[base + j]
            acc_ref[j, pl.ds(i, 1), :] += ct_ref[pl.ds(base + j, 1), :]
        return carry

    jax.lax.fori_loop(0, rows // banks, body, 0)


_AGG_ACC_BUDGET = 12 * 2 ** 20  # TRUE VMEM bytes for the bwd accumulator
#                                 banks (must clear the 16 MB scoped-vmem
#                                 stack limit with headroom for the ct
#                                 scratch tile + concurrently scheduled
#                                 kernels).  NOTE the (8,128) f32 tiling
#                                 pads the lane dim: a [rows, 32] bank
#                                 really occupies rows x 128 lanes — 4x
#                                 nominal.  r5 compile OOM on hardware
#                                 (32.75M > 16M for [8, 7872, 32]) came
#                                 from budgeting nominal bytes.


def _agg_tile(k: int) -> int:
    """Pair-row tile: 128 points worth of pairs (K=8 -> 1024 rows)."""
    return 128 * k


@partial(jax.jit, static_argnames=("k", "rbf2", "compute_dtype",
                                   "interpret", "n_act", "r_dtype"))
def _fused_agg_call(g, xp, ws, bs, k, rbf2, compute_dtype=jnp.bfloat16,
                    interpret=False, n_act=4, r_dtype=jnp.bfloat16):
    """g [P*k, d+3] point-major pair rows (P multiple of 128), xp [P, 3].

    Returns (pt [P, 5] = (num, den, gagg), w [P*k, 1], r_lat [P*k, d]).
    """
    rows, dim = g.shape
    d = dim - 3
    n_layers = len(ws)
    tile = _agg_tile(k)
    assert rows % tile == 0, (rows, tile)
    w_lat, w_pos = ws[0][:d], ws[0][d:]
    wts = tuple(w.T for w in ws)

    row = lambda i: (i, 0)  # noqa: E731
    in_specs = [
        pl.BlockSpec((tile, dim), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((tile // k, 3), row, memory_space=pltpu.VMEM),
    ] + _wb_specs([w_lat, w_pos] + list(ws[1:]) + list(wts) + list(bs))

    pt, w, r = pl.pallas_call(
        partial(_mlp_kernel_agg, compute_dtype=compute_dtype,
                n_layers=n_layers, n_act=n_act, d=d, k=k, rbf2=rbf2,
                r_dtype=r_dtype),
        grid=(rows // tile,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((tile // k, 5), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), row, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows // k, 5), jnp.float32),
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
            jax.ShapeDtypeStruct((rows, d), r_dtype),
        ],
        interpret=interpret,
    )(g, xp, w_lat, w_pos, *ws[1:], *wts, *bs)
    return pt, w, r


@partial(jax.jit, static_argnames=("k", "rbf2", "compute_dtype",
                                   "interpret", "n_act"))
def _fused_value_agg_call(g, xp, ws, bs, k, rbf2,
                          compute_dtype=jnp.bfloat16, interpret=False,
                          n_act=4):
    """Value-only variant: returns pt [P, 2] = (num, den)."""
    rows, dim = g.shape
    d = dim - 3
    n_layers = len(ws)
    tile = _agg_tile(k)
    assert rows % tile == 0, (rows, tile)
    w_lat, w_pos = ws[0][:d], ws[0][d:]

    row = lambda i: (i, 0)  # noqa: E731
    in_specs = [
        pl.BlockSpec((tile, dim), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((tile // k, 3), row, memory_space=pltpu.VMEM),
    ] + _wb_specs([w_lat, w_pos] + list(ws[1:]) + list(bs))

    pt = pl.pallas_call(
        partial(_value_kernel_agg, compute_dtype=compute_dtype,
                n_layers=n_layers, n_act=n_act, d=d, k=k, rbf2=rbf2),
        grid=(rows // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile // k, 2), row,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows // k, 2), jnp.float32),
        interpret=interpret,
    )(g, xp, w_lat, w_pos, *ws[1:], *bs)
    return pt


@partial(jax.jit, static_argnames=("n", "k", "interpret"))
def _fused_agg_bwd_call(sb, w, r, idx, n, k, interpret=False):
    """Latent cotangent: out[n_, :] += sum over pairs hitting n_ of
    num_bar[point] * w * r_lat.  idx == n targets the dump row (dropped).

    Returns [n, d] f32 latent grads.
    """
    rows, d = r.shape
    tile = _agg_tile(k)
    assert rows % tile == 0, (rows, tile)
    np_rows = -(-(n + 1) // 8) * 8
    d_lanes = -(-d // 128) * 128          # f32 (8,128) tiling pads lanes
    bank_bytes = np_rows * d_lanes * 4
    banks = _AGG_ACC_BUDGET // bank_bytes
    banks = max(1, min(8, 1 << max(0, banks.bit_length() - 1)))
    if bank_bytes > _AGG_ACC_BUDGET:
        # accumulator exceeds VMEM: XLA fallback (huge point clouds)
        pts = rows // k
        et_sb = jnp.repeat(sb, k, axis=0)
        ct = (et_sb * w) * r.astype(jnp.float32)
        return jnp.zeros((n, d), jnp.float32).at[
            jnp.minimum(idx, n - 1)
        ].add(jnp.where((idx < n)[:, None], ct, 0.0))

    row = lambda i: (i, 0)  # noqa: E731
    acc = pl.pallas_call(
        partial(_agg_bwd_kernel, banks=banks, rows=tile, k=k, d=d),
        grid=(rows // tile,),
        in_specs=[
            pl.BlockSpec((tile // k, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((banks, np_rows, d), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((banks, np_rows, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile, d), jnp.float32)],
        interpret=interpret,
    )(sb, w, r, idx)
    return jnp.sum(acc, axis=0)[:n]
