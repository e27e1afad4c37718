"""Fused Pallas kernels for the trainable color path.

The color path (reference pointneus_disent.py:325-346) is the second pair
MLP stack: F_color (4 linears, 103->256) per (point, neighbor) pair, an
RBF-weighted aggregation per point, then R (3 linears, 277->3, sigmoid)
per point.  In XLA it is HBM-bound the same way the frozen SDF MLP was
(every [M*K, 256] activation roundtrips HBM): ~19 ms fwd+bwd at the
production top-48 shapes.  These kernels keep the whole stack in VMEM.

Unlike the frozen SDF net, F_color/R are TRAINABLE, so the custom VJP
must produce weight/bias gradients: the backward kernel recomputes the
forward activations per tile (VMEM is cheaper than HBM residuals), runs
the reverse sweeps, and accumulates dW/db across grid steps into revisited
output blocks (zeroed at program 0).  Latent cotangents come back dense
per pair; the caller's gather VJP scatters them into the [N, 64] table.

Positional encoding of x_pi (39 dims) happens IN the kernel (VPU sin/cos)
so the HBM input per pair is just [x_pi(3), latent(64), w(1)].

No x_pi cotangent is produced: shading positions are stop-gradient in the
renderer (z_sel detached, camera inputs carry no parameters) and the RBF
weights are detached by spec (reference :242).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spurfies_tpu.model.networks import LEAKY_SLOPE

POS_MULTIRES = 6      # posenc(x_pi) -> 39 dims (reference embedder multires 6)
PK = 8                # neighbors per point (reference k)
TP = 128              # points per tile -> 1024 pairs


def _posenc(x, multires):
    parts = [x]
    for i in range(multires):
        f = 2.0 ** i
        parts.append(jnp.sin(x * f))
        parts.append(jnp.cos(x * f))
    return jnp.concatenate(parts, axis=-1)


def _flatten_color(train_params):
    fw = [(l["w"], l["b"]) for l in train_params["F_color"]]
    rw = [(l["w"], l["b"]) for l in train_params["R"]]
    return fw, rw


def _fwd_body(x_pi, lat, wn, dir_enc, fws, fbs, rws, rbs, dt):
    """Shared forward math; returns (rgb, residuals for reverse)."""
    u = jnp.concatenate([_posenc(x_pi, POS_MULTIRES), lat], axis=-1)
    h = u.astype(dt)
    f_pre = []
    fw_in = []                                           # per-layer inputs
    nf = len(fws)
    for i in range(nf):
        fw_in.append(h)
        a = jnp.dot(h, fws[i].astype(dt),
                    preferred_element_type=jnp.float32) + fbs[i]
        if i < nf - 1:
            f_pre.append(a)
            h = jnp.maximum(a, LEAKY_SLOPE * a).astype(dt)
        else:
            h = a.astype(dt)
    feat = h                                            # [TP*PK, 256]

    agg = jnp.sum(
        (feat.astype(jnp.float32) * wn).reshape(TP, PK, -1), axis=1
    )                                                    # [TP, 256]
    g = jnp.concatenate([dir_enc, agg], axis=-1).astype(dt)   # [TP, 277]
    r_pre = []
    r_in = []
    nr = len(rws)
    for i in range(nr):
        r_in.append(g)
        a = jnp.dot(g, rws[i].astype(dt),
                    preferred_element_type=jnp.float32) + rbs[i]
        if i < nr - 1:
            r_pre.append(a)
            g = jnp.maximum(a, LEAKY_SLOPE * a).astype(dt)
        else:
            g = a
    rgb = jax.nn.sigmoid(g)                              # [TP, 3]
    return rgb, (u, fw_in, f_pre, feat, agg, r_in, r_pre)


def _color_fwd_kernel(*refs, n_f, n_r, dt):
    x_pi = refs[0][...]
    lat = refs[1][...]
    wn = refs[2][...]
    dir_enc = refs[3][...]
    ws = refs[4:4 + n_f + n_r]
    bs = refs[4 + n_f + n_r:4 + 2 * (n_f + n_r)]
    out = refs[-1]
    fws = [w[...] for w in ws[:n_f]]
    rws = [w[...] for w in ws[n_f:]]
    fbs = [b[...].astype(jnp.float32) for b in bs[:n_f]]
    rbs = [b[...].astype(jnp.float32) for b in bs[n_f:]]
    rgb, _ = _fwd_body(x_pi, lat, wn, dir_enc, fws, fbs, rws, rbs, dt)
    out[...] = rgb.astype(jnp.float32)


def _color_bwd_kernel(*refs, n_f, n_r, dt):
    x_pi = refs[0][...]
    lat = refs[1][...]
    wn = refs[2][...]
    dir_enc = refs[3][...]
    ws = refs[4:4 + n_f + n_r]
    bs = refs[4 + n_f + n_r:4 + 2 * (n_f + n_r)]
    rgb_bar_ref = refs[4 + 2 * (n_f + n_r)]
    outs = refs[5 + 2 * (n_f + n_r):]
    dlat_ref = outs[0]
    dw_refs = outs[1:1 + n_f + n_r]
    db_refs = outs[1 + n_f + n_r:]

    fws = [w[...] for w in ws[:n_f]]
    rws = [w[...] for w in ws[n_f:]]
    fbs = [b[...].astype(jnp.float32) for b in bs[:n_f]]
    rbs = [b[...].astype(jnp.float32) for b in bs[n_f:]]

    rgb, (u, fw_in, f_pre, feat, agg, r_in, r_pre) = _fwd_body(
        x_pi, lat, wn, dir_enc, fws, fbs, rws, rbs, dt
    )

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        for ref in list(dw_refs) + list(db_refs):
            ref[...] = jnp.zeros_like(ref)

    # R reverse (sigmoid head)
    delta = (rgb_bar_ref[...] * rgb * (1.0 - rgb)).astype(jnp.float32)
    for i in range(n_r - 1, -1, -1):
        # dW_i += r_in[i]^T @ delta ; db_i += sum(delta)
        dw_refs[n_f + i][...] += jax.lax.dot_general(
            r_in[i].astype(dt), delta.astype(dt),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        db_refs[n_f + i][...] += jnp.sum(delta, axis=0, keepdims=True)
        delta = jax.lax.dot_general(
            delta.astype(dt), rws[i].astype(dt),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
        if i > 0:
            gate = jnp.where(r_pre[i - 1] > 0, 1.0, LEAKY_SLOPE)
            delta = delta * gate
    # delta is now d/d(concat(dir_enc, agg)) [TP, 277]; keep agg slots
    d_agg = delta[:, dir_enc.shape[-1]:]                  # [TP, 256]

    # back through the weighted aggregation: dfeat_pair = wn * d_agg[point]
    d_feat = (
        jnp.broadcast_to(d_agg[:, None, :], (TP, PK, d_agg.shape[-1]))
        .reshape(TP * PK, -1) * wn
    )

    # F_color reverse
    delta = d_feat.astype(jnp.float32)
    for i in range(n_f - 1, -1, -1):
        dw_refs[i][...] += jax.lax.dot_general(
            fw_in[i].astype(dt), delta.astype(dt),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        db_refs[i][...] += jnp.sum(delta, axis=0, keepdims=True)
        delta = jax.lax.dot_general(
            delta.astype(dt), fws[i].astype(dt),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
        if i > 0:
            gate = jnp.where(f_pre[i - 1] > 0, 1.0, LEAKY_SLOPE)
            delta = delta * gate
    # delta = d/du [TP*PK, 103]; latent slots are the tail 64
    dlat_ref[...] = delta[:, delta.shape[-1] - lat.shape[-1]:]


def _specs_for(arrs, blocked_first=None):
    specs = []
    for arr in arrs:
        specs.append(
            pl.BlockSpec(arr.shape, lambda i, nd=arr.ndim: (0,) * nd,
                         memory_space=pltpu.VMEM)
        )
    return specs


@partial(jax.jit, static_argnames=("dt", "interpret"))
def _color_fwd_call(x_pi, lat, wn, dir_enc, fws, fbs, rws, rbs,
                    dt=jnp.bfloat16, interpret=False):
    mp = dir_enc.shape[0]                      # padded point count
    grid = (mp // TP,)
    n_f, n_r = len(fws), len(rws)
    in_specs = [
        pl.BlockSpec((TP * PK, 3), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TP * PK, lat.shape[-1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TP * PK, 1), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TP, dir_enc.shape[-1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ] + _specs_for(list(fws) + list(rws) + list(fbs) + list(rbs))
    rgb = pl.pallas_call(
        partial(_color_fwd_kernel, n_f=n_f, n_r=n_r, dt=dt),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TP, 3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, 3), jnp.float32),
        interpret=interpret,
    )(x_pi, lat, wn, dir_enc, *fws, *rws, *fbs, *rbs)
    return rgb


@partial(jax.jit, static_argnames=("dt", "interpret"))
def _color_bwd_call(x_pi, lat, wn, dir_enc, fws, fbs, rws, rbs, rgb_bar,
                    dt=jnp.bfloat16, interpret=False):
    mp = dir_enc.shape[0]
    grid = (mp // TP,)
    n_f, n_r = len(fws), len(rws)
    in_specs = [
        pl.BlockSpec((TP * PK, 3), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TP * PK, lat.shape[-1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TP * PK, 1), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TP, dir_enc.shape[-1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ] + _specs_for(list(fws) + list(rws) + list(fbs) + list(rbs)) + [
        pl.BlockSpec((TP, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    all_ws = list(fws) + list(rws)
    all_bs = list(fbs) + list(rbs)
    out_specs = [
        pl.BlockSpec((TP * PK, lat.shape[-1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec(w.shape, lambda i, nd=w.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for w in all_ws
    ] + [
        pl.BlockSpec((1, b.shape[-1]), lambda i: (0, 0),
                     memory_space=pltpu.VMEM)
        for b in all_bs
    ]
    out_shape = [
        jax.ShapeDtypeStruct((mp * PK, lat.shape[-1]), jnp.float32),
    ] + [
        jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in all_ws
    ] + [
        jax.ShapeDtypeStruct((1, b.shape[-1]), jnp.float32) for b in all_bs
    ]
    outs = pl.pallas_call(
        partial(_color_bwd_kernel, n_f=n_f, n_r=n_r, dt=dt),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(x_pi, lat, wn, dir_enc, *fws, *rws, *fbs, *rbs, rgb_bar)
    dlat = outs[0]
    dws = outs[1:1 + n_f + n_r]
    dbs = outs[1 + n_f + n_r:]
    return dlat, dws, dbs


def _interp():
    return jax.default_backend() != "tpu"


def _prep(train_params):
    fw, rw = _flatten_color(train_params)
    fws = tuple(w for w, _ in fw)
    fbs = tuple(b[None] for _, b in fw)
    rws = tuple(w for w, _ in rw)
    rbs = tuple(b[None] for _, b in rw)
    return fws, fbs, rws, rbs


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_color(train_params, x_pi, lat, wn, dir_enc, dt=jnp.bfloat16):
    """rgb [P, 3] from pair inputs; differentiable w.r.t. train_params
    (F_color/R weights+biases) and lat.  P and P*PK must be padded to
    multiples of TP / TP*PK by the caller.

    Args:
      x_pi: [P*PK, 3]; lat: [P*PK, 64]; wn: [P*PK, 1] normalized+masked
        RBF weights (w / norm, 0 at invalid pairs); dir_enc: [P, 21].
    """
    fws, fbs, rws, rbs = _prep(train_params)
    return _color_fwd_call(x_pi, lat, wn, dir_enc, fws, fbs, rws, rbs,
                           dt=dt, interpret=_interp())


def _fc_fwd(train_params, x_pi, lat, wn, dir_enc, dt):
    rgb = fused_color(train_params, x_pi, lat, wn, dir_enc, dt)
    return rgb, (train_params, x_pi, lat, wn, dir_enc)


def _fc_bwd(dt, res, rgb_bar):
    train_params, x_pi, lat, wn, dir_enc = res
    fws, fbs, rws, rbs = _prep(train_params)
    dlat, dws, dbs = _color_bwd_call(
        x_pi, lat, wn, dir_enc, fws, fbs, rws, rbs, rgb_bar,
        dt=dt, interpret=_interp(),
    )
    n_f = len(fws)
    dparams = {
        "F_color": [
            {"w": dws[i], "b": dbs[i][0]} for i in range(n_f)
        ],
        "R": [
            {"w": dws[n_f + i], "b": dbs[n_f + i][0]}
            for i in range(len(rws))
        ],
    }
    # other entries of train_params get zero cotangents
    zeros = {
        k: jax.tree_util.tree_map(jnp.zeros_like, v)
        for k, v in train_params.items() if k not in ("F_color", "R")
    }
    dparams.update(zeros)
    return (dparams, jnp.zeros_like(x_pi), dlat, jnp.zeros_like(wn),
            jnp.zeros_like(dir_enc))


fused_color.defvjp(_fc_fwd, _fc_bwd)
