"""Neural-point SDF/color field: RBF interpolation over kNN latents.

Behavioral spec from reference ``spurfies/model/pointneus_disent.py``:
  * RBF weights ``exp(-(45 d)^2)`` with detached distances, normalized per
    shading point (:241-247).
  * SDF: frozen F_geometry([geo_latent, x-p]) -> T -> per-pair SDF, weighted
    average over the k neighbors (:300-313).
  * color: F_color([posenc(x-p), color_latent]) aggregated, then
    R([viewenc(dir), agg_feat]) -> sigmoid (:325-346).
  * point gradients via autograd double-backprop (:315-323) -> here jax.grad.
  * empty space filler SDF = 1000 (:271).

TPU design: everything is dense ``[M, K]`` with validity masks; the pair MLPs
run as single large matmuls (MXU) instead of the reference's ragged
masked_select pipelines.  One probe function serves the four copy-pasted
reference variants (get_sdf_eval / sdf_importance / pseudo_sdf / sdf_reg).
"""

from functools import partial

import jax
import jax.numpy as jnp

from spurfies_tpu.core.embedder import positional_encoding
from spurfies_tpu.model.networks import mlp_apply
from spurfies_tpu.ops.voxel_grid import query_grid

SDF_FILLER = 1000.0


def rbf_weights(x_pi: jnp.ndarray, valid: jnp.ndarray, rbf: float):
    """Normalized RBF interpolation weights.

    Args:
      x_pi: ``[M, K, 3]`` shading-point minus neighbor-position offsets.
      valid: ``[M, K]`` neighbor validity.
      rbf: sharpness (reference hardcodes 45, pointneus_disent.py:42).

    Returns:
      (w ``[M, K]`` unnormalized (invalid -> 0), norm ``[M, 1]``).

    Distances are stop-gradient (reference detaches, :242).
    """
    dist = jnp.maximum(jnp.linalg.norm(x_pi, axis=-1), 1e-12)
    dist = jax.lax.stop_gradient(dist)
    w = jnp.exp(-((dist * rbf) ** 2)) * valid.astype(x_pi.dtype)
    norm = jnp.sum(w, axis=-1, keepdims=True)
    return w, norm


GEOMETRY_DTYPE = jnp.float32  # set to jnp.bfloat16 via set_geometry_dtype


def set_geometry_dtype(dtype):
    """Global compute dtype for the frozen SDF MLP (bandwidth-bound).

    bf16 halves the HBM traffic of the hot pair-MLP; SDF outputs keep f32
    accumulation.  Validate quality before enabling for final benchmarks.
    """
    global GEOMETRY_DTYPE
    GEOMETRY_DTYPE = dtype


SCATTER_MODE = "xla"      # latent-gradient scatter-add backend:
#                           "xla" (autodiff default) | "pallas" (banked
#                           VMEM accumulator, ops/pallas_scatter.py) —
#                           measured A/B on TPU before flipping defaults


def set_scatter_mode(mode: str):
    global SCATTER_MODE
    SCATTER_MODE = mode


@jax.custom_vjp
def gather_latents(table, idx):
    """``table[idx]`` whose VJP scatter-add backend is SCATTER_MODE.

    idx may be any shape; invalid entries must already be clipped into
    range (cotangents for masked slots are zero, so they accumulate
    nothing wherever they land).
    """
    return table[idx]


def _gather_latents_fwd(table, idx):
    return table[idx], (idx, table.shape[0])


def _gather_latents_bwd(res, ct):
    idx, n = res
    d = ct.shape[-1]
    flat_ct = ct.reshape(-1, d)
    flat_idx = idx.reshape(-1)
    if SCATTER_MODE == "pallas" and jax.default_backend() == "tpu":
        from spurfies_tpu.ops.pallas_scatter import scatter_add_rows
        g = scatter_add_rows(flat_ct, flat_idx, n)
    else:
        g = jnp.zeros((n, d), flat_ct.dtype).at[flat_idx].add(flat_ct)
    zero_idx = jnp.zeros(idx.shape, dtype=jax.dtypes.float0)
    return g, zero_idx


gather_latents.defvjp(_gather_latents_fwd, _gather_latents_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _gather_rows(table, idx, n_grad):
    """``table[idx]`` scattering only the first ``n_grad`` cotangent
    columns in the VJP (the rest of the row is static data — point
    positions — whose cotangent the caller discards anyway)."""
    return table[idx]


def _gather_rows_fwd(table, idx, n_grad):
    return table[idx], (idx, table.shape)


def _gather_rows_bwd(n_grad, res, ct):
    idx, (n, d_tot) = res
    flat_ct = ct.reshape(-1, d_tot)[:, :n_grad]
    flat_idx = idx.reshape(-1)
    if SCATTER_MODE == "pallas" and jax.default_backend() == "tpu":
        from spurfies_tpu.ops.pallas_scatter import scatter_add_rows
        g = scatter_add_rows(flat_ct, flat_idx, n)
    else:
        g = jnp.zeros((n, n_grad), flat_ct.dtype).at[flat_idx].add(flat_ct)
    g = jnp.pad(g, ((0, 0), (0, d_tot - n_grad)))
    zero_idx = jnp.zeros(idx.shape, dtype=jax.dtypes.float0)
    return g, zero_idx


_gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


def gather_pair_rows(latents, points, safe_idx):
    """One combined-row gather of per-pair inputs: ``g = [latent | pos]``.

    The reference assembles pair features with two CUDA gathers + a cat
    (pointneus_disent.py:300-315); the straight XLA translation (gather
    latents, gather npos, subtract, concatenate) materializes four
    ``[M*K, ·]`` HBM intermediates and measured ~3.4 ms of the 37 ms train
    step (trace r3).  Here the scene builds ONE combined ``[N, D+3]``
    table (latent rows ‖ point positions) and gathers raw rows; consumers
    slice the latent columns and subtract positions from the query point
    (``x_pi = x - g[..., D:]``) — slices fuse into the consumer, so no
    second full-width pass materializes.  The fused Pallas SDF kernels
    (ops/pallas_mlp pair_sdf_rows_*) take ``g`` directly and assemble
    ``u = [latent | x - pos]`` in VMEM.

    Positions are static scene geometry (SceneState contract), so the
    gather VJP scatters only the latent columns.

    Returns ``g [M, K, D+3]``.
    """
    d = latents.shape[1]
    table = jnp.concatenate(
        [latents, jax.lax.stop_gradient(points).astype(latents.dtype)], 1)
    return _gather_rows(table, safe_idx, d)               # [M, K, D+3]


FUSED_MLP_MODE = "auto"   # "auto" (TPU only) | "on" (incl. interpret) | "off"
FUSED_COLOR = False       # fused color kernel: measured net-negative (see
#                           aggregate_color note); flip to re-evaluate
FUSED_MLP_DTYPE = jnp.bfloat16   # quality-gated: 2k-step validate_pipeline
#                                  PSNR 25.44 / mesh err 0.0276 == f32 run


def set_fused_mlp(mode: str, dtype=None):
    """Control the fused Pallas pair-MLP kernel (ops/pallas_mlp.py).

    auto: real kernel on TPU, plain-XLA path elsewhere (tests force "on"
    to exercise the interpreter).  dtype: kernel matmul precision.
    """
    global FUSED_MLP_MODE, FUSED_MLP_DTYPE
    FUSED_MLP_MODE = mode
    if dtype is not None:
        FUSED_MLP_DTYPE = dtype


def _use_fused() -> bool:
    if FUSED_MLP_MODE == "on":
        return True
    if FUSED_MLP_MODE == "off":
        return False
    return jax.default_backend() == "tpu"


def pair_sdf(frozen, geo_feats: jnp.ndarray, x_pi: jnp.ndarray):
    """Per-(point, neighbor)-pair SDF: T(F_geometry([geo, x_pi]))."""
    field_in = jnp.concatenate([geo_feats, x_pi], axis=-1)
    dtype = None if GEOMETRY_DTYPE == jnp.float32 else GEOMETRY_DTYPE
    h = mlp_apply(frozen["F_geometry"], field_in, compute_dtype=dtype)
    return mlp_apply(frozen["T"], h, compute_dtype=dtype)[..., 0]


def aggregate_sdf(frozen, geo_latents, points, idx, valid, x, rbf,
                  need_grad: bool = True):
    """RBF-weighted SDF at positions ``x``.

    Args:
      geo_latents: ``[N, 32]``; points: ``[N, 3]``.
      idx: ``[M, K]`` neighbor indices (clipped >= 0 where invalid).
      valid: ``[M, K]``; x: ``[M, 3]``.
      need_grad: False on stop-gradient probe paths (sampler importance,
        mesh extraction) — picks the value-only fused kernel (half cost).

    Returns:
      (sdf ``[M]`` — SDF_FILLER where no valid neighbor, any ``[M]`` bool).
    """
    safe_idx = jnp.maximum(idx, 0)
    if _use_fused() and FUSED_AGG:
        n = geo_latents.shape[0]
        idx_ext = jnp.where(valid, safe_idx, n)
        if not need_grad:
            return _aggregate_sdf_value_agg(frozen, geo_latents, points,
                                            idx_ext, x, rbf)
        num, den, _gagg = pair_sdf_aggregate(frozen, geo_latents, points,
                                             idx_ext, x, rbf)
        has = den > 0
        sdf = jnp.where(has, num / jnp.where(has, den, 1.0), SDF_FILLER)
        return sdf, has
    if _use_fused():
        m, k = idx.shape
        g3 = gather_pair_rows(geo_latents, points, safe_idx)
        g = g3.reshape(m * k, -1)
        x_rows = jnp.broadcast_to(x[:, None, :], (m, k, 3)).reshape(-1, 3)
        if need_grad:
            from spurfies_tpu.ops.pallas_mlp import pair_sdf_rows_grad
            s, _, xpi = pair_sdf_rows_grad(frozen, g, x_rows,
                                           FUSED_MLP_DTYPE)
        else:
            from spurfies_tpu.ops.pallas_mlp import pair_sdf_rows_value
            s, xpi = pair_sdf_rows_value(frozen, g, x_rows, FUSED_MLP_DTYPE)
        w, norm = rbf_weights(xpi.reshape(m, k, 3), valid, rbf)
        s = s.reshape(m, k)
    else:
        npos = points[safe_idx]                   # [M, K, 3]
        gfeat = geo_latents[safe_idx]             # [M, K, 32]
        x_pi = x[:, None, :] - npos
        w, norm = rbf_weights(x_pi, valid, rbf)
        s = pair_sdf(frozen, gfeat, x_pi)         # [M, K]
    s = jnp.where(valid, s, 0.0)
    has = norm[..., 0] > 0
    agg = jnp.sum(w * s, axis=-1) / jnp.where(has, norm[..., 0], 1.0)
    return jnp.where(has, agg, SDF_FILLER), has


def sdf_probe(frozen, geo_latents, scene, x, k, r, rbf,
              budget_frac: float | None = 0.25, need_grad: bool = True,
              return_overflow: bool = False):
    """SDF at arbitrary world points (filler 1000 in empty space).

    One function replacing the reference's get_sdf_eval (:249-298),
    sdf_importance (:348-421), pseudo_sdf (:423-495) and sdf_reg (:518-583),
    which are the same computation copy-pasted four times.  ``r`` must match
    the radius the scene's QueryTable was built with.

    budget_frac: most probe points lie in empty space (no neighbors); a
    one-int-per-point fine-occupancy gather prunes them BEFORE the kNN
    query, and only the first ``budget_frac * M`` occupied points (static
    shape) run query + pair MLP — a sorted gather/scatter replaces the
    reference's ragged CUDA compaction.  None disables (all M run, masked).

    return_overflow: also return a scalar bool — True when occupied probe
    points were dropped by the budget (they read as empty space, which
    silently corrupts importance sampling if the budget was mis-sized;
    callers plumb this into step telemetry like ray_budget_overflow).
    """
    from spurfies_tpu.ops.voxel_grid import fine_occupancy

    m = x.shape[0]

    budget = (max(int(m * budget_frac) // 128 * 128, 128)
              if budget_frac is not None else m)
    if budget_frac is None or m < 1024 or budget >= m:
        # near-dense budgets (calibrated full-frame scenes) make the
        # compaction pure overhead — run dense, masked
        idx, _ = query_grid(x, scene.table, scene.spec, k=k)
        valid = idx >= 0
        sdf, _ = aggregate_sdf(frozen, geo_latents, scene.points, idx,
                               valid, x, rbf, need_grad=need_grad)
        if return_overflow:
            return sdf, jnp.asarray(False)
        return sdf

    # fine-occupancy prefilter (exact cell-granular superset of having
    # neighbors within radius — ops.voxel_grid.build_occupancy_bitmap)
    occ = fine_occupancy(x, scene.occ_fine, scene.spec)
    # first `budget` occupied positions via cumsum+scatter (O(m); a sort
    # here measured ~2ms at 131k probe points)
    sel, sel_ok, overflowed = compact_pair_slots(occ, budget)
    # (ray-major order already has spatial locality; cell-sorting measured
    # neutral here — see query_grid(sort_queries=...) for random batches)

    x_c = x[sel]
    idx_c, _ = query_grid(x_c, scene.table, scene.spec, k=k)
    valid_c = (idx_c >= 0) & sel_ok[:, None]
    sdf_c, _ = aggregate_sdf(frozen, geo_latents, scene.points, idx_c,
                             valid_c, x_c, rbf, need_grad=need_grad)
    out = jnp.full((m,), SDF_FILLER, dtype=x.dtype)
    out = out.at[jnp.where(sel_ok, sel, m)].set(
        jnp.where(sel_ok, sdf_c, SDF_FILLER), mode="drop"
    )
    if return_overflow:
        return out, overflowed
    return out


def inverse_distance_weights(x_pi: jnp.ndarray, valid: jnp.ndarray):
    """Legacy 1/d interpolation weights (reference pointneus.py:184-190;
    NOT detached there, unlike the disentangled RBF weights)."""
    dist = jnp.maximum(jnp.linalg.norm(x_pi, axis=-1), 1e-12)
    w = (1.0 / dist) * valid.astype(x_pi.dtype)
    norm = jnp.sum(w, axis=-1, keepdims=True)
    return w, norm


def entangled_sdf_feat(train_params, feats, points, idx, valid, x,
                       pos_multires: int = 4):
    """Legacy entangled field: trunk F([posenc4(x_pi), latent]) -> (T->sdf,
    trunk features for color), 1/d-weighted aggregation
    (reference pointneus.py:260-310 semantics).

    Returns (sdf ``[M]`` filler 1000, agg_feat ``[M, 256]``, has ``[M]``).
    """
    safe_idx = jnp.maximum(idx, 0)
    npos = points[safe_idx]
    lat = feats[safe_idx]                          # [M, K, 64]
    x_pi = x[:, None, :] - npos
    w, norm = inverse_distance_weights(x_pi, valid)

    pos_enc = positional_encoding(x_pi, pos_multires)
    h = mlp_apply(train_params["F"],
                  jnp.concatenate([pos_enc, lat], axis=-1))   # [M, K, 256]
    sdf_k = mlp_apply(train_params["T"], h)[..., 0]
    sdf_k = jnp.where(valid, sdf_k, 0.0)
    h = jnp.where(valid[..., None], h, 0.0)

    has = norm[..., 0] > 0
    denom = jnp.where(has, norm[..., 0], 1.0)
    sdf = jnp.where(has, jnp.sum(w * sdf_k, -1) / denom, SDF_FILLER)
    feat = jnp.sum(w[..., None] * h, -2) / denom[..., None]
    return sdf, feat, has


def entangled_sdf_grad_color(train_params, feats, points, idx, valid, x,
                             ray_dirs, view_multires: int = 6):
    """sdf + spatial gradient + color for the legacy model."""
    def scalar_sdf(xi, idx_i, valid_i):
        s, _, _ = entangled_sdf_feat(train_params, feats, points,
                                     idx_i[None], valid_i[None], xi[None])
        return s[0]

    sdf, grad = jax.vmap(jax.value_and_grad(scalar_sdf))(x, idx, valid)
    _, feat, _ = entangled_sdf_feat(train_params, feats, points, idx,
                                    valid, x)
    dir_enc = positional_encoding(ray_dirs, view_multires)
    rgb = mlp_apply(train_params["R"],
                    jnp.concatenate([dir_enc, feat], -1),
                    final_act="sigmoid")
    return sdf, grad, rgb


def sdf_and_grad(frozen, geo_latents, points, idx, valid, x, rbf):
    """Aggregated SDF and its spatial gradient d(sdf)/dx.

    Equivalent of the reference's autograd double-backprop
    (pointneus_disent.py:315-323); in JAX a per-point value_and_grad that
    remains differentiable w.r.t. latents/params (for eikonal training).
    """
    if _use_fused():
        return _sdf_and_grad_fused(frozen, geo_latents, points, idx, valid,
                                   x, rbf)

    def scalar_sdf(xi, idx_i, valid_i):
        s, _ = aggregate_sdf(frozen, geo_latents, points, idx_i[None],
                             valid_i[None], xi[None], rbf)
        return s[0]

    f = jax.vmap(jax.value_and_grad(scalar_sdf), in_axes=(0, 0, 0))
    sdf, grad = f(x, idx, valid)
    return sdf, grad


def _sdf_and_grad_fused(frozen, geo_latents, points, idx, valid, x, rbf):
    """Fused-kernel sdf_and_grad: one Pallas pass yields per-pair value +
    input gradient; d(agg)/dx = RBF-weighted sum of per-pair x_pi grads
    (the weights are constant w.r.t. x — distances are detached,
    reference :242)."""
    from spurfies_tpu.ops.pallas_mlp import pair_sdf_rows_grad

    if FUSED_AGG:
        # r5: the aggregation runs INSIDE the kernel (pair_sdf_aggregate);
        # only per-point stats return to HBM
        n = geo_latents.shape[0]
        idx_ext = jnp.where(valid, jnp.maximum(idx, 0), n)
        num, den, gagg = pair_sdf_aggregate(frozen, geo_latents, points,
                                            idx_ext, x, rbf)
        has = den > 0
        den_s = jnp.where(has, den, 1.0)
        sdf = jnp.where(has, num / den_s, SDF_FILLER)
        grad = gagg / den_s[:, None]
        return sdf, grad

    m, k = idx.shape
    safe_idx = jnp.maximum(idx, 0)
    d = geo_latents.shape[1]
    g3 = gather_pair_rows(geo_latents, points, safe_idx)
    x_rows = jnp.broadcast_to(x[:, None, :], (m, k, 3)).reshape(-1, 3)
    s, r, xpi = pair_sdf_rows_grad(frozen, g3.reshape(m * k, -1), x_rows,
                                   FUSED_MLP_DTYPE)
    w, norm = rbf_weights(xpi.reshape(m, k, 3), valid, rbf)
    s = jnp.where(valid, s.reshape(m, k), 0.0)
    g = jax.lax.stop_gradient(r[:, d:].reshape(m, k, 3))
    g = jnp.where(valid[..., None], g, 0.0)

    has = norm[..., 0] > 0
    den = jnp.where(has, norm[..., 0], 1.0)
    sdf = jnp.where(has, jnp.sum(w * s, axis=-1) / den, SDF_FILLER)
    grad = jnp.sum(w[..., None] * g, axis=-2) / den[..., None]
    return sdf, grad


FUSED_AGG = False         # r5 fused gather+MLP+RBF+aggregate kernels
#                           (pallas_mlp pair_sdf_aggregate path); False
#                           restores the r4 per-pair kernels + XLA glue
#                           (default flips on once TPU-gated — see NOTES)
FUSED_AGG_R_DTYPE = jnp.bfloat16   # residual r_lat storage dtype (the
#                                    backward's latent cotangents; r is
#                                    already bf16-matmul-limited)


def set_fused_agg(on: bool):
    global FUSED_AGG
    FUSED_AGG = on


def _agg_fwd_impl(frozen, latents, points, idx_ext, x, rbf):
    from spurfies_tpu.ops import pallas_mlp as pm

    n, d = latents.shape
    m, k = idx_ext.shape
    pad = (-m) % 128
    if pad:
        idx_ext = jnp.pad(idx_ext, ((0, pad), (0, 0)), constant_values=n)
        x = jnp.pad(x, ((0, pad), (0, 0)))

    table = jnp.concatenate(
        [latents, jax.lax.stop_gradient(points).astype(latents.dtype)], 1)
    dump = jnp.concatenate(
        [jnp.zeros((1, d), latents.dtype),
         jnp.full((1, 3), pm.DUMP_POS, latents.dtype)], 1)
    table_ext = jnp.concatenate([table, dump], 0)       # [N+1, d+3]
    g = table_ext[idx_ext.reshape(-1)]                  # [(m+pad)*k, d+3]

    ws, bs, n_act = pm._prep_layers(frozen, FUSED_MLP_DTYPE)
    interpret = jax.default_backend() != "tpu"
    pt, w, r = pm._fused_agg_call(
        g, x, ws, bs, k, float(rbf) ** 2,
        compute_dtype=FUSED_MLP_DTYPE, interpret=interpret, n_act=n_act,
        r_dtype=FUSED_AGG_R_DTYPE,
    )
    num, den, gagg = pt[:m, 0], pt[:m, 1], pt[:m, 2:5]
    return (num, den, gagg), (w, r, idx_ext.reshape(-1), den, gagg)


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def pair_sdf_aggregate(frozen, latents, points, idx_ext, x, rbf):
    """(num [M], den [M], gagg [M, 3]) = RBF-aggregated frozen-MLP stats.

    num = sum_k w*s, den = sum_k w, gagg = sum_k w * ds/dx — everything the
    SDF/grad consumers need, computed in ONE fused Pallas pass per pair
    tile with NO per-pair HBM intermediates (module note in
    ops/pallas_mlp.py).  ``idx_ext`` is ``[M, K]`` with INVALID pairs set
    to N (the dump row); w of a dump pair is exactly 0.

    Differentiable w.r.t. latents (banked fused scatter) and x
    (num_bar * gagg); den/gagg pullbacks are zero (detached RBF weights —
    reference pointneus_disent.py:242 — and a.e.-zero piecewise-linear r).
    """
    out, _ = _agg_fwd_impl(frozen, latents, points, idx_ext, x, rbf)
    return out


def _pair_agg_vjp_fwd(frozen, latents, points, idx_ext, x, rbf):
    out, res = _agg_fwd_impl(frozen, latents, points, idx_ext, x, rbf)
    return out, (frozen, latents.shape, points.shape, res)


def _pair_agg_vjp_bwd(rbf, resid, cot):
    from spurfies_tpu.ops import pallas_mlp as pm

    frozen, lat_shape, pts_shape, (w, r, idx_flat, den, gagg) = resid
    num_bar, _den_bar, _gagg_bar = cot
    n, d = lat_shape
    m = num_bar.shape[0]
    pad = (-m) % 128
    sb = jnp.pad(num_bar, (0, pad))[:, None]            # [P_pad, 1]

    interpret = jax.default_backend() != "tpu"
    k = r.shape[0] // sb.shape[0]
    lat_bar = pm._fused_agg_bwd_call(sb, w, r, idx_flat, n + 1, k,
                                     interpret=interpret)[:n]
    # x pullback: num = sum_k w * s(x - pos, ...) => d num/dx = gagg
    x_bar = num_bar[:, None] * gagg
    zero_frozen = jax.tree_util.tree_map(jnp.zeros_like, frozen)
    zero_idx = jnp.zeros((m, r.shape[0] // sb.shape[0]),
                         dtype=jax.dtypes.float0)
    return (zero_frozen, lat_bar, jnp.zeros(pts_shape, x_bar.dtype),
            zero_idx, x_bar)


pair_sdf_aggregate.defvjp(_pair_agg_vjp_fwd, _pair_agg_vjp_bwd)


def _aggregate_sdf_value_agg(frozen, geo_latents, points, idx_ext, x, rbf):
    """No-grad value+aggregation fused path (probe/mesh): (sdf, has)."""
    from spurfies_tpu.ops import pallas_mlp as pm

    n, d = geo_latents.shape
    m, k = idx_ext.shape
    pad = (-m) % 128
    if pad:
        idx_ext = jnp.pad(idx_ext, ((0, pad), (0, 0)), constant_values=n)
        x = jnp.pad(x, ((0, pad), (0, 0)))
    table = jnp.concatenate(
        [geo_latents, points.astype(geo_latents.dtype)], 1)
    dump = jnp.concatenate(
        [jnp.zeros((1, d), geo_latents.dtype),
         jnp.full((1, 3), pm.DUMP_POS, geo_latents.dtype)], 1)
    g = jnp.concatenate([table, dump], 0)[idx_ext.reshape(-1)]
    ws, bs, n_act = pm._prep_layers(frozen, FUSED_MLP_DTYPE)
    interpret = jax.default_backend() != "tpu"
    pt = pm._fused_value_agg_call(
        g, x, ws, bs, k, float(rbf) ** 2,
        compute_dtype=FUSED_MLP_DTYPE, interpret=interpret, n_act=n_act,
    )
    num, den = pt[:m, 0], pt[:m, 1]
    has = den > 0
    sdf = jnp.where(has, num / jnp.where(has, den, 1.0), SDF_FILLER)
    return sdf, has


def cumsum_1d(x: jnp.ndarray) -> jnp.ndarray:
    """Blocked inclusive 1-D cumsum.

    XLA's long 1-D cumsum on TPU runs as a near-sequential lane scan —
    31 ms for a 131k int32 vector (r4 eval trace, compact_pair_slots'
    rank pass, once per probe round).  Row-blocking it ([rows, 128]
    lane-scan + recursive row offsets) makes it ~bandwidth."""
    n = x.shape[0]
    if n <= 512:
        return jnp.cumsum(x)
    pad = (-n) % 128
    x2 = jnp.pad(x, (0, pad)).reshape(-1, 128)
    within = jnp.cumsum(x2, axis=1)
    totals = within[:, -1]
    offs = cumsum_1d(totals) - totals                   # exclusive
    return (within + offs[:, None]).reshape(-1)[:n]


def compact_pair_slots(valid_flat: jnp.ndarray, budget: int):
    """First-``budget`` True positions of ``valid_flat`` (static shape).

    cumsum+scatter (O(P)) instead of a sort (O(P log P)): dest[p] = rank of
    p among valid slots; scatter arange into a [budget] buffer.

    Returns (slot ``[budget]`` int32 positions (clipped where unused),
    ok ``[budget]`` bool, overflowed ``[]`` bool — True when valid pairs
    were dropped).
    """
    p = valid_flat.shape[0]
    ranks = cumsum_1d(valid_flat.astype(jnp.int32)) - 1        # [P]
    n_valid = ranks[-1] + 1
    dest = jnp.where(valid_flat & (ranks < budget), ranks, budget)
    slot = jnp.full((budget + 1,), p, dtype=jnp.int32)
    slot = slot.at[dest].set(jnp.arange(p, dtype=jnp.int32), mode="drop")
    slot = slot[:budget]
    ok = slot < p
    return jnp.minimum(slot, p - 1), ok, n_valid > budget


def sdf_and_grad_pairs(frozen, geo_latents, points, idx, valid, x, rbf,
                       pair_budget: int):
    """Pair-compacted :func:`sdf_and_grad`.

    The dense path runs the frozen pair-MLP on every ``[M, K]`` slot,
    valid or not; in production roughly half the slots are masked filler.
    Here the ``M*K`` pair grid is compacted to its first ``pair_budget``
    valid pairs (static shape), the MLP + input-gradient run once per kept
    pair, and RBF-weighted sums scatter back per point.  Because the RBF
    weights are constant w.r.t. x (distances are detached, reference
    :242), d(agg)/dx decomposes into per-pair MLP input gradients — no
    per-point K-group vmap needed.

    Compaction order is COLUMN-major (all 1st-nearest pairs, then all
    2nd-nearest, ...).  query_grid returns neighbors nearest-first, so a
    point's valid pairs are a prefix of its row; on overflow the tail
    that drops is the FARTHEST neighbor of the tail points — effective k
    shrinks gracefully, and no point with neighbors ever loses its whole
    neighborhood (the failure mode that sank the point-level
    render_budget_frac: holes at convergence).  The weight normalization
    drops with the pair, so the SDF stays a proper weighted average.

    Exact match of sdf_and_grad when nothing overflows
    (tests/test_model.py).
    """
    m, k = idx.shape
    flat_valid = valid.T.reshape(-1)                 # column-major [K*M]
    slot, ok, overflowed = compact_pair_slots(flat_valid, pair_budget)

    pt = slot % m                                    # owning point row
    kk = slot // m                                   # neighbor rank
    pidx = jnp.maximum(idx.reshape(-1)[pt * k + kk], 0)
    x_b = x[pt]                                      # [B, 3]
    npos = points[pidx]
    gfeat = gather_latents(geo_latents, pidx)        # [B, 32]
    x_pi = x_b - npos

    dist = jax.lax.stop_gradient(
        jnp.maximum(jnp.linalg.norm(x_pi, axis=-1), 1e-12)
    )
    w = jnp.exp(-((dist * rbf) ** 2)) * ok.astype(x.dtype)

    if _use_fused():
        from spurfies_tpu.ops.pallas_mlp import pair_sdf_value_and_input_grad
        u = jnp.concatenate([gfeat, x_pi], axis=-1)
        s, r = pair_sdf_value_and_input_grad(frozen, u, FUSED_MLP_DTYPE)
        g = jax.lax.stop_gradient(r[:, gfeat.shape[-1]:])
    else:
        def f(xpi_one, gf_one):
            return pair_sdf(frozen, gf_one[None], xpi_one[None])[0]

        s, g = jax.vmap(jax.value_and_grad(f))(x_pi, gfeat)  # [B], [B, 3]

    seg = jnp.where(ok, pt, m)
    num = jnp.zeros((m,), x.dtype).at[seg].add(w * s, mode="drop")
    den = jnp.zeros((m,), x.dtype).at[seg].add(w, mode="drop")
    gnum = jnp.zeros((m, 3), x.dtype).at[seg].add(w[:, None] * g,
                                                  mode="drop")
    has = den > 0
    safe_den = jnp.where(has, den, 1.0)
    sdf = jnp.where(has, num / safe_den, SDF_FILLER)
    grad = gnum / safe_den[:, None]
    return sdf, grad


def aggregate_color_pairs(train_params, color_latents, points, idx, valid,
                          x, ray_dirs, rbf, pair_budget: int,
                          pos_multires=6, view_multires=3,
                          compute_dtype=jnp.bfloat16):
    """Pair-compacted :func:`aggregate_color`.

    Same column-major compaction as :func:`sdf_and_grad_pairs`: the
    trainable F_color MLP (the [M*K, 256] activation traffic is the cost,
    fwd AND stored-activation bwd) runs only on valid pairs; the weighted
    aggregation scatters back per point and the per-point R head is
    unchanged.  Overflow sheds farthest neighbors (weight renormalizes),
    never whole points.

    Exact match of aggregate_color when nothing overflows
    (tests/test_model.py::test_color_pairs_match_dense).
    """
    m, k = idx.shape
    flat_valid = valid.T.reshape(-1)                 # column-major [K*M]
    slot, ok, _ = compact_pair_slots(flat_valid, pair_budget)
    pt = slot % m
    kk = slot // m
    pidx = jnp.maximum(idx.reshape(-1)[pt * k + kk], 0)
    x_pi = x[pt] - points[pidx]                      # [B, 3]
    cfeat = gather_latents(color_latents, pidx)      # [B, 64]

    dist = jax.lax.stop_gradient(
        jnp.maximum(jnp.linalg.norm(x_pi, axis=-1), 1e-12)
    )
    w = jnp.exp(-((dist * rbf) ** 2)) * ok.astype(x.dtype)
    seg = jnp.where(ok, pt, m)
    den = jnp.zeros((m,), x.dtype).at[seg].add(w, mode="drop")
    has = den > 0
    wn = w / jnp.where(has, den, 1.0)[pt]

    pos_enc = positional_encoding(x_pi, pos_multires)         # [B, 39]
    feat = mlp_apply(train_params["F_color"],
                     jnp.concatenate([pos_enc, cfeat], axis=-1),
                     compute_dtype=compute_dtype)             # [B, 256]
    agg = jnp.zeros((m, feat.shape[-1]), x.dtype).at[seg].add(
        wn[:, None] * feat.astype(x.dtype), mode="drop"
    )

    dir_enc = positional_encoding(ray_dirs, view_multires)    # [M, 21]
    rgb = mlp_apply(train_params["R"], jnp.concatenate([dir_enc, agg], -1),
                    final_act="sigmoid", compute_dtype=compute_dtype)
    return rgb


def aggregate_color(train_params, color_latents, points, idx, valid, x,
                    ray_dirs, rbf, pos_multires=6, view_multires=3,
                    compute_dtype=jnp.bfloat16):
    """View-dependent color at shading points.

    Args:
      x: ``[M, 3]`` shading points; ray_dirs: ``[M, 3]`` unit directions.
      compute_dtype: the color MLPs run in bf16 by default — they are
        HBM-bandwidth-bound ([M*K, 256] activations) and color tolerates
        bf16 rounding; aggregation stays f32.

    Returns colors ``[M, 3]`` in [0, 1].
    """
    safe_idx = jnp.maximum(idx, 0)
    d = color_latents.shape[1]
    g3 = gather_pair_rows(color_latents, points, safe_idx)
    cfeat = g3[..., :d]                              # [M, K, 64]
    x_pi = x[:, None, :] - g3[..., d:]
    w, norm = rbf_weights(x_pi, valid, rbf)

    # NEGATIVE RESULT (round 2): the fused color kernel (ops/pallas_color)
    # matches XLA on fwd but its backward — in-kernel transposed dW
    # matmuls + cross-tile accumulators — measured SLOWER than XLA's whole
    # fwd+bwd (17-47ms vs 18ms at production shapes), and degrades with
    # tile size.  Unlike the frozen SDF net, the trainable color stack
    # gets no piecewise-linear VJP collapse, and XLA's stored-activation
    # backward is already efficient.  Kept behind this flag (parity-tested
    # in tests/test_pallas_mlp.py) for future revisits.
    if (FUSED_COLOR and _use_fused() and idx.shape[1] == 8
            and pos_multires == 6):
        from spurfies_tpu.ops.pallas_color import TP, fused_color
        m, k = idx.shape
        has = norm > 0
        wn = (w / jnp.where(has, norm, 1.0))[..., None]     # [M, K, 1]
        dir_enc = positional_encoding(ray_dirs, view_multires)
        pad = (-m) % TP
        if pad:
            x_pi = jnp.pad(x_pi, ((0, pad), (0, 0), (0, 0)))
            cfeat = jnp.pad(cfeat, ((0, pad), (0, 0), (0, 0)))
            wn = jnp.pad(wn, ((0, pad), (0, 0), (0, 0)))
            dir_enc = jnp.pad(dir_enc, ((0, pad), (0, 0)))
        rgb = fused_color(
            train_params,
            x_pi.reshape(-1, 3), cfeat.reshape(-1, cfeat.shape[-1]),
            wn.reshape(-1, 1), dir_enc, FUSED_MLP_DTYPE,
        )
        return rgb[:m]

    pos_enc = positional_encoding(x_pi, pos_multires)       # [M, K, 39]
    field_in = jnp.concatenate([pos_enc, cfeat], axis=-1)   # [M, K, 103]
    # LINEAR-TAIL FOLD (r5, exact): F_color's last layer has no activation
    # (reference pointneus_disent.py:100-110 — LeakyReLU after the first 3
    # only), so it COMMUTES with the weighted aggregation:
    #   sum_k wn_k (h_k @ W4 + b4) = (sum_k wn_k h_k) @ W4 + (sum_k wn_k) b4
    # Running W4 on the aggregated [M, 256] instead of the pair grid
    # [M*K, 256] cuts one of the pair-level matmuls (fwd AND its stored-
    # activation backward) by K=8x.
    f_color = train_params["F_color"]
    h = mlp_apply(f_color[:-1], field_in, final_act="leaky_relu",
                  compute_dtype=compute_dtype)              # [M, K, 256]
    h = jnp.where(valid[..., None], h, 0.0)
    has = norm > 0
    den = jnp.where(has, norm, 1.0)
    hbar = jnp.sum(w[..., None] * h, axis=-2) / den         # [M, 256]
    swn = (jnp.sum(w, axis=-1, keepdims=True) / den)        # 1 valid, 0 not
    w4, b4 = f_color[-1]["w"], f_color[-1]["b"]
    if compute_dtype is not None:
        agg = (jnp.dot(hbar.astype(compute_dtype), w4.astype(compute_dtype),
                       preferred_element_type=compute_dtype)
               .astype(hbar.dtype) + swn * b4)
    else:
        agg = hbar @ w4 + swn * b4

    dir_enc = positional_encoding(ray_dirs, view_multires)  # [M, 21]
    rgb = mlp_apply(train_params["R"], jnp.concatenate([dir_enc, agg], -1),
                    final_act="sigmoid", compute_dtype=compute_dtype)
    return rgb
