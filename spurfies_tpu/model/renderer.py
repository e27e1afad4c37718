"""Full neural-point VolSDF forward pass (dense, static-shape).

Behavioral spec from reference ``spurfies/model/pointneus_disent.py:614-908``
(see SURVEY §3.1 for the call stack).  Differences by design (TPU-first):
  * no ragged ray/sample compaction — dense ``[R, S]`` with masks; the
    reference's ``max_shading_pts`` cap becomes :func:`ops.compact_rays`.
  * the voxel table is prebuilt in SceneState (points are static).
  * spatial SDF gradients via jax.grad instead of autograd double backprop.

Outputs mirror the reference dict: rgb_values, depth_values, depth_vals,
weights, xyz, normals (eval), grad_theta (train), plus mask/aux terms the
loss consumes.
"""

from functools import partial

import jax
import jax.numpy as jnp

from spurfies_tpu.config import ModelConfig
from spurfies_tpu.core.cameras import get_camera_params
from spurfies_tpu.core.density import get_beta, laplace_density
from spurfies_tpu.core.quadrature import render_weights
from spurfies_tpu.model import field
from spurfies_tpu.model.sampler import error_bound_z_vals
from spurfies_tpu.ops.voxel_grid import compact_rays, query_grid


def render_rays(params, scene, inputs, key, cfg: ModelConfig, *,
                train: bool, iters: int):
    """Render a batch of rays.

    Args:
      params: ``{"frozen": ..., "train": ...}`` (train includes latents+beta).
      scene: SceneState.
      inputs: dict with ``uv [1, R, 2]``, ``pose [1, 4, 4]``,
        ``intrinsics [1, 4, 4]``.
      key: PRNG key (sampling).
      train: static — stratified sampling, grad_theta output.
      iters: static sampler iteration count (train fast=1; eval
        max_total_iters).

    Returns:
      dict of dense ``[R, ...]`` outputs + ``ray_mask``.
    """
    scfg = cfg.ray_sampler

    uv = inputs["uv"]
    pose = inputs["pose"]
    intrinsics = inputs["intrinsics"]

    ray_dirs_b, cam_loc_b = get_camera_params(uv, pose, intrinsics)
    ray_dirs = ray_dirs_b.reshape(-1, 3)
    n_rays = ray_dirs.shape[0]
    cam_loc = jnp.broadcast_to(cam_loc_b[:, None, :],
                               ray_dirs_b.shape).reshape(-1, 3)

    # depth scale: z-component of rays in camera frame (reference :642-645)
    eye = jnp.broadcast_to(jnp.eye(4, dtype=pose.dtype), pose.shape)
    dirs_cam, _ = get_camera_params(uv, eye, intrinsics)
    depth_scale = dirs_cam.reshape(-1, 3)[:, 2:]

    key, skey = jax.random.split(key)

    if 0 < cfg.ray_budget_frac < 1 and train and not cfg.entangled:
        # TRAIN-ONLY ray compaction: ~26% of a uniform pixel batch misses
        # the cloud entirely (micro_scols.py) yet pays the full dense
        # [S, K] sampler/query/MLP/color cost.  The reference never pays
        # for misses (its CUDA ray_mask compaction drops them,
        # model/utils.py:90-113); here a coarse cell-occupancy test over
        # the uniform init grid selects candidate rays FIRST, the whole
        # render runs on a static frac*R budget, and outputs scatter back
        # dense.  Occupancy over-selects (superset of has-neighbor);
        # budget overflow drops excess candidate rays from the batch
        # (ray_mask False -> excluded from losses like misses).
        # 64-row alignment (f32 sublane-friendly): 128 rounds a 0.88 frac
        # at R=1024 all the way back up to dense
        budget = -(-int(n_rays * cfg.ray_budget_frac) // 64) * 64
        budget = min(n_rays, max(128, budget))
        if budget < n_rays:  # full-width compaction is pure overhead
            ray_occ = _coarse_ray_occupancy(cam_loc, ray_dirs, scene, scfg)
            slot, ok, overflowed = field.compact_pair_slots(ray_occ, budget)
            out = _render_body(params, scene, cam_loc[slot],
                               ray_dirs[slot], depth_scale[slot], skey,
                               cfg, train=train, iters=iters)
            probe_ovf = out.pop("probe_budget_overflow")  # scalar
            dense = _scatter_rays_back(out, slot, ok, n_rays, scfg.far)
            dense["probe_budget_overflow"] = probe_ovf
            # telemetry: True when occupied rays were dropped from this
            # batch because the calibrated budget was too small — a
            # mis-calibrated scene shows up in the step metrics instead
            # of silently losing rays (VERDICT r3 weak #7)
            dense["ray_budget_overflow"] = overflowed
            return dense

    out = _render_body(params, scene, cam_loc, ray_dirs, depth_scale,
                       skey, cfg, train=train, iters=iters)
    out["ray_budget_overflow"] = jnp.asarray(False)
    return out


def _take_z(z_all, sel):
    """``z_all[r, sel[r, s]]`` as a compare-reduce.

    ``jnp.take_along_axis`` lowers to an XLA gather that costs 0.53 ms at
    the production [832, 98] -> [832, 80] shape (r4 trace, fusion.999);
    the one-hot masked sum is ~20 M VPU element-ops (~0.03 ms) and fuses
    with its consumers.  Requires in-range ``sel`` (compact_rays clips)."""
    z = z_all.shape[-1]
    iota = jnp.arange(z, dtype=sel.dtype)
    m = sel[..., None] == iota[None, None, :]
    return jnp.sum(jnp.where(m, z_all[:, None, :], 0.0), axis=-1)


def _take_rows(vals, sel):
    """``vals[r, sel[r, s], :]`` (``[R, Z, D] x [R, S] -> [R, S, D]``) via
    the same one-hot compare-reduce as :func:`_take_z` (exactly one hit
    per row, so the masked sum IS the selected value — works for signed
    ints and bools too)."""
    z = vals.shape[1]
    iota = jnp.arange(z, dtype=sel.dtype)
    m = (sel[..., None] == iota[None, None, :])[..., None]  # [R, S, Z, 1]
    picked = jnp.sum(
        jnp.where(m, vals[:, None, :, :], jnp.zeros_like(vals[0, 0, 0])),
        axis=2,
    )
    return picked.astype(vals.dtype)


def _coarse_ray_occupancy(cam_loc, ray_dirs, scene, scfg):
    """Per-ray predicate: does any uniform-grid sample land in an occupied
    FINE cell (ops.voxel_grid.build_occupancy_bitmap)?  One int gather per
    sample; a superset of the dense path's eventual has-neighbor ray mask
    except for sub-cell corner clips the grid can step over (quality-gated;
    such rays carry near-zero rendering weight).  The fine bitmap's ~0.09
    slack (vs ~0.18 for the coarse candidate-list test) is what lets the
    auto ray budget drop below 1.0 on real scenes."""
    from spurfies_tpu.ops.voxel_grid import fine_occupancy

    z = jnp.linspace(scfg.near, scfg.far, scfg.n_samples_eval,
                     dtype=cam_loc.dtype)
    pts = cam_loc[:, None, :] + z[None, :, None] * ray_dirs[:, None, :]
    occ = fine_occupancy(pts.reshape(-1, 3), scene.occ_fine, scene.spec)
    return jnp.any(occ.reshape(pts.shape[0], -1), axis=-1)


_SCATTER_DEFAULTS = {
    "rgb_values": 0.0, "depth_values": 1.0, "acc": 0.0, "weights": 0.0,
    "depth_vals": None, "xyz": 0.0, "sdf": None, "z_sel": 0.0,
    "valid_pt": False, "ray_mask": False, "pts_rendered": 0.0,
    "grad_theta": 0.0, "nbr_idx": -1, "nbr_valid": False, "cam_loc": 0.0,
    "ray_dirs": 0.0, "normal_map": 0.0,
}


def _scatter_rays_back(out, slot, ok, n_rays, far):
    """Expand a ray-compacted output dict back to dense ``[n_rays, ...]``.

    Unused budget slots (ok False) and overflow rays land on defaults that
    read as 'ray missed' to every consumer (losses mask by ray_mask /
    valid_pt)."""
    to = jnp.where(ok, slot, n_rays)

    def put(x, default):
        buf = jnp.full((n_rays,) + x.shape[1:], default, x.dtype)
        return buf.at[to].set(x, mode="drop")

    dense = {}
    for k, v in out.items():
        d = _SCATTER_DEFAULTS[k]
        if k == "sdf":
            d = field.SDF_FILLER
        elif k == "depth_vals":
            d = far
        dense[k] = put(v, d)
    return dense


def _render_body(params, scene, cam_loc, ray_dirs, depth_scale, skey,
                 cfg: ModelConfig, *, train: bool, iters: int):
    frozen = params["frozen"]
    tp = params["train"]
    scfg = cfg.ray_sampler
    S = cfg.max_shading_pts
    K = cfg.k
    n_rays = ray_dirs.shape[0]

    beta_param = tp["beta"]
    beta0 = jax.lax.stop_gradient(get_beta(beta_param, cfg.density.beta_min))
    probe_overflow = jnp.asarray(False)
    if cfg.entangled:
        # legacy model samples uniformly only (reference pointneus.py:73-75)
        from spurfies_tpu.model.sampler import uniform_z_vals
        z_all = uniform_z_vals(skey, n_rays, scfg.near, scfg.far,
                               scfg.n_samples, stratified=train)
    else:
        # probe budget: the calibrated per-sample occupancy fraction
        # models ONLY the first, uniform-z probe (that is what the
        # Trainer's worst-view calibration simulated); later importance
        # re-probes (train fast_iters >= 2, or eval iters >= 2) are
        # surface-concentrated and keep the quality-gated legacy 0.25.
        # The per-probe overflow flags surface in the step telemetry
        # (probe_overflow) so a mis-calibrated budget is visible instead
        # of silently rendering occupied probes as empty space.
        if cfg.probe_budget_frac >= 1:
            # dense probes, no occupancy budget at all (reference-exact)
            pf_first = pf_rest = None
        elif train and 0 < cfg.probe_budget_frac < 1:
            pf_first, pf_rest = cfg.probe_budget_frac, 0.25
        else:
            pf_first = pf_rest = 0.25

        def sdf_probe_fn(x, first=False):
            return field.sdf_probe(
                jax.lax.stop_gradient(frozen),
                jax.lax.stop_gradient(tp["feats_geometry"]),
                scene, x, cfg.probe_k or cfg.k, cfg.r, cfg.rbf,
                budget_frac=pf_first if first else pf_rest,
                need_grad=False,
                return_overflow=True,
            )

        z_all, probe_overflow = error_bound_z_vals(
            skey, sdf_probe_fn, cam_loc, ray_dirs, scfg, beta0, iters,
            train,
        )  # [R, Z]
    z_all = jax.lax.stop_gradient(z_all)
    points = cam_loc[:, None, :] + z_all[..., None] * ray_dirs[:, None, :]

    flat_pts = points.reshape(-1, 3)
    # occ_compact is ignored under ray compaction: the ray budget already
    # pruned the same work and the combined graph crashes the XLA:TPU
    # compile helper (measured r3; HTTP 500 from tpu_compile_helper).
    occ_active = (cfg.occ_compact and train
                  and not (0 < cfg.ray_budget_frac < 1))
    if occ_active:
        # train-only: the eval render (chunk 8192 x eval-iter samples)
        # compiles ~62 MB past the 15.75 G HBM budget with this layout and
        # gains nothing there (eval is sampler-bound); eval always takes
        # the reference-exact branch below.
        # fine-occupancy prefilter (one int gather per sample) selects the
        # S columns FIRST; only those run the kNN query (occupancy is a
        # superset of has-neighbor — over-selected columns come back with
        # no valid neighbors and render as empty space)
        from spurfies_tpu.ops.voxel_grid import fine_occupancy
        occ = fine_occupancy(flat_pts, scene.occ_fine, scene.spec)
        sel, sel_col = compact_rays(occ.reshape(n_rays, -1), S)  # [R, S]
        z_sel = jnp.where(sel_col, _take_z(z_all, sel), 0.0)
        q_pts = cam_loc[:, None, :] + z_sel[..., None] * ray_dirs[:, None, :]
        nbr_idx, _ = query_grid(q_pts.reshape(-1, 3), scene.table,
                                scene.spec, k=K)
        nbr_idx = nbr_idx.reshape(n_rays, S, K)
        nbr_idx = jnp.where(sel_col[..., None], nbr_idx, -1)
        nbr_valid = nbr_idx >= 0
        sel_valid = jnp.any(nbr_valid, axis=-1)        # [R, S]
        # Occupancy over-selects columns with no in-radius neighbor; they
        # carry zero density, but the reference's forward deltas are taken
        # over the COMPACTED has-neighbor columns — so each valid column's
        # delta must span to the next VALID column's z, skipping the
        # interleaved empties (reverse cummin), or quadrature shrinks ~3%.
        z_v = jnp.where(sel_valid, z_sel, jnp.inf)
        nxt = jnp.flip(jax.lax.cummin(jnp.flip(z_v, -1), axis=z_v.ndim - 1),
                       -1)
        nxt = jnp.concatenate(
            [nxt[..., 1:], jnp.full_like(nxt[..., :1], jnp.inf)], -1)
        deltas = jnp.where(sel_valid & jnp.isfinite(nxt), nxt - z_sel, 0.0)
        deltas = jnp.maximum(deltas, 0.0)
    else:
        # reference-exact: query all samples, then first-S compaction by
        # has-neighbor
        idx_all, _ = query_grid(flat_pts, scene.table, scene.spec, k=K)
        idx_all = idx_all.reshape(n_rays, -1, K)
        has_any = jnp.any(idx_all >= 0, axis=-1)       # [R, Z]

        sel, sel_valid = compact_rays(has_any, S)      # [R, S]
        z_sel = jnp.where(sel_valid, _take_z(z_all, sel),
                          0.0)                   # filler 0 (ref :220-224)
        nbr_idx = _take_rows(idx_all, sel)             # [R,S,K]
        nbr_valid = (nbr_idx >= 0) & sel_valid[..., None]

        # deltas over the compacted grid (reference filter_points :226-232)
        z_pad = jnp.concatenate([z_sel, jnp.zeros_like(z_sel[..., :1])], -1)
        deltas = z_pad[..., 1:] - z_pad[..., :-1]
        deltas = jnp.where(sel_valid, deltas, 0.0)
        deltas = jnp.maximum(deltas, 0.0)

    shading_pts = cam_loc[:, None, :] + z_sel[..., None] * ray_dirs[:, None, :]
    flat_x = shading_pts.reshape(-1, 3)
    flat_idx = nbr_idx.reshape(-1, K)
    flat_valid = nbr_valid.reshape(-1, K)
    flat_dirs = jnp.broadcast_to(
        ray_dirs[:, None, :], (n_rays, S, 3)
    ).reshape(-1, 3)

    colors = None
    if cfg.entangled:
        sdf_flat, grad_flat, colors_flat = field.entangled_sdf_grad_color(
            tp, tp["feats"], scene.points, flat_idx, flat_valid, flat_x,
            flat_dirs,
        )
        colors = colors_flat.reshape(n_rays, S, 3)
    elif cfg.render_budget_frac > 0:
        # global static-budget compaction of valid shading points (the
        # per-ray max_shading_pts cap already ran; this bounds total MLP
        # work — overflow points render as empty space)
        m = flat_x.shape[0]
        budget = max(int(m * cfg.render_budget_frac) // 128 * 128, 128)
        any_v = sel_valid.reshape(-1)
        order = jnp.sort(
            jnp.where(any_v, jnp.arange(m, dtype=jnp.int32), m)
        )[:budget]
        bsel_ok = order < m
        bsel = jnp.minimum(order, m - 1)
        s_c, g_c = field.sdf_and_grad(
            frozen, tp["feats_geometry"], scene.points, flat_idx[bsel],
            flat_valid[bsel] & bsel_ok[:, None], flat_x[bsel], cfg.rbf,
        )
        scatter_to = jnp.where(bsel_ok, bsel, m)
        sdf_flat = jnp.full((m,), field.SDF_FILLER).at[scatter_to].set(
            jnp.where(bsel_ok, s_c, field.SDF_FILLER), mode="drop"
        )
        grad_flat = jnp.zeros((m, 3)).at[scatter_to].set(
            jnp.where(bsel_ok[:, None], g_c, 0.0), mode="drop"
        )
        # points dropped by the budget must not render
        covered = jnp.zeros((m,), dtype=bool).at[scatter_to].set(
            bsel_ok, mode="drop"
        )
        sel_valid = sel_valid & covered.reshape(n_rays, S)
    elif cfg.pair_budget_frac > 0:
        budget = max(
            int(n_rays * S * K * cfg.pair_budget_frac) // 256 * 256, 256
        )
        sdf_flat, grad_flat = field.sdf_and_grad_pairs(
            frozen, tp["feats_geometry"], scene.points, flat_idx,
            flat_valid, flat_x, cfg.rbf, budget,
        )
    else:
        sdf_flat, grad_flat = field.sdf_and_grad(
            frozen, tp["feats_geometry"], scene.points, flat_idx,
            flat_valid, flat_x, cfg.rbf,
        )
    sdf = sdf_flat.reshape(n_rays, S)
    gradients = grad_flat.reshape(n_rays, S, 3)

    valid_pt = sel_valid                                # [R, S]
    beta = get_beta(beta_param, cfg.density.beta_min)
    density = jnp.where(valid_pt, laplace_density(sdf, beta), 0.0)
    weights = render_weights(deltas, density)           # [R, S]
    acc = jnp.sum(weights, -1, keepdims=True)

    W = cfg.color_top_samples
    if colors is not None:
        colors = jnp.where(valid_pt[..., None], colors, 0.0)
        rgb = jnp.sum(weights[..., None] * colors, axis=1)
    elif 0 < W < S:
        # quadrature subsampling: color only the top-W samples per ray by
        # rendering weight, rescaled to preserve the total weight mass
        # (the reference colors every sample; the dropped tail carries
        # negligible mass once sampling concentrates)
        w_masked = jnp.where(valid_pt, weights, -1.0)
        w_top, top = jax.lax.top_k(w_masked, W)          # [R, W]
        w_top = jnp.maximum(w_top, 0.0)
        t_idx = _take_rows(nbr_idx, top)
        t_valid = _take_rows(nbr_valid, top)
        t_x = _take_rows(shading_pts, top)
        t_dirs = jnp.broadcast_to(ray_dirs[:, None, :], (n_rays, W, 3))
        colors_w = _color_maybe_pairs(
            tp, scene, t_idx.reshape(-1, K), t_valid.reshape(-1, K),
            t_x.reshape(-1, 3), t_dirs.reshape(-1, 3), cfg,
        ).reshape(n_rays, W, 3)
        mass_top = jnp.sum(w_top, -1, keepdims=True)
        rgb = jnp.sum(w_top[..., None] * colors_w, axis=1)
        rgb = rgb * (acc / jnp.maximum(mass_top, 1e-10))
    else:
        colors = _color_maybe_pairs(
            tp, scene, flat_idx, flat_valid, flat_x, flat_dirs, cfg,
        ).reshape(n_rays, S, 3)
        colors = jnp.where(valid_pt[..., None], colors, 0.0)
        rgb = jnp.sum(weights[..., None] * colors, axis=1)
    depth = jnp.sum(weights * z_sel, -1, keepdims=True) / (acc + 1e-8)

    ray_mask = jnp.any(valid_pt, axis=-1)

    # pseudo-SDF points: weight-normalized rendered depth (reference :765-775)
    w_norm = weights / (jnp.sum(weights, -1, keepdims=True) + 1e-10)
    dist_map = jnp.sum(w_norm * z_sel, -1)
    pts_rendered = cam_loc + ray_dirs * dist_map[:, None]

    out = {
        "rgb_values": jnp.where(ray_mask[:, None], rgb, 0.0),
        "depth_values": jnp.where(ray_mask[:, None], depth, 1.0),
        "acc": jnp.where(ray_mask[:, None], acc, 0.0),
        "weights": jnp.where(ray_mask[:, None], weights, 0.0),
        "depth_vals": jnp.where(
            ray_mask[:, None], z_sel * depth_scale, scfg.far
        ),
        "xyz": jnp.where(valid_pt[..., None], shading_pts, 0.0),
        "sdf": jnp.where(valid_pt, sdf, field.SDF_FILLER),
        "z_sel": z_sel,
        "valid_pt": valid_pt,
        "ray_mask": ray_mask,
        "pts_rendered": pts_rendered,
        "grad_theta": gradients,
        "nbr_idx": nbr_idx,
        "nbr_valid": nbr_valid,
        "cam_loc": cam_loc,
        "ray_dirs": ray_dirs,
        "probe_budget_overflow": probe_overflow,   # scalar (telemetry)
    }

    if cfg.white_bkgd:
        out["rgb_values"] = out["rgb_values"] + (1.0 - acc) * jnp.asarray(
            cfg.bg_color
        )

    if not train:
        g = jax.lax.stop_gradient(gradients)
        normals = g / (jnp.linalg.norm(g, axis=-1, keepdims=True) + 1e-12)
        normals = jnp.where(valid_pt[..., None], normals, 0.0)
        out["normal_map"] = jnp.sum(weights[..., None] * normals, axis=1)

    return out


def _color_maybe_pairs(tp, scene, idx, valid, x, dirs, cfg: ModelConfig):
    """Dense or pair-compacted color path (cfg.color_pair_frac)."""
    if cfg.color_pair_frac > 0:
        m, k = idx.shape
        budget = max(int(m * k * cfg.color_pair_frac) // 256 * 256, 256)
        return field.aggregate_color_pairs(
            tp, tp["feats_color"], scene.points, idx, valid, x, dirs,
            cfg.rbf, budget, cfg.pos_multires, cfg.view_multires,
        )
    return field.aggregate_color(
        tp, tp["feats_color"], scene.points, idx, valid, x, dirs,
        cfg.rbf, cfg.pos_multires, cfg.view_multires,
    )


def pseudo_sdf_loss(params, scene, out, cfg: ModelConfig):
    """L1-to-zero of SDF at rendered depth points (reference :765-780).

    Masked mean over rays whose rendered point has neighbors (the reference
    averages over the compacted valid set only).
    """
    # budget_frac=None: the occupancy budget is sized for mostly-EMPTY
    # sampler probes; pseudo points sit at rendered depth (mostly
    # occupied), so a 0.25 budget would silently drop ~3/4 of the loss
    # signal at convergence.  One ray-count probe is cheap dense.
    sdf = field.sdf_probe(
        params["frozen"], params["train"]["feats_geometry"], scene,
        out["pts_rendered"], cfg.k, cfg.r, cfg.rbf, budget_frac=None,
    )
    valid = (sdf < field.SDF_FILLER / 2) & out["ray_mask"]
    abs_sdf = jnp.where(valid, jnp.abs(sdf), 0.0)
    return jnp.sum(abs_sdf) / jnp.maximum(jnp.sum(valid), 1)


def fd_eikonal_loss(params, scene, out, key, cfg: ModelConfig,
                    eps: float = 5e-3, n_sub: int = 0):
    """BEYOND-REFERENCE: finite-difference eikonal at shading points.

    The analytic eikonal term (reference loss.py:47-49) is a NO-OP in this
    architecture: the decoder is frozen and piecewise linear, so
    d(grad_sdf)/d(latents) == 0 almost everywhere — nothing constrains the
    field's metric, and the learned SDF goes flat away from the zero set
    (measured |grad| ~ 0.2 near the cloud), letting the zero crossing
    drift inward.  A central finite difference (s(x+eps*u) - s(x-eps*u))
    / (2 eps) IS differentiable w.r.t. the latents with nonzero gradient,
    restoring unit-slope pressure.  Neighbor indices are reused from the
    center point (eps << query radius).  Gated by loss.fd_eikonal_weight.
    """
    valid = out["valid_pt"].reshape(-1)
    x = out["xyz"].reshape(-1, 3)
    idx = out["nbr_idx"].reshape(-1, cfg.k)
    nbr_valid = out["nbr_valid"].reshape(-1, cfg.k)

    if 0 < n_sub < x.shape[0]:
        # the penalty is a mean over shading points; a random subset gives
        # the same expected pressure at a fraction of the two extra
        # pair-MLP passes (the full-set term costs ~27 ms/step at
        # production shapes — measured r3)
        key, ksub = jax.random.split(key)
        sel = jax.random.randint(ksub, (n_sub,), 0, x.shape[0])
        valid, x = valid[sel], x[sel]
        idx, nbr_valid = idx[sel], nbr_valid[sel]

    u = jax.random.normal(key, x.shape)
    u = u / (jnp.linalg.norm(u, axis=-1, keepdims=True) + 1e-12)

    sp, _ = field.aggregate_sdf(
        params["frozen"], params["train"]["feats_geometry"], scene.points,
        idx, nbr_valid, x + eps * u, cfg.rbf,
    )
    sm, _ = field.aggregate_sdf(
        params["frozen"], params["train"]["feats_geometry"], scene.points,
        idx, nbr_valid, x - eps * u, cfg.rbf,
    )
    fd = (sp - sm) / (2.0 * eps)
    ok = valid & (jnp.abs(sp) < field.SDF_FILLER / 2) & (
        jnp.abs(sm) < field.SDF_FILLER / 2
    )
    pen = jnp.where(ok, (jnp.abs(fd) - 1.0) ** 2, 0.0)
    return jnp.sum(pen) / jnp.maximum(jnp.sum(ok), 1)


def cloud_anchor_loss(params, scene, key, cfg: ModelConfig,
                      n_points: int = 2048):
    """BEYOND-REFERENCE: L1 of the SDF at sampled input-cloud points.

    The neural points are DUSt3R surface samples; anchoring sdf=0 there
    opposes the pseudo-loss depth-skew drift that pushes the zero set
    ~0.02 inside the cloud (NOTES_ROUND2 mesh-bias diagnosis).  Gated by
    loss.cloud_anchor_weight (0 = reference behavior).
    """
    sel = jax.random.randint(key, (n_points,), 0, scene.points.shape[0])
    pts = scene.points[sel]
    sdf = field.sdf_probe(
        params["frozen"], params["train"]["feats_geometry"], scene, pts,
        cfg.k, cfg.r, cfg.rbf, budget_frac=None,
    )
    valid = sdf < field.SDF_FILLER / 2
    return jnp.sum(jnp.where(valid, jnp.abs(sdf), 0.0)) / jnp.maximum(
        jnp.sum(valid), 1
    )


def tv_loss(params, scene):
    """Graph TV on geometry latents (reference utils.tv_regul :221-282).

    Inverse-distance-weighted L1 over the precomputed kNN graph.
    """
    feats = params["train"]["feats_geometry"]
    pts = scene.points
    idx, valid = scene.tv_idx, scene.tv_valid
    npos = pts[idx]                                   # [N, k, 3]
    d = jnp.linalg.norm(npos - pts[:, None, :], axis=-1)
    w = jnp.where(valid, 1.0 / (d + 1e-5), 0.0)
    fdist = jnp.sum(jnp.abs(feats[idx] - feats[:, None, :]), axis=-1)
    num = jnp.sum(w * fdist, axis=-1)
    den = jnp.sum(w, axis=-1)
    tv = num / jnp.maximum(den, 1e-12)
    return jnp.mean(tv)
