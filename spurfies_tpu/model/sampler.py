"""Ray samplers: uniform + VolSDF error-bounded upsampling.

Behavioral spec from reference ``spurfies/model/ray_sampler.py``:
  * UniformSampler (:17-59): linspace near..far, stratified when training.
  * ErrorBoundSampler_pn (:337-588): VolSDF Algorithm 1 — iterative
    error-bound-driven upsampling with per-iteration beta bisection, then a
    final weights-PDF draw, plus near/far + N_samples_extra merged columns.

TPU redesign (SURVEY §7 hard part 3): the reference's data-dependent while
loop with growing tensors becomes a statically-unrolled Python loop (shapes
grow by N_eval per iteration — all static), with per-ray convergence masks
instead of the global ``beta.max() > beta0`` early exit.  Converged rays draw
from the final weights PDF in remaining iterations (the reference would stop
sampling them; extra samples only refine quadrature).  SDF evals go through a
no-grad probe exactly like the reference (ray_sampler.py:402).
"""

import jax
import jax.numpy as jnp

from spurfies_tpu.config import SamplerConfig
from spurfies_tpu.core.density import laplace_density


def uniform_z_vals(key, n_rays: int, near: float, far: float, n: int,
                   stratified: bool):
    """[R, n] z values; stratified jitter within bins when training."""
    t = jnp.linspace(0.0, 1.0, n)
    z = near * (1.0 - t) + far * t
    z = jnp.broadcast_to(z, (n_rays, n))
    if stratified:
        mids = 0.5 * (z[..., 1:] + z[..., :-1])
        upper = jnp.concatenate([mids, z[..., -1:]], -1)
        lower = jnp.concatenate([z[..., :1], mids], -1)
        u = jax.random.uniform(key, z.shape)
        z = lower + (upper - lower) * u
    return z


def sample_pdf(key, bins: jnp.ndarray, pdf: jnp.ndarray, n: int,
               deterministic: bool):
    """Inverse-CDF sampling (reference ray_sampler.py:505-529).

    bins: ``[R, Z]``, MUST be non-decreasing along Z (all callers pass
    sorted z_vals); pdf: ``[R, Z-1]`` (need not be normalized).  The
    masked-reduce bracketing below recovers value[searchsorted index] as a
    max/min over the compare mask, which is exact only while both cdf and
    bins are non-decreasing — unsorted bins would yield silently wrong
    samples (the old take_along_axis version only required valid indices).
    """
    r = bins.shape[0]
    pdf = pdf / jnp.sum(pdf, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)  # [R, Z]

    if deterministic:
        u = jnp.broadcast_to(jnp.linspace(0.0, 1.0, n), (r, n))
    else:
        u = jax.random.uniform(key, (r, n))

    # searchsorted(cdf, u, side="right") == count of cdf values <= u; the
    # bracketing values are then masked REDUCES over the [R, U, Z]
    # compare mask, not gathers.  A vmapped binary search measured 7.9 ms
    # at train shapes and 157 ms at eval shapes on TPU (gather-heavy
    # lowering); an index-recovery variant (comparison count + 4
    # take_along_axis) still cost 2.2 ms of the 33.6 ms train step (trace
    # r3) in the take lowering.  Both cdf and bins are ascending, so
    # value[last z with cdf<=u] == max(masked values) and
    # value[first z with cdf>u] == min over the complement — exact, and
    # the whole thing is one fused VPU sweep.  AXIS ORDER MATTERS: Z must
    # be the reduced LAST axis — the [R, Z, U] middle-axis form
    # materialized its broadcasts and cost up to 346 ms per reduce at
    # eval shapes ([4096, 640, 128], r4 eval trace); this form fuses.
    mask = cdf[:, None, :] <= u[:, :, None]                  # [R, U, Z]
    cdf_b = cdf[:, None, :]
    bins_b = bins[:, None, :]
    ninf = -jnp.inf
    cdf_g0 = jnp.max(jnp.where(mask, cdf_b, ninf), axis=-1)
    bins_g0 = jnp.max(jnp.where(mask, bins_b, ninf), axis=-1)
    cdf_g1 = jnp.min(jnp.where(mask, jnp.inf, cdf_b), axis=-1)
    bins_g1 = jnp.min(jnp.where(mask, jnp.inf, bins_b), axis=-1)
    # cdf[0] == 0 <= u, so the g0 mask is never empty; the complement is
    # empty iff u >= cdf[-1] (deterministic u == 1.0) — reference clamps
    # the index there (above = min(inds, Z-1)), i.e. the last column.
    hi_empty = ~jnp.isfinite(cdf_g1)
    cdf_g1 = jnp.where(hi_empty, cdf[:, -1:], cdf_g1)
    bins_g1 = jnp.where(hi_empty, bins[:, -1:], bins_g1)
    denom = cdf_g1 - cdf_g0
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_g0) / denom
    return bins_g0 + t * (bins_g1 - bins_g0)


def _d_star(z_vals, sdf):
    """Theorem-1 distance bound (reference ray_sampler.py:417-432)."""
    d = sdf
    dists = z_vals[:, 1:] - z_vals[:, :-1]
    a, b, c = dists, jnp.abs(d[:, :-1]), jnp.abs(d[:, 1:])
    first = a ** 2 + b ** 2 <= c ** 2
    second = a ** 2 + c ** 2 <= b ** 2
    s = (a + b + c) / 2.0
    area = jnp.maximum(s * (s - a) * (s - b) * (s - c), 0.0)
    height = 2.0 * jnp.sqrt(area) / jnp.maximum(a, 1e-12)
    d_star = jnp.where(
        first, b, jnp.where(second, c, jnp.where(b + c - a > 0, height, 0.0))
    )
    same_sign = jnp.sign(d[:, 1:]) * jnp.sign(d[:, :-1]) == 1
    return jnp.where(same_sign, d_star, 0.0), dists


def _error_bound(beta, sdf, z_vals, dists, d_star):
    """Max per-ray opacity error bound (reference ray_sampler.py:576-588)."""
    density = laplace_density(sdf, beta)
    shifted = jnp.concatenate(
        [jnp.zeros_like(dists[:, :1]), dists * density[:, :-1]], -1
    )
    integral = jnp.cumsum(shifted, -1)
    err_sec = jnp.exp(-d_star / beta) * (dists ** 2.0) / (4.0 * beta ** 2)
    err_int = jnp.cumsum(err_sec, -1)
    bound = (jnp.clip(jnp.exp(err_int), max=1.0e6) - 1.0) * jnp.exp(
        -integral[:, :-1]
    )
    return jnp.max(bound, -1)


def error_bound_z_vals(key, sdf_fn, cam_loc, ray_dirs, cfg: SamplerConfig,
                       beta0, iters: int, train: bool):
    """Full error-bounded sampling.

    Args:
      sdf_fn: ``([M, 3], first: bool) -> ([M], [] bool)`` no-grad SDF probe
        (filler 1000 empty space) + a scalar probe-budget overflow flag.
        ``first=True`` marks the initial uniform-grid probe — the only one
        whose occupancy matches the Trainer's auto budget calibration;
        later importance re-probes are surface-concentrated and the probe
        must fall back to its quality-gated dense-enough budget.
      cam_loc/ray_dirs: ``[R, 3]``.
      beta0: scalar current density beta (detached by caller).
      iters: sampler iterations (train: fast=1; eval: max_total_iters).

    Returns:
      (z_vals ``[R, n_samples + n_samples_extra + 2]`` sorted,
       probe_overflow ``[]`` bool — OR over every probe round).
    """
    n_rays = cam_loc.shape[0]
    keys = jax.random.split(key, iters + 3)

    def probe(z, first=False):
        pts = cam_loc[:, None, :] + z[..., None] * ray_dirs[:, None, :]
        s, ovf = sdf_fn(pts.reshape(-1, 3), first)
        return jax.lax.stop_gradient(s.reshape(z.shape)), ovf

    z_vals = uniform_z_vals(keys[0], n_rays, cfg.near, cfg.far,
                            cfg.n_samples_eval, stratified=train)
    sdf, probe_overflow = probe(z_vals, first=True)

    dists0 = z_vals[:, 1:] - z_vals[:, :-1]
    bound = (1.0 / (4.0 * jnp.log(jnp.asarray(cfg.eps + 1.0)))) * jnp.sum(
        dists0 ** 2.0, -1
    )
    beta = jnp.sqrt(bound)
    samples = z_vals

    for it in range(iters):
        d_star, dists = _d_star(z_vals, sdf)

        # beta bisection in [beta0, beta] (reference :434-445)
        err0 = _error_bound(beta0, sdf, z_vals, dists, d_star)
        beta = jnp.where(err0 <= cfg.eps, beta0, beta)
        beta_lo = jnp.full_like(beta, beta0)
        beta_hi = beta
        for _ in range(cfg.beta_iters):
            mid = 0.5 * (beta_lo + beta_hi)
            err = _error_bound(mid[:, None], sdf, z_vals, dists, d_star)
            ok = err <= cfg.eps
            beta_hi = jnp.where(ok, mid, beta_hi)
            beta_lo = jnp.where(ok, beta_lo, mid)
        beta = beta_hi

        # rendering weights under current beta (reference :447-464)
        density = laplace_density(sdf, beta[:, None])
        dists_inf = jnp.concatenate(
            [dists, jnp.full_like(dists[:, :1], 1e10)], -1
        )
        free = dists_inf * density
        shifted = jnp.concatenate(
            [jnp.zeros_like(free[:, :1]), free[:, :-1]], -1
        )
        alpha = 1.0 - jnp.exp(-free)
        trans = jnp.exp(-jnp.cumsum(shifted, -1))
        weights = alpha * trans

        converged = beta <= beta0
        last = it == iters - 1

        w_pdf = weights[:, :-1] + 1e-5

        if not last:
            err_sec = (
                jnp.exp(-d_star / beta[:, None])
                * (dists ** 2.0) / (4.0 * beta[:, None] ** 2)
            )
            err_int = jnp.cumsum(err_sec, -1)
            bound_op = (
                jnp.clip(jnp.exp(err_int), max=1.0e6) - 1.0
            ) * trans[:, :-1]
            e_pdf = bound_op + cfg.add_tiny
            pdf = jnp.where(converged[:, None], w_pdf, e_pdf)
            samples = sample_pdf(keys[1 + it], z_vals, pdf,
                                 cfg.n_samples_eval, deterministic=True)
            new_sdf, ovf_it = probe(samples)
            probe_overflow = probe_overflow | ovf_it
            z_cat = jnp.concatenate([z_vals, samples], -1)
            s_cat = jnp.concatenate([sdf, new_sdf], -1)
            order = jnp.argsort(z_cat, -1)
            z_vals = jnp.take_along_axis(z_cat, order, -1)
            sdf = jnp.take_along_axis(s_cat, order, -1)
        else:
            samples = sample_pdf(keys[1 + it], z_vals, w_pdf, cfg.n_samples,
                                 deterministic=not train)

    # near/far + extra merged columns (reference :537-559)
    near_col = jnp.full((n_rays, 1), cfg.near)
    far_col = jnp.full((n_rays, 1), cfg.far)
    z_cols = z_vals.shape[-1]
    if cfg.n_samples_extra > 0:
        if train:
            cols = jax.random.permutation(keys[-2], z_cols)[
                : cfg.n_samples_extra
            ]
        else:
            cols = jnp.linspace(0, z_cols - 1, cfg.n_samples_extra).astype(
                jnp.int32
            )
        z_extra = jnp.concatenate(
            [near_col, far_col, z_vals[:, cols]], -1
        )
    else:
        z_extra = jnp.concatenate([near_col, far_col], -1)

    z_all = jnp.sort(jnp.concatenate([samples, z_extra], -1), -1)
    return z_all, probe_overflow
