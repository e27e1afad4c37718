"""Optimizer assembly: two-group Adam + cosine schedule + NaN-guard + clip.

Behavioral spec from reference ``spurfies/train.py:175-189,548-564,360-361``:
  * Adam with a (nominally 1e-2) latent group and 5e-4 for the rest — note
    the reference's latent group list is actually empty (train.py:150-157),
    so everything trains at the base lr; we support both via config.
  * CosineAnnealingLR(T_max=100k, eta_min=3e-4).
  * global-norm grad clip at 1.0; skip the step entirely on any nan/inf grad
    (on_after_backward) -> :func:`finite_guarded_clip` (one fused global
    reduction serving both, replacing clip_by_global_norm +
    apply_if_finite whose per-leaf isfinite reduce trees measured
    1.5 ms/step in the r4 trace).
"""

from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax


def cosine_lr(base_lr: float, t_max: int, eta_min: float):
    """torch CosineAnnealingLR: eta_min + (lr-eta_min)*(1+cos(pi t/T))/2."""
    def schedule(step):
        t = jnp.minimum(step, t_max)
        return eta_min + (base_lr - eta_min) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * t / t_max)
        )
    return schedule


class FiniteGuardState(NamedTuple):
    notfinite_count: chex.Array      # consecutive skipped steps (telemetry)
    inner_state: optax.OptState


def finite_guarded_clip(inner: optax.GradientTransformation,
                        clip: float) -> optax.GradientTransformation:
    """Global-norm clip + skip-step-on-nonfinite in ONE reduction.

    The global L2 norm computed for clipping is NaN (resp. inf) exactly
    when any gradient element is — IEEE propagation — so the separate
    all-leaves isfinite reduce tree of ``optax.apply_if_finite`` is
    redundant work on the hot path.  Semantics match the previous
    ``chain(clip_by_global_norm, apply_if_finite)``: on a non-finite
    gradient the emitted update is zero and the inner optimizer state
    (Adam moments, schedule counts) is left untouched, like the
    reference's on_after_backward skip (train.py:548-564).
    """

    def init(params):
        return FiniteGuardState(
            notfinite_count=jnp.zeros([], jnp.int32),
            inner_state=inner.init(params),
        )

    def update(updates, state, params=None):
        norm = optax.global_norm(updates)
        finite = jnp.isfinite(norm)
        # optax.clip_by_global_norm scale; 0 when skipping (any inf/NaN
        # row becomes NaN after the multiply — discarded by the selects)
        scale = jnp.where(
            finite,
            jnp.minimum(1.0, clip / jnp.maximum(norm, 1e-12)),
            0.0,
        )
        scaled = jax.tree_util.tree_map(lambda g: g * scale, updates)
        new_updates, new_inner = inner.update(scaled, state.inner_state,
                                              params)
        out_updates = jax.tree_util.tree_map(
            lambda u: jnp.where(finite, u, jnp.zeros_like(u)), new_updates
        )
        keep = lambda new, old: jnp.where(finite, new, old)  # noqa: E731
        out_inner = jax.tree_util.tree_map(keep, new_inner,
                                           state.inner_state)
        count = jnp.where(finite, 0, state.notfinite_count + 1)
        return out_updates, FiniteGuardState(count, out_inner)

    return optax.GradientTransformation(init, update)


def build_optimizer(train_cfg,
                    latent_keys=("feats_color", "feats_geometry", "feats")):
    """Optax chain replicating the reference optimization dynamics."""
    base = cosine_lr(train_cfg.learning_rate, train_cfg.cosine_t_max,
                     train_cfg.cosine_eta_min)
    scale = train_cfg.latent_learning_rate / train_cfg.learning_rate
    latent = cosine_lr(train_cfg.latent_learning_rate,
                       train_cfg.cosine_t_max,
                       train_cfg.cosine_eta_min * scale)

    def label_fn(params):
        return {
            k: ("latent" if k in latent_keys else "base")
            for k in params.keys()
        }

    tx = optax.multi_transform(
        {
            "base": optax.adam(base),
            "latent": optax.adam(latent),
        },
        label_fn,
    )
    # clip + skip-on-nan/inf (reference on_after_backward) in one pass
    return finite_guarded_clip(tx, train_cfg.grad_clip)
