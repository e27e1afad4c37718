"""Optimizer assembly: two-group Adam + cosine schedule + NaN-guard + clip.

Behavioral spec from reference ``spurfies/train.py:175-189,548-564,360-361``:
  * Adam with a (nominally 1e-2) latent group and 5e-4 for the rest — note
    the reference's latent group list is actually empty (train.py:150-157),
    so everything trains at the base lr; we support both via config.
  * CosineAnnealingLR(T_max=100k, eta_min=3e-4).
  * global-norm grad clip at 1.0; skip the step entirely on any nan/inf grad
    (on_after_backward) -> optax.apply_if_finite.
"""

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

    tx = optax.chain(
        optax.clip_by_global_norm(train_cfg.grad_clip),
        optax.multi_transform(
            {
                "base": optax.adam(base),
                "latent": optax.adam(latent),
            },
            label_fn,
        ),
    )
    # skip whole update on nan/inf grads (reference on_after_backward)
    return optax.apply_if_finite(tx, max_consecutive_errors=100000)
