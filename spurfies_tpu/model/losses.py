"""VolSDF loss stack.

Behavioral spec from reference ``spurfies/model/loss.py:18-101`` +
``config/ours.yaml:15-20``: total = 1.0*rgb(L1) + 0.001*eikonal + 0.01*TV +
0.5*local + 0.5*pseudo + 1.0*mask-BCE(sum-weights vs mask).
"""

import jax.numpy as jnp

from spurfies_tpu.config import LossConfig


def rgb_loss(pred, gt, kind: str = "l1"):
    if kind == "l1":
        return jnp.mean(jnp.abs(pred - gt))
    return jnp.mean((pred - gt) ** 2)


def eikonal_loss(grad_theta, valid):
    """((|grad| - 1)^2) masked mean (reference loss.py:47-49 computes over
    the compacted valid shading points).

    Invalid rows carry exactly-zero gradients; substituting a unit vector
    before the norm keeps the backward pass NaN-free (d|x|/dx at 0 is NaN
    and even masked-out cotangents propagate it).
    """
    safe = jnp.where(valid[..., None], grad_theta,
                     jnp.asarray([1.0, 0.0, 0.0]))
    norms = jnp.linalg.norm(safe, axis=-1)
    per = (norms - 1.0) ** 2
    per = jnp.where(valid, per, 0.0)
    return jnp.sum(per) / jnp.maximum(jnp.sum(valid), 1)


def mask_bce_loss(weights_sum, mask_gt):
    """BCE of accumulated weights vs foreground mask, clipped
    (reference loss.py:69-75)."""
    p = jnp.clip(weights_sum, 1e-3, 1.0 - 1e-3)
    return -jnp.mean(
        mask_gt * jnp.log(p) + (1.0 - mask_gt) * jnp.log(1.0 - p)
    )


def fd_eikonal_weight_at(cfg: LossConfig, step):
    """Effective fd-eikonal weight at a (traced) step.

    With annealing enabled, decays geometrically from
    ``fd_eikonal_anneal_init`` to ``fd_eikonal_weight`` over
    ``fd_eikonal_anneal_steps``, then stays constant."""
    w = cfg.fd_eikonal_weight
    if (cfg.fd_eikonal_anneal_init <= 0 or cfg.fd_eikonal_anneal_steps <= 0
            or w <= 0 or step is None):
        return w
    frac = jnp.clip(
        1.0 - step.astype(jnp.float32) / cfg.fd_eikonal_anneal_steps,
        0.0, 1.0,
    )
    return w * (cfg.fd_eikonal_anneal_init / w) ** frac


def total_loss(outputs, ground_truth, cfg: LossConfig, step=None):
    """Weighted sum; returns (scalar, dict of parts)."""
    gt_rgb = ground_truth["rgb"].reshape(-1, 3)
    mask = ground_truth["mask"]
    gt_mask = mask.reshape(-1, mask.shape[-1])[:, :1]

    parts = {}
    parts["rgb_loss"] = rgb_loss(outputs["rgb_values"], gt_rgb, cfg.rgb_loss)
    parts["eikonal_loss"] = eikonal_loss(
        outputs["grad_theta"], outputs["valid_pt"]
    )
    parts["tv_loss"] = outputs.get("tv_loss", jnp.asarray(0.0))
    parts["mask_loss"] = mask_bce_loss(
        jnp.sum(outputs["weights"], -1, keepdims=True), gt_mask
    )
    parts["local_loss"] = outputs.get("local_loss", jnp.asarray(0.0))
    parts["pseudo_loss"] = outputs.get("pseudo_pts_loss", jnp.asarray(0.0))
    parts["cloud_anchor_loss"] = outputs.get("cloud_anchor_loss",
                                             jnp.asarray(0.0))
    parts["fd_eikonal_loss"] = outputs.get("fd_eikonal_loss",
                                           jnp.asarray(0.0))

    loss = (
        cfg.rgb_weight * parts["rgb_loss"]
        + cfg.eikonal_weight * parts["eikonal_loss"]
        + cfg.tv_weight * parts["tv_loss"]
        + cfg.local_weight * parts["local_loss"]
        + cfg.pseudo_weight * parts["pseudo_loss"]
        + cfg.mask_weight * parts["mask_loss"]
        + cfg.cloud_anchor_weight * parts["cloud_anchor_loss"]
        + fd_eikonal_weight_at(cfg, step) * parts["fd_eikonal_loss"]
    )
    parts["loss"] = loss
    return loss, parts
