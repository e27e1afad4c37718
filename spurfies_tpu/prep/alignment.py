"""Global point-cloud alignment (the DUSt3R global_aligner stage) in JAX.

Behavioral spec from reference ``dust3r_inference.py:306-320`` /
``dust3r_inference_own.py:229-235``: pairwise DUSt3R pointmaps are fused by
optimizing, for 300 Adam iterations at lr 0.01 with cosine decay, per-edge
similarity transforms and per-view world geometry so all pairwise
predictions agree (confidence-weighted).  Benchmark mode presets the camera
poses (scaled so the mean camera-center norm is 0.225, :311-316); own-data
mode optimizes poses freely.

This is the optimizer component only — it consumes pairwise pointmaps from
any two-view stereo model (the DUSt3R ViT itself runs from its released
torch checkpoint; inference driver is gated on that artifact).

TPU-native formulation: all edges are optimized simultaneously as stacked
tensors under one jit; rotations are parameterized as quaternions.
"""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclasses.dataclass(frozen=True)
class AlignConfig:
    iters: int = 300
    lr: float = 0.01
    min_conf: float = 3.0


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] (w, x, y, z) -> [..., 3, 3]."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w),
                   2 * (x * z + y * w)], -1),
        jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z),
                   2 * (y * z - x * w)], -1),
        jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w),
                   1 - 2 * (x * x + y * y)], -1),
    ], -2)


def align_pointmaps(edges, pointmaps_i, pointmaps_j, conf_i, conf_j,
                    n_views: int, cfg: AlignConfig = AlignConfig(),
                    preset_poses=None):
    """Fuse pairwise pointmaps into per-view world pointmaps.

    Args:
      edges: ``[E, 2]`` int (i, j) view-index pairs.
      pointmaps_i/j: ``[E, P, 3]`` — edge e's prediction of view i's and
        view j's geometry, both in view i's camera frame (DUSt3R convention).
      conf_i/j: ``[E, P]`` confidences.
      n_views: number of views.
      preset_poses: optional ``[V, 4, 4]`` c2w fixing view poses (benchmark
        mode); otherwise poses are optimized.

    Returns:
      dict with world ``points [V, P, 3]``, ``poses [V, 4, 4]``,
      per-edge scales, final loss.
    """
    edges = jnp.asarray(edges)
    xi = jnp.asarray(pointmaps_i)
    xj = jnp.asarray(pointmaps_j)
    wi = jnp.asarray(conf_i)
    wj = jnp.asarray(conf_j)
    E = edges.shape[0]

    # confidence weights: log(conf) clipped at 0 like DUSt3R
    wi = jnp.maximum(jnp.log(jnp.maximum(wi, 1e-6)), 0.0)
    wj = jnp.maximum(jnp.log(jnp.maximum(wj, 1e-6)), 0.0)

    params = {
        "edge_logscale": jnp.zeros((E,)),
        "edge_quat": jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (E, 1)),
        "edge_trans": jnp.zeros((E, 3)),
        # per-view world geometry initialized from the first incoming edge
        "world": _init_world(edges, xi, xj, n_views),
    }
    fixed_pose = preset_poses is not None
    if fixed_pose:
        poses = jnp.asarray(preset_poses)
    else:
        params["view_quat"] = jnp.tile(jnp.asarray([1.0, 0, 0, 0]),
                                       (n_views, 1))
        params["view_trans"] = jnp.zeros((n_views, 3))

    def edge_to_world(p, x, e):
        s = jnp.exp(p["edge_logscale"][e])[:, None, None]
        R = quat_to_rot(p["edge_quat"][e])
        t = p["edge_trans"][e][:, None, :]
        return s * jnp.einsum("eij,epj->epi", R, x) + t

    def loss_fn(p):
        wi_pts = edge_to_world(p, xi, jnp.arange(E))
        wj_pts = edge_to_world(p, xj, jnp.arange(E))
        tgt_i = p["world"][edges[:, 0]]
        tgt_j = p["world"][edges[:, 1]]

        def dist(a, b):  # eps-regularized: exact-zero residuals (the world
            # init copies an edge) would NaN the norm backward
            return jnp.sqrt(jnp.sum((a - b) ** 2, -1) + 1e-12)

        li = jnp.sum(wi * dist(wi_pts, tgt_i))
        lj = jnp.sum(wj * dist(wj_pts, tgt_j))
        denom = jnp.sum(wi) + jnp.sum(wj) + 1e-9
        return (li + lj) / denom

    sched = optax.cosine_decay_schedule(cfg.lr, cfg.iters, 1e-3)
    tx = optax.adam(sched)
    opt_state = tx.init(params)

    @jax.jit
    def step(p, s):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    loss = jnp.inf
    for _ in range(cfg.iters):
        params, opt_state, loss = step(params, opt_state)

    out = {
        "points": np.asarray(params["world"]),
        "edge_scales": np.asarray(jnp.exp(params["edge_logscale"])),
        "loss": float(loss),
    }
    if fixed_pose:
        out["poses"] = np.asarray(poses)
    else:
        R = quat_to_rot(params["view_quat"])
        poses = jnp.tile(jnp.eye(4), (n_views, 1, 1))
        poses = poses.at[:, :3, :3].set(R)
        poses = poses.at[:, :3, 3].set(params["view_trans"])
        out["poses"] = np.asarray(poses)
    return out


def _init_world(edges, xi, xj, n_views):
    """Initialize per-view world points from the first edge touching each
    view (identity transform)."""
    P = xi.shape[1]
    world = jnp.zeros((n_views, P, 3))
    filled = np.zeros(n_views, dtype=bool)
    e_np = np.asarray(edges)
    for e in range(len(e_np)):
        i, j = int(e_np[e, 0]), int(e_np[e, 1])
        if not filled[i]:
            world = world.at[i].set(xi[e])
            filled[i] = True
        if not filled[j]:
            world = world.at[j].set(xj[e])
            filled[j] = True
    return world


def scale_preset_poses(poses, target_norm: float = 0.225):
    """Scale camera centers so their mean norm is ``target_norm``
    (reference dust3r_inference.py:311-316)."""
    poses = np.asarray(poses).copy()
    centers = poses[:, :3, 3]
    mean = float(np.linalg.norm(centers, axis=-1).mean())
    poses[:, :3, 3] = centers * (target_norm / max(mean, 1e-9))
    return poses, target_norm / max(mean, 1e-9)
