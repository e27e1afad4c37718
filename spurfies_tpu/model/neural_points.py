"""Per-scene neural-point state: positions, latent inits, precomputed tables.

Behavioral spec from reference ``spurfies/model/pointneus_disent.py:116-205``:
  * positions: PLY -> voxel_downsample(vox_res=300) -> fixed buffer.
  * color latents ``[N, 64]``: U(-1e-4, 1e-4); first 3 dims overwritten with
    point RGB mapped to [-1, 1] when initialize_colors.
  * geometry latents ``[N, 32]``: N(0, 0.01) clipped to max-norm 1.

TPU redesign: the point set never changes during optimization, so the voxel
table AND the TV-regularizer neighbor graph are built ONCE here instead of
every forward pass (the reference re-runs set_pointset + a kNN query per step
— pointneus_disent.py:627-635, utils.tv_regul).
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from spurfies_tpu.config import ModelConfig
from spurfies_tpu.ops.downsample import voxel_downsample
from spurfies_tpu.ops.voxel_grid import (
    QueryTable,
    VoxelGridSpec,
    build_occupancy_bitmap,
    build_query_table,
    query_grid,
)


@jax.tree_util.register_pytree_node_class
@dataclass
class SceneState:
    """Non-trainable per-scene arrays (a pytree; spec is static aux data)."""
    points: jnp.ndarray          # [N, 3]
    table: QueryTable            # precomputed per-cell candidate lists
    tv_idx: jnp.ndarray          # [N, k] TV-graph neighbor indices
    tv_valid: jnp.ndarray        # [N, k] bool
    occ_fine: jnp.ndarray = None  # [rows,128] int8 fine occupancy bitmap
    spec: VoxelGridSpec = None

    def tree_flatten(self):
        return (self.points, self.table, self.tv_idx, self.tv_valid,
                self.occ_fine), self.spec

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, spec=aux)


def grid_spec_from_config(cfg: ModelConfig) -> VoxelGridSpec:
    return VoxelGridSpec(
        voxel_size=cfg.voxel_size,
        voxel_scale=cfg.voxel_scale,
        lo=tuple(cfg.scene_lo),
        hi=tuple(cfg.scene_hi),
        max_pts_per_cell=cfg.max_pts_per_voxel,
    )


def shrink_query_table(table: QueryTable, spec: VoxelGridSpec):
    """Scene-adaptive candidate width: slice the table to the smallest
    sufficient qcap.

    The per-query gather ``qt.pos[cid] -> [M, 3, qcap]`` is the query
    path's dominant HBM cost and scales linearly with qcap; candidate
    lists are packed front-first, so slicing to the scene's true maximum
    occupancy is EXACT (DUSt3R-statistics clouds max out near 42 of the
    128 default — half the gather traffic for free).  One-time host
    readback per scene.
    """
    import dataclasses

    occ = int(jnp.max(jnp.sum(table.idx >= 0, axis=-1)))
    qcap = next((c for c in (32, 64, 96, 128) if occ <= c), spec.qcap)
    if qcap >= spec.qcap:
        return table, spec
    table = QueryTable(idx=table.idx[:, :qcap], pos=table.pos[:, :, :qcap],
                       r=table.r, n_points=table.n_points)
    return table, dataclasses.replace(spec, qcap=qcap)


def build_scene(key, raw_points: np.ndarray, cfg: ModelConfig,
                raw_colors: np.ndarray | None = None):
    """Voxel-downsample the cloud, init latents, precompute lookup tables.

    Args:
      key: PRNG key for latent init.
      raw_points: ``[M, 3]`` input cloud (e.g. DUSt3R output).
      raw_colors: optional ``[M, 3]`` uint8-range colors.

    Returns:
      (scene: SceneState, latents: dict with 'feats_color' [N,64] and
       'feats_geometry' [N,32] — goes into params['train']).
    """
    pts, cols, _ = voxel_downsample(np.asarray(raw_points), cfg.vox_res,
                                    raw_colors)
    n = pts.shape[0]
    spec = VoxelGridSpec(
        voxel_size=cfg.voxel_size,
        voxel_scale=cfg.voxel_scale,
        lo=tuple(cfg.scene_lo),
        hi=tuple(cfg.scene_hi),
        max_pts_per_cell=cfg.max_pts_per_voxel,
    )
    points = jnp.asarray(pts, dtype=jnp.float32)
    table = build_query_table(points, spec, r=cfg.r)
    table, spec = shrink_query_table(table, spec)

    # TV graph: kNN of each neural point among neural points, self-edges
    # removed when other neighbors exist (reference utils.tv_regul :221-258).
    tv_idx, tv_d2 = query_grid(points, table, spec, k=cfg.k)
    own = jnp.arange(n, dtype=jnp.int32)[:, None]
    is_self = tv_idx == own
    valid = tv_idx >= 0
    others = jnp.sum(valid & ~is_self, axis=-1, keepdims=True) > 0
    tv_valid = valid & ~(is_self & others)
    # lone points keep only the self edge -> zero TV contribution via
    # |f_i - f_i| = 0 (matches reference identity-padding behavior :244-253)
    tv_idx = jnp.where(tv_valid, tv_idx, 0)

    occ_fine = build_occupancy_bitmap(points, spec, r=cfg.r)
    scene = SceneState(points=points, table=table, tv_idx=tv_idx,
                       tv_valid=tv_valid, occ_fine=occ_fine, spec=spec)

    kc, kg = jax.random.split(key)
    fdim = cfg.feature_vector_size
    feats_color = jax.random.uniform(kc, (n, fdim), jnp.float32, -1e-4, 1e-4)
    if cfg.initialize_colors and cols is not None:
        rgb = jnp.asarray(cols[:, :3], dtype=jnp.float32) * 2.0 / 255.0 - 1.0
        feats_color = feats_color.at[:, :3].set(rgb)

    if cfg.entangled:
        # legacy single latent (reference pointneus.py:95-111)
        return scene, {"feats": feats_color}

    feats_geometry = 0.01 * jax.random.normal(kg, (n, fdim // 2), jnp.float32)
    norms = jnp.linalg.norm(feats_geometry, axis=-1, keepdims=True)
    desired = jnp.minimum(norms, 1.0)
    feats_geometry = feats_geometry * desired / (norms + 1e-7)

    latents = {"feats_color": feats_color, "feats_geometry": feats_geometry}
    return scene, latents
