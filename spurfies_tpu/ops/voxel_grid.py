"""Static-shape voxel-hash kNN: the TPU-native replacement for torch_knnquery.

The reference's only native component is the CUDA ``torch_knnquery.VoxelGrid``
(SURVEY §2.1.1; call sites ``spurfies/model/pointneus_disent.py:46-62,627-660``
and wrapper ``spurfies/model/utils.py:90-138``).  Its semantics:

  * ctor ``VoxelGrid(voxel_size, voxel_scale, kernel_size, max_pts_per_voxel,
    max_occ_voxels, ranges)`` — effective grid-cell edge is
    ``voxel_size * voxel_scale`` (0.025 * 3 = 0.075 for all shipped configs).
  * ``query(raypos, k, r, max_shading_pts)`` finds up to ``k`` neighbor points
    within radius ``r * voxel_size`` of each ray sample, searching the
    ``kernel_size`` (3x3x3) cell neighborhood, and compacts each ray to its
    first ``max_shading_pts`` samples that have >= 1 neighbor.

TPU redesign (NOT a translation) — three load-bearing decisions:

  1. **Precomputed neighborhood lists.**  Neural points NEVER move during
     optimization (the reference still re-runs ``set_pointset`` every forward,
     pointneus_disent.py:627-635).  We build, once per scene, a per-cell
     candidate list = all points within ``radius`` of the cell's box (exact
     point-to-box pruning), capped at ``qcap``.  A query is then one row
     gather + a distance top-k over <= qcap candidates — no 27-cell walk in
     the hot loop.

  2. **Lane-aligned layout.**  Candidate positions are stored ``[C, 3, qcap]``
     (qcap a multiple of 128) so the per-query distance computation lands on
     aligned (sublane, lane) tiles; an AoS ``[.., qcap, 3]`` layout pads 3 ->
     128 lanes and moves 40x the bytes.

  3. **Dense masks, not ragged compaction** — ``-1`` sentinels + boolean
     masks; per-ray ``max_shading_pts`` compaction is a separate pure op
     (:func:`compact_rays`) built on a mask-sort.

We return the *k nearest* within the radius (the CUDA kernel returns an
arbitrary k within radius — SURVEY §7: "exact neighbor sets need not match;
radius/k semantics must").
"""

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class VoxelGridSpec:
    """Static grid geometry (hashable; safe as a jit static arg).

    Mirrors the reference ctor (pointneus_disent.py:46-62):
    voxel_size * voxel_scale = cell edge; ranges = scene bounds.
    """
    voxel_size: float = 0.025
    voxel_scale: float = 3.0
    lo: tuple = (-1.0, -1.0, -1.0)
    hi: tuple = (1.0, 1.0, 1.0)
    max_pts_per_cell: int = 26
    kernel: int = 3        # cell search window (3x3x3)
    qcap: int = 128        # per-cell neighborhood candidate cap (lane-sized)

    @property
    def cell_size(self) -> float:
        return self.voxel_size * self.voxel_scale

    @property
    def dims(self) -> tuple:
        return tuple(
            int(np.ceil((h - l) / self.cell_size))
            for l, h in zip(self.lo, self.hi)
        )

    @property
    def num_cells(self) -> int:
        dx, dy, dz = self.dims
        return dx * dy * dz

    def radius(self, r: float) -> float:
        """Query radius in world units: r is in voxel_size multiples."""
        return r * self.voxel_size


@jax.tree_util.register_pytree_node_class
@dataclass
class QueryTable:
    """Per-cell candidate lists: idx ``[C, qcap]`` (-1 empty), pos
    ``[C, 3, qcap]`` (inf where empty), built for a fixed query radius.
    ``n_points`` (static) gates the packed-key select kernel (ids must
    fit 15 bits)."""
    idx: jnp.ndarray
    pos: jnp.ndarray
    r: float = 2.0
    n_points: int = 0

    def tree_flatten(self):
        return (self.idx, self.pos), (self.r, self.n_points)

    @classmethod
    def tree_unflatten(cls, aux, children):
        if not isinstance(aux, tuple):      # pre-n_points checkpoints
            aux = (aux, 0)
        return cls(children[0], children[1], *aux)


def _cell_ids(points: jnp.ndarray, spec: VoxelGridSpec) -> jnp.ndarray:
    """Linear cell id per point; out-of-range -> num_cells (sentinel)."""
    lo = jnp.asarray(spec.lo, dtype=points.dtype)
    dims = jnp.asarray(spec.dims, dtype=jnp.int32)
    ijk = jnp.floor((points - lo) / spec.cell_size).astype(jnp.int32)
    in_range = jnp.all((ijk >= 0) & (ijk < dims), axis=-1)
    ijk = jnp.clip(ijk, 0, dims - 1)
    lin = (ijk[..., 0] * dims[1] + ijk[..., 1]) * dims[2] + ijk[..., 2]
    return jnp.where(in_range, lin, spec.num_cells)


@partial(jax.jit, static_argnames=("spec",))
def build_grid(points: jnp.ndarray, spec: VoxelGridSpec) -> jnp.ndarray:
    """Build the per-cell point table (cap = max_pts_per_cell).

    Returns ``[num_cells, cap]`` int32 point indices, ``-1`` empty.  Points
    beyond ``cap`` per cell are dropped (CUDA max_pts_per_voxel semantics).
    """
    n = points.shape[0]
    cap = spec.max_pts_per_cell
    cid = _cell_ids(points, spec)  # [N]

    # Within-cell slot via sort: for sorted cell ids, the slot of element j
    # is j - first_index_of(cid_sorted[j]).
    order = jnp.argsort(cid)
    cid_sorted = cid[order]
    first = jnp.searchsorted(cid_sorted, cid_sorted, side="left")
    slot = jnp.arange(n, dtype=jnp.int32) - first.astype(jnp.int32)

    valid = (cid_sorted < spec.num_cells) & (slot < cap)
    flat_idx = jnp.where(valid, cid_sorted * cap + slot, spec.num_cells * cap)

    table = jnp.full((spec.num_cells * cap,), -1, dtype=jnp.int32)
    table = table.at[flat_idx].set(order.astype(jnp.int32), mode="drop")
    return table.reshape(spec.num_cells, cap)


def _kernel_offsets(spec: VoxelGridSpec, radius: float) -> np.ndarray:
    # Window half-width: at least the configured kernel, widened if the query
    # radius exceeds the cell edge (the CUDA kernel would silently miss those
    # neighbors; we widen instead).
    half = max(spec.kernel // 2, int(np.ceil(radius / spec.cell_size)))
    rng = np.arange(-half, half + 1)
    return np.stack(np.meshgrid(rng, rng, rng, indexing="ij"),
                    axis=-1).reshape(-1, 3).astype(np.int32)


@partial(jax.jit, static_argnames=("spec", "r"))
def build_query_table(points: jnp.ndarray, spec: VoxelGridSpec,
                      r: float = 2.0) -> QueryTable:
    """Precompute per-cell candidate lists for radius ``r * voxel_size``.

    For each cell: gather its kernel-window neighbor cells' points, keep
    those whose exact distance to the cell BOX is <= radius (so no query in
    the cell can have a neighbor outside the list), first ``qcap`` kept.
    One-time cost per scene; replaces the per-forward ``set_pointset``.
    """
    radius = spec.radius(r)
    offsets = jnp.asarray(_kernel_offsets(spec, radius))     # [W, 3]
    dims = jnp.asarray(spec.dims, dtype=jnp.int32)
    lo = jnp.asarray(spec.lo, dtype=points.dtype)
    cap = spec.max_pts_per_cell
    C = spec.num_cells
    qcap = spec.qcap

    table = build_grid(points, spec)                          # [C, cap]

    # cell ijk for every cell id
    cell_lin = jnp.arange(C, dtype=jnp.int32)
    iz = cell_lin % dims[2]
    iy = (cell_lin // dims[2]) % dims[1]
    ix = cell_lin // (dims[2] * dims[1])
    ijk = jnp.stack([ix, iy, iz], -1)                         # [C, 3]

    nb = ijk[:, None, :] + offsets[None]                      # [C, W, 3]
    nb_in = jnp.all((nb >= 0) & (nb < dims), axis=-1)
    nbc = jnp.clip(nb, 0, dims - 1)
    nb_lin = (nbc[..., 0] * dims[1] + nbc[..., 1]) * dims[2] + nbc[..., 2]

    cand = table[jnp.where(nb_in, nb_lin, 0)].reshape(C, -1)  # [C, W*cap]
    cand = jnp.where(jnp.repeat(nb_in, cap, axis=-1), cand, -1)

    # exact point-to-cell-box distance, per coordinate (SoA to stay aligned)
    box_lo = lo + ijk.astype(points.dtype) * spec.cell_size   # [C, 3]
    box_hi = box_lo + spec.cell_size
    safe = jnp.maximum(cand, 0)
    d2 = jnp.zeros(cand.shape, dtype=points.dtype)
    for d in range(3):
        pc = points[:, d][safe]                               # [C, W*cap]
        excess = jnp.maximum(box_lo[:, d:d + 1] - pc, 0.0) + jnp.maximum(
            pc - box_hi[:, d:d + 1], 0.0
        )
        d2 = d2 + excess * excess
    keep = (cand >= 0) & (d2 <= radius * radius)

    # first qcap kept per cell (mask-sort)
    width = cand.shape[-1]
    pos_key = jnp.where(
        keep,
        jnp.broadcast_to(jnp.arange(width, dtype=jnp.int32), cand.shape),
        width,
    )
    order = jnp.argsort(pos_key, axis=-1)[:, :qcap]
    qidx = jnp.take_along_axis(cand, order, axis=-1)
    qkeep = jnp.take_along_axis(keep, order, axis=-1)
    qidx = jnp.where(qkeep, qidx, -1)                         # [C, qcap]

    safe_q = jnp.maximum(qidx, 0)
    qpos = jnp.stack(
        [
            jnp.where(qkeep, points[:, d][safe_q], jnp.inf)
            for d in range(3)
        ],
        axis=1,
    )                                                          # [C, 3, qcap]
    return QueryTable(idx=qidx, pos=qpos, r=r, n_points=points.shape[0])


def fine_spec(spec: VoxelGridSpec) -> VoxelGridSpec:
    """The occupancy-bitmap grid: same bounds, cell edge = voxel_size
    (the COARSE query grid's cell is voxel_size * voxel_scale = 3x)."""
    import dataclasses
    return dataclasses.replace(spec, voxel_scale=1.0)


@partial(jax.jit, static_argnames=("spec", "r"))
def build_occupancy_bitmap(points: jnp.ndarray, spec: VoxelGridSpec,
                           r: float = 2.0) -> jnp.ndarray:
    """``[rows, 128]`` int8 (cell ``c`` -> ``[c >> 7, c & 127]``, zero-padded
    past ``num_cells``): fine cell has a point within ``r * voxel_size`` of
    its BOX — the exact cell-granular superset of "a query in this cell can
    have a neighbor".

    The coarse query-table test (candidate list of the 0.075-edge cell
    non-empty) over-selects by the cell diagonal: a sample can be marked
    occupied while ~0.18 away from every point.  At fine (0.025) cells the
    slack drops to ~0.09 — measured worst-view ray occupancy on the bench
    scenes falls 0.94 -> ~0.8, which is what makes the ray/probe
    compaction budgets bite.  One-time build per scene (points never
    move); ~0.5 MB at +-1 bounds.  The padded row layout is what
    :func:`fine_occupancy`'s hot-path gather reads, so it is materialized
    HERE once instead of per call (host consumers flatten it back).
    """
    fs = fine_spec(spec)
    radius = spec.radius(r)
    h = fs.cell_size
    half = int(np.ceil(radius / h))
    rng = np.arange(-half, half + 1)
    offsets = jnp.asarray(
        np.stack(np.meshgrid(rng, rng, rng, indexing="ij"),
                 axis=-1).reshape(-1, 3).astype(np.int32)
    )                                                          # [W, 3]
    dims = jnp.asarray(fs.dims, dtype=jnp.int32)
    lo = jnp.asarray(fs.lo, dtype=points.dtype)

    ijk0 = jnp.floor((points - lo) / h).astype(jnp.int32)      # [N, 3]
    nb = ijk0[:, None, :] + offsets[None]                      # [N, W, 3]
    in_r = jnp.all((nb >= 0) & (nb < dims), axis=-1)
    box_lo = lo + nb.astype(points.dtype) * h
    box_hi = box_lo + h
    p = points[:, None, :]
    excess = jnp.maximum(box_lo - p, 0.0) + jnp.maximum(p - box_hi, 0.0)
    d2 = jnp.sum(excess * excess, axis=-1)
    ok = in_r & (d2 <= radius * radius)
    lin = (nb[..., 0] * dims[1] + nb[..., 1]) * dims[2] + nb[..., 2]
    occ = jnp.zeros((fs.num_cells,), dtype=jnp.int8)
    occ = occ.at[jnp.where(ok, lin, fs.num_cells)].set(1, mode="drop")
    pad = (-fs.num_cells) % 128
    return jnp.pad(occ, (0, pad)).reshape(-1, 128)


def fine_occupancy(x: jnp.ndarray, occ_fine: jnp.ndarray,
                   spec: VoxelGridSpec) -> jnp.ndarray:
    """Per-position occupancy test against the fine bitmap rows
    (``[rows, 128]`` int8 from :func:`build_occupancy_bitmap`).

    False guarantees query_grid finds no neighbor there.  The lookup is a
    128-cell ROW gather + compare-iota lane select, not a scalar gather:
    XLA's one-element-per-row gather is latency-bound (measured 2.0 ms for
    131k bool lookups in a 0.5 MB table — scripts/micro_occ.py; element
    width does not help), while row gathers move at full bandwidth
    (1.5 ms incl. the select, and it fuses with the callers' masks)."""
    fs = fine_spec(spec)
    cid = _cell_ids(x, fs)
    in_grid = cid < fs.num_cells
    cid_s = jnp.where(in_grid, cid, 0)
    r = occ_fine[cid_s >> 7]                               # [M, 128]
    hit = jnp.arange(128, dtype=cid.dtype)[None, :] == (cid_s & 127)[:, None]
    return (jnp.sum(jnp.where(hit, r, 0), axis=1) != 0) & in_grid


@partial(jax.jit, static_argnames=("spec", "k", "sort_queries"))
def query_grid(x: jnp.ndarray, qt: QueryTable, spec: VoxelGridSpec,
               k: int = 8, sort_queries: bool = False):
    """k nearest neighbors within the table's radius.

    Args:
      x: ``[M, 3]`` query positions.
      qt: QueryTable from :func:`build_query_table`.
      sort_queries: process queries in cell-id order (gather locality —
        ~25% faster for ray-sample batches; costs 2 argsorts).

    Returns:
      (idx ``[M, k]`` int32, ``-1`` missing; d2 ``[M, k]``, inf invalid),
      nearest-first.
    """
    # Neighbor SELECTION is non-differentiable (the reference queries its
    # CUDA grid under no_grad, ray_sampler.py:402 / pointneus_disent.py's
    # pseudo path, and recomputes differentiable quantities from idx) —
    # stop the gradient here so differentiated callers (pseudo-SDF loss at
    # large ray counts) never try to linearize through the Pallas select.
    x = jax.lax.stop_gradient(x)

    if sort_queries:
        order = jnp.argsort(_cell_ids(x, spec))
        idx_s, d2_s = query_grid(x[order], qt, spec, k=k)
        inv = jnp.argsort(order)
        return idx_s[inv], d2_s[inv]

    radius2 = spec.radius(qt.r) ** 2
    cid = _cell_ids(x, spec)                                   # [M]
    in_grid = cid < spec.num_cells
    cid = jnp.where(in_grid, cid, 0)

    cand = qt.idx[cid]                                         # [M, qcap]
    cpos = qt.pos[cid]                                         # [M, 3, qcap]

    if jax.default_backend() == "tpu" and x.shape[0] >= 1024:
        # fused distance + iterative top-k in VMEM (exact match of the XLA
        # path below; the bitonic lax.top_k and the [M, qcap] HBM
        # intermediates are the expensive parts it removes).  Packed-key
        # variant (id in the key's low mantissa bits — one reduce per
        # extraction round instead of two) when point ids fit 15 bits.
        from spurfies_tpu.ops.pallas_select import select_knn_pallas
        cand = jnp.where(in_grid[:, None], cand, -1)
        packed = 0 < qt.n_points <= 2 ** 15
        return select_knn_pallas(x, cand, cpos, k=k,
                                 radius2=float(radius2), packed=packed)

    diff = x[:, :, None] - cpos                                # aligned tiles
    d2 = jnp.sum(diff * diff, axis=1)                          # [M, qcap]
    ok = (cand >= 0) & (d2 <= radius2) & in_grid[:, None]
    d2 = jnp.where(ok, d2, jnp.inf)

    neg, top_i = jax.lax.top_k(-d2, k)
    top_d2 = -neg
    top_idx = jnp.take_along_axis(cand, top_i, axis=-1)
    top_idx = jnp.where(jnp.isfinite(top_d2), top_idx, -1)
    return top_idx.astype(jnp.int32), top_d2


@partial(jax.jit, static_argnames=("max_keep",))
def compact_rays(valid: jnp.ndarray, max_keep: int):
    """Select the first ``max_keep`` True positions along the last axis.

    The TPU-native, static-shape equivalent of the CUDA kernel's
    ``max_shading_pts`` ragged compaction (spurfies/model/utils.py:90-113):
    instead of dropping rays/samples, we return gather indices + masks.

    Args:
      valid: ``[R, S]`` bool.
      max_keep: static cap (reference: 80).

    Returns:
      (sel ``[R, max_keep]`` int32 indices into S (clipped, garbage where
       invalid), sel_valid ``[R, max_keep]`` bool).
    """
    s = valid.shape[-1]
    ar = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), valid.shape)
    key = jnp.where(valid, ar, s)
    key = jnp.sort(key, axis=-1)[..., :max_keep]
    sel_valid = key < s
    sel = jnp.minimum(key, s - 1)
    return sel, sel_valid
