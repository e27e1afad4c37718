"""Isosurface extraction: vectorized marching tetrahedra (host, numpy).

Replaces the reference's skimage.measure.marching_cubes call
(spurfies/utils/plots.py:188-287) — skimage is not in this environment, and
marching tetrahedra is self-contained (no 256-case tables) while producing
an equivalent watertight triangulation for the Chamfer/NVS protocols.

Every generated vertex lies on a segment between two grid nodes, so vertices
weld exactly by (node_a, node_b) key — no epsilon merging.
"""

import numpy as np

# 6-tetrahedra decomposition of the unit cube around the 0-6 diagonal.
# Cube corners indexed bit-wise: corner i = (i&1, (i>>1)&1, (i>>2)&1).
_TETS = np.array([
    [0, 5, 1, 6],
    [0, 1, 2, 6],
    [0, 2, 3, 6],
    [0, 3, 7, 6],
    [0, 7, 4, 6],
    [0, 4, 5, 6],
], dtype=np.int64)

_CORNER_OFFSET = np.array(
    [[(i >> 0) & 1, (i >> 1) & 1, (i >> 2) & 1] for i in range(8)],
    dtype=np.int64,
)
# NOTE: corner bit layout (x = bit0, y = bit1, z = bit2); the tet table above
# assumes corners 0..7 = (000,100,110,010,001,101,111,011) in (x,y,z) — i.e.
# the standard VTK ordering.  Remap:
_VTK_CORNERS = np.array([
    [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
    [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
], dtype=np.int64)


def _tet_triangles(inside):
    """Triangle edge lists for one tet sign configuration.

    inside: tuple of 4 bools.  Returns list of triangles, each a list of 3
    edges, each edge a (va, vb) pair of local tet vertex ids with
    sdf(va) < level <= sdf(vb) crossing.
    """
    ins = [i for i in range(4) if inside[i]]
    outs = [i for i in range(4) if not inside[i]]
    if len(ins) == 0 or len(ins) == 4:
        return []
    if len(ins) == 1:
        a = ins[0]
        e = [(a, o) for o in outs]
        return [[e[0], e[1], e[2]]]
    if len(ins) == 3:
        d = outs[0]
        e = [(i, d) for i in ins]
        return [[e[0], e[2], e[1]]]
    # len 2: quad
    a, b = ins
    c, d = outs
    return [
        [(a, c), (a, d), (b, d)],
        [(a, c), (b, d), (b, c)],
    ]


# Precompute case table: for each 4-bit config, flat array of edge pairs.
_CASES = []
for cfg in range(16):
    inside = tuple(bool((cfg >> i) & 1) for i in range(4))
    tris = _tet_triangles(inside)
    _CASES.append(np.array(tris, dtype=np.int64).reshape(-1, 3, 2))


def marching_tetrahedra(sdf: np.ndarray, level: float = 0.0,
                        spacing=(1.0, 1.0, 1.0), origin=(0.0, 0.0, 0.0)):
    """Extract the ``sdf == level`` isosurface.

    Args:
      sdf: ``[X, Y, Z]`` scalar field.
      spacing/origin: world transform of the grid.

    Returns:
      (verts ``[V, 3]`` float64, faces ``[F, 3]`` int64).  Vertices are
      welded (unique per grid edge).
    """
    sdf = np.asarray(sdf)
    nx, ny, nz = sdf.shape
    if min(nx, ny, nz) < 2:
        return np.zeros((0, 3)), np.zeros((0, 3), dtype=np.int64)

    # node linear index helper
    def node_id(ix, iy, iz):
        return (ix * ny + iy) * nz + iz

    # all cube base corners
    bx, by, bz = np.meshgrid(
        np.arange(nx - 1), np.arange(ny - 1), np.arange(nz - 1),
        indexing="ij",
    )
    base = np.stack([bx.ravel(), by.ravel(), bz.ravel()], -1)  # [C, 3]

    # corner node ids / sdf values per cube in VTK order [C, 8]
    corner_nodes = np.stack(
        [
            node_id(base[:, 0] + c[0], base[:, 1] + c[1], base[:, 2] + c[2])
            for c in _VTK_CORNERS
        ],
        axis=-1,
    )
    flat_sdf = sdf.ravel()
    corner_sdf = flat_sdf[corner_nodes]                         # [C, 8]

    edge_a_all, edge_b_all = [], []
    for tet in _TETS:
        t_nodes = corner_nodes[:, tet]                          # [C, 4]
        t_sdf = corner_sdf[:, tet]                              # [C, 4]
        inside = t_sdf < level                                  # [C, 4]
        cfg = (
            inside[:, 0].astype(np.int64)
            | (inside[:, 1] << 1)
            | (inside[:, 2] << 2)
            | (inside[:, 3] << 3)
        )
        for case_id in range(1, 15):
            tris = _CASES[case_id]
            if len(tris) == 0:
                continue
            sel = np.nonzero(cfg == case_id)[0]
            if len(sel) == 0:
                continue
            # [S, T, 3, 2] local ids -> node ids
            local = tris[None].repeat(len(sel), axis=0)
            na = np.take_along_axis(
                t_nodes[sel][:, None, None].repeat(
                    local.shape[1], 1
                ).repeat(3, 2),
                local[..., 0:1], axis=-1,
            )[..., 0]
            nb = np.take_along_axis(
                t_nodes[sel][:, None, None].repeat(
                    local.shape[1], 1
                ).repeat(3, 2),
                local[..., 1:2], axis=-1,
            )[..., 0]
            edge_a_all.append(na.reshape(-1, 3))
            edge_b_all.append(nb.reshape(-1, 3))

    if not edge_a_all:
        return np.zeros((0, 3)), np.zeros((0, 3), dtype=np.int64)

    ea = np.concatenate(edge_a_all)        # [F, 3] node id of inside end
    eb = np.concatenate(edge_b_all)        # [F, 3] node id of outside end

    # weld: unique undirected edges
    lo = np.minimum(ea, eb)
    hi = np.maximum(ea, eb)
    key = lo.astype(np.int64) * (nx * ny * nz) + hi
    uniq, inv = np.unique(key.ravel(), return_inverse=True)
    faces = inv.reshape(-1, 3)

    u_lo = (uniq // (nx * ny * nz)).astype(np.int64)
    u_hi = (uniq % (nx * ny * nz)).astype(np.int64)

    def node_coord(n):
        iz = n % nz
        iy = (n // nz) % ny
        ix = n // (nz * ny)
        return np.stack([ix, iy, iz], -1).astype(np.float64)

    s_lo = flat_sdf[u_lo].astype(np.float64)
    s_hi = flat_sdf[u_hi].astype(np.float64)
    denom = s_hi - s_lo
    t = np.where(np.abs(denom) > 1e-12, (level - s_lo) / denom, 0.5)
    t = np.clip(t, 0.0, 1.0)
    verts = node_coord(u_lo) + t[:, None] * (
        node_coord(u_hi) - node_coord(u_lo)
    )
    verts = verts * np.asarray(spacing)[None] + np.asarray(origin)[None]

    # drop degenerate faces (two welded verts equal)
    ok = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    return verts, faces[ok]


def largest_component(verts: np.ndarray, faces: np.ndarray):
    """Keep the largest connected component (reference uses
    trimesh split+argmax, eval_spurfies.py:184-190)."""
    if len(faces) == 0:
        return verts, faces
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components

    n = len(verts)
    rows = np.concatenate([faces[:, 0], faces[:, 1], faces[:, 2]])
    cols = np.concatenate([faces[:, 1], faces[:, 2], faces[:, 0]])
    adj = coo_matrix(
        (np.ones(len(rows)), (rows, cols)), shape=(n, n)
    )
    n_comp, labels = connected_components(adj, directed=False)
    if n_comp <= 1:
        return verts, faces
    # component size by face count
    face_label = labels[faces[:, 0]]
    best = np.bincount(face_label, minlength=n_comp).argmax()
    keep_f = faces[face_label == best]
    keep_v = np.unique(keep_f)
    remap = -np.ones(n, dtype=np.int64)
    remap[keep_v] = np.arange(len(keep_v))
    return verts[keep_v], remap[keep_f]
