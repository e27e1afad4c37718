"""Mesh extraction: batched SDF probe grid -> marching tetrahedra -> PLY.

Behavioral spec from reference ``spurfies/utils/plots.py:188-287``
(get_surface_by_grid) + ``eval_spurfies.py:140-194``: probe the SDF on a
bbox grid in 100k-point chunks (empty space = 1000), run marching cubes at
level 0, transform by scale_mat, keep the largest connected component.

DTU grid bounds come from ``bbs.npz`` with the reference's bbox aliases
(scan82 -> 83; scans 21/34/38 -> 24; eval_spurfies.py:140-157) and the x
1.5 scale (plots.py:189).
"""

import numpy as np

from spurfies_tpu.eval.marching import largest_component, marching_tetrahedra

# eval_spurfies.py:140-176: mipnerf hardcoded bounds
MIPNERF_BOUNDS = {
    "garden": (np.array([-0.7, -0.75, -0.65]), np.array([0.7, 0.75, 0.65])),
    "stump": (np.array([-0.6, -0.6, -0.6]), np.array([0.6, 0.6, 0.6])),
}
DTU_BB_ALIAS = {82: 83, 21: 24, 34: 24, 38: 24}


def grid_bounds_dtu(bbs_npz_path: str, scan_id: int, scale_mat: np.ndarray):
    """Grid bounds for a DTU scan: bbs.npz box mapped into normalized space
    via inv(scale_mat), x-extent scaled 1.5 (plots.py:189)."""
    bbs = np.load(bbs_npz_path)
    sid = DTU_BB_ALIAS.get(int(scan_id), int(scan_id))
    bb = bbs[str(sid)].reshape(2, 3).astype(np.float64)
    inv = np.linalg.inv(scale_mat.astype(np.float64))
    corners = np.array([
        [bb[i, 0], bb[j, 1], bb[k, 2], 1.0]
        for i in (0, 1) for j in (0, 1) for k in (0, 1)
    ]).T
    local = (inv @ corners)[:3].T
    lo, hi = local.min(0), local.max(0)
    center = (lo + hi) / 2
    half = (hi - lo) / 2 * np.array([1.5, 1.0, 1.0])
    return center - half, center + half


def extract_mesh(sdf_fn, lo, hi, resolution: int = 512,
                 chunk: int = 262144, scale_mat: np.ndarray | None = None,
                 keep_largest: bool = True, level: float = 0.0):
    """Probe sdf_fn on a ``resolution^3``-ish grid and extract the surface.

    Args:
      sdf_fn: ``[M, 3] float32 -> [M] float`` (e.g. field.sdf_probe partial;
        must return 1000 in empty space like the reference probe).
      lo/hi: grid bounds in normalized model space.
      resolution: samples along the longest axis (reference default 512).
      scale_mat: optional 4x4 applied to vertices (normalized -> world).

    Returns:
      (verts [V, 3] float32 world coords, faces [F, 3] int64).
    """
    lo = np.asarray(lo, dtype=np.float64)
    hi = np.asarray(hi, dtype=np.float64)
    extent = hi - lo
    steps = np.maximum(
        (extent / extent.max() * resolution).astype(int), 2
    )
    axes = [np.linspace(lo[d], hi[d], steps[d]) for d in range(3)]
    X, Y, Z = np.meshgrid(*axes, indexing="ij")
    pts = np.stack([X, Y, Z], -1).reshape(-1, 3).astype(np.float32)

    vals = np.empty(len(pts), dtype=np.float32)
    for i in range(0, len(pts), chunk):
        vals[i:i + chunk] = np.asarray(sdf_fn(pts[i:i + chunk]))
    sdf_grid = vals.reshape(*steps)

    if not (sdf_grid.min() < level < sdf_grid.max()):
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)

    spacing = [
        (hi[d] - lo[d]) / (steps[d] - 1) for d in range(3)
    ]
    verts, faces = marching_tetrahedra(sdf_grid, level, spacing=spacing,
                                       origin=lo)
    if keep_largest:
        verts, faces = largest_component(verts, faces)
    if scale_mat is not None:
        h = np.concatenate([verts, np.ones((len(verts), 1))], -1)
        verts = (scale_mat.astype(np.float64) @ h.T).T[:, :3]
    return verts.astype(np.float32), faces


def save_mesh_ply(path: str, verts: np.ndarray, faces: np.ndarray):
    """Binary PLY with faces."""
    verts = np.asarray(verts, dtype=np.float32)
    faces = np.asarray(faces, dtype=np.int32)
    header = [
        "ply", "format binary_little_endian 1.0",
        f"element vertex {len(verts)}",
        "property float x", "property float y", "property float z",
        f"element face {len(faces)}",
        "property list uchar int vertex_indices",
        "end_header",
    ]
    vrec = np.zeros(len(verts), dtype=[("x", "<f4"), ("y", "<f4"),
                                       ("z", "<f4")])
    vrec["x"], vrec["y"], vrec["z"] = verts[:, 0], verts[:, 1], verts[:, 2]
    frec = np.zeros(len(faces), dtype=[("n", "u1"), ("a", "<i4"),
                                       ("b", "<i4"), ("c", "<i4")])
    frec["n"] = 3
    frec["a"], frec["b"], frec["c"] = faces[:, 0], faces[:, 1], faces[:, 2]
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        f.write(vrec.tobytes())
        f.write(frec.tobytes())


def load_mesh_ply(path: str):
    """Read verts+faces from a binary-little-endian or ascii PLY."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii", errors="replace").strip()
            header.append(line)
            if line == "end_header":
                break
        fmt = next(l.split()[1] for l in header if l.startswith("format"))
        counts = {}
        order = []
        props = {}
        cur = None
        for line in header:
            p = line.split()
            if not p:
                continue
            if p[0] == "element":
                cur = p[1]
                counts[cur] = int(p[2])
                order.append(cur)
                props[cur] = []
            elif p[0] == "property" and cur:
                props[cur].append(p[1:])

        from spurfies_tpu.data.ply import _PLY_TO_NP
        verts = faces = None
        if fmt == "ascii":
            for el in order:
                rows = [f.readline().split() for _ in range(counts[el])]
                if el == "vertex":
                    arr = np.asarray(rows, dtype=np.float64)
                    names = [pp[-1] for pp in props[el]]
                    xi = [names.index(c) for c in ("x", "y", "z")]
                    verts = arr[:, xi].astype(np.float32)
                elif el == "face":
                    faces = np.asarray(
                        [r[1:4] for r in rows], dtype=np.int64
                    )
        else:
            endian = "<" if "little" in fmt else ">"
            for el in order:
                if el == "vertex":
                    dt = np.dtype([
                        (pp[-1], endian + _PLY_TO_NP[pp[0]])
                        for pp in props[el]
                    ])
                    raw = np.frombuffer(
                        f.read(counts[el] * dt.itemsize), dtype=dt
                    )
                    verts = np.stack(
                        [raw["x"], raw["y"], raw["z"]], -1
                    ).astype(np.float32)
                elif el == "face":
                    lst = props[el][0]
                    cnt_t = _PLY_TO_NP[lst[1]]
                    idx_t = _PLY_TO_NP[lst[2]]
                    faces = np.empty((counts[el], 3), dtype=np.int64)
                    cnt_sz = np.dtype(cnt_t).itemsize
                    idx_sz = np.dtype(idx_t).itemsize
                    for i in range(counts[el]):
                        n = int(np.frombuffer(f.read(cnt_sz),
                                              dtype=endian + cnt_t)[0])
                        idx = np.frombuffer(f.read(n * idx_sz),
                                            dtype=endian + idx_t)
                        faces[i] = idx[:3]
        return verts, faces


def calibrate_iso_level(points, sdf_fn, max_points: int = 16384,
                        seed: int = 0):
    """Self-calibrated extraction level: median SDF at the input cloud.

    Round-1 diagnosis (NOTES_ROUND1): the optimization pushes the SDF
    zero level a little INSIDE the point cloud — the finite neighbor
    window forces density to ramp early, rendered depth skews near, and
    the pseudo-SDF loss (reference pointneus_disent.py:765-780) pins
    sdf=0 at the skewed depth, producing a uniform inward mesh bias
    (~-0.02 normalized, ~1.2 mm at DTU scale; the reference shares the
    mechanism).  Rendered-depth calibration is circular (the pseudo loss
    already makes sdf~0 there — measured iso +0.004 vs bias -0.025); the
    neural points themselves are the surface anchor: they are DUSt3R
    surface samples, so the level set through them IS the surface.
    Measured on the synthetic sphere at 2k steps: sdf(points) = +0.019
    +/- 0.014 while the zero set sits 0.022 inside.

    Returns the calibrated iso level (median sdf at the cloud; robust to
    outlier points).
    """
    import numpy as np

    pts = np.asarray(points)
    rng = np.random.default_rng(seed)
    if len(pts) > max_points:
        pts = pts[rng.choice(len(pts), max_points, replace=False)]
    sdf = np.asarray(sdf_fn(pts.astype(np.float32)))
    valid = np.abs(sdf) < 1.0
    if not valid.any():
        return 0.0
    return float(np.median(sdf[valid]))
