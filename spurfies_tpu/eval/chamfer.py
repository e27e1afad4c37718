"""DTU Chamfer-distance evaluation (DTUeval protocol).

Behavioral spec from reference ``evals/eval_dtu.py:36-265``:
  * mesh vertices + surface samples, 0.2 mm radius dedup (KDTree),
  * ObsMask visibility filter + BB bounds + Res patch for accuracy points,
  * accuracy = mean dist to GT cloud (capped 20), completeness = mean dist
    from GT to mesh samples below the ground plane filter,
  * overall = mean(acc, comp); scan 82 uses Plane 83.

Runs host-side (sklearn KDTree, scipy.io for the .mat files) exactly like
the reference; triangle sampling is vectorized numpy instead of a
multiprocessing pool.
"""

import numpy as np


def sample_triangles(verts: np.ndarray, faces: np.ndarray,
                     density: float = 0.2, seed: int = 0):
    """Sample points on triangles at ~density spacing (reference
    sample_single_tri, eval_dtu.py:20-33 semantics).

    Fully vectorized: per-face counts matching the reference's barycentric
    grid (~k1*k2/2 points/face), drawn as uniform random barycentric
    samples instead of a Python per-face grid loop (the reference used a
    multiprocessing pool; a 512-res mesh has ~1M faces).  The downstream
    radius dedup (itself shuffle-randomized, eval_dtu.py:119-121) makes the
    two schemes statistically equivalent at the protocol's 0.2 spacing.
    """
    v0 = verts[faces[:, 0]]
    v1 = verts[faces[:, 1]]
    v2 = verts[faces[:, 2]]
    e1, e2 = v1 - v0, v2 - v0
    n1 = np.linalg.norm(e1, axis=-1)
    n2 = np.linalg.norm(e2, axis=-1)
    k1 = np.ceil(n1 / density) + 1
    k2 = np.ceil(n2 / density) + 1
    counts = np.ceil(k1 * k2 / 2).astype(np.int64)
    counts[k1 * k2 > 4_000_000] = 0         # degenerate guard (reference)

    total = int(counts.sum())
    face_id = np.repeat(np.arange(len(faces)), counts)
    rng = np.random.default_rng(seed)
    u = rng.random(total)
    w = rng.random(total)
    flip = u + w > 1.0                       # fold to the lower triangle
    u = np.where(flip, 1.0 - u, u)
    w = np.where(flip, 1.0 - w, w)
    pts = (v0[face_id] + u[:, None] * e1[face_id]
           + w[:, None] * e2[face_id])
    return np.concatenate([verts, pts], axis=0)


def radius_downsample(pts: np.ndarray, radius: float = 0.2,
                      seed: int = 0):
    """Greedy radius dedup after shuffle (eval_dtu.py:119-140).

    Native grid-hash kernel when available (meshes sample to millions of
    points at the DTU 0.2mm density); sklearn KDTree fallback.
    """
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(pts))
    pts = pts[order]

    from spurfies_tpu.native import radius_dedup
    keep_idx = radius_dedup(pts, radius)
    if keep_idx is not None:
        return pts[keep_idx]

    from sklearn.neighbors import KDTree
    tree = KDTree(pts)
    nbrs = tree.query_radius(pts, radius)
    keep = np.ones(len(pts), dtype=bool)
    for i, nb in enumerate(nbrs):
        if keep[i]:
            nb = nb[nb > i]
            keep[nb] = False
    return pts[keep]


def chamfer_dtu(mesh_verts, mesh_faces, gt_points,
                obs_mask_file=None, ground_plane_file=None,
                max_dist: float = 20.0, downsample_density: float = 0.2,
                patch_size: float = 60.0):
    """Full DTU protocol. Returns dict(acc, comp, overall).

    obs_mask_file: dict-like with ObsMask/BB/Res (scipy.io.loadmat result)
    ground_plane_file: dict-like with 'P' plane (4,) — points below the
    plane are excluded from completeness (eval_dtu.py:203-205).
    """
    from sklearn.neighbors import KDTree

    if len(mesh_faces) > 0:
        samples = sample_triangles(mesh_verts, mesh_faces,
                                   downsample_density)
    else:
        samples = mesh_verts
    data_down = radius_downsample(samples, downsample_density)

    # accuracy: mesh -> GT, with ObsMask visibility filter
    if obs_mask_file is not None:
        obs_mask = obs_mask_file["ObsMask"]
        bb = obs_mask_file["BB"].astype(np.float64)
        res = float(np.asarray(obs_mask_file["Res"]).squeeze())
        inbound = np.all(
            (data_down >= bb[:1] - patch_size)
            & (data_down < bb[1:] + patch_size), axis=-1
        )
        grid = ((data_down - bb[:1]) / res).astype(int)
        in_obs = np.zeros(len(data_down), dtype=bool)
        valid_idx = inbound & np.all(
            (grid >= 0) & (grid < np.asarray(obs_mask.shape)), axis=-1
        )
        g = grid[valid_idx]
        in_obs[valid_idx] = obs_mask[g[:, 0], g[:, 1], g[:, 2]].astype(bool)
        acc_pts = data_down[in_obs]
    else:
        acc_pts = data_down

    gt_tree = KDTree(gt_points)
    if len(acc_pts):
        d2s = gt_tree.query(acc_pts)[0][:, 0]
        acc = float(np.mean(np.minimum(d2s, max_dist)))
    else:
        acc = float("nan")

    # completeness: GT -> mesh, above ground plane
    if ground_plane_file is not None:
        P = np.asarray(ground_plane_file["P"]).reshape(4)
        above = (
            gt_points @ P[:3] + P[3] > 0
        )
        comp_gt = gt_points[above]
    else:
        comp_gt = gt_points
    mesh_tree = KDTree(data_down)
    s2d = mesh_tree.query(comp_gt)[0][:, 0]
    comp = float(np.mean(np.minimum(s2d, max_dist)))

    return {"acc": acc, "comp": comp, "overall": (acc + comp) / 2.0}
