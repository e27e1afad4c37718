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
                     density: float = 0.2):
    """Sample points on triangles so samples are ~density apart
    (reference sample_single_tri, eval_dtu.py:20-33 semantics)."""
    v0 = verts[faces[:, 0]]
    v1 = verts[faces[:, 1]]
    v2 = verts[faces[:, 2]]
    e1, e2 = v1 - v0, v2 - v0
    n1 = np.linalg.norm(e1, axis=-1)
    n2 = np.linalg.norm(e2, axis=-1)
    k1 = np.ceil(n1 / density).astype(int) + 1
    k2 = np.ceil(n2 / density).astype(int) + 1

    out = [verts]
    for i in range(len(faces)):
        a, b = k1[i], k2[i]
        if a * b > 4_000_000:  # degenerate guard
            continue
        u = np.linspace(0, 1, a)[:, None]
        w = np.linspace(0, 1, b)[None, :]
        mask = (u + w) <= 1.0
        uu = np.broadcast_to(u, mask.shape)[mask]
        ww = np.broadcast_to(w, mask.shape)[mask]
        out.append(v0[i] + uu[:, None] * e1[i] + ww[:, None] * e2[i])
    return np.concatenate(out, axis=0)


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
