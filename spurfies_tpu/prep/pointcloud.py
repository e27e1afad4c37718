"""Point-cloud preparation: the post-DUSt3R processing pipeline.

Behavioral spec from reference ``dust3r_inference.py`` /
``dust3r_inference_own.py``:
  * confidence-threshold filtering (conf >= 10) of per-view pointmaps
    (:107-140, :334),
  * greedy farthest-point-style subsample to ~``spacing`` (0.025) minimum
    point distance (:69-105),
  * own-data: normalize cloud + cameras into the unit cube with scale
    ``2 / max_extent`` (dust3r_inference_own.py:183-202),
  * export ``<scan>.ply`` (+ NGP-style ``<scan>.json`` for own data,
    :161-181, :262-267).

The DUSt3R ViT inference itself requires its released checkpoint; scenes in
the benchmark configs ship with prepared point clouds (readme.md:51,70).
"""

import json
import os

import numpy as np


def filter_by_confidence(points, colors, conf, threshold: float = 10.0):
    """Keep points with conf >= threshold (reference conf thr 10)."""
    keep = np.asarray(conf) >= threshold
    return points[keep], (colors[keep] if colors is not None else None)


def greedy_spacing_subsample(points, spacing: float = 0.025, seed: int = 0):
    """Greedy subsample: accept a point if no already-accepted point lies
    within ``spacing`` (reference subsample semantics, :69-105).

    Grid-hash accelerated: O(N) with a cell size of ``spacing``.  Uses the
    native kernel (native/spurfies_io.cpp) when available; Python fallback
    below is identical.
    """
    pts = np.asarray(points)
    n = len(pts)

    from spurfies_tpu.native import spacing_subsample
    native = spacing_subsample(pts, spacing)
    if native is not None:
        return native
    order = np.arange(n)
    cell = spacing
    lo = pts.min(0) - cell
    ijk = np.floor((pts - lo) / cell).astype(np.int64)
    dims = ijk.max(0) + 2
    lin = (ijk[:, 0] * dims[1] + ijk[:, 1]) * dims[2] + ijk[:, 2]

    occupied = {}
    keep = np.zeros(n, dtype=bool)
    sp2 = spacing * spacing
    neighbor_offsets = [
        (dx * dims[1] + dy) * dims[2] + dz
        for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)
    ]
    for i in order:
        c = lin[i]
        ok = True
        for off in neighbor_offsets:
            lst = occupied.get(c + off)
            if lst:
                d2 = np.sum((pts[lst] - pts[i]) ** 2, axis=-1)
                if (d2 < sp2).any():
                    ok = False
                    break
        if ok:
            keep[i] = True
            occupied.setdefault(c, []).append(i)
    return np.nonzero(keep)[0]


def normalize_unit_cube(points, poses):
    """Scale scene so the cloud spans the [-1, 1] cube
    (reference dust3r_inference_own.py:183-202).

    Returns (points', poses', scale, center).
    """
    pts = np.asarray(points)
    lo, hi = pts.min(0), pts.max(0)
    center = (lo + hi) / 2.0
    extent = (hi - lo).max()
    scale = 2.0 / extent
    out_pts = (pts - center) * scale
    out_poses = []
    for p in np.asarray(poses):
        q = p.copy()
        q[:3, 3] = (p[:3, 3] - center) * scale
        out_poses.append(q)
    return out_pts, np.stack(out_poses), scale, center


def export_scene(out_dir: str, scan: str, points, colors, poses=None,
                 intrinsics=None, img_wh=None, frame_names=None):
    """Write ``<scan>.ply`` (+ ``<scan>.json`` when cameras given)."""
    from spurfies_tpu.data.ply import save_ply

    os.makedirs(out_dir, exist_ok=True)
    save_ply(os.path.join(out_dir, f"{scan}.ply"), points, colors)

    if poses is not None:
        K = np.asarray(intrinsics)
        w, h = img_wh
        meta = {
            "fl_x": float(K[0, 0]), "fl_y": float(K[1, 1]),
            "cx": float(K[0, 2]), "cy": float(K[1, 2]),
            "w": int(w), "h": int(h),
            "frames": [
                {
                    "file_path": (
                        frame_names[i] if frame_names
                        else f"image/{i:03d}.png"
                    ),
                    "transform_matrix": np.asarray(p).tolist(),
                }
                for i, p in enumerate(poses)
            ],
        }
        with open(os.path.join(out_dir, f"{scan}.json"), "w") as f:
            json.dump(meta, f, indent=2)


def prepare_scene(points, colors, conf=None, conf_threshold: float = 10.0,
                  spacing: float = 0.025, normalize: bool = False,
                  poses=None):
    """Full prep: confidence filter -> spacing subsample -> (normalize)."""
    if conf is not None:
        points, colors = filter_by_confidence(points, colors, conf,
                                              conf_threshold)
    keep = greedy_spacing_subsample(points, spacing)
    points = points[keep]
    colors = colors[keep] if colors is not None else None
    scale, center = 1.0, np.zeros(3)
    if normalize:
        points, poses, scale, center = normalize_unit_cube(points, poses)
    return points, colors, poses, scale, center
