"""Pose/point-cloud visualizer (reference scripts/vis_mip_nerf_ngp.py role).

The reference opens an interactive trimesh window (useless headless); this
exports one combined PLY — the scene cloud plus camera frusta drawn as
colored point strips — which any viewer (MeshLab, Blender, three.js drag &
drop) can open.

    python scripts/vis_scene.py --dataset own_data --scan duck \
        [--data-root data] [--out vis_duck.ply]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def frustum_points(pose, K, img_wh, depth=0.3, n=24):
    """Camera frustum as line-strip samples in world space."""
    w, h = img_wh
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    corners = np.array([
        [(0 - cx) / fx, (0 - cy) / fy, 1.0],
        [(w - cx) / fx, (0 - cy) / fy, 1.0],
        [(w - cx) / fx, (h - cy) / fy, 1.0],
        [(0 - cx) / fx, (h - cy) / fy, 1.0],
    ]) * depth
    eye = np.zeros(3)
    segs = []
    for i in range(4):
        segs.append((eye, corners[i]))                    # rays
        segs.append((corners[i], corners[(i + 1) % 4]))   # far rectangle
    pts = []
    for a, b in segs:
        t = np.linspace(0.0, 1.0, n)[:, None]
        pts.append(a[None] * (1 - t) + b[None] * t)
    local = np.concatenate(pts)
    return local @ pose[:3, :3].T + pose[:3, 3]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="own_data",
                    choices=["own_data", "dtu", "mipnerf"])
    ap.add_argument("--scan", required=True)
    ap.add_argument("--data-root", default="data")
    ap.add_argument("--out", default=None)
    ap.add_argument("--frustum-depth", type=float, default=0.3)
    args = ap.parse_args(argv)

    from spurfies_tpu.cli.train import load_scene_data
    from spurfies_tpu.config import Config, DataConfig
    from spurfies_tpu.data.ply import save_ply

    cfg = Config(dataset=DataConfig(data_dir=args.dataset,
                                    data_dir_root=args.data_root,
                                    scan_id=args.scan))
    sd = load_scene_data(cfg, args.scan)

    pts = [np.asarray(sd.points, dtype=np.float32)]
    if sd.colors is not None and len(sd.colors):
        cols = [np.asarray(sd.colors, dtype=np.float32)]
    else:
        cols = [np.full((len(sd.points), 3), 180.0, np.float32)]

    h, w = sd.img_res
    palette = np.array([[255, 64, 64], [64, 255, 64], [64, 64, 255],
                        [255, 255, 64]], np.float32)
    for i in range(len(sd.train.ids)):
        f = frustum_points(sd.train.pose[i], sd.train.intrinsics[i],
                           (w, h), depth=args.frustum_depth)
        pts.append(f.astype(np.float32))
        cols.append(np.tile(palette[i % len(palette)], (len(f), 1)))

    all_pts = np.concatenate(pts)
    all_cols = np.concatenate(cols).astype(np.uint8)
    out = args.out or f"vis_{args.scan}.ply"
    save_ply(out, all_pts, all_cols)
    print(f"wrote {out}: {len(all_pts)} points "
          f"({len(sd.points)} cloud + {len(sd.train.ids)} frusta)")


if __name__ == "__main__":
    main()
