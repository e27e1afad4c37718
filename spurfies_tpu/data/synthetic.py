"""Synthetic sphere scene: the end-to-end oracle (SURVEY §4 test strategy).

A colored sphere with analytically rendered ground-truth views — used by the
e2e optimization smoke test, the benchmark harness, and the driver entry
point.  Plays the role of the reference's 'duck' own-data scene without
shipping data.
"""

import numpy as np


def look_at(eye, target=(0.0, 0.0, 0.0), up=(0.0, 1.0, 0.0)):
    """c2w pose with camera -z... following the reference convention the
    camera looks along +z in camera frame (lift produces z=+1)."""
    eye = np.asarray(eye, dtype=np.float64)
    fwd = np.asarray(target, dtype=np.float64) - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, dtype=np.float64))
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 0] = right
    pose[:3, 1] = down
    pose[:3, 2] = fwd
    pose[:3, 3] = eye
    return pose


def _sphere_color(normal):
    return 0.5 + 0.5 * normal  # in [0,1]


def make_synthetic_scene(n_points=4000, n_views=3, img_res=(64, 64),
                         radius=0.5, cam_dist=1.5, focal=None, seed=0):
    """Build (point_cloud, colors_uint8, views dict) for a colored sphere.

    views: rgb [V, HW, 3], mask [V, HW, 1], uv [HW, 2],
           pose [V, 4, 4], intrinsics [V, 4, 4]  (numpy float32).
    """
    rng = np.random.default_rng(seed)
    h, w = img_res
    focal = focal or 1.2 * w

    v = rng.normal(size=(n_points, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    pts = (radius * v).astype(np.float32)
    cols = (_sphere_color(v) * 255.0).astype(np.float32)

    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = focal
    K[0, 2], K[1, 2] = w / 2.0, h / 2.0

    yy, xx = np.mgrid[0:h, 0:w]
    uv = np.stack([xx, yy], axis=-1).reshape(-1, 2).astype(np.float32)

    rgbs, masks, poses = [], [], []
    for i in range(n_views):
        ang = 2 * np.pi * i / max(n_views, 1) + 0.3
        eye = cam_dist * np.array(
            [np.cos(ang), 0.35, np.sin(ang)]
        )
        pose = look_at(eye)
        poses.append(pose)

        # analytic ray-sphere ground truth
        x_l = (uv[:, 0] - K[0, 2]) / K[0, 0]
        y_l = (uv[:, 1] - K[1, 2]) / K[1, 1]
        dirs_cam = np.stack([x_l, y_l, np.ones_like(x_l)], -1)
        dirs = dirs_cam @ pose[:3, :3].T
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        oc = pose[:3, 3]
        b = np.sum(dirs * oc, -1)
        c = np.sum(oc * oc) - radius ** 2
        disc = b * b - c
        hit = disc > 0
        t = -b - np.sqrt(np.maximum(disc, 0))
        hit &= t > 0
        p_hit = oc + t[:, None] * dirs
        normal = p_hit / np.maximum(
            np.linalg.norm(p_hit, axis=-1, keepdims=True), 1e-9
        )
        rgb = np.where(hit[:, None], _sphere_color(normal), 0.0)
        rgbs.append(rgb.astype(np.float32))
        masks.append(hit[:, None].astype(np.float32))

    views = {
        "rgb": np.stack(rgbs),
        "mask": np.stack(masks),
        "uv": uv,
        "pose": np.stack(poses),
        "intrinsics": np.stack([K] * n_views),
    }
    return pts, cols, views


def make_dust3r_like_scene(n_points=8000, n_views=3, img_res=(192, 256),
                           radius=0.8, cam_dist=2.4, noise_sigma=0.008,
                           spacing=0.025, seed=0):
    """Synthetic scene whose POINT CLOUD matches DUSt3R output statistics
    (VERDICT r2 #8: the clean uniform sphere understates production query
    cost).  DUSt3R clouds (dust3r_inference.py:69-140) differ from the
    ideal sphere in three ways reproduced here:

      * partial coverage — only surface visible from the 3 cameras
        survives (back side missing; rays pass through holes),
      * depth noise — each point is displaced along its observing
        camera's VIEW RAY (stereo depth error), giving a ~noise_sigma
        thick anisotropic shell (3-D neighborhoods, higher voxel
        occupancy),
      * FPS subsample to ~`spacing` (0.025, the reference's setting) —
        near-uniform spacing but view-biased density at the rims.

    Ground-truth views stay analytic (the true sphere), so quality gates
    keep working.  Returns the same (pts, cols, views) tuple.
    """
    rng = np.random.default_rng(seed)
    base = make_synthetic_scene(n_points=4, n_views=n_views,
                                img_res=img_res, radius=radius,
                                cam_dist=cam_dist, seed=seed)
    _, _, views = base
    cam_centers = views["pose"][:, :3, 3]                 # [V, 3]

    # oversample the surface, then visibility-filter + noise + FPS
    v = rng.normal(size=(n_points * 8, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    surf = radius * v

    to_cam = cam_centers[None] - surf[:, None]            # [N, V, 3]
    to_cam /= np.linalg.norm(to_cam, axis=-1, keepdims=True)
    facing = np.einsum("nvi,ni->nv", to_cam, v)           # cos(normal, dir)
    vis = facing > 0.15                                    # grazing cutoff
    seen = vis.any(-1)
    surf, v, to_cam, vis = surf[seen], v[seen], to_cam[seen], vis[seen]

    # displace along a random OBSERVING camera's ray (stereo depth error)
    obs = np.array([rng.choice(np.flatnonzero(m)) for m in vis])
    ray = -to_cam[np.arange(len(surf)), obs]              # cam -> point
    depth_err = rng.normal(0.0, noise_sigma, len(surf))
    pts = surf + ray * depth_err[:, None]

    from spurfies_tpu.prep.pointcloud import greedy_spacing_subsample
    order = rng.permutation(len(pts))
    pts = pts[order]
    v = v[order]
    keep = greedy_spacing_subsample(pts, spacing)
    pts, v = pts[keep], v[keep]

    cols = (_sphere_color(v) * 255.0).astype(np.float32)
    return pts.astype(np.float32), cols, views


def export_synthetic_own_data(root, scan="sphere", **scene_kwargs):
    """Write the synthetic scene to disk in own-data layout
    (``<root>/own_data/<scan>/{image/, <scan>.json, <scan>.ply}`` — the
    format of reference dust3r_inference_own.py:161-181,262-267) so the
    full CLI chain (train -> evaluate) can be exercised without real data.

    Returns (pts, cols, views) like make_synthetic_scene.
    """
    import json
    import os

    import imageio.v2 as imageio

    from spurfies_tpu.data.ply import save_ply

    pts, cols, views = make_synthetic_scene(**scene_kwargs)
    h, w = views["rgb"].shape[1:2][0], None
    n_views = views["rgb"].shape[0]
    # recover img_res from uv grid extents
    uv = views["uv"]
    w = int(uv[:, 0].max()) + 1
    h = int(uv[:, 1].max()) + 1

    inst = os.path.join(root, "own_data", scan)
    img_dir = os.path.join(inst, "image")
    os.makedirs(img_dir, exist_ok=True)

    K = views["intrinsics"][0]
    meta = {
        "fl_x": float(K[0, 0]), "fl_y": float(K[1, 1]),
        "cx": float(K[0, 2]), "cy": float(K[1, 2]),
        "h": h, "w": w,
        "frames": [
            {"file_path": f"image/{i:03d}.png",
             "transform_matrix": views["pose"][i].tolist()}
            for i in range(n_views)
        ],
    }
    with open(os.path.join(inst, f"{scan}.json"), "w") as f:
        json.dump(meta, f)

    for i in range(n_views):
        img = views["rgb"][i].reshape(h, w, 3)
        imageio.imwrite(
            os.path.join(img_dir, f"{i:03d}.png"),
            (np.clip(img, 0, 1) * 255).astype(np.uint8),
        )

    save_ply(os.path.join(inst, f"{scan}.ply"), pts,
             cols.astype(np.uint8))
    return pts, cols, views


def export_synthetic_dtu(root, scan_id=24, n_views=49, img_res=(48, 64),
                         gt_root=None, **scene_kwargs):
    """Write the synthetic scene to disk in the DTU layout so the full DTU
    CLI chain (train -> evaluate --mesh --rendering -> eval_dtu) can be
    dress-rehearsed without real data (reference layouts:
    spurfies/datasets/dtu.py:59-145, eval_spurfies.py:140-157,
    evals/eval_dtu.py:64).

    Produces: scan{id}/{image/, cameras.npz, {id}.ply},
    eval_mask/scan{id}/mask/*.png, bbs.npz, and (when gt_root is given)
    Points/stl/stl{id:03d}_total.ply ground truth in world frame.

    cameras.npz uses a non-trivial scale_mat (scale 2, offset x 0.05) so
    the P = world_mat @ scale_mat decomposition path is exercised.
    """
    import os

    import imageio.v2 as imageio

    from spurfies_tpu.data.ply import save_ply

    pts, cols, views = make_synthetic_scene(
        n_views=n_views, img_res=img_res, **scene_kwargs
    )
    h, w = img_res

    inst = os.path.join(root, "dtu", f"scan{scan_id}")
    img_dir = os.path.join(inst, "image")
    mask_dir = os.path.join(root, "dtu", "eval_mask", f"scan{scan_id}",
                            "mask")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(mask_dir, exist_ok=True)

    scale_mat = np.diag([2.0, 2.0, 2.0, 1.0]).astype(np.float64)
    scale_mat[0, 3] = 0.05

    K = views["intrinsics"][0].astype(np.float64)
    cam_arrays = {}
    for i in range(n_views):
        c2w = views["pose"][i].astype(np.float64)
        w2c = np.linalg.inv(c2w)
        P = K @ w2c                       # normalized-frame projection
        world_mat = P @ np.linalg.inv(scale_mat)
        cam_arrays[f"world_mat_{i}"] = world_mat
        cam_arrays[f"scale_mat_{i}"] = scale_mat

        img = views["rgb"][i].reshape(h, w, 3)
        imageio.imwrite(os.path.join(img_dir, f"{i:06d}.png"),
                        (np.clip(img, 0, 1) * 255).astype(np.uint8))
        m = views["mask"][i].reshape(h, w, 1)
        imageio.imwrite(os.path.join(mask_dir, f"{i:03d}.png"),
                        np.repeat((m * 255).astype(np.uint8), 3, axis=-1))

    np.savez(os.path.join(inst, "cameras.npz"), **cam_arrays)
    save_ply(os.path.join(inst, f"{scan_id}.ply"), pts,
             cols.astype(np.uint8))

    # world-frame bounding box of the (scaled) sphere for mesh extraction
    radius = scene_kwargs.get("radius", 0.5)
    c = scale_mat[:3, 3]
    half = radius * 2.0 * 1.2
    bb = np.stack([c - half, c + half]).astype(np.float64)
    np.savez(os.path.join(root, "dtu", "bbs.npz"),
             **{str(scan_id): bb.reshape(2, 3)})

    if gt_root is not None:
        stl_dir = os.path.join(gt_root, "Points", "stl")
        os.makedirs(stl_dir, exist_ok=True)
        gt_world = (pts @ scale_mat[:3, :3].T + scale_mat[:3, 3]).astype(
            np.float32)
        save_ply(os.path.join(stl_dir, f"stl{scan_id:03d}_total.ply"),
                 gt_world, None)
    return pts, cols, views
