"""Vis-MVSNet local-loss data bundle for DTU scenes.

Behavioral spec from reference ``spurfies/datasets/dtu.py:161-239`` +
``spurfies/feat_utils.py:80-145``:
  * MVS camera text files: word 0 = 'extrinsic' marker, words 1..16 the 4x4
    extrinsic, words 18..26 the 3x3 intrinsic, then depth-range words
    (unused here); pair.txt lists source views per reference view.
  * The 3 train images (``DTU_pixelnerf/dtu_scan{id}/image``) are resized to
    2x the depth-cam resolution (768x1024), ImageNet-normalized, and pushed
    through the frozen FeatExt; only the half-resolution 32-channel head is
    used (dtu.py:236).
  * ``cams_hd`` = depth cams with intrinsics scaled 2x; ``size`` / ``center``
    come from scale_mat (dtu.py:225-226).
  * source-view map for 3-view DTU: {22:[25,28], 25:[22,28], 28:[22,25]}
    indexed as {22:0, 25:1, 28:2} (dtu.py:311-331).
"""

import os
from dataclasses import dataclass

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)

# dtu.py:311-331 — enum position of each train view and its sources
SRC_MAP = {0: [1, 2], 1: [0, 2], 2: [0, 1]}


def parse_mvs_cam(path: str) -> np.ndarray:
    """-> [2, 4, 4]: cam[0]=extrinsic w2c, cam[1][:3,:3]=intrinsic."""
    with open(path) as f:
        words = f.read().split()
    cam = np.zeros((2, 4, 4), dtype=np.float32)
    for i in range(4):
        for j in range(4):
            cam[0, i, j] = float(words[4 * i + j + 1])
    for i in range(3):
        for j in range(3):
            cam[1, i, j] = float(words[3 * i + j + 18])
    cam[1, 3, 3] = 1.0
    return cam


def parse_pair(path: str) -> list:
    """pair.txt -> ordered list of view-id strings."""
    with open(path) as f:
        lines = f.readlines()
    n = int(lines[0])
    return [lines[1 + 2 * i].strip() for i in range(n)]


def scale_intrinsics(cam: np.ndarray, scale: float) -> np.ndarray:
    out = cam.copy()
    out[1, 0, :] *= scale
    out[1, 1, :] *= scale
    return out


@dataclass
class LocalBundle:
    """Per-scene MVS feature bundle (all numpy, NHWC features)."""
    feats: np.ndarray        # [3, Hf, Wf, 32]
    cams_hd: np.ndarray      # [3, 2, 4, 4]
    size: float
    center: np.ndarray       # [3]

    def for_view(self, enum_id: int):
        src = SRC_MAP[enum_id]
        return {
            "feat": self.feats[enum_id],
            "feats_src": self.feats[src],
            "cam": self.cams_hd[enum_id],
            "src_cams": self.cams_hd[src],
            "size": self.size,
            "center": self.center,
        }


def build_local_bundle(data_dir_root: str, scan_id: int,
                       featext_params, scale_mat: np.ndarray,
                       feat_img_scale: int = 2) -> LocalBundle:
    """Load cams + images, extract frozen features (device), bundle.

    Camera files are read from the reference's (hardcoded) scan24 cam4feat
    directory — dtu.py:163-183 does the same for every scan.
    """
    import cv2
    import jax.numpy as jnp

    from spurfies_tpu.data.scene_data import glob_images, load_image
    from spurfies_tpu.model.featext import featext_apply

    cam_dir = os.path.join(data_dir_root, "dtu", "DTU_pixelnerf",
                           "dtu_scan24", "cam4feat")
    ids = parse_pair(os.path.join(cam_dir, "pair.txt"))[:3]
    depth_cams = np.stack([
        parse_mvs_cam(
            os.path.join(cam_dir, f"cam_{i.zfill(8)}_flow3.txt")
        )
        for i in ids
    ])
    cams_hd = np.stack(
        [scale_intrinsics(c, feat_img_scale) for c in depth_cams]
    )

    img_dir = os.path.join(data_dir_root, "dtu", "DTU_pixelnerf",
                           f"dtu_scan{scan_id}", "image")
    paths = glob_images(img_dir)[:3]
    target = (384 * feat_img_scale, 512 * feat_img_scale)  # (H, W)
    imgs = []
    for p in paths:
        # reference reads BGR via cv2.imread and /256 (dtu.py:195-196) then
        # halves before ImageNet normalization (dtu.py:222)
        img = cv2.imread(p).astype(np.float32) / 256.0
        img = cv2.resize(img, (target[1], target[0]),
                         interpolation=cv2.INTER_LINEAR)
        img = (img / 2 + 0.5 - IMAGENET_MEAN) / IMAGENET_STD
        imgs.append(img)
    batch = jnp.asarray(np.stack(imgs))

    _, _, f3 = featext_apply(featext_params, batch)
    feats = np.asarray(f3)                          # [3, 384, 512, 32]

    return LocalBundle(
        feats=feats,
        cams_hd=cams_hd,
        size=float(scale_mat[0, 0]) * 2.0,
        center=np.asarray(scale_mat[:3, 3], dtype=np.float32),
    )
