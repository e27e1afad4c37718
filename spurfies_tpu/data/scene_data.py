"""Common per-scene data bundle + dataset protocol.

The reference's three torch Datasets (dtu.py / mip_nerf.py / own_data.py)
share one protocol: per-view (uv, intrinsics 4x4, pose c2w 4x4) + flattened
rgb/mask ``[H*W, 3]`` (SURVEY §2 L5).  The TPU trainer instead wants all
train views stacked as arrays resident on device, so loaders produce a
SceneData with stacked train/eval stacks.
"""

from dataclasses import dataclass, field

import numpy as np


def make_uv(h: int, w: int) -> np.ndarray:
    """Pixel grid in (x, y) order, matching reference ``np.mgrid`` + flip
    (own_data.py:130-132)."""
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([xx, yy], axis=-1).reshape(-1, 2).astype(np.float32)


@dataclass
class ViewSet:
    """Stacked views: rgb/mask [V, HW, 3], pose/intrinsics [V, 4, 4]."""
    rgb: np.ndarray
    mask: np.ndarray
    pose: np.ndarray
    intrinsics: np.ndarray
    ids: list

    def stacked(self, uv: np.ndarray) -> dict:
        return {
            "rgb": self.rgb, "mask": self.mask, "uv": uv,
            "pose": self.pose, "intrinsics": self.intrinsics,
        }


@dataclass
class SceneData:
    scan_id: str
    img_res: tuple                 # (H, W)
    train: ViewSet
    eval: ViewSet | None
    points: np.ndarray             # raw point cloud [M, 3]
    colors: np.ndarray | None      # [M, 3] 0..255
    scale_mat: np.ndarray          # 4x4 world normalization
    local: object = None           # MVS feature bundle (DTU local loss)

    @property
    def uv(self) -> np.ndarray:
        return make_uv(*self.img_res)

    @property
    def total_pixels(self) -> int:
        return int(self.img_res[0] * self.img_res[1])

    @property
    def scale_factor(self) -> float:
        return float(self.scale_mat[0, 0])

    def train_views(self) -> dict:
        return self.train.stacked(self.uv)


def load_image(path: str, img_res=None) -> np.ndarray:
    """float32 [H, W, 3] in [0, 1]; optional cubic resize
    (reference rend_util.load_rgb + dtu.py:148-155)."""
    import imageio.v2 as imageio
    img = imageio.imread(path)
    img = np.asarray(img, dtype=np.float32)
    if img.max() > 1.5:
        img = img / 255.0
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)
    img = img[..., :3]
    if img_res is not None and tuple(img.shape[:2]) != tuple(img_res):
        import cv2
        img = cv2.resize(img, (img_res[1], img_res[0]),
                         interpolation=cv2.INTER_CUBIC)
    return img


def flatten_image(img: np.ndarray) -> np.ndarray:
    """[H, W, 3] -> [H*W, 3] row-major (matches reference reshape path)."""
    return img.reshape(-1, 3).astype(np.float32)


IMG_EXTS = (".png", ".jpg", ".JPG", ".jpeg", ".PNG", ".JPEG")


def glob_images(d: str) -> list:
    import glob as g
    import os
    paths = []
    for e in IMG_EXTS:
        paths += g.glob(os.path.join(d, f"*{e}"))
    return sorted(set(paths))
