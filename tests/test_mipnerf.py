"""MipNeRF-360 loader protocol (hardcoded res/frame tables)."""

import json
import os

import numpy as np
import pytest

from spurfies_tpu.data.mip_nerf import SCENE_RES, TRAIN_FRAMES, load_mipnerf
from spurfies_tpu.data.ply import save_ply


def _make_scene(root, scan="garden"):
    import imageio.v2 as imageio
    inst = os.path.join(root, "mipnerf", scan)
    os.makedirs(os.path.join(inst, "image"))
    rng = np.random.default_rng(0)
    frames = []
    # decoy frame + the three hardcoded train frames
    names = ["DECOY.JPG"] + TRAIN_FRAMES[scan]
    for i, n in enumerate(names):
        pose = np.eye(4)
        pose[2, 3] = -2.0 - i
        frames.append({"file_path": f"images/{n}",
                       "transform_matrix": pose.tolist()})
    meta = {"fl_x": 480.0, "fl_y": 481.0, "cx": 324.0, "cy": 210.0,
            "w": 648, "h": 420, "frames": frames}
    with open(os.path.join(inst, f"{scan}.json"), "w") as f:
        json.dump(meta, f)
    for i in range(3):
        img = rng.integers(0, 255, (40, 60, 3)).astype(np.uint8)
        imageio.imwrite(os.path.join(inst, "image", f"{i:02d}.png"), img)
    pts = rng.uniform(-1.5, 1.5, (300, 3)).astype(np.float32)
    save_ply(os.path.join(inst, f"{scan}.ply"), pts)
    return inst


def test_tables():
    assert SCENE_RES["garden"] == (420, 648)
    assert SCENE_RES["stump"] == (413, 622)
    assert len(TRAIN_FRAMES["garden"]) == 3


def test_load_garden(tmp_path):
    _make_scene(str(tmp_path))
    sd = load_mipnerf(str(tmp_path), "garden")
    assert sd.img_res == (420, 648)
    # only the 3 hardcoded frames' poses kept, decoy skipped
    assert sd.train.pose.shape == (3, 4, 4)
    np.testing.assert_allclose(sd.train.pose[0][2, 3], -3.0)
    assert sd.train.rgb.shape == (3, 420 * 648, 3)
    assert sd.train.mask.min() == 1.0  # all-ones masks
    assert sd.points.shape == (300, 3)
    # intrinsics rescaled to img_res (source w=648 -> no scale here)
    np.testing.assert_allclose(sd.train.intrinsics[0][0, 0], 480.0)


def test_unknown_scene(tmp_path):
    with pytest.raises(NotImplementedError):
        load_mipnerf(str(tmp_path), "bicycle")


def test_mipnerf_scene_overrides():
    """garden/stump get the ±2 voxel-grid bounds (reference
    pointneus_disent.py:45-53); DTU keeps ±1."""
    from spurfies_tpu.cli.train import apply_scene_overrides
    from spurfies_tpu.config import Config, DataConfig

    cfg = Config(dataset=DataConfig(data_dir="mipnerf"))
    out = apply_scene_overrides(cfg, "garden")
    assert out.model.scene_lo == (-2.0, -2.0, -2.0)
    assert out.model.scene_hi == (2.0, 2.0, 2.0)

    dtu = Config(dataset=DataConfig(data_dir="dtu"))
    out = apply_scene_overrides(dtu, "scan24")
    assert out.model.scene_lo == (-1.0, -1.0, -1.0)
