"""COLMAP text-model converter tests."""

import json
import os

import numpy as np

from spurfies_tpu.prep.colmap import (
    colmap_to_json,
    qvec_to_rot,
    read_cameras_txt,
    read_images_txt,
)


def _write_model(d):
    with open(os.path.join(d, "cameras.txt"), "w") as f:
        f.write("# comment\n")
        f.write("1 PINHOLE 640 480 500.0 510.0 320.0 240.0\n")
    with open(os.path.join(d, "images.txt"), "w") as f:
        f.write("# comment\n")
        # identity rotation, translation (0, 0, -2) -> camera at (0, 0, 2)
        f.write("1 1 0 0 0 0 0 -2 1 a.png\n")
        f.write("1.0 2.0 -1\n")
        f.write("2 0.7071068 0 0.7071068 0 1 0 0 1 b.png\n")
        f.write("\n")


def test_qvec_identity():
    np.testing.assert_allclose(qvec_to_rot(np.array([1.0, 0, 0, 0])),
                               np.eye(3), atol=1e-7)


def test_full_convert(tmp_path):
    _write_model(str(tmp_path))
    cams = read_cameras_txt(str(tmp_path / "cameras.txt"))
    assert cams[1]["fl_x"] == 500.0 and cams[1]["h"] == 480

    images = read_images_txt(str(tmp_path / "images.txt"))
    assert len(images) == 2
    name, cam_id, c2w = images[0]
    assert name == "a.png"
    np.testing.assert_allclose(c2w[:3, 3], [0, 0, 2], atol=1e-6)

    meta = colmap_to_json(str(tmp_path), str(tmp_path / "out.json"))
    with open(tmp_path / "out.json") as f:
        loaded = json.load(f)
    assert loaded["fl_y"] == 510.0
    assert len(loaded["frames"]) == 2
    assert loaded["frames"][0]["file_path"] == "image/a.png"
