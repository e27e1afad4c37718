"""COLMAP text-model converter tests."""

import json
import os

import numpy as np
import pytest

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


class TestBinaryModel:
    """Binary COLMAP model readers must agree with the text readers on the
    same reconstruction (bin is what real COLMAP runs emit)."""

    @staticmethod
    def _write_bin(tmp, cams, images):
        import struct
        with open(tmp / "cameras.bin", "wb") as f:
            f.write(struct.pack("<Q", len(cams)))
            for cid, c in cams.items():
                f.write(struct.pack("<iiQQ", cid, 1, c["w"], c["h"]))
                f.write(struct.pack("<4d", c["fl_x"], c["fl_y"],
                                    c["cx"], c["cy"]))
        with open(tmp / "images.bin", "wb") as f:
            f.write(struct.pack("<Q", len(images)))
            for i, (name, cid, q, t) in enumerate(images):
                f.write(struct.pack("<I", i + 1))
                f.write(struct.pack("<4d", *q))
                f.write(struct.pack("<3d", *t))
                f.write(struct.pack("<I", cid))
                f.write(name.encode() + b"\x00")
                f.write(struct.pack("<Q", 0))

    def test_bin_matches_txt(self, tmp_path):
        from spurfies_tpu.prep.colmap import (
            read_cameras_bin,
            read_cameras_txt,
            read_images_bin,
            read_images_txt,
            read_model,
        )
        rng = np.random.default_rng(0)
        q = rng.normal(size=4); q /= np.linalg.norm(q)
        t = rng.normal(size=3)
        cams = {1: {"model": "PINHOLE", "w": 640, "h": 480,
                    "fl_x": 500.0, "fl_y": 510.0, "cx": 320.0, "cy": 240.0}}
        self._write_bin(tmp_path, cams, [("a.png", 1, q, t)])

        with open(tmp_path / "cameras.txt", "w") as f:
            f.write("# comment\n1 PINHOLE 640 480 500 510 320 240\n")
        with open(tmp_path / "images.txt", "w") as f:
            f.write("# c\n")
            f.write("1 " + " ".join(str(v) for v in q) + " "
                    + " ".join(str(v) for v in t) + " 1 a.png\n\n")

        cb = read_cameras_bin(str(tmp_path / "cameras.bin"))
        ct = read_cameras_txt(str(tmp_path / "cameras.txt"))
        assert cb[1]["fl_x"] == ct[1]["fl_x"] == 500.0
        assert cb[1]["w"] == ct[1]["w"]

        ib = read_images_bin(str(tmp_path / "images.bin"))
        it = read_images_txt(str(tmp_path / "images.txt"))
        assert ib[0][0] == it[0][0] == "a.png"
        np.testing.assert_allclose(ib[0][2], it[0][2], atol=1e-9)

        # read_model prefers .bin
        cams_m, imgs_m = read_model(str(tmp_path))
        np.testing.assert_allclose(imgs_m[0][2], ib[0][2])


class TestOrchestration:
    def test_missing_colmap_is_clear(self, tmp_path):
        from spurfies_tpu.prep.colmap import run_colmap_pipeline
        with pytest.raises(FileNotFoundError, match="not found on PATH"):
            run_colmap_pipeline(str(tmp_path), str(tmp_path),
                                colmap_bin="definitely-not-colmap")

    def test_pipeline_invokes_colmap(self, tmp_path, monkeypatch):
        """Stub colmap executable records the invocation sequence."""
        import os
        import stat
        fake = tmp_path / "bin" / "colmap"
        fake.parent.mkdir()
        log = tmp_path / "calls.log"
        # the stub logs calls and creates the model dir mapper claims to
        fake.write_text(
            "#!/bin/sh\n"
            f"echo \"$@\" >> {log}\n"
            "prev=''\n"
            "for a in \"$@\"; do\n"
            "  if [ \"$prev\" = '--output_path' ]; then mkdir -p \"$a/0\"; fi\n"
            "  prev=\"$a\"\n"
            "done\n"
        )
        fake.chmod(fake.stat().st_mode | stat.S_IEXEC)
        monkeypatch.setenv("PATH", f"{fake.parent}:{os.environ['PATH']}")

        from spurfies_tpu.prep.colmap import run_colmap_pipeline
        model = run_colmap_pipeline(str(tmp_path / "imgs"),
                                    str(tmp_path / "work"))
        calls = log.read_text().strip().splitlines()
        assert calls[0].startswith("feature_extractor")
        assert calls[1].startswith("exhaustive_matcher")
        assert calls[2].startswith("mapper")
        assert model.endswith("sparse/0")
