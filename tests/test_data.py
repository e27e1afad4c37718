"""Data-layer tests: PLY codec, loaders, config system."""

import json
import os

import numpy as np
import pytest

from spurfies_tpu.config import Config, apply_overrides, config_from_dict
from spurfies_tpu.data.ply import load_ply, save_ply
from spurfies_tpu.data.scene_data import make_uv
from spurfies_tpu.data.synthetic import make_synthetic_scene


class TestPly:
    def test_roundtrip_binary(self, tmp_path, rng):
        pts = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
        cols = rng.integers(0, 255, (100, 3)).astype(np.uint8)
        p = str(tmp_path / "a.ply")
        save_ply(p, pts, cols)
        pts2, cols2 = load_ply(p)
        np.testing.assert_allclose(pts2, pts, rtol=1e-6)
        np.testing.assert_array_equal(cols2, cols)

    def test_no_colors(self, tmp_path, rng):
        pts = rng.uniform(-1, 1, (10, 3)).astype(np.float32)
        p = str(tmp_path / "b.ply")
        save_ply(p, pts)
        pts2, cols2 = load_ply(p)
        np.testing.assert_allclose(pts2, pts, rtol=1e-6)
        assert cols2 is None

    def test_ascii(self, tmp_path):
        p = str(tmp_path / "c.ply")
        with open(p, "w") as f:
            f.write(
                "ply\nformat ascii 1.0\nelement vertex 2\n"
                "property float x\nproperty float y\nproperty float z\n"
                "end_header\n0.5 1.0 -2.0\n1 2 3\n"
            )
        pts, cols = load_ply(p)
        np.testing.assert_allclose(pts, [[0.5, 1.0, -2.0], [1, 2, 3]])


class TestOwnData:
    def _make_scene_dir(self, root, scan="duck", h=24, w=32):
        import imageio.v2 as imageio
        inst = os.path.join(root, "own_data", scan)
        os.makedirs(os.path.join(inst, "image"))
        rng = np.random.default_rng(0)
        frames = []
        for i in range(3):
            img = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
            imageio.imwrite(os.path.join(inst, "image", f"{i:03d}.png"), img)
            pose = np.eye(4)
            pose[2, 3] = -1.5 - 0.1 * i
            frames.append({"file_path": f"image/{i:03d}.png",
                           "transform_matrix": pose.tolist()})
        meta = {"fl_x": 40.0, "fl_y": 40.0, "cx": w / 2, "cy": h / 2,
                "w": w, "h": h, "frames": frames}
        with open(os.path.join(inst, f"{scan}.json"), "w") as f:
            json.dump(meta, f)
        pts = rng.uniform(-0.5, 0.5, (500, 3)).astype(np.float32)
        cols = rng.integers(0, 255, (500, 3)).astype(np.uint8)
        save_ply(os.path.join(inst, f"{scan}.ply"), pts, cols)
        return pts

    def test_load(self, tmp_path):
        from spurfies_tpu.data.own_data import load_own_data
        pts = self._make_scene_dir(str(tmp_path))
        sd = load_own_data(str(tmp_path), "duck")
        assert sd.img_res == (24, 32)
        assert sd.train.rgb.shape == (3, 24 * 32, 3)
        assert sd.train.pose.shape == (3, 4, 4)
        np.testing.assert_allclose(sd.points, pts, rtol=1e-6)
        assert sd.train.mask.min() == 1.0
        views = sd.train_views()
        assert views["uv"].shape == (24 * 32, 2)


class TestDTUProtocol:
    def test_ids(self):
        from spurfies_tpu.data.dtu import get_eval_ids, get_train_ids
        assert get_train_ids(3) == [25, 22, 28]
        ev = get_eval_ids()
        assert len(ev) == 49 - 9 - 15
        assert all(i not in [25, 22, 28, 3, 16, 36] for i in ev)


def test_make_uv():
    uv = make_uv(2, 3)
    np.testing.assert_array_equal(
        uv, [[0, 0], [1, 0], [2, 0], [0, 1], [1, 1], [2, 1]]
    )


class TestConfig:
    def test_defaults_match_reference(self):
        cfg = Config()
        assert cfg.model.k == 8
        assert cfg.model.rbf == 45.0
        assert cfg.model.max_shading_pts == 80
        assert cfg.model.ray_sampler.n_samples_eval == 128
        assert cfg.loss.eikonal_weight == 0.001
        assert cfg.train.cosine_eta_min == 3e-4

    def test_from_dict(self):
        cfg = config_from_dict(
            {"model": {"k": 4, "ray_sampler": {"near": 1.0}}}
        )
        assert cfg.model.k == 4
        assert cfg.model.ray_sampler.near == 1.0
        assert cfg.model.rbf == 45.0  # untouched default

    def test_unknown_key_raises(self):
        with pytest.raises(KeyError):
            config_from_dict({"model": {"nonexistent": 1}})

    def test_overrides(self):
        cfg = apply_overrides(
            Config(),
            ["model.k=4", "train.num_pixels=512",
             "model.ray_sampler.far=6.0", "dataset.scan_id=duck"],
        )
        assert cfg.model.k == 4
        assert cfg.train.num_pixels == 512
        assert cfg.model.ray_sampler.far == 6.0
        assert cfg.dataset.scan_id == "duck"

    def test_hashable(self):
        hash(Config())  # frozen dataclasses usable as jit static args

    def test_presets(self):
        from spurfies_tpu.config import PRESETS

        # reference_exact pins the dense ray batch + dense eval chunk loop
        # (the defaults ray_budget_frac=-1 / render_skip_empty are
        # reference-equivalent compactions) AND resets every beyond-
        # reference default: exact quadrature (color_top_samples=0 — the
        # reference colors every sample) and dense sampler probes
        ref = apply_overrides(Config(), ["preset=reference_exact"])
        assert ref.model.ray_budget_frac == 0
        assert ref.train.render_skip_empty is False
        assert ref.model.color_top_samples == 0
        assert ref.model.probe_budget_frac >= 1
        assert apply_overrides(
            ref, ["model.ray_budget_frac=-1",
                  "model.color_top_samples=32",
                  "model.probe_budget_frac=-1",
                  "train.render_skip_empty=true"]) == Config()
        # later explicit overrides win over preset values
        cfg = apply_overrides(
            Config(), ["preset=throughput", "model.occ_compact=false"])
        assert cfg.model.occ_compact is False
        with pytest.raises(KeyError):
            apply_overrides(Config(), ["preset=nonexistent"])
        for name, ovr in PRESETS.items():  # every preset must apply cleanly
            apply_overrides(Config(), [f"preset={name}"] + list(ovr))


def test_synthetic_scene_consistency():
    pts, cols, views = make_synthetic_scene(n_points=500, n_views=2,
                                            img_res=(16, 16))
    assert pts.shape == (500, 3)
    np.testing.assert_allclose(np.linalg.norm(pts, axis=-1), 0.5, atol=1e-5)
    assert views["rgb"].shape == (2, 256, 3)
    # masked pixels have color, background is black
    m = views["mask"][0, :, 0] > 0
    assert views["rgb"][0][~m].max() == 0
    assert views["rgb"][0][m].min() > 0


class TestDust3rLikeScene:
    def test_statistics(self):
        """Cloud matches DUSt3R output statistics (VERDICT r2 #8): ~0.025
        FPS spacing, noise shell, partial (3-view) coverage."""
        from spurfies_tpu.data.synthetic import make_dust3r_like_scene

        pts, cols, views = make_dust3r_like_scene(img_res=(32, 32))
        assert len(pts) > 3000
        r = np.linalg.norm(pts, axis=-1)
        # thick shell around the radius-0.8 sphere
        assert abs(float(r.mean()) - 0.8) < 0.01
        assert 0.003 < float(r.std()) < 0.02

        from sklearn.neighbors import KDTree
        d = KDTree(pts).query(pts, k=2)[0][:, 1]
        assert float(d.min()) >= 0.024            # FPS spacing honored

        # back side (away from all 3 cameras) has holes
        cams = views["pose"][:, :3, 3]
        mean_cam = cams.mean(0)
        mean_cam /= np.linalg.norm(mean_cam)
        back = pts @ mean_cam < -0.6 * 0.8
        frac_back = back.mean()
        assert frac_back < 0.08                    # mostly missing

    def test_views_match_protocol(self):
        from spurfies_tpu.data.synthetic import make_dust3r_like_scene

        pts, cols, views = make_dust3r_like_scene(img_res=(24, 24))
        assert views["rgb"].shape == (3, 576, 3)
        assert views["mask"].shape == (3, 576, 1)
        assert cols.shape == (len(pts), 3)
        assert views["mask"].mean() > 0.2          # object in frame
