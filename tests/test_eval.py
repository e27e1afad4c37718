"""Eval-stack tests: marching tetrahedra, SSIM, Chamfer, mesh IO."""

import numpy as np
import pytest

from spurfies_tpu.eval.chamfer import (
    chamfer_dtu,
    radius_downsample,
    sample_triangles,
)
from spurfies_tpu.eval.marching import largest_component, marching_tetrahedra
from spurfies_tpu.eval.mesh_extract import (
    extract_mesh,
    load_mesh_ply,
    save_mesh_ply,
)
from spurfies_tpu.eval.ssim import ssim


def _sphere_grid(n=40, r=0.6):
    g = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    sdf = np.sqrt(X ** 2 + Y ** 2 + Z ** 2) - r
    sp = 2 / (n - 1)
    return sdf, (sp, sp, sp), (-1.0, -1.0, -1.0)


class TestMarching:
    def test_sphere_accuracy(self):
        sdf, sp, o = _sphere_grid(48)
        v, f = marching_tetrahedra(sdf, 0.0, spacing=sp, origin=o)
        assert len(v) > 1000 and len(f) > 2000
        r = np.linalg.norm(v, axis=-1)
        np.testing.assert_allclose(r, 0.6, atol=5e-3)
        # surface area within 1%
        e1 = v[f[:, 1]] - v[f[:, 0]]
        e2 = v[f[:, 2]] - v[f[:, 0]]
        area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1).sum()
        np.testing.assert_allclose(area, 4 * np.pi * 0.36, rtol=0.01)

    def test_empty_level(self):
        sdf = np.ones((8, 8, 8))
        v, f = marching_tetrahedra(sdf)
        assert len(v) == 0 and len(f) == 0

    def test_watertight_closed_surface(self):
        """Closed surface: every edge shared by exactly 2 faces."""
        sdf, sp, o = _sphere_grid(24)
        v, f = marching_tetrahedra(sdf, 0.0, spacing=sp, origin=o)
        edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
        key = np.sort(edges, axis=-1)
        _, counts = np.unique(key, axis=0, return_counts=True)
        assert np.all(counts == 2)

    def test_largest_component(self):
        # two spheres, one bigger
        g = np.linspace(-1, 1, 48)
        X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
        s1 = np.sqrt((X + 0.5) ** 2 + Y ** 2 + Z ** 2) - 0.35
        s2 = np.sqrt((X - 0.6) ** 2 + Y ** 2 + Z ** 2) - 0.15
        sdf = np.minimum(s1, s2)
        sp = 2 / 47
        v, f = marching_tetrahedra(sdf, 0.0, spacing=(sp, sp, sp),
                                   origin=(-1, -1, -1))
        v2, f2 = largest_component(v, f)
        assert len(f2) < len(f)
        # remaining verts centered on the big sphere
        c = v2.mean(0)
        assert abs(c[0] + 0.5) < 0.05


class TestMeshExtract:
    def test_extract_with_probe(self):
        def sdf_fn(x):
            return np.linalg.norm(x, axis=-1) - 0.5

        v, f = extract_mesh(sdf_fn, [-1, -1, -1], [1, 1, 1], resolution=32)
        r = np.linalg.norm(v, axis=-1)
        np.testing.assert_allclose(r, 0.5, atol=2e-2)

    def test_scale_mat(self):
        def sdf_fn(x):
            return np.linalg.norm(x, axis=-1) - 0.5

        S = np.diag([2.0, 2.0, 2.0, 1.0]).astype(np.float32)
        S[:3, 3] = [1, 0, 0]
        v, f = extract_mesh(sdf_fn, [-1, -1, -1], [1, 1, 1], resolution=24,
                            scale_mat=S)
        r = np.linalg.norm(v - np.array([1, 0, 0]), axis=-1)
        np.testing.assert_allclose(r, 1.0, atol=5e-2)

    def test_mesh_ply_roundtrip(self, tmp_path):
        v = np.random.default_rng(0).uniform(-1, 1, (20, 3)).astype(
            np.float32
        )
        f = np.asarray([[0, 1, 2], [3, 4, 5]], dtype=np.int64)
        p = str(tmp_path / "m.ply")
        save_mesh_ply(p, v, f)
        v2, f2 = load_mesh_ply(p)
        np.testing.assert_allclose(v2, v, rtol=1e-6)
        np.testing.assert_array_equal(f2, f)


class TestSSIM:
    def test_identical(self, rng):
        img = rng.uniform(0, 1, (64, 64, 3))
        assert ssim(img, img) == pytest.approx(1.0)

    def test_noise_lowers(self, rng):
        img = rng.uniform(0, 1, (64, 64))
        noisy = img + rng.normal(0, 0.2, img.shape)
        s = ssim(img, np.clip(noisy, 0, 1))
        assert 0.0 < s < 0.95

    def test_constant_shift(self, rng):
        img = rng.uniform(0.3, 0.6, (64, 64))
        s = ssim(img, img + 0.1)
        assert 0.3 < s < 1.0


class TestChamfer:
    def test_sample_triangles_density(self):
        v = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], dtype=np.float64)
        f = np.asarray([[0, 1, 2]])
        s = sample_triangles(v, f, density=0.1)
        # unit right triangle at density 0.1: thr=0.1, n1=n2=10, grid
        # points with (i+.5)/10+(j+.5)/10 < 1 -> 45, plus the 3 verts
        assert len(s) == 48
        # all samples in the triangle plane
        np.testing.assert_allclose(s[:, 2], 0.0, atol=1e-12)

    def test_radius_downsample(self, rng):
        pts = rng.uniform(0, 1, (2000, 3))
        out = radius_downsample(pts, radius=0.2)
        from sklearn.neighbors import KDTree
        d = KDTree(out).query(out, k=2)[0][:, 1]
        assert np.all(d >= 0.2 - 1e-9)

    def test_identical_clouds_zero(self, rng):
        pts = rng.uniform(0, 10, (500, 3))
        res = chamfer_dtu(pts, np.zeros((0, 3), dtype=np.int64), pts)
        assert res["acc"] < 0.35      # bounded by downsample radius
        assert res["comp"] < 0.35
        assert res["overall"] == pytest.approx(
            (res["acc"] + res["comp"]) / 2
        )

    def test_offset_cloud(self, rng):
        pts = rng.uniform(0, 10, (800, 3))
        res = chamfer_dtu(pts + np.array([2.0, 0, 0]),
                          np.zeros((0, 3), dtype=np.int64), pts)
        assert res["acc"] > 0.5


class TestVisibilityCleaning:
    """Ray-cast-equivalent z-buffer pass (VERDICT r1 #8): occluded faces
    must be dropped, like the reference's trimesh+pyembree ray cast —
    containment-style frustum culling alone keeps them."""

    @staticmethod
    def _scene():
        from spurfies_tpu.data.synthetic import look_at

        def sphere_mesh(radius, n=24):
            from spurfies_tpu.eval.marching import marching_tetrahedra
            g = np.linspace(-1.3 * radius, 1.3 * radius, n)
            X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
            sdf = np.sqrt(X ** 2 + Y ** 2 + Z ** 2) - radius
            return marching_tetrahedra(
                sdf, 0.0, origin=(-1.3 * radius,) * 3,
                spacing=(g[1] - g[0],) * 3,
            )

        vo, fo = sphere_mesh(0.5)
        vi, fi = sphere_mesh(0.2)            # fully inside the outer sphere
        verts = np.concatenate([vo, vi])
        faces = np.concatenate([fo, np.asarray(fi) + len(vo)])
        inner = np.zeros(len(faces), dtype=bool)
        inner[len(fo):] = True

        K = np.eye(4)
        K[0, 0] = K[1, 1] = 80.0
        K[0, 2], K[1, 2] = 32.0, 24.0
        mats = []
        for ang in np.linspace(0, 2 * np.pi, 8, endpoint=False):
            eye = 1.6 * np.array([np.cos(ang), 0.3, np.sin(ang)])
            c2w = look_at(eye).astype(np.float64)
            mats.append(K @ np.linalg.inv(c2w))
        return verts, np.asarray(faces), inner, mats, (48, 64)

    def test_occluded_faces_dropped(self):
        from spurfies_tpu.eval.clean_mesh import (
            clean_mesh_by_frustum,
            clean_mesh_by_visibility,
        )
        verts, faces, inner, mats, res = self._scene()
        n_inner = int(inner.sum())
        n_outer = len(faces) - n_inner

        # containment keeps (almost) everything, incl. the hidden sphere
        vf, ff = clean_mesh_by_frustum(verts, faces, mats, res,
                                       min_component_faces=1)
        assert len(ff) > n_outer  # the inner sphere survived containment

        vv, fv = clean_mesh_by_visibility(verts, faces, mats, res)
        # visibility keeps most of the outer shell, drops the inner one
        assert len(fv) >= 0.7 * n_outer
        assert len(fv) <= 1.02 * n_outer

    def test_single_sphere_survives(self):
        from spurfies_tpu.eval.clean_mesh import clean_mesh_by_visibility
        verts, faces, inner, mats, res = self._scene()
        outer_faces = faces[~inner]
        vv, fv = clean_mesh_by_visibility(verts, outer_faces, mats, res)
        assert len(fv) >= 0.9 * len(outer_faces)


class TestNvsProtocol:
    """Reference metric protocol (eval_spurfies.py:226-272): 8-bit PNG
    roundtrip on the prediction; WHITE foreground compositing."""

    def test_quantize_png_roundtrip(self):
        from spurfies_tpu.eval.nvs import quantize_png
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 1, (8, 8, 3)).astype(np.float32)
        q = quantize_png(img)
        # exactly representable on the 0..255/255 lattice
        np.testing.assert_allclose(q * 255.0, np.round(q * 255.0),
                                   atol=1e-6)
        assert np.abs(q - img).max() <= 0.5 / 255.0 + 1e-6
        # out-of-range values clip like PNG encoding does
        np.testing.assert_allclose(
            quantize_png(np.array([[[-0.2, 0.5, 1.7]]])),
            [[[0.0, 0.5019608, 1.0]]], rtol=1e-5)

    def test_composite_is_white(self):
        from spurfies_tpu.eval.nvs import composite_foreground
        img = np.full((2, 2, 3), 0.25, np.float32)
        mask = np.zeros((2, 2, 3), np.float32)
        mask[0, 0] = 1.0
        out = composite_foreground(img, mask)
        # background must be WHITE (reference rgb*mask + (1-mask))
        np.testing.assert_allclose(out[1, 1], 1.0)
        np.testing.assert_allclose(out[0, 0], 0.25)

    def test_evaluate_views_psnr_reflects_quantization(self, rng):
        from spurfies_tpu.eval.nvs import evaluate_views

        class SD:
            img_res = (4, 4)
            uv = np.zeros((16, 2), np.float32)
            train = None

        class VS:
            ids = [0]
            rgb = [rng.uniform(0, 1, (16, 3)).astype(np.float32)]
            mask = [np.ones((16, 3), np.float32)]
            pose = [np.eye(4, dtype=np.float32)]
            intrinsics = [np.eye(4, dtype=np.float32)]

        sd = SD(); sd.eval = VS()
        pred = VS.rgb[0] + 1e-4   # sub-quantum perturbation

        def render(params, uv, pose, K, key):
            return {"rgb_values": pred}

        rq = evaluate_views(render, None, sd, save_images=False,
                            quantize=True)
        rf = evaluate_views(render, None, sd, save_images=False,
                            quantize=False)
        # float scoring sees the 1e-4 error; quantized scoring snaps the
        # prediction onto the 8-bit lattice (gt is not on-lattice here, so
        # psnr is finite but different)
        assert rq["psnr"][0] != rf["psnr"][0]

    def test_evaluate_views_view_ids_select(self, rng):
        # --eval-ids plumbing: only the requested eval ids are scored, in
        # viewset order, and max_views caps AFTER selection (r5: protocol
        # first-N on full-ring synthetic fixtures images the unobserved
        # far side)
        from spurfies_tpu.eval.nvs import evaluate_views

        class SD:
            img_res = (4, 4)
            uv = np.zeros((16, 2), np.float32)
            train = None

        class VS:
            ids = [1, 9, 23, 24]
            rgb = [np.full((16, 3), 0.1 * k, np.float32) for k in range(4)]
            mask = [np.ones((16, 3), np.float32)] * 4
            pose = [np.eye(4, dtype=np.float32)] * 4
            intrinsics = [np.eye(4, dtype=np.float32)] * 4

        sd = SD(); sd.eval = VS()
        calls = []

        def render(params, uv, pose, K, key):
            calls.append(1)
            return {"rgb_values": np.full((16, 3), 0.1, np.float32)}

        r = evaluate_views(render, None, sd, save_images=False,
                           view_ids=[23, 24, 99])
        assert r["ids"] == [23, 24] and len(r["psnr"]) == 2
        assert len(calls) == 2
        r2 = evaluate_views(render, None, sd, save_images=False,
                            view_ids=[23, 24], max_views=1)
        assert r2["ids"] == [23]
