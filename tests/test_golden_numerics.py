"""Golden validation of the substituted protocol numerics (VERDICT r3 #5).

Three reference components were replaced by reimplementations here:
  * skimage.measure.marching_cubes (reference spurfies/utils/plots.py:245)
    -> marching tetrahedra (eval/marching.py)
  * skimage structural_similarity (reference eval_spurfies.py:263-264)
    -> scipy uniform_filter SSIM (eval/ssim.py)
  * per-face barycentric-grid triangle sampling via multiprocessing.Pool
    (reference evals/eval_dtu.py:15-25,79-109) -> vectorized random
    barycentric sampling (eval/chamfer.py)

Each substitution is argued equivalent in its docstring; these tests pin
the argument with an independent oracle: analytic SDFs + topology
invariants for marching tets, a brute-force per-window estimator for SSIM
(bit-exact to the skimage formula on interior windows), and a numpy port
of the reference's per-face grid loop (test-only oracle, never shipped)
for the Chamfer sampler.
"""

import numpy as np
import pytest

from spurfies_tpu.eval.chamfer import (
    chamfer_dtu,
    radius_downsample,
    sample_triangles,
)
from spurfies_tpu.eval.marching import marching_tetrahedra
from spurfies_tpu.eval.ssim import ssim


# ---------------------------------------------------------------------------
# (a) marching tetrahedra vs analytic sphere / torus SDFs
# ---------------------------------------------------------------------------

def _torus_sdf(x, R=0.55, r=0.22):
    q = np.stack(
        [np.sqrt(x[..., 0] ** 2 + x[..., 1] ** 2) - R, x[..., 2]], -1
    )
    return np.linalg.norm(q, axis=-1) - r


def _grid_eval(fn, n):
    g = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    pts = np.stack([X, Y, Z], -1)
    sp = 2.0 / (n - 1)
    return fn(pts), (sp, sp, sp), (-1.0, -1.0, -1.0)


def _edge_stats(faces):
    edges = np.concatenate(
        [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]]
    )
    key = np.sort(edges, axis=-1)
    uniq, counts = np.unique(key, axis=0, return_counts=True)
    return uniq, counts


class TestMarchingGolden:
    @pytest.mark.parametrize(
        "sdf_fn,euler",
        [
            (lambda x: np.linalg.norm(x, axis=-1) - 0.6, 2),   # sphere
            (_torus_sdf, 0),                                   # torus
        ],
        ids=["sphere", "torus"],
    )
    def test_surface_error_topology(self, sdf_fn, euler):
        n = 48
        sdf, sp, o = _grid_eval(sdf_fn, n)
        v, f = marching_tetrahedra(sdf, 0.0, spacing=sp, origin=o)
        cell = sp[0]
        assert len(f) > 500

        # surface Chamfer, both directions, < 0.5 grid cell:
        #  mesh -> surface: |analytic sdf| at every extracted vertex
        d_mesh = np.abs(sdf_fn(v))
        assert d_mesh.max() < 0.5 * cell, d_mesh.max()

        #  surface -> mesh: analytic surface samples to nearest vertex.
        # Vertex spacing is ~1 cell, so point-to-vertex distance overstates
        # point-to-triangle; 1 cell is a safe bound that still catches
        # holes/offset surfaces.
        rng = np.random.default_rng(0)
        if euler == 2:
            d = rng.normal(size=(4000, 3))
            surf = 0.6 * d / np.linalg.norm(d, axis=-1, keepdims=True)
        else:
            a = rng.uniform(0, 2 * np.pi, 4000)
            b = rng.uniform(0, 2 * np.pi, 4000)
            ring = 0.55 + 0.22 * np.cos(b)
            surf = np.stack(
                [ring * np.cos(a), ring * np.sin(a), 0.22 * np.sin(b)], -1
            )
        from sklearn.neighbors import KDTree
        d_surf = KDTree(v).query(surf)[0][:, 0]
        assert d_surf.max() < 1.0 * cell, d_surf.max()

        # watertight: every edge shared by exactly two faces
        uniq_e, counts = _edge_stats(f)
        assert np.all(counts == 2)

        # Euler characteristic pins the topology: 2 for a sphere,
        # 0 for a torus — a mesh with cracks, handles, or duplicated
        # sheets cannot pass this together with watertightness.
        chi = len(v) - len(uniq_e) + len(f)
        assert chi == euler


# ---------------------------------------------------------------------------
# (b) SSIM vs a brute-force oracle of the skimage estimator
# ---------------------------------------------------------------------------

def _ssim_bruteforce(a, b, data_range=1.0, win=7):
    """Direct per-window skimage structural_similarity estimator.

    skimage computes uniform-filtered moments, sample-covariance
    normalization N/(N-1), then crops (win-1)//2 from each border and
    means.  Every surviving pixel's window lies fully inside the image, so
    looping windows explicitly is bit-equivalent (no boundary mode) — an
    independent oracle for eval/ssim.py's filtered formulation.
    """
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    K1, K2 = 0.01, 0.03
    C1, C2 = (K1 * data_range) ** 2, (K2 * data_range) ** 2
    n = win * win
    pad = (win - 1) // 2
    vals = []
    for i in range(pad, a.shape[0] - pad):
        for j in range(pad, a.shape[1] - pad):
            wa = a[i - pad:i + pad + 1, j - pad:j + pad + 1].ravel()
            wb = b[i - pad:i + pad + 1, j - pad:j + pad + 1].ravel()
            ux, uy = wa.mean(), wb.mean()
            vx = ((wa - ux) ** 2).sum() / (n - 1)
            vy = ((wb - uy) ** 2).sum() / (n - 1)
            vxy = ((wa - ux) * (wb - uy)).sum() / (n - 1)
            vals.append(
                ((2 * ux * uy + C1) * (2 * vxy + C2))
                / ((ux * ux + uy * uy + C1) * (vx + vy + C2))
            )
    return float(np.mean(vals))


class TestSSIMGolden:
    def test_matches_bruteforce_oracle(self, rng):
        a = rng.uniform(0, 1, (24, 20))
        b = np.clip(a + rng.normal(0, 0.15, a.shape), 0, 1)
        got = ssim(a, b)
        want = _ssim_bruteforce(a, b)
        assert got == pytest.approx(want, abs=1e-10)

    def test_smooth_gradient_images(self, rng):
        # smooth structured images (the NVS regime), not just noise
        x = np.linspace(0, 1, 32)
        a = np.outer(x, x)
        b = np.clip(a + 0.05 * np.sin(10 * np.outer(x, np.ones(32))), 0, 1)
        assert ssim(a, b) == pytest.approx(_ssim_bruteforce(a, b), abs=1e-10)

    def test_constant_images_closed_form(self):
        # zero variance: s = (2 uv + C1) C2 / ((u^2+v^2+C1) C2)
        a = np.full((16, 16), 0.2)
        b = np.full((16, 16), 0.4)
        want = (2 * 0.2 * 0.4 + 1e-4) / (0.2 ** 2 + 0.4 ** 2 + 1e-4)
        assert ssim(a, b) == pytest.approx(want, abs=1e-12)


# ---------------------------------------------------------------------------
# (c) Chamfer triangle sampling vs the reference's per-face grid scheme
# ---------------------------------------------------------------------------

def _sample_triangles_reference(verts, faces, density=0.2):
    """Numpy port of the reference per-face barycentric grid sampler
    (evals/eval_dtu.py:15-25 sample_single_tri + :79-109 driver) — test
    oracle only, never shipped.
    """
    tri_vert = verts[faces]
    v1 = tri_vert[:, 1] - tri_vert[:, 0]
    v2 = tri_vert[:, 2] - tri_vert[:, 0]
    l1 = np.linalg.norm(v1, axis=-1)
    l2 = np.linalg.norm(v2, axis=-1)
    area2 = np.linalg.norm(np.cross(v1, v2), axis=-1)
    nz = area2 > 0
    v1, v2, l1, l2, area2 = v1[nz], v2[nz], l1[nz], l2[nz], area2[nz]
    base = tri_vert[nz][:, 0]
    thr = density * np.sqrt(l1 * l2 / area2)
    n1 = np.floor(l1 / thr)
    n2 = np.floor(l2 / thr)
    out = []
    for i in range(len(n1)):
        a, b = int(n1[i]), int(n2[i])
        c = np.mgrid[: a + 1, : b + 1].astype(np.float64)
        c += 0.5
        c[0] /= max(a, 1e-7)
        c[1] /= max(b, 1e-7)
        c = np.transpose(c, (1, 2, 0))
        k = c[c.sum(axis=-1) < 1]
        out.append(base[i] + k[:, :1] * v1[i] + k[:, 1:] * v2[i])
    pts = np.concatenate(out, axis=0)
    return np.concatenate([verts, pts], axis=0)


def _sphere_mesh(n=28, r=0.6):
    g = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    sdf = np.sqrt(X ** 2 + Y ** 2 + Z ** 2) - r
    sp = 2 / (n - 1)
    return marching_tetrahedra(
        sdf, 0.0, spacing=(sp, sp, sp), origin=(-1, -1, -1)
    )


class TestChamferSamplingGolden:
    def test_points_match_reference_exactly(self):
        """The shipped block-vectorized sampler reproduces the reference
        per-face grid loop point-for-point (same points, same order)."""
        v, f = _sphere_mesh()
        dens = 0.02
        ours = sample_triangles(v, f, density=dens)
        ref = _sample_triangles_reference(v, f, density=dens)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=1e-12)

    def test_degenerate_faces_dropped(self):
        # zero-area face contributes nothing; others sample normally
        v = np.asarray(
            [[0, 0, 0], [1, 0, 0], [0, 1, 0], [2, 0, 0]], dtype=np.float64
        )
        f = np.asarray([[0, 1, 2], [0, 1, 3]])  # second is collinear
        ours = sample_triangles(v, f, density=0.1)
        ref = _sample_triangles_reference(v, f, density=0.1)
        np.testing.assert_allclose(ours, ref, atol=1e-12)
        assert len(ours) > len(v)

    def test_chamfer_dtu_end_to_end_both_samplers(self, rng, monkeypatch):
        """chamfer_dtu with the oracle sampler patched in yields identical
        protocol numbers (same sample cloud -> same dedup -> same stats)."""
        v, f = _sphere_mesh()
        d = rng.normal(size=(12000, 3))
        gt = 0.6 * d / np.linalg.norm(d, axis=-1, keepdims=True)
        res_ours = chamfer_dtu(v, f, gt, max_dist=20.0,
                               downsample_density=0.02)

        import spurfies_tpu.eval.chamfer as C
        monkeypatch.setattr(
            C, "sample_triangles",
            lambda vv, ff, dd, seed=0: _sample_triangles_reference(
                vv, ff, dd
            ),
        )
        res_ref = chamfer_dtu(v, f, gt, max_dist=20.0,
                              downsample_density=0.02)
        assert res_ours["overall"] == pytest.approx(
            res_ref["overall"], rel=1e-9
        )
