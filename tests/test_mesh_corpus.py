"""Mesh-corpus ingestion for prior pretraining (VERDICT r2 #6:
ShapeNet-ready path; procedural shapes remain the fixture)."""

import numpy as np
import pytest

from spurfies_tpu.eval.marching import marching_tetrahedra
from spurfies_tpu.prior import mesh_corpus as mc


def _sphere_mesh(r=0.5, res=24):
    """Watertight-ish sphere mesh from the analytic SDF via marching tets."""
    lin = np.linspace(-0.8, 0.8, res)
    g = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), -1)
    sdf = np.linalg.norm(g, axis=-1) - r
    step = lin[1] - lin[0]
    verts, faces = marching_tetrahedra(sdf, 0.0, spacing=(step,) * 3,
                                       origin=(-0.8,) * 3)
    return verts.astype(np.float32), faces


class TestReaders:
    def test_obj_roundtrip(self, tmp_path):
        verts, faces = _sphere_mesh()
        path = str(tmp_path / "s.obj")
        mc.save_obj(path, verts, faces)
        v2, f2 = mc.load_mesh(path)
        np.testing.assert_allclose(v2, verts, atol=1e-5)
        np.testing.assert_array_equal(f2, faces)

    def test_obj_quad_triangulation(self, tmp_path):
        path = str(tmp_path / "q.obj")
        with open(path, "w") as f:
            f.write("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n")
            f.write("f 1/1 2/2 3/3 4/4\n")          # quad with uv refs
        v, faces = mc.load_mesh(path)
        assert v.shape == (4, 3)
        assert faces.shape == (2, 3)                # fan-triangulated

    def test_ply_ascii(self, tmp_path):
        path = str(tmp_path / "t.ply")
        with open(path, "w") as f:
            f.write(
                "ply\nformat ascii 1.0\n"
                "element vertex 3\n"
                "property float x\nproperty float y\nproperty float z\n"
                "element face 1\n"
                "property list uchar int vertex_indices\n"
                "end_header\n"
                "0 0 0\n1 0 0\n0 1 0\n"
                "3 0 1 2\n"
            )
        v, faces = mc.load_mesh(path)
        assert v.shape == (3, 3) and faces.shape == (1, 3)

    def test_ply_binary(self, tmp_path):
        import struct
        path = str(tmp_path / "b.ply")
        with open(path, "wb") as f:
            f.write(
                b"ply\nformat binary_little_endian 1.0\n"
                b"element vertex 3\n"
                b"property float x\nproperty float y\nproperty float z\n"
                b"element face 1\n"
                b"property list uchar int vertex_indices\n"
                b"end_header\n"
            )
            for v in [(0, 0, 0), (1, 0, 0), (0, 1, 0)]:
                f.write(struct.pack("<3f", *v))
            f.write(struct.pack("<B3i", 3, 0, 1, 2))
        v, faces = mc.load_mesh(path)
        assert v.shape == (3, 3) and faces.shape == (1, 3)


class TestGeometry:
    def test_signed_distance_sphere(self):
        """Signed distance to a sphere mesh matches the analytic SDF
        (inside negative, outside positive)."""
        verts, faces = _sphere_mesh(r=0.5, res=32)
        rng = np.random.default_rng(0)
        q = rng.uniform(-0.75, 0.75, (200, 3)).astype(np.float32)
        sd = mc.signed_distance(verts, faces, q)
        ref = np.linalg.norm(q, axis=-1) - 0.5
        # mesh discretization error bounds the tolerance
        np.testing.assert_allclose(sd, ref, atol=0.03)
        inside = ref < -0.05
        assert np.all(sd[inside] < 0)
        assert np.all(sd[ref > 0.05] > 0)

    def test_sample_surface_on_mesh(self):
        verts, faces = _sphere_mesh(r=0.5, res=24)
        s = mc.sample_surface(verts, faces, 500, seed=1)
        r = np.linalg.norm(s, axis=-1)
        assert np.all(np.abs(r - 0.5) < 0.05)

    def test_normalize_mesh(self):
        rng = np.random.default_rng(0)
        v = rng.uniform(10, 30, (100, 3)).astype(np.float32)
        n = mc.normalize_mesh(v, bounds=0.6)
        half = (n.max(0) - n.min(0)) / 2
        assert abs(half.max() - 0.6) < 1e-5
        np.testing.assert_allclose((n.max(0) + n.min(0)) / 2, 0, atol=1e-5)


class TestCorpus:
    def test_mesh_to_shape_protocol(self, tmp_path):
        verts, faces = _sphere_mesh(r=0.5, res=24)
        path = str(tmp_path / "s.obj")
        mc.save_obj(path, verts, faces)
        sh = mc.mesh_to_shape(path, n_query=400, spacing=0.05)
        assert sh["query"].shape == (400, 3)
        assert sh["query_sdf"].shape == (400,)
        assert len(sh["surface"]) > 50
        # near-surface queries: |sdf| small
        assert float(np.mean(np.abs(sh["query_sdf"]))) < 0.1

    def test_pretrain_consumes_mesh_shapes(self, tmp_path):
        """build_shapes_from_meshes feeds prior.pretrain unchanged."""
        import dataclasses

        from spurfies_tpu.prior.pretrain import PriorConfig, pretrain

        verts, faces = _sphere_mesh(r=0.45, res=20)
        mc.save_obj(str(tmp_path / "a.obj"), verts, faces)
        mc.save_obj(str(tmp_path / "b.obj"), verts * 0.9, faces)

        cfg = PriorConfig(n_shapes=2, n_surface_cap=512, n_query=400,
                          batch_queries=128, steps=6, spacing=0.05)
        shapes = mc.build_shapes_from_meshes(
            str(tmp_path), n_shapes=2, n_query=400, spacing=0.05
        )
        params, history = pretrain(cfg, log_every=3, shapes=shapes)
        assert np.isfinite(history[-1]["loss"])
        assert history[-1]["coverage"] > 0.3

    def test_shape_count_mismatch_raises(self):
        from spurfies_tpu.prior.pretrain import PriorConfig, build_corpus

        cfg = PriorConfig(n_shapes=3)
        with pytest.raises(ValueError, match="n_shapes"):
            build_corpus(cfg, shapes=[{}])


def test_eval_holdout_runs():
    """Auto-decoder held-out scoring runs and returns finite L1."""
    import numpy as np

    from spurfies_tpu.prior.pretrain import (
        PriorConfig,
        eval_holdout,
        init_prior_params,
    )
    from spurfies_tpu.prior.shapes import sample_shape

    import jax

    cfg = PriorConfig(n_shapes=1, n_surface_cap=512, n_query=400,
                      batch_queries=128, spacing=0.05)
    rng = np.random.default_rng(3)
    held = [sample_shape(rng, n_query=400, spacing=0.05)]
    params = init_prior_params(jax.random.PRNGKey(0), cfg)
    mean_l1, per = eval_holdout(params["decoder"], held, cfg, fit_steps=30)
    assert np.isfinite(mean_l1) and len(per) == 1
