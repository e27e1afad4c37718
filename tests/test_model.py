"""Model-layer tests: networks, field interpolation, sampler, renderer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spurfies_tpu.config import ModelConfig, SamplerConfig
from spurfies_tpu.core.embedder import encoding_dim
from spurfies_tpu.model import field
from spurfies_tpu.model.networks import init_model_params, mlp_apply, mlp_init
from spurfies_tpu.model.neural_points import build_scene
from spurfies_tpu.model.renderer import render_rays, tv_loss
from spurfies_tpu.model.sampler import (
    error_bound_z_vals,
    sample_pdf,
    uniform_z_vals,
)

CFG = ModelConfig()


@pytest.fixture(scope="module")
def sphere_scene():
    """Points on a radius-0.5 sphere + inited params (shared, built once)."""
    rng = np.random.default_rng(7)
    v = rng.normal(size=(4000, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    pts = (0.5 * v).astype(np.float32)
    cols = rng.uniform(0, 255, size=(4000, 3)).astype(np.float32)
    key = jax.random.PRNGKey(0)
    scene, latents = build_scene(key, pts, CFG, cols)
    params = init_model_params(jax.random.PRNGKey(1), CFG)
    params["train"].update(latents)
    return scene, params


class TestNetworks:
    def test_shapes(self):
        p = init_model_params(jax.random.PRNGKey(0), CFG)
        fg = p["frozen"]["F_geometry"]
        assert len(fg) == 5
        assert fg[0]["w"].shape == (35, 256)
        assert p["frozen"]["T"][0]["w"].shape == (256, 1)
        fc = p["train"]["F_color"]
        assert len(fc) == 4
        assert fc[0]["w"].shape == (64 + encoding_dim(6, 3), 256)
        r = p["train"]["R"]
        assert r[0]["w"].shape == (256 + encoding_dim(3, 3), 256)
        assert r[-1]["w"].shape == (256, 3)

    def test_mlp_apply_manual(self):
        layers = mlp_init(jax.random.PRNGKey(0), [4, 8, 2])
        x = jnp.ones((3, 4))
        out = mlp_apply(layers, x)
        w0, b0 = np.asarray(layers[0]["w"]), np.asarray(layers[0]["b"])
        w1, b1 = np.asarray(layers[1]["w"]), np.asarray(layers[1]["b"])
        h = np.ones((3, 4)) @ w0 + b0
        h = np.where(h > 0, h, 0.01 * h)  # LeakyReLU(0.01)
        expected = h @ w1 + b1
        np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-5,
                                   atol=1e-6)

    def test_sigmoid_head(self):
        layers = mlp_init(jax.random.PRNGKey(0), [4, 3])
        out = mlp_apply(layers, jnp.ones((2, 4)), final_act="sigmoid")
        assert np.all((np.asarray(out) > 0) & (np.asarray(out) < 1))

    def test_init_bounds(self):
        layers = mlp_init(jax.random.PRNGKey(0), [16, 8])
        bound = 1 / np.sqrt(16)
        assert np.abs(np.asarray(layers[0]["w"])).max() <= bound
        assert np.abs(np.asarray(layers[0]["b"])).max() <= bound


class TestField:
    def test_rbf_weights(self):
        x_pi = jnp.asarray([[[0.01, 0, 0], [0.02, 0, 0]]])
        valid = jnp.asarray([[True, True]])
        w, norm = field.rbf_weights(x_pi, valid, 45.0)
        expected = np.exp(-((np.array([0.01, 0.02]) * 45.0) ** 2))
        np.testing.assert_allclose(np.asarray(w[0]), expected, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(norm[0, 0]), expected.sum(),
                                   rtol=1e-5)

    def test_rbf_invalid_zero(self):
        x_pi = jnp.ones((1, 2, 3)) * 0.01
        valid = jnp.asarray([[True, False]])
        w, _ = field.rbf_weights(x_pi, valid, 45.0)
        assert np.asarray(w)[0, 1] == 0.0

    def test_aggregate_single_neighbor_is_pair_sdf(self, sphere_scene):
        scene, params = sphere_scene
        frozen = params["frozen"]
        geo = params["train"]["feats_geometry"]
        x = scene.points[0:1] + jnp.asarray([[0.01, 0.0, 0.0]])
        idx = jnp.asarray([[0, -1, -1, -1, -1, -1, -1, -1]], dtype=jnp.int32)
        valid = idx >= 0
        agg, has = field.aggregate_sdf(frozen, geo, scene.points, idx, valid,
                                       x, 45.0)
        x_pi = (x - scene.points[0:1])[:, None, :]
        direct = field.pair_sdf(frozen, geo[0:1][None], x_pi)
        assert bool(has[0])
        np.testing.assert_allclose(np.asarray(agg[0]),
                                   np.asarray(direct[0, 0]), rtol=1e-4,
                                   atol=1e-5)

    def test_filler_no_neighbors(self, sphere_scene):
        scene, params = sphere_scene
        sdf = field.sdf_probe(
            params["frozen"], params["train"]["feats_geometry"], scene,
            jnp.asarray([[0.0, 0.0, 0.0], [0.9, 0.9, 0.9]]), CFG.k, CFG.r,
            CFG.rbf,
        )
        np.testing.assert_allclose(np.asarray(sdf), field.SDF_FILLER)

    def test_grad_matches_fd(self, sphere_scene):
        scene, params = sphere_scene
        frozen = params["frozen"]
        geo = params["train"]["feats_geometry"]
        x = scene.points[:4] + 0.012
        from spurfies_tpu.ops.voxel_grid import query_grid
        idx, _ = query_grid(x, scene.table, scene.spec, k=CFG.k)
        valid = idx >= 0
        sdf, grad = field.sdf_and_grad(frozen, geo, scene.points, idx, valid,
                                       x, CFG.rbf)
        eps = 1e-3
        for d in range(3):
            dx = jnp.zeros((4, 3)).at[:, d].set(eps)
            sp, _ = field.aggregate_sdf(frozen, geo, scene.points, idx, valid,
                                        x + dx, CFG.rbf)
            sm, _ = field.aggregate_sdf(frozen, geo, scene.points, idx, valid,
                                        x - dx, CFG.rbf)
            fd = (sp - sm) / (2 * eps)
            np.testing.assert_allclose(np.asarray(grad[:, d]),
                                       np.asarray(fd), rtol=2e-2, atol=2e-3)

    def test_pairs_match_dense(self, sphere_scene):
        """sdf_and_grad_pairs == sdf_and_grad when the budget holds all
        valid pairs, including empty-space filler points and second-order
        grads w.r.t. latents (the eikonal path)."""
        scene, params = sphere_scene
        frozen = params["frozen"]
        geo = params["train"]["feats_geometry"]
        rng = np.random.default_rng(3)
        # mix of near-surface and empty-space points
        x = jnp.concatenate([
            scene.points[:24] + jnp.asarray(
                rng.normal(0, 0.01, (24, 3)).astype(np.float32)),
            jnp.asarray(rng.uniform(0.8, 0.95, (8, 3)).astype(np.float32)),
        ])
        from spurfies_tpu.ops.voxel_grid import query_grid
        idx, _ = query_grid(x, scene.table, scene.spec, k=CFG.k)
        valid = idx >= 0
        budget = int(np.sum(np.asarray(valid))) + 16  # no overflow

        s_d, g_d = field.sdf_and_grad(frozen, geo, scene.points, idx,
                                      valid, x, CFG.rbf)
        s_p, g_p = field.sdf_and_grad_pairs(frozen, geo, scene.points, idx,
                                            valid, x, CFG.rbf, budget)
        np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_d),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_d),
                                   rtol=1e-4, atol=1e-5)

        def eik_dense(g):
            s, gr = field.sdf_and_grad(frozen, g, scene.points, idx, valid,
                                       x, CFG.rbf)
            return jnp.sum((jnp.linalg.norm(gr, axis=-1) - 1.0) ** 2) + \
                jnp.sum(jnp.where(s < 100.0, s, 0.0))

        def eik_pairs(g):
            s, gr = field.sdf_and_grad_pairs(frozen, g, scene.points, idx,
                                             valid, x, CFG.rbf, budget)
            return jnp.sum((jnp.linalg.norm(gr, axis=-1) - 1.0) ** 2) + \
                jnp.sum(jnp.where(s < 100.0, s, 0.0))

        gd = jax.grad(eik_dense)(geo)
        gp = jax.grad(eik_pairs)(geo)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gd),
                                   rtol=1e-3, atol=1e-5)

    def test_pairs_overflow_degrades_gracefully(self, sphere_scene):
        """Overflow drops tail pairs from numerator AND denominator: the
        surviving points' SDF is still a proper weighted average (bounded
        by min/max of their pair SDFs), never a biased sum."""
        scene, params = sphere_scene
        frozen = params["frozen"]
        geo = params["train"]["feats_geometry"]
        x = scene.points[:16] + 0.01
        from spurfies_tpu.ops.voxel_grid import query_grid
        idx, _ = query_grid(x, scene.table, scene.spec, k=CFG.k)
        valid = idx >= 0
        n_valid = int(np.sum(np.asarray(valid)))
        budget = max(n_valid // 2 // 256 * 256, 16)   # force overflow

        s_p, _ = field.sdf_and_grad_pairs(frozen, geo, scene.points, idx,
                                          valid, x, CFG.rbf, budget)
        s_p = np.asarray(s_p)
        covered = s_p < 100.0
        assert covered.any()
        # every covered SDF within the global per-pair SDF envelope
        x_pi = np.asarray(x)[:, None, :] - np.asarray(
            scene.points[np.maximum(np.asarray(idx), 0)])
        pair_s = np.asarray(field.pair_sdf(
            frozen, geo[np.maximum(np.asarray(idx), 0)],
            jnp.asarray(x_pi)))
        lo = pair_s[np.asarray(valid)].min() - 1e-4
        hi = pair_s[np.asarray(valid)].max() + 1e-4
        assert (s_p[covered] >= lo).all() and (s_p[covered] <= hi).all()

    def test_pairs_overflow_keeps_every_point_covered(self, sphere_scene):
        """Column-major compaction: overflow sheds FARTHEST neighbors of
        tail points; as long as budget >= #points-with-neighbors, every
        such point keeps its nearest pair (no holes — the render_budget
        failure mode)."""
        scene, params = sphere_scene
        frozen = params["frozen"]
        geo = params["train"]["feats_geometry"]
        x = scene.points[:32] + 0.01
        from spurfies_tpu.ops.voxel_grid import query_grid
        idx, _ = query_grid(x, scene.table, scene.spec, k=CFG.k)
        valid = idx >= 0
        has_any = int(np.sum(np.asarray(valid).any(axis=-1)))
        n_valid = int(np.sum(np.asarray(valid)))
        budget = max(has_any + 4, n_valid // 3)      # heavy overflow
        assert budget < n_valid

        s_p, _ = field.sdf_and_grad_pairs(frozen, geo, scene.points, idx,
                                          valid, x, CFG.rbf, budget)
        covered = np.asarray(s_p) < 100.0
        assert covered.sum() == has_any

    def test_pairs_fused_matches_vmap(self, sphere_scene):
        """The fused-kernel branch of sdf_and_grad_pairs (interpret mode
        off-TPU) matches the vmap branch."""
        scene, params = sphere_scene
        frozen = params["frozen"]
        geo = params["train"]["feats_geometry"]
        x = scene.points[:16] + 0.008
        from spurfies_tpu.ops.voxel_grid import query_grid
        idx, _ = query_grid(x, scene.table, scene.spec, k=CFG.k)
        valid = idx >= 0
        budget = int(np.sum(np.asarray(valid))) + 8

        s_v, g_v = field.sdf_and_grad_pairs(frozen, geo, scene.points, idx,
                                            valid, x, CFG.rbf, budget)
        field.set_fused_mlp("on", jnp.float32)
        try:
            s_f, g_f = field.sdf_and_grad_pairs(
                frozen, geo, scene.points, idx, valid, x, CFG.rbf, budget)
        finally:
            field.set_fused_mlp("auto", jnp.bfloat16)
        np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_v),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_v),
                                   rtol=1e-3, atol=1e-4)

    def test_color_pairs_match_dense(self, sphere_scene):
        """aggregate_color_pairs == aggregate_color when the budget holds
        all valid pairs, in f32, including gradients w.r.t. latents."""
        scene, params = sphere_scene
        tp = params["train"]
        rng = np.random.default_rng(11)
        x = jnp.concatenate([
            scene.points[:24] + jnp.asarray(
                rng.normal(0, 0.01, (24, 3)).astype(np.float32)),
            jnp.asarray(rng.uniform(0.8, 0.95, (8, 3)).astype(np.float32)),
        ])
        from spurfies_tpu.ops.voxel_grid import query_grid
        idx, _ = query_grid(x, scene.table, scene.spec, k=CFG.k)
        valid = idx >= 0
        dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (x.shape[0], 1))
        budget = int(np.sum(np.asarray(valid))) + 16

        rgb_d = field.aggregate_color(
            tp, tp["feats_color"], scene.points, idx, valid, x, dirs,
            CFG.rbf, compute_dtype=jnp.float32)
        rgb_p = field.aggregate_color_pairs(
            tp, tp["feats_color"], scene.points, idx, valid, x, dirs,
            CFG.rbf, budget, compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(rgb_p), np.asarray(rgb_d),
                                   rtol=1e-4, atol=1e-5)

        def loss_d(feats):
            return jnp.sum(field.aggregate_color(
                tp, feats, scene.points, idx, valid, x, dirs, CFG.rbf,
                compute_dtype=jnp.float32))

        def loss_p(feats):
            return jnp.sum(field.aggregate_color_pairs(
                tp, feats, scene.points, idx, valid, x, dirs, CFG.rbf,
                budget, compute_dtype=jnp.float32))

        gd = jax.grad(loss_d)(tp["feats_color"])
        gp = jax.grad(loss_p)(tp["feats_color"])
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gd),
                                   rtol=1e-3, atol=1e-5)

    def test_color_range(self, sphere_scene):
        scene, params = sphere_scene
        x = scene.points[:8] + 0.005
        from spurfies_tpu.ops.voxel_grid import query_grid
        idx, _ = query_grid(x, scene.table, scene.spec, k=CFG.k)
        dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (8, 1))
        rgb = field.aggregate_color(
            params["train"], params["train"]["feats_color"], scene.points,
            idx, idx >= 0, x, dirs, CFG.rbf,
        )
        assert rgb.shape == (8, 3)
        assert np.all((np.asarray(rgb) >= 0) & (np.asarray(rgb) <= 1))


class TestSampler:
    def test_uniform_bounds(self):
        z = uniform_z_vals(jax.random.PRNGKey(0), 16, 0.5, 4.5, 64, False)
        assert z.shape == (16, 64)
        np.testing.assert_allclose(np.asarray(z[:, 0]), 0.5)
        np.testing.assert_allclose(np.asarray(z[:, -1]), 4.5)
        z2 = uniform_z_vals(jax.random.PRNGKey(0), 16, 0.5, 4.5, 64, True)
        assert np.all(np.diff(np.asarray(z2), axis=-1) > 0)
        assert np.asarray(z2).min() >= 0.5 and np.asarray(z2).max() <= 4.5

    def test_sample_pdf_uniform(self):
        bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 11), (4, 11))
        pdf = jnp.ones((4, 10))
        s = sample_pdf(jax.random.PRNGKey(0), bins, pdf, 21,
                       deterministic=True)
        np.testing.assert_allclose(np.asarray(s[0]),
                                   np.linspace(0, 1, 21), atol=1e-5)

    def test_sample_pdf_concentrates(self):
        bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 11), (1, 11))
        pdf = jnp.zeros((1, 10)).at[:, 5].set(1.0)
        s = sample_pdf(jax.random.PRNGKey(0), bins, pdf, 16,
                       deterministic=True)
        s = np.asarray(s)
        # all but the u=1.0 edge sample land in the hot bin (u=1 maps to the
        # far bin edge — same behavior as the reference searchsorted path)
        assert np.all((s[:, :-1] >= 0.5 - 1e-5) & (s[:, :-1] <= 0.6 + 1e-5))

    @pytest.mark.parametrize("iters,train", [(1, True), (3, False)])
    def test_error_bound_shapes(self, sphere_scene, iters, train):
        scene, params = sphere_scene
        scfg = SamplerConfig(near=0.5, far=4.5)

        def sdf_fn(x, first=False):
            return field.sdf_probe(
                params["frozen"], params["train"]["feats_geometry"], scene,
                x, CFG.k, CFG.r, CFG.rbf, return_overflow=True,
            )

        n = 8
        cam = jnp.tile(jnp.asarray([[0.0, 0.0, -1.5]]), (n, 1))
        dirs = np.tile([0.0, 0.0, 1.0], (n, 1)).astype(np.float32)
        dirs[:, 0] = np.linspace(-0.3, 0.3, n)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        z, _ovf = error_bound_z_vals(
            jax.random.PRNGKey(0), sdf_fn, cam, jnp.asarray(dirs), scfg,
            jnp.asarray(0.1), iters, train,
        )
        assert z.shape == (n, scfg.n_samples + scfg.n_samples_extra + 2)
        z = np.asarray(z)
        assert np.all(np.diff(z, axis=-1) >= 0)
        assert z.min() >= scfg.near - 1e-5 and z.max() <= scfg.far + 1e-5


class TestRenderer:
    def _inputs(self, n=32):
        h = w = 16
        uv = np.stack(np.meshgrid(np.arange(w), np.arange(h)),
                      -1).reshape(-1, 2).astype(np.float32)[:n]
        K = np.eye(4, dtype=np.float32)
        K[0, 0] = K[1, 1] = 20.0
        K[0, 2], K[1, 2] = w / 2, h / 2
        pose = np.eye(4, dtype=np.float32)
        pose[2, 3] = -1.5  # camera at z=-1.5 looking +z
        return {
            "uv": jnp.asarray(uv)[None],
            "intrinsics": jnp.asarray(K)[None],
            "pose": jnp.asarray(pose)[None],
        }

    def test_forward_shapes_and_finiteness(self, sphere_scene):
        scene, params = sphere_scene
        cfg = ModelConfig(ray_sampler=SamplerConfig(near=0.5, far=4.5))
        out = render_rays(params, scene, self._inputs(), jax.random.PRNGKey(0),
                          cfg, train=True, iters=1)
        n = 32
        assert out["rgb_values"].shape == (n, 3)
        assert out["weights"].shape == (n, cfg.max_shading_pts)
        assert out["grad_theta"].shape == (n, cfg.max_shading_pts, 3)
        for k, v in out.items():
            assert np.all(np.isfinite(np.asarray(v))), f"{k} not finite"
        assert np.asarray(out["ray_mask"]).any(), "no ray hit the sphere"

    def test_occ_compact_matches_reference_path(self, sphere_scene):
        """occ_compact selects columns by cell occupancy instead of kNN
        has-neighbor.  Occupancy is a superset, so on a well-populated
        scene the same real columns are selected and the render must agree
        closely with the reference-exact path (over-selected empty columns
        carry zero density)."""
        scene, params = sphere_scene
        inputs = self._inputs()
        key = jax.random.PRNGKey(3)
        base = ModelConfig(ray_sampler=SamplerConfig(near=0.5, far=4.5))
        occ = ModelConfig(ray_sampler=SamplerConfig(near=0.5, far=4.5),
                          occ_compact=True)
        out_a = render_rays(params, scene, inputs, key, base, train=True,
                            iters=1)
        out_b = render_rays(params, scene, inputs, key, occ, train=True,
                            iters=1)
        mask = np.asarray(out_a["ray_mask"]) & np.asarray(out_b["ray_mask"])
        assert mask.any()
        rgb_a = np.asarray(out_a["rgb_values"])[mask]
        rgb_b = np.asarray(out_b["rgb_values"])[mask]
        # same hit rays, near-identical shading: over-selected empty
        # columns carry zero density and the valid-to-valid deltas restore
        # the reference quadrature, so only S-budget saturation (tail
        # columns dropped) can perturb the render
        np.testing.assert_allclose(rgb_b, rgb_a, atol=2e-4)
        np.testing.assert_array_equal(np.asarray(out_a["ray_mask"]),
                                      np.asarray(out_b["ray_mask"]))
        for k, v in out_b.items():
            assert np.all(np.isfinite(np.asarray(v))), f"{k} not finite"

    def test_ray_budget_matches_reference_path(self, sphere_scene):
        """ray_budget_frac compacts the batch to candidate rays before the
        sampler and scatters back.  With a budget that holds every
        candidate, occupied rays must render exactly as the dense path
        does modulo sampler RNG (same key, different batch shape), and
        miss rays must come back as defaults (ray_mask False)."""
        scene, params = sphere_scene
        inputs = self._inputs()
        key = jax.random.PRNGKey(3)
        base = ModelConfig(ray_sampler=SamplerConfig(near=0.5, far=4.5))
        rb = ModelConfig(ray_sampler=SamplerConfig(near=0.5, far=4.5),
                         ray_budget_frac=0.99999)  # rounds up to all rays
        out_a = render_rays(params, scene, inputs, key, base, train=True,
                            iters=1)
        out_b = render_rays(params, scene, inputs, key, rb, train=True,
                            iters=1)
        # same hit set (occupancy is a superset; budget 1.0 drops nothing)
        np.testing.assert_array_equal(np.asarray(out_a["ray_mask"]),
                                      np.asarray(out_b["ray_mask"]))
        for k, v in out_b.items():
            assert np.all(np.isfinite(np.asarray(v))), f"{k} not finite"
        # miss rays come back as defaults
        miss = ~np.asarray(out_b["ray_mask"])
        if miss.any():
            np.testing.assert_array_equal(
                np.asarray(out_b["rgb_values"])[miss], 0.0)
            np.testing.assert_array_equal(
                np.asarray(out_b["weights"])[miss], 0.0)
        # hit rays render the same surface (sampler RNG differs with the
        # batch shape, so allow small quadrature differences)
        mask = np.asarray(out_a["ray_mask"])
        rgb_a = np.asarray(out_a["rgb_values"])[mask]
        rgb_b = np.asarray(out_b["rgb_values"])[mask]
        assert np.abs(rgb_b - rgb_a).max() < 0.1

    def test_ray_budget_gradients_flow(self, sphere_scene):
        scene, params = sphere_scene
        cfg = ModelConfig(ray_sampler=SamplerConfig(near=0.5, far=4.5),
                          ray_budget_frac=0.9)
        inputs = self._inputs()
        gt = jnp.ones((32, 3)) * 0.5

        def loss_fn(tp):
            p = {"frozen": params["frozen"], "train": tp}
            out = render_rays(p, scene, inputs, jax.random.PRNGKey(0), cfg,
                              train=True, iters=1)
            return jnp.mean(jnp.abs(out["rgb_values"] - gt))

        grads = jax.grad(loss_fn)(params["train"])
        flat, _ = jax.tree_util.tree_flatten(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
        assert any(float(np.abs(np.asarray(g)).max()) > 0 for g in flat)

    def test_probe_k_renders_close_to_reference(self, sphere_scene):
        """probe_k shrinks only the SAMPLER's importance probe; the
        rendered SDF/color still use k neighbors, so a k=1 probe changes
        WHERE samples land but must keep the render finite, hit the same
        rays, and stay close on this well-conditioned scene."""
        scene, params = sphere_scene
        inputs = self._inputs()
        key = jax.random.PRNGKey(3)
        base = ModelConfig(ray_sampler=SamplerConfig(near=0.5, far=4.5))
        pk1 = ModelConfig(ray_sampler=SamplerConfig(near=0.5, far=4.5),
                          probe_k=1)
        out_a = render_rays(params, scene, inputs, key, base, train=True,
                            iters=1)
        out_b = render_rays(params, scene, inputs, key, pk1, train=True,
                            iters=1)
        np.testing.assert_array_equal(np.asarray(out_a["ray_mask"]),
                                      np.asarray(out_b["ray_mask"]))
        for k, v in out_b.items():
            assert np.all(np.isfinite(np.asarray(v))), f"{k} not finite"
        mask = np.asarray(out_a["ray_mask"])
        rgb_a = np.asarray(out_a["rgb_values"])[mask]
        rgb_b = np.asarray(out_b["rgb_values"])[mask]
        # samples land differently -> small quadrature differences only
        assert np.abs(rgb_b - rgb_a).max() < 0.1

    def test_occ_compact_gradients_flow(self, sphere_scene):
        scene, params = sphere_scene
        cfg = ModelConfig(ray_sampler=SamplerConfig(near=0.5, far=4.5),
                          occ_compact=True)
        inputs = self._inputs()
        gt = jnp.ones((32, 3)) * 0.5

        def loss_fn(tp):
            p = {"frozen": params["frozen"], "train": tp}
            out = render_rays(p, scene, inputs, jax.random.PRNGKey(0), cfg,
                              train=True, iters=1)
            return jnp.mean(jnp.abs(out["rgb_values"] - gt))

        grads = jax.grad(loss_fn)(params["train"])
        flat, _ = jax.tree_util.tree_flatten(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
        assert np.abs(np.asarray(grads["feats_color"])).max() > 0
        assert np.abs(np.asarray(grads["feats_geometry"])).max() > 0

    def test_eval_mode_normals(self, sphere_scene):
        scene, params = sphere_scene
        cfg = ModelConfig(ray_sampler=SamplerConfig(near=0.5, far=4.5))
        out = render_rays(params, scene, self._inputs(), jax.random.PRNGKey(0),
                          cfg, train=False, iters=2)
        assert "normal_map" in out
        assert np.all(np.isfinite(np.asarray(out["normal_map"])))

    def test_gradients_flow(self, sphere_scene):
        scene, params = sphere_scene
        cfg = ModelConfig(ray_sampler=SamplerConfig(near=0.5, far=4.5))
        inputs = self._inputs()
        gt = jnp.ones((32, 3)) * 0.5

        def loss_fn(tp):
            p = {"frozen": params["frozen"], "train": tp}
            out = render_rays(p, scene, inputs, jax.random.PRNGKey(0), cfg,
                              train=True, iters=1)
            from spurfies_tpu.model.losses import eikonal_loss
            return (
                jnp.mean(jnp.abs(out["rgb_values"] - gt))
                + 0.001 * eikonal_loss(out["grad_theta"], out["valid_pt"])
            )

        grads = jax.grad(loss_fn)(params["train"])
        flat, _ = jax.tree_util.tree_flatten(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
        # latents must receive gradient signal
        assert np.abs(np.asarray(grads["feats_color"])).max() > 0
        assert np.abs(np.asarray(grads["feats_geometry"])).max() > 0

    def test_tv_loss(self, sphere_scene):
        scene, params = sphere_scene
        val = tv_loss(params, scene)
        assert np.isfinite(np.asarray(val))
        assert np.asarray(val) >= 0
        # identical latents -> zero TV
        p2 = {
            "train": {
                **params["train"],
                "feats_geometry": jnp.ones_like(
                    params["train"]["feats_geometry"]
                ),
            }
        }
        np.testing.assert_allclose(np.asarray(tv_loss(p2, scene)), 0.0,
                                   atol=1e-6)
