"""Per-segment timing of the production train step on TPU.

Times each hot-path segment at bench.py shapes (8k points, 1024 rays,
fast=1, k=8, S=80) with scalar-readback sync (block_until_ready returns
early on the tunneled axon backend — NOTES_ROUND1).

    python scripts/profile_step.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf).astype(jnp.float32))


def main():
    from spurfies_tpu.config import Config, ModelConfig, TrainConfig
    from spurfies_tpu.data.synthetic import make_synthetic_scene
    from spurfies_tpu.train.trainer import Trainer
    from spurfies_tpu.ops.voxel_grid import query_grid
    from spurfies_tpu.model import field

    cfg = Config(model=ModelConfig(),
                 train=TrainConfig(num_pixels=1024, fast_iters=1))
    pts, cols, views = make_synthetic_scene(
        n_points=8000, n_views=3, img_res=(192, 256))
    trainer = Trainer(cfg, pts, cols, views)
    scene = trainer.scene
    frozen = trainer.frozen
    tp = trainer.state.params
    mcfg = cfg.model
    report = {}

    # ---- full step window (per-step amortized) ----
    t0 = time.perf_counter()
    trainer.run(100, window=50)
    _sync(trainer.state.params["beta"])
    t0 = time.perf_counter()
    trainer.run(200, window=50)
    _sync(trainer.state.params["beta"])
    report["full_step_ms"] = (time.perf_counter() - t0) / 200 * 1e3

    # representative query points: actual ray samples
    rng = np.random.default_rng(0)
    sel = rng.choice(views["uv"].shape[0], 1024, replace=False)
    uv = jnp.asarray(views["uv"][sel])[None]
    from spurfies_tpu.core.cameras import get_camera_params
    rd, cl = get_camera_params(uv, jnp.asarray(views["pose"][0])[None],
                               jnp.asarray(views["intrinsics"][0])[None])
    rd = rd.reshape(-1, 3)
    cl = jnp.broadcast_to(cl[:, None, :], (1, 1024, 3)).reshape(-1, 3)
    z = jnp.linspace(0.5, 3.0, 128)
    probe_pts = (cl[:, None, :] + z[None, :, None] * rd[:, None, :]
                 ).reshape(-1, 3)                        # [131072, 3]
    M = probe_pts.shape[0]

    # ---- query_grid at probe scale ----
    q = jax.jit(lambda x: query_grid(x, scene.table, scene.spec, k=8))
    report["query_131k_ms"] = timeit(q, probe_pts)

    # ---- pieces of query: gather / dist / topk ----
    from spurfies_tpu.ops.voxel_grid import _cell_ids
    spec = scene.spec

    @jax.jit
    def gather_only(x):
        cid = jnp.where(_cell_ids(x, spec) < spec.num_cells,
                        _cell_ids(x, spec), 0)
        return scene.table.idx[cid], scene.table.pos[cid]

    report["query_gather_ms"] = timeit(gather_only, probe_pts)

    cand, cpos = gather_only(probe_pts)

    @jax.jit
    def dist_only(x, cand, cpos):
        diff = x[:, :, None] - cpos
        d2 = jnp.sum(diff * diff, axis=1)
        ok = (cand >= 0) & (d2 <= 0.0025)
        return jnp.where(ok, d2, jnp.inf)

    report["query_dist_ms"] = timeit(dist_only, probe_pts, cand, cpos)
    d2m = dist_only(probe_pts, cand, cpos)

    @jax.jit
    def topk_only(d2):
        neg, i = jax.lax.top_k(-d2, 8)
        return neg, i

    report["query_topk_ms"] = timeit(topk_only, d2m)

    # ---- sdf_probe (sampler probe path, budgeted) ----
    p = jax.jit(lambda x: field.sdf_probe(frozen, tp["feats_geometry"],
                                          scene, x, 8, 2.0, 45.0))
    report["sdf_probe_131k_ms"] = timeit(p, probe_pts)

    # ---- render-path pieces at 1024x80 ----
    S = mcfg.max_shading_pts
    xr = probe_pts[: 1024 * S]
    idx_r, _ = q(xr)
    valid_r = idx_r >= 0

    sg = jax.jit(lambda i, v, x: field.sdf_and_grad(
        frozen, tp["feats_geometry"], scene.points, i, v, x, 45.0))
    report["sdf_and_grad_82k_ms"] = timeit(sg, idx_r, valid_r, xr)

    col = jax.jit(lambda i, v, x, d: field.aggregate_color(
        tp, tp["feats_color"], scene.points, i, v, x, d, 45.0, 6, 3))
    dirs_r = jnp.broadcast_to(rd[:, None, :], (1024, S, 3)).reshape(-1, 3)
    report["aggregate_color_82k_ms"] = timeit(col, idx_r, valid_r, xr,
                                              dirs_r)

    # ---- color at the IN-STEP shape: top32 x 1024 rays = 32k pts, with
    # backward (the step differentiates color wrt latents + MLP params;
    # the latent cotangent is a 262k-row scatter-add — suspect hot spot)
    MC = 1024 * mcfg.color_top_samples
    xc, idx_c, valid_c = xr[:MC], idx_r[:MC], valid_r[:MC]
    dirs_c = dirs_r[:MC]

    colc = jax.jit(lambda i, v, x, d: field.aggregate_color(
        tp, tp["feats_color"], scene.points, i, v, x, d, 45.0, 6, 3))
    report["color_fwd_32k_ms"] = timeit(colc, idx_c, valid_c, xc, dirs_c)

    def loss_col(train_like):
        rgb = field.aggregate_color(
            train_like, train_like["feats_color"], scene.points, idx_c,
            valid_c, xc, dirs_c, 45.0, 6, 3)
        return jnp.sum(rgb)

    gcol = jax.jit(jax.grad(loss_col))
    report["color_fwdbwd_32k_ms"] = timeit(gcol, tp)

    # scatter-add alone: VJP of the latent gather at color pair count
    seg = jnp.maximum(idx_c, 0).reshape(-1)
    ct = jnp.ones((seg.shape[0], 64), jnp.float32)

    @jax.jit
    def scatter_only(ct):
        return jnp.zeros_like(tp["feats_color"]).at[seg].add(ct)

    report["latent_scatter_262k_ms"] = timeit(scatter_only, ct)

    # ---- k=1 sampler probe variant (nearest-neighbor-only guidance) ----
    p1 = jax.jit(lambda x: field.sdf_probe(frozen, tp["feats_geometry"],
                                           scene, x, 1, 2.0, 45.0))
    report["sdf_probe_k1_131k_ms"] = timeit(p1, probe_pts)

    # backward of sdf_and_grad (eikonal double backprop cost)
    def loss_sg(feats):
        s, g = field.sdf_and_grad(frozen, feats, scene.points, idx_r,
                                  valid_r, xr, 45.0)
        return jnp.sum(s) + jnp.sum(g)

    gsg = jax.jit(jax.grad(loss_sg))
    report["sdf_grad_backward_ms"] = timeit(gsg, tp["feats_geometry"])

    report["rays_per_sec"] = round(1024 / (report["full_step_ms"] / 1e3), 1)
    print(json.dumps({k: round(v, 2) if isinstance(v, float) else v
                      for k, v in report.items()}, indent=1))


if __name__ == "__main__":
    main()
