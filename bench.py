"""Benchmark harness: rays/sec/chip during per-scene optimization.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no throughput numbers; the baseline constant below
is DERIVED FROM MEASUREMENT (BASELINE.md "Measured baseline (round 2)"):
the reference's own train-step code was run on CPU via
scripts/bench_reference.py (1.159 TFLOP/step by FlopCounterMode, 1981 aten
ops/step), then extrapolated to the reference's documented hardware class
(torch 2.0 fp32 eager, RTX 3090/A100) with a matmul + eager-overhead + kNN
model => ~8-11k rays/s; 8.0e3 is the central value, generous to the
reference.

Production-shaped workload: 1024 rays/step, error-bound sampler fast=1
(training setting, train.py:345), 128-sample probe, k=8 neighbors,
max_shading_pts=80 — the exact hot loop of SURVEY §3.1.
"""

import json
import time

import jax
import numpy as np

BASELINE_RAYS_PER_SEC = 8.0e3


def _time_scene(pts, cols, views):
    from spurfies_tpu.config import Config, ModelConfig, TrainConfig
    from spurfies_tpu.train.trainer import Trainer
    from spurfies_tpu.utils.flops import peak_tflops, train_step_flops

    cfg = Config(
        model=ModelConfig(),          # reference production knobs
        train=TrainConfig(num_pixels=1024, fast_iters=1),
    )
    trainer = Trainer(cfg, pts, cols, views)

    def sync():
        # scalar host readback: block_until_ready returns early on the
        # tunneled axon backend; a readback is a true device sync
        return float(trainer.state.params["beta"])

    window = 50
    # warmup + compile (same window size as the timed run: one compile),
    # then 300 steps so the measured regime has converged sampling patterns
    # (gather locality is data-dependent; fresh scenes measure faster)
    trainer.run(300, window=window)
    sync()

    n_steps = 200
    t0 = time.perf_counter()
    trainer.run(n_steps, window=window)
    sync()
    dt = time.perf_counter() - t0

    # MFU: analytic model FLOPs (utils/flops.py; trainer.cfg carries the
    # resolved auto budgets) over measured wall, vs bf16 peak
    flops = train_step_flops(trainer.cfg)
    tflops = flops * n_steps / dt / 1e12
    peak = peak_tflops(jax.devices()[0].device_kind)
    return {
        "rays_per_sec": n_steps * cfg.train.num_pixels / dt,
        "step_model_tflop": flops / 1e12,
        "tflops": tflops,
        "mfu": tflops / peak,
    }


def main():
    from spurfies_tpu.data.synthetic import (
        make_dust3r_like_scene,
        make_synthetic_scene,
    )

    # Primary scene: DUSt3R-statistics cloud (VERDICT r2 #8) — partial
    # coverage, depth-noise shell, FPS-subsampled to the reference's 0.025
    # spacing (dust3r_inference.py:69-105).  This is the production-shaped
    # workload; the clean uniform sphere (r1/r2 primary) is kept as a
    # secondary number for round-over-round continuity.
    d_pts, d_cols, d_views = make_dust3r_like_scene()
    dust3r = _time_scene(d_pts, d_cols, d_views)

    s_pts, s_cols, s_views = make_synthetic_scene(
        n_points=8000, n_views=3, img_res=(192, 256)
    )
    sphere = _time_scene(s_pts, s_cols, s_views)

    print(json.dumps({
        "metric": "train_rays_per_sec_per_chip",
        "value": round(dust3r["rays_per_sec"], 1),
        "unit": "rays/s",
        "vs_baseline": round(dust3r["rays_per_sec"] / BASELINE_RAYS_PER_SEC,
                             3),
        "scene": "dust3r_like",
        "sphere_rays_per_sec": round(sphere["rays_per_sec"], 1),
        "n_points": int(len(d_pts)),
        # whole-step efficiency (VERDICT r4 #5): analytic model TFLOP per
        # step, achieved TFLOP/s, and fraction of the chip's bf16 peak
        "step_model_tflop": round(dust3r["step_model_tflop"], 4),
        "tflops": round(dust3r["tflops"], 2),
        "mfu": round(dust3r["mfu"], 4),
    }))


if __name__ == "__main__":
    main()
