"""Full production-budget run: 100k steps on the dust3r-statistics scene.

The reference trains 100k steps per scene (config/ours.yaml:7,
train.py:496-546); every gate before round 4 stopped at 30k, leaving
end-of-horizon behavior (cosine floor, beta trajectory, pseudo-loss drift,
15k checkpoint cadence, mid-run resume) unverified (VERDICT r3 #3).  This
runs the real budget with:

  * checkpoints every train.checkpoint_freq (15k) steps,
  * a SIMULATED MID-RUN KILL at --kill-at (default 45k): the Trainer is
    torn down, rebuilt from scratch, and restored from the latest
    checkpoint — the same code path as ``cli/train --resume``,
  * mesh err/bias + masked PSNR evals at --eval-at steps (30/60/100k),
  * per-window step-time, loss, psnr, beta, lr, ray-overflow telemetry,

and writes one JSON artifact.

    python scripts/run_100k.py [--preset quality_beat] [--steps 100000] \
        [--out artifacts/run100k_default.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_trainer(cfg, pts, cols, views, prior):
    from spurfies_tpu.train.trainer import Trainer
    trainer = Trainer(cfg, pts, cols, views)
    if os.path.isdir(prior):
        from spurfies_tpu.prior.pretrain import load_prior
        trainer.load_frozen(load_prior(os.path.abspath(prior)))
    return trainer


def evaluate(trainer, cfg, radius, resolution=128):
    import jax
    import numpy as np

    from spurfies_tpu.core.metrics import psnr as psnr_fn
    from spurfies_tpu.eval.mesh_extract import (calibrate_iso_level,
                                                extract_mesh)
    from spurfies_tpu.model import field

    def sdf_fn(x):
        import jax.numpy as jnp
        return field.sdf_probe(
            trainer.frozen, trainer.state.params["feats_geometry"],
            trainer.scene, jnp.asarray(x), cfg.model.k, cfg.model.r,
            cfg.model.rbf,
        )

    out = {}
    for tag, level in (("", 0.0),
                       ("_auto_iso", None)):
        lv = calibrate_iso_level(trainer.scene.points, sdf_fn) \
            if level is None else level
        verts, _ = extract_mesh(sdf_fn, [-1, -1, -1], [1, 1, 1],
                                resolution=resolution, level=lv)
        if len(verts):
            r = np.linalg.norm(verts, axis=-1)
            out[f"mesh_err{tag}"] = round(float(np.mean(np.abs(r - radius))), 5)
            out[f"mesh_bias{tag}"] = round(float(np.mean(r - radius)), 5)
        else:
            out[f"mesh_err{tag}"] = out[f"mesh_bias{tag}"] = None
        if level is None:
            out["iso_level"] = round(float(lv), 6)

    import numpy as np
    h, w = 192, 256
    view = 0
    ro = trainer.render_image(
        trainer.state.params, np.asarray(trainer.views["uv"]),
        trainer.views["pose"][view], trainer.views["intrinsics"][view],
        jax.random.PRNGKey(0),
    )
    gt = np.asarray(trainer.views["rgb"][view]).reshape(-1, 3)
    mask = np.asarray(trainer.views["mask"][view]).reshape(-1) > 0.5
    pred = ro["rgb_values"]
    mse = float(np.mean((pred[mask] - gt[mask]) ** 2))
    out["masked_psnr"] = round(-10.0 * np.log10(max(mse, 1e-12)), 2)

    # beta-floor diagnostic (r5): on the clean synthetic scene the trained
    # beta anneals to ~|1e-4| where the quadrature can no longer resolve
    # the near-step density (speckle), dropping raw eval PSNR at the
    # horizon even as geometry/color improve.  A render at a resolvable
    # beta separates model quality from quadrature sharpness: measured
    # 43.0 dB @30k -> 43.9 dB @100k (default run) vs 34.3 -> 30.9 raw.
    import jax.numpy as jnp
    p2 = dict(trainer.state.params)
    p2["beta"] = jnp.asarray(0.003, jnp.float32)
    ro2 = trainer.render_image(
        p2, np.asarray(trainer.views["uv"]),
        trainer.views["pose"][view], trainer.views["intrinsics"][view],
        jax.random.PRNGKey(0),
    )
    mse2 = float(np.mean((ro2["rgb_values"][mask] - gt[mask]) ** 2))
    out["masked_psnr_beta3e3"] = round(-10.0 * np.log10(max(mse2, 1e-12)), 2)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100_000)
    ap.add_argument("--preset", default=None)
    ap.add_argument("--kill-at", type=int, default=45_000)
    ap.add_argument("--eval-at", type=int, nargs="+",
                    default=(30_000, 60_000, 100_000))
    ap.add_argument("--window", type=int, default=500)
    ap.add_argument("--prior", default="artifacts/local_prior")
    ap.add_argument("--ckpt-dir", default="/tmp/run100k_ckpts")
    ap.add_argument("--out", default="artifacts/run100k.json")
    ap.add_argument("--resume", action="store_true",
                    help="continue an interrupted run: restore the latest "
                         "checkpoint in --ckpt-dir and append to --out")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    import jax
    import numpy as np

    from spurfies_tpu.config import (Config, ModelConfig, TrainConfig,
                                     apply_overrides)
    from spurfies_tpu.data.synthetic import make_dust3r_like_scene
    from spurfies_tpu.train.optim import cosine_lr

    cfg = Config(model=ModelConfig(),
                 train=TrainConfig(num_pixels=1024, fast_iters=1))
    ovs = list(args.overrides)
    if args.preset:
        ovs = [f"preset={args.preset}"] + ovs
    if ovs:
        cfg = apply_overrides(cfg, ovs)

    radius = 0.8
    pts, cols, views = make_dust3r_like_scene(radius=radius)
    trainer = build_trainer(cfg, pts, cols, views, args.prior)
    sched = cosine_lr(cfg.train.learning_rate, cfg.train.cosine_t_max,
                      cfg.train.cosine_eta_min)

    os.makedirs(args.ckpt_dir, exist_ok=True)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)

    record = {"preset": args.preset, "steps": args.steps,
              "calibrated_ray_budget": trainer.cfg.model.ray_budget_frac,
              "calibrated_probe_budget": trainer.cfg.model.probe_budget_frac,
              "windows": [], "evals": {}, "events": []}

    def ckpt_path(step):
        return os.path.join(args.ckpt_dir, f"step_{step}")

    done = 0
    killed = False
    if args.resume:
        latest = max(
            (int(d.split("_")[1]) for d in os.listdir(args.ckpt_dir)
             if d.startswith("step_")),
            default=None,
        )
        if latest is None:
            raise SystemExit(f"--resume: no checkpoints in {args.ckpt_dir}")
        trainer.restore_checkpoint(ckpt_path(latest))
        done = int(trainer.state.step)
        if os.path.exists(args.out):
            with open(args.out) as f:
                prev = json.load(f)
            record["windows"] = [w for w in prev.get("windows", [])
                                 if w["step"] <= done]
            record["evals"] = {k: v for k, v in prev.get("evals", {}).items()
                               if int(k) <= done}
            record["events"] = prev.get("events", [])
        killed = any("kill+resume" in e.get("event", "")
                     for e in record["events"]) or done >= args.kill_at
        record["events"].append(
            {"step": done, "event": f"host-resume from {latest}"})
        print(f"[run100k] resuming at step {done}", flush=True)
    t_wall = time.perf_counter()
    while done < args.steps:
        w = min(args.window, args.steps - done)
        t0 = time.perf_counter()
        metrics = {}
        trainer.run(w, window=w,
                    callback=lambda s, m: metrics.update(m))
        # force completion for honest wall-clock
        float(np.asarray(trainer.state.params["beta"]))
        dt = time.perf_counter() - t0
        done += w
        step = int(trainer.state.step)
        record["windows"].append({
            "step": step,
            "ms_per_step": round(dt / w * 1e3, 2),
            "loss": round(float(metrics.get("loss", np.nan)), 5),
            "rgb_loss": round(float(metrics.get("rgb_loss", np.nan)), 5),
            "psnr": round(float(metrics.get("psnr", np.nan)), 2),
            "beta": round(float(np.abs(np.asarray(
                trainer.state.params["beta"]))), 5),
            "lr": round(float(sched(step)), 6),
            "ray_overflow": float(metrics.get("ray_overflow", 0.0)),
            "probe_overflow": float(metrics.get("probe_overflow", 0.0)),
            "notfinite": float(metrics.get("notfinite", 0.0)),
        })

        if step % cfg.train.checkpoint_freq == 0 or step == args.steps:
            trainer.save_checkpoint(ckpt_path(step))
            record["events"].append({"step": step, "event": "checkpoint"})

        if not killed and step >= args.kill_at:
            # simulated mid-run kill: rebuild from scratch + restore from
            # the latest checkpoint (cli/train --resume code path)
            latest = max(
                (int(d.split("_")[1]) for d in os.listdir(args.ckpt_dir)
                 if d.startswith("step_")),
                default=None,
            )
            del trainer
            trainer = build_trainer(cfg, pts, cols, views, args.prior)
            trainer.restore_checkpoint(ckpt_path(latest))
            done = int(trainer.state.step)
            killed = True
            record["events"].append({
                "step": step, "event": f"kill+resume from {latest}",
            })
            print(f"[run100k] killed at {step}, resumed from {latest}",
                  flush=True)

        if done in args.eval_at or (done == args.steps
                                    and args.steps not in args.eval_at):
            ev = evaluate(trainer, trainer.cfg, radius)
            record["evals"][str(done)] = ev
            print(f"[run100k] eval@{done}: {ev}", flush=True)

        if len(record["windows"]) % 10 == 0:
            with open(args.out, "w") as f:
                json.dump(record, f, indent=1)

    record["total_wall_s"] = round(time.perf_counter() - t_wall, 1)
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1)
    print(f"[run100k] done in {record['total_wall_s']}s -> {args.out}")


if __name__ == "__main__":
    main()
