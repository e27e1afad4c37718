"""Capture a jax.profiler trace of the production train step and print a
per-op time attribution (parsed from the trace protobuf, no TensorBoard
needed).

    python scripts/trace_step.py [--steps 20] [--overrides ...]
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_trace(logdir: str, top: int = 40, quiet: bool = False):
    """Aggregate device-op durations from the .trace.json.gz perfetto dump.

    Returns {"ops": {name: ms}, "op_counts": {...}, "sources": {src: ms},
    "source_ops": {src: set(op)}, "total_ms": float} so other tools
    (scripts/roofline_table.py) can classify buckets programmatically."""
    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("no trace file found under", logdir)
        return None
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device track pids: find via process_name metadata containing "TPU"
    device_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if "TPU" in name or "/device" in name.lower():
                device_pids.add(e["pid"])
    agg = defaultdict(float)
    cnt = defaultdict(int)
    src_agg = defaultdict(float)
    src_cnt = defaultdict(int)
    src_ops = defaultdict(set)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        agg[name] += dur
        cnt[name] += 1
        total += dur
        a = e.get("args") or {}
        # XLA stamps each device op with the Python frame that traced it
        # ("source": file:line) — aggregate on that too, so anonymous
        # fusion.NNNN names become attributable to model code.
        src = a.get("source")
        if src and not name.startswith(("jit_", "while")):
            src = src.replace("/root/repo/", "")
            src_agg[src] += dur
            src_cnt[src] += 1
            op = a.get("tf_op", "").rsplit("/", 1)[-1].rstrip(":")
            if op:
                src_ops[src].add(op)
    result = {"ops": dict(agg), "op_counts": dict(cnt),
              "sources": dict(src_agg), "source_ops": dict(src_ops),
              "total_ms": total}
    if quiet:
        return result
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:top]
    print(f"{'op':<72} {'ms':>9} {'n':>6} {'%':>6}")
    for name, ms in rows:
        print(f"{name[:72]:<72} {ms:9.2f} {cnt[name]:6d} "
              f"{100 * ms / max(total, 1e-9):6.1f}")
    print(f"total device ms: {total:.1f}")
    if src_agg:
        print(f"\n{'source (leaf-op attribution)':<60} {'ms':>9} {'n':>6} "
              f"{'%':>6}  ops")
        for src, ms in sorted(src_agg.items(), key=lambda kv: -kv[1])[:top]:
            ops = ",".join(sorted(src_ops[src])[:4])
            print(f"{src[:60]:<60} {ms:9.2f} {src_cnt[src]:6d} "
                  f"{100 * ms / max(total, 1e-9):6.1f}  {ops[:40]}")
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--scene", default="dust3r")
    ap.add_argument("--logdir", default="/tmp/spurfies_trace")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    import jax

    from spurfies_tpu.config import (Config, ModelConfig, TrainConfig,
                                     apply_overrides)
    from spurfies_tpu.data.synthetic import (make_dust3r_like_scene,
                                             make_synthetic_scene)
    from spurfies_tpu.train.trainer import Trainer
    from spurfies_tpu.utils.profiling import trace

    cfg = Config(model=ModelConfig(),
                 train=TrainConfig(num_pixels=1024, fast_iters=1))
    if args.overrides:
        cfg = apply_overrides(cfg, args.overrides)
    scene = (make_dust3r_like_scene() if args.scene == "dust3r" else
             make_synthetic_scene(n_points=8000, n_views=3,
                                  img_res=(192, 256)))
    trainer = Trainer(cfg, *scene)
    trainer.run(300, window=args.steps)       # warm + converge sampling
    float(trainer.state.params["beta"])

    with trace(args.logdir):
        trainer.run(args.steps, window=args.steps)
        float(trainer.state.params["beta"])

    parse_trace(args.logdir)
    print(f"\n(per-step = total / {args.steps} steps)")


if __name__ == "__main__":
    main()
