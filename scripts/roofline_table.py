"""Join a fresh train-step trace against the standalone device floors
(scripts/micro_floors.py) and emit the per-bucket roofline table
(VERDICT r4 #1 "done" criterion: every remaining ms at >=70% of its own
roofline, or an attributed residual).

Pipeline:
  1. capture (or reuse) a jax.profiler trace of the production step
     (same flow as scripts/trace_step.py);
  2. map every device op's ``source`` (file:line) to its enclosing
     Python function via ast, and aggregate per (file, function);
  3. classify (file, function) rows into the NOTES buckets;
  4. join each bucket with its measured standalone floor from
     micro_floors.json and report measured_ms, floor_ms, pct_of_floor.

    python scripts/micro_floors.py --out /tmp/micro_floors.json
    python scripts/roofline_table.py --capture \
        --floors /tmp/micro_floors.json --out artifacts/roofline_r05.json
"""

import argparse
import ast
import json
import os
import re
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from trace_step import parse_trace  # noqa: E402


def _func_spans(path):
    """[(start, end, qualname)] for every def in the file."""
    try:
        with open(path) as f:
            tree = ast.parse(f.read())
    except (OSError, SyntaxError):
        return []
    spans = []

    def walk(node, prefix=""):
        for child in ast.iter_child_nodes(node):
            if isinstance(child, (ast.FunctionDef, ast.AsyncFunctionDef)):
                name = prefix + child.name
                spans.append((child.lineno, child.end_lineno, name))
                walk(child, name + ".")
            else:
                walk(child, prefix)

    walk(tree)
    # innermost span wins -> sort by size so later lookups pick smallest
    spans.sort(key=lambda s: s[1] - s[0])
    return spans


_SPAN_CACHE = {}


def src_to_func(src):
    """'spurfies_tpu/model/field.py:455' -> ('field.py', 'gather_pair_rows')."""
    m = re.match(r"(.+\.py):(\d+)", src)
    if not m:
        return src, "?"
    rel, line = m.group(1), int(m.group(2))
    path = rel if os.path.isabs(rel) else os.path.join(REPO, rel)
    if path not in _SPAN_CACHE:
        _SPAN_CACHE[path] = _func_spans(path)
    for start, end, name in _SPAN_CACHE[path]:
        if start <= line <= end:
            return os.path.basename(rel), name
    return os.path.basename(rel), "<module>"


# ---- bucket rules: first (file_substr, func_regex) match wins ----------
RULES = [
    ("pallas_mlp.py", r"_fused_agg_bwd_call|_agg_bwd", "agg_bwd_kernel"),
    ("pallas_mlp.py", r"_fused_value_agg_call", "value_agg_kernel"),
    ("pallas_mlp.py", r"_fused_agg_call|_mlp_kernel_agg", "agg_fwd_kernel"),
    ("pallas_mlp.py", r"_value_call|_value_kernel", "value_kernel"),
    ("pallas_mlp.py", r".*", "mlp_kernel_misc"),
    ("pallas_scatter.py", r".*", "latent_scatter"),
    ("pallas_select.py", r".*", "select_kernel"),
    # JAX stamps backward ops with the FORWARD call-site's traceback, so
    # the fused-agg bwd kernel + bank reduce land on _sdf_and_grad_fused
    # (the pair_sdf_aggregate call at field.py:398), not on the vjp fn.
    ("field.py", r"_pair_agg_vjp_bwd|_gather_rows_bwd|_gather_latents_bwd|"
     r"_sdf_and_grad_fused", "agg_bwd_kernel"),
    # _agg_fwd_impl's device ops are the [532k, 35] pair-table gather +
    # concats feeding the fused kernel
    ("field.py", r"gather_pair_rows|_gather_rows|gather_latents|"
     r"aggregate_color_pairs|aggregate_color|_agg_fwd_impl",
     "pair_gather_color"),
    ("field.py", r"sdf_probe|_aggregate_sdf_value_agg|compact_pair_slots",
     "probe_pipeline"),
    ("field.py", r".*", "field_misc"),
    ("networks.py", r".*", "color_mlp"),
    ("voxel_grid.py", r".*", "voxel_query"),
    ("sampler.py", r".*", "sampler"),
    ("renderer.py", r"tv_loss|cloud_anchor_loss", "tv_anchor"),
    ("renderer.py", r".*", "renderer_misc"),
    ("embedder.py", r".*", "renderer_misc"),
    ("density.py", r".*", "renderer_misc"),
    ("losses.py", r".*", "losses"),
    ("trainer.py", r".*", "scan_optimizer"),
    ("optim.py", r".*", "scan_optimizer"),
]


def classify(fname, func):
    for file_sub, func_re, bucket in RULES:
        if file_sub in fname and re.search(func_re, func):
            return bucket
    return "other"


# Documented basis for buckets without a standalone floor measurement
# (r4/r5 NOTES trace ledgers + micro scripts; see NOTES_ROUND5.md).
BUCKET_NOTES = {
    "voxel_query": "random-row candidate-table gathers "
                   "([C,3,qcap] SoA), transaction-bound like "
                   "pair_gather (micro_gather.py rates)",
    "select_kernel": "packed-key select kernel + its input transposes; "
                     "the transpose is a bandwidth-bound relayout "
                     "feeding the 10x-faster transposed kernel "
                     "(r4 negative result: un-transposed kernel)",
    "scan_optimizer": "lax.scan window machinery: batch slicing, "
                      "carry copies, Adam update (~800 tiny fusions); "
                      "shrunk 1.95 -> 1.27 -> 1.46 ms across r5 "
                      "(scan-carry metrics; remainder is optimizer "
                      "+ per-step copies at HBM bandwidth)",
    "renderer_misc": "quadrature + compaction takes/puts, "
                     "bandwidth-bound elementwise over [R,S]",
    "probe_pipeline": "blocked cumsum + compaction for the sampler "
                      "probe (cumsum_1d made it ~bandwidth, was 31 ms "
                      "pre-r4)",
    "tv_anchor": "graph-TV + cloud-anchor losses: latent-table "
                 "gathers + reduces, bandwidth-bound",
    "sampler": "error-bound beta bisection + inverse-CDF "
               "compare-reduces (post sample_pdf fusion)",
}


# Floor spec per bucket: (floor expression over floors dict F + anchors,
# basis note).  Kernel floors are profiler DEVICE times of the same
# pallas call at the same static shapes (micro_floors.timeit_device);
# gather/scatter floors are scan-harness times on UNIFORM-RANDOM rows —
# worst-case, so in-step buckets with voxel-sorted index locality can
# legitimately beat them (>100%).
def floor_specs(fl, counts_per_step):
    F = fl["floors_ms"]
    return {
        "agg_fwd_kernel": (
            F["agg_fwd_kernel"] + F.get("agg_fwd_pseudo_kernel", 0.0),
            "device time of the same fused-agg kernel at [532480, 35] "
            "(render) + the small pseudo-sdf pass at the cloud points"),
        "value_agg_kernel": (
            F["value_agg_kernel"],
            "device time of the fused value+agg kernel at the CALIBRATED "
            "first-probe budget (11520 x K pairs)"),
        "agg_bwd_kernel": (
            F["agg_bwd_incl_scatter"],
            "scanned fwd+bwd minus fwd via the custom-vjp path "
            "(VMEM dynamic-add serialization floor ~4.3 ns/pair-row)"),
        "color_mlp": (
            F["color_mlp_fwd_bwd"],
            f"scanned color-stack grad at bench shapes "
            f"(bandwidth-bound vs {fl['anchor_hbm_gbps']} GB/s anchor)"),
        "pair_gather_color": (
            F["geo_pair_gather"] + F["color_pair_gather"],
            "standalone random-row gathers at [532k,35]+[213k,67] "
            "(transaction-bound, uniform-random rows = worst case)"),
        "latent_scatter": (
            F["color_scatter"],
            "standalone banked VMEM scatter [213k,64]->[N,64] "
            "(uniform-random rows = worst case)"),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--floors", default="/tmp/micro_floors.json")
    ap.add_argument("--logdir", default="/tmp/spurfies_trace")
    ap.add_argument("--capture", action="store_true")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--out", default=os.path.join(
        REPO, "artifacts", "roofline_r05.json"))
    args = ap.parse_args()

    with open(args.floors) as f:
        fl = json.load(f)

    if args.capture:
        from spurfies_tpu.config import Config, ModelConfig, TrainConfig
        from spurfies_tpu.data.synthetic import make_dust3r_like_scene
        from spurfies_tpu.train.trainer import Trainer
        from spurfies_tpu.utils.profiling import trace

        cfg = Config(model=ModelConfig(),
                     train=TrainConfig(num_pixels=1024, fast_iters=1))
        trainer = Trainer(cfg, *make_dust3r_like_scene())
        trainer.run(300, window=args.steps)
        float(trainer.state.params["beta"])
        with trace(args.logdir):
            trainer.run(args.steps, window=args.steps)
            float(trainer.state.params["beta"])

    tr = parse_trace(args.logdir, quiet=True)
    if tr is None:
        sys.exit("no trace; pass --capture")

    per_bucket = defaultdict(float)
    per_bucket_srcs = defaultdict(lambda: defaultdict(float))
    for src, ms in tr["sources"].items():
        fname, func = src_to_func(src)
        bucket = classify(fname, func)
        per_bucket[bucket] += ms / args.steps
        per_bucket_srcs[bucket][f"{fname}:{func}"] += ms / args.steps

    # parse_trace's total_ms double-counts the while-loop / jit wrapper
    # events, whose durations INCLUDE their children; the per-leaf-op
    # source attribution is the real device time.  step_ms therefore
    # comes from the attributed sum (cross-check: 19.4 ms/step here vs
    # 20.1 ms/step wall in bench.py — the ~0.7 ms gap is host dispatch).
    attributed = sum(tr["sources"].values())
    wrapper_ms = (tr["total_ms"] - attributed) / args.steps

    specs = floor_specs(fl, {})
    step_ms = attributed / args.steps
    rows = []
    floored_ms = 0.0
    floor_sum = 0.0
    for bucket, ms in sorted(per_bucket.items(), key=lambda kv: -kv[1]):
        row = {"bucket": bucket, "measured_ms": round(ms, 3)}
        if bucket in specs:
            floor, basis = specs[bucket]
            row["floor_ms"] = round(floor, 3)
            row["pct_of_floor"] = round(100 * floor / ms, 1) if ms else None
            row["basis"] = basis
            floored_ms += ms
            floor_sum += floor
        elif bucket in BUCKET_NOTES:
            row["basis"] = BUCKET_NOTES[bucket]
        row["top_sources"] = dict(sorted(
            per_bucket_srcs[bucket].items(), key=lambda kv: -kv[1])[:4])
        rows.append(row)

    out = {
        "device": fl["device"],
        "anchors": {"hbm_gbps": fl["anchor_hbm_gbps"],
                    "bf16_tflops": fl["anchor_bf16_tflops"]},
        "trace_steps": args.steps,
        "step_ms": round(step_ms, 2),
        "wrapper_overlap_ms": round(wrapper_ms, 3),
        "floored_fraction_of_step": round(floored_ms / step_ms, 3),
        "floor_sum_ms": round(floor_sum, 3),
        "floor_efficiency_pct": round(100 * floor_sum / floored_ms, 1),
        "buckets": rows,
        "floors_file": fl,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)

    print(f"step: {step_ms:.2f} ms attributed "
          f"(+{wrapper_ms:.2f} ms wrapper overlap, excluded)")
    print(f"{'bucket':<22} {'ms':>7} {'floor':>7} {'%SoL':>6}  basis")
    for r in rows:
        print(f"{r['bucket']:<22} {r['measured_ms']:7.2f} "
              f"{r.get('floor_ms', float('nan')):7.2f} "
              f"{r.get('pct_of_floor', float('nan')):6.1f}  "
              f"{r.get('basis', '')[:60]}")
    print(f"floored buckets: {floored_ms:.2f} ms of {step_ms:.2f}; "
          f"sum-of-floors {floor_sum:.2f} -> efficiency "
          f"{100 * floor_sum / floored_ms:.0f}%")
    print("->", args.out)


if __name__ == "__main__":
    main()
