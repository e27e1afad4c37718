"""Weak-scaling / ICI-efficiency estimate for the data-parallel train step.

Real multi-chip hardware is absent from this container (the driver
validates the sharded graph on a virtual CPU mesh instead), so the
scaling story for the day a v5e-8 shows up is a MODEL with measured
inputs (VERDICT r4 weak #7):

  * gradient all-reduce bytes — counted from the real trainable pytree
    of a production-shape Trainer (latents [N,96] + color MLPs + beta;
    the frozen prior nets take no gradient),
  * per-chip step compute time — the committed single-chip bench number,
  * ICI parameters — v5e public specs (each chip: 4 ICI links at
    ~50 GB/s/dir; 2D torus; ring all-reduce moves 2*(n-1)/n * bytes).

The model matches SURVEY §5's design: per-scene state is tiny, so params
replicate and rays shard; the ONLY cross-chip traffic is the gradient
psum (XLA inserts it over ICI), fully overlappable with the tail of the
backward in principle — the estimate below is conservative (no overlap).

    JAX_PLATFORMS=cpu python scripts/ici_scaling_model.py \
        [--step-ms 19.7] [--out artifacts/ici_scaling_r05.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e ICI: 4 links/chip, ~50 GB/s per direction per link (public "How to
# Scale Your Model" v5e figures: 1600 Gbit/s aggregate one-way per chip).
ICI_BYTES_PER_S_PER_CHIP = 200e9     # one-way aggregate
ICI_LATENCY_S = 1e-6                 # per-hop software+link latency


def grad_bytes():
    import jax
    import numpy as np

    from spurfies_tpu.config import Config, ModelConfig, TrainConfig
    from spurfies_tpu.data.synthetic import make_dust3r_like_scene
    from spurfies_tpu.train.trainer import Trainer

    pts, cols, views = make_dust3r_like_scene()
    cfg = Config(model=ModelConfig(),
                 train=TrainConfig(num_pixels=1024, fast_iters=1))
    trainer = Trainer(cfg, pts, cols, views)
    sizes = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(
            trainer.state.params)[0]:
        name = jax.tree_util.keystr(path)
        sizes[name] = int(np.prod(leaf.shape)) * 4       # f32 grads
    return sizes


def model(step_ms, sizes, ns=(1, 2, 4, 8, 16)):
    total = sum(sizes.values())
    rows = []
    for n in ns:
        if n == 1:
            ar_ms = 0.0
        else:
            # bidirectional ring over the torus: 2*(n-1)/n of the payload
            # crosses each chip boundary; v5e torus gives every chip its
            # full ICI bandwidth for the ring
            ar_ms = (2 * (n - 1) / n * total / ICI_BYTES_PER_S_PER_CHIP
                     + 2 * (n - 1) * ICI_LATENCY_S) * 1e3
        step = step_ms + ar_ms
        rows.append({
            "chips": n,
            "allreduce_ms": round(ar_ms, 4),
            "step_ms": round(step, 3),
            "weak_scaling_eff": round(step_ms / step, 4),
            "rays_per_s": round(n * 1024 / step * 1e3, 1),
        })
    return total, rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--step-ms", type=float, default=None,
                    help="single-chip ms/step (default: from BENCH_r04 "
                    "or the latest committed bench)")
    ap.add_argument("--out", default="artifacts/ici_scaling_r05.json")
    args = ap.parse_args()

    step_ms = args.step_ms
    if step_ms is None:
        # derive from the last committed bench JSON (rays/s at 1024/step)
        for name in ("BENCH_r05.json", "BENCH_r04.json"):
            if os.path.exists(name):
                with open(name) as f:
                    b = json.load(f)
                val = b.get("parsed", b).get("value") or b["parsed"]["value"]
                step_ms = 1024 / float(val) * 1e3
                break

    sizes = grad_bytes()
    total, rows = model(step_ms, sizes)
    out = {
        "single_chip_step_ms": round(step_ms, 3),
        "grad_bytes_total": total,
        "grad_bytes_by_param": sizes,
        "ici_bw_bytes_per_s": ICI_BYTES_PER_S_PER_CHIP,
        "model": "bidirectional ring allreduce, zero overlap "
                 "(conservative); payload = trainable grads f32",
        "scaling": rows,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["scaling"], indent=1))
    print(f"total grad payload: {total/1e6:.2f} MB -> {args.out}")


if __name__ == "__main__":
    main()
