"""Standalone device floors for every hot train-step bucket (roofline
evidence, VERDICT r4 #1).

Each entry times the SAME operation the step's trace bucket performs —
same shapes, same dtypes, same kernel — but standalone, on ideal
(contention-free) inputs.  Together with two device anchors (achievable
HBM copy bandwidth + achievable bf16 matmul peak) this turns the NOTES
roofline claims into a measured artifact: scripts/roofline_table.py
joins these floors against a fresh trace and emits
artifacts/roofline_r05.json.

TIMING: the axon tunnel adds ~2 ms dispatch latency per device call
(measured: a 512 MB HBM copy "reads" 196 GB/s plain-called vs the 819
GB/s spec), so each op is timed as R iterations of a lax.scan inside ONE
jit call.  The scan carry perturbs one (small) float input by +0.0 each
iteration — numerically a no-op, but it defeats XLA's loop-invariant
hoisting/CSE so every iteration really executes.  A null-scan dispatch
is timed and subtracted.

Shapes default to the bench workload (dust3r-statistics scene, 1024
rays -> rk=832 kept, S=80, K=8, N=6040 points; color top-32).

    python scripts/micro_floors.py [--out /tmp/micro_floors.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

R_ITERS = 16
_NULL_MS = 0.0  # per-call dispatch overhead, set in main()


def _timeit_calls(fn, *args, n=10, warmup=2):
    """Wall ms per plain call (includes dispatch)."""
    for _ in range(warmup):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].ravel()[:1]
                  .astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].ravel()[:1]
                  .astype(jnp.float32)))
    return (time.perf_counter() - t0) / n * 1e3


def timeit(fn, *args, perturb=0, n=8, r=R_ITERS):
    """ms per op: r scanned iterations per dispatch, n dispatches.

    ``perturb``: index of a float-array argument that gets ``+ carry``
    (carry == 0.0 at runtime) each iteration; pick a SMALL input so the
    extra elementwise pass is negligible vs the op under test.
    """
    def runner(*a):
        def body(c, _):
            aa = list(a)
            aa[perturb] = aa[perturb] + c.astype(aa[perturb].dtype)
            out = fn(*aa)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return leaf.ravel()[0].astype(jnp.float32) * 1e-30, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=r)
        return c
    jr = jax.jit(runner)
    for _ in range(2):
        float(jr(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        float(jr(*args))
    dt = (time.perf_counter() - t0) / n * 1e3
    return max(dt - _NULL_MS, 0.0) / r


def timeit_device(fn, *args, n=10, warmup=2, logdir="/tmp/floor_trace"):
    """Per-call DEVICE time via the profiler: (total_device_ms, by_op).

    Times n plain enqueued calls under a jax.profiler trace and sums the
    device-op durations, excluding the jit_* wrapper events (whose
    durations include their children).  Unlike the scan harness this
    excludes host dispatch EXACTLY, and the by_op breakdown separates
    the kernel proper from XLA's input-staging copies — the scan
    harness charged both to the op (r5 finding: the fused-agg "floor"
    read 5.05 ms of which only 3.52 was the kernel; 1.2 was relayout
    copies the production step never pays because its inputs are
    produced in-layout).
    """
    import shutil

    from trace_step import parse_trace
    from spurfies_tpu.utils.profiling import trace

    for _ in range(warmup):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].ravel()[:1]
                  .astype(jnp.float32)))
    shutil.rmtree(logdir, ignore_errors=True)
    with trace(logdir):
        for _ in range(n):
            out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].ravel()[:1]
                      .astype(jnp.float32)))
    r = parse_trace(logdir, quiet=True)
    by_op = {}
    total = 0.0
    for name, ms in r["ops"].items():
        if name.startswith(("jit_", "while")):
            continue
        by_op[name] = round(ms / n, 3)
        total += ms / n
    return total, dict(sorted(by_op.items(), key=lambda kv: -kv[1]))


def main():
    global _NULL_MS
    ap = argparse.ArgumentParser()
    ap.add_argument("--rk", type=int, default=832)
    ap.add_argument("--s", type=int, default=80)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--n-points", type=int, default=6040)
    ap.add_argument("--color-top", type=int, default=32)
    ap.add_argument("--probe-rows", type=int, default=11520,
                    help="probe budget points (bp); pairs = bp * k. "
                    "Default = the bench scene's CALIBRATED first-probe "
                    "budget (832 rays x 128 z x 0.1086 occupancy, "
                    "128-aligned), not the legacy 0.25 fraction")
    ap.add_argument("--out", default="/tmp/micro_floors.json")
    args = ap.parse_args()

    from spurfies_tpu.config import ModelConfig
    from spurfies_tpu.core.embedder import encoding_dim
    from spurfies_tpu.model.networks import init_model_params, mlp_apply
    from spurfies_tpu.ops import pallas_mlp as pm
    from spurfies_tpu.ops.pallas_scatter import scatter_add_rows

    key = jax.random.PRNGKey(0)
    N = args.n_points
    M_geo = args.rk * args.s * args.k          # render-path pairs
    M_col = args.rk * args.color_top * args.k  # color-path pairs
    M_val = args.probe_rows * args.k           # probe value pairs
    out = {"shapes": {"rk": args.rk, "S": args.s, "K": args.k, "N": N,
                      "geo_pairs": M_geo, "color_pairs": M_col,
                      "value_pairs": M_val},
           "device": str(jax.devices()[0].device_kind),
           "r_iters": R_ITERS, "floors_ms": {}}
    F = out["floors_ms"]

    # ---- dispatch overhead (null scan) ----------------------------------
    zero = jnp.zeros((8, 128), jnp.float32)
    _NULL_MS = 0.0
    null_ms = _timeit_calls(jax.jit(lambda x: x + 1.0), zero, n=20)
    _NULL_MS = null_ms
    out["dispatch_ms"] = round(null_ms, 3)
    print(f"dispatch overhead (tiny jit call): {null_ms:.3f} ms")

    # ---- device anchors ------------------------------------------------
    big = jnp.zeros((64 * 1024 * 1024,), jnp.float32)          # 256 MB
    ms = timeit(lambda x: x + 1.0, big, perturb=0, n=4)
    bw = 2 * big.nbytes / (ms / 1e3) / 1e9
    out["anchor_hbm_gbps"] = round(bw, 1)
    print(f"anchor: HBM copy {ms:.3f} ms -> {bw:.0f} GB/s (r+w)")

    a = jax.random.normal(key, (8192, 8192), jnp.bfloat16)
    b = jax.random.normal(key, (8192, 8192), jnp.bfloat16)
    ms = timeit(lambda a, b: a @ b, a, b, perturb=1, n=4, r=8)
    tf = 2 * 8192**3 / (ms / 1e3) / 1e12
    out["anchor_bf16_tflops"] = round(tf, 1)
    print(f"anchor: bf16 8192^3 matmul {ms:.3f} ms -> {tf:.0f} TF/s")

    # ---- random-row gathers (transaction-bound buckets) ----------------
    for name, rows, width in (("geo_pair_gather", M_geo, 35),
                              ("color_pair_gather", M_col, 67)):
        table = jax.random.normal(key, (N + 1, width), jnp.float32)
        idx = jax.random.randint(key, (rows,), 0, N, jnp.int32)
        ms = timeit(lambda t, i: t[i], table, idx, perturb=0)
        F[name] = round(ms, 3)
        print(f"{name}: [{rows},{width}] f32  {ms:.3f} ms "
              f"({ms * 1e6 / rows:.2f} ns/row)")

    # ---- banked VMEM scatter-adds (serialization-bound buckets) --------
    # perturb passes over ct (68/55 MB r+w ~= 0.2 ms at spec BW) — small
    # vs the multi-ms scatter, and makes the floor CONSERVATIVE.
    for name, rows, width in (("geo_scatter", M_geo, 32),
                              ("color_scatter", M_col, 64)):
        ct = jax.random.normal(key, (rows, width), jnp.float32)
        idx = jax.random.randint(key, (rows,), 0, N, jnp.int32)
        ms = timeit(lambda c, i: scatter_add_rows(c, i, N), ct, idx,
                    perturb=0)
        F[name] = round(ms, 3)
        print(f"{name}: [{rows},{width}] f32 -> [{N},{width}]  {ms:.3f} ms "
              f"({ms * 1e6 / rows:.2f} ns/row)")

    # ---- fused geometry kernels (compute-bound buckets) -----------------
    cfg = ModelConfig()
    params = init_model_params(key, cfg)
    frozen = params["frozen"]
    ws, bs, n_act = pm._prep_layers(frozen, jnp.bfloat16)
    d = cfg.feature_vector_size // 2

    def mk_inputs(pairs):
        m = pairs // args.k
        g = jax.random.normal(key, (pairs, d + 3), jnp.float32) * 0.1
        x = jax.random.normal(key, (m, 3), jnp.float32) * 0.5
        return g, x

    from spurfies_tpu.utils.flops import _mlp_flops
    up = _mlp_flops([d + 3, 256, 256, 256, 256, 1])
    down = _mlp_flops([256, 256, 256, 256, d + 3])

    interp = jax.default_backend() != "tpu"

    def agg_call(g, x):
        return pm._fused_agg_call(g, x, ws, bs, args.k, 100.0,
                                  compute_dtype=jnp.bfloat16,
                                  n_act=n_act, interpret=interp)

    g, x = mk_inputs(M_geo)
    ms, by_op = timeit_device(jax.jit(agg_call), g, x)
    kms = max((v for k, v in by_op.items() if "agg" in k or "custom" in k),
              default=ms)
    F["agg_fwd_kernel"] = round(kms, 3)
    F["agg_fwd_staging_copies"] = round(ms - kms, 3)
    tfl = M_geo * (up + down) / 1e12
    out["agg_fwd_tflop"] = round(tfl, 4)
    print(f"agg_fwd_kernel: {kms:.3f} ms device ({ms - kms:.3f} ms staging "
          f"copies excluded)  {tfl / (kms / 1e3):.0f} TF/s "
          f"({100 * tfl / (kms / 1e3) / out['anchor_bf16_tflops']:.0f}% of "
          f"measured-peak model flops; the [*,35]x[35,256] up-projection "
          f"pads 35 lanes to 128 on the MXU)")

    # pseudo-sdf loss runs a second, small agg pass at the cloud points
    m_pseudo = -(-args.n_points // 128) * 128 * args.k
    gp, xp_ = mk_inputs(m_pseudo)
    ms, by_op = timeit_device(jax.jit(agg_call), gp, xp_)
    kms = max((v for k, v in by_op.items() if "agg" in k or "custom" in k),
              default=ms)
    F["agg_fwd_pseudo_kernel"] = round(kms, 3)
    print(f"agg_fwd_pseudo_kernel ({m_pseudo} pairs): {kms:.3f} ms device")

    gv, xv = mk_inputs(M_val)
    ms, by_op = timeit_device(jax.jit(
        lambda g, x: pm._fused_value_agg_call(
            g, x, ws, bs, args.k, 100.0, compute_dtype=jnp.bfloat16,
            n_act=n_act, interpret=interp)), gv, xv)
    kms = max((v for k, v in by_op.items() if "agg" in k or "custom" in k),
              default=ms)
    F["value_agg_kernel"] = round(kms, 3)
    tfl_v = M_val * up / 1e12
    out["value_agg_tflop"] = round(tfl_v, 4)
    print(f"value_agg_kernel: {kms:.3f} ms device  "
          f"{tfl_v / (kms / 1e3):.0f} TF/s")

    # ---- fused agg fwd+bwd via the public custom-vjp path ---------------
    from spurfies_tpu.model.field import pair_sdf_aggregate
    lat = jax.random.normal(key, (N, d), jnp.float32) * 0.1
    pts = jax.random.normal(key, (N, 3), jnp.float32) * 0.5
    idx = jax.random.randint(key, (M_geo // args.k, args.k), 0, N, jnp.int32)
    xq = jax.random.normal(key, (M_geo // args.k, 3), jnp.float32) * 0.5

    def fwd_only(lat, xq):
        num, den, gagg = pair_sdf_aggregate(frozen, lat, pts, idx, xq, 0.1)
        return jnp.sum(num) + jnp.sum(gagg)

    # scan harness here, NOT timeit_device: for MULTI-OP graphs the
    # perfetto dump lists ops on several device tracks (XLA Ops +
    # module/trace rows), so summing op durations over-counts (measured:
    # the same grad graph reads 9.5 ms by track-sum vs 2.4 ms by scan
    # wall difference, while its in-step trace bucket is 2.8 ms).  The
    # scan difference (fwd+bwd) - (fwd) also cancels input staging.
    ms_f = timeit(fwd_only, lat, xq, perturb=0, n=6)
    ms_fb = timeit(jax.grad(fwd_only, argnums=(0, 1)), lat, xq,
                   perturb=0, n=6)
    F["agg_fwd_via_vjp"] = round(ms_f, 3)
    F["agg_bwd_incl_scatter"] = round(ms_fb - ms_f, 3)
    print(f"agg fwd {ms_f:.3f} ms; fwd+bwd {ms_fb:.3f} ms -> bwd floor "
          f"{ms_fb - ms_f:.3f} ms (scan)")

    # ---- trainable color stack fwd+bwd (bandwidth-bound bucket) ---------
    mc = args.rk * args.color_top
    f_color = params["train"]["F_color"]
    r_net = params["train"]["R"]
    d_view = encoding_dim(cfg.view_multires, 3)
    field_in = jax.random.normal(key, (mc, args.k, 103), jnp.float32)
    w_rbf = jax.random.uniform(key, (mc, args.k), jnp.float32)
    dir_enc = jax.random.normal(key, (mc, d_view), jnp.float32)

    def color(params_c, w_rbf, field_in, dir_enc):
        fc, rn = params_c
        h = mlp_apply(fc[:-1], field_in, final_act="leaky_relu",
                      compute_dtype=jnp.bfloat16)
        hbar = jnp.sum(w_rbf[..., None] * h, -2)
        agg = (jnp.dot(hbar.astype(jnp.bfloat16),
                       fc[-1]["w"].astype(jnp.bfloat16),
                       preferred_element_type=jnp.bfloat16)
               .astype(jnp.float32) + fc[-1]["b"])
        rgb = mlp_apply(rn, jnp.concatenate([dir_enc, agg], -1),
                        final_act="sigmoid", compute_dtype=jnp.bfloat16)
        return jnp.sum(rgb)

    # scan harness (multi-op graph; see the bwd note above)
    cgrad = jax.grad(color, argnums=0)
    ms = timeit(cgrad, (f_color, r_net), w_rbf, field_in, dir_enc,
                perturb=1, n=6)
    F["color_mlp_fwd_bwd"] = round(ms, 3)
    act_gb = (mc * args.k * 256 * 2 * (3 + 3) + mc * args.k * 103 * 4 * 2) / 1e9
    print(f"color_mlp_fwd_bwd: {ms:.3f} ms (~{act_gb:.2f} GB est traffic "
          f"-> {act_gb / (ms / 1e3):.0f} GB/s)")

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("->", args.out)


if __name__ == "__main__":
    main()
