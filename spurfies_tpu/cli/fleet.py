"""Multi-host scene fleet — shard the per-scene testlist across hosts.

The reference optimizes scenes one at a time in a Python loop
(runner.py:64-65); scenes are fully independent, so the multi-HOST scaling
axis for this workload is scene parallelism over DCN: every host takes a
slice of the testlist and runs the normal single-host (optionally
multi-chip, train.data_parallel) per-scene optimization on it.  No
cross-host communication is needed or used — DCN would only add latency
to a problem that has none (SURVEY §5 "distributed backend").

    # host i of n (e.g. under a TPU pod's per-host launcher):
    python -m spurfies_tpu.cli.fleet --scans scan21,...,scan118 \
        --num-hosts 4 --host-index $HOST_INDEX --config configs/dtu_pn.yaml

host-index defaults, in order: --host-index flag, $FLEET_HOST_INDEX,
jax.process_index() (when jax.distributed is initialized).
"""

import argparse
import json
import os
import time

from spurfies_tpu.config import Config, apply_overrides, load_yaml
from spurfies_tpu.utils.experiment import get_logger

log = get_logger()


def shard_scans(scans: list, num_hosts: int, host_index: int) -> list:
    """Round-robin scene assignment (balances mixed scene sizes better
    than contiguous blocks)."""
    if not 0 <= host_index < num_hosts:
        raise ValueError(
            f"host_index {host_index} outside [0, {num_hosts})"
        )
    return scans[host_index::num_hosts]


def resolve_host_index(flag_value):
    if flag_value is not None:
        return int(flag_value)
    env = os.environ.get("FLEET_HOST_INDEX")
    if env is not None:
        return int(env)
    try:
        import jax
        return jax.process_index()
    except Exception:
        return 0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--scans", required=True,
                    help="comma-separated full testlist (same on all hosts)")
    ap.add_argument("--num-hosts", type=int, default=1)
    ap.add_argument("--host-index", type=int, default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args(argv)

    host = resolve_host_index(args.host_index)
    all_scans = [s.strip() for s in args.scans.split(",") if s.strip()]
    mine = shard_scans(all_scans, args.num_hosts, host)
    log.info(f"fleet host {host}/{args.num_hosts}: "
             f"{len(mine)}/{len(all_scans)} scenes -> {mine}")

    cfg = load_yaml(args.config) if args.config else Config()
    cfg = apply_overrides(cfg, args.overrides)

    from spurfies_tpu.cli.train import train_scene

    results = {}
    for scan in mine:
        t0 = time.perf_counter()
        train_scene(cfg, scan, resume=args.resume)
        results[scan] = round(time.perf_counter() - t0, 1)
        log.info(f"fleet host {host}: {scan} done in {results[scan]}s")

    out = os.path.join(cfg.exps_folder, f"fleet_host{host}.json")
    os.makedirs(cfg.exps_folder, exist_ok=True)
    with open(out, "w") as f:
        json.dump({"host": host, "num_hosts": args.num_hosts,
                   "scenes": results}, f, indent=2)


if __name__ == "__main__":
    main()
