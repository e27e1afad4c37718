#!/bin/bash
# fd-eikonal / cloud-anchor signed-bias sweep (VERDICT r2 #4).
# 2k-step gates on the synthetic sphere, scored on rgb-L1 + mesh err +
# signed bias (PSNR is +-5 dB noisy at 2k — NOTES_ROUND2).
# Serialize: one TPU job at a time (axon tunnel deadlocks otherwise).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/sweep_bias.jsonl}
: > "$LOG"
run() {
  tag=$1; shift
  echo "=== $tag ===" >&2
  timeout 1800 python -u scripts/validate_pipeline.py --steps 2000 \
    --tag "$tag" "$@" >> "$LOG" 2>/tmp/sweep_last_err.log \
    || echo "{\"tag\": \"$tag\", \"FAILED\": true}" >> "$LOG"
}
run base
run fd001       loss.fd_eikonal_weight=0.01
run fd_anneal   loss.fd_eikonal_weight=0.01 loss.fd_eikonal_anneal_init=1.0 loss.fd_eikonal_anneal_steps=2000
run anchor01    loss.cloud_anchor_weight=0.1
run anchor_fd   loss.cloud_anchor_weight=0.1 loss.fd_eikonal_weight=0.01 loss.fd_eikonal_anneal_init=1.0 loss.fd_eikonal_anneal_steps=2000
echo "sweep done" >&2
