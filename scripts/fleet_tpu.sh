#!/bin/bash
# Fleet on the real TPU chip (VERDICT r4 #6): one TPU host = one fleet
# process taking its testlist slice and optimizing scenes one at a time
# (the reference's runner.py:64-65 loop, scaled out per host).  Two
# synthetic-DTU scenes at production model knobs (short step budget),
# then the failure-propagation check (scan with no data -> nonzero rc).
#
#   bash scripts/fleet_tpu.sh > artifacts/fleet_tpu_r05.log 2>&1
set -u
WORK=/tmp/fleet_tpu_r05
rm -rf "$WORK"; mkdir -p "$WORK"; cd "$WORK" || exit 1
# APPEND to PYTHONPATH: overwriting it drops the host's sitecustomize
# dir (e.g. /root/.axon_site), which is what registers the TPU PJRT
# plugin — overwrite and every jax init dies with "Unable to initialize
# backend".
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
ln -sf /root/repo/artifacts artifacts

echo "=== fleet on real TPU r5: one host, two scenes, sequential ==="
python - << 'EOF'
import sys
sys.path.insert(0, '/root/repo')
from spurfies_tpu.data.synthetic import export_synthetic_dtu
export_synthetic_dtu('data', scan_id=24, n_views=49, img_res=(96, 128),
                     n_points=4000)
export_synthetic_dtu('data', scan_id=37, n_views=49, img_res=(96, 128),
                     n_points=4000, seed=37)
print('fixtures ok')
EOF

OV="expname=dtu_pn dataset.data_dir=dtu dataset.img_res=[96,128] \
loss.local_weight=0 train.num_pixels=1024 train.fast_iters=1 \
train.opt_steps=2000 train.render_freq=2000 train.checkpoint_freq=2000"

timeout 3000 python -m spurfies_tpu.cli.fleet --scans scan24,scan37 \
  --num-hosts 1 --host-index 0 $OV
RC=$?
echo "fleet rc=$RC"

echo "--- failure propagation: scan99 has no data ---"
timeout 600 python -m spurfies_tpu.cli.fleet --scans scan99 \
  --num-hosts 1 --host-index 0 $OV
RCBAD=$?
echo "hostbad rc=$RCBAD (expected nonzero)"

echo "--- fleet_host0.json ---"; cat exps/fleet_host0.json 2>/dev/null
echo "--- exps dirs ---"; ls exps/
if [ "$RC" = 0 ] && [ "$RCBAD" != 0 ]; then echo "FLEET TPU: PASS"; else echo "FLEET TPU: FAIL"; fi
