#!/bin/bash
# Round-4 queue n: after queue m, re-verify the sparse accuracy scenario —
# the train-time threshold calibrator now measures probabilities on the
# centered train-crop window (commit 49ed281), which can shift the
# calibrated semantic threshold vs the F1 1.0 evidence recorded earlier.
set -u
cd /root/repo
LOG=runs/chip_queue_r04.log
note() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }

probe() {
  timeout 90 python -c "
import jax, jax.numpy as jnp
print(float(jnp.ones((8,8)).sum()))" >/dev/null 2>&1
}

wait_healthy() {
  local waited=0
  until probe; do
    note "chip unhealthy; waited ${waited}s, sleeping 120"
    sleep 120
    waited=$((waited + 120))
    [ "$waited" -ge 21600 ] && { note "giving up after 6h"; return 1; }
  done
  note "chip healthy"
}

QPID=$(cat /tmp/chip_queue_m.pid 2>/dev/null || echo "")
if [ -n "$QPID" ]; then
  while kill -0 "$QPID" 2>/dev/null; do sleep 60; done
fi
note "queue n: queue m done"
wait_healthy || exit 1
note "job 1n: sparse accuracy scenario with the window-aligned calibrator"
timeout 7200 python tools/accuracy_campaign.py --scenario sparse > /tmp/campaign_sparse_r04n.out 2>&1
note "job 1n rc=$? (log /tmp/campaign_sparse_r04n.out)"
python -c "import json; print(json.load(open('runs/accuracy/sparse/result.json')))" 2>/dev/null | tee -a "$LOG"
note "queue n done"
