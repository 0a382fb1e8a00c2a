#!/bin/bash
# Round-4 queue s: after queue r — finish the interrupted sparse re-verify.
# Queue o's job 3o trained the sparse checkpoint to completion
# (runs/accuracy/sparse/models/Aug19_20-50-12_sparse.skoots) but hit its 2h
# timeout during the final inference; --rescore reuses the checkpoint and
# only re-runs inference + scoring (~10 min).
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

QPID=$(cat /tmp/chip_queue_r.pid 2>/dev/null || echo "")
if [ -n "$QPID" ]; then
  while kill -0 "$QPID" 2>/dev/null; do sleep 60; done
fi
note "queue s: queue r done"
wait_healthy || exit 1
note "job 1s: sparse re-verify (rescore the Aug19 checkpoint)"
timeout 3600 python tools/accuracy_campaign.py --scenario sparse --rescore > /tmp/campaign_sparse_r04s.out 2>&1
note "job 1s rc=$? (log /tmp/campaign_sparse_r04s.out)"
python -c "import json; print(json.load(open('runs/accuracy/sparse/result.json')))" 2>/dev/null | tee -a "$LOG"
note "queue s done"
