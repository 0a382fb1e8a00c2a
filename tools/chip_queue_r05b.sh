#!/bin/bash
# Round-5 queue b (after queue a): (1) CC scan-schedule A/B at 512^3 on the
# phantom + speckle workloads, (2) full accuracy campaign re-run on the
# EM-realism generator (VERDICT r4 item 6 — same bars, harder images),
# (3) blobs reference comparison via the torch-twin pipeline (item 4).
set -u
cd /root/repo
LOG=runs/chip_queue_r05.log
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

QPID=$(cat /tmp/queue_r05a.pid 2>/dev/null || echo "")
if [ -n "$QPID" ]; then
  while kill -0 "$QPID" 2>/dev/null; do sleep 60; done
fi
note "=== queue r05b start (queue a done) ==="

wait_healthy || exit 1
note "job 1: CC scan A/B, phantom3d"
timeout 2400 env CC_MODE=phantom3d CC_CHECK=1 CC_JSON=runs/bench_cc_scan_phantom.json \
  python tools/bench_cc.py 128,1,0 16,0,1 8,0,1 4,0,1 32,1,1 \
  > /tmp/cc_scan_phantom.out 2>&1
note "job 1 rc=$? $(tail -c 200 /tmp/cc_scan_phantom.out)"
wait_healthy || exit 1
note "job 2: CC scan A/B, speckle"
timeout 2400 env CC_MODE=speckle CC_CHECK=1 CC_JSON=runs/bench_cc_scan_speckle.json \
  python tools/bench_cc.py 128,1,0 16,0,1 8,0,1 32,1,1 \
  > /tmp/cc_scan_speckle.out 2>&1
note "job 2 rc=$? $(tail -c 200 /tmp/cc_scan_speckle.out)"

wait_healthy || exit 1
note "job 3: accuracy campaign on the EM-realism generator"
timeout 14400 python tools/accuracy_campaign.py > /tmp/campaign_r05.out 2>&1
note "job 3 rc=$? tail: $(tail -c 300 /tmp/campaign_r05.out)"

note "job 4: blobs reference comparison (torch twin, CPU)"
BLOBS_CKPT=$(ls -t runs/accuracy/blobs/models/*.skoots 2>/dev/null | head -1)
if [ -n "$BLOBS_CKPT" ]; then
  mkdir -p runs/accuracy/blobs/refcmp
  timeout 5400 python tools/parity_vs_reference.py --cpu --volume blobs \
    --ckpt "$BLOBS_CKPT" --out runs/accuracy/blobs/refcmp --skip-default \
    > /tmp/parity_blobs.out 2>&1
  note "job 4 rc=$? tail: $(tail -c 300 /tmp/parity_blobs.out)"
  cp runs/accuracy/blobs/refcmp/result.json \
     runs/accuracy/blobs/reference_comparison.json 2>/dev/null || true
else
  note "job 4 skipped: no blobs checkpoint from job 3"
fi
note "=== queue r05b done ==="
