#!/bin/bash
# Round-5 queue b (after queue a): quick perf A/Bs FIRST (CC scans,
# upsample impls, assign walk schedule), then a knob-tuned bench
# re-measure, then the long campaign re-run on the EM-realism generator
# and the blobs reference comparison.
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
note "job 3: upsample impl A/B (xla vs pallas vs mxu)"
timeout 3600 python tools/bench_upsample.py > /tmp/bench_upsample_r05.out 2>&1
note "job 3 rc=$? $(tail -c 200 /tmp/bench_upsample_r05.out)"

wait_healthy || exit 1
note "job 4: assign walk schedule A/B"
timeout 3600 python tools/bench_assign.py > /tmp/bench_assign.out 2>&1
note "job 4 rc=$? $(tail -c 300 /tmp/bench_assign.out)"

wait_healthy || exit 1
note "job 5: knob-tuned bench re-measure (scans=1)"
timeout 3500 env BENCH_WALL_BUDGET=3300 BENCH_CC_SCANS=1 BENCH_CC_PROPAGATES=16 \
  python bench.py > /tmp/bench_r05b.out 2>&1
note "job 5 rc=$? head: $(head -c 250 /tmp/bench_r05b.out)"
[ -f runs/bench_last.json ] && cp runs/bench_last.json runs/bench_r05b_scans.json

wait_healthy || exit 1
note "job 6: accuracy campaign on the EM-realism generator"
timeout 14400 python tools/accuracy_campaign.py > /tmp/campaign_r05.out 2>&1
note "job 6 rc=$? tail: $(tail -c 300 /tmp/campaign_r05.out)"

note "job 7: blobs reference comparison (torch twin, CPU)"
BLOBS_CKPT=$(ls -t runs/accuracy/blobs/models/*.skoots 2>/dev/null | head -1)
if [ -n "$BLOBS_CKPT" ]; then
  mkdir -p runs/accuracy/blobs/refcmp
  timeout 5400 python tools/parity_vs_reference.py --cpu --volume blobs \
    --ckpt "$BLOBS_CKPT" --out runs/accuracy/blobs/refcmp --skip-default \
    > /tmp/parity_blobs.out 2>&1
  note "job 7 rc=$? tail: $(tail -c 300 /tmp/parity_blobs.out)"
  cp runs/accuracy/blobs/refcmp/result.json \
     runs/accuracy/blobs/reference_comparison.json 2>/dev/null || true
else
  note "job 7 skipped: no blobs checkpoint from job 6"
fi
note "=== queue r05b done ==="
