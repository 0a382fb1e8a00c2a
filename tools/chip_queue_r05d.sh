#!/bin/bash
# Round-5 queue d (replaces r05c after its job 4): re-measure the assign
# A/B with the exact fg-compacted walk rows, run the FINAL bench on the
# full tuned stack (jump-free CC default + MXU upsample default + compact
# walk default — all committed, so the driver reproduces it), then the
# realism campaign, the blobs reference comparison, and the backward
# attribution.
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

note "=== queue r05d start ==="
wait_healthy || exit 1
note "job 1: assign A/B with compact-walk rows"
timeout 3600 python tools/bench_assign.py > /tmp/bench_assign_d.out 2>&1
note "job 1 rc=$? $(grep -a compact_div /tmp/bench_assign_d.out | tr '\n' ' ' | head -c 500)"

wait_healthy || exit 1
note "job 2: FINAL bench (committed defaults, no env knobs)"
timeout 3500 env BENCH_WALL_BUDGET=3300 python bench.py > /tmp/bench_r05d.out 2>&1
note "job 2 rc=$? head: $(head -c 250 /tmp/bench_r05d.out)"
[ -f runs/bench_last.json ] && cp runs/bench_last.json runs/bench_r05_final.json

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

wait_healthy || exit 1
note "job 5: backward attribution at the reference envelope"
timeout 5400 python tools/bench_bwd_split.py > /tmp/bench_bwd_split.out 2>&1
note "job 5 rc=$? $(tail -c 250 /tmp/bench_bwd_split.out)"
note "=== queue r05d done ==="
