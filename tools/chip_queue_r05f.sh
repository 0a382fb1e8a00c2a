#!/bin/bash
# Round-5 queue f: finish the realism campaign + the blobs reference
# comparison. Runs after the in-flight bench (fully-compacted assign
# re-measure) releases the chip.
#
# Order: blobs first (it feeds VERDICT r4 item 4), then aniso (perslice
# depends on its checkpoint), then perslice, then sparse (longest).
# The blobs REFERENCE comparison (torch twin, CPU-only) starts as soon as
# the chip-side bench is done, concurrent with the chip jobs — it answers
# the 17/19 question on the ROUND-4 clean setup (same checkpoint + phantom
# that produced the 17/19), so it does not wait for the realism retrain.
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
    [ "$waited" -ge 7200 ] && { note "giving up after 2h"; return 1; }
  done
  note "chip healthy"
}

# wait for the in-flight bench (started by the session)
BPID=$(cat /tmp/bench.inner.pid 2>/dev/null || echo "")
if [ -n "$BPID" ]; then
  while kill -0 "$BPID" 2>/dev/null; do sleep 30; done
fi
note "=== queue r05f start (bench done) ==="
[ -f runs/bench_last.json ] && cp runs/bench_last.json runs/bench_r05_final2.json

# CPU-side: blobs reference comparison on the round-4 clean setup
note "job A (cpu): blobs reference comparison"
CAMPAIGN_REALISM=0 timeout 3600 python tools/parity_vs_reference.py --cpu \
  --volume blobs --ckpt runs/accuracy/blobs/models/Aug18_16-40-16.skoots \
  --out runs/accuracy/blobs/refcmp > /tmp/refcmp_blobs.out 2>&1 &
echo $! > /tmp/refcmp.pid

for SC in blobs aniso perslice sparse; do
  wait_healthy || exit 1
  note "job: realism campaign scenario $SC"
  timeout 3000 python tools/accuracy_campaign.py --scenario "$SC" \
    > "/tmp/campaign_${SC}.out" 2>&1
  note "scenario $SC rc=$? tail: $(tail -c 200 /tmp/campaign_${SC}.out)"
done
note "=== queue r05f done ==="
