#!/bin/bash
# Round-4 queue p: host-streaming engine forensics. The out-of-core path is
# ~40x slower than the device pipeline at 512^3 (seam bench 777 s vs bench
# 21 s); this queue (1) retrains the touching checkpoint (round checkpoints
# are gitignored and did not survive), (2) runs tools/bench_hoststream.py to
# localize the gap (tunnel bandwidth probe + per-stage split).
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

QPID=$(cat /tmp/chip_queue_o.pid 2>/dev/null || echo "")
if [ -n "$QPID" ]; then
  while kill -0 "$QPID" 2>/dev/null; do sleep 60; done
fi
note "queue p: queue o done"
wait_healthy || exit 1
CKPT=$(ls runs/accuracy/touching/models/*.skoots 2>/dev/null | tail -1)
if [ -z "$CKPT" ]; then
  note "job 1p: retrain touching checkpoint (campaign scenario)"
  timeout 7200 python tools/accuracy_campaign.py --scenario touching > /tmp/campaign_touching_r04p.out 2>&1
  note "job 1p rc=$? (log /tmp/campaign_touching_r04p.out)"
else
  note "job 1p skipped: checkpoint present ($CKPT)"
fi
wait_healthy || exit 1
note "job 2p: bench_hoststream 512^3"
timeout 10800 python tools/bench_hoststream.py > /tmp/bench_hoststream.out 2>&1
note "job 2p rc=$? (log /tmp/bench_hoststream.out)"
python -c "import json; d=json.load(open('runs/bench_hoststream.json')); print(json.dumps({k: d[k] for k in d if k != 'traced'}, indent=1))" 2>/dev/null | tee -a "$LOG"
note "queue p done"
