#!/bin/bash
# Round-4 queue r: after queue q — re-measure the 1024^3 out-of-core proof
# with the wire-thrifted streaming engine (recompute wire mode, bit-packed
# mask transfers, uint16 label narrowing, read-ahead threads). The round-4
# first measurement was 3016.6 s (0.36 Mvox/s), dominated by relay transfer
# bytes; this run quantifies the thrift end-to-end at scale.
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

QPID=$(cat /tmp/chip_queue_q.pid 2>/dev/null || echo "")
if [ -n "$QPID" ]; then
  while kill -0 "$QPID" 2>/dev/null; do sleep 60; done
fi
note "queue r: queue q done"
wait_healthy || exit 1
CKPT=$(ls runs/accuracy/touching/models/*.skoots 2>/dev/null | tail -1)
if [ -z "$CKPT" ]; then
  note "queue r: no touching checkpoint; skipping bigvol re-measure"
  exit 0
fi
cp -n runs/bigvol/result.json runs/bigvol/result_pre_thrift.json 2>/dev/null || true
note "job 1r: bigvol 1024^3 re-measure (wire-thrift engine, ckpt $CKPT)"
timeout 14400 env SKOOTS_NO_TRACEMALLOC=1 python tools/bigvol_proof.py \
  --shape 1024,1024,1024 --phantom tubes --ckpt "$CKPT" \
  > /tmp/bigvol_r04r.out 2>&1
note "job 1r rc=$? (log /tmp/bigvol_r04r.out)"
python -c "import json; print(json.load(open('runs/bigvol/result.json')))" 2>/dev/null | tee -a "$LOG"
wait_healthy || exit 1
note "job 2r: bigvol 1024^3 DEVICE-RESIDENT (thrifty pipeline, same phantom)"
timeout 7200 env SKOOTS_NO_TRACEMALLOC=1 python tools/bigvol_proof.py \
  --shape 1024,1024,1024 --phantom tubes --ckpt "$CKPT" \
  --engine device-thrifty --tag thrifty \
  > /tmp/bigvol_thrifty_r04r.out 2>&1
note "job 2r rc=$? (log /tmp/bigvol_thrifty_r04r.out)"
python -c "import json; print(json.load(open('runs/bigvol/result_thrifty.json')))" 2>/dev/null | tee -a "$LOG"
note "queue r done"
