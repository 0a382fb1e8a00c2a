#!/bin/bash
# Round-4 queue j: after queue c (bigvol) finishes, A/B the stem and
# downsample implementations on the chip (tools/bench_stemdown.py).
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

QPID=$(cat /tmp/chip_queue_i.pid 2>/dev/null || echo "")
if [ -n "$QPID" ]; then
  while kill -0 "$QPID" 2>/dev/null; do sleep 60; done
fi
note "queue j: queue i done"

wait_healthy || exit 1
note "job 1j: bench.py dense-CC restore + bench_train with batch fix"
timeout 3600 python bench.py > /tmp/bench_r04j.out 2>&1; echo "bench rc=$?"; timeout 3600 python tools/bench_train.py > /tmp/bench_train.out 2>&1
note "job 1j rc=$? (logs /tmp/bench_r04j.out /tmp/bench_train.out)"
note "queue j done"
