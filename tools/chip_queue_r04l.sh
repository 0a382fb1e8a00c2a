#!/bin/bash
# Round-4 queue l: after queue k (train bench), re-run bench.py to record
# CC telemetry (cc_impl/rounds/converged now surfaced in detail) and
# confirm the dense-CC headline with current code.
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

QPID=$(cat /tmp/chip_queue_k.pid 2>/dev/null || echo "")
if [ -n "$QPID" ]; then
  while kill -0 "$QPID" 2>/dev/null; do sleep 60; done
fi
note "queue l: queue k done"
wait_healthy || exit 1
note "job 1l: bench.py with CC telemetry"
timeout 3600 python bench.py > /tmp/bench_r04l.out 2>&1
rc=$?
note "job 1l rc=$rc (log /tmp/bench_r04l.out)"
grep -m1 '^{' /tmp/bench_r04l.out > runs/bench_r04l.json 2>/dev/null || true
note "queue l done"
