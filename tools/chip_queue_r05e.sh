#!/bin/bash
# Round-5 queue e (after queue d): one more bench run — the fully
# fg-compacted assign tile (walk + label gather at fg size) landed AFTER
# queue d's final bench, and the driver will reproduce whatever the
# committed defaults measure. Also re-times the warm test suite solo.
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

QPID=$(cat /tmp/queue_r05d.pid 2>/dev/null || echo "")
if [ -n "$QPID" ]; then
  while kill -0 "$QPID" 2>/dev/null; do sleep 60; done
fi
note "=== queue r05e start (queue d done) ==="

wait_healthy || exit 1
note "job 1: bench with the fully-compacted assign"
timeout 3500 env BENCH_WALL_BUDGET=3300 python bench.py > /tmp/bench_r05e.out 2>&1
note "job 1 rc=$? head: $(head -c 250 /tmp/bench_r05e.out)"
[ -f runs/bench_last.json ] && cp runs/bench_last.json runs/bench_r05_final2.json

note "job 2: warm suite timing (solo)"
timeout 900 python -m pytest tests/ -q > /tmp/suite_r05e.out 2>&1
note "job 2 rc=$? $(tail -c 120 /tmp/suite_r05e.out)"
note "=== queue r05e done ==="
