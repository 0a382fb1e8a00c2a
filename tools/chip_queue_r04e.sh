#!/bin/bash
# Round-4 queue e: refresh the per-op forward split (fused upsample +
# fused LN/head rows) and re-measure the 512^3 headline with the fused
# head in the tile program.
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

wait_healthy || exit 1
note "job 1e: bench_fwd_split refresh"
timeout 5400 python tools/bench_fwd_split.py > /tmp/fwd_split2.out 2>&1
note "job 1e rc=$? (log /tmp/fwd_split2.out)"

wait_healthy || exit 1
note "job 2e: bench.py (post-lnhead 512^3 headline)"
timeout 3600 python bench.py > /tmp/bench_r04e.out 2>&1
note "job 2e rc=$? (log /tmp/bench_r04e.out)"
note "queue e done"
