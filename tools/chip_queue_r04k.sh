#!/bin/bash
# Round-4 queue k: measure the Pallas-dgrad training backward
# (kernels/dwconv.py::dwconv3d_dgrad) via tools/bench_train.py.
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
note "job 1k: bench_train with Pallas dgrad backward"
timeout 3600 python tools/bench_train.py > /tmp/bench_train_dgrad.out 2>&1
note "job 1k rc=$? (log /tmp/bench_train_dgrad.out)"
note "queue k done"
