#!/bin/bash
# Round-4 queue c: with the Pallas upsample kernel landed (d3981ff),
# re-measure the 512^3 headline bench, then run the 1024^3 out-of-core
# proof on the tubes phantom with the flagship checkpoint.
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
    if [ "$waited" -ge 21600 ]; then
      note "giving up after 6h of unhealthy chip"
      return 1
    fi
  done
  note "chip healthy"
}

wait_healthy || exit 1
note "job 1c: bench.py (post-upsample-kernel 512^3 headline)"
timeout 3600 python bench.py > /tmp/bench_r04c.out 2>&1
note "job 1c rc=$? (log /tmp/bench_r04c.out)"
tail -1 /tmp/bench_r04c.out | head -c 400 >> "$LOG"; echo >> "$LOG"

CKPT=$(ls -t runs/flagship/models/*.skoots 2>/dev/null | head -1)
if [ -z "$CKPT" ]; then note "queue c: no checkpoint; abort"; exit 1; fi
wait_healthy || exit 1
note "job 2c: bigvol_proof 1024^3 tubes ckpt=$CKPT"
( ulimit -v $((80 * 1024 * 1024))
  timeout 14400 python tools/bigvol_proof.py --phantom tubes \
    --ckpt "$CKPT" > /tmp/bigvol3.out 2>&1 )
note "job 2c rc=$? (log /tmp/bigvol3.out)"
note "queue c done"
