#!/bin/bash
# Follow-up queue: wait for chip_queue_r04.sh (pid file) to exit, then
# re-run the 1024^3 bigvol proof (job 2 of the first queue crashed on a
# missing sys.path bootstrap before touching the chip).
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

QPID=$(cat /tmp/chip_queue.pid 2>/dev/null || echo "")
if [ -n "$QPID" ]; then
  while kill -0 "$QPID" 2>/dev/null; do sleep 60; done
fi
note "queue b: first queue done"

CKPT=$(ls -t runs/flagship/models/*.skoots 2>/dev/null | head -1)
if [ -z "$CKPT" ]; then note "queue b: no checkpoint; abort"; exit 1; fi
wait_healthy || exit 1
note "job 2b: bigvol_proof 1024^3 tubes ckpt=$CKPT"
( ulimit -v $((80 * 1024 * 1024))
  timeout 14400 python tools/bigvol_proof.py --phantom tubes \
    --ckpt "$CKPT" > /tmp/bigvol2.out 2>&1 )
note "job 2b rc=$? (log /tmp/bigvol2.out)"
note "queue b done"
