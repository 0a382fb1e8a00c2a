#!/bin/bash
# Round-4 remaining chip queue, serialized (ONE chip job at a time):
#   1. flagship-config checkpoint training   -> runs/flagship/result.json
#   2. 1024^3 bigvol proof (tubes + ckpt)    -> runs/bigvol/result.json
#   3. on-chip per-op forward split          -> runs/fwd_split.json
# Waits for pool health before each job (PJRT client creation BLOCKS
# forever on a dead pool, so probes run in a subprocess with a hard
# timeout). Appends one status line per event to runs/chip_queue_r04.log.
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

note "job 1: train_flagship"
timeout 7200 python tools/train_flagship.py > /tmp/flagship.out 2>&1
rc=$?
note "job 1 rc=$rc (log /tmp/flagship.out)"

CKPT=$(ls -t runs/flagship/models/*.skoots 2>/dev/null | head -1)
if [ $rc -eq 0 ] && [ -n "$CKPT" ]; then
  wait_healthy || exit 1
  note "job 2: bigvol_proof 1024^3 tubes ckpt=$CKPT"
  # 80 GiB address-space cap: ~17 GiB of output memmaps + runtime head-
  # room, far below the host's 125 GiB — the first run leaked ~100 GiB of
  # per-dispatch host buffers and had to be killed by hand.
  ( ulimit -v $((80 * 1024 * 1024))
    timeout 14400 python tools/bigvol_proof.py --phantom tubes \
      --ckpt "$CKPT" > /tmp/bigvol2.out 2>&1 )
  rc=$?
  note "job 2 rc=$rc (log /tmp/bigvol2.out)"
else
  note "job 2 SKIPPED (no flagship checkpoint)"
fi

wait_healthy || exit 1
note "job 3: bench_fwd_split"
timeout 3600 python tools/bench_fwd_split.py > /tmp/fwd_split.out 2>&1
note "job 3 rc=$? (log /tmp/fwd_split.out)"
note "queue done"
