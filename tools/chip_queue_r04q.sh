#!/bin/bash
# Round-4 queue q: after queue p — (1) re-run the FIXED dwgrad A/B (queue o
# hit the relay's compile-request size limit because x/g were jit closure
# constants; they are arguments now), (2) re-bench training with the winning
# pallas wgrad if it beats XLA on both training geometries, (3) run bench.py
# once so the driver's end-of-round BENCH_r04 lands on a warm compile cache.
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

QPID=$(cat /tmp/chip_queue_p.pid 2>/dev/null || echo "")
if [ -n "$QPID" ]; then
  while kill -0 "$QPID" 2>/dev/null; do sleep 60; done
fi
note "queue q: queue p done"
wait_healthy || exit 1
note "job 1q: bench_dwgrad A/B (fixed: operands as arguments)"
timeout 3600 python tools/bench_dwgrad.py > /tmp/bench_dwgrad_q.out 2>&1
note "job 1q rc=$? (log /tmp/bench_dwgrad_q.out)"
BEST=$(python - <<'PY'
import json
try:
    d = json.load(open("runs/bench_dwgrad.json"))
    rows = [r for r in d["rows"] if "error" not in r]
    assert len(rows) >= 2  # both geometries must have measured
    def tot(key):
        return sum(r[key] for r in rows)
    cand = {"pallas": tot("wgrad_pallas_ms"),
            "pallas_v2": tot("wgrad_pallas_v2_ms")}
    best = min(cand, key=cand.get)
    wins = all(r["wgrad_%s_ms" % best] < r["wgrad_xla_ms"] for r in rows)
    print(best if wins else "")
except Exception:
    print("")
PY
)
if [ -n "$BEST" ]; then
  note "pallas wgrad ($BEST) wins both: job 2q bench_train with SKOOTS_DWGRAD_IMPL=$BEST"
  wait_healthy || exit 1
  timeout 3600 env SKOOTS_DWGRAD_IMPL=$BEST python tools/bench_train.py > /tmp/bench_train_wgrad.out 2>&1
  note "job 2q rc=$? (log /tmp/bench_train_wgrad.out)"
  cp runs/bench_train.json runs/bench_train_pallas_wgrad.json 2>/dev/null || true
else
  note "pallas wgrad does not win both geometries; keeping XLA default"
fi
wait_healthy || exit 1
note "job 3q: bench.py warm-up (compile cache for the driver's BENCH run)"
timeout 3600 python bench.py > /tmp/bench_r04q.out 2>&1
note "job 3q rc=$? tail: $(tail -1 /tmp/bench_r04q.out 2>/dev/null | head -c 400)"
note "queue q done"
