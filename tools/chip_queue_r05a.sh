#!/bin/bash
# Round-5 queue a: (1) train + commit-ready flagship bench checkpoint so the
# headline bench segments a phantom with a REAL model (VERDICT r4 item 7),
# (2) full bench.py run — also warms the persistent XLA cache so the
# driver's end-of-round invocation compiles warm (~75 s, not 878 s),
# (3) the deferred wgrad A/B + train-bench refresh (VERDICT r4 item 2).
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

note "=== queue r05a start ==="
wait_healthy || exit 1

note "job 1: train flagship bench checkpoint (separated phantom, 60 epochs)"
timeout 5400 python tools/train_flagship.py --outdir runs/bench_ckpt_train \
  > /tmp/train_bench_ckpt.out 2>&1
rc=$?
note "job 1 rc=$rc (log /tmp/train_bench_ckpt.out)"
if [ $rc -eq 0 ]; then
  CKPT=$(ls -t runs/bench_ckpt_train/models/*.skoots | head -1)
  cp "$CKPT" runs/bench_ckpt.skoots
  note "bench checkpoint staged: $CKPT -> runs/bench_ckpt.skoots"
fi

wait_healthy || exit 1
note "job 2: full bench.py (phantom + trained ckpt; warms the XLA cache)"
timeout 3500 env BENCH_WALL_BUDGET=3300 python bench.py \
  > /tmp/bench_r05a.out 2>&1
note "job 2 rc=$? head: $(head -c 220 /tmp/bench_r05a.out)"
[ -f runs/bench_last.json ] && cp runs/bench_last.json runs/bench_r05a.json

wait_healthy || exit 1
note "job 3: dwgrad A/B"
timeout 3600 python tools/bench_dwgrad.py > /tmp/bench_dwgrad.out 2>&1
note "job 3 rc=$? (log /tmp/bench_dwgrad.out)"
BEST=$(python - <<'PY'
import json
try:
    d = json.load(open("runs/bench_dwgrad.json"))
    rows = d["rows"]
    def tot(key):
        return sum(r[key] for r in rows)
    cand = {"pallas": tot("wgrad_pallas_ms"),
            "pallas_v2": tot("wgrad_pallas_v2_ms")}
    best = min(cand, key=cand.get)
    wins = all(r["wgrad_%s_ms" % ("pallas_v2" if best=="pallas_v2" else "pallas")] < r["wgrad_xla_ms"] for r in rows)
    print(best if wins else "")
except Exception:
    print("")
PY
)
wait_healthy || exit 1
if [ -n "$BEST" ]; then
  note "pallas wgrad ($BEST) wins both geometries: bench_train with SKOOTS_DWGRAD_IMPL=$BEST"
  timeout 3600 env SKOOTS_DWGRAD_IMPL=$BEST python tools/bench_train.py > /tmp/bench_train_r05.out 2>&1
  note "job 4 rc=$? (log /tmp/bench_train_r05.out)"
  cp runs/bench_train.json runs/bench_train_pallas_wgrad.json 2>/dev/null || true
else
  note "pallas wgrad does not win both geometries; refreshing bench_train on XLA default"
  timeout 3600 python tools/bench_train.py > /tmp/bench_train_r05.out 2>&1
  note "job 4 rc=$? (log /tmp/bench_train_r05.out)"
fi
note "=== queue r05a done ==="
