#!/bin/bash
# Round-4 queue o: the chip came back — execute the never-run queue m + n
# work directly: (1) dwgrad A/B (v1/v2/XLA), (2) re-bench training with the
# winning pallas wgrad if it wins both geometries, (3) re-verify the sparse
# accuracy scenario under the window-aligned calibrator (commit 49ed281).
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

note "queue o start"
# preserve the dgrad-only training bench before job 2 overwrites it
cp -n runs/bench_train.json runs/bench_train_dgrad.json 2>/dev/null || true
wait_healthy || exit 1
note "job 1o: bench_dwgrad A/B (v1/v2/XLA)"
timeout 3600 python tools/bench_dwgrad.py > /tmp/bench_dwgrad.out 2>&1
note "job 1o rc=$? (log /tmp/bench_dwgrad.out)"
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
    wins = all(r["wgrad_%s_ms" % best] < r["wgrad_xla_ms"] for r in rows)
    print(best if wins else "")
except Exception:
    print("")
PY
)
if [ -n "$BEST" ]; then
  note "pallas wgrad ($BEST) wins both: job 2o bench_train with SKOOTS_DWGRAD_IMPL=$BEST"
  wait_healthy || exit 1
  timeout 3600 env SKOOTS_DWGRAD_IMPL=$BEST python tools/bench_train.py > /tmp/bench_train_wgrad.out 2>&1
  note "job 2o rc=$? (log /tmp/bench_train_wgrad.out)"
  cp runs/bench_train.json runs/bench_train_pallas_wgrad.json 2>/dev/null || true
else
  note "pallas wgrad does not win both geometries; keeping XLA default"
fi
wait_healthy || exit 1
note "job 3o: sparse accuracy scenario with the window-aligned calibrator"
timeout 7200 python tools/accuracy_campaign.py --scenario sparse > /tmp/campaign_sparse_r04o.out 2>&1
note "job 3o rc=$? (log /tmp/campaign_sparse_r04o.out)"
python -c "import json; print(json.load(open('runs/accuracy/sparse/result.json')))" 2>/dev/null | tee -a "$LOG"
note "queue o done"
