#!/bin/bash
# Round-5 queue c (replaces the rest of queue b): jump-free CC sweep (the
# jumps, ~2 s/gather at 512^3, are the measured CC cost — not the Pallas
# propagates), upsample + assign A/Bs, a measurement-driven knob selector,
# the final tuned bench, the realism campaign, the blobs reference
# comparison, and the backward attribution for the 304^2x24 train row.
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

# wait for the orphaned speckle sweep from queue b to release the chip
while ps -eo cmd | grep -q "[b]ench_cc.py 128,1,0 16,0,1"; do sleep 30; done
note "=== queue r05c start ==="

wait_healthy || exit 1
note "job 1: jump-free CC P-sweep, phantom3d"
timeout 2400 env CC_MODE=phantom3d CC_CHECK=1 CC_JSON=runs/bench_cc_sweep_phantom.json \
  python tools/bench_cc.py 128,1,0 384,0,0 256,0,0 192,0,0 128,0,0 \
  > /tmp/cc_sweep_phantom.out 2>&1
note "job 1 rc=$? $(grep -a 'P=' /tmp/cc_sweep_phantom.out | tr '\n' ' ')"

wait_healthy || exit 1
note "job 2: upsample impl A/B (xla vs pallas vs mxu)"
timeout 3600 python tools/bench_upsample.py > /tmp/bench_upsample_r05.out 2>&1
note "job 2 rc=$? $(tail -c 200 /tmp/bench_upsample_r05.out)"

wait_healthy || exit 1
note "job 3: assign walk schedule A/B"
timeout 3600 python tools/bench_assign.py > /tmp/bench_assign.out 2>&1
note "job 3 rc=$? $(grep -a '\"n\"' /tmp/bench_assign.out | tr '\n' ' ' | head -c 400)"

# --- measurement-driven knob selection -------------------------------
eval "$(python - <<'PY'
import json

env = {"BENCH_CC_PROPAGATES": 128, "BENCH_CC_JUMPS": 1, "BENCH_CC_SCANS": 0,
       "BENCH_EXIT_CYCLE": 0}
try:
    rows = json.load(open("runs/bench_cc_sweep_phantom.json"))["rows"]
    ok = [r for r in rows if r.get("converged")]
    best = min(ok, key=lambda r: r["seconds"])
    env.update(BENCH_CC_PROPAGATES=best["P"], BENCH_CC_JUMPS=best["J"],
               BENCH_CC_SCANS=best["S"])
except Exception:
    pass
try:
    rows = json.load(open("runs/bench_assign.json"))["rows"]
    exact = next(r for r in rows if r["n"] == 10 and r["exit_fraction"] is None)
    cyc = [r for r in rows if r.get("exit_cycle") and r["agree_vs_exact"] >= 0.9999]
    if cyc and min(c["ms"] for c in cyc) < exact["ms"]:
        env["BENCH_EXIT_CYCLE"] = 1
except Exception:
    pass
for k, v in env.items():
    print(f"export {k}={v}")
PY
)"
note "selected knobs: P=$BENCH_CC_PROPAGATES J=$BENCH_CC_JUMPS S=$BENCH_CC_SCANS cycle=$BENCH_EXIT_CYCLE"

wait_healthy || exit 1
note "job 4: final tuned bench"
timeout 3500 env BENCH_WALL_BUDGET=3300 python bench.py > /tmp/bench_r05c.out 2>&1
note "job 4 rc=$? head: $(head -c 250 /tmp/bench_r05c.out)"
[ -f runs/bench_last.json ] && cp runs/bench_last.json runs/bench_r05_tuned.json

wait_healthy || exit 1
note "job 5: accuracy campaign on the EM-realism generator"
timeout 14400 python tools/accuracy_campaign.py > /tmp/campaign_r05.out 2>&1
note "job 5 rc=$? tail: $(tail -c 300 /tmp/campaign_r05.out)"

note "job 6: blobs reference comparison (torch twin, CPU)"
BLOBS_CKPT=$(ls -t runs/accuracy/blobs/models/*.skoots 2>/dev/null | head -1)
if [ -n "$BLOBS_CKPT" ]; then
  mkdir -p runs/accuracy/blobs/refcmp
  timeout 5400 python tools/parity_vs_reference.py --cpu --volume blobs \
    --ckpt "$BLOBS_CKPT" --out runs/accuracy/blobs/refcmp --skip-default \
    > /tmp/parity_blobs.out 2>&1
  note "job 6 rc=$? tail: $(tail -c 300 /tmp/parity_blobs.out)"
  cp runs/accuracy/blobs/refcmp/result.json \
     runs/accuracy/blobs/reference_comparison.json 2>/dev/null || true
else
  note "job 6 skipped: no blobs checkpoint from job 5"
fi

wait_healthy || exit 1
note "job 7: backward attribution at the reference envelope"
timeout 5400 python tools/bench_bwd_split.py > /tmp/bench_bwd_split.out 2>&1
note "job 7 rc=$? $(tail -c 250 /tmp/bench_bwd_split.out)"
note "=== queue r05c done ==="
