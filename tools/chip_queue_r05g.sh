#!/bin/bash
# Round-5 queue g: blobs reference comparison (CPU torch twin), gated on
# the realism blobs retrain finishing — the round-4 checkpoint files are
# not in git (results are; model blobs were not), so the comparison runs
# against the freshly retrained realism checkpoint with the SAME phantom
# regime (CAMPAIGN_REALISM=1, val seed 999). This answers VERDICT r4
# item 4 at the method level: both pipelines score the same checkpoint on
# the same volume, with per-gt-instance matching recorded.
set -u
cd /root/repo
LOG=runs/chip_queue_r05.log
note() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }

# wait for the queue-f blobs scenario to finish (it logs "scenario blobs rc=")
for i in $(seq 1 240); do
  grep -q "scenario blobs rc=" "$LOG" && break
  sleep 30
done
CKPT=$(ls -t runs/accuracy/blobs/models/*.skoots 2>/dev/null | head -1)
if [ -z "$CKPT" ]; then
  note "queue g: no blobs checkpoint found; aborting refcmp"
  exit 1
fi
note "queue g: blobs refcmp with $CKPT (realism phantom)"
CAMPAIGN_REALISM=1 timeout 5400 python tools/parity_vs_reference.py --cpu \
  --volume blobs --ckpt "$CKPT" \
  --out runs/accuracy/blobs/refcmp > /tmp/refcmp_blobs.out 2>&1
note "queue g: refcmp rc=$? tail: $(tail -c 200 /tmp/refcmp_blobs.out)"
