#!/bin/bash
# Round-5 queue h: sparse realism retrain, uncapped. A fresh 150-epoch
# sparse train measures ~49 s/epoch on this host (the 128x128x96 sparse
# phantoms + per-batch merged-skeleton rebake are ~10x a dense epoch), so
# the queue-f 3000 s cap would have killed it before SAVE_INTERVAL.
# 100 epochs is the protocol's proven count (attempts 1-3); sigma decay
# fractions (15/30/45%) scale with the total, so every SWA epoch still
# runs at final sigma.
set -u
cd /root/repo
LOG=runs/chip_queue_r05.log
note() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }
note "queue h: sparse realism retrain, 100 epochs, uncapped"
python tools/accuracy_campaign.py --scenario sparse --epochs 100 \
  > /tmp/campaign_sparse.out 2>&1
note "queue h: sparse rc=$? tail: $(tail -c 200 /tmp/campaign_sparse.out)"
