"""Measure what tile overlap actually buys at inference seams.

The reference sweeps with a large fixed overlap (50,50,5 at crop 300^2x20,
eval.py:126-178) "to be safe" — 6.1x voxel redundancy. On TPU the sweep
redundancy is the single biggest phase-1 cost knob, and the clamped tile
grid means ANY nonzero overlap can add a whole extra tile per axis (e.g.
512-axis / crop 256: overlap 0 -> 2 tiles, overlap 8 -> 3 tiles, +50%).

This tool quantifies the quality side of that trade on a trained campaign
checkpoint (default: the `touching` scenario — instances whose surfaces
touch, segmented F1=1.0 at full-volume crop — the most seam-sensitive case
available): it re-scores the held-out volume with a crop SMALLER than the
volume so tile seams cut straight through instances, at several overlaps.

Usage:
    python tools/seam_probe.py [--scenario touching]
        [--crop 64,64,32] [--overlaps 0,0,0;8,8,4]   # CPU by default

Writes runs/seam_probe.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenario", default="touching")
    ap.add_argument("--crop", default="64,64,32")
    ap.add_argument("--overlaps", default="0,0,0;4,4,2;8,8,4")
    ap.add_argument("--outdir", default="runs")
    ap.add_argument("--tpu", action="store_true",
                    help="run on the accelerator (default: CPU, so the probe "
                         "can run alongside chip jobs)")
    args = ap.parse_args()

    if not args.tpu:
        # the axon sitecustomize pins the TPU-tunnel platform regardless of
        # JAX_PLATFORMS; jax.config is the only override that sticks
        import jax

        jax.config.update("jax_platforms", "cpu")

    from tools.accuracy_campaign import INFER_KNOBS, score
    from skoots_tpu.infer import run_inference
    from skoots_tpu.utils.io import imread

    # the scenario's dilation regime (without it the default stack bridges
    # touching skeletons and every row fails identically — measured)
    knobs = INFER_KNOBS.get(args.scenario, {})

    root = os.path.join("runs", "accuracy", args.scenario)
    result = json.load(open(os.path.join(root, "result.json")))
    ckpt = result["checkpoint"]
    val_img = os.path.join(root, "val", "val.tif")
    gt = np.asarray(imread(os.path.join(root, "val", "val.labels.tif"))).squeeze()

    crop = tuple(int(v) for v in args.crop.split(","))
    rows = []
    for ov_s in args.overlaps.split(";"):
        ov = tuple(int(v) for v in ov_s.split(","))
        mask = run_inference(
            val_img, ckpt, crop_size=crop, overlap=ov,
            assign_crop_size=(128, 128, 32), assign_overlap=(0, 0, 0),
            embed_iterations=10, **knobs,
        )
        r = {"overlap": list(ov), "crop": list(crop),
             **score(gt, np.asarray(mask).squeeze())}
        rows.append(r)
        print(json.dumps(r), flush=True)

    out = {"scenario": args.scenario,
           "fullvol_f1": result["f1_at_iou50"],
           "fullvol_mean_iou": result["mean_iou"],
           "rows": rows}
    with open(os.path.join(args.outdir, "seam_probe.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
