"""Train a FLAGSHIP-config checkpoint on a synthetic tube phantom.

The accuracy campaign trains a reduced model ([16,32,64,32,16] x depth 1)
because it runs six scenarios; the 1024^3 scaling proof and the seam
agreement run should carry the default `get_cfg_defaults()` model
([32,64,128,64,32] x depth 2, kernel 7 — the model the headline bench
times) with locally-converging embedding walks. This trains exactly that
model on the campaign's separated-tubes phantom and writes the checkpoint
to runs/flagship/models/.

Training hyperparameters are the campaign's proven regime (vector scaling
(12,12,6), front-loaded sigma decay) — the proof needs a converged
embedding field, not the reference's production scaling constants.

`--scenario blobs` trains the same flagship config on the campaign's
blobs phantom: the campaign's reduced model leaves one diagnosed
model-level merge there (17/19, runs/accuracy/blobs/result.json); this
measures whether flagship capacity separates what the small model can't.

Usage: python tools/train_flagship.py [--epochs 60] [--scenario S] [--cpu]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--steps-per-epoch", type=int, default=10)
    ap.add_argument("--outdir", default=None)
    ap.add_argument("--scenario", default="separated")
    ap.add_argument("--sharp", action="store_true",
                    help="sharper embedding regime: one extra 0.5x sigma "
                         "decay at 95%% of training (final sigma ~0.9 vs "
                         "~1.7) — probes whether the touching-blobs merge "
                         "(runs/accuracy/blobs) is a basin-sharpness "
                         "problem")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.outdir is None:
        args.outdir = ("runs/flagship" if args.scenario == "separated"
                       else f"runs/flagship_{args.scenario}"
                       + ("_sharp" if args.sharp else ""))

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from tools.accuracy_campaign import build_dataset, score, write_cfg

    root = os.path.abspath(args.outdir)
    save_dir = os.path.join(root, "models")
    os.makedirs(save_dir, exist_ok=True)
    train_dir, val_dir = build_dataset(root, args.scenario)

    cfg_path = os.path.join(root, "cfg.yaml")
    cfg = write_cfg(cfg_path, train_dir, save_dir, args.epochs,
                    args.scenario)
    # flagship model on the campaign training regime
    cfg["MODEL"] = {
        "DIMS": [32, 64, 128, 64, 32],
        "DEPTHS": [2, 2, 2, 2, 2],
        "KERNEL_SIZE": 7,
        "OUT_CHANNELS": 32,
    }
    if args.sharp:
        cfg["TRAIN"]["SIGMA_DECAY"] = cfg["TRAIN"]["SIGMA_DECAY"] + [
            [0.5, int(args.epochs * 0.95)]
        ]
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    from skoots_tpu.train.cli import main as train_main

    t0 = time.time()
    rc = train_main([
        "--config-file", cfg_path,
        "--steps-per-epoch", str(args.steps_per_epoch),
        "--log", "2",
    ])
    if rc != 0:
        print(json.dumps({"ok": False, "stage": "train", "rc": rc}))
        return rc
    ckpts = sorted(glob.glob(os.path.join(save_dir, "*.skoots")))
    assert ckpts, "no checkpoint written"
    ckpt = ckpts[-1]

    # quick sanity score on the held-out phantom (bar: walks converge and
    # instances separate; this is not the accuracy campaign)
    from skoots_tpu.infer import run_inference
    from skoots_tpu.utils.io import imread

    val_img = os.path.join(val_dir, "val.tif")
    mask = run_inference(
        val_img, ckpt,
        crop_size=(128, 128, 32), overlap=(0, 0, 0),
        assign_crop_size=(128, 128, 32), assign_overlap=(0, 0, 0),
        embed_iterations=10,
    )
    gt = np.asarray(imread(os.path.join(val_dir, "val.labels.tif"))).squeeze()
    result = {
        "checkpoint": ckpt,
        **score(gt, np.asarray(mask).squeeze()),
        "train_wall_s": round(time.time() - t0, 1),
        "epochs": args.epochs,
    }
    with open(os.path.join(root, "result.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
