"""Convergence proof: train on synthetic tubes, validate instance metrics.

Trains a mid-size UNeXT on generated tube phantoms via the real skoots-train
CLI, segments a held-out volume via the real inference engine, and scores it
with the validate metrics (the reference's de-facto correctness harness,
/root/reference/skoots/validate/__main__.py:83-152).

Pass criteria (recorded in BASELINE.md): F1@IoU0.5 >= 0.8, mean IoU >= 0.7.

Usage: python tools/convergence.py [--epochs N] [--outdir D] [--cpu]
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


def build_dataset(root: str, n_train: int = 3) -> tuple[str, str]:
    from skoots_tpu.train.generate_skeletons import save_skeletons
    from skoots_tpu.utils.io import imsave
    from skoots_tpu.utils.synthetic import make_tubes

    train_dir = os.path.join(root, "train")
    val_dir = os.path.join(root, "val")
    os.makedirs(train_dir, exist_ok=True)
    os.makedirs(val_dir, exist_ok=True)
    # min_separation: skeleton-guided segmentation merges interpenetrating
    # instances by construction; real organelles don't interpenetrate
    for i in range(n_train):
        img, labels, skels = make_tubes(
            shape=(128, 128, 32), n_tubes=5, radius=5, seed=100 + i,
            min_separation=16.0,
        )
        imsave(os.path.join(train_dir, f"vol{i}.tif"), img)
        imsave(os.path.join(train_dir, f"vol{i}.labels.tif"), labels)
        save_skeletons(os.path.join(train_dir, f"vol{i}.skeletons.npz"), skels)
    img, labels, _ = make_tubes(shape=(128, 128, 32), n_tubes=5, radius=5,
                                seed=999, min_separation=16.0)
    imsave(os.path.join(val_dir, "val.tif"), img)
    imsave(os.path.join(val_dir, "val.labels.tif"), labels)
    return train_dir, val_dir


def write_cfg(path: str, train_dir: str, save_dir: str, epochs: int) -> None:
    cfg = {
        "MODEL": {
            "DIMS": [16, 32, 64, 32, 16],
            "DEPTHS": [1, 1, 1, 1, 1],
            "KERNEL_SIZE": 7,
            "OUT_CHANNELS": 16,
        },
        "TRAIN": {
            "TRAIN_DATA_DIR": [train_dir],
            "TRAIN_SAMPLE_PER_IMAGE": [8],
            "TRAIN_STORE_DATA_ON_GPU": [True],
            "NUM_EPOCHS": epochs,
            "LEARNING_RATE": 1e-3,
            "SAVE_INTERVAL": max(epochs // 2, 1),
            "SAVE_PATH": save_dir,
            "MAX_SKELETON_POINTS": 256,
            "VALIDATE_EPOCH_SKIP": epochs + 1,
            "LOSS_SKELETON_START_EPOCH": -1,
            "INITIAL_SIGMA": [8.0, 8.0, 4.0],
            "SIGMA_DECAY": [
                [0.66, int(epochs * 0.3)],
                [0.66, int(epochs * 0.6)],
                [0.5, int(epochs * 0.85)],
            ],
            "SKELETON_MASK_RADIUS": 3,
            "SCHEDULER_T0": epochs + 1,
        },
        "AUGMENTATION": {
            "CROP_WIDTH": 96,
            "CROP_HEIGHT": 96,
            "CROP_DEPTH": 32,
            # polarity inversion makes the thin-skeleton task ambiguous for
            # a small model (it can lock onto brightness and anti-predict on
            # one polarity); the convergence proof trains single-polarity
            "INVERT_RATE": 0.0,
        },
        "SKOOTS": {"VECTOR_SCALING": [12, 12, 6]},
    }
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=120)
    ap.add_argument("--steps-per-epoch", type=int, default=8)
    ap.add_argument("--outdir", default="runs/convergence")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from skoots_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    root = os.path.abspath(args.outdir)
    os.makedirs(root, exist_ok=True)
    save_dir = os.path.join(root, "models")
    os.makedirs(save_dir, exist_ok=True)
    train_dir, val_dir = build_dataset(root)
    cfg_path = os.path.join(root, "cfg.yaml")
    write_cfg(cfg_path, train_dir, save_dir, args.epochs)

    from skoots_tpu.train.cli import main as train_main

    t0 = time.time()
    rc = train_main([
        "--config-file", cfg_path,
        "--steps-per-epoch", str(args.steps_per_epoch),
        "--log", "2",
    ])
    train_s = time.time() - t0
    if rc != 0:
        print(json.dumps({"ok": False, "stage": "train", "rc": rc}))
        return 1

    ckpts = sorted(glob.glob(os.path.join(save_dir, "*.skoots")))
    assert ckpts, "no checkpoint written"
    ckpt = ckpts[-1]

    from skoots_tpu.infer import run_inference

    val_img = os.path.join(val_dir, "val.tif")
    t0 = time.time()
    mask = run_inference(
        val_img, ckpt,
        crop_size=(128, 128, 32), overlap=(0, 0, 0),
        assign_crop_size=(128, 128, 32), assign_overlap=(0, 0, 0),
        embed_iterations=10,
    )
    infer_s = time.time() - t0

    from skoots_tpu.utils.io import imread
    from skoots_tpu.validate.metrics import accuracies_from_iou, mask_iou

    gt = np.asarray(imread(os.path.join(val_dir, "val.labels.tif"))).squeeze()
    pred = np.asarray(mask).squeeze()
    iou = mask_iou(gt, pred)
    n_gt, n_pred = iou.shape
    best = iou.max(axis=1) if iou.size else np.zeros(n_gt)
    tp, fp, fn = accuracies_from_iou(iou, 0.5)
    f1 = 2 * tp / max(2 * tp + fp + fn, 1)
    mean_iou = float(best.mean()) if best.size else 0.0

    result = {
        "ok": bool(f1 >= 0.8 and mean_iou >= 0.7),
        "f1_at_iou50": round(float(f1), 4),
        "mean_iou": round(mean_iou, 4),
        "tp": int(tp), "fp": int(fp), "fn": int(fn),
        "gt_instances": int(n_gt),
        "pred_instances": int(n_pred),
        "train_s": round(train_s, 1),
        "infer_s": round(infer_s, 1),
        "epochs": args.epochs,
        "checkpoint": ckpt,
    }
    print(json.dumps(result))
    with open(os.path.join(root, "result.json"), "w") as f:
        json.dump(result, f, indent=2)
    return 0 if result["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
