"""Score a checkpoint on the convergence val volume (infer + mask_iou)."""

import argparse
import glob
import json
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="runs/convergence")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from skoots_tpu.infer import run_inference
    from skoots_tpu.utils.compile_cache import enable_compilation_cache
    from skoots_tpu.utils.io import imread
    from skoots_tpu.validate.metrics import accuracies_from_iou, mask_iou

    enable_compilation_cache()
    ckpt = args.ckpt or sorted(
        glob.glob(os.path.join(args.outdir, "models", "*.skoots"))
    )[-1]
    val_img = os.path.join(args.outdir, "val", "val.tif")
    t0 = time.time()
    mask = run_inference(
        val_img, ckpt,
        crop_size=(128, 128, 32), overlap=(0, 0, 0),
        assign_crop_size=(128, 128, 32), assign_overlap=(0, 0, 0),
        embed_iterations=10,
    )
    infer_s = time.time() - t0
    gt = np.asarray(imread(os.path.join(args.outdir, "val",
                                        "val.labels.tif"))).squeeze()
    pred = np.asarray(mask).squeeze()
    iou = mask_iou(gt, pred)
    n_gt, n_pred = iou.shape
    best = iou.max(axis=1) if iou.size else np.zeros(n_gt)
    tp, fp, fn = accuracies_from_iou(iou, 0.5)
    f1 = 2 * tp / max(2 * tp + fp + fn, 1)
    result = {
        "ok": bool(f1 >= 0.8 and (best.mean() if best.size else 0) >= 0.7),
        "f1_at_iou50": round(float(f1), 4),
        "mean_iou": round(float(best.mean()) if best.size else 0.0, 4),
        "tp": int(tp), "fp": int(fp), "fn": int(fn),
        "gt_instances": int(n_gt), "pred_instances": int(n_pred),
        "infer_s": round(infer_s, 1), "checkpoint": ckpt,
    }
    print(json.dumps(result))
    with open(os.path.join(args.outdir, "result.json"), "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
