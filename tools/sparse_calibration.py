"""Sparse-checkpoint semantic-threshold calibration probe.

The round-4 sparse attempt 4 separated 5/5 instances with recall 1.0 but
mean IoU 0.347: the semantic mask is ~3x too fat (pred fg 2.83% vs GT
0.94%) at the default prob threshold 0.8. Sparse training supervises the
semantic head only through `embed_prob > 0.2` (reference
sparse_loss.py:254-353), whose spatial support is set by sigma, not by the
object boundary — so the right threshold for a sparse checkpoint is a
property of the training regime, not the reference's dense-pipeline 0.8.

This probe runs ONE raw-probability forward over the sparse val volume,
then sweeps thresholds offline:
  - semantic precision/recall vs GT foreground,
  - estimated per-instance F1@IoU0.5 (old phase-3 assignment restricted to
    the new fg mask — valid because raising thr only shrinks fg),
  - prob percentiles by EDT distance band (saturation diagnosis).

Writes runs/accuracy/sparse/calibration.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = "runs/accuracy/sparse"
CKPT = os.path.join(ROOT, "models", "Aug18_21-18-15_sparse.skoots")
VAL = os.path.join(ROOT, "val", "val.tif")
GT = os.path.join(ROOT, "val", "val.labels.tif")
PRED = os.path.join(ROOT, "val", "val_instance_mask.tif")
PROB = os.path.join(ROOT, "val", "val_prob_raw.npy")


def forward_prob() -> np.ndarray:
    import jax
    import jax.numpy as jnp

    from skoots_tpu.models.registry import cfg_to_model
    from skoots_tpu.train.checkpoint import load_checkpoint, restore_params
    from skoots_tpu.utils.compile_cache import enable_compilation_cache
    from skoots_tpu.utils.io import imread

    enable_compilation_cache()
    ck = load_checkpoint(CKPT)
    cfg = ck["cfg"]
    model = cfg_to_model(cfg)
    template = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, 16, 16, 16, 1), jnp.float32),
            deterministic=True,
        )
    )
    params = restore_params(template, ck["params"])
    mean, std = float(ck["dataset_mean"]), float(ck["dataset_std"])

    @jax.jit
    def raw_fn(tile):
        x = (tile - mean) / std
        out = model.apply(params, x, deterministic=True)
        prob = out[..., 4]
        # undilated skeleton map at the standard operating point (what
        # _make_tile_fn produces before the dilation stack)
        skel = ((out[..., 3] * (prob > 0.8)) > 0.8).astype(jnp.uint8)
        return prob, skel

    vol = np.asarray(imread(VAL))  # [X, Y, Z]
    x, y, z = vol.shape
    prob = np.zeros((x, y, z), np.float16)
    skel = np.zeros((x, y, z), np.uint8)
    t0 = time.time()
    for z0 in range(0, z, 32):
        tile = vol[:, :, z0 : z0 + 32].astype(np.float32)[None, ..., None]
        p, s = raw_fn(jnp.asarray(tile))
        prob[:, :, z0 : z0 + 32] = np.asarray(p)[0].astype(np.float16)
        skel[:, :, z0 : z0 + 32] = np.asarray(s)[0]
    print(f"forward: {time.time() - t0:.1f}s for {z // 32} tiles", flush=True)
    np.save(PROB, prob)
    np.save(PROB.replace("_prob_raw", "_skel_raw"), skel)
    return prob


def sweep(prob: np.ndarray) -> dict:
    from scipy.ndimage import distance_transform_edt

    from skoots_tpu.utils.io import imread
    from skoots_tpu.validate.metrics import accuracies_from_iou, mask_iou

    gt = np.asarray(imread(GT)).squeeze()
    pred_old = np.asarray(imread(PRED)).squeeze()
    gt_fg = gt > 0

    # prob percentiles by distance-from-object band (saturation diagnosis)
    dist = distance_transform_edt(~gt_fg)
    bands = {}
    for lo, hi in [(0, 0), (1, 2), (3, 4), (5, 7), (8, 12), (13, 30)]:
        m = (dist >= lo) & (dist <= hi) if lo else gt_fg
        if lo:
            m &= ~gt_fg
        vals = prob[m].astype(np.float32)
        if vals.size:
            bands[f"d{lo}-{hi}"] = {
                "p10": round(float(np.percentile(vals, 10)), 4),
                "p50": round(float(np.percentile(vals, 50)), 4),
                "p90": round(float(np.percentile(vals, 90)), 4),
                "n": int(vals.size),
            }

    rows = []
    for thr in (0.8, 0.85, 0.9, 0.95, 0.97, 0.98, 0.99, 0.995, 0.998):
        fg = prob > thr
        tp_v = float((fg & gt_fg).sum())
        prec = tp_v / max(fg.sum(), 1)
        rec = tp_v / max(gt_fg.sum(), 1)
        # phase-3 estimate: old assignment restricted to the shrunk fg
        pred_new = np.where(fg, pred_old, 0)
        iou = mask_iou(gt, pred_new)
        tp, fp, fn = accuracies_from_iou(iou, 0.5)
        f1 = 2 * tp / max(2 * tp + fp + fn, 1)
        best = iou.max(axis=1) if iou.size else np.zeros(1)
        rows.append({
            "thr": thr,
            "precision": round(prec, 4),
            "recall": round(rec, 4),
            "est_f1_at_iou50": round(float(f1), 4),
            "est_mean_iou": round(float(best.mean()), 4),
        })
        print(json.dumps(rows[-1]), flush=True)
    return {"bands": bands, "sweep": rows}


def main() -> int:
    if os.path.exists(PROB):
        prob = np.load(PROB)
    else:
        prob = forward_prob()
    out = sweep(prob)
    best = max(out["sweep"], key=lambda r: (r["est_f1_at_iou50"],
                                            r["est_mean_iou"]))
    out["best"] = best
    print("bands:", json.dumps(out["bands"], indent=1))
    print("best:", json.dumps(best))
    with open(os.path.join(ROOT, "calibration.json"), "w") as f:
        json.dump(out, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
