"""Instance-level evaluation metrics (reference /root/reference/skoots/validate/lib.py).

The reference computes the NxM instance IoU/Dice tables with a python double
loop over unique ids, re-scanning the full volume per pair (lib.py:190-275,
O(N*M*V)). Here the whole contingency table comes from ONE pass: encode
(gt_id, pred_id) voxel pairs into a single integer and ``np.unique`` them —
exact same matrices, orders of magnitude faster. clDice still evaluates
per touching pair, but only on bbox crops.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def contingency(gt: np.ndarray, pred: np.ndarray):
    """Sparse intersection table between two label volumes.

    Returns (gt_ids [N], pred_ids [M], inter [N, M], gt_areas [N],
    pred_areas [M]); ids sorted ascending, background excluded.
    """
    assert gt.shape == pred.shape, "input volumes must have the same shape"
    gt = gt.astype(np.int64).ravel()
    pred = pred.astype(np.int64).ravel()

    gt_ids, gt_areas = np.unique(gt[gt > 0], return_counts=True)
    pred_ids, pred_areas = np.unique(pred[pred > 0], return_counts=True)

    inter = np.zeros((len(gt_ids), len(pred_ids)), np.int64)
    both = (gt > 0) & (pred > 0)
    if both.any():
        k = pred.max() + 1
        codes, counts = np.unique(gt[both] * k + pred[both], return_counts=True)
        gi = np.searchsorted(gt_ids, codes // k)
        pj = np.searchsorted(pred_ids, codes % k)
        inter[gi, pj] = counts
    return gt_ids, pred_ids, inter, gt_areas, pred_areas


def mask_iou(gt: np.ndarray, pred: np.ndarray) -> np.ndarray:
    """NxM matrix of per-instance IoU (reference mask_iou lib.py:190-229)."""
    _, _, inter, ga, pa = contingency(gt, pred)
    union = ga[:, None] + pa[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1), 0.0)


def mask_dice(gt: np.ndarray, pred: np.ndarray) -> np.ndarray:
    """NxM matrix of per-instance Dice (reference mask_dice lib.py:232-275)."""
    _, _, inter, ga, pa = contingency(gt, pred)
    denom = ga[:, None] + pa[None, :]
    return np.where(denom > 0, 2.0 * inter / np.maximum(denom, 1), 0.0)


def mask_soft_cldice(gt: np.ndarray, pred: np.ndarray, iters: int = 3) -> np.ndarray:
    """NxM matrix of per-instance soft-clDice on touching pairs only
    (reference mask_soft_cldice lib.py:278-314), each evaluated on the pair's
    joint bounding box."""
    import jax
    import jax.numpy as jnp

    from skoots_tpu.train.losses import soft_cldice

    gt_ids, pred_ids, inter, _, _ = contingency(gt, pred)
    out = np.zeros_like(inter, np.float32)
    crit = soft_cldice(iters=iters)

    # precompute bounding boxes
    def bboxes(vol, ids):
        bb = {}
        for u in ids:
            nz = np.argwhere(vol == u)
            bb[u] = (nz.min(0), nz.max(0) + 1)
        return bb

    gbb = bboxes(gt, gt_ids)
    pbb = bboxes(pred, pred_ids)

    def bucket(n: int) -> int:
        # pad crops to power-of-two shape buckets: a volume with hundreds of
        # instances otherwise mints a fresh XLA program per distinct bbox
        b = 8
        while b < n:
            b *= 2
        return b

    crit_j = jax.jit(crit)
    for i, j in np.argwhere(inter > 0):
        lo = np.minimum(gbb[gt_ids[i]][0], pbb[pred_ids[j]][0])
        hi = np.maximum(gbb[gt_ids[i]][1], pbb[pred_ids[j]][1])
        sl = tuple(slice(a, b) for a, b in zip(lo, hi))
        a = (gt[sl] == gt_ids[i]).astype(np.float32)
        b = (pred[sl] == pred_ids[j]).astype(np.float32)
        # zero padding is clDice-neutral (soft skeleton of background is 0)
        pads = [(0, bucket(n) - n) for n in a.shape]
        a = np.pad(a, pads)[None, ..., None]
        b = np.pad(b, pads)[None, ..., None]
        # soft_cldice returns a LOSS (1 - clDice); the table stores the score
        out[i, j] = 1.0 - float(crit_j(jnp.asarray(b), jnp.asarray(a)))
    return out


def accuracies_from_iou(iou: np.ndarray, thr: float = 0.1) -> Tuple[int, int, int]:
    """(TP, FP, FN) at an IoU threshold (reference lib.py:170-187): a GT
    instance is matched if its best IoU exceeds thr; an unmatched prediction
    is a FP."""
    if iou.size == 0:
        n_gt = iou.shape[0]
        n_pred = iou.shape[1]
        return 0, n_pred, n_gt
    gt_matched = iou.max(axis=1) > thr
    pred_matched = iou.max(axis=0) > thr
    tp = int(gt_matched.sum())
    fn = int((~gt_matched).sum())
    fp = int((~pred_matched).sum())
    return tp, fp, fn


def f1_score(tp: int, fp: int, fn: int) -> float:
    """(reference lib.py:358-361)"""
    denom = 2 * tp + fp + fn
    return 2 * tp / denom if denom else 0.0


def get_segmentation_errors(gt: np.ndarray, pred: np.ndarray) -> Tuple[float, float]:
    """(over_seg_rate, under_seg_rate): fraction of GT instances matching >1
    prediction at IoU>0.2, and vice versa (reference lib.py:400-431)."""
    iou = mask_iou(gt, pred)
    if iou.shape[0] == 0 or iou.shape[1] == 0:
        return 0.0, 0.0
    over = float(((iou > 0.2).sum(axis=1) > 1).mean())
    under = float(((iou > 0.2).sum(axis=0) > 1).mean())
    return over, under


def mask_to_bbox(mask: np.ndarray) -> Dict[int, np.ndarray]:
    """Per-instance 3D bounding boxes [x0,y0,z0,x1,y1,z1] (reference
    lib.py:12-54)."""
    out = {}
    for u in np.unique(mask):
        if u == 0:
            continue
        nz = np.argwhere(mask == u)
        out[int(u)] = np.concatenate([nz.min(0), nz.max(0) + 1])
    return out


def box_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """3D box IoU between [N, 6] and [M, 6] boxes (reference lib.py:77-125)."""
    a = np.asarray(a, np.float64).reshape(-1, 6)
    b = np.asarray(b, np.float64).reshape(-1, 6)
    lo = np.maximum(a[:, None, :3], b[None, :, :3])
    hi = np.minimum(a[:, None, 3:], b[None, :, 3:])
    inter = np.prod(np.maximum(hi - lo, 0), axis=-1)
    va = np.prod(a[:, 3:] - a[:, :3], axis=-1)
    vb = np.prod(b[:, 3:] - b[:, :3], axis=-1)
    union = va[:, None] + vb[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)
