"""Loss functions (functional JAX; reference /root/reference/skoots/train/loss.py).

The reference parallelizes per-batch-item tversky with ``torch.jit.fork``
(loss.py:121-153); here the per-item reduction is a ``vmap`` — the natural
JAX form, fused by XLA. Ground truth arrives already binarized (the train
engine calls ``loss(pred, masks > 0)``, engine.py:468-475), so the reference's
per-instance one-hot expansion (loss.py:176-186) degenerates to the binary
case; we keep exactly that semantics.

All losses take channels-last ``[B, *spatial, C]`` tensors.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp


def _per_item_tversky(pred, gt, alpha, beta, eps):
    pred = pred.astype(jnp.float32).reshape(-1)
    gt = gt.astype(jnp.float32).reshape(-1)
    tp = jnp.sum(pred * gt)
    fp = (jnp.sum(pred * (1.0 - gt)) + 1e-10) * alpha
    fn = jnp.sum((1.0 - pred) * gt) * beta
    return 1.0 - (tp + eps) / (tp + fp + fn + eps)


def tversky(alpha: float, beta: float, eps: float = 1e-8) -> Callable:
    """Tversky loss factory. alpha penalizes FPs, beta penalizes FNs
    (loss.py:95-212). Returns mean over batch items."""

    def fn(pred: jax.Array, gt: jax.Array) -> jax.Array:
        per_item = jax.vmap(
            partial(_per_item_tversky, alpha=alpha, beta=beta, eps=eps)
        )(pred, gt)
        return jnp.mean(per_item)

    return fn


def dice(eps: float = 1e-10) -> Callable:
    """Dice loss (loss.py:60-92)."""

    def fn(pred: jax.Array, gt: jax.Array) -> jax.Array:
        pred = pred.astype(jnp.float32)
        gt = gt.astype(jnp.float32)
        intersection = jnp.sum(pred * gt) + eps
        denominator = jnp.sum(pred + gt) + eps
        return 1.0 - 2.0 * intersection / denominator

    return fn


def jaccard(eps: float = 1e-10) -> Callable:
    """Jaccard/IoU loss (loss.py:24-51)."""

    def fn(pred: jax.Array, gt: jax.Array) -> jax.Array:
        pred = pred.astype(jnp.float32)
        gt = gt.astype(jnp.float32)
        intersection = jnp.sum(pred * gt) + eps
        union = jnp.sum(pred + gt) - intersection + eps
        return 1.0 - intersection / union

    return fn


# ---------------------------------------------------------------- soft clDice
# Max-pool morphology on channels-last tensors (loss.py:269-341, after the
# public clDice reference implementation).


def _maxpool(x: jax.Array, window: tuple[int, int, int]) -> jax.Array:
    dims = (1,) + window + (1,)
    pads = tuple((0, 0) if d == 1 else ((d - 1) // 2,) * 2 for d in dims)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, dims, (1,) * x.ndim, pads
    )


def soft_erode(img: jax.Array) -> jax.Array:
    if img.ndim == 4:  # [B, X, Y, C]
        p1 = -_maxpool3d_2d(-img, (3, 1))
        p2 = -_maxpool3d_2d(-img, (1, 3))
        return jnp.minimum(p1, p2)
    p1 = -_maxpool(-img, (3, 1, 1))
    p2 = -_maxpool(-img, (1, 3, 1))
    p3 = -_maxpool(-img, (1, 1, 3))
    return jnp.minimum(jnp.minimum(p1, p2), p3)


def _maxpool3d_2d(x: jax.Array, window: tuple[int, int]) -> jax.Array:
    dims = (1,) + window + (1,)
    pads = tuple((0, 0) if d == 1 else ((d - 1) // 2,) * 2 for d in dims)
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, dims, (1,) * x.ndim, pads)


def soft_dilate(img: jax.Array) -> jax.Array:
    if img.ndim == 4:
        return _maxpool3d_2d(img, (3, 3))
    return _maxpool(img, (3, 3, 3))


def soft_open(img: jax.Array) -> jax.Array:
    return soft_dilate(soft_erode(img))


def soft_skeletonize(img: jax.Array, iters: int) -> jax.Array:
    """Iterative soft thinning (loss.py:296-310)."""
    skel = jax.nn.relu(img - soft_open(img))
    for _ in range(iters):
        img = soft_erode(img)
        delta = jax.nn.relu(img - soft_open(img))
        skel = skel + jax.nn.relu(delta - skel * delta)
    return skel


def soft_cldice(iters: int = 3, smooth: float = 1.0) -> Callable:
    """Centerline-Dice loss (loss.py:313-341). Operates on the full channel
    stack; unlike the multi-class public version there is no background
    channel to strip here (binary task)."""

    def fn(pred: jax.Array, gt: jax.Array) -> jax.Array:
        pred = pred.astype(jnp.float32)
        gt = gt.astype(jnp.float32)
        sp = soft_skeletonize(pred, iters)
        st = soft_skeletonize(gt, iters)
        tprec = (jnp.sum(sp * gt) + smooth) / (jnp.sum(sp) + smooth)
        tsens = (jnp.sum(st * pred) + smooth) / (jnp.sum(st) + smooth)
        return 1.0 - 2.0 * (tprec * tsens) / (tprec + tsens)

    return fn


def soft_dice_cldice(iters: int = 3, alpha: float = 0.5, smooth: float = 1.0) -> Callable:
    """Blend of dice and clDice (loss.py:361-392)."""
    _dice = dice()
    _cl = soft_cldice(iters, smooth)

    def fn(pred: jax.Array, gt: jax.Array) -> jax.Array:
        return (1.0 - alpha) * _dice(pred, gt) + alpha * _cl(pred, gt)

    return fn


def split_loss(n_iter: int = 2, alpha: float = 2.0) -> Callable:
    """Skeleton-breakage penalty (loss.py:215-263): edges of the prediction
    crossing the (pseudo-distance-weighted) interior of GT get an exponential
    penalty."""
    from skoots_tpu.ops.morphology import binary_erosion

    def fn(pred: jax.Array, gt: jax.Array) -> jax.Array:
        pred = pred.astype(jnp.float32)
        gt = gt.astype(jnp.float32)
        distance = gt
        g = gt
        for _ in range(n_iter):
            g = binary_erosion(g)
            distance = distance + g
        distance = distance / max(n_iter - 1, 1)
        edges = (pred - binary_erosion(pred)) * 2.0
        return jnp.mean(jnp.power(jnp.maximum(edges, 0.0), alpha * distance))

    return fn


_VALID_LOSSES = {
    "tversky": tversky,
    "dice": lambda **kw: dice(**{k: v for k, v in kw.items() if k == "eps"}),
    "jaccard": lambda **kw: jaccard(**{k: v for k, v in kw.items() if k == "eps"}),
    "soft_cldice": soft_cldice,
    "soft_dice_cldice": soft_dice_cldice,
}


def cfg_loss(name: str, keywords: list, values: list) -> Callable:
    """Build a loss from cfg triples (reference engine.py:44-47, 315-335)."""
    if name not in _VALID_LOSSES:
        raise RuntimeError(f"unknown loss {name!r}; valid: {list(_VALID_LOSSES)}")
    kwargs = dict(zip(keywords, values))
    if name == "tversky":
        return tversky(**kwargs)
    return _VALID_LOSSES[name](**kwargs)
