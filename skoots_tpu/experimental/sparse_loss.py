"""Sparse (weakly-supervised) losses.

Re-design of /root/reference/skoots/experimental/sparse_loss.py: trains
without dense instance masks — supervision is (a) skeleton annotations and
(b) certain-background labels. The reference loops over batch items and
re-bakes merged skeletons per item with its Triton kernel
(sparse_loss.py:254-353); here the whole thing is a vmapped pure function
over fixed-shape packed skeleton arrays, so it lives inside the jitted train
step.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from skoots_tpu.ops.embed2prob import baked_embed_to_prob
from skoots_tpu.ops.skeleton import PackedSkeletons, bake_skeleton

_NEIGHBOR_OFFSETS = [
    (dx, dy, dz)
    for dx in (-1, 0, 1)
    for dy in (-1, 0, 1)
    for dz in (-1, 0, 1)
    if not (dx == 0 and dy == 0 and dz == 0)
]


def vector_direction_penalty(vectors: jax.Array) -> jax.Array:
    """Neighborhood direction-smoothness penalty (sparse_loss.py:19-65):
    per voxel, mean over nonzero 3^3 neighbors of (1 - cos^2) between the
    center vector and the neighbor vector.

    vectors: ``[B, X, Y, Z, 3]`` (channels-last). Returns ``[B, X, Y, Z]``.
    """
    v = vectors.astype(jnp.float32)
    center = v
    c_mag = jnp.sqrt(jnp.sum(center * center, -1) + 1e-8)

    acc = jnp.zeros(v.shape[:-1], jnp.float32)
    count = jnp.zeros(v.shape[:-1], jnp.float32)
    for off in _NEIGHBOR_OFFSETS:
        nb = v
        valid_edge = jnp.ones(v.shape[:-1], bool)
        for ax, d in enumerate(off):
            if d == 0:
                continue
            nb = jnp.roll(nb, d, axis=1 + ax)
            idx = jax.lax.broadcasted_iota(jnp.int32, v.shape[:-1], 1 + ax)
            sz = v.shape[1 + ax]
            edge = idx == (0 if d == 1 else sz - 1)
            valid_edge = valid_edge & ~edge
        nb = jnp.where(valid_edge[..., None], nb, 0.0)
        n_mag = jnp.sqrt(jnp.sum(nb * nb, -1) + 1e-8)
        dot = jnp.sum(nb * center, -1)
        cos2 = (dot / (n_mag * c_mag + 1e-8)) ** 2
        sin2 = 1.000001 - cos2
        valid = jnp.sum(nb * nb, -1) > 1e-8
        acc = acc + jnp.where(valid, sin2, 0.0)
        count = count + valid.astype(jnp.float32)
    return acc / jnp.maximum(count, 1.0)


def closest_skeleton(
    points: jax.Array,
    valid: jax.Array,
    shape: Tuple[int, int, int],
    anisotropy: Tuple[float, float, float],
) -> Tuple[jax.Array, jax.Array]:
    """Bake ALL skeleton points as one merged instance against an all-ones
    mask (sparse_loss.py:68-123). Returns (baked [X,Y,Z,3], dist [X,Y,Z]);
    with no valid points: baked=1000, dist=100 (reference fallbacks)."""
    ones = jnp.ones(shape, jnp.int32)
    packed = PackedSkeletons(
        points=points.astype(jnp.float32),
        ids=jnp.where(valid, 1, 0).astype(jnp.int32),
    )
    baked, dist = bake_skeleton(
        ones, packed, anisotropy=anisotropy, average=True, return_distance=True
    )
    any_valid = jnp.any(valid)
    baked = jnp.where(any_valid, baked, 1000.0)
    dist = jnp.where(any_valid, dist, 100.0)
    return baked, dist


def _masked_mse(value: jax.Array, mask: jax.Array) -> jax.Array:
    s = jnp.sum(mask)
    return jnp.sum(value * value * mask) / jnp.maximum(s, 1.0)


def sparse_background_loss(
    embed_prob: jax.Array, background: jax.Array, multiplier: float
) -> jax.Array:
    """MSE of embedding probability toward 0 on certain-background voxels
    (sparse_loss.py:145-172)."""
    mask = (background > 0.5).astype(jnp.float32)
    return _masked_mse(embed_prob, mask) * multiplier


def sparse_embed_loss(
    embed_prob: jax.Array,
    skeleton_distance: jax.Array,
    background: jax.Array,
    distance_thr: float,
) -> jax.Array:
    """MSE of embedding probability toward 1 within ``distance_thr`` of a
    skeleton, excluding certain background (sparse_loss.py:175-212). With no
    qualifying voxel, falls back to the single closest voxel."""
    mask = (skeleton_distance < distance_thr) & (background <= 0.5)
    maskf = mask.astype(jnp.float32)
    count = jnp.sum(maskf)
    main = jnp.sum((1.0 - embed_prob) ** 2 * maskf) / jnp.maximum(count, 1.0)
    idx = jnp.argmin(skeleton_distance.reshape(-1))
    fallback = (1.0 - embed_prob.reshape(-1)[idx]) ** 2
    return jnp.where(count > 0, main, fallback)


def embed_distance(embed: jax.Array, baked: jax.Array) -> jax.Array:
    """Euclidean distance embedding <-> baked skeleton (sparse_loss.py:124-142).
    Channels-last [X,Y,Z,3] -> [X,Y,Z]."""
    d = embed.astype(jnp.float32) - baked.astype(jnp.float32)
    return jnp.sqrt(jnp.sum(d * d, -1))


def sparse_loss(
    embed: jax.Array,  # [B, X, Y, Z, 3]
    vectors: jax.Array,  # [B, X, Y, Z, 3] (scaled: vec * vector_scale)
    points: jax.Array,  # [B, P, 3]
    valid: jax.Array,  # [B, P] bool
    background: jax.Array,  # [B, X, Y, Z, 1]
    semantic: jax.Array,  # [B, X, Y, Z, 1] (model output)
    sigma: jax.Array,  # [3]
    anisotropy: Tuple[float, float, float],
    distance_thr: float,
    bg_multiplier: float,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(background_loss, embed_loss, embed_prob) — sparse_loss.py:254-353."""
    shape = embed.shape[1:4]

    def per_item(embed_i, vec_i, pts_i, val_i, bg_i):
        baked, dist = closest_skeleton(pts_i, val_i, shape, anisotropy)
        prob = baked_embed_to_prob(embed_i[None], baked[None], sigma)[0, ..., 0]
        bg = bg_i[..., 0]
        a = sparse_background_loss(prob, bg, bg_multiplier)
        b = sparse_embed_loss(prob, embed_distance(embed_i, baked), bg, distance_thr)
        e = sparse_embed_loss(prob, dist, bg, distance_thr)
        f = jnp.mean(vector_direction_penalty(vec_i[None]))
        return a + b + e + f, prob

    embed_losses, probs = jax.vmap(per_item)(
        embed, vectors, points, valid, background
    )
    # semantic head supervised by the thresholded embedding probability
    # (sparse_loss.py:343: dice(embed_prob > 0.2, semantic))
    pred_bin = (probs[..., None] > 0.2).astype(jnp.float32)
    sem = semantic.astype(jnp.float32)
    inter = jnp.sum(pred_bin * sem) + 1e-8
    denom = jnp.sum(pred_bin + sem) + 1e-8
    background_loss = 1.0 - 2.0 * inter / denom
    return background_loss, jnp.mean(embed_losses) / 2.0, probs
