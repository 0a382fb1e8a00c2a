"""Skeleton ops: baking, painting and embedding lookup.

TPU-native re-design of /root/reference/skoots/lib/skeleton.py.

The hot op is ``bake_skeleton`` — per voxel, the nearest (anisotropy-weighted)
skeleton vertex of the instance that voxel belongs to. The reference launches
a Triton kernel with one GPU program per voxel that scans its instance's
points (skeleton.py:51-251). On TPU we reshape the problem onto the MXU:
all skeleton points of all instances are packed into one ``[P, 3]`` tensor
with per-point instance ids, and the squared distance matrix between a chunk
of voxels and all P points is a rank-3 matmul

    d2[v, p] = |c_v|^2 + |s_p|^2 - 2 c_v . s_p        (anisotropy-weighted)

masked so voxel v only sees points with ``point_id == mask[v]``. A
``lax.map`` over voxel chunks bounds the [C, P] intermediate. This does the
same total work as the Triton kernel (each voxel still reduces over its own
instance's points — the mask just runs them in one dense sweep) but as large
fused matmul+reduce blocks instead of 1.8M scalar programs.

A Pallas kernel with a P-blocked running-argmin lives in
``skoots_tpu.kernels.bake``; ``bake_skeleton(impl="auto")`` dispatches to it
on TPU when P >= ``_PALLAS_MIN_P`` (measured crossover, tools/bench_bake.py —
the matmul path wins at small P where the [chunk, P] tile underfeeds the MXU
less than the VPU distance sweep costs; mirrors the reference's triton/torch
dispatch, skeleton.py:494-507).
"""

from __future__ import annotations

import os
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from skoots_tpu.kernels.bake import bake_skeleton_pallas
from skoots_tpu.ops.vec2embed import coordinate_mesh

# Measured on v5e (tools/bench_bake.py): the Pallas running-argmin kernel
# overtakes the MXU matmul-distance path once the point count is large
# enough that streaming [CHUNK, PBLOCK] VPU tiles beats [4096, P] matmuls.
_PALLAS_MIN_P = int(os.environ.get("SKOOTS_BAKE_PALLAS_MIN_P", "8192"))


class PackedSkeletons(NamedTuple):
    """All instance skeletons packed into flat, static-shape arrays.

    points: ``[P, 3]`` float32 skeleton vertex coordinates (padded).
    ids:    ``[P]`` int32 instance id per point; 0 marks padding.
    """

    points: jax.Array
    ids: jax.Array


def pack_skeletons(
    skeletons: Dict[int, np.ndarray], pad_to: int | None = None
) -> PackedSkeletons:
    """Pack a reference-style ``{id: [M, 3]}`` skeleton dict into flat arrays.

    ``pad_to`` rounds P up to a static size (bucketing avoids re-jitting).
    The reference packs to a ragged ``[N, M_max, 3]`` grid with id/len maps
    (skeleton.py:298-323); a flat packing wastes no space on ragged rows.
    """
    pts, ids = [], []
    for k, v in skeletons.items():
        if int(k) == -1:
            continue
        v = np.asarray(v, dtype=np.float32).reshape(-1, 3)
        pts.append(v)
        ids.append(np.full((v.shape[0],), int(k), dtype=np.int32))
    if pts:
        points = np.concatenate(pts, axis=0)
        pids = np.concatenate(ids, axis=0)
    else:
        points = np.zeros((0, 3), np.float32)
        pids = np.zeros((0,), np.int32)
    p = points.shape[0]
    target = pad_to if pad_to is not None else max(_round_up(p, 128), 128)
    assert target >= p, f"pad_to={target} < number of points {p}"
    points = np.pad(points, ((0, target - p), (0, 0)))
    pids = np.pad(pids, (0, target - p))  # id 0 = padding
    return PackedSkeletons(jnp.asarray(points), jnp.asarray(pids))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _bake_chunk(
    coords: jax.Array,  # [C, 3] float32 (anisotropy-weighted)
    mask_ids: jax.Array,  # [C] int32
    wpoints: jax.Array,  # [P, 3] float32 (anisotropy-weighted)
    points: jax.Array,  # [P, 3] float32 (raw coordinates to emit)
    pids: jax.Array,  # [P] int32
) -> Tuple[jax.Array, jax.Array]:
    pnorm = jnp.sum(wpoints * wpoints, axis=-1)  # [P]
    cnorm = jnp.sum(coords * coords, axis=-1)  # [C]
    cross = jax.lax.dot_general(
        coords,
        wpoints,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [C, P]
    d2 = cnorm[:, None] + pnorm[None, :] - 2.0 * cross
    valid = (pids[None, :] == mask_ids[:, None]) & (pids[None, :] != 0)
    d2 = jnp.where(valid, d2, jnp.inf)
    best = jnp.argmin(d2, axis=1)  # [C]
    mind2 = jnp.take_along_axis(d2, best[:, None], axis=1)[:, 0]
    has_match = jnp.isfinite(mind2)
    closest = points[best]  # [C, 3]
    closest = jnp.where(has_match[:, None], closest, 0.0)
    dist = jnp.where(has_match, jnp.sqrt(jnp.maximum(mind2, 0.0)), 0.0)
    return closest, dist


def bake_skeleton(
    masks: jax.Array,
    skeletons: PackedSkeletons | Dict[int, np.ndarray],
    anisotropy: Tuple[float, float, float] = (1.0, 1.0, 1.0),
    average: bool = True,
    chunk: int = 4096,
    return_distance: bool = False,
    impl: str = "auto",
):
    """Per-voxel closest skeleton vertex of the voxel's own instance.

    Args:
        masks: ``[X, Y, Z]`` integer instance ids (0 = background).
        skeletons: :class:`PackedSkeletons` (or a reference-style dict, packed
            on the fly — prefer pre-packing in input pipelines).
        anisotropy: per-axis distance weights (reference skeleton.py:198-202
            multiplies *squared* per-axis distances by these weights).
        average: smooth the baked field with a 3^3 nonzero-mean
            (:func:`average_baked_skeletons`), as the training path does.
        chunk: voxels per matmul block (bounds the [chunk, P] intermediate).
        return_distance: also return ``[X, Y, Z]`` distances.
        impl: "auto" (Pallas kernel on TPU when P >= _PALLAS_MIN_P, else the
            MXU matmul path), "mxu", or "pallas".

    Returns:
        baked ``[X, Y, Z, 3]`` float32 (0 where background), and optionally
        the distance map.
    """
    if isinstance(skeletons, dict):
        skeletons = pack_skeletons(skeletons)

    use_pallas = impl == "pallas" or (
        impl == "auto"
        and jax.default_backend() == "tpu"
        and skeletons.points.shape[0] >= _PALLAS_MIN_P
    )
    if use_pallas:
        baked, dist = bake_skeleton_pallas(
            masks, skeletons.points, skeletons.ids, anisotropy
        )
        if average:
            baked = average_baked_skeletons(baked[None])[0]
        if return_distance:
            return baked, dist
        return baked

    x, y, z = masks.shape
    v = x * y * z
    chunk = min(chunk, _round_up(v, 8))

    w = jnp.sqrt(jnp.asarray(anisotropy, jnp.float32))
    coords = coordinate_mesh((x, y, z)).reshape(v, 3)
    mask_flat = masks.reshape(v).astype(jnp.int32)

    pad_v = _round_up(v, chunk)
    coords = jnp.pad(coords, ((0, pad_v - v), (0, 0)))
    mask_flat = jnp.pad(mask_flat, (0, pad_v - v))

    wpoints = skeletons.points * w[None, :]
    n_chunks = pad_v // chunk

    def body(args):
        c, m = args
        return _bake_chunk(c * w[None, :], m, wpoints, skeletons.points, skeletons.ids)

    closest, dist = jax.lax.map(
        body,
        (coords.reshape(n_chunks, chunk, 3), mask_flat.reshape(n_chunks, chunk)),
    )
    baked = closest.reshape(pad_v, 3)[:v].reshape(x, y, z, 3)
    dist = dist.reshape(pad_v)[:v].reshape(x, y, z)

    if average:
        baked = average_baked_skeletons(baked[None])[0]
    if return_distance:
        return baked, dist
    return baked


def average_baked_skeletons(baked: jax.Array, kernel_size: int = 3) -> jax.Array:
    """Mean over the 3^3 neighborhood counting only nonzero entries.

    Matches reference ``average_baked_skeletons`` (skeleton.py:18-48): sum of
    the window divided by the count of strictly-positive entries (clamped to
    >= 1). Implemented as two reduce_windows instead of a 27-tap conv.

    Args:
        baked: ``[B, X, Y, Z, 3]``.
    """
    k = kernel_size
    dims = (1, k, k, k, 1)
    pad = tuple((0, 0) if d == 1 else ((k - 1) // 2, (k - 1) // 2) for d in dims)
    total = jax.lax.reduce_window(
        baked.astype(jnp.float32), 0.0, jax.lax.add, dims, (1,) * 5, pad
    )
    count = jax.lax.reduce_window(
        (baked > 0).astype(jnp.float32), 0.0, jax.lax.add, dims, (1,) * 5, pad
    )
    return total / jnp.maximum(count, 1.0)


def _disk_offsets(radius: int, flank_radius: int) -> np.ndarray:
    """Stamp offsets: a disk of ``radius`` in the center z-plane flanked by
    disks of ``flank_radius`` at z = +/-1 (reference utils.py:421-438)."""

    def disk(r: int) -> np.ndarray:
        g = np.arange(-r, r + 1)
        xx, yy = np.meshgrid(g, g, indexing="ij")
        return (xx * xx + yy * yy) <= r * r

    center = disk(radius)
    flank = disk(flank_radius)
    pad = radius - flank_radius
    flank = np.pad(flank, pad)
    total = np.stack((flank, center, flank), axis=-1)  # [2r+1, 2r+1, 3]
    offs = np.argwhere(total).astype(np.int32)
    offs[:, 2] -= 1
    # NOTE: the reference offsets x/y by radius//2 (utils.py:437), leaving the
    # stamp off-center by ceil(r/2). We center it properly (offset by radius);
    # the skeleton mask is a training target so exact parity is not required,
    # and a centered stamp is strictly more correct.
    offs[:, 0] -= radius
    offs[:, 1] -= radius
    return offs


def skeleton_to_mask(
    skeletons: PackedSkeletons | Dict[int, np.ndarray],
    shape: Tuple[int, int, int],
    radius: int = 7,
    flank_radius: int = 3,
) -> jax.Array:
    """Paint a binary mask around every skeleton vertex (reference
    skeleton.py:531-593): disk+flank stamp scattered at each point, clipped to
    the volume. Out-of-range points are dropped by scatter mode='drop'.

    Returns ``[X, Y, Z]`` float32.
    """
    if isinstance(skeletons, dict):
        skeletons = pack_skeletons(skeletons)
    offs = jnp.asarray(_disk_offsets(radius, flank_radius))  # [K, 3]
    pts = jnp.round(skeletons.points).astype(jnp.int32)  # [P, 3]
    valid = skeletons.ids != 0
    # send padded points far out of range so 'drop' discards them
    pts = jnp.where(valid[:, None], pts, jnp.int32(-(1 << 30)))
    coords = pts[:, None, :] + offs[None, :, :]  # [P, K, 3]
    coords = coords.reshape(-1, 3)
    mask = jnp.zeros(shape, jnp.float32)
    return mask.at[coords[:, 0], coords[:, 1], coords[:, 2]].set(1.0, mode="drop")


def index_skeleton_by_embed(skeleton: jax.Array, embed: jax.Array) -> jax.Array:
    """Instance id per voxel: the labeled-skeleton voxel its embedding lands on.

    Reference skeleton.py:656-695. ``skeleton`` is ``[Xs, Ys, Zs]`` int labels;
    ``embed`` is ``[B, X, Y, Z, 3]`` (embedding coordinates in skeleton space).
    Returns ``[B, X, Y, Z]`` int32.
    """
    sx, sy, sz = skeleton.shape
    idx = jnp.round(embed).astype(jnp.int32)
    ix = jnp.clip(idx[..., 0], 0, sx - 1)
    iy = jnp.clip(idx[..., 1], 0, sy - 1)
    iz = jnp.clip(idx[..., 2], 0, sz - 1)
    return skeleton.astype(jnp.int32)[ix, iy, iz]
