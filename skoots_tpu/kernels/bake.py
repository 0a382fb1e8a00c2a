"""Pallas TPU kernel: nearest-skeleton-vertex "bake".

TPU-native equivalent of the reference's Triton kernel
(/root/reference/skoots/lib/skeleton.py:51-251), which launches one GPU
program per voxel. Here the grid is over VOXEL CHUNKS: each program holds a
chunk of mask ids in VMEM, streams the packed skeleton points [P, 3] in
blocks, and keeps a running (min-distance, best-point) accumulator entirely
in vector registers — no gather at the end, the winning coordinates are
carried by ``where`` selects. Anisotropy weights multiply squared per-axis
distances exactly as the Triton kernel does (skeleton.py:198-202).

Tie-breaking: first minimal point wins (strict <), deterministic. The Triton
kernel's max-select over ties (skeleton.py:207-211) can mix coordinates from
different tie points; ties are degenerate either way.

Layout notes: voxels are processed as flat [CHUNK]-sized vectors reshaped to
(8, 128) lanes; points stream in [PB]-sized blocks broadcast across the lane
dim, giving [CHUNK, PB] distance tiles on the VPU.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 1024  # voxels per program
PBLOCK = 512  # skeleton points per inner step


def _bake_kernel(
    mask_ref,  # [CHUNK] int32 (VMEM block)
    points_ref,  # [P, 3] float32 (full, VMEM)
    pids_ref,  # [P] int32 (full, VMEM)
    w_ref,  # [1, 3] float32 anisotropy weights (SMEM)
    dims_ref,  # [1, 3] int32 (X, Y, Z) volume dims (SMEM)
    baked_ref,  # [CHUNK, 3] float32 out
    dist_ref,  # [CHUNK] float32 out
):
    ci = pl.program_id(0)
    mask = mask_ref[:]  # [CHUNK]

    # voxel coordinates from the flat index
    ysz = dims_ref[0, 1]
    zsz = dims_ref[0, 2]
    flat = ci * CHUNK + jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)[:, 0]
    vz = (flat % zsz).astype(jnp.float32)
    vy = ((flat // zsz) % ysz).astype(jnp.float32)
    vx = (flat // (zsz * ysz)).astype(jnp.float32)

    wx = w_ref[0, 0]
    wy = w_ref[0, 1]
    wz = w_ref[0, 2]

    p_total = points_ref.shape[0]
    n_blocks = p_total // PBLOCK

    big = jnp.float32(3.4e38)
    init = (
        jnp.full((CHUNK,), big, jnp.float32),  # best squared distance
        jnp.zeros((CHUNK,), jnp.float32),  # best x
        jnp.zeros((CHUNK,), jnp.float32),  # best y
        jnp.zeros((CHUNK,), jnp.float32),  # best z
    )

    def body(b, carry):
        best_d, bx, by, bz = carry
        off = b * PBLOCK
        pts = points_ref[pl.ds(off, PBLOCK), :]  # [PB, 3]
        pid = pids_ref[pl.ds(off, PBLOCK)]  # [PB]
        px = pts[:, 0]
        py = pts[:, 1]
        pz = pts[:, 2]
        dx = vx[:, None] - px[None, :]
        dy = vy[:, None] - py[None, :]
        dz = vz[:, None] - pz[None, :]
        d2 = dx * dx * wx + dy * dy * wy + dz * dz * wz  # [CHUNK, PB]
        valid = (pid[None, :] == mask[:, None]) & (pid[None, :] != 0)
        d2 = jnp.where(valid, d2, big)
        # block-local winner
        loc_d = jnp.min(d2, axis=1)  # [CHUNK]
        loc_i = jnp.argmin(d2, axis=1)  # [CHUNK]
        onehot = loc_i[:, None] == jax.lax.broadcasted_iota(
            jnp.int32, (CHUNK, PBLOCK), 1
        )
        loc_x = jnp.sum(jnp.where(onehot, px[None, :], 0.0), axis=1)
        loc_y = jnp.sum(jnp.where(onehot, py[None, :], 0.0), axis=1)
        loc_z = jnp.sum(jnp.where(onehot, pz[None, :], 0.0), axis=1)
        better = loc_d < best_d
        return (
            jnp.where(better, loc_d, best_d),
            jnp.where(better, loc_x, bx),
            jnp.where(better, loc_y, by),
            jnp.where(better, loc_z, bz),
        )

    best_d, bx, by, bz = jax.lax.fori_loop(0, n_blocks, body, init)

    found = best_d < big
    baked_ref[:, 0] = jnp.where(found, bx, 0.0)
    baked_ref[:, 1] = jnp.where(found, by, 0.0)
    baked_ref[:, 2] = jnp.where(found, bz, 0.0)
    dist_ref[:] = jnp.where(found, jnp.sqrt(jnp.maximum(best_d, 0.0)), 0.0)


@partial(jax.jit, static_argnames=("interpret",))
def _bake_call(mask_flat, points, pids, w, dims, interpret=False):
    v = mask_flat.shape[0]
    grid = (v // CHUNK,)
    baked, dist = pl.pallas_call(
        _bake_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((CHUNK,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((CHUNK, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((v, 3), jnp.float32),
            jax.ShapeDtypeStruct((v,), jnp.float32),
        ],
        interpret=interpret,
    )(mask_flat, points, pids, w, dims)
    return baked, dist


def bake_skeleton_pallas(
    masks: jax.Array,
    points: jax.Array,
    pids: jax.Array,
    anisotropy: Tuple[float, float, float] = (1.0, 1.0, 1.0),
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Per-voxel nearest own-instance skeleton vertex (Pallas kernel).

    Args:
        masks: ``[X, Y, Z]`` int32 instance ids.
        points: ``[P, 3]`` float32 packed skeleton vertices (P % 512 == 0 or
            padded here; pad ids must be 0).
        pids: ``[P]`` int32 instance id per point.
        anisotropy: per-axis weights on squared distances.
        interpret: run in the Pallas interpreter (CPU testing).

    Returns:
        baked ``[X, Y, Z, 3]`` float32, dist ``[X, Y, Z]`` float32.
    """
    x, y, z = masks.shape
    v = x * y * z
    vpad = ((v + CHUNK - 1) // CHUNK) * CHUNK
    mask_flat = jnp.pad(masks.reshape(-1).astype(jnp.int32), (0, vpad - v))

    p = points.shape[0]
    ppad = ((p + PBLOCK - 1) // PBLOCK) * PBLOCK
    points = jnp.pad(points.astype(jnp.float32), ((0, ppad - p), (0, 0)))
    pids = jnp.pad(pids.astype(jnp.int32), (0, ppad - p))

    w = jnp.asarray(anisotropy, jnp.float32).reshape(1, 3)
    dims = jnp.asarray([[x, y, z]], jnp.int32)

    baked, dist = _bake_call(mask_flat, points, pids, w, dims, interpret=interpret)
    return baked[:v].reshape(x, y, z, 3), dist[:v].reshape(x, y, z)
