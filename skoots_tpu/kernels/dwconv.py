"""Pallas TPU kernel: 3D depthwise convolution (the ConvNeXt 7^3 conv).

XLA's lowering of 3-spatial-dim grouped convolutions on TPU is the single
hottest op in the UNeXT forward pass (~20 ms per 1 Mvox block at C=32, vs
~3 ms of VPU roofline). This kernel tiles the volume over (X, Y), DMAs each
halo slab HBM->VMEM once, and accumulates the k^3 taps as shifted
vector FMAs from VMEM — one pass over the data.

Loop structure keeps Mosaic compile time sane: a fori_loop over the k*k
(dx, dy) taps with dynamic sub-slices on the leading dims, and a static
unroll over dz (lane-adjacent axis).

Math-identical to lax.conv_general_dilated(..., feature_group_count=C,
padding='SAME') with NHWDC/HWDIO layout + bias.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dw_kernel(x_hbm, w_ref, b_ref, o_ref, slab, sem, *, bx, by, k, z, c):
    i = pl.program_id(0)
    j = pl.program_id(1)

    # DMA the halo slab for this (i, j) tile: [bx+k-1, by+k-1, z+k-1, c]
    cp = pltpu.make_async_copy(
        x_hbm.at[
            pl.ds(i * bx, bx + k - 1),
            pl.ds(j * by, by + k - 1),
            slice(None),
            slice(None),
        ],
        slab,
        sem,
    )
    cp.start()
    cp.wait()

    acc0 = jnp.zeros((bx, by, z, c), jnp.float32)

    def body(t, acc):
        dx = t // k
        dy = t % k
        sub = slab[pl.ds(dx, bx), pl.ds(dy, by)]  # [bx, by, z+k-1, c]
        for dz in range(k):  # static unroll on the minor axis
            w = w_ref[dx, dy, dz]  # [c]
            acc = acc + sub[:, :, dz : dz + z, :].astype(jnp.float32) * w.astype(jnp.float32)
        return acc

    acc = jax.lax.fori_loop(0, k * k, body, acc0)
    o_ref[...] = (acc + b_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("bx", "by", "interpret"))
def _dwconv3d_call(x, w, b, bx, by, interpret=False):
    xs, ys, zs, c = x.shape
    k = w.shape[0]
    half = (k - 1) // 2
    # Mosaic tiles the sublane (z) dim by 8: round the haloed z extent up
    zslab = ((zs + k - 1 + 7) // 8) * 8
    xp = jnp.pad(
        x, ((half, half), (half, half), (half, zslab - zs - half), (0, 0))
    )
    grid = (xs // bx, ys // by)
    out = pl.pallas_call(
        partial(_dw_kernel, bx=bx, by=by, k=k, z=zs, c=c),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # padded input stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights [k,k,k,c]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias [c]
        ],
        out_specs=pl.BlockSpec(
            (bx, by, zs, c), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((xs, ys, zs, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bx + k - 1, by + k - 1, zslab, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, w, b)
    return out


def dwconv3d_pallas(
    x: jax.Array,
    weights: jax.Array,
    bias: jax.Array | None = None,
    block: tuple[int, int] = (16, 128),
    interpret: bool = False,
) -> jax.Array:
    """Depthwise 3D convolution, SAME padding.

    Args:
        x: ``[B, X, Y, Z, C]`` (or ``[X, Y, Z, C]``).
        weights: ``[k, k, k, C]`` per-channel taps (flax kernel
            ``[k,k,k,1,C]`` squeezed).
        bias: ``[C]`` or None.
        block: (bx, by) spatial tile; X % bx == 0 and Y % by == 0 required
            (shrunk automatically otherwise).
    """
    squeeze = x.ndim == 4
    if squeeze:
        x = x[None]
    bsz, xs, ys, zs, c = x.shape
    if weights.ndim == 5:
        weights = weights[:, :, :, 0, :]
    k = weights.shape[0]
    bias = jnp.zeros((c,), x.dtype) if bias is None else bias

    bx = _fit(xs, block[0])
    by = _fit(ys, block[1])

    def one(xi):
        return _dwconv3d_call(xi, weights, bias, bx, by, interpret=interpret)

    out = jax.vmap(one)(x)
    return out[0] if squeeze else out


def _fit(dim: int, want: int) -> int:
    b = min(want, dim)
    while dim % b:
        b -= 1
    return b


# --------------------------------------------------------------------------
# Packed-lane variant: fills all 128 VPU lanes at C < 128 by packing G = 128/C
# consecutive z-slices into the lane dimension ([X, Y, Z, C] -> [X, Y, Z/G,
# G*C], a pure reshape). The k z-taps are materialized as k z-shifted copies
# OUTSIDE the kernel (cheap XLA pads/slices; ~k x HBM traffic, trivial vs the
# VPU work), so every in-kernel slice lands on unconstrained leading dims.


def _dw_packed_kernel(x_hbm, w_ref, b_ref, o_ref, slab, sem, *, bx, by, k, zp,
                      lanes, acc_dtype=jnp.float32):
    i = pl.program_id(0)
    j = pl.program_id(1)
    ox = pl.multiple_of(i * bx, 8)
    oy = pl.multiple_of(j * by, 8)
    acc = jnp.zeros((bx, by, zp, lanes), acc_dtype)

    for dz in range(k):  # static unroll: DMA one z-shifted copy at a time
        cp = pltpu.make_async_copy(
            x_hbm.at[
                dz,
                pl.ds(ox, bx + k - 1),
                pl.ds(oy, by + k - 1),
                slice(None),
                slice(None),
            ],
            slab,
            sem,
        )
        cp.start()
        cp.wait()

        # static unroll: every slab read is a compile-time ref slice
        for dx in range(k):
            for dy in range(k):
                w = w_ref[dx, dy, dz]  # [lanes]
                sub = slab[dx : dx + bx, dy : dy + by]
                acc = acc + sub.astype(acc_dtype) * w.astype(acc_dtype)

    o_ref[...] = (acc + b_ref[...].astype(acc.dtype)).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("bx", "by", "k", "interpret", "bf16_acc"))
def _dw_packed_call(x_shifted, wpacked, bpacked, bx, by, k, interpret=False,
                    bf16_acc=False):
    _, xs_p, ys_p, zp, lanes = x_shifted.shape
    xs = xs_p - (k - 1)
    ys = ys_p - (k - 1)
    grid = (xs // bx, ys // by)
    return pl.pallas_call(
        partial(_dw_packed_kernel, bx=bx, by=by, k=k, zp=zp, lanes=lanes,
                acc_dtype=jnp.bfloat16 if bf16_acc else jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bx, by, zp, lanes), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((xs, ys, zp, lanes), x_shifted.dtype),
        scratch_shapes=[
            pltpu.VMEM((bx + k - 1, by + k - 1, zp, lanes), x_shifted.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x_shifted, wpacked, bpacked)


def dwconv3d_pallas_packed(
    x: jax.Array,
    weights: jax.Array,
    bias: jax.Array | None = None,
    block: tuple[int, int] = (16, 16),
    interpret: bool = False,
    bf16_acc: bool = False,
) -> jax.Array:
    """Packed-lane depthwise 3D conv, SAME padding. Requirements:
    128 % C == 0 and Z % (128 // C) == 0 (else use :func:`dwconv3d_pallas`).
    """
    squeeze = x.ndim == 4
    if squeeze:
        x = x[None]
    bsz, xs, ys, zs, c = x.shape
    if weights.ndim == 5:
        weights = weights[:, :, :, 0, :]
    k = weights.shape[0]
    half = (k - 1) // 2
    g = 128 // c
    assert 128 % c == 0 and zs % g == 0, (xs, ys, zs, c)
    zp = zs // g
    # zp is the sublane dim of VMEM buffers: pad to a multiple of 8 (the
    # padded packed rows compute garbage that is sliced off afterwards)
    zp8 = ((zp + 7) // 8) * 8

    bias = jnp.zeros((c,), x.dtype) if bias is None else bias
    wpacked = jnp.tile(weights, (1, 1, 1, g))  # [k,k,k,128]
    bpacked = jnp.tile(bias, (g,)).astype(x.dtype)

    bx = _fit(xs, block[0])
    by = _fit(ys, block[1])

    def one(xi):
        xp = jnp.pad(xi, ((half, half), (half, half), (half, half), (0, 0)))
        shifted = jnp.stack(
            [
                jnp.pad(
                    jax.lax.dynamic_slice_in_dim(xp, dz, zs, axis=2).reshape(
                        xs + k - 1, ys + k - 1, zp, g * c
                    ),
                    ((0, 0), (0, 0), (0, zp8 - zp), (0, 0)),
                )
                for dz in range(k)
            ]
        )  # [k, X+k-1, Y+k-1, zp8, 128]
        out = _dw_packed_call(shifted, wpacked, bpacked, bx, by, k,
                              interpret=interpret, bf16_acc=bf16_acc)
        return out[:, :, :zp].reshape(xs, ys, zs, c)

    out = jax.vmap(one)(x)
    return out[0] if squeeze else out
