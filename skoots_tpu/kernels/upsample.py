"""Pallas TPU kernel: fused 2x trilinear upsample (decoder UpSampleLayer3D).

The XLA separable-interleave composition (models/unext.py::upsample_trilinear)
costs ~45 ms per 256^2x96 output tile on v5e against a ~2 ms HBM roofline
(runs/fwd_split.json): each per-axis interleave is a stack+reshape that
relayouts the whole (growing) array through HBM three times, in f32.

This kernel does the whole thing in one pass: DMA an edge-padded input
block with a 1-voxel halo HBM->VMEM, run the three separable cascades
(half-pixel centers, f32) in VMEM, write the 8x-larger output block once.
Traffic = read input + write output, the roofline minimum.

VMEM note: the z-axis interleave materialises a ``[..., bz, 2, c]``
intermediate whose sublane dim of 2 Mosaic pads to 8 — a 4x inflation
on that temporary. The grid therefore blocks z as well (1-voxel halo,
like x/y) and ``_pick_blocks`` sizes (bx, by, bz) against a per-step
liveness model so the scoped-VMEM peak stays under ``_VMEM_BUDGET``
(the v5e scoped limit is 16 MB; an unblocked z at C=128 hit 24.7 MB).

Math-identical (f32 cascade, single final round) to the XLA path and to
``jax.image.resize(..., method='trilinear')`` at factor 2 — pinned by
tests/test_pallas_upsample.py. Reference role: bism UpSampleLayer3D
(reference models/unext via lib/utils.py).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interleave(even: jax.Array, odd: jax.Array, axis: int) -> jax.Array:
    """[..., n, ...] x2 -> [..., 2n, ...] with even/odd at 2i / 2i+1."""
    st = jnp.stack([even, odd], axis=axis + 1)
    shape = list(even.shape)
    shape[axis] *= 2
    return st.reshape(shape)


def _up_kernel(x_hbm, o_ref, slab, sem, *, bx, by, bz, c):
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)

    # halo slab [bx+2, by+2, Lz, c_pad] at (i*bx, j*by) of z-chunk k.
    # Mosaic rejects ANY manual-DMA memref_slice of an HBM array whose
    # lane (c) extent is under 128 — the memref type is lane-padded to
    # 128 and the implied full-extent c slice reads as misaligned — so
    # the caller pads c up to 128 on the (8x smaller) input side, and
    # pre-stacks aligned z-chunks into a leading dim (a z-dim slice in
    # the DMA trips the same check). Only (chunk, x, y) are indexed.
    cp = pltpu.make_async_copy(
        x_hbm.at[k, pl.ds(i * bx, bx + 2), pl.ds(j * by, by + 2)],
        slab,
        sem,
    )
    cp.start()
    cp.wait()

    s = slab[...].astype(jnp.float32)

    # z cascade first while the array is smallest (halo z planes 0 / bz+1)
    ctr = s[:, :, 1 : bz + 1, :]
    ez = 0.75 * ctr + 0.25 * s[:, :, 0:bz, :]
    oz = 0.75 * ctr + 0.25 * s[:, :, 2 : bz + 2, :]
    t = _interleave(ez, oz, 2)  # [bx+2, by+2, 2bz, c]

    ctr = t[:, 1 : by + 1]
    ey = 0.75 * ctr + 0.25 * t[:, 0:by]
    oy = 0.75 * ctr + 0.25 * t[:, 2 : by + 2]
    t = _interleave(ey, oy, 1)  # [bx+2, 2by, 2bz, c]

    ctr = t[1 : bx + 1]
    ex = 0.75 * ctr + 0.25 * t[0:bx]
    ox = 0.75 * ctr + 0.25 * t[2 : bx + 2]
    t = _interleave(ex, ox, 0)  # [2bx, 2by, 2bz, c_pad]

    # drop the lane padding; the output block goes through the regular
    # out_specs pipeline, which handles c < 128 correctly
    o_ref[...] = t[:, :, :, :c].astype(o_ref.dtype)


def _round8(n: int) -> int:
    return ((n + 7) // 8) * 8


def _lane_pad(c: int) -> int:
    """c as the manual-DMA path sees it: padded up to a full 128 lane."""
    return max(c, 128) if c < 128 else c


@partial(jax.jit, static_argnames=("bx", "by", "bz", "interpret"))
def _upsample2x_call(x, bx, by, bz, interpret=False):
    xs, ys, zs, c = x.shape
    kz = zs // bz
    lz = _round8(bz + 2)
    cp_ = _lane_pad(c)
    # padded-z extent must cover the last chunk's aligned over-fetch
    # (rows past the high halo are ignored by the kernel)
    zp = (kz - 1) * bz + lz
    xp = jnp.pad(
        x, ((1, 1), (1, 1), (1, zp - zs - 1), (0, cp_ - c)), mode="edge"
    )
    if kz == 1:
        chunks = xp[None]
    else:
        chunks = jnp.stack(
            [jax.lax.dynamic_slice_in_dim(xp, k * bz, lz, 2)
             for k in range(kz)],
            axis=0,
        )
    grid = (xs // bx, ys // by, kz)
    return pl.pallas_call(
        partial(_up_kernel, bx=bx, by=by, bz=bz, c=c),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (2 * bx, 2 * by, 2 * bz, c),
            lambda i, j, k: (i, j, k, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((2 * xs, 2 * ys, 2 * zs, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bx + 2, by + 2, lz, cp_), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(chunks)


def _fit(dim: int, want: int) -> int:
    b = min(want, dim)
    while dim % b:
        b -= 1
    return b


def _vmem_peak(bx: int, by: int, bz: int, c: int, in_bytes: int) -> int:
    """Per-step liveness estimate (bytes) of the kernel's scoped VMEM.

    The peak is the max over the three cascade steps of (live inputs +
    outputs of that step), f32, counting the Mosaic sublane pad of the
    z-interleave's [.., bz, 2, c] stack (2 -> 8), plus the slab and a
    double-buffered output block. The cascade runs at the lane-padded
    channel count (see _up_kernel); only the output block is logical c.
    """
    f = 4
    c_out, c = c, _lane_pad(c)
    X, Y = bx + 2, by + 2
    slab = X * Y * _round8(bz + 2) * c * (in_bytes + f)  # raw + f32 copy
    ez = X * Y * bz * c * f
    zstack = X * Y * bz * 8 * c * f  # sublane dim 2 padded to 8
    t1 = X * Y * 2 * bz * c * f
    step_z = slab + 2 * ez + zstack + t1
    ey = X * by * 2 * bz * c * f
    ystack = X * by * 2 * 2 * bz * c * f
    t2 = X * 2 * by * 2 * bz * c * f
    step_y = t1 + 2 * ey + ystack + t2
    ex = bx * 2 * by * 2 * bz * c * f
    xstack = 2 * bx * 2 * by * 2 * bz * c * f
    t3 = 2 * bx * 2 * by * 2 * bz * c * f
    out2 = 2 * (2 * bx * 2 * by * 2 * bz * c_out * in_bytes)
    step_x = t2 + 2 * ex + xstack + t3 + out2
    return max(step_z, step_y, step_x)


_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom under the 16 MB scoped cap


def _z_blocks(zs: int):
    """Valid z block sizes, largest first: Mosaic needs the DMA z offset
    8-aligned, so a multi-block grid requires bz % 8 == 0; bz == zs
    (single block, offset 0) is always layout-legal."""
    opts = [zs]
    for bz in (32, 16, 8):
        if zs % bz == 0 and bz < zs:
            opts.append(bz)
    return sorted(set(opts), reverse=True)


def _pick_blocks(xs: int, ys: int, zs: int, c: int, in_bytes: int):
    """Largest (bx, by, bz) combination that fits the VMEM budget."""
    for wx, wy in ((16, 16), (8, 8), (4, 4), (2, 2)):
        bx, by = _fit(xs, wx), _fit(ys, wy)
        for bz in _z_blocks(zs):
            if _vmem_peak(bx, by, bz, c, in_bytes) <= _VMEM_BUDGET:
                return bx, by, bz
    return None


def _xla_upsample(x: jax.Array) -> jax.Array:
    from skoots_tpu.models.unext import _upsample2x_axis

    dt = x.dtype
    y = x.astype(jnp.float32)
    for ax in range(1, 4):
        y = _upsample2x_axis(y, ax)
    return y.astype(dt)


def _up_matrix(n: int) -> jnp.ndarray:
    """[2n, n+2] interleave+blend operator against an edge-padded axis:
    out[2i] = 0.25*pad[i] + 0.75*pad[i+1]; out[2i+1] = 0.75*pad[i+1] +
    0.25*pad[i+2] — exactly the half-pixel-center cascade of
    ``_upsample2x_axis`` expressed as a (2-nonzeros-per-row) matrix."""
    import numpy as np

    w = np.zeros((2 * n, n + 2), np.float32)
    idx = np.arange(n)
    w[2 * idx, idx] = 0.25
    w[2 * idx, idx + 1] = 0.75
    w[2 * idx + 1, idx + 1] = 0.75
    w[2 * idx + 1, idx + 2] = 0.25
    return jnp.asarray(w)


def _mxu_upsample(x: jax.Array) -> jax.Array:
    """2x trilinear upsample as THREE dot_generals on the MXU.

    The VPU-relayout cost of stack+reshape interleaves is the measured
    bottleneck of both the XLA composition (~45 ms per 256^2x96 tile) and
    the Pallas kernel (~24x off roofline, runs/bench_upsample.json: tiny
    8x8x8 blocks forced by the z-stack's 2->8 sublane pad). A matmul with
    the 2-nonzeros-per-row interleave matrix does blend AND interleave in
    one MXU pass per axis — no relayouts at all. The extra multiplies by
    zero are free relative to HBM traffic: ~0.2 TFLOP-equivalent for the
    full decoder stage, ~1 ms-class on the MXU vs ~26 ms for the Pallas
    VPU cascade. HIGHEST precision keeps the f32 cascade math (each
    output row sums exactly two products, like the explicit 0.75/0.25
    blend).
    """
    dt = x.dtype
    y = jnp.pad(
        x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)), mode="edge"
    ).astype(jnp.float32)
    hp = jax.lax.Precision.HIGHEST
    _, xs, ys, zs, _ = x.shape
    y = jnp.einsum("px,bxyzc->bpyzc", _up_matrix(xs), y, precision=hp)
    y = jnp.einsum("qy,bxyzc->bxqzc", _up_matrix(ys), y, precision=hp)
    y = jnp.einsum("rz,bxyzc->bxyrc", _up_matrix(zs), y, precision=hp)
    return y.astype(dt)


def upsample2x_eligible(x: jax.Array) -> bool:
    if x.ndim != 5 or x.dtype not in (jnp.bfloat16, jnp.float32):
        return False
    _, xs, ys, zs, c = x.shape
    if not (c % 8 == 0 and xs >= 2 and ys >= 2 and zs >= 2):
        return False
    return _pick_blocks(xs, ys, zs, c, x.dtype.itemsize) is not None


def _pallas_impl(x: jax.Array, interpret=False) -> jax.Array:
    b, xs, ys, zs, c = x.shape
    bx, by, bz = _pick_blocks(xs, ys, zs, c, x.dtype.itemsize)

    def one(xi):
        return _upsample2x_call(xi, bx, by, bz, interpret=interpret)

    # unrolled batch, NOT jax.vmap: vmap gives the ANY-space operand a
    # Squeezed batch block spec that Mosaic rejects for B >= 2 (see
    # dwconv.py; hit by training-shape batches)
    if b == 1:
        return one(x[0])[None]
    return jnp.stack([one(x[i]) for i in range(b)])


@jax.custom_vjp
def upsample2x_trilinear(x):
    """2x trilinear upsample of ``[B, X, Y, Z, C]``.

    Implementation dispatch (``SKOOTS_UPSAMPLE_IMPL`` = auto|mxu|pallas|
    xla): 'auto' on TPU uses the MXU interleave-matmul path — the Aug 20
    on-chip A/B (runs/bench_upsample.json) has it beating the Pallas VPU
    cascade on all four decoder shapes (23.9 vs 26.7, 5.6 vs 7.3, 10.5 vs
    15.4, 4.8 vs 5.1 ms) at max_abs_err 0.0. Backward is the
    XLA-composition transpose in every case (the op is linear, so the
    transpose is exact)."""
    impl = os.environ.get("SKOOTS_UPSAMPLE_IMPL", "auto")
    if impl == "mxu" or (impl == "auto" and jax.default_backend() == "tpu"):
        return _mxu_upsample(x)
    if impl != "xla" and upsample2x_eligible(x) and (
        impl == "pallas" or jax.default_backend() == "tpu"
    ):
        return _pallas_impl(x, interpret=jax.default_backend() != "tpu")
    return _xla_upsample(x)


def _fwd(x):
    return upsample2x_trilinear(x), x.shape


def _bwd(shape, g):
    _, vjp = jax.vjp(_xla_upsample, jnp.zeros(shape, g.dtype))
    return vjp(g)


upsample2x_trilinear.defvjp(_fwd, _bwd)
