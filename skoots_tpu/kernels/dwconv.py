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

    # unrolled batch, NOT jax.vmap: vmap gives the ANY-space operand a
    # Squeezed batch block spec that Mosaic rejects for B >= 2
    if bsz == 1:
        out = one(x[0])[None]
    else:
        out = jnp.stack([one(x[i]) for i in range(bsz)])
    return out[0] if squeeze else out


def _fit(dim: int, want: int) -> int:
    b = min(want, dim)
    while dim % b:
        b -= 1
    return b


# --------------------------------------------------------------------------
# Differentiable wrapper: Pallas forward, XLA-conv backward. pallas_call has
# no autodiff rule, so training (the reference trains through Block3D's
# depthwise conv) needs an explicit VJP. The backward reuses XLA's grouped
# convolution gradients — exact, and training crops are small.


def _xla_dwconv_ref(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    c = x.shape[-1]
    out = jax.lax.conv_general_dilated(
        x,
        w.reshape(w.shape[0], w.shape[1], w.shape[2], 1, c),
        window_strides=(1, 1, 1),
        padding="SAME",
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
        feature_group_count=c,
    )
    return out + b


@jax.custom_vjp
def dwconv3d(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """Depthwise 3D conv, SAME padding: Pallas v4 forward with an exact
    XLA-gradient backward. ``w`` is ``[k,k,k,C]``, ``b`` ``[C]``."""
    return dwconv3d_pallas_v4(x, w, b)


def _dwconv3d_fwd(x, w, b):
    return dwconv3d(x, w, b), (x, w, b)


def dwconv3d_dgrad(g: jax.Array, w: jax.Array,
                   interpret: bool = False) -> jax.Array:
    """Input gradient of the stride-1 SAME depthwise correlation: for odd
    ``k``, dx = the same correlation of the cotangent with tap-flipped
    weights — so it rides the Pallas forward kernel (3.4x XLA's grouped
    conv on v5e) instead of XLA's conv-transpose gradient."""
    return dwconv3d_pallas_v4(g, w[::-1, ::-1, ::-1], None,
                              interpret=interpret)


def _dwconv3d_bwd(res, g):
    import os

    x, w, b = res
    # env kill switches (trace-time): SKOOTS_DGRAD_IMPL=xla restores the
    # full XLA backward; SKOOTS_DWGRAD_IMPL=pallas opts into the Pallas
    # weight gradient (off until the chip A/B lands)
    if (w.shape[0] % 2 == 1  # flip identity needs symmetric SAME padding
            and os.environ.get("SKOOTS_DGRAD_IMPL", "pallas") != "xla"):
        dx = dwconv3d_dgrad(g, w).astype(x.dtype)
        # default 'auto' resolves to the register-blocked Pallas wgrad on
        # eligible TPU shapes — the chip A/B (runs/bench_dwgrad.json,
        # Aug 20) measured pallas_v2 at 23.1 ms vs XLA's 382.9 ms on the
        # reference-envelope 304^2x24 B1 geometry (16.6x) and 8.0 vs
        # 44.6 ms on the campaign crop (5.6x); 'xla' restores the vjp path
        wgrad_impl = os.environ.get("SKOOTS_DWGRAD_IMPL", "auto")
        if wgrad_impl == "auto":
            wgrad_impl = (
                "pallas_v2"
                if jax.default_backend() == "tpu"
                and _wgrad_pallas_eligible(x, w.shape[0])
                else "xla"
            )
        if wgrad_impl in ("pallas", "pallas_v2"):
            # 'pallas' = full-block reduce, 'pallas_v2' = register-blocked
            # carry accumulators (tools/bench_dwgrad.py measures both)
            wg = (dwconv3d_wgrad_pallas_v2 if wgrad_impl == "pallas_v2"
                  else dwconv3d_wgrad_pallas)
            dw = wg(x, g, w.shape[0]).astype(w.dtype)
            db = jnp.sum(
                g.astype(jnp.float32), axis=tuple(range(g.ndim - 1))
            ).astype(b.dtype)
        else:
            # dw/db on XLA's gradient path (a k^3-tap reduction); x is
            # closed over so the backward graph never rebuilds dx
            _, vjp_wb = jax.vjp(
                lambda w_, b_: _xla_dwconv_ref(x, w_, b_), w, b
            )
            dw, db = vjp_wb(g)
        return dx, dw, db
    _, vjp = jax.vjp(_xla_dwconv_ref, x, w, b)
    return vjp(g)


dwconv3d.defvjp(_dwconv3d_fwd, _dwconv3d_bwd)


# --------------------------------------------------------------------------
# v4: z-slice lane packing with in-kernel dz shifts + load-reuse register
# blocking. THE production kernel (3.4x over XLA at C=32 on v5e).
#
# Layout: [X, Y, ZQ, G*C] where G = 128//C and packed row q holds z-slices
# q*G .. q*G+G-1 — a pure reshape of the padded input (1x HBM traffic). The
# seven dz tap shifts are reconstructed ONCE per tile in VMEM: shifting z by
# dz moves lane group g to group (g+dz)%G of packed row q+(g+dz)//G, i.e. a
# lane roll of two row-offset slab views blended by a lane-group mask. The
# tap loop then runs per output (x, y) column block with the accumulators in
# vector registers; each loaded source column feeds up to k accumulators
# (VMEM loads issue ~1 vreg/cycle vs ~8 FMA vregs/cycle — load reuse is the
# unlock; see the measured v5e performance model in the repo memory/docs).
# fp32 accumulation (VPU FMA is fastest in fp32 on v5e).
#
# The development ladder (v2 full-array ops -> v3 register columns -> v5
# wide windows -> v6 flattened contiguous taps) was measured at 14.4 / 13.4
# / 10.4 / 12.9 ms per Mvox at C=32 respectively and is preserved in git
# history (see BASELINE.md round-2 notes); v6 is kept below as the best
# alternative structure.


def _dw_v4_kernel(x_hbm, w_ref, b_ref, o_ref, slab, shifted, sem, *, bx, by,
                  k, zq, g, c, rows, acols, probe=None):
    i = pl.program_id(0)
    j = pl.program_id(1)

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

    lanes = g * c
    group = jax.lax.broadcasted_iota(
        jnp.int32, (bx + k - 1, by + k - 1, zq, lanes), 3
    ) // c

    for dz in range(k):
        r0 = dz // g
        r1 = (g - 1 + dz) // g

        def view(r):
            src = slab[:, :, r : r + zq, :].astype(jnp.float32)
            shift = (-(dz - r * g) * c) % lanes
            if shift == 0:
                return src
            return pltpu.roll(src, shift, 3)

        if probe == "noprep":
            shifted[dz] = slab[:, :, 0:zq, :].astype(jnp.float32)
        elif r0 == r1:
            shifted[dz] = view(r0)
        else:
            shifted[dz] = jnp.where(group < (r0 + 1) * g - dz, view(r0),
                                    view(r1))

    bias = b_ref[...]

    def body(t, carry):
        # one x row, `acols` output columns along y; accumulators live in
        # vector registers across all k^3 taps. Each loaded source column
        # feeds up to k accumulators (the dy taps) — the load:FMA ratio is
        # what unlocks the VPU (loads issue ~1/cycle, FMAs ~8/cycle).
        xi = t // (by // acols)
        y0 = (t % (by // acols)) * acols
        accs = [jnp.zeros((zq, lanes), jnp.float32) for _ in range(acols)]
        fixed = shifted[0, xi, y0]
        for dz in range(k):
            for dx in range(k):
                if probe == "hoistw":
                    wv = [
                        jnp.broadcast_to(w_ref[dx, dy, dz], (zq, lanes))
                        for dy in range(k)
                    ]
                else:
                    wv = [w_ref[dx, dy, dz] for dy in range(k)]
                for yy in range(acols + k - 1):
                    if probe == "noload":
                        s = fixed
                    else:
                        s = shifted[dz, xi + dx, y0 + yy]
                    for dy in range(k):
                        ci = yy - dy
                        if 0 <= ci < acols:
                            if probe == "noweight":
                                accs[ci] = accs[ci] + s * jnp.float32(
                                    0.5 + 0.001 * dy
                                )
                            else:
                                accs[ci] = accs[ci] + s * wv[dy]
        for ci in range(acols):
            o_ref[xi, y0 + ci] = (accs[ci] + bias).astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, bx * (by // acols), body, 0)


def dwconv3d_pallas_v4(
    x: jax.Array,
    weights: jax.Array,
    bias: jax.Array | None = None,
    block: tuple[int, int] = (8, 8),
    acols: int | None = None,
    interpret: bool = False,
    probe: str | None = None,
) -> jax.Array:
    """Load-reusing register-blocked depthwise 3D conv (SAME padding).

    Same packed layout as v2/v3; the inner loop streams each source column
    once and FMAs it into `acols` register-resident output columns.
    Requirements: 128 % C == 0 and Z % (128 // C) == 0.
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
    zq = zs // g
    rows = (g - 1 + k - 1) // g
    rows = ((zq + rows + 7) // 8) * 8 - zq
    lanes = g * c

    bias = jnp.zeros((c,), jnp.float32) if bias is None else bias
    wpacked = jnp.tile(weights.astype(jnp.float32), (1, 1, 1, g))
    bpacked = jnp.tile(bias.astype(jnp.float32), (g,))

    bx = _fit(xs, block[0])
    by = _fit(ys, block[1])
    if acols is None:
        # keep the register-resident accumulator block near 32 vregs:
        # each column is ceil(zq/8) f32 vregs
        acols = max(4, 32 // max(zq // 8, 1))
    acols = min(acols, by)
    while by % acols:
        acols -= 1

    def one(xi):
        zback = (zq + rows) * g - zs - half
        xp = jnp.pad(xi, ((half, half), (half, half), (half, zback), (0, 0)))
        xpacked = xp.reshape(xs + k - 1, ys + k - 1, zq + rows, lanes)
        out = pl.pallas_call(
            partial(_dw_v4_kernel, bx=bx, by=by, k=k, zq=zq, g=g, c=c,
                    rows=rows, acols=acols, probe=probe),
            grid=(xs // bx, ys // by),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (bx, by, zq, lanes), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((xs, ys, zq, lanes), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((bx + k - 1, by + k - 1, zq + rows, lanes), x.dtype),
                pltpu.VMEM((k, bx + k - 1, by + k - 1, zq, lanes),
                           jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20,
            ),
            interpret=interpret,
        )(xpacked, wpacked, bpacked)
        return out.reshape(xs, ys, zs, c)

    # unrolled batch, NOT jax.vmap: vmap gives the ANY-space operand a
    # Squeezed batch block spec that Mosaic rejects for B >= 2
    if bsz == 1:
        out = one(x[0])[None]
    else:
        out = jnp.stack([one(x[i]) for i in range(bsz)])
    return out[0] if squeeze else out


def _dw_v6_kernel(x_hbm, w_ref, b_ref, o_ref, slab, shifted, sem, *, bx, by,
                  k, zq, g, c, rows):
    i = pl.program_id(0)
    j = pl.program_id(1)

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

    lanes = g * c
    wy = by + k - 1
    fslab = (bx + k - 1) * wy
    aflat = bx * wy
    group = jax.lax.broadcasted_iota(
        jnp.int32, (bx + k - 1, by + k - 1, zq, lanes), 3
    ) // c

    for dz in range(k):
        r0 = dz // g
        r1 = (g - 1 + dz) // g

        def view(r):
            src = slab[:, :, r : r + zq, :].astype(jnp.float32)
            shift = (-(dz - r * g) * c) % lanes
            if shift == 0:
                return src
            return pltpu.roll(src, shift, 3)

        if r0 == r1:
            v = view(r0)
        else:
            v = jnp.where(group < (r0 + 1) * g - dz, view(r0), view(r1))
        shifted[dz, 0:fslab] = v.reshape(fslab, zq, lanes)

    # Flattened-offset taps: out flat position p = xi*wy + y needs source flat
    # p + dx*wy + dy. Each tap is ONE contiguous wide FMA over the whole tile
    # (plus halo-seam garbage columns, discarded at write time) — the shape
    # Mosaic streams at full VPU rate with per-vreg dependency chains.
    acc = jnp.zeros((aflat, zq, lanes), jnp.float32)
    for dz in range(k):
        for dx in range(k):
            for dy in range(k):
                off = dx * wy + dy
                s = shifted[dz, off : off + aflat]
                wb = jnp.broadcast_to(w_ref[dx, dy, dz], (zq, lanes))
                acc = acc + s * wb

    bias = b_ref[...]
    for xi in range(bx):
        row = jax.lax.slice_in_dim(acc, xi * wy, xi * wy + by, axis=0)
        o_ref[xi] = (row + bias).astype(o_ref.dtype)


def dwconv3d_pallas_v6(
    x: jax.Array,
    weights: jax.Array,
    bias: jax.Array | None = None,
    block: tuple[int, int] = (8, 16),
    interpret: bool = False,
) -> jax.Array:
    """Flattened-offset wide-op depthwise 3D conv (SAME padding).

    Same z-lane packing as v2..v5; the (x, y) tile is flattened so every tap
    is a single contiguous vector FMA over the whole tile.
    Requirements: 128 % C == 0, Z % (128 // C) == 0, (Z // (128//C)) % 8 == 0.
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
    zq = zs // g
    assert zq % 8 == 0, (zs, c, zq)
    rows = (g - 1 + k - 1) // g
    rows = ((zq + rows + 7) // 8) * 8 - zq
    lanes = g * c

    bias = jnp.zeros((c,), jnp.float32) if bias is None else bias
    wpacked = jnp.tile(weights.astype(jnp.float32), (1, 1, 1, g))
    bpacked = jnp.tile(bias.astype(jnp.float32), (g,))

    bx = _fit(xs, block[0])
    by = _fit(ys, block[1])
    fslab = (bx + k - 1) * (by + k - 1)

    def one(xi):
        zback = (zq + rows) * g - zs - half
        xp = jnp.pad(xi, ((half, half), (half, half), (half, zback), (0, 0)))
        xpacked = xp.reshape(xs + k - 1, ys + k - 1, zq + rows, lanes)
        out = pl.pallas_call(
            partial(_dw_v6_kernel, bx=bx, by=by, k=k, zq=zq, g=g, c=c,
                    rows=rows),
            grid=(xs // bx, ys // by),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (bx, by, zq, lanes), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((xs, ys, zq, lanes), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((bx + k - 1, by + k - 1, zq + rows, lanes), x.dtype),
                # +8 flat-column pad: the largest tap offset reads past the
                # slab by k-1 columns (garbage that only feeds garbage)
                pltpu.VMEM((k, fslab + 8, zq, lanes), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20,
            ),
            interpret=interpret,
        )(xpacked, wpacked, bpacked)
        return out.reshape(xs, ys, zs, c)

    # unrolled batch, NOT jax.vmap: vmap gives the ANY-space operand a
    # Squeezed batch block spec that Mosaic rejects for B >= 2
    if bsz == 1:
        out = one(x[0])[None]
    else:
        out = jnp.stack([one(x[i]) for i in range(bsz)])
    return out[0] if squeeze else out



# --------------------------------------------------------------------------
# wgrad: weight gradient of the depthwise conv in ONE pass over x and g.
#
# dw[dx,dy,dz,c] = sum_p xp[p + (dx,dy,dz)] * g[p]  (xp zero-padded by half)
# — the same shifted-slab geometry as the v4 forward, but reducing over the
# block instead of producing per-voxel outputs. Every grid cell maps to the
# SAME [k,k,k,lanes] output block (constant index_map), so the sequential
# TPU grid accumulates tap partial sums in VMEM and HBM traffic is exactly
# one read of x + one read of g (XLA's grouped-conv wgrad re-materializes
# conv-shaped intermediates instead). Lane groups carry the v4 z-packing;
# the wrapper sums the g z-replicas at the end.


def _dw_wgrad_kernel(x_hbm, g_ref, o_ref, slab, shifted, sem, *, bx, by, k,
                     zq, g, c, rows):
    i = pl.program_id(0)
    j = pl.program_id(1)

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

    lanes = g * c
    group = jax.lax.broadcasted_iota(
        jnp.int32, (bx + k - 1, by + k - 1, zq, lanes), 3
    ) // c

    for dz in range(k):
        r0 = dz // g
        r1 = (g - 1 + dz) // g

        def view(r):
            src = slab[:, :, r : r + zq, :].astype(jnp.float32)
            shift = (-(dz - r * g) * c) % lanes
            if shift == 0:
                return src
            return pltpu.roll(src, shift, 3)

        if r0 == r1:
            shifted[dz] = view(r0)
        else:
            shifted[dz] = jnp.where(group < (r0 + 1) * g - dz, view(r0),
                                    view(r1))

    @pl.when((i == 0) & (j == 0))
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    gb = g_ref[...].astype(jnp.float32)
    for dz in range(k):
        for dx in range(k):
            for dy in range(k):
                prod = shifted[dz, dx : dx + bx, dy : dy + by] * gb
                o_ref[dx, dy, dz] = o_ref[dx, dy, dz] + jnp.sum(
                    prod, axis=(0, 1, 2)
                )


def _wgrad_pallas_eligible(x: jax.Array, k: int) -> bool:
    """Shape gate for the Pallas weight gradients: the z axis is packed
    into 128-wide lanes as (g, c) with g = 128 // c, so c must divide 128
    and z must divide evenly into g-groups. Mirrors the kernels' asserts
    so 'auto' never trips them."""
    c = x.shape[-1]
    zs = x.shape[-2]
    if c > 128 or 128 % c:
        return False
    g = 128 // c
    return zs % g == 0 and k % 2 == 1


def dwconv3d_wgrad_pallas(
    x: jax.Array,
    gout: jax.Array,
    k: int,
    block: tuple[int, int] = (8, 8),
    interpret: bool = False,
) -> jax.Array:
    """Weight gradient dw [k,k,k,C] of the SAME-padded depthwise conv.

    ``x``/``gout``: [B, X, Y, Z, C] primal input and output cotangent.
    Same eligibility as the v4 forward: 128 % C == 0 and Z % (128//C) == 0.
    """
    if x.ndim == 4:
        x, gout = x[None], gout[None]
    bsz, xs, ys, zs, c = x.shape
    half = (k - 1) // 2
    g = 128 // c
    assert 128 % c == 0 and zs % g == 0, (xs, ys, zs, c)
    zq = zs // g
    rows = (g - 1 + k - 1) // g
    rows = ((zq + rows + 7) // 8) * 8 - zq
    lanes = g * c

    bx = _fit(xs, block[0])
    by = _fit(ys, block[1])

    def one(xi, gi):
        zback = (zq + rows) * g - zs - half
        xp = jnp.pad(xi, ((half, half), (half, half), (half, zback), (0, 0)))
        xpacked = xp.reshape(xs + k - 1, ys + k - 1, zq + rows, lanes)
        gpacked = gi.reshape(xs, ys, zq, lanes)
        out = pl.pallas_call(
            partial(_dw_wgrad_kernel, bx=bx, by=by, k=k, zq=zq, g=g, c=c,
                    rows=rows),
            grid=(xs // bx, ys // by),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(
                    (bx, by, zq, lanes), lambda i, j: (i, j, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (k, k, k, lanes), lambda i, j: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((k, k, k, lanes), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((bx + k - 1, by + k - 1, zq + rows, lanes),
                           x.dtype),
                pltpu.VMEM((k, bx + k - 1, by + k - 1, zq, lanes),
                           jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20,
            ),
            interpret=interpret,
        )(xpacked, gpacked)
        # lane group j carried z-slices z = q*g + j: the tap gradient sums
        # every z, so the g packed replicas collapse by summation
        return out.reshape(k, k, k, g, c).sum(axis=3)

    dw = one(x[0], gout[0])
    for i in range(1, bsz):
        dw = dw + one(x[i], gout[i])
    return dw


def _dw_wgrad_v2_kernel(x_hbm, g_ref, o_ref, slab, shifted, sem, *, bx, by,
                        k, zq, g, c, rows):
    """Register-blocked wgrad: for each dz, the k*k (dx,dy) tap partial
    sums ride the fori_loop carry (vector registers) across the block's x
    rows; the g row is loaded once per row and every streamed shifted
    column feeds up to k taps (the v4 load-reuse idea transposed). The
    per-tap cross-block reduction of the naive kernel disappears — only
    one zq-fold per tap per block remains."""
    i = pl.program_id(0)
    j = pl.program_id(1)

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

    lanes = g * c
    group = jax.lax.broadcasted_iota(
        jnp.int32, (bx + k - 1, by + k - 1, zq, lanes), 3
    ) // c

    for dz in range(k):
        r0 = dz // g
        r1 = (g - 1 + dz) // g

        def view(r):
            src = slab[:, :, r : r + zq, :].astype(jnp.float32)
            shift = (-(dz - r * g) * c) % lanes
            if shift == 0:
                return src
            return pltpu.roll(src, shift, 3)

        if r0 == r1:
            shifted[dz] = view(r0)
        else:
            shifted[dz] = jnp.where(group < (r0 + 1) * g - dz, view(r0),
                                    view(r1))

    @pl.when((i == 0) & (j == 0))
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    for dz in range(k):

        def body(xi, accs):
            gr = [g_ref[xi, y].astype(jnp.float32) for y in range(by)]
            new = list(accs)
            for dx in range(k):
                for yy in range(by + k - 1):
                    s = shifted[dz, xi + dx, yy]
                    for dy in range(k):
                        y = yy - dy
                        if 0 <= y < by:
                            t = dx * k + dy
                            new[t] = new[t] + s * gr[y]
            return tuple(new)

        zero = jnp.zeros((zq, lanes), jnp.float32)
        accs = jax.lax.fori_loop(0, bx, body,
                                 tuple(zero for _ in range(k * k)))
        for dx in range(k):
            for dy in range(k):
                part = jnp.sum(accs[dx * k + dy], axis=0)
                o_ref[dx, dy, dz] = o_ref[dx, dy, dz] + part


def dwconv3d_wgrad_pallas_v2(
    x: jax.Array,
    gout: jax.Array,
    k: int,
    block: tuple[int, int] = (8, 8),
    interpret: bool = False,
) -> jax.Array:
    """Register-blocked variant of :func:`dwconv3d_wgrad_pallas` (same
    contract). Best at zq <= 8 (one f32 vreg per column); larger zq holds
    k*k multi-vreg accumulators in the loop carry and may spill."""
    if x.ndim == 4:
        x, gout = x[None], gout[None]
    bsz, xs, ys, zs, c = x.shape
    half = (k - 1) // 2
    g = 128 // c
    assert 128 % c == 0 and zs % g == 0, (xs, ys, zs, c)
    zq = zs // g
    rows = (g - 1 + k - 1) // g
    rows = ((zq + rows + 7) // 8) * 8 - zq
    lanes = g * c

    bx = _fit(xs, block[0])
    by = _fit(ys, block[1])

    def one(xi, gi):
        zback = (zq + rows) * g - zs - half
        xp = jnp.pad(xi, ((half, half), (half, half), (half, zback), (0, 0)))
        xpacked = xp.reshape(xs + k - 1, ys + k - 1, zq + rows, lanes)
        gpacked = gi.reshape(xs, ys, zq, lanes)
        out = pl.pallas_call(
            partial(_dw_wgrad_v2_kernel, bx=bx, by=by, k=k, zq=zq, g=g, c=c,
                    rows=rows),
            grid=(xs // bx, ys // by),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(
                    (bx, by, zq, lanes), lambda i, j: (i, j, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (k, k, k, lanes), lambda i, j: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((k, k, k, lanes), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((bx + k - 1, by + k - 1, zq + rows, lanes),
                           x.dtype),
                pltpu.VMEM((k, bx + k - 1, by + k - 1, zq, lanes),
                           jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20,
            ),
            interpret=interpret,
        )(xpacked, gpacked)
        return out.reshape(k, k, k, g, c).sum(axis=3)

    dw = one(x[0], gout[0])
    for i in range(1, bsz):
        dw = dw + one(x[i], gout[i])
    return dw
