"""Fused multi-pass 26-connected label propagation for connected components.

The CC inner loop (ops/flood_fill.py) is masked max-label propagation:
``labels <- fg ? max_{3x3x3}(labels) : 0``, run hundreds of times at 512^3.
The XLA form is a 3-pass separable reduce_window + where — ~6 full HBM
traversals (~12 ms/pass at 512^3 on v5e). This kernel runs Q passes per
invocation on x-slabs held in VMEM: one HBM read + one write per Q passes,
with each pass 9 wide vector ops (separable x/y/z maxes + foreground mask)
over the slab. Cross-slab influence is bounded by one voxel per pass, so a
Q-row x-halo makes the interior exact (jacobi-style: all slabs read the
pre-call snapshot).

Reference role: the scipy-label flood fill phase
(/root/reference/skoots/lib/flood_fill.py:125-140); here it is the
device-side propagate engine behind ``label_components`` /
``make_label_components_stepped``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_YHALO = 8  # per side; sublane-aligned


def _shift_x(a, d):
    """Shift along axis 0 by d with zero fill (same shape)."""
    n = a.shape[0]
    z = jnp.zeros_like(a[:abs(d)])
    if d > 0:
        return jnp.concatenate([z, a[: n - d]], axis=0)
    if d < 0:
        return jnp.concatenate([a[-d:], z], axis=0)
    return a


def _shift_y(a, d):
    n = a.shape[1]
    z = jnp.zeros_like(a[:, :abs(d)])
    if d > 0:
        return jnp.concatenate([z, a[:, : n - d]], axis=1)
    if d < 0:
        return jnp.concatenate([a[:, -d:], z], axis=1)
    return a


def _kernel(lab_hbm, fg_hbm, o_ref, slab, fg, sem, sem2, *, bx, q, y, z,
            connectivity):
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(
        lab_hbm.at[pl.ds(i * bx, bx + 2 * q), slice(None), slice(None)], slab,
        sem)
    cp.start()
    cf = pltpu.make_async_copy(
        fg_hbm.at[pl.ds(i * bx, bx + 2 * q), slice(None), slice(None)], fg,
        sem2)
    cf.start()
    cp.wait()
    cf.wait()

    # v5e Mosaic has no i8 vector compare ("Target does not support this
    # comparison"): widen the 0/1 foreground byte to i32 once and mask by
    # multiply instead of where(fg > 0, ...).
    fgw = jnp.minimum(fg[...].astype(jnp.int32), 1)
    zidx = jax.lax.broadcasted_iota(jnp.int32, (bx + 2 * q, y + 2 * _YHALO, z),
                                    2)
    s = slab[...]
    for _ in range(q):
        if connectivity == 26:
            # separable 3^3 max: x pair, y pair, then z via lane roll
            t = jnp.maximum(jnp.maximum(_shift_x(s, 1), _shift_x(s, -1)), s)
            t = jnp.maximum(jnp.maximum(_shift_y(t, 1), _shift_y(t, -1)), t)
            zp = jnp.where(zidx == z - 1, 0, pltpu.roll(t, t.shape[2] - 1, 2))
            zm = jnp.where(zidx == 0, 0, pltpu.roll(t, 1, 2))
            t = jnp.maximum(jnp.maximum(zp, zm), t)
        else:  # 6-connectivity: face neighbors only
            t = jnp.maximum(jnp.maximum(_shift_x(s, 1), _shift_x(s, -1)), s)
            t = jnp.maximum(jnp.maximum(_shift_y(s, 1), _shift_y(s, -1)), t)
            zp = jnp.where(zidx == z - 1, 0, pltpu.roll(s, s.shape[2] - 1, 2))
            zm = jnp.where(zidx == 0, 0, pltpu.roll(s, 1, 2))
            t = jnp.maximum(jnp.maximum(zp, zm), t)
        s = t * fgw
    o_ref[...] = s[q : q + bx, _YHALO : _YHALO + y, :]


@partial(jax.jit, static_argnames=("passes", "connectivity", "block_x",
                                   "interpret"))
def propagate_pallas(
    labels: jax.Array,
    fg: jax.Array,
    passes: int = 4,
    connectivity: int = 26,
    block_x: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Run ``passes`` masked label-propagation steps. ``labels`` [X, Y, Z]
    int32, ``fg`` [X, Y, Z] (bool/int). Exact equivalent of `passes`
    applications of the reduce_window propagate in ops/flood_fill.py."""
    x, y, z = labels.shape
    q = passes
    bx = block_x
    assert x % bx == 0, (x, bx)
    lab_p = jnp.pad(labels, ((q, q), (_YHALO, _YHALO), (0, 0)))
    fg_p = jnp.pad(fg.astype(jnp.uint8), ((q, q), (_YHALO, _YHALO), (0, 0)))
    return pl.pallas_call(
        partial(_kernel, bx=bx, q=q, y=y, z=z, connectivity=connectivity),
        grid=(x // bx,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((bx, y, z), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x, y, z), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((bx + 2 * q, y + 2 * _YHALO, z), jnp.int32),
            pltpu.VMEM((bx + 2 * q, y + 2 * _YHALO, z), jnp.uint8),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2**20,
        ),
        interpret=interpret,
    )(lab_p, fg_p)


def propagate_eligible(shape, passes: int = 4, block_x: int = 8) -> bool:
    x, y, z = shape
    if x % block_x or z % 128 or y % 8:
        return False
    # slab + fg + ~3 live temporaries must fit VMEM
    slab = (block_x + 2 * passes) * (y + 2 * _YHALO) * z * 4
    return 4 * slab + slab // 4 + block_x * y * z * 4 < 100 * 2**20
