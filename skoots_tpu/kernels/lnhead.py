"""Fused UNeXT head: LayerNorm -> 1x1 conv, as one Pallas VMEM pass.

runs/fwd_split.json puts the XLA composition at 22.9 ms per 256^2x96 tile
against a ~0.7 ms traffic bound (read [V, 32] bf16 + write [V, 32]): the
LN materializes its normalized result in HBM before the matmul reads it
back, and every VPU op runs at 32-of-128 lane occupancy. This kernel
streams voxel tiles through VMEM like kernels/mlp.py: LN statistics in
f32, matmul on the MXU with f32 accumulation, one read + one write.

Reference role: the trailing ``LayerNorm + Conv(kernel=1)`` of bism's
UNeXT (reference lib/utils.py via models/unext); the reference leaves
this to torch.compile.

``pallas_call`` has no autodiff: ``ln_head`` wraps the kernel in a
``jax.custom_vjp`` whose backward differentiates the XLA composition
(same pattern as kernels/mlp.py / kernels/dwconv.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from skoots_tpu.kernels.mlp import _pick_tile


def ln_head_eligible(x: jax.Array) -> bool:
    if x.ndim != 5:
        return False
    c = x.shape[-1]
    v = x.shape[0] * x.shape[1] * x.shape[2] * x.shape[3]
    return c % 8 == 0 and c <= 256 and _pick_tile(v, c) is not None and v >= 512


def _kernel(x_ref, ls_ref, lb_ref, w_ref, b_ref, o_ref, *, eps: float):
    x = x_ref[...]
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    h = xc * jax.lax.rsqrt(var + eps)
    h = h * ls_ref[...].astype(jnp.float32) + lb_ref[...].astype(jnp.float32)
    h = h.astype(x.dtype)
    y = jnp.dot(h, w_ref[...], preferred_element_type=jnp.float32)
    o_ref[...] = y.astype(x.dtype) + b_ref[...].astype(x.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def _ln_head_call(x2, ln_scale, ln_bias, w, b, interpret=False):
    v, c = x2.shape
    n = w.shape[-1]
    t = _pick_tile(v, max(c, n))
    assert t is not None
    eps = 1e-6  # flax nn.LayerNorm default
    row = lambda a: a.reshape(1, -1)
    return pl.pallas_call(
        partial(_kernel, eps=eps),
        grid=(v // t,),
        in_specs=[
            pl.BlockSpec((t, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((t, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((v, n), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(x2, row(ln_scale), row(ln_bias), w, row(b))


def _xla_ln_head(x, ln_scale, ln_bias, w, b, eps=1e-6):
    """The reference XLA composition (backward pass + ineligible-shape
    fallback). Must match UNeXT3D's final_norm + head_conv flax ops."""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    h = xc * jax.lax.rsqrt(var + eps)
    h = (h * ln_scale.astype(jnp.float32)
         + ln_bias.astype(jnp.float32)).astype(dt)
    y = jnp.dot(h, w.astype(dt), preferred_element_type=jnp.float32)
    return y.astype(dt) + b.astype(dt)


@jax.custom_vjp
def ln_head(x, ln_scale, ln_bias, w, b):
    """Fused ``head_bias + head_W @ LN(x)`` on [B, X, Y, Z, C]; falls back
    to the XLA composition when the shape is ineligible or off-TPU."""
    if ln_head_eligible(x) and x.dtype in (jnp.bfloat16, jnp.float32):
        shape = x.shape
        out = _ln_head_call(
            x.reshape(-1, shape[-1]), ln_scale, ln_bias, w, b,
            interpret=jax.default_backend() != "tpu",
        )
        return out.reshape(shape[:-1] + (w.shape[-1],))
    return _xla_ln_head(x, ln_scale, ln_bias, w, b)


def _fwd(x, ln_scale, ln_bias, w, b):
    return ln_head(x, ln_scale, ln_bias, w, b), (x, ln_scale, ln_bias, w, b)


def _bwd(res, g):
    _, vjp = jax.vjp(_xla_ln_head, *res)
    return vjp(g)


ln_head.defvjp(_fwd, _bwd)
