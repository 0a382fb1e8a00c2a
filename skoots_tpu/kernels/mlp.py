"""Fused ConvNeXt block tail: LayerNorm -> pw1 -> GELU -> pw2 -> layer-scale
-> residual, as ONE Pallas pass.

Why: the block tail is pure HBM bandwidth. The XLA composition materializes
the [V, 4C] hidden activation twice (pw1 output + GELU output) plus the
LayerNorm result — ~1.5 KB/voxel of HBM traffic at C=32 — because two
matmuls can never share one XLA fusion. This kernel streams voxel tiles
through VMEM: HBM traffic drops to read x + write out = 4*C bytes/voxel
(~12x less at C=32), with the two tiny matmuls ([T, C] x [C, 4C]) running
on the MXU per tile. Reference role: the pointwise MLP of
bism.modules.convnext_block.Block3D (/root/reference/skoots/lib/utils.py:25);
the reference relies on torch.compile/Inductor for the same fusion on GPU.

Numerics mirror the flax composition in models/unext.py::ConvNeXtBlock3D:
LN statistics in f32, matmul inputs bf16 with f32 accumulation cast back to
the model dtype before bias-add, exact (erf) GELU computed in f32,
layer-scale and residual in the model dtype. Parity is asserted by
tests/test_pallas_mlp.py at bf16 tolerance.

`pallas_call` has no autodiff: `mlp_block_tail` wraps the kernel in a
`jax.custom_vjp` whose backward pass differentiates the XLA composition
(same pattern as kernels/dwconv.py::dwconv3d).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# voxel-tile sizes tried in order; V must divide exactly (Mosaic padding
# semantics for ragged final blocks are not relied upon)
_TILES = (32768, 16384, 8192, 4096, 2048, 1024, 512, 256, 128, 64)


def _pick_tile(v: int, c: int = 32) -> int | None:
    # bound the [T, 4C] f32 hidden tile to ~16 MB of VMEM
    cap = max(64, (16 * 2**20) // (16 * c))
    for t in _TILES:
        if t <= cap and v % t == 0:
            return t
    return None


def mlp_tail_eligible(x: jax.Array) -> bool:
    if x.ndim != 5:
        return False
    c = x.shape[-1]
    v = x.shape[0] * x.shape[1] * x.shape[2] * x.shape[3]
    return c % 8 == 0 and c <= 256 and _pick_tile(v, c) is not None and v >= 512


def _erf(x):
    """Abramowitz–Stegun 7.1.26 polynomial erf (|err| <= 1.5e-7): Mosaic
    has no erf/erfc lowering (jax 0.9); exp it does have."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _kernel(x_ref, s_ref, ls_ref, lb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            g_ref, o_ref, *, eps: float):
    x = x_ref[...]                              # [T, C] model dtype (dwconv out)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    h = xc * jax.lax.rsqrt(var + eps)
    h = h * ls_ref[...].astype(jnp.float32) + lb_ref[...].astype(jnp.float32)
    h = h.astype(x.dtype)
    a = jnp.dot(h, w1_ref[...], preferred_element_type=jnp.float32)
    a = a.astype(x.dtype) + b1_ref[...].astype(x.dtype)
    # exact-erf gelu via the A&S polynomial (Mosaic has no erf lowering):
    # |err| <= 1.5e-7, so the fused forward computes the SAME function as
    # the XLA fallback and the custom_vjp backward (both erf, matching the
    # reference's torch nn.GELU default) — the tanh form's 1e-3-scale skew
    # made gradients correspond to a slightly different function than the
    # forward whenever the fused path was active (ADVICE r3).
    af = a.astype(jnp.float32)
    a = (0.5 * af * (1.0 + _erf(af * np.float32(1.0 / np.sqrt(2.0))))
         ).astype(x.dtype)
    y = jnp.dot(a, w2_ref[...], preferred_element_type=jnp.float32)
    y = y.astype(x.dtype) + b2_ref[...].astype(x.dtype)
    y = y * g_ref[...].astype(x.dtype)
    # ConvNeXt residual adds the PRE-dwconv input (the block shortcut)
    o_ref[...] = s_ref[...] + y


@partial(jax.jit, static_argnames=("interpret",))
def _mlp_call(x2, s2, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
              interpret=False):
    v, c = x2.shape
    t = _pick_tile(v, c)
    assert t is not None
    eps = 1e-6  # flax nn.LayerNorm default
    row = lambda a: a.reshape(1, -1)
    return pl.pallas_call(
        partial(_kernel, eps=eps),
        grid=(v // t,),
        in_specs=[
            pl.BlockSpec((t, c), lambda i: (i, 0)),
            pl.BlockSpec((t, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, 4 * c), lambda i: (0, 0)),
            pl.BlockSpec((1, 4 * c), lambda i: (0, 0)),
            pl.BlockSpec((4 * c, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((t, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((v, c), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(x2, s2, row(ln_scale), row(ln_bias), w1, row(b1), w2, row(b2),
      row(gamma))


def _xla_tail(x, shortcut, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
              eps=1e-6):
    """The reference XLA composition (used for the backward pass and as the
    ineligible-shape fallback). Must match ConvNeXtBlock3D's flax ops."""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    h = xc * jax.lax.rsqrt(var + eps)
    h = (h * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)).astype(dt)
    a = jnp.dot(h, w1.astype(dt), preferred_element_type=jnp.float32)
    a = a.astype(dt) + b1.astype(dt)
    a = jax.nn.gelu(a.astype(jnp.float32), approximate=False).astype(dt)
    y = jnp.dot(a, w2.astype(dt), preferred_element_type=jnp.float32)
    y = y.astype(dt) + b2.astype(dt)
    return shortcut + y * gamma.astype(dt)


@jax.custom_vjp
def mlp_block_tail(x, shortcut, ln_scale, ln_bias, w1, b1, w2, b2, gamma):
    """Fused block tail: ``shortcut + layer_scale * MLP(LN(x))`` on
    [B, X, Y, Z, C] (``x`` is the dwconv output, ``shortcut`` the block
    input); falls back to the XLA composition when the shape is ineligible
    or off-TPU."""
    if mlp_tail_eligible(x) and x.dtype in (jnp.bfloat16, jnp.float32):
        shape = x.shape
        out = _mlp_call(x.reshape(-1, shape[-1]),
                        shortcut.reshape(-1, shape[-1]), ln_scale, ln_bias,
                        w1, b1, w2, b2, gamma,
                        interpret=jax.default_backend() != "tpu")
        return out.reshape(shape)
    return _xla_tail(x, shortcut, ln_scale, ln_bias, w1, b1, w2, b2, gamma)


def _fwd(x, shortcut, ln_scale, ln_bias, w1, b1, w2, b2, gamma):
    return (mlp_block_tail(x, shortcut, ln_scale, ln_bias, w1, b1, w2, b2,
                           gamma),
            (x, shortcut, ln_scale, ln_bias, w1, b1, w2, b2, gamma))


def _bwd(res, g):
    _, vjp = jax.vjp(_xla_tail, *res)
    return vjp(g)


mlp_block_tail.defvjp(_fwd, _bwd)
