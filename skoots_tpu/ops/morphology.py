"""Conv-free morphology as XLA ``reduce_window`` ops (channels-last).

The reference implements dilation/erosion/median/mean as 27-tap conv3d patch
extraction (/root/reference/skoots/lib/morphology.py:107-233). On TPU those
are natively windowed reductions: one fused reduce_window per op, no patch
materialisation. Borders behave like the reference's zero padding.

All functions accept ``[B, X, Y, Z, C]`` (or any rank with the window applied
to the three axes before the channel axis).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _window_dims(x: jax.Array, window: tuple[int, int, int]) -> tuple[int, ...]:
    ones = [1] * x.ndim
    ones[-4:-1] = list(window)  # X, Y, Z axes (channels-last)
    return tuple(ones)


def _reduce(x, init, op, window):
    dims = _window_dims(x, window)
    pads = tuple((((w - 1) // 2), ((w - 1) // 2)) for w in dims)
    return jax.lax.reduce_window(x, init, op, dims, (1,) * x.ndim, pads)


def binary_dilation(image: jax.Array, window: tuple[int, int, int] = (3, 3, 3)) -> jax.Array:
    """3D binary dilation (26-neighborhood max); zero-padded borders."""
    return _reduce(image, jnp.array(0, image.dtype), jax.lax.max, window)


def binary_dilation_2d(image: jax.Array) -> jax.Array:
    """Per-slice 2D dilation: 3x3 in X/Y only (reference morphology.py:179-199)."""
    return binary_dilation(image, window=(3, 3, 1))


def binary_erosion(image: jax.Array, window: tuple[int, int, int] = (3, 3, 3)) -> jax.Array:
    """3D binary erosion. Zero border padding erodes edges, matching the
    reference's conv-with-zero-pad + min (morphology.py:131-152)."""
    dims = _window_dims(image, window)
    pads = [(0, 0)] * image.ndim
    for ax, w in enumerate(dims):
        if w > 1:
            pads[ax] = ((w - 1) // 2, (w - 1) // 2)
    padded = jnp.pad(image, pads, mode="constant", constant_values=0)
    return jax.lax.reduce_window(
        padded,
        jnp.array(jnp.finfo(image.dtype).max if jnp.issubdtype(image.dtype, jnp.floating) else jnp.iinfo(image.dtype).max, image.dtype),
        jax.lax.min,
        dims,
        (1,) * image.ndim,
        "VALID",
    )


def mean_filter(image: jax.Array, window: tuple[int, int, int] = (3, 3, 3)) -> jax.Array:
    """Window mean (includes zero-padded borders, like the reference)."""
    total = _reduce(image.astype(jnp.float32), jnp.float32(0), jax.lax.add, window)
    return total / float(np.prod(window))


def median_filter(image: jax.Array, window: tuple[int, int, int] = (3, 3, 3)) -> jax.Array:
    """27-tap median via stacked shifted copies + sort. Small windows only."""
    wx, wy, wz = window
    shifts = []
    for dx in range(-(wx // 2), wx // 2 + 1):
        for dy in range(-(wy // 2), wy // 2 + 1):
            for dz in range(-(wz // 2), wz // 2 + 1):
                shifted = jnp.roll(image, (dx, dy, dz), axis=(-4, -3, -2))
                shifts.append(shifted)
    stack = jnp.stack(shifts, axis=0)
    return jnp.median(stack, axis=0)


@partial(jax.jit, static_argnames=("kernel", "sigma"))
def gauss_filter(
    image: jax.Array,
    kernel: tuple[int, int, int],
    sigma: tuple[float, float, float],
) -> jax.Array:
    """Separable 3D Gaussian blur (channels-last ``[B, X, Y, Z, C]``).

    The reference builds the 3D kernel as an outer product of 1D Gaussians
    (morphology.py:88-127); separable 1D convolutions compute the same thing
    with 3x less FLOPs and map to fused XLA convs.
    """
    out = image.astype(jnp.float32)
    for ax, (k, s) in enumerate(zip(kernel, sigma)):
        if k <= 1:
            continue
        half = (k - 1) * 0.5
        x = jnp.linspace(-half, half, k)
        k1d = jnp.exp(-0.5 * (x / s) ** 2)
        k1d = (k1d / k1d.sum()).astype(jnp.float32)
        spatial_ax = out.ndim - 4 + ax
        # conv along one axis: move axis last-but-one and use conv_general_dilated
        kshape = [1] * out.ndim
        kshape[spatial_ax] = k
        # depthwise via explicit padding + weighted sum of rolls (k is small)
        pads = [(0, 0)] * out.ndim
        pads[spatial_ax] = ((k - 1) // 2, (k - 1) // 2)
        padded = jnp.pad(out, pads, mode="constant")
        acc = jnp.zeros_like(out)
        for i in range(k):
            sl = [slice(None)] * out.ndim
            sl[spatial_ax] = slice(i, i + out.shape[spatial_ax])
            acc = acc + padded[tuple(sl)] * k1d[i]
        out = acc
    return out
