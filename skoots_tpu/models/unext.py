"""UNeXT-3D: ConvNeXt-style 3D UNet backbone (flax.linen, channels-last).

Ground-up TPU re-design of the reference's un-vendored ``bism`` backbone
(interface documented at /root/reference/skoots/lib/utils.py:17-107 and
/root/reference/skoots/config.py:20-34): dims [32, 64, 128, 64, 32], depths
[2, 2, 2, 2, 2], depthwise 7^3 convs, channels-first LayerNorm in the
reference -> channels-LAST here (the natural TPU layout: C maps onto lanes,
the ConvNeXt MLP becomes two MXU matmuls), GELU, layer-scale, drop-path,
ConcatConv skip fusion, trilinear upsampling.

Structure for odd-length ``dims`` of 2k+1 entries: k encoder stages,
1 bottleneck, k decoder stages; each non-bottleneck stage changes resolution
by 2x in every spatial axis.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

_ACTIVATIONS: dict[str, Callable] = {
    # exact (erf) gelu: torch nn.GELU default, used by the reference's
    # ConvNeXt blocks — flax's approximate tanh form would break .trch
    # weight-import parity
    "gelu": partial(nn.gelu, approximate=False),
    "relu": nn.relu,
    "silu": nn.silu,
    "selu": nn.selu,
}


class DropPath(nn.Module):
    """Stochastic depth: drop the residual branch per sample."""

    rate: float

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


def _pallas_dwconv_eligible(x: jax.Array, k: int) -> bool:
    """Shape gate for the Pallas z-lane-packed depthwise kernel."""
    if x.ndim != 5:
        return False
    _, xs, ys, zs, c = x.shape
    if c > 128 or 128 % c or zs % (128 // c):
        return False
    zq = zs // (128 // c)
    return zq % 8 == 0 and min(xs, ys) >= 8


class DWConv3D(nn.Module):
    """Depthwise k^3 conv with the same param tree as flax nn.Conv
    (kernel [k,k,k,1,C], bias [C]) and a Pallas fast path.

    impl: 'xla' | 'pallas' | 'auto' (pallas on TPU when shapes allow).
    """

    dim: int
    kernel_size: int = 7
    dtype: jnp.dtype = jnp.bfloat16
    impl: str = "auto"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, k, 1, self.dim),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.dim,),
                          jnp.float32)
        x = x.astype(self.dtype)
        kb = kernel.astype(self.dtype)
        bb = bias.astype(self.dtype)
        impl = self.impl
        if impl == "auto":
            on_tpu = any(d.platform == "tpu" for d in jax.devices())
            impl = "pallas" if on_tpu else "xla"
        if impl == "pallas" and _pallas_dwconv_eligible(x, k):
            from skoots_tpu.kernels.dwconv import dwconv3d

            return dwconv3d(x, kb[:, :, :, 0, :], bb)
        out = jax.lax.conv_general_dilated(
            x,
            kb,
            window_strides=(1, 1, 1),
            padding="SAME",
            dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
            feature_group_count=self.dim,
        )
        return out + bb


class StemConv3D(nn.Module):
    """Dense k^3 conv from a single input channel (the UNeXT stem).

    XLA lowers C_in=1 convolutions off the MXU (measured 28 ms/Mvox on v5e);
    a dense 1->C conv is exactly a depthwise conv applied to the input
    broadcast across C channels, so the Pallas depthwise kernel runs it at
    ~7 ms/Mvox. Param tree matches flax nn.Conv for a 1-channel input
    (kernel [k,k,k,1,C], bias [C]).
    """

    dim: int
    kernel_size: int = 7
    dtype: jnp.dtype = jnp.bfloat16
    impl: str = "auto"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, k, 1, self.dim),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.dim,),
                          jnp.float32)
        x = x.astype(self.dtype)
        kb = kernel.astype(self.dtype)
        bb = bias.astype(self.dtype)
        impl = self.impl
        if impl == "auto":
            impl = os.environ.get("SKOOTS_STEM_IMPL", "auto")
        if impl == "auto":
            on_tpu = any(d.platform == "tpu" for d in jax.devices())
            impl = "pallas" if on_tpu else "xla"
        if x.shape[-1] == 1 and impl == "im2col":
            # Measured DEAD END, kept for the record (runs/
            # bench_stemdown.json): 433.9 ms vs pallas 41.3 / xla 164.2
            # per 256^2x96 tile on v5e — conv_general_dilated_patches
            # lowers as a real 1->k^3-channel conv and dominates. The
            # broadcast-depthwise Pallas path at ~2.9 TFLOP/s effective
            # VPU is the measured floor for a C_in=1 k^3 stem.
            pat = jax.lax.conv_general_dilated_patches(
                x, (k, k, k), (1, 1, 1), "SAME",
                dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
            )
            w = kb[:, :, :, 0, :].reshape(k * k * k, self.dim)
            out = jnp.dot(
                pat.reshape(-1, k * k * k), w,
                preferred_element_type=jnp.float32,
            ).astype(self.dtype)
            return out.reshape(x.shape[:-1] + (self.dim,)) + bb
        wide = jnp.broadcast_to(x, x.shape[:-1] + (self.dim,))
        if (x.shape[-1] == 1 and impl == "pallas"
                and _pallas_dwconv_eligible(wide, k)):
            from skoots_tpu.kernels.dwconv import dwconv3d

            return dwconv3d(wide, jnp.broadcast_to(
                kb[:, :, :, 0, :], kb.shape[:3] + (self.dim,)), bb)
        out = jax.lax.conv_general_dilated(
            x,
            kb,
            window_strides=(1, 1, 1),
            padding="SAME",
            dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
        )
        return out + bb


class _LNParams(nn.Module):
    """Declares LayerNorm's params without computing — the fused-kernel
    branch of ConvNeXtBlock3D needs raw tensors. Names/inits/dtypes mirror
    nn.LayerNorm exactly so both branches build identical param trees."""

    dim: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.dim,)),
            self.param("bias", nn.initializers.zeros, (self.dim,)),
        )


class _DenseParams(nn.Module):
    """Param mirror of nn.Dense (lecun_normal kernel, zero bias)."""

    din: int
    dout: int

    @nn.compact
    def __call__(self):
        return (
            self.param("kernel", nn.initializers.lecun_normal(),
                       (self.din, self.dout)),
            self.param("bias", nn.initializers.zeros, (self.dout,)),
        )


class ConvNeXtBlock3D(nn.Module):
    """ConvNeXt block: depthwise k^3 conv -> LN -> pointwise MLP (4x) -> scale.

    Equivalent role to bism.modules.convnext_block.Block3D (reference
    lib/utils.py:25). The depthwise conv runs in the Pallas packed-lane
    kernel when eligible, and the block tail (LN -> pw1 -> GELU -> pw2 ->
    layer-scale -> residual) fuses into one Pallas VMEM-streaming pass
    (kernels/mlp.py) — the XLA composition materializes the [V, 4C] hidden
    twice in HBM because two matmuls never share a fusion.
    """

    dim: int
    kernel_size: int = 7
    layer_scale_init: float = 1.0
    drop_path: float = 0.0
    activation: str = "gelu"
    dtype: jnp.dtype = jnp.bfloat16
    dwconv_impl: str = "auto"
    mlp_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        act = _ACTIVATIONS[self.activation]
        shortcut = x
        k = self.kernel_size
        x = DWConv3D(
            self.dim,
            kernel_size=k,
            dtype=self.dtype,
            impl=self.dwconv_impl,
            name="dwconv",
        )(x)

        from skoots_tpu.kernels.mlp import mlp_block_tail, mlp_tail_eligible

        use_fused = (
            self.mlp_impl in ("auto", "pallas")
            and self.activation == "gelu"
            and self.layer_scale_init > 0
            and (self.drop_path == 0.0 or deterministic)
            and mlp_tail_eligible(x)
            and (
                self.mlp_impl == "pallas"
                or (jax.default_backend() == "tpu" and x.dtype == jnp.bfloat16)
            )
        )
        if use_fused:
            ls, lb = _LNParams(self.dim, name="norm")()
            w1, b1 = _DenseParams(self.dim, 4 * self.dim, name="pw1")()
            w2, b2 = _DenseParams(4 * self.dim, self.dim, name="pw2")()
            gamma = self.param(
                "gamma",
                nn.initializers.constant(self.layer_scale_init),
                (self.dim,),
                jnp.float32,
            )
            return mlp_block_tail(
                x, shortcut, ls.astype(self.dtype), lb.astype(self.dtype),
                w1.astype(self.dtype), b1.astype(self.dtype),
                w2.astype(self.dtype), b2.astype(self.dtype), gamma,
            )

        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        x = nn.Dense(4 * self.dim, dtype=self.dtype, name="pw1")(x)
        x = act(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="pw2")(x)
        if self.layer_scale_init > 0:
            gamma = self.param(
                "gamma",
                nn.initializers.constant(self.layer_scale_init),
                (self.dim,),
                jnp.float32,
            )
            x = x * gamma.astype(self.dtype)
        x = DropPath(self.drop_path)(x, deterministic)
        return shortcut + x


class _ConvParams(nn.Module):
    """Param mirror of nn.Conv (lecun_normal kernel, zero bias) for
    branches that run the conv as an explicit matmul."""

    shape: tuple
    dout: int

    @nn.compact
    def __call__(self):
        return (
            self.param("kernel", nn.initializers.lecun_normal(), self.shape),
            self.param("bias", nn.initializers.zeros, (self.dout,)),
        )


class Downsample(nn.Module):
    """LayerNorm + strided 2^3 conv (resolution /2, channels -> dim).

    The 2^3/stride-2 windows never overlap, so impl='matmul' runs the conv
    as reshape -> [V/8, 8C] x [8C, dim] on the MXU. Measured DEAD END,
    kept for the record (runs/bench_stemdown.json): 27.7 ms vs the XLA
    conv lowering's 14.9 ms per 256^2x96 tile on v5e — the 8-way
    window-gather transpose relayout costs more than the conv saves.
    Both branches build the identical nn.Conv param tree
    (conv/kernel [2,2,2,C,dim], conv/bias [dim])."""

    dim: int
    dtype: jnp.dtype = jnp.bfloat16
    impl: str = "auto"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        impl = self.impl
        if impl == "auto":
            impl = os.environ.get("SKOOTS_DOWNSAMPLE_IMPL", "auto")
        c = x.shape[-1]
        if impl == "auto":
            # stays on the conv lowering until tools/bench_stemdown.py
            # confirms the matmul path on hardware
            impl = "xla"
        even = all(d % 2 == 0 for d in x.shape[1:4])
        if impl == "matmul" and even:
            kern, bias = _ConvParams((2, 2, 2, c, self.dim), self.dim,
                                     name="conv")()
            kb = kern.astype(self.dtype)
            bb = bias.astype(self.dtype)
            b, sx, sy, sz, _ = x.shape
            h = x.reshape(b, sx // 2, 2, sy // 2, 2, sz // 2, 2, c)
            h = h.transpose(0, 1, 3, 5, 2, 4, 6, 7)
            # (2x, 2y, 2z, c) row-major == kernel[kx, ky, kz, c] flatten
            y = jnp.dot(
                h.reshape(-1, 8 * c), kb.reshape(8 * c, self.dim),
                preferred_element_type=jnp.float32,
            ).astype(self.dtype) + bb
            return y.reshape(b, sx // 2, sy // 2, sz // 2, self.dim)
        return nn.Conv(
            self.dim, kernel_size=(2, 2, 2), strides=(2, 2, 2), dtype=self.dtype,
            name="conv",
        )(x)


def _upsample2x_axis(x: jax.Array, axis: int) -> jax.Array:
    """Separable half of a 2x trilinear upsample along one spatial axis
    (half-pixel centers, edge clamp — matches jax.image.resize 'trilinear'
    and torch F.interpolate(align_corners=False))."""
    lo = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 0, 1, axis=axis),
         jax.lax.slice_in_dim(x, 0, x.shape[axis] - 1, axis=axis)], axis=axis
    )
    hi = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 1, x.shape[axis], axis=axis),
         jax.lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis],
                              axis=axis)], axis=axis
    )
    even = 0.75 * x + 0.25 * lo  # output 2i
    odd = 0.75 * x + 0.25 * hi   # output 2i+1
    stacked = jnp.stack([even, odd], axis=axis + 1)
    shape = list(x.shape)
    shape[axis] *= 2
    return stacked.reshape(shape)


def upsample_trilinear(x: jax.Array, factor: int = 2) -> jax.Array:
    """Trilinear 2x upsample (reference UpSampleLayer3D role).

    Hand-rolled separable interleave: numerically identical to
    ``jax.image.resize(..., 'trilinear')`` at factor 2 but compiles in
    seconds instead of minutes. At factor 2 the whole op runs as one
    Pallas VMEM pass when eligible (kernels/upsample.py; the XLA
    three-pass composition costs ~45 ms vs a ~2 ms roofline per 256^2x96
    tile, runs/fwd_split.json) with this composition as fallback."""
    if factor == 2:
        from skoots_tpu.kernels.upsample import upsample2x_trilinear

        return upsample2x_trilinear(x)
    b, sx, sy, sz, c = x.shape
    return jax.image.resize(
        x, (b, sx * factor, sy * factor, sz * factor, c), method="trilinear"
    )


class ConcatConv3D(nn.Module):
    """Skip fusion: concat encoder skip with decoder stream, 1^3 conv to dim.

    Equivalent role to bism.modules.concat.ConcatConv3D (lib/utils.py:44).
    """

    dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, skip: jax.Array) -> jax.Array:
        y = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        return nn.Dense(self.dim, dtype=self.dtype, name="fuse")(y)


class UNeXT3D(nn.Module):
    """The full U: stem -> k encoder stages -> bottleneck -> k decoder stages.

    Args mirror the reference cfg.MODEL schema (config.py:20-34). Input and
    output are channels-last ``[B, X, Y, Z, C]``; spatial dims must be
    divisible by ``2**(len(dims)//2)``.
    """

    in_channels: int = 1
    out_channels: int = 32
    dims: Sequence[int] = (32, 64, 128, 64, 32)
    depths: Sequence[int] = (2, 2, 2, 2, 2)
    kernel_size: int = 7
    drop_path_rate: float = 0.0
    layer_scale_init_value: float = 1.0
    activation: str = "gelu"
    dtype: jnp.dtype = jnp.bfloat16
    dwconv_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        assert len(self.dims) % 2 == 1, "dims must be odd-length (symmetric U)"
        k_down = len(self.dims) // 2
        dims, depths = list(self.dims), list(self.depths)

        def stage(x, dim, depth, name):
            for i in range(depth):
                x = ConvNeXtBlock3D(
                    dim,
                    self.kernel_size,
                    self.layer_scale_init_value,
                    self.drop_path_rate,
                    self.activation,
                    self.dtype,
                    dwconv_impl=self.dwconv_impl,
                    name=f"{name}_block{i}",
                )(x, deterministic)
            return x

        x = x.astype(self.dtype)
        k = self.kernel_size
        if self.in_channels == 1:
            x = StemConv3D(dims[0], k, self.dtype, self.dwconv_impl,
                           name="stem")(x)
        else:
            x = nn.Conv(
                dims[0], kernel_size=(k, k, k), padding="SAME",
                dtype=self.dtype, name="stem",
            )(x)

        skips = []
        for s in range(k_down):  # encoder
            x = stage(x, dims[s], depths[s], f"enc{s}")
            skips.append(x)
            x = Downsample(dims[s + 1], self.dtype, name=f"down{s}")(x)

        x = stage(x, dims[k_down], depths[k_down], "bottleneck")

        for s in range(k_down):  # decoder
            d = k_down + 1 + s
            x = upsample_trilinear(x)
            x = ConcatConv3D(dims[d], self.dtype, name=f"concat{s}")(
                x, skips[k_down - 1 - s]
            )
            x = stage(x, dims[d], depths[d], f"dec{s}")

        from skoots_tpu.kernels.lnhead import ln_head, ln_head_eligible

        impl = os.environ.get("SKOOTS_LNHEAD_IMPL", "auto")
        use_fused = (
            impl in ("auto", "pallas")
            and ln_head_eligible(x)
            and (
                impl == "pallas"
                or (jax.default_backend() == "tpu"
                    and x.dtype == jnp.bfloat16)
            )
        )
        if use_fused:
            # fused LN + 1x1 head (kernels/lnhead.py): identical param
            # tree to the flax composition below
            ls, lb = _LNParams(x.shape[-1], name="final_norm")()
            kern, bias = _ConvParams(
                (1, 1, 1, x.shape[-1], self.out_channels),
                self.out_channels, name="head_conv",
            )()
            return ln_head(
                x, ls.astype(self.dtype), lb.astype(self.dtype),
                kern.reshape(x.shape[-1], self.out_channels).astype(self.dtype),
                bias.astype(self.dtype),
            )
        x = nn.LayerNorm(dtype=self.dtype, name="final_norm")(x)
        x = nn.Conv(
            self.out_channels, kernel_size=(1, 1, 1), dtype=self.dtype,
            name="head_conv",
        )(x)
        return x


class UNet3D(nn.Module):
    """Classic conv-norm-act double-block 3D UNet (reference 'bism_unet' role,
    lib/utils.py:21-22)."""

    in_channels: int = 1
    out_channels: int = 32
    dims: Sequence[int] = (32, 64, 128, 64, 32)
    depths: Sequence[int] = (2, 2, 2, 2, 2)
    kernel_size: int = 3
    activation: str = "relu"
    dtype: jnp.dtype = jnp.bfloat16
    # accepted for factory compatibility; unused by the classic blocks
    drop_path_rate: float = 0.0
    layer_scale_init_value: float = 1.0
    dwconv_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        act = _ACTIVATIONS[self.activation]
        k = min(self.kernel_size, 3)
        k_down = len(self.dims) // 2
        dims, depths = list(self.dims), list(self.depths)

        def stage(x, dim, depth, name):
            for i in range(depth):
                x = nn.Conv(dim, (k, k, k), padding="SAME", dtype=self.dtype,
                            name=f"{name}_conv{i}")(x)
                x = nn.GroupNorm(num_groups=min(8, dim), dtype=self.dtype,
                                 name=f"{name}_gn{i}")(x)
                x = act(x)
            return x

        x = x.astype(self.dtype)
        skips = []
        for s in range(k_down):
            x = stage(x, dims[s], depths[s], f"enc{s}")
            skips.append(x)
            x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
        x = stage(x, dims[k_down], depths[k_down], "bottleneck")
        for s in range(k_down):
            d = k_down + 1 + s
            x = upsample_trilinear(x)
            x = jnp.concatenate([x, skips[k_down - 1 - s].astype(x.dtype)], -1)
            x = stage(x, dims[d], depths[d], f"dec{s}")
        return nn.Conv(self.out_channels, (1, 1, 1), dtype=self.dtype,
                       name="head_conv")(x)
