"""Time one ConvNeXt block and its pieces at the inference tile shape."""

import sys
import time

import jax
import jax.numpy as jnp

from skoots_tpu.models.unext import ConvNeXtBlock3D, DWConv3D

TILE = (1, 192, 192, 96, 32)


def timeit(fn, *args, n=4):
    @jax.jit
    def loop(*a):
        def body(i, carry):
            out = fn(*((carry,) + a[1:]))
            return (carry + out[..., :1] * 0).astype(carry.dtype)

        return jax.lax.fori_loop(0, n, body, a[0]).astype(jnp.float32).mean()

    t0 = time.perf_counter()
    float(loop(*args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(loop(*args))
    return (time.perf_counter() - t0) / n, compile_s


def main():
    which = sys.argv[1:] or ["block_xla", "block_pallas", "dw_xla", "dw_pallas"]
    x = jax.random.normal(jax.random.PRNGKey(0), TILE, jnp.bfloat16)
    mvox = TILE[1] * TILE[2] * TILE[3] / 1e6

    for name in which:
        if name == "upsample":
            from skoots_tpu.models.unext import upsample_trilinear

            half = x[:, :96, :96, :48, :]
            dt, comp = timeit(
                lambda v: upsample_trilinear(v)[:, :96, :96, :48], half
            )
            print(f"upsample(96->192): {dt*1e3:.1f} ms compile {comp:.0f}s")
            continue
        if name == "stem":
            from flax import linen as nn

            conv = nn.Conv(32, (7, 7, 7), padding="SAME", dtype=jnp.bfloat16)
            p = conv.init(jax.random.PRNGKey(0), x[:, :32, :32, :32, :1])
            dt, comp = timeit(lambda v: conv.apply(p, v[..., :1]), x)
            print(f"stem(1->32): {dt*1e3:.1f} ms ({dt*1e3/mvox:.2f} ms/Mvox) "
                  f"compile {comp:.0f}s")
            continue
        if name.startswith("block"):
            impl = name.split("_")[1]
            mod = ConvNeXtBlock3D(32, 7, 1.0, 0.0, "gelu", jnp.bfloat16,
                                  dwconv_impl=impl)
            params = mod.init({"params": jax.random.PRNGKey(0)},
                              x[:, :32, :32, :32], True)
            fn = lambda v: mod.apply(params, v, True)
        else:
            impl = name.split("_")[1]
            mod = DWConv3D(32, 7, jnp.bfloat16, impl)
            params = mod.init({"params": jax.random.PRNGKey(0)},
                              x[:, :32, :32, :32])
            fn = lambda v: mod.apply(params, v)
        dt, comp = timeit(fn, x)
        print(f"{name}: {dt*1e3:.1f} ms ({dt*1e3/mvox:.2f} ms/Mvox) "
              f"compile {comp:.0f}s")


if __name__ == "__main__":
    main()
