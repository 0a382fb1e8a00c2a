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
        if name.startswith("mlp"):
            # block tail only (LN -> pw1 -> gelu -> pw2 -> scale -> residual)
            from skoots_tpu.kernels.mlp import _mlp_call, _xla_tail

            c = TILE[-1]
            ks = jax.random.split(jax.random.PRNGKey(2), 8)
            ls, lb = jnp.ones((c,), jnp.bfloat16), jnp.zeros((c,), jnp.bfloat16)
            w1 = jax.random.normal(ks[0], (c, 4 * c), jnp.bfloat16) * 0.1
            b1 = jnp.zeros((4 * c,), jnp.bfloat16)
            w2 = jax.random.normal(ks[1], (4 * c, c), jnp.bfloat16) * 0.1
            b2 = jnp.zeros((c,), jnp.bfloat16)
            g = jnp.ones((c,), jnp.float32)
            if name == "mlp_fused":
                def fn(v):
                    v2 = v.reshape(-1, c)
                    return _mlp_call(v2, v2, ls, lb, w1, b1, w2, b2,
                                     g).reshape(TILE)
            else:
                fn = lambda v: _xla_tail(v, v, ls, lb, w1, b1, w2, b2, g)
            dt, comp = timeit(fn, x)
            print(f"{name}: {dt*1e3:.1f} ms ({dt*1e3/mvox:.2f} ms/Mvox) "
                  f"compile {comp:.0f}s")
            continue
        if name.startswith("block"):
            impl = name.split("_")[1]
            if impl == "fused":
                mod = ConvNeXtBlock3D(32, 7, 1.0, 0.0, "gelu", jnp.bfloat16,
                                      dwconv_impl="auto", mlp_impl="pallas")
            else:
                mod = ConvNeXtBlock3D(32, 7, 1.0, 0.0, "gelu", jnp.bfloat16,
                                      dwconv_impl=impl, mlp_impl="xla")
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
