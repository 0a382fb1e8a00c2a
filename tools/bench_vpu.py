"""Measure the chip's sustainable VPU FMA throughput (the dwconv roofline)."""

import time

import jax
import jax.numpy as jnp


def run(dtype, n=256, shape=(512, 1024)):
    a = jnp.full(shape, 1.000001, dtype)
    b = jnp.full(shape, 0.9999, dtype)

    @jax.jit
    def loop(x):
        def body(i, x):
            # 8 dependent FMAs per iteration
            for _ in range(8):
                x = x * a + b
            return x

        return jax.lax.fori_loop(0, n, body, x)

    x = jnp.ones(shape, dtype)
    loop(x).block_until_ready()
    t0 = time.perf_counter()
    loop(x).block_until_ready()
    dt = time.perf_counter() - t0
    flops = shape[0] * shape[1] * n * 8 * 2
    print(f"{dtype.__name__} {shape}: {dt*1e3:.2f} ms  {flops/dt/1e12:.2f} TFLOP/s")


if __name__ == "__main__":
    for dt in (jnp.float32, jnp.bfloat16):
        run(dt)
