"""VPU peak FMA throughput via a Pallas kernel (data resident in VMEM)."""

import time
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_ITER = 512
UNROLL = 16


def kernel(a_ref, b_ref, o_ref, *, dtype):
    a = a_ref[:]
    b = b_ref[:]

    def body(i, x):
        for _ in range(UNROLL):
            x = x * a + b
        return x

    o_ref[:] = jax.lax.fori_loop(0, N_ITER, body, a)


def run(dtype, shape=(256, 128)):
    a = jnp.full(shape, 1.000001, dtype)
    b = jnp.full(shape, 0.9999, dtype)

    @jax.jit
    def go(a, b):
        return pl.pallas_call(
            partial(kernel, dtype=dtype),
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b)

    go(a, b).block_until_ready()
    t0 = time.perf_counter()
    go(a, b).block_until_ready()
    dt = time.perf_counter() - t0
    flops = shape[0] * shape[1] * N_ITER * UNROLL * 2
    print(f"{dtype.__name__} {shape}: {dt*1e3:.3f} ms  {flops/dt/1e12:.2f} TFLOP/s")


if __name__ == "__main__":
    for dt in (jnp.float32, jnp.bfloat16):
        for shape in ((256, 128), (1024, 128), (64, 128)):
            run(dt, shape)
