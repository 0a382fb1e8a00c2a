"""Micro: VMEM load+FMA throughput for dwconv-like access patterns.

Each variant computes ~343 load+FMA ops per output column and reports
effective TFLOP/s (2 flops per lane element per tap).
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TAPS = 343
COLS = 64  # output columns per kernel invocation
SHAPE = (COLS + 8, 16, 128)  # source buffer


def k_static(buf_ref, w_ref, o_ref):
    # all loads static-base: upper bound for aligned load+FMA
    def body(i, _):
        acc = jnp.zeros((16, 128), jnp.float32)
        for t in range(TAPS):
            acc += buf_ref[t % COLS] * w_ref[0, t % 128]
        o_ref[i] = acc
        return 0

    jax.lax.fori_loop(0, COLS, body, 0)


def k_dynamic(buf_ref, w_ref, o_ref):
    # per-tap dynamic base load (v3's pattern)
    def body(i, _):
        acc = jnp.zeros((16, 128), jnp.float32)
        for t in range(TAPS):
            acc += buf_ref[i + (t % 8)] * w_ref[0, t % 128]
        o_ref[i] = acc
        return 0

    jax.lax.fori_loop(0, COLS, body, 0)


def k_dynamic_chains(buf_ref, w_ref, o_ref, *, chains=8):
    def body(i, _):
        accs = []
        for ci in range(chains):
            ts = list(range(TAPS))[ci::chains]
            a = buf_ref[i + (ts[0] % 8)] * w_ref[0, ts[0] % 128]
            for t in ts[1:]:
                a += buf_ref[i + (t % 8)] * w_ref[0, t % 128]
            accs.append(a)
        while len(accs) > 1:
            accs = [accs[n] + accs[n + 1] for n in range(0, len(accs) - 1, 2)] + (
                accs[-1:] if len(accs) % 2 else []
            )
        o_ref[i] = accs[0]
        return 0

    jax.lax.fori_loop(0, COLS, body, 0)


def k_static_chains(buf_ref, w_ref, o_ref, *, chains=8):
    def body(i, _):
        accs = []
        for ci in range(chains):
            ts = list(range(TAPS))[ci::chains]
            a = buf_ref[ts[0] % COLS] * w_ref[0, ts[0] % 128]
            for t in ts[1:]:
                a += buf_ref[t % COLS] * w_ref[0, t % 128]
            accs.append(a)
        while len(accs) > 1:
            accs = [accs[n] + accs[n + 1] for n in range(0, len(accs) - 1, 2)] + (
                accs[-1:] if len(accs) % 2 else []
            )
        o_ref[i] = accs[0]
        return 0

    jax.lax.fori_loop(0, COLS, body, 0)


def run(kfn, name):
    buf = jnp.ones(SHAPE, jnp.float32)
    w = jnp.ones((1, 128), jnp.float32)

    @jax.jit
    def go(buf, w):
        return pl.pallas_call(
            kfn,
            out_shape=jax.ShapeDtypeStruct((COLS, 16, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        )(buf, w)

    go(buf, w).block_until_ready()
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        r = go(buf, w)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / n
    flops = COLS * TAPS * 16 * 128 * 2
    print(f"{name}: {dt*1e6:9.1f} us  {flops/dt/1e12:6.2f} TFLOP/s")


if __name__ == "__main__":
    run(k_static, "static")
    run(k_dynamic, "dynamic")
    run(partial(k_static_chains), "static_chains8")
    run(partial(k_dynamic_chains), "dynamic_chains8")
