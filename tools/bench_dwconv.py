"""Microbenchmark: 7^3 depthwise conv variants on the real TPU chip.

Times each variant by iterating the op inside one jitted fori_loop (the axon
relay has a ~33 ms per-dispatch floor, so per-op timing must amortize).

Usage: python tools/bench_dwconv.py [variant ...]
"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from skoots_tpu.kernels.dwconv import (
    dwconv3d_pallas,
    dwconv3d_pallas_v4,
    dwconv3d_pallas_v6,
)

K = 7


def xla_dwconv(x, w, b):
    c = x.shape[-1]
    out = jax.lax.conv_general_dilated(
        x,
        w.reshape(K, K, K, 1, c),
        window_strides=(1, 1, 1),
        padding="SAME",
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
        feature_group_count=c,
    )
    return out + b


def make_timer(fn, x, n=8):
    @jax.jit
    def loop(x):
        def body(i, v):
            return fn(v)

        return jax.lax.fori_loop(0, n, body, x)

    # compile
    loop(x).block_until_ready()
    t0 = time.perf_counter()
    loop(x).block_until_ready()
    t1 = time.perf_counter()
    return (t1 - t0) / n


def main():
    shapes = [
        (1, 128, 128, 64, 32),
        (1, 96, 96, 48, 64),
        (1, 48, 48, 24, 128),
        (1, 192, 192, 96, 32),
        (1, 96, 96, 48, 64),
        (1, 48, 48, 24, 128),
    ]
    argv = sys.argv[1:]
    if argv and argv[0].startswith("--shape"):
        shapes = [shapes[int(argv[0].split("=")[1])]]
        argv = argv[1:]
    sel = argv or None
    for shp in shapes:
        b, xs, ys, zs, c = shp
        mvox = xs * ys * zs / 1e6
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, shp, jnp.bfloat16)
        w = jax.random.normal(key, (K, K, K, c), jnp.bfloat16)
        bias = jax.random.normal(key, (c,), jnp.bfloat16)

        variants = {
            "xla": lambda v: xla_dwconv(v, w, bias),
            "slab_16x128": lambda v: dwconv3d_pallas(v, w, bias, block=(16, 128)),
            "v4_8x8_a8": lambda v: dwconv3d_pallas_v4(
                v, w, bias, block=(8, 8), acols=8
            ),
            "v4_8x16_a16": lambda v: dwconv3d_pallas_v4(
                v, w, bias, block=(8, 16), acols=16
            ),
            "v4_auto": lambda v: dwconv3d_pallas_v4(v, w, bias, block=(8, 16)),
            "v4_8x8_auto": lambda v: dwconv3d_pallas_v4(v, w, bias, block=(8, 8)),
            "v4_16x16_a16": lambda v: dwconv3d_pallas_v4(
                v, w, bias, block=(16, 16), acols=16
            ),
            "v4_8x8_a4": lambda v: dwconv3d_pallas_v4(
                v, w, bias, block=(8, 8), acols=4
            ),
            "v4_probe_noload": lambda v: dwconv3d_pallas_v4(
                v, w, bias, block=(8, 16), acols=16, probe="noload"
            ),
            "v4_probe_noweight": lambda v: dwconv3d_pallas_v4(
                v, w, bias, block=(8, 16), acols=16, probe="noweight"
            ),
            "v4_probe_noprep": lambda v: dwconv3d_pallas_v4(
                v, w, bias, block=(8, 16), acols=16, probe="noprep"
            ),
            "v4_hoistw": lambda v: dwconv3d_pallas_v4(
                v, w, bias, block=(8, 16), acols=16, probe="hoistw"
            ),
            "v6_8x16": lambda v: dwconv3d_pallas_v6(v, w, bias, block=(8, 16)),
            "v6_8x32": lambda v: dwconv3d_pallas_v6(v, w, bias, block=(8, 32)),
            "v6_4x32": lambda v: dwconv3d_pallas_v6(v, w, bias, block=(4, 32)),
            "v6_16x32": lambda v: dwconv3d_pallas_v6(v, w, bias, block=(16, 32)),
        }
        for name, fn in variants.items():
            if sel and name not in sel:
                continue
            if "packed" in name and (128 % c or zs % (128 // c)):
                continue
            try:
                dt = make_timer(fn, x)
            except Exception as e:  # noqa: BLE001
                print(f"{shp} {name}: FAIL {type(e).__name__}: {e}")
                continue
            gflop = 2 * K**3 * c * xs * ys * zs / 1e9
            print(
                f"{shp} {name}: {dt*1e3:8.2f} ms  "
                f"{dt*1e3/mvox:7.2f} ms/Mvox  {gflop/dt/1e3:6.2f} TFLOP/s"
            )


if __name__ == "__main__":
    main()
