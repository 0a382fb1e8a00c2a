"""Per-op split of the inference forward pass (VERDICT r2 weak #3).

Times each UNeXT component standalone at its in-network shape for the bench
tile, so BASELINE.md can record WHERE the ms/Mvox go: stem, per-stage
ConvNeXt blocks (dwconv + fused MLP tail), down/upsample, skip fusion, head.
Components are timed inside one jitted fori_loop with a dependency feedback
(naive block_until_ready timing through the axon relay reports ~0; see
MEMORY tpu-v5e-kernel-lessons).

Usage: python tools/bench_fwd_split.py [--tile=256,256,96] [--iters=4]
Writes runs/fwd_split.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(fn, params, x, iters):
    """Median-of-one-loop timing: run `iters` dependent applications inside
    one jit, fetch a scalar."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(p, v):
        def body(i, carry):
            out = fn(p, carry)
            # feed a scalar of the output back so iterations can't be elided
            return (carry + jnp.zeros((), carry.dtype) *
                    out.astype(carry.dtype).ravel()[0]).astype(carry.dtype)

        r = jax.lax.fori_loop(0, iters, body, v)
        return r.astype(jnp.float32).ravel()[0]

    t0 = time.perf_counter()
    float(loop(params, x))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(loop(params, x))
    dt = (time.perf_counter() - t0) / iters
    return dt, compile_s


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", default="256,256,96")
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()
    tile = tuple(int(v) for v in args.tile.split(","))

    import jax
    import jax.numpy as jnp

    from skoots_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from skoots_tpu.models.unext import (
        ConcatConv3D,
        ConvNeXtBlock3D,
        Downsample,
        StemConv3D,
        upsample_trilinear,
    )
    from flax import linen as nn

    X, Y, Z = tile
    vol_mvox = X * Y * Z / 1e6
    key = jax.random.PRNGKey(0)

    # component -> (module-or-fn, input shape, weight = #instances in the U
    # scaled by its resolution relative to the full tile)
    cases = []

    def add(name, mod, shape, count, two_inputs=False):
        x = jax.random.normal(key, (1, *shape), jnp.bfloat16)
        if mod is None:
            fn = lambda p, v: upsample_trilinear(v)
            params = {}
        elif two_inputs:
            params = mod.init({"params": key}, x, x)
            fn = lambda p, v: mod.apply(p, v, v)
        else:
            params = mod.init({"params": key}, x)
            fn = lambda p, v: mod.apply(p, v)
        cases.append((name, fn, params, x, count))

    full = (X, Y, Z)
    half = (X // 2, Y // 2, Z // 2)
    quart = (X // 4, Y // 4, Z // 4)

    add("stem 1->32 (dwconv-as-dense)", StemConv3D(32), (*full, 1), 1)
    add("block C=32 @ full", ConvNeXtBlock3D(32), (*full, 32), 4)
    add("block C=64 @ 1/2", ConvNeXtBlock3D(64), (*half, 64), 4)
    add("block C=128 @ 1/4", ConvNeXtBlock3D(128), (*quart, 128), 2)
    add("downsample 32->64", Downsample(64), (*full, 32), 1)
    add("downsample 64->128", Downsample(128), (*half, 64), 1)
    add("upsample 2x @ 1/4->1/2", None, (*quart, 128), 1)
    add("upsample 2x @ 1/2->full", None, (*half, 64), 1)
    add("concat+fuse @ 1/2", ConcatConv3D(64), (*half, 64), 1, two_inputs=True)
    add("concat+fuse @ full", ConcatConv3D(32), (*full, 32), 1, two_inputs=True)

    class _Head(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.LayerNorm(dtype=jnp.bfloat16)(x)
            return nn.Conv(32, (1, 1, 1), dtype=jnp.bfloat16)(x)

    class _HeadFused(nn.Module):
        """The model's actual tail since kernels/lnhead.py: one Pallas
        pass for final_norm + head_conv (32 -> 32)."""

        @nn.compact
        def __call__(self, x):
            from skoots_tpu.kernels.lnhead import ln_head

            c = x.shape[-1]
            ls = self.param("scale", nn.initializers.ones, (c,))
            lb = self.param("bias", nn.initializers.zeros, (c,))
            w = self.param("kernel", nn.initializers.lecun_normal(), (c, 32))
            b = self.param("cbias", nn.initializers.zeros, (32,))
            return ln_head(x, ls, lb, w.astype(x.dtype), b.astype(x.dtype))

    add("final LN + head conv", _HeadFused(), (*full, 32), 1)
    add("micro: LN+head via XLA", _Head(), (*full, 32), 0)

    # micro-ops: pin down WHERE block time goes (the dwconv kernel's floor
    # is known: ~6.9 ms/Mvox; everything else in a block is LN + matmuls +
    # exact-erf GELU)
    class _LNOnly(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.LayerNorm(dtype=jnp.bfloat16)(x)

    class _GeluExact(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.gelu(x, approximate=False)

    class _GeluTanh(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.gelu(x, approximate=True)

    class _MLPOnly(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = nn.Dense(128, dtype=jnp.bfloat16)(x)
            return nn.Dense(32, dtype=jnp.bfloat16)(y)

    from skoots_tpu.models.unext import DWConv3D

    add("micro: dwconv C=32 @ full", DWConv3D(32), (*full, 32), 0)
    add("micro: LN C=32 @ full", _LNOnly(), (*full, 32), 0)
    add("micro: gelu(erf) 128ch @ full", _GeluExact(), (*full, 128), 0)
    add("micro: gelu(tanh) 128ch @ full", _GeluTanh(), (*full, 128), 0)
    add("micro: pw matmuls 32->128->32 @ full", _MLPOnly(), (*full, 32), 0)

    rows, total = [], 0.0
    for name, fn, params, x, count in cases:
        dt, compile_s = _timed(fn, params, x, args.iters)
        contrib = dt * count * 1e3
        total += contrib
        row = {"component": name, "ms_per_call": round(dt * 1e3, 2),
               "count_in_U": count, "ms_total": round(contrib, 2),
               "compile_s": round(compile_s, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = {"tile": list(tile),
           "sum_ms": round(total, 1),
           "sum_ms_per_mvox": round(total / vol_mvox, 2),
           "components": rows}
    os.makedirs("runs", exist_ok=True)
    with open("runs/fwd_split.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"sum_ms": out["sum_ms"],
                      "sum_ms_per_mvox": out["sum_ms_per_mvox"]}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
