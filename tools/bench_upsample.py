"""Pallas fused upsample vs XLA composition at the decoder's real shapes.

runs/fwd_split.json put the XLA separable-interleave upsample at 45.3 ms
per 256^2x96 output tile (@1/2->full) against a ~2 ms HBM roofline; the
Pallas kernel (kernels/upsample.py) should close most of that. This tool
measures both implementations at the in-network decoder shapes and writes
runs/bench_upsample.json so the dispatch decision is evidence, not hope.

Timing uses the dependent-fori_loop pattern (see tools/bench_fwd_split.py
and MEMORY tpu-v5e-kernel-lessons: naive block_until_ready through the
axon relay reports ~0).

Usage: python tools/bench_upsample.py [--iters=8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (label, input shape) — decoder upsample inputs for the bench tile
# (256^2x96) and the bigvol tile (192^2x96, the shape that OOM'd scoped
# VMEM before z-blocking).
SHAPES = [
    ("1/2->full 256t C=64", (1, 128, 128, 48, 64)),
    ("1/4->1/2 256t C=128", (1, 64, 64, 24, 128)),
    ("1/2->full 192t C=64", (1, 96, 96, 48, 64)),
    ("1/4->1/2 192t C=128", (1, 48, 48, 24, 128)),
]


def _timed(fn, x, iters):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(v):
        def body(i, carry):
            out = fn(carry)
            return (carry + jnp.zeros((), carry.dtype) *
                    out.astype(carry.dtype).ravel()[0]).astype(carry.dtype)

        r = jax.lax.fori_loop(0, iters, body, v)
        return r.astype(jnp.float32).ravel()[0]

    t0 = time.perf_counter()
    float(loop(x))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(loop(x))
    dt = (time.perf_counter() - t0) / iters
    return dt, compile_s


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--out", default="runs/bench_upsample.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from skoots_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from skoots_tpu.kernels.upsample import (
        _mxu_upsample,
        _pallas_impl,
        _pick_blocks,
        _xla_upsample,
    )

    key = jax.random.PRNGKey(0)
    rows = []
    for label, shape in SHAPES:
        x = jax.random.normal(key, shape, jnp.bfloat16)
        _, xs, ys, zs, c = shape
        blocks = _pick_blocks(xs, ys, zs, c, 2)
        out_bytes = 8 * x.size * 2
        # HBM roofline: read input + write 8x output, ~819 GB/s on v5e
        roofline_ms = (x.size * 2 + out_bytes) / 819e9 * 1e3

        t_xla, c_xla = _timed(_xla_upsample, x, args.iters)
        t_pal, c_pal = _timed(lambda v: _pallas_impl(v), x, args.iters)
        t_mxu, c_mxu = _timed(_mxu_upsample, x, args.iters)

        # value check on-device (same inputs, f32 compare)
        import numpy as np

        a = np.asarray(_pallas_impl(x), np.float32)
        b = np.asarray(_xla_upsample(x), np.float32)
        m = np.asarray(_mxu_upsample(x), np.float32)
        max_err = float(np.max(np.abs(a - b)))
        max_err_mxu = float(np.max(np.abs(m - b)))

        row = {
            "shape": list(shape),
            "label": label,
            "blocks": list(blocks) if blocks else None,
            "xla_ms": round(t_xla * 1e3, 3),
            "pallas_ms": round(t_pal * 1e3, 3),
            "mxu_ms": round(t_mxu * 1e3, 3),
            "speedup": round(t_xla / t_pal, 2),
            "speedup_mxu": round(t_xla / t_mxu, 2),
            "roofline_ms": round(roofline_ms, 3),
            "pallas_vs_roofline": round(t_pal * 1e3 / roofline_ms, 2),
            "mxu_vs_roofline": round(t_mxu * 1e3 / roofline_ms, 2),
            "compile_s": {"xla": round(c_xla, 1), "pallas": round(c_pal, 1),
                          "mxu": round(c_mxu, 1)},
            "max_abs_err": max_err,
            "max_abs_err_mxu": max_err_mxu,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"backend": jax.default_backend(), "rows": rows}, f,
                  indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
