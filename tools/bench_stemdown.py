"""A/B the stem and downsample implementations at the bench-tile shapes.

Candidates (runs/fwd_split.json motivates both):
- stem 1->32 7^3: broadcast-depthwise Pallas (44.7 ms, VPU-bound) vs
  im2col + MXU dot (est. ~12 ms: pays k^3 HBM traffic on the 1-channel
  input, runs the taps on the MXU) vs the raw XLA conv.
- downsample LN+2^3/s2 conv: XLA conv lowering (18.6 ms incl. LN) vs
  non-overlapping reshape + [V/8, 8C] x [8C, 2C] MXU matmul.

Writes runs/bench_stemdown.json; the winners become the 'auto' dispatch
in models/unext.py (cited there).

Timing: dependent-fori_loop (see tools/bench_fwd_split.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(fn, params, x, iters=8):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(p, v):
        def body(i, carry):
            out = fn(p, carry)
            return (carry + jnp.zeros((), carry.dtype) *
                    out.astype(carry.dtype).ravel()[0]).astype(carry.dtype)

        r = jax.lax.fori_loop(0, iters, body, v)
        return r.astype(jnp.float32).ravel()[0]

    t0 = time.perf_counter()
    float(loop(params, x))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(loop(params, x))
    return (time.perf_counter() - t0) / iters, compile_s


def main() -> int:
    import jax
    import jax.numpy as jnp

    from skoots_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from skoots_tpu.models.unext import Downsample, StemConv3D

    key = jax.random.PRNGKey(0)
    rows = []

    # --- stem at the 256^2x96 bench tile ---
    x1 = jax.random.normal(key, (1, 256, 256, 96, 1), jnp.bfloat16)
    stem_ref = None
    for impl in ("pallas", "im2col", "xla"):
        m = StemConv3D(32, kernel_size=7, dtype=jnp.bfloat16, impl=impl)
        p = m.init(jax.random.PRNGKey(1), x1[:, :16, :16, :8])
        dt, cs = _timed(lambda p, v: m.apply(p, v), p, x1)
        import numpy as np

        out = np.asarray(
            m.apply(p, x1[:, :32, :32, :16]), np.float32
        )
        if stem_ref is None:
            stem_ref = out
            err = 0.0
        else:
            err = float(np.max(np.abs(out - stem_ref)))
        row = {"op": "stem", "impl": impl, "ms": round(dt * 1e3, 2),
               "compile_s": round(cs, 1), "max_abs_err_vs_first": err}
        rows.append(row)
        print(json.dumps(row), flush=True)

    # --- downsample 32->64 at full res ---
    x2 = jax.random.normal(key, (1, 256, 256, 96, 32), jnp.bfloat16)
    ds_ref = None
    for impl in ("xla", "matmul"):
        m = Downsample(64, dtype=jnp.bfloat16, impl=impl)
        p = m.init(jax.random.PRNGKey(2), x2[:, :16, :16, :8])
        dt, cs = _timed(lambda p, v: m.apply(p, v), p, x2)
        import numpy as np

        out = np.asarray(m.apply(p, x2[:, :32, :32, :16]), np.float32)
        if ds_ref is None:
            ds_ref = out
            err = 0.0
        else:
            err = float(np.max(np.abs(out - ds_ref)))
        row = {"op": "downsample", "impl": impl, "ms": round(dt * 1e3, 2),
               "compile_s": round(cs, 1), "max_abs_err_vs_first": err}
        rows.append(row)
        print(json.dumps(row), flush=True)

    with open("runs/bench_stemdown.json", "w") as f:
        json.dump({"backend": jax.default_backend(), "rows": rows}, f,
                  indent=1)
    print("wrote runs/bench_stemdown.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
