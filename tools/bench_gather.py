"""Primitive costs for a sparse (point-cloud) CC at 512^3 scale.

The device pipeline's CC is propagate-only (jumps measured ~165x a
propagate pass in round 2, dense-gather cost): 32 round-dispatches x 128
propagates = 5.5 s warm at 512^3 (runs/bench_r04e.json). A sparse CC
operates on the ~1-3% foreground voxels instead: nonzero(size=N) ->
sorted linear keys -> 13-offset neighbor matching via searchsorted ->
pointer-jump union-find on N elements. Whether that wins is decided by
the measured cost of N-sized sort / gather / scatter-min / searchsorted
on v5e — which this tool records (runs/bench_gather.json).

Timing: dependent-fori_loop (tools/bench_fwd_split.py pattern).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(fn, x, iters=4):
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
    return (time.perf_counter() - t0) / iters, compile_s


def main() -> int:
    import jax
    import jax.numpy as jnp

    from skoots_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    key = jax.random.PRNGKey(0)
    rows = []

    def rec(name, fn, x, iters=4):
        dt, cs = _timed(fn, x, iters)
        row = {"case": name, "ms": round(dt * 1e3, 2),
               "compile_s": round(cs, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    for n in (1 << 21, 1 << 22):  # 2M, 4M
        label = f"N={n >> 20}M"
        idx = jax.random.randint(key, (n,), 0, 512 ** 3, jnp.int32)
        vals = jax.random.randint(key, (n,), 0, n, jnp.int32)

        rec(f"sort {label}", lambda v: jnp.sort(v), idx)
        rec(f"gather v[v] {label}",
            lambda v: v[jnp.clip(v, 0, n - 1)], vals)
        rec(f"scatter-min {label}",
            lambda v: jnp.zeros_like(v).at[jnp.clip(v, 0, n - 1)].min(v),
            vals)
        srt = jnp.sort(idx)
        rec(f"searchsorted {label}",
            lambda v: jnp.searchsorted(v, v + 1).astype(jnp.int32), srt)

    # dense baselines at 512^3 int32 for scale
    dense = jax.random.randint(key, (256, 512, 512), 0, 2, jnp.int32)
    rec("dense roll+min 512^3/2 (1 propagate-ish pass)",
        lambda v: jnp.minimum(v, jnp.roll(v, 1, 0)), dense, iters=2)

    with open("runs/bench_gather.json", "w") as f:
        json.dump({"backend": jax.default_backend(), "rows": rows}, f,
                  indent=1)
    print("wrote runs/bench_gather.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
