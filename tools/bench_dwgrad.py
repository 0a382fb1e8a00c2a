"""Microbenchmark: depthwise-conv BACKWARD variants on the real TPU chip.

The training step's conv backward has two halves:
- dgrad (dx): tap-flipped Pallas forward (kernels/dwconv.py::dwconv3d_dgrad)
  vs XLA's conv-transpose gradient;
- wgrad (dw): single-pass Pallas tap reduction (dwconv3d_wgrad_pallas) vs
  XLA's grouped-conv weight gradient.

Times each inside one jitted fori_loop with dependency feedback (the axon
relay has a ~33 ms dispatch floor). Shapes = the training-bench geometries
(tools/bench_train.py) at the flagship C=32 full-res block.

Writes runs/bench_dwgrad.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 7


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from skoots_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from skoots_tpu.kernels.dwconv import (
        dwconv3d_dgrad,
        dwconv3d_pallas_v4,
        dwconv3d_wgrad_pallas,
        dwconv3d_wgrad_pallas_v2,
    )

    def xla_fwd(x, w):
        c = x.shape[-1]
        return jax.lax.conv_general_dilated(
            x, w.reshape(K, K, K, 1, c).astype(x.dtype),
            window_strides=(1, 1, 1),
            padding="SAME", dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
            feature_group_count=c,
        )

    rows = []
    # geometries = the two training-bench cases (tools/bench_train.py): the
    # campaign crop and the reference training envelope (engine.py:107-115)
    for label, shape in (
        ("campaign 96^2x32 B2", (2, 96, 96, 32, 32)),
        ("reference-envelope 304^2x24 B1", (1, 304, 304, 24, 32)),
    ):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        g = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((K, K, K, shape[-1])),
                        jnp.float32)

        def timed(fn, out_like_x: bool, n=8):
            """fori_loop with dependency feedback through the iterate.

            x and g enter as ARGUMENTS, never closure constants: a captured
            device array is inlined into the serialized HLO, and at
            multi-hundred-MB operand sizes the relay's compile endpoint
            rejects the request body (HTTP 413, queue-o failure)."""
            if out_like_x:
                @jax.jit
                def loop(xx):
                    def body(i, v):
                        return fn(v).astype(v.dtype)
                    return jax.lax.fori_loop(0, n, body, xx)

                args = (x,)
            else:
                @jax.jit
                def loop(xx, gg):
                    def body(i, acc):
                        # feed a scalar back through the operand to chain
                        return fn(xx, gg + acc[0, 0, 0].astype(gg.dtype)
                                  ).astype(jnp.float32)
                    return jax.lax.fori_loop(
                        0, n, body,
                        jnp.zeros((K, K, K, shape[-1]), jnp.float32),
                    )

                args = (x, g)

            jax.block_until_ready(loop(*args))  # compile
            t0 = time.perf_counter()
            jax.block_until_ready(loop(*args))
            return (time.perf_counter() - t0) / n

        mvox = float(np.prod(shape[:4])) / 1e6

        try:
            t_fwd_pallas = timed(lambda v: dwconv3d_pallas_v4(v, w, None), True)
            t_dgrad_pallas = timed(lambda v: dwconv3d_dgrad(v, w), True)
            t_dgrad_xla = timed(
                lambda v: jax.vjp(lambda xx: xla_fwd(xx, w), v)[1](v)[0],
                True,
            )

            t_wgrad_pallas = timed(
                lambda xx, v: dwconv3d_wgrad_pallas(xx, v, K), False)
            t_wgrad_pallas_v2 = timed(
                lambda xx, v: dwconv3d_wgrad_pallas_v2(xx, v, K), False)
            t_wgrad_xla = timed(
                lambda xx, v: jax.vjp(lambda ww: xla_fwd(xx, ww), w)[1](v)[0],
                False,
            )
        except Exception as e:  # record, keep the other geometries' rows
            rows.append({"case": label, "shape": list(shape),
                         "error": f"{type(e).__name__}: {e}"[:300]})
            print(json.dumps(rows[-1]), flush=True)
            continue

        rows.append({
            "case": label, "shape": list(shape), "mvox": round(mvox, 3),
            "fwd_pallas_ms": round(t_fwd_pallas * 1e3, 2),
            "dgrad_pallas_ms": round(t_dgrad_pallas * 1e3, 2),
            "dgrad_xla_ms": round(t_dgrad_xla * 1e3, 2),
            "wgrad_pallas_ms": round(t_wgrad_pallas * 1e3, 2),
            "wgrad_pallas_v2_ms": round(t_wgrad_pallas_v2 * 1e3, 2),
            "wgrad_xla_ms": round(t_wgrad_xla * 1e3, 2),
        })
        print(json.dumps(rows[-1]), flush=True)

    out = {"backend": jax.default_backend(), "rows": rows}
    os.makedirs("runs", exist_ok=True)
    with open("runs/bench_dwgrad.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote runs/bench_dwgrad.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
