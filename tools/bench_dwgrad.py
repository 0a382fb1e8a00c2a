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
    for label, shape in (
        ("campaign 96^2x32 B2", (2, 96, 96, 32, 32)),
        ("fullres 256^2x96 B1", (1, 256, 256, 96, 32)),
    ):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        g = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((K, K, K, shape[-1])),
                        jnp.float32)

        def timed(fn, out_like_x: bool, n=8):
            """fori_loop with dependency feedback through the iterate."""
            if out_like_x:
                @jax.jit
                def loop(v):
                    def body(i, v):
                        return fn(v).astype(v.dtype)
                    return jax.lax.fori_loop(0, n, body, v)
            else:
                @jax.jit
                def loop(v):
                    def body(i, acc):
                        # feed a scalar back through the operand to chain
                        return fn(g + acc[0, 0, 0].astype(g.dtype)).astype(
                            jnp.float32
                        )
                    return jax.lax.fori_loop(
                        0, n, body,
                        jnp.zeros((K, K, K, shape[-1]), jnp.float32),
                    )

            jax.block_until_ready(loop(x))  # compile
            t0 = time.perf_counter()
            jax.block_until_ready(loop(x))
            return (time.perf_counter() - t0) / n

        mvox = float(np.prod(shape[:4])) / 1e6

        t_fwd_pallas = timed(lambda v: dwconv3d_pallas_v4(v, w, None), True)
        t_dgrad_pallas = timed(lambda v: dwconv3d_dgrad(v, w), True)
        t_dgrad_xla = timed(
            lambda v: jax.vjp(lambda xx: xla_fwd(xx, w), v)[1](v)[0],
            True,
        )

        def wgrad_pallas(v):
            return dwconv3d_wgrad_pallas(x, v, K)

        def wgrad_pallas_v2(v):
            return dwconv3d_wgrad_pallas_v2(x, v, K)

        def wgrad_xla(v):
            return jax.vjp(lambda ww: xla_fwd(x, ww), w)[1](v)[0]

        t_wgrad_pallas = timed(wgrad_pallas, False)
        t_wgrad_pallas_v2 = timed(wgrad_pallas_v2, False)
        t_wgrad_xla = timed(wgrad_xla, False)

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
