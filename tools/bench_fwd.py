"""Time the full model forward (the inference sweep hot path) on the chip.

Usage: python tools/bench_fwd.py [impl ...] [--tile=X,Y,Z]
"""

import sys
import time

import jax
import jax.numpy as jnp

from skoots_tpu.config import get_cfg_defaults
from skoots_tpu.models.registry import cfg_to_model


def main():
    tile = (192, 192, 96)
    impls = []
    for a in sys.argv[1:]:
        if a.startswith("--tile="):
            tile = tuple(int(v) for v in a.split("=")[1].split(","))
        else:
            impls.append(a)
    impls = impls or ["xla", "pallas"]

    for impl in impls:
        cfg = get_cfg_defaults()
        cfg.MODEL.DWCONV_IMPL = impl
        model = cfg_to_model(cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, *tile, 1), jnp.bfloat16)
        params = model.init({"params": jax.random.PRNGKey(0)}, x[:, :64, :64, :32])

        n = 4

        @jax.jit
        def loop(p, v):
            def body(i, carry):
                out = model.apply(p, carry, deterministic=True)
                # dependency feedback so iterations can't be elided
                return (carry + out[..., :1] * 0).astype(carry.dtype)

            r = jax.lax.fori_loop(0, n, body, v)
            return r.astype(jnp.float32).mean()

        t0 = time.perf_counter()
        float(loop(params, x))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(loop(params, x))
        dt = (time.perf_counter() - t0) / n
        mvox = tile[0] * tile[1] * tile[2] / 1e6
        print(
            f"{impl} tile={tile}: {dt*1e3:.1f} ms ({dt*1e3/mvox:.2f} ms/Mvox), "
            f"compile {compile_s:.1f} s"
        )


if __name__ == "__main__":
    main()
