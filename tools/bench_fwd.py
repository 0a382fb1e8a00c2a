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

        @jax.jit
        def fwd(p, v):
            out = model.apply(p, v, deterministic=True)
            # feed the output back as the next input's first voxel so repeat
            # calls can't be elided/overlapped trivially
            return out

        t0 = time.perf_counter()
        fwd(params, x).block_until_ready()
        compile_s = time.perf_counter() - t0
        n = 5
        t0 = time.perf_counter()
        for _ in range(n):
            fwd(params, x).block_until_ready()
        dt = (time.perf_counter() - t0) / n
        mvox = tile[0] * tile[1] * tile[2] / 1e6
        print(
            f"{impl} tile={tile}: {dt*1e3:.1f} ms ({dt*1e3/mvox:.2f} ms/Mvox), "
            f"compile {compile_s:.1f} s"
        )


if __name__ == "__main__":
    main()
