"""CC schedule sweep at 512^3. Args: P,J pairs e.g. `64,0 64,1 16,1 6,2`.

CC_MODE=speckle (bench-like worst case) | tubes (realistic sparse).
CC_IMPL=auto|xla|pallas selects the propagate implementation.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from skoots_tpu.ops.flood_fill import make_label_components_stepped
from skoots_tpu.ops.morphology import binary_dilation, binary_dilation_2d
from skoots_tpu.utils.compile_cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    n = int(os.environ.get("CC_N", "512"))
    mode = os.environ.get("CC_MODE", "speckle")
    shape = (n, n, n)
    configs = [tuple(int(v) for v in a.split(",")) for a in sys.argv[1:]] or [
        (6, 2)
    ]

    if mode == "speckle":
        @jax.jit
        def make_mask(key):
            p = jax.random.uniform(key, shape)
            s = (p > 0.93).astype(jnp.float32)[None, ..., None]
            s = binary_dilation(s)
            s = binary_dilation_2d(binary_dilation_2d(s))
            return (s[0, ..., 0] > 0.5).astype(jnp.uint8)

        mask = make_mask(jax.random.PRNGKey(0))
    else:
        from skoots_tpu.utils.synthetic import make_tubes

        _, labels, _ = make_tubes(shape=(n, n, min(n, 64)), n_tubes=60,
                                  radius=5, seed=3, min_separation=14.0)
        m = np.zeros(shape, np.uint8)
        m[:, :, : min(n, 64)] = (labels > 0)
        mask = jnp.asarray(m)

    mask.block_until_ready()
    print("fg fraction:", round(float(mask.astype(jnp.float32).mean()), 4))

    ref = None
    for p, j in configs:
        cc = make_label_components_stepped(
            shape, rounds_per_dispatch=1 if j else 16,
            propagates_per_round=p, jumps_per_round=j,
            propagate_impl=os.environ.get("CC_IMPL", "auto"),
        )
        lab = cc(mask, max_rounds=4096 // max(p, 1))
        lab.block_until_ready()
        t0 = time.time()
        lab = cc(mask, max_rounds=4096 // max(p, 1))
        lab.block_until_ready()
        dt = time.time() - t0
        nuniq = "?"
        if os.environ.get("CC_CHECK"):
            u = np.unique(np.asarray(lab))
            nuniq = len(u) - 1
            if ref is None:
                ref = nuniq
            assert nuniq == ref, (nuniq, ref)
        print(f"P={p} J={j}: {dt:.2f}s components={nuniq}")


if __name__ == "__main__":
    main()
