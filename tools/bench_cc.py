"""CC schedule sweep at 512^3. Args: P,J[,S] triplets e.g. `64,0 16,1 8,0,1`.

P = 1-hop propagates per round, J = pointer jumps per round, S = axis-scan
rounds (segmented max scans, unbounded run reach) per round.

CC_MODE=speckle (bench-like worst case) | tubes (thin slab) | phantom3d
(512^3 straight-tube phantom rendered on device — the headline bench's
workload shape).
CC_IMPL=auto|xla|pallas selects the propagate implementation.
CC_JSON=path writes a JSON record of all rows.
"""

import json
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
    configs = []
    for a in sys.argv[1:]:
        v = tuple(int(x) for x in a.split(","))
        configs.append(v if len(v) == 3 else (*v, 0))
    configs = configs or [(6, 2, 0)]

    if mode == "speckle":
        @jax.jit
        def make_mask(key):
            p = jax.random.uniform(key, shape)
            s = (p > 0.93).astype(jnp.float32)[None, ..., None]
            s = binary_dilation(s)
            s = binary_dilation_2d(binary_dilation_2d(s))
            return (s[0, ..., 0] > 0.5).astype(jnp.uint8)

        mask = make_mask(jax.random.PRNGKey(0))
    elif mode == "phantom3d":
        from skoots_tpu.utils.synthetic import render_tubes, tube_segments

        n_t = max(6, int(48 * (n / 512) ** 3))
        p0, p1, n_placed = tube_segments(shape, n_t, radius=5.0, seed=7)
        print("tubes placed:", n_placed)
        img = jax.jit(lambda a, b: render_tubes(shape, a, b, radius=5.0))(
            p0, p1)
        mask = (img > 100.0).astype(jnp.uint8)
    else:
        from skoots_tpu.utils.synthetic import make_tubes

        _, labels, _ = make_tubes(shape=(n, n, min(n, 64)), n_tubes=60,
                                  radius=5, seed=3, min_separation=14.0)
        m = np.zeros(shape, np.uint8)
        m[:, :, : min(n, 64)] = (labels > 0)
        mask = jnp.asarray(m)

    mask.block_until_ready()
    print("fg fraction:", round(float(mask.astype(jnp.float32).mean()), 4))

    rows = []
    ref = None
    for p, j, s in configs:
        cc = make_label_components_stepped(
            # big-P jump-free rows poll convergence EVERY round — 16
            # rounds/dispatch at P=384 would run 6144 hops before the
            # first poll
            shape, rounds_per_dispatch=1 if (j or s or p >= 64) else 16,
            propagates_per_round=p, jumps_per_round=j, scans_per_round=s,
            propagate_impl=os.environ.get("CC_IMPL", "auto"),
        )
        budget = max(4096 // max(p, 1), 8) if not s else 256
        lab = cc(mask, max_rounds=budget)
        lab.block_until_ready()
        t0 = time.time()
        lab = cc(mask, max_rounds=budget)
        lab.block_until_ready()
        dt = time.time() - t0
        nuniq = "?"
        if os.environ.get("CC_CHECK"):
            u = np.unique(np.asarray(lab))
            nuniq = len(u) - 1
            if ref is None:
                ref = nuniq
            assert nuniq == ref, (nuniq, ref)
        rows.append({"P": p, "J": j, "S": s, "seconds": round(dt, 3),
                     "rounds": cc.last_rounds,
                     "converged": cc.last_converged,
                     "components": nuniq})
        print(f"P={p} J={j} S={s}: {dt:.2f}s rounds={cc.last_rounds} "
              f"converged={cc.last_converged} components={nuniq}")
    out = os.environ.get("CC_JSON")
    if out:
        with open(out, "w") as f:
            json.dump({"mode": mode, "shape": list(shape),
                       "impl": os.environ.get("CC_IMPL", "auto"),
                       "rows": rows}, f, indent=1)


if __name__ == "__main__":
    main()
