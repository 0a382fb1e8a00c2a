"""Crossover bench: MXU matmul bake vs the Pallas running-argmin bake.

VERDICT r2 item 7: measure both bake implementations on the chip at training
shapes (96x96x32 and 192x192x96 crops, P up to ~20k points) and wire the
dispatch in ops/skeleton.py to the measured crossover (or retract the
docstring claim). The reference's analogue is its triton/torch dispatch
(/root/reference/skoots/lib/skeleton.py:494-507).

Usage: python tools/bench_bake.py [p_values...]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from skoots_tpu.kernels.bake import bake_skeleton_pallas
from skoots_tpu.ops.skeleton import PackedSkeletons, bake_skeleton

SHAPES = [(96, 96, 32), (192, 192, 96)]
P_VALUES = [512, 2048, 8192, 20480]
ANISO = (1.0, 1.0, 9.0)  # the (60,60,12)-regime z-weighting


def timeit(fn, masks, n=4):
    @jax.jit
    def loop(m):
        def body(i, carry):
            baked, dist = fn(carry)
            # feedback: next iteration's mask depends on this one's output
            return carry + (dist[0, 0, 0] * 0).astype(carry.dtype)

        return jnp.float32(jax.lax.fori_loop(0, n, body, m)[0, 0, 0])

    t0 = time.perf_counter()
    float(loop(masks))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(loop(masks))
    return (time.perf_counter() - t0) / n, compile_s


def make_inputs(shape, p, n_inst=24, seed=0):
    rng = np.random.default_rng(seed)
    x, y, z = shape
    # blocky instance mask: voronoi of n_inst sites (id 0 kept for ~bg)
    sites = rng.uniform(0, 1, (n_inst, 3)) * np.array([x, y, z])
    gx, gy, gz = np.meshgrid(np.arange(x), np.arange(y), np.arange(z),
                             indexing="ij")
    coords = np.stack([gx, gy, gz], -1).reshape(-1, 3)
    d = ((coords[:, None, :] - sites[None]) ** 2).sum(-1)
    masks = (d.argmin(1) + 1).astype(np.int32).reshape(shape)
    masks[masks > n_inst] = 0
    pts = rng.uniform(0, 1, (p, 3)).astype(np.float32) * np.array(
        [x, y, z], np.float32
    )
    pids = rng.integers(1, n_inst + 1, (p,)).astype(np.int32)
    return jnp.asarray(masks), jnp.asarray(pts), jnp.asarray(pids)


def main():
    p_values = [int(v) for v in sys.argv[1:]] or P_VALUES
    for shape in SHAPES:
        mvox = shape[0] * shape[1] * shape[2] / 1e6
        for p in p_values:
            masks, pts, pids = make_inputs(shape, p)
            packed = PackedSkeletons(pts, pids)

            def mxu(m):
                return bake_skeleton(m, packed, ANISO, average=False,
                                     return_distance=True)

            def pallas(m):
                return bake_skeleton_pallas(m, pts, pids, ANISO)

            row = [f"shape={shape} P={p}"]
            for name, fn in [("mxu", mxu), ("pallas", pallas)]:
                try:
                    dt, comp = timeit(fn, masks)
                    row.append(f"{name} {dt*1e3:8.1f} ms "
                               f"({dt*1e3/mvox:7.2f} ms/Mvox, compile {comp:.0f}s)")
                except Exception as e:
                    row.append(f"{name} FAILED {type(e).__name__}: {e}")
                    print("  ", e, file=sys.stderr)
            print(" | ".join(row), flush=True)


if __name__ == "__main__":
    main()
