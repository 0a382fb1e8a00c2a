"""Host-streaming (out-of-core) inference throughput forensics.

The device pipeline segments 512^3 at ~6.4 Mvox/s (runs/bench_r04j.json) but
the host-streaming engine — the path every out-of-core volume (>HBM) and
every real `skoots --image volume.tif` invocation takes — measured ~40x
slower at the same scale (runs/seam_bench_agreement.json: 777 s; bigvol
1024^3: 0.36 Mvox/s). This tool localizes the gap:

  1. raw tunnel/PCIe bandwidth probe: H2D + D2H of a 256 MB array, and the
     round-trip latency of a 1 KB dispatch (per-tile overhead floor)
  2. a full out-of-core run_inference on a tube phantom with the
     per-phase / per-stage split (engine.last_stats, commit r04-o)
     recorded both tracemalloc-on and -off

Writes runs/bench_hoststream.json. Chip job. Reference mechanism being
benchmarked: /root/reference/skoots/lib/eval.py:126-284 (three host-driven
tiled phases against zarr buffers).

Usage: python tools/bench_hoststream.py [--ckpt runs/accuracy/touching/models]
       [--shape 512,512,512] [--batch 1] [--skip-traced]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bandwidth_probe() -> dict:
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    res = {"device": str(dev)}

    big = np.empty(256 * 2**20, np.uint8)  # 256 MB
    # H2D: device_put + block
    t0 = time.time()
    d = jax.device_put(big, dev)
    d.block_until_ready()
    res["h2d_256mb_s"] = round(time.time() - t0, 3)
    res["h2d_gbps"] = round(big.nbytes / (time.time() - t0) / 1e9, 2)
    # D2H
    t0 = time.time()
    _ = np.asarray(d)
    res["d2h_256mb_s"] = round(time.time() - t0, 3)
    res["d2h_gbps"] = round(big.nbytes / (time.time() - t0) / 1e9, 2)
    del d, big

    # dispatch round-trip latency: tiny compiled fn, host sync each call
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((256,), jnp.float32)
    f(x).block_until_ready()  # compile
    t0 = time.time()
    n = 50
    for _ in range(n):
        x = f(x)
        x.block_until_ready()
    res["dispatch_roundtrip_ms"] = round((time.time() - t0) / n * 1e3, 3)
    return res


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="runs/accuracy/touching/models")
    ap.add_argument("--shape", default="512,512,512")
    ap.add_argument("--n-tubes", type=int, default=48)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--out", default="runs/bench_hoststream.json")
    ap.add_argument("--skip-traced", action="store_true",
                    help="skip the tracemalloc-on control run")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    ckpt = args.ckpt
    if os.path.isdir(ckpt):
        cands = sorted(glob.glob(os.path.join(ckpt, "*.skoots")))
        assert cands, f"no checkpoint under {ckpt}"
        ckpt = cands[-1]

    shape = tuple(int(v) for v in args.shape.split(","))
    vox = float(np.prod(shape))
    work = os.path.join("runs", "hoststream")
    os.makedirs(work, exist_ok=True)
    vol_path = os.path.join(work, "vol.tif")

    from tools.seam_bench_agreement import make_tubes_big

    from skoots_tpu.infer import engine as eng
    from skoots_tpu.infer import run_inference
    from skoots_tpu.utils.io import imsave

    out: dict = {"shape": list(shape), "checkpoint": ckpt,
                 "batch": args.batch}

    out["bandwidth"] = bandwidth_probe()
    print(json.dumps(out["bandwidth"]), flush=True)

    t0 = time.time()
    img, gt, n_placed = make_tubes_big(shape, args.n_tubes)
    imsave(vol_path, img)
    out["synth_s"] = round(time.time() - t0, 1)
    del img, gt
    print(f"phantom: {n_placed} tubes in {out['synth_s']:.0f}s", flush=True)

    geom = dict(crop_size=(256, 256, 96), overlap=(0, 0, 0),
                assign_crop_size=(256, 256, 96), assign_overlap=(0, 0, 0))

    # first run pays XLA compiles (cold); the warm pairs then isolate
    # (a) wire_mode recompute-vs-store and (b) the tracemalloc tax,
    # each at equal compile state
    runs = [("recompute_cold", "1", "recompute"),
            ("recompute", "1", "recompute"),
            ("store", "1", "store")]
    if not args.skip_traced:
        runs.append(("traced", "0", "recompute"))
    for name, notrace, wire in runs:
        os.environ["SKOOTS_NO_TRACEMALLOC"] = notrace
        t0 = time.time()
        run_inference(vol_path, ckpt, out_of_core=True, batch=args.batch,
                      embed_iterations=10, wire_mode=wire, **geom)
        wall = time.time() - t0
        out[name] = {
            "wall_s": round(wall, 1),
            "vox_per_s": round(vox / max(eng.last_stats.get("e2e_s", wall),
                                         1e-9)),
            "stats": eng.last_stats,
        }
        print(json.dumps({name: out[name]}), flush=True)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, default=str)
    print(json.dumps(out, default=str), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
