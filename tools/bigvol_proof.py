"""1024^3 out-of-core inference proof (VERDICT r2 item 1 "done" criterion).

Runs the host-streaming engine end-to-end on a 1024^3 (or --shape) volume
that never exists in RAM or HBM as a whole:

  * input volume synthesized slab-by-slab into a disk memmap
  * phase 1/2/3 through skoots_tpu.infer.run_inference(out_of_core=True)
  * records wall time, per-phase split, peak host RSS, peak tracemalloc
    delta, and (when the backend exposes it) device memory stats

The matching reference ceiling is host RAM (lib/eval.py:245-284 indexes a
host-resident labeled tensor); here both host RSS and device residency are
O(tile). Result written to runs/bigvol/result.json.

Usage: python tools/bigvol_proof.py [--shape 1024,1024,1024] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthesize(path: str, shape, seed: int = 0, slab: int = 64) -> None:
    """Blobby foreground phantom, written slab-wise (never whole in RAM)."""
    from skoots_tpu.utils.io import open_outofcore

    rng = np.random.default_rng(seed)
    img = open_outofcore(path, shape, "uint8")
    # coarse random field -> blocky blobs when upsampled 16x; cheap enough
    # to generate at 1024^3 on one core
    cshape = tuple(max(s // 16, 1) for s in shape)
    coarse = rng.random(cshape, dtype=np.float32)
    for x0 in range(0, shape[0], slab):
        x1 = min(x0 + slab, shape[0])
        cx0, cx1 = x0 // 16, (x1 + 15) // 16
        blk = coarse[cx0:cx1]
        up = np.repeat(np.repeat(np.repeat(blk, 16, 0), 16, 1), 16, 2)
        up = up[x0 - cx0 * 16 : x0 - cx0 * 16 + (x1 - x0), : shape[1], : shape[2]]
        noise = rng.integers(0, 40, up.shape, dtype=np.uint8)
        img[x0:x1] = np.where(up > 0.75, 200, 30).astype(np.uint8) + noise
    img.flush()
    del img


class _AnonRssSampler:
    """Peak ANONYMOUS RSS, sampled from /proc/self/status.

    ``ru_maxrss`` counts resident file-backed memmap pages too — page
    cache the kernel reclaims under pressure — so on a memmap-streaming
    workload it reports ~volume-sized numbers that say nothing about real
    allocations (the first 1024^3 run: ru_maxrss 99 GB, of which 17 GB
    was reclaimable cache of the six output memmaps)."""

    def __init__(self, interval_s: float = 1.0):
        import threading

        self.peak_kb = 0
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, args=(interval_s,),
                                   daemon=True)

    @staticmethod
    def _read_kb() -> int:
        try:
            with open("/proc/self/status") as f:
                for line in f:
                    if line.startswith("RssAnon:"):
                        return int(line.split()[1])
        except OSError:
            pass
        return 0

    def _run(self, interval_s):
        while not self._stop.is_set():
            self.peak_kb = max(self.peak_kb, self._read_kb())
            self._stop.wait(interval_s)

    def __enter__(self):
        self._t.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._t.join(timeout=5)
        self.peak_kb = max(self.peak_kb, self._read_kb())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="1024,1024,1024")
    ap.add_argument("--outdir", default="runs/bigvol")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--crop", default="192,192,96")
    ap.add_argument("--overlap", default="8,8,4")
    ap.add_argument("--assign-crop", default="256,256,64")
    ap.add_argument("--ckpt", default=None,
                    help="use this trained checkpoint instead of a "
                         "random-init model (realistic, locally-converging "
                         "embedding walks -> phase 3 stays on the "
                         "crop-gather fast path)")
    ap.add_argument("--phantom", choices=("blocks", "tubes"),
                    default="blocks",
                    help="'tubes' rasterizes bbox-local tube instances "
                         "(in-distribution for a tube-trained --ckpt)")
    ap.add_argument("--n-tubes", type=int, default=160)
    ap.add_argument("--engine", default=None,
                    help="engine_impl override (e.g. 'device-thrifty' runs "
                         "the volume fully device-resident instead of "
                         "host-streaming; out_of_core is then NOT pinned)")
    ap.add_argument("--tag", default=None,
                    help="write result_<tag>.json instead of result.json")
    args = ap.parse_args()
    shape = tuple(int(v) for v in args.shape.split(","))

    import logging

    logging.basicConfig(
        level=logging.INFO,
        format="[%(asctime)s] %(name)s [%(levelname)s]: %(message)s",
    )

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from skoots_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    os.makedirs(args.outdir, exist_ok=True)
    img_path = os.path.join(
        args.outdir, "bigvol.npy" if args.phantom == "blocks"
        else "bigvol_tubes.npy"
    )
    t0 = time.time()
    if not os.path.exists(img_path) or tuple(
        np.load(img_path, mmap_mode="r").shape
    ) != shape:
        if args.phantom == "blocks":
            synthesize(img_path, shape)
        else:
            # bbox-local tube rasterizer (O(sum tube bboxes), not
            # O(volume * path points)); labels are synthesis bookkeeping
            # only — freed before the measured run
            from skoots_tpu.utils.io import open_outofcore
            from tools.seam_bench_agreement import make_tubes_big

            img, labels, n_placed = make_tubes_big(
                shape, args.n_tubes, radius=5.0, seed=11,
                min_separation=14.0,
            )
            del labels
            out = open_outofcore(img_path, shape, "uint8")
            for x0 in range(0, shape[0], 64):
                out[x0 : x0 + 64] = img[x0 : x0 + 64]
            out.flush()
            del out, img
            print(f"tubes phantom: {n_placed} placed", flush=True)
    synth_s = time.time() - t0

    if args.ckpt:
        ckpt = args.ckpt
    else:
        # flagship default-config model, random init (the proof is about
        # the pipeline's memory/throughput envelope, not accuracy)
        from skoots_tpu.config import get_cfg_defaults
        from skoots_tpu.models import init_model
        from skoots_tpu.train.checkpoint import save_checkpoint

        ckpt = os.path.join(args.outdir, "model.skoots")
        cfg = get_cfg_defaults()
        model, params = init_model(cfg, jax.random.PRNGKey(0),
                                   spatial=(64, 64, 16))
        save_checkpoint(ckpt, cfg, params, dataset_mean=128.0,
                        dataset_std=64.0)

    import tracemalloc

    from skoots_tpu.infer import run_inference

    # SKOOTS_NO_TRACEMALLOC skips allocation tracing here too — the traced
    # control run measured its tax at ~3x on memmap-heavy host code
    trace = os.environ.get("SKOOTS_NO_TRACEMALLOC", "") in ("", "0")
    baseline = 0
    if trace:
        tracemalloc.start()
        baseline = tracemalloc.get_traced_memory()[0]
    t0 = time.time()
    with _AnonRssSampler() as rss:
        mask = run_inference(
            img_path,
            ckpt,
            crop_size=tuple(int(v) for v in args.crop.split(",")),
            overlap=tuple(int(v) for v in args.overlap.split(",")),
            assign_crop_size=tuple(
                int(v) for v in args.assign_crop.split(",")
            ),
            assign_overlap=(8, 8, 4),
            out_of_core=None if args.engine else True,
            engine_impl=args.engine or "host",
            output_path=os.path.join(args.outdir, "instance.npy"),
        )
    wall = time.time() - t0
    tm_peak = baseline
    if trace:
        _, tm_peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()

    n_inst = 0
    step = max(shape[0] // 16, 1)
    for x0 in range(0, shape[0], step):
        n_inst = max(n_inst, int(np.asarray(mask[x0 : x0 + step]).max()))

    dev_stats = {}
    try:
        ms = jax.devices()[0].memory_stats() or {}
        dev_stats = {k: int(v) for k, v in ms.items()
                     if "bytes" in k and "peak" in k or k == "bytes_in_use"}
    except Exception:
        pass

    vox = shape[0] * shape[1] * shape[2]
    result = {
        "shape": list(shape),
        "voxels": vox,
        "wall_s": round(wall, 1),
        "vox_per_s": round(vox / wall, 1),
        "synth_s": round(synth_s, 1),
        "n_instances": n_inst,
        "peak_anon_rss_mb": round(rss.peak_kb / 1024, 1),
        "peak_rss_incl_page_cache_mb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1
        ),
        "tracemalloc_delta_mb": (round((tm_peak - baseline) / 1e6, 1)
                                 if trace else None),
        "device_memory_stats": dev_stats,
        "out_of_core": True,
        "backend": jax.default_backend(),
        "phantom": args.phantom,
        "checkpoint": ckpt,
    }
    from skoots_tpu.infer import engine as _eng

    result["phases"] = _eng.last_stats
    result["engine"] = args.engine or "host"
    name = f"result_{args.tag}.json" if args.tag else "result.json"
    with open(os.path.join(args.outdir, name), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
