"""Instance agreement between the two bench sweep geometries at 512^3.

VERDICT r3 item 10: the zero-overlap bench geometry (256x256x96 tiles,
1.125x redundancy) was promoted to the headline bench on the strength of a
single training-crop-scale seam probe (tools/seam_probe.py). This tool
closes the loop ON THE BENCH VOLUME SCALE: segment the SAME 512^3 tube
phantom with a trained checkpoint under

  A. the round-2 overlap geometry   crop 192x192x96, overlap (8,8,4)
  B. the round-3 zero-overlap grid  crop 256x256x96, overlap (0,0,0)

and record instance-level agreement between the two outputs (F1 treating A
as reference) plus each geometry's score against the generator's ground
truth. Tube phantoms are placed bbox-locally (utils.synthetic.make_tubes
rasterizes against the whole voxel grid per path point — O(vox * pts) is
fine at 128^3, hopeless at 512^3 on one core).

Usage: python tools/seam_bench_agreement.py [--ckpt PATH] [--shape 512,512,512]
Writes runs/seam_bench_agreement.json. Chip job (~2 sweeps of the volume).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_tubes_big(shape, n_tubes: int, radius: float = 5.0, seed: int = 7,
                   min_separation: float = 14.0):
    """Straight-ish random tubes rasterized only inside their bounding
    boxes: O(sum of tube bbox volumes), not O(volume * path points).

    Returns (image u8, labels int32). Separation is enforced by rejecting
    candidate segments whose centerline comes within ``min_separation`` of
    an accepted one (coarse 8-voxel sampling of both polylines).
    """
    rng = np.random.default_rng(seed)
    shape = np.asarray(shape)
    labels = np.zeros(tuple(shape), np.int32)
    kept = []  # sampled centerline points per tube, [M,3]
    tid = 0
    attempts = 0
    while tid < n_tubes and attempts < n_tubes * 40:
        attempts += 1
        p0 = rng.uniform(radius + 2, shape - radius - 2)
        direction = rng.normal(size=3)
        direction[2] *= 0.3  # mostly in-plane, like the training phantoms
        direction /= np.linalg.norm(direction)
        length = rng.uniform(0.35, 0.7) * float(shape.max())
        p1 = p0 + direction * length
        p1 = np.clip(p1, radius + 2, shape - radius - 2)
        if np.linalg.norm(p1 - p0) < 8 * radius:
            continue
        n_samp = max(int(np.linalg.norm(p1 - p0) / 8), 2)
        t = np.linspace(0, 1, n_samp)[:, None]
        line = p0 * (1 - t) + p1 * t
        ok = True
        for prev in kept:
            d = np.linalg.norm(line[:, None, :] - prev[None, :, :], axis=-1)
            if d.min() < min_separation:
                ok = False
                break
        if not ok:
            continue
        tid += 1
        kept.append(line)
        # rasterize inside the tube's padded bbox only
        lo = np.maximum(np.floor(line.min(0) - radius - 1).astype(int), 0)
        hi = np.minimum(np.ceil(line.max(0) + radius + 2).astype(int), shape)
        gx, gy, gz = np.meshgrid(*[np.arange(l, h) for l, h in zip(lo, hi)],
                                 indexing="ij")
        pts = np.stack([gx, gy, gz], -1).astype(np.float32)  # [bx,by,bz,3]
        # distance from each bbox voxel to the segment p0-p1
        ab = (p1 - p0).astype(np.float32)
        ap = pts - p0.astype(np.float32)
        tt = np.clip((ap @ ab) / float(ab @ ab), 0.0, 1.0)
        closest = p0.astype(np.float32) + tt[..., None] * ab
        dist = np.linalg.norm(pts - closest, axis=-1)
        blk = labels[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]]
        sel = (dist <= radius) & (blk == 0)
        blk[sel] = tid
    img = np.where(labels > 0, 200, 30).astype(np.int16)
    img = img + rng.integers(-20, 20, labels.shape, dtype=np.int16)
    return np.clip(img, 0, 255).astype(np.uint8), labels, tid


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="runs/accuracy/touching/models")
    ap.add_argument("--shape", default="512,512,512")
    ap.add_argument("--n-tubes", type=int, default=48)
    ap.add_argument("--out", default="runs/seam_bench_agreement.json")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    ckpt = args.ckpt
    if os.path.isdir(ckpt):
        import glob

        cands = sorted(glob.glob(os.path.join(ckpt, "*.skoots")))
        assert cands, f"no checkpoint under {ckpt}"
        ckpt = cands[-1]

    shape = tuple(int(v) for v in args.shape.split(","))
    work = os.path.join("runs", "seam_bench")
    os.makedirs(work, exist_ok=True)
    vol_path = os.path.join(work, "vol.tif")

    from skoots_tpu.infer import run_inference
    from skoots_tpu.utils.io import imsave
    from tools.accuracy_campaign import score

    t0 = time.time()
    img, gt, n_placed = make_tubes_big(shape, args.n_tubes)
    imsave(vol_path, img)
    synth_s = time.time() - t0
    print(f"phantom: {n_placed} tubes in {synth_s:.0f}s", flush=True)

    geoms = {
        "A_overlap_r2": dict(crop_size=(192, 192, 96), overlap=(8, 8, 4)),
        "B_zero_overlap_r3": dict(crop_size=(256, 256, 96),
                                  overlap=(0, 0, 0)),
    }
    masks = {}
    rows = {}
    for name, g in geoms.items():
        t0 = time.time()
        m = np.asarray(run_inference(
            vol_path, ckpt, assign_crop_size=(256, 256, 96),
            assign_overlap=(0, 0, 0), embed_iterations=10, **g,
        )).squeeze()
        rows[name] = {**g, "wall_s": round(time.time() - t0, 1),
                      "vs_gt": score(gt, m)}
        masks[name] = m
        print(json.dumps({name: rows[name]}, default=str), flush=True)

    agree = score(masks["A_overlap_r2"], masks["B_zero_overlap_r3"])
    out = {"shape": list(shape), "n_tubes": n_placed, "checkpoint": ckpt,
           "geometries": rows, "agreement_B_vs_A": agree}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2, default=str)
    print(json.dumps(out, default=str), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
