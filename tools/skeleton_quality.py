"""Skeleton-quality evidence beyond tubes (VERDICT r2 item 9).

The repo's GT skeletonizer replaces skimage's Lee thinning
(/root/reference/skoots/train/generate_skeletons.py:138) with EDT-ridge+NMS
medial points and a TEASAR variant. Round 2 only validated them on synthetic
tubes. This tool scores both methods on branching, flat, and irregular
shapes with three metrics:

  coverage     fraction of object voxels whose nearest skeleton point lies
               within max(3, 1.5 * EDT(v)) — "the skeleton reaches every
               part of the object" (bake supervision needs this: a voxel's
               embedding target is its nearest skeleton point)
  centered     mean over skeleton points of EDT(p) / max EDT within a
               3-voxel ball — points sit on local depth maxima
  inside       fraction of skeleton points strictly inside the object

Writes runs/skeleton_quality.json and prints a table; the regression test
is tests/test_skeleton_quality.py (branching shape, loose bars).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
from scipy import ndimage


def branching_tube(shape=(96, 96, 32), radius=5) -> np.ndarray:
    """A Y: one trunk splitting into two arms (+ one z-tilted arm)."""
    x, y, z = shape
    xx, yy, zz = np.meshgrid(np.arange(x), np.arange(y), np.arange(z),
                             indexing="ij")
    d2 = np.full(shape, np.inf)
    segs = [
        ((10, 48, 16), (48, 48, 16)),   # trunk
        ((48, 48, 16), (86, 20, 16)),   # arm 1
        ((48, 48, 16), (86, 76, 24)),   # arm 2 (tilts in z)
    ]
    for a, b in segs:
        a, b = np.asarray(a, float), np.asarray(b, float)
        for t in np.linspace(0, 1, 48):
            p = a * (1 - t) + b * t
            np.minimum(
                d2,
                (xx - p[0]) ** 2 + (yy - p[1]) ** 2 + ((zz - p[2]) * 3.0) ** 2,
                out=d2,
            )
    return (d2 <= radius**2).astype(np.int32)


def flat_sheet(shape=(96, 96, 32)) -> np.ndarray:
    """A gently-curved thin slab (z-thickness ~4): thinning should produce a
    2D sheet-like point cloud, not a single filament."""
    x, y, z = shape
    xx, yy, zz = np.meshgrid(np.arange(x), np.arange(y), np.arange(z),
                             indexing="ij")
    mid = 16 + 4 * np.sin(xx / 14.0) * np.cos(yy / 18.0)
    m = (np.abs(zz - mid) <= 2) & (xx > 8) & (xx < 88) & (yy > 8) & (yy < 88)
    return m.astype(np.int32)


def irregular_blob(shape=(96, 96, 32)) -> np.ndarray:
    from skoots_tpu.utils.synthetic import make_blobs

    _, labels, _ = make_blobs(shape=shape, n_blobs=1, radius_range=(10, 14),
                              seed=11, elongation=2.0)
    return (labels > 0).astype(np.int32)


SHAPES = {
    "branching": branching_tube,
    "flat_sheet": flat_sheet,
    "blob": irregular_blob,
}


def score_skeleton(mask: np.ndarray, pts: np.ndarray,
                   zscale: float = 3.0) -> dict:
    """Quality metrics for one object's skeleton point cloud (anisotropic
    metric: z distances x3, matching the phantom geometry)."""
    w = np.asarray([1.0, 1.0, zscale])
    edt = ndimage.distance_transform_edt(mask, sampling=w)
    vox = np.argwhere(mask > 0).astype(np.float32)

    # coverage: each voxel's distance to its NEAREST skeleton point must not
    # exceed 1.5x the object radius AT that point (+2 slack) — i.e. the
    # skeleton locally represents the shape's thickness. (Comparing against
    # the voxel's own EDT would wrongly fail every surface voxel.)
    ip = np.clip(np.round(pts).astype(int), 0, np.asarray(mask.shape) - 1)
    r_at_pt = edt[ip[:, 0], ip[:, 1], ip[:, 2]]
    d = np.empty(len(vox), np.float32)
    nearest = np.empty(len(vox), np.int64)
    for i in range(0, len(vox), 4096):
        blk = vox[i : i + 4096]
        d2 = (((blk[:, None, :] - pts[None, :, :]) * w) ** 2).sum(-1)
        nearest[i : i + 4096] = d2.argmin(1)
        d[i : i + 4096] = np.sqrt(d2.min(1))
    allow = 1.5 * np.maximum(r_at_pt[nearest], 1.0) + 2.0
    coverage = float((d <= allow).mean())

    # centeredness + inside
    ip = np.clip(np.round(pts).astype(int), 0,
                 np.asarray(mask.shape) - 1)
    at = edt[ip[:, 0], ip[:, 1], ip[:, 2]]
    inside = float((at > 0).mean())
    local_max = ndimage.maximum_filter(edt, size=(7, 7, 3))
    ratio = at / np.maximum(local_max[ip[:, 0], ip[:, 1], ip[:, 2]], 1e-6)
    centered = float(ratio[at > 0].mean()) if (at > 0).any() else 0.0
    return {"coverage": round(coverage, 3), "centered": round(centered, 3),
            "inside": round(inside, 3), "n_points": int(len(pts))}


def main() -> int:
    from skoots_tpu.train.generate_skeletons import calculate_skeletons

    rows = {}
    for name, gen in SHAPES.items():
        mask = gen()
        rows[name] = {}
        for method in ("medial", "lee", "teasar"):
            skels = calculate_skeletons(mask, scale=(1.0, 1.0, 3.0),
                                        method=method)
            rows[name][method] = score_skeleton(mask, skels[1])
    os.makedirs("runs", exist_ok=True)
    with open("runs/skeleton_quality.json", "w") as f:
        json.dump(rows, f, indent=2)
    print(f"{'shape':<12}{'method':<9}{'coverage':>9}{'centered':>9}"
          f"{'inside':>8}{'points':>8}")
    for name, by_m in rows.items():
        for method, r in by_m.items():
            print(f"{name:<12}{method:<9}{r['coverage']:>9}{r['centered']:>9}"
                  f"{r['inside']:>8}{r['n_points']:>8}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
