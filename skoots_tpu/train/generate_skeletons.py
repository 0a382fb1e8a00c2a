"""Offline GT skeletonization: ``skoots --skeletonize-train-data DIR``.

Re-design of /root/reference/skoots/train/generate_skeletons.py:65-215.
Host-side preprocessing (runs once per dataset, not on the accelerated path).
The reference uses skimage's Lee 3D thinning; this image has no skimage, so
the skeleton is a 3D medial-axis point cloud extracted by thinning the
Euclidean distance transform ridge — equally valid supervision for the bake
(nearest-point) and skeleton-mask (stamp painting) targets. Degenerate
objects fall back to their centroid (reference :148-151).

Output: ``<name>.skeletons.npz`` with one ``[M, 3]`` float32 array per
instance id (string keys) — the role of the reference's ``.skeletons.trch``.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, Tuple

import numpy as np
from scipy import ndimage

from skoots_tpu.utils.io import imread


def _medial_points(binary: np.ndarray) -> np.ndarray:
    """Medial-axis point cloud of a binary object: EDT ridge (local maxima of
    the distance transform along any axis-aligned direction), thinned."""
    edt = ndimage.distance_transform_edt(binary)
    if edt.max() == 0:
        return np.zeros((0, 3), np.float32)
    footprint = np.ones((3, 3, 3))
    local_max = ndimage.maximum_filter(edt, footprint=footprint)
    ridge = (edt >= local_max - 1e-6) & (edt >= 1.0)
    pts = np.argwhere(ridge).astype(np.float32)
    return pts


def calculate_skeletons(
    mask: np.ndarray, scale: Tuple[float, float, float] = (1.0, 1.0, 1.0)
) -> Dict[int, np.ndarray]:
    """Skeleton points per instance id.

    Args:
        mask: ``[X, Y, Z]`` integer instance mask.
        scale: anisotropy upsample factors applied before skeletonization and
            divided back out of the point coordinates (reference :81-89).
    """
    scale = np.asarray(scale, np.float32)
    unique = np.unique(mask)
    unique = unique[unique != 0]
    out: Dict[int, np.ndarray] = {}

    upsample = not np.allclose(scale, 1.0)
    for uid in unique:
        binary = mask == uid
        nz = np.argwhere(binary)
        lower = nz.min(0)
        upper = nz.max(0) + 1
        crop = binary[lower[0]:upper[0], lower[1]:upper[1], lower[2]:upper[2]]
        if upsample:
            crop = ndimage.zoom(crop.astype(np.uint8), scale, order=0) > 0
        pts = _medial_points(crop)
        if pts.shape[0] == 0:  # degenerate: centroid fallback
            pts = np.argwhere(crop).astype(np.float32).mean(0, keepdims=True)
        pts = pts / scale + lower.astype(np.float32)
        out[int(uid)] = pts.astype(np.float32)
    return out


def save_skeletons(path: str, skeletons: Dict[int, np.ndarray]) -> None:
    np.savez_compressed(path, **{str(k): v for k, v in skeletons.items()})


def load_skeletons(path: str) -> Dict[int, np.ndarray]:
    """Load ``.skeletons.npz`` (ours) or ``.skeletons.trch`` (reference,
    via torch-cpu if available)."""
    if path.endswith(".trch"):
        import torch

        d = torch.load(path, map_location="cpu", weights_only=False)
        return {int(k): np.asarray(v, np.float32) for k, v in d.items()}
    with np.load(path) as z:
        return {int(k): z[k].astype(np.float32) for k in z.files}


def create_gt_skeletons(
    directory: str,
    mask_suffix: str = ".labels.tif",
    scale: Tuple[float, float, float] = (1.0, 1.0, 1.0),
) -> None:
    """For every ``*.labels.tif`` in ``directory``, write
    ``*.skeletons.npz`` (reference create_gt_skeletons :188-215)."""
    files = sorted(glob.glob(os.path.join(directory, f"*{mask_suffix}")))
    for f in files:
        mask = imread(f).astype(np.int32)
        skels = calculate_skeletons(mask, scale)
        out = f.replace(mask_suffix, ".skeletons.npz")
        save_skeletons(out, skels)
        print(f"{f}: {len(skels)} skeletons -> {out}")


def save_train_test_split(
    mask: np.ndarray, skeletons: Dict[int, np.ndarray], z_split: int, base: str
) -> None:
    """Split skeletons by a Z plane (reference :15-62)."""
    train_ids = np.unique(mask[..., : z_split + 1])
    val_ids = np.unique(mask[..., z_split:])
    save_skeletons(
        base + "_train.skeletons.npz",
        {int(u): skeletons[int(u)] for u in train_ids if u != 0 and int(u) in skeletons},
    )
    val = {}
    for u in val_ids:
        u = int(u)
        if u == 0 or u not in skeletons:
            continue
        pts = skeletons[u].copy()
        pts[:, 2] -= z_split
        val[u] = pts
    save_skeletons(base + "_validate.skeletons.npz", val)
