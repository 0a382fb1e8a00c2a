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


def _medial_points(binary: np.ndarray, nms_radius: float = 1.5) -> np.ndarray:
    """Medial-axis point cloud of a binary object: EDT ridge (local maxima of
    the distance transform), thinned by greedy non-maximum suppression.

    The raw ridge keeps every tied plateau voxel and is several voxels thick;
    suppressing everything within ``nms_radius`` of an accepted point (EDT-
    descending order, so the most-central voxels win) leaves a near
    1-voxel-wide chain — the role of the reference's Lee thinning
    (generate_skeletons.py:138) without skimage."""
    edt = ndimage.distance_transform_edt(binary)
    if edt.max() == 0:
        return np.zeros((0, 3), np.float32)
    footprint = np.ones((3, 3, 3))
    local_max = ndimage.maximum_filter(edt, footprint=footprint)
    ridge = (edt >= local_max - 1e-6) & (edt >= 1.0)
    pts = np.argwhere(ridge)
    if len(pts) <= 1:
        return pts.astype(np.float32)

    from scipy.spatial import cKDTree

    vals = edt[tuple(pts.T)]
    order = np.argsort(-vals)
    tree = cKDTree(pts)
    alive = np.ones(len(pts), bool)
    keep = []
    for i in order:
        if not alive[i]:
            continue
        keep.append(i)
        for q in tree.query_ball_point(pts[i], r=nms_radius):
            alive[q] = False
    return pts[np.asarray(keep)].astype(np.float32)


def _lee_points(binary: np.ndarray) -> np.ndarray:
    """Skeleton point cloud via true Lee-Kashyap-Chu 3D medial-axis thinning
    (the reference's skimage.skeletonize_3d choice, generate_skeletons.py:138)
    — native C++ kernel with a scipy fallback (skoots_tpu.native.lee_thin)."""
    from skoots_tpu.native import lee_thin

    return np.argwhere(lee_thin(binary)).astype(np.float32)


def _teasar_points(
    binary: np.ndarray,
    invalidation_scale: float = 3.0,
    invalidation_const: float = 2.0,
    pdrf_exponent: int = 8,
    pdrf_scale: float = 5000.0,
    max_paths: int = 512,
) -> np.ndarray:
    """TEASAR centerline point cloud of a binary object.

    Role of the reference's kimimaro alternative path
    (/root/reference/skoots/train/generate_skeletons.py:160-185), implemented
    host-side with scipy (offline preprocessing, not the accelerated path):

    1. EDT of the object; per-voxel penalty ``pdrf_scale*(1-edt/max)^exp``
       steers paths onto the medial axis (the TEASAR "penalized distance from
       boundary" field).
    2. Root = geodesically furthest voxel from an arbitrary start.
    3. Repeatedly: Dijkstra over the penalty-weighted 26-connected voxel
       graph, walk the predecessor chain from the furthest still-valid voxel,
       append the path, invalidate all voxels within
       ``invalidation_scale*edt + invalidation_const`` of it.
    """
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import dijkstra
    from scipy.spatial import cKDTree

    fg = np.argwhere(binary)
    n = fg.shape[0]
    if n == 0:
        return np.zeros((0, 3), np.float32)
    if n == 1:
        return fg.astype(np.float32)

    edt = ndimage.distance_transform_edt(binary)
    idx_vol = np.full(binary.shape, -1, np.int64)
    idx_vol[tuple(fg.T)] = np.arange(n)

    # 26-connected adjacency over foreground voxels (13 half-offsets)
    offsets = [
        (dx, dy, dz)
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        for dz in (-1, 0, 1)
        if (dx, dy, dz) > (0, 0, 0)
    ]
    pen = pdrf_scale * (1.0 - edt[tuple(fg.T)] / max(edt.max(), 1e-6)) ** pdrf_exponent
    rows, cols, wts = [], [], []
    shape = np.asarray(binary.shape)
    for off in offsets:
        shifted = fg + off
        ok = np.all((shifted >= 0) & (shifted < shape), axis=1)
        src = np.arange(n)[ok]
        dst = idx_vol[tuple(shifted[ok].T)]
        hit = dst >= 0
        src, dst = src[hit], dst[hit]
        step = float(np.linalg.norm(off))
        w = step + 0.5 * (pen[src] + pen[dst])
        rows.append(src)
        cols.append(dst)
        wts.append(w)
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    wts = np.concatenate(wts)
    graph = csr_matrix(
        (np.concatenate([wts, wts]), (np.concatenate([rows, cols]),
                                      np.concatenate([cols, rows]))),
        shape=(n, n),
    )

    # root: furthest (geodesic) voxel from an arbitrary start
    d0 = dijkstra(graph, indices=0)
    d0[~np.isfinite(d0)] = -1
    root = int(np.argmax(d0))
    dist, pred = dijkstra(graph, indices=root, return_predecessors=True)
    reachable = np.isfinite(dist)

    valid = reachable.copy()
    valid[root] = False
    tree = cKDTree(fg)
    radii = invalidation_scale * edt[tuple(fg.T)] + invalidation_const
    paths = [root]
    for _ in range(max_paths):
        if not valid.any():
            break
        masked = np.where(valid, dist, -np.inf)
        target = int(np.argmax(masked))
        path = []
        v = target
        while v != -9999 and v != root:
            path.append(v)
            v = int(pred[v])
        path.append(root)
        paths.extend(path)
        for p in path:
            for q in tree.query_ball_point(fg[p], r=float(radii[p])):
                valid[q] = False
    return fg[np.unique(np.asarray(paths))].astype(np.float32)


def calculate_skeletons(
    mask: np.ndarray,
    scale: Tuple[float, float, float] = (1.0, 1.0, 1.0),
    method: str = "medial",
) -> Dict[int, np.ndarray]:
    """Skeleton points per instance id.

    Args:
        mask: ``[X, Y, Z]`` integer instance mask.
        scale: anisotropy upsample factors applied before skeletonization and
            divided back out of the point coordinates (reference :81-89).
        method: ``"medial"`` (EDT-ridge, reference calculate_skeletons
            :65-157), ``"lee"`` (true Lee 3D thinning — the reference's
            skimage.skeletonize_3d path :138), or ``"teasar"`` (reference
            _calculate_skeletons kimimaro path :160-185).
    """
    extractors = {"medial": _medial_points, "lee": _lee_points,
                  "teasar": _teasar_points}
    if method not in extractors:
        raise ValueError(f"unknown skeletonize method {method!r}")
    extract = extractors[method]
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
        pts = extract(crop)
        if pts.shape[0] == 0:  # degenerate: centroid fallback
            pts = np.argwhere(crop).astype(np.float32).mean(0, keepdims=True)
        if upsample:
            # voxel-center inverse of the nearest-neighbor zoom: plain
            # ``pts / scale`` (the reference's mapping,
            # generate_skeletons.py:143-147) biases outward by up to
            # (scale-1)/scale voxels, pushing ridge points OUTSIDE thin
            # objects at the far face (measured: 23/71 blob medial points
            # out-of-object at z-scale 3; 0 after this correction)
            pts = (pts + 0.5) / scale - 0.5
        out[int(uid)] = (pts + lower.astype(np.float32)).astype(np.float32)
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
    method: str = "medial",
) -> None:
    """For every ``*.labels.tif`` in ``directory``, write
    ``*.skeletons.npz`` (reference create_gt_skeletons :188-215)."""
    files = sorted(glob.glob(os.path.join(directory, f"*{mask_suffix}")))
    for f in files:
        mask = imread(f).astype(np.int32)
        skels = calculate_skeletons(mask, scale, method=method)
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
