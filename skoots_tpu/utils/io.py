"""Volume I/O: TIFF (multi-page via PIL), HDF5, NPY.

Canonical layout: a volume is ``[X, Y, Z]`` (np.ndarray, host). TIFF stacks
store [Z, Y, X]-ish pages; the reference canonicalizes imread output
[Z, X, Y, C] -> [C, X, Y, Z] (/root/reference/skoots/lib/eval.py:61-64,
validate/utils.py:9-28). We keep the same axis convention: page index = Z,
page rows = X, page cols = Y.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np
from PIL import Image, ImageSequence

Image.MAX_IMAGE_PIXELS = None  # EM slices are big; trust local files


def imread(path: str) -> np.ndarray:
    """Read a 2D or 3D (multi-page) image into canonical ``[X, Y, Z]``.

    Multi-channel pages collapse to the reference's channel pick: channel 2
    if >3 channels else channel 0 (eval.py:64 keeps ``image[[2]]``).
    """
    ext = os.path.splitext(path)[1].lower()
    if ext in (".npy",):
        # memmap: .npy inputs stream page-by-page (bounded RSS for volumes
        # larger than RAM — the out-of-core inference input path)
        vol = np.load(path, mmap_mode="r")
        return _canon_np(vol)
    if ext in (".h5", ".hdf5"):
        import h5py

        with h5py.File(path, "r") as f:
            key = next(iter(f.keys()))
            vol = f[key][...]
        return _canon_np(vol)

    img = Image.open(path)
    pages = []
    for frame in ImageSequence.Iterator(img):
        arr = np.asarray(frame)
        if arr.ndim == 3:  # [X, Y, C]
            arr = arr[..., 2] if arr.shape[-1] > 3 else arr[..., 0]
        pages.append(arr)
    vol = np.stack(pages, axis=0)  # [Z, X, Y]
    return np.ascontiguousarray(vol.transpose(1, 2, 0))  # [X, Y, Z]


def _canon_np(vol: np.ndarray) -> np.ndarray:
    if vol.ndim == 2:
        vol = vol[..., None]
    assert vol.ndim == 3, f"expected 2D/3D volume, got {vol.shape}"
    return vol


def imsave(path: str, volume: np.ndarray) -> None:
    """Save an ``[X, Y, Z]`` volume. TIFF output is written page-per-Z
    ([Z, X, Y], matching the reference's ``transpose(2, 0, 1)`` at
    eval.py:309-310)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".npy":
        np.save(path, volume)
        return
    if ext in (".h5", ".hdf5"):
        import h5py

        with h5py.File(path, "w") as f:
            f.create_dataset("volume", data=volume, compression="gzip")
        return

    vol = volume.transpose(2, 0, 1)  # [Z, X, Y]
    mode_arr = vol
    if vol.dtype in (np.int64, np.uint64):
        mode_arr = vol.astype(np.int32)
    frames = [Image.fromarray(p) for p in mode_arr]
    frames[0].save(
        path,
        save_all=True,
        append_images=frames[1:],
        compression="tiff_deflate",
    )


def open_outofcore(
    path: str, shape: Tuple[int, ...], dtype: str
) -> np.memmap:
    """Out-of-core host buffer (zarr-role replacement, reference
    eval.py:101-111). A flat memmap: simple, mmap-paged, no chunk-codec CPU
    cost on the write path."""
    return np.lib.format.open_memmap(path, mode="w+", dtype=dtype, shape=shape)


def load_outofcore(path: str) -> np.memmap:
    return np.lib.format.open_memmap(path, mode="r+")
