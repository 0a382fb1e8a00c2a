"""ctypes bindings for the native host ops (native/skoots_native.cpp).

Native equivalents of the reference's host-side native deps — scipy label,
numba in-place replace, fastremap renumber — with automatic numpy/scipy
fallback when the shared library has not been built (native/build.sh).
"""

from __future__ import annotations

import ctypes
import logging
import os
from typing import Optional, Tuple

import numpy as np

log = logging.getLogger(__name__)

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    candidates = [
        os.path.join(here, "native", "libskoots_native.so"),
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "libskoots_native.so"),
    ]
    for c in candidates:
        if os.path.exists(c):
            try:
                lib = ctypes.CDLL(c)
                lib.cc3d_label.restype = ctypes.c_int64
                lib.renumber_i64.restype = ctypes.c_int64
                _LIB = lib
                return lib
            except OSError as e:  # pragma: no cover
                log.warning("failed to load %s: %s", c, e)
    log.info("native library not built (native/build.sh); using python fallbacks")
    return None


def has_native() -> bool:
    return _load() is not None


def cc3d_label(binary: np.ndarray, connectivity: int = 26) -> Tuple[np.ndarray, int]:
    """3D connected components (host). Returns (labels int32, count)."""
    binary = np.ascontiguousarray(binary > 0, np.uint8)
    lib = _load()
    if lib is None:
        from scipy import ndimage

        structure = (
            np.ones((3, 3, 3)) if connectivity == 26 else None
        )
        lab, n = ndimage.label(binary, structure=structure)
        return lab.astype(np.int32), int(n)
    x, y, z = binary.shape
    out = np.empty((x, y, z), np.int32)
    n = lib.cc3d_label(
        binary.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(x), ctypes.c_int64(y), ctypes.c_int64(z),
        ctypes.c_int32(connectivity),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out, int(n)


def remap(x: np.ndarray, keys: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """Replace ``keys`` with ``vals`` in x (returns a new array)."""
    lib = _load()
    out = np.ascontiguousarray(x, np.int64).copy()
    if lib is None or len(keys) == 0:
        from skoots_tpu.ops.flood_fill import remap_labels

        return remap_labels(out, np.asarray(keys, np.int64), np.asarray(vals, np.int64))
    keys = np.ascontiguousarray(keys, np.int64)
    vals = np.ascontiguousarray(vals, np.int64)
    lib.remap_i64(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(out.size),
        keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(len(keys)),
    )
    return out


_N18_MASK = None
_K26 = None


def _lee_masks():
    global _N18_MASK, _K26
    if _N18_MASK is None:
        m = np.zeros((3, 3, 3), bool)
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                for dk in (-1, 0, 1):
                    if 1 <= abs(di) + abs(dj) + abs(dk) <= 2:
                        m[di + 1, dj + 1, dk + 1] = True
        _N18_MASK = m
        k = np.ones((3, 3, 3), np.uint8)
        k[1, 1, 1] = 0
        _K26 = k
    return _N18_MASK, _K26


def _py_simple_point(nb: np.ndarray) -> bool:
    """(26,6) simple-point test on a 3x3x3 bool object neighborhood with an
    object center: exactly one 26-connected object component in N26*, and
    every background 6-neighbor of the center in one 6-connected background
    component of N18 (Bertrand & Malandain characterization — equivalent to
    Lee's Euler-LUT + octree pair). Endpoints (<2 object neighbors) report
    not-simple so the medial axis keeps its line ends."""
    from scipy import ndimage

    n18, _ = _lee_masks()
    neigh = nb.copy()
    neigh[1, 1, 1] = False
    if int(neigh.sum()) < 2:
        return False
    _, n = ndimage.label(neigh, structure=np.ones((3, 3, 3)))
    if n != 1:
        return False
    bg = (~nb) & n18
    lab, _ = ndimage.label(bg, structure=ndimage.generate_binary_structure(3, 1))
    face_ids = {
        int(lab[2, 1, 1]), int(lab[0, 1, 1]), int(lab[1, 2, 1]),
        int(lab[1, 0, 1]), int(lab[1, 1, 2]), int(lab[1, 1, 0]),
    }
    face_ids.discard(0)
    return len(face_ids) == 1


def _shift_neighbor(a: np.ndarray, d) -> np.ndarray:
    """out[p] = a[p + d] with zero fill (no wraparound)."""
    out = np.zeros_like(a)
    src = [slice(None)] * 3
    dst = [slice(None)] * 3
    for ax, dd in enumerate(d):
        if dd > 0:
            src[ax], dst[ax] = slice(dd, None), slice(None, -dd)
        elif dd < 0:
            src[ax], dst[ax] = slice(None, dd), slice(-dd, None)
    out[tuple(dst)] = a[tuple(src)]
    return out


def _py_lee_thin(vol: np.ndarray) -> np.ndarray:
    """Pure scipy/numpy Lee thinning (fallback for the native kernel):
    6-subiteration border peeling with sequential topology re-checking."""
    from scipy import ndimage

    _, k26 = _lee_masks()
    pad = np.pad(vol.astype(np.uint8), 1)
    dirs = ((0, 0, 1), (0, 0, -1), (0, -1, 0), (0, 1, 0), (1, 0, 0),
            (-1, 0, 0))
    changed = True
    while changed:
        changed = False
        for d in dirs:
            obj = pad > 0
            # border in direction d, WITH object support on the opposite
            # side: a direction-d peel takes at most one layer off a
            # d-facing surface (without the support condition the
            # sequential recheck can zipper a 1-voxel-thick ribbon end to
            # end — measured: even-diameter cylinders collapse to 2 voxels)
            border = (obj & ~_shift_neighbor(obj, d)
                      & _shift_neighbor(obj, tuple(-v for v in d)))
            ncount = ndimage.convolve(obj.astype(np.uint8), k26,
                                      mode="constant")
            # two-phase, matching the native kernel exactly: candidates are
            # simple points of the SNAPSHOT; deletion re-checks against the
            # live volume (simultaneous deletion of adjacent simple points
            # can break connectivity, Lee 1994 sec. 4)
            cand = [
                (i, j, k)
                for i, j, k in np.argwhere(border & (ncount >= 2))
                if _py_simple_point(
                    obj[i - 1 : i + 2, j - 1 : j + 2, k - 1 : k + 2]
                )
            ]
            for i, j, k in cand:
                nb = pad[i - 1 : i + 2, j - 1 : j + 2, k - 1 : k + 2] > 0
                if _py_simple_point(nb):
                    pad[i, j, k] = 0
                    changed = True
    return pad[1:-1, 1:-1, 1:-1] > 0


def lee_thin(binary: np.ndarray) -> np.ndarray:
    """3D medial-axis (Lee) thinning of a binary volume; returns the
    skeleton mask. Native C++ kernel (native/skoots_native.cpp::lee_thin_3d)
    with a scipy fallback. Role of skimage.morphology.skeletonize_3d in the
    reference (/root/reference/skoots/train/generate_skeletons.py:138)."""
    vol = np.ascontiguousarray(np.asarray(binary) > 0, np.uint8)
    lib = _load()
    if lib is not None and hasattr(lib, "lee_thin_3d"):
        lib.lee_thin_3d.restype = ctypes.c_int64
        out = vol.copy()
        x, y, z = out.shape
        lib.lee_thin_3d(
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int64(x), ctypes.c_int64(y), ctypes.c_int64(z),
        )
        return out > 0
    return _py_lee_thin(vol)


def renumber(x: np.ndarray) -> Tuple[np.ndarray, int]:
    """Compact nonzero ids to 1..N (first-appearance order). Returns (out, N)."""
    lib = _load()
    if lib is None:
        from skoots_tpu.ops.flood_fill import renumber as _rn

        out, mapping = _rn(np.asarray(x))
        return out.astype(np.int64), len(mapping)
    out = np.ascontiguousarray(x, np.int64).copy()
    n = lib.renumber_i64(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(out.size),
    )
    return out, int(n)
