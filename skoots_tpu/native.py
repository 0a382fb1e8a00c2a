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
