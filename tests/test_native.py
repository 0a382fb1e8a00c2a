"""Native host ops (C++ via ctypes) vs scipy/numpy references."""

import numpy as np
import pytest
from scipy import ndimage

from skoots_tpu import native


requires_native = pytest.mark.skipif(
    not native.has_native(), reason="native library not built"
)


class TestNativeCC:
    @requires_native
    def test_matches_scipy_26(self, rng):
        x = (rng.random((32, 24, 10)) > 0.7).astype(np.uint8)
        ours, n = native.cc3d_label(x, connectivity=26)
        ref, n_ref = ndimage.label(x, structure=np.ones((3, 3, 3)))
        assert n == n_ref
        pairs = np.unique(np.stack([ours[x > 0], ref[x > 0]], 1), axis=0)
        assert len(pairs) == n

    @requires_native
    def test_matches_scipy_6(self, rng):
        x = (rng.random((20, 20, 8)) > 0.6).astype(np.uint8)
        ours, n = native.cc3d_label(x, connectivity=6)
        ref, n_ref = ndimage.label(x)  # default structure = 6-conn
        assert n == n_ref
        pairs = np.unique(np.stack([ours[x > 0], ref[x > 0]], 1), axis=0)
        assert len(pairs) == n

    @requires_native
    def test_empty(self):
        out, n = native.cc3d_label(np.zeros((4, 4, 4), np.uint8))
        assert n == 0 and out.sum() == 0


class TestNativeRemap:
    @requires_native
    def test_remap(self):
        x = np.array([1, 5, 7, 5, 0], np.int64)
        out = native.remap(x, np.array([5, 7]), np.array([50, 70]))
        np.testing.assert_array_equal(out, [1, 50, 70, 50, 0])
        np.testing.assert_array_equal(x, [1, 5, 7, 5, 0])  # input untouched

    @requires_native
    def test_renumber(self):
        x = np.array([0, 42, 7, 42, 99], np.int64)
        out, n = native.renumber(x)
        assert n == 3
        np.testing.assert_array_equal(out, [0, 1, 2, 1, 3])

    def test_fallback_paths_exist(self, monkeypatch):
        # even without the .so, the API works via numpy/scipy
        monkeypatch.setattr(native, "_LIB", None)
        monkeypatch.setattr(native, "_TRIED", True)
        x = (np.random.default_rng(0).random((8, 8, 4)) > 0.5).astype(np.uint8)
        lab, n = native.cc3d_label(x)
        assert n >= 1
        out, n2 = native.renumber(np.array([0, 9, 9, 3], np.int64))
        assert n2 == 2
