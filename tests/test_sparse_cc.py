"""Sparse point-cloud CC vs the dense engine and scipy."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from skoots_tpu.ops.flood_fill import (  # noqa: E402
    label_components,
    label_components_sparse,
)

scipy_ndimage = pytest.importorskip("scipy.ndimage")


@pytest.fixture
def rng():
    return np.random.default_rng(31)


def _scipy_cc_count(mask, connectivity=26):
    s = np.ones((3, 3, 3)) if connectivity == 26 else None
    _, n = scipy_ndimage.label(mask, structure=s)
    return n


class TestSparseCC:
    @pytest.mark.parametrize("connectivity", [26, 6])
    def test_matches_dense_engine_bit_identical(self, rng, connectivity):
        mask = rng.random((24, 20, 16)) < 0.12
        dense = np.asarray(
            label_components(jnp.asarray(mask), connectivity=connectivity)
        )
        sparse, ok = label_components_sparse(
            jnp.asarray(mask), n_max=2048, connectivity=connectivity
        )
        assert bool(ok)
        np.testing.assert_array_equal(np.asarray(sparse), dense)

    def test_matches_scipy_component_structure(self, rng):
        mask = rng.random((32, 32, 24)) < 0.25
        sparse, ok = label_components_sparse(jnp.asarray(mask), n_max=8192)
        assert bool(ok)
        sparse = np.asarray(sparse)
        n_sp = len(np.unique(sparse)) - 1
        assert n_sp == _scipy_cc_count(mask)
        # same-component consistency: scipy labels partition identically
        sc, _ = scipy_ndimage.label(mask, structure=np.ones((3, 3, 3)))
        for sid in np.unique(sc)[1:]:
            vals = np.unique(sparse[sc == sid])
            assert len(vals) == 1 and vals[0] != 0

    def test_long_thin_structure(self):
        """A 60-voxel diagonal-ish snake: the case dense propagation pays
        O(length) passes for; sparse must converge in O(log) rounds."""
        mask = np.zeros((64, 8, 8), bool)
        mask[:60, 2, 3] = True
        mask[59, 2:6, 3] = True
        sparse, ok = label_components_sparse(jnp.asarray(mask), n_max=256)
        assert bool(ok)
        sparse = np.asarray(sparse)
        assert len(np.unique(sparse)) - 1 == 1
        want = np.asarray(label_components(jnp.asarray(mask)))
        np.testing.assert_array_equal(sparse, want)

    def test_empty_and_full(self):
        empty = jnp.zeros((8, 8, 8), bool)
        lab, ok = label_components_sparse(empty, n_max=64)
        assert bool(ok) and int(jnp.max(lab)) == 0
        # a full cube has ~13 edges/voxel — over the 4x edge budget, so
        # the result must be flagged invalid (dense-fallback case)
        full = jnp.ones((8, 8, 8), bool)
        _, ok = label_components_sparse(full, n_max=512)
        assert not bool(ok)

    def test_overflow_flags_not_ok(self, rng):
        mask = rng.random((16, 16, 16)) < 0.5
        _, ok = label_components_sparse(jnp.asarray(mask), n_max=64)
        assert not bool(ok)

    def test_exact_capacity(self):
        mask = np.zeros((8, 8, 8), bool)
        mask[0, 0, :4] = True
        lab, ok = label_components_sparse(jnp.asarray(mask), n_max=4)
        assert bool(ok)
        assert len(np.unique(np.asarray(lab))) - 1 == 1
