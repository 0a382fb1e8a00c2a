"""Pallas bake kernel vs the pure-XLA reference implementation (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from skoots_tpu.kernels.bake import bake_skeleton_pallas
from skoots_tpu.ops.skeleton import bake_skeleton, pack_skeletons


def _random_case(rng, shape=(24, 16, 8), n_inst=3, pts_per=5):
    masks = rng.integers(0, n_inst + 1, shape).astype(np.int32)
    skels = {
        i: rng.random((pts_per, 3)).astype(np.float32) * np.asarray(shape)
        for i in range(1, n_inst + 1)
    }
    return masks, skels


class TestPallasBake:
    @pytest.mark.parametrize("aniso", [(1.0, 1.0, 1.0), (1.0, 1.0, 4.0)])
    def test_matches_xla_path(self, rng, aniso):
        masks, skels = _random_case(rng)
        packed = pack_skeletons(skels)
        ref, ref_d = bake_skeleton(
            jnp.asarray(masks), packed, anisotropy=aniso, average=False,
            return_distance=True,
        )
        got, got_d = bake_skeleton_pallas(
            jnp.asarray(masks), packed.points, packed.ids, anisotropy=aniso,
            interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got_d), np.asarray(ref_d), atol=1e-3)
        # coordinates may differ only at exact-tie voxels; compare distances of
        # the selected points instead of raw coords, then spot-check coords
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3)

    def test_background_zero(self, rng):
        masks = np.zeros((8, 8, 8), np.int32)
        packed = pack_skeletons({1: np.array([[1.0, 1.0, 1.0]], np.float32)})
        baked, dist = bake_skeleton_pallas(
            jnp.asarray(masks), packed.points, packed.ids, interpret=True
        )
        assert np.asarray(baked).sum() == 0
        assert np.asarray(dist).sum() == 0

    def test_many_points_multiblock(self, rng):
        # force multiple PBLOCK inner steps
        masks = np.ones((8, 8, 8), np.int32)
        pts = rng.random((1500, 3)).astype(np.float32) * 8
        packed = pack_skeletons({1: pts})
        ref, ref_d = bake_skeleton(
            jnp.asarray(masks), packed, average=False, return_distance=True
        )
        got, got_d = bake_skeleton_pallas(
            jnp.asarray(masks), packed.points, packed.ids, interpret=True
        )
        np.testing.assert_allclose(np.asarray(got_d), np.asarray(ref_d), atol=1e-3)
