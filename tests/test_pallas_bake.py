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

    def test_auto_dispatch(self, rng, monkeypatch):
        """impl='auto' routes to the Pallas kernel on TPU iff P >= threshold."""
        import skoots_tpu.ops.skeleton as sk

        masks, skels = _random_case(rng)
        packed = pack_skeletons(skels, pad_to=sk._PALLAS_MIN_P)
        small = pack_skeletons(skels)  # padded well below the threshold

        calls = []

        def fake_pallas(m, pts, pids, aniso=(1.0, 1.0, 1.0)):
            calls.append(pts.shape[0])
            return (jnp.zeros((*m.shape, 3), jnp.float32),
                    jnp.zeros(m.shape, jnp.float32))

        monkeypatch.setattr(sk, "bake_skeleton_pallas", fake_pallas)

        # CPU backend: auto must use the MXU path regardless of P
        sk.bake_skeleton(jnp.asarray(masks), packed, average=False)
        assert calls == []

        monkeypatch.setattr(sk.jax, "default_backend", lambda: "tpu")
        sk.bake_skeleton(jnp.asarray(masks), small, average=False)
        assert calls == []  # small P stays on the MXU path
        sk.bake_skeleton(jnp.asarray(masks), packed, average=False)
        assert calls == [sk._PALLAS_MIN_P]
        sk.bake_skeleton(jnp.asarray(masks), small, average=False, impl="pallas")
        assert len(calls) == 2  # explicit override wins

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
