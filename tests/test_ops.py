"""Golden-value unit tests for the core ops (SURVEY.md section 4 plan)."""

import jax.numpy as jnp
import numpy as np
import pytest

from skoots_tpu.ops import (
    baked_embed_to_prob,
    bake_skeleton,
    binary_dilation,
    binary_dilation_2d,
    binary_erosion,
    average_baked_skeletons,
    coordinate_mesh,
    crop_origins,
    gauss_filter,
    get_total_num_crops,
    index_skeleton_by_embed,
    pack_skeletons,
    skeleton_to_mask,
    vector_to_embedding,
)


class TestVectorToEmbedding:
    def test_identity_vectors(self):
        vec = np.zeros((1, 4, 5, 6, 3), np.float32)
        out = vector_to_embedding(jnp.array([1.0, 1.0, 1.0]), jnp.asarray(vec))
        mesh = coordinate_mesh((4, 5, 6))
        np.testing.assert_allclose(np.asarray(out)[0], np.asarray(mesh))

    def test_reference_golden_n2(self):
        # the reference's inline smoke test (vector_to_embedding.py:221-232):
        # all-ones vectors, v[5,5,5]=-1, v[4,4,4]=2, scale 1, N=2
        # => out[:, 5,5,5] == (6, 6, 6)
        vec = np.ones((1, 10, 10, 10, 3), np.float32)
        vec[0, 5, 5, 5, :] = -1.0
        vec[0, 4, 4, 4, :] = 2.0
        out = vector_to_embedding(jnp.array([1, 1, 1]), jnp.asarray(vec), n=2)
        np.testing.assert_allclose(np.asarray(out)[0, 5, 5, 5], [6.0, 6.0, 6.0])

    def test_scale(self):
        vec = np.full((1, 3, 3, 3, 3), 0.5, np.float32)
        out = vector_to_embedding(jnp.array([60.0, 60.0, 12.0]), jnp.asarray(vec))
        np.testing.assert_allclose(np.asarray(out)[0, 0, 0, 0], [30.0, 30.0, 6.0])

    def test_decay(self):
        # uniform field: each extra step adds scale*decay^step * v
        vec = np.full((1, 8, 8, 8, 3), 0.1, np.float32)
        out = vector_to_embedding(jnp.array([1.0, 1.0, 1.0]), jnp.asarray(vec), n=3, decay=0.5)
        expected = 0.1 * (1 + 0.5 + 0.25)
        np.testing.assert_allclose(np.asarray(out)[0, 2, 2, 2], 2 + expected, rtol=1e-6)

    def test_2d(self):
        vec = np.zeros((1, 4, 4, 2), np.float32)
        out = vector_to_embedding(jnp.array([1.0, 1.0]), jnp.asarray(vec))
        assert out.shape == (1, 4, 4, 2)
        np.testing.assert_allclose(np.asarray(out)[0, 2, 3], [2.0, 3.0])


class TestBakedEmbedToProb:
    def test_exact_hit_is_one(self):
        e = jnp.zeros((1, 2, 2, 2, 3))
        p = baked_embed_to_prob(e, e, jnp.array([1.0, 1.0, 1.0]))
        np.testing.assert_allclose(np.asarray(p), 1.0)

    def test_gaussian_value(self):
        e = jnp.zeros((1, 1, 1, 1, 3))
        s = jnp.ones((1, 1, 1, 1, 3))
        sigma = jnp.array([1.0, 1.0, 1.0])
        p = baked_embed_to_prob(e, s, sigma)
        expected = np.exp(-3 / (2 * (1 + 1e-16) ** 2))
        np.testing.assert_allclose(np.asarray(p)[0, 0, 0, 0, 0], expected, rtol=1e-5)

    def test_anisotropic_sigma(self):
        e = jnp.zeros((1, 1, 1, 1, 3))
        s = jnp.asarray(np.array([[[[[2.0, 0.0, 0.0]]]]], np.float32))
        p = baked_embed_to_prob(e, s, jnp.array([2.0, 1.0, 1.0]))
        np.testing.assert_allclose(np.asarray(p)[0, 0, 0, 0, 0], np.exp(-4 / 8), rtol=1e-5)


class TestMorphology:
    def test_dilation_grows_point(self):
        x = np.zeros((1, 5, 5, 5, 1), np.float32)
        x[0, 2, 2, 2, 0] = 1
        out = np.asarray(binary_dilation(jnp.asarray(x)))
        assert out[0, 1, 1, 1, 0] == 1 and out[0, 3, 3, 3, 0] == 1
        assert out[0, 0, 0, 0, 0] == 0
        assert out.sum() == 27

    def test_dilation_2d_stays_in_plane(self):
        x = np.zeros((1, 5, 5, 5, 1), np.float32)
        x[0, 2, 2, 2, 0] = 1
        out = np.asarray(binary_dilation_2d(jnp.asarray(x)))
        assert out[0, 1, 1, 2, 0] == 1
        assert out[0, 2, 2, 1, 0] == 0 and out[0, 2, 2, 3, 0] == 0
        assert out.sum() == 9

    def test_erosion_removes_point(self):
        x = np.zeros((1, 5, 5, 5, 1), np.float32)
        x[0, 2, 2, 2, 0] = 1
        assert np.asarray(binary_erosion(jnp.asarray(x))).sum() == 0

    def test_erosion_keeps_block_core(self):
        x = np.zeros((1, 7, 7, 7, 1), np.float32)
        x[0, 1:6, 1:6, 1:6, 0] = 1
        out = np.asarray(binary_erosion(jnp.asarray(x)))
        assert out[0, 3, 3, 3, 0] == 1
        assert out.sum() == 27  # 3x3x3 core survives

    def test_gauss_filter_preserves_mass(self):
        x = np.zeros((1, 9, 9, 9, 1), np.float32)
        x[0, 4, 4, 4, 0] = 1
        out = np.asarray(gauss_filter(jnp.asarray(x), (3, 3, 3), (0.8, 0.8, 0.8)))
        np.testing.assert_allclose(out.sum(), 1.0, rtol=1e-5)
        assert out[0, 4, 4, 4, 0] == out.max()


class TestBakeSkeleton:
    def test_single_instance_nearest_point(self):
        masks = np.zeros((8, 8, 4), np.int32)
        masks[:, :, :] = 1
        skel = {1: np.array([[1.0, 1.0, 1.0], [6.0, 6.0, 2.0]], np.float32)}
        baked = bake_skeleton(jnp.asarray(masks), skel, average=False)
        baked = np.asarray(baked)
        np.testing.assert_allclose(baked[0, 0, 0], [1.0, 1.0, 1.0])
        np.testing.assert_allclose(baked[7, 7, 3], [6.0, 6.0, 2.0])

    def test_instances_do_not_mix(self):
        masks = np.zeros((8, 8, 2), np.int32)
        masks[:4] = 5
        masks[4:] = 9
        skel = {
            5: np.array([[1.0, 4.0, 1.0]], np.float32),
            9: np.array([[6.0, 4.0, 1.0]], np.float32),
        }
        baked = np.asarray(bake_skeleton(jnp.asarray(masks), skel, average=False))
        # voxel (3, .) belongs to 5: nearest must be 5's point even though 9's is closer
        np.testing.assert_allclose(baked[3, 4, 1], [1.0, 4.0, 1.0])
        np.testing.assert_allclose(baked[4, 4, 1], [6.0, 4.0, 1.0])

    def test_background_is_zero(self):
        masks = np.zeros((4, 4, 2), np.int32)
        masks[0, 0, 0] = 1
        skel = {1: np.array([[0.0, 0.0, 0.0]], np.float32)}
        baked = np.asarray(bake_skeleton(jnp.asarray(masks), skel, average=False))
        assert np.all(baked[1:] == 0)

    def test_anisotropy_changes_winner(self):
        masks = np.ones((1, 1, 8), np.int32)
        # two points: one 2 voxels away in z, one 3 voxels away in x-direction
        # embedding space is [x,y,z]; with z-weight 5 the x point wins
        skel = {1: np.array([[0.0, 0.0, 6.0], [0.0, 0.0, 3.0]], np.float32)}
        iso = np.asarray(bake_skeleton(jnp.asarray(masks), skel, anisotropy=(1, 1, 1), average=False))
        np.testing.assert_allclose(iso[0, 0, 5], [0, 0, 6])  # 6 is 1 away, 3 is 2 away
        # distance check
        _, dist = bake_skeleton(jnp.asarray(masks), skel, anisotropy=(1, 1, 4.0), average=False, return_distance=True)
        np.testing.assert_allclose(np.asarray(dist)[0, 0, 5], 2.0)  # sqrt(4*1)

    def test_missing_skeleton_id_gives_zero(self):
        masks = np.full((2, 2, 2), 7, np.int32)
        skel = {1: np.array([[0.0, 0.0, 0.0]], np.float32)}
        baked = np.asarray(bake_skeleton(jnp.asarray(masks), skel, average=False))
        assert np.all(baked == 0)

    def test_average_smooths(self):
        baked = np.zeros((1, 3, 3, 3, 3), np.float32)
        baked[0, 1, 1, 1] = [3.0, 3.0, 3.0]
        out = np.asarray(average_baked_skeletons(jnp.asarray(baked)))
        # only one nonzero in each 3^3 window -> value preserved where counted
        np.testing.assert_allclose(out[0, 1, 1, 1], [3.0, 3.0, 3.0])
        np.testing.assert_allclose(out[0, 0, 0, 0], [3.0, 3.0, 3.0])


class TestSkeletonToMask:
    def test_paints_center(self):
        skel = {1: np.array([[8.0, 8.0, 2.0]], np.float32)}
        mask = np.asarray(skeleton_to_mask(skel, (16, 16, 5), radius=3, flank_radius=1))
        assert mask[8, 8, 2] == 1
        assert mask[8, 8, 1] == 1 and mask[8, 8, 3] == 1  # flanks
        assert mask[8, 8, 0] == 0  # beyond flank
        assert mask[11, 8, 2] == 1 and mask[12, 8, 2] == 0  # radius 3 in-plane

    def test_out_of_bounds_points_dropped(self):
        skel = {1: np.array([[100.0, 100.0, 100.0]], np.float32)}
        mask = np.asarray(skeleton_to_mask(skel, (8, 8, 4), radius=2, flank_radius=1))
        assert mask.sum() == 0

    def test_empty_skeletons(self):
        mask = np.asarray(skeleton_to_mask({}, (4, 4, 4), radius=1, flank_radius=1))
        assert mask.sum() == 0


class TestIndexSkeletonByEmbed:
    def test_gathers_labels(self):
        skeleton = np.zeros((8, 8, 4), np.int32)
        skeleton[2, 2, 1] = 42
        embed = np.zeros((1, 2, 2, 2, 3), np.float32)
        embed[..., :] = [2.2, 1.8, 1.1]  # rounds to (2, 2, 1)
        out = np.asarray(index_skeleton_by_embed(jnp.asarray(skeleton), jnp.asarray(embed)))
        assert np.all(out == 42)

    def test_clamps_out_of_range(self):
        skeleton = np.zeros((4, 4, 2), np.int32)
        skeleton[3, 3, 1] = 7
        embed = np.full((1, 1, 1, 1, 3), 99.0, np.float32)
        out = np.asarray(index_skeleton_by_embed(jnp.asarray(skeleton), jnp.asarray(embed)))
        assert out[0, 0, 0, 0] == 7


class TestCropper:
    def test_origin_grid(self):
        origins = crop_origins((10, 10, 10), (10, 10, 10), (0, 0, 0))
        assert origins == [(0, 0, 0)]

    def test_stride_and_clamp(self):
        origins = crop_origins((25, 10, 10), (10, 10, 10), (2, 0, 0))
        xs = sorted({o[0] for o in origins})
        assert xs == [0, 6, 12, 15]  # stride 6, final clamped to 25-10

    def test_total_matches(self):
        n = get_total_num_crops((512, 512, 64), (300, 300, 20), (50, 50, 5))
        assert n == len(crop_origins((512, 512, 64), (300, 300, 20), (50, 50, 5)))
        assert n == 3 * 3 * 6

    def test_crop_larger_than_volume_clamps(self):
        origins = crop_origins((100, 100, 10), (300, 300, 20), (50, 50, 5))
        assert origins == [(0, 0, 0)]


class TestEmbedEarlyExit:
    """Convergence early exit of the N-step walk (round-2 assign-walk perf,
    reference eval.py:271-273 runs a fixed N=10)."""

    def test_converged_field_matches_exact(self):
        import jax.numpy as jnp

        from skoots_tpu.ops.vec2embed import vector_to_embedding

        # attractor at x=8: voxels point toward it, the attractor itself has
        # a zero vector -> walk truly converges, early exit must be exact
        shape = (16, 8, 4)
        vec = np.zeros((1, *shape, 3), np.float32)
        xs = np.arange(shape[0], dtype=np.float32)
        vec[0, :, :, :, 0] = ((8.0 - xs) / 4.0).clip(-1, 1)[:, None, None]
        vec[0, 8, :, :, 0] = 0.0
        scale = (4.0, 4.0, 4.0)
        exact = vector_to_embedding(scale, jnp.asarray(vec), n=10)
        early = vector_to_embedding(scale, jnp.asarray(vec), n=10,
                                    exit_fraction=0.0)
        np.testing.assert_allclose(np.asarray(early), np.asarray(exact),
                                   atol=1e-5)

    def test_nonzero_fraction_close(self):
        import jax.numpy as jnp

        from skoots_tpu.ops.vec2embed import vector_to_embedding

        rng = np.random.default_rng(0)
        vec = (rng.random((1, 12, 12, 4, 3), np.float32) - 0.5) * 0.2
        scale = (6.0, 6.0, 3.0)
        exact = vector_to_embedding(scale, jnp.asarray(vec), n=10, decay=0.95)
        early = vector_to_embedding(scale, jnp.asarray(vec), n=10, decay=0.95,
                                    exit_fraction=1e-3)
        # rounded gather targets agree almost everywhere
        agree = np.mean(
            np.all(np.round(np.asarray(exact)) == np.round(np.asarray(early)),
                   axis=-1)
        )
        assert agree > 0.97, agree

    def test_cycle_exit_stops_oscillation_with_same_target(self):
        """A field whose voxels flip between two adjacent indices (measured
        behavior of trained fields around the skeleton — the plain exit
        never fires) must exit under exit_cycle with a final rounded index
        inside the 2-cycle pair."""
        import jax.numpy as jnp

        from skoots_tpu.ops.vec2embed import vector_to_embedding

        # two columns pointing at each other: index oscillates 8 <-> 9
        shape = (16, 8, 4)
        vec = np.zeros((1, *shape, 3), np.float32)
        vec[0, 8, :, :, 0] = 0.25   # 8 -> 9 (scale 4)
        vec[0, 9, :, :, 0] = -0.25  # 9 -> 8
        scale = (4.0, 4.0, 4.0)
        exact = np.round(np.asarray(
            vector_to_embedding(scale, jnp.asarray(vec), n=10)))
        cyc = np.round(np.asarray(
            vector_to_embedding(scale, jnp.asarray(vec), n=10,
                                exit_fraction=0.0, exit_cycle=True)))
        # oscillating voxels land on one of the two cycle points either way
        assert set(np.unique(cyc[0, 8:10, :, :, 0])) <= {8.0, 9.0}
        assert set(np.unique(exact[0, 8:10, :, :, 0])) <= {8.0, 9.0}
        # every other voxel is static and must match exactly
        np.testing.assert_array_equal(cyc[0, :8], exact[0, :8])
        np.testing.assert_array_equal(cyc[0, 10:], exact[0, 10:])

    def test_compact_walk_bitwise_exact(self):
        """_vec2embed_compact: same elementwise chain on a compacted fg
        buffer — must be BITWISE equal to the dense walk, including bg
        stationarity, batch isolation, and the dense fallback when fg
        exceeds the buffer."""
        import jax.numpy as jnp

        from skoots_tpu.ops.vec2embed import vector_to_embedding

        rng = np.random.default_rng(3)
        shape = (2, 14, 12, 6, 3)
        vec = (rng.random(shape, np.float32) - 0.5) * 1.6
        # threshold: ~10% fg, distinct per batch item
        keep = rng.random(shape[:-1]) < 0.1
        vec = vec * keep[..., None]
        scale = (5.0, 5.0, 2.5)
        for n, decay in [(10, 1.0), (6, 0.9)]:
            dense = np.asarray(vector_to_embedding(scale, jnp.asarray(vec),
                                                   n=n, decay=decay))
            comp = np.asarray(vector_to_embedding(scale, jnp.asarray(vec),
                                                  n=n, decay=decay,
                                                  compact_div=4))
            np.testing.assert_array_equal(dense, comp)
        # dense fallback path: fg >> buffer (compact_div huge)
        comp = np.asarray(vector_to_embedding(scale, jnp.asarray(vec), n=5,
                                              compact_div=1000))
        dense = np.asarray(vector_to_embedding(scale, jnp.asarray(vec), n=5))
        np.testing.assert_array_equal(dense, comp)

    def test_cycle_exit_exact_on_converging_field(self):
        import jax.numpy as jnp

        from skoots_tpu.ops.vec2embed import vector_to_embedding

        shape = (16, 8, 4)
        vec = np.zeros((1, *shape, 3), np.float32)
        xs = np.arange(shape[0], dtype=np.float32)
        vec[0, :, :, :, 0] = ((8.0 - xs) / 4.0).clip(-1, 1)[:, None, None]
        vec[0, 8, :, :, 0] = 0.0
        scale = (4.0, 4.0, 4.0)
        exact = vector_to_embedding(scale, jnp.asarray(vec), n=10)
        cyc = vector_to_embedding(scale, jnp.asarray(vec), n=10,
                                  exit_fraction=0.0, exit_cycle=True)
        np.testing.assert_allclose(np.asarray(cyc), np.asarray(exact),
                                   atol=1e-5)
