"""Whole-volume on-device pipeline: equivalence with oracle segmentation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skoots_tpu.config import get_cfg_defaults
from skoots_tpu.infer.device_pipeline import make_device_pipeline
from skoots_tpu.models import init_model


class TestDevicePipeline:
    def test_runs_and_shapes(self):
        cfg = get_cfg_defaults()
        cfg.MODEL.DIMS = [4, 8, 16, 8, 4]
        cfg.MODEL.DEPTHS = [1, 1, 1, 1, 1]
        cfg.MODEL.OUT_CHANNELS = 4
        cfg.MODEL.KERNEL_SIZE = 3
        model, params = init_model(cfg, jax.random.PRNGKey(0), spatial=(16, 16, 8))
        shape = (48, 40, 12)
        pipe = make_device_pipeline(
            model, shape, crop=(32, 32, 8), overlap=(4, 4, 2), embed_iterations=2,
        )
        vol = jnp.asarray(np.random.default_rng(0).random(shape, np.float32) * 255)
        out = pipe(params, vol, jnp.float32(128.0), jnp.float32(64.0))
        assert out.shape == shape
        assert out.dtype == jnp.int32

    def test_oracle_volume_segments_correctly(self):
        """Bypass the network: run phases 2+3 of the device pipeline logic on
        a perfect prediction and check instances match GT objects 1:1."""
        from skoots_tpu.ops.flood_fill import label_components
        from skoots_tpu.ops.vec2embed import vector_to_embedding
        from skoots_tpu.utils.synthetic import make_tubes, perfect_prediction

        image, labels_gt, skels = make_tubes(shape=(64, 64, 12), n_tubes=3, seed=3)
        pred = perfect_prediction(labels_gt, skels)
        skel_bin = (pred[..., 3] > 0.5).astype(np.uint8)
        labels = label_components(jnp.asarray(skel_bin))
        emb = vector_to_embedding(
            jnp.asarray([60.0, 60.0, 12.0]), jnp.asarray(pred[None, ..., 0:3]), n=5
        )[0]
        idx = np.clip(np.round(np.asarray(emb)).astype(np.int64), 0, None)
        idx[..., 0] = idx[..., 0].clip(0, 63)
        idx[..., 1] = idx[..., 1].clip(0, 63)
        idx[..., 2] = idx[..., 2].clip(0, 11)
        inst = np.asarray(labels)[idx[..., 0], idx[..., 1], idx[..., 2]]
        inst = inst * (labels_gt > 0)
        for gid in np.unique(labels_gt[labels_gt > 0]):
            ids, counts = np.unique(inst[labels_gt == gid], return_counts=True)
            assert counts.max() / counts.sum() > 0.9


class TestBalancedChunks:
    def test_exact_split_has_no_padding(self):
        from skoots_tpu.infer.device_pipeline import _balanced_chunks

        origins = np.arange(24 * 3).reshape(24, 3)
        chunks = _balanced_chunks(origins, 16)
        assert [len(c) for c in chunks] == [12, 12]
        np.testing.assert_array_equal(np.concatenate(chunks), origins)

    def test_padding_bounded_by_chunk_count(self):
        from skoots_tpu.infer.device_pipeline import _balanced_chunks

        for n in (1, 5, 17, 54, 100):
            for g in (1, 4, 16):
                origins = np.arange(n * 3).reshape(n, 3)
                chunks = _balanced_chunks(origins, g)
                sizes = {len(c) for c in chunks}
                assert len(sizes) == 1  # one compiled program shape
                size = sizes.pop()
                assert size <= g
                total = size * len(chunks)
                assert total - n < len(chunks)  # waste < n_chunks
                # every original origin appears, in order
                flat = np.concatenate(chunks)[:, 0]
                assert set(origins[:, 0]) <= set(flat.tolist())


class TestChunkedPipeline:
    def test_zero_overlap_exact_grid(self):
        """The bench geometry: zero overlap, clamped last-origin tiles (the
        512^3 bench sweeps an exact 2x2x6 grid). Chunked must equal the
        single program."""
        from skoots_tpu.infer.device_pipeline import segment_volume_chunked

        cfg = get_cfg_defaults()
        cfg.MODEL.DIMS = [4, 8, 16, 8, 4]
        cfg.MODEL.DEPTHS = [1, 1, 1, 1, 1]
        cfg.MODEL.OUT_CHANNELS = 4
        cfg.MODEL.KERNEL_SIZE = 3
        model, params = init_model(cfg, jax.random.PRNGKey(0), spatial=(16, 16, 8))
        shape = (64, 64, 24)  # z: 12-crop grid clamps its last origin
        vol = jnp.asarray(np.random.default_rng(1).random(shape, np.float32) * 255)
        mean, std = jnp.float32(128.0), jnp.float32(64.0)
        kwargs = dict(crop=(32, 32, 12), overlap=(0, 0, 0), embed_iterations=2)
        single = make_device_pipeline(model, shape, **kwargs)(params, vol, mean, std)
        chunked = segment_volume_chunked(
            model, params, vol, mean, std, tiles_per_dispatch=3, **kwargs
        )
        np.testing.assert_array_equal(np.asarray(single), np.asarray(chunked))

    @pytest.mark.slow
    def test_chunked_matches_single_program(self):
        import jax
        from skoots_tpu.infer.device_pipeline import (
            make_device_pipeline,
            segment_volume_chunked,
        )
        from skoots_tpu.models import init_model

        cfg = get_cfg_defaults()
        cfg.MODEL.DIMS = [4, 8, 16, 8, 4]
        cfg.MODEL.DEPTHS = [1, 1, 1, 1, 1]
        cfg.MODEL.OUT_CHANNELS = 4
        cfg.MODEL.KERNEL_SIZE = 3
        model, params = init_model(cfg, jax.random.PRNGKey(0), spatial=(16, 16, 8))
        shape = (48, 40, 12)
        vol = jnp.asarray(np.random.default_rng(1).random(shape, np.float32) * 255)
        mean, std = jnp.float32(128.0), jnp.float32(64.0)
        kwargs = dict(crop=(32, 32, 8), overlap=(4, 4, 2), embed_iterations=2)
        single = make_device_pipeline(model, shape, **kwargs)(params, vol, mean, std)
        chunked = segment_volume_chunked(
            model, params, vol, mean, std, tiles_per_dispatch=2, **kwargs
        )
        np.testing.assert_array_equal(np.asarray(single), np.asarray(chunked))

    def test_chunked_sparse_cc_matches_dense(self):
        """cc_impl='sparse' must produce the identical instance map (the
        sparse CC's labeling convention is bit-equal to the dense one)."""
        import jax
        from skoots_tpu.infer.device_pipeline import segment_volume_chunked
        from skoots_tpu.models import init_model

        cfg = get_cfg_defaults()
        cfg.MODEL.DIMS = [4, 8, 16, 8, 4]
        cfg.MODEL.DEPTHS = [1, 1, 1, 1, 1]
        cfg.MODEL.OUT_CHANNELS = 4
        cfg.MODEL.KERNEL_SIZE = 3
        model, params = init_model(cfg, jax.random.PRNGKey(0), spatial=(16, 16, 8))
        shape = (48, 40, 12)
        vol = jnp.asarray(np.random.default_rng(1).random(shape, np.float32) * 255)
        mean, std = jnp.float32(128.0), jnp.float32(64.0)
        kwargs = dict(crop=(32, 32, 8), overlap=(4, 4, 2), embed_iterations=2)
        dense = segment_volume_chunked(
            model, params, vol, mean, std, cc_impl="dense", **kwargs
        )
        sparse = segment_volume_chunked(
            model, params, vol, mean, std, cc_impl="sparse", **kwargs
        )
        np.testing.assert_array_equal(np.asarray(dense), np.asarray(sparse))


class TestCompactAssign:
    def test_chunked_compact_assign_matches_dense(self):
        """embed_compact_div on the chunked pipeline must produce the
        IDENTICAL instance mask (the output is semantic-gated, so walking
        only fg voxels is output-exact), including the dense fallback when
        fg exceeds the buffer."""
        from skoots_tpu.infer.device_pipeline import make_chunked_pipeline
        from skoots_tpu.utils.synthetic import make_tubes

        cfg = get_cfg_defaults()
        cfg.MODEL.DIMS = [4, 8, 16, 8, 4]
        cfg.MODEL.DEPTHS = [1, 1, 1, 1, 1]
        cfg.MODEL.OUT_CHANNELS = 4
        cfg.MODEL.KERNEL_SIZE = 3
        model, params = init_model(cfg, jax.random.PRNGKey(0),
                                   spatial=(16, 16, 8))
        img, _, _ = make_tubes(shape=(48, 40, 12), n_tubes=3, radius=4,
                               seed=3)
        vol = jnp.asarray(img.astype(np.float32))
        kw = dict(crop=(32, 32, 8), overlap=(0, 0, 0),
                  assign_crop=(32, 32, 8), embed_iterations=4,
                  # untrained net: a permissive threshold guarantees
                  # nonempty fg through the gate
                  prob_threshold=0.45)
        dense = make_chunked_pipeline(model, vol.shape, **kw)
        comp = make_chunked_pipeline(model, vol.shape,
                                     embed_compact_div=16, **kw)
        a = np.asarray(dense(params, vol, jnp.float32(128.), jnp.float32(64.)))
        b = np.asarray(comp(params, vol, jnp.float32(128.), jnp.float32(64.)))
        np.testing.assert_array_equal(a, b)
        # dense-fallback path: buffer far smaller than fg
        tiny = make_chunked_pipeline(model, vol.shape,
                                     embed_compact_div=5000, **kw)
        c = np.asarray(tiny(params, vol, jnp.float32(128.), jnp.float32(64.)))
        np.testing.assert_array_equal(a, c)

    def test_helper_compact_branch_exact_low_fg(self):
        """Direct check of make_compact_assign_tile with fg ~3% (the
        trained-field regime, guaranteed compact branch) against the dense
        reference computation."""
        from skoots_tpu.infer.device_pipeline import make_compact_assign_tile
        from skoots_tpu.ops.vec2embed import vector_to_embedding

        rng = np.random.default_rng(7)
        a_crop, vshape = (24, 20, 8), (48, 40, 16)
        fg = jnp.asarray(rng.random(a_crop) < 0.03)
        vec = jnp.asarray(
            ((rng.random((*a_crop, 3)) - 0.5) * 1.5).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, 50, vshape).astype(np.int32))
        o = jnp.asarray([8, 12, 4], jnp.int32)
        scale = jnp.asarray([6.0, 6.0, 3.0], jnp.float32)
        at = make_compact_assign_tile(a_crop, vshape, scale, 6, 1.0, 16)
        got = np.asarray(jax.jit(at)(vec, fg, labels, o))
        # dense reference (the original assign body)
        emb = vector_to_embedding(scale, vec[None], n=6)[0]
        emb = emb + o.astype(jnp.float32)[None, None, None, :]
        idx = np.asarray(jnp.round(emb).astype(jnp.int32))
        ix = np.clip(idx[..., 0], 0, vshape[0] - 1)
        iy = np.clip(idx[..., 1], 0, vshape[1] - 1)
        iz = np.clip(idx[..., 2], 0, vshape[2] - 1)
        want = np.where(np.asarray(fg), np.asarray(labels)[ix, iy, iz], 0)
        np.testing.assert_array_equal(got, want)
        assert (got > 0).any()  # the compact branch did real work
