"""Sparse-training subsystem tests."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from skoots_tpu.config import get_cfg_defaults
from skoots_tpu.experimental.sparse_loss import (
    closest_skeleton,
    sparse_background_loss,
    sparse_embed_loss,
    sparse_loss,
    vector_direction_penalty,
)


class TestSparseLossParts:
    def test_direction_penalty_uniform_field_zero(self):
        v = np.ones((1, 8, 8, 4, 3), np.float32)
        p = np.asarray(vector_direction_penalty(jnp.asarray(v)))
        # parallel vectors -> cos^2 = 1 -> penalty ~ 1e-6
        assert p.max() < 1e-4

    def test_direction_penalty_orthogonal(self):
        v = np.zeros((1, 4, 4, 2, 3), np.float32)
        v[0, ::2, ..., 0] = 1.0  # alternating x/y directions
        v[0, 1::2, ..., 1] = 1.0
        p = np.asarray(vector_direction_penalty(jnp.asarray(v)))
        assert p.mean() > 0.3

    def test_background_loss(self):
        prob = jnp.full((4, 4, 2), 0.5)
        bg = jnp.ones((4, 4, 2))
        loss = sparse_background_loss(prob, bg, multiplier=10)
        np.testing.assert_allclose(float(loss), 0.25 * 10, rtol=1e-6)
        # no certain-bg voxels -> zero
        assert float(sparse_background_loss(prob, jnp.zeros_like(bg), 10)) == 0.0

    def test_embed_loss_within_threshold(self):
        prob = jnp.full((4, 4, 2), 0.8)
        dist = jnp.full((4, 4, 2), 3.0)
        bg = jnp.zeros((4, 4, 2))
        loss = sparse_embed_loss(prob, dist, bg, distance_thr=10.0)
        np.testing.assert_allclose(float(loss), 0.2**2, rtol=1e-5)

    def test_embed_loss_fallback_single_voxel(self):
        prob = jnp.zeros((4, 4, 2))
        dist = jnp.full((4, 4, 2), 99.0).at[1, 1, 1].set(50.0)
        bg = jnp.zeros((4, 4, 2))
        loss = sparse_embed_loss(prob, dist, bg, distance_thr=10.0)
        np.testing.assert_allclose(float(loss), 1.0, rtol=1e-6)

    def test_closest_skeleton_no_points(self):
        pts = jnp.zeros((8, 3))
        valid = jnp.zeros((8,), bool)
        baked, dist = closest_skeleton(pts, valid, (4, 4, 2), (1, 1, 1))
        assert float(jnp.min(baked)) == 1000.0
        assert float(jnp.min(dist)) == 100.0

    def test_sparse_loss_shapes(self):
        b, x, y, z = 2, 8, 8, 4
        rng = np.random.default_rng(0)
        embed = jnp.asarray(rng.random((b, x, y, z, 3), np.float32) * 4)
        vec = jnp.asarray(rng.random((b, x, y, z, 3), np.float32))
        pts = jnp.asarray(rng.random((b, 16, 3), np.float32) * 4)
        valid = jnp.ones((b, 16), bool)
        bg = jnp.zeros((b, x, y, z, 1))
        sem = jnp.full((b, x, y, z, 1), 0.5)
        l_bg, l_e, prob = sparse_loss(
            embed, vec, pts, valid, bg, sem, jnp.asarray([5.0, 5.0, 5.0]),
            (1, 1, 1), 10.0, 10,
        )
        assert np.isfinite(float(l_bg)) and np.isfinite(float(l_e))
        assert prob.shape == (b, x, y, z)


class TestSparseTrainE2E:
    def test_sparse_cli_end_to_end(self, tmp_path):
        from skoots_tpu.train.cli import main
        from skoots_tpu.utils.io import imsave
        from skoots_tpu.utils.synthetic import make_tubes
        from skoots_tpu.train.generate_skeletons import save_skeletons

        d = tmp_path / "sparse_data"
        d.mkdir()
        img, labels, skels = make_tubes(shape=(64, 64, 8), n_tubes=2, seed=0)
        imsave(str(d / "v.tif"), img)
        # certain background = far from any object
        from scipy import ndimage

        bg = (ndimage.distance_transform_edt(labels == 0) > 6).astype(np.uint8)
        imsave(str(d / "v.background.tif"), bg)
        save_skeletons(str(d / "v.skeletons.npz"), skels)

        save_dir = tmp_path / "models"
        cfg = {
            "MODEL": {"DIMS": [4, 8, 16, 8, 4], "DEPTHS": [1, 1, 1, 1, 1],
                      "OUT_CHANNELS": 4, "KERNEL_SIZE": 3},
            "TRAIN": {
                "TRAIN_DATA_DIR": [str(d)], "TRAIN_SAMPLE_PER_IMAGE": [1],
                "TRAIN_STORE_DATA_ON_GPU": [False],
                "NUM_EPOCHS": 2, "SAVE_INTERVAL": 2, "SAVE_PATH": str(save_dir),
                "MAX_SKELETON_POINTS": 64, "LOSS_SKELETON_START_EPOCH": -1,
            },
            "AUGMENTATION": {"CROP_WIDTH": 32, "CROP_HEIGHT": 32, "CROP_DEPTH": 8},
            "SKOOTS": {"VECTOR_SCALING": [8, 8, 4]},
            "EXPERIMENTAL": {"IS_SPARSE": True, "DIST_THR": 5.0},
        }
        p = tmp_path / "sparse.yaml"
        p.write_text(yaml.safe_dump(cfg))
        rc = main(["--config-file", str(p), "--steps-per-epoch", "2", "--log", "1"])
        assert rc == 0
        ckpts = glob.glob(os.path.join(str(save_dir), "*_sparse.skoots"))
        assert len(ckpts) == 1
        # sparse checkpoints self-calibrate their semantic-gate threshold at
        # save time (sparse_engine.make_threshold_calibrator)
        from skoots_tpu.train.checkpoint import load_checkpoint

        extra = load_checkpoint(ckpts[0])["extra"]
        cal = extra.get("calibrated_prob_threshold")
        assert cal is not None and 0.5 <= cal <= 0.9999


class TestModifiers:
    def test_erode(self):
        from skoots_tpu.experimental.modifiers import erode_bg_masks

        bg = np.zeros((10, 10, 10), np.uint8)
        bg[2:8, 2:8, 2:8] = 1
        out = erode_bg_masks(bg, 1)
        assert out.sum() < bg.sum()
        assert out[4, 4, 4] == 1 and out[2, 2, 2] == 0
        np.testing.assert_array_equal(erode_bg_masks(bg, 0), bg)

    def test_ablate(self):
        from skoots_tpu.experimental.modifiers import ablate_bg_masks

        bg = np.ones((4, 4, 10), np.uint8)
        out = ablate_bg_masks(bg, 0.5)
        assert out[..., :5].all() and not out[..., 5:].any()
        with pytest.raises(AssertionError):
            ablate_bg_masks(bg, 0.0)
