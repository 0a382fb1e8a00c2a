"""Augmentation pipeline tests: geometry consistency volume <-> points."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skoots_tpu.config import get_cfg_defaults
from skoots_tpu.train.transforms import make_augment, make_batch_augment


def small_cfg(**aug_overrides):
    cfg = get_cfg_defaults()
    cfg.AUGMENTATION.CROP_WIDTH = 32
    cfg.AUGMENTATION.CROP_HEIGHT = 32
    cfg.AUGMENTATION.CROP_DEPTH = 8
    cfg.TRAIN.MAX_SKELETON_POINTS = 64
    cfg.TRAIN.SKELETON_MASK_RADIUS = 2
    cfg.TRAIN.SKELETON_MASK_FLANK_RADIUS = 1
    for k, v in aug_overrides.items():
        cfg.AUGMENTATION[k] = v
    return cfg


def _sample(pre=(48, 48, 8), n_pts=8):
    rng = np.random.default_rng(0)
    image = rng.random(pre, np.float32) * 255
    masks = np.zeros(pre, np.int32)
    masks[10:30, 10:30, 2:6] = 1
    pts = np.zeros((64, 3), np.float32)
    ids = np.zeros((64,), np.int32)
    pts[:n_pts] = np.stack(
        [np.linspace(12, 28, n_pts), np.full(n_pts, 20.0), np.full(n_pts, 4.0)], 1
    )
    ids[:n_pts] = 1
    return {
        "image": jnp.asarray(image),
        "masks": jnp.asarray(masks),
        "points": jnp.asarray(pts),
        "ids": jnp.asarray(ids),
        "center": jnp.asarray([20.0, 20.0, 4.0]),
    }


def _no_aug_cfg():
    return small_cfg(
        ELASTIC_RATE=0.0, AFFINE_RATE=0.0, FLIP_RATE=0.0, BRIGHTNESS_RATE=0.0,
        CONTRAST_RATE=0.0, NOISE_RATE=0.0, INVERT_RATE=0.0,
    )


class TestAugmentShapes:
    def test_output_contract(self):
        cfg = small_cfg()
        aug = make_augment(cfg, 128.0, 64.0)
        out = aug(jax.random.PRNGKey(0), _sample())
        assert out["image"].shape == (32, 32, 8, 1)
        assert out["masks"].shape == (32, 32, 8, 1)
        assert out["baked"].shape == (32, 32, 8, 3)
        assert out["skele_masks"].shape == (32, 32, 8, 1)

    def test_batch_augment(self):
        cfg = small_cfg()
        baug = make_batch_augment(cfg, 128.0, 64.0)
        s = _sample()
        batch = {k: jnp.stack([v, v]) for k, v in s.items()}
        out = baug(jax.random.PRNGKey(0), batch)
        assert out["image"].shape == (2, 32, 32, 8, 1)
        # two different keys -> (almost surely) different augmentations
        assert not np.allclose(np.asarray(out["image"][0]), np.asarray(out["image"][1]))


class TestNoAugIdentity:
    def test_identity_geometry(self):
        """With all rates 0, the pipeline is exactly crop + normalize."""
        cfg = _no_aug_cfg()
        aug = make_augment(cfg, 0.0, 1.0)
        s = _sample()
        out = aug(jax.random.PRNGKey(0), s)
        # crop origin = center - crop/2 = (4, 4, 0)
        expected = np.asarray(s["image"])[4:36, 4:36, 0:8]
        # rtol covers the (x - mean)*1 + mean float round-trip of the
        # (gated-off) contrast op
        np.testing.assert_allclose(
            np.asarray(out["image"])[..., 0], expected, rtol=2e-3
        )
        expected_m = (np.asarray(s["masks"])[4:36, 4:36, 0:8] > 0).astype(np.float32)
        np.testing.assert_array_equal(np.asarray(out["masks"])[..., 0], expected_m)

    def test_baked_points_in_crop_coords(self):
        cfg = _no_aug_cfg()
        aug = make_augment(cfg, 0.0, 1.0)
        out = aug(jax.random.PRNGKey(0), _sample())
        baked = np.asarray(out["baked"])
        masks = np.asarray(out["masks"])[..., 0]
        # inside the object, baked coords point at skeleton line y=16 (20-4)
        assert masks[16, 16, 4] == 1
        np.testing.assert_allclose(baked[16, 16, 4, 1], 16.0, atol=1.5)
        np.testing.assert_allclose(baked[16, 16, 4, 2], 4.0, atol=1.5)

    def test_skele_mask_painted(self):
        cfg = _no_aug_cfg()
        aug = make_augment(cfg, 0.0, 1.0)
        out = aug(jax.random.PRNGKey(0), _sample())
        sm = np.asarray(out["skele_masks"])[..., 0]
        assert sm[16, 16, 4] == 1  # on the skeleton line (after crop offset)
        assert sm.sum() > 0


class TestFlips:
    def test_flip_consistency(self):
        """Flipped volume and flipped points must stay aligned: re-derive the
        skeleton mask and compare against the flipped unflipped one."""
        cfg = small_cfg(
            ELASTIC_RATE=0.0, AFFINE_RATE=0.0, FLIP_RATE=1.0, BRIGHTNESS_RATE=0.0,
            CONTRAST_RATE=0.0, NOISE_RATE=0.0, INVERT_RATE=0.0,
        )
        cfg0 = _no_aug_cfg()
        s = _sample()
        out_flip = make_augment(cfg, 0.0, 1.0)(jax.random.PRNGKey(3), s)
        out_base = make_augment(cfg0, 0.0, 1.0)(jax.random.PRNGKey(3), s)
        base_sm = np.asarray(out_base["skele_masks"])[..., 0]
        flip_sm = np.asarray(out_flip["skele_masks"])[..., 0]
        # all three axes flipped with rate 1.0
        np.testing.assert_array_equal(flip_sm, base_sm[::-1, ::-1, ::-1])
        base_img = np.asarray(out_base["image"])[..., 0]
        flip_img = np.asarray(out_flip["image"])[..., 0]
        np.testing.assert_allclose(flip_img, base_img[::-1, ::-1, ::-1], rtol=1e-5)


class TestIntensity:
    def test_invert(self):
        cfg = small_cfg(
            ELASTIC_RATE=0.0, AFFINE_RATE=0.0, FLIP_RATE=0.0, BRIGHTNESS_RATE=0.0,
            CONTRAST_RATE=0.0, NOISE_RATE=0.0, INVERT_RATE=1.0,
        )
        cfg0 = _no_aug_cfg()
        s = _sample()
        inv = make_augment(cfg, 0.0, 1.0)(jax.random.PRNGKey(0), s)
        base = make_augment(cfg0, 0.0, 1.0)(jax.random.PRNGKey(0), s)
        np.testing.assert_allclose(
            np.asarray(inv["image"]), 255.0 - np.asarray(base["image"]), atol=1e-4
        )

    def test_normalization(self):
        cfg = _no_aug_cfg()
        aug = make_augment(cfg, 100.0, 50.0)
        aug0 = make_augment(cfg, 0.0, 1.0)
        s = _sample()
        a = np.asarray(aug(jax.random.PRNGKey(0), s)["image"])
        b = np.asarray(aug0(jax.random.PRNGKey(0), s)["image"])
        np.testing.assert_allclose(a, (b - 100.0) / 50.0, rtol=1e-5)


class TestElasticAffine:
    def test_elastic_keeps_points_near_mask(self):
        cfg = small_cfg(
            ELASTIC_RATE=1.0, AFFINE_RATE=0.0, FLIP_RATE=0.0, BRIGHTNESS_RATE=0.0,
            CONTRAST_RATE=0.0, NOISE_RATE=0.0, INVERT_RATE=0.0,
        )
        out = make_augment(cfg, 0.0, 1.0)(jax.random.PRNGKey(7), _sample())
        sm = np.asarray(out["skele_masks"])[..., 0]
        m = np.asarray(out["masks"])[..., 0]
        # skeleton stamp must still overlap the (co-deformed) object
        inter = (sm > 0) & (m > 0)
        assert inter.sum() / max((sm > 0).sum(), 1) > 0.5

    def test_affine_rotation_consistency(self):
        cfg = small_cfg(
            ELASTIC_RATE=0.0, AFFINE_RATE=1.0, FLIP_RATE=0.0, BRIGHTNESS_RATE=0.0,
            CONTRAST_RATE=0.0, NOISE_RATE=0.0, INVERT_RATE=0.0,
            AFFINE_YAW=[90, 90], AFFINE_SHEAR=[0, 0], AFFINE_SCALE=[1.0, 1.0],
        )
        out = make_augment(cfg, 0.0, 1.0)(jax.random.PRNGKey(0), _sample())
        sm = np.asarray(out["skele_masks"])[..., 0]
        m = np.asarray(out["masks"])[..., 0]
        inter = (sm > 0) & (m > 0)
        assert inter.sum() / max((sm > 0).sum(), 1) > 0.5
        # 90-degree rotation: the line along x becomes a line along y
        xs, ys = np.nonzero(sm[:, :, 4])
        assert len(xs) == 0 or xs.std() < ys.std()
