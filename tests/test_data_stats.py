"""Dataset statistics + background-sample parity (reference
dataloader.py:246-310, engine.py:188, merged_transform.py:1075-1118)."""

import numpy as np
import pytest
import yaml

from skoots_tpu.config import get_cfg_defaults
from skoots_tpu.train.data import MultiDataset, SkootsDataset
from skoots_tpu.train.generate_skeletons import save_skeletons
from skoots_tpu.utils.io import imsave
from skoots_tpu.utils.synthetic import make_tubes


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("stats_data")
    for i in range(2):
        img, labels, skels = make_tubes(shape=(48, 48, 8), n_tubes=2, seed=i)
        imsave(str(d / f"v{i}.tif"), img)
        imsave(str(d / f"v{i}.labels.tif"), labels)
        save_skeletons(str(d / f"v{i}.skeletons.npz"), skels)
    return str(d)


@pytest.fixture(scope="module")
def bg_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("bg_data")
    img, _, _ = make_tubes(shape=(48, 48, 8), n_tubes=0, seed=7)
    imsave(str(d / "bg.tif"), img)
    return str(d)


def _cfg(**train_overrides):
    cfg = get_cfg_defaults()
    cfg.AUGMENTATION.CROP_WIDTH = 32
    cfg.AUGMENTATION.CROP_HEIGHT = 32
    cfg.AUGMENTATION.CROP_DEPTH = 8
    for k, v in train_overrides.items():
        setattr(cfg.TRAIN, k, v)
    return cfg


class TestStats:
    def test_raw_moments_match_numpy(self, data_dir):
        ds = SkootsDataset(data_dir, _cfg())
        mean, std = ds.mean_std()
        vols = np.concatenate([r.image.ravel() for r in ds.records])
        assert mean == pytest.approx(vols.mean(), rel=1e-6)
        assert std == pytest.approx(vols.std(), rel=1e-4)

    def test_with_invert_folds_inverted_copies(self, data_dir):
        """mean over {x} U {255-x} is exactly 127.5; std matches the direct
        two-population computation (the reference's own with_invert path
        drops terms — documented in mean_std's docstring)."""
        ds = SkootsDataset(data_dir, _cfg())
        mean, std = ds.mean_std(with_invert=True)
        vols = np.concatenate([r.image.ravel() for r in ds.records])
        both = np.concatenate([vols, 255.0 - vols])
        assert mean == pytest.approx(127.5, abs=1e-9)
        assert std == pytest.approx(both.std(), rel=1e-4)

    def test_multidataset_combines(self, data_dir, bg_dir):
        a = SkootsDataset(data_dir, _cfg())
        b = SkootsDataset(bg_dir, _cfg(), background=True)
        multi = MultiDataset([a, b])
        mean, std = multi.mean_std()
        vols = np.concatenate(
            [r.image.ravel() for r in a.records + b.records]
        )
        assert mean == pytest.approx(vols.mean(), rel=1e-6)
        assert std == pytest.approx(vols.std(), rel=1e-4)

    def test_intensity_ceiling_16bit(self, tmp_path):
        img = (np.random.default_rng(0).random((32, 32, 4)) * 60000).astype(
            np.int32
        )
        imsave(str(tmp_path / "v.tif"), img)
        imsave(str(tmp_path / "v.labels.tif"),
               np.zeros((32, 32, 4), np.int32))
        save_skeletons(str(tmp_path / "v.skeletons.npz"), {})
        ds = SkootsDataset(str(tmp_path), _cfg())
        assert ds.intensity_ceiling() == 65535.0
        mean, _ = ds.mean_std(with_invert=True)
        assert mean == pytest.approx(65535.0 / 2)


class TestBackgroundMaskMode:
    def test_zeros_default(self, bg_dir):
        ds = SkootsDataset(bg_dir, _cfg(), background=True)
        s = ds.sample(np.random.default_rng(0))
        assert (s["masks"] == 0).all()

    def test_ones_reference_parity(self, bg_dir):
        ds = SkootsDataset(bg_dir, _cfg(BACKGROUND_MASK_MODE="ones"),
                           background=True)
        s = ds.sample(np.random.default_rng(0))
        assert (s["masks"] == 1).all()

    def test_loss_consequence(self, bg_dir):
        """The semantic tversky target flips between all-negative and
        all-positive — the training-semantics difference the switch
        controls."""
        import jax.numpy as jnp

        from skoots_tpu.train.losses import tversky

        loss = tversky(0.5, 0.5)
        pred = jnp.full((8, 8, 4, 1), 0.9)
        zeros_target = jnp.zeros((8, 8, 4, 1))
        ones_target = jnp.ones((8, 8, 4, 1))
        l0 = float(loss(pred[None], zeros_target[None]))
        l1 = float(loss(pred[None], ones_target[None]))
        # confident foreground prediction: heavily penalized under 'zeros',
        # nearly free under 'ones'
        assert l0 > 0.9 and l1 < 0.2
