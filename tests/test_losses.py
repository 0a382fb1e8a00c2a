"""Loss and sigma-schedule tests with hand-computed golden values."""

import jax.numpy as jnp
import numpy as np
import pytest

from skoots_tpu.config import get_cfg_defaults
from skoots_tpu.train import (
    Sigma,
    cfg_loss,
    dice,
    init_sigma,
    jaccard,
    soft_cldice,
    soft_skeletonize,
    tversky,
)


class TestTversky:
    def test_perfect_prediction_near_zero(self):
        gt = np.zeros((1, 4, 4, 4, 1), np.float32)
        gt[0, 1:3, 1:3, 1:3, 0] = 1
        loss = tversky(alpha=0.5, beta=0.5)(jnp.asarray(gt), jnp.asarray(gt))
        assert float(loss) < 1e-5

    def test_worst_prediction_is_one(self):
        gt = np.zeros((1, 4, 4, 4, 1), np.float32)
        gt[0, :2] = 1
        pred = 1 - gt
        loss = tversky(alpha=0.5, beta=0.5)(jnp.asarray(pred), jnp.asarray(gt))
        assert float(loss) > 0.999

    def test_alpha_beta_asymmetry(self):
        gt = np.zeros((1, 4, 4, 4, 1), np.float32)
        gt[0, :2] = 1
        over = np.ones_like(gt)  # all false positives on the bg half
        under = gt * 0.5  # false negatives
        # alpha >> beta punishes over-prediction more
        l_fp = tversky(alpha=2.0, beta=0.1)(jnp.asarray(over), jnp.asarray(gt))
        l_fp2 = tversky(alpha=0.1, beta=2.0)(jnp.asarray(over), jnp.asarray(gt))
        assert float(l_fp) > float(l_fp2)

    def test_golden_value(self):
        # 1 voxel gt, pred = 0.5 everywhere over 8 voxels
        gt = np.zeros((1, 2, 2, 2, 1), np.float32)
        gt[0, 0, 0, 0, 0] = 1
        pred = np.full_like(gt, 0.5)
        a, b = 0.25, 0.75
        tp = 0.5
        fp = (0.5 * 7 + 1e-10) * a
        fn = 0.5 * b
        expected = 1 - (tp + 1e-8) / (tp + fp + fn + 1e-8)
        loss = tversky(alpha=a, beta=b)(jnp.asarray(pred), jnp.asarray(gt))
        np.testing.assert_allclose(float(loss), expected, rtol=1e-5)

    def test_batch_mean(self):
        gt = np.zeros((2, 2, 2, 2, 1), np.float32)
        gt[0] = 1  # item 0 perfect, item 1 empty-gt
        pred = gt.copy()
        loss = tversky(0.5, 0.5)(jnp.asarray(pred), jnp.asarray(gt))
        assert float(loss) < 0.5  # mean over items


class TestDiceJaccard:
    def test_dice_golden(self):
        gt = np.zeros((1, 2, 2, 2, 1), np.float32)
        gt[0, 0] = 1  # 4 voxels
        pred = np.zeros_like(gt)
        pred[0, 0, 0] = 1  # 2 voxels, all inside gt
        # dice = 2*2/(2+4) = 2/3 -> loss 1/3
        loss = dice()(jnp.asarray(pred), jnp.asarray(gt))
        np.testing.assert_allclose(float(loss), 1 / 3, rtol=1e-5)

    def test_jaccard_golden(self):
        gt = np.zeros((1, 2, 2, 2, 1), np.float32)
        gt[0, 0] = 1
        pred = np.zeros_like(gt)
        pred[0, 0, 0] = 1
        # iou = 2/4 -> loss 0.5
        loss = jaccard()(jnp.asarray(pred), jnp.asarray(gt))
        np.testing.assert_allclose(float(loss), 0.5, rtol=1e-5)


class TestSoftClDice:
    def test_perfect_tube(self):
        gt = np.zeros((1, 16, 16, 8, 1), np.float32)
        gt[0, 6:10, 2:14, 3:5, 0] = 1
        loss = soft_cldice(iters=2)(jnp.asarray(gt), jnp.asarray(gt))
        assert float(loss) < 0.05

    def test_skeletonize_thins(self):
        x = np.zeros((1, 16, 16, 1, 1), np.float32)
        x[0, 4:12, 4:12, 0, 0] = 1
        skel = np.asarray(soft_skeletonize(jnp.asarray(x), 3))
        assert 0 < skel.sum() < x.sum()


class TestCfgLoss:
    def test_registry(self):
        fn = cfg_loss("tversky", ["alpha", "beta", "eps"], [0.25, 0.75, 1e-8])
        gt = jnp.ones((1, 2, 2, 2, 1))
        assert float(fn(gt, gt)) < 1e-5

    def test_unknown_raises(self):
        with pytest.raises(RuntimeError, match="unknown loss"):
            cfg_loss("focal", [], [])


class TestSigma:
    def test_reference_schedule(self):
        cfg = get_cfg_defaults()
        sigma = init_sigma(cfg)
        np.testing.assert_allclose(np.asarray(sigma(0)), [20.0, 20.0, 20.0])
        # after epoch 200 boundary: epochs < e means multiplier applies at 201
        np.testing.assert_allclose(
            np.asarray(sigma(201)), np.array([20.0] * 3) * 0.66, rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(sigma(801)), np.array([20.0] * 3) * 0.66**2, rtol=1e-6
        )

    def test_boundary_exclusive(self):
        s = Sigma([{"multiplier": 0.5, "epoch": 10}], initial_sigma=[1, 1, 1])
        np.testing.assert_allclose(np.asarray(s(10)), 1.0)  # epoch < e strict
        np.testing.assert_allclose(np.asarray(s(11)), 0.5)
