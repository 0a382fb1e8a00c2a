"""Validation metrics tests with hand-computable cases + CLI artifact test."""

import os

import numpy as np
import pytest

from skoots_tpu.validate import (
    accuracies_from_iou,
    box_iou,
    f1_score,
    get_segmentation_errors,
    mask_dice,
    mask_iou,
    mask_to_bbox,
)
from skoots_tpu.validate.stats import (
    get_parameter_count,
    get_surface_area,
    get_volume,
    stats_per_instance,
)


def _two_cubes():
    gt = np.zeros((20, 20, 8), np.int32)
    gt[2:6, 2:6, 2:6] = 1  # 64 voxels
    gt[10:14, 10:14, 2:6] = 2
    return gt


class TestMaskIoU:
    def test_perfect_match_identity(self):
        gt = _two_cubes()
        iou = mask_iou(gt, gt)
        np.testing.assert_allclose(iou, np.eye(2), atol=1e-9)

    def test_half_overlap(self):
        gt = _two_cubes()
        pred = np.zeros_like(gt)
        pred[2:6, 2:6, 2:4] = 7  # half of object 1 (32 of 64)
        iou = mask_iou(gt, pred)
        assert iou.shape == (2, 1)
        np.testing.assert_allclose(iou[0, 0], 32 / 64, rtol=1e-6)
        assert iou[1, 0] == 0

    def test_dice(self):
        gt = _two_cubes()
        pred = np.zeros_like(gt)
        pred[2:6, 2:6, 2:4] = 7
        dice = mask_dice(gt, pred)
        np.testing.assert_allclose(dice[0, 0], 2 * 32 / (64 + 32), rtol=1e-6)

    def test_nonsequential_ids(self):
        gt = _two_cubes() * 37
        pred = _two_cubes() * 1001
        iou = mask_iou(gt, pred)
        np.testing.assert_allclose(iou, np.eye(2), atol=1e-9)


class TestAccuracies:
    def test_tp_fp_fn(self):
        iou = np.array([[0.9, 0.0], [0.0, 0.05], [0.0, 0.0]])
        tp, fp, fn = accuracies_from_iou(iou, thr=0.5)
        assert (tp, fp, fn) == (1, 1, 2)
        assert f1_score(tp, fp, fn) == pytest.approx(2 / (2 + 1 + 2))

    def test_empty(self):
        tp, fp, fn = accuracies_from_iou(np.zeros((0, 3)))
        assert (tp, fp, fn) == (0, 3, 0)


class TestSegErrors:
    def test_oversegmentation(self):
        gt = np.zeros((20, 20, 4), np.int32)
        gt[2:18, 2:10, :] = 1
        pred = np.zeros_like(gt)
        pred[2:10, 2:10, :] = 1  # split into two halves
        pred[10:18, 2:10, :] = 2
        over, under = get_segmentation_errors(gt, pred)
        assert over == 1.0 and under == 0.0
        o2, u2 = get_segmentation_errors(pred, gt)
        assert o2 == 0.0 and u2 == 1.0


class TestBoxes:
    def test_bbox_and_iou(self):
        gt = _two_cubes()
        bb = mask_to_bbox(gt)
        np.testing.assert_array_equal(bb[1], [2, 2, 2, 6, 6, 6])
        iou = box_iou(np.stack(list(bb.values())), np.stack(list(bb.values())))
        np.testing.assert_allclose(iou, np.eye(2), atol=1e-9)


class TestStats:
    def test_volume_and_area_cube(self):
        m = np.zeros((10, 10, 10), np.int32)
        m[2:6, 2:6, 2:6] = 3
        assert get_volume(m) == {3: 64}
        assert get_surface_area(m) == {3: 6 * 16}
        s = stats_per_instance(m)
        assert s[3]["volume"] == 64 and s[3]["surface_area"] == 96

    def test_param_count(self):
        import jax.numpy as jnp

        params = {"a": jnp.zeros((3, 4)), "b": {"c": jnp.zeros(5)}}
        assert get_parameter_count(params) == 17


class TestValidateCLI:
    def test_end_to_end_artifacts(self, tmp_path):
        from skoots_tpu.utils.io import imsave
        from skoots_tpu.validate.cli import main

        gt = _two_cubes()
        pred = np.zeros_like(gt)
        pred[2:6, 2:6, 2:6] = 12
        pred[10:14, 10:13, 2:6] = 5
        g = str(tmp_path / "gt.tif")
        p = str(tmp_path / "pred.tif")
        imsave(g, gt)
        imsave(p, pred)
        rc = main(["-g", g, "-p", p, "--margin", "0", "0", "0", "--no-plots"])
        assert rc == 0
        stem = os.path.splitext(p)[0]
        assert os.path.exists(stem + "_accuracy_stats.csv")
        assert os.path.exists(stem + "_intersection_over_union.csv")
        txt = open(stem + "_intersection_over_union.csv").read()
        assert "Average IOU: 1.0" not in txt  # object 2 is imperfect
        lines = open(stem + "_accuracy_stats.csv").read().splitlines()
        assert lines[4].startswith("thr,")
        assert len(lines) == 105  # 4 header + title + 100 thresholds
