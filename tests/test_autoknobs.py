"""Data-derived dilation knobs (infer/autoknobs.py).

The reference hard-codes the phase-1 dilation stack
(/root/reference/skoots/lib/eval.py:152-157); the round-3 campaign proved
that constant is regime-dependent. These tests pin the measurement
(skeleton spacing) and the derivation rule to the regimes the campaign
exercised: widely separated -> the reference default, touching/aniso ->
in-plane-only single step, crowded -> reduced stack.
"""

import numpy as np
import pytest

from skoots_tpu.infer.autoknobs import (
    REFERENCE_STACK,
    derive_dilation,
    estimate_object_radius,
    estimate_skeleton_gap,
    suggest_dist_thr,
)


def _two_bars(gap: int, shape=(64, 64, 16), thick=1):
    """Two parallel X-axis skeleton bars ``gap`` voxels apart in Y."""
    v = np.zeros(shape, np.uint8)
    y0 = shape[1] // 2 - gap // 2
    v[8:56, y0 - thick + 1 : y0 + 1, 4:12] = 1
    v[8:56, y0 + gap : y0 + gap + thick, 4:12] = 1
    return v


class TestGapEstimate:
    def test_measures_bar_spacing(self):
        # nearest-voxel distance between the bars is exactly the gap
        g = estimate_skeleton_gap(_two_bars(8))
        assert g == pytest.approx(8.0)

    def test_empty_and_single_component_give_none(self):
        assert estimate_skeleton_gap(np.zeros((16, 16, 8), np.uint8)) is None
        one = np.zeros((32, 32, 8), np.uint8)
        one[4:28, 15:17, 2:6] = 1
        assert estimate_skeleton_gap(one) is None

    def test_fragments_are_not_separation_evidence(self):
        # a single instance whose prediction broke into crumbs must not
        # masquerade as two instances (dilation exists to re-attach these)
        v = np.zeros((64, 64, 16), np.uint8)
        v[8:30, 31:33, 4:8] = 1  # one sizeable piece
        v[33, 32, 5] = 1  # 1-voxel crumb 3 away
        v[36:38, 32, 5] = 1  # 2-voxel crumb
        assert estimate_skeleton_gap(v) is None

    def test_anisotropy_scales_z_distances(self):
        # two slabs 4 voxels apart in z: with 3x-coarse z the spacing is
        # 12 in-plane-equivalent units
        v = np.zeros((32, 32, 16), np.uint8)
        v[4:28, 4:28, 3:5] = 1
        v[4:28, 4:28, 8:10] = 1
        assert estimate_skeleton_gap(v) == pytest.approx(4.0)
        assert estimate_skeleton_gap(v, (1, 1, 3)) == pytest.approx(12.0)


class TestDeriveDilation:
    def test_no_evidence_is_reference_default(self):
        assert derive_dilation(None) == REFERENCE_STACK == (1, 2)

    def test_separated_regime_reaches_reference_default(self):
        # wide spacing: full radius-3 stack, one 3D pass on isotropic data
        assert derive_dilation(10.0) == (1, 2)

    def test_touching_regime_single_inplane(self):
        # campaign 'touching'/'aniso' knob: spacing ~4 -> (0, 1)
        assert derive_dilation(4.0) == (0, 1)
        assert derive_dilation(5.0) == (0, 1)

    def test_crowded_regime_reduced_stack(self):
        # campaign 'blobs' knob: spacing ~6-7 -> total 2, isotropic (1, 1)
        assert derive_dilation(6.0) == (1, 1)
        assert derive_dilation(7.0) == (1, 1)

    def test_anisotropic_never_spends_the_3d_pass(self):
        assert derive_dilation(10.0, (1, 1, 3)) == (0, 3)
        assert derive_dilation(6.0, (1, 1, 3)) == (0, 2)

    def test_safety_bound_never_bridges(self):
        # the derived total in-plane radius r must satisfy 2r + 1 < gap
        # for every gap with separation evidence above the repair floor
        for gap in range(5, 20):
            d3, d2 = derive_dilation(float(gap))
            assert 2 * (d3 + d2) + 1 < gap


class TestRadiusAndDistThr:
    def test_ball_radius_recovered(self):
        from scipy import ndimage

        v = np.zeros((48, 48, 48), bool)
        v[24, 24, 24] = True
        v = ndimage.distance_transform_edt(~v) <= 10
        labels = v.astype(np.int32)
        r = estimate_object_radius(labels, {1: np.array([[24, 24, 24]])})
        assert r == pytest.approx(10.0, abs=1.0)
        assert suggest_dist_thr(r) == pytest.approx(10.0, abs=1.0)

    def test_empty_gives_none(self):
        assert estimate_object_radius(np.zeros((8, 8, 8), np.int32)) is None
        assert suggest_dist_thr(None) is None


class TestDistThrFromPoints:
    def test_half_min_inter_instance_spacing(self):
        from skoots_tpu.infer.autoknobs import suggest_dist_thr_from_points

        skels = {
            1: np.array([[10.0, 10, 5], [20, 10, 5]]),
            2: np.array([[10.0, 22, 5], [20, 22, 5]]),
        }
        # nearest cross-instance points are 12 apart -> suggest 6
        assert suggest_dist_thr_from_points(skels) == pytest.approx(6.0)

    def test_single_instance_gives_none(self):
        from skoots_tpu.infer.autoknobs import suggest_dist_thr_from_points

        assert suggest_dist_thr_from_points({1: np.zeros((4, 3))}) is None
        assert suggest_dist_thr_from_points({}) is None


class TestSemanticCalibration:
    def test_target_fg_fraction_ball(self):
        import math

        from skoots_tpu.infer.autoknobs import sparse_target_fg_fraction

        frac = sparse_target_fg_fraction(
            {1: np.array([[16, 16, 16]])}, (32, 32, 32), 3.0
        )
        expect = (4 / 3 * math.pi * 27) / 32**3
        assert frac == pytest.approx(expect, rel=0.25)
        assert sparse_target_fg_fraction({}, (8, 8, 8), 3.0) is None

    def test_quantile_matching(self):
        from skoots_tpu.infer.autoknobs import calibrate_semantic_threshold

        probs = np.concatenate([np.full(9000, 0.01), np.full(1000, 0.98)])
        thr = calibrate_semantic_threshold(probs, 0.1)
        assert 0.5 <= thr < 0.98  # keeps exactly the top decile
        # clamp: a degenerate target can never disable the gate
        assert calibrate_semantic_threshold(probs, 1e-12) <= 0.9999

    def test_histogram_valley_between_clusters(self):
        """Fat-ring continuum below a saturated foreground cluster (the
        measured sparse-checkpoint shape, runs/accuracy/sparse/
        calibration.json): the threshold must land between them."""
        from skoots_tpu.infer.autoknobs import (
            calibrate_semantic_threshold_from_histogram,
        )

        rng = np.random.default_rng(0)
        ring_logit = rng.uniform(0.5, 6.0, 30000)  # decaying continuum
        fg_logit = rng.normal(14.0, 1.0, 12000)  # saturated cluster
        probs = 1 / (1 + np.exp(-np.concatenate([ring_logit, fg_logit])))
        bg = rng.uniform(0.0, 0.3, 500000)  # below the lo cut, ignored
        thr = calibrate_semantic_threshold_from_histogram(
            np.concatenate([probs, bg])
        )
        ring_max = 1 / (1 + np.exp(-6.0))
        fg_min = 1 / (1 + np.exp(-10.0))
        assert ring_max < thr < fg_min

    def test_histogram_none_without_evidence(self):
        from skoots_tpu.infer.autoknobs import (
            calibrate_semantic_threshold_from_histogram,
        )

        assert calibrate_semantic_threshold_from_histogram(
            np.full(100000, 0.01)
        ) is None
        assert calibrate_semantic_threshold_from_histogram(
            np.array([0.9] * 10)
        ) is None


class TestDatasetObjectRadius:
    def test_tube_radius_recovered(self, tmp_path):
        """SkootsDataset.object_radius() recovers the synthetic tube radius
        and it travels into the checkpoint via train(..., object_radius=...)."""
        from skoots_tpu.config import get_cfg_defaults
        from skoots_tpu.train.data import SkootsDataset
        from skoots_tpu.train.generate_skeletons import save_skeletons
        from skoots_tpu.utils.io import imsave
        from skoots_tpu.utils.synthetic import make_tubes

        img, labels, skels = make_tubes(shape=(64, 64, 16), n_tubes=2,
                                        radius=4, seed=3)
        d = tmp_path / "data"
        d.mkdir()
        imsave(str(d / "v.tif"), img)
        imsave(str(d / "v.labels.tif"), labels)
        save_skeletons(str(d / "v.skeletons.npz"), skels)
        cfg = get_cfg_defaults()
        cfg.AUGMENTATION.CROP_WIDTH = 32
        cfg.AUGMENTATION.CROP_HEIGHT = 32
        cfg.AUGMENTATION.CROP_DEPTH = 8
        ds = SkootsDataset(str(d), cfg, sample_per_image=1)
        r = ds.object_radius()
        assert r is not None and 2.0 <= r <= 6.0
