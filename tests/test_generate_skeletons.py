"""GT skeletonization: EDT-ridge medial axis + TEASAR centerlines.

Covers the role of the reference's calculate_skeletons
(/root/reference/skoots/train/generate_skeletons.py:65-157) and its kimimaro
alternative _calculate_skeletons (:160-185).
"""

import numpy as np
import pytest

from skoots_tpu.train.generate_skeletons import (
    _teasar_points,
    calculate_skeletons,
    load_skeletons,
    save_skeletons,
)


def _tube(shape=(64, 32, 32), radius=3):
    vol = np.zeros(shape, bool)
    yy, zz = np.meshgrid(np.arange(shape[1]), np.arange(shape[2]), indexing="ij")
    cy, cz = shape[1] // 2, shape[2] // 2
    disk = (yy - cy) ** 2 + (zz - cz) ** 2 <= radius**2
    vol[8 : shape[0] - 8] = disk[None]
    return vol, (cy, cz)


class TestTeasar:
    def test_tube_centerline(self):
        vol, (cy, cz) = _tube()
        pts = _teasar_points(vol)
        assert pts.shape[0] >= 10
        # spans most of the tube's length
        assert pts[:, 0].min() <= 10 and pts[:, 0].max() >= 53
        # stays on-axis: mean radial offset under one voxel
        off = np.linalg.norm(pts[:, 1:] - [cy, cz], axis=1)
        assert off.mean() < 1.0

    def test_l_shape_covers_both_arms(self):
        vol = np.zeros((40, 40, 8), bool)
        vol[5:35, 5:10, 2:6] = True
        vol[30:35, 5:35, 2:6] = True
        pts = _teasar_points(vol)
        assert np.ptp(pts[:, 0]) >= 25 and np.ptp(pts[:, 1]) >= 25

    def test_empty_and_single_voxel(self):
        assert _teasar_points(np.zeros((4, 4, 4), bool)).shape == (0, 3)
        one = np.zeros((4, 4, 4), bool)
        one[1, 2, 3] = True
        np.testing.assert_array_equal(_teasar_points(one), [[1, 2, 3]])


class TestCalculateSkeletons:
    def test_method_dispatch_and_ids(self, tmp_path):
        m = np.zeros((32, 32, 8), np.int32)
        m[2:30, 4:10, 2:6] = 1
        m[2:10, 20:28, 2:6] = 5
        for method in ("medial", "teasar"):
            sk = calculate_skeletons(m, method=method)
            assert set(sk) == {1, 5}
            for pts in sk.values():
                assert pts.ndim == 2 and pts.shape[1] == 3 and pts.shape[0] > 0
        # points land inside their own instance
        sk = calculate_skeletons(m, method="teasar")
        for uid, pts in sk.items():
            ix = np.clip(np.round(pts).astype(int), 0, np.array(m.shape) - 1)
            assert (m[ix[:, 0], ix[:, 1], ix[:, 2]] == uid).mean() > 0.9
        save_skeletons(str(tmp_path / "t.skeletons.npz"), sk)
        back = load_skeletons(str(tmp_path / "t.skeletons.npz"))
        assert set(back) == {1, 5}

    def test_degenerate_centroid_fallback(self):
        m = np.zeros((8, 8, 8), np.int32)
        m[4, 4, 4] = 7
        for method in ("medial", "teasar"):
            sk = calculate_skeletons(m, method=method)
            np.testing.assert_allclose(sk[7], [[4, 4, 4]])

    def test_unknown_method(self):
        with pytest.raises(ValueError):
            calculate_skeletons(np.zeros((4, 4, 4), np.int32), method="nosuch")


class TestMedialThinning:
    """Round-2 ridge thinning: the medial cloud must be thin (near
    1-voxel-wide chain), central, and cover the object — the Lee-thinning
    quality bar (reference generate_skeletons.py:138)."""

    def test_tube_thin_and_central(self):
        from skoots_tpu.train.generate_skeletons import _medial_points

        vol, (cy, cz) = _tube()
        pts = _medial_points(vol)
        length = 64 - 16  # tube axis extent
        # thin: at most ~2 points per axis voxel (the raw ridge had dozens)
        assert 5 <= len(pts) <= 2 * length, len(pts)
        # central: mean radial offset under 1.5 voxels
        off = np.linalg.norm(pts[:, 1:] - [cy, cz], axis=1)
        assert off.mean() < 1.5
        # covers the axis
        assert pts[:, 0].min() <= 12 and pts[:, 0].max() >= 51

    def test_bake_quality_vs_true_skeletons(self):
        """Bake targets from the thinned cloud match the true generating
        polyline on synthetic tubes: every extracted point lies near the
        GT path and the path is densely covered."""
        from scipy.spatial import cKDTree

        from skoots_tpu.train.generate_skeletons import calculate_skeletons
        from skoots_tpu.utils.synthetic import make_tubes

        _, labels, true_skels = make_tubes(shape=(96, 96, 24), n_tubes=3,
                                           radius=4, seed=3)
        got = calculate_skeletons(labels, method="medial")
        for tid, path in true_skels.items():
            if tid not in got or not len(got[tid]):
                continue
            pts = got[tid]
            inside = path[
                np.all((path >= 0) & (path < [96, 96, 24]), axis=1)
            ]
            own = inside[labels[tuple(inside.astype(int).T)] == tid]
            if len(own) < 4:
                continue
            d_pt_to_path = cKDTree(own).query(pts)[0]
            # centrality: cloud hugs the generating path
            assert np.median(d_pt_to_path) < 3.0, np.median(d_pt_to_path)
            # coverage: the path is within reach of the cloud everywhere
            d_path_to_pt = cKDTree(pts).query(own)[0]
            assert d_path_to_pt.max() < 6.0, d_path_to_pt.max()
