"""Accessory utility tests: 2D stitch mode, renumber, margins, viz, convert."""

import numpy as np
import pytest
from scipy import ndimage

from skoots_tpu.utils.flood_and_stitch import watershed_and_stitch
from skoots_tpu.utils.io import imread, imsave
from skoots_tpu.utils.remove_margin import remove_margin
from skoots_tpu.utils.renumber import load_renumber_save


class TestWatershedAndStitch:
    def test_matches_3d_components_for_columns(self):
        # vertical columns: per-slice labels must stitch into single objects
        x = np.zeros((32, 32, 6), np.uint8)
        x[4:10, 4:10, :] = 1
        x[20:28, 20:26, :] = 1
        out = watershed_and_stitch(x, dim=2)
        assert len(np.unique(out)) - 1 == 2
        assert len(np.unique(out[4:10, 4:10, :])) == 1

    def test_diagonal_only_in_slice_split(self):
        # two blobs that never overlap across slices stay separate
        x = np.zeros((16, 16, 2), np.uint8)
        x[2:5, 2:5, 0] = 1
        x[10:13, 10:13, 1] = 1
        out = watershed_and_stitch(x, dim=2)
        assert len(np.unique(out)) - 1 == 2

    def test_majority_overlap_merges(self, rng):
        x = (rng.random((24, 24, 8)) > 0.6).astype(np.uint8)
        out = watershed_and_stitch(x, dim=2)
        # stitched labels must be a coarsening of per-slice 2D labels and
        # consistent: every output id maps from >=1 slice component
        assert out[x == 0].sum() == 0
        assert (out[x > 0] > 0).all()

    def test_single_slice(self):
        x = np.zeros((8, 8, 1), np.uint8)
        x[1:3, 1:3, 0] = 1
        out = watershed_and_stitch(x, dim=2)
        assert len(np.unique(out)) - 1 == 1


class TestFileUtils:
    def test_renumber_file(self, tmp_path):
        m = np.zeros((16, 16, 4), np.int32)
        m[2:4, 2:4] = 17
        m[8:10, 8:10] = 90
        p = str(tmp_path / "m.tif")
        imsave(p, m)
        load_renumber_save(p)
        out = imread(p)
        assert set(np.unique(out)) == {0, 1, 2}

    def test_remove_margin(self, tmp_path):
        v = np.arange(20 * 20 * 8, dtype=np.int32).reshape(20, 20, 8)
        p = str(tmp_path / "v.tif")
        imsave(p, v)
        dest = remove_margin(p, margin=(5, 5, 2))
        out = imread(dest)
        np.testing.assert_array_equal(out, v[5:-5, 5:-5, 2:-2])

    def test_remove_margin_too_large(self, tmp_path):
        v = np.zeros((8, 8, 4), np.int32)
        p = str(tmp_path / "v.tif")
        imsave(p, v)
        with pytest.raises(AssertionError, match="margin"):
            remove_margin(p, margin=(5, 5, 2))


class TestViz:
    def test_write_progress_panels(self):
        from skoots_tpu.train.viz import flow_to_image, write_progress

        b, x, y, z = 1, 16, 16, 8
        rng = np.random.default_rng(0)
        grid = write_progress(
            None, "t", 0,
            images=rng.random((b, x, y, z, 1)),
            masks=(rng.random((b, x, y, z, 1)) > 0.5).astype(np.float32),
            vector=rng.random((b, x, y, z, 3)) * 2 - 1,
            embed_prob=rng.random((b, x, y, z, 1)),
            predicted_skeleton=rng.random((b, x, y, z, 1)),
            gt_skeleton=(rng.random((b, x, y, z, 1)) > 0.8).astype(np.float32),
        )
        assert grid.shape == (x * 7, y, 3)
        f = flow_to_image(rng.random((8, 8, 2)).astype(np.float32))
        assert f.shape == (8, 8, 3) and f.dtype == np.uint8


class TestDevicePhantom:
    """tube_segments + render_tubes: the bench's on-device phantom. Only
    ~n*6 floats cross the host->device wire; the rendered volume must
    contain exactly n_placed well-separated tubes (bench.py records the
    pipeline's recovered instance count against this)."""

    def test_render_matches_placement(self):
        import jax

        from skoots_tpu.utils.synthetic import render_tubes, tube_segments

        shape = (96, 96, 32)
        p0, p1, n = tube_segments(shape, 6, radius=4.0, seed=7)
        assert n == 6 and p0.shape == (6, 3) and p1.shape == (6, 3)
        img = np.asarray(
            jax.jit(lambda a, b: render_tubes(shape, a, b, radius=4.0))(p0, p1)
        )
        assert img.shape == shape and img.dtype == np.float32
        assert 0.0 <= img.min() and img.max() <= 255.0
        # foreground fraction is plausible for 6 radius-4 tubes
        fg = img > 100.0
        assert 0.01 < fg.mean() < 0.2
        # separation guarantee: exactly n connected components
        _, ncc = ndimage.label(fg)
        assert ncc == n

    def test_segments_are_separated(self):
        from skoots_tpu.utils.synthetic import tube_segments

        p0, p1, n = tube_segments((128, 128, 64), 8, radius=5.0,
                                  seed=3, min_separation=14.0)
        # sampled centerline-to-centerline distance respects the bound
        for i in range(n):
            for j in range(i + 1, n):
                t = np.linspace(0, 1, 64)[:, None]
                a = p0[i] * (1 - t) + p1[i] * t
                b = p0[j] * (1 - t) + p1[j] * t
                d = np.linalg.norm(a[:, None] - b[None, :], axis=-1).min()
                assert d >= 14.0 - 1e-3


class TestEMRealism:
    """apply_em_realism degrades the image, never the ground truth."""

    def test_properties(self):
        from skoots_tpu.utils.synthetic import apply_em_realism, make_tubes

        img, labels, _ = make_tubes(shape=(64, 64, 16), n_tubes=3, seed=3)
        hard = apply_em_realism(img, labels, seed=9)
        assert hard.shape == img.shape and hard.dtype == np.uint8
        fg = labels > 0
        # instance contrast survives the degradation stack
        assert hard[fg].mean() - hard[~fg].mean() > 40
        # but the image is genuinely harder: background is no longer
        # near-uniform (distractor sheets + texture + gradient)
        assert hard[~fg].std() > np.asarray(img)[~fg].std() + 2
        # distractor sheets put near-foreground intensities in the bg
        memb = (hard > 100) & ~fg
        assert memb.mean() > 0.002

    def test_labels_untouched_and_deterministic(self):
        from skoots_tpu.utils.synthetic import apply_em_realism, make_tubes

        img, labels, _ = make_tubes(shape=(48, 48, 12), n_tubes=2, seed=5)
        before = labels.copy()
        a = apply_em_realism(img, labels, seed=1)
        b = apply_em_realism(img, labels, seed=1)
        np.testing.assert_array_equal(labels, before)
        np.testing.assert_array_equal(a, b)
        c = apply_em_realism(img, labels, seed=2)
        assert (a != c).any()
