"""Out-of-core inference: disk-backed buffers, bounded host allocations.

The reference streams phase-1 outputs to zarr precisely so volumes larger
than RAM work (/root/reference/skoots/lib/eval.py:101-111). Here every
full-volume host buffer (input, vectors, skeleton, labels, instance mask)
is a memmap; tracemalloc-visible numpy allocations must stay far below the
volume footprint. (Device-side buffers live in HBM on TPU and are not part
of the host-RSS story.)
"""

import os
import tracemalloc

import jax
import numpy as np
import pytest

from skoots_tpu.config import get_cfg_defaults
from skoots_tpu.models import init_model
from skoots_tpu.ops.flood_fill import (
    efficient_flood_fill,
    remap_labels,
    remap_labels_inplace,
    renumber_inplace,
)
from skoots_tpu.train.checkpoint import save_checkpoint
from skoots_tpu.utils.io import open_outofcore
from skoots_tpu.utils.synthetic import make_tubes


class TestStreamingRelabel:
    def test_remap_inplace_matches_remap(self, rng):
        x = rng.integers(0, 50, (64, 32, 8)).astype(np.int32)
        keys = np.array([3, 7, 31], np.int64)
        vals = np.array([100, 200, 300], np.int64)
        want = remap_labels(x, keys, vals)
        got = x.copy()
        remap_labels_inplace(got, keys, vals, chunk=5)
        np.testing.assert_array_equal(got, want)

    def test_renumber_inplace(self, rng):
        x = (rng.integers(0, 5, (40, 16, 4)) * 17).astype(np.int32)
        orig = x.copy()
        n = renumber_inplace(x, chunk=7)
        assert n == len(np.unique(orig[orig != 0]))
        assert set(np.unique(x)) <= set(range(n + 1))
        # same partition: voxels equal-labeled before are equal-labeled after
        for u in np.unique(orig):
            assert len(np.unique(x[orig == u])) == 1

    def test_flood_fill_into_memmap(self, tmp_path, rng):
        vol = (rng.random((64, 64, 16)) > 0.9).astype(np.uint8)
        out = open_outofcore(str(tmp_path / "lab.npy"), vol.shape, "int32")
        got = efficient_flood_fill(vol, crop_size=(32, 32, 16), out=out)
        assert got is out
        want = efficient_flood_fill(vol, crop_size=(32, 32, 16))
        # identical partitions (labels may differ only by renaming)
        for u in np.unique(want):
            assert len(np.unique(np.asarray(got)[want == u])) == 1


@pytest.mark.slow
class TestOutOfCoreInference:
    def test_bounded_host_allocations(self, tmp_path):
        cfg = get_cfg_defaults()
        cfg.MODEL.DIMS = [4, 8, 16, 8, 4]
        cfg.MODEL.DEPTHS = [1] * 5
        cfg.MODEL.OUT_CHANNELS = 4
        cfg.MODEL.KERNEL_SIZE = 3
        model, params = init_model(cfg, jax.random.PRNGKey(0),
                                   spatial=(16, 16, 8))
        ckpt = str(tmp_path / "m.skoots")
        save_checkpoint(ckpt, cfg, params, dataset_mean=100.0,
                        dataset_std=50.0)

        # 224^3 u8 input; full in-RAM buffers would be ~180 MB (vec f16
        # 67 MB + labels/instance i32 2x45 MB + input 11 MB)
        shape = (224, 224, 224)
        img_path = str(tmp_path / "big.npy")
        img = open_outofcore(img_path, shape, "uint8")
        for i in range(0, shape[0], 32):
            blk, _, _ = make_tubes(shape=(32, *shape[1:]), n_tubes=3,
                                   seed=i)
            img[i : i + 32] = blk
        img.flush()
        del img

        from skoots_tpu.infer import run_inference

        tracemalloc.start()
        tracemalloc.reset_peak()
        # other tests in the same process may retain allocations; bound the
        # DELTA above the pre-existing baseline, not the absolute peak
        baseline = tracemalloc.get_traced_memory()[0]
        mask = run_inference(
            img_path, ckpt,
            crop_size=(64, 64, 32), overlap=(4, 4, 2),
            assign_crop_size=(112, 112, 56), assign_overlap=(4, 4, 2),
            embed_iterations=1, out_of_core=True,
            output_path=str(tmp_path / "out.npy"),
        )
        _, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        assert mask.shape == shape
        assert isinstance(mask, np.memmap)
        # host numpy allocations must stay far below the ~180 MB in-RAM
        # footprint: only tile-sized buffers may exist at once
        assert peak - baseline < 60e6, (
            f"peak host allocations {(peak - baseline)/1e6:.1f} MB"
        )
        for suffix in ("_skoots_vectors.npy", "_skoots_skeleton.npy",
                       "_skoots_labels.npy", "_skoots_instance.npy"):
            assert os.path.exists(str(tmp_path / ("big" + suffix)))
