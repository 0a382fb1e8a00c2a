"""Tests for on-device connected components + tiled seam-merging flood fill."""

import numpy as np
import jax.numpy as jnp
from scipy import ndimage

from skoots_tpu.ops import efficient_flood_fill, label_components
from skoots_tpu.ops.flood_fill import remap_labels, renumber


def _canon(labels: np.ndarray) -> np.ndarray:
    """Canonicalize labels (any bijective relabel works for partition checks)."""
    labels = np.asarray(labels)
    uniq, inv = np.unique(labels, return_inverse=True)
    out = inv.reshape(labels.shape).astype(np.int64)
    return out if (len(uniq) and uniq[0] == 0) else out + 1


class TestLabelComponents:
    def test_two_blobs(self):
        x = np.zeros((16, 16, 4), np.int32)
        x[1:4, 1:4, 1:3] = 1
        x[10:14, 10:14, 1:3] = 1
        lab = np.asarray(label_components(jnp.asarray(x)))
        ids = np.unique(lab[lab > 0])
        assert len(ids) == 2
        assert len(np.unique(lab[1:4, 1:4, 1:3])) == 1
        assert len(np.unique(lab[10:14, 10:14, 1:3])) == 1

    def test_matches_scipy_random(self, rng):
        x = (rng.random((24, 24, 8)) > 0.7).astype(np.int32)
        ours = _canon(np.asarray(label_components(jnp.asarray(x))))
        ref, _ = ndimage.label(x, structure=np.ones((3, 3, 3)))
        ref = _canon(ref)
        # same partition: bijection between label sets
        assert ours.max() == ref.max()
        pairs = np.unique(np.stack([ours[x > 0], ref[x > 0]], 1), axis=0)
        assert len(pairs) == ours.max()

    def test_long_snake(self):
        # a serpentine 1-voxel path exercises pointer jumping (long diameter)
        x = np.zeros((32, 32, 1), np.int32)
        for r in range(0, 32, 2):
            x[r, :, 0] = 1
        for i, r in enumerate(range(1, 31, 2)):  # connect row r-1 to r+1
            x[r, 31 if i % 2 == 0 else 0, 0] = 1
        lab = np.asarray(label_components(jnp.asarray(x)))
        assert len(np.unique(lab[x > 0])) == 1

    def test_connectivity_6(self):
        x = np.zeros((4, 4, 1), np.int32)
        x[0, 0, 0] = 1
        x[1, 1, 0] = 1  # diagonal touch: joined under 26, split under 6
        lab26 = np.asarray(label_components(jnp.asarray(x), connectivity=26))
        lab6 = np.asarray(label_components(jnp.asarray(x), connectivity=6))
        assert len(np.unique(lab26[x > 0])) == 1
        assert len(np.unique(lab6[x > 0])) == 2


class TestEfficientFloodFill:
    def test_merges_across_tiles(self, rng):
        x = (rng.random((64, 48, 12)) > 0.75).astype(np.int32)
        got = _canon(efficient_flood_fill(x, crop_size=(32, 32, 8)))
        ref, _ = ndimage.label(x, structure=np.ones((3, 3, 3)))
        ref = _canon(ref)
        assert got.max() == ref.max()
        pairs = np.unique(np.stack([got[x > 0], ref[x > 0]], 1), axis=0)
        assert len(pairs) == got.max()

    def test_single_component_spanning_all_tiles(self):
        x = np.zeros((64, 64, 8), np.int32)
        x[:, 32, 4] = 1  # a line through every x-tile
        out = efficient_flood_fill(x, crop_size=(16, 16, 8))
        assert len(np.unique(out[x > 0])) == 1

    def test_relabel_sequential(self):
        x = np.zeros((32, 32, 4), np.int32)
        x[1:3, 1:3, 1:3] = 1
        x[20:22, 20:22, 1:3] = 1
        out = efficient_flood_fill(x, relabel_sequential=True)
        assert set(np.unique(out)) == {0, 1, 2}

    def test_compact_mode_matches_and_bounds_labels(self, rng):
        """Compact mode (auto-on for >2^31 fast-path spans) must produce the
        same partition while keeping every label <= total component count —
        the int32-overflow fix for huge tiled volumes."""
        x = (rng.random((64, 48, 12)) > 0.75).astype(np.int32)
        fast = _canon(efficient_flood_fill(x, crop_size=(32, 32, 8),
                                           compact=False))
        comp = efficient_flood_fill(x, crop_size=(32, 32, 8), compact=True)
        ref, _ = ndimage.label(x, structure=np.ones((3, 3, 3)))
        assert comp.max() <= ref.max() * 4  # per-tile splits before merge
        got = _canon(comp)
        np.testing.assert_array_equal(fast > 0, got > 0)
        ref = _canon(ref)
        assert got.max() == ref.max()
        pairs = np.unique(np.stack([got[x > 0], ref[x > 0]], 1), axis=0)
        assert len(pairs) == got.max()


class TestWireThrift:
    def test_wire_thrift_matches_wide(self, rng):
        """Bit-packed H2D + uint16 D2H (wire_thrift, the default) must be a
        pure transfer encoding: identical partition to wide transfers, on
        both a packable (z%8==0) and an unpackable tile z."""
        for shape, crop in (((64, 48, 16), (32, 32, 8)),
                            ((48, 48, 12), (32, 32, 12)),
                            ((48, 48, 10), (32, 32, 6))):
            x = (rng.random(shape) > 0.75).astype(np.int32)
            info: dict = {}
            thrift = _canon(efficient_flood_fill(
                x, crop_size=crop, wire_thrift=True, info=info))
            wide = _canon(efficient_flood_fill(
                x, crop_size=crop, wire_thrift=False, compact=False))
            np.testing.assert_array_equal(thrift, wide)
            assert info["max_label"] is not None
            assert thrift.max() <= info["max_label"]

    def test_unpack_bits_roundtrip(self, rng):
        from skoots_tpu.ops.flood_fill import _unpack_bits_dev

        m = (rng.random((5, 7, 24)) > 0.5)
        packed = np.packbits(m, axis=-1)
        back = np.asarray(_unpack_bits_dev(jnp.asarray(packed)))
        np.testing.assert_array_equal(back, m)


class TestRemap:
    def test_remap_labels(self):
        x = np.array([[1, 2, 3], [3, 2, 0]])
        out = remap_labels(x, np.array([2, 3]), np.array([9, 9]))
        np.testing.assert_array_equal(out, [[1, 9, 9], [9, 9, 0]])

    def test_renumber(self):
        x = np.array([0, 5, 17, 5, 10000])
        out, mapping = renumber(x)
        np.testing.assert_array_equal(out, [0, 1, 2, 1, 3])
        assert mapping == {5: 1, 17: 2, 10000: 3}


class TestDropSmallInstances:
    """Speck filter (ops/flood_fill.py::drop_small_instances): the auto
    rule zeroes only instances two orders of magnitude below the median
    size — the realism-campaign FP signature (every FP <= 4 voxels vs a
    smallest true instance of 499)."""

    def _mask(self):
        from skoots_tpu.ops.flood_fill import drop_small_instances  # noqa: F401

        x = np.zeros((20, 20, 4), np.int32)
        x[:10, :10] = 1          # 400 vox
        x[10:, :10] = 2          # 400 vox
        x[0, 19, 0] = 7          # 1-vox speck
        x[19, 19, :3] = 9        # 3-vox speck
        return x

    def test_auto_drops_specks_only(self):
        from skoots_tpu.ops.flood_fill import drop_small_instances

        out, n = drop_small_instances(self._mask(), -1)
        assert n == 2
        assert set(np.unique(out)) == {0, 1, 2}
        assert (out == 1).sum() == 400 and (out == 2).sum() == 400

    def test_auto_noop_on_uniform_sizes(self):
        """When every instance is of similar size, auto drops nothing —
        tiny phantoms and label-convention fixtures are unaffected."""
        from skoots_tpu.ops.flood_fill import drop_small_instances

        x = np.array([0, 1, 1, 2, 2, 3, 3], np.int32)
        out, n = drop_small_instances(x, -1)
        assert n == 0
        np.testing.assert_array_equal(out, x)

    def test_zero_disables(self):
        from skoots_tpu.ops.flood_fill import drop_small_instances

        x = self._mask()
        out, n = drop_small_instances(x, 0)
        assert n == 0
        np.testing.assert_array_equal(out, x)

    def test_explicit_floor(self):
        from skoots_tpu.ops.flood_fill import drop_small_instances

        out, n = drop_small_instances(self._mask(), 4)
        assert n == 2  # both specks < 4... the 3-vox and 1-vox ids
        assert set(np.unique(out)) == {0, 1, 2}

    def test_memmap_inplace(self, tmp_path):
        from skoots_tpu.ops.flood_fill import drop_small_instances

        p = tmp_path / "m.npy"
        ref = self._mask()
        mm = np.lib.format.open_memmap(
            str(p), mode="w+", dtype=np.int32, shape=ref.shape)
        mm[:] = ref
        out, n = drop_small_instances(mm, -1, chunk=3)
        assert n == 2 and out is mm
        mm.flush()
        back = np.load(str(p))
        assert set(np.unique(back)) == {0, 1, 2}


class TestSteppedCC:
    def test_matches_single_program(self, rng):
        from skoots_tpu.ops.flood_fill import make_label_components_stepped

        x = (rng.random((24, 24, 8)) > 0.7).astype(np.int32)
        single = np.asarray(label_components(jnp.asarray(x)))
        stepped = np.asarray(
            make_label_components_stepped((24, 24, 8), rounds_per_dispatch=2)(
                jnp.asarray(x)
            )
        )
        np.testing.assert_array_equal(_canon(single), _canon(stepped))

    def test_multi_propagate_rounds_exact(self, rng):
        """Extra 1-hop propagates per gather round trade random-gather
        traffic for streaming passes; the partition must stay identical
        (each hop is still masked 26-conn — no background bridging)."""
        from skoots_tpu.ops.flood_fill import make_label_components_stepped

        x = (rng.random((32, 28, 12)) > 0.55).astype(np.int32)  # percolates
        ref = np.asarray(label_components(jnp.asarray(x), max_rounds=64))
        for k in (2, 3, 4):
            lab = np.asarray(
                make_label_components_stepped(x.shape, propagates_per_round=k)(
                    jnp.asarray(x), max_rounds=64
                )
            )
            np.testing.assert_array_equal(ref, lab)

    def test_env_overrides_propagate_impl(self, rng, monkeypatch):
        """SKOOTS_PROPAGATE_IMPL is a global kill switch: forcing 'xla'
        must win over an explicit propagate_impl='pallas' request (and
        still produce the same partition)."""
        import skoots_tpu.kernels.propagate as kp
        from skoots_tpu.ops.flood_fill import make_label_components_stepped

        monkeypatch.setenv("SKOOTS_PROPAGATE_IMPL", "xla")
        called = []
        monkeypatch.setattr(
            kp, "propagate_pallas",
            lambda *a, **k: called.append(1) or (_ for _ in ()).throw(
                AssertionError("pallas used despite env override")),
        )
        x = (rng.random((16, 16, 8)) > 0.6).astype(np.int32)
        lab = np.asarray(
            make_label_components_stepped(
                x.shape, propagates_per_round=4, propagate_impl="pallas"
            )(jnp.asarray(x), max_rounds=32)
        )
        ref = np.asarray(label_components(jnp.asarray(x), max_rounds=32))
        np.testing.assert_array_equal(_canon(ref), _canon(lab))
        assert not called


class TestScanCC:
    """Axis-sweep (segmented max scan) acceleration: unbounded reach along
    contiguous runs at log-depth cost. Must reach the identical fixpoint —
    scans only spread labels within 6-connected runs, never across
    background."""

    def test_axis_run_max_matches_run_semantics(self, rng):
        import jax

        from skoots_tpu.ops.flood_fill import _axis_run_max

        x = (rng.random((4, 24, 3)) > 0.5)
        lab = np.where(x, rng.integers(1, 100, x.shape), 0).astype(np.int32)
        out = np.asarray(jax.jit(_axis_run_max, static_argnums=2)(
            jnp.asarray(lab), jnp.asarray(x), 1))
        # reference: per 1D line, each fg run takes its max
        ref = np.zeros_like(lab)
        for i in range(x.shape[0]):
            for k in range(x.shape[2]):
                j = 0
                while j < x.shape[1]:
                    if not x[i, j, k]:
                        j += 1
                        continue
                    j2 = j
                    while j2 < x.shape[1] and x[i, j2, k]:
                        j2 += 1
                    ref[i, j:j2, k] = lab[i, j:j2, k].max()
                    j = j2
        np.testing.assert_array_equal(out, ref)

    def test_scans_partition_matches_scipy(self, rng):
        from skoots_tpu.ops.flood_fill import make_label_components_stepped

        for thr in (0.7, 0.5):  # sparse blobs and a percolating mask
            x = (rng.random((28, 24, 12)) > thr).astype(np.int32)
            ref, _ = ndimage.label(x, structure=np.ones((3, 3, 3)))
            stepped = make_label_components_stepped(
                x.shape, propagates_per_round=2, jumps_per_round=0,
                scans_per_round=1,
            )
            lab = np.asarray(stepped(jnp.asarray(x), max_rounds=64))
            assert stepped.last_converged
            # partition equality (label values differ: component-max vs
            # scipy's first-encounter numbering, so _canon order can differ)
            pair = ref.astype(np.int64) * (1 << 32) + lab
            assert ((ref == 0) == (lab == 0)).all()
            assert len(np.unique(pair)) == len(np.unique(ref)) \
                == len(np.unique(lab))

    def test_long_tube_converges_in_one_round(self):
        """A straight 200-voxel tube needs 1 scan round, not 200 hops."""
        from skoots_tpu.ops.flood_fill import make_label_components_stepped

        x = np.zeros((200, 8, 4), np.int32)
        x[:, 2:4, 1:3] = 1
        stepped = make_label_components_stepped(
            x.shape, propagates_per_round=1, jumps_per_round=0,
            scans_per_round=1,
        )
        lab = np.asarray(stepped(jnp.asarray(x), max_rounds=8))
        assert stepped.last_converged
        # one round to fixpoint + one to observe no change
        assert stepped.last_rounds <= 2 * 4  # rounds_per_dispatch default 4
        assert len(np.unique(lab[lab > 0])) == 1

    def test_env_override_scans(self, rng, monkeypatch):
        from skoots_tpu.ops.flood_fill import make_label_components_stepped

        monkeypatch.setenv("SKOOTS_CC_SCANS", "1")
        x = (rng.random((16, 16, 8)) > 0.6).astype(np.int32)
        ref, _ = ndimage.label(x, structure=np.ones((3, 3, 3)))
        lab = np.asarray(
            make_label_components_stepped(x.shape, jumps_per_round=0)(
                jnp.asarray(x), max_rounds=64)
        )
        np.testing.assert_array_equal(_canon(ref), _canon(lab))
