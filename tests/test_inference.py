"""End-to-end inference engine tests (synthetic volume, tiny model)."""

import os

import jax
import numpy as np
import pytest

from skoots_tpu.config import get_cfg_defaults
from skoots_tpu.models import init_model
from skoots_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from skoots_tpu.utils.io import imread, imsave
from skoots_tpu.utils.synthetic import make_tubes


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ckpt")
    cfg = get_cfg_defaults()
    cfg.MODEL.DIMS = [4, 8, 16, 8, 4]
    cfg.MODEL.DEPTHS = [1, 1, 1, 1, 1]
    cfg.MODEL.OUT_CHANNELS = 4
    cfg.MODEL.KERNEL_SIZE = 3
    model, params = init_model(cfg, jax.random.PRNGKey(0), spatial=(16, 16, 8))
    path = str(tmp / "model.skoots")
    save_checkpoint(path, cfg, params, dataset_mean=100.0, dataset_std=50.0)
    return path


@pytest.fixture(scope="module")
def tube_tif(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("data")
    image, labels, skels = make_tubes(shape=(64, 64, 8), n_tubes=2)
    path = str(tmp / "vol.tif")
    imsave(path, image)
    return path, image


class TestCheckpointRoundtrip:
    def test_save_load(self, tiny_ckpt):
        state = load_checkpoint(tiny_ckpt)
        assert state["dataset_mean"] == 100.0
        assert state["dataset_std"] == 50.0
        assert state["cfg"].MODEL.DIMS == [4, 8, 16, 8, 4]
        assert "params" in state

    def test_bad_magic_raises(self, tmp_path):
        p = tmp_path / "bad.skoots"
        p.write_bytes(b"not a checkpoint")
        with pytest.raises(RuntimeError, match="bad magic"):
            load_checkpoint(str(p))


class TestIO:
    def test_tif_roundtrip(self, tmp_path):
        vol = (np.random.default_rng(0).random((32, 24, 6)) * 255).astype(np.uint8)
        p = str(tmp_path / "x.tif")
        imsave(p, vol)
        back = imread(p)
        np.testing.assert_array_equal(back, vol)

    def test_int32_labels_roundtrip(self, tmp_path):
        vol = np.arange(32 * 24 * 4, dtype=np.int32).reshape(32, 24, 4) % 70000
        p = str(tmp_path / "lab.tif")
        imsave(p, vol)
        back = imread(p)
        np.testing.assert_array_equal(back, vol)


class TestRunInference:
    def test_full_pipeline_artifacts(self, tiny_ckpt, tube_tif):
        from skoots_tpu.infer import run_inference

        path, image = tube_tif
        mask = run_inference(
            path,
            tiny_ckpt,
            crop_size=(48, 48, 8),
            overlap=(8, 8, 0),
            assign_crop_size=(48, 48, 8),
            assign_overlap=(8, 8, 0),
            batch=2,
        )
        assert mask.shape == image.shape
        assert mask.dtype == np.int32
        stem = os.path.splitext(path)[0]
        assert os.path.exists(stem + "_instance_mask.tif")
        assert os.path.exists(stem + "_skoots_benchmark.txt")
        with open(stem + "_skoots_benchmark.txt") as f:
            assert "Time:" in f.read()
        # the benchmark contract must not leak allocation tracing into the
        # rest of the process (it taxed everything after ~3x; PARITY r4)
        import tracemalloc

        assert not tracemalloc.is_tracing()
        # output readable and matches
        saved = imread(stem + "_instance_mask.tif")
        np.testing.assert_array_equal(saved, mask)

    def test_spatial_shards_path(self, tiny_ckpt, tube_tif, tmp_path):
        """run_inference(spatial_shards=8) uses the sharded whole-volume
        pipeline (8 virtual CPU devices via conftest) and keeps the output
        contracts."""
        from skoots_tpu.infer import run_inference

        path, image = tube_tif
        out = str(tmp_path / "sharded_mask.tif")
        mask = run_inference(
            path, tiny_ckpt, spatial_shards=8, output_path=out,
        )
        assert mask.shape == image.shape and mask.dtype == np.int32
        np.testing.assert_array_equal(imread(out), mask)
        with pytest.raises(ValueError):
            run_inference(path, tiny_ckpt, spatial_shards=64)

    def test_cached_rerun(self, tiny_ckpt, tube_tif):
        from skoots_tpu.infer import run_inference

        path, _ = tube_tif
        m1 = run_inference(
            path, tiny_ckpt, crop_size=(48, 48, 8), overlap=(8, 8, 0),
            assign_crop_size=(48, 48, 8), assign_overlap=(8, 8, 0),
        )
        m2 = run_inference(
            path, tiny_ckpt, use_cached_data=True,
            crop_size=(48, 48, 8), overlap=(8, 8, 0),
            assign_crop_size=(48, 48, 8), assign_overlap=(8, 8, 0),
        )
        np.testing.assert_array_equal(m1, m2)

    def test_device_engine_delegation_matches_host(self, tiny_ckpt, tmp_path):
        """engine_impl='device' routes through the whole-volume on-device
        pipeline with the SAME knob semantics; instance output must agree
        with the host-streaming engine (storage dtypes differ — bf16 vs f16
        vector fields — so agreement is relabel-invariant, near-total)."""
        from skoots_tpu.infer import run_inference

        image, _, _ = make_tubes(shape=(64, 64, 8), n_tubes=2)
        path = str(tmp_path / "dev.tif")
        imsave(path, image)
        kw = dict(crop_size=(32, 32, 8), overlap=(0, 0, 0),
                  assign_crop_size=(32, 32, 8), assign_overlap=(0, 0, 0))
        m_host = run_inference(path, tiny_ckpt, engine_impl="host", **kw)
        m_dev = run_inference(path, tiny_ckpt, engine_impl="device", **kw)
        assert m_dev.shape == m_host.shape and m_dev.dtype == np.int32
        stem = os.path.splitext(path)[0]
        import json as _json

        with open(stem + "_skoots_phases.json") as f:
            st = _json.load(f)
        assert st["engine"] == "device" and "phase_s" in st
        # foreground sets must agree almost everywhere
        fg_agree = np.mean((m_host > 0) == (m_dev > 0))
        assert fg_agree > 0.995, fg_agree
        # every host instance maps to one device label covering >=99% of it
        for lab in np.unique(m_host)[1:]:
            sel = m_dev[m_host == lab]
            vals, counts = np.unique(sel, return_counts=True)
            assert counts.max() / sel.size >= 0.99, (lab, vals, counts)

    def test_thrifty_device_engine_matches_host(self, tiny_ckpt, tmp_path):
        """engine_impl='device-thrifty' (native-dtype device volume, no
        vector buffer — assign recomputes the forward — and compacted u16
        labels) must agree with the host engine at instance level; output
        labels come back already sequential."""
        from skoots_tpu.infer import run_inference

        image, _, _ = make_tubes(shape=(64, 64, 8), n_tubes=2)
        path = str(tmp_path / "thrifty.tif")
        imsave(path, image)
        kw = dict(crop_size=(32, 32, 8), overlap=(0, 0, 0),
                  assign_crop_size=(32, 32, 8), assign_overlap=(0, 0, 0))
        m_host = run_inference(path, tiny_ckpt, engine_impl="host", **kw)
        m_dev = run_inference(path, tiny_ckpt, engine_impl="device-thrifty",
                              **kw)
        assert m_dev.shape == m_host.shape and m_dev.dtype == np.int32
        import json as _json

        with open(os.path.splitext(path)[0] + "_skoots_phases.json") as f:
            assert _json.load(f)["engine"] == "device-thrifty"
        fg_agree = np.mean((m_host > 0) == (m_dev > 0))
        assert fg_agree > 0.995, fg_agree
        for lab in np.unique(m_host)[1:]:
            sel = m_dev[m_host == lab]
            vals, counts = np.unique(sel, return_counts=True)
            assert counts.max() / sel.size >= 0.99, (lab, vals, counts)

    def test_pack_bits_matches_numpy_packbits(self):
        from skoots_tpu.infer.engine import _make_mask_decoder, _pack_bits

        rng = np.random.default_rng(3)
        m = (rng.random((2, 5, 7, 16)) > 0.5).astype(np.uint8)
        packed = np.asarray(_pack_bits(np.asarray(m)))
        np.testing.assert_array_equal(packed, np.packbits(m, axis=-1))
        back = _make_mask_decoder(16)(packed)
        np.testing.assert_array_equal(back, m[..., None])

    def test_wire_recompute_matches_store(self, tiny_ckpt, tmp_path):
        """wire_mode='recompute' (phase 1 ships bit-packed masks only; phase
        3 re-runs the forward from the raw image) must reproduce the
        stored-vector path exactly on an identical zero-overlap tile grid —
        the recomputed field is the same f16 values the store path wrote."""
        from skoots_tpu.infer import run_inference

        image, _, _ = make_tubes(shape=(64, 64, 8), n_tubes=2)
        path = str(tmp_path / "wire.tif")
        imsave(path, image)
        kw = dict(crop_size=(32, 32, 8), overlap=(0, 0, 0),
                  assign_crop_size=(32, 32, 8), assign_overlap=(0, 0, 0))
        m_store = run_inference(path, tiny_ckpt, wire_mode="store", **kw)
        stem = os.path.splitext(path)[0]
        assert os.path.exists(stem + "_skoots_vectors.npy")
        m_rec = run_inference(path, tiny_ckpt, wire_mode="recompute", **kw)
        # recompute leaves no vector buffer behind (and removes a stale one)
        assert not os.path.exists(stem + "_skoots_vectors.npy")
        np.testing.assert_array_equal(m_store, m_rec)

    def test_recompute_cache_rerun(self, tiny_ckpt, tmp_path):
        """--use-cached on a cache produced under wire_mode='recompute'
        (masks only, no vector buffer) recomputes phase 3 and matches."""
        import json as _json

        from skoots_tpu.infer import run_inference

        image, _, _ = make_tubes(shape=(64, 64, 8), n_tubes=2)
        path = str(tmp_path / "wirecache.tif")
        imsave(path, image)
        kw = dict(crop_size=(32, 32, 8), overlap=(0, 0, 0),
                  assign_crop_size=(32, 32, 8), assign_overlap=(0, 0, 0))
        m1 = run_inference(path, tiny_ckpt, wire_mode="recompute", **kw)
        stem = os.path.splitext(path)[0]
        with open(stem + "_skoots_phase1.json") as f:
            assert _json.load(f)["vectors_stored"] is False
        m2 = run_inference(path, tiny_ckpt, use_cached_data=True,
                           wire_mode="store", **kw)  # store downgrades
        np.testing.assert_array_equal(m1, m2)

    def test_streamed_label_gather_matches_fast_path(self, tiny_ckpt,
                                                     tmp_path):
        """A tile batch whose walk bbox exceeds the label-crop budget falls
        back to streaming fixed-shape x-slabs (``_gather_ids_slab``); the
        result must be voxel-identical to the single-crop fast path. The
        untrained checkpoint's saturated vectors walk ~n_iter*scale voxels,
        which is exactly the pathology that made the fast path copy
        O(volume) label bytes per batch (1024^3 proof run: 84 GB anon RSS)."""
        from skoots_tpu.infer import run_inference

        image, _, _ = make_tubes(shape=(64, 64, 8), n_tubes=2)
        path = str(tmp_path / "vol.tif")
        imsave(path, image)
        kw = dict(crop_size=(48, 48, 8), overlap=(8, 8, 0),
                  assign_crop_size=(48, 48, 8), assign_overlap=(8, 8, 0),
                  # loose threshold + no gate: the untrained model must
                  # still produce nonzero labels or the equality is vacuous
                  prob_threshold=0.35, semantic_gate=False)
        fast = run_inference(path, tiny_ckpt, **kw)
        streamed = run_inference(
            path, tiny_ckpt, use_cached_data=True,
            label_crop_budget_bytes=1, **kw,
        )
        assert (np.asarray(fast) != 0).any()
        np.testing.assert_array_equal(np.asarray(streamed), np.asarray(fast))

    def test_cached_knob_mismatch_warns_from_sidecar(self, tiny_ckpt,
                                                     tube_tif, caplog):
        """ADVICE r3: the phase-1 knobs (threshold/dilation) are persisted in
        a sidecar next to the cached buffers, and a reload with DIFFERENT
        knobs warns — including a cache produced with non-default knobs
        reloaded with default flags (the case the old default-comparison
        check silently missed)."""
        import json
        import logging

        from skoots_tpu.infer import run_inference

        path, _ = tube_tif
        kw = dict(crop_size=(48, 48, 8), overlap=(8, 8, 0),
                  assign_crop_size=(48, 48, 8), assign_overlap=(8, 8, 0))
        # produce the cache with NON-default knobs
        run_inference(path, tiny_ckpt, dilation_3d=0, dilation_2d=1, **kw)
        stem = os.path.splitext(path)[0]
        with open(stem + "_skoots_phase1.json") as f:
            assert json.load(f) == {
                "prob_threshold": 0.8, "semantic_threshold": 0.8,
                "dilation_3d": 0, "dilation_2d": 1, "vectors_stored": True}
        # reload with EXPLICIT different knobs -> must warn (old check
        # compared against hard-coded defaults and stayed silent)
        with caplog.at_level(logging.WARNING, "skoots_tpu.infer.engine"):
            run_inference(path, tiny_ckpt, use_cached_data=True,
                          dilation_3d=1, dilation_2d=2, **kw)
        assert any("different knobs" in r.message % r.args if r.args
                   else "different knobs" in r.message
                   for r in caplog.records), caplog.records
        # reload in auto mode (default) -> adopts the recorded knobs, silent
        caplog.clear()
        with caplog.at_level(logging.WARNING, "skoots_tpu.infer.engine"):
            run_inference(path, tiny_ckpt, use_cached_data=True, **kw)
        assert not any("knob" in str(r.message) for r in caplog.records)
        # reload with MATCHING knobs -> no warning
        caplog.clear()
        with caplog.at_level(logging.WARNING, "skoots_tpu.infer.engine"):
            run_inference(path, tiny_ckpt, use_cached_data=True,
                          dilation_3d=0, dilation_2d=1, **kw)
        assert not any("knob" in str(r.message) for r in caplog.records)


class TestSemanticThresholdResolution:
    """Sparse checkpoints resolve the semantic-gate level automatically:
    volume probe first, train-time calibrated value as fallback, explicit
    flag always wins; dense checkpoints keep prob_threshold."""

    def _make_ckpt(self, tmp_path, sparse: bool, calibrated=None):
        cfg = get_cfg_defaults()
        cfg.MODEL.DIMS = [4, 8, 16, 8, 4]
        cfg.MODEL.DEPTHS = [1, 1, 1, 1, 1]
        cfg.MODEL.OUT_CHANNELS = 4
        cfg.MODEL.KERNEL_SIZE = 3
        cfg.EXPERIMENTAL.IS_SPARSE = sparse
        model, params = init_model(cfg, jax.random.PRNGKey(0),
                                   spatial=(16, 16, 8))
        path = str(tmp_path / "m.skoots")
        extra = ({"calibrated_prob_threshold": calibrated}
                 if calibrated is not None else None)
        save_checkpoint(path, cfg, params, dataset_mean=100.0,
                        dataset_std=50.0, extra=extra)
        return path

    def _vol(self, tmp_path):
        image, _, _ = make_tubes(shape=(64, 64, 8), n_tubes=2)
        p = str(tmp_path / "v.tif")
        imsave(p, image)
        return p

    def _sidecar(self, path):
        import json

        with open(os.path.splitext(path)[0] + "_skoots_phase1.json") as f:
            return json.load(f)

    KW = dict(crop_size=(48, 48, 8), overlap=(8, 8, 0),
              assign_crop_size=(48, 48, 8), assign_overlap=(8, 8, 0))

    def test_sparse_probe_calibrates_on_volume(self, tmp_path, monkeypatch):
        import skoots_tpu.infer.engine as eng

        monkeypatch.setattr(eng, "_probe_semantic_threshold",
                            lambda *a, **k: 0.93)
        vol = self._vol(tmp_path)
        eng.run_inference(vol, self._make_ckpt(tmp_path, sparse=True),
                          **self.KW)
        assert self._sidecar(vol)["semantic_threshold"] == 0.93

    def test_probe_fallback_to_recorded(self, tmp_path, monkeypatch):
        import skoots_tpu.infer.engine as eng

        monkeypatch.setattr(eng, "_probe_semantic_threshold",
                            lambda *a, **k: None)
        vol = self._vol(tmp_path)
        eng.run_inference(
            vol, self._make_ckpt(tmp_path, sparse=True, calibrated=0.97),
            **self.KW)
        assert self._sidecar(vol)["semantic_threshold"] == 0.97

    def test_explicit_flag_wins(self, tmp_path, monkeypatch):
        import skoots_tpu.infer.engine as eng

        def boom(*a, **k):
            raise AssertionError("probe must not run with an explicit flag")

        monkeypatch.setattr(eng, "_probe_semantic_threshold", boom)
        vol = self._vol(tmp_path)
        eng.run_inference(
            vol, self._make_ckpt(tmp_path, sparse=True, calibrated=0.97),
            semantic_threshold=0.88, **self.KW)
        assert self._sidecar(vol)["semantic_threshold"] == 0.88

    def test_dense_ckpt_keeps_prob_threshold(self, tmp_path, monkeypatch):
        import skoots_tpu.infer.engine as eng

        def boom(*a, **k):
            raise AssertionError("dense checkpoints must not probe")

        monkeypatch.setattr(eng, "_probe_semantic_threshold", boom)
        vol = self._vol(tmp_path)
        eng.run_inference(vol, self._make_ckpt(tmp_path, sparse=False),
                          **self.KW)
        assert self._sidecar(vol)["semantic_threshold"] == 0.8


class TestTileVsWhole:
    def test_oracle_segmentation_exact(self):
        """Tile-vs-whole property: feeding the ORACLE prediction through
        phases 2+3 machinery recovers the ground-truth partition exactly."""
        import jax.numpy as jnp

        from skoots_tpu.ops import (
            efficient_flood_fill,
            index_skeleton_by_embed,
            vector_to_embedding,
        )
        from skoots_tpu.utils.synthetic import make_tubes, perfect_prediction

        image, labels, skels = make_tubes(shape=(64, 64, 12), n_tubes=3, seed=7)
        pred = perfect_prediction(labels, skels)
        skel_mask = (pred[..., 3] > 0.5).astype(np.uint8)
        labeled = efficient_flood_fill(skel_mask, crop_size=(32, 32, 12))
        emb = vector_to_embedding(
            jnp.array([60.0, 60.0, 12.0]), jnp.asarray(pred[None, ..., 0:3]), n=1
        )
        inst = np.asarray(
            index_skeleton_by_embed(jnp.asarray(labeled), emb)
        )[0] * (labels > 0)
        n_gt = len(np.unique(labels)) - 1
        # every gt object maps to exactly one instance id
        for gid in range(1, n_gt + 1):
            ids, counts = np.unique(inst[labels == gid], return_counts=True)
            dom = counts.max() / counts.sum()
            assert dom > 0.95, f"object {gid} fragmented: {ids}, {counts}"


class TestAssignSemanticGate:
    def test_background_never_inherits_halo_labels(self):
        """Voxels with zero vectors (prob <= threshold in phase 1) must stay
        unlabeled even when they sit ON a labeled skeleton voxel — without
        the gate every thin instance grows a dilated-skeleton-halo shell
        (round-2 convergence campaign regression)."""
        import jax.numpy as jnp

        from skoots_tpu.infer.engine import _gather_ids, _make_embed_fn

        labels = jnp.zeros((16, 16, 8), jnp.int32).at[4:8, 4:8, 2:5].set(7)
        vec = jnp.zeros((1, 16, 16, 8, 3), jnp.float32)
        # one foreground voxel pointing at the labeled region
        vec = vec.at[0, 12, 12, 3].set(jnp.asarray([-1.0, -1.0, 0.0]))
        fg = np.zeros((1, 16, 16, 8), np.uint8)
        fg[0, 12, 12, 3] = 1
        fg[0, 6, 6, 3] = 1  # fg voxel whose stored vector is exactly zero
        embed_fn = _make_embed_fn((6.0, 6.0, 2.0), (16, 16, 8), n_iter=1)
        idx, mins, maxs = embed_fn(vec, jnp.zeros((1, 3), jnp.float32))
        ids = np.asarray(_gather_ids(labels, idx, jnp.zeros((3,), jnp.int32),
                                     jnp.asarray(fg)))
        assert ids[0, 12, 12, 3] == 7          # fg voxel assigned
        assert ids[0, 5, 5, 3] == 0            # on-skeleton bg voxel NOT
        # zero-vector foreground voxel keeps its own position's label (the
        # vec!=0 gate used to zero it — ADVICE round-2 fix)
        assert ids[0, 6, 6, 3] == 7
        assert (ids != 0).sum() == 2


class TestCLIDilationKnobs:
    def test_parser_defaults_match_reference_stack(self):
        """--dilate-3d/--dilate-2d default to auto (None -> data-derived,
        infer/autoknobs.py; the reference's fixed stack is eval.py:152-157)
        and explicit values parse through to ints."""
        from skoots_tpu.cli import build_parser

        p = build_parser()
        a = p.parse_args([])
        assert (a.dilation_3d, a.dilation_2d) == (None, None)
        a = p.parse_args(["--dilate-3d", "0", "--dilate-2d", "1"])
        assert (a.dilation_3d, a.dilation_2d) == (0, 1)


class TestMaskFilterFlag:
    def test_custom_mask_filter_globs_and_skips(self, tmp_path):
        """--mask-filter (reference __main__.py:55-57): skeletonization
        globs *<filter>.tif, and --image DIR inference skips those files."""
        import numpy as np

        from skoots_tpu.cli import build_parser
        from skoots_tpu.train.generate_skeletons import create_gt_skeletons
        from skoots_tpu.utils.io import imsave

        p = build_parser()
        assert p.parse_args([]).mask_filter == ".labels"

        mask = np.zeros((24, 24, 8), np.int32)
        mask[4:12, 4:12, 2:6] = 1
        imsave(str(tmp_path / "a.gt.tif"), mask)
        imsave(str(tmp_path / "a.labels.tif"), mask)  # must be ignored
        create_gt_skeletons(str(tmp_path), mask_suffix=".gt.tif")
        assert (tmp_path / "a.skeletons.npz").exists()
        # the .labels.tif was not skeletonized under the custom filter
        import glob as g

        assert len(g.glob(str(tmp_path / "*.skeletons.npz"))) == 1


class TestDilationBehavior:
    def test_dilation_zero_keeps_skeletons_separate(self, tiny_ckpt, tube_tif):
        """With no dilation the skeleton map stays exactly the thresholded
        prediction; with the default stack it is a superset."""
        import jax.numpy as jnp

        from skoots_tpu.infer.engine import _make_tile_fn
        from skoots_tpu.models import cfg_to_model

        ckpt = load_checkpoint(tiny_ckpt)
        model = cfg_to_model(ckpt["cfg"])
        import jax.random as jrandom

        path, _ = tube_tif
        vol = jnp.asarray(imread(path)[None, ..., None], jnp.float32)
        params = model.init({"params": jrandom.PRNGKey(0)},
                            vol[:, :16, :16, :8], deterministic=True)
        f_none = _make_tile_fn(model, params, 100.0, 50.0, 0.5, 0, 0)
        f_ref = _make_tile_fn(model, params, 100.0, 50.0, 0.5, 1, 2)
        _, sk0, sem0 = f_none(vol)
        _, sk1, sem1 = f_ref(vol)
        sk0, sk1 = np.asarray(sk0), np.asarray(sk1)
        assert np.array_equal(np.asarray(sem0), np.asarray(sem1))
        assert (sk1 >= sk0).all() and sk1.sum() > sk0.sum()


class TestExperimentalCLI:
    """The tuned experimental knob set is reachable from the CLI
    (reference exposes it via python -m skoots.experimental,
    /root/reference/skoots/experimental/__main__.py:31-78)."""

    def _capture(self, monkeypatch):
        captured = {}

        def fake_run(image, ckpt, **kw):
            captured.update(kw)
            captured["image"] = image
            return np.zeros((1, 1, 1), np.int32)

        import skoots_tpu.experimental.eval as xeval

        monkeypatch.setattr(xeval, "run_inference", fake_run)
        return captured

    def test_flag_dispatches_tuned_knobs(self, monkeypatch, tmp_path):
        captured = self._capture(monkeypatch)
        from skoots_tpu.cli import main

        img = tmp_path / "v.tif"
        img.write_bytes(b"")  # never read: run_inference is stubbed
        rc = main(["--image", str(img), "--pretrained-checkpoint",
                   "c.skoots", "--experimental"])
        assert rc == 0
        assert captured["prob_threshold"] == 0.5
        assert (captured["dilation_3d"], captured["dilation_2d"]) == (0, 3)
        assert captured["embed_decay"] == 0.95

    def test_explicit_flags_override_tuned_set(self, monkeypatch, tmp_path):
        captured = self._capture(monkeypatch)
        from skoots_tpu.cli import main

        img = tmp_path / "v.tif"
        img.write_bytes(b"")
        rc = main(["--image", str(img), "--pretrained-checkpoint",
                   "c.skoots", "--experimental", "--dilate-2d", "1"])
        assert rc == 0
        assert (captured["dilation_3d"], captured["dilation_2d"]) == (0, 1)

    def test_module_entry_eval_mode(self, monkeypatch, tmp_path):
        captured = self._capture(monkeypatch)
        from skoots_tpu.experimental.__main__ import main

        img = tmp_path / "v.tif"
        img.write_bytes(b"")
        rc = main(["--image", str(img), "--pretrained-checkpoint",
                   "c.skoots"])
        assert rc == 0
        assert captured["prob_threshold"] == 0.5

    def test_module_entry_usage(self, capsys):
        from skoots_tpu.experimental.__main__ import main

        assert main([]) == 2


class TestCLIDirectoryMode:
    def test_directory_glob_segments_every_tif(self, tiny_ckpt, tmp_path):
        """`skoots --image DIR` segments every *.tif in the directory and
        skips *.labels.tif companions (reference __main__.py:92-96)."""
        from skoots_tpu.cli import main
        from skoots_tpu.utils.synthetic import make_tubes

        d = tmp_path / "vols"
        d.mkdir()
        for i in range(2):
            img, labels, _ = make_tubes(shape=(48, 48, 8), n_tubes=1, seed=i)
            imsave(str(d / f"v{i}.tif"), img)
            imsave(str(d / f"v{i}.labels.tif"), labels)
        rc = main(["--image", str(d), "--pretrained-checkpoint", tiny_ckpt])
        assert rc == 0
        for i in range(2):
            assert os.path.exists(str(d / f"v{i}_instance_mask.tif"))
        # labels companions were skipped, not segmented
        assert not os.path.exists(str(d / "v0.labels_instance_mask.tif"))
