"""Spatially-sharded inference: equivalence with single-device on 8-dev mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skoots_tpu.config import get_cfg_defaults
from skoots_tpu.infer.sharded import (
    make_sharded_assign,
    make_sharded_forward,
    shard_volume,
)
from skoots_tpu.models import init_model
from skoots_tpu.parallel import make_mesh


@pytest.fixture(scope="module")
def setup():
    cfg = get_cfg_defaults()
    cfg.MODEL.DIMS = [4, 8, 16, 8, 4]
    cfg.MODEL.DEPTHS = [1, 1, 1, 1, 1]
    cfg.MODEL.OUT_CHANNELS = 4
    cfg.MODEL.KERNEL_SIZE = 3
    model, params = init_model(cfg, jax.random.PRNGKey(0), spatial=(16, 16, 8))
    mesh = make_mesh(data=1, space=8)
    return model, params, mesh


class TestShardedForward:
    def test_matches_unsharded(self, setup):
        model, params, mesh = setup
        vol = jnp.asarray(
            np.random.default_rng(0).random((1, 64, 32, 8, 1), np.float32) * 255
        )
        mean, std = jnp.float32(128.0), jnp.float32(64.0)

        fwd_sharded = make_sharded_forward(model, mesh)
        vec_s, skel_s = fwd_sharded(params, shard_volume(vol, mesh), mean, std)

        # unsharded reference
        x = (vol - mean) / std
        out = model.apply(params, x, deterministic=True)
        from skoots_tpu.ops.morphology import binary_dilation, binary_dilation_2d

        keep = (out[..., 4:5] > 0.8).astype(out.dtype)
        vec_r = (out[..., 0:3] * keep).astype(jnp.bfloat16)
        sk = binary_dilation(out[..., 3:4] * keep)
        sk = binary_dilation_2d(binary_dilation_2d(sk))
        skel_r = (sk > 0.8).astype(jnp.uint8)

        # bit 0 = dilated skeleton, bit 1 = semantic foreground. Like the
        # vector comparison below, bf16 partitioning drift can flip voxels
        # sitting exactly on the 0.8 gate — require near-total agreement.
        bit0_agree = ((np.asarray(skel_s) & 1) == np.asarray(skel_r)).mean()
        assert bit0_agree > 0.995, f"skeleton agreement {bit0_agree:.4f}"
        bit1_agree = (
            (np.asarray(skel_s) >> 1) == np.asarray(keep).astype(np.uint8)
        ).mean()
        assert bit1_agree > 0.995, f"semantic agreement {bit1_agree:.4f}"
        # bf16 reduction order differs under partitioning: values drift a few
        # ulps through the stack (amplified near the 0.8 semantic gate, which
        # can flip keep/drop for borderline voxels). Require: gate decisions
        # agree almost everywhere, and values agree where both sides kept.
        a = np.asarray(vec_s, np.float32)
        b = np.asarray(vec_r, np.float32)
        kept_a = np.any(a != 0, axis=-1)
        kept_b = np.any(b != 0, axis=-1)
        gate_agree = (kept_a == kept_b).mean()
        assert gate_agree > 0.995, f"gate agreement {gate_agree:.4f}"
        both = kept_a & kept_b
        # bf16 partitioning reorders reductions (LayerNorm stats, trilinear
        # blends); individual voxels can drift by a few ULP-amplified steps,
        # so bound the bulk tightly and the tail loosely.
        err = np.abs(a[both] - b[both])
        assert np.quantile(err, 0.999) <= 0.06, np.quantile(err, 0.999)
        assert err.max() <= 0.25, err.max()

    def test_sharding_is_applied(self, setup):
        model, params, mesh = setup
        vol = shard_volume(jnp.zeros((1, 64, 32, 8, 1)), mesh)
        assert len(vol.sharding.device_set) == 8


class TestShardedPipeline:
    def test_matches_unsharded_composition(self, setup):
        """Full volume->labels over the 8-device mesh vs the same math on one
        device. CC labels are raveled-index-deterministic, so disagreement can
        come only from bf16 partitioning drift at the 0.8 gate."""
        from skoots_tpu.infer.sharded import make_sharded_pipeline
        from skoots_tpu.ops.flood_fill import label_components
        from skoots_tpu.ops.morphology import binary_dilation, binary_dilation_2d
        from skoots_tpu.ops.vec2embed import vector_to_embedding

        model, params, mesh = setup
        rng = np.random.default_rng(2)
        vol = rng.random((64, 32, 8), np.float32) * 255
        mean, std = 128.0, 64.0
        run = make_sharded_pipeline(
            model, mesh, vol.shape, vector_scale=(8.0, 8.0, 4.0),
            embed_iterations=3, cc_rounds=16,
        )
        inst_s = run(params, vol, mean, std)
        assert inst_s.shape == vol.shape and inst_s.dtype == np.int32

        # unsharded composition of the identical math
        x = (jnp.asarray(vol)[None, ..., None] - mean) / std
        out = model.apply(params, x, deterministic=True)
        keep = (out[..., 4:5] > 0.8).astype(out.dtype)
        vec = (out[..., 0:3] * keep).astype(jnp.bfloat16)
        sk = binary_dilation(out[..., 3:4] * keep)
        sk = binary_dilation_2d(binary_dilation_2d(sk))
        skel = (sk > 0.8).astype(jnp.uint8)[0, ..., 0]
        labels = label_components(skel, max_rounds=16)
        emb = vector_to_embedding(
            jnp.asarray([8.0, 8.0, 4.0]), vec.astype(jnp.float32), n=3
        )
        idx = np.round(np.asarray(emb)).astype(np.int64)
        inst_r = np.asarray(labels)[
            idx[..., 0].clip(0, 63), idx[..., 1].clip(0, 31), idx[..., 2].clip(0, 7)
        ]
        # semantic gate (prob > thr), matching the pipeline
        inst_r = np.where(np.asarray(keep[..., 0]) > 0, inst_r, 0)[0]
        agree = (inst_s == inst_r).mean()
        assert agree > 0.99, f"instance agreement {agree:.4f}"

    def test_ring_matches_replicated_and_labels_stay_sharded(self, setup):
        """VERDICT round-2 item 2: the production pipeline must keep CC
        labels 'space'-sharded end-to-end (ring label gather), agree exactly
        with the replicated-labels variant, and no device may hold the full
        label volume."""
        from skoots_tpu.infer.sharded import make_sharded_pipeline

        model, params, mesh = setup
        rng = np.random.default_rng(5)
        vol = rng.random((64, 32, 8), np.float32) * 255
        kw = dict(vector_scale=(8.0, 8.0, 4.0), embed_iterations=3,
                  cc_rounds=16)
        ring = make_sharded_pipeline(model, mesh, vol.shape, **kw)
        rep = make_sharded_pipeline(model, mesh, vol.shape,
                                    label_gather="replicated", **kw)
        inst_ring = ring(params, vol, 128.0, 64.0)
        inst_rep = rep(params, vol, 128.0, 64.0)
        np.testing.assert_array_equal(inst_ring, inst_rep)

        # sharding inspection: the CC output of the ring pipeline is sharded
        # over 'space' — every device holds exactly 1/8 of the labels
        skel = jnp.zeros((64, 32, 8), jnp.uint8)
        skel = jax.device_put(
            skel, jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec("space")
            ),
        )
        labels = ring.cc(skel)
        shard_shapes = {s.data.shape for s in labels.addressable_shards}
        assert shard_shapes == {(8, 32, 8)}, shard_shapes
        rep_labels = rep.cc(skel)
        assert {s.data.shape for s in rep_labels.addressable_shards} == {
            (64, 32, 8)
        }

    def test_ring_walk_matches_replicated_walk(self, setup):
        """VERDICT round-3 weak #5: the ring-gathered embedding walk
        (per-device memory O(vox/n), no whole-volume field replication)
        must produce the same instances as the replicated walk, and the
        walk_gather='auto' ceiling logic must degrade to ring when the
        replicated estimate exceeds the device limit."""
        import skoots_tpu.infer.sharded as sh
        from skoots_tpu.infer.sharded import make_sharded_pipeline

        model, params, mesh = setup
        rng = np.random.default_rng(7)
        vol = rng.random((64, 32, 8), np.float32) * 255
        kw = dict(vector_scale=(8.0, 8.0, 4.0), embed_iterations=3,
                  cc_rounds=16)
        ring = make_sharded_pipeline(model, mesh, vol.shape,
                                     walk_gather="ring", **kw)
        rep = make_sharded_pipeline(model, mesh, vol.shape,
                                    walk_gather="replicated", **kw)
        np.testing.assert_array_equal(
            ring(params, vol, 128.0, 64.0), rep(params, vol, 128.0, 64.0)
        )

    def test_walk_gather_auto_degrades_to_ring(self, setup, monkeypatch):
        from skoots_tpu.infer.sharded import (
            estimated_bytes_per_device,
            make_sharded_pipeline,
        )

        model, params, mesh = setup
        shape = (64, 32, 8)
        # limit between the ring and replicated estimates -> auto picks ring
        lim = (estimated_bytes_per_device(shape, 8, "ring")
               + estimated_bytes_per_device(shape, 8)) // 2
        monkeypatch.setattr(
            "skoots_tpu.infer.sharded.device_bytes_limit", lambda: lim)
        vol = np.random.default_rng(9).random(shape).astype(np.float32) * 255
        kw = dict(vector_scale=(8.0, 8.0, 4.0), embed_iterations=3,
                  cc_rounds=16)
        auto = make_sharded_pipeline(model, mesh, shape, **kw)
        explicit = make_sharded_pipeline(model, mesh, shape,
                                         walk_gather="ring", **kw)
        np.testing.assert_array_equal(
            auto(params, vol, 128.0, 64.0),
            explicit(params, vol, 128.0, 64.0),
        )
        # incompatible combination fails loudly
        with pytest.raises(ValueError, match="ring"):
            make_sharded_pipeline(model, mesh, shape, walk_gather="ring",
                                  label_gather="replicated", **kw)

    def test_cc_converges_past_round_budget_and_warns_at_cap(self, setup):
        """ADVICE r3 (medium): propagate-only CC must not silently split a
        long snaking instance. The host-polled rounds keep dispatching past
        the caller's cc_rounds budget (up to an extent-scaled cap), and a
        path longer than the cap raises a RuntimeWarning instead of failing
        silently."""
        import warnings

        from skoots_tpu.infer.sharded import make_sharded_pipeline

        model, params, mesh = setup
        shape = (64, 32, 8)
        run = make_sharded_pipeline(
            model, mesh, shape, vector_scale=(8.0, 8.0, 4.0),
            embed_iterations=2, cc_rounds=2, cc_propagates_per_round=4,
        )
        # serpentine 1-voxel path in the z=0 plane: length ~64*16 = 1024 hops
        # >> cc_rounds*propagates = 8, and > the extent cap 4*(64+32+8)=416
        snake = np.zeros(shape, np.uint8)
        for j in range(0, 32, 2):
            snake[:, j, 0] = 1  # full-x runs
            # connect alternating ends
            snake[-1 if (j // 2) % 2 == 0 else 0, j + 1, 0] = 1
        skel = jax.device_put(
            jnp.asarray(snake), jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec("space")),
        )
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            labels = run.cc(skel)
        assert any("before convergence" in str(w.message) for w in rec), (
            [str(w.message) for w in rec])

        # a path longer than the cc_rounds budget but under the extent cap
        # converges to ONE label with no warning (adaptive dispatching)
        short = np.zeros(shape, np.uint8)
        short[:, 0, 0] = 1
        short[-1, 1, 0] = 1
        short[:, 2, 0] = 1  # ~192 hops > 8-hop budget, < 416 cap
        skel2 = jax.device_put(
            jnp.asarray(short), jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec("space")),
        )
        with warnings.catch_warnings(record=True) as rec2:
            warnings.simplefilter("always")
            lab2 = np.asarray(run.cc(skel2))
        assert not any("before convergence" in str(w.message) for w in rec2)
        vals = np.unique(lab2[lab2 > 0])
        assert len(vals) == 1, f"snake split into {len(vals)} labels"

    def test_non_divisible_shape_is_padded(self, setup):
        """X=60 is not divisible by the 8-way 'space' axis; the pipeline must
        pad internally and trim back."""
        from skoots_tpu.infer.sharded import make_sharded_pipeline

        model, params, mesh = setup
        vol = np.random.default_rng(3).random((60, 30, 7), np.float32) * 255
        run = make_sharded_pipeline(
            model, mesh, vol.shape, vector_scale=(8.0, 8.0, 4.0),
            embed_iterations=2, cc_rounds=8,
        )
        inst = run(params, vol, 128.0, 64.0)
        assert inst.shape == (60, 30, 7)


class TestShardedAssign:
    def test_matches_unsharded_walk(self, setup):
        model, params, mesh = setup
        rng = np.random.default_rng(1)
        labels = jnp.asarray(rng.integers(0, 9, (64, 32, 8)).astype(np.int32))
        vec = jnp.asarray(rng.random((1, 64, 32, 8, 3), np.float32) * 2 - 1)
        assign = make_sharded_assign(mesh, (8.0, 8.0, 4.0), embed_iterations=3)
        inst_s = np.asarray(assign(labels, shard_volume(vec, mesh)))
        # ring label gather (X-sharded labels) must agree with replication
        assign_rep = make_sharded_assign(
            mesh, (8.0, 8.0, 4.0), embed_iterations=3,
            label_gather="replicated",
        )
        inst_rep = np.asarray(assign_rep(labels, shard_volume(vec, mesh)))
        np.testing.assert_array_equal(inst_s, inst_rep)

        from skoots_tpu.ops.vec2embed import vector_to_embedding

        emb = vector_to_embedding(jnp.asarray([8.0, 8.0, 4.0]), vec, n=3)
        idx = np.round(np.asarray(emb)).astype(np.int64)
        ix = idx[..., 0].clip(0, 63)
        iy = idx[..., 1].clip(0, 31)
        iz = idx[..., 2].clip(0, 7)
        inst_r = np.asarray(labels)[ix, iy, iz]
        inst_r = np.where(np.any(np.asarray(vec) != 0, -1), inst_r, 0)
        np.testing.assert_array_equal(inst_s, inst_r)


class TestResolveSpatialShards:
    """Auto spatial-shard selection (--spatial-shards default): every
    device when >1 is present and the sharded pipeline's per-device
    ceiling fits; host-streaming engine (0) otherwise."""

    def test_explicit_passthrough(self):
        from skoots_tpu.infer.sharded import resolve_spatial_shards

        for req in (0, 1, 4):
            assert resolve_spatial_shards(req, 8, (512, 512, 512)) == req

    def test_auto_uses_all_devices(self):
        from skoots_tpu.infer.sharded import resolve_spatial_shards

        assert resolve_spatial_shards(None, 8, (512, 512, 512)) == 8
        assert resolve_spatial_shards(None, 1, (512, 512, 512)) == 0

    def test_auto_respects_memory_ceiling(self):
        from skoots_tpu.infer.sharded import (
            estimated_bytes_per_device,
            resolve_spatial_shards,
        )

        shape = (1024, 1024, 1024)
        # the fallback bar is the RING estimate (the pipeline auto-degrades
        # its walk to ring gathers, so replication no longer caps shardability)
        need = estimated_bytes_per_device(shape, 8, "ring")
        assert resolve_spatial_shards(None, 8, shape, bytes_limit=need * 2) == 8
        assert resolve_spatial_shards(None, 8, shape, bytes_limit=need // 2) == 0
        # a volume whose replicated walk would NOT fit still shards
        rep_need = estimated_bytes_per_device(shape, 8)
        assert need < rep_need
        assert resolve_spatial_shards(
            None, 8, shape, bytes_limit=(need + rep_need) // 2) == 8

    def test_auto_caps_on_tiny_x_extent(self):
        from skoots_tpu.infer.sharded import resolve_spatial_shards

        # 16-voxel X axis cannot meaningfully shard 8 ways
        assert resolve_spatial_shards(None, 8, (16, 512, 512)) == 2

    def test_explicit_infeasible_request_errors(self, tmp_path, monkeypatch):
        """run_inference raises (with the remedy) when an explicit shard
        request exceeds the per-device ceiling, instead of OOMing."""
        import jax
        import pytest

        import skoots_tpu.infer.engine as eng
        from skoots_tpu.config import get_cfg_defaults
        from skoots_tpu.models import init_model
        from skoots_tpu.train.checkpoint import save_checkpoint
        from skoots_tpu.utils.io import imsave

        cfg = get_cfg_defaults()
        cfg.MODEL.DIMS = [4, 8, 16, 8, 4]
        cfg.MODEL.DEPTHS = [1] * 5
        cfg.MODEL.OUT_CHANNELS = 4
        model, params = init_model(cfg, jax.random.PRNGKey(0),
                                   spatial=(16, 16, 8))
        ckpt = str(tmp_path / "m.skoots")
        save_checkpoint(ckpt, cfg, params, dataset_mean=0.0, dataset_std=1.0)
        vol = str(tmp_path / "v.tif")
        imsave(vol, np.zeros((32, 32, 8), np.uint8))
        monkeypatch.setattr(
            "skoots_tpu.infer.sharded.device_bytes_limit", lambda: 1024)
        with pytest.raises(ValueError, match="host-streaming"):
            eng.run_inference(vol, ckpt, spatial_shards=8)


class TestShardedScanCC:
    def test_scan_rounds_match_and_converge_faster(self, setup):
        """cc_scans_per_round on the space-sharded CC: same partition as
        the scan-free schedule, in no more dispatches (tube runs collapse
        to one scan)."""
        import numpy as np
        from jax.sharding import NamedSharding, PartitionSpec as P

        model, params, mesh = setup
        from skoots_tpu.infer.sharded import make_sharded_pipeline

        shape = (32, 16, 8)
        x = np.zeros(shape, np.uint8)
        x[2:30, 4:6, 2:4] = 1   # tube crossing every shard seam
        x[:, 10:12, 5:7] = 1    # full-extent X run
        base = make_sharded_pipeline(model, mesh, shape,
                                     cc_propagates_per_round=4)
        fast = make_sharded_pipeline(model, mesh, shape,
                                     cc_propagates_per_round=4,
                                     cc_scans_per_round=1)
        skel = jax.device_put(jnp.asarray(x),
                              NamedSharding(mesh, P("space")))
        a = np.asarray(base.cc(skel))
        b = np.asarray(fast.cc(skel))
        pair = a.astype(np.int64) * (1 << 32) + b
        assert ((a == 0) == (b == 0)).all()
        assert len(np.unique(pair)) == len(np.unique(a)) == len(np.unique(b))
        assert len(np.unique(a)) == 3  # bg + 2 components
