"""Train-step tests: loss decreases, epoch gating, data-parallel sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skoots_tpu.config import get_cfg_defaults
from skoots_tpu.models import cfg_to_model
from skoots_tpu.parallel import batch_sharding, make_mesh, replicated
from skoots_tpu.train.engine import (
    TrainState,
    cfg_optimizer,
    make_train_step,
    make_eval_step,
)
from skoots_tpu.train.sigma import init_sigma


@pytest.fixture(scope="module")
def setup():
    cfg = get_cfg_defaults()
    cfg.MODEL.DIMS = [4, 8, 16, 8, 4]
    cfg.MODEL.DEPTHS = [1, 1, 1, 1, 1]
    cfg.MODEL.OUT_CHANNELS = 4
    cfg.MODEL.KERNEL_SIZE = 3
    cfg.TRAIN.LOSS_SKELETON_START_EPOCH = 10
    model = cfg_to_model(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 16, 16, 8, 1)),
        deterministic=True,
    )
    # one shared jitted step: the three step-behavior tests exercise the
    # SAME program (runtime epoch/sigma/lr inputs), so tracing it once
    # saves two full trace+lower passes of the fast suite
    optimizer, schedule = cfg_optimizer(cfg)
    sigma = init_sigma(cfg)
    step = make_train_step(model, optimizer, schedule, sigma, cfg)
    return cfg, model, params, optimizer, step


def _fresh_state(params, optimizer):
    # train steps donate their input state; always hand them a fresh copy
    p = jax.tree_util.tree_map(jnp.copy, params)
    return TrainState(
        step=jnp.zeros((), jnp.int32), params=p, opt_state=optimizer.init(p)
    )


def _batch(b=2, rng=None):
    rng = rng or np.random.default_rng(0)
    img = rng.random((b, 16, 16, 8, 1)).astype(np.float32)
    masks = np.zeros((b, 16, 16, 8, 1), np.float32)
    masks[:, 4:12, 4:12, 2:6] = 1
    baked = np.zeros((b, 16, 16, 8, 3), np.float32)
    baked[..., 0] = 8
    baked[..., 1] = 8
    baked[..., 2] = 4
    skel = np.zeros((b, 16, 16, 8, 1), np.float32)
    skel[:, 7:9, 7:9, 3:5] = 1
    return {
        "image": jnp.asarray(img),
        "masks": jnp.asarray(masks),
        "baked": jnp.asarray(baked),
        "skele_masks": jnp.asarray(skel),
    }


class TestTrainStep:
    def test_loss_decreases(self, setup):
        cfg, model, params, optimizer, step = setup
        state = _fresh_state(params, optimizer)
        batch = _batch()
        rng = jax.random.PRNGKey(1)
        losses = []
        for i in range(8):
            state, metrics = step(state, batch, jnp.asarray(0), rng)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0], losses
        assert int(state.step) == 8

    def test_epoch_gating(self, setup):
        cfg, model, params, optimizer, step = setup

        fresh = lambda: _fresh_state(params, optimizer)
        batch = _batch()
        rng = jax.random.PRNGKey(1)
        _, m_early = step(fresh(), batch, jnp.asarray(0), rng)
        _, m_late = step(fresh(), batch, jnp.asarray(11), rng)
        # skeleton loss gated off before epoch 10: total excludes it
        expected_early = float(m_early["embed"] + m_early["prob"])
        np.testing.assert_allclose(float(m_early["loss"]), expected_early, rtol=1e-5)
        expected_late = float(m_late["embed"] + m_late["prob"] + m_late["skele"])
        np.testing.assert_allclose(float(m_late["loss"]), expected_late, rtol=1e-5)

    def test_lr_schedule_applied(self, setup):
        cfg, model, params, optimizer, step = setup
        state = _fresh_state(params, optimizer)
        _, metrics = step(state, _batch(), jnp.asarray(0), jax.random.PRNGKey(0))
        np.testing.assert_allclose(
            float(metrics["lr"]), cfg.TRAIN.LEARNING_RATE, rtol=1e-6
        )

    def test_eval_step(self, setup):
        cfg, model, params = setup[:3]
        sigma = init_sigma(cfg)
        ev = make_eval_step(model, sigma, cfg)
        m = ev(params, _batch(), jnp.asarray(0))
        assert set(m) == {"embed", "prob", "skele"}
        assert all(np.isfinite(float(v)) for v in m.values())


class TestDataParallel:
    @pytest.mark.slow
    def test_sharded_step_matches_single(self, setup):
        cfg, model, params, optimizer, step_1 = setup
        _, schedule = cfg_optimizer(cfg)
        sigma = init_sigma(cfg)
        mesh = make_mesh(data=8, space=1)
        step_dp = make_train_step(model, optimizer, schedule, sigma, cfg, mesh=mesh)

        batch = _batch(b=8)
        rng = jax.random.PRNGKey(3)

        fresh = lambda: _fresh_state(params, optimizer)
        st = jax.device_put(fresh(), replicated(mesh))
        sharded_batch = {
            k: jax.device_put(v, batch_sharding(mesh, v.ndim)) for k, v in batch.items()
        }
        s_dp, m_dp = step_dp(st, sharded_batch, jnp.asarray(0), rng)
        s_1, m_1 = step_1(fresh(), batch, jnp.asarray(0), rng)
        np.testing.assert_allclose(float(m_dp["loss"]), float(m_1["loss"]), rtol=1e-4)
        # params after one step agree between DP and single-device
        l_dp = jax.tree_util.tree_leaves(s_dp.params)
        l_1 = jax.tree_util.tree_leaves(s_1.params)
        for a, b in zip(l_dp, l_1):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=2e-2, atol=2e-3,
            )
