"""Training engine: jitted data-parallel train step + epoch loop.

Re-design of /root/reference/skoots/train/engine.py:57-632. One process, one
jitted ``train_step`` sharded over the ('data','space') mesh — the mesh
replaces DDP/NCCL (grad psum is inserted by XLA), cfg-registry optimizers
come from optax, the cosine-warm-restart schedule is a pure function of the
epoch, and the loss stack / epoch gating / sigma annealing match the
reference semantics (engine.py:461-499).

The reference's 1500-step inductor warmup (engine.py:370-398) has no
analogue: XLA compiles the step once.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from skoots_tpu.config import CfgNode
from skoots_tpu.models import cfg_to_model, split_output
from skoots_tpu.ops.embed2prob import baked_embed_to_prob
from skoots_tpu.ops.vec2embed import vector_to_embedding
from skoots_tpu.parallel.mesh import batch_sharding, replicated
from skoots_tpu.train.checkpoint import load_checkpoint, restore_params, save_checkpoint
from skoots_tpu.train.losses import cfg_loss
from skoots_tpu.train.sigma import Sigma, init_sigma

log = logging.getLogger(__name__)


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any


# ------------------------------------------------------------------ registries
# (reference engine.py:37-51)


def _warm_restart_schedule(base_lr: float, t0: int) -> Callable:
    """Cosine annealing with warm restarts, stepped per-epoch
    (torch CosineAnnealingWarmRestarts equivalent, engine.py:308-310)."""

    def schedule(epoch):
        t = jnp.mod(epoch, t0).astype(jnp.float32)
        return base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * t / t0))

    return schedule


def cfg_optimizer(cfg: CfgNode) -> tuple[optax.GradientTransformation, Callable]:
    lr = cfg.TRAIN.LEARNING_RATE
    wd = cfg.TRAIN.WEIGHT_DECAY
    eps = cfg.TRAIN.OPTIMIZER_EPS
    kwargs = dict(
        zip(cfg.TRAIN.OPTIMIZER_KEYWORD_ARGUMENTS, cfg.TRAIN.OPTIMIZER_KEYWORD_VALUES)
    )
    name = cfg.TRAIN.OPTIMIZER.lower()
    if cfg.TRAIN.SCHEDULER == "cosine_annealing_warm_restarts":
        schedule = _warm_restart_schedule(lr, cfg.TRAIN.SCHEDULER_T0)
    else:
        schedule = lambda e: jnp.asarray(lr)

    # lr is injected per-epoch via inject_hyperparams so the schedule can be
    # driven by epoch (reference steps the torch scheduler once per epoch)
    if name == "adamw":
        opt = optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr, weight_decay=wd, eps=eps, **kwargs
        )
    elif name == "adam":
        opt = optax.inject_hyperparams(optax.adam)(learning_rate=lr, eps=eps, **kwargs)
    elif name == "sgd":
        opt = optax.inject_hyperparams(optax.sgd)(learning_rate=lr, **kwargs)
    elif name == "adamax":
        opt = optax.inject_hyperparams(optax.adamax)(learning_rate=lr, eps=eps, **kwargs)
    else:
        raise RuntimeError(f"unknown optimizer {name!r}")
    return opt, schedule


# ------------------------------------------------------------------ train step


def _make_host_consts(sigma: Sigma, schedule: Callable | None):
    """Per-epoch (sigma, lr) computed host-side and memoized.

    These feed the jitted step as runtime arrays so schedule constants
    never land in the HLO (see make_train_step).
    """
    import numpy as np

    cache: Dict[int, tuple] = {}

    def host_consts(e: int):
        if e not in cache:
            sig = jnp.asarray(sigma.host(e))
            lr = (
                jnp.asarray(np.float32(jax.device_get(schedule(e))))
                if schedule is not None else None
            )
            cache[e] = (sig, lr)
        return cache[e]

    return host_consts


def make_train_step(
    model,
    optimizer: optax.GradientTransformation,
    schedule: Callable,
    sigma: Sigma,
    cfg: CfgNode,
    mesh=None,
):
    """Build the jitted train step.

    Batch dict (channels-last, all fixed shapes):
        image:       [B, X, Y, Z, 1] float32 (normalized)
        masks:       [B, X, Y, Z, 1] float32 (binary foreground)
        baked:       [B, X, Y, Z, 3] float32 (baked skeleton coordinates)
        skele_masks: [B, X, Y, Z, 1] float32 (binary skeleton stamp)
    """
    vector_scale = jnp.asarray(cfg.SKOOTS.VECTOR_SCALING, jnp.float32)
    loss_embed = cfg_loss(
        cfg.TRAIN.LOSS_EMBED, cfg.TRAIN.LOSS_EMBED_KEYWORDS, cfg.TRAIN.LOSS_EMBED_VALUES
    )
    loss_prob = cfg_loss(
        cfg.TRAIN.LOSS_PROBABILITY,
        cfg.TRAIN.LOSS_PROBABILITY_KEYWORDS,
        cfg.TRAIN.LOSS_PROBABILITY_VALUES,
    )
    loss_skele = cfg_loss(
        cfg.TRAIN.LOSS_SKELETON,
        cfg.TRAIN.LOSS_SKELETON_KEYWORDS,
        cfg.TRAIN.LOSS_SKELETON_VALUES,
    )
    w_e = cfg.TRAIN.LOSS_EMBED_RELATIVE_WEIGHT
    w_p = cfg.TRAIN.LOSS_PROBABILITY_RELATIVE_WEIGHT
    w_s = cfg.TRAIN.LOSS_SKELETON_RELATIVE_WEIGHT
    e0_e = cfg.TRAIN.LOSS_EMBED_START_EPOCH
    e0_p = cfg.TRAIN.LOSS_PROBABILITY_START_EPOCH
    e0_s = cfg.TRAIN.LOSS_SKELETON_START_EPOCH

    def loss_fn(params, batch, epoch, sigma_value, rngs):
        out = model.apply(params, batch["image"], deterministic=False, rngs=rngs)
        vec, skel, prob = split_output(out)
        embedding = vector_to_embedding(vector_scale, vec)
        embed_prob = baked_embed_to_prob(embedding, batch["baked"], sigma_value)

        gt_fg = (batch["masks"] > 0).astype(jnp.float32)
        gt_skel = (batch["skele_masks"] > 0).astype(jnp.float32)

        l_e = loss_embed(embed_prob, gt_fg)
        l_p = loss_prob(prob, gt_fg)
        l_s = loss_skele(skel, gt_skel)

        # epoch gating (reference engine.py:480-496; strict >)
        g_e = (epoch > e0_e).astype(jnp.float32)
        g_p = (epoch > e0_p).astype(jnp.float32)
        g_s = (epoch > e0_s).astype(jnp.float32)
        total = w_e * g_e * l_e + w_p * g_p * l_p + w_s * g_s * l_s
        return total, {"loss": total, "embed": l_e, "prob": l_p, "skele": l_s}

    def train_step(state: TrainState, batch: Dict, epoch: jax.Array,
                   rng: jax.Array, sigma_value: jax.Array, lr: jax.Array):
        rngs = {"droppath": jax.random.fold_in(rng, state.step)}
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, epoch, sigma_value, rngs
        )
        # set per-epoch lr (inject_hyperparams exposes .hyperparams)
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = lr
        updates, new_opt = optimizer.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["lr"] = lr
        return TrainState(step=state.step + 1, params=params, opt_state=new_opt), metrics

    if mesh is not None:
        bs = lambda nd: batch_sharding(mesh, nd)
        rep = replicated(mesh)
        batch_shardings = {
            "image": bs(5), "masks": bs(5), "baked": bs(5), "skele_masks": bs(5),
        }
        jitted = jax.jit(
            train_step,
            in_shardings=(rep, batch_shardings, rep, rep, rep, rep),
            out_shardings=(rep, rep),
            donate_argnums=(0,),
        )
    else:
        jitted = jax.jit(train_step, donate_argnums=(0,))

    # Sigma and lr enter the compiled program as runtime inputs, computed
    # on the host per epoch: editing SIGMA_DECAY / NUM_EPOCHS (which moves
    # the optax schedule's constants) then reuses the cached executable
    # instead of forcing a multi-minute recompile.
    host_consts = _make_host_consts(sigma, schedule)

    def step(state, batch, epoch, rng):
        e = int(epoch)
        sig, lr = host_consts(e)
        return jitted(state, batch, jnp.asarray(e, jnp.int32), rng, sig, lr)

    # expose the pieces for perf attribution (tools/bench_train.py --split)
    step.loss_fn = loss_fn
    step.host_consts = host_consts
    return step


def make_eval_step(model, sigma: Sigma, cfg: CfgNode):
    """Validation step (no grad), same loss stack (engine.py:536-625)."""
    vector_scale = jnp.asarray(cfg.SKOOTS.VECTOR_SCALING, jnp.float32)
    loss_embed = cfg_loss(
        cfg.TRAIN.LOSS_EMBED, cfg.TRAIN.LOSS_EMBED_KEYWORDS, cfg.TRAIN.LOSS_EMBED_VALUES
    )
    loss_prob = cfg_loss(
        cfg.TRAIN.LOSS_PROBABILITY,
        cfg.TRAIN.LOSS_PROBABILITY_KEYWORDS,
        cfg.TRAIN.LOSS_PROBABILITY_VALUES,
    )
    loss_skele = cfg_loss(
        cfg.TRAIN.LOSS_SKELETON,
        cfg.TRAIN.LOSS_SKELETON_KEYWORDS,
        cfg.TRAIN.LOSS_SKELETON_VALUES,
    )

    @jax.jit
    def jitted(params, batch, sigma_value):
        out = model.apply(params, batch["image"], deterministic=True)
        vec, skel, prob = split_output(out)
        embedding = vector_to_embedding(vector_scale, vec)
        embed_prob = baked_embed_to_prob(embedding, batch["baked"], sigma_value)
        gt_fg = (batch["masks"] > 0).astype(jnp.float32)
        gt_skel = (batch["skele_masks"] > 0).astype(jnp.float32)
        return {
            "embed": loss_embed(embed_prob, gt_fg),
            "prob": loss_prob(prob, gt_fg),
            "skele": loss_skele(skel, gt_skel),
        }

    host_consts = _make_host_consts(sigma, None)

    def eval_step(params, batch, epoch):
        sig, _ = host_consts(int(epoch))
        return jitted(params, batch, sig)

    return eval_step


# ------------------------------------------------------------------ full loop


def train(
    cfg: CfgNode,
    data_iter: Callable[[int], Any],
    val_iter: Optional[Callable[[int], Any]] = None,
    dataset_mean: float = 0.0,
    dataset_std: float = 1.0,
    writer=None,
    mesh=None,
    init_spatial=(64, 64, 16),
    object_radius: Optional[float] = None,
) -> TrainState:
    """Run the training loop.

    ``data_iter(epoch)`` yields batch dicts (see make_train_step). This
    engine is deliberately I/O-agnostic: the dataset/transform pipeline in
    skoots_tpu.train.data builds such iterators.
    """
    # observability knobs (reference engine.py:253-256): the autograd
    # profiler maps to a jax.profiler trace, detect_anomaly to debug_nans
    if cfg.TRAIN.AUTOGRAD_DETECT_ANOMALY:
        jax.config.update("jax_debug_nans", True)
    profile_dir = None
    if cfg.TRAIN.AUTOGRAD_PROFILE:
        profile_dir = os.path.join(cfg.TRAIN.SAVE_PATH, "jax_trace")
        os.makedirs(profile_dir, exist_ok=True)
        jax.profiler.start_trace(profile_dir)
        log.info("jax profiler trace -> %s", profile_dir)

    rng = jax.random.PRNGKey(cfg.TRAIN.SEED)
    model = cfg_to_model(cfg)
    params = model.init(
        {"params": rng}, jnp.zeros((1, *init_spatial, 1), jnp.float32),
        deterministic=True,
    )

    if cfg.TRAIN.PRETRAINED_MODEL_PATH:
        ckpt = load_checkpoint(cfg.TRAIN.PRETRAINED_MODEL_PATH[0])
        params = restore_params(params, ckpt["params"])
        log.info("loaded pretrained params from %s", cfg.TRAIN.PRETRAINED_MODEL_PATH[0])

    optimizer, schedule = cfg_optimizer(cfg)
    opt_state = optimizer.init(params)
    if cfg.TRAIN.LOAD_PRETRAINED_OPTIMIZER and cfg.TRAIN.PRETRAINED_MODEL_PATH:
        ckpt = load_checkpoint(cfg.TRAIN.PRETRAINED_MODEL_PATH[0])
        if ckpt.get("opt_state") is not None:
            opt_state = restore_params(opt_state, ckpt["opt_state"])

    state = TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=opt_state)
    if mesh is not None:
        state = jax.device_put(state, replicated(mesh))

    sigma = init_sigma(cfg)
    train_step = make_train_step(model, optimizer, schedule, sigma, cfg, mesh)
    eval_step = make_eval_step(model, sigma, cfg) if val_iter else None

    os.makedirs(cfg.TRAIN.SAVE_PATH, exist_ok=True)
    save_name = os.path.join(
        cfg.TRAIN.SAVE_PATH, time.strftime("%b%d_%H-%M-%S") + ".skoots"
    )

    vector_scale = jnp.asarray(cfg.SKOOTS.VECTOR_SCALING, jnp.float32)

    @jax.jit
    def _panel_forward(params, image, baked, epoch):
        out = model.apply(params, image, deterministic=True)
        from skoots_tpu.models import split_output

        vec, skel, _ = split_output(out)
        emb = vector_to_embedding(vector_scale, vec)
        prob = baked_embed_to_prob(emb, baked, sigma(epoch))
        return vec, skel, prob

    epochs = cfg.TRAIN.NUM_EPOCHS
    for e in range(epochs):
        t0 = time.time()
        agg: Dict[str, list] = {}
        last_batch = None
        for batch in data_iter(e):
            rng, sub = jax.random.split(rng)
            last_batch = batch
            state, metrics = train_step(state, batch, jnp.asarray(e), sub)
            for k, v in metrics.items():
                agg.setdefault(k, []).append(v)
        means = {k: float(np.mean([np.asarray(v) for v in vs])) for k, vs in agg.items()}
        log.info("epoch %d: %s (%.2fs)", e, means, time.time() - t0)
        if writer is not None:
            for k, v in means.items():
                writer.add_scalar(f"Loss/{k}" if k != "lr" else "lr", v, e)
            if last_batch is not None:
                # mid-slice image panels (reference write_progress,
                # train/utils.py:142-211)
                from skoots_tpu.train.viz import write_progress

                vec, skel, prob = _panel_forward(
                    state.params, last_batch["image"], last_batch["baked"],
                    jnp.asarray(e),
                )
                write_progress(
                    writer, "Train", e,
                    images=np.asarray(last_batch["image"]),
                    masks=np.asarray(last_batch["masks"]),
                    vector=np.asarray(vec),
                    embed_prob=np.asarray(prob),
                    predicted_skeleton=np.asarray(skel),
                    gt_skeleton=np.asarray(last_batch["skele_masks"]),
                )

        if val_iter and eval_step and e % cfg.TRAIN.VALIDATE_EPOCH_SKIP == 0:
            vagg: Dict[str, list] = {}
            for batch in val_iter(e):
                m = eval_step(state.params, batch, jnp.asarray(e))
                for k, v in m.items():
                    vagg.setdefault(k, []).append(v)
            vmeans = {k: float(np.mean([np.asarray(v) for v in vs])) for k, vs in vagg.items()}
            log.info("epoch %d validation: %s", e, vmeans)
            if writer is not None:
                for k, v in vmeans.items():
                    writer.add_scalar(f"Validation/{k}", v, e)

        if (e + 1) % cfg.TRAIN.SAVE_INTERVAL == 0 or e == epochs - 1:
            save_checkpoint(
                save_name, cfg, state.params, state.opt_state,
                dataset_mean=dataset_mean, dataset_std=dataset_std,
                extra={"epoch": e, "object_radius": object_radius},
            )
            log.info("checkpoint -> %s", save_name)

    if profile_dir is not None:
        jax.profiler.stop_trace()
        log.info("profiler trace written to %s", profile_dir)
    return state
