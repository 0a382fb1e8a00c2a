"""Sparse (weakly-supervised) training engine.

Re-design of /root/reference/skoots/experimental/sparse_engine.py:56-565:
same skeleton as the dense engine, but the loss re-bakes merged skeletons on
the fly (sparse_loss), the "probability" head is supervised by the
thresholded embedding probability, SWA parameter averaging runs after
``swa_start``, and non-finite losses skip the update (NaN guard,
sparse_engine.py:435-441) — here as a ``where`` on the whole update, inside
jit.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from skoots_tpu.config import CfgNode
from skoots_tpu.models import cfg_to_model, split_output
from skoots_tpu.ops.vec2embed import vector_to_embedding
from skoots_tpu.experimental.sparse_loss import sparse_loss
from skoots_tpu.train.checkpoint import save_checkpoint
from skoots_tpu.train.engine import TrainState, cfg_optimizer
from skoots_tpu.train.losses import cfg_loss
from skoots_tpu.train.sigma import init_sigma

log = logging.getLogger(__name__)


def make_sparse_augment(cfg: CfgNode, dataset_mean=0.0, dataset_std=1.0):
    """Sparse variant of the augmentation: threads (image, background,
    skeleton-mask, points) through the shared geometric core
    (reference SparseTransformFromCfg, sparse_transforms.py:22-454)."""
    from skoots_tpu.train.transforms import make_augment

    dense = make_augment(cfg, dataset_mean, dataset_std)
    core = dense.geometric_core

    def augment(rng, sample):
        image, background, skel_mask, pts, ids = core(rng, sample)
        return {
            "image": image[..., None],
            "background": (background > 0).astype(jnp.float32)[..., None],
            "skele_masks": (skel_mask > 0).astype(jnp.float32)[..., None],
            "points": pts,
            "valid": ids != 0,
        }

    @jax.jit
    def batch_augment(rng, samples):
        keys = jax.random.split(rng, samples["image"].shape[0])
        return jax.vmap(augment)(keys, samples)

    return batch_augment


def make_sparse_train_step(model, optimizer, schedule, sigma, cfg: CfgNode):
    vector_scale = jnp.asarray(cfg.SKOOTS.VECTOR_SCALING, jnp.float32)
    loss_skele = cfg_loss(
        cfg.TRAIN.LOSS_SKELETON, cfg.TRAIN.LOSS_SKELETON_KEYWORDS,
        cfg.TRAIN.LOSS_SKELETON_VALUES,
    )
    anisotropy = tuple(cfg.AUGMENTATION.BAKE_SKELETON_ANISOTROPY)
    thr = cfg.EXPERIMENTAL.DIST_THR
    mult = cfg.EXPERIMENTAL.SPARSE_BACKGROUND_PENALTY_MULTIPLIER
    w_e = cfg.TRAIN.LOSS_EMBED_RELATIVE_WEIGHT
    w_p = cfg.TRAIN.LOSS_PROBABILITY_RELATIVE_WEIGHT
    w_s = cfg.TRAIN.LOSS_SKELETON_RELATIVE_WEIGHT
    e0_e = cfg.TRAIN.LOSS_EMBED_START_EPOCH
    e0_p = cfg.TRAIN.LOSS_PROBABILITY_START_EPOCH
    e0_s = cfg.TRAIN.LOSS_SKELETON_START_EPOCH

    def loss_fn(params, batch, epoch, sigma_value):
        out = model.apply(params, batch["image"], deterministic=True)
        vec, skel, prob = split_output(out)
        embedding = vector_to_embedding(vector_scale, vec)
        l_bg, l_embed, _ = sparse_loss(
            embed=embedding,
            vectors=vec * vector_scale.reshape(1, 1, 1, 1, 3),
            points=batch["points"],
            valid=batch["valid"],
            background=batch["background"],
            semantic=prob,
            sigma=sigma_value,
            anisotropy=anisotropy,
            distance_thr=thr,
            bg_multiplier=mult,
        )
        l_skel = loss_skele(skel, (batch["skele_masks"] > 0).astype(jnp.float32))
        g_e = (epoch > e0_e).astype(jnp.float32)
        g_p = (epoch > e0_p).astype(jnp.float32)
        g_s = (epoch > e0_s).astype(jnp.float32)
        total = w_e * g_e * l_embed + w_p * g_p * l_bg + w_s * g_s * l_skel
        return total, {"loss": total, "embed": l_embed, "prob": l_bg, "skele": l_skel}

    @jax.jit
    def jitted(state: TrainState, batch: Dict, epoch: jax.Array,
               sigma_value: jax.Array, lr: jax.Array):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, epoch, sigma_value
        )
        state.opt_state.hyperparams["learning_rate"] = lr
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # NaN guard: skip the whole update when the loss is non-finite
        ok = jnp.isfinite(metrics["loss"])
        params = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), new_params, state.params
        )
        return TrainState(step=state.step + 1, params=params, opt_state=new_opt), metrics

    # sigma/lr are runtime inputs computed host-side per epoch, so protocol
    # edits (SIGMA_DECAY, NUM_EPOCHS) reuse the cached executable — the
    # first remote compile of this step costs tens of minutes
    from skoots_tpu.train.engine import _make_host_consts

    host_consts = _make_host_consts(sigma, schedule)

    def train_step(state, batch, epoch):
        e = int(epoch)
        sig, lr = host_consts(e)
        return jitted(state, batch, jnp.asarray(e, jnp.int32), sig, lr)

    return train_step


def make_threshold_calibrator(model, cfg: CfgNode, dataset, mean, std,
                              n_crops: int = 8):
    """Train-time semantic-threshold self-calibration for sparse
    checkpoints.

    Sparse supervision never shows the semantic head a true boundary, so
    the probability level that separates object from background is a
    property of the training regime — measured round 4: the learned
    transition sat at prob ~0.998, and the dense pipeline's fixed 0.8
    produced 3x-fat masks (runs/accuracy/sparse/calibration.json). The
    calibrator matches predicted foreground volume to the supervised
    geometry (the DIST_THR ball around annotated skeletons) on raw
    training crops and returns the matched threshold, which the engine
    then adopts at inference (run_inference semantic_threshold=None).
    The reference has no counterpart — its sparse checkpoints are scored
    with hand-tuned experimental knobs (experimental/eval.py:138-146)."""
    import jax

    from skoots_tpu.infer.autoknobs import (
        calibrate_semantic_threshold,
        sparse_target_fg_fraction,
    )

    crop = (cfg.AUGMENTATION.CROP_WIDTH, cfg.AUGMENTATION.CROP_HEIGHT,
            cfg.AUGMENTATION.CROP_DEPTH)
    aniso = tuple(cfg.AUGMENTATION.BAKE_SKELETON_ANISOTROPY)
    dist_thr = float(cfg.EXPERIMENTAL.DIST_THR)

    @jax.jit
    def prob_fn(params, img):
        out = model.apply(params, (img - mean) / std, deterministic=True)
        return out[..., 4]

    def calibrate(params) -> Optional[float]:
        rng = np.random.default_rng(cfg.TRAIN.SEED + 7)
        probs, fracs = [], []
        for _ in range(n_crops):
            s = dataset.sample(rng)
            # measure probabilities on the CENTERED train-crop window — the
            # same window the target fraction is computed on (the quantile
            # match below is a volume-fraction match, so the two windows
            # must coincide), and ~100x fewer voxels than the raw
            # pre-augmentation sample (round-4 measurement: the full
            # 332x332x8 pre-crop made this loop 48 s of a 63 s train test)
            img = s["image"]
            # the sample pads at the END (reflect), so the real data —
            # and the annotated object — sits at the low corner; center
            # the window on the sampled skeleton center, clipped in-bounds
            off = np.clip(
                np.round(s["center"] - np.asarray(crop, np.float32) / 2),
                0, np.asarray(img.shape, np.float32) - np.asarray(crop),
            ).astype(np.float32)
            win = tuple(
                slice(int(o), int(o) + c) for o, c in zip(off, crop)
            )
            img = img[win]
            pts, ids = s["points"] - off[None, :], s["ids"]
            inside = (ids > 0) & np.all(
                (pts >= 0) & (pts < np.asarray(crop, np.float32)), axis=1
            )
            skels = {1: pts[inside]} if inside.any() else {}
            frac = sparse_target_fg_fraction(skels, crop, dist_thr, aniso)
            if frac is None:
                continue
            p = prob_fn(params, jnp.asarray(img[None, ..., None]))
            probs.append(np.asarray(p, np.float32).ravel())
            fracs.append(frac)
        if not fracs:
            return None
        return calibrate_semantic_threshold(
            np.concatenate(probs), float(np.mean(fracs))
        )

    return calibrate


def train_sparse(cfg: CfgNode, steps_per_epoch=None) -> TrainState:
    from skoots_tpu.experimental.data import SparseDataset
    from skoots_tpu.train.data import batch_iterator

    datasets = [
        SparseDataset(d, cfg, sample_per_image=s)
        for d, s in zip(cfg.TRAIN.TRAIN_DATA_DIR, cfg.TRAIN.TRAIN_SAMPLE_PER_IMAGE)
    ]
    records = [r for d in datasets for r in d.records]
    mean = float(np.mean([r.image.mean() for r in records]))
    std = float(np.mean([r.image.std() for r in records])) or 1.0

    # data-derived DIST_THR sanity check (round-3 sparse attempt 1 failed
    # on exactly this regime mismatch): suggest half the minimum
    # inter-instance skeleton-point spacing and flag a config that differs
    # by more than 2x in either direction
    from skoots_tpu.infer.autoknobs import suggest_dist_thr_from_points

    suggestions = [
        s for r in records
        for s in [suggest_dist_thr_from_points(r.skeletons)] if s is not None
    ]
    if suggestions:
        sugg = float(np.median(suggestions))
        thr = float(cfg.EXPERIMENTAL.DIST_THR)
        if thr > 2 * sugg or thr < sugg / 2:
            log.warning(
                "EXPERIMENTAL.DIST_THR=%.1f is far from the data-derived "
                "suggestion %.1f (half the minimum inter-instance skeleton "
                "spacing): too large pulls voxels toward other instances' "
                "skeletons, too small starves supervision", thr, sugg,
            )
        else:
            log.info("DIST_THR=%.1f (data-derived suggestion: %.1f)",
                     thr, sugg)

    class _Multi:
        def __len__(self):
            return sum(len(d) for d in datasets)

        def sample(self, rng):
            return datasets[rng.integers(len(datasets))].sample(rng)

    dataset = _Multi()
    bsz = cfg.TRAIN.TRAIN_BATCH_SIZE
    steps = steps_per_epoch or max(1, len(dataset) // bsz)
    from skoots_tpu.train.data import prefetch_iterator

    host_iter = prefetch_iterator(batch_iterator(dataset, bsz, steps,
                                                 cfg.TRAIN.SEED))
    augment = make_sparse_augment(cfg, mean, std)

    rng = jax.random.PRNGKey(cfg.TRAIN.SEED)
    model = cfg_to_model(cfg)
    crop = (cfg.AUGMENTATION.CROP_WIDTH, cfg.AUGMENTATION.CROP_HEIGHT,
            cfg.AUGMENTATION.CROP_DEPTH)
    params = model.init(
        {"params": rng}, jnp.zeros((1, *crop, 1), jnp.float32), deterministic=True
    )
    optimizer, schedule = cfg_optimizer(cfg)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=optimizer.init(params)
    )
    sigma = init_sigma(cfg)
    step_fn = make_sparse_train_step(model, optimizer, schedule, sigma, cfg)
    calibrate = make_threshold_calibrator(model, cfg, dataset, mean, std)

    # SWA (sparse_engine.py:297-299, 448-449): running average after swa_start
    epochs = cfg.TRAIN.NUM_EPOCHS
    swa_start = int(epochs * 0.75)
    swa_params, swa_n = None, 0

    os.makedirs(cfg.TRAIN.SAVE_PATH, exist_ok=True)
    save_name = os.path.join(
        cfg.TRAIN.SAVE_PATH, time.strftime("%b%d_%H-%M-%S") + "_sparse.skoots"
    )

    for e in range(epochs):
        t0 = time.time()
        agg = {}
        for host_batch in host_iter(e):
            rng, sub = jax.random.split(rng)
            batch = augment(sub, {k: jnp.asarray(v) for k, v in host_batch.items()})
            state, metrics = step_fn(state, batch, jnp.asarray(e))
            # keep metrics as DEVICE arrays here: a float() per metric per
            # step is a blocking scalar round trip that serializes dispatch
            # (measured ~6x epoch inflation through the relay vs the dense
            # engine's once-per-epoch sync, train/engine.py:344-345)
            for k, v in metrics.items():
                agg.setdefault(k, []).append(v)
        log.info(
            "sparse epoch %d: %s (%.2fs)", e,
            {k: float(np.mean([np.asarray(x) for x in v]))
             for k, v in agg.items()},
            time.time() - t0,
        )
        if e >= swa_start:
            if swa_params is None:
                swa_params, swa_n = state.params, 1
            else:
                swa_n += 1
                swa_params = jax.tree_util.tree_map(
                    lambda avg, new: avg + (new - avg) / swa_n, swa_params, state.params
                )
        if (e + 1) % cfg.TRAIN.SAVE_INTERVAL == 0 or e == epochs - 1:
            save_params = swa_params if swa_params is not None else state.params
            sem_thr = calibrate(save_params)
            if sem_thr is not None:
                log.info("calibrated semantic threshold: %.6f", sem_thr)
            save_checkpoint(
                save_name, cfg, save_params,
                state.opt_state, dataset_mean=mean, dataset_std=std,
                extra={"epoch": e, "swa": swa_params is not None,
                       "calibrated_prob_threshold": sem_thr},
            )
            log.info("checkpoint -> %s", save_name)
    return state
