"""Diagnostic: overfit ONE fixed augmented batch.

If the jitted train step cannot drive all three losses toward zero on a
single repeated batch, the targets/loss wiring is broken; if it can, poor
convergence is a schedule/data-volume problem.
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import yaml


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--outdir", default="runs/convergence")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from skoots_tpu.config import get_cfg_defaults
    from skoots_tpu.models import init_model
    from skoots_tpu.train.data import SkootsDataset
    from skoots_tpu.train.engine import (
        TrainState, cfg_optimizer, make_train_step,
    )
    from skoots_tpu.train.sigma import init_sigma
    from skoots_tpu.train.transforms import make_batch_augment
    from skoots_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = get_cfg_defaults()
    cfg.merge_from_file(os.path.join(args.outdir, "cfg.yaml"))

    ds = SkootsDataset(cfg.TRAIN.TRAIN_DATA_DIR[0], cfg, sample_per_image=1)
    mean, std = ds.mean_std(with_invert=True)
    augment = make_batch_augment(cfg, mean, std)
    host = ds.sample(np.random.default_rng(0))
    batch = augment(
        jax.random.PRNGKey(1),
        {k: jnp.asarray(v)[None] for k, v in host.items()},
    )
    print("batch:", {k: (v.shape, str(v.dtype)) for k, v in batch.items()})
    print("mask fg frac:", float((batch["masks"] > 0).mean()),
          "skele fg frac:", float((batch["skele_masks"] > 0).mean()),
          "baked nonzero frac:", float((jnp.abs(batch["baked"]).sum(-1) > 0).mean()))

    model, params = init_model(cfg, jax.random.PRNGKey(0),
                               spatial=(32, 32, 16))
    opt, schedule = cfg_optimizer(cfg)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=opt.init(params))
    step_fn = make_train_step(model, opt, schedule, init_sigma(cfg), cfg)

    for i in range(args.steps):
        state, metrics = step_fn(state, batch, jnp.int32(0),
                                 jax.random.PRNGKey(2))
        if i % 25 == 0 or i == args.steps - 1:
            print(i, {k: round(float(v), 4) for k, v in metrics.items()})


if __name__ == "__main__":
    main()
