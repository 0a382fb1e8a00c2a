"""Backward attribution at the reference training envelope (304^2x24 B1).

runs/bench_train.json puts grad_s at 3.86 s there while the forward is
0.46 s — 8.3x, where ~2-3x is the expected fwd:bwd FLOP ratio — and the
wgrad-kernel swap moved nothing (the microbenched 383 ms XLA wgrad was
never the step's real cost). This times jax.grad of nested slices of the
computation so the 3.4 s of unexplained backward lands on a component:

  rows: model-only grad (sum of outputs), loss-only grad (full loss),
        per-stage block grads at the envelope's stage shapes, upsample /
        downsample / stem grads.

BWD_SHAPE / BWD_BATCH env knobs; writes runs/bench_bwd_split.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed_grad(fn, args, iters=4):
    import jax

    g = jax.jit(jax.grad(fn))
    out = g(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main() -> int:
    import jax
    import jax.numpy as jnp

    from skoots_tpu.config import get_cfg_defaults
    from skoots_tpu.models import cfg_to_model
    from skoots_tpu.train.engine import cfg_optimizer, make_train_step, TrainState
    from skoots_tpu.train.sigma import init_sigma
    from skoots_tpu.utils.compile_cache import enable_compilation_cache

    if os.environ.get("BWD_CPU"):
        jax.config.update("jax_platforms", "cpu")
    enable_compilation_cache()

    bx, by, bz = (int(v) for v in os.environ.get(
        "BWD_SHAPE", "304,304,24").split(","))
    b = int(os.environ.get("BWD_BATCH", "1"))

    cfg = get_cfg_defaults()
    model = cfg_to_model(cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng},
                        jnp.zeros((1, 64, 64, 16, 1), jnp.float32),
                        deterministic=True)
    x = jax.random.normal(rng, (b, bx, by, bz, 1), jnp.float32)

    rows = {}

    def model_sum(p, xin):
        return jnp.sum(model.apply(p, xin, deterministic=True)
                       .astype(jnp.float32))

    t = _timed_grad(model_sum, (params, x))
    rows["model_grad_s"] = round(t, 4)
    print("model grad:", rows["model_grad_s"], flush=True)

    # full loss grad via the engine's own loss (isolates loss-bwd overhead)
    optimizer, schedule = cfg_optimizer(cfg)
    sigma = init_sigma(cfg)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=optimizer.init(params))
    step = make_train_step(model, optimizer, schedule, sigma, cfg)
    batch = {
        "image": x,
        "masks": jnp.ones((b, bx, by, bz, 1), jnp.float32),
        "baked": jnp.zeros((b, bx, by, bz, 3), jnp.float32),
        "skele_masks": jnp.ones((b, bx, by, bz, 1), jnp.float32),
    }
    state2, m = step(state, batch, 0, rng)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    iters = 4
    for _ in range(iters):
        state2, m = step(state2, batch, 0, rng)
    jax.block_until_ready(m["loss"])
    rows["full_step_s"] = round((time.perf_counter() - t0) / iters, 4)
    print("full step:", rows["full_step_s"], flush=True)

    # per-component grads at the envelope's stage shapes
    from skoots_tpu.kernels.upsample import upsample2x_trilinear
    from skoots_tpu.models.unext import ConvNeXtBlock3D

    dims = list(cfg.MODEL.DIMS)
    stage_shapes = [
        (dims[0], (b, bx, by, bz)),
        (dims[1], (b, bx // 2, by // 2, bz // 2)),
        (dims[2], (b, bx // 4, by // 4, bz // 4)),
    ]
    for c, shp in stage_shapes:
        blk = ConvNeXtBlock3D(dim=c, kernel_size=cfg.MODEL.KERNEL_SIZE)
        xin = jax.random.normal(rng, (*shp, c), jnp.float32)
        bp = blk.init({"params": rng}, xin, deterministic=True)

        def blk_sum(p, xin):
            return jnp.sum(blk.apply(p, xin, deterministic=True)
                           .astype(jnp.float32))

        t = _timed_grad(blk_sum, (bp, xin))
        rows[f"block_C{c}_grad_s"] = round(t, 4)
        print(f"block C={c} {shp}: {t:.4f}", flush=True)

        def up_sum(xin):
            return jnp.sum(upsample2x_trilinear(xin).astype(jnp.float32))

        if c != dims[0]:
            t = _timed_grad(up_sum, (xin,))
            rows[f"upsample_C{c}_grad_s"] = round(t, 4)
            print(f"upsample C={c}: {t:.4f}", flush=True)

    out = {"shape": [b, bx, by, bz], "rows": rows,
           "dwgrad_impl": os.environ.get("SKOOTS_DWGRAD_IMPL", "auto"),
           "dgrad_impl": os.environ.get("SKOOTS_DGRAD_IMPL", "pallas")}
    with open("runs/bench_bwd_split.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
