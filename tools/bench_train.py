"""Measured training-step throughput for the flagship config on v5e.

BASELINE §6 has only inference figures; this records the training
envelope: jitted fwd+bwd+adamw step time, voxels/s, and analytic MFU
(fwd+bwd FLOPs = 3x forward) at two geometries:
- the campaign crop (96^2x32, B=2) — what every accuracy run trains at;
- a reference-envelope crop (304^2x24, B=1) — the reference trains at
  300x300x20 fp16/bf16 per GPU (reference engine.py:107-115, config).

Timing: the step is self-sequencing (state feeds back), so wall-clock
over K dependent steps after a warmup is honest through the relay.
Writes runs/bench_train.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from skoots_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from skoots_tpu.config import get_cfg_defaults
    from skoots_tpu.models import cfg_to_model
    from skoots_tpu.train.engine import TrainState, make_train_step
    from skoots_tpu.train.engine import cfg_optimizer
    from skoots_tpu.train.sigma import init_sigma
    from skoots_tpu.validate.stats import analytic_unext_flops

    rows = []
    for label, (bx, by, bz), batch_n in (
        ("campaign 96^2x32 B2", (96, 96, 32), 2),
        ("reference-envelope 304^2x24 B1", (304, 304, 24), 1),
    ):
        cfg = get_cfg_defaults()
        cfg.defrost()
        cfg.TRAIN.SAVE_PATH = "/tmp/bench_train_ckpt"
        cfg.freeze()
        rng = jax.random.PRNGKey(0)
        model = cfg_to_model(cfg)
        params = model.init(
            {"params": rng}, jnp.zeros((1, 64, 64, 16, 1), jnp.float32),
            deterministic=True,
        )
        optimizer, schedule = cfg_optimizer(cfg)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           opt_state=optimizer.init(params))
        sigma = init_sigma(cfg)
        step = make_train_step(model, optimizer, schedule, sigma, cfg)

        batch = {
            "image": jax.random.normal(rng, (batch_n, bx, by, bz, 1),
                                       jnp.float32),
            "masks": jnp.ones((batch_n, bx, by, bz, 1), jnp.float32),
            "baked": jnp.zeros((batch_n, bx, by, bz, 3), jnp.float32),
            "skele_masks": jnp.ones((batch_n, bx, by, bz, 1), jnp.float32),
        }
        # make_train_step returns step(state, batch, epoch, rng): sigma/lr
        # are computed host-side per epoch and fed as runtime inputs
        t0 = time.perf_counter()
        state, metrics = step(state, batch, 0, rng)
        jax.block_until_ready(metrics["loss"])
        compile_s = time.perf_counter() - t0

        iters = 8
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, batch, 0, rng)
        jax.block_until_ready(metrics["loss"])
        dt = (time.perf_counter() - t0) / iters

        # step-time attribution: forward alone, loss (fwd + targets +
        # tversky stack), grad (fwd+bwd); optimizer = step - grad
        split = {}
        try:
            loss_fn = step.loss_fn
            sig, _lr = step.host_consts(0)
            rngs = {"droppath": rng}
            ep = jnp.asarray(0, jnp.int32)

            def timed(fn, *args, n=8):
                out = fn(*args)
                jax.block_until_ready(out)
                t0 = time.perf_counter()
                for _ in range(n):
                    out = fn(*args)
                jax.block_until_ready(out)
                return (time.perf_counter() - t0) / n

            fwd = jax.jit(lambda p, img: model.apply(
                p, img, deterministic=False, rngs=rngs))
            split["fwd_s"] = round(timed(fwd, state.params, batch["image"]), 4)
            lossj = jax.jit(lambda p, b: loss_fn(p, b, ep, sig, rngs)[0])
            split["loss_s"] = round(timed(lossj, state.params, batch), 4)
            gradj = jax.jit(lambda p, b: jax.grad(
                lambda q: loss_fn(q, b, ep, sig, rngs)[0])(p))
            split["grad_s"] = round(timed(gradj, state.params, batch), 4)
            split["optimizer_s"] = round(max(dt - split["grad_s"], 0.0), 4)
        except Exception as e:  # attribution is best-effort
            split = {"error": str(e)[:200]}

        vox = batch_n * bx * by * bz
        try:
            fwd_flops = analytic_unext_flops(
                cfg.MODEL.DIMS, cfg.MODEL.DEPTHS, cfg.MODEL.KERNEL_SIZE,
                cfg.MODEL.OUT_CHANNELS, vox,
            )
        except Exception:
            fwd_flops = None
        row = {
            "case": label,
            "step_s": round(dt, 4),
            "vox_per_s": round(vox / dt, 1),
            "compile_s": round(compile_s, 1),
            "loss_finite": bool(jnp.isfinite(metrics["loss"])),
            "split": split,
        }
        if fwd_flops:
            train_flops = 3.0 * fwd_flops  # fwd + ~2x in bwd
            row["train_tflops"] = round(train_flops / dt / 1e12, 2)
            row["mfu_train"] = round(train_flops / dt / 197e12, 4)
        rows.append(row)
        print(json.dumps(row), flush=True)

    with open("runs/bench_train.json", "w") as f:
        json.dump({"backend": jax.default_backend(), "rows": rows}, f,
                  indent=1)
    print("wrote runs/bench_train.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
