"""Assign-phase walk schedule A/B at one assign-tile scale (256x256x64).

The phantom bench (runs/bench_r05a.json) put phase 3 at 10.4 s — real
trained vectors run most of the 10-step embedding walk, where the old
noise volume converged after one step. Each walk step is a full-tile
gather, so steps are the whole cost. This measures, with the committed
bench checkpoint on a rendered straight-tube tile:

  - wall per (embed_iterations, exit_fraction) config
  - per-step still-moving voxel fraction (the early-exit signal)
  - assignment agreement vs the exact N=10 walk (fraction of gated
    voxels with the same instance label, instances canonically matched)

so the bench/default schedule is a measurement, not a guess. Writes
runs/bench_assign.json. Reference walk: vector_to_embedding.py:80-133
(N=10, eval.py:271-273).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from skoots_tpu.models import cfg_to_model
    from skoots_tpu.ops.flood_fill import make_label_components_stepped
    from skoots_tpu.ops.morphology import binary_dilation, binary_dilation_2d
    from skoots_tpu.ops.vec2embed import vector_to_embedding
    from skoots_tpu.train.checkpoint import load_checkpoint, restore_params
    from skoots_tpu.utils.compile_cache import enable_compilation_cache
    from skoots_tpu.utils.synthetic import render_tubes, tube_segments

    if os.environ.get("BENCH_ASSIGN_CPU"):
        jax.config.update("jax_platforms", "cpu")
    enable_compilation_cache()
    shape = tuple(int(v) for v in os.environ.get(
        "BENCH_ASSIGN_SHAPE", "256,256,64").split(","))
    ck = load_checkpoint(os.environ.get("BENCH_CKPT", "runs/bench_ckpt.skoots"))
    cfg = ck["cfg"]
    model = cfg_to_model(cfg)
    template = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 16, 16, 16, 1), jnp.float32),
                           deterministic=True))
    params = jax.device_put(restore_params(template, ck["params"]))
    mean, std = float(ck["dataset_mean"]), float(ck["dataset_std"])
    scale = jnp.asarray(cfg.SKOOTS.VECTOR_SCALING, jnp.float32)

    p0, p1, n_placed = tube_segments(shape, 10, radius=5.0, seed=7)
    vol = jax.jit(lambda a, b: render_tubes(shape, a, b, radius=5.0))(p0, p1)

    @jax.jit
    def forward(params, vol):
        x = ((vol - mean) / std)[None, ..., None]
        out = model.apply(params, x.astype(jnp.float32), deterministic=True)
        vec = out[0, ..., 0:3].astype(jnp.bfloat16)
        skel_p = out[0, ..., 3]
        sem = out[0, ..., 4]
        sk = (skel_p > 0.8).astype(jnp.float32)[None, ..., None]
        sk = binary_dilation(sk)
        sk = binary_dilation_2d(binary_dilation_2d(sk))
        fg = sem > 0.5
        return vec * fg[..., None], (sk[0, ..., 0] > 0.5), fg

    vec, sk, fg = jax.block_until_ready(forward(params, vol))
    cc = make_label_components_stepped(shape, propagates_per_round=64,
                                       jumps_per_round=0, scans_per_round=1)
    labels = jax.block_until_ready(cc(sk.astype(jnp.uint8), max_rounds=64))

    # per-step moving fraction (exact walk, instrumented)
    @jax.jit
    def moving_per_step(vec):
        v = vec.astype(jnp.float32)
        x, y, z = shape
        strides = jnp.asarray([y * z, z, 1], jnp.int32)
        mesh = jnp.stack(jnp.meshgrid(jnp.arange(x), jnp.arange(y),
                                      jnp.arange(z), indexing="ij"),
                         -1).astype(jnp.float32)
        embed = mesh + v * scale
        flat_vec = (v * scale).reshape(-1, 3)

        def ravel(e):
            idx = jnp.clip(jnp.round(e).astype(jnp.int32), 0,
                           jnp.asarray(shape, jnp.int32) - 1)
            return (idx * strides).sum(-1).reshape(-1)

        def body(carry, _):
            embed, prev = carry
            delta = flat_vec[prev].reshape(embed.shape)
            embed = embed + delta
            idx = ravel(embed)
            mov = (idx != prev).mean(dtype=jnp.float32)
            return (embed, idx), mov

        (embed, _), movs = jax.lax.scan(body, (embed, ravel(embed)), None,
                                        length=9)
        return movs

    movs = np.asarray(moving_per_step(vec))
    print("moving fraction per step:", [round(float(m), 5) for m in movs])

    def walk_assign(n, exit_fraction, exit_cycle=False, compact=None):
        @jax.jit
        def run(vec, labels, fg):
            emb = vector_to_embedding(scale, vec.astype(jnp.float32)[None],
                                      n=n, exit_fraction=exit_fraction,
                                      exit_cycle=exit_cycle,
                                      compact_div=compact)[0]
            idx = jnp.round(emb).astype(jnp.int32)
            ix = jnp.clip(idx[..., 0], 0, shape[0] - 1)
            iy = jnp.clip(idx[..., 1], 0, shape[1] - 1)
            iz = jnp.clip(idx[..., 2], 0, shape[2] - 1)
            return jnp.where(fg, labels[ix, iy, iz], 0)

        return run

    rows = []
    exact = None
    for n, ef, cyc, comp in [
            (10, None, False, None), (10, None, False, 8),
            (10, None, False, 16), (10, 1e-3, False, None),
            (10, 1e-3, True, None),
            (6, None, False, None), (4, None, False, None),
            (3, None, False, None)]:
        run = walk_assign(n, ef, cyc, comp)
        inst = jax.block_until_ready(run(vec, labels, fg))
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            inst = jax.block_until_ready(run(vec, labels, fg))
        dt = (time.time() - t0) / reps
        inst = np.asarray(inst)
        if exact is None:
            exact = inst
            agree = 1.0
        else:
            m = exact > 0
            agree = float((inst[m] == exact[m]).mean()) if m.any() else 1.0
        row = {"n": n, "exit_fraction": ef, "exit_cycle": cyc,
               "compact_div": comp,
               "ms": round(dt * 1e3, 1),
               "agree_vs_exact": round(agree, 5),
               "instances": int(len(np.unique(inst)) - 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = {"shape": list(shape), "n_tubes": n_placed,
           "moving_per_step": [round(float(m), 5) for m in movs],
           "rows": rows}
    with open("runs/bench_assign.json", "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
