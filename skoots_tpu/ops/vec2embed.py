"""Vector field -> spatial embedding.

TPU-native re-design of the reference op
(/root/reference/skoots/lib/vector_to_embedding.py:80-174): a network predicts,
per voxel, a displacement vector in [-1, 1]. Scaled by ``scale`` and added to
the voxel's own coordinate it forms a "spatial embedding" that points at the
center (skeleton) of the instance the voxel belongs to. With ``n > 1`` the
vector field is re-applied at the (rounded) embedded position, with per-step
``decay``, letting embeddings travel further than one scale step — used with
N=10 at inference (/root/reference/skoots/lib/eval.py:271-273).

Layout: channels-LAST. ``vector`` is ``[B, X, Y, Z, 3]`` (or ``[B, X, Y, 2]``
in 2D); the channel axis maps onto TPU lanes and every op here fuses into one
XLA kernel under jit. The iterated gather is a single flat ``take`` per step.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def coordinate_mesh(spatial_shape: tuple[int, ...], dtype=jnp.float32) -> jax.Array:
    """Dense coordinate mesh of shape ``[*spatial_shape, D]`` (ij indexing)."""
    nd = len(spatial_shape)
    axes = [
        jax.lax.broadcasted_iota(dtype, spatial_shape, dimension=d) for d in range(nd)
    ]
    return jnp.stack(axes, axis=-1)


@partial(jax.jit, static_argnames=("n",))
def _vec2embed(scale: jax.Array, vector: jax.Array, n: int, decay: float) -> jax.Array:
    spatial = vector.shape[1:-1]
    d = vector.shape[-1]
    mesh = coordinate_mesh(spatial, dtype=jnp.float32)[None]  # [1, *S, D]

    scale = scale.astype(jnp.float32).reshape((1,) + (1,) * len(spatial) + (d,))
    scaled = vector.astype(jnp.float32) * scale
    embed = mesh + scaled

    if n <= 1:
        return embed

    # sizes for raveling [X, Y, Z] -> flat index
    sizes = jnp.asarray(spatial, dtype=jnp.int32)
    strides = jnp.concatenate(
        [jnp.cumprod(sizes[::-1])[::-1][1:], jnp.ones((1,), jnp.int32)]
    )  # e.g. (Y*Z, Z, 1)

    step = 1.0
    b = vector.shape[0]
    flat_vec = vector.astype(jnp.float32).reshape(b, -1, d)  # [B, V, D]
    for _ in range(n - 1):
        step = step * decay
        idx = jnp.clip(
            jnp.round(embed).astype(jnp.int32),
            0,
            sizes.reshape((1,) + (1,) * len(spatial) + (d,)) - 1,
        )
        flat_idx = jnp.sum(idx * strides, axis=-1).reshape(b, -1)  # [B, V]
        # gather the vector at the embedded location, re-apply with decay
        delta = jnp.take_along_axis(flat_vec, flat_idx[..., None], axis=1)
        embed = embed + delta.reshape(embed.shape) * (scale * step)
    return embed


@partial(jax.jit, static_argnames=("n", "decay", "budget_div"))
def _vec2embed_compact(scale: jax.Array, vector: jax.Array, n: int,
                       decay: float, budget_div: int = 8) -> jax.Array:
    """EXACT N-step walk that only walks the foreground.

    Zero-vector voxels are stationary under the dense semantics (their
    embedding is their own coordinate, whose stored vector is the same
    zero), and inference fields are thresholded so 90%+ of voxels are
    zero — yet every dense step gathers ALL of them (332 ms per 256^2x64
    tile at N=10, runs/bench_assign.json). Here the first step runs dense
    (it is also the fg test), the nonzero voxels are compacted into a
    ``total // budget_div`` buffer, steps 2..N walk only that buffer, and
    the results scatter back. Bitwise-identical to ``_vec2embed`` (same
    elementwise round/clip/gather/fma chain); if the foreground exceeds
    the buffer, a ``lax.cond`` falls back to the dense loop in-graph.
    """
    spatial = vector.shape[1:-1]
    d = vector.shape[-1]
    bsz = vector.shape[0]
    mesh = coordinate_mesh(spatial, dtype=jnp.float32)[None]
    scale_bc = scale.astype(jnp.float32).reshape(
        (1,) + (1,) * len(spatial) + (d,))
    vec_f = vector.astype(jnp.float32)
    embed = mesh + vec_f * scale_bc
    if n <= 1:
        return embed

    sizes = jnp.asarray(spatial, dtype=jnp.int32)
    strides = jnp.concatenate(
        [jnp.cumprod(sizes[::-1])[::-1][1:], jnp.ones((1,), jnp.int32)]
    )
    v = 1
    for s in spatial:
        v *= s
    total = bsz * v
    cap = max(total // budget_div, 1)
    flat_vec = vec_f.reshape(total, d)
    fg = jnp.any(flat_vec != 0, axis=-1)
    n_fg = fg.sum()
    (sel,) = jnp.nonzero(fg, size=cap, fill_value=total)
    sel_safe = jnp.minimum(sel, total - 1)
    base = (sel_safe // v) * v  # batch-local gathers stay in-batch
    flat_vec_pad = jnp.concatenate(
        [flat_vec, jnp.zeros((1, d), jnp.float32)], axis=0)
    scale_v = scale.astype(jnp.float32).reshape(1, d)
    emb_flat = embed.reshape(total, d)

    def compact_branch(emb_flat):
        cur = jnp.take(emb_flat, sel_safe, axis=0)
        step = 1.0
        for _ in range(n - 1):
            step = step * decay
            idx = jnp.clip(jnp.round(cur).astype(jnp.int32), 0, sizes - 1)
            li = jnp.sum(idx * strides, axis=-1) + base
            li = jnp.where(sel < total, li, total)  # pad rows -> zero row
            delta = flat_vec_pad[li]
            cur = cur + delta * (scale_v * step)
        return emb_flat.at[sel].set(cur, mode="drop")

    def dense_branch(emb_flat):
        e = emb_flat.reshape(embed.shape)
        step = 1.0
        bvec = flat_vec.reshape(bsz, v, d)
        for _ in range(n - 1):
            step = step * decay
            idx = jnp.clip(
                jnp.round(e).astype(jnp.int32),
                0, sizes.reshape((1,) + (1,) * len(spatial) + (d,)) - 1,
            )
            flat_idx = jnp.sum(idx * strides, axis=-1).reshape(bsz, -1)
            delta = jnp.take_along_axis(bvec, flat_idx[..., None], axis=1)
            e = e + delta.reshape(e.shape) * (scale_bc * step)
        return e.reshape(total, d)

    out = jax.lax.cond(n_fg <= cap, compact_branch, dense_branch, emb_flat)
    return out.reshape(embed.shape)


@partial(jax.jit,
         static_argnames=("n", "decay", "exit_fraction", "exit_cycle"))
def _vec2embed_early(scale: jax.Array, vector: jax.Array, n: int,
                     decay: float, exit_fraction: float,
                     exit_cycle: bool = False) -> jax.Array:
    """N-step walk with convergence early exit: stop when the fraction of
    voxels whose ROUNDED embedded index still moves drops below
    ``exit_fraction``. Near-exact for inference fields (thresholding zeroes
    background vectors and on-skeleton vectors vanish, so stable indices
    imply near-zero deltas); the walk typically dries up well before N=10
    (reference eval.py:271-273) and each skipped step saves a whole-volume
    gather.

    ``exit_cycle`` additionally treats voxels in a PERIOD-2 index cycle as
    converged. Measured on trained fields (runs/bench_assign.json): on-tube
    voxels oscillate between two adjacent indices around the skeleton
    forever (the moving fraction pins at the foreground fraction, so the
    plain exit never fires) while their assigned label is identical from
    step ~3 on — both cycle points sit inside the same labeled skeleton
    component. Cycle-exit keeps the label result while skipping the dead
    steps; plain index-move exit remains the default.
    """
    spatial = vector.shape[1:-1]
    d = vector.shape[-1]
    b = vector.shape[0]
    mesh = coordinate_mesh(spatial, dtype=jnp.float32)[None]
    scale = scale.astype(jnp.float32).reshape((1,) + (1,) * len(spatial) + (d,))
    embed = mesh + vector.astype(jnp.float32) * scale
    if n <= 1:
        return embed

    sizes = jnp.asarray(spatial, dtype=jnp.int32)
    strides = jnp.concatenate(
        [jnp.cumprod(sizes[::-1])[::-1][1:], jnp.ones((1,), jnp.int32)]
    )
    flat_vec = vector.astype(jnp.float32).reshape(b, -1, d)
    n_vox = flat_vec.shape[1] * b
    min_moving = jnp.asarray(max(exit_fraction, 0.0) * n_vox, jnp.float32)

    def ravel(e):
        idx = jnp.clip(
            jnp.round(e).astype(jnp.int32),
            0,
            sizes.reshape((1,) + (1,) * len(spatial) + (d,)) - 1,
        )
        return jnp.sum(idx * strides, axis=-1).reshape(b, -1)

    def cond(carry):
        i, _, _, _, _, moving = carry
        return (i < n - 1) & (moving > min_moving)

    def body(carry):
        i, embed, prev_idx, prev2_idx, step, _ = carry
        step = step * decay
        delta = jnp.take_along_axis(flat_vec, prev_idx[..., None], axis=1)
        embed = embed + delta.reshape(embed.shape) * (scale * step)
        idx = ravel(embed)
        moved = idx != prev_idx
        if exit_cycle:
            moved = moved & (idx != prev2_idx)  # period-2 = converged
        moving = jnp.sum(moved.astype(jnp.float32))
        return i + 1, embed, idx, prev_idx, step, moving

    idx0 = ravel(embed)
    carry = (jnp.int32(0), embed, idx0, jnp.full_like(idx0, -1),
             jnp.float32(1.0), jnp.float32(n_vox))
    _, embed, _, _, _, _ = jax.lax.while_loop(cond, body, carry)
    return embed


def vector_to_embedding(
    scale: jax.Array | tuple,
    vector: jax.Array,
    n: int = 1,
    decay: float = 1.0,
    exit_fraction: float | None = None,
    exit_cycle: bool = False,
    compact_div: int | None = None,
) -> jax.Array:
    """Convert a vector field to spatial embeddings.

    Args:
        scale: per-axis scaling, shape ``(D,)`` — e.g. ``(60, 60, 12)``.
        vector: ``[B, X, Y, Z, 3]`` (3D) or ``[B, X, Y, 2]`` (2D), values in [-1, 1].
        n: number of vector applications (>=1). n>1 re-samples the field at the
           rounded embedded coordinate each step.
        decay: per-step magnitude decay for steps 2..n.
        exit_fraction: if set, stop the walk once the fraction of voxels with
           a still-moving rounded index drops below it (near-exact for
           thresholded inference fields; None = exactly n steps, reference
           semantics).
        exit_cycle: with ``exit_fraction``, also count period-2 index cycles
           as converged (see ``_vec2embed_early``; label-exact on measured
           trained fields, where on-tube voxels oscillate forever).
        compact_div: walk only nonzero-vector voxels after the first step,
           in a ``size // compact_div`` buffer — BITWISE-identical to the
           dense n-step walk (zero-vector voxels are stationary under the
           dense semantics), with an in-graph dense fallback when the
           foreground exceeds the buffer. Wins whenever the field is
           thresholded (takes precedence over ``exit_fraction``).

    Returns:
        embeddings of the same shape as ``vector`` (float32).
    """
    scale = jnp.asarray(scale)
    # the N-step walk is dimension-generic: 2D ([B, X, Y, 2]) uses the same
    # iterated-gather machinery (a superset of the reference's plain 2D
    # path, vector_to_embedding.py:51-76; n=1 reproduces it exactly)
    assert vector.shape[-1] == scale.shape[0], (
        f"scale dim {scale.shape} mismatches vector channels {vector.shape[-1]}"
    )
    if compact_div is not None and n > 1:
        return _vec2embed_compact(scale, vector, n=int(n),
                                  decay=float(decay),
                                  budget_div=int(compact_div))
    if exit_fraction is not None and n > 1:
        return _vec2embed_early(scale, vector, n=int(n), decay=float(decay),
                                exit_fraction=float(exit_fraction),
                                exit_cycle=bool(exit_cycle))
    return _vec2embed(scale, vector, n=int(n), decay=float(decay))
