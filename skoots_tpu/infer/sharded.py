"""Spatially-sharded inference over a device mesh.

The context-parallel analogue for conv nets (SURVEY.md section 5.7): instead
of the reference's overlap-tile-and-discard scheme, the volume's X axis is
sharded over the mesh's ``space`` axis and XLA's spatial partitioning
exchanges conv halos over ICI. One forward pass covers the whole (sharded)
volume — no redundant overlap compute at shard seams.

Works on any mesh (tested on the virtual 8-device CPU mesh); combine with
the ``data`` axis to batch multiple volumes.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from skoots_tpu.ops.morphology import binary_dilation, binary_dilation_2d
from skoots_tpu.ops.vec2embed import vector_to_embedding


def make_sharded_forward(
    model,
    mesh: Mesh,
    prob_threshold: float = 0.8,
    spatial_axis: int = 1,
):
    """Jitted phase-1 step with the volume sharded over mesh axis 'space'.

    Returns ``fwd(params, volume5d, mean, std) -> (vec, skel_u8)`` where
    ``volume5d`` is ``[B, X, Y, Z, 1]`` sharded P(None, 'space') on X.
    """
    spec = [None] * 5
    spec[spatial_axis] = "space"
    vol_sharding = NamedSharding(mesh, P(*spec))
    rep = NamedSharding(mesh, P())

    @jax.jit
    def fwd(params, volume, mean, std):
        x = (volume.astype(jnp.float32) - mean) / std
        out = model.apply(params, x, deterministic=True)
        keep = (out[..., 4:5] > prob_threshold).astype(out.dtype)
        vec = out[..., 0:3] * keep
        skel = binary_dilation(out[..., 3:4] * keep)
        skel = binary_dilation_2d(binary_dilation_2d(skel))
        return vec.astype(jnp.bfloat16), (skel > prob_threshold).astype(jnp.uint8)

    return jax.jit(
        fwd,
        in_shardings=(rep, vol_sharding, rep, rep),
        out_shardings=(vol_sharding, vol_sharding),
    )


def shard_volume(volume: jax.Array, mesh: Mesh, spatial_axis: int = 1) -> jax.Array:
    """Place a [B, X, Y, Z, C] volume sharded over 'space' on ``spatial_axis``."""
    spec = [None] * volume.ndim
    spec[spatial_axis] = "space"
    return jax.device_put(volume, NamedSharding(mesh, P(*spec)))


def make_sharded_assign(
    mesh: Mesh,
    vector_scale: Sequence[float],
    embed_iterations: int = 10,
    spatial_axis: int = 1,
):
    """Phase-3 with the vector field sharded over 'space' and the labeled
    skeleton replicated (the label gather is then a local lookup).

    Semantics: the N-step embedding walk samples the vector field across the
    WHOLE volume (XLA inserts the cross-shard gathers for walks that leave a
    shard) rather than clamping to tile bounds — strictly more context than
    the reference's per-tile clamp (eval.py:271-277).
    """
    spec = [None] * 5
    spec[spatial_axis] = "space"
    vec_sharding = NamedSharding(mesh, P(*spec))
    out_spec = [None] * 4
    out_spec[spatial_axis] = "space"
    out_sharding = NamedSharding(mesh, P(*out_spec))
    rep = NamedSharding(mesh, P())
    scale = jnp.asarray(vector_scale, jnp.float32)

    @jax.jit
    def assign(labels, vec):
        emb = vector_to_embedding(scale, vec.astype(jnp.float32), n=embed_iterations)
        sx, sy, sz = labels.shape
        idx = jnp.round(emb).astype(jnp.int32)
        ix = jnp.clip(idx[..., 0], 0, sx - 1)
        iy = jnp.clip(idx[..., 1], 0, sy - 1)
        iz = jnp.clip(idx[..., 2], 0, sz - 1)
        inst = labels[ix, iy, iz]
        return jnp.where(jnp.any(vec != 0, axis=-1), inst, 0)

    return jax.jit(
        assign, in_shardings=(rep, vec_sharding), out_shardings=out_sharding
    )
