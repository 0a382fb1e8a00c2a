"""2D / anisotropic per-slice instance segmentation mode.

The reference supports heavily-anisotropic stacks by segmenting each z-slice
independently in 2D and stitching the per-slice labels across z
(/root/reference/skoots/utils/flood_and_stitch.py:38-133 — per-slice scipy
flood + forward/backward overlap stitching — combined with the 2D path of
vector_to_embedding, /root/reference/skoots/lib/vector_to_embedding.py:51-76).

TPU-native version: all Z slices run as ONE batched device program — the 2D
embedding walk treats z as the batch axis, per-slice connected components is
a vmapped label-propagation while_loop — and only the stitching union-find
(a tiny label graph) runs on host.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from skoots_tpu.ops.flood_fill import (
    _UnionFind,
    label_components,
    remap_labels,
    renumber,
)
from skoots_tpu.ops.vec2embed import vector_to_embedding


@partial(jax.jit, static_argnames=("n_iter",))
def _perslice_assign(
    vec_zxy2: jax.Array,  # [Z, X, Y, 2] float
    skel_zxy: jax.Array,  # [Z, X, Y] uint8 (thresholded skeleton)
    sem_zxy: jax.Array,   # [Z, X, Y] uint8 (semantic foreground)
    scale_xy: jax.Array,  # [2]
    n_iter: int,
) -> jax.Array:
    """Per-slice 2D CC + 2D embedding walk + gather, batched over z."""
    z, x, y = skel_zxy.shape

    # per-slice 8-connected components: a 1-thick 3D volume under the
    # 26-conn labeler IS 2D 8-connectivity; vmap batches the fixpoint loop
    labels2d = jax.vmap(
        lambda s: label_components(s[..., None], max_rounds=64)[..., 0]
    )(skel_zxy)

    emb = vector_to_embedding(scale_xy, vec_zxy2.astype(jnp.float32), n=n_iter)
    idx = jnp.round(emb).astype(jnp.int32)
    ix = jnp.clip(idx[..., 0], 0, x - 1)
    iy = jnp.clip(idx[..., 1], 0, y - 1)
    inst = jnp.take_along_axis(
        labels2d.reshape(z, -1), (ix * y + iy).reshape(z, -1), axis=1
    ).reshape(z, x, y)
    return jnp.where(sem_zxy > 0, inst, 0)


def perslice_segment(
    vectors: np.ndarray,   # [X, Y, Z, 3] (only x/y channels used)
    skeleton: np.ndarray,  # [X, Y, Z] uint8/bool
    semantic: np.ndarray,  # [X, Y, Z] uint8/bool
    vector_scale: Sequence[float] = (60.0, 60.0, 12.0),
    embed_iterations: int = 10,
    min_instance_size: int = -1,
) -> np.ndarray:
    """Segment an anisotropic stack slice-by-slice, then stitch across z.

    Per-slice labels are made globally unique, then 2D instances in
    consecutive slices are merged when they overlap at the same (x, y)
    position (the reference's stitching criterion,
    flood_and_stitch.py:74-128). Returns ``[X, Y, Z]`` int32, labels
    renumbered 1..N.
    """
    x, y, z = skeleton.shape
    vec2 = np.ascontiguousarray(
        np.moveaxis(np.asarray(vectors)[..., :2], 2, 0)
    )  # [Z, X, Y, 2]
    skel_z = np.ascontiguousarray(np.moveaxis(np.asarray(skeleton) > 0, 2, 0))
    sem_z = np.ascontiguousarray(np.moveaxis(np.asarray(semantic) > 0, 2, 0))

    inst_z = np.asarray(
        _perslice_assign(
            jnp.asarray(vec2), jnp.asarray(skel_z, jnp.uint8),
            jnp.asarray(sem_z, jnp.uint8),
            jnp.asarray(vector_scale[:2], jnp.float32), embed_iterations,
        )
    ).astype(np.int64)

    # globally unique ids: slice-local labels are raveled 2D indices + 1
    span = x * y + 1
    inst_z += (np.arange(z, dtype=np.int64) * span)[:, None, None] * (inst_z > 0)

    # stitch: same-position overlap between consecutive slices
    uf = _UnionFind()
    for k in range(z - 1):
        a, b = inst_z[k], inst_z[k + 1]
        m = (a > 0) & (b > 0)
        if m.any():
            for pa, pb in np.unique(
                np.stack([a[m], b[m]], axis=1), axis=0
            ):
                uf.union(int(pa), int(pb))
    if uf.parent:
        keys = np.fromiter(uf.parent.keys(), dtype=np.int64)
        roots = np.array([uf.find(int(k)) for k in keys], dtype=np.int64)
        changed = keys != roots
        if changed.any():
            inst_z = remap_labels(inst_z, keys[changed], roots[changed])

    out = np.moveaxis(inst_z, 0, 2)  # [X, Y, Z]
    # post-stitch speck filter (same auto rule as the 3D engine; 0 = off)
    from skoots_tpu.ops.flood_fill import drop_small_instances

    out, _ = drop_small_instances(out, min_instance_size)
    out, _ = renumber(out)
    return out.astype(np.int32)


def run_perslice_inference(
    image_path: str,
    checkpoint_path: str,
    vector_scale: Sequence[float] | None = None,
    embed_iterations: int = 10,
    prob_threshold: float = 0.8,
    crop_size: Tuple[int, int, int] = (300, 300, 20),
    overlap: Tuple[int, int, int] = (50, 50, 5),
    output_path: str | None = None,
    min_instance_size: int = -1,
) -> np.ndarray:
    """CLI-level per-slice mode: phase-1 forward via the standard engine
    sweep (cached buffers reused when present), then 2D per-slice assignment
    + stitching instead of the 3D flood-fill/walk."""
    import os

    from skoots_tpu.infer.engine import run_inference  # noqa: F401 (phase-1 contract)
    from skoots_tpu.train.checkpoint import load_checkpoint
    from skoots_tpu.utils.io import imsave

    stem = os.path.splitext(image_path)[0]
    vec_path = stem + "_skoots_vectors.npy"
    skel_path = stem + "_skoots_skeleton.npy"
    sem_path = stem + "_skoots_semantic.npy"
    if not all(os.path.exists(p) for p in (vec_path, skel_path, sem_path)):
        # run phase 1 once through the engine (it persists the buffers);
        # the 3D phases also run — acceptable: per-slice mode is for
        # moderate anisotropic stacks
        run_inference(image_path, checkpoint_path, crop_size=crop_size,
                      overlap=overlap, prob_threshold=prob_threshold,
                      embed_iterations=1)
    vectors = np.load(vec_path, mmap_mode="r")
    skeleton = np.load(skel_path, mmap_mode="r")
    semantic = np.load(sem_path, mmap_mode="r")
    ckpt = load_checkpoint(checkpoint_path)
    scale = tuple(vector_scale or ckpt["cfg"].SKOOTS.VECTOR_SCALING)
    mask = perslice_segment(vectors, skeleton, semantic, scale,
                            embed_iterations,
                            min_instance_size=min_instance_size)
    out_path = output_path or (stem + "_instance_mask_2d.tif")
    imsave(out_path, mask)
    return mask
