"""End-to-end SKOOTS inference: the ``skoots --image`` path, TPU-native.

Re-design of /root/reference/skoots/lib/eval.py:32-320. Same three phases:

  1. UNet sweep over overlap-tiled crops -> vector field + thresholded,
     dilated skeleton map.
  2. Flood fill of the skeleton map into labeled skeleton instances.
  3. Instance assignment: iterated spatial embeddings (N=10) gather the
     skeleton label at the embedded coordinate.

TPU-first differences:
  * The per-tile pipeline (normalize -> forward -> threshold -> dilate ->
    interior trim) is ONE jitted function; only the interior bytes cross the
    device boundary (the reference ships the whole crop back and slices on
    host, eval.py:160-176).
  * Tiles are batched ([B, ...] forward) to keep the MXU fed.
  * The volume is reflect-padded by the overlap so the output covers every
    voxel (the reference never writes the outermost overlap band).
  * Dispatch is pipelined: while the device runs tile t, the host converts
    tile t-1 and slices tile t+1.
  * Flood fill runs on-device per tile with host seam union-find
    (skoots_tpu.ops.flood_fill).
  * Phase 3 is two dispatches per tile: 3a walks the embedding on device and
    reports the reached bbox (6 scalars to host); 3b gathers instance ids
    from just that label sub-volume, sliced off the (possibly memmapped)
    labels array. Device label residency is O(tile), so volume size is
    bounded by disk, not HBM.
"""

from __future__ import annotations

import json
import logging
import os
import time
import tracemalloc
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from skoots_tpu.config import CfgNode
from skoots_tpu.models import cfg_to_model
from skoots_tpu.ops.cropper import (
    bucketed_crop_size,
    bucketed_crop_size_down,
    crop_origins,
)
from skoots_tpu.ops.flood_fill import (
    drop_small_instances,
    efficient_flood_fill,
    renumber,
)
from skoots_tpu.ops.morphology import binary_dilation, binary_dilation_2d
from skoots_tpu.ops.vec2embed import vector_to_embedding
from skoots_tpu.train.checkpoint import load_checkpoint, restore_params
from skoots_tpu.utils.io import imread, imsave

log = logging.getLogger(__name__)

# per-phase wall-clock + stage split of the most recent run_inference call
# (also written to <image>_skoots_phases.json); perf forensics only
last_stats: dict = {}


def _pad_amounts(dim: int, crop: int, ov: int) -> Tuple[int, int]:
    """Reflect-pad so tile interiors [ov, padded-ov) cover [0, dim)."""
    lo = ov
    hi = max(ov, crop - (dim + lo))  # also guarantees padded >= crop
    return lo, hi


def _pack_bits(m: jax.Array) -> jax.Array:
    """[..., Z] {0,1} -> [..., Z//8] uint8 in ``np.packbits`` big-endian
    layout (exact inverse: ``np.unpackbits(t, axis=-1)``). Packing the
    phase-1 masks on device cuts their device->host bytes 8x — the wire
    (PCIe, or this machine's TPU relay) is the host-streaming engine's
    bottleneck, not compute."""
    w = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.int32)
    b = m.reshape(*m.shape[:-1], m.shape[-1] // 8, 8).astype(jnp.int32)
    return (b * w).sum(-1).astype(jnp.uint8)


def _make_mask_decoder(z: int):
    """Host-side inverse of :func:`_pack_bits` for a [B, X, Y, Z//8] batch:
    back to [B, X, Y, Z, 1] uint8 for the interior writers."""

    def decode(t: np.ndarray) -> np.ndarray:
        return np.unpackbits(t, axis=-1)[..., :z, None]

    return decode


def _make_tile_fn(model, params, mean, std, prob_thr: float,
                  dilation_3d: int = 1, dilation_2d: int = 2,
                  sem_thr: float | None = None, store_vectors: bool = True,
                  pack_wire: bool = False):
    """Phase-1 jitted tile step: [B, X, Y, Z, 1] image tiles (any dtype;
    normalization casts on device, so uint8 volumes cross the wire at 1
    byte/voxel instead of 4) -> interiors of
    (vectors f16 [optional], dilated skeleton u8, semantic foreground u8).

    ``store_vectors=False`` (wire_mode='recompute') omits the f16 vector
    output entirely — 6 bytes/voxel of device->host traffic and disk that
    phase 3 re-derives on device from the raw image. ``pack_wire`` packs
    the two masks to 1 bit/voxel for the transfer (requires Z % 8 == 0;
    the host unpacks before writing the full-resolution buffers).

    Default dilation stack = reference eval.py:152-157 (one 3D + two 2D);
    the experimental variant uses prob_thr 0.5 and three 2D dilations
    (reference experimental/eval.py:138-146). The semantic mask (prob >
    threshold, un-dilated) is persisted so phase 3 can gate assignment on
    the actual probability decision rather than inferring foreground from
    vector non-zeroness (a stored float16 vector can be exactly zero on a
    genuine foreground voxel, e.g. at an instance center).

    ``sem_thr`` decouples the semantic-gate threshold from the
    vector/skeleton masking threshold: sparse checkpoints carry a
    self-calibrated semantic level (sparse_engine.make_threshold_calibrator)
    that sits far above 0.8, while the vector/skeleton channels stay at the
    reference's operating point."""
    sem_thr = prob_thr if sem_thr is None else sem_thr

    @jax.jit
    def tile_fn(image_tiles: jax.Array):
        x = (image_tiles.astype(jnp.float32) - mean) / std
        out = model.apply(params, x, deterministic=True)
        vec = out[..., 0:3]
        skel = out[..., 3:4]
        prob = out[..., 4:5]
        keep = (prob > prob_thr).astype(out.dtype)
        vec = vec * keep
        skel = skel * keep
        for _ in range(dilation_3d):
            skel = binary_dilation(skel)
        for _ in range(dilation_2d):
            skel = binary_dilation_2d(skel)
        skel_u8 = (skel > prob_thr).astype(jnp.uint8)
        sem_u8 = (prob > sem_thr).astype(jnp.uint8)
        if pack_wire:
            skel_u8 = _pack_bits(skel_u8[..., 0])
            sem_u8 = _pack_bits(sem_u8[..., 0])
        outs = (skel_u8, sem_u8)
        if store_vectors:
            outs = (vec.astype(jnp.float16),) + outs
        return outs

    return tile_fn


def _make_embed_fn(scale: Sequence[float], vol_shape: Tuple[int, int, int],
                   n_iter: int, decay: float = 1.0,
                   exit_fraction: float | None = None,
                   exit_cycle: bool = False):
    """Phase-3a jitted step: walk the embedding, return rounded volume-space
    indices (clipped) plus their bounding box. The index tensor stays on
    device between 3a and 3b; only 6 scalars cross to host, which then
    uploads exactly the label sub-volume the gather will touch — device
    label residency is O(tile + walked extent), not O(volume)."""

    dims = jnp.asarray(vol_shape, jnp.int32)

    @jax.jit
    def embed_fn(vec_tiles: jax.Array, offsets: jax.Array):
        emb = vector_to_embedding(jnp.asarray(scale),
                                  vec_tiles.astype(jnp.float32), n=n_iter,
                                  decay=decay, exit_fraction=exit_fraction,
                                  exit_cycle=exit_cycle)
        emb = emb + offsets[:, None, None, None, :].astype(emb.dtype)
        idx = jnp.clip(jnp.round(emb).astype(jnp.int32), 0, dims - 1)
        return idx, idx.min(axis=(0, 1, 2, 3)), idx.max(axis=(0, 1, 2, 3))

    return embed_fn


def _make_recompute_embed_fn(model, params, mean, std, prob_thr: float,
                             sem_thr: float | None,
                             scale: Sequence[float],
                             vol_shape: Tuple[int, int, int], n_iter: int,
                             decay: float = 1.0,
                             exit_fraction: float | None = None,
                             exit_cycle: bool = False):
    """Phase-3a for wire_mode='recompute': ONE jitted step from the raw
    image tile (1 byte/voxel over the wire) to walked indices + on-device
    foreground gate. Re-runs the phase-1 forward instead of round-tripping
    the f16 vector field through host/disk — on hosts where the
    device<->host wire is slower than ~100 MB/s (this machine's TPU relay;
    any PCIe-starved setup) recomputing ~70 ms/Mvox of conv is far cheaper
    than moving 6 bytes/voxel twice. ``sem_thr=None`` disables the gate
    (strict reference semantics, eval.py:277).

    Tile-boundary parity note: vectors recomputed in the ASSIGN tile
    geometry can differ from phase-1-stored values near tile edges when the
    two grids differ; at tiles >= training-crop scale the effect is below
    instance level (seam study, BASELINE.md round-3)."""

    dims = jnp.asarray(vol_shape, jnp.int32)

    @jax.jit
    def rec_fn(image_tiles: jax.Array, offsets: jax.Array):
        xs = (image_tiles.astype(jnp.float32) - mean) / std
        out = model.apply(params, xs, deterministic=True)
        vec = out[..., 0:3]
        prob = out[..., 4:5]
        keep = (prob > prob_thr).astype(out.dtype)
        vec = (vec * keep).astype(jnp.float16)  # match the stored-field path
        emb = vector_to_embedding(jnp.asarray(scale),
                                  vec.astype(jnp.float32), n=n_iter,
                                  decay=decay, exit_fraction=exit_fraction,
                                  exit_cycle=exit_cycle)
        emb = emb + offsets[:, None, None, None, :].astype(emb.dtype)
        idx = jnp.clip(jnp.round(emb).astype(jnp.int32), 0, dims - 1)
        if sem_thr is None:
            fg = jnp.ones(prob.shape[:-1], jnp.uint8)
        else:
            fg = (prob[..., 0] > sem_thr).astype(jnp.uint8)
        return idx, fg, idx.min(axis=(0, 1, 2, 3)), idx.max(axis=(0, 1, 2, 3))

    return rec_fn


@jax.jit
def _gather_ids(labels_crop: jax.Array, idx: jax.Array, origin: jax.Array,
                fg: jax.Array) -> jax.Array:
    """Phase-3b: gather instance ids from a label SUB-volume.

    ``idx`` is already clipped to the label-crop bbox by construction (the
    bbox came from its min/max); the clip here only guards the bucket
    padding. The semantic gate keeps dilated-skeleton-halo background
    voxels from self-gathering a label (reference applies no gate,
    eval.py:277, but its stamps are fat enough never to hit the failure)."""
    rel = idx - origin[None, None, None, None, :]
    dims = jnp.asarray(labels_crop.shape, jnp.int32)
    rel = jnp.clip(rel, 0, dims - 1)
    inst = labels_crop[rel[..., 0], rel[..., 1], rel[..., 2]]
    return jnp.where(fg > 0, inst, 0)


@jax.jit
def _gather_ids_slab(labels_slab: jax.Array, idx: jax.Array, x0: jax.Array,
                     fg: jax.Array, acc: jax.Array) -> jax.Array:
    """Phase-3b streamed variant: gather from ONE x-slab of the label
    volume, accumulating into ``acc`` across slabs.

    This is the memory-bounded fallback for walks whose reached bbox
    exceeds the label-crop budget (an untrained or mis-scaled model can
    walk ~n_iter*scale voxels, making the bbox the whole volume — the
    fast path would then copy + upload O(volume) labels per tile batch).
    The slab spans the FULL y/z extent so every batch compiles to one
    program; only x membership is tested. ``idx`` y/z are already clipped
    to the volume."""
    relx = idx[..., 0] - x0
    depth = labels_slab.shape[0]
    inb = (relx >= 0) & (relx < depth)
    rx = jnp.clip(relx, 0, depth - 1)
    inst = labels_slab[rx, idx[..., 1], idx[..., 2]]
    return jnp.where(inb & (fg > 0), inst, acc)


def _bucket_bbox(mins, maxs, vol_shape, quantum=(64, 64, 16)):
    """Round a bbox up to quantized shapes (few distinct compiled gathers)
    and clamp it inside the volume. Returns (origin, shape) int tuples."""
    origin, shape = [], []
    for ax in range(3):
        lo, hi, dim, q = int(mins[ax]), int(maxs[ax]) + 1, vol_shape[ax], quantum[ax]
        size = min(dim, ((hi - lo + q - 1) // q) * q)
        o = max(0, min(lo, dim - size))
        origin.append(o)
        shape.append(size)
    return tuple(origin), tuple(shape)


def _read_tile(volume: np.ndarray, origin, crop, pads) -> np.ndarray:
    """Extract one padded-coordinate tile straight from the (possibly
    memmapped) unpadded volume, reflect-padding only the tile edges. Keeps
    RSS bounded: the whole-volume ``np.pad`` copy never exists."""
    src, tile_pads = [], []
    for ax in range(3):
        start = origin[ax] - pads[ax][0]
        end = start + crop[ax]
        dim = volume.shape[ax]
        lo_pad = max(0, -start)
        hi_pad = max(0, end - dim)
        src.append(slice(max(0, start), min(dim, end)))
        tile_pads.append((lo_pad, hi_pad))
    tile = np.asarray(volume[tuple(src)])
    if any(p != (0, 0) for p in tile_pads):
        tile = np.pad(
            tile,
            tile_pads + [(0, 0)] * (volume.ndim - 3),
            mode="reflect",
        )
    return tile


def _sweep(
    volume: np.ndarray,
    writers,
    tile_fn,
    crop: Tuple[int, int, int],
    overlap: Tuple[int, int, int],
    batch: int,
    desc: str,
    times: Optional[dict] = None,
):
    """Generic pipelined tile sweep. ``writers`` is a list of (array, slicer)
    callbacks receiving interior numpy blocks. When ``times`` is given, a
    stage breakdown is accumulated into it: ``gather_s`` (host memmap reads +
    stacking), ``dispatch_s`` (tile_fn call, async up to the runtime's
    dispatch depth), ``drain_s`` (blocking device→host + interior writes)."""
    spatial = volume.shape[:3]
    pads = [_pad_amounts(d, c, o) for d, c, o in zip(spatial, crop, overlap)]
    padded_shape = tuple(d + p[0] + p[1] for d, p in zip(spatial, pads))
    origins = crop_origins(padded_shape, crop, overlap)

    def gather_batch(batch_origins):
        tiles = np.stack(
            [_read_tile(volume, o, crop, pads) for o in batch_origins]
        )
        return tiles

    def padded_batch(bi):
        batch_origins = origins[bi * batch : (bi + 1) * batch]
        real = len(batch_origins)
        while len(batch_origins) < batch:  # pad final batch
            batch_origins = batch_origins + [batch_origins[-1]]
        return batch_origins, real

    pending = None  # (device results, batch_origins)
    t0 = time.time()
    tg = td = tw = 0.0
    n_batches = (len(origins) + batch - 1) // batch
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(1) as ex:  # read-ahead: disk I/O overlaps device
        fut = ex.submit(gather_batch, padded_batch(0)[0]) if n_batches else None
        for bi in range(n_batches):
            batch_origins, real = padded_batch(bi)
            ts = time.time()
            tiles = fut.result()
            if bi + 1 < n_batches:
                fut = ex.submit(gather_batch, padded_batch(bi + 1)[0])
            tg += time.time() - ts
            ts = time.time()
            results = tile_fn(tiles)  # async dispatch
            td += time.time() - ts
            ts = time.time()
            if pending is not None:
                _drain(pending, writers, crop, overlap, pads, spatial)
            tw += time.time() - ts
            pending = (results, batch_origins[:real])
        ts = time.time()
        if pending is not None:
            _drain(pending, writers, crop, overlap, pads, spatial)
        tw += time.time() - ts
    total = time.time() - t0
    if times is not None:
        times.update(
            {"tiles": len(origins), "total_s": round(total, 3),
             "gather_s": round(tg, 3), "dispatch_s": round(td, 3),
             "drain_s": round(tw, 3)}
        )
    log.info("%s: %d tiles in %.2fs (gather %.2f, dispatch %.2f, drain %.2f)",
             desc, len(origins), total, tg, td, tw)


def _drain(pending, writers, crop, overlap, pads, spatial):
    """Writers are arrays or ``(array, decode)`` pairs; ``decode`` maps the
    batched wire tensor back to full-resolution tiles (e.g. bit unpack)."""
    results, batch_origins = pending
    results = results if isinstance(results, tuple) else (results,)
    for w, r in zip(writers, results):
        w_arr, decode = w if isinstance(w, tuple) else (w, None)
        rn = np.asarray(r)  # blocking device->host
        if decode is not None:
            rn = decode(rn)
        for i, o in enumerate(batch_origins):
            _write_interior(w_arr, rn[i], o, crop, overlap, pads, spatial)


def _write_interior(out_arr, tile, origin, crop, overlap, pads, spatial):
    src, dst = [], []
    for ax in range(3):
        lo = origin[ax] + overlap[ax] - pads[ax][0]  # dest in unpadded coords
        hi = origin[ax] + crop[ax] - overlap[ax] - pads[ax][0]
        s_lo, s_hi = overlap[ax], crop[ax] - overlap[ax]
        if lo < 0:
            s_lo -= lo
            lo = 0
        if hi > spatial[ax]:
            s_hi -= hi - spatial[ax]
            hi = spatial[ax]
        if hi <= lo:
            return
        dst.append(slice(lo, hi))
        src.append(slice(s_lo, s_hi))
    out_arr[tuple(dst)] = tile[tuple(src)]


def _probe_dilation(model, params, mean, std, prob_thr, volume, crop, ov,
                    anisotropy, n_probe: int = 4):
    """Measured skeleton spacing from up to ``n_probe`` center-most phase-1
    tiles run with NO dilation (see infer.autoknobs). Returns the minimum
    gap across probes, or None when no probe shows >= 2 sizeable
    components."""
    from skoots_tpu.infer.autoknobs import estimate_skeleton_gap

    spatial = volume.shape[:3]
    pads = [_pad_amounts(d, c, o) for d, c, o in zip(spatial, crop, ov)]
    padded_shape = tuple(d + p[0] + p[1] for d, p in zip(spatial, pads))
    origins = crop_origins(padded_shape, crop, ov)
    center = [ps / 2 - c / 2 for ps, c in zip(padded_shape, crop)]
    origins = sorted(
        origins, key=lambda o: sum((a - b) ** 2 for a, b in zip(o, center))
    )[:n_probe]
    probe_fn = _make_tile_fn(model, params, mean, std, prob_thr, 0, 0)
    gap = None
    for o in origins:
        tile = _read_tile(volume, o, crop, pads)
        _, skel, _ = probe_fn(jnp.asarray(tile[None, ...], jnp.float32))
        g = estimate_skeleton_gap(np.asarray(skel)[0, ..., 0], anisotropy)
        if g is not None:
            gap = g if gap is None else min(gap, g)
    return gap


def _probe_semantic_threshold(model, params, mean, std, volume,
                              crop, ov, n_probe: int = 4):
    """Inference-time semantic-threshold self-calibration for sparse
    checkpoints: pool raw probabilities from the center-most probe tiles
    and find the inter-cluster valley
    (autoknobs.calibrate_semantic_threshold_from_histogram).

    Train-time calibration (sparse_engine.make_threshold_calibrator) is
    kept as the fallback, but it measures the TRAINING distribution — on
    the round-4 sparse scenario the model's train-crop probabilities were
    well-separated at 0.944 while the val volume needed ~0.997 (fat-ring
    generalization gap, runs/accuracy/sparse/calibration.json). Probing
    the inference volume itself removes that shift. Returns None when the
    probes show too little foreground to calibrate on."""
    from skoots_tpu.infer.autoknobs import (
        calibrate_semantic_threshold_from_histogram,
    )

    spatial = volume.shape[:3]
    pads = [_pad_amounts(d, c, o) for d, c, o in zip(spatial, crop, ov)]
    padded_shape = tuple(d + p[0] + p[1] for d, p in zip(spatial, pads))
    origins = crop_origins(padded_shape, crop, ov)
    center = [ps / 2 - c / 2 for ps, c in zip(padded_shape, crop)]
    origins = sorted(
        origins, key=lambda o: sum((a - b) ** 2 for a, b in zip(o, center))
    )[:n_probe]

    @jax.jit
    def raw_fn(image_tiles):
        x = (image_tiles - mean) / std
        return model.apply(params, x, deterministic=True)[..., 4]

    probs = [
        np.asarray(
            raw_fn(jnp.asarray(_read_tile(volume, o, crop, pads)[None, ...],
                               jnp.float32)),
            np.float32,
        ).ravel()
        for o in origins
    ]
    return calibrate_semantic_threshold_from_histogram(np.concatenate(probs))


def _host_memory_report() -> tuple:
    """(current, peak) host-memory figures for the benchmark file: traced
    bytes when tracemalloc is active, else process peak RSS (ru_maxrss) —
    the untraced fallback for SKOOTS_NO_TRACEMALLOC=1 production runs."""
    if tracemalloc.is_tracing():
        return tracemalloc.get_traced_memory()
    import resource

    peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024
    return peak, peak


def run_inference(
    image_path: str,
    checkpoint_path: str,
    use_cached_data: bool = False,
    crop_size: Tuple[int, int, int] = (300, 300, 20),
    overlap: Tuple[int, int, int] = (50, 50, 5),
    assign_crop_size: Tuple[int, int, int] = (500, 500, 50),
    assign_overlap: Tuple[int, int, int] = (50, 50, 5),
    prob_threshold: float = 0.8,
    semantic_threshold: float | None = None,
    embed_iterations: int = 10,
    embed_decay: float = 1.0,
    embed_exit_fraction: float | None = None,
    embed_exit_cycle: bool = False,
    dilation_3d: int | None = None,
    dilation_2d: int | None = None,
    batch: int = 1,
    spatial_shards: int | None = 0,
    output_path: Optional[str] = None,
    out_of_core: Optional[bool] = None,
    semantic_gate: bool = True,
    label_crop_budget_bytes: Optional[int] = None,
    wire_mode: str = "auto",
    engine_impl: str = "auto",
    min_instance_size: int = -1,
) -> np.ndarray:
    """Segment a volume. Writes ``<image>_instance_mask.tif`` and
    ``<image>_skoots_benchmark.txt`` (reference contract, eval.py:285-310).

    ``spatial_shards > 1`` switches to the multi-chip spatially-partitioned
    pipeline (``infer.sharded``): the X axis is sharded over that many
    devices and XLA exchanges conv halos over ICI instead of re-computing
    overlap bands.

    ``out_of_core`` keeps every full-volume host buffer (phase-1 vectors +
    skeleton, phase-2 labels, phase-3 instance mask) in disk-backed memmaps
    so host RSS stays bounded for volumes larger than RAM (the zarr role in
    the reference, eval.py:101-111). Default: automatic for volumes over
    256^3.

    ``semantic_threshold`` sets the semantic-gate level independently of
    ``prob_threshold`` (which keeps masking the vector/skeleton channels).
    Default None auto-resolves: for a sparse checkpoint the gate is
    self-calibrated on THIS volume's probability histogram (probe tiles,
    autoknobs.calibrate_semantic_threshold_from_histogram — the dense
    pipeline's 0.8 sits on the wrong side of a sparse model's learned
    transition; measured precision 0.33 vs 0.70,
    runs/accuracy/sparse/calibration.json), falling back to the
    checkpoint's train-time ``calibrated_prob_threshold``; dense
    checkpoints use ``prob_threshold``.

    ``semantic_gate=False`` disables the assignment-phase foreground gate
    for strict reference semantics (eval.py:277 applies none): background
    voxels under the dilated-skeleton halo then self-gather a label, which
    fattens every instance by the dilation radius. The default gate keeps
    masks at the model's semantic boundary (measured: instance IoU vs GT
    0.999 gated vs 0.22 ungated on the parity volume, runs/parity/).

    ``wire_mode`` governs how much data crosses the device<->host wire:
    'store' persists the f16 vector field in phase 1 and reads it back in
    phase 3 (reference zarr semantics, eval.py:102-103); 'recompute' skips
    the vector round trip — phase 1 ships only the two masks (bit-packed
    when the tile Z is a multiple of 8), phase 3 re-runs the forward on
    device from the raw image tile. 'auto' (default, env override
    SKOOTS_WIRE_MODE) picks 'recompute' for out-of-core volumes, where the
    f16 field costs 6 bytes/voxel of wire AND disk twice. --use-cached
    works in both modes: a cache produced under 'recompute' has no vector
    buffer and phase 3 recomputes.

    ``engine_impl`` selects the execution engine: 'host' streams tiles
    host<->device through the three phases (works at any volume size);
    'device' runs the whole-volume on-device pipeline
    (``infer.device_pipeline``: one H2D of the volume, all three phases in
    HBM, one D2H of the mask — no per-tile wire traffic, no host CC).
    'auto' (default, env SKOOTS_ENGINE) delegates to the device pipeline
    when the volume exceeds 256^3 (below that the host path's overhead is
    negligible and its buffer cache is useful), its estimated peak HBM
    fits the device, and no phase-1 cache is in play (the device pipeline
    neither writes nor reads the cached buffers).

    ``min_instance_size`` drops speck instances below a voxel floor before
    the final renumber. ``-1`` (default) self-calibrates to 1% of the
    75th-percentile instance size (capped at 64) — a no-op unless some
    instances are two orders of magnitude below the typical size, which
    on textured data marks skeleton-probability specks (measured: every
    realism-campaign false positive was <= 4 voxels vs a smallest true
    instance of 499; ops/flood_fill.py::drop_small_instances). ``0``
    disables (strict reference parity: eval.py:245-310 never filters).

    Returns the instance mask ``[X, Y, Z]`` int32 (a memmap when
    out-of-core).
    """
    # benchmark contract (reference eval.py:285-295) needs traced host
    # memory — but tracing must not outlive this call: tracemalloc adds a
    # per-allocation traceback snapshot to EVERYTHING in the process, and
    # leaving it on slowed unrelated trace-heavy code ~3x (measured: the
    # train-CLI e2e test ran 20 s alone vs 60 s after any inference test).
    # SKOOTS_NO_TRACEMALLOC=1 skips tracing entirely for production runs
    # (the benchmark file then reports the process ru_maxrss instead);
    # host-streaming-heavy runs go measurably faster untraced.
    _notrace = os.environ.get("SKOOTS_NO_TRACEMALLOC", "") not in ("", "0")
    _owns_tracing = (not _notrace) and not tracemalloc.is_tracing()
    if _owns_tracing:
        tracemalloc.start()
    t_start = time.time()
    stats: dict = {"tracemalloc": not _notrace}  # per-phase wall + stage split
    global last_stats
    last_stats = stats
    try:

        stem = os.path.splitext(image_path)[0]
        ckpt = load_checkpoint(checkpoint_path)
        cfg: CfgNode = ckpt["cfg"]

        ckpt_extra = ckpt.get("extra") or {}
        calibrated_thr = ckpt_extra.get("calibrated_prob_threshold")
        sparse_ckpt = bool(cfg.EXPERIMENTAL.IS_SPARSE) or calibrated_thr is not None

        volume = imread(image_path)  # [X, Y, Z]
        x, y, z = volume.shape
        log.info("loaded %s: shape=%s dtype=%s", image_path, volume.shape, volume.dtype)

        model = cfg_to_model(cfg)
        # bind loaded weights onto a template pytree; eval_shape gives the
        # structure without tracing a compile or touching the device (param
        # shapes are spatial-size independent, so a fixed 16^3 probe works for
        # every volume)
        import jax.random as jrandom

        template = jax.eval_shape(
            lambda: model.init(
                {"params": jrandom.PRNGKey(0)},
                jnp.zeros((1, 16, 16, 16, 1), jnp.float32),
                deterministic=True,
            )
        )
        params = restore_params(template, ckpt["params"])

        def _stream_stats():
            # chunked fallback stats (a python-level .mean() default argument
            # would evaluate eagerly and materialize float64 copies of memmaps)
            n, tot, tot_sq = 0, 0.0, 0.0
            for i in range(0, volume.shape[0], 16):
                blk = np.asarray(volume[i : i + 16], np.float64)
                n += blk.size
                tot += float(blk.sum())
                tot_sq += float((blk * blk).sum())
            m = tot / n
            return m, max(tot_sq / n - m * m, 1e-8) ** 0.5

        if "dataset_mean" in ckpt and ckpt["dataset_mean"] is not None:
            mean, std = float(ckpt["dataset_mean"]), float(ckpt["dataset_std"])
        else:
            mean, std = _stream_stats()
        vec_scale = tuple(cfg.SKOOTS.VECTOR_SCALING)

        if spatial_shards is None:
            # auto (the CLI default): shard over every device when >1 is
            # present and the volume fits the sharded pipeline's per-device
            # ceiling; otherwise use the host-streaming engine
            from skoots_tpu.infer.sharded import (
                device_bytes_limit,
                resolve_spatial_shards,
            )

            spatial_shards = resolve_spatial_shards(
                None, len(jax.devices()), (x, y, z), device_bytes_limit()
            )

        if spatial_shards and spatial_shards > 1:
            from skoots_tpu.infer.sharded import (
                device_bytes_limit,
                estimated_bytes_per_device,
                make_sharded_pipeline,
            )
            from skoots_tpu.parallel import make_mesh

            n_dev = len(jax.devices())
            if n_dev < spatial_shards:
                raise ValueError(
                    f"--spatial-shards {spatial_shards} needs that many devices, "
                    f"have {n_dev}"
                )
            limit = device_bytes_limit()
            if limit is not None:
                # the pipeline auto-degrades its walk to ring gathers when the
                # replicated field doesn't fit, so the hard bar is the RING
                # estimate (everything O(vox/n)). Fail with the remedy instead
                # of OOMing.
                need = estimated_bytes_per_device((x, y, z), spatial_shards,
                                                  "ring")
                if need > limit:
                    raise ValueError(
                        f"--spatial-shards {spatial_shards}: this volume needs "
                        f"~{need / 1e9:.1f} GB/device even in the sharded "
                        f"pipeline's ring-gathered mode but devices have "
                        f"{limit / 1e9:.1f} GB. Use the host-streaming engine "
                        "(--spatial-shards 0), whose phase 3 is O(tile), or "
                        "more devices."
                    )
            mesh = make_mesh(data=1, space=spatial_shards,
                             devices=jax.devices()[:spatial_shards])
            if semantic_threshold is None and calibrated_thr is not None:
                semantic_threshold = float(calibrated_thr)
                log.info("semantic gate: checkpoint-calibrated threshold %.6f",
                         semantic_threshold)
            run = make_sharded_pipeline(
                model, mesh, (x, y, z), vector_scale=vec_scale,
                prob_threshold=prob_threshold, embed_iterations=embed_iterations,
                semantic_threshold=semantic_threshold,
            )
            bench_start = time.time()
            instance_mask = run(params, volume.astype(np.float32), mean, std)
            dt = time.time() - bench_start
            cur, peak = _host_memory_report()
            if _owns_tracing:
                tracemalloc.stop()
            with open(stem + "_skoots_benchmark.txt", "w") as f:
                f.write("SKOOTS Segmentation Benchmark:\n")
                f.write("------------------------------\n")
                f.write(f"Time: {dt} seconds\n")
                f.write(f"Memory (current/max): {(cur, peak)}\n\n")
            instance_mask, _ = drop_small_instances(
                np.asarray(instance_mask), min_instance_size)
            instance_mask, _ = renumber(instance_mask)
            out_path = output_path or (stem + "_instance_mask.tif")
            imsave(out_path, instance_mask.astype(np.int32))
            log.info(
                "sharded (%d-way) segmentation took %.2fs -> %s",
                spatial_shards, dt, out_path,
            )
            return instance_mask

        # canonical tile shapes: small volumes round UP to the bucket ladder
        # (reflect-padded) instead of minting per-volume shapes, so the
        # persistent compile cache hits across differently-sized volumes
        crop = bucketed_crop_size(
            tuple(max(4, c // 4 * 4) for c in crop_size), (x, y, z)
        )
        # keep stride >= crop/2: tiny volumes clamp the crop, and carrying the
        # full-size overlap over would explode the tile count
        ov = tuple(min(o, c // 4) for o, c in zip(overlap, crop))

        vec_path = stem + "_skoots_vectors.npy"
        skel_path = stem + "_skoots_skeleton.npy"
        sem_path = stem + "_skoots_semantic.npy"
        # phase-1 knobs travel WITH the cached buffers: the skeleton buffer has
        # threshold/dilation baked in, so a reload must compare against what the
        # producing run actually used, not against the CLI defaults (ADVICE r3)
        knobs_path = stem + "_skoots_phase1.json"

        requested_out_of_core = out_of_core  # caller intent, pre-resolution
        if out_of_core is None:
            out_of_core = x * y * z > 256**3

        wire_mode = os.environ.get("SKOOTS_WIRE_MODE", "") or wire_mode
        if wire_mode == "auto":
            wire_mode = "recompute" if out_of_core else "store"
        if wire_mode not in ("store", "recompute"):
            raise ValueError(f"wire_mode {wire_mode!r} not in store/recompute/auto")
        stats["wire_mode"] = wire_mode

        # the masks alone define a usable cache; the vector buffer is
        # optional (absent when the producing run used wire_mode='recompute')
        cache_hit = use_cached_data and all(
            os.path.exists(p) for p in (skel_path, sem_path)
        )
        cache_has_vectors = cache_hit and os.path.exists(vec_path)

        if semantic_threshold is None:
            if sparse_ckpt and not cache_hit:
                # sparse checkpoint: self-calibrate the gate on THIS volume
                # (train-time calibration measures the training distribution
                # and under-shoots when the boundary generalizes a fat ring)
                semantic_threshold = _probe_semantic_threshold(
                    model, params, mean, std, volume[..., None], crop, ov,
                )
                if semantic_threshold is not None:
                    log.info(
                        "semantic gate: volume-calibrated threshold %.6f "
                        "(probability-histogram valley on probe tiles; "
                        "vector/skeleton masking stays at %.2f)",
                        semantic_threshold, prob_threshold,
                    )
            if semantic_threshold is None and calibrated_thr is not None:
                semantic_threshold = float(calibrated_thr)
                log.info("semantic gate: checkpoint-calibrated threshold %.6f",
                         semantic_threshold)
            if semantic_threshold is None:
                semantic_threshold = prob_threshold

        if dilation_3d is None or dilation_2d is None:
            # auto mode (the default): derive the stack from the data instead
            # of hard-coding the reference's fixed 1x3D+2x2D (eval.py:152-157),
            # which silently merges instances once predicted-skeleton spacing
            # shrinks to ~4 voxels (round-3 campaign evidence, BASELINE.md)
            from skoots_tpu.infer.autoknobs import (
                REFERENCE_STACK,
                derive_dilation,
            )

            if cache_hit:
                # the cached skeleton has its producing run's stack baked in —
                # adopt it (sidecar) rather than probing a buffer we won't use
                rec = {}
                if os.path.exists(knobs_path):
                    try:
                        with open(knobs_path) as f:
                            rec = json.load(f)
                    except (ValueError, OSError):
                        rec = {}
                d3, d2 = (int(rec.get("dilation_3d", REFERENCE_STACK[0])),
                          int(rec.get("dilation_2d", REFERENCE_STACK[1])))
            else:
                gap = _probe_dilation(
                    model, params, mean, std, prob_threshold, volume[..., None],
                    crop, ov, tuple(cfg.SKOOTS.ANISOTROPY),
                )
                d3, d2 = derive_dilation(gap, tuple(cfg.SKOOTS.ANISOTROPY))
                log.info(
                    "auto dilation: measured skeleton spacing %s voxels -> "
                    "stack 3d=%d 2d=%d (reference fixed stack: 1/2; override "
                    "with --dilate-3d/--dilate-2d)",
                    "n/a" if gap is None else f"{gap:.1f}", d3, d2,
                )
            # an explicitly-passed knob always wins over the derived one
            dilation_3d = d3 if dilation_3d is None else dilation_3d
            dilation_2d = d2 if dilation_2d is None else dilation_2d

        phase1_knobs = {
            "prob_threshold": prob_threshold,
            "semantic_threshold": semantic_threshold,
            "dilation_3d": dilation_3d,
            "dilation_2d": dilation_2d,
        }

        # ------------------------------------------------ engine delegation
        engine_impl = os.environ.get("SKOOTS_ENGINE", "") or engine_impl
        if engine_impl not in ("auto", "host", "device", "device-thrifty"):
            raise ValueError(
                f"engine_impl {engine_impl!r} not in auto/host/device/device-thrifty")
        use_device_engine = engine_impl in ("device", "device-thrifty")
        device_thrifty = engine_impl == "device-thrifty"
        # an EXPLICIT out_of_core=True pins the host-streaming engine (the
        # caller wants bounded-memory streaming semantics, e.g. bigvol proof)
        if (engine_impl == "auto" and not cache_hit
                and requested_out_of_core is not True
                and x * y * z > 256**3):
            from skoots_tpu.infer.device_pipeline import estimated_device_bytes
            from skoots_tpu.infer.sharded import device_bytes_limit

            limit = device_bytes_limit()
            if limit is not None:
                if estimated_device_bytes((x, y, z)) <= limit:
                    use_device_engine = True
                elif estimated_device_bytes((x, y, z), thrifty=True) <= limit:
                    # the HBM-thrifty variant (native-dtype volume, no vector
                    # buffer, compacted u16 labels) stretches the in-HBM
                    # ceiling ~1.8x in volume
                    use_device_engine = device_thrifty = True
        if use_device_engine:
            from skoots_tpu.infer.device_pipeline import make_chunked_pipeline
            from skoots_tpu.infer.device_pipeline import make_thrifty_pipeline

            # explicit caller geometry wins; the reference-parity defaults
            # mean "unset" and get the measured-best on-device grid (the
            # zero-overlap bench geometry, BASELINE.md round-4)
            dev_crop = ((256, 256, 96)
                        if tuple(crop_size) == (300, 300, 20) else crop)
            dev_ov = ((0, 0, 0)
                      if tuple(overlap) == (50, 50, 5)
                      else tuple(min(o, c // 4) for o, c in zip(overlap, dev_crop)))
            dev_assign = (None if tuple(assign_crop_size) == (500, 500, 50)
                          else tuple(min(a, d) for a, d in
                                     zip(assign_crop_size, (x, y, z))))
            log.info(
                "engine: whole-volume device pipeline%s (volume fits HBM; "
                "crop=%s overlap=%s). --use-cached buffers are neither "
                "written nor read on this path; SKOOTS_ENGINE=host restores "
                "the streaming engine.",
                " (thrifty)" if device_thrifty else "", dev_crop, dev_ov,
            )
            builder = make_thrifty_pipeline if device_thrifty else make_chunked_pipeline
            run = builder(
                model, (x, y, z), crop=dev_crop, overlap=dev_ov,
                assign_crop=dev_assign, vector_scale=vec_scale,
                prob_threshold=prob_threshold,
                embed_iterations=embed_iterations, embed_decay=embed_decay,
                embed_exit_fraction=embed_exit_fraction,
                embed_exit_cycle=embed_exit_cycle,
                # output-exact fg-compacted assign (device_pipeline.
                # make_compact_assign_tile): the semantic gate makes walking
                # only fg voxels exact; measured 2.1x+ on v5e
                # (runs/bench_assign.json). SKOOTS_COMPACT_DIV=0 disables.
                embed_compact_div=(
                    int(os.environ.get("SKOOTS_COMPACT_DIV", "16")) or None
                ),
                dilation_3d=dilation_3d, dilation_2d=dilation_2d,
                semantic_threshold=semantic_threshold,
                semantic_gate=semantic_gate,
            )
            bench_start = time.time()
            instance_mask = np.asarray(run(params, np.asarray(volume), mean, std))
            instance_mask = instance_mask.astype(np.int32, copy=False)
            dt = time.time() - bench_start
            stats["engine"] = "device-thrifty" if device_thrifty else "device"
            stats["phase_s"] = dict(getattr(run, "last_phase_s", {}) or {})
            stats["e2e_s"] = round(dt, 3)
            try:
                with open(stem + "_skoots_phases.json", "w") as f:
                    json.dump(stats, f, indent=1)
            except OSError:
                pass
            cur, peak = _host_memory_report()
            if _owns_tracing:
                tracemalloc.stop()
            with open(stem + "_skoots_benchmark.txt", "w") as f:
                f.write("SKOOTS Segmentation Benchmark:\n")
                f.write("------------------------------\n")
                f.write(f"Time: {dt} seconds\n")
                f.write(f"Memory (current/max): {(cur, peak)}\n\n")
            instance_mask, _ = drop_small_instances(
                instance_mask, min_instance_size)
            instance_mask, _ = renumber(instance_mask)
            instance_mask = instance_mask.astype(np.int32)
            out_path = output_path or (stem + "_instance_mask.tif")
            imsave(out_path, instance_mask)
            log.info("device-pipeline segmentation took %.2fs -> %s", dt, out_path)
            return instance_mask
        stats["engine"] = "host"

        if cache_hit:
            import json as _json

            recorded = None
            if os.path.exists(knobs_path):
                try:
                    with open(knobs_path) as f:
                        recorded = _json.load(f)
                except (ValueError, OSError):
                    recorded = None
            if recorded is not None:
                # sidecars predating the split semantic gate used one threshold
                recorded.setdefault(
                    "semantic_threshold", recorded.get("prob_threshold")
                )
                diffs = {
                    k: (recorded.get(k), v)
                    for k, v in phase1_knobs.items()
                    if recorded.get(k) != v
                }
                if diffs:
                    log.warning(
                        "use_cached_data: cached phase-1 buffers were produced "
                        "with different knobs than requested — the recorded "
                        "values stay baked in: %s",
                        {k: f"cached={a} requested={b}" for k, (a, b) in diffs.items()},
                    )
            elif (dilation_3d, dilation_2d) != (1, 2) or prob_threshold != 0.8:
                log.warning(
                    "use_cached_data: no phase-1 sidecar (%s) — the cached "
                    "skeleton buffer has its original run's threshold/dilation "
                    "baked in; --dilate-3d/--dilate-2d/prob_threshold are ignored",
                    os.path.basename(knobs_path),
                )
            if cache_has_vectors:
                vectors = np.load(vec_path, mmap_mode="r")
            else:
                vectors = None
                if wire_mode == "store":
                    log.info(
                        "use_cached_data: no vector buffer in the cache "
                        "(produced under wire_mode='recompute') — phase 3 "
                        "recomputes vectors on device"
                    )
                    wire_mode = "recompute"
            skeleton_u8 = np.load(skel_path, mmap_mode="r")
            semantic_u8 = np.load(sem_path, mmap_mode="r")
            bench_start = time.time()
        else:
            store_vectors = wire_mode == "store"
            vectors = None
            if out_of_core:
                from skoots_tpu.utils.io import open_outofcore

                if store_vectors:
                    vectors = open_outofcore(vec_path, (x, y, z, 3), "float16")
                skeleton_u8 = open_outofcore(skel_path, (x, y, z), "uint8")
                semantic_u8 = open_outofcore(sem_path, (x, y, z), "uint8")
            else:
                if store_vectors:
                    vectors = np.zeros((x, y, z, 3), np.float16)
                skeleton_u8 = np.zeros((x, y, z), np.uint8)
                semantic_u8 = np.zeros((x, y, z), np.uint8)
            pack_wire = crop[2] % 8 == 0
            tile_fn = _make_tile_fn(
                model, params, mean, std, prob_threshold, dilation_3d,
                dilation_2d, sem_thr=semantic_threshold,
                store_vectors=store_vectors, pack_wire=pack_wire,
            )
            decode = _make_mask_decoder(crop[2]) if pack_wire else None
            writers = ([vectors] if store_vectors else []) + [
                (skeleton_u8[..., None], decode),
                (semantic_u8[..., None], decode),
            ]
            bench_start = time.time()
            # the phase-1 sweep reads the (possibly memmapped) raw volume tile
            # by tile; tiles cross the wire in their NATIVE dtype (uint8 EM
            # volumes: 1 byte/voxel, not 4) and normalization casts on device
            _sweep(
                volume[..., None],
                writers,
                lambda t: tile_fn(jnp.asarray(t)),
                crop,
                ov,
                batch,
                "phase1-unet",
                times=stats.setdefault("phase1", {}),
            )
            if out_of_core:
                if store_vectors:
                    vectors.flush()
                skeleton_u8.flush()
                semantic_u8.flush()
            else:
                if store_vectors:
                    np.save(vec_path, vectors)
                np.save(skel_path, skeleton_u8)
                np.save(sem_path, semantic_u8)
            if not store_vectors and os.path.exists(vec_path):
                os.remove(vec_path)  # a stale field would poison --use-cached
            import json as _json

            phase1_knobs["vectors_stored"] = store_vectors
            with open(knobs_path, "w") as f:
                _json.dump(phase1_knobs, f)

        # ---------------------------------------------------------------- phase 2
        log.info("phase 2: flood fill")
        if out_of_core:
            from skoots_tpu.utils.io import open_outofcore

            labels_out = open_outofcore(stem + "_skoots_labels.npy", (x, y, z),
                                        "int32")
        else:
            labels_out = None
        # smaller CC tiles in out-of-core mode keep host transients bounded;
        # bucket DOWN for small volumes (CC slices tiles directly)
        cc_crop = bucketed_crop_size_down(
            (256, 256, 64) if out_of_core else (512, 512, 128), (x, y, z)
        )
        _t2 = time.time()
        cc_info: dict = {}
        labeled = efficient_flood_fill(skeleton_u8, crop_size=cc_crop,
                                       out=labels_out, info=cc_info)
        # labels fit uint16 -> phase-3 label uploads and id downloads can
        # cross the wire at half width (bound from the CC's component count)
        labels_u16 = (cc_info.get("max_label") is not None
                      and cc_info["max_label"] < 2**16)
        stats["phase2"] = {"total_s": round(time.time() - _t2, 3),
                           "cc_crop": list(cc_crop),
                           "max_label": cc_info.get("max_label"),
                           "labels_u16": labels_u16}

        # ---------------------------------------------------------------- phase 3
        log.info("phase 3: instance assignment")
        if out_of_core:
            from skoots_tpu.utils.io import open_outofcore

            instance_mask = open_outofcore(
                stem + "_skoots_instance.npy", (x, y, z), "int32"
            )
        else:
            instance_mask = np.zeros((x, y, z), np.int32)
        a_crop = bucketed_crop_size(
            tuple(max(4, c // 4 * 4) for c in assign_crop_size), (x, y, z)
        )
        a_ov = tuple(min(o, c // 4) for o, c in zip(assign_overlap, a_crop))

        # Tile-local label residency: the walk's displacement is bounded, so each
        # assign step needs only the label bbox its embeddings actually reach —
        # device memory per step is O(tile), never O(volume). (The reference
        # indexes a host-RAM-resident labeled tensor per crop, eval.py:245-268;
        # here phase 3a computes the reached bbox on device, the host slices that
        # bbox from the labels array/memmap, and phase 3b gathers from it.)
        if wire_mode == "recompute":
            embed_fn = _make_recompute_embed_fn(
                model, params, mean, std, prob_threshold,
                semantic_threshold if semantic_gate else None, vec_scale,
                (x, y, z), embed_iterations, embed_decay, embed_exit_fraction,
                embed_exit_cycle,
            )
        else:
            embed_fn = _make_embed_fn(vec_scale, (x, y, z), embed_iterations,
                                      embed_decay, embed_exit_fraction,
                                      embed_exit_cycle)

        # Label-crop budget: when a batch's reached bbox would copy more label
        # bytes than this to host+device, fall back to streaming fixed-shape
        # x-slabs of the label volume through _gather_ids_slab instead. Trained
        # models walk locally (bbox ~ tile + walk margin) and never trip this;
        # pathological fields (untrained weights, wrong vector scale) would
        # otherwise cost O(volume) host RSS and H2D bytes PER TILE BATCH
        # (measured: 84 GB anon RSS on a 1024^3 random-init proof run).
        if label_crop_budget_bytes is None:
            label_crop_budget_bytes = int(
                os.environ.get("SKOOTS_LABEL_CROP_BYTES", 512 * 1024 * 1024)
            )
        slab_depth = max(16, min(x, label_crop_budget_bytes // max(y * z * 4, 1))
                         // 16 * 16)
        streamed_batches = 0

        pads = [_pad_amounts(d, c, o) for d, c, o in zip((x, y, z), a_crop, a_ov)]
        padded_shape = tuple(d + p[0] + p[1] for d, p in zip((x, y, z), pads))
        origins = crop_origins(padded_shape, a_crop, a_ov)
        _t3 = time.time()
        p3 = stats.setdefault(
            "phase3", {"tiles": len(origins), "read_s": 0.0, "embed_s": 0.0,
                       "labelcrop_s": 0.0, "gather_s": 0.0, "write_s": 0.0,
                       "assign_crop": list(a_crop)}
        )
        def _p3_read(batch_origins):
            """Host-side reads for one batch (runs on the read-ahead thread).
            recompute mode: raw image tiles (1 B/vox over the wire; the
            foreground gate is computed on device). store mode: the f16
            vector field + the semantic gate (or all-ones for strict
            reference semantics, eval.py:277)."""
            if wire_mode == "recompute":
                t = np.stack(
                    [_read_tile(volume[..., None], o, a_crop, pads)
                     for o in batch_origins]
                )
                return t, None
            t = np.stack(
                [_read_tile(vectors, o, a_crop, pads) for o in batch_origins]
            )  # stays float16: half the H2D bytes; 3a casts on device
            if semantic_gate:
                f = np.stack(
                    [_read_tile(semantic_u8, o, a_crop, pads)
                     for o in batch_origins]
                )
            else:
                f = np.ones((len(batch_origins), *a_crop), np.uint8)
            return t, f

        def _p3_batch(bi):
            batch_origins = origins[bi : bi + batch]
            real = len(batch_origins)
            while len(batch_origins) < batch:
                batch_origins = batch_origins + [batch_origins[-1]]
            return batch_origins, real

        from concurrent.futures import ThreadPoolExecutor

        _p3_ex = ThreadPoolExecutor(1)  # read-ahead overlaps device work
        fut = _p3_ex.submit(_p3_read, _p3_batch(0)[0]) if len(origins) else None
        for bi in range(0, len(origins), batch):
            batch_origins, real = _p3_batch(bi)
            # offsets map padded-tile coords back into unpadded volume coords
            offs = np.asarray(
                [[o[0] - pads[0][0], o[1] - pads[1][0], o[2] - pads[2][0]] for o in batch_origins],
                np.float32,
            )
            _ts = time.time()
            tiles, fg = fut.result()
            if bi + batch < len(origins):
                fut = _p3_ex.submit(_p3_read, _p3_batch(bi + batch)[0])
            p3["read_s"] += time.time() - _ts
            _ts = time.time()
            if wire_mode == "recompute":
                # forward + walk + gate run as ONE device program
                idx, fg, mins, maxs = embed_fn(jnp.asarray(tiles),
                                               jnp.asarray(offs))
            else:
                idx, mins, maxs = embed_fn(jnp.asarray(tiles), jnp.asarray(offs))
            lab_origin, lab_shape = _bucket_bbox(
                np.asarray(mins), np.asarray(maxs), (x, y, z)
            )
            p3["embed_s"] += time.time() - _ts
            if lab_shape[0] * lab_shape[1] * lab_shape[2] * 4 <= label_crop_budget_bytes:
                _ts = time.time()
                lab_sl = tuple(
                    slice(o, o + s) for o, s in zip(lab_origin, lab_shape)
                )
                labels_crop = np.ascontiguousarray(labeled[lab_sl])
                if labels_u16:
                    labels_crop = labels_crop.astype(np.uint16)
                p3["labelcrop_s"] += time.time() - _ts
                _ts = time.time()
                ids = np.asarray(_gather_ids(
                    jnp.asarray(labels_crop), idx,
                    jnp.asarray(lab_origin, jnp.int32), jnp.asarray(fg),
                ))
                p3["gather_s"] += time.time() - _ts
            else:
                if streamed_batches == 0:
                    log.warning(
                        "phase 3: walk bbox %s exceeds the label-crop budget "
                        "(%.0f MB, SKOOTS_LABEL_CROP_BYTES) — streaming %d-deep "
                        "label slabs instead (bounded memory, more dispatches). "
                        "This usually means the model's embedding walks are not "
                        "converging locally (untrained weights or wrong "
                        "SKOOTS.VECTOR_SCALING).",
                        lab_shape, label_crop_budget_bytes / 1e6, slab_depth,
                    )
                streamed_batches += 1
                fg_dev = jnp.asarray(fg)
                acc = jnp.zeros(idx.shape[:-1],
                                jnp.uint16 if labels_u16 else jnp.int32)
                x_lo, x_hi = int(mins[0]), int(maxs[0]) + 1
                for xs in range((x_lo // slab_depth) * slab_depth, x_hi,
                                slab_depth):
                    slab = np.ascontiguousarray(labeled[xs : xs + slab_depth])
                    if labels_u16:
                        slab = slab.astype(np.uint16)
                    if slab.shape[0] < slab_depth:  # fixed shape -> one program
                        slab = np.pad(
                            slab, ((0, slab_depth - slab.shape[0]), (0, 0), (0, 0))
                        )
                    acc = _gather_ids_slab(
                        jnp.asarray(slab), idx, jnp.int32(xs), fg_dev, acc
                    )
                ids = np.asarray(acc)
            _ts = time.time()
            for i, o in enumerate(batch_origins[:real]):
                _write_interior(
                    instance_mask, ids[i], o, a_crop, a_ov, pads, (x, y, z)
                )
            p3["write_s"] += time.time() - _ts
        _p3_ex.shutdown(wait=False)
        p3["total_s"] = round(time.time() - _t3, 3)
        p3["streamed_batches"] = streamed_batches
        for k in ("read_s", "embed_s", "labelcrop_s", "gather_s", "write_s"):
            p3[k] = round(p3[k], 3)
        log.info(
            "phase 3: %d tiles in %.2fs (read %.2f, embed %.2f, labelcrop "
            "%.2f, gather %.2f, write %.2f)", p3["tiles"], p3["total_s"],
            p3["read_s"], p3["embed_s"], p3["labelcrop_s"], p3["gather_s"],
            p3["write_s"],
        )

        # benchmark report (reference contract eval.py:285-295)
        dt = time.time() - bench_start
        stats["e2e_s"] = round(dt, 3)
        try:  # stage-split sidecar for perf forensics (tools/bench_hoststream)
            with open(stem + "_skoots_phases.json", "w") as f:
                json.dump(stats, f, indent=1)
        except OSError:
            pass
        cur, peak = _host_memory_report()
        if _owns_tracing:
            tracemalloc.stop()
        with open(stem + "_skoots_benchmark.txt", "w") as f:
            f.write("SKOOTS Segmentation Benchmark:\n")
            f.write("------------------------------\n")
            f.write(f"Time: {dt} seconds\n")
            f.write(f"Memory (current/max): {(cur, peak)}\n\n")
        log.info("segmentation took %.2fs (peak host mem %.1f MB)", dt, peak / 1e6)

        if out_of_core:
            from skoots_tpu.ops.flood_fill import renumber_inplace

            drop_small_instances(instance_mask, min_instance_size)
            renumber_inplace(instance_mask)
            instance_mask.flush()
        else:
            instance_mask, _ = drop_small_instances(
                instance_mask, min_instance_size)
            instance_mask, _ = renumber(instance_mask)
            instance_mask = instance_mask.astype(np.int32)
        out_path = output_path or (stem + "_instance_mask.tif")
        imsave(out_path, instance_mask)
        log.info("wrote %s (total %.2fs)", out_path, time.time() - t_start)
        return instance_mask
    finally:
        # never leak allocation tracing past this call, even on error
        # paths (every later trace-heavy caller in the process would
        # pay the per-allocation traceback tax)
        if _owns_tracing and tracemalloc.is_tracing():
            tracemalloc.stop()


def _round4(d: int) -> int:
    return max(4, (d // 4) * 4) if d >= 4 else d
