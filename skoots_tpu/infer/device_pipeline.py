"""Whole-volume ON-DEVICE segmentation pipeline.

The reference streams every crop host<->GPU and runs flood fill on the CPU
(/root/reference/skoots/lib/eval.py:126-284) — device boundary crossings per
crop are its structural bottleneck. On TPU, a 512^3 volume and all
intermediates fit in HBM, so the ENTIRE pipeline — tiled UNet sweep, skeleton
thresholding/dilation, connected components, N-step embedding walk, instance
gather — compiles into ONE jitted program:

    volume [X,Y,Z] f32 (HBM) -> instance labels [X,Y,Z] int32 (HBM)

* The tile sweep is a ``lax.fori_loop`` over a static origin table with
  ``dynamic_slice``/``dynamic_update_slice`` — one compile for all tiles.
* Flood fill is the pointer-jumping label propagation of
  ``skoots_tpu.ops.flood_fill.label_components`` on the full volume — no
  crop seams, no host union-find.
* Only a scalar (or the final mask) ever needs to leave the device.

For volumes beyond HBM, the host-streaming path in
``skoots_tpu.infer.engine`` takes over.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import os

import jax
import jax.numpy as jnp
import numpy as np

from skoots_tpu.ops.cropper import crop_origins
from skoots_tpu.ops.flood_fill import label_components
from skoots_tpu.ops.morphology import binary_dilation, binary_dilation_2d
from skoots_tpu.ops.vec2embed import vector_to_embedding


def make_device_pipeline(
    model,
    volume_shape: Tuple[int, int, int],
    crop: Tuple[int, int, int] = (256, 256, 16),
    overlap: Tuple[int, int, int] = (16, 16, 2),
    vector_scale: Sequence[float] = (60.0, 60.0, 12.0),
    prob_threshold: float = 0.8,
    embed_iterations: int = 10,
    embed_exit_fraction: float | None = None,
    embed_exit_cycle: bool = False,
    embed_compact_div: int | None = None,
    cc_rounds: int = 32,
    cc_propagates_per_round: int = 128,
    cc_jumps_per_round: int = 1,
    dtype=jnp.bfloat16,
):
    """Build the jitted whole-volume pipeline for a fixed volume shape.

    Returns ``pipeline(params, volume, mean, std) -> labels [X, Y, Z] int32``.
    """
    x, y, z = volume_shape
    crop = tuple(min(c, _round4(d)) for c, d in zip(crop, volume_shape))
    ov = tuple(min(o, c // 4) for o, c in zip(overlap, crop))
    # pad by the overlap so every tile interior write is in-bounds and the
    # full original volume is covered by interiors
    pads = [(o, max(o, c - (d + o))) for d, c, o in zip(volume_shape, crop, ov)]
    px = x + pads[0][0] + pads[0][1]
    py = y + pads[1][0] + pads[1][1]
    pz = z + pads[2][0] + pads[2][1]
    origins = np.asarray(
        crop_origins((px, py, pz), crop, ov), np.int32
    )  # [T, 3] static
    cx, cy, cz = crop
    ox, oy, oz = ov
    interior = (
        slice(ox, cx - ox) if ox else slice(0, cx),
        slice(oy, cy - oy) if oy else slice(0, cy),
        slice(oz, cz - oz) if oz else slice(0, cz),
    )

    @jax.jit
    def pipeline(params, volume, mean, std):
        vol = ((volume.astype(jnp.float32) - mean) / std)
        vol = jnp.pad(vol, pads, mode="reflect")
        origin_table = jnp.asarray(origins)

        vec_buf = jnp.zeros((px, py, pz, 3), dtype)
        skel_buf = jnp.zeros((px, py, pz), jnp.uint8)

        def tile_body(i, carry):
            vec_buf, skel_buf = carry
            o = origin_table[i]
            tile = jax.lax.dynamic_slice(vol, (o[0], o[1], o[2]), crop)
            out = model.apply(params, tile[None, ..., None], deterministic=True)[0]
            vec = out[..., 0:3]
            skel = out[..., 3:4]
            prob = out[..., 4:5]
            keep = (prob > prob_threshold).astype(out.dtype)
            vec = vec * keep
            skel = skel * keep
            # reference dilation stack (eval.py:152-157)
            s5 = skel[None]
            s5 = binary_dilation(s5)
            s5 = binary_dilation_2d(binary_dilation_2d(s5))
            # bit 0: dilated skeleton; bit 1: semantic foreground (prob > thr)
            skel_bin = (s5[0, ..., 0] > prob_threshold).astype(jnp.uint8)
            skel_bin = skel_bin | (keep[..., 0].astype(jnp.uint8) << 1)

            vec_buf = jax.lax.dynamic_update_slice(
                vec_buf,
                vec[interior].astype(dtype),
                (o[0] + ox, o[1] + oy, o[2] + oz, 0),
            )
            skel_buf = jax.lax.dynamic_update_slice(
                skel_buf,
                skel_bin[interior],
                (o[0] + ox, o[1] + oy, o[2] + oz),
            )
            return vec_buf, skel_buf

        vec_buf, skel_buf = jax.lax.fori_loop(
            0, origins.shape[0], tile_body, (vec_buf, skel_buf)
        )

        # trim padding -> original volume grid
        vec_full = jax.lax.dynamic_slice(
            vec_buf, (pads[0][0], pads[1][0], pads[2][0], 0), (x, y, z, 3)
        )
        skel_full = jax.lax.dynamic_slice(
            skel_buf, (pads[0][0], pads[1][0], pads[2][0]), (x, y, z)
        )

        # phase 2: whole-volume connected components, on device, seam-free
        # (bit 0 of skel_full is the dilated skeleton; bit 1 the semantic mask)
        labels = label_components(
            skel_full & 1, max_rounds=cc_rounds,
            propagates_per_round=cc_propagates_per_round,
            jumps_per_round=cc_jumps_per_round,
        )

        # phase 3: iterated embedding walk + instance gather, TILED — the
        # full-volume f32 embedding would need several multi-GB temporaries
        # at 512^3; per-tile it is bounded by the tile size
        a_origins = jnp.asarray(
            np.asarray(crop_origins((x, y, z), crop, (0, 0, 0)), np.int32)
        )
        scale_arr = jnp.asarray(vector_scale, jnp.float32)
        inst_buf = jnp.zeros((x, y, z), jnp.int32)

        def assign_body(i, inst_buf):
            o = a_origins[i]
            vtile = jax.lax.dynamic_slice(
                vec_full, (o[0], o[1], o[2], 0), (*crop, 3)
            ).astype(jnp.float32)
            emb = vector_to_embedding(scale_arr, vtile[None], n=embed_iterations,
                                      exit_fraction=embed_exit_fraction,
                                      exit_cycle=embed_exit_cycle,
                                      compact_div=embed_compact_div)[0]
            emb = emb + o.astype(jnp.float32)[None, None, None, :]
            idx = jnp.round(emb).astype(jnp.int32)
            ix = jnp.clip(idx[..., 0], 0, x - 1)
            iy = jnp.clip(idx[..., 1], 0, y - 1)
            iz = jnp.clip(idx[..., 2], 0, z - 1)
            tile_inst = labels[ix, iy, iz]
            # semantic gate from the persisted probability decision (bit 1) —
            # NOT vec!=0, which would zero genuine fg voxels whose stored
            # vector happens to be exactly zero (instance centers)
            fg = jax.lax.dynamic_slice(skel_full, (o[0], o[1], o[2]), crop) >> 1
            tile_inst = jnp.where(fg > 0, tile_inst, 0)
            return jax.lax.dynamic_update_slice(inst_buf, tile_inst, (o[0], o[1], o[2]))

        inst = jax.lax.fori_loop(0, a_origins.shape[0], assign_body, inst_buf)
        return inst

    return pipeline


def make_compact_assign_tile(a_crop, volume_shape, scale_arr, n, decay, div):
    """Fully fg-compacted phase-3 tile: walk AND label-gather only the
    semantically-gated voxels.

    The assign output is gated — background voxels are 0 regardless of
    where their walk lands — so with fg at the usual few percent, the
    dense per-tile walk (10 full-tile gathers + one full-tile label
    gather, 327 ms at 256^2x64 / N=10 on v5e) does ~25x more gather work
    than the output needs. Here the fg voxels compact into a
    ``tile // div`` buffer: N-1 walk steps + the final whole-volume label
    gather all run at fg size, and the labels scatter back into a zero
    tile. Output-exact vs the dense path (same elementwise chain; the
    final round commutes with the integer origin shift); a ``lax.cond``
    falls back to the dense exact walk when fg exceeds the buffer.
    Measured: phase 3 6.0 s -> (see runs/bench_r05_final.json vs the
    compact-assign rerun). Reference walk semantics:
    /root/reference/skoots/lib/vector_to_embedding.py:80-133, N=10 at
    eval.py:271-273.
    """
    ax, ay, az = a_crop
    vtot = ax * ay * az
    cap = max(vtot // div, 1)
    x, y, z = volume_shape
    sizes = jnp.asarray(a_crop, jnp.int32)
    strides = jnp.asarray([ay * az, az, 1], jnp.int32)
    scale_v = jnp.asarray(scale_arr, jnp.float32).reshape(1, 3)

    def dense(vtile, fg, labels, o):
        emb = vector_to_embedding(scale_arr, vtile[None], n=n, decay=decay)[0]
        emb = emb + o.astype(jnp.float32)[None, None, None, :]
        idx = jnp.round(emb).astype(jnp.int32)
        ix = jnp.clip(idx[..., 0], 0, x - 1)
        iy = jnp.clip(idx[..., 1], 0, y - 1)
        iz = jnp.clip(idx[..., 2], 0, z - 1)
        return jnp.where(fg, labels[ix, iy, iz], 0)

    def compact(vtile, fg, labels, o):
        flat_fg = fg.reshape(-1)
        (sel,) = jnp.nonzero(flat_fg, size=cap, fill_value=vtot)
        sel_safe = jnp.minimum(sel, vtot - 1)
        flat_vec = vtile.reshape(vtot, 3)
        vec_pad = jnp.concatenate(
            [flat_vec, jnp.zeros((1, 3), jnp.float32)], axis=0)
        c0 = sel_safe // (ay * az)
        r = sel_safe % (ay * az)
        coord = jnp.stack([c0, r // az, r % az], -1).astype(jnp.float32)
        cur = coord + flat_vec[sel_safe] * scale_v
        step = 1.0
        for _ in range(n - 1):
            step = step * decay
            idx = jnp.clip(jnp.round(cur).astype(jnp.int32), 0, sizes - 1)
            li = jnp.sum(idx * strides, axis=-1)
            li = jnp.where(sel < vtot, li, vtot)  # pad rows -> zero row
            cur = cur + vec_pad[li] * (scale_v * step)
        g = jnp.round(cur).astype(jnp.int32) + o[None, :]
        vals = labels[
            jnp.clip(g[:, 0], 0, x - 1),
            jnp.clip(g[:, 1], 0, y - 1),
            jnp.clip(g[:, 2], 0, z - 1),
        ]
        vals = jnp.where(sel < vtot, vals, 0)
        tile = jnp.zeros((vtot,), labels.dtype).at[sel].set(vals, mode="drop")
        return tile.reshape(a_crop)

    def assign_tile(vtile, fg, labels, o):
        return jax.lax.cond(fg.sum() <= cap, compact, dense,
                            vtile, fg, labels, o)

    return assign_tile


def _round4(d: int) -> int:
    return max(4, (d // 4) * 4)


def _balanced_chunks(origins: np.ndarray, max_chunk: int) -> list:
    """Split the tile-origin table into equally-sized chunks of at most
    ``max_chunk`` rows, padding (by repeating the last origin — writes are
    idempotent) only up to the balanced size. Balancing keeps every dispatch
    on ONE compiled program shape while wasting at most ``n_chunks - 1`` tile
    executions; naive fixed-size chunking wastes up to ``max_chunk - 1``
    (e.g. 24 tiles at 16/dispatch: balanced = 2x12 with zero waste, naive =
    16 + 8-padded-to-16, +25% forward work)."""
    n = len(origins)
    n_chunks = max(1, -(-n // max_chunk))
    size = -(-n // n_chunks)
    chunks = []
    for s in range(0, n, size):
        chunk = origins[s : s + size]
        if len(chunk) < size:
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], size - len(chunk), 0)]
            )
        chunks.append(chunk)
    return chunks


def make_chunked_pipeline(
    model,
    volume_shape: Tuple[int, int, int],
    crop: Tuple[int, int, int] = (128, 128, 64),
    overlap: Tuple[int, int, int] = (16, 16, 8),
    assign_crop: Tuple[int, int, int] | None = (256, 256, 64),
    vector_scale: Sequence[float] = (60.0, 60.0, 12.0),
    prob_threshold: float = 0.8,
    embed_iterations: int = 10,
    embed_decay: float = 1.0,
    embed_exit_fraction: float | None = None,
    embed_exit_cycle: bool = False,
    embed_compact_div: int | None = None,
    dilation_3d: int = 1,
    dilation_2d: int = 2,
    semantic_threshold: float | None = None,
    semantic_gate: bool = True,
    cc_rounds: int = 32,
    cc_propagates_per_round: int = 128,
    cc_jumps_per_round: int = 1,
    cc_scans_per_round: int = 0,
    cc_impl: str = "auto",
    tiles_per_dispatch: int = 16,
    dtype=jnp.bfloat16,
):
    """Whole-volume on-device segmentation split into several dispatches.

    Identical math to :func:`make_device_pipeline`, but the tile sweeps are
    chunked into separate jit calls with HBM-resident (donated) buffers —
    for very large volumes where one program would run for minutes (some
    execution environments bound single-program wall time), and so partial
    progress overlaps host-side orchestration.

    Carries the host-streaming engine's full knob surface (dilation stack,
    split semantic threshold, gate toggle, walk decay) so ``run_inference``
    can delegate in-HBM volumes here with identical semantics.

    Returns ``run(params, volume, mean, std) -> labels``; the jitted stages
    are built once and cached across calls.
    """
    x, y, z = volume_shape
    crop = tuple(min(c, _round4(d)) for c, d in zip(crop, volume_shape))
    ov = tuple(min(o, c // 4) for o, c in zip(overlap, crop))
    pads = [(o, max(o, c - (d + o))) for d, c, o in zip(volume_shape, crop, ov)]
    px, py, pz = (d + p[0] + p[1] for d, p in zip((x, y, z), pads))
    origins = np.asarray(crop_origins((px, py, pz), crop, ov), np.int32)
    cx, cy, cz = crop
    ox, oy, oz = ov
    interior = (
        slice(ox, cx - ox) if ox else slice(0, cx),
        slice(oy, cy - oy) if oy else slice(0, cy),
        slice(oz, cz - oz) if oz else slice(0, cz),
    )

    @jax.jit
    def prep(volume, mean, std):
        vol = (volume.astype(jnp.float32) - mean) / std
        return jnp.pad(vol, pads, mode="reflect")

    sem_thr = prob_threshold if semantic_threshold is None else semantic_threshold

    @partial(jax.jit, donate_argnums=(2, 3))
    def phase1_chunk(params, vol, vec_buf, skel_buf, chunk_origins):
        def tile_body(i, carry):
            vec_buf, skel_buf = carry
            o = chunk_origins[i]
            tile = jax.lax.dynamic_slice(vol, (o[0], o[1], o[2]), crop)
            out = model.apply(params, tile[None, ..., None], deterministic=True)[0]
            vec = out[..., 0:3]
            skel = out[..., 3:4]
            prob = out[..., 4:5]
            keep = (prob > prob_threshold).astype(out.dtype)
            vec = vec * keep
            s5 = (skel * keep)[None]
            for _ in range(dilation_3d):
                s5 = binary_dilation(s5)
            for _ in range(dilation_2d):
                s5 = binary_dilation_2d(s5)
            # bit 0: dilated skeleton; bit 1: semantic foreground
            skel_bin = (s5[0, ..., 0] > prob_threshold).astype(jnp.uint8)
            skel_bin = skel_bin | ((prob[..., 0] > sem_thr).astype(jnp.uint8) << 1)
            vec_buf = jax.lax.dynamic_update_slice(
                vec_buf, vec[interior].astype(dtype), (o[0] + ox, o[1] + oy, o[2] + oz, 0)
            )
            skel_buf = jax.lax.dynamic_update_slice(
                skel_buf, skel_bin[interior], (o[0] + ox, o[1] + oy, o[2] + oz)
            )
            return vec_buf, skel_buf

        return jax.lax.fori_loop(
            0, chunk_origins.shape[0], tile_body, (vec_buf, skel_buf)
        )

    @partial(jax.jit, donate_argnums=(0, 1))
    def trim(vec_buf, skel_buf):
        vec_full = jax.lax.dynamic_slice(
            vec_buf, (pads[0][0], pads[1][0], pads[2][0], 0), (x, y, z, 3)
        )
        skel_full = jax.lax.dynamic_slice(
            skel_buf, (pads[0][0], pads[1][0], pads[2][0]), (x, y, z)
        )
        return vec_full, skel_full

    # CC rounds are themselves chunked across dispatches (big volumes with
    # long label-propagation chains would otherwise run one program for
    # minutes)
    from skoots_tpu.ops.flood_fill import make_label_components_stepped

    # propagate-heavy schedule: one jump gather costs ~165 propagate passes
    # on v5e (see ops/flood_fill.py); poll `changed` every round
    stepped_cc = make_label_components_stepped(
        (x, y, z), rounds_per_dispatch=1,
        propagates_per_round=cc_propagates_per_round,
        jumps_per_round=cc_jumps_per_round,
        scans_per_round=cc_scans_per_round,
    )

    # sparse point-cloud CC (ops/flood_fill.py::label_components_sparse)
    # is OPT-IN only: measured on v5e at the 512^3 bench it LOSES 4x
    # (CC phase 5.5 s dense -> 23.6 s sparse, /tmp/bench_r04i run,
    # BASELINE.md round-4) — the single-op gather/scatter microbench
    # rates (runs/bench_gather.json) do not compose inside the
    # union-find while_loop. Kept for point-cloud-shaped workloads and
    # as the measured record.
    cc_impl = os.environ.get("SKOOTS_CC_IMPL", cc_impl)
    use_sparse_cc = cc_impl == "sparse"
    cc_n_max = max(1 << 14, ((x * y * z) // 32 + 8191) // 8192 * 8192)

    def run_cc(fg):
        if use_sparse_cc:
            from skoots_tpu.ops.flood_fill import label_components_sparse

            labels, ok = label_components_sparse(fg, n_max=cc_n_max)
            if bool(ok):
                run_cc.last_impl = "sparse"
                return labels
            del labels
        run_cc.last_impl = "dense"
        return stepped_cc(fg, max_rounds=cc_rounds)

    # phase-3 tiles can be much larger than forward tiles: the embedding walk
    # has no multi-hundred-channel activations, only [tile, 3] f32 temps
    a_crop = tuple(
        min(c, _round4(d))
        for c, d in zip(assign_crop or crop, volume_shape)
    )
    a_origins = np.asarray(crop_origins((x, y, z), a_crop, (0, 0, 0)), np.int32)
    scale_arr = jnp.asarray(vector_scale, jnp.float32)

    compact_assign = (
        make_compact_assign_tile(a_crop, (x, y, z), scale_arr,
                                 embed_iterations, embed_decay,
                                 embed_compact_div)
        if (embed_compact_div and semantic_gate) else None
    )

    @partial(jax.jit, donate_argnums=(3,))
    def assign_chunk(labels, vec_full, skel_full, inst, chunk_origins):
        def body(i, inst):
            o = chunk_origins[i]
            vtile = jax.lax.dynamic_slice(
                vec_full, (o[0], o[1], o[2], 0), (*a_crop, 3)
            ).astype(jnp.float32)
            if compact_assign is not None:
                # gated output: walk + label-gather only the fg voxels
                fg = (jax.lax.dynamic_slice(
                    skel_full, (o[0], o[1], o[2]), a_crop) >> 1) > 0
                tile_inst = compact_assign(vtile, fg, labels, o)
                return jax.lax.dynamic_update_slice(
                    inst, tile_inst, (o[0], o[1], o[2]))
            emb = vector_to_embedding(scale_arr, vtile[None], n=embed_iterations,
                                      decay=embed_decay,
                                      exit_fraction=embed_exit_fraction,
                                      exit_cycle=embed_exit_cycle,
                                      compact_div=embed_compact_div)[0]
            emb = emb + o.astype(jnp.float32)[None, None, None, :]
            idx = jnp.round(emb).astype(jnp.int32)
            ix = jnp.clip(idx[..., 0], 0, x - 1)
            iy = jnp.clip(idx[..., 1], 0, y - 1)
            iz = jnp.clip(idx[..., 2], 0, z - 1)
            tile_inst = labels[ix, iy, iz]
            if semantic_gate:
                # semantic gate from the persisted probability decision (bit 1)
                fg = jax.lax.dynamic_slice(
                    skel_full, (o[0], o[1], o[2]), a_crop) >> 1
                tile_inst = jnp.where(fg > 0, tile_inst, 0)
            return jax.lax.dynamic_update_slice(inst, tile_inst, (o[0], o[1], o[2]))

        return jax.lax.fori_loop(0, chunk_origins.shape[0], body, inst)

    def run(params, volume, mean, std):
        import os as _os
        import time as _time

        timing = _os.environ.get("SKOOTS_PHASE_TIMING")
        t0 = _time.time()
        run.last_phase_s = {}

        def mark(tag, *arrs):
            # phases are strict data dependencies of each other, so the
            # block_until_ready sync points cost nothing extra; always
            # record the split (bench.py reports it)
            nonlocal t0
            for a in arrs:
                a.block_until_ready()
            t1 = _time.time()
            run.last_phase_s[tag] = round(t1 - t0, 3)
            if timing:
                print(f"# phase {tag}: {t1 - t0:.2f}s", flush=True)
            t0 = t1

        vol = prep(volume, mean, std)
        vec_buf = jnp.zeros((px, py, pz, 3), dtype)
        skel_buf = jnp.zeros((px, py, pz), jnp.uint8)
        for chunk in _balanced_chunks(origins, tiles_per_dispatch):
            vec_buf, skel_buf = phase1_chunk(
                params, vol, vec_buf, skel_buf, jnp.asarray(chunk)
            )
        mark("1-forward", vec_buf, skel_buf)
        del vol
        vec_full, skel_full = trim(vec_buf, skel_buf)
        del vec_buf, skel_buf
        labels = run_cc(skel_full & 1)
        run.last_cc_impl = getattr(run_cc, "last_impl", None)
        run.last_cc_rounds = getattr(stepped_cc, "last_rounds", None)
        run.last_cc_converged = getattr(stepped_cc, "last_converged", None)
        mark("2-cc", labels)

        inst = jnp.zeros((x, y, z), jnp.int32)
        for chunk in _balanced_chunks(a_origins, tiles_per_dispatch):
            inst = assign_chunk(labels, vec_full, skel_full, inst,
                                jnp.asarray(chunk))
        mark("3-assign", inst)
        return inst

    return run


def segment_volume_chunked(model, params, volume, mean, std, **kwargs):
    """One-shot convenience wrapper around :func:`make_chunked_pipeline`."""
    run = make_chunked_pipeline(model, volume.shape, **kwargs)
    return run(params, volume, mean, std)


def make_thrifty_pipeline(
    model,
    volume_shape: Tuple[int, int, int],
    crop: Tuple[int, int, int] = (128, 128, 64),
    overlap: Tuple[int, int, int] = (16, 16, 8),
    assign_crop: Tuple[int, int, int] | None = (256, 256, 64),
    vector_scale: Sequence[float] = (60.0, 60.0, 12.0),
    prob_threshold: float = 0.8,
    embed_iterations: int = 10,
    embed_decay: float = 1.0,
    embed_exit_fraction: float | None = None,
    embed_exit_cycle: bool = False,
    embed_compact_div: int | None = None,
    dilation_3d: int = 1,
    dilation_2d: int = 2,
    semantic_threshold: float | None = None,
    semantic_gate: bool = True,
    cc_rounds: int = 32,
    cc_propagates_per_round: int = 128,
    cc_jumps_per_round: int = 1,
    cc_scans_per_round: int = 0,
    tiles_per_dispatch: int = 16,
):
    """HBM-thrifty whole-volume pipeline: ~11 bytes/voxel peak instead of
    the chunked pipeline's ~24, stretching the single-chip in-HBM ceiling
    from ~700^3 to ~1100^3 on a 16 GB device. Three savings:

    * the volume stays device-resident in its NATIVE dtype (uint8 EM data:
      1 B/vox, not f32's 4); tiles normalize on the fly inside each program
    * NO bf16 vector buffer (6 B/vox): phase 3 re-runs the forward per
      assign tile and walks the fresh field immediately — the on-device
      analogue of the streaming engine's wire_mode='recompute'
    * labels compact on device after CC (``_compact_labels`` cumsum-rank);
      when the component count fits uint16 the label volume and the
      instance output hold 2 B/vox and the final device->host mask transfer
      halves. The returned mask is ALREADY sequentially labeled 1..N.

    Assign tiles get no reflect halo for the recomputed forward (the walk
    gathers from the full label volume, so only border-voxel vector quality
    is affected; at assign tiles >= training-crop scale the instance-level
    effect measured zero — seam study, BASELINE.md round-3/4).

    Returns ``run(params, volume, mean, std) -> labels``; ``run.last_count``
    holds the component count.
    """
    x, y, z = volume_shape
    crop = tuple(min(c, _round4(d)) for c, d in zip(crop, volume_shape))
    ov = tuple(min(o, c // 4) for o, c in zip(overlap, crop))
    pads = [(o, max(o, c - (d + o))) for d, c, o in zip(volume_shape, crop, ov)]
    px, py, pz = (d + p[0] + p[1] for d, p in zip((x, y, z), pads))
    origins = np.asarray(crop_origins((px, py, pz), crop, ov), np.int32)
    cx, cy, cz = crop
    ox, oy, oz = ov
    interior = (
        slice(ox, cx - ox) if ox else slice(0, cx),
        slice(oy, cy - oy) if oy else slice(0, cy),
        slice(oz, cz - oz) if oz else slice(0, cz),
    )
    sem_thr = prob_threshold if semantic_threshold is None else semantic_threshold

    @jax.jit
    def prep(volume):  # native dtype: no whole-volume f32 copy ever exists
        return jnp.pad(volume, pads, mode="reflect")

    def _normalize(tile, mean, std):
        return (tile.astype(jnp.float32) - mean) / std

    @partial(jax.jit, donate_argnums=(2,))
    def phase1_chunk(params, vol, skel_buf, chunk_origins, mean, std):
        def tile_body(i, skel_buf):
            o = chunk_origins[i]
            tile = jax.lax.dynamic_slice(vol, (o[0], o[1], o[2]), crop)
            xs = _normalize(tile, mean, std)
            out = model.apply(params, xs[None, ..., None], deterministic=True)[0]
            skel = out[..., 3:4]
            prob = out[..., 4:5]
            keep = (prob > prob_threshold).astype(out.dtype)
            s5 = (skel * keep)[None]
            for _ in range(dilation_3d):
                s5 = binary_dilation(s5)
            for _ in range(dilation_2d):
                s5 = binary_dilation_2d(s5)
            # bit 0: dilated skeleton; bit 1: semantic foreground
            skel_bin = (s5[0, ..., 0] > prob_threshold).astype(jnp.uint8)
            skel_bin = skel_bin | ((prob[..., 0] > sem_thr).astype(jnp.uint8) << 1)
            return jax.lax.dynamic_update_slice(
                skel_buf, skel_bin[interior], (o[0] + ox, o[1] + oy, o[2] + oz)
            )

        return jax.lax.fori_loop(0, chunk_origins.shape[0], tile_body, skel_buf)

    @partial(jax.jit, donate_argnums=(0,))
    def trim_skel(skel_buf):
        return jax.lax.dynamic_slice(
            skel_buf, (pads[0][0], pads[1][0], pads[2][0]), (x, y, z)
        )

    from skoots_tpu.ops.flood_fill import (
        _compact_labels,
        make_label_components_stepped,
    )

    stepped_cc = make_label_components_stepped(
        (x, y, z), rounds_per_dispatch=1,
        propagates_per_round=cc_propagates_per_round,
        jumps_per_round=cc_jumps_per_round,
        scans_per_round=cc_scans_per_round,
    )
    compact = jax.jit(_compact_labels, donate_argnums=(0,))
    to_u16 = jax.jit(lambda v: v.astype(jnp.uint16), donate_argnums=(0,))

    a_crop = tuple(
        min(c, _round4(d)) for c, d in zip(assign_crop or crop, volume_shape)
    )
    a_origins = np.asarray(crop_origins((x, y, z), a_crop, (0, 0, 0)), np.int32)
    scale_arr = jnp.asarray(vector_scale, jnp.float32)
    compact_assign = (
        make_compact_assign_tile(a_crop, (x, y, z), scale_arr,
                                 embed_iterations, embed_decay,
                                 embed_compact_div)
        if (embed_compact_div and semantic_gate) else None
    )

    @partial(jax.jit, donate_argnums=(3,))
    def assign_chunk(params, labels, vol, inst, chunk_origins, mean, std):
        def body(i, inst):
            o = chunk_origins[i]
            # padded coords for the volume slice, unpadded for everything else
            tile = jax.lax.dynamic_slice(
                vol, (o[0] + pads[0][0], o[1] + pads[1][0], o[2] + pads[2][0]),
                a_crop,
            )
            xs = _normalize(tile, mean, std)
            out = model.apply(params, xs[None, ..., None], deterministic=True)[0]
            vec = out[..., 0:3]
            prob = out[..., 4:5]
            keep = (prob > prob_threshold).astype(out.dtype)
            vec = (vec * keep).astype(jnp.float16)  # match the stored-field path
            if compact_assign is not None:
                fg = prob[..., 0] > sem_thr
                tile_inst = compact_assign(vec.astype(jnp.float32), fg,
                                           labels, o)
                return jax.lax.dynamic_update_slice(
                    inst, tile_inst, (o[0], o[1], o[2]))
            emb = vector_to_embedding(scale_arr, vec[None].astype(jnp.float32),
                                      n=embed_iterations, decay=embed_decay,
                                      exit_fraction=embed_exit_fraction,
                                      exit_cycle=embed_exit_cycle,
                                      compact_div=embed_compact_div)[0]
            emb = emb + o.astype(jnp.float32)[None, None, None, :]
            idx = jnp.round(emb).astype(jnp.int32)
            ix = jnp.clip(idx[..., 0], 0, x - 1)
            iy = jnp.clip(idx[..., 1], 0, y - 1)
            iz = jnp.clip(idx[..., 2], 0, z - 1)
            tile_inst = labels[ix, iy, iz]
            if semantic_gate:
                fg = (prob[..., 0] > sem_thr).astype(jnp.uint8)
                tile_inst = jnp.where(fg > 0, tile_inst, 0)
            return jax.lax.dynamic_update_slice(
                inst, tile_inst, (o[0], o[1], o[2])
            )

        return jax.lax.fori_loop(0, chunk_origins.shape[0], body, inst)

    def run(params, volume, mean, std):
        import os as _os
        import time as _time

        timing = _os.environ.get("SKOOTS_PHASE_TIMING")
        t0 = _time.time()
        run.last_phase_s = {}

        def mark(tag, *arrs):
            nonlocal t0
            for a in arrs:
                a.block_until_ready()
            t1 = _time.time()
            run.last_phase_s[tag] = round(t1 - t0, 3)
            if timing:
                print(f"# phase {tag}: {t1 - t0:.2f}s", flush=True)
            t0 = t1

        mean = jnp.float32(mean)
        std = jnp.float32(std)
        vol = prep(jnp.asarray(volume))
        skel_buf = jnp.zeros((px, py, pz), jnp.uint8)
        for chunk in _balanced_chunks(origins, tiles_per_dispatch):
            skel_buf = phase1_chunk(params, vol, skel_buf, jnp.asarray(chunk),
                                    mean, std)
        mark("1-forward", skel_buf)
        skel_full = trim_skel(skel_buf)
        del skel_buf
        labels = stepped_cc(skel_full & 1, max_rounds=cc_rounds)
        run.last_cc_rounds = getattr(stepped_cc, "last_rounds", None)
        run.last_cc_converged = getattr(stepped_cc, "last_converged", None)
        labels, count = compact(labels)
        n = int(count)
        run.last_count = n
        if n < 2**16:
            labels = to_u16(labels)
        del skel_full
        mark("2-cc", labels)

        inst = jnp.zeros((x, y, z), labels.dtype)
        for chunk in _balanced_chunks(a_origins, tiles_per_dispatch):
            inst = assign_chunk(params, labels, vol, inst,
                                jnp.asarray(chunk), mean, std)
        mark("3-assign", inst)
        return inst

    return run


def estimated_device_bytes(volume_shape, thrifty: bool = False) -> int:
    """Peak HBM a whole-volume pipeline needs, conservatively.

    Chunked (default): phase 1 holds the padded f32 volume (4 B/vox) +
    bf16 vectors (6) + mask byte (1); phases 2-3 drop the volume but add
    int32 labels (4), int32 instances (4) and the stepped-CC working set
    (~2 int32 buffers). 24 B/vox covers the worse phase with headroom.

    Thrifty (:func:`make_thrifty_pipeline`): uint8 volume (1) + mask (1) +
    the CC peak of int32 labels + working set (~8) + slack for the
    per-tile forward activations — ~13 B/vox."""
    x, y, z = volume_shape
    return int(x) * int(y) * int(z) * (13 if thrifty else 24)
