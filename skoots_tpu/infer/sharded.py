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

import logging
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from skoots_tpu.ops.morphology import binary_dilation, binary_dilation_2d
from skoots_tpu.ops.vec2embed import vector_to_embedding

log = logging.getLogger(__name__)


def estimated_bytes_per_device(
    volume_shape: Tuple[int, int, int], n_space: int,
    walk_gather: str = "replicated",
) -> int:
    """Conservative per-device HBM estimate for the sharded pipeline.

    ``walk_gather='replicated'``: each walk step indexes arbitrary positions
    of the vector field, so XLA all-gathers the f32 field (12 B/vox) onto
    every device; the device's own sharded slabs (vec bf16 + emb/index f32 +
    labels i32) add roughly another 30 B/vox / n_space.

    ``walk_gather='ring'``: nothing replicates — per shard the device holds
    its bf16 vec slab plus one visiting slab (2 x 6 B), the f32 embedding
    (12 B), i32 walk indices (12 B), two label slabs (8 B) and the output
    (4 B) ≈ 48 B/vox / n_space; 64 gives headroom for XLA transients.
    """
    x, y, z = volume_shape
    vox = x * y * z
    if walk_gather == "ring":
        return (64 * vox) // max(1, n_space)
    return 12 * vox + (30 * vox) // max(1, n_space)


def device_bytes_limit() -> Optional[int]:
    """Per-device memory budget, when the backend reports one (TPU HBM);
    None on backends without memory_stats (CPU test meshes)."""
    try:
        stats = jax.devices()[0].memory_stats() or {}
        return stats.get("bytes_limit")
    except Exception:
        return None


def resolve_spatial_shards(
    requested: Optional[int],
    n_devices: int,
    volume_shape: Tuple[int, int, int],
    bytes_limit: Optional[int] = None,
) -> int:
    """Pick the spatial shard count. ``requested=None`` means auto: use
    every device when more than one is present AND the volume fits the
    sharded pipeline's per-device memory ceiling — otherwise fall back to
    the host-streaming engine (0). Explicit values (0/1 = off) pass
    through untouched; the caller errors on an explicitly-requested but
    infeasible configuration rather than silently changing it."""
    if requested is not None:
        return requested
    if n_devices <= 1:
        return 0
    n = min(n_devices, max(1, volume_shape[0] // 8))
    if n <= 1:
        return 0
    if bytes_limit is not None:
        # the pipeline auto-degrades its phase-3 walk from replicated to
        # ring gathers when the field doesn't fit, so the fallback bar is
        # the RING estimate (everything O(vox/n)) — only volumes beyond
        # even that use the host-streaming engine
        need = estimated_bytes_per_device(volume_shape, n, "ring")
        if need > bytes_limit:
            log.warning(
                "auto spatial sharding disabled: even the ring-gathered "
                "sharded pipeline needs ~%.1f GB/device for this volume "
                "but devices report %.1f GB; using the host-streaming "
                "engine (O(tile) memory) instead",
                need / 1e9, bytes_limit / 1e9,
            )
            return 0
    log.info(
        "auto spatial sharding: %d devices present -> sharding the "
        "volume's X axis %d-way (disable with --spatial-shards 0)",
        n_devices, n,
    )
    return n


def make_sharded_forward(
    model,
    mesh: Mesh,
    prob_threshold: float = 0.8,
    spatial_axis: int = 1,
    semantic_threshold: float | None = None,
):
    """Jitted phase-1 step with the volume sharded over mesh axis 'space'.

    Returns ``fwd(params, volume5d, mean, std) -> (vec, skel_u8)`` where
    ``volume5d`` is ``[B, X, Y, Z, 1]`` sharded P(None, 'space') on X.
    ``skel_u8`` is bit-packed: bit 0 = dilated thresholded skeleton (the CC
    input), bit 1 = semantic foreground (prob > threshold, un-dilated) — the
    assign-phase gate uses the actual probability decision, not vector
    non-zeroness (which misfires on exactly-zero stored vectors).
    """
    spec = [None] * 5
    spec[spatial_axis] = "space"
    vol_sharding = NamedSharding(mesh, P(*spec))
    rep = NamedSharding(mesh, P())
    sem_thr = prob_threshold if semantic_threshold is None else semantic_threshold

    @jax.jit
    def fwd(params, volume, mean, std):
        x = (volume.astype(jnp.float32) - mean) / std
        out = model.apply(params, x, deterministic=True)
        prob = out[..., 4:5]
        keep = (prob > prob_threshold).astype(out.dtype)
        vec = out[..., 0:3] * keep
        skel = binary_dilation(out[..., 3:4] * keep)
        skel = binary_dilation_2d(binary_dilation_2d(skel))
        packed = (skel > prob_threshold).astype(jnp.uint8) | (
            (prob > sem_thr).astype(jnp.uint8) << 1
        )
        return vec.astype(jnp.bfloat16), packed

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
    label_gather: str = "ring",
):
    """Phase-3 with the vector field sharded over 'space'.

    Semantics: the N-step embedding walk samples the vector field across the
    WHOLE volume (XLA inserts the cross-shard gathers for walks that leave a
    shard) rather than clamping to tile bounds — strictly more context than
    the reference's per-tile clamp (eval.py:271-277).

    label_gather:
        'replicated' — every device holds the full labeled-skeleton volume
            (simple, but per-device memory = whole volume).
        'ring' — labels stay X-sharded; shards rotate around the 'space'
            ring via ppermute and each device picks up the values its
            embedded indices own. Peak per-device label memory = 2/N of the
            volume; total ICI traffic equals one all-gather.
    """
    spec = [None] * 5
    spec[spatial_axis] = "space"
    vec_sharding = NamedSharding(mesh, P(*spec))
    out_spec = [None] * 4
    out_spec[spatial_axis] = "space"
    out_sharding = NamedSharding(mesh, P(*out_spec))
    rep = NamedSharding(mesh, P())
    lab_sharding = NamedSharding(mesh, P("space"))
    scale = jnp.asarray(vector_scale, jnp.float32)
    n_space = mesh.shape["space"]

    def walk(vec):
        emb = vector_to_embedding(scale, vec.astype(jnp.float32),
                                  n=embed_iterations)
        return emb

    if label_gather == "replicated" or n_space == 1:

        @jax.jit
        def assign(labels, vec):
            emb = walk(vec)
            sx, sy, sz = labels.shape
            idx = jnp.round(emb).astype(jnp.int32)
            ix = jnp.clip(idx[..., 0], 0, sx - 1)
            iy = jnp.clip(idx[..., 1], 0, sy - 1)
            iz = jnp.clip(idx[..., 2], 0, sz - 1)
            inst = labels[ix, iy, iz]
            return jnp.where(jnp.any(vec != 0, axis=-1), inst, 0)

        return jax.jit(
            assign, in_shardings=(rep, vec_sharding),
            out_shardings=out_sharding,
        )

    from jax import shard_map

    def ring_gather(lab_blk, ix, iy, iz, fg):
        # lab_blk [Xs, Y, Z] (this device's X shard); index blocks are the
        # device's slice of the (B, X, Y, Z) query volume
        n = jax.lax.axis_size("space")
        me = jax.lax.axis_index("space")
        xs = lab_blk.shape[0]
        perm = [((i + 1) % n, i) for i in range(n)]

        def body(s, carry):
            res, blk = carry
            owner = (me + s) % n
            lo = owner * xs
            ok = (ix >= lo) & (ix < lo + xs)
            vals = blk[jnp.clip(ix - lo, 0, xs - 1), iy, iz]
            res = jnp.where(ok, vals, res)
            blk = jax.lax.ppermute(blk, "space", perm)
            return res, blk

        res = jnp.zeros(ix.shape, lab_blk.dtype)
        res, _ = jax.lax.fori_loop(0, n, body, (res, lab_blk))
        return jnp.where(fg, res, 0)

    gather_sharded = shard_map(
        ring_gather,
        mesh=mesh,
        in_specs=(P("space"), P(None, "space"), P(None, "space"),
                  P(None, "space"), P(None, "space")),
        out_specs=P(None, "space"),
        check_vma=False,
    )

    @jax.jit
    def assign(labels, vec):
        emb = walk(vec)
        shp = labels.shape
        idx = jnp.round(emb).astype(jnp.int32)
        ix = jnp.clip(idx[..., 0], 0, shp[0] - 1)
        iy = jnp.clip(idx[..., 1], 0, shp[1] - 1)
        iz = jnp.clip(idx[..., 2], 0, shp[2] - 1)
        fg = jnp.any(vec != 0, axis=-1)
        return gather_sharded(labels, ix, iy, iz, fg)

    return jax.jit(
        assign, in_shardings=(lab_sharding, vec_sharding),
        out_shardings=out_sharding,
    )


def make_sharded_pipeline(
    model,
    mesh: Mesh,
    volume_shape: Tuple[int, int, int],
    vector_scale: Sequence[float] = (60.0, 60.0, 12.0),
    prob_threshold: float = 0.8,
    embed_iterations: int = 10,
    cc_rounds: int = 32,
    cc_propagates_per_round: int = 128,
    cc_scans_per_round: int = 0,
    label_gather: str = "ring",
    walk_gather: str = "auto",
    semantic_threshold: float | None = None,
):
    """Full volume -> instance labels over the mesh's 'space' axis.

    The multi-chip counterpart of
    :func:`skoots_tpu.infer.device_pipeline.make_device_pipeline`: one
    spatially-sharded forward over the whole volume (XLA exchanges conv
    halos over ICI — no overlap-tile redundancy), SPACE-SHARDED connected
    components of the skeleton map (propagate-only label relaxation: every
    hop is a reduce_window whose halo exchange rides ICI; no pointer-jump
    gathers, so labels never replicate), and a sharded N-step embedding walk
    whose final label lookup rotates the label slabs around the 'space' ring
    (``label_gather='ring'``, the default) — per-device label residency
    stays at 2/N of the volume through all three phases
    (/root/reference/skoots/lib/eval.py:126-284 is the phase contract;
    /root/reference/skoots/lib/flood_fill.py:13-122 the shard-and-stitch
    role). ``label_gather='replicated'`` keeps the round-1 behavior (full
    labels on every device) for A/B comparison.

    ``walk_gather`` controls the N-step embedding walk's cross-shard
    sampling: ``'replicated'`` lets XLA all-gather the f32 vector field once
    (fast, but per-device memory = 12 B/vox regardless of shard count);
    ``'ring'`` keeps the bf16 field X-sharded and rotates the slabs around
    the 'space' ring ONCE PER WALK STEP — per-device memory is O(vox/n)
    through all three phases, at the ICI cost of ``embed_iterations``
    all-gathers' worth of traffic. ``'auto'`` (default) picks 'replicated'
    when the replicated estimate fits the device's reported HBM and 'ring'
    otherwise — so the pipeline no longer has a whole-volume per-device
    ceiling; only volumes whose O(vox/n) ring working set exceeds HBM need
    the host-streaming engine (``infer.engine``, phase 3 O(tile)).

    Returns ``run(params, volume [X,Y,Z] np/jnp, mean, std) -> np.int32
    labels [X,Y,Z]`` (labels unique but non-sequential; renumber on host if
    sequential ids are needed). The jitted stages are exposed as ``run.fwd``,
    ``run.cc``, ``run.assign`` for sharding inspection and tests.
    """
    x, y, z = volume_shape
    n_space = mesh.shape["space"]
    if walk_gather == "auto":
        limit = device_bytes_limit()
        if (n_space > 1 and label_gather != "replicated"
                and limit is not None
                and estimated_bytes_per_device(volume_shape, n_space) > limit):
            log.info(
                "walk_gather auto -> ring: replicated walk needs ~%.1f "
                "GB/device, devices report %.1f GB",
                estimated_bytes_per_device(volume_shape, n_space) / 1e9,
                limit / 1e9,
            )
            walk_gather = "ring"
        else:
            walk_gather = "replicated"
    if walk_gather == "ring" and label_gather == "replicated":
        raise ValueError(
            "walk_gather='ring' requires sharded labels "
            "(label_gather='ring')"
        )
    # padded dims: divisible by 4 (model downsampling); X also by the shard
    # count so every shard gets an equal slab
    mx = math.lcm(4, n_space)
    px = -(-x // mx) * mx
    py = -(-y // 4) * 4
    pz = -(-z // 4) * 4
    pads = ((0, px - x), (0, py - y), (0, pz - z))

    fwd = make_sharded_forward(model, mesh, prob_threshold,
                               semantic_threshold=semantic_threshold)
    vol3 = NamedSharding(mesh, P("space", None, None))
    rep = NamedSharding(mesh, P())
    scale = jnp.asarray(vector_scale, jnp.float32)

    # --- space-sharded connected components, host-polled round blocks ---
    # Propagate-only: pointer jumps are whole-array gathers that would force
    # label replication across shards; 1-hop max-propagation partitions into
    # per-shard reduce_windows + ICI halo exchange. Reach per dispatch is
    # exactly ``cc_propagates_per_round`` hops, so instead of a fixed
    # device-side while_loop bound (which exits silently non-converged on
    # long skeleton paths — ADVICE r3), the host polls the cheap ``changed``
    # scalar and keeps dispatching until fixpoint, up to an extent-scaled cap.
    lab_out = rep if label_gather == "replicated" else vol3

    def _cc_init(skel):
        # reflect-padded mirror skeletons must not seed/merge labels
        inb = (
            (jax.lax.broadcasted_iota(jnp.int32, (px, py, pz), 0) < x)
            & (jax.lax.broadcasted_iota(jnp.int32, (px, py, pz), 1) < y)
            & (jax.lax.broadcasted_iota(jnp.int32, (px, py, pz), 2) < z)
        )
        fg = jnp.where(inb, skel & 1, 0) > 0
        flat = jax.lax.broadcasted_iota(jnp.int32, (px, py, pz), 0) * (py * pz)
        flat = flat + jax.lax.broadcasted_iota(jnp.int32, (px, py, pz), 1) * pz
        flat = flat + jax.lax.broadcasted_iota(jnp.int32, (px, py, pz), 2)
        return jnp.where(fg, flat + 1, 0)

    def _cc_round(labels):
        fg = labels > 0

        # axis-sweep rounds first (segmented max scans, ops.flood_fill):
        # under GSPMD the scan along the sharded X axis partitions into
        # per-shard scans + an ICI carry exchange — unbounded run reach
        # without label replication. SKOOTS_CC_SCANS overrides, like the
        # single-device stepped CC.
        import os as _os

        from skoots_tpu.ops.flood_fill import _axis_run_max

        n_scans = int(_os.environ.get("SKOOTS_CC_SCANS", cc_scans_per_round))
        orig = labels
        for _ in range(n_scans):
            for ax in range(3):
                labels = _axis_run_max(labels, fg, ax)

        def propagate(lab):
            # separable 26-conn max (3x 1D reduce_windows), masked to fg
            for ax in range(3):
                win = [1, 1, 1]
                win[ax] = 3
                pads = tuple((1, 1) if w == 3 else (0, 0) for w in win)
                lab = jax.lax.reduce_window(
                    lab, jnp.int32(0), jax.lax.max, tuple(win), (1, 1, 1),
                    pads,
                )
            return jnp.where(fg, lab, 0)

        new = labels
        for _ in range(cc_propagates_per_round):
            new = propagate(new)
        # convergence is judged against the PRE-scan labels: a round whose
        # only progress came from the scans still counts as changed
        return new, jnp.any(new != orig)

    cc_init = jax.jit(_cc_init, in_shardings=vol3, out_shardings=vol3)
    cc_round = jax.jit(_cc_round, in_shardings=vol3,
                       out_shardings=(vol3, rep), donate_argnums=0)

    def cc(skel):
        """Label the (sharded) skeleton to convergence; labels stay
        'space'-sharded between dispatches (replicated mode reshards at the
        end). Warns — loudly — if the cap is hit before fixpoint."""
        import warnings

        labels = cc_init(skel)
        # reach needed ~= longest geodesic skeleton path. Bound it by the
        # Manhattan diameter x4 (tortuosity allowance); never below the
        # caller's explicit cc_rounds * propagates budget.
        max_hops = max(cc_rounds * cc_propagates_per_round,
                       4 * (px + py + pz))
        max_dispatches = -(-max_hops // cc_propagates_per_round)
        converged = False
        for _ in range(max_dispatches):
            labels, changed = cc_round(labels)
            if not bool(changed):
                converged = True
                break
        if not converged:
            warnings.warn(
                "sharded CC hit its round cap before convergence "
                f"({max_dispatches} dispatches x {cc_propagates_per_round} "
                "hops); some instances may be split. Raise cc_rounds or "
                "cc_propagates_per_round.",
                RuntimeWarning,
            )
        if label_gather == "replicated":
            labels = jax.device_put(labels, rep)
        return labels

    vec5 = NamedSharding(mesh, P(None, "space", None, None, None))
    out4 = NamedSharding(mesh, P(None, "space", None, None))

    def _walk_idx(vec):
        emb = vector_to_embedding(scale, vec.astype(jnp.float32),
                                  n=embed_iterations)
        idx = jnp.round(emb).astype(jnp.int32)
        # clamp into the REAL region (device_pipeline semantics): walks that
        # leave the volume land on the nearest in-bounds voxel, never the pad
        ix = jnp.clip(idx[..., 0], 0, x - 1)
        iy = jnp.clip(idx[..., 1], 0, y - 1)
        iz = jnp.clip(idx[..., 2], 0, z - 1)
        return ix, iy, iz

    if label_gather == "replicated":

        def _assign(labels, vec, skel):
            ix, iy, iz = _walk_idx(vec)
            inst = labels[ix, iy, iz]
            # semantic gate from the persisted probability decision (bit 1)
            return jnp.where((skel[None] >> 1) > 0, inst, 0)

        assign = jax.jit(
            _assign,
            in_shardings=(lab_out, vec5, NamedSharding(mesh, P("space"))),
            out_shardings=out4,
        )
    elif walk_gather == "ring":
        from jax import shard_map

        xs = px // n_space
        perm = [((i + 1) % n_space, i) for i in range(n_space)]
        scale_b = scale.reshape(1, 1, 1, 3)

        def _ring_assign(lab_blk, vec_blk, skel_blk):
            # this device's X slab of everything: lab [xs,py,pz] i32,
            # vec [1,xs,py,pz,3] bf16, skel [xs,py,pz] u8. The walk's
            # cross-shard samples ride the ring — each step rotates the
            # bf16 vec slabs around 'space' and each device picks up the
            # deltas whose global x index the visiting slab owns. Nothing
            # replicates: peak residency is 2 slabs of vec + 2 of labels.
            n = jax.lax.axis_size("space")
            me = jax.lax.axis_index("space")
            vb = vec_blk[0]  # [xs, py, pz, 3]
            coords = jnp.stack([
                jax.lax.broadcasted_iota(jnp.float32, vb.shape[:3], 0)
                + (me * xs).astype(jnp.float32),
                jax.lax.broadcasted_iota(jnp.float32, vb.shape[:3], 1),
                jax.lax.broadcasted_iota(jnp.float32, vb.shape[:3], 2),
            ], axis=-1)
            embed = coords + vb.astype(jnp.float32) * scale_b

            def _gather_vec(ix, iy, iz):
                def body(s, carry):
                    res, blk = carry
                    owner = (me + s) % n
                    lo = owner * xs
                    ok = (ix >= lo) & (ix < lo + xs)
                    vals = blk[jnp.clip(ix - lo, 0, xs - 1), iy, iz, :]
                    res = jnp.where(ok[..., None],
                                    vals.astype(jnp.float32), res)
                    blk = jax.lax.ppermute(blk, "space", perm)
                    return res, blk

                res = jnp.zeros(ix.shape + (3,), jnp.float32)
                res, _ = jax.lax.fori_loop(0, n, body, (res, vb))
                return res

            def step(_, embed):
                # same contract as ops.vec2embed._vec2embed: intermediate
                # indices clip to the PADDED extents, the original field is
                # re-sampled (not the updated one), decay 1.0
                idx = jnp.round(embed).astype(jnp.int32)
                ix = jnp.clip(idx[..., 0], 0, px - 1)
                iy = jnp.clip(idx[..., 1], 0, py - 1)
                iz = jnp.clip(idx[..., 2], 0, pz - 1)
                return embed + _gather_vec(ix, iy, iz) * scale_b

            embed = jax.lax.fori_loop(0, embed_iterations - 1, step, embed)
            idx = jnp.round(embed).astype(jnp.int32)
            # final lookup clamps into the REAL region, like _walk_idx
            ix = jnp.clip(idx[..., 0], 0, x - 1)
            iy = jnp.clip(idx[..., 1], 0, y - 1)
            iz = jnp.clip(idx[..., 2], 0, z - 1)

            def lab_body(s, carry):
                res, blk = carry
                owner = (me + s) % n
                lo = owner * xs
                ok = (ix >= lo) & (ix < lo + xs)
                vals = blk[jnp.clip(ix - lo, 0, xs - 1), iy, iz]
                res = jnp.where(ok, vals, res)
                blk = jax.lax.ppermute(blk, "space", perm)
                return res, blk

            inst = jnp.zeros(ix.shape, lab_blk.dtype)
            inst, _ = jax.lax.fori_loop(0, n, lab_body, (inst, lab_blk))
            fg = (skel_blk >> 1) > 0
            return jnp.where(fg, inst, 0)[None]

        assign = jax.jit(
            shard_map(
                _ring_assign, mesh=mesh,
                in_specs=(P("space"), P(None, "space"), P("space")),
                out_specs=P(None, "space"),
                check_vma=False,
            ),
            in_shardings=(lab_out, vec5, NamedSharding(mesh, P("space"))),
            out_shardings=out4,
        )
    else:
        from jax import shard_map

        xs = px // n_space

        def _ring_gather(lab_blk, ix, iy, iz, fg):
            # lab_blk [xs, py, pz]: this device's X slab. Rotate the slabs
            # around the ring; each device keeps the values whose global x
            # index the visiting slab owns. One full rotation = the traffic
            # of an all-gather but only 2 slabs resident per device.
            n = jax.lax.axis_size("space")
            me = jax.lax.axis_index("space")
            perm = [((i + 1) % n, i) for i in range(n)]

            def body(s, carry):
                res, blk = carry
                owner = (me + s) % n
                lo = owner * xs
                ok = (ix >= lo) & (ix < lo + xs)
                vals = blk[jnp.clip(ix - lo, 0, xs - 1), iy, iz]
                res = jnp.where(ok, vals, res)
                blk = jax.lax.ppermute(blk, "space", perm)
                return res, blk

            res = jnp.zeros(ix.shape, lab_blk.dtype)
            res, _ = jax.lax.fori_loop(0, n, body, (res, lab_blk))
            return jnp.where(fg, res, 0)

        gather_sharded = shard_map(
            _ring_gather,
            mesh=mesh,
            in_specs=(P("space"), P(None, "space"), P(None, "space"),
                      P(None, "space"), P(None, "space")),
            out_specs=P(None, "space"),
            check_vma=False,
        )

        def _assign(labels, vec, skel):
            ix, iy, iz = _walk_idx(vec)
            fg = (skel[None] >> 1) > 0
            return gather_sharded(labels, ix, iy, iz, fg)

        assign = jax.jit(
            _assign,
            in_shardings=(lab_out, vec5, NamedSharding(mesh, P("space"))),
            out_shardings=out4,
        )

    def run(params, volume, mean, std):
        vol = np.pad(np.asarray(volume, np.float32), pads, mode="reflect")
        vol_dev = shard_volume(jnp.asarray(vol)[None, ..., None], mesh)
        vec, skel = fwd(params, vol_dev, jnp.float32(mean), jnp.float32(std))
        labels = cc(skel[0, ..., 0])
        inst = assign(labels, vec, skel[0, ..., 0])
        return np.asarray(inst[0])[:x, :y, :z]

    run.fwd, run.cc, run.assign = fwd, cc, assign
    return run
