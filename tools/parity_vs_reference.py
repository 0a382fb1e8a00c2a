"""Instance-level parity vs the REFERENCE pipeline semantics (SURVEY §7.3).

Drives the trained convergence checkpoint through TWO independent pipelines
on the same held-out synthetic volume:

1. A reference-faithful torch 3-phase pipeline, re-implemented here from
   /root/reference/skoots/lib/eval.py:126-284 semantics:
   crop sweep with interior-trim writes -> prob>0.8 gate -> skeleton
   dilation (1x 3D max-pool + 2x in-plane) -> scipy.ndimage.label (6-conn
   default, flood_fill.py:135) -> N=10 embedding walk with the reference's
   per-dim clamp (vector_to_embedding.py:80-133) -> whole-volume skeleton
   indexing (skeleton.py:656-695) -> renumber. The network is the torch
   twin from tests/test_compat.py loaded with the flax weights via
   utils.torch_compat.export_torch_state (round-trip-lossless, tested).

2. Our production engine: skoots_tpu.infer.run_inference with the same
   crop geometry and knobs.

Instances are matched by mask IoU inside the region the reference pipeline
actually writes (it never writes the outer `overlap` band — the interior
trim at eval.py:160-176 skips it), and parity requires every matched
instance at IoU >= 0.95 (SURVEY §7.3 bar).

The engine is run in STRICT reference mode for the parity comparison:
``semantic_gate=False`` (the reference gates nothing at assignment,
eval.py:277, so background voxels under the dilated-skeleton halo
self-gather labels) and the reference's fixed dilation stack (1x3D+2x2D).
The engine's DEFAULT mode (semantic gate on, auto dilation) is scored
against ground truth alongside, recording what the deliberate deviation
buys: on this volume the gated masks match GT at IoU 0.999 while
reference-semantics masks include a ~2-3 voxel halo (IoU vs GT ~0.22).
Writes runs/parity/result.json.

Run: python tools/parity_vs_reference.py [--cpu] [--out runs/parity]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

CKPT = "runs/convergence/models/Aug17_03-13-25.skoots"


def _ref_crops(shape, crop, overlap):
    """Reference cropper semantics (cropper.py:58-144): stride
    crop - 2*overlap, final crop clamped to fit; yields clamped origins."""
    crop = [min(c, s) for c, s in zip(crop, shape)]
    xs = []
    x = 0
    while x < shape[0]:
        _x = x if x + crop[0] <= shape[0] else shape[0] - crop[0]
        y = 0
        while y < shape[1]:
            _y = y if y + crop[1] <= shape[1] else shape[1] - crop[1]
            z = 0
            while z < shape[2]:
                _z = z if z + crop[2] <= shape[2] else shape[2] - crop[2]
                xs.append((_x, _y, _z))
                z += crop[2] - overlap[2] * 2
            y += crop[1] - overlap[1] * 2
        x += crop[0] - overlap[0] * 2
    return crop, xs


def _torch_dilate(torch, t, kernel=(3, 3, 3)):
    """Float max-pool 'binary' dilation (reference morphology.py:156-199)."""
    import torch.nn.functional as F

    pads = tuple(k // 2 for k in kernel)
    return F.max_pool3d(t, kernel_size=kernel, stride=1,
                        padding=pads)


def _ref_vec2embed(torch, scale, vec, n=10):
    """Reference _vec2embed3D (vector_to_embedding.py:80-133): mesh + s*v,
    then n-1 rounds of gathering the vector at the rounded current embed.
    Keeps the reference's per-dim clamp to [0, k] (k, not k-1 — the raveled
    clamp bounds the total) and raveled-index gather."""
    b, c, x, y, z = vec.shape
    mesh = torch.stack(torch.meshgrid(
        torch.arange(x, dtype=torch.float32),
        torch.arange(y, dtype=torch.float32),
        torch.arange(z, dtype=torch.float32), indexing="ij"))[None]
    sc = scale.view(1, 3, 1, 1, 1)
    mesh = mesh + vec * sc
    for _ in range(n - 1):
        index = mesh.round()
        for i, k in enumerate([x, y, z]):
            index[:, i] = index[:, i].clamp(0, k)
        flat = ((index[:, [0]] * y * z) + (index[:, [1]] * z) + index[:, [2]])
        flat = flat.clamp(0, x * y * z - 1).long()
        sv = vec * sc
        for i in range(c):
            mesh[:, [i]] = mesh[:, [i]] + sv[:, [i]].take(flat)
    return mesh


def _ref_index_skeleton(torch, skeleton, embed):
    """Reference index_skeleton_by_embed (skeleton.py:656-695): round,
    per-dim clamp into the FULL skeleton volume, gather."""
    b, c, x, y, z = embed.shape
    e = embed.view(c, -1).round()
    xi = e[0].clamp(0, skeleton.shape[0] - 1).long()
    yi = e[1].clamp(0, skeleton.shape[1] - 1).long()
    zi = e[2].clamp(0, skeleton.shape[2] - 1).long()
    return skeleton[xi, yi, zi].view(x, y, z)


def reference_pipeline(torch, twin, volume, mean, std, vector_scale,
                       crop=(96, 96, 20), overlap=(16, 16, 4),
                       assign_crop=(96, 96, 20), assign_overlap=(16, 16, 4)):
    """eval.py:126-284 re-implemented faithfully (see module docstring)."""
    from scipy import ndimage

    shape = volume.shape
    vectors = np.zeros((3, *shape), np.float16)
    skeleton = np.zeros(shape, np.uint8)

    crop, origins = _ref_crops(shape, list(crop), overlap)
    with torch.no_grad():
        for (ox, oy, oz) in origins:
            blk = volume[ox:ox + crop[0], oy:oy + crop[1], oz:oz + crop[2]]
            t = torch.from_numpy(blk.astype(np.float32))[None, None]
            t = (t - mean) / std
            out = twin(t)
            prob = out[:, [-1]]
            skel_map = out[:, [-2]].float()
            vec = out[:, 0:3]
            gate = prob.gt(0.8)
            vec = vec * gate
            skel_map = skel_map * gate
            skel_map = _torch_dilate(torch, skel_map, (3, 3, 3))
            for _ in range(2):
                skel_map = _torch_dilate(torch, skel_map, (3, 3, 1))
            dst = tuple(
                slice(o + ov, o + c - ov)
                for o, c, ov in zip((ox, oy, oz), crop, overlap))
            src = tuple(
                slice(ov, c - ov) for c, ov in zip(crop, overlap))
            vectors[(slice(None), *dst)] = (
                vec[0][(slice(None), *src)].half().numpy())
            skeleton[dst] = skel_map[0, 0][src].gt(0.8).numpy()

    # phase 2: scipy flood fill, reference connectivity (6-conn default,
    # flood_fill.py:135). The reference shards >1000^3 volumes into crops
    # with seam merging; at this size one scipy call IS its behavior.
    labels, _ = ndimage.label(skeleton)
    labels = labels.astype(np.int32)

    # phase 3
    instance = np.zeros(shape, np.int32)
    a_crop, a_origins = _ref_crops(shape, list(assign_crop), assign_overlap)
    lab_t = torch.from_numpy(labels)
    scale_t = torch.tensor(vector_scale, dtype=torch.float32)
    with torch.no_grad():
        for (ox, oy, oz) in a_origins:
            vec = torch.from_numpy(
                vectors[:, ox:ox + a_crop[0], oy:oy + a_crop[1],
                        oz:oz + a_crop[2]].astype(np.float32))[None]
            emb = _ref_vec2embed(torch, scale_t, vec, n=10)
            emb = emb + torch.tensor(
                (ox, oy, oz), dtype=torch.float32).view(1, 3, 1, 1, 1)
            inst = _ref_index_skeleton(torch, lab_t, emb)
            dst = tuple(
                slice(o + ov, o + c - ov)
                for o, c, ov in zip((ox, oy, oz), a_crop, assign_overlap))
            src = tuple(
                slice(ov, c - ov) for c, ov in zip(a_crop, assign_overlap))
            instance[dst] = inst[src].numpy()

    # renumber (fastremap.renumber role, eval.py:304-306)
    uniq = np.unique(instance)
    uniq = uniq[uniq != 0]
    lut = {int(u): i + 1 for i, u in enumerate(uniq)}
    out = np.zeros_like(instance)
    for u, v in lut.items():
        out[instance == u] = v
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="runs/parity")
    ap.add_argument("--ckpt", default=CKPT)
    ap.add_argument("--iou-bar", type=float, default=0.95)
    ap.add_argument("--crop", default="64,64,16",
                    help="tile geometry for BOTH pipelines; the default "
                         "64,64,16 exactly tiles the 128x128x32 volume")
    ap.add_argument("--overlap", default="0,0,0",
                    help="overlap for BOTH pipelines. NOTE: with nonzero "
                         "overlap the reference never writes the outer "
                         "overlap band (eval.py:162-176; its pad call is "
                         "commented out at eval.py:67-71), so voxels whose "
                         "embedding walks into that band are dropped by the "
                         "reference but kept by our engine — measured on "
                         "this phantom: an edge-hugging tube loses 99% of "
                         "its reference mask that way (runs/parity/"
                         "result_overlap_geometry.json). Exact tiling "
                         "removes that asymmetry and compares the "
                         "algorithms where both define an output.")
    ap.add_argument("--skip-default", action="store_true",
                    help="skip the default-mode engine run (reuse prior "
                         "default_vs_gt numbers when iterating on strict "
                         "parity)")
    ap.add_argument("--volume", choices=("tubes", "blobs"), default="tubes",
                    help="held-out phantom: 'tubes' (seed-777 make_tubes, "
                         "the SURVEY §7.3 parity volume) or 'blobs' (the "
                         "accuracy campaign's blobs val phantom, seed 999) "
                         "— the latter answers VERDICT r4 item 4: does the "
                         "REFERENCE pipeline merge the same touching blobs "
                         "our engine merges (method-level limit), or "
                         "separate them (implementation defect)?")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import torch

    from test_compat import _build_torch_twin  # tests/ twin (order-validated)

    from skoots_tpu.train.checkpoint import load_checkpoint
    from skoots_tpu.utils.io import imsave
    from skoots_tpu.utils.synthetic import make_tubes
    from skoots_tpu.utils.torch_compat import export_torch_state
    from skoots_tpu.validate.metrics import mask_iou

    os.makedirs(args.out, exist_ok=True)
    ck = load_checkpoint(args.ckpt)
    cfg = ck["cfg"]
    mean, std = float(ck["dataset_mean"]), float(ck["dataset_std"])
    vec_scale = tuple(float(v) for v in cfg.SKOOTS.VECTOR_SCALING)

    # held-out volume, same generator regime as training (seeds 100-102/999)
    if args.volume == "blobs":
        from tools.accuracy_campaign import _phantom

        img, gt_labels, _ = _phantom("blobs", seed=999)
    else:
        img, gt_labels, _ = make_tubes(shape=(128, 128, 32), n_tubes=5,
                                       radius=5, seed=777,
                                       min_separation=16.0)

    # ---- twin with the trained weights
    twin = _build_torch_twin(
        torch, list(cfg.MODEL.DIMS), list(cfg.MODEL.DEPTHS),
        cfg.MODEL.IN_CHANNELS, cfg.MODEL.OUT_CHANNELS,
        k=cfg.MODEL.KERNEL_SIZE)
    template = {k: np.asarray(v.numpy()) for k, v in twin.state_dict().items()}
    state, n_exp, skipped, unused = export_torch_state(
        ck["params"], template, cfg)
    assert not skipped and not unused, (skipped, unused)
    twin.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in state.items()})
    twin.eval()
    print(f"exported {n_exp} tensors into the torch twin")

    # forward-parity spot check (bf16 flax vs f32 torch; loose bound)
    import jax.numpy as jnp

    from skoots_tpu.models import cfg_to_model

    model = cfg_to_model(cfg)
    probe = img[:32, :32, :16].astype(np.float32)
    xn = (probe - mean) / std
    with torch.no_grad():
        ref_out = twin(torch.from_numpy(xn)[None, None]).numpy()
    ref_out = ref_out.transpose(0, 2, 3, 4, 1)
    got = np.asarray(
        model.apply(ck["params"], jnp.asarray(xn)[None, ..., None],
                    deterministic=True), np.float32)
    fwd_med = float(np.median(np.abs(got - ref_out)))
    fwd_p99 = float(np.quantile(np.abs(got - ref_out), 0.99))
    print(f"forward |delta| median {fwd_med:.4f} p99 {fwd_p99:.4f} (bf16 vs f32)")

    # ---- pipeline A: reference-faithful torch
    crop = tuple(int(v) for v in args.crop.split(","))
    ov = tuple(int(v) for v in args.overlap.split(","))
    t0 = time.time()
    ref_mask = reference_pipeline(
        torch, twin, img.astype(np.float32), mean, std, vec_scale,
        crop=crop, overlap=ov, assign_crop=crop, assign_overlap=ov)
    ref_s = time.time() - t0
    print(f"reference pipeline: {ref_s:.1f}s, "
          f"{len(np.unique(ref_mask)) - 1} instances")

    np.save(os.path.join(args.out, "ref_mask.npy"), ref_mask)

    # ---- pipeline B: our engine, same geometry
    vol_path = os.path.join(args.out, "parity_vol.tif")
    imsave(vol_path, img)
    from skoots_tpu.infer import run_inference

    # B1: STRICT reference semantics — no assignment gate, the reference's
    # fixed dilation stack. This is the §7.3 parity comparison.
    t0 = time.time()
    strict_mask = np.asarray(run_inference(
        vol_path, args.ckpt, crop_size=crop, overlap=ov,
        assign_crop_size=crop, assign_overlap=ov, embed_iterations=10,
        dilation_3d=1, dilation_2d=2, semantic_gate=False,
        min_instance_size=0,  # reference semantics: no speck filter
        output_path=os.path.join(args.out, "parity_strict.tif")))
    strict_s = time.time() - t0
    print(f"our engine (strict reference mode): {strict_s:.1f}s, "
          f"{len(np.unique(strict_mask)) - 1} instances")

    # B2: default mode (semantic gate, auto dilation) — scored vs GT to
    # record what the documented deviation buys.
    if args.skip_default:
        our_mask, our_s = strict_mask, float("nan")
    else:
        t0 = time.time()
        our_mask = np.asarray(run_inference(
            vol_path, args.ckpt, crop_size=crop, overlap=ov,
            assign_crop_size=crop, assign_overlap=ov, embed_iterations=10,
            output_path=os.path.join(args.out, "parity_ours.tif")))
        our_s = time.time() - t0
        print(f"our engine (default): {our_s:.1f}s, "
              f"{len(np.unique(our_mask)) - 1} instances")

    interior = tuple(slice(o, s - o) for o, s in zip(ov, img.shape))

    def match(a, b):
        """Per-a-instance best IoU against b (both already cropped)."""
        iou = mask_iou(a, b)  # [n_a, n_b]
        n_a, n_b = iou.shape
        best = iou.max(axis=1) if iou.size else np.zeros(n_a)
        argm = iou.argmax(axis=1) if iou.size else np.zeros(n_a, int)
        b_ids = np.unique(b)
        b_ids = b_ids[b_ids != 0]
        a_ids = np.unique(a)
        a_ids = a_ids[a_ids != 0]
        per = [{
            "ref_id": int(rid),
            "vox": int((a == rid).sum()),
            "best_iou": round(float(best[i]), 4),
            "our_id": int(b_ids[argm[i]]) if best[i] > 0 else None,
        } for i, rid in enumerate(a_ids)]
        return (float(best.min()) if best.size else 0.0,
                float(best.mean()) if best.size else 0.0,
                n_a, n_b, per)

    a = ref_mask[interior]
    min_iou, mean_iou, n_ref, n_ours, per_instance = match(
        a, strict_mask[interior])
    gt_min, gt_mean, n_gt, _, _ = match(gt_labels[interior],
                                        our_mask[interior])
    strict_gt_min, strict_gt_mean, _, _, _ = match(gt_labels[interior],
                                                   strict_mask[interior])
    # reference pipeline vs GROUND TRUTH, per instance: which gt ids the
    # reference-faithful pipeline merges/drops (VERDICT r4 item 4 — the
    # blobs 17/19 question needs the reference's own per-instance record)
    ref_gt_min, ref_gt_mean, _, n_ref_pred, ref_gt_per = match(
        gt_labels[interior], ref_mask[interior])
    merged_groups: dict = {}
    for row in ref_gt_per:
        if row["our_id"] is not None:
            merged_groups.setdefault(row["our_id"], []).append(row["ref_id"])
    ref_merges = [v for v in merged_groups.values() if len(v) > 1]
    ok = bool(min_iou >= args.iou_bar and n_ref == n_ours and n_ref > 0)

    result = {
        "ok": ok,
        "iou_bar": args.iou_bar,
        "min_instance_iou": round(min_iou, 4),
        "mean_instance_iou": round(mean_iou, 4),
        "ref_instances": int(n_ref),
        "our_instances": int(n_ours),
        "gt_instances": int(n_gt),
        "per_instance": per_instance,
        "default_vs_gt": None if args.skip_default else {
            "min_iou": round(gt_min, 4), "mean_iou": round(gt_mean, 4),
        },
        "strict_vs_gt": {
            "min_iou": round(strict_gt_min, 4),
            "mean_iou": round(strict_gt_mean, 4),
        },
        "reference_vs_gt": {
            "min_iou": round(ref_gt_min, 4),
            "mean_iou": round(ref_gt_mean, 4),
            "pred_instances": int(n_ref_pred),
            "merged_gt_groups": ref_merges,
            "per_instance": ref_gt_per,
        },
        "fwd_abs_delta_median": round(fwd_med, 5),
        "fwd_abs_delta_p99": round(fwd_p99, 5),
        "ref_pipeline_s": round(ref_s, 1),
        "our_pipeline_s": None if args.skip_default else round(our_s, 1),
        "strict_pipeline_s": round(strict_s, 1),
        "checkpoint": args.ckpt,
        "volume": (
            "accuracy-campaign blobs val phantom (seed 999)"
            if args.volume == "blobs"
            else "make_tubes(128,128,32,n=5,r=5,seed=777,min_sep=16)"
        ),
        "geometry": {"crop": crop, "overlap": ov},
        "note": "parity = reference-faithful torch pipeline vs our engine "
                "in strict reference mode (semantic_gate=False, fixed "
                "1x3D+2x2D dilation), compared on the interior region the "
                "reference writes. default_vs_gt records the engine's "
                "default mode (gate + auto dilation) against ground truth.",
    }
    print(json.dumps({k: v for k, v in result.items()
                      if k != "per_instance"}))
    with open(os.path.join(args.out, "result.json"), "w") as f:
        json.dump(result, f, indent=2)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
