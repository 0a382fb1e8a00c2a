"""Diagnose under-segmentation on a trained campaign scenario.

Runs the checkpoint's forward ONCE on the validation volume, then sweeps the
post-forward knobs (prob threshold, 3D/2D dilation counts) through the
threshold -> dilate -> CC -> embedding-walk -> assign tail, scoring each
against GT. Separates "model predicts merged skeletons" (no knob helps)
from "the dilation stack bridges adjacent skeletons" (smaller dilation
fixes it).

Usage:
  python tools/diag_assign.py runs/accuracy/touching [--cpu]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("scenario_dir")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--embed-iterations", type=int, default=10)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from skoots_tpu.models import cfg_to_model
    from skoots_tpu.ops.flood_fill import label_components
    from skoots_tpu.ops.morphology import binary_dilation, binary_dilation_2d
    from skoots_tpu.ops.vec2embed import vector_to_embedding
    from skoots_tpu.train.checkpoint import load_checkpoint
    from skoots_tpu.utils.io import imread
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from accuracy_campaign import score

    root = os.path.abspath(args.scenario_dir)
    ckpts = sorted(glob.glob(os.path.join(root, "models", "*.skoots")))
    assert ckpts, f"no checkpoint under {root}/models"
    ckpt = load_checkpoint(ckpts[-1])
    cfg, params = ckpt["cfg"], ckpt["params"]
    mean = float(ckpt.get("dataset_mean", 128.0))
    std = float(ckpt.get("dataset_std", 64.0))
    scale = tuple(cfg.SKOOTS.VECTOR_SCALING)

    img = np.asarray(imread(os.path.join(root, "val", "val.tif"))).squeeze()
    gt = np.asarray(
        imread(os.path.join(root, "val", "val.labels.tif"))
    ).squeeze()
    model = cfg_to_model(cfg)

    x = (jnp.asarray(img, jnp.float32)[None, ..., None] - mean) / std
    out = jax.jit(lambda p, t: model.apply(p, t, deterministic=True))(params, x)
    out = jax.block_until_ready(out)
    vec_raw = out[..., 0:3]
    skel_raw = out[..., 3:4]
    prob_raw = out[..., 4:5]

    dims = jnp.asarray(img.shape, jnp.int32)

    def tail(prob_thr: float, d3: int, d2: int):
        keep = (prob_raw > prob_thr).astype(out.dtype)
        vec = vec_raw * keep
        skel = skel_raw * keep
        for _ in range(d3):
            skel = binary_dilation(skel)
        for _ in range(d2):
            skel = binary_dilation_2d(skel)
        skel_bin = (skel > prob_thr)[0, ..., 0]
        labels = label_components(skel_bin.astype(jnp.int32), connectivity=26)
        # compact label ids for readability
        emb = vector_to_embedding(
            jnp.asarray(scale), vec.astype(jnp.float32),
            n=args.embed_iterations,
        )
        idx = jnp.clip(jnp.round(emb).astype(jnp.int32), 0, dims - 1)[0]
        inst = labels[idx[..., 0], idx[..., 1], idx[..., 2]]
        inst = jnp.where(keep[0, ..., 0] > 0, inst, 0)
        n_skel_cc = int(jnp.max(labels) > 0) and len(
            np.unique(np.asarray(labels))
        ) - 1
        return np.asarray(inst), n_skel_cc

    rows = []
    for prob_thr in (0.8, 0.5):
        for d3, d2 in ((1, 2), (1, 1), (1, 0), (0, 1), (0, 0)):
            inst, n_cc = tail(prob_thr, d3, d2)
            s = score(gt, inst)
            rows.append({"prob_thr": prob_thr, "dil3d": d3, "dil2d": d2,
                         "skel_cc": n_cc, **s})
            print(json.dumps(rows[-1]), flush=True)

    best = max(rows, key=lambda r: r["f1_at_iou50"])
    print("BEST:", json.dumps(best))
    return 0


if __name__ == "__main__":
    sys.exit(main())
