"""Accuracy campaign: convergence proofs on progressively harder phantoms.

Round-2 verdict item 5: the single easy-tube proof is not robustness
evidence. This campaign trains and scores the full pipeline on:

  separated  5 well-separated tubes (the round-2 baseline scenario)
  touching   tubes whose surfaces touch (but centerlines stay apart) —
             instance separation must come from the embedding flow, not from
             empty space
  aniso      anisotropic 192x192x32 stack with 20+ thin tubes
  blobs      compact mito-like blobs (degenerate-skeleton regime)
  sparse     weakly-supervised training (skeletons + certain-background
             only, reference sparse_engine role) on the separated phantom
  perslice   2D per-slice mode (2D embedding walk + cross-z stitching,
             reference flood_and_stitch role) scored on the aniso scenario

Bars (recorded in BASELINE.md): dense scenarios F1@IoU0.5 >= 0.8,
sparse >= 0.7, perslice >= 0.6 (2D stitching is inherently weaker on
z-elongated objects).

Usage:
  python tools/accuracy_campaign.py                 # all scenarios
  python tools/accuracy_campaign.py --scenario touching [--epochs N] [--cpu]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCENARIOS = ("separated", "touching", "aniso", "blobs", "sparse", "perslice")

BARS = {"separated": 0.8, "touching": 0.8, "aniso": 0.8, "blobs": 0.8,
        "sparse": 0.7, "perslice": 0.6}

# Round-3 per-scenario dilation stacks (hand-derived from each phantom's
# skeleton spacing; see BASELINE.md campaign knobs). Round 4 replaced them
# with the engine's AUTO mode (infer/autoknobs.py measures skeleton spacing
# on probe tiles and derives the stack) — the campaign's default is now to
# pass NO knobs at all, proving auto mode reproduces every hand stack.
# --manual-knobs restores the round-3 dict for A/B comparison.
MANUAL_KNOBS = {
    "touching": {"dilation_3d": 0, "dilation_2d": 1},
    "aniso": {"dilation_3d": 0, "dilation_2d": 1},
    # blobs sit ~4 voxels apart: the default 2x2D dilation bridges one
    # skeleton pair (17 CC); (1,1) keeps 18 of the model's 18 separable
    # skeletons (the 19th is merged at the model level — no knob helps)
    "blobs": {"dilation_3d": 1, "dilation_2d": 1},
}
INFER_KNOBS: dict = {}  # set in main(): {} (auto) or MANUAL_KNOBS


def _phantom(scenario: str, seed: int):
    """Scenario phantom; CAMPAIGN_REALISM=0 restores the clean round-4
    generator (uniform intensities + white noise). Default applies the
    EM-realism stack (texture, illumination gradient, membrane distractors,
    anisotropic PSF — utils.synthetic.apply_em_realism, VERDICT r4 item 6)
    to the IMAGE only; labels/skeletons stay exact."""
    img, labels, skels = _phantom_clean(scenario, seed)
    if os.environ.get("CAMPAIGN_REALISM", "1") != "0":
        from skoots_tpu.utils.synthetic import apply_em_realism

        img = apply_em_realism(img, labels, seed=seed + 7)
    return img, labels, skels


def _phantom_clean(scenario: str, seed: int):
    from skoots_tpu.utils.synthetic import make_blobs, make_tubes

    if scenario == "separated":
        return make_tubes(shape=(128, 128, 32), n_tubes=5, radius=5,
                          seed=seed, min_separation=16.0)
    if scenario == "sparse":
        # Depth 96 (3x the crop depth) so the contiguous background-slice
        # ablation (reference modifiers.py:38-63 semantics) cannot be
        # defeated positionally: with depth == crop depth, every crop sees
        # the same absolute z and the net learns "no bg penalty near the
        # far face" from padding distance — measured attempt-3 failure:
        # FP fraction 0.09-0.12 on exactly the ablated z>=24 band, F1 0.25.
        # The reference regime (volumes >> crops, random z offsets) never
        # exposes absolute z; depth 96 restores that property.
        return make_tubes(shape=(128, 128, 96), n_tubes=5, radius=5,
                          seed=seed, min_separation=16.0)
    if scenario == "touching":
        # radius 5 -> surfaces touch at centerline distance ~10-11
        return make_tubes(shape=(128, 128, 32), n_tubes=6, radius=5,
                          seed=seed, min_separation=11.0)
    if scenario in ("aniso", "perslice"):
        return make_tubes(shape=(192, 192, 32), n_tubes=24, radius=4,
                          seed=seed, min_separation=10.0)
    if scenario == "blobs":
        return make_blobs(shape=(128, 128, 32), n_blobs=20, seed=seed,
                          min_separation=4.0)
    raise ValueError(scenario)


def build_dataset(root: str, scenario: str, n_train: int = 3):
    from skoots_tpu.ops.skeleton import skeleton_to_mask
    from skoots_tpu.train.generate_skeletons import save_skeletons
    from skoots_tpu.utils.io import imsave

    train_dir = os.path.join(root, "train")
    val_dir = os.path.join(root, "val")
    os.makedirs(train_dir, exist_ok=True)
    os.makedirs(val_dir, exist_ok=True)
    for i in range(n_train):
        img, labels, skels = _phantom(scenario, seed=100 + i)
        base = os.path.join(train_dir, f"vol{i}")
        imsave(base + ".tif", img)
        if scenario == "sparse":
            # weak annotations only: skeleton points + certain background
            # + the dense skeleton stamp. "Certain background" is exact
            # where given (that is what makes it certain); sparsity is
            # partial coverage — the cfg ablates it to 75% of z-slices
            # (the reference's own ablation protocol,
            # sparse_engine.py:164-181). A systematic 3-voxel margin (the
            # round-3 first attempt) trains the embedding to own the
            # margin ring — measured fat-mask failure: radius 8 vs true 5,
            # mean IoU 0.25 (BASELINE.md).
            bg = labels == 0
            imsave(base + ".background.tif", bg.astype(np.uint8))
            sk_mask = np.asarray(
                skeleton_to_mask(skels, labels.shape, radius=3,
                                 flank_radius=1)
            )
            imsave(base + ".skeleton_mask.tif", sk_mask.astype(np.uint8))
        else:
            imsave(base + ".labels.tif", labels)
        save_skeletons(base + ".skeletons.npz", skels)
    img, labels, _ = _phantom(scenario, seed=999)
    imsave(os.path.join(val_dir, "val.tif"), img)
    imsave(os.path.join(val_dir, "val.labels.tif"), labels)
    return train_dir, val_dir


def write_cfg(path: str, train_dir: str, save_dir: str, epochs: int,
              scenario: str) -> dict:
    big = scenario in ("aniso", "perslice")
    cfg = {
        "MODEL": {
            "DIMS": [16, 32, 64, 32, 16],
            "DEPTHS": [1, 1, 1, 1, 1],
            "KERNEL_SIZE": 7,
            "OUT_CHANNELS": 16,
        },
        "TRAIN": {
            "TRAIN_DATA_DIR": [train_dir],
            "TRAIN_SAMPLE_PER_IMAGE": [8],
            "TRAIN_STORE_DATA_ON_GPU": [True],
            "NUM_EPOCHS": epochs,
            "LEARNING_RATE": 1e-3,
            "SAVE_INTERVAL": max(epochs // 2, 1),
            "SAVE_PATH": save_dir,
            "MAX_SKELETON_POINTS": 256,
            "VALIDATE_EPOCH_SKIP": epochs + 1,
            "LOSS_SKELETON_START_EPOCH": -1,
            "INITIAL_SIGMA": [8.0, 8.0, 4.0],
            "SIGMA_DECAY": [
                [0.66, int(epochs * 0.3)],
                [0.66, int(epochs * 0.6)],
                [0.5, int(epochs * 0.85)],
            ],
            "SKELETON_MASK_RADIUS": 3,
            "SCHEDULER_T0": epochs + 1,
        },
        "AUGMENTATION": {
            "CROP_WIDTH": 96,
            "CROP_HEIGHT": 96,
            "CROP_DEPTH": 32,
            "INVERT_RATE": 0.0,  # single polarity (see tools/convergence.py)
        },
        "SKOOTS": {"VECTOR_SCALING": [12, 12, 6]},
    }
    if scenario == "sparse":
        # DIST_THR matched to the tube radius (5): the embedding is pushed
        # to a skeleton only inside the object, everything beyond the
        # certain-background boundary pushes away. Background certain on
        # 75% of z-slices (coverage sparsity, reference ablation knob).
        cfg["EXPERIMENTAL"] = {
            "IS_SPARSE": True,
            "DIST_THR": 5.0,
            "BACKGROUND_SLICE_PERCENTAGE": 0.75,
        }
        # In sparse mode the semantic head's dice target is
        # `embed_prob > 0.2`, whose spatial radius is set by sigma — so the
        # semantic mask can only be as tight as sigma at the epochs that
        # dominate the (SWA-averaged) checkpoint. The reference schedule
        # (config.py:87-93) finishes all sigma decay within the first ~15%
        # of its 10k epochs; attempt 2 decayed at 30/60/85% of 100 epochs,
        # so SWA (start 75%) averaged across the regime change and the
        # measured mask kept a half-saturated d in [5,7) ring (prob p50
        # 0.85; threshold-invariant, precision 0.23-0.35 at any thr).
        # Front-load the decay so >=55% of training (and every SWA epoch)
        # runs at the final tight sigma.
        cfg["TRAIN"]["SIGMA_DECAY"] = [
            [0.66, int(epochs * 0.15)],
            [0.66, int(epochs * 0.30)],
            [0.5, int(epochs * 0.45)],
        ]
        # the phantom is isotropic; the (1,1,3) default would 3x-weight z
        # distances and starve z supervision of the DIST_THR ball
        cfg["AUGMENTATION"]["BAKE_SKELETON_ANISOTROPY"] = [1.0, 1.0, 1.0]
        cfg["TRAIN"]["LEARNING_RATE"] = 5e-4
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return cfg


def score(gt: np.ndarray, pred: np.ndarray) -> dict:
    from skoots_tpu.validate.metrics import accuracies_from_iou, mask_iou

    iou = mask_iou(gt, pred)
    n_gt, n_pred = iou.shape
    best = iou.max(axis=1) if iou.size else np.zeros(n_gt)
    tp, fp, fn = accuracies_from_iou(iou, 0.5)
    f1 = 2 * tp / max(2 * tp + fp + fn, 1)
    return {
        "f1_at_iou50": round(float(f1), 4),
        "mean_iou": round(float(best.mean()) if best.size else 0.0, 4),
        "tp": int(tp), "fp": int(fp), "fn": int(fn),
        "gt_instances": int(n_gt), "pred_instances": int(n_pred),
    }


def run_scenario(scenario: str, outdir: str, epochs: int,
                 steps_per_epoch: int, aniso_ckpt: str | None = None,
                 rescore: bool = False) -> dict:
    root = os.path.abspath(os.path.join(outdir, scenario))
    os.makedirs(root, exist_ok=True)
    save_dir = os.path.join(root, "models")
    os.makedirs(save_dir, exist_ok=True)

    from skoots_tpu.utils.io import imread

    t_start = time.time()
    if scenario == "perslice":
        # reuse the aniso checkpoint; score the 2D per-slice mode against
        # the aniso validation volume
        assert aniso_ckpt, "perslice needs the aniso scenario's checkpoint"
        _, val_dir = build_dataset(root, scenario, n_train=0)
        val_img = os.path.join(val_dir, "val.tif")
        from skoots_tpu.infer import run_inference
        from skoots_tpu.infer.perslice import perslice_segment
        from skoots_tpu.train.checkpoint import load_checkpoint

        # phase 1 once through the engine (persists vec/skel/semantic),
        # with the aniso scenario's dilation regime — the default stack
        # bridges the crowded tubes' skeletons and the per-slice CC then
        # merges them (measured: 7 GT tubes collapsed into one 2D instance,
        # F1 0.743; scenario knobs restore per-tube separation)
        run_inference(val_img, aniso_ckpt, crop_size=(192, 192, 32),
                      overlap=(0, 0, 0), assign_crop_size=(192, 192, 32),
                      assign_overlap=(0, 0, 0), embed_iterations=1,
                      **INFER_KNOBS.get("aniso", {}))
        stem = os.path.splitext(val_img)[0]
        vectors = np.load(stem + "_skoots_vectors.npy", mmap_mode="r")
        skeleton = np.load(stem + "_skoots_skeleton.npy", mmap_mode="r")
        semantic = np.load(stem + "_skoots_semantic.npy", mmap_mode="r")
        scale = tuple(load_checkpoint(aniso_ckpt)["cfg"].SKOOTS.VECTOR_SCALING)
        pred = perslice_segment(vectors, skeleton, semantic, scale,
                                embed_iterations=10)
        gt = np.asarray(imread(os.path.join(val_dir, "val.labels.tif"))).squeeze()
        result = {"scenario": scenario, **score(gt, np.asarray(pred).squeeze()),
                  "checkpoint": aniso_ckpt}
    else:
        ckpts = sorted(glob.glob(os.path.join(save_dir, "*.skoots")))
        if rescore and ckpts:
            val_dir = os.path.join(root, "val")
            ckpt = ckpts[-1]
        else:
            train_dir, val_dir = build_dataset(root, scenario)
            cfg_path = os.path.join(root, "cfg.yaml")
            write_cfg(cfg_path, train_dir, save_dir, epochs, scenario)

            from skoots_tpu.train.cli import main as train_main

            rc = train_main([
                "--config-file", cfg_path,
                "--steps-per-epoch", str(steps_per_epoch),
                "--log", "2",
            ])
            if rc != 0:
                return {"scenario": scenario, "ok": False, "stage": "train",
                        "rc": rc}
            ckpts = sorted(glob.glob(os.path.join(save_dir, "*.skoots")))
            assert ckpts, "no checkpoint written"
            ckpt = ckpts[-1]

        from skoots_tpu.infer import run_inference

        val_img = os.path.join(val_dir, "val.tif")
        shape = _phantom(scenario, 999)[0].shape
        # cached phase-1 buffers store the post-dilation skeleton map, so a
        # scenario with non-default dilation knobs must re-run the forward
        mask = run_inference(
            val_img, ckpt,
            use_cached_data=rescore and scenario not in INFER_KNOBS and bool(
                glob.glob(os.path.splitext(val_img)[0] + "_skoots_vectors.npy")),
            crop_size=(*shape[:2], 32), overlap=(0, 0, 0),
            assign_crop_size=(*shape[:2], 32), assign_overlap=(0, 0, 0),
            embed_iterations=10,
            **INFER_KNOBS.get(scenario, {}),
        )
        gt = np.asarray(imread(os.path.join(val_dir, "val.labels.tif"))).squeeze()
        result = {"scenario": scenario,
                  **score(gt, np.asarray(mask).squeeze()),
                  "checkpoint": ckpt}

    result["ok"] = bool(result.get("f1_at_iou50", 0) >= BARS[scenario])
    result["bar"] = BARS[scenario]
    if not result["ok"] and scenario != "perslice":
        # self-explaining failure: semantic head precision/recall against GT
        # foreground from the persisted phase-1 buffer (separates "semantic
        # mask is fat/thin" from "assignment merged/split instances")
        try:
            stem = os.path.splitext(os.path.join(
                os.path.join(root, "val"), "val.tif"))[0]
            sem = np.load(stem + "_skoots_semantic.npy", mmap_mode="r")
            gt_fg = np.asarray(
                imread(os.path.join(root, "val", "val.labels.tif"))
            ).squeeze() > 0
            pred_fg = np.asarray(sem).squeeze() > 0.5
            tp_v = float((pred_fg & gt_fg).sum())
            result["diag_semantic"] = {
                "precision": round(tp_v / max(pred_fg.sum(), 1), 4),
                "recall": round(tp_v / max(gt_fg.sum(), 1), 4),
                "pred_fg_frac": round(float(pred_fg.mean()), 4),
                "gt_fg_frac": round(float(gt_fg.mean()), 4),
            }
        except Exception as e:  # diagnostics must never fail the campaign
            result["diag_semantic"] = {"error": repr(e)}
    result["wall_s"] = round(time.time() - t_start, 1)
    with open(os.path.join(root, "result.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result), flush=True)
    return result


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenario", choices=SCENARIOS + ("all",), default="all")
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--steps-per-epoch", type=int, default=10)
    ap.add_argument("--outdir", default="runs/accuracy")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--rescore", action="store_true",
                    help="reuse an existing trained checkpoint (and cached "
                         "phase-1 buffers) and only re-run the post-forward "
                         "tail + scoring")
    ap.add_argument("--manual-knobs", action="store_true",
                    help="use the round-3 hand-derived per-scenario dilation "
                         "stacks instead of the engine's auto mode")
    args = ap.parse_args()

    if args.manual_knobs:
        INFER_KNOBS.update(MANUAL_KNOBS)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from skoots_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    todo = list(SCENARIOS) if args.scenario == "all" else [args.scenario]
    results = []
    aniso_ckpt = None
    for s in todo:
        if s == "perslice" and aniso_ckpt is None:
            prior = os.path.join(args.outdir, "aniso", "result.json")
            if os.path.exists(prior):
                aniso_ckpt = json.load(open(prior)).get("checkpoint")
            if not aniso_ckpt:
                print("perslice: no aniso checkpoint available, skipping")
                continue
        r = run_scenario(s, args.outdir, args.epochs, args.steps_per_epoch,
                         aniso_ckpt, rescore=args.rescore)
        results.append(r)
        if s == "aniso" and r.get("checkpoint"):
            aniso_ckpt = r["checkpoint"]

    # aggregate from disk so partial/rescore runs fold into prior results
    results = []
    for s in SCENARIOS:
        p = os.path.join(args.outdir, s, "result.json")
        if os.path.exists(p):
            results.append(json.load(open(p)))
    summary = {"ok": all(r.get("ok") for r in results) and bool(results),
               "results": results}
    os.makedirs(args.outdir, exist_ok=True)
    with open(os.path.join(args.outdir, "campaign.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({"campaign_ok": summary["ok"],
                      "scenarios": {r["scenario"]: r.get("f1_at_iou50")
                                    for r in results}}))
    return 0 if summary["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
