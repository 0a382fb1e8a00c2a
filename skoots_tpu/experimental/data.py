"""Sparse-annotation dataset.

File contract (reference /root/reference/skoots/experimental/sparse_dataloader.py:33-41):
    <name>.tif                image
    <name>.background.tif     certain-background mask (1 = definitely bg)
    <name>.skeleton_mask.tif  dense skeleton stamp (optional; generated from
                              points if absent)
    <name>.skeletons.npz      skeleton point annotations
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Sequence

import numpy as np

from skoots_tpu.config import CfgNode
from skoots_tpu.train.generate_skeletons import load_skeletons
from skoots_tpu.utils.io import imread


class SparseRecord:
    def __init__(self, image, background, skel_mask, skeletons, name=""):
        self.image = image
        self.background = background
        self.skel_mask = skel_mask
        self.skeletons = skeletons
        self.name = name


class SparseDataset:
    def __init__(self, paths: Sequence[str] | str, cfg: CfgNode,
                 sample_per_image: int = 1):
        paths = [paths] if isinstance(paths, str) else list(paths)
        A = cfg.AUGMENTATION
        self.crop = (A.CROP_WIDTH, A.CROP_HEIGHT, A.CROP_DEPTH)
        self.pre = (self.crop[0] + 300, self.crop[1] + 300, self.crop[2])
        self.max_points = cfg.TRAIN.MAX_SKELETON_POINTS
        self.sample_per_image = sample_per_image
        self.records: List[SparseRecord] = []
        for p in paths:
            bg_files = sorted(glob.glob(os.path.join(p, "*.background.tif")))
            for f in bg_files:
                base = f[: -len(".background.tif")]
                image = imread(base + ".tif").astype(np.float32)
                background = (imread(f) > 0).astype(np.float32)
                # ablation-study knobs (reference sparse_engine.py:164-181)
                if cfg.EXPERIMENTAL.BACKGROUND_N_ERODE:
                    from skoots_tpu.experimental.modifiers import erode_bg_masks

                    background = erode_bg_masks(
                        background, cfg.EXPERIMENTAL.BACKGROUND_N_ERODE
                    )
                if cfg.EXPERIMENTAL.BACKGROUND_SLICE_PERCENTAGE < 1.0:
                    from skoots_tpu.experimental.modifiers import ablate_bg_masks

                    background = ablate_bg_masks(
                        background, cfg.EXPERIMENTAL.BACKGROUND_SLICE_PERCENTAGE
                    )
                sk_path = base + ".skeleton_mask.tif"
                skel_mask = (
                    (imread(sk_path) > 0).astype(np.float32)
                    if os.path.exists(sk_path)
                    else None
                )
                skel_file = None
                for ext in (".skeletons.npz", ".skeletons.trch"):
                    if os.path.exists(base + ext):
                        skel_file = base + ext
                        break
                skeletons = load_skeletons(skel_file) if skel_file else {}
                if skel_mask is None:
                    from skoots_tpu.ops.skeleton import skeleton_to_mask

                    skel_mask = np.asarray(
                        skeleton_to_mask(
                            skeletons, image.shape,
                            radius=cfg.TRAIN.SKELETON_MASK_RADIUS,
                            flank_radius=cfg.TRAIN.SKELETON_MASK_FLANK_RADIUS,
                        )
                    )
                self.records.append(
                    SparseRecord(image, background, skel_mask, skeletons, base)
                )
        if not self.records:
            raise FileNotFoundError(f"no *.background.tif sparse volumes under {paths}")

    def __len__(self) -> int:
        return len(self.records) * self.sample_per_image

    def sample(self, rng: np.random.Generator) -> Dict[str, np.ndarray]:
        rec = self.records[rng.integers(len(self.records))]
        vol_shape = rec.image.shape
        pre = tuple(min(p, s) for p, s in zip(self.pre, vol_shape))

        if rec.skeletons:
            key = list(rec.skeletons.keys())[rng.integers(len(rec.skeletons))]
            center_abs = rec.skeletons[key].mean(axis=0)
        else:
            center_abs = np.asarray([rng.integers(0, max(s - 1, 1)) for s in vol_shape], np.float64)

        origin = np.clip(
            np.round(center_abs - np.asarray(pre) / 2).astype(np.int64),
            0, np.asarray(vol_shape) - np.asarray(pre),
        )
        sl = tuple(slice(o, o + p) for o, p in zip(origin, pre))
        image = rec.image[sl]
        background = rec.background[sl]
        skel_mask = rec.skel_mask[sl]
        pad = [(0, p - s) for p, s in zip(self.pre, image.shape)]
        if any(p[1] for p in pad):
            image = np.pad(image, pad, mode="reflect")
            background = np.pad(background, pad, mode="constant", constant_values=1.0)
            skel_mask = np.pad(skel_mask, pad, mode="constant")

        pts = np.zeros((self.max_points, 3), np.float32)
        ids = np.zeros((self.max_points,), np.int32)
        if rec.skeletons:
            all_pts = np.concatenate(
                [v - origin[None, :] for v in rec.skeletons.values()]
            )
            all_ids = np.concatenate(
                [np.full(len(v), k, np.int32) for k, v in rec.skeletons.items()]
            )
            inside = np.all(
                (all_pts > -50) & (all_pts < np.asarray(self.pre) + 50), axis=1
            )
            all_pts, all_ids = all_pts[inside], all_ids[inside]
            if len(all_pts) > self.max_points:
                sel = rng.choice(len(all_pts), self.max_points, replace=False)
                all_pts, all_ids = all_pts[sel], all_ids[sel]
            pts[: len(all_pts)] = all_pts
            ids[: len(all_ids)] = all_ids

        return {
            "image": image.astype(np.float32),
            # thread background through the mask slot of the shared augment
            "masks": background.astype(np.int32),
            "aux": skel_mask.astype(np.float32),
            "points": pts,
            "ids": ids,
            "center": (center_abs - origin).astype(np.float32),
        }
