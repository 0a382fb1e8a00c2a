"""Datasets + batch assembly for training.

Re-design of /root/reference/skoots/train/dataloader.py. The reference keeps
whole volumes GPU-resident and augments inside ``__getitem__``; here the host
side only does cheap numpy slicing (the skeleton-centered pre-crop,
merged_transform.py:465-513) and ships fixed-shape sample dicts; ALL
augmentation runs jitted on device (skoots_tpu.train.transforms).

File contract per volume (reference dataloader.py:96-114):
    <name>.tif              image
    <name>.labels.tif       instance masks
    <name>.skeletons.npz    GT skeletons ({id: [M,3]}; .trch also readable)
If the skeleton file is missing it is generated on the fly
(skoots --skeletonize-train-data equivalent).
"""

from __future__ import annotations

import glob
import logging
import os
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from skoots_tpu.config import CfgNode
from skoots_tpu.train.generate_skeletons import (
    calculate_skeletons,
    load_skeletons,
    save_skeletons,
)
from skoots_tpu.utils.io import imread

log = logging.getLogger(__name__)


class VolumeRecord:
    def __init__(self, image: np.ndarray, masks: Optional[np.ndarray],
                 skeletons: Dict[int, np.ndarray], name: str = ""):
        self.image = image
        self.masks = masks
        self.skeletons = {k: v for k, v in skeletons.items() if k != -1}
        self.name = name


def _find_skeletons(base: str) -> Optional[str]:
    for ext in (".skeletons.npz", ".skeletons.trch"):
        if os.path.exists(base + ext):
            return base + ext
    return None


class SkootsDataset:
    """Instance-labeled training volumes with per-image sampling multiplicity
    (reference dataset :41-310)."""

    def __init__(
        self,
        paths: Sequence[str] | str,
        cfg: CfgNode,
        sample_per_image: int = 1,
        background: bool = False,
    ):
        paths = [paths] if isinstance(paths, str) else list(paths)
        A = cfg.AUGMENTATION
        self.crop = (A.CROP_WIDTH, A.CROP_HEIGHT, A.CROP_DEPTH)
        # pre-crop = crop + reference's 300-voxel margin in XY (:465-472)
        self.pre = (self.crop[0] + 300, self.crop[1] + 300, self.crop[2])
        self.max_points = cfg.TRAIN.MAX_SKELETON_POINTS
        self.sample_per_image = sample_per_image
        self.background = background
        self.records: List[VolumeRecord] = []

        for p in paths:
            label_files = sorted(glob.glob(os.path.join(p, "*.labels.tif")))
            if background:
                # background dirs hold plain images with no instances
                img_files = [
                    f for f in sorted(glob.glob(os.path.join(p, "*.tif")))
                    if ".labels." not in f
                ]
                for f in img_files:
                    self.records.append(
                        VolumeRecord(imread(f).astype(np.float32), None, {}, f)
                    )
                continue
            for f in label_files:
                base = f[: -len(".labels.tif")]
                img_path = base + ".tif"
                if not os.path.exists(img_path):
                    raise FileNotFoundError(f"no image for {f}: expected {img_path}")
                masks = imread(f).astype(np.int32)
                skel_path = _find_skeletons(base)
                if skel_path:
                    skeletons = load_skeletons(skel_path)
                else:
                    log.warning("no skeleton file for %s; computing medial axes", base)
                    skeletons = calculate_skeletons(masks)
                    save_skeletons(base + ".skeletons.npz", skeletons)
                self.records.append(
                    VolumeRecord(imread(img_path).astype(np.float32), masks, skeletons, base)
                )
        if not self.records:
            raise FileNotFoundError(f"no training volumes found under {paths}")

    def __len__(self) -> int:
        return len(self.records) * self.sample_per_image

    # ------------------------------------------------------------- statistics
    def mean_std(self) -> Tuple[float, float]:
        """Dataset-wide intensity stats (reference dataloader.py:246-310)."""
        total, total_sq, n = 0.0, 0.0, 0
        for r in self.records:
            total += float(r.image.sum())
            total_sq += float((r.image.astype(np.float64) ** 2).sum())
            n += r.image.size
        mean = total / n
        std = max((total_sq / n - mean**2), 1e-8) ** 0.5
        return mean, std

    # -------------------------------------------------------------- sampling
    def sample(self, rng: np.random.Generator) -> Dict[str, np.ndarray]:
        """Draw one fixed-shape host sample (see transforms module contract)."""
        rec = self.records[rng.integers(len(self.records))]
        vol_shape = rec.image.shape
        pre = tuple(min(p, s) for p, s in zip(self.pre, vol_shape))

        if self.background or not rec.skeletons:
            center_abs = np.array(
                [rng.integers(0, max(s - 1, 1)) for s in vol_shape], np.float64
            )
        else:
            key = list(rec.skeletons.keys())[rng.integers(len(rec.skeletons))]
            center_abs = rec.skeletons[key].mean(axis=0)

        origin = np.clip(
            np.round(center_abs - np.asarray(pre) / 2).astype(np.int64),
            0,
            np.asarray(vol_shape) - np.asarray(pre),
        )
        sl = tuple(slice(o, o + p) for o, p in zip(origin, pre))
        image = rec.image[sl]
        masks = (
            rec.masks[sl] if rec.masks is not None else np.zeros(pre, np.int32)
        )

        # pad up to the static pre-crop shape (volumes smaller than pre)
        pad = [(0, p - s) for p, s in zip(self.pre, image.shape)]
        if any(p[1] for p in pad):
            image = np.pad(image, pad, mode="reflect")
            masks = np.pad(masks, pad, mode="constant")

        # pack + offset skeleton points into pre-crop coordinates
        pts = np.zeros((self.max_points, 3), np.float32)
        ids = np.zeros((self.max_points,), np.int32)
        if rec.skeletons:
            all_pts, all_ids = [], []
            for k, v in rec.skeletons.items():
                all_pts.append(v - origin[None, :])
                all_ids.append(np.full(len(v), k, np.int32))
            all_pts = np.concatenate(all_pts)
            all_ids = np.concatenate(all_ids)
            # keep points near the pre-crop (their instances may extend out)
            inside = np.all(
                (all_pts > -50) & (all_pts < np.asarray(self.pre) + 50), axis=1
            )
            all_pts, all_ids = all_pts[inside], all_ids[inside]
            if len(all_pts) > self.max_points:
                # uniform thinning preserves every instance roughly equally
                sel = rng.choice(len(all_pts), self.max_points, replace=False)
                all_pts, all_ids = all_pts[sel], all_ids[sel]
            pts[: len(all_pts)] = all_pts
            ids[: len(all_ids)] = all_ids

        center_rel = (center_abs - origin).astype(np.float32)
        return {
            "image": image.astype(np.float32),
            "masks": masks.astype(np.int32),
            "points": pts,
            "ids": ids,
            "center": center_rel,
        }


class MultiDataset:
    """Concatenation with per-source sampling weights (reference
    dataloader.py:500-623)."""

    def __init__(self, datasets: Sequence[SkootsDataset]):
        self.datasets = [d for d in datasets if d is not None and len(d)]
        assert self.datasets, "MultiDataset needs at least one non-empty dataset"
        self.weights = np.asarray([len(d) for d in self.datasets], np.float64)
        self.weights /= self.weights.sum()

    def __len__(self) -> int:
        return int(sum(len(d) for d in self.datasets))

    def sample(self, rng: np.random.Generator) -> Dict[str, np.ndarray]:
        i = rng.choice(len(self.datasets), p=self.weights)
        return self.datasets[i].sample(rng)


def batch_iterator(
    dataset,
    batch_size: int,
    steps_per_epoch: int,
    seed: int,
) -> Iterator[Dict[str, np.ndarray]]:
    """Yield stacked host batches (the skeleton_colate role,
    reference dataloader.py:627-649)."""

    def epoch_iter(epoch: int):
        rng = np.random.default_rng(seed + epoch * 7919)
        for _ in range(steps_per_epoch):
            samples = [dataset.sample(rng) for _ in range(batch_size)]
            yield {
                k: np.stack([s[k] for s in samples]) for k in samples[0]
            }

    return epoch_iter
