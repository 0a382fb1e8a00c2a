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
        # Reference parity knob: BackgroundTransformFromCfg sets
        # masks = ones_like(image) (merged_transform.py:1111), which makes
        # the semantic/embed tversky targets ALL-foreground on background
        # images. skoots-tpu defaults to 'zeros' (background supervises the
        # semantic head toward 0 — see PARITY.md); set 'ones' for byte-level
        # reference loss semantics.
        self.background_mask_mode = cfg.TRAIN.get(
            "BACKGROUND_MASK_MODE", "zeros"
        )
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
                    # Lee thinning (the reference's skeletonizer) when the
                    # native kernel is built; EDT-ridge otherwise (the
                    # python Lee fallback is too slow for on-the-fly use)
                    from skoots_tpu.native import has_native

                    method = "lee" if has_native() else "medial"
                    log.warning("no skeleton file for %s; computing %s "
                                "skeletons", base, method)
                    skeletons = calculate_skeletons(masks, method=method)
                    save_skeletons(base + ".skeletons.npz", skeletons)
                self.records.append(
                    VolumeRecord(imread(img_path).astype(np.float32), masks, skeletons, base)
                )
        if not self.records:
            raise FileNotFoundError(f"no training volumes found under {paths}")

        # Shrink the static pre-crop to the smallest member volume (never
        # below the crop itself): padding a small volume out to crop+300
        # would leave the content in a corner, and the downstream affine —
        # which rotates about the pre-crop center — would sweep it away
        # from the (instance-centered) crop2 window.
        vol_min = np.min([r.image.shape for r in self.records], axis=0)
        self.pre = tuple(
            max(c, min(p, int(v)))
            for p, c, v in zip(self.pre, self.crop, vol_min)
        )

    def __len__(self) -> int:
        return len(self.records) * self.sample_per_image

    # ------------------------------------------------------------- statistics
    def moments(self) -> Tuple[int, float, float, float]:
        """Streaming raw moments ``(n, sum, sum_sq, max)`` over all volumes
        (the numba ``_sub_sq_sum`` role, reference dataloader.py:21-35)."""
        total, total_sq, n, mx = 0.0, 0.0, 0, 0.0
        for r in self.records:
            total += float(r.image.sum())
            total_sq += float((r.image.astype(np.float64) ** 2).sum())
            n += r.image.size
            mx = max(mx, float(r.image.max()))
        return n, total, total_sq, mx

    def intensity_ceiling(self) -> float:
        """255 for 8-bit-range data, 65535 for 16-bit (reference hardcodes
        255 in both the invert stat and augment — documented deviation)."""
        _, _, _, mx = self.moments()
        return 255.0 if mx <= 255.0 else 65535.0

    def object_radius(self) -> Optional[float]:
        """Median EDT-at-GT-skeleton-points over the dataset: a scale
        estimate of the objects being segmented, stored in the checkpoint
        so inference/sparse tooling can derive data-regime knobs (suggested
        EXPERIMENTAL.DIST_THR, dilation sanity). None for background-only
        datasets."""
        if self.background:
            return None
        from skoots_tpu.infer.autoknobs import estimate_object_radius

        vals = [
            r
            for rec in self.records
            if rec.skeletons
            for r in [estimate_object_radius(rec.masks, rec.skeletons)]
            if r is not None
        ]
        return float(np.median(vals)) if vals else None

    def mean_std(self, with_invert: bool = False) -> Tuple[float, float]:
        """Dataset-wide intensity stats (reference dataloader.py:246-310,
        engine.py:188 calls with_invert=True).

        ``with_invert`` folds the inverted copy of every image into the
        statistics (the invert augmentation doubles the intensity
        distribution). The reference's own implementation has two bugs —
        only the last image's inverted sum is counted (dataloader.py:255
        indent) and the inverted copies are missing from the variance
        numerator (dataloader.py:614-623) — here both halves are exact,
        derived from the raw moments: sum(L-x)^2 = N L^2 - 2 L sum(x) +
        sum(x^2).
        """
        n, total, total_sq, mx = self.moments()
        if with_invert:
            ceil = 255.0 if mx <= 255.0 else 65535.0
            total_sq = 2 * total_sq + n * ceil**2 - 2 * ceil * total
            total = n * ceil  # sum x + sum (L - x)
            n *= 2
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
        bg_fill = int(
            self.background and self.background_mask_mode == "ones"
            and rec.masks is None
        )
        if rec.masks is not None:
            masks = rec.masks[sl]
        else:
            masks = np.full(pre, bg_fill, np.int32)

        # pad up to the static pre-crop shape (volumes smaller than pre)
        pad = [(0, p - s) for p, s in zip(self.pre, image.shape)]
        if any(p[1] for p in pad):
            image = np.pad(image, pad, mode="reflect")
            masks = np.pad(masks, pad, mode="constant",
                           constant_values=bg_fill)

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

    def intensity_ceiling(self) -> float:
        return max(d.intensity_ceiling() for d in self.datasets)

    def object_radius(self) -> Optional[float]:
        vals = [r for d in self.datasets
                for r in [d.object_radius()] if r is not None]
        return float(np.median(vals)) if vals else None

    def mean_std(self, with_invert: bool = False) -> Tuple[float, float]:
        """Combined stats over every member dataset (reference MultiDataset
        sum/numel/std, dataloader.py:580-623)."""
        n, total, total_sq, mx = 0, 0.0, 0.0, 0.0
        for d in self.datasets:
            dn, dt, dsq, dmx = d.moments()
            n += dn
            total += dt
            total_sq += dsq
            mx = max(mx, dmx)
        if with_invert:
            ceil = 255.0 if mx <= 255.0 else 65535.0
            total_sq = 2 * total_sq + n * ceil**2 - 2 * ceil * total
            total = n * ceil
            n *= 2
        mean = total / n
        std = max((total_sq / n - mean**2), 1e-8) ** 0.5
        return mean, std


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


def prefetch_iterator(epoch_iter, depth: int = 2):
    """Wrap a ``epoch_iter(epoch)`` factory so host-side batch production
    (random crop sampling + stacking) runs on a background thread up to
    ``depth`` batches ahead. The accelerator's async dispatch already
    pipelines the DEVICE work; this hides the HOST work behind it (the
    reference leans on torch DataLoader workers for the same overlap,
    engine.py:200-209)."""
    import queue
    import threading

    def wrapped(epoch: int):
        q: queue.Queue = queue.Queue(maxsize=depth)
        _END = object()

        def produce():
            try:
                for item in epoch_iter(epoch):
                    q.put(item)
                q.put(_END)
            except BaseException as e:  # surface errors on the consumer side
                q.put(e)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _END:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
        t.join(timeout=5)

    return wrapped
