"""TensorBoard image panels (reference /root/reference/skoots/train/utils.py:120-211).

Renders a mid-depth slice grid per epoch: image / mask / overlay / optical-
flow rendering of the vector field / embedding probability / predicted +
GT skeleton maps. torchvision's ``flow_to_image`` is re-implemented as an
HSV wheel (hue = direction, saturation = magnitude) in numpy.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def flow_to_image(flow_xy: np.ndarray) -> np.ndarray:
    """[H, W, 2] flow -> [H, W, 3] uint8 color wheel."""
    import matplotlib.colors as mcolors

    fx, fy = flow_xy[..., 0], flow_xy[..., 1]
    mag = np.sqrt(fx * fx + fy * fy)
    ang = (np.arctan2(fy, fx) + np.pi) / (2 * np.pi)  # 0..1
    mmax = mag.max() if mag.max() > 0 else 1.0
    hsv = np.stack([ang, np.clip(mag / mmax, 0, 1), np.ones_like(ang)], -1)
    return (mcolors.hsv_to_rgb(hsv) * 255).astype(np.uint8)


def mask_overlay(mask: np.ndarray, prob: np.ndarray) -> np.ndarray:
    """[H, W] binary mask + [H, W] probability -> [H, W, 3] overlay
    (reference train/utils.py:120-139)."""
    base = np.stack([prob, prob, prob], -1)
    base[..., 0] = np.where(mask > 0.5, 0.7 * mask + 0.3 * prob, base[..., 0])
    return np.clip(base, 0, 1)


def _norm(x: np.ndarray) -> np.ndarray:
    lo, hi = float(x.min()), float(x.max())
    return (x - lo) / (hi - lo) if hi > lo else np.zeros_like(x)


def write_progress(
    writer,
    tag: str,
    epoch: int,
    images: np.ndarray,  # [B, X, Y, Z, 1]
    masks: np.ndarray,  # [B, X, Y, Z, 1]
    vector: np.ndarray,  # [B, X, Y, Z, 3]
    embed_prob: np.ndarray,  # [B, X, Y, Z, 1]
    predicted_skeleton: Optional[np.ndarray] = None,
    gt_skeleton: Optional[np.ndarray] = None,
    z: Optional[int] = None,
) -> None:
    """Stack panels vertically and log one image (reference write_progress)."""
    z = z if z is not None else images.shape[3] // 2
    img = _norm(np.asarray(images[0, :, :, z, 0], np.float32))
    panels = [np.stack([img] * 3, -1)]
    m = np.asarray(masks[0, :, :, z, 0] > 0.5, np.float32)
    panels.append(np.stack([m] * 3, -1))
    panels.append(mask_overlay(m, _norm(np.asarray(embed_prob[0, :, :, z, 0], np.float32))))
    panels.append(
        flow_to_image(np.asarray(vector[0, :, :, z, 0:2], np.float32)) / 255.0
    )
    p = _norm(np.asarray(embed_prob[0, :, :, z, 0], np.float32))
    panels.append(np.stack([p] * 3, -1))
    if predicted_skeleton is not None:
        s = _norm(np.asarray(predicted_skeleton[0, :, :, z, 0], np.float32))
        panels.append(np.stack([s] * 3, -1))
    if gt_skeleton is not None:
        s = np.asarray(gt_skeleton[0, :, :, z, 0] > 0.5, np.float32)
        panels.append(np.stack([s] * 3, -1))

    grid = np.concatenate(panels, axis=0)  # stack vertically
    if writer is not None:
        writer.add_image(tag, (grid * 255).astype(np.uint8), epoch, dataformats="HWC")
    return grid
