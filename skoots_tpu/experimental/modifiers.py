"""Sparse-annotation ablation knobs (reference
/root/reference/skoots/experimental/modifiers.py:9-63): study how much
certain-background supervision sparse training actually needs.
"""

from __future__ import annotations

import logging

import numpy as np
from scipy import ndimage

log = logging.getLogger(__name__)


def erode_bg_masks(background: np.ndarray, n_erode: float) -> np.ndarray:
    """Erode a binary background volume ``[X, Y, Z]`` n times (3^3 kernel)."""
    if n_erode == 0:
        return background
    log.info("eroding background masks n_erode=%s", n_erode)
    out = background > 0
    for _ in range(int(n_erode)):
        out = ndimage.binary_erosion(out, structure=np.ones((3, 3, 3)))
    return out.astype(background.dtype)


def ablate_bg_masks(background: np.ndarray, alpha: float) -> np.ndarray:
    """Zero background slices beyond round(Z * alpha) (reference :38-63)."""
    assert 0 < alpha <= 1, f"alpha must be in (0, 1], not {alpha}"
    z = background.shape[-1]
    out = background.copy()
    keep = int(z * alpha)
    out[..., keep:] = 0
    return out
