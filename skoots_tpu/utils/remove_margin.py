"""Crop the evaluation margin from a volume file (reference
/root/reference/skoots/utils/remove_margin.py:7-72): the reference's eval
never writes the outermost overlap band ([50, 50, 5]), so downstream
comparisons crop it. skoots-tpu inference covers the full volume (reflect
padding), but the tool is kept for parity with reference outputs."""

from __future__ import annotations

from typing import Tuple

import numpy as np

from skoots_tpu.utils.io import imread, imsave


def remove_margin(
    path: str,
    margin: Tuple[int, int, int] = (50, 50, 5),
    output_path: str | None = None,
) -> str:
    vol = imread(path)
    mx, my, mz = margin
    assert all(2 * m < s for m, s in zip(margin, vol.shape)), (
        f"margin {margin} too large for volume {vol.shape}"
    )
    sl = tuple(slice(m, -m if m else None) for m in margin)
    dest = output_path or path.replace(".tif", "_cropped.tif")
    imsave(dest, np.ascontiguousarray(vol[sl]))
    return dest
