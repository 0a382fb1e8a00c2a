"""Contiguous relabeling of an instance-mask file (reference
/root/reference/skoots/utils/renumber.py:7-68; fastremap role is played by
the vectorized remap in skoots_tpu.ops.flood_fill)."""

from __future__ import annotations

import logging

import numpy as np

from skoots_tpu.ops.flood_fill import renumber
from skoots_tpu.utils.io import imread, imsave

log = logging.getLogger(__name__)


def load_renumber_save(path: str, output_path: str | None = None) -> str:
    """Load an instance mask, compact ids to 1..N, save back."""
    mask = imread(path).astype(np.int64)
    out, mapping = renumber(mask)
    dest = output_path or path
    imsave(dest, out.astype(np.int32))
    log.info("renumbered %d ids -> %s", len(mapping), dest)
    return dest
