"""Data-contract types (reference /root/reference/skoots/lib/custom_types.py:5-16).

The reference threads a TypedDict of torch tensors through the train
pipeline; here the analogous contracts are the channels-last batch dicts
consumed by the jitted steps. Kept as TypedDicts for documentation and
static checking.
"""

from __future__ import annotations

from typing import Dict, TypedDict

import jax
import numpy as np


class DataDict(TypedDict, total=False):
    """Dense-training sample/batch dict (engine.make_train_step contract)."""

    image: jax.Array  # [B, X, Y, Z, 1] normalized
    masks: jax.Array  # [B, X, Y, Z, 1] binary foreground
    baked: jax.Array  # [B, X, Y, Z, 3] baked skeleton coords
    skele_masks: jax.Array  # [B, X, Y, Z, 1] binary skeleton stamp


class SparseDataDict(TypedDict, total=False):
    """Sparse-training batch dict (sparse_engine contract)."""

    image: jax.Array
    background: jax.Array  # [B, X, Y, Z, 1] certain-background
    skele_masks: jax.Array
    points: jax.Array  # [B, P, 3]
    valid: jax.Array  # [B, P] bool


class HostSample(TypedDict, total=False):
    """Host-side pre-crop sample (train.data -> train.transforms contract)."""

    image: np.ndarray  # [PX, PY, PZ]
    masks: np.ndarray
    points: np.ndarray  # [P, 3]
    ids: np.ndarray  # [P]
    center: np.ndarray  # [3]
