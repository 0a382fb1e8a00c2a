"""Device mesh + sharding helpers.

TPU-native replacement for the reference's DDP/NCCL bootstrap
(/root/reference/skoots/train/setup.py:53-92, engine.py:110-115): instead of
one process per GPU with gradient all-reduce hooks, a single program lays a
logical mesh over all chips — axis ``data`` for batch (data-parallel; psum of
grads is inserted by XLA) and axis ``space`` for spatial sharding of big
inference volumes (XLA spatial partitioning exchanges conv halos over ICI).
Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
the same code spans DCN.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = -1,
    space: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a ('data', 'space') mesh. ``data=-1`` absorbs all remaining
    devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % space == 0, f"{n} devices not divisible by space={space}"
        data = n // space
    assert data * space == n, f"mesh {data}x{space} != {n} devices"
    arr = np.asarray(devices).reshape(data, space)
    return Mesh(arr, axis_names=("data", "space"))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard axis 0 (batch) over 'data'; replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def spatial_sharding(mesh: Mesh, ndim: int, axis: int = 1) -> NamedSharding:
    """Shard one spatial axis over 'space' (and batch over 'data' if ndim>3).

    For channels-last volumes [B, X, Y, Z, C] use axis=1: XLA spatial
    partitioning inserts halo exchanges for the convs over ICI.
    """
    spec = [None] * ndim
    spec[0] = "data"
    spec[axis] = "space"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
