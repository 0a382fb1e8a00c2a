"""Multi-host bootstrap.

Replaces the reference's process-group setup
(/root/reference/skoots/train/setup.py:53-99 and its near-duplicate
skoots/lib/mp_utils.py:56-95): no per-GPU process spawn, no NCCL rendezvous —
one ``jax.distributed.initialize`` per host and the ('data','space') mesh
spans ICI within a slice and DCN across hosts. The reference's FileStore
rank-KV (engine.py:262-268) maps to a host-0 broadcast.
"""

from __future__ import annotations

import logging
import socket
from typing import Optional

import jax
import numpy as np

log = logging.getLogger(__name__)


def find_free_port() -> int:
    """(reference setup.py:42-50)"""
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.bind(("", 0))
        s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        return s.getsockname()[1]


def setup_process(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize multi-host JAX. On single-host (or TPU pods with metadata
    discovery) all arguments may stay None. Returns this process's index."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError) as e:
        log.info("jax.distributed not initialized (%s); single-process mode", e)
        return 0
    log.info(
        "distributed: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )
    return jax.process_index()


def cleanup() -> None:
    """(reference setup.py:95-99)"""
    try:
        jax.distributed.shutdown()
    except Exception:  # pragma: no cover - not initialized
        pass


def broadcast_from_host0(value: np.ndarray) -> np.ndarray:
    """Share a small host value from process 0 to all (FileStore role,
    reference engine.py:262-268)."""
    from jax.experimental import multihost_utils

    return np.asarray(
        multihost_utils.broadcast_one_to_all(np.asarray(value))
    )
