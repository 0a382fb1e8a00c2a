"""Persistent XLA compilation cache.

The chunked inference pipeline jits one program per (volume shape, crop,
overlap) tuple; on TPU those compiles cost minutes (reference analogue: the
~1500-step torch.compile warmup, /root/reference/skoots/lib/eval.py:121-124).
Enabling JAX's persistent cache makes every CLI/bench invocation after the
first pay ~nothing for repeated shapes.

Set ``SKOOTS_COMPILE_CACHE=off`` to disable, or point it at a directory.
"""

from __future__ import annotations

import logging
import os

_log = logging.getLogger(__name__)
_DEFAULT = os.path.join(
    os.path.expanduser("~"), ".cache", "skoots_tpu", "xla_cache"
)


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Turn on the persistent compilation cache. Returns the cache dir
    (None when disabled via SKOOTS_COMPILE_CACHE=off)."""
    env = os.environ.get("SKOOTS_COMPILE_CACHE", "")
    if env.lower() in ("off", "0", "none", "disable"):
        return None
    path = path or env or _DEFAULT
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything: tiny entries and fast compiles included
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:  # noqa: BLE001 - cache is best-effort
        _log.warning("compilation cache unavailable: %s", e)
        return None
    return path
