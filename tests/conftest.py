"""Test config: run everything on a virtual 8-device CPU mesh.

This is the JAX analogue of the reference's localhost-gloo distributed smoke
tests (/root/reference/skoots/lib/mp_utils.py:116-121): multi-device semantics
without hardware.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# The axon sitecustomize pins the TPU-tunnel platform regardless of the env
# var; jax.config is the only override that sticks. Must run before any
# backend initialization.
import jax

jax.config.update("jax_platforms", "cpu")

# Persistent XLA:CPU compile cache: the fast suite is compile-bound
# (load-bearing e2e/model tests), and warm re-runs are ~2.4x faster
# (test_compat: 91 s cold -> 37 s warm). SKOOTS_COMPILE_CACHE=off to
# disable; the dir is keyed by backend so it never mixes with TPU.
from skoots_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

# One-core host, 125 GB RAM: after compile caching the next suite-wide
# overhead is CPython gen-0 GC sweeping the tracer/jaxpr churn every 700
# allocations while 20+ modules of live executables make each sweep walk a
# huge heap. Trading memory for sweeps is free here.
import gc

gc.set_threshold(200_000, 100, 100)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(101196)  # reference fixed seed (engine.py:53)
