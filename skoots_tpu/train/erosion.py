"""Standalone random mask erosion (reference /root/reference/skoots/train/erosion.py:21-107).

A legacy augmentation knob: with probability ``rate``, erode the mask with a
k^3 min-filter. Functional JAX form, usable inside jitted pipelines.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from skoots_tpu.ops.morphology import binary_erosion


def erosion(rng: jax.Array, masks: jax.Array, kernel_targets: int = 3,
            rate: float = 0.5) -> jax.Array:
    """Randomly erode a channels-last ``[..., X, Y, Z, C]`` mask tensor."""
    if kernel_targets % 2 != 1:
        raise ValueError("Expected kernel target to be odd")
    apply = jax.random.uniform(rng) < rate
    eroded = binary_erosion(
        masks, window=(kernel_targets,) * 3
    )
    return jnp.where(apply, eroded, masks)
