"""Spatial embedding -> Gaussian probability against a baked skeleton.

Re-design of /root/reference/skoots/lib/embedding_to_prob.py:5-51 with
channels-last layout. Computes, per voxel,

    phi(E, S) = exp( sum_k (E_k - S_k)^2 / (-2 sigma_k^2) )

entirely element-wise; fuses into surrounding ops under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def baked_embed_to_prob(
    embedding: jax.Array,
    baked_skeletons: jax.Array,
    sigma: jax.Array | tuple,
    eps: float = 1e-16,
) -> jax.Array:
    """Gaussian probability that each embedded voxel lies on its baked skeleton.

    Args:
        embedding: ``[B, *spatial, D]`` spatial embeddings.
        baked_skeletons: ``[B, *spatial, D]`` closest-skeleton-point coordinates.
        sigma: per-axis bandwidth, shape ``(D,)``.
        eps: numerical stability when sigma -> 0.

    Returns:
        ``[B, *spatial, 1]`` probabilities in (0, 1].
    """
    sigma = jnp.asarray(sigma, dtype=jnp.float32) + eps
    denom = sigma * sigma * -2.0  # (D,) — broadcasting on the trailing axis
    diff = embedding.astype(jnp.float32) - baked_skeletons.astype(jnp.float32)
    return jnp.exp(jnp.sum(diff * diff / denom, axis=-1, keepdims=True))
