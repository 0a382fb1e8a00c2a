"""SpatialEmbedding head: backbone features -> 5-channel SKOOTS output.

Re-implementation of the reference's un-vendored
``bism.models.spatial_embedding.SpatialEmbedding`` wrapper (used at
/root/reference/skoots/lib/utils.py:104-106). The 5 output channels are
consumed by slicing everywhere in the reference — vectors = out[:, 0:3]
(tanh, in [-1, 1]), skeleton = out[:, [-2]] (sigmoid probability), semantic
= out[:, [-1]] (sigmoid probability) — see engine.py:461-463, eval.py:145-150.

Channels-last here: ``out[..., 0:3]`` vectors, ``out[..., 3]`` skeleton,
``out[..., 4]`` semantic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class SpatialEmbedding(nn.Module):
    """Wraps a backbone with three 1^3-conv heads -> concat to 5 channels."""

    backbone: nn.Module
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        feat = self.backbone(x, deterministic=deterministic)
        vec = nn.Conv(3, (1, 1, 1), dtype=self.dtype, name="vector_head")(feat)
        skel = nn.Conv(1, (1, 1, 1), dtype=self.dtype, name="skeleton_head")(feat)
        sem = nn.Conv(1, (1, 1, 1), dtype=self.dtype, name="semantic_head")(feat)
        out = jnp.concatenate(
            [jnp.tanh(vec), nn.sigmoid(skel), nn.sigmoid(sem)], axis=-1
        )
        # heads return float32: thresholding (prob > 0.8) and the embedding
        # math downstream want full precision regardless of backbone dtype
        return out.astype(jnp.float32)


def split_output(out: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(vectors [...,3], skeleton_prob [...,1], semantic_prob [...,1]) —
    the channels-last analogue of the reference slicing engine.py:461-463."""
    return out[..., 0:3], out[..., 3:4], out[..., 4:5]
