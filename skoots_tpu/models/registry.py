"""cfg -> model factory (reference ``cfg_to_bism_model``, lib/utils.py:17-107)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from skoots_tpu.config import CfgNode
from skoots_tpu.models.spatial_embedding import SpatialEmbedding
from skoots_tpu.models.unext import UNeXT3D, UNet3D

_ARCHITECTURES = {
    "bism_unext": UNeXT3D,
    "unext": UNeXT3D,
    "bism_unet": UNet3D,
    "unet": UNet3D,
}

_DTYPES = {
    "bfloat16": jnp.bfloat16,
    "float32": jnp.float32,
    "float16": jnp.float16,
}


def cfg_to_model(cfg: CfgNode) -> SpatialEmbedding:
    """Build the SpatialEmbedding(UNeXT3D) flax module described by cfg.MODEL."""
    arch = cfg.MODEL.ARCHITECTURE
    if arch not in _ARCHITECTURES:
        raise RuntimeError(
            f"{arch!r} is not a valid architecture; valid: {list(_ARCHITECTURES)}"
        )
    dtype = _DTYPES[cfg.MODEL.get("DTYPE", "bfloat16")]
    backbone = _ARCHITECTURES[arch](
        in_channels=cfg.MODEL.IN_CHANNELS,
        out_channels=cfg.MODEL.OUT_CHANNELS,
        dims=tuple(cfg.MODEL.DIMS),
        depths=tuple(cfg.MODEL.DEPTHS),
        kernel_size=cfg.MODEL.KERNEL_SIZE,
        drop_path_rate=cfg.MODEL.DROP_PATH_RATE,
        layer_scale_init_value=cfg.MODEL.LAYER_SCALE_INIT_VALUE,
        activation=cfg.MODEL.ACTIVATION,
        dtype=dtype,
        dwconv_impl=cfg.MODEL.get("DWCONV_IMPL", "auto"),
    )
    return SpatialEmbedding(backbone=backbone, dtype=dtype)


def init_model(cfg: CfgNode, rng: jax.Array, spatial=(64, 64, 16)):
    """Initialize parameters with a tiny dummy batch. Returns (model, params)."""
    model = cfg_to_model(cfg)
    dummy = jnp.zeros((1, *spatial, cfg.MODEL.IN_CHANNELS), jnp.float32)
    params = model.init({"params": rng}, dummy, deterministic=True)
    return model, params
