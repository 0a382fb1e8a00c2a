from skoots_tpu.models.registry import cfg_to_model, init_model
from skoots_tpu.models.spatial_embedding import SpatialEmbedding, split_output
from skoots_tpu.models.unext import UNeXT3D, UNet3D

__all__ = [
    "cfg_to_model",
    "init_model",
    "SpatialEmbedding",
    "split_output",
    "UNeXT3D",
    "UNet3D",
]
