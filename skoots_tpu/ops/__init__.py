from skoots_tpu.ops.vec2embed import vector_to_embedding, coordinate_mesh
from skoots_tpu.ops.embed2prob import baked_embed_to_prob
from skoots_tpu.ops.morphology import (
    binary_dilation,
    binary_dilation_2d,
    binary_erosion,
    gauss_filter,
    mean_filter,
    median_filter,
)
from skoots_tpu.ops.skeleton import (
    PackedSkeletons,
    average_baked_skeletons,
    bake_skeleton,
    index_skeleton_by_embed,
    pack_skeletons,
    skeleton_to_mask,
)
from skoots_tpu.ops.flood_fill import label_components, efficient_flood_fill
from skoots_tpu.ops.cropper import crop_origins, get_total_num_crops

__all__ = [
    "vector_to_embedding",
    "coordinate_mesh",
    "baked_embed_to_prob",
    "binary_dilation",
    "binary_dilation_2d",
    "binary_erosion",
    "gauss_filter",
    "mean_filter",
    "median_filter",
    "PackedSkeletons",
    "pack_skeletons",
    "bake_skeleton",
    "average_baked_skeletons",
    "skeleton_to_mask",
    "index_skeleton_by_embed",
    "label_components",
    "efficient_flood_fill",
    "crop_origins",
    "get_total_num_crops",
]
