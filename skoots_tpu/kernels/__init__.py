from skoots_tpu.kernels.bake import bake_skeleton_pallas

__all__ = ["bake_skeleton_pallas"]
