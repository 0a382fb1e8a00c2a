from skoots_tpu.utils.io import imread, imsave

__all__ = ["imread", "imsave"]
