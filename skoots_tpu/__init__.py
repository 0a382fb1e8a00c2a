"""skoots-tpu: TPU-native skeleton-guided 3D instance segmentation.

A ground-up JAX/XLA/Pallas re-design with the capabilities of SKOOTS
(SKeletOn ObjecT Segmentation — buswinka/skoots): 2D/3D instance segmentation
of biomedical volumes via an embedding vector field, a skeleton probability
map, and a semantic map predicted by a ConvNeXt-style 3D UNet.
"""

__version__ = "0.1.0"
