from skoots_tpu.parallel.mesh import make_mesh, batch_sharding, replicated, spatial_sharding

__all__ = ["make_mesh", "batch_sharding", "replicated", "spatial_sharding"]
