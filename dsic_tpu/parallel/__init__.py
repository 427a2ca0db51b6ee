from dsic_tpu.parallel.mesh import (
    make_mesh, batch_sharding, replicated, shard_batch, mesh_from_config)

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch",
           "mesh_from_config"]
