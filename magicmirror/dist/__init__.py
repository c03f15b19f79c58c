from .mesh import make_device_mesh, batch_sharding, replicate_sharding, shard_batch
