from .mesh import make_mesh, shard_batch, replicate, host_count_init
