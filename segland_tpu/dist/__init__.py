from .mesh import (
    make_mesh,
    make_mesh_2d,
    shard_batch,
    shard_params_tp,
    replicate,
    host_count_init,
)
