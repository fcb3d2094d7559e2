"""Device mesh + sharding helpers — the whole distributed story.

Replaces the reference's Engine/DDP/DataParallel/SyncBatchNorm/all_reduce
stack (engine.py:23-141): one 1-D 'data' mesh; batches sharded over it;
params replicated; XLA emits the gradient/batch-stat collectives over ICI.
Multi-host: call host_count_init() (jax.distributed.initialize) before
device use; the same code then spans slices over DCN transparently.
"""

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def host_count_init(coordinator: Optional[str] = None):
    """Multi-host rendezvous (replaces NCCL env:// init, engine.py:41-48)."""
    if jax.process_count() > 1 or coordinator is not None:
        jax.distributed.initialize(coordinator_address=coordinator)


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Optional[Mesh]:
    """1-D 'data' mesh; returns None for a single device (no sharding needed —
    and jit over 1-device NamedSharding inputs hangs on the axon tunnel
    backend, so single-chip paths must stay mesh-free)."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    if len(devices) <= 1:
        return None
    return Mesh(np.array(devices), ("data",))


def shard_batch(mesh: Optional[Mesh], batch):
    """Shard leading (batch) dim of every array in the pytree over 'data'."""
    if mesh is None:
        return batch
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Optional[Mesh], tree):
    """Fully replicate a pytree (params/opt state) over the mesh."""
    if mesh is None:
        return tree
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
