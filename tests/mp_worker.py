"""Worker for tests/test_multiprocess.py — one process of a 2-process
jax.distributed CPU run (the engine.py:41-48 'env://' analog).

Launched as:  python mp_worker.py <coordinator> <num_procs> <proc_id> <out.json>

Each process owns 2 virtual CPU devices (XLA_FLAGS set by the parent), joins
the rendezvous, builds the GLOBAL 4-device 'data' mesh, assembles its local
shard of a deterministic global batch via
jax.make_array_from_process_local_data, runs ONE sharded base train step,
and reports loss / grad-norm / a post-step param checksum.  Process 0
additionally exercises checkpoint semantics: save_checkpoint on the
replicated state must succeed; the addressability fence (ckpt/io.py:_to_host)
must refuse a cross-process-sharded array.
"""

import json
import sys

import numpy as np


def main():
    coordinator, num_procs, proc_id, out_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_procs, process_id=proc_id)
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    assert len(devs) == 2 * num_procs, f"expected {2*num_procs} global devices, got {len(devs)}"
    assert len(jax.local_devices()) == 2
    mesh = Mesh(np.array(devs), ("data",))

    from segland_tpu.models import build_model
    from segland_tpu.train import (create_optimizer, create_train_state,
                                   make_base_train_step)
    from segland_tpu.data.loader import Loader

    model = build_model("pspnet_pop", backbone="resnet10", n_base=7)
    img0 = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img0, train=True)
    tx = create_optimizer(variables["params"], 1e-3, num_epochs=1,
                          steps_per_epoch=1)
    state = create_train_state(model, variables, tx)

    # replicate: every process holds the identical full value (same PRNGKey)
    rep = NamedSharding(mesh, P())
    state = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(rep, np.asarray(x)),
        state)

    # deterministic global batch; each process loads ITS contiguous shard via
    # the Loader's DistributedSampler analog, then assembles the global array
    rng = np.random.RandomState(0)
    g_img = rng.rand(4, 32, 32, 3).astype(np.float32)
    g_mask = rng.randint(0, 8, (4, 32, 32)).astype(np.int32)

    class _Memset:
        def __init__(self, img, mask):
            self.img, self.mask = img, mask

        def __len__(self):
            return len(self.img)

        def __getitem__(self, i):
            return self.img[i], self.mask[i]

    loader = Loader(_Memset(g_img, g_mask), 4, shuffle=False,
                    process_index=proc_id, process_count=num_procs)
    l_img, l_mask = next(iter(loader))
    shd = NamedSharding(mesh, P("data"))
    img = jax.make_array_from_process_local_data(shd, np.asarray(l_img))
    mask = jax.make_array_from_process_local_data(
        shd, np.asarray(l_mask).astype(np.int32))
    assert img.shape == (4, 32, 32, 3), img.shape

    step = jax.jit(make_base_train_step(model))
    state, loss_dict, grad_norm = step(state, img, mask)

    # post-step params are replicated -> fully addressable; checksum them
    flat = jax.tree_util.tree_leaves(state.params)
    checksum = float(sum(float(jnp.sum(jnp.abs(x.astype(jnp.float32)))) for x in flat))

    result = {
        "proc": proc_id,
        "loss": float(loss_dict["total_loss"]),
        "grad_norm": float(grad_norm),
        "checksum": checksum,
    }

    if proc_id == 0:
        import tempfile

        from segland_tpu.ckpt.io import save_checkpoint, _to_host

        ckpt_path = out_path + ".ckpt"
        save_checkpoint(ckpt_path, state)  # replicated state: must succeed
        result["ckpt_saved"] = True
        try:
            _to_host({"x": img})  # cross-process-sharded: fence must fire
            result["fence_fired"] = False
        except NotImplementedError:
            result["fence_fired"] = True

    with open(out_path, "w") as f:
        json.dump(result, f)
    print("worker", proc_id, "ok", result, flush=True)


if __name__ == "__main__":
    main()
