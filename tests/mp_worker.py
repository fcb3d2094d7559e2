"""Worker for tests/test_multiprocess.py — one process of a 2-process
jax.distributed CPU run (the engine.py:41-48 'env://' analog).

Launched as:  python mp_worker.py <coordinator> <num_procs> <proc_id> <out.json>

Each process owns 2 virtual CPU devices (XLA_FLAGS set by the parent), joins
the rendezvous, builds the GLOBAL 4-device 'data' mesh, assembles its local
shard of a deterministic global batch via
jax.make_array_from_process_local_data, and exercises the full multi-host DP
story end to end:

  step 1  -> process 0 saves the replicated checkpoint (reference rank-0
             torch.save, train_base.py:286-292; the ckpt/io.py fence must
             let a fully-replicated multi-process state through),
  restore -> BOTH ranks restore the checkpoint, re-replicate it over the
             global mesh, and take a second matching step,
  fence   -> _to_host must still refuse a genuinely cross-process-sharded
             array (partial-save protection),
  eval    -> the Evaluator predicts a deterministic batch over the global
             mesh; each rank reports a digest of its local prediction rows
             so the parent can compare against a single-process run.
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
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    assert len(devs) == 2 * num_procs, f"expected {2*num_procs} global devices, got {len(devs)}"
    assert len(jax.local_devices()) == 2
    mesh = Mesh(np.array(devs), ("data",))

    from segland_tpu.models import build_model
    from segland_tpu.train import (create_optimizer, create_train_state,
                                   make_base_train_step)
    from segland_tpu.data.loader import Loader
    from segland_tpu.ckpt.io import load_checkpoint, save_checkpoint, _to_host

    model = build_model("pspnet_pop", backbone="resnet10", n_base=7)
    img0 = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img0, train=True)
    tx = create_optimizer(variables["params"], 1e-3, num_epochs=1,
                          steps_per_epoch=1)
    state = create_train_state(model, variables, tx)

    rep = NamedSharding(mesh, P())

    def replicate_state(s):
        # every process holds the identical full value (same PRNGKey / ckpt)
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(rep, np.asarray(x)),
            s)

    state = replicate_state(state)

    # deterministic global batches; each process loads ITS contiguous shard
    # via the Loader's DistributedSampler analog, then assembles the global
    # array (two batches: one per train step)
    rng = np.random.RandomState(0)
    batches = [(rng.rand(4, 32, 32, 3).astype(np.float32),
                rng.randint(0, 8, (4, 32, 32)).astype(np.int32))
               for _ in range(2)]

    class _Memset:
        def __init__(self, img, mask):
            self.img, self.mask = img, mask

        def __len__(self):
            return len(self.img)

        def __getitem__(self, i):
            return self.img[i], self.mask[i]

    shd = NamedSharding(mesh, P("data"))

    def global_batch(g_img, g_mask):
        loader = Loader(_Memset(g_img, g_mask), 4, shuffle=False,
                        process_index=proc_id, process_count=num_procs)
        l_img, l_mask = next(iter(loader))
        img = jax.make_array_from_process_local_data(shd, np.asarray(l_img))
        mask = jax.make_array_from_process_local_data(
            shd, np.asarray(l_mask).astype(np.int32))
        return img, mask

    img, mask = global_batch(*batches[0])
    assert img.shape == (4, 32, 32, 3), img.shape

    step = jax.jit(make_base_train_step(model))
    state, loss_dict, grad_norm = step(state, img, mask)

    def checksum_params(s):
        flat = jax.tree_util.tree_leaves(s.params)
        return float(sum(float(jnp.sum(jnp.abs(x.astype(jnp.float32))))
                         for x in flat))

    result = {
        "proc": proc_id,
        "loss": float(loss_dict["total_loss"]),
        "grad_norm": float(grad_norm),
        "checksum": checksum_params(state),
    }

    # ---- checkpoint: rank-0 save of the replicated multi-process state ----
    import os

    ckpt_path = os.path.join(os.path.dirname(os.path.abspath(out_path)),
                             "shared.ckpt")
    if proc_id == 0:
        save_checkpoint(ckpt_path, state)  # replicated state: must succeed
        result["ckpt_saved"] = True
        try:
            _to_host({"x": img})  # cross-process-sharded: fence must fire
            result["fence_fired"] = False
        except NotImplementedError:
            result["fence_fired"] = True
    multihost_utils.sync_global_devices("segland-mp-ckpt-saved")

    # ---- restore on BOTH ranks + one more matching step ------------------
    host_template = _to_host(state)  # replicated: gathers via the fixed fence
    restored, _extra = load_checkpoint(ckpt_path, host_template)
    restored = replicate_state(restored)
    assert np.isclose(checksum_params(restored), result["checksum"],
                      rtol=1e-6), "restore changed params"
    img2, mask2 = global_batch(*batches[1])
    state2, loss2, gnorm2 = step(restored, img2, mask2)
    result["loss2"] = float(loss2["total_loss"])
    result["grad_norm2"] = float(gnorm2)
    result["checksum2"] = checksum_params(state2)

    # ---- sharded Evaluator: predictions must match single-process --------
    from segland_tpu.evallib.infer import Evaluator

    ev = Evaluator(model, {"params": state2.params,
                           "batch_stats": state2.batch_stats},
                   num_classes=8, n_base=7, mesh=mesh)
    e_img = np.random.RandomState(7).rand(4, 32, 32, 3).astype(np.float32)
    staged = (jax.make_array_from_process_local_data(
        shd, e_img[proc_id * 2:(proc_id + 1) * 2]), 4)
    _, pred = ev.predict_batch(staged, (32, 32), want_logits=False)
    import base64

    rows = {}
    for shard in pred.addressable_shards:
        start = shard.index[0].start or 0
        data = np.asarray(shard.data)
        for j in range(data.shape[0]):
            rows[str(start + j)] = base64.b64encode(
                data[j].tobytes()).decode()
    result["pred_rows"] = rows
    result["pred_shape"] = list(pred.shape[1:])

    with open(out_path, "w") as f:
        json.dump(result, f)
    print("worker", proc_id, "ok", result, flush=True)


if __name__ == "__main__":
    main()
