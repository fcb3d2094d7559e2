"""Real 2-process jax.distributed execution (VERDICT r3 next-round item 8).

The reference's engine actually runs multi-node via init_method='env://'
(reference engine.py:41-48); this repo's analog — host_count_init /
jax.distributed.initialize + a global mesh + the Loader's process sharding +
the checkpoint addressability fence — was previously unit-tested and fenced
but never EXECUTED with process_count > 1.  This test launches two real
subprocesses (2 virtual CPU devices each -> a 4-device global 'data' mesh)
and asserts, per step:

  * both processes agree on loss / grad-norm / post-step param checksum
    (replicated update consistency across hosts),
  * the result matches a single-process run of the SAME global batches over
    a local 4-device mesh (the process boundary changes nothing numerically),
  * process 0 saved a full checkpoint of the replicated multi-process state
    (the round-4 fence bug: is_fully_addressable is False for ANY
    multi-process sharding, so ckpt/io.py must special-case
    is_fully_replicated — reference rank-0 save, train_base.py:286-292),
  * BOTH ranks restored that checkpoint and took a second matching step,
  * the _to_host fence still fired on a cross-process-sharded array,
  * the sharded Evaluator's predictions over the 2-process mesh agree with
    the single-process sharded Evaluator.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_reference():
    """Same model/seed/batches, no mesh, in-process (conftest pinned cpu).
    Runs BOTH steps (the workers checkpoint-restore between them) and the
    Evaluator on the same deterministic eval batch."""
    import jax
    import jax.numpy as jnp

    from segland_tpu.models import build_model
    from segland_tpu.train import (create_optimizer, create_train_state,
                                   make_base_train_step)
    from segland_tpu.evallib.infer import Evaluator

    from segland_tpu.dist import make_mesh, replicate, shard_batch

    model = build_model("pspnet_pop", backbone="resnet10", n_base=7)
    img0 = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img0, train=True)
    tx = create_optimizer(variables["params"], 1e-3, num_epochs=1,
                          steps_per_epoch=1)
    state = create_train_state(model, variables, tx)

    # local 4-device mesh (conftest forces 8 virtual CPU devices): shapes and
    # reduction structure then match the 2-process run exactly (batch 1 per
    # device), so the whole chain — train steps, restore, eval — is
    # shape-identical and only the process boundary differs
    mesh = make_mesh(4)
    state = replicate(mesh, state)

    rng = np.random.RandomState(0)
    batches = [(rng.rand(4, 32, 32, 3).astype(np.float32),
                rng.randint(0, 8, (4, 32, 32)).astype(np.int32))
               for _ in range(2)]
    step = jax.jit(make_base_train_step(model))

    def checksum_params(s):
        flat = jax.tree_util.tree_leaves(s.params)
        return float(sum(float(jnp.sum(jnp.abs(x.astype(jnp.float32))))
                         for x in flat))

    out = {}
    for n, (img, mask) in enumerate(batches, 1):
        img, mask = shard_batch(mesh, (jnp.asarray(img), jnp.asarray(mask)))
        state, loss_dict, grad_norm = step(state, img, mask)
        suffix = "" if n == 1 else str(n)
        out["loss" + suffix] = float(loss_dict["total_loss"])
        out["grad_norm" + suffix] = float(grad_norm)
        out["checksum" + suffix] = checksum_params(state)

    # per-device computation is shape-identical (batch 1/device) to the
    # 2-process run, so predictions must match BITWISE.  (An unsharded
    # batch-4 forward differs in fusion/reduction order and can flip argmax
    # near-ties — measured one row out of four.)
    ev = Evaluator(model, {"params": state.params,
                           "batch_stats": state.batch_stats},
                   num_classes=8, n_base=7, mesh=mesh)
    e_img = np.random.RandomState(7).rand(4, 32, 32, 3).astype(np.float32)
    _, pred = ev.predict_batch(e_img, (32, 32), want_logits=False)
    out["pred"] = np.asarray(pred)
    return out


def test_two_process_distributed_step(tmp_path):
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    outs = [str(tmp_path / f"out{i}.json") for i in range(2)]

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "mp_worker.py"),
             coordinator, "2", str(i), outs[i]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        logs.append(out.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i]}"

    results = [json.load(open(o)) for o in outs]
    r0, r1 = sorted(results, key=lambda r: r["proc"])

    # replicated update consistency across processes — both steps (the second
    # runs from a state both ranks restored from the rank-0 checkpoint)
    for key in ("loss", "grad_norm", "checksum", "loss2", "grad_norm2",
                "checksum2"):
        assert np.isclose(r0[key], r1[key], rtol=1e-6), (key, r0, r1)

    # process sharding + ckpt round trip are numerically transparent vs a
    # single-process 2-step run of the same global batches
    ref = _single_process_reference()
    # grad_norm2 sees step-1's cross-device reduction-order noise amplified
    # through the update (measured ~1e-3 relative on CPU) — hence the looser
    # second-step bar
    for key, rtol in (("loss", 1e-4), ("grad_norm", 1e-3), ("checksum", 1e-5),
                      ("loss2", 1e-4), ("grad_norm2", 5e-3),
                      ("checksum2", 1e-5)):
        assert np.isclose(r0[key], ref[key], rtol=rtol, atol=1e-5), (
            f"2-process {key} {r0[key]} != single-process {ref[key]}")

    # checkpoint semantics (rank 0): replicated save OK, sharded fenced
    assert r0.get("ckpt_saved") is True
    assert r0.get("fence_fired") is True
    assert os.path.exists(str(tmp_path / "shared.ckpt"))

    # sharded Evaluator: predictions (reassembled from each rank's local
    # shards) agree with the single-process sharded Evaluator at >= 99.9% of
    # pixels.  Not bitwise: the cross-process all-reduce in the train steps
    # orders its sum differently than the in-process one, leaving ~1e-6 param
    # noise that can flip argmax near-ties (measured: a handful of pixels).
    import base64

    mp_rows = {**r0["pred_rows"], **r1["pred_rows"]}
    shape = tuple(r0["pred_shape"])
    mp_pred = np.stack([
        np.frombuffer(base64.b64decode(mp_rows[str(i)]), np.uint8).reshape(shape)
        for i in range(len(mp_rows))])
    agree = float(np.mean(mp_pred == ref["pred"]))
    assert agree >= 0.999, f"sharded-eval pixel agreement {agree}"
