"""Trained-model accuracy gate for the fused-Pallas serving path.

VERDICT r3 item 5: the flagship throughput number (bench.py: convnext_pop +
fused_mlp Pallas kernels + fused upsample+argmax epilogue) was covered by
CPU exactness tests and a random-init argmax identity only — nothing
measured fused-vs-XLA mIoU delta on a TRAINED model end-to-end.  This
mirrors the int8 gate (test_fewshot_learns.py): train the flagship family
on the learnable color task through the real train_base CLI, then evaluate
through the real Evaluator twice —

  * plain arm: fused_mlp=False, XLA resize+argmax postprocess
  * fused arm: fused_mlp=True + fused_epilogue=True with the Pallas kernels
    routed through the interpreter (SEGLAND_PALLAS_INTERPRET=1, exactly the
    path the driver dryrun certifies on CPU)

and assert |dmIoU| <= 0.002 (the BASELINE.json +-0.2pp bar) with >= 99%
per-pixel argmax agreement.  Reference protocol anchor: eval_base.py:193-199.
"""

import os

import numpy as np
import pytest

from synthtask import build_task

pytestmark = pytest.mark.slow

COMMON = ["--model", "convnext_pop", "--backbone", "convnext-t",
          "--num-workers", "0", "--norm-stats", "train"]


@pytest.fixture(scope="module")
def task_root(tmp_path_factory):
    return build_task(tmp_path_factory.mktemp("oem_fused_gate"))


@pytest.fixture(scope="module")
def trained_convnext(task_root, tmp_path_factory):
    """train_base CLI on the color task until clearly non-degenerate (the
    gate needs trained, task-fitted weights — not a high absolute score)."""
    from segland_tpu.cli.train_base import main

    snap = str(tmp_path_factory.mktemp("snap_convnext"))
    best = main(
        ["--data-dir", str(task_root),
         "--train-list", str(task_root / "list" / "train.txt"),
         "--val-list", str(task_root / "list" / "val_base.txt"),
         "--snapshot-dir", snap, "--input-size", "32,32", "--batch-size", "4",
         "--num-epoch", "60", "--learning-rate", "1e-3", "--val-start", "0",
         "--val-frequency", "15", "--snapshot-frequency", "60"] + COMMON
    )
    return snap, best


def _run_evaluator(task_root, model, variables, *, fused):
    import jax.numpy as jnp  # noqa: F401  (jax must be initialized on cpu)

    from segland_tpu.evallib import Evaluator
    from segland_tpu.data import OEMValDataset, Loader

    ev = Evaluator(model, variables, num_classes=8, n_base=7,
                   fused_epilogue=fused)
    valset = OEMValDataset(str(task_root),
                           str(task_root / "list" / "val_base.txt"),
                           base_size=(64, 64), stats="train")
    cm, (base, _novel, total, _iou), _ = ev.run(Loader(valset, 2, shuffle=False),
                                                logger=None)
    preds = []
    for img, _mask, _ids in Loader(valset, 2, shuffle=False):
        _, pred = ev.predict_batch(np.asarray(img, np.float32), (64, 64),
                                   want_logits=False)
        preds.append(np.asarray(pred))
    return (base, total), np.concatenate(preds, 0)


def test_convnext_training_nondegenerate(trained_convnext):
    _, best = trained_convnext
    assert best >= 0.30, (
        f"convnext base training degenerate (val mIoU {best}); the fused "
        f"gate would be comparing constant predictions")


def test_fused_accuracy_gate_on_trained_model(task_root, trained_convnext):
    import jax
    import jax.numpy as jnp

    from segland_tpu.models import build_model
    from segland_tpu.ckpt import load_params

    snap, _ = trained_convnext
    img0 = jnp.zeros((1, 64, 64, 3), jnp.float32)

    def load(fused_mlp):
        model = build_model("convnext_pop", backbone="convnext-t", n_base=7,
                            fused_mlp=fused_mlp)
        variables = model.init(jax.random.PRNGKey(0), img0, train=False)
        variables = load_params(os.path.join(snap, "best.ckpt"),
                                jax.tree_util.tree_map(np.asarray, variables))
        return model, variables

    model_x, vars_x = load(fused_mlp=False)
    (b_x, t_x), pred_x = _run_evaluator(task_root, model_x, vars_x, fused=False)

    os.environ["SEGLAND_PALLAS_INTERPRET"] = "1"
    try:
        model_f, vars_f = load(fused_mlp=True)
        (b_f, t_f), pred_f = _run_evaluator(task_root, model_f, vars_f,
                                            fused=True)
    finally:
        os.environ.pop("SEGLAND_PALLAS_INTERPRET", None)

    agree = float(np.mean(pred_x == pred_f))
    d_total, d_base = abs(t_x - t_f), abs(b_x - b_f)
    print(f"fused gate: total mIoU xla {t_x:.4f} fused {t_f:.4f} "
          f"(d={d_total:.5f}), agreement {agree:.5f}")
    assert agree >= 0.99, f"fused argmax agreement {agree:.4f} < 99%"
    assert d_total <= 0.002 and d_base <= 0.002, (
        f"fused mIoU delta above the +-0.2pp bar: total {d_total:.5f} "
        f"base {d_base:.5f}")
