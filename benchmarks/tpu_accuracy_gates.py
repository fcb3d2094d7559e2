"""Round-5 on-chip (Mosaic, not interpreter) trained-model accuracy gates
(VERDICT r4 item 5).

The slow-suite gates (tests/test_fused_gate.py, test_fewshot_learns.py int8)
run the Pallas kernels through the INTERPRETER — that validates the kernel's
math, not Mosaic's lowering of it, and this repo's history has
shape-dependent silent lowering bugs (the wblk=1 region-indexing bug,
BASELINE.md round 2).  This script runs the same trained-synthetic-model
comparison on the real chip:

  convnext_pop: fused Pallas arm (fused_mlp + fused epilogue, Mosaic)
                vs XLA arm  — |dmIoU| <= 0.002, argmax agreement >= 99%
  pspnet_pop:   int8 PTQ arm vs bf16 arm — same bars

Training runs in-process on the chip (tiny task, dispatch-bound).  Results
go to stdout; exit code 1 on gate failure.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/tpu_accuracy_gates.py
"""
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax
import jax.numpy as jnp

_cache = os.path.expanduser("~/.cache/segland_tpu/jax")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def train(task_root, model_name, backbone, snap, epochs=60):
    from segland_tpu.cli.train_base import main

    return main(
        ["--data-dir", str(task_root),
         "--train-list", str(task_root / "list" / "train.txt"),
         "--val-list", str(task_root / "list" / "val_base.txt"),
         "--snapshot-dir", snap, "--input-size", "32,32", "--batch-size", "4",
         "--num-epoch", str(epochs), "--learning-rate", "1e-3",
         "--val-start", "0", "--val-frequency", "20",
         "--snapshot-frequency", str(epochs),
         "--model", model_name, "--backbone", backbone,
         "--num-workers", "0", "--norm-stats", "train"])


def run_eval(task_root, model, variables, *, fused_epilogue, int8=False):
    from segland_tpu.data import Loader, OEMValDataset
    from segland_tpu.evallib import Evaluator

    ev = Evaluator(model, variables, num_classes=8, n_base=7,
                   fused_epilogue=fused_epilogue, int8=int8)
    valset = OEMValDataset(str(task_root),
                           str(task_root / "list" / "val_base.txt"),
                           base_size=(64, 64), stats="train")
    _, (base, _n, total, _iou), _ = ev.run(Loader(valset, 2, shuffle=False),
                                           logger=None)
    preds = []
    for img, _mask, _ids in Loader(valset, 2, shuffle=False):
        _, pred = ev.predict_batch(np.asarray(img, np.float32), (64, 64),
                                   want_logits=False)
        preds.append(np.asarray(pred))
    return (base, total), np.concatenate(preds, 0)


def load_trained(snap, model_name, backbone, **model_kw):
    from segland_tpu.ckpt import load_params
    from segland_tpu.models import build_model

    model = build_model(model_name, backbone=backbone, n_base=7, **model_kw)
    img0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), img0)
    variables = load_params(os.path.join(snap, "best.ckpt"),
                            jax.tree_util.tree_map(np.asarray, variables))
    return model, variables


def gate(name, a, b, pred_a, pred_b):
    agree = float(np.mean(pred_a == pred_b))
    d_base, d_total = abs(a[0] - b[0]), abs(a[1] - b[1])
    ok = agree >= 0.99 and d_total <= 0.002 and d_base <= 0.002
    print(f"GATE {name}: arm-A base/total {a[0]:.4f}/{a[1]:.4f} | "
          f"arm-B {b[0]:.4f}/{b[1]:.4f} | d_total {d_total:.5f} | "
          f"agreement {agree:.5f} -> {'PASS' if ok else 'FAIL'}", flush=True)
    return ok


def main():
    from pathlib import Path

    from synthtask import build_task

    print(f"devices: {jax.devices()}", flush=True)
    assert jax.default_backend() == "tpu", "this gate must run on the chip"
    root = Path(tempfile.mkdtemp(prefix="tpu_gate_"))
    task_root = build_task(root)
    ok = True

    # ---- convnext fused (Mosaic) gate -----------------------------------
    snap = tempfile.mkdtemp(prefix="tpu_gate_convnext_")
    best = train(task_root, "convnext_pop", "convnext-t", snap)
    print(f"convnext trained: val mIoU {best:.3f}", flush=True)
    model_x, vars_x = load_trained(snap, "convnext_pop", "convnext-t",
                                   fused_mlp=False)
    ax, px = run_eval(task_root, model_x, vars_x, fused_epilogue=False)
    model_f, vars_f = load_trained(snap, "convnext_pop", "convnext-t",
                                   fused_mlp=True, fused_attn=True)
    af, pf = run_eval(task_root, model_f, vars_f, fused_epilogue=True)
    ok &= gate("convnext fused-Mosaic vs XLA", ax, af, px, pf)

    # ---- pspnet int8 gate ------------------------------------------------
    snap = tempfile.mkdtemp(prefix="tpu_gate_pspnet_")
    best = train(task_root, "pspnet_pop", "resnet10", snap, epochs=80)
    print(f"pspnet trained: val mIoU {best:.3f}", flush=True)
    model_p, vars_p = load_trained(snap, "pspnet_pop", "resnet10")
    ap, pp = run_eval(task_root, model_p, vars_p, fused_epilogue=False)
    aq, pq = run_eval(task_root, model_p, vars_p, fused_epilogue=False,
                      int8=True)
    ok &= gate("pspnet int8 vs bf16", ap, aq, pp, pq)

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
