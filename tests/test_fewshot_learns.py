"""The few-shot pipeline LEARNS, end-to-end, on a learnable synthetic task.

This is the strongest parity evidence available without the OEM dataset
(VERDICT r2 item 1): a color-segmentation task with distinct per-class
textures is run through the REAL CLIs — train_base -> ft_pop -> eval_ft —
and the test asserts that

  * base training reaches a high base mIoU,
  * the grafted ft model BEFORE fine-tuning scores ~0 novel mIoU,
  * after ft_pop the novel mIoU rises to a meaningful floor while the base
    mIoU is retained (the reference's contest-winning workflow,
    ft_pop.py:133-310 / eval_ft.py:96-210),
  * the int8 PTQ serving path on the TRAINED model matches bf16/fp32 at
    |dmIoU| <= 0.002 (the BASELINE.json +-0.2 percentage-point bar) with
    >= 99% per-pixel argmax agreement (VERDICT r2 item 4).

Task design: every class c has a distinct RGB color; images are
palette[label] + N(0, sigma) noise. Tiles are 2x2 grids of 32x32 blocks.
Novel classes {8..11} never appear in base training; the 5-shot support
tiles are novel-class-vs-background only (label 0 -> ignore in ft episodes,
reference oem_ft.py:197).
"""

import os

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.slow

# distinct, well-separated colors per class (0 = background)
PALETTE = np.array(
    [
        (0, 0, 0),        # 0 bg
        (220, 40, 40),    # 1
        (40, 220, 40),    # 2
        (40, 40, 220),    # 3
        (220, 220, 40),   # 4
        (220, 40, 220),   # 5
        (40, 220, 220),   # 6
        (240, 140, 40),   # 7
        (245, 245, 245),  # 8 novel
        (130, 70, 190),   # 9 novel
        (100, 160, 100),  # 10 novel
        (70, 130, 160),   # 11 novel
    ],
    np.uint8,
)
SIZE = 64
NOISE = 10.0


def _tile(rng, block_classes):
    """2x2 grid of 32x32 blocks; image = class color + gaussian noise."""
    lab = np.zeros((SIZE, SIZE), np.uint8)
    half = SIZE // 2
    for i, c in enumerate(block_classes):
        y, x = (i // 2) * half, (i % 2) * half
        lab[y : y + half, x : x + half] = c
    img = PALETTE[lab].astype(np.float32)
    img = img + rng.randn(SIZE, SIZE, 3) * NOISE
    return np.clip(img, 0, 255).astype(np.uint8), lab


@pytest.fixture(scope="module")
def task_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("oem_learnable")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    (root / "list").mkdir()
    rng = np.random.RandomState(0)

    def save(tid, img, lab):
        Image.fromarray(img).save(root / "images" / f"{tid}.tif")
        Image.fromarray(lab).save(root / "labels" / f"{tid}.tif")

    # 16 base-train tiles covering classes 1..7 (+ bg): measured on this
    # exact task (tune E1/E2), 8 tiles underfit badly at any LR while 16
    # tiles at batch 4 reach ~0.5 mixed-val mIoU in 150 epochs and keep
    # climbing
    train_ids = []
    for i in range(16):
        cs = [1 + (i + j) % 7 for j in range(3)] + [0]
        rng.shuffle(cs)
        tid = f"base_{i}"
        save(tid, *_tile(rng, cs))
        train_ids.append(tid)

    # 5-shot support tiles per novel class, IN CLASS ORDER (the support list
    # is indexed cls_idx*shot+k in val_supp mode, reference oem_ft.py:222-260)
    supp_ids = []
    for c in (8, 9, 10, 11):
        for k in range(5):
            tid = f"novel{c}_{k}"
            save(tid, *_tile(rng, [c, c, 0, c]))
            supp_ids.append(tid)

    # val tiles mixing base + novel so eval_ft can score both
    val_ids = []
    for i in range(4):
        cs = [1 + (2 * i) % 7, 2 + (2 * i + 3) % 7, 8 + i, 8 + (i + 1) % 4]
        tid = f"val_{i}"
        save(tid, *_tile(rng, cs))
        val_ids.append(tid)

    # base-only val tiles for the base-training phase: with use_novel=False
    # the mixed tiles' novel blocks remap to background, and predicting bg
    # on never-seen colors is not learnable — it floors class-0 IoU and
    # drags every base class via false positives.  Base training is gated
    # on a val set drawn from its own distribution; ft/eval use the mixed
    # set where novel classes are scored as themselves.
    val_base_ids = []
    for i in range(4):
        cs = [1 + (2 * i) % 7, 2 + (2 * i + 1) % 7, 3 + (2 * i) % 7, 0]
        tid = f"valb_{i}"
        save(tid, *_tile(rng, cs))
        val_base_ids.append(tid)

    (root / "list" / "train.txt").write_text("\n".join(train_ids) + "\n")
    (root / "list" / "val.txt").write_text("\n".join(val_ids) + "\n")
    (root / "list" / "val_base.txt").write_text("\n".join(val_base_ids) + "\n")
    (root / "list" / "all_5shot_seed123.txt").write_text("\n".join(supp_ids) + "\n")
    return root


COMMON = ["--model", "pspnet_pop", "--backbone", "resnet10",
          "--num-workers", "0",
          # consistent normalization: the reference's 0.5-stats-train /
          # ImageNet-stats-val asymmetry (dataset/oem.py:26 vs
          # base_dataset.py) is a systematic input-distribution shift that
          # real imagery shrugs off but a color-keyed synthetic task cannot
          # (measured: val mIoU stuck <=0.09 with the asymmetry, learns
          # cleanly without) — the asymmetry itself stays default and is
          # golden-tested in test_data.py
          "--norm-stats", "train"]


@pytest.fixture(scope="module")
def trained_base(task_root, tmp_path_factory):
    """train_base CLI until the base model actually learns the task."""
    from segland_tpu.cli.train_base import main

    snap = str(tmp_path_factory.mktemp("snap_base"))
    best = main(
        ["--data-dir", str(task_root),
         "--train-list", str(task_root / "list" / "train.txt"),
         "--val-list", str(task_root / "list" / "val_base.txt"),
         "--snapshot-dir", snap, "--input-size", "32,32", "--batch-size", "4",
         "--num-epoch", "150", "--learning-rate", "1e-3", "--val-start", "0",
         "--val-frequency", "25", "--snapshot-frequency", "150"] + COMMON
    )
    return snap, best


@pytest.fixture(scope="module")
def tuned_ft(task_root, trained_base, tmp_path_factory):
    """ft_pop CLI on the 5-shot episodes (novel classes never seen in base)."""
    from segland_tpu.cli.ft_pop import main

    snap, _ = trained_base
    ft_snap = str(tmp_path_factory.mktemp("snap_ft"))
    # lr 1e-3 fixed, measured on this task: novel mIoU 0.63 at 30 epochs
    # (1e-2 -> 0.17, 5e-2 -> 0.00: the SGD head saturates and never
    # recovers).  1e-3 is exactly the reference ft head-effective LR
    # (ft_oem.sh lr 1e-4 x the 10x new-param group, pyt_utils.py).
    results = main(
        ["--data-dir", str(task_root),
         "--train-list", str(task_root / "list" / "train.txt"),
         "--val-list", str(task_root / "list" / "val.txt"),
         "--snapshot-dir", ft_snap,
         "--restore-from", os.path.join(snap, "best.ckpt"),
         "--input-size", "32,32", "--base-size", "64,64", "--batch-size", "2",
         "--num-epoch", "30", "--learning-rate", "1e-3", "--fix-lr",
         "--shot", "5", "--update-base", "--val-frequency", "3",
         "--random-seed", "123"] + COMMON
    )
    return ft_snap, results[123]


def _novel_miou_before_ft(task_root, snap):
    """Novel mIoU of the grafted ft model BEFORE any fine-tuning (the ~0
    starting point: novel_emb is fresh orthogonal init, classifier_n a copy
    of the base classifier)."""
    import jax
    import jax.numpy as jnp

    from segland_tpu.models import build_model
    from segland_tpu.ckpt import load_params
    from segland_tpu.ckpt.io import graft_base_into_ft
    from segland_tpu.train.ft import init_cls_n
    from segland_tpu.train.base import make_eval_step
    from segland_tpu.data import OEMValDataset, Loader

    model = build_model("pspnet_pop", backbone="resnet10", n_base=7, n_novel=4,
                        is_ft=True)
    img0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(123), img0, train=False)
    variables = jax.tree_util.tree_map(np.asarray, variables)

    base_model = build_model("pspnet_pop", backbone="resnet10", n_base=7)
    base_vars = base_model.init(jax.random.PRNGKey(0), img0, train=False)
    base_vars = load_params(os.path.join(snap, "best.ckpt"),
                            jax.tree_util.tree_map(np.asarray, base_vars))
    variables = graft_base_into_ft(variables, base_vars)
    variables["params"] = init_cls_n(variables["params"])

    eval_step = jax.jit(make_eval_step(model, 12, 255))
    valset = OEMValDataset(str(task_root), str(task_root / "list" / "val.txt"),
                           base_size=(64, 64), stats="train")
    inter, union = np.zeros(12), np.zeros(12)
    for img, mask, _ in Loader(valset, 2):
        i, u, _ = eval_step(variables["params"], variables["batch_stats"],
                            jnp.asarray(img), jnp.asarray(np.asarray(mask)))
        inter += np.asarray(i)
        union += np.asarray(u)
    iou = inter / np.maximum(union, 1)
    return float(np.mean(iou[8:]))


def test_base_training_learns(trained_base):
    _, best = trained_base
    assert best >= 0.60, f"base training failed to learn the color task: {best}"


def test_fewshot_learns_novel_classes(task_root, trained_base, tuned_ft):
    """The headline assertion: novel mIoU rises from ~0 to a meaningful
    floor through the real CLI pipeline, with base mIoU retained."""
    snap, base_best = trained_base
    ft_snap, ft_best = tuned_ft

    novel_before = _novel_miou_before_ft(task_root, snap)
    assert novel_before <= 0.05, (
        f"novel mIoU before ft should be ~0, got {novel_before}")

    assert os.path.exists(os.path.join(ft_snap, "best_123.ckpt")), (
        "ft produced no best checkpoint — base mIoU never improved")
    assert ft_best["novel"] >= 0.30, (
        f"ft failed to learn novel classes: novel mIoU {ft_best['novel']:.4f} "
        f"(started from {novel_before:.4f})")
    # measured 0.48 on the mixed val at the test config (the mixed-val base
    # score sits below the base-only-val 0.60+ because novel-class false
    # positives inflate base unions); 0.40 = retention with margin
    assert ft_best["base"] >= 0.40, (
        f"ft catastrophically forgot base classes: base mIoU {ft_best['base']:.4f}")


def test_eval_ft_cli_confirms_learning(task_root, tuned_ft, tmp_path_factory):
    """eval_ft (square-longside protocol, per-seed ckpt) reproduces the
    learned novel mIoU."""
    from segland_tpu.cli.eval_ft import main

    ft_snap, ft_best = tuned_ft
    out = str(tmp_path_factory.mktemp("eval_ft_learn"))
    results = main(
        ["--data-dir", str(task_root),
         "--val-list", str(task_root / "list" / "val.txt"),
         "--restore-from", os.path.join(ft_snap, "best.ckpt"),
         "--save-path", out, "--base-size", "64,64", "--eval-batch", "2"]
        + COMMON
    )
    base, novel, total, _ = results[123]
    assert novel >= 0.30, f"eval_ft novel mIoU {novel:.4f} below floor"
    assert base >= 0.40, f"eval_ft base mIoU {base:.4f} below retention floor"
    test_eval_ft_cli_confirms_learning.out = out


def _run_evaluator(task_root, model, variables, *, int8, fused_interp=False):
    """mIoU + stacked per-tile predictions through the REAL Evaluator."""
    import jax.numpy as jnp

    from segland_tpu.evallib import Evaluator
    from segland_tpu.data import OEMValDataset, Loader

    ev = Evaluator(model, variables, num_classes=12, n_base=7, int8=int8,
                   calib_batches=2 if int8 else 4, fused_epilogue=False)
    valset = OEMValDataset(str(task_root), str(task_root / "list" / "val.txt"),
                           base_size=(64, 64), stats="train")
    loader = Loader(valset, 2, shuffle=False)
    cm, (base, novel, total, _iou), _ = ev.run(loader, logger=None)
    preds = []
    for img, _mask, _ids in Loader(valset, 2, shuffle=False):
        _, pred = ev.predict_batch(np.asarray(img, np.float32), (64, 64),
                                   want_logits=False)
        preds.append(np.asarray(pred))
    return (base, novel, total), np.concatenate(preds, 0)


def test_int8_accuracy_gate_on_trained_model(task_root, tuned_ft):
    """VERDICT r2 item 4: int8 PTQ vs full-precision on the TRAINED ft model
    through the real Evaluator — |dmIoU| <= 0.002 (the +-0.2pp BASELINE bar)
    and >= 99% per-pixel argmax agreement."""
    import jax
    import jax.numpy as jnp

    from segland_tpu.models import build_model
    from segland_tpu.ckpt import load_params

    ft_snap, _ = tuned_ft
    model = build_model("pspnet_pop", backbone="resnet10", n_base=7, n_novel=4,
                        is_ft=True)
    img0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img0, train=False)
    variables = load_params(os.path.join(ft_snap, "best_123.ckpt"),
                            jax.tree_util.tree_map(np.asarray, variables))

    (b_f, n_f, t_f), pred_f = _run_evaluator(task_root, model, variables, int8=False)
    (b_q, n_q, t_q), pred_q = _run_evaluator(task_root, model, variables, int8=True)

    agree = float(np.mean(pred_f == pred_q))
    d_total = abs(t_f - t_q)
    d_base, d_novel = abs(b_f - b_q), abs(n_f - n_q)
    print(f"int8 gate: total mIoU fp {t_f:.4f} int8 {t_q:.4f} "
          f"(d={d_total:.5f}), agreement {agree:.5f}")
    assert agree >= 0.99, f"int8 argmax agreement {agree:.4f} < 99%"
    assert d_total <= 0.002 and d_base <= 0.002 and d_novel <= 0.002, (
        f"int8 mIoU delta above the +-0.2pp bar: total {d_total:.5f} "
        f"base {d_base:.5f} novel {d_novel:.5f}")
