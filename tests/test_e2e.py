"""End-to-end micro-runs of the CLI drivers on synthetic tiles (SURVEY §4e):
train 2 epochs -> checkpoint -> eval with mIoU + export -> ft 1 epoch."""

import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("oem_e2e")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    (root / "list").mkdir()
    rng = np.random.RandomState(7)
    ids = [f"tile_{i}" for i in range(6)]
    for i, tid in enumerate(ids):
        Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8)).save(root / "images" / f"{tid}.tif")
        lab = rng.randint(1, 8, (64, 64)).astype(np.uint8)
        if i >= 4:
            lab[4:20, 4:20] = 8 + (i % 4)
        Image.fromarray(lab).save(root / "labels" / f"{tid}.tif")
    # unlabeled test tiles
    for tid in ("test_0", "test_1"):
        Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8)).save(root / "images" / f"{tid}.tif")
        ids_test = tid
    (root / "list" / "train.txt").write_text("\n".join(ids) + "\n")
    (root / "list" / "val.txt").write_text("\n".join(ids[:3]) + "\n")
    (root / "list" / "test.txt").write_text("test_0\ntest_1\n")
    (root / "list" / "all_5shot_seed123.txt").write_text("\n".join((ids[4:] * 10)[:20]) + "\n")
    return root


COMMON = ["--model", "pspnet_pop", "--backbone", "resnet10", "--num-workers", "0"]


def test_train_base_cli(data_root, tmp_path_factory):
    from segland_tpu.cli.train_base import main

    snap = str(tmp_path_factory.mktemp("snap"))
    best = main(
        ["--data-dir", str(data_root), "--train-list", str(data_root / "list" / "train.txt"),
         "--val-list", str(data_root / "list" / "val.txt"), "--snapshot-dir", snap,
         "--input-size", "32,32", "--batch-size", "2", "--num-epoch", "2",
         "--learning-rate", "1e-4", "--val-start", "0", "--val-frequency", "2",
         "--snapshot-frequency", "2", "--metrics"] + COMMON
    )
    assert os.path.exists(os.path.join(snap, "epoch_2.ckpt"))
    assert os.path.exists(os.path.join(snap, "best.ckpt"))
    assert 0.0 <= best <= 1.0
    # --metrics: the tensorboardX-analog JSONL scalar stream
    import json

    lines = [json.loads(l) for l in open(os.path.join(snap, "metrics.jsonl"))]
    tags = {l["tag"] for l in lines}
    assert "train/total_loss" in tags and "train/lr" in tags
    assert "val/mIoU" in tags
    assert all(np.isfinite(l["value"]) for l in lines)
    # stash for downstream tests
    test_train_base_cli.snap = snap


def test_train_base_cli_device_augment(data_root, tmp_path_factory):
    """--device-augment: loader yields raw uint8 tiles, the jitted step
    fuses crop/pad/flip/rot90/normalize on device (ops/device_aug.py)."""
    from segland_tpu.cli.train_base import main

    snap = str(tmp_path_factory.mktemp("snap_devaug"))
    best = main(
        ["--data-dir", str(data_root), "--train-list", str(data_root / "list" / "train.txt"),
         "--val-list", str(data_root / "list" / "val.txt"), "--snapshot-dir", snap,
         "--input-size", "32,32", "--batch-size", "2", "--num-epoch", "1",
         "--learning-rate", "1e-4", "--val-start", "0", "--val-frequency", "1",
         "--snapshot-frequency", "1", "--device-augment"] + COMMON
    )
    assert os.path.exists(os.path.join(snap, "best.ckpt"))
    assert 0.0 <= best <= 1.0


def test_eval_base_cli_with_gt(data_root, tmp_path_factory):
    from segland_tpu.cli.eval_base import main

    snap = getattr(test_train_base_cli, "snap", None)
    assert snap, "train test must run first"
    out = str(tmp_path_factory.mktemp("eval_out"))
    results = main(
        ["--data-dir", str(data_root), "--val-list", str(data_root / "list" / "val.txt"),
         "--restore-from", os.path.join(snap, "best.ckpt"), "--save-path", out,
         "--base-size", "64,64", "--eval-batch", "2"] + COMMON
    )
    base, novel, total, tps = results[123]
    assert os.path.exists(os.path.join(out, "cmatrix_123.npy"))
    assert 0.0 <= base <= 1.0 and tps > 0


def test_eval_base_cli_export(data_root, tmp_path_factory):
    from segland_tpu.cli.eval_base import main

    snap = getattr(test_train_base_cli, "snap", None)
    out = str(tmp_path_factory.mktemp("eval_pred"))
    main(
        ["--data-dir", str(data_root), "--val-list", str(data_root / "list" / "test.txt"),
         "--restore-from", os.path.join(snap, "best.ckpt"), "--save-path", out,
         "--base-size", "64,64", "--eval-batch", "2"] + COMMON
    )
    # unlabeled tiles -> colormapped tif + prob mat
    assert os.path.exists(os.path.join(out, "test_0.tif"))
    assert os.path.exists(os.path.join(out, "prob", "test_0.mat"))
    from segland_tpu.data.tileio import read_prob_mat

    prob = read_prob_mat(os.path.join(out, "prob", "test_0.mat"))
    assert prob.shape == (1, 8, 64, 64)  # NCHW like the reference export
    test_eval_base_cli_export.out = out


def test_fuse_and_trans_cli(tmp_path_factory):
    from segland_tpu.cli.fuse import main as fuse_main
    from segland_tpu.cli.trans import main as trans_main

    out = getattr(test_eval_base_cli_export, "out", None)
    assert out
    fused = str(tmp_path_factory.mktemp("fused"))
    fuse_main(["--inputs", os.path.join(out, "prob"), os.path.join(out, "prob"),
               "--output", fused, "--size", "64"])
    assert os.path.exists(os.path.join(fused, "test_0.png"))
    png_out = str(tmp_path_factory.mktemp("upload"))
    trans_main(["--input", out, "--output", png_out, "--size", "64"])
    assert os.path.exists(os.path.join(png_out, "test_0.png"))


def test_ft_pop_cli(data_root, tmp_path_factory):
    from segland_tpu.cli.ft_pop import main

    snap = getattr(test_train_base_cli, "snap", None)
    ft_snap = str(tmp_path_factory.mktemp("ft_snap"))
    results = main(
        ["--data-dir", str(data_root), "--train-list", str(data_root / "list" / "train.txt"),
         "--val-list", str(data_root / "list" / "val.txt"), "--snapshot-dir", ft_snap,
         "--restore-from", os.path.join(snap, "best.ckpt"), "--input-size", "32,32",
         "--base-size", "64,64", "--batch-size", "1", "--num-epoch", "1",
         "--learning-rate", "1e-4", "--fix-lr", "--shot", "5", "--update-base",
         "--val-frequency", "1", "--random-seed", "123"] + COMMON
    )
    assert 123 in results
    assert os.path.exists(os.path.join(ft_snap, "best_123.ckpt")) or results[123]["base"] == 0.0
    test_ft_pop_cli.snap = ft_snap


def test_eval_ft_cli(data_root, tmp_path_factory):
    from segland_tpu.cli.eval_ft import main

    ft_snap = getattr(test_ft_pop_cli, "snap", None)
    assert ft_snap, "ft test must run first"
    ckpt = os.path.join(ft_snap, "best_123.ckpt")
    if not os.path.exists(ckpt):
        pytest.skip("ft produced no best ckpt on this toy task")
    out = str(tmp_path_factory.mktemp("eval_ft_out"))
    # eval_ft: seeded ckpt resolution (best.ckpt -> best_123.ckpt), 12-class
    # square-longside protocol (reference eval_ft.py:154,168-178)
    results = main(
        ["--data-dir", str(data_root), "--val-list", str(data_root / "list" / "val.txt"),
         "--restore-from", os.path.join(ft_snap, "best.ckpt"), "--save-path", out,
         "--base-size", "64,64", "--eval-batch", "2"] + COMMON
    )
    base, novel, total, tps = results[123]
    assert 0.0 <= base <= 1.0
    assert os.path.exists(os.path.join(out, "cmatrix_123.npy"))


def test_eval_ft_cli_two_seeds(data_root, tmp_path_factory):
    """Two seeds must resolve to two DIFFERENT checkpoint files
    (reference eval_ft.py:154: restore_from[:-4]+'_<seed>.pth' per seed):
    seed 456's ckpt gets zeroed novel prototypes, so its predictions must
    differ from seed 123's."""
    import flax.serialization as ser
    from segland_tpu.cli.eval_ft import main

    ft_snap = getattr(test_ft_pop_cli, "snap", None)
    assert ft_snap, "ft test must run first"
    ckpt123 = os.path.join(ft_snap, "best_123.ckpt")
    if not os.path.exists(ckpt123):
        pytest.skip("ft produced no best ckpt on this toy task")
    raw = ser.msgpack_restore(open(ckpt123, "rb").read())
    raw["params"]["novel_emb"] = np.zeros_like(raw["params"]["novel_emb"])
    for k in raw["params"]["classifier_n"]:
        raw["params"]["classifier_n"][k] = 7.0 * raw["params"]["classifier_n"][k]
    with open(os.path.join(ft_snap, "best_456.ckpt"), "wb") as f:
        f.write(ser.msgpack_serialize(raw))
    out = str(tmp_path_factory.mktemp("eval_ft_two_seeds"))
    results = main(
        ["--data-dir", str(data_root), "--val-list", str(data_root / "list" / "val.txt"),
         "--restore-from", os.path.join(ft_snap, "best.ckpt"), "--save-path", out,
         "--base-size", "64,64", "--eval-batch", "2",
         "--random-seed", "123,456"] + COMMON
    )
    assert set(results) == {123, 456}
    assert os.path.exists(os.path.join(out, "cmatrix_123.npy"))
    assert os.path.exists(os.path.join(out, "cmatrix_456.npy"))
    cm123 = np.load(os.path.join(out, "cmatrix_123.npy"))
    cm456 = np.load(os.path.join(out, "cmatrix_456.npy"))
    assert not np.array_equal(cm123, cm456), (
        "two seeds produced identical confusion matrices - the per-seed "
        "checkpoint resolution did not load distinct files")


def test_eval_base_cli_int8(data_root, tmp_path_factory):
    """--int8 PTQ serving path: runs end-to-end and stays close to fp32 mIoU."""
    from segland_tpu.cli.eval_base import main

    snap = getattr(test_train_base_cli, "snap", None)
    assert snap, "train test must run first"
    out = str(tmp_path_factory.mktemp("eval_int8"))
    results = main(
        ["--data-dir", str(data_root), "--val-list", str(data_root / "list" / "val.txt"),
         "--restore-from", os.path.join(snap, "best.ckpt"), "--save-path", out,
         "--base-size", "64,64", "--eval-batch", "2", "--int8",
         "--calib-batches", "1", "--fused"] + COMMON
    )
    base, novel, total, tps = results[123]
    assert 0.0 <= base <= 1.0 and tps > 0


def test_predict_cli(data_root, tmp_path_factory):
    from segland_tpu.cli.predict import main

    snap = getattr(test_train_base_cli, "snap", None)
    assert snap, "train test must run first"
    scene_dir = tmp_path_factory.mktemp("scenes")
    rng = np.random.RandomState(9)
    Image.fromarray(rng.randint(0, 255, (70, 90, 3), np.uint8)).save(scene_dir / "s.tif")
    out = str(tmp_path_factory.mktemp("scene_preds"))
    n = main(["--data-dir", str(data_root), "--input", str(scene_dir), "--output", out,
              "--restore-from", os.path.join(snap, "best.ckpt"),
              "--tile", "32", "--overlap", "8", "--eval-batch", "2"] + COMMON)
    assert n == 1
    assert os.path.exists(os.path.join(out, "s.tif"))
