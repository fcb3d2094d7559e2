"""Host-only tool CLIs: translabel, get_list, gen_fs_list, gen_new_samples."""

import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture()
def label_dir(tmp_path):
    d = tmp_path / "labels"
    d.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray(rng.randint(0, 12, (16, 16)).astype(np.uint8)).save(d / f"t{i}.tif")
    return d


def test_translabel(label_dir, tmp_path):
    from segland_tpu.cli.translabel import main

    out = tmp_path / "colored"
    main(["--input", str(label_dir), "--output", str(out)])
    assert sorted(os.listdir(out)) == ["t0.tif", "t1.tif", "t2.tif"]
    img = Image.open(out / "t0.tif")
    assert img.mode == "P"  # palette (colormapped)


def test_get_list(label_dir, tmp_path):
    from segland_tpu.cli.get_list import main

    tr, te = tmp_path / "tr.txt", tmp_path / "te.txt"
    main(["--input", str(label_dir), "--train-out", str(tr), "--test-out", str(te), "--seed", "0"])
    lines = tr.read_text().splitlines() + te.read_text().splitlines()
    assert sorted(lines) == ["t0.tif", "t1.tif", "t2.tif"]


def test_gen_fs_list(tmp_path):
    from segland_tpu.cli.gen_fs_list import main

    root = tmp_path / "oem"
    (root / "labels").mkdir(parents=True)
    (root / "list").mkdir()
    rng = np.random.RandomState(1)
    ids = []
    for i in range(8):
        lab = rng.randint(1, 8, (16, 16)).astype(np.uint8)
        lab[:4, :4] = 8 + (i % 4)  # every tile contains one novel class
        Image.fromarray(lab).save(root / "labels" / f"t{i}.tif")
        ids.append(f"t{i}")
    (root / "list" / "train.txt").write_text("\n".join(ids))
    main(["--data-dir", str(root), "--train-list", str(root / "list" / "train.txt"),
          "--shot", "2", "--seed", "9"])
    out = (root / "list" / "all_2shot_seed9.txt").read_text().splitlines()
    assert len(out) == 8  # 4 novel classes x 2 shots


def test_gen_new_samples(tmp_path):
    from segland_tpu.cli.gen_new_samples import main

    cm = tmp_path / "cutmix"
    cls = "Parking space"
    (cm / cls / f"{cls}_image").mkdir(parents=True)
    (cm / cls / f"{cls}_mask").mkdir(parents=True)
    rng = np.random.RandomState(2)
    for i in range(2):
        mask = np.zeros((16, 16), np.uint8)
        mask[2:6, 2:6] = 30  # sentinel
        Image.fromarray(mask).save(cm / cls / f"{cls}_mask" / f"tile{i}_a.tif")
        Image.fromarray(rng.randint(0, 255, (16, 16, 3), np.uint8)).save(
            cm / cls / f"{cls}_image" / f"tile{i}.tif")
    out = tmp_path / "out"
    main(["--cutmix-root", str(cm), "--output-root", str(out),
          "--class-names", cls, "--indexes", "9"])
    lst = (out / "train.txt").read_text().splitlines()
    assert len(lst) == 2
    lab = np.asarray(Image.open(out / "label" / f"{lst[0]}.tif"))
    assert 30 not in np.unique(lab) and 9 in np.unique(lab)  # sentinel remapped


def test_ensemble_evaluator_matches_fusemat_semantics(tmp_path, rng):
    """Device-side EnsembleEvaluator (one jit through all members, mean
    logits, argmax) == the host fusemat protocol (per-model prob export ->
    mean -> argmax) on the same batch — the TPU-native contest config."""
    import jax
    import jax.numpy as jnp

    from segland_tpu.evallib import EnsembleEvaluator
    from segland_tpu.models import build_model
    from segland_tpu.ops.resize import resize_bilinear

    members = []
    for seed in (0, 1, 2):
        model = build_model("pspnet_pop", backbone="resnet10", n_base=7)
        img0 = jnp.zeros((1, 32, 32, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(seed), img0, train=False)
        members.append((model, variables))

    img = rng.rand(2, 32, 32, 3).astype(np.float32)
    ens = EnsembleEvaluator(members, num_classes=8, n_base=7)
    pred = np.asarray(ens.predict_batch(img, (32, 32)))

    # host-side fusemat semantics: mean of per-member upsampled logits
    acc = None
    for model, variables in members:
        lg = model.apply(variables, jnp.asarray(img), train=False)
        lg = np.asarray(resize_bilinear(lg.astype(jnp.float32), (32, 32),
                                        align_corners=True))
        acc = lg if acc is None else acc + lg
    ref = (acc / len(members)).argmax(-1).astype(np.uint8)
    np.testing.assert_array_equal(pred, ref)


def test_ensemble_eval_cli(tmp_path):
    """cli.ensemble_eval end to end on tiny synthetic data: two members
    (fresh inits saved as checkpoints), labeled arm returns mIoU dict and
    writes the ensemble cmatrix; members spec parsing + ckpt loading +
    device fusion all exercised."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from segland_tpu.ckpt import save_params
    from segland_tpu.cli.ensemble_eval import main
    from segland_tpu.models import build_model

    root = tmp_path / "data"
    (root / "images").mkdir(parents=True)
    (root / "labels").mkdir()
    rng_ = np.random.RandomState(0)
    ids = []
    for i in range(2):
        tid = f"t{i}"
        Image.fromarray(rng_.randint(0, 255, (32, 32, 3), np.uint8)).save(
            root / "images" / f"{tid}.tif")
        Image.fromarray(rng_.randint(0, 8, (32, 32)).astype(np.uint8)).save(
            root / "labels" / f"{tid}.tif")
        ids.append(tid)
    lst = root / "val.txt"
    lst.write_text("\n".join(ids) + "\n")

    specs = []
    img0 = jnp.zeros((1, 32, 32, 3), jnp.float32)
    for seed in (0, 1):
        model = build_model("pspnet_pop", backbone="resnet10", n_base=7)
        variables = model.init(jax.random.PRNGKey(seed), img0, train=False)
        ck = str(tmp_path / f"m{seed}.ckpt")
        save_params(ck, jax.tree_util.tree_map(np.asarray, variables))
        specs.append(f"pspnet_pop:resnet10:{ck}")

    out = main(["--data-dir", str(root), "--val-list", str(lst),
                "--members", ",".join(specs), "--base-size", "32,32",
                "--num-classes", "8", "--num-workers", "0",
                "--save-path", str(tmp_path / "out"), "--eval-batch", "2"])
    assert 0.0 <= out["total"] <= 1.0 and out["tps"] > 0
    assert os.path.exists(tmp_path / "out" / "cmatrix_ensemble.npy")
