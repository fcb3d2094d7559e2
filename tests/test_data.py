"""Data pipeline tests on synthetic tiles (no OEM data in the image)."""

import os

import numpy as np
import pytest
from PIL import Image

from segland_tpu.data import OEMTrainDataset, OEMValDataset, OEMFtTrainDataset, Loader
from segland_tpu.data import augment as A


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    """Synthetic OEM-like root: images/<id>.tif + labels/<id>.tif + lists."""
    root = tmp_path_factory.mktemp("oem")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    (root / "list").mkdir()
    rng = np.random.RandomState(42)
    ids = [f"tile_{i}" for i in range(6)]
    for i, tid in enumerate(ids):
        img = rng.randint(0, 255, (64, 64, 3), np.uint8)
        # labels cover base classes 1..7 everywhere; tiles 4,5 add novel 8..11
        lab = rng.randint(1, 8, (64, 64)).astype(np.uint8)
        if i >= 4:
            lab[8:24, 8:24] = 8 + (i % 4)
            lab[30:40, 30:40] = 8 + ((i + 1) % 4)
        Image.fromarray(img).save(root / "images" / f"{tid}.tif")
        Image.fromarray(lab).save(root / "labels" / f"{tid}.tif")
    (root / "list" / "train.txt").write_text("\n".join(ids) + "\n")
    (root / "list" / "val.txt").write_text("\n".join(ids[:3]) + "\n")
    # 5-shot support list: novel tiles repeated (4 classes x 5 shots = 20)
    (root / "list" / "all_5shot_seed123.txt").write_text("\n".join((ids[4:] * 10)[:20]) + "\n")
    return root


def test_normalize_matches_reference_formula(rng):
    img = rng.randint(0, 255, (8, 8, 3)).astype(np.uint8)
    out = A.normalize(img, (0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
    want = (img.astype(np.float32)[:, :, ::-1] / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(out, want, rtol=1e-6)


def test_train_dataset(data_root):
    ds = OEMTrainDataset(str(data_root), str(data_root / "list" / "train.txt"), crop_size=(32, 32))
    assert len(ds) == 6
    img, lab, tid = ds[0]
    assert img.shape == (32, 32, 3) and img.dtype == np.float32
    assert lab.shape == (32, 32) and lab.dtype == np.int32
    assert set(np.unique(lab)) <= set(range(12)) | {255}
    # determinism under set_seed
    ds.set_seed(7)
    a = ds[1][0]
    ds.set_seed(7)
    b = ds[1][0]
    np.testing.assert_array_equal(a, b)


def test_val_dataset_remap(data_root):
    ds = OEMValDataset(str(data_root), str(data_root / "list" / "val.txt"))
    img, lab, tid = ds[0]
    assert img.shape == (64, 64, 3)
    # base classes already 1..7 -> unchanged; no novel in first tiles
    assert lab.max() <= 7
    ds_nb = OEMValDataset(str(data_root), str(data_root / "list" / "val.txt"), use_base=False)
    _, lab_nb, _ = ds_nb[0]
    assert lab_nb.max() == 0  # all base classes zeroed


def test_ft_dataset_pairs(data_root):
    ds = OEMFtTrainDataset(
        str(data_root), str(data_root / "list" / "train.txt"), shot=5, seed=123, crop_size=(32, 32)
    )
    # per-class lists were scanned and cached
    for c in range(1, 8):
        assert (data_root / "list" / f"train_base_class{c}.txt").exists()
    assert len(ds) == 35  # 7 base classes x 5 shots
    img, lab, img_b, lab_b, tid = ds[0]
    assert img.shape == (32, 32, 3) and img_b.shape == (32, 32, 3)
    # novel-support sample: background relabeled to ignore
    assert 0 not in np.unique(lab)
    old = list(ds.base_id_list)
    ds.update_base_list()
    assert len(ds.base_id_list) == len(old)


def test_loader_batching(data_root):
    ds = OEMTrainDataset(str(data_root), str(data_root / "list" / "train.txt"), crop_size=(32, 32))
    loader = Loader(ds, batch_size=4, shuffle=True, drop_last=True, seed=0)
    batches = list(loader)
    assert len(batches) == 1
    img, lab, ids = batches[0]
    assert img.shape == (4, 32, 32, 3) and lab.shape == (4, 32, 32)
    assert len(ids) == 4
    # epoch changes shuffle order
    loader.set_epoch(1)
    ids2 = list(loader)[0][2]
    assert ids != ids2 or True  # order may coincide; just ensure it runs


def test_loader_num_workers(data_root):
    ds = OEMTrainDataset(str(data_root), str(data_root / "list" / "train.txt"), crop_size=(32, 32))
    l0 = Loader(ds, batch_size=4, shuffle=False, num_workers=0)
    l4 = Loader(ds, batch_size=4, shuffle=False, num_workers=4)
    a = list(l0)[0]
    ds.set_seed(123)  # reset RNG so augs match
    b = list(l4)[0]
    assert a[0].shape == b[0].shape and a[2] == b[2]


def test_loader_process_sharding(data_root):
    ds = OEMTrainDataset(str(data_root), str(data_root / "list" / "train.txt"), crop_size=(32, 32))
    l0 = Loader(ds, batch_size=4, process_index=0, process_count=2)
    l1 = Loader(ds, batch_size=4, process_index=1, process_count=2)
    b0 = list(l0)[0]
    b1 = list(l1)[0]
    assert b0[0].shape[0] == 2 and b1[0].shape[0] == 2
    assert set(b0[2]).isdisjoint(b1[2])


def test_ft_val_supp_mode(data_root):
    """Per-class binarized support sets (reference oem_ft.py:222-260)."""
    ds = OEMFtTrainDataset(
        str(data_root), str(data_root / "list" / "train.txt"), shot=5, seed=123,
        crop_size=(32, 32), mode="val_supp",
    )
    assert len(ds) == 11  # 7 base + 4 novel classes
    images, labels, ids, target_cls = ds[len(ds) - 1]  # last novel class
    assert target_cls == 11
    assert len(images) == 5 and len(labels) == 5
    for lab in labels:
        assert set(np.unique(lab)) <= {0, 1, 255}  # binarized


def test_val_dataset_missing_label(data_root):
    (data_root / "list" / "unlabeled.txt").write_text("nolabel_tile\n")
    from PIL import Image as _I
    rng = np.random.RandomState(1)
    _I.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8)).save(
        data_root / "images" / "nolabel_tile.tif")
    ds = OEMValDataset(str(data_root), str(data_root / "list" / "unlabeled.txt"))
    img, lab, tid = ds[0]
    assert lab is None and img.shape == (64, 64, 3)


@pytest.mark.parametrize("device_normalize", [False, True])
def test_val_get_batch_matches_per_item(data_root, device_normalize):
    """Native batched fast path == per-item path (images, labels, ids)."""
    from segland_tpu import native

    if native.get_lib() is None:
        pytest.skip("native tiffdec unavailable")
    ds = OEMValDataset(str(data_root), str(data_root / "list" / "val.txt"),
                       base_size=(64, 64), device_normalize=device_normalize)
    batch = ds.get_batch([0, 1, 2])
    assert batch is not None
    images, labels, tids = batch
    assert images.dtype == (np.uint8 if device_normalize else np.float32)
    ref = [ds[i] for i in range(3)]
    for i in range(3):
        np.testing.assert_allclose(images[i], ref[i][0], atol=1e-5)
        np.testing.assert_array_equal(labels[i], ref[i][1])
        assert tids[i] == ref[i][2]


def test_val_get_batch_fallbacks(data_root):
    from segland_tpu import native

    if native.get_lib() is None:
        pytest.skip("native tiffdec unavailable")
    # resize_label protocol -> no fast path
    ds = OEMValDataset(str(data_root), str(data_root / "list" / "val.txt"),
                       base_size=(32, 32), resize_label=True)
    assert ds.get_batch([0, 1]) is None
    # wrong base_size (decode dims mismatch) -> no fast path
    ds2 = OEMValDataset(str(data_root), str(data_root / "list" / "val.txt"),
                        base_size=(32, 32))
    assert ds2.get_batch([0, 1]) is None
    # Loader still yields identical batches through the fallback
    l = Loader(ds2, 2, shuffle=False, drop_last=False)
    b = next(iter(l))
    assert b[0].shape[0] == 2


def test_loader_uses_get_batch(data_root):
    from segland_tpu import native

    if native.get_lib() is None:
        pytest.skip("native tiffdec unavailable")
    ds = OEMValDataset(str(data_root), str(data_root / "list" / "val.txt"),
                       base_size=(64, 64))
    calls = []
    orig = ds.get_batch
    ds.get_batch = lambda idx: calls.append(list(idx)) or orig(idx)
    batches = list(Loader(ds, 2, shuffle=False, drop_last=False))
    assert calls and len(batches) == 2
    assert batches[0][0].shape == (2, 64, 64, 3)
