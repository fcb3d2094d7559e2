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


def test_gaussian_blur5_impulse_and_kernel():
    """cv2.GaussianBlur((5,5), 0) uses the fixed small-kernel tab
    [1,4,6,4,1]/16; an interior impulse reproduces its outer product."""
    import random

    img = np.zeros((11, 11), np.float32)
    img[5, 5] = 256.0
    out = A.gaussian_blur5(img)
    want = np.outer(A._GAUSS5, A._GAUSS5) * 256.0
    np.testing.assert_allclose(out[3:8, 3:8], want, atol=1e-4)
    assert abs(out.sum() - 256.0) < 1e-3  # kernel normalized; mirror conserves

    # uint8 in -> uint8 out (matches cv2 dtype behavior), p-gating
    u = np.full((8, 8, 3), 100, np.uint8)
    assert A.gaussian_blur5(u).dtype == np.uint8
    rng = random.Random(0)
    same = A.random_gaussian(random.Random(1), u, p=0.0)
    assert same is u


def test_fixed_and_square_resize():
    import random

    img = np.arange(20 * 10 * 3, dtype=np.uint8).reshape(20, 10, 3)
    lbl = (np.arange(20 * 10, dtype=np.uint8) % 5).reshape(20, 10)
    im2, lb2 = A.fixed_resize(img, lbl, base_size=(8, 6))
    # the reference passes (base_size[0], base_size[1]) as cv2's (w, h)
    # (base_dataset.py:66-68) — transposed from its own square_resize —
    # so base_size=(8, 6) yields W=8, H=6
    assert im2.shape == (6, 8, 3) and lb2.shape == (6, 8)
    assert set(np.unique(lb2)) <= set(np.unique(lbl))  # nearest: no new ids

    im3, lb3 = A.square_resize(random.Random(0), img, lbl, base_size=(8, 8))
    assert im3.shape == (8, 8, 3) and lb3.shape == (8, 8)
    im4, _ = A.square_resize(random.Random(0), img, lbl, base_size=(100, 100),
                             ratio_range=(0.5, 0.5), random_scale=True)
    assert im4.shape == (50, 50, 3)


def test_warp_rotate_identity_and_borders():
    img = np.random.RandomState(0).randint(0, 255, (16, 16, 3), np.uint8)
    lbl = np.random.RandomState(1).randint(0, 4, (16, 16), np.uint8)
    # angle 0: the affine map is exactly identity
    np.testing.assert_array_equal(A._warp_rotate(img, 0.0, [0, 0, 0], nearest=False), img)
    np.testing.assert_array_equal(A._warp_rotate(lbl, 0.0, 255, nearest=True), lbl)
    # rotated label: values only from the original set + ignore at borders
    rot = A._warp_rotate(lbl, 10.0, 255, nearest=True)
    assert set(np.unique(rot)) <= set(np.unique(lbl)) | {255}
    assert (rot == 255).any()  # corners swing out of bounds at 10 degrees
    # bilinear interpolation of a linear ramp is exact: the rotated output
    # must equal the ramp evaluated at the inverse-mapped coordinates
    h = w = 16
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    ramp = (3.0 * xs + 2.0 * ys).astype(np.float32)
    ang = 10.0
    th = np.deg2rad(ang)
    a, b = np.cos(th), np.sin(th)
    cx, cy = w / 2.0, h / 2.0
    sx = a * (xs - cx) - b * (ys - cy) + cx
    sy = b * (xs - cx) + a * (ys - cy) + cy
    want = 3.0 * sx + 2.0 * sy
    got = A._warp_rotate(ramp, ang, 0.0, nearest=False)
    inside = (sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1)
    np.testing.assert_allclose(got[inside], want[inside].astype(np.float32), atol=1e-3)


def test_random_rotate_retry_until_class1():
    import random

    img = np.zeros((16, 16, 3), np.uint8)
    # label with class 1 everywhere: rotation accepted on first draw
    lbl = np.ones((16, 16), np.uint8)
    rng = random.Random(3)
    im2, lb2 = A.random_rotate(rng, img, lbl, p=1.0)
    assert (lb2 == 1).any()  # class-1 retained (acceptance condition)
    assert set(np.unique(lb2)) <= {1, 255}
    # label without class 1 anywhere: all 5 draws rejected -> original kept
    lbl0 = np.zeros((16, 16), np.uint8)
    im3, lb3 = A.random_rotate(random.Random(3), img, lbl0, p=1.0)
    np.testing.assert_array_equal(lb3, lbl0)
    # p=0: untouched
    im4, lb4 = A.random_rotate(random.Random(0), img, lbl, p=0.0)
    assert im4 is img and lb4 is lbl


def test_val_supp_rotate_wired(data_root):
    """_get_val_support applies the +-10-degree rotate with retry
    (reference oem_ft.py:251): the pipeline runs end-to-end and labels stay
    binarized (ignore borders may appear when a rotation is accepted)."""
    ds = OEMFtTrainDataset(
        str(data_root), str(data_root / "list" / "train.txt"), shot=5, seed=123,
        crop_size=(32, 32), mode="val_supp",
    )
    for idx in range(len(ds)):
        _, labels, _, _ = ds[idx]
        for lab in labels:
            assert set(np.unique(lab)) <= {0, 1, 255}


def test_ft_filter_novel(data_root):
    """--filter-novel (reference oem_ft.py:32-35,276-281): base-support
    candidates restrict to tiles whose classes are a subset of the base set,
    and the whole list DIRECTORY gets a _filter suffix (per-class caches
    live there; the shot list is read from there too, falling back to the
    unfiltered dir when absent)."""
    ds = OEMFtTrainDataset(
        str(data_root), str(data_root / "list" / "train.txt"), shot=5, seed=123,
        crop_size=(32, 32), filter=True,
    )
    base = set(range(1, 8))
    for cls, ids in ds.base_cls_to_ids.items():
        for tid in ids:
            assert ds._label_classes(tid).issubset(base), (cls, tid)
    import os
    assert os.path.exists(str(data_root / "list_filter" / "train_base_class1.txt"))
    # unfiltered cache untouched / independent
    ds0 = OEMFtTrainDataset(
        str(data_root), str(data_root / "list" / "train.txt"), shot=5, seed=123,
        crop_size=(32, 32), filter=False,
    )
    n_f = sum(len(v) for v in ds.base_cls_to_ids.values())
    n_0 = sum(len(v) for v in ds0.base_cls_to_ids.values())
    assert n_f <= n_0


class _IndexDataset:
    """Dataset yielding its own index: batch contents are observable."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return np.full((2, 2), i, np.int32), np.int32(i), f"id{i}"


def test_loader_process_sharding_two_ranks():
    """DistributedSampler analog (reference engine.py:83-88): two processes
    with a global batch must each load a DISJOINT contiguous half of every
    batch, the union must cover exactly the global batches, and the
    epoch-seeded shuffle must agree across ranks."""
    n, global_batch = 10, 4
    ds = _IndexDataset(n)

    def batches(rank, world, epoch):
        ld = Loader(ds, global_batch, shuffle=True, drop_last=True, seed=7,
                    process_index=rank, process_count=world)
        ld.set_epoch(epoch)
        return [tuple(ids) for _, _, ids in ld]

    for epoch in (0, 1):
        r0 = batches(0, 2, epoch)
        r1 = batches(1, 2, epoch)
        single = batches(0, 1, epoch)
        assert len(r0) == len(r1) == len(single) == n // global_batch
        for b0, b1, full in zip(r0, r1, single):
            assert len(b0) == len(b1) == global_batch // 2
            assert not set(b0) & set(b1), "rank shards overlap"
            # contiguous-shard order: rank0 gets the first half, rank1 the
            # second, of the SAME epoch-shuffled global batch
            assert b0 + b1 == full
    # different epochs see different shuffles (set_epoch works)
    assert batches(0, 2, 0) != batches(0, 2, 1)
    # a global batch not divisible by process_count is a config error
    with pytest.raises(ValueError):
        Loader(ds, 3, process_index=0, process_count=2)


def test_loader_sharded_samples_match_unsharded():
    """The actual ARRAYS each rank collates are the rows the single-process
    loader would put at that rank's offset in the global batch."""
    ds = _IndexDataset(8)
    full = list(Loader(ds, 4, shuffle=False, drop_last=True,
                       process_index=0, process_count=1))
    for rank in (0, 1):
        part = list(Loader(ds, 4, shuffle=False, drop_last=True,
                           process_index=rank, process_count=2))
        for (fi, fl, _), (pi, pl, _) in zip(full, part):
            lo = rank * 2
            np.testing.assert_array_equal(pi, fi[lo:lo + 2])
            np.testing.assert_array_equal(pl, fl[lo:lo + 2])
