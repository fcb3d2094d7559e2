"""Metric parity vs the reference numpy implementations."""

import numpy as np
import jax.numpy as jnp

from segland_tpu.metrics import confusion_matrix, intersection_and_union, miou_from_cmatrix


def _ref_confusion(gt, pred, k):
    """reference utils/pyt_utils.py:182-200 (numpy bincount)."""
    index = (gt * k + pred).astype("int32")
    counts = np.bincount(index)
    cm = np.zeros((k, k))
    for i in range(k):
        for j in range(k):
            cur = i * k + j
            if cur < len(counts):
                cm[i, j] = counts[cur]
    return cm


def test_confusion_matrix_matches_reference(rng):
    gt = rng.randint(0, 12, (2, 32, 32)).astype(np.int32)
    pred = rng.randint(0, 12, (2, 32, 32)).astype(np.int32)
    gt[0, :4] = 255
    valid = gt != 255
    want = _ref_confusion(gt[valid], pred[valid], 12)
    got = np.asarray(confusion_matrix(jnp.asarray(gt), jnp.asarray(pred), 12))
    np.testing.assert_allclose(got, want)


def test_intersection_and_union(rng):
    gt = rng.randint(0, 8, (64, 64)).astype(np.int32)
    pred = rng.randint(0, 8, (64, 64)).astype(np.int32)
    gt[:5] = 255
    inter, union, target = (np.asarray(x) for x in intersection_and_union(jnp.asarray(pred), jnp.asarray(gt), 8))
    valid = gt != 255
    for c in range(8):
        i = np.sum((pred == c) & (gt == c) & valid)
        u = np.sum(((pred == c) | (gt == c)) & valid)
        assert inter[c] == i
        assert union[c] == u
        assert target[c] == np.sum((gt == c) & valid)


def test_miou_split():
    cm = np.zeros((12, 12))
    np.fill_diagonal(cm, 10)
    base, novel, total, iou = miou_from_cmatrix(cm, n_base=7)
    assert base == 1.0 and novel == 1.0 and total == 1.0
    cm[8, 8] = 0
    cm[8, 0] = 10  # class 8 fully confused
    base, novel, total, _ = miou_from_cmatrix(cm, n_base=7)
    assert novel < 1.0 and base < 1.0  # pos/res coupling through class 0
