"""Evaluation metrics: confusion matrix, intersection/union, mIoU.

Matches reference utils/pyt_utils.py:182-200 (bincount confusion matrix) and
:278-305 (intersectionAndUnion); mIoU split into base/novel/total as in
eval_base.py:193-199.
"""

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial


@partial(jax.jit, static_argnames=("num_classes", "ignore_index"))
def confusion_matrix(gt: jnp.ndarray, pred: jnp.ndarray, num_classes: int, ignore_index: int = 255):
    """[K,K] counts over non-ignored pixels; rows = gt, cols = pred."""
    valid = gt != ignore_index
    idx = jnp.where(valid, gt.astype(jnp.int32) * num_classes + pred.astype(jnp.int32), num_classes * num_classes)
    counts = jnp.bincount(idx.reshape(-1), length=num_classes * num_classes + 1)
    return counts[:-1].reshape(num_classes, num_classes).astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)


@partial(jax.jit, static_argnames=("num_classes", "ignore_index"))
def intersection_and_union(pred: jnp.ndarray, gt: jnp.ndarray, num_classes: int, ignore_index: int = 255):
    """Per-class (intersection, union, target) histograms, reference
    utils/pyt_utils.py:293-305 semantics (pred masked to ignore where gt is)."""
    valid = gt != ignore_index
    pred = jnp.where(valid, pred, ignore_index)
    inter = jnp.where((pred == gt) & valid, pred, num_classes)
    area_inter = jnp.bincount(inter.reshape(-1).astype(jnp.int32), length=num_classes + 1)[:num_classes]
    p = jnp.where(valid, pred, num_classes)
    g = jnp.where(valid, gt, num_classes)
    area_pred = jnp.bincount(p.reshape(-1).astype(jnp.int32), length=num_classes + 1)[:num_classes]
    area_gt = jnp.bincount(g.reshape(-1).astype(jnp.int32), length=num_classes + 1)[:num_classes]
    return area_inter, area_pred + area_gt - area_inter, area_gt


def miou_from_cmatrix(cm: np.ndarray, n_base: int):
    """(base_miou, novel_miou, total_miou, per_class_iou).

    base = classes [0..n_base] incl. background, novel = the rest
    (reference eval_base.py:193-199). NaN classes are excluded via nanmean.
    """
    cm = np.asarray(cm, dtype=np.float64)
    pos = cm.sum(1)
    res = cm.sum(0)
    tp = np.diag(cm)
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = tp / (pos + res - tp)
    base = np.nanmean(iou[: n_base + 1])
    novel = np.nanmean(iou[n_base + 1 :]) if len(iou) > n_base + 1 else float("nan")
    total = np.nanmean(iou)
    return base, novel, total, iou
