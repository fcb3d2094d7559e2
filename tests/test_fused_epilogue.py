"""Fused upsample+argmax eval epilogue (ops/fused_epilogue.py) vs an fp64
numpy bilinear-argmax oracle and the in-repo XLA path (ops/resize.py), on
the Pallas interpreter (CPU).  The eval protocol it fuses is the
reference's eval_base.py:168 fp32 upsample + argmax."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segland_tpu.ops.fused_epilogue import upsample_argmax, upsample_argmax_supported
from segland_tpu.ops.resize import resize_bilinear, _interp_matrix


def _np_ref(logits, oh, ow):
    """fp64 bilinear + argmax, and the top-2 gap (tie detector)."""
    mr = _interp_matrix(logits.shape[1], oh, True).astype(np.float64)
    mc = _interp_matrix(logits.shape[2], ow, True).astype(np.float64)
    x = np.einsum("bhwk,Hh->bHwk", logits.astype(np.float64), mr)
    x = np.einsum("bHwk,Ww->bHWk", x, mc)
    top2 = np.sort(x, axis=-1)[..., -2:]
    return np.argmax(x, -1).astype(np.uint8), top2[..., 1] - top2[..., 0]


@pytest.mark.parametrize("shape,out_hw", [
    ((2, 64, 128, 5), (256, 512)),     # x4 rows, x4 cols
    ((1, 32, 128, 12), (256, 1024)),   # x8 rows (ft class count)
    ((1, 256, 128, 3), (256, 256)),    # fr=1 row-identity edge
])
def test_fused_epilogue_matches_fp64_oracle(shape, out_hw):
    rng = np.random.RandomState(0)
    logits = rng.randn(*shape).astype(np.float32) * 10.0
    assert upsample_argmax_supported(shape, out_hw)
    pred = np.asarray(upsample_argmax(jnp.asarray(logits), out_hw))
    ref, gap = _np_ref(logits, *out_hw)
    # only exact decision-boundary pixels may differ (stage-A rounding order)
    bad = (pred != ref) & (gap > 1e-3)
    assert bad.sum() == 0
    # and vs the XLA path the Evaluator falls back to
    xla = np.asarray(jnp.argmax(resize_bilinear(
        jnp.asarray(logits, jnp.float32), out_hw, align_corners=True), -1))
    assert (((pred == xla) | (gap <= 1e-3)).all())


def test_supported_predicate():
    ok = upsample_argmax_supported
    assert ok((2, 256, 256, 8), (1024, 1024))
    assert not ok((2, 250, 256, 8), (1024, 1024))   # non-integer row factor
    assert not ok((2, 256, 100, 8), (1024, 1024))   # lane-unaligned w
    assert not ok((2, 256, 256, 8), (1000, 1024))   # oh not a _RB multiple
    assert not ok((2, 256, 256), (1024, 1024))      # not 4-D
    # scoped-VMEM gate: vggunet_pop's full-res logits (factor 1) request a
    # 75.5 MB whole-image block — must route to the XLA fallback, not OOM
    assert not ok((4, 1024, 1024, 8), (1024, 1024))
    assert not ok((8, 512, 512, 8), (1024, 1024))   # factor 2, 17 MB block
    assert ok((8, 128, 128, 12), (1024, 1024))      # eval_ft 12-class shape


def test_evaluator_postprocess_routes_fused_and_falls_back():
    """Evaluator._postprocess takes the fused path for supported mIoU-shape
    requests and the XLA path otherwise / when logits are wanted."""
    from segland_tpu.evallib.infer import Evaluator
    from segland_tpu.models import build_model

    model = build_model("pspnet_pop", backbone="resnet10", n_base=4)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)
    ev = Evaluator(model, v, num_classes=5, n_base=4, fused_epilogue=True)

    logits = jnp.asarray(np.random.RandomState(1).randn(1, 32, 128, 5), jnp.float32)
    # supported: fused path (interpret on CPU), logits suppressed
    lg, pred = ev._postprocess(logits, 256, 1024, want_logits=False)
    assert lg is None and pred.shape == (1, 256, 1024) and pred.dtype == jnp.uint8
    ref = jnp.argmax(resize_bilinear(logits, (256, 1024), align_corners=True), -1)
    assert np.mean(np.asarray(pred) != np.asarray(ref)) < 1e-4  # ties only
    # want_logits: XLA path with fp32 logits returned
    lg2, pred2 = ev._postprocess(logits, 256, 1024, want_logits=True)
    assert lg2 is not None and lg2.dtype == jnp.float32
    assert np.array_equal(np.asarray(pred2), np.asarray(ref))
    # unsupported output size: silent XLA fallback
    lg3, pred3 = ev._postprocess(logits, 100, 100, want_logits=False)
    assert lg3 is None and pred3.shape == (1, 100, 100)
