"""Shape tests for every backbone x head registry pair (slow: full compiles)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from segland_tpu.models import build_model
from segland_tpu.models.backbones import get_backbone


@pytest.mark.slow
@pytest.mark.parametrize("name,img,chans,first_hw", [
    ("swin-t", 56, [96, 192, 384, 768], 14),
    ("hr-w18", 64, [18, 36, 72, 144], 16),
    ("convnext-t", 64, [96, 192, 384, 768], 16),
    ("lsk-t", 64, [32, 64, 160, 256], 16),
])
def test_pyramid_backbone_shapes(name, img, chans, first_hw):
    bk = get_backbone(name)
    x = jnp.zeros((1, img, img, 3), jnp.float32)
    variables = bk.init(jax.random.PRNGKey(0), x)
    outs = bk.apply(variables, x)
    assert len(outs) == 4
    assert [o.shape[-1] for o in outs] == chans
    assert outs[0].shape[1] == first_hw
    # fine->coarse ordering: sizes halve (with ceil rounding on odd grids)
    for lvl in range(3):
        assert outs[lvl + 1].shape[1] == -(-outs[lvl].shape[1] // 2)


@pytest.mark.slow
def test_vggunet_shapes():
    bk = get_backbone("vgg16bn-unet")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = bk.init(jax.random.PRNGKey(0), x)
    out = bk.apply(variables, x)
    assert out.shape == (1, 64, 64, 64)  # full-res 64ch


@pytest.mark.slow
@pytest.mark.parametrize("model,backbone,size,feat_stride", [
    ("swin_pop", "swin-t", 64, 4),
    ("seghr_pop", "hr-w18", 64, 4),
    ("convnext_pop", "convnext-t", 64, 4),
    ("lsk_pop", "lsk-t", 64, 4),
    ("vggunet_pop", None, 32, 1),
])
def test_pop_heads_all_backbones(model, backbone, size, feat_stride):
    m = build_model(model, backbone=backbone, n_base=7)
    img = jnp.zeros((1, size, size, 3), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), img, train=False)
    out = m.apply(variables, img, train=False)
    assert out.shape == (1, size // feat_stride, size // feat_stride, 8)
    # ft variant builds and runs too
    m_ft = build_model(model, backbone=backbone, n_base=7, n_novel=4, is_ft=True)
    variables = m_ft.init(jax.random.PRNGKey(0), img, train=False)
    out = m_ft.apply(variables, img, train=False)
    assert out.shape == (1, size // feat_stride, size // feat_stride, 12)


@pytest.mark.parametrize("name,kw", [
    ("vgg16bn-unet", {}),
    ("lsk-t", {}),
    ("hr-w18", {}),
])
def test_packed_train_forward_matches_unpacked(name, kw):
    """packed_train=True must run AND match the unpacked train forward in
    fp32 (the band-conv off-block weights are hard zeros; batch stats reduce
    identically over the packed layout).  Regression: the vggunet packed
    train path double-tiled the conv bias and crashed at init (round 4).

    Tolerance: per-layer packed-vs-unpacked deltas are ~1e-6 fp32 (measured:
    conv exact, batch mean/var 1.3e-7, folded-affine form 1e-6), but the
    fast-variance cancellation (E[y^2]-E[y]^2) re-amplifies them at every
    BN, so deep nets carry ~1e-3-class output deltas (vggunet: 18 conv+BN
    layers after the packed enc1)."""
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 3), jnp.float32)
    outs = {}
    for pt in (False, True):
        bk = get_backbone(name, packed_train=pt, **kw)
        rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
        v = bk.init(rngs, x, train=True)
        y, _ = bk.apply(v, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)},
                        mutable=["batch_stats"])
        outs[pt] = [np.asarray(o, np.float32) for o in jax.tree_util.tree_leaves(y)]
    for a, b in zip(outs[False], outs[True]):
        np.testing.assert_allclose(a, b, rtol=0, atol=3e-3)
