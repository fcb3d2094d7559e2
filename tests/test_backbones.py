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
