"""Model construction / forward-shape tests on tiny inputs."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from segland_tpu.models import build_model


def _init_and_run(model, img, train=False, method=None):
    variables = model.init(jax.random.PRNGKey(0), img, train=False)
    kw = dict(train=train)
    if train:
        out, _ = model.apply(variables, img, mutable=["batch_stats"], method=method, **kw)
    else:
        out = model.apply(variables, img, method=method, **kw)
    return out, variables


def test_pspnet_pop_base_shapes():
    model = build_model("pspnet_pop", backbone="resnet50", n_base=7)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    out, variables = _init_and_run(model, img)
    assert out.shape == (1, 8, 8, 8)  # stride 8, 1+7 classes
    # embeddings orthogonal at init
    emb = np.asarray(variables["params"]["base_emb"])
    gram = emb @ emb.T
    np.testing.assert_allclose(gram, np.eye(7), atol=1e-5)


def test_pspnet_pop_train_returns_proto_sim():
    from segland_tpu.models.pop import GFSSModel

    model = build_model("pspnet_pop", backbone="resnet50", n_base=7)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, train=False)
    (logits, sim), _ = model.apply(
        variables, img, train=True, mutable=["batch_stats"], method=GFSSModel.forward_base
    )
    assert logits.shape == (1, 8, 8, 8)
    assert sim.shape == (7, 7)


def test_pspnet_pop_ft_shapes():
    from segland_tpu.models.pop import GFSSModel

    model = build_model("pspnet_pop", backbone="resnet50", n_base=7, n_novel=4, is_ft=True)
    img = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, train=False)
    out = model.apply(variables, img, train=False)
    assert out.shape == (2, 8, 8, 12)  # 1 + 7 + 4
    logits, novel_logits, sim = model.apply(variables, img, method=GFSSModel.forward_novel)
    assert logits.shape == (2, 8, 8, 12)
    assert novel_logits.shape == (2, 8, 8, 5)
    assert sim.shape == (4, 11)


def test_pspnet_plain_shapes():
    model = build_model("pspnet", backbone="resnet50", n_base=7)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    # aux-head params only exist on the train path: init with train=True
    variables = model.init(jax.random.PRNGKey(0), img, train=True)
    out = model.apply(variables, img, train=False)
    assert out.shape == (1, 8, 8, 8)
    (main, aux), _ = model.apply(variables, img, train=True, mutable=["batch_stats"])
    assert main.shape == (1, 8, 8, 8)
    assert aux.shape == (1, 8, 8, 8)


def test_resnet_os8_stride():
    from segland_tpu.models.backbones import get_backbone

    bk = get_backbone("resnet50")
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = bk.init(jax.random.PRNGKey(0), img)
    out = bk.apply(variables, img)
    assert out.shape == (1, 8, 8, 2048)
    pyr = bk.apply(variables, img, return_list=True)
    assert [p.shape[-1] for p in pyr] == [2048, 1024, 512, 256]
    assert pyr[0].shape[1] == 8 and pyr[3].shape[1] == 16  # x4 dilated s8, x1 s4


def test_deeplab_pop_shapes():
    model = build_model("deeplab_pop", backbone="resnet50", n_base=7)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    out, _ = _init_and_run(model, img)
    assert out.shape == (1, 8, 8, 8)


def test_pspplus_pop_shapes():
    model = build_model("pspplus_pop", backbone="resnet50v2", n_base=7)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    out, _ = _init_and_run(model, img)
    assert out.shape == (1, 8, 8, 8)


def test_packed_train_routing():
    """build_model -> GFSSModel -> backbone packed_train routing (advisor r3):
    the knob must reach supported backbones and fail loudly elsewhere."""
    import pytest

    def backbone_of(m):
        # abstract init (no FLOPs) to satisfy setup's param declarations,
        # then bind the shape structs just to introspect submodules
        shapes = jax.eval_shape(
            lambda: m.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32),
                           train=False))
        return m.bind(shapes).backbone

    m = build_model("lsk_pop", backbone="lsk-t", packed_train=True)
    assert m.packed_train is True
    assert backbone_of(m).packed_train is True
    m = build_model("vggunet_pop", backbone="vgg16bn-unet", packed_train=False)
    assert backbone_of(m).packed_train is False
    m = build_model("seghr_pop", backbone="hr-w32", packed_train=True)
    assert backbone_of(m).packed_train is True

    # default None leaves each backbone's own measured default in place
    m = build_model("lsk_pop", backbone="lsk-t")
    assert backbone_of(m).packed_train is not None

    with pytest.raises(ValueError, match="packed_train"):
        build_model("pspnet", backbone="resnet50", packed_train=True)
    with pytest.raises(ValueError, match="packed_train"):
        backbone_of(build_model("pspnet_pop", backbone="resnet50",
                                packed_train=True))
    with pytest.raises(ValueError, match="packed_train"):
        backbone_of(build_model("swin_pop", backbone="swin-s",
                                packed_train=True))
