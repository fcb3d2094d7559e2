"""Training-step tests: loss decrease, freezing, pseudo-labels, sharded DP."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import flax

from segland_tpu.models import build_model
from segland_tpu.models.pop import GFSSModel
from segland_tpu.train import (
    TrainState,
    create_optimizer,
    create_train_state,
    make_base_train_step,
    make_ft_train_step,
    poly_lr_schedule,
)
from segland_tpu.train.ft import ft_trainable, pseudo_label, init_cls_n
from segland_tpu.dist import make_mesh, shard_batch, replicate


def _tiny_pop_state(n_novel=0, is_ft=False, lr=1e-2, optimizer="adamw", **opt_kw):
    model = build_model("pspnet_pop", backbone="resnet10", n_base=7, n_novel=n_novel, is_ft=is_ft)
    img = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, train=False)
    tx = create_optimizer(
        variables["params"], base_lr=lr, num_epochs=10, steps_per_epoch=2,
        optimizer=optimizer, **opt_kw,
    )
    return model, create_train_state(model, variables, tx)


def test_poly_lr_per_epoch():
    sched = poly_lr_schedule(1e-3, num_epochs=200, steps_per_epoch=65, power=0.9)
    # within an epoch lr constant; epoch boundary drops it (reference per-epoch poly)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(64)) == pytest.approx(1e-3)
    want = 1e-3 * (1 - 1 / 200) ** 0.9
    # fp32 jnp.power carries ~10 ulp (~1e-6 rel) that varies with XLA
    # codegen context; 1e-5 rel is far tighter than LR precision matters
    assert float(sched(65)) == pytest.approx(want, rel=1e-5)


def test_param_labels():
    from segland_tpu.train.state import _param_labels

    model, state = _tiny_pop_state()
    labels = flax.traverse_util.flatten_dict(_param_labels(state.params))
    vals = set(labels.values())
    assert vals == {"backbone", "head_bias", "head_weight"}
    assert labels[("base_emb",)] == "head_weight"
    assert labels[("decoder", "bottleneck_bn", "bias")] == "head_bias"
    assert labels[("backbone", "conv1", "kernel")] == "backbone"


def test_base_train_step_loss_decreases():
    model, state = _tiny_pop_state(lr=1e-4)
    step = jax.jit(make_base_train_step(model))
    key = jax.random.PRNGKey(1)
    img = jax.random.normal(key, (2, 32, 32, 3))
    mask = jnp.full((2, 32, 32), 3, jnp.int32)  # learnable constant-class task
    losses = []
    for _ in range(8):
        state, ld, gn = step(state, img, mask)
        losses.append(float(ld["total_loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()
    assert float(gn) > 0


@pytest.mark.parametrize("n_dev", [2, pytest.param(8, marks=pytest.mark.slow)])
def test_base_train_step_sharded_over_mesh(n_dev):
    # NB: XLA's SPMD partitioner + CPU conv-grad codegen makes this compile
    # slowly on the host platform (~60s at 2 devices, ~200s at 8); it is
    # compile-time only and irrelevant on real TPU.
    # SGD: Adam's rescaling amplifies benign cross-device reassociation
    # (~1e-7 grad diffs -> sign-level update diffs), SGD keeps them ~1e-7.
    model, state = _tiny_pop_state(optimizer="sgd")
    mesh = make_mesh(n_dev)
    step = jax.jit(make_base_train_step(model))
    key = jax.random.PRNGKey(1)
    img = jax.random.normal(key, (n_dev, 32, 32, 3))
    mask = jax.random.randint(key, (n_dev, 32, 32), 0, 8)
    state_r = replicate(mesh, state)
    img_s, mask_s = shard_batch(mesh, (img, mask))
    state2, ld_sharded, _ = step(state_r, img_s, mask_s)
    state3, ld_local, _ = step(state, img, mask)
    # GSPMD-sharded step == single-device step (same math, XLA collectives)
    np.testing.assert_allclose(
        float(ld_sharded["total_loss"]), float(ld_local["total_loss"]), rtol=1e-4
    )
    a = jax.tree_util.tree_leaves(state2.params)[0]
    b = jax.tree_util.tree_leaves(state3.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_pseudo_label():
    mask_b = jnp.array([[[0, 1], [2, 0]]], jnp.int32)
    # novel head logits: bg, n1, n2 -> argmax picks n2 (idx 2) everywhere
    nl = jnp.zeros((1, 2, 2, 3)).at[..., 2].set(5.0)
    out = np.asarray(pseudo_label(mask_b, nl, n_base=7))
    # background (0) pixels -> 2 + 7 = 9; non-bg untouched
    assert out.tolist() == [[[9, 1], [2, 9]]]


def test_ft_step_freezes_base():
    model, state = _tiny_pop_state(
        n_novel=4, is_ft=True, optimizer="sgd", freeze_backbone=True,
        fix_lr=True, trainable_fn=ft_trainable, lr=1e-2,
    )
    state = state.replace(params=init_cls_n(state.params))
    # classifier_n now equals classifier
    np.testing.assert_array_equal(
        np.asarray(state.params["classifier"]["w1"]),
        np.asarray(state.params["classifier_n"]["w1"]),
    )
    step = jax.jit(make_ft_train_step(model, n_base=7))
    key = jax.random.PRNGKey(2)
    img = jax.random.normal(key, (1, 32, 32, 3))
    mask = jax.random.randint(key, (1, 32, 32), 8, 12).astype(jnp.int32)
    img_b = jax.random.normal(key, (1, 32, 32, 3))
    mask_b = jax.random.randint(key, (1, 32, 32), 0, 8).astype(jnp.int32)
    p0 = jax.tree_util.tree_map(np.asarray, state.params)
    bs0 = jax.tree_util.tree_map(np.asarray, state.batch_stats)
    state, ld, gn = step(state, img, mask, img_b, mask_b)
    # frozen: backbone, decoder, classifier, base_emb identical
    for k in ("backbone", "decoder", "classifier"):
        for a, b in zip(
            jax.tree_util.tree_leaves(p0[k]),
            jax.tree_util.tree_leaves(state.params[k]),
        ):
            np.testing.assert_array_equal(a, np.asarray(b))
    np.testing.assert_array_equal(p0["base_emb"], np.asarray(state.params["base_emb"]))
    # trainable: novel_emb and classifier_n moved
    assert not np.allclose(p0["novel_emb"], np.asarray(state.params["novel_emb"]))
    assert not np.allclose(p0["classifier_n"]["w1"], np.asarray(state.params["classifier_n"]["w1"]))
    # BN stats untouched (eval-mode forward)
    for a, b in zip(jax.tree_util.tree_leaves(bs0), jax.tree_util.tree_leaves(state.batch_stats)):
        np.testing.assert_array_equal(a, np.asarray(b))
    assert np.isfinite(float(ld["total_loss"]))


def test_plain_pspnet_ce_train_step():
    """CE (non-POP) train path: PlainPSPNet main+aux loss (reference
    train_base with model=pspnet, loss/__init__.py CELoss branch)."""
    model = build_model("pspnet", backbone="resnet10", n_base=7)
    img = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, train=True)
    tx = create_optimizer(variables["params"], 1e-4, 10, 2)
    state = create_train_state(model, variables, tx)
    step = jax.jit(make_base_train_step(model, loss_name="ce"))
    mask = jnp.full((2, 32, 32), 3, jnp.int32)
    state, ld, gn = step(state, img, mask)
    assert set(ld) == {"total_loss", "main_loss", "aux_loss"}
    np.testing.assert_allclose(
        float(ld["total_loss"]),
        float(ld["main_loss"]) + 0.4 * float(ld["aux_loss"]), rtol=1e-6)
    state2, ld2, _ = step(state, img, mask)
    assert float(ld2["total_loss"]) < float(ld["total_loss"])


def test_double_step_advances_twice():
    model, state = _tiny_pop_state(optimizer="sgd", lr=1e-3)
    img = jnp.zeros((1, 32, 32, 3), jnp.float32)
    mask = jnp.full((1, 32, 32), 2, jnp.int32)
    single = jax.jit(make_base_train_step(model))
    double = jax.jit(make_base_train_step(model, double_step=True))
    s1, _, _ = single(state, img, mask)
    s2, _, _ = double(state, img, mask)
    a = np.asarray(s1.params["base_emb"])
    b = np.asarray(s2.params["base_emb"])
    base = np.asarray(state.params["base_emb"])
    # SGD momentum 0.9: step1 = -lr*g, step2 = -lr*(g + 0.9*g) -> total 2.9x
    np.testing.assert_allclose(b - base, 2.9 * (a - base), rtol=1e-4, atol=1e-7)


def test_skip_nonfinite_guard():
    """Non-finite grads drop the whole update (reference GradScaler skip,
    train_base.py:258-261); healthy grads apply normally."""
    model, state = _tiny_pop_state(lr=1e-2)
    step = jax.jit(make_base_train_step(model, skip_nonfinite=True))
    mask = jnp.full((2, 32, 32), 3, jnp.int32)

    p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
    bad = jnp.full((2, 32, 32, 3), jnp.nan, jnp.float32)
    state2, ld, gn = step(state, bad, mask)
    assert float(ld["nonfinite_skipped"]) == 1.0
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(state2.params)[0]), np.asarray(p0))
    assert int(state2.step) == int(state.step)

    good = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
    state3, ld, gn = step(state2, good, mask)
    assert float(ld["nonfinite_skipped"]) == 0.0
    assert int(state3.step) == int(state2.step) + 1
    assert not np.allclose(
        np.asarray(jax.tree_util.tree_leaves(state3.params)[0]), np.asarray(p0))


# ---------------------------------------------------------------------------
# Every head family must base-train (reference train_base.py:184 supports
# every registry name).  Round-1 shipped a dropout-rng crash in swin_pop /
# lsk_pop because train tests never left resnet10 — this is the guard.

_FAMILY_BACKBONES = {
    "pspnet_pop": "resnet10",
    "pspplus_pop": "resnet10",
    "deeplab_pop": "resnet10",
    "swin_pop": "swin-t",
    "convnext_pop": "convnext-t",
    "lsk_pop": "lsk-t",
    "seghr_pop": "hr-w18",
    "vggunet_pop": "vgg16bn-unet",
}

_FAST_FAMILIES = ("swin_pop", "lsk_pop")  # the round-1 crashers stay in the fast suite


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(n, marks=() if n in _FAST_FAMILIES else (pytest.mark.slow,))
        for n in _FAMILY_BACKBONES
    ],
)
def test_base_train_step_every_family(name):
    model = build_model(name, backbone=_FAMILY_BACKBONES[name], n_base=7)
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    mask = jnp.full((1, 32, 32), 3, jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(7)},
        img, train=True)
    # lr 1e-4: at 1e-3 the x10 head groups overshoot the orth penalty on
    # some families within 3 steps (loss spike), which is optimization
    # noise, not the crash-regression this test guards
    tx = create_optimizer(variables["params"], 1e-4, 10, 2)
    state = create_train_state(model, variables, tx)
    step = jax.jit(make_base_train_step(model))
    losses = []
    for _ in range(5):
        state, ld, gn = step(state, img, mask)
        losses.append(float(ld["total_loss"]))
    assert np.isfinite(losses).all() and float(gn) > 0
    # BN-statistics churn makes the per-step loss non-monotone on a 1-image
    # batch; descent over the window is the crash/sign-regression guard
    assert min(losses[1:]) < losses[0]


def test_droppath_eval_identity_and_train_stochastic():
    """DropPath: identity at eval (parity tests / converted ckpts untouched);
    at train it consumes the dropout rng, drops whole per-sample branches,
    and preserves the expected value via 1/keep scaling."""
    from segland_tpu.models.backbones.droppath import DropPath, drop_path_rates

    rates = drop_path_rates(0.2, (2, 2, 6, 2))
    assert len(rates) == 12 and rates[0] == 0.0 and rates[-1] == pytest.approx(0.2)
    # linspace decay rule (reference lsknet.py:134)
    assert rates[6] == pytest.approx(0.2 * 6 / 11)
    # depth-1 edge: torch.linspace(0, rate, 1) == [0.0], not [rate]
    assert drop_path_rates(0.2, (1,)) == [0.0]

    dp = DropPath(0.5)
    x = jnp.ones((512, 4))
    # eval: exact identity, no rng needed
    y = dp.apply({}, x, train=False)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    # train: rows either dropped or scaled by 1/keep, mean ~ preserved
    y = dp.apply({}, x, train=True, rngs={"dropout": jax.random.PRNGKey(0)})
    y = np.asarray(y)
    rowvals = np.unique(y)
    assert set(np.round(rowvals, 5)) <= {0.0, 2.0}
    assert 0.8 < y.mean() < 1.2


def test_swin_lsk_droppath_wired():
    """Train-mode swin/lsknet forwards differ across dropout rngs (stochastic
    depth active) and eval-mode equals a drop_path_rate=0 model exactly."""
    from segland_tpu.models.backbones.swin import SwinTransformer
    from segland_tpu.models.backbones.lsknet import LSKNet

    for mk in (
        lambda r: SwinTransformer(depths=(1, 1), num_heads=(3, 6), embed_dim=24,
                                  drop_path_rate=r),
        lambda r: LSKNet(embed_dims=(8, 16), depths=(1, 1), mlp_ratios=(2, 2),
                         drop_path_rate=r),
    ):
        bb, bb0 = mk(0.5), mk(0.0)
        img = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 3))
        variables = bb.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            img, train=True)

        def fwd(module, rng_seed, train):
            kw = dict(rngs={"dropout": jax.random.PRNGKey(rng_seed)}) if train else {}
            out = module.apply(variables, img, train=train,
                               mutable=["batch_stats"], **kw)[0]
            return np.asarray(out[-1], np.float32)

        a, b = fwd(bb, 10, True), fwd(bb, 11, True)
        assert not np.allclose(a, b), type(bb).__name__
        np.testing.assert_array_equal(fwd(bb, 0, False), fwd(bb0, 0, False))


def test_swin_fused_train_step_runs():
    """--fused training path end-to-end: fused_mlp+fused_attn swin_pop with
    DropPath + dropout rng through make_base_train_step (CPU exact fallback);
    gradients reach the relative-position bias table (advisor finding)."""
    model = build_model("swin_pop", backbone="swin-t", n_base=7,
                        fused_mlp=True, fused_attn=True)
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    mask = jnp.full((1, 32, 32), 3, jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(7)},
        img, train=True)
    tx = create_optimizer(variables["params"], 1e-4, 10, 2)
    state = create_train_state(model, variables, tx)
    step = jax.jit(make_base_train_step(model))
    p0 = np.asarray(
        state.params["backbone"]["layers_0_blocks_0"]["attn"]["relative_position_bias_table"])
    state, ld, gn = step(state, img, mask)
    assert np.isfinite(float(ld["total_loss"])) and float(gn) > 0
    p1 = np.asarray(
        state.params["backbone"]["layers_0_blocks_0"]["attn"]["relative_position_bias_table"])
    assert not np.allclose(p0, p1), "bias table did not train under --fused"
