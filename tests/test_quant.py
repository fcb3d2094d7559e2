"""int8 PTQ: calibration, quantized forward accuracy, skip rules."""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest

from segland_tpu.quant import (
    QuantConfig, calibrate, quantized_apply, quant_interceptor,
)


def _leaf_paths(tree, prefix=()):
    import flax

    return set(flax.traverse_util.flatten_dict(tree).keys())


def test_calibrate_and_int8_forward_close():
    """pspnet_pop/resnet10: int8 logits track fp32 logits (argmax + cosine)."""
    from segland_tpu.models import build_model

    model = build_model("pspnet_pop", backbone="resnet10", n_base=7)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), img[:1], train=False)

    v_q = calibrate(model, variables, [img])
    assert "quant" in v_q
    # scales are positive scalars
    amaxes = jax.tree_util.tree_leaves(v_q["quant"])
    assert amaxes and all(a.shape == () and float(a) > 0 for a in amaxes)

    ref = model.apply(variables, img, train=False)
    out = quantized_apply(model)(v_q, img, train=False)
    assert out.shape == ref.shape and out.dtype == ref.dtype

    a = np.asarray(ref, np.float64).reshape(-1, ref.shape[-1])
    b = np.asarray(out, np.float64).reshape(-1, ref.shape[-1])
    cos = (a * b).sum(-1) / np.maximum(
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1), 1e-9)
    agree = (a.argmax(-1) == b.argmax(-1)).mean()
    assert cos.mean() > 0.98, cos.mean()
    assert agree > 0.90, agree


def test_calibration_running_max_and_param_tree_untouched():
    from segland_tpu.models import build_model

    model = build_model("pspnet_pop", backbone="resnet10", n_base=7)
    rng = np.random.RandomState(1)
    small = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32) * 0.1)
    big = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32) * 3.0)
    variables = model.init(jax.random.PRNGKey(0), small, train=False)

    v1 = calibrate(model, variables, [small])
    v2 = calibrate(model, v1, [big])
    a1 = np.array([float(x) for x in jax.tree_util.tree_leaves(v1["quant"])])
    a2 = np.array([float(x) for x in jax.tree_util.tree_leaves(v2["quant"])])
    assert (a2 >= a1 - 1e-6).all()  # running max only grows
    assert _leaf_paths(v2["params"]) == _leaf_paths(variables["params"])


class _SkipNet(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (3, 3), name="big")(x)            # quantized
        x = nn.Conv(64, (3, 3), feature_group_count=64, name="dw")(x)  # depthwise: skip
        x = nn.Conv(8, (1, 1), name="tiny_head")(x)       # <32 out: skip
        return x


def test_skip_rules_depthwise_and_tiny():
    net = _SkipNet()
    x = jnp.ones((1, 16, 16, 64))
    variables = net.init(jax.random.PRNGKey(0), x)
    v_q = calibrate(net, variables, [x])
    quantized = {p[0] for p in _leaf_paths(v_q["quant"])}
    assert quantized == {"big"}


class _MLP(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(128, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dense(64, name="fc2")(x)
        return x


def test_dense_quantization():
    net = _MLP()
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(4, 17, 64).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), x)
    v_q = calibrate(net, variables, [x])
    assert {p[0] for p in _leaf_paths(v_q["quant"])} == {"fc1", "fc2"}
    ref = np.asarray(net.apply(variables, x))
    out = np.asarray(quantized_apply(net)(v_q, x))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.05, rel


def test_int8_without_calibration_raises():
    net = _MLP()
    x = jnp.ones((1, 4, 64))
    variables = net.init(jax.random.PRNGKey(0), x)
    with pytest.raises(ValueError, match="calibrate"):
        quantized_apply(net)(variables, x)


def test_int8_sharded_eval_matches_single():
    """int8 inference composes with GSPMD batch sharding: an Evaluator over
    an 8-device mesh produces the same predictions as an unsharded one."""
    from segland_tpu.models import build_model
    from segland_tpu.evallib import Evaluator
    from segland_tpu.dist import make_mesh

    model = build_model("pspnet_pop", backbone="resnet10", n_base=7)
    rng = np.random.RandomState(5)
    img = rng.randn(8, 32, 32, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(img[:1]), train=False)

    ev1 = Evaluator(model, variables, num_classes=8, int8=True, calib_batches=1)
    _, pred1 = ev1.predict_batch(img, (32, 32))

    ev8 = Evaluator(model, variables, num_classes=8, mesh=make_mesh(8),
                    int8=True, calib_batches=1)
    _, pred8 = ev8.predict_batch(img, (32, 32))
    np.testing.assert_array_equal(np.asarray(pred1), np.asarray(pred8))


def test_int8_under_jit():
    net = _MLP()
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 8, 64).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), x)
    v_q = calibrate(net, variables, [x])
    f = jax.jit(lambda v, x: quantized_apply(net)(v, x))
    out = np.asarray(f(v_q, x))
    ref = np.asarray(quantized_apply(net)(v_q, x))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_percentile_calibration_outlier_robust():
    """With a huge activation outlier, percentile calibration preserves far
    more accuracy than absmax (the outlier stretches the absmax scale)."""
    net = _MLP()
    rng = np.random.RandomState(7)
    x = rng.randn(4, 32, 64).astype(np.float32)
    x[0, 0, 0] = 500.0  # single outlier
    x = jnp.asarray(x)
    variables = net.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(net.apply(variables, x))

    errs = {}
    for est in ("absmax", "percentile"):
        cfg = QuantConfig(act_estimator=est, percentile=99.9)
        v_q = calibrate(net, variables, [x], cfg=cfg)
        out = np.asarray(quantized_apply(net, cfg)(v_q, x))
        errs[est] = float(np.abs(out - ref)[1:].mean())  # rows w/o the outlier
    assert errs["percentile"] < errs["absmax"] * 0.5, errs


def test_fused_bottleneck_kernel_matches_reference():
    """ops/pallas_bottleneck.py kernel == its XLA reference (exact int8
    math) across dilations, edge zero-padding and last_relu variants."""
    import numpy as np
    from segland_tpu.ops.pallas_bottleneck import (bottleneck_int8_reference,
                                                   fused_bottleneck_int8)

    rng = np.random.RandomState(0)
    for (B, H, W, C, P, d, lr) in [(2, 16, 16, 64, 16, 1, True),
                                   (1, 32, 8, 128, 32, 2, False),
                                   (1, 16, 16, 64, 16, 4, True)]:
        x = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
        w1 = jnp.asarray(rng.randint(-127, 127, (C, P)), jnp.int8)
        w2 = jnp.asarray(rng.randint(-127, 127, (3, 3, P, P)), jnp.int8)
        w3 = jnp.asarray(rng.randint(-127, 127, (P, C)), jnp.int8)
        aff = lambda n: (jnp.asarray(rng.rand(n) * 1e-4 + 1e-5, jnp.float32),
                         jnp.asarray(rng.randn(n) * 0.1, jnp.float32))
        a1, b1 = aff(P); a2, b2 = aff(P); a3, b3 = aff(C)
        s = dict(s_x=0.05, s_h1=0.01, s_h2=0.01)
        ref = bottleneck_int8_reference(x, w1, w2, w3, a1, b1, a2, b2, a3, b3,
                                        dilation=d, last_relu=lr, **s)
        out = fused_bottleneck_int8(x, w1, w2, w3, a1, b1, a2, b2, a3, b3,
                                    dilation=d, last_relu=lr, interpret=True, **s)
        assert out is not None
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=0, atol=1e-3)


def test_fused_blocks_interceptor_path():
    """QuantConfig(fused_blocks=True) routes eligible Bottlenecks through
    the fused kernel and stays close to the per-conv int8 path."""
    import numpy as np
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent))
    from benchmarks.resnet_stage_probe import Stage
    from segland_tpu.quant import QuantConfig, calibrate, quantized_apply
    from segland_tpu.quant.ptq import build_fused_block_inputs

    mod = Stage(32, 2, 128, 1, 2)
    x = (jax.random.normal(jax.random.PRNGKey(1), (1, 32, 16, 128)) * 2
         ).astype(jnp.bfloat16)
    v = mod.init(jax.random.PRNGKey(0), x)
    vq = calibrate(mod, v, [x])
    fmap = build_fused_block_inputs(vq, QuantConfig(fused_blocks=True))
    assert sorted(fmap) == ["layer_0", "layer_1"]

    plain = np.asarray(quantized_apply(mod)(vq, x), np.float32)
    cfg = QuantConfig(fused_blocks=True, fused_interpret=True)
    fused = np.asarray(quantized_apply(mod, cfg)(vq, x), np.float32)
    scale = np.abs(plain).max()
    assert np.abs(plain - fused).max() < 0.05 * scale


def test_conv3_residual_kernel_matches_reference():
    """Round-4 conv3+residual epilogue kernel == the same math in XLA."""
    import numpy as np
    from segland_tpu.ops.pallas_bottleneck import conv3_residual_int8

    rng = np.random.RandomState(1)
    for (M, P, C, lr) in [(260, 32, 128, True), (96, 16, 64, False)]:
        h2q = jnp.asarray(rng.randint(-127, 128, (M, P)), jnp.int8)
        res = jnp.asarray(rng.randn(M, C), jnp.bfloat16)
        w3 = jnp.asarray(rng.randint(-127, 128, (P, C)), jnp.int8)
        a3 = jnp.asarray(rng.rand(C) * 1e-4 + 1e-5, jnp.float32)
        b3 = jnp.asarray(rng.randn(C) * 0.1, jnp.float32)
        acc = h2q.astype(jnp.int32) @ w3.astype(jnp.int32)
        ref = acc.astype(jnp.float32) * a3 + b3 + res.astype(jnp.float32)
        if lr:
            ref = jnp.maximum(ref, 0.0)
        ref = ref.astype(jnp.bfloat16)
        out = conv3_residual_int8(h2q, res, w3, a3, b3, last_relu=lr,
                                  interpret=True, mblk=64)
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=0, atol=1e-2)


def test_fused_conv3_interceptor_path():
    """QuantConfig(fused_conv3=True) routes eligible Bottlenecks through the
    conv3+residual kernel and stays close to the per-conv int8 path."""
    import numpy as np
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent))
    from benchmarks.resnet_stage_probe import Stage
    from segland_tpu.quant import QuantConfig, calibrate, quantized_apply

    mod = Stage(32, 2, 128, 1, 2)
    x = (jax.random.normal(jax.random.PRNGKey(1), (1, 32, 16, 128)) * 2
         ).astype(jnp.bfloat16)
    v = mod.init(jax.random.PRNGKey(0), x)
    vq = calibrate(mod, v, [x])

    plain = np.asarray(quantized_apply(mod)(vq, x), np.float32)
    cfg = QuantConfig(fused_conv3=True, fused_interpret=True)
    fused = np.asarray(quantized_apply(mod, cfg)(vq, x), np.float32)
    scale = np.abs(plain).max()
    assert np.abs(plain - fused).max() < 0.05 * scale
