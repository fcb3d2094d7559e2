"""Lane-packed LSK ops (ops/packed.py) and the packed LSKNet path.

fp32 packed results must match the standard formulation exactly (the
injected off-block weights are hard zeros and accumulation is fp32); the
parameter tree must be identical between packed and reference modes so
checkpoints and the torch converter are mode-agnostic.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from segland_tpu.ops import packed as pk
from segland_tpu.models.backbones.lsknet import LSKNet, LSKStageBlock


def _dw_ref(x, w, dil, groups):
    kh = w.shape[0]
    pad = dil * (kh // 2)
    return lax.conv_general_dilated(
        x, w, (1, 1), [(pad, pad)] * 2, rhs_dilation=(dil, dil),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=groups)


def test_pack_unpack_roundtrip():
    x = jnp.arange(2 * 4 * 8 * 32, dtype=jnp.float32).reshape(2, 4, 8, 32)
    assert pk.pack_k(32) == 4 and pk.pack_k(64, min_k=2) == 2
    assert pk.pack_k(64) == 1  # k=2 measured slower on the LSK blocks
    assert pk.pack_k(160) == 1 and pk.pack_k(96) == 1
    y = pk.unpack(pk.pack(x, 4), 4)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # packing is a pure reshape: packed row j*C..(j+1)*C holds pixel 4g+j
    p = pk.pack(x, 4)
    np.testing.assert_array_equal(np.asarray(p[0, 0, 0, 32:64]),
                                  np.asarray(x[0, 0, 1, :]))


def test_dw_conv_packed_exact_fp32():
    key = jax.random.PRNGKey(0)
    for c, k, kh, dil in ((32, 4, 5, 1), (32, 4, 7, 3), (64, 2, 5, 1), (64, 2, 7, 3)):
        x = jax.random.normal(key, (2, 16, 24, c), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(1), (kh, kh, 1, c), jnp.float32)
        b = jax.random.normal(jax.random.PRNGKey(2), (c,), jnp.float32)
        ref = _dw_ref(x, w, dil, c) + b
        got = pk.unpack(pk.dw_conv_packed(pk.pack(x, k), w, b, dil, k), k)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=1e-5)


def test_dense_conv_packed_exact_fp32():
    key = jax.random.PRNGKey(0)
    for ci, co, k in ((32, 32, 4), (32, 48, 4), (16, 32, 8)):
        x = jax.random.normal(key, (2, 12, 24, ci), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, ci, co), jnp.float32)
        b = jax.random.normal(jax.random.PRNGKey(2), (co,), jnp.float32)
        ref = lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        got = pk.unpack(pk.conv_packed(pk.pack(x, k), w, b, 1, k), k)
        # fp32 accumulation-order reassociation on |out|~80: ~4e-5
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=2e-4)


def test_hrnet_packed_matches_reference_path():
    """hr-w32 branch0 (C=32) runs the eval-only packed BasicBlock chain:
    identical variable tree and near-identical fp32 outputs (BN fold is a
    per-channel affine reassociation) vs packed=False."""
    from segland_tpu.models.backbones.hrnet import HighResolutionNet

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3), jnp.float32)
    m_pk = HighResolutionNet(packed=True)
    m_rf = HighResolutionNet(packed=False)
    v = m_pk.init(jax.random.PRNGKey(1), x, train=False)
    # perturb BN stats so the fold isn't trivially (x-0)/1
    v = jax.tree_util.tree_map(
        lambda a: a + 0.05 if a.ndim == 1 else a, v)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(
                m_rf.init(jax.random.PRNGKey(1), x, train=False)))
    outs_pk = m_pk.apply(v, x, train=False)
    outs_rf = m_rf.apply(v, x, train=False)
    for a, b in zip(outs_pk, outs_rf):
        # random-init magnitudes blow up to ~6e3 through the residual
        # chains; measured max rel diff at that scale is ~6e-7 (pure fp32
        # reassociation of the BN fold + band conv)
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=0,
                                   atol=1e-2 * max(1.0, float(np.abs(b).max()) / 1e3))
    # train mode must take the standard path (BN batch stats update)
    _, muts = m_pk.apply(v, x, train=True, mutable=["batch_stats"])
    assert "batch_stats" in muts


def test_hrnet_packed_train_matches_reference_path():
    """packed_train=True: train-mode outputs, running-stat updates, and
    gradients all match packed=False (exact batch stats from the packed
    layout; fp32 reassociation only)."""
    from segland_tpu.models.backbones.hrnet import HighResolutionNet

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3), jnp.float32)
    m_pk = HighResolutionNet(packed=True, packed_train=True)
    m_rf = HighResolutionNet(packed=False)
    v = m_pk.init(jax.random.PRNGKey(1), x, train=True)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(
                m_rf.init(jax.random.PRNGKey(1), x, train=True)))

    outs_pk, mut_pk = m_pk.apply(v, x, train=True, mutable=["batch_stats"])
    outs_rf, mut_rf = m_rf.apply(v, x, train=True, mutable=["batch_stats"])
    for a, b in zip(outs_pk, outs_rf):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            a, b, rtol=0, atol=2e-2 * max(1.0, float(np.abs(b).max()) / 1e3))
    # running-stat (momentum) updates agree for every BN
    flat_pk = jax.tree_util.tree_leaves_with_path(mut_pk["batch_stats"])
    flat_rf = dict(jax.tree_util.tree_leaves_with_path(mut_rf["batch_stats"]))
    assert flat_pk and len(flat_pk) == len(flat_rf)
    for kp, a in flat_pk:
        b = flat_rf[kp]
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0,
            atol=2e-2 * max(1.0, float(np.abs(np.asarray(b)).max()) / 1e3),
            err_msg=jax.tree_util.keystr(kp))

    # gradients through batch-stat normalization + band convs match
    def loss(m, p):
        outs, _ = m.apply({**v, "params": p}, x, train=True,
                          mutable=["batch_stats"])
        return sum((o.astype(jnp.float32) ** 2).mean() for o in outs)

    g_pk = jax.grad(lambda p: loss(m_pk, p))(v["params"])
    g_rf = jax.grad(lambda p: loss(m_rf, p))(v["params"])
    for (kp, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(g_pk),
                               jax.tree_util.tree_leaves_with_path(g_rf)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            a, b, rtol=0, atol=2e-2 * max(1.0, float(np.abs(b).max()) / 1e3),
            err_msg=jax.tree_util.keystr(kp))


def test_conv1x1_packed_exact_fp32():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 8, 16, 32), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (32, 48), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(2), (48,), jnp.float32)
    ref = x @ w + b
    got = pk.unpack(pk.conv1x1_packed(pk.pack(x, 4), w, b, 4), 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0, atol=1e-5)


def test_lsknet_packed_matches_reference_path():
    """Full backbone: packed=True == packed=False in fp32 (same params),
    and the parameter trees are identical (ckpt/converter mode-agnostic)."""
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3), jnp.float32)
    m_pk = LSKNet(depths=(1, 1, 1, 1), packed=True)
    m_rf = LSKNet(depths=(1, 1, 1, 1), packed=False)
    v = m_pk.init(jax.random.PRNGKey(1), x, train=False)
    tree_pk = jax.tree_util.tree_structure(v)
    tree_rf = jax.tree_util.tree_structure(m_rf.init(jax.random.PRNGKey(1), x, train=False))
    assert tree_pk == tree_rf
    outs_pk = m_pk.apply(v, x, train=False)
    outs_rf = m_rf.apply(v, x, train=False)
    for a, b in zip(outs_pk, outs_rf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-5)


def test_lsknet_packed_fallback_on_odd_width():
    """W not divisible by the pack factor -> reference path, same result."""
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 12, 28, 3), jnp.float32)
    m = LSKNet(depths=(1, 1, 1, 1), packed=True)
    v = m.init(jax.random.PRNGKey(1), x, train=False)
    outs = m.apply(v, x, train=False)  # stage0 W=7: 7 % 4 != 0
    assert all(bool(jnp.isfinite(o).all()) for o in outs)


def test_lsk_stage_block_packed_train_mode():
    """Packed path composes with dropout/droppath rngs at train=True."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 32), jnp.float32)
    blk = LSKStageBlock(32, 8.0, drop=0.1, drop_path=0.1, packed=True)
    v = blk.init({"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2),
                  "droppath": jax.random.PRNGKey(3)}, x, train=True)
    out, muts = blk.apply(
        v, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(4), "droppath": jax.random.PRNGKey(5)})
    assert bool(jnp.isfinite(out).all())
    # gradients flow through the packed reformulation to every conv param
    def loss(p):
        o, _ = blk.apply({**v, "params": p}, x, train=True, mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(4),
                               "droppath": jax.random.PRNGKey(5)})
        return (o.astype(jnp.float32) ** 2).mean()
    g = jax.grad(loss)(v["params"])
    leaves = jax.tree_util.tree_leaves_with_path(g)
    zero = [jax.tree_util.keystr(kp) for kp, l in leaves
            if not bool(jnp.any(jnp.abs(l) > 0))]
    assert not zero, f"zero gradients at: {zero}"


def test_vggunet_packed_matches_reference_path():
    """VGGUNet enc1 packed chain (eval-only): identical variable tree and
    fp32-exact outputs vs packed=False; train mode takes the plain path."""
    from segland_tpu.models.backbones.vggunet import VGGUNet

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3), jnp.float32)
    m_pk = VGGUNet(packed=True)
    m_rf = VGGUNet(packed=False)
    v = m_pk.init(jax.random.PRNGKey(1), x, train=False)
    v = jax.tree_util.tree_map(lambda a: a + 0.05 if a.ndim == 1 else a, v)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(
                m_rf.init(jax.random.PRNGKey(1), x, train=False)))
    a = np.asarray(m_pk.apply(v, x, train=False))
    b = np.asarray(m_rf.apply(v, x, train=False))
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-4)
    # odd width -> plain path (pack needs W % 2 == 0)
    xo = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 66, 3), jnp.float32)
    vo = m_pk.init(jax.random.PRNGKey(1), xo, train=False)
    assert m_pk.apply(vo, xo, train=False).shape == (1, 64, 66, 64)
    # train mode must take the standard path (BN batch stats update)
    _, muts = m_pk.apply(v, x, train=True, mutable=["batch_stats"])
    assert "batch_stats" in muts
