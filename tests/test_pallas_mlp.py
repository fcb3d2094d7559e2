"""Fused LN+MLP Pallas kernel (ops/pallas_mlp.py): interpret-mode numerics,
autodiff via the XLA-reference backward, fallback paths, and param-tree
compatibility of the fused_mlp model flag."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segland_tpu.ops.pallas_mlp import fused_ln_mlp, ln_mlp_reference


def _params(c, hid, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    return dict(
        gamma=jax.random.normal(ks[0], (c,)) * 0.1 + 1.0,
        beta=jax.random.normal(ks[1], (c,)) * 0.1,
        w1=jax.random.normal(ks[2], (c, hid)) * 0.05,
        b1=jax.random.normal(ks[3], (hid,)) * 0.05,
        w2=jax.random.normal(ks[4], (hid, c)) * 0.05,
        b2=jax.random.normal(ks[5], (c,)) * 0.05,
    )


def test_kernel_matches_reference_interpret():
    c, hid = 128, 512
    p = _params(c, hid)
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 8, 16, c), jnp.float32)
    res = jax.random.normal(jax.random.PRNGKey(10), x.shape)
    ls = jax.random.normal(jax.random.PRNGKey(11), (c,)) * 0.5

    ref = ln_mlp_reference(x.reshape(-1, c), res=res.reshape(-1, c), ls=ls, **p)
    out = fused_ln_mlp(x, res=res, ls=ls, interpret=True, **p)
    # kernel GELU uses the A&S erf polynomial (1.5e-7): tol 1e-5, not exact
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref).reshape(x.shape),
                               rtol=1e-5, atol=1e-5)

    # no-res/no-ls variant (swin)
    ref2 = ln_mlp_reference(x.reshape(-1, c), **p)
    out2 = fused_ln_mlp(x, interpret=True, **p)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2).reshape(x.shape),
                               rtol=1e-5, atol=1e-5)


def test_kernel_bf16_interpret():
    c, hid = 128, 256
    p = _params(c, hid)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 8, c)).astype(jnp.bfloat16)
    ref = ln_mlp_reference(x.reshape(-1, c), **p).astype(jnp.float32)
    out = fused_ln_mlp(x, interpret=True, **p).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref).reshape(x.shape),
                               rtol=0, atol=2e-2)


def test_gradients_match_reference():
    c, hid = 128, 256
    p = _params(c, hid)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 16, c), jnp.float32)

    def f_fused(w1, x_):
        q = dict(p, w1=w1)
        return fused_ln_mlp(x_, interpret=True, **q).sum()

    def f_ref(w1, x_):
        q = dict(p, w1=w1)
        return ln_mlp_reference(x_.reshape(-1, c), **q).sum()

    gw, gx = jax.grad(f_fused, argnums=(0, 1))(p["w1"], x)
    rw, rx = jax.grad(f_ref, argnums=(0, 1))(p["w1"], x)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx).reshape(x.shape),
                               rtol=1e-5, atol=1e-5)


def test_misaligned_shape_falls_back():
    c, hid = 128, 256
    p = _params(c, hid)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 7, 9, c), jnp.float32)
    out = fused_ln_mlp(x, interpret=True, **p)
    ref = ln_mlp_reference(x.reshape(-1, c), **p).reshape(x.shape)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("model,backbone", [("swin_pop", "swin-t"),
                                            ("convnext_pop", "convnext-t")])
def test_fused_mlp_model_flag_tree_and_numerics(model, backbone):
    """fused_mlp=True must keep the param tree byte-compatible (converted
    checkpoints) and, on CPU (XLA fallback), reproduce the unfused output."""
    from segland_tpu.models import build_model

    m0 = build_model(model, backbone=backbone, n_base=7)
    m1 = build_model(model, backbone=backbone, n_base=7, fused_mlp=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3), jnp.float32)
    v0 = m0.init(jax.random.PRNGKey(0), x, train=False)
    v1 = m1.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)
    assert (jax.tree_util.tree_map(lambda a: a.shape, v0)
            == jax.tree_util.tree_map(lambda a: a.shape, v1))
    o0 = m0.apply(v0, x, train=False)
    o1 = m1.apply(v0, x, train=False)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1), rtol=1e-5, atol=1e-5)


class TestAttnSection:
    """Fused attention-section kernel (ops/pallas_attn.swin_attn_section_fused)."""

    def _inputs(self, nw_img=4, b=2, n=49, c=64, nh=2, seed=0):
        # bias rows: callers slice [:1]; kept for region tests

        ks = jax.random.split(jax.random.PRNGKey(seed), 8)
        x = jax.random.normal(ks[0], (b * nw_img, n, c), jnp.float32)
        p = dict(
            gamma=jax.random.normal(ks[1], (c,)) * 0.1 + 1.0,
            beta=jax.random.normal(ks[2], (c,)) * 0.1,
            wqkv=jax.random.normal(ks[3], (c, 3 * c)) * 0.05,
            bqkv=jax.random.normal(ks[4], (3 * c,)) * 0.05,
            wproj=jax.random.normal(ks[5], (c, c)) * 0.05,
            bproj=jax.random.normal(ks[6], (c,)) * 0.05,
        )
        bias = jax.random.normal(ks[7], (nw_img, nh, n, n)) * 0.2
        return x, p, bias

    def test_matches_reference_interpret(self):
        from segland_tpu.ops.pallas_attn import (attn_section_reference,
                                                 swin_attn_section_fused)

        x, p, bias = self._inputs()
        bias = bias[:1]
        mask = jnp.ones((1, x.shape[1]))
        ref = attn_section_reference(x, mask, bias=bias, num_heads=2, **p)
        out = swin_attn_section_fused(x, mask, bias=bias, num_heads=2,
                                      interpret=True, **p)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_token_mask_and_regions(self):
        """Per-window pad masks (pad-after-norm emulation) and shift-region
        ids (in-kernel SW-MSA mask) must match the reference path."""
        from segland_tpu.ops.pallas_attn import (attn_section_reference,
                                                 swin_attn_section_fused)

        x, p, bias = self._inputs(nw_img=4, b=2, nh=2)
        bias = bias[:1]
        mask = (jax.random.uniform(jax.random.PRNGKey(9), (4, x.shape[1])) > 0.3
                ).astype(jnp.float32)
        regions = jnp.asarray(
            np.random.RandomState(3).randint(0, 3, (4, x.shape[1])), jnp.float32)
        ref = attn_section_reference(x, mask, bias=bias, num_heads=2,
                                     regions=regions, **p)
        out = swin_attn_section_fused(x, mask, bias=bias, num_heads=2,
                                      regions=regions, interpret=True, **p)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_gradients(self):
        from segland_tpu.ops.pallas_attn import (attn_section_reference,
                                                 swin_attn_section_fused)

        x, p, bias = self._inputs(nw_img=1, b=2)
        mask = jnp.ones((1, x.shape[1]))

        def f_fused(wqkv, x_):
            q = dict(p, wqkv=wqkv)
            return swin_attn_section_fused(x_, mask, bias=bias, num_heads=2,
                                           interpret=True, **q).sum()

        def f_ref(wqkv, x_):
            q = dict(p, wqkv=wqkv)
            return attn_section_reference(x_, mask, bias=bias, num_heads=2, **q).sum()

        gw, gx = jax.grad(f_fused, argnums=(0, 1))(p["wqkv"], x)
        rw, rx = jax.grad(f_ref, argnums=(0, 1))(p["wqkv"], x)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), rtol=1e-4, atol=1e-4)

    def test_bias_gradient_nonzero(self):
        """The relative-position bias is a trained parameter
        (reference swintransformer.py:94,115): the custom-vjp backward must
        return its true cotangent, not zeros (round-1 advisor finding)."""
        from segland_tpu.ops.pallas_attn import (attn_section_reference,
                                                 swin_attn_section_fused)

        x, p, bias = self._inputs(nw_img=1, b=2)
        mask = jnp.ones((1, x.shape[1]))

        def f_fused(b_):
            return swin_attn_section_fused(x, mask, bias=b_, num_heads=2,
                                           interpret=True, **p).sum()

        def f_ref(b_):
            return attn_section_reference(x, mask, bias=b_, num_heads=2, **p).sum()

        gb = jax.grad(f_fused)(bias)
        rb = jax.grad(f_ref)(bias)
        assert float(jnp.abs(rb).max()) > 0
        np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), rtol=1e-4, atol=1e-4)

    def test_swin_block_fused_attn_matches_unfused(self):
        """Whole SwinBlock with fused_attn (XLA fallback on CPU) == unfused,
        on a shape that needs padding AND with a shifted window."""
        from segland_tpu.models.backbones.swin import SwinBlock

        # 18x18: padding + 9 windows; 7x7: single window (broadcast regions)
        for hw in (18, 7):
            x = jax.random.normal(jax.random.PRNGKey(1), (1, hw, hw, 32), jnp.float32)
            self._check_block(x)

    def _check_block(self, x):
        from segland_tpu.models.backbones.swin import SwinBlock

        for shift in (0, 3):
            b0 = SwinBlock(32, 2, shift_size=shift)
            b1 = SwinBlock(32, 2, shift_size=shift, fused_attn=True)
            v0 = b0.init(jax.random.PRNGKey(0), x)
            v1 = b1.init(jax.random.PRNGKey(0), x)
            assert (jax.tree_util.tree_structure(v0)
                    == jax.tree_util.tree_structure(v1))
            o0 = b0.apply(v0, x)
            o1 = b1.apply(v0, x)
            np.testing.assert_allclose(np.asarray(o0), np.asarray(o1),
                                       rtol=2e-5, atol=2e-5)


def test_swin_block_fused_droppath_train_matches_unfused():
    """Train-mode SwinBlock with stochastic depth: the fused paths recover
    the residual branch as (out - shortcut) before applying DropPath; with
    the same dropout rng this must equal the unfused path exactly on the
    CPU fallback (both branches, attn and MLP)."""
    import jax
    from segland_tpu.models.backbones.swin import SwinBlock

    x = jax.random.normal(jax.random.PRNGKey(1), (4, 18, 18, 32), jnp.float32)
    for shift in (0, 3):
        b0 = SwinBlock(32, 2, shift_size=shift, drop_path=0.5)
        b1 = SwinBlock(32, 2, shift_size=shift, drop_path=0.5,
                       fused_attn=True, fused_mlp=True)
        v = b0.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(9)},
                    x, train=True)
        # same param tree names -> fused variant accepts the same variables?
        # fused param modules (LNParams/DenseParams/AttnParams) mirror the
        # unfused names, so v works for both.
        rngs = {"dropout": jax.random.PRNGKey(3)}
        y0 = b0.apply(v, x, train=True, rngs=rngs)
        y1 = b1.apply(v, x, train=True, rngs=rngs)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   rtol=2e-5, atol=2e-5)
        # stochastic: some samples' branches actually dropped
        y_eval = b0.apply(v, x, train=False)
        assert not np.allclose(np.asarray(y0), np.asarray(y_eval))


def test_swin_window_resident_eval_matches_unfused():
    """The window-resident serving path (fused_attn+fused_mlp, eval:
    partition once per stage, MLP in window layout, SW-MSA-only permutes —
    swin.py SwinBlock._win_resident) must reproduce the unfused spatial
    path on the CPU XLA fallback, with an identical param tree, including
    stages where window padding is live (28x28 -> 7x7/4x4 maps).  The path
    is an opt-in knob (measured slower on-chip, see swin.py) — enabled here
    via SEGLAND_SWIN_WR=1, read at trace time."""
    import os

    from segland_tpu.models.backbones.swin import SwinTransformer

    os.environ["SEGLAND_SWIN_WR"] = "1"
    try:
        _win_resident_case(SwinTransformer)
    finally:
        os.environ.pop("SEGLAND_SWIN_WR", None)


def _win_resident_case(SwinTransformer):
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 28, 28, 3), jnp.float32)
    ref_m = SwinTransformer(depths=(2, 2), num_heads=(2, 4), embed_dim=32)
    wr_m = SwinTransformer(depths=(2, 2), num_heads=(2, 4), embed_dim=32,
                           fused_attn=True, fused_mlp=True,
                           fused_attn_stages=None)
    v = ref_m.init(jax.random.PRNGKey(0), x)
    v_wr = wr_m.init(jax.random.PRNGKey(0), x, train=False)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v_wr))
    # train-mode init (spatial fused path) builds the same tree too
    v_tr = wr_m.init({"params": jax.random.PRNGKey(0),
                      "dropout": jax.random.PRNGKey(1)}, x, train=True)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v_tr))
    ref = ref_m.apply(v, x, train=False)
    outs = wr_m.apply(v, x, train=False)
    for o, r in zip(outs, ref):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=2e-5, atol=2e-5)


def test_swin_fused_attn_stage_gating_is_pure_dispatch():
    """fused_attn_stages gates WHERE the fused attention kernel runs, never
    WHAT is computed: the param tree is identical across gatings and (on the
    CPU XLA fallback, which is exact) so are the pyramid outputs."""
    from segland_tpu.models.backbones.swin import SwinTransformer

    x = jax.random.normal(jax.random.PRNGKey(2), (1, 28, 28, 3), jnp.float32)
    variants = [
        SwinTransformer(depths=(1, 1), num_heads=(2, 4), embed_dim=32,
                        fused_attn=False),
        SwinTransformer(depths=(1, 1), num_heads=(2, 4), embed_dim=32,
                        fused_attn=True, fused_attn_stages=None),
        SwinTransformer(depths=(1, 1), num_heads=(2, 4), embed_dim=32,
                        fused_attn=True, fused_attn_stages=(1,)),
    ]
    v = variants[0].init(jax.random.PRNGKey(0), x)
    ref = variants[0].apply(v, x)
    for m in variants[1:]:
        v2 = m.init(jax.random.PRNGKey(0), x)
        assert (jax.tree_util.tree_structure(v)
                == jax.tree_util.tree_structure(v2))
        outs = m.apply(v, x)
        for o, r in zip(outs, ref):
            np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                       rtol=2e-5, atol=2e-5)
