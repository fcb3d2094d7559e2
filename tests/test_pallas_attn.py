"""Fused Pallas window attention == pure-XLA reference (interpret mode)."""

import numpy as np
import pytest
import jax.numpy as jnp

from segland_tpu.ops.pallas_attn import window_attention_fused, window_attention_reference


@pytest.mark.parametrize("nw_img,b", [(1, 4), (4, 2)])
def test_window_attention_fused_matches_reference(rng, nw_img, b):
    n, c, nh = 49, 32, 4
    nw = nw_img * b if nw_img > 1 else 4
    qkv = rng.randn(nw, n, 3 * c).astype(np.float32)
    bias = (rng.randn(nw_img, nh, n, n) * 0.1).astype(np.float32)
    want = np.asarray(window_attention_reference(jnp.asarray(qkv), jnp.asarray(bias), nh))
    got = np.asarray(window_attention_fused(jnp.asarray(qkv), jnp.asarray(bias), nh, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_window_attention_fused_with_shift_mask(rng):
    """Masked (shifted) case: -100 mask entries must zero attention weights."""
    n, c, nh, nw_img, b = 49, 16, 2, 4, 2
    qkv = rng.randn(nw_img * b, n, 3 * c).astype(np.float32)
    mask = np.zeros((nw_img, nh, n, n), np.float32)
    mask[1, :, :, 20:] = -100.0  # window 1 can't attend to tokens >= 20
    want = np.asarray(window_attention_reference(jnp.asarray(qkv), jnp.asarray(mask), nh))
    got = np.asarray(window_attention_fused(jnp.asarray(qkv), jnp.asarray(mask), nh, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_attn_section_group_matches_ungrouped(rng):
    """Super-window grouping (block-diagonal bias over g fused windows) is
    exact vs group=1, including non-multiple window counts, shift regions,
    and the wblk=1 regime (large super-windows force one window per grid
    step — regression for the row3 index map pinning per-window regions to
    block 0 when wblk == 1)."""
    import jax

    from segland_tpu.ops.pallas_attn import (attn_section_reference,
                                             swin_attn_section_fused)

    n, c, nh, nw = 49, 32, 4, 18
    x = jnp.asarray(rng.randn(nw, n, c).astype(np.float32) * 0.2)
    p = dict(
        gamma=jnp.asarray(rng.rand(c).astype(np.float32) + 0.5),
        beta=jnp.asarray(rng.randn(c).astype(np.float32) * 0.1),
        wqkv=jnp.asarray(rng.randn(c, 3 * c).astype(np.float32) * 0.1),
        bqkv=jnp.asarray(rng.randn(3 * c).astype(np.float32) * 0.1),
        wproj=jnp.asarray(rng.randn(c, c).astype(np.float32) * 0.1),
        bproj=jnp.asarray(rng.randn(c).astype(np.float32) * 0.1),
    )
    bias = jnp.asarray(rng.randn(1, nh, n, n).astype(np.float32) * 0.3)
    mask = jnp.ones((1, n), jnp.float32)
    regions = jnp.asarray(rng.randint(0, 4, (nw, n)).astype(np.float32))
    ref = attn_section_reference(x, mask, bias=bias, num_heads=nh,
                                 regions=regions, **p)
    for g in (1, 2, 8):  # g=8 -> 448-token super-windows -> wblk=1, grid>1
        out = swin_attn_section_fused(x, mask, bias=bias, num_heads=nh,
                                      regions=regions, interpret=True,
                                      group=g, **p)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5, err_msg=f"group={g}")
    # gradient path must stay intact (reference-vjp backward, bias included)
    f = lambda xw, b: swin_attn_section_fused(
        xw, mask, bias=b, num_heads=nh, regions=regions, interpret=True,
        group=2, **p).sum()
    gx, gb = jax.grad(f, argnums=(0, 1))(x, bias)
    assert bool(jnp.isfinite(gx).all()) and float(jnp.abs(gb).max()) > 0


def test_attn_section_v2_geom_matches_reference(rng):
    """Production v2 kernel (geom= index-math masks + head-grouping) ==
    XLA reference on real swin geometry with pad tokens, for both W-MSA
    and SW-MSA (shift wraparound), several hg, and the grad path."""
    import jax

    from segland_tpu.models.backbones.swin import (_pad_token_mask,
                                                   _shift_regions)
    from segland_tpu.ops.pallas_attn import (attn_section_reference,
                                             swin_attn_section_fused)

    h = w = 26          # hp = 28 -> 16 windows, pad row/col tokens
    ws, n, c, nh = 7, 49, 48, 4
    hp = wp = 28
    nw = (hp // ws) ** 2
    x = jnp.asarray(rng.randn(nw, n, c).astype(np.float32) * 0.2)
    p = dict(
        gamma=jnp.asarray(rng.rand(c).astype(np.float32) + 0.5),
        beta=jnp.asarray(rng.randn(c).astype(np.float32) * 0.1),
        wqkv=jnp.asarray(rng.randn(c, 3 * c).astype(np.float32) * 0.1),
        bqkv=jnp.asarray(rng.randn(3 * c).astype(np.float32) * 0.1),
        wproj=jnp.asarray(rng.randn(c, c).astype(np.float32) * 0.1),
        bproj=jnp.asarray(rng.randn(c).astype(np.float32) * 0.1),
    )
    bias = jnp.asarray(rng.randn(1, nh, n, n).astype(np.float32) * 0.3)
    for shift in (0, ws // 2):
        mask = jnp.asarray(_pad_token_mask(h, w, hp, wp, ws, shift))
        regions = (jnp.asarray(_shift_regions(hp, wp, ws, shift))
                   if shift else None)
        ref = attn_section_reference(x, mask, bias=bias, num_heads=nh,
                                     regions=regions, **p)
        for hg in (None, 1, 2, 4):
            out = swin_attn_section_fused(
                x, mask, bias=bias, num_heads=nh, regions=regions,
                interpret=True, geom=(h, w, hp, wp, ws, shift), hg=hg, **p)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=2e-5, atol=2e-5)

    # grad path (reference-vjp backward) stays wired with geom set
    def loss(wqkv):
        out = swin_attn_section_fused(
            x, jnp.asarray(_pad_token_mask(h, w, hp, wp, ws, 3)),
            p["gamma"], p["beta"], wqkv, p["bqkv"], p["wproj"], p["bproj"],
            bias, nh, regions=jnp.asarray(_shift_regions(hp, wp, ws, 3)),
            interpret=True, geom=(h, w, hp, wp, ws, 3))
        return (out ** 2).mean()

    g = jax.grad(loss)(p["wqkv"])
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).max() > 0


def test_swin_block_fused_matches_reference(rng):
    """Round-5 whole-block kernel (attention section + MLP in one Pallas
    call) == the XLA reference chain on real swin geometry with pad tokens,
    for W-MSA and SW-MSA, plus the grad path (reference-vjp backward)."""
    import jax

    from segland_tpu.models.backbones.swin import (_pad_token_mask,
                                                   _shift_regions)
    from segland_tpu.ops.pallas_attn import block_reference, swin_block_fused

    h = w = 26          # hp = 28 -> 16 windows, pad row/col tokens
    ws, n, c, nh = 7, 49, 48, 4
    hp = wp = 28
    nw = (hp // ws) ** 2
    hid = 4 * c
    x = jnp.asarray(rng.randn(nw, n, c).astype(np.float32) * 0.2)
    p = dict(
        gamma=jnp.asarray(rng.rand(c).astype(np.float32) + 0.5),
        beta=jnp.asarray(rng.randn(c).astype(np.float32) * 0.1),
        wqkv=jnp.asarray(rng.randn(c, 3 * c).astype(np.float32) * 0.1),
        bqkv=jnp.asarray(rng.randn(3 * c).astype(np.float32) * 0.1),
        wproj=jnp.asarray(rng.randn(c, c).astype(np.float32) * 0.1),
        bproj=jnp.asarray(rng.randn(c).astype(np.float32) * 0.1),
        gamma2=jnp.asarray(rng.rand(c).astype(np.float32) + 0.5),
        beta2=jnp.asarray(rng.randn(c).astype(np.float32) * 0.1),
        w1=jnp.asarray(rng.randn(c, hid).astype(np.float32) * 0.1),
        b1=jnp.asarray(rng.randn(hid).astype(np.float32) * 0.1),
        w2=jnp.asarray(rng.randn(hid, c).astype(np.float32) * 0.1),
        b2=jnp.asarray(rng.randn(c).astype(np.float32) * 0.1),
    )
    bias = jnp.asarray(rng.randn(1, nh, n, n).astype(np.float32) * 0.3)
    for shift in (0, ws // 2):
        mask = jnp.asarray(_pad_token_mask(h, w, hp, wp, ws, shift))
        regions = (jnp.asarray(_shift_regions(hp, wp, ws, shift))
                   if shift else None)
        ref = block_reference(x, mask, bias=bias, num_heads=nh,
                              regions=regions, **p)
        for hg in (None, 2):
            out = swin_block_fused(
                x, mask, bias=bias, num_heads=nh, regions=regions,
                interpret=True, geom=(h, w, hp, wp, ws, shift), hg=hg, **p)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=2e-5, atol=2e-5,
                                       err_msg=f"shift={shift} hg={hg}")

    # grad path: MLP params must receive nonzero cotangents too
    def loss(w1, wqkv):
        q = dict(p); q["w1"] = w1; q["wqkv"] = wqkv
        out = swin_block_fused(
            x, jnp.asarray(_pad_token_mask(h, w, hp, wp, ws, 3)),
            bias=bias, num_heads=nh,
            regions=jnp.asarray(_shift_regions(hp, wp, ws, 3)),
            interpret=True, geom=(h, w, hp, wp, ws, 3), **q)
        return (out ** 2).mean()

    g1, g2 = jax.grad(loss, argnums=(0, 1))(p["w1"], p["wqkv"])
    for g in (g1, g2):
        assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).max() > 0


def test_swin_backbone_fused_block_stages_match(rng):
    """SwinTransformer with fused_block_stages engaged (interpret kernels)
    == the two-kernel fused path on a padded input size, all 4 pyramid
    levels.  Param trees must be identical (same checkpoint loads both)."""
    import jax

    from segland_tpu.models.backbones.swin import SwinTransformer

    kw = dict(depths=(2, 2), num_heads=(2, 4), embed_dim=32,
              fused_mlp=True, fused_attn=True, drop_path_rate=0.0)
    m_two = SwinTransformer(**kw)
    m_blk = SwinTransformer(fused_block_stages=(0, 1), **kw)
    x = jnp.asarray(rng.randn(1, 30, 30, 3).astype(np.float32))

    import os as _os
    _os.environ["SEGLAND_PALLAS_INTERPRET"] = "1"
    try:
        v = m_two.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
            m_blk.init(jax.random.PRNGKey(0), x))
        outs_two = m_two.apply(v, x)
        outs_blk = m_blk.apply(v, x)
    finally:
        del _os.environ["SEGLAND_PALLAS_INTERPRET"]
    for a, b in zip(outs_two, outs_blk):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
