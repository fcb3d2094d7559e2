"""Golden-value tests for core ops vs torch (CPU) semantics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from segland_tpu.ops import (
    resize_bilinear,
    resize_nearest,
    adaptive_avg_pool,
    max_pool_3x3_s2,
    l2_normalize,
    orthogonal_decompose,
    pop_logits_base,
    pop_logits_all,
    classifier_apply,
    proto_similarity,
)


def _nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def _to_nhwc(t):
    return np.transpose(t.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("shape,out", [((2, 13, 17, 3), (29, 31)), ((1, 32, 32, 4), (8, 8)), ((2, 7, 7, 2), (7, 7))])
def test_resize_bilinear_matches_torch(rng, align, shape, out):
    x = rng.randn(*shape).astype(np.float32)
    want = _to_nhwc(F.interpolate(_nchw(x), size=out, mode="bilinear", align_corners=align))
    got = np.asarray(resize_bilinear(jnp.asarray(x), out, align_corners=align))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_resize_nearest_matches_torch(rng):
    x = rng.randn(2, 10, 14, 3).astype(np.float32)
    want = _to_nhwc(F.interpolate(_nchw(x), size=(23, 9), mode="nearest"))
    got = np.asarray(resize_nearest(jnp.asarray(x), (23, 9)))
    np.testing.assert_allclose(got, want)


@pytest.mark.parametrize("hw,s", [((128, 128), 6), ((128, 128), 3), ((96, 96), 6), ((17, 19), 2), ((13, 13), 1)])
def test_adaptive_avg_pool_matches_torch(rng, hw, s):
    x = rng.randn(2, hw[0], hw[1], 5).astype(np.float32)
    want = _to_nhwc(F.adaptive_avg_pool2d(_nchw(x), s))
    got = np.asarray(adaptive_avg_pool(jnp.asarray(x), s))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("hw", [(16, 16), (17, 23)])
def test_max_pool_matches_torch(rng, hw):
    x = rng.randn(2, hw[0], hw[1], 3).astype(np.float32)
    want = _to_nhwc(F.max_pool2d(_nchw(x), kernel_size=3, stride=2, padding=1))
    got = np.asarray(max_pool_3x3_s2(jnp.asarray(x)))
    np.testing.assert_allclose(got, want)


def test_l2_normalize_matches_torch(rng):
    x = rng.randn(4, 16).astype(np.float32)
    want = F.normalize(torch.from_numpy(x), p=2, dim=-1).numpy()
    got = np.asarray(l2_normalize(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def _torch_decompose(feats_bnc, emb_b, emb_n=None):
    """Reference orthogonal_decompose semantics (pspnet_pop.py:95-121),
    computed with torch on [B,C,N] layout for golden values."""
    q = torch.from_numpy(np.transpose(feats_bnc, (0, 2, 1)))  # [B,C,N]
    s1 = F.normalize(torch.from_numpy(emb_b)[None], p=2, dim=-1)  # [1,K,C]
    proj1 = torch.matmul(s1, q)  # [B,K,N]
    fg_b = proj1.unsqueeze(2) * s1.unsqueeze(-1)  # [B,K,C,N]
    bg = q - fg_b.sum(1)
    if emb_n is None:
        return fg_b.numpy(), bg.numpy()
    s2 = F.normalize(torch.from_numpy(emb_n)[None], p=2, dim=-1)
    proj2 = torch.matmul(s2, q)
    fg_n = proj2.unsqueeze(2) * s2.unsqueeze(-1)
    bg = bg - fg_n.sum(1)
    return fg_b.numpy(), fg_n.numpy(), bg.numpy()


def test_orthogonal_decompose_matches_reference(rng):
    feats = rng.randn(2, 12, 16).astype(np.float32)  # [B,N,C]
    emb = rng.randn(5, 16).astype(np.float32)
    fg_t, bg_t = _torch_decompose(feats, emb)
    fg, bg = orthogonal_decompose(jnp.asarray(feats), jnp.asarray(emb))
    np.testing.assert_allclose(np.transpose(np.asarray(fg), (0, 1, 3, 2)), fg_t, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.transpose(np.asarray(bg), (0, 2, 1)), bg_t, rtol=1e-5, atol=1e-5)


def _torch_classifier(x_bcn_like, w1, w2, w3):
    """Reference 3x 1x1-conv bias-free classifier on [M,C,h,w]."""
    h = F.relu(F.conv2d(x_bcn_like, torch.from_numpy(w1.T[:, :, None, None])))
    h = F.relu(F.conv2d(h, torch.from_numpy(w2.T[:, :, None, None])))
    return F.conv2d(h, torch.from_numpy(w3[None, :, None, None]))


def test_pop_logits_base_matches_naive(rng):
    """Fused rank-1 classifier collapse == materializing reference pipeline."""
    B, h, w, C, K = 2, 6, 5, 16, 7
    feats = rng.randn(B, h, w, C).astype(np.float32)
    emb = rng.randn(K, C).astype(np.float32)
    w1 = (rng.randn(C, C) / np.sqrt(C)).astype(np.float32)
    w2 = (rng.randn(C, C) / np.sqrt(C)).astype(np.float32)
    w3 = (rng.randn(C) / np.sqrt(C)).astype(np.float32)

    got = np.asarray(pop_logits_base(jnp.asarray(feats), jnp.asarray(emb), jnp.asarray(w1), jnp.asarray(w2), jnp.asarray(w3)))

    # torch golden: decompose -> [B*(K+1),C,h,w] -> classifier -> [B,K+1,h,w]
    fg_t, bg_t = _torch_decompose(feats.reshape(B, h * w, C), emb)
    comps = np.concatenate([bg_t[:, None], fg_t], axis=1)  # [B,1+K,C,N]
    comps = torch.from_numpy(comps.reshape(B * (K + 1), C, h, w))
    preds = _torch_classifier(comps, w1, w2, w3).reshape(B, K + 1, h, w).numpy()
    want = np.transpose(preds, (0, 2, 3, 1))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pop_logits_all_matches_naive(rng):
    B, h, w, C, Kb, Kn = 2, 4, 5, 16, 7, 4
    feats = rng.randn(B, h, w, C).astype(np.float32)
    emb_b = rng.randn(Kb, C).astype(np.float32)
    emb_n = rng.randn(Kn, C).astype(np.float32)
    wb = [(rng.randn(C, C) / 4).astype(np.float32), (rng.randn(C, C) / 4).astype(np.float32), (rng.randn(C) / 4).astype(np.float32)]
    wn = [(rng.randn(C, C) / 4).astype(np.float32), (rng.randn(C, C) / 4).astype(np.float32), (rng.randn(C) / 4).astype(np.float32)]

    got, got_novel = pop_logits_all(jnp.asarray(feats), jnp.asarray(emb_b), jnp.asarray(emb_n), tuple(map(jnp.asarray, wb)), tuple(map(jnp.asarray, wn)))
    got, got_novel = np.asarray(got), np.asarray(got_novel)

    fg_b, fg_n, bg = _torch_decompose(feats.reshape(B, h * w, C), emb_b, emb_n)
    fg_b_t = torch.from_numpy(fg_b.reshape(B * Kb, C, h, w))
    preds1 = _torch_classifier(fg_b_t, *wb).reshape(B, Kb, h, w).numpy()
    feats_n = np.concatenate([bg[:, None], fg_n], axis=1).reshape(B * (1 + Kn), C, h, w)
    preds2 = _torch_classifier(torch.from_numpy(feats_n), *wn).reshape(B, 1 + Kn, h, w).numpy()
    want = np.concatenate([preds2[:, :1], preds1, preds2[:, 1:]], axis=1)
    np.testing.assert_allclose(got, np.transpose(want, (0, 2, 3, 1)), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got_novel, np.transpose(preds2, (0, 2, 3, 1)), rtol=1e-4, atol=1e-4)


def test_proto_similarity(rng):
    eb = rng.randn(7, 16).astype(np.float32)
    en = rng.randn(4, 16).astype(np.float32)
    sb = F.normalize(torch.from_numpy(eb), p=2, dim=-1)
    sn = F.normalize(torch.from_numpy(en), p=2, dim=-1)
    want_base = (sb @ sb.T).numpy()
    np.testing.assert_allclose(np.asarray(proto_similarity(jnp.asarray(eb))), want_base, rtol=1e-5, atol=1e-6)
    want_ft = (sn @ torch.cat([sn, sb], 0).T).numpy()
    np.testing.assert_allclose(np.asarray(proto_similarity(jnp.asarray(en), jnp.asarray(eb))), want_ft, rtol=1e-5, atol=1e-6)


def test_s2d_conv_matches_lax_conv():
    """ops/stem.py space-to-depth stem rewrite is exact for every backbone
    stem geometry (swin/convnext 4x4s4, resnet 7x7s2 p3, lsk 7x7s4 p3,
    hrnet/deep-stem 3x3s2 p1, incl. odd input sizes)."""
    import jax
    from segland_tpu.ops.stem import s2d_conv

    def ref(x, w, s, p):
        pl_, pr_ = (p, p) if isinstance(p, int) else p
        return jax.lax.conv_general_dilated(
            x, w, (s, s), [(pl_, pr_), (pl_, pr_)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    cases = [((2, 64, 64, 3), (4, 4, 3, 96), 4, 0),
             ((2, 66, 70, 3), (7, 7, 3, 64), 2, 3),
             ((2, 64, 64, 3), (7, 7, 3, 32), 4, 3),
             ((1, 33, 47, 3), (3, 3, 3, 64), 2, 1)]
    for xs, ws, s, p in cases:
        x = jnp.asarray(np.random.RandomState(0).randn(*xs), jnp.float32)
        w = jnp.asarray(np.random.RandomState(1).randn(*ws) * 0.1, jnp.float32)
        r = ref(x, w, s, p)
        o = s2d_conv(x, w, s, p)
        assert o.shape == r.shape
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), rtol=1e-4, atol=1e-5)
