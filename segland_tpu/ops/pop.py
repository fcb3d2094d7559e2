"""POP — Projection onto Orthogonal Prototypes — core compute.

The reference decomposes decoder features into per-class rank-1 components
``p_k * s_k`` plus a background residual, then runs a shared 3-layer 1x1-conv
classifier over each of the (K+1) component maps (reference
networks/pspnet_pop.py:95-121,162-189), materializing a [B,K,C,N] tensor
(~1.8 GiB fp32 at bs8/1024^2) and paying (K+1) full classifier passes.

TPU-native reformulation (exact, not approximate): every classifier conv is
bias-free (networks/pspnet_pop.py:46-52), and ReLU is positively homogeneous
— relu(a*v) = max(a,0)*relu(v) + max(-a,0)*relu(-v), with exactly one branch
active.  Pushing the scalar projection p through the whole classifier gives

    logit_k(x) = max(p_k,0) * alpha_k + max(-p_k,0) * beta_k

where (alpha_k, beta_k) are per-class scalars computed once from the
prototype and the classifier weights.  The [B,K,C,N] tensor never exists and
the classifier runs exactly once (on the background residual).  Gradients
flow through the same expression, so training matches the reference's math.

All functions here are pure and run in fp32 (the reference pins the
decomposition to fp32 via an autocast(enabled=False) island,
networks/pspnet_pop.py:95).
"""

import jax.numpy as jnp


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """torch F.normalize(p=2): x / max(||x||_2, eps)."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


def proto_similarity(emb_a: jnp.ndarray, emb_b: jnp.ndarray | None = None) -> jnp.ndarray:
    """Cosine-similarity matrix between normalized prototype sets.

    Base training: sim(base, base) [K,K] (reference pspnet_pop.py:185-186).
    Fine-tune: sim(novel, novel ++ base) [Kn, Kn+Kb] (pspnet_pop.py:236-239).
    """
    a = l2_normalize(emb_a.astype(jnp.float32))
    if emb_b is None:
        return a @ a.T
    b = l2_normalize(emb_b.astype(jnp.float32))
    return a @ jnp.concatenate([a, b], axis=0).T


def orthogonal_decompose(feats, emb_b, emb_n=None):
    """Reference-shaped decomposition (materializing). Used for tests and as
    the semantic specification of the fused path.

    feats: [B,N,C] fp32;  emb_b: [Kb,C];  emb_n: [Kn,C] or None
    Returns (fg_b [B,Kb,N,C], bg [B,N,C]) or (fg_b, fg_n, bg).
    Mirrors reference networks/pspnet_pop.py:95-121 (layout transposed to
    keep C minor for TPU tiling).
    """
    q = feats.astype(jnp.float32)
    s1 = l2_normalize(emb_b.astype(jnp.float32))  # [Kb,C]
    proj1 = jnp.einsum("bnc,kc->bkn", q, s1)
    fg_b = proj1[..., None] * s1[None, :, None, :]  # [B,Kb,N,C]
    bg = q - fg_b.sum(axis=1)
    if emb_n is None:
        return fg_b, bg
    s2 = l2_normalize(emb_n.astype(jnp.float32))
    proj2 = jnp.einsum("bnc,kc->bkn", q, s2)
    fg_n = proj2[..., None] * s2[None, :, None, :]
    bg = bg - fg_n.sum(axis=1)
    return fg_b, fg_n, bg


def classifier_scalars(emb_hat: jnp.ndarray, w1: jnp.ndarray, w2: jnp.ndarray, w3: jnp.ndarray):
    """Collapse the shared bias-free classifier over a rank-1 component.

    emb_hat: [K,C] L2-normalized prototypes
    w1, w2: [C,C], w3: [C]   (1x1 convs as dense mats, input-major)
    Returns (alpha [K], beta [K]) with
      classifier(p * s_k) == max(p,0)*alpha_k + max(-p,0)*beta_k.
    """
    v = emb_hat @ w1  # [K,C]
    alpha = jnp.maximum(jnp.maximum(v, 0.0) @ w2, 0.0) @ w3
    beta = jnp.maximum(jnp.maximum(-v, 0.0) @ w2, 0.0) @ w3
    return alpha, beta


def classifier_apply(x: jnp.ndarray, w1: jnp.ndarray, w2: jnp.ndarray, w3: jnp.ndarray) -> jnp.ndarray:
    """Full classifier pass on a [..., C] feature map -> [...] logit."""
    h = jnp.maximum(x @ w1, 0.0)
    h = jnp.maximum(h @ w2, 0.0)
    return h @ w3


def pop_logits_base(feats, emb_b, w1, w2, w3):
    """forward_base logits, fused. feats [B,h,w,C] -> [B,h,w,1+Kb].

    Channel order [bg, class_1..class_Kb] matches reference
    networks/pspnet_pop.py:178-182.
    """
    q = feats.astype(jnp.float32)
    s = l2_normalize(emb_b.astype(jnp.float32))  # [Kb,C]
    proj = jnp.einsum("bhwc,kc->bhwk", q, s)
    bg_feats = q - jnp.einsum("bhwk,kc->bhwc", proj, s)
    alpha, beta = classifier_scalars(s, w1, w2, w3)
    fg = jnp.maximum(proj, 0.0) * alpha + jnp.maximum(-proj, 0.0) * beta
    bg = classifier_apply(bg_feats, w1, w2, w3)
    return jnp.concatenate([bg[..., None], fg], axis=-1)


def pop_logits_all(feats, emb_b, emb_n, wb, wn):
    """forward_all / forward_novel logits, fused.

    feats [B,h,w,C];  wb = (w1,w2,w3) base classifier;  wn = novel classifier.
    Returns [B,h,w,1+Kb+Kn] ordered [bg, base..., novel...] — the background
    and novel components are scored by classifier_n, base components by the
    (frozen) base classifier (reference networks/pspnet_pop.py:136-160).
    Also returns the novel-head sub-logits [B,h,w,1+Kn] = [bg, novel...]
    needed for fine-tune pseudo-labeling (pspnet_pop.py:221-231).
    """
    q = feats.astype(jnp.float32)
    sb = l2_normalize(emb_b.astype(jnp.float32))
    sn = l2_normalize(emb_n.astype(jnp.float32))
    proj_b = jnp.einsum("bhwc,kc->bhwk", q, sb)
    proj_n = jnp.einsum("bhwc,kc->bhwk", q, sn)
    bg_feats = (
        q
        - jnp.einsum("bhwk,kc->bhwc", proj_b, sb)
        - jnp.einsum("bhwk,kc->bhwc", proj_n, sn)
    )
    ab, bb = classifier_scalars(sb, *wb)
    an, bn_ = classifier_scalars(sn, *wn)
    fg_b = jnp.maximum(proj_b, 0.0) * ab + jnp.maximum(-proj_b, 0.0) * bb
    fg_n = jnp.maximum(proj_n, 0.0) * an + jnp.maximum(-proj_n, 0.0) * bn_
    bg = classifier_apply(bg_feats, *wn)[..., None]
    logits = jnp.concatenate([bg, fg_b, fg_n], axis=-1)
    novel_logits = jnp.concatenate([bg, fg_n], axis=-1)
    return logits, novel_logits
