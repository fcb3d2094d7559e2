"""Segmentation losses as pure fp32 functions returning loss dicts.

Mirrors reference loss/criterion.py: CELoss (optionally + 0.4*aux) and
OrthLoss (CE + 10.0 * mean |upper-triangle| of the prototype cosine matrix).
Logits are bilinearly upsampled to the label size with align_corners=True
before the CE (loss/criterion.py:18,51).
"""

import jax
import jax.numpy as jnp

from .ops.resize import resize_bilinear

ORTH_WEIGHT = 10.0  # reference loss/criterion.py:35
AUX_WEIGHT = 0.4    # reference loss/criterion.py:23


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray, ignore_index: int = 255) -> jnp.ndarray:
    """Mean CE over non-ignored pixels. logits [B,H,W,K] fp32, labels [B,H,W] int.

    Labels outside [0, K) are treated as ignored: torch's nll_loss ASSERTS on
    them (the reference crashes on mislabeled data), while jnp.take_along_axis
    out-of-bounds gathers fill NaN in the primal but drop the pixel in the
    VJP — a silent nan loss with finite grads.  Masking them keeps the grads
    identical and the reported loss finite + observable."""
    logits = logits.astype(jnp.float32)
    valid = ((labels != ignore_index)
             & (labels >= 0) & (labels < logits.shape[-1]))
    safe = jnp.where(valid, labels, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    count = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(jnp.where(valid, nll, 0.0)) / count


def _upsampled_ce(logits, labels, ignore_index):
    h, w = labels.shape[-2], labels.shape[-1]
    up = resize_bilinear(logits.astype(jnp.float32), (h, w), align_corners=True)
    return cross_entropy(up, labels, ignore_index)


def orth_penalty(proto_sim: jnp.ndarray) -> jnp.ndarray:
    """Mean |sim| over the strict upper triangle (reference criterion.py:37-43).

    Works for rectangular [K1,K2] (fine-tune: novel x (novel ++ base)).
    """
    k1, k2 = proto_sim.shape
    i = jax.lax.broadcasted_iota(jnp.int32, (k1, k2), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (k1, k2), 1)
    mask = (j > i).astype(jnp.float32)
    return jnp.sum(jnp.abs(proto_sim) * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def ce_loss(logits, labels, aux_logits=None, ignore_index: int = 255):
    """CELoss: loss dict {'total_loss'[, 'main_loss','aux_loss']}."""
    main = _upsampled_ce(logits, labels, ignore_index)
    if aux_logits is None:
        return {"total_loss": main}
    aux = _upsampled_ce(aux_logits, labels, ignore_index)
    return {"total_loss": main + AUX_WEIGHT * aux, "main_loss": main, "aux_loss": aux}


def orth_loss(logits, labels, proto_sim, aux_logits=None, ignore_index: int = 255):
    """OrthLoss: CE + 10*orth (+0.4*aux). Loss dict keys match the reference."""
    seg = _upsampled_ce(logits, labels, ignore_index)
    orth = orth_penalty(proto_sim)
    if aux_logits is None:
        return {
            "total_loss": seg + ORTH_WEIGHT * orth,
            "seg_loss": seg,
            "orth_loss": orth,
        }
    aux = _upsampled_ce(aux_logits, labels, ignore_index)
    return {
        "total_loss": seg + ORTH_WEIGHT * orth + AUX_WEIGHT * aux,
        "seg_loss": seg,
        "aux_loss": aux,
        "orth_loss": orth,
    }


def get_loss(model_name: str):
    """Loss factory: POP heads use OrthLoss, plain heads CELoss
    (reference loss/__init__.py:3-8 selects by substring)."""
    return orth_loss if "pop" in model_name else ce_loss
