"""Lane-packing for small-channel stages (TPU vector lanes are 128-wide).

A (B,H,W,C) activation with C<128 wastes (128-C)/128 of every vector lane
and pads every MXU operand.  Packing k=128//C adjacent W-pixels into the
channel dim — (B,H,W,C) -> (B,H,W/k,kC) — is a *pure reshape of contiguous
bytes* (measured free on TPU, benchmarks/lsk_packed_probe.py), after which:

  - 1x1 convs become block-diagonal matmuls  kron(I_k, W)  at full lane
    density (measured 1.8x on 32ch);
  - depthwise convs become block-banded DENSE convs on the MXU: the W-axis
    taps turn into channel-mixing blocks between adjacent packed columns
    (measured 1.25x/1.2x for the LSK 5x5 and 7x7-dil-3 on 32ch, vs XLA's
    depthwise emitter at 25% lane occupancy).

Numerics: the injected off-block weights are exact zeros and the MXU
accumulates in fp32, so packed == reference in fp32 bit-for-bit modulo
fp32 summation order (<=1e-6); in bf16 the outputs differ by at most 1 ulp
of the output (measured 7.8e-3 abs at |out|~2), the same class of delta the
fused Pallas kernels carry (BASELINE.md).

Used by models/backbones/lsknet.py for its C=32/64 stages (the reference
LSKNet-T spends 60% of its runtime there, networks/backbones/lsknet.py:198
dims [32,64,160,256]).
"""

import functools

import numpy as np
import jax.numpy as jnp
from jax import lax


def pack_k(c: int, min_k: int = 4) -> int:
    """Pack factor for a channel count (1 = don't pack).

    min_k=4 by default: measured on the LSK stage blocks (1024^2 b16),
    k=4 at C=32 wins 1.40x but k=2 at C=64 LOSES 1.37x — the 7x7-dil-3
    band kernel at k=2 spans 11 packed columns (3.1x the depthwise FLOPs)
    while the lanes were already half full.
    """
    k = 128 // c if c < 128 and 128 % c == 0 else 1
    return k if k >= min_k else 1


def pack(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """(..., W, C) -> (..., W/k, k*C); contiguous-byte reshape (free)."""
    if k == 1:
        return x
    *lead, w, c = x.shape
    return x.reshape(*lead, w // k, k * c)


def unpack(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Inverse of :func:`pack`."""
    if k == 1:
        return x
    *lead, wp, kc = x.shape
    return x.reshape(*lead, wp * k, kc // k)


def blockdiag(w: jnp.ndarray, k: int) -> jnp.ndarray:
    """(Ci, Co) 1x1-conv weight -> (k*Ci, k*Co) block-diagonal matmul weight."""
    ci, co = w.shape
    out = jnp.zeros((k, ci, k, co), w.dtype)
    idx = jnp.arange(k)
    out = out.at[idx, :, idx, :].set(w[None])
    return out.reshape(k * ci, k * co)


def conv1x1_packed(xp: jnp.ndarray, w: jnp.ndarray, b, k: int) -> jnp.ndarray:
    """1x1 conv on packed activations.  w: (Ci, Co); b: (Co,) or None."""
    y = xp @ blockdiag(w, k)
    if b is not None:
        y = y + jnp.tile(b, k)
    return y


@functools.lru_cache(maxsize=None)
def _dw_placement(kh: int, dil: int, k: int):
    """0/1 placement tensor P[t, q, s, j] routing depthwise tap t to packed
    band column q, input slot s, output slot j; plus (pad_lo, pad_hi) in
    packed columns."""
    r = (kh // 2) * dil
    lo = -((r + k - 1) // k)
    hi = (r + k - 1) // k
    kw_p = hi - lo + 1
    p = np.zeros((kh, kw_p, k, k), np.float32)
    for j in range(k):
        for t in range(kh):
            off = (t - kh // 2) * dil
            src = j + off
            q, s = src // k - lo, src % k
            p[t, q, s, j] = 1.0
    return p, (-lo, hi)


def dw_band_weights(w: jnp.ndarray, dil: int, k: int):
    """Depthwise kernel (kh, kh, 1, C) [flax feature_group_count=C layout]
    -> dense packed kernel (kh, kw_p, k*C, k*C) + (pad_lo, pad_hi).

    The W-axis taps (with their dilation) are folded into block-banded
    channel mixing; the H axis keeps its taps and dilation in the conv.
    """
    kh = w.shape[0]
    c = w.shape[-1]
    p, pads = _dw_placement(kh, dil, k)
    p = jnp.asarray(p, w.dtype)
    # tmp[y, q, s, j, c] = sum_t w[y, t, c] * P[t, q, s, j]
    tmp = jnp.einsum("ytc,tqsj->yqsjc", w[:, :, 0, :], p)
    eye = jnp.eye(c, dtype=w.dtype)
    wk = jnp.einsum("yqsjc,cd->yqscjd", tmp, eye)
    kw_p = p.shape[1]
    return wk.reshape(kh, kw_p, k * c, k * c), pads


def band_kw(kh: int, dil: int, k: int) -> int:
    """Packed-column width of the band kernel for a (kh, dil) conv at pack
    factor k.  Depthwise FLOP inflation is band_kw*k/kh; a band is worth it
    only while that stays <= the lane-padding waste it removes (~k), i.e.
    band_kw <= kh."""
    r = (kh // 2) * dil
    return 2 * ((r + k - 1) // k) + 1


def dense_band_weights(w: jnp.ndarray, dil: int, k: int):
    """Dense conv kernel (kh, kh, Ci, Co) -> W-packed band kernel
    (kh, kw_p, k*Ci, k*Co) + (pad_lo, pad_hi) in packed columns.

    Same placement as the depthwise case, but each (tap, slot) routes a full
    Ci x Co block.  FLOPs inflate by ~kw_p*k/kh; worth it only when the
    surrounding elementwise chain (not the conv) is the lane-padded cost —
    measured on HRNet branch0: the bare 3x3 32->32 conv is 0.19 ms while
    conv+affine+relu is 1.27 ms (the epilogue at 25% lane occupancy is 6x
    the conv), and the packed band conv times at the noise floor.
    """
    kh = w.shape[0]
    p, pads = _dw_placement(kh, dil, k)
    p = jnp.asarray(p, w.dtype)
    wk = jnp.einsum("ytcd,tqsj->yqscjd", w, p)
    ci, co = w.shape[2], w.shape[3]
    return wk.reshape(kh, p.shape[1], k * ci, k * co), pads


def conv_packed(xp: jnp.ndarray, w: jnp.ndarray, b, dil: int, k: int) -> jnp.ndarray:
    """Dense (kh,kh) dil conv, stride 1, SAME zero padding, on packed
    activations.  w: (kh, kh, Ci, Co); b: (Co,) or None."""
    kh = w.shape[0]
    wk, (pad_lo, pad_hi) = dense_band_weights(w, dil, k)
    y = lax.conv_general_dilated(
        xp, wk, (1, 1),
        [((kh // 2) * dil,) * 2, (pad_lo, pad_hi)],
        rhs_dilation=(dil, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        y = y + jnp.tile(b, k)
    return y


def dw_conv_packed(xp: jnp.ndarray, w: jnp.ndarray, b, dil: int, k: int) -> jnp.ndarray:
    """Depthwise (kh,kh) dil conv, stride 1, SAME zero padding, on packed
    activations.  w: flax dw kernel (kh, kh, 1, C); b: (C,) or None."""
    kh = w.shape[0]
    wk, (pad_lo, pad_hi) = dw_band_weights(w, dil, k)
    y = lax.conv_general_dilated(
        xp, wk, (1, 1),
        [((kh // 2) * dil,) * 2, (pad_lo, pad_hi)],
        rhs_dilation=(dil, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        y = y + jnp.tile(b, k)
    return y
