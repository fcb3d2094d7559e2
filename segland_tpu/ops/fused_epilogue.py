"""Fused eval epilogue: bilinear logit upsample + argmax in one Pallas pass.

The reference eval protocol upsamples logits to label resolution in fp32 and
argmaxes (eval_base.py:168, eval_ft.py:168-178).  Done literally on TPU that
is the single most expensive non-model op in serving: at flagship shapes
(batch 32, coarse logits 256^2 x 8 -> preds 1024^2) the matmul-formulated
fp32 resize (ops/resize.py, Precision.HIGHEST = 6 bf16 MXU passes) plus the
argmax measured 6.76 ms/batch on a v5e chip (benchmarks/epilogue_probe.py)
-- ~5% of the whole 130 ms flagship iteration -- because it runs 6x the
172 GFLOP dense-resize cost and materializes ~2.9 GB of fp32 intermediates
in HBM.

This kernel computes the SAME map (bit-accuracy notes below) in one fused
pass that never materializes the upsampled logits:

  stage A (columns, MXU):  for each output row block, the W-axis expansion
      is a dense interp matmul (exactly two lerp weights per row, zeros add
      exactly).  fp32 accuracy on the bf16 MXU via a 2x2 Dekker split:
      x = x_hi + x_lo, W = W_hi + W_lo (all bf16), four 1-pass dots summed
      in the fp32 accumulator.  Residual error ~2^-25 relative -- below
      fp32 rounding of the reference product.
  stage B (rows, VPU):     H expands by an integer factor f with
      align_corners=True, where floor(r*(h-1)/(fh-1)) provably lags r//f by
      d in {0, 1} (the gap r/f - r(h-1)/(fh-1) = r(f-1)/(f(fh-1)) < 1).  So
      the source gather is three STATIC-offset slices of the block expanded
      with jnp.repeat (no dynamic gathers, which Mosaic lacks on sublanes),
      selected by a precomputed drift mask, then the exact fp32 lerp
      x_lo*(1-w) + x_hi*w -- the same formula as ops/resize.py.
  argmax: running (best, idx) update per class channel in VMEM; only the
      uint8 class map is ever written to HBM.

Numerics vs the XLA path: stage B is exact fp32; stage A differs from the
Precision.HIGHEST einsum only in fp32 rounding order (~1e-6 absolute at
logit scale ~30), which can flip the argmax only where the top-2 classes
are within ~1e-6 -- i.e. on exact decision boundaries that bf16 model
compute already renders arbitrary (measured: ~2e-6 of pixels, all with
top-2 gap < 1e-3).  The CPU/XLA fallback path in evallib/infer.py is
unchanged.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from .resize import _interp_matrix, _linear_table

# output rows per row-block; multiple of the sublane tile (8) and of every
# supported integer upsample factor
_RB = 256
_HALO = 8  # source rows pre-padded on each side (keeps row slices 8-aligned)


def _supported(b, h, w, k, oh, ow):
    if oh % h:
        return False
    fr = oh // h
    # row blocks must cover whole repeat groups and tile the output evenly
    if oh % _RB or _RB % fr:
        return False
    # lane-dim tiling: full 128-lane tiles for the wide arrays
    if ow % 128 or w % 128:
        return False
    # drift in {0,1} holds for any integer factor (see module docstring)
    return True


def _kernel(l_ref, wc_hi_ref, wc_lo_ref, wrow_ref, dmask_ref, out_ref,
            *, K, h, w, oh, ow, fr):
    """grid (B,).  l_ref (1,K,h+2*_HALO,w) f32 row-padded; wc_* (w,ow) bf16;
    wrow/dmask (oh,1) f32; out_ref (1,oh,ow) uint8."""
    J = oh // _RB
    src = _RB // fr      # source rows consumed per output block
    off = _HALO          # s_ext[off + q] = L[j*src + q]

    def j_body(j, _):
        def k_body(k, carry):
            best, idx = carry
            # source rows [j*src - _HALO, j*src + src + _HALO) of the
            # UNPADDED input == rows [j*src, j*src + src + 2*_HALO) of the
            # padded ref; 8-aligned dynamic start
            s_ext = l_ref[0, k, pl.ds(j * src, src + 2 * _HALO), :]
            s_ext = s_ext.astype(jnp.float32)

            # ---- stage A: W-axis interp matmul, 2x2 bf16 Dekker split --
            a_hi = s_ext.astype(jnp.bfloat16)
            a_lo = (s_ext - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            mid = (
                jnp.dot(a_hi, wc_hi_ref[...], preferred_element_type=jnp.float32)
                + jnp.dot(a_lo, wc_hi_ref[...], preferred_element_type=jnp.float32)
                + jnp.dot(a_hi, wc_lo_ref[...], preferred_element_type=jnp.float32)
                + jnp.dot(a_lo, wc_lo_ref[...], preferred_element_type=jnp.float32)
            )  # (src + 2*_HALO, ow) f32

            # ---- stage B: H-axis lerp via static slices + repeats ------
            # a0[t] = mid[off + t//fr], am/ap its -1/+1 row neighbours;
            # drift mask picks (am, a0) when d=1 else (a0, ap).  Dummy rows
            # (from the pre-pad) are only ever multiplied by weight 0 or
            # discarded by the mask -- they just have to be finite.
            a0 = jnp.repeat(mid[off:off + src], fr, axis=0)
            am = jnp.repeat(mid[off - 1:off + src - 1], fr, axis=0)
            ap = jnp.repeat(mid[off + 1:off + src + 1], fr, axis=0)
            dm = dmask_ref[pl.ds(j * _RB, _RB), :]
            wr = wrow_ref[pl.ds(j * _RB, _RB), :]
            g0 = jnp.where(dm > 0, am, a0)
            g1 = jnp.where(dm > 0, a0, ap)
            cur = g0 * (1.0 - wr) + g1 * wr     # exact fp32 lerp

            upd = cur > best
            best = jnp.where(upd, cur, best)
            idx = jnp.where(upd, k, idx)
            return best, idx

        best0 = jnp.full((_RB, ow), -jnp.inf, jnp.float32)
        idx0 = jnp.zeros((_RB, ow), jnp.int32)
        _, idx = lax.fori_loop(0, K, k_body, (best0, idx0))
        out_ref[0, pl.ds(j * _RB, _RB), :] = idx.astype(jnp.uint8)
        return 0

    lax.fori_loop(0, J, j_body, 0)


@functools.partial(jax.jit, static_argnames=("out_hw", "interpret"))
def upsample_argmax(logits, out_hw, interpret: bool = None):
    """argmax(resize_bilinear(logits fp32, out_hw, align_corners=True), -1)
    as one fused Pallas pass.  logits (B,h,w,K) f32/bf16 -> (B,oh,ow) uint8.

    Caller must check :func:`upsample_argmax_supported` first; unsupported
    shapes raise.  align_corners=True only (the eval protocol,
    eval_base.py:168).  interpret=None auto-selects the Pallas interpreter
    off-TPU (the Mosaic lowering is TPU-only)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, k = logits.shape
    oh, ow = int(out_hw[0]), int(out_hw[1])
    if not _supported(b, h, w, k, oh, ow):
        raise ValueError(f"unsupported fused-epilogue shape {logits.shape}->{out_hw}")
    fr = oh // h

    wc = _interp_matrix(w, ow, align_corners=True).T  # (w, ow) fp32
    wc_hi = wc.astype(jnp.bfloat16)
    wc_lo = (wc - np.asarray(wc_hi, np.float32)).astype(jnp.bfloat16)

    lo, _hi, w_hi = _linear_table(h, oh, align_corners=True)
    drift = (np.arange(oh) // fr) - lo
    assert drift.min() >= 0 and drift.max() <= 1, drift
    wrow = w_hi.reshape(oh, 1).astype(np.float32)
    dmask = drift.reshape(oh, 1).astype(np.float32)

    lt = jnp.transpose(logits.astype(jnp.float32), (0, 3, 1, 2))  # (B,K,h,w)
    # row pre-pad with finite dummies so every in-kernel slice is uniform
    lt = jnp.concatenate([lt[:, :, :_HALO], lt, lt[:, :, -_HALO:]], axis=2)

    kern = functools.partial(_kernel, K=k, h=h, w=w, oh=oh, ow=ow, fr=fr)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, k, h + 2 * _HALO, w), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((w, ow), lambda i: (0, 0)),
            pl.BlockSpec((w, ow), lambda i: (0, 0)),
            pl.BlockSpec((oh, 1), lambda i: (0, 0)),
            pl.BlockSpec((oh, 1), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, oh, ow), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, oh, ow), jnp.uint8),
        interpret=interpret,
    )(lt, jnp.asarray(wc_hi), jnp.asarray(wc_lo), jnp.asarray(wrow),
      jnp.asarray(dmask))


def upsample_argmax_supported(shape, out_hw) -> bool:
    """True when (B,h,w,K) logits -> (oh,ow) preds can take the fused path."""
    if len(shape) != 4:
        return False
    b, h, w, k = shape
    return _supported(b, h, w, k, int(out_hw[0]), int(out_hw[1]))
