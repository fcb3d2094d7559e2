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
  stage B (rows, MXU):     the H-axis interp matmul against per-block row
      matrices in LOCAL source coordinates (each output block consumes a
      halo'd slice of source rows, so its matrix is only (block, slice)
      wide), with the same 2x2 Dekker split.  A VPU formulation (jnp.repeat
      + drift-mask selects + exact lerp) was measured first and REVERTED:
      Mosaic lowers sublane element-repeat at ~1.3 ms per (256,1024) use
      (3 repeats = 4 ms/batch) while the split matmuls run the identical
      map in ~0.9 ms total -- see benchmarks/fused_epilogue_bench.py.
  argmax: running (best, idx) update per class channel in VMEM; only the
      uint8 class map is ever written to HBM.

Numerics vs the XLA path: both stages differ from the Precision.HIGHEST
einsum only by the Dekker residual (~2^-18 relative, ~1e-4 absolute at
logit scale ~30), which can flip the argmax only where the top-2 classes
are closer than that -- decision-boundary pixels that bf16 model compute
already renders arbitrary (measured: ~2e-6 of pixels, all with top-2 gap
< 1e-3).  The CPU/XLA fallback path in evallib/infer.py is unchanged.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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
    # scoped-VMEM footprint: the grid is (B,) with whole-image blocks, so
    # near-full-resolution logits (e.g. vggunet_pop's K=8 1024^2, factor 1)
    # blow the ~16 MB scoped limit (measured: 75.5M requested).  Estimate
    # the resident blocks and refuse rather than OOM at compile time.
    src = _RB // fr
    vmem = (k * (h + 2 * _HALO) * w * 4          # logits block, fp32
            + 4 * w * ow * 2                     # wc4, bf16
            + oh * 4 * (src + 2 * _HALO) * 2     # wr4, bf16
            + oh * ow                            # uint8 out
            + k * (src + 2 * _HALO) * ow * 4)    # fp32 scratch
    if vmem > 12 * 1024 * 1024:
        return False
    # drift in {0,1} holds for any integer factor (see module docstring)
    return True


def _kernel(l_ref, wc_ref, wr_ref, out_ref, mid_ref, *, K, h, w, oh, ow, fr):
    """grid (B,).  l_ref (1,K,h+2*_HALO,w) f32 row-padded;
    wc_ref (4w, ow) bf16 = [wc_hi;wc_hi;wc_lo;wc_lo];
    wr_ref (oh, 4*(src+2*_HALO)) bf16 = [wr_hi|wr_lo|wr_hi|wr_lo] in local
    source coordinates; out_ref (1,oh,ow) uint8."""
    J = oh // _RB
    src = _RB // fr      # source rows consumed per output block
    halo2 = 2 * _HALO

    rows = src + halo2

    def j_body(j, _):
        # (_RB, 2*(src+halo2)) bf16: [wr_hi | wr_lo] pre-stacked host-side
        wrj = wr_ref[pl.ds(j * _RB, _RB), :]

        # ---- stage A: W-axis interp matmul for ALL K channels at once --
        # source rows [j*src - _HALO, j*src + src + _HALO) of the UNPADDED
        # input == rows [j*src, j*src + rows) of the padded ref (8-aligned
        # dynamic start); the (K, rows, w) slab collapses to (K*rows, w)
        # (sublane-aligned since rows % 8 == 0).  The 2x2 Dekker split runs
        # as ONE dot: [a_hi|a_lo|a_hi|a_lo] @ [wc_hi;wc_hi;wc_lo;wc_lo],
        # the contracting-dim concat summing all four single-pass products
        # in the fp32 accumulator.
        slab = l_ref[0, :, pl.ds(j * src, rows), :].reshape(K * rows, w)
        slab = slab.astype(jnp.float32)
        a_hi = slab.astype(jnp.bfloat16)
        a_lo = (slab - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        a4 = jnp.concatenate([a_hi, a_lo, a_hi, a_lo], axis=1)  # (K*rows, 4w)
        mid_ref[...] = jnp.dot(a4, wc_ref[...], preferred_element_type=jnp.float32)

        def k_body(k, carry):
            best, idx = carry
            # ---- stage B: H-axis interp matmul, same split as one dot --
            # wr rows carry the two lerp weights at LOCAL source columns
            # (zeros elsewhere add exactly); pre-pad dummy rows only ever
            # meet zero weights
            m = mid_ref[pl.ds(k * rows, rows), :]
            m_hi = m.astype(jnp.bfloat16)
            m_lo = (m - m_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            # [wr_hi|wr_lo|wr_hi|wr_lo] @ [m_hi;m_hi;m_lo;m_lo]: all four
            # split products in one dot
            m4 = jnp.concatenate([m_hi, m_hi, m_lo, m_lo], axis=0)
            cur = jnp.dot(wrj, m4, preferred_element_type=jnp.float32)

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
    wc_hi = np.asarray(wc.astype(jnp.bfloat16))
    wc_lo = (wc - wc_hi.astype(np.float32)).astype(jnp.bfloat16)
    wc4 = np.concatenate([wc_hi, wc_hi,
                          np.asarray(wc_lo), np.asarray(wc_lo)], axis=0)

    # per-block row-interp matrices in LOCAL source coordinates: output row
    # r of block j = r // _RB reads padded source rows [j*src, j*src+src+16),
    # i.e. unpadded rows [j*src - _HALO, ...); its two lerp weights land at
    # local columns lo[r] - j*src + _HALO and hi[r] - j*src + _HALO
    src = _RB // fr
    lo, hi, w_hi = _linear_table(h, oh, align_corners=True)
    rows = np.arange(oh)
    block0 = (rows // _RB) * src - _HALO
    wr = np.zeros((oh, src + 2 * _HALO), np.float32)
    np.add.at(wr, (rows, lo - block0), 1.0 - w_hi)
    np.add.at(wr, (rows, hi - block0), w_hi)
    wr_hi = np.asarray(wr.astype(jnp.bfloat16))
    wr_lo = (wr - wr_hi.astype(np.float32)).astype(jnp.bfloat16)
    wr4 = np.concatenate([wr_hi, np.asarray(wr_lo),
                          wr_hi, np.asarray(wr_lo)], axis=1)

    lt = jnp.transpose(logits.astype(jnp.float32), (0, 3, 1, 2))  # (B,K,h,w)
    # row pre-pad with finite dummies so every in-kernel slice is uniform
    lt = jnp.concatenate([lt[:, :, :_HALO], lt, lt[:, :, -_HALO:]], axis=2)

    kern = functools.partial(_kernel, K=k, h=h, w=w, oh=oh, ow=ow, fr=fr)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, k, h + 2 * _HALO, w), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((4 * w, ow), lambda i: (0, 0)),
            pl.BlockSpec((oh, 4 * (src + 2 * _HALO)), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, oh, ow), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, oh, ow), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((k * (src + 2 * _HALO), ow), jnp.float32)],
        interpret=interpret,
    )(lt, jnp.asarray(wc4, jnp.bfloat16), jnp.asarray(wr4, jnp.bfloat16))


def upsample_argmax_supported(shape, out_hw) -> bool:
    """True when (B,h,w,K) logits -> (oh,ow) preds can take the fused path."""
    if len(shape) != 4:
        return False
    b, h, w, k = shape
    return _supported(b, h, w, k, int(out_hw[0]), int(out_hw[1]))
