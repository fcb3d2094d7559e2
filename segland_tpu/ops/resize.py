"""Torch-semantics image resizing as jittable TPU ops.

The reference relies on ``F.interpolate(mode='bilinear')`` with BOTH
align_corners conventions (align_corners=True in losses/eval upsampling,
reference loss/criterion.py:18 and eval_base.py:168; align_corners=False
inside the PSP decoder, reference networks/pspnet_pop.py:33).  jax.image only
implements the half-pixel convention, so we build both from explicit
gather+lerp along each axis — separable, static index tables, VPU-friendly,
and exact w.r.t. the torch formulas.

Layout: NHWC (TPU-native). The resized axes are -3 (H) and -2 (W).
"""

import numpy as np
import jax.numpy as jnp


def _linear_table(in_size: int, out_size: int, align_corners: bool):
    """Source indices + lerp weights for 1-D linear interpolation.

    Matches torch's area_pixel_compute_source_index: align_corners=True uses
    ``i*(in-1)/(out-1)``; align_corners=False uses half-pixel centers clamped
    at 0.
    """
    if align_corners:
        if out_size == 1:
            src = np.zeros((1,), np.float64)
        else:
            src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
        src = np.maximum(src, 0.0)
    lo = np.minimum(np.floor(src).astype(np.int32), in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    w_hi = (src - lo).astype(np.float32)
    return lo, hi, w_hi


def _nearest_table(in_size: int, out_size: int):
    """torch ``mode='nearest'`` source indices: floor(i * in/out)."""
    src = np.floor(np.arange(out_size, dtype=np.float64) * (in_size / out_size))
    return np.minimum(src.astype(np.int32), in_size - 1)


def _lerp_axis(x, axis: int, lo, hi, w_hi):
    x_lo = jnp.take(x, jnp.asarray(lo), axis=axis)
    x_hi = jnp.take(x, jnp.asarray(hi), axis=axis)
    shape = [1] * x.ndim
    shape[axis] = -1
    w = jnp.asarray(w_hi, dtype=x.dtype).reshape(shape)
    return x_lo * (1 - w) + x_hi * w


def _interp_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """Dense [out, in] interpolation matrix (two nonzeros per row)."""
    lo, hi, wt = _linear_table(in_size, out_size, align_corners)
    m = np.zeros((out_size, in_size), np.float32)
    np.add.at(m, (np.arange(out_size), lo), 1.0 - wt)
    np.add.at(m, (np.arange(out_size), hi), wt)
    return m


def _matmul_axis(x, axis: int, in_size: int, out_size: int, align_corners: bool):
    """Interpolate one spatial axis as a dense matmul on the MXU.

    The gather-based lerp runs at a fraction of HBM bandwidth on TPU
    (measured 7-33 ms for decoder-scale upsamples at b16 vs 0.5-1.8 ms for
    this form); the matrix has exactly the lerp's two weights per row, so
    with HIGHEST precision the fp32 result is the same two products summed
    (zeros add exactly) — torch-golden resize tests pass unchanged."""
    import jax

    m = jnp.asarray(_interp_matrix(in_size, out_size, align_corners), x.dtype)
    prec = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    letters = "abcdefg"[: x.ndim]
    src = "".join(letters)
    dst = src.replace(letters[axis], "Z")
    return jnp.einsum(f"{src},Z{letters[axis]}->{dst}", x, m, precision=prec)


def _resize_axis(x, axis, in_size, out_size, align_corners):
    # matmul formulation for upsampling (the hot path: decoders + eval
    # logits); keep the gather lerp for downscales and very long axes where
    # the dense matrix stops being cheap
    if out_size > in_size and in_size <= 1024:
        return _matmul_axis(x, axis, in_size, out_size, align_corners)
    lo, hi, wt = _linear_table(in_size, out_size, align_corners)
    return _lerp_axis(x, axis, lo, hi, wt)


def resize_bilinear(x: jnp.ndarray, out_hw, align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resize of an NHWC (or HWC) array to ``out_hw = (H', W')``."""
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = int(out_hw[0]), int(out_hw[1])
    if (h, w) == (oh, ow):
        return x
    if h != oh:
        x = _resize_axis(x, x.ndim - 3, h, oh, align_corners)
    if w != ow:
        x = _resize_axis(x, x.ndim - 2, w, ow, align_corners)
    return x


def resize_nearest(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Nearest resize (torch 'nearest' convention) of NHWC/HWC array."""
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = int(out_hw[0]), int(out_hw[1])
    if (h, w) == (oh, ow):
        return x
    if h != oh:
        x = jnp.take(x, jnp.asarray(_nearest_table(h, oh)), axis=x.ndim - 3)
    if w != ow:
        x = jnp.take(x, jnp.asarray(_nearest_table(w, ow)), axis=x.ndim - 2)
    return x
