"""Pooling primitives with torch-exact semantics, NHWC layout.

``adaptive_avg_pool`` reproduces torch's AdaptiveAvgPool2d bin boundaries
(start = floor(i*H/s), end = ceil((i+1)*H/s)) — this matters for mIoU parity
because PSP pyramid sizes (1,2,3,6) do not divide the 128x128 feature map of a
1024^2 tile evenly (reference networks/pspnet_pop.py:26).
"""

import jax.numpy as jnp
from jax import lax


def adaptive_avg_pool(x: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """x: [B,H,W,C] -> [B,out,out,C] with torch AdaptiveAvgPool2d bins."""
    b, h, w, c = x.shape
    s = int(out_size)
    if s == 1:
        return jnp.mean(x, axis=(1, 2), keepdims=True)

    def bounds(size):
        return [(i * size // s, -(-((i + 1) * size) // s)) for i in range(s)]

    hb, wb = bounds(h), bounds(w)
    # Row partial means first (s slices), then column slices — O(HWC) total.
    rows = jnp.stack(
        [jnp.mean(x[:, lo:hi], axis=1) for lo, hi in hb], axis=1
    )  # [B,s,W,C]
    out = jnp.stack(
        [jnp.mean(rows[:, :, lo:hi], axis=2) for lo, hi in wb], axis=2
    )  # [B,s,s,C]
    return out


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """torch MaxPool2d(2, 2) — the VGG pool."""
    neg_inf = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x, neg_inf, lax.max,
        window_dimensions=(1, 2, 2, 1), window_strides=(1, 2, 2, 1),
        padding=((0, 0), (0, 0), (0, 0), (0, 0)),
    )


def max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """torch MaxPool2d(kernel_size=3, stride=2, padding=1, ceil_mode=False).

    Matches the ResNet stem pool (reference networks/backbones/resnet.py:90).
    """
    # -inf init is required for lax to recognize the differentiable
    # reduce-window-max monoid (finfo.min falls back to the generic,
    # non-differentiable reduce_window).
    neg_inf = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x,
        neg_inf,
        lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )
