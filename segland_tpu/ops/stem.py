"""Space-to-depth rewrite of low-channel stem convolutions.

Exact rewrite (same math, different summation order): for a KxK/sS conv,
pad the input, space-to-depth by S (the stride), and convolve with a
ceil(K/S)-sized stride-1 kernel whose weights are the original taps
scattered by (t // S, t % S).  The input is read through a merged
[B, H, W*C] view so the fp32->bf16 cast and the s2d shuffle run at full
lane occupancy; phantom right-pad windows are sliced off the output.

MEASURED NEUTRAL ON v5e and therefore NOT wired into the models: with
proper in-jit chained timing (benchmarks/chain_probe.py — single-op jits
are dispatch-bound over the axon tunnel and had inflated the stem costs),
XLA's native conv emitter handles the 3-channel stems well (4x4/s4
3.2 ms vs 5.3 ms for this rewrite at batch-8 1024^2; 7x7/s2 5.6 vs 5.8).
Kept as a tested, exact op: the trade-off may differ on other TPU
generations or for int8 stems.

The original parameter layout [K, K, C, F] is kept (checkpoint converters
untouched); the scatter to the s2d kernel is a tiny trace-time gather.
"""

import numpy as np
import jax.numpy as jnp


def _s2d_kernel(w: jnp.ndarray, stride: int) -> jnp.ndarray:
    """[K,K,C,F] -> [K', K', S*S*C, F] with K' = ceil(K/S); slot
    (ti//S, tj//S, (ti%S)*S*C + (tj%S)*C + c) takes w[ti, tj, c]."""
    k = w.shape[0]
    c, f = w.shape[2], w.shape[3]
    s = stride
    k2 = -(-k // s)
    out = jnp.zeros((k2, k2, s * s * c, f), w.dtype)
    for ti in range(k):
        for tj in range(k):
            out = out.at[ti // s, tj // s,
                         (ti % s) * s * c + (tj % s) * c : (ti % s) * s * c + (tj % s) * c + c,
                         :].set(w[ti, tj])
    return out


def space_to_depth(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """[B,H,W,C] -> [B,H/S,W/S,S*S*C] via the merged-minor-dim route (the
    only lane-efficient order: reshapes are free, the one transpose moves
    whole S*C-element groups)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // s, s, w // s, s * c)
    x = x.transpose(0, 1, 3, 2, 4)
    return x.reshape(b, h // s, w // s, s * s * c)


def s2d_conv(x: jnp.ndarray, w: jnp.ndarray, stride: int, padding, *,
             compute_dtype=None) -> jnp.ndarray:
    """Drop-in for lax.conv(x, w, (S,S), pad) when C_in is small.

    x: [B,H,W,C] (any float dtype; cast to compute_dtype through a merged
    view); w: [K,K,C,F] original params; padding: int or (lo, hi).
    Returns [B, out_h, out_w, F] in compute_dtype.
    """
    b, h, wdt, c = x.shape
    k = w.shape[0]
    s = stride
    if isinstance(padding, int):
        pl_, pr_ = padding, padding
    else:
        pl_, pr_ = padding
    cdt = compute_dtype or x.dtype

    out_h = (h + pl_ + pr_ - k) // s + 1
    out_w = (wdt + pl_ + pr_ - k) // s + 1

    # pad via the merged [B, H, W*C] view; cast there too (full lanes)
    hp = h + pl_ + pr_
    wp = wdt + pl_ + pr_
    hp_pad = -(-hp // s) * s
    wp_pad = -(-wp // s) * s
    xm = x.reshape(b, h, wdt * c)
    xm = xm.astype(cdt)
    xm = jnp.pad(xm, ((0, 0), (pl_, pr_ + hp_pad - hp),
                      (pl_ * c, (pr_ + wp_pad - wp) * c)))
    xs = space_to_depth(xm.reshape(b, hp_pad, wp_pad, c), s)

    w2 = _s2d_kernel(w.astype(cdt), s)
    k2 = w2.shape[0]
    if k2 == 1:
        y = jnp.dot(xs, w2[0, 0], preferred_element_type=jnp.float32).astype(cdt)
    else:
        import jax

        y = jax.lax.conv_general_dilated(
            xs, w2, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    return y[:, :out_h, :out_w, :]
