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
