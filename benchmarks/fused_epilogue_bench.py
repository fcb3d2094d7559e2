"""Correctness (vs fp64 numpy bilinear argmax + vs the XLA path) and perf
(chain probe) for ops/fused_epilogue.upsample_argmax on the current backend."""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
INTERPRET = "--interpret" in sys.argv
if INTERPRET:
    jax.config.update("jax_platforms", "cpu")

from segland_tpu.ops.fused_epilogue import upsample_argmax, upsample_argmax_supported
from segland_tpu.ops.resize import resize_bilinear, _interp_matrix


def np_ref(logits, oh, ow):
    """fp64 bilinear + argmax reference."""
    b, h, w, k = logits.shape
    mr = _interp_matrix(h, oh, True).astype(np.float64)
    mc = _interp_matrix(w, ow, True).astype(np.float64)
    x = logits.astype(np.float64)
    x = np.einsum("bhwk,Hh->bHwk", x, mr)
    x = np.einsum("bHwk,Ww->bHWk", x, mc)
    gap = np.sort(x, axis=-1)
    gap = gap[..., -1] - gap[..., -2]
    return np.argmax(x, -1).astype(np.uint8), gap


def check(b, h, w, k, oh, ow, seed=0):
    rng = np.random.RandomState(seed)
    logits = rng.randn(b, h, w, k).astype(np.float32) * 10.0
    assert upsample_argmax_supported(logits.shape, (oh, ow))
    pred = np.asarray(upsample_argmax(jnp.asarray(logits), (oh, ow),
                                      interpret=INTERPRET))
    ref, gap = np_ref(logits, oh, ow)
    mism = pred != ref
    bad = mism & (gap > 1e-3)
    print(f"shape ({b},{h},{w},{k})->({oh},{ow}): mismatches={mism.sum()} "
          f"({mism.mean():.2e}), non-tie mismatches={bad.sum()}", flush=True)
    assert bad.sum() == 0, np.argwhere(bad)[:5]
    # also vs the in-repo XLA path
    xla = np.asarray(jax.jit(lambda l: jnp.argmax(
        resize_bilinear(l.astype(jnp.float32), (oh, ow), align_corners=True),
        -1).astype(jnp.uint8))(jnp.asarray(logits)))
    mism2 = (pred != xla) & (gap > 1e-3)
    print(f"  vs XLA path non-tie mismatches={mism2.sum()}", flush=True)
    assert mism2.sum() == 0


def perf():
    B, H, K, TILE = 32, 256, 8, 1024
    CHAIN, ITERS = 8, 3
    probe = jax.jit(lambda o: o.astype(jnp.int32).sum())

    def chain_time(op, x):
        @jax.jit
        def run(x):
            def body(c, i):
                x1 = c + i.astype(c.dtype)
                return c, op(x1).astype(jnp.float32).mean()
            _, ys = lax.scan(body, x, jnp.arange(CHAIN, dtype=jnp.float32))
            return ys.sum()
        for _ in range(2):
            out = run(x)
        float(probe(out))
        t0 = time.time()
        for _ in range(ITERS):
            out = run(x)
        float(probe(out))
        return (time.time() - t0) / (ITERS * CHAIN) * 1000

    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, H, K)).astype(jnp.float32)
    base = chain_time(lambda a: a[..., :1, :1], x)
    fused = chain_time(lambda a: upsample_argmax(a, (TILE, TILE)), x)
    xla = chain_time(lambda a: jnp.argmax(resize_bilinear(
        a.astype(jnp.float32), (TILE, TILE), align_corners=True), -1).astype(jnp.uint8), x)
    print(f"baseline {base:.2f} ms | fused {fused-base:.2f} ms | xla {xla-base:.2f} ms",
          flush=True)


print(jax.devices(), flush=True)
check(2, 64, 128, 5, 256, 512)
check(2, 256, 256, 8, 1024, 1024, seed=1)
check(1, 128, 128, 12, 1024, 1024, seed=2)  # ft eval: x8, 12 classes
check(2, 256, 256, 8, 256, 1024, seed=3)    # fr=1 row-identity edge
if not INTERPRET:
    perf()
print("OK", flush=True)
