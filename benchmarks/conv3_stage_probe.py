"""Isolate the fused_conv3 regression: time a layer4-like int8 Stage under
(a) the per-conv interceptor, (b) QuantConfig(fused_conv3=True), and
(c) fused_conv3 with conv3 as a 1x1 conv instead of dot_general.

Usage: python benchmarks/conv3_stage_probe.py
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")
from resnet_stage_probe import Stage
from swin_attn_variants import chain_time
from segland_tpu.quant import QuantConfig, calibrate, quantized_apply

B = 16


def main():
    # layer4-like: 3 blocks, planes 512 (C=2048), dil 4, 128^2
    mod = Stage(512, 3, 1024, 1, 4)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 128, 128, 1024)
                          ).astype(jnp.bfloat16)
    v = jax.jit(lambda k, a: mod.init(k, a))(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1024), jnp.bfloat16))
    t0 = time.time()
    vq = calibrate(mod, v, [x[:1]])
    print(f"calibrated {time.time()-t0:.1f}s", flush=True)

    base = chain_time(lambda a: a[:1, :1, :1], x)
    for tag, cfg in (("per-conv", None),
                     ("fused_conv3", QuantConfig(fused_conv3=True))):
        ap = quantized_apply(mod, cfg) if cfg else quantized_apply(mod)
        ms = chain_time(lambda a: ap(vq, a), x) - base
        print(f"layer4-like b{B} {tag}: {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
