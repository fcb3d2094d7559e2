"""Micro A/B for the round-4 conv3+residual int8 kernel vs the XLA
per-conv equivalent (the s32-materializing path it is meant to beat).

Shapes: resnet50 layer4 at b16 1024^2 eval (M = 16*128^2 = 262144, P=512,
C=2048) and layer3 (P=256, C=1024).

Usage: python benchmarks/conv3_probe.py [mblk ...]
"""
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")
from swin_attn_variants import chain_time  # chained in-jit timing
from segland_tpu.ops.pallas_bottleneck import conv3_residual_int8

M = 262144


def main():
    mblks = [int(a) for a in sys.argv[1:]] or [None, 128, 512, 1024]
    for (p, c) in ((512, 2048), (256, 1024)):
        rng = jax.random.PRNGKey(0)
        ks = jax.random.split(rng, 4)
        h2q = jax.random.randint(ks[0], (M, p), -127, 128, jnp.int8)
        res = jax.random.normal(ks[1], (M, c)).astype(jnp.bfloat16)
        w3 = jax.random.randint(ks[2], (p, c), -127, 128, jnp.int8)
        a3 = (jax.random.uniform(ks[3], (c,)) * 1e-4).astype(jnp.float32)
        b3 = jnp.zeros((c,), jnp.float32)

        def xla_op(r):
            # the current per-conv path: int8 conv -> s32 materialize ->
            # dequant + residual epilogue pass
            acc = lax.dot_general(h2q, w3, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
            o = acc.astype(jnp.float32) * a3 + b3 + r.astype(jnp.float32)
            return jnp.maximum(o, 0.0).astype(jnp.bfloat16)

        base = chain_time(lambda r: r[:1, :1], res)
        ms = chain_time(xla_op, res) - base
        print(f"P={p} C={c} XLA dot+epilogue      : {ms:7.2f} ms", flush=True)

        for mblk in mblks:
            def pl_op(r, mb=mblk):
                return conv3_residual_int8(h2q, r, w3, a3, b3,
                                           last_relu=True, mblk=mb)
            try:
                ms = chain_time(pl_op, res) - base
                print(f"P={p} C={c} pallas mblk={str(mblk):>5}: {ms:7.2f} ms",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"P={p} C={c} pallas mblk={mblk}: FAILED "
                      f"{str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
