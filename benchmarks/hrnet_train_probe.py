"""A/B: HRNet-w32 train step (grad + sgd) with packed_train on/off.

Decides whether train-mode W-packing of the branch chains pays: the eval
packing won 1.84x on seghr_pop, but the band convs inflate dense FLOPs 2x
(kw_p*k/kh) and the backward adds another band-conv transpose per layer,
so the train-mode balance must be measured, not assumed.

Usage: python benchmarks/hrnet_train_probe.py [batch] [size]
"""
import sys
import time

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, "/root/repo")
from segland_tpu.models.backbones.hrnet import HighResolutionNet

probe = jax.jit(lambda t: jax.tree_util.tree_leaves(t)[0].astype(jnp.float32).sum())


def bench(packed_train, batch, size, iters=6, dtype=jnp.bfloat16):
    m = HighResolutionNet(packed=True, packed_train=packed_train, dtype=dtype)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, size, size, 3), jnp.float32)
    v = jax.jit(lambda k, a: m.init(k, a, train=True))(
        jax.random.PRNGKey(0), x[:1, :64, :64])
    tx = optax.sgd(1e-3)
    opt = tx.init(v["params"])

    def loss_fn(p, bs, x):
        outs, muts = m.apply({"params": p, "batch_stats": bs}, x, train=True,
                             mutable=["batch_stats"])
        return sum((o.astype(jnp.float32) ** 2).mean() for o in outs), muts

    def step(carry, x):
        p, bs, opt = carry
        (_, muts), g = jax.value_and_grad(loss_fn, has_aux=True)(p, bs, x)
        up, opt = tx.update(g, opt)
        return (optax.apply_updates(p, up), muts["batch_stats"], opt)

    step = jax.jit(step, donate_argnums=0)
    carry = (v["params"], v["batch_stats"], opt)
    for _ in range(2):
        carry = step(carry, x)
    float(probe(carry[0]))
    t0 = time.time()
    for _ in range(iters):
        carry = step(carry, x)
    float(probe(carry[0]))
    dt = (time.time() - t0) / iters
    print(f"hrnet-w32 train b{batch} {size}^2 packed_train={packed_train}: "
          f"{dt*1000:.1f} ms/step {batch/dt:.1f} crops/s", flush=True)


if __name__ == "__main__":
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 768
    bench(False, batch, size)
    bench(True, batch, size)
