"""Per-stage int8/bf16 cost of resnet50-OS8 at 1024^2 b16 (chained), to find
where the backbone's 68 ms (vs ~23 ms flop-ideal) goes."""
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

sys.path.insert(0, "/root/repo")
from segland_tpu.models.backbones.resnet import _make_layer
from segland_tpu.quant import calibrate, quantized_apply

B = 16
CHAIN, ITERS = 6, 3
probe = jax.jit(lambda o: o.astype(jnp.float32).sum())


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


class Stage(nn.Module):
    planes: int
    blocks: int
    in_planes: int
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        for blk in _make_layer(self.planes, self.blocks, self.in_planes,
                               stride=self.stride, dilation=self.dilation,
                               dtype=jnp.bfloat16):
            x = blk(x, train)
        return x


_BASE = {}


def measure_stage(name, planes, blocks, cin, hw, stride=1, dil=1, gflops_tile=0.0):
    mod = Stage(planes, blocks, cin, stride, dil)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, hw, hw, cin)).astype(jnp.bfloat16)
    v = jax.jit(lambda k, a: mod.init(k, a))(jax.random.PRNGKey(0),
                                             jnp.zeros((1, 32, 32, cin), jnp.bfloat16))
    key = (x.shape, str(x.dtype))
    if key not in _BASE:
        _BASE[key] = chain_time(lambda a: a[..., :1, :1], x)
    ms_bf = chain_time(lambda a: mod.apply(v, a), x) - _BASE[key]
    q = quantized_apply(mod)
    vq = calibrate(mod, v, [x])
    ms_i8 = chain_time(lambda a: q(vq, a), x) - _BASE[key]
    ideal = gflops_tile * B / 394.0  # ms at int8 peak (394 GFLOP/ms)
    print(f"{name}: bf16 {ms_bf:6.2f} ms   int8 {ms_i8:6.2f} ms   "
          f"(int8 flop-ideal ~{ideal:.1f} ms)", flush=True)


if __name__ == "__main__":
    measure_stage("layer1 3blk @256^2  64/256 ", 64, 3, 64, 256, gflops_tile=14.2)
    measure_stage("layer2 4blk @256->128 128  ", 128, 4, 256, 256, stride=2, gflops_tile=21.7)
    measure_stage("layer3 6blk @128^2 dil2 256", 256, 6, 512, 128, dil=2, gflops_tile=122.9)
    measure_stage("layer4 3blk @128^2 dil4 512", 512, 3, 1024, 128, dil=4, gflops_tile=270.5)
