"""Per-stage dissection of the VGGUNet backbone at serving shapes (b2 1024^2
bf16) via in-jit scan chains (single-op jits are dispatch-bound over the
axon tunnel — benchmarks/chain_probe.py).

Reference analog: networks/vggunet_pop.py:51-81.  Answers VERDICT r2 item 3:
WHERE do the 53.7 ms of UNet backbone go, stage by stage, so the lane-glue
playbook (whole-chain W-packing, merged conv+BN epilogues) is applied where
it pays and the rest gets a roofline closure.

Usage: python benchmarks/vggunet_dissect.py [enc|dec|glue|packed]
"""
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")
from segland_tpu.ops.resize import resize_bilinear
from segland_tpu.ops.pooling import max_pool_2x2

B = 2
CHAIN = 8
ITERS = 3
DT = jnp.bfloat16
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


_BASE = {}


def measure(name, op, x):
    key = (x.shape, str(x.dtype))
    if key not in _BASE:
        _BASE[key] = chain_time(lambda a: a[..., :1, :1], x)
    ms = chain_time(op, x) - _BASE[key]
    print(f"{name}: {ms:7.2f} ms", flush=True)
    return ms


def act(h, w, c, key=0):
    return jax.random.normal(jax.random.PRNGKey(key), (B, h, w, c)).astype(DT)


def wgt(kh, ci, co, key=1):
    return (jax.random.normal(jax.random.PRNGKey(key), (kh, kh, ci, co))
            * 0.05).astype(DT)


def cbr(x, w, s, b):
    """conv3x3 + folded-BN affine + relu (the eval-path op)."""
    y = lax.conv_general_dilated(x, w, (1, 1), [(1, 1)] * 2,
                                 dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.nn.relu(y * s + b)


def stage(name, h, w, convs):
    """Chain of cbr ops at one resolution; convs = [(ci, co), ...]."""
    ws = [(wgt(3, ci, co, 10 + i),
           (jax.random.normal(jax.random.PRNGKey(20 + i), (co,)) * 0.1 + 1).astype(DT),
           (jax.random.normal(jax.random.PRNGKey(30 + i), (co,)) * 0.1).astype(DT))
          for i, (ci, co) in enumerate(convs)]
    x = act(h, w, convs[0][0])

    def op(a):
        y = a
        for wk, s, b in ws:
            y = cbr(y, wk, s, b)
        return y

    return measure(name, op, x)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "enc"
    if which == "enc":
        stage("enc1  1024^2  3->64->64   ", 1024, 1024, [(3, 64), (64, 64)])
        stage("enc2   512^2  64->128->128", 512, 512, [(64, 128), (128, 128)])
        stage("enc3   256^2  128->256x3  ", 256, 256, [(128, 256), (256, 256), (256, 256)])
        stage("enc4   128^2  256->512x3  ", 128, 128, [(256, 512), (512, 512), (512, 512)])
        stage("enc5    64^2  512x3       ", 64, 64, [(512, 512), (512, 512), (512, 512)])
    elif which == "enc45":
        stage("enc4   128^2  256->512x3  ", 128, 128, [(256, 512), (512, 512), (512, 512)])
        stage("enc5    64^2  512x3       ", 64, 64, [(512, 512), (512, 512), (512, 512)])
    elif which == "dec":
        stage("up1dc  128^2 1024->512->256", 128, 128, [(1024, 512), (512, 256)])
        stage("up2dc  256^2  512->256->128", 256, 256, [(512, 256), (256, 128)])
        stage("up3dc  512^2  256->128->64 ", 512, 512, [(256, 128), (128, 64)])
        stage("up4dc 1024^2  128->64->64  ", 1024, 1024, [(128, 64), (64, 64)])
    elif which == "glue":
        # the non-conv ops: pools, resizes, concats at each junction
        for (h, c) in ((1024, 64), (512, 128), (256, 256), (128, 512)):
            measure(f"maxpool2x2 {h}^2x{c}     ",
                    max_pool_2x2, act(h, h, c))
        for (h, c) in ((64, 512), (128, 256), (256, 128), (512, 64)):
            measure(f"resize2x(ac) {h}->{2*h} x{c}",
                    lambda a, hh=h: resize_bilinear(
                        a, (2 * hh, 2 * hh), align_corners=True), act(h, h, c))
        for (h, c) in ((128, 512), (256, 256), (512, 128), (1024, 64)):
            skip = act(h, h, c, key=7)
            measure(f"concat {h}^2 {c}+{c}       ",
                    lambda a, s=skip: jnp.concatenate([s, a], -1), act(h, h, c))
    elif which == "conv_only":
        # bare conv vs conv+affine+relu: isolate the epilogue cost per stage
        for (h, ci, co) in ((1024, 64, 64), (512, 128, 128), (1024, 128, 64)):
            w = wgt(3, ci, co)
            s = jnp.ones((co,), DT)
            b = jnp.zeros((co,), DT)
            x = act(h, h, ci)
            measure(f"bare conv3x3 {h}^2 {ci}->{co} ",
                    lambda a, w=w: lax.conv_general_dilated(
                        a, w, (1, 1), [(1, 1)] * 2,
                        dimension_numbers=("NHWC", "HWIO", "NHWC")), x)
            measure(f"cbr  conv3x3 {h}^2 {ci}->{co} ",
                    lambda a, w=w, s=s, b=b: cbr(a, w, s, b), x)
    elif which == "packed":
        from segland_tpu.ops import packed as pk

        # whole-chain packed enc1 (k=2): pack once, band-conv both cbrs
        k = 2
        w0, w1 = wgt(3, 3, 64, 10), wgt(3, 64, 64, 11)
        s0 = jnp.ones((64,), DT); b0 = jnp.zeros((64,), DT)
        x = act(1024, 1024, 3)

        def packed_chain(a):
            xp = pk.pack(a, k)
            y = jax.nn.relu(pk.conv_packed(xp, w0, None, 1, k)
                            * jnp.tile(s0, k) + jnp.tile(b0, k))
            y = jax.nn.relu(pk.conv_packed(y, w1, None, 1, k)
                            * jnp.tile(s0, k) + jnp.tile(b0, k))
            return pk.unpack(y, k)

        measure("enc1 packed k=2 whole chain", packed_chain, x)

        # packed up4 dc chain at 1024^2 (128->64->64), k=2
        w2, w3 = wgt(3, 128, 64, 12), wgt(3, 64, 64, 13)
        x2 = act(1024, 1024, 128)

        def packed_up4(a):
            xp = pk.pack(a, k)
            y = jax.nn.relu(pk.conv_packed(xp, w2, None, 1, k)
                            * jnp.tile(s0, k) + jnp.tile(b0, k))
            y = jax.nn.relu(pk.conv_packed(y, w3, None, 1, k)
                            * jnp.tile(s0, k) + jnp.tile(b0, k))
            return pk.unpack(y, k)

        measure("up4dc packed k=2 chain     ", packed_up4, x2)
        stage("up4dc plain (for delta)    ", 1024, 1024, [(128, 64), (64, 64)])
    elif which == "packed2":
        from segland_tpu.ops import packed as pk

        k = 2
        s64 = jnp.ones((64,), DT); z64 = jnp.zeros((64,), DT)

        # up3dc packed k=2 (512^2 256->128->64): dc1's co=64 runs half-lane
        # unpacked; dc0's operands are already >=128 so packing it may lose
        w2, w3 = wgt(3, 256, 128, 12), wgt(3, 128, 64, 13)
        s128 = jnp.ones((128,), DT); z128 = jnp.zeros((128,), DT)
        x3 = act(512, 512, 256)

        def packed_up3(a):
            xp = pk.pack(a, k)
            y = jax.nn.relu(pk.conv_packed(xp, w2, None, 1, k)
                            * jnp.tile(s128, k) + jnp.tile(z128, k))
            y = jax.nn.relu(pk.conv_packed(y, w3, None, 1, k)
                            * jnp.tile(s64, k) + jnp.tile(z64, k))
            return pk.unpack(y, k)

        measure("up3dc packed k=2 chain     ", packed_up3, x3)
        # dc1-only packed (dc0 plain): gate packing by operand width
        def half_packed_up3(a):
            w2c, _ = w2, None
            y = lax.conv_general_dilated(a, w2c, (1, 1), [(1, 1)] * 2,
                                         dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = jax.nn.relu(y * s128 + z128)
            yp = pk.pack(y, k)
            y = jax.nn.relu(pk.conv_packed(yp, w3, None, 1, k)
                            * jnp.tile(s64, k) + jnp.tile(z64, k))
            return pk.unpack(y, k)

        measure("up3dc dc1-only packed k=2  ", half_packed_up3, x3)

        # resize 2x on 64ch: plain vs packed-consumer (output stays packed —
        # i.e. do the resize, then a free reshape; the question is whether a
        # packed-INPUT resize (channel-mixing band form) beats the plain one
        xr = act(512, 512, 64)
        measure("resize2x 512->1024 x64 plain",
                lambda a: resize_bilinear(a, (1024, 1024), align_corners=True),
                xr)

        def resize_packed_io(a):
            # H-axis 2x: standard bilinear along H only (64ch, 512 wide ->
            # 1024 rows). W-axis 2x ON PACKED LAYOUT: with align_corners,
            # out[2w] = in[w], out[2w+1] = (in[w]+in[w+1])/2 for w<W-1 —
            # in k=2 packed channels that is one shifted add: block j =
            # [in_w, (in_w + in_{w+1})/2], i.e. concat(x, (x+roll(x))/2).
            ap = pk.pack(a, k)  # free reshape (512 -> 256 cols, 128 ch)
            del ap
            y = resize_bilinear(a, (1024, a.shape[2]), align_corners=True)
            nxt = jnp.concatenate([y[:, :, 1:, :], y[:, :, -1:, :]], 2)
            out_p = jnp.concatenate([y, (y + nxt) * 0.5], -1)  # (B,1024,512,128)
            return out_p  # packed k=2 along W

        measure("resize2x x64 packed-out    ", resize_packed_io, xr)

        # maxpool2x2 consuming a packed tensor: W-pairs ARE the channel
        # blocks; H-pairs via strided max. Output is the plain pooled tensor.
        xq = act(1024, 512, 128)  # enc1 packed output layout

        def pool_packed(a):
            m = jnp.maximum(a[:, 0::2], a[:, 1::2])       # H pairs
            return jnp.maximum(m[..., :64], m[..., 64:])   # W pairs (blocks)

        measure("maxpool2x2 from packed      ", pool_packed, xq)
        measure("maxpool2x2 plain 1024^2x64  ", max_pool_2x2, act(1024, 1024, 64))


if __name__ == "__main__":
    main()
