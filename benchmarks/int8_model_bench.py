"""Measure int8 PTQ vs bf16 on full models at 1024^2 eval (real TPU)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from segland_tpu.models import build_model
from segland_tpu.quant import calibrate, quantized_apply
from segland_tpu.ops.resize import resize_bilinear

TILE = 1024


def bench(model_name, backbone, batch, iters=10, quant_cfg=None, tag8="int8"):
    model = build_model(model_name, backbone=backbone, n_base=7, dtype=jnp.bfloat16)
    img0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(jax.random.PRNGKey(0), img0)
    img = jax.random.normal(jax.random.PRNGKey(1), (batch, TILE, TILE, 3), jnp.float32)

    def post(logits):
        logits = resize_bilinear(logits.astype(jnp.float32), (TILE, TILE), align_corners=True)
        return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

    f_bf16 = jax.jit(lambda v, x: post(model.apply(v, x, train=False)))
    q_apply = (quantized_apply(model, quant_cfg) if quant_cfg is not None
               else quantized_apply(model))
    f_int8 = jax.jit(lambda v, x: post(q_apply(v, x, train=False)))
    probe = jax.jit(lambda o: o.astype(jnp.int32).sum())

    print(f"--- {model_name}/{backbone} batch {batch}", flush=True)
    t0 = time.time()
    v_q = calibrate(model, variables, [img])
    print(f"calibrated in {time.time()-t0:.1f}s "
          f"({len(jax.tree_util.tree_leaves(v_q['quant']))} scales)", flush=True)

    for tag, fn, v in (("bf16", f_bf16, variables), (tag8, f_int8, v_q)):
        for _ in range(2):
            out = fn(v, img)
        int(probe(out))
        t0 = time.time()
        for _ in range(iters):
            out = fn(v, img)
        int(probe(out))
        dt = (time.time() - t0) / iters
        print(f"{tag}: {dt*1000:.1f} ms/batch  {batch/dt:.1f} tiles/s", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "resnet"
    if which == "resnet":
        bench("pspnet_pop", "resnet50", 16)
    elif which == "deeplab":
        bench("deeplab_pop", "resnet50", 16)
    elif which == "deeplab_conv3":
        # round-4 conv3+residual Pallas epilogue A/B (VERDICT r3 item 6)
        from segland_tpu.quant import QuantConfig

        bench("deeplab_pop", "resnet50", 16,
              quant_cfg=QuantConfig(fused_conv3=True), tag8="int8+conv3")
    elif which == "deeplab_conv3_b32":
        from segland_tpu.quant import QuantConfig

        bench("deeplab_pop", "resnet50", 32,
              quant_cfg=QuantConfig(fused_conv3=True), tag8="int8+conv3")
    elif which == "swin":
        bench("swin_pop", "swin-s", 8)
    elif which == "vggunet":
        # batch-saturated at b2 (BASELINE.md); full-res 64..512ch VGG convs
        # are the same deep-3x3 profile where int8 won 1.5-1.6x on resnet
        bench("vggunet_pop", "vgg16bn-unet", 2)
    elif which == "lsk":
        bench("lsk_pop", "lsk-t", 32)
