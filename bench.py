"""Benchmark: 1024x1024 OEM tile eval throughput on the attached TPU.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline (BASELINE.json): >= 2000 tiles/sec on a v5e-8 at mIoU parity.
This harness measures tiles/sec/chip on the available chip(s); vs_baseline is
normalized against the per-chip share of the 8-chip target (250 tiles/s/chip).

Flagship: convnext_pop / convnext-t in bf16 with the fused Pallas LN+MLP
kernel and the commuted FPN-OCR decoder — the fastest family at parity
(BASELINE.md: 189.6 t/s vs deeplab int8 158, pspnet int8 108, fused swin 76)
AND the accuracy-parity path itself (logits match the torch reference at
1e-3 with converted weights, tests/test_parity_more_heads.py).  The int8 PTQ
serving mode for the resnet families (deeplab/pspnet, ~1.45x there) is
measured as the secondary number in the label.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

BASELINE_TILES_PER_SEC_PER_CHIP = 2000 / 8  # v5e-8 target / 8 chips

MODEL = "convnext_pop"
BACKBONE = "convnext-t"
ALT_MODEL = "deeplab_pop"       # int8 serving reference point
ALT_BACKBONE = "resnet50"
TILE = 1024
BATCH_PER_CHIP = 32             # flat 16->32 on v5e, slightly better at 32
WARMUP = 2
ITERS = 60  # the axon tunnel front-loads ~60 ms on a timing loop: 10-iter
            # loops are inflated ~6 ms/iter (BASELINE.md), 30-iter ~2, 60 ~1

# serving input protocol: uint8 tiles + on-device normalization, exactly the
# eval_base --device-normalize path (evallib/infer.py Evaluator._pre) — the
# host->device link carries 3 MB/tile instead of 12 and the fp32 normalize
# fuses into the first conv's input read
_MEAN = jnp.asarray((0.485, 0.456, 0.406), jnp.float32)
_STD = jnp.asarray((0.229, 0.224, 0.225), jnp.float32)


def _pre(img_u8):
    img = img_u8[..., ::-1].astype(jnp.float32) / 255.0
    return (img - _MEAN) / _STD


def measure(forward, variables, img, probe):
    for _ in range(WARMUP):
        out = forward(variables, img)
    int(probe(out))
    t0 = time.time()
    for _ in range(ITERS):
        out = forward(variables, img)
    int(probe(out))
    return time.time() - t0


def main():
    from segland_tpu.models import build_model
    from segland_tpu.ops.resize import resize_bilinear
    from segland_tpu.quant import calibrate, quantized_apply

    n_chips = jax.device_count()
    batch = BATCH_PER_CHIP * n_chips

    img = jax.random.randint(jax.random.PRNGKey(1), (batch, TILE, TILE, 3), 0, 256,
                             jnp.uint8)
    mesh = None
    if n_chips > 1:
        from segland_tpu.dist import make_mesh, replicate, shard_batch

        mesh = make_mesh()
        img = shard_batch(mesh, img)

    def post(logits):
        # eval protocol: upsample logits to tile size, then argmax
        # (reference eval_base.py:168)
        logits = resize_bilinear(logits.astype(jnp.float32), (TILE, TILE), align_corners=True)
        return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

    @jax.jit
    def probe(o):
        # tiny scalar reduced on device; its host readback forces completion
        # (block_until_ready alone under-reports over the axon tunnel)
        return o.astype(jnp.int32).sum()

    def prep(model_name, backbone, **model_kw):
        model = build_model(model_name, backbone=backbone, n_base=7,
                            dtype=jnp.bfloat16, **model_kw)
        variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
        if mesh is not None:
            from segland_tpu.dist import replicate

            variables = replicate(mesh, variables)
        return model, variables

    def make_fwd(apply_fn):
        # over a mesh: shard_map on the batch axis, mirroring
        # evallib.infer.Evaluator._make_fwd — GSPMD treats Pallas kernels as
        # opaque custom calls and would otherwise all-gather their operands,
        # which would misreport tiles/s/chip on multichip hosts
        def fwd(v, x):
            return post(apply_fn(v, _pre(x), train=False))

        if mesh is not None:
            from jax.sharding import PartitionSpec as P
            from jax.experimental.shard_map import shard_map

            fwd = shard_map(fwd, mesh=mesh, in_specs=(P(), P("data")),
                            out_specs=P("data"), check_rep=False)
        return jax.jit(fwd)

    # flagship: bf16 + fused kernels + commuted decoder (the parity path)
    model, variables = prep(MODEL, BACKBONE, fused_mlp=True)
    fwd = make_fwd(model.apply)
    dt = measure(fwd, variables, img, probe)
    flagship = batch * ITERS / dt / n_chips

    # secondary: int8 PTQ serving on the resnet family
    alt, alt_vars = prep(ALT_MODEL, ALT_BACKBONE)
    q_apply = quantized_apply(alt)
    fwd_int8 = make_fwd(q_apply)
    v_int8 = calibrate(alt, alt_vars, [jax.jit(_pre)(img)])
    dt8 = measure(fwd_int8, v_int8, img, probe)
    alt_tps = batch * ITERS / dt8 / n_chips

    print(json.dumps({
        "metric": (f"1024x1024 OEM tiles/sec/chip ({MODEL}/{BACKBONE} bf16 eval, "
                   f"fused Pallas kernels, batch {BATCH_PER_CHIP}/chip; "
                   f"secondary {ALT_MODEL} int8 PTQ: {alt_tps:.1f})"),
        "value": round(flagship, 2),
        "unit": "tiles/sec/chip",
        "vs_baseline": round(flagship / BASELINE_TILES_PER_SEC_PER_CHIP, 3),
    }))


if __name__ == "__main__":
    main()
