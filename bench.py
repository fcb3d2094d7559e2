"""Benchmark: 1024x1024 OEM tile eval throughput on the attached TPU.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline (BASELINE.json): >= 2000 tiles/sec on a v5e-8 at mIoU parity.
This harness measures tiles/sec/chip on the available chip(s); vs_baseline is
normalized against the per-chip share of the 8-chip target (250 tiles/s/chip).

Two paths are measured and both appear in the metric label:
  * bf16 — the accuracy-parity anchor (logits match the torch reference at
    1e-3..5e-4 with converted weights, tests/test_parity_*.py);
  * int8 PTQ (segland_tpu/quant, '--int8' in the eval CLIs) — the production
    serving mode; the reported value.  Its outputs are argmax-identical to
    bf16 on the e2e micro-model (tests/test_e2e.py::test_eval_base_cli_int8)
    and cosine>0.98 on random init (tests/test_quant.py).
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

BASELINE_TILES_PER_SEC_PER_CHIP = 2000 / 8  # v5e-8 target / 8 chips

# deeplab_pop/resnet50 is the fastest family at parity (BASELINE.md sweep:
# int8 b16 154 t/s vs pspnet 108, swin_pop fused 76); reference family
# networks/deeplab_pop.py, logit parity tests/test_parity_more_heads.py
MODEL = "deeplab_pop"
BACKBONE = "resnet50"
TILE = 1024
BATCH_PER_CHIP = 16  # sweep: b16 154.1 t/s, b24 140, b32 155 (BASELINE.md)
WARMUP = 2
ITERS = 10


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

    model = build_model(MODEL, backbone=BACKBONE, n_base=7, dtype=jnp.bfloat16)
    init_img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), init_img)

    img = jax.random.normal(jax.random.PRNGKey(1), (batch, TILE, TILE, 3), jnp.float32)
    if n_chips > 1:
        from segland_tpu.dist import make_mesh, shard_batch, replicate

        mesh = make_mesh()
        variables = replicate(mesh, variables)
        img = shard_batch(mesh, img)

    def post(logits):
        # eval protocol: upsample logits to tile size, then argmax
        # (reference eval_base.py:168); fused by XLA, never hits HBM
        logits = resize_bilinear(logits.astype(jnp.float32), (TILE, TILE), align_corners=True)
        return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

    fwd_bf16 = jax.jit(lambda v, x: post(model.apply(v, x, train=False)))
    # NOTE: QuantConfig(fused_blocks=True) (the Pallas bottleneck kernel)
    # measured SLOWER than XLA's per-conv int8 path here (DMA-latency-bound
    # at ~17us/grid-step; see BASELINE.md) — keep the interceptor path
    q_apply = quantized_apply(model)
    fwd_int8 = jax.jit(lambda v, x: post(q_apply(v, x, train=False)))

    @jax.jit
    def probe(o):
        # tiny scalar reduced on device; its host readback forces completion
        # (block_until_ready alone under-reports over the axon tunnel)
        return o.astype(jnp.int32).sum()

    v_int8 = calibrate(model, variables, [img])
    dt_bf16 = measure(fwd_bf16, variables, img, probe)
    dt_int8 = measure(fwd_int8, v_int8, img, probe)

    bf16_per_chip = batch * ITERS / dt_bf16 / n_chips
    int8_per_chip = batch * ITERS / dt_int8 / n_chips
    print(json.dumps({
        "metric": (f"1024x1024 OEM tiles/sec/chip ({MODEL}/{BACKBONE} eval, int8 PTQ, "
                   f"batch {BATCH_PER_CHIP}/chip; bf16 parity path: {bf16_per_chip:.1f})"),
        "value": round(int8_per_chip, 2),
        "unit": "tiles/sec/chip",
        "vs_baseline": round(int8_per_chip / BASELINE_TILES_PER_SEC_PER_CHIP, 3),
    }))


if __name__ == "__main__":
    main()
