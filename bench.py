"""Benchmark: 1024x1024 OEM tile eval throughput on the attached TPU.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline (BASELINE.json): >= 2000 tiles/sec on a v5e-8 at mIoU parity.
This harness measures tiles/sec/chip on the available chip(s); vs_baseline is
normalized against the per-chip share of the 8-chip target (250 tiles/s/chip).
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

BASELINE_TILES_PER_SEC_PER_CHIP = 2000 / 8  # v5e-8 target / 8 chips

MODEL = "pspnet_pop"
BACKBONE = "resnet50"
TILE = 1024
BATCH_PER_CHIP = 16  # measured ~10% faster than 8 on v5e (see BASELINE.md)
WARMUP = 2
ITERS = 10


def main():
    from segland_tpu.models import build_model

    n_chips = jax.device_count()
    batch = BATCH_PER_CHIP * n_chips

    model = build_model(MODEL, backbone=BACKBONE, n_base=7, dtype=jnp.bfloat16)
    init_img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), init_img, train=False)

    img = jax.random.normal(jax.random.PRNGKey(1), (batch, TILE, TILE, 3), jnp.float32)
    if n_chips > 1:
        from segland_tpu.dist import make_mesh, shard_batch, replicate

        mesh = make_mesh()
        variables = replicate(mesh, variables)
        img = shard_batch(mesh, img)

    @jax.jit
    def forward(variables, img):
        logits = model.apply(variables, img, train=False)
        # eval protocol: argmax at feature res is NOT enough — upsample to
        # tile size first (reference eval_base.py:168)
        from segland_tpu.ops.resize import resize_bilinear

        logits = resize_bilinear(logits.astype(jnp.float32), (TILE, TILE), align_corners=True)
        return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

    @jax.jit
    def probe(o):
        # tiny scalar reduced on device; its host readback forces completion
        # (block_until_ready alone under-reports over the axon tunnel)
        return o.astype(jnp.int32).sum()

    for _ in range(WARMUP):
        out = forward(variables, img)
    int(probe(out))
    t0 = time.time()
    for _ in range(ITERS):
        out = forward(variables, img)
    int(probe(out))
    dt = time.time() - t0

    tiles_per_sec = batch * ITERS / dt
    per_chip = tiles_per_sec / n_chips
    print(json.dumps({
        "metric": f"1024x1024 OEM tiles/sec/chip ({MODEL}/{BACKBONE} eval, bf16, batch {BATCH_PER_CHIP}/chip)",
        "value": round(per_chip, 2),
        "unit": "tiles/sec/chip",
        "vs_baseline": round(per_chip / BASELINE_TILES_PER_SEC_PER_CHIP, 3),
    }))


if __name__ == "__main__":
    main()
