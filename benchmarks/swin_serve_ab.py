"""A/B the swin_pop serving config (VERDICT r2 item 2): window-resident
stage layout (SEGLAND_SWIN_WR=1, default) vs the per-block spatial round
trip (SEGLAND_SWIN_WR=0), through the REAL Evaluator serving path (same
protocol as bench.py: b16 1024^2 uint8 tiles, device normalize,
want_logits=False).

The knob is read at trace time — run one process per arm:
  SEGLAND_SWIN_WR=0 python benchmarks/swin_serve_ab.py
  SEGLAND_SWIN_WR=1 python benchmarks/swin_serve_ab.py
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

TILE = 1024
BATCH = 16
ITERS = 30


def main():
    from segland_tpu.models import build_model
    from segland_tpu.evallib.infer import Evaluator

    img = jax.random.randint(jax.random.PRNGKey(1), (BATCH, TILE, TILE, 3),
                             0, 256, jnp.uint8)
    staged = (img, BATCH)
    probe = jax.jit(lambda o: o.astype(jnp.int32).sum())

    model = build_model("swin_pop", backbone="swin-s", n_base=7,
                        dtype=jnp.bfloat16, fused_mlp=True, fused_attn=True)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    ev = Evaluator(model, variables, normalize_on_device=True)

    for _ in range(2):
        _, pred = ev.predict_batch(staged, (TILE, TILE), want_logits=False)
    int(probe(pred))
    t0 = time.time()
    for _ in range(ITERS):
        _, pred = ev.predict_batch(staged, (TILE, TILE), want_logits=False)
    int(probe(pred))
    dt = (time.time() - t0) / ITERS
    wr = os.environ.get("SEGLAND_SWIN_WR", "0")  # match swin.py's default
    print(f"swin_pop/swin-s fused b{BATCH} WR={wr}: {dt*1000:.1f} ms/batch  "
          f"{BATCH/dt:.1f} tiles/s", flush=True)


if __name__ == "__main__":
    main()
