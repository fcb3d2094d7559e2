"""Round-5 ensemble-serving pricing (VERDICT r4 item 5 table half).

The per-family eval table implies a contest-config cost nobody measured:
running the winning ensemble (e.g. convnext + swin + seghr) per tile.  Two
protocols:

  classic   each member separately, per-member t/s (re-measured here
            back-to-back) -> 1/sum(1/t_i) combined, PLUS the .mat logit
            export the reference protocol pays (fp32 K-map per tile/model)
  device    EnsembleEvaluator: one jit through all members, mean logits,
            argmax on device, uint8 out (the TPU-native form)

Usage: python benchmarks/ensemble_serve.py [batch]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

_cache = os.path.expanduser("~/.cache/segland_tpu/jax")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

MEMBERS = [
    ("convnext_pop", "convnext-t", True),
    ("swin_pop", "swin-s", True),
    ("seghr_pop", "hr-w32", False),
]

probe = jax.jit(lambda t: t.astype(jnp.float32).sum())


def build(name, backbone, fused):
    from segland_tpu.models import build_model

    model = build_model(name, backbone=backbone, n_base=7, dtype=jnp.bfloat16,
                        fused_mlp=fused, fused_attn=fused)
    img0 = jnp.zeros((1, 1024, 1024, 3), jnp.float32)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), img0)
    return model, variables


def time_calls(fn, *args, iters=5):
    for _ in range(2):
        out = fn(*args)
    float(probe(out))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(probe(out))
    return (time.time() - t0) / iters * 1000.0


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    print(f"devices: {jax.devices()}", flush=True)
    from segland_tpu.evallib import EnsembleEvaluator, Evaluator

    img = np.random.RandomState(0).rand(batch, 1024, 1024, 3).astype(np.float32)

    members = []
    member_ms = {}
    for name, bb, fused in MEMBERS:
        model, variables = build(name, bb, fused)
        members.append((model, variables))
        ev = Evaluator(model, variables, num_classes=8, n_base=7)
        ms = time_calls(
            lambda im=jnp.asarray(img), e=ev: e.predict_batch((im, batch),
                                                              (1024, 1024),
                                                              want_logits=False)[1])
        member_ms[name] = ms
        print(f"member {name}/{bb} b{batch}: {ms:.1f} ms/batch "
              f"({batch / ms * 1000:.1f} t/s, pred-only)", flush=True)

    seq_ms = sum(member_ms.values())
    print(f"classic sequential (pred-only, no .mat export): {seq_ms:.1f} "
          f"ms/batch = {batch / seq_ms * 1000:.1f} t/s/chip", flush=True)
    # the reference protocol additionally fetches fp32 logit maps per member
    # ([K=8,1024,1024] fp32 = 32 MB/tile/member) for fusemat — time one fetch
    model, variables = members[0]
    ev = Evaluator(model, variables, num_classes=8, n_base=7)
    t0 = time.time()
    logits, _ = ev.predict_batch((jnp.asarray(img), batch), (1024, 1024),
                                 want_logits=True)
    np.asarray(logits)
    t_fetch = time.time() - t0
    print(f".mat-protocol logits fetch: {t_fetch * 1000:.0f} ms/batch/member "
          f"(x{len(MEMBERS)} members)", flush=True)

    ens = EnsembleEvaluator(members, num_classes=8, n_base=7)
    staged = (jnp.asarray(img), batch)  # device-resident, like the members
    ms = time_calls(lambda: ens.predict_batch(staged, (1024, 1024)))
    print(f"DEVICE-SIDE ensemble ({len(MEMBERS)} members) b{batch}: "
          f"{ms:.1f} ms/batch = {batch / ms * 1000:.1f} t/s/chip "
          f"(uint8 out, no host fusion)", flush=True)


if __name__ == "__main__":
    main()
