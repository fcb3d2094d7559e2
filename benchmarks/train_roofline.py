"""Round-5 train-side roofline program (VERDICT r4 item 2).

The eval side got four rounds of per-op accounting; training had spot
numbers only, and convnext_pop — the serving flagship — had never had a
base-train step timed.  This harness produces, per family at the reference
base config (768^2 crops, AdamW + poly + clip 5.0, scripts/train_oem.sh):

  fwd        forward + loss only (scalar out)
  fwd+bwd    adds jax.grad (grad-norm scalar out, no update)
  step       the full silent donated train step (the CLI path)
  flops      XLA cost-analysis flops of the fwd+bwd program -> % of the
             v5e bf16 MXU peak (197 TFLOP/s), the floor statement

Modes:
  families          the per-family table (8 rows, round-4 batch choices)
  convnext          flagship deep-dive: batch sweep + fused A/B
  fused_ab          fused-kernel A/B for the transformer-ish families
  <name> <backbone> <batch> single row

Protocol: silent donated steps, 2 warmup + ITERS timed, device-probe
readback (CLAUDE.md: block_until_ready under-reports over the axon tunnel).
Keep the host idle; run with logs to a file.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

_cache = os.path.expanduser("~/.cache/segland_tpu/jax")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

sys.path.insert(0, "/root/repo")
from segland_tpu.models import build_model
from segland_tpu.train import (create_optimizer, create_train_state,
                               make_base_train_step)

probe = jax.jit(lambda t: jax.tree_util.tree_leaves(t)[0].astype(jnp.float32).sum())

V5E_BF16_PEAK = 197e12

ITERS = 6


def _time_scalar(fn, *args, iters=ITERS):
    """fn(*args) -> device scalar; ms/call via host readback of the scalar."""
    for _ in range(2):
        out = fn(*args)
    float(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(out)
    return (time.time() - t0) / iters * 1000.0


def _time_step(step, state, *args, iters=ITERS):
    """Donated train step; ms/step via a param probe readback."""
    for _ in range(2):
        state = step(state, *args)
    float(probe(state.params))
    t0 = time.time()
    for _ in range(iters):
        state = step(state, *args)
    float(probe(state.params))
    return (time.time() - t0) / iters * 1000.0


def bench_family(model_name, backbone, batch, size=768, dtype=jnp.bfloat16,
                 fused=False, packed_train=None, label="", device_aug=False):
    model = build_model(model_name, backbone=backbone, n_base=7, dtype=dtype,
                        fused_mlp=fused, fused_attn=fused,
                        packed_train=packed_train)
    if device_aug:
        # the CLI --device-augment protocol: raw uint8 1024^2 tiles in, the
        # whole crop/flip/rot/normalize chain inside the jitted step
        img = jax.random.randint(jax.random.PRNGKey(1),
                                 (batch, 1024, 1024, 3), 0, 256, jnp.uint8)
        mask = jax.random.randint(jax.random.PRNGKey(2), (batch, 1024, 1024),
                                  0, 8)
    else:
        img = jax.random.normal(jax.random.PRNGKey(1), (batch, size, size, 3),
                                jnp.float32)
        mask = jax.random.randint(jax.random.PRNGKey(2), (batch, size, size),
                                  0, 8)
    variables = jax.jit(lambda k, x: model.init({"params": k, "dropout": k},
                                                x, train=True))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    tx = create_optimizer(variables["params"], 1e-3, num_epochs=200,
                          steps_per_epoch=64)
    state = create_train_state(model, variables, tx)
    augment_fn = None
    if device_aug:
        import functools

        from segland_tpu.ops.device_aug import base_train_augment

        augment_fn = functools.partial(base_train_augment,
                                       crop_size=(size, size),
                                       return_stats=True)
    raw = make_base_train_step(model, augment_fn=augment_fn)

    # ---- fwd only: loss scalar ------------------------------------------
    t_fwd = t_fb = float("nan")
    flops = None

    def fwd(state, img, mask):
        from segland_tpu.losses import orth_loss

        rngs = {"dropout": jax.random.PRNGKey(3)}
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        (logits, sim), _ = state.apply_fn(
            variables, img, train=True, mutable=["batch_stats"], rngs=rngs,
            method=type(model).forward_base)
        return orth_loss(logits, mask, sim)["total_loss"]

    # SEGLAND_ROOFLINE_STEPONLY=1: skip the fwd / fwd+bwd probe programs
    # (their giant one-off compiles crashed the remote compile helper on
    # hrnet's fuse lattice) and measure only the production step
    steponly = os.environ.get("SEGLAND_ROOFLINE_STEPONLY", "") == "1"
    if not device_aug and not steponly:
        fwd_j = jax.jit(fwd)
        t_fwd = _time_scalar(fwd_j, state, img, mask)

        # ---- fwd+bwd: grad-norm scalar, no update -----------------------
        def fwdbwd(state, img, mask):
            import optax

            g = jax.grad(lambda p: fwd(state.replace(params=p), img, mask))(
                state.params)
            return optax.global_norm(g)

        fb_j = jax.jit(fwdbwd)
        t_fb = _time_scalar(fb_j, state, img, mask)

        try:
            ca = fb_j.lower(state, img, mask).compile().cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            flops = ca.get("flops")
        except Exception:
            pass

    # ---- full silent donated step (the CLI protocol) --------------------
    def silent(state, img, mask):
        new_state, _, _ = raw(state, img, mask)
        return new_state

    step = jax.jit(silent, donate_argnums=0)
    t_step = _time_step(step, state, img, mask)

    pct = (flops / (t_fb / 1e3) / V5E_BF16_PEAK * 100.0) if flops else float("nan")
    print(f"ROOFLINE {model_name}/{backbone} b{batch} {size}^2 fused={fused} "
          f"packed={packed_train} devaug={device_aug}{label}: fwd {t_fwd:.1f} "
          f"| fwd+bwd {t_fb:.1f} "
          f"| step {t_step:.1f} ms ({batch / (t_step / 1e3):.1f} crops/s) | "
          f"update {t_step - t_fb:.1f} | bwd/fwd {(t_fb - t_fwd) / max(t_fwd, 1e-9):.2f} "
          f"| flops {flops if flops else 'n/a'} -> {pct:.0f}% bf16 peak",
          flush=True)
    return t_fwd, t_fb, t_step


FAMILIES = [
    # (model, backbone, batch) — batches match the round-4 comparables
    ("pspnet_pop", "resnet50", 16),
    ("pspplus_pop", "resnet50v2", 16),
    ("deeplab_pop", "resnet50", 16),
    ("seghr_pop", "hr-w32", 4),
    ("swin_pop", "swin-s", 4),
    ("convnext_pop", "convnext-t", 16),
    ("lsk_pop", "lsk-t", 8),
    ("vggunet_pop", "vgg16bn-unet", 4),
]


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "families"
    print(f"devices: {jax.devices()}", flush=True)
    if which == "families":
        for name, bb, b in FAMILIES:
            bench_family(name, bb, b)
    elif which == "convnext":
        # first-ever convnext_pop base-train numbers: batch sweep + fused A/B
        for b in (4, 8, 16):
            bench_family("convnext_pop", "convnext-t", b)
        for b in (8, 16):
            bench_family("convnext_pop", "convnext-t", b, fused=True)
    elif which == "fused_ab":
        for name, bb, b in (("swin_pop", "swin-s", 4),
                            ("convnext_pop", "convnext-t", 16),
                            ("lsk_pop", "lsk-t", 8)):
            bench_family(name, bb, b, fused=False)
            bench_family(name, bb, b, fused=True)
    elif which == "devaug":
        # --device-augment beyond pspnet (VERDICT r4 item 2): step-time cost
        # of moving the whole host aug chain into the jit, per family
        for name, bb, b in (("seghr_pop", "hr-w32", 4),
                            ("convnext_pop", "convnext-t", 16),
                            ("swin_pop", "swin-s", 4)):
            bench_family(name, bb, b, device_aug=False)
            bench_family(name, bb, b, device_aug=True)
    else:
        name, bb, b = sys.argv[1], sys.argv[2], int(sys.argv[3])
        size = int(sys.argv[4]) if len(sys.argv) > 4 and sys.argv[4].isdigit() else 768
        fused = "--fused" in sys.argv
        bench_family(name, bb, b, size=size, fused=fused)


if __name__ == "__main__":
    main()
