"""Training-step throughput on the attached TPU (round-2 re-measure: the
dropout/DropPath rng threading changed the swin/lsk train paths).

Mirrors the reference configs: base = 768^2 crops AdamW+poly+clip
(scripts/train_oem.sh), ft = swin_pop/swin-s bs1 1024^2 SGD frozen backbone
(scripts/ft_oem.sh).  Steps are 'silent' (donated state, no scalar outputs)
as in the train CLIs; a device probe forces completion.
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from segland_tpu.models import build_model
from segland_tpu.train import create_optimizer, create_train_state, make_base_train_step
from segland_tpu.train.ft import ft_trainable, init_cls_n

probe = jax.jit(lambda t: jax.tree_util.tree_leaves(t)[0].astype(jnp.float32).sum())


def bench_base(model_name, backbone, batch, size=768, iters=6, dtype=jnp.bfloat16,
               fused=False, packed_train=None):
    model = build_model(model_name, backbone=backbone, n_base=7, dtype=dtype,
                        fused_mlp=fused, fused_attn=fused,
                        packed_train=packed_train)
    img = jax.random.normal(jax.random.PRNGKey(1), (batch, size, size, 3), jnp.float32)
    mask = jax.random.randint(jax.random.PRNGKey(2), (batch, size, size), 0, 8)
    variables = jax.jit(lambda k, x: model.init({"params": k, "dropout": k}, x, train=True))(
        jax.random.PRNGKey(0), img[:1, :64, :64])
    tx = create_optimizer(variables["params"], 1e-3, num_epochs=200, steps_per_epoch=64)
    state = create_train_state(model, variables, tx)
    raw = make_base_train_step(model)

    def silent(state, img, mask):
        new_state, _, _ = raw(state, img, mask)
        return new_state

    step = jax.jit(silent, donate_argnums=0)
    for _ in range(2):
        state = step(state, img, mask)
    float(probe(state.params))
    t0 = time.time()
    for _ in range(iters):
        state = step(state, img, mask)
    float(probe(state.params))
    dt = (time.time() - t0) / iters
    print(f"base {model_name}/{backbone} b{batch} {size}^2 fused={fused} "
          f"packed_train={packed_train}: "
          f"{dt*1000:.1f} ms/step {batch/dt:.1f} crops/s", flush=True)


def bench_ft(iters=8, fused=False):
    from segland_tpu.train import make_ft_train_step

    model = build_model("swin_pop", backbone="swin-s", n_base=7, n_novel=4,
                        is_ft=True, dtype=jnp.bfloat16,
                        fused_mlp=fused, fused_attn=fused)
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 1024, 1024, 3), jnp.float32)
    mask = jax.random.randint(jax.random.PRNGKey(2), (1, 1024, 1024), 8, 12)
    img_b = img
    mask_b = jax.random.randint(jax.random.PRNGKey(3), (1, 1024, 1024), 0, 8)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), img[:1, :64, :64])
    tx = create_optimizer(variables["params"], 1e-4, num_epochs=500, steps_per_epoch=20,
                          optimizer="sgd", freeze_backbone=True, fix_lr=True,
                          trainable_fn=ft_trainable)
    state = create_train_state(model, variables, tx)
    state = state.replace(params=init_cls_n(state.params))
    raw = make_ft_train_step(model, n_base=7)

    def silent(state, *a):
        new_state, _, _ = raw(state, *a)
        return new_state

    step = jax.jit(silent)
    for _ in range(2):
        state = step(state, img, mask, img_b, mask_b)
    float(probe(state.params))
    t0 = time.time()
    for _ in range(iters):
        state = step(state, img, mask, img_b, mask_b)
    float(probe(state.params))
    dt = (time.time() - t0) / iters
    print(f"ft swin_pop/swin-s b1 1024^2 fused={fused}: {dt*1000:.1f} ms/step",
          flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "base"):
        bench_base("pspnet_pop", "resnet50", 16)
        bench_base("seghr_pop", "hr-w32", 4)
        bench_base("swin_pop", "swin-s", 4)
    if which in ("all", "ft"):
        bench_ft()
    if which == "packed_vgg":
        # vggunet-only re-run (the first A/B crashed on the double-tiled
        # bias — fixed in round 4)
        bench_base("vggunet_pop", "vgg16bn-unet", 4, packed_train=False)
        bench_base("vggunet_pop", "vgg16bn-unet", 4, packed_train=True)
    if which == "packed":
        # packed_train A/B for lsknet + vggunet (VERDICT r3 item 4): the
        # round-3 mini-run wired the knob with defaults=False citing a
        # BASELINE table that didn't exist — this produces it for real.
        bench_base("lsk_pop", "lsk-t", 8, packed_train=False)
        bench_base("lsk_pop", "lsk-t", 8, packed_train=True)
        bench_base("vggunet_pop", "vgg16bn-unet", 4, packed_train=False)
        bench_base("vggunet_pop", "vgg16bn-unet", 4, packed_train=True)
