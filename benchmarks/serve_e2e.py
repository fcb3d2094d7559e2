"""Round-5 end-to-end serving re-measure (VERDICT r4 item 4).

The 255 t/s/chip flagship headline is device-only; the one full
disk->decode->device->export profile (BASELINE.md round 1: 64 tiles) predates
the native decoder and most of the serving work.  This harness measures the
CURRENT stack, phase by phase, over >= 256 disk tiles at the flagship config
(convnext_pop/convnext-t fused, b32, uint8 device-normalize):

  decode   full Loader pass (native batched deflate decode), no device
  compute  decode + dispatch + device compute; only a scalar probe returns
  fetch    + uint8 pred fetch to host (the mIoU/export input)
  export   + colormapped GTiff writes (thread pool) — the serving claim

Tiles: 16 unique 1024^2 RGB deflate GeoTIFF-style tiles symlinked to N ids
(decode cost is per-file-read, identical content doesn't matter).

Usage: python benchmarks/serve_e2e.py [n_tiles] [batch]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax
import jax.numpy as jnp

_cache = os.path.expanduser("~/.cache/segland_tpu/jax")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

ROOT = "/tmp/serve_e2e_tiles"


def build_tiles(n_tiles):
    from test_native import _write_tiff

    img_dir = os.path.join(ROOT, "images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    uniq = []
    for i in range(16):
        p = os.path.join(img_dir, f"uniq_{i}.tif")
        if not os.path.exists(p):
            # blocky content so deflate ratios resemble real OEM tiles
            base = rng.randint(0, 255, (64, 64, 3), np.uint8)
            arr = np.kron(base, np.ones((16, 16, 1), np.uint8))
            noise = rng.randint(0, 16, (1024, 1024, 3), np.uint8)
            _write_tiff(p, arr + noise, compression=8)
        uniq.append(p)
    ids = []
    for i in range(n_tiles):
        tid = f"tile_{i:04d}"
        link = os.path.join(img_dir, f"{tid}.tif")
        if not os.path.exists(link):
            os.symlink(uniq[i % 16], link)
        ids.append(tid)
    lst = os.path.join(ROOT, "list.txt")
    with open(lst, "w") as f:
        f.write("\n".join(ids) + "\n")
    return lst


def main():
    n_tiles = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    print(f"devices: {jax.devices()}", flush=True)
    lst = build_tiles(n_tiles)

    from segland_tpu.data import Loader, OEMValDataset
    from segland_tpu.evallib import Evaluator
    from segland_tpu.models import build_model

    valset = OEMValDataset(ROOT, lst, base_size=(1024, 1024),
                           device_normalize=True, stats="imagenet")
    model = build_model("convnext_pop", backbone="convnext-t", n_base=7,
                        dtype=jnp.bfloat16, fused_mlp=True, fused_attn=True)
    img0 = jnp.zeros((1, 1024, 1024, 3), jnp.float32)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), img0)
    ev = Evaluator(model, variables, num_classes=8, n_base=7, mesh=None,
                   normalize_on_device=True)

    def loader():
        return Loader(valset, batch, shuffle=False, drop_last=False,
                      num_workers=0)

    # ---- phase 1: decode only -------------------------------------------
    t0 = time.time()
    nt = 0
    for images, labels, ids in loader():
        nt += len(ids)
    t_decode = time.time() - t0
    print(f"decode-only: {nt} tiles in {t_decode:.2f}s "
          f"({nt / t_decode:.1f} t/s host)", flush=True)

    # ---- phase 2: + device compute (scalar probe, no pred fetch) --------
    probe = jax.jit(lambda p: p.astype(jnp.float32).sum())
    # warm the compile
    for images, labels, ids in loader():
        _, pred = ev.predict_batch(np.asarray(images), (1024, 1024),
                                   want_logits=False)
        float(probe(pred))
        break
    t0 = time.time()
    nt = 0
    last = None
    for staged, labels, ids in ev._device_prefetch(loader(), 2):
        _, pred = ev.predict_batch(staged, (1024, 1024), want_logits=False)
        last = pred
        nt += len(ids)
    float(probe(last))
    t_compute = time.time() - t0
    print(f"decode+compute: {nt} tiles in {t_compute:.2f}s "
          f"({nt / t_compute:.1f} t/s)", flush=True)

    # ---- phase 3: + pred fetch ------------------------------------------
    t0 = time.time()
    nt = 0
    for staged, labels, ids in ev._device_prefetch(loader(), 2):
        _, pred = ev.predict_batch(staged, (1024, 1024), want_logits=False)
        np.asarray(pred)
        nt += len(ids)
    t_fetch = time.time() - t0
    print(f"decode+compute+fetch: {nt} tiles in {t_fetch:.2f}s "
          f"({nt / t_fetch:.1f} t/s)", flush=True)

    # ---- phase 4: full export (the Evaluator serving path) --------------
    out = os.path.join(ROOT, "out")
    os.makedirs(out, exist_ok=True)
    t0 = time.time()
    cm, _, tps = ev.run(loader(), save_path=out, prob_path=None,
                        data_root=None, logger=None)
    t_export = time.time() - t0
    print(f"full export: {n_tiles} tiles in {t_export:.2f}s "
          f"({n_tiles / t_export:.1f} t/s sustained)", flush=True)

    print(f"SUMMARY n={n_tiles} b{batch}: decode {t_decode:.2f}s | "
          f"+compute {t_compute:.2f}s | +fetch {t_fetch:.2f}s | "
          f"+export {t_export:.2f}s", flush=True)


if __name__ == "__main__":
    main()
