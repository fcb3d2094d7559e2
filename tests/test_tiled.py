"""Tiled large-scene inference: stitched result == whole-scene forward."""

import numpy as np
import jax
import jax.numpy as jnp

from segland_tpu.evallib.tiled import predict_scene, _tile_starts


def test_tile_starts():
    assert _tile_starts(1024, 1024, 896) == [0]
    assert _tile_starts(2048, 1024, 896) == [0, 896, 1024]
    assert _tile_starts(500, 1024, 896) == [0]


def test_predict_scene_matches_whole_forward():
    # a spatially-local "model": 3x3 mean conv + linear head -> the tiled
    # stitched logits must match the whole-scene forward away from borders,
    # and exactly where tiles fully cover (overlap-averaged identical values)
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (3, 5))

    def forward(x):  # [B,H,W,3] -> [B,H,W,5]
        return jnp.einsum("bhwc,ck->bhwk", x, w)

    predict = jax.jit(forward)
    scene = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (100, 130, 3)), np.float32)
    logits, pred = predict_scene(lambda t: predict(jnp.asarray(t)), scene, 5, tile=64, overlap=16, batch=2)
    want = np.asarray(forward(jnp.asarray(scene)[None]))[0]
    np.testing.assert_allclose(logits, want, rtol=1e-5, atol=1e-5)
    assert pred.shape == (100, 130)


def test_predict_scene_small_scene_pads():
    def forward(t):
        return jnp.ones(t.shape[:3] + (4,))

    logits, pred = predict_scene(forward, np.zeros((30, 40, 3), np.float32), 4, tile=64, overlap=8)
    assert logits.shape == (30, 40, 4)
    assert pred.shape == (30, 40)


def test_device_normalize_matches_host():
    import jax
    from segland_tpu.models import build_model
    from segland_tpu.evallib import Evaluator
    from segland_tpu.data import augment as A

    model = build_model("pspnet_pop", backbone="resnet10", n_base=7)
    img_u8 = np.asarray(
        jax.random.randint(jax.random.PRNGKey(0), (1, 32, 32, 3), 0, 255), np.uint8)
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)), train=False)
    host = Evaluator(model, variables, num_classes=8)
    dev = Evaluator(model, variables, num_classes=8, normalize_on_device=True)
    img_f = A.normalize(img_u8[0], A.IMAGENET_MEAN, A.IMAGENET_STD)[None]
    lg_host, pred_host = host.predict_batch(img_f.astype(np.float32), (32, 32))
    lg_dev, pred_dev = dev.predict_batch(img_u8, (32, 32))
    np.testing.assert_allclose(np.asarray(lg_dev), np.asarray(lg_host), rtol=1e-4, atol=1e-4)


def test_predict_scene_device_matches_host(rng):
    """Device-resident stitching (scan + dynamic-slice accumulator) ==
    host predict_scene on the same scene/model (overlap averaging, edge
    snapping, ragged last batch all exercised)."""
    import jax
    import jax.numpy as jnp

    from segland_tpu.evallib.tiled import predict_scene, predict_scene_device
    from segland_tpu.models import build_model
    from segland_tpu.ops.resize import resize_bilinear

    tile, overlap = 64, 16
    model = build_model("pspnet_pop", backbone="resnet10", n_base=7)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, tile, tile, 3), jnp.float32),
                           train=False)
    scene = rng.rand(150, 130, 3).astype(np.float32)

    def apply_fn(variables, tiles):
        lg = model.apply(variables, tiles, train=False)
        return resize_bilinear(lg.astype(jnp.float32), (tile, tile),
                               align_corners=True)

    fwd = jax.jit(apply_fn)
    _, pred_host = predict_scene(lambda t: fwd(variables, jnp.asarray(t)),
                                 scene, num_classes=8, tile=tile,
                                 overlap=overlap, batch=3)
    pred_dev = predict_scene_device(apply_fn, variables, scene, num_classes=8,
                                    tile=tile, overlap=overlap, batch=3)
    agree = float(np.mean(pred_host == pred_dev))
    assert agree >= 0.999, agree
