"""On-device fused train augmentation (ops/device_aug.py) vs the host
pipeline (data/augment.py, itself golden-tested against the reference's
cv2/numpy semantics in test_data.py)."""

import random as _random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segland_tpu.data import augment as A
from segland_tpu.ops import device_aug as D


def _tile(rs, h=40, w=40, ignore_frac=0.0):
    img = rs.randint(0, 256, (h, w, 3)).astype(np.uint8)
    lab = rs.randint(0, 12, (h, w)).astype(np.int32)
    if ignore_frac:
        m = rs.rand(h, w) < ignore_frac
        lab[m] = A.IGNORE_LABEL
    return img, lab


def test_fixed_draw_matches_host_pipeline_bitwise():
    """For a forced (offset, flip, k) draw the device chain must equal the
    host chain bitwise in float32 (same op order in normalize)."""
    rs = np.random.RandomState(7)
    img, lab = _tile(rs)
    crop = (16, 16)
    for oy, ox, flip, k in [(0, 0, False, 0), (5, 9, True, 1),
                            (24, 24, False, 2), (11, 3, True, 3)]:
        # host: crop -> pad(noop) -> flip -> rot90 -> normalize
        hi = img[oy:oy + crop[0], ox:ox + crop[1]].astype(np.float32)
        hl = lab[oy:oy + crop[0], ox:ox + crop[1]]
        if flip:
            hi, hl = np.flip(hi, 1), np.flip(hl, 1)
        hi, hl = np.rot90(hi, k, (0, 1)), np.rot90(hl, k, (0, 1))
        hi = A.normalize(hi.astype(np.uint8), A.OEM_TRAIN_MEAN, A.OEM_TRAIN_STD)

        di, dl = D._augment_one_forced(
            jnp.asarray(img), jnp.asarray(lab), crop, (oy, ox), flip, k)
        np.testing.assert_array_equal(np.asarray(dl), hl)
        np.testing.assert_array_equal(np.asarray(di), hi)


def test_batch_shapes_dtypes_and_determinism():
    rs = np.random.RandomState(1)
    imgs = np.stack([_tile(rs)[0] for _ in range(4)])
    labs = np.stack([_tile(rs)[1] for _ in range(4)])
    key = jax.random.PRNGKey(3)
    f = jax.jit(lambda k, i, l: D.base_train_augment(
        k, i, l, crop_size=(16, 16), out_dtype=jnp.bfloat16))
    x1, y1 = f(key, imgs, labs)
    x2, y2 = f(key, imgs, labs)
    assert x1.shape == (4, 16, 16, 3) and x1.dtype == jnp.bfloat16
    assert y1.shape == (4, 16, 16) and y1.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    # different key -> different augs (overwhelmingly)
    x3, _ = f(jax.random.PRNGKey(4), imgs, labs)
    assert not np.array_equal(np.asarray(x1), np.asarray(x3))


def test_crop_retry_avoids_all_ignore_windows():
    """A tile where only a thin valid stripe exists: every drawn crop whose
    candidates include a valid window must contain non-ignore pixels."""
    h = w = 64
    crop = (16, 16)
    lab = np.full((h, w), A.IGNORE_LABEL, np.int32)
    lab[:, :24] = 3  # valid windows are the left-side offsets (ox <= 8 gives
    # full overlap; any ox < 24 has some valid pixels)
    img = np.zeros((h, w, 3), np.uint8)
    n_valid = 0
    for s in range(24):
        _, y = D.base_train_augment(
            jax.random.PRNGKey(s), img[None], lab[None], crop_size=crop,
            retries=16)
        if np.any(np.asarray(y[0]) != A.IGNORE_LABEL):
            n_valid += 1
    # 16 candidates, ~49/49 chance a candidate has ox<24 is 1-(25/49)^16 ~ 1
    assert n_valid >= 23


def test_all_ignore_tile_still_yields_a_crop():
    lab = np.full((32, 32), A.IGNORE_LABEL, np.int32)
    img = np.zeros((32, 32, 3), np.uint8)
    x, y = D.base_train_augment(jax.random.PRNGKey(0), img[None], lab[None],
                                crop_size=(16, 16))
    assert x.shape == (1, 16, 16, 3)
    assert np.all(np.asarray(y) == A.IGNORE_LABEL)


def test_crop_larger_than_tile_pads_image_zero_label_ignore():
    rs = np.random.RandomState(2)
    img, lab = _tile(rs, 20, 20)
    lab[:] = 1  # all valid so the pad region is the only ignore
    x, y = D.base_train_augment(jax.random.PRNGKey(5), img[None], lab[None],
                                crop_size=(32, 32))
    y = np.asarray(y[0])
    assert (y == A.IGNORE_LABEL).sum() == 32 * 32 - 20 * 20
    # padded image pixels normalize from 0: (0/255 - .5)/.5 = -1
    x = np.asarray(x[0], np.float32)
    pad_mask = y == A.IGNORE_LABEL
    # rot90/flip keep pad aligned with the label's pad
    assert np.allclose(x[pad_mask], -1.0)


def test_distribution_of_flip_and_rot():
    """Flip ~ Bernoulli(.5), k uniform on {0..3}: sanity over 400 draws via
    a marked corner pixel."""
    img = np.zeros((8, 8, 3), np.uint8)
    img[0, 0] = 255
    lab = np.ones((8, 8), np.int32)
    keys = jax.random.split(jax.random.PRNGKey(9), 400)
    xs, _ = jax.vmap(lambda k: D.base_train_augment(
        k, img[None], lab[None], crop_size=(8, 8)))(keys)
    xs = np.asarray(xs)[:, 0, :, :, 0]  # any channel
    corners = {(0, 0): 0, (0, 7): 0, (7, 7): 0, (7, 0): 0}
    for x in xs:
        pos = np.unravel_index(np.argmax(x), x.shape)
        assert pos in corners
        corners[pos] += 1
    for c, n in corners.items():
        assert 50 <= n <= 150, (c, n, corners)


def test_train_step_integration_uint8_batch():
    """make_base_train_step(augment_fn=...) runs on raw uint8 tiles and the
    loss is finite; mirrors the --device-augment CLI wiring."""
    import functools
    import optax

    from segland_tpu.models import build_model
    from segland_tpu.train import (create_optimizer, create_train_state,
                                   make_base_train_step)

    model = build_model("pspnet_pop", backbone="resnet10", n_base=7)
    crop = (32, 32)
    img0 = jnp.zeros((1,) + crop + (3,), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img0, train=True)
    tx = create_optimizer(variables["params"], 1e-3, num_epochs=1, steps_per_epoch=2)
    state = create_train_state(model, variables, tx)
    aug = functools.partial(D.base_train_augment, crop_size=crop)
    step = jax.jit(make_base_train_step(model, augment_fn=aug), donate_argnums=0)

    rs = np.random.RandomState(0)
    tiles = rs.randint(0, 256, (2, 48, 48, 3)).astype(np.uint8)
    labs = rs.randint(0, 8, (2, 48, 48)).astype(np.int32)
    state, ld, gn = step(state, jnp.asarray(tiles), jnp.asarray(labs))
    assert np.isfinite(float(ld["total_loss"]))
    assert np.isfinite(float(gn))
