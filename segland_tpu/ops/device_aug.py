"""Fused on-device training augmentation (TPU-first data path).

The reference augments every training sample on the host with cv2/numpy
(dataset/oem.py:69-74: crop -> pad -> flip -> k*90 rotate -> normalize) and
ships float32 CHW crops to the device.  Here the whole chain runs *inside
the jitted train step* on batched uint8 tiles:

- host does decode only; the batch crosses PCIe as uint8 (4x less traffic
  than float32, and no host float math on the training critical path);
- the crop's "re-draw while the label crop is entirely ignore" retry loop
  (reference base_dataset.py:150-169) becomes a *bounded* candidate draw:
  an integral image of (label != ignore) prices each candidate window at
  four gathers, and the first valid of `retries` candidates wins — no
  data-dependent trip count under jit (SURVEY build plan §7.3);
- flip / k*90-rotate are select-of-reverses on uint8 (bytes, not floats);
- the BGR->RGB flip + /255 - mean / std normalize (base_dataset.py:29-34)
  runs on device where XLA fuses it into the first convolution.

Numerics: for a fixed (offset, flip, k) draw the output is bitwise equal to
the host pipeline (data/augment.py) in float32 — asserted by
tests/test_device_aug.py.  Randomness uses JAX PRNG (per (seed, step) keys
from the train step), so the *stream* differs from the host's
python/numpy RNGs; distributions match (offsets uniform over margins,
flip p=0.5, k uniform {0,1,2,3}), which is the parity bar the reference
itself sets by reseeding differently every epoch (train_base.py:236).
"""

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax

from ..data.augment import IGNORE_LABEL, OEM_TRAIN_MEAN, OEM_TRAIN_STD


def _valid_integral(label: jnp.ndarray, ignore_label: int) -> jnp.ndarray:
    """Zero-padded 2-D integral image of (label != ignore): window validity
    in O(1) per candidate instead of slicing the window."""
    v = (label != ignore_label).astype(jnp.int32)
    ii = jnp.cumsum(jnp.cumsum(v, axis=0), axis=1)
    return jnp.pad(ii, ((1, 0), (1, 0)))


def _window_count(ii, oy, ox, ch, cw):
    """Non-ignore pixel count of label[oy:oy+ch, ox:ox+cw] via 4 gathers."""
    return (ii[oy + ch, ox + cw] - ii[oy, ox + cw]
            - ii[oy + ch, ox] + ii[oy, ox])


def _rot90s(a: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """a rotated k*90 degrees in the (0,1) plane, k traced in {0,1,2,3}.
    Square inputs only (the host np.rot90 would change a non-square shape,
    which the batch collate could never stack either)."""
    return jnp.select(
        [k == 0, k == 1, k == 2],
        [a, jnp.rot90(a, 1, axes=(0, 1)), jnp.rot90(a, 2, axes=(0, 1))],
        jnp.rot90(a, 3, axes=(0, 1)),
    )


def _pad_to_crop(image, label, crop_hw, ignore_label):
    """Static pre-pad when the crop exceeds the tile (image 0, label ignore:
    reference base_dataset.py:88-104); crop margins then collapse to 0."""
    ch, cw = crop_hw
    h, w = label.shape
    if ch > h or cw > w:
        ph, pw = max(ch - h, 0), max(cw - w, 0)
        image = jnp.pad(image, ((0, ph), (0, pw), (0, 0)))
        label = jnp.pad(label, ((0, ph), (0, pw)), constant_values=ignore_label)
    return image, label


def _apply_draw(image, label, crop_hw, oy, ox, flip, k, mean, std, out_dtype):
    """The deterministic aug chain for one drawn (offset, flip, k):
    crop -> hflip -> k*90 rotate -> normalize."""
    ch, cw = crop_hw
    image = lax.dynamic_slice(image, (oy, ox, 0), (ch, cw, image.shape[-1]))
    label = lax.dynamic_slice(label, (oy, ox), (ch, cw))

    # horizontal flip (base_dataset.py:106-110)
    image = jnp.where(flip, image[:, ::-1], image)
    label = jnp.where(flip, label[:, ::-1], label)

    # k*90-degree rotate (base_dataset.py:134-138)
    image = _rot90s(image, k)
    label = _rot90s(label, k)

    # normalize: BGR->RGB flip, /255, -mean, /std — same op order as
    # data/augment.py:normalize so float32 results are bitwise equal
    x = image.astype(jnp.float32)[..., ::-1]
    x = x / 255.0
    x = x - jnp.asarray(mean, jnp.float32)
    x = x / jnp.asarray(std, jnp.float32)
    return x.astype(out_dtype), label


def _augment_one(key, image, label, *, crop_hw, ignore_label, mean, std,
                 retries, out_dtype):
    ch, cw = crop_hw
    image, label = _pad_to_crop(image, label, crop_hw, ignore_label)
    h, w = label.shape

    k_crop, k_flip, k_rot = jax.random.split(key, 3)

    # bounded crop retry: first candidate whose window has any non-ignore
    # pixel (falls back to candidate 0 when the whole tile is ignore — the
    # reference would spin forever on such a tile)
    offs = jax.random.randint(k_crop, (retries, 2), 0,
                              jnp.array([h - ch + 1, w - cw + 1]))
    ii = _valid_integral(label, ignore_label)
    valid = jax.vmap(lambda o: _window_count(ii, o[0], o[1], ch, cw) > 0)(offs)
    pick = jnp.argmax(valid)  # first True, 0 if none
    oy, ox = offs[pick, 0], offs[pick, 1]
    # fallback = every candidate window was all-ignore although the tile does
    # contain labeled pixels (a sparse tile the bounded retry missed); the
    # reference's unbounded retry would have kept drawing.  Surfaced per
    # batch so degenerate tiles are observable (see base_train_augment).
    fallback = (~valid.any()) & (ii[-1, -1] > 0)

    flip = jax.random.uniform(k_flip) < 0.5  # p=0.5
    k = jax.random.randint(k_rot, (), 0, 4)  # uniform {0,1,2,3}
    img_out, lab_out = _apply_draw(image, label, crop_hw, oy, ox, flip, k,
                                   mean, std, out_dtype)
    return img_out, lab_out, fallback


def _augment_one_forced(image, label, crop_hw, off, flip, k,
                        ignore_label=IGNORE_LABEL, mean=OEM_TRAIN_MEAN,
                        std=OEM_TRAIN_STD, out_dtype=jnp.float32):
    """Deterministic variant for tests: apply a given (offset, flip, k)."""
    image, label = _pad_to_crop(image, jnp.asarray(label, jnp.int32),
                                crop_hw, ignore_label)
    return _apply_draw(image, label, crop_hw, off[0], off[1],
                       jnp.asarray(flip), jnp.asarray(k), mean, std, out_dtype)


def base_train_augment(key, images, labels, crop_size: Sequence[int],
                       ignore_label: int = IGNORE_LABEL,
                       mean: Sequence[float] = OEM_TRAIN_MEAN,
                       std: Sequence[float] = OEM_TRAIN_STD,
                       retries: int = 8, out_dtype=jnp.float32,
                       return_stats: bool = False):
    """Batched on-device base-training augmentation.

    images: [B,H,W,3] uint8 raw tiles; labels: [B,H,W] integer.
    Returns (images [B,ch,cw,3] normalized out_dtype, labels [B,ch,cw] int32);
    with return_stats also the per-batch count of samples where every crop
    candidate was all-ignore despite labeled pixels existing (the bounded
    analog of the reference's unbounded crop retry giving up — wired into the
    train step's loss dict as 'aug_fallback' so sparse tiles are observable).
    """
    ch, cw = int(crop_size[0]), int(crop_size[1])
    if ch != cw:
        raise ValueError("k*90 rotation requires a square crop, got "
                         f"{(ch, cw)} (the host pipeline could not collate a "
                         "non-square rotated batch either)")
    fn = functools.partial(
        _augment_one, crop_hw=(ch, cw), ignore_label=ignore_label,
        mean=tuple(mean), std=tuple(std), retries=int(retries),
        out_dtype=out_dtype)
    keys = jax.random.split(key, images.shape[0])
    imgs, labs, fallback = jax.vmap(fn)(keys, images, labels.astype(jnp.int32))
    if return_stats:
        return imgs, labs, jnp.sum(fallback.astype(jnp.float32))
    return imgs, labs
