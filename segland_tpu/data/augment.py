"""Host-side numpy augmentations matching reference dataset/base_dataset.py.

The OEM training pipeline uses: crop (retry while all-ignore) -> pad ->
random horizontal flip -> k*90-degree rotate -> normalize (BGR->RGB flip,
/255, -mean, /std) (reference dataset/oem.py:69-74).  Resizes (used by the
resize_label eval path) use PIL in place of cv2 (cv2 absent in this image);
both implement the standard half-pixel bilinear so results agree to rounding.

Randomness: functions take a python ``random.Random`` + ``numpy`` generator
pair to mirror the reference's use of both RNGs (crop offsets use np.random,
flips/rotations use random.random — base_dataset.py:106-155).
"""

import random as _random
from typing import Sequence

import numpy as np
from PIL import Image

IGNORE_LABEL = 255
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
OEM_TRAIN_MEAN = (0.5, 0.5, 0.5)  # reference dataset/oem.py:26-27
OEM_TRAIN_STD = (0.5, 0.5, 0.5)


def normalize(image: np.ndarray, mean: Sequence[float], std: Sequence[float]) -> np.ndarray:
    """BGR->RGB channel flip, /255, -mean, /std (base_dataset.py:29-34)."""
    image = image.astype(np.float32)[:, :, ::-1]
    image = image / 255.0
    image = image - np.asarray(mean, np.float32)
    image = image / np.asarray(std, np.float32)
    return image


def pad(output_size, image, label=None, ignore_label: int = IGNORE_LABEL):
    """Bottom/right zero-pad image, ignore-pad label (base_dataset.py:88-104)."""
    pad_h = max(output_size[0] - image.shape[0], 0)
    pad_w = max(output_size[1] - image.shape[1], 0)
    if pad_h > 0 or pad_w > 0:
        image = np.pad(image, ((0, pad_h), (0, pad_w), (0, 0)), constant_values=0.0)
        if label is not None:
            label = np.pad(label, ((0, pad_h), (0, pad_w)), constant_values=ignore_label)
    return (image, label) if label is not None else image


def random_flip(rng: _random.Random, image, label, p: float = 0.5):
    if rng.random() < p:
        image = np.flip(image, axis=1)
        label = np.flip(label, axis=1)
    return image, label


def fixed_random_rotate(rng: _random.Random, image, label):
    """k*90-degree rotate, k uniform in {0,1,2,3} (base_dataset.py:134-138)."""
    k = int(rng.random() // 0.25)
    return np.rot90(image, k, (0, 1)), np.rot90(label, k, (0, 1))


def crop_train(nprng: np.random.RandomState, image, label, crop_size,
               ignore_label: int = IGNORE_LABEL):
    """Random crop, re-drawn while the label crop is entirely ignore
    (base_dataset.py:140-169)."""
    img_h, img_w = label.shape
    crop_h, crop_w = crop_size
    margin_h = max(img_h - crop_h, 0)
    margin_w = max(img_w - crop_w, 0)
    h_off = nprng.randint(0, margin_h + 1)
    w_off = nprng.randint(0, margin_w + 1)
    label_c = label[h_off : h_off + crop_h, w_off : w_off + crop_w]
    uniq = np.unique(label_c).tolist()
    while len(uniq) == 1 and ignore_label in uniq:
        h_off = nprng.randint(0, margin_h + 1)
        w_off = nprng.randint(0, margin_w + 1)
        label_c = label[h_off : h_off + crop_h, w_off : w_off + crop_w]
        uniq = np.unique(label_c).tolist()
    image = image[h_off : h_off + crop_h, w_off : w_off + crop_w]
    return image, label_c


def crop_val(image, label, crop_size):
    """Center crop (base_dataset.py:170-174)."""
    img_h, img_w = label.shape
    crop_h, crop_w = crop_size
    h_off = int(round(max(img_h - crop_h, 0) / 2.0))
    w_off = int(round(max(img_w - crop_w, 0) / 2.0))
    return (
        image[h_off : h_off + crop_h, w_off : w_off + crop_w],
        label[h_off : h_off + crop_h, w_off : w_off + crop_w],
    )


def _pil_resize(arr: np.ndarray, dsize_wh, resample) -> np.ndarray:
    if arr.ndim == 3:
        return np.stack(
            [np.asarray(Image.fromarray(arr[..., c]).resize(dsize_wh, resample)) for c in range(arr.shape[2])],
            axis=-1,
        )
    return np.asarray(Image.fromarray(arr).resize(dsize_wh, resample))


def resize_to_base(image, label=None, base_size=(1024, 1024)):
    """Aspect-preserving resize to fit base_size (base_dataset.py:52-63):
    linear for image, nearest for label."""
    output_size = base_size
    scale = min(max(output_size) / max(image.shape[:2]), min(output_size) / min(image.shape[:2]))
    new_w = int(image.shape[1] * scale + 0.5)
    new_h = int(image.shape[0] * scale + 0.5)
    image = _pil_resize(image, (new_w, new_h), Image.BILINEAR)
    if label is not None:
        label = _pil_resize(label, (new_w, new_h), Image.NEAREST)
        return image, label
    return image


def random_scale_resize(rng: _random.Random, image, label, ratio_range):
    """Random-ratio resize (base_dataset.py:44-51)."""
    lo, hi = ratio_range
    f = rng.random() * (hi - lo) + lo
    new_w = int(image.shape[1] * f + 0.5)
    new_h = int(image.shape[0] * f + 0.5)
    image = _pil_resize(image, (new_w, new_h), Image.BILINEAR)
    label = _pil_resize(label, (new_w, new_h), Image.NEAREST)
    return image, label
