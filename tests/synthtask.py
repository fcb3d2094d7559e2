"""Shared learnable synthetic GFSS task (color segmentation).

Extracted from tests/test_fewshot_learns.py so the fused-serving accuracy
gate (tests/test_fused_gate.py) trains on the identical task.  Every class c
has a distinct RGB color; images are palette[label] + N(0, sigma) noise;
tiles are 2x2 grids of 32x32 blocks.  Novel classes {8..11} never appear in
base training.
"""

import numpy as np
from PIL import Image

# distinct, well-separated colors per class (0 = background)
PALETTE = np.array(
    [
        (0, 0, 0),        # 0 bg
        (220, 40, 40),    # 1
        (40, 220, 40),    # 2
        (40, 40, 220),    # 3
        (220, 220, 40),   # 4
        (220, 40, 220),   # 5
        (40, 220, 220),   # 6
        (240, 140, 40),   # 7
        (245, 245, 245),  # 8 novel
        (130, 70, 190),   # 9 novel
        (100, 160, 100),  # 10 novel
        (70, 130, 160),   # 11 novel
    ],
    np.uint8,
)
SIZE = 64
NOISE = 10.0


def make_tile(rng, block_classes):
    """2x2 grid of 32x32 blocks; image = class color + gaussian noise."""
    lab = np.zeros((SIZE, SIZE), np.uint8)
    half = SIZE // 2
    for i, c in enumerate(block_classes):
        y, x = (i // 2) * half, (i % 2) * half
        lab[y : y + half, x : x + half] = c
    img = PALETTE[lab].astype(np.float32)
    img = img + rng.randn(SIZE, SIZE, 3) * NOISE
    return np.clip(img, 0, 255).astype(np.uint8), lab


def build_task(root):
    """Write the full task (base train / support / mixed val / base val lists)
    under ``root``; identical draw order to the original fixture so the
    measured learning-rate/threshold tuning carries over."""
    (root / "images").mkdir()
    (root / "labels").mkdir()
    (root / "list").mkdir()
    rng = np.random.RandomState(0)

    def save(tid, img, lab):
        Image.fromarray(img).save(root / "images" / f"{tid}.tif")
        Image.fromarray(lab).save(root / "labels" / f"{tid}.tif")

    # 16 base-train tiles covering classes 1..7 (+ bg): measured on this
    # exact task (tune E1/E2), 8 tiles underfit badly at any LR while 16
    # tiles at batch 4 reach ~0.5 mixed-val mIoU in 150 epochs and keep
    # climbing
    train_ids = []
    for i in range(16):
        cs = [1 + (i + j) % 7 for j in range(3)] + [0]
        rng.shuffle(cs)
        tid = f"base_{i}"
        save(tid, *make_tile(rng, cs))
        train_ids.append(tid)

    # 5-shot support tiles per novel class, IN CLASS ORDER (the support list
    # is indexed cls_idx*shot+k in val_supp mode, reference oem_ft.py:222-260)
    supp_ids = []
    for c in (8, 9, 10, 11):
        for k in range(5):
            tid = f"novel{c}_{k}"
            save(tid, *make_tile(rng, [c, c, 0, c]))
            supp_ids.append(tid)

    # val tiles mixing base + novel so eval_ft can score both
    val_ids = []
    for i in range(4):
        cs = [1 + (2 * i) % 7, 2 + (2 * i + 3) % 7, 8 + i, 8 + (i + 1) % 4]
        tid = f"val_{i}"
        save(tid, *make_tile(rng, cs))
        val_ids.append(tid)

    # base-only val tiles for the base-training phase (see
    # test_fewshot_learns.py fixture docstring for why the mixed set cannot
    # gate base training)
    val_base_ids = []
    for i in range(4):
        cs = [1 + (2 * i) % 7, 2 + (2 * i + 1) % 7, 3 + (2 * i) % 7, 0]
        tid = f"valb_{i}"
        save(tid, *make_tile(rng, cs))
        val_base_ids.append(tid)

    (root / "list" / "train.txt").write_text("\n".join(train_ids) + "\n")
    (root / "list" / "val.txt").write_text("\n".join(val_ids) + "\n")
    (root / "list" / "val_base.txt").write_text("\n".join(val_base_ids) + "\n")
    (root / "list" / "all_5shot_seed123.txt").write_text("\n".join(supp_ids) + "\n")
    return root
