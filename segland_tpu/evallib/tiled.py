"""Tiled inference for scenes larger than the training tile.

The reference evaluates whole 1024x1024 tiles (eval_base.py:162-168); real
deployments have arbitrarily large GeoTIFF scenes.  ``predict_scene`` splits
a scene into overlapping tiles, batches them through the jitted forward
(batch dim sharded over the mesh), and stitches per-pixel logits back with
overlap averaging — O(scene) memory on host, static shapes on device.
"""

import numpy as np


def _tile_starts(size: int, tile: int, stride: int):
    if size <= tile:
        return [0]
    starts = list(range(0, size - tile + 1, stride))
    if starts[-1] != size - tile:
        starts.append(size - tile)
    return starts


def predict_scene(predict_batch, image: np.ndarray, num_classes: int,
                  tile: int = 1024, overlap: int = 128, batch: int = 8):
    """image [H,W,3] float32 (normalized) -> (logits [H,W,K] fp32 on host,
    pred [H,W] uint8).

    predict_batch(images [B,tile,tile,3]) -> logits [B,tile,tile,K]
    (e.g. Evaluator.predict_batch with out_hw=(tile,tile)).
    """
    h, w = image.shape[:2]
    pad_h, pad_w = max(0, tile - h), max(0, tile - w)
    if pad_h or pad_w:
        image = np.pad(image, ((0, pad_h), (0, pad_w), (0, 0)))
    ph, pw = image.shape[:2]
    stride = tile - overlap
    coords = [(y, x) for y in _tile_starts(ph, tile, stride) for x in _tile_starts(pw, tile, stride)]

    acc = np.zeros((ph, pw, num_classes), np.float32)
    cnt = np.zeros((ph, pw, 1), np.float32)
    for i in range(0, len(coords), batch):
        chunk = coords[i : i + batch]
        tiles = np.stack([image[y : y + tile, x : x + tile] for y, x in chunk], 0)
        if len(chunk) < batch:  # static shapes: pad the last batch
            tiles = np.concatenate(
                [tiles, np.zeros((batch - len(chunk),) + tiles.shape[1:], tiles.dtype)], 0)
        logits = np.asarray(predict_batch(tiles))[: len(chunk)]
        for (y, x), lg in zip(chunk, logits):
            acc[y : y + tile, x : x + tile] += lg
            cnt[y : y + tile, x : x + tile] += 1.0
    acc /= np.maximum(cnt, 1.0)
    acc = acc[:h, :w]
    return acc, np.argmax(acc, axis=-1).astype(np.uint8)
