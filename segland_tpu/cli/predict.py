"""Arbitrary-size scene prediction CLI (serving entry point).

Goes beyond the reference's fixed 1024x1024 eval: splits any GeoTIFF scene
into overlapping tiles, runs them batched on the TPU (tiled overlap-averaged
logits, evallib/tiled.py), and writes a colormapped prediction.
"""

import argparse
import os

import numpy as np
import jax.numpy as jnp

from .common import add_common_args, model_dtype, resolve_fused
from .eval_base import _load_variables
from ..models import build_model
from ..quant import QuantConfig
from ..evallib import Evaluator
from ..evallib.tiled import predict_scene
from ..data import augment as A
from ..data.tileio import read_image, write_pred_tiff, OEM_COLORMAP, OEM_COLORMAP_FT
from ..utils import get_logger


def get_parser():
    p = argparse.ArgumentParser(description="segland_tpu scene prediction")
    add_common_args(p)
    p.add_argument("--input", required=True, help="scene image (.tif) or directory")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--tile", type=int, default=1024)
    p.add_argument("--overlap", type=int, default=128)
    p.add_argument("--is-ft", action="store_true")
    p.add_argument("--eval-batch", type=int, default=8)
    p.add_argument("--int8", action="store_true",
                   help="int8 PTQ inference (calibrates on the first batches)")
    p.add_argument("--calib-batches", type=int, default=4)
    return p


def main(argv=None):
    args = get_parser().parse_args(argv)
    args.fused = resolve_fused(args, "eval")
    logger = get_logger()
    model = build_model(
        args.model, backbone=args.backbone, n_base=args.base_classes,
        n_novel=args.novel_classes if args.is_ft else 0, is_ft=args.is_ft,
        os=args.output_stride, dtype=model_dtype(args),
        fused_mlp=args.fused, fused_attn=args.fused,
    )
    seed = int(args.random_seed.split(",")[0])
    variables = _load_variables(args, model, (args.tile, args.tile), seed, logger)
    n_classes = 1 + args.base_classes + (args.novel_classes if args.is_ft else 0)
    evaluator = Evaluator(model, variables, num_classes=n_classes, n_base=args.base_classes,
                          int8=args.int8, calib_batches=args.calib_batches,
                          quant_cfg=(QuantConfig(fused_blocks=True)
                                     if (args.int8 and args.fused) else None))

    def predict_batch(tiles):
        logits, _ = evaluator.predict_batch(tiles, (args.tile, args.tile))
        return logits

    os.makedirs(args.output, exist_ok=True)
    paths = (
        [os.path.join(args.input, f) for f in sorted(os.listdir(args.input)) if f.endswith(".tif")]
        if os.path.isdir(args.input) else [args.input]
    )
    cmap = OEM_COLORMAP_FT if args.is_ft else OEM_COLORMAP
    for path in paths:
        image = read_image(path)
        image = A.normalize(image, A.IMAGENET_MEAN, A.IMAGENET_STD)
        h, w = image.shape[:2]
        # device-resident stitching when the (H,W,K) fp32 accumulator fits
        # comfortably in HBM (~8k^2 at K=12): the scene uploads once, only
        # the uint8 class map returns (the host path fetches 32 MB of fp32
        # logits per tile — measured >90% of scene wall-clock on slow links)
        acc_bytes = (h + args.tile) * (w + args.tile) * n_classes * 4
        if not args.int8 and acc_bytes <= 2 << 30:
            from ..evallib.tiled import predict_scene_device
            from ..ops.resize import resize_bilinear

            def apply_fn(variables, tiles):
                lg = model.apply(variables, tiles, train=False)
                return resize_bilinear(lg.astype(jnp.float32),
                                       (args.tile, args.tile),
                                       align_corners=True)

            pred = predict_scene_device(
                apply_fn, evaluator.variables, image.astype(np.float32),
                n_classes, tile=args.tile, overlap=args.overlap,
                batch=args.eval_batch)
        else:
            _, pred = predict_scene(
                predict_batch, image.astype(np.float32), n_classes,
                tile=args.tile, overlap=args.overlap, batch=args.eval_batch,
            )
        out = os.path.join(args.output, os.path.basename(path))
        write_pred_tiff(out, pred, cmap, profile_from=path)
        logger.info(f"{path} {image.shape[:2]} -> {out}")
    return len(paths)


if __name__ == "__main__":
    main()
