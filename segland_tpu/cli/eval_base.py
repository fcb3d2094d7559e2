"""Base-model evaluation/inference driver (reference eval_base.py).

With GT labels: 12-class confusion matrix -> base/novel/total mIoU + saved
cmatrix_<seed>.npy.  Without GT: colormapped GTiff predictions + per-tile
probability .mat maps for ensemble fusion.
"""

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp

from .common import add_common_args, parse_hw, model_dtype, str2bool, resolve_fused
from ..data import OEMValDataset, Loader
from ..models import build_model
from ..evallib import Evaluator
from ..ckpt import load_params
from ..ckpt.torch_convert import load_torch_checkpoint, arch_for
from ..data.tileio import OEM_COLORMAP, OEM_COLORMAP_FT
from ..utils import get_logger
from ..dist import make_mesh


def get_parser():
    p = argparse.ArgumentParser(description="segland_tpu base evaluation")
    add_common_args(p)
    p.add_argument("--save-path", type=str, default="output")
    p.add_argument("--is-ft", action="store_true", help="evaluate a fine-tuned (base+novel) model")
    p.add_argument("--eval-batch", type=int, default=None,
                   help="tiles per device batch (default: 1 per device)")
    p.add_argument("--save", type=str2bool, default=True,
                   help="write colormapped GTiff predictions for unlabeled tiles")
    p.add_argument("--save-prob", type=str2bool, default=True,
                   help="write per-tile .mat probability maps (for ensemble fusion)")
    p.add_argument("--device-normalize", action="store_true",
                   help="transfer raw uint8 tiles and normalize on device "
                        "(4x less host->device traffic)")
    p.add_argument("--int8", action="store_true",
                   help="int8 PTQ inference (backbone/decoder convs+denses on "
                        "the int8 MXU path, ~1.5x; POP head stays fp32)")
    p.add_argument("--calib-batches", type=int, default=4,
                   help="batches used for int8 activation calibration")
    p.add_argument("--calib-percentile", type=float, default=None,
                   help="use outlier-robust percentile activation calibration "
                        "(e.g. 99.9) instead of abs-max")
    return p


def _load_variables(args, model, crop, seed, logger):
    img0 = jnp.zeros((1,) + crop + (3,), jnp.float32)
    if args.restore_from:
        # full checkpoint restore: build the variable TEMPLATE on host from
        # shapes only (no device init, no weight round-trip over the tunnel)
        shapes = jax.eval_shape(lambda k, x: model.init(k, x, train=False),
                                jax.random.PRNGKey(0), img0)
        variables = jax.tree_util.tree_map(
            lambda s: np.zeros(s.shape, s.dtype), shapes)
    else:
        variables = jax.jit(lambda k, x: model.init(k, x, train=False))(jax.random.PRNGKey(0), img0)
        variables = jax.tree_util.tree_map(np.asarray, variables)
    path = args.restore_from
    if args.is_ft and path and not path.endswith(".pth"):
        # reference eval_ft.py:154: restore_from[:-4] + '_<seed>.pth'
        stem, ext = os.path.splitext(path)
        seeded = f"{stem}_{seed}{ext}"
        if os.path.exists(seeded):
            path = seeded
    if path:
        if path.endswith(".pth"):
            variables, info = load_torch_checkpoint(path, variables, is_restore=True, arch=arch_for(args.model, args.backbone))
            logger.info(f"restored torch ckpt {path}: {info['loaded']} leaves")
        else:
            variables = load_params(path, variables)
            logger.info(f"restored {path}")
    return variables


def main(argv=None):
    args = get_parser().parse_args(argv)
    args.fused = resolve_fused(args, "eval")
    logger = get_logger()
    crop = parse_hw(args.base_size)
    n_base = args.base_classes

    model = build_model(
        args.model, backbone=args.backbone, n_base=n_base,
        n_novel=args.novel_classes if args.is_ft else 0, is_ft=args.is_ft,
        os=args.output_stride, dtype=model_dtype(args),
        fused_mlp=args.fused, fused_attn=args.fused,
    )
    mesh = make_mesh()
    batch = args.eval_batch or jax.device_count()

    valset = OEMValDataset(args.data_dir, args.val_list, base_size=crop,
                           use_novel=True, use_base=True,
                           device_normalize=args.device_normalize,
                           stats=args.norm_stats)
    loader = Loader(valset, batch, shuffle=False, drop_last=False, num_workers=args.num_workers)

    quant_cfg = None
    if args.int8 and (args.calib_percentile is not None or args.fused):
        from ..quant import QuantConfig

        quant_cfg = QuantConfig(
            act_estimator=("percentile" if args.calib_percentile is not None
                           else "absmax"),
            percentile=args.calib_percentile or 99.9,
            # --fused + --int8: eligible resnet bottlenecks run through the
            # fused Pallas block kernel (ops/pallas_bottleneck.py)
            fused_blocks=args.fused)

    results = {}
    for seed_str in args.random_seed.split(","):
        seed = int(seed_str)
        variables = _load_variables(args, model, crop, seed, logger)
        from ..data import augment as A

        ev_mean, ev_std = A.STATS[args.norm_stats]
        evaluator = Evaluator(model, variables, num_classes=args.num_classes,
                              n_base=n_base, ignore_label=args.ignore_label,
                              mesh=mesh if jax.device_count() > 1 else None,
                              normalize_on_device=args.device_normalize,
                              mean=ev_mean, std=ev_std,
                              int8=args.int8, calib_batches=args.calib_batches,
                              quant_cfg=quant_cfg)
        save_path = args.save_path if args.save else None
        prob_path = (os.path.join(args.save_path, "prob")
                     if (args.save_prob and not args.is_ft) else None)
        os.makedirs(args.save_path, exist_ok=True)
        if prob_path:
            os.makedirs(prob_path, exist_ok=True)
        cm, (base, novel, total, iou), tps = evaluator.run(
            loader, save_path=save_path, prob_path=prob_path,
            data_root=args.data_dir,
            colormap=OEM_COLORMAP_FT if args.is_ft else OEM_COLORMAP,
            square_pad_eval=args.is_ft, logger=logger,
        )
        np.save(os.path.join(args.save_path, f"cmatrix_{seed}.npy"), cm)
        logger.info(f">>>>>>> Current Seed {seed}: <<<<<<<")
        logger.info(f"meanIoU---base: mIoU {base:.4f}.")
        logger.info(f"meanIoU---novel: mIoU {novel:.4f}.")
        logger.info(f"meanIoU---total: mIoU {total:.4f}.")
        logger.info(f"throughput: {tps:.2f} tiles/sec")
        results[seed] = (base, novel, total, tps)
    return results


if __name__ == "__main__":
    main()
