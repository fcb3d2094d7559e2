"""Device-side ensemble evaluation CLI (the contest config as ONE program).

The reference's ensemble is a 3-stage host pipeline: eval each model with
prob export (eval_base.py:190-191), average the .mat maps (fusemat.py), and
score/export externally.  This CLI runs all members in one jit per batch
(evallib/ensemble.py): per-resolution logit sums, fused upsample+argmax,
uint8 out — 43.9 t/s/chip for convnext+swin+seghr vs 41.7 sequential plus
32 MB/tile/member of .mat export (BASELINE.md round 5).

Members: comma-separated "model:backbone:checkpoint[:dtype]" specs.  With
GT labels: 12-class (or --num-classes) confusion matrix + mIoU.  Without:
colormapped GTiff predictions.
"""

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp

from .common import add_common_args, parse_hw
from ..ckpt import load_params
from ..ckpt.torch_convert import arch_for, load_torch_checkpoint
from ..data import Loader, OEMValDataset
from ..data.tileio import OEM_COLORMAP, write_pred_tiff
from ..evallib import EnsembleEvaluator
from ..models import build_model
from ..utils import get_logger
from ..dist import make_mesh


def get_parser():
    p = argparse.ArgumentParser(description="segland_tpu device-side ensemble eval")
    add_common_args(p)
    p.add_argument("--members", required=True,
                   help="comma list of model:backbone:ckpt[:dtype] specs")
    p.add_argument("--save-path", type=str, default="output")
    p.add_argument("--eval-batch", type=int, default=None)
    return p


def _load_member(spec, crop, logger):
    parts = spec.split(":")
    name, backbone, ckpt = parts[0], parts[1], parts[2]
    dtype = jnp.bfloat16 if (len(parts) > 3 and parts[3] == "bfloat16") else jnp.float32
    fused = name in ("convnext_pop", "swin_pop")  # measured serving configs
    model = build_model(name, backbone=backbone, n_base=7, dtype=dtype,
                        fused_mlp=fused, fused_attn=fused)
    img0 = jnp.zeros((1,) + crop + (3,), jnp.float32)
    shapes = jax.eval_shape(lambda k, x: model.init(k, x, train=False),
                            jax.random.PRNGKey(0), img0)
    variables = jax.tree_util.tree_map(lambda s: np.zeros(s.shape, s.dtype),
                                       shapes)
    if ckpt.endswith(".pth"):
        variables, info = load_torch_checkpoint(
            ckpt, variables, is_restore=True, arch=arch_for(name, backbone))
        logger.info(f"member {name}: torch ckpt {ckpt} ({info['loaded']} leaves)")
    else:
        variables = load_params(ckpt, variables)
        logger.info(f"member {name}: {ckpt}")
    return model, variables


def main(argv=None):
    args = get_parser().parse_args(argv)
    logger = get_logger()
    crop = parse_hw(args.base_size)
    members = [_load_member(s, crop, logger)
               for s in args.members.split(",")]
    mesh = make_mesh()
    valset = OEMValDataset(args.data_dir, args.val_list, base_size=crop,
                           use_novel=True, use_base=True,
                           stats=args.norm_stats)
    batch = args.eval_batch or jax.device_count()
    loader = Loader(valset, batch, shuffle=False, drop_last=False,
                    num_workers=args.num_workers)
    ens = EnsembleEvaluator(members, num_classes=args.num_classes,
                            n_base=args.base_classes,
                            ignore_label=args.ignore_label,
                            mesh=mesh if jax.device_count() > 1 else None)

    first = valset[0]
    has_gt = first[1] is not None
    if has_gt:
        cm, (base, novel, total, iou), tps = ens.run(loader, logger=logger)
        os.makedirs(args.save_path, exist_ok=True)
        np.save(os.path.join(args.save_path, "cmatrix_ensemble.npy"), cm)
        logger.info(f"ensemble meanIoU---base: mIoU {base:.4f}.")
        logger.info(f"ensemble meanIoU---novel: mIoU {novel:.4f}.")
        logger.info(f"ensemble meanIoU---total: mIoU {total:.4f}.")
        logger.info(f"throughput: {tps:.2f} tiles/sec")
        return {"base": base, "novel": novel, "total": total, "tps": tps}
    os.makedirs(args.save_path, exist_ok=True)
    n = 0
    for images, _labels, ids in loader:
        images = images if isinstance(images, np.ndarray) else np.stack(images, 0)
        pred = np.asarray(ens.predict_batch(images, images.shape[1:3]))
        for i, tid in enumerate(ids):
            write_pred_tiff(os.path.join(args.save_path, f"{tid}.tif"),
                            pred[i], OEM_COLORMAP)
            n += 1
    logger.info(f"wrote {n} ensemble predictions -> {args.save_path}")
    return {"written": n}


if __name__ == "__main__":
    main()
