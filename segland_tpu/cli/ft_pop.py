"""Novel-class fine-tuning driver (reference ft_pop.py).

Multi-seed loop (--random-seed "123,234"), episodic novel+base pairs, frozen
backbone/decoder/base-classifier, classifier_n initialized from the base
classifier, per-epoch base-list resampling, best checkpoint per seed gated on
base mIoU improvement (reference ft_pop.py:133-310).
"""

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp

from .common import add_common_args, add_train_args, str2bool, parse_hw, model_dtype, resolve_fused
from ..data import OEMFtTrainDataset, OEMValDataset, Loader
from ..models import build_model
from ..train import create_optimizer, create_train_state, make_ft_train_step
from ..train.base import make_eval_step
from ..train.ft import ft_trainable, init_cls_n
from ..dist import make_mesh, shard_batch, replicate
from ..ckpt import save_params, load_params
from ..ckpt.io import graft_base_into_ft
from ..ckpt.torch_convert import load_torch_checkpoint, arch_for
from ..utils import prep_experiment, format_loss_dict


def get_parser():
    p = argparse.ArgumentParser(description="segland_tpu novel-class fine-tuning")
    add_common_args(p)
    add_train_args(p)
    p.add_argument("--shot", type=int, default=5)
    p.add_argument("--update-base", type=str2bool, nargs="?", const=True, default=False)
    p.add_argument("--update-epoch", type=int, default=1)
    return p


def main(argv=None):
    args = get_parser().parse_args(argv)
    args.fused = resolve_fused(args, "ft")
    logger = prep_experiment(args.snapshot_dir, rank=jax.process_index())
    crop = parse_hw(args.input_size)
    base_size = parse_hw(args.base_size)
    results = {}
    for seed_str in args.random_seed.split(","):
        seed = int(seed_str)
        results[seed] = run_seed(args, seed, crop, base_size, logger)
    return results


def run_seed(args, seed, crop, base_size, logger):
    n_base, n_novel = args.base_classes, args.novel_classes
    trainset = OEMFtTrainDataset(
        args.data_dir, args.train_list, shot=args.shot, seed=seed, crop_size=crop,
        filter=args.filter_novel, stats=args.norm_stats,
    )
    valset = OEMValDataset(
        args.data_dir, args.val_list, base_size=base_size, resize_label=True,
        use_novel=True, use_base=True, stats=args.norm_stats,
    )
    train_loader = Loader(
        trainset, args.batch_size, shuffle=True, drop_last=True, seed=seed,
        process_index=jax.process_index(), process_count=jax.process_count(),
        num_workers=args.num_workers,
    )
    val_loader = Loader(valset, args.test_batch_size, shuffle=False)

    model = build_model(
        args.model, backbone=args.backbone, n_base=n_base, n_novel=n_novel,
        is_ft=True, os=args.output_stride, dtype=model_dtype(args),
        fused_mlp=args.fused, fused_attn=args.fused,
        packed_train=args.packed_train,
    )
    img0 = jnp.zeros((2,) + crop + (3,), jnp.float32)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(jax.random.PRNGKey(seed), img0)
    variables = jax.tree_util.tree_map(np.asarray, variables)

    if args.restore_from:
        if args.restore_from.endswith(".pth"):
            variables, info = load_torch_checkpoint(args.restore_from, variables, is_restore=True, arch=arch_for(args.model, args.backbone))
            logger.info(f"restored torch base ckpt: {info['loaded']} leaves")
        else:
            base_model = build_model(
                args.model, backbone=args.backbone, n_base=n_base,
                os=args.output_stride, dtype=model_dtype(args),
                fused_mlp=args.fused, fused_attn=args.fused,
            )
            base_vars = base_model.init(jax.random.PRNGKey(0), img0[:1], train=False)
            base_vars = load_params(args.restore_from, jax.tree_util.tree_map(np.asarray, base_vars))
            variables = graft_base_into_ft(variables, base_vars)
            logger.info(f"grafted base checkpoint {args.restore_from}")
    # classifier_n initialized from classifier (ft_pop.py:198-204)
    variables["params"] = init_cls_n(variables["params"])

    steps_per_epoch = max(len(train_loader), 1)
    tx = create_optimizer(
        variables["params"], args.learning_rate, args.num_epoch, steps_per_epoch,
        weight_decay=args.weight_decay, momentum=args.momentum, optimizer="sgd",
        freeze_backbone=True, fix_lr=args.fix_lr, trainable_fn=ft_trainable,
    )
    state = create_train_state(model, variables, tx)

    import math

    mesh = make_mesh(math.gcd(jax.device_count(), args.batch_size))
    state = replicate(mesh, state)
    raw_step = make_ft_train_step(model, n_base, skip_nonfinite=True)
    train_step = jax.jit(raw_step, donate_argnums=0)
    # loss scalars only on print iterations: each extra jit output costs
    # ~50 ms of RPC handling over the axon tunnel (see cli/train_base.py)
    train_step_silent = jax.jit(lambda s, *b: raw_step(s, *b)[0], donate_argnums=0)
    eval_step = jax.jit(make_eval_step(model, args.num_classes, args.ignore_label))

    best = {"total": 0.0, "base": 0.0, "novel": 0.0, "epoch": 0}
    global_it = 0
    for epoch in range(args.start_epoch, args.num_epoch):
        epoch_log = epoch + 1
        trainset.set_seed(seed + epoch)
        train_loader.set_epoch(epoch)
        for i, (img, mask, img_b, mask_b, _) in enumerate(train_loader):
            batch = shard_batch(mesh, tuple(jnp.asarray(x) for x in (img, mask, img_b, mask_b)))
            if i % args.print_frequency == 0:
                state, ld, gn = train_step(state, *batch)
            else:
                state = train_step_silent(state, *batch)
            global_it += 1
            if i % args.print_frequency == 0:
                logger.info(format_loss_dict(
                    ld, args.learning_rate, gn,
                    f"Seed{seed} Epoch{epoch_log} Iter{i+1}/{steps_per_epoch}:"))
        if args.update_base and epoch_log % args.update_epoch == 0:
            trainset.update_base_list()  # host-side resample (ft_pop.py:271)

        if epoch_log % args.val_frequency == 0 or epoch_log >= args.num_epoch:
            base_miou, novel_miou, total_miou = validate_ft(
                state, eval_step, val_loader, args.num_classes, n_base)
            logger.info(
                f"Seed{seed} Epoch{epoch_log}: base {base_miou:.4f} novel {novel_miou:.4f} total {total_miou:.4f}")
            # best gated on base mIoU improvement (ft_pop.py:284-296)
            if base_miou > best["base"] and jax.process_index() == 0:
                best = {"total": total_miou, "base": base_miou, "novel": novel_miou, "epoch": epoch_log}
                save_params(
                    os.path.join(args.snapshot_dir, f"best_{seed}.ckpt"),
                    {"params": state.params, "batch_stats": state.batch_stats},
                )
    logger.info(f"Seed{seed} best: {best}")
    return best


def validate_ft(state, eval_step, val_loader, num_classes, n_base):
    inter = np.zeros(num_classes)
    union = np.zeros(num_classes)
    for img, mask, _ in val_loader:
        if mask is None or (isinstance(mask, list) and mask[0] is None):
            continue
        mask = np.stack(mask, 0) if isinstance(mask, list) else np.asarray(mask)
        i, u, _ = eval_step(state.params, state.batch_stats, jnp.asarray(img), jnp.asarray(mask))
        inter += np.asarray(i)
        union += np.asarray(u)
    iou = inter / np.maximum(union, 1)
    return float(np.mean(iou[: n_base + 1])), float(np.mean(iou[n_base + 1 :])), float(np.mean(iou))


if __name__ == "__main__":
    main()
