"""Base-class training driver (reference train_base.py).

Example (mirrors reference scripts/train_oem.sh):
  python -m segland_tpu.cli.train_base --data-dir $DATA --model seghr_pop \
      --backbone hr-w32 --num-epoch 200 --batch-size 4 --input-size 768,768 \
      --learning-rate 1e-3
"""

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp

from .common import add_common_args, add_train_args, parse_hw, model_dtype, resolve_fused
from ..data import DATASETS, Loader
from ..models import build_model
from ..train import create_optimizer, create_train_state, make_base_train_step
from ..train.base import make_eval_step
from ..dist import make_mesh, shard_batch, replicate
from ..ckpt import save_checkpoint, load_checkpoint, save_params
from ..ckpt.torch_convert import load_torch_checkpoint, arch_for
from ..utils import prep_experiment, format_loss_dict
from ..train.state import poly_lr_schedule


def get_parser():
    p = argparse.ArgumentParser(description="segland_tpu base training")
    add_common_args(p)
    add_train_args(p)
    p.add_argument("--resume-from", type=str, default=None,
                   help="full train-state checkpoint (epoch_N.ckpt) to resume from")
    p.add_argument("--ckpt-format", choices=["msgpack", "orbax"], default="msgpack",
                   help="epoch snapshot format (orbax: directory-based, async-"
                        "capable, single-host jobs; resume auto-detects)")
    p.add_argument("--skip-nonfinite", action=argparse.BooleanOptionalAction, default=True,
                   help="drop updates with inf/nan gradients (failure-detection "
                        "analog of the reference's AMP GradScaler skip)")
    p.add_argument("--profile-dir", type=str, default=None,
                   help="write a jax.profiler trace of a few steps here")
    p.add_argument("--double-step", action="store_true",
                   help="replicate the reference's double optimizer.step quirk "
                        "(train_base.py:262-264) for strict parity experiments")
    p.add_argument("--device-augment", action="store_true",
                   help="run crop/pad/flip/rot90/normalize fused on device "
                        "inside the jitted train step (uint8 tiles over PCIe, "
                        "bounded crop-retry; ops/device_aug.py). Host augs "
                        "leave the training critical path entirely")
    p.add_argument("--metrics", action="store_true",
                   help="write train/val scalars to <snapshot-dir>/"
                        "metrics.jsonl (the tensorboardX writer the reference "
                        "plumbs but ships disabled, train_base.py:139)")
    return p


def main(argv=None):
    args = get_parser().parse_args(argv)
    args.fused = resolve_fused(args, "train")
    writer = None
    if args.metrics:
        writer, logger = prep_experiment(args.snapshot_dir,
                                         rank=jax.process_index(),
                                         need_writer=True)
    else:
        logger = prep_experiment(args.snapshot_dir, rank=jax.process_index())

    seed = int(args.random_seed.split(",")[0])
    crop = parse_hw(args.input_size)

    TrainDS, ValDS = DATASETS[args.dataset]
    # device_augment is an optional dataset capability (only OEMTrainDataset
    # has a raw-uint8-tile path); pass the kwarg only when requested so
    # datasets without it (oem_ft) keep working, and fail with a clear
    # message instead of a TypeError when it is requested but unsupported.
    extra = {}
    if args.device_augment:
        import inspect

        if "device_augment" not in inspect.signature(TrainDS.__init__).parameters:
            raise SystemExit(
                f"--device-augment is not supported by dataset '{args.dataset}' "
                f"({TrainDS.__name__} has no raw-tile path); drop the flag")
        extra["device_augment"] = True
    trainset = TrainDS(args.data_dir, args.train_list, crop_size=crop, seed=seed,
                       **extra)
    valset = ValDS(args.data_dir, args.val_list, use_novel=False, use_base=True,
                   stats=args.norm_stats)
    train_loader = Loader(
        trainset, args.batch_size, shuffle=True, drop_last=True, seed=seed,
        process_index=jax.process_index(), process_count=jax.process_count(),
        num_workers=args.num_workers,
    )
    val_loader = Loader(valset, args.test_batch_size, shuffle=False)

    n_base = args.base_classes
    model = build_model(
        args.model, backbone=args.backbone, n_base=n_base, os=args.output_stride,
        dtype=model_dtype(args),
        fused_mlp=args.fused, fused_attn=args.fused,
        packed_train=args.packed_train,
    )
    loss_name = "orth" if "pop" in args.model else "ce"

    img0 = jnp.zeros((1,) + crop + (3,), jnp.float32)
    variables = jax.jit(
        lambda k, x: model.init({"params": k, "dropout": k}, x, train=True)
    )(jax.random.PRNGKey(seed), img0)

    if args.restore_from:
        if args.restore_from.endswith(".pth"):
            variables, info = load_torch_checkpoint(
                args.restore_from, jax.tree_util.tree_map(np.asarray, variables),
                is_restore=not args.finetune, backbone_only=args.finetune,
                arch=arch_for(args.model, args.backbone),
            )
            logger.info(f"restored torch ckpt: {info['loaded']} leaves, "
                        f"{len(info['missing'])} missing, {len(info['unexpected'])} unexpected")
        else:
            from ..ckpt import load_params

            variables = load_params(args.restore_from, jax.tree_util.tree_map(np.asarray, variables))
            logger.info(f"restored {args.restore_from}")

    steps_per_epoch = len(train_loader)
    tx = create_optimizer(
        variables["params"], args.learning_rate, args.num_epoch, steps_per_epoch,
        weight_decay=args.weight_decay, power=args.power, optimizer="adamw",
        freeze_backbone=args.freeze_backbone, fix_lr=args.fix_lr,
    )
    state = create_train_state(model, variables, tx)
    lr_fn = poly_lr_schedule(args.learning_rate, args.num_epoch, steps_per_epoch, args.power)

    import math

    mesh = make_mesh(math.gcd(jax.device_count(), args.batch_size))
    state = replicate(mesh, state)
    snap_freq = args.save_pred_every or args.snapshot_frequency
    augment_fn = None
    if args.device_augment:
        import functools

        from ..ops.device_aug import base_train_augment

        augment_fn = functools.partial(
            base_train_augment, crop_size=crop, ignore_label=args.ignore_label,
            return_stats=True)
    raw_step = make_base_train_step(model, loss_name, double_step=args.double_step,
                                    skip_nonfinite=args.skip_nonfinite, seed=seed,
                                    fix_bn=args.fix_bn, augment_fn=augment_fn)
    train_step = jax.jit(raw_step, donate_argnums=0)
    # silent variant: identical update, returns only the new state.  Each
    # extra jit output costs ~50 ms of RPC handling over the axon tunnel
    # (measured: 594 ms/step with loss dict + grad norm vs 378 ms without),
    # so loss scalars are only materialized on print iterations.
    train_step_silent = jax.jit(lambda s, x, m: raw_step(s, x, m)[0], donate_argnums=0)
    eval_step = jax.jit(make_eval_step(model, 1 + n_base, args.ignore_label))

    start_epoch = args.start_epoch
    if args.resume_from:
        state, extra = load_checkpoint(args.resume_from, state)
        start_epoch = int(state.epoch)
        logger.info(f"resumed from {args.resume_from} at epoch {start_epoch}")

    logger.info(f"devices: {jax.device_count()} | steps/epoch: {steps_per_epoch}")
    best_miou, best_epoch = 0.0, 0
    global_it = start_epoch * steps_per_epoch
    for epoch in range(start_epoch, args.num_epoch):
        epoch_log = epoch + 1
        trainset.set_seed(seed + epoch)  # per-epoch reseed (train_base.py:236)
        train_loader.set_epoch(epoch)
        prof_start = 1 if steps_per_epoch > 1 else 0
        prof_stop = min(prof_start + 2, steps_per_epoch - 1)
        for i, (img, mask, _) in enumerate(train_loader):
            if args.profile_dir and epoch == start_epoch and i == prof_start:
                jax.profiler.start_trace(args.profile_dir)
            img, mask = shard_batch(mesh, (jnp.asarray(img), jnp.asarray(mask)))
            verbose = (i % args.print_frequency == 0) or (
                args.profile_dir and epoch == start_epoch and i <= prof_stop)
            if verbose:
                state, ld, gn = train_step(state, img, mask)
            else:
                state = train_step_silent(state, img, mask)
            if args.profile_dir and epoch == start_epoch and i == prof_stop:
                jax.block_until_ready(ld["total_loss"])
                jax.profiler.stop_trace()
                logger.info(f"profiler trace written to {args.profile_dir}")
            global_it += 1
            if i % args.print_frequency == 0:
                lr = float(lr_fn(global_it - 1)) if not args.fix_lr else args.learning_rate
                logger.info(format_loss_dict(
                    ld, lr, gn, f"Epoch{epoch_log}/Iters{global_it} Iter{i+1}/{steps_per_epoch}:"))
                if writer is not None:
                    writer.add_scalars(
                        "train",
                        {**{k: float(v) for k, v in ld.items()},
                         "lr": lr, "grad_norm": float(gn)}, global_it)

        state = state.replace(epoch=epoch_log)
        if jax.process_index() == 0 and (epoch_log % snap_freq == 0 or epoch_log >= args.num_epoch):
            save_checkpoint(os.path.join(args.snapshot_dir, f"epoch_{epoch_log}.ckpt"),
                            state, format=args.ckpt_format)
            logger.info("taking snapshot ...")

        if epoch_log > args.val_start and (epoch_log % args.val_frequency == 0 or epoch_log >= args.num_epoch):
            miou = validate(state, eval_step, val_loader, 1 + n_base, logger)
            if miou >= best_miou and jax.process_index() == 0:
                best_miou, best_epoch = miou, epoch_log
                save_params(os.path.join(args.snapshot_dir, "best.ckpt"),
                            {"params": state.params, "batch_stats": state.batch_stats})
            logger.info(f"val mIoU {miou:.4f} (best {best_miou:.4f} @ epoch {best_epoch})")
            if writer is not None:
                writer.add_scalar("val/mIoU", miou, global_it)
    if writer is not None:
        writer.close()
    return best_miou


def validate(state, eval_step, val_loader, num_classes, logger):
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
    return float(np.mean(iou))


if __name__ == "__main__":
    main()
