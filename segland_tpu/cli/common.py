"""Shared CLI flags — names/defaults match the reference argparse blocks
(train_base.py:47-111, ft_pop.py:47-115, eval_base.py:55-91) so the
reference's shell scripts translate 1:1."""

import argparse
import os


def apply_platform_env():
    """Honor JAX_PLATFORMS even when a sitecustomize pre-registered a backend
    at interpreter start (platform selection is lazy, so a config update
    before first device use still wins).  Also enable the persistent
    compilation cache so repeated CLI invocations skip the 30-300s TPU
    compiles."""
    import jax

    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass
    try:
        cache_dir = os.environ.get(
            "SEGLAND_COMPILE_CACHE", os.path.expanduser("~/.cache/segland_tpu/jax"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


apply_platform_env()


def str2bool(v: str) -> bool:
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


def add_common_args(p: argparse.ArgumentParser):
    p.add_argument("--data-dir", type=str, required=True)
    p.add_argument("--train-list", type=str, default="dataset/list/oem/train.txt")
    p.add_argument("--val-list", type=str, default="dataset/list/oem/val.txt")
    p.add_argument("--dataset", type=str, default="oem", choices=["oem", "oem_ft"])
    p.add_argument("--model", type=str, default="pspnet_pop")
    p.add_argument("--backbone", type=str, default=None)
    p.add_argument("--restore-from", type=str, default=None)
    p.add_argument("--snapshot-dir", type=str, default="snapshots")
    p.add_argument("--input-size", type=str, default="512,512",
                   help="crop H,W")
    p.add_argument("--base-size", type=str, default="1024,1024")
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--num-classes", type=int, default=12)
    p.add_argument("--base-classes", type=int, default=7)
    p.add_argument("--novel-classes", type=int, default=4)
    p.add_argument("--ignore-label", type=int, default=255)
    p.add_argument("--os", type=int, default=8, dest="output_stride")
    p.add_argument("--random-seed", type=str, default="123")
    p.add_argument("--print-frequency", type=int, default=10)
    p.add_argument("--num-workers", type=int, default=4)  # accepted for script compat
    p.add_argument("--norm-stats", choices=["imagenet", "train"], default="imagenet",
                   help="val/ft normalization stats. 'imagenet' preserves the "
                        "reference's train/val asymmetry (0.5-stats base "
                        "training vs ImageNet-stats val/ft, dataset/oem.py:26 "
                        "vs base_dataset.py); 'train' makes the whole "
                        "pipeline consistent (controlled experiments)")
    p.add_argument("--fused", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="Pallas fused LN+MLP and attention-section kernels in "
                        "transformer backbones (swin/convnext). fp32: exact "
                        "on the XLA fallback, bf16-MXU-rounding deltas on "
                        "TPU. bfloat16: uses tanh-GELU (max 5e-4 vs exact "
                        "erf — 30x below the bf16 noise floor) on every "
                        "backend, so bf16 fused-vs-unfused is NOT "
                        "bit-identical by design (see BASELINE.md). "
                        "With --int8 also routes eligible resnet bottlenecks "
                        "through the fused block kernel (requires "
                        "--dtype bfloat16 and a TPU backend; logs a warning "
                        "and falls back to per-conv int8 otherwise)")
    p.add_argument("--dtype", type=str, default="float32", choices=["float32", "bfloat16"],
                   help="backbone/decoder compute dtype (POP head always fp32)")
    p.add_argument("--packed-train", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="override train-mode W-packing in hrnet/lsknet/"
                        "vggunet backbones (default: each backbone's "
                        "measured default, BASELINE.md train-packing "
                        "tables). Errors on backbones without a packed "
                        "path (resnet/swin/convnext)")
    return p


def add_train_args(p: argparse.ArgumentParser):
    p.add_argument("--learning-rate", type=float, default=1e-3)
    p.add_argument("--weight-decay", type=float, default=1e-4)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--power", type=float, default=0.9)
    p.add_argument("--num-epoch", type=int, default=200)
    p.add_argument("--start-epoch", type=int, default=0)
    p.add_argument("--val-start", type=int, default=35,
                   help="epoch after which validation runs (reference train_base.py:294)")
    p.add_argument("--val-frequency", type=int, default=10)
    p.add_argument("--snapshot-frequency", type=int, default=10)
    p.add_argument("--freeze-backbone", type=str2bool, nargs="?", const=True, default=False)
    p.add_argument("--fix-lr", type=str2bool, nargs="?", const=True, default=False)
    p.add_argument("--finetune", type=str2bool, nargs="?", const=True, default=False,
                   help="restore backbone-only weights (reference train_base.py:198-201)")
    p.add_argument("--fp16", type=str2bool, nargs="?", const=True, default=False,
                   help="accepted for script compat; TPU path uses --dtype bfloat16")
    p.add_argument("--save-pred-every", type=int, default=None,
                   help="alias for --snapshot-frequency (the reference parses "
                        "this flag but hardcodes every-10-epoch snapshots; "
                        "here it is honored)")
    p.add_argument("--test-batch-size", type=int, default=1,
                   help="validation batch size (the reference parses but "
                        "ignores it; here it is honored)")
    p.add_argument("--fix-bn", action="store_true", default=False,
                   help="freeze BatchNorm running statistics during training "
                        "(the reference parses this flag without ever "
                        "consuming it; here it stops stat updates — batch "
                        "normalization itself still uses the current batch)")
    p.add_argument("--filter-novel", action="store_true", default=False,
                   help="restrict ft base-support sampling to novel-free "
                        "tiles (reference oem_ft.py filter_intersection; "
                        "no-op for the base oem dataset, as upstream)")
    return p


# Measured per-family fused-kernel defaults (BASELINE.md round-5 fused A/B
# and round-4 ft re-measure).  Base train: convnext wins 1.10-1.12x; swin
# LOSES with the v2-era kernels (129.4 -> 145.2 ms/step); lsk null.  Ft:
# swin wins 1.21x (29.6 vs 35.7 ms/step, forward-dominated frozen-backbone
# profile).  Eval stays opt-in (--fused).
TRAIN_FUSED_DEFAULTS = {"convnext_pop": True}
FT_FUSED_DEFAULTS = {"swin_pop": True}
# Eval: fused is the measured serving config for both transformer families
# (convnext 255 vs ~150 t/s unfused; swin 95.3 vs 46.0 — BASELINE.md) and
# the on-chip trained-model gate measured dmIoU 0.000 / 100% argmax
# agreement for the fused Mosaic path (round 5), so the default follows.
EVAL_FUSED_DEFAULTS = {"convnext_pop": True, "swin_pop": True}


def resolve_fused(args, mode: str = "eval") -> bool:
    """Resolve the tri-state --fused flag: explicit wins; None takes the
    measured per-family default for the given mode ('train'/'ft'/'eval')."""
    if args.fused is not None:
        return bool(args.fused)
    if mode == "train":
        return TRAIN_FUSED_DEFAULTS.get(args.model, False)
    if mode == "ft":
        return FT_FUSED_DEFAULTS.get(args.model, False)
    return EVAL_FUSED_DEFAULTS.get(args.model, False)


def parse_hw(s: str):
    h, w = s.split(",")
    return int(h), int(w)


def model_dtype(args):
    import jax.numpy as jnp

    return jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
