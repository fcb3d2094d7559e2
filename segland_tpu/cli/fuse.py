"""Ensemble probability fusion CLI (reference fusemat.py, with real flags
instead of hard-coded paths)."""

import argparse

from ..evallib.fuse import fuse_prob_dirs


def main(argv=None):
    p = argparse.ArgumentParser(description="fuse per-model .mat probability maps")
    p.add_argument("--inputs", nargs="+", required=True, help="dirs of per-tile .mat maps")
    p.add_argument("--output", required=True)
    p.add_argument("--size", type=int, default=1024)
    args = p.parse_args(argv)
    done = fuse_prob_dirs(args.inputs, args.output, out_size=(args.size, args.size))
    print(f"fused {len(done)} tiles -> {args.output}")


if __name__ == "__main__":
    main()
