"""Fine-tuned model evaluation (reference eval_ft.py) — thin wrapper over
eval_base with is_ft semantics: per-seed checkpoints (best_<seed>),
square-longside logits + ignore-padded GT (eval_ft.py:168-178), saturated
novel colormap, no .mat export."""

from .eval_base import get_parser, main as _main


def main(argv=None):
    args_list = list(argv) if argv is not None else None
    if args_list is None:
        import sys

        args_list = sys.argv[1:]
    if "--is-ft" not in args_list:
        args_list = args_list + ["--is-ft"]
    return _main(args_list)


if __name__ == "__main__":
    main()
