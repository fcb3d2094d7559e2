"""Logging + experiment prep (reference utils/pyt_utils.py:28-76, logger.py)."""

import logging
import os
import sys
from datetime import datetime


def get_logger(name: str = "segland", log_dir: str | None = None, rank: int = 0) -> logging.Logger:
    """Rank-0 console+file logger; non-zero ranks log errors only
    (reference utils/pyt_utils.py:28-53)."""
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(logging.INFO if rank == 0 else logging.ERROR)
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s", "%m-%d %H:%M:%S")
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_dir and rank == 0:
        os.makedirs(log_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(log_dir, "log.txt"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger.propagate = False
    return logger


def prep_experiment(snapshot_dir: str, argv=None, rank: int = 0) -> logging.Logger:
    """Create the experiment dir, dump argv to <date>.txt (reference
    prep_experiment, utils/pyt_utils.py:55-76), return the logger."""
    if rank == 0:
        os.makedirs(snapshot_dir, exist_ok=True)
        stamp = datetime.now().strftime("%Y_%m_%d_%H_%M_%S")
        with open(os.path.join(snapshot_dir, f"{stamp}.txt"), "w") as f:
            f.write(" ".join(argv or sys.argv) + "\n")
    return get_logger(log_dir=snapshot_dir, rank=rank)


def format_loss_dict(loss_dict, lr: float, grad_norm: float, prefix: str) -> str:
    s = f"{prefix} lr={lr:.2e} grad_norm={float(grad_norm):.4f}"
    for k, v in loss_dict.items():
        s += f" {k}={float(v):.4f}"
    return s
