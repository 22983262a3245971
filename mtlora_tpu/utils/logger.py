"""Process-aware logging (rebuild of reference logger.py:16-44):
colored console on process 0, per-process file log always."""

from __future__ import annotations

import functools
import logging
import os
import sys


@functools.lru_cache()
def create_logger(output_dir: str = "", dist_rank: int = 0,
                  name: str = "") -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.propagate = False

    fmt = ("[%(asctime)s %(name)s] "
           "(%(filename)s %(lineno)d): %(levelname)s %(message)s")

    if dist_rank == 0:
        console = logging.StreamHandler(sys.stdout)
        console.setLevel(logging.DEBUG)
        try:
            from termcolor import colored

            color_fmt = (colored("[%(asctime)s %(name)s]", "green")
                         + colored("(%(filename)s %(lineno)d)", "yellow")
                         + ": %(levelname)s %(message)s")
        except ImportError:
            color_fmt = fmt
        console.setFormatter(
            logging.Formatter(fmt=color_fmt, datefmt="%Y-%m-%d %H:%M:%S"))
        logger.addHandler(console)

    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        fh = logging.FileHandler(
            os.path.join(output_dir, f"log_rank{dist_rank}.txt"), mode="a")
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(
            logging.Formatter(fmt=fmt, datefmt="%Y-%m-%d %H:%M:%S"))
        logger.addHandler(fh)
    return logger


class AverageMeter:
    """Running average (the reference's timm AverageMeter usage)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self):
        return self.sum / max(self.count, 1)
