"""Structured logging.

Parity with ``/root/reference/modules/logger.py:4-21`` (INFO level,
``'%(asctime)s: %(message)s'`` format, console + ``{result_dir}/train.log``
FileHandler in mode ``'w'``) — but the file handler is attached on process 0
only, fixing the all-ranks-write-one-file race noted in SURVEY.md §5.
"""

from __future__ import annotations

import logging
import os

import jax


def get_logger(result_dir: str, name: str = "klab_mmm_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.propagate = False
    if logger.handlers:  # idempotent across repeat calls in one process
        return logger
    formatter = logging.Formatter("%(asctime)s: %(message)s")

    sh = logging.StreamHandler()
    sh.setLevel(logging.INFO)
    sh.setFormatter(formatter)
    logger.addHandler(sh)

    if jax.process_index() == 0:
        os.makedirs(result_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(result_dir, "train.log"), mode="w")
        fh.setLevel(logging.INFO)
        fh.setFormatter(formatter)
        logger.addHandler(fh)

    return logger
