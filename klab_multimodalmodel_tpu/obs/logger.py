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
    formatter = logging.Formatter("%(asctime)s: %(message)s")

    if not any(isinstance(h, logging.StreamHandler)
               and not isinstance(h, logging.FileHandler)
               for h in logger.handlers):
        sh = logging.StreamHandler()
        sh.setLevel(logging.INFO)
        sh.setFormatter(formatter)
        logger.addHandler(sh)

    if jax.process_index() == 0:
        # Re-point the file handler when result_dir changes: two train()
        # calls in one process (resume into a new run dir, notebooks) must
        # each get their own {result_dir}/train.log, matching the
        # fresh-process semantics of the reference's mode='w' handler.
        log_path = os.path.abspath(os.path.join(result_dir, "train.log"))
        file_handlers = [h for h in logger.handlers
                         if isinstance(h, logging.FileHandler)]
        if not any(os.path.abspath(h.baseFilename) == log_path
                   for h in file_handlers):
            for h in file_handlers:
                logger.removeHandler(h)
                h.close()
            os.makedirs(result_dir, exist_ok=True)
            fh = logging.FileHandler(log_path, mode="w")
            fh.setLevel(logging.INFO)
            fh.setFormatter(formatter)
            logger.addHandler(fh)

    return logger
