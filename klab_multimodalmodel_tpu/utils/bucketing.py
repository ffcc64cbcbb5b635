"""Shared power-of-two padding-bucket policy.

One policy, two consumers: the train loop's ``--bucket_lengths``
(train/loop.py:bucket_batch) and the captioner's prompt trimming
(infer/captioner.py) — both recover the reference's 'longest' padding
(/root/reference/train.py:56) under XLA's static-shape constraint by
trimming pad columns to the smallest power-of-two bucket >= the longest
real row. Keeping the width rule here guarantees train-time and
inference-time bucketing can never silently diverge.
"""

from __future__ import annotations

import numpy as np


def pow2_bucket_width(mask: np.ndarray, floor: int) -> int:
    """Smallest power-of-two (>= ``floor``) column count covering the
    longest real (mask==1) row, capped at the mask's padded width."""
    longest = int(np.asarray(mask).sum(axis=1).max())
    width = floor
    while width < longest:
        width *= 2
    return min(width, mask.shape[1])
