"""Cross-epoch cache of the frozen vision tower's features.

The reference's default recipes train with the SwinV2 tower frozen
(``/root/reference/run_scripts/caption/train_only_transformer.sh``; quirk #1
means even ``train_with_swin`` never *updates* it, ``/root/reference/
train.py:28``), yet its forward is recomputed for every image on every epoch
— for the 50-epoch caption recipe that's 49 redundant epochs of an 88M-param
tower. Frozen towers run deterministically here (no dropout/drop-path — see
``MultiModalModel.encode_multimodal``), so their output per sample is a pure
function of the image: cacheable with bit-identical training results.

Filling is lazy: epoch 1 runs the normal full step, which already computes
the features — they are returned as an aux output and written back here (a
~4 MB/step device->host copy, overlapped with the next step). Later epochs
feed cached features straight into the transformer and skip the tower
forward entirely. Batches containing still-uncached samples (per-epoch
reshuffle + ``drop_last`` tails, resumed runs) transparently fall back to
the full step and fill the cache as they go.

Storage is a bfloat16 ``np.memmap`` under ``result_dir`` — COCO train2017 at
swinv2-base geometry (64 tokens x 1024) is ~15 GB on disk, zero device HBM.
"""

from __future__ import annotations

import json
import os

import ml_dtypes
import numpy as np


class FrozenFeatureCache:
    """Disk-backed (sample_index -> feature block) store with a fill mask."""

    def __init__(self, path: str, num_samples: int,
                 feature_shape: tuple[int, ...],
                 dtype: str = "bfloat16"):
        self.path = path
        self.num_samples = num_samples
        self.feature_shape = tuple(int(s) for s in feature_shape)
        # Stored in the run's compute dtype: for bf16 compute (production)
        # the cache is bit-identical to recomputation; fp32 runs keep fp32.
        self._np_dtype = (ml_dtypes.bfloat16 if dtype == "bfloat16"
                          else np.float32)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        meta_path = path + ".meta.json"
        meta = {"num_samples": num_samples,
                "feature_shape": list(self.feature_shape),
                "dtype": dtype}
        fresh = True
        if os.path.exists(path) and os.path.exists(meta_path):
            with open(meta_path) as f:
                old = json.load(f)
            fresh = old != meta
        if fresh:
            with open(meta_path, "w") as f:
                json.dump(meta, f)
        mode = "w+" if fresh or not os.path.exists(path) else "r+"
        mask_path = path + ".mask.npy"
        self._mask_path = mask_path
        if fresh and os.path.exists(mask_path):
            # The old mask must not outlive its data: a crash between this
            # recreate (which zeroes the memmap) and the first flush() would
            # otherwise let a later run read all-zero features as "filled".
            os.remove(mask_path)
        self._data = np.memmap(path, dtype=self._np_dtype, mode=mode,
                               shape=(num_samples,) + self.feature_shape)
        if not fresh and os.path.exists(mask_path):
            self._filled = np.load(mask_path)
        else:
            self._filled = np.zeros(num_samples, bool)

    # Negative indices mark PHANTOM rows (gradient-accumulation tail
    # padding, train/loop.py): they are never stored (their features are
    # computed under zeroed masks and differ from the real row they
    # duplicate), never gate has(), and read an arbitrary row on get()
    # (row 0) — every consumer masks them out.

    def has(self, indices: np.ndarray) -> bool:
        idx = np.asarray(indices)
        return bool(self._filled[idx[idx >= 0]].all())

    def put(self, indices: np.ndarray, features: np.ndarray) -> None:
        idx = np.asarray(indices)
        real = idx >= 0
        self._data[idx[real]] = features[real].astype(self._np_dtype)
        self._filled[idx[real]] = True

    def get(self, indices: np.ndarray) -> np.ndarray:
        idx = np.asarray(indices)
        return np.asarray(self._data[np.where(idx >= 0, idx, 0)])

    def flush(self) -> None:
        """Persist data + fill mask (survives restart/resume)."""
        self._data.flush()
        np.save(self._mask_path, self._filled)


def swin_feature_shape(config) -> tuple[int, int]:
    """(tokens, num_features) of the vision tower output for ``config``."""
    s = config.swin
    return (s.num_patches_out, s.num_features)
