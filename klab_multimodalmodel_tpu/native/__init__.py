"""ctypes bindings for the native host runtime (native/klab_host.cpp).

Provides the C++ equivalents of the reference's native host dependencies
(SURVEY.md §2C): Pillow-compatible multithreaded image resizing, a
SentencePiece-style unigram Viterbi tokenizer core, and epoch-seeded
shuffle/shard index generation. Every entry degrades gracefully to the pure
Python/Pillow path when the shared library is unavailable.
"""

from __future__ import annotations

import ctypes
import json
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libklab_host.so")

_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def load_library() -> Optional[ctypes.CDLL]:
    """Load (building on first use) the native library; None on failure."""
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=300)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.klab_resize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int]
        lib.klab_tok_new.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int]
        lib.klab_tok_new.restype = ctypes.c_int
        lib.klab_tok_encode_batch.argtypes = [
            ctypes.c_int, ctypes.c_char_p, ctypes.c_int, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        lib.klab_epoch_indices.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int, ctypes.c_void_p]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return load_library() is not None


# ---------------------------------------------------------------------------
# Image resize
# ---------------------------------------------------------------------------

BILINEAR = 0
BICUBIC = 1  # Pillow's resize() default


def resize_batch(images: Sequence[np.ndarray], size: int,
                 filter: int = BICUBIC, n_threads: int = 0) -> np.ndarray:
    """List of (H, W, 3) uint8 arrays -> (B, size, size, 3) uint8."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    batch = len(images)
    images = [np.ascontiguousarray(im, dtype=np.uint8) for im in images]
    ptrs = (ctypes.c_void_p * batch)(
        *[im.ctypes.data_as(ctypes.c_void_p) for im in images])
    dims = np.empty(2 * batch, np.int32)
    for i, im in enumerate(images):
        dims[2 * i], dims[2 * i + 1] = im.shape[0], im.shape[1]
    out = np.empty((batch, size, size, 3), np.uint8)
    lib.klab_resize_batch(
        ctypes.cast(ptrs, ctypes.POINTER(ctypes.c_void_p)),
        dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), batch,
        out.ctypes.data_as(ctypes.c_void_p), size, size, filter, n_threads)
    return out


# ---------------------------------------------------------------------------
# Unigram tokenizer core
# ---------------------------------------------------------------------------


class NativeUnigramEncoder:
    """Viterbi encoder over a HF-tokenizers unigram ``tokenizer.json``.

    Covers the hot path (batch encode + pad); decode stays on the Python
    tokenizer, mirroring the reference's host-side sentencepiece split.
    """

    def __init__(self, tokenizer_json_path: str):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native library unavailable")
        with open(tokenizer_json_path) as f:
            spec = json.load(f)
        model = spec.get("model", {})
        if model.get("type") != "Unigram":
            raise ValueError("native encoder requires a Unigram model")
        vocab = model["vocab"]  # [[piece, score], ...]
        pieces, scores, ids = [], [], []
        for i, (piece, score) in enumerate(vocab):
            pieces.append(piece.encode("utf-8"))
            scores.append(score)
            ids.append(i)
        # added special tokens (sentinels) are single pieces with id order
        for tok in spec.get("added_tokens", []):
            if tok["id"] >= len(vocab):
                pieces.append(tok["content"].encode("utf-8"))
                scores.append(0.0)
                ids.append(tok["id"])
        blob = b"\0".join(pieces) + b"\0"
        score_arr = (ctypes.c_float * len(scores))(*scores)
        id_arr = (ctypes.c_int * len(ids))(*ids)
        unk_id = model.get("unk_id", 2)
        self._lib = lib
        self._handle = lib.klab_tok_new(blob, score_arr, id_arr, len(ids),
                                        unk_id)

    def encode_batch(self, texts: Sequence[str], max_len: int,
                     pad_id: int = 0, eos_id: int = 1,
                     n_threads: int = 0) -> tuple[np.ndarray, np.ndarray]:
        blob = b"\0".join(t.encode("utf-8") for t in texts) + b"\0"
        B = len(texts)
        ids = np.empty((B, max_len), np.int32)
        mask = np.empty((B, max_len), np.int32)
        self._lib.klab_tok_encode_batch(
            self._handle, blob, B, ids.ctypes.data_as(ctypes.c_void_p),
            mask.ctypes.data_as(ctypes.c_void_p), max_len, pad_id, eos_id,
            n_threads)
        return ids, mask


# ---------------------------------------------------------------------------
# Epoch shuffle/shard indices
# ---------------------------------------------------------------------------


def epoch_indices(n: int, global_batch: int, seed: int, epoch: int,
                  process_index: int = 0, process_count: int = 1
                  ) -> np.ndarray:
    """(num_batches, local_batch) int64 indices for this host."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    num_batches = n // global_batch
    local = global_batch // process_count
    out = np.empty((num_batches, local), np.int64)
    lib.klab_epoch_indices(n, global_batch, seed, epoch, process_index,
                           process_count,
                           out.ctypes.data_as(ctypes.c_void_p))
    return out
