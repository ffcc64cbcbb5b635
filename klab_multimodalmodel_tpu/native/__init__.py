"""ctypes bindings for the native host runtime (native/klab_host.cpp).

Provides the C++ equivalents of the reference's native host dependencies
(SURVEY.md §2C): Pillow-compatible multithreaded image resizing and a
SentencePiece-style unigram tokenizer core with the full HF-T5
normalization chain (production opt-in via --native_tokenizer). Every
entry degrades gracefully to the pure Python/Pillow path when the shared
library is unavailable.
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
        lib.klab_tok_encode_batch.restype = ctypes.c_int
        lib.klab_tok_add_special.argtypes = [
            ctypes.c_int, ctypes.c_char_p, ctypes.c_int]
        lib.klab_tok_add_special.restype = ctypes.c_int
        lib.klab_tok_set_charsmap.argtypes = [
            ctypes.c_int, ctypes.c_char_p, ctypes.c_int64]
        lib.klab_tok_set_charsmap.restype = ctypes.c_int
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
    """C++ Viterbi batch encoder with the FULL HF-T5 tokenization chain.

    Loads either a HF-tokenizers unigram ``tokenizer.json`` or a raw
    SentencePiece ``spiece.model`` proto (the reference's tokenizer
    artifact, ``/root/reference/train.py:40``) — the same two inputs
    ``text.tokenizer.UnigramTokenizer`` accepts — and reproduces its
    pipeline natively: precompiled-charsmap normalization, right-strip,
    multi-space collapse, metaspace, raw-text sentinel extraction,
    per-pre-token Viterbi. Parity vs the Python path is pinned by
    tests/test_native.py (incl. charsmap + sentinel cases). Covers the hot
    path (batch encode + pad); decode stays on the Python tokenizer,
    mirroring the reference's host-side sentencepiece split.
    """

    def __init__(self, path: str):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native library unavailable")
        if path.endswith(".model"):
            pieces, scores, ids, unk_id, charsmap, specials = \
                self._from_spm(path)
        else:
            pieces, scores, ids, unk_id, charsmap, specials = \
                self._from_json(path)
        blob = b"\0".join(pieces) + b"\0"
        score_arr = (ctypes.c_float * len(scores))(*scores)
        id_arr = (ctypes.c_int * len(ids))(*ids)
        self._lib = lib
        self._handle = lib.klab_tok_new(blob, score_arr, id_arr, len(ids),
                                        unk_id)
        for content, tok_id in specials:
            lib.klab_tok_add_special(self._handle,
                                     content.encode("utf-8"), tok_id)
        if charsmap:
            rc = lib.klab_tok_set_charsmap(self._handle, charsmap,
                                           len(charsmap))
            if rc != 0:
                raise ValueError(f"{path}: malformed precompiled_charsmap")

    @staticmethod
    def _from_spm(path: str):
        """Mirror text.tokenizer._tokenizer_from_spm: unigram pieces +
        charsmap from the proto, 100 sentinels appended reversed so
        <extra_id_0> = vocab_size - 1."""
        from ..text.spm_proto import load_model_proto

        m = load_model_proto(path)
        if m.model_type != 1:
            raise ValueError(f"{path}: only unigram models supported")
        pieces = [p.encode("utf-8") for p, _ in m.pieces]
        scores = [s for _, s in m.pieces]
        ids = list(range(len(pieces)))
        n = len(pieces)
        specials = [(f"<extra_id_{k}>", n + (99 - k)) for k in range(100)]
        return pieces, scores, ids, m.unk_id, m.precompiled_charsmap, specials

    @staticmethod
    def _from_json(path: str):
        import base64

        with open(path) as f:
            spec = json.load(f)
        model = spec.get("model", {})
        if model.get("type") != "Unigram":
            raise ValueError("native encoder requires a Unigram model")
        vocab = model["vocab"]  # [[piece, score], ...]
        pieces = [p.encode("utf-8") for p, _ in vocab]
        scores = [s for _, s in vocab]
        ids = list(range(len(pieces)))
        # added tokens beyond the unigram vocab (sentinels) are specials,
        # matched on raw text — NOT scored pieces
        specials = [(t["content"], t["id"])
                    for t in spec.get("added_tokens", [])
                    if t["id"] >= len(vocab)]
        charsmap = b""
        norm = spec.get("normalizer") or {}
        chain = norm.get("normalizers", [norm] if norm else [])
        for entry in chain:
            if entry.get("type") == "Precompiled":
                charsmap = base64.b64decode(entry["precompiled_charsmap"])
        return pieces, scores, ids, model.get("unk_id", 2), charsmap, specials

    def encode_batch(self, texts: Sequence[str], max_len: int,
                     pad_id: int = 0, eos_id: int = 1,
                     n_threads: int = 0) -> tuple[np.ndarray, np.ndarray]:
        blob = b"\0".join(t.encode("utf-8") for t in texts) + b"\0"
        B = len(texts)
        ids = np.empty((B, max_len), np.int32)
        mask = np.empty((B, max_len), np.int32)
        rc = self._lib.klab_tok_encode_batch(
            self._handle, blob, B, ids.ctypes.data_as(ctypes.c_void_p),
            mask.ctypes.data_as(ctypes.c_void_p), max_len, pad_id, eos_id,
            n_threads)
        if rc != 0:
            # The buffers were never written (np.empty garbage) — fail
            # loudly rather than hand back uninitialized "tokens".
            raise ValueError(
                f"native encode_batch rejected its inputs (rc={rc}): "
                f"handle={self._handle}, max_len={max_len}, batch={B}")
        return ids, mask


# (A ctypes binding for a C++ epoch-shuffle generator used to live here;
# excised together with its kernel: numpy's Generator.permutation is
# already vectorized C, and a second RNG would change shuffle orders vs
# the Python path for zero gain.)
