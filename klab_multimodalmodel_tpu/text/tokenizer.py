"""Tokenization.

The reference tokenizes with the T5 SentencePiece tokenizer via
``AutoTokenizer`` (``/root/reference/train.py:40,56-57``): batch encode with
padding, ``<extra_id_N>`` sentinels (100 of them), decode with
``skip_special_tokens``. Tokenization is host-side work off the TPU hot path.

Two implementations behind one interface:
  * ``UnigramTokenizer`` — wraps a HuggingFace ``tokenizers`` JSON model
    (unigram/BPE). Production path; a T5-compatible vocabulary is obtained by
    converting the official tokenizer (tools/convert_hf_checkpoint.py) or by
    training one with ``train_unigram_tokenizer``.
  * ``ByteTokenizer`` — deterministic UTF-8 byte fallback with the same
    special-token layout; used for tests/smoke runs with no vocab file.

T5 vocabulary conventions preserved: pad=0, eos=1 (``</s>``), unk=2, sentinel
``<extra_id_k>`` = vocab_size - 1 - k (so ``<extra_id_0>`` is the last id),
and an ``</s>`` appended to every encoded sequence.
"""

from __future__ import annotations

import os
from typing import Iterable, Sequence

import numpy as np

NUM_SENTINELS = 100


class BatchEncoding(dict):
    """Dict with attribute access: ``input_ids`` (B, L) and
    ``attention_mask`` (B, L) int32 numpy arrays, fixed shape."""

    @property
    def input_ids(self) -> np.ndarray:
        return self["input_ids"]

    @property
    def attention_mask(self) -> np.ndarray:
        return self["attention_mask"]


class TokenizerBase:
    pad_id: int = 0
    eos_id: int = 1
    unk_id: int = 2
    vocab_size: int
    # How many trailing vocab ids are <extra_id_k> sentinels. Vocabularies
    # loaded WITHOUT sentinel tokens set this to 0, so decode's
    # skip_special_tokens never silently drops the 100 highest-id real
    # tokens of such a vocab.
    num_sentinels: int = NUM_SENTINELS

    # -- core single-sequence ops (implemented by subclasses) --------------
    def encode_ids(self, text: str) -> list[int]:
        raise NotImplementedError

    def decode_ids(self, ids: Sequence[int]) -> str:
        raise NotImplementedError

    def is_special(self, token_id: int) -> bool:
        return (token_id in (self.pad_id, self.eos_id, self.unk_id)
                or token_id >= self.vocab_size - self.num_sentinels)

    def sentinel_id(self, k: int) -> int:
        """``<extra_id_k>`` id — T5 convention: vocab_size - 1 - k."""
        if k >= self.num_sentinels:
            raise ValueError(
                f"<extra_id_{k}>: this vocabulary has "
                f"{self.num_sentinels} sentinel tokens")
        return self.vocab_size - 1 - k

    # -- batch interface (mirrors the reference's tokenizer(...) calls) ----
    def __call__(self, texts: Sequence[str], max_length: int,
                 padding: str = "max_length",
                 add_eos: bool = True) -> BatchEncoding:
        """Batch encode with truncation and fixed-shape padding.

        ``padding='max_length'`` (default) pads every batch to ``max_length``
        — the XLA-static-shape replacement for the reference's
        ``padding='longest'`` dynamic padding (quirk avoidance: 'longest'
        would trigger one recompile per distinct batch length).
        ``padding='longest'`` is still available for host-side use.
        """
        encoded = []
        for t in texts:
            ids = self.encode_ids(t)
            limit = max_length - (1 if add_eos else 0)
            ids = ids[:limit]
            if add_eos:
                ids = ids + [self.eos_id]
            encoded.append(ids)
        if padding == "longest":
            max_length = max(len(e) for e in encoded) if encoded else 1
        B = len(encoded)
        input_ids = np.full((B, max_length), self.pad_id, np.int32)
        mask = np.zeros((B, max_length), np.int32)
        for i, ids in enumerate(encoded):
            L = min(len(ids), max_length)
            input_ids[i, :L] = ids[:L]
            mask[i, :L] = 1
        return BatchEncoding(input_ids=input_ids, attention_mask=mask)

    def decode(self, ids: Sequence[int],
               skip_special_tokens: bool = True) -> str:
        ids = [int(i) for i in np.asarray(ids).reshape(-1)]
        if skip_special_tokens:
            ids = [i for i in ids if not self.is_special(i)]
        return self.decode_ids(ids)

    def batch_decode(self, batch, skip_special_tokens: bool = True
                     ) -> list[str]:
        return [self.decode(row, skip_special_tokens) for row in batch]


class ByteTokenizer(TokenizerBase):
    """UTF-8 bytes + T5 special-token layout. Zero-dependency fallback.

    id layout: 0=pad, 1=</s>, 2=<unk>, 3..258 = bytes 0..255,
    then padding ids, then 100 sentinels at the top (T5 convention).
    ``<extra_id_k>`` strings round-trip through encode/decode.
    """

    BYTE_OFFSET = 3

    def __init__(self, vocab_size: int = 384):
        assert vocab_size >= self.BYTE_OFFSET + 256 + NUM_SENTINELS
        self.vocab_size = vocab_size
        self._sentinel_strs = {
            f"<extra_id_{k}>": self.sentinel_id(k)
            for k in range(NUM_SENTINELS)}
        self._id_to_sentinel = {v: k for k, v in self._sentinel_strs.items()}

    def encode_ids(self, text: str) -> list[int]:
        out: list[int] = []
        i = 0
        while i < len(text):
            if text[i] == "<":
                end = text.find(">", i)
                if end != -1 and text[i:end + 1] in self._sentinel_strs:
                    out.append(self._sentinel_strs[text[i:end + 1]])
                    i = end + 1
                    continue
            out.extend(b + self.BYTE_OFFSET
                       for b in text[i].encode("utf-8"))
            i += 1
        return out

    def decode_ids(self, ids: Sequence[int]) -> str:
        parts: list[str] = []
        buf = bytearray()
        for i in ids:
            if self.BYTE_OFFSET <= i < self.BYTE_OFFSET + 256:
                buf.append(i - self.BYTE_OFFSET)
            else:
                if buf:
                    parts.append(buf.decode("utf-8", errors="replace"))
                    buf = bytearray()
                if i in self._id_to_sentinel:
                    parts.append(self._id_to_sentinel[i])
        if buf:
            parts.append(buf.decode("utf-8", errors="replace"))
        return "".join(parts)


def _tokenizer_from_spm(path: str):
    """Build a ``tokenizers`` Tokenizer straight from a SentencePiece
    ``spiece.model`` proto (the artifact the reference's ``AutoTokenizer``
    reads, ``/root/reference/train.py:40``) — letting ``--tokenizer_path``
    point at the official T5 file with no conversion step. The proto is
    parsed with the vendored wire-format reader (``spm_proto.py``), so
    neither ``transformers`` nor the ``sentencepiece`` package is needed at
    runtime. Mirrors HF's T5 fast-tokenizer construction: unigram pieces +
    precompiled normalizer + metaspace, with the 100 ``<extra_id_k>``
    sentinels appended reversed so ``<extra_id_0>`` = vocab_size - 1.
    """
    from tokenizers import (Regex, Tokenizer, decoders, models, normalizers,
                            pre_tokenizers)

    from .spm_proto import load_model_proto

    m = load_model_proto(path)
    if m.model_type != 1:  # 1 = UNIGRAM
        raise ValueError(f"{path}: only unigram SentencePiece models are "
                         "supported (T5's spiece.model is unigram)")
    vocab = list(m.pieces)
    tok = Tokenizer(models.Unigram(vocab, m.unk_id, m.byte_fallback))
    # Exactly HF's SpmConverter.normalizer chain (T5Converter inherits it):
    # optional Precompiled charsmap, right-strip, multi-space -> "▁".
    norms = []
    if m.precompiled_charsmap:
        norms.append(normalizers.Precompiled(m.precompiled_charsmap))
    norms.append(normalizers.Strip(left=False, right=True))
    norms.append(normalizers.Replace(Regex(" {2,}"), "▁"))
    tok.normalizer = normalizers.Sequence(norms)
    tok.pre_tokenizer = pre_tokenizers.Metaspace()
    tok.decoder = decoders.Metaspace()
    tok.add_special_tokens(
        [f"<extra_id_{k}>" for k in reversed(range(NUM_SENTINELS))])
    return tok


class UnigramTokenizer(TokenizerBase):
    """HuggingFace ``tokenizers``-backed subword tokenizer.

    Loads a ``tokenizer.json`` whose vocabulary follows the T5 layout
    (pad/eos/unk + trailing sentinels), or a raw SentencePiece
    ``*.model`` proto (converted in-memory by ``_tokenizer_from_spm``).
    ``train_unigram_tokenizer`` below produces compatible JSON files.
    """

    def __init__(self, path: str):
        from tokenizers import Tokenizer

        if path.endswith(".model"):
            self._tok = _tokenizer_from_spm(path)
        else:
            self._tok = Tokenizer.from_file(path)
        self.vocab_size = self._tok.get_vocab_size()
        pad = self._tok.token_to_id("<pad>")
        eos = self._tok.token_to_id("</s>")
        unk = self._tok.token_to_id("<unk>")
        if None in (pad, eos, unk):
            raise ValueError(f"{path}: vocab missing <pad>/</s>/<unk>")
        self.pad_id, self.eos_id, self.unk_id = pad, eos, unk
        s0 = self._tok.token_to_id("<extra_id_0>")
        if s0 is None:
            # Sentinel-free vocab (tolerated for caption-only runs): the
            # top ids are ordinary tokens and must survive decode.
            self.num_sentinels = 0
        elif s0 != self.vocab_size - 1:
            raise ValueError(
                f"{path}: <extra_id_0> must be the last vocab id "
                f"(T5 convention), got {s0} of {self.vocab_size}")
        else:
            # Measure the actual contiguous sentinel run from the top
            # (vocabs trained with fewer than the T5-default 100 are
            # tolerated) so is_special/sentinel_id never cover real ids.
            n = 1
            while (n < self.vocab_size
                   and self._tok.token_to_id(f"<extra_id_{n}>")
                   == self.vocab_size - 1 - n):
                n += 1
            self.num_sentinels = n

    def encode_ids(self, text: str) -> list[int]:
        return self._tok.encode(text, add_special_tokens=False).ids

    def decode_ids(self, ids: Sequence[int]) -> str:
        return self._tok.decode(list(ids), skip_special_tokens=False).strip()


def train_unigram_tokenizer(texts: Iterable[str], path: str,
                            vocab_size: int = 1000) -> "UnigramTokenizer":
    """Train a T5-layout unigram tokenizer and write ``tokenizer.json``."""
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers

    tok = Tokenizer(models.Unigram())
    tok.pre_tokenizer = pre_tokenizers.Metaspace()
    tok.decoder = decoders.Metaspace()
    sentinels = [f"<extra_id_{k}>" for k in range(NUM_SENTINELS)]
    trainer = trainers.UnigramTrainer(
        vocab_size=vocab_size - NUM_SENTINELS,
        special_tokens=["<pad>", "</s>", "<unk>"],
        unk_token="<unk>")
    tok.train_from_iterator(texts, trainer)
    # Sentinels go last, reversed, so <extra_id_0> = vocab_size - 1.
    tok.add_special_tokens(list(reversed(sentinels)))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tok.save(path)
    return UnigramTokenizer(path)


def load_tokenizer(path: str = "") -> TokenizerBase:
    """Config-driven factory: ``tokenizer.json`` path, ``spiece.model``
    path, or '' for the byte fallback."""
    if path:
        return UnigramTokenizer(path)
    return ByteTokenizer()
