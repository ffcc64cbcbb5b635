"""Datasets: MSCOCO captions, RedCaps span-corruption, synthetic.

Behavioral parity with ``/root/reference/modules/loader.py``:
  * COCO: ``captions_{phase}2017.json``, **first caption only** per image
    (line 35), fixed prompt ``'What does th image describe ?'`` — typo
    preserved (line 38);
  * RedCaps: eagerly indexes ``annotations/*.json``; per-sample dynamic
    span corruption; the reference ignores ``phase`` (train and val iterate
    identical data — quirk documented in SURVEY.md §2A), reproduced here;
  * images: decode -> RGB -> resize 256x256 on the host; normalization runs
    on-device (``image_ops.normalize_images``), fixing the double-preprocess
    quirk #5 (reference resizes+rescales in the dataset *and* re-runs the HF
    processor per step on the hot path, ``/root/reference/train.py:55``).

Items are ``(image_uint8 (H,W,3), src_text, tgt_text)``; tokenization and
batching live in ``pipeline.py``.
"""

from __future__ import annotations

import json
import os
from typing import Sequence

import numpy as np

from ..text.span_corruption import span_corrupt
from .coco import CocoIndex

COCO_PROMPT = "What does th image describe ?"  # sic — loader.py:38


def load_image_resized(path: str, size: int = 256) -> np.ndarray:
    """Decode -> RGB -> resize -> (size, size, 3) uint8.

    Host hot path: JPEG draft mode lets libjpeg decode directly to a
    near-target scale (2-4x faster than full decode), then the C++ runtime
    (native/klab_host.cpp) does the exact bicubic resize; Pillow fallback
    otherwise. Semantics match the reference's PIL resize (loader.py:15).
    """
    return _decode_resized(path, size)


def load_image_bytes_resized(data: bytes, size: int = 256) -> np.ndarray:
    """``load_image_resized`` over in-memory encoded bytes (the serving
    path: request bodies never touch disk). Identical decode semantics."""
    import io

    return _decode_resized(io.BytesIO(data), size)


def _decode_resized(src, size: int) -> np.ndarray:
    from PIL import Image

    from .. import native

    with Image.open(src) as im:
        # draft only applies to JPEG; no-op otherwise. Never draft below the
        # target size (would lose resolution before the proper resample).
        im.draft("RGB", (size, size))
        im = im.convert("RGB")
        if native.available():
            return native.resize_batch(
                [np.asarray(im, dtype=np.uint8)], size,
                filter=native.BICUBIC, n_threads=1)[0]
        return np.asarray(im.resize((size, size)), dtype=np.uint8)


class DatasetBase:
    """Indexable dataset of (image, src_text, tgt_text)."""

    image_size: int = 256
    # True when a sample's source text never changes across epochs (caption
    # prompts): lets the frozen-feature cache also cache the frozen language
    # tower's output. Span corruption re-masks per epoch, so it sets False.
    source_is_static: bool = True
    # Set by the train loop for epochs where every image feature is already
    # in the frozen-feature cache: the step ignores the image tensor, so
    # skipping the JPEG decode+resize removes the host-side bottleneck
    # entirely (decode runs ~131 img/s/core vs ~940 img/s/chip device rate).
    skip_image_load: bool = False

    def _image_or_stub(self, path: str) -> np.ndarray:
        if self.skip_image_load:
            return np.zeros((self.image_size, self.image_size, 3), np.uint8)
        return load_image_resized(path, self.image_size)

    def __len__(self) -> int:
        raise NotImplementedError

    def __getitem__(self, idx: int) -> tuple[np.ndarray, str, str]:
        raise NotImplementedError

    def set_epoch(self, epoch: int) -> None:
        """Per-epoch reseed hook (fixes the reference's missing
        ``sampler.set_epoch``, SURVEY.md §2A dataloader row)."""


class CocoCaptionDataset(DatasetBase):
    def __init__(self, data_dir: str, phase: str = "train",
                 image_size: int = 256):
        anno_path = os.path.join(data_dir, "annotations",
                                 f"captions_{phase}2017.json")
        coco = CocoIndex(anno_path)
        img_dir = os.path.join(data_dir, f"{phase}2017")
        self.image_size = image_size
        self.images: list[str] = []
        self.captions: list[str] = []
        for image_id in coco.getImgIds():
            info = coco.loadImgs(image_id)[0]
            anns = coco.loadAnns(coco.getAnnIds(image_id))
            if not anns:
                continue
            self.images.append(os.path.join(img_dir, info["file_name"]))
            self.captions.append(anns[0]["caption"])  # first caption only

    def __len__(self) -> int:
        return len(self.images)

    def __getitem__(self, idx: int):
        img = self._image_or_stub(self.images[idx])
        return img, COCO_PROMPT, self.captions[idx]


class RedCapsDataset(DatasetBase):
    """Self-supervised span-corruption pretraining on RedCaps."""

    source_is_static = False  # dynamic per-epoch masking

    def __init__(self, data_dir: str, phase: str = "train",
                 image_size: int = 256, seed: int = 0):
        anno_dir = os.path.join(data_dir, "annotations")
        img_dir = os.path.join(data_dir, "images")
        self.image_size = image_size
        self.seed = seed
        self.epoch = 0
        self.images: list[str] = []
        self.raw_captions: list[str] = []
        for name in sorted(os.listdir(anno_dir)):
            with open(os.path.join(anno_dir, name)) as f:
                annotations = json.load(f)
            for ann in annotations["annotations"]:
                self.images.append(os.path.join(
                    img_dir, ann["subreddit"], f"{ann['image_id']}.jpg"))
                self.raw_captions.append(ann["raw_caption"])
        # NOTE: like the reference (loader.py:42-54), ``phase`` does not
        # split the data — train and val see the same examples.

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        return len(self.images)

    def __getitem__(self, idx: int):
        rng = np.random.default_rng(
            (self.seed * 1_000_003 + self.epoch) * 2_654_435_761 + idx)
        src, tgt = span_corrupt(self.raw_captions[idx], rng)
        img = self._image_or_stub(self.images[idx])
        return img, src, tgt


class SyntheticCaptionDataset(DatasetBase):
    """Deterministic in-memory dataset for tests/benchmarks (no disk IO)."""

    _CAPTIONS = [
        "A man with a red helmet on a small moped on a dirt road.",
        "A dog jumps over a wooden fence in a park.",
        "Two cats sit on a sunny window sill.",
        "A plate of food with rice and vegetables on a table.",
    ]
    # 'skew' variant: extreme length spread so --bucket_lengths lands rows
    # in DIFFERENT pow2 buckets — exercises the cross-host bucket-width
    # consensus (a host whose shard is all-short must still compile the
    # global width another host's long row forces).
    _CAPTIONS_SKEW = [
        "A dog.",
        "A man with a red helmet on a small moped rides down a long and "
        "winding dirt road past tall green trees near a mountain village.",
        "Two cats.",
        "A large plate of steaming food with fried rice, grilled seasonal "
        "vegetables and a tall glass of fresh orange juice on a table.",
    ]

    def __init__(self, n: int = 64, image_size: int = 256, seed: int = 0,
                 pretrain: bool = False, skew: bool = False):
        self.n = n
        self.image_size = image_size
        self.seed = seed
        self.pretrain = pretrain
        self.skew = skew
        # pretrain mode re-corrupts per epoch -> source text is dynamic
        self.source_is_static = not pretrain
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        return self.n

    def __getitem__(self, idx: int):
        rng = np.random.default_rng(self.seed + idx)
        img = rng.integers(0, 256, size=(self.image_size, self.image_size, 3),
                           dtype=np.uint8)
        captions = self._CAPTIONS_SKEW if self.skew else self._CAPTIONS
        caption = captions[idx % len(captions)]
        if self.pretrain:
            crng = np.random.default_rng(self.seed + self.epoch * 131 + idx)
            src, tgt = span_corrupt(caption, crng)
            return img, src, tgt
        return img, COCO_PROMPT, caption


def build_dataset(data_dir: str, phase: str, image_size: int = 256,
                  seed: int = 0) -> DatasetBase:
    """Dataset dispatch by substring of ``data_dir`` — the reference's
    factory rule (``/root/reference/modules/loader.py:80-85``), extended
    with a 'synthetic' option."""
    low = data_dir.lower()
    if "mscoco" in low:
        return CocoCaptionDataset(data_dir, phase, image_size)
    if "redcaps" in low:
        return RedCapsDataset(data_dir, phase, image_size, seed)
    if "synthetic" in low:
        return SyntheticCaptionDataset(image_size=image_size, seed=seed,
                                       pretrain="pretrain" in low,
                                       skew="skew" in low)
    raise NotImplementedError(f"no dataset for data_dir={data_dir!r}")
