"""Caption eval runner: checkpoint -> captions -> CIDEr/BLEU/ROUGE-L.

Fills the reference's evaluation gap (it only eyeballs one caption in
``visualization.ipynb`` cell 8): batched greedy decoding over a COCO-style
val set with ALL reference captions per image, reporting CIDEr-D, the
cumulative BLEU-1..4 tuple and ROUGE-L (the pure-algorithm members of the
official COCO-caption metric family) to ``{result_dir}/metrics.json``.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import numpy as np

from ..config import Config
from ..data.coco import CocoIndex
from ..data.datasets import COCO_PROMPT, load_image_resized
from ..infer.captioner import Captioner
from ..text.tokenizer import TokenizerBase
from .metrics import bleu_n, cider_d, rouge_l


def coco_references(data_dir: str, phase: str = "val"
                    ) -> tuple[list[str], list[list[str]]]:
    """(image paths, all captions per image) — unlike training, which uses
    only the first caption (loader.py:35), evaluation uses every reference."""
    anno = os.path.join(data_dir, "annotations",
                        f"captions_{phase}2017.json")
    coco = CocoIndex(anno)
    img_dir = os.path.join(data_dir, f"{phase}2017")
    paths, refs = [], []
    for image_id in coco.getImgIds():
        info = coco.loadImgs(image_id)[0]
        anns = coco.loadAnns(coco.getAnnIds(image_id))
        if not anns:
            continue
        paths.append(os.path.join(img_dir, info["file_name"]))
        refs.append([a["caption"] for a in anns])
    return paths, refs


def evaluate_captions(config: Config, params, tokenizer: TokenizerBase,
                      paths: Sequence[str], references: Sequence[Sequence[str]],
                      batch_size: int = 32, limit: Optional[int] = None,
                      num_beams: Optional[int] = None) -> dict:
    captioner = Captioner(config, params, tokenizer)
    if limit:
        paths = paths[:limit]
        references = references[:limit]
    predictions: list[str] = []
    # Software pipeline: the val-set bottleneck is host JPEG decode
    # (~2.5x the device time per batch at batch 32, BASELINE.md), so
    # launch batch N on the device and decode batch N+1's JPEGs while it
    # runs; caption_finish only blocks when the next batch is ready.
    pending: Optional[tuple] = None
    for i in range(0, len(paths), batch_size):
        chunk = paths[i:i + batch_size]
        # static shapes: pad the ragged tail by repeating the last image
        pad = batch_size - len(chunk)
        imgs = np.stack([load_image_resized(p, config.swin.image_size)
                         for p in chunk] + [np.zeros(
                             (config.swin.image_size,) * 2 + (3,), np.uint8)
                         ] * pad)
        ids = captioner.caption_launch(imgs, [COCO_PROMPT] * batch_size,
                                       num_beams=num_beams)
        if pending is not None:
            predictions.extend(
                captioner.caption_finish(pending[0])[:pending[1]])
        pending = (ids, len(chunk))
    if pending is not None:
        predictions.extend(captioner.caption_finish(pending[0])[:pending[1]])
    refs = list(references)
    bleus = bleu_n(predictions, refs)
    return {
        "num_images": len(paths),
        "CIDEr-D": cider_d(predictions, refs),
        "BLEU-1": bleus[0], "BLEU-2": bleus[1],
        "BLEU-3": bleus[2], "BLEU-4": bleus[3],
        "ROUGE-L": rouge_l(predictions, refs),
        "sample": {"prediction": predictions[0],
                   "references": list(refs[0])} if predictions else {},
    }


def run(config: Config, params, tokenizer: TokenizerBase,
        limit: Optional[int] = None) -> dict:
    paths, refs = coco_references(config.data_dir, "val")
    metrics = evaluate_captions(config, params, tokenizer, paths, refs,
                                limit=limit, num_beams=config.num_beams)
    out = os.path.join(config.result_dir, "metrics.json")
    os.makedirs(config.result_dir, exist_ok=True)
    with open(out, "w") as f:
        json.dump(metrics, f, indent=2)
    return metrics
