#!/usr/bin/env python
"""Inference demo — script parity with ``visualization.ipynb`` (cells 0-8).

Loads a checkpoint, picks COCO val image 0 (or a given image), greedy-decodes
a caption, and prints ground truth vs prediction:

  python tools/visualize.py --result_dir results/caption/only_transformer \
      --checkpoint best --data_dir /data/mscoco2017 [--image /path/img.jpg]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import orbax.checkpoint as ocp

    from klab_multimodalmodel_tpu.config import Config
    from klab_multimodalmodel_tpu.data.datasets import load_image_resized
    from klab_multimodalmodel_tpu.evaluation import coco_references
    from klab_multimodalmodel_tpu.infer.captioner import Captioner
    from klab_multimodalmodel_tpu.models.multimodal import MultiModalModel
    from klab_multimodalmodel_tpu.text import load_tokenizer

    p = argparse.ArgumentParser()
    p.add_argument("--result_dir", required=True)
    p.add_argument("--checkpoint", default="best")
    p.add_argument("--data_dir", default=None)
    p.add_argument("--image", default=None)
    p.add_argument("--num_beams", type=int, default=1)
    args = p.parse_args()

    cfg_path = os.path.join(args.result_dir, "config.json")
    with open(cfg_path) as f:
        config = Config.from_json(f.read())
    if args.data_dir:
        config.data_dir = args.data_dir

    tokenizer = load_tokenizer(config.tokenizer_path)
    model = MultiModalModel(config)
    # shape template for restore
    tmpl = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1,) + (config.swin.image_size,) * 2 + (3,), np.float32),
        np.zeros((1, config.max_source_length), np.int32),
        np.zeros((1, 4), np.int32))["params"]
    ckpt_dir = os.path.join(os.path.abspath(args.result_dir), "checkpoints",
                            args.checkpoint)
    restored = ocp.StandardCheckpointer().restore(ckpt_dir)
    params = restored["params"] if "params" in restored else restored
    del tmpl

    gt = None
    if args.image:
        img = load_image_resized(args.image, config.swin.image_size)
    else:
        paths, refs = coco_references(config.data_dir, "val")
        img = load_image_resized(paths[0], config.swin.image_size)
        gt = refs[0][0]

    captioner = Captioner(config, params, tokenizer)
    pred = captioner.caption(img[None], num_beams=args.num_beams)[0]
    if gt is not None:
        print(f"GT   : {gt}")
    print(f"Pred : {pred}")


if __name__ == "__main__":
    main()
