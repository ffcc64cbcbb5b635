#!/usr/bin/env python
"""Export a framework checkpoint back to HuggingFace torch state dicts.

Inverse of ``tools/convert_hf_checkpoint.py``: reads an orbax checkpoint
(a full train state saved by the trainer, or a bare parameter tree) and
writes one ``pytorch_model.bin`` per tower, loadable with
``transformers`` ``from_pretrained``-style ``load_state_dict`` — so
checkpoints trained here can be evaluated or served with existing torch
tooling (the reference's own stack, ``/root/reference/models/model.py``).

Usage:
  python tools/export_hf_checkpoint.py \
      --result_dir results/caption/only_transformer --checkpoint best \
      --language_model_name t5-large --transformer_model_name t5-large \
      --output results/hf_export/
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import orbax.checkpoint as ocp
    import torch

    from klab_multimodalmodel_tpu.checkpoint.export_hf import (
        export_swinv2, export_t5_encoder, export_t5_lm)
    from klab_multimodalmodel_tpu.config import Config

    p = argparse.ArgumentParser()
    p.add_argument("--result_dir", required=True)
    p.add_argument("--checkpoint", default="best")
    p.add_argument("--language_model_name", default="t5-large")
    p.add_argument("--transformer_model_name", default="t5-large")
    p.add_argument("--image_model_name",
                   default="microsoft/swinv2-base-patch4-window8-256")
    p.add_argument("--output", required=True)
    args = p.parse_args()

    cfg = Config(language_model_name=args.language_model_name,
                 transformer_model_name=args.transformer_model_name,
                 image_model_name=args.image_model_name)

    ckpt_dir = os.path.join(os.path.abspath(args.result_dir), "checkpoints",
                            args.checkpoint)
    restored = ocp.StandardCheckpointer().restore(ckpt_dir)
    params = restored["params"] if "params" in restored else restored

    exports = {
        "transformer": export_t5_lm(params["transformer"],
                                    cfg.transformer_t5),
        "language_model": export_t5_encoder(params["language_model"],
                                            cfg.language_t5),
        "image_model": export_swinv2(params["image_model"], cfg.swin),
    }
    out = os.path.abspath(args.output)
    for tower, sd in exports.items():
        tower_dir = os.path.join(out, tower)
        os.makedirs(tower_dir, exist_ok=True)
        torch.save({k: torch.from_numpy(v.copy()) for k, v in sd.items()},
                   os.path.join(tower_dir, "pytorch_model.bin"))
        print(f"wrote {tower_dir}/pytorch_model.bin ({len(sd)} tensors)")
    if "vision_projection" in params:
        torch.save(
            {"weight": torch.from_numpy(
                __import__("numpy").asarray(
                    params["vision_projection"]["kernel"],
                    dtype="float32").T.copy())},
            os.path.join(out, "vision_projection.bin"))
        print(f"wrote {out}/vision_projection.bin")


if __name__ == "__main__":
    main()
