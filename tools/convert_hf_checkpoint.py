#!/usr/bin/env python
"""Convert HuggingFace pretrained checkpoints into framework parameters.

The reference pulls its three towers straight from the HF hub at runtime
(``/root/reference/models/model.py:14-17``). This offline tool replaces that:
given locally downloaded checkpoints (torch state dicts) it emits one orbax
checkpoint containing the full ``MultiModalModel`` parameter tree, plus a
converted ``tokenizer.json`` when the fast-tokenizer file is present.

Usage:
  python tools/convert_hf_checkpoint.py \
      --t5_dir /path/to/t5-large \
      --swin_dir /path/to/swinv2-base-patch4-window8-256 \
      --language_model_name t5-large --transformer_model_name t5-large \
      --image_model_name microsoft/swinv2-base-patch4-window8-256 \
      --output results/pretrained/

The T5 checkpoint initializes BOTH the frozen language encoder and the
trainable transformer, matching the reference's from_pretrained calls.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_state_dict(model_dir: str):
    """Load a torch state dict from pytorch_model.bin or model.safetensors."""
    bin_path = os.path.join(model_dir, "pytorch_model.bin")
    st_path = os.path.join(model_dir, "model.safetensors")
    if os.path.exists(st_path):
        from safetensors.torch import load_file

        return load_file(st_path)
    if os.path.exists(bin_path):
        import torch

        return torch.load(bin_path, map_location="cpu", weights_only=True)
    raise FileNotFoundError(f"no checkpoint in {model_dir}")


def main() -> None:
    from klab_multimodalmodel_tpu.checkpoint.convert_hf import (
        convert_swinv2, convert_t5_encoder, convert_t5_lm)
    from klab_multimodalmodel_tpu.config import Config

    p = argparse.ArgumentParser()
    p.add_argument("--t5_dir", required=True)
    p.add_argument("--swin_dir", required=True)
    p.add_argument("--language_model_name", default="t5-large")
    p.add_argument("--transformer_model_name", default="t5-large")
    p.add_argument("--image_model_name",
                   default="microsoft/swinv2-base-patch4-window8-256")
    p.add_argument("--output", required=True)
    args = p.parse_args()

    cfg = Config(language_model_name=args.language_model_name,
                 transformer_model_name=args.transformer_model_name,
                 image_model_name=args.image_model_name)

    t5_sd = load_state_dict(args.t5_dir)
    swin_sd = load_state_dict(args.swin_dir)
    # HF Swinv2Model checkpoints may carry a "swinv2." prefix.
    swin_sd = {k.removeprefix("swinv2."): v for k, v in swin_sd.items()}

    params = {
        "language_model": convert_t5_encoder(t5_sd, cfg.language_t5),
        "transformer": convert_t5_lm(t5_sd, cfg.transformer_t5),
        "image_model": convert_swinv2(swin_sd, cfg.swin),
    }
    d_model = cfg.transformer_t5.d_model
    vis = cfg.swin.num_features
    if cfg.use_vision_projection or vis != d_model:
        if vis == d_model:
            params["vision_projection"] = {
                "kernel": np.eye(d_model, dtype=np.float32)}
        else:
            rng = np.random.default_rng(0)
            params["vision_projection"] = {"kernel": (
                rng.standard_normal((vis, d_model)) / np.sqrt(vis)
            ).astype(np.float32)}

    import asyncio

    import orbax.checkpoint as ocp

    # torch/transformers may have torn down the default asyncio executor;
    # orbax needs a live event loop for its async write path.
    asyncio.set_event_loop(asyncio.new_event_loop())

    out = os.path.abspath(args.output)
    ckpt_path = os.path.join(out, "checkpoints", "pretrained")
    if os.path.isdir(ckpt_path):
        shutil.rmtree(ckpt_path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(ckpt_path, params)
    ckptr.wait_until_finished()

    for tok_name in ("tokenizer.json", "spiece.model"):
        tok_src = os.path.join(args.t5_dir, tok_name)
        if os.path.exists(tok_src):
            shutil.copy(tok_src, os.path.join(out, tok_name))
    n = sum(int(np.prod(v.shape)) for v in
            __import__("jax").tree.leaves(params))
    print(f"wrote {ckpt_path} ({n:,} params)")


if __name__ == "__main__":
    main()
