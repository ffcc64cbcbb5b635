"""Framework parameters -> HuggingFace state_dict export (inverse of
``convert_hf.py``).

Lets a checkpoint trained here flow back into the reference's torch
ecosystem: the exported dicts load into ``transformers``
``T5ForConditionalGeneration`` / ``T5EncoderModel`` / ``Swinv2Model``
(the towers the reference builds at ``/root/reference/models/model.py:
14-17``), so existing HF eval/serving tooling keeps working after
migrating training to this framework.

Inverse layout rules (see convert_hf.py): flax Dense kernels (in, out) ->
torch Linear (out, in); scanned stacks carry a leading layer axis that
unstacks into per-layer HF keys.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from ..config import SwinV2Size, T5Size

Params = Mapping[str, Any]


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _t(w) -> np.ndarray:
    return _np(w).T


def _unstack_t5_stack(stack: Params, prefix: str, num_layers: int,
                      is_decoder: bool, out: dict) -> None:
    block = stack["layers"]["block"]
    ff_idx = 2 if is_decoder else 1
    for i in range(num_layers):
        b = f"{prefix}.block.{i}.layer"
        out[f"{b}.0.layer_norm.weight"] = _np(
            block["ln_self"]["weight"][i])
        for p in ("q", "k", "v", "o"):
            out[f"{b}.0.SelfAttention.{p}.weight"] = _t(
                block["SelfAttention"][p]["kernel"][i])
        if is_decoder:
            out[f"{b}.1.layer_norm.weight"] = _np(
                block["ln_cross"]["weight"][i])
            for p in ("q", "k", "v", "o"):
                out[f"{b}.1.EncDecAttention.{p}.weight"] = _t(
                    block["EncDecAttention"][p]["kernel"][i])
        out[f"{b}.{ff_idx}.layer_norm.weight"] = _np(
            block["ln_mlp"]["weight"][i])
        # v1.1/Flan gated MLPs carry wi_0/wi_1 instead of wi; read whatever
        # the params actually hold (HF's attribute is DenseReluDense either
        # way).
        for p in sorted(block["mlp"]):
            out[f"{b}.{ff_idx}.DenseReluDense.{p}.weight"] = _t(
                block["mlp"][p]["kernel"][i])
    out[f"{prefix}.final_layer_norm.weight"] = _np(
        stack["final_layer_norm"]["weight"])


def export_t5_lm(params: Params, size: T5Size) -> dict:
    """Framework T5ForConditionalGeneration params -> HF state_dict."""
    shared = _np(params["shared"]["embedding"])
    sd: dict = {
        "shared.weight": shared,
        "encoder.embed_tokens.weight": shared,
        "decoder.embed_tokens.weight": shared,
        "encoder.block.0.layer.0.SelfAttention.relative_attention_bias"
        ".weight": _np(params["enc_relpos_bias"]["embedding"]),
        "decoder.block.0.layer.0.SelfAttention.relative_attention_bias"
        ".weight": _np(params["dec_relpos_bias"]["embedding"]),
    }
    _unstack_t5_stack(params["encoder"], "encoder", size.num_layers,
                      False, sd)
    _unstack_t5_stack(params["decoder"], "decoder",
                      size.num_decoder_layers, True, sd)
    if "lm_head" in params:
        sd["lm_head.weight"] = _t(params["lm_head"]["kernel"])
    else:
        sd["lm_head.weight"] = shared  # tied embeddings
    return sd


def export_t5_encoder(params: Params, size: T5Size) -> dict:
    """Framework T5Encoder params -> HF T5EncoderModel state_dict."""
    shared = _np(params["shared"]["embedding"])
    sd: dict = {
        "shared.weight": shared,
        "encoder.embed_tokens.weight": shared,
        "encoder.block.0.layer.0.SelfAttention.relative_attention_bias"
        ".weight": _np(params["relpos_bias"]["embedding"]),
    }
    _unstack_t5_stack(params["encoder"], "encoder", size.num_layers,
                      False, sd)
    return sd


def export_swinv2(params: Params, size: SwinV2Size) -> dict:
    """Framework SwinV2Encoder params -> HF Swinv2Model state_dict."""
    sd: dict = {
        # flax conv (kh,kw,in,out) -> torch (out,in,kh,kw)
        "embeddings.patch_embeddings.projection.weight": _np(
            params["patch_embed_proj"]["kernel"]).transpose(3, 2, 0, 1),
        "embeddings.patch_embeddings.projection.bias": _np(
            params["patch_embed_proj"]["bias"]),
        "embeddings.norm.weight": _np(params["patch_embed_norm"]["weight"]),
        "embeddings.norm.bias": _np(params["patch_embed_norm"]["bias"]),
        "layernorm.weight": _np(params["final_norm"]["weight"]),
        "layernorm.bias": _np(params["final_norm"]["bias"]),
    }
    for si, depth in enumerate(size.depths):
        for li in range(depth):
            blk = params[f"stage_{si}_block_{li}"]
            pre = f"encoder.layers.{si}.blocks.{li}."
            a = pre + "attention.self."
            attn = blk["attn"]
            sd[a + "logit_scale"] = _np(attn["logit_scale"]).reshape(
                -1, 1, 1)
            sd[a + "continuous_position_bias_mlp.0.weight"] = _t(
                attn["cpb_fc1"]["kernel"])
            sd[a + "continuous_position_bias_mlp.0.bias"] = _np(
                attn["cpb_fc1"]["bias"])
            sd[a + "continuous_position_bias_mlp.2.weight"] = _t(
                attn["cpb_fc2"]["kernel"])
            sd[a + "query.weight"] = _t(attn["q"]["kernel"])
            sd[a + "query.bias"] = _np(attn["q"]["bias"])
            sd[a + "key.weight"] = _t(attn["k"]["kernel"])
            sd[a + "value.weight"] = _t(attn["v"]["kernel"])
            sd[a + "value.bias"] = _np(attn["v"]["bias"])
            sd[pre + "attention.output.dense.weight"] = _t(
                attn["proj"]["kernel"])
            sd[pre + "attention.output.dense.bias"] = _np(
                attn["proj"]["bias"])
            sd[pre + "layernorm_before.weight"] = _np(
                blk["norm1"]["weight"])
            sd[pre + "layernorm_before.bias"] = _np(blk["norm1"]["bias"])
            sd[pre + "layernorm_after.weight"] = _np(blk["norm2"]["weight"])
            sd[pre + "layernorm_after.bias"] = _np(blk["norm2"]["bias"])
            sd[pre + "intermediate.dense.weight"] = _t(
                blk["mlp"]["fc1"]["kernel"])
            sd[pre + "intermediate.dense.bias"] = _np(
                blk["mlp"]["fc1"]["bias"])
            sd[pre + "output.dense.weight"] = _t(blk["mlp"]["fc2"]["kernel"])
            sd[pre + "output.dense.bias"] = _np(blk["mlp"]["fc2"]["bias"])
        if si < len(size.depths) - 1:
            ds = params[f"stage_{si}_downsample"]
            dpre = f"encoder.layers.{si}.downsample."
            sd[dpre + "reduction.weight"] = _t(ds["reduction"]["kernel"])
            sd[dpre + "norm.weight"] = _np(ds["norm"]["weight"])
            sd[dpre + "norm.bias"] = _np(ds["norm"]["bias"])
    return sd
