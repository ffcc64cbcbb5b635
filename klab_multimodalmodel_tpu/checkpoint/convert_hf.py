"""HuggingFace checkpoint -> framework parameter conversion.

The reference loads pretrained towers straight from the HF hub
(``/root/reference/models/model.py:14-17``). This module is the offline
equivalent: given a torch ``state_dict`` (from a downloaded HF checkpoint or a
locally constructed model), it produces this framework's flax parameter
pytrees. It doubles as the bridge for golden-value tests: tiny random HF
models are converted and outputs compared numerically.

Layout notes:
  * torch ``Linear.weight`` is (out, in); flax ``Dense`` kernels are
    (in, out) -> transpose.
  * scanned stacks expect per-layer weights stacked on a leading layer axis.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping

import numpy as np

from ..config import SwinV2Size, T5Size

Params = dict


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _stack(sd: Mapping[str, Any], fmt: str, n: int,
           transform: Callable[[np.ndarray], np.ndarray] = lambda x: x
           ) -> np.ndarray:
    return np.stack([transform(_np(sd[fmt.format(i=i)])) for i in range(n)])


def _t(w: np.ndarray) -> np.ndarray:
    return w.T


def _gated(size: T5Size) -> bool:
    return size.feed_forward_proj.startswith("gated-")


# ---------------------------------------------------------------------------
# T5
# ---------------------------------------------------------------------------


def _t5_stack_params(sd: Mapping[str, Any], prefix: str, num_layers: int,
                     is_decoder: bool, gated: bool = False) -> Params:
    """Convert one HF T5Stack (encoder or decoder) into scanned-stack params.

    ``gated``: v1.1/Flan MLPs — HF keeps the attribute name
    ``DenseReluDense`` but the gated module's projections are
    ``wi_0``/``wi_1`` instead of ``wi``."""
    ff_idx = 2 if is_decoder else 1
    mlp_proj = ("wi_0", "wi_1", "wo") if gated else ("wi", "wo")
    block: Params = {
        "ln_self": {"weight": _stack(
            sd, prefix + ".block.{i}.layer.0.layer_norm.weight", num_layers)},
        "SelfAttention": {
            p: {"kernel": _stack(
                sd, prefix + ".block.{i}.layer.0.SelfAttention.%s.weight" % p,
                num_layers, _t)}
            for p in ("q", "k", "v", "o")
        },
        "ln_mlp": {"weight": _stack(
            sd, prefix + f".block.{{i}}.layer.{ff_idx}.layer_norm.weight",
            num_layers)},
        "mlp": {
            p: {"kernel": _stack(
                sd,
                prefix + f".block.{{i}}.layer.{ff_idx}.DenseReluDense.%s.weight" % p,
                num_layers, _t)}
            for p in mlp_proj
        },
    }
    if is_decoder:
        block["ln_cross"] = {"weight": _stack(
            sd, prefix + ".block.{i}.layer.1.layer_norm.weight", num_layers)}
        block["EncDecAttention"] = {
            p: {"kernel": _stack(
                sd, prefix + ".block.{i}.layer.1.EncDecAttention.%s.weight" % p,
                num_layers, _t)}
            for p in ("q", "k", "v", "o")
        }
    return {
        "layers": {"block": block},
        "final_layer_norm": {
            "weight": _np(sd[prefix + ".final_layer_norm.weight"])},
    }


def convert_t5_lm(sd: Mapping[str, Any], size: T5Size) -> Params:
    """HF ``T5ForConditionalGeneration`` state_dict -> framework params."""
    params: Params = {
        "shared": {"embedding": _np(sd["shared.weight"])},
        "enc_relpos_bias": {"embedding": _np(
            sd["encoder.block.0.layer.0.SelfAttention"
               ".relative_attention_bias.weight"])},
        "dec_relpos_bias": {"embedding": _np(
            sd["decoder.block.0.layer.0.SelfAttention"
               ".relative_attention_bias.weight"])},
        "encoder": _t5_stack_params(sd, "encoder", size.num_layers, False,
                                    gated=_gated(size)),
        "decoder": _t5_stack_params(sd, "decoder", size.num_decoder_layers,
                                    True, gated=_gated(size)),
    }
    if not size.tie_word_embeddings:
        params["lm_head"] = {"kernel": _t(_np(sd["lm_head.weight"]))}
    return params


def convert_t5_encoder(sd: Mapping[str, Any], size: T5Size) -> Params:
    """HF ``T5EncoderModel`` state_dict -> framework ``T5Encoder`` params."""
    return {
        "shared": {"embedding": _np(sd["shared.weight"])},
        "relpos_bias": {"embedding": _np(
            sd["encoder.block.0.layer.0.SelfAttention"
               ".relative_attention_bias.weight"])},
        "encoder": _t5_stack_params(sd, "encoder", size.num_layers, False,
                                    gated=_gated(size)),
    }


# ---------------------------------------------------------------------------
# SwinV2
# ---------------------------------------------------------------------------


def convert_swinv2(sd: Mapping[str, Any], size: SwinV2Size) -> Params:
    """HF ``Swinv2Model`` state_dict -> framework ``SwinV2Encoder`` params."""
    p: Params = {
        "patch_embed_proj": {
            # conv (out,in,kh,kw) -> flax (kh,kw,in,out)
            "kernel": _np(
                sd["embeddings.patch_embeddings.projection.weight"]
            ).transpose(2, 3, 1, 0),
            "bias": _np(sd["embeddings.patch_embeddings.projection.bias"]),
        },
        "patch_embed_norm": {
            "weight": _np(sd["embeddings.norm.weight"]),
            "bias": _np(sd["embeddings.norm.bias"]),
        },
        "final_norm": {
            "weight": _np(sd["layernorm.weight"]),
            "bias": _np(sd["layernorm.bias"]),
        },
    }
    for si, depth in enumerate(size.depths):
        for li in range(depth):
            pre = f"encoder.layers.{si}.blocks.{li}."
            a = pre + "attention.self."
            p[f"stage_{si}_block_{li}"] = {
                "attn": {
                    "logit_scale": _np(sd[a + "logit_scale"]).reshape(-1),
                    "cpb_fc1": {"kernel": _t(_np(
                        sd[a + "continuous_position_bias_mlp.0.weight"])),
                        "bias": _np(
                        sd[a + "continuous_position_bias_mlp.0.bias"])},
                    "cpb_fc2": {"kernel": _t(_np(
                        sd[a + "continuous_position_bias_mlp.2.weight"]))},
                    "q": {"kernel": _t(_np(sd[a + "query.weight"])),
                          "bias": _np(sd[a + "query.bias"])},
                    "k": {"kernel": _t(_np(sd[a + "key.weight"]))},
                    "v": {"kernel": _t(_np(sd[a + "value.weight"])),
                          "bias": _np(sd[a + "value.bias"])},
                    "proj": {"kernel": _t(_np(
                        sd[pre + "attention.output.dense.weight"])),
                        "bias": _np(sd[pre + "attention.output.dense.bias"])},
                },
                "norm1": {"weight": _np(sd[pre + "layernorm_before.weight"]),
                          "bias": _np(sd[pre + "layernorm_before.bias"])},
                "norm2": {"weight": _np(sd[pre + "layernorm_after.weight"]),
                          "bias": _np(sd[pre + "layernorm_after.bias"])},
                "mlp": {
                    "fc1": {"kernel": _t(_np(
                        sd[pre + "intermediate.dense.weight"])),
                        "bias": _np(sd[pre + "intermediate.dense.bias"])},
                    "fc2": {"kernel": _t(_np(sd[pre + "output.dense.weight"])),
                            "bias": _np(sd[pre + "output.dense.bias"])},
                },
            }
        if si < len(size.depths) - 1:
            dpre = f"encoder.layers.{si}.downsample."
            p[f"stage_{si}_downsample"] = {
                "reduction": {"kernel": _t(_np(sd[dpre + "reduction.weight"]))},
                "norm": {"weight": _np(sd[dpre + "norm.weight"]),
                         "bias": _np(sd[dpre + "norm.bias"])},
            }
    return p
