"""Compute-path ops: Pallas TPU kernels + GSPMD MoE primitives.

``fused_attention`` provides the fused T5 (plain + learned-bias + dropout,
custom Pallas VJP) and SwinV2 (scaled-cosine + CPB + window masks) attention
kernels. On these short-sequence shapes XLA's own fusions are already near
the VPU/bandwidth limits, so the kernels are perf-neutral for training today
(within ±10% of XLA on v5e) — they are wired behind an opt-in and serve as
the foundation for the decode-attention and long-context paths where fusion
wins are real.

``ring_attention`` streams K/V over the ``seq`` mesh axis (``--seq_attention
ring``); ``moe`` implements Switch/GShard dense-dispatch expert routing for
``--moe_experts`` (expert parallelism over the ``expert`` mesh axis).
"""

from .fused_attention import (blockdiag_mask, pack_head_bias,
                              pack_window_masks, pick_group, set_interpret,
                              swin_fused_attention, t5_fused_attention,
                              t5_fused_attention_packed)
from .moe import moe_capacity, moe_ffn, topk_routing
