"""T5 encoder-decoder (v1.0 and v1.1/Flan geometries), TPU-native.

Re-implements the capability the reference pulls in through HuggingFace
``T5EncoderModel`` / ``T5ForConditionalGeneration``
(``/root/reference/models/model.py:4,14,17``): relative-position-bucket
attention bias, RMSNorm, un-gated ReLU MLPs, tied LM head with the
``d_model**-0.5`` output scale, teacher-forced cross-entropy, and an
incremental-decode path with a KV cache. Beyond the reference's five v1.0
sizes, ``size.feed_forward_proj`` / ``size.tie_word_embeddings`` select the
v1.1 recipe (gated tanh-GELU MLPs, untied LM head) used by
``google/t5-v1_1-*`` and ``google/flan-t5-*`` checkpoints.

TPU-first choices (not a port of the torch code):
  * layers are stacked with ``nn.scan`` (one compiled block body, layer axis
    as data) — compile time stays flat in depth;
  * softmax/norm statistics in fp32, matmuls in bf16 via the dtype policy;
  * attention masks are additive fp32 biases fused into the logits;
  * incremental decoding uses fixed-shape cache buffers updated with
    ``lax.dynamic_update_slice`` so the greedy loop is a single XLA while-loop.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import T5Size
from ..ops.fused_attention import (pack_head_bias, pick_group,
                                   t5_fused_attention_packed)
from ..ops.ring_attention import ring_applicable, ring_self_attention
from ..parallel.partitioning import (mesh_axis_size, pipe_constraint,
                                     seq_constraint, tick_constraint)
from .layers import NEG_INF, RMSNorm, dot_product_attention

Dtype = Any


def embed_tokens(embed: nn.Embed, ids: jax.Array) -> jax.Array:
    """Token-embedding lookup; one-hot matmul when the vocab is TP-sharded.

    The (vocab, d_model) ``shared`` table is sharded ``P('tensor','fsdp')``
    (parallel/partitioning.py). A plain gather on the vocab-sharded operand
    makes XLA's SPMD partitioner replicate the whole table on every lookup
    — the "Involuntary full rematerialization" warnings recorded in
    MULTICHIP_r03.json. The TPU idiom is a one-hot matmul: each shard
    contracts only its local vocab rows and the partitioner finishes with a
    psum over ``tensor`` — MXU-friendly, and bit-exact with the gather
    (each output element is a single product by an exact 1.0; the matmul
    runs at ``Precision.HIGHEST`` — the T5X/flaxformer one-hot-embed idiom
    — so a float32 table is NOT truncated to bf16 by the TPU default
    matmul precision, keeping f32 TP runs bit-exact too). Falls back
    to the plain gather when the ambient mesh has no nontrivial ``tensor``
    axis, so single-chip and DP/FSDP compilations are unchanged.
    """
    if mesh_axis_size("tensor") == 1:
        return embed(ids)
    table = jnp.asarray(embed.embedding, embed.dtype)
    hot = jax.nn.one_hot(ids, table.shape[0], dtype=table.dtype)
    return jax.lax.dot_general(hot, table,
                               (((ids.ndim,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# Relative position bias
# ---------------------------------------------------------------------------


def relative_position_bucket(relative_position: jax.Array,
                             bidirectional: bool = True,
                             num_buckets: int = 32,
                             max_distance: int = 128) -> jax.Array:
    """T5's log-spaced relative-position bucketing (vectorized).

    ``relative_position`` is ``key_pos - query_pos``. Semantics match the HF
    reference implementation bit-for-bit on integer inputs.
    """
    ret = jnp.zeros_like(relative_position)
    n = relative_position
    if bidirectional:
        num_buckets //= 2
        ret = ret + (n > 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = -jnp.minimum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    # Larger distances: logarithmic buckets up to max_distance.
    n_f = jnp.maximum(n.astype(jnp.float32), 1.0)
    val_if_large = max_exact + (
        jnp.log(n_f / max_exact) / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class T5RelativePositionBias(nn.Module):
    """Learned bucket embedding -> (1, heads, Lq, Lk) additive bias.

    Held once per stack (HF stores it in block 0 and shares it across layers;
    here it lives outside the scanned blocks, which is the same math).
    """

    num_buckets: int
    max_distance: int
    num_heads: int
    bidirectional: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, query_length: int, key_length: int) -> jax.Array:
        ctx = jnp.arange(query_length)[:, None]
        mem = jnp.arange(key_length)[None, :]
        buckets = relative_position_bucket(
            mem - ctx, bidirectional=self.bidirectional,
            num_buckets=self.num_buckets, max_distance=self.max_distance)
        table = self.param(
            "embedding", nn.initializers.normal(1.0),
            (self.num_buckets, self.num_heads), jnp.float32)
        bias = table[buckets]                       # (Lq, Lk, H)
        return jnp.transpose(bias, (2, 0, 1))[None]  # (1, H, Lq, Lk)


# ---------------------------------------------------------------------------
# Dense
# ---------------------------------------------------------------------------


class KlabDense(nn.Module):
    """Bias-free dense layer with optional int8 weight-only dequant.

    Identical to ``nn.Dense(use_bias=False)`` in the ordinary case (same
    param name/shape/init, same dtype promotion, same contraction). When a
    ``qscale`` collection is bound (``infer/quantize.py``), the stored
    kernel is the int8 grid ``Q`` and the bound per-output-channel scale
    multiplies the OUTPUT — exact because every T5 matmul is bias-free:
    ``x @ (Q * s) == (x @ Q) * s``. The scale multiply runs in fp32 and
    casts back, so the quantized path matches a dequantized-fp32 apply to
    float rounding.
    """

    features: int
    dtype: Dtype = None
    kernel_init: Any = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param("kernel", self.kernel_init,
                            (jnp.shape(x)[-1], self.features), jnp.float32)
        x, kernel = nn.dtypes.promote_dtype(x, kernel, dtype=self.dtype)
        y = jax.lax.dot_general(
            x, kernel, (((x.ndim - 1,), (0,)), ((), ())))
        if self.has_variable("qscale", "scale"):
            s = self.get_variable("qscale", "scale")
            y = (y.astype(jnp.float32) * s.astype(jnp.float32)).astype(
                y.dtype)
        return y


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------


class T5Attention(nn.Module):
    """Multi-head attention without the 1/sqrt(d) scale (T5 convention).

    Supports three modes: encoder/decoder self-attention, cross-attention
    (``kv`` given), and single-token incremental decode (``decode=True``)
    against a fixed-shape KV cache stored in flax ``cache`` variables.
    """

    size: T5Size
    dtype: Dtype = jnp.float32
    ring_attention: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, kv: Optional[jax.Array] = None,
                 bias: Optional[jax.Array] = None,
                 pallas_pack: Optional[tuple] = None,
                 deterministic: bool = True,
                 decode: bool = False) -> jax.Array:
        s = self.size
        inner = s.num_heads * s.d_kv
        dense = lambda name, init_std: KlabDense(  # noqa: E731
            inner, dtype=self.dtype, name=name,
            kernel_init=nn.initializers.normal(init_std))
        # Init stds follow the T5 fan-in scheme (mesh-tf init, as in HF).
        q_proj = dense("q", (s.d_model * s.d_kv) ** -0.5)
        k_proj = dense("k", s.d_model ** -0.5)
        v_proj = dense("v", s.d_model ** -0.5)
        o_proj = KlabDense(s.d_model, dtype=self.dtype, name="o",
                           kernel_init=nn.initializers.normal(inner ** -0.5))

        def split_heads(t):
            return t.reshape(t.shape[:-1] + (s.num_heads, s.d_kv)).transpose(
                0, 2, 1, 3)  # (B, H, L, D)

        q = split_heads(q_proj(x))
        is_cross = kv is not None
        src = kv if is_cross else x
        k = split_heads(k_proj(src))
        v = split_heads(v_proj(src))

        if pallas_pack is not None and not decode:
            # Fused Pallas path (train/eval full-sequence attention): the
            # packed block-diagonal bias was built ONCE per stack; dropout
            # runs in-kernel on the probs (replacing nn.Dropout below),
            # regenerated bit-identically in the custom-VJP backward.
            packed_bias, kmask, G = pallas_pack
            rate = 0.0 if deterministic else s.dropout_rate
            seed = (jax.random.randint(self.make_rng("dropout"), (), 0,
                                       np.iinfo(np.int32).max, dtype=jnp.int32)
                    if rate > 0 else 0)
            attn = t5_fused_attention_packed(q, k, v, packed_bias, kmask,
                                             rate, seed, G)
            attn = attn.transpose(0, 2, 1, 3).reshape(
                x.shape[:-1] + (inner,))
            return o_proj(attn)

        if (self.ring_attention and not decode and not is_cross
                and pallas_pack is None
                and ring_applicable(q.shape[2], k.shape[2],
                                    batch=q.shape[0],
                                    num_heads=q.shape[1])):
            # Sequence-parallel ring attention (--seq_attention ring): K/V
            # stream over the seq axis instead of being all-gathered;
            # attention-prob dropout runs inside the ring (numerator-mask,
            # exact dropout(softmax(.)) @ v semantics). Cross-attention and
            # decode keep the XLA path (decoder-L and encoder-L generally
            # shard differently; the KV cache is decode-local).
            rate = 0.0 if deterministic else s.dropout_rate
            rng = self.make_rng("dropout") if rate > 0.0 else None
            attn = ring_self_attention(q, k, v, bias, dropout_rate=rate,
                                       dropout_rng=rng)
            attn = attn.transpose(0, 2, 1, 3).reshape(x.shape[:-1] + (inner,))
            return o_proj(attn)

        if decode:
            # Fixed-shape cache: (B, H, max_len, d_kv) + scalar write index.
            if is_cross:
                # Cross-attention K/V depend only on the encoder output:
                # computed once at cache init, then reused each step.
                ck = self.variable("cache", "cached_key", lambda: k)
                cv = self.variable("cache", "cached_value", lambda: v)
                k, v = ck.value, cv.value
            else:
                B, H, _, D = k.shape
                max_len = bias.shape[-1] if bias is not None else k.shape[2]
                ck = self.variable(
                    "cache", "cached_key",
                    lambda: jnp.zeros((B, H, max_len, D), self.dtype))
                cv = self.variable(
                    "cache", "cached_value",
                    lambda: jnp.zeros((B, H, max_len, D), self.dtype))
                idx = self.variable(
                    "cache", "cache_index", lambda: jnp.array(0, jnp.int32))
                i = idx.value
                if i.ndim == 0:
                    ck.value = jax.lax.dynamic_update_slice(
                        ck.value, k.astype(self.dtype), (0, 0, i, 0))
                    cv.value = jax.lax.dynamic_update_slice(
                        cv.value, v.astype(self.dtype), (0, 0, i, 0))
                    q_pos = (i + jnp.arange(x.shape[1]))[None, None, :, None]
                else:
                    # Per-row cache index (continuous batching,
                    # infer/engine.py): every batch row sits at its own
                    # decode position. A vmapped dynamic-update-slice
                    # would lower to an XLA scatter — slow on TPU — so
                    # the write is a dense one-hot blend instead: exact
                    # (the mask is 0/1, so kept lanes are x*1+0 and
                    # written lanes are 0+k*1, both bit-identical), fully
                    # vectorized, and O(B·H·L·D) elementwise — trivial at
                    # decode cache sizes. Rows whose index has drifted
                    # past L (inert slots) write nothing at all.
                    T = x.shape[1]
                    # onehot[b, t, l] = 1 where l == i[b] + t
                    l_pos = jnp.arange(max_len)[None, None, :]
                    tgt = (i[:, None] + jnp.arange(T))[:, :, None]
                    onehot = (l_pos == tgt).astype(self.dtype)  # (B, T, L)
                    keep = (1.0 - onehot.sum(axis=1))[:, None, :, None]

                    def blend(cache_val, new):
                        upd = jnp.einsum("bhtd,btl->bhld",
                                         new.astype(self.dtype), onehot)
                        return cache_val * keep.astype(self.dtype) + upd

                    ck.value = blend(ck.value, k)
                    cv.value = blend(cv.value, v)
                    q_pos = (i[:, None]
                             + jnp.arange(x.shape[1]))[:, None, :, None]
                idx.value = i + x.shape[1]
                k, v = ck.value, cv.value
                # Mask out cache slots that have not been written yet —
                # causal per query row, so a multi-token chunk (the write
                # and index bump above support one) sees positions
                # i..i+j for its j-th query, not just i.
                pos = jnp.arange(max_len)[None, None, None, :]
                valid = pos <= q_pos
                step_bias = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)
                bias = step_bias if bias is None else bias + step_bias

        # Dropout masks the attention probs (HF T5Attention semantics) —
        # structurally identical to the Pallas and ring backends.
        rate = 0.0 if deterministic else s.dropout_rate
        rng = self.make_rng("dropout") if rate > 0.0 else None
        attn = dot_product_attention(q, k, v, bias=bias, scale=None,
                                     dropout_rate=rate, dropout_rng=rng)
        attn = attn.transpose(0, 2, 1, 3).reshape(x.shape[:-1] + (inner,))
        return o_proj(attn)


def _t5_act(feed_forward_proj: str):
    """(activation fn, is_gated) from the HF ``feed_forward_proj`` string.

    Mirrors ``transformers`` T5Config exactly: ``gated-X`` means two input
    projections with X on the gate branch, and the special case that
    ``gated-gelu`` uses ``gelu_new`` (the tanh approximation) while a plain
    ``gelu`` is the exact erf form."""
    parts = feed_forward_proj.split("-")
    is_gated = parts[0] == "gated"
    name = parts[-1]
    if feed_forward_proj == "gated-gelu":
        name = "gelu_new"
    acts = {
        "relu": nn.relu,
        "gelu": lambda x: nn.gelu(x, approximate=False),
        "gelu_new": lambda x: nn.gelu(x, approximate=True),
        "silu": nn.silu,
    }
    if name not in acts:
        plain = [a for a in acts if a != "gelu_new"]
        supported = plain + [f"gated-{a}" for a in plain]
        raise ValueError(
            f"unsupported feed_forward_proj {feed_forward_proj!r}; "
            f"supported: {', '.join(supported)}")
    return acts[name], is_gated


class T5Mlp(nn.Module):
    """T5 feed-forward: un-gated ReLU (original ``DenseActDense``) or the
    v1.1/Flan gated form (``DenseGatedActDense``: ``act(wi_0(x)) * wi_1(x)``
    with tanh-GELU), selected by ``size.feed_forward_proj``."""

    size: T5Size
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        s = self.size
        act, gated = _t5_act(s.feed_forward_proj)
        init = nn.initializers.normal(s.d_model ** -0.5)
        if gated:
            gate = act(KlabDense(s.d_ff, dtype=self.dtype, name="wi_0",
                                 kernel_init=init)(x))
            x = gate * KlabDense(s.d_ff, dtype=self.dtype, name="wi_1",
                                 kernel_init=init)(x)
        else:
            x = act(KlabDense(s.d_ff, dtype=self.dtype, name="wi",
                              kernel_init=init)(x))
        x = nn.Dropout(s.dropout_rate)(x, deterministic=deterministic)
        x = KlabDense(s.d_model, dtype=self.dtype, name="wo",
                      kernel_init=nn.initializers.normal(s.d_ff ** -0.5))(x)
        return x


class T5MoeMlp(nn.Module):
    """Switch-style sparse MoE replacement for :class:`T5Mlp`.

    ``num_experts`` un-gated ReLU FFNs (each the full ``d_ff`` geometry)
    with a learned top-k router; tokens are dense-dispatched at fixed
    capacity (``ops/moe.py``) so the whole layer is three einsums with
    static shapes. Expert weights carry a leading ``(E, ...)`` axis
    sharded over the mesh's ``expert`` axis (``parallel/partitioning.py``
    ``experts_wi``/``experts_wo`` rules). Returns ``(y, aux)`` with ``aux``
    the scalar Switch load-balancing loss for this layer.
    """

    size: T5Size
    num_experts: int
    top_k: int = 1
    capacity_factor: float = 1.25
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True,
                 mask: Optional[jax.Array] = None
                 ) -> tuple[jax.Array, jax.Array]:
        from ..ops.moe import moe_capacity, moe_ffn, topk_routing

        s, E = self.size, self.num_experts
        # Router in fp32: routing decisions must not flip with the
        # compute-dtype policy.
        logits = nn.Dense(E, use_bias=False, dtype=jnp.float32,
                          name="router",
                          kernel_init=nn.initializers.normal(
                              s.d_model ** -0.5))(x.astype(jnp.float32))
        cap = moe_capacity(x.shape[1], E, self.top_k, self.capacity_factor)
        combine, aux = topk_routing(logits, self.top_k, cap, mask=mask)
        wi = self.param("experts_wi",
                        nn.initializers.normal(s.d_model ** -0.5),
                        (E, s.d_model, s.d_ff), jnp.float32)
        wo = self.param("experts_wo",
                        nn.initializers.normal(s.d_ff ** -0.5),
                        (E, s.d_ff, s.d_model), jnp.float32)
        rate = 0.0 if deterministic else s.dropout_rate
        rng = self.make_rng("dropout") if rate > 0.0 else None
        y = moe_ffn(x, combine, wi, wo, dropout_rate=rate, dropout_rng=rng)
        return y.astype(x.dtype), aux


class T5Block(nn.Module):
    """Pre-norm residual block: self-attn [-> cross-attn] -> MLP.

    With ``moe_experts > 0`` the MLP is a :class:`T5MoeMlp` and the block
    returns ``(x, aux)``; dense blocks return ``x`` unchanged.
    """

    size: T5Size
    has_cross_attention: bool = False
    dtype: Dtype = jnp.float32
    ring_attention: bool = False
    moe_experts: int = 0
    moe_top_k: int = 1
    moe_capacity_factor: float = 1.25

    @nn.compact
    def __call__(self, x, self_bias, enc_out, cross_bias,
                 self_pack=None, cross_pack=None, moe_mask=None,
                 deterministic: bool = True, decode: bool = False):
        s = self.size
        drop = nn.Dropout(s.dropout_rate)
        h = RMSNorm(epsilon=s.layer_norm_epsilon, name="ln_self")(x)
        h = T5Attention(s, dtype=self.dtype,
                        ring_attention=self.ring_attention,
                        name="SelfAttention")(
            h, bias=self_bias, pallas_pack=self_pack,
            deterministic=deterministic, decode=decode)
        x = x + drop(h, deterministic=deterministic)
        if self.has_cross_attention:
            h = RMSNorm(epsilon=s.layer_norm_epsilon, name="ln_cross")(x)
            h = T5Attention(s, dtype=self.dtype, name="EncDecAttention")(
                h, kv=enc_out, bias=cross_bias, pallas_pack=cross_pack,
                deterministic=deterministic, decode=decode)
            x = x + drop(h, deterministic=deterministic)
        h = RMSNorm(epsilon=s.layer_norm_epsilon, name="ln_mlp")(x)
        aux = None
        if self.moe_experts > 0:
            h, aux = T5MoeMlp(s, self.moe_experts, self.moe_top_k,
                              self.moe_capacity_factor, dtype=self.dtype,
                              name="mlp")(h, deterministic=deterministic,
                                          mask=moe_mask)
        else:
            h = T5Mlp(s, dtype=self.dtype, name="mlp")(
                h, deterministic=deterministic)
        x = x + drop(h, deterministic=deterministic)
        if self.moe_experts > 0:
            return x, aux
        return x


class _ScanBlock(nn.Module):
    """Scan-compatible wrapper: carries hidden state through stacked blocks.

    ``deterministic``/``decode`` are static attributes (compile-time flags),
    so the scanned body stays a pure array->array function.
    """

    size: T5Size
    has_cross_attention: bool
    dtype: Dtype
    deterministic: bool
    decode: bool
    ring_attention: bool = False
    moe_experts: int = 0
    moe_top_k: int = 1
    moe_capacity_factor: float = 1.25

    @nn.compact
    def __call__(self, carry, self_bias, enc_out, cross_bias, self_pack,
                 cross_pack, moe_mask=None):
        out = T5Block(self.size, self.has_cross_attention, dtype=self.dtype,
                      ring_attention=self.ring_attention,
                      moe_experts=self.moe_experts,
                      moe_top_k=self.moe_top_k,
                      moe_capacity_factor=self.moe_capacity_factor,
                      name="block")(carry, self_bias, enc_out, cross_bias,
                                    self_pack=self_pack,
                                    cross_pack=cross_pack,
                                    moe_mask=moe_mask,
                                    deterministic=self.deterministic,
                                    decode=self.decode)
        # MoE blocks emit (x, per-layer aux loss) into the scan ys.
        x, aux = out if self.moe_experts > 0 else (out, None)
        if not self.decode:
            # Sequence parallelism: re-pin every layer's carry to the seq
            # axis so per-token work stays sharded through the whole stack
            # (no-op without a seq>1 ambient mesh).
            x = seq_constraint(x)
        return x, aux


def _assemble_dense_biases(head_bias, kmask, enc_out, cross_kmask, B, L):
    """XLA-path logit biases from the decomposed attention inputs: the
    shared per-head bias broadcast over batch plus the key-mask bias, and
    the cross-attention key-mask bias (see T5Stack docstring). One copy,
    shared by T5Stack and the pipelined _StageBlocks — the two paths are
    asserted bit-identical by tests/test_pipeline_parallel.py."""
    self_bias = None
    if head_bias is not None:
        # (H, Q, K) shared across rows -> broadcast; (B, H, Q, K) already
        # per-row (continuous-batching decode, where each row's relative
        # -position slice differs).
        self_bias = head_bias if head_bias.ndim == 4 else head_bias[None]
    mask_bias = _mask_to_bias(kmask, B, L)
    if mask_bias is not None:
        self_bias = mask_bias if self_bias is None else self_bias + mask_bias
    cross_bias = None
    if enc_out is not None:
        cross_bias = _mask_to_bias(cross_kmask, B, enc_out.shape[1])
    return self_bias, cross_bias


def _scanned_blocks(size, has_cross_attention, dtype, deterministic, decode,
                    num_layers, scan_unroll, remat, name,
                    ring_attention=False, moe_experts=0, moe_top_k=1,
                    moe_capacity_factor=1.25):
    """Remat-wrapped ``nn.scan`` over ``_ScanBlock`` — the one place the
    scan/remat policy is constructed, so a policy change applies to the
    plain and pipelined stacks alike."""
    block_cls = _ScanBlock
    if remat == "full":
        block_cls = nn.remat(block_cls)
    elif remat == "dots_saveable":
        block_cls = nn.remat(
            block_cls, policy=jax.checkpoint_policies.dots_saveable)
    return nn.scan(
        block_cls,
        # qscale: int8 dequant scales (infer/quantize.py) ride the same
        # leading layer axis as the scanned params they mirror.
        variable_axes={"params": 0, "cache": 0, "qscale": 0},
        split_rngs={"params": True, "dropout": True},
        in_axes=(nn.broadcast,) * 6,
        length=num_layers,
        unroll=num_layers if scan_unroll == 0 else scan_unroll,
    )(size, has_cross_attention, dtype, deterministic, decode,
      ring_attention, moe_experts, moe_top_k, moe_capacity_factor,
      name=name)


class _StageBlocks(nn.Module):
    """One pipeline stage: a sequential sub-stack of ``layers_per_stage``
    blocks (the same scanned block body as the non-pipelined path).

    Takes the DECOMPOSED attention inputs (shared head bias + raw key
    masks) and assembles the dense logit biases itself — so the pipeline's
    travelling per-microbatch state is the tiny (B, L) masks, not
    O(H·L²) dense biases.
    """

    size: T5Size
    has_cross_attention: bool
    dtype: Dtype
    deterministic: bool
    layers_per_stage: int
    scan_unroll: int
    remat: str

    @nn.compact
    def __call__(self, x, head_bias, kmask, enc_out, cross_kmask):
        self_bias, cross_bias = _assemble_dense_biases(
            head_bias, kmask, enc_out, cross_kmask, x.shape[0], x.shape[1])
        blocks = _scanned_blocks(
            self.size, self.has_cross_attention, self.dtype,
            self.deterministic, False, self.layers_per_stage,
            self.scan_unroll, self.remat, name="block")
        x, _ = blocks(x, self_bias, enc_out, cross_bias, None, None, None)
        return x


class _PipelineTicks(nn.Module):
    """One GPipe tick: shift each stage's input forward, run all stages.

    Scanned over ``M + S - 1`` ticks with broadcast params (weight sharing
    across ticks — the pipeline schedule, not weight stacking). The carry
    holds each stage's previous OUTPUT for every batch-dependent tensor
    (activations, key masks, encoder context — everything that must travel
    with its microbatch); the shift concatenates this tick's microbatch in
    at stage 0 and the last stage's output is emitted into the scanned ys.
    With the stage axis sharded over ``pipe`` (pipe_constraint), XLA lowers
    the shift to a neighbour collective-permute over ICI and runs the
    vmapped stages SPMD — the shard_map-free GSPMD pipelining pattern.

    ``carried`` is the static set of batch-dependent keys present (subset
    of kmask / enc_out / cross_kmask; ``x`` always travels). ``head_bias``
    (relpos [+ causal], shared across batch rows) is broadcast to every
    stage unshifted.
    """

    size: T5Size
    has_cross_attention: bool
    dtype: Dtype
    deterministic: bool
    layers_per_stage: int
    scan_unroll: int
    remat: str
    carried: tuple  # static subset of ("kmask", "enc_out", "cross_kmask")

    @nn.compact
    def __call__(self, carry, mb, head_bias):
        def shift(mb_t, state_t):
            return pipe_constraint(
                jnp.concatenate([mb_t[None], state_t[:-1]], axis=0))

        st = {k: shift(mb[k], carry[k]) for k in carry}
        in_axes = (0, None,
                   0 if "kmask" in st else None,
                   0 if "enc_out" in st else None,
                   0 if "cross_kmask" in st else None)
        staged = nn.vmap(
            _StageBlocks,
            in_axes=in_axes, out_axes=0,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
        )(self.size, self.has_cross_attention, self.dtype,
          self.deterministic, self.layers_per_stage, self.scan_unroll,
          self.remat, name="stages")
        out_x = staged(st["x"], head_bias, st.get("kmask"),
                       st.get("enc_out"), st.get("cross_kmask"))
        out_x = pipe_constraint(out_x)
        new_carry = dict(st)
        new_carry["x"] = out_x
        return new_carry, out_x[-1]


def _reshape_leaf(leaf, shape):
    """Reshape an array leaf, or re-shape a ShapeDtypeStruct (used when
    converting ABSTRACT checkpoint-restore targets between layouts — the
    struct's sharding is dropped; callers reattach via the spec rules)."""
    if isinstance(leaf, jax.ShapeDtypeStruct):
        return jax.ShapeDtypeStruct(shape, leaf.dtype)
    return leaf.reshape(shape)


def pipeline_stack_params(stack_params: dict, stages: int) -> dict:
    """Re-layout one T5Stack's params from the scanned-layer layout
    (``layers/block/…`` with a leading ``(num_layers, …)`` axis) to the
    pipelined layout (``pipeline/stages/block/block/…`` with leading
    ``(stages, num_layers // stages, …)`` axes). Values are reshaped
    views — bit-identical weights, so a converted model computes exactly
    what the un-pipelined one does (tests/test_pipeline_parallel.py)."""
    out = {k: v for k, v in stack_params.items() if k != "layers"}
    block = stack_params["layers"]["block"]

    def reshape(leaf):
        n = leaf.shape[0]
        if n % stages:
            raise ValueError(f"layer count {n} not divisible by {stages}")
        return _reshape_leaf(leaf,
                             (stages, n // stages) + tuple(leaf.shape[1:]))

    out["pipeline"] = {"stages": {"block": {
        "block": jax.tree.map(reshape, block)}}}
    return out


def unpipeline_stack_params(stack_params: dict) -> dict:
    """Inverse of :func:`pipeline_stack_params` (for decode/export: the
    incremental-decode path runs the plain scanned stack)."""
    out = {k: v for k, v in stack_params.items() if k != "pipeline"}
    block = stack_params["pipeline"]["stages"]["block"]["block"]
    out["layers"] = {"block": jax.tree.map(
        lambda leaf: _reshape_leaf(
            leaf, (leaf.shape[0] * leaf.shape[1],) + tuple(leaf.shape[2:])),
        block)}
    return out


def pipeline_t5_params(params: dict, stages: int) -> dict:
    """Convert a T5ForConditionalGeneration/T5Encoder param tree to the
    pipelined layout (both stacks for the enc-dec model)."""
    p = dict(params)
    for key in ("encoder", "decoder"):
        if key in p and "layers" in p[key]:
            p[key] = pipeline_stack_params(p[key], stages)
    return p


def unpipeline_t5_params(params: dict) -> dict:
    """Inverse of :func:`pipeline_t5_params`."""
    p = dict(params)
    for key in ("encoder", "decoder"):
        if key in p and "pipeline" in p[key]:
            p[key] = unpipeline_stack_params(p[key])
    return p


def upcycle_t5_params(dense: dict, fresh_moe: dict) -> dict:
    """Sparse upcycling (Komatsuzaki et al. 2023, "Sparse Upcycling:
    Training Mixture-of-Experts from Dense Checkpoints"): convert a DENSE
    T5 param tree into the MoE layout of ``fresh_moe`` (a freshly
    initialized tree from the target ``--moe_experts E`` model, same
    geometry otherwise).

    Per the paper's recipe: every expert starts as an exact copy of the
    dense MLP (``wi``/``wo`` broadcast over the new leading expert axis),
    all non-MLP weights (attention, norms, embeddings, biases) carry over
    bit-identically, and the router keeps ``fresh_moe``'s fresh random
    init — a near-uniform router spreads tokens across (identical) experts,
    so early training is approximately the dense model scaled by the
    top-k gate mass, and the experts then diverge. Optimizer state is NOT
    upcycled — use via ``--init_checkpoint`` (params-only init), which is
    also the paper's procedure (fresh optimizer on the upcycled params).
    """
    out = dict(dense)
    for key in ("encoder", "decoder"):
        if key not in out or "layers" not in out[key]:
            continue
        if key not in fresh_moe or "layers" not in fresh_moe[key]:
            raise ValueError(
                f"upcycle target has no scanned '{key}' stack — pipelined "
                "MoE targets are unsupported (MoE runs the dense scanned "
                "layout)")
        block = dict(out[key]["layers"]["block"])
        mlp = block.get("mlp", {})
        fresh_mlp = fresh_moe[key]["layers"]["block"]["mlp"]
        if "wi" not in mlp or "experts_wi" not in fresh_mlp:
            raise ValueError(
                "upcycle_t5_params needs a dense source (mlp/wi) and an "
                "MoE target (mlp/experts_wi)")
        E = fresh_mlp["experts_wi"].shape[1]  # scanned: (L, E, d, f)
        block["mlp"] = {
            "router": fresh_mlp["router"],
            "experts_wi": jnp.repeat(
                jnp.asarray(mlp["wi"]["kernel"], jnp.float32)[:, None],
                E, axis=1),
            "experts_wo": jnp.repeat(
                jnp.asarray(mlp["wo"]["kernel"], jnp.float32)[:, None],
                E, axis=1),
        }
        stack = dict(out[key])
        stack["layers"] = {"block": block}
        out[key] = stack
    return out


class T5Stack(nn.Module):
    """Encoder or decoder stack (embedding handled by the caller).

    Bias plumbing: callers pass the DECOMPOSED attention inputs — a shared
    per-head additive bias ``head_bias`` (H, Q, K) (relative-position buckets
    [+ causal], or the sliced current row in decode mode) and raw key masks
    ``kmask``/``cross_kmask`` (B, K). The stack assembles them per backend:
      * XLA path: broadcast-summed into dense (B|1, H, Q, K) logit biases;
      * Pallas path (``use_pallas``): the head bias is block-diagonal-packed
        ONCE here (not per scanned layer) and key masks ride into the kernel
        as (B, K) rows — the packing cost is amortized across the stack.
    """

    size: T5Size
    num_layers: int
    is_decoder: bool
    dtype: Dtype = jnp.float32
    remat: str = ""
    # scan unroll factor: trades compile time for runtime (XLA can fuse and
    # software-pipeline across unrolled layers). 1 = pure while-loop scan.
    scan_unroll: int = 1
    use_pallas: bool = False
    ring_attention: bool = False
    # GPipe pipeline parallelism (--pipeline_stages): split the stack into
    # this many stages over the mesh's ``pipe`` axis and run microbatches
    # through a tick schedule (_PipelineTicks). Training/eval forward only;
    # incremental decode needs unpipeline_t5_params + a stages=1 model.
    pipeline_stages: int = 1
    pipeline_microbatches: int = 0
    # Sparse MoE MLPs (--moe_experts): every block's MLP becomes a
    # T5MoeMlp and __call__ returns (hidden, aux_loss) instead of hidden.
    moe_experts: int = 0
    moe_top_k: int = 1
    moe_capacity_factor: float = 1.25

    @nn.compact
    def __call__(self, inputs_embeds: jax.Array,
                 head_bias: Optional[jax.Array] = None,
                 kmask: Optional[jax.Array] = None,
                 enc_out: Optional[jax.Array] = None,
                 cross_kmask: Optional[jax.Array] = None,
                 deterministic: bool = True,
                 decode: bool = False) -> jax.Array:
        s = self.size
        B, L = inputs_embeds.shape[:2]
        x = nn.Dropout(s.dropout_rate)(inputs_embeds,
                                       deterministic=deterministic)
        if not decode:
            x = seq_constraint(x)

        if self.pipeline_stages > 1:
            if decode:
                raise ValueError(
                    "incremental decode with a pipelined stack: convert "
                    "params with unpipeline_t5_params and run a "
                    "pipeline_stages=1 model")
            if self.moe_experts > 0:
                raise ValueError(
                    "moe_experts > 0 with pipeline_stages > 1 is not "
                    "supported (config validation should have caught this)")
            x = self._pipelined(x, head_bias, kmask, enc_out, cross_kmask,
                                deterministic)
            x = RMSNorm(epsilon=s.layer_norm_epsilon,
                        name="final_layer_norm")(x)
            return nn.Dropout(s.dropout_rate)(x,
                                              deterministic=deterministic)

        self_bias = cross_bias = self_pack = cross_pack = None
        if self.use_pallas and not decode:
            G = pick_group(B, L, L)
            packed = (pack_head_bias(head_bias, G)
                      if head_bias is not None else None)
            self_pack = (packed, kmask, G)
            if enc_out is not None:
                Gx = pick_group(B, L, enc_out.shape[1])
                cross_pack = (None, cross_kmask, Gx)
        else:
            self_bias, cross_bias = _assemble_dense_biases(
                head_bias, kmask, enc_out, cross_kmask, B, L)

        blocks = _scanned_blocks(
            s, self.is_decoder, self.dtype, deterministic, decode,
            self.num_layers, self.scan_unroll, self.remat, name="layers",
            ring_attention=self.ring_attention,
            moe_experts=self.moe_experts, moe_top_k=self.moe_top_k,
            moe_capacity_factor=self.moe_capacity_factor)
        # MoE routing mask: the stack's key mask doubles as the
        # token-validity mask (pads route nowhere, ops/moe.py).
        moe_mask = kmask if self.moe_experts > 0 else None
        x, aux_stack = blocks(x, self_bias, enc_out, cross_bias, self_pack,
                              cross_pack, moe_mask)
        x = RMSNorm(epsilon=s.layer_norm_epsilon, name="final_layer_norm")(x)
        x = nn.Dropout(s.dropout_rate)(x, deterministic=deterministic)
        if self.moe_experts > 0:
            # aux_stack: (num_layers,) per-layer Switch balance losses.
            return x, jnp.sum(aux_stack)
        return x

    def _pipelined(self, x, head_bias, kmask, enc_out, cross_kmask,
                   deterministic):
        """GPipe schedule: M microbatches through S stages in M+S-1 ticks.

        Bubble fraction (S-1)/(M+S-1); params per stage sharded over the
        ``pipe`` mesh axis (parallel/partitioning.py ``/stages/`` rule) so
        each device coordinate holds only its stage's layers. Padding
        ticks wrap valid microbatches (``t % M``) and the tick-0 carry
        seeds key masks with ones — garbage lanes stay finite (an all
        -masked row would softmax to NaN, and NaN forward values poison
        parameter gradients even under zero cotangents), while their
        outputs are never emitted.
        """
        S = self.pipeline_stages
        if self.num_layers % S:
            raise ValueError(f"num_layers={self.num_layers} not divisible "
                             f"by pipeline_stages={S}")
        if self.use_pallas or self.ring_attention:
            raise ValueError("pipeline_stages > 1 is incompatible with "
                             "the pallas/ring attention backends")
        B = x.shape[0]
        M = self.pipeline_microbatches or S
        if B % M:
            raise ValueError(f"batch={B} not divisible by "
                             f"pipeline_microbatches={M}")
        rows = B // M
        T = M + S - 1
        idx = jnp.arange(T) % M

        def to_ticks(arr):
            a = arr.reshape((M, rows) + arr.shape[1:])
            a = jnp.take(a, idx, axis=0)
            # Pin the tick stack's sharding: tick axis replicated, rows on
            # the data axes. Without this the (M, rows, …) reshape of the
            # batch-sharded input propagates a partial tick-axis sharding
            # into the scan, and the per-tick dynamic-slice feeding stage 0
            # triggers XLA's "involuntary full rematerialization"
            # (replicate-then-reshard) inside the tick loop.
            return tick_constraint(a)

        mb = {"x": to_ticks(x)}
        carried = []
        for key, val in (("kmask", kmask), ("enc_out", enc_out),
                         ("cross_kmask", cross_kmask)):
            if val is not None:
                mb[key] = to_ticks(val)
                carried.append(key)
        carry0 = {
            k: (jnp.ones if k.endswith("kmask") else jnp.zeros)(
                (S,) + v.shape[1:], v.dtype)
            for k, v in mb.items()}
        ticks = nn.scan(
            _PipelineTicks,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=(0, nn.broadcast),
            out_axes=0,
            length=T,
        )(self.size, self.is_decoder, self.dtype, deterministic,
          self.num_layers // S, self.scan_unroll, self.remat,
          tuple(carried), name="pipeline")
        _, ys = ticks(carry0, mb, head_bias)
        return ys[S - 1:].reshape((B,) + ys.shape[2:])


# ---------------------------------------------------------------------------
# Top-level models
# ---------------------------------------------------------------------------


def _mask_to_bias(mask: Optional[jax.Array], batch: int, length: int):
    if mask is None:
        return None
    return jnp.where(mask[:, None, None, :] > 0, 0.0, NEG_INF).astype(
        jnp.float32)


def causal_bias(length: int) -> jax.Array:
    idx = jnp.arange(length)
    return jnp.where(idx[:, None] >= idx[None, :], 0.0, NEG_INF).astype(
        jnp.float32)[None, None]


class T5Encoder(nn.Module):
    """T5EncoderModel equivalent (``/root/reference/models/model.py:14``).

    Accepts token ids or pre-computed ``inputs_embeds``.
    """

    size: T5Size
    dtype: Dtype = jnp.float32
    remat: str = ""
    scan_unroll: int = 0
    use_pallas: bool = False
    ring_attention: bool = False

    def setup(self):
        s = self.size
        self.shared = nn.Embed(s.vocab_size, s.d_model,
                               embedding_init=nn.initializers.normal(1.0),
                               dtype=self.dtype, name="shared")
        self.relpos = T5RelativePositionBias(
            num_buckets=s.relative_attention_num_buckets,
            max_distance=s.relative_attention_max_distance,
            num_heads=s.num_heads, bidirectional=True, name="relpos_bias")
        self.stack = T5Stack(s, s.num_layers, is_decoder=False,
                             dtype=self.dtype, remat=self.remat,
                             scan_unroll=self.scan_unroll,
                             use_pallas=self.use_pallas,
                             ring_attention=self.ring_attention,
                             name="encoder")

    def __call__(self, input_ids: Optional[jax.Array] = None,
                 inputs_embeds: Optional[jax.Array] = None,
                 attention_mask: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        if inputs_embeds is None:
            inputs_embeds = embed_tokens(self.shared, input_ids)
        L = inputs_embeds.shape[1]
        return self.stack(inputs_embeds, head_bias=self.relpos(L, L)[0],
                          kmask=attention_mask,
                          deterministic=deterministic)


@dataclasses.dataclass
class Seq2SeqOutput:
    loss: Optional[jax.Array]
    logits: jax.Array
    encoder_last_hidden_state: jax.Array
    # MoE only (--moe_experts): the summed Switch load-balancing loss of
    # both stacks. ``loss`` already includes it times moe_aux_loss_weight;
    # surfaced raw here for logging.
    aux_loss: Optional[jax.Array] = None


def shift_right(labels: jax.Array, decoder_start_token_id: int,
                pad_token_id: int) -> jax.Array:
    """HF ``_shift_right``: prepend start token, drop last, map -100 -> pad."""
    shifted = jnp.concatenate(
        [jnp.full(labels.shape[:-1] + (1,), decoder_start_token_id,
                  labels.dtype), labels[..., :-1]], axis=-1)
    return jnp.where(shifted == -100, pad_token_id, shifted)


def cross_entropy_loss(logits: jax.Array, labels: jax.Array,
                       weights: Optional[jax.Array] = None) -> jax.Array:
    """Token-level CE, mean over weighted positions (fp32).

    With ``weights=None`` every position counts — reproducing the reference's
    unmasked loss (quirk #3, ``/root/reference/models/model.py:26`` passes raw
    pad-containing labels).
    """
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    label_logit = jnp.take_along_axis(
        logits, jnp.maximum(labels, 0)[..., None], axis=-1)[..., 0]
    nll = logz - label_logit
    if weights is None:
        weights = jnp.ones_like(nll)
    weights = weights.astype(jnp.float32)
    return jnp.sum(nll * weights) / jnp.maximum(jnp.sum(weights), 1.0)


class T5ForConditionalGeneration(nn.Module):
    """Full enc-dec with tied LM head (``/root/reference/models/model.py:17``)."""

    size: T5Size
    dtype: Dtype = jnp.float32
    remat: str = ""
    scan_unroll: int = 0
    use_pallas: bool = False
    ring_attention: bool = False
    pipeline_stages: int = 1
    pipeline_microbatches: int = 0
    # Sparse MoE MLPs in both stacks (--moe_experts; ops/moe.py). The
    # Switch aux loss is folded into ``Seq2SeqOutput.loss`` with weight
    # ``moe_aux_loss_weight`` and surfaced raw as ``aux_loss``.
    moe_experts: int = 0
    moe_top_k: int = 1
    moe_capacity_factor: float = 1.25
    moe_aux_loss_weight: float = 0.01

    def setup(self):
        s = self.size
        self.shared = nn.Embed(s.vocab_size, s.d_model,
                               embedding_init=nn.initializers.normal(1.0),
                               dtype=self.dtype, name="shared")
        self.enc_relpos = T5RelativePositionBias(
            num_buckets=s.relative_attention_num_buckets,
            max_distance=s.relative_attention_max_distance,
            num_heads=s.num_heads, bidirectional=True, name="enc_relpos_bias")
        self.dec_relpos = T5RelativePositionBias(
            num_buckets=s.relative_attention_num_buckets,
            max_distance=s.relative_attention_max_distance,
            num_heads=s.num_heads, bidirectional=False, name="dec_relpos_bias")
        self.encoder = T5Stack(s, s.num_layers, is_decoder=False,
                               dtype=self.dtype, remat=self.remat,
                               scan_unroll=self.scan_unroll,
                               use_pallas=self.use_pallas,
                               ring_attention=self.ring_attention,
                               pipeline_stages=self.pipeline_stages,
                               pipeline_microbatches=self.pipeline_microbatches,
                               moe_experts=self.moe_experts,
                               moe_top_k=self.moe_top_k,
                               moe_capacity_factor=self.moe_capacity_factor,
                               name="encoder")
        self.decoder = T5Stack(s, s.num_decoder_layers, is_decoder=True,
                               dtype=self.dtype, remat=self.remat,
                               scan_unroll=self.scan_unroll,
                               use_pallas=self.use_pallas,
                               ring_attention=self.ring_attention,
                               pipeline_stages=self.pipeline_stages,
                               pipeline_microbatches=self.pipeline_microbatches,
                               moe_experts=self.moe_experts,
                               moe_top_k=self.moe_top_k,
                               moe_capacity_factor=self.moe_capacity_factor,
                               name="decoder")
        if not s.tie_word_embeddings:
            self.lm_head = KlabDense(
                s.vocab_size, dtype=self.dtype,
                kernel_init=nn.initializers.normal(s.d_model ** -0.5),
                name="lm_head")

    # -- pieces -----------------------------------------------------------
    def _split_aux(self, stack_out):
        """MoE stacks return (hidden, aux); dense stacks return hidden."""
        if self.moe_experts > 0:
            return stack_out
        return stack_out, None

    def encode(self, input_ids=None, inputs_embeds=None, attention_mask=None,
               deterministic: bool = True) -> jax.Array:
        enc, _ = self._encode_with_aux(input_ids, inputs_embeds,
                                       attention_mask, deterministic)
        return enc

    def _encode_with_aux(self, input_ids=None, inputs_embeds=None,
                         attention_mask=None, deterministic: bool = True):
        if inputs_embeds is None:
            inputs_embeds = embed_tokens(self.shared, input_ids)
        L = inputs_embeds.shape[1]
        return self._split_aux(self.encoder(
            inputs_embeds, head_bias=self.enc_relpos(L, L)[0],
            kmask=attention_mask, deterministic=deterministic))

    def _lm_logits(self, hidden: jax.Array) -> jax.Array:
        s = self.size
        if s.tie_word_embeddings:
            hidden = hidden * (s.d_model ** -0.5)
            if self.has_variable("qscale", "head_q"):
                # Int8 weight-only tied head (infer/quantize.py): the
                # (vocab, d) embedding's single largest-per-step HBM
                # stream reads as int8; the per-vocab-row scale rides on
                # the (B, T, vocab) logits in fp32.
                q = self.get_variable("qscale", "head_q")
                sc = self.get_variable("qscale", "head_scale")
                logits = jax.lax.dot_general(
                    hidden.astype(self.dtype), q.astype(self.dtype),
                    (((hidden.ndim - 1,), (1,)), ((), ())))
                return (logits.astype(jnp.float32)
                        * sc.astype(jnp.float32)).astype(logits.dtype)
            return self.shared.attend(hidden)
        return self.lm_head(hidden)

    def decode_train(self, decoder_input_ids, encoder_hidden,
                     encoder_attention_mask=None, decoder_attention_mask=None,
                     deterministic: bool = True) -> jax.Array:
        logits, _ = self._decode_train_with_aux(
            decoder_input_ids, encoder_hidden, encoder_attention_mask,
            decoder_attention_mask, deterministic)
        return logits

    def _decode_train_with_aux(self, decoder_input_ids, encoder_hidden,
                               encoder_attention_mask=None,
                               decoder_attention_mask=None,
                               deterministic: bool = True):
        L = decoder_input_ids.shape[1]
        dec_embeds = embed_tokens(self.shared, decoder_input_ids)
        head_bias = self.dec_relpos(L, L)[0] + causal_bias(L)[0, 0]
        hidden, aux = self._split_aux(self.decoder(
            dec_embeds, head_bias=head_bias,
            kmask=decoder_attention_mask,
            enc_out=encoder_hidden,
            cross_kmask=encoder_attention_mask,
            deterministic=deterministic))
        return self._lm_logits(hidden), aux

    def decode_step(self, decoder_input_token: jax.Array, step: jax.Array,
                    encoder_hidden: jax.Array, max_decode_len: int,
                    encoder_attention_mask=None) -> jax.Array:
        """One incremental decode step with the KV cache (decode=True).

        ``decoder_input_token`` is (B, T) starting at cache position
        ``step`` — T = 1 for the generation loop, T > 1 for prompt prefill
        (the cache's per-query validity mask keeps the chunk causal).
        ``step`` may be a scalar (all rows at the same position — the
        generate.py loops) or a (B,) vector (every row at its own position
        — the continuous-batching engine, whose cache then carries per-row
        ``cache_index`` leaves; see ``infer/engine.py``).
        Returns (B, T, vocab) logits.
        """
        dec_embeds = embed_tokens(self.shared, decoder_input_token)
        # Bias rows for the chunk's positions against the full cache length.
        full_bias = self.dec_relpos(max_decode_len, max_decode_len)[0]
        T = decoder_input_token.shape[1]
        step = jnp.asarray(step)
        if step.ndim == 0:
            head_bias = jax.lax.dynamic_slice_in_dim(
                full_bias, step, T, axis=1)
        else:
            head_bias = jax.vmap(
                lambda st: jax.lax.dynamic_slice_in_dim(
                    full_bias, st, T, axis=1))(step)
        hidden, _ = self._split_aux(self.decoder(
            dec_embeds, head_bias=head_bias,
            enc_out=encoder_hidden,
            cross_kmask=encoder_attention_mask,
            deterministic=True, decode=True))
        return self._lm_logits(hidden)

    # -- main entry -------------------------------------------------------
    def __call__(self, input_ids=None, inputs_embeds=None,
                 attention_mask=None, labels=None, decoder_input_ids=None,
                 decoder_attention_mask=None, label_weights=None,
                 deterministic: bool = True) -> Seq2SeqOutput:
        s = self.size
        enc, enc_aux = self._encode_with_aux(input_ids, inputs_embeds,
                                             attention_mask, deterministic)
        if decoder_input_ids is None:
            decoder_input_ids = shift_right(
                labels, s.decoder_start_token_id, s.pad_token_id)
        logits, dec_aux = self._decode_train_with_aux(
            decoder_input_ids, enc,
            encoder_attention_mask=attention_mask,
            decoder_attention_mask=decoder_attention_mask,
            deterministic=deterministic)
        aux = None
        if self.moe_experts > 0:
            aux = enc_aux + dec_aux
        loss = None
        if labels is not None:
            loss = cross_entropy_loss(logits, labels, label_weights)
            if aux is not None:
                loss = loss + self.moe_aux_loss_weight * aux
        return Seq2SeqOutput(loss=loss, logits=logits,
                             encoder_last_hidden_state=enc, aux_loss=aux)
