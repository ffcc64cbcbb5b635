"""Autoregressive generation: greedy and beam search with a KV cache.

The reference calls HF ``transformer.generate(inputs_embeds=...)`` with the
default generation config (``/root/reference/models/model.py:28``; SURVEY.md
§3.3): greedy decoding, ``max_length=20`` counting the decoder-start token,
decoder start = pad id, stop at eos. This module reproduces those semantics
as a single jit-compiled ``lax.while_loop`` over an incremental decoder with
fixed-shape KV caches (``T5Attention`` decode mode) — the p50-latency hot
loop of BASELINE.md.

Beam search (BASELINE.json config 5) follows the HF algorithm: length
penalty ``sum(logp) / len**alpha``, beams folded into the batch dimension so
cache updates stay one dynamic-update-slice per step.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..models.t5 import T5ForConditionalGeneration

NEG = -1e7


def _init_cache(model: T5ForConditionalGeneration, params: Any,
                encoder_hidden: jax.Array, encoder_mask, start_tokens,
                max_length: int):
    """Prime the cache with the first decode step (writes position 0)."""
    logits, mods = model.apply(
        {"params": params}, start_tokens, jnp.asarray(0, jnp.int32),
        encoder_hidden, max_length, encoder_mask,
        method=model.decode_step, mutable=["cache"])
    return logits[:, -1], mods["cache"]


def _step(model, params, cache, token, step, encoder_hidden, encoder_mask,
          max_length):
    logits, mods = model.apply(
        {"params": params, "cache": cache}, token, step, encoder_hidden,
        max_length, encoder_mask, method=model.decode_step,
        mutable=["cache"])
    return logits[:, -1], mods["cache"]


@partial(jax.jit, static_argnums=(0, 4))
def greedy_decode(model: T5ForConditionalGeneration, params: Any,
                  encoder_hidden: jax.Array,
                  encoder_mask: Optional[jax.Array],
                  max_length: int = 20) -> jax.Array:
    """Returns (B, max_length) token ids; row layout matches HF ``generate``:
    ``[decoder_start, t1, t2, ..., eos, pad, pad...]``."""
    size = model.size
    B = encoder_hidden.shape[0]
    start = jnp.full((B, 1), size.decoder_start_token_id, jnp.int32)

    logits0, cache = _init_cache(model, params, encoder_hidden, encoder_mask,
                                 start, max_length)
    tok1 = jnp.argmax(logits0, axis=-1).astype(jnp.int32)

    tokens = jnp.full((B, max_length), size.pad_token_id, jnp.int32)
    tokens = tokens.at[:, 0].set(start[:, 0])
    tokens = tokens.at[:, 1].set(tok1)
    finished0 = tok1 == size.eos_token_id

    def cond(carry):
        step, _, _, finished = carry
        return jnp.logical_and(step < max_length - 1,
                               jnp.logical_not(jnp.all(finished)))

    def body(carry):
        step, tokens, cache, finished = carry
        cur = jax.lax.dynamic_slice_in_dim(tokens, step, 1, axis=1)
        logits, cache = _step(model, params, cache, cur, step,
                              encoder_hidden, encoder_mask, max_length)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(finished, size.pad_token_id, nxt)
        tokens = jax.lax.dynamic_update_slice_in_dim(
            tokens, nxt[:, None], step + 1, axis=1)
        finished = jnp.logical_or(finished, nxt == size.eos_token_id)
        return step + 1, tokens, cache, finished

    _, tokens, _, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(1, jnp.int32), tokens, cache, finished0))
    return tokens


@partial(jax.jit, static_argnums=(0, 4, 5, 6))
def beam_search_decode(model: T5ForConditionalGeneration, params: Any,
                       encoder_hidden: jax.Array,
                       encoder_mask: Optional[jax.Array],
                       max_length: int = 20, num_beams: int = 4,
                       length_penalty: float = 1.0) -> jax.Array:
    """HF-style beam search; returns the best hypothesis, (B, max_length)."""
    size = model.size
    B = encoder_hidden.shape[0]
    K = num_beams
    V = size.vocab_size

    # Fold beams into batch: every tensor becomes (B*K, ...).
    def tile(x):
        if x is None:
            return None
        return jnp.repeat(x, K, axis=0)

    enc = tile(encoder_hidden)
    mask = tile(encoder_mask)
    start = jnp.full((B * K, 1), size.decoder_start_token_id, jnp.int32)
    logits0, cache = _init_cache(model, params, enc, mask, start, max_length)
    logp0 = jax.nn.log_softmax(logits0.astype(jnp.float32))  # (B*K, V)

    # First expansion: all beams share the same prefix, so take the top-K
    # continuations of beam 0 only.
    first = logp0.reshape(B, K, V)[:, 0]
    top_logp, top_tok = jax.lax.top_k(first, K)  # (B, K)

    tokens = jnp.full((B, K, max_length), size.pad_token_id, jnp.int32)
    tokens = tokens.at[:, :, 0].set(size.decoder_start_token_id)
    tokens = tokens.at[:, :, 1].set(top_tok)
    scores = top_logp  # (B, K) cumulative log-probs of live beams
    finished = top_tok == size.eos_token_id
    # Finalized-hypothesis store: best finished score + tokens per batch.
    # Beams that finish AT the first expansion must seed their tokens too
    # ([decoder_start, eos, pad...]) — the loop body only writes tokens for
    # later finishes, so an unseeded store would return all-pad rows for
    # hypotheses whose stored score wins.
    best_scores = jnp.where(finished,
                            scores / (2.0 ** length_penalty),
                            jnp.full_like(scores, NEG))
    best_tokens0 = jnp.where(finished[:, :, None], tokens,
                             jnp.full_like(tokens, size.pad_token_id))
    scores = jnp.where(finished, NEG, scores)

    def cond(carry):
        step = carry[0]
        scores = carry[2]
        best_scores = carry[4]
        # Continue while any live beam could still beat a finished one.
        upper = jnp.max(scores, axis=1) / (max_length ** length_penalty
                                           if length_penalty > 0 else 1.0)
        viable = jnp.max(scores, axis=1) > NEG / 2
        improvable = jnp.logical_and(
            viable, upper > jnp.max(best_scores, axis=1))
        return jnp.logical_and(step < max_length - 1, jnp.any(improvable))

    def body(carry):
        step, tokens, scores, cache, best_scores, best_tokens = carry
        cur = jax.lax.dynamic_slice_in_dim(
            tokens.reshape(B * K, max_length), step, 1, axis=1)
        logits, cache = _step(model, params, cache, cur, step, enc, mask,
                              max_length)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32)).reshape(B, K, V)
        cand = scores[:, :, None] + logp  # (B, K, V)
        flat = cand.reshape(B, K * V)
        # 2K candidates so K live beams survive even if K hit eos.
        top_s, top_i = jax.lax.top_k(flat, 2 * K)
        beam_idx = top_i // V
        tok_idx = top_i % V
        is_eos = tok_idx == size.eos_token_id

        # Finished candidates update the best-hypothesis store. Hypothesis
        # length includes the decoder-start token: step+2 tokens at index
        # step+1 (HF divides by hyp length ** penalty).
        fin_score = top_s / ((step + 2.0) ** length_penalty)
        fin_score = jnp.where(is_eos, fin_score, NEG)
        cand_best = jnp.max(fin_score, axis=1)
        cand_arg = jnp.argmax(fin_score, axis=1)
        improve = cand_best > jnp.max(best_scores, axis=1)
        sel_beam = jnp.take_along_axis(beam_idx, cand_arg[:, None], 1)[:, 0]
        new_fin_tokens = jnp.take_along_axis(
            tokens, sel_beam[:, None, None], 1)[:, 0]  # (B, L)
        new_fin_tokens = jax.lax.dynamic_update_slice_in_dim(
            new_fin_tokens,
            jnp.full((B, 1), size.eos_token_id, jnp.int32), step + 1, axis=1)
        worst = jnp.argmin(best_scores, axis=1)
        upd_scores = best_scores.at[jnp.arange(B), worst].set(
            jnp.where(improve, cand_best, best_scores[jnp.arange(B), worst]))
        prev_tokens = jnp.take_along_axis(
            best_tokens, worst[:, None, None], 1)[:, 0]
        upd_tok = jnp.where(improve[:, None], new_fin_tokens, prev_tokens)
        best_tokens = best_tokens.at[jnp.arange(B), worst].set(upd_tok)
        best_scores = upd_scores

        # Live beams: first K non-eos candidates.
        live_rank = jnp.where(is_eos, 2 * K + 1,
                              jax.lax.broadcasted_iota(jnp.int32,
                                                       (B, 2 * K), 1))
        order = jnp.argsort(live_rank, axis=1)[:, :K]
        new_scores = jnp.take_along_axis(top_s, order, 1)
        new_beam = jnp.take_along_axis(beam_idx, order, 1)
        new_tok = jnp.take_along_axis(tok_idx, order, 1)
        dead = jnp.take_along_axis(is_eos, order, 1)
        new_scores = jnp.where(dead, NEG, new_scores)

        # Reorder beam state (tokens + cache) by parent beam.
        tokens = jnp.take_along_axis(tokens, new_beam[:, :, None], 1)
        tokens = jax.lax.dynamic_update_slice_in_dim(
            tokens, new_tok[:, :, None], step + 1, axis=2)
        flat_parent = (new_beam
                       + jnp.arange(B)[:, None] * K).reshape(-1)  # (B*K,)

        def reorder(x):
            # Scanned cache leaves are (num_layers, B*K, H, L, D): the batch
            # axis is axis 1. Rank guard leaves the per-layer scalar
            # `cache_index` (stacked to rank-1 (num_layers,)) untouched.
            if x.ndim >= 2 and x.shape[1] == B * K:
                return jnp.take(x, flat_parent, axis=1)
            return x
        cache = jax.tree.map(reorder, cache)
        return (step + 1, tokens, new_scores, cache, best_scores,
                best_tokens)

    init = (jnp.asarray(1, jnp.int32), tokens, scores, cache, best_scores,
            best_tokens0)
    (_, tokens, scores, _, best_scores, best_tokens) = jax.lax.while_loop(
        cond, body, init)

    # If nothing finished, fall back to the best live beam (length-penalized
    # at max_length, matching HF's forced finalization).
    live_best = jnp.max(scores, axis=1) / (max_length ** length_penalty
                                           if length_penalty > 0 else 1.0)
    live_arg = jnp.argmax(scores, axis=1)
    live_tokens = jnp.take_along_axis(tokens, live_arg[:, None, None],
                                      1)[:, 0]
    fin_best = jnp.max(best_scores, axis=1)
    fin_arg = jnp.argmax(best_scores, axis=1)
    fin_tokens = jnp.take_along_axis(best_tokens, fin_arg[:, None, None],
                                     1)[:, 0]
    use_fin = fin_best >= live_best
    return jnp.where(use_fin[:, None], fin_tokens, live_tokens)


def generate(model: T5ForConditionalGeneration, params: Any,
             encoder_hidden: jax.Array, encoder_mask: Optional[jax.Array],
             max_length: int = 20, num_beams: int = 1,
             length_penalty: float = 1.0) -> jax.Array:
    """HF-default-compatible entry (greedy when num_beams == 1)."""
    if num_beams <= 1:
        return greedy_decode(model, params, encoder_hidden, encoder_mask,
                             max_length)
    return beam_search_decode(model, params, encoder_hidden, encoder_mask,
                              max_length, num_beams, length_penalty)
