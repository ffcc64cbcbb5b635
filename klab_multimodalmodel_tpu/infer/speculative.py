"""Exact speculative greedy decoding (prompt-lookup self-drafting).

BASELINE.md's decode-lever ablation ends at a wall: batch-1 caption latency
is dominated by the ``max_length`` sequential decoder-step dependency chain
(~1.9 ms/step), and every lever that executes those steps faster measured
null — "meaningful cuts need speculative/parallel decoding". This module is
that cut, built the TPU-native way:

  * at batch 1 the decoder step is weight-stream-bound (it reads the full
    decoder weight set from HBM per step, BASELINE.md int8 section), so a
    ``T``-token verification step costs nearly the same as a 1-token step —
    the extra rows ride the already-streaming weights through the MXU;
  * ``models/t5.py:decode_step`` already supports multi-token chunks
    against the KV cache (per-query causal validity mask + index bump), the
    same machinery chunked prefill uses;
  * drafts come from **n-gram lookup over the row's own generated prefix**
    (prompt-lookup decoding, Saxena 2023 / transformers'
    ``prompt_lookup_num_tokens`` — the draft-model-free scheme): find the
    most recent earlier occurrence of the last ``ngram`` tokens and propose
    the tokens that followed it. Zero extra model, zero extra weights; the
    lookup is a handful of vectorized compares on the (B, L) token buffer.

Every loop iteration feeds ``[last_token, d_1..d_K]`` (K+1 tokens), gets
K+1 greedy choices back, accepts the longest prefix of drafts that match
the model's own argmax, and always banks one bonus token from the first
mismatch position — so an iteration advances between 1 and K+1 positions
and NEVER loses to plain greedy on step count. Rejected cache positions
are handled by index rewind alone: stale K/V beyond a row's
``cache_index`` are masked by the per-query validity mask until
overwritten (the same invariant the continuous engine's inert slots rely
on, ``infer/engine.py``).

Exactness: accepted tokens are by construction the argmax of logits whose
prefix is entirely accepted tokens — i.e. exactly what ``greedy_decode``
would have chosen (the standard speculative-decoding argument, greedy
case). ``tests/test_speculative.py`` pins bit-identity against
``greedy_decode`` across batches, paddings, drafts lengths and eos
placements. (As with chunked prefill, the guarantee assumes per-position
numerics are invariant to chunk width; fp32 logits make knife-edge argmax
flips a non-issue in practice.)

Scope: the reference's generation config (greedy, no logits processors —
``/root/reference/models/model.py:28`` uses HF defaults). Penalty/sampling
configs route to the sequential loops in ``infer/generate.py``.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..models.t5 import T5ForConditionalGeneration
from .generate import _broadcast_cache_index, _init_cache, _variables


def _set_cache_index(cache: Any, new_index: jax.Array) -> Any:
    """Rewind/advance every ``cache_index`` leaf to the per-row
    ``new_index`` (B,). All layers share one position by construction."""

    def fix(path, leaf):
        if getattr(path[-1], "key", None) == "cache_index":
            return jnp.broadcast_to(new_index[None, :].astype(leaf.dtype),
                                    leaf.shape)
        return leaf

    return jax.tree_util.tree_map_with_path(fix, cache)


def _ngram_draft(tokens: jax.Array, step: jax.Array, draft_len: int,
                 ngram: int, pad_id: int,
                 lookup_prefix: Optional[jax.Array] = None) -> jax.Array:
    """Prompt-lookup drafts: (B, draft_len) proposals per row.

    Finds the most recent position ``p <= step - ngram`` where
    ``tokens[p:p+ngram]`` equals the row's trailing ngram
    ``tokens[step-ngram+1 : step+1]`` and proposes the ``draft_len``
    tokens that followed it. With ``lookup_prefix`` (B, S) — typically
    the request's source token ids — the search corpus is
    ``[prefix | generated]``, so copy-heavy seq2seq (span denoising,
    summarization) drafts straight from the source; generated-prefix
    matches still win ties by recency. Rows with no match draft pads —
    a wrong draft costs nothing (it is simply rejected and the iteration
    banks its one bonus token, exactly plain greedy)."""
    if lookup_prefix is not None:
        S = lookup_prefix.shape[1]
        buf = jnp.concatenate(
            [lookup_prefix.astype(tokens.dtype), tokens], axis=1)
        return _ngram_draft(buf, step + S, draft_len, ngram, pad_id)
    B, L = tokens.shape
    n = ngram
    # Trailing n-gram per row (clipped reads are masked out below for
    # early rows where step+1 < n).
    gidx = step[:, None] - (n - 1) + jnp.arange(n)[None, :]
    gram = jnp.take_along_axis(tokens, jnp.clip(gidx, 0, L - 1), axis=1)
    Wn = L - n + 1
    match = jnp.ones((B, Wn), bool)
    for i in range(n):
        match = match & (tokens[:, i:Wn + i] == gram[:, i:i + 1])
    p = jnp.arange(Wn)[None, :]
    # Window must lie strictly inside the generated prefix and before the
    # trailing gram itself (p <= step - n); also requires step + 1 >= n.
    match = match & (p <= step[:, None] - n)
    best = jnp.max(jnp.where(match, p, -1), axis=1)          # (B,)
    has = best >= 0
    start = jnp.where(has, best + n, 0)
    didx = start[:, None] + jnp.arange(draft_len)[None, :]
    draft = jnp.take_along_axis(tokens, jnp.clip(didx, 0, L - 1), axis=1)
    return jnp.where(has[:, None], draft, jnp.full_like(draft, pad_id))


def _chunk_step(model, params, cache, chunk, step, encoder_hidden,
                encoder_mask, buf_len):
    """decode_step on a (B, T) chunk at per-row positions ``step`` —
    returns ALL T logits (generate's ``_step`` keeps only the last)."""
    logits, mods = model.apply(
        dict(_variables(params), cache=cache), chunk, step, encoder_hidden,
        buf_len, encoder_mask, method=model.decode_step, mutable=["cache"])
    return logits, mods["cache"]


@partial(jax.jit, static_argnums=(0, 4, 5, 6))
def _speculative_core(model: T5ForConditionalGeneration, params: Any,
                      encoder_hidden: jax.Array,
                      encoder_mask: Optional[jax.Array],
                      max_length: int, draft_len: int, ngram: int,
                      source_ids: Optional[jax.Array] = None):
    size = model.size
    B = encoder_hidden.shape[0]
    K = draft_len
    # Padded buffers: an iteration entered at step == max_length - 2 still
    # writes a full K+1 chunk; padding keeps every dynamic slice/update
    # in-bounds (XLA clamps out-of-range starts, which would corrupt
    # earlier cache rows). The visible result is sliced to max_length.
    L = max_length + K + 1
    start = jnp.full((B, 1), size.decoder_start_token_id, jnp.int32)
    logits0, cache = _init_cache(model, params, encoder_hidden,
                                 encoder_mask, start, L)
    # Per-row indices: rows accept different draft counts per iteration,
    # so every row sits at its own decode position (the continuous
    # engine's cache mode; decode_step takes a (B,) step vector).
    cache = _broadcast_cache_index(cache, B)
    tokens = jnp.full((B, L), size.pad_token_id, jnp.int32)
    tokens = tokens.at[:, 0].set(start[:, 0])
    tok1 = jnp.argmax(logits0, axis=-1).astype(jnp.int32)
    tokens = tokens.at[:, 1].set(tok1)
    init = (jnp.ones((B,), jnp.int32), tokens, cache,
            tok1 == size.eos_token_id, jnp.zeros((), jnp.int32),
            jnp.zeros((B,), jnp.int32))

    def cond(carry):
        step, _, _, finished, _, _ = carry
        return jnp.any(~finished & (step < max_length - 1))

    def body(carry):
        step, tokens, cache, finished, iters, accepted = carry
        draft = _ngram_draft(tokens, step, K, ngram, size.pad_token_id,
                             lookup_prefix=source_ids)
        last = jnp.take_along_axis(tokens, step[:, None], axis=1)
        chunk = jnp.concatenate([last, draft], axis=1)     # (B, K+1)
        logits, cache = _chunk_step(model, params, cache, chunk, step,
                                    encoder_hidden, encoder_mask, L)
        choice = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, K+1)
        # choice[:, j] is greedy's token for position step+1+j GIVEN the
        # chunk prefix; valid while every draft before it was accepted.
        ok = (choice[:, :K] == draft).astype(jnp.int32)
        a = jnp.sum(jnp.cumprod(ok, axis=1), axis=1)       # leading accepts
        n_new = a + 1                                      # + bonus token
        j_pos = jnp.arange(K + 1)[None, :]
        eos_j = jnp.min(jnp.where(choice == size.eos_token_id, j_pos,
                                  K + 1), axis=1)
        n_new = jnp.minimum(n_new, eos_j + 1)              # stop AT eos
        n_new = jnp.minimum(n_new, jnp.maximum(max_length - 1 - step, 0))
        n_new = jnp.where(finished, 0, n_new)
        # Scatter choice[:, :n_new] to tokens[step+1 : step+1+n_new].
        rel = jnp.arange(L)[None, :] - (step[:, None] + 1)  # (B, L)
        write = (rel >= 0) & (rel < n_new[:, None])
        vals = jnp.take_along_axis(choice, jnp.clip(rel, 0, K), axis=1)
        tokens = jnp.where(write, vals, tokens)
        new_step = step + n_new
        finished = finished | (eos_j < n_new)
        # Index rewind: positions >= new_step hold rejected-draft K/V;
        # the per-query validity mask hides them until overwritten.
        cache = _set_cache_index(cache, new_step)
        # Banked drafts this iteration: n_new always includes one bonus
        # token, so drafts actually written are n_new - 1 (0 for inert or
        # freshly-capped rows).
        accepted = accepted + jnp.maximum(n_new - 1, 0)
        return new_step, tokens, cache, finished, iters + 1, accepted

    step, tokens, _, _, iters, accepted = jax.lax.while_loop(cond, body,
                                                             init)
    return tokens[:, :max_length], iters, accepted


def speculative_greedy_decode(model: T5ForConditionalGeneration,
                              params: Any, encoder_hidden: jax.Array,
                              encoder_mask: Optional[jax.Array],
                              max_length: int = 20, draft_len: int = 4,
                              ngram: int = 2,
                              source_ids: Optional[jax.Array] = None
                              ) -> jax.Array:
    """Greedy decode via self-speculation; returns (B, max_length) ids,
    row layout identical to :func:`~..infer.generate.greedy_decode`
    (``[decoder_start, t1, ..., eos, pad...]``), tokens bit-identical.

    ``source_ids`` (B, S) extends the drafter's lookup corpus with the
    request's source tokens — the classic prompt-lookup configuration for
    copy-heavy seq2seq (span denoising, summarization); drafting choice
    never affects output tokens, only the pass count."""
    if draft_len < 1 or ngram < 1:
        raise ValueError(
            f"draft_len and ngram must be >= 1, got {draft_len}/{ngram}")
    tokens, _, _ = _speculative_core(model, params, encoder_hidden,
                                     encoder_mask, max_length, draft_len,
                                     ngram, source_ids)
    return tokens


def speculative_greedy_decode_with_stats(
        model: T5ForConditionalGeneration, params: Any,
        encoder_hidden: jax.Array, encoder_mask: Optional[jax.Array],
        max_length: int = 20, draft_len: int = 4, ngram: int = 2,
        source_ids: Optional[jax.Array] = None):
    """(tokens, n_decoder_passes, per-row accepted-draft totals) — the
    bench/introspection variant; same compiled program as the plain call."""
    if draft_len < 1 or ngram < 1:
        raise ValueError(
            f"draft_len and ngram must be >= 1, got {draft_len}/{ngram}")
    return _speculative_core(model, params, encoder_hidden, encoder_mask,
                             max_length, draft_len, ngram, source_ids)
