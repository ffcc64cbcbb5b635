"""Autoregressive generation: greedy, beam search, and sampling with a KV
cache.

The reference calls HF ``transformer.generate(inputs_embeds=...)`` with the
default generation config (``/root/reference/models/model.py:28``; SURVEY.md
§3.3): greedy decoding, ``max_length=20`` counting the decoder-start token,
decoder start = pad id, stop at eos. This module reproduces those semantics
as a single jit-compiled ``lax.while_loop`` over an incremental decoder with
fixed-shape KV caches (``T5Attention`` decode mode) — the p50-latency hot
loop of BASELINE.md.

Beam search (BASELINE.json config 5) is a token-exact port of HF's
vectorized ``GenerationMixin._beam_search`` (transformers >= 4.50, the
flax-derived refactor) at its T5 defaults — ``do_sample=False``,
``early_stopping=False``, one eos token (``beams_to_keep = 2·num_beams``):
per step, top-2K candidates over K·V scores; the K best *non-finished*
candidates continue as running beams; candidates that hit a stopping
criterion (eos, or the sequence reaching ``max_length``) and rank inside
the top K merge into a K-slot finished store under the length penalty
``sum(logp) / generated_len**alpha`` (``generated_len`` excludes the
decoder-start token); a per-row early-stop heuristic freezes the store
once the best running beam can no longer beat the worst stored finished
hypothesis. Beams are folded into the batch dimension so cache updates
stay one dynamic-update-slice per step.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.t5 import T5ForConditionalGeneration
from .quantize import QuantizedParams


def _variables(params: Any) -> dict:
    """Apply collections for a decode call: plain params, or the int8
    weight-only pair (``infer/quantize.py``) unpacked into the ``qscale``
    collection KlabDense / the tied head read."""
    if isinstance(params, QuantizedParams):
        return {"params": params.params, "qscale": params.qscale}
    return {"params": params}


def _broadcast_cache_index(cache: Any, n_rows: int) -> Any:
    """(layers,) scalar ``cache_index`` leaves -> (layers, n_rows) per-row.

    Per-row indices switch ``models/t5.py:decode_step`` into its
    every-row-at-its-own-position mode — used by the continuous engine's
    slot batch (``infer/engine.py``) and the speculative loop's per-row
    acceptance (``infer/speculative.py``)."""

    def fix(path, leaf):
        if getattr(path[-1], "key", None) == "cache_index":
            return jnp.broadcast_to(leaf[:, None], (leaf.shape[0], n_rows))
        return leaf

    return jax.tree_util.tree_map_with_path(fix, cache)


def _init_cache(model: T5ForConditionalGeneration, params: Any,
                encoder_hidden: jax.Array, encoder_mask, start_tokens,
                max_length: int):
    """Prime the cache with the first decode step (writes position 0)."""
    logits, mods = model.apply(
        _variables(params), start_tokens, jnp.asarray(0, jnp.int32),
        encoder_hidden, max_length, encoder_mask,
        method=model.decode_step, mutable=["cache"])
    return logits[:, -1], mods["cache"]


def _step(model, params, cache, token, step, encoder_hidden, encoder_mask,
          max_length):
    logits, mods = model.apply(
        dict(_variables(params), cache=cache), token, step, encoder_hidden,
        max_length, encoder_mask, method=model.decode_step,
        mutable=["cache"])
    return logits[:, -1], mods["cache"]


def _select_next(logits, tokens, step, size, finished, do_sample,
                 temperature, top_k, top_p, min_length, repetition_penalty,
                 no_repeat_ngram_size, rng):
    """One token choice from raw step logits — the shared core of greedy,
    sampling, and the streaming variants (token-exactness across them is
    by construction). Applies HF's processor chain, then either argmax or
    a warped categorical draw keyed by the absolute step (so a resumed/
    chunked loop draws the same stream), and pads out finished rows."""
    logits = process_logits(logits, tokens, step, size.eos_token_id,
                            min_length, repetition_penalty,
                            no_repeat_ngram_size)
    if do_sample:
        logits = warp_logits(logits, temperature, top_k, top_p)
        # Batched per-row keys: ndim > 0 for typed key arrays, > 1 for
        # old-style uint32 (2,) keys (whose scalar form is already 1-D).
        batched = (rng.ndim > 0
                   if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key)
                   else rng.ndim > 1)
        if batched:
            # Batched per-row keys (the continuous engine): every slot
            # draws from its own request stream at its own absolute step.
            # Row i is bit-identical to a B=1 ``sample_decode`` with key
            # ``rng[i]``: the (V,) per-row categorical consumes the same
            # threefry bits as the (1, V) single-request draw.
            steps = jnp.broadcast_to(jnp.asarray(step),
                                     (logits.shape[0],))
            keys = jax.vmap(jax.random.fold_in)(rng, steps)
            nxt = jax.vmap(jax.random.categorical)(keys,
                                                   logits).astype(jnp.int32)
        else:
            nxt = jax.random.categorical(
                jax.random.fold_in(rng, step), logits).astype(jnp.int32)
    else:
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jnp.where(finished, size.pad_token_id, nxt)


def _prime(model, params, encoder_hidden, encoder_mask, max_length,
           do_sample, temperature, top_k, top_p, min_length,
           repetition_penalty, no_repeat_ngram_size, rng):
    """Prime the cache and choose token 1: the shared entry state of the
    greedy / sampling / streaming loops — ``(step=1, tokens, cache,
    finished)`` with positions 0 (decoder start) and 1 filled."""
    size = model.size
    B = encoder_hidden.shape[0]
    start = jnp.full((B, 1), size.decoder_start_token_id, jnp.int32)
    logits0, cache = _init_cache(model, params, encoder_hidden, encoder_mask,
                                 start, max_length)
    tokens = jnp.full((B, max_length), size.pad_token_id, jnp.int32)
    tokens = tokens.at[:, 0].set(start[:, 0])
    tok1 = _select_next(logits0, tokens, jnp.asarray(0, jnp.int32), size,
                        jnp.zeros((B,), bool), do_sample, temperature,
                        top_k, top_p, min_length, repetition_penalty,
                        no_repeat_ngram_size, rng)
    tokens = tokens.at[:, 1].set(tok1)
    return (jnp.asarray(1, jnp.int32), tokens, cache,
            tok1 == size.eos_token_id)


def _sequential_body(model, params, encoder_hidden, encoder_mask,
                     max_length, do_sample, temperature, top_k, top_p,
                     min_length, repetition_penalty, no_repeat_ngram_size,
                     rng):
    """The one per-step decode body shared by greedy, sampling, and the
    chunked streaming loop (``lax.while_loop`` carry:
    ``(step, tokens, cache, finished)``)."""
    size = model.size

    def body(carry):
        step, tokens, cache, finished = carry
        cur = jax.lax.dynamic_slice_in_dim(tokens, step, 1, axis=1)
        logits, cache = _step(model, params, cache, cur, step,
                              encoder_hidden, encoder_mask, max_length)
        nxt = _select_next(logits, tokens, step, size, finished, do_sample,
                           temperature, top_k, top_p, min_length,
                           repetition_penalty, no_repeat_ngram_size, rng)
        tokens = jax.lax.dynamic_update_slice_in_dim(
            tokens, nxt[:, None], step + 1, axis=1)
        finished = jnp.logical_or(finished, nxt == size.eos_token_id)
        return step + 1, tokens, cache, finished

    return body


@partial(jax.jit, static_argnums=(0, 4, 5, 6, 7))
def greedy_decode(model: T5ForConditionalGeneration, params: Any,
                  encoder_hidden: jax.Array,
                  encoder_mask: Optional[jax.Array],
                  max_length: int = 20, min_length: int = 0,
                  repetition_penalty: float = 1.0,
                  no_repeat_ngram_size: int = 0) -> jax.Array:
    """Returns (B, max_length) token ids; row layout matches HF ``generate``:
    ``[decoder_start, t1, t2, ..., eos, pad, pad...]``.

    Logits processors apply to the raw fp32 logits before the argmax,
    exactly where HF's ``_sample`` runs ``logits_processor`` (on
    ``next_token_logits``, not on log-probs)."""
    init = _prime(model, params, encoder_hidden, encoder_mask, max_length,
                  False, 1.0, 0, 1.0, min_length, repetition_penalty,
                  no_repeat_ngram_size, None)
    body = _sequential_body(model, params, encoder_hidden, encoder_mask,
                            max_length, False, 1.0, 0, 1.0, min_length,
                            repetition_penalty, no_repeat_ngram_size, None)

    def cond(carry):
        step, _, _, finished = carry
        return jnp.logical_and(step < max_length - 1,
                               jnp.logical_not(jnp.all(finished)))

    _, tokens, _, _ = jax.lax.while_loop(cond, body, init)
    return tokens


@partial(jax.jit, static_argnums=(0, 4, 5, 6, 7, 8, 9))
def beam_search_decode(model: T5ForConditionalGeneration, params: Any,
                       encoder_hidden: jax.Array,
                       encoder_mask: Optional[jax.Array],
                       max_length: int = 20, num_beams: int = 4,
                       length_penalty: float = 1.0, min_length: int = 0,
                       repetition_penalty: float = 1.0,
                       no_repeat_ngram_size: int = 0) -> jax.Array:
    """HF-exact beam search; returns the best hypothesis, (B, max_length).

    Mirrors ``GenerationMixin._beam_search`` step for step (see module
    docstring). The index bookkeeping: loop variable ``s`` counts tokens
    generated so far (HF's ``cur_len - decoder_prompt_len``); the step
    writes candidate tokens at sequence index ``s + 1`` and normalizes
    finished candidates by ``(s + 1) ** length_penalty`` (HF's
    ``generated_len = cur_len + 1 - decoder_prompt_len``).

    Logits processors apply to the per-beam **log-softmax scores** over the
    flat running sequences — HF ``_beam_search`` runs ``logits_processor``
    after ``log_softmax`` (unlike ``_sample``, which processes raw logits).
    """
    size = model.size
    B = encoder_hidden.shape[0]
    K = num_beams
    V = size.vocab_size
    K2 = 2 * K  # HF beams_to_keep = max(2, 1 + n_eos_tokens) * num_beams
    NEG9 = jnp.float32(-1.0e9)  # HF's additive -1e9 masking, bit-for-bit

    # Fold beams into batch: every tensor becomes (B*K, ...).
    def tile(x):
        if x is None:
            return None
        return jnp.repeat(x, K, axis=0)

    enc = tile(encoder_hidden)
    mask = tile(encoder_mask)
    start = jnp.full((B * K, 1), size.decoder_start_token_id, jnp.int32)
    logits0, cache = _init_cache(model, params, enc, mask, start, max_length)

    # Running (live) beams: beam 0 scores 0, the rest -1e9 so the first
    # expansion draws every candidate from beam 0's distribution.
    run_seq = jnp.full((B, K, max_length), size.pad_token_id, jnp.int32)
    run_seq = run_seq.at[:, :, 0].set(size.decoder_start_token_id)
    run_scores = jnp.zeros((B, K), jnp.float32).at[:, 1:].set(NEG9)
    # Finished-hypothesis store: K slots per row, kept sorted (slot 0 best).
    seq = run_seq
    scores = jnp.full((B, K), NEG9)
    finished = jnp.zeros((B, K), bool)
    # Early-stop heuristic state: rows where the best running beam can
    # still improve on the worst stored finished hypothesis.
    unsat = jnp.ones((B,), bool)
    rank_lt_k = jax.lax.broadcasted_iota(jnp.int32, (B, K2), 1) < K

    def process(s, logp, run_seq, run_scores, seq, scores, finished, unsat):
        """One HF beam-search bookkeeping step from this step's log-probs.

        ``s``: number of tokens generated before this step; the selected
        candidate tokens land at sequence index ``s + 1``. Returns the
        next running beams, their parent indices (for the cache reorder),
        and the updated finished store / heuristic state.
        """
        cand = run_scores[:, :, None] + logp  # (B, K, V)
        top_s, top_i = jax.lax.top_k(cand.reshape(B, K * V), K2)
        parent = top_i // V
        tok = (top_i % V).astype(jnp.int32)
        cand_seq = jnp.take_along_axis(run_seq, parent[:, :, None], 1)
        cand_seq = jax.lax.dynamic_update_slice_in_dim(
            cand_seq, tok[:, :, None], s + 1, axis=2)
        # Stopping criteria per candidate: eos, or sequence at max_length
        # (HF folds max-length finalization through the same merge).
        hits = jnp.logical_or(tok == size.eos_token_id, s + 2 >= max_length)

        # Running beams for the next step: top-K non-finished candidates.
        run_cand = top_s + hits.astype(jnp.float32) * NEG9
        new_run_scores, order = jax.lax.top_k(run_cand, K)
        new_parent = jnp.take_along_axis(parent, order, 1)
        new_run_seq = jnp.take_along_axis(cand_seq, order[:, :, None], 1)

        # Finished store: candidates that hit a stopping criterion AND rank
        # inside the top num_beams (HF's top_num_beam_mask — lower-ranked
        # eos candidates are never stored), length-normalized; rows whose
        # early-stop heuristic is already satisfied stop accepting. Merge
        # with the stored K and keep the best K (stable top_k keeps stored
        # entries on exact ties, like torch.topk).
        gen_len = jnp.float32(s + 1)
        eligible = jnp.logical_and(hits, rank_lt_k)
        fin = top_s / gen_len ** length_penalty
        fin = fin + (~unsat[:, None]).astype(jnp.float32) * NEG9
        fin = fin + (~eligible).astype(jnp.float32) * NEG9
        m_scores = jnp.concatenate([scores, fin], axis=1)
        new_scores, sel = jax.lax.top_k(m_scores, K)
        m_seq = jnp.concatenate([seq, cand_seq], axis=1)
        new_seq = jnp.take_along_axis(m_seq, sel[:, :, None], 1)
        m_fin = jnp.concatenate([finished, eligible], axis=1)
        new_finished = jnp.take_along_axis(m_fin, sel, 1)

        # Early-stop heuristic (HF early_stopping=False): once every store
        # slot holds a finished hypothesis and the best running beam
        # normalized AT THE CURRENT LENGTH cannot beat the worst of them,
        # the row stops accepting new hypotheses (sticky).
        best_possible = new_run_scores[:, 0] / gen_len ** length_penalty
        improvable = jnp.logical_or(
            ~jnp.all(new_finished, axis=1),
            best_possible > jnp.min(new_scores, axis=1))
        new_unsat = jnp.logical_and(unsat, improvable)
        return (new_run_seq, new_run_scores, new_parent, new_seq,
                new_scores, new_finished, new_unsat)

    def reorder_cache(cache, parent):
        flat_parent = (parent + jnp.arange(B)[:, None] * K).reshape(-1)

        def reorder(x):
            # Scanned cache leaves are (num_layers, B*K, H, L, D): the batch
            # axis is axis 1. Rank guard leaves the per-layer scalar
            # `cache_index` (stacked to rank-1 (num_layers,)) untouched.
            if x.ndim >= 2 and x.shape[1] == B * K:
                return jnp.take(x, flat_parent, axis=1)
            return x
        return jax.tree.map(reorder, cache)

    def process_logp(logp_flat, run_seq, s):
        """HF ``_beam_search``: processors run on (B*K, V) log-probs with
        the flat running sequences as ``input_ids``."""
        return process_logits(
            logp_flat, run_seq.reshape(B * K, max_length), s,
            size.eos_token_id, min_length, repetition_penalty,
            no_repeat_ngram_size)

    # First expansion (s = 0) from the cache-priming logits.
    logp0 = jax.nn.log_softmax(logits0.astype(jnp.float32))
    logp0 = process_logp(logp0, run_seq, jnp.asarray(0, jnp.int32))
    logp0 = logp0.reshape(B, K, V)
    (run_seq, run_scores, parent0, seq, scores, finished, unsat) = process(
        0, logp0, run_seq, run_scores, seq, scores, finished, unsat)
    cache = reorder_cache(cache, parent0)

    def cond(carry):
        s = carry[0]
        unsat = carry[7]
        return jnp.logical_and(s < max_length - 1, jnp.any(unsat))

    def body(carry):
        s, run_seq, run_scores, cache, seq, scores, finished, unsat = carry
        cur = jax.lax.dynamic_slice_in_dim(
            run_seq.reshape(B * K, max_length), s, 1, axis=1)
        logits, cache = _step(model, params, cache, cur, s, enc, mask,
                              max_length)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32))
        logp = process_logp(logp, run_seq, s).reshape(B, K, V)
        (run_seq, run_scores, parent, seq, scores, finished,
         unsat) = process(s, logp, run_seq, run_scores, seq, scores,
                          finished, unsat)
        cache = reorder_cache(cache, parent)
        return (s + 1, run_seq, run_scores, cache, seq, scores, finished,
                unsat)

    init = (jnp.asarray(1, jnp.int32), run_seq, run_scores, cache, seq,
            scores, finished, unsat)
    carry = jax.lax.while_loop(cond, body, init)
    seq = carry[4]
    # The store is kept sorted descending: slot 0 is the best hypothesis
    # (live beams entered it at max_length via the stopping criterion).
    return seq[:, 0]


def process_logits(logits: jax.Array, tokens: jax.Array, step: jax.Array,
                   eos_token_id: int, min_length: int = 0,
                   repetition_penalty: float = 1.0,
                   no_repeat_ngram_size: int = 0) -> jax.Array:
    """HF logits-processor chain in HF's fixed order
    (``GenerationMixin._get_logits_processor``): repetition penalty →
    no-repeat-ngram → min-length. Processors run BEFORE the sampling
    warpers, exactly as in HF.

    ``tokens`` is the fixed-shape (B, max_length) decode buffer whose
    positions ``0..step`` hold the decoder prefix (HF's ``input_ids``,
    ``cur_len = step + 1``); later positions hold pad filler. ``step`` may
    be a scalar (all rows at the same position) or a (B,) vector (the
    continuous-batching engine, where every row decodes at its own
    position). Semantics bit-match HF on fp32 scores:

    - ``RepetitionPenaltyLogitsProcessor``: every token id present in the
      prefix has its score divided by the penalty if positive, multiplied
      if negative. Filler positions are substituted with the row's
      position-0 token (the decoder start), which is always in the prefix,
      so the penalized id set equals HF's exactly.
    - ``NoRepeatNGramLogitsProcessor``: a candidate is banned if the
      prefix's trailing ``n-1``-gram followed by that candidate occurs as
      an n-gram anywhere in the prefix.
    - ``MinLengthLogitsProcessor``: eos is masked to ``-inf`` while
      ``cur_len < min_length`` (length counts the decoder start, like HF).
    """
    logits = logits.astype(jnp.float32)
    neg_inf = jnp.float32(-jnp.inf)
    B, L = tokens.shape
    V = logits.shape[-1]
    # Normalize to a per-row (B, 1) step column: scalar steps broadcast to
    # it losslessly, and vector steps (continuous batching) come through
    # with identical per-row semantics.
    step_col = jnp.broadcast_to(jnp.asarray(step), (B,))[:, None]

    if repetition_penalty != 1.0:
        valid = jnp.arange(L)[None, :] <= step_col       # (B, L)
        seen = jnp.where(valid, tokens, tokens[:, :1])   # filler -> start tok
        present = jax.vmap(
            lambda t: jnp.zeros((V,), jnp.bool_).at[t].set(True))(seen)
        penalized = jnp.where(logits < 0,
                              logits * jnp.float32(repetition_penalty),
                              logits / jnp.float32(repetition_penalty))
        logits = jnp.where(present, penalized, logits)

    if no_repeat_ngram_size and no_repeat_ngram_size > 1:
        n = int(no_repeat_ngram_size)
        # Window starts t cover every n-gram fully inside the prefix:
        # t + n - 1 <= step. The candidate completes the trailing
        # (n-1)-gram at positions step-n+2 .. step.
        win_idx = jnp.arange(L)[:, None] + jnp.arange(n - 1)[None, :]
        win_idx = jnp.clip(win_idx, 0, L - 1)
        windows = tokens[:, win_idx]                     # (B, L, n-1)
        suf_pos = jnp.clip(step_col - (n - 2) + jnp.arange(n - 1)[None, :],
                           0, L - 1)                     # (B, n-1)
        suffix = jnp.take_along_axis(tokens, suf_pos, axis=1)
        match = jnp.all(windows == suffix[:, None, :], axis=-1)  # (B, L)
        valid_t = (jnp.arange(L)[None, :] + n - 1) <= step_col   # (B, L)
        hit = jnp.logical_and(match, valid_t)
        banned_tok = tokens[:, jnp.clip(jnp.arange(L) + n - 1, 0, L - 1)]
        ban = jax.vmap(lambda bt, m: jnp.zeros(
            (V,), jnp.bool_).at[bt].max(m))(banned_tok, hit)
        logits = jnp.where(ban, neg_inf, logits)

    if min_length and min_length > 0:
        mask_eos = (step_col + 1) < min_length           # (B, 1)
        eos_col = jnp.arange(V)[None, :] == eos_token_id
        logits = jnp.where(jnp.logical_and(mask_eos, eos_col), neg_inf,
                           logits)
    return logits


def warp_logits(logits: jax.Array, temperature: float = 1.0,
                top_k: int = 0, top_p: float = 1.0) -> jax.Array:
    """HF logits-warper chain, applied in HF's fixed order
    (``GenerationMixin._get_logits_processor``): temperature, then top-k,
    then top-p. Bit-matches ``TemperatureLogitsWarper`` /
    ``TopKLogitsWarper`` / ``TopPLogitsWarper`` on fp32 logits, including
    the boundary conventions:

    - top-k removes tokens strictly below the k-th largest logit
      (``scores < topk(scores, k)[..., -1]``), so k-way ties at the
      threshold all survive;
    - top-p sorts ascending, removes where the inclusive ascending
      cumulative softmax is ``<= 1 - top_p``, and always keeps the final
      (largest) slot (``min_tokens_to_keep = 1``).

    Removed positions get ``-inf`` (HF's ``filter_value``). Tied logits
    resolve per sorted position like HF; for continuous-valued logits the
    kept set is identical.
    """
    logits = logits.astype(jnp.float32)
    neg_inf = jnp.float32(-jnp.inf)
    if temperature != 1.0:
        logits = logits / jnp.float32(temperature)
    if top_k and top_k > 0:
        k = min(int(top_k), logits.shape[-1])
        kth = jax.lax.top_k(logits, k)[0][..., -1:]
        logits = jnp.where(logits < kth, neg_inf, logits)
    if top_p < 1.0:
        # ONE O(V log V) sort per step: gather the ascending values through
        # the argsort permutation and scatter the removal mask back through
        # it (put_along_axis), instead of sort + argsort + inverse-argsort.
        sorted_idx = jnp.argsort(logits, axis=-1)           # ascending
        sorted_logits = jnp.take_along_axis(logits, sorted_idx, axis=-1)
        cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
        remove_sorted = cum <= jnp.float32(1.0 - top_p)
        remove_sorted = remove_sorted.at[..., -1:].set(False)
        remove = jnp.put_along_axis(
            jnp.zeros_like(remove_sorted), sorted_idx, remove_sorted,
            axis=-1, inplace=False)
        logits = jnp.where(remove, neg_inf, logits)
    return logits


@partial(jax.jit, static_argnums=(0, 4, 6, 7, 8, 9, 10, 11))
def sample_decode(model: T5ForConditionalGeneration, params: Any,
                  encoder_hidden: jax.Array,
                  encoder_mask: Optional[jax.Array],
                  max_length: int, rng: jax.Array,
                  temperature: float = 1.0, top_k: int = 0,
                  top_p: float = 1.0, min_length: int = 0,
                  repetition_penalty: float = 1.0,
                  no_repeat_ngram_size: int = 0) -> jax.Array:
    """Ancestral sampling (HF ``do_sample=True``): per step the logits run
    through :func:`warp_logits` and the next token is drawn from the
    renormalized distribution (``jax.random.categorical`` == HF's
    softmax + multinomial in distribution; the draws themselves use JAX's
    threefry stream, not torch's, so sequences are reproducible per ``rng``
    but not token-identical to torch). Row layout matches
    :func:`greedy_decode`: ``[decoder_start, t1, ..., eos, pad...]``;
    finished rows emit pads.
    """
    init = _prime(model, params, encoder_hidden, encoder_mask, max_length,
                  True, temperature, top_k, top_p, min_length,
                  repetition_penalty, no_repeat_ngram_size, rng)
    body = _sequential_body(model, params, encoder_hidden, encoder_mask,
                            max_length, True, temperature, top_k, top_p,
                            min_length, repetition_penalty,
                            no_repeat_ngram_size, rng)

    def cond(carry):
        step, _, _, finished = carry
        return jnp.logical_and(step < max_length - 1,
                               jnp.logical_not(jnp.all(finished)))

    _, tokens, _, _ = jax.lax.while_loop(cond, body, init)
    return tokens


class StreamState(NamedTuple):
    """Resumable decode state for chunked / streaming generation.

    ``step`` counts tokens generated so far (sequence positions
    ``0..step`` of ``tokens`` are valid: decoder start + ``step`` chosen
    tokens); ``cache`` is the KV cache advanced through position ``step``;
    ``finished`` marks rows that already emitted eos. The whole tuple is
    an ordinary jit-transparent pytree of device arrays, so chunk calls
    chain without host round-trips for the state itself.
    """

    step: jax.Array
    tokens: jax.Array
    cache: Any
    finished: jax.Array


@partial(jax.jit, static_argnums=(0, 4, 5, 6, 7, 8, 9, 10, 11))
def stream_init(model: T5ForConditionalGeneration, params: Any,
                encoder_hidden: jax.Array,
                encoder_mask: Optional[jax.Array], max_length: int,
                do_sample: bool = False, temperature: float = 1.0,
                top_k: int = 0, top_p: float = 1.0, min_length: int = 0,
                repetition_penalty: float = 1.0,
                no_repeat_ngram_size: int = 0,
                rng: Optional[jax.Array] = None) -> StreamState:
    """Prime the cache and choose the first token; the returned state
    feeds :func:`stream_chunk`. Identical math to the first step of
    :func:`greedy_decode` / :func:`sample_decode` (same ``_prime``)."""
    return StreamState(*_prime(
        model, params, encoder_hidden, encoder_mask, max_length, do_sample,
        temperature, top_k, top_p, min_length, repetition_penalty,
        no_repeat_ngram_size, rng))


@partial(jax.jit, static_argnums=(0, 4, 5, 6, 7, 8, 9, 10, 11, 12))
def stream_chunk(model: T5ForConditionalGeneration, params: Any,
                 encoder_hidden: jax.Array,
                 encoder_mask: Optional[jax.Array], max_length: int,
                 chunk: int, do_sample: bool = False,
                 temperature: float = 1.0, top_k: int = 0,
                 top_p: float = 1.0, min_length: int = 0,
                 repetition_penalty: float = 1.0,
                 no_repeat_ngram_size: int = 0,
                 state: StreamState = None,
                 rng: Optional[jax.Array] = None) -> StreamState:
    """Advance a stream by up to ``chunk`` tokens (stops early when every
    row is finished or ``max_length`` is reached). Runs the SAME
    ``_sequential_body`` as the monolithic loops, so the concatenation of
    chunks is token-identical to a single :func:`greedy_decode` /
    :func:`sample_decode` call — the chunk size only sets how often the
    host can observe (and stream out) the partial sequences."""
    body = _sequential_body(model, params, encoder_hidden, encoder_mask,
                            max_length, do_sample, temperature, top_k,
                            top_p, min_length, repetition_penalty,
                            no_repeat_ngram_size, rng)
    limit = jnp.minimum(state.step + chunk, max_length - 1)

    def cond(carry):
        step, _, _, finished = carry
        return jnp.logical_and(step < limit,
                               jnp.logical_not(jnp.all(finished)))

    return StreamState(*jax.lax.while_loop(cond, body, tuple(state)))


def stream_decode(model: T5ForConditionalGeneration, params: Any,
                  encoder_hidden: jax.Array,
                  encoder_mask: Optional[jax.Array], max_length: int = 20,
                  chunk_size: int = 4, do_sample: bool = False,
                  temperature: float = 1.0, top_k: int = 0,
                  top_p: float = 1.0, rng: Optional[jax.Array] = None,
                  min_length: int = 0, repetition_penalty: float = 1.0,
                  no_repeat_ngram_size: int = 0):
    """Streaming generation: yields ``(tokens, n_valid, done)`` after the
    first token and then after every ``chunk_size`` further tokens —
    ``tokens`` a host (B, max_length) int array whose first ``n_valid``
    positions are decided, ``done`` True on the final yield. The final
    tokens are exactly :func:`greedy_decode` / :func:`sample_decode`'s
    output for the same inputs (pinned by ``tests/test_stream.py``).

    TPU-first trade: each yield costs one device->host token read (the
    KV cache itself never leaves the device), so ``chunk_size`` sets the
    time-to-first-token / dispatch-overhead trade — chunk 1 streams every
    token but pays a host round-trip per token; chunk 4-8 amortizes
    dispatch to a negligible fraction of step time. Greedy and sampling
    only: a beam's running-best hypothesis can be displaced at any step,
    so prefix streaming would mislead (HF streamers skip beams too).
    """
    if do_sample and rng is None:
        rng = jax.random.PRNGKey(0)
    if chunk_size < 1:
        raise ValueError(f"chunk_size must be >= 1, got {chunk_size}")
    state = stream_init(model, params, encoder_hidden, encoder_mask,
                        max_length, do_sample, temperature, top_k, top_p,
                        min_length, repetition_penalty,
                        no_repeat_ngram_size, rng)
    while True:
        # Launch-ahead: enqueue the NEXT chunk before reading this one's
        # tokens, so the device computes chunk k+1 while the host blocks
        # on chunk k's read (JAX dispatch is asynchronous). Speculation is
        # free at the end of the sequence: a chunk launched from a
        # finished/at-max-length state exits its while_loop immediately
        # (cond is false on entry), so the wasted work on the final yield
        # is one no-op program. At most one chunk of real device work is
        # wasted if the consumer abandons the generator mid-stream.
        next_state = stream_chunk(
            model, params, encoder_hidden, encoder_mask, max_length,
            chunk_size, do_sample, temperature, top_k, top_p, min_length,
            repetition_penalty, no_repeat_ngram_size, state, rng)
        # Host read of the token buffer = the only sync point per yield.
        tokens = np.asarray(state.tokens)
        step = int(state.step)
        done = step >= max_length - 1 or bool(np.asarray(
            state.finished).all())
        yield tokens, step + 1, done
        if done:
            return
        state = next_state


def generate(model: T5ForConditionalGeneration, params: Any,
             encoder_hidden: jax.Array, encoder_mask: Optional[jax.Array],
             max_length: int = 20, num_beams: int = 1,
             length_penalty: float = 1.0, do_sample: bool = False,
             temperature: float = 1.0, top_k: int = 0, top_p: float = 1.0,
             rng: Optional[jax.Array] = None, min_length: int = 0,
             repetition_penalty: float = 1.0,
             no_repeat_ngram_size: int = 0,
             speculative_draft: int = 0) -> jax.Array:
    """HF-default-compatible entry: greedy when ``num_beams == 1`` and
    ``do_sample=False`` (the reference's path), beam search for
    ``num_beams > 1``, ancestral sampling for ``do_sample=True`` (HF
    raises on sampled beam search with a ValueError; we match).

    ``min_length`` / ``repetition_penalty`` / ``no_repeat_ngram_size``
    reproduce HF's logits-processor chain in HF's order and placement
    (raw logits for greedy/sampling, log-probs for beam search); see
    :func:`process_logits`.

    ``speculative_draft > 0`` opts the plain-greedy path (no sampling,
    beams, or processors) into prompt-lookup speculative decoding
    (``infer/speculative.py``; token-identical, fewer decoder passes when
    drafts accept). Non-greedy configs ignore it and take their normal
    loops."""
    if do_sample:
        if num_beams > 1:
            raise ValueError("beam-search sampling is not supported; use "
                             "num_beams=1 with do_sample=True")
        if rng is None:
            rng = jax.random.PRNGKey(0)
        return sample_decode(model, params, encoder_hidden, encoder_mask,
                             max_length, rng, temperature, top_k, top_p,
                             min_length, repetition_penalty,
                             no_repeat_ngram_size)
    if num_beams <= 1:
        if (speculative_draft > 0 and min_length == 0
                and repetition_penalty == 1.0
                and no_repeat_ngram_size == 0):
            from .speculative import speculative_greedy_decode

            return speculative_greedy_decode(model, params, encoder_hidden,
                                             encoder_mask, max_length,
                                             draft_len=speculative_draft)
        return greedy_decode(model, params, encoder_hidden, encoder_mask,
                             max_length, min_length, repetition_penalty,
                             no_repeat_ngram_size)
    return beam_search_decode(model, params, encoder_hidden, encoder_mask,
                              max_length, num_beams, length_penalty,
                              min_length, repetition_penalty,
                              no_repeat_ngram_size)
