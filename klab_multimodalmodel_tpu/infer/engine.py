"""Continuous-batching decode engine (slot-based, JetStream-style).

The serving batchers in ``serve/batcher.py`` dispatch whole requests
together: a request arriving while a batch decodes waits for that batch's
full ~``max_length``-step loop. This engine removes that wait the TPU-native
way — ONE resident decode batch of ``slots`` rows stays on the device, every
row at its own position (per-row ``cache_index`` leaves + per-row
relative-position bias rows, ``models/t5.py:decode_step``), and requests
join/leave at chunk boundaries:

  * ``prefill``  — ``generate.stream_init`` on the encoder output (the same
    math as step 0/1 of ``greedy_decode``), batched over arrivals;
  * ``insert``   — a jitted pytree write of prefill row ``j`` into slot
    ``i`` of the resident state (one dynamic-update-slice per cache leaf
    on the batch axis — the KV cache is data, not control flow);
  * ``tick``     — a jitted ``lax.while_loop`` advancing every live row by
    up to ``chunk`` tokens (inert rows ride along masked: token writes are
    write-backs, their clamped cache writes land in rows whose outputs are
    never read);
  * ``reap``     — rows that emitted eos or hit ``max_length`` free their
    slot at the next chunk boundary.

Token-exactness: a row's decode is bit-identical to ``greedy_decode`` on
the same encoder rows — same ``_select_next`` chain, same cache writes at
the same positions; other slots never enter its attention (each row attends
only its own cache row). ``tests/test_engine.py`` pins interleaved-arrival
parity against per-request ``greedy_decode``.

Greedy by default (the reference's generation config). Sampling is
supported engine-wide (``do_sample`` + warper config) with a PER-REQUEST
rng stream: each slot carries its request's key and draws at its own
absolute step (the same fold-in ``stream_chunk`` uses), so a sampled row
bit-matches a B=1 ``sample_decode`` with that key regardless of which
slots it shared ticks with. Beam search needs per-row widths and routes to
the dynamic batcher instead (``serve/``).
"""

from __future__ import annotations

import threading
from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.t5 import T5ForConditionalGeneration
from .generate import (StreamState, _broadcast_cache_index, _select_next,
                       _step, stream_init)


def _as_typed_keys(rngs: jax.Array) -> jax.Array:
    """Normalize sampling keys to new-style typed key arrays.

    ``EngineState.rngs`` stores typed keys (``jax.random.key``); a caller
    passing legacy ``(2,)``-uint32 PRNGKeys (or a ``(W, 2)`` batch) to
    ``prefill``/``insert`` would otherwise hit an opaque dtype/shape
    mismatch inside ``_engine_insert``'s dynamic_update_slice.
    ``wrap_key_data`` preserves the raw threefry words, so legacy and
    typed callers draw identical token streams (``_select_next`` folds
    the same bits either way).
    """
    rngs = jnp.asarray(rngs)
    if jnp.issubdtype(rngs.dtype, jax.dtypes.prng_key):
        return rngs
    if rngs.dtype != jnp.uint32 or rngs.shape[-1:] != (2,):
        raise ValueError(
            "sampling keys must be typed jax.random.key arrays or "
            f"old-style (..., 2) uint32 PRNGKeys; got dtype={rngs.dtype} "
            f"shape={rngs.shape}")
    return jax.random.wrap_key_data(rngs)


class EngineState(NamedTuple):
    """Resident device state of the continuous decode batch.

    ``steps[i]`` counts tokens generated so far in slot ``i`` (positions
    ``0..steps[i]`` of ``tokens[i]`` are valid); ``cache`` carries per-row
    ``cache_index`` leaves of shape (layers, slots) instead of the scalar
    (layers,) of the monolithic loops; ``enc``/``enc_mask`` are the
    per-slot encoder context the cross-attention cache was built from
    (kept resident so inserts are row writes, not re-encodes).
    """

    steps: jax.Array       # (S,) int32
    tokens: jax.Array      # (S, max_length) int32
    cache: Any             # pytree; batch axis 1 under the stacked layer axis
    finished: jax.Array    # (S,) bool — row emitted eos
    enc: jax.Array         # (S, W, d_model)
    enc_mask: jax.Array    # (S, W) int32
    rngs: jax.Array        # (S,) typed PRNG keys — per-request sampling
    #                        streams (inert under greedy decoding)


@partial(jax.jit, static_argnums=(0, 3, 4, 7, 8, 9, 10, 11, 12, 13),
         donate_argnums=(2,))
def _engine_tick(model: T5ForConditionalGeneration, params: Any,
                 state: EngineState, max_length: int, chunk: int,
                 active: jax.Array, row_max: jax.Array, min_length: int = 0,
                 repetition_penalty: float = 1.0,
                 no_repeat_ngram_size: int = 0, do_sample: bool = False,
                 temperature: float = 1.0, top_k: int = 0,
                 top_p: float = 1.0) -> tuple[EngineState, jax.Array]:
    """Advance every live row by up to ``chunk`` greedy tokens.

    ``active`` (S,) marks occupied slots (host-managed); ``row_max`` (S,)
    is each request's own max_length (<= the engine buffer ``max_length``).
    A row is *running* while active, unfinished, and below its
    ``row_max - 1``. Non-running rows still flow through the batched step
    (no dynamic shapes) but their token writes are write-backs and their
    outputs are never reaped.

    Returns ``(state, flags)`` where ``flags`` is a (2, S) int32 pack of
    (steps, finished): the host decides which rows to reap from ONE small
    transfer instead of one per leaf — on a network-tunneled device each
    device->host read costs a full RTT (~20 ms measured), and reap runs
    every chunk boundary, so the fetch count IS the serving latency.
    """
    size = model.size
    S, L = state.tokens.shape

    def running_of(steps, finished):
        return jnp.logical_and(
            active, jnp.logical_and(~finished, steps < row_max - 1))

    def body(carry):
        n, steps, tokens, cache, finished = carry
        running = running_of(steps, finished)
        cur = jnp.take_along_axis(tokens, steps[:, None], axis=1)  # (S, 1)
        logits, cache = _step(model, params, cache, cur, steps,
                              state.enc, state.enc_mask, max_length)
        nxt = _select_next(logits, tokens, steps, size, ~running,
                           do_sample, temperature, top_k, top_p,
                           min_length, repetition_penalty,
                           no_repeat_ngram_size,
                           state.rngs if do_sample else None)
        # Write at steps+1 for running rows; inert rows write their old
        # value back (put_along_axis always writes, so this is the mask).
        pos = jnp.clip(steps + 1, 0, L - 1)[:, None]               # (S, 1)
        old = jnp.take_along_axis(tokens, pos, axis=1)[:, 0]
        val = jnp.where(running, nxt, old)
        tokens = jnp.put_along_axis(tokens, pos, val[:, None], axis=1,
                                    inplace=False)
        finished = jnp.logical_or(
            finished, jnp.logical_and(running, nxt == size.eos_token_id))
        steps = steps + running.astype(jnp.int32)
        return n + 1, steps, tokens, cache, finished

    def cond(carry):
        n, steps, _, _, finished = carry
        return jnp.logical_and(n < chunk,
                               jnp.any(running_of(steps, finished)))

    init = (jnp.asarray(0, jnp.int32), state.steps, state.tokens,
            state.cache, state.finished)
    _, steps, tokens, cache, finished = jax.lax.while_loop(cond, body, init)
    flags = jnp.stack([steps, finished.astype(jnp.int32)], axis=0)
    return EngineState(steps, tokens, cache, finished, state.enc,
                       state.enc_mask, state.rngs), flags


@partial(jax.jit, donate_argnums=(0,))
def _engine_insert(state: EngineState, pre: StreamState, enc: jax.Array,
                   enc_mask: jax.Array, j: jax.Array,
                   slot: jax.Array, rng: jax.Array) -> EngineState:
    """Write prefill row ``j`` (of a W-row ``stream_init`` batch) into
    engine slot ``slot``: one dynamic-update-slice per leaf on the batch
    axis. ``enc``/``enc_mask`` must already be at the engine's source
    width (the cross-attention cache inside ``pre`` was built from them).
    """

    def cache_insert(e, p):
        if p.ndim == e.ndim:
            # K/V leaves: engine (layers, S, ...) <- prefill (layers, W, ...)
            row = jax.lax.dynamic_slice_in_dim(p, j, 1, axis=1)
            return jax.lax.dynamic_update_slice_in_dim(e, row, slot, axis=1)
        # cache_index: engine (layers, S) <- prefill (layers,) — every
        # prefill row sits at the same position (the prompt length).
        return jax.lax.dynamic_update_slice_in_dim(
            e, p[:, None], slot, axis=1)

    def row_insert(e, p):
        row = jax.lax.dynamic_slice_in_dim(p, j, 1, axis=0)
        return jax.lax.dynamic_update_slice_in_dim(e, row, slot, axis=0)

    cache = jax.tree.map(cache_insert, state.cache, pre.cache)
    tokens = row_insert(state.tokens, pre.tokens)
    steps = jax.lax.dynamic_update_slice_in_dim(
        state.steps, jnp.broadcast_to(pre.step, (1,)).astype(jnp.int32),
        slot, axis=0)
    finished = jax.lax.dynamic_update_slice_in_dim(
        state.finished, jax.lax.dynamic_slice_in_dim(pre.finished, j, 1),
        slot, axis=0)
    enc_new = row_insert(state.enc, enc.astype(state.enc.dtype))
    mask_new = row_insert(state.enc_mask,
                          enc_mask.astype(state.enc_mask.dtype))
    rngs = jax.lax.dynamic_update_slice_in_dim(
        state.rngs, rng[None], slot, axis=0)
    return EngineState(steps, tokens, cache, finished, enc_new, mask_new,
                       rngs)


class DecodeEngine:
    """Host-side slot manager over the jitted tick/insert/prefill.

    Single-owner: one thread drives ``submit``/``run_pending``; the serving
    scheduler (``serve/continuous.py``) wraps it behind a queue. All device
    programs have static shapes — ``slots``, ``max_length``, the engine
    source width, and the pow2 prefill-batch buckets bound the compiled-
    program set.
    """

    def __init__(self, model: T5ForConditionalGeneration, params: Any,
                 slots: int, source_width: int, d_model: int,
                 max_length: int, chunk: int = 4,
                 enc_dtype=jnp.float32, min_length: int = 0,
                 repetition_penalty: float = 1.0,
                 no_repeat_ngram_size: int = 0, do_sample: bool = False,
                 temperature: float = 1.0, top_k: int = 0,
                 top_p: float = 1.0):
        if chunk < 1:
            raise ValueError(f"chunk must be >= 1, got {chunk}")
        self.model = model
        self.params = params
        self.slots = slots
        self.source_width = source_width
        self.max_length = max_length
        self.chunk = chunk
        self.gen = (min_length, repetition_penalty, no_repeat_ngram_size)
        # Sampling config is engine-wide (one compiled tick); the RNG
        # STREAM is per-request — each slot carries its request's key and
        # draws at its own absolute step, so a sampled row bit-matches a
        # B=1 sample_decode/stream run with that key (test_engine.py).
        self.sample = (do_sample, temperature, top_k, top_p)
        size = model.size
        # Build the resident state by priming a zero batch: same structure
        # as a real prefill, with the index leaves widened to per-row.
        # Ones mask for the empty slots: an all-masked cross-attention row
        # softmaxes over all -inf -> NaN; NaNs in dead rows are never read
        # but would trip --debug_nans, so keep empty rows finite.
        enc0 = jnp.zeros((slots, source_width, d_model), enc_dtype)
        mask0 = jnp.ones((slots, source_width), jnp.int32)
        pre = stream_init(model, params, enc0, mask0, max_length)
        self.state = EngineState(
            steps=jnp.zeros((slots,), jnp.int32),
            tokens=jnp.full((slots, max_length), size.pad_token_id,
                            jnp.int32),
            cache=_broadcast_cache_index(pre.cache, slots),
            finished=jnp.zeros((slots,), bool),
            enc=enc0, enc_mask=mask0,
            rngs=jax.random.split(jax.random.key(0), slots))
        self.active = np.zeros((slots,), bool)
        # Per-slot request max_length (<= the engine buffer max_length).
        self.row_max = np.full((slots,), max_length, np.int32)
        # slot -> opaque request tag (set by submit, returned by reap).
        self._tags: list[Any] = [None] * slots
        # (flags array, active snapshot) from the last tick — reap reads
        # these instead of the state leaves (one fetch, see _engine_tick).
        self._flags: Optional[jax.Array] = None
        self._flags_active: Optional[np.ndarray] = None

    # -- slot management ---------------------------------------------------
    def free_slots(self) -> int:
        return int((~self.active).sum())

    def has_live(self) -> bool:
        return bool(self.active.any())

    def prefill(self, enc: jax.Array, enc_mask: jax.Array,
                rngs: Optional[jax.Array] = None) -> StreamState:
        """Prime a W-row arrival batch (encoder outputs at the engine
        source width) — positions 0 (decoder start) and 1 filled. A
        sampling engine needs ``rngs``: (W,) per-arrival keys so token 1
        is drawn from each request's own stream."""
        if enc.shape[1] != self.source_width:
            raise ValueError(
                f"prefill width {enc.shape[1]} != engine source width "
                f"{self.source_width}")
        ml, rp, nr = self.gen
        ds, t, k, p = self.sample
        if ds and rngs is None:
            raise ValueError("sampling engine: prefill requires per-"
                             "arrival rngs keys")
        return stream_init(self.model, self.params, enc, enc_mask,
                           self.max_length, ds, t, k, p, ml, rp, nr,
                           _as_typed_keys(rngs) if ds else None)

    def insert(self, pre: StreamState, enc: jax.Array, enc_mask: jax.Array,
               j: int, tag: Any, max_length: Optional[int] = None,
               rng: Optional[jax.Array] = None) -> int:
        """Insert prefill row ``j`` into a free slot; returns the slot.
        ``rng`` is the request's sampling key (the same key its prefill
        row was drawn with); ignored by greedy engines."""
        free = np.flatnonzero(~self.active)
        if free.size == 0:
            raise RuntimeError("no free slot")
        m = self.max_length if max_length is None else int(max_length)
        if not 1 <= m <= self.max_length:
            raise ValueError(f"max_length must be in [1, {self.max_length}]"
                             f", got {m}")
        slot = int(free[0])
        self.state = _engine_insert(self.state, pre, enc, enc_mask,
                                    jnp.asarray(j, jnp.int32),
                                    jnp.asarray(slot, jnp.int32),
                                    jax.random.key(0) if rng is None
                                    else _as_typed_keys(rng))
        self.active[slot] = True
        self.row_max[slot] = m
        self._tags[slot] = tag
        # Any flags from the last tick describe the slot's PREVIOUS
        # occupant; drop the slot from that snapshot so a reap() before
        # the next tick can't free the new request on stale (steps,
        # finished) values.
        if self._flags_active is not None:
            self._flags_active[slot] = False
        return slot

    def tick(self) -> None:
        """Advance all live rows by up to ``chunk`` tokens (device work).

        Dispatch is async: this returns once the program is enqueued, and
        the packed reap flags start copying to the host immediately — the
        caller can do admission/encode work while both are in flight.
        """
        ml, rp, nr = self.gen
        ds, t, k, p = self.sample
        self.state, flags = _engine_tick(
            self.model, self.params, self.state, self.max_length,
            self.chunk, jnp.asarray(self.active),
            jnp.asarray(self.row_max), ml, rp, nr, ds, t, k, p)
        flags.copy_to_host_async()
        self._flags = flags
        # Reap must only trust flag rows for slots that were live at
        # dispatch: a slot admitted AFTER this tick carries stale flags
        # (its row in `flags` is whatever the previous occupant left).
        self._flags_active = self.active.copy()

    def reap(self) -> list[tuple[Any, np.ndarray, int]]:
        """Collect finished rows: [(tag, token_row, n_valid)]; frees slots.

        One host sync for the packed (steps, finished) flags; the token
        buffer is only fetched when some row actually completed (each
        device->host read is a tunnel RTT — see _engine_tick).
        """
        if not self.active.any():
            return []
        if self._flags is not None:
            f = np.asarray(self._flags)
            live = self._flags_active
        else:  # no tick since the last insert — pack on device, one fetch
            f = np.asarray(jnp.stack(
                [self.state.steps, self.state.finished.astype(jnp.int32)],
                axis=0))
            live = self.active
        steps, finished = f[0], f[1].astype(bool)
        done = live & self.active & (finished | (steps >= self.row_max - 1))
        if not done.any():
            return []
        tokens = np.asarray(self.state.tokens)
        out = []
        for slot in np.flatnonzero(done):
            slot = int(slot)
            out.append((self._tags[slot], tokens[slot].copy(),
                        int(steps[slot]) + 1))
            self.active[slot] = False
            self._tags[slot] = None
        return out
