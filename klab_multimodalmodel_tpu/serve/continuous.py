"""Continuous-batching caption serving (the vLLM/JetStream scheduling model
on the slot engine of ``infer/engine.py``).

``CaptionService``'s dynamic batcher dispatches whole requests together: a
request that arrives while a batch decodes waits for that batch's full
~20-step loop, and a batch whose rows finish early still pays every step at
full width. :class:`ContinuousCaptionService` instead keeps ONE resident
decode batch on the device; requests join a free slot at the next chunk
boundary and leave the moment they emit eos — under load the decode batch
stays full and admission latency is bounded by ``chunk`` steps, not by
``max_length``.

Scope: the engine decodes the reference's generation config (greedy,
default processor chain) and, when configured with ``engine_do_sample``,
sampled requests whose warper config matches the engine's. Everything else
— beams, mismatched sampling configs, penalties, prompts wider than the
engine width, max_length beyond the engine buffer — transparently falls
back to the inherited dynamic-batcher path, so the public API is unchanged.
"""

from __future__ import annotations

import collections
import os
import threading
import time
from typing import Any, Optional

import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.datasets import COCO_PROMPT, load_image_bytes_resized
from ..infer.engine import DecodeEngine
from ..text.tokenizer import TokenizerBase
from ..utils.bucketing import pow2_bucket_width
from .batcher import BatchStats
from .service import CaptionService, GenParams, pow2_batch

_ADMIT_IDLE_WAIT_S = 0.050  # idle scheduler wakeup bound (cv-notified)


class _EngineRequest:
    __slots__ = ("image", "src_ids", "src_mask", "max_length", "seed",
                 "event", "result", "error", "t_enqueue", "abandoned")

    def __init__(self, image: np.ndarray, src_ids: np.ndarray,
                 src_mask: np.ndarray, max_length: int,
                 seed: Optional[int] = None):
        self.image = image
        self.src_ids = src_ids
        self.src_mask = src_mask
        self.max_length = max_length
        self.seed = seed
        self.event = threading.Event()
        self.result: Any = None
        self.error: Optional[BaseException] = None
        self.t_enqueue = time.perf_counter()
        self.abandoned = False


class EngineScheduler:
    """Owns a :class:`DecodeEngine` and its single scheduler thread.

    The thread loops admit -> prefill -> insert -> tick -> reap; all device
    calls for the engine happen on it. ``submit`` blocks the request thread
    until its row is reaped (detokenization happens back on the request
    thread, so host work parallelizes across HTTP threads).
    """

    def __init__(self, captioner, text_width: int, slots: int = 16,
                 chunk: int = 4, max_prefill: int = 8,
                 max_length: int = 20, do_sample: bool = False,
                 temperature: float = 1.0, top_k: int = 0,
                 top_p: float = 1.0):
        self.captioner = captioner
        self.text_width = text_width
        self.slots = slots
        self.chunk = chunk
        self.max_prefill = max_prefill
        self.max_length = max_length
        # Engine-wide sampling config (one compiled tick); each request
        # still samples from its OWN rng stream via a per-slot key.
        self.sample = (do_sample, temperature, top_k, top_p)
        self._seed_counter = 0
        # Mixed into AUTO-assigned seeds only: without it a restarted
        # service replays identical sampled captions for an identical
        # request order (the counter restarts at 1). Explicit user seeds
        # stay pure so seeded requests remain reproducible across runs.
        self._seed_nonce = int.from_bytes(os.urandom(4), "little")
        self._lock = threading.Lock()
        self.stats = BatchStats(lock=self._lock)
        self._cv = threading.Condition(self._lock)
        self._queue: collections.deque[_EngineRequest] = collections.deque()
        self._closed = False
        self._engine: Optional[DecodeEngine] = None
        self._thread = threading.Thread(target=self._loop,
                                        name="klab-serve-engine",
                                        daemon=True)
        self._thread.start()

    # -- request side --------------------------------------------------------
    def submit(self, image: np.ndarray, src_ids: np.ndarray,
               src_mask: np.ndarray, max_length: int,
               timeout: Optional[float],
               seed: Optional[int] = None) -> tuple[np.ndarray, int]:
        """Returns (token_row, n_valid); raises on timeout/engine failure.
        ``seed`` keys a sampling engine's per-request draw stream (a fresh
        one is assigned when omitted); greedy engines ignore it."""
        req = _EngineRequest(image, src_ids, src_mask, max_length, seed)
        with self._cv:
            if self._closed:
                raise RuntimeError("scheduler is closed")
            if req.seed is None:
                self._seed_counter += 1
                req.seed = (self._seed_counter
                            + self._seed_nonce) % (1 << 32)
            else:
                # np.uint32 would wrap negative / oversized seeds silently
                # — two "different" seeds could alias; reject instead.
                req.seed = int(req.seed)
                if not 0 <= req.seed < (1 << 32):
                    raise ValueError(
                        f"seed must be in [0, 2**32), got {req.seed}")
            self.stats.requests += 1
            self._queue.append(req)
            self._cv.notify()
        if not req.event.wait(timeout):
            with self._lock:
                req.abandoned = True
            raise TimeoutError("request timed out waiting for a decode slot")
        if req.error is not None:
            raise req.error
        return req.result

    def warmup(self) -> None:
        """Build the engine and compile every prefill bucket + the tick
        before traffic arrives (one dummy request per bucket, run to reap).
        Runs on the caller's thread via the scheduler (submit), so device
        calls stay on the scheduler thread."""
        self._ensure_engine()
        size = self.captioner.config.swin.image_size
        dummy = np.zeros((size, size, 3), np.uint8)
        ids = np.zeros((1, self.text_width), np.int32)
        mask = np.ones((1, self.text_width), np.int32)
        b = 1
        while True:
            reqs = [(_EngineRequest(dummy, ids, mask, self.max_length))
                    for _ in range(b)]
            with self._cv:
                for r in reqs:
                    self._queue.append(r)
                self._cv.notify()
            for r in reqs:
                if not r.event.wait(300):
                    raise RuntimeError("engine warmup timed out")
                if r.error is not None:
                    raise r.error
            if b >= min(self.max_prefill, self.slots):
                break
            b *= 2
        # Warmup shouldn't count in serving stats.
        with self._lock:
            self.stats.requests = 0
            self.stats.batches = 0
            self.stats.rows = 0
            self.stats.latencies_ms.clear()

    def close(self) -> None:
        with self._cv:
            self._closed = True
            self._cv.notify()
        self._thread.join(timeout=30)

    # -- scheduler thread ------------------------------------------------------
    def _ensure_engine(self) -> None:
        """Build the engine lazily (scheduler thread only — no lock: the
        shared ``_lock`` also guards /stats, and engine construction pays
        an XLA compile)."""
        if self._engine is not None:
            return
        cap = self.captioner
        size = cap.config.swin.image_size
        dummy = np.zeros((1, size, size, 3), np.uint8)
        ids = np.zeros((1, self.text_width), np.int32)
        mask = np.ones((1, self.text_width), np.int32)
        # The engine's source width is the CONCATENATED encoder length
        # (image patch tokens + text tokens) — discover it, plus the
        # activation dtype, from one dummy encode.
        enc, _ = cap.encode_tokens(dummy, ids, mask)
        ds, t, k, p = self.sample
        self._engine = DecodeEngine(
            cap.model.transformer_module(), cap._decode_params,
            slots=self.slots, source_width=enc.shape[1],
            d_model=enc.shape[2], max_length=self.max_length,
            chunk=self.chunk, enc_dtype=enc.dtype, do_sample=ds,
            temperature=t, top_k=k, top_p=p)

    def _take_admission(self) -> list[_EngineRequest]:
        """Pop up to min(free slots, max_prefill) live requests."""
        out: list[_EngineRequest] = []
        cap = min(self._engine.free_slots(), self.max_prefill)
        with self._lock:
            while self._queue and len(out) < cap:
                req = self._queue.popleft()
                if req.abandoned:
                    self.stats.abandoned += 1
                    continue
                out.append(req)
        return out

    def _admit(self, reqs: list[_EngineRequest]) -> None:
        """Encode a pow2-padded arrival batch and insert the real rows."""
        n = len(reqs)
        bucket = pow2_batch(n, self.max_prefill)
        images = np.stack([r.image for r in reqs], axis=0)
        ids = np.concatenate([r.src_ids for r in reqs], axis=0)
        mask = np.concatenate([r.src_mask for r in reqs], axis=0)
        if bucket > n:
            pad = bucket - n
            images = np.concatenate(
                [images, np.broadcast_to(images[:1],
                                         (pad,) + images.shape[1:])], axis=0)
            ids = np.concatenate(
                [ids, np.broadcast_to(ids[:1], (pad,) + ids.shape[1:])],
                axis=0)
            mask = np.concatenate(
                [mask, np.broadcast_to(mask[:1], (pad,) + mask.shape[1:])],
                axis=0)
        enc, emask = self.captioner.encode_tokens(images, ids, mask)
        keys = None
        if self.sample[0]:
            import jax

            seeds = [req.seed or 0 for req in reqs]
            seeds += [0] * (bucket - n)  # pad rows: never inserted
            keys = jax.vmap(jax.random.key)(np.asarray(seeds, np.uint32))
        pre = self._engine.prefill(enc, emask, rngs=keys)
        for j, req in enumerate(reqs):
            self._engine.insert(pre, enc, emask, j, tag=req,
                                max_length=req.max_length,
                                rng=None if keys is None else keys[j])
        with self._lock:
            self.stats.batches += 1
            self.stats.rows += n

    def _fail_all_active(self, error: BaseException) -> None:
        """Engine-step failure: fail every in-flight request, free slots."""
        engine = self._engine
        for slot in np.flatnonzero(engine.active):
            req = engine._tags[int(slot)]
            engine.active[int(slot)] = False
            engine._tags[int(slot)] = None
            if req is not None:
                req.error = error
                req.event.set()
        with self._lock:
            self.stats.errors += 1

    def _loop(self) -> None:
        while True:
            with self._cv:
                while (not self._queue
                       and (self._engine is None
                            or not self._engine.has_live())
                       and not self._closed):
                    self._cv.wait(_ADMIT_IDLE_WAIT_S)
                if self._closed:
                    for req in self._queue:
                        req.error = RuntimeError("scheduler closed")
                        req.event.set()
                    self._queue.clear()
                    closing = True
                else:
                    closing = False
                has_queue = bool(self._queue)
            if closing:
                # Fail in-flight rows too — close() must not orphan them.
                if self._engine is not None and self._engine.has_live():
                    self._fail_all_active(RuntimeError("scheduler closed"))
                return
            if has_queue:
                self._ensure_engine()
            # Dispatch the tick FIRST (async — returns at enqueue, with the
            # packed reap flags already copying to the host), then do this
            # boundary's admissions while the device computes and the flag
            # transfer rides the tunnel, then block on reap. On a tunneled
            # device the flag read is a full RTT; overlapping it with the
            # admission encodes is most of the engine's loaded throughput.
            ticked = self._engine is not None and self._engine.has_live()
            if ticked:
                try:
                    self._engine.tick()
                except BaseException as e:  # noqa: BLE001 — keep serving
                    self._fail_all_active(e)
                    continue
            # Admit as long as there are free slots and queued arrivals.
            # (Slots freed by this boundary's reap are seen next loop.)
            while True:
                reqs = self._take_admission() if self._engine else []
                if not reqs:
                    break
                try:
                    self._admit(reqs)
                except BaseException as e:  # noqa: BLE001 — fail batch, keep serving
                    for req in reqs:
                        req.error = e
                        req.event.set()
                    with self._lock:
                        self.stats.errors += len(reqs)
                if self._engine.free_slots() == 0:
                    break
            if not ticked:
                continue
            try:
                reaped = self._engine.reap()
            except BaseException as e:  # noqa: BLE001 — fail in-flight, keep serving
                self._fail_all_active(e)
                continue
            done = time.perf_counter()
            for req, row, n_valid in reaped:
                req.result = (row, n_valid)
                with self._lock:
                    self.stats.latencies_ms.append(
                        (done - req.t_enqueue) * 1000.0)
                req.event.set()


class _MergedStats:
    """``/stats`` view over the engine scheduler + the fallback batcher."""

    def __init__(self, engine_stats: BatchStats, fallback_stats: BatchStats,
                 scheduler: EngineScheduler):
        self._engine = engine_stats
        self._fallback = fallback_stats
        self._scheduler = scheduler

    def snapshot(self) -> dict:
        snap = self._engine.snapshot()
        eng = self._scheduler._engine
        snap["engine_slots"] = self._scheduler.slots
        snap["engine_slots_live"] = (int(eng.active.sum())
                                     if eng is not None else 0)
        snap["fallback"] = self._fallback.snapshot()
        return snap


class ContinuousCaptionService(CaptionService):
    """:class:`CaptionService` with continuous batching for the greedy
    default-chain path (`klab-serve --continuous`).

    Requests the engine can't serve — beams, sampling configs other than
    the engine's own, processor chains, prompts wider than ``text_width``,
    ``max_length`` past the engine buffer — fall back to the inherited
    dynamic batcher, so every CaptionService behavior (including
    /caption_stream) keeps working.
    """

    def __init__(self, config: Config, params: Any,
                 tokenizer: TokenizerBase, max_batch: int = 8,
                 window_ms: float = 5.0, decode_int8: bool = False,
                 max_gen_length: int = 128, stream_chunk: int = 4,
                 device=None, slots: int = 16, engine_chunk: int = 4,
                 max_prefill: int = 8,
                 engine_text_width: Optional[int] = None,
                 engine_do_sample: bool = False,
                 engine_temperature: float = 1.0, engine_top_k: int = 0,
                 engine_top_p: float = 1.0):
        super().__init__(config, params, tokenizer, max_batch=max_batch,
                         window_ms=window_ms, decode_int8=decode_int8,
                         max_gen_length=max_gen_length,
                         stream_chunk=stream_chunk, device=device)
        if engine_text_width is None:
            # Default: the pow2 bucket of the default COCO prompt (the
            # same width policy as Captioner.bucket_source), capped at
            # max_source_length.
            enc = tokenizer([COCO_PROMPT],
                            max_length=config.max_source_length)
            m = np.asarray(enc.attention_mask)
            engine_text_width = pow2_bucket_width(m, 16)
        self.engine_text_width = int(engine_text_width)
        self._scheduler = EngineScheduler(
            self.captioner, text_width=self.engine_text_width, slots=slots,
            chunk=engine_chunk, max_prefill=max_prefill,
            max_length=config.generate_max_length,
            do_sample=engine_do_sample, temperature=engine_temperature,
            top_k=engine_top_k, top_p=engine_top_p)
        self._stats_view = _MergedStats(self._scheduler.stats,
                                        self._batcher.stats,
                                        self._scheduler)

    @property
    def stats(self):
        return self._stats_view

    def _engine_eligible(self, gen: GenParams) -> bool:
        # Sampling routes to the engine only when the request's warper
        # config matches the engine's compiled tick (do_sample and the
        # temperature/top_k/top_p triple are engine-wide statics; the rng
        # stream is per-request either way).
        ds, t, k, p = self._scheduler.sample
        sample_ok = (gen.do_sample == ds
                     and (not ds or (gen.temperature, gen.top_k,
                                     gen.top_p) == (t, k, p)))
        return (gen.num_beams == 1 and sample_ok
                and gen.min_length == 0 and gen.repetition_penalty == 1.0
                and gen.no_repeat_ngram_size == 0
                and 2 <= gen.max_length <= self._scheduler.max_length)

    def _tokenize_for_engine(self, prompt: str):
        """(ids, mask, fits): tokenize at full length, then check the real
        tokens fit the engine's fixed text width (only pad columns are
        trimmed — truncation semantics never change)."""
        enc = self.tokenizer([prompt],
                             max_length=self.config.max_source_length)
        ids = np.asarray(enc.input_ids)
        mask = np.asarray(enc.attention_mask)
        w = self.engine_text_width
        if mask.shape[1] > w and mask[:, w:].any():
            return ids, mask, False
        if ids.shape[1] >= w:
            return ids[:, :w], mask[:, :w], True
        pad = w - ids.shape[1]
        ids = np.pad(ids, ((0, 0), (0, pad)))
        mask = np.pad(mask, ((0, 0), (0, pad)))
        return ids, mask, True

    def caption_bytes(self, image_bytes: bytes,
                      prompt: Optional[str] = None,
                      gen: Optional[GenParams] = None,
                      timeout: Optional[float] = 120.0) -> str:
        from .service import normalize_gen_params

        g = normalize_gen_params(gen or self.default_params,
                                 self.max_gen_length)
        if self._engine_eligible(g):
            ids, mask, fits = self._tokenize_for_engine(
                prompt or COCO_PROMPT)
            if fits:
                image = load_image_bytes_resized(
                    image_bytes, self.config.swin.image_size)
                row, n_valid = self._scheduler.submit(
                    image, ids, mask, g.max_length, timeout)
                return self.tokenizer.batch_decode(
                    row[None, :n_valid], skip_special_tokens=True)[0]
        return super().caption_bytes(image_bytes, prompt=prompt, gen=g,
                                     timeout=timeout)

    def warmup(self) -> list[int]:
        buckets = super().warmup()
        self._scheduler.warmup()
        return buckets

    def close(self) -> None:
        self._scheduler.close()
        super().close()
