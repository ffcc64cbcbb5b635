"""Scale-out serving: one single-chip replica per device, least-loaded
routing.

The TPU-idiomatic shape for serving a model that fits one chip is NOT to
shard it (batch-1 decode gains nothing from tensor parallelism at these
sizes — the per-step collectives would add ICI latency to every token) but
to run N independent replicas, one per chip, each with its own dynamic
batcher, and route requests to the least-loaded replica. Throughput then
scales ~linearly with chips while per-request latency stays at the
single-chip number.

Mechanics: every replica's params are committed to its device
(``jax.device_put`` in ``infer/captioner.py``) and each request's inputs
commit to the same device, so jit executes each replica's programs on its
own chip with zero cross-chip traffic. Each replica keeps its own
device-owning dispatcher thread (``DynamicBatcher``); the router only
picks a replica — batching, pipelining, and streaming all happen inside
the replica exactly as in the single-chip service.

No reference analogue (``/root/reference`` serves nothing); this is the
framework's production scale-out surface, routed through the same HTTP
front-end (``klab-serve --replicas N``).
"""

from __future__ import annotations

import threading
from typing import Any, Optional, Sequence

from ..config import Config
from ..text.tokenizer import TokenizerBase
from .service import CaptionService, GenParams


class _AggregateStats:
    """Duck-types the ``stats.snapshot()`` surface the HTTP layer reads:
    sums counters across replicas and nests each replica's snapshot."""

    def __init__(self, replicas: Sequence[CaptionService]):
        self._replicas = replicas

    def snapshot(self) -> dict:
        per = [r.stats.snapshot() for r in self._replicas]
        out = {"replicas": len(per)}
        for key in ("requests", "batches", "calls", "errors", "abandoned"):
            out[key] = sum(p[key] for p in per)
        out["per_replica"] = per
        return out


class ReplicatedCaptionService:
    """N per-device :class:`CaptionService` replicas behind a least-loaded
    router. Exposes the same surface the HTTP front-end consumes
    (``caption_bytes`` / ``caption_stream_bytes`` / ``stats`` /
    ``default_params`` / ``max_gen_length`` / ``warmup`` / ``close``), so
    ``CaptionHTTPServer`` serves either interchangeably.
    """

    def __init__(self, config: Config, params: Any,
                 tokenizer: TokenizerBase, devices: Sequence[Any],
                 **service_kwargs):
        if not devices:
            raise ValueError("devices must be non-empty")
        self.config = config
        self.replicas = [
            CaptionService(config, params, tokenizer, device=d,
                           **service_kwargs) for d in devices]
        self.devices = list(devices)
        self.stats = _AggregateStats(self.replicas)
        self.default_params: GenParams = self.replicas[0].default_params
        self.max_gen_length = self.replicas[0].max_gen_length
        self._lock = threading.Lock()
        self._inflight = [0] * len(self.replicas)
        self._rr = 0  # round-robin tie-break cursor

    # -- routing -------------------------------------------------------------
    def _acquire(self) -> int:
        """Pick the replica with the fewest in-flight requests; break ties
        round-robin so an idle fleet still spreads load."""
        with self._lock:
            n = len(self.replicas)
            best, best_load = None, None
            for off in range(n):
                i = (self._rr + off) % n
                if best_load is None or self._inflight[i] < best_load:
                    best, best_load = i, self._inflight[i]
            self._rr = (best + 1) % n
            self._inflight[best] += 1
            return best

    def _release(self, i: int) -> None:
        with self._lock:
            self._inflight[i] -= 1

    # -- request surface (mirrors CaptionService) ----------------------------
    def caption_bytes(self, image_bytes: bytes,
                      prompt: Optional[str] = None,
                      gen: Optional[GenParams] = None,
                      timeout: Optional[float] = 120.0) -> str:
        i = self._acquire()
        try:
            return self.replicas[i].caption_bytes(image_bytes, prompt=prompt,
                                                  gen=gen, timeout=timeout)
        finally:
            self._release(i)

    def caption_stream_bytes(self, image_bytes: bytes,
                             prompt: Optional[str] = None,
                             gen: Optional[GenParams] = None,
                             chunk_size: Optional[int] = None,
                             timeout: Optional[float] = 120.0):
        """A stream stays on ONE replica for its whole life (its KV cache
        lives on that chip); it counts as in-flight until the generator
        finishes or is abandoned. The replica is acquired at FIRST
        iteration, not at call time: a generator that is never started
        runs no code at all (not even ``finally``), so an eager acquire
        would leak the in-flight slot if the client vanished before the
        first event."""

        def gen_events():
            i = self._acquire()
            try:
                yield from self.replicas[i].caption_stream_bytes(
                    image_bytes, prompt=prompt, gen=gen,
                    chunk_size=chunk_size, timeout=timeout)
            finally:
                self._release(i)

        return gen_events()

    # -- lifecycle ------------------------------------------------------------
    def warmup(self) -> list[int]:
        """Warm every replica (each compiles its own per-device programs).
        Returns the bucket list (identical across replicas)."""
        buckets: list[int] = []
        for r in self.replicas:
            buckets = r.warmup()
        return buckets

    def close(self) -> None:
        for r in self.replicas:
            r.close()
