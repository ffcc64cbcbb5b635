"""Caption service: decode request bytes -> batched model call -> strings.

Bridges the HTTP layer to :class:`infer.captioner.Captioner` through a
:class:`DynamicBatcher`. The TPU-facing contract is static shapes: real
occupancy is padded up to the next power-of-two batch bucket (<= max_batch)
by replicating row 0, so the set of compiled programs is
{1, 2, 4, ..., max_batch} per generation-parameter group and steady-state
serving never triggers XLA compilation. ``warmup()`` executes every bucket
of the default group before the server reports healthy.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass
from typing import Any, Optional, Sequence

import jax
import numpy as np

from ..config import Config
from ..data.datasets import COCO_PROMPT, load_image_bytes_resized
from ..infer.captioner import Captioner
from ..text.tokenizer import TokenizerBase
from .batcher import DynamicBatcher


@dataclass(frozen=True)
class GenParams:
    """Generation parameters that select the compiled decode program.

    Everything here is a trace-time constant in ``infer/generate.py``
    (beam width, warper chain, loop bound), so requests may share a batch
    iff their GenParams are equal — this is the batcher group key.
    """

    max_length: int
    num_beams: int
    do_sample: bool = False
    temperature: float = 1.0
    top_k: int = 0
    top_p: float = 1.0
    min_length: int = 0
    repetition_penalty: float = 1.0
    no_repeat_ngram_size: int = 0


def pow2_batch(n: int, cap: int) -> int:
    """Smallest power of two >= n, capped (the batch-shape bucket)."""
    b = 1
    while b < n and b < cap:
        b *= 2
    return b


class CaptionService:
    """Thread-safe captioning with dynamic batching.

    ``caption_bytes`` is what HTTP handler threads call: it decodes the
    image on the CALLING thread (host work parallelizes across request
    threads; PIL releases the GIL for JPEG decode) and submits the decoded
    array to the single device-owning dispatcher.
    """

    def __init__(self, config: Config, params: Any,
                 tokenizer: TokenizerBase, max_batch: int = 8,
                 window_ms: float = 5.0, decode_int8: bool = False):
        self.config = config
        self.tokenizer = tokenizer
        self.captioner = Captioner(config, params, tokenizer,
                                   decode_int8=decode_int8)
        self.max_batch = max_batch
        self._sample_lock = threading.Lock()
        self._sample_calls = 0
        self._batcher = DynamicBatcher(self._run_batch, max_batch=max_batch,
                                       window_ms=window_ms)
        self.default_params = GenParams(
            max_length=config.generate_max_length,
            num_beams=config.num_beams)

    @property
    def stats(self):
        return self._batcher.stats

    # -- request side -------------------------------------------------------
    def caption_bytes(self, image_bytes: bytes,
                      prompt: Optional[str] = None,
                      gen: Optional[GenParams] = None,
                      timeout: Optional[float] = 120.0) -> str:
        image = load_image_bytes_resized(image_bytes,
                                         self.config.swin.image_size)
        return self._batcher.submit(gen or self.default_params,
                                    (image, prompt or COCO_PROMPT),
                                    timeout=timeout)

    def close(self) -> None:
        self._batcher.close()

    # -- device side (dispatcher thread only) --------------------------------
    def _run_batch(self, gen: GenParams,
                   payloads: Sequence[tuple[np.ndarray, str]]) -> list[str]:
        n = len(payloads)
        bucket = pow2_batch(n, self.max_batch)
        images = np.stack([p[0] for p in payloads], axis=0)
        prompts = [p[1] for p in payloads]
        if bucket > n:
            # Pad rows replicate row 0: same static shape as a full bucket,
            # and the padded outputs are sliced off below.
            pad = np.broadcast_to(images[:1],
                                  (bucket - n,) + images.shape[1:])
            images = np.concatenate([images, pad], axis=0)
            prompts = prompts + [prompts[0]] * (bucket - n)
        rng = None
        if gen.do_sample:
            # Fresh key per sampling batch; deterministic given call order.
            with self._sample_lock:
                self._sample_calls += 1
                rng = jax.random.PRNGKey(self._sample_calls)
        captions = self.captioner.caption(
            images, prompts, max_length=gen.max_length,
            num_beams=gen.num_beams, do_sample=gen.do_sample,
            temperature=gen.temperature, top_k=gen.top_k, top_p=gen.top_p,
            rng=rng, min_length=gen.min_length,
            repetition_penalty=gen.repetition_penalty,
            no_repeat_ngram_size=gen.no_repeat_ngram_size)
        return captions[:n]

    # -- startup -------------------------------------------------------------
    def warmup(self) -> list[int]:
        """Compile + execute every batch bucket of the default group so the
        first real request never pays an XLA compile. Returns the buckets
        warmed (for the log)."""
        size = self.config.swin.image_size
        dummy = np.zeros((size, size, 3), np.uint8)
        buckets, b = [], 1
        while True:
            # Direct call (not via submit): runs before the server accepts
            # traffic, hits bucket b deterministically, and keeps warmup
            # out of the serving stats.
            self._run_batch(self.default_params,
                            [(dummy, COCO_PROMPT)] * b)
            buckets.append(b)
            if b >= self.max_batch:
                return buckets
            b *= 2
