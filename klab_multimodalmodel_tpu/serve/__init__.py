"""Online serving: dynamic-batching caption inference over HTTP.

The reference has no serving layer (SURVEY.md §1: "no serving layer");
its inference story is one notebook cell decoding one image
(``/root/reference/visualization.ipynb`` cells 3-8). This package turns the
trained model into a production service the TPU-first way:

  * one dispatcher thread owns the device — HTTP threads only enqueue and
    wait, so XLA dispatch is never contended;
  * requests are coalesced into batches (``window_ms`` × ``max_batch``) and
    padded to power-of-two batch buckets, so the number of compiled XLA
    programs is bounded (log2(max_batch)+1 per generation-parameter group)
    and steady-state serving never recompiles;
  * all buckets are warmed (compiled + executed) before the server reports
    healthy.
"""

from .batcher import BatchStats, DynamicBatcher
from .continuous import ContinuousCaptionService
from .replicas import ReplicatedCaptionService
from .service import CaptionService

__all__ = ["BatchStats", "DynamicBatcher", "CaptionService",
           "ContinuousCaptionService", "ReplicatedCaptionService"]
