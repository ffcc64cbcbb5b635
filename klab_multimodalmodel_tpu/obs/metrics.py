"""Loss accumulation and the loss-curve plot.

Parity with ``LossCounter`` (``/root/reference/modules/losses.py:4-31``):
per-phase running sums, per-epoch mean = total / loader length, and a
``loss.png`` matplotlib curve. Two deliberate fixes over the reference
(SURVEY.md §2A quirk #6): losses arrive as device arrays and are only synced
to host when an epoch closes (no per-step ``.item()`` stall,
cf. ``/root/reference/train.py:59``), and in SPMD the per-step loss is already
the global mean — XLA's sharded reduction — not rank 0's shard.
"""

from __future__ import annotations

import os
from typing import Dict, List

import jax
import numpy as np


class LossCounter:
    """API-compatible with the reference LossCounter
    (``add_loss`` / ``count_and_get_loss`` / ``plot_loss``)."""

    def __init__(self, train_loader_len: int, val_loader_len: int):
        self.loader_len = {"train": max(train_loader_len, 1),
                           "val": max(val_loader_len, 1)}
        self.losses: Dict[str, List[float]] = {"train": [], "val": []}
        # Pending device values; converted to host floats lazily so the train
        # step never blocks on a device->host sync.
        self._pending: Dict[str, list] = {"train": [], "val": []}

    def add_loss(self, phase: str, loss) -> None:
        self._pending[phase].append(loss)

    # -- checkpointable state (mid-epoch preemption resume) ---------------
    def state_dict(self) -> dict:
        """Epoch history + the current epoch's pending partials (synced to
        host floats) — JSON-serializable, stored in checkpoint metadata so
        a resumed run's loss curve is bit-identical to an uninterrupted
        one."""
        return {
            "losses": {k: list(v) for k, v in self.losses.items()},
            "pending": {k: [float(jax.device_get(v)) for v in vals]
                        for k, vals in self._pending.items()},
        }

    def load_state_dict(self, state: dict) -> None:
        self.losses = {k: list(v) for k, v in state["losses"].items()}
        self._pending = {k: list(v) for k, v in state["pending"].items()}

    def count_and_get_loss(self) -> tuple[float, float]:
        for phase in ("train", "val"):
            vals = [float(jax.device_get(v)) for v in self._pending[phase]]
            self.losses[phase].append(
                float(np.sum(vals)) / self.loader_len[phase])
            self._pending[phase] = []
        return self.losses["train"][-1], self.losses["val"][-1]

    def plot_loss(self, result_dir: str) -> str:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure()
        plt.plot(self.losses["train"], label="Train")
        plt.plot(self.losses["val"], label="Val")
        plt.title("Loss Curve")
        plt.xlabel("Epoch")
        plt.ylabel("Loss")
        plt.legend()
        path = os.path.join(result_dir, "loss.png")
        plt.savefig(path)
        plt.close()
        return path


class Stopwatch:
    """Step timing for throughput (images/sec/chip) reporting."""

    def __init__(self):
        import time
        self._time = time.perf_counter
        self.reset()

    def reset(self) -> None:
        self._t0 = self._time()
        self._count = 0

    def tick(self, n: int = 1) -> None:
        self._count += n

    def rate(self) -> float:
        dt = self._time() - self._t0
        return self._count / dt if dt > 0 else 0.0
