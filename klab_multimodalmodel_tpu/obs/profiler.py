"""Profiling hooks (absent from the reference — SURVEY.md §5).

Thin wrappers over ``jax.profiler``: a trace context manager writing
TensorBoard-compatible traces into the run dir, and annotated step markers.
"""

from __future__ import annotations

import contextlib
import os

import jax


@contextlib.contextmanager
def trace(result_dir: str, enabled: bool = True):
    """Capture a profiler trace into ``{result_dir}/profile``."""
    if not enabled:
        yield
        return
    path = os.path.join(result_dir, "profile")
    os.makedirs(path, exist_ok=True)
    with jax.profiler.trace(path):
        yield


def annotate(name: str):
    """Named trace span (shows up in the profiler timeline)."""
    return jax.profiler.TraceAnnotation(name)


def start_server(port: int = 9999) -> None:
    """Live profiling endpoint for tensorboard's profile plugin."""
    jax.profiler.start_server(port)


class StepWindowTrace:
    """Traces the first N optimizer steps into ``{result_dir}/profile``.

    Used by the train loop for ``--profile_steps N`` (SURVEY.md §5.1): call
    ``tick()`` once per optimizer step; the trace starts before step 1 and
    stops after step N. Safe to leave disabled (n_steps=0) — every call is a
    no-op then.
    """

    def __init__(self, result_dir: str, n_steps: int):
        self._path = os.path.join(result_dir, "profile")
        self._remaining = n_steps
        self._active = False

    def tick(self) -> None:
        if self._remaining <= 0:
            if self._active:
                jax.profiler.stop_trace()
                self._active = False
            return
        if not self._active:
            os.makedirs(self._path, exist_ok=True)
            jax.profiler.start_trace(self._path)
            self._active = True
        self._remaining -= 1

    def close(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
