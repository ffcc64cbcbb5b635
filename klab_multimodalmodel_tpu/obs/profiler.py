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
