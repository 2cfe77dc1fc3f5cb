"""Tracing / profiling hooks.

Reference equivalents (SURVEY §5): ``profiler.record_function`` scopes at
the PE / encoder-index cut points (lib/run_nerf_helpers.py:343,
lib/encoder.py:116,236) and the wall-clock per-iter prints.  Here:
``annotate`` = ``jax.named_scope`` (visible in XLA/xprof traces) and
``trace_scope`` = a ``jax.profiler`` trace session writing a TensorBoard-
compatible profile directory.
"""

from __future__ import annotations

import contextlib

import jax


def annotate(name: str):
    """Named scope that shows up in compiled-graph profiles."""
    return jax.named_scope(name)


@contextlib.contextmanager
def trace_scope(log_dir: str | None):
    """Profile everything in the block into ``log_dir`` (no-op if None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
