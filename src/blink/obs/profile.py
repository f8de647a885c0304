"""Profiling hooks (SURVEY.md §5 "Tracing/profiling").

`trace(logdir)` wraps a region in a jax.profiler trace viewable with
tensorboard-plugin-profile; `annotate(name)` marks pipeline stages
(intersect/shade/compact) in the trace timeline.
"""
from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(logdir: str | None):
    if not logdir:
        yield
        return
    with jax.profiler.trace(logdir):
        yield


def annotate(name: str):
    """Named range for a pipeline stage inside a trace."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def timed(out: dict, key: str):
    """Wall-clock a block (after jax.block_until_ready at the call site)."""
    import time

    t0 = time.perf_counter()
    yield
    out[key] = time.perf_counter() - t0
