"""Profiling hooks.

The reference's only instrumentation is wall-clock pp/tg counters
(src/completion.c:307-340); those live on in GenerationResult/TurnMetrics.
For kernel-level analysis this wraps the JAX profiler: traces open in
TensorBoard / Perfetto and show per-op device time, HBM traffic and fusion
decisions.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a device trace for the enclosed block.

    Usage:
        with profile_trace("/tmp/trace"):
            engine.generate(...)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
