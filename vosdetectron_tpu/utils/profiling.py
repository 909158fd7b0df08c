"""Profiling / tracing hooks (SURVEY.md §5 aux subsystem).

The reference's observability is wall-clock Timer objects around detect
phases (lib/utils/timer.py via test_engine). Here, in addition to the
Timer/TrainingStats pair (utils/training_stats.py), device-side profiling
uses jax.profiler: traces land in a TensorBoard/Perfetto-compatible
directory, and annotated host spans mark pipeline phases.

Usage:
    from vosdetectron_tpu.utils.profiling import trace, annotate

    with trace("/tmp/vos_trace"):          # whole-run device trace
        with annotate("detect_chunk"):     # named host span in the trace
            ...
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device + host profile (Perfetto/TensorBoard format)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span visible in profiler timelines (TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def phase_timer(stats: dict, name: str):
    """Lightweight wall-clock phase accounting into a dict
    (reference: test_engine's timers reporting)."""
    import time

    t0 = time.time()
    try:
        yield
    finally:
        stats[name] = stats.get(name, 0.0) + time.time() - t0
