"""Tracing / profiling — the reference's only instrumentation is ttictoc
wall-clock timing (src/simulation.py:15,219-229); here solve/rollout
phases get ``jax.profiler`` annotations that show up in TensorBoard /
Perfetto device traces (SURVEY.md section 5 "Tracing / profiling").
"""

from __future__ import annotations

import contextlib
import time

import jax


def annotate(name: str):
    """Trace annotation visible in device profiles; cheap no-op cost when
    no trace is active. Use around solve/rollout calls."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def device_trace(log_dir: str, host_tracer_level: int = 2):
    """Capture a profiler trace (TensorBoard/Perfetto) around a block::

        with device_trace("/tmp/trace"):
            vsolve(datab, z0b)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def wall_timer(label: str, sink=None):
    """ttictoc-equivalent wall timing (src/simulation.py:219-231); sink is
    an optional callable(label, seconds)."""
    t0 = time.time()
    try:
        yield
    finally:
        dt = time.time() - t0
        if sink is None:
            print(f"[{label}] {dt:.3f} s")
        else:
            sink(label, dt)
