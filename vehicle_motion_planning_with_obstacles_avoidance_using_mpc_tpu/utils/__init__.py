"""Observability & durability utilities (SURVEY.md section 5): profiler
annotations, structured metrics with latency quantiles, and pytree
checkpoint/resume for pod-scale sweeps."""

from .checkpoint import SweepCheckpointer, load_pytree, save_pytree
from .metrics import MetricsLogger
from .profiling import annotate, device_trace, wall_timer

__all__ = [
    "SweepCheckpointer",
    "load_pytree",
    "save_pytree",
    "MetricsLogger",
    "annotate",
    "device_trace",
    "wall_timer",
]
