"""Vectorized geometry / world-model ops (layer L2 of SURVEY.md).

Everything here is a pure, `vmap`-able JAX function over fixed-shape padded
arrays — the TPU-native replacement for the reference's per-obstacle Python
loops in ``src/model_obstacle.py``, ``src/model_map.py`` and
``src/demo_setting.py``.
"""

from .geometry import (
    rect_vertices,
    polygon_hrep,
    batched_hrep,
    translate_hrep_b,
    replicate_hrep_over_horizon,
    pad_polyline,
)
from .rasterize import rects_to_grid
from .dynamics import unicycle_step, unicycle_rollout

__all__ = [
    "rect_vertices",
    "polygon_hrep",
    "batched_hrep",
    "translate_hrep_b",
    "replicate_hrep_over_horizon",
    "pad_polyline",
    "rects_to_grid",
    "unicycle_step",
    "unicycle_rollout",
]
