"""Visualization (layer L5 of SURVEY.md) — host-side matplotlib parity
with the reference's ``src/draw.py``. Optional: never imported by the
TPU compute path."""

from .plotting import (
    animate_closed_loop,
    animate_open_loop,
    car_outline,
    dyn_obstacle_outline,
    plot_comparison,
    plot_states_inputs,
    plot_world,
)

__all__ = [
    "animate_closed_loop",
    "animate_open_loop",
    "car_outline",
    "dyn_obstacle_outline",
    "plot_comparison",
    "plot_states_inputs",
    "plot_world",
]
