"""Planning pipeline / closed-loop runtime (layer L3 of SURVEY.md)."""

from . import astar_host, reference
from .closed_loop import ClosedLoopResult, ClosedLoopRunner, run_closed_loop
from .simulation import Simulation, TimingReport

__all__ = [
    "astar_host",
    "reference",
    "ClosedLoopResult",
    "ClosedLoopRunner",
    "run_closed_loop",
    "Simulation",
    "TimingReport",
]
