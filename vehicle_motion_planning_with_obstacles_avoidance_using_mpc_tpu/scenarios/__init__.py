"""Scenario / config layer (L4): demo definitions as data, padded-array
scenario pytrees, and randomized scenario generation for pod-scale sweeps.
"""

from .demos import (
    DEMOS,
    DemoSpec,
    TerminalPolicy,
    MPCParams,
    default_params_for,
    demo_names,
    get_demo,
)
from .build import Scenario, ShapeSpec, build_scenario, shape_spec_for
from .random_gen import random_scenarios

__all__ = [
    "DEMOS",
    "DemoSpec",
    "TerminalPolicy",
    "MPCParams",
    "default_params_for",
    "demo_names",
    "get_demo",
    "Scenario",
    "ShapeSpec",
    "build_scenario",
    "shape_spec_for",
    "random_scenarios",
]
