"""Native (C++) host runtime components.

The reference outsources its native substrate to CasADi/IPOPT
(src/obca.py:1054); the TPU build replaces that with the JAX/Pallas IPM.
What remains host-bound is reference-path generation — the pure-Python
A* (src/a_star.py, ~24 ms/solve per src/simulation.py:223) — which this
module reimplements in C++ (astar.cpp) behind a ctypes ABI, with
build-on-first-use via g++ and a transparent fallback to the Python
implementation when no toolchain is available.
"""

from .build import load_native_astar, native_available
from .astar_native import astar_solve_native, astar_solve_batch_native

__all__ = [
    "load_native_astar",
    "native_available",
    "astar_solve_native",
    "astar_solve_batch_native",
]
