"""TPU-native hierarchical motion-planning engine (A* + time-optimal OBCA MPC).

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``tg623623nana/Vehicle_Motion_Planning_with_Obstacles_Avoidance_using_MPC``:
a grid A* front-end produces a coarse collision-free reference path, and a
time-optimal OBCA (Optimization-Based Collision Avoidance) NLP back-end
smooths/tracks it with exact polytope-vs-polytope collision avoidance via
dual variables, replanned every step in a closed receding-horizon loop with
a simulated circular-range lidar.

Unlike the reference (single-threaded Python + CasADi/IPOPT, rebuilding the
NLP symbolically on every replan), every stage here is a shape-static traced
pure function: problems JIT-compile once per (N, nObs, maxE) configuration,
``vmap`` batches thousands of scenarios per chip, and ``jax.sharding`` +
``shard_map`` scale the scenario axis over multi-chip / multi-host meshes.

Layer map (mirrors SURVEY.md section 1):
  L0/L1  solver/   primal-dual interior-point NLP solver + OBCA problem
                   builders (replaces CasADi ``Opti`` + IPOPT)
  L2     ops/      vectorized geometry: H-rep, rasterization, dynamics
  L3     runtime/  closed-loop receding-horizon driver, lidar sensor, A*
  L4     scenarios/ demo configs as data + random scenario generation
  L5     viz/, cli  host-side drawing / benchmarking / experiment driver
"""

__version__ = "0.1.0"

from . import ops, models, solver, runtime, scenarios, parallel, utils

__all__ = [
    "ops",
    "models",
    "solver",
    "runtime",
    "scenarios",
    "parallel",
    "utils",
]
