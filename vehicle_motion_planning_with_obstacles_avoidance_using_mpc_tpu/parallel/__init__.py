"""Distributed execution: scenario-axis sharding over device meshes (L6).

The reference is single-process single-thread (SURVEY.md section 2); all
parallelism here is new capability: the scenario batch axis is sharded
across chips/hosts with ``jax.sharding`` — data parallelism over worlds —
while each NLP's KKT solve stays chip-local (its reductions ride ICI only
through XLA's batched linear algebra).
"""

from .mesh import (
    make_mesh,
    shard_along,
    sharded_batch_solver,
    sharded_rollout,
    sharded_rollout_from,
    init_distributed,
)

__all__ = [
    "make_mesh",
    "shard_along",
    "sharded_batch_solver",
    "sharded_rollout",
    "sharded_rollout_from",
    "init_distributed",
]
