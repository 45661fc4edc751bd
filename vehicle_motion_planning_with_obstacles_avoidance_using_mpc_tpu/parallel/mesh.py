"""Mesh construction and scenario-axis sharding helpers."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator=None, num_processes=None, process_id=None):
    """Multi-host bring-up (no-op when single-process). Call before any
    device use on pod slices; mirrors jax.distributed.initialize."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_mesh(n_devices: int | None = None, axis: str = "scenario") -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_along(tree, mesh: Mesh, axis: str = "scenario"):
    """Place a batched pytree with its leading axis split over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)


def sharded_batch_solver(solve, mesh: Mesh, axis: str = "scenario"):
    """vmap a per-problem ``solve(data, z0)`` and constrain its batch axis
    to the mesh — XLA partitions the batched KKT solves across devices with
    no cross-device collectives inside a solve."""
    vsolve = jax.vmap(solve)
    shard = NamedSharding(mesh, P(axis))

    def run(datab, z0b):
        datab = jax.lax.with_sharding_constraint(datab, shard)
        z0b = jax.lax.with_sharding_constraint(z0b, shard)
        return vsolve(datab, z0b)

    return jax.jit(run, in_shardings=(shard, shard), out_shardings=shard)


def sharded_rollout(rollout, mesh: Mesh, axis: str = "scenario"):
    """vmap a scanned closed-loop ``rollout(scn, ref, ref_len)`` over the
    scenario axis and pin that axis to the mesh."""
    vroll = jax.vmap(rollout)
    shard = NamedSharding(mesh, P(axis))

    def run(scnb, refb, ref_lenb):
        args = jax.lax.with_sharding_constraint((scnb, refb, ref_lenb), shard)
        return vroll(*args)

    return jax.jit(run, in_shardings=(shard, shard, shard),
                   out_shardings=shard)


def sharded_rollout_from(rollout, mesh: Mesh, axis: str = "scenario"):
    """Like :func:`sharded_rollout` but state-carrying: the returned
    ``run(st, scnb, refb, ref_lenb)`` resumes each lane from its
    ``LoopState`` — the chunked-dispatch form (short executions chained
    on the host) that the sweep uses on the crash-prone remote backend."""
    vroll = jax.vmap(lambda st, scn, ref, rl: rollout(scn, ref, rl, st))
    shard = NamedSharding(mesh, P(axis))

    def run(stb, scnb, refb, ref_lenb):
        args = jax.lax.with_sharding_constraint(
            (stb, scnb, refb, ref_lenb), shard)
        return vroll(*args)

    return jax.jit(run, in_shardings=(shard, shard, shard, shard),
                   out_shardings=shard)
