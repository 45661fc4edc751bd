"""Chunked-iteration + lane-compaction driver (solver/compact.py).

The compacted path must be *semantically identical* to the monolithic
vmapped while_loop: same iterates, same iteration counts, same results —
only the batching of already-converged lanes changes.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.models import (
    OBCASpec,
    build_obca_data,
    init_vars,
)
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.runtime import (
    astar_host,
)
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.runtime.reference import (
    window_reference,
)
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.scenarios import (
    build_scenario,
    get_demo,
)
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.solver import (
    IPMOptions,
    make_obca_solver,
)
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.solver.compact import (
    solve_compacted,
)


def _batch(B=8, N=5, dtype=jnp.float64):
    demo = get_demo("demo9")
    scn, shape = build_scenario(demo, dtype=dtype)
    spec = OBCASpec(N=N, n_obs=shape.n_obs, e_max=shape.e_max,
                    variant="free")
    ref = astar_host.reference_path_for(
        np.asarray(scn.grid), demo.start, demo.goal)
    L = ref.shape[1]
    refj = jnp.asarray(ref, dtype)
    rng = np.random.RandomState(3)
    starts = np.sort(rng.randint(0, L - 2, size=B))
    x0s = jnp.asarray(ref[:, starts], dtype).T

    def build_one(x0):
        xref = window_reference(refj, L, x0, N)
        data = build_obca_data(spec, scn, x0=x0, u0=jnp.zeros(2, dtype),
                               xref=xref, Ts=0.1)
        return data, init_vars(spec, data)

    return spec, jax.jit(jax.vmap(build_one))(x0s)


def test_compacted_matches_monolithic():
    spec, (datab, z0b) = _batch(B=8)
    opt = IPMOptions(max_iters=60, tol=1e-8, acceptable_tol=1e-6,
                     feas_tol=1e-6, n_deltas=1)
    solve = make_obca_solver(spec, opt)

    mono = jax.jit(jax.vmap(solve))(datab, z0b)
    comp, stats = solve_compacted(solve, datab, z0b, chunk=5, min_bucket=2,
                                  shrink=2)

    np.testing.assert_array_equal(np.asarray(mono.iters),
                                  np.asarray(comp.iters))
    np.testing.assert_array_equal(np.asarray(mono.feas),
                                  np.asarray(comp.feas))
    np.testing.assert_allclose(
        np.asarray(jax.flatten_util.ravel_pytree(mono.z)[0]),
        np.asarray(jax.flatten_util.ravel_pytree(comp.z)[0]),
        rtol=1e-9, atol=1e-9)
    # compaction must never dispatch MORE lane-iterations than the convoy
    B = 8
    assert stats["dispatched_lane_iters"] <= B * int(
        np.asarray(mono.iters).max()) + B * 5
    assert stats["lane_iters"] == int(np.asarray(mono.iters).sum())


def test_chunk_boundary_is_invisible():
    """Splitting the while_loop at any it_cap then resuming must land on
    the same state as one uninterrupted run."""
    spec, (datab, z0b) = _batch(B=2)
    opt = IPMOptions(max_iters=30, tol=1e-10, acceptable_tol=1e-8,
                     n_deltas=1)
    solve = make_obca_solver(spec, opt)
    data0 = jax.tree.map(lambda a: a[0], datab)
    z00 = jax.tree.map(lambda a: a[0], z0b)

    st = solve.init(data0, z00)
    one = solve.iterate(st, data0, 30)
    split = solve.iterate(st, data0, 7)
    split = solve.iterate(split, data0, 19)
    split = solve.iterate(split, data0, 30)
    assert int(one.it) == int(split.it)
    np.testing.assert_allclose(np.asarray(one.zv), np.asarray(split.zv),
                               rtol=1e-12, atol=1e-12)
    r1 = solve.finalize(one, data0)
    r2 = solve.finalize(split, data0)
    assert bool(r1.feas) == bool(r2.feas)
