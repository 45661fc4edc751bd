"""Tests for the native (C++) A* front-end: builds with g++, matches the
Python reference-exact search in path COST on every demo grid (tie-break
order may differ — both are optimal), and the batch entry agrees with
single solves."""

import math

import numpy as np
import pytest

from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.native import (
    astar_solve_batch_native,
    astar_solve_native,
    native_available,
)
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.runtime import (
    astar_host,
)
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.scenarios import (
    build_scenario,
    demo_names,
    get_demo,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="g++ unavailable"
)


def _cost(cells):
    c = 0.0
    for a, b in zip(cells[:-1], cells[1:]):
        c += math.hypot(a[0] - b[0], a[1] - b[1])
    return c


def test_native_matches_python_cost_on_all_demos():
    import jax.numpy as jnp

    for name in demo_names():
        demo = get_demo(name)
        scn, _ = build_scenario(demo, dtype=jnp.float64)
        grid = np.asarray(scn.grid)
        s = (int(demo.start[1]), int(demo.start[0]))
        g = (int(demo.goal[1]), int(demo.goal[0]))
        nat = astar_solve_native(grid, s, g)
        py = astar_host.solve_grid_astar(grid, s, g)
        assert nat is not None and py is not None, name
        # python route excludes start; native includes it
        py_full = list(py) + [s]
        assert abs(_cost(nat) - _cost(py_full)) < 1e-4, name
        assert tuple(nat[0]) == g and tuple(nat[-1]) == s, name


def test_native_unreachable_returns_none():
    grid = np.zeros((5, 5), np.uint8)
    grid[:, 2] = 1  # wall
    assert astar_solve_native(grid, (0, 0), (0, 4)) is None


def test_native_batch_matches_single():
    grid = np.zeros((12, 12), np.uint8)
    grid[4:8, 4:8] = 1
    starts = np.array([[0, 0], [11, 0], [0, 0]], np.int32)
    goals = np.array([[11, 11], [0, 11], [0, 1]], np.int32)
    batch = astar_solve_batch_native(grid, starts, goals)
    assert len(batch) == 3
    for i in range(3):
        single = astar_solve_native(grid, starts[i], goals[i])
        np.testing.assert_array_equal(batch[i], single)


def test_reference_path_native_flag():
    import jax.numpy as jnp

    demo = get_demo("demo9")
    scn, _ = build_scenario(demo, dtype=jnp.float64)
    grid = np.asarray(scn.grid)
    ref_py = astar_host.reference_path_for(grid, demo.start, demo.goal)
    ref_nat = astar_host.reference_path_for(grid, demo.start, demo.goal,
                                            native=True)
    # same endpoints and same total length (equal-cost optimal paths)
    np.testing.assert_allclose(ref_nat[:2, 0], ref_py[:2, 0])
    np.testing.assert_allclose(ref_nat[:2, -1], ref_py[:2, -1])

    def plen(r):
        return np.sum(np.hypot(np.diff(r[0]), np.diff(r[1])))

    np.testing.assert_allclose(plen(ref_nat), plen(ref_py), atol=1e-6)
