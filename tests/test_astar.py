"""A* front-end tests: host replica vs the reference implementation
(imported directly from /root/reference/src/a_star.py as an oracle), and
the TPU wavefront solver vs optimal costs."""

import importlib.util
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.runtime import (
    astar_host,
)
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.ops import astar as tpu_astar
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.scenarios import (
    build_scenario,
    demo_names,
    get_demo,
)


def _load_reference_astar():
    spec = importlib.util.spec_from_file_location(
        "ref_a_star", "/root/reference/src/a_star.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_a_star"] = mod
    spec.loader.exec_module(mod)
    return mod


REF = _load_reference_astar()


def _demo_map():
    solver = REF.a_star(np.zeros((2, 2)), (0, 0), (1, 1))
    return solver.demo_data()


def _ref_solve(grid, start, goal):
    solver = REF.a_star(grid, start, goal)
    return solver.solve(grid, start, goal)


@pytest.mark.parametrize("name", demo_names())
def test_host_astar_matches_reference_exactly(name):
    spec = get_demo(name)
    scn, _ = build_scenario(spec)
    grid = np.asarray(scn.grid)
    start = (int(spec.start[1]), int(spec.start[0]))
    goal = (int(spec.goal[1]), int(spec.goal[0]))
    ref_path = _ref_solve(grid, start, goal)
    ours = astar_host.solve_grid_astar(grid, start, goal)
    assert ref_path is not False and ours is not None
    assert [tuple(p) for p in ours] == [tuple(p) for p in ref_path]


def test_host_astar_matches_reference_on_embedded_demo():
    grid, start, goal = _demo_map()
    ref_path = _ref_solve(grid, start, goal)
    ours = astar_host.solve_grid_astar(grid, start, goal)
    assert [tuple(p) for p in ours] == [tuple(p) for p in ref_path]


def test_host_astar_unreachable():
    grid = np.zeros((5, 5))
    grid[:, 2] = 1  # wall splits the map
    assert astar_host.solve_grid_astar(grid, (2, 0), (2, 4)) is None


def test_reference_path_headings():
    spec = get_demo("demo1")
    scn, _ = build_scenario(spec)
    ref = astar_host.reference_path_for(np.asarray(scn.grid), spec.start, spec.goal)
    assert ref.shape[0] == 3
    # path ends at goal cell
    np.testing.assert_allclose(ref[:2, -1], [38, 4])
    # headings are atan2 of deltas
    dx = ref[0, 1] - ref[0, 0]
    dy = ref[1, 1] - ref[1, 0]
    np.testing.assert_allclose(ref[2, 0], np.arctan2(dy, dx))


def _path_cost(route_yx):
    c = 0.0
    for a, b in zip(route_yx[:-1], route_yx[1:]):
        c += np.hypot(b[0] - a[0], b[1] - a[1])
    return c


@pytest.mark.parametrize("name", ["demo1", "demo9", "demo10"])
def test_wavefront_cost_matches_astar_optimal(name):
    spec = get_demo(name)
    scn, _ = build_scenario(spec)
    grid = np.asarray(scn.grid)
    start = (int(spec.start[1]), int(spec.start[0]))
    goal = (int(spec.goal[1]), int(spec.goal[0]))

    d = np.asarray(tpu_astar.cost_to_go(jnp.asarray(grid), jnp.asarray(goal)))
    # optimal cost from start per wavefront == A* g-cost of goal
    route = astar_host.solve_grid_astar(grid, start, goal)
    # route is goal->..-> (start excluded); prepend start after reversing
    astar_cost = _path_cost([start] + list(reversed(route)))
    np.testing.assert_allclose(d[start], astar_cost, rtol=1e-6)

    # extracted path is feasible, starts adjacent to start, ends at goal
    traj, valid = tpu_astar.plan_grid_path(
        jnp.asarray(grid), jnp.asarray(start), jnp.asarray(goal),
        max_len=grid.shape[0] * grid.shape[1] // 4,
    )
    traj, valid = np.asarray(traj), np.asarray(valid)
    pts = traj[valid]
    assert tuple(pts[-1]) == goal
    assert all(grid[y, x] == 0 for y, x in pts)
    # greedy descent follows an optimal path: same total cost
    np.testing.assert_allclose(_path_cost([start] + [tuple(p) for p in pts]),
                               astar_cost, rtol=1e-6)


def test_wavefront_batched_vmap():
    import jax

    spec = get_demo("demo1")
    scn, _ = build_scenario(spec)
    grid = jnp.asarray(np.asarray(scn.grid))
    grids = jnp.stack([grid, grid])
    goals = jnp.asarray([[4, 38], [4, 20]])
    ds = jax.vmap(tpu_astar.cost_to_go)(grids, goals)
    assert ds.shape == (2, 11, 40)
    assert float(ds[0, 4, 38]) == 0.0
    assert float(ds[1, 4, 20]) == 0.0
