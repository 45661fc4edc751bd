"""Unit tests for geometry ops vs hand-computed reference semantics
(src/model_obstacle.py:37-102, src/demo_setting.py:405-473)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.ops import (
    geometry,
    rasterize,
)
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.scenarios import (
    build_scenario,
    get_demo,
)


def ref_hrep_single(verts):
    """Direct transliteration of the reference hyperplane rules for testing
    (clockwise winding; vertical/horizontal special cases)."""
    A, b = [], []
    for j in range(len(verts) - 1):
        v1, v2 = verts[j], verts[j + 1]
        if v1[0] == v2[0]:
            if v2[1] < v1[1]:
                A.append([1, 0]); b.append(v1[0])
            else:
                A.append([-1, 0]); b.append(-v1[0])
        elif v1[1] == v2[1]:
            if v1[0] < v2[0]:
                A.append([0, 1]); b.append(v1[1])
            else:
                A.append([0, -1]); b.append(-v1[1])
        else:
            a = (v2[1] - v1[1]) / (v2[0] - v1[0])
            bb = v1[1] - a * v1[0]
            if v1[0] < v2[0]:
                A.append([-a, 1]); b.append(bb)
            else:
                A.append([a, -1]); b.append(-bb)
    return np.asarray(A, float), np.asarray(b, float)


def test_rect_vertices_axis_aligned():
    v = np.asarray(geometry.rect_vertices(22.5, 0.0, np.pi / 2, 3.0, 3.0))
    # theta=pi/2 (moving up): v1 = (cx - hw, cy - hl) etc., closed polyline
    expected = np.array(
        [[21.0, -1.5], [21.0, 1.5], [24.0, 1.5], [24.0, -1.5], [21.0, -1.5]]
    )
    np.testing.assert_allclose(v, expected, atol=1e-12)


@pytest.mark.parametrize(
    "poly",
    [
        [[39, 9], [0, 9]],                                   # single wall edge
        [[10, 1], [10, 5], [15, 5], [15, 1], [10, 1]],       # demo1 block
        [[25, 8], [25, 3], [23, 3], [20, 5], [20, 8], [25, 8]],  # slanted edge
        [[8, 0], [8, 6], [40, 6]],                           # demo9 L-wall
    ],
)
def test_polygon_hrep_matches_reference_rules(poly):
    poly = np.asarray(poly, float)
    A_ref, b_ref = ref_hrep_single(poly)
    e = len(poly) - 1
    A, b = geometry.polygon_hrep(jnp.asarray(poly), jnp.ones(e))
    np.testing.assert_allclose(np.asarray(A), A_ref, atol=1e-12)
    np.testing.assert_allclose(np.asarray(b), b_ref, atol=1e-12)


def test_hrep_interior_infeasible():
    # clockwise square [20,25]x[3,8]: interior must violate A x <= b... i.e.
    # for an interior point all constraints hold (A p <= b is the
    # *complement*: outside iff some A_j p > b_j is attainable with the dual
    # formulation; for H-rep of a convex polytope built clockwise, interior
    # satisfies A p <= b).
    poly = np.array([[25, 8], [25, 3], [20, 3], [20, 8], [25, 8]], float)
    A, b = geometry.polygon_hrep(jnp.asarray(poly), jnp.ones(4))
    A, b = np.asarray(A), np.asarray(b)
    inside = np.array([22.0, 5.0])
    outside = np.array([30.0, 5.0])
    assert np.all(A @ inside <= b + 1e-9)
    assert np.any(A @ outside > b)


def test_translate_hrep_matches_revertexed():
    poly = np.array([[25, 8], [25, 3], [23, 3], [20, 5], [20, 8], [25, 8]], float)
    delta = np.array([0.7, -1.3])
    A0, b0 = geometry.polygon_hrep(jnp.asarray(poly), jnp.ones(5))
    A1, b1 = geometry.polygon_hrep(jnp.asarray(poly + delta), jnp.ones(5))
    b_shift = geometry.translate_hrep_b(A0, b0, jnp.asarray(delta))
    np.testing.assert_allclose(np.asarray(A1), np.asarray(A0), atol=1e-12)
    np.testing.assert_allclose(np.asarray(b_shift), np.asarray(b1), atol=1e-9)


def test_replicate_hrep_over_horizon():
    poly = np.asarray(
        geometry.rect_vertices(22.5, 0.0, np.pi / 2, 3.0, 3.0)
    )
    A, b = geometry.polygon_hrep(jnp.asarray(poly), jnp.ones(4))
    vel = jnp.asarray([[0.2 * np.cos(np.pi / 2), 0.2 * np.sin(np.pi / 2)]])
    A_t, b_t = geometry.replicate_hrep_over_horizon(
        A[None], b[None], vel, N=6, Ts=0.1
    )
    assert A_t.shape == (7, 1, 4, 2)
    # at k=3 the obstacle moved up 3*0.1*0.2 = 0.06
    A3, b3 = geometry.polygon_hrep(
        jnp.asarray(poly + np.array([0.0, 0.06])), jnp.ones(4)
    )
    np.testing.assert_allclose(np.asarray(b_t[3, 0]), np.asarray(b3), atol=1e-9)


def test_demo1_grid_matches_reference_rasterization():
    scn, shape = build_scenario(get_demo("demo1"))
    grid = np.asarray(scn.grid)
    assert grid.shape == (11, 40)
    # top wall rows 9..10 and bottom rows 0..1 fully blocked
    assert np.all(grid[9:, :] == 1)
    assert np.all(grid[:2, :] == 1)
    # block x in [10,15], y in [1,5]
    assert np.all(grid[1:6, 10:16] == 1)
    # free corridor
    assert np.all(grid[2:9, 0:10] == 0)
    assert np.all(grid[6:9, 10:16] == 0)
    assert np.all(grid[2:9, 16:40] == 0)


def test_demo9_grid_shape():
    scn, shape = build_scenario(get_demo("demo9"))
    assert np.asarray(scn.grid).shape == (61, 41)


def test_grid_obstacle_vertices_vrep():
    # reference obstacle_V_Represent semantics (src/model_obstacle.py:12-35):
    # row [row, col, x_extent, y_extent] -> rect from (col-.5, row-.5)
    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.ops.geometry import (
        grid_obstacle_vertices,
    )

    verts = np.asarray(grid_obstacle_vertices(np.array([[2.0, 3.0, 4.0, 5.0]])))
    assert verts.shape == (1, 5, 2)
    np.testing.assert_allclose(verts[0, 0], [2.5, 1.5])
    np.testing.assert_allclose(verts[0, 1], [6.5, 1.5])
    np.testing.assert_allclose(verts[0, 2], [6.5, 6.5])
    np.testing.assert_allclose(verts[0, 3], [2.5, 6.5])
    np.testing.assert_allclose(verts[0, 4], verts[0, 0])


def test_dilate_erode_grid():
    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.ops.rasterize import (
        dilate_grid,
        erode_grid,
    )

    g = np.zeros((7, 7))
    g[3, 3] = 1.0
    d1 = np.asarray(dilate_grid(g, 1))
    # disk(1) = plus-shaped footprint
    expect = np.zeros((7, 7))
    for dy, dx in ((0, 0), (0, 1), (0, -1), (1, 0), (-1, 0)):
        expect[3 + dy, 3 + dx] = 1.0
    np.testing.assert_array_equal(d1, expect)
    # erosion undoes the dilation of an isolated point to a plus-center
    e1 = np.asarray(erode_grid(d1, 1))
    np.testing.assert_array_equal(e1, g)
    # identity at level 0
    np.testing.assert_array_equal(np.asarray(dilate_grid(g, 0)), g)
