"""Tests for reference-trajectory windowing/re-interpolation semantics
(src/closed_loop.py:502-587)."""

import numpy as np
import jax.numpy as jnp

from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.runtime import (
    reference as refmod,
)


def _ref_update_reference_trajectory(N, ref_trajectory, current_state):
    """Transliteration of src/closed_loop.py:502-528 for testing."""
    nx = 3
    path_num = ref_trajectory.shape[1]
    min_dis, start_idx = 1e9, 0
    for i in range(path_num):
        dis = (current_state[0] - ref_trajectory[0, i]) ** 2 + (
            current_state[1] - ref_trajectory[1, i]
        ) ** 2
        if dis < min_dis:
            min_dis, start_idx = dis, i
    x_ref = np.zeros((nx, N + 1))
    for i in range(N + 1):
        for j in range(nx):
            if i + start_idx >= path_num - 1:
                x_ref[j, i] = ref_trajectory[j][path_num - 1]
            else:
                x_ref[j, i] = ref_trajectory[j][i + start_idx]
    return x_ref


def test_window_reference_matches_reference_semantics():
    rng = np.random.default_rng(0)
    path = rng.normal(size=(3, 20))
    for x0 in [path[:, 0], path[:, 7] + 0.01, path[:, 18], np.array([99.0, 99, 0])]:
        exp = _ref_update_reference_trajectory(6, path, x0)
        got = np.asarray(refmod.window_reference(jnp.asarray(path), 20, jnp.asarray(x0), 6))
        np.testing.assert_allclose(got, exp, atol=1e-12)


def test_window_reference_padded_path():
    path = np.zeros((3, 10))
    path[0, :6] = np.arange(6)   # real path: 6 points along x
    path[:, 6:] = path[:, 5:6]   # padding repeats last
    x0 = np.array([4.2, 0.0, 0.0])
    got = np.asarray(refmod.window_reference(jnp.asarray(path), 6, jnp.asarray(x0), 4))
    # nearest is idx 4; window 4,5,5,5,5 (clamped at valid_len-1)
    np.testing.assert_allclose(got[0], [4, 5, 5, 5, 5])


def test_start_goal_reference():
    got = np.asarray(refmod.start_goal_reference([0.0, 1, 2], [3.0, 4, 5], 4))
    np.testing.assert_allclose(got[:, 0], [0, 1, 2])
    for k in range(1, 5):
        np.testing.assert_allclose(got[:, k], [3, 4, 5])


def test_reinterpolate_identity_when_equal_horizons():
    # N_fix == N_free: int(N_fix/N_free) == 1 -> same x/y, recomputed theta
    xref = np.array(
        [[0, 1, 2, 3, 4, 5, 6.0], [0, 0, 1, 1, 2, 2, 3.0], [0, 0, 0, 0, 0, 0, 0.0]]
    )
    out, n_new = refmod.reinterpolate_openloop(jnp.asarray(xref), 6, 6)
    out = np.asarray(out)
    assert n_new == 6
    np.testing.assert_allclose(out[:2], xref[:2], atol=1e-12)
    np.testing.assert_allclose(out[2, 0], np.arctan2(0, 1))
    np.testing.assert_allclose(out[2, 1], np.arctan2(1, 1))
    np.testing.assert_allclose(out[2, 6], out[2, 5])


def test_reinterpolate_doubling():
    xref = np.array([[0, 2, 4.0], [0, 0, 2.0], [0, 0, 0.0]])
    out, n_new = refmod.reinterpolate_openloop(jnp.asarray(xref), 2, 4)
    out = np.asarray(out)
    assert n_new == 4
    np.testing.assert_allclose(out[0], [0, 1, 2, 3, 4])
    np.testing.assert_allclose(out[1], [0, 0, 0, 1, 2])


def test_splice_previous_plan():
    xref = np.zeros((3, 7))
    x_prev = np.arange(21.0).reshape(3, 7)
    out = np.asarray(refmod.splice_previous_plan(jnp.asarray(xref), jnp.asarray(x_prev), 1))
    np.testing.assert_allclose(out[:, 0], x_prev[:, 1])
    np.testing.assert_allclose(out[:, 1:], 0)


def test_goal_reached():
    assert bool(refmod.goal_reached(np.array([38.1, 4.0, 0]), np.array([38.0, 4, 0])))
    assert not bool(refmod.goal_reached(np.array([37.0, 4.0, 0]), np.array([38.0, 4, 0])))


def test_interpolate_path_matches_reference_semantics():
    # src/a_star.py:149-187: vertical segments stepped in y (flipped when
    # descending), others stepped in x with linear y interpolation,
    # endpoint excluded per segment, goal appended
    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.runtime.astar_host import (
        interpolate_path,
    )

    out = interpolate_path([[0, 0], [2, 2], [2, 0]], 0.5)
    arr = np.asarray(out)
    # first segment: x = 0, .5, 1, 1.5 with y == x; second: vertical down
    np.testing.assert_allclose(arr[:4, 0], [0, 0.5, 1.0, 1.5])
    np.testing.assert_allclose(arr[:4, 1], arr[:4, 0])
    seg2 = arr[4:-1]
    assert np.all(seg2[:, 0] == 2.0)
    assert np.all(np.diff(seg2[:, 1]) < 0)  # descending keeps direction
    np.testing.assert_allclose(arr[-1], [2, 0])
