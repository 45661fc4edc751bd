"""Closed-loop runtime tests (host driver)."""

import numpy as np
import pytest

from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.runtime import (
    ClosedLoopRunner,
)
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.scenarios import (
    get_demo,
)


def test_demo1_first_steps_progress_toward_goal():
    runner = ClosedLoopRunner(get_demo("demo1"), max_steps=3)
    res = runner.run()
    assert not res.aborted_infeasible
    assert len(res.steps) == 3
    xs = res.x_history
    # monotone progress along the corridor
    assert xs[0][0] > 3.0
    assert xs[-1][0] > xs[0][0]
    # stays inside the drivable band
    assert np.all(xs[:, 1] > 1.7) and np.all(xs[:, 1] < 8.3)
    # free-time mode for the first steps (no obstacle in lidar range yet)
    assert not res.steps[0].fixtime

    # structured observability is populated by the product loop
    # (SURVEY.md section 5): per-step latency series + mode counters
    m = runner.metrics
    assert m.counters["replans"] == 3
    assert m.counters["freetime_steps"] == 3
    assert len(m.series["replan_ms"]) == 3
    q = m.quantiles("replan_ms")
    assert q["p50"] is not None and q["p50"] > 0
    assert m.summary()["replan_ms"]["count"] == 3


@pytest.mark.slow
def test_demo1_full_closed_loop():
    runner = ClosedLoopRunner(get_demo("demo1"))
    res = runner.run()
    assert not res.aborted_infeasible
    xs = res.x_history
    # runs to the reference's 30-step cap, past the static block and the
    # dynamic crossing obstacle
    assert len(res.steps) == 30
    assert xs[-1][0] > 28.0
    # lidar must have triggered fix-time mode at some point
    assert any(s.fixtime for s in res.steps)
    # dip below the dynamic obstacle: min y after x>16 is below the block
    # passage altitude
    past = xs[xs[:, 0] > 16.0]
    assert past[:, 1].min() < 4.5


def test_legacy_mpc1_demo1_first_steps():
    """closed_loop_mpc (src/closed_loop.py:142-209): free-time only,
    dynamic obstacles invisible to the solver."""
    runner = ClosedLoopRunner(get_demo("demo1"), max_steps=3)
    res = runner.run_legacy(mode="mpc1")
    assert not res.aborted_infeasible
    assert len(res.steps) == 3
    assert not any(s.fixtime for s in res.steps)
    xs = res.x_history
    assert xs[-1][0] > xs[0][0]


def test_legacy_mpc3_demo1_first_steps():
    """closed_loop_mpc3 (src/closed_loop.py:211-321): sensor-driven
    switch, config terminal set, no previous-plan splice."""
    runner = ClosedLoopRunner(get_demo("demo1"), max_steps=3)
    res = runner.run_legacy(mode="mpc3")
    assert not res.aborted_infeasible
    assert len(res.steps) == 3
    # nothing in lidar range during the first steps -> free mode
    assert not res.steps[0].fixtime
    xs = res.x_history
    assert xs[-1][0] > xs[0][0]
