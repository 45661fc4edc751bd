"""Tests for viz/: geometric helpers + plot/animation artifact writing
(parity surface with reference src/draw.py)."""

import numpy as np

from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.scenarios.demos import (
    get_demo,
)
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.viz import (
    car_outline,
    dyn_obstacle_outline,
    plot_comparison,
)


def test_car_outline_axis_aligned():
    # ego (front, hw, rear, hw) at origin, theta=0: x in [-rear, front],
    # y in [-hw, hw] (src/closed_loop.py:63 layout)
    ego = (1.7, 0.75, 1.2, 0.75)
    box = car_outline(np.array([0.0, 0.0, 0.0]), ego)
    assert box.shape == (5, 2)
    np.testing.assert_allclose(box[0], [1.7, 0.75])
    np.testing.assert_allclose(box[2], [-1.2, -0.75])
    np.testing.assert_allclose(box[0], box[-1])  # closed


def test_car_outline_rotated():
    ego = (2.0, 1.0, 2.0, 1.0)
    box = car_outline(np.array([5.0, 5.0, np.pi / 2]), ego)
    # at 90deg the front-left corner (2,1) maps to (-1,2) + center
    np.testing.assert_allclose(box[0], [4.0, 7.0], atol=1e-12)


def test_dyn_obstacle_outline_override_center():
    row = (0.0, 0.0, 0.0, 4.0, 2.0, 0.5)
    v = dyn_obstacle_outline(row, pos=(10.0, 3.0))
    assert v.shape == (5, 2)
    np.testing.assert_allclose(v[:, 0].min(), 8.0)
    np.testing.assert_allclose(v[:, 0].max(), 12.0)
    np.testing.assert_allclose(v[:, 1].min(), 2.0)
    np.testing.assert_allclose(v[:, 1].max(), 4.0)


def test_plot_comparison_writes_png(tmp_path):
    demo = get_demo("demo1")
    tr = np.stack([
        np.linspace(3, 38, 20), np.full(20, 4.0), np.zeros(20),
    ])
    out = str(tmp_path / "cmp.png")
    path = plot_comparison(demo, ref_path=tr, trajs={"mpc": tr},
                           out_path=out)
    assert path == out
    import os

    assert os.path.getsize(out) > 1000


def test_animate_closed_loop_writes_gif(tmp_path):
    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.runtime.closed_loop import (
        ClosedLoopResult,
        StepRecord,
    )
    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.viz import (
        animate_closed_loop,
    )

    demo = get_demo("demo1")
    plan = np.stack([np.linspace(3, 6, 7), np.full(7, 4.0), np.zeros(7)]).T
    steps = [
        StepRecord(k=k, fixtime=bool(k), feas=True, fallback=False,
                   x=np.array([3.0 + k, 4.0, 0.0]),
                   u=np.array([0.5, 0.0]), Ts_opt=0.5,
                   x_open_loop=plan, iters=10, kkt_err=1e-6,
                   dyn_vertices=[(np.array([[20.0, 1.0], [21, 1], [21, 2],
                                            [20, 2]]), bool(k))])
        for k in range(2)
    ]
    res = ClosedLoopResult(demo="demo1", reached_goal=False,
                           aborted_infeasible=False, steps=steps,
                           x_ref=plan.T)
    out = str(tmp_path / "cl.gif")
    animate_closed_loop(demo, res, out, fps=2)
    import os

    assert os.path.getsize(out) > 1000
