"""Tests for utils/: metrics, profiling, checkpoint/resume
(SURVEY.md section 5 auxiliary subsystems)."""

import numpy as np

from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.utils import (
    MetricsLogger,
    SweepCheckpointer,
    load_pytree,
    save_pytree,
    wall_timer,
)


def test_metrics_logger_quantiles_and_counters():
    m = MetricsLogger()
    for v in [5.0, 1.0, 3.0, 2.0, 4.0]:
        m.record("lat", v)
    m.bump("solves", 10)
    q = m.quantiles("lat")
    assert q["p50"] == 3.0
    assert q["p99"] == 5.0
    s = m.summary()
    assert s["lat"]["count"] == 5
    assert s["lat"]["mean"] == 3.0
    assert s["counters"]["solves"] == 10
    assert m.rate("solves") > 0


def test_metrics_timer_records_ms():
    m = MetricsLogger()
    with m.timer("op"):
        pass
    assert len(m.series["op"]) == 1
    assert m.series["op"][0] >= 0


def test_wall_timer_sink():
    out = {}
    with wall_timer("x", sink=lambda l, dt: out.update({l: dt})):
        pass
    assert "x" in out


def test_pytree_roundtrip(tmp_path):
    tree = {
        "a": np.arange(6).reshape(2, 3),
        "b": [np.ones(4), np.zeros((2, 2))],
        "c": (np.asarray(3.5), {"d": np.arange(2)}),
    }
    p = str(tmp_path / "ck")
    save_pytree(p, tree)
    back = load_pytree(p)
    assert set(back.keys()) == {"a", "b", "c"}
    np.testing.assert_array_equal(back["a"], tree["a"])
    np.testing.assert_array_equal(back["b"][1], tree["b"][1])
    assert isinstance(back["c"], tuple)
    np.testing.assert_array_equal(back["c"][1]["d"], tree["c"][1]["d"])


def test_sweep_checkpointer_keep_and_resume(tmp_path):
    ck = SweepCheckpointer(str(tmp_path / "sweep"), keep=2)
    for step in (1, 2, 3, 4):
        ck.save(step, {"step": np.asarray(step), "x": np.full(3, step)})
    assert ck.steps() == [3, 4]  # gc keeps the newest 2
    step, tree = ck.latest()
    assert step == 4
    np.testing.assert_array_equal(tree["x"], np.full(3, 4))


def test_sweep_checkpointer_empty(tmp_path):
    ck = SweepCheckpointer(str(tmp_path / "none"))
    assert ck.latest() == (None, None)
