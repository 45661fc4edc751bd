"""Independent-oracle parity: the closed-loop replans re-solved by scipy
trust-constr (solver/oracle.py) must reproduce the IPM's solutions.

CasADi/IPOPT — the reference's substrate (src/obca.py:1052-1056) — is
not installable in this environment (no package, no network), so this is
the strongest available stand-in for goldens-vs-reference parity: an
independent interior-point implementation, float64, exact JAX jacobians,
warm-started from the SAME multistart candidate the IPM used, solving
the IDENTICAL per-step NLPs a real closed-loop prefix visits (free-time
AND fix-time steps).

Trajectory-agreement logic: the closed loop is a deterministic function
of the per-step NLP solutions (x0' = x_plan[:, 1], src/closed_loop.py:
416-419). If the oracle's solution matches the IPM's on every problem
the IPM-driven loop visits, an oracle-driven loop would traverse the
same states — so per-step solution agreement IS closed-loop trajectory
agreement.
"""

import numpy as np
import pytest

from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.runtime.closed_loop import (
    ClosedLoopRunner,
)
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.scenarios.demos import (
    get_demo,
)
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.solver.oracle import (
    solve_with_scipy,
)


def _sample(problems, want):
    """Pick `want` step indices covering both modes and the prefix ends."""
    fix = [i for i, p in enumerate(problems) if p["fixtime"]]
    free = [i for i, p in enumerate(problems) if not p["fixtime"]]
    picks = []
    for src in (free[:1], free[1:2], fix[:1], fix[len(fix) // 2:len(fix) // 2 + 1],
                fix[-1:], free[-1:]):
        picks.extend(src)
    seen = []
    for i in picks:
        if i not in seen:
            seen.append(i)
    return seen[:want]


@pytest.mark.slow
@pytest.mark.parametrize("demo_name,steps,n_oracle",
                         [("demo1", 12, 5), ("demo9", 10, 3)])
def test_closed_loop_matches_scipy_oracle(demo_name, steps, n_oracle):
    r = ClosedLoopRunner(get_demo(demo_name), max_steps=steps,
                         record_problems=True)
    res = r.run()
    assert not res.aborted_infeasible
    assert len(r.problems) == len(res.steps)

    checked_fix = 0
    for i in _sample(r.problems, n_oracle):
        p = r.problems[i]
        if not bool(p["res"].feas):
            continue
        z, sres = solve_with_scipy(p["spec"], p["data"], p["x_init"],
                                   maxiter=150)
        assert sres.constr_violation < 1e-6, (demo_name, p["k"])
        x_ipm = np.asarray(p["res"].z["x"])
        x_orc = np.asarray(z["x"])
        # the applied plant step (the trajectory-defining quantity)
        np.testing.assert_allclose(
            x_orc[:, 1], x_ipm[:, 1], atol=2e-4,
            err_msg=f"{demo_name} k={p['k']} oracle disagrees on the "
                    f"applied step")
        # the full open-loop plan
        np.testing.assert_allclose(
            x_orc, x_ipm, atol=2e-3,
            err_msg=f"{demo_name} k={p['k']} oracle open-loop plan differs")
        if "T" in z:
            assert abs(float(np.asarray(z["T"]))
                       - float(np.asarray(p["res"].z["T"]))) < 1e-3
        checked_fix += int(p["fixtime"])
    if demo_name == "demo1":
        assert checked_fix >= 1, "no fix-time step was oracle-checked"
