"""Run the host closed loop on every demo and record golden trajectories.

The reference's de-facto integration tests are its named demos
(src/demo_setting.py:82-341) run through ``closed_loop_mpc4``
(src/closed_loop.py:323-443, k capped at 30). This script is the golden
generator: for each demo it runs :class:`ClosedLoopRunner` with the demo's
recommended tuning and dumps (x, u, Ts, flags) into ``goldens/<demo>.npz``
for the regression tests in ``tests/test_demos_e2e.py``.

Usage: python scripts/run_demos.py [demo1 demo2 ...]   (default: all)
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.runtime.closed_loop import (  # noqa: E402
    run_closed_loop,
)
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.scenarios.demos import (  # noqa: E402
    demo_names,
)


def main():
    names = sys.argv[1:] or demo_names()
    outdir = os.path.join(os.path.dirname(__file__), "..", "goldens")
    os.makedirs(outdir, exist_ok=True)
    summary = []
    for name in names:
        t0 = time.time()
        res = run_closed_loop(name, verbose=True)
        dt = time.time() - t0
        goal = np.asarray(
            __import__(
                "vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.scenarios.demos",
                fromlist=["get_demo"],
            ).get_demo(name).goal
        )
        d_end = float(np.hypot(res.x_history[-1, 0] - goal[0],
                               res.x_history[-1, 1] - goal[1]))
        d_start = float(np.hypot(res.steps[0].x[0] - goal[0],
                                 res.steps[0].x[1] - goal[1]))
        row = dict(
            demo=name, steps=len(res.steps), reached=res.reached_goal,
            aborted=res.aborted_infeasible, d_end=round(d_end, 3),
            frac=round(1 - d_end / max(d_start, 1e-9), 3), secs=round(dt, 1),
            fallbacks=sum(s.fallback for s in res.steps),
            fixsteps=sum(s.fixtime for s in res.steps),
        )
        summary.append(row)
        print("SUMMARY", row, flush=True)
        np.savez(
            os.path.join(outdir, f"{name}.npz"),
            x=res.x_history, u=res.u_history, ts=res.ts_history,
            reached=res.reached_goal, aborted=res.aborted_infeasible,
            fixtime=np.asarray([s.fixtime for s in res.steps]),
            fallback=np.asarray([s.fallback for s in res.steps]),
            ref=res.x_ref,
        )
    print("\n=== all demos ===")
    for row in summary:
        print(row)


if __name__ == "__main__":
    main()
