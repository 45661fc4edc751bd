"""Record the REAL fix-time replan population for the benchmark.

The bench's fix-time batch must measure the NLP family the closed loop
actually solves. Synthetic pose x obstacle-phase cross products create
physically-doomed configurations (vehicle sandwiched between the rising
crossing obstacle and the corridor wall) that the loop never visits —
they made the bench's "feasible fraction" meaningless. This script runs
the host closed loop on the corridor demos with per-step problem
recording and dumps every fix-time step's defining parameters
(x0, u0, Ts, obstacle displacement, terminal set) to
``goldens/bench_fix_fixture.npz``; bench.py tiles them into its batch.

Usage: python scripts/make_bench_fixture.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.runtime.closed_loop import (  # noqa: E402
    ClosedLoopRunner,
)
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.scenarios.demos import (  # noqa: E402
    get_demo,
)

# corridor-family demos (identical problem shape: 3 static obstacles,
# 1 crossing dynamic, e_max 4) — the fixture batch must be one shape
DEMOS = ["demo1", "demo2", "demo3", "demo5"]

rows = []
for name in DEMOS:
    r = ClosedLoopRunner(get_demo(name), record_problems=True)
    res = r.run()
    n_fix = 0
    for i, p in enumerate(r.problems):
        if not p["fixtime"] or not bool(p["res"].feas):
            continue
        d = p["data"]
        # previous step's converged OBCA duals (same (n_k, nO, E) shape
        # in every variant at N_fix == N_free) — the receding-horizon
        # warm start the production loop carries; step 0 is free-time so
        # every fix row has a predecessor
        zprev = r.problems[i - 1]["res"].z
        rows.append({
            "demo": name,
            "k": p["k"],
            "x0": np.asarray(d.x0, np.float64),
            "u0": np.asarray(d.u0, np.float64),
            "Ts": float(np.asarray(d.Ts)),
            "terminal_set": np.asarray(d.terminal_set, np.float64),
            # recover the world-state displacement of the dynamic
            # obstacles at this step (A/b were built from it)
            "dyn_delta": np.asarray(p["dyn_delta"], np.float64),
            "sensed": np.asarray(p["sensed"], np.float64),
            "xref": np.asarray(d.xref, np.float64),
            "prev_lam": np.asarray(zprev["lam"], np.float64),
            "prev_mu": np.asarray(zprev["mu"], np.float64),
        })
        n_fix += 1
    print(f"{name}: {n_fix} feasible fix-time steps recorded", flush=True)

out = os.path.join(os.path.dirname(__file__), "..", "goldens",
                   "bench_fix_fixture.npz")
np.savez_compressed(
    out,
    demo=np.asarray([r["demo"] for r in rows]),
    k=np.asarray([r["k"] for r in rows]),
    x0=np.stack([r["x0"] for r in rows]),
    u0=np.stack([r["u0"] for r in rows]),
    Ts=np.asarray([r["Ts"] for r in rows]),
    terminal_set=np.stack([r["terminal_set"] for r in rows]),
    dyn_delta=np.stack([r["dyn_delta"] for r in rows]),
    sensed=np.stack([r["sensed"] for r in rows]),
    xref=np.stack([r["xref"] for r in rows]),
    prev_lam=np.stack([r["prev_lam"] for r in rows]),
    prev_mu=np.stack([r["prev_mu"] for r in rows]),
)
print(f"wrote {out}: {len(rows)} fix-time replan rows")
