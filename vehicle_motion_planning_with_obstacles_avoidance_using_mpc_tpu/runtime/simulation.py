"""Experiment driver — parity with the reference's ``simulation`` class
(src/simulation.py): one object exposing the open-loop pipeline (``run``,
:20-62), the closed-loop runtime (``run_closed_loop``, :64-112), the A*
front-end alone (``run_astar``, :114-123), the A*-vs-MPC state/input
comparison (``show_performance``, :125-208) and the wall-clock benchmark
(``calc_time``, :210-231).

All heavy lifting lives in :mod:`.open_loop`, :mod:`.closed_loop` and
:mod:`.astar_host`; this module only orchestrates and reports. Plot
functions live in :mod:`..viz` and are imported lazily so the compute
path never pulls matplotlib.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np


@dataclass
class TimingReport:
    """``calc_time`` result (reference prints, src/simulation.py:219-231).

    The reference's published numbers on its author's CPU: A* 0.0240 s
    (demo9), open-loop free-time N=10 3.69 s, N=74 136.69 s
    (src/simulation.py:223,230-231 comments).
    """

    demo: str
    astar_s: float
    open_loop_s: float
    open_loop_N: int
    open_loop_feas: bool
    extras: dict = field(default_factory=dict)


class Simulation:
    """Mirror of the reference's ``simulation`` driver (src/simulation.py:18).

    Stateless between calls except for cached results; construct once and
    call any entry with a demo name (demo1..demo11).
    """

    def __init__(self, dtype=None):
        import jax.numpy as jnp

        self.dtype = dtype or jnp.float64

    # -- open-loop two-phase pipeline (simulation.run, :20-62) ------------
    def run(self, demo_name: str, N: int = 50, gif_path: str | None = None,
            **kw):
        from .open_loop import run_open_loop

        res = run_open_loop(demo_name, N=N, dtype=self.dtype, **kw)
        if gif_path:
            from ..scenarios import get_demo
            from ..viz import animate_open_loop

            animate_open_loop(get_demo(demo_name), res, gif_path)
        return res

    # -- closed-loop MPC (simulation.run_closedLoop, :64-112) -------------
    def run_closed_loop(self, demo_name: str, max_steps: int = 30,
                        gif_path: str | None = None, verbose: bool = False,
                        **kw):
        from ..scenarios import get_demo
        from .closed_loop import ClosedLoopRunner

        legacy = kw.pop("legacy", None)  # "mpc1"/"mpc3" selects the
        # legacy drivers (src/closed_loop.py:142-321) over the live mpc4
        runner = ClosedLoopRunner(get_demo(demo_name), dtype=self.dtype,
                                  max_steps=max_steps, **kw)
        res = (runner.run_legacy(mode=legacy, verbose=verbose)
               if legacy else runner.run(verbose=verbose))
        if gif_path:
            from ..viz import animate_closed_loop

            animate_closed_loop(get_demo(demo_name), res, gif_path)
        return res

    # -- A* alone (simulation.run_aStar, :114-123) -------------------------
    def run_astar(self, demo_name: str, plot_path: str | None = None,
                  native: bool = False):
        from ..scenarios import build_scenario, get_demo
        from . import astar_host

        demo = get_demo(demo_name)
        scn, _ = build_scenario(demo, dtype=self.dtype)
        ref = astar_host.reference_path_for(
            np.asarray(scn.grid), demo.start, demo.goal, native=native
        )
        if plot_path:
            from ..viz import plot_comparison

            plot_comparison(demo, ref_path=ref, grid=np.asarray(scn.grid),
                            out_path=plot_path)
        return ref

    # -- state/input comparison (simulation.show_performance, :125-208) ---
    def show_performance(self, demo_name: str, N_open: int = 50,
                         N_closed: int | None = None, max_steps: int = 30,
                         out_prefix: str | None = None):
        """A* vs open-loop vs closed-loop trajectories and inputs.

        Reference (src/simulation.py:125-208) runs A*, an open-loop
        free-time solve at N=50 and the closed loop at N=5, then plots
        x/y/theta and v/omega against the step index. Note its own entry
        is broken (closed_loop_mpc4's return is commented out,
        src/closed_loop.py:443); this one works. Returns the assembled
        records; when ``out_prefix`` is given writes
        ``{prefix}_states.png`` / ``{prefix}_inputs.png`` /
        ``{prefix}_paths.png``.
        """
        import dataclasses as _dc

        from ..scenarios import build_scenario, get_demo

        demo = get_demo(demo_name)
        ref = self.run_astar(demo_name)
        open_res = self.run(demo_name, N=N_open)

        p = demo.params
        if N_closed is not None:
            p = _dc.replace(p, N_free=N_closed, N_fix=N_closed)
        closed = self.run_closed_loop(demo_name, max_steps=max_steps,
                                      params=p)

        records = {
            "A*": {"x": ref},
            "open-loop": {"x": open_res.x, "u": open_res.u,
                          "Ts": open_res.Ts_opt},
            "closed-loop": {
                "x": closed.x_history.T if closed.steps else None,
                "u": closed.u_history.T if closed.steps else None,
                "Ts": closed.ts_history if closed.steps else None,
            },
        }
        if out_prefix:
            from ..scenarios import build_scenario as _bs
            from ..viz import plot_comparison, plot_states_inputs

            scn, _ = _bs(demo, dtype=self.dtype)
            plot_states_inputs(records, out_prefix)
            trajs = {k: v["x"] for k, v in records.items()
                     if k != "A*" and v.get("x") is not None}
            plot_comparison(demo, ref_path=ref, trajs=trajs,
                            grid=np.asarray(scn.grid),
                            out_path=f"{out_prefix}_paths.png")
        return records

    # -- wall-clock benchmark (simulation.calc_time, :210-231) ------------
    def calc_time(self, demo_name: str = "demo9", N: int = 10,
                  native_astar: bool = False) -> TimingReport:
        from ..scenarios import build_scenario, get_demo
        from . import astar_host
        from .open_loop import run_open_loop

        demo = get_demo(demo_name)
        scn, _ = build_scenario(demo, dtype=self.dtype)
        grid = np.asarray(scn.grid)

        t0 = time.perf_counter()
        astar_host.reference_path_for(grid, demo.start, demo.goal,
                                      native=native_astar)
        astar_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        res = run_open_loop(demo_name, N=N, dtype=self.dtype)
        open_s = time.perf_counter() - t0

        return TimingReport(
            demo=demo_name, astar_s=astar_s, open_loop_s=open_s,
            open_loop_N=N, open_loop_feas=res.feas,
            extras={"reference_astar_s": 0.0240,
                    "reference_open_loop_N10_s": 3.69},
        )
