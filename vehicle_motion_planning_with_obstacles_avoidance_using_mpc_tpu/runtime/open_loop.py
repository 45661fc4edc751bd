"""Open-loop two-phase pipeline — the reference's ``simulation.run``
(src/simulation.py:20-62) driving ``mpc_openLoop_freeTime`` /
``mpc_openLoop_fixTime`` (src/closed_loop.py:113-140).

Phase 1 (free-time): static obstacles only, 'startGoal_only' reference
(src/closed_loop.py:535-544), solves the time scale Topt (obca_mpc4,
src/obca.py:828).  Phase 2 (fix-time): re-interpolates phase 1's plan to
N_fix points with the Ts rescale (src/closed_loop.py:570-587), adds the
dynamic obstacles predicted over the horizon and the terminal set, and
solves obca_mpc6 with the obca_mpc8 free-end fallback
(src/closed_loop.py:122-140).

The goal-only NLP at large N is nonconvex with many local basins, so the
free-time phase multi-starts from {goal-only, linear-interpolation, A*
path} initializations — replacing IPOPT's feasibility-restoration
robustness with batched multi-start, which on TPU costs one vmap lane
each.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..models import OBCASpec, build_obca_data, init_vars
from ..scenarios.build import build_scenario
from ..scenarios.demos import MPCParams, get_demo
from ..solver import IPMOptions, make_obca_solver
from . import astar_host
from .multistart import make_multistart_solver
from .reference import (
    reinterpolate_openloop,
    start_goal_reference,
    start_goal_smooth_reference,
)


@dataclass
class OpenLoopResult:
    demo: str
    feas: bool
    x: np.ndarray          # (3, N+1) final plan (phase 2 if run, else 1)
    u: np.ndarray          # (2, N)
    Ts_opt: float
    free: dict             # phase-1 record: x, u, Ts_opt, feas, iters
    fix: dict | None       # phase-2 record (None when no dynamic obstacles)


def _resampled_astar_init(scn, demo, N, dtype, dilation=0, align_start=False):
    """A* path resampled to N+1 columns with recomputed headings.

    ``dilation`` runs the search on a disk-dilated grid so the knots keep
    clearance from walls (the raw path hugs corners, which at large
    inter-knot spacing leaves the ego box penetrating at the knots).
    ``align_start`` replaces knot 1 so the first chord points along the
    fixed start heading — the init equality x_0 == x0 pins theta_0, and
    the unicycle can only leave x0 along it; a misaligned first chord is
    a local infeasibility the IPM cannot repair without a restoration
    phase (IPOPT-style), so the candidate set repairs it instead.
    """
    grid = np.asarray(scn.grid)
    if dilation > 0:
        from ..ops.rasterize import dilate_grid

        g = np.array(dilate_grid(grid, dilation))
        g[int(demo.start[1]), int(demo.start[0])] = 0
        g[int(demo.goal[1]), int(demo.goal[0])] = 0
        try:
            ref = astar_host.reference_path_for(g, demo.start, demo.goal)
        except ValueError:  # dilation sealed the corridor — fall back
            ref = astar_host.reference_path_for(grid, demo.start, demo.goal)
    else:
        ref = astar_host.reference_path_for(grid, demo.start, demo.goal)
    L = ref.shape[1]
    idx = np.linspace(0, L - 1, N + 1)
    xy = np.stack([np.interp(idx, np.arange(L), ref[i]) for i in range(2)])
    if align_start:
        d1 = float(np.hypot(*(xy[:, 1] - xy[:, 0])))
        th0 = float(demo.start[2])
        xy[:, 1] = np.asarray(demo.start[:2]) + d1 * np.array(
            [np.cos(th0), np.sin(th0)])
    th = np.arctan2(np.diff(xy[1]), np.diff(xy[0]))
    th = np.concatenate([th, th[-1:]])
    out = np.concatenate([xy, th[None]])
    out[:, 0] = np.asarray(demo.start)
    return jnp.asarray(out, dtype)


def run_open_loop(demo_name: str, N: int = 50, N_fix: int | None = None,
                  params: MPCParams | None = None, dtype=jnp.float64,
                  ipm_options: IPMOptions | None = None,
                  fix_phase: bool = True) -> OpenLoopResult:
    """Two-phase open-loop pipeline (see module docstring).

    ``fix_phase=False`` stops after the free-time phase even when the
    demo has dynamic obstacles — the reference's ``calc_time`` benchmark
    entry does exactly this (src/simulation.py:225-229), and on demo1 at
    N >= 50 the fix-time phase is genuinely marginal (the crossing
    obstacle's predicted sweep covers the whole corridor over the long
    horizon), so callers that only need the free-time plan skip it.
    """
    demo = get_demo(demo_name)
    p = params or demo.params
    scn, shape = build_scenario(demo, dtype=dtype)
    opt = ipm_options or IPMOptions(
        max_iters=200, acceptable_tol=5e-3, feas_tol=1e-4
    )
    N_fix = N_fix or N

    # ---- phase 1: free-time, static world -------------------------------
    spec_f = OBCASpec(N=N, n_obs=shape.n_obs, e_max=shape.e_max,
                      variant="free")
    solve_f = make_multistart_solver(
        spec_f, make_obca_solver(spec_f, opt), init_vars, 5
    )
    xref = start_goal_reference(scn.start, scn.goal, N).astype(dtype)
    data_f = build_obca_data(
        spec_f, scn, x0=scn.start, u0=jnp.zeros(2, dtype), xref=xref,
        Ts=p.Ts, q=p.q_free, r1=p.r1_free, r2=p.r2_free,
        v_max=p.v_max, w_max=p.w_max, a_max=p.a_max, alpha_max=p.alpha_max,
        ego=p.ego, dmin=p.dmin, time_c1=p.time_c1, time_c2=p.time_c2,
    )
    cands = jnp.stack([
        xref,
        start_goal_smooth_reference(scn.start, scn.goal, N).astype(dtype),
        _resampled_astar_init(scn, demo, N, dtype),
        _resampled_astar_init(scn, demo, N, dtype, dilation=2,
                              align_start=True),
        _resampled_astar_init(scn, demo, N, dtype, dilation=1,
                              align_start=True),
    ])
    res_f, _ = solve_f(data_f, cands)
    Ts_opt = float(res_f.z["T"]) * p.Ts  # src/obca.py:1059
    free_rec = {
        "x": np.asarray(res_f.z["x"]), "u": np.asarray(res_f.z["u"]),
        "Ts_opt": Ts_opt, "feas": bool(res_f.feas),
        "iters": int(res_f.iters), "kkt_err": float(res_f.kkt_err),
    }

    has_dyn = bool(np.asarray(scn.d_mask).any()) and fix_phase
    if not has_dyn:
        return OpenLoopResult(
            demo=demo_name, feas=free_rec["feas"], x=free_rec["x"],
            u=free_rec["u"], Ts_opt=Ts_opt, free=free_rec, fix=None,
        )

    # ---- phase 2: fix-time, dynamic world --------------------------------
    # re-interpolate phase-1 plan to N_fix points + Ts rescale
    # (src/closed_loop.py:124-125 -> update_path allAviable=1, :570-587)
    xref2, N_new = reinterpolate_openloop(
        jnp.asarray(free_rec["x"], dtype), N, N_fix
    )
    Ts2 = (N * Ts_opt) / N_new
    terminal_set = demo.terminal_policy.resolve(np.asarray(scn.start))

    spec_x = OBCASpec(N=N_new, n_obs=shape.n_obs, e_max=shape.e_max,
                      variant="fix_terminal")
    solve_x = make_multistart_solver(
        spec_x, make_obca_solver(spec_x, opt), init_vars, 2
    )
    data_x = build_obca_data(
        spec_x, scn, x0=scn.start, u0=jnp.zeros(2, dtype), xref=xref2,
        Ts=Ts2,
        dyn_active=jnp.asarray(np.asarray(scn.d_mask), dtype),
        dyn_delta=jnp.zeros_like(scn.dyn_info[:, :2]),
        Ts_pred=Ts2, terminal_set=terminal_set,
        q=p.q_fix, r1=p.r1_fix, r2=p.r2_fix,
        v_max=p.v_max, w_max=p.w_max, a_max=p.a_max, alpha_max=p.alpha_max,
        ego=p.ego, dmin=p.dmin,
    )
    cands2 = jnp.stack([xref2, xref2])
    res_x, _ = solve_x(data_x, cands2)
    fallback = False
    if not bool(res_x.feas):  # src/closed_loop.py:134-140
        spec_8 = OBCASpec(N=N_new, n_obs=shape.n_obs, e_max=shape.e_max,
                          variant="fix_free_end")
        solve_8 = make_multistart_solver(
            spec_8, make_obca_solver(spec_8, opt), init_vars, 2
        )
        res_x, _ = solve_8(data_x, cands2)
        fallback = True
    fix_rec = {
        "x": np.asarray(res_x.z["x"]), "u": np.asarray(res_x.z["u"]),
        "Ts_opt": Ts2, "feas": bool(res_x.feas), "fallback": fallback,
        "iters": int(res_x.iters), "kkt_err": float(res_x.kkt_err),
    }
    return OpenLoopResult(
        demo=demo_name, feas=fix_rec["feas"], x=fix_rec["x"], u=fix_rec["u"],
        Ts_opt=Ts2, free=free_rec, fix=fix_rec,
    )
