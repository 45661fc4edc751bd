"""Unit tests for the multistart wrapper's round-4 mechanisms:

  * ``skip`` — a skipped problem starts done, burns ZERO iterations and
    reports feas=False (the ladder-gating primitive the scanned loop and
    bench rely on; runtime/multistart.py),
  * ``z_override`` — candidate 0 polish-starts from a sibling solve's
    full iterate (mpc6 -> mpc8 rescue warm start) and converges in fewer
    iterations than the cold geometric start,
  * ``warm`` — shift-warm-started OBCA duals preserve the solution.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.models import (
    OBCASpec, build_obca_data, init_vars,
)
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.runtime import (
    astar_host,
)
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.runtime.multistart import (
    make_multistart_solver,
)
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.runtime.reference import (
    window_reference,
)
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.scenarios import (
    build_scenario, get_demo,
)
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.solver import (
    IPMOptions, make_obca_solver,
)


@pytest.fixture(scope="module")
def fix_problem():
    """One REAL recorded fix-time replan (bench fixture row 0 — a
    feasible demo1 step from the host closed loop) rebuilt as an
    OBCAData, exactly as bench.py's fix stage does."""
    import os

    fx = np.load(os.path.join(os.path.dirname(__file__), "..", "goldens",
                              "bench_fix_fixture.npz"))
    name = str(fx["demo"][0])
    demo = get_demo(name)
    scn, shape = build_scenario(demo)
    Nf = fx["xref"].shape[-1] - 1
    spec = OBCASpec(N=Nf, n_obs=shape.n_obs, e_max=shape.e_max,
                    variant="fix_terminal")
    spec8 = OBCASpec(N=Nf, n_obs=shape.n_obs, e_max=shape.e_max,
                     variant="fix_free_end")
    p = demo.params
    data = build_obca_data(
        spec, scn, x0=jnp.asarray(fx["x0"][0]),
        u0=jnp.asarray(fx["u0"][0]), xref=jnp.asarray(fx["xref"][0]),
        Ts=float(fx["Ts"][0]),
        dyn_active=jnp.asarray(fx["sensed"][0]),
        dyn_delta=jnp.asarray(fx["dyn_delta"][0]),
        Ts_pred=float(fx["Ts"][0]),
        terminal_set=jnp.asarray(fx["terminal_set"][0]),
        q=p.q_fix, r1=p.r1_fix, r2=p.r2_fix,
        v_max=p.v_max, w_max=p.w_max, a_max=p.a_max,
        alpha_max=p.alpha_max, ego=p.ego, dmin=p.dmin,
    )
    opt = IPMOptions(max_iters=100, acceptable_tol=5e-3, feas_tol=1e-4)
    xref = jnp.asarray(fx["xref"][0])
    cands = jnp.stack([xref.at[:, 0].set(jnp.asarray(fx["x0"][0]))] * 2)
    return spec, spec8, data, opt, cands


def test_skip_burns_zero_iterations(fix_problem):
    spec, _, data, opt, cands = fix_problem
    ms = make_multistart_solver(spec, make_obca_solver(spec, opt),
                                init_vars, 2)
    r_run, _ = ms(data, cands, jnp.asarray(False))
    r_skip, _ = ms(data, cands, jnp.asarray(True))
    assert bool(r_run.feas) and int(r_run.iters) > 0
    assert not bool(r_skip.feas)
    assert int(r_skip.iters) == 0


def test_z_override_polish_start_converges_faster(fix_problem):
    spec, spec8, data, opt, cands = fix_problem
    ms6 = make_multistart_solver(spec, make_obca_solver(spec, opt),
                                 init_vars, 2)
    ms8 = make_multistart_solver(spec8, make_obca_solver(spec8, opt),
                                 init_vars, 2)
    r6, _ = ms6(data, cands)
    assert bool(r6.feas)
    cold, _ = ms8(data, cands)
    warm, _ = ms8(data, cands, None, None, dict(r6.z))
    assert bool(cold.feas) and bool(warm.feas)
    # the sibling's iterate solves the relaxed NLP in a short polish
    assert int(warm.iters) <= int(cold.iters)
    # solutions land in the same basin: both feasible, comparable cost
    assert float(warm.f) <= float(cold.f) + 0.1 * (1 + abs(float(cold.f)))


def test_warm_duals_injection_and_gating(fix_problem):
    """Mechanism test: ``lam_init/mu_init`` actually reach the
    initializer (masked), and a warm tuple with ``valid=False`` is a
    bit-exact no-op. (Convergence from warm duals is deliberately NOT
    asserted: starting EXACTLY at a converged solve's degenerate
    contact multipliers is a boundary start that stalls interior-point
    methods — measured in round 4, and the reason the production warm
    start shifts the PREVIOUS step's duals onto a different window
    rather than restarting in place.)"""
    spec, _, data, opt, cands = fix_problem
    lam0 = jnp.ones((spec.n_k, spec.n_obs, spec.e_max)) * 0.25
    mu0 = jnp.ones((spec.n_k, spec.n_obs, 4)) * 0.125
    z0 = init_vars(spec, data, x_init=cands[0], lam_init=lam0,
                   mu_init=mu0)
    lam_mask = np.asarray(data.edge_mask * data.obs_mask[:, None])
    np.testing.assert_allclose(
        np.asarray(z0["lam"]),
        np.broadcast_to(0.25 * lam_mask[None],
                        np.asarray(z0["lam"]).shape), atol=0)
    assert np.all(np.asarray(z0["mu"])[
        :, np.asarray(data.obs_mask) > 0] == 0.125)

    ms = make_multistart_solver(spec, make_obca_solver(spec, opt),
                                init_vars, 2, warm_cands=(0, 1))
    base, _ = ms(data, cands)
    # gated-out warm (valid=False) reproduces the baseline exactly
    r0, _ = ms(data, cands, None, (lam0, mu0, jnp.asarray(False)))
    np.testing.assert_allclose(np.asarray(r0.z["x"]),
                               np.asarray(base.z["x"]), atol=0)
    assert int(r0.iters) == int(base.iters)
