"""Interior-point solver tests: tiny-NLP oracle parity, OBCA window solves,
physics property checks, and batched vmap behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.models import (
    OBCASpec,
    build_obca_data,
    init_vars,
    signed_clearance,
)
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.runtime import (
    astar_host,
)
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.runtime.reference import (
    window_reference,
)
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.scenarios import (
    build_scenario,
    get_demo,
)
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.solver import (
    IPMOptions,
    build_solver,
    make_obca_solver,
)


def test_ipm_matches_slsqp_on_tiny_nlp():
    def f(z, p):
        return (z["x"] - 2.0) ** 2 + (z["y"] - 1.0) ** 2

    def cE(z, p):
        return jnp.stack([z["x"] + z["y"] - 2.0])

    def cI(z, p):
        return jnp.stack([z["x"] - 0.5, z["y"] - z["x"] ** 2 + 1.0])

    z0 = {"x": jnp.asarray(0.0), "y": jnp.asarray(0.0)}
    res = build_solver(f, cE, cI, z0)(z0, None)
    assert bool(res.converged)

    from scipy.optimize import minimize

    r = minimize(
        lambda v: (v[0] - 2) ** 2 + (v[1] - 1) ** 2,
        [0, 0],
        method="SLSQP",
        constraints=[
            {"type": "eq", "fun": lambda v: v[0] + v[1] - 2},
            {"type": "ineq",
             "fun": lambda v: np.array([v[0] - 0.5, v[1] - v[0] ** 2 + 1])},
        ],
    )
    np.testing.assert_allclose(float(res.z["x"]), r.x[0], atol=1e-5)
    np.testing.assert_allclose(float(res.z["y"]), r.x[1], atol=1e-5)


@pytest.fixture(scope="module")
def demo1_window_problem():
    spec_d = get_demo("demo1")
    scn, shape = build_scenario(spec_d, dtype=jnp.float64)
    N = 6
    spec = OBCASpec(N=N, n_obs=shape.n_obs, e_max=shape.e_max, variant="free")
    ref = astar_host.reference_path_for(
        np.asarray(scn.grid), spec_d.start, spec_d.goal
    )
    xref = window_reference(jnp.asarray(ref), ref.shape[1],
                            jnp.asarray(spec_d.start), N)
    data = build_obca_data(spec, scn, x0=scn.start, u0=jnp.zeros(2),
                           xref=xref, Ts=0.1)
    return spec, data


def test_free_time_window_solve_properties(demo1_window_problem):
    spec, data = demo1_window_problem
    solve = make_obca_solver(spec, IPMOptions(max_iters=100))
    res = solve(data, init_vars(spec, data))
    assert bool(res.feas), (float(res.kkt_err), float(res.viol))

    x = np.asarray(res.z["x"])
    u = np.asarray(res.z["u"])
    T = float(res.z["T"])
    dt = T * 0.1

    # dynamics satisfied to solver tolerance
    for k in range(spec.N):
        np.testing.assert_allclose(
            x[0, k + 1], x[0, k] + dt * u[0, k] * np.cos(x[2, k]), atol=1e-5
        )
        np.testing.assert_allclose(
            x[1, k + 1], x[1, k] + dt * u[0, k] * np.sin(x[2, k]), atol=1e-5
        )
        np.testing.assert_allclose(x[2, k + 1], x[2, k] + dt * u[1, k], atol=1e-5)

    # input bounds
    assert np.all(np.abs(u[0]) <= 0.6 + 1e-6)
    assert np.all(np.abs(u[1]) <= np.pi / 6 + 1e-6)

    # initial / terminal equality
    np.testing.assert_allclose(x[:, 0], np.asarray(data.x0), atol=1e-6)
    np.testing.assert_allclose(x[:, -1], np.asarray(data.xref)[:, -1], atol=1e-5)

    # no obstacle penetration: dual clearance value >= dmin
    clr = np.asarray(signed_clearance(spec, data, res.z))
    mask = np.asarray(data.obs_mask)
    assert np.all(clr[:, mask > 0] >= 0.05 - 1e-4)


def test_free_time_solve_batched_vmap(demo1_window_problem):
    spec, data = demo1_window_problem
    solve = make_obca_solver(spec, IPMOptions(max_iters=100))
    z0 = init_vars(spec, data)
    batch = 3
    datab = jax.tree.map(lambda a: jnp.stack([a] * batch), data)
    z0b = jax.tree.map(lambda a: jnp.stack([a] * batch), z0)
    resb = jax.vmap(solve)(datab, z0b)
    assert resb.feas.shape == (batch,)
    assert bool(jnp.all(resb.feas))
    # identical problems -> identical answers
    xb = np.asarray(resb.z["x"])
    np.testing.assert_allclose(xb[0], xb[1], atol=1e-12)


def test_infeasible_problem_reports_infeasible():
    """A goal outside the map with an over-tight time bound must come back
    feas=False (status codes instead of exceptions, SURVEY.md section 5)."""
    spec_d = get_demo("demo1")
    scn, shape = build_scenario(spec_d, dtype=jnp.float64)
    N = 4
    spec = OBCASpec(N=N, n_obs=shape.n_obs, e_max=shape.e_max, variant="free")
    xref = jnp.tile(jnp.asarray([[38.0], [4.0], [0.0]]), (1, N + 1))
    xref = xref.at[:, 0].set(jnp.asarray([3.0, 4.0, 0.0]))
    data = build_obca_data(spec, scn, x0=jnp.asarray([3.0, 4.0, 0.0]),
                           u0=jnp.zeros(2), xref=xref, Ts=0.1)
    # T_max ~ dis/(N vmax Ts)+1; shrink it so the horizon cannot reach
    data = data._replace(T_max=jnp.asarray(2.0))
    solve = make_obca_solver(spec, IPMOptions(max_iters=60))
    res = solve(data, init_vars(spec, data))
    assert not bool(res.feas)
    assert np.isfinite(float(res.viol))


def test_hessian_coloring_matches_dense_hessian(demo1_window_problem):
    """The star-coloring compressed Hessian (spine probes + one probe per
    block slot, solver/ipm.py hessian_coloring) must reproduce
    jax.hessian exactly: same Newton systems, same iterates. Any Hessian
    term coupling two distinct dual blocks would break this."""
    spec, data = demo1_window_problem
    s_col = make_obca_solver(spec, IPMOptions(kkt="arrow"))
    s_dense = make_obca_solver(
        spec, IPMOptions(kkt="arrow", hessian_coloring=False))
    rc = jax.jit(s_col)(data)
    rd = jax.jit(s_dense)(data)
    assert bool(rc.feas) and bool(rd.feas)
    assert int(rc.iters) == int(rd.iters)
    np.testing.assert_allclose(
        np.asarray(rc.z["x"]), np.asarray(rd.z["x"]), rtol=1e-7, atol=1e-8
    )


def test_arrow_kkt_matches_dense_al_chol(demo1_window_problem):
    """The block-arrow factorization must solve the exact same KKT
    systems as the dense al_chol path: same iterates, same solution.
    Any term coupling two distinct (k, i) dual blocks would break this
    (the arrow gather silently drops out-of-pattern entries)."""
    spec, data = demo1_window_problem
    s_arrow = make_obca_solver(spec, IPMOptions(kkt="arrow"))
    s_dense = make_obca_solver(spec, IPMOptions(kkt="al_chol"))
    ra = jax.jit(s_arrow)(data)
    rd = jax.jit(s_dense)(data)
    assert bool(ra.feas) and bool(rd.feas)
    np.testing.assert_allclose(
        np.asarray(ra.z["x"]), np.asarray(rd.z["x"]), rtol=1e-6, atol=1e-6
    )
    assert int(ra.iters) == int(rd.iters)


@pytest.mark.parametrize("variant", ["free", "fix_terminal"])
def test_spine_coloring_matches_full(demo1_window_problem, variant):
    """Grouped spine probes (models/obca.py hessian_spine_probes: one
    summed probe per structurally-orthogonal column set, 3.4x fewer HVPs)
    must reproduce the per-column probe Hessian exactly — same Newton
    systems, same iterates. A missing entry in the static pattern would
    diverge the iterate sequence immediately."""
    spec0, data0 = demo1_window_problem
    import dataclasses

    spec = dataclasses.replace(spec0, variant=variant)
    data = data0  # the same data tensor serves both variants
    s_grp = make_obca_solver(spec, IPMOptions(kkt="arrow"))
    s_col = make_obca_solver(
        spec, IPMOptions(kkt="arrow", spine_coloring=False))
    rg = jax.jit(s_grp)(data)
    rc = jax.jit(s_col)(data)
    assert int(rg.iters) == int(rc.iters)
    np.testing.assert_allclose(
        np.asarray(rg.z["x"]), np.asarray(rc.z["x"]), rtol=1e-9, atol=1e-10
    )
    np.testing.assert_allclose(
        float(rg.kkt_err), float(rc.kkt_err), rtol=1e-6, atol=1e-12
    )


def test_spine_coloring_matches_full_coupled_motion(demo1_window_problem):
    """coupled_motion adds the (T, lambda) Hessian coupling — exercised
    through the T-probe Hpq slice of the grouped pattern."""
    spec0, data = demo1_window_problem
    import dataclasses

    spec = dataclasses.replace(spec0, coupled_motion=True)
    data = data._replace(
        obs_vel=jnp.ones_like(data.obs_vel) * 0.05)
    s_grp = make_obca_solver(spec, IPMOptions(kkt="arrow"))
    s_col = make_obca_solver(
        spec, IPMOptions(kkt="arrow", spine_coloring=False))
    rg = jax.jit(s_grp)(data)
    rc = jax.jit(s_col)(data)
    assert int(rg.iters) == int(rc.iters)
    np.testing.assert_allclose(
        np.asarray(rg.z["x"]), np.asarray(rc.z["x"]), rtol=1e-9, atol=1e-10
    )


@pytest.mark.parametrize("variant", ["free", "fix_terminal", "fix_free_end"])
def test_fused_matches_arrow(demo1_window_problem, variant):
    """The fused analytic Newton body (kkt='fused', models/obca_struct)
    must solve the exact same KKT systems as the AD-assembled arrow path:
    same iterate sequence, same solution. Any error in a hand-derived
    Jacobian/Hessian block diverges the iterates immediately."""
    import dataclasses

    spec0, data = demo1_window_problem
    spec = dataclasses.replace(spec0, variant=variant)
    s_fused = make_obca_solver(spec, IPMOptions(kkt="fused"))
    s_arrow = make_obca_solver(spec, IPMOptions(kkt="arrow"))
    rf = jax.jit(s_fused)(data)
    ra = jax.jit(s_arrow)(data)
    assert bool(rf.feas) == bool(ra.feas)
    assert abs(int(rf.iters) - int(ra.iters)) <= 1, (
        int(rf.iters), int(ra.iters))
    np.testing.assert_allclose(
        np.asarray(rf.z["x"]), np.asarray(ra.z["x"]), rtol=1e-6, atol=1e-7)


def test_fused_matches_arrow_coupled_motion(demo1_window_problem):
    """coupled_motion adds the (T, lambda) couplings (S = 4 slots)."""
    import dataclasses

    spec0, data = demo1_window_problem
    spec = dataclasses.replace(spec0, coupled_motion=True)
    data = data._replace(obs_vel=jnp.ones_like(data.obs_vel) * 0.05)
    s_fused = make_obca_solver(spec, IPMOptions(kkt="fused"))
    s_arrow = make_obca_solver(spec, IPMOptions(kkt="arrow"))
    rf = jax.jit(s_fused)(data)
    ra = jax.jit(s_arrow)(data)
    assert bool(rf.feas) == bool(ra.feas)
    assert abs(int(rf.iters) - int(ra.iters)) <= 1
    np.testing.assert_allclose(
        np.asarray(rf.z["x"]), np.asarray(ra.z["x"]), rtol=1e-6, atol=1e-7)
