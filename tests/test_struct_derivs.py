"""Parity of the hand-derived structured KKT pieces (models/obca_struct)
against AD of the model functions — the correctness gate for the fused
Newton body. Every block (values, gradient, JE, JD, Lagrangian Hessian)
is reassembled dense and compared with jacfwd/jax.hessian at a
non-trivial iterate with random multipliers and row scales.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.models import (
    obca as _obca,
)
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.models.obca import (
    OBCASpec, init_vars,
)
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.models.obca_struct import (
    make_layout, make_provider,
)
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.models.builder import (
    build_obca_data,
)
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.scenarios import (
    build_scenario, get_demo,
)
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.runtime import (
    astar_host,
)
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.runtime.reference import (
    window_reference,
)


def _setup(variant, coupled=False, obca_k0=False, N=5, demo_name="demo1"):
    dtype = jnp.float64
    demo = get_demo(demo_name)
    scn, shape = build_scenario(demo, dtype=dtype)
    spec = OBCASpec(N=N, n_obs=shape.n_obs, e_max=shape.e_max,
                    variant=variant, coupled_motion=coupled,
                    obca_k0=obca_k0)
    ref = astar_host.reference_path_for(np.asarray(scn.grid), demo.start,
                                        demo.goal)
    refj = jnp.asarray(ref, dtype)
    x0 = jnp.asarray(ref[:, 4], dtype)
    xref = window_reference(refj, ref.shape[1], x0, N)
    p1 = demo.params
    kw = dict(q=p1.q_fix, r1=p1.r1_fix, r2=p1.r2_fix, v_max=p1.v_max,
              w_max=p1.w_max, a_max=p1.a_max, alpha_max=p1.alpha_max,
              ego=p1.ego, dmin=p1.dmin)
    if variant.startswith("fix"):
        kw["terminal_set"] = jnp.asarray(
            [[x0[0] - 50.0, 99.0], [1.0, 9.0]], dtype)
        # exercise moving obstacles over the horizon (cursor semantics)
        kw["Ts_pred"] = 0.1
        kw["dyn_active"] = jnp.ones((1,), dtype)
    data = build_obca_data(spec, scn, x0=x0, u0=jnp.asarray([0.1, 0.02], dtype),
                           xref=xref, Ts=0.1, **kw)
    if coupled:
        data = data._replace(obs_vel=jnp.asarray(
            np.random.RandomState(3).randn(spec.n_obs, 2) * 0.1, dtype))
    z0 = init_vars(spec, data)
    zv0, unravel = ravel_pytree(z0)
    # the solver's z_scale (make_obca_solver): x rows [10, 10, 3], T 30
    z_scale = jax.tree.map(jnp.ones_like, z0)
    z_scale["x"] = z_scale["x"] * jnp.asarray([[10.0], [10.0], [3.0]])
    if "T" in z_scale:
        z_scale["T"] = z_scale["T"] * 30.0
    ds = ravel_pytree(z_scale)[0]

    rng = np.random.RandomState(0)
    zv = zv0 / ds + jnp.asarray(rng.randn(zv0.shape[0]) * 0.05, dtype)

    lay, provider = make_provider(spec, np.asarray(ds))
    sf = jnp.asarray(0.7, dtype)
    scE = jnp.asarray(np.abs(rng.randn(lay.mE)) + 0.3, dtype)
    scD = jnp.asarray(np.abs(rng.randn(lay.mD)) + 0.3, dtype)
    y = jnp.asarray(rng.randn(lay.mE), dtype)
    w_d = jnp.asarray(np.abs(rng.randn(lay.mD)) + 0.1, dtype)

    def cEs(zv_):
        return scE * _obca.eq_constraints(spec, data, unravel(zv_ * ds))

    def cDs(zv_):
        return scD * _obca.ineq_constraints_dense(spec, data,
                                                  unravel(zv_ * ds))

    def fs(zv_):
        return sf * _obca.objective(spec, data, unravel(zv_ * ds))

    bundle = provider(zv, data, sf, scE, scD, y, w_d)
    return lay, spec, bundle, zv, (fs, cEs, cDs), (y, w_d)


CONFIGS = [
    ("free", False, False),
    ("free", False, True),
    ("free", True, False),
    ("fix_terminal", False, False),
    ("fix_free_end", False, False),
    ("fix_eq_band", False, False),
]


@pytest.mark.parametrize("variant,coupled,k0", CONFIGS)
def test_values_and_gradient(variant, coupled, k0):
    lay, spec, bnd, zv, (fs, cEs, cDs), _ = _setup(variant, coupled, k0)
    np.testing.assert_allclose(float(bnd.f), float(fs(zv)), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(bnd.cE), np.asarray(cEs(zv)),
                               rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(bnd.cD), np.asarray(cDs(zv)),
                               rtol=1e-9, atol=1e-10)
    g_ad = jax.grad(fs)(zv)
    np.testing.assert_allclose(np.asarray(bnd.g), np.asarray(g_ad),
                               rtol=1e-8, atol=1e-10)


def _dense_JE(lay, bnd):
    JE = np.zeros((lay.mE, lay.n))
    JE[np.arange(lay.mE_sp)[:, None], lay.p_idx[None, :]] = np.asarray(
        bnd.JE_sp)
    th_flat = lay.p_idx[lay.th_pos]
    for r in range(2):
        rows = lay.mE_sp + r * lay.K + np.arange(lay.K)
        JE[rows, th_flat] += np.asarray(bnd.JEb_th[:, r])
        JE[rows[:, None], lay.q_idx] += np.asarray(bnd.JEb_q[:, r, :])
    return JE


def _dense_JD(lay, bnd):
    JD = np.zeros((lay.mD, lay.n))
    JD[np.arange(lay.mD_sp)[:, None], lay.p_idx[None, :]] = np.asarray(
        bnd.JD_sp)
    slot_flat = lay.p_idx[lay.pq_pos]          # (S, K)
    for r in range(2):
        rows = lay.mD_sp + r * lay.K + np.arange(lay.K)
        for s in range(lay.S):
            JD[rows, slot_flat[s]] += np.asarray(bnd.JDb_p[:, r, s])
        JD[rows[:, None], lay.q_idx] += np.asarray(bnd.JDb_q[:, r, :])
    return JD


@pytest.mark.parametrize("variant,coupled,k0", CONFIGS)
def test_jacobians(variant, coupled, k0):
    lay, spec, bnd, zv, (fs, cEs, cDs), _ = _setup(variant, coupled, k0)
    JE_ad = np.asarray(jax.jacfwd(cEs)(zv))
    JD_ad = np.asarray(jax.jacfwd(cDs)(zv))
    np.testing.assert_allclose(_dense_JE(lay, bnd), JE_ad,
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(_dense_JD(lay, bnd), JD_ad,
                               rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("variant,coupled,k0", CONFIGS)
def test_hessian(variant, coupled, k0):
    lay, spec, bnd, zv, (fs, cEs, cDs), (y, w_d) = _setup(variant, coupled,
                                                          k0)

    def lag(zv_):
        return fs(zv_) - y @ cEs(zv_) - w_d @ cDs(zv_)

    H_ad = np.asarray(jax.hessian(lag)(zv))
    H = np.zeros((lay.n, lay.n))
    H[lay.p_idx[:, None], lay.p_idx[None, :]] = np.asarray(bnd.Hpp)
    slot_flat = lay.p_idx[lay.pq_pos]          # (S, K)
    for s in range(lay.S):
        H[slot_flat[s][:, None], lay.q_idx] += np.asarray(bnd.Hpq_c[:, s, :])
        H[lay.q_idx, slot_flat[s][:, None]] += np.asarray(bnd.Hpq_c[:, s, :])
    qf = lay.q_idx
    H[qf[:, :, None], qf[:, None, :]] += np.asarray(bnd.Hqq)
    np.testing.assert_allclose(H, H_ad, rtol=1e-7, atol=1e-9)
