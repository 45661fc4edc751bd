"""Assemble OBCAData tensors from a Scenario + runtime loop state.

This replaces the reference's per-step constraint plumbing
(``closedLoop.update_obstacle_constraint`` -> ``rebuild_lObs`` ->
``obstacle_H_Represent``, src/closed_loop.py:488-500) with dense masked
tensor construction: static + dynamic obstacle slots always present at a
fixed shape; which ones the NLP sees is pure data (masks), so a single
compiled solver serves every step of every demo.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import geometry
from ..scenarios.build import Scenario, ShapeSpec
from .obca import OBCAData, OBCASpec


def build_obca_data(
    spec: OBCASpec,
    scn: Scenario,
    *,
    x0,
    u0,
    xref,
    Ts,
    dyn_active=None,
    dyn_delta=None,
    Ts_pred=None,
    terminal_set=None,
    q=0.1,
    r1=0.01,
    r2=0.1,
    p=None,
    v_max=0.6,
    w_max=jnp.pi / 6,
    a_max=0.6,
    alpha_max=jnp.pi / 6,
    ego=(1.7, 0.75, 1.7, 0.75),
    dmin=0.05,
    time_c1=10.0,
    time_c2=1.0,
    t_bounds=None,
) -> OBCAData:
    """Build the NLP data for one solve.

    Args:
      spec: static shapes; ``spec.n_obs`` must equal nS + nD of ``scn``.
      x0: (3,) current state;  u0: (2,) previously applied input.
      xref: (3, N+1) reference window.
      Ts: sampling time entering the NLP dynamics/cost (the runtime's
          *current* Ts — the reference mutates it, src/closed_loop.py:587).
      dyn_active: (nD,) 1.0 for dynamic obstacles the NLP must avoid
          (sensed this step); None -> none (free-time branch,
          src/closed_loop.py:355 passes dynObs_exist=0).
      dyn_delta: (nD, 2) displacement of each dynamic obstacle from its
          spawn pose (world state advanced by the runtime); None -> zeros.
      Ts_pred: sampling time used to predict obstacle motion over the
          horizon (the reference passes Ts_opt, src/closed_loop.py:374);
          None -> obstacles frozen, reproducing the free-time variants'
          cursor-reset semantics (src/obca.py:968-969).
      terminal_set: (2, 2) for the 'fix_terminal' variant.
      q/r1/r2/p: scalar weights (Q = q*I etc., src/closed_loop.py:77-101);
          p defaults to q (P = Q, src/closed_loop.py:81).
    """
    dtype = scn.sA.dtype
    N = spec.N
    nS = scn.sA.shape[0]
    nD = scn.dA.shape[0]
    assert spec.n_obs == nS + nD, (spec.n_obs, nS, nD)

    if dyn_active is None:
        dyn_active = jnp.zeros((nD,), dtype)
    if dyn_delta is None:
        dyn_delta = jnp.zeros((nD, 2), dtype)
    dyn_active = dyn_active * scn.d_mask

    # dynamic obstacles at their current world position
    db_now = geometry.translate_hrep_b(scn.dA, scn.db, dyn_delta)

    A_all = jnp.concatenate([scn.sA, scn.dA], axis=0)
    b_all = jnp.concatenate([scn.sb, db_now], axis=0)
    edge_mask = jnp.concatenate([scn.s_edge_mask, scn.d_edge_mask], axis=0)
    obs_mask = jnp.concatenate([scn.s_mask, dyn_active], axis=0)

    if Ts_pred is None:
        vel = jnp.zeros((nS + nD, 2), dtype)
        Ts_rep = jnp.asarray(0.0, dtype)
    else:
        vel = jnp.concatenate(
            [jnp.zeros((nS, 2), dtype), scn.d_vel * dyn_active[:, None]], axis=0
        )
        Ts_rep = jnp.asarray(Ts_pred, dtype)
    A_t, b_t = geometry.replicate_hrep_over_horizon(A_all, b_all, vel, N, Ts_rep)

    x0 = jnp.asarray(x0, dtype)
    xref = jnp.asarray(xref, dtype)
    Ts = jnp.asarray(Ts, dtype)
    p = q if p is None else p

    # free-time bounds on the time scale (src/obca.py:961-963 — the
    # signed coordinate-sum "distance", reproduced as-is). ``t_bounds``
    # overrides both, covering the legacy variants' alternatives:
    # obca/obca2 'timeScale_size' (src/obca.py:234-240) and obca_mpc7's
    # [0.8, 1.2] box (src/obca.py:1207).
    if t_bounds is None:
        dis = (xref[0, N] - x0[0]) + (xref[1, N] - x0[1])
        T_max = dis / (N * v_max * Ts) + 1.0
        T_lo = jnp.asarray(1e-4, dtype)
    else:
        T_lo = jnp.asarray(t_bounds[0], dtype)
        T_max = jnp.asarray(t_bounds[1], dtype)

    ego = jnp.asarray(ego, dtype)
    L = ego[0] + ego[2]
    W = ego[1] + ego[3]
    ego_g = jnp.stack([L / 2, W / 2, L / 2, W / 2])
    ego_offset = (ego[0] + ego[2]) / 2 - ego[2]

    if terminal_set is None:
        terminal_set = jnp.zeros((2, 2), dtype)

    eye = lambda k, c: jnp.asarray(c, dtype) * jnp.eye(k, dtype=dtype)
    return OBCAData(
        x0=x0,
        u0=jnp.asarray(u0, dtype),
        xref=xref,
        A=A_t,
        b=b_t,
        edge_mask=edge_mask,
        obs_mask=obs_mask,
        x_lo=scn.x_lo,
        x_hi=scn.x_hi,
        u_lo=jnp.asarray([-v_max, -w_max], dtype),
        u_hi=jnp.asarray([v_max, w_max], dtype),
        Q=eye(3, q),
        R1=eye(2, r1),
        R2=eye(2, r2),
        P=eye(3, p),
        Ts=Ts,
        dmin=jnp.asarray(dmin, dtype),
        ego_g=ego_g,
        ego_offset=ego_offset,
        terminal_set=jnp.asarray(terminal_set, dtype),
        T_max=jnp.asarray(T_max, dtype),
        a_max=jnp.asarray(a_max, dtype),
        alpha_max=jnp.asarray(alpha_max, dtype),
        time_c1=jnp.asarray(time_c1, dtype),
        time_c2=jnp.asarray(time_c2, dtype),
        T_lo=T_lo,
        # world velocities for spec.coupled_motion (in-graph prediction);
        # zero for static obstacles and un-sensed dynamic ones
        obs_vel=jnp.concatenate(
            [jnp.zeros((nS, 2), dtype), scn.d_vel * dyn_active[:, None]],
            axis=0,
        ),
    )
