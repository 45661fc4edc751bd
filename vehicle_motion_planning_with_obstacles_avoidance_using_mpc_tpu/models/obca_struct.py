"""Hand-derived structured KKT derivatives for the OBCA NLP.

This is the "fused Newton body" substrate: every gradient, constraint
Jacobian, and Lagrangian-Hessian block of the OBCA problem
(:mod:`.obca`, restating src/obca.py:828-1758) written out analytically
in the KKT system's block-arrow coordinates, so the interior-point
iteration (solver/ipm.py, kkt='fused') never calls jacrev/jvp and never
materializes a dense (m, n) Jacobian or (n, n) Hessian.

Why this exists: the AD-assembled iteration body measured ~21 us/lane-
iteration flat across batch sizes on TPU — bound by the ~0.5 MB/lane of
Jacobian/Hessian-probe traffic and the ~12k-op HLO body, at 0.11% of the
perfect-fusion HBM floor (BENCH_r04). The OBCA structure makes all of
that unnecessary:

  * every constraint row touches at most ONE (k, obstacle) dual block
    {lam_ki, mu_ki} plus a handful of trajectory ("spine") variables;
  * the dynamics rows couple only (x_k, x_{k+1}, u_k[, T]);
  * all second derivatives are tiny closed-form expressions in
    (cos th, sin th, q1 = A^T lam, T).

So the whole Newton system is assembled as batched (K, .)-shaped
tensors plus one dense (np, np) spine block, where K = n_k * n_obs and
np = 3(N+1) + 2N (+1) — ~40 KB per lane instead of ~500 KB.

Variable flat order (matches ravel_pytree of the solver's z dict,
sorted keys 'T','lam','mu','u','x'):

    [T] lam(n_k, nO, E) mu(n_k, nO, 4) u(2, N) x(3, N+1)

Spine order (positions into the np-vector, matching the arrow
complement p_idx of models/obca.py:arrow_layout):

    [T] u[0, 0..N-1] u[1, 0..N-1] x[0, 0..N] x[1, 0..N] x[2, 0..N]

Equality row order (models/obca.py:eq_constraints):
    dyn r1(N) r2(N) r3(N) | init(3) | terminal(3/2/0) | g1(K) | g2(K)
Dense inequality row order (models/obca.py:ineq_constraints_dense):
    accel(4N) | terminal(3/2/0) | norm(K) | dist(K)

All pieces are returned SCALED: rows by the solver's per-lane row
scales (scE/scD), the objective by sf, columns/variables by the
solver's d_scale (chain rule d/dzv = d/dz * ds). The provider is
called with scE = scD = sf = 1 once at init to compute those very row
scales (gradient-based scaling needs row-wise max |J|).

Parity with the AD path is enforced by tests/test_struct_derivs.py,
which compares every block against jacfwd/jax.hessian of the model
functions on real demo data for all variants.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np

import jax.numpy as jnp

from . import obca as _obca
from .obca import OBCAData, OBCASpec


class KKTBundle(NamedTuple):
    """All first/second-order pieces at one iterate, scaled, arrow-form."""

    f: jnp.ndarray        # ()   sf * objective value
    g: jnp.ndarray        # (n,)  gradient of sf*f wrt zv
    cE: jnp.ndarray       # (mE,) scaled equality residuals
    cD: jnp.ndarray       # (mD,) scaled dense-inequality residuals
    JE_sp: jnp.ndarray    # (mE_sp, np) spine eq rows vs spine vars
    JEb_th: jnp.ndarray   # (K, 2)      d(g1, g2)/d theta_k (scaled)
    JEb_q: jnp.ndarray    # (K, 2, bq)  d(g1, g2)/d (lam, mu)_ki
    JD_sp: jnp.ndarray    # (mD_sp, np)
    JDb_p: jnp.ndarray    # (K, 2, S)   d(norm, dist)/d spine-slot vars
    JDb_q: jnp.ndarray    # (K, 2, bq)
    Hpp: jnp.ndarray      # (np, np)    Lagrangian Hessian, spine block
    Hpq_c: jnp.ndarray    # (K, S, bq)  compressed spine-block coupling
    Hqq: jnp.ndarray      # (K, bq, bq)


@dataclasses.dataclass(frozen=True)
class StructLayout:
    """Static index maps shared by the provider and the fused IPM body."""

    n: int
    np_: int
    K: int
    bq: int
    n_k: int          # horizon steps carrying blocks (K = n_k * nO)
    nO: int
    S: int            # spine slots coupled to a block: x,y,th[,T]
    mE_sp: int
    mD_sp: int
    mE: int
    mD: int
    pq_pos: np.ndarray    # (S, K) spine positions of each block's slots
    th_pos: np.ndarray    # (K,)   = pq_pos[2]
    clique_rc: tuple      # ((S*S*K,), (S*S*K,)) row/col index arrays
    p_idx: np.ndarray     # (np,) flat-z indices of the spine
    q_idx: np.ndarray     # (K, bq) flat-z indices of the blocks
    id_p_pos: np.ndarray  # spine positions of the non-(lam,mu) identity
    #                       inequality rows (x/u/T boxes), in row order
    #                       after the K*E lam + K*4 mu rows


def make_layout(spec: OBCASpec) -> StructLayout:
    N, nO, E = spec.N, spec.n_obs, spec.e_max
    free = spec.free_time
    K = spec.n_k * nO
    bq = E + 4
    off_u = 1 if free else 0
    np_ = off_u + 2 * N + 3 * (N + 1)

    def upos(i, t):
        return off_u + i * N + t

    def xpos(i, t):
        return off_u + 2 * N + i * (N + 1) + t

    ks = spec.k_lo + np.arange(K) // nO
    S = 4 if (free and spec.coupled_motion) else 3
    pq = [xpos(0, ks), xpos(1, ks), xpos(2, ks)]
    if S == 4:
        pq.append(np.zeros(K, np.int64))
    pq_pos = np.stack(pq).astype(np.int64)

    rr = np.repeat(np.arange(S), S * K)
    cc = np.tile(np.repeat(np.arange(S), K), S)
    kk = np.tile(np.arange(K), S * S)
    clique_rc = (pq_pos[rr, kk], pq_pos[cc, kk])

    n_term_E = {"free": 3, "fix_eq_band": 2}.get(spec.variant, 0)
    n_term_D = {"fix_terminal": 3, "fix_eq_band": 2}.get(spec.variant, 0)
    mE_sp = 3 * N + 3 + n_term_E
    mD_sp = 4 * N + n_term_D
    mE = mE_sp + 2 * K
    mD = mD_sp + 2 * K

    p_idx = np.array(
        ([0] if free else [])
        + list(range(off_u + K * bq + 0, off_u + K * bq + 2 * N))
        + list(range(off_u + K * bq + 2 * N,
                     off_u + K * bq + 2 * N + 3 * (N + 1))),
        dtype=np.int64,
    )
    q_idx = np.asarray(_obca.arrow_layout(spec), dtype=np.int64)
    n = off_u + K * bq + 2 * N + 3 * (N + 1)

    # identity rows after lam/mu (models/obca.py:ineq_identity_layout):
    # x/y lo+hi, u lo+hi, T lo+hi — all spine vars; map their flat-z
    # indices to spine positions
    id_idx = _obca.ineq_identity_layout(spec)
    rest = id_idx[K * bq:]
    pos_of = np.full(n, -1, np.int64)
    pos_of[p_idx] = np.arange(np_)
    id_p_pos = pos_of[rest]
    assert (id_p_pos >= 0).all()

    return StructLayout(
        n=n, np_=np_, K=K, bq=bq, n_k=spec.n_k, nO=nO, S=S,
        mE_sp=mE_sp, mD_sp=mD_sp,
        mE=mE, mD=mD, pq_pos=pq_pos, th_pos=pq_pos[2],
        clique_rc=clique_rc, p_idx=p_idx, q_idx=q_idx, id_p_pos=id_p_pos,
    )


def make_provider(spec: OBCASpec, d_scale_flat):
    """Build the analytic-KKT provider for one problem family.

    Args:
      d_scale_flat: the solver's flat variable scaling (numpy or
        concrete array). lam/mu entries must be 1 (the block columns are
        assumed unscaled so Hqq/JEb_q/JDb_q carry no column factors).

    Returns ``(layout, provider)`` with
    ``provider(zv, data, sf, scE, scD, y, w_d) -> KKTBundle``.
    """
    lay = make_layout(spec)
    N, nO, E = spec.N, spec.n_obs, spec.e_max
    free = spec.free_time
    K, bq, S = lay.K, lay.bq, lay.S
    off_u = 1 if free else 0
    kl = spec.k_lo

    ds = np.asarray(d_scale_flat, np.float64)
    assert np.allclose(ds[off_u:off_u + K * bq], 1.0), \
        "block (lam, mu) columns must be unscaled"
    ds_p = ds[lay.p_idx]                       # (np,)
    ds_pp = np.outer(ds_p, ds_p)               # (np, np)
    ds_slots = ds_p[lay.pq_pos[:, 0]]          # (S,)

    base_u = off_u + K * bq
    base_x = base_u + 2 * N

    def upos(i, t):
        return off_u + i * N + t

    def xpos(i, t):
        return off_u + 2 * N + i * (N + 1) + t

    ar_N = np.arange(N)
    ks_K = kl + np.arange(K) // nO             # (K,) horizon step per block
    i_K = np.arange(K) % nO                    # (K,) obstacle per block

    # ---- static index arrays for the JE_sp scatters (dyn/init/terminal)
    r1 = ar_N
    r2 = N + ar_N
    r3 = 2 * N + ar_N
    X0t, X1t, X2t = (np.array([xpos(i, t) for t in range(N + 1)])
                     for i in range(3))
    U0, U1 = (np.array([upos(i, t) for t in range(N)]) for i in range(2))
    init_rows = 3 * N + np.arange(3)
    init_cols = np.array([xpos(i, 0) for i in range(3)])
    term_rows = 3 * N + 3 + np.arange({"free": 3, "fix_eq_band": 2}.get(
        spec.variant, 0))
    term_cols = np.array([xpos(i, N) for i in range(len(term_rows))])

    # accel rows of JD_sp: row families [amax-hi, amax-lo, alpha-hi,
    # alpha-lo] each (N,); du_ineq_t = u_{t-1} - u_t (u_{-1} from data)
    aR = [ar_N, N + ar_N, 2 * N + ar_N, 3 * N + ar_N]
    dterm_rows = 4 * N + np.arange({"fix_terminal": 3,
                                    "fix_eq_band": 2}.get(spec.variant, 0))
    if spec.variant == "fix_terminal":
        dterm_cols = np.array([xpos(0, N), xpos(1, N), xpos(1, N)])
        dterm_sgn = np.array([1.0, 1.0, -1.0])
    elif spec.variant == "fix_eq_band":
        dterm_cols = np.array([xpos(2, N), xpos(2, N)])
        dterm_sgn = np.array([-1.0, 1.0])
    else:
        dterm_cols = np.zeros(0, np.int64)
        dterm_sgn = np.zeros(0)

    # mu columns of the stationarity rows: constant +-1 pattern
    # (src/obca.py:1006-1011: G = [[1,0],[0,1],[-1,0],[0,-1]])
    gmu_pat = np.zeros((2, 4))
    gmu_pat[0, 0], gmu_pat[0, 2] = 1.0, -1.0
    gmu_pat[1, 1], gmu_pat[1, 3] = 1.0, -1.0

    # ---- gather-map assembly for JE_sp / JD_sp.
    # TPU scatters serialize per index row (each .at[].set lowers to a
    # scatter); instead precompute MAP[r, c] = 1 + position of that
    # entry's value in a concatenated value vector (0 = structural
    # zero), and assemble each Jacobian with ONE gather:
    #     J = concat([0, values])[MAP]
    # The provider must concatenate its value pieces in exactly the
    # registration order below (parity-tested in test_struct_derivs).
    def _build_map(shape, entries):
        MAP = np.zeros(shape, np.int64)
        j = 1
        for rows, cols in entries:
            rows = np.broadcast_arrays(np.asarray(rows, np.int64).ravel(),
                                       np.asarray(cols, np.int64).ravel())
            for r, c in zip(*rows):
                assert MAP[r, c] == 0, (r, c)
                MAP[r, c] = j
                j += 1
        return MAP, j - 1

    je_entries = [
        (r1, X0t[1:]), (r1, X0t[:N]), (r1, X2t[:N]), (r1, U0),
        (r2, X1t[1:]), (r2, X1t[:N]), (r2, X2t[:N]), (r2, U0),
        (r3, X2t[1:]), (r3, X2t[:N]), (r3, U1),
    ]
    if free:
        je_entries += [(r1, 0 * r1), (r2, 0 * r2), (r3, 0 * r3)]
    je_entries.append((init_rows, init_cols))
    if len(term_rows):
        je_entries.append((term_rows, term_cols))
    JE_MAP, je_nnz = _build_map((mE_sp := 3 * N + 3 + len(term_rows),
                                 lay.np_), je_entries)
    assert mE_sp == lay.mE_sp

    jd_entries = []
    for fam, usl in enumerate([U0, U1]):
        hi, lo = aR[2 * fam], aR[2 * fam + 1]
        jd_entries += [(hi, usl), (hi[1:], usl[:-1]),
                       (lo, usl), (lo[1:], usl[:-1])]
        if free:
            jd_entries += [(hi, 0 * hi), (lo, 0 * lo)]
    if len(dterm_rows):
        jd_entries.append((dterm_rows, dterm_cols))
    JD_MAP, jd_nnz = _build_map((lay.mD_sp, lay.np_), jd_entries)

    # eye-like constants for the scatter-free dense Hpp blocks
    eyeN1_np = np.eye(N + 1)
    eyeN_np = np.eye(N)
    bandN_np = np.eye(N, k=1) + np.eye(N, k=-1)
    rectN_np = np.eye(N + 1, N)          # (t, t) for t < N

    def provider(zv, data: OBCAData, sf, scE, scD, y, w_d) -> KKTBundle:
        dtype = zv.dtype
        dsj = jnp.asarray(ds, dtype)
        z = zv * dsj
        T = z[0] if free else None
        lam = z[off_u:off_u + K * E].reshape(K, E)
        mu = z[off_u + K * E:off_u + K * bq].reshape(K, 4)
        u = z[base_u:base_x].reshape(2, N)
        x = z[base_x:].reshape(3, N + 1)

        Ts = data.Ts
        dt = T * Ts if free else Ts
        v, w_in = u[0], u[1]
        th = x[2, :N]
        cth, sth = jnp.cos(th), jnp.sin(th)

        # per-block geometry
        A = data.A[kl:].reshape(K, E, 2)          # (K, E, 2)
        b0 = data.b[kl:].reshape(K, E)
        lam_mask = (data.edge_mask * data.obs_mask[:, None])[i_K]  # (K, E)
        m = data.obs_mask[i_K]                     # (K,)
        thk = x[2, kl:]                            # (n_k,)
        ck = jnp.cos(thk)[jnp.arange(K) // nO]     # (K,) cos th at block k
        sk = jnp.sin(thk)[jnp.arange(K) // nO]
        q1 = jnp.einsum("ked,ke->kd", A, lam)      # (K, 2)
        if spec.coupled_motion:
            ksT = jnp.asarray(ks_K, dtype) * Ts * T            # (K,)
            vel = data.obs_vel[i_K]                            # (K, 2)
            delta = ksT[:, None] * vel                         # (K, 2)
            b = b0 + jnp.einsum("ked,kd->ke", A, delta)
        else:
            b = b0
        off = data.ego_offset
        xk = x[0, kl:][jnp.arange(K) // nO]
        yk = x[1, kl:][jnp.arange(K) // nO]
        tx = xk + ck * off
        ty = yk + sk * off
        blam = jnp.einsum("ke,ke->k", b, lam)

        # ---------- constraint values (natural), then scaled -----------
        dyn1 = x[0, 1:] - x[0, :N] - dt * v * cth
        dyn2 = x[1, 1:] - x[1, :N] - dt * v * sth
        dyn3 = x[2, 1:] - x[2, :N] - dt * w_in
        initv = x[:, 0] - data.x0
        parts_E = [dyn1, dyn2, dyn3, initv]
        if spec.variant == "free":
            parts_E.append(x[:, N] - data.xref[:, N])
        elif spec.variant == "fix_eq_band":
            parts_E.append(x[:2, N] - data.xref[:2, N])
        g1 = (mu[:, 0] - mu[:, 2]) + m * (ck * q1[:, 0] + sk * q1[:, 1])
        g2 = (mu[:, 1] - mu[:, 3]) + m * (-sk * q1[:, 0] + ck * q1[:, 1])
        cE_nat = jnp.concatenate(parts_E + [g1, g2])

        du_i = jnp.concatenate(
            [(data.u0[:, None] - u[:, :1]), u[:, :-1] - u[:, 1:]], axis=1)
        parts_D = [data.a_max * dt - du_i[0], du_i[0] + data.a_max * dt,
                   data.alpha_max * dt - du_i[1],
                   du_i[1] + data.alpha_max * dt]
        if spec.variant == "fix_terminal":
            parts_D.append(jnp.stack([
                x[0, N] - data.terminal_set[0, 0],
                x[1, N] - data.terminal_set[1, 0],
                data.terminal_set[1, 1] - x[1, N]]))
        elif spec.variant == "fix_eq_band":
            dth = x[2, N] - data.xref[2, N]
            parts_D.append(jnp.stack([spec.theta_band - dth,
                                      dth + spec.theta_band]))
        one = jnp.ones((), dtype)
        norm_row = jnp.where(m > 0, 1.0 - jnp.sum(q1 * q1, axis=-1), one)
        gmu = mu @ data.ego_g
        dist = -gmu + tx * q1[:, 0] + ty * q1[:, 1] - blam
        dist_row = jnp.where(m > 0, dist - data.dmin, one)
        cD_nat = jnp.concatenate(parts_D + [norm_row, dist_row])

        # ---------- objective gradient (natural) -----------------------
        Q2 = data.Q + data.Q.T
        P2 = data.P + data.P.T
        R12 = data.R1 + data.R1.T
        R22 = data.R2 + data.R2.T
        dx = x[:, :N] - data.xref[:, :N]
        gx = jnp.concatenate([Q2 @ dx, (P2 @ (x[:, N] - data.xref[:, N]))[:, None]],
                             axis=1)                      # (3, N+1)
        du_c = jnp.concatenate([(u[:, :1] - data.u0[:, None]),
                                jnp.diff(u, axis=1)], axis=1)   # (2, N)
        acc_t = (R22 @ du_c) / dt ** 2                    # (2, N)
        g_acc = acc_t - jnp.pad(acc_t[:, 1:], ((0, 0), (0, 1)))
        gu = R12 @ u + g_acc
        lm = lam_mask
        om = m
        coef_l = (_obca._PIN_RHO * (1.0 - lm) ** 2 + spec.dual_reg * lm ** 2)
        coef_m = (_obca._PIN_RHO * (1.0 - om) ** 2
                  + spec.dual_reg * om ** 2)[:, None]
        glam = coef_l * lam
        gmu_g = coef_m * mu
        cost_acc = 0.5 * jnp.sum(du_c * (R22 @ du_c)) / dt ** 2
        g_parts = []
        if free:
            gT = (-2.0 * cost_acc / T
                  + (N + 1) * (data.time_c1 + 2.0 * data.time_c2 * T))
            g_parts.append(gT[None])
        g_parts += [glam.reshape(-1), gmu_g.reshape(-1),
                    gu.reshape(-1), gx.reshape(-1)]
        g_nat = jnp.concatenate(g_parts)

        # ---------- objective value (matches models/obca.py:objective) --
        dN = x[:, N] - data.xref[:, N]
        f_nat = (jnp.sum(dx * (data.Q @ dx)) + jnp.sum(u * (data.R1 @ u))
                 + jnp.sum(du_c * (data.R2 @ du_c)) / dt ** 2
                 + dN @ data.P @ dN
                 + 0.5 * _obca._PIN_RHO
                 * (jnp.sum(((1.0 - lm) * lam) ** 2)
                    + jnp.sum(((1.0 - om)[:, None] * mu) ** 2))
                 + 0.5 * spec.dual_reg
                 * (jnp.sum((lm * lam) ** 2)
                    + jnp.sum((om[:, None] * mu) ** 2)))
        if free:
            f_nat = f_nat + (N + 1) * (data.time_c1 * T
                                       + data.time_c2 * T ** 2)

        # ---------- scaled values ---------------------------------------
        scE_sp = scE[:lay.mE_sp]
        scE_g = jnp.stack([scE[lay.mE_sp:lay.mE_sp + K],
                           scE[lay.mE_sp + K:]], axis=1)        # (K, 2)
        scD_sp = scD[:lay.mD_sp]
        scD_blk = jnp.stack([scD[lay.mD_sp:lay.mD_sp + K],
                             scD[lay.mD_sp + K:]], axis=1)      # (K, 2)
        cE_s = cE_nat * scE
        cD_s = cD_nat * scD
        g_s = sf * g_nat * dsj

        # effective multipliers for the Hessian: L = sf f - y^T cEs - w^T cDs
        yh_sp = scE_sp * y[:lay.mE_sp]
        yh_g = scE_g * jnp.stack([y[lay.mE_sp:lay.mE_sp + K],
                                  y[lay.mE_sp + K:]], axis=1)   # (K, 2)
        wh_sp = scD_sp * w_d[:lay.mD_sp]
        wh_n = scD_blk[:, 0] * w_d[lay.mD_sp:lay.mD_sp + K]
        wh_dd = scD_blk[:, 1] * w_d[lay.mD_sp + K:]
        y1, y2, y3 = yh_sp[:N], yh_sp[N:2 * N], yh_sp[2 * N:3 * N]

        # ---------- JE_sp: one gather through the static JE_MAP ----------
        # (value order MUST match the je_entries registration)
        onesN = jnp.ones((N,), dtype)
        je_vals = [onesN, -onesN, dt * v * sth, -dt * cth,
                   onesN, -onesN, -dt * v * cth, -dt * sth,
                   onesN, -onesN, -dt * onesN]
        if free:
            je_vals += [-Ts * v * cth, -Ts * v * sth, -Ts * w_in]
        je_vals.append(jnp.ones(3, dtype))
        if len(term_rows):
            je_vals.append(jnp.ones(len(term_rows), dtype))
        vp = jnp.concatenate([jnp.zeros(1, dtype)] + je_vals)
        JE = vp[JE_MAP]
        JE_sp = scE_sp[:, None] * JE * jnp.asarray(ds_p, dtype)[None, :]

        # ---------- stationarity block Jacobian -------------------------
        # d(g1,g2)/d theta_k, /d lam, /d mu (src/obca.py:1006-1011)
        jth = jnp.stack([m * (-sk * q1[:, 0] + ck * q1[:, 1]),
                         -m * (ck * q1[:, 0] + sk * q1[:, 1])], axis=1)
        A0, A1 = A[..., 0], A[..., 1]
        jlam = jnp.stack([m[:, None] * (ck[:, None] * A0 + sk[:, None] * A1),
                          m[:, None] * (-sk[:, None] * A0 + ck[:, None] * A1)],
                         axis=1)                                # (K, 2, E)
        jmu = jnp.broadcast_to(jnp.asarray(gmu_pat, dtype), (K, 2, 4))
        JEb_th = scE_g * jth * ds_slots[2]
        JEb_q = scE_g[..., None] * jnp.concatenate([jlam, jmu], axis=2)

        # ---------- JD_sp: one gather through the static JD_MAP ----------
        # row family hi: a_max*dt - du_i  (du_i_t = u_{t-1} - u_t)
        #   => d/du_t = +1, d/du_{t-1} = -1
        jd_vals = []
        for lim in (data.a_max, data.alpha_max):
            jd_vals += [onesN, -onesN[1:], -onesN, onesN[1:]]
            if free:
                tcol = lim * Ts * onesN
                jd_vals += [tcol, tcol]
        if len(dterm_rows):
            jd_vals.append(jnp.asarray(dterm_sgn, dtype))
        vpD = jnp.concatenate([jnp.zeros(1, dtype)] + jd_vals)
        JD = vpD[JD_MAP]
        JD_sp = scD_sp[:, None] * JD * jnp.asarray(ds_p, dtype)[None, :]

        # ---------- norm/dist block Jacobians ---------------------------
        # spine slots (x, y, th[, T]); norm touches none of them
        d_dist_x = m * q1[:, 0]
        d_dist_y = m * q1[:, 1]
        d_dist_th = m * off * (-sk * q1[:, 0] + ck * q1[:, 1])
        zK = jnp.zeros((K,), dtype)
        slots_dist = [d_dist_x, d_dist_y, d_dist_th]
        slots_norm = [zK, zK, zK]
        if S == 4:
            d_dist_T = -m * Ts * jnp.asarray(ks_K, dtype) * jnp.einsum(
                "kd,kd->k", q1, vel)
            slots_dist.append(d_dist_T)
            slots_norm.append(zK)
        JDb_p_nat = jnp.stack(
            [jnp.stack(slots_norm, axis=1), jnp.stack(slots_dist, axis=1)],
            axis=1)                                          # (K, 2, S)
        d_norm_lam = -2.0 * m[:, None] * jnp.einsum("kd,ked->ke", q1, A)
        d_dist_lam = m[:, None] * (tx[:, None] * A0 + ty[:, None] * A1 - b)
        d_dist_mu = -m[:, None] * jnp.broadcast_to(data.ego_g[None], (K, 4))
        JDb_q_nat = jnp.stack([
            jnp.concatenate([d_norm_lam, jnp.zeros((K, 4), dtype)], axis=1),
            jnp.concatenate([d_dist_lam, d_dist_mu], axis=1)], axis=1)
        JDb_p = (scD_blk[..., None] * JDb_p_nat
                 * jnp.asarray(ds_slots, dtype)[None, None, :])
        JDb_q = scD_blk[..., None] * JDb_q_nat

        # ---------- Lagrangian Hessian (spine block) --------------------
        # Scatter-free: the spine Hessian decomposes into the x-block
        # (same-step 3x3 cliques = diag-embedded Q2/P2 + the theta/theta
        # curvature), the u-block (R12 diag + R22 tridiagonal band), the
        # (theta_t, v_t) rectangle, and the dense T row/column — each
        # built as a small dense tensor by broadcasting against constant
        # eye/band masks and joined with jnp.block.
        # dyn-row curvature: -(y1 ddr1 + y2 ddr2 + y3 ddr3)
        h_thth = -(y1 * dt * v * cth + y2 * dt * v * sth)     # (N,)
        h_thv = -(y1 * dt * sth - y2 * dt * cth)              # (N,)
        # block rows' (th_k, th_k): stationarity + dist, summed over the
        # obstacles at each step (K = n_k * nO, block-major)
        hb_thth = -(yh_g[:, 0] * m * (-ck * q1[:, 0] - sk * q1[:, 1])
                    + yh_g[:, 1] * m * (sk * q1[:, 0] - ck * q1[:, 1])
                    + wh_dd * m * off * (-ck * q1[:, 0] - sk * q1[:, 1]))
        thth_all = (jnp.concatenate([h_thth, jnp.zeros(1, dtype)])
                    + jnp.concatenate([jnp.zeros(kl, dtype),
                                       hb_thth.reshape(-1, nO).sum(1)]))

        eyeN1 = jnp.asarray(eyeN1_np, dtype)
        Qcols = sf * jnp.concatenate(
            [jnp.broadcast_to(Q2[:, :, None], (3, 3, N)), P2[:, :, None]],
            axis=2)                                           # (3,3,N+1)
        e3 = jnp.asarray([0.0, 0.0, 1.0], dtype)
        Hxx4 = (Qcols.transpose(0, 2, 1)[:, :, :, None]
                * eyeN1[None, :, None, :]                     # (3,N+1,3,N+1)
                + (e3[:, None, None, None] * e3[None, None, :, None])
                * (eyeN1 * thth_all[:, None])[None, :, None, :])
        Hxx = Hxx4.reshape(3 * (N + 1), 3 * (N + 1))

        cnt = jnp.concatenate([2.0 * onesN[:-1], onesN[:1]])  # 2,2,..,1
        diagv = sf * (R12[:, :, None]
                      + R22[:, :, None] * cnt[None, None] / dt ** 2)
        bandv = sf * (-R22 / dt ** 2)
        Huu4 = (diagv.transpose(0, 2, 1)[:, :, :, None]
                * jnp.asarray(eyeN_np, dtype)[None, :, None, :]
                + bandv[:, None, :, None]
                * jnp.asarray(bandN_np, dtype)[None, :, None, :])
        Huu = Huu4.reshape(2 * N, 2 * N)

        # (v_t, theta_t) rectangle: u rows, x columns
        Mvth = jnp.asarray(rectN_np.T, dtype) * h_thv[:, None]   # (N, N+1)
        zN1 = jnp.zeros((N, N + 1), dtype)
        Hux = jnp.concatenate([
            jnp.concatenate([zN1, zN1, Mvth], axis=1),
            jnp.zeros((N, 3 * (N + 1)), dtype)], axis=0)      # (2N, 3(N+1))

        if free:
            h_thT = -(y1 * Ts * v * sth - y2 * Ts * v * cth)
            h_vT = -(-y1 * Ts * cth - y2 * Ts * sth)
            h_wT = y3 * Ts
            g_accT = -2.0 * g_acc / T                         # (2, N)
            HTu = jnp.concatenate([sf * g_accT[0] + h_vT,
                                   sf * g_accT[1] + h_wT])[None, :]
            HTx = jnp.concatenate(
                [jnp.zeros(2 * (N + 1), dtype), h_thT,
                 jnp.zeros(1, dtype)])[None, :]
            HTT = (sf * (6.0 * cost_acc / T ** 2
                         + 2.0 * data.time_c2 * (N + 1)))[None, None]
            Hpp = jnp.block([[HTT, HTu, HTx],
                             [HTu.T, Huu, Hux],
                             [HTx.T, Hux.T, Hxx]])
        else:
            Hpp = jnp.block([[Huu, Hux], [Hux.T, Hxx]])
        Hpp = Hpp * jnp.asarray(ds_pp, dtype)

        # coupling Hpq_c (K, S, bq): rows x, y, th[, T]; lam columns only
        zKE = jnp.zeros((K, E), dtype)
        h_x_lam = -wh_dd[:, None] * m[:, None] * A0
        h_y_lam = -wh_dd[:, None] * m[:, None] * A1
        dth_lam = m[:, None] * (-sk[:, None] * A0 + ck[:, None] * A1)
        dth_lam2 = m[:, None] * (-ck[:, None] * A0 - sk[:, None] * A1)
        h_th_lam = -(yh_g[:, 0, None] * dth_lam
                     + yh_g[:, 1, None] * dth_lam2
                     + wh_dd[:, None] * off * dth_lam)
        rows_c = [h_x_lam, h_y_lam, h_th_lam]
        if S == 4:
            h_T_lam = wh_dd[:, None] * m[:, None] * Ts * jnp.asarray(
                ks_K, dtype)[:, None] * jnp.einsum("ked,kd->ke", A, vel)
            rows_c.append(h_T_lam)
        Hpq_lam = jnp.stack(rows_c, axis=1)                  # (K, S, E)
        Hpq_c = jnp.concatenate(
            [Hpq_lam, jnp.zeros((K, S, 4), dtype)], axis=2)
        Hpq_c = Hpq_c * jnp.asarray(ds_slots, dtype)[None, :, None]

        # block diagonal Hqq: norm-row curvature + pin/prox diagonals.
        # Assembled with concatenates, NOT .at[] updates: an offset
        # .at[:, E:, E:].set on a (B, K, 8, 8) operand lowers to a
        # tile-misaligned dynamic-update-slice that cost 47% of the
        # whole Newton iteration on TPU (6 ms/trip at B=256, measured
        # with jax.profiler — the (4, 4) start is not (8, 128)-tile
        # aligned so the update runs a scalar path).
        AAT = jnp.einsum("ked,kfd->kef", A, A)
        eyeE = jnp.eye(E, dtype=dtype)
        H_ll = (2.0 * wh_n[:, None, None] * m[:, None, None] * AAT
                + eyeE[None] * (sf * coef_l)[:, None, :])
        H_mm = (jnp.eye(4, dtype=dtype)[None]
                * (sf * coef_m[:, 0])[:, None, None])
        Hqq = jnp.concatenate([
            jnp.concatenate([H_ll, jnp.zeros((K, E, 4), dtype)], axis=2),
            jnp.concatenate([jnp.zeros((K, 4, E), dtype), H_mm], axis=2),
        ], axis=1)

        return KKTBundle(f=sf * f_nat, g=g_s, cE=cE_s, cD=cD_s, JE_sp=JE_sp,
                         JEb_th=JEb_th, JEb_q=JEb_q, JD_sp=JD_sp,
                         JDb_p=JDb_p, JDb_q=JDb_q, Hpp=Hpp, Hpq_c=Hpq_c,
                         Hqq=Hqq)

    return lay, provider
