"""Primal-dual interior-point NLP solver in pure JAX.

This is the framework's L0 — the TPU-native replacement for the reference's
CasADi ``Opti`` + IPOPT substrate (invoked per replan at e.g.
``src/obca.py:1052-1056``). Design goals, in order:

  1. *Batchable*: one compiled solve, ``vmap`` over thousands of problem
     instances; diverged instances never poison the batch (status codes,
     masked updates — SURVEY.md section 5 "failure detection").
  2. *Shape-static*: fixed iteration cap, fraction-to-boundary + vectorized
     backtracking (all candidate step lengths evaluated in one shot), no
     data-dependent Python control flow.
  3. *Robust on the nonconvex OBCA NLP*. The pieces that earn IPOPT its
     robustness are reproduced in fixed-shape form:
       - gradient-based objective/constraint scaling,
       - optional variable scaling (``z_scale``) so regularization acts in
         natural units,
       - inertia correction as a *parallel* regularization sweep: the KKT
         system is factorized for a ladder of primal regularizers in one
         batched LU and the smallest delta with finite solution and
         positive step curvature wins,
       - a filter-style line search (accept on constraint-violation OR
         barrier-objective improvement) evaluated for all backtracking
         candidates at once,
       - the kappa_Sigma dual safeguard clamping inequality multipliers to
         a mu/s neighborhood,
       - monotone Fiacco-McCormick barrier reduction,
       - one iterative-refinement pass per KKT solve (float32-friendly).

Problem form (bounds are folded into ``c_I`` by the model layer):

    min f(z)   s.t.  c_E(z) = 0,   c_I(z) - s = 0,  s >= 0

Newton-KKT condensation eliminates (s, w) analytically, leaving the
symmetric saddle system in (dz, dy):

    [ H + J_I^T (W/S) J_I + dp*I   J_E^T ] [ dz ]   [ rhs1 ]
    [ J_E                          -dd*I ] [ -dy ] = [ -c_E ]

solved dense — the OBCA KKT is a few hundred rows, one MXU tile; a
block-structured Pallas factorization can slot in underneath without
changing this interface.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree


@dataclasses.dataclass(frozen=True)
class IPMOptions:
    max_iters: int = 100
    tol: float = 1e-6            # scaled KKT error target (IPOPT tol)
    acceptable_tol: float = 1e-4  # Ipopt-style acceptable KKT level
    # Stop after this many consecutive iterations at the acceptable level
    # (IPOPT's acceptable_iter). Essential for batched solves: a vmapped
    # while_loop runs until EVERY instance is done, so one instance that
    # plateaus between acceptable_tol and tol would otherwise burn the
    # whole batch's remaining iteration budget. An iteration only counts
    # as acceptable when the *unscaled* violation is also below
    # acceptable_viol_tol, so the early stop can never strand an iterate
    # that is still materially infeasible.
    acceptable_iter: int = 5
    feas_tol: float = 1e-6       # unscaled constraint violation for `feas`
    # Unscaled violation admitted at the acceptable level — IPOPT's
    # acceptable_constr_viol_tol (default 1e-2). The reference's solves
    # return feas=True whenever IPOPT stops at "Solved To Acceptable
    # Level" (src/obca.py:1052-1056 try/except), which admits exactly
    # this violation; near-contact fix-time replans routinely polish to
    # ~1e-4..1e-3 violation and are physically fine (dmin = 0.05).
    acceptable_viol_tol: float = 1e-2
    mu0: float = 0.1             # initial barrier parameter
    kappa_mu: float = 0.2        # linear barrier reduction factor
    theta_mu: float = 1.5        # superlinear barrier reduction exponent
    kappa_eps: float = 10.0      # barrier-phase termination factor
    kappa_sigma: float = 1e10    # dual safeguard width
    tau_min: float = 0.99        # fraction-to-boundary parameter
    s_init: float = 1e-2         # minimum initial slack
    delta0: float = 1e-8         # base primal regularization
    delta_max: float = 1e8
    delta_d: float = 1e-8        # dual regularization
    # Regularization ladder size. Every rung pays a factorization on
    # EVERY iteration, so smaller is faster (measured: 1 rung 95 vs 3
    # rungs 58 solves/s at batch 256) — but a failed rung costs a
    # rejected step, and on near-contact fix-time solves a single rung
    # oscillates (delta decays on success, the next chol fails) enough
    # to abort the closed loop. 2 is the robust fast point; pure
    # free-time sweeps (bench) safely run 1.
    n_deltas: int = 2
    delta_step: float = 100.0    # ladder ratio
    n_backtracks: int = 16       # vectorized filter candidates
    # Iterative-refinement passes per KKT solve (against the delta_d-
    # regularized saddle system). 2 is the f32 robustness point; the
    # passes are ~flop-cheap (matvecs + re-solves against the cached
    # factorization) but not free on HBM-bound batches.
    n_refine: int = 2
    g_max: float = 100.0         # gradient-based scaling threshold
    # 'al_chol' (default): eliminate the equality-dual block exactly via
    #   the augmented-Lagrangian normal equations
    #       (W + dI + J^T J / dd) dz = r1 + J^T r2 / dd,
    #       v = (J dz - r2) / dd,
    #   Cholesky-factorized. SPD of that matrix ~ positive definiteness
    #   of W + dI on null(J) (for small dd) — the *correct* inertia
    #   condition, unlike SPD-of-W — and a failed factorization is NaN,
    #   which rejects the ladder rung. ~3.5x faster than QR on TPU
    #   (measured: chol-582 6.4 ms vs qr-750 23 ms at batch 32).
    # 'qr': Householder QR on the full saddle system — the robustness
    #   baseline; inertia surrogate is the directional-curvature test.
    # 'chol': Cholesky+Schur demanding W + dI itself SPD — too strong
    #   for OBCA (kept for experiments).
    # 'arrow' (legacy structured default): the al_chol augmented-
    #   Lagrangian kernel, but factorized by its block-arrow structure —
    #   batched tiny Cholesky of the per-(k,obs) dual blocks, then a
    #   dense Schur system over only the trajectory variables. Exact
    #   same linear system and SPD/NaN rejection semantics as 'al_chol'
    #   at a small fraction of the flops (the dense n^3 Cholesky was
    #   ~95% of solve time on TPU). Jacobians/Hessian still come from
    #   AD (jacrev + grouped HVP probes) and are materialized dense
    #   before being gathered into arrow form.
    # 'fused' (default when the problem declares analytic structure via
    #   ``struct=``): the same arrow factorization, but every
    #   gradient/Jacobian/Hessian block is hand-assembled analytically
    #   in compressed arrow coordinates (models/obca_struct.py) — no AD
    #   in the iteration at all, no dense (m, n) Jacobian or (n, n)
    #   Hessian is ever materialized, and the block<->spine coupling is
    #   kept in its compressed (K, S, bq) form through the
    #   factorization. This collapsed the measured per-lane-iteration
    #   HBM footprint ~10x; falls back to 'arrow' when no ``struct``.
    kkt: str = "fused"
    # Dual regularization of the AL kernel. This is THE robustness-
    # critical knob near degenerate contacts: the kernel's bias against
    # the true (delta_d-regularized) saddle system is removed by the two
    # refinement passes only while the constraint Jacobian's small
    # singular values sigma satisfy sigma^2 >~ delta_d_al — at a
    # face-to-face contact (LICQ failure) sigma -> 0 and a too-large
    # delta_d_al leaves the dual component uncorrected, the curvature
    # test rejects every ladder rung, and the solve stalls at KKT ~ 1
    # (seen: demo4 k=21 brake solve — QR converged in 46 iterations,
    # arrow at 1e-2 never; at 1e-3 it converges in 55). Smaller is not
    # better either: at 1e-4 the f32 Cholesky of J^T J / dd loses
    # enough digits that refinement floors at KKT ~ 3e-2. 1e-3 is the
    # f32 sweet spot; f64 solves tolerate 1e-4.
    delta_d_al: float = 1e-3
    # Divergence cut: declare a lane done after this many consecutive
    # iterations without a watchdog improvement (0 = disabled). An NLP
    # that is *locally infeasible* — e.g. the fix-time terminal set is
    # unreachable from a brake candidate, exactly why the reference
    # carries the mpc8 fallback rung (src/closed_loop.py:393-398) —
    # never converges and otherwise burns the full iteration budget; in
    # a vmapped batch that one lane convoys everyone (bench r3: fix-step
    # iteration p90 = max = cap). A converging solve improves the
    # watchdog's (acceptable-feasibility, mu=0-KKT) key nearly every
    # iteration; plateaus from dual chatter at degenerate contacts are
    # shorter than ~15 iterations (measured: demo4 k=21, the longest
    # stall among all golden solves, recovers within 9).
    stall_iters: int = 0
    # Improvement that RESETS the stall counter must be a relative KKT
    # reduction (or a feasibility flip), not the strict `<` the watchdog
    # uses: a locally-infeasible lane's error chatters downward at noise
    # level forever (diag: demo1 k=9 stuck at err 4.81, viol 1.09 for
    # 100 iterations with the counter never reaching 20 —
    # scripts/exp_r4_diag.py).
    stall_rel: float = 1e-3
    # Restrict the cut to lanes whose best iterate is still MATERIALLY
    # infeasible (best_viol > acceptable_viol_tol). True is the safe
    # default for a solver with no fallback behind it. A ladder's
    # NON-final rungs should run False (aggressive): a slow lane cut
    # early is rescued by the next rung, and the vmapped while_loop's
    # trip count — the whole batch's wall time — drops to the fast
    # lanes' level (exp_r4_diag: the mpc6 stage's per-candidate p90 is
    # ~38 iterations but its batch max was pinned at the cap by lanes
    # whose mpc8 rescue was inevitable anyway).
    stall_viol_gate: bool = True
    # MXU passes for f32 matmuls: 'highest' = full f32 emulation (6
    # bf16 passes), 'high' = bf16x3. Newton-KKT tolerates 'high' thanks
    # to the iterative refinement in the KKT solve; 'default' (1 bf16
    # pass) stalls the iteration.
    matmul_precision: str = "highest"
    # Separate precision for the KKT factorization/solve ladder (None =
    # inherit matmul_precision). Running the WHOLE body at 'high'
    # stalls convergence (r3: feas 0.70) — but that measurement mixed
    # the residual/Jacobian/Hessian evaluations into the low-precision
    # regime; the factorization alone is protected by the iterative-
    # refinement passes, which re-solve against residuals computed at
    # the outer precision.
    kkt_matmul_precision: str = None
    # Build the Lagrangian Hessian by star-coloring HVP probes instead of
    # jax.hessian when the problem declares its arrow structure: the K
    # dual blocks are mutually uncoupled, so spine columns (one probe
    # each) plus bq probes that sum the same slot of every block recover
    # the exact Hessian in n_spine + bq (= 62) HVPs instead of n (= 534)
    # — measured 7.0 -> ~1 ms of the IPM iteration at batch 256.
    hessian_coloring: bool = True
    # Use the model-declared *grouped* spine coloring (one summed probe
    # per structurally-orthogonal column set — models/obca.py
    # hessian_spine_probes) instead of one probe per spine column:
    # 18 HVPs instead of 62 at N = 10. Only active when the problem
    # passes ``spine=`` to build_solver and the arrow path is structured.
    spine_coloring: bool = True
    debug: bool = False          # per-iteration jax.debug.print trace


class IPMResult(NamedTuple):
    z: dict                 # solution pytree
    s: jnp.ndarray          # slacks
    y: jnp.ndarray          # equality multipliers
    w: jnp.ndarray          # inequality multipliers
    f: jnp.ndarray          # objective (unscaled)
    kkt_err: jnp.ndarray    # final scaled KKT error
    viol: jnp.ndarray       # final unscaled max constraint violation
    iters: jnp.ndarray
    converged: jnp.ndarray  # bool
    feas: jnp.ndarray       # bool: converged & viol <= feas_tol


class IPMState(NamedTuple):
    """Full iteration state — the carry of ``solve.iterate``.

    Exposed (vs being a while_loop internal) so a batched driver can run
    fixed-size iteration *chunks* and compact unconverged lanes between
    chunks (gather/scatter), instead of every lane paying the batch
    maximum trip count of one vmapped ``while_loop`` (the "convoy"
    problem). The per-lane gradient-based scaling factors are part of the
    state so a gathered lane resumes bit-identically.
    """

    zv: jnp.ndarray
    s: jnp.ndarray
    y: jnp.ndarray
    w: jnp.ndarray
    mu_b: jnp.ndarray
    delta: jnp.ndarray   # last successful regularization
    it: jnp.ndarray
    done: jnp.ndarray
    acc_it: jnp.ndarray  # consecutive iterations at acceptable level
    stall_it: jnp.ndarray  # consecutive iterations w/o watchdog progress
    # watchdog: best iterate seen so far (by mu=0 KKT error) — the
    # dual chatter near degenerate contacts must never lose it
    best_zv: jnp.ndarray
    best_s: jnp.ndarray
    best_y: jnp.ndarray
    best_w: jnp.ndarray
    best_err: jnp.ndarray
    best_viol: jnp.ndarray  # unscaled violation of the best iterate
    # per-lane problem scaling, fixed at init (Ipopt's scheme)
    sf: jnp.ndarray      # () objective scale
    scE: jnp.ndarray     # (mE,) equality row scales
    scD: jnp.ndarray     # (mD,) dense-inequality row scales


def _row_scales(J, g_max):
    m = jnp.max(jnp.abs(J), axis=-1)
    return jnp.minimum(1.0, g_max / jnp.maximum(m, 1e-12))


def _chol_inv_small(A):
    """Inverse of batched small SPD blocks (..., m, m) via an UNROLLED
    Cholesky + forward substitution, computed in BATCH-MINOR layout.

    XLA's batched ``jnp.linalg.cholesky``/``cho_solve`` lower to a
    loop-per-column LAPACK-style path that is pathological for tiny
    matrices on TPU (13.7 ms of a 22 ms IPM iteration at batch 256).
    Unrolling the m = E+4 (= 8) steps turns it into ~m^2 fused vector
    ops — but with the default (..., m, m) layout each of those ops is
    an f32[B, K, 8, 1] column: the tiny matrix dim lands in the TPU's
    tiled (8, 128) minor position and wastes ~128x of the vector lanes
    (measured with jax.profiler: the three largest ops of the whole
    Newton iteration were these columns, ~45 ms per 30 trips). So the
    kernel transposes once to (m, m, batch), runs every unrolled op on
    (m, batch) slices — batch-minor, fully lane-aligned — and
    transposes back. A non-SPD block produces sqrt(negative) = NaN
    which propagates through the inverse — exactly the failure signal
    ``jnp.linalg.cholesky`` gives the inertia ladder.
    """
    m = A.shape[-1]
    lead = A.shape[:-2]
    X = jnp.moveaxis(A.reshape((-1,) + A.shape[-2:]), 0, -1)  # (m, m, Bf)
    cols = []                      # cols[j] = L[:, j] as (m, Bf)
    for j in range(m):
        v = X[:, j]
        for k in range(j):
            v = v - cols[k] * cols[k][j:j + 1]
        d = jnp.sqrt(v[j:j + 1])
        scaled = v / d
        mask = (jnp.arange(m) >= j)[:, None]
        cols.append(jnp.where(mask, scaled, jnp.zeros_like(scaled)))
    # rows of L^{-1} by forward substitution, rows[i] = (m, Bf)
    rows = []
    for i in range(m):
        acc = jnp.where((jnp.arange(m) == i)[:, None],
                        jnp.ones_like(X[0]), jnp.zeros_like(X[0]))
        for k in range(i):
            acc = acc - cols[k][i:i + 1] * rows[k]
        rows.append(acc / cols[i][i:i + 1])
    Linv = jnp.stack(rows, axis=0)                  # (m_row, m_col, Bf)
    inv = jnp.einsum("kib,kjb->ijb", Linv, Linv)
    return jnp.moveaxis(inv, -1, 0).reshape(lead + (m, m))


# Above this size, the unrolled inverse is counterproductive: it emits
# O(m^2) tiny sequential HLO ops (a 54-spine unrolls to ~2900 — latency-
# and compile-pathological on TPU, and numerically weaker than a blocked
# Cholesky; flagged by the round-2 advisor). The XLA path below keeps the
# explicit-inverse property (every later solve is a matvec) via one
# batched Cholesky + one multi-rhs triangular solve.
_UNROLL_LIMIT = 16


_BLOCK_INV_LIMIT = 160


def _spd_inv(A):
    """Inverse of batched SPD blocks. Three regimes:

      m <= _UNROLL_LIMIT: fully unrolled Cholesky (the (K, 8, 8) dual
        blocks) — fused vector ops, no custom-calls.
      m <= _BLOCK_INV_LIMIT: recursive 2x2-block Schur inversion,
          A^-1 = [[I11 + W Qi W^T, -W Qi], [-Qi W^T, Qi]],
          W = I11 A12,  Q = A22 - A21 I11 A12,
        recursing on A11 and Q. All leaves are unrolled Cholesky
        inversions and all glue is MXU matmuls. This exists because
        XLA:TPU's batched cholesky/triangular_solve custom-calls run a
        serial per-column loop: 13.5 ms for (1024, 34, 34) f32 — ~4
        GFLOP/s (scripts/exp_r5_micro.py) — where this path is pure
        batched matmul work. SPD(A) <=> SPD(A11) and SPD(Schur), so
        NaN-on-non-SPD ladder-rejection semantics are exactly
        preserved.
      else: blocked XLA Cholesky + triangular inverse (large spines).
    """
    m = A.shape[-1]
    if m <= _UNROLL_LIMIT:
        return _chol_inv_small(A)
    if m <= _BLOCK_INV_LIMIT:
        h = (m + 1) // 2
        A11 = A[..., :h, :h]
        A12 = A[..., :h, h:]
        A22 = A[..., h:, h:]
        I11 = _spd_inv(A11)
        W = I11 @ A12
        Q = A22 - jnp.einsum("...ki,...kj->...ij", A12, W)
        Qi = _spd_inv(Q)
        B12 = -W @ Qi
        B11 = I11 - jnp.einsum("...ik,...jk->...ij", B12, W)
        top = jnp.concatenate([B11, B12], axis=-1)
        bot = jnp.concatenate([jnp.swapaxes(B12, -1, -2), Qi], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)
    L = jnp.linalg.cholesky(A)
    eye = jnp.broadcast_to(jnp.eye(m, dtype=A.dtype), A.shape)
    Linv = jax.lax.linalg.triangular_solve(
        L, eye, left_side=True, lower=True)
    return jnp.einsum("...ki,...kj->...ij", Linv, Linv)


def build_solver(f_fn: Callable, cE_fn: Callable, cI_fn: Callable,
                 z_example, options: IPMOptions = IPMOptions(),
                 z_scale=None, ineq_id=None, arrow=None, spine=None,
                 struct=None):
    """Compile-time construction of a solver for one problem family.

    f_fn/cE_fn/cI_fn: (z_pytree, params) -> scalar / (mE,) / (mI,).
    ``z_example`` fixes the variable pytree structure; ``z_scale`` is an
    optional pytree of typical magnitudes (same structure) so that internal
    regularization acts on O(1) quantities.

    ``arrow`` optionally declares the KKT system's block-arrow structure:
    an int array (K, bq) of flat-z indices forming K mutually-uncoupled
    variable blocks (coupled to the rest only through the remaining
    "spine" variables). With it, kkt='arrow' factorizes the augmented-
    Lagrangian kernel by block elimination: K batched (bq x bq)
    Cholesky factorizations plus one dense Schur Cholesky over the
    spine — instead of one dense n x n factorization.

    ``struct`` optionally supplies ANALYTIC structured derivatives as a
    ``(StructLayout, provider)`` pair (see models/obca_struct.py):
    ``provider(zv, params, sf, scE, scD, y, w_dense) -> KKTBundle`` with
    every gradient/Jacobian/Hessian piece pre-assembled in compressed
    arrow coordinates. With kkt='fused' the Newton iteration then
    contains no AD at all. The layout must agree with ``arrow``/
    ``ineq_id``.

    ``ineq_id`` optionally declares the *identity* (bound) inequality rows
    so the Newton system is built with gathers and a diagonal scatter-add
    instead of dense Jacobian matmuls — on the OBCA NLP these are ~85% of
    all inequality rows. It is a tuple
    ``(idx, sgn_off_fn, cI_dense_fn)`` where ``idx`` is a host int array
    into the *flattened* z, ``sgn_off_fn(params) -> (sgn, off)`` gives
    ``cI_id = sgn * z_flat[idx] + off``, and ``cI_dense_fn(z, params)``
    evaluates the remaining rows; ``cI_fn`` must equal their
    concatenation (identity rows first).

    Returns ``solve(z0_pytree, params) -> IPMResult`` — jit it, vmap it.
    """
    import numpy as np

    _, unravel = ravel_pytree(z_example)
    opt = options
    n = ravel_pytree(z_example)[0].shape[0]

    if z_scale is None:
        d_scale = jnp.ones_like(ravel_pytree(z_example)[0])
    else:
        d_scale = ravel_pytree(z_scale)[0]

    if ineq_id is None:
        id_idx = np.zeros((0,), dtype=np.int64)
        sgn_off_fn = None
        cI_dense_fn = cI_fn
    else:
        id_idx, sgn_off_fn, cI_dense_fn = ineq_id
        id_idx = np.asarray(id_idx, dtype=np.int64)
    m_id = id_idx.shape[0]

    kkt_mode = opt.kkt
    if kkt_mode == "fused" and struct is None:
        kkt_mode = "arrow"  # no analytic structure — AD-arrow fallback
    fused = kkt_mode == "fused"
    if arrow is not None and np.asarray(arrow).size > 0:
        q_idx_np = np.asarray(arrow, dtype=np.int64)       # (K, bq)
        _pmask = np.ones(n, dtype=bool)
        _pmask[q_idx_np.reshape(-1)] = False
        p_idx_np = np.nonzero(_pmask)[0]                    # (np_,)
    else:
        q_idx_np = p_idx_np = None
        if kkt_mode == "arrow":
            kkt_mode = "al_chol"  # no structure declared — dense fallback

    # the fully-structured Newton step (no dense n x n materialization)
    # needs both the declared arrow layout and the coloring probes
    arrow_structured = (kkt_mode == "arrow" and opt.hessian_coloring
                        and q_idx_np is not None)

    if fused:
        lay_s, provider = struct
        assert q_idx_np is not None and np.array_equal(lay_s.q_idx, q_idx_np)
        assert np.array_equal(lay_s.p_idx, p_idx_np)
        assert ineq_id is not None, "fused path needs the identity rows"
        _S = lay_s.S
        _Kb = lay_s.K
        _bqs = lay_s.bq
        _nk = lay_s.n_k
        _nO = lay_s.nO
        _mE_sp = lay_s.mE_sp
        _mD_sp = lay_s.mD_sp
        _nE_lam = _Kb * (lay_s.bq - 4)                # K*E lam bound rows
        _np_s = lay_s.np_
        # TPU scatters serialize per index row, so the fused path avoids
        # them entirely:
        #  * flat-z assembly from (p, q) is an inverse-permutation GATHER,
        #  * every block->spine accumulation first reduces over the nO
        #    obstacles sharing a horizon step, then lands through a tiny
        #    constant one-hot matrix (a dot — MXU work, one HLO op),
        #  * every spine->block broadcast is the transpose dot + reshape.
        _q_flat_np = q_idx_np.reshape(-1)
        _perm = np.concatenate([p_idx_np, _q_flat_np])
        _inv_perm_np = np.empty(n, np.int64)
        _inv_perm_np[_perm] = np.arange(n)
        # E_slot: (np, S*n_k) one-hot of each (slot, step) spine position
        _E_slot_np = np.zeros((_np_s, _S * _nk))
        for s_ in range(_S):
            for k_ in range(_nk):
                _E_slot_np[lay_s.pq_pos[s_, k_ * _nO], s_ * _nk + k_] = 1.0
        _E_th_np = _E_slot_np[:, 2 * _nk:3 * _nk]     # theta columns
        # E_id: (np, n_box) one-hot of the x/u/T bound-row positions
        _id_p_pos_np = lay_s.id_p_pos
        _E_id_np = np.zeros((_np_s, _id_p_pos_np.shape[0]))
        _E_id_np[_id_p_pos_np, np.arange(_id_p_pos_np.shape[0])] = 1.0

    # star-coloring probe matrix for the compressed Hessian (see
    # IPMOptions.hessian_coloring): one unit probe per spine variable,
    # then one summed probe per block slot
    if q_idx_np is not None and opt.hessian_coloring:
        _n_p = p_idx_np.shape[0]
        _bq = q_idx_np.shape[1]
        probes_np = np.zeros((_n_p + _bq, n), dtype=np.float64)
        probes_np[np.arange(_n_p), p_idx_np] = 1.0
        for _j in range(_bq):
            probes_np[_n_p + _j, q_idx_np[:, _j]] = 1.0
    else:
        probes_np = None

    # grouped spine coloring (see IPMOptions.spine_coloring): spine group
    # probes + the bq block-slot probes, with the model's static scatter
    # maps for reassembling (Hpp, Hpq, Hqq) from the probe outputs
    use_spine = (spine is not None and arrow_structured
                 and opt.spine_coloring)
    if use_spine:
        assert np.array_equal(np.asarray(spine["p_idx"]), p_idx_np), \
            "spine pattern layout disagrees with the arrow complement"
        _C_s = spine["probes"].shape[0]
        sp_probes_np = np.zeros((_C_s + _bq, n), dtype=np.float64)
        sp_probes_np[:_C_s] = spine["probes"]
        for _j in range(_bq):
            sp_probes_np[_C_s + _j, q_idx_np[:, _j]] = 1.0
        sp_scat_np = np.asarray(spine["scatter"], dtype=np.int64)
        sp_pq_pos_np = np.asarray(spine["pq_pos"], dtype=np.int64)
        sp_pq_group_np = np.asarray(spine["pq_group"], dtype=np.int64)

    def f_flat(zv, params):
        return f_fn(unravel(zv * d_scale), params)

    def cE_flat(zv, params):
        return cE_fn(unravel(zv * d_scale), params)

    def cI_flat(zv, params):
        return cI_fn(unravel(zv * d_scale), params)

    def cI_dense_flat(zv, params):
        return cI_dense_fn(unravel(zv * d_scale), params)

    grad_f = jax.grad(f_flat)
    jac_E = jax.jacrev(cE_flat)
    jac_I_dense = jax.jacrev(cI_dense_flat)

    def _ident(params, dtype):
        """Identity-row structure (empty when ineq_id not given)."""
        if sgn_off_fn is None:
            sgn_eff = jnp.zeros((0,), dtype)
            id_off = jnp.zeros((0,), dtype)
        else:
            sgn_raw, id_off = sgn_off_fn(params)
            # Jacobian of sgn * (zv * d_scale)[idx] wrt the scaled zv
            sgn_eff = sgn_raw.astype(dtype) * d_scale[id_idx]
        return sgn_eff, id_off

    def init_fn(z0_pytree, params):
        """Initial :class:`IPMState` (scaling fixed at z0, Ipopt-style)."""
        with jax.default_matmul_precision(opt.matmul_precision):
            z0 = ravel_pytree(z0_pytree)[0] / d_scale
            dtype = z0.dtype
            sgn_eff, id_off = _ident(params, dtype)

            # ---- gradient-based scaling at z0 (Ipopt's scheme). Identity
            # rows keep scale 1 (single entries, all well under g_max).
            if fused:
                # row-wise max |J| straight from the analytic pieces
                # (called with unit scales -> natural rows, zv columns)
                one = jnp.ones((), dtype)
                b0 = provider(z0, params, one,
                              jnp.ones((lay_s.mE,), dtype),
                              jnp.ones((lay_s.mD,), dtype),
                              jnp.zeros((lay_s.mE,), dtype),
                              jnp.zeros((lay_s.mD,), dtype))
                g0 = b0.g
                rmE_sp = jnp.max(jnp.abs(b0.JE_sp), axis=1)
                rmE_b = jnp.maximum(jnp.abs(b0.JEb_th),
                                    jnp.max(jnp.abs(b0.JEb_q), axis=2))
                rowmax_E = jnp.concatenate([rmE_sp, rmE_b[:, 0],
                                            rmE_b[:, 1]])
                rmD_sp = jnp.max(jnp.abs(b0.JD_sp), axis=1)
                rmD_b = jnp.maximum(
                    jnp.max(jnp.abs(b0.JDb_p), axis=2),
                    jnp.max(jnp.abs(b0.JDb_q), axis=2))
                rowmax_D = jnp.concatenate([rmD_sp, rmD_b[:, 0],
                                            rmD_b[:, 1]])
                scE = jnp.minimum(1.0, opt.g_max / jnp.maximum(rowmax_E,
                                                               1e-12))
                scD = jnp.minimum(1.0, opt.g_max / jnp.maximum(rowmax_D,
                                                               1e-12))
                mE = lay_s.mE
                cD0 = scD * b0.cD
            else:
                g0 = grad_f(z0, params)
                JE0 = jac_E(z0, params)
                JD0 = jac_I_dense(z0, params)
                scE = _row_scales(JE0, opt.g_max)
                scD = _row_scales(JD0, opt.g_max)
                mE = JE0.shape[0]
                cD0 = scD * cI_dense_flat(z0, params)
            sf = jnp.minimum(
                1.0, opt.g_max / jnp.maximum(jnp.max(jnp.abs(g0)), 1e-12))

            # ---- initialization (ineq duals start at <= 1, Ipopt-style)
            cI0 = jnp.concatenate([
                sgn_eff * z0[id_idx] + id_off,
                cD0,
            ])
            s0 = jnp.maximum(cI0, opt.s_init)
            mu_b0 = jnp.asarray(opt.mu0, dtype)
            w0 = jnp.clip(mu_b0 / s0, 1e-8, 1.0)
            y0 = jnp.zeros((mE,), dtype)
            return IPMState(
                z0, s0, y0, w0, mu_b0,
                jnp.asarray(opt.delta0, dtype), jnp.asarray(0, jnp.int32),
                jnp.asarray(False), jnp.asarray(0, jnp.int32),
                jnp.asarray(0, jnp.int32),
                z0, s0, y0, w0, jnp.asarray(jnp.inf, dtype),
                jnp.asarray(jnp.inf, dtype),
                sf, scE, scD,
            )

    def _make_body(params, sf, scE, scD, dtype):
        """The Newton-KKT iteration body as a pure function of IPMState.

        All problem closures are rebuilt from the state's per-lane scale
        factors + params, so the body is identical whether it runs inside
        one long ``while_loop`` (``solve``) or in compacted chunks
        (``iterate``)."""
        sgn_eff, id_off = _ident(params, dtype)
        mE, mD = scE.shape[0], scD.shape[0]
        mI = m_id + mD

        def cI_id(zv):
            return sgn_eff * zv[id_idx] + id_off

        def fs(zv):
            return sf * f_flat(zv, params)

        def cEs(zv):
            return scE * cE_flat(zv, params)

        def cDs(zv):
            return scD * cI_dense_flat(zv, params)

        def cIs(zv):
            return jnp.concatenate([cI_id(zv), cDs(zv)])

        g_fs = jax.grad(fs)
        J_Es = jax.jacrev(cEs)
        J_Ds = jax.jacrev(cDs)

        # structured inequality-Jacobian ops: JI = [identity rows; dense]
        def jiT_apply(JD, u):
            out = JD.T @ u[m_id:]
            return out.at[id_idx].add(sgn_eff * u[:m_id])

        def ji_apply(JD, dz):
            return jnp.concatenate([sgn_eff * dz[id_idx], JD @ dz])

        def jiT_diag_ji(JD, sig):
            dense = JD.T @ (sig[m_id:, None] * JD)
            diag = jnp.zeros((n,), dtype).at[id_idx].add(
                sgn_eff * sgn_eff * sig[:m_id])
            return dense + jnp.diag(diag)

        def lag(zv, y, w_d):
            # identity rows are linear in z — zero curvature, excluded
            return fs(zv) - y @ cEs(zv) - w_d @ cDs(zv)

        # ---- fused-path helpers: all applications of JE/JI and the
        # Newton assembly in compressed (spine p, blocks q) coordinates.
        # p is (np,), q is (K, bq); together they partition flat z.
        if fused:
            n_p = p_idx_np.shape[0]
            E_slot = jnp.asarray(_E_slot_np, dtype)      # (np, S*n_k)
            E_th = jnp.asarray(_E_th_np, dtype)          # (np, n_k)
            E_id = jnp.asarray(_E_id_np, dtype)          # (np, n_box)
            eye_nk = jnp.asarray(np.eye(_nk), dtype)

            def _red(vK):
                """(K, ...) block-major -> (n_k, ...) summed over the nO
                obstacles of each step."""
                return vK.reshape((_nk, _nO) + vK.shape[1:]).sum(1)

            def _bcast(vk):
                """(S, n_k) per-step spine values -> (S, K) per-block."""
                return jnp.broadcast_to(
                    vk[:, :, None], (_S, _nk, _nO)).reshape(_S, _Kb)

            def _slots_of(dp):
                """(S, K) spine slot values of each block, via E_slot."""
                return _bcast((E_slot.T @ dp).reshape(_S, _nk))

            def _f_flat(p, q):
                return jnp.concatenate([p, q.reshape(-1)])[_inv_perm_np]

            def _f_jeT(bnd, yv):
                """JE^T yv -> (p, q)."""
                yg = jnp.stack([yv[_mE_sp:_mE_sp + _Kb],
                                yv[_mE_sp + _Kb:]], axis=1)      # (K, 2)
                p = (bnd.JE_sp.T @ yv[:_mE_sp]
                     + E_th @ _red(jnp.sum(yg * bnd.JEb_th, axis=1)))
                q = jnp.einsum("kr,krb->kb", yg, bnd.JEb_q)
                return p, q

            def _f_jdT(bnd, wv):
                """JD^T wv (dense inequality rows only) -> (p, q)."""
                wg = jnp.stack([wv[_mD_sp:_mD_sp + _Kb],
                                wv[_mD_sp + _Kb:]], axis=1)      # (K, 2)
                contrib = _red(jnp.einsum("kr,krs->ks", wg, bnd.JDb_p))
                p = (bnd.JD_sp.T @ wv[:_mD_sp]
                     + E_slot @ contrib.T.reshape(-1))
                q = jnp.einsum("kr,krb->kb", wg, bnd.JDb_q)
                return p, q

            def _f_id_split(sv):
                """Identity-row vector sgn_eff*v split into block-q adds
                (lam/mu bound rows reshape straight into (K, bq)) and
                the spine-row values (land through E_id)."""
                q_add = jnp.concatenate(
                    [sv[:_nE_lam].reshape(_Kb, _bqs - 4),
                     sv[_nE_lam:_Kb * _bqs].reshape(_Kb, 4)], axis=1)
                return q_add, sv[_Kb * _bqs:]

            def _f_jiT(bnd, wv):
                """JI^T wv (identity + dense rows) -> (p, q)."""
                p, q = _f_jdT(bnd, wv[m_id:])
                q_add, p_vals = _f_id_split(sgn_eff * wv[:m_id])
                return p + E_id @ p_vals, q + q_add

            def _f_clique(cliq):
                """(K, S, S) per-block spine cliques -> dense (np, np)
                via reduce-over-obstacles + diag-embed + two tiny dots."""
                red = _red(cliq)                               # (n_k,S,S)
                C = (red.transpose(1, 0, 2)[:, :, :, None]
                     * eye_nk[None, :, None, :])               # (S,nk,S,nk)
                C = C.reshape(_S * _nk, _S * _nk)
                return E_slot @ C @ E_slot.T

            def _f_ji(bnd, dz):
                """JI dz -> (mI,) in row order [identity; dense]."""
                dzp = dz[p_idx_np]
                dzq = dz[_q_flat_np].reshape(_Kb, _bqs)
                idr = sgn_eff * dz[id_idx]
                sp = bnd.JD_sp @ dzp
                slot = _slots_of(dzp)                          # (S, K)
                blk = (jnp.einsum("krs,sk->kr", bnd.JDb_p, slot)
                       + jnp.einsum("krb,kb->kr", bnd.JDb_q, dzq))
                return jnp.concatenate([idr, sp, blk[:, 0], blk[:, 1]])

            def _f_jev(bnd, dp, dq):
                """JE (dp, dq) -> (mE,)."""
                sp = bnd.JE_sp @ dp
                thK = jnp.broadcast_to(
                    (E_th.T @ dp)[:, None], (_nk, _nO)).reshape(_Kb)
                gv = (bnd.JEb_th * thK[:, None]
                      + jnp.einsum("krb,kb->kr", bnd.JEb_q, dq))
                return jnp.concatenate([sp, gv[:, 0], gv[:, 1]])

        if probes_np is None:
            hess_lag = jax.hessian(lag)
        else:
            probes = jnp.asarray(probes_np, dtype)
            n_p = p_idx_np.shape[0]

            def hess_lag(zv, y, w_d):
                # compressed Hessian: HV[c] = H @ probe_c. Spine probes
                # give full columns; block-slot probes give each block's
                # own rows (cross-block entries are exactly zero); the
                # spine rows of block columns come from symmetry.
                def hvp(v):
                    return jax.jvp(lambda z_: jax.grad(lag)(z_, y, w_d),
                                   (zv,), (v,))[1]

                HV = jax.vmap(hvp)(probes)                    # (C, n)
                Hp = HV[:n_p].T                                # (n, n_p)
                Hqq = jnp.transpose(
                    HV[n_p:][:, q_idx_np], (1, 2, 0))          # (K, bq, bq)
                H = jnp.zeros((n, n), dtype)
                H = H.at[:, p_idx_np].set(Hp)
                H = H.at[p_idx_np, :].set(Hp.T)
                H = H.at[q_idx_np[:, :, None],
                         q_idx_np[:, None, :]].set(Hqq)
                return H

        def barrier_obj(zv, s, mu_b):
            return fs(zv) - mu_b * jnp.sum(jnp.log(s))

        def theta(zv, s):
            """Scaled constraint violation (the filter's second axis)."""
            return jnp.sum(jnp.abs(cEs(zv))) + jnp.sum(jnp.abs(cIs(zv) - s))

        def kkt_error_from(r_d, cE, cI, s, y, w, mu_b):
            """Scaled KKT error from already-evaluated pieces — the body
            evaluates each iterate's gradient/Jacobians exactly once and
            derives both the mu-error and the mu=0 error from them."""
            r_sw = s * w - mu_b
            r_I = cI - s
            sd = jnp.maximum(
                opt.g_max,
                (jnp.sum(jnp.abs(y)) + jnp.sum(jnp.abs(w))) / max(mE + mI, 1),
            ) / opt.g_max
            sc = jnp.maximum(opt.g_max, jnp.sum(jnp.abs(w)) / max(mI, 1)) / opt.g_max
            return jnp.maximum(
                jnp.max(jnp.abs(r_d)) / sd,
                jnp.maximum(
                    jnp.maximum(jnp.max(jnp.abs(cE)), jnp.max(jnp.abs(r_I))),
                    jnp.max(jnp.abs(r_sw)) / sc,
                ),
            )

        def body(st: IPMState):
            zv, s, y, w = st.zv, st.s, st.y, st.w

            # ---- ONE evaluation set per iterate (grad + Jacobians +
            # constraints); the KKT errors, the watchdog, the barrier
            # update AND the Newton step below all reuse these pieces.
            if fused:
                bnd = provider(zv, params, sf, scE, scD, y, w[m_id:])
                cE = bnd.cE
                cI = jnp.concatenate([cI_id(zv), bnd.cD])
                jeTp, jeTq = _f_jeT(bnd, y)
                jiTp, jiTq = _f_jiT(bnd, w)
                r_d = bnd.g - _f_flat(jeTp + jiTp, jeTq + jiTq)
            else:
                g = g_fs(zv)
                JE = J_Es(zv)
                JD = J_Ds(zv)
                cE = cEs(zv)
                cI = cIs(zv)
                r_d = g - JE.T @ y - jiT_apply(JD, w)
            err_0 = kkt_error_from(r_d, cE, cI, s, y, w,
                                   jnp.asarray(0.0, dtype))
            err_mu = kkt_error_from(r_d, cE, cI, s, y, w, st.mu_b)

            # unscaled violation of this iterate (identity inequality rows
            # are already in natural units; scaled rows unscale by their
            # row factors) — the feasibility axis of the acceptance tests
            viol_u = jnp.maximum(
                jnp.max(jnp.abs(cE) / jnp.maximum(scE, 1e-12), initial=0.0),
                jnp.maximum(
                    jnp.max(-cI[:m_id], initial=0.0),
                    jnp.max(-cI[m_id:] / jnp.maximum(scD, 1e-12), initial=0.0),
                ),
            )
            ok_u = viol_u <= opt.acceptable_viol_tol

            # watchdog: record the best iterate — prefer acceptable-level
            # feasibility, then lowest mu=0 error (an err-only key can
            # strand the solve on a low-KKT but materially infeasible
            # iterate at degenerate contacts)
            best_ok = st.best_viol <= opt.acceptable_viol_tol
            better = (ok_u & ~best_ok) | (
                (ok_u == best_ok) & (err_0 < st.best_err)
            )
            best_zv = jnp.where(better, zv, st.best_zv)
            best_s = jnp.where(better, s, st.best_s)
            best_y = jnp.where(better, y, st.best_y)
            best_w = jnp.where(better, w, st.best_w)
            best_err = jnp.where(better, err_0, st.best_err)
            best_viol = jnp.where(better, viol_u, st.best_viol)

            acc_it = jnp.where((err_0 <= opt.acceptable_tol) & ok_u,
                               st.acc_it + 1, jnp.asarray(0, jnp.int32))
            done = (err_0 <= opt.tol) | (acc_it >= opt.acceptable_iter)
            # stall accounting: progress = feasibility flip or a RELATIVE
            # error reduction (see IPMOptions.stall_rel)
            progress = (ok_u & ~best_ok) | (
                (ok_u == best_ok)
                & (err_0 < st.best_err * (1.0 - opt.stall_rel))
            )
            stall_it = jnp.where(progress, jnp.asarray(0, jnp.int32),
                                 st.stall_it + 1)
            if opt.stall_iters > 0:
                cut = stall_it >= opt.stall_iters
                if opt.stall_viol_gate:
                    # protect still-converging lanes: cut only those whose
                    # best iterate is materially infeasible (cutting
                    # slow-but-feasible lanes lost 2-7/256 ladder-feasible
                    # lanes in the round-4 knob sweep, scripts/exp_r4.py
                    # C/E/F)
                    cut = cut & (best_viol > opt.acceptable_viol_tol)
                done = done | cut

            # monotone Fiacco-McCormick barrier update at iteration start
            shrink = err_mu <= opt.kappa_eps * st.mu_b
            mu_b = jnp.where(
                shrink,
                jnp.maximum(opt.tol / 10.0,
                            jnp.minimum(opt.kappa_mu * st.mu_b,
                                        st.mu_b ** opt.theta_mu)),
                st.mu_b,
            )

            sigma = w / s
            if fused:
                up, uq = _f_jiT(bnd, (w * cI - mu_b) / s)
                rhs1 = -r_d - _f_flat(up, uq)
            else:
                rhs1 = -r_d - jiT_apply(JD, (w * cI - mu_b) / s)
            rhs2 = -cE

            # --- parallel regularization ladder (inertia correction)
            base = jnp.maximum(st.delta, opt.delta0)
            ladder = base * (opt.delta_step ** jnp.arange(opt.n_deltas, dtype=dtype))
            dd = jnp.asarray(opt.delta_d_al, dtype)

            if fused:
                # ---- analytic fused Newton step: W and the AL kernel
                # G = W + delta*I + J^T J/dd assembled straight from the
                # provider's compressed pieces; the block<->spine
                # coupling stays (K, S, bq)-compressed end to end, and
                # every accumulation lands through the constant one-hot
                # dots (no scatters — see the _E_* statics).
                n_p = p_idx_np.shape[0]
                diag_vals = sgn_eff * sgn_eff * sigma[:m_id]
                diag_q, diag_p_vals = _f_id_split(diag_vals)
                diag_p = E_id @ diag_p_vals
                sig_sp = sigma[m_id:m_id + _mD_sp]
                sig_blk = jnp.stack(
                    [sigma[m_id + _mD_sp:m_id + _mD_sp + _Kb],
                     sigma[m_id + _mD_sp + _Kb:]], axis=1)      # (K, 2)

                JDs_sp = bnd.JD_sp * sig_sp[:, None]
                cliq = jnp.einsum("kr,krs,krt->kst", sig_blk,
                                  bnd.JDb_p, bnd.JDb_p)
                Wpp = (bnd.Hpp + JDs_sp.T @ bnd.JD_sp + jnp.diag(diag_p)
                       + _f_clique(cliq))
                Wpq = bnd.Hpq_c + jnp.einsum("kr,krs,krb->ksb", sig_blk,
                                             bnd.JDb_p, bnd.JDb_q)
                eye_b = jnp.eye(_bqs, dtype=dtype)
                Wqq = (bnd.Hqq
                       + jnp.einsum("kr,krb,krc->kbc", sig_blk,
                                    bnd.JDb_q, bnd.JDb_q)
                       + eye_b[None] * diag_q[:, None, :])

                th2 = _red(jnp.sum(bnd.JEb_th ** 2, axis=1)) / dd
                Gpp0 = (Wpp + (bnd.JE_sp.T @ bnd.JE_sp) / dd
                        + (E_th * th2[None, :]) @ E_th.T)
                # one-hot broadcast add, not .at[:, 2, :].add — offset
                # updates on tiled minor dims hit the misaligned
                # dynamic-update-slice scalar path (see obca_struct Hqq)
                e_th_slot = jnp.zeros((_S,), dtype).at[2].set(1.0)
                Gpq0 = Wpq + (e_th_slot[None, :, None]
                              * jnp.einsum("kr,krb->kb", bnd.JEb_th,
                                           bnd.JEb_q)[:, None, :] / dd)
                Gqq0 = Wqq + jnp.einsum("krb,krc->kbc", bnd.JEb_q,
                                        bnd.JEb_q) / dd
                eye_p = jnp.eye(n_p, dtype=dtype)

                r1p, r1q = rhs1[p_idx_np], rhs1[q_idx_np]
                jt2p, jt2q = _f_jeT(bnd, rhs2)
                jt2p, jt2q = jt2p / dd, jt2q / dd

                def wmv(dp, dq):
                    slot = _slots_of(dp)                        # (S, K)
                    op = (Wpp @ dp + E_slot @ _red(
                        jnp.einsum("ksb,kb->ks", Wpq, dq)).T.reshape(-1))
                    oq = (jnp.einsum("ksb,sk->kb", Wpq, slot)
                          + jnp.einsum("kbc,kc->kb", Wqq, dq))
                    return op, oq

                def kkt_solve_fused(delta):
                    Gqq = Gqq0 + delta * eye_b
                    Gpp = Gpp0 + delta * eye_p
                    Qinv = _chol_inv_small(Gqq)                 # (K,bq,bq)
                    Gqp = jnp.transpose(Gpq0, (0, 2, 1))        # (K,bq,S)
                    Yq = jnp.einsum("kbc,kcs->kbs", Qinv, Gqp)
                    SS = jnp.einsum("ksb,kbt->kst", Gpq0, Yq)
                    S = Gpp - _f_clique(SS)
                    Sinv = _spd_inv(S)

                    def gsolve(bp, bq_):
                        wq = jnp.einsum("kbc,kc->kb", Qinv, bq_)
                        rp = bp - E_slot @ _red(
                            jnp.einsum("ksb,kb->ks", Gpq0,
                                       wq)).T.reshape(-1)
                        dp = Sinv @ rp
                        dq = wq - jnp.einsum("kbs,sk->kb", Yq,
                                             _slots_of(dp))
                        return dp, dq

                    def al_solve(bp, bq_, r2, jtp, jtq):
                        dp, dq = gsolve(bp + jtp, bq_ + jtq)
                        v = (_f_jev(bnd, dp, dq) - r2) / dd
                        return dp, dq, v

                    dp, dq, v = al_solve(r1p, r1q, rhs2, jt2p, jt2q)
                    for _ in range(opt.n_refine):
                        wp_, wq_ = wmv(dp, dq)
                        vp, vq = _f_jeT(bnd, v)
                        res1p = wp_ + delta * dp + vp - r1p
                        res1q = wq_ + delta * dq + vq - r1q
                        res2 = (_f_jev(bnd, dp, dq) - opt.delta_d * v
                                - rhs2)
                        cp2, cq2 = _f_jeT(bnd, res2)
                        cp, cq, cv = al_solve(res1p, res1q, res2,
                                              cp2 / dd, cq2 / dd)
                        dp, dq, v = dp - cp, dq - cq, v - cv
                    dz = _f_flat(dp, dq)
                    sol = jnp.concatenate([dz, v])
                    wp_, wq_ = wmv(dp, dq)
                    curv = (dp @ wp_ + jnp.sum(dq * wq_)
                            + delta * (dp @ dp + jnp.sum(dq * dq)))
                    good = jnp.all(jnp.isfinite(sol)) & (curv > 0)
                    return sol, good

                with jax.default_matmul_precision(
                        opt.kkt_matmul_precision or opt.matmul_precision):
                    # rungs as an unrolled python loop, NOT vmap: a
                    # small non-leading rung axis makes the batched
                    # Cholesky/triangular kernels ~2.5x slower instead
                    # of 2x (measured scripts/exp_r5_micro.py: spd_inv
                    # (B,2,34,34) 34 ms vs (2B,34,34) 21 ms, and even a
                    # dummy (B,1,...) axis costs ~35%); unrolling keeps
                    # every tensor in its natural per-lane layout.
                    rung = [kkt_solve_fused(ladder[j])
                            for j in range(opt.n_deltas)]
                    sols = jnp.stack([r[0] for r in rung])
                    goods = jnp.stack([r[1] for r in rung])
            elif arrow_structured:
                # ---- fully structured Newton step: H, W and the AL
                # kernel G = W + delta*I + J^T J/dd are built and
                # factorized directly in arrow-block form
                #   (App (np,np), Apq (np,K,bq), Aqq (K,bq,bq))
                # — the dense (n, n) matrices are never materialized.
                # Correct because (a) the Hessian's cross-block entries
                # are exactly zero (the coloring invariant) and (b) every
                # dense constraint row touches at most ONE dual block
                # plus the spine, so J^T D J has the same sparsity (see
                # tests/test_solver.py::test_arrow_kkt_matches_dense_al_chol).
                n_p = p_idx_np.shape[0]
                w_d = w[m_id:]

                def hvp(v):
                    return jax.jvp(
                        lambda z_: jax.grad(lag)(z_, y, w_d), (zv,), (v,)
                    )[1]

                if use_spine:
                    # grouped probes: C_s spine groups + bq block slots —
                    # static scatter maps reassemble the exact arrow
                    # pieces (tests: test_spine_coloring_matches_full)
                    HV = jax.vmap(hvp)(jnp.asarray(sp_probes_np, dtype))
                    HVs = HV[:_C_s]
                    Hqq = jnp.transpose(HV[_C_s:][:, q_idx_np], (1, 2, 0))
                    Hpp = jnp.zeros((n_p, n_p), dtype).at[
                        sp_scat_np[:, 0], sp_scat_np[:, 1]].set(
                        HVs[sp_scat_np[:, 2], sp_scat_np[:, 3]])
                    K_ = q_idx_np.shape[0]
                    Hpq = jnp.zeros((n_p, K_, q_idx_np.shape[1]), dtype)
                    for s_ in range(sp_pq_pos_np.shape[0]):
                        Hpq = Hpq.at[sp_pq_pos_np[s_],
                                     jnp.arange(K_), :].set(
                            HVs[sp_pq_group_np[s_]][q_idx_np])
                else:
                    HV = jax.vmap(hvp)(probes)               # (np+bq, n)
                    Hp = HV[:n_p]                            # (np, n)
                    Hpp = Hp[:, p_idx_np]
                    Hpq = Hp[:, q_idx_np]                    # (np, K, bq)
                    Hqq = jnp.transpose(HV[n_p:][:, q_idx_np], (1, 2, 0))

                diag_n = jnp.zeros((n,), dtype).at[id_idx].add(
                    sgn_eff * sgn_eff * sigma[:m_id])
                sig_d = sigma[m_id:]
                JD_p = JD[:, p_idx_np]
                JD_q = JD[:, q_idx_np]                       # (mD, K, bq)
                JE_p = JE[:, p_idx_np]
                JE_q = JE[:, q_idx_np]
                JDs = JD_p * sig_d[:, None]
                Wpp = (Hpp + JDs.T @ JD_p
                       + jnp.diag(diag_n[p_idx_np]))
                Wpq = Hpq + jnp.einsum("ma,mkb->akb", JDs, JD_q)
                Wqq = (Hqq
                       + jnp.einsum("mkb,mkc->kbc",
                                    JD_q * sig_d[:, None, None], JD_q)
                       + jax.vmap(jnp.diag)(diag_n[q_idx_np]))
                Gpp0 = Wpp + (JE_p.T @ JE_p) / dd
                Gpq0 = Wpq + jnp.einsum("ma,mkb->akb", JE_p, JE_q) / dd
                Gqq0 = Wqq + jnp.einsum("mkb,mkc->kbc", JE_q, JE_q) / dd
                eye_p = jnp.eye(n_p, dtype=dtype)
                eye_b = jnp.eye(q_idx_np.shape[1], dtype=dtype)

                r1p, r1q = rhs1[p_idx_np], rhs1[q_idx_np]
                jt2p = (JE_p.T @ rhs2) / dd
                jt2q = jnp.einsum("m,mkb->kb", rhs2, JE_q) / dd

                def wmv(dp, dq):
                    op = Wpp @ dp + jnp.einsum("akb,kb->a", Wpq, dq)
                    oq = (jnp.einsum("akb,a->kb", Wpq, dp)
                          + jnp.einsum("kbc,kc->kb", Wqq, dq))
                    return op, oq

                def jev(dp, dq):
                    return JE_p @ dp + jnp.einsum("mkb,kb->m", JE_q, dq)

                def kkt_solve_arrow_s(delta):
                    Gqq = Gqq0 + delta * eye_b
                    Gpp = Gpp0 + delta * eye_p
                    Qinv = _chol_inv_small(Gqq)              # (K, bq, bq)
                    Gqp = jnp.transpose(Gpq0, (1, 2, 0))     # (K, bq, np)
                    Yq = jnp.einsum("kbc,kcp->kbp", Qinv, Gqp)
                    S = Gpp - jnp.einsum("pkb,kbq->pq", Gpq0, Yq)
                    # explicit spine inverse: every later solve is a
                    # matvec — no serial triangular substitution.
                    # _spd_inv routes spines above _UNROLL_LIMIT through
                    # the blocked XLA Cholesky (accuracy + compile size).
                    Sinv = _spd_inv(S)

                    def gsolve(bp, bq_):
                        wq = jnp.einsum("kbc,kc->kb", Qinv, bq_)
                        rp = bp - jnp.einsum("pkb,kb->p", Gpq0, wq)
                        dp = Sinv @ rp
                        dq = wq - jnp.einsum("kbp,p->kb", Yq, dp)
                        return dp, dq

                    def al_solve(bp, bq_, r2, jtp, jtq):
                        dp, dq = gsolve(bp + jtp, bq_ + jtq)
                        v = (jev(dp, dq) - r2) / dd
                        return dp, dq, v

                    dp, dq, v = al_solve(r1p, r1q, rhs2, jt2p, jt2q)
                    for _ in range(opt.n_refine):
                        wp_, wq_ = wmv(dp, dq)
                        res1p = wp_ + delta * dp + JE_p.T @ v - r1p
                        res1q = (wq_ + delta * dq
                                 + jnp.einsum("m,mkb->kb", v, JE_q) - r1q)
                        res2 = jev(dp, dq) - opt.delta_d * v - rhs2
                        cp, cq, cv = al_solve(
                            res1p, res1q, res2, (JE_p.T @ res2) / dd,
                            jnp.einsum("m,mkb->kb", res2, JE_q) / dd)
                        dp, dq, v = dp - cp, dq - cq, v - cv
                    dz = (jnp.zeros((n,), dtype)
                          .at[p_idx_np].set(dp)
                          .at[q_idx_np.reshape(-1)].set(dq.reshape(-1)))
                    sol = jnp.concatenate([dz, v])
                    wp_, wq_ = wmv(dp, dq)
                    curv = (dp @ wp_ + jnp.sum(dq * wq_)
                            + delta * (dp @ dp + jnp.sum(dq * dq)))
                    good = jnp.all(jnp.isfinite(sol)) & (curv > 0)
                    return sol, good

                with jax.default_matmul_precision(
                        opt.kkt_matmul_precision or opt.matmul_precision):
                    sols, goods = jax.vmap(kkt_solve_arrow_s)(ladder)
            else:
                with jax.default_matmul_precision(
                        opt.kkt_matmul_precision or opt.matmul_precision):
                    sols, goods = _dense_kkt(zv, y, w, s, sigma, JE, JD,
                                             cE, cI, mu_b, rhs1, rhs2,
                                             ladder, dd)
            first = jnp.argmax(goods)  # first True, or 0 if none
            any_good = jnp.any(goods)
            pick = jnp.where(any_good, first, opt.n_deltas - 1)
            sol = sols[pick]
            delta_used = ladder[pick]
            bad = jnp.logical_not(any_good & jnp.all(jnp.isfinite(sol)))

            dz = sol[:n]
            dy = -sol[n:]
            if fused:
                ds = _f_ji(bnd, dz) + (cI - s)
            else:
                ds = ji_apply(JD, dz) + (cI - s)
            dw = -(s * w - mu_b + w * ds) / s

            # fraction-to-boundary
            tau = jnp.maximum(opt.tau_min, 1.0 - mu_b)
            a_s = jnp.min(jnp.where(ds < 0, -tau * s / jnp.where(ds < 0, ds, -1.0), 1.0))
            a_w = jnp.min(jnp.where(dw < 0, -tau * w / jnp.where(dw < 0, dw, -1.0), 1.0))
            a_s = jnp.minimum(a_s, 1.0)
            a_w = jnp.minimum(a_w, 1.0)

            # vectorized filter-style backtracking
            if fused:
                # cE/cI for this iterate are already in hand
                phi0 = bnd.f - mu_b * jnp.sum(jnp.log(s))
                th0 = jnp.sum(jnp.abs(cE)) + jnp.sum(jnp.abs(cI - s))
            else:
                phi0 = barrier_obj(zv, s, mu_b)
                th0 = theta(zv, s)
            g_th = 1e-5
            alphas = a_s * (0.5 ** jnp.arange(opt.n_backtracks, dtype=dtype))

            def trial(a):
                zt = zv + a * dz
                st_ = s + a * ds
                return barrier_obj(zt, st_, mu_b), theta(zt, st_)

            phis, ths = jax.vmap(trial)(alphas)
            ok = jnp.isfinite(phis) & (
                (ths <= (1.0 - g_th) * th0) | (phis <= phi0 - g_th * th0)
            )
            any_ok = jnp.any(ok)
            alpha = jnp.where(any_ok, jnp.max(jnp.where(ok, alphas, 0.0)), 0.0)

            step_ok = jnp.logical_and(~bad, any_ok)
            alpha = jnp.where(step_ok, alpha, 0.0)
            a_wd = jnp.where(step_ok, a_w, 0.0)

            # masked update — alpha = 0 alone is not enough: a rejected
            # step can carry NaN directions (all-Cholesky-rung failure)
            # and 0 * NaN would poison the state
            zv_n = jnp.where(step_ok, zv + alpha * dz, zv)
            s_n = jnp.where(step_ok, s + alpha * ds, s)
            # equality duals move with the primal step (Ipopt); only the
            # inequality duals are fraction-to-boundary limited
            y_n = jnp.where(step_ok, y + alpha * dy, y)
            w_n = jnp.where(step_ok, w + a_wd * dw, w)
            # kappa_Sigma safeguard (Ipopt eq. 16)
            w_n = jnp.clip(
                w_n,
                mu_b / (opt.kappa_sigma * s_n),
                opt.kappa_sigma * mu_b / s_n,
            )

            # regularization memory: decay on clean success, grow on failure
            delta_n = jnp.where(
                step_ok,
                jnp.maximum(opt.delta0, delta_used / 30.0),
                jnp.minimum(opt.delta_max, jnp.maximum(st.delta * 100.0, 1e-4)),
            )

            if opt.debug:
                jax.debug.print(
                    "it={i} err0={e:.3e} errmu={em:.3e} mu={m:.2e} a={a:.2e} "
                    "aw={aw:.2e} d={d:.1e} th0={t:.3e} |rd|={rd:.2e} "
                    "|cE|={ce:.2e} |w|={wm:.2e}",
                    i=st.it, e=err_0, em=err_mu, m=mu_b, a=alpha, aw=a_wd,
                    d=delta_used, t=th0,
                    rd=jnp.max(jnp.abs(r_d)),
                    ce=jnp.max(jnp.abs(cE)),
                    wm=jnp.max(w_n),
                )

            return IPMState(zv_n, s_n, y_n, w_n, mu_b, delta_n, st.it + 1,
                            done, acc_it, stall_it, best_zv, best_s, best_y,
                            best_w, best_err, best_viol, sf, scE, scD)

        def _dense_kkt(zv, y, w, s, sigma, JE, JD, cE, cI, mu_b,
                       rhs1, rhs2, ladder, dd):
            """Dense-assembled KKT step (chol/qr/al_chol and the gather-
            based arrow path used when hessian coloring is off)."""
            H = hess_lag(zv, y, w[m_id:])
            W = H + jiT_diag_ji(JD, sigma)
            dtype = zv.dtype
            eye_n = jnp.eye(n, dtype=dtype)
            eye_m = jnp.eye(mE, dtype=dtype)

            def kkt_solve_chol(delta):
                # Cholesky + Schur complement. W + delta*I must be SPD —
                # a failed factorization yields NaNs and rejects the rung,
                # which IS the inertia correction (same rule IPOPT uses:
                # grow delta until the reduced Hessian is PD). Cholesky is
                # blocked and MXU-friendly; LU-with-pivoting is serial per
                # column and pathologically slow on TPU.
                Wd = W + delta * eye_n
                Lw = jnp.linalg.cholesky(Wd)

                def wsolve(B):
                    return jax.scipy.linalg.cho_solve((Lw, True), B)

                WiJt = wsolve(JE.T)                       # (n, mE)
                S = JE @ WiJt + opt.delta_d * eye_m       # SPD Schur
                Ls = jnp.linalg.cholesky(S)

                def full_solve(r1, r2):
                    Wir1 = wsolve(r1)
                    v = jax.scipy.linalg.cho_solve(
                        (Ls, True), JE @ Wir1 - r2)
                    return Wir1 - WiJt @ v, v

                dz, v = full_solve(rhs1, rhs2)
                # one iterative-refinement pass (float32-friendly);
                # K @ sol computed blockwise without assembling K
                res1 = Wd @ dz + JE.T @ v - rhs1
                res2 = JE @ dz - opt.delta_d * v - rhs2
                dzc, vc = full_solve(res1, res2)
                dz = dz - dzc
                v = v - vc
                sol = jnp.concatenate([dz, v])
                curv = dz @ (W @ dz) + delta * (dz @ dz)
                good = jnp.all(jnp.isfinite(sol)) & (curv > 0)
                return sol, good

            JtJ_dd = (JE.T @ JE) / dd
            Jt_rhs2_dd = (JE.T @ rhs2) / dd

            def kkt_solve_al(delta):
                # exact elimination of the dual block with dual
                # regularization dd (see IPMOptions.kkt); refinement
                # below then removes the dd-bias by re-solving against
                # the lightly-regularized (delta_d) saddle system.
                G = W + delta * eye_n + JtJ_dd
                L = jnp.linalg.cholesky(G)

                def al_solve(r1, r2, jt_r2_dd):
                    dz = jax.scipy.linalg.cho_solve((L, True), r1 + jt_r2_dd)
                    v = (JE @ dz - r2) / dd
                    return dz, v

                dz, v = al_solve(rhs1, rhs2, Jt_rhs2_dd)
                Wd = W + delta * eye_n
                for _ in range(opt.n_refine):
                    res1 = Wd @ dz + JE.T @ v - rhs1
                    res2 = JE @ dz - opt.delta_d * v - rhs2
                    dzc, vc = al_solve(res1, res2, (JE.T @ res2) / dd)
                    dz = dz - dzc
                    v = v - vc
                sol = jnp.concatenate([dz, v])
                curv = dz @ (W @ dz) + delta * (dz @ dz)
                good = jnp.all(jnp.isfinite(sol)) & (curv > 0)
                return sol, good

            def kkt_solve_arrow(delta):
                # al_chol's augmented-Lagrangian kernel
                #   G = W + delta*I + J^T J / dd
                # factorized by the declared block-arrow structure: the K
                # dual blocks (indices q_idx) are mutually uncoupled, so
                #   G = [[Gpp, Gpq], [Gqp, blockdiag(Gqq_k)]]
                # and eliminating them leaves the dense spine Schur
                # system S = Gpp - sum_k Gpq_k Gqq_k^{-1} Gqp_k. SPD of
                # G <=> SPD of every Gqq_k and of S, so the NaN-on-
                # failure ladder-rejection semantics are exactly those
                # of the dense Cholesky.
                G = W + delta * eye_n + JtJ_dd
                Gqq = G[q_idx_np[:, :, None], q_idx_np[:, None, :]]
                Gpq = G[p_idx_np[:, None, None], q_idx_np[None, :, :]]
                Gpp = G[p_idx_np[:, None], p_idx_np[None, :]]
                # unrolled tiny-block inverse (see _chol_inv_small: the
                # batched LAPACK path was 13.7 of the 22 ms iteration)
                Qinv = _chol_inv_small(Gqq)                  # (K, bq, bq)
                Gqp = jnp.transpose(Gpq, (1, 2, 0))          # (K, bq, np_)
                Yq = jnp.einsum("kbc,kcp->kbp", Qinv, Gqp)
                S = Gpp - jnp.einsum("pkb,kbq->pq", Gpq, Yq)
                Ls = jnp.linalg.cholesky(S)

                def gsolve(b):
                    bq = b[q_idx_np]                         # (K, bq)
                    wq = jnp.einsum("kbc,kc->kb", Qinv, bq)
                    rp = b[p_idx_np] - jnp.einsum("pkb,kb->p", Gpq, wq)
                    dp = jax.scipy.linalg.cho_solve(
                        (Ls, True), rp[..., None])[..., 0]
                    dq = wq - jnp.einsum("kbp,p->kb", Yq, dp)
                    return (jnp.zeros((n,), dtype)
                            .at[p_idx_np].set(dp)
                            .at[q_idx_np.reshape(-1)].set(dq.reshape(-1)))

                def al_solve(r1, r2, jt_r2_dd):
                    dz = gsolve(r1 + jt_r2_dd)
                    v = (JE @ dz - r2) / dd
                    return dz, v

                dz, v = al_solve(rhs1, rhs2, Jt_rhs2_dd)
                Wd = W + delta * eye_n
                for _ in range(opt.n_refine):
                    res1 = Wd @ dz + JE.T @ v - rhs1
                    res2 = JE @ dz - opt.delta_d * v - rhs2
                    dzc, vc = al_solve(res1, res2, (JE.T @ res2) / dd)
                    dz = dz - dzc
                    v = v - vc
                sol = jnp.concatenate([dz, v])
                curv = dz @ (W @ dz) + delta * (dz @ dz)
                good = jnp.all(jnp.isfinite(sol)) & (curv > 0)
                return sol, good

            def kkt_solve_qr(delta):
                # Householder-QR on the full saddle system: handles
                # indefinite W (inertia surrogate = directional-curvature
                # test), at ~2x the flops of the Schur path.
                K = jnp.block([
                    [W + delta * eye_n, JE.T],
                    [JE, -opt.delta_d * eye_m],
                ])
                Q, R = jnp.linalg.qr(K)

                def ksolve(b):
                    return jax.scipy.linalg.solve_triangular(R, Q.T @ b)

                rhs = jnp.concatenate([rhs1, rhs2])
                sol = ksolve(rhs)
                sol = sol - ksolve(K @ sol - rhs)
                dz = sol[:n]
                curv = dz @ (W @ dz) + delta * (dz @ dz)
                good = jnp.all(jnp.isfinite(sol)) & (curv > 0)
                return sol, good

            kkt_solve = {"chol": kkt_solve_chol, "qr": kkt_solve_qr,
                         "al_chol": kkt_solve_al,
                         "arrow": kkt_solve_arrow}[kkt_mode]
            return jax.vmap(kkt_solve)(ladder)

        return body

    def iterate_fn(st: IPMState, params, it_cap):
        """Run Newton iterations until convergence or ``st.it == it_cap``
        (a *traced* scalar — one compile serves every chunk boundary).
        The global ``opt.max_iters`` still bounds the total."""
        with jax.default_matmul_precision(opt.matmul_precision):
            body = _make_body(params, st.sf, st.scE, st.scD, st.zv.dtype)
            cap = jnp.minimum(jnp.asarray(it_cap, jnp.int32), opt.max_iters)

            def cond(s_: IPMState):
                return jnp.logical_and(s_.it < cap, ~s_.done)

            return jax.lax.while_loop(cond, body, st)

    def finalize_fn(st: IPMState, params) -> IPMResult:
        """Report the watchdog's best iterate, Ipopt acceptable-level rules."""
        with jax.default_matmul_precision(opt.matmul_precision):
            zv, s, y, w, err = (st.best_zv, st.best_s, st.best_y, st.best_w,
                                st.best_err)
            cE_u = cE_flat(zv, params)
            cI_u = cI_flat(zv, params)
            viol = jnp.maximum(
                jnp.max(jnp.abs(cE_u)), jnp.maximum(0.0, -jnp.min(cI_u))
            )
            converged = err <= opt.tol
            acceptable = err <= opt.acceptable_tol
            # IPOPT's two-level acceptance: full success at (tol, feas_tol),
            # else "Solved To Acceptable Level" at (acceptable_tol,
            # acceptable_viol_tol) — the reference treats both as feas=True
            # (src/obca.py:1052-1056, IPOPT acceptable_constr_viol_tol).
            feas = jnp.logical_or(
                jnp.logical_and(converged, viol <= opt.feas_tol),
                jnp.logical_and(acceptable, viol <= opt.acceptable_viol_tol),
            )
            return IPMResult(
                z=unravel(zv * d_scale),
                s=s,
                y=y,
                w=w,
                f=f_flat(zv, params),
                kkt_err=err,
                viol=viol,
                iters=st.it,
                converged=converged,
                feas=feas,
            )

    def solve(z0_pytree, params):
        st = init_fn(z0_pytree, params)
        st = iterate_fn(st, params, opt.max_iters)
        return finalize_fn(st, params)

    # chunked-iteration API for compacted batch drivers (solver/compact.py)
    solve.init = init_fn
    solve.iterate = iterate_fn
    solve.finalize = finalize_fn
    return solve
