"""Fully-jitted closed-loop rollout under ``lax.scan`` — the batched/TPU
product.

Semantically the same receding-horizon loop as
:class:`.closed_loop.ClosedLoopRunner` (reference
``closed_loop_mpc4``, src/closed_loop.py:323-443), but expressed as a pure
fixed-shape scan so that ``vmap`` runs thousands of scenarios per chip and
``pjit``/``shard_map`` spread the scenario axis over a mesh:

  * all four solver variants (free-time + its no-terminal fallback /
    fix-time-with-terminal-set / its no-terminal fallback) are solved
    every step and the applicable result is selected by the lidar mode
    flag and the feasibility ladder — batch members diverge in mode, so
    under vmap every branch executes anyway (SPMD-friendly control flow),
  * per-scenario termination (goal reached, infeasible abort, the k == 30
    step cap of src/closed_loop.py:431) is a masked freeze, not an exit —
    a diverged scenario never poisons the batch,
  * the multi-start candidate set is generated with traced geometry
    (window / shifted previous plan / brake / dodge-below / dodge-above).

Restriction vs the host driver: N_fix must equal N_free (true for every
shipped demo; the re-interpolation of src/closed_loop.py:570-587 then
reduces to the heading recomputation, which is applied).
"""

from __future__ import annotations

from types import SimpleNamespace
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models import OBCASpec, build_obca_data, init_vars
from ..ops import geometry
from ..scenarios.build import Scenario, ShapeSpec
from ..scenarios.demos import MPCParams
from ..solver import IPMOptions, make_obca_solver
from .multistart import candidate_inits_traced, make_multistart_solver
from .reference import (
    reinterpolate_openloop,
    splice_previous_plan,
    window_reference,
)

N_CAND_FREE = 2
N_CAND_FIX = 5


class LoopState(NamedTuple):
    x0: jnp.ndarray        # (3,)
    u0: jnp.ndarray        # (2,)
    Ts_cur: jnp.ndarray    # () mutated sampling time (src/closed_loop.py:587)
    Ts_opt: jnp.ndarray    # () last optimal step duration
    dyn_pos: jnp.ndarray   # (nD, 2)
    prev_plan: jnp.ndarray  # (3, N+1)
    k: jnp.ndarray         # () int32
    active: jnp.ndarray    # () bool — still replanning
    reached: jnp.ndarray   # () bool
    failed: jnp.ndarray    # () bool — aborted on infeasibility


def make_scan_rollout(shape: ShapeSpec, p: MPCParams = MPCParams(),
                      max_steps: int = 30,
                      options: IPMOptions | None = None,
                      dtype=jnp.float32,
                      qr_rescue: bool = True):
    """Build ``rollout(scn, ref_path, ref_len) -> (final_state, traj)``.

    ref_path: (3, L) reference (padding: repeat the last column);
    ref_len: () number of valid columns. jit/vmap/pjit the result freely.

    Note on dual warm starts: shift-warm-starting each replan's
    window/shifted-prev candidates from the previous step's converged
    OBCA multipliers (multistart ``warm=``, exercised by
    tests/test_multistart.py) was measured wall-time NEUTRAL on the
    production ladder in rounds 4 AND 5 (scripts/exp_r5_feas.py
    ``bench`` vs ``warm``: 129.0 vs 129.1 steps/s at feasibility
    1.0000; iteration p90 58 -> 52) — the batch wall time is set by
    the rescue lanes, whose brake/dodge candidates have no warm-
    startable predecessor. The loop therefore does not carry previous
    duals (smaller carry + compiled program, which also helps remote-
    worker stability); the ``warm=`` plumbing remains for callers
    with a measured win.
    """
    if p.N_free != p.N_fix:
        raise NotImplementedError("scanned loop requires N_fix == N_free")
    N = p.N_free
    # Default options MUST match ClosedLoopRunner's (closed_loop.py:109):
    # with looser tol/feas_tol + max_iters=60 the fix-time solve on demo1's
    # first near-contact step stalls below feasibility and the rollout
    # aborted at k=8 while the host driver completed (round-1 regression).
    opt = options or IPMOptions(
        max_iters=100, acceptable_tol=5e-3, feas_tol=1e-4
    )

    spec_free = OBCASpec(N=N, n_obs=shape.n_obs, e_max=shape.e_max, variant="free")
    spec_fixT = OBCASpec(N=N, n_obs=shape.n_obs, e_max=shape.e_max,
                         variant="fix_terminal")
    spec_fix8 = OBCASpec(N=N, n_obs=shape.n_obs, e_max=shape.e_max,
                         variant="fix_free_end")
    ms_free = make_multistart_solver(
        spec_free, make_obca_solver(spec_free, opt), init_vars, N_CAND_FREE)
    ms_fixT = make_multistart_solver(
        spec_fixT, make_obca_solver(spec_fixT, opt), init_vars, N_CAND_FIX)
    ms_fix8 = make_multistart_solver(
        spec_fix8, make_obca_solver(spec_fix8, opt), init_vars, N_CAND_FIX)
    # free-branch fallback solver (same ladder the host driver runs,
    # closed_loop.py free branch / src/closed_loop.py:393-398 semantics):
    # the free-time NLP can converge to a local infeasibility in the OBCA
    # dual equalities; the fixed-time no-terminal variant escapes it.
    ms_fb = make_multistart_solver(
        spec_fix8, make_obca_solver(spec_fix8, opt), init_vars, N_CAND_FREE)
    # QR rescue rungs (host driver parity, closed_loop.py:309-316 and
    # :361-373): Householder QR on the full saddle system survives the
    # degenerate-contact stalls where the AL-kernel path rejects every
    # regularization rung. Skip-gated — they iterate ONLY on lanes whose
    # whole preceding ladder failed, so a normal step pays zero trips.
    # Measured on the 1024-scenario random sweep: the pre-QR ladder
    # failed 3.6% of scenarios; with the rescue the first 64 re-run
    # scenarios failed 0. ``qr_rescue=False`` drops the rungs (smaller
    # compiled program — the remote-TPU worker is markedly less stable
    # executing the larger one).
    if qr_rescue:
        import dataclasses as _dc

        opt_qr = _dc.replace(opt, kkt="qr")
        ms_qrT = make_multistart_solver(
            spec_fixT, make_obca_solver(spec_fixT, opt_qr), init_vars,
            N_CAND_FIX)
        ms_qr8 = make_multistart_solver(
            spec_fix8, make_obca_solver(spec_fix8, opt_qr), init_vars,
            N_CAND_FIX)
        ms_qr_fb = make_multistart_solver(
            spec_fix8, make_obca_solver(spec_fix8, opt_qr), init_vars,
            N_CAND_FREE)

    def initial_state(scn: Scenario) -> LoopState:
        """Fresh per-scenario loop state (also the carry format between
        chunked dispatches — see ``rollout``'s ``st0``)."""
        return LoopState(
            x0=scn.start.astype(dtype),
            u0=jnp.zeros((2,), dtype),
            Ts_cur=jnp.asarray(p.Ts, dtype),
            Ts_opt=jnp.asarray(p.Ts, dtype),
            dyn_pos=scn.dyn_info[:, :2].astype(dtype),
            prev_plan=jnp.tile(scn.start.astype(dtype)[:, None], (1, N + 1)),
            k=jnp.asarray(0, jnp.int32),
            active=jnp.asarray(True),
            reached=jnp.asarray(False),
            failed=jnp.asarray(False),
        )

    def rollout(scn: Scenario, ref_path, ref_len, st0: LoopState | None = None):
        ref_path = jnp.asarray(ref_path, dtype)
        nD = scn.dyn_info.shape[0]
        spawn = scn.dyn_info[:, :2]

        # per-obstacle axis-aligned half extents for dodge boxes
        th_o = scn.dyn_info[:, 2]
        ex = jnp.abs(scn.dyn_info[:, 3] / 2 * jnp.cos(th_o)) + jnp.abs(
            scn.dyn_info[:, 4] / 2 * jnp.sin(th_o))
        ey = jnp.abs(scn.dyn_info[:, 3] / 2 * jnp.sin(th_o)) + jnp.abs(
            scn.dyn_info[:, 4] / 2 * jnp.cos(th_o))

        verts_spawn = jax.vmap(
            lambda r: geometry.rect_vertices(r[0], r[1], r[2], r[3], r[4])
        )(scn.dyn_info)[:, :4]  # (nD, 4, 2)

        def step(st: LoopState, _):
            warm = None  # see the docstring note on dual warm starts
            # 1. world update (src/closed_loop.py:445-486)
            started = st.k > scn.d_start_time
            dyn_pos = st.dyn_pos + jnp.where(
                (started & (scn.d_mask > 0))[:, None],
                st.Ts_opt * scn.d_vel, 0.0)
            appeared = (st.k >= scn.d_start_time) & (scn.d_mask > 0)

            # 2. lidar (src/closed_loop.py:591-630)
            front = st.x0[:2] + p.ego[0] * jnp.stack(
                [jnp.cos(st.x0[2]), jnp.sin(st.x0[2])])
            verts = verts_spawn + (dyn_pos - spawn)[:, None, :]
            dists = jnp.linalg.norm(verts - front[None, None, :], axis=-1)
            sensed = appeared & (jnp.min(dists, axis=-1) <= scn.sense_dis)
            fixtime = jnp.any(sensed) & (st.k > 0)

            # 3. free-time branch
            xref_free = window_reference(ref_path, ref_len, st.x0, N)
            data_free = build_obca_data(
                spec_free, scn, x0=st.x0, u0=st.u0, xref=xref_free,
                Ts=st.Ts_cur, q=p.q_free, r1=p.r1_free, r2=p.r2_free,
                v_max=p.v_max, w_max=p.w_max, a_max=p.a_max,
                alpha_max=p.alpha_max, ego=p.ego, dmin=p.dmin,
                time_c1=p.time_c1, time_c2=p.time_c2,
            )
            cands_f = candidate_inits_traced(
                xref_free, st.x0, prev_plan=st.prev_plan)[:N_CAND_FREE]
            # skip-gating (multistart.make_multistart_solver): a lane only
            # iterates the branch its mode actually uses — the unused
            # branch and un-triggered fallback rungs start `done` and
            # contribute zero to the vmapped while_loop trip count,
            # matching the host driver's Python-side ladder gating
            # (closed_loop.py:262-373).
            res_free0, _ = ms_free(data_free, cands_f, fixtime | ~st.active,
                                   warm)
            # free-branch mpc8 fallback (masked select — mirrors the host
            # driver's ladder, closed_loop.py:264-286): fixed-time
            # no-terminal solve at Ts_cur with the fix-branch weights.
            data_fb = build_obca_data(
                spec_fix8, scn, x0=st.x0, u0=st.u0, xref=xref_free,
                Ts=st.Ts_cur, q=p.q_fix, r1=p.r1_fix, r2=p.r2_fix,
                v_max=p.v_max, w_max=p.w_max, a_max=p.a_max,
                alpha_max=p.alpha_max, ego=p.ego, dmin=p.dmin,
            )
            res_fb, _ = ms_fb(data_fb, cands_f,
                              fixtime | ~st.active | res_free0.feas, warm)
            # QR rescue (host rung 3, closed_loop.py:309-316)
            if qr_rescue:
                res_fbq, _ = ms_qr_fb(
                    data_fb, cands_f,
                    fixtime | ~st.active | res_free0.feas | res_fb.feas,
                    warm)
            else:
                res_fbq = res_fb
            use_fbq = ~res_free0.feas & ~res_fb.feas
            use_fb = ~res_free0.feas
            mergef = lambda a, b, c: jnp.where(
                use_fbq, c, jnp.where(use_fb, b, a))
            res_free = SimpleNamespace(
                z={k: mergef(res_free0.z[k], res_fb.z[k], res_fbq.z[k])
                   for k in ("x", "u", "lam", "mu")},
                feas=mergef(res_free0.feas, res_fb.feas, res_fbq.feas),
            )
            Ts_opt_free = jnp.where(
                use_fb, st.Ts_cur, res_free0.z["T"] * st.Ts_cur)

            # 4. fix-time branch (src/closed_loop.py:360-398)
            xref_fix = window_reference(ref_path, ref_len, st.x0, N)
            xref_fix = splice_previous_plan(xref_fix, st.prev_plan, max(N - 5, 0))
            xref_fix, _ = reinterpolate_openloop(xref_fix, N, N)
            Ts_fix = st.Ts_opt  # N * Ts_opt / N — the rescale is identity
            x0_ext = jnp.concatenate([st.x0, jnp.zeros((1,), dtype)])
            tset = scn.ts_base + x0_ext[scn.ts_rel]
            sensed_f = sensed.astype(dtype)
            data_fix = build_obca_data(
                spec_fixT, scn, x0=st.x0, u0=st.u0, xref=xref_fix, Ts=Ts_fix,
                dyn_active=sensed_f, dyn_delta=dyn_pos - spawn,
                Ts_pred=Ts_fix, terminal_set=tset,
                q=p.q_fix, r1=p.r1_fix, r2=p.r2_fix,
                v_max=p.v_max, w_max=p.w_max, a_max=p.a_max,
                alpha_max=p.alpha_max, ego=p.ego, dmin=p.dmin,
            )
            ks = jnp.arange(N + 1, dtype=dtype)
            centers = dyn_pos[None] + ks[:, None, None] * Ts_fix * scn.d_vel[None]
            inf = jnp.asarray(jnp.inf, dtype)
            sm = sensed_f[None, :] > 0
            boxes = jnp.stack([
                jnp.min(jnp.where(sm, centers[..., 0] - ex[None], inf), axis=1),
                jnp.min(jnp.where(sm, centers[..., 1] - ey[None], inf), axis=1),
                jnp.max(jnp.where(sm, centers[..., 0] + ex[None], -inf), axis=1),
                jnp.max(jnp.where(sm, centers[..., 1] + ey[None], -inf), axis=1),
            ], axis=-1)
            cands_x = candidate_inits_traced(
                xref_fix, st.x0, dyn_boxes=boxes,
                y_bounds=(scn.x_lo[1], scn.x_hi[1]),
                prev_plan=st.prev_plan,
            )
            res_fixT, _ = ms_fixT(data_fix, cands_x, ~fixtime | ~st.active,
                                  warm)
            res_fix8, _ = ms_fix8(data_fix, cands_x,
                                  ~fixtime | ~st.active | res_fixT.feas,
                                  warm)
            # QR rescue rungs (host closed_loop.py:361-373: terminal-set
            # QR, then no-terminal QR), each gated on everything before
            lads = [res_fixT, res_fix8]
            if qr_rescue:
                feas_68 = res_fixT.feas | res_fix8.feas
                res_qT, _ = ms_qrT(data_fix, cands_x,
                                   ~fixtime | ~st.active | feas_68, warm)
                res_q8, _ = ms_qr8(
                    data_fix, cands_x,
                    ~fixtime | ~st.active | feas_68 | res_qT.feas, warm)
                lads += [res_qT, res_q8]
            # mpc6 -> mpc8 [-> QR] ladder (src/closed_loop.py:393-398 +
            # the QR rescue) as a masked select over the primal fields
            # (the variants differ in dual-row counts).
            feas_any = res_fixT.feas
            z_sel = {k: res_fixT.z[k] for k in ("x", "u", "lam", "mu")}
            for r in lads[1:]:
                use = ~feas_any
                z_sel = {k: jnp.where(use, r.z[k], z_sel[k])
                         for k in z_sel}
                feas_any = feas_any | r.feas
            res_fix = SimpleNamespace(z=z_sel, feas=feas_any)

            # 5. mode selection + plant step (src/closed_loop.py:400-429)
            sel = fixtime
            pick = lambda a, b: jnp.where(sel, a, b)
            x_plan = pick(res_fix.z["x"], res_free.z["x"])
            u_plan = pick(res_fix.z["u"], res_free.z["u"])
            feas = pick(res_fix.feas, res_free.feas)
            Ts_opt_new = pick(Ts_fix, Ts_opt_free)
            Ts_cur_new = pick(Ts_fix, st.Ts_cur)

            ok = st.active & feas
            x0_new = jnp.where(ok, x_plan[:, 1], st.x0).astype(dtype)
            u0_new = jnp.where(ok, u_plan[:, 0], st.u0).astype(dtype)
            prev_new = jnp.where(ok, x_plan, st.prev_plan).astype(dtype)
            reached = ((x0_new[0] - scn.goal[0]) ** 2
                       + (x0_new[1] - scn.goal[1]) ** 2) < 0.1
            failed = st.failed | (st.active & ~feas)
            active_new = st.active & feas & ~reached

            new = LoopState(
                x0=x0_new,
                u0=u0_new,
                Ts_cur=jnp.where(ok, Ts_cur_new, st.Ts_cur).astype(dtype),
                Ts_opt=jnp.where(ok, Ts_opt_new, st.Ts_opt).astype(dtype),
                dyn_pos=jnp.where(st.active, dyn_pos, st.dyn_pos),
                prev_plan=prev_new,
                k=st.k + st.active.astype(jnp.int32),
                active=active_new,
                reached=st.reached | (st.active & reached),
                failed=failed,
            )
            out = {
                "x": x0_new, "u": u0_new, "Ts_opt": new.Ts_opt,
                "fixtime": sel & st.active, "feas": feas,
                "active": st.active, "plan": x_plan,
            }
            return new, out

        if st0 is None:
            st0 = initial_state(scn)
        final, traj = jax.lax.scan(step, st0, None, length=max_steps)
        return final, traj

    # State-carrying entry for chunked dispatch: running a long rollout as
    # several short ``rollout(..., st0=prev_final)`` executions is exactly
    # equivalent to one long scan (the carry is the full loop state), and
    # keeps each device execution short — the remote-TPU worker
    # deterministically crashes on single executions past roughly a
    # minute (round-5 diagnosis, see bench_sweep.py docstring).
    rollout.initial_state = initial_state
    return rollout
