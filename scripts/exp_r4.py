"""Round-4 experiment campaign: make the fix-time production step fast.

BENCH_r03 showed the fix-time mpc6+mpc8 ladder at 40.4 steps/s with an
iteration tail slamming the cap (median 41, p90 = max = 100) and every
step paying all 10 NLPs (5-candidate mpc6 AND mpc8) unconditionally.

MEASURED CONCLUSIONS (TPU v5e behind the remote tunnel, B=256, real
replan population; full logs in the round-4 work notes):

  * Skip-gating mpc8 alone (B): 40.2 steps/s — no wall gain. The
    vmapped while_loop's trip count is the batch MAX, and that was
    pinned by locally-infeasible lanes burning the cap.
  * Naive stall cut + free-family knobs (C-F): up to 77.5 steps/s but
    ladder feasibility drops to 0.957-0.992 — cutting slow-but-
    converging lanes loses solutions. NOT shippable.
  * Viol-gated stall (G-K): feasibility restored to 1.0000 everywhere,
    but the protected slow lanes re-pin the trip count (40-45 steps/s).
  * ASYMMETRIC ladder (L-O, the shipped design): mpc6 — which has the
    mpc8 rung behind it — stalls aggressively (stall_iters=10, no viol
    gate, relative-progress counting); mpc8 — the last rung — keeps
    the protective gate. 65 steps/s at feasibility 1.0000.
  * Shift-warm-started duals from the previous step (P-R): iteration
    medians drop 23 -> 20 but wall time is unchanged — the tail lanes
    that set the trip count are brake/dodge candidates, not the warm-
    started window/shift ones. Warming ALL candidates (S) flips basins
    and loses 2/256 lanes. Neutral; not shipped in the bench config.
  * mpc8 polish-start from mpc6's full iterate (U/V, z_override):
    trims the tail (max 117 -> 92-107) at feasibility 1.0000; shipped.
  * KKT factorization at reduced MXU precision (W/X,
    kkt_matmul_precision='high' with 1-2 refinement passes): feasibility
    collapses to 0.79-0.82 and median iterations triple — the bf16x3
    Cholesky of near-contact systems produces steps the curvature test
    rejects; refinement cannot rescue a rejected factorization. The
    ladder stays at 'highest'.
  * Compaction re-measured honestly (exp_r4_compact.py): 16.4 steps/s
    — 3.5x less wasted work but ~10 dispatches/run at ~1.5 s per
    dispatch over the tunnel. Monolithic stays. On-chip the useful
    work is ~0.5 s/batch (22k lane-iters x ~21 us) => compaction is
    the first thing to revisit on local hardware.
  * exp_r4_trip.py: per-lane-iteration cost is 20-24 us FLAT across
    batch 256-2560 — the body is throughput-bound, and the remaining
    gap to the ~120 steps/s target is per-iteration op cost (the
    11.8k-line HLO body), not trip count. jax.block_until_ready does
    NOT reliably block on the remote backend; all timing here is
    fetch-based.

Config matrix (cumulative):
  A  r3 baseline             (n_deltas=2 + option defaults, ungated mpc8)
  B  + skip-gated mpc8       (runs only on mpc6-infeasible lanes)
  C  + stall_iters           (divergence cut: locally-infeasible NLPs
                              stop iterating instead of burning the cap)
  D  + acceptable_iter=1     (stop at the first acceptable iterate)
  E  + n_refine=1, n_backtracks=8  (the free-family tuning)
  F  + n_deltas=1            (single regularization rung)
  G-K  viol-gated stall variants
  L-O  asymmetric ladder (aggressive mpc6 / protected mpc8)
  P-T  warm-started duals variants
  U-V  mpc8 polish-start from mpc6's iterate

Quality gates printed per config: ladder feasibility fraction (must stay
1.000), viol p99, per-lane iteration quantiles.

Usage:  JAX_PLATFORMS=cpu,axon python scripts/exp_r4.py [configs]
        (configs default "ABCDEF"; e.g. `... exp_r4.py CE` runs two)
Env: EXP_BATCH (256), EXP_REPS (3), EXP_STALL (20).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, flush=True)


def main():
    import jax

    _plat_tag = "axon" if "axon" in os.environ.get("JAX_PLATFORMS", "") else "cpu"
    jax.config.update("jax_compilation_cache_dir",
                      f"/root/.cache/jax_comp_{_plat_tag}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if "axon" in os.environ.get("JAX_PLATFORMS", ""):
        jax.config.update("jax_platforms", "cpu,axon")
        accel = "axon"
    else:
        jax.config.update("jax_platforms", "cpu")
        accel = None
    import jax.numpy as jnp
    import numpy as np

    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.models import (
        OBCASpec, build_obca_data, init_vars,
    )
    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.runtime.multistart import (
        candidate_inits_traced, make_multistart_solver,
    )
    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.scenarios import (
        build_scenario, get_demo,
    )
    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.solver import (
        IPMOptions, make_obca_solver,
    )

    B = int(os.environ.get("EXP_BATCH", "256"))
    reps = int(os.environ.get("EXP_REPS", "3"))
    stall = int(os.environ.get("EXP_STALL", "20"))
    which = (sys.argv[1] if len(sys.argv) > 1 else "ABCDEF").upper()
    dev = (jax.devices(accel) if accel else jax.devices())[0]
    dtype = jnp.float32
    log(f"device: {dev}  batch={B} reps={reps} stall={stall} configs={which}")

    # ---- fix-step population (identical to bench.py's fix stage) --------
    fx = np.load(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "..", "goldens", "bench_fix_fixture.npz"))
    n_rows = fx["x0"].shape[0]
    Nf = fx["xref"].shape[-1] - 1
    fix_demos = sorted(set(fx["demo"].tolist()))
    scns = {}
    shape1 = None
    for nm in fix_demos:
        scns[nm], shape1 = build_scenario(get_demo(nm), shape1, dtype=dtype)
    scn_rows = jax.tree.map(lambda *xs: jnp.stack(xs),
                            *[scns[nm] for nm in fx["demo"].tolist()])
    p1 = get_demo(fix_demos[0]).params
    spec_fix = OBCASpec(N=Nf, n_obs=shape1.n_obs, e_max=shape1.e_max,
                        variant="fix_terminal")
    spec_fix8 = OBCASpec(N=Nf, n_obs=shape1.n_obs, e_max=shape1.e_max,
                         variant="fix_free_end")
    lane_rows = np.arange(B) % n_rows
    take = lambda a: jnp.asarray(np.asarray(a)[lane_rows], dtype)
    scn_l = jax.tree.map(lambda a: a[jnp.asarray(lane_rows)], scn_rows)

    def build_fix(scn1, x0, u0, xref, Ts, tset, delta, sensed):
        data = build_obca_data(
            spec_fix, scn1, x0=x0, u0=u0, xref=xref,
            Ts=Ts, dyn_active=sensed, dyn_delta=delta,
            Ts_pred=Ts, terminal_set=tset,
            q=p1.q_fix, r1=p1.r1_fix, r2=p1.r2_fix,
            v_max=p1.v_max, w_max=p1.w_max, a_max=p1.a_max,
            alpha_max=p1.alpha_max, ego=p1.ego, dmin=p1.dmin,
        )
        th_o = scn1.dyn_info[:, 2]
        ex1 = jnp.abs(scn1.dyn_info[:, 3] / 2 * jnp.cos(th_o)) + jnp.abs(
            scn1.dyn_info[:, 4] / 2 * jnp.sin(th_o))
        ey1 = jnp.abs(scn1.dyn_info[:, 3] / 2 * jnp.sin(th_o)) + jnp.abs(
            scn1.dyn_info[:, 4] / 2 * jnp.cos(th_o))
        ks = jnp.arange(Nf + 1, dtype=dtype)
        centers = (scn1.dyn_info[None, :, :2] + delta[None]
                   + ks[:, None, None] * Ts * scn1.d_vel[None])
        sm = sensed[None, :] > 0
        inf = jnp.asarray(jnp.inf, dtype)
        boxes = jnp.stack([
            jnp.min(jnp.where(sm, centers[..., 0] - ex1[None], inf), axis=1),
            jnp.min(jnp.where(sm, centers[..., 1] - ey1[None], inf), axis=1),
            jnp.max(jnp.where(sm, centers[..., 0] + ex1[None], -inf), axis=1),
            jnp.max(jnp.where(sm, centers[..., 1] + ey1[None], -inf), axis=1),
        ], axis=-1)
        cands = candidate_inits_traced(
            xref, x0, dyn_boxes=boxes,
            y_bounds=(scn1.x_lo[1], scn1.x_hi[1]))
        return data, cands

    datafix, candsfix = jax.jit(jax.vmap(build_fix))(
        scn_l, take(fx["x0"]), take(fx["u0"]), take(fx["xref"]),
        take(fx["Ts"]), take(fx["terminal_set"]), take(fx["dyn_delta"]),
        take(fx["sensed"]))
    datafix = jax.device_put(datafix, dev)
    candsfix = jax.device_put(candsfix, dev)

    base_kw = dict(max_iters=100, tol=1e-4, acceptable_tol=5e-3,
                   feas_tol=1e-3, n_deltas=2)
    CONFIGS = {
        "A": (dict(base_kw), False),
        "B": (dict(base_kw), True),
        "C": (dict(base_kw, stall_iters=stall), True),
        "D": (dict(base_kw, stall_iters=stall, acceptable_iter=1), True),
        "E": (dict(base_kw, stall_iters=stall, acceptable_iter=1,
                   n_refine=1, n_backtracks=8), True),
        "F": (dict(base_kw, stall_iters=stall, acceptable_iter=1,
                   n_refine=1, n_backtracks=8, n_deltas=1), True),
        # round 2 of the sweep: the stall cut is now viol-gated (ipm.py —
        # only materially-infeasible lanes are cut), so re-measure the
        # ladder with it plus the individually-suspect knobs
        "G": (dict(base_kw, stall_iters=stall), True),
        "H": (dict(base_kw, stall_iters=stall, acceptable_iter=1), True),
        "I": (dict(base_kw, stall_iters=stall, acceptable_iter=1,
                   n_backtracks=8), True),
        "J": (dict(base_kw, stall_iters=12, acceptable_iter=1,
                   n_backtracks=8), True),
        "K": (dict(base_kw, stall_iters=stall, acceptable_iter=1,
                   n_backtracks=8, n_refine=1), True),
    }
    # round 3: asymmetric ladder — mpc6 (has the mpc8 rung behind it)
    # stalls aggressively (no viol gate: a cut lane is rescued), mpc8
    # (last rung) keeps the protective gate. Config value becomes
    # (kw6, kw8, gated).
    fast6 = dict(base_kw, stall_iters=stall, stall_viol_gate=False,
                 acceptable_iter=1, n_backtracks=8)
    safe8 = dict(base_kw, stall_iters=stall, acceptable_iter=1,
                 n_backtracks=8)
    CONFIGS.update({
        "L": (fast6, safe8, True),
        "M": (dict(fast6, n_refine=1), dict(safe8, n_refine=1), True),
        "N": (dict(fast6, stall_iters=10), dict(safe8, n_refine=1), True),
        "O": (dict(fast6, n_refine=1, stall_iters=10),
              dict(safe8, n_refine=1), True),
    })
    # round 4: shift-warm-started duals from the recorded previous step
    # (fixture prev_lam/prev_mu) on the window + shifted-prev candidates
    WARM = {
        "P": (fast6, safe8, True),
        "Q": (dict(fast6, n_refine=1), dict(safe8, n_refine=1), True),
        "R": (dict(fast6, n_refine=1, stall_iters=10),
              dict(safe8, n_refine=1), True),
        # warm ALL candidates (the brake/dodge solves set the stage max
        # and PQR's (0,1)-only warm start left them cold)
        "S": (dict(fast6, n_refine=1, stall_iters=10),
              dict(safe8, n_refine=1), True),
        # + single regularization rung on the mpc6 stage only (ladder
        # cost ~ linear in n_deltas; the mpc8 rung keeps 2 for safety)
        "T": (dict(fast6, n_refine=1, stall_iters=10, n_deltas=1),
              dict(safe8, n_refine=1), True),
    }
    # round 5: mpc8 candidate 0 polish-starts from mpc6's full iterate
    # (z_override) — mpc8 = mpc6 minus the terminal rows, so the slow
    # brake-from-scratch solves (65-95 iterations, the stage-2 convoy
    # floor) become a few-iteration polish
    OVERRIDE = {
        "U": (dict(fast6, n_refine=1, stall_iters=10),
              dict(safe8, n_refine=1), True),
        # + tighter mpc8 stall for the leftover from-scratch candidates
        "V": (dict(fast6, n_refine=1, stall_iters=10),
              dict(safe8, n_refine=1, stall_iters=12), True),
        # round 6: KKT factorization at reduced MXU precision (the
        # refinement passes absorb the solve error; profile_parts shows
        # the factorization is ~70% of the iteration cost)
        "W": (dict(fast6, n_refine=1, stall_iters=10,
                   kkt_matmul_precision="high"),
              dict(safe8, n_refine=1, kkt_matmul_precision="high"), True),
        "X": (dict(fast6, n_refine=2, stall_iters=10,
                   kkt_matmul_precision="high"),
              dict(safe8, n_refine=2, kkt_matmul_precision="high"), True),
    }
    CONFIGS.update(OVERRIDE)
    CONFIGS.update(WARM)
    shift1 = lambda a: np.concatenate([a[:, 1:], a[:, -1:]], axis=1)
    warm_args = None
    if any(c in WARM for c in which):
        warm_args = (take(shift1(fx["prev_lam"])),
                     take(shift1(fx["prev_mu"])))

    for name in which:
        cfg = CONFIGS[name]
        if len(cfg) == 3:
            kw6, kw8, gated = cfg
        else:
            (kw6, gated), kw8 = cfg, cfg[0]
        kw = {"mpc6": kw6, "mpc8": kw8} if kw6 is not kw8 else kw6
        wa = warm_args if name in WARM else None
        wc = (0, 1, 2, 3, 4) if name in ("S", "T") else (0, 1)
        ms6 = make_multistart_solver(
            spec_fix, make_obca_solver(spec_fix, IPMOptions(**kw6)),
            init_vars, 5, warm_cands=wc)
        ms8 = make_multistart_solver(
            spec_fix8, make_obca_solver(spec_fix8, IPMOptions(**kw8)),
            init_vars, 5, warm_cands=wc)

        use_override = name in OVERRIDE

        if gated:
            def sol_fix(d, c, *w):
                r6 = ms6(d, c, None, w or None)[0]
                r8 = ms8(d, c, r6.feas, w or None,
                         dict(r6.z) if use_override else None)[0]
                use8 = ~r6.feas & r8.feas
                m = lambda a, b: jnp.where(use8, b, a)
                return r6._replace(
                    z=jax.tree.map(m, r6.z, r8.z),
                    viol=m(r6.viol, r8.viol), feas=r6.feas | r8.feas,
                    iters=r6.iters + r8.iters)
        else:
            def sol_fix(d, c, *w):
                r6 = ms6(d, c)[0]
                r8 = ms8(d, c)[0]
                return r6._replace(feas=r6.feas | r8.feas,
                                   iters=jnp.maximum(r6.iters, r8.iters))

        runner = jax.jit(jax.vmap(sol_fix), device=dev)
        run_args = (datafix, candsfix) + (wa if wa is not None else ())
        t0 = time.time()
        res = runner(*run_args)
        jax.block_until_ready(res.iters)
        log(f"[{name}] compile+first: {time.time() - t0:.1f} s")
        times = []
        for i in range(reps):
            # value-unique perturbation per (config, rep): the remote
            # backend memoizes repeated executions on identical values
            # ACROSS runs, which produced fake 0.000 s timings when a
            # config's inputs collided with an earlier sweep's
            eps = 1e-5 * (i + 1) + 1e-7 * (sum(map(ord, name)) % 97)
            cp = jax.device_put(jax.tree.map(
                lambda a: a * (1.0 + eps), candsfix), dev)
            t0 = time.time()
            res = runner(*((datafix, cp) + (wa if wa is not None else ())))
            jax.block_until_ready(res.iters)
            times.append(time.time() - t0)
        it = np.asarray(res.iters)
        feas = np.asarray(res.feas)
        viol = np.asarray(res.viol)
        t = min(times)
        log(f"[{name}] gated={gated} opts={kw}")
        log(f"[{name}] times: {[f'{x:.3f}' for x in times]} -> "
            f"{B / t:.1f} steps/s  feas={feas.mean():.4f}  "
            f"iters med/p90/max: {np.median(it):.0f}/"
            f"{np.percentile(it, 90):.0f}/{it.max()}  "
            f"viol p99: {np.percentile(viol[feas], 99):.2e}")


if __name__ == "__main__":
    main()
