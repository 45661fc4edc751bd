"""Benchmark: aggregate OBCA solve throughput on one chip.

Mirrors the reference's benchmark path ``simulation.calc_time``
(src/simulation.py:210-231): the free-time OBCA NLP on demo9 at horizon
N = 10, which the reference solves in 3.69 s per call on CPU via
CasADi+IPOPT (src/simulation.py:231 comment). Here the same problem
family (demo9 world, N = 10, free-time variant, windowed references at
B points along the A* path) is solved as a compacted batch (iteration
chunks + gather of unconverged lanes, solver/compact.py) so a lane pays
only its own iterations instead of the batch maximum; the metric is
aggregate solves/s.

Also measured: the *fix-time* variant (fixed Ts + moving sensed obstacle
+ terminal set — the actual closed-loop hot path, 23-30 of 30 steps on
most demos; reference ``obca_mpc6`` src/obca.py:1361-1562) and the
single-scenario replan latency at N = 5.

``vs_baseline`` = our per-solve rate / the reference's (1 / 3.69 s).
FLOP/MFU numbers are trip-count corrected: XLA's cost model counts a
``while_loop`` body once, so the body cost is scaled by the actually
dispatched lane-iterations reported by the compacted driver.

Roofline analysis (round 4, measured): the solver is neither MXU- nor
HBM-bound — per-lane-iteration cost is ~20-24 us FLAT from batch 256 to
2560 (scripts/exp_r4_trip.py), i.e. throughput scales linearly with
lanes, and the measured lane-iteration rate is ~0.1% of the
perfect-fusion HBM floor (state+data footprint ~40 KB/lane-iter vs
819 GB/s). The binding constraint is per-op overhead and inter-fusion
intermediate traffic across the ~12k-op iteration body (Jacobian
materialization alone is ~0.5 MB/lane-iter, 25x the footprint); the
next 10x therefore comes from collapsing the Newton body into a few
fused kernels (hand-written Jacobian assembly or a Pallas mega-kernel),
not from more iteration-count tuning — batch-max trips are already
within ~1.7x of the per-lane median after the round-4 asymmetric-stall
ladder.

Prints exactly ONE JSON line on stdout; diagnostics go to stderr.
Env overrides: BENCH_BATCH (256), BENCH_REPS (5), BENCH_ITERS (100),
BENCH_CHUNK (24), BENCH_MINBUCKET (B//4), BENCH_COMPACT (0 — see the
in-code note on remote-tunnel dispatch latency).
"""

import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    # Host-side problem building stays on CPU; the accelerator only sees
    # the batched solves (remote-TPU compiles are ~30 s per shape).
    # persistent compilation cache: the remote-TPU compiles are ~15 min
    # per process without it (verified hit: 980 s -> seconds)
    # cache dir is split per platform config: CPU executables compiled in
    # a cpu,axon process carry target flags (+prefer-no-scatter) that a
    # cpu-only process warns about loading (cpu_aot_loader E-spam that
    # can pollute the single-JSON-line stdout contract)
    _plat_tag = "axon" if "axon" in os.environ.get("JAX_PLATFORMS", "") else "cpu"
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     f"/root/.cache/jax_comp_{_plat_tag}"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    plats = os.environ.get("JAX_PLATFORMS", "")
    accel = None
    if "axon" in plats:
        jax.config.update("jax_platforms", "cpu,axon")
        accel = "axon"
    else:
        # sitecustomize preloads the axon backend regardless of later env
        # vars — override the already-imported config (conftest pattern)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.models import (
        OBCASpec,
        build_obca_data,
        init_vars,
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
        make_obca_solver,
    )
    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.solver.compact import (
        solve_compacted,
    )

    # 256 is the measured single-chip sweet spot for the tuned
    # free-time config (B=256 -> 541 solves/s vs B=512 -> 426; before
    # tuning the lower per-iteration cost favored 512)
    B = int(os.environ.get("BENCH_BATCH", "256"))
    # min over 5 reps: host-side contention adds 10-20% rep noise over
    # the remote tunnel (measured spread 0.37-0.47 s on identical work)
    reps = int(os.environ.get("BENCH_REPS", "5"))
    iters = int(os.environ.get("BENCH_ITERS", "100"))
    chunk = int(os.environ.get("BENCH_CHUNK", "24"))
    min_bucket = int(os.environ.get("BENCH_MINBUCKET", str(max(B // 4, 8))))
    # Default OFF under the remote-TPU tunnel: each extra executable
    # invocation there costs ~10-20 s regardless of compute (measured:
    # 3-call compacted run 35 s vs 1-call monolithic 0.75 s for the SAME
    # lane-iterations), so the compaction win (2.1x fewer lane-iters) is
    # drowned. On a local device the compacted driver is the faster path
    # (tests/test_compact.py proves bit-equivalence).
    compact = os.environ.get("BENCH_COMPACT", "0") == "1"
    N = 10
    BASELINE_S = 3.69  # reference per-solve wall time, src/simulation.py:231

    dev = (jax.devices(accel) if accel else jax.devices())[0]
    log(f"device: {dev}  batch={B} reps={reps} iters={iters} "
        f"compact={compact} chunk={chunk} min_bucket={min_bucket}")

    dtype = jnp.float32
    demo = get_demo("demo9")
    scn, shape = build_scenario(demo, dtype=dtype)
    spec = OBCASpec(N=N, n_obs=shape.n_obs, e_max=shape.e_max,
                    variant="free")
    ref = astar_host.reference_path_for(
        np.asarray(scn.grid), demo.start, demo.goal
    )
    L = ref.shape[1]
    refj = jnp.asarray(ref, dtype)

    # B replan problems: x0 at deterministic points along the A* path
    rng = np.random.RandomState(0)
    starts = np.sort(rng.randint(0, L - 2, size=B))
    x0s = jnp.asarray(ref[:, starts], dtype).T            # (B, 3)

    def build_one(x0):
        xref = window_reference(refj, L, x0, N)
        data = build_obca_data(spec, scn, x0=x0, u0=jnp.zeros(2, dtype),
                               xref=xref, Ts=0.1)
        return data, init_vars(spec, data)

    datab, z0b = jax.jit(jax.vmap(build_one))(x0s)

    # float32-appropriate tolerances (the closed-loop scan uses the same):
    # scaled-KKT 1e-6 is below f32 resolution for this problem size and
    # just burns the full iteration budget on already-solved instances.
    # Free-time-family tuning (all measured at feasible fraction 1.000,
    # B=256 knob sweep): n_deltas=1 — the ladder is never needed;
    # n_refine=1 — one refinement pass suffices at delta_d_al=1e-3 and
    # is the single biggest lever (337 -> 495 solves/s, and the
    # iteration tail shrinks 66 -> 43); n_backtracks=8 — free solves
    # never backtrack past 2^-7 (495 -> 541). matmul_precision stays
    # 'highest': 'high' (bf16x3) stalls convergence outright
    # (feas 0.70, median iters 92).
    # acceptable_iter=1: stop at the first acceptable-level iterate
    # (scaled KKT <= 5e-3 AND unscaled viol <= 1e-2) instead of
    # demanding 5 consecutive ones — the extra confirmation iterations
    # were ~20% of all lane-iterations (521 -> 566 -> 614 -> 688
    # solves/s at acceptable_iter 5/3/2/1), and solution quality is
    # unchanged at this problem family (viol p99 3.9e-4, feasible
    # fraction 1.000).
    opt = IPMOptions(
        max_iters=iters, tol=1e-4, acceptable_tol=5e-3, feas_tol=1e-3,
        n_deltas=1, n_refine=1, n_backtracks=8, acceptable_iter=1,
    )
    solve = make_obca_solver(spec, opt)

    datab = jax.device_put(datab, dev)
    z0b = jax.device_put(z0b, dev)

    def run_throughput(data_in, z0_in, sol, label):
        """Compile + warm, then timed reps. Returns (t, res, stats)."""
        if compact and hasattr(sol, "init"):
            # bare-closure solvers (the mpc6+mpc8 ladder) lack the
            # chunked .init/.iterate/.finalize API — they always take
            # the monolithic vmap path below
            runner = lambda z: solve_compacted(
                sol, data_in, z, chunk=chunk, min_bucket=min_bucket,
                max_iters=iters, device=dev)
        else:
            vsolve = jax.jit(jax.vmap(sol), device=dev)

            def runner(z):
                r = vsolve(data_in, z)
                it = np.asarray(r.iters)
                return r, {"dispatched_lane_iters": int(it.max()) * B,
                           "lane_iters": int(it.sum()), "calls": 1}

        t0 = time.time()
        res, stats = runner(z0_in)
        _ = float(np.asarray(res.iters).sum())
        log(f"[{label}] compile+first: {time.time() - t0:.1f} s  "
            f"stats={stats}")
        it = np.asarray(res.iters)
        feas_frac = float(np.mean(np.asarray(res.feas)))
        log(f"[{label}] feasible fraction: {feas_frac:.3f}  median iters: "
            f"{np.median(it):.0f}  p90: {np.percentile(it, 90):.0f}  "
            f"max: {it.max()}  convoy-free work: "
            f"{stats['lane_iters']}/{stats['dispatched_lane_iters']} "
            f"lane-iters dispatched")
        times = []
        for i in range(reps):
            # perturb the start so no two timed calls are identical (the
            # remote backend memoizes repeated pure executions)
            zp = jax.device_put(jax.tree.map(
                lambda a: a * (1.0 + 1e-5 * (i + 1)), z0_in), dev)
            t0 = time.time()
            res, stats = runner(zp)
            _ = float(np.asarray(res.iters).sum())
            times.append(time.time() - t0)
        t = min(times)
        log(f"[{label}] times: {[f'{x:.3f}' for x in times]} "
            f"-> {B / t:.1f} solves/s")
        return t, res, stats, feas_frac

    t, res, stats, feas_frac = run_throughput(datab, z0b, solve, "free N=10")

    solves_per_s = B / t

    # ---- trip-count-corrected FLOP / MFU accounting ----------------------
    # cost_analysis on the chunked iterate counts its while_loop body ~once;
    # scale by the dispatched lane-iterations the driver actually ran.
    flops_per_lane_iter = None
    try:
        st0 = jax.jit(jax.vmap(solve.init), device=dev)(datab, z0b)
        viter = jax.jit(jax.vmap(solve.iterate, in_axes=(0, 0, None)),
                        device=dev)
        compiled_iter = viter.lower(st0, datab, 1).compile()
        ca = compiled_iter.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        body_flops = float(ca.get("flops", 0.0))
        if body_flops > 0:
            flops_per_lane_iter = body_flops / B
            log(f"one-iteration flops/lane: {flops_per_lane_iter/1e6:.2f} M")
    except Exception as e:  # cost model unavailable over the tunnel
        log(f"cost_analysis unavailable: {e}")
    # HLO op count of the one-iteration Newton body (round-5 verdict #1:
    # the round-4 binding constraint was the ~11.8k-op AD body; the
    # analytic fused assembly, models/obca_struct.py, collapses it —
    # scripts/exp_r5_opcount.py measures 955 ops. Counted live here when
    # the backend exposes the optimized module text.)
    hlo_body_ops = None
    try:
        txt = compiled_iter.as_text()
        hlo_body_ops = sum(
            1 for line in txt.splitlines()
            if "=" in (ls := line.strip())
            and not ls.startswith(("HloModule", "ENTRY", "%", "}",
                                   "ROOT tuple")))
        log(f"one-iteration HLO ops: {hlo_body_ops}")
    except Exception as e:
        log(f"HLO text unavailable: {e}")

    extra = {}
    if flops_per_lane_iter is not None:
        total_flops = flops_per_lane_iter * stats["dispatched_lane_iters"]
        extra = {
            "gflops_per_batch": round(total_flops / 1e9, 2),
            # v5e bf16 MXU peak 197 TFLOP/s; f32 'highest' emulation pays
            # ~6 bf16 passes per f32 matmul (not counted by the cost
            # model, so true MXU occupancy is higher than this number)
            "mfu_vs_bf16_peak": round(total_flops / t / 197e12, 5),
            "dispatched_lane_iters": stats["dispatched_lane_iters"],
            "useful_lane_iters": stats["lane_iters"],
        }
    # ---- HBM roofline (round-4 verdict #9): the solver is bandwidth/
    # op-overhead-bound (tiny matrices, MFU < 1%), so the honest ceiling
    # is bytes, not FLOPs. XLA's cost-model "bytes accessed" overcounts
    # by >100x (it sums every op's operand bytes, intra-fusion included
    # — it reported 62 MB/lane-iter and a "roofline" the measured rate
    # exceeded). The defensible floor is the ITERATION FOOTPRINT: a
    # perfectly-fused body must still read the solver state + problem
    # data and write the state back once per iteration.
    try:
        lane_state_b = sum(np.asarray(l).nbytes
                           for l in jax.tree.leaves(st0)) / B
        lane_data_b = sum(np.asarray(l).nbytes
                          for l in jax.tree.leaves(datab)) / B
        min_bytes = 2 * lane_state_b + lane_data_b  # per lane-iteration
        HBM_BW = 819e9  # v5e HBM ~819 GB/s
        lane_iters_ceiling = HBM_BW / min_bytes
        trips = stats["dispatched_lane_iters"] / B
        measured_lane_iters_per_s = stats["dispatched_lane_iters"] / t
        extra.update({
            "lane_iter_footprint_bytes": int(min_bytes),
            "lane_iters_per_s_measured": round(measured_lane_iters_per_s),
            "lane_iters_per_s_hbm_floor_bound": round(lane_iters_ceiling),
            # fraction of the perfect-fusion HBM bound achieved: the
            # remaining gap is per-op overhead + intermediate traffic
            # the ~12k-op iteration body spills between fusions
            "pct_of_hbm_floor_bound": round(
                100.0 * measured_lane_iters_per_s / lane_iters_ceiling, 2),
            "while_trips_per_batch": round(trips, 1),
        })
    except Exception as e:
        log(f"roofline accounting unavailable: {e}")

    # ---- fix-time replan step (the closed-loop hot path) -----------------
    # The batch is the REAL replan population: every feasible fix-time
    # step recorded from host closed-loop runs of the corridor demos
    # (goldens/bench_fix_fixture.npz, scripts/make_bench_fixture.py),
    # tiled to B lanes. Synthetic pose x obstacle-phase grids used
    # before round 3 produced physically-doomed sandwich configurations
    # the loop never visits and a meaningless feasible fraction.
    # Reference hot loop: obca_mpc6 + the mpc8 fallback,
    # src/obca.py:1361-1562 + src/closed_loop.py:393-398.
    fx = np.load(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "goldens", "bench_fix_fixture.npz"))
    n_rows = fx["x0"].shape[0]
    Nf = fx["xref"].shape[-1] - 1
    fix_demos = sorted(set(fx["demo"].tolist()))
    scns = {}
    shape1 = None
    for nm in fix_demos:
        scns[nm], shape1 = build_scenario(get_demo(nm), shape1,
                                          dtype=dtype)
    scn_rows = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[scns[nm] for nm in fx["demo"].tolist()])
    p1 = get_demo(fix_demos[0]).params
    spec_fix = OBCASpec(N=Nf, n_obs=shape1.n_obs, e_max=shape1.e_max,
                        variant="fix_terminal")
    lane_rows = np.arange(B) % n_rows
    take = lambda a: jnp.asarray(np.asarray(a)[lane_rows], dtype)
    scn_l = jax.tree.map(lambda a: a[jnp.asarray(lane_rows)], scn_rows)

    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.runtime.multistart import (
        candidate_inits_traced,
        make_multistart_solver,
    )

    def build_fix(scn1, x0, u0, xref, Ts, tset, delta, sensed):
        data = build_obca_data(
            spec_fix, scn1, x0=x0, u0=u0, xref=xref,
            Ts=Ts, dyn_active=sensed, dyn_delta=delta,
            Ts_pred=Ts, terminal_set=tset,
            q=p1.q_fix, r1=p1.r1_fix, r2=p1.r2_fix,
            v_max=p1.v_max, w_max=p1.w_max, a_max=p1.a_max,
            alpha_max=p1.alpha_max, ego=p1.ego, dmin=p1.dmin,
        )
        # dodge boxes of the predicted obstacle positions — the same
        # multistart geometry the production step uses (scan_loop.py)
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
    # One "solve" = the full PRODUCTION fix-time step, exactly what the
    # scan loop runs every fix step: a 5-candidate multistart (window /
    # shifted-prev / brake / dodge-below / dodge-above) of the terminal-
    # set NLP (obca_mpc6) AND of its no-terminal fallback (obca_mpc8,
    # src/closed_loop.py:393-398), masked-selected. The terminal-set NLP
    # alone is legitimately infeasible on crossing-phase poses — that is
    # WHY the reference carries the mpc8 rung (goldens: demo3 needs 12
    # fallbacks in 27 fix steps) — so ladder feasibility is the
    # product-level number. Robust two-rung delta ladder + 2 refinement
    # passes: near-contact solves need them (IPMOptions.n_deltas).
    # Asymmetric ladder tuning (scripts/exp_r4.py knob sweep, configs
    # R/U/V — every step measured at ladder feasibility 1.0000):
    # mpc6 — the rung with a fallback behind it — stalls aggressively
    # (stall_iters=10, no viol gate: a cut lane is rescued by mpc8),
    # stops at the first acceptable iterate, single refinement pass;
    # mpc8 — the last rung — keeps the protective viol-gated stall.
    opt_fix6 = IPMOptions(max_iters=iters, tol=1e-4, acceptable_tol=5e-3,
                          feas_tol=1e-3, n_deltas=2, stall_iters=10,
                          stall_viol_gate=False, acceptable_iter=1,
                          n_backtracks=8, n_refine=1)
    # n_refine=2 on the LAST rung: after the round-5 fused/recursive-
    # inverse numerics, two fixture rows (76, 78) stall at KKT ~6e-3
    # with one refinement pass; the second pass restores ladder
    # feasibility 1.0000 at 129 steps/s (scripts/exp_r5_feas.py matrix:
    # nr8=1 -> 0.9844 @ 137, nr8=2 -> 1.0000 @ 129, nd8=3 -> 0.9922).
    opt_fix8 = IPMOptions(max_iters=iters, tol=1e-4, acceptable_tol=5e-3,
                          feas_tol=1e-3, n_deltas=2, stall_iters=20,
                          acceptable_iter=1, n_backtracks=8, n_refine=2)
    spec_fix8 = OBCASpec(N=Nf, n_obs=shape1.n_obs, e_max=shape1.e_max,
                         variant="fix_free_end")
    ms_fix = make_multistart_solver(
        spec_fix, make_obca_solver(spec_fix, opt_fix6), init_vars, 5)
    ms_fix8 = make_multistart_solver(
        spec_fix8, make_obca_solver(spec_fix8, opt_fix8), init_vars, 5)

    def sol_fix(d, c):
        # mpc8 runs ONLY on mpc6-infeasible lanes (skip-gating: a skipped
        # lane starts `done` and adds zero to the while_loop trip count)
        # — the host driver's Python-side ladder, closed_loop.py:355-360 —
        # and its candidate 0 polish-starts from mpc6's full iterate
        # (z_override: same NLP minus the terminal rows).
        r6 = ms_fix(d, c)[0]
        r8 = ms_fix8(d, c, r6.feas, None, dict(r6.z))[0]
        use8 = ~r6.feas & r8.feas
        m = lambda a, b: jnp.where(use8, b, a)
        return r6._replace(
            z=jax.tree.map(m, r6.z, r8.z),
            f=m(r6.f, r8.f), viol=m(r6.viol, r8.viol),
            kkt_err=m(r6.kkt_err, r8.kkt_err),
            feas=r6.feas | r8.feas,
            iters=r6.iters + r8.iters,  # true serial work of the ladder
        )

    datafix = jax.device_put(datafix, dev)
    candsfix = jax.device_put(candsfix, dev)
    t_fix, res_fix, stats_fix, feas_fix = run_throughput(
        datafix, candsfix, sol_fix, "fix step (mpc6+mpc8 ladder, 5-cand)")

    # ---- closed-loop replan latency at N = 5 (BASELINE.json metric #2) ---
    # One replan = one single-scenario jitted OBCA solve from a mid-path
    # pose, demo9 world — the per-step latency a closed loop pays
    # (reference: one serial IPOPT call, ~0.1-1 s,
    # src/closed_loop.py:380-398). Measured per-call (dispatch included),
    # quantiles via utils.metrics.MetricsLogger.
    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.utils.metrics import (
        MetricsLogger,
    )

    # clamp: x0s only has B entries; JAX clamps OOB gathers, which would
    # silently re-measure the last scenario and skew the quantiles
    reps_lat = min(int(os.environ.get("BENCH_LAT_REPS", "30")), B)
    N5 = 5
    spec5 = OBCASpec(N=N5, n_obs=shape.n_obs, e_max=shape.e_max,
                     variant="free")
    lat = MetricsLogger()
    x05 = x0s[:reps_lat]
    xref5 = jax.vmap(lambda x0: window_reference(refj, L, x0, N5))(x05)
    data5 = jax.jit(jax.vmap(
        lambda x0, xr: build_obca_data(spec5, scn, x0=x0,
                                       u0=jnp.zeros(2, dtype),
                                       xref=xr, Ts=0.1)
    ))(x05, xref5)
    _solve5 = make_obca_solver(spec5, IPMOptions(
        max_iters=iters, tol=1e-4, acceptable_tol=5e-3, feas_tol=1e-3,
        n_deltas=1, n_refine=1, n_backtracks=8, acceptable_iter=1,
    ))
    # z0 construction happens IN-GRAPH (solve's z0=None path): the
    # host-side eager init_vars per rep was ~100 ms of pure CPU op
    # dispatch that polluted the latency quantiles
    solve5 = jax.jit(lambda d: _solve5(d), device=dev)
    one = lambda i: jax.tree.map(lambda a: a[i], data5)
    d0 = jax.device_put(one(0), dev)
    t0 = time.time()
    r = solve5(d0)
    _ = float(np.asarray(r.iters))
    log(f"replan N=5 compile+first: {time.time() - t0:.1f} s")
    feas5 = 0
    for i in range(reps_lat):
        di = jax.device_put(one(i), dev)
        with lat.timer("replan_ms"):
            r = solve5(di)
            feas5 += int(np.asarray(r.feas))  # blocks on completion
        lat.bump("replans")
    q = lat.quantiles("replan_ms")
    log(f"replan N=5 latency: p50 {q['p50']:.1f} ms  p90 {q['p90']:.1f}  "
        f"p99 {q['p99']:.1f}  feas {feas5}/{reps_lat}")

    # ---- fix-time single-scenario replan latency -------------------------
    # The latency a real robot pays on the PRODUCTION step (23-30 of 30
    # closed-loop steps are fix-time): one recorded replan through the
    # gated mpc6 -> mpc8 ladder, single lane, host semantics (mpc8 only
    # when mpc6's multistart is infeasible — closed_loop.py:355-360).
    reps_fix = min(int(os.environ.get("BENCH_LAT_REPS", "30")), n_rows)
    one_fix = lambda i: (jax.tree.map(lambda a: a[i], datafix),
                         candsfix[i])
    # ONE jitted dispatch for the whole gated mpc6 -> mpc8 ladder
    # (round-5 verdict #6): the previous two-serial-dispatch form paid a
    # second full dispatch latency exactly on the miss lanes, tripling
    # p99 vs p50 (r4: 121.7 vs 38.7 ms). sol_fix runs mpc8 skip-gated
    # in-graph — a feasible mpc6 makes the mpc8 while_loop 0-trip.
    jlad = jax.jit(sol_fix, device=dev)
    d0f, c0f = one_fix(0)
    r = jlad(jax.device_put(d0f, dev), jax.device_put(c0f, dev))
    _ = float(np.asarray(r.iters))
    latf = MetricsLogger()
    feasf = 0
    for i in range(reps_fix):
        di, ci = one_fix(i)
        di = jax.device_put(di, dev)
        ci = jax.device_put(ci, dev)
        with latf.timer("replan_fix_ms"):
            r = jlad(di, ci)
            ok = bool(np.asarray(r.feas))  # fetch blocks (remote async)
        feasf += int(ok)
    qf = latf.quantiles("replan_fix_ms")
    log(f"replan fix N={Nf} latency: p50 {qf['p50']:.1f} ms  "
        f"p90 {qf['p90']:.1f}  p99 {qf['p99']:.1f}  "
        f"feas {feasf}/{reps_fix}")

    # ---- long-horizon open-loop solve at N = 74 --------------------------
    # The reference's headline benchmark: free-time OBCA over its demo9
    # A*-path-length horizon, 136.69 s on the author's CPU
    # (src/simulation.py:225-230, N_free = 74). Same problem here: goal-
    # only reference, 5-candidate multistart (runtime/open_loop.py
    # candidates), ONE timed call on the chip (compile excluded).
    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.runtime.multistart import (
        make_multistart_solver,
    )
    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.runtime.open_loop import (
        _resampled_astar_init,
    )
    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.runtime.reference import (
        start_goal_reference,
        start_goal_smooth_reference,
    )

    N74 = 74
    BASELINE_N74_S = 136.69
    p9 = demo.params
    spec74 = OBCASpec(N=N74, n_obs=shape.n_obs, e_max=shape.e_max,
                      variant="free")
    xref74 = start_goal_reference(scn.start, scn.goal, N74).astype(dtype)
    data74 = build_obca_data(
        spec74, scn, x0=scn.start, u0=jnp.zeros(2, dtype), xref=xref74,
        Ts=p9.Ts, q=p9.q_free, r1=p9.r1_free, r2=p9.r2_free,
        v_max=p9.v_max, w_max=p9.w_max, a_max=p9.a_max,
        alpha_max=p9.alpha_max, ego=p9.ego, dmin=p9.dmin,
        time_c1=p9.time_c1, time_c2=p9.time_c2,
    )
    cands74 = jnp.stack([
        xref74,
        start_goal_smooth_reference(scn.start, scn.goal, N74).astype(dtype),
        _resampled_astar_init(scn, demo, N74, dtype),
        _resampled_astar_init(scn, demo, N74, dtype, dilation=2,
                              align_start=True),
        _resampled_astar_init(scn, demo, N74, dtype, dilation=1,
                              align_start=True),
    ])
    ms74 = make_multistart_solver(
        spec74, make_obca_solver(spec74, IPMOptions(
            max_iters=200, tol=1e-4, acceptable_tol=5e-3, feas_tol=1e-3,
            n_deltas=2,
        )), init_vars, 5)
    ms74 = jax.jit(ms74, device=dev)
    data74 = jax.device_put(data74, dev)
    cands74 = jax.device_put(cands74, dev)
    t0 = time.time()
    r74, _ = ms74(data74, cands74)
    _ = float(np.asarray(r74.iters))
    log(f"open-loop N=74 compile+first: {time.time() - t0:.1f} s")
    t74s = []
    for i in range(3):
        c74p = jax.device_put(jax.tree.map(
            lambda a: a * (1.0 + 1e-6 * (i + 1)), cands74), dev)
        t0 = time.time()
        r74, _ = ms74(data74, c74p)
        _ = float(np.asarray(r74.iters))
        t74s.append(time.time() - t0)
    t74 = min(t74s)
    feas74 = bool(np.asarray(r74.feas))
    log(f"open-loop N=74: {[f'{x:.2f}' for x in t74s]} s  feas={feas74}  "
        f"iters={int(np.asarray(r74.iters))}  (reference: 136.69 s)")

    # ---- horizon scaling table (round-5 verdict #3) ----------------------
    # How solve cost scales with the MPC horizon N — the project's
    # "sequence length" axis (SURVEY.md section 5: the reference handles
    # long horizons by being slow). The problem family is EXACTLY the
    # reference's own N-sweep benchmark, simulation.calc_time
    # (src/simulation.py:225-231: open-loop free-time start->goal solves
    # at growing N_free; published anchors 3.69 s @ N=10 and 136.69 s
    # @ N=74): the same 5-candidate multistart open-loop solve the
    # N74 headline entry runs, at each N.
    REF_CALC_TIME = {10: 3.69, 74: 136.69}  # src/simulation.py:230-231
    horizon = {}
    if os.environ.get("BENCH_HORIZON", "1") == "1":
        for N_h in (6, 10, 20, 40, 74):
            spec_h = OBCASpec(N=N_h, n_obs=shape.n_obs, e_max=shape.e_max,
                              variant="free")
            xref_h = start_goal_reference(scn.start, scn.goal,
                                          N_h).astype(dtype)
            data_h = build_obca_data(
                spec_h, scn, x0=scn.start, u0=jnp.zeros(2, dtype),
                xref=xref_h, Ts=p9.Ts, q=p9.q_free, r1=p9.r1_free,
                r2=p9.r2_free, v_max=p9.v_max, w_max=p9.w_max,
                a_max=p9.a_max, alpha_max=p9.alpha_max, ego=p9.ego,
                dmin=p9.dmin, time_c1=p9.time_c1, time_c2=p9.time_c2)
            cands_h = jnp.stack([
                xref_h,
                start_goal_smooth_reference(scn.start, scn.goal,
                                            N_h).astype(dtype),
                _resampled_astar_init(scn, demo, N_h, dtype),
                _resampled_astar_init(scn, demo, N_h, dtype, dilation=2,
                                      align_start=True),
                _resampled_astar_init(scn, demo, N_h, dtype, dilation=1,
                                      align_start=True),
            ])
            ms_h = jax.jit(make_multistart_solver(
                spec_h, make_obca_solver(spec_h, IPMOptions(
                    max_iters=max(200, 4 * N_h), tol=1e-4,
                    acceptable_tol=5e-3, feas_tol=1e-3, n_deltas=2)),
                init_vars, 5), device=dev)
            data_h = jax.device_put(data_h, dev)
            cands_h = jax.device_put(cands_h, dev)
            t0 = time.time()
            r_h, _ = ms_h(data_h, cands_h)
            _ = float(np.asarray(r_h.iters))
            tc = time.time() - t0
            best = 1e9
            for i in range(3):
                c_p = jax.device_put(jax.tree.map(
                    lambda a: a * (1.0 + 1e-6 * (i + 1)), cands_h), dev)
                t0 = time.time()
                r_h, _ = ms_h(data_h, c_p)
                it_h = int(np.asarray(r_h.iters))
                best = min(best, time.time() - t0)
            feas_h = bool(np.asarray(r_h.feas))
            row = {
                "s_per_solve": round(best, 4),
                "solves_per_s": round(1.0 / best, 2),
                "iters": it_h,
                "feasible": feas_h,
            }
            if N_h * p9.Ts * p9.v_max * 2.0 < float(jnp.linalg.norm(
                    scn.goal[:2] - scn.start[:2])):
                # a horizon this short cannot span start->goal even at
                # v_max with the Topt<=~2 time-scale bound — the solve
                # (correctly) reports infeasible; the row still records
                # the full-effort solve cost at this N
                row["note"] = "horizon physically too short for start->goal"
            if N_h in REF_CALC_TIME:
                row["vs_reference"] = round(REF_CALC_TIME[N_h] / best, 1)
            horizon[str(N_h)] = row
            log(f"[horizon N={N_h}] {best:.3f} s/solve  feas {feas_h}  "
                f"iters {it_h}"
                + (f"  ({row['vs_reference']}x reference)"
                   if "vs_reference" in row else "")
                + f"  (compile {tc:.0f}s)")

    print(json.dumps({
        "metric": "obca_free_time_N10_solves_per_s",
        "value": round(solves_per_s, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s * BASELINE_S, 2),
        "feasible_fraction": round(feas_frac, 4),
        "batch": B,
        "device": str(dev),
        "compacted": compact,
        # production fix-time replan steps (mpc6+mpc8 ladder, 5-cand
        # multistart each = 10 NLP multistarts per step)
        "fixstep_steps_per_s": round(B / t_fix, 2),
        "fixstep_feasible_fraction": round(feas_fix, 4),
        "fixstep_nlp_solves_per_s": round(10 * B / t_fix, 2),
        "replan_N5_p50_ms": round(q["p50"], 2),
        "replan_N5_p99_ms": round(q["p99"], 2),
        "replan_N5_feasible": feas5 / reps_lat,
        "replan_fix_p50_ms": round(qf["p50"], 2),
        "replan_fix_p99_ms": round(qf["p99"], 2),
        "replan_fix_feasible": feasf / reps_fix,
        # reference solves the same N=74 free-time NLP in 136.69 s
        # (src/simulation.py:230)
        "openloop_N74_s": round(t74, 3),
        "openloop_N74_feasible": feas74,
        "openloop_N74_vs_baseline": round(BASELINE_N74_S / t74, 1),
        **({"hlo_body_ops": hlo_body_ops}
           if hlo_body_ops is not None else {}),
        **({"horizon_scaling": horizon} if horizon else {}),
        **extra,
    }))


if __name__ == "__main__":
    main()
