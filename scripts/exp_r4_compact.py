"""Honest re-measure of COMPACTION on the fix-time ladder.

exp_r4_trip.py established the iteration body is throughput-bound
(~20-24 us per lane-iteration, linear in batch), so the ~4x convoy
waste (batch-max trips vs per-lane useful iterations) is recoverable
wall time — IF the per-dispatch tunnel overhead is small enough. The
round-3 bench disabled compaction citing 10-20 s per extra dispatch;
that measurement predates the discovery that ``jax.block_until_ready``
does not reliably block on the remote backend, so it is re-measured
here with fetch-based timing.

Pipeline (the ladder as real compaction instead of skip-gating):
  1. flatten (B lanes x 5 candidates) -> 5B mpc6 problems,
     solve_compacted (iteration chunks + shrinking buckets),
  2. reduce best-of-5 per lane (prefer feasible, lowest objective),
  3. gather the mpc6-infeasible lanes only, solve their 5 candidates
     with mpc8 (candidate 0 polish-started from the lane's best mpc6
     iterate), scatter back.

Usage: JAX_PLATFORMS=cpu,axon python scripts/exp_r4_compact.py [chunk]
Env: EXP_BATCH (256), EXP_REPS (3), EXP_MINBUCKET (64).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    _plat = "axon" if "axon" in os.environ.get("JAX_PLATFORMS", "") else "cpu"
    jax.config.update("jax_compilation_cache_dir",
                      f"/root/.cache/jax_comp_{_plat}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if _plat == "axon":
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
        candidate_inits_traced,
    )
    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.scenarios import (
        build_scenario, get_demo,
    )
    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.solver import (
        IPMOptions, make_obca_solver,
    )
    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.solver.compact import (
        solve_compacted,
    )

    B = int(os.environ.get("EXP_BATCH", "256"))
    reps = int(os.environ.get("EXP_REPS", "3"))
    min_bucket = int(os.environ.get("EXP_MINBUCKET", "64"))
    chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    dev = (jax.devices(accel) if accel else jax.devices())[0]
    dtype = jnp.float32
    print(f"device: {dev}  B={B} chunk={chunk} min_bucket={min_bucket}",
          flush=True)

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
    spec6 = OBCASpec(N=Nf, n_obs=shape1.n_obs, e_max=shape1.e_max,
                     variant="fix_terminal")
    spec8 = OBCASpec(N=Nf, n_obs=shape1.n_obs, e_max=shape1.e_max,
                     variant="fix_free_end")
    lane_rows = np.arange(B) % n_rows
    take = lambda a: jnp.asarray(np.asarray(a)[lane_rows], dtype)
    scn_l = jax.tree.map(lambda a: a[jnp.asarray(lane_rows)], scn_rows)

    def build_fix(scn1, x0, u0, xref, Ts, tset, delta, sensed):
        data = build_obca_data(
            spec6, scn1, x0=x0, u0=u0, xref=xref,
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

    nC = 5
    flat = lambda a: jnp.reshape(
        jnp.broadcast_to(a[:, None], (B, nC) + a.shape[1:]),
        (B * nC,) + a.shape[1:])
    data_f = jax.tree.map(flat, datafix)          # (5B, ...)
    cands_f = jnp.reshape(candsfix, (B * nC,) + candsfix.shape[2:])

    opt6 = IPMOptions(max_iters=100, tol=1e-4, acceptable_tol=5e-3,
                      feas_tol=1e-3, n_deltas=2, stall_iters=10,
                      stall_viol_gate=False, acceptable_iter=1,
                      n_backtracks=8, n_refine=1)
    opt8 = IPMOptions(max_iters=100, tol=1e-4, acceptable_tol=5e-3,
                      feas_tol=1e-3, n_deltas=2, stall_iters=20,
                      acceptable_iter=1, n_backtracks=8, n_refine=1)
    s6 = make_obca_solver(spec6, opt6)
    s8 = make_obca_solver(spec8, opt8)
    vinit6 = jax.jit(jax.vmap(
        lambda d, x: init_vars(spec6, d, x_init=x)), device=dev)
    vinit8 = jax.jit(jax.vmap(
        lambda d, x: init_vars(spec8, d, x_init=x)), device=dev)

    data_f = jax.device_put(data_f, dev)
    cands_f = jax.device_put(cands_f, dev)

    def run_once(cands_in):
        calls = {"n": 0, "disp": 0}
        z0 = vinit6(data_f, cands_in)
        r6, st1 = solve_compacted(s6, data_f, z0, chunk=chunk,
                                  min_bucket=min_bucket, max_iters=100,
                                  device=dev)
        calls["n"] += st1["calls"]
        calls["disp"] += st1["dispatched_lane_iters"]
        feas6 = np.asarray(r6.feas).reshape(B, nC)
        f6 = np.asarray(r6.f).reshape(B, nC)
        score = np.where(feas6, f6, 1e18)
        best6 = score.argmin(axis=1)
        lane_feas6 = feas6.any(axis=1)
        need8 = np.nonzero(~lane_feas6)[0]
        n8 = len(need8)
        if n8:
            # pad to a bucket-friendly size
            pad = np.resize(need8, max(min_bucket, int(2 ** np.ceil(
                np.log2(max(n8, 1))))))
            sel = (pad[:, None] * nC + np.arange(nC)[None]).reshape(-1)
            selj = jnp.asarray(sel)
            d8 = jax.tree.map(lambda a: a[selj], data_f)
            c8 = cands_f[selj]
            z08 = vinit8(d8, c8)
            # candidate 0 polish-starts from the lane's best mpc6 iterate
            bi = jnp.asarray(pad * nC + best6[pad])
            z6b = jax.tree.map(lambda a: a[bi], dict(r6.z))
            m = np.zeros(len(sel), bool)
            m[::nC] = True
            mj = jnp.asarray(m)
            z08 = jax.tree.map(
                lambda w, c: jnp.where(
                    mj.reshape((-1,) + (1,) * (c.ndim - 1)),
                    jnp.repeat(w, nC, axis=0).astype(c.dtype), c),
                z6b, z08)
            r8, st2 = solve_compacted(s8, d8, z08, chunk=chunk,
                                      min_bucket=min_bucket, max_iters=100,
                                      device=dev)
            calls["n"] += st2["calls"]
            calls["disp"] += st2["dispatched_lane_iters"]
            feas8 = np.asarray(r8.feas).reshape(-1, nC)
            lane8 = feas8.any(axis=1)
            ok = dict(zip(pad.tolist(), lane8.tolist()))
            lane_feas = lane_feas6.copy()
            for ln, v in ok.items():
                lane_feas[ln] = lane_feas[ln] or v
        else:
            lane_feas = lane_feas6
        return lane_feas, calls, int(np.asarray(r6.iters).sum())

    t0 = time.time()
    lane_feas, calls, useful = run_once(cands_f)
    print(f"compile+first: {time.time()-t0:.1f} s  calls={calls['n']} "
          f"feas={lane_feas.mean():.4f}", flush=True)
    times = []
    for i in range(reps):
        eps = 1e-5 * (i + 1) + 3e-7
        cp = jax.device_put(cands_f * (1.0 + eps), dev)
        t0 = time.time()
        lane_feas, calls, useful = run_once(cp)
        times.append(time.time() - t0)
    t = min(times)
    print(f"times: {[f'{x:.3f}' for x in times]} -> {B/t:.1f} steps/s  "
          f"feas={lane_feas.mean():.4f}  calls/run={calls['n']}  "
          f"dispatched={calls['disp']} useful~{useful}", flush=True)


if __name__ == "__main__":
    main()
