"""Diagnose the fix-ladder feasibility regression (1.000 -> 0.984 after
the round-5 perf work): which fixture lanes fail, at what violation, and
which knob recovers them.

Usage: JAX_PLATFORMS=cpu,axon python scripts/exp_r5_feas.py [config...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build(kkt="fused", nd6=2, nd8=2, nr6=1, nr8=1, stall6=10, stall8=20,
          lim=None, warm=False):
    import jax
    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.solver import ipm
    if lim is not None:
        ipm._BLOCK_INV_LIMIT = lim
    import jax.numpy as jnp
    import numpy as np
    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.models import (
        OBCASpec, build_obca_data, init_vars,
    )
    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.scenarios import (
        build_scenario, get_demo,
    )
    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.solver import (
        IPMOptions, make_obca_solver,
    )
    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.runtime.multistart import (
        make_multistart_solver,
    )

    dtype = jnp.float32
    fx = np.load(os.path.join(os.path.dirname(__file__), "..",
                              "goldens", "bench_fix_fixture.npz"))
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
    B = 256
    lane_rows = np.arange(B) % n_rows
    take = lambda a: jnp.asarray(np.asarray(a)[lane_rows], dtype)
    scn_l = jax.tree.map(lambda a: a[jnp.asarray(lane_rows)], scn_rows)

    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.runtime.multistart import (
        candidate_inits_traced,
    )

    def build_fix(scn1, x0, u0, xref, Ts, tset, delta, sensed):
        # mirror of bench.py build_fix (data + dodge-box candidates)
        data = build_obca_data(
            spec_fix, scn1, x0=x0, u0=u0, xref=xref, Ts=Ts,
            dyn_active=sensed, dyn_delta=delta, Ts_pred=Ts,
            terminal_set=tset, q=p1.q_fix, r1=p1.r1_fix, r2=p1.r2_fix,
            v_max=p1.v_max, w_max=p1.w_max, a_max=p1.a_max,
            alpha_max=p1.alpha_max, ego=p1.ego, dmin=p1.dmin)
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

    iters = 100
    opt6 = IPMOptions(max_iters=iters, tol=1e-4, acceptable_tol=5e-3,
                      feas_tol=1e-3, n_deltas=nd6, stall_iters=stall6,
                      stall_viol_gate=False, acceptable_iter=1,
                      n_backtracks=8, n_refine=nr6, kkt=kkt)
    opt8 = IPMOptions(max_iters=iters, tol=1e-4, acceptable_tol=5e-3,
                      feas_tol=1e-3, n_deltas=nd8, stall_iters=stall8,
                      acceptable_iter=1, n_backtracks=8, n_refine=nr8,
                      kkt=kkt)
    ms6 = make_multistart_solver(spec_fix, make_obca_solver(spec_fix, opt6),
                                 init_vars, 5)
    ms8 = make_multistart_solver(spec_fix8,
                                 make_obca_solver(spec_fix8, opt8),
                                 init_vars, 5)

    warm_args = None
    if warm:
        # receding-horizon shift of the recorded previous-step duals
        # (scan_loop.py step(): shift1 + k>0 gate)
        sh = lambda a: np.concatenate([a[:, 1:], a[:, -1:]], axis=1)
        wl = jnp.asarray(sh(np.asarray(fx["prev_lam"]))[lane_rows], dtype)
        wm = jnp.asarray(sh(np.asarray(fx["prev_mu"]))[lane_rows], dtype)
        wv = jnp.asarray(np.asarray(fx["k"])[lane_rows] > 0)
        warm_args = (wl, wm, wv)

    def sol_fix(d, c, *w6):
        r6 = ms6(d, c, None, w6 if w6 else None)[0]
        r8 = ms8(d, c, r6.feas, None, dict(r6.z))[0]
        use8 = ~r6.feas & r8.feas
        m = lambda a, b: jnp.where(use8, b, a)
        return r6._replace(
            z=jax.tree.map(m, r6.z, r8.z), f=m(r6.f, r8.f),
            viol=m(r6.viol, r8.viol), kkt_err=m(r6.kkt_err, r8.kkt_err),
            feas=r6.feas | r8.feas, iters=r6.iters + r8.iters)

    return datafix, candsfix, sol_fix, warm_args


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
    import numpy as np

    dev = (jax.devices(accel) if accel else jax.devices())[0]

    import importlib

    configs_all = {
        "bench": ("fused nd2 nr8=2 (bench)", dict(nr8=2)),
        "nr1": ("fused nr8=1", dict()),
        "nd3": ("fused nd8=3", dict(nd8=3)),
        "stall0": ("fused stall8=0", dict(stall8=0)),
        "arrow": ("arrow (old path)", dict(kkt="arrow", nr8=2)),
        "warm": ("fused nr8=2 + warm duals", dict(nr8=2, warm=True)),
    }
    keys = sys.argv[1:] or ["bench", "nr1", "nd3", "arrow"]
    for key in keys:
        name, kw = configs_all[key]
        datafix, candsfix, sol_fix, warm_args = build(**kw)
        vs = jax.jit(jax.vmap(sol_fix), device=dev)
        datafix = jax.device_put(datafix, dev)
        candsfix = jax.device_put(candsfix, dev)
        args = (datafix, candsfix)
        if warm_args is not None:
            args = args + tuple(jax.device_put(w, dev) for w in warm_args)
        t0 = time.time()
        r = vs(*args)
        feas = np.asarray(r.feas)
        tc = time.time() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            r = vs(*args)
            feas = np.asarray(r.feas)
            best = min(best, time.time() - t0)
        viol = np.asarray(r.viol)
        its = np.asarray(r.iters)
        bad = np.nonzero(~feas)[0]
        print(f"[{name:26s}] feas={feas.mean():.4f} "
              f"steps/s={256/best:.1f} iters med={np.median(its):.0f} "
              f"p90={np.percentile(its, 90):.0f} max={its.max()} "
              f"bad={bad[:6].tolist()} "
              f"(compile {tc:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
