"""Diagnose the fix-step convoy tail: which lanes/candidates burn the
iterations that set the vmapped while_loop trip count?

Prints, for the H config (gated + viol-gated stall 20 + acceptable_iter 1):
  * per-stage (mpc6 / mpc8) per-CANDIDATE iteration tables of the worst
    lanes, with their (demo, k) provenance,
  * which candidate index wins per lane,
  * the iteration histogram per candidate index.

Usage: JAX_PLATFORMS=cpu,axon python scripts/exp_r4_diag.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


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
        candidate_inits_traced,
    )
    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.scenarios import (
        build_scenario, get_demo,
    )
    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.solver import (
        IPMOptions, make_obca_solver,
    )

    dev = (jax.devices(accel) if accel else jax.devices())[0]
    dtype = jnp.float32

    fx = np.load(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "..", "goldens", "bench_fix_fixture.npz"))
    n_rows = fx["x0"].shape[0]
    B = n_rows  # one lane per recorded replan, no tiling
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
    take = lambda a: jnp.asarray(np.asarray(a), dtype)

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
        scn_rows, take(fx["x0"]), take(fx["u0"]), take(fx["xref"]),
        take(fx["Ts"]), take(fx["terminal_set"]), take(fx["dyn_delta"]),
        take(fx["sensed"]))
    datafix = jax.device_put(datafix, dev)
    candsfix = jax.device_put(candsfix, dev)

    opt = IPMOptions(max_iters=100, tol=1e-4, acceptable_tol=5e-3,
                     feas_tol=1e-3, n_deltas=2, stall_iters=20,
                     acceptable_iter=1)
    s6 = make_obca_solver(spec_fix, opt)
    s8 = make_obca_solver(spec_fix8, opt)

    def full(d, c):
        r6 = jax.vmap(lambda x: s6(d, init_vars(spec_fix, d, x_init=x)))(c)
        feas6 = jnp.any(r6.feas)
        r8 = jax.vmap(
            lambda x: _run8(d, x, feas6))(c)
        return r6, r8

    def _run8(d, x, skip):
        z0 = init_vars(spec_fix8, d, x_init=x)
        st = s8.init(d, z0)
        st = st._replace(done=st.done | skip)
        st = s8.iterate(st, d, 10 ** 9)
        return s8.finalize(st, d)

    r6, r8 = jax.jit(jax.vmap(full), device=dev)(datafix, candsfix)
    it6 = np.asarray(r6.iters)    # (B, 5)
    it8 = np.asarray(r8.iters)
    f6 = np.asarray(r6.feas)
    f8 = np.asarray(r8.feas)
    viol6 = np.asarray(r6.viol)
    err6 = np.asarray(r6.kkt_err)
    demos = fx["demo"]
    ks = fx["k"]

    print(f"rows={B}  stage1 (mpc6) batch-max trips: {it6.max()}  "
          f"stage2 (mpc8): {it8.max()}")
    print(f"per-candidate mpc6 iter p50/p90/max:")
    for c in range(5):
        nm = ["window", "shift", "brake", "dodge-", "dodge+"][c]
        print(f"  cand {c} ({nm}): {np.median(it6[:, c]):3.0f} /"
              f" {np.percentile(it6[:, c], 90):3.0f} / {it6[:, c].max():3d}"
              f"   feas {f6[:, c].mean():.2f}")
    lane_it6 = it6.max(axis=1)
    worst = np.argsort(-lane_it6)[:12]
    print("worst mpc6 lanes (lane demo k): per-cand iters / feas / viol / kkt")
    for i in worst:
        print(f"  {i:3d} {demos[i]:6s} k={ks[i]:2d}: "
              f"it={it6[i].tolist()} feas={f6[i].astype(int).tolist()} "
              f"viol={np.format_float_scientific(viol6[i].max(), 2)} "
              f"err={np.format_float_scientific(err6[i].max(), 2)}")
    lane_it8 = it8.max(axis=1)
    worst8 = np.argsort(-lane_it8)[:8]
    print("worst mpc8 lanes (only mpc6-infeasible run):")
    for i in worst8:
        print(f"  {i:3d} {demos[i]:6s} k={ks[i]:2d}: it={it8[i].tolist()} "
              f"feas={f8[i].astype(int).tolist()}")


if __name__ == "__main__":
    main()
