"""Per-trip + single-lane latency of the free N=10 (demo9, bench) family
across kkt modes and _spd_inv strategies — diagnose the free-throughput
and replan-latency regressions seen after the fused/recursive changes.

Usage: JAX_PLATFORMS=cpu,axon python scripts/exp_r5_free10.py \
          [fused|arrow] [BLOCK_INV_LIMIT]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    kkt = sys.argv[1] if len(sys.argv) > 1 else "fused"
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

    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.solver import ipm
    if len(sys.argv) > 2:
        ipm._BLOCK_INV_LIMIT = int(sys.argv[2])
    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.models import (
        OBCASpec, build_obca_data, init_vars,
    )
    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.scenarios import (
        build_scenario, get_demo,
    )
    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.solver import (
        IPMOptions, make_obca_solver,
    )
    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.runtime import (
        astar_host,
    )
    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.runtime.reference import (
        window_reference,
    )

    dev = (jax.devices(accel) if accel else jax.devices())[0]
    dtype = jnp.float32
    demo = get_demo("demo9")
    scn, shape = build_scenario(demo, dtype=dtype)
    N = 10
    spec = OBCASpec(N=N, n_obs=shape.n_obs, e_max=shape.e_max,
                    variant="free")
    ref = astar_host.reference_path_for(np.asarray(scn.grid), demo.start,
                                        demo.goal)
    refj = jnp.asarray(ref, dtype)
    L = ref.shape[1]
    rng = np.random.RandomState(0)
    B = 256
    starts = np.sort(rng.randint(0, L - 2, size=B))
    x0s = jnp.asarray(ref[:, starts], dtype).T

    def build_one(x0):
        xref = window_reference(refj, L, x0, N)
        data = build_obca_data(spec, scn, x0=x0, u0=jnp.zeros(2, dtype),
                               xref=xref, Ts=0.1)
        return data, init_vars(spec, data)

    datab, z0b = jax.jit(jax.vmap(build_one))(x0s)
    datab = jax.device_put(datab, dev)
    z0b = jax.device_put(z0b, dev)

    # forced-trip per-trip cost (the bench config but non-converging)
    opt = IPMOptions(max_iters=200, tol=1e-30, acceptable_tol=1e-30,
                     feas_tol=1e-30, n_deltas=1, n_refine=1,
                     n_backtracks=8, acceptable_iter=1, kkt=kkt)
    solve = make_obca_solver(spec, opt)
    st0 = jax.jit(jax.vmap(solve.init), device=dev)(datab, z0b)
    viter = jax.jit(jax.vmap(solve.iterate, in_axes=(0, 0, None)),
                    device=dev)
    _ = np.asarray(viter(st0, datab, 10).it)[0]
    _ = np.asarray(viter(st0, datab, 30).it)[0]
    seq = [0]

    def fresh():
        seq[0] += 1
        return jax.device_put(
            st0._replace(zv=st0.zv * (1.0 + 1e-6 * seq[0])), dev)

    ts = {}
    for cap in (10, 30):
        best = 1e9
        for _ in range(3):
            stp = fresh()
            t0 = time.time()
            out = viter(stp, datab, cap)
            _ = int(np.asarray(out.it)[0])
            best = min(best, time.time() - t0)
        ts[cap] = best
    per = (ts[30] - ts[10]) / 20
    lim = ipm._BLOCK_INV_LIMIT
    print(f"[free10 {kkt} lim={lim}] per-trip={per*1e3:.2f} ms "
          f"per-lane-iter={per/B*1e6:.2f} us", flush=True)

    # converging bench-config solve: iteration histogram + wall
    optc = IPMOptions(max_iters=100, tol=1e-4, acceptable_tol=5e-3,
                      feas_tol=1e-3, n_deltas=1, n_refine=1,
                      n_backtracks=8, acceptable_iter=1, kkt=kkt)
    solvec = make_obca_solver(spec, optc)
    vsolve = jax.jit(jax.vmap(solvec), device=dev)
    r = vsolve(datab, z0b)
    _ = np.asarray(r.iters)[0]
    best = 1e9
    for i in range(3):
        z0p = jax.device_put(jax.tree.map(
            lambda a: a * (1.0 + 1e-6 * (i + 1)), z0b), dev)
        t0 = time.time()
        r = vsolve(datab, z0p)
        its = np.asarray(r.iters)
        best = min(best, time.time() - t0)
    feas = float(np.asarray(r.feas).mean())
    print(f"[free10 {kkt} lim={lim}] bench-config: {B/best:.1f} solves/s "
          f"feas={feas:.3f} iters med={np.median(its):.0f} "
          f"p90={np.percentile(its, 90):.0f} max={its.max()}", flush=True)

    # single-lane replan latency (B=1)
    d0 = jax.tree.map(lambda a: a[0], datab)
    jsolve = jax.jit(solvec, device=dev)
    z0 = init_vars(spec, jax.tree.map(lambda a: a[0], datab))
    r = jsolve(jax.device_put(d0, dev), jax.device_put(z0, dev))
    _ = np.asarray(r.iters)
    lats = []
    for i in range(10):
        z0p = jax.device_put(jax.tree.map(
            lambda a: a * (1.0 + 1e-6 * (i + 1)), z0), dev)
        t0 = time.time()
        r = jsolve(d0, z0p)
        _ = int(np.asarray(r.iters))
        lats.append(time.time() - t0)
    lats = np.array(sorted(lats))
    print(f"[free10 {kkt} lim={lim}] B=1 latency p50={lats[4]*1e3:.1f} ms "
          f"min={lats[0]*1e3:.1f} iters={int(np.asarray(r.iters))}",
          flush=True)


if __name__ == "__main__":
    main()
