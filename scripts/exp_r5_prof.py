"""Component costing of the fused Newton body by option ablation: the
per-trip deltas between configs isolate the line search (n_backtracks),
the per-rung factorize+solve (n_deltas), and refinement (n_refine).

Usage: JAX_PLATFORMS=cpu,axon python scripts/exp_r5_prof.py [fused|arrow]
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
    demo = get_demo("demo1")
    scn, shape = build_scenario(demo, dtype=dtype)
    spec = OBCASpec(N=6, n_obs=shape.n_obs, e_max=shape.e_max,
                    variant="fix_terminal")
    ref = astar_host.reference_path_for(np.asarray(scn.grid), demo.start,
                                        demo.goal)
    refj = jnp.asarray(ref, dtype)
    L = ref.shape[1]
    p1 = demo.params
    rng = np.random.RandomState(0)
    B = 1024
    starts = np.sort(rng.randint(0, L - 2, size=B))
    x0s = jnp.asarray(ref[:, starts], dtype).T

    def build_one(x0):
        xref = window_reference(refj, L, x0, 6)
        data = build_obca_data(
            spec, scn, x0=x0, u0=jnp.zeros(2, dtype), xref=xref,
            Ts=0.1, terminal_set=jnp.asarray(
                [[x0[0] - 50.0, 99.0], [1.0, 9.0]], dtype),
            q=p1.q_fix, r1=p1.r1_fix, r2=p1.r2_fix,
            v_max=p1.v_max, w_max=p1.w_max, a_max=p1.a_max,
            alpha_max=p1.alpha_max, ego=p1.ego, dmin=p1.dmin,
        )
        return data, init_vars(spec, data)

    datab, z0b = jax.jit(jax.vmap(build_one))(x0s)
    datab = jax.device_put(datab, dev)
    z0b = jax.device_put(z0b, dev)

    def measure(label, **kw):
        base = dict(max_iters=200, tol=1e-30, acceptable_tol=1e-30,
                    feas_tol=1e-30, n_deltas=2, n_refine=1,
                    n_backtracks=8, kkt=kkt)
        base.update(kw)
        solve = make_obca_solver(spec, IPMOptions(**base))
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
        print(f"[{label:24s}] per-trip={per*1e3:6.2f} ms  "
              f"per-lane-iter={per/B*1e6:6.2f} us", flush=True)
        return per

    base = measure("base nb8 nd2 nr1")
    nb1 = measure("n_backtracks=1", n_backtracks=1)
    nd1 = measure("n_deltas=1", n_deltas=1)
    nr0 = measure("n_refine=0", n_refine=0)
    nb1nd1nr0 = measure("nb1 nd1 nr0", n_backtracks=1, n_deltas=1,
                        n_refine=0)
    print(f"\nline search (7 extra trials): {(base-nb1)*1e3:.2f} ms/trip")
    print(f"2nd ladder rung:              {(base-nd1)*1e3:.2f} ms/trip")
    print(f"refinement pass:              {(base-nr0)*1e3:.2f} ms/trip")
    print(f"floor (nb1 nd1 nr0):          {nb1nd1nr0*1e3:.2f} ms/trip "
          f"= {nb1nd1nr0/B*1e6:.2f} us/lane-iter")


if __name__ == "__main__":
    main()
