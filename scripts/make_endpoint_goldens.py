"""Record goal-reached endpoint-parity goldens for demo1/demo9/demo11.

The reference publishes full-traversal GIFs for exactly these demos
(/root/reference/images/demo{1,9,11}.gif); its closed loop caps at
k == 30 (src/closed_loop.py:431) which cannot reach any goal
(v_max = 0.6, d0 = 35-95 m), so goal arrival needs a lifted cap. This
script runs the f32 scanned product loop (the bench/sweep config) with
caps sized from the round-4 measurements (demo1 reaches at k = 49,
demo9 at 84, demo11 at 90) and dumps the full trajectories to
``goldens/endpoint_<demo>.npz``; tests/test_endpoint_parity.py asserts
arrival, physics, clearance and demo1's dodge-below maneuver against
these files.

Usage: JAX_PLATFORMS=cpu,axon python scripts/make_endpoint_goldens.py
(CPU works too, just slower.)
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
        dev = jax.devices("axon")[0]
    else:
        jax.config.update("jax_platforms", "cpu")
        dev = jax.devices()[0]
    import jax.numpy as jnp
    import numpy as np

    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.runtime import (
        astar_host,
    )
    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.runtime.scan_loop import (
        make_scan_rollout,
    )
    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.scenarios import (
        build_scenario, get_demo,
    )

    out_dir = os.path.join(os.path.dirname(__file__), "..", "goldens")
    dtype = jnp.float32
    for name, cap in [("demo1", 120), ("demo9", 150), ("demo11", 150)]:
        demo = get_demo(name)
        scn, shape = build_scenario(demo, dtype=dtype)
        ref = astar_host.reference_path_for(np.asarray(scn.grid),
                                            demo.start, demo.goal)
        roll = jax.jit(make_scan_rollout(shape, demo.params, max_steps=cap,
                                         dtype=dtype), device=dev)
        t0 = time.time()
        fin, traj = roll(jax.device_put(scn, dev),
                         jax.device_put(jnp.asarray(ref, dtype), dev),
                         jax.device_put(jnp.asarray(ref.shape[1]), dev))
        reached = bool(np.asarray(fin.reached))
        k = int(np.asarray(fin.k))
        print(f"{name}: reached={reached} k={k}/{cap} "
              f"wall={time.time()-t0:.0f}s", flush=True)
        assert reached and not bool(np.asarray(fin.failed)), name
        np.savez_compressed(
            os.path.join(out_dir, f"endpoint_{name}.npz"),
            x=np.asarray(traj["x"]), u=np.asarray(traj["u"]),
            ts=np.asarray(traj["Ts_opt"]),
            active=np.asarray(traj["active"]),
            fixtime=np.asarray(traj["fixtime"]),
            feas=np.asarray(traj["feas"]),
            k_final=k, reached=reached,
        )


if __name__ == "__main__":
    main()
