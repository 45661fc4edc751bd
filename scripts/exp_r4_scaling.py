"""Round-4 dig into the 2-virtual-device scaling efficiency (round-3
verdict, weak #5: SWEEP_r03 measured 0.681 on this 2-core host).

Hypotheses tested: (a) lane imbalance — different scenarios converge in
different iteration counts, the slower shard sets the wall time; (b)
host-capacity — the 1-device baseline is NOT single-core, because
XLA:CPU uses intra-op threading across both physical cores, so a second
virtual device cannot double throughput.

MEASURED (this script, 2026-08-21, 32 scenarios x 5 steps, f32):
    random endpoints:   1 dev 117.0 s, 2 dev ~101 s -> efficiency 0.576
    balanced (32 copies of ONE scenario — zero imbalance possible):
                        1 dev 6.48 s,  2 dev 5.11 s -> efficiency 0.634
Conclusion: imbalance contributes little (0.576 vs 0.634); the
efficiency ceiling on this host is CAPACITY — the 1-device run already
draws on both cores through XLA:CPU's intra-op thread pool, so virtual
2-device "scaling" divides the same two cores. Real multi-chip
efficiency must be measured on real chips; the 8-device dryrun
(__graft_entry__.dryrun_multichip) validates that the sharded program
compiles and executes correctly, and SWEEP JSONs carry the
physical_cores field so the capacity bound is visible next to the
numbers.

Usage: python scripts/exp_r4_scaling.py  (CPU, ~10 min)
"""

import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.parallel import (
        make_mesh, shard_along, sharded_rollout,
    )
    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.runtime import (
        astar_host,
    )
    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.runtime.scan_loop import (
        make_scan_rollout,
    )
    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.scenarios.demos import (
        default_params_for,
    )
    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.scenarios.random_gen import (
        random_scenarios,
    )

    B, steps, dtype = 32, 5, jnp.float32
    for mode in ("random", "balanced"):
        if mode == "random":
            scn_all, shape = random_scenarios(seed=0, batch=B,
                                              dtype=np.float32)
        else:
            scn_all, shape = random_scenarios(
                seed=0, batch=1, dtype=np.float32,
                randomize_endpoints=False)
            scn_all = jax.tree.map(
                lambda a: np.repeat(np.asarray(a), B, axis=0), scn_all)
        refs, lens = [], []
        for i in range(B):
            r = astar_host.reference_path_for(
                np.asarray(scn_all.grid[i]), np.asarray(scn_all.start[i]),
                np.asarray(scn_all.goal[i]))
            lens.append(min(40, r.shape[1]))
            refs.append(r[:, :40] if r.shape[1] >= 40 else np.pad(
                r, ((0, 0), (0, 40 - r.shape[1])), mode="edge"))
        refs = np.stack(refs)
        roll = make_scan_rollout(shape, default_params_for("demo1"),
                                 max_steps=steps, dtype=dtype)
        out = {}
        for nd in (1, 2):
            mesh = make_mesh(nd)
            sroll = sharded_rollout(roll, mesh)
            args = shard_along(
                (scn_all, jnp.asarray(refs, dtype),
                 jnp.asarray(np.asarray(lens))), mesh)
            fin, _ = sroll(*args)
            np.asarray(fin.x0)
            ts = []
            for _ in range(3):
                t0 = time.time()
                fin, _ = sroll(*args)
                np.asarray(fin.x0)
                ts.append(time.time() - t0)
            out[nd] = min(ts)
            print(f"{mode} devices={nd}: {out[nd]:.2f}s", flush=True)
        print(f"{mode}: 2-device efficiency = {out[1] / (2 * out[2]):.3f}",
              flush=True)


if __name__ == "__main__":
    main()
