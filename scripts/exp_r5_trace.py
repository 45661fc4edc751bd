"""Try jax.profiler on the axon backend for the free-N=10 iterate; fall
back to reporting op-category timings from the trace if supported.

Usage: JAX_PLATFORMS=cpu,axon python scripts/exp_r5_trace.py [fused|arrow]
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    kkt = sys.argv[1] if len(sys.argv) > 1 else "fused"
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_axon")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_platforms", "cpu,axon")
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

    dev = jax.devices("axon")[0]
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
    opt = IPMOptions(max_iters=200, tol=1e-30, acceptable_tol=1e-30,
                     feas_tol=1e-30, n_deltas=1, n_refine=1,
                     n_backtracks=8, acceptable_iter=1, kkt=kkt)
    solve = make_obca_solver(spec, opt)
    st0 = jax.jit(jax.vmap(solve.init), device=dev)(datab, z0b)
    viter = jax.jit(jax.vmap(solve.iterate, in_axes=(0, 0, None)),
                    device=dev)
    _ = np.asarray(viter(st0, datab, 30).it)[0]

    tdir = f"/tmp/jaxtrace_{kkt}"
    os.system(f"rm -rf {tdir}")
    try:
        with jax.profiler.trace(tdir):
            out = viter(st0, datab, 30)
            _ = int(np.asarray(out.it)[0])
    except Exception as e:
        print(f"profiler failed: {e}")
        return

    files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    print("trace files:", files)
    if not files:
        print(glob.glob(f"{tdir}/**/*", recursive=True)[:20])
        return
    with gzip.open(files[0], "rt") as f:
        tr = json.load(f)
    per_op = defaultdict(float)
    total = 0.0
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            name = ev.get("name", "?")
            pid_name = ev.get("pid")
            per_op[name] += ev["dur"]
            total += ev["dur"]
    top = sorted(per_op.items(), key=lambda kv: -kv[1])[:40]
    print(f"kkt={kkt} total traced us: {total:.0f}")
    for name, dur in top:
        print(f"  {dur:12.0f} us  {name[:110]}")


if __name__ == "__main__":
    main()
