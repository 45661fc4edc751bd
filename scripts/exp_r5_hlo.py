"""Dump + histogram the optimized HLO of the vmapped IPM iterate on the
TPU backend — find what the ~10k lines actually are (fusions? scatters?
while-loop plumbing?).

Usage: JAX_PLATFORMS=cpu,axon python scripts/exp_r5_hlo.py [fused|arrow]
"""

import os
import re
import sys
from collections import Counter

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
    opt = IPMOptions(max_iters=200, tol=1e-30, acceptable_tol=1e-30,
                     feas_tol=1e-30, n_deltas=2, n_refine=1,
                     n_backtracks=8, kkt=kkt)
    solve = make_obca_solver(spec, opt)
    p1 = demo.params
    rng = np.random.RandomState(0)
    B = 256
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
    st0 = jax.jit(jax.vmap(solve.init), device=dev)(datab, z0b)
    viter = jax.jit(jax.vmap(solve.iterate, in_axes=(0, 0, None)),
                    device=dev)
    txt = viter.lower(st0, datab, 30).compile().as_text()
    path = f"/tmp/hlo_{kkt}.txt"
    with open(path, "w") as f:
        f.write(txt)
    ops = Counter()
    for line in txt.splitlines():
        m = re.match(r"\s*(?:ROOT )?[%\w.\-]+ = \S+ ([\w\-]+)\(", line)
        if m:
            ops[m.group(1)] += 1
    print(f"kkt={kkt} total lines {len(txt.splitlines())}  "
          f"instructions {sum(ops.values())}")
    for op, c in ops.most_common(25):
        print(f"  {op:24s} {c}")
    print(f"full dump: {path}")


if __name__ == "__main__":
    main()
