"""Count HLO ops in the IPM Newton iteration body (the round-4 diagnosed
binding constraint: ~11.8k ops). Run on CPU — op count is platform-
independent pre-layout.

Usage: JAX_PLATFORMS=cpu python scripts/exp_r5_opcount.py [--fused]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def count_ops(mod_text):
    """Count non-trivial HLO instruction lines in an optimized module."""
    n = 0
    for line in mod_text.splitlines():
        ls = line.strip()
        if "=" in ls and not ls.startswith(("HloModule", "ENTRY", "%", "}", "ROOT tuple")):
            # instruction lines look like  name = type op(...)
            if ls.split("=", 1)[0].strip().replace(".", "").replace("_", "").replace("-", ""):
                n += 1
    return n


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
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

    kkt = sys.argv[1] if len(sys.argv) > 1 else "arrow"

    dtype = jnp.float32
    demo = get_demo("demo1")
    scn, shape = build_scenario(demo, dtype=dtype)
    spec = OBCASpec(N=6, n_obs=shape.n_obs, e_max=shape.e_max,
                    variant="fix_terminal")
    ref = astar_host.reference_path_for(np.asarray(scn.grid), demo.start,
                                        demo.goal)
    refj = jnp.asarray(ref, dtype)
    p1 = demo.params
    x0 = jnp.asarray(ref[:, 5], dtype)
    xref = window_reference(refj, ref.shape[1], x0, 6)
    data = build_obca_data(
        spec, scn, x0=x0, u0=jnp.zeros(2, dtype), xref=xref,
        Ts=0.1, terminal_set=jnp.asarray(
            [[x0[0] - 50.0, 99.0], [1.0, 9.0]], dtype),
        q=p1.q_fix, r1=p1.r1_fix, r2=p1.r2_fix,
        v_max=p1.v_max, w_max=p1.w_max, a_max=p1.a_max,
        alpha_max=p1.alpha_max, ego=p1.ego, dmin=p1.dmin,
    )
    opt = IPMOptions(max_iters=100, n_deltas=2, n_refine=1, n_backtracks=8,
                     kkt=kkt)
    solve = make_obca_solver(spec, opt)
    z0 = init_vars(spec, data)
    st0 = jax.jit(solve.init)(data, z0)

    # one fixed iteration of the body: iterate with cap = it+1
    def one_iter(st, data):
        return solve.iterate(st, data, st.it + 1)

    lowered = jax.jit(one_iter).lower(st0, data)
    compiled = lowered.compile()
    txt = compiled.as_text()
    total = count_ops(txt)
    # body of the while loop specifically
    import re
    bodies = re.findall(r"%?[\w.-]*body[\w.-]*[\s\S]*?(?=\n\w|\nHloModule|$)", txt)
    print(f"kkt={kkt}  total HLO ops in one-iteration program: {total}")
    # count ops inside while-body computations
    in_body = 0
    cur = None
    for line in txt.splitlines():
        if line.startswith("%") and "body" in line.split("(")[0]:
            cur = True
            continue
        if line.startswith(("%", "ENTRY")):
            cur = False
            continue
        if cur and "=" in line:
            in_body += 1
    print(f"kkt={kkt}  ops inside while-body computations: {in_body}")


if __name__ == "__main__":
    main()
