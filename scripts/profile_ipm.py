"""Profile the batched IPM solve on the real TPU chip.

Answers VERDICT r1 item 3: where do the ~4.3 ms/solve go? Measures
  * per-iteration device cost (slope of wall time vs max_iters),
  * the option levers (matmul precision, backtrack count, KKT mode),
  * iteration-count distribution (the batch pays the max under vmap).

Run on the axon TPU: ``python scripts/profile_ipm.py``; add trace=1 to
also capture a Perfetto device trace under /tmp/ipm_trace.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

plats = os.environ.get("JAX_PLATFORMS", "")
accel = None
if "axon" in plats:
    jax.config.update("jax_platforms", "cpu,axon")
    accel = "axon"

import jax.numpy as jnp
import numpy as np

from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.models import (
    OBCASpec, build_obca_data, init_vars,
)
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.runtime import astar_host
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.runtime.reference import (
    window_reference,
)
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.scenarios import (
    build_scenario, get_demo,
)
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.solver import (
    IPMOptions, make_obca_solver,
)
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.utils.profiling import (
    device_trace,
)

B = int(os.environ.get("B", "256"))
N = 10

dev = (jax.devices(accel) if accel else jax.devices())[0]
print(f"device: {dev}  batch={B}", flush=True)

dtype = jnp.float32
demo = get_demo("demo9")
scn, shape = build_scenario(demo, dtype=dtype)
spec = OBCASpec(N=N, n_obs=shape.n_obs, e_max=shape.e_max, variant="free")
ref = astar_host.reference_path_for(np.asarray(scn.grid), demo.start, demo.goal)
L = ref.shape[1]
refj = jnp.asarray(ref, dtype)
rng = np.random.RandomState(0)
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


def timed(name, opt, reps=3):
    solve = make_obca_solver(spec, opt)
    vsolve = jax.jit(jax.vmap(solve), device=dev)
    t0 = time.time()
    r = vsolve(datab, z0b)
    it = np.asarray(r.iters)
    print(f"  [{name}] compile+run {time.time()-t0:.1f}s  "
          f"feas={np.mean(np.asarray(r.feas)):.3f} "
          f"iters p50={np.median(it):.0f} p90={np.percentile(it,90):.0f} "
          f"max={it.max()}", flush=True)
    times = []
    for i in range(reps):
        z0p = jax.device_put(
            jax.tree.map(lambda a: a * (1.0 + 1e-5 * (i + 1)), z0b), dev)
        t0 = time.time()
        r = vsolve(datab, z0p)
        np.asarray(r.iters)
        times.append(time.time() - t0)
    t = min(times)
    print(f"  [{name}] best {t*1e3:.1f} ms -> {B/t:.1f} solves/s", flush=True)
    return t, it


base = dict(tol=1e-4, acceptable_tol=5e-3, feas_tol=1e-3, n_deltas=1)

print("== iteration slope ==")
t10, _ = timed("iters=10", IPMOptions(max_iters=10, **base))
t40, _ = timed("iters=40", IPMOptions(max_iters=40, **base))
t100, it100 = timed("iters=100 (bench cfg)", IPMOptions(max_iters=100, **base))
per_iter = (t40 - t10) / 30
print(f"per-iteration device cost: {per_iter*1e3:.2f} ms "
      f"(fixed overhead ~{(t10 - 10*per_iter)*1e3:.1f} ms)")

print("== levers ==")
timed("precision=high", IPMOptions(max_iters=100, matmul_precision="high", **base))
timed("backtracks=8", IPMOptions(max_iters=100, n_backtracks=8, **base))
timed("al_chol", IPMOptions(max_iters=100, kkt="al_chol", **base))
timed("acceptable_iter=2", IPMOptions(max_iters=100, acceptable_iter=2, **base))

if os.environ.get("TRACE"):
    solve = make_obca_solver(spec, IPMOptions(max_iters=100, **base))
    vsolve = jax.jit(jax.vmap(solve), device=dev)
    np.asarray(vsolve(datab, z0b).iters)
    with device_trace("/tmp/ipm_trace"):
        np.asarray(vsolve(datab, z0b).iters)
    print("trace written to /tmp/ipm_trace")
