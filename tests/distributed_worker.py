"""Worker for the 2-process ``jax.distributed`` test (test_distributed.py).

Each process owns 2 virtual CPU devices (4 global). The batched free-time
OBCA solve is sharded over the GLOBAL mesh via
``parallel.mesh.sharded_batch_solver``; each process contributes its local
shard with ``jax.make_array_from_process_local_data``, the result is
re-gathered with ``multihost_utils.process_allgather`` and compared
against a purely local single-device solve of the same batch. Prints
``DIST_OK <checksum>`` on success — the launcher asserts both processes
print the identical checksum.

Usage: python distributed_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.parallel.mesh import (  # noqa: E402
    init_distributed,
)

init_distributed(coordinator=f"127.0.0.1:{port}", num_processes=nproc,
                 process_id=pid)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.models import (  # noqa: E402
    OBCASpec, build_obca_data, init_vars,
)
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.parallel.mesh import (  # noqa: E402
    sharded_batch_solver,
)
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.runtime import (  # noqa: E402
    astar_host,
)
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.runtime.reference import (  # noqa: E402
    window_reference,
)
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.scenarios import (  # noqa: E402
    build_scenario, get_demo,
)
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.solver import (  # noqa: E402
    IPMOptions, make_obca_solver,
)

assert jax.process_count() == nproc, jax.process_count()
assert len(jax.local_devices()) == 2, jax.local_devices()
assert len(jax.devices()) == 2 * nproc, jax.devices()

B = 4  # one lane per global device
N = 5
demo = get_demo("demo1")
scn, shape = build_scenario(demo)
spec = OBCASpec(N=N, n_obs=shape.n_obs, e_max=shape.e_max, variant="free")
ref = astar_host.reference_path_for(np.asarray(scn.grid), demo.start,
                                    demo.goal)
refj = jnp.asarray(ref)
L = ref.shape[1]
x0s = jnp.asarray(ref[:, [2, 5, 8, 11]]).T  # (B, 3) deterministic poses


def build_one(x0):
    xref = window_reference(refj, L, x0, N)
    data = build_obca_data(spec, scn, x0=x0, u0=jnp.zeros(2), xref=xref,
                           Ts=0.1)
    return data, init_vars(spec, data)


datab, z0b = jax.jit(jax.vmap(build_one))(x0s)

opt = IPMOptions(max_iters=100, acceptable_tol=5e-3, feas_tol=1e-4)
solve = make_obca_solver(spec, opt)

# ---- distributed: global 4-device mesh, each process feeds its shard ----
mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("scenario",))
sharding = NamedSharding(mesh, P("scenario"))
lo, hi = pid * (B // nproc), (pid + 1) * (B // nproc)
mk = lambda a: jax.make_array_from_process_local_data(
    sharding, np.asarray(a[lo:hi]))
datad = jax.tree.map(mk, jax.tree.map(np.asarray, datab))
z0d = jax.tree.map(mk, jax.tree.map(np.asarray, z0b))

with mesh:
    runner = sharded_batch_solver(solve, mesh)
    resd = runner(datad, z0d)
xs_d = multihost_utils.process_allgather(resd.z["x"], tiled=True)
feas_d = multihost_utils.process_allgather(resd.feas, tiled=True)

# ---- single-process oracle: same batch, plain local vmap ----------------
res1 = jax.jit(jax.vmap(solve), device=jax.local_devices()[0])(datab, z0b)
xs_1 = np.asarray(res1.z["x"])

assert feas_d.all(), feas_d
np.testing.assert_allclose(np.asarray(xs_d), xs_1, atol=1e-8)
# checksum printed by BOTH processes — launcher asserts they agree
print(f"DIST_OK {float(np.abs(xs_d).sum()):.12e}", flush=True)
