"""Round-3 TPU experiments (run on the axon chip, results to stderr):

  1. true per-iteration cost of the CURRENT solver (tol=0 so every lane
     runs exactly max_iters; slope between max_iters = 1 and 24),
  2. same at matmul_precision='high' (bf16x3 instead of 6-pass f32),
  3. spine-solve shootout on the real Schur shape (B=256, 54x54 SPD):
     XLA cholesky+cho_solve(x3 rhs) vs blocked triangular inverse.
     (ops/chol_pallas was deleted in round 3: it targeted the dense
     ~600-row AL-kernel factorization that the arrow/structured path
     made obsolete — production blocks are 12x12 and the spine is
     ~54-78 rows, both below Mosaic's 128-lane tile granularity, so
     the kernel could only pad and lose. The unrolled _chol_inv_small
     at 54x54 emits ~2900 serial HLO ops and its TPU compile ran >10
     min before being killed — that is its shootout result.)
  4. the tiny-block path (B=256, K=60, 8x8) for context.

Usage: python scripts/exp_r3.py   (axon env assumed; falls back to CPU)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

_plat_tag = "axon" if "axon" in os.environ.get("JAX_PLATFORMS", "") else "cpu"
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 f"/root/.cache/jax_comp_{_plat_tag}"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if "axon" in os.environ.get("JAX_PLATFORMS", ""):
    jax.config.update("jax_platforms", "cpu,axon")
    accel = "axon"
else:
    accel = None

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


def timed(fn, *args, reps=3):
    t0 = time.time()
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    tc = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        ts.append(time.time() - t0)
    return tc, min(ts)


# ---- 1+2: per-iteration slope of the real solver -------------------------
def solver_run(max_iters, precision):
    o = IPMOptions(max_iters=max_iters, tol=0.0, acceptable_tol=0.0,
                   feas_tol=1e-3, n_deltas=1, matmul_precision=precision)
    s = make_obca_solver(spec, o)
    return jax.jit(jax.vmap(s), device=dev)


for prec in ("highest", "high"):
    ts = {}
    for it in (1, 24):
        f = solver_run(it, prec)
        tc, t = timed(f, datab, z0b)
        ts[it] = t
        print(f"[solve prec={prec} iters={it}] compile {tc:.1f}s "
              f"run {t*1e3:.1f} ms", flush=True)
    per = (ts[24] - ts[1]) / 23
    print(f"[solve prec={prec}] => {per*1e3:.2f} ms/iteration "
          f"(overhead {ts[1]*1e3:.1f} ms)", flush=True)

# ---- 3: spine Schur-solve shootout (54x54 SPD, batch 256) ----------------
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.solver.ipm import (
    _chol_inv_small,
)

key = jax.random.PRNGKey(0)
npn = 54
A = jax.random.normal(key, (B, npn, npn), dtype) * 0.1
S = jnp.einsum("bij,bkj->bik", A, A) + 3.0 * jnp.eye(npn, dtype=dtype)
r = jax.random.normal(key, (B, 3, npn), dtype)  # 3 rhs (init + 2 refine)
S = jax.device_put(S, dev)
r = jax.device_put(r, dev)
R = 20  # chained reps inside one dispatch


def chain(fn):
    def run(S_, r_):
        def body(i, c):
            S2 = S_ + c[:, :1, :1] * 1e-12
            return fn(S2, r_) + c * 1e-12
        return jax.lax.fori_loop(0, R, body, r_)
    return jax.jit(run, device=dev)


def v_unrolled(S_, r_):
    Sinv = jax.vmap(_chol_inv_small)(S_)
    return jnp.einsum("bij,brj->bri", Sinv, r_)


def v_xla_chol(S_, r_):
    L_ = jnp.linalg.cholesky(S_)
    # 3 sequential solves (matching the refinement structure)
    out = []
    for i in range(3):
        out.append(jax.scipy.linalg.cho_solve(
            (L_[0] * 0 + L_, True), r_[:, i, :, None])[..., 0])
    return jnp.stack(out, axis=1)


def v_xla_inv(S_, r_):
    L_ = jnp.linalg.cholesky(S_)
    eye = jnp.broadcast_to(jnp.eye(npn, dtype=S_.dtype), S_.shape)
    Li = jax.lax.linalg.triangular_solve(L_, eye, left_side=True, lower=True)
    Sinv = jnp.einsum("bki,bkj->bij", Li, Li)
    return jnp.einsum("bij,brj->bri", Sinv, r_)


# NOTE: the unrolled _chol_inv_small at 54x54 emits ~2900 sequential HLO
# ops and its compile ran >10 min on the remote TPU before being killed —
# that IS the shootout result for it (the _UNROLL_LIMIT=16 guard in
# solver/ipm.py exists for exactly this reason); excluded from the list.
variants = {"xla_chol_solve": v_xla_chol,
            "xla_tri_inv": v_xla_inv}

for name, fn in variants.items():
    try:
        tc, t = timed(chain(fn), S, r)
        # correctness: residual of the first rhs
        out = jax.jit(fn, device=dev)(S, r)
        res = np.asarray(jnp.einsum("bij,bj->bi", S, out[:, 0]) - r[:, 0])
        err = float(np.max(np.abs(res)))
        print(f"[spine54 {name}] compile {tc:.1f}s  {t/R*1e3:.3f} ms/call  "
              f"max|Sx-r|={err:.2e}", flush=True)
    except Exception as e:
        print(f"[spine54 {name}] FAILED: {type(e).__name__}: {e}",
              flush=True)

# ---- 4: tiny-block (60, 8, 8) context ------------------------------------
K, bq = 60, 8
Ab = jax.random.normal(key, (B, K, bq, bq), dtype) * 0.3
Gq = jnp.einsum("bkij,bklj->bkil", Ab, Ab) + 2.0 * jnp.eye(bq, dtype=dtype)
rq = jax.random.normal(key, (B, K, bq), dtype)
Gq = jax.device_put(Gq, dev)


def v_tiny_unrolled(G_, r_):
    Qi = _chol_inv_small(G_)
    return jnp.einsum("bkij,bkj->bki", Qi, r_)


def v_tiny_xla(G_, r_):
    L_ = jnp.linalg.cholesky(G_)
    return jax.scipy.linalg.cho_solve((L_, True), r_[..., None])[..., 0]


for name, fn in (("tiny_unrolled", v_tiny_unrolled), ("tiny_xla", v_tiny_xla)):
    def chain2(fn=fn):
        def run(G_, r_):
            def body(i, c):
                return fn(G_ + c[..., :1] * 1e-12, r_) + c * 1e-12
            return jax.lax.fori_loop(0, R, body, r_)
        return jax.jit(run, device=dev)
    tc, t = timed(chain2(), Gq, rq)
    print(f"[tiny8 {name}] compile {tc:.1f}s  {t/R*1e3:.3f} ms/call",
          flush=True)

print("DONE", flush=True)
