"""Per-component device timing of one IPM iteration (batch 256, demo9
N=10 free-time — the bench problem). Mirrors ipm.py's body() pieces:

  A. first-order eval set: grad f + Jacobians of cE / dense cI + residuals
  B. Lagrangian Hessian (jax.hessian — n x n dense)
  C. KKT: W assembly + J^T J + block-arrow factorization/solve
  D. filter line search: 16 trial (barrier, theta) evaluations

Each component runs inside a chained ``lax.fori_loop`` at two rep counts;
the slope is the true device cost — a single dispatch over the axon
tunnel costs ~25 ms, far more than one component evaluation.

Run on the axon TPU: python scripts/profile_parts.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "axon" in os.environ.get("JAX_PLATFORMS", ""):
    jax.config.update("jax_platforms", "cpu,axon")
    accel = "axon"
else:
    accel = None

import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree

from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.models import (
    OBCASpec, build_obca_data, init_vars,
)
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.models import obca as M
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.runtime import astar_host
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.runtime.reference import (
    window_reference,
)
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.scenarios import (
    build_scenario, get_demo,
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
z0f, unravel = ravel_pytree(jax.tree.map(lambda a: a[0], z0b))
n = z0f.shape[0]
zb = jax.vmap(lambda t: ravel_pytree(t)[0])(z0b)
print(f"n = {n}", flush=True)


def f_flat(zv, data):
    return M.objective(spec, data, unravel(zv))

def cE_flat(zv, data):
    return M.eq_constraints(spec, data, unravel(zv))

def cD_flat(zv, data):
    return M.ineq_constraints_dense(spec, data, unravel(zv))

mE = cE_flat(z0f, jax.tree.map(lambda a: a[0], datab)).shape[0]
mD = cD_flat(z0f, jax.tree.map(lambda a: a[0], datab)).shape[0]
print(f"mE = {mE}  mD = {mD}", flush=True)

q_idx = M.arrow_layout(spec)
K, bq = q_idx.shape
pmask = np.ones(n, bool)
pmask[q_idx.reshape(-1)] = False
p_idx = np.nonzero(pmask)[0]
print(f"arrow: K={K} blocks of {bq}, spine={p_idx.size}", flush=True)

REPS = (4, 20)


def slope(name, step_fn, z0_batch, *extra):
    """step_fn(zb, *extra) -> zb' chained; time fori_loop at two rep
    counts. ``extra`` arrays are jit arguments (NOT closure constants —
    a constant is baked into the remote-compile request and a 292 MB
    one overflows it)."""
    times = {}
    for r in REPS:
        def run(zb_, *ex):
            return jax.lax.fori_loop(0, r, lambda i, z: step_fn(z, *ex), zb_)

        jfn = jax.jit(run, device=dev)
        zz = jax.device_put(z0_batch, dev)
        ex = jax.device_put(extra, dev)
        t0 = time.time()
        out = jfn(zz, *ex)
        np.asarray(jax.tree.leaves(out)[0][0, :1])
        tc = time.time() - t0
        ts = []
        for _ in range(3):
            t0 = time.time()
            out = jfn(zz, *ex)
            np.asarray(jax.tree.leaves(out)[0][0, :1])
            ts.append(time.time() - t0)
        times[r] = min(ts)
        print(f"  [{name}] reps={r} compile {tc:.1f}s run {times[r]*1e3:.1f} ms",
              flush=True)
    per = (times[REPS[1]] - times[REPS[0]]) / (REPS[1] - REPS[0])
    print(f"  [{name}] => {per*1e3:.2f} ms/iteration", flush=True)
    return per


with jax.default_matmul_precision("highest"):
    # A: first-order eval set
    def stepA(zb_, *unused):
        def one(zv, data):
            g = jax.grad(f_flat)(zv, data)
            JE = jax.jacrev(cE_flat)(zv, data)
            JD = jax.jacrev(cD_flat)(zv, data)
            return (g + JE.sum(0) + JD.sum(0)
                    + jnp.sum(cE_flat(zv, data)) + jnp.sum(cD_flat(zv, data)))
        return zb_ + 1e-12 * jax.vmap(one, (0, 0))(zb_, datab)

    tA = slope("A eval set", stepA, zb)

    # B: Lagrangian Hessian
    yb = jnp.zeros((B, mE), dtype)
    wb = jnp.ones((B, mD), dtype) * 0.1

    def stepB(zb_, *unused):
        def one(zv, data, y, w_d):
            def lag(z_):
                return (f_flat(z_, data) - y @ cE_flat(z_, data)
                        - w_d @ cD_flat(z_, data))
            H = jax.hessian(lag)(zv)
            return H.sum(0)
        return zb_ + 1e-12 * jax.vmap(one)(zb_, datab, yb, wb)

    tB = slope("B hessian", stepB, zb)

    # C: arrow KKT solve on synthetic (resident) W, JE
    key = jax.random.PRNGKey(0)
    Hb = jax.random.normal(key, (B, n, n), dtype) * 0.01
    Hb = Hb + jnp.swapaxes(Hb, 1, 2) + 3.0 * jnp.eye(n, dtype=dtype)
    JEb = jax.random.normal(key, (B, mE, n), dtype) * 0.1
    r2b = jax.random.normal(key, (B, mE), dtype)
    Hb = jax.device_put(Hb, dev)
    JEb = jax.device_put(JEb, dev)
    r2b = jax.device_put(r2b, dev)

    def arrow_solve(W, JE, r1, r2):
        dd = 1e-2
        JtJ = (JE.T @ JE) / dd
        G = W + 1e-6 * jnp.eye(n, dtype=dtype) + JtJ
        Gqq = G[q_idx[:, :, None], q_idx[:, None, :]]
        Gpq = G[p_idx[:, None, None], q_idx[None, :, :]]
        Gpp = G[p_idx[:, None], p_idx[None, :]]
        Lq = jnp.linalg.cholesky(Gqq)
        Gqp = jnp.transpose(Gpq, (1, 2, 0))
        Yq = jax.scipy.linalg.cho_solve((Lq, True), Gqp)
        S = Gpp - jnp.einsum("pkb,kbq->pq", Gpq, Yq)
        Ls = jnp.linalg.cholesky(S)

        def gsolve(b_):
            bq_ = b_[q_idx]
            wq = jax.scipy.linalg.cho_solve((Lq, True), bq_[..., None])[..., 0]
            rp = b_[p_idx] - jnp.einsum("pkb,kb->p", Gpq, wq)
            dp = jax.scipy.linalg.cho_solve((Ls, True), rp[..., None])[..., 0]
            dq = wq - jnp.einsum("kbp,p->kb", Yq, dp)
            return (jnp.zeros((n,), dtype).at[p_idx].set(dp)
                    .at[q_idx.reshape(-1)].set(dq.reshape(-1)))

        def al(r1_, r2_):
            dz = gsolve(r1_ + (JE.T @ r2_) / dd)
            return dz, (JE @ dz - r2_) / dd

        dz, v = al(r1, r2)
        for _ in range(2):
            res1 = W @ dz + JE.T @ v - r1
            res2 = JE @ dz - 1e-8 * v - r2
            dzc, vc = al(res1, res2)
            dz, v = dz - dzc, v - vc
        return dz

    def stepC(r1b_, Hb_, JEb_, r2b_):
        return r1b_ + 1e-12 * jax.vmap(arrow_solve)(Hb_, JEb_, r1b_, r2b_)

    r1b = jax.random.normal(key, (B, n), dtype)
    tC = slope("C arrow KKT", stepC, r1b, Hb, JEb, r2b)

    # C2: JtJ alone
    def stepC2(r1b_, JEb_):
        def one(JE, r1_):
            return (JE.T @ JE) @ r1_
        return r1b_ + 1e-12 * jax.vmap(one)(JEb_, r1b_)

    tC2 = slope("C2 JtJ(+mv)", stepC2, r1b, JEb)

    # D: 16-candidate line search evals
    dzb = jax.random.normal(key, (B, n), dtype) * 0.001

    def stepD(zb_, *unused):
        def one(zv, data, dz):
            s0 = jnp.abs(cD_flat(zv, data)) + 0.1

            def trial(a):
                zt = zv + a * dz
                phi = f_flat(zt, data) - 0.1 * jnp.sum(jnp.log(s0))
                th = (jnp.sum(jnp.abs(cE_flat(zt, data)))
                      + jnp.sum(jnp.abs(cD_flat(zt, data) - s0)))
                return phi + th

            return jnp.sum(jax.vmap(trial)(0.5 ** jnp.arange(16, dtype=dtype)))
        return zb_ + 1e-12 * jax.vmap(one)(zb_, datab, dzb)[:, None]

    tD = slope("D line search", stepD, zb)

tot = tA + tB + tC + tD
print(f"\nA={tA*1e3:.2f} B={tB*1e3:.2f} C={tC*1e3:.2f} "
      f"(C2={tC2*1e3:.2f}) D={tD*1e3:.2f}  sum={tot*1e3:.1f} ms "
      f"vs measured ~22 ms/iter")
