"""Break down the block-arrow KKT solve cost (the 16.6 ms/iter hot spot).

Measures CUMULATIVE pipelines (each chained through a scalar so nothing
hoists out of the fori_loop); stage costs are the differences:

  P1: G = W + delta*I + J^T J / dd          (assembly + matmul)
  P2: P1 + block gathers (Gqq / Gpq / Gpp)
  P3: P2 + batched (K, 8, 8) Cholesky
  P4: P3 + Yq backsolve + Schur S + chol(S)
  P5: P4 + 3x gsolve + 2x dense refinement matvec  (the full solve)

Run on the axon TPU: python scripts/profile_arrow.py
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

from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.models import OBCASpec
from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.models import obca as M

B = int(os.environ.get("B", "256"))
N = 10
dev = (jax.devices(accel) if accel else jax.devices())[0]
dtype = jnp.float32
spec = OBCASpec(N=N, n_obs=6, e_max=4, variant="free")

q_idx = M.arrow_layout(spec)
K, bq = q_idx.shape
n = 1 + spec.n_k * spec.n_obs * (spec.e_max + 4) + 2 * N + 3 * (N + 1)
pmask = np.ones(n, bool)
pmask[q_idx.reshape(-1)] = False
p_idx = np.nonzero(pmask)[0]
mE = 156
print(f"device: {dev} batch={B} n={n} K={K} bq={bq} spine={p_idx.size}",
      flush=True)

key = jax.random.PRNGKey(0)
Wb = jax.random.normal(key, (B, n, n), dtype) * 0.001
Wb = Wb + jnp.swapaxes(Wb, 1, 2) + 3.0 * jnp.eye(n, dtype=dtype)
JEb = jax.random.normal(key, (B, mE, n), dtype) * 0.01
r2b = jax.random.normal(key, (B, mE), dtype)

REPS = (4, 20)


def slope(name, step_fn, z0, *extra):
    times = {}
    for r in REPS:
        def run(z, *ex):
            return jax.lax.fori_loop(0, r, lambda i, zz: step_fn(zz, *ex), z)

        jfn = jax.jit(run, device=dev)
        zz = jax.device_put(z0, dev)
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
    print(f"  [{name}] => {per*1e3:.2f} ms", flush=True)
    return per


def pipeline(stage):
    """Build the cumulative solve up to `stage`, chained via b."""

    def step(b, Wb_, JEb_, r2b_):
        def one(bv, W, JE, r2):
            # chain: scalar from bv perturbs the regularizer so every
            # iteration recomputes the whole pipeline
            eps = 1e-30 * jnp.sum(bv)
            out = jnp.asarray(0.0, dtype)
            JtJ = (JE.T @ JE) / 1e-2
            G = W + (1e-6 + eps) * jnp.eye(n, dtype=dtype) + JtJ
            out += G[0, 0]
            if stage >= 2:
                Gqq = G[q_idx[:, :, None], q_idx[:, None, :]]
                Gpq = G[p_idx[:, None, None], q_idx[None, :, :]]
                Gpp = G[p_idx[:, None], p_idx[None, :]]
                out += Gqq[0, 0, 0] + Gpq[0, 0, 0] + Gpp[0, 0]
            if stage >= 3:
                Lq = jnp.linalg.cholesky(Gqq)
                out += jnp.sum(Lq[:, 0, 0])
            if stage >= 4:
                Gqp = jnp.transpose(Gpq, (1, 2, 0))
                Yq = jax.scipy.linalg.cho_solve((Lq, True), Gqp)
                S = Gpp - jnp.einsum("pkb,kbq->pq", Gpq, Yq)
                Ls = jnp.linalg.cholesky(S)
                out += jnp.sum(Ls[0])
            if stage >= 5:
                def gsolve(b_):
                    bq_ = b_[q_idx]
                    wq = jax.scipy.linalg.cho_solve(
                        (Lq, True), bq_[..., None])[..., 0]
                    rp = b_[p_idx] - jnp.einsum("pkb,kb->p", Gpq, wq)
                    dp = jax.scipy.linalg.cho_solve(
                        (Ls, True), rp[..., None])[..., 0]
                    dq = wq - jnp.einsum("kbp,p->kb", Yq, dp)
                    return (jnp.zeros((n,), dtype).at[p_idx].set(dp)
                            .at[q_idx.reshape(-1)].set(dq.reshape(-1)))

                def al(r1_, r2_):
                    dz = gsolve(r1_ + (JE.T @ r2_) / 1e-2)
                    return dz, (JE @ dz - r2_) / 1e-2

                dz, v = al(bv, r2)
                for _ in range(2):
                    res1 = W @ dz + JE.T @ v - bv
                    res2 = JE @ dz - 1e-8 * v - r2
                    dzc, vc = al(res1, res2)
                    dz, v = dz - dzc, v - vc
                out += jnp.sum(dz)
            return bv + 1e-9 * out

        return jax.vmap(one)(b, Wb_, JEb_, r2b_)

    return step


bvec = jax.random.normal(key, (B, n), dtype)
ts = {}
for stage, name in ((1, "P1 assembly"), (2, "P2 +gathers"),
                    (3, "P3 +chol Gqq"), (4, "P4 +Yq/Schur"),
                    (5, "P5 full solve")):
    ts[stage] = slope(name, pipeline(stage), bvec, Wb, JEb, r2b)

print("\nstage costs (ms):")
print(f"  assembly      {ts[1]*1e3:7.2f}")
print(f"  gathers       {(ts[2]-ts[1])*1e3:7.2f}")
print(f"  chol Gqq      {(ts[3]-ts[2])*1e3:7.2f}")
print(f"  Yq/Schur      {(ts[4]-ts[3])*1e3:7.2f}")
print(f"  solves+refine {(ts[5]-ts[4])*1e3:7.2f}")
print(f"  total         {ts[5]*1e3:7.2f}")
