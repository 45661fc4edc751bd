"""Micro-bench the two factorization kernels at 1-rung vs 2-rung shapes
on the TPU — isolates the n_deltas=2 cost blowup seen in exp_r5_prof.

Usage: JAX_PLATFORMS=cpu,axon python scripts/exp_r5_micro.py
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
    if _plat == "axon":
        jax.config.update("jax_platforms", "cpu,axon")
        accel = "axon"
    else:
        jax.config.update("jax_platforms", "cpu")
        accel = None
    import jax.numpy as jnp
    import numpy as np

    from vehicle_motion_planning_with_obstacles_avoidance_using_mpc_tpu.solver.ipm import (
        _chol_inv_small, _spd_inv,
    )

    dev = (jax.devices(accel) if accel else jax.devices())[0]
    B = 1024
    rng = np.random.RandomState(0)

    def spd(*shape):
        m = shape[-1]
        A = rng.randn(*shape).astype(np.float32) * 0.1
        A = A + np.swapaxes(A, -1, -2) + 4.0 * np.eye(m, dtype=np.float32)
        return jax.device_put(jnp.asarray(A), dev)

    def bench(name, fn, x, reps=30):
        f = jax.jit(fn, device=dev)
        r = np.asarray(f(x))[..., 0, 0]
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            for _ in range(reps):
                out = f(x)
            _ = np.asarray(out)[..., 0, 0]
            best = min(best, (time.time() - t0) / reps)
        print(f"[{name:34s}] {best*1e3:7.3f} ms", flush=True)
        return best

    with jax.default_matmul_precision("highest"):
        for d in (1, 2):
            bench(f"chol_inv_small (B,{d},24,8,8)", _chol_inv_small,
                  spd(B, d, 24, 8, 8))
        for d in (1, 2):
            bench(f"spd_inv (B,{d},34,34)", _spd_inv, spd(B, d, 34, 34))
        # the same spine inverse with the rung axis folded into batch
        bench("spd_inv (B*2,34,34)", _spd_inv, spd(B * 2, 34, 34))
        # einsum-heavy piece: Yq = Qinv @ Gqp at both rung widths
        G = jax.device_put(jnp.asarray(
            rng.randn(B, 24, 8, 4).astype(np.float32)), dev)
        for d in (1, 2):
            Q = spd(B, d, 24, 8, 8)
            bench(f"Yq einsum d={d}",
                  lambda q: jnp.einsum("bdkce,bkef->bdkcf", q,
                                       G)[..., 0:1, 0:1], Q)


if __name__ == "__main__":
    main()
