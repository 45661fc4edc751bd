"""Independent NLP oracle: scipy trust-constr on the exact same OBCA
problems the IPM solves.

CasADi/IPOPT (the reference's substrate, src/obca.py:1052-1056) is not
installable in this environment (no package, no network), so the
strongest available parity check is an *independent* general NLP solver
over the identical problem functions: scipy's trust-region interior
point (``trust-constr``) with exact JAX jacobians, in float64, from the
same warm start. Used by tests/test_oracle_parity.py to certify the
closed-loop trajectories step by step, and available for offline
diagnosis of any recorded problem (ClosedLoopRunner(record_problems=True)).
"""

from __future__ import annotations

import numpy as np


def solve_with_scipy(spec, data, x_init=None, maxiter=500, verbose=0):
    """Solve one OBCA NLP with scipy trust-constr.

    Args:
      spec/data: the problem exactly as the IPM sees it.
      x_init: optional (3, N+1) state-trajectory warm start (the same
        candidate the IPM's multistart used).
    Returns:
      (z dict pytree, scipy OptimizeResult).
    """
    import jax
    import jax.numpy as jnp
    from jax.flatten_util import ravel_pytree
    from scipy.optimize import NonlinearConstraint, minimize

    from ..models import obca as M

    f64 = jnp.float64
    data = jax.tree.map(lambda a: jnp.asarray(a, f64), data)
    xi = None if x_init is None else jnp.asarray(x_init, f64)
    z0 = M.init_vars(spec, data, x_init=xi)
    z0f, unravel = ravel_pytree(z0)

    def _np(fn):
        jfn = jax.jit(fn)
        return lambda v: np.asarray(jfn(jnp.asarray(v, f64)))

    f = _np(lambda zf: M.objective(spec, data, unravel(zf)))
    g = _np(jax.grad(lambda zf: M.objective(spec, data, unravel(zf))))
    cE = _np(lambda zf: M.eq_constraints(spec, data, unravel(zf)))
    JE = _np(jax.jacrev(lambda zf: M.eq_constraints(spec, data, unravel(zf))))
    cI = _np(lambda zf: M.ineq_constraints(spec, data, unravel(zf)))
    JI = _np(jax.jacrev(lambda zf: M.ineq_constraints(spec, data, unravel(zf))))

    mE = cE(np.asarray(z0f)).shape[0]
    res = minimize(
        fun=lambda v: float(f(v)),
        x0=np.asarray(z0f, np.float64),
        jac=g,
        method="trust-constr",
        constraints=[
            NonlinearConstraint(cE, np.zeros(mE), np.zeros(mE), jac=JE),
            NonlinearConstraint(cI, 0.0, np.inf, jac=JI),
        ],
        options={"maxiter": maxiter, "gtol": 1e-9, "xtol": 1e-12,
                 "verbose": verbose},
    )
    return jax.tree.map(np.asarray, unravel(jnp.asarray(res.x, f64))), res
