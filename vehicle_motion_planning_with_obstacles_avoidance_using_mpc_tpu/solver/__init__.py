"""Interior-point NLP solver substrate (layer L0 of SURVEY.md)."""

from functools import partial

import jax

from .ipm import IPMOptions, IPMResult, build_solver
from ..models import obca as _obca
from ..models.obca import OBCAData, OBCASpec


def make_obca_solver(spec: OBCASpec, options: IPMOptions = IPMOptions(),
                     example_data: OBCAData = None):
    """Solver for one OBCA problem family.

    Returns ``solve(data: OBCAData, z0=None) -> IPMResult``. Cold-starts
    from the reference window by default (matching the reference's fresh
    CasADi problem per replan, src/obca.py:839-856). jit/vmap freely.
    """

    def f_fn(z, data):
        return _obca.objective(spec, data, z)

    def cE_fn(z, data):
        return _obca.eq_constraints(spec, data, z)

    def cI_fn(z, data):
        return _obca.ineq_constraints(spec, data, z)

    def cI_dense_fn(z, data):
        return _obca.ineq_constraints_dense(spec, data, z)

    def sgn_off_fn(data):
        return _obca.ineq_identity_sgn_off(spec, data)

    z_example = _obca.init_vars(spec, example_data or _dummy_data(spec))
    # variable scaling: positions ~ map scale, duals O(1), time scale O(10)
    import jax.numpy as jnp

    z_scale = jax.tree.map(jnp.ones_like, z_example)
    z_scale["x"] = z_scale["x"] * jnp.asarray([[10.0], [10.0], [3.0]])
    if "T" in z_scale:
        z_scale["T"] = z_scale["T"] * 30.0
    import numpy as np

    from ..models import obca_struct as _struct

    from jax.flatten_util import ravel_pytree

    lay, prov = _struct.make_provider(
        spec, np.asarray(ravel_pytree(z_scale)[0]))

    def provider(zv, data, sf, scE, scD, y, w_d):
        return prov(zv, data, sf, scE, scD, y, w_d)

    base = build_solver(
        f_fn, cE_fn, cI_fn, z_example, options, z_scale=z_scale,
        ineq_id=(_obca.ineq_identity_layout(spec), sgn_off_fn, cI_dense_fn),
        arrow=_obca.arrow_layout(spec),
        spine=_obca.hessian_spine_probes(spec),
        struct=(lay, provider),
    )

    def solve(data: OBCAData, z0=None):
        if z0 is None:
            z0 = _obca.init_vars(spec, data)
        return base(z0, data)

    # chunked-iteration API (data-first signatures; see solver/compact.py)
    def init(data: OBCAData, z0=None):
        if z0 is None:
            z0 = _obca.init_vars(spec, data)
        return base.init(z0, data)

    solve.init = init
    solve.iterate = lambda st, data, it_cap: base.iterate(st, data, it_cap)
    solve.finalize = lambda st, data: base.finalize(st, data)
    return solve


def _dummy_data(spec: OBCASpec):
    import jax.numpy as jnp

    N, nO, E = spec.N, spec.n_obs, spec.e_max
    zeros = jnp.zeros
    return OBCAData(
        x0=zeros(3), u0=zeros(2), xref=zeros((3, N + 1)),
        A=zeros((N + 1, nO, E, 2)), b=zeros((N + 1, nO, E)),
        edge_mask=zeros((nO, E)), obs_mask=zeros(nO),
        x_lo=zeros(2), x_hi=zeros(2), u_lo=zeros(2), u_hi=zeros(2),
        Q=zeros((3, 3)), R1=zeros((2, 2)), R2=zeros((2, 2)), P=zeros((3, 3)),
        Ts=zeros(()), dmin=zeros(()), ego_g=zeros(4), ego_offset=zeros(()),
        terminal_set=zeros((2, 2)), T_max=zeros(()), a_max=zeros(()),
        alpha_max=zeros(()), time_c1=zeros(()), time_c2=zeros(()),
        T_lo=zeros(()), obs_vel=zeros((nO, 2)),
    )


__all__ = ["IPMOptions", "IPMResult", "build_solver", "make_obca_solver"]
