"""The OBCA optimal-control NLP as pure, shape-static residual functions.

This is the mathematical re-statement of the reference's CasADi problem
builders (``src/obca.py``) for the three live variants (SURVEY.md 2.3):

  * ``free``        — time-optimal, terminal equality, obstacles frozen at
                      step 0 (``obca_mpc4``, src/obca.py:828-1071)
  * ``fix_terminal``— fixed Ts, terminal *set*, obstacles move across the
                      horizon (``obca_mpc6``, src/obca.py:1361-1562)
  * ``fix_free_end``— fixed Ts, no terminal constraint; the infeasibility
                      fallback (``obca_mpc8``, src/obca.py:1564-1758)

Shared structure (SURVEY.md 2.2): unicycle forward-Euler dynamics, quadratic
tracking + input + finite-difference acceleration + terminal costs, the
time cost ``sum 10*T + T^2`` (free), box/accel bounds, and per (k, obstacle)
the three OBCA conditions with duals lambda (per obstacle edge) and mu (per
ego face):
  1. || A_i^T lam_i ||^2 <= 1                        (src/obca.py:992-997)
  2. G^T mu_i + R(th)^T A_i^T lam_i = 0              (src/obca.py:1006-1011)
  3. -g^T mu_i + (A_i t(x_k) - b_i)^T lam_i >= dmin  (src/obca.py:1018-1042)

Obstacles are dense time-indexed tensors ``A[k, i, e, 2], b[k, i, e]`` with
validity masks instead of the reference's ragged row cursor
(src/obca.py:968-981): the ``free`` variant passes ``A[k] = A[0]`` (frozen),
the fix variants pass moving tensors — reproducing the cursor-reset
difference between variants exactly (SURVEY.md 2.2 "critical indexing
semantics").

Masking scheme (what makes one compiled shape serve every demo):
  * inactive obstacle / padded edge duals are pulled to zero by a quadratic
    penalty in the objective (keeps the KKT system nonsingular — no
    degenerate constraint rows),
  * their stationarity rows degrade to ``mu0 - mu2 = 0`` / ``mu1 - mu3 = 0``
    (full-rank, satisfied at zero),
  * their inequality rows become the constant ``1 >= 0``.

Everything is traced: `vmap` over a batch of OBCAData gives batched NLPs.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class OBCASpec:
    """Static problem shape — a jit static argument / cache key.

    Variants (SURVEY.md 2.3 mapping to the reference's solver methods):
      'free'         — time-optimal, terminal equality (obca_mpc4,
                       src/obca.py:828; with a moving-obstacle data tensor
                       it is obca2's free mode, src/obca.py:338)
      'fix_terminal' — fixed Ts, terminal set (obca_mpc6, :1361)
      'fix_free_end' — fixed Ts, no terminal (obca_mpc8 fallback, :1564)
      'fix_eq_band'  — fixed Ts, terminal position equality + heading band
                       |theta_N - thetaref_N| <= theta_band (the legacy
                       ``obca`` fix mode's pos-eq + pi/4 band, :220-225)
    Orthogonal switches:
      coupled_motion — obstacle translation over the horizon computed
                       in-graph as k * Ts * T * vel (free time): the
                       intent of the dead ``obca_mpc_dyn`` (:1760), which
                       carried symbolic vertex trajectories; here it is a
                       b-vector offset since translation preserves A.
      theta_band     — the band half-width for 'fix_eq_band'.
    obca/obca2's 'timeScale_size' and obca_mpc7's [0.8, 1.2] Topt boxes
    (:234-240, :1207) are data, not shape: set OBCAData.T_lo / T_max.
    obca_mpc3's lambda-only mode (:777-799) is an incomplete OBCA
    (drops stationarity condition 2) — a defect, deliberately not
    replicated (SURVEY.md 2.5).
    """

    N: int
    n_obs: int
    e_max: int
    variant: str  # 'free' | 'fix_terminal' | 'fix_free_end' | 'fix_eq_band'
    nx: int = 3
    nu: int = 2
    # Tiny proximal term on the active OBCA duals. The (lambda, mu)
    # multipliers of a polytope contact are not unique (LICQ fails at
    # face-to-face contacts), which lets interior-point duals run off along
    # a degenerate ray; this selects the minimum-norm multiplier while
    # perturbing the trajectory only at O(dual_reg) — the standard
    # "relaxed OBCA" device.
    dual_reg: float = 1e-6
    coupled_motion: bool = False
    theta_band: float = 0.7853981633974483  # pi/4, src/obca.py:224-225
    # Impose the OBCA collision block at k = 0 like the reference
    # (src/obca.py:968 loops k = 0..N). x_0 is pinned by the initial
    # equality, so that block only *re-certifies* the current pose: it
    # adds nO*(E+4) duals that are decoupled from the trajectory, and at
    # poses hugging an obstacle (every step of wall-following) they are
    # exactly the degenerate contact multipliers that stall convergence.
    # Default False: smaller and better-behaved NLP; the k = 0 pose is
    # instead certified geometrically by the runtime (it was reached
    # through a dmin-feasible solve). Equivalence of the encodings
    # (tests/test_variants.py): free-time solves produce identical
    # trajectories within solver tolerance; on *near-contact fix-time*
    # windows the Q_fix = 0.001 cost landscape is nearly flat and the
    # k = 0 block's degenerate duals can tip the solve to a different —
    # equally feasible, dmin-separated — flat optimum (measured demo1
    # k = 9), which is the same run-to-run sensitivity IPOPT exhibits
    # on these windows.
    obca_k0: bool = False

    def __post_init__(self):
        assert self.variant in (
            "free", "fix_terminal", "fix_free_end", "fix_eq_band"
        )
        if self.coupled_motion:
            assert self.variant == "free", "coupled motion needs free time"

    @property
    def free_time(self):
        return self.variant == "free"

    @property
    def k_lo(self):
        """First horizon step carrying OBCA duals/constraints."""
        return 0 if self.obca_k0 else 1

    @property
    def n_k(self):
        """Number of horizon steps carrying OBCA duals/constraints."""
        return self.N + 1 - self.k_lo


class OBCAData(NamedTuple):
    """Traced per-problem data; vmap over a leading batch axis."""

    x0: jnp.ndarray          # (3,)
    u0: jnp.ndarray          # (2,) previous applied input (accel anchor)
    xref: jnp.ndarray        # (3, N+1)
    A: jnp.ndarray           # (N+1, nO, E, 2) hyperplane normals per step
    b: jnp.ndarray           # (N+1, nO, E)
    edge_mask: jnp.ndarray   # (nO, E)
    obs_mask: jnp.ndarray    # (nO,)
    x_lo: jnp.ndarray        # (2,)
    x_hi: jnp.ndarray        # (2,)
    u_lo: jnp.ndarray        # (2,)
    u_hi: jnp.ndarray        # (2,)
    Q: jnp.ndarray           # (3, 3)
    R1: jnp.ndarray          # (2, 2)
    R2: jnp.ndarray          # (2, 2)
    P: jnp.ndarray           # (3, 3)
    Ts: jnp.ndarray          # ()
    dmin: jnp.ndarray        # ()
    ego_g: jnp.ndarray       # (4,) [L/2, W/2, L/2, W/2]
    ego_offset: jnp.ndarray  # () (ego0+ego2)/2 - ego2
    terminal_set: jnp.ndarray  # (2, 2) rows: x/y, cols: lo/hi
    T_max: jnp.ndarray       # () free-time upper bound on the time scale
    a_max: jnp.ndarray       # ()
    alpha_max: jnp.ndarray   # ()
    time_c1: jnp.ndarray     # ()
    time_c2: jnp.ndarray     # ()
    T_lo: jnp.ndarray        # () free-time lower bound (src/obca.py:963
    #                            default 1e-4; obca_mpc7 uses 0.8, :1207)
    obs_vel: jnp.ndarray     # (nO, 2) world velocity, used only under
    #                            spec.coupled_motion (in-graph prediction)


_PIN_RHO = 1.0  # curvature of the padded-dual zero penalty
_T_MIN = 1e-4   # src/obca.py:963 lower Topt bound


def init_vars(spec: OBCASpec, data: OBCAData, x_init=None, warm_duals=True,
              lam_init=None, mu_init=None):
    """Initial variables for a solve.

    The reference cold-starts every replan (CasADi zeros, Topt init 1,
    src/obca.py:856) and leans on IPOPT's globalization. Here the hierarchy
    itself provides the globalization: states start on the (collision-free)
    reference window, the time scale starts at its reachability estimate,
    inputs at the implied velocities, and the OBCA duals at their analytic
    geometric values (:func:`init_duals`) — solution-equivalent, but it
    turns a pathologically nonconvex cold start into a near-local problem.

    Args:
      x_init: optional (3, N+1) state guess; defaults to the reference
        window with column 0 forced to x0.
      lam_init/mu_init: optional explicit OBCA dual initializations
        ((n_k, nO, E) / (n_k, nO, 4)) overriding the geometric warm
        start — used by the receding-horizon loop to shift-warm-start
        from the previous step's converged multipliers.
    """
    dtype = data.x0.dtype
    N = spec.N
    x = data.xref.at[:, 0].set(data.x0) if x_init is None else jnp.asarray(x_init, dtype)

    if spec.free_time:
        # time scale from reachability: steps of length v_max*T*Ts must
        # cover the largest inter-knot gap
        gaps = jnp.sqrt(jnp.sum(jnp.diff(x[:2], axis=1) ** 2, axis=0) + 1e-12)
        v_cap = 0.9 * data.u_hi[0]
        T0 = jnp.clip(jnp.max(gaps) / (v_cap * data.Ts), 1.0, data.T_max)
        dt = T0 * data.Ts
    else:
        T0 = None
        dt = data.Ts

    v0 = jnp.sqrt(jnp.sum(jnp.diff(x[:2], axis=1) ** 2, axis=0) + 1e-12) / dt
    v0 = jnp.clip(v0, data.u_lo[0], data.u_hi[0])
    w0 = jnp.clip(jnp.diff(x[2]) / dt, data.u_lo[1], data.u_hi[1])
    u = jnp.stack([v0, w0])

    if lam_init is not None:
        lam_mask, obs_mask = _dual_masks(spec, data)
        lam = jnp.asarray(lam_init, dtype) * lam_mask[None]
        mu = jnp.asarray(mu_init, dtype) * obs_mask[None, :, None]
    elif warm_duals:
        lam, mu = init_duals(spec, data, x)
    else:
        lam = jnp.zeros((spec.n_k, spec.n_obs, spec.e_max), dtype)
        mu = jnp.zeros((spec.n_k, spec.n_obs, 4), dtype)

    z = {"x": x, "u": u, "lam": lam, "mu": mu}
    if spec.free_time:
        z["T"] = T0
    return z


def init_duals(spec: OBCASpec, data: OBCAData, x):
    """Analytic dual warm start from the trajectory geometry.

    For each (k, obstacle) pick the hyperplane most separating the ego
    translation point t(x_k) (argmax of A_j t - b_j over real edges), put
    the whole lambda weight kappa/||A_j|| on it so ||A^T lam|| = kappa < 1,
    and recover mu >= 0 from the stationarity rows
    (mu0 - mu2, mu1 - mu3) = -R(th)^T A^T lam  via positive/negative parts.
    This is the standard dual warm start for OBCA problems (cf. the
    H-OBCA approach); the reference instead cold-starts and leans on
    IPOPT's globalization.

    Args:
      x: (3, N+1) initial state trajectory.
    Returns:
      (lam (n_k, nO, E), mu (n_k, nO, 4)) respecting all masks; steps
      below spec.k_lo carry no duals.
    """
    kappa = 0.9
    kl = spec.k_lo
    x = x[:, kl:]
    A = data.A[kl:]
    b = data.b[kl:]
    lam_mask = data.edge_mask * data.obs_mask[:, None]    # (nO, E)
    tx = x[0] + jnp.cos(x[2]) * data.ego_offset           # (n_k,)
    ty = x[1] + jnp.sin(x[2]) * data.ego_offset
    t = jnp.stack([tx, ty], axis=-1)                      # (n_k, 2)
    # signed "violation" of each hyperplane by t: positive = separating
    At_b = jnp.einsum("kied,kd->kie", A, t) - b            # (n_k, nO, E)
    norms = jnp.linalg.norm(A, axis=-1)                    # (n_k, nO, E)
    score = jnp.where(lam_mask[None] > 0, At_b / jnp.maximum(norms, 1e-9), -jnp.inf)
    best = jnp.argmax(score, axis=-1)                      # (N+1, nO)
    onehot = jax.nn.one_hot(best, spec.e_max, dtype=x.dtype)
    lam = onehot * kappa / jnp.maximum(norms, 1e-9) * lam_mask[None]
    q1 = jnp.einsum("kied,kie->kid", A, lam)               # (n_k, nO, 2)
    c = jnp.cos(x[2])[:, None]
    s = jnp.sin(x[2])[:, None]
    p = -(c * q1[..., 0] + s * q1[..., 1])
    q = -(-s * q1[..., 0] + c * q1[..., 1])
    mu = jnp.stack(
        [jax.nn.relu(p), jax.nn.relu(q), jax.nn.relu(-p), jax.nn.relu(-q)],
        axis=-1,
    ) * data.obs_mask[None, :, None]
    return lam, mu


def _dual_masks(spec, data):
    lam_mask = data.edge_mask * data.obs_mask[:, None]          # (nO, E)
    return lam_mask, data.obs_mask


def _obca_terms(spec, data, z):
    """Shared per-(k, i) quantities.

    q1[k, i] = A[k, i]^T lam[k, i]  (2-vector)

    Under ``spec.coupled_motion`` the obstacle offsets move in-graph with
    the *optimized* time scale: b_k = b + A (k * Ts * T * vel) — the
    translation-only restatement of obca_mpc_dyn's symbolic vertex
    trajectories (src/obca.py:1792-1802, 1961-1964).
    """
    lam = z["lam"]  # (n_k, nO, E)
    kl = spec.k_lo
    A = data.A[kl:]
    b = data.b[kl:]
    if spec.coupled_motion:
        ks = jnp.arange(kl, spec.N + 1, dtype=b.dtype)
        delta = (ks[:, None, None] * (data.Ts * z["T"])
                 * data.obs_vel[None])                  # (n_k, nO, 2)
        b = b + jnp.einsum("kied,kid->kie", A, delta)
    q1 = jnp.einsum("kied,kie->kid", A, lam)            # (n_k, nO, 2)
    blam = jnp.einsum("kie,kie->ki", b, lam)            # (n_k, nO)
    return q1, blam


def objective(spec: OBCASpec, data: OBCAData, z) -> jnp.ndarray:
    x, u = z["x"], z["u"]
    N = spec.N
    dx = x[:, :N] - data.xref[:, :N]
    cost_x = jnp.einsum("it,ij,jt->", dx, data.Q, dx)
    cost_u = jnp.einsum("it,ij,jt->", u, data.R1, u)

    dt = (z["T"] * data.Ts) if spec.free_time else data.Ts
    du = jnp.concatenate([(u[:, :1] - data.u0[:, None]), jnp.diff(u, axis=1)], axis=1)
    dudt = du / dt
    cost_acc = jnp.einsum("it,ij,jt->", dudt, data.R2, dudt)

    dN = x[:, N] - data.xref[:, N]
    cost_term = dN @ data.P @ dN

    total = cost_x + cost_u + cost_acc + cost_term

    if spec.free_time:
        # sum over t of c1*T + c2*T^2 with uniform T (src/obca.py:887-888)
        total = total + (N + 1) * (data.time_c1 * z["T"] + data.time_c2 * z["T"] ** 2)

    # padded-dual pin penalty (see module docstring)
    lam_mask, obs_mask = _dual_masks(spec, data)
    pin = jnp.sum(((1.0 - lam_mask)[None] * z["lam"]) ** 2) + jnp.sum(
        ((1.0 - obs_mask)[None, :, None] * z["mu"]) ** 2
    )
    # minimum-norm selection among degenerate contact multipliers
    prox = jnp.sum((lam_mask[None] * z["lam"]) ** 2) + jnp.sum(
        (obs_mask[None, :, None] * z["mu"]) ** 2
    )
    return total + 0.5 * _PIN_RHO * pin + 0.5 * spec.dual_reg * prox


def eq_constraints(spec: OBCASpec, data: OBCAData, z) -> jnp.ndarray:
    """Stacked equality residuals (== 0)."""
    x, u = z["x"], z["u"]
    N = spec.N
    dt = (z["T"] * data.Ts) if spec.free_time else data.Ts

    th = x[2, :N]
    dyn = jnp.stack(
        [
            x[0, 1:] - x[0, :N] - dt * u[0] * jnp.cos(th),
            x[1, 1:] - x[1, :N] - dt * u[0] * jnp.sin(th),
            x[2, 1:] - x[2, :N] - dt * u[1],
        ]
    )  # (3, N)

    init = x[:, 0] - data.x0

    parts = [dyn.reshape(-1), init]
    if spec.variant == "free":
        parts.append(x[:, N] - data.xref[:, N])  # src/obca.py:951
    elif spec.variant == "fix_eq_band":
        # legacy obca fix mode: terminal position equality, heading free
        # within a band handled in the inequalities (src/obca.py:220-223)
        parts.append(x[:2, N] - data.xref[:2, N])

    # OBCA stationarity, masked as described in the module docstring
    q1, _ = _obca_terms(spec, data, z)
    mu = z["mu"]  # (n_k, nO, 4)
    cth = jnp.cos(x[2, spec.k_lo:])[:, None]
    sth = jnp.sin(x[2, spec.k_lo:])[:, None]
    m = data.obs_mask[None, :]
    g1 = (mu[:, :, 0] - mu[:, :, 2]) + m * (cth * q1[:, :, 0] + sth * q1[:, :, 1])
    g2 = (mu[:, :, 1] - mu[:, :, 3]) + m * (-sth * q1[:, :, 0] + cth * q1[:, :, 1])
    parts.append(g1.reshape(-1))
    parts.append(g2.reshape(-1))
    return jnp.concatenate(parts)


def ineq_identity_layout(spec: OBCASpec):
    """Flat-z indices of the *identity* inequality rows — rows of the form
    ``sgn * z_flat[idx] + off >= 0`` (bound constraints). These are ~85%
    of all inequality rows (dual positivity + state/input/time boxes);
    declaring them lets the IPM build its Newton system with gathers and
    a diagonal scatter-add instead of dense Jacobian matmuls.

    Row order (must match :func:`ineq_identity_sgn_off`):
      lam (src/obca.py:957), mu (:958), x/y box (:916-917),
      u box (:922-923), T box (free, :961-963).

    Returns an int numpy index array into ``ravel_pytree(z)`` — the dict
    pytree flattens in sorted-key order ('T', 'lam', 'mu', 'u', 'x').
    """
    import numpy as np

    N, nO, E = spec.N, spec.n_obs, spec.e_max
    sizes = {}
    off = 0
    for key, shape in (
        [("T", ())] if spec.free_time else []
    ) + [("lam", (spec.n_k, nO, E)), ("mu", (spec.n_k, nO, 4)),
         ("u", (2, N)), ("x", (3, N + 1))]:
        cnt = int(np.prod(shape)) if shape else 1
        sizes[key] = (off, shape)
        off += cnt

    def idx_of(key, *coords):
        base, shape = sizes[key]
        if not shape:
            return base
        return base + int(np.ravel_multi_index(coords, shape))

    rows = []
    rows.extend(range(sizes["lam"][0], sizes["lam"][0] + spec.n_k * nO * E))
    rows.extend(range(sizes["mu"][0], sizes["mu"][0] + spec.n_k * nO * 4))
    for i in range(2):  # x/y lower then upper, per coordinate
        lo = [idx_of("x", i, t) for t in range(N + 1)]
        rows.extend(lo)
        rows.extend(lo)
    for i in range(2):
        lo = [idx_of("u", i, t) for t in range(N)]
        rows.extend(lo)
        rows.extend(lo)
    if spec.free_time:
        rows.extend([idx_of("T"), idx_of("T")])
    return np.asarray(rows, dtype=np.int64)


def arrow_layout(spec: OBCASpec):
    """Flat-z indices of the per-(k, obstacle) dual blocks — the KKT
    system's block-arrow structure.

    Every objective/constraint term couples at most ONE dual block
    ``{lam[k, i, :], mu[k, i, :]}`` with the trajectory variables
    (x, u, T): the OBCA stationarity rows g1/g2 touch (theta_k, lam_ki,
    mu_ki), the norm row touches lam_ki, the distance row
    (x_k, lam_ki, mu_ki[, T]), and the pin/prox penalties are diagonal.
    No term ever couples two distinct (k, i) blocks, so the condensed
    Newton matrix is block-arrow: eliminating the K = n_k * nO dual
    blocks (size E+4 each) by batched tiny Cholesky factorizations
    leaves a dense system over only the 3(N+1)+2N(+1) trajectory
    variables — the structured factorization SURVEY.md section 7 step 4
    calls for, replacing the O(n^3) dense KKT solve.

    Returns an int numpy array (K, E+4) of indices into
    ``ravel_pytree(z)`` (sorted-key order 'T', 'lam', 'mu', 'u', 'x').
    """
    import numpy as np

    nO, E = spec.n_obs, spec.e_max
    base_lam = 1 if spec.free_time else 0
    base_mu = base_lam + spec.n_k * nO * E
    K = spec.n_k * nO
    blk = np.arange(K)
    lam_idx = base_lam + blk[:, None] * E + np.arange(E)[None, :]
    mu_idx = base_mu + blk[:, None] * 4 + np.arange(4)[None, :]
    return np.concatenate([lam_idx, mu_idx], axis=1).astype(np.int64)


def hessian_spine_probes(spec: OBCASpec):
    """Grouped (star-colored) HVP probes for the *spine* block of the
    Lagrangian Hessian, plus the static gather/scatter maps that
    reassemble the arrow pieces from the probe outputs.

    Structure exploited (why summed probes are exact): the only
    nonlinearities are the unicycle dynamics ``dt*u*cos/sin(theta_k)``
    (src/obca.py:905-910 in the reference), the OBCA bilinear terms
    (block-local), and the free-time couplings through ``dt = T*Ts`` —
    so distinct horizon steps NEVER couple in the spine Hessian except
    through (a) the R2 acceleration band ``(u_t - u_{t-1})`` (distance-1
    in t) and (b) the dense T row/column. Hence:

      * one probe per state slot (all x_t / all y_t / all theta_t summed),
      * three probes per input slot (v_t, w_t by t mod 3 — the band),
      * one singleton probe for T (its whole row/col read directly).

    That is 9 + free probes instead of one per spine column (34 at N=5,
    54 at N=10) — the dominant per-iteration cost at small horizons.

    Returns a dict:
      probes:   (C, n) float64 — spine probe matrix (model knows n),
      scatter:  (M, 4) int — (dest_row_pos, dest_col_pos, probe, src_flat)
                quadruples with Hpp[r, c] = HV[probe][src_flat],
      pq_pos:   (S, K) int — spine position adjacent to each dual block
                per slot-group (x, y, theta[, T]),
      pq_group: (S,) int — the probe recovering that Hpq slice,
      p_idx:    (np,) int — the spine layout these maps assume (the
                solver asserts it matches its own arrow complement).
    """
    import numpy as np

    N, nO, E = spec.N, spec.n_obs, spec.e_max
    free = spec.free_time
    base_lam = 1 if free else 0
    base_mu = base_lam + spec.n_k * nO * E
    base_u = base_mu + spec.n_k * nO * 4
    base_x = base_u + 2 * N
    n = base_x + 3 * (N + 1)

    def u_flat(i, t):
        return base_u + i * N + t

    def x_flat(i, t):
        return base_x + i * (N + 1) + t

    p_list = ([0] if free else []) + list(range(base_u, base_x)) + list(
        range(base_x, n))
    pos = {f: i for i, f in enumerate(p_list)}

    groups = []
    g_of = {}

    def new_group(cols):
        for c in cols:
            g_of[c] = len(groups)
        groups.append(cols)

    for i in range(3):                      # g0=x, g1=y, g2=theta
        new_group([x_flat(i, t) for t in range(N + 1)])
    for i in range(2):                      # v, w: 3 colors each (R2 band)
        for m in range(3):
            new_group([u_flat(i, t) for t in range(N) if t % 3 == m])
    if free:
        new_group([0])                      # T: singleton, full row/col

    probes = np.zeros((len(groups), n))
    for g, cols in enumerate(groups):
        probes[g, cols] = 1.0

    quads = []

    def add(a, b):
        """Structural spine nonzero H[a, b] (neither is T): recovered
        from the probe containing b at row a (unambiguous: b is the only
        column of its group adjacent to a), mirrored by symmetry."""
        quads.append((pos[a], pos[b], g_of[b], a))
        quads.append((pos[b], pos[a], g_of[b], a))

    for t in range(N + 1):
        xs = [x_flat(i, t) for i in range(3)]
        for i in range(3):                  # Q/P same-step clique
            for j in range(i, 3):
                add(xs[i], xs[j])
        if t < N:
            add(xs[2], u_flat(0, t))        # dynamics (theta_t, v_t)
    for t in range(N):                      # R1/R2: same-step + band
        for i in range(2):
            for j in range(2):
                if j >= i:
                    add(u_flat(i, t), u_flat(j, t))
                if t + 1 < N:
                    add(u_flat(i, t), u_flat(j, t + 1))
    if free:
        gT = g_of[0]
        for p in p_list:                    # T row/col, incl. (T, T)
            quads.append((pos[p], pos[0], gT, p))
            if p != 0:
                quads.append((pos[0], pos[p], gT, p))

    K = spec.n_k * nO
    ks = spec.k_lo + np.arange(K) // nO     # block -> horizon step
    pq_pos = [[pos[x_flat(i, k)] for k in ks] for i in range(3)]
    pq_group = [0, 1, 2]
    if free:
        # exact for coupled_motion's (T, lam) coupling, zero otherwise
        pq_pos.append([pos[0]] * K)
        pq_group.append(g_of[0])

    return {
        "probes": probes,
        "scatter": np.asarray(quads, dtype=np.int64),
        "pq_pos": np.asarray(pq_pos, dtype=np.int64),
        "pq_group": np.asarray(pq_group, dtype=np.int64),
        "p_idx": np.asarray(p_list, dtype=np.int64),
    }


def ineq_identity_sgn_off(spec: OBCASpec, data: OBCAData):
    """(sgn, off) for the identity inequality rows, same order as
    :func:`ineq_identity_layout`. Masked dual rows get sgn = 0, off = 1
    (the constant ``1 >= 0`` row of the masking scheme)."""
    N = spec.N
    dtype = data.x0.dtype
    lam_mask, obs_mask = _dual_masks(spec, data)
    lam_m = jnp.broadcast_to(
        lam_mask[None], (spec.n_k,) + lam_mask.shape).reshape(-1)
    mu_m = jnp.broadcast_to(
        obs_mask[None, :, None], (spec.n_k, spec.n_obs, 4)
    ).reshape(-1)
    one = jnp.ones((), dtype)

    sgns = [lam_m, mu_m]
    offs = [1.0 - lam_m, 1.0 - mu_m]
    for i in range(2):
        np1 = jnp.ones((N + 1,), dtype)
        sgns.extend([np1, -np1])
        offs.extend([-data.x_lo[i] * np1, data.x_hi[i] * np1])
    for i in range(2):
        nn = jnp.ones((N,), dtype)
        sgns.extend([nn, -nn])
        offs.extend([-data.u_lo[i] * nn, data.u_hi[i] * nn])
    if spec.free_time:
        sgns.append(jnp.stack([one, -one]))
        offs.append(jnp.stack([-data.T_lo, data.T_max]))
    return jnp.concatenate(sgns), jnp.concatenate(offs)


def ineq_constraints_dense(spec: OBCASpec, data: OBCAData, z) -> jnp.ndarray:
    """The non-bound inequality rows: acceleration limits, terminal set,
    and the OBCA norm/distance conditions."""
    x, u = z["x"], z["u"]
    N = spec.N
    _, obs_mask = _dual_masks(spec, data)
    one = jnp.asarray(1.0, x.dtype)
    parts = []

    # acceleration bounds (src/obca.py:928-939), scaled through by the
    # positive dt to stay polynomial — identical feasible set
    dt = (z["T"] * data.Ts) if spec.free_time else data.Ts
    du = jnp.concatenate([(data.u0[:, None] - u[:, :1]), u[:, :-1] - u[:, 1:]], axis=1)
    parts.append(data.a_max * dt - du[0])
    parts.append(du[0] + data.a_max * dt)
    parts.append(data.alpha_max * dt - du[1])
    parts.append(du[1] + data.alpha_max * dt)

    if spec.variant == "fix_terminal":
        # terminal set (src/obca.py:1465-1466)
        parts.append(jnp.reshape(x[0, N] - data.terminal_set[0, 0], (1,)))
        parts.append(jnp.reshape(x[1, N] - data.terminal_set[1, 0], (1,)))
        parts.append(jnp.reshape(data.terminal_set[1, 1] - x[1, N], (1,)))
    elif spec.variant == "fix_eq_band":
        # heading band around the terminal reference (src/obca.py:224-225)
        dth = x[2, N] - data.xref[2, N]
        parts.append(jnp.reshape(spec.theta_band - dth, (1,)))
        parts.append(jnp.reshape(dth + spec.theta_band, (1,)))

    # OBCA norm + distance rows, masked -> constant 1
    q1, blam = _obca_terms(spec, data, z)
    m = obs_mask[None, :]
    norm_row = jnp.where(m > 0, 1.0 - jnp.sum(q1 * q1, axis=-1), one)
    parts.append(norm_row.reshape(-1))

    gmu = jnp.einsum("g,kig->ki", data.ego_g, z["mu"])
    kl = spec.k_lo
    tx = x[0, kl:] + jnp.cos(x[2, kl:]) * data.ego_offset
    ty = x[1, kl:] + jnp.sin(x[2, kl:]) * data.ego_offset
    dist = -gmu + tx[:, None] * q1[:, :, 0] + ty[:, None] * q1[:, :, 1] - blam
    dist_row = jnp.where(m > 0, dist - data.dmin, one)
    parts.append(dist_row.reshape(-1))

    return jnp.concatenate(parts)


def ineq_constraints(spec: OBCASpec, data: OBCAData, z) -> jnp.ndarray:
    """Stacked inequality residuals (>= 0): identity (bound) rows first,
    then the dense rows — consistent with the layout/sgn-off helpers."""
    from jax.flatten_util import ravel_pytree

    zflat, _ = ravel_pytree(z)
    idx = ineq_identity_layout(spec)
    sgn, off = ineq_identity_sgn_off(spec, data)
    id_rows = sgn * zflat[idx] + off
    return jnp.concatenate([id_rows, ineq_constraints_dense(spec, data, z)])


def signed_clearance(spec: OBCASpec, data: OBCAData, z):
    """The per-(k, i) OBCA distance value (>= dmin when separated), for
    diagnostics / property tests."""
    q1, blam = _obca_terms(spec, data, z)
    x = z["x"][:, spec.k_lo:]
    gmu = jnp.einsum("g,kig->ki", data.ego_g, z["mu"])
    tx = x[0] + jnp.cos(x[2]) * data.ego_offset
    ty = x[1] + jnp.sin(x[2]) * data.ego_offset
    return -gmu + tx[:, None] * q1[:, :, 0] + ty[:, None] * q1[:, :, 1] - blam
