"""Structured multi-start for the OBCA solves.

The reference cold-starts every NLP and relies on IPOPT's restoration
phase to escape initializations that penetrate (predicted) obstacles
(src/obca.py:839-856 — CasADi zeros). The TPU-idiomatic equivalent of that
robustness is breadth instead of depth: solve the same problem from a
small set of structured initial trajectories *in one vmapped batch* —
essentially free on a TPU — and keep the best feasible result:

  * the reference window itself (collision-free wrt static obstacles),
  * the previous open-loop plan shifted by one step (classic MPC warm
    start),
  * a brake trajectory (stay at x0 — always dynamically feasible, proves
    "wait for the obstacle to pass" maneuvers),
  * dodge-below / dodge-above variants that push the window out of the
    predicted union of sensed dynamic obstacles.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def candidate_inits(xref, x0, dyn_boxes=None, y_bounds=None, prev_plan=None,
                    clearance=0.85):
    """Build the list of (3, N+1) initial state trajectories.

    Args:
      xref: (3, N+1) reference window.
      x0: (3,) current state.
      dyn_boxes: optional (N+1, 4) [xmin, ymin, xmax, ymax] of the union of
        sensed dynamic obstacles per horizon step (None -> no dodges).
      y_bounds: (lo, hi) drivable y band for dodge clipping.
      prev_plan: optional (3, N+1) previous open-loop plan.

    Returns list of np arrays, each (3, N+1), first column == x0.
    """
    xref = np.asarray(xref, float)
    x0 = np.asarray(x0, float)
    N = xref.shape[1] - 1
    out = []

    def with_theta(xy):
        dx = np.diff(xy[0])
        dy = np.diff(xy[1])
        th = np.arctan2(dy, dx)
        # keep the previous heading across zero-length segments
        for i in range(len(th)):
            if dx[i] == 0 and dy[i] == 0:
                th[i] = th[i - 1] if i > 0 else x0[2]
        th = np.concatenate([th, th[-1:]])
        tr = np.vstack([xy, th[None]])
        tr[:, 0] = x0
        return tr

    base = xref.copy()
    base[:, 0] = x0
    out.append(base)

    if prev_plan is not None:
        p = np.asarray(prev_plan, float)
        shifted = np.concatenate([p[:, 1:], p[:, -1:]], axis=1)
        shifted[:, 0] = x0
        out.append(shifted)

    brake = np.tile(x0[:, None], (1, N + 1))
    out.append(brake)

    if dyn_boxes is not None:
        boxes = np.asarray(dyn_boxes, float)
        for mode in ("below", "above"):
            xy = xref[:2].copy()
            for k in range(N + 1):
                xmin, ymin, xmax, ymax = boxes[k]
                if xmin - 3.0 <= xy[0, k] <= xmax + 3.0:
                    if mode == "below":
                        xy[1, k] = min(xy[1, k], ymin - clearance)
                    else:
                        xy[1, k] = max(xy[1, k], ymax + clearance)
            if y_bounds is not None:
                xy[1] = np.clip(xy[1], y_bounds[0] + clearance,
                                y_bounds[1] - clearance)
            out.append(with_theta(xy))

    return out


def candidate_inits_traced(xref, x0, dyn_boxes=None, y_bounds=None,
                           prev_plan=None, clearance=0.85, theta0=None):
    """Fully-traced version of :func:`candidate_inits` for the scanned
    closed loop: returns a stacked (nC, 3, N+1) array. nC = 3 without
    dodges (window / shifted prev / brake), 5 with.
    """
    xref = jnp.asarray(xref)
    x0 = jnp.asarray(x0)
    N = xref.shape[1] - 1

    def with_theta(xy):
        dx = jnp.diff(xy[0])
        dy = jnp.diff(xy[1])
        deg = (dx == 0) & (dy == 0)
        th_raw = jnp.arctan2(dy, dx)

        def carry(prev, pair):
            t, d = pair
            t_eff = jnp.where(d, prev, t)
            return t_eff, t_eff

        # carry init must match th_raw's dtype exactly (an f32 x0 with
        # an f64 xref under jax_enable_x64 otherwise trips the scan
        # carry-type check)
        _, th = jax.lax.scan(carry, jnp.asarray(x0[2], th_raw.dtype),
                             (th_raw, deg))
        tr = jnp.concatenate([xy, jnp.concatenate([th, th[-1:]])[None]], axis=0)
        return tr.at[:, 0].set(x0)

    base = xref.at[:, 0].set(x0)
    if prev_plan is None:
        prev_plan = base
    shifted = jnp.concatenate([prev_plan[:, 1:], prev_plan[:, -1:]], axis=1)
    shifted = shifted.at[:, 0].set(x0)
    brake = jnp.tile(x0[:, None], (1, N + 1))
    cands = [base, shifted, brake]

    if dyn_boxes is not None:
        boxes = jnp.asarray(dyn_boxes)  # (N+1, 4), +-inf rows when no obs
        in_x = (xref[0] >= boxes[:, 0] - 3.0) & (xref[0] <= boxes[:, 2] + 3.0)
        have = jnp.isfinite(boxes[:, 1])
        lo = jnp.asarray(y_bounds[0]) + clearance
        hi = jnp.asarray(y_bounds[1]) - clearance
        y_below = jnp.where(in_x & have,
                            jnp.minimum(xref[1], boxes[:, 1] - clearance), xref[1])
        y_above = jnp.where(in_x & have,
                            jnp.maximum(xref[1], boxes[:, 3] + clearance), xref[1])
        for yy in (y_below, y_above):
            xy = jnp.stack([xref[0], jnp.clip(yy, lo, hi)])
            cands.append(with_theta(xy))
    return jnp.stack(cands)


def make_multistart_solver(spec, solve, init_vars_fn, n_candidates,
                           warm_cands=(0, 1)):
    """Wrap a single-problem solver into an n-candidate multi-start.

    Returns ``msolve(data, x_inits (nC, 3, N+1)) -> (result_tree, best_idx)``
    where result_tree is the selected single IPMResult. jit-compiled once
    per (spec, n_candidates).

    The optional third argument ``skip`` is a traced scalar bool: a skipped problem's solver
    state starts ``done`` and contributes ZERO iterations to the vmapped
    ``while_loop``'s trip count (it returns the meaningless z0 payload
    with ``feas=False`` — the caller masks it out). This is how the
    fallback rungs of the mpc6→mpc8 ladder (src/closed_loop.py:393-398)
    and the unused mode branch of the scanned loop stop convoying the
    batch: the host driver skips them with Python control flow
    (closed_loop.py:355-373); under ``vmap``/``scan`` the skip must be a
    masked ``done`` instead.

    The optional ``warm=(lam0, mu0)`` argument shift-warm-starts the OBCA
    duals of the candidates in ``warm_cands`` (default: the window and
    shifted-previous-plan candidates, whose trajectories extend the
    previous step's plan) from the previous replan's converged
    multipliers; the remaining candidates keep the geometric
    ``init_duals``. The reference cold-starts every replan
    (src/obca.py:839-856); warm duals cut the iteration count of the
    receding-horizon hot path.
    """

    warm_mask = np.zeros(n_candidates, bool)
    warm_mask[[c for c in warm_cands if c < n_candidates]] = True

    def msolve(data, x_inits, skip=None, warm=None, z_override=None):
        def one(x_init, use_warm, is_c0):
            z0 = init_vars_fn(spec, data, x_init=x_init)
            if warm is not None:
                # masked per-candidate dual selection keeps the candidate
                # axis inside ONE vmapped while_loop (a Python branch per
                # candidate would compile 5 sequential loops). warm is
                # (lam, mu) or (lam, mu, valid) — `valid` gates out steps
                # with no usable predecessor (k = 0 carries zeros).
                uw = use_warm if len(warm) < 3 else (use_warm & warm[2])
                z0w = init_vars_fn(spec, data, x_init=x_init,
                                   lam_init=warm[0], mu_init=warm[1])
                z0 = {**z0,
                      "lam": jnp.where(uw, z0w["lam"], z0["lam"]),
                      "mu": jnp.where(uw, z0w["mu"], z0["mu"])}
            if z_override is not None:
                # candidate 0 starts from a FULL iterate of a sibling
                # solve (e.g. the mpc8 fallback from mpc6's solution —
                # the same NLP minus the terminal rows, so the sibling's
                # primal + OBCA duals are a near-solution polish start;
                # the remaining candidates keep ladder robustness)
                z0 = jax.tree.map(
                    lambda a, b: jnp.where(is_c0, a.astype(b.dtype), b),
                    z_override, z0)
            if skip is None:
                return solve(data, z0)
            st = solve.init(data, z0)
            st = st._replace(done=st.done | skip)
            st = solve.iterate(st, data, 10 ** 9)  # opt.max_iters clamps
            return solve.finalize(st, data)

        is_c0 = np.zeros(n_candidates, bool)
        is_c0[0] = True
        res = jax.vmap(one, in_axes=(0, 0, 0))(
            x_inits, jnp.asarray(warm_mask), jnp.asarray(is_c0))
        # prefer feasible, then lowest objective
        big = jnp.asarray(1e18, res.f.dtype)
        score = jnp.where(res.feas, res.f, big + res.viol)
        best = jnp.argmin(score)
        picked = jax.tree.map(lambda a: a[best], res)
        if skip is not None:
            picked = picked._replace(feas=picked.feas & ~skip)
        return picked, best

    return jax.jit(msolve)
