"""Reference-trajectory construction and windowing for the MPC.

Reproduces the reference's path plumbing in ``src/closed_loop.py``:
  * nearest-point windowing of a long path into an (nx, N+1) block,
    clamping at the path end (``update_reference_trajectory``, :502-528)
  * 'startGoal_only' open-loop reference (``update_path``, :535-544)
  * 'startGoal_smooth' linear interpolation with headings (:545-553)
  * fix-time re-interpolation of the previous open-loop solution with the
    Ts_opt rescaling feedback (``update_path`` allAviable=1, :570-587)

All functions here are jnp-traceable (used inside the scanned closed loop)
but also accept numpy for the host driver.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def window_reference(ref_traj, valid_len, x0, N):
    """Nearest-point window of (3, L) ``ref_traj`` starting at the closest
    point to ``x0``; columns past the path end repeat the final point.

    ``valid_len`` is the number of real columns in a padded path (pass
    ``ref_traj.shape[1]`` when unpadded). Matches
    ``src/closed_loop.py:502-528`` including its clamp-at-``L-1`` rule when
    the window runs off the end.
    """
    ref_traj = jnp.asarray(ref_traj)
    L = ref_traj.shape[1]
    idx = jnp.arange(L)
    in_path = idx < valid_len
    d2 = (x0[0] - ref_traj[0]) ** 2 + (x0[1] - ref_traj[1]) ** 2
    d2 = jnp.where(in_path, d2, jnp.inf)
    start_idx = jnp.argmin(d2)
    cols = start_idx + jnp.arange(N + 1)
    cols = jnp.where(cols >= valid_len - 1, valid_len - 1, cols)
    return ref_traj[:, cols]


def start_goal_reference(x0, xF, N):
    """(3, N+1): column 0 = start, columns 1..N = goal
    (src/closed_loop.py:535-544)."""
    x0 = jnp.asarray(x0)
    xF = jnp.asarray(xF)
    cols = [x0] + [xF] * N
    return jnp.stack(cols, axis=1)


def start_goal_smooth_reference(x0, xF, N):
    """Linear x/y interpolation with headings (src/closed_loop.py:545-553)."""
    x0 = jnp.asarray(x0)
    xF = jnp.asarray(xF)
    ks = jnp.arange(N + 1)
    xs = (xF[0] - x0[0]) / N * ks + x0[0]
    ys = (xF[1] - x0[1]) / N * ks + x0[1]
    th = jnp.arctan2(jnp.diff(ys), jnp.diff(xs))
    th = jnp.concatenate([th, th[-1:]])
    return jnp.stack([xs, ys, th], axis=0)


def reinterpolate_openloop(xref, N_free, N_fix):
    """Fix-time reference from the free-time plan (allAviable=1 semantics,
    src/closed_loop.py:570-587).

    Splits each of the ``N_free`` segments of ``xref`` (3 or more rows,
    only x/y used) into ``int(N_fix / N_free)`` linear sub-points
    (endpoint excluded), appends the final point, then recomputes headings.

    Returns (ref (3, N_new+1), N_new) where
    ``N_new = N_free * int(N_fix / N_free)`` — the caller must rescale
    ``Ts_opt *= N_free / N_new`` (src/closed_loop.py:586).
    """
    xref = jnp.asarray(xref)
    m = int(N_fix / N_free)
    if m < 1:
        raise ValueError("N_fix must be >= N_free")
    # fractions 0, 1/m, ..., (m-1)/m of each segment
    fr = jnp.arange(m) / m
    seg_x = xref[0, :N_free, None] * (1 - fr) + xref[0, 1 : N_free + 1, None] * fr
    seg_y = xref[1, :N_free, None] * (1 - fr) + xref[1, 1 : N_free + 1, None] * fr
    xs = jnp.concatenate([seg_x.reshape(-1), xref[0, N_free:N_free + 1]])
    ys = jnp.concatenate([seg_y.reshape(-1), xref[1, N_free:N_free + 1]])
    th = jnp.arctan2(jnp.diff(ys), jnp.diff(xs))
    th = jnp.concatenate([th, th[-1:]])
    return jnp.stack([xs, ys, th], axis=0), N_free * m


def splice_previous_plan(xref, x_prev, n_cols):
    """Overwrite the first ``n_cols`` columns of the window with the
    previous open-loop plan shifted by one (src/closed_loop.py:363-364:
    ``xref[:, i] = xOpt[:, i + 1]`` for i < N_fix - 5)."""
    if n_cols <= 0:
        return jnp.asarray(xref)
    xref = jnp.asarray(xref)
    return xref.at[:, :n_cols].set(x_prev[:, 1 : n_cols + 1])


def goal_reached(x0, goal, tol_sq=0.1):
    """Loop termination test (src/closed_loop.py:345-346)."""
    return (x0[0] - goal[0]) ** 2 + (x0[1] - goal[1]) ** 2 < tol_sq


def as_numpy(x):
    return np.asarray(x)
