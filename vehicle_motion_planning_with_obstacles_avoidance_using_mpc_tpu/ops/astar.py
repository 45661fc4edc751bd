"""Batched grid shortest-path front-end for TPU.

The reference uses a heap-based 8-connected A* on the occupancy grid
(``src/a_star.py:39-102``) — inherently sequential and host-bound. The
TPU-idiomatic equivalent (SURVEY.md section 7.3) is a wavefront / repeated
relaxation of the cost-to-go field: identical optimal path costs on these
unit grids, but expressed as a dense 8-neighbor stencil that XLA vectorizes
and that ``vmap`` batches over thousands of maps at once.

Conventions match the reference: grid is (rows, cols) indexed [y][x],
1 = blocked; moves are the 8 neighbors with Euclidean step costs
(1 or sqrt(2)); diagonal corner-cutting is allowed (the reference never
checks the two adjacent cardinal cells).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_INF = 1e9
# (dy, dx) neighbor offsets in the reference's iteration order
# (src/a_star.py:20) — order matters only for tie-breaking during greedy
# path extraction.
_OFFS = ((0, 1), (0, -1), (1, 0), (-1, 0), (1, 1), (1, -1), (-1, 1), (-1, -1))


def _shift_pad(field, dy, dx, fill):
    """Shift a (rows, cols) field by (dy, dx), filling vacated cells."""
    rows, cols = field.shape
    out = field
    if dy > 0:
        out = jnp.concatenate([jnp.full((dy, cols), fill, field.dtype), out[:-dy]], 0)
    elif dy < 0:
        out = jnp.concatenate([out[-dy:], jnp.full((-dy, cols), fill, field.dtype)], 0)
    if dx > 0:
        out = jnp.concatenate([jnp.full((rows, dx), fill, field.dtype), out[:, :-dx]], 1)
    elif dx < 0:
        out = jnp.concatenate([out[:, -dx:], jnp.full((rows, -dx), fill, field.dtype)], 1)
    return out


def cost_to_go(grid, goal_yx, max_iters=None):
    """Optimal 8-connected cost-to-go field to ``goal_yx``.

    Args:
      grid: (rows, cols), 1.0 = blocked.
      goal_yx: (2,) int [row, col].
      max_iters: relaxation bound; defaults to rows + cols + a margin
        (enough for these corridor maps; the loop exits early on
        convergence anyway).

    Returns:
      (rows, cols) float field; blocked/unreachable cells hold ~1e9.
    """
    rows, cols = grid.shape
    if max_iters is None:
        max_iters = 2 * (rows + cols)
    blocked = grid > 0.5
    dtype = jnp.promote_types(grid.dtype, jnp.float32)

    goal_oh = (
        (jnp.arange(rows)[:, None] == goal_yx[0])
        & (jnp.arange(cols)[None, :] == goal_yx[1])
    )
    d0 = jnp.where(goal_oh, 0.0, _INF).astype(dtype)
    d0 = jnp.where(blocked, _INF, d0)
    sqrt2 = jnp.sqrt(jnp.asarray(2.0, dtype))

    def relax(d):
        best = d
        for dy, dx in _OFFS:
            step = sqrt2 if (dy != 0 and dx != 0) else jnp.asarray(1.0, dtype)
            cand = _shift_pad(d, dy, dx, _INF) + step
            best = jnp.minimum(best, cand)
        return jnp.where(blocked, _INF, best)

    def cond(state):
        d, prev, it = state
        return jnp.logical_and(it < max_iters, jnp.any(d != prev))

    def body(state):
        d, _, it = state
        return relax(d), d, it + 1

    d, _, _ = jax.lax.while_loop(cond, body, (relax(d0), d0, jnp.int32(0)))
    return d


def extract_path(dfield, start_yx, max_len):
    """Greedy steepest-descent path through the cost-to-go field.

    Follows the reference's neighbor ordering for tie-breaks. Returns
    (path_yx (max_len, 2) int32, valid (max_len,) bool); once the goal
    (d == 0) is reached the position is repeated and masked invalid after
    the first goal entry, mirroring how the reference pads references with
    the final point (src/closed_loop.py:523-526 clamps at path end).
    """
    rows, cols = dfield.shape

    def step(pos, _):
        y, x = pos
        best_d = dfield[y, x]
        best = pos
        for dy, dx in _OFFS:
            ny = jnp.clip(y + dy, 0, rows - 1)
            nx = jnp.clip(x + dx, 0, cols - 1)
            in_bounds = (y + dy == ny) & (x + dx == nx)
            cand_d = jnp.where(in_bounds, dfield[ny, nx], _INF)
            better = cand_d < best_d
            best_d = jnp.where(better, cand_d, best_d)
            best = (
                jnp.where(better, ny, best[0]),
                jnp.where(better, nx, best[1]),
            )
        at_goal = dfield[y, x] <= 0.0
        ny = jnp.where(at_goal, y, best[0])
        nx = jnp.where(at_goal, x, best[1])
        return (ny, nx), jnp.stack([ny, nx])

    pos0 = (start_yx[0], start_yx[1])
    _, traj = jax.lax.scan(step, pos0, None, length=max_len)
    d_along = dfield[traj[:, 0], traj[:, 1]]
    reached = jnp.cumsum((d_along <= 0.0).astype(jnp.int32))
    valid = reached <= 1  # include the first goal cell, mask repeats
    return traj, valid


@functools.partial(jax.jit, static_argnames=("max_len",))
def plan_grid_path(grid, start_yx, goal_yx, max_len):
    """cost_to_go + extract_path in one jit unit; vmap over leading axes."""
    d = cost_to_go(grid, goal_yx)
    return extract_path(d, start_yx, max_len)


def path_to_reference(path_xy, valid):
    """Append headings: (L, 2) float path -> (L, 3) [x, y, theta].

    theta_i = atan2(dy, dx) to the next *valid* point; the final point
    keeps the previous heading (src/a_star.py:189-200 semantics).
    """
    L = path_xy.shape[0]
    nxt = jnp.concatenate([path_xy[1:], path_xy[-1:]], axis=0)
    nxt_valid = jnp.concatenate([valid[1:], jnp.zeros((1,), valid.dtype)], axis=0)
    dx = nxt[:, 0] - path_xy[:, 0]
    dy = nxt[:, 1] - path_xy[:, 1]
    theta_raw = jnp.arctan2(dy, dx)
    # carry forward the last valid heading
    def carry(prev, pair):
        th, ok = pair
        th_eff = jnp.where(ok, th, prev)
        return th_eff, th_eff

    _, theta = jax.lax.scan(carry, 0.0, (theta_raw, nxt_valid.astype(bool)))
    return jnp.concatenate([path_xy, theta[:, None]], axis=1)
