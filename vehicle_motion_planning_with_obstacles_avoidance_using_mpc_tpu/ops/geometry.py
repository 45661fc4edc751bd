"""Polytope geometry: rectangle vertex generation and half-space (H-rep)
construction, fully vectorized.

Reference semantics reproduced (file:line into /root/reference):
  * rectangle -> 5 clockwise vertices: ``src/demo_setting.py:405-429``
  * polyline -> {x : A x <= b} hyperplanes with vertical / horizontal /
    general-slope edge cases: ``src/model_obstacle.py:37-102``
  * obstacle motion over the MPC horizon (vertices advanced by
    ``Ts * v * [cos th, sin th] * k``): ``src/demo_setting.py:457-473``.
    Since that motion is a pure translation, A is invariant and
    ``b_k = b + A @ (k * Ts * d)`` — we exploit this instead of re-deriving
    hyperplanes per step (exactly equivalent; translation preserves the
    vertical/horizontal edge classification).

Instead of the reference's ragged per-obstacle lists and a running row
cursor (``src/obca.py:968-981``), obstacles live in dense padded tensors
``A[nO, E, 2]``, ``b[nO, E]`` with an ``edge_mask[nO, E]`` marking real
hyperplanes, so everything vmaps over obstacles and scenarios.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def rect_vertices(cx, cy, theta, length, width):
    """Clockwise closed rectangle vertices, shape (5, 2).

    Order (matching ``src/demo_setting.py:420-427``): left-bottom, left-top,
    right-top, right-bottom, left-bottom — where "left/right" is along the
    heading ``theta`` and length is measured along the moving direction.
    """
    c, s = jnp.cos(theta), jnp.sin(theta)
    hl, hw = length / 2.0, width / 2.0
    v1 = jnp.stack([cx - hl * c - hw * s, cy - hl * s + hw * c])
    v2 = jnp.stack([cx + hl * c - hw * s, cy + hl * s + hw * c])
    v3 = jnp.stack([cx + hl * c + hw * s, cy + hl * s - hw * c])
    v4 = jnp.stack([cx - hl * c + hw * s, cy - hl * s - hw * c])
    return jnp.stack([v1, v2, v3, v4, v1])


def grid_obstacle_vertices(obstacles):
    """V-representation of grid-cell obstacles, clockwise closed rectangles.

    Equivalent of ``obstacleModel.obstacle_V_Represent``
    (src/model_obstacle.py:12-35): each row of ``obstacles`` is
    ``[row, col, x_extent, y_extent]`` in grid coordinates; the rectangle's
    lower-left corner sits half a cell before ``(col, row)`` and spans
    ``x_extent`` by ``y_extent``. Returns (nO, 5, 2) closed vertex loops.
    """
    obstacles = jnp.asarray(obstacles)
    x0 = obstacles[:, 1] - 0.5
    y0 = obstacles[:, 0] - 0.5
    lx = obstacles[:, 2]
    ly = obstacles[:, 3]
    v1 = jnp.stack([x0, y0], axis=-1)
    v2 = jnp.stack([x0 + lx, y0], axis=-1)
    v3 = jnp.stack([x0 + lx, y0 + ly], axis=-1)
    v4 = jnp.stack([x0, y0 + ly], axis=-1)
    return jnp.stack([v1, v2, v3, v4, v1], axis=1)


def pad_polyline(verts, v_max):
    """Pad a (nv, 2) float array of polyline vertices to (v_max, 2).

    Padding repeats the last vertex so that padded "edges" are degenerate
    (zero length) and are excluded by the edge mask anyway.
    Returns ``(padded_verts, n_vertices)``.
    """
    verts = np.asarray(verts, dtype=np.float64)
    nv = verts.shape[0]
    if nv > v_max:
        raise ValueError(f"polyline has {nv} vertices > v_max={v_max}")
    pad = np.repeat(verts[-1:], v_max - nv, axis=0)
    return np.concatenate([verts, pad], axis=0), nv


def polygon_hrep(verts, edge_mask):
    """Hyperplanes of one (padded) clockwise polyline.

    Args:
      verts: (V, 2) vertices; edge j joins verts[j] -> verts[j+1].
      edge_mask: (V-1,) 1.0 for real edges, 0.0 for padding.

    Returns:
      A: (V-1, 2), b: (V-1,) with padded rows zeroed.

    Clockwise winding means the obstacle interior is the *infeasible* side:
    a point p is outside edge j iff ``A[j] @ p > b[j]`` for some j is
    achievable — the OBCA dual constraints use exactly these (A, b).
    Edge classification matches ``src/model_obstacle.py:63-89``:
      vertical   (x1 == x2): A = [sgn, 0],  b = sgn * x1,  sgn = +1 if y2 < y1
      horizontal (y1 == y2): A = [0, sgn],  b = sgn * y1,  sgn = +1 if x1 < x2
      general: slope a = dy/dx, intercept b0 = y1 - a*x1;
               A = [-a, 1], b = b0 if x1 < x2 else A = [a, -1], b = -b0
    """
    v1 = verts[:-1]
    v2 = verts[1:]
    dx = v2[:, 0] - v1[:, 0]
    dy = v2[:, 1] - v1[:, 1]
    vertical = dx == 0
    horizontal = jnp.logical_and(~vertical, dy == 0)

    sgn_v = jnp.where(v2[:, 1] < v1[:, 1], 1.0, -1.0)
    A_vert = jnp.stack([sgn_v, jnp.zeros_like(sgn_v)], axis=-1)
    b_vert = sgn_v * v1[:, 0]

    sgn_h = jnp.where(v1[:, 0] < v2[:, 0], 1.0, -1.0)
    A_horz = jnp.stack([jnp.zeros_like(sgn_h), sgn_h], axis=-1)
    b_horz = sgn_h * v1[:, 1]

    safe_dx = jnp.where(vertical, 1.0, dx)
    a = dy / safe_dx
    b0 = v1[:, 1] - a * v1[:, 0]
    sgn_g = jnp.where(dx > 0, 1.0, -1.0)
    A_gen = jnp.stack([-a * sgn_g, sgn_g], axis=-1)
    b_gen = sgn_g * b0

    A = jnp.where(
        vertical[:, None], A_vert, jnp.where(horizontal[:, None], A_horz, A_gen)
    )
    b = jnp.where(vertical, b_vert, jnp.where(horizontal, b_horz, b_gen))
    m = edge_mask.astype(A.dtype)
    return A * m[:, None], b * m


# (nO, V, 2), (nO, E) -> (nO, E, 2), (nO, E)
batched_hrep = jax.vmap(polygon_hrep)


def translate_hrep_b(A, b, delta):
    """b for the same polytope translated by ``delta``: A x <= b + A @ delta.

    A: (..., E, 2), b: (..., E), delta: (..., 2).
    """
    return b + jnp.einsum("...ed,...d->...e", A, delta)


def replicate_hrep_over_horizon(A, b, vel_vec, N, Ts):
    """Time-replicated H-rep tensors for the MPC horizon.

    Equivalent to the reference's ``rebuild_lObs`` + ``obstacle_H_Represent``
    stacking (``src/demo_setting.py:457-473``): obstacle i at horizon step k
    is the base polytope translated by ``k * Ts * vel_vec[i]``.

    Args:
      A: (nO, E, 2) base hyperplane normals.
      b: (nO, E) base offsets.
      vel_vec: (nO, 2) per-obstacle world velocity (0 for static obstacles).
      N: horizon; output covers k = 0..N.
      Ts: sampling time used for the prediction (a traced scalar is fine).

    Returns:
      A_t: (N+1, nO, E, 2) (A repeated — normals are translation invariant)
      b_t: (N+1, nO, E)
    """
    ks = jnp.arange(N + 1, dtype=b.dtype)
    deltas = ks[:, None, None] * Ts * vel_vec[None, :, :]  # (N+1, nO, 2)
    b_t = translate_hrep_b(A[None], b[None], deltas)
    A_t = jnp.broadcast_to(A[None], (N + 1,) + A.shape)
    return A_t, b_t
