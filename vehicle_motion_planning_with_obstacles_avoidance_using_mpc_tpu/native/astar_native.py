"""numpy-facing wrappers over the native A* ABI.

Returns paths in the same goal->start row/col order as the reference's
``a_star.solve`` (src/a_star.py:39-102), so the existing
``rebuild_path``-style post-processing applies unchanged.
"""

from __future__ import annotations

import ctypes

import numpy as np

from .build import load_native_astar


def astar_solve_native(grid, start_yx, goal_yx):
    """Single search. Returns (L, 2) int32 array of (y, x) cells in
    goal->start order, or None when unreachable / native lib missing."""
    lib = load_native_astar()
    if lib is None:
        return None
    g = np.ascontiguousarray(np.asarray(grid) != 0, dtype=np.uint8)
    h, w = g.shape
    max_out = h * w
    out = np.empty((max_out, 2), dtype=np.int32)
    n = lib.astar_solve(
        g.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        int(start_yx[0]), int(start_yx[1]),
        int(goal_yx[0]), int(goal_yx[1]),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), max_out,
    )
    if n < 0:
        return None
    return out[:n].copy()


def astar_solve_batch_native(grid, starts_yx, goals_yx):
    """B searches on one grid. Returns list of (L_b, 2) arrays (None for
    unreachable), or None when the native lib is missing."""
    lib = load_native_astar()
    if lib is None:
        return None
    g = np.ascontiguousarray(np.asarray(grid) != 0, dtype=np.uint8)
    h, w = g.shape
    starts = np.ascontiguousarray(starts_yx, dtype=np.int32)
    goals = np.ascontiguousarray(goals_yx, dtype=np.int32)
    b = starts.shape[0]
    max_out = h * w
    out = np.empty((b, max_out, 2), dtype=np.int32)
    lens = np.empty(b, dtype=np.int32)
    lib.astar_solve_batch(
        g.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        goals.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        b,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), max_out,
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return [out[i, : lens[i]].copy() if lens[i] >= 0 else None
            for i in range(b)]
