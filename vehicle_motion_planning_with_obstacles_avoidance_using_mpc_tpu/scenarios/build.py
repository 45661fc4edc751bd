"""Padded-array scenario pytrees.

Converts a :class:`DemoSpec` (ragged Python data) into a :class:`Scenario`
of fixed-shape arrays so that solvers JIT once per :class:`ShapeSpec` and
``vmap``/``pjit`` batch over scenarios. This replaces the reference's
``problemSetting`` instance state (``src/demo_setting.py:11-70``) and its
ragged ``lObs``/``vObs`` lists.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..ops import geometry, rasterize
from .demos import DemoSpec


@dataclasses.dataclass(frozen=True)
class ShapeSpec:
    """Static (compile-time) padding shapes for one problem family."""

    n_static: int   # padded static obstacle count
    n_dyn: int      # padded dynamic obstacle count
    e_max: int      # padded hyperplanes (edges) per obstacle
    rows: int       # occupancy grid rows (y)
    cols: int       # occupancy grid cols (x)

    @property
    def n_obs(self):
        """Total padded obstacle slots in the NLP (static + dynamic)."""
        return self.n_static + self.n_dyn


class Scenario(NamedTuple):
    """One world as dense arrays; a pytree, vmap-able over a leading axis."""

    x_lo: jnp.ndarray        # (2,) map lower bounds
    x_hi: jnp.ndarray        # (2,) map upper bounds
    start: jnp.ndarray       # (3,) start pose
    goal: jnp.ndarray        # (3,) goal pose
    # static obstacles (H-rep, padded)
    sA: jnp.ndarray          # (nS, E, 2)
    sb: jnp.ndarray          # (nS, E)
    s_edge_mask: jnp.ndarray  # (nS, E) 1.0 = real hyperplane
    s_mask: jnp.ndarray      # (nS,) 1.0 = real obstacle
    # dynamic obstacles: base H-rep at spawn pose + motion model
    dA: jnp.ndarray          # (nD, E, 2)
    db: jnp.ndarray          # (nD, E) offsets at spawn position
    d_edge_mask: jnp.ndarray  # (nD, E)
    d_mask: jnp.ndarray      # (nD,)
    dyn_info: jnp.ndarray    # (nD, 11) raw reference 11-tuples
    d_vel: jnp.ndarray       # (nD, 2) v * [cos th, sin th]
    d_start_time: jnp.ndarray  # (nD,) spawn step (info[9])
    # terminal set handling
    terminal_set: jnp.ndarray  # (2, 2) per-demo static set
    ts_base: jnp.ndarray     # (2, 2) closed-loop policy base
    ts_rel: jnp.ndarray      # (2, 2) int: -1 absolute, else x0-index to add
    # world
    grid: jnp.ndarray        # (rows, cols) occupancy, 1 = blocked
    sense_dis: jnp.ndarray   # () lidar radius


def shape_spec_for(spec: DemoSpec, n_static=None, n_dyn=None, e_max=None,
                   rows=None, cols=None) -> ShapeSpec:
    ns = max(len(spec.static_lobs), n_static or 0)
    nd = max(len(spec.dyn_obs_info), n_dyn or 0)
    em = max(max(len(o) - 1 for o in spec.static_lobs), 4, e_max or 0)
    r, c = rasterize.grid_shape(spec.map_size, spec.resolution)
    return ShapeSpec(
        n_static=ns,
        n_dyn=nd,
        e_max=em,
        rows=max(r, rows or 0),
        cols=max(c, cols or 0),
    )


def build_scenario(spec: DemoSpec, shape: ShapeSpec | None = None,
                   dtype=jnp.float32) -> tuple[Scenario, ShapeSpec]:
    """Build the dense Scenario pytree for one demo."""
    if shape is None:
        shape = shape_spec_for(spec)
    ns, nd, em = shape.n_static, shape.n_dyn, shape.e_max
    v_max = em + 1

    # --- static obstacles -> padded polylines -> H-rep
    s_verts = np.zeros((ns, v_max, 2))
    s_edge_mask = np.zeros((ns, em))
    s_mask = np.zeros((ns,))
    for i, poly in enumerate(spec.static_lobs):
        padded, nv = geometry.pad_polyline(np.asarray(poly), v_max)
        s_verts[i] = padded
        s_edge_mask[i, : nv - 1] = 1.0
        s_mask[i] = 1.0
    sA, sb = geometry.batched_hrep(
        jnp.asarray(s_verts, dtype), jnp.asarray(s_edge_mask, dtype)
    )

    # --- dynamic obstacles: rectangle H-rep at spawn pose
    d_verts = np.zeros((nd, 5, 2))
    d_edge_mask = np.zeros((nd, em))
    d_mask = np.zeros((nd,))
    dyn_info = np.zeros((nd, 11))
    d_vel = np.zeros((nd, 2))
    d_start = np.zeros((nd,))
    for i, row in enumerate(spec.dyn_obs_info):
        cx, cy, th, L, W = row[0], row[1], row[2], row[3], row[4]
        d_verts[i] = np.asarray(
            geometry.rect_vertices(cx, cy, th, L, W), dtype=np.float64
        )
        d_edge_mask[i, :4] = 1.0
        d_mask[i] = 1.0
        dyn_info[i] = np.asarray(row)
        d_vel[i] = (row[5] * np.cos(th), row[5] * np.sin(th))
        d_start[i] = row[9]
    d_verts_p = np.zeros((nd, v_max, 2))
    d_verts_p[:, :5] = d_verts
    d_verts_p[:, 5:] = d_verts[:, -1:] if nd else 0.0
    dA, db = geometry.batched_hrep(
        jnp.asarray(d_verts_p, dtype), jnp.asarray(d_edge_mask, dtype)
    )

    # --- occupancy grid from the closed grid rectangles
    n_rects = len(spec.grid_rects)
    rect_v = np.zeros((max(n_rects, 1), v_max, 2))
    rect_mask = np.zeros((max(n_rects, 1),))
    for i, poly in enumerate(spec.grid_rects):
        padded, _ = geometry.pad_polyline(np.asarray(poly), v_max)
        rect_v[i] = padded
        rect_mask[i] = 1.0
    bboxes = rasterize.polygon_bboxes(jnp.asarray(rect_v, dtype), None, v_max)
    grid = rasterize.rects_to_grid(
        bboxes, jnp.asarray(rect_mask, dtype), shape.rows, shape.cols,
        spec.resolution,
    )

    scn = Scenario(
        x_lo=jnp.asarray(spec.x_lo, dtype),
        x_hi=jnp.asarray(spec.x_hi, dtype),
        start=jnp.asarray(spec.start, dtype),
        goal=jnp.asarray(spec.goal, dtype),
        sA=sA.astype(dtype),
        sb=sb.astype(dtype),
        s_edge_mask=jnp.asarray(s_edge_mask, dtype),
        s_mask=jnp.asarray(s_mask, dtype),
        dA=dA.astype(dtype),
        db=db.astype(dtype),
        d_edge_mask=jnp.asarray(d_edge_mask, dtype),
        d_mask=jnp.asarray(d_mask, dtype),
        dyn_info=jnp.asarray(dyn_info, dtype),
        d_vel=jnp.asarray(d_vel, dtype),
        d_start_time=jnp.asarray(d_start, dtype),
        terminal_set=jnp.asarray(spec.terminal_set, dtype),
        ts_base=jnp.asarray(spec.terminal_policy.base, dtype),
        ts_rel=jnp.asarray(spec.terminal_policy.rel, jnp.int32),
        grid=grid.astype(dtype),
        sense_dis=jnp.asarray(spec.sense_dis, dtype),
    )
    return scn, shape
