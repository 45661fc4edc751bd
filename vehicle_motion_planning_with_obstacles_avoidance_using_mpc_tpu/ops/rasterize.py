"""Occupancy-grid rasterization of rectangular obstacles.

Reference semantics (``src/model_map.py:21-101``): each obstacle polygon is
axis-aligned via its min/max bounding box, scaled by the map resolution, and
every covered cell [floor(y_min) .. floor(y_min) + floor(y_max - y_min)] x
[floor(x_min) .. floor(x_min) + floor(x_max - x_min)] (inclusive) is marked 1.
Grid shape is (rows, cols) = (y-extent, x-extent) exactly as
``src/model_map.py:17`` builds it.

Here this is a single broadcasted comparison over a dense cell-index grid —
no Python loops, vmaps over scenario batches.
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_shape(map_size, resolution=1.0):
    """(rows, cols) of the occupancy grid, per ``src/model_map.py:17``.

    map_size = [x_extent, y_extent] = [xU0 - xL0 + 1, xU1 - xL1 + 1].
    """
    rows = int((map_size[1] - 1) / resolution) + 1
    cols = int((map_size[0] - 1) / resolution) + 1
    return rows, cols


def rects_to_grid(bboxes, rect_mask, rows, cols, resolution=1.0):
    """Rasterize axis-aligned bounding boxes into a 0/1 occupancy grid.

    Args:
      bboxes: (nR, 4) [x_min, y_min, x_max, y_max] in world coordinates
              (precompute the bbox of each polygon — the reference's
              ``reOrderVertex``, ``src/model_map.py:88-101``).
      rect_mask: (nR,) 1.0 for real rectangles, 0.0 for padding.
      rows, cols: static grid shape from :func:`grid_shape`.
      resolution: meters per cell.

    Returns:
      (rows, cols) float array, 1.0 = forbidden cell, row index = y.
    """
    bboxes = jnp.asarray(bboxes)
    x0 = jnp.floor(bboxes[:, 0] / resolution)
    y0 = jnp.floor(bboxes[:, 1] / resolution)
    # Inclusive span, truncated like int() in src/model_map.py:45-46.
    xs = jnp.floor((bboxes[:, 2] - bboxes[:, 0]) / resolution)
    ys = jnp.floor((bboxes[:, 3] - bboxes[:, 1]) / resolution)
    x1 = x0 + xs
    y1 = y0 + ys

    cy = jnp.arange(rows, dtype=bboxes.dtype)[:, None, None]  # (rows,1,1)
    cx = jnp.arange(cols, dtype=bboxes.dtype)[None, :, None]  # (1,cols,1)
    inside = (
        (cx >= x0[None, None, :])
        & (cx <= x1[None, None, :])
        & (cy >= y0[None, None, :])
        & (cy <= y1[None, None, :])
        & (rect_mask[None, None, :] > 0)
    )
    return jnp.any(inside, axis=-1).astype(bboxes.dtype)


def _disk_offsets(radius: int):
    """Static (dy, dx) offsets of a discrete disk structuring element —
    the same footprint as ``skimage.morphology.disk(radius)`` used by the
    reference's ``dilate_map``/``erode_map`` (src/model_map.py:103-113)."""
    offs = []
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            if dx * dx + dy * dy <= radius * radius:
                offs.append((dy, dx))
    return offs


def dilate_grid(grid, level: int):
    """Morphological dilation of a 0/1 occupancy grid with a disk kernel.

    TPU-native equivalent of ``mapModel.dilate_map`` (src/model_map.py:103):
    a max over statically-unrolled shifted copies — no scatter, vmappable.
    ``level`` is the disk radius (static).
    """
    if level <= 0:
        return grid
    grid = jnp.asarray(grid)
    pad = level
    g = jnp.pad(grid, pad, constant_values=0.0)
    out = jnp.zeros_like(grid)
    r, c = grid.shape[-2], grid.shape[-1]
    for dy, dx in _disk_offsets(level):
        out = jnp.maximum(out, g[..., pad + dy : pad + dy + r, pad + dx : pad + dx + c])
    return out


def erode_grid(grid, level: int):
    """Morphological erosion with a disk kernel
    (``mapModel.erode_map``, src/model_map.py:109): min over shifted
    copies, padding counts as free space outside the map."""
    if level <= 0:
        return grid
    grid = jnp.asarray(grid)
    pad = level
    g = jnp.pad(grid, pad, constant_values=0.0)
    out = jnp.ones_like(grid)
    r, c = grid.shape[-2], grid.shape[-1]
    for dy, dx in _disk_offsets(level):
        out = jnp.minimum(out, g[..., pad + dy : pad + dy + r, pad + dx : pad + dx + c])
    return out


def polygon_bboxes(verts, vert_counts, v_max):
    """Min/max bbox of each padded polygon; host-side helper.

    verts: (nR, v_max, 2) with padding = repeated last vertex (harmless for
    min/max). Returns (nR, 4) [x_min, y_min, x_max, y_max].
    """
    x_min = jnp.min(verts[..., 0], axis=-1)
    x_max = jnp.max(verts[..., 0], axis=-1)
    y_min = jnp.min(verts[..., 1], axis=-1)
    y_max = jnp.max(verts[..., 1], axis=-1)
    return jnp.stack([x_min, y_min, x_max, y_max], axis=-1)
