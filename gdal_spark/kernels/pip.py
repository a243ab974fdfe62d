"""Point-in-ring / point-in-polygon kernels, vectorized over points.

Semantics are a faithful re-statement (not a copy) of the reference's
ray-casting rule so that join rows match row-for-row:

- ``points_in_ring``  — reference ``OGRLinearRing::isPointInRing``
  (ogr/ogrlinearring.cpp:452-521): translate ring to the test point,
  walk segments (p-1, p); a segment crosses the +x ray iff
  ``(y1 > 0 and y2 <= 0) or (y2 > 0 and y1 <= 0)`` and the x of the
  intersection ``(x1*y2 - x2*y1) / (y2 - y1)`` is strictly > 0.
  Odd crossing count ⇒ inside.  Rings with < 4 points ⇒ False.

- ``points_on_ring_boundary`` — reference
  ``OGRLinearRing::isPointOnRingBoundary`` (ogr/ogrlinearring.cpp:533-610):
  exact collinearity (cross product == 0) plus projection-in-segment
  (0 <= dot <= squared_length) test per segment.

- ``points_in_polygon`` — inside the exterior ring and inside no hole;
  with ``include_boundary=True`` a point on any ring boundary counts
  (Intersects semantics, the default of the reference's two-phase
  spatial filter, ogr/ogrsf_frmts/generic/ogrlayer.cpp:4004-4076).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "points_in_ring",
    "points_on_ring_boundary",
    "points_in_polygon",
]


def _as_ring(ring: np.ndarray) -> np.ndarray:
    ring = np.asarray(ring, dtype=np.float64)
    if ring.ndim != 2 or ring.shape[1] != 2:
        raise ValueError("ring must be (N, 2)")
    return ring


def points_in_ring(
    px: np.ndarray,
    py: np.ndarray,
    ring: np.ndarray,
    test_envelope: bool = False,
) -> np.ndarray:
    """Vectorized crossing-rule PIP for P points against one ring.

    ``ring`` is an (N, 2) float array, closed or unclosed — the
    reference iterates vertices 1..N-1 against their predecessor and
    relies on the ring being explicitly closed (WKB rings are); an
    unclosed ring is closed here first so both forms agree.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    ring = _as_ring(ring)
    if not (ring.shape[0] >= 2 and np.array_equal(ring[0], ring[-1])):
        ring = np.vstack([ring, ring[:1]])
    n = ring.shape[0]
    if n < 4:  # ogrlinearring.cpp:470-471 — degenerate ring is never hit
        return np.zeros(px.shape, dtype=bool)

    out = np.zeros(px.shape, dtype=bool)
    sel = slice(None)
    if test_envelope:
        sel = (
            (px >= ring[:, 0].min())
            & (px <= ring[:, 0].max())
            & (py >= ring[:, 1].min())
            & (py <= ring[:, 1].max())
        )
        if not np.any(sel):
            return out
        px, py = px[sel], py[sel]

    # (P, 1) points vs (1, N-1) segment endpoints, ring-relative coords.
    x1 = ring[1:, 0][None, :] - px[:, None]
    y1 = ring[1:, 1][None, :] - py[:, None]
    x2 = ring[:-1, 0][None, :] - px[:, None]
    y2 = ring[:-1, 1][None, :] - py[:, None]

    straddles = ((y1 > 0) & (y2 <= 0)) | ((y2 > 0) & (y1 <= 0))
    denom = y2 - y1
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = (x1 * y2 - x2 * y1) / denom
    crossings = (straddles & (xint > 0.0)).sum(axis=1)
    inside = (crossings % 2) != 0
    out[sel] = inside
    return out


def points_on_ring_boundary(
    px: np.ndarray, py: np.ndarray, ring: np.ndarray
) -> np.ndarray:
    """Exact on-boundary test (ogrlinearring.cpp:533-610 semantics)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    ring = _as_ring(ring)
    if not (ring.shape[0] >= 2 and np.array_equal(ring[0], ring[-1])):
        ring = np.vstack([ring, ring[:1]])
    if ring.shape[0] < 2:
        return np.zeros(px.shape, dtype=bool)

    ax = ring[:-1, 0][None, :]
    ay = ring[:-1, 1][None, :]
    bx = ring[1:, 0][None, :]
    by = ring[1:, 1][None, :]
    sx = bx - ax
    sy = by - ay
    tx = px[:, None] - ax
    ty = py[:, None] - ay
    cross = sx * ty - sy * tx
    dot = sx * tx + sy * ty
    sqlen = sx * sx + sy * sy
    on_seg = (cross == 0.0) & (dot >= 0.0) & (dot <= sqlen)
    # Degenerate zero-length segments: point must equal the vertex.
    degen = sqlen == 0.0
    on_vertex = (tx == 0.0) & (ty == 0.0)
    return np.any(np.where(degen, on_vertex, on_seg), axis=1)


def points_in_polygon(
    px: np.ndarray,
    py: np.ndarray,
    rings: list[np.ndarray],
    include_boundary: bool = True,
) -> np.ndarray:
    """PIP against a polygon = exterior ring + holes.

    ``rings[0]`` is the exterior; the rest are holes.  A point inside a
    hole ring is outside the polygon.  ``include_boundary=True`` gives
    Intersects semantics (boundary counts); ``False`` gives strict
    interior (Within/Contains-without-boundary semantics).
    """
    if not rings:
        return np.zeros(np.asarray(px).shape, dtype=bool)
    inside = points_in_ring(px, py, rings[0], test_envelope=True)
    for hole in rings[1:]:
        in_hole = points_in_ring(px, py, hole)
        if include_boundary:
            in_hole &= ~points_on_ring_boundary(px, py, hole)
        inside &= ~in_hole
    if include_boundary:
        boundary = points_on_ring_boundary(px, py, rings[0])
        for hole in rings[1:]:
            boundary |= points_on_ring_boundary(px, py, hole)
        inside |= boundary
    return inside
