"""Convex polygon clipping (Sutherland–Hodgman) + shoelace area.

Role of the reference's GEOS-backed ``OGRGeometry::Intersection``
(ogr/ogrgeometry.cpp:5318) for the layer-algebra overlay operator
(ogrlayer.cpp:5385, apps/gdalalg_vector_layer_algebra.cpp), restricted
to convex clip polygons — the common zone/tile/bbox overlay case.  The
general concave/multi overlay would drop to shapely inside the same
operator shape; this kernel keeps the engine dependency-free.
"""

from __future__ import annotations

import numpy as np

__all__ = ["clip_convex", "ring_area", "polygon_area"]


def ring_area(ring: np.ndarray) -> float:
    """Signed shoelace area of an (N, 2) ring (open or closed)."""
    r = np.asarray(ring, dtype=np.float64)
    if r.shape[0] >= 2 and np.array_equal(r[0], r[-1]):
        r = r[:-1]
    if r.shape[0] < 3:
        return 0.0
    x, y = r[:, 0], r[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def polygon_area(rings: list[np.ndarray]) -> float:
    """|exterior| − Σ|holes| (the OGR get_Area convention)."""
    if not rings:
        return 0.0
    total = abs(ring_area(rings[0]))
    for hole in rings[1:]:
        total -= abs(ring_area(hole))
    return total


def _ccw(ring: np.ndarray) -> np.ndarray:
    r = np.asarray(ring, dtype=np.float64)
    if r.shape[0] >= 2 and np.array_equal(r[0], r[-1]):
        r = r[:-1]
    if ring_area(r) < 0:
        r = r[::-1]
    return r


def clip_convex(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman: clip ``subject`` (any simple ring) by the
    CONVEX ring ``clip``.  Returns the clipped ring (possibly empty
    (0, 2)).  Points exactly on a clip edge are kept (inside test is
    ``>= 0`` on the left-of-edge cross product), so shared boundaries
    produce degenerate zero-area rings, not misses."""
    out = _ccw(subject)
    cl = _ccw(clip)
    m = cl.shape[0]
    for i in range(m):
        if out.shape[0] == 0:
            break
        a = cl[i]
        b = cl[(i + 1) % m]
        ex, ey = b[0] - a[0], b[1] - a[1]
        # side(p) = cross(b-a, p-a); >= 0 means inside (left) for CCW
        px = out[:, 0] - a[0]
        py = out[:, 1] - a[1]
        side = ex * py - ey * px
        nxt = np.roll(side, -1)
        nxt_pts = np.roll(out, -1, axis=0)
        new_pts = []
        for j in range(out.shape[0]):
            cur_in = side[j] >= 0
            nx_in = nxt[j] >= 0
            if cur_in:
                new_pts.append(out[j])
            if cur_in != nx_in:
                # edge crosses the clip line: parametric intersection
                t = side[j] / (side[j] - nxt[j])
                new_pts.append(out[j] + t * (nxt_pts[j] - out[j]))
        out = np.array(new_pts, dtype=np.float64) if new_pts else np.empty((0, 2))
    return out
