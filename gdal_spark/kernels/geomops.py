"""GEOS-free geometry method kernels: Distance, Centroid, ConvexHull,
Simplify — pure NumPy, exact pinned semantics mirrored by ANSI-SQL
oracles in gdal_spark.queries.

Reference surface: OGRGeometry::Distance (ogr/ogrgeometry.cpp:3818),
::Centroid (ogr/ogrgeometry.cpp, area-weighted surface centroid),
::ConvexHull (ogr/ogrgeometry.cpp:4449), ::Simplify (Douglas–Peucker
via GEOS).  The reference delegates all four to GEOS; these kernels
re-state the published algorithms directly so the engine needs no
native dependency, with deterministic tie-breaks that both engines can
replay bit-for-bit:

- distance: point↔segment uses t = clamp(dot/len², 0, 1) then the
  hypotenuse to the clamped foot — the IEEE expression tree is part of
  the contract;
- convex hull: Andrew monotone chain, STRICT turns (collinear interior
  vertices dropped), CCW orientation from the lexicographic-min vertex;
- simplify: classic Douglas–Peucker on segment distance, keep when
  dmax > tolerance, split at the FIRST index attaining the max.
"""

from __future__ import annotations

import numpy as np


def point_segment_dist(px, py, ax, ay, bx, by):
    """Vectorized distance point → segment with the pinned expression
    tree (identical term order in the SQL oracles)."""
    px = np.asarray(px, dtype=np.float64)
    dx = np.asarray(bx, dtype=np.float64) - ax
    dy = np.asarray(by, dtype=np.float64) - ay
    l2 = dx * dx + dy * dy
    tn = (px - ax) * dx + (py - ay) * dy
    t = np.clip(np.where(l2 == 0.0, 0.0, tn / np.where(l2 == 0.0, 1.0, l2)), 0.0, 1.0)
    cx = ax + t * dx
    cy = ay + t * dy
    return np.sqrt((px - cx) * (px - cx) + (py - cy) * (py - cy))


def _segments(coords: np.ndarray):
    return coords[:-1], coords[1:]


def _orient(ax, ay, bx, by, cx, cy):
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def _proper_intersect(a0, a1, b0, b1) -> np.ndarray:
    """Pairwise proper-crossing test for all segment pairs (broadcast):
    a0/a1 (n,2), b0/b1 (m,2) → (n, m) bool."""
    ax, ay = a0[:, None, 0], a0[:, None, 1]
    bx, by = a1[:, None, 0], a1[:, None, 1]
    cx, cy = b0[None, :, 0], b0[None, :, 1]
    dx, dy = b1[None, :, 0], b1[None, :, 1]
    d1 = _orient(ax, ay, bx, by, cx, cy)
    d2 = _orient(ax, ay, bx, by, dx, dy)
    d3 = _orient(cx, cy, dx, dy, ax, ay)
    d4 = _orient(cx, cy, dx, dy, bx, by)
    return (d1 * d2 < 0) & (d3 * d4 < 0)


def min_distance(coords_a: np.ndarray, coords_b: np.ndarray) -> float:
    """Min Euclidean distance between two vertex chains (point = one
    row).  Zero when any segment pair properly crosses; otherwise the
    min over vertex-to-segment distances in both directions — the
    standard exact result for non-crossing polylines/boundaries."""
    coords_a = np.atleast_2d(np.asarray(coords_a, dtype=np.float64))
    coords_b = np.atleast_2d(np.asarray(coords_b, dtype=np.float64))
    best = np.inf
    if coords_a.shape[0] > 1 and coords_b.shape[0] > 1:
        a0, a1 = _segments(coords_a)
        b0, b1 = _segments(coords_b)
        if _proper_intersect(a0, a1, b0, b1).any():
            return 0.0
    if coords_b.shape[0] > 1:
        b0, b1 = _segments(coords_b)
        for x, y in coords_a:
            best = min(
                best,
                float(
                    point_segment_dist(
                        x, y, b0[:, 0], b0[:, 1], b1[:, 0], b1[:, 1]
                    ).min()
                ),
            )
    if coords_a.shape[0] > 1:
        a0, a1 = _segments(coords_a)
        for x, y in coords_b:
            best = min(
                best,
                float(
                    point_segment_dist(
                        x, y, a0[:, 0], a0[:, 1], a1[:, 0], a1[:, 1]
                    ).min()
                ),
            )
    if coords_a.shape[0] == 1 and coords_b.shape[0] == 1:
        dx = coords_a[0, 0] - coords_b[0, 0]
        dy = coords_a[0, 1] - coords_b[0, 1]
        best = float(np.sqrt(dx * dx + dy * dy))
    return best


def polygon_centroid(ring: np.ndarray) -> tuple[float, float]:
    """Area-weighted centroid of a simple ring (closed, first == last).
    Integer vertex coordinates keep every term exact:
      S  = Σ (x_i·y_{i+1} − x_{i+1}·y_i)            (2A, signed)
      Sx = Σ (x_i + x_{i+1})·(x_i·y_{i+1} − x_{i+1}·y_i)
      Cx = Sx / (3·S)   (Cy analogous)"""
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    cross = x0 * y1 - x1 * y0
    s = float(np.sum(cross))
    sx = float(np.sum((x0 + x1) * cross))
    sy = float(np.sum((y0 + y1) * cross))
    return sx / (3.0 * s), sy / (3.0 * s)


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew monotone chain (CCW, strict turns — collinear boundary
    points dropped).  Returns the closed hull ring starting at the
    lexicographic-min point.  O(n log n)."""
    pts = np.unique(np.asarray(points, dtype=np.float64), axis=0)  # lex sort
    if pts.shape[0] <= 2:
        return np.vstack([pts, pts[:1]]) if pts.shape[0] else pts

    def half(seq):
        out: list = []
        for p in seq:
            while (
                len(out) >= 2
                and _orient(out[-2][0], out[-2][1], out[-1][0], out[-1][1], p[0], p[1])
                <= 0
            ):
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    ring = np.array(lower[:-1] + upper[:-1])
    return np.vstack([ring, ring[:1]])


def simplify_dp(coords: np.ndarray, tol: float) -> np.ndarray:
    """Iterative Douglas–Peucker: for interval (i, j) find the vertex
    with max distance to segment (v_i, v_j) (FIRST index on ties); if
    that distance > tol, keep it and recurse on both halves.  Endpoints
    always kept.  Matches GEOS DouglasPeuckerLineSimplifier semantics
    (the reference's OGRGeometry::Simplify backend) with a pinned
    tie-break."""
    coords = np.asarray(coords, dtype=np.float64)
    n = coords.shape[0]
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        ks = np.arange(i + 1, j)
        d = point_segment_dist(
            coords[ks, 0], coords[ks, 1],
            coords[i, 0], coords[i, 1], coords[j, 0], coords[j, 1],
        )
        kmax = int(ks[int(np.argmax(d))])  # np.argmax → first max index
        if float(d[kmax - i - 1]) > tol:
            keep[kmax] = True
            stack.append((i, kmax))
            stack.append((kmax, j))
    return coords[keep]


def _bottom_start(ring: np.ndarray) -> np.ndarray:
    """Open CCW vertex list rotated to start at the bottom-most
    (lowest y, then lowest x) vertex."""
    pts = ring[:-1] if ring.shape[0] > 1 and np.array_equal(ring[0], ring[-1]) else ring
    i = int(np.lexsort((pts[:, 0], pts[:, 1]))[0])
    return np.roll(pts, -i, axis=0)


def minkowski_sum_convex(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Minkowski sum of two CONVEX CCW rings (closed or open): the
    classic edge merge by polar angle starting both chains at their
    bottom-most vertex.  Collinear same-direction edges combine into
    one step, so axis-aligned ⊕ axis-aligned stays minimal (rect ⊕
    square = rect).  Returns a closed CCW ring.

    Reference surface: OGRGeometry::Buffer (ogr/ogrgeometry.cpp:4949)
    delegates to GEOS; for convex inputs the buffer polygon IS the
    Minkowski sum with the (approximated) disc, which this computes
    without GEOS."""
    p = _bottom_start(np.asarray(a, dtype=np.float64))
    k = _bottom_start(np.asarray(b, dtype=np.float64))
    n, m = p.shape[0], k.shape[0]

    def half(e):
        return 0 if (e[1] > 0 or (e[1] == 0 and e[0] > 0)) else 1

    out = [p[0] + k[0]]
    i = j = 0
    while i < n or j < m:
        ep = p[(i + 1) % n] - p[i % n] if i < n else None
        ek = k[(j + 1) % m] - k[j % m] if j < m else None
        if ek is None:
            step = ep; i += 1
        elif ep is None:
            step = ek; j += 1
        else:
            hp, hk = half(ep), half(ek)
            cr = ep[0] * ek[1] - ep[1] * ek[0]
            if hp == hk and cr == 0:
                step = ep + ek; i += 1; j += 1
            elif hp < hk or (hp == hk and cr > 0):
                step = ep; i += 1
            else:
                step = ek; j += 1
        out.append(out[-1] + step)
    ring = np.array(out)
    # the merge closes by construction; drop the duplicate end point
    # if present, then re-close
    if np.allclose(ring[0], ring[-1]):
        ring = ring[:-1]
    return np.vstack([ring, ring[:1]])


def buffer_structuring(dist: float, style: str = "square", quadsegs: int = 8) -> np.ndarray:
    """Structuring element ring for ``minkowski_sum_convex`` buffers:
    ``square`` = Chebyshev disc (exact), ``diamond`` = Manhattan disc
    (exact), ``round`` = the reference's quadsegs-per-quarter regular
    polygon approximation of the Euclidean disc (4·quadsegs-gon;
    quadsegs=1 is routed to the exact diamond)."""
    d = float(dist)
    if style == "square":
        ring = np.array([[-d, -d], [d, -d], [d, d], [-d, d]])
    elif style == "diamond" or (style == "round" and quadsegs == 1):
        ring = np.array([[0.0, -d], [d, 0.0], [0.0, d], [-d, 0.0]])
    elif style == "round":
        th = 2.0 * np.pi * np.arange(4 * quadsegs) / (4.0 * quadsegs)
        ring = np.column_stack([d * np.cos(th), d * np.sin(th)])
    else:
        raise ValueError(f"unknown buffer style {style!r}")
    return np.vstack([ring, ring[:1]])


def make_valid_ring(ring: np.ndarray) -> list[np.ndarray]:
    """MakeValid for a self-intersecting ring (OGRGeometry::MakeValid,
    ogr/ogrgeometry.cpp:4183 — the reference delegates to GEOS's
    structure method): node the ring at every PROPER self-crossing,
    then "pinch" it into simple sub-rings — walking the noded vertex
    cycle with a stack, each return to an open crossing point pops one
    simple lobe.  Contract: proper crossings whose occurrence pattern
    along the walk is NESTED or DISJOINT (bowties, figure-eights,
    bowtie chains — the overwhelming bulk of real invalid rings);
    interleaved patterns (star polygons), doubly-wound rings and
    collinear-overlap contact need a full arrangement noder and are
    out of contract.  Returns closed simple rings; Σ|area| is the
    valid region's area."""
    P = ring[:-1] if ring.shape[0] > 1 and np.array_equal(ring[0], ring[-1]) else ring
    P = np.asarray(P, dtype=np.float64)
    n = P.shape[0]
    a0 = P
    a1 = np.roll(P, -1, axis=0)
    r = a1 - a0
    # pairwise proper intersections between non-adjacent edges
    ax, ay = a0[:, None, 0], a0[:, None, 1]
    rx, ry = r[:, None, 0], r[:, None, 1]
    cx, cy = a0[None, :, 0], a0[None, :, 1]
    sx, sy = r[None, :, 0], r[None, :, 1]
    den = rx * sy - ry * sx
    with np.errstate(divide="ignore", invalid="ignore"):
        t = ((cx - ax) * sy - (cy - ay) * sx) / den
        u = ((cx - ax) * ry - (cy - ay) * rx) / den
    proper = (den != 0) & (t > 0) & (t < 1) & (u > 0) & (u < 1)
    iis, jjs = np.nonzero(np.triu(proper, 1))
    per_edge: dict[int, list] = {}
    for pid, (i, j) in enumerate(zip(iis.tolist(), jjs.tolist())):
        x = float(a0[i, 0] + t[i, j] * r[i, 0])
        y = float(a0[i, 1] + t[i, j] * r[i, 1])
        per_edge.setdefault(i, []).append((float(t[i, j]), pid, x, y))
        per_edge.setdefault(j, []).append((float(u[i, j]), pid, x, y))
    # noded cycle: (kind, id, x, y) — kind 0 = original vertex
    seq: list[tuple[int, int, float, float]] = []
    for e in range(n):
        seq.append((0, e, float(P[e, 0]), float(P[e, 1])))
        for alpha, pid, x, y in sorted(per_edge.get(e, [])):
            seq.append((1, pid, x, y))
    if not iis.size:
        return [np.vstack([P, P[:1]])]
    # pinch walk: pop a simple lobe at each crossing-point revisit
    rings: list[np.ndarray] = []
    stack: list[tuple[int, int, float, float]] = []
    open_at: dict[int, int] = {}
    for item in seq:
        kind, pid, x, y = item
        if kind == 1 and pid in open_at:
            k = open_at.pop(pid)
            lobe = stack[k:]
            stack = stack[:k]
            # re-open ids swallowed by the pop
            open_at = {p: i for p, i in open_at.items() if i <= len(stack)}
            pts = np.array([(px, py) for _, _, px, py in lobe] + [(x, y)])
            pts = np.vstack([pts, pts[:1]]) if not np.array_equal(pts[0], pts[-1]) else pts
            rings.append(pts)
            stack.append(item)  # the crossing point rejoins the outer path
        else:
            if kind == 1:
                open_at[pid] = len(stack)
            stack.append(item)
    if len(stack) >= 3:
        pts = np.array([(px, py) for _, _, px, py in stack])
        rings.append(np.vstack([pts, pts[:1]]))
    return rings


def min_distance_batch(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Whole-group min_distance: A (g, na, 2) vertex chains vs
    B (g, nb, 2), one broadcast evaluation for the entire group —
    no per-row Python.  Identical elementwise expression tree as
    min_distance (bitwise parity tested); rows with a proper segment
    crossing return 0."""
    A = np.asarray(A, dtype=np.float64)
    B = np.asarray(B, dtype=np.float64)
    g = A.shape[0]
    a0, a1 = A[:, :-1, :], A[:, 1:, :]
    b0, b1 = B[:, :-1, :], B[:, 1:, :]

    # vertex → opposite-chain-segment distances, both directions
    def pts_to_segs(P, s0, s1):
        # P (g, np, 2), s0/s1 (g, ns, 2) → (g, np, ns)
        px = P[:, :, None, 0]
        py = P[:, :, None, 1]
        ax = s0[:, None, :, 0]
        ay = s0[:, None, :, 1]
        bx = s1[:, None, :, 0]
        by = s1[:, None, :, 1]
        return point_segment_dist(px, py, ax, ay, bx, by)

    best = np.full(g, np.inf)
    if B.shape[1] > 1:
        best = np.minimum(best, pts_to_segs(A, b0, b1).min(axis=(1, 2)))
    if A.shape[1] > 1:
        best = np.minimum(best, pts_to_segs(B, a0, a1).min(axis=(1, 2)))
    if A.shape[1] == 1 and B.shape[1] == 1:
        d = A[:, 0, :] - B[:, 0, :]
        best = np.sqrt(d[:, 0] * d[:, 0] + d[:, 1] * d[:, 1])

    if A.shape[1] > 1 and B.shape[1] > 1:
        # proper-crossing rows → 0 (same _orient strict test)
        ax, ay = a0[:, :, None, 0], a0[:, :, None, 1]
        bx, by = a1[:, :, None, 0], a1[:, :, None, 1]
        cx, cy = b0[:, None, :, 0], b0[:, None, :, 1]
        dx, dy = b1[:, None, :, 0], b1[:, None, :, 1]
        d1 = _orient(ax, ay, bx, by, cx, cy)
        d2 = _orient(ax, ay, bx, by, dx, dy)
        d3 = _orient(cx, cy, dx, dy, ax, ay)
        d4 = _orient(cx, cy, dx, dy, bx, by)
        crossing = ((d1 * d2 < 0) & (d3 * d4 < 0)).any(axis=(1, 2))
        best = np.where(crossing, 0.0, best)
    return best


def organize_rings(rings: list) -> list:
    """OGRGeometryFactory::organizePolygons METHOD=DEFAULT semantics
    (ogr/ogrgeometryfactory.cpp:organizePolygons), pinned: a ring
    contained in an ODD number of other rings is a HOLE; its parent is
    the smallest-area containing ring with EVEN containment depth (a
    shell).  Rings are assumed non-crossing (the reference's input
    contract).  Returns [(index, parent_index_or_-1, 'shell'|'hole')]
    in input order; containment tested by a representative vertex with
    boundary excluded (rings sharing edges are not mutual containers).
    """
    from gdal_spark.kernels.pip import points_in_polygon

    n = len(rings)
    opened = []
    areas = []
    for r in rings:
        rr = np.asarray(r, dtype=np.float64)
        if rr.shape[0] > 1 and np.array_equal(rr[0], rr[-1]):
            core = rr[:-1]
        else:
            core = rr
            rr = np.vstack([rr, rr[:1]])
        opened.append((core, rr))
        areas.append(abs(0.5 * float(np.sum(
            core[:, 0] * np.roll(core[:, 1], -1)
            - np.roll(core[:, 0], -1) * core[:, 1]
        ))))
    contains = np.zeros((n, n), dtype=bool)  # contains[i, j]: i ⊇ j
    for i in range(n):
        _core_i, closed_i = opened[i]
        for j in range(n):
            if i == j:
                continue
            rep = opened[j][0][0]
            contains[i, j] = bool(
                points_in_polygon(
                    np.array([rep[0]]), np.array([rep[1]]), [closed_i],
                    include_boundary=False,
                )[0]
            )
    depth = contains.sum(axis=0)
    out = []
    for j in range(n):
        if depth[j] % 2 == 0:
            out.append((j, -1, "shell"))
            continue
        parents = [
            i for i in range(n) if contains[i, j] and depth[i] % 2 == 0
        ]
        parent = min(parents, key=lambda i: (areas[i], i))
        out.append((j, parent, "hole"))
    return out
