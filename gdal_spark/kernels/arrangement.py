"""Exact planar arrangement — the full noder the GH kernel's
perturbation path approximates (the reference gets this from GEOS's
snap-rounding noder; here it is EXACT rational arithmetic instead).

Scope: boolean overlay areas of two polygons (any degeneracy — shared
edges, vertex-on-edge, collinear overlap, identical rings) and valid
areas of arbitrarily self-intersecting rings, both by the same
construction:

  1. every input edge becomes a segment tagged with an ownership mask
     (bit 0 = polygon P, bit 1 = polygon Q);
  2. all pairwise intersections — proper crossings, endpoint contacts,
     collinear overlaps — computed in ``fractions.Fraction`` (exact:
     intersections of rational segments are rational), each segment
     split at every incident point;
  3. coincident subsegments MERGE with per-owner XOR (masks are
     multiplicity PARITIES: a P+Q shared edge toggles both, two
     coincident edges of one ring cancel — even-odd); zero-mask edges
     drop;
  4. half-edge face tracing: outgoing edges sorted around each vertex
     by exact direction comparator (quadrant + cross product — no
     atan2), next-in-face = rotational predecessor of the twin
     (left-face convention: interior cycles CCW);
  5. cycle classification is COMBINATORIAL: BFS across the cycle
     adjacency toggling P/Q parity per crossed edge's mask, each
     connected component seeded by an exact downward ray-cast from its
     lowest vertex (which sees none of its own component's edges);
     region areas are SIGNED sums over all cycles of a parity class,
     so island (CW) cycles subtract their holes.

Areas come from exact shoelace sums of the traced boundaries; the op
selects faces by parity mask.  Cost is O(E²) pairwise noding — right
for per-feature kernels (tens of vertices) driven from a pandas UDF,
NOT for one giant geometry; the distributed tiling keeps features
small long before this matters.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np

__all__ = [
    "overlay_area_exact",
    "valid_area_exact",
    "overlay_geoms_exact",
    "valid_geoms_exact",
]


def _fr(x) -> Fraction:
    """Exact rational image of the input.  ``Fraction(float)`` is already
    EXACT for every finite double (binary expansion, denominator a power
    of two) — no snapping: a collinear double triple stays collinear in
    rational space, which the tolerance-0 contract depends on.
    Denominators can grow large through chained intersections; that is a
    speed cost only, never a correctness one (per-feature kernel scope)."""
    return Fraction(x)


def _ring_segments(ring: np.ndarray, owner: int):
    pts = ring[:-1] if ring.shape[0] > 1 and np.array_equal(ring[0], ring[-1]) else ring
    out = []
    n = len(pts)
    for i in range(n):
        a = (_fr(float(pts[i][0])), _fr(float(pts[i][1])))
        b = (_fr(float(pts[(i + 1) % n][0])), _fr(float(pts[(i + 1) % n][1])))
        if a != b:
            out.append((a, b, owner))
    return out


def _on_segment(p, a, b) -> bool:
    """p strictly between or at endpoints of collinear a-b assumed
    collinear is NOT assumed — full check."""
    cross = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])
    if cross != 0:
        return False
    dot = (p[0] - a[0]) * (b[0] - a[0]) + (p[1] - a[1]) * (b[1] - a[1])
    ll = (b[0] - a[0]) ** 2 + (b[1] - a[1]) ** 2
    return 0 <= dot <= ll


def _seg_intersections(a0, a1, b0, b1):
    """All points where segment a meets segment b (0, 1, or the 2
    overlap endpoints), exact."""
    r = (a1[0] - a0[0], a1[1] - a0[1])
    s = (b1[0] - b0[0], b1[1] - b0[1])
    den = r[0] * s[1] - r[1] * s[0]
    pts = []
    if den != 0:
        t = ((b0[0] - a0[0]) * s[1] - (b0[1] - a0[1]) * s[0]) / den
        u = ((b0[0] - a0[0]) * r[1] - (b0[1] - a0[1]) * r[0]) / den
        if 0 <= t <= 1 and 0 <= u <= 1:
            pts.append((a0[0] + t * r[0], a0[1] + t * r[1]))
        return pts
    # parallel: collinear overlap contributes every endpoint of one
    # lying on the other
    for p in (b0, b1):
        if _on_segment(p, a0, a1):
            pts.append(p)
    for p in (a0, a1):
        if _on_segment(p, b0, b1):
            pts.append(p)
    return pts


def _node(segments):
    """Split every segment at every incident intersection point; merge
    coincident subsegments with per-owner XOR (multiplicity parity).
    Returns {undirected edge: owner_mask}, zero-mask edges dropped."""
    n = len(segments)
    splits = [set() for _ in range(n)]
    # float bbox PREFILTER before the O(n²) exact intersections: the
    # float image of each exact endpoint is within 1 ulp, so an
    # absolute margin of 1e-6·scale can never exclude a true intersection
    # — candidates only, exactness untouched.  Cuts Fraction work ~4×.
    bb = np.empty((max(n, 1), 4))
    for i, (a0, a1, _) in enumerate(segments):
        x0, x1 = float(a0[0]), float(a1[0])
        y0, y1 = float(a0[1]), float(a1[1])
        bb[i, 0] = x0 if x0 < x1 else x1
        bb[i, 1] = y0 if y0 < y1 else y1
        bb[i, 2] = x1 if x0 < x1 else x0
        bb[i, 3] = y1 if y0 < y1 else y0
    eps = 1e-6 * (1.0 + float(np.abs(bb[:n]).max())) if n else 0.0
    for i in range(n):
        a0, a1, _ = segments[i]
        splits[i].update((a0, a1))
        if i + 1 >= n:
            continue
        tail = bb[i + 1 : n]
        cand = np.nonzero(
            (tail[:, 0] <= bb[i, 2] + eps)
            & (tail[:, 2] >= bb[i, 0] - eps)
            & (tail[:, 1] <= bb[i, 3] + eps)
            & (tail[:, 3] >= bb[i, 1] - eps)
        )[0]
        for j in (cand + i + 1).tolist():
            b0, b1, _ = segments[j]
            for p in _seg_intersections(a0, a1, b0, b1):
                splits[i].add(p)
                splits[j].add(p)
    edges: dict[tuple, int] = {}
    for i, (a0, a1, owner) in enumerate(segments):
        dx, dy = a1[0] - a0[0], a1[1] - a0[1]
        # order split points along the segment
        def key(p):
            return (p[0] - a0[0]) * dx + (p[1] - a0[1]) * dy

        pts = sorted(splits[i], key=key)
        for u, v in zip(pts, pts[1:]):
            if u == v:
                continue
            e = (u, v) if (u <= v) else (v, u)
            # per-bit XOR: masks are PARITIES of edge multiplicity per
            # owner — two coincident edges of the same ring cancel
            # (even-odd), a P+Q shared edge toggles both
            edges[e] = edges.get(e, 0) ^ owner
    return {e: m for e, m in edges.items() if m != 0}


def _dir_key(dx: Fraction, dy: Fraction):
    """Total order on directions: quadrant index then slope (exact)."""
    if dx > 0 and dy >= 0:
        q = 0
    elif dx <= 0 and dy > 0:
        q = 1
    elif dx < 0 and dy <= 0:
        q = 2
    else:
        q = 3
    # within a quadrant, compare by dy/dx equivalent: sort key uses the
    # pair against cross products — return a callable-friendly tuple
    return q, dx, dy


def _sort_around(vecs):
    """Sort direction vectors CCW starting from +x axis, exactly."""
    def cmp_key(v):
        return _dir_key(v[0], v[1])[0]

    # bucket by quadrant, then exact cross-product sort inside
    import functools

    def cross_cmp(u, v):
        c = u[0] * v[1] - u[1] * v[0]
        return -1 if c > 0 else (1 if c < 0 else 0)

    buckets = {0: [], 1: [], 2: [], 3: []}
    for v in vecs:
        buckets[cmp_key(v)].append(v)
    out = []
    for q in range(4):
        out.extend(sorted(buckets[q], key=functools.cmp_to_key(cross_cmp)))
    return out


def _build_faces(edges, return_rot: bool = False):
    """Half-edge face tracing.  Returns (faces, edge_faces) where
    faces = list of (signed_area_fraction, boundary half-edges) and
    edge_faces maps each undirected edge to the (up to 2) face ids
    flanking it.  With ``return_rot``, also returns the per-vertex
    rotation map {vertex: {neighbor: CCW-predecessor neighbor}} used
    for region-boundary tracing."""
    # outgoing half-edges per vertex, rotationally sorted
    out_edges: dict[tuple, list] = {}
    for (u, v) in edges:
        out_edges.setdefault(u, []).append(v)
        out_edges.setdefault(v, []).append(u)
    rot: dict[tuple, dict[tuple, tuple]] = {}
    for u, nbrs in out_edges.items():
        vecs = [(v[0] - u[0], v[1] - u[1], v) for v in nbrs]
        ordered = _sort_around([(dx, dy) for dx, dy, _ in vecs])
        # map direction back to neighbor (directions are unique at a
        # vertex after merging coincident edges)
        bydir = {(dx, dy): v for dx, dy, v in vecs}
        ring = [bydir[d] for d in ordered]
        # predecessor in CCW rotation = the "clockwise-most" turn, the
        # left-face convention: interior faces trace CCW (positive),
        # the unbounded face traces CW (most negative signed area)
        rot[u] = {ring[i]: ring[i - 1] for i in range(len(ring))}

    visited = set()
    faces = []
    edge_faces: dict[tuple, list] = {}
    for (u0, v0) in edges:
        for start in ((u0, v0), (v0, u0)):
            if start in visited:
                continue
            face_id = len(faces)
            boundary = []
            area2 = Fraction(0)
            he = start
            while he not in visited:
                visited.add(he)
                boundary.append(he)
                a, b = he
                area2 += a[0] * b[1] - b[0] * a[1]
                # next half-edge: rotational successor of the twin at b
                nxt = rot[b][a]
                he = (b, nxt)
            for a, b in boundary:
                e = (a, b) if a <= b else (b, a)
                edge_faces.setdefault(e, []).append(face_id)
            faces.append((area2 / 2, boundary))
    if return_rot:
        return faces, edge_faces, rot
    return faces, edge_faces


def _ray_parity(p, edges) -> tuple[int, int]:
    """Exact even-odd crossing parities (P, Q) of the vertical
    downward ray from ``p`` (half-open x-span rule; strict y < p.y, so
    edges incident to p never count)."""
    px, py = p
    pP = pQ = 0
    for (a, b), mask in edges.items():
        ax, ay = a
        bx, by = b
        if ax == bx:
            continue
        lo, hi = (ax, bx) if ax < bx else (bx, ax)
        if not (lo <= px < hi):
            continue
        y = ay + (px - ax) * (by - ay) / (bx - ax)
        if y < py:
            pP ^= mask & 1
            pQ ^= (mask >> 1) & 1
    return pP, pQ


def _face_parities(faces, edge_faces, edges):
    """BFS over face adjacency toggling owner parities across each
    crossed edge.  Each CONNECTED component is seeded separately: its
    outermost (most negative) cycle takes the exact ray-cast parity of
    its lowest vertex's surroundings — the lowest vertex of a
    component sees none of its own component's edges below it, so the
    ray parity is exactly the enclosing region's."""
    parity: dict[int, tuple[int, int]] = {}
    remaining = set(range(len(faces)))
    while remaining:
        seed = min(remaining, key=lambda i: faces[i][0])
        p0 = min(min(he[0] for he in faces[seed][1]),
                 min(he[1] for he in faces[seed][1]))
        parity[seed] = _ray_parity(p0, edges)
        remaining.discard(seed)
        frontier = [seed]
        while frontier:
            f = frontier.pop()
            pP, pQ = parity[f]
            for a, b in faces[f][1]:
                e = (a, b) if a <= b else (b, a)
                mask = edges[e]
                for g in edge_faces[e]:
                    if g == f or g in parity:
                        continue
                    parity[g] = (pP ^ (mask & 1), pQ ^ ((mask >> 1) & 1))
                    remaining.discard(g)
                    frontier.append(g)
    return parity


def _areas_by_parity(P_rings, Q_rings):
    segs = []
    for r in P_rings:
        segs.extend(_ring_segments(np.asarray(r, dtype=np.float64), 1))
    for r in Q_rings:
        segs.extend(_ring_segments(np.asarray(r, dtype=np.float64), 2))
    edges = _node(segs)
    faces, edge_faces = _build_faces(edges)
    parity = _face_parities(faces, edge_faces, edges)
    sums = {(0, 0): Fraction(0), (0, 1): Fraction(0),
            (1, 0): Fraction(0), (1, 1): Fraction(0)}
    # signed sum over ALL cycles: a region bounded by an outer CCW
    # cycle and island CW cycles (holes) gets its holes subtracted,
    # because island cycles carry the REGION's parity with negative
    # area; the global outer cycle lands in class (0,0), never read
    for f, (a2, _b) in enumerate(faces):
        sums[parity[f]] += a2
    return sums


def overlay_area_exact(P: np.ndarray, Q: np.ndarray, op: str) -> float:
    """Exact boolean-overlay area for two rings with ANY degeneracy."""
    sums = _areas_by_parity([P], [Q])
    pick = {
        "intersection": [(1, 1)],
        "union": [(1, 0), (0, 1), (1, 1)],
        "difference": [(1, 0)],
        "symdifference": [(1, 0), (0, 1)],
    }[op]
    return float(sum((sums[k] for k in pick), Fraction(0)))


def valid_area_exact(ring: np.ndarray) -> float:
    """Exact even-odd (MakeValid) area of an arbitrarily
    self-intersecting ring — interleaved crossings, doubly-wound
    regions (even-odd ⇒ excluded) and all."""
    sums = _areas_by_parity([ring], [])
    return float(sums[(1, 0)] + sums[(1, 1)])


# --- geometry (WKB-ring) emission -------------------------------------------
# The reference's OGRLayer::Intersection/Union/... emit the clipped
# GEOMETRIES (ogr/ogrsf_frmts/generic/ogrlayer.cpp:5385-7846, via the
# GEOS overlay); this reconstructs the result rings from the same
# exact arrangement the area path classifies.

_PICK = {
    "intersection": ((1, 1),),
    "union": ((1, 0), (0, 1), (1, 1)),
    "difference": ((1, 0),),
    "symdifference": ((1, 0), (0, 1)),
}


def _arrangement(P_rings, Q_rings):
    segs = []
    for r in P_rings:
        segs.extend(_ring_segments(np.asarray(r, dtype=np.float64), 1))
    for r in Q_rings:
        segs.extend(_ring_segments(np.asarray(r, dtype=np.float64), 2))
    edges = _node(segs)
    faces, edge_faces, rot = _build_faces(edges, return_rot=True)
    parity = _face_parities(faces, edge_faces, edges)
    return edges, faces, edge_faces, rot, parity


def _drop_collinear(cyc):
    """Remove exactly-collinear interior vertices (rational cross == 0)
    from a cyclic vertex list — the emitted-ring contract is MINIMAL
    rings: noding points introduced by the arrangement that lie on a
    straight chain of the result boundary do not survive to the
    output."""
    out = list(cyc)
    changed = True
    while changed and len(out) > 2:
        changed = False
        for i in range(len(out)):
            p = out[i - 1]
            v = out[i]
            n = out[(i + 1) % len(out)]
            cross = (v[0] - p[0]) * (n[1] - p[1]) - (v[1] - p[1]) * (n[0] - p[0])
            if cross == 0:
                out.pop(i)
                changed = True
                break
    return out


def _ring_parity_point(p, ring_pts) -> bool:
    """Exact even-odd containment of point p in the closed cycle
    ring_pts (list of Fraction pairs), downward-ray half-open rule."""
    px, py = p
    inside = False
    n = len(ring_pts)
    for i in range(n):
        a = ring_pts[i]
        b = ring_pts[(i + 1) % n]
        ax, ay = a
        bx, by = b
        if ax == bx:
            continue
        lo, hi = (ax, bx) if ax < bx else (bx, ax)
        if not (lo <= px < hi):
            continue
        y = ay + (px - ax) * (by - ay) / (bx - ax)
        if y < py:
            inside = not inside
    return inside


def _region_polygons(edges, faces, edge_faces, rot, parity, pick):
    """Trace the merged boundary of the union of all faces whose parity
    is in ``pick`` and assemble polygons.

    Directed boundary half-edges keep the region on the LEFT; interior
    edges (both flanking faces selected) and bridges drop.  Tracing
    restricted to boundary edges uses the same rotational-predecessor
    rule as face tracing (= face tracing on the reduced graph), so
    checkerboard pinch vertices (symdifference at a proper boundary
    crossing, star-lobe contact) come out as SEPARATE rings touching at
    the vertex — the (A−B) ⊎ (B−A) decomposition.

    Returns [ (exterior, [holes...]) ] with vertices as Fraction pairs,
    exteriors CCW, holes CW, collinear noding vertices removed, each
    ring rotated to start at its lexicographic-min vertex, polygons
    sorted by that start vertex."""
    pickset = set(pick)
    sel = [parity[f] in pickset for f in range(len(faces))]
    boundary = set()
    for f in range(len(faces)):
        if not sel[f]:
            continue
        for (a, b) in faces[f][1]:
            e = (a, b) if a <= b else (b, a)
            flank = edge_faces[e]
            other = flank[0] if flank[1] == f else flank[1]
            if not sel[other]:
                boundary.add((a, b))

    visited = set()
    cycles = []
    for start in sorted(boundary):
        if start in visited:
            continue
        cyc = []
        he = start
        while he not in visited:
            visited.add(he)
            cyc.append(he[0])
            a, b = he
            c = rot[b][a]
            guard = len(rot[b]) + 1
            while (b, c) not in boundary:
                c = rot[b][c]
                guard -= 1
                if guard < 0:
                    raise RuntimeError("boundary trace: no outgoing edge")
            he = (b, c)
        cyc = _drop_collinear(cyc)
        if len(cyc) < 3:
            continue
        a2 = Fraction(0)
        n = len(cyc)
        for i in range(n):
            a = cyc[i]
            b = cyc[(i + 1) % n]
            a2 += a[0] * b[1] - b[0] * a[1]
        # rotate to lexicographic-min start (deterministic output)
        k = min(range(n), key=lambda i: cyc[i])
        cyc = cyc[k:] + cyc[:k]
        cycles.append((a2 / 2, cyc))

    exteriors = [(a, c) for a, c in cycles if a > 0]
    holes = [(a, c) for a, c in cycles if a < 0]
    exteriors.sort(key=lambda t: t[1][0])
    polys = [(c, []) for _a, c in exteriors]
    for ha, hc in holes:
        # representative: exact midpoint of the hole's first edge —
        # strictly interior to the parent exterior (coincident edges
        # merged away in the arrangement, so a hole edge never lies on
        # an exterior edge); parent = SMALLEST containing exterior
        rep = (
            (hc[0][0] + hc[1][0]) / 2,
            (hc[0][1] + hc[1][1]) / 2,
        )
        best = None
        for idx, (ea, ec) in enumerate(exteriors):
            if _ring_parity_point(rep, ec):
                if best is None or ea < exteriors[best][0]:
                    best = idx
        if best is None:
            raise RuntimeError("orphan hole in region tracing")
        polys[best][1].append(hc)
    for _ext, hs in polys:
        hs.sort(key=lambda c: c[0])
    return polys


def _to_float_ring(cyc) -> np.ndarray:
    arr = np.array(
        [[float(x), float(y)] for x, y in cyc] + [[float(cyc[0][0]), float(cyc[0][1])]],
        dtype=np.float64,
    )
    return arr


def _as_ring_list(x):
    if isinstance(x, np.ndarray):
        return [x]
    return list(x)


def overlay_geoms_exact(P, Q, op: str):
    """Exact boolean-overlay GEOMETRY for two even-odd regions (single
    ring or list of rings — holes and disjoint pieces both work as
    parity) with any degeneracy: list of polygons, each
    [exterior, holes...] as closed float64 rings (exterior CCW, holes
    CW, minimal vertices, pinned start vertex + ordering — see
    _region_polygons)."""
    edges, faces, edge_faces, rot, parity = _arrangement(
        _as_ring_list(P), _as_ring_list(Q)
    )
    polys = _region_polygons(edges, faces, edge_faces, rot, parity, _PICK[op])
    return [[_to_float_ring(ext)] + [_to_float_ring(h) for h in hs]
            for ext, hs in polys]


def valid_geoms_exact(ring: np.ndarray):
    """Exact even-odd MakeValid GEOMETRY of an arbitrarily
    self-intersecting (incl. star-interleaved / doubly-wound) ring:
    the odd-parity lobes as polygons (same output contract as
    overlay_geoms_exact).  Reference: OGRGeometry::MakeValid
    (ogr/ogrgeometry.cpp:4183)."""
    edges, faces, edge_faces, rot, parity = _arrangement([ring], [])
    polys = _region_polygons(edges, faces, edge_faces, rot, parity, ((1, 0),))
    return [[_to_float_ring(ext)] + [_to_float_ring(h) for h in hs]
            for ext, hs in polys]
