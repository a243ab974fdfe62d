"""General (concave) polygon overlay kernel — Greiner–Hormann
clipping, pure NumPy + O(vertices) traversal.

Reference surface: the 7-op layer algebra on arbitrary GEOS geometry
(ogr/ogrsf_frmts/generic/ogrlayer.cpp:5385-7846) and the binary
predicate family (ogr/ogrgeometry.cpp:575-6409).  The reference
delegates to GEOS; this kernel re-states the published
Greiner–Hormann algorithm (Greiner & Hormann 1998, "Efficient clipping
of arbitrary polygons") directly:

  1. pairwise proper segment intersections (vectorized broadcast);
  2. intersection nodes inserted into both rings ordered by edge
     parameter alpha, cross-linked;
  3. entry/exit flags by parity from a point-in-polygon test of each
     ring's first vertex;
  4. traversal: walk forward from entries / backward from exits,
     switching rings at each intersection — flag inversion selects the
     boolean op (intersection / union / difference).

GENERAL-POSITION CONTRACT: this fast float path requires no
vertex-on-edge contacts and no collinear overlapping edges (the
classic GH degeneracy).  `clip_area_robust` detects violations and
routes them to the EXACT rational arrangement noder
(kernels/arrangement.py) — tolerance-0 on every degeneracy class.

Results are lists of rings; traversal orientation makes signed
(shoelace) areas sum to the true region area, including holes (e.g.
A − B with B strictly inside A yields A's ring plus B reversed).
"""

from __future__ import annotations

import numpy as np

from gdal_spark.kernels.pip import points_in_polygon


def _ring_signed_area(ring: np.ndarray) -> float:
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    return 0.5 * float(np.sum(x0 * y1 - x1 * y0))


def _close(ring: np.ndarray) -> np.ndarray:
    if ring.shape[0] and not np.array_equal(ring[0], ring[-1]):
        return np.vstack([ring, ring[:1]])
    return ring


def _open(ring: np.ndarray) -> np.ndarray:
    if ring.shape[0] >= 2 and np.array_equal(ring[0], ring[-1]):
        return ring[:-1]
    return ring


def _inside(pt: np.ndarray, ring: np.ndarray) -> bool:
    return bool(
        points_in_polygon(
            np.array([pt[0]]), np.array([pt[1]]), [_close(ring)],
            include_boundary=False,
        )[0]
    )


class _Node:
    __slots__ = ("x", "y", "inter", "entry", "pair", "visited")

    def __init__(self, x, y, inter=False, pair=-1):
        self.x = x
        self.y = y
        self.inter = inter
        self.entry = False
        self.pair = pair
        self.visited = False


def _build_lists(P: np.ndarray, Q: np.ndarray):
    """Insert all proper intersections into both vertex cycles.
    Returns (subj_nodes, clip_nodes, n_inter)."""
    P = _open(np.asarray(P, dtype=np.float64))
    Q = _open(np.asarray(Q, dtype=np.float64))
    a0 = P
    a1 = np.roll(P, -1, axis=0)
    b0 = Q
    b1 = np.roll(Q, -1, axis=0)
    ax, ay = a0[:, None, 0], a0[:, None, 1]
    rx, ry = (a1 - a0)[:, None, 0], (a1 - a0)[:, None, 1]
    cx, cy = b0[None, :, 0], b0[None, :, 1]
    sx, sy = (b1 - b0)[None, :, 0], (b1 - b0)[None, :, 1]
    den = rx * sy - ry * sx
    with np.errstate(divide="ignore", invalid="ignore"):
        t = ((cx - ax) * sy - (cy - ay) * sx) / den
        u = ((cx - ax) * ry - (cy - ay) * rx) / den
    proper = (den != 0) & (t > 0) & (t < 1) & (u > 0) & (u < 1)
    iis, jjs = np.nonzero(proper)
    per_a: dict[int, list] = {}
    per_b: dict[int, list] = {}
    for pid, (i, j) in enumerate(zip(iis.tolist(), jjs.tolist())):
        tt = float(t[i, j])
        uu = float(u[i, j])
        x = float(a0[i, 0] + tt * (a1[i, 0] - a0[i, 0]))
        y = float(a0[i, 1] + tt * (a1[i, 1] - a0[i, 1]))
        per_a.setdefault(i, []).append((tt, pid, x, y))
        per_b.setdefault(j, []).append((uu, pid, x, y))

    def make(poly, per_edge):
        nodes: list[_Node] = []
        for e in range(poly.shape[0]):
            nodes.append(_Node(float(poly[e, 0]), float(poly[e, 1])))
            for alpha, pid, x, y in sorted(per_edge.get(e, [])):
                nodes.append(_Node(x, y, inter=True, pair=pid))
        return nodes

    return make(P, per_a), make(Q, per_b), len(iis), P, Q


def _mark_entries(nodes, other_ring, invert: bool):
    """Parity marking: walking the ring, the state toggles at every
    intersection; the first intersection after an OUTSIDE stretch is an
    entry (into the other polygon)."""
    first = next((n for n in nodes if not n.inter), nodes[0])
    inside = _inside(np.array([first.x, first.y]), other_ring)
    # rotate so we start from that original vertex
    start = nodes.index(first)
    status = inside
    for k in range(len(nodes)):
        n = nodes[(start + k) % len(nodes)]
        if n.inter:
            n.entry = (not status) ^ invert
            status = not status


def general_clip(P: np.ndarray, Q: np.ndarray, op: str) -> list[np.ndarray]:
    """Boolean overlay of two simple rings in general position.
    op ∈ {'intersection', 'union', 'difference'} (difference = P − Q).
    Returns a list of closed rings whose SIGNED areas sum to the
    result's area (holes come out with opposite orientation)."""
    subj, clip, n_inter, P2, Q2 = _build_lists(P, Q)

    if n_inter == 0:
        p_in_q = _inside(P2[0], Q2)
        q_in_p = _inside(Q2[0], P2)
        if op == "intersection":
            if p_in_q:
                return [_close(P2)]
            if q_in_p:
                return [_close(Q2)]
            return []
        if op == "union":
            if p_in_q:
                return [_close(Q2)]
            if q_in_p:
                return [_close(P2)]
            return [_close(P2), _close(Q2)]
        if op == "difference":
            if p_in_q:
                return []
            if q_in_p:
                return [_close(P2), _close(Q2)[::-1]]  # hole
            return [_close(P2)]
        raise ValueError(op)

    inv_s, inv_c = {
        "intersection": (False, False),
        "union": (True, True),
        "difference": (True, False),
    }[op]
    _mark_entries(subj, Q2, inv_s)
    _mark_entries(clip, P2, inv_c)
    pair_to_clip = {n.pair: k for k, n in enumerate(clip) if n.inter}
    pair_to_subj = {n.pair: k for k, n in enumerate(subj) if n.inter}

    rings = []
    for s_idx, start in enumerate(subj):
        if not start.inter or start.visited:
            continue
        ring = [(start.x, start.y)]
        cur_nodes, cur_idx = subj, s_idx
        start_pair = start.pair
        while True:
            node = cur_nodes[cur_idx]
            node.visited = True
            step = 1 if node.entry else -1
            while True:
                cur_idx = (cur_idx + step) % len(cur_nodes)
                node = cur_nodes[cur_idx]
                ring.append((node.x, node.y))
                if node.inter:
                    break
            node.visited = True
            # switch rings at the twin node
            if cur_nodes is subj:
                cur_nodes, cur_idx = clip, pair_to_clip[node.pair]
            else:
                cur_nodes, cur_idx = subj, pair_to_subj[node.pair]
            cur_nodes[cur_idx].visited = True
            if cur_nodes[cur_idx].pair == start_pair:
                break
        arr = np.array(ring)
        rings.append(_close(arr))
    return rings


def region_area(rings: list[np.ndarray]) -> float:
    """True area of an overlay result: Σ |ring| · (−1)^depth, where
    depth counts enclosing rings.  GH traversal does not emit a
    consistent orientation across disjoint pieces, so hole-vs-exterior
    is decided by NESTING (rings are vertex-disjoint and non-crossing
    under the general-position contract — one representative edge
    midpoint per ring suffices)."""
    total = 0.0
    for i, r in enumerate(rings):
        rep = (r[0] + r[1]) / 2.0
        depth = sum(
            1 for j, o in enumerate(rings) if j != i and _inside(rep, o)
        )
        total += abs(_ring_signed_area(r)) * (1.0 if depth % 2 == 0 else -1.0)
    return total


def clip_area(P: np.ndarray, Q: np.ndarray, op: str) -> float:
    """Area of the boolean overlay of two simple rings.

    Only INTERSECTION is measured by GH traversal; union and
    difference derive from it through the exact measure identities
        |P ∪ Q| = |P| + |Q| − |P ∩ Q|
        |P − Q| = |P| − |P ∩ Q|
    which hold for any measurable sets.  The GH difference traversal
    (kept in `general_clip` for ring-structure tests) mis-signs rings
    on some general-position concave pairs (hypothesis seed 4550:
    6.119 vs true 169.084), so the AREA surface never uses it — the
    intersection traversal, which both the float path and the exact
    rational noder agree on, is the single source of truth.
    Reference semantics: ogr/ogrlayer.cpp:5755 (Difference),
    :5874 (SymDifference)."""
    inter = region_area(general_clip(P, Q, "intersection"))
    if op == "intersection":
        return inter
    area_p = abs(_ring_signed_area(_close(_open(np.asarray(P, dtype=np.float64)))))
    if op == "difference":
        return area_p - inter
    area_q = abs(_ring_signed_area(_close(_open(np.asarray(Q, dtype=np.float64)))))
    if op == "union":
        return area_p + area_q - inter
    if op == "symdifference":
        return area_p + area_q - 2.0 * inter
    raise ValueError(op)


# --- degeneracy handling ---------------------------------------------------


def is_degenerate_pair(P: np.ndarray, Q: np.ndarray) -> bool:
    """True when (P, Q) violates the general-position contract: some
    vertex of one ring lies ON an edge of the other (closed span —
    this also catches shared vertices and collinear overlapping edges,
    since any collinear overlap puts at least one endpoint inside or
    on the other edge's span)."""
    P = _open(np.asarray(P, dtype=np.float64))
    Q = _open(np.asarray(Q, dtype=np.float64))

    def vertex_on_edge(V: np.ndarray, R: np.ndarray) -> bool:
        a0 = R
        a1 = np.roll(R, -1, axis=0)
        e = a1 - a0  # (E, 2)
        w = V[:, None, :] - a0[None, :, :]  # (V, E, 2)
        cross = w[..., 0] * e[None, :, 1] - w[..., 1] * e[None, :, 0]
        dot = w[..., 0] * e[None, :, 0] + w[..., 1] * e[None, :, 1]
        ll = (e * e).sum(axis=1)[None, :]
        # relative tolerance, not exact float zero: a vertex lying
        # geometrically on an edge whose contact point is not double-
        # representable has a tiny nonzero cross product; routing such
        # near-degenerate pairs to the exact noder is always SAFE (it
        # only costs speed), whereas leaving them on the GH float path
        # can break entry/exit parity marking.  The reference tolerates
        # this class via GEOS snap-rounding.  Scale = |w|·|e| (the
        # cross-product magnitude bound).
        scale = np.hypot(w[..., 0], w[..., 1]) * np.hypot(
            e[None, :, 0], e[None, :, 1]
        )
        near = (np.abs(cross) <= 1e-12 * scale) & (dot >= -1e-12 * ll) & (
            dot <= ll * (1.0 + 1e-12)
        )
        return bool(np.any(near))

    return vertex_on_edge(Q, P) or vertex_on_edge(P, Q)


def clip_area_robust(P: np.ndarray, Q: np.ndarray, op: str) -> float:
    """`clip_area` with the reference's effective robustness contract
    (GEOS noding handles degenerate contact; OGRGeometry overlay never
    rejects shared edges): general-position pairs take the fast GH
    float path; degenerate pairs route to the EXACT rational
    arrangement noder (kernels/arrangement.py — the full-noder upgrade
    of the earlier micro-perturbation, tolerance 0 on shared edges,
    vertex contact, collinear overlap, identical rings)."""
    Pa = np.asarray(P, dtype=np.float64)
    Qa = np.asarray(Q, dtype=np.float64)
    if not is_degenerate_pair(Pa, Qa):
        return clip_area(Pa, Qa, op)
    from gdal_spark.kernels.arrangement import overlay_area_exact

    return overlay_area_exact(Pa, Qa, op)
