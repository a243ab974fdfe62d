"""Polygonize kernels: two-pass connected-component labeling and
boundary→ring extraction, per tile, plus the border-run extraction that
powers the distributed cross-tile merge.

Semantics restate the reference (NOT a copy):
- pass 1: scanline labeling of runs of equal pixel value, with a
  cross-line merge map resolved union-find style; 4-connected by
  default, 8-connected optional (alg/polygonize.cpp:73-300,
  alg/gdalrasterpolygonenumerator.cpp:75-167).
- masked (nodata) pixels produce no feature (mask band filter).
- pass 2: each connected component becomes one polygon: exterior ring
  plus holes, vertices at pixel corners mapped through the
  geotransform (the reference assembles arcs via its edge tracer,
  alg/polygonize_polygonizer.h; we chain directed boundary edges —
  same output rings).

Emission order here is first-pixel scan order (deterministic); the
reference emits in region-completion order.  Tests compare DN multisets
and geometries, not emission order.
"""

from __future__ import annotations

import numpy as np

from gdal_spark.kernels.geodesy import pixel_to_world

__all__ = ["label_tile", "extract_polygons", "border_runs", "region_table"]


class _UnionFind:
    __slots__ = ("parent",)

    def __init__(self):
        self.parent: list[int] = []

    def make(self) -> int:
        self.parent.append(len(self.parent))
        return len(self.parent) - 1

    def find(self, a: int) -> int:
        p = self.parent
        root = a
        while p[root] != root:
            root = p[root]
        while p[a] != root:
            p[a], a = root, p[a]
        return root

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            if ra < rb:
                self.parent[rb] = ra
            else:
                self.parent[ra] = rb


def label_tile(
    values: np.ndarray,
    mask: np.ndarray | None = None,
    connect8: bool = False,
) -> np.ndarray:
    """Label connected components of equal value.  Returns int32 labels
    (0..K-1 in scan order of first pixel), -1 for masked pixels."""
    v = np.asarray(values)
    ny, nx = v.shape
    valid = np.ones((ny, nx), dtype=bool) if mask is None else np.asarray(mask, bool)
    labels = np.full((ny, nx), -1, dtype=np.int64)
    uf = _UnionFind()

    # Pass 1 per row: runs of equal value get provisional labels; merge
    # with the previous row where values match (vectorized row ops).
    prev_lab = None
    prev_v = None
    prev_valid = None
    for r in range(ny):
        row_v = v[r]
        row_valid = valid[r]
        # run starts: first col, value change, validity change
        start = np.empty(nx, dtype=bool)
        start[0] = True
        start[1:] = (row_v[1:] != row_v[:-1]) | (row_valid[1:] != row_valid[:-1])
        run_idx = np.cumsum(start) - 1
        run_starts = np.nonzero(start)[0]
        run_labels = np.full(run_starts.size, -1, dtype=np.int64)
        for i, s in enumerate(run_starts.tolist()):
            if row_valid[s]:
                run_labels[i] = uf.make()
        row_lab = np.where(row_valid, run_labels[run_idx], -1)

        if prev_lab is not None:
            same = row_valid & prev_valid & (row_v == prev_v)
            for c in np.nonzero(same)[0].tolist():
                uf.union(int(row_lab[c]), int(prev_lab[c]))
            if connect8:
                # diagonal neighbors: (r-1, c-1) and (r-1, c+1)
                same_l = row_valid[1:] & prev_valid[:-1] & (row_v[1:] == prev_v[:-1])
                for c in np.nonzero(same_l)[0].tolist():
                    uf.union(int(row_lab[c + 1]), int(prev_lab[c]))
                same_r = row_valid[:-1] & prev_valid[1:] & (row_v[:-1] == prev_v[1:])
                for c in np.nonzero(same_r)[0].tolist():
                    uf.union(int(row_lab[c]), int(prev_lab[c + 1]))
        labels[r] = row_lab
        prev_lab, prev_v, prev_valid = row_lab, row_v, row_valid

    # Pass 2: canonicalize via union-find, renumber in scan order.
    if not uf.parent:
        return labels.astype(np.int32)
    roots = np.array([uf.find(i) for i in range(len(uf.parent))], dtype=np.int64)
    flat = labels.reshape(-1)
    pos = flat >= 0
    flat_roots = np.where(pos, roots[np.where(pos, flat, 0)], -1)
    # renumber roots by first appearance
    seen: dict[int, int] = {}
    order = []
    for root in flat_roots[pos].tolist():
        if root not in seen:
            seen[root] = len(seen)
            order.append(root)
    remap = np.full(len(uf.parent), -1, dtype=np.int64)
    for root, k in seen.items():
        remap[root] = k
    out = np.where(pos, remap[np.where(pos, flat_roots, 0)], -1)
    return out.reshape(ny, nx).astype(np.int32)


def _boundary_edges(labels: np.ndarray, lab: int):
    """Directed unit edges (interior on the inside, clockwise in
    y-down grid coords) of one label's region."""
    m = labels == lab
    ny, nx = m.shape
    pad = np.zeros((ny + 2, nx + 2), dtype=bool)
    pad[1:-1, 1:-1] = m
    edges = []
    rs, cs = np.nonzero(m)
    top = ~pad[rs, cs + 1]
    bot = ~pad[rs + 2, cs + 1]
    left = ~pad[rs + 1, cs]
    right = ~pad[rs + 1, cs + 2]
    for r, c, t, b, lft, rgt in zip(
        rs.tolist(), cs.tolist(), top.tolist(), bot.tolist(), left.tolist(), right.tolist()
    ):
        if t:
            edges.append(((c, r), (c + 1, r)))
        if rgt:
            edges.append(((c + 1, r), (c + 1, r + 1)))
        if b:
            edges.append(((c + 1, r + 1), (c, r + 1)))
        if lft:
            edges.append(((c, r + 1), (c, r)))
    return edges


_DIRS = {(1, 0): 0, (0, 1): 1, (-1, 0): 2, (0, -1): 3}


def _chain_rings(edges) -> list[np.ndarray]:
    """Chain directed edges into closed rings.  At 4-way pinch vertices
    prefer the left-most turn (keeps an 8-connected region's outer
    boundary a single ring through the pinch, matching the tracer)."""
    out_map: dict[tuple, list] = {}
    for a, b in edges:
        out_map.setdefault(a, []).append(b)
    rings = []
    while out_map:
        start = next(iter(out_map))
        ring = [start]
        cur = start
        prev_dir = None
        while True:
            nxts = out_map.get(cur)
            if not nxts:
                break
            if len(nxts) == 1 or prev_dir is None:
                nxt = nxts.pop(0)
            else:
                # left-most turn relative to incoming direction
                def turn_score(candidate):
                    d = (candidate[0] - cur[0], candidate[1] - cur[1])
                    return (_DIRS[d] - prev_dir) % 4
                nxts.sort(key=turn_score, reverse=True)
                nxt = nxts.pop(0)
            if not nxts:
                del out_map[cur]
            prev_dir = _DIRS[(nxt[0] - cur[0], nxt[1] - cur[1])]
            if nxt == start:
                ring.append(nxt)
                break
            ring.append(nxt)
            cur = nxt
        if len(ring) >= 4:
            rings.append(_simplify_collinear(np.array(ring, dtype=np.float64)))
    return rings


def _simplify_collinear(ring: np.ndarray) -> np.ndarray:
    """Drop interior collinear vertices of an orthogonal ring."""
    if ring.shape[0] < 4:
        return ring
    pts = ring[:-1]
    n = pts.shape[0]
    keep = np.ones(n, dtype=bool)
    prv = np.roll(pts, 1, axis=0)
    nxt = np.roll(pts, -1, axis=0)
    collinear = ((pts[:, 0] == prv[:, 0]) & (pts[:, 0] == nxt[:, 0])) | (
        (pts[:, 1] == prv[:, 1]) & (pts[:, 1] == nxt[:, 1])
    )
    keep &= ~collinear
    kept = pts[keep]
    return np.vstack([kept, kept[:1]])


def _ring_area(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def extract_polygons(
    values: np.ndarray,
    labels: np.ndarray,
    gt: tuple[float, ...] = (0.0, 1.0, 0.0, 0.0, 0.0, 1.0),
):
    """→ list of (dn_value, rings) per label, rings in world coords via
    ``gt`` (exterior first, then holes)."""
    nlab = int(labels.max()) + 1 if labels.size else 0
    out = []
    for lab in range(nlab):
        m = labels == lab
        rs, cs = np.nonzero(m)
        dn = values[rs[0], cs[0]]
        rings = _chain_rings(_boundary_edges(labels, lab))
        # with our edge directions (interior kept on the inside walking
        # top→right→bottom→left), exterior rings close with positive
        # shoelace area in y-down grid coords, holes negative
        exts, holes = [], []
        for ring in rings:
            (exts if _ring_area(ring) > 0 else holes).append(ring)
        # one component ⇒ one exterior; keep the largest if tracer
        # split a pinched boundary
        exts.sort(key=lambda r: abs(_ring_area(r)), reverse=True)
        world_rings = []
        for ring in exts[:1] + holes + exts[1:]:
            wx, wy = pixel_to_world(ring[:, 0], ring[:, 1], gt)
            world_rings.append(np.column_stack([wx, wy]))
        out.append((dn, world_rings))
    return out


def border_runs(values: np.ndarray, labels: np.ndarray):
    """Runs of (side, start, end_exclusive, local_label, value) along
    the four tile borders — the unit of the cross-tile label merge
    (two adjacent tiles' facing runs with equal value ⇒ same global
    component)."""
    ny, nx = labels.shape
    out = []
    for side, lab_line, val_line in (
        ("N", labels[0], values[0]),
        ("S", labels[-1], values[-1]),
        ("W", labels[:, 0], values[:, 0]),
        ("E", labels[:, -1], values[:, -1]),
    ):
        n = lab_line.shape[0]
        start = 0
        for i in range(1, n + 1):
            if i == n or lab_line[i] != lab_line[start]:
                if lab_line[start] >= 0:
                    out.append(
                        (side, start, i, int(lab_line[start]), val_line[start])
                    )
                start = i
    return out


def region_table(values: np.ndarray, labels: np.ndarray):
    """Per-label summary (label, dn, pixel_count, min_row, min_col) —
    the zonal/polygonize reduction input."""
    flat_l = labels.reshape(-1)
    pos = flat_l >= 0
    nlab = int(flat_l.max()) + 1 if np.any(pos) else 0
    counts = np.bincount(flat_l[pos], minlength=nlab)
    rows = []
    for lab in range(nlab):
        rs, cs = np.nonzero(labels == lab)
        rows.append(
            (lab, values[rs[0], cs[0]], int(counts[lab]), int(rs.min()), int(cs.min()))
        )
    return rows
