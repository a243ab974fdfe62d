"""Contour extraction: marching squares over the distributed tile
table.

Reference: ``gdal contour`` walks blocks with marching squares
(alg/contour.cpp + alg/marching_squares/*.h).  The distributed form is
the focal pattern: a contour cell's 4 corners are the 2×2 pixel block
whose top-left pixel the cell is named after, so each tile task needs
a 1-pixel halo (right/bottom) — the same boundary-strip exchange as
focal/slope.

Semantics (pinned for the oracle; degenerate-free when the level is
not an attainable z value): corner is "inside" iff z > level; case id
= 1·TL + 2·TR + 4·BR + 8·BL; edge crossings by linear interpolation;
saddles (5, 10) resolved by the cell-center average (the standard
midpoint decider, also what the reference's square walks into for
ambiguous cells).  Output per intersected cell: case id, segment
count, total in-cell polyline length.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.operators.focal import _assemble_padded, _emit_strips

CONTOUR_SCHEMA = T.StructType(
    [
        T.StructField("cx", T.LongType()),
        T.StructField("cy", T.LongType()),
        T.StructField("case_id", T.IntegerType()),
        T.StructField("n_seg", T.IntegerType()),
        T.StructField("seg_len", T.DoubleType()),
    ]
)


def contour_cells(
    tiles: DataFrame, level: float, tile_size: int, width: int, height: int
) -> DataFrame:
    """(cx, cy, case_id, n_seg, seg_len) for every cell the iso-line at
    ``level`` crosses.  Cells are (width-1) × (height-1)."""
    ntx = (width + tile_size - 1) // tile_size
    nty = (height + tile_size - 1) // tile_size
    ts = tile_size
    strips = _emit_strips(tiles, ts, 1, ntx, nty)

    def per_tile(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(key[0]), int(key[1])
        z = _assemble_padded(pdf, ts, 1)
        # owned cells: TL pixel local (0..ts-1); padded offset +1
        c = slice(1, 1 + ts)
        p1 = slice(2, 2 + ts)
        zTL = z[c, c]
        zTR = z[c, p1]
        zBR = z[p1, p1]
        zBL = z[p1, c]
        L = level
        case = (
            (zTL > L).astype(np.int64)
            + 2 * (zTR > L).astype(np.int64)
            + 4 * (zBR > L).astype(np.int64)
            + 8 * (zBL > L).astype(np.int64)
        )
        hit = (case != 0) & (case != 15)
        # valid cells must lie inside the raster's cell grid
        gx = np.arange(ts) + tx * ts
        gy = np.arange(ts) + ty * ts
        GX, GY = np.meshgrid(gx, gy)
        hit &= (GX < width - 1) & (GY < height - 1)
        if not hit.any():
            return pd.DataFrame(
                {"cx": [], "cy": [], "case_id": [], "n_seg": [], "seg_len": []}
            )
        with np.errstate(divide="ignore", invalid="ignore"):
            tt = (L - zTL) / (zTR - zTL)
            tr = (L - zTR) / (zBR - zTR)
            tb = (L - zBL) / (zBR - zBL)
            tl = (L - zTL) / (zBL - zTL)
        l_topleft = np.sqrt(tt * tt + tl * tl)
        l_topright = np.sqrt((1 - tt) * (1 - tt) + tr * tr)
        l_rightbottom = np.sqrt((tb - 1) * (tb - 1) + (1 - tr) * (1 - tr))
        l_bottomleft = np.sqrt(tb * tb + (1 - tl) * (1 - tl))
        l_leftright = np.sqrt(1 + (tr - tl) * (tr - tl))
        l_topbottom = np.sqrt((tb - tt) * (tb - tt) + 1)
        center = (zTL + zTR + zBR + zBL) / 4.0
        sel = [case == k for k in range(16)]
        seg_len = np.select(
            sel,
            [
                np.zeros_like(tt),                 # 0
                l_topleft,                          # 1
                l_topright,                         # 2
                l_leftright,                        # 3
                l_rightbottom,                      # 4
                np.where(center > L, l_topright + l_bottomleft,
                         l_topleft + l_rightbottom),  # 5
                l_topbottom,                        # 6
                l_bottomleft,                       # 7
                l_bottomleft,                       # 8
                l_topbottom,                        # 9
                np.where(center > L, l_topleft + l_rightbottom,
                         l_topright + l_bottomleft),  # 10
                l_rightbottom,                      # 11
                l_leftright,                        # 12
                l_topright,                         # 13
                l_topleft,                          # 14
                np.zeros_like(tt),                  # 15
            ],
        )
        n_seg = np.where((case == 5) | (case == 10), 2, 1)
        ys, xs = np.nonzero(hit)
        return pd.DataFrame(
            {
                "cx": GX[ys, xs],
                "cy": GY[ys, xs],
                "case_id": case[ys, xs].astype(np.int32),
                "n_seg": n_seg[ys, xs].astype(np.int32),
                "seg_len": seg_len[ys, xs],
            }
        )

    return strips.groupBy("tx", "ty").applyInPandas(per_tile, CONTOUR_SCHEMA)


SEG_SCHEMA = T.StructType(
    [
        T.StructField("seg", T.LongType()),
        T.StructField("x1", T.DoubleType()),
        T.StructField("y1", T.DoubleType()),
        T.StructField("x2", T.DoubleType()),
        T.StructField("y2", T.DoubleType()),
        T.StructField("seg_len", T.DoubleType()),
        # a pixel center guaranteed ABOVE the level for this segment's
        # cell (the lowest set case bit) — lets polygon assembly know
        # which side of an open polyline the z>level region lies on
        # without re-reading the raster
        T.StructField("inx", T.DoubleType()),
        T.StructField("iny", T.DoubleType()),
    ]
)

# corner offset of the lowest set bit per case id: TL, TR, BR, BL
_IN_CORNER = {}
for _k in range(1, 15):
    for _bit, _off in ((1, (0.0, 0.0)), (2, (1.0, 0.0)), (4, (1.0, 1.0)), (8, (0.0, 1.0))):
        if _k & _bit:
            _IN_CORNER[_k] = _off
            break

# endpoint selectors per case id: each segment is an (edge, edge) pair
# over T(op)/R(ight)/B(ottom)/L(eft); saddles resolved by the center
_CASE_SEGS = {
    1: [("T", "L")], 2: [("T", "R")], 3: [("L", "R")], 4: [("R", "B")],
    6: [("T", "B")], 7: [("B", "L")], 8: [("B", "L")], 9: [("T", "B")],
    11: [("R", "B")], 12: [("L", "R")], 13: [("T", "R")], 14: [("T", "L")],
}
_SADDLE = {
    5: ([("T", "R"), ("B", "L")], [("T", "L"), ("R", "B")]),   # (ctr>L, else)
    10: ([("T", "L"), ("R", "B")], [("T", "R"), ("B", "L")]),
}


def contour_segments(
    tiles: DataFrame, level: float, tile_size: int, width: int, height: int
) -> DataFrame:
    """One row per iso-line SEGMENT with exact endpoints in global cell
    coords and a deterministic id ((cy·(W−1)+cx)·2 + slot).  Endpoint
    floats are identical wherever two cells share an edge crossing (the
    same two pixels feed the same interpolation), which is what lets
    polyline assembly join on them exactly."""
    ntx = (width + tile_size - 1) // tile_size
    nty = (height + tile_size - 1) // tile_size
    ts = tile_size
    strips = _emit_strips(tiles, ts, 1, ntx, nty)

    def per_tile(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(key[0]), int(key[1])
        z = _assemble_padded(pdf, ts, 1)
        c = slice(1, 1 + ts)
        p1 = slice(2, 2 + ts)
        zTL, zTR, zBR, zBL = z[c, c], z[c, p1], z[p1, p1], z[p1, c]
        L = level
        case = (
            (zTL > L).astype(np.int64) + 2 * (zTR > L).astype(np.int64)
            + 4 * (zBR > L).astype(np.int64) + 8 * (zBL > L).astype(np.int64)
        )
        gx = np.arange(ts) + tx * ts
        gy = np.arange(ts) + ty * ts
        GX, GY = np.meshgrid(gx, gy)
        valid = (GX < width - 1) & (GY < height - 1)
        with np.errstate(divide="ignore", invalid="ignore"):
            tt = (L - zTL) / (zTR - zTL)
            tr = (L - zTR) / (zBR - zTR)
            tb = (L - zBL) / (zBR - zBL)
            tl = (L - zTL) / (zBL - zTL)
        center = (zTL + zTR + zBR + zBL) / 4.0
        CX = GX.astype(np.float64)
        CY = GY.astype(np.float64)
        pts = {
            "T": (CX + tt, CY),
            "R": (CX + 1.0, CY + tr),
            "B": (CX + tb, CY + 1.0),
            "L": (CX, CY + tl),
        }
        rows = []
        for k in range(1, 15):
            if k in (0, 15):
                continue
            m = (case == k) & valid
            if not m.any():
                continue
            ys, xs = np.nonzero(m)
            if k in _SADDLE:
                hi, lo = _SADDLE[k]
                for which, sel in ((hi, center[ys, xs] > L), (lo, ~(center[ys, xs] > L))):
                    yy, xx = ys[sel], xs[sel]
                    for slot, (ea, eb) in enumerate(which):
                        _emit(rows, pts, ea, eb, xx, yy, GX, GY, slot, width, k)
            else:
                for slot, (ea, eb) in enumerate(_CASE_SEGS[k]):
                    _emit(rows, pts, ea, eb, xs, ys, GX, GY, slot, width, k)
        return pd.DataFrame(
            rows,
            columns=["seg", "x1", "y1", "x2", "y2", "seg_len", "inx", "iny"],
        ) if rows else pd.DataFrame(
            {"seg": [], "x1": [], "y1": [], "x2": [], "y2": [],
             "seg_len": [], "inx": [], "iny": []}
        )

    return strips.groupBy("tx", "ty").applyInPandas(per_tile, SEG_SCHEMA)


def _emit(rows, pts, ea, eb, xs, ys, GX, GY, slot, width, k):
    ax, ay = pts[ea]
    bx, by = pts[eb]
    ox, oy = _IN_CORNER[k]
    for x, y in zip(xs.tolist(), ys.tolist()):
        x1, y1 = float(ax[y, x]), float(ay[y, x])
        x2, y2 = float(bx[y, x]), float(by[y, x])
        dx, dy = x2 - x1, y2 - y1
        seg = (int(GY[y, x]) * (width - 1) + int(GX[y, x])) * 2 + slot
        rows.append(
            (seg, x1, y1, x2, y2, float(np.sqrt(dx * dx + dy * dy)),
             float(GX[y, x]) + ox, float(GY[y, x]) + oy)
        )


def _tag_components(segs: DataFrame) -> DataFrame:
    """Label each segment with its polyline component: segments sharing
    an exact endpoint connect (identical doubles — both cells interpolate
    the crossing from the same two pixels), components via pointer-
    jumping CC."""
    from gdal_spark.operators.graph import connected_components

    ends = segs.select("seg", F.col("x1").alias("x"), F.col("y1").alias("y")).unionByName(
        segs.select("seg", F.col("x2").alias("x"), F.col("y2").alias("y"))
    )
    a = ends.select(F.col("seg").alias("src"), "x", "y")
    b = ends.select(F.col("seg").alias("dst"), "x", "y")
    shared = a.join(b, ["x", "y"]).filter(F.col("src") != F.col("dst")).select("src", "dst")
    selfloops = segs.select(F.col("seg").alias("src"), F.col("seg").alias("dst"))
    comp = connected_components(shared.unionByName(selfloops))
    return segs.join(comp.withColumnRenamed("node", "seg"), "seg"), ends, comp


LINESTRING_SCHEMA = T.StructType(
    [
        T.StructField("component", T.LongType()),
        T.StructField("n_pts", T.IntegerType()),
        T.StructField("closed", T.BooleanType()),
        T.StructField("length_u", T.LongType()),
        T.StructField("sx", T.LongType()),
        T.StructField("sy", T.LongType()),
        T.StructField("vsum_x", T.LongType()),
        T.StructField("vsum_y", T.LongType()),
        T.StructField("ix", T.DoubleType()),
        T.StructField("iy", T.DoubleType()),
        T.StructField("wkb", T.BinaryType()),
    ]
)


def contour_linestrings(
    tiles: DataFrame, level: float, tile_size: int, width: int, height: int,
) -> DataFrame:
    """Ordered polyline GEOMETRY per iso-line component (the reference's
    contour writer emits one linestring per merged polyline,
    alg/contour.cpp SegmentMerger/RingAppender): one shuffle keyed by
    component, then a deterministic chain walk per component.

    Walk order contract (pinned for the oracle): open polylines start
    at the lexicographically smallest degree-1 endpoint; closed rings
    start at the smallest endpoint and step toward the smaller of its
    two neighbors.  Closed rings repeat the start point at the end of
    the WKB (GDAL ring convention) but n_pts counts distinct vertices.

    Besides the WKB, emits order-sensitive integer checksums over the
    vertex sequence — sx/sy = 2·(start point), vsum_x/vsum_y =
    Σ (i+1)·2·coord — so an ANSI-SQL oracle can verify the exact vertex
    ORDER (all crossing coordinates are halves of integers whenever
    pixel values are integers and the level is a half-integer).
    length_u = Σ floor(seg_len·10⁶ + 0.5) as in ``contour_polylines``.
    """
    from gdal_spark.kernels import wkb as W

    segs = contour_segments(tiles, level, tile_size, width, height).persist()
    tagged, _, _ = _tag_components(segs)

    def walk(key, pdf: pd.DataFrame) -> pd.DataFrame:
        comp = int(key[0])
        adj: dict = {}
        for x1, y1, x2, y2, sl in zip(
            pdf["x1"], pdf["y1"], pdf["x2"], pdf["y2"], pdf["seg_len"]
        ):
            a, b = (float(x1), float(y1)), (float(x2), float(y2))
            adj.setdefault(a, []).append([b, float(sl), False])
            adj.setdefault(b, []).append([a, float(sl), False])
        deg1 = sorted(p for p, nb in adj.items() if len(nb) == 1)
        if deg1:
            start = deg1[0]
            closed = False
        else:
            start = min(adj)
            closed = True
        pts = [start]
        length_u = 0
        cur = start
        prev = None
        while True:
            cands = [e for e in adj[cur] if not e[2]]
            if not cands:
                break
            cands.sort(key=lambda e: e[0])
            nxt = cands[0]
            nxt[2] = True
            # mark the reverse half-edge used too
            for e in adj[nxt[0]]:
                if not e[2] and e[0] == cur and e[1] == nxt[1]:
                    e[2] = True
                    break
            length_u += int(np.floor(nxt[1] * 1e6 + 0.5))
            prev, cur = cur, nxt[0]
            if cur == start:
                break
            pts.append(cur)
        seq = pts + [start] if closed else pts
        vx = sum((i + 1) * int(round(2 * p[0])) for i, p in enumerate(pts))
        vy = sum((i + 1) * int(round(2 * p[1])) for i, p in enumerate(pts))
        blob = W.linestring_wkb(np.array(seq, dtype=np.float64))
        return pd.DataFrame(
            {
                "component": [comp],
                "n_pts": [len(pts)],
                "closed": [closed],
                "length_u": [length_u],
                "sx": [int(round(2 * start[0]))],
                "sy": [int(round(2 * start[1]))],
                "vsum_x": [vx],
                "vsum_y": [vy],
                "ix": [float(pdf["inx"].iloc[0])],
                "iy": [float(pdf["iny"].iloc[0])],
                "wkb": [blob],
            }
        )

    return tagged.groupBy("component").applyInPandas(walk, LINESTRING_SCHEMA)


def contour_polylines(
    tiles: DataFrame, level: float, tile_size: int, width: int, height: int,
    window: int | None = None,
) -> DataFrame:
    """Assemble iso-line segments into polylines: segments sharing an
    exact endpoint connect; components via the distributed label
    propagation of ``operators.graph``.  Returns per polyline:
    (component, n_seg, n_ends, closed, length_u) with length_u =
    Σ floor(len·10⁶ + 0.5) — integer-exact across engines.

    ``window`` restricts to cells with cx, cy < window (bounds the
    component sizes for oracle comparison)."""
    segs = contour_segments(tiles, level, tile_size, width, height)
    if window is not None:
        segs = segs.filter(
            ((F.col("seg") / 2).cast("long") % (width - 1) < window)
            & ((F.col("seg") / 2).cast("long") / (width - 1) < window)
        )
    segs = segs.persist()
    tagged, ends, comp = _tag_components(segs)
    n_ends = (
        ends.join(comp.withColumnRenamed("node", "seg"), "seg")
        .groupBy("component")
        .agg(F.count_distinct("x", "y").alias("n_ends"))
    )
    agg = tagged.groupBy("component").agg(
        F.count("*").alias("n_seg"),
        F.sum(F.floor(F.col("seg_len") * 1e6 + 0.5).cast("long")).alias("length_u"),
    )
    return agg.join(n_ends, "component").select(
        "component", "n_seg", "n_ends",
        (F.col("n_ends") == F.col("n_seg")).alias("closed"),
        "length_u",
    )


POLY_SCHEMA = T.StructType(
    [
        T.StructField("sx", T.LongType()),
        T.StructField("sy", T.LongType()),
        T.StructField("n_rings", T.IntegerType()),
        T.StructField("parea", T.DoubleType()),
        T.StructField("wkb", T.BinaryType()),
    ]
)


def _closed_rings(tiles, level, tile_size, width, height):
    """Collect the level's iso-rings as CLOSED coordinate arrays:
    ``contour_linestrings`` does the distributed assembly; open
    polylines (clipped at the raster edge) close along the pixel-center
    hull on the side holding their inside-point hint.  Returns ring
    dicts (sx, sy, coords, area, bbox) — O(features) metadata."""
    from gdal_spark.kernels import wkb as Wk
    from gdal_spark.kernels.pip import points_in_polygon as _pip

    lines = contour_linestrings(tiles, level, tile_size, width, height)
    rows = lines.select("sx", "sy", "closed", "ix", "iy", "wkb").collect()

    W1, H1 = float(width - 1), float(height - 1)
    per = 2.0 * (W1 + H1)

    def border_t(p):
        x, y = float(p[0]), float(p[1])
        if y == 0.0:
            return x
        if x == W1:
            return W1 + y
        if y == H1:
            return W1 + H1 + (W1 - x)
        if x == 0.0:
            return 2.0 * W1 + H1 + (H1 - y)
        return None

    corners = [(0.0, 0.0), (W1, 0.0), (W1, H1), (0.0, H1)]
    corner_t = [0.0, W1, W1 + H1, 2.0 * W1 + H1]

    def hull_path(t_from, t_to, clockwise):
        out = []
        if clockwise:
            span = (t_to - t_from) % per
            cs = sorted(((ct - t_from) % per, i) for i, ct in enumerate(corner_t))
        else:
            span = (t_from - t_to) % per
            cs = sorted(((t_from - ct) % per, i) for i, ct in enumerate(corner_t))
        for d, i in cs:
            if 0.0 < d < span:
                out.append(corners[i])
        return out

    def close_open(coords, inside):
        ts_, te_ = border_t(coords[0]), border_t(coords[-1])
        if ts_ is None or te_ is None:
            return None  # endpoint off-hull (degenerate junction): skip
        for cw in (True, False):
            path = hull_path(te_, ts_, cw)
            ring = np.vstack([coords] + [np.array(p) for p in path] + [coords[:1]])
            if bool(
                _pip(
                    np.array([inside[0]]), np.array([inside[1]]), [ring],
                    include_boundary=False,
                )[0]
            ):
                return ring
        return None

    rings = []
    for r in rows:
        coords = Wk.parse_wkb(bytes(r["wkb"]))[1]
        if not r["closed"]:
            closed_ring = close_open(coords, (r["ix"], r["iy"]))
            if closed_ring is None:
                continue
            coords = closed_ring
        area = 0.5 * float(
            np.sum(coords[:-1, 0] * coords[1:, 1] - coords[1:, 0] * coords[:-1, 1])
        )
        bbox = (
            float(coords[:, 0].min()), float(coords[:, 1].min()),
            float(coords[:, 0].max()), float(coords[:, 1].max()),
        )
        rings.append(
            {"sx": int(r["sx"]), "sy": int(r["sy"]), "coords": coords,
             "area": abs(area), "bbox": bbox}
        )
    return rings


def _ring_contains(big, small) -> bool:
    from gdal_spark.kernels.pip import points_in_polygon

    bb, sb = big["bbox"], small["bbox"]
    if not (bb[0] <= sb[0] and bb[1] <= sb[1] and bb[2] >= sb[2] and bb[3] >= sb[3]):
        return False
    v = small["coords"][0]
    return bool(
        points_in_polygon(
            np.array([v[0]]), np.array([v[1]]), [big["coords"]],
            include_boundary=False,
        )[0]
    )


def _nest(rings):
    """depth + innermost-container parent for each ring dict."""
    containers = [
        [j for j, other in enumerate(rings) if j != i and _ring_contains(other, rings[i])]
        for i in range(len(rings))
    ]
    for i, ring in enumerate(rings):
        ring["depth"] = len(containers[i])
    for i, ring in enumerate(rings):
        ring["parent"] = (
            max(containers[i], key=lambda j: rings[j]["depth"])
            if containers[i] else None
        )
    return containers


def contour_polygons(
    tiles: DataFrame, level: float, tile_size: int, width: int, height: int,
) -> DataFrame:
    """FILLED contour polygons — ``gdal contour -p`` / ``--polygonize``
    (apps/gdalalg_raster_contour.cpp, writer alg/contour.cpp
    PolygonRingAppender): the region where z > level becomes polygons
    whose boundaries are the iso-rings, holes where the surface dips
    back below the level.

    Build: ``contour_linestrings`` assembles the ordered closed rings
    distributedly (the heavy part — O(raster) marching squares + the
    component shuffle); ring NESTING then runs on the collected ring
    metadata — rings are O(features), the same small-graph judgment as
    the polygonize merge map (a broadcast R-tree drops in beyond
    driver memory).  A ring is a HOLE iff an odd number of other rings
    contain it; its parent is the innermost container.  Open polylines
    (clipped at the raster edge) close along the pixel-center hull —
    direction picked by ray-casting the component's inside-point hint.

    Emits (sx, sy, n_rings, parea, wkb)."""
    from gdal_spark.kernels import wkb as Wk

    spark = tiles.sparkSession
    rings = _closed_rings(tiles, level, tile_size, width, height)
    _nest(rings)
    out_rows = []
    for ring in rings:
        if ring["depth"] % 2 != 0:
            continue  # odd depth = hole, attached to its parent below
        holes = [r for r in rings if r["parent"] is not None and rings[r["parent"]] is ring]
        parea = ring["area"] - sum(h["area"] for h in holes)
        blob = Wk.polygon_wkb([ring["coords"]] + [h["coords"] for h in holes])
        out_rows.append(
            (ring["sx"], ring["sy"], 1 + len(holes), float(parea), blob)
        )
    if not out_rows:
        return spark.createDataFrame([], POLY_SCHEMA)
    return spark.createDataFrame(out_rows, POLY_SCHEMA)


BAND_SCHEMA = T.StructType(
    [
        T.StructField("band", T.IntegerType()),
        T.StructField("sx", T.LongType()),
        T.StructField("sy", T.LongType()),
        T.StructField("n_rings", T.IntegerType()),
        T.StructField("parea", T.DoubleType()),
        T.StructField("wkb", T.BinaryType()),
    ]
)


def contour_bands(
    tiles: DataFrame, levels, tile_size: int, width: int, height: int,
) -> DataFrame:
    """MULTI-LEVEL filled contour bands — the full ``gdal contour -p``
    output: one polygon set per interval (levels[b], levels[b+1]],
    plus the top band above the last level.

    All levels' rings nest TOGETHER; crossing a level-L ring toggles
    the "above L" state, so the band just inside any ring is read off
    the parity of each level among its containers (plus itself).  A
    ring is a band-polygon EXTERIOR where the inside state maps to its
    band and the outside state doesn't; every direct child flips some
    toggle and is therefore a hole of that polygon.  Emits
    (band, sx, sy, n_rings, parea, wkb) with band b = interval index
    (z in (levels[b], levels[b+1]]), len(levels)-1 = top band."""
    from gdal_spark.kernels import wkb as Wk

    spark = tiles.sparkSession
    rings = []
    for li, level in enumerate(levels):
        for r in _closed_rings(tiles, level, tile_size, width, height):
            r["lvl"] = li
            rings.append(r)
    _nest(rings)

    nlev = len(levels)

    def band_inside(ring):
        # parity of each level's rings among containers ∪ {self}
        par = [0] * nlev
        par[ring["lvl"]] ^= 1
        p = ring["parent"]
        while p is not None:
            par[rings[p]["lvl"]] ^= 1
            p = rings[p]["parent"]
        # highest level still "on" determines the band; band b means
        # above levels[b] but not above levels[b+1]
        top = -1
        for li in range(nlev):
            if par[li]:
                top = li
        return top

    out_rows = []
    for ring in rings:
        inside = band_inside(ring)
        # outside state = inside minus own toggle
        parent = ring["parent"]
        outside = band_inside(rings[parent]) if parent is not None else -1
        if inside == -1 or inside == outside:
            continue  # not a band exterior (below all levels inside)
        holes = [r for r in rings if r["parent"] is not None and rings[r["parent"]] is ring]
        parea = ring["area"] - sum(h["area"] for h in holes)
        blob = Wk.polygon_wkb([ring["coords"]] + [h["coords"] for h in holes])
        out_rows.append(
            (int(inside), ring["sx"], ring["sy"], 1 + len(holes), float(parea), blob)
        )
    if not out_rows:
        return spark.createDataFrame([], BAND_SCHEMA)
    return spark.createDataFrame(out_rows, BAND_SCHEMA)
