"""Distributed polygonize: tile table → vector features.

Reference: GDALPolygonize two-pass scanline CCL + arc tracing
(alg/polygonize.cpp:73-300) is inherently sequential over the whole
raster.  The distributed decomposition:

  1. per-tile CCL + region summaries + border runs  (applyInPandas —
     embarrassingly parallel, the dominant cost)
  2. border-run equi-join on shared tile edges: facing runs with equal
     pixel value and overlapping extent ⇒ same global component
  3. connected components over the (tile, local_label) graph —
     size-gated (``_label_roots``): graphs up to the threshold
     union-find on the collected edge list at the driver (same judgment
     as the reference's merge map,
     gdalrasterpolygonenumerator.cpp:75-167 — milliseconds, no
     shuffles); past it (a 100-TB noisy raster has billions of border
     runs) the distributed pointer-jumping CC of ``operators.graph``
     takes over on packed (tx, ty, label) node ids.  Both paths root at
     the lexicographic-min id, so results are bit-identical.
  4. global region table = per-tile summaries re-keyed by root label
     (one groupBy), optionally with dissolved geometry per region.

Returns regions (root_label, dn, pixel_count, n_tiles).  Per-tile
polygon geometry (rings incl. holes) is available from
``extract_polygons`` for tiles that don't cross — the cross-tile
geometry dissolve (arc stitching) is pixel-edge concatenation over the
border runs and is kept per-tile here; zonal/count semantics are exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.session import local_df

from gdal_spark.kernels.ccl import border_runs, extract_polygons, label_tile, region_table

REGION_SCHEMA = T.StructType(
    [
        T.StructField("tx", T.LongType()),
        T.StructField("ty", T.LongType()),
        T.StructField("local_label", T.IntegerType()),
        T.StructField("dn", T.DoubleType()),
        T.StructField("pixel_count", T.LongType()),
    ]
)

BORDER_SCHEMA = T.StructType(
    [
        T.StructField("tx", T.LongType()),
        T.StructField("ty", T.LongType()),
        T.StructField("side", T.StringType()),
        T.StructField("start", T.IntegerType()),
        T.StructField("end", T.IntegerType()),
        T.StructField("local_label", T.IntegerType()),
        T.StructField("dn", T.DoubleType()),
    ]
)


class _DSU:
    def __init__(self):
        self.p = {}

    def find(self, a):
        p = self.p
        p.setdefault(a, a)
        root = a
        while p[root] != root:
            root = p[root]
        while p[a] != root:
            p[a], a = root, p[a]
        return root

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


_TY_BITS = 21
_LAB_BITS = 21
_LAB_MASK = (1 << _LAB_BITS) - 1
_TY_MASK = (1 << _TY_BITS) - 1


def _enc(tx, ty, lab):
    """Pack (tx, ty, local_label) into one long: (tx<<42)|(ty<<21)|lab.
    Supports rasters up to 2^20 tiles per axis (≈ 2.7·10^8 pixels/side
    at ts=256) and 2^21 labels per tile (> ts² for ts ≤ 1448).  Packed
    ordering == lexicographic (tx, ty, label) ordering, so min-id
    component roots agree exactly between the driver union-find and the
    distributed CC."""
    return (
        F.col(tx).cast("long") * (1 << (_TY_BITS + _LAB_BITS))
        + F.col(ty).cast("long") * (1 << _LAB_BITS)
        + F.col(lab).cast("long")
    )


def _label_roots(
    spark, edges: DataFrame, threshold: int = 200_000
) -> DataFrame | None:
    """(tx, ty, local_label) → (root_tx, root_ty, root_label) for the
    cross-tile label-merge graph.  Small graphs (≤ ``threshold`` edge
    rows) union-find at the driver — the same judgment as the
    reference's merge map (alg/gdalrasterpolygonenumerator.cpp:75-167):
    the label graph is O(border runs), and a driver pass beats log(n)
    full-graph shuffles.  PAST the threshold (a 100-TB noisy raster has
    billions of border runs) the pointer-jumping CC of
    ``operators.graph`` takes over on packed node ids — both paths pick
    the lexicographic-min (tx, ty, label) as root, so results are
    bit-identical.  Returns None when the graph has no edges."""
    from gdal_spark.operators.graph import connected_components

    edges = edges.persist()
    n = edges.limit(threshold + 1).count()
    if n == 0:
        edges.unpersist()
        return None
    if n <= threshold:
        dsu = _DSU()
        for r in edges.collect():
            dsu.union(
                (r["tx"], r["ty"], r["local_label"]),
                (r["rtx"], r["rty"], r["rlabel"]),
            )
        edges.unpersist()
        mapping = [
            (int(a[0]), int(a[1]), int(a[2]), int(root[0]), int(root[1]), int(root[2]))
            for a in list(dsu.p)
            for root in [dsu.find(a)]
        ]
        return local_df(spark, 
            mapping,
            "tx long, ty long, local_label int, root_tx long, root_ty long, root_label int",
        )
    ids = edges.select(
        _enc("tx", "ty", "local_label").alias("src"),
        _enc("rtx", "rty", "rlabel").alias("dst"),
    )
    comp = connected_components(ids)
    edges.unpersist()
    return comp.select(
        F.shiftright("node", _TY_BITS + _LAB_BITS).alias("tx"),
        F.shiftright("node", _LAB_BITS).bitwiseAND(F.lit(_TY_MASK)).alias("ty"),
        F.col("node").bitwiseAND(F.lit(_LAB_MASK)).cast("int").alias("local_label"),
        F.shiftright("component", _TY_BITS + _LAB_BITS).alias("root_tx"),
        F.shiftright("component", _LAB_BITS).bitwiseAND(F.lit(_TY_MASK)).alias("root_ty"),
        F.col("component").bitwiseAND(F.lit(_LAB_MASK)).cast("int").alias("root_label"),
    )


def _merge_edges(borders: DataFrame, connect8: bool, tile_size: int) -> DataFrame:
    """Cross-tile label-merge edges from facing border runs.

    4-connectivity: facing E|W (S|N) runs with equal dn and overlapping
    [start, end) merge.  8-connectivity (the reference's
    connectedness==8 path, gdalrasterpolygonenumerator.cpp:75-167) adds
    two cases:
      (a) diagonal adjacency across a shared edge — facing runs need
          only touch within ±1 (pixel (r, last) is 8-adjacent to
          (r±1, 0) of the next tile), so the interval test relaxes to
          ``rstart <= end AND rend >= start``;
      (b) the tile-corner case: a border run reaching the SE (resp. SW)
          corner pixel of a tile is 8-adjacent to a run leaving the NW
          (resp. NE) corner pixel of the diagonally adjacent tile —
          S-run with end==tile_size ↔ (tx+1, ty+1) N-run with start==0,
          and S-run with start==0 ↔ (tx-1, ty+1) N-run with
          end==tile_size.  Both diagonal directions of each unordered
          tile pair are covered because the join is always written from
          the northern tile's S side.
    """
    right = (
        borders.withColumnRenamed("tx", "rtx")
        .withColumnRenamed("ty", "rty")
        .withColumnRenamed("local_label", "rlabel")
        .withColumnRenamed("side", "rside")
        .withColumnRenamed("start", "rstart")
        .withColumnRenamed("end", "rend")
        .withColumnRenamed("dn", "rdn")
    )
    if connect8:
        ov = (F.col("rstart") <= F.col("end")) & (F.col("rend") >= F.col("start"))
    else:
        ov = (F.col("rstart") < F.col("end")) & (F.col("rend") > F.col("start"))
    east = borders.filter(F.col("side") == "E").join(
        right.filter(F.col("rside") == "W"),
        (F.col("rtx") == F.col("tx") + 1)
        & (F.col("rty") == F.col("ty"))
        & (F.col("rdn") == F.col("dn"))
        & ov,
    )
    south = borders.filter(F.col("side") == "S").join(
        right.filter(F.col("rside") == "N"),
        (F.col("rtx") == F.col("tx"))
        & (F.col("rty") == F.col("ty") + 1)
        & (F.col("rdn") == F.col("dn"))
        & ov,
    )
    parts = [east, south]
    if connect8:
        se = borders.filter(
            (F.col("side") == "S") & (F.col("end") == tile_size)
        ).join(
            right.filter((F.col("rside") == "N") & (F.col("rstart") == 0)),
            (F.col("rtx") == F.col("tx") + 1)
            & (F.col("rty") == F.col("ty") + 1)
            & (F.col("rdn") == F.col("dn")),
        )
        sw = borders.filter(
            (F.col("side") == "S") & (F.col("start") == 0)
        ).join(
            right.filter((F.col("rside") == "N") & (F.col("rend") == tile_size)),
            (F.col("rtx") == F.col("tx") - 1)
            & (F.col("rty") == F.col("ty") + 1)
            & (F.col("rdn") == F.col("dn")),
        )
        parts += [se, sw]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("tx", "ty", "local_label", "rtx", "rty", "rlabel")


def _tile_ccl(tiles: DataFrame, nodata: float | None, connect8: bool, tile_size: int):
    def per_tile(pdf_iter):
        for pdf in pdf_iter:
            for _, row in pdf.iterrows():
                arr = np.frombuffer(row["data"], dtype=np.dtype(row["dtype"])).reshape(
                    tile_size, tile_size
                )
                mask = None if nodata is None else arr != nodata
                labels = label_tile(arr, mask=mask, connect8=connect8)
                regions = region_table(arr, labels)
                for lab, dn, cnt, _, _ in regions:
                    yield ("R", row["tx"], row["ty"], lab, float(dn), cnt, None, None, None)
                for side, s, e, lab, dn in border_runs(arr, labels):
                    yield ("B", row["tx"], row["ty"], lab, float(dn), None, side, s, e)

    def gen(pdf_iter):
        rows = list(per_tile(pdf_iter))
        yield pd.DataFrame(
            rows,
            columns=["kind", "tx", "ty", "local_label", "dn", "pixel_count", "side", "start", "end"],
        )

    mixed_schema = T.StructType(
        [
            T.StructField("kind", T.StringType()),
            T.StructField("tx", T.LongType()),
            T.StructField("ty", T.LongType()),
            T.StructField("local_label", T.IntegerType()),
            T.StructField("dn", T.DoubleType()),
            T.StructField("pixel_count", T.LongType()),
            T.StructField("side", T.StringType()),
            T.StructField("start", T.IntegerType()),
            T.StructField("end", T.IntegerType()),
        ]
    )
    return tiles.mapInPandas(gen, mixed_schema)


def polygonize_tiles(
    tiles: DataFrame,
    nodata: float | None = None,
    connect8: bool = False,
    tile_size: int = 256,
    cc_threshold: int = 200_000,
) -> DataFrame:
    """Tile table → global region table (region_id, dn, pixel_count,
    n_tiles) with exact cross-tile merging."""
    spark = tiles.sparkSession
    mixed = _tile_ccl(tiles, nodata, connect8, tile_size).persist()
    regions = mixed.filter(F.col("kind") == "R").drop("kind", "side", "start", "end")
    borders = (
        mixed.filter(F.col("kind") == "B")
        .drop("kind", "pixel_count")
    )

    # Facing-run join: my E edge joins the (tx+1) tile's W edge, my S
    # joins (ty+1)'s N; equal dn + overlapping [start, end) ⇒ merge.
    # (Range-overlap equi-join on the shared edge; the candidate set is
    # border runs only, a ~1/tile_size fraction of the data.)  With
    # connect8 the overlap relaxes by ±1 and diagonal tile-corner
    # adjacency is added — see ``_merge_edges``.
    edges = _merge_edges(borders, connect8, tile_size)

    # Label-graph roots: driver union-find for small graphs, the
    # distributed pointer-jumping CC past the threshold (_label_roots).
    map_df = _label_roots(spark, edges, threshold=cc_threshold)

    keyed = regions
    if map_df is not None:
        keyed = regions.join(map_df, ["tx", "ty", "local_label"], "left")
    else:
        keyed = regions.withColumn("root_tx", F.lit(None).cast("long")).withColumn(
            "root_ty", F.lit(None).cast("long")
        ).withColumn("root_label", F.lit(None).cast("int"))
    keyed = (
        keyed.withColumn("root_tx", F.coalesce("root_tx", "tx"))
        .withColumn("root_ty", F.coalesce("root_ty", "ty"))
        .withColumn("root_label", F.coalesce("root_label", "local_label"))
    )
    out = (
        keyed.groupBy("root_tx", "root_ty", "root_label", "dn")
        .agg(
            F.sum("pixel_count").alias("pixel_count"),
            F.count("*").alias("n_tiles"),
        )
        .withColumn(
            "region_id",
            F.concat_ws("_", "root_tx", "root_ty", "root_label").alias("region_id"),
        )
        .select("region_id", "dn", "pixel_count", "n_tiles")
    )
    # `mixed` stays persisted: the border-edge collect already
    # materialized it, and the returned (lazy) region table reuses it.
    return out


def polygonize_dissolved(
    tiles: DataFrame,
    nodata: float | None = 0.0,
    connect8: bool = False,
    tile_size: int = 256,
    gt: tuple[float, ...] = (0.0, 1.0, 0.0, 0.0, 0.0, 1.0),
    cc_threshold: int = 200_000,
) -> DataFrame:
    """Polygonize with CROSS-TILE dissolved geometry — the full
    GDALPolygonize output (one polygon with holes per global region,
    alg/polygonize.cpp pass 2) assembled distributedly:

    1. per tile: CCL + border runs (as in ``polygonize_tiles``) PLUS
       each local label's directed boundary unit-edges in global pixel
       coords (O(perimeter) ints, packed as one binary per label);
    2. border-run equi-join → union-find → (tile, label) → root region
       (the same small label graph as the region table);
    3. edges shuffle ONCE keyed by root region; per region, interior
       tile-border segments cancel in opposite-direction pairs (tile A
       walks the shared edge one way, tile B the other) and the
       remaining edges chain into exterior + hole rings.

    Output: (region_id, dn, n_rings, perim, parea, wkb).  For
    pixel-edge polygons ``parea`` (exterior − holes) equals the pixel
    count exactly — the cross-check against the region table."""
    from gdal_spark.kernels import wkb as Wk
    from gdal_spark.kernels.ccl import _boundary_edges, _chain_rings, _ring_area
    from gdal_spark.kernels.geodesy import pixel_to_world

    spark = tiles.sparkSession
    mixed_schema = T.StructType(
        [
            T.StructField("kind", T.StringType()),
            T.StructField("tx", T.LongType()),
            T.StructField("ty", T.LongType()),
            T.StructField("local_label", T.IntegerType()),
            T.StructField("dn", T.DoubleType()),
            T.StructField("side", T.StringType()),
            T.StructField("start", T.IntegerType()),
            T.StructField("end", T.IntegerType()),
            T.StructField("edges", T.BinaryType()),
        ]
    )

    def per_tile(pdf_iter):
        for pdf in pdf_iter:
            rows = []
            for _, row in pdf.iterrows():
                arr = np.frombuffer(row["data"], dtype=np.dtype(row["dtype"])).reshape(
                    tile_size, tile_size
                )
                tx, ty = int(row["tx"]), int(row["ty"])
                ox, oy = tx * tile_size, ty * tile_size
                mask = None if nodata is None else arr != nodata
                labels = label_tile(arr, mask=mask, connect8=connect8)
                for lab, dn, _cnt, _, _ in region_table(arr, labels):
                    e = np.array(
                        [(a[0] + ox, a[1] + oy, b[0] + ox, b[1] + oy)
                         for a, b in _boundary_edges(labels, lab)],
                        dtype=np.int32,
                    )
                    rows.append(("E", tx, ty, lab, float(dn), None, None, None, e.tobytes()))
                for side, s, epos, lab, dn in border_runs(arr, labels):
                    rows.append(("B", tx, ty, lab, float(dn), side, s, epos, None))
            yield pd.DataFrame(
                rows,
                columns=["kind", "tx", "ty", "local_label", "dn", "side", "start", "end", "edges"],
            )

    mixed = tiles.mapInPandas(per_tile, mixed_schema).persist()
    borders = mixed.filter(F.col("kind") == "B").drop("kind", "edges")
    edges_lr = _merge_edges(borders, connect8, tile_size)
    map_df = _label_roots(spark, edges_lr, threshold=cc_threshold)
    e_rows = mixed.filter(F.col("kind") == "E").select(
        "tx", "ty", "local_label", "dn", "edges"
    )
    if map_df is not None:
        e_rows = e_rows.join(map_df, ["tx", "ty", "local_label"], "left")
    else:
        e_rows = (
            e_rows.withColumn("root_tx", F.lit(None).cast("long"))
            .withColumn("root_ty", F.lit(None).cast("long"))
            .withColumn("root_label", F.lit(None).cast("int"))
        )
    e_rows = (
        e_rows.withColumn("root_tx", F.coalesce("root_tx", "tx"))
        .withColumn("root_ty", F.coalesce("root_ty", "ty"))
        .withColumn("root_label", F.coalesce("root_label", "local_label"))
    )

    out_schema = T.StructType(
        [
            T.StructField("region_id", T.StringType()),
            T.StructField("dn", T.DoubleType()),
            T.StructField("n_rings", T.IntegerType()),
            T.StructField("perim", T.DoubleType()),
            T.StructField("parea", T.DoubleType()),
            T.StructField("wkb", T.BinaryType()),
        ]
    )

    def dissolve(key, pdf: pd.DataFrame) -> pd.DataFrame:
        rtx, rty, rlabel, dn = int(key[0]), int(key[1]), int(key[2]), float(key[3])
        counts: dict = {}
        for blob in pdf["edges"]:
            e = np.frombuffer(blob, dtype=np.int32).reshape(-1, 4)
            for x1, y1, x2, y2 in e.tolist():
                k = (x1, y1, x2, y2)
                rev = (x2, y2, x1, y1)
                if counts.get(rev, 0) > 0:
                    counts[rev] -= 1  # interior tile-border pair cancels
                else:
                    counts[k] = counts.get(k, 0) + 1
        edge_list = [
            ((x1, y1), (x2, y2))
            for (x1, y1, x2, y2), c in counts.items()
            for _ in range(c)
        ]
        rings = _chain_rings(edge_list)
        exts = [r for r in rings if _ring_area(r) > 0]
        holes = [r for r in rings if _ring_area(r) <= 0]
        exts.sort(key=lambda r: abs(_ring_area(r)), reverse=True)
        ordered = exts[:1] + holes + exts[1:]
        parea = sum(abs(_ring_area(r)) for r in exts) - sum(
            abs(_ring_area(r)) for r in holes
        )
        perim = 0.0
        if exts:
            d = np.diff(exts[0], axis=0)
            perim = float(np.sum(np.sqrt(np.sum(d * d, axis=1))))
        world = []
        for r in ordered:
            wx, wy = pixel_to_world(r[:, 0], r[:, 1], gt)
            world.append(np.column_stack([wx, wy]))
        blob = Wk.polygon_wkb(world) if world else None
        return pd.DataFrame(
            {
                "region_id": [f"{rtx}_{rty}_{rlabel}"],
                "dn": [dn],
                "n_rings": [len(ordered)],
                "perim": [round(perim, 9)],
                "parea": [float(parea)],
                "wkb": [blob],
            }
        )

    return (
        e_rows.groupBy("root_tx", "root_ty", "root_label", "dn")
        .applyInPandas(dissolve, out_schema)
    )


def polygonize_geometry(
    tiles: DataFrame,
    nodata: float | None = 0.0,
    connect8: bool = False,
    tile_size: int = 256,
    gt: tuple[float, ...] = (0.0, 1.0, 0.0, 0.0, 0.0, 1.0),
) -> DataFrame:
    """Per-tile polygonize WITH geometry: two-pass CCL then boundary
    arc tracing (the reference's pass-2, alg/polygonize_polygonizer.h
    Two-Arm-Chains idea re-expressed as edge chaining) — emits one
    feature per in-tile component with its WKB polygon (exterior +
    holes, pixel-edge coordinates mapped through ``gt``).

    Components that cross tile borders appear clipped at the border;
    the exact cross-tile REGION accounting lives in
    ``polygonize_tiles`` (border-run union-find), and a full geometry
    dissolve would stitch the same border runs' arcs — not wired yet.
    Use this on per-tile-local features (or after re-tiling such that
    features don't straddle)."""
    from gdal_spark.kernels import wkb as W

    out_schema = T.StructType(
        [
            T.StructField("tx", T.LongType()),
            T.StructField("ty", T.LongType()),
            T.StructField("dn", T.DoubleType()),
            T.StructField("pixel_count", T.LongType()),
            T.StructField("n_rings", T.IntegerType()),
            T.StructField("perim", T.DoubleType()),
            T.StructField("parea", T.DoubleType()),
            T.StructField("wkb", T.BinaryType()),
        ]
    )

    def gen(pdf_iter):
        for pdf in pdf_iter:
            rows = []
            for _, row in pdf.iterrows():
                arr = np.frombuffer(row["data"], dtype=np.dtype(row["dtype"])).reshape(
                    tile_size, tile_size
                )
                tx, ty = int(row["tx"]), int(row["ty"])
                # tile-local geotransform: offset the origin by the
                # tile position so rings come out in global coords
                gtt = (
                    gt[0] + tx * tile_size * gt[1] + ty * tile_size * gt[2],
                    gt[1], gt[2],
                    gt[3] + tx * tile_size * gt[4] + ty * tile_size * gt[5],
                    gt[4], gt[5],
                )
                mask = None if nodata is None else arr != nodata
                labels = label_tile(arr, mask=mask, connect8=connect8)
                counts = {
                    lab: cnt for lab, _dn, cnt, _, _ in region_table(arr, labels)
                }
                for lab, (dn, rings) in enumerate(extract_polygons(arr, labels, gtt)):
                    ext = rings[0]
                    perim = float(
                        np.sum(np.sqrt(np.sum(np.diff(ext, axis=0) ** 2, axis=1)))
                    )
                    parea = abs(
                        0.5 * float(
                            np.sum(ext[:-1, 0] * ext[1:, 1] - ext[1:, 0] * ext[:-1, 1])
                        )
                    )
                    rows.append(
                        (
                            tx, ty, float(dn), int(counts.get(lab, 0)),
                            len(rings), perim, parea, W.polygon_wkb(rings),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["tx", "ty", "dn", "pixel_count", "n_rings", "perim", "parea", "wkb"],
            )

    return tiles.mapInPandas(gen, out_schema)
