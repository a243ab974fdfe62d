"""Layer algebra: distributed polygon-overlay operators.

Reference surface: ``OGRLayer::Intersection`` and friends — pairwise
GEOS overlay over spatially-filtered candidate pairs
(ogr/ogrsf_frmts/generic/ogrlayer.cpp:5385-7846, CLI
apps/gdalalg_vector_layer_algebra.cpp).  The reference's candidate
filter is an index-nested loop over the second layer's spatial index;
the Spark plan replaces it with a broadcast bbox prefilter (phase 1,
pure Catalyst, codegen) and runs the exact clip kernel only on
candidate pairs (phase 2, Arrow batch).

At scale: method-layer polygons (zones, admin boundaries, tile
footprints) broadcast; the input layer streams through its scan with
no shuffle — same shape as the PIP spatial join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.session import local_df

from gdal_spark.kernels import wkb as W
from gdal_spark.kernels.clip import clip_convex, ring_area


def intersection_convex(
    a: DataFrame,
    b_polys: list[tuple],
    a_id: str = "a_id",
    geom_col: str = "geom",
    b_id: str = "b_id",
) -> DataFrame:
    """a (WKB polygons) × small convex polygon list → one row per
    intersecting pair: (a_id, b_id, inter_wkb, inter_area).

    ``b_polys``: [(b_id, wkb)] — the broadcast (method) side.
    """
    spark = a.sparkSession
    rows = []
    for pid, blob in b_polys:
        xmin, ymin, xmax, ymax = W.wkb_bbox(blob)
        rows.append((int(pid), blob, float(xmin), float(ymin), float(xmax), float(ymax)))
    b_schema = T.StructType(
        [
            T.StructField(b_id, T.LongType()),
            T.StructField("_b_wkb", T.BinaryType()),
            T.StructField("_bx0", T.DoubleType()),
            T.StructField("_by0", T.DoubleType()),
            T.StructField("_bx1", T.DoubleType()),
            T.StructField("_by1", T.DoubleType()),
        ]
    )
    b_df = local_df(spark, rows, b_schema)

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def bbox_of(geoms: pd.Series) -> pd.Series:
        return pd.Series([list(W.wkb_bbox(bytes(g))) for g in geoms])

    aa = a.withColumn("_abox", bbox_of(F.col(geom_col)))
    # phase 1: bbox-overlap broadcast join (Catalyst, no shuffle of a)
    cand = aa.join(
        F.broadcast(b_df),
        (F.col("_abox")[0] <= F.col("_bx1"))
        & (F.col("_abox")[2] >= F.col("_bx0"))
        & (F.col("_abox")[1] <= F.col("_by1"))
        & (F.col("_abox")[3] >= F.col("_by0")),
    )

    out_fields = [f for f in cand.schema.fields if f.name not in
                  ("_abox", "_b_wkb", "_bx0", "_by0", "_bx1", "_by1")]
    out_schema = T.StructType(
        out_fields
        + [T.StructField("inter_wkb", T.BinaryType()),
           T.StructField("inter_area", T.DoubleType())]
    )
    keep = [f.name for f in out_fields]

    def clip_batch(pdf_iter):
        for pdf in pdf_iter:
            areas = np.zeros(len(pdf))
            blobs: list = [None] * len(pdf)
            for i, (ga, gb) in enumerate(zip(pdf[geom_col], pdf["_b_wkb"])):
                a_rings = W.polygon_rings(bytes(ga))
                b_rings = W.polygon_rings(bytes(gb))
                if not a_rings or not b_rings:
                    continue
                clipped = clip_convex(a_rings[0][0], b_rings[0][0])
                area = abs(ring_area(clipped))
                if area > 0:
                    ring = np.vstack([clipped, clipped[:1]])
                    blobs[i] = W.polygon_wkb([ring])
                    areas[i] = area
            out = pdf[keep].copy()
            out["inter_wkb"] = blobs
            out["inter_area"] = areas
            yield out

    res = cand.mapInPandas(clip_batch, out_schema)
    return res.filter(F.col("inter_area") > 0)


def erase_area(
    a: DataFrame,
    b_polys: list[tuple],
    a_id: str = "a_id",
    geom_col: str = "geom",
) -> DataFrame:
    """``OGRLayer::Erase`` (ogrlayer.cpp:7846) area accounting: per
    input feature, its area minus the area covered by the (pairwise
    disjoint) method polygons — same candidate join as Intersection,
    finished with a left-join so uncovered features survive whole.

    Returns (a_id, erase_area).  Requires ``b_polys`` pairwise
    disjoint (else subtractions double-count; the general case would
    union the b side first)."""
    from gdal_spark.kernels.clip import polygon_area

    @F.pandas_udf(T.DoubleType())
    def wkb_area(geoms: pd.Series) -> pd.Series:
        out = np.zeros(len(geoms))
        for i, g in enumerate(geoms):
            polys = W.polygon_rings(bytes(g))
            out[i] = sum(polygon_area(rings) for rings in polys)
        return pd.Series(out)

    inter = intersection_convex(a, b_polys, a_id=a_id, geom_col=geom_col)
    covered = inter.groupBy(a_id).agg(F.sum("inter_area").alias("_covered"))
    base = a.select(a_id, wkb_area(F.col(geom_col)).alias("_area"))
    return base.join(covered, a_id, "left").select(
        a_id,
        (F.col("_area") - F.coalesce(F.col("_covered"), F.lit(0.0))).alias("erase_area"),
    )


def layer_algebra_area(
    a: DataFrame,
    b_polys: list[tuple],
    op: str,
    a_id: str = "a_id",
    geom_col: str = "geom",
) -> DataFrame:
    """The remaining ``OGRLayer`` algebra methods in area-accounting
    form — Union (:6188), SymDifference (:6456), Identity (:6710),
    Update (:6986), Clip (:7206) of ogrlayer.cpp — built from the same
    two primitives as Intersection/Erase: the pairwise intersection
    pieces and the per-feature remainders.

    Piece inventory per op (both layers pairwise disjoint within
    themselves, the rect-zone case; general inputs would pre-union):

      clip      A∩B pieces aggregated per input feature
      identity  A∩B pieces + A-remainders
      union     A∩B pieces + A-remainders + B-remainders
      symdiff   A-remainders + B-remainders
      update    A-remainders + whole B features

    Returns (a_id nullable, b_id nullable, area); zero-area pieces are
    dropped (the reference skips empty geometries).  One broadcast
    join total — the same scale shape as Intersection."""
    from gdal_spark.kernels.clip import polygon_area

    spark = a.sparkSession
    inter = intersection_convex(a, b_polys, a_id=a_id, geom_col=geom_col).select(
        a_id, "b_id", F.col("inter_area").alias("area")
    ).persist()

    @F.pandas_udf(T.DoubleType())
    def wkb_area(geoms: pd.Series) -> pd.Series:
        return pd.Series(
            [sum(polygon_area(r) for r in W.polygon_rings(bytes(g))) for g in geoms]
        )

    base_a = a.select(a_id, wkb_area(F.col(geom_col)).alias("_area"))
    cov_a = inter.groupBy(a_id).agg(F.sum("area").alias("_cov"))
    a_rem = (
        base_a.join(cov_a, a_id, "left")
        .select(
            a_id,
            F.lit(None).cast("long").alias("b_id"),
            (F.col("_area") - F.coalesce(F.col("_cov"), F.lit(0.0))).alias("area"),
        )
        .filter(F.col("area") > 0)
    )
    b_base = local_df(spark, 
        [
            (int(pid), sum(polygon_area(r) for r in W.polygon_rings(blob)))
            for pid, blob in b_polys
        ],
        "b_id long, _area double",
    )
    cov_b = inter.groupBy("b_id").agg(F.sum("area").alias("_cov"))
    b_rem = (
        b_base.join(cov_b, "b_id", "left")
        .select(
            F.lit(None).cast("long").alias(a_id),
            "b_id",
            (F.col("_area") - F.coalesce(F.col("_cov"), F.lit(0.0))).alias("area"),
        )
        .filter(F.col("area") > 0)
    )
    b_whole = b_base.select(
        F.lit(None).cast("long").alias(a_id), "b_id", F.col("_area").alias("area")
    )
    if op == "clip":
        return inter.groupBy(a_id).agg(F.sum("area").alias("clip_area"))
    if op == "identity":
        return inter.unionByName(a_rem)
    if op == "union":
        return inter.unionByName(a_rem).unionByName(b_rem)
    if op == "symdiff":
        return a_rem.unionByName(b_rem)
    if op == "update":
        return a_rem.unionByName(b_whole)
    raise ValueError(op)


def overlay_features(
    a: DataFrame,
    b_polys: list[tuple],
    op: str,
    a_id: str = "a_id",
    geom_col: str = "geom",
) -> DataFrame:
    """Layer algebra emitting FEATURES (geometry WKB), completing the
    area-accounting operators: ``OGRLayer::Intersection/Union/
    Difference/SymDifference`` return the clipped GEOMETRIES
    (ogr/ogrsf_frmts/generic/ogrlayer.cpp:5385-6456 — per candidate
    pair for Intersection; per input feature minus the union of its
    intersecting method features for the remainder ops).  The exact
    arrangement noder (kernels/arrangement.py) traces the result rings
    — tolerance 0 on shared edges / vertex contact / collinear overlap
    — and the output is the noder's canonical MultiPolygon form
    (exteriors CCW, holes CW, minimal vertices, pinned start + order).

    Plan shape: broadcast bbox prefilter (Catalyst, no shuffle of
    ``a``) → Arrow-batched clip.  Output columns:

      intersection    (a_id, b_id, geom, piece_area)  one row/pair
      difference      (a_id, b_id=NULL, geom, piece_area)  A − ∪candidates
      union           intersection rows + A-remainders + B-remainders
                      (a_id=NULL), the reference's three-part Union
      symdifference   A-remainders + B-remainders

    B-remainders (B − union of its intersecting A features) come from
    a second grouped pass keyed by b_id — the method layer is
    dimension-sized, so that shuffle moves only candidate A geometries.

    ``b_polys`` pairwise disjoint (the method-layer contract shared
    with layer_algebra_area).
    """
    from gdal_spark.kernels.arrangement import overlay_geoms_exact

    spark = a.sparkSession
    rows = []
    for pid, blob in b_polys:
        xmin, ymin, xmax, ymax = W.wkb_bbox(blob)
        rows.append(
            (int(pid), blob, float(xmin), float(ymin), float(xmax), float(ymax))
        )
    b_df = local_df(
        spark,
        rows,
        T.StructType(
            [
                T.StructField("b_id", T.LongType()),
                T.StructField("_b_wkb", T.BinaryType()),
                T.StructField("_bx0", T.DoubleType()),
                T.StructField("_by0", T.DoubleType()),
                T.StructField("_bx1", T.DoubleType()),
                T.StructField("_by1", T.DoubleType()),
            ]
        ),
    )

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def bbox_of(geoms: pd.Series) -> pd.Series:
        return pd.Series([list(W.wkb_bbox(bytes(g))) for g in geoms])

    aa = a.withColumn("_abox", bbox_of(F.col(geom_col)))
    join_on = (
        (F.col("_abox")[0] <= F.col("_bx1"))
        & (F.col("_abox")[2] >= F.col("_bx0"))
        & (F.col("_abox")[1] <= F.col("_by1"))
        & (F.col("_abox")[3] >= F.col("_by0"))
    )
    how = "inner" if op in ("intersection",) else "left"
    cand = aa.join(F.broadcast(b_df), join_on, how)

    out_schema = T.StructType(
        [
            T.StructField(a_id, T.LongType()),
            T.StructField("b_id", T.LongType()),
            T.StructField("geom", T.BinaryType()),
            T.StructField("piece_area", T.DoubleType()),
        ]
    )

    def _mp_area(polys) -> float:
        tot = 0.0
        for rings in polys:
            for j, r in enumerate(rings):
                s = 0.5 * float(
                    np.sum(r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1])
                )
                tot += s  # exteriors CCW (+), holes CW (−)
        return tot

    def _rings_of(blob) -> list:
        return [r for rings in W.polygon_rings(bytes(blob)) for r in rings]

    def per_group(key, pdf):
        aid = int(key[0])
        a_blob = pdf[geom_col].iloc[0]
        a_rings = _rings_of(a_blob)
        cands = [
            (int(b), bytes(g))
            for b, g in zip(pdf["b_id"], pdf["_b_wkb"])
            if g is not None and not pd.isna(b)
        ]
        out = []
        if op in ("intersection", "union"):
            for bid, gb in cands:
                polys = overlay_geoms_exact(a_rings, _rings_of(gb), "intersection")
                if polys:
                    out.append(
                        (aid, bid, W.multipolygon_wkb(polys), _mp_area(polys))
                    )
        if op in ("difference", "union", "symdifference"):
            region = a_rings
            for _bid, gb in cands:
                polys = overlay_geoms_exact(region, _rings_of(gb), "difference")
                region = [r for rings in polys for r in rings]
            if region:
                # final no-op difference re-canonicalizes the flat ring
                # list into grouped (exterior, holes) polygons
                polys = overlay_geoms_exact(region, [], "difference")
                if polys:
                    out.append(
                        (aid, None, W.multipolygon_wkb(polys), _mp_area(polys))
                    )
        return pd.DataFrame(out, columns=[a_id, "b_id", "geom", "piece_area"])

    res = cand.groupBy(a_id).applyInPandas(per_group, out_schema)

    if op in ("union", "symdifference"):
        # B-remainders: B − union(intersecting A), grouped by b_id —
        # the reference's method-side pass (ogrlayer.cpp Union :6188 /
        # SymDifference :6456); inner join so only candidate A
        # geometries shuffle to the (dimension-sized) b groups
        bc = aa.join(F.broadcast(b_df), join_on, "inner")

        def _empty():
            return pd.DataFrame(
                {
                    a_id: pd.Series([], dtype="float64"),
                    "b_id": pd.Series([], dtype="int64"),
                    "geom": pd.Series([], dtype="object"),
                    "piece_area": pd.Series([], dtype="float64"),
                }
            )

        def per_b(key, pdf):
            bid = int(key[0])
            b_rings = _rings_of(pdf["_b_wkb"].iloc[0])
            region = b_rings
            for ga in pdf[geom_col]:
                polys = overlay_geoms_exact(region, _rings_of(ga), "difference")
                region = [r for rings in polys for r in rings]
            if not region:
                return _empty()
            polys = overlay_geoms_exact(region, [], "difference")
            if not polys:
                return _empty()
            return pd.DataFrame(
                [(None, bid, W.multipolygon_wkb(polys), _mp_area(polys))],
                columns=[a_id, "b_id", "geom", "piece_area"],
            )

        b_rem = bc.groupBy("b_id").applyInPandas(per_b, out_schema)
        # method features with NO candidates pass through whole
        cand_b = bc.select("b_id").distinct()
        b_whole_rows = b_df.join(cand_b, "b_id", "left_anti").select(
            F.lit(None).cast("long").alias(a_id),
            "b_id",
            F.col("_b_wkb").alias("geom"),
        )

        @F.pandas_udf(T.DoubleType())
        def wkb_area_abs(geoms: pd.Series) -> pd.Series:
            # orientation-agnostic: |exterior| − |holes| per polygon
            # (fixture WKB carries no orientation contract)
            out = []
            for g in geoms:
                tot = 0.0
                for rings in W.polygon_rings(bytes(g)):
                    for j, r in enumerate(rings):
                        s = abs(0.5 * float(np.sum(
                            r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1]
                        )))
                        tot += s if j == 0 else -s
                out.append(tot)
            return pd.Series(out)

        b_whole = b_whole_rows.withColumn(
            "piece_area", wkb_area_abs(F.col("geom"))
        )
        res = res.unionByName(b_rem).unionByName(b_whole)
    return res.filter(F.col("piece_area") > 0)


def union_cascaded(layer, id_col="gid", geom_col="geom"):
    """OGRGeometry::UnionCascaded (ogr/ogrgeometry.cpp:5553, GEOS
    CascadedUnion): per-group union of many polygons.  Distributed
    shape: groupBy(gid) applyInPandas; within a group the union folds
    left-to-right through the exact arrangement noder (correct under
    any contact degeneracy — shared edges, overlaps).  Returns
    (gid, n_polys, union_area).  Per-group cost is O(polys) noder
    unions over the ACCUMULATED region — groups are feature-sized by
    contract (the tiling keeps them small), the across-group axis is
    the distributed one."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401

    from gdal_spark.kernels import wkb as W
    from gdal_spark.kernels.arrangement import overlay_geoms_exact

    def one_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col + "_seq").reset_index(drop=True)
        region = None
        for b in pdf[geom_col]:
            _t, parts = W.parse_wkb(bytes(b))
            ring = parts[0]
            if region is None:
                region = [[ring]]
                continue
            flat = [r for rings in region for r in rings]
            region = overlay_geoms_exact(flat, ring, "union")
        area = 0.0
        n_polys = 0
        for rings in region or []:
            n_polys += 1
            for j, r in enumerate(rings):
                a = 0.5 * float(np.sum(
                    r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1]
                ))
                area += abs(a) if j == 0 else -abs(a)
        return pd.DataFrame(
            {"gid": [int(key[0])], "n_polys": [n_polys],
             "union_area": [round(area, 6)]}
        )

    seq = layer.withColumn(id_col + "_seq", F.monotonically_increasing_id())
    return seq.groupBy(id_col).applyInPandas(
        one_group, "gid long, n_polys int, union_area double"
    )
