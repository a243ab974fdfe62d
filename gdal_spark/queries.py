"""Driver-contract query registry.

Every operator from SURVEY.md §2 (plus the training-data-pipeline
additions) appears here twice:

- ``QUERIES[name]``  — (spark, sf_dir) → DataFrame, the engine's
  implementation (operators + kernels)
- ``ORACLES[name]``  — equivalent ANSI SQL for DuckDB on the same
  parquet views (omitted only for genuinely non-SQL-expressible ops;
  those get rows-only checks)

Determinism contract: every aliased column matches between the two;
double aggregates are rounded identically on both sides; all synthetic
spatial data derives from table keys with integer arithmetic so both
engines compute bit-identical inputs.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gdal_spark.session import local_df

from gdal_spark.functions import text as TXT
from gdal_spark.kernels import wkb as W
from gdal_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from gdal_spark.operators.grid import grid_idw
from gdal_spark.operators.knn import knn_broadcast
from gdal_spark.operators.focal import (
    focal_sum_tiles,
    horn_slope_tiles,
    interpolate_bilinear,
)
from gdal_spark.operators.polygonize import polygonize_tiles
from gdal_spark.operators.rasterize import rasterize_wkb_grid, tiles_to_features
from gdal_spark.operators.similarity import cosine_topk
from gdal_spark.operators.spatial_join import spatial_join_points_in_polygons, with_cell
from gdal_spark.operators.zonal import zonal_stats_points

QUERIES: dict = {}
ORACLES: dict = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Shared synthetic spatial derivations (integer arithmetic ⇒ identical
# doubles in Spark and DuckDB).

POINTS_SQL = (
    "SELECT doc_id, ((doc_id*9973)%36000)/100.0 - 180.0 AS lon, "
    "((doc_id*7919)%16000)/100.0 - 80.0 AS lat, n_chars AS v FROM documents"
)

RECTS_SQL = (
    "SELECT CAST(n_nationkey AS BIGINT) AS zone_id, "
    "CAST((n_nationkey*61)%300 - 160 AS DOUBLE) AS xmin, "
    "CAST((n_nationkey*83)%140 - 75 AS DOUBLE) AS ymin, "
    "CAST((n_nationkey*61)%300 - 160 + 10 + (n_nationkey%7)*5 AS DOUBLE) AS xmax, "
    "CAST((n_nationkey*83)%140 - 75 + 8 + (n_nationkey%5)*4 AS DOUBLE) AS ymax "
    "FROM nation"
)


def _points(spark, sf_dir) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        (((F.col("doc_id") * 9973) % 36000) / 100.0 - 180.0).alias("lon"),
        (((F.col("doc_id") * 7919) % 16000) / 100.0 - 80.0).alias("lat"),
        F.col("n_chars").alias("v"),
    )


def _rects(spark, sf_dir) -> list[tuple]:
    """[(zone_id, rect_wkb)] from the nation table (broadcast side)."""
    rows = _t(spark, sf_dir, "nation").select("n_nationkey").collect()
    out = []
    for r in rows:
        k = int(r[0])
        xmin = float((k * 61) % 300 - 160)
        ymin = float((k * 83) % 140 - 75)
        xmax = xmin + 10 + (k % 7) * 5
        ymax = ymin + 8 + (k % 5) * 4
        ring = np.array(
            [[xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax], [xmin, ymin]]
        )
        out.append((k, W.polygon_wkb([ring])))
    return out


# ---------------------------------------------------------------------------
# §2.2 projections / filters  +  §2.5 sort / limit


@query(
    "q01_filter_project",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
       FROM lineitem
       WHERE l_quantity > 45 AND l_discount < 0.05 AND l_returnflag = 'R'""",
)
def q01(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 45) & (F.col("l_discount") < 0.05) & (F.col("l_returnflag") == "R")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


@query(
    "q02_summary_agg",
    """SELECT count(*) AS n, count(DISTINCT l_partkey) AS nd_part,
       min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
       round(sum(l_quantity), 2) AS sum_qty, round(avg(l_quantity), 6) AS avg_qty,
       round(stddev_pop(l_quantity), 6) AS sd_pop, round(stddev_samp(l_quantity), 6) AS sd_samp
       FROM lineitem""",
)
def q02(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    return li.agg(
        F.count("*").alias("n"),
        F.count_distinct(F.col("l_partkey")).alias("nd_part"),
        F.min(q).alias("min_qty"),
        F.max(q).alias("max_qty"),
        F.round(F.sum(q), 2).alias("sum_qty"),
        F.round(F.avg(q), 6).alias("avg_qty"),
        F.round(F.stddev_pop(q), 6).alias("sd_pop"),
        F.round(F.stddev_samp(q), 6).alias("sd_samp"),
    )


@query(
    "q03_distinct",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def q03(spark, sf_dir):
    return _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@query(
    "q04_orderby_limit",
    """SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
       ORDER BY l_orderkey, l_linenumber LIMIT 100""",
)
def q04(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_shipdate")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# §2.4 aggregations


@query(
    "q05_groupby_agg",
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       round(avg(l_discount), 6) AS avg_disc
       FROM lineitem GROUP BY l_returnflag, l_linestatus""",
)
def q05(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
    )


# ---------------------------------------------------------------------------
# §2.3 joins  +  §2.6 set ops


@query(
    "q06_left_join",
    """SELECT coalesce(c.c_mktsegment, '__none__') AS seg, count(*) AS n,
       round(sum(o.o_totalprice), 2) AS total
       FROM orders o LEFT JOIN (SELECT * FROM customer WHERE c_custkey % 3 <> 0) c
       ON o.o_custkey = c.c_custkey
       GROUP BY 1""",
)
def q06(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 3 != 0)
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
    return j.groupBy(
        F.coalesce(F.col("c_mktsegment"), F.lit("__none__")).alias("seg")
    ).agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))


@query(
    "q07_union_all",
    """SELECT src, count(*) AS n FROM (
         SELECT 'hi' AS src, o_orderkey FROM orders WHERE o_totalprice > 200000
         UNION ALL
         SELECT 'lo' AS src, o_orderkey FROM orders WHERE o_totalprice < 50000
       ) GROUP BY src""",
)
def q07(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    hi = o.filter(F.col("o_totalprice") > 200000).select(
        F.lit("hi").alias("src"), "o_orderkey"
    )
    lo = o.filter(F.col("o_totalprice") < 50000).select(
        F.lit("lo").alias("src"), "o_orderkey"
    )
    return hi.unionByName(lo).groupBy("src").agg(F.count("*").alias("n"))


# ---------------------------------------------------------------------------
# §2.8 scalar expressions (OGR SQL op surface: LIKE/ILIKE/SUBSTR/CONCAT/CAST)


@query(
    "q08_expressions",
    """SELECT p_partkey,
       concat(p_brand, ':', substr(p_type, 1, 6)) AS brand_type,
       CAST(floor(p_retailprice) AS BIGINT) AS price_int,
       (p_name LIKE '%gre%') AS has_gre,
       (p_brand ILIKE 'brand#1%') AS b1
       FROM part WHERE p_size BETWEEN 10 AND 30 AND p_partkey % 7 = 0""",
)
def q08(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.filter(
        F.col("p_size").between(10, 30) & (F.col("p_partkey") % 7 == 0)
    ).select(
        "p_partkey",
        F.concat(F.col("p_brand"), F.lit(":"), F.substring("p_type", 1, 6)).alias(
            "brand_type"
        ),
        F.floor("p_retailprice").cast("bigint").alias("price_int"),
        F.col("p_name").like("%gre%").alias("has_gre"),
        F.col("p_brand").ilike("brand#1%").alias("b1"),
    )


# ---------------------------------------------------------------------------
# events: time-window aggregation + sessionize (streaming-shaped batch ops)


@query(
    "q09_events_hourly",
    """SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n, round(sum(value), 2) AS sum_value
       FROM events GROUP BY 1, 2""",
)
def q09(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type")
    ).agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))


@query(
    "q10_sessionize",
    """WITH g AS (
         SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es,
                LAG(CAST(floor(epoch(ts)) AS BIGINT)) OVER
                  (PARTITION BY user_id ORDER BY ts, event_id) AS prev_es
         FROM events)
       SELECT user_id,
              CAST(1 + sum(CASE WHEN prev_es IS NOT NULL AND es - prev_es > 1800
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
              count(*) AS n_events
       FROM g GROUP BY user_id""",
)
def q10(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    es = F.unix_timestamp("ts")
    g = e.withColumn("es", es).withColumn("prev_es", F.lag("es").over(w))
    return g.groupBy("user_id").agg(
        (
            1
            + F.sum(
                F.when(
                    F.col("prev_es").isNotNull() & (F.col("es") - F.col("prev_es") > 1800),
                    1,
                ).otherwise(0)
            )
        ).alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


@query(
    "q61_session_window",
    """WITH g AS (
         SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es,
                LAG(CAST(floor(epoch(ts)) AS BIGINT)) OVER
                  (PARTITION BY user_id ORDER BY ts, event_id) AS prev_es
         FROM events)
       SELECT user_id,
              CAST(1 + sum(CASE WHEN prev_es IS NOT NULL AND es - prev_es > 1800
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
              count(*) AS n_events
       FROM g GROUP BY user_id""",
)
def q61(spark, sf_dir):
    """Sessionization via Spark's NATIVE session_window operator (the
    Catalyst merging-session aggregate, no window-function pass).
    Timestamps truncate to seconds so the inclusive boundary (an event
    exactly at session end merges) equals q10's ≤1800 s rule."""
    e = _t(spark, sf_dir, "events").withColumn(
        "ts_s", F.date_trunc("second", F.col("ts"))
    )
    sess = (
        e.groupBy("user_id", F.session_window(F.col("ts_s"), "1800 seconds"))
        .agg(F.count("*").alias("n"))
    )
    return sess.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"), F.sum("n").alias("n_events")
    )


# ---------------------------------------------------------------------------
# §2.2/2.3 spatial: PIP join, zonal stats, kNN, cells


@query(
    "q11_spatial_pip_join",
    f"""WITH pts AS ({POINTS_SQL}), rects AS ({RECTS_SQL})
       SELECT p.doc_id, r.zone_id FROM pts p JOIN rects r
       ON p.lon >= r.xmin AND p.lon <= r.xmax
       AND p.lat >= r.ymin AND p.lat <= r.ymax""",
)
def q11(spark, sf_dir):
    pts = _points(spark, sf_dir)
    rects = _rects(spark, sf_dir)
    j = spatial_join_points_in_polygons(
        pts, rects, include_boundary=True, poly_id_col="zone_id"
    )
    return j.select("doc_id", "zone_id")


@query(
    "q12_zonal_stats",
    f"""WITH pts AS ({POINTS_SQL}), rects AS ({RECTS_SQL})
       SELECT r.zone_id, count(*) AS zcount,
              round(sum(CAST(p.v AS DOUBLE)), 4) AS zsum,
              round(avg(CAST(p.v AS DOUBLE)), 4) AS zmean,
              min(CAST(p.v AS DOUBLE)) AS zmin, max(CAST(p.v AS DOUBLE)) AS zmax,
              round(stddev_pop(CAST(p.v AS DOUBLE)), 4) AS zstddev,
              count(DISTINCT CAST(p.v AS DOUBLE)) AS zvariety
       FROM pts p JOIN rects r
       ON p.lon >= r.xmin AND p.lon <= r.xmax AND p.lat >= r.ymin AND p.lat <= r.ymax
       GROUP BY r.zone_id""",
)
def q12(spark, sf_dir):
    pts = _points(spark, sf_dir)
    rects = _rects(spark, sf_dir)
    return zonal_stats_points(pts, rects, value_col="v", zone_id_col="zone_id")


@query(
    "q13_knn",
    f"""WITH pts AS ({POINTS_SQL}),
       q AS (SELECT CAST(s_suppkey AS BIGINT) AS qid,
                    CAST((s_suppkey*131)%360 - 180 AS DOUBLE) + 0.5 AS qx,
                    CAST((s_suppkey*197)%160 - 80 AS DOUBLE) + 0.5 AS qy
             FROM supplier WHERE s_suppkey <= 20),
       d AS (SELECT q.qid, p.doc_id,
                    (p.lon-q.qx)*(p.lon-q.qx) + (p.lat-q.qy)*(p.lat-q.qy) AS dist2
             FROM q CROSS JOIN pts p),
       r AS (SELECT qid, doc_id, dist2,
                    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist2, doc_id) AS knn_rank
             FROM d)
       SELECT qid, doc_id, round(dist2, 6) AS dist2, CAST(knn_rank AS INT) AS knn_rank
       FROM r WHERE knn_rank <= 4""",
)
def q13(spark, sf_dir):
    pts = _points(spark, sf_dir)
    s = _t(spark, sf_dir, "supplier").filter(F.col("s_suppkey") <= 20)
    qs = s.select(
        F.col("s_suppkey").cast("long").alias("qid"),
        (((F.col("s_suppkey") * 131) % 360 - 180).cast("double") + 0.5).alias("qx"),
        (((F.col("s_suppkey") * 197) % 160 - 80).cast("double") + 0.5).alias("qy"),
    )
    out = knn_broadcast(
        pts, qs, k=4, point_id="doc_id", query_id="qid", px="lon", py="lat"
    )
    return out.select("qid", "doc_id", F.round("dist2", 6).alias("dist2"), "knn_rank")


@query(
    "q59_knn_radius",
    f"""WITH pts AS ({POINTS_SQL}),
       q AS (SELECT CAST(s_suppkey AS BIGINT) AS qid,
                    CAST((s_suppkey*131)%360 - 180 AS DOUBLE) + 0.5 AS qx,
                    CAST((s_suppkey*197)%160 - 80 AS DOUBLE) + 0.5 AS qy
             FROM supplier WHERE s_suppkey <= 30),
       d AS (SELECT q.qid, p.doc_id,
                    (p.lon-q.qx)*(p.lon-q.qx) + (p.lat-q.qy)*(p.lat-q.qy) AS dist2
             FROM q CROSS JOIN pts p),
       r AS (SELECT qid, doc_id, dist2,
                    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist2, doc_id) AS knn_rank
             FROM d WHERE dist2 <= 25.0)
       SELECT qid, doc_id, round(dist2, 6) AS dist2, CAST(knn_rank AS INT) AS knn_rank
       FROM r WHERE knn_rank <= 8""",
)
def q59(spark, sf_dir):
    """kNN with the search-radius bound (GDALGridNearestNeighbor's
    radius/maxPoints options): candidates beyond radius excluded BEFORE
    ranking, so under-populated neighborhoods return < k rows."""
    pts = _points(spark, sf_dir)
    s = _t(spark, sf_dir, "supplier").filter(F.col("s_suppkey") <= 30)
    qs = s.select(
        F.col("s_suppkey").cast("long").alias("qid"),
        (((F.col("s_suppkey") * 131) % 360 - 180).cast("double") + 0.5).alias("qx"),
        (((F.col("s_suppkey") * 197) % 160 - 80).cast("double") + 0.5).alias("qy"),
    )
    out = knn_broadcast(
        pts, qs, k=8, point_id="doc_id", query_id="qid", px="lon", py="lat",
        max_radius=5.0,
    )
    return out.select("qid", "doc_id", F.round("dist2", 6).alias("dist2"), "knn_rank")


@query(
    "q14_raster_density",
    f"""WITH pts AS ({POINTS_SQL})
       SELECT CAST(floor((lon+180)/360.0*64) AS BIGINT) AS tx,
              CAST(floor((80-lat)/160.0*64) AS BIGINT) AS ty,
              count(*) AS n, round(sum(CAST(v AS DOUBLE)), 2) AS sum_v
       FROM pts GROUP BY 1, 2""",
)
def q14(spark, sf_dir):
    pts = _points(spark, sf_dir)
    return pts.groupBy(
        F.floor((F.col("lon") + 180) / 360.0 * 64).cast("long").alias("tx"),
        F.floor((80 - F.col("lat")) / 160.0 * 64).cast("long").alias("ty"),
    ).agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.col("v").cast("double")), 2).alias("sum_v"),
    )


@query(
    "q15_tile_pyramid",
    f"""WITH pts AS ({POINTS_SQL}),
       base AS (SELECT CAST(floor((lon+180)/360.0*64) AS BIGINT) AS tx,
                       CAST(floor((80-lat)/160.0*64) AS BIGINT) AS ty,
                       count(*) AS n
                FROM pts GROUP BY 1, 2)
       SELECT tx // 4 AS ptx, ty // 4 AS pty, CAST(sum(n) AS BIGINT) AS n,
              count(*) AS n_children
       FROM base GROUP BY 1, 2""",
)
def q15(spark, sf_dir):
    base = QUERIES["q14_raster_density"](spark, sf_dir)
    return base.groupBy(
        F.floor(F.col("tx") / 4).cast("long").alias("ptx"),
        F.floor(F.col("ty") / 4).cast("long").alias("pty"),
    ).agg(F.sum("n").alias("n"), F.count("*").alias("n_children"))


@query(
    "q16_cell_index",
    f"""WITH pts AS ({POINTS_SQL})
       SELECT doc_id,
              7*144115188075855872
                + CAST(floor((lon+180)/360.0*128) AS BIGINT)*268435456
                + CAST(floor((90-lat)/180.0*128) AS BIGINT) AS cell
       FROM pts""",
)
def q16(spark, sf_dir):
    pts = _points(spark, sf_dir)
    return with_cell(pts, res=7).select("doc_id", "cell")


# ---------------------------------------------------------------------------
# §2.7 raster↔vector: exact scanline burn + distributed polygonize

IDENTITY_GT = (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)

# q25 rects: fractional corners that exercise the pixel-center rounding
# (x any quarter-fraction; y quarter-fractions but integer heights so no
# scanline ever hits a horizontal edge exactly — the oracle then needs
# no horizontal-run branch).  Burn = MERGE_ADD (order-free overlap sum).
Q25_RECTS_SQL = (
    "SELECT CAST(n_nationkey + 1 AS DOUBLE) AS val, "
    "CAST((n_nationkey*37)%90 + (n_nationkey%4)*0.25 AS DOUBLE) AS x0, "
    "CAST((n_nationkey*53)%90 + (n_nationkey%2)*0.25 AS DOUBLE) AS y0, "
    "CAST((n_nationkey*37)%90 + (n_nationkey%4)*0.25 + 3 + (n_nationkey*11)%23 "
    " + (n_nationkey%3)*0.5 AS DOUBLE) AS x1, "
    "CAST((n_nationkey*53)%90 + (n_nationkey%2)*0.25 + 2 + (n_nationkey*7)%17 "
    " AS DOUBLE) AS y1 "
    "FROM nation"
)


def _q25_rect_rows(spark, sf_dir) -> list[tuple]:
    rows = _t(spark, sf_dir, "nation").select("n_nationkey").collect()
    out = []
    for r in rows:
        k = int(r[0])
        x0 = (k * 37) % 90 + (k % 4) * 0.25
        y0 = (k * 53) % 90 + (k % 2) * 0.25
        x1 = x0 + 3 + (k * 11) % 23 + (k % 3) * 0.5
        y1 = y0 + 2 + (k * 7) % 17
        ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])
        out.append((float(k + 1), W.polygon_wkb([ring])))
    return out


@query(
    "q25_rasterize_burn",
    f"""WITH r AS ({Q25_RECTS_SQL}),
       pix AS (SELECT gx.range AS gx, gy.range AS gy, r.val
               FROM r, range(128) gx, range(128) gy
               WHERE gy.range + 0.5 >= r.y0 AND gy.range + 0.5 < r.y1
                 AND gx.range >= floor(r.x0 + 0.5)
                 AND gx.range <= floor(r.x1 + 0.5) - 1)
       SELECT gx, gy, CAST(sum(val) AS DOUBLE) AS v
       FROM pix GROUP BY gx, gy""",
)
def q25(spark, sf_dir):
    """GDALRasterize scanline semantics (alg/llrasterize.cpp:41-226) on
    a 128² grid of 32² blocks, MERGE_ALG=ADD, verified pixel-for-pixel
    against the analytic half-open pixel-center rule."""
    rects = _q25_rect_rows(spark, sf_dir)
    feats = local_df(spark, rects, "burn double, geom binary")
    tiles = rasterize_wkb_grid(
        feats, IDENTITY_GT, 128, 128, tile_size=32, merge_add=True
    )
    return tiles_to_features(tiles, tile_size=32, nodata=0.0)


# q26 rects: integer-cornered, pairwise-disjoint with >=2px gaps, laid
# out on a 16px lattice so many cross the 32px block borders — the
# cross-tile union-find merge is what's under test.
Q26_RECTS_SQL = (
    "SELECT CAST(n_nationkey + 1 AS DOUBLE) AS dn, "
    "CAST((n_nationkey%8)*16 + 2 AS BIGINT) AS x0, "
    "CAST((n_nationkey//8)*16 + 3 AS BIGINT) AS y0, "
    "CAST(3 + n_nationkey%9 AS BIGINT) AS w, "
    "CAST(2 + n_nationkey%7 AS BIGINT) AS h "
    "FROM nation"
)


def _q26_rect_rows(spark, sf_dir) -> list[tuple]:
    rows = _t(spark, sf_dir, "nation").select("n_nationkey").collect()
    out = []
    for r in rows:
        k = int(r[0])
        x0 = (k % 8) * 16 + 2
        y0 = (k // 8) * 16 + 3
        w = 3 + k % 9
        h = 2 + k % 7
        ring = np.array(
            [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h], [x0, y0]],
            dtype=np.float64,
        )
        out.append((float(k + 1), W.polygon_wkb([ring])))
    return out


@query(
    "q26_polygonize",
    f"""WITH r AS ({Q26_RECTS_SQL})
       SELECT CAST(dn AS BIGINT) AS dn, w * h AS pixel_count,
              ((x0 + w - 1) // 32 - x0 // 32 + 1)
              * ((y0 + h - 1) // 32 - y0 // 32 + 1) AS n_tiles
       FROM r""",
)
def q26(spark, sf_dir):
    """GDALPolygonize semantics (alg/polygonize.cpp:73-300) distributed:
    per-tile CCL + border-run join + union-find merge; disjoint integer
    rectangles make the expected region table analytic."""
    rects = _q26_rect_rows(spark, sf_dir)
    feats = local_df(spark, rects, "burn double, geom binary")
    tiles = rasterize_wkb_grid(feats, IDENTITY_GT, 128, 128, tile_size=32)
    regions = polygonize_tiles(tiles, nodata=0.0, connect8=False, tile_size=32)
    return regions.select(
        F.col("dn").cast("long").alias("dn"),
        F.col("pixel_count"),
        F.col("n_tiles"),
    )


def _q58_line_rows(spark, sf_dir) -> list[tuple]:
    rows = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_partkey") <= 40)
        .select("p_partkey").distinct().collect()
    )
    out = []
    for r in rows:
        k = int(r[0])
        if k % 2 == 0:
            y = 3 + (k * 7) % 120 + 0.4
            x0 = (k * 11) % 60 + 0.3
            coords = np.array([[x0, y], [x0 + 30.4, y]])
        else:
            x = 2 + (k * 13) % 120 + 0.6
            y0 = (k * 17) % 80 + 0.2
            coords = np.array([[x, y0], [x, y0 + 25.6]])
        out.append((float(k + 1), W.linestring_wkb(coords)))
    return out


@query(
    "q58_line_burn",
    """WITH ks AS (SELECT DISTINCT p_partkey AS k FROM part WHERE p_partkey <= 40),
       h AS (SELECT k+1 AS val, 3 + (k*7)%120 AS gy, (k*11)%60 AS x0
             FROM ks WHERE k % 2 = 0),
       hp AS (SELECT val, x0 + dx.range AS gx, gy FROM h, range(31) dx),
       v AS (SELECT k+1 AS val, 2 + (k*13)%120 AS gx, (k*17)%80 AS y0
             FROM ks WHERE k % 2 = 1),
       vp AS (SELECT val, gx, y0 + dy.range AS gy FROM v, range(26) dy),
       allp AS (SELECT * FROM hp UNION ALL SELECT * FROM vp)
       SELECT gx, gy, CAST(sum(val) AS DOUBLE) AS v
       FROM allp GROUP BY gx, gy""",
)
def q58(spark, sf_dir):
    """Line rasterization (GDALdllImageLine Bresenham semantics incl.
    the reference's reversed vertex order and last-segment endpoint
    inclusion), MERGE_ALG=ADD; axis-aligned lines make the burned pixel
    runs analytic, and crossings verify the additive merge."""
    feats = local_df(spark, 
        _q58_line_rows(spark, sf_dir), "burn double, geom binary"
    )
    tiles = rasterize_wkb_grid(
        feats, IDENTITY_GT, 128, 128, tile_size=32, merge_add=True
    )
    return tiles_to_features(tiles, tile_size=32, nodata=0.0)


# ---------------------------------------------------------------------------
# §2.5 focal / §2.8 DEM ops / §2.3 interpolate-at-point (halo exchange)

Q25_PIX_SQL = (
    f"WITH r AS ({Q25_RECTS_SQL}), "
    "pix AS (SELECT gx.range AS gx, gy.range AS gy, r.val "
    "        FROM r, range(128) gx, range(128) gy "
    "        WHERE gy.range + 0.5 >= r.y0 AND gy.range + 0.5 < r.y1 "
    "          AND gx.range >= floor(r.x0 + 0.5) "
    "          AND gx.range <= floor(r.x1 + 0.5) - 1), "
    "rast AS (SELECT gx, gy, CAST(sum(val) AS DOUBLE) AS v FROM pix GROUP BY gx, gy)"
)


def _q25_tiles(spark, sf_dir):
    feats = local_df(spark, 
        _q25_rect_rows(spark, sf_dir), "burn double, geom binary"
    )
    return rasterize_wkb_grid(feats, IDENTITY_GT, 128, 128, tile_size=32, merge_add=True)


@query(
    "q27_focal_sum",
    f"""{Q25_PIX_SQL},
       sh AS (SELECT gx + dx.range AS cgx, gy + dy.range AS cgy, v
              FROM rast, range(-1, 2) dx, range(-1, 2) dy)
       SELECT cgx AS gx, cgy AS gy, CAST(sum(v) AS DOUBLE) AS v
       FROM sh WHERE cgx BETWEEN 0 AND 127 AND cgy BETWEEN 0 AND 127
       GROUP BY cgx, cgy""",
)
def q27(spark, sf_dir):
    """3×3 focal sum (gdal raster neighbors) with cross-tile halo
    exchange: tiles trade 1-px boundary strips, one narrow shuffle."""
    return focal_sum_tiles(_q25_tiles(spark, sf_dir), tile_size=32, width=128, height=128)


def _z_sql(a: str, b: str) -> str:
    """Inline DEM formula z(gx, gy) as SQL text (integers → exact)."""
    return f"((({a})*7 + ({b})*13)%97 + (({a})*({a}))%23)"


DEM_TILE = 32
DEM_W = DEM_H = 128


def _dem_tiles(spark):
    """Deterministic synthetic DEM as a tile table (z = pure integer
    function of the global pixel coords, partition-parallel synth)."""
    from gdal_spark.operators.rasterize import TILE_SCHEMA

    ntx, nty = DEM_W // DEM_TILE, DEM_H // DEM_TILE

    def gen(pdf_iter):
        for pdf in pdf_iter:
            rows = []
            for _, row in pdf.iterrows():
                t = int(row["id"])
                tx, ty = t % ntx, t // ntx
                gx = np.arange(DEM_TILE) + tx * DEM_TILE
                gy = np.arange(DEM_TILE) + ty * DEM_TILE
                GX, GY = np.meshgrid(gx, gy)
                z = ((GX * 7 + GY * 13) % 97 + (GX * GX) % 23).astype(np.float64)
                rows.append((0, tx, ty, 1, z.tobytes(), "float64", 0.0))
            yield pd.DataFrame(
                rows, columns=["z", "tx", "ty", "band", "data", "dtype", "nodata"]
            )

    return (
        spark.range(ntx * nty)
        .repartition(4)
        .mapInPandas(gen, TILE_SCHEMA)
    )


@query(
    "q28_horn_slope",
    f"""WITH g AS (SELECT gx.range AS gx, gy.range AS gy
                   FROM range(1, 127) gx, range(1, 127) gy),
       pq AS (SELECT gx, gy,
              (({_z_sql('gx+1', 'gy-1')} + 2*{_z_sql('gx+1', 'gy')} + {_z_sql('gx+1', 'gy+1')})
               - ({_z_sql('gx-1', 'gy-1')} + 2*{_z_sql('gx-1', 'gy')} + {_z_sql('gx-1', 'gy+1')})) / 8.0 AS p,
              (({_z_sql('gx-1', 'gy+1')} + 2*{_z_sql('gx', 'gy+1')} + {_z_sql('gx+1', 'gy+1')})
               - ({_z_sql('gx-1', 'gy-1')} + 2*{_z_sql('gx', 'gy-1')} + {_z_sql('gx+1', 'gy-1')})) / 8.0 AS q
              FROM g)
       SELECT gx, gy, round(100.0 * sqrt(p*p + q*q), 6) AS slope_pct
       FROM pq WHERE 100.0 * sqrt(p*p + q*q) <> 0""",
)
def q28(spark, sf_dir):
    """gdaldem slope (Horn) over a synthetic DEM tile table; halo
    exchange supplies the 3×3 neighborhood across tile borders."""
    slope = horn_slope_tiles(_dem_tiles(spark), DEM_TILE, DEM_W, DEM_H)
    return slope.select(
        "gx", "gy", F.round(F.col("v"), 6).alias("slope_pct")
    )


@query(
    "q31_interpolate_bilinear",
    f"""{Q25_PIX_SQL},
       q AS (SELECT CAST(s_suppkey AS BIGINT) AS qid,
                    ((s_suppkey*29)%1200)/10.0 + 1.55 AS qx,
                    ((s_suppkey*41)%1200)/10.0 + 1.35 AS qy
             FROM supplier),
       b AS (SELECT qid, qx, qy,
                    CAST(floor(qx - 0.5) AS BIGINT) AS gx0,
                    CAST(floor(qy - 0.5) AS BIGINT) AS gy0,
                    qx - 0.5 - floor(qx - 0.5) AS wx,
                    qy - 0.5 - floor(qy - 0.5) AS wy
             FROM q)
       SELECT b.qid,
              round(coalesce(a00.v, 0)*(1-wx)*(1-wy) + coalesce(a10.v, 0)*wx*(1-wy)
                    + coalesce(a01.v, 0)*(1-wx)*wy + coalesce(a11.v, 0)*wx*wy, 6) AS v
       FROM b
       LEFT JOIN rast a00 ON a00.gx = b.gx0     AND a00.gy = b.gy0
       LEFT JOIN rast a10 ON a10.gx = b.gx0 + 1 AND a10.gy = b.gy0
       LEFT JOIN rast a01 ON a01.gx = b.gx0     AND a01.gy = b.gy0 + 1
       LEFT JOIN rast a11 ON a11.gx = b.gx0 + 1 AND a11.gy = b.gy0 + 1""",
)
def q31(spark, sf_dir):
    """GDALInterpolateAtPoint bilinear: each query point cogroups with
    the single halo-padded tile containing it."""
    s = _t(spark, sf_dir, "supplier")
    pts = s.select(
        F.col("s_suppkey").cast("long").alias("qid"),
        (((F.col("s_suppkey") * 29) % 1200) / 10.0 + 1.55).alias("qx"),
        (((F.col("s_suppkey") * 41) % 1200) / 10.0 + 1.35).alias("qy"),
    )
    out = interpolate_bilinear(
        _q25_tiles(spark, sf_dir), pts, tile_size=32, width=128, height=128
    )
    return out.select("qid", F.round(F.col("v"), 6).alias("v"))


# ---------------------------------------------------------------------------
# §2.3 layer algebra (overlay intersection)  +  §2.5 spatial sort

B_RECTS_SQL = (
    "SELECT CAST(r_regionkey AS BIGINT) AS b_id, "
    "CAST((r_regionkey*47)%200 - 120 AS DOUBLE) AS bx0, "
    "CAST((r_regionkey*31)%100 - 60 AS DOUBLE) AS by0, "
    "CAST((r_regionkey*47)%200 - 120 + 40 + r_regionkey*7 AS DOUBLE) AS bx1, "
    "CAST((r_regionkey*31)%100 - 60 + 30 + r_regionkey*5 AS DOUBLE) AS by1 "
    "FROM region"
)


def _b_rect_rows(spark, sf_dir) -> list[tuple]:
    rows = _t(spark, sf_dir, "region").select("r_regionkey").collect()
    out = []
    for r in rows:
        k = int(r[0])
        x0 = float((k * 47) % 200 - 120)
        y0 = float((k * 31) % 100 - 60)
        x1 = x0 + 40 + k * 7
        y1 = y0 + 30 + k * 5
        ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])
        out.append((k, W.polygon_wkb([ring])))
    return out


@query(
    "q29_overlay_intersection",
    f"""WITH a AS ({RECTS_SQL}), b AS ({B_RECTS_SQL})
       SELECT a.zone_id AS a_id, b.b_id,
              round((least(a.xmax, b.bx1) - greatest(a.xmin, b.bx0))
                    * (least(a.ymax, b.by1) - greatest(a.ymin, b.by0)), 6) AS inter_area
       FROM a JOIN b
       ON least(a.xmax, b.bx1) > greatest(a.xmin, b.bx0)
       AND least(a.ymax, b.by1) > greatest(a.ymin, b.by0)""",
)
def q29(spark, sf_dir):
    """Layer-algebra Intersection (ogrlayer.cpp:5385): bbox broadcast
    prefilter + exact Sutherland-Hodgman clip kernel; the analytic
    rect∩rect area is the oracle."""
    from gdal_spark.operators.overlay import intersection_convex

    a_rows = [(int(pid), blob) for pid, blob in _rects(spark, sf_dir)]
    a_df = local_df(spark, a_rows, "a_id long, geom binary")
    out = intersection_convex(a_df, _b_rect_rows(spark, sf_dir))
    return out.select("a_id", "b_id", F.round(F.col("inter_area"), 6).alias("inter_area"))


@query(
    "q30_spatial_sort_morton",
    f"""WITH pts AS ({POINTS_SQL}),
       g AS (SELECT doc_id,
                    CAST(floor((lon+180.0)/360.0*256) AS BIGINT) AS x,
                    CAST(floor((90.0-lat)/180.0*256) AS BIGINT) AS y
             FROM pts),
       m AS (SELECT doc_id,
                    CAST(sum(((x // CAST(power(2, j.range) AS BIGINT)) % 2)
                             * CAST(power(2, 2*j.range+1) AS BIGINT)
                           + ((y // CAST(power(2, j.range) AS BIGINT)) % 2)
                             * CAST(power(2, 2*j.range) AS BIGINT)) AS BIGINT) AS morton
             FROM g, range(8) j GROUP BY doc_id)
       SELECT doc_id, morton FROM m ORDER BY morton, doc_id LIMIT 300""",
)
def q30(spark, sf_dir):
    """Z-order spatial sort (gdal vector sort --hilbert's role): pure
    Catalyst bit-interleave key + range partitioning."""
    from gdal_spark.operators.sort import spatial_sort

    pts = _points(spark, sf_dir)
    return (
        spatial_sort(pts, res=8)
        .select("doc_id", "morton")
        .orderBy("morton", "doc_id")
        .limit(300)
    )


# ---------------------------------------------------------------------------
# dedup / text-analysis suite (documents)

# synthetic near-dups: every 50th doc duplicated with id+1000000
DOCS_WITH_DUPS_SQL = (
    "SELECT doc_id, text, lang FROM documents "
    "UNION ALL SELECT doc_id + 1000000 AS doc_id, text, lang "
    "FROM documents WHERE doc_id % 50 = 0"
)

FP_SQL = (
    "md5(trim(regexp_replace(regexp_replace(lower(text), '[.,!?;:]', '', 'g'),"
    " ' +', ' ', 'g')))"
)


def _docs_with_dups(spark, sf_dir) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    dups = d.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text", "lang"
    )
    return d.unionByName(dups)


@query(
    "q17_dedup_exact",
    f"""WITH d AS ({DOCS_WITH_DUPS_SQL})
       SELECT {FP_SQL} AS fp, count(*) AS dup_count, min(doc_id) AS keeper
       FROM d GROUP BY 1 HAVING count(*) > 1""",
)
def q17(spark, sf_dir):
    d = _docs_with_dups(spark, sf_dir)
    return exact_dedup(d).filter(F.col("dup_count") > 1)


@query(
    "q18_minhash_lsh",
    f"""WITH d AS ({DOCS_WITH_DUPS_SQL}),
       tk AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
              FROM d),
       toks AS (SELECT DISTINCT doc_id, tok FROM (
           SELECT doc_id,
                  unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                         i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS tok
           FROM tk)),
       sigs AS (SELECT doc_id,
                min(md5(tok || 's0')) AS sig0, min(md5(tok || 's1')) AS sig1,
                min(md5(tok || 's2')) AS sig2, min(md5(tok || 's3')) AS sig3,
                min(md5(tok || 's4')) AS sig4, min(md5(tok || 's5')) AS sig5,
                min(md5(tok || 's6')) AS sig6, min(md5(tok || 's7')) AS sig7
                FROM toks GROUP BY doc_id),
       buckets AS (
         SELECT doc_id, 0 AS band, md5(sig0 || sig1 || sig2 || sig3) AS bucket FROM sigs
         UNION ALL
         SELECT doc_id, 1 AS band, md5(sig4 || sig5 || sig6 || sig7) AS bucket FROM sigs),
       cand AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
                FROM buckets l JOIN buckets r USING (band, bucket)
                WHERE l.doc_id < r.doc_id),
       sizes AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id),
       inter AS (SELECT c.a, c.b, count(*) AS inter
                 FROM cand c JOIN toks ta ON ta.doc_id = c.a
                 JOIN toks tb ON tb.doc_id = c.b AND tb.tok = ta.tok
                 GROUP BY c.a, c.b)
       SELECT i.a, i.b,
              round(CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter), 6) AS jaccard
       FROM inter i JOIN sizes sa ON sa.doc_id = i.a JOIN sizes sb ON sb.doc_id = i.b
       WHERE round(CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter), 6) >= 0.5""",
)
def q18(spark, sf_dir):
    d = _docs_with_dups(spark, sf_dir)
    return minhash_lsh_pairs(d, threshold=0.5, k=3)


@query(
    "q19_ngram_jaccard",
    f"""WITH d AS (SELECT doc_id, text FROM ({DOCS_WITH_DUPS_SQL}) WHERE doc_id % 10 = 0),
       idx AS (SELECT doc_id, text,
                      unnest(range(1, greatest(length(text) - 1, 2))) AS i FROM d),
       grams0 AS (SELECT DISTINCT doc_id, gram FROM (
           SELECT doc_id, substr(text, CAST(i AS INT), 3) AS gram FROM idx)
           WHERE length(gram) = 3),
       keep AS (SELECT gram FROM grams0 GROUP BY gram HAVING count(*) <= 120),
       grams AS (SELECT g.doc_id, g.gram FROM grams0 g JOIN keep k ON g.gram = k.gram),
       sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
       inter AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
                 FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
                 GROUP BY 1, 2)
       SELECT i.a, i.b,
              round(CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter), 6) AS jaccard
       FROM inter i JOIN sizes sa ON sa.doc_id = i.a JOIN sizes sb ON sb.doc_id = i.b
       WHERE round(CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter), 6) >= 0.5""",
)
def q19(spark, sf_dir):
    """N-gram Jaccard near-dup pairs WITH the df-cap ON (round-3
    verdict #2): grams appearing in more than 120 documents (hot /
    stop shingles) are dropped before the shingle self-join, so the
    join emits at most 120² candidate rows per surviving gram —
    ABSOLUTE df-bound, linear in corpus size (a proportional cap
    f·N would still allow N² per gram at 10^12 docs).  At sf0.1 this
    cuts Σdf² from 31.4M to 0.88M join rows (35×).  The oracle
    replays the identical capped semantics (HAVING count(*) ≤ 120);
    cap-binding semantics additionally pinned by a pure-Python
    reference test (tests/test_dedup_dfcap.py)."""
    d = _docs_with_dups(spark, sf_dir).filter(F.col("doc_id") % 10 == 0)
    return ngram_jaccard_pairs(d, n=3, threshold=0.5, max_df=120)


@query(
    "q20_simhash",
    """WITH toks AS (
         SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
         FROM documents),
       h AS (SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS th
             FROM toks),
       bits AS (SELECT doc_id, j,
                SUM(CASE WHEN (th // CAST(power(2, j) AS BIGINT)) % 2 = 1
                    THEN 1 ELSE -1 END) AS s
                FROM h, range(16) t(j) GROUP BY doc_id, j)
       SELECT doc_id,
              CAST(SUM(CASE WHEN s > 0 THEN CAST(power(2, j) AS BIGINT) ELSE 0 END)
                   AS BIGINT) AS simhash
       FROM bits GROUP BY doc_id""",
)
def q20(spark, sf_dir):
    return simhash(_t(spark, sf_dir, "documents"), bits=16)


@query(
    "q60_simhash_pairs",
    """WITH toks AS (
         SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
         FROM documents),
       h AS (SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS th
             FROM toks),
       bits AS (SELECT doc_id, j,
                SUM(CASE WHEN (th // CAST(power(2, j) AS BIGINT)) % 2 = 1
                    THEN 1 ELSE -1 END) AS s
                FROM h, range(16) t(j) GROUP BY doc_id, j),
       sigs AS (SELECT doc_id,
              CAST(SUM(CASE WHEN s > 0 THEN CAST(power(2, j) AS BIGINT) ELSE 0 END)
                   AS BIGINT) AS simhash
              FROM bits GROUP BY doc_id),
       p AS (SELECT x.doc_id AS a, y.doc_id AS b, x.simhash AS sa, y.simhash AS sb
             FROM sigs x JOIN sigs y ON x.doc_id < y.doc_id),
       hm AS (SELECT a, b,
              CAST(sum((xor(sa, sb) // CAST(power(2, j.range) AS BIGINT)) % 2) AS BIGINT) AS ham
              FROM p, range(16) j GROUP BY a, b, sa, sb)
       SELECT a, b, ham FROM hm WHERE ham <= 3""",
)
def q60(spark, sf_dir):
    """SimHash near-dup pairs, Hamming ≤ 3 on the 16-bit signatures.
    Candidates come from 4 rotated 4-bit band tables — EXACT by
    pigeonhole (≤ 3 flips leave one band intact), so the oracle is the
    plain all-pairs Hamming join: banded blocking must lose nothing."""
    from gdal_spark.operators.dedup import simhash_pairs

    return simhash_pairs(_t(spark, sf_dir, "documents"), bits=16, max_hamming=3)


@query(
    "q21_text_quality",
    """SELECT doc_id,
       length(text) AS n_char,
       len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tok,
       round(CAST(length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE)
             / len(list_filter(string_split(text, ' '), x -> x <> '')), 6) AS mean_tok_len,
       round(CAST(len(list_filter(string_split(text, ' '),
                   x -> x IN ('the','and','of','a'))) AS DOUBLE)
             / len(list_filter(string_split(text, ' '), x -> x <> '')), 6) AS stop_ratio
       FROM documents WHERE length(text) > 0""",
)
def q21(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(F.length("text") > 0)
    return d.select(
        "doc_id",
        TXT.char_count(F.col("text")).cast("long").alias("n_char"),
        TXT.token_count(F.col("text")).cast("long").alias("n_tok"),
        F.round(TXT.mean_token_len(F.col("text")), 6).alias("mean_tok_len"),
        F.round(TXT.stopword_ratio(F.col("text"), TXT.LANG_MARKERS["en"]), 6).alias(
            "stop_ratio"
        ),
    )


@query(
    "q22_lang_id",
    """WITH scored AS (
         SELECT doc_id, lang,
           len(list_filter(string_split(text,' '), x -> x IN ('the','and','of','a'))) AS s_en,
           len(list_filter(string_split(text,' '), x -> x IN ('el','la','de','y'))) AS s_es,
           len(list_filter(string_split(text,' '), x -> x IN ('der','die','und','das'))) AS s_de,
           len(list_filter(string_split(text,' '), x -> x IN ('le','la','et','les'))) AS s_fr
         FROM documents),
       lab AS (SELECT doc_id, lang,
         CASE WHEN greatest(s_en,s_es,s_de,s_fr) = 0 THEN 'und'
              WHEN s_de = greatest(s_en,s_es,s_de,s_fr) THEN 'de'
              WHEN s_en = greatest(s_en,s_es,s_de,s_fr) THEN 'en'
              WHEN s_es = greatest(s_en,s_es,s_de,s_fr) THEN 'es'
              ELSE 'fr' END AS lang_guess
         FROM scored)
       SELECT lang, lang_guess, count(*) AS n FROM lab GROUP BY 1, 2""",
)
def q22(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (
        d.withColumn("lang_guess", TXT.lang_guess(F.col("text")))
        .groupBy("lang", "lang_guess")
        .agg(F.count("*").alias("n"))
    )


@query(
    "q48_bpe_tokens",
    r"""SELECT doc_id,
       CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT) AS n_bpe,
       CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_ws,
       CAST(len(list_distinct(regexp_extract_all(lower(text), '\w+'))) AS BIGINT) AS n_vocab
       FROM documents""",
)
def q48(spark, sf_dir):
    """Token counting: whitespace + BPE-ish regex (word pieces +
    punctuation singletons) + distinct-vocab size — all JVM regex."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.expr(r"regexp_extract_all(text, '\\w+|[^\\w\\s]', 0)")).cast("long").alias("n_bpe"),
        TXT.token_count(F.col("text")).cast("long").alias("n_ws"),
        F.size(
            F.array_distinct(F.expr(r"regexp_extract_all(lower(text), '\\w+', 0)"))
        ).cast("long").alias("n_vocab"),
    )


@query(
    "q49_embed_neardup",
    """WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
              FROM embeddings WHERE vec_id % 4 = 0),
       p AS (SELECT a.vec_id AS a, b.vec_id AS b,
             list_dot_product(a.e, b.e)
             / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) AS cos
             FROM v a JOIN v b ON a.vec_id < b.vec_id)
       SELECT a, b, round(cos, 6) AS cosine FROM p WHERE cos >= 0.18""",
)
def q49(spark, sf_dir):
    """Embedding-cosine near-dup pairs (threshold form of the dedup
    suite): all-pairs on a modulus sample; at scale the LSH/IVF bucket
    join (q32) generates the candidates instead of the cross join."""
    from gdal_spark.operators.similarity import _dot, _norm2

    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 4 == 0)
    a = e.select(F.col("vec_id").alias("a"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("b"), F.col("embedding").alias("vb"))
    pairs = a.crossJoin(b).filter(F.col("a") < F.col("b"))
    cos = _dot(F.col("va"), F.col("vb")) / (
        F.sqrt(_norm2(F.col("va"))) * F.sqrt(_norm2(F.col("vb")))
    )
    return (
        pairs.withColumn("cos", cos)
        .filter(F.col("cos") >= 0.18)
        .select("a", "b", F.round(F.col("cos"), 6).alias("cosine"))
    )


# ---------------------------------------------------------------------------
# similarity search (embeddings)


@query(
    "q23_cosine_topk",
    """WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 10),
       scored AS (
         SELECT q.qid, v.vec_id,
                list_dot_product(list_transform(v.embedding, x -> CAST(x AS DOUBLE)),
                                 list_transform(q.qvec, x -> CAST(x AS DOUBLE)))
                / (sqrt(list_dot_product(list_transform(v.embedding, x -> CAST(x AS DOUBLE)),
                                         list_transform(v.embedding, x -> CAST(x AS DOUBLE))))
                   * sqrt(list_dot_product(list_transform(q.qvec, x -> CAST(x AS DOUBLE)),
                                           list_transform(q.qvec, x -> CAST(x AS DOUBLE))))) AS cosine
         FROM embeddings v CROSS JOIN q WHERE v.vec_id <> q.qid),
       r AS (SELECT qid, vec_id, cosine,
                    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS sim_rank
             FROM scored)
       SELECT qid, vec_id, CAST(sim_rank AS INT) AS sim_rank, round(cosine, 6) AS cosine
       FROM r WHERE sim_rank <= 5""",
)
def q23(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    qs = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    return cosine_topk(e, qs, k=5)


# ---------------------------------------------------------------------------
# ANN scale path (IVF), GNM graph, winnowing, multimodal, streaming, checksum


@query(
    "q32_ann_ivf",
    """WITH v AS (SELECT vec_id,
                list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*1000 + 0.5) AS BIGINT)) AS qv
              FROM embeddings),
       cd AS (SELECT j.range AS j,
                     list_transform(range(64), d -> ((j.range*31 + d*17) % 21) - 10) AS c
              FROM range(8) j),
       dots AS (SELECT v.vec_id, cd.j,
                list_dot_product(list_transform(v.qv, x -> CAST(x AS DOUBLE)),
                                 list_transform(cd.c, x -> CAST(x AS DOUBLE))) AS dp
                FROM v CROSS JOIN cd),
       ranked AS (SELECT vec_id, j,
                  ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dp DESC, j) AS rn
                  FROM dots),
       assign AS (SELECT vec_id, j AS cell FROM ranked WHERE rn = 1),
       probes AS (SELECT vec_id AS qid, j AS cell FROM ranked WHERE rn <= 2 AND vec_id < 10),
       cand AS (SELECT p.qid, a.vec_id FROM probes p JOIN assign a USING (cell)
                WHERE a.vec_id <> p.qid),
       scored AS (SELECT c.qid, c.vec_id,
                  CAST(list_dot_product(list_transform(vq.qv, x -> CAST(x AS DOUBLE)),
                                        list_transform(vv.qv, x -> CAST(x AS DOUBLE))) AS BIGINT) AS score
                  FROM cand c JOIN v vq ON vq.vec_id = c.qid JOIN v vv ON vv.vec_id = c.vec_id),
       r AS (SELECT qid, vec_id, score,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS ivf_rank
             FROM scored)
       SELECT qid, vec_id, CAST(ivf_rank AS INT) AS ivf_rank, score
       FROM r WHERE ivf_rank <= 5""",
)
def q32(spark, sf_dir):
    """IVF ANN: integer-quantized embeddings, formula centroids, probe
    top-2 inverted lists — the similarity-search scale path (candidates
    = n_probe/n_centroids of the corpus, equi-join on the cell id)."""
    from gdal_spark.operators.similarity import ann_ivf

    return ann_ivf(_t(spark, sf_dir, "embeddings"), k=5)


@query(
    "q33_graph_cc",
    """WITH RECURSIVE base AS (
         SELECT DISTINCT (c_custkey % 200) AS u, ((c_custkey % 200)*7 + 3) % 200 AS v
         FROM customer),
       und AS (SELECT u, v FROM base UNION SELECT v, u FROM base),
       n AS (SELECT DISTINCT u AS node FROM und),
       reach(node, lab) AS (
         SELECT node, node FROM n
         UNION
         SELECT und.v, r.lab FROM reach r JOIN und ON und.u = r.node)
       SELECT node, min(lab) AS component FROM reach GROUP BY node""",
)
def q33(spark, sf_dir):
    """GNM connected components (gnm/gnmgraph.h:211) as iterative label
    propagation (join+min-agg per round, localCheckpoint lineage cut)."""
    from gdal_spark.operators.graph import connected_components

    c = _t(spark, sf_dir, "customer")
    edges = c.select(
        (F.col("c_custkey") % 200).alias("src"),
        (((F.col("c_custkey") % 200) * 7 + 3) % 200).alias("dst"),
    ).distinct()
    return connected_components(edges)


@query(
    "q34_winnow_fingerprint",
    """WITH g AS (SELECT doc_id,
              list_filter(list_transform(range(1, greatest(length(text) - 4, 1) + 1),
                          i -> substr(text, CAST(i AS INT), 5)),
                          s -> length(s) = 5) AS grams
              FROM documents WHERE length(text) >= 8),
       h AS (SELECT doc_id,
              list_transform(grams, s -> CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT)) AS hs
              FROM g),
       m AS (SELECT doc_id,
              list_distinct(list_transform(range(1, greatest(len(hs) - 3, 1) + 1),
                            j -> list_aggregate(list_slice(hs, j, j + 3), 'min'))) AS fps
              FROM h)
       SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fp,
              list_aggregate(fps, 'min') AS fp_min,
              CAST(list_aggregate(fps, 'sum') AS BIGINT) AS fp_sum
       FROM m""",
)
def q34(spark, sf_dir):
    """Winnowing fingerprints (sliding-window min of k-gram hashes) —
    position-robust doc fingerprinting as rows + Window rowsBetween."""
    d = _t(spark, sf_dir, "documents").filter(F.length("text") >= 8)
    fps = TXT.winnow_fingerprints_df(d, k=5, w=4)
    return fps.groupBy("doc_id").agg(
        F.count("*").alias("n_fp"),
        F.min("fp").alias("fp_min"),
        F.sum("fp").alias("fp_sum"),
    )


@query(
    "q35_multimodal_meta",
    """SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       16 + CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 64 AS width,
       16 + (CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) // 64) % 64 AS height,
       round((CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 256) / 255.0, 6) AS mean_luma
       FROM documents""",
)
def q35(spark, sf_dir):
    """Multimodal plumbing: binary content column → Arrow-batched
    metadata extraction (decode stubbed deterministically; see
    operators/multimodal.py for the real-decoder gate)."""
    from gdal_spark.operators.multimodal import extract_image_meta

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("content")
    )
    out = extract_image_meta(d)
    return out.select(
        "doc_id", "n_bytes", "width", "height",
        F.round(F.col("mean_luma"), 6).alias("mean_luma"),
    )


@query(
    "q36_stream_hourly",
    """SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n, round(sum(value), 2) AS sum_value
       FROM events GROUP BY 1, 2""",
)
def q36(spark, sf_dir):
    """The q09 aggregation executed as a REAL Structured Streaming
    query (file source → watermarked windowed agg → memory sink,
    availableNow) — incremental computation, batch-identical result."""
    from gdal_spark.streaming import stream_hourly_agg

    return stream_hourly_agg(spark, f"{sf_dir}/events.parquet")


@query(
    "q50_stream_sessionize",
    """WITH g AS (
         SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es,
                LAG(CAST(floor(epoch(ts)) AS BIGINT)) OVER
                  (PARTITION BY user_id ORDER BY ts, event_id) AS prev_es
         FROM events)
       SELECT user_id,
              CAST(1 + sum(CASE WHEN prev_es IS NOT NULL AND es - prev_es > 1800
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
              count(*) AS n_events
       FROM g GROUP BY user_id""",
)
def q50(spark, sf_dir):
    """q10's sessionization as a STATEFUL streaming operator
    (applyInPandasWithState): 3 time-ordered micro-batches with real
    per-user state carry-over; final state equals the batch window."""
    from gdal_spark.streaming.sessionize import stream_sessionize

    return stream_sessionize(spark, f"{sf_dir}/events.parquet", gap_s=1800, n_files=3)


@query(
    "q37_checksum",
    f"""{Q25_PIX_SQL}
       SELECT CAST(sum(CAST(v AS BIGINT)
                       % ([7,11,13,17,19,23,29,31,37,41,43])[((gy*128 + gx)%11) + 1])
                   % 65536 AS BIGINT) AS checksum
       FROM rast""",
)
def q37(spark, sf_dir):
    """GDALChecksumImage distributed: per-tile partial remainder sums
    on global pixel indices + masked final combine."""
    from gdal_spark.operators.rasterize import checksum_tiles

    return checksum_tiles(_q25_tiles(spark, sf_dir), tile_size=32, width=128)


@query(
    "q38_band_stats",
    f"""{Q25_PIX_SQL},
       a AS (SELECT count(*) AS n, min(v) AS vmin, max(v) AS vmax,
                    CAST(sum(CAST(v AS BIGINT)) AS BIGINT) AS s,
                    CAST(sum(CAST(v AS BIGINT)*CAST(v AS BIGINT)) AS BIGINT) AS ss
             FROM rast)
       SELECT n, vmin, vmax,
              round(s / CAST(n AS DOUBLE), 6) AS mean,
              round(sqrt(ss / CAST(n AS DOUBLE)
                         - (s / CAST(n AS DOUBLE)) * (s / CAST(n AS DOUBLE))), 6)
                  AS stddev_pop
       FROM a""",
)
def q38(spark, sf_dir):
    """Band statistics (ComputeStatistics): per-tile integer-exact
    partials, 5-number combine — no pixel crosses the shuffle."""
    from gdal_spark.operators.stats import band_stats_tiles

    return band_stats_tiles(_q25_tiles(spark, sf_dir), tile_size=32, nodata=0.0)


@query(
    "q57_band_histogram",
    f"""{Q25_PIX_SQL}
       SELECT CAST(v AS BIGINT) // 16 AS bucket, count(*) AS n
       FROM rast GROUP BY 1""",
)
def q57(spark, sf_dir):
    """Band histogram (GetHistogram): per-tile bincount partials, one
    bucket-keyed combine — O(buckets) shuffle rows per tile."""
    from gdal_spark.operators.stats import band_histogram_tiles

    return band_histogram_tiles(
        _q25_tiles(spark, sf_dir), tile_size=32, bucket_width=16, nodata=0.0
    )


@query(
    "q39_ogrsql_veneer",
    f"""WITH zones AS ({RECTS_SQL})
       SELECT zone_id AS fid,
              round((xmax - xmin) * (ymax - ymin), 6) AS area,
              (CAST(zone_id AS VARCHAR) LIKE '1%') AS starts1
       FROM zones WHERE zone_id BETWEEN 2 AND 20 AND zone_id % 2 = 0
       ORDER BY area DESC, fid LIMIT 8""",
)
def q39(spark, sf_dir):
    """ExecuteSQL veneer: OGR-SQL text (FID / OGR_GEOM_AREA pseudo-
    columns, LIKE/BETWEEN, ORDER/LIMIT) over a registered WKB layer,
    planned by Catalyst with the registered ST_ surface."""
    from gdal_spark.functions.ogrsql import execute_sql

    rows = [(int(pid), blob) for pid, blob in _rects(spark, sf_dir)]
    layer = local_df(spark, rows, "fid long, geom binary")
    out = execute_sql(
        spark,
        """SELECT FID, round(OGR_GEOM_AREA, 6) AS area,
                  (CAST(FID AS STRING) LIKE '1%') AS starts1
           FROM zones WHERE FID BETWEEN 2 AND 20 AND FID % 2 = 0
           ORDER BY area DESC, FID LIMIT 8""",
        layers={"zones": layer},
    )
    return out


@query(
    "q40_json_props",
    """SELECT CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) % 10 AS k_bucket,
              count(*) AS n, count(DISTINCT user_id) AS nd_user
       FROM events GROUP BY 1""",
)
def q40(spark, sf_dir):
    """JSON/HSTORE property access (OGR's HSTORE_GET_VALUE + JSON field
    subtype): regex-extract the key, bucket, aggregate — all JVM."""
    e = _t(spark, sf_dir, "events")
    k = F.regexp_extract(F.col("props"), '"k": (\\d+)', 1).cast("long")
    return e.groupBy((k % 10).alias("k_bucket")).agg(
        F.count("*").alias("n"),
        F.count_distinct("user_id").alias("nd_user"),
    )


@query(
    "q41_sieve_filter",
    f"""WITH r AS ({Q26_RECTS_SQL})
       SELECT CAST(dn AS BIGINT) AS dn, w * h AS pixel_count
       FROM r WHERE w * h >= 20""",
)
def q41(spark, sf_dir):
    """Sieve (GDALSieveFilter's CCL machinery, size-threshold subset):
    polygonize then drop components under the threshold.  The
    reference's merge-into-largest-neighbor step is not implemented —
    this is the filter form (alg/gdalsievefilter.cpp:640 does CCL +
    size test with the same two-pass labeling as polygonize)."""
    rects = _q26_rect_rows(spark, sf_dir)
    feats = local_df(spark, rects, "burn double, geom binary")
    tiles = rasterize_wkb_grid(feats, IDENTITY_GT, 128, 128, tile_size=32)
    regions = polygonize_tiles(tiles, nodata=0.0, connect8=False, tile_size=32)
    return regions.filter(F.col("pixel_count") >= 20).select(
        F.col("dn").cast("long").alias("dn"), "pixel_count"
    )


_CONTOUR_ORACLE = f"""
WITH g AS (SELECT gx.range AS cx, gy.range AS cy FROM range(127) gx, range(127) gy),
z AS (SELECT cx, cy,
      CAST({_z_sql('cx', 'cy')} AS DOUBLE) AS ztl,
      CAST({_z_sql('cx+1', 'cy')} AS DOUBLE) AS ztr,
      CAST({_z_sql('cx+1', 'cy+1')} AS DOUBLE) AS zbr,
      CAST({_z_sql('cx', 'cy+1')} AS DOUBLE) AS zbl
      FROM g),
c AS (SELECT *,
      CAST(ztl > 47.5 AS INT) + 2*CAST(ztr > 47.5 AS INT)
      + 4*CAST(zbr > 47.5 AS INT) + 8*CAST(zbl > 47.5 AS INT) AS case_id,
      (47.5 - ztl)/nullif(ztr - ztl, 0) AS tt,
      (47.5 - ztr)/nullif(zbr - ztr, 0) AS tr2,
      (47.5 - zbl)/nullif(zbr - zbl, 0) AS tb,
      (47.5 - ztl)/nullif(zbl - ztl, 0) AS tl2,
      (ztl + ztr + zbr + zbl)/4.0 AS ctr
      FROM z),
l AS (SELECT cx, cy, case_id, ctr,
      sqrt(tt*tt + tl2*tl2) AS l_topleft,
      sqrt((1-tt)*(1-tt) + tr2*tr2) AS l_topright,
      sqrt((tb-1)*(tb-1) + (1-tr2)*(1-tr2)) AS l_rightbottom,
      sqrt(tb*tb + (1-tl2)*(1-tl2)) AS l_bottomleft,
      sqrt(1 + (tr2-tl2)*(tr2-tl2)) AS l_leftright,
      sqrt((tb-tt)*(tb-tt) + 1) AS l_topbottom
      FROM c)
SELECT cx, cy, CAST(case_id AS INT) AS case_id,
       CAST(CASE WHEN case_id IN (5, 10) THEN 2 ELSE 1 END AS INT) AS n_seg,
       round(CASE case_id
         WHEN 1 THEN l_topleft WHEN 2 THEN l_topright WHEN 3 THEN l_leftright
         WHEN 4 THEN l_rightbottom
         WHEN 5 THEN CASE WHEN ctr > 47.5 THEN l_topright + l_bottomleft
                          ELSE l_topleft + l_rightbottom END
         WHEN 6 THEN l_topbottom WHEN 7 THEN l_bottomleft WHEN 8 THEN l_bottomleft
         WHEN 9 THEN l_topbottom
         WHEN 10 THEN CASE WHEN ctr > 47.5 THEN l_topleft + l_rightbottom
                           ELSE l_topright + l_bottomleft END
         WHEN 11 THEN l_rightbottom WHEN 12 THEN l_leftright WHEN 13 THEN l_topright
         WHEN 14 THEN l_topleft END, 6) AS seg_len
FROM l WHERE case_id NOT IN (0, 15)
"""


@query("q42_contour_cells", _CONTOUR_ORACLE)
def q42(spark, sf_dir):
    """Marching-squares contour (gdal contour, alg/marching_squares):
    per-tile cell classification + crossing interpolation with halo
    exchange; level 47.5 over the synthetic DEM (no z ever equals the
    level, so no degenerate cases)."""
    from gdal_spark.operators.contour import contour_cells

    out = contour_cells(_dem_tiles(spark), level=47.5, tile_size=DEM_TILE,
                        width=DEM_W, height=DEM_H)
    return out.select(
        "cx", "cy", "case_id", "n_seg", F.round(F.col("seg_len"), 6).alias("seg_len")
    )


# disjoint "method layer" rects for Erase (pairwise gaps in x)
ERASE_RECTS_SQL = (
    "SELECT CAST(r_regionkey AS BIGINT) AS b_id, "
    "CAST(r_regionkey*45 - 110 AS DOUBLE) AS bx0, "
    "CAST((r_regionkey*23)%60 - 30 AS DOUBLE) AS by0, "
    "CAST(r_regionkey*45 - 110 + 40 AS DOUBLE) AS bx1, "
    "CAST((r_regionkey*23)%60 - 30 + 28 AS DOUBLE) AS by1 "
    "FROM region"
)


def _erase_rect_rows(spark, sf_dir) -> list[tuple]:
    rows = _t(spark, sf_dir, "region").select("r_regionkey").collect()
    out = []
    for r in rows:
        k = int(r[0])
        x0 = float(k * 45 - 110)
        y0 = float((k * 23) % 60 - 30)
        ring = np.array(
            [[x0, y0], [x0 + 40, y0], [x0 + 40, y0 + 28], [x0, y0 + 28], [x0, y0]]
        )
        out.append((k, W.polygon_wkb([ring])))
    return out


@query(
    "q43_erase_area",
    f"""WITH a AS ({RECTS_SQL}), b AS ({ERASE_RECTS_SQL}),
       inter AS (
         SELECT a.zone_id AS a_id,
                (least(a.xmax, b.bx1) - greatest(a.xmin, b.bx0))
                * (least(a.ymax, b.by1) - greatest(a.ymin, b.by0)) AS ia
         FROM a JOIN b
         ON least(a.xmax, b.bx1) > greatest(a.xmin, b.bx0)
         AND least(a.ymax, b.by1) > greatest(a.ymin, b.by0)),
       cov AS (SELECT a_id, sum(ia) AS covered FROM inter GROUP BY a_id)
       SELECT a.zone_id AS a_id,
              round((a.xmax - a.xmin) * (a.ymax - a.ymin)
                    - coalesce(c.covered, 0), 6) AS erase_area
       FROM a LEFT JOIN cov c ON c.a_id = a.zone_id""",
)
def q43(spark, sf_dir):
    """Layer-algebra Erase (area form): input area minus disjoint
    method-polygon coverage via the clip kernel + left join."""
    from gdal_spark.operators.overlay import erase_area

    a_rows = [(int(pid), blob) for pid, blob in _rects(spark, sf_dir)]
    a_df = local_df(spark, a_rows, "a_id long, geom binary")
    out = erase_area(a_df, _erase_rect_rows(spark, sf_dir))
    return out.select("a_id", F.round(F.col("erase_area"), 6).alias("erase_area"))


@query(
    "q44_zonal_raster",
    f"""WITH r AS ({Q26_RECTS_SQL}),
       pix AS (SELECT CAST(dn AS BIGINT) AS zone, x0 + dx.range AS gx, y0 + dy.range AS gy
               FROM r, range(16) dx, range(16) dy
               WHERE dx.range < w AND dy.range < h),
       vals AS (SELECT zone, {_z_sql('gx', 'gy')} AS v FROM pix),
       a AS (SELECT zone, count(*) AS n,
                    CAST(min(v) AS BIGINT) AS vmin, CAST(max(v) AS BIGINT) AS vmax,
                    CAST(sum(v) AS BIGINT) AS s, CAST(sum(v*v) AS BIGINT) AS ss
             FROM vals GROUP BY zone)
       SELECT zone, n, vmin, vmax,
              round(s / CAST(n AS DOUBLE), 6) AS mean,
              round(sqrt(ss / CAST(n AS DOUBLE)
                         - (s / CAST(n AS DOUBLE)) * (s / CAST(n AS DOUBLE))), 6)
                  AS stddev_pop
       FROM a""",
)
def q44(spark, sf_dir):
    """GDALZonalStats raster path: zone raster (burned rects) × value
    raster (DEM) joined on the tile key — co-located tile-pair fold,
    per-zone integer-exact partials, one row per (task, zone) shuffled."""
    from gdal_spark.operators.zonal import zonal_stats_raster

    rects = _q26_rect_rows(spark, sf_dir)
    feats = local_df(spark, rects, "burn double, geom binary")
    zone_tiles = rasterize_wkb_grid(feats, IDENTITY_GT, 128, 128, tile_size=32)
    return zonal_stats_raster(zone_tiles, _dem_tiles(spark), tile_size=32)


@query(
    "q45_proximity",
    f"""{Q25_PIX_SQL},
       offs AS (SELECT dx.range AS dx, dy.range AS dy
                FROM range(-8, 9) dx, range(-8, 9) dy
                WHERE dx.range*dx.range + dy.range*dy.range <= 64),
       cand AS (SELECT t.gx + o.dx AS gx, t.gy + o.dy AS gy,
                       o.dx*o.dx + o.dy*o.dy AS d2
                FROM rast t, offs o),
       m AS (SELECT gx, gy, min(d2) AS d2 FROM cand
             WHERE gx BETWEEN 0 AND 127 AND gy BETWEEN 0 AND 127
             GROUP BY gx, gy)
       SELECT gx, gy, round(sqrt(CAST(d2 AS DOUBLE)), 6) AS dist FROM m""",
)
def q45(spark, sf_dir):
    """GDALComputeProximity with MAXDIST=8: bounding the distance
    bounds the halo, so one r-strip exchange replaces the reference's
    sequential two-pass whole-raster scan."""
    from gdal_spark.operators.focal import proximity_tiles

    return proximity_tiles(_q25_tiles(spark, sf_dir), tile_size=32,
                           width=128, height=128, max_dist=8)


@query(
    "q46_knn_cell_rings",
    f"""WITH pts AS ({POINTS_SQL}),
       q AS (SELECT CAST(s_suppkey AS BIGINT) AS qid,
                    CAST((s_suppkey*131)%360 - 180 AS DOUBLE) + 0.5 AS qx,
                    CAST((s_suppkey*197)%160 - 80 AS DOUBLE) + 0.5 AS qy
             FROM supplier),
       pc AS (SELECT doc_id, lon, lat,
                     CAST(floor((lon+180.0)/360.0*128) AS BIGINT) AS cx,
                     CAST(floor((90.0-lat)/180.0*128) AS BIGINT) AS cy
              FROM pts),
       qc AS (SELECT qid, qx, qy,
                     CAST(floor((qx+180.0)/360.0*128) AS BIGINT) AS cx,
                     CAST(floor((90.0-qy)/180.0*128) AS BIGINT) AS cy
              FROM q),
       cand AS (SELECT qc.qid, pc.doc_id,
                       (pc.lon-qc.qx)*(pc.lon-qc.qx) + (pc.lat-qc.qy)*(pc.lat-qc.qy) AS dist2
                FROM qc JOIN pc
                ON least(abs(pc.cx - qc.cx), 128 - abs(pc.cx - qc.cx)) <= 2
                AND abs(pc.cy - qc.cy) <= 2),
       r AS (SELECT qid, doc_id, dist2,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist2, doc_id) AS knn_rank
             FROM cand)
       SELECT qid, doc_id, round(dist2, 6) AS dist2, CAST(knn_rank AS INT) AS knn_rank
       FROM r WHERE knn_rank <= 4""",
)
def q46(spark, sf_dir):
    """Large×large kNN via per-cell sorted neighbor rings (the north
    rule's strategy): ring-cell explode → cell equi-join → rank.
    Semantics = ring-bounded kNN; the oracle mirrors the ring."""
    from gdal_spark.operators.knn import knn_cells

    pts = _points(spark, sf_dir)
    s = _t(spark, sf_dir, "supplier")
    qs = s.select(
        F.col("s_suppkey").cast("long").alias("qid"),
        (((F.col("s_suppkey") * 131) % 360 - 180).cast("double") + 0.5).alias("qx"),
        (((F.col("s_suppkey") * 197) % 160 - 80).cast("double") + 0.5).alias("qy"),
    )
    out = knn_cells(
        pts, qs, k=4, res=7, point_id="doc_id", query_id="qid",
        px="lon", py="lat", max_ring=2,
    )
    return out.select(
        "qid", "doc_id", F.round("dist2", 6).alias("dist2"), "knn_rank"
    )


# Deterministic 60-node weighted DAG (edges u -> u+δ with formula
# weights) — the GNM shortest-path fixture.
DAG_EDGES_SQL = (
    "SELECT u, v, 1 + (u * v) % 7 AS w FROM ("
    "  SELECT t.range AS u, t.range + 1 + (t.range*7)%4 AS v FROM range(59) t"
    "  UNION ALL"
    "  SELECT t.range AS u, t.range + 2 + (t.range*13)%5 AS v FROM range(59) t"
    ") WHERE v < 60"
)


@query(
    "q47_shortest_paths",
    f"""WITH RECURSIVE e AS ({DAG_EDGES_SQL}),
       paths(node, cost) AS (
         SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
         UNION
         SELECT e.v, p.cost + e.w FROM paths p JOIN e ON e.u = p.node)
       SELECT node, min(cost) AS cost FROM paths GROUP BY node""",
)
def q47(spark, sf_dir):
    """GNM single-source shortest paths (gnmgraph.h:173) as iterative
    Bellman-Ford frontier relaxation (size-gated: driver replay of the
    same fixpoint under 200k edges, distributed loop past it)."""
    from gdal_spark.operators.graph import shortest_paths_auto

    r = spark.range(59).withColumnRenamed("id", "u")
    e1 = r.select("u", (F.col("u") + 1 + (F.col("u") * 7) % 4).alias("v"))
    e2 = r.select("u", (F.col("u") + 2 + (F.col("u") * 13) % 5).alias("v"))
    edges = (
        e1.unionByName(e2)
        .filter(F.col("v") < 60)
        .withColumn("w", 1 + (F.col("u") * F.col("v")) % 7)
    )
    return shortest_paths_auto(edges, source=0, src="u", dst="v")


# q51 rects: integer-cornered, each fully inside one 32px tile (two
# per tile for k >= 16) — geometry tracing must recover them exactly.
Q51_RECTS_SQL = (
    "SELECT CAST(n_nationkey + 1 AS BIGINT) AS dn, "
    "CAST((n_nationkey%4)*32 + 2 + (n_nationkey%3)*4 AS BIGINT) AS x0, "
    "CAST(((n_nationkey//4)%4)*32 + 2 + (n_nationkey//16)*15 AS BIGINT) AS y0, "
    "CAST(3 + n_nationkey%7 AS BIGINT) AS w, "
    "CAST(2 + n_nationkey%5 AS BIGINT) AS h "
    "FROM nation"
)


def _q51_rect_rows(spark, sf_dir) -> list[tuple]:
    rows = _t(spark, sf_dir, "nation").select("n_nationkey").collect()
    out = []
    for r in rows:
        k = int(r[0])
        x0 = (k % 4) * 32 + 2 + (k % 3) * 4
        y0 = ((k // 4) % 4) * 32 + 2 + (k // 16) * 15
        w = 3 + k % 7
        h = 2 + k % 5
        ring = np.array(
            [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h], [x0, y0]],
            dtype=np.float64,
        )
        out.append((float(k + 1), W.polygon_wkb([ring])))
    return out


@query(
    "q51_polygonize_geometry",
    f"""WITH r AS ({Q51_RECTS_SQL})
       SELECT CAST(dn AS BIGINT) AS dn, w * h AS pixel_count,
              CAST(1 AS INT) AS n_rings,
              CAST(2 * (w + h) AS DOUBLE) AS perim,
              CAST(w * h AS DOUBLE) AS parea
       FROM r""",
)
def q51(spark, sf_dir):
    """Polygonize pass-2 geometry: CCL + boundary arc tracing emits the
    pixel-edge polygon per component; tracing disjoint in-tile rects
    must recover exactly their rings (perimeter 2(w+h), area w·h)."""
    from gdal_spark.operators.polygonize import polygonize_geometry

    feats = local_df(spark, 
        _q51_rect_rows(spark, sf_dir), "burn double, geom binary"
    )
    tiles = rasterize_wkb_grid(feats, IDENTITY_GT, 128, 128, tile_size=32)
    out = polygonize_geometry(tiles, nodata=0.0, tile_size=32)
    return out.select(
        F.col("dn").cast("long").alias("dn"),
        "pixel_count", "n_rings",
        F.round("perim", 6).alias("perim"),
        F.round("parea", 6).alias("parea"),
    )


@query(
    "q52_polygonize_dissolved",
    f"""WITH r AS ({Q26_RECTS_SQL})
       SELECT CAST(dn AS BIGINT) AS dn, CAST(1 AS INT) AS n_rings,
              CAST(2 * (w + h) AS DOUBLE) AS perim,
              CAST(w * h AS DOUBLE) AS parea
       FROM r""",
)
def q52(spark, sf_dir):
    """Full GDALPolygonize with CROSS-TILE dissolved geometry: the q26
    rects straddle 32px block borders; boundary arcs stitch by
    opposite-direction cancellation of shared-border segments, and the
    dissolved rings must recover the exact rects."""
    from gdal_spark.operators.polygonize import polygonize_dissolved

    feats = local_df(spark, 
        _q26_rect_rows(spark, sf_dir), "burn double, geom binary"
    )
    tiles = rasterize_wkb_grid(feats, IDENTITY_GT, 128, 128, tile_size=32)
    out = polygonize_dissolved(tiles, nodata=0.0, tile_size=32)
    return out.select(
        F.col("dn").cast("long").alias("dn"),
        "n_rings",
        F.round("perim", 6).alias("perim"),
        F.round("parea", 6).alias("parea"),
    )


@query(
    "q53_raster_calc",
    f"""{Q25_PIX_SQL},
       g AS (SELECT gx.range AS gx, gy.range AS gy FROM range(128) gx, range(128) gy),
       dem AS (SELECT gx, gy, {_z_sql('gx', 'gy')} AS z FROM g)
       SELECT d.gx, d.gy,
              CAST((CASE WHEN d.z < 30 THEN 1 WHEN d.z < 60 THEN 2 ELSE 3 END) * 10
                   + CASE WHEN r.v IS NOT NULL AND r.v <> 0 THEN 1 ELSE 0 END
                   AS DOUBLE) AS v
       FROM dem d LEFT JOIN rast r ON r.gx = d.gx AND r.gy = d.gy""",
)
def q53(spark, sf_dir):
    """Raster band algebra (VRT pixel functions / gdal raster calc):
    DEM reclassify × web-density occupancy, tile-aligned multi-band
    join, NumPy expression per tile stack."""
    from gdal_spark.operators.calc import raster_calc, reclassify

    out_tiles = raster_calc(
        {"dem": _dem_tiles(spark), "dens": _q25_tiles(spark, sf_dir)},
        lambda dem, dens: reclassify(dem, [30, 60], [1, 2, 3]) * 10 + (dens != 0),
        tile_size=32,
        how="outer",
    )
    return tiles_to_features(out_tiles, tile_size=32, nodata=None)


def _contour_seg_oracle(window: int = 48) -> str:
    """Generate the q54 oracle: marching-squares segments with exact
    endpoint expressions, connectivity via recursive CTE, per-polyline
    stats.  Mirrors operators/contour._CASE_SEGS + _SADDLE."""
    E = {
        "T": ("cx + tt", "CAST(cy AS DOUBLE)"),
        "R": ("cx + 1.0", "cy + tr2"),
        "B": ("cx + tb", "cy + 1.0"),
        "L": ("CAST(cx AS DOUBLE)", "cy + tl2"),
    }
    case_segs = {
        1: [("T", "L")], 2: [("T", "R")], 3: [("L", "R")], 4: [("R", "B")],
        6: [("T", "B")], 7: [("B", "L")], 8: [("B", "L")], 9: [("T", "B")],
        11: [("R", "B")], 12: [("L", "R")], 13: [("T", "R")], 14: [("T", "L")],
    }
    saddle = {
        5: ([("T", "R"), ("B", "L")], [("T", "L"), ("R", "B")]),
        10: ([("T", "L"), ("R", "B")], [("T", "R"), ("B", "L")]),
    }

    def coord(slot: int, which: int) -> str:
        """CASE expr for endpoint coordinate: which = 0..3 for x1,y1,x2,y2."""
        parts = ["CASE case_id"]
        for k, segs in case_segs.items():
            if slot == 0:
                ea, eb = segs[0]
                e = (ea, eb)[which // 2]
                parts.append(f"WHEN {k} THEN {E[e][which % 2]}")
        for k, (hi, lo) in saddle.items():
            ha, hb = hi[slot]
            la, lb = lo[slot]
            he = (ha, hb)[which // 2]
            le = (la, lb)[which // 2]
            parts.append(
                f"WHEN {k} THEN (CASE WHEN ctr > 47.5 THEN {E[he][which % 2]} "
                f"ELSE {E[le][which % 2]} END)"
            )
        parts.append("END")
        return " ".join(parts)

    cells = f"""
    g AS (SELECT gx.range AS cx, gy.range AS cy
          FROM range({window}) gx, range({window}) gy),
    z AS (SELECT cx, cy,
          CAST({_z_sql('cx', 'cy')} AS DOUBLE) AS ztl,
          CAST({_z_sql('cx+1', 'cy')} AS DOUBLE) AS ztr,
          CAST({_z_sql('cx+1', 'cy+1')} AS DOUBLE) AS zbr,
          CAST({_z_sql('cx', 'cy+1')} AS DOUBLE) AS zbl
          FROM g),
    c AS (SELECT *,
          CAST(ztl > 47.5 AS INT) + 2*CAST(ztr > 47.5 AS INT)
          + 4*CAST(zbr > 47.5 AS INT) + 8*CAST(zbl > 47.5 AS INT) AS case_id,
          (47.5 - ztl)/nullif(ztr - ztl, 0) AS tt,
          (47.5 - ztr)/nullif(zbr - ztr, 0) AS tr2,
          (47.5 - zbl)/nullif(zbr - zbl, 0) AS tb,
          (47.5 - ztl)/nullif(zbl - ztl, 0) AS tl2,
          (ztl + ztr + zbr + zbl)/4.0 AS ctr
          FROM z)"""
    seg_selects = []
    for slot in (0, 1):
        cond = "case_id NOT IN (0, 15)" if slot == 0 else "case_id IN (5, 10)"
        seg_selects.append(
            f"SELECT (cy*127 + cx)*2 + {slot} AS seg, "
            f"{coord(slot, 0)} AS x1, {coord(slot, 1)} AS y1, "
            f"{coord(slot, 2)} AS x2, {coord(slot, 3)} AS y2 "
            f"FROM c WHERE {cond}"
        )
    return f"""WITH RECURSIVE {cells},
    segs AS ({seg_selects[0]} UNION ALL {seg_selects[1]}),
    lens AS (SELECT seg,
             CAST(floor(sqrt((x2-x1)*(x2-x1) + (y2-y1)*(y2-y1))*1000000 + 0.5) AS BIGINT) AS lu
             FROM segs),
    ends AS (SELECT seg, x1 AS x, y1 AS y FROM segs
             UNION ALL SELECT seg, x2, y2 FROM segs),
    e AS (SELECT a.seg AS u, b.seg AS v FROM ends a JOIN ends b
          ON a.x = b.x AND a.y = b.y AND a.seg <> b.seg),
    und AS (SELECT u, v FROM e UNION SELECT seg, seg FROM segs),
    reach(node, lab) AS (
      SELECT seg, seg FROM segs
      UNION
      SELECT und.v, r.lab FROM reach r JOIN und ON und.u = r.node),
    comp AS (SELECT node, min(lab) AS component FROM reach GROUP BY node),
    nseg AS (SELECT component, count(*) AS n_seg,
                    CAST(sum(lu) AS BIGINT) AS length_u
             FROM comp JOIN lens ON lens.seg = comp.node GROUP BY component),
    nend AS (SELECT component, count(DISTINCT (x, y)) AS n_ends
             FROM comp JOIN ends ON ends.seg = comp.node GROUP BY component)
    SELECT s.component, s.n_seg, n.n_ends, (n.n_ends = s.n_seg) AS closed, s.length_u
    FROM nseg s JOIN nend n USING (component)"""


@query("q54_contour_polylines", _contour_seg_oracle(48))
def q54(spark, sf_dir):
    """Iso-line ASSEMBLY: marching-squares segments connect on exact
    shared endpoints into polylines (distributed label propagation);
    per polyline: segment count, endpoint count, closed flag, and
    integer-exact micro-length sum."""
    from gdal_spark.operators.contour import contour_polylines

    return contour_polylines(
        _dem_tiles(spark), level=47.5, tile_size=DEM_TILE,
        width=DEM_W, height=DEM_H, window=48,
    )


# ---------------------------------------------------------------------------
# grid interpolation


@query(
    "q56_pyramid_mode",
    f"""WITH par AS (SELECT px.range AS px, py.range AS py
                     FROM range(64) px, range(64) py),
       ch AS (SELECT px, py,
              unnest([{_z_sql('2*px', '2*py')}, {_z_sql('2*px+1', '2*py')},
                      {_z_sql('2*px', '2*py+1')}, {_z_sql('2*px+1', '2*py+1')}]) AS v
              FROM par),
       cnt AS (SELECT px, py, v, count(*) AS c FROM ch GROUP BY px, py, v),
       r AS (SELECT px, py, v,
             ROW_NUMBER() OVER (PARTITION BY px, py ORDER BY c DESC, v) AS rn
             FROM cnt)
       SELECT px, py, CAST(v AS DOUBLE) AS mode_v FROM r WHERE rn = 1""",
)
def q56(spark, sf_dir):
    """MODE overview resampling (GDALRegenerateOverviewsEx MODE,
    gcore/overview.cpp): most-frequent of each 2×2 child block, ties to
    the smallest value — one pyramid level over the dense DEM."""
    from gdal_spark.operators.pyramid import pyramid_level

    level = pyramid_level(_dem_tiles(spark), method="mode", tile_size=DEM_TILE)
    return tiles_to_features(level, tile_size=DEM_TILE, nodata=None).select(
        F.col("gx").alias("px"), F.col("gy").alias("py"), F.col("v").alias("mode_v")
    )


@query(
    "q55_grid_metrics",
    f"""WITH pts AS ({POINTS_SQL}),
       cand AS (
         SELECT i, j, pv,
                (px - (-180.0 + (i+0.5)*20.0))*(px - (-180.0 + (i+0.5)*20.0))
                + (py - (-80.0 + (j+0.5)*20.0))*(py - (-80.0 + (j+0.5)*20.0)) AS d2
         FROM (SELECT lon AS px, lat AS py, CAST(v AS DOUBLE) AS pv FROM pts),
              range(18) a(i), range(8) b(j)),
       infr AS (SELECT * FROM cand WHERE d2 <= 225.0)
       SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
              count(*) AS m_count, min(pv) AS m_min, max(pv) AS m_max,
              max(pv) - min(pv) AS m_range,
              round(avg(sqrt(d2)), 6) AS m_avg_dist
       FROM infr GROUP BY i, j""",
)
def q55(spark, sf_dir):
    """GDALGrid data metrics (Count/Min/Max/Range/AverageDistance per
    search window) — grid-cell-keyed shuffle, map-side partials."""
    from gdal_spark.operators.grid import grid_data_metrics

    pts = _points(spark, sf_dir)
    return grid_data_metrics(
        pts, x0=-180.0, y0=-80.0, cell=20.0, nx=18, ny=8, radius=15.0
    )


@query(
    "q24_grid_idw",
    f"""WITH pts AS ({POINTS_SQL}),
       cand AS (
         SELECT i, j, px, py, pv,
                (px - (-180.0 + (i+0.5)*20.0))*(px - (-180.0 + (i+0.5)*20.0))
                + (py - (-80.0 + (j+0.5)*20.0))*(py - (-80.0 + (j+0.5)*20.0)) AS d2
         FROM (SELECT lon AS px, lat AS py, CAST(v AS DOUBLE) AS pv FROM pts),
              range(18) a(i), range(8) b(j)),
       infr AS (SELECT * FROM cand WHERE d2 <= 225.0),
       agg AS (SELECT i, j,
              round(SUM(CASE WHEN d2 > 0 THEN pv / d2 ELSE 0 END), 6) AS wsum,
              round(SUM(CASE WHEN d2 > 0 THEN 1.0 / d2 ELSE 0 END), 6) AS wtot,
              SUM(CASE WHEN d2 = 0 THEN 1 ELSE 0 END) AS nhit,
              round(AVG(CASE WHEN d2 = 0 THEN pv END), 6) AS hitval,
              count(*) AS npts
              FROM infr GROUP BY i, j)
       SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
              CASE WHEN nhit > 0 THEN hitval ELSE round(wsum / wtot, 6) END AS idw,
              npts
       FROM agg""",
)
def q24(spark, sf_dir):
    pts = _points(spark, sf_dir)
    return grid_idw(
        pts, x0=-180.0, y0=-80.0, cell=20.0, nx=18, ny=8, radius=15.0, power=2
    )


def _q62_stair_rows(spark, sf_dir) -> list[tuple]:
    rows = (
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_nationkey") < 4)
        .select("n_nationkey").collect()
    )
    out = []
    for r in rows:
        c = int(r[0])
        x0 = 4 + 64 * (c % 2)
        y0 = 4 + 64 * (c // 2) + 6 * (c % 2)
        for j in range(18):
            ring = np.array(
                [
                    [x0 + 2 * j, y0 + 2 * j],
                    [x0 + 2 * j + 2, y0 + 2 * j],
                    [x0 + 2 * j + 2, y0 + 2 * j + 2],
                    [x0 + 2 * j, y0 + 2 * j + 2],
                    [x0 + 2 * j, y0 + 2 * j],
                ],
                dtype=np.float64,
            )
            out.append((float(c + 1), W.polygon_wkb([ring])))
    return out


@query(
    "q62_polygonize_8conn",
    """WITH c AS (SELECT n_nationkey AS c FROM nation WHERE n_nationkey < 4),
       p AS (SELECT c,
               4 + 64*(c%2) + 2*j.range + dx.range AS gx,
               4 + 64*(c//2) + 6*(c%2) + 2*j.range + dy.range AS gy
             FROM c, range(18) j, range(2) dx, range(2) dy)
       SELECT CAST(c+1 AS BIGINT) AS dn, count(*) AS pixel_count,
              count(DISTINCT (gx//32)*1000 + gy//32) AS n_tiles
       FROM p GROUP BY c""",
)
def q62(spark, sf_dir):
    """8-connected polygonize across tile borders (reference
    connectedness==8, alg/gdalrasterpolygonenumerator.cpp:75-167):
    staircases of corner-touching 2×2 squares, two of them stepping
    exactly through a shared tile CORNER (the diagonal-tile merge) and
    two through mid-edge ±1 diagonal offsets.  4-connected labeling
    would emit 18 regions per chain; the oracle asserts ONE region per
    chain with the exact pixel and tile counts."""
    feats = local_df(spark, 
        _q62_stair_rows(spark, sf_dir), "burn double, geom binary"
    )
    tiles = rasterize_wkb_grid(feats, IDENTITY_GT, 128, 128, tile_size=32)
    regions = polygonize_tiles(tiles, nodata=0.0, connect8=True, tile_size=32)
    return regions.select(
        F.col("dn").cast("long").alias("dn"),
        F.col("pixel_count"),
        F.col("n_tiles"),
    )


@query(
    "q63_contour_linestrings",
    """WITH r AS (SELECT n_nationkey AS k, (n_nationkey%8)*16 + 2 AS x0,
                  (n_nationkey//8)*16 + 3 AS y0,
                  3 + n_nationkey%9 AS w, 2 + n_nationkey%7 AS h
           FROM nation),
       seq AS (
         SELECT k, j.range AS i, 2*x0 - 1 AS dx, 2*(y0 + j.range) AS dy
           FROM r, range(12) j WHERE j.range < h
         UNION ALL
         SELECT k, h + j.range, 2*(x0 + j.range), 2*(y0 + h) - 1
           FROM r, range(12) j WHERE j.range < w
         UNION ALL
         SELECT k, h + w + j.range, 2*(x0 + w) - 1, 2*(y0 + h - 1 - j.range)
           FROM r, range(12) j WHERE j.range < h
         UNION ALL
         SELECT k, 2*h + w + j.range, 2*(x0 + w - 1 - j.range), 2*y0 - 1
           FROM r, range(12) j WHERE j.range < w),
       v AS (SELECT k, CAST(SUM((i+1)*dx) AS BIGINT) AS vsum_x,
                    CAST(SUM((i+1)*dy) AS BIGINT) AS vsum_y
             FROM seq GROUP BY k)
       SELECT CAST(2*x0 - 1 AS BIGINT) AS sx, CAST(2*y0 AS BIGINT) AS sy,
              CAST(2*w + 2*h AS INT) AS n_pts, TRUE AS closed,
              CAST((2*w + 2*h - 4)*1000000 + 4*707107 AS BIGINT) AS length_u,
              vsum_x, vsum_y
       FROM r JOIN v USING (k)""",
)
def q63(spark, sf_dir):
    """Ordered contour polyline GEOMETRY (the reference's contour
    writer emits merged linestrings, alg/contour.cpp SegmentMerger /
    RingAppender): marching squares at level 1.0 over the nation-rect
    burn (value 2.0 ⇒ every crossing at t=0.5 ⇒ half-integer coords),
    chain-walked into ordered rings.  The oracle reproduces the pinned
    walk order (start at lexicographic-min vertex, left side down →
    bottom → right up → top) and checks ORDER-SENSITIVE vertex
    checksums Σ(i+1)·2·coord — a wrong vertex order fails even with
    the right vertex set."""
    from gdal_spark.operators.contour import contour_linestrings

    feats = local_df(spark, 
        [(2.0, g) for _dn, g in _q26_rect_rows(spark, sf_dir)],
        "burn double, geom binary",
    )
    tiles = rasterize_wkb_grid(feats, IDENTITY_GT, 128, 128, tile_size=32)
    out = contour_linestrings(tiles, 1.0, 32, 128, 128)
    return out.select("sx", "sy", "n_pts", "closed", "length_u", "vsum_x", "vsum_y")


@query(
    "q64_k_shortest",
    f"""WITH RECURSIVE e AS ({DAG_EDGES_SQL}),
       paths(node, cost) AS (
         SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
         UNION
         SELECT e.v, p.cost + e.w FROM paths p JOIN e ON e.u = p.node),
       r AS (SELECT node, cost,
                    row_number() OVER (PARTITION BY node ORDER BY cost) AS rk
             FROM (SELECT DISTINCT node, cost FROM paths))
       SELECT node, CAST(rk - 1 AS INT) AS rnk, cost FROM r WHERE rk <= 3""",
)
def q64(spark, sf_dir):
    """GNM K-shortest-paths (gnmgraph.h:195, Yen) as the distributed
    top-k Bellman-Ford closure: 3 smallest distinct path costs per node
    on the q47 DAG — on a DAG this equals Yen's loopless cost vector."""
    from gdal_spark.operators.graph import k_shortest_costs_auto

    r = spark.range(59).withColumnRenamed("id", "u")
    e1 = r.select("u", (F.col("u") + 1 + (F.col("u") * 7) % 4).alias("v"))
    e2 = r.select("u", (F.col("u") + 2 + (F.col("u") * 13) % 5).alias("v"))
    edges = (
        e1.unionByName(e2)
        .filter(F.col("v") < 60)
        .withColumn("w", 1 + (F.col("u") * F.col("v")) % 7)
    )
    return k_shortest_costs_auto(edges, source=0, k=3, src="u", dst="v").select(
        "node", F.col("rank").alias("rnk"), "cost"
    )


@query(
    "q65_warp_nearest",
    f"""{Q25_PIX_SQL}
       SELECT gx//2 AS gx, gy//2 AS gy, v FROM rast
       WHERE gx%2 = 1 AND gy%2 = 1""",
)
def q65(spark, sf_dir):
    """gdalwarp nearest-neighbour resample to a 2× coarser target grid
    (GDALWarpOperation target-chunk back-projection +
    GWKNearestNoMasks, alg/gdalwarpoperation.cpp:611-967): target
    pixel centers land on odd source pixels, which the oracle selects
    analytically."""
    from gdal_spark.operators.warp import warp_resample

    src = _q25_tiles(spark, sf_dir)
    out = warp_resample(
        src, IDENTITY_GT, (0.0, 2.0, 0.0, 0.0, 0.0, 2.0), 64, 64,
        tile_size=32, method="nearest",
    )
    return tiles_to_features(out, tile_size=32, nodata=0.0)


@query(
    "q66_warp_bilinear",
    f"""{Q25_PIX_SQL},
       g AS (SELECT a.range AS i, b.range AS j FROM range(127) a, range(127) b),
       s AS (SELECT i, j,
               COALESCE(r00.v, 0) AS z00, COALESCE(r10.v, 0) AS z10,
               COALESCE(r01.v, 0) AS z01, COALESCE(r11.v, 0) AS z11
             FROM g
             LEFT JOIN rast r00 ON r00.gx = i   AND r00.gy = j
             LEFT JOIN rast r10 ON r10.gx = i+1 AND r10.gy = j
             LEFT JOIN rast r01 ON r01.gx = i   AND r01.gy = j+1
             LEFT JOIN rast r11 ON r11.gx = i+1 AND r11.gy = j+1),
       o AS (SELECT i AS gx, j AS gy,
               0.75*0.75*z00 + 0.25*0.75*z10 + 0.75*0.25*z01 + 0.25*0.25*z11 AS v
             FROM s)
       SELECT gx, gy, v FROM o WHERE v <> 0""",
)
def q66(spark, sf_dir):
    """gdalwarp BILINEAR to a quarter-pixel-shifted same-scale grid
    (GWKBilinear semantics: sample at u−0.5 between the 4 surrounding
    centers, missing source pixels read as fill): fx = fy = 1/4 ⇒ all
    weights are sixteenths — exact doubles on both engines."""
    from gdal_spark.operators.warp import warp_resample

    src = _q25_tiles(spark, sf_dir)
    out = warp_resample(
        src, IDENTITY_GT, (0.25, 1.0, 0.0, 0.25, 0.0, 1.0), 127, 127,
        tile_size=32, method="bilinear",
    )
    return tiles_to_features(out, tile_size=32, nodata=0.0)


def _q67_line_rows(spark, sf_dir) -> list[tuple]:
    rows = (
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_nationkey") < 24)
        .select("n_nationkey").collect()
    )
    out = []
    for r in rows:
        k = int(r[0])
        a = (k % 6) * 20 + 1
        b = (k // 6) * 11 + 1
        coords = np.array([[a + 0.25, b + 0.25], [a + 16.25, b + 8.25]])
        out.append((float(k + 1), W.linestring_wkb(coords)))
    return out


@query(
    "q67_all_touched",
    """WITH ks AS (SELECT n_nationkey AS k FROM nation WHERE n_nationkey < 24),
       L AS (SELECT k, (k%6)*20 + 1 AS a, (k//6)*11 + 1 AS b FROM ks),
       cells AS (
         SELECT k, a + 2*t.range AS gx, b + t.range AS gy FROM L, range(9) t
         UNION ALL
         SELECT k, a + 2*t.range + 1, b + t.range FROM L, range(8) t
         UNION ALL
         SELECT k, a + 2*t.range + 1, b + t.range + 1 FROM L, range(8) t)
       SELECT gx, gy, CAST(k+1 AS DOUBLE) AS v FROM cells""",
)
def q67(spark, sf_dir):
    """ALL_TOUCHED line burn (GDALdllImageLineAllTouched,
    alg/llrasterize.cpp:407+): every cell a slope-1/2 segment passes
    through, crossing tile borders.  dx=16 (a power of two) keeps the
    traversal sample coordinates exact quarters, so the touched-cell
    set is the closed-form 3-cells-per-period staircase the oracle
    enumerates: (a+2t, b+t), (a+2t+1, b+t), (a+2t+1, b+t+1)."""
    feats = local_df(spark, 
        _q67_line_rows(spark, sf_dir), "burn double, geom binary"
    )
    tiles = rasterize_wkb_grid(
        feats, IDENTITY_GT, 128, 128, tile_size=32, all_touched=True
    )
    return tiles_to_features(tiles, tile_size=32, nodata=0.0)


def _q68_rows(spark, sf_dir) -> list[tuple]:
    rows = _t(spark, sf_dir, "nation").select("n_nationkey").collect()
    out = []
    for r in rows:
        k = int(r[0])
        x0 = (k % 6) * 20 + 2
        y0 = (k // 6) * 14 + 2
        w = 6 + k % 5
        h = 5 + k % 4
        s = 1 + k % 3
        big = np.array(
            [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h], [x0, y0]],
            dtype=np.float64,
        )
        sat = np.array(
            [
                [x0 + w, y0 + 1], [x0 + w + s, y0 + 1],
                [x0 + w + s, y0 + 1 + s], [x0 + w, y0 + 1 + s], [x0 + w, y0 + 1],
            ],
            dtype=np.float64,
        )
        out.append((float(k + 1), W.polygon_wkb([big])))
        out.append((float(k + 101), W.polygon_wkb([sat])))
    return out


@query(
    "q68_sieve_merge",
    """WITH ks AS (SELECT n_nationkey AS k FROM nation),
       p AS (SELECT k, (k%6)*20+2 AS x0, (k//6)*14+2 AS y0,
                    6+k%5 AS w, 5+k%4 AS h, 1+k%3 AS s FROM ks),
       big AS (SELECT k, x0 + i.range AS gx, y0 + j.range AS gy,
                      CAST(k+1 AS DOUBLE) AS v
               FROM p, range(12) i, range(9) j
               WHERE i.range < w AND j.range < h),
       sat AS (SELECT k, x0 + w + i.range AS gx, y0 + 1 + j.range AS gy,
                      CAST(CASE WHEN s < 3 THEN k+1 ELSE k+101 END AS DOUBLE) AS v
               FROM p, range(3) i, range(3) j
               WHERE i.range < s AND j.range < s)
       SELECT gx, gy, v FROM big UNION ALL SELECT gx, gy, v FROM sat""",
)
def q68(spark, sf_dir):
    """GDALSieveFilter MERGE semantics (alg/sievefilter.cpp): each
    nation key burns a big rect (dn=k+1, ≥20 px) with an s×s satellite
    of a different dn attached at its right edge; threshold 5 absorbs
    the 1- and 4-px satellites into the big region (their largest —
    only — neighbour) while 9-px satellites survive.  Several clusters
    straddle tile borders, exercising the cross-tile region graph."""
    from gdal_spark.operators.sieve import sieve_tiles

    feats = local_df(spark, _q68_rows(spark, sf_dir), "burn double, geom binary")
    tiles = rasterize_wkb_grid(feats, IDENTITY_GT, 128, 128, tile_size=32)
    out = sieve_tiles(tiles, threshold=5, nodata=0.0, tile_size=32)
    return tiles_to_features(out, tile_size=32, nodata=0.0)


@query(
    "q69_proximity_unbounded",
    """WITH t AS (SELECT (n_nationkey*37)%128 AS tx, (n_nationkey*53)%128 AS ty
                  FROM nation),
       g AS (SELECT a.range AS gx, b.range AS gy FROM range(128) a, range(128) b),
       d AS (SELECT gx, gy,
                    min((gx-tx)*(gx-tx) + (gy-ty)*(gy-ty)) AS d2
             FROM g, t GROUP BY gx, gy)
       SELECT gx, gy, round(sqrt(CAST(d2 AS DOUBLE)), 6) AS dist FROM d""",
)
def q69(spark, sf_dir):
    """UNBOUNDED proximity (GDALComputeProximity without MAXDIST,
    alg/gdalproximity.cpp): exact separable EDT — column target lists,
    then the 1-D parabola envelope per row.  The oracle is the brute
    force min over all targets for every pixel."""
    from gdal_spark.operators.focal import proximity_unbounded

    rows = []
    for r in _t(spark, sf_dir, "nation").select("n_nationkey").collect():
        k = int(r[0])
        x, y = (k * 37) % 128, (k * 53) % 128
        ring = np.array(
            [[x, y], [x + 1, y], [x + 1, y + 1], [x, y + 1], [x, y]], dtype=np.float64
        )
        rows.append((1.0, W.polygon_wkb([ring])))
    feats = local_df(spark, rows, "burn double, geom binary")
    tiles = rasterize_wkb_grid(feats, IDENTITY_GT, 128, 128, tile_size=32)
    return proximity_unbounded(tiles, tile_size=32, width=128, height=128)


_DEM_NBRS = [(-1, -1), (0, -1), (1, -1), (-1, 0), (1, 0), (-1, 1), (0, 1), (1, 1)]
_ZC = _z_sql("gx", "gy")
_ZN = [_z_sql(f"gx{dx:+d}", f"gy{dy:+d}") for dx, dy in _DEM_NBRS]
_DEM_G = "SELECT gx.range AS gx, gy.range AS gy FROM range(1, 127) gx, range(1, 127) gy"


@query(
    "q70_dem_tri",
    f"""WITH g AS ({_DEM_G}),
       m AS (SELECT gx, gy,
             sqrt(CAST({' + '.join(f'({z} - {_ZC})*({z} - {_ZC})' for z in _ZN)} AS DOUBLE)) AS tri
             FROM g)
       SELECT gx, gy, round(tri, 6) AS tri FROM m WHERE tri <> 0""",
)
def q70(spark, sf_dir):
    """gdaldem TRI, Riley algorithm (apps/gdaldem_lib.cpp, the default
    -alg): sqrt of the sum of squared differences to the 8 neighbors —
    integer DEM keeps everything under the sqrt exact."""
    from gdal_spark.operators.focal import dem_metric_tiles

    out = dem_metric_tiles(_dem_tiles(spark), "tri_riley", DEM_TILE, DEM_W, DEM_H)
    return out.select("gx", "gy", F.round(F.col("v"), 6).alias("tri"))


@query(
    "q71_dem_tpi",
    f"""WITH g AS ({_DEM_G}),
       m AS (SELECT gx, gy,
             CAST({_ZC} AS DOUBLE) - ({' + '.join(_ZN)}) / 8.0 AS tpi
             FROM g)
       SELECT gx, gy, round(tpi, 6) AS tpi FROM m WHERE tpi <> 0""",
)
def q71(spark, sf_dir):
    """gdaldem TPI: center minus the 8-neighbor mean (exact /8)."""
    from gdal_spark.operators.focal import dem_metric_tiles

    out = dem_metric_tiles(_dem_tiles(spark), "tpi", DEM_TILE, DEM_W, DEM_H)
    return out.select("gx", "gy", F.round(F.col("v"), 6).alias("tpi"))


@query(
    "q72_dem_roughness",
    f"""WITH g AS ({_DEM_G}),
       m AS (SELECT gx, gy,
             CAST(greatest({_ZC}, {', '.join(_ZN)})
                  - least({_ZC}, {', '.join(_ZN)}) AS DOUBLE) AS rough
             FROM g)
       SELECT gx, gy, rough FROM m WHERE rough <> 0""",
)
def q72(spark, sf_dir):
    """gdaldem roughness: 3×3 max − min (exact integers)."""
    from gdal_spark.operators.focal import dem_metric_tiles

    out = dem_metric_tiles(_dem_tiles(spark), "roughness", DEM_TILE, DEM_W, DEM_H)
    return out.select("gx", "gy", F.col("v").alias("rough"))


_P_SQL = (
    f"(({_z_sql('gx+1', 'gy-1')} + 2*{_z_sql('gx+1', 'gy')} + {_z_sql('gx+1', 'gy+1')})"
    f" - ({_z_sql('gx-1', 'gy-1')} + 2*{_z_sql('gx-1', 'gy')} + {_z_sql('gx-1', 'gy+1')})) / 8.0"
)
_Q_SQL = (
    f"(({_z_sql('gx-1', 'gy+1')} + 2*{_z_sql('gx', 'gy+1')} + {_z_sql('gx+1', 'gy+1')})"
    f" - ({_z_sql('gx-1', 'gy-1')} + 2*{_z_sql('gx', 'gy-1')} + {_z_sql('gx+1', 'gy-1')})) / 8.0"
)

from gdal_spark.operators.focal import hillshade_sql_consts as _hs_consts  # noqa: E402

_HS1, _HS2, _HS3 = _hs_consts()


@query(
    "q73_dem_hillshade",
    f"""WITH g AS ({_DEM_G}),
       pq AS (SELECT gx, gy, {_P_SQL} AS p, {_Q_SQL} AS q FROM g),
       h AS (SELECT gx, gy,
             ({_HS1} - (q*{_HS2} - p*{_HS3})) / sqrt((1.0 + p*p) + q*q) AS c254
             FROM pq)
       SELECT gx, gy,
              round(CASE WHEN c254 <= 0 THEN 1.0 ELSE 1.0 + c254 END, 6) AS shade
       FROM h""",
)
def q73(spark, sf_dir):
    """gdaldem hillshade, Horn, az 315 / alt 45 (gdaldem_lib.cpp:
    882-896, 1030-1036): the trig constants are computed once and
    inlined into BOTH engines verbatim, so the whole expression is the
    identical IEEE tree — bitwise-comparable despite the trig."""
    from gdal_spark.operators.focal import hillshade_tiles

    out = hillshade_tiles(_dem_tiles(spark), DEM_TILE, DEM_W, DEM_H)
    return out.select("gx", "gy", F.round(F.col("v"), 6).alias("shade"))


@query(
    "q74_dem_aspect_octant",
    f"""WITH g AS ({_DEM_G}),
       d AS (SELECT gx, gy,
             (({_z_sql('gx+1', 'gy-1')} + 2*{_z_sql('gx+1', 'gy')} + {_z_sql('gx+1', 'gy+1')})
              - ({_z_sql('gx-1', 'gy-1')} + 2*{_z_sql('gx-1', 'gy')} + {_z_sql('gx-1', 'gy+1')})) AS dx,
             (({_z_sql('gx-1', 'gy+1')} + 2*{_z_sql('gx', 'gy+1')} + {_z_sql('gx+1', 'gy+1')})
              - ({_z_sql('gx-1', 'gy-1')} + 2*{_z_sql('gx', 'gy-1')} + {_z_sql('gx+1', 'gy-1')})) AS dy
             FROM g),
       t AS (SELECT gx, gy, -dx AS u, dy AS v FROM d
             WHERE dx <> 0 AND dy <> 0 AND abs(dx) <> abs(dy)),
       o AS (SELECT gx, gy, CASE
               WHEN u > 0 AND v > 0 AND v > u  THEN 0
               WHEN u > 0 AND v > 0 AND v < u  THEN 1
               WHEN u > 0 AND v < 0 AND -v < u THEN 2
               WHEN u > 0 AND v < 0 AND -v > u THEN 3
               WHEN u < 0 AND v < 0 AND v < u  THEN 4
               WHEN u < 0 AND v < 0 AND v > u  THEN 5
               WHEN u < 0 AND v > 0 AND v < -u THEN 6
               ELSE 7 END AS octant
             FROM t)
       SELECT gx, gy, CAST(octant AS INT) AS octant FROM o""",
)
def q74(spark, sf_dir):
    """gdaldem aspect as compass azimuth (gdaldem_lib.cpp:1441-1468):
    the Spark side runs the REAL atan2 + azimuth remap and bins the
    result into 45° octants; the oracle classifies the same octant
    from exact integer sign/ratio comparisons on (dx, dy) — verifying
    the direction logic without transcendental cross-engine parity.
    Boundary ties (dx=0, dy=0, |dx|=|dy|) are filtered on both sides
    with exact predicates."""
    from gdal_spark.operators.focal import dem_aspect_tiles

    out = dem_aspect_tiles(_dem_tiles(spark), DEM_TILE, DEM_W, DEM_H)
    out = out.filter(
        (F.col("dx") != 0) & (F.col("dy") != 0)
        & (F.abs(F.col("dx")) != F.abs(F.col("dy")))
    )
    return out.select(
        "gx", "gy", F.floor(F.col("az") / 45.0).cast("int").alias("octant")
    )


_RAMP = [(0, 0, 0, 128), (40, 0, 255, 0), (80, 255, 255, 0), (120, 255, 255, 255)]


def _ramp_chan_sql(v: str, ch: int) -> str:
    """CASE over ramp segments, identical expression tree to the
    kernel: floor(0.5 + c0 + ((v-e0)/(e1-e0))*(c1-c0))."""
    segs = []
    for (e0, *c0), (e1, *c1) in zip(_RAMP, _RAMP[1:]):
        expr = (
            f"CAST(floor(0.5 + {float(c0[ch])} + (({v} - {float(e0)})"
            f"/({float(e1)} - {float(e0)})) * ({float(c1[ch])} - {float(c0[ch])})) AS INT)"
        )
        segs.append((e1, expr))
    out = "CASE "
    for e1, expr in segs[:-1]:
        out += f"WHEN {v} <= {float(e1)} THEN {expr} "
    out += f"ELSE {segs[-1][1]} END"
    return out


@query(
    "q75_color_relief",
    f"""WITH g AS (SELECT gx.range AS gx, gy.range AS gy
                   FROM range(128) gx, range(128) gy),
       z AS (SELECT gx, gy, CAST({_ZC} AS DOUBLE) AS v FROM g)
       SELECT gx, gy,
              {_ramp_chan_sql('v', 0)} AS r,
              {_ramp_chan_sql('v', 1)} AS g,
              {_ramp_chan_sql('v', 2)} AS b
       FROM z""",
)
def q75(spark, sf_dir):
    """gdaldem color-relief, linear interpolation
    (gdaldem_lib.cpp:1784-1801): 4-entry ramp over the synthetic DEM;
    the clamp(int(0.5 + lerp)) per channel is reproduced with the
    identical IEEE expression tree in SQL."""
    from gdal_spark.operators.focal import color_relief_tiles

    out = color_relief_tiles(_dem_tiles(spark), _RAMP, DEM_TILE, DEM_W, DEM_H)
    return out.select("gx", "gy", "r", "g", "b")


# A-side rects for the layer-algebra ops: pairwise disjoint on a
# 36×40 grid (needed so remainder accounting is exact on both sides).
A2_RECTS_SQL = (
    "SELECT CAST(n_nationkey AS BIGINT) AS a_id, "
    "CAST((n_nationkey%8)*36 - 144 AS DOUBLE) AS ax0, "
    "CAST((n_nationkey//8)*40 - 70 AS DOUBLE) AS ay0, "
    "CAST((n_nationkey%8)*36 - 144 + 10 + (n_nationkey%7)*3 AS DOUBLE) AS ax1, "
    "CAST((n_nationkey//8)*40 - 70 + 8 + (n_nationkey%5)*5 AS DOUBLE) AS ay1 "
    "FROM nation"
)

_ALG_INTER_SQL = f"""a AS ({A2_RECTS_SQL}), b AS ({ERASE_RECTS_SQL}),
       inter AS (
         SELECT a.a_id, b.b_id,
                (least(a.ax1, b.bx1) - greatest(a.ax0, b.bx0))
                * (least(a.ay1, b.by1) - greatest(a.ay0, b.by0)) AS area
         FROM a JOIN b
         ON least(a.ax1, b.bx1) > greatest(a.ax0, b.bx0)
         AND least(a.ay1, b.by1) > greatest(a.ay0, b.by0)),
       a_rem AS (
         SELECT a.a_id, CAST(NULL AS BIGINT) AS b_id,
                (a.ax1-a.ax0)*(a.ay1-a.ay0) - coalesce(c.cov, 0) AS area
         FROM a LEFT JOIN (SELECT a_id, sum(area) AS cov FROM inter GROUP BY a_id) c
         ON c.a_id = a.a_id
         WHERE (a.ax1-a.ax0)*(a.ay1-a.ay0) - coalesce(c.cov, 0) > 0),
       b_rem AS (
         SELECT CAST(NULL AS BIGINT) AS a_id, b.b_id,
                (b.bx1-b.bx0)*(b.by1-b.by0) - coalesce(c.cov, 0) AS area
         FROM b LEFT JOIN (SELECT b_id, sum(area) AS cov FROM inter GROUP BY b_id) c
         ON c.b_id = b.b_id
         WHERE (b.bx1-b.bx0)*(b.by1-b.by0) - coalesce(c.cov, 0) > 0),
       b_whole AS (
         SELECT CAST(NULL AS BIGINT) AS a_id, b_id,
                (bx1-bx0)*(by1-by0) AS area FROM b)"""


def _a2_rect_rows(spark, sf_dir) -> list[tuple]:
    rows = _t(spark, sf_dir, "nation").select("n_nationkey").collect()
    out = []
    for r in rows:
        k = int(r[0])
        x0 = (k % 8) * 36 - 144.0
        y0 = (k // 8) * 40 - 70.0
        x1 = x0 + 10 + (k % 7) * 3
        y1 = y0 + 8 + (k % 5) * 5
        ring = np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=np.float64
        )
        out.append((int(k), W.polygon_wkb([ring])))
    return out


def _alg(spark, sf_dir, op):
    from gdal_spark.operators.overlay import layer_algebra_area

    a_df = local_df(spark, _a2_rect_rows(spark, sf_dir), "a_id long, geom binary")
    out = layer_algebra_area(a_df, _erase_rect_rows(spark, sf_dir), op)
    if op == "clip":
        return out.select("a_id", F.round(F.col("clip_area"), 6).alias("clip_area"))
    return out.select("a_id", "b_id", F.round(F.col("area"), 6).alias("area"))


@query(
    "q76_overlay_union",
    f"""WITH {_ALG_INTER_SQL}
       SELECT a_id, b_id, round(area, 6) AS area FROM
       (SELECT * FROM inter UNION ALL SELECT * FROM a_rem
        UNION ALL SELECT * FROM b_rem)""",
)
def q76(spark, sf_dir):
    """OGRLayer::Union (ogrlayer.cpp:6188) piece areas: A∩B pieces +
    both remainder sets, from one broadcast candidate join."""
    return _alg(spark, sf_dir, "union")


@query(
    "q77_overlay_symdiff",
    f"""WITH {_ALG_INTER_SQL}
       SELECT a_id, b_id, round(area, 6) AS area FROM
       (SELECT * FROM a_rem UNION ALL SELECT * FROM b_rem)""",
)
def q77(spark, sf_dir):
    """OGRLayer::SymDifference (ogrlayer.cpp:6456): both remainders."""
    return _alg(spark, sf_dir, "symdiff")


@query(
    "q78_overlay_identity",
    f"""WITH {_ALG_INTER_SQL}
       SELECT a_id, b_id, round(area, 6) AS area FROM
       (SELECT * FROM inter UNION ALL SELECT * FROM a_rem)""",
)
def q78(spark, sf_dir):
    """OGRLayer::Identity (ogrlayer.cpp:6710): input split by method
    boundaries — A∩B pieces + A remainders."""
    return _alg(spark, sf_dir, "identity")


@query(
    "q79_overlay_update",
    f"""WITH {_ALG_INTER_SQL}
       SELECT a_id, b_id, round(area, 6) AS area FROM
       (SELECT * FROM a_rem UNION ALL SELECT * FROM b_whole)""",
)
def q79(spark, sf_dir):
    """OGRLayer::Update (ogrlayer.cpp:6986): A remainders + whole B."""
    return _alg(spark, sf_dir, "update")


@query(
    "q80_overlay_clip",
    f"""WITH {_ALG_INTER_SQL}
       SELECT a_id, round(sum(area), 6) AS clip_area
       FROM inter GROUP BY a_id""",
)
def q80(spark, sf_dir):
    """OGRLayer::Clip (ogrlayer.cpp:7206): per input feature, its area
    inside the method layer."""
    return _alg(spark, sf_dir, "clip")


def _q81_rows(spark, sf_dir, shift_x, shift_y, dn_off):
    out = []
    for dn, blob in _q26_rect_rows(spark, sf_dir):
        gtype, rings = W.parse_wkb(blob)
        r = rings[0] + np.array([shift_x, shift_y], dtype=np.float64)
        out.append((float(dn + dn_off), W.polygon_wkb([r])))
    return out


@query(
    "q81_mosaic_last",
    f"""WITH r AS ({Q26_RECTS_SQL}),
       p1 AS (SELECT x0 + dx.range AS gx, y0 + dy.range AS gy, dn AS v
              FROM r, range(16) dx, range(16) dy
              WHERE dx.range < w AND dy.range < h),
       p2 AS (SELECT x0 + 8 + dx.range AS gx, y0 + 4 + dy.range AS gy, dn + 100 AS v
              FROM r, range(16) dx, range(16) dy
              WHERE dx.range < w AND dy.range < h
                AND x0 + 8 + dx.range < 128 AND y0 + 4 + dy.range < 128)
       SELECT coalesce(p2.gx, p1.gx) AS gx, coalesce(p2.gy, p1.gy) AS gy,
              CAST(coalesce(p2.v, p1.v) AS DOUBLE) AS v
       FROM p1 FULL OUTER JOIN p2 ON p1.gx = p2.gx AND p1.gy = p2.gy""",
)
def q81(spark, sf_dir):
    """gdal_merge / gdal raster mosaic, last-wins compositing
    (apps/gdalalg_raster_mosaic.cpp): the shifted second layer paints
    over the first wherever it has valid pixels; one shuffle keyed by
    tile id."""
    from gdal_spark.operators.mosaic import mosaic_tiles

    l1 = local_df(spark, 
        [(float(dn), g) for dn, g in _q26_rect_rows(spark, sf_dir)],
        "burn double, geom binary",
    )
    l2 = local_df(spark, 
        _q81_rows(spark, sf_dir, 8, 4, 100), "burn double, geom binary"
    )
    t1 = rasterize_wkb_grid(l1, IDENTITY_GT, 128, 128, tile_size=32)
    t2 = rasterize_wkb_grid(l2, IDENTITY_GT, 128, 128, tile_size=32)
    out = mosaic_tiles([t1, t2], tile_size=32, nodata=0.0, method="last")
    return tiles_to_features(out, tile_size=32, nodata=0.0)


@query(
    "q82_translate",
    f"""{Q25_PIX_SQL}
       SELECT gx - 10 AS gx, gy - 20 AS gy, least(v * 2.0, 256.0) AS v
       FROM rast
       WHERE gx >= 10 AND gx < 74 AND gy >= 20 AND gy < 68""",
)
def q82(spark, sf_dir):
    """gdal_translate -srcwin 10 20 64 48 -scale 0 128 0 256
    (apps/gdal_translate_lib.cpp): window copy re-tiled from the
    window origin (nearest warp with a translated grid) then linear
    rescale clipped to the dst range."""
    from gdal_spark.operators.translate import translate_tiles

    src = _q25_tiles(spark, sf_dir)
    out = translate_tiles(
        src, tile_size=32, srcwin=(10, 20, 64, 48), scale=(0.0, 128.0, 0.0, 256.0)
    )
    return tiles_to_features(out, tile_size=32, nodata=0.0)


@query(
    "q83_segmentize",
    f"""WITH r AS ({Q51_RECTS_SQL})
       SELECT CAST(dn AS BIGINT) AS fid,
              CAST(2*(ceil(w/2.0) + ceil(h/2.0)) + 1 AS INT) AS n_pts,
              CAST(w*h AS DOUBLE) AS area
       FROM r""",
)
def q83(spark, sf_dir):
    """OGRGeometry::segmentize (ogr/ogrgeometry curves densify): each
    rect side of length L gains ceil(L/2)−1 evenly spaced vertices at
    max_len=2; the vertex count is analytic and the shoelace area is
    invariant."""
    from gdal_spark.functions.st import st_area, st_npoints, st_segmentize

    feats = local_df(spark, 
        [(int(dn), g) for dn, g in _q51_rect_rows(spark, sf_dir)],
        "fid long, geom binary",
    )
    seg = feats.select(
        "fid", st_segmentize(F.col("geom"), F.lit(2.0)).alias("g2")
    )
    return seg.select(
        "fid",
        st_npoints(F.col("g2")).alias("n_pts"),
        F.round(st_area(F.col("g2")), 6).alias("area"),
    )


@query(
    "q84_binary_predicates",
    f"""WITH a AS ({A2_RECTS_SQL}), b AS ({ERASE_RECTS_SQL})
       SELECT a.a_id, b.b_id,
              CASE
                WHEN a.ax0 = b.bx0 AND a.ax1 = b.bx1
                     AND a.ay0 = b.by0 AND a.ay1 = b.by1 THEN 'equals'
                WHEN a.ax0 <= b.bx0 AND b.bx1 <= a.ax1
                     AND a.ay0 <= b.by0 AND b.by1 <= a.ay1 THEN 'contains'
                WHEN b.bx0 <= a.ax0 AND a.ax1 <= b.bx1
                     AND b.by0 <= a.ay0 AND a.ay1 <= b.by1 THEN 'within'
                WHEN a.ax0 < b.bx1 AND b.bx0 < a.ax1
                     AND a.ay0 < b.by1 AND b.by0 < a.ay1 THEN 'overlaps'
                WHEN a.ax0 <= b.bx1 AND b.bx0 <= a.ax1
                     AND a.ay0 <= b.by1 AND b.by0 <= a.ay1 THEN 'touches'
                ELSE 'disjoint'
              END AS rel
       FROM a, b""",
)
def q84(spark, sf_dir):
    """OGR binary predicates (ogrgeometry.cpp:575-6409) on the
    axis-aligned rect fixtures, decided by exact interval arithmetic —
    every (zone, method) pair classified; the oracle reproduces the
    same OGC priority CASE."""
    from gdal_spark.functions.st import st_rect_relation

    a_df = local_df(spark, _a2_rect_rows(spark, sf_dir), "a_id long, geom binary")
    b_df = local_df(spark, 
        [(int(pid), blob) for pid, blob in _erase_rect_rows(spark, sf_dir)],
        "b_id long, bgeom binary",
    )
    pairs = a_df.crossJoin(F.broadcast(b_df))
    return pairs.select(
        "a_id", "b_id", st_rect_relation(F.col("geom"), F.col("bgeom")).alias("rel")
    )


# cubic-convolution weights at t = 0.25 — SAME Horner forms as
# operators.warp._cubic_weights (A=-0.5); all dyadic-exact doubles.
_CW = [
    "(-0.5)*(1.25*(1.25*(1.25 - 5.0) + 8.0) - 4.0)",
    "0.25*0.25*(1.5*0.25 - 2.5) + 1.0",
    "0.75*0.75*(1.5*0.75 - 2.5) + 1.0",
    "(-0.5)*(1.75*(1.75*(1.75 - 5.0) + 8.0) - 4.0)",
]


def _q85_oracle() -> str:
    taps, joins = [], []
    for j in range(-1, 3):
        for i in range(-1, 3):
            al = f"r{i + 1}{j + 1}"
            joins.append(
                f"LEFT JOIN rast {al} ON {al}.gx = g.i + {i} AND {al}.gy = g.j + {j}"
            )
            taps.append(f"({_CW[j + 1]}) * ({_CW[i + 1]}) * coalesce({al}.v, 0)")
    return (
        f"{Q25_PIX_SQL},\n"
        "g AS (SELECT a.range AS i, b.range AS j FROM range(127) a, range(127) b),\n"
        f"s AS (SELECT g.i, g.j, {' + '.join(taps)} AS v FROM g {' '.join(joins)})\n"
        "SELECT i AS gx, j AS gy, v FROM s WHERE v <> 0"
    )


@query("q85_warp_cubic", _q85_oracle())
def q85(spark, sf_dir):
    """gdalwarp CUBIC (Keys convolution, A=−0.5 — the reference's
    GRA_Cubic, alg/gdalwarpkernel.cpp): quarter-pixel-shifted grid ⇒
    constant t=1/4 ⇒ all 16 tap weights are exact dyadic rationals,
    so the 16-tap sum is bit-identical across engines."""
    from gdal_spark.operators.warp import warp_resample

    src = _q25_tiles(spark, sf_dir)
    out = warp_resample(
        src, IDENTITY_GT, (0.25, 1.0, 0.0, 0.25, 0.0, 1.0), 127, 127,
        tile_size=32, method="cubic",
    )
    return tiles_to_features(out, tile_size=32, nodata=0.0)


@query(
    "q86_stream_dedup",
    """SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
       FROM events GROUP BY 1""",
)
def q86(spark, sf_dir):
    """Streaming exact dedup under duplicate delivery: the same events
    file lands twice (at-least-once ingest), a watermarked
    ``dropDuplicates`` on event_id emits each event once across
    micro-batches; the drained result aggregates to exactly the
    batch table."""
    from gdal_spark.streaming.windowed import stream_dedup

    deduped = stream_dedup(spark, f"{sf_dir}/events.parquet")
    return deduped.groupBy("event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value")
    )


def _q87_cities_values() -> str:
    from gdal_spark.sources.pages import CITIES

    rows = ", ".join(
        f"({i}, '{n}', CAST({lon} AS DOUBLE), CAST({lat} AS DOUBLE))"
        for i, (n, lon, lat) in enumerate(CITIES)
    )
    return f"c(ci, name, blon, blat) AS (VALUES {rows})"


@query(
    "q87_geocode_cells",
    f"""WITH d AS (SELECT doc_id, doc_id % 15 AS ci FROM documents),
       {_q87_cities_values()},
       p AS (SELECT doc_id,
                    'https://' || name || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url,
                    blon, blat
             FROM d JOIN c USING (ci)),
       j AS (SELECT blon, blat,
                    CAST(('0x' || substr(md5(url), 1, 16)) AS UBIGINT) AS h
             FROM p),
       g AS (SELECT blon + (CAST(h % 20001 AS DOUBLE) - 10000.0)/10000.0*0.5 AS lon,
                    blat + (CAST((h >> 20) % 20001 AS DOUBLE) - 10000.0)/10000.0*0.5 AS lat
             FROM j),
       k AS (SELECT 7*144115188075855872
                      + CAST(floor((lon+180)/360.0*128) AS BIGINT)*268435456
                      + CAST(floor((90-lat)/180.0*128) AS BIGINT) AS cell7,
                    9*144115188075855872
                      + CAST(floor((lon+180)/360.0*512) AS BIGINT)*268435456
                      + CAST(floor((90-lat)/180.0*512) AS BIGINT) AS cell9
             FROM g)
       SELECT cell7, count(*) AS n, count(DISTINCT cell9) AS n9
       FROM k GROUP BY cell7""",
)
def q87(spark, sf_dir):
    """The FLAGSHIP geocode stage end-to-end with an exact oracle: the
    real ``sources.pages.geocode_encode`` pandas UDF (md5-of-url
    jitter around Zipf city centers, fused multi-resolution cell
    encode — the north rule's 'geocoded from its extracted text'
    stage) over urls both engines construct identically; DuckDB
    reproduces the md5 jitter bit-for-bit via hex-parsing md5(url), so
    per-cell page counts at res 7 and distinct-subcell counts at res 9
    are exact."""
    from gdal_spark.sources.pages import CITIES, geocode_encode

    name_arr = F.array(*[F.lit(c[0]) for c in CITIES])
    ci = (F.col("doc_id") % 15).cast("int")
    d = _t(spark, sf_dir, "documents").select("doc_id")
    pages = d.select(
        "doc_id",
        F.concat(
            F.lit("https://"), F.element_at(name_arr, ci + 1),
            F.lit(".example.com/p/"), F.col("doc_id").cast("string"),
        ).alias("url"),
        F.concat(F.element_at(name_arr, ci + 1), F.lit(" x")).alias("text"),
    )
    enc = geocode_encode(pages, res_list=(7, 9))
    return enc.groupBy("cell7").agg(
        F.count("*").alias("n"), F.count_distinct("cell9").alias("n9")
    )


@query(
    "q88_band_percentiles",
    f"""WITH g AS (SELECT gx.range AS gx, gy.range AS gy
                   FROM range(128) gx, range(128) gy),
       z AS (SELECT CAST({_ZC} AS DOUBLE) AS v FROM g)
       SELECT quantile_cont(v, 0.25) AS p25,
              quantile_cont(v, 0.5) AS p50,
              quantile_cont(v, 0.75) AS p75,
              quantile_cont(v, 0.98) AS p98
       FROM z""",
)
def q88(spark, sf_dir):
    """Band EXACT percentiles (the reference's GetHistogram /
    ComputeStatistics consumers ask for cut points): Spark's exact
    ``percentile`` (linear interpolation) over the exploded DEM equals
    DuckDB's quantile_cont — distributed sort-based exact quantiles,
    not the approx sketch."""
    tiles = _dem_tiles(spark)
    vals = tiles_to_features(tiles, tile_size=DEM_TILE, nodata=None).select("v")
    return vals.agg(
        F.expr("percentile(v, 0.25)").alias("p25"),
        F.expr("percentile(v, 0.5)").alias("p50"),
        F.expr("percentile(v, 0.75)").alias("p75"),
        F.expr("percentile(v, 0.98)").alias("p98"),
    )


@query(
    "q89_spatial_sort_hilbert",
    f"""WITH RECURSIVE pts AS ({POINTS_SQL}),
       g AS (SELECT doc_id,
                    CAST(floor((lon+180.0)/360.0*256) AS BIGINT) AS x,
                    CAST(floor((90.0-lat)/180.0*256) AS BIGINT) AS y
             FROM pts),
       h(doc_id, s, x, y, d) AS (
         SELECT doc_id, CAST(128 AS BIGINT), x, y, CAST(0 AS BIGINT) FROM g
         UNION ALL
         SELECT doc_id, s//2,
                CASE WHEN ry=1 THEN x WHEN rx=0 THEN y ELSE s-1-y END,
                CASE WHEN ry=1 THEN y WHEN rx=0 THEN x ELSE s-1-x END,
                d + s*s*xor(3*rx, ry)
         FROM (SELECT doc_id, s, x, y, d,
                      CASE WHEN (x & s) > 0 THEN 1 ELSE 0 END AS rx,
                      CASE WHEN (y & s) > 0 THEN 1 ELSE 0 END AS ry
               FROM h WHERE s >= 1) b)
       SELECT doc_id, d AS hilbert FROM h WHERE s = 0
       ORDER BY hilbert, doc_id LIMIT 300""",
)
def q89(spark, sf_dir):
    """Hilbert-curve spatial sort key (the reference's layer-sort /
    clustered-write path, complementing the morton key of q30): the
    oracle unrolls the per-bit rotate-and-accumulate loop as a
    recursive CTE — 8 exact integer iterations."""
    from gdal_spark.operators.sort import with_hilbert

    pts = _points(spark, sf_dir)
    return (
        with_hilbert(pts, order=8)
        .select("doc_id", "hilbert")
        .orderBy("hilbert", "doc_id")
        .limit(300)
    )


def _q90_rows(spark, sf_dir) -> list[tuple]:
    """q26 rects burned 2.0; rects ≥5×5 get a 2px-inset inner rect
    burned back to 0 (REPLACE order) — a below-level hole."""
    out = []
    inners = []
    for r in _t(spark, sf_dir, "nation").select("n_nationkey").collect():
        k = int(r[0])
        x0 = (k % 8) * 16 + 2
        y0 = (k // 8) * 16 + 3
        w = 3 + k % 9
        h = 2 + k % 7
        ring = np.array(
            [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h], [x0, y0]],
            dtype=np.float64,
        )
        out.append((2.0, W.polygon_wkb([ring])))
        if w >= 5 and h >= 5:
            xi, yi, wi, hi = x0 + 2, y0 + 2, w - 4, h - 4
            iring = np.array(
                [[xi, yi], [xi + wi, yi], [xi + wi, yi + hi], [xi, yi + hi], [xi, yi]],
                dtype=np.float64,
            )
            inners.append((0.0, W.polygon_wkb([iring])))
    return out + inners  # inners AFTER outers: REPLACE burn order


@query(
    "q90_contour_polygons",
    f"""WITH r AS ({Q26_RECTS_SQL})
       SELECT CAST(2*x0 - 1 AS BIGINT) AS sx, CAST(2*y0 AS BIGINT) AS sy,
              CAST(CASE WHEN w >= 5 AND h >= 5 THEN 2 ELSE 1 END AS INT) AS n_rings,
              round(CASE WHEN w >= 5 AND h >= 5
                    THEN CAST(w*h - (w-4)*(h-4) AS DOUBLE)
                    ELSE w*h - 0.5 END, 6) AS parea
       FROM r""",
)
def q90(spark, sf_dir):
    """FILLED contour polygons (gdal contour -p,
    apps/gdalalg_raster_contour.cpp + PolygonRingAppender): hollow
    rects produce iso-rings with below-level holes; ring nesting by
    containment depth attaches each hole to its innermost container.
    Ring areas are analytic: a ring around a w×h pixel rect closes a
    (w·h − ½) polygon (4 corner diagonals cut ⅛ each), so hollow rects
    net exactly w·h − wi·hi."""
    from gdal_spark.operators.contour import contour_polygons

    feats = local_df(spark, _q90_rows(spark, sf_dir), "burn double, geom binary")
    tiles = rasterize_wkb_grid(feats, IDENTITY_GT, 128, 128, tile_size=32)
    out = contour_polygons(tiles, 1.0, 32, 128, 128)
    return out.select("sx", "sy", "n_rings", F.round(F.col("parea"), 6).alias("parea"))


def _q91_rows(spark, sf_dir) -> list[tuple]:
    """Per nation key: adjacent 6×6 rects A|B with different values and
    a 4×3 nodata hole straddling their shared edge."""
    base = np.array(
        [[0, 0], [128, 0], [128, 128], [0, 128], [0, 0]], dtype=np.float64
    )
    outers = [(999.0, W.polygon_wkb([base]))]
    holes = []
    for r in _t(spark, sf_dir, "nation").select("n_nationkey").collect():
        k = int(r[0])
        x0 = (k % 6) * 20 + 2
        y0 = (k // 6) * 12 + 2

        def rect(xa, ya, xb, yb):
            return np.array(
                [[xa, ya], [xb, ya], [xb, yb], [xa, yb], [xa, ya]], dtype=np.float64
            )

        outers.append((float(k + 1), W.polygon_wkb([rect(x0, y0, x0 + 6, y0 + 6)])))
        outers.append((float(k + 31), W.polygon_wkb([rect(x0 + 6, y0, x0 + 12, y0 + 6)])))
        holes.append((0.0, W.polygon_wkb([rect(x0 + 4, y0 + 2, x0 + 8, y0 + 5)])))
    # burn order (REPLACE): base plateau, rect pairs, then the holes —
    # the base makes holes the ONLY nodata, as in a masked-raster fill
    return outers + holes


@query(
    "q91_fillnodata",
    """WITH ks AS (SELECT n_nationkey AS k FROM nation),
       p AS (SELECT k, (k%6)*20+2 AS x0, (k//6)*12+2 AS y0 FROM ks),
       cells AS (
         SELECT k, x0 + i.range AS gx, y0 + j.range AS gy,
                CAST(CASE WHEN i.range < 6 THEN k+1 ELSE k+31 END AS DOUBLE) AS v
         FROM p, range(12) i, range(6) j),
       hole AS (
         SELECT k, x0 + 4 + i.range AS gx, y0 + 2 + j.range AS gy
         FROM p, range(4) i, range(3) j),
       valid AS (SELECT c.* FROM cells c ANTI JOIN hole h
                 USING (k, gx, gy)),
       cand AS (
         SELECT h.k, h.gx, h.gy, v.v,
                (h.gx - v.gx)*(h.gx - v.gx) + (h.gy - v.gy)*(h.gy - v.gy) AS d2,
                v.gy AS vy, v.gx AS vx
         FROM hole h JOIN valid v
         ON v.k = h.k AND abs(h.gx - v.gx) <= 4 AND abs(h.gy - v.gy) <= 4
         WHERE (h.gx - v.gx)*(h.gx - v.gx) + (h.gy - v.gy)*(h.gy - v.gy) <= 16),
       filled AS (
         SELECT gx, gy, v FROM (
           SELECT gx, gy, v,
                  row_number() OVER (PARTITION BY k, gx, gy
                                     ORDER BY d2, vy, vx) AS rn
           FROM cand) WHERE rn = 1)
       SELECT gx, gy, v FROM valid
       UNION ALL SELECT gx, gy, v FROM filled""",
)
def q91(spark, sf_dir):
    """GDALFillNodata surface (alg/fillnodata.cpp) with pinned
    nearest-valid semantics: holes straddle the boundary between two
    differently-valued regions, so the fill splits by proximity and
    the center column exercises the (d², row, col) tie-break; the
    oracle is a windowed argmin."""
    from gdal_spark.operators.focal import fillnodata_tiles

    feats = local_df(spark, _q91_rows(spark, sf_dir), "burn double, geom binary")
    tiles = rasterize_wkb_grid(feats, IDENTITY_GT, 128, 128, tile_size=32)
    out = fillnodata_tiles(tiles, tile_size=32, width=128, height=128, max_dist=4)
    # compare the rect clusters only (the base plateau pads the fill
    # neighborhoods; every hole pixel has a rect pixel strictly closer
    # than any base pixel, so fills never read 999)
    return out.filter(F.col("v") != 999.0)


@query(
    "q92_stratified_sample",
    """WITH d AS (SELECT doc_id, lang, n_chars,
                    ((doc_id * 2654435761) % 4294967296) % 100 AS h
                  FROM documents)
       SELECT lang, count(*) AS n_kept, sum(n_chars) AS sum_chars
       FROM d
       WHERE h < CASE WHEN lang = 'en' THEN 10 ELSE 50 END
       GROUP BY lang""",
)
def q92(spark, sf_dir):
    """Stratified deterministic sampling (training-data splits):
    per-language keep rates driven by a pure-arithmetic multiplicative
    hash — no RNG state, any executor reproduces the sample, and the
    SQL oracle is the identical predicate.  (Spark's sample() is
    seed-dependent per partition — useless for cross-engine parity or
    resumable pipelines.)"""
    d = _t(spark, sf_dir, "documents")
    h = ((F.col("doc_id") * 2654435761) % 4294967296) % 100
    rate = F.when(F.col("lang") == "en", 10).otherwise(50)
    return (
        d.filter(h < rate)
        .groupBy("lang")
        .agg(F.count("*").alias("n_kept"), F.sum("n_chars").alias("sum_chars"))
    )


@query(
    "q93_sequence_packing",
    """WITH d AS (SELECT doc_id, lang, n_chars,
                    sum(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
                                       ROWS UNBOUNDED PRECEDING) AS cum
                  FROM documents)
       SELECT lang, CAST((cum - n_chars) // 50000 AS BIGINT) AS bin,
              count(*) AS n_docs, sum(n_chars) AS total_chars
       FROM d GROUP BY lang, bin""",
)
def q93(spark, sf_dir):
    """Sequence packing (context-window binning for training): greedy
    cumulative-size bins per language stratum — bin = floor(running
    size before the doc / capacity), one window pass; the exact shape
    a packing stage feeds to a tokenizer fleet."""
    d = _t(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_chars").over(w)
    return (
        d.withColumn("bin", F.floor((cum - F.col("n_chars")) / 50000).cast("long"))
        .groupBy("lang", "bin")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


_Q94_PAIRS = ORACLES["q18_minhash_lsh"]


@query(
    "q94_dedup_canonical",
    f"""WITH RECURSIVE pr AS ({_Q94_PAIRS}),
       e AS (SELECT a AS u, b AS v FROM pr UNION SELECT b, a FROM pr),
       n AS (SELECT DISTINCT u AS node FROM e),
       reach(node, m) AS (
         SELECT node, node FROM n
         UNION
         SELECT e.v, r.m FROM reach r JOIN e ON e.u = r.node)
       SELECT node AS doc_id, CAST(min(m) AS BIGINT) AS canonical
       FROM reach GROUP BY node""",
)
def q94(spark, sf_dir):
    """Canonical-document selection — the full near-dup dedup pipeline
    (shingle → MinHash → LSH bands → verified Jaccard ≥ 0.5 → graph
    CC → keep min doc_id per duplicate cluster): what a training
    pipeline actually DOES with the pair list.  The oracle closes the
    pair graph with a recursive CTE."""
    from gdal_spark.operators.graph import connected_components_auto

    pairs = QUERIES["q18_minhash_lsh"](spark, sf_dir).select("a", "b")
    comp = connected_components_auto(pairs, src="a", dst="b")
    return comp.select(
        F.col("node").alias("doc_id"), F.col("component").alias("canonical")
    )


@query(
    "q95_warp_rotated",
    f"""{Q25_PIX_SQL}
       SELECT gy AS gx, gx AS gy, v FROM rast""",
)
def q95(spark, sf_dir):
    """ROTATED-affine warp (gdalwarp with a rotated target grid —
    GDALWarpOperation back-projects through the full 2×2 inverse): a
    pure axis-swap geotransform makes the result the exact transpose,
    which the oracle states by swapping coordinates."""
    from gdal_spark.operators.warp import warp_resample

    src = _q25_tiles(spark, sf_dir)
    out = warp_resample(
        src, IDENTITY_GT, (0.0, 0.0, 1.0, 0.0, 1.0, 0.0), 128, 128,
        tile_size=32, method="nearest",
    )
    return tiles_to_features(out, tile_size=32, nodata=0.0)


@query(
    "q96_zonal_mode_variety",
    f"""WITH r AS ({Q26_RECTS_SQL}),
       pix AS (SELECT CAST(dn AS BIGINT) AS zone, x0 + dx.range AS gx, y0 + dy.range AS gy
               FROM r, range(16) dx, range(16) dy
               WHERE dx.range < w AND dy.range < h),
       vals AS (SELECT zone, {_z_sql('gx', 'gy')} AS v FROM pix),
       hist AS (SELECT zone, v, count(*) AS cnt FROM vals GROUP BY zone, v),
       rk AS (SELECT zone, v, cnt,
                     row_number() OVER (PARTITION BY zone ORDER BY cnt DESC, v) AS rn,
                     count(*) OVER (PARTITION BY zone) AS variety
              FROM hist)
       SELECT zone, CAST(variety AS BIGINT) AS variety,
              CAST(v AS BIGINT) AS mode_v, cnt AS mode_n
       FROM rk WHERE rn = 1""",
)
def q96(spark, sf_dir):
    """Zonal MODE / VARIETY (the reference zonal-stats outputs beyond
    min/max/mean): per-zone value histogram from the co-located
    tile-pair fold, then a window argmax with the deterministic
    (count desc, value) tie."""
    from gdal_spark.operators.zonal import zonal_histogram

    rects = _q26_rect_rows(spark, sf_dir)
    feats = local_df(spark, rects, "burn double, geom binary")
    zone_tiles = rasterize_wkb_grid(feats, IDENTITY_GT, 128, 128, tile_size=32)
    hist = zonal_histogram(zone_tiles, _dem_tiles(spark), tile_size=32)
    w = Window.partitionBy("zone").orderBy(F.col("cnt").desc(), F.col("v"))
    wz = Window.partitionBy("zone")
    return (
        hist.withColumn("rn", F.row_number().over(w))
        .withColumn("variety", F.count("*").over(wz))
        .filter(F.col("rn") == 1)
        .select(
            "zone", F.col("variety").cast("long").alias("variety"),
            F.col("v").alias("mode_v"), F.col("cnt").alias("mode_n"),
        )
    )


@query(
    "q97_tile_index",
    f"""{Q25_PIX_SQL}
       SELECT gx//32 AS tx, gy//32 AS ty, count(*) AS n_px,
              min(gx) AS xmin, min(gy) AS ymin, max(gx) AS xmax, max(gy) AS ymax,
              CAST(sum(v) AS DOUBLE) AS checksum_sum
       FROM rast GROUP BY tx, ty""",
)
def q97(spark, sf_dir):
    """gdaltindex / manifest surface (apps/gdaltindex_lib.cpp; our
    plans/manifest.py is the committed form): one index row per
    occupied tile with occupancy, pixel extent, and a content sum —
    the footprint table a tile-pruned scan plans against."""
    tiles = _q25_tiles(spark, sf_dir)
    feats = tiles_to_features(tiles, tile_size=32, nodata=0.0)
    return (
        feats.groupBy(
            (F.col("gx") / 32).cast("long").alias("tx"),
            (F.col("gy") / 32).cast("long").alias("ty"),
        )
        .agg(
            F.count("*").alias("n_px"),
            F.min("gx").alias("xmin"), F.min("gy").alias("ymin"),
            F.max("gx").alias("xmax"), F.max("gy").alias("ymax"),
            F.sum("v").alias("checksum_sum"),
        )
    )


def _q98_rows(spark, sf_dir) -> list[tuple]:
    """q26 rects burned 2.0; rects ≥5×5 get a 2px-inset inner rect
    burned 4.0 — a second, higher band."""
    out, inners = [], []
    for r in _t(spark, sf_dir, "nation").select("n_nationkey").collect():
        k = int(r[0])
        x0 = (k % 8) * 16 + 2
        y0 = (k // 8) * 16 + 3
        w = 3 + k % 9
        h = 2 + k % 7
        ring = np.array(
            [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h], [x0, y0]],
            dtype=np.float64,
        )
        out.append((2.0, W.polygon_wkb([ring])))
        if w >= 5 and h >= 5:
            xi, yi, wi, hi = x0 + 2, y0 + 2, w - 4, h - 4
            iring = np.array(
                [[xi, yi], [xi + wi, yi], [xi + wi, yi + hi], [xi, yi + hi], [xi, yi]],
                dtype=np.float64,
            )
            inners.append((4.0, W.polygon_wkb([iring])))
    return out + inners


@query(
    "q98_contour_bands",
    f"""WITH r AS ({Q26_RECTS_SQL})
       SELECT CAST(0 AS INT) AS band,
              CAST(2*x0 - 1 AS BIGINT) AS sx, CAST(2*y0 AS BIGINT) AS sy,
              CAST(CASE WHEN w >= 5 AND h >= 5 THEN 2 ELSE 1 END AS INT) AS n_rings,
              round(CASE WHEN w >= 5 AND h >= 5
                    THEN CAST(w*h - (w-4)*(h-4) AS DOUBLE)
                    ELSE w*h - 0.5 END, 6) AS parea
       FROM r
       UNION ALL
       SELECT 1, CAST(2*(x0+2) - 1 AS BIGINT), CAST(2*(y0+2) AS BIGINT),
              1, round((w-4)*(h-4) - 0.5, 6)
       FROM r WHERE w >= 5 AND h >= 5""",
)
def q98(spark, sf_dir):
    """MULTI-LEVEL contour bands (full gdal contour -p output): plateau
    value 2 with value-4 cores, levels (1, 3) → band 0 = (1,3]
    annulus polygons with holes at the cores, band 1 = the cores; all
    levels' rings nest together and band membership reads off per-level
    containment parity."""
    from gdal_spark.operators.contour import contour_bands

    feats = local_df(spark, _q98_rows(spark, sf_dir), "burn double, geom binary")
    tiles = rasterize_wkb_grid(feats, IDENTITY_GT, 128, 128, tile_size=32)
    out = contour_bands(tiles, (1.0, 3.0), 32, 128, 128)
    return out.select(
        "band", "sx", "sy", "n_rings", F.round(F.col("parea"), 6).alias("parea")
    )


_VS_ZEYE = f"(({_z_sql('64', '64')}) + 2.0)"


@query(
    "q99_viewshed",
    f"""WITH RECURSIVE t AS (
         SELECT gx.range AS px, gy.range AS py,
                gx.range - 64 AS dx, gy.range - 64 AS dy,
                greatest(abs(gx.range - 64), abs(gy.range - 64)) AS n
         FROM range(128) gx, range(128) gy),
       walk(px, py, dx, dy, n, i, m) AS (
         SELECT px, py, dx, dy, n, 1, CAST('-infinity' AS DOUBLE)
         FROM t WHERE n > 1
         UNION ALL
         SELECT px, py, dx, dy, n, i + 1,
                greatest(m,
                  (({_z_sql('x0', 'y0')}) * (1.0 - fx) * (1.0 - fy)
                   + ({_z_sql('x1', 'y0')}) * fx * (1.0 - fy)
                   + ({_z_sql('x0', 'y1')}) * (1.0 - fx) * fy
                   + ({_z_sql('x1', 'y1')}) * fx * fy
                   - {_VS_ZEYE}) * CAST(n AS DOUBLE) / CAST(i AS DOUBLE))
         FROM (
           SELECT *,
                  CAST(floor(x) AS BIGINT) AS x0, CAST(floor(y) AS BIGINT) AS y0,
                  least(CAST(floor(x) AS BIGINT) + 1, 127) AS x1,
                  least(CAST(floor(y) AS BIGINT) + 1, 127) AS y1,
                  x - floor(x) AS fx, y - floor(y) AS fy
           FROM (
             SELECT px, py, dx, dy, n, i, m,
                    64 + CAST(i * dx AS DOUBLE) / CAST(n AS DOUBLE) AS x,
                    64 + CAST(i * dy AS DOUBLE) / CAST(n AS DOUBLE) AS y
             FROM walk WHERE i < n))),
       fin AS (SELECT px, py, m FROM walk WHERE i = n)
       SELECT t.px AS gx, t.py AS gy,
              CASE WHEN t.n = 0 THEN TRUE
                   ELSE ({_z_sql('t.px', 't.py')}) - {_VS_ZEYE}
                        >= coalesce(f.m, CAST('-infinity' AS DOUBLE)) END AS visible
       FROM t LEFT JOIN fin f ON f.px = t.px AND f.py = t.py""",
)
def q99(spark, sf_dir):
    """VIEWSHED (gdal_viewshed, alg/viewshed/viewshed.cpp) with pinned
    LOS semantics: dominant-axis crossings, linear interpolation on
    the off axis, tangent comparison with the common distance factor
    cancelled — the oracle replays every sight line as a recursive
    CTE (~1M exact steps) and matches per-pixel booleans."""
    from gdal_spark.operators.viewshed import viewshed_tiles

    return viewshed_tiles(
        _dem_tiles(spark), DEM_TILE, DEM_W, DEM_H, ox=64, oy=64, eye_height=2.0
    )


@query(
    "q100_flagship_density",
    f"""WITH d AS (SELECT doc_id, doc_id % 15 AS ci FROM documents),
       {_q87_cities_values()},
       p AS (SELECT doc_id,
                    'https://' || name || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url,
                    blon, blat
             FROM d JOIN c USING (ci)),
       j AS (SELECT blon, blat,
                    CAST(('0x' || substr(md5(url), 1, 16)) AS UBIGINT) AS h
             FROM p),
       g AS (SELECT blon + (CAST(h % 20001 AS DOUBLE) - 10000.0)/10000.0*0.5 AS lon,
                    blat + (CAST((h >> 20) % 20001 AS DOUBLE) - 10000.0)/10000.0*0.5 AS lat
             FROM j),
       zz AS (SELECT g.lon, g.lat, c2.ci AS zone_id
              FROM g JOIN c c2
              ON g.lon >= c2.blon - 0.6 AND g.lon <= c2.blon + 0.6
             AND g.lat >= c2.blat - 0.6 AND g.lat <= c2.blat + 0.6),
       k AS (SELECT zone_id,
                    9*144115188075855872
                      + CAST(floor((lon+180)/360.0*512) AS BIGINT)*268435456
                      + CAST(floor((90-lat)/180.0*512) AS BIGINT) AS cell9
             FROM zz)
       SELECT zone_id, cell9, count(*) AS n FROM k GROUP BY zone_id, cell9""",
)
def q100(spark, sf_dir):
    """The NORTH-STAR pipeline end-to-end as ONE oracle-checked query:
    pages geocoded from text (real md5-jitter pandas UDF), fused
    res-9 cell encode, broadcast cell-cover + exact-PIP zone join
    against the metro polygons, and the per-(zone, cell) web-density
    rollup — the tile table the whole engine exists to produce.  The
    oracle replays geocode bit-for-bit (hex-parsed md5) and the PIP as
    exact interval predicates on the rect zones."""
    from gdal_spark.operators.spatial_join import spatial_join_points_in_polygons
    from gdal_spark.plans.pipeline import metro_zones
    from gdal_spark.sources.pages import CITIES, geocode_encode

    name_arr = F.array(*[F.lit(c[0]) for c in CITIES])
    ci = (F.col("doc_id") % 15).cast("int")
    d = _t(spark, sf_dir, "documents").select("doc_id")
    pages = d.select(
        "doc_id",
        F.concat(
            F.lit("https://"), F.element_at(name_arr, ci + 1),
            F.lit(".example.com/p/"), F.col("doc_id").cast("string"),
        ).alias("url"),
        F.concat(F.element_at(name_arr, ci + 1), F.lit(" x")).alias("text"),
    )
    pts = geocode_encode(pages, res_list=(9,))
    joined = spatial_join_points_in_polygons(
        pts, metro_zones(), poly_id_col="zone_id"
    )
    return joined.groupBy("zone_id", "cell9").agg(F.count("*").alias("n"))


@query(
    "q101_simhash64_pairs",
    """WITH toks AS (
         SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
         FROM documents),
       h AS (SELECT doc_id,
                    CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS th_hi,
                    CAST(('0x' || substr(md5(tok), 9, 8)) AS BIGINT) AS th_lo
             FROM toks),
       bits AS (SELECT doc_id, j,
                SUM(CASE WHEN (th_lo // CAST(power(2, j) AS BIGINT)) % 2 = 1
                    THEN 1 ELSE -1 END) AS slo,
                SUM(CASE WHEN (th_hi // CAST(power(2, j) AS BIGINT)) % 2 = 1
                    THEN 1 ELSE -1 END) AS shi
                FROM h, range(32) t(j) GROUP BY doc_id, j),
       sigs AS (SELECT doc_id,
              CAST(SUM(CASE WHEN shi > 0 THEN CAST(power(2, j) AS BIGINT) ELSE 0 END)
                   AS BIGINT) AS sig_hi,
              CAST(SUM(CASE WHEN slo > 0 THEN CAST(power(2, j) AS BIGINT) ELSE 0 END)
                   AS BIGINT) AS sig_lo
              FROM bits GROUP BY doc_id),
       p AS (SELECT x.doc_id AS a, y.doc_id AS b,
                    CAST(bit_count(xor(x.sig_hi, y.sig_hi))
                         + bit_count(xor(x.sig_lo, y.sig_lo)) AS BIGINT) AS ham
             FROM sigs x JOIN sigs y ON x.doc_id < y.doc_id)
       SELECT a, b, ham FROM p WHERE ham <= 3""",
)
def q101(spark, sf_dir):
    """64-bit SimHash near-dup pairs — the scale-safe candidate
    generator: 4 rotated 16-bit band tables as equi-join keys (2^16
    buckets per band → ~linear candidate growth on real corpora),
    exact Hamming verify; EXACT for ham ≤ 3 by pigeonhole, so the
    oracle is the brute-force all-pairs join.  Signatures ride as two
    32-bit halves so every value fits a signed long on both engines."""
    from gdal_spark.operators.dedup import simhash64_pairs

    return simhash64_pairs(_t(spark, sf_dir, "documents"), max_hamming=3)


# --- convolution / gauss / rms overview modes (q102-q107) -----------------
# gcore/overview.cpp:4302-4440 dispatch; weights from
# operators.pyramid.conv_weights are inlined VERBATIM into the oracle so
# both engines accumulate the identical left-associated IEEE expression
# (interior pixels only — edge truncation renormalizes in the engine and
# is excluded from the compare window).


def _conv_oracle_sql(method: str) -> str:
    from gdal_spark.operators.pyramid import _CONV_RADIUS, conv_weights

    w = conv_weights(method)
    R = _CONV_RADIUS[method]
    lo, hi = 2 * R - 1, 63 - R  # full-window interior dest range

    # weight literals go through CAST(string AS DOUBLE): DuckDB parses
    # long bare decimals as DECIMAL(38,38) and overflows on multiply;
    # string→double is correctly rounded, matching Python repr exactly
    def wlit(k: int) -> str:
        return f"CAST('{w[k]!r}' AS DOUBLE)"

    def h_expr(y: str) -> str:
        terms = [
            f"{wlit(k)}*({_z_sql(f'2*px+{1 - 2 * R + k}', y)})"
            for k in range(4 * R)
        ]
        return "(" + " + ".join(terms) + ")"

    v_terms = [
        f"{wlit(k)}*{h_expr(f'2*py+{1 - 2 * R + k}')}" for k in range(4 * R)
    ]
    expr = " + ".join(v_terms)
    return (
        "WITH g AS (SELECT px.range AS px, py.range AS py "
        "FROM range(64) px, range(64) py) "
        f"SELECT px, py, round({expr}, 6) AS v FROM g "
        f"WHERE px >= {lo} AND px <= {hi} AND py >= {lo} AND py <= {hi}"
    )


def _conv_query(method: str):
    from gdal_spark.operators.pyramid import _CONV_RADIUS

    R = _CONV_RADIUS[method]
    lo, hi = 2 * R - 1, 63 - R

    def fn(spark, sf_dir):
        from gdal_spark.operators.pyramid import pyramid_convolution

        out = pyramid_convolution(
            _dem_tiles(spark), method, DEM_TILE, DEM_W, DEM_H
        )
        return out.filter(
            (F.col("px") >= lo) & (F.col("px") <= hi)
            & (F.col("py") >= lo) & (F.col("py") <= hi)
        ).select("px", "py", F.round("v", 6).alias("v"))

    return fn


query("q102_pyramid_bilinear", _conv_oracle_sql("bilinear"))(_conv_query("bilinear"))
query("q103_pyramid_cubic", _conv_oracle_sql("cubic"))(_conv_query("cubic"))
query("q104_pyramid_cubicspline", _conv_oracle_sql("cubicspline"))(
    _conv_query("cubicspline")
)
query("q105_pyramid_lanczos", _conv_oracle_sql("lanczos"))(_conv_query("lanczos"))


_GAUSS_TERMS = " + ".join(
    f"{mval}.0*({_z_sql(f'2*px+{kx}', f'2*py+{ky}')})"
    for ky, mrow in enumerate([[1, 2, 1], [2, 4, 2], [1, 2, 1]])
    for kx, mval in enumerate(mrow)
)


@query(
    "q106_pyramid_gauss",
    f"""WITH g AS (SELECT px.range AS px, py.range AS py
                   FROM range(64) px, range(64) py)
       SELECT px, py, round(({_GAUSS_TERMS}) / 16.0, 6) AS v FROM g
       WHERE px <= 62 AND py <= 62""",
)
def q106(spark, sf_dir):
    """GAUSS overview: 3×3 [1 2 1; 2 4 2; 1 2 1] kernel anchored at the
    2×2 block origin, normalized over the in-raster window
    (gcore/overview.cpp:2032-2120); interior window sum = 16."""
    from gdal_spark.operators.pyramid import pyramid_convolution

    out = pyramid_convolution(_dem_tiles(spark), "gauss", DEM_TILE, DEM_W, DEM_H)
    return out.filter((F.col("px") <= 62) & (F.col("py") <= 62)).select(
        "px", "py", F.round("v", 6).alias("v")
    )


@query(
    "q107_pyramid_rms",
    f"""WITH par AS (SELECT px.range AS px, py.range AS py
                     FROM range(64) px, range(64) py)
       SELECT px, py,
              round(sqrt((({_z_sql('2*px', '2*py')})*({_z_sql('2*px', '2*py')})
                    + ({_z_sql('2*px+1', '2*py')})*({_z_sql('2*px+1', '2*py')})
                    + ({_z_sql('2*px', '2*py+1')})*({_z_sql('2*px', '2*py+1')})
                    + ({_z_sql('2*px+1', '2*py+1')})*({_z_sql('2*px+1', '2*py+1')})) / 4.0), 6) AS v
       FROM par""",
)
def q107(spark, sf_dir):
    """RMS overview (GDALResampleChunk_AverageOrRMS<true>, float path):
    sqrt of the mean of squares over each 2×2 child block — integer
    DEM values keep the sum of squares exact on both engines."""
    from gdal_spark.operators.pyramid import pyramid_level

    level = pyramid_level(_dem_tiles(spark), method="rms", tile_size=DEM_TILE)
    return tiles_to_features(level, tile_size=DEM_TILE, nodata=None).select(
        F.col("gx").alias("px"), F.col("gy").alias("py"),
        F.round("v", 6).alias("v"),
    )


# --- GEOS-free geometry methods (q108-q111) --------------------------------
# OGRGeometry::Distance (ogr/ogrgeometry.cpp:3818), ::Centroid,
# ::ConvexHull (:4449), ::Simplify — the reference delegates to GEOS;
# kernels/geomops.py re-states the published algorithms with pinned
# IEEE expression trees and tie-breaks that the DuckDB oracles replay.


@query(
    "q108_st_distance",
    """WITH p AS (SELECT n_nationkey AS n,
                       CAST((n_nationkey*37)%101 AS DOUBLE) AS px,
                       CAST((n_nationkey*53)%89 AS DOUBLE) AS py
                FROM nation),
       v AS (SELECT k.range AS k, CAST((k.range*29)%61 AS DOUBLE) AS vx,
                    CAST((k.range*41)%73 AS DOUBLE) AS vy
             FROM range(10) k),
       seg AS (SELECT a.k, a.vx AS ax, a.vy AS ay, b.vx AS x2, b.vy AS y2
               FROM v a JOIN v b ON b.k = a.k + 1),
       d AS (SELECT n, px, py, ax, ay, (x2-ax) AS dx, (y2-ay) AS dy
             FROM p, seg),
       t AS (SELECT n, px, py, ax, ay, dx, dy,
                    least(greatest(((px-ax)*dx + (py-ay)*dy) / (dx*dx + dy*dy),
                                   0.0), 1.0) AS tt
             FROM d),
       e AS (SELECT n, sqrt((px-cx)*(px-cx) + (py-cy)*(py-cy)) AS dist
             FROM (SELECT n, px, py, ax + tt*dx AS cx, ay + tt*dy AS cy FROM t))
       SELECT n, round(min(dist), 6) AS dist FROM e GROUP BY n""",
)
def q108(spark, sf_dir):
    """ST_Distance point → polyline: min over the 9 segment distances
    with the pinned clamp-projection expression tree (both engines run
    t = clamp(dot/len², 0, 1) then the hypotenuse to the foot)."""
    from gdal_spark.functions.st import st_distance, st_point
    from gdal_spark.kernels import wkb as W

    k = np.arange(10)
    line = W.linestring_wkb(
        np.column_stack([(k * 29) % 61, (k * 41) % 73]).astype(np.float64)
    )
    pts = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n"),
        ((F.col("n_nationkey") * 37) % 101).cast("double").alias("px"),
        ((F.col("n_nationkey") * 53) % 89).cast("double").alias("py"),
    )
    return pts.select(
        "n",
        F.round(
            st_distance(st_point("px", "py"), F.lit(line)), 6
        ).alias("dist"),
    )


@query(
    "q109_st_centroid",
    """WITH d AS (SELECT n_nationkey AS n,
                       6 + (n_nationkey*7)%11 AS w, 6 + (n_nationkey*5)%9 AS h,
                       (n_nationkey%5)*30 AS ox, (n_nationkey//5)*30 AS oy
                FROM nation),
       q AS (SELECT n, w, h, ox, oy,
                    2 + (n*3)%(w-3) AS w1, 2 + (n*11)%(h-3) AS h1 FROM d),
       vv AS (SELECT n,
              CAST(ox AS BIGINT) AS x0, CAST(oy AS BIGINT) AS y0,
              CAST(ox+w AS BIGINT) AS x1, CAST(oy AS BIGINT) AS y1,
              CAST(ox+w AS BIGINT) AS x2, CAST(oy+h1 AS BIGINT) AS y2,
              CAST(ox+w1 AS BIGINT) AS x3, CAST(oy+h1 AS BIGINT) AS y3,
              CAST(ox+w1 AS BIGINT) AS x4, CAST(oy+h AS BIGINT) AS y4,
              CAST(ox AS BIGINT) AS x5, CAST(oy+h AS BIGINT) AS y5
              FROM q),
       s AS (SELECT n,
              (x0*y1 - x1*y0) + (x1*y2 - x2*y1) + (x2*y3 - x3*y2)
              + (x3*y4 - x4*y3) + (x4*y5 - x5*y4) + (x5*y0 - x0*y5) AS ss,
              (x0+x1)*(x0*y1 - x1*y0) + (x1+x2)*(x1*y2 - x2*y1)
              + (x2+x3)*(x2*y3 - x3*y2) + (x3+x4)*(x3*y4 - x4*y3)
              + (x4+x5)*(x4*y5 - x5*y4) + (x5+x0)*(x5*y0 - x0*y5) AS sx,
              (y0+y1)*(x0*y1 - x1*y0) + (y1+y2)*(x1*y2 - x2*y1)
              + (y2+y3)*(x2*y3 - x3*y2) + (y3+y4)*(x3*y4 - x4*y3)
              + (y4+y5)*(x4*y5 - x5*y4) + (y5+y0)*(x5*y0 - x0*y5) AS sy
              FROM vv)
       SELECT n, round(CAST(sx AS DOUBLE) / (3.0*CAST(ss AS DOUBLE)), 6) AS cx,
              round(CAST(sy AS DOUBLE) / (3.0*CAST(ss AS DOUBLE)), 6) AS cy
       FROM s""",
)
def q109(spark, sf_dir):
    """ST_Centroid of integer-vertex L-shaped (concave) polygons: the
    shoelace cross terms stay integers on both engines, so the area-
    weighted centroid Sx/(3S) is bit-exact."""
    from gdal_spark.functions.st import st_centroid

    rows = []
    for r in _t(spark, sf_dir, "nation").select("n_nationkey").collect():
        n = int(r["n_nationkey"])
        w, h = 6 + (n * 7) % 11, 6 + (n * 5) % 9
        ox, oy = (n % 5) * 30, (n // 5) * 30
        w1, h1 = 2 + (n * 3) % (w - 3), 2 + (n * 11) % (h - 3)
        ring = np.array(
            [
                [ox, oy], [ox + w, oy], [ox + w, oy + h1],
                [ox + w1, oy + h1], [ox + w1, oy + h], [ox, oy + h],
                [ox, oy],
            ],
            dtype=np.float64,
        )
        rows.append((n, W.polygon_wkb([ring])))
    feats = local_df(spark, rows, "n long, geom binary")
    c = feats.select("n", st_centroid(F.col("geom")).alias("c"))
    return c.select(
        "n",
        F.round(F.element_at("c", 1), 6).alias("cx"),
        F.round(F.element_at("c", 2), 6).alias("cy"),
    )


@query(
    "q110_st_convexhull",
    """WITH pts AS (
         SELECT i.range // 40 AS g, i.range % 40 AS i,
                CAST(((i.range // 40)*31 + (i.range % 40)*17
                      + ((i.range % 40)*(i.range % 40)*7)%23)%97 AS BIGINT) AS x,
                CAST(((i.range // 40)*43 + (i.range % 40)*23
                      + ((i.range % 40)*(i.range % 40)*29)%43)%89 AS BIGINT) AS y
         FROM range(200) i),
       u AS (SELECT DISTINCT g, x, y FROM pts),
       hullv AS (
         SELECT DISTINCT a.g, a.x, a.y
         FROM u a JOIN u b ON b.g = a.g AND (b.x <> a.x OR b.y <> a.y)
         WHERE NOT EXISTS (
           SELECT 1 FROM u c
           WHERE c.g = a.g AND (c.x <> a.x OR c.y <> a.y)
             AND (c.x <> b.x OR c.y <> b.y)
             AND (b.x-a.x)*(c.y-a.y) - (b.y-a.y)*(c.x-a.x) <= 0))
       SELECT g, CAST(x AS DOUBLE) AS hx, CAST(y AS DOUBLE) AS hy
       FROM hullv""",
)
def q110(spark, sf_dir):
    """ST_ConvexHull (monotone chain) over 5 groups of 40 integer
    points in general position; the oracle derives hull vertices by the
    O(N³) all-points-strictly-left edge test — both must produce the
    identical vertex set."""
    from gdal_spark.kernels.geomops import convex_hull

    pts = spark.range(200).select(
        (F.col("id") / 40).cast("long").alias("g"),
        (F.col("id") % 40).alias("i"),
    )
    pts = pts.select(
        "g",
        ((F.col("g") * 31 + F.col("i") * 17 + (F.col("i") * F.col("i") * 7) % 23) % 97)
        .cast("double").alias("x"),
        ((F.col("g") * 43 + F.col("i") * 23 + (F.col("i") * F.col("i") * 29) % 43) % 89)
        .cast("double").alias("y"),
    )
    schema = "g long, hx double, hy double"

    def hull_of(key, pdf):
        ring = convex_hull(pdf[["x", "y"]].to_numpy())
        return pd.DataFrame(
            {"g": int(key[0]), "hx": ring[:-1, 0], "hy": ring[:-1, 1]}
        )

    return pts.groupBy("g").applyInPandas(hull_of, schema)


_Q111_TOL = 6.0


@query(
    "q111_st_simplify",
    f"""WITH RECURSIVE
       v AS (SELECT n.n_nationkey AS n, i.range AS i,
                    CAST(i.range*10 AS DOUBLE) AS x,
                    CAST(((n.n_nationkey*7 + i.range*i.range*13)%41) - 20 AS DOUBLE) AS y
             FROM nation n, range(16) i),
       dd AS (SELECT a.n, a.i AS i, b.i AS j, c.i AS k,
                     sqrt((c.x-cx)*(c.x-cx) + (c.y-cy)*(c.y-cy)) AS d
              FROM (
                SELECT a.n, a.i, b.i AS bi, c.i AS ci, c.x, c.y,
                       a.x + tt*(b.x-a.x) AS cx, a.y + tt*(b.y-a.y) AS cy
                FROM (SELECT aa.n, aa.i, aa.x, aa.y FROM v aa) a
                JOIN v b ON b.n = a.n AND b.i > a.i + 1
                JOIN v c ON c.n = a.n AND c.i > a.i AND c.i < b.i,
                LATERAL (SELECT least(greatest(
                          ((c.x-a.x)*(b.x-a.x) + (c.y-a.y)*(b.y-a.y))
                          / ((b.x-a.x)*(b.x-a.x) + (b.y-a.y)*(b.y-a.y)), 0.0), 1.0) AS tt) l
              ) q(n, i, bi, ci, x, y, cx, cy)
              JOIN v a ON a.n = q.n AND a.i = q.i
              JOIN v b ON b.n = q.n AND b.i = q.bi
              JOIN v c ON c.n = q.n AND c.i = q.ci),
       pick AS (SELECT n, i, j, k, d,
                       ROW_NUMBER() OVER (PARTITION BY n, i, j
                                          ORDER BY d DESC, k) AS rnk
                FROM dd),
       p1 AS (SELECT n, i, j, k, d FROM pick WHERE rnk = 1),
       iv(n, i, j) AS (
         SELECT n_nationkey, 0, 15 FROM nation
         UNION ALL
         SELECT t.n,
                CASE s.s WHEN 0 THEN t.i ELSE p.k END,
                CASE s.s WHEN 0 THEN p.k ELSE t.j END
         FROM iv t
         JOIN p1 p ON p.n = t.n AND p.i = t.i AND p.j = t.j
                   AND p.d > {_Q111_TOL}, (VALUES (0), (1)) s(s)
       ),
       kept AS (SELECT DISTINCT n, i FROM
                (SELECT n, i FROM iv UNION ALL SELECT n, j AS i FROM iv))
       SELECT k.n, v.x, v.y FROM kept k JOIN v ON v.n = k.n AND v.i = k.i""",
)
def q111(spark, sf_dir):
    """ST_Simplify: Douglas–Peucker with segment distance, keep when
    dmax > tol, split at the FIRST max index — the oracle replays the
    recursion as a recursive CTE over (i, j) intervals with a
    ROW_NUMBER (d DESC, k) argmax."""
    from gdal_spark.kernels.geomops import simplify_dp

    pts = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n")
    ).crossJoin(spark.range(16).select(F.col("id").alias("i")))
    pts = pts.select(
        "n",
        (F.col("i") * 10).cast("double").alias("x"),
        (((F.col("n") * 7 + F.col("i") * F.col("i") * 13) % 41) - 20)
        .cast("double").alias("y"),
    )
    schema = "n long, x double, y double"

    def simp(key, pdf):
        coords = pdf.sort_values("x")[["x", "y"]].to_numpy()
        kept = simplify_dp(coords, _Q111_TOL)
        return pd.DataFrame({"n": int(key[0]), "x": kept[:, 0], "y": kept[:, 1]})

    return pts.groupBy("n").applyInPandas(simp, schema)


# --- general concave overlay (q112-q115) -----------------------------------
# Greiner–Hormann boolean overlay (kernels/clipgen.py) on CONCAVE
# staircase fixtures.  A-polygons live on integer coordinates, B on
# half-odd coordinates — structurally general position (no vertex-on-
# edge, no collinear overlap), the kernel's contract.  The oracle
# never clips: each staircase is a union of 3 DISJOINT rectangles, so
# every overlay area follows from rect-pair interval arithmetic
# (inclusion-exclusion) — a brute-force oracle fully independent of
# the traversal.

_STAIR_SQL = """
       a AS (SELECT k.range AS a_id, (k.range%3)*40 AS ax0, (k.range//3)*40 AS ay0,
                    3 + (k.range*2)%5 AS swa, 2 + (k.range*3)%5 AS sha
             FROM range(6) k),
       ra AS (SELECT a_id, CAST(ax0 + j.range*swa AS DOUBLE) AS rx0,
                     CAST(ay0 AS DOUBLE) AS ry0,
                     CAST(ax0 + (j.range+1)*swa AS DOUBLE) AS rx1,
                     CAST(ay0 + (j.range+1)*sha AS DOUBLE) AS ry1
              FROM a, range(3) j),
       b AS (SELECT m.range AS b_id, (m.range%3)*40 + 2.5 AS bx0,
                    (m.range//3)*40 + 1.5 AS by0,
                    2 + (m.range*3)%5 AS swb, 2 + (m.range*2)%5 AS shb
             FROM range(6) m),
       rb AS (SELECT b_id, bx0 + j.range*swb AS rx0, by0 AS ry0,
                     bx0 + (j.range+1)*swb AS rx1,
                     by0 + (3-j.range)*shb AS ry1
              FROM b, range(3) j),
       inter AS (SELECT a_id, b_id,
                 SUM(greatest(0.0, least(ra.rx1, rb.rx1) - greatest(ra.rx0, rb.rx0))
                     * greatest(0.0, least(ra.ry1, rb.ry1) - greatest(ra.ry0, rb.ry0))) AS s
                 FROM ra, rb GROUP BY a_id, b_id),
       areas AS (SELECT a_id, SUM((rx1-rx0)*(ry1-ry0)) AS area_a FROM ra GROUP BY a_id),
       areab AS (SELECT b_id, SUM((rx1-rx0)*(ry1-ry0)) AS area_b FROM rb GROUP BY b_id)
"""


def _stair_feats(spark):
    """The same fixtures as polygon WKB rings (A ascending integer
    staircase, B descending half-odd staircase)."""
    arows, brows = [], []
    for k in range(6):
        ax0, ay0 = (k % 3) * 40, (k // 3) * 40
        sw, sh = 3 + (k * 2) % 5, 2 + (k * 3) % 5
        ring = np.array(
            [
                [ax0, ay0], [ax0 + 3 * sw, ay0],
                [ax0 + 3 * sw, ay0 + 3 * sh], [ax0 + 2 * sw, ay0 + 3 * sh],
                [ax0 + 2 * sw, ay0 + 2 * sh], [ax0 + sw, ay0 + 2 * sh],
                [ax0 + sw, ay0 + sh], [ax0, ay0 + sh], [ax0, ay0],
            ],
            dtype=np.float64,
        )
        arows.append((k, W.polygon_wkb([ring])))
    for m in range(6):
        bx0, by0 = (m % 3) * 40 + 2.5, (m // 3) * 40 + 1.5
        sw, sh = 2 + (m * 3) % 5, 2 + (m * 2) % 5
        ring = np.array(
            [
                [bx0, by0], [bx0 + 3 * sw, by0],
                [bx0 + 3 * sw, by0 + sh], [bx0 + 2 * sw, by0 + sh],
                [bx0 + 2 * sw, by0 + 2 * sh], [bx0 + sw, by0 + 2 * sh],
                [bx0 + sw, by0 + 3 * sh], [bx0, by0 + 3 * sh], [bx0, by0],
            ],
            dtype=np.float64,
        )
        brows.append((m, W.polygon_wkb([ring])))
    # single-partition tiny dims: a 32×32-partition cartesian of 6×6
    # rows would schedule 1024 tasks of pure overhead
    fa = local_df(spark, arows, "a_id long, ga binary").coalesce(1)
    fb = local_df(spark, brows, "b_id long, gb binary").coalesce(1)
    return fa, fb


def _overlay_general(spark, op):
    from gdal_spark.functions.st import st_clip_area

    fa, fb = _stair_feats(spark)
    pairs = fa.crossJoin(fb)
    return pairs.select(
        "a_id", "b_id",
        F.round(
            st_clip_area(F.col("ga"), F.col("gb"), F.lit(op)), 6
        ).alias("area"),
    )


@query(
    "q112_overlay_general_intersection",
    f"""WITH {_STAIR_SQL}
       SELECT a_id, b_id, round(s, 6) AS area FROM inter WHERE s > 0""",
)
def q112(spark, sf_dir):
    """Concave ∩ concave via the GH traversal; oracle = Σ rect-pair
    overlaps of the disjoint-rect decompositions."""
    return _overlay_general(spark, "intersection").filter(F.col("area") > 0)


@query(
    "q113_overlay_general_union",
    f"""WITH {_STAIR_SQL}
       SELECT i.a_id, i.b_id, round(area_a + area_b - s, 6) AS area
       FROM inter i JOIN areas USING (a_id) JOIN areab USING (b_id)""",
)
def q113(spark, sf_dir):
    """Concave ∪ concave (incl. disjoint two-ring and hole-nesting
    cases) — the engine result is the traversal's ring set measured by
    nesting-signed areas, never the |A|+|B|−|A∩B| identity."""
    return _overlay_general(spark, "union")


@query(
    "q114_overlay_general_difference",
    f"""WITH {_STAIR_SQL}
       SELECT i.a_id, i.b_id, round(area_a - s, 6) AS area
       FROM inter i JOIN areas USING (a_id)""",
)
def q114(spark, sf_dir):
    """Concave A − B (multi-piece results when B splits A)."""
    return _overlay_general(spark, "difference")


@query(
    "q115_overlay_general_symdiff",
    f"""WITH {_STAIR_SQL}
       SELECT i.a_id, i.b_id, round(area_a + area_b - 2*s, 6) AS area
       FROM inter i JOIN areas USING (a_id) JOIN areab USING (b_id)""",
)
def q115(spark, sf_dir):
    """Concave symmetric difference = (A−B) ⊎ (B−A), two traversals."""
    return _overlay_general(spark, "symdiff")


# --- extended zonal statistics (q116-q118) ---------------------------------
# alg/zonal.cpp Stat enum rows beyond the core set: MINORITY, FRAC,
# WEIGHTED_SUM/MEAN/VARIANCE/STDEV, MIN/MAX_CENTER_X/Y.


def _w_sql(a: str, b: str) -> str:
    """Weight raster formula (integers ≥ 1, exact on both engines)."""
    return f"((({a})*11 + ({b})*5)%13 + 1)"


def _weight_tiles(spark):
    from gdal_spark.operators.rasterize import TILE_SCHEMA

    ntx, nty = DEM_W // DEM_TILE, DEM_H // DEM_TILE

    def gen(pdf_iter):
        for pdf in pdf_iter:
            rows = []
            for _, row in pdf.iterrows():
                t = int(row["id"])
                tx, ty = t % ntx, t // ntx
                gx = np.arange(DEM_TILE) + tx * DEM_TILE
                gy = np.arange(DEM_TILE) + ty * DEM_TILE
                GX, GY = np.meshgrid(gx, gy)
                w = ((GX * 11 + GY * 5) % 13 + 1).astype(np.float64)
                rows.append((0, tx, ty, 1, w.tobytes(), "float64", 0.0))
            yield pd.DataFrame(
                rows, columns=["z", "tx", "ty", "band", "data", "dtype", "nodata"]
            )

    from pyspark.sql import types as T2

    return spark.range(ntx * nty).mapInPandas(
        gen,
        "z int, tx long, ty long, band int, data binary, dtype string, nodata double",
    )


def _zone_tiles_q116(spark, sf_dir):
    rects = _q26_rect_rows(spark, sf_dir)
    feats = local_df(spark, rects, "burn double, geom binary")
    return rasterize_wkb_grid(feats, IDENTITY_GT, 128, 128, tile_size=32)


@query(
    "q116_zonal_minority_frac",
    f"""WITH r AS ({Q26_RECTS_SQL}),
       pix AS (SELECT CAST(dn AS BIGINT) AS zone, x0 + dx.range AS gx, y0 + dy.range AS gy
               FROM r, range(16) dx, range(16) dy
               WHERE dx.range < w AND dy.range < h),
       vals AS (SELECT zone, {_z_sql('gx', 'gy')} AS v FROM pix),
       hist AS (SELECT zone, v, count(*) AS cnt FROM vals GROUP BY zone, v),
       rk AS (SELECT zone, v, cnt,
                     row_number() OVER (PARTITION BY zone ORDER BY cnt ASC, v) AS rn,
                     sum(cnt) OVER (PARTITION BY zone) AS total
              FROM hist)
       SELECT zone, CAST(v AS BIGINT) AS minority_v, cnt AS minority_n,
              round(cnt / CAST(total AS DOUBLE), 6) AS minority_frac
       FROM rk WHERE rn = 1""",
)
def q116(spark, sf_dir):
    """Zonal MINORITY (least frequent value, ties → smallest) and its
    FRAC share — a window pick over the distributed zonal histogram."""
    from gdal_spark.operators.zonal import zonal_histogram

    hist = zonal_histogram(
        _zone_tiles_q116(spark, sf_dir), _dem_tiles(spark), tile_size=32
    )
    w = Window.partitionBy("zone").orderBy(F.col("cnt").asc(), F.col("v"))
    wz = Window.partitionBy("zone")
    return (
        hist.withColumn("rn", F.row_number().over(w))
        .withColumn("total", F.sum("cnt").over(wz))
        .filter(F.col("rn") == 1)
        .select(
            "zone", F.col("v").alias("minority_v"), F.col("cnt").alias("minority_n"),
            F.round(F.col("cnt") / F.col("total").cast("double"), 6)
            .alias("minority_frac"),
        )
    )


@query(
    "q117_zonal_weighted",
    f"""WITH r AS ({Q26_RECTS_SQL}),
       pix AS (SELECT CAST(dn AS BIGINT) AS zone, x0 + dx.range AS gx, y0 + dy.range AS gy
               FROM r, range(16) dx, range(16) dy
               WHERE dx.range < w AND dy.range < h),
       vals AS (SELECT zone, {_z_sql('gx', 'gy')} AS v, {_w_sql('gx', 'gy')} AS wt
                FROM pix),
       a AS (SELECT zone, CAST(sum(wt) AS BIGINT) AS sw,
                    CAST(sum(wt*v) AS BIGINT) AS swv,
                    CAST(sum(wt*v*v) AS BIGINT) AS swvv
             FROM vals GROUP BY zone)
       SELECT zone, swv AS wsum,
              round(swv / CAST(sw AS DOUBLE), 6) AS wmean,
              round(swvv / CAST(sw AS DOUBLE)
                    - (swv / CAST(sw AS DOUBLE)) * (swv / CAST(sw AS DOUBLE)), 6)
                  AS wvariance,
              round(sqrt(swvv / CAST(sw AS DOUBLE)
                    - (swv / CAST(sw AS DOUBLE)) * (swv / CAST(sw AS DOUBLE))), 6)
                  AS wstdev
       FROM a""",
)
def q117(spark, sf_dir):
    """Zonal WEIGHTED_SUM/MEAN/VARIANCE/STDEV with a weight raster —
    three-way co-located tile join, integer-exact partials."""
    from gdal_spark.operators.zonal import zonal_weighted_raster

    return zonal_weighted_raster(
        _zone_tiles_q116(spark, sf_dir), _dem_tiles(spark), _weight_tiles(spark),
        tile_size=32,
    )


@query(
    "q118_zonal_minmax_center",
    f"""WITH r AS ({Q26_RECTS_SQL}),
       pix AS (SELECT CAST(dn AS BIGINT) AS zone, x0 + dx.range AS gx, y0 + dy.range AS gy
               FROM r, range(16) dx, range(16) dy
               WHERE dx.range < w AND dy.range < h),
       vals AS (SELECT zone, gx, gy, {_z_sql('gx', 'gy')} AS v FROM pix),
       mn AS (SELECT zone, v, gx, gy,
                     row_number() OVER (PARTITION BY zone ORDER BY v ASC, gy, gx) AS rn
              FROM vals),
       mx AS (SELECT zone, v, gx, gy,
                     row_number() OVER (PARTITION BY zone ORDER BY v DESC, gy, gx) AS rn
              FROM vals)
       SELECT mn.zone, CAST(mn.v AS BIGINT) AS vmin,
              mn.gx + 0.5 AS min_cx, mn.gy + 0.5 AS min_cy,
              CAST(mx.v AS BIGINT) AS vmax,
              mx.gx + 0.5 AS max_cx, mx.gy + 0.5 AS max_cy
       FROM mn JOIN mx ON mx.zone = mn.zone AND mx.rn = 1
       WHERE mn.rn = 1""",
)
def q118(spark, sf_dir):
    """Zonal MIN/MAX_CENTER_X/Y: cell-center coords of the extreme
    pixels, ties → first in row-major scan order."""
    from gdal_spark.operators.zonal import zonal_minmax_location

    return zonal_minmax_location(
        _zone_tiles_q116(spark, sf_dir), _dem_tiles(spark), tile_size=32
    )


# --- remaining grid algorithms (q119-q120) ---------------------------------


@query(
    "q119_grid_linear_tin",
    """WITH p AS (SELECT n_nationkey AS n,
                       CAST((n_nationkey*37)%101 AS BIGINT) AS x,
                       CAST((n_nationkey*53)%89 AS BIGINT) AS y,
                       CAST((n_nationkey*29)%53 AS DOUBLE) AS z
              FROM nation),
       tri AS (
         SELECT a.n AS na, b.n AS nb, c.n AS nc,
                a.x AS x1, a.y AS y1, a.z AS z1,
                b.x AS x2, b.y AS y2, b.z AS z2,
                c.x AS x3, c.y AS y3, c.z AS z3
         FROM p a JOIN p b ON b.n > a.n JOIN p c ON c.n > b.n
         WHERE (b.x-a.x)*(c.y-a.y) - (b.y-a.y)*(c.x-a.x) <> 0
           AND NOT EXISTS (
             SELECT 1 FROM p d
             WHERE d.n NOT IN (a.n, b.n, c.n)
               AND ((b.x-a.x)*(c.y-a.y) - (b.y-a.y)*(c.x-a.x))
                   * ( (a.x-d.x)*((b.y-d.y)*((c.x-d.x)*(c.x-d.x)+(c.y-d.y)*(c.y-d.y))
                                  - (c.y-d.y)*((b.x-d.x)*(b.x-d.x)+(b.y-d.y)*(b.y-d.y)))
                     - (a.y-d.y)*((b.x-d.x)*((c.x-d.x)*(c.x-d.x)+(c.y-d.y)*(c.y-d.y))
                                  - (c.x-d.x)*((b.x-d.x)*(b.x-d.x)+(b.y-d.y)*(b.y-d.y)))
                     + ((a.x-d.x)*(a.x-d.x)+(a.y-d.y)*(a.y-d.y))
                       * ((b.x-d.x)*(c.y-d.y) - (c.x-d.x)*(b.y-d.y)) ) > 0)),
       cells AS (SELECT i.range AS i, j.range AS j,
                        0 + (i.range + 0.5)*10.0 AS qx,
                        0 + (j.range + 0.5)*10.0 AS qy
                 FROM range(10) i, range(8) j),
       cand AS (
         SELECT i, j, na, nb, nc, l1, l2, 1.0 - l1 - l2 AS l3, z1, z2, z3
         FROM (
           SELECT c.i, c.j, t.na, t.nb, t.nc, t.z1, t.z2, t.z3,
                  ((t.y2-t.y3)*(c.qx-t.x3) + (t.x3-t.x2)*(c.qy-t.y3))
                  / CAST((t.y2-t.y3)*(t.x1-t.x3) + (t.x3-t.x2)*(t.y1-t.y3) AS DOUBLE) AS l1,
                  ((t.y3-t.y1)*(c.qx-t.x3) + (t.x1-t.x3)*(c.qy-t.y3))
                  / CAST((t.y2-t.y3)*(t.x1-t.x3) + (t.x3-t.x2)*(t.y1-t.y3) AS DOUBLE) AS l2
           FROM cells c, tri t)
         WHERE l1 >= 0 AND l2 >= 0 AND 1.0 - l1 - l2 >= 0),
       pick AS (SELECT i, j, l1, l2, l3, z1, z2, z3,
                       row_number() OVER (PARTITION BY i, j
                                          ORDER BY na, nb, nc) AS rnk
                FROM cand)
       SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
              round(l1*z1 + l2*z2 + l3*z3, 6) AS linear_v
       FROM pick WHERE rnk = 1""",
)
def q119(spark, sf_dir):
    """GDALGridLinear: Delaunay TIN + barycentric interpolation.  The
    oracle derives the SAME triangulation from the defining property
    (no point strictly inside a facet's circumcircle, exact integer
    determinants) — fully independent of the engine's construction."""
    from gdal_spark.operators.grid import grid_linear_tin

    rows = [
        (n, float((n * 37) % 101), float((n * 53) % 89), float((n * 29) % 53))
        for n in range(25)
    ]
    return grid_linear_tin(rows, spark, x0=0.0, y0=0.0, cell=10.0, nx=10, ny=8)


@query(
    "q120_grid_idw_quadrant",
    f"""WITH pts AS ({POINTS_SQL}),
       cand AS (
         SELECT doc_id AS pid, pv, i, j,
                px - (-180.0 + (i+0.5)*20.0) AS rx,
                py - (-80.0 + (j+0.5)*20.0) AS ry
         FROM (SELECT doc_id, lon AS px, lat AS py, CAST(v AS DOUBLE) AS pv FROM pts),
              range(18) a(i), range(8) b(j)),
       infr AS (SELECT pid, pv, i, j, rx*rx + ry*ry AS d2,
                       CASE WHEN rx >= 0 THEN 1 ELSE 0 END
                       + CASE WHEN ry >= 0 THEN 2 ELSE 0 END AS quad
                FROM cand WHERE rx*rx + ry*ry <= 225.0),
       rk AS (SELECT *, row_number() OVER (PARTITION BY i, j, quad
                                           ORDER BY d2, pid) AS rnk
              FROM infr),
       sel AS (SELECT * FROM rk WHERE rnk <= 3),
       agg AS (SELECT i, j,
                      SUM(CASE WHEN d2 > 0 THEN pv / d2 ELSE 0 END) AS nom,
                      SUM(CASE WHEN d2 > 0 THEN 1.0 / d2 ELSE 0 END) AS den,
                      SUM(CASE WHEN quad = 0 THEN 1 ELSE 0 END) AS nq0,
                      SUM(CASE WHEN quad = 1 THEN 1 ELSE 0 END) AS nq1,
                      SUM(CASE WHEN quad = 2 THEN 1 ELSE 0 END) AS nq2,
                      SUM(CASE WHEN quad = 3 THEN 1 ELSE 0 END) AS nq3,
                      SUM(CASE WHEN d2 = 0 THEN 1 ELSE 0 END) AS nhit,
                      round(AVG(CASE WHEN d2 = 0 THEN pv END), 6) AS hitval
               FROM sel GROUP BY i, j)
       SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
              CASE WHEN nhit > 0 THEN hitval ELSE round(nom / den, 6) END AS idw
       FROM agg
       WHERE nhit > 0 OR (nq0 >= 1 AND nq1 >= 1 AND nq2 >= 1 AND nq3 >= 1)""",
)
def q120(spark, sf_dir):
    """Per-quadrant IDW-NN (alg/gdalgrid.cpp:351-470): each quadrant
    contributes its 3 nearest in-radius points (tie → smallest id),
    nodes missing a populated quadrant are nodata."""
    from gdal_spark.operators.grid import grid_idw_nn_quadrant

    return grid_idw_nn_quadrant(
        _points(spark, sf_dir), x0=-180.0, y0=-80.0, cell=20.0, nx=18, ny=8,
        radius=15.0, power=2, max_per_quadrant=3, min_per_quadrant=1,
    )


# --- general coordinate transforms (q121-q122) -----------------------------
# OGRCoordinateTransformation (ogr/ogrct.cpp:665,850) without PROJ:
# functions/proj.py implements UTM (Karney Krüger series, n^6) and
# Lambert conformal conic (Snyder 2SP) as JVM-side Column expressions.
# The oracle replays the round-trip contract: forward → inverse must
# return the integer-derived inputs exactly at 6 dp (series error is
# ~1e-13 deg, five orders below the rounding quantum), so the oracle
# is the input formula itself — engine-independent.  Absolute-value
# correctness is pinned separately in tests/test_proj.py against an
# independently integrated meridian arc.


@query(
    "q121_utm_roundtrip",
    """SELECT n_nationkey AS n,
            CAST((n_nationkey*67)%360 AS DOUBLE) - 180.0 + 0.31 AS lon,
            CAST((n_nationkey*41)%160 AS DOUBLE) - 80.0 + 0.17 AS lat,
            CAST(floor((CAST((n_nationkey*67)%360 AS DOUBLE) - 180.0 + 0.31 + 180.0) / 6.0)
                 % 60 + 1 AS INT) AS zone
       FROM nation""",
)
def q121(spark, sf_dir):
    """WGS84 → UTM → WGS84 round trip over all zones/hemispheres; the
    repartition between forward and inverse is the codegen stage split
    (one projection per stage — also the shape a real pipeline has)."""
    from gdal_spark.functions import proj as P

    pts = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n"),
        (((F.col("n_nationkey") * 67) % 360).cast("double") - 180.0 + 0.31).alias("lon0"),
        (((F.col("n_nationkey") * 41) % 160).cast("double") - 80.0 + 0.17).alias("lat0"),
    )
    zone = P.utm_zone(F.col("lon0"))
    e, n = P.lonlat_to_utm(F.col("lon0"), F.col("lat0"), zone)
    fwd = pts.select(
        "n", "lon0", "lat0", zone.alias("zone"), e.alias("e"), n.alias("nn"),
        (F.col("lat0") < 0).alias("south"),
    ).repartition(8)
    lon2, lat2 = P.utm_to_lonlat(F.col("e"), F.col("nn"), F.col("zone"), F.col("south"))
    return fwd.select(
        "n",
        F.round(lon2, 6).alias("lon"),
        F.round(lat2, 6).alias("lat"),
        F.col("zone").cast("int").alias("zone"),
    )


@query(
    "q122_lcc_roundtrip",
    """SELECT n_nationkey AS n,
            CAST((n_nationkey*59)%140 AS DOUBLE) - 125.0 + 0.23 AS lon,
            CAST((n_nationkey*31)%45 AS DOUBLE) + 25.0 + 0.11 AS lat
       FROM nation""",
)
def q122(spark, sf_dir):
    """WGS84 → Lambert conformal conic (CONUS Albers-style parallels
    33/45) → WGS84 round trip."""
    from gdal_spark.functions import proj as P

    pts = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n"),
        (((F.col("n_nationkey") * 59) % 140).cast("double") - 125.0 + 0.23).alias("lon0"),
        (((F.col("n_nationkey") * 31) % 45).cast("double") + 25.0 + 0.11).alias("lat0"),
    )
    x, y = P.lonlat_to_lcc(F.col("lon0"), F.col("lat0"), 33.0, 45.0, 39.0, -96.0)
    fwd = pts.select("n", "lon0", "lat0", x.alias("x"), y.alias("y")).repartition(8)
    lon2, lat2 = P.lcc_to_lonlat(F.col("x"), F.col("y"), 33.0, 45.0, 39.0, -96.0)
    return fwd.select(
        "n", F.round(lon2, 6).alias("lon"), F.round(lat2, 6).alias("lat")
    )


@query(
    "q123_predicates_general",
    f"""WITH {_STAIR_SQL},
       rel AS (SELECT i.a_id, i.b_id, i.s, a.area_a, bb.area_b
               FROM inter i JOIN areas a USING (a_id) JOIN areab bb USING (b_id))
       SELECT a_id, b_id,
              CASE WHEN s = 0 THEN 'disjoint'
                   WHEN s = area_a AND s = area_b THEN 'equals'
                   WHEN s = area_b THEN 'contains'
                   WHEN s = area_a THEN 'within'
                   ELSE 'overlaps' END AS rel
       FROM rel""",
)
def q123(spark, sf_dir):
    """General-polygon binary predicates (concave staircases, general
    position): relation derived from the GH intersection area, oracle
    from the disjoint-rect decomposition."""
    from gdal_spark.functions.st import st_relation_general

    fa, fb = _stair_feats(spark)
    return fa.crossJoin(fb).select(
        "a_id", "b_id",
        st_relation_general(F.col("ga"), F.col("gb")).alias("rel"),
    )


@query(
    "q124_spatial_join_df_cover",
    f"""WITH pts AS ({POINTS_SQL}), rects AS ({RECTS_SQL})
       SELECT p.doc_id, r.zone_id FROM pts p JOIN rects r
       ON p.lon >= r.xmin AND p.lon <= r.xmax
       AND p.lat >= r.ymin AND p.lat <= r.ymax""",
)
def q124(spark, sf_dir):
    """The spatial join with a DATAFRAME polygon side: the cell cover
    is computed distributedly (polygon_cover_df pandas UDF over the
    polygon table — the millions-of-features path), shuffle-hash join
    on cell, exact PIP verify.  Must equal q11's broadcast-list path
    row for row (same oracle)."""
    from gdal_spark.kernels import wkb as Wk

    pts = _points(spark, sf_dir)
    n = _t(spark, sf_dir, "nation").select("n_nationkey")

    def mk(pdf_iter):
        for pdf in pdf_iter:
            rows = []
            for k in pdf["n_nationkey"]:
                k = int(k)
                xmin = float((k * 61) % 300 - 160)
                ymin = float((k * 83) % 140 - 75)
                xmax = xmin + 10 + (k % 7) * 5
                ymax = ymin + 8 + (k % 5) * 4
                ring = np.array(
                    [[xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax],
                     [xmin, ymin]]
                )
                rows.append((k, Wk.polygon_wkb([ring])))
            yield pd.DataFrame(rows, columns=["zone_id", "geom"])

    zones = n.mapInPandas(mk, "zone_id long, geom binary")
    j = spatial_join_points_in_polygons(
        pts, zones, include_boundary=True, poly_id_col="zone_id",
        broadcast_cover=False,
    )
    return j.select("doc_id", "zone_id")


# --- curve / Z / M geometry types (q125-q126) ------------------------------
# ogr/ogr_core.h:422-533 beyond 2D: ISO Z/M/ZM parsing and the curve
# family (CircularString / CurvePolygon), linearized at read like the
# reference's own consumers (alg/gdalrasterize.cpp:571 "linearize
# curves"; ogr/ogrgeometryfactory.cpp curveToLineString).


@query(
    "q125_wkb_zm_stats",
    """WITH d AS (SELECT n_nationkey AS n, 4 + n_nationkey % 5 AS k FROM nation),
       t AS (SELECT n, k, i.range AS i FROM d, range(8) i WHERE i.range < k)
       SELECT n, CAST(max(k) AS BIGINT) AS npts,
              CAST(SUM((n*7 + i*i*3) % 41) AS DOUBLE) AS z_sum,
              CAST(SUM((n*11 + i*13) % 97) AS DOUBLE) AS m_sum
       FROM t GROUP BY n""",
)
def q125(spark, sf_dir):
    """ISO LineString ZM parse: per-nation chains with integer-derived
    Z and M streams; the engine parses real ZM WKB blobs, the oracle
    computes the analytic sums."""
    from gdal_spark.functions.st import st_zm_stats
    from gdal_spark.kernels import wkbext as X

    rows = []
    for r in _t(spark, sf_dir, "nation").select("n_nationkey").collect():
        n = int(r["n_nationkey"])
        k = 4 + n % 5
        i = np.arange(k)
        coords = np.column_stack(
            [i * 10, (n + i) % 7, (n * 7 + i * i * 3) % 41, (n * 11 + i * 13) % 97]
        ).astype(np.float64)
        rows.append((n, X.linestring_zm_wkb(coords, flavor=3)))
    feats = local_df(spark, rows, "n long, geom binary")
    s = feats.select("n", st_zm_stats(F.col("geom")).alias("s"))
    return s.select(
        "n",
        F.element_at("s", 1).cast("long").alias("npts"),
        F.element_at("s", 2).alias("z_sum"),
        F.element_at("s", 3).alias("m_sum"),
    )


@query(
    "q126_curvepolygon_linearize",
    """SELECT n_nationkey AS n,
            CAST(5 AS INT) AS npts,
            CAST(2 * (1 + n_nationkey % 4) * (1 + n_nationkey % 4) AS DOUBLE) AS area
       FROM nation""",
)
def q126(spark, sf_dir):
    """CurvePolygon with a full-circle CircularString ring (radius
    R = 1 + n%4, integer center), linearized at max_angle = 90°: the
    defining points are emitted verbatim, so the result is the exact
    integer diamond with area 2·R² — the oracle's closed form.  Finer
    angles converge to πR² (property-tested in pytest)."""
    from gdal_spark.functions.st import st_area, st_linearize, st_npoints
    from gdal_spark.kernels import wkbext as X

    rows = []
    for r in _t(spark, sf_dir, "nation").select("n_nationkey").collect():
        n = int(r["n_nationkey"])
        cx, cy, R = (n % 5) * 20, (n // 5) * 20, 1 + n % 4
        cs = X.circularstring_wkb(
            np.array(
                [[cx + R, cy], [cx, cy + R], [cx - R, cy], [cx, cy - R], [cx + R, cy]],
                dtype=np.float64,
            )
        )
        rows.append((n, X.curvepolygon_wkb([cs])))
    feats = local_df(spark, rows, "n long, geom binary")
    lin = feats.select(
        "n", st_linearize(F.col("geom"), F.lit(90.0)).alias("g")
    )
    return lin.select(
        "n",
        st_npoints(F.col("g")).alias("npts"),
        F.round(st_area(F.col("g")), 6).alias("area"),
    )


# Shared DuckDB replay of the integer-exact Lloyd k-means in
# operators/similarity.ivf_kmeans (2 iterations, 8 cells, 64 dims):
# init = 8 smallest vec_ids, assignment = argmin L2 (tie low cell),
# update = round-half-up integer mean, empty cells keep their codeword.
_KMEANS_CTE = """
  v AS (SELECT vec_id,
         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*1000 + 0.5) AS BIGINT)) AS qv
        FROM embeddings),
  c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cell, qv AS c
         FROM (SELECT vec_id, qv FROM v ORDER BY vec_id LIMIT 8)),
  d0 AS (SELECT v.vec_id, c0.cell,
          CAST(list_sum(list_transform(list_zip(v.qv, c0.c),
               s -> (s[1]-s[2])*(s[1]-s[2]))) AS BIGINT) AS d2
         FROM v CROSS JOIN c0),
  a0 AS (SELECT vec_id, cell FROM
          (SELECT vec_id, cell,
                  row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
           FROM d0) WHERE rn = 1),
  s0 AS (SELECT a0.cell, d.range AS d,
                SUM(v.qv[CAST(d.range AS INT) + 1]) AS s, COUNT(*) AS n
         FROM a0 JOIN v USING (vec_id) CROSS JOIN range(64) d
         GROUP BY a0.cell, d.range),
  u0 AS (SELECT cell, list(CAST(floor((2.0*s + n) / (2.0*n)) AS BIGINT) ORDER BY d) AS c
         FROM s0 GROUP BY cell),
  c1 AS (SELECT cell, c FROM u0
         UNION ALL
         SELECT cell, c FROM c0 WHERE cell NOT IN (SELECT cell FROM u0)),
  d1 AS (SELECT v.vec_id, c1.cell,
          CAST(list_sum(list_transform(list_zip(v.qv, c1.c),
               s -> (s[1]-s[2])*(s[1]-s[2]))) AS BIGINT) AS d2
         FROM v CROSS JOIN c1),
  a1 AS (SELECT vec_id, cell FROM
          (SELECT vec_id, cell,
                  row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
           FROM d1) WHERE rn = 1),
  s1 AS (SELECT a1.cell, d.range AS d,
                SUM(v.qv[CAST(d.range AS INT) + 1]) AS s, COUNT(*) AS n
         FROM a1 JOIN v USING (vec_id) CROSS JOIN range(64) d
         GROUP BY a1.cell, d.range),
  u1 AS (SELECT cell, list(CAST(floor((2.0*s + n) / (2.0*n)) AS BIGINT) ORDER BY d) AS c
         FROM s1 GROUP BY cell),
  c2 AS (SELECT cell, c FROM u1
         UNION ALL
         SELECT cell, c FROM c1 WHERE cell NOT IN (SELECT cell FROM u1)),
  d2f AS (SELECT v.vec_id, c2.cell,
           CAST(list_sum(list_transform(list_zip(v.qv, c2.c),
                s -> (s[1]-s[2])*(s[1]-s[2]))) AS BIGINT) AS d2
          FROM v CROSS JOIN c2),
  a2 AS (SELECT vec_id, cell, d2 FROM
          (SELECT vec_id, cell, d2,
                  row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
           FROM d2f) WHERE rn = 1)
"""


@query(
    "q127_ivf_kmeans",
    "WITH " + _KMEANS_CTE + """
       SELECT a2.cell, CAST(COUNT(*) AS BIGINT) AS n_members,
              CAST(SUM(a2.d2) AS BIGINT) AS inertia,
              CAST(list_sum(c2.c) AS BIGINT) AS centroid_sum
       FROM a2 JOIN c2 USING (cell)
       GROUP BY a2.cell, c2.c""",
)
def q127(spark, sf_dir):
    """Trained IVF coarse quantizer: integer-exact Lloyd k-means over
    the embeddings table (FAISS-style IVF training; closes round 1's
    "formula centroids" gap).  Per final cell: member count, inertia
    (sum of squared distances), codeword checksum.  Assignment is an
    Arrow-batched map-side UDF vs the broadcast codebook; the update is
    a map-side-combinable groupBy(cell, dim) SUM — only k*dim ints ever
    reach the driver."""
    from gdal_spark.operators.similarity import ivf_kmeans

    assigned, cent = ivf_kmeans(_t(spark, sf_dir, "embeddings"))
    csum = F.element_at(
        F.array(*[F.lit(int(sum(c))) for c in cent]), F.col("cell").cast("int") + 1
    )
    return (
        assigned.groupBy("cell")
        .agg(F.count("*").alias("n_members"), F.sum("d2").alias("inertia"))
        .withColumn("centroid_sum", csum)
    )


@query(
    "q128_ann_ivf_trained",
    "WITH " + _KMEANS_CTE + """,
       probes AS (SELECT vec_id AS qid, cell FROM
                   (SELECT vec_id, cell,
                           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
                    FROM d2f WHERE vec_id < 10) WHERE rn <= 2),
       cand AS (SELECT p.qid, a.vec_id FROM probes p JOIN a2 a USING (cell)
                WHERE a.vec_id <> p.qid),
       scored AS (SELECT c.qid, c.vec_id,
                   CAST(list_sum(list_transform(list_zip(vq.qv, vv.qv),
                        s -> s[1]*s[2])) AS BIGINT) AS score
                  FROM cand c JOIN v vq ON vq.vec_id = c.qid
                              JOIN v vv ON vv.vec_id = c.vec_id),
       r AS (SELECT qid, vec_id, score,
              row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS ivf_rank
             FROM scored)
       SELECT qid, vec_id, CAST(ivf_rank AS INT) AS ivf_rank, score
       FROM r WHERE ivf_rank <= 5""",
)
def q128(spark, sf_dir):
    """ANN over the LEARNED codebook: probe the 2 nearest trained
    cells per query (distance asc, tie low cell), exact-score only
    those inverted lists — the q32 equi-join scale shape with k-means
    centroids instead of the fixed formula."""
    from gdal_spark.operators.similarity import ann_ivf_trained

    return ann_ivf_trained(_t(spark, sf_dir, "embeddings"))


@query(
    "q129_resize_images",
    """WITH d AS (SELECT doc_id,
         CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) AS h8
        FROM documents),
      dims AS (SELECT doc_id, h8, 16 + h8 % 64 AS w, 16 + (h8 // 64) % 64 AS h FROM d),
      px AS (SELECT doc_id,
              (h8 + 31*(((2*i.range + 1) * h) // 32) + 17*(((2*j.range + 1) * w) // 32)) % 251 AS p
             FROM dims CROSS JOIN range(16) i CROSS JOIN range(16) j)
      SELECT doc_id, CAST(16 AS BIGINT) AS out_w, CAST(16 AS BIGINT) AS out_h,
             CAST(sum(p) AS BIGINT) AS pix_sum,
             CAST(min(p) AS BIGINT) AS pix_min,
             CAST(max(p) AS BIGINT) AS pix_max
      FROM px GROUP BY doc_id""",
)
def q129(spark, sf_dir):
    """Multimodal resize plumbing: deterministic fake decode →
    nearest-neighbour 16×16 resize with GDAL's half-pixel source rule
    (src = floor((i+0.5)·size/out)) → per-image pixel aggregates, all
    inside one mapInPandas pass (the PIL-backed path swaps only the
    decode line)."""
    from gdal_spark.operators.multimodal import resize_images

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("content")
    )
    return resize_images(d)


@query(
    "q130_video_frames",
    """WITH d AS (SELECT doc_id,
         CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) AS h8
        FROM documents),
      n AS (SELECT doc_id, h8, 8 + h8 % 120 AS n_frames FROM d),
      f AS (SELECT doc_id, CAST(g.range AS BIGINT) AS frame_idx,
                   (h8 + 97*g.range) % 256 AS luma_int
            FROM n CROSS JOIN range(128) g
            WHERE g.range < n_frames AND g.range % 16 = 0)
      SELECT doc_id, frame_idx, CAST(luma_int AS BIGINT) AS luma_int FROM f""",
)
def q130(spark, sf_dir):
    """Video frame-sampling plumbing: one row per every-16th frame of
    the fake-decoded stream, exploded inside mapInPandas (the ffmpeg
    shape: decode a container, emit selected frames, no shuffle)."""
    from gdal_spark.operators.multimodal import sample_video_frames

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("content")
    )
    return sample_video_frames(d)


@query(
    "q131_fillnodata_idw",
    """WITH ks AS (SELECT n_nationkey AS k FROM nation),
       p AS (SELECT k, (k%6)*20+2 AS x0, (k//6)*12+2 AS y0 FROM ks),
       cells AS (
         SELECT k, x0 + i.range AS gx, y0 + j.range AS gy,
                CAST(CASE WHEN i.range < 6 THEN k+1 ELSE k+31 END AS DOUBLE) AS v
         FROM p, range(12) i, range(6) j),
       hole AS (
         SELECT k, x0 + 4 + i.range AS gx, y0 + 2 + j.range AS gy
         FROM p, range(4) i, range(3) j),
       valid AS (SELECT c.* FROM cells c ANTI JOIN hole h USING (k, gx, gy)),
       dirs AS (SELECT * FROM (VALUES (0, 1, 0), (1, -1, 0), (2, 0, 1), (3, 0, -1),
                                      (4, 1, 1), (5, -1, 1), (6, 1, -1), (7, -1, -1))
                AS t(i, dx, dy)),
       walk AS (
         SELECT h.k, h.gx, h.gy, d.i, d.dx, d.dy, kk.range AS kk, v.v,
                row_number() OVER (PARTITION BY h.k, h.gx, h.gy, d.i
                                   ORDER BY kk.range) AS rn
         FROM hole h CROSS JOIN dirs d CROSS JOIN range(1, 5) kk
         JOIN valid v ON v.k = h.k AND v.gx = h.gx + kk.range*d.dx
                     AND v.gy = h.gy + kk.range*d.dy),
       fst AS (SELECT k, gx, gy, i, v,
                      (dx*dx + dy*dy)*kk*kk AS dd2
               FROM walk WHERE rn = 1),
       piv AS (SELECT k, gx, gy,
                 max(CASE WHEN i=0 THEN v/dd2 END) AS t0, max(CASE WHEN i=0 THEN 1.0/dd2 END) AS w0,
                 max(CASE WHEN i=1 THEN v/dd2 END) AS t1, max(CASE WHEN i=1 THEN 1.0/dd2 END) AS w1,
                 max(CASE WHEN i=2 THEN v/dd2 END) AS t2, max(CASE WHEN i=2 THEN 1.0/dd2 END) AS w2,
                 max(CASE WHEN i=3 THEN v/dd2 END) AS t3, max(CASE WHEN i=3 THEN 1.0/dd2 END) AS w3,
                 max(CASE WHEN i=4 THEN v/dd2 END) AS t4, max(CASE WHEN i=4 THEN 1.0/dd2 END) AS w4,
                 max(CASE WHEN i=5 THEN v/dd2 END) AS t5, max(CASE WHEN i=5 THEN 1.0/dd2 END) AS w5,
                 max(CASE WHEN i=6 THEN v/dd2 END) AS t6, max(CASE WHEN i=6 THEN 1.0/dd2 END) AS w6,
                 max(CASE WHEN i=7 THEN v/dd2 END) AS t7, max(CASE WHEN i=7 THEN 1.0/dd2 END) AS w7
               FROM fst GROUP BY k, gx, gy),
       filled AS (
         SELECT gx, gy,
                round((coalesce(t0,0)+coalesce(t1,0)+coalesce(t2,0)+coalesce(t3,0)
                      +coalesce(t4,0)+coalesce(t5,0)+coalesce(t6,0)+coalesce(t7,0))
                     /(coalesce(w0,0)+coalesce(w1,0)+coalesce(w2,0)+coalesce(w3,0)
                      +coalesce(w4,0)+coalesce(w5,0)+coalesce(w6,0)+coalesce(w7,0)), 6) AS v
         FROM piv)
       SELECT gx, gy, round(v, 6) AS v FROM valid
       UNION ALL SELECT gx, gy, v FROM filled""",
)
def q131(spark, sf_dir):
    """GDALFillNodata's DEFAULT directional-IDW interpolation
    (alg/fillnodata.cpp): 8-direction nearest-valid walk, 1/d²
    weights, left-associated accumulation pinned to the same direction
    order on both engines (bitwise-equal doubles) — closes NOTES gap
    #3 (round-1 shipped only the nearest-valid variant, q91)."""
    from gdal_spark.operators.focal import fillnodata_idw_tiles

    feats = local_df(spark, _q91_rows(spark, sf_dir), "burn double, geom binary")
    tiles = rasterize_wkb_grid(feats, IDENTITY_GT, 128, 128, tile_size=32)
    out = fillnodata_idw_tiles(tiles, tile_size=32, width=128, height=128, max_dist=4)
    return out.filter(F.col("v") != 999.0).select(
        "gx", "gy", F.round(F.col("v"), 6).alias("v")
    )


@query(
    "q132_buffer",
    """WITH ks AS (SELECT n_nationkey AS k FROM nation),
       dims AS (SELECT k, 10 + (k%7)*5 AS w, 8 + (k%5)*4 AS h FROM ks),
       s AS (SELECT * FROM (VALUES ('square'), ('diamond')) AS t(style))
       SELECT k AS fid, style,
              CAST(CASE WHEN style = 'square' THEN (w + 4) * (h + 4)
                   ELSE w*h + 2*(w + h)*2 + 8 END AS DOUBLE) AS area,
              CAST(CASE WHEN style = 'square' THEN 5 ELSE 9 END AS INT) AS npts
       FROM dims CROSS JOIN s""",
)
def q132(spark, sf_dir):
    """GEOS-free Buffer (OGRGeometry::Buffer surface,
    ogr/ogrgeometry.cpp:4949): convex Minkowski sum with a Chebyshev
    square / Manhattan diamond disc at dist=2 over the rect fixtures —
    closed-form areas A + P·d + K_area and exact vertex counts; the
    round (32-gon) style is property-tested in pytest (area → A + P·d
    + πd² as quadsegs grows)."""
    from gdal_spark.functions.st import st_area, st_buffer, st_npoints

    rows = [(int(pid), blob) for pid, blob in _rects(spark, sf_dir)]
    layer = local_df(spark, rows, "fid long, geom binary")
    both = layer.withColumn(
        "style", F.explode(F.array(F.lit("square"), F.lit("diamond")))
    )
    buf = both.withColumn(
        "bg", st_buffer(F.col("geom"), F.lit(2.0), F.col("style"))
    )
    return buf.select(
        "fid", "style",
        F.round(st_area(F.col("bg")), 6).alias("area"),
        st_npoints(F.col("bg")).alias("npts"),
    )


@query(
    "q133_extract_text",
    """WITH esc AS (
         SELECT doc_id,
                replace(replace(replace(replace(replace(text,
                    '&', '&amp;'), '<', '&lt;'), '>', '&gt;'),
                    '"', '&quot;'), '''', '&#39;') AS e
         FROM documents WHERE doc_id % 7 = 0),
       h AS (SELECT doc_id,
                    '<html><head><meta charset="utf-8"></head>'
                    || '<body class="c7"><p>' || e || '</p></body></html>' AS html
             FROM esc),
       strip AS (SELECT doc_id, regexp_replace(html, '<[^>]*>', '', 'g') AS s
                 FROM h)
       SELECT doc_id,
              replace(replace(replace(replace(replace(s,
                  '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                  '&#39;', ''''), '&amp;', '&') AS text_extracted,
              length(replace(replace(replace(replace(replace(s,
                  '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                  '&#39;', ''''), '&amp;', '&')) AS n_chars_extracted
       FROM strip""",
)
def q133(spark, sf_dir):
    """HTML -> text extraction with the pinned spec (tag strip + pinned
    five-entity unescape, amp last) — the north rule's byte-identical-
    text-per-url invariant, exercised as an oracle query: both engines
    build the same escaped HTML wrapper around ``documents.text``, the
    engine extracts with the vectorized pandas UDF
    (functions/html.py), the oracle replays the spec in SQL; values
    match iff extraction is byte-exact (escape -> extract roundtrips to
    the original text).  Reference surface: the simple tag-stripping
    text accessors (the reference reads "extracted text" fields from
    its sources; CPLUnescapeString(..., CPLES_XML), port/cpl_string.cpp)."""
    from gdal_spark.functions.html import extract_text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") % 7 == 0
    )
    esc = docs.withColumn(
        "e",
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(
                        F.regexp_replace(F.col("text"), "&", "&amp;"),
                        "<", "&lt;"),
                    ">", "&gt;"),
                '"', "&quot;"),
            "'", "&#39;"),
    )
    html = esc.withColumn(
        "html",
        F.concat(
            F.lit('<html><head><meta charset="utf-8"></head><body class="c7"><p>'),
            F.col("e"),
            F.lit("</p></body></html>"),
        ).cast("binary"),
    )
    out = html.withColumn("text_extracted", extract_text(F.col("html")))
    return out.select(
        "doc_id",
        "text_extracted",
        F.length("text_extracted").alias("n_chars_extracted"),
    )


@query(
    "q134_pansharpen",
    """WITH c AS (SELECT count(*) AS n FROM nation),
       g AS (SELECT x.range AS gx, y.range AS gy FROM range(16) x, range(16) y),
       v AS (SELECT gx, gy,
               CAST(4*c.n + 3*gx + 5*gy AS DOUBLE) AS pan,
               CAST(1 + 0 + 2*(gx//2) + (gy//2) AS DOUBLE) AS ms0,
               CAST(1 + 1 + 2*(gx//2) + (gy//2) AS DOUBLE) AS ms1,
               CAST(1 + 2 + 2*(gx//2) + (gy//2) AS DOUBLE) AS ms2
             FROM g, c),
       f AS (SELECT gx, gy, ms0, ms1, ms2,
                    pan/(0.25*ms0 + 0.5*ms1 + 0.25*ms2) AS factor
             FROM v)
       SELECT gx, gy, band,
              round(CASE band WHEN 0 THEN ms0*factor
                              WHEN 1 THEN ms1*factor
                              ELSE ms2*factor END, 6) AS val
       FROM f, (VALUES (0), (1), (2)) b(band)""",
)
def q134(spark, sf_dir):
    """Weighted-Brovey pan-sharpening
    (GDALPansharpenOperation::WeightedBrovey3,
    alg/gdalpansharpen.cpp:588-620): 2x2 pan tiles (16x16 px, values
    4N + 3X + 5Y anchored on the nation count) sharpened by one
    3-band parent MS tile (nearest upsample, dz=1), weights
    (1/4, 1/2, 1/4) — dyadic, so pseudo_pan is exact and the single
    division is the only rounding site, identical on both engines."""
    from gdal_spark.operators.pansharpen import pansharpen_tiles

    n = _t(spark, sf_dir, "nation").count()
    ts = 8
    pan_rows = []
    for tx in range(2):
        for ty in range(2):
            xs = np.arange(ts, dtype=np.float64) + tx * ts
            ys = np.arange(ts, dtype=np.float64) + ty * ts
            arr = 4.0 * n + 3.0 * xs[None, :] + 5.0 * ys[:, None]
            pan_rows.append((tx, ty, arr.tobytes()))
    ms_rows = []
    for b in range(3):
        x = np.arange(ts, dtype=np.float64)
        y = np.arange(ts, dtype=np.float64)
        arr = 1.0 + b + 2.0 * x[None, :] + y[:, None]
        ms_rows.append((0, 0, b, arr.tobytes()))
    pan = local_df(spark, pan_rows, "tx long, ty long, data binary")
    ms = local_df(spark, ms_rows, "tx long, ty long, band int, data binary")
    sharp = pansharpen_tiles(pan, ms, [0.25, 0.5, 0.25], dz=1, tile_size=ts)

    out_schema = "gx long, gy long, band int, val double"

    def unpack(it):
        for pdf in it:
            for r in pdf.itertuples(index=False):
                arr = np.frombuffer(r.data, dtype=np.float64).reshape(ts, ts)
                ys, xs = np.indices((ts, ts))
                yield pd.DataFrame(
                    {
                        "gx": (xs + int(r.tx) * ts).ravel(),
                        "gy": (ys + int(r.ty) * ts).ravel(),
                        "band": int(r.band),
                        "val": arr.ravel(),
                    }
                )

    return sharp.mapInPandas(unpack, out_schema).select(
        "gx", "gy", "band", F.round(F.col("val"), 6).alias("val")
    )


@query(
    "q135_warp_cutline",
    f"""{Q25_PIX_SQL},
       w AS (SELECT gx//2 AS gx, gy//2 AS gy, v FROM rast
             WHERE gx%2 = 1 AND gy%2 = 1)
       SELECT gx, gy, v FROM w
       WHERE (gy >= 2 AND gy < 18 AND gx >= 2 AND gx < 44)
          OR (gy >= 18 AND gy < 44 AND gx >= 2 AND gx < 22)""",
)
def q135(spark, sf_dir):
    """gdalwarp -cutline (GDALWarpCutlineMaskerEx,
    alg/gdalwarper.cpp:1447-1628): the q65 nearest warp masked by a
    concave L-shaped cutline polygon rasterized per destination tile
    with the exact scanline pixel-center rule — outside pixels take
    the fill and drop out of the feature view; the oracle applies the
    L-shape's half-open pixel ranges analytically."""
    from gdal_spark.operators.cutline import warp_cutline

    ring = np.array(
        [[4, 4], [88, 4], [88, 36], [44, 36], [44, 88], [4, 88], [4, 4]],
        dtype=np.float64,
    )
    src = _q25_tiles(spark, sf_dir)
    out = warp_cutline(
        src, IDENTITY_GT, (0.0, 2.0, 0.0, 0.0, 0.0, 2.0), 64, 64,
        cutline_wkb=W.polygon_wkb([ring]), tile_size=32, method="nearest",
    )
    return tiles_to_features(out, tile_size=32, nodata=0.0)


@query(
    "q136_polyhedral_surface",
    """SELECT n_nationkey AS fid,
              CAST(6 * (1 + n_nationkey % 5) * (1 + n_nationkey % 5) AS DOUBLE)
                  AS ps_area,
              6 AS ps_npatches, 30 AS ps_npts,
              CAST(6 * (1 + n_nationkey % 5) * (1 + n_nationkey % 5) AS DOUBLE)
                  AS tin_area,
              12 AS tin_npatches, 48 AS tin_npts
       FROM nation""",
)
def q136(spark, sf_dir):
    """PolyhedralSurface Z and TIN Z types (ogr_core.h:441-447,
    OGRPolyhedralSurface::get_Area summing patch areas,
    ogr/ogrpolyhedralsurface.cpp): axis-aligned unit-side-s cubes as a
    6-face surface and the same cubes as a 12-triangle TIN; 3D planar
    patch areas via the cross-product norm are exact integers, so the
    closed form 6s^2 oracles both representations."""
    import pandas as pd
    from gdal_spark.kernels import wkbext as X

    rows = []
    for r in _t(spark, sf_dir, "nation").select("n_nationkey").collect():
        k = int(r[0])
        s = float(1 + k % 5)
        ox, oy, oz = float(k), float(k % 7), 0.0

        def sq(p0, p1, p2, p3):
            return np.array([p0, p1, p2, p3, p0], dtype=np.float64)

        a = (ox, oy, oz); b = (ox + s, oy, oz)
        c = (ox + s, oy + s, oz); d = (ox, oy + s, oz)
        e = (ox, oy, oz + s); f = (ox + s, oy, oz + s)
        g = (ox + s, oy + s, oz + s); h = (ox, oy + s, oz + s)
        faces = [sq(a, b, c, d), sq(e, f, g, h), sq(a, b, f, e),
                 sq(d, c, g, h), sq(a, d, h, e), sq(b, c, g, f)]
        ps = X.polyhedralsurface_wkb([X.polygon_z_wkb([fc]) for fc in faces])
        tris = []
        for fc in faces:
            tris.append(X.polygon_z_wkb(
                [np.array([fc[0], fc[1], fc[2], fc[0]])], base=X.TRIANGLE))
            tris.append(X.polygon_z_wkb(
                [np.array([fc[0], fc[2], fc[3], fc[0]])], base=X.TRIANGLE))
        tin = X.polyhedralsurface_wkb(tris, tin=True)
        rows.append((k, ps, tin))
    layer = local_df(spark, rows, "fid long, ps binary, tin binary")

    @F.pandas_udf("ps_area double, ps_npatches int, ps_npts int, "
                  "tin_area double, tin_npatches int, tin_npts int")
    def stats(ps: pd.Series, tin: pd.Series) -> pd.DataFrame:
        from gdal_spark.kernels import wkbext as XX

        out = []
        for pb, tb in zip(ps, tin):
            pn, pp, pa = XX.surface_stats(bytes(pb))
            tn, tp, ta = XX.surface_stats(bytes(tb))
            out.append((pa, pn, pp, ta, tn, tp))
        return pd.DataFrame(
            out, columns=["ps_area", "ps_npatches", "ps_npts",
                          "tin_area", "tin_npatches", "tin_npts"])

    res = layer.withColumn("_s", stats(F.col("ps"), F.col("tin")))
    return res.select(
        "fid", "_s.ps_area", "_s.ps_npatches", "_s.ps_npts",
        "_s.tin_area", "_s.tin_npatches", "_s.tin_npts",
    )


@query(
    "q137_overlay_shared_edge",
    """SELECT n_nationkey AS fid,
              round(CAST((3 + n_nationkey % 9) * (2 + n_nationkey % 7)
                    + (2 + n_nationkey % 5) * (2 + n_nationkey % 6) AS DOUBLE), 6)
                  AS a_union,
              CAST(0.0 AS DOUBLE) AS a_inter,
              round(CAST((3 + n_nationkey % 9) * (2 + n_nationkey % 7) AS DOUBLE), 6)
                  AS a_diff
       FROM nation""",
)
def q137(spark, sf_dir):
    """Degenerate (shared-edge) general overlay — the GH kernel's
    robustness path (kernels/clipgen.py clip_area_robust): rect B
    shares rect A's full right edge, violating general position the
    way real dissolved/tiled layers always do; the deterministic
    2^-34 micro-perturbation resolves it and the 1e-6 rounding
    recovers the exact closed forms (union = |A|+|B|, inter = 0,
    diff = |A|).  Reference: GEOS noding gives the reference this for
    free (ogrlayer.cpp:5385+ overlay ops never reject shared edges)."""
    import pandas as pd

    rows = []
    for r in _t(spark, sf_dir, "nation").select("n_nationkey").collect():
        k = int(r[0])
        x0, y0 = float(k % 11), float(k % 13)
        w, h = float(3 + k % 9), float(2 + k % 7)
        w2, h2 = float(2 + k % 5), float(2 + k % 6)
        A = np.array([[x0, y0], [x0 + w, y0], [x0 + w, y0 + h],
                      [x0, y0 + h], [x0, y0]])
        B = np.array([[x0 + w, y0], [x0 + w + w2, y0],
                      [x0 + w + w2, y0 + h2], [x0 + w, y0 + h2],
                      [x0 + w, y0]])
        rows.append((k, A.tobytes(), B.tobytes()))
    layer = local_df(spark, rows, "fid long, a binary, b binary")

    @F.pandas_udf("a_union double, a_inter double, a_diff double")
    def ovl(a: pd.Series, b: pd.Series) -> pd.DataFrame:
        from gdal_spark.kernels.clipgen import clip_area_robust

        out = []
        for ab, bb in zip(a, b):
            P = np.frombuffer(ab, dtype=np.float64).reshape(-1, 2)
            Q = np.frombuffer(bb, dtype=np.float64).reshape(-1, 2)
            out.append((
                round(clip_area_robust(P, Q, "union"), 6),
                round(clip_area_robust(P, Q, "intersection"), 6),
                round(clip_area_robust(P, Q, "difference"), 6),
            ))
        return pd.DataFrame(out, columns=["a_union", "a_inter", "a_diff"])

    res = layer.withColumn("_o", ovl(F.col("a"), F.col("b")))
    return res.select("fid", "_o.a_union", "_o.a_inter", "_o.a_diff")


def _pq_cte(p: str, lo: int, hi: int, k: int, dims: int) -> str:
    """Parameterized DuckDB replay of the integer-exact Lloyd k-means
    (same pinned rules as _KMEANS_CTE) over a sub-slice of qv —
    one block per PQ subspace, CTE names prefixed with ``p``."""
    return f"""
  {p}v AS (SELECT vec_id, qv[{lo}:{hi}] AS qv FROM v),
  {p}c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cell, qv AS c
         FROM (SELECT vec_id, qv FROM {p}v ORDER BY vec_id LIMIT {k})),
  {p}d0 AS (SELECT {p}v.vec_id, {p}c0.cell,
          CAST(list_sum(list_transform(list_zip({p}v.qv, {p}c0.c),
               s -> (s[1]-s[2])*(s[1]-s[2]))) AS BIGINT) AS d2
         FROM {p}v CROSS JOIN {p}c0),
  {p}a0 AS (SELECT vec_id, cell FROM
          (SELECT vec_id, cell,
                  row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
           FROM {p}d0) WHERE rn = 1),
  {p}s0 AS (SELECT {p}a0.cell, d.range AS d,
                SUM({p}v.qv[CAST(d.range AS INT) + 1]) AS s, COUNT(*) AS n
         FROM {p}a0 JOIN {p}v USING (vec_id) CROSS JOIN range({dims}) d
         GROUP BY {p}a0.cell, d.range),
  {p}u0 AS (SELECT cell, list(CAST(floor((2.0*s + n) / (2.0*n)) AS BIGINT) ORDER BY d) AS c
         FROM {p}s0 GROUP BY cell),
  {p}c1 AS (SELECT cell, c FROM {p}u0
         UNION ALL
         SELECT cell, c FROM {p}c0 WHERE cell NOT IN (SELECT cell FROM {p}u0)),
  {p}d1 AS (SELECT {p}v.vec_id, {p}c1.cell,
          CAST(list_sum(list_transform(list_zip({p}v.qv, {p}c1.c),
               s -> (s[1]-s[2])*(s[1]-s[2]))) AS BIGINT) AS d2
         FROM {p}v CROSS JOIN {p}c1),
  {p}a1 AS (SELECT vec_id, cell FROM
          (SELECT vec_id, cell,
                  row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
           FROM {p}d1) WHERE rn = 1),
  {p}s1 AS (SELECT {p}a1.cell, d.range AS d,
                SUM({p}v.qv[CAST(d.range AS INT) + 1]) AS s, COUNT(*) AS n
         FROM {p}a1 JOIN {p}v USING (vec_id) CROSS JOIN range({dims}) d
         GROUP BY {p}a1.cell, d.range),
  {p}u1 AS (SELECT cell, list(CAST(floor((2.0*s + n) / (2.0*n)) AS BIGINT) ORDER BY d) AS c
         FROM {p}s1 GROUP BY cell),
  {p}c2 AS (SELECT cell, c FROM {p}u1
         UNION ALL
         SELECT cell, c FROM {p}c1 WHERE cell NOT IN (SELECT cell FROM {p}u1)),
  {p}d2f AS (SELECT {p}v.vec_id, {p}c2.cell,
           CAST(list_sum(list_transform(list_zip({p}v.qv, {p}c2.c),
                s -> (s[1]-s[2])*(s[1]-s[2]))) AS BIGINT) AS d2
          FROM {p}v CROSS JOIN {p}c2),
  {p}a2 AS (SELECT vec_id, cell, d2 FROM
          (SELECT vec_id, cell, d2,
                  row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
           FROM {p}d2f) WHERE rn = 1),
  {p}q AS (SELECT qv FROM {p}v ORDER BY vec_id LIMIT 1),
  {p}adc AS (SELECT c.cell,
           CAST(list_sum(list_transform(list_zip(q.qv, c.c),
                s -> (s[1]-s[2])*(s[1]-s[2]))) AS BIGINT) AS d2
          FROM {p}c2 c, {p}q q)"""


@query(
    "q138_pq_encode",
    """WITH v AS (SELECT vec_id,
         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*1000 + 0.5) AS BIGINT)) AS qv
        FROM embeddings),"""
    + _pq_cte("p0", 1, 32, 4, 32) + ","
    + _pq_cte("p1", 33, 64, 4, 32) + """
       SELECT a.vec_id, a.cell AS code0, b.cell AS code1,
              CAST(a.d2 + b.d2 AS BIGINT) AS recon_err,
              CAST(x.d2 + y.d2 AS BIGINT) AS adc_d2
       FROM p0a2 a
       JOIN p1a2 b USING (vec_id)
       JOIN p0adc x ON x.cell = a.cell
       JOIN p1adc y ON y.cell = b.cell""",
)
def q138(spark, sf_dir):
    """Product quantization over the embeddings table (Jégou et al.
    2011 / FAISS IndexPQ; the PQ stage a 100-TB embedding store
    compresses through): 2 subspaces x 4 codewords trained with the
    pinned integer-exact Lloyd rules, every vector encoded to 2 codes,
    plus the ADC squared distance to the smallest-id vector via the
    m x k lookup tables.  The oracle replays BOTH subspace trainings,
    the encoding argmins, and the ADC tables in SQL."""
    from gdal_spark.operators.similarity import pq_adc_distances, pq_encode

    emb = _t(spark, sf_dir, "embeddings")
    codes, books = pq_encode(emb, m=2, k_sub=4, n_iter=2, dim=64)

    qrow = emb.orderBy("vec_id").limit(1).collect()[0]
    qv = np.floor(np.asarray(qrow["embedding"], dtype=np.float64) * 1000.0 + 0.5
                  ).astype(np.int64)
    out = pq_adc_distances(codes, books, [qv[:32].tolist(), qv[32:].tolist()])
    return out.select(
        "vec_id", "code0", "code1",
        (F.col("qerr0") + F.col("qerr1")).cast("long").alias("recon_err"),
        F.col("adc_d2").cast("long").alias("adc_d2"),
    )


@query(
    "q139_ann_recall",
    "WITH " + _KMEANS_CTE + """,
       probes AS (SELECT vec_id AS qid, cell FROM
                   (SELECT vec_id, cell,
                           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
                    FROM d2f WHERE vec_id < 10) WHERE rn <= 2),
       cand AS (SELECT p.qid, a.vec_id FROM probes p JOIN a2 a USING (cell)
                WHERE a.vec_id <> p.qid),
       scored AS (SELECT c.qid, c.vec_id,
                   CAST(list_sum(list_transform(list_zip(vq.qv, vv.qv),
                        s -> s[1]*s[2])) AS BIGINT) AS score
                  FROM cand c JOIN v vq ON vq.vec_id = c.qid
                              JOIN v vv ON vv.vec_id = c.vec_id),
       ivf5 AS (SELECT qid, vec_id FROM
                 (SELECT qid, vec_id,
                         row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
                  FROM scored) WHERE rn <= 5),
       ex AS (SELECT vq.vec_id AS qid, vv.vec_id,
               CAST(list_sum(list_transform(list_zip(vq.qv, vv.qv),
                    s -> s[1]*s[2])) AS BIGINT) AS score
              FROM v vq JOIN v vv ON vv.vec_id <> vq.vec_id
              WHERE vq.vec_id < 10),
       exact5 AS (SELECT qid, vec_id FROM
                   (SELECT qid, vec_id,
                           row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
                    FROM ex) WHERE rn <= 5)
       SELECT e.qid, CAST(count(i.vec_id) AS BIGINT) AS hits,
              CAST(count(i.vec_id) AS DOUBLE) / 5.0 AS recall_at_5
       FROM exact5 e LEFT JOIN ivf5 i
         ON i.qid = e.qid AND i.vec_id = e.vec_id
       GROUP BY e.qid""",
)
def q139(spark, sf_dir):
    """ANN quality measurement: recall@5 of the trained-IVF search
    (2-probe) against the brute-force exact top-5 on the SAME integer
    dot-product score — the metric a 100-TB ANN deployment tunes
    n_probe by.  Both sides and the intersection are replayed in SQL;
    exact search is the small-query-set broadcast crossJoin (the q23
    shape), IVF the q128 inverted-list equi-join."""
    from gdal_spark.operators.similarity import ann_ivf_trained, ivf_kmeans

    emb = _t(spark, sf_dir, "embeddings")
    trained = ivf_kmeans(emb)
    ivf5 = ann_ivf_trained(emb, k=5, trained=trained).select("qid", "vec_id")

    assigned = trained[0].select("vec_id", "qv").localCheckpoint()
    qs = assigned.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("qv").alias("qqv")
    )
    pairs = F.broadcast(qs).crossJoin(assigned).filter(
        F.col("vec_id") != F.col("qid")
    )
    score = F.aggregate(
        F.zip_with("qqv", "qv", lambda x, y: x * y), F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    exact5 = (
        pairs.withColumn("score", score)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("qid", "vec_id")
    )
    hit = ivf5.withColumn("_hit", F.lit(1))
    joined = exact5.join(hit, ["qid", "vec_id"], "left")
    return joined.groupBy("qid").agg(
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias("hits"),
    ).withColumn("recall_at_5", F.col("hits").cast("double") / 5.0)


@query(
    "q140_audio_frames",
    """WITH d AS (SELECT doc_id, text,
         CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) AS h8
        FROM documents),
       dims AS (SELECT doc_id, h8, 256 + h8 % 512 AS n FROM d),
       s AS (SELECT doc_id, n, i.range AS i, i.range // 64 AS f,
                    (h8 + 37 * i.range) % 201 - 100 AS v
             FROM dims CROSS JOIN range(768) i
             WHERE i.range < (n // 64) * 64),
       fe AS (SELECT doc_id, n, f, CAST(sum(v * v) AS BIGINT) AS e
              FROM s GROUP BY doc_id, n, f)
       SELECT doc_id, CAST(n AS BIGINT) AS n_samples,
              CAST(n // 64 AS BIGINT) AS n_frames,
              CAST(sum(e) AS BIGINT) AS total_energy,
              CAST(max(e) AS BIGINT) AS max_frame_energy
       FROM fe GROUP BY doc_id, n""",
)
def q140(spark, sf_dir):
    """Audio-modality plumbing: deterministic fake decode → 64-sample
    frame energies over one mapInPandas pass (operators/multimodal.py
    audio_frame_energy; the real soundfile/ffmpeg decode gates at the
    same seam as image/video).  Integer samples make every energy
    exact; the oracle replays decode, framing, and the energy sums."""
    from gdal_spark.operators.multimodal import audio_frame_energy

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("content")
    )
    return audio_frame_energy(docs)


@query(
    "q141_makevalid",
    """SELECT n_nationkey AS fid, 2 AS n_lobes,
              round(CAST((4 + n_nationkey % 9) * (4 + n_nationkey % 7) AS DOUBLE)
                    / 2.0, 6) AS valid_area
       FROM nation""",
)
def q141(spark, sf_dir):
    """ST_MakeValid for self-crossing rings (OGRGeometry::MakeValid,
    ogr/ogrgeometry.cpp:4183 → GEOS structure method): bowtie rings
    (0,0)-(w,h)-(w,0)-(0,h) node at their proper center crossing and
    pinch into two simple triangle lobes; the valid area is exactly
    w·h/2.  Kernel: kernels/geomops.py::make_valid_ring."""
    import pandas as pd

    rows = []
    for r in _t(spark, sf_dir, "nation").select("n_nationkey").collect():
        k = int(r[0])
        w, h = float(4 + k % 9), float(4 + k % 7)
        ring = np.array([[0, 0], [w, h], [w, 0], [0, h], [0, 0]], dtype=np.float64)
        rows.append((k, W.polygon_wkb([ring])))
    layer = local_df(spark, rows, "fid long, geom binary")

    @F.pandas_udf("n_lobes int, valid_area double")
    def mv(wkb: pd.Series) -> pd.DataFrame:
        from gdal_spark.kernels.geomops import make_valid_ring
        from gdal_spark.kernels import wkb as WW

        out = []
        for blob in wkb:
            gtype, parts = WW.parse_wkb(bytes(blob))
            ring = parts[0] if isinstance(parts, list) else parts
            lobes = make_valid_ring(ring)
            area = 0.0
            for lr in lobes:
                x0, y0 = lr[:-1, 0], lr[:-1, 1]
                x1, y1 = lr[1:, 0], lr[1:, 1]
                area += abs(0.5 * float(np.sum(x0 * y1 - x1 * y0)))
            out.append((len(lobes), round(area, 6)))
        return pd.DataFrame(out, columns=["n_lobes", "valid_area"])

    res = layer.withColumn("_m", mv(F.col("geom")))
    return res.select("fid", "_m.n_lobes", "_m.valid_area")


@query(
    "q142_stream_geocode_density",
    """WITH c AS (SELECT * FROM (VALUES
         ('nyc', 0), ('london', 1), ('tokyo', 2), ('paris', 3), ('berlin', 4),
         ('madrid', 5), ('sydney', 6), ('saopaulo', 7), ('lagos', 8),
         ('delhi', 9), ('smalltown1', 10), ('smalltown2', 11),
         ('smalltown3', 12), ('smalltown4', 13), ('smalltown5', 14))
         AS t(name, ci)),
       co AS (SELECT * FROM (VALUES
         (0, -73.98, 40.75), (1, -0.12, 51.50), (2, 139.69, 35.69),
         (3, 2.35, 48.86), (4, 13.40, 52.52), (5, -3.70, 40.42),
         (6, 151.21, -33.87), (7, -46.63, -23.55), (8, 3.39, 6.45),
         (9, 77.21, 28.61), (10, -100.5, 41.2), (11, 24.7, -29.1),
         (12, 133.8, -23.7), (13, -63.6, -8.8), (14, 37.6, 55.8))
         AS t(ci, blon, blat)),
       d AS (SELECT doc_id, CAST(doc_id % 15 AS INT) AS ci FROM documents),
       p AS (SELECT doc_id,
                    'https://' || name || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url,
                    blon, blat
             FROM d JOIN c USING (ci) JOIN co USING (ci)),
       j AS (SELECT blon, blat,
                    CAST(('0x' || substr(md5(url), 1, 16)) AS UBIGINT) AS h
             FROM p),
       g AS (SELECT blon + (CAST(h % 20001 AS DOUBLE) - 10000.0)/10000.0*0.5 AS lon,
                    blat + (CAST((h >> 20) % 20001 AS DOUBLE) - 10000.0)/10000.0*0.5 AS lat
             FROM j),
       k AS (SELECT 9*144115188075855872
                      + CAST(floor((lon+180)/360.0*512) AS BIGINT)*268435456
                      + CAST(floor((90-lat)/180.0*512) AS BIGINT) AS cell
             FROM g)
       SELECT cell, count(*) AS n FROM k GROUP BY cell""",
)
def q142(spark, sf_dir):
    """The north-star ingest pipeline as REAL Structured Streaming:
    file-streamed pages → in-stream HTML extraction (pandas UDF) →
    JVM-native geocode+cell-encode inside the micro-batch → incremental
    per-cell density (complete mode, availableNow drain).  The oracle
    replays the geocode bit-for-bit; the extraction contributes
    byte-identity (wrap → strip is the identity on the body text), so
    streaming and batch produce the same tile table."""
    from gdal_spark.streaming.windowed import stream_geocode_density

    return stream_geocode_density(spark, f"{sf_dir}/documents.parquet")


def _lsh_bucket_sql() -> str:
    from gdal_spark.operators.similarity import lsh_planes_int

    planes = lsh_planes_int()
    terms = []
    for j, row in enumerate(planes):
        lst = "[" + ",".join(str(int(c)) for c in row) + "]"
        terms.append(
            f"(CASE WHEN list_sum(list_transform(list_zip(qv, {lst}), "
            f"s -> s[1]*s[2])) > 0 THEN {1 << j} ELSE 0 END)"
        )
    return " + ".join(terms)


@query(
    "q143_lsh_buckets",
    f"""WITH v AS (SELECT vec_id,
         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*1000 + 0.5) AS BIGINT)) AS qv
        FROM embeddings),
       b AS (SELECT vec_id, CAST({{expr}} AS BIGINT) AS bucket FROM v)
       SELECT bucket, count(*) AS n, CAST(min(vec_id) AS BIGINT) AS min_id
       FROM b GROUP BY bucket""".replace("{expr}", _lsh_bucket_sql()),
)
def q143(spark, sf_dir):
    """Hyperplane-LSH bucketing on the exact integer lattice (closes
    round 1's 'untested helper' note): quantized vectors project
    against the seeded quantized hyperplanes entirely JVM-side
    (zip_with/aggregate fold — exact integer arithmetic, bit-stable
    signs), bucket id = the 8 sign bits.  The oracle stamps the SAME
    integer planes into SQL and replays every projection."""
    from gdal_spark.operators.similarity import hyperplane_lsh_buckets_int

    b = hyperplane_lsh_buckets_int(_t(spark, sf_dir, "embeddings"))
    return b.groupBy("bucket").agg(
        F.count("*").alias("n"), F.min("vec_id").cast("long").alias("min_id")
    )


@query(
    "q144_rasterize_invert",
    f"""WITH r AS ({Q26_RECTS_SQL}),
       g AS (SELECT x.range AS gx, y.range AS gy
             FROM range(128) x, range(128) y),
       cov AS (SELECT DISTINCT gx, gy FROM g JOIN r
               ON gx >= x0 AND gx < x0 + w AND gy >= y0 AND gy < y0 + h)
       SELECT gx, gy, CAST(7 AS DOUBLE) AS v
       FROM g ANTI JOIN cov USING (gx, gy)""",
)
def q144(spark, sf_dir):
    """gdal_rasterize -i (inverse burn): value 7 into every pixel NO
    q26 rectangle covers — the full tile grid drives the shuffle so
    untouched tiles materialize as constant tiles; scanline rule
    unchanged (the burned set is the exact complement of q26's)."""
    from gdal_spark.operators.rasterize_invert import rasterize_invert_grid

    rects = _q26_rect_rows(spark, sf_dir)
    feats = local_df(spark, rects, "burn double, geom binary")
    tiles = rasterize_invert_grid(
        feats, IDENTITY_GT, 128, 128, burn_value=7.0, tile_size=32
    )
    return tiles_to_features(tiles, tile_size=32, nodata=0.0)


@query(
    "q145_image_ahash_dedup",
    """WITH d AS (SELECT doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id % 50 AS STRING)), 1, 8)) AS BIGINT) AS h8
        FROM documents),
       dims AS (SELECT doc_id, h8, 16 + h8 % 64 AS w, 16 + (h8 // 64) % 64 AS h FROM d),
       px AS (SELECT doc_id, y.range * 8 + x.range AS k,
               (h8 + 31*(((2*y.range + 1) * h) // 16)
                   + 17*(((2*x.range + 1) * w) // 16)) % 251 AS p
              FROM dims CROSS JOIN range(8) y CROSS JOIN range(8) x),
       s AS (SELECT doc_id, CAST(sum(p) AS BIGINT) AS tot FROM px GROUP BY doc_id),
       b AS (SELECT px.doc_id, k, CASE WHEN 64 * p > tot THEN 1 ELSE 0 END AS bit
             FROM px JOIN s ON s.doc_id = px.doc_id),
       hsh AS (SELECT doc_id,
               CAST(SUM(CASE WHEN k >= 32 AND bit = 1
                    THEN CAST(power(2, k - 32) AS BIGINT) ELSE 0 END) AS BIGINT) AS hash_hi,
               CAST(SUM(CASE WHEN k < 32 AND bit = 1
                    THEN CAST(power(2, k) AS BIGINT) ELSE 0 END) AS BIGINT) AS hash_lo
               FROM b GROUP BY doc_id),
       keep AS (SELECT hash_hi, hash_lo, min(doc_id) AS keeper, count(*) AS n_dups
                FROM hsh GROUP BY hash_hi, hash_lo)
       SELECT h.doc_id, h.hash_hi, h.hash_lo, k.keeper, CAST(k.n_dups AS BIGINT) AS n_dups
       FROM hsh h JOIN keep k USING (hash_hi, hash_lo)""",
)
def q145(spark, sf_dir):
    """Image near-dup via perceptual aHash (the web-pipeline image
    dedup key): every page's image decodes (fake seam), resizes to
    8x8, hashes by exact integer mean-threshold bits; dedup = a hash
    equi-join picking the min-id keeper per hash class — never an
    all-pairs comparison.  Images repeat every 50 docs, so classes
    have real duplicates; the oracle replays decode, resize lattice,
    threshold bits and the keeper join."""
    from gdal_spark.operators.multimodal import image_ahash

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", (F.col("doc_id") % 50).cast("string").cast("binary").alias("content")
    )
    h = image_ahash(docs)
    keep = h.groupBy("hash_hi", "hash_lo").agg(
        F.min("doc_id").alias("keeper"), F.count("*").alias("n_dups")
    )
    return h.join(keep, ["hash_hi", "hash_lo"]).select(
        "doc_id", "hash_hi", "hash_lo", "keeper", F.col("n_dups").cast("long")
    )


@query(
    "q146_training_pipeline",
    """WITH q AS (
         SELECT doc_id, lang, text, length(text) AS n_char,
                len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tok
         FROM documents WHERE length(text) > 0),
       f AS (SELECT * FROM q
             WHERE n_tok >= 10
               AND CAST(length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE)
                   / n_tok <= 8.0),
       fp AS (SELECT doc_id, lang, n_char, n_tok, md5(text) AS h FROM f),
       keep AS (SELECT h, min(doc_id) AS keeper FROM fp GROUP BY h),
       k AS (SELECT fp.doc_id, fp.lang, fp.n_char, fp.n_tok
             FROM fp JOIN keep ON fp.h = keep.h AND fp.doc_id = keep.keeper),
       packed AS (SELECT lang, n_char, n_tok,
                    sum(n_char) OVER (PARTITION BY lang ORDER BY doc_id
                                      ROWS UNBOUNDED PRECEDING) AS cum
                  FROM k)
       SELECT lang, CAST((cum - n_char) // 50000 AS BIGINT) AS bin,
              count(*) AS n_docs,
              CAST(sum(n_tok) AS BIGINT) AS total_tokens,
              CAST(sum(n_char) AS BIGINT) AS total_chars
       FROM packed GROUP BY lang, bin""",
)
def q146(spark, sf_dir):
    """The LLM training-data pipeline END-TO-END as one plan: quality
    gate (token count + mean token length), exact dedup with min-id
    keeper (md5 fingerprint groupBy — one shuffle on the hash), token
    accounting, and greedy 50k-char sequence packing per language
    stratum (one window pass), rolled up per (lang, bin).  Every stage
    is a built-in JVM operator; the oracle replays the identical
    chain.  This is the composition a 100-TB corpus actually runs —
    the per-stage operators q17/q21/q48/q93 verify in isolation."""
    d = _t(spark, sf_dir, "documents").filter(F.length("text") > 0)
    q = d.select(
        "doc_id", "lang", "text",
        F.length("text").alias("n_char"),
        TXT.token_count(F.col("text")).cast("long").alias("n_tok"),
    )
    f = q.filter(
        (F.col("n_tok") >= 10)
        & (
            F.length(F.regexp_replace(F.col("text"), " ", "")).cast("double")
            / F.col("n_tok")
            <= 8.0
        )
    )
    fp = f.withColumn("h", F.md5(F.col("text")))
    keep = fp.groupBy("h").agg(F.min("doc_id").alias("keeper"))
    k = fp.join(keep, "h").filter(F.col("doc_id") == F.col("keeper"))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = k.withColumn("cum", F.sum("n_char").over(w))
    return (
        packed.withColumn(
            "bin", F.floor((F.col("cum") - F.col("n_char")) / 50000).cast("long")
        )
        .groupBy("lang", "bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
            F.sum("n_char").cast("long").alias("total_chars"),
        )
    )


@query(
    "q147_mdarray",
    """WITH a AS (SELECT t.range AS t, y.range AS y, x.range AS x,
                   CAST((t.range*100 + y.range*10 + x.range*3) % 97 AS DOUBLE) AS v
                  FROM range(8) t, range(6) y, range(5) x),
       s AS (SELECT t - 2 AS t, y, x, v FROM a WHERE t >= 2 AND t < 6),
       r AS (SELECT y, x, avg(v) AS v FROM s GROUP BY y, x)
       SELECT x AS i0, y AS i1, round(v, 6) AS v FROM r""",
)
def q147(spark, sf_dir):
    """MDArray API (gcore/gdalmultidim.cpp — GetView :3181, Transpose
    :4049, statistics :7776) over the long-format distributed
    representation: an 8x6x5 (t,y,x) hypercube sliced to t in [2,6)
    (range filter, partition-prunable), mean-reduced over t (groupBy
    with map-side partials), then transposed to (x,y) — a pure
    projection, zero data movement, matching the reference's
    view-semantics Transpose."""
    from gdal_spark.operators.mdim import (
        mdarray_reduce,
        mdarray_slice,
        mdarray_transpose,
    )

    arr = (
        spark.range(8 * 6 * 5)
        .select(
            (F.col("id") / 30).cast("long").alias("i0"),
            ((F.col("id") / 5) % 6).cast("long").alias("i1"),
            (F.col("id") % 5).alias("i2"),
        )
        .withColumn(
            "v",
            ((F.col("i0") * 100 + F.col("i1") * 10 + F.col("i2") * 3) % 97)
            .cast("double"),
        )
    )
    sliced = mdarray_slice(arr, axis=0, lo=2, hi=6)
    reduced = mdarray_reduce(sliced, axis=0, op="mean")  # dims now (y, x)
    out = mdarray_transpose(reduced, [1, 0])  # (x, y)
    return out.select("i0", "i1", F.round("v", 6).alias("v"))


@query(
    "q148_pq_ann_search",
    """WITH v AS (SELECT vec_id,
         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*1000 + 0.5) AS BIGINT)) AS qv
        FROM embeddings),"""
    + _pq_cte("p0", 1, 32, 4, 32) + ","
    + _pq_cte("p1", 33, 64, 4, 32) + """,
       qs0 AS (SELECT vec_id AS qid, qv FROM p0v WHERE vec_id < 10),
       qs1 AS (SELECT vec_id AS qid, qv FROM p1v WHERE vec_id < 10),
       t0 AS (SELECT q.qid, c.cell,
               CAST(list_sum(list_transform(list_zip(q.qv, c.c),
                    s -> (s[1]-s[2])*(s[1]-s[2]))) AS BIGINT) AS d2
              FROM p0c2 c, qs0 q),
       t1 AS (SELECT q.qid, c.cell,
               CAST(list_sum(list_transform(list_zip(q.qv, c.c),
                    s -> (s[1]-s[2])*(s[1]-s[2]))) AS BIGINT) AS d2
              FROM p1c2 c, qs1 q),
       enc AS (SELECT a.vec_id, a.cell AS c0, b.cell AS c1
               FROM p0a2 a JOIN p1a2 b USING (vec_id)),
       scored AS (SELECT t0.qid, e.vec_id, t0.d2 + t1.d2 AS adc
                  FROM enc e
                  JOIN t0 ON t0.cell = e.c0
                  JOIN t1 ON t1.cell = e.c1 AND t1.qid = t0.qid
                  WHERE e.vec_id <> t0.qid)
       SELECT qid, vec_id, CAST(rn AS INT) AS rnk, CAST(adc AS BIGINT) AS adc_d2
       FROM (SELECT qid, vec_id, adc,
                    row_number() OVER (PARTITION BY qid ORDER BY adc, vec_id) AS rn
             FROM scored)
       WHERE rn <= 5""",
)
def q148(spark, sf_dir):
    """PQ SERVING (completes the IndexPQ surface): top-5 ADC search
    for 10 queries over the 2-byte codes table — distance = the two
    per-subspace lookup-table entries, never the vectors; the tables
    are a 10x4 literal 2-D array in the plan (element_at twice), the
    rank a per-query window.  At corpus scale the scan touches only
    codes: the 100-TB embedding store serves from ~1/128 of its bytes.
    The oracle replays training, encoding, the 80 table entries and
    the ranking."""
    from gdal_spark.operators.similarity import lsh_planes_int  # noqa: F401
    from gdal_spark.operators.similarity import pq_encode

    emb = _t(spark, sf_dir, "embeddings")
    codes, books = pq_encode(emb, m=2, k_sub=4, n_iter=2, dim=64)
    codes = codes.localCheckpoint()

    qrows = emb.orderBy("vec_id").limit(10).collect()
    import numpy as _np

    tables = []  # tables[j][qidx][code]
    qids = []
    for j in range(2):
        per_q = []
        for r in qrows:
            qv = _np.floor(
                _np.asarray(r["embedding"], dtype=_np.float64) * 1000.0 + 0.5
            ).astype(_np.int64)
            sub = qv[j * 32 : (j + 1) * 32]
            per_q.append(
                [int(((_np.asarray(c, dtype=_np.int64) - sub) ** 2).sum())
                 for c in books[j]]
            )
        tables.append(per_q)
    qids = [int(r["vec_id"]) for r in qrows]

    qdf = local_df(
        spark, [(q, i) for i, q in enumerate(qids)], "qid long, qidx int"
    )
    pairs = codes.crossJoin(F.broadcast(qdf)).filter(F.col("vec_id") != F.col("qid"))
    # the per-(query, subspace, code) ADC lookup tables as BROADCAST-
    # JOINED DataFrames, not plan literals: plan size is CONSTANT in
    # the query-batch size (a literal 2-D array grows O(n_queries·m·k)
    # and would blow the plan for a real serving batch); one broadcast
    # hash join per subspace, the big side still scans codes only
    adc = F.lit(0).cast("long")
    for j in range(2):
        lut_rows = [
            (qi, ci, int(d))
            for qi, per_code in enumerate(tables[j])
            for ci, d in enumerate(per_code)
        ]
        lut = local_df(
            spark, lut_rows, f"qidx int, _c{j} int, _d{j} long"
        )
        pairs = pairs.join(
            F.broadcast(lut),
            (pairs["qidx"] == lut["qidx"])
            & (F.col(f"code{j}").cast("int") == F.col(f"_c{j}")),
        ).drop(lut["qidx"]).drop(f"_c{j}")
        adc = adc + F.col(f"_d{j}")
    w = Window.partitionBy("qid").orderBy(F.col("adc").asc(), F.col("vec_id").asc())
    return (
        pairs.withColumn("adc", adc)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("qid", "vec_id", "rnk", F.col("adc").cast("long").alias("adc_d2"))
    )


@query(
    "q149_overlay_exact_noded",
    """SELECT n_nationkey AS fid,
              CAST((4 + n_nationkey % 9) * (3 + n_nationkey % 7)
                   + (2 + n_nationkey % 5) * (3 + n_nationkey % 7) AS DOUBLE)
                  AS shared_union,
              CAST((4 + n_nationkey % 9) * (3 + n_nationkey % 7) - 1 AS DOUBLE)
                  AS island_diff,
              CAST((4 + n_nationkey % 9) * (3 + n_nationkey % 7) AS DOUBLE)
                  AS ident_inter,
              CAST(0.0 AS DOUBLE) AS wound2_valid
       FROM nation""",
)
def q149(spark, sf_dir):
    """EXACT arrangement noding (upgrades the GH perturbation path to
    the reference's GEOS-noder semantics, kernels/arrangement.py):
    per feature, a shared-edge union, a contained-island difference,
    an identical-rings intersection — every one an EXACT integer with
    tolerance 0, no micro-perturbation residue — plus the even-odd
    area of a doubly-wound ring (exactly 0, a case perturbation
    cannot express at all)."""
    import pandas as pd

    rows = []
    for r in _t(spark, sf_dir, "nation").select("n_nationkey").collect():
        k = int(r[0])
        w, h = float(4 + k % 9), float(3 + k % 7)
        w2 = float(2 + k % 5)
        A = np.array([[0, 0], [w, 0], [w, h], [0, h], [0, 0]])
        B = np.array([[w, 0], [w + w2, 0], [w + w2, h], [w, h], [w, 0]])
        isl = np.array([[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]], dtype=np.float64)
        dw = np.array([[0, 0], [w, 0], [w, h], [0, h],
                       [0, 0], [w, 0], [w, h], [0, h], [0, 0]])
        rows.append((k, A.tobytes(), B.tobytes(), isl.tobytes(), dw.tobytes()))
    layer = local_df(
        spark, rows, "fid long, a binary, b binary, isl binary, dw binary"
    )

    @F.pandas_udf(
        "shared_union double, island_diff double, ident_inter double, wound2_valid double"
    )
    def ex(a: pd.Series, b: pd.Series, isl: pd.Series, dw: pd.Series) -> pd.DataFrame:
        from gdal_spark.kernels.arrangement import (
            overlay_area_exact,
            valid_area_exact,
        )

        out = []
        for ab, bb, ib, db in zip(a, b, isl, dw):
            A = np.frombuffer(ab, dtype=np.float64).reshape(-1, 2)
            B = np.frombuffer(bb, dtype=np.float64).reshape(-1, 2)
            I = np.frombuffer(ib, dtype=np.float64).reshape(-1, 2)
            D = np.frombuffer(db, dtype=np.float64).reshape(-1, 2)
            out.append((
                overlay_area_exact(A, B, "union"),
                overlay_area_exact(A, I, "difference"),
                overlay_area_exact(A, A.copy(), "intersection"),
                valid_area_exact(D),
            ))
        return pd.DataFrame(
            out,
            columns=["shared_union", "island_diff", "ident_inter", "wound2_valid"],
        )

    res = layer.withColumn("_e", ex(F.col("a"), F.col("b"), F.col("isl"), F.col("dw")))
    return res.select(
        "fid", "_e.shared_union", "_e.island_diff", "_e.ident_inter",
        "_e.wound2_valid",
    )


# --- Wang-exact viewshed oracle (generated unrolled replay) ---------


_WNX = _WNY = 9
_WOX = _WOY = 4
_WOBSZ = 2


def _wang_H(x, y):
    # adjusted height as a SQL double expression, exact integers
    return (
        f"CAST((fid*7 + {x}*3 + {y}*5) % 13 - {_WOBSZ} "
        f"- ((fid*7 + {_WOX}*3 + {_WOY}*5) % 13) AS DOUBLE)"
    )


def _wang_oracle_sql() -> str:
    ctes = []
    stage = 0

    def emit(name, cols, src):
        ctes.append(f"{name} AS (SELECT {', '.join(cols)} FROM {src})")

    def base_cols(prev_from, y):
        # start a line: p{x} = previous line's final c{x}; c{x} = raw H
        cols = ["fid"]
        for x in range(_WNX):
            cols.append(f"c{x} AS p{x}" if prev_from else f"{_wang_H(x, y)} AS p{x}")
        for x in range(_WNX):
            cols.append(f"{_wang_H(x, y)} AS c{x}")
        return cols

    def pixel_step(src, x, dfz, carry_rs):
        # one update: r{x} from the incoming state, c{x} = max(c, dfz)
        cols = ["fid"] + [f"p{i}" for i in range(_WNX)]
        for i in range(_WNX):
            if i == x:
                cols.append(
                    f"CASE WHEN ({dfz}) > c{x} THEN ({dfz}) ELSE c{x} END AS c{x}"
                )
            else:
                cols.append(f"c{i}")
        cols += [f"r{i}" for i in carry_rs]
        cols.append(
            f"CASE WHEN c{x} + 0.0 < ({dfz}) THEN 0.0 ELSE 255.0 END AS r{x}"
        )
        return cols

    def free_step(src, x, carry_rs):
        cols = (["fid"] + [f"p{i}" for i in range(_WNX)]
                + [f"c{i}" for i in range(_WNX)]
                + [f"r{i}" for i in carry_rs] + [f"255.0 AS r{x}"])
        return cols

    line_last = {}  # y -> (cte name after line completes)

    def do_line(y, prev_cte, first):
        nonlocal stage
        name = f"s{stage}"; stage += 1
        emit(name, base_cols(prev_cte is not None, y),
             prev_cte if prev_cte else "base")
        src = name
        carry = []
        nYo = abs(y - _WOY)

        def step(x, dfz_expr=None):
            nonlocal src, stage
            nm = f"s{stage}"; stage += 1
            if dfz_expr is None:
                emit(nm, free_step(src, x, carry), src)
            else:
                emit(nm, pixel_step(src, x, dfz_expr, carry), src)
            carry.append(x)
            src = nm

        if first:
            step(_WOX)          # observer: visible, free
            if _WOX - 1 >= 0:
                step(_WOX - 1)  # adjacent: visible, NO update
            for px in range(_WOX - 2, -1, -1):
                n = _WOX - px
                step(px, f"c{px + 1} * {n} / {n - 1}")
            if _WOX + 1 < _WNX:
                step(_WOX + 1)
            for px in range(_WOX + 2, _WNX):
                n = px - _WOX
                step(px, f"c{px - 1} * {n} / {n - 1}")
        else:
            # center pixel
            dfz = f"c{_WOX}" if nYo == 1 else f"p{_WOX} * {nYo} / {nYo - 1}"
            step(_WOX, dfz)
            for px in range(_WOX - 1, -1, -1):
                nX = _WOX - px
                if nX == nYo:
                    dfz = f"c{px}" if nYo == 1 else f"p{px + 1} * {nYo} / {nYo - 1}"
                elif nX > nYo:
                    dfz = (f"(p{px + 1} * {nYo} + c{px + 1} * {nX - nYo})"
                           f" / {nX - 1}")
                else:
                    dfz = (f"(p{px + 1} * {nX} + p{px} * {nYo - nX})"
                           f" / {nYo - 1}")
                step(px, dfz)
            for px in range(_WOX + 1, _WNX):
                nX = px - _WOX
                if nX == nYo:
                    dfz = f"c{px}" if nYo == 1 else f"p{px - 1} * {nYo} / {nYo - 1}"
                elif nX > nYo:
                    dfz = (f"(p{px - 1} * {nYo} + c{px - 1} * {nX - nYo})"
                           f" / {nX - 1}")
                else:
                    dfz = (f"(p{px - 1} * {nX} + p{px} * {nYo - nX})"
                           f" / {nYo - 1}")
                step(px, dfz)
        line_last[y] = src
        return src

    first_last = do_line(_WOY, None, True)
    prev = first_last
    for y in range(_WOY - 1, -1, -1):
        prev = do_line(y, prev, False)
    prev = first_last
    for y in range(_WOY + 1, _WNY):
        prev = do_line(y, prev, False)

    unions = []
    for y in range(_WNY):
        src = line_last[y]
        for x in range(_WNX):
            unions.append(
                f"SELECT fid, {x} AS gx, {y} AS gy, r{x} AS vis FROM {src}"
            )
    sql = ("WITH base AS (SELECT n_nationkey AS fid FROM nation),\n  "
           + ",\n  ".join(ctes)
           + "\n" + " UNION ALL ".join(unions))
    return sql




@query("q150_viewshed_wang", _wang_oracle_sql())
def q150(spark, sf_dir):
    """Wang-EXACT viewshed parity (closes the last NOTES gap): the
    reference's default algorithm (ViewshedExecutor Edge mode,
    alg/viewshed/viewshed_executor.cpp) re-pinned line for line in
    kernels/viewshed_wang.py and run distributed across one DEM per
    feature (the many-observers fleet shape); the oracle is the FULL
    unrolled replay of the recurrence — 81 chained CTE stages of
    sequential surface max-updates — generated mechanically and
    value-identical at every pixel."""
    from gdal_spark.operators.viewshed import viewshed_wang_features

    rows = []
    for r in _t(spark, sf_dir, "nation").select("n_nationkey").collect():
        k = int(r[0])
        dem = np.fromfunction(
            lambda y, x: (k * 7 + x * 3 + y * 5) % 13, (9, 9)
        ).astype(np.float64)
        rows.append((k, dem.tobytes()))
    dems = local_df(spark, rows, "fid long, dem binary")
    return viewshed_wang_features(dems, ox=4, oy=4, width=9, height=9, obs_z=2.0)


# --- overlay GEOMETRY emission (q151-q156) ----------------------------------
# The reference's layer algebra emits clipped GEOMETRIES
# (ogr/ogrsf_frmts/generic/ogrlayer.cpp:5385-7846) and
# OGRGeometry::MakeValid/Buffer emit repaired/offset WKB
# (ogr/ogrgeometry.cpp:4183, :4949).  These queries check the exact
# arrangement noder's ring output (kernels/arrangement.py::
# overlay_geoms_exact / valid_geoms_exact) with ORDER-SENSITIVE vertex
# checksums Σ(i+1)·2·coord per ring (the q63 pattern) — a wrong vertex
# order, orientation, start vertex, ring count or hole assignment all
# fail even with the right areas.  Fixtures put every degeneracy class
# on the table: collinear edge overlap (q151), shared edge (q152),
# island hole (q153), checkerboard pinch (q154), interleaved
# self-crossings (q155), concave offsetting (q156).


def _vsum2(exprs: list[str]) -> str:
    """Order-sensitive checksum Σ(i+1)·e_i over SQL expressions of
    DOUBLED coordinates (doubling keeps half-integer fixtures exact
    integers on both engines)."""
    return "(" + " + ".join(f"{i + 1}*({e})" for i, e in enumerate(exprs)) + ")"


_LSF = """f AS (SELECT CAST(n_nationkey AS BIGINT) AS fid,
         4 + n_nationkey%9 AS w, 3 + n_nationkey%7 AS h,
         2 + n_nationkey%3 AS h2, 1 + n_nationkey%4 AS w3,
         2 + n_nationkey%3 AS w4,
         1 + n_nationkey%3 AS aa, 1 + n_nationkey%2 AS bb,
         (n_nationkey%5)*40 AS tx, (n_nationkey//5)*40 AS ty
       FROM nation)"""


def _lshape_params(spark, sf_dir):
    out = []
    for r in _t(spark, sf_dir, "nation").select("n_nationkey").collect():
        k = int(r[0])
        out.append(
            dict(
                fid=k,
                w=4 + k % 9, h=3 + k % 7, h2=2 + k % 3, w3=1 + k % 4,
                w4=2 + k % 3, aa=1 + k % 3, bb=1 + k % 2,
                tx=(k % 5) * 40, ty=(k // 5) * 40,
            )
        )
    return out


def _lshape_ring(p) -> np.ndarray:
    w, h, h2, w3 = p["w"], p["h"], p["h2"], p["w3"]
    tx, ty = p["tx"], p["ty"]
    ring = np.array(
        [[0, 0], [w + w3, 0], [w + w3, h], [w, h], [w, h + h2], [0, h + h2],
         [0, 0]],
        dtype=np.float64,
    )
    return ring + np.array([tx, ty], dtype=np.float64)


from pyspark.sql import types as _T

_CS_TYPE = _T.ArrayType(
    _T.StructType(
        [
            _T.StructField("pi", _T.IntegerType()),
            _T.StructField("ri", _T.IntegerType()),
            _T.StructField("n_pts", _T.IntegerType()),
            _T.StructField("vsum_x", _T.LongType()),
            _T.StructField("vsum_y", _T.LongType()),
            _T.StructField("r_area", _T.DoubleType()),
        ]
    )
)


@F.pandas_udf(_CS_TYPE)
def _mp_ring_checksums(geom: pd.Series) -> pd.Series:
    """Per ring of a (Multi)Polygon WKB: vertex count (open ring),
    order-sensitive Σ(i+1)·2·coord checksums, signed area (exterior
    CCW +, hole CW −) rounded 6."""
    from gdal_spark.kernels import wkb as WW

    out = []
    for blob in geom:
        rows = []
        for pi, rings in enumerate(WW.polygon_rings(bytes(blob))):
            for ri, r in enumerate(rings):
                o = r[:-1]
                n = o.shape[0]
                wts = np.arange(1, n + 1, dtype=np.float64)
                vsx = int(round(float(np.sum(wts * 2.0 * o[:, 0]))))
                vsy = int(round(float(np.sum(wts * 2.0 * o[:, 1]))))
                sa = 0.5 * float(
                    np.sum(r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1])
                )
                rows.append((pi, ri, n, vsx, vsy, round(sa, 6)))
        out.append(rows)
    return pd.Series(out)


def _checksum_rows(df, geom_col="geom", keep=("fid",)):
    cs = df.withColumn("_cs", _mp_ring_checksums(F.col(geom_col)))
    ex = cs.withColumn("r", F.explode("_cs"))
    return ex.select(
        *keep, "r.pi", "r.ri", "r.n_pts", "r.vsum_x", "r.vsum_y", "r.r_area"
    )


@query(
    "q151_overlay_geom_intersection",
    f"""WITH {_LSF}
       SELECT fid, fid AS b_id, CAST(0 AS INT) AS pi, CAST(0 AS INT) AS ri,
              CAST(4 AS INT) AS n_pts,
              CAST({_vsum2(["2*tx", "2*(tx+w)", "2*(tx+w)", "2*tx"])} AS BIGINT) AS vsum_x,
              CAST({_vsum2(["2*ty", "2*ty", "2*(ty+h+h2)", "2*(ty+h+h2)"])} AS BIGINT) AS vsum_y,
              round(CAST(w*(h+h2) AS DOUBLE), 6) AS r_area
       FROM f""",
)
def q151(spark, sf_dir):
    """Layer-algebra Intersection emitting FEATURES (ogrlayer.cpp:5385)
    through the broadcast-prefilter operator: L-shape ∩ covering rect
    with COLLINEAR EDGE OVERLAP contact (the A arm's edge lies on B's
    edge) — exact noder route; result is a clean rectangle whose
    noding vertices were collinear-eliminated.  Order-sensitive vertex
    checksums per ring."""
    from gdal_spark.operators.overlay import overlay_features

    arows, bpolys = [], []
    for p in _lshape_params(spark, sf_dir):
        t = np.array([p["tx"], p["ty"]], dtype=np.float64)
        arows.append((p["fid"], W.polygon_wkb([_lshape_ring(p)])))
        H = p["h"] + p["h2"]
        b = np.array(
            [[-1, -1], [p["w"], -1], [p["w"], H + 1], [-1, H + 1], [-1, -1]],
            dtype=np.float64,
        ) + t
        bpolys.append((p["fid"], W.polygon_wkb([b])))
    layer = local_df(spark, arows, "a_id long, geom binary").coalesce(1)
    res = overlay_features(layer, bpolys, "intersection")
    return _checksum_rows(
        res.withColumnRenamed("a_id", "fid"), keep=("fid", "b_id")
    )


@query(
    "q152_overlay_geom_union",
    f"""WITH {_LSF}
       SELECT fid, CAST(0 AS INT) AS pi, CAST(0 AS INT) AS ri,
              CAST(6 AS INT) AS n_pts,
              CAST({_vsum2(["2*tx", "2*(tx+w+w3+w4)", "2*(tx+w+w3+w4)",
                            "2*(tx+w)", "2*(tx+w)", "2*tx"])} AS BIGINT) AS vsum_x,
              CAST({_vsum2(["2*ty", "2*ty", "2*(ty+h)", "2*(ty+h)",
                            "2*(ty+h+h2)", "2*(ty+h+h2)"])} AS BIGINT) AS vsum_y,
              round(CAST((w+w3+w4)*h + w*h2 AS DOUBLE), 6) AS r_area
       FROM f""",
)
def q152(spark, sf_dir):
    """Geometry Union across a SHARED EDGE (ogrlayer.cpp:6188 →
    ogrgeometry Union): L ∪ edge-adjacent rect merges into one ring,
    the shared edge cancels by XOR parity and its endpoints
    collinear-eliminate — exactly the case the float GH path cannot
    node."""
    from gdal_spark.functions.st import st_clip_geom

    rows = []
    for p in _lshape_params(spark, sf_dir):
        t = np.array([p["tx"], p["ty"]], dtype=np.float64)
        Wx = p["w"] + p["w3"]
        b = np.array(
            [[Wx, 0], [Wx + p["w4"], 0], [Wx + p["w4"], p["h"]], [Wx, p["h"]],
             [Wx, 0]],
            dtype=np.float64,
        ) + t
        rows.append(
            (p["fid"], W.polygon_wkb([_lshape_ring(p)]), W.polygon_wkb([b]))
        )
    pairs = local_df(spark, rows, "fid long, ga binary, gb binary").repartition(8)
    res = pairs.select(
        "fid", st_clip_geom(F.col("ga"), F.col("gb"), F.lit("union")).alias("geom")
    )
    return _checksum_rows(res)


@query(
    "q153_overlay_geom_difference",
    f"""WITH {_LSF}
       SELECT fid, CAST(NULL AS BIGINT) AS b_id, CAST(0 AS INT) AS pi,
              CAST(0 AS INT) AS ri, CAST(6 AS INT) AS n_pts,
              CAST({_vsum2(["2*tx", "2*(tx+w+w3)", "2*(tx+w+w3)",
                            "2*(tx+w)", "2*(tx+w)", "2*tx"])} AS BIGINT) AS vsum_x,
              CAST({_vsum2(["2*ty", "2*ty", "2*(ty+h)", "2*(ty+h)",
                            "2*(ty+h+h2)", "2*(ty+h+h2)"])} AS BIGINT) AS vsum_y,
              round(CAST((w+w3)*h + w*h2 AS DOUBLE), 6) AS r_area
       FROM f
       UNION ALL
       SELECT fid, CAST(NULL AS BIGINT) AS b_id, CAST(0 AS INT) AS pi,
              CAST(1 AS INT) AS ri, CAST(4 AS INT) AS n_pts,
              CAST({_vsum2(["2*(tx+1)", "2*(tx+1)", "2*(tx+2)", "2*(tx+2)"])} AS BIGINT) AS vsum_x,
              CAST({_vsum2(["2*(ty+1)", "2*(ty+2)", "2*(ty+2)", "2*(ty+1)"])} AS BIGINT) AS vsum_y,
              CAST(-1.0 AS DOUBLE) AS r_area
       FROM f""",
)
def q153(spark, sf_dir):
    """Layer-algebra Difference emitting a polygon WITH A HOLE
    (ogrlayer.cpp:5803 Erase): island method feature strictly inside
    the L-shape — the result carries the island as a CW interior ring,
    hole-parented by exact ray-cast containment."""
    from gdal_spark.operators.overlay import overlay_features

    arows, bpolys = [], []
    for p in _lshape_params(spark, sf_dir):
        t = np.array([p["tx"], p["ty"]], dtype=np.float64)
        arows.append((p["fid"], W.polygon_wkb([_lshape_ring(p)])))
        b = np.array(
            [[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]], dtype=np.float64
        ) + t
        bpolys.append((p["fid"], W.polygon_wkb([b])))
    layer = local_df(spark, arows, "a_id long, geom binary").coalesce(1)
    res = overlay_features(layer, bpolys, "difference")
    return _checksum_rows(
        res.withColumnRenamed("a_id", "fid"), keep=("fid", "b_id")
    )


@query(
    "q154_overlay_geom_symdiff",
    f"""WITH {_LSF}
       SELECT fid, CAST(0 AS INT) AS pi, CAST(0 AS INT) AS ri,
              CAST(10 AS INT) AS n_pts,
              CAST({_vsum2(["2*tx", "2*(tx+w+w3)", "2*(tx+w+w3)", "2*(tx+w)",
                            "2*(tx+w)", "2*(tx+w+w3)", "2*(tx+w+w3)",
                            "2*(tx+w)", "2*(tx+w)", "2*tx"])} AS BIGINT) AS vsum_x,
              CAST({_vsum2(["2*ty", "2*ty", "2*ty+1", "2*ty+1",
                            "2*(ty+h)-1", "2*(ty+h)-1", "2*(ty+h)",
                            "2*(ty+h)", "2*(ty+h+h2)", "2*(ty+h+h2)"])} AS BIGINT) AS vsum_y,
              round(CAST((w+w3)*h + w*h2 - w3*(h-1) AS DOUBLE), 6) AS r_area
       FROM f
       UNION ALL
       SELECT fid, CAST(1 AS INT) AS pi, CAST(0 AS INT) AS ri,
              CAST(4 AS INT) AS n_pts,
              CAST({_vsum2(["2*(tx+w+w3)", "2*(tx+w+w3)+2", "2*(tx+w+w3)+2",
                            "2*(tx+w+w3)"])} AS BIGINT) AS vsum_x,
              CAST({_vsum2(["2*ty+1", "2*ty+1", "2*(ty+h)-1",
                            "2*(ty+h)-1"])} AS BIGINT) AS vsum_y,
              round(CAST(h-1 AS DOUBLE), 6) AS r_area
       FROM f""",
)
def q154(spark, sf_dir):
    """Geometry SymDifference with CHECKERBOARD PINCHES
    (ogrlayer.cpp:6456): the method rect crosses the L's right edge,
    so A⊕B pinches at the two boundary crossings — the trace emits the
    (A−B) and (B−A) pieces as SEPARATE polygons touching at the pinch
    vertices (the reference's GEOS output decomposes identically)."""
    from gdal_spark.functions.st import st_clip_geom

    rows = []
    for p in _lshape_params(spark, sf_dir):
        t = np.array([p["tx"], p["ty"]], dtype=np.float64)
        Wx = p["w"] + p["w3"]
        b = np.array(
            [[p["w"], 0.5], [Wx + 1, 0.5], [Wx + 1, p["h"] - 0.5],
             [p["w"], p["h"] - 0.5], [p["w"], 0.5]],
            dtype=np.float64,
        ) + t
        rows.append(
            (p["fid"], W.polygon_wkb([_lshape_ring(p)]), W.polygon_wkb([b]))
        )
    pairs = local_df(spark, rows, "fid long, ga binary, gb binary").repartition(8)
    res = pairs.select(
        "fid",
        st_clip_geom(F.col("ga"), F.col("gb"), F.lit("symdifference")).alias("geom"),
    )
    return _checksum_rows(res)


@query(
    "q155_makevalid_star",
    f"""WITH {_LSF}
       SELECT fid, CAST(0 AS INT) AS pi, CAST(0 AS INT) AS ri,
              CAST(3 AS INT) AS n_pts,
              CAST({_vsum2(["2*tx", "2*(tx+bb)", "2*tx"])} AS BIGINT) AS vsum_x,
              CAST({_vsum2(["2*ty", "2*(ty+bb)", "2*(ty+bb)"])} AS BIGINT) AS vsum_y,
              round(CAST(bb*bb AS DOUBLE)/2, 6) AS r_area
       FROM f
       UNION ALL
       SELECT fid, CAST(1 AS INT) AS pi, CAST(0 AS INT) AS ri,
              CAST(3 AS INT) AS n_pts,
              CAST({_vsum2(["2*(tx+bb)", "2*(tx+6*aa-bb)", "2*(tx+3*aa)"])} AS BIGINT) AS vsum_x,
              CAST({_vsum2(["2*(ty+bb)", "2*(ty+bb)", "2*(ty+3*aa)"])} AS BIGINT) AS vsum_y,
              round(CAST((6*aa-2*bb)*(3*aa-bb) AS DOUBLE)/2, 6) AS r_area
       FROM f
       UNION ALL
       SELECT fid, CAST(2 AS INT) AS pi, CAST(0 AS INT) AS ri,
              CAST(3 AS INT) AS n_pts,
              CAST({_vsum2(["2*(tx+6*aa-bb)", "2*(tx+6*aa)", "2*(tx+6*aa)"])} AS BIGINT) AS vsum_x,
              CAST({_vsum2(["2*(ty+bb)", "2*ty", "2*(ty+bb)"])} AS BIGINT) AS vsum_y,
              round(CAST(bb*bb AS DOUBLE)/2, 6) AS r_area
       FROM f""",
)
def q155(spark, sf_dir):
    """ST_MakeValid on INTERLEAVED self-crossings (ogrgeometry.cpp:
    4183) — a zigzag ring whose bottom edge is crossed TWICE (the case
    the pinch-lobe kernel was out of contract for): the exact noder
    emits the three even-odd lobes as separate polygons with pinned
    order.  Closes the round-2 geometry-methods contract note."""
    from gdal_spark.functions.st import st_makevalid

    rows = []
    for p in _lshape_params(spark, sf_dir):
        t = np.array([p["tx"], p["ty"]], dtype=np.float64)
        a, b = p["aa"], p["bb"]
        ring = np.array(
            [[0, 0], [3 * a, 3 * a], [6 * a, 0], [6 * a, b], [0, b], [0, 0]],
            dtype=np.float64,
        ) + t
        rows.append((p["fid"], W.polygon_wkb([ring])))
    layer = local_df(spark, rows, "fid long, geom binary").repartition(8)
    res = layer.select("fid", st_makevalid(F.col("geom")).alias("geom"))
    return _checksum_rows(res)


@query(
    "q156_buffer_concave",
    f"""WITH {_LSF}
       SELECT fid, CAST(0 AS INT) AS pi, CAST(0 AS INT) AS ri,
              CAST(6 AS INT) AS n_pts,
              CAST({_vsum2(["2*tx-1", "2*(tx+w+w3)+1", "2*(tx+w+w3)+1",
                            "2*(tx+w)+1", "2*(tx+w)+1", "2*tx-1"])} AS BIGINT) AS vsum_x,
              CAST({_vsum2(["2*ty-1", "2*ty-1", "2*(ty+h)+1", "2*(ty+h)+1",
                            "2*(ty+h+h2)+1", "2*(ty+h+h2)+1"])} AS BIGINT) AS vsum_y,
              round(CAST((w+w3+1)*(h+1) + (w+1)*(h2+1) - (w+1) AS DOUBLE), 6)
                  AS r_area
       FROM f""",
)
def q156(spark, sf_dir):
    """TRUE CONCAVE ST_Buffer (ogrgeometry.cpp:4949), GEOS-free: the
    L-shape buffered square-style d=0.5 via the exact-noder union of
    per-edge swept hulls — the Minkowski sum of the CONCAVE input, not
    its hull (the round-2 contract limitation).  Oracle: the L is two
    rectangles, Minkowski distributes over union, so the expected ring
    and area follow from interval arithmetic."""
    from gdal_spark.functions.st import st_buffer

    rows = []
    for p in _lshape_params(spark, sf_dir):
        rows.append((p["fid"], W.polygon_wkb([_lshape_ring(p)])))
    layer = local_df(spark, rows, "fid long, geom binary").repartition(8)
    res = layer.select(
        "fid",
        st_buffer(F.col("geom"), F.lit(0.5), F.lit("square")).alias("geom"),
    )
    return _checksum_rows(res)


# --- warp-side resampling completion (q157-q160) ----------------------------
# The gdalwarp kernel set beyond nearest/bilinear/cubic
# (alg/gdalwarpkernel.cpp: GWKLanczosSinc + GWKResample accumulator
# normalization; GWKAverageOrMode for average/mode/rms) — the round-2
# "missing" row.  Lanczos weights are Python-computed floats inlined
# verbatim in the oracle (the q102-q107 recipe); footprint methods run
# on an exact 2x downsample so every aggregate is integer arithmetic.


def _warp_lanczos_oracle() -> str:
    from gdal_spark.operators.warp import lanczos_weights_norm

    we = lanczos_weights_norm(0.75)  # even dst columns: frac 0.75
    wo = lanczos_weights_norm(0.25)  # odd: frac 0.25

    def expr(wx, wy):
        terms = []
        for jj in range(6):
            for ii in range(6):
                zx = f"(gx-1)//2 + {ii - 2}"
                zy = f"(gy-1)//2 + {jj - 2}"
                terms.append(
                    f"CAST('{wy[jj]!r}' AS DOUBLE)"
                    f"*CAST('{wx[ii]!r}' AS DOUBLE)*({_z_sql(zx, zy)})"
                )
        return " + ".join(terms)

    cases = (
        f"CASE WHEN gx%2=0 AND gy%2=0 THEN ({expr(we, we)}) "
        f"WHEN gx%2=1 AND gy%2=0 THEN ({expr(wo, we)}) "
        f"WHEN gx%2=0 AND gy%2=1 THEN ({expr(we, wo)}) "
        f"ELSE ({expr(wo, wo)}) END"
    )
    return (
        "WITH g AS (SELECT px.range AS gx, py.range AS gy "
        "FROM range(6, 250) px, range(6, 250) py), "
        f"o AS (SELECT gx, gy, {cases} AS v FROM g) "
        "SELECT gx, gy, round(v, 6) AS v FROM o WHERE v <> 0"
    )


@query("q157_warp_lanczos", _warp_lanczos_oracle())
def q157(spark, sf_dir):
    """gdalwarp LANCZOS (GWKLanczosSinc radius 3, tap sum normalized —
    GWKResample's accumulator division) on a 2× upsample: dst sample
    fractions alternate 0.25/0.75 by parity, so the 6-tap weight sets
    are two Python-float vectors inlined verbatim in the oracle; the
    36-term separable sum replays the engine's accumulation order
    term for term."""
    from gdal_spark.operators.warp import warp_resample

    out = warp_resample(
        _dem_tiles(spark), IDENTITY_GT, (0.0, 0.5, 0.0, 0.0, 0.0, 0.5),
        256, 256, tile_size=32, method="lanczos",
    )
    feats = tiles_to_features(out, tile_size=32, nodata=0.0)
    return feats.filter(
        (F.col("gx") >= 6) & (F.col("gx") <= 249)
        & (F.col("gy") >= 6) & (F.col("gy") <= 249)
    ).select("gx", "gy", F.round("v", 6).alias("v"))


_WARP_DOWN_SRC = (
    f"s AS (SELECT sx.range AS sx, sy.range AS sy, "
    f"CAST({_z_sql('sx.range', 'sy.range')} AS DOUBLE) AS z "
    f"FROM range(128) sx, range(128) sy)"
)


@query(
    "q158_warp_average",
    f"""WITH {_WARP_DOWN_SRC},
       o AS (SELECT sx//2 AS gx, sy//2 AS gy, SUM(z)/4.0 AS v
             FROM s GROUP BY sx//2, sy//2)
       SELECT gx, gy, round(v, 6) AS v FROM o WHERE v <> 0""",
)
def q158(spark, sf_dir):
    """gdalwarp AVERAGE (GWKAverageOrMode GRA_Average): mean of the
    source pixels whose centers fall in the dst pixel's footprint —
    exactly the 2×2 block on a clean 2× downsample; integer source
    values keep the sum exact in any order."""
    from gdal_spark.operators.warp import warp_resample

    out = warp_resample(
        _dem_tiles(spark), IDENTITY_GT, (0.0, 2.0, 0.0, 0.0, 0.0, 2.0),
        64, 64, tile_size=32, method="average",
    )
    feats = tiles_to_features(out, tile_size=32, nodata=0.0)
    return feats.select("gx", "gy", F.round("v", 6).alias("v"))


@query(
    "q159_warp_mode",
    f"""WITH {_WARP_DOWN_SRC},
       c AS (SELECT sx//2 AS gx, sy//2 AS gy, z, count(*) AS n
             FROM s GROUP BY sx//2, sy//2, z),
       m AS (SELECT gx, gy, z,
                    row_number() OVER (PARTITION BY gx, gy
                                       ORDER BY n DESC, z ASC) AS rk
             FROM c)
       SELECT gx, gy, round(z, 6) AS v FROM m WHERE rk = 1 AND z <> 0""",
)
def q159(spark, sf_dir):
    """gdalwarp MODE (GRA_Mode): most frequent footprint value, ties
    broken by SMALLEST value (pinned deterministic contract; the
    reference's tie order is accumulation-scan-dependent)."""
    from gdal_spark.operators.warp import warp_resample

    out = warp_resample(
        _dem_tiles(spark), IDENTITY_GT, (0.0, 2.0, 0.0, 0.0, 0.0, 2.0),
        64, 64, tile_size=32, method="mode",
    )
    feats = tiles_to_features(out, tile_size=32, nodata=0.0)
    return feats.select("gx", "gy", F.round("v", 6).alias("v"))


@query(
    "q160_warp_rms",
    f"""WITH {_WARP_DOWN_SRC},
       o AS (SELECT sx//2 AS gx, sy//2 AS gy, sqrt(SUM(z*z)/4.0) AS v
             FROM s GROUP BY sx//2, sy//2)
       SELECT gx, gy, round(v, 6) AS v FROM o WHERE v <> 0""",
)
def q160(spark, sf_dir):
    """gdalwarp RMS (GRA_RMS, alg/gdalwarpkernel.cpp GWKAverageOrMode
    nAlgo=6): sqrt of the footprint mean square — integer z makes the
    radicand exact on both engines."""
    from gdal_spark.operators.warp import warp_resample

    out = warp_resample(
        _dem_tiles(spark), IDENTITY_GT, (0.0, 2.0, 0.0, 0.0, 0.0, 2.0),
        64, 64, tile_size=32, method="rms",
    )
    feats = tiles_to_features(out, tile_size=32, nodata=0.0)
    return feats.select("gx", "gy", F.round("v", 6).alias("v"))


# --- geodesic (ellipsoid) length / area (q161-q162) -------------------------
# Reference surface: get_GeodesicLength / get_GeodesicArea
# (ogr/ogrlinestring.cpp:3224-3260) and the SQLite dialect's
# Area(geom, ellipsoid) (ogrsqlitesqlfunctions.cpp).  The kernels are
# PROJ-free re-statements (Vincenty inverse; authalic-sphere excess —
# kernels/geodesy.py), independently anchored in tests/test_geodesic.py
# against Gauss-Legendre meridian quadrature, the exact equator arc and
# closed-form lat-lon band areas.  DuckDB has no geodesic machinery, so
# the oracle inlines the kernel's Python-computed doubles verbatim
# (the q85 inline-constants recipe) — the INDEPENDENT verification
# lives in the pytest anchors.


def _geodesic_fixture(k: int):
    lat0 = -60.0 + (k * 7) % 120
    lon0 = -170.0 + (k * 13) % 340
    dlat = 1.0 + k % 5
    dlon = 1.0 + k % 7
    return lat0, lon0, dlat, dlon


def _geodesic_oracle_rows():
    from gdal_spark.kernels.geodesy import (
        geodesic_line_length,
        geodesic_ring_area,
    )

    rows = []
    for k in range(25):
        lat0, lon0, dlat, dlon = _geodesic_fixture(k)
        lats = np.array([lat0, lat0 + dlat, lat0 + dlat])
        lons = np.array([lon0, lon0, lon0 + dlon])
        length = geodesic_line_length(lats, lons)
        n = 33
        blats = np.concatenate([
            np.full(n, lat0), np.linspace(lat0, lat0 + dlat, n),
            np.full(n, lat0 + dlat), np.linspace(lat0 + dlat, lat0, n),
        ])
        blons = np.concatenate([
            np.linspace(lon0, lon0 + dlon, n), np.full(n, lon0 + dlon),
            np.linspace(lon0 + dlon, lon0, n), np.full(n, lon0),
        ])
        # build the ring EXACTLY as q162's engine path does (stack +
        # explicit closure): np.sum's pairwise tree depends on array
        # LENGTH, so the replayed constant must come from the
        # identically-shaped input
        ring = np.stack([blons, blats], axis=1)
        ring = np.vstack([ring, ring[:1]])
        area = geodesic_ring_area(ring[:, 1], ring[:, 0])
        rows.append((k, length, area))
    return rows


_GEO_ROWS = _geodesic_oracle_rows()


@query(
    "q161_geodesic_length",
    "SELECT * FROM (VALUES "
    + ", ".join(
        f"(CAST({k} AS BIGINT), CAST('{v!r}' AS DOUBLE))" for k, v, _a in _GEO_ROWS
    )
    + ") AS t(fid, length_m)",
)
def q161(spark, sf_dir):
    """Geodesic LENGTH (meters, WGS84) of a meridian+parallel-chord
    polyline per feature — ST_GeodesicLength over the same fixture the
    inlined oracle constants replay; Vincenty inverse per segment,
    anchored absolutely in tests/test_geodesic.py."""
    from gdal_spark.functions.st import st_geodesic_length

    rows = []
    for r in _t(spark, sf_dir, "nation").select("n_nationkey").collect():
        k = int(r[0])
        lat0, lon0, dlat, dlon = _geodesic_fixture(k)
        coords = np.array([
            [lon0, lat0], [lon0, lat0 + dlat], [lon0 + dlon, lat0 + dlat],
        ])
        rows.append((k, W.linestring_wkb(coords)))
    layer = local_df(spark, rows, "fid long, geom binary").repartition(8)
    return layer.select(
        "fid", st_geodesic_length(F.col("geom")).alias("length_m")
    )


@query(
    "q162_geodesic_area",
    "SELECT * FROM (VALUES "
    + ", ".join(
        f"(CAST({k} AS BIGINT), CAST('{a!r}' AS DOUBLE))" for k, _v, a in _GEO_ROWS
    )
    + ") AS t(fid, area_m2)",
)
def q162(spark, sf_dir):
    """Geodesic AREA (m², WGS84) of an edge-densified lat-lon box per
    feature — ST_Area_Ellipsoid (authalic-sphere excess); the pytest
    anchors pin the kernel against the CLOSED-FORM band area to 1e-8
    relative, the oracle replays the same doubles."""
    from gdal_spark.functions.st import st_geodesic_area

    rows = []
    for r in _t(spark, sf_dir, "nation").select("n_nationkey").collect():
        k = int(r[0])
        lat0, lon0, dlat, dlon = _geodesic_fixture(k)
        n = 33
        blats = np.concatenate([
            np.full(n, lat0), np.linspace(lat0, lat0 + dlat, n),
            np.full(n, lat0 + dlat), np.linspace(lat0 + dlat, lat0, n),
        ])
        blons = np.concatenate([
            np.linspace(lon0, lon0 + dlon, n), np.full(n, lon0 + dlon),
            np.linspace(lon0 + dlon, lon0, n), np.full(n, lon0),
        ])
        ring = np.stack([blons, blats], axis=1)
        ring = np.vstack([ring, ring[:1]])
        rows.append((k, W.polygon_wkb([ring])))
    layer = local_df(spark, rows, "fid long, geom binary").repartition(8)
    return layer.select(
        "fid", st_geodesic_area(F.col("geom")).alias("area_m2")
    )


# --- RAT + complex pixel types (q163-q164) ----------------------------------


@query(
    "q163_raster_attribute_table",
    f"""WITH s AS (SELECT gx.range AS gx, gy.range AS gy,
                   CAST({_z_sql('gx.range', 'gy.range')} AS DOUBLE) AS z
            FROM range(128) gx, range(128) gy),
       c AS (SELECT z AS value, count(*) AS count FROM s WHERE z <> 0 GROUP BY z),
       t AS (SELECT SUM(count) AS tot FROM c)
       SELECT value, count,
              count/tot AS pct,
              (SUM(count) OVER (ORDER BY value))/tot AS cum_pct,
              CAST(row_number() OVER (ORDER BY value) AS INT) AS rnk
       FROM c, t""",
)
def q163(spark, sf_dir):
    """Raster Attribute Table (gcore/gdal_rat.cpp:
    GDALRasterAttributeTable — GFU_MinMax value + GFU_PixelCount rows,
    plus the cumulative columns its binning consumers derive) built as
    ONE histogram pass + a value-keyed groupBy: the RAT is literally a
    DataFrame.  Integer counts keep every pct division bitwise on both
    engines (no in-query rounding needed)."""
    from gdal_spark.operators.rat import build_rat

    return build_rat(_dem_tiles(spark), tile_size=DEM_TILE, nodata=0.0)


@query(
    "q164_complex_calc",
    """WITH g AS (SELECT gx.range AS gx, gy.range AS gy
                  FROM range(128) gx, range(128) gy),
       z AS (SELECT gx, gy,
               CAST((gx*3 + gy*5)%17 AS DOUBLE) AS ra,
               CAST((gx*7 + gy*2)%13 AS DOUBLE) AS ia,
               CAST((gx*2 + gy*3)%11 AS DOUBLE) AS rb,
               CAST((gx*5 + gy*7)%19 AS DOUBLE) AS ib
             FROM g),
       p AS (SELECT gx, gy, ra*rb - ia*ib AS re, ra*ib + ia*rb AS im FROM z)
       SELECT gx, gy, re, im FROM p WHERE re <> 0 OR im <> 0""",
)
def q164(spark, sf_dir):
    """COMPLEX pixel types (gcore/gdal.h:49-66 GDT_CFloat32) with the
    pixel-function algebra (frmts/vrt/pixelfunctions.cpp conj/mult):
    A · conj(conj(B)) = A·B per pixel over two complex64 bands —
    interleaved (re, im) float32 tiles, zero-copy complex view,
    (tx, ty) equi-join; small integer parts keep float32 exact."""
    from gdal_spark.operators.complexcalc import (
        complex_conj_mult,
        complex_to_features,
        complex_unary,
    )
    from gdal_spark.operators.rasterize import TILE_SCHEMA

    ts, wh = 32, 128
    ntx = wh // ts

    def gen(formula):
        def inner(pdf_iter):
            for pdf in pdf_iter:
                rows = []
                for _, row in pdf.iterrows():
                    t = int(row["id"])
                    tx, ty = t % ntx, t // ntx
                    gx = np.arange(ts) + tx * ts
                    gy = np.arange(ts) + ty * ts
                    GX, GY = np.meshgrid(gx, gy)
                    re, im = formula(GX, GY)
                    z = (re + 1j * im).astype(np.complex64)
                    rows.append((0, tx, ty, 1, z.tobytes(), "complex64", 0.0))
                yield pd.DataFrame(
                    rows,
                    columns=["z", "tx", "ty", "band", "data", "dtype", "nodata"],
                )

        return inner

    base = spark.range(ntx * ntx).repartition(4)
    A = base.mapInPandas(
        gen(lambda X, Y: ((X * 3 + Y * 5) % 17, (X * 7 + Y * 2) % 13)),
        TILE_SCHEMA,
    )
    B = base.mapInPandas(
        gen(lambda X, Y: ((X * 2 + Y * 3) % 11, (X * 5 + Y * 7) % 19)),
        TILE_SCHEMA,
    )
    prod = complex_conj_mult(A, complex_unary(B, "conj", tile_size=ts), tile_size=ts)
    return complex_to_features(prod, tile_size=ts)


# --- web-pipeline depth: URL dedup, contamination, repetition (q165-q167) ---
# CCNet/Dolma-class operators over the documents table — the
# Common-Crawl-side of the graft: URL canonicalization before exact
# dedup, benchmark n-gram contamination screening, intra-document
# repetition measurement.  All three are PURE JVM Column plans (split/
# transform/slice/regexp — zero Python in the hot path).

_URL_RAW_SQL = """
    'http://' ||
    CASE WHEN doc_id%3 = 0 THEN 'WWW.' ELSE '' END ||
    'Site' || CAST(doc_id%40 AS VARCHAR) || '.example.COM' ||
    CASE WHEN doc_id%5 = 0 THEN ':80' END_PORT ||
    '/Articles/item' || CAST(doc_id%50 AS VARCHAR) ||
    CASE WHEN doc_id%2 = 0 THEN '/' ELSE '' END ||
    CASE WHEN doc_id%4 = 0 THEN '?utm_source=feed&ref=' || CAST(doc_id%7 AS VARCHAR)
         WHEN doc_id%4 = 1 THEN '?ref=' || CAST(doc_id%7 AS VARCHAR) || '&utm_campaign=x'
         ELSE '' END ||
    CASE WHEN doc_id%7 = 0 THEN '#section2' ELSE '' END
""".replace("END_PORT", "ELSE '' END")


def _url_raw_col():
    d = F.col("doc_id")
    return F.concat(
        F.lit("http://"),
        F.when(d % 3 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.lit("Site"), (d % 40).cast("string"), F.lit(".example.COM"),
        F.when(d % 5 == 0, F.lit(":80")).otherwise(F.lit("")),
        F.lit("/Articles/item"), (d % 50).cast("string"),
        F.when(d % 2 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(d % 4 == 0,
               F.concat(F.lit("?utm_source=feed&ref="), (d % 7).cast("string")))
        .when(d % 4 == 1,
              F.concat(F.lit("?ref="), (d % 7).cast("string"),
                       F.lit("&utm_campaign=x")))
        .otherwise(F.lit("")),
        F.when(d % 7 == 0, F.lit("#section2")).otherwise(F.lit("")),
    )


@query(
    "q165_url_canonical_dedup",
    f"""WITH d AS (SELECT doc_id, {_URL_RAW_SQL} AS url FROM documents),
       c AS (SELECT doc_id,
               'https://' ||
               regexp_replace(regexp_replace(
                 lower(regexp_extract(regexp_replace(url, '#.*$', ''),
                                      '^https?://([^/?#]+)', 1)),
                 '^www\\.', ''), ':80$', '') ||
               regexp_replace(regexp_replace(regexp_replace(
                 regexp_replace(regexp_replace(regexp_replace(
                   url, '#.*$', ''), '&utm_[a-z]+=[^&]*', ''),
                   '\\?utm_[a-z]+=[^&]*&', '?'), '\\?utm_[a-z]+=[^&]*$', ''),
                 '^https?://[^/?#]*', ''), '(/+)(\\?|$)', '\\2')
               AS canon
             FROM d)
       SELECT canon AS canon_url, CAST(min(doc_id) AS BIGINT) AS keeper_id,
              CAST(count(*) AS BIGINT) AS n_dups
       FROM c GROUP BY canon HAVING count(*) > 1""",
)
def q165(spark, sf_dir):
    """URL canonicalization + exact dedup — the normalization a
    Common-Crawl pipeline applies before URL-level dedup (lowercased
    scheme+host, www./default-port stripped, utm_* tracking params and
    fragments dropped, trailing slash removed), as a pure JVM
    regexp-Column chain (functions/text.py::canonical_url); keeper =
    min doc_id per canonical URL, groups of size > 1 reported."""
    from gdal_spark.functions.text import canonical_url

    docs = _t(spark, sf_dir, "documents").withColumn("url", _url_raw_col())
    canon = docs.select("doc_id", canonical_url(F.col("url")).alias("canon_url"))
    return (
        canon.groupBy("canon_url")
        .agg(
            F.min("doc_id").alias("keeper_id"),
            F.count("*").alias("n_dups"),
        )
        .filter(F.col("n_dups") > 1)
    )


@query(
    "q166_contamination_ngram",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
       bench AS (SELECT array_to_string(words[1:8], ' ') AS gram
                 FROM w WHERE doc_id%25 = 0 AND len(words) >= 8),
       grams AS (SELECT w.doc_id,
                        array_to_string(words[r.range:r.range+7], ' ') AS gram
                 FROM w, range(1, 2000) r
                 WHERE r.range <= len(words) - 7),
       hits AS (SELECT DISTINCT g.doc_id, g.gram
                FROM grams g JOIN bench b ON g.gram = b.gram),
       guard AS (SELECT CASE WHEN max(len(words)) > 1999 THEN
                   error('q166 oracle range(1,2000) bound exceeded by fixture')
                 ELSE 1 END AS ok FROM w)
       SELECT doc_id, CAST(count(*) AS BIGINT) AS n_benchmark_hits
       FROM hits, guard GROUP BY doc_id""",
)
def q166(spark, sf_dir):
    """Benchmark CONTAMINATION screening (the n-gram-overlap
    decontamination step of a training pipeline): every document whose
    text contains any 8-gram from the benchmark set (here: the first
    8-gram of every 25th document).  Spark plan: documents →
    transform/slice 8-gram arrays (JVM) → explode → broadcast
    semi-ish join with the tiny benchmark table → per-doc distinct-hit
    count.  At 100 TB the benchmark side stays broadcast-sized and the
    doc side is one projection + explode — no shuffle of full texts."""
    from gdal_spark.functions.text import word_ngrams

    docs = _t(spark, sf_dir, "documents")
    bench = (
        docs.filter(F.col("doc_id") % 25 == 0)
        .select(
            F.expr(
                "array_join(slice(split(text, ' '), 1, 8), ' ')"
            ).alias("gram")
        )
        .filter(F.expr("size(split(text, ' ')) >= 8"))
        .distinct()
    )
    grams = docs.select(
        "doc_id", F.explode(word_ngrams("text", 8)).alias("gram")
    )
    hits = grams.join(F.broadcast(bench), "gram").select("doc_id", "gram").distinct()
    return hits.groupBy("doc_id").agg(F.count("*").alias("n_benchmark_hits"))


@query(
    "q167_repetition_stats",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
       chunks AS (SELECT doc_id,
                         array_to_string(words[(r.range-1)*2+1:r.range*2], ' ') AS chunk
                  FROM w, range(1, 600) r
                  WHERE (r.range-1)*2 + 1 <= len(words)),
       s AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
                    CAST(count(DISTINCT chunk) AS BIGINT) AS n_distinct
             FROM chunks GROUP BY doc_id),
       guard AS (SELECT CASE WHEN max(len(words)) > 2*599 THEN
                   error('q167 oracle range(1,600) bound exceeded by fixture')
                 ELSE 1 END AS ok FROM w)
       SELECT doc_id, n_chunks, n_distinct,
              CAST(n_chunks - n_distinct AS BIGINT) AS n_repeated
       FROM s, guard WHERE n_chunks - n_distinct > 0""",
)
def q167(spark, sf_dir):
    """Intra-document REPETITION measurement (the C4/Dolma repeated-
    paragraph signal): texts chunk into fixed 2-word windows; repeated
    chunks within one document are counted — the gate a quality filter
    thresholds on.  JVM transform/slice chunking + per-doc distinct
    aggregation; word-salad fixtures repeat chunks often enough to
    exercise the path."""
    docs = _t(spark, sf_dir, "documents")
    chunks = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, CAST(ceil(size(split(text, ' '))/2.0) AS INT) - 1), "
                "i -> array_join(slice(split(text, ' '), i*2 + 1, 2), ' '))"
            )
        ).alias("chunk"),
    )
    s = chunks.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.countDistinct("chunk").alias("n_distinct"),
    )
    return s.select(
        "doc_id", "n_chunks", "n_distinct",
        (F.col("n_chunks") - F.col("n_distinct")).alias("n_repeated"),
    ).filter(F.col("n_repeated") > 0)


# --- cumulative viewshed (q168) ----------------------------------------------


def _wang_chain_sql(ox: int, oy: int, nx: int, ny: int, obs_z: int, prefix: str):
    """One observer's FULL unrolled Wang recurrence (the q150
    generator parameterized by observer position over the SHARED dem
    z(x,y) = (3x+5y) mod 13): returns (ctes, per-pixel union selects).
    Adjusted heights fold to integer literals."""
    def H(x, y):
        return f"CAST({(x * 3 + y * 5) % 13 - obs_z - (ox * 3 + oy * 5) % 13} AS DOUBLE)"

    ctes = []
    stage = 0

    def emit(name, cols, src):
        ctes.append(f"{name} AS (SELECT {', '.join(cols)} FROM {src})")

    def base_cols(prev_from, y):
        cols = []
        for x in range(nx):
            cols.append(f"c{x} AS p{x}" if prev_from else f"{H(x, y)} AS p{x}")
        for x in range(nx):
            cols.append(f"{H(x, y)} AS c{x}")
        return cols

    def pixel_step(x, dfz, carry_rs):
        cols = [f"p{i}" for i in range(nx)]
        for i in range(nx):
            if i == x:
                cols.append(
                    f"CASE WHEN ({dfz}) > c{x} THEN ({dfz}) ELSE c{x} END AS c{x}"
                )
            else:
                cols.append(f"c{i}")
        cols += [f"r{i}" for i in carry_rs]
        cols.append(
            f"CASE WHEN c{x} + 0.0 < ({dfz}) THEN 0.0 ELSE 255.0 END AS r{x}"
        )
        return cols

    def free_step(x, carry_rs):
        return ([f"p{i}" for i in range(nx)]
                + [f"c{i}" for i in range(nx)]
                + [f"r{i}" for i in carry_rs] + [f"255.0 AS r{x}"])

    line_last = {}

    def do_line(y, prev_cte, first):
        nonlocal stage
        name = f"{prefix}{stage}"; stage += 1
        emit(name, base_cols(prev_cte is not None, y),
             prev_cte if prev_cte else "base")
        src = name
        carry = []
        nYo = abs(y - oy)

        def step(x, dfz_expr=None):
            nonlocal src, stage
            nm = f"{prefix}{stage}"; stage += 1
            if dfz_expr is None:
                emit(nm, free_step(x, carry), src)
            else:
                emit(nm, pixel_step(x, dfz_expr, carry), src)
            carry.append(x)
            src = nm

        if first:
            step(ox)
            if ox - 1 >= 0:
                step(ox - 1)
            for px in range(ox - 2, -1, -1):
                n = ox - px
                step(px, f"c{px + 1} * {n} / {n - 1}")
            if ox + 1 < nx:
                step(ox + 1)
            for px in range(ox + 2, nx):
                n = px - ox
                step(px, f"c{px - 1} * {n} / {n - 1}")
        else:
            dfz = f"c{ox}" if nYo == 1 else f"p{ox} * {nYo} / {nYo - 1}"
            step(ox, dfz)
            for px in range(ox - 1, -1, -1):
                nX = ox - px
                if nX == nYo:
                    dfz = f"c{px}" if nYo == 1 else f"p{px + 1} * {nYo} / {nYo - 1}"
                elif nX > nYo:
                    dfz = (f"(p{px + 1} * {nYo} + c{px + 1} * {nX - nYo})"
                           f" / {nX - 1}")
                else:
                    dfz = (f"(p{px + 1} * {nX} + p{px} * {nYo - nX})"
                           f" / {nYo - 1}")
                step(px, dfz)
            for px in range(ox + 1, nx):
                nX = px - ox
                if nX == nYo:
                    dfz = f"c{px}" if nYo == 1 else f"p{px - 1} * {nYo} / {nYo - 1}"
                elif nX > nYo:
                    dfz = (f"(p{px - 1} * {nYo} + c{px - 1} * {nX - nYo})"
                           f" / {nX - 1}")
                else:
                    dfz = (f"(p{px - 1} * {nX} + p{px} * {nYo - nX})"
                           f" / {nYo - 1}")
                step(px, dfz)
        line_last[y] = src
        return src

    first_last = do_line(oy, None, True)
    prev = first_last
    for y in range(oy - 1, -1, -1):
        prev = do_line(y, prev, False)
    prev = first_last
    for y in range(oy + 1, ny):
        prev = do_line(y, prev, False)

    unions = []
    for y in range(ny):
        src = line_last[y]
        for x in range(nx):
            unions.append(f"SELECT {x} AS gx, {y} AS gy, r{x} AS vis FROM {src}")
    return ctes, unions


def _cumulative_viewshed_oracle() -> str:
    all_ctes, all_unions = [], []
    for k in range(9):
        ox, oy = 2 + 2 * (k % 3), 2 + 2 * (k // 3)
        ctes, unions = _wang_chain_sql(ox, oy, 9, 9, 2, prefix=f"o{k}_")
        all_ctes.extend(ctes)
        all_unions.extend(unions)
    return (
        "WITH base AS (SELECT 1 AS one),\n  "
        + ",\n  ".join(all_ctes)
        + ",\n u AS (" + " UNION ALL ".join(all_unions) + ")\n"
        + "SELECT gx, gy, CAST(SUM(vis)/255.0 AS BIGINT) AS n_visible "
        + "FROM u GROUP BY gx, gy"
    )


@query("q168_cumulative_viewshed", _cumulative_viewshed_oracle())
def q168(spark, sf_dir):
    """CUMULATIVE viewshed — the reference's observer-MATRIX mode
    (alg/viewshed/cumulative.cpp: one Wang-executor run per observer,
    per-pixel visibility SUM): a 3×3 observer matrix over one shared
    9×9 DEM; across-observer runs are the distributed axis (the
    reference's thread pool), one groupBy(gx, gy) aggregates the
    count.  Oracle: NINE fully-unrolled recurrence replays (the q150
    generator parameterized by observer position) summed in SQL."""
    from gdal_spark.operators.viewshed import cumulative_viewshed_wang

    dem = np.fromfunction(
        lambda y, x: (x * 3 + y * 5) % 13, (9, 9)
    ).astype(np.float64)
    rows = [
        (k, dem.tobytes(), 2 + 2 * (k % 3), 2 + 2 * (k // 3))
        for k in range(9)
    ]
    obs = local_df(spark, rows, "obs_id long, dem binary, ox int, oy int")
    return cumulative_viewshed_wang(obs, width=9, height=9, obs_z=2.0)


# --- rotated-affine footprint warp (q169-q171) ------------------------------
# Round-3 verdict #3: the one NotImplementedError hole in the warp
# surface.  GWKAverageOrMode under a rotated/sheared geotransform
# back-projects the dst pixel's 4 corners and iterates the src-space
# bbox of the quad (alg/gdalwarpkernel.cpp GWKAverageOrMode).  Fixture:
# integer SHEAR gt_dst=(0,2,1,0,0,2) over the identity source — dst
# pixel (gx,gy) covers src x ∈ [2gx+gy, 2gx+gy+3) half-open bbox
# span → centers {s,s+1,s+2}, y ∈ [2gy, 2gy+2) → {2gy, 2gy+1}:
# 6 contributors, exact integers, minus out-of-raster cells near the
# right edge (src bounds 128x128 passed — exercising the empty- and
# partial-footprint validity contract: cnt==0 emits fill, never 0/1).

_WARP_SHEAR_JOIN = f"""WITH {_WARP_DOWN_SRC},
   g AS (SELECT px.range AS gx, py.range AS gy FROM range(64) px, range(64) py),
   j AS (SELECT g.gx, g.gy, s.z FROM g JOIN s
         ON s.sx >= 2*g.gx + g.gy AND s.sx <= 2*g.gx + g.gy + 2
        AND s.sy >= 2*g.gy AND s.sy <= 2*g.gy + 1)"""

_SHEAR_GT = (0.0, 2.0, 1.0, 0.0, 0.0, 2.0)


def _warp_shear(spark, method):
    from gdal_spark.operators.warp import warp_resample

    out = warp_resample(
        _dem_tiles(spark), IDENTITY_GT, _SHEAR_GT, 64, 64,
        tile_size=32, method=method, src_width=DEM_W, src_height=DEM_H,
    )
    feats = tiles_to_features(out, tile_size=32, nodata=0.0)
    return feats.select("gx", "gy", F.round("v", 6).alias("v"))


@query(
    "q169_warp_average_rotated",
    f"""{_WARP_SHEAR_JOIN},
       o AS (SELECT gx, gy, SUM(z)/count(*) AS v FROM j GROUP BY gx, gy)
       SELECT gx, gy, round(v, 6) AS v FROM o WHERE v <> 0""",
)
def q169(spark, sf_dir):
    """gdalwarp AVERAGE under a SHEARED dst geotransform: mean of the
    (in-raster) src pixels whose centers fall in the bbox of the
    back-projected dst pixel quad; integer z keeps the sum exact in
    any accumulation order, so SUM/count replays the engine bitwise."""
    return _warp_shear(spark, "average")


@query(
    "q170_warp_mode_rotated",
    f"""{_WARP_SHEAR_JOIN},
       c AS (SELECT gx, gy, z, count(*) AS n FROM j GROUP BY gx, gy, z),
       m AS (SELECT gx, gy, z,
                    row_number() OVER (PARTITION BY gx, gy
                                       ORDER BY n DESC, z ASC) AS rk
             FROM c)
       SELECT gx, gy, round(z, 6) AS v FROM m WHERE rk = 1 AND z <> 0""",
)
def q170(spark, sf_dir):
    """gdalwarp MODE under a sheared geotransform — most frequent
    footprint value over the back-projected bbox, ties to the SMALLEST
    value (the pinned deterministic contract from q159)."""
    return _warp_shear(spark, "mode")


@query(
    "q171_warp_rms_rotated",
    f"""{_WARP_SHEAR_JOIN},
       o AS (SELECT gx, gy, sqrt(SUM(z*z)/count(*)) AS v FROM j GROUP BY gx, gy)
       SELECT gx, gy, round(v, 6) AS v FROM o WHERE v <> 0""",
)
def q171(spark, sf_dir):
    """gdalwarp RMS under a sheared geotransform — sqrt of the
    footprint mean square; exact-integer radicand on both engines."""
    return _warp_shear(spark, "rms")


# --- near-antipodal geodesic length (q172) -----------------------------------


def _antipodal_fixture(k: int):
    """25 pairs sweeping the λ-iteration divergence band, incl. exact
    antipodal (k=0) and meridian-mirror pairs; dyadic-exact degrees."""
    lat1 = (k * 7) % 60 + 0.25 * (k % 4)
    lat2 = -lat1 - 0.125 * (k % 5)
    dlon = 180.0 - 0.0625 * k
    return lat1, lat2, dlon


def _antipodal_oracle_rows():
    from gdal_spark.kernels.geodesy import geodesic_line_length

    rows = []
    for k in range(25):
        lat1, lat2, dlon = _antipodal_fixture(k)
        rows.append(
            (k, geodesic_line_length(np.array([lat1, lat2]), np.array([0.0, dlon])))
        )
    return rows


@query(
    "q172_geodesic_antipodal",
    "SELECT * FROM (VALUES "
    + ", ".join(
        f"(CAST({k} AS BIGINT), CAST('{v!r}' AS DOUBLE))"
        for k, v in _antipodal_oracle_rows()
    )
    + ") AS t(fid, length_m)",
)
def q172(spark, sf_dir):
    """Geodesic length across the NEAR-ANTIPODAL band (round-3 verdict
    #4): segments where Vincenty's λ-iteration diverges route to the
    bisection-stabilized auxiliary-sphere fallback (minimum over the 4
    branch symmetry variants, kernels/geodesy.py) — the reference
    serves this band via PROJ's Karney geod_inverse
    (ogr/ogrlinestring.cpp:3224).  Absolute anchors (half-meridian
    perimeter to sub-cm) and band continuity are pinned in
    tests/test_geodesy_antipodal.py; the oracle replays the engine's
    exact doubles."""
    from gdal_spark.functions.st import st_geodesic_length

    rows = []
    for k in range(25):
        lat1, lat2, dlon = _antipodal_fixture(k)
        coords = np.array([[0.0, lat1], [dlon, lat2]])
        rows.append((k, W.linestring_wkb(coords)))
    layer = local_df(spark, rows, "fid long, geom binary").repartition(8)
    return layer.select(
        "fid", st_geodesic_length(F.col("geom")).alias("length_m")
    )


# --- datum shift + equal-area projection (q173-q174) ------------------------
# Coordinate-transform widening (round-3 "missing #3"): the closed-form
# pieces of a PROJ datum pipeline that need no grid files — the
# position-vector 7-parameter Helmert (EPSG 9606) through ECEF, and the
# Albers equal-area conic (Snyder §14).  Same oracle contract as
# q121/q122: forward → EXACT inverse must return the integer-derived
# inputs at 6 dp, so the oracle is the input formula itself; absolute
# anchors (translation/rotation norms, the equal-area Jacobian) live in
# tests/test_proj_round4.py.

_ARCSEC = math.pi / 180.0 / 3600.0
_HELMERT_ED50ISH = (
    -87.0, -96.0, -120.0, 1.0 * _ARCSEC, 2.0 * _ARCSEC, -3.0 * _ARCSEC, 5e-6
)


@query(
    "q173_helmert_datum_roundtrip",
    """SELECT n_nationkey AS n,
            CAST((n_nationkey*67)%360 AS DOUBLE) - 180.0 + 0.31 AS lon,
            CAST((n_nationkey*41)%160 AS DOUBLE) - 80.0 + 0.17 AS lat,
            CAST((n_nationkey*13)%500 AS DOUBLE) AS h
       FROM nation""",
)
def q173(spark, sf_dir):
    """WGS84 → ECEF → 7-param Helmert (ED50-magnitude params) → exact
    algebraic inverse → geodetic round trip; the repartition splits the
    forward and inverse codegen stages (functions/proj.py:helmert7)."""
    from gdal_spark.functions import proj as P

    pts = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n"),
        (((F.col("n_nationkey") * 67) % 360).cast("double") - 180.0 + 0.31).alias("lon0"),
        (((F.col("n_nationkey") * 41) % 160).cast("double") - 80.0 + 0.17).alias("lat0"),
        ((F.col("n_nationkey") * 13) % 500).cast("double").alias("h0"),
    )
    X, Y, Z = P.geodetic_to_ecef(F.col("lon0"), F.col("lat0"), F.col("h0"))
    Xs, Ys, Zs = P.helmert7(X, Y, Z, _HELMERT_ED50ISH)
    fwd = pts.select(
        "n", "lon0", "lat0", "h0", Xs.alias("xs"), Ys.alias("ys"), Zs.alias("zs")
    ).repartition(8)
    Xb, Yb, Zb = P.helmert7_inverse(
        F.col("xs"), F.col("ys"), F.col("zs"), _HELMERT_ED50ISH
    )
    lon2, lat2, h2 = P.ecef_to_geodetic(Xb, Yb, Zb)
    return fwd.select(
        "n",
        F.round(lon2, 6).alias("lon"),
        F.round(lat2, 6).alias("lat"),
        F.round(h2, 6).alias("h"),
    )



@query(
    "q174_albers_roundtrip",
    """SELECT n_nationkey AS n,
            CAST((n_nationkey*59)%140 AS DOUBLE) - 125.0 + 0.23 AS lon,
            CAST((n_nationkey*31)%45 AS DOUBLE) + 25.0 + 0.11 AS lat
       FROM nation""",
)
def q174(spark, sf_dir):
    """WGS84 → Albers equal-area conic (CONUS 29.5/45.5) → WGS84 round
    trip; the equal-area Jacobian anchor is the independent absolute
    check (tests/test_proj_round4.py::test_albers_equal_area_jacobian)."""
    from gdal_spark.functions import proj as P

    pts = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n"),
        (((F.col("n_nationkey") * 59) % 140).cast("double") - 125.0 + 0.23).alias("lon0"),
        (((F.col("n_nationkey") * 31) % 45).cast("double") + 25.0 + 0.11).alias("lat0"),
    )
    x, y = P.lonlat_to_aea(F.col("lon0"), F.col("lat0"), 29.5, 45.5, 23.0, -96.0)
    fwd = pts.select("n", "lon0", "lat0", x.alias("x"), y.alias("y")).repartition(8)
    lon2, lat2 = P.aea_to_lonlat(F.col("x"), F.col("y"), 29.5, 45.5, 23.0, -96.0)
    return fwd.select(
        "n", F.round(lon2, 6).alias("lon"), F.round(lat2, 6).alias("lat")
    )


# --- geometry factory + SQL-dialect completions (q175-q177) ------------------


@query(
    "q175_organize_polygons",
    """SELECT CAST(n_nationkey AS BIGINT) AS fid, r.ring_id, r.parent, r.role,
              CAST(CASE r.ring_id
                   WHEN 0 THEN (16 + n_nationkey%3) * 16
                   WHEN 1 THEN 64
                   WHEN 2 THEN 25
                   WHEN 3 THEN (1 + n_nationkey%2)
                   ELSE 16 END AS DOUBLE) AS r_area
       FROM nation, (VALUES (CAST(0 AS INT), CAST(-1 AS INT), 'shell'),
                            (CAST(1 AS INT), CAST(0 AS INT), 'hole'),
                            (CAST(2 AS INT), CAST(-1 AS INT), 'shell'),
                            (CAST(3 AS INT), CAST(2 AS INT), 'hole'),
                            (CAST(4 AS INT), CAST(-1 AS INT), 'shell'))
                 AS r(ring_id, parent, role)""",
)
def q175(spark, sf_dir):
    """OGRGeometryFactory::organizePolygons METHOD=DEFAULT
    (ogr/ogrgeometryfactory.cpp): a bag of unordered rings per feature
    is organized into shells and holes by even-odd containment depth
    (hole parent = smallest-area even-depth container).  Three-level
    nesting fixture: shell ⊃ hole ⊃ island ⊃ inner-hole, plus a
    disjoint shell; distributed per-feature via groupBy(fid)
    applyInPandas over kernels/geomops.organize_rings."""
    from gdal_spark.kernels.geomops import organize_rings

    def rect(x0, y0, w, h):
        return np.array(
            [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h], [x0, y0]],
            dtype=np.float64,
        )

    rows = []
    for r in _t(spark, sf_dir, "nation").select("n_nationkey").collect():
        k = int(r[0])
        rings = [
            rect(0, 0, 16 + k % 3, 16),
            rect(2, 2, 8, 8),
            rect(3, 3, 5, 5),
            rect(4, 4, 1 + k % 2, 1),
            rect(30, 0, 4, 4),
        ]
        for rid, ring in enumerate(rings):
            rows.append((k, rid, W.polygon_wkb([ring])))
    layer = local_df(spark, rows, "fid long, ring_id int, geom binary").repartition(8)

    def organize(key, pdf):
        pdf = pdf.sort_values("ring_id").reset_index(drop=True)
        rings = []
        areas = []
        for b in pdf["geom"]:
            _t2, parts = W.parse_wkb(bytes(b))
            ring = parts[0]
            rings.append(ring)
            c = ring[:-1]
            areas.append(abs(0.5 * float(np.sum(
                c[:, 0] * np.roll(c[:, 1], -1) - np.roll(c[:, 0], -1) * c[:, 1]
            ))))
        res = organize_rings(rings)
        return pd.DataFrame({
            "fid": [int(key[0])] * len(res),
            "ring_id": [int(pdf["ring_id"][j]) for j, _p, _r in res],
            "parent": [int(p) for _j, p, _r in res],
            "role": [s for _j, _p, s in res],
            "r_area": [areas[j] for j, _p, _r in res],
        })

    return layer.groupBy("fid").applyInPandas(
        organize,
        "fid long, ring_id int, parent int, role string, r_area double",
    )


_WRAP_F = """f AS (SELECT CAST(n_nationkey AS BIGINT) AS fid,
         170 + n_nationkey%8 AS lon0, 6 + n_nationkey%5 AS w,
         -20 + (n_nationkey%4)*5 AS lat0, 3 + n_nationkey%3 AS h
    FROM nation)"""


@query(
    "q176_wrapdateline",
    f"""WITH {_WRAP_F},
       west AS (SELECT fid, CAST(0 AS INT) AS pi, CAST(0 AS INT) AS ri,
              CAST(4 AS INT) AS n_pts,
              CAST({_vsum2(["2*lon0", "2*least(lon0+w, 180)",
                            "2*least(lon0+w, 180)", "2*lon0"])} AS BIGINT) AS vsum_x,
              CAST({_vsum2(["2*lat0", "2*lat0", "2*(lat0+h)", "2*(lat0+h)"])}
                   AS BIGINT) AS vsum_y,
              round(CAST((least(lon0+w, 180) - lon0) * h AS DOUBLE), 6) AS r_area
         FROM f),
       east AS (SELECT fid, CAST(1 AS INT) AS pi, CAST(0 AS INT) AS ri,
              CAST(4 AS INT) AS n_pts,
              CAST({_vsum2(["2*(-180)", "2*(lon0+w-360)",
                            "2*(lon0+w-360)", "2*(-180)"])} AS BIGINT) AS vsum_x,
              CAST({_vsum2(["2*lat0", "2*lat0", "2*(lat0+h)", "2*(lat0+h)"])}
                   AS BIGINT) AS vsum_y,
              round(CAST((lon0+w-180) * h AS DOUBLE), 6) AS r_area
         FROM f WHERE lon0 + w > 180)
       SELECT * FROM west UNION ALL SELECT * FROM east""",
)
def q176(spark, sf_dir):
    """Antimeridian WRAPDATELINE split (transformWithOptions,
    ogr/ogrgeometryfactory.cpp): rects straddling lon=180 (continuous
    longitudes) split into a west piece and an east piece shifted by
    −360 through the exact noder (vertices ON the meridian are its
    degenerate class); canonical-ring vertex checksums, interval-
    arithmetic oracle."""
    from gdal_spark.functions.st import st_wrapdateline

    rows = []
    for r in _t(spark, sf_dir, "nation").select("n_nationkey").collect():
        k = int(r[0])
        lon0, w = 170 + k % 8, 6 + k % 5
        lat0, h = -20 + (k % 4) * 5, 3 + k % 3
        ring = np.array(
            [[lon0, lat0], [lon0 + w, lat0], [lon0 + w, lat0 + h],
             [lon0, lat0 + h], [lon0, lat0]],
            dtype=np.float64,
        )
        rows.append((k, W.polygon_wkb([ring])))
    layer = local_df(spark, rows, "fid long, geom binary").repartition(8)
    res = layer.select("fid", st_wrapdateline(F.col("geom")).alias("geom"))
    return _checksum_rows(res)


@query(
    "q177_hstore_get_value",
    """SELECT doc_id,
              'c' || CAST(doc_id%5 AS VARCHAR) AS color,
              's' || CAST(doc_id%3 AS VARCHAR) AS size
       FROM documents WHERE doc_id%2 = 0""",
)
def q177(spark, sf_dir):
    """HSTORE_GET_VALUE (OGR SQL special op, ogr/ogr_swq.h:42-81 +
    swq_op_general.cpp) — the reference parses 'k=>v,k=>v' tag strings;
    Spark-side this is the built-in str_to_map (JVM, no UDF).  The
    engine PARSES the constructed tag string; the oracle replays the
    value formulas."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 0)
    tagged = docs.select(
        "doc_id",
        F.concat(
            F.lit("color=>c"), (F.col("doc_id") % 5).cast("string"),
            F.lit(",size=>s"), (F.col("doc_id") % 3).cast("string"),
        ).alias("tags"),
    )
    m = F.expr("str_to_map(tags, ',', '=>')")
    return tagged.select(
        "doc_id", m.getItem("color").alias("color"), m.getItem("size").alias("size")
    )


# --- text retrieval scoring: TF-IDF + BM25 (q178-q179) ----------------------
# Training-data curation needs corpus-statistics scoring (quality
# weighting, retrieval-based filtering).  Both use the RATIONAL idf
# variant (N/df instead of ln(N/df)) so every compared value is exact
# integer arithmetic in doubles — the repo's no-raw-transcendentals
# oracle invariant; the ln form differs only by a monotone transform,
# so rankings are identical where df differs.


@query(
    "q178_tfidf_top_term",
    """WITH toks AS (SELECT doc_id,
                unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
            FROM documents),
       tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
              FROM toks GROUP BY doc_id, tok),
       df AS (SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
              FROM toks GROUP BY tok),
       nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM toks),
       sc AS (SELECT t.doc_id, t.tok, t.tf, d.df,
                     CAST(t.tf AS DOUBLE) * n / d.df AS score
              FROM tf t JOIN df d ON t.tok = d.tok, nd),
       rk AS (SELECT doc_id, tok, tf, df, score,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY score DESC, tok ASC) AS rnk
              FROM sc)
       SELECT doc_id, tok AS top_term, tf, df, round(score, 6) AS score
       FROM rk WHERE rnk = 1""",
)
def q178(spark, sf_dir):
    """TF-IDF with rational idf (score = tf·N/df): per-document top
    term, ties to the lexicographically smallest.  Plan: one tokenize
    + two aggregations + a broadcast of the tiny (N) scalar; the df
    table joins on token — at corpus scale both aggregations are
    map-side-combinable and the join key (token) is the natural
    partition; no all-pairs anywhere."""
    docs = _t(spark, sf_dir, "documents")
    # the token table feeds THREE aggregations (tf, df, N) — persist it
    # once (at 10^12 docs this is one tokenize pass instead of three)
    toks = docs.select(
        "doc_id",
        F.explode(F.expr("filter(split(text, ' '), x -> x <> '')")).alias("tok"),
    ).persist()
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    df = toks.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    nd = toks.select(F.countDistinct("doc_id").alias("n"))
    sc = (
        tf.join(df, "tok")
        .join(F.broadcast(nd))
        .withColumn("score", F.col("tf").cast("double") * F.col("n") / F.col("df"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("tok"))
    return (
        sc.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select(
            "doc_id", F.col("tok").alias("top_term"), "tf", "df",
            F.round("score", 6).alias("score"),
        )
    )


@query(
    "q179_bm25",
    """WITH toks AS (SELECT doc_id,
                unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
            FROM documents),
       dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
              FROM toks GROUP BY doc_id),
       stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
                        CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
       q(tok) AS (VALUES ('spark'), ('vector'), ('merge')),
       tf AS (SELECT t.doc_id, t.tok, CAST(count(*) AS BIGINT) AS tf
              FROM toks t JOIN q ON t.tok = q.tok GROUP BY t.doc_id, t.tok),
       df AS (SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
              FROM toks GROUP BY tok),
       terms AS (SELECT f.doc_id, f.tok,
                 (CAST(s.n AS DOUBLE) / d.df)
                 * (CAST(f.tf AS DOUBLE) * (1.2 + 1.0))
                 / (CAST(f.tf AS DOUBLE)
                    + 1.2 * (1.0 - 0.75 + 0.75 * (CAST(l.dl AS DOUBLE) / s.avgdl)))
                 AS term_score
                 FROM tf f JOIN df d ON f.tok = d.tok
                 JOIN dl l ON l.doc_id = f.doc_id, stats s),
       piv AS (SELECT doc_id,
                 max(CASE WHEN tok = 'spark' THEN term_score END) AS s1,
                 max(CASE WHEN tok = 'vector' THEN term_score END) AS s2,
                 max(CASE WHEN tok = 'merge' THEN term_score END) AS s3
               FROM terms GROUP BY doc_id)
       SELECT doc_id,
              round(coalesce(s1, 0.0) + coalesce(s2, 0.0) + coalesce(s3, 0.0), 6)
                  AS bm25
       FROM piv""",
)
def q179(spark, sf_dir):
    """BM25 (k1 = 1.2, b = 0.75, rational idf N/df) of the 3-term
    query {spark, vector, merge} against every document.  The query
    side is a broadcast 3-row table; dl/avgdl are one aggregation;
    per-term scores mirror the oracle's expression tree TERM FOR TERM
    (exact-integer inputs → bitwise doubles).  The per-doc total is a
    FIXED-ORDER pivot sum (max-per-term then s1+s2+s3 left to right) —
    a float SUM over an unordered group would be engine-order-
    dependent in the last ulp (round-3 invariant)."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.expr("filter(split(text, ' '), x -> x <> '')")).alias("tok"),
    )
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    qterms = local_df(
        docs.sparkSession, [("spark",), ("vector",), ("merge",)], "tok string"
    )
    tf = (
        toks.join(F.broadcast(qterms), "tok")
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    df = toks.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    terms = (
        tf.join(df, "tok")
        .join(dl, "doc_id")
        .join(F.broadcast(stats))
        .withColumn(
            "term_score",
            (F.col("n").cast("double") / F.col("df"))
            * (F.col("tf").cast("double") * (1.2 + 1.0))
            / (
                F.col("tf").cast("double")
                + 1.2 * (1.0 - 0.75 + 0.75 * (F.col("dl").cast("double") / F.col("avgdl")))
            ),
        )
    )
    piv = terms.groupBy("doc_id").agg(
        F.max(F.when(F.col("tok") == "spark", F.col("term_score"))).alias("s1"),
        F.max(F.when(F.col("tok") == "vector", F.col("term_score"))).alias("s2"),
        F.max(F.when(F.col("tok") == "merge", F.col("term_score"))).alias("s3"),
    )
    return piv.select(
        "doc_id",
        F.round(
            F.coalesce(F.col("s1"), F.lit(0.0))
            + F.coalesce(F.col("s2"), F.lit(0.0))
            + F.coalesce(F.col("s3"), F.lit(0.0)),
            6,
        ).alias("bm25"),
    )


# --- streaming MinHash-LSH near-dup bucketing (q180) -------------------------


def _q180_sig_sql(j: int) -> str:
    sh = ("list_distinct(list_filter("
          "[substr(text, CAST(i AS INT), 3) for i in range(1, greatest(length(text) - 1, 2))],"
          " s -> length(s) = 3))")
    return (f"list_min(list_transform({sh}, s -> md5('{j}' || s)))")


@query(
    "q180_stream_minhash",
    f"""WITH d AS (SELECT doc_id, text FROM documents
                 UNION ALL SELECT doc_id + 100000, text FROM documents),
       sigs AS (SELECT doc_id,
                md5({_q180_sig_sql(0)} || {_q180_sig_sql(1)} || {_q180_sig_sql(2)} || {_q180_sig_sql(3)}) AS b0,
                md5({_q180_sig_sql(4)} || {_q180_sig_sql(5)} || {_q180_sig_sql(6)} || {_q180_sig_sql(7)}) AS b1
                FROM d),
       b AS (SELECT doc_id, 0 AS band, b0 AS bucket FROM sigs
             UNION ALL SELECT doc_id, 1 AS band, b1 AS bucket FROM sigs)
       SELECT band, bucket, CAST(min(doc_id) AS BIGINT) AS keeper_id,
              CAST(count(*) AS BIGINT) AS n_docs
       FROM b GROUP BY band, bucket""",
)
def q180(spark, sf_dir):
    """STREAMING MinHash-LSH near-dup bucketing: near-dup redeliveries
    arrive in a second micro-batch and the per-(band, bucket) state —
    keeper = min id, n_docs — updates incrementally (ONE stateful agg;
    signatures are stateless array ops, lexicographic min of md5 hex,
    portable verbatim to the oracle).  The drained complete-mode table
    equals the batch bucket table over originals ∪ redeliveries."""
    from gdal_spark.streaming.windowed import stream_minhash_buckets

    return stream_minhash_buckets(spark, f"{sf_dir}/documents.parquet")


# --- PointOnSurface / UnionCascaded / forceTo* (q181-q183) -------------------

_USHAPE_F = """f AS (SELECT CAST(n_nationkey AS BIGINT) AS fid,
         8 + n_nationkey%5 AS wv, 7 + n_nationkey%4 AS hv,
         2 + n_nationkey%2 AS a, 3 AS b
    FROM nation)"""


@query(
    "q181_point_on_surface",
    f"""WITH {_USHAPE_F}
       SELECT fid,
              round(CASE WHEN a >= b THEN CAST(a AS DOUBLE)/2
                    ELSE wv - CAST(b AS DOUBLE)/2 END, 6) AS px,
              round(CAST(hv AS DOUBLE)/2, 6) AS py
       FROM f""",
)
def q181(spark, sf_dir):
    """ST_PointOnSurface (OGRGeometry::PointOnSurface → GEOS
    InteriorPointArea): pinned contract — midpoint of the widest
    interior interval on the envelope-bisector scanline, ties to the
    LEFTMOST interval.  U-shaped fixture: the scanline crosses both
    arms (two interior intervals, widths a and b), so the widest-
    interval logic is genuinely exercised; oracle = the interval
    arithmetic CASE."""
    from gdal_spark.functions.st import st_point_on_surface

    rows = []
    for r in _t(spark, sf_dir, "nation").select("n_nationkey").collect():
        k = int(r[0])
        Wv, Hv = 8 + k % 5, 7 + k % 4
        a, b = 2 + k % 2, 3
        ring = np.array(
            [[0, 0], [Wv, 0], [Wv, Hv], [Wv - b, Hv], [Wv - b, 2],
             [a, 2], [a, Hv], [0, Hv], [0, 0]],
            dtype=np.float64,
        )
        rows.append((k, W.polygon_wkb([ring])))
    layer = local_df(spark, rows, "fid long, geom binary").repartition(8)
    pos = st_point_on_surface(F.col("geom"))
    return layer.select(
        "fid",
        F.round(pos.getItem(0), 6).alias("px"),
        F.round(pos.getItem(1), 6).alias("py"),
    )


_CHAIN_F = """f AS (SELECT CAST(n_nationkey AS BIGINT) AS gid, r.i,
         5 + (n_nationkey + r.i)%3 AS h
    FROM nation, (VALUES (0),(1),(2),(3),(4)) AS r(i))"""


@query(
    "q182_union_cascaded",
    f"""WITH {_CHAIN_F},
       pair AS (SELECT a.gid, a.i,
                       least(a.h, b.h) AS minh
                FROM f a JOIN f b ON a.gid = b.gid AND b.i = a.i + 1),
       s AS (SELECT gid, SUM(6*h) AS raw FROM f GROUP BY gid),
       o AS (SELECT gid, SUM(2*minh) AS ov FROM pair GROUP BY gid)
       SELECT s.gid, CAST(1 AS INT) AS n_polys,
              round(CAST(s.raw - o.ov AS DOUBLE), 6) AS union_area
       FROM s JOIN o ON s.gid = o.gid""",
)
def q182(spark, sf_dir):
    """UnionCascaded (ogrgeometry.cpp:5553): per-group union of an
    overlapping rect CHAIN (rect i spans x ∈ [4i, 4i+6], height
    5+(gid+i)%3 — consecutive rects overlap by 2, non-consecutive are
    disjoint, so union area = Σ6hᵢ − Σ2·min(hᵢ,hᵢ₊₁) exactly and the
    union is one connected polygon).  Exact-noder left fold per group,
    groups distributed."""
    from gdal_spark.operators.overlay import union_cascaded

    rows = []
    for r in _t(spark, sf_dir, "nation").select("n_nationkey").collect():
        k = int(r[0])
        for i in range(5):
            h = 5 + (k + i) % 3
            ring = np.array(
                [[4 * i, 0], [4 * i + 6, 0], [4 * i + 6, h], [4 * i, h],
                 [4 * i, 0]],
                dtype=np.float64,
            )
            rows.append((k, W.polygon_wkb([ring])))
    layer = local_df(spark, rows, "gid long, geom binary").repartition(8)
    return union_cascaded(layer)


@query(
    "q183_force_multi",
    """SELECT CAST(n_nationkey AS BIGINT) AS fid,
              CASE n_nationkey%3 WHEN 0 THEN 'POINT'
                   WHEN 1 THEN 'LINESTRING' ELSE 'POLYGON' END AS type_before,
              CASE n_nationkey%3 WHEN 0 THEN 'MULTIPOINT'
                   WHEN 1 THEN 'MULTILINESTRING' ELSE 'MULTIPOLYGON' END AS type_after
       FROM nation""",
)
def q183(spark, sf_dir):
    """forceToMulti* coercion ladder (OGRGeometryFactory forceTo*,
    ogr/ogrgeometryfactory.cpp): single geometries wrap into their
    1-element multi containers; header-level type names via
    ST_GeometryType (OGR_GEOMETRY pseudo-column semantics)."""
    from gdal_spark.functions.st import st_force_multi, st_geometry_type

    rows = []
    for r in _t(spark, sf_dir, "nation").select("n_nationkey").collect():
        k = int(r[0])
        if k % 3 == 0:
            g = W.point_wkb(float(k), float(k + 1)) if hasattr(W, "point_wkb") \
                else bytes(W.points_wkb(np.array([float(k)]), np.array([float(k + 1)]))[0])
        elif k % 3 == 1:
            g = W.linestring_wkb(np.array([[0.0, 0.0], [float(k + 1), 2.0]]))
        else:
            g = W.polygon_wkb([np.array(
                [[0, 0], [k + 1, 0], [k + 1, 2], [0, 2], [0, 0]], dtype=np.float64
            )])
        rows.append((k, g))
    layer = local_df(spark, rows, "fid long, geom binary").repartition(8)
    return layer.select(
        "fid",
        st_geometry_type(F.col("geom")).alias("type_before"),
        st_geometry_type(st_force_multi(F.col("geom"))).alias("type_after"),
    )


# --- round-4 curation pipeline composition (q184) ----------------------------


@query(
    "q184_curation_pipeline_v2",
    f"""WITH d0 AS (SELECT doc_id, text, lang, {_URL_RAW_SQL} AS url FROM documents),
       c AS (SELECT doc_id, text, lang,
               'https://' ||
               regexp_replace(regexp_replace(
                 lower(regexp_extract(regexp_replace(url, '#.*$', ''),
                                      '^https?://([^/?#]+)', 1)),
                 '^www\\.', ''), ':80$', '') ||
               regexp_replace(regexp_replace(regexp_replace(
                 regexp_replace(regexp_replace(regexp_replace(
                   url, '#.*$', ''), '&utm_[a-z]+=[^&]*', ''),
                   '\\?utm_[a-z]+=[^&]*&', '?'), '\\?utm_[a-z]+=[^&]*$', ''),
                 '^https?://[^/?#]*', ''), '(/+)(\\?|$)', '\\2')
               AS canon
             FROM d0),
       kept AS (SELECT c.* FROM c
                JOIN (SELECT canon, min(doc_id) AS keeper FROM c GROUP BY canon) k
                  ON c.canon = k.canon AND c.doc_id = k.keeper),
       w AS (SELECT doc_id, lang, string_split(text, ' ') AS words FROM kept),
       bench AS (SELECT array_to_string(words[1:8], ' ') AS gram
                 FROM (SELECT string_split(text, ' ') AS words FROM documents
                       WHERE doc_id%25 = 0)
                 WHERE len(words) >= 8),
       grams AS (SELECT w.doc_id,
                        array_to_string(words[r.range:r.range+7], ' ') AS gram
                 FROM w, range(1, 2000) r WHERE r.range <= len(words) - 7),
       dirty AS (SELECT DISTINCT g.doc_id FROM grams g
                 JOIN bench b ON g.gram = b.gram),
       clean AS (SELECT w.doc_id, w.lang,
                        len(list_filter(w.words, x -> x <> '')) AS n_tokens
                 FROM w LEFT JOIN dirty ON w.doc_id = dirty.doc_id
                 WHERE dirty.doc_id IS NULL)
       SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(n_tokens) AS BIGINT) AS total_tokens
       FROM clean GROUP BY lang""",
)
def q184(spark, sf_dir):
    """End-to-end CURATION pipeline v2 — the round-4 web-side ops
    composed into ONE lazy plan: canonical-URL exact dedup (min-id
    keeper) → benchmark 8-gram contamination screen (broadcast
    anti-join) → per-language corpus accounting.  Zero Python
    anywhere: regexp Columns, split/transform n-grams, two
    aggregations, one broadcast.  The composition itself is
    oracle-checked (the q146 pattern)."""
    from gdal_spark.functions.text import canonical_url, word_ngrams

    docs = _t(spark, sf_dir, "documents").withColumn("url", _url_raw_col())
    canon = docs.withColumn("canon", canonical_url(F.col("url")))
    keep = canon.groupBy("canon").agg(F.min("doc_id").alias("keeper"))
    kept = canon.join(
        keep, (canon["canon"] == keep["canon"]) & (canon["doc_id"] == keep["keeper"])
    ).select("doc_id", "text", "lang")
    bench = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 25 == 0)
        .filter(F.expr("size(split(text, ' ')) >= 8"))
        .select(F.expr("array_join(slice(split(text, ' '), 1, 8), ' ')").alias("gram"))
        .distinct()
    )
    grams = kept.select("doc_id", F.explode(word_ngrams("text", 8)).alias("gram"))
    dirty = grams.join(F.broadcast(bench), "gram").select("doc_id").distinct()
    clean = kept.join(dirty, "doc_id", "left_anti").select(
        "doc_id", "lang",
        F.size(F.expr("filter(split(text, ' '), x -> x <> '')")).alias("n_tokens"),
    )
    return clean.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


# --- predicate family completion: touches / crosses (q185-q186) --------------


@query(
    "q185_touches_general",
    """SELECT CAST(n_nationkey AS BIGINT) AS fid,
              CASE n_nationkey%4 WHEN 0 THEN 'touches'
                   WHEN 1 THEN 'touches'
                   WHEN 2 THEN 'overlaps' ELSE 'disjoint' END AS rel
       FROM nation""",
)
def q185(spark, sf_dir):
    """General-polygon TOUCHES (zero-area boundary contact —
    ogrgeometry.cpp Touches, completing the q123 predicate family):
    shared full edge, shared single corner, proper overlap, and
    disjoint variants; contact detection = the degeneracy detector,
    area = the robust clip path."""
    from gdal_spark.functions.st import st_relation_general

    rows = []
    for r in _t(spark, sf_dir, "nation").select("n_nationkey").collect():
        k = int(r[0])
        A = np.array([[0, 0], [10, 0], [10, 8], [0, 8], [0, 0]], dtype=np.float64)
        if k % 4 == 0:      # shared full edge
            B = np.array([[10, 0], [14, 0], [14, 8], [10, 8], [10, 0]], dtype=np.float64)
        elif k % 4 == 1:    # shared single corner
            B = np.array([[10, 8], [13, 8], [13, 11], [10, 11], [10, 8]], dtype=np.float64)
        elif k % 4 == 2:    # proper overlap
            B = np.array([[5, 3], [15, 3], [15, 12], [5, 12], [5, 3]], dtype=np.float64)
        else:               # disjoint
            B = np.array([[12, 0], [15, 0], [15, 4], [12, 4], [12, 0]], dtype=np.float64)
        rows.append((k, W.polygon_wkb([A]), W.polygon_wkb([B])))
    layer = local_df(spark, rows, "fid long, ga binary, gb binary").repartition(8)
    return layer.select(
        "fid", st_relation_general(F.col("ga"), F.col("gb")).alias("rel")
    )


@query(
    "q186_line_crosses",
    """SELECT CAST(n_nationkey AS BIGINT) AS fid,
              CASE n_nationkey%4 WHEN 0 THEN 'crosses'
                   WHEN 1 THEN 'within'
                   WHEN 2 THEN 'touches' ELSE 'disjoint' END AS rel
       FROM nation""",
)
def q186(spark, sf_dir):
    """LINESTRING vs POLYGON predicates (OGRGeometry::Crosses et al):
    a transect through the interior (crosses), a strictly interior
    chord (within), a segment lying ON the boundary (touches), and a
    disjoint segment — classified by midpoint-PIP over the
    boundary-subdivided line (functions/st.py::st_line_relation)."""
    from gdal_spark.functions.st import st_line_relation

    rows = []
    for r in _t(spark, sf_dir, "nation").select("n_nationkey").collect():
        k = int(r[0])
        poly = np.array([[0, 0], [10, 0], [10, 8], [0, 8], [0, 0]], dtype=np.float64)
        if k % 4 == 0:
            line = np.array([[-2, 4], [12, 4]], dtype=np.float64)
        elif k % 4 == 1:
            line = np.array([[1, 1], [9, 7]], dtype=np.float64)
        elif k % 4 == 2:
            line = np.array([[10, 1], [10, 5]], dtype=np.float64)
        else:
            line = np.array([[12, 1], [15, 5]], dtype=np.float64)
        rows.append((k, W.linestring_wkb(line), W.polygon_wkb([poly])))
    layer = local_df(spark, rows, "fid long, gl binary, gp binary").repartition(8)
    return layer.select(
        "fid", st_line_relation(F.col("gl"), F.col("gp")).alias("rel")
    )


# --- corpus-statistics quality + host-level accounting (q187-q188) -----------


@query(
    "q187_rare_ngram_ratio",
    """WITH idx AS (SELECT doc_id, text,
                      unnest(range(1, greatest(length(text) - 1, 2))) AS i
                 FROM documents),
       occ AS (SELECT doc_id, substr(text, CAST(i AS INT), 3) AS gram FROM idx
               WHERE length(substr(text, CAST(i AS INT), 3)) = 3),
       cf AS (SELECT gram, CAST(count(*) AS BIGINT) AS corpus_n
              FROM occ GROUP BY gram),
       j AS (SELECT o.doc_id,
                    CASE WHEN cf.corpus_n < 100 THEN 1 ELSE 0 END AS rare
             FROM occ o JOIN cf ON o.gram = cf.gram)
       SELECT doc_id,
              CAST(count(*) AS BIGINT) AS n_grams,
              CAST(sum(rare) AS BIGINT) AS n_rare,
              round(CAST(sum(rare) AS DOUBLE) / count(*), 6) AS rare_ratio
       FROM j GROUP BY doc_id""",
)
def q187(spark, sf_dir):
    """Rare-n-gram quality ratio (the KenLM-perplexity stand-in a
    CCNet-style filter thresholds, made exact-rational: fraction of a
    document's char-3-gram OCCURRENCES whose corpus frequency is
    below 100).  Two map-side-combinable aggregations + one equi-join
    on gram — the corpus-frequency table is the only shuffled side,
    bounded by the gram vocabulary, not the corpus."""
    docs = _t(spark, sf_dir, "documents")
    occ = docs.select(
        "doc_id",
        F.explode(F.expr(
            "filter(transform(sequence(1, greatest(length(text) - 2, 1)), "
            "i -> substring(text, i, 3)), s -> length(s) = 3)"
        )).alias("gram"),
    ).persist()  # feeds the corpus-frequency agg AND the join side
    cf = occ.groupBy("gram").agg(F.count("*").alias("corpus_n"))
    j = occ.join(cf, "gram").withColumn(
        "rare", F.when(F.col("corpus_n") < 100, 1).otherwise(0)
    )
    return j.groupBy("doc_id").agg(
        F.count("*").alias("n_grams"),
        F.sum("rare").alias("n_rare"),
        F.round(F.sum("rare").cast("double") / F.count("*"), 6).alias("rare_ratio"),
    )


@query(
    "q188_host_stats",
    f"""WITH d AS (SELECT doc_id, n_chars, {_URL_RAW_SQL} AS url FROM documents),
       h AS (SELECT doc_id, n_chars,
                    regexp_replace(lower(regexp_extract(url,
                        '^https?://([^/?#]+)', 1)), '^www\\.', '') AS host
             FROM d)
       SELECT host, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(n_chars) AS BIGINT) AS total_chars,
              CAST(min(doc_id) AS BIGINT) AS first_doc
       FROM h GROUP BY host""",
)
def q188(spark, sf_dir):
    """Host-level corpus accounting (the CCNet/Dolma per-domain filter
    input): host extracted from the URL (lowercased, www-stripped),
    per-host doc count / char mass / first id.  One regexp projection
    + one aggregation — the natural partition key for per-domain
    policies at crawl scale."""
    docs = _t(spark, sf_dir, "documents").withColumn("url", _url_raw_col())
    h = docs.select(
        "doc_id", "n_chars",
        F.regexp_replace(
            F.lower(F.regexp_extract(F.col("url"), "^https?://([^/?#]+)", 1)),
            "^www\\.", "",
        ).alias("host"),
    )
    return h.groupBy("host").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("first_doc"),
    )


# --- exact-substring cross-doc dedup signal (q189) ---------------------------


@query(
    "q189_repeated_spans",
    """WITH idx AS (SELECT doc_id, text,
                      unnest(range(1, greatest(length(text) - 18, 2))) AS i
                 FROM documents),
       g AS (SELECT doc_id, CAST(i AS INT) AS pos,
                    substr(text, CAST(i AS INT), 20) AS gram FROM idx
             WHERE length(substr(text, CAST(i AS INT), 20)) = 20),
       shared AS (SELECT gram FROM g GROUP BY gram
                  HAVING count(DISTINCT doc_id) >= 2),
       hits AS (SELECT doc_id, pos FROM g JOIN shared USING (gram)),
       runs AS (SELECT doc_id, pos,
                       CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
                                                      ORDER BY pos) = 1
                            THEN 0 ELSE 1 END AS is_start
                FROM hits)
       SELECT doc_id,
              CAST(count(*) AS BIGINT) AS n_positions,
              CAST(sum(is_start) AS BIGINT) AS n_spans
       FROM runs GROUP BY doc_id""",
)
def q189(spark, sf_dir):
    """EXACT-SUBSTRING cross-document duplication signal (the
    suffix-array dedup of Lee et al. 2022, re-expressed bucketed: a
    position is 'repeated' iff its 20-char gram occurs in ≥ 2 distinct
    documents; adjacent repeated positions merge into maximal SPANS
    via a lag window).  Shuffle shape: one groupBy(gram) bounded by
    the gram vocabulary + one per-doc window — never doc×doc; at
    10^12 docs the gram table shards by hash exactly like the
    fingerprint dedup."""
    docs = _t(spark, sf_dir, "documents")
    g = docs.select(
        "doc_id",
        F.explode(F.expr(
            "filter(transform(sequence(1, greatest(length(text) - 19, 1)), "
            "i -> struct(i AS pos, substring(text, i, 20) AS gram)), "
            "s -> length(s.gram) = 20)"
        )).alias("pg"),
    ).select(
        "doc_id", F.col("pg.pos").cast("int").alias("pos"),
        F.col("pg.gram").alias("gram"),
    ).persist()  # feeds the shared-gram agg AND the hit join
    shared = (
        g.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram")
    )
    hits = g.join(shared, "gram").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = hits.withColumn(
        "is_start",
        F.when(F.col("pos") - F.lag("pos").over(w) == 1, 0).otherwise(1),
    )
    return runs.groupBy("doc_id").agg(
        F.count("*").alias("n_positions"),
        F.sum("is_start").alias("n_spans"),
    )

# --- host link-graph PageRank, exact integer arithmetic (q190) ----------------

_PR_ITERS = 4  # R_4; growth bound T_4 ≈ 5.2e8 per graph — far inside BIGINT


@query(
    "q190_host_pagerank",
    """WITH hosts AS (SELECT DISTINCT doc_id % 40 AS host FROM documents),
       edges AS (SELECT host AS src, (host + 1) % 40 AS dst FROM hosts
                 UNION ALL SELECT host, (host * 2 + 7) % 40 FROM hosts
                 UNION ALL SELECT host, (host * 3 + 11) % 40 FROM hosts),
       r0 AS (SELECT host, CAST(1 AS BIGINT) AS r FROM hosts),
       r1 AS (SELECT h.host,
                     CAST(9 + coalesce(s.s, 0) AS BIGINT) AS r
              FROM hosts h LEFT JOIN
                   (SELECT e.dst AS host, sum(17 * r.r) AS s
                    FROM edges e JOIN r0 r ON e.src = r.host
                    GROUP BY e.dst) s USING (host)),
       r2 AS (SELECT h.host,
                     CAST(9 * 60 + coalesce(s.s, 0) AS BIGINT) AS r
              FROM hosts h LEFT JOIN
                   (SELECT e.dst AS host, sum(17 * r.r) AS s
                    FROM edges e JOIN r1 r ON e.src = r.host
                    GROUP BY e.dst) s USING (host)),
       r3 AS (SELECT h.host,
                     CAST(9 * 3600 + coalesce(s.s, 0) AS BIGINT) AS r
              FROM hosts h LEFT JOIN
                   (SELECT e.dst AS host, sum(17 * r.r) AS s
                    FROM edges e JOIN r2 r ON e.src = r.host
                    GROUP BY e.dst) s USING (host)),
       r4 AS (SELECT h.host,
                     CAST(9 * 216000 + coalesce(s.s, 0) AS BIGINT) AS r
              FROM hosts h LEFT JOIN
                   (SELECT e.dst AS host, sum(17 * r.r) AS s
                    FROM edges e JOIN r3 r ON e.src = r.host
                    GROUP BY e.dst) s USING (host)),
       n AS (SELECT count(*) AS n FROM hosts)
       SELECT r4.host AS host, r4.r AS rank_scaled,
              CAST(r4.r AS DOUBLE) / CAST(n.n * 12960000 AS DOUBLE) AS pr
       FROM r4, n""",
)
def q190(spark, sf_dir):
    """PageRank over the per-host link graph (damping 0.85, 4
    iterations) in EXACT INTEGER arithmetic, so the result is
    order-free across engines.  With uniform out-degree 3 the scaled
    recurrence is  R_{t+1}(v) = 9*60^t + 17 * sum_{u->v} R_t(u)
    (scale N*60^t: teleport 0.15/N -> 9*60^t, damped transfer
    0.85*r/3 -> 17*R/60; N cancels).  Each iteration is one equi-join
    on src + one map-side-combinable BIGINT sum grouped by dst — the
    standard crawl-graph centrality shape (reference analogue: GNM
    connectivity trees, gnm/gnmgraph.cpp; the web-curation use is
    per-domain authority weighting).  At 10^12 pages the host graph
    is ~10^8 rows: every stage shuffles on host, nothing is
    per-document after the initial distinct."""
    docs = _t(spark, sf_dir, "documents")
    hosts = docs.select((F.col("doc_id") % 40).alias("host")).distinct()
    edges = hosts.select(
        F.col("host").alias("src"),
        F.explode(F.array(
            (F.col("host") + 1) % 40,
            (F.col("host") * 2 + 7) % 40,
            (F.col("host") * 3 + 11) % 40,
        )).alias("dst"),
    )
    ranks = hosts.withColumn("r", F.lit(1).cast("long"))
    for t in range(_PR_ITERS):
        tele = 9 * (60 ** t)
        contrib = (
            edges.join(ranks, edges.src == ranks.host)
            .groupBy("dst")
            .agg(F.sum(F.col("r") * 17).alias("s"))
        )
        ranks = (
            hosts.join(contrib, hosts.host == contrib.dst, "left")
            .select(
                hosts.host,
                (F.lit(tele) + F.coalesce(F.col("s"), F.lit(0))).cast("long").alias("r"),
            )
        )
    n = hosts.agg(F.count("*").alias("n"))
    return ranks.crossJoin(F.broadcast(n)).select(
        "host",
        F.col("r").alias("rank_scaled"),
        (F.col("r").cast("double") / (F.col("n") * 12960000).cast("double")).alias("pr"),
    )


# --- PII detection + redaction accounting (q191) ------------------------------

_PII_EMAIL = "[a-z0-9._%-]+@[a-z0-9.-]+\\.[a-z]{2,4}"
_PII_PHONE = "\\+1-555-[0-9]{4}"
_PII_IP = "10\\.[0-9]{1,3}\\.0\\.1"


@query(
    "q191_pii_redaction",
    """WITH d AS (SELECT doc_id,
                    text || ' contact user' || CAST(doc_id AS VARCHAR) ||
                    '@mail' || CAST(doc_id % 9 AS STRING) ||
                    '.example.org call +1-555-' ||
                    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
                    ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1'
                    AS body FROM documents)
       SELECT doc_id,
              CAST(len(regexp_extract_all(body, '[a-z0-9._%-]+@[a-z0-9.-]+\\.[a-z]{2,4}')) AS BIGINT) AS n_emails,
              CAST(len(regexp_extract_all(body, '\\+1-555-[0-9]{4}')) AS BIGINT) AS n_phones,
              CAST(len(regexp_extract_all(body, '10\\.[0-9]{1,3}\\.0\\.1')) AS BIGINT) AS n_ips,
              CAST(length(body) AS BIGINT) AS raw_len,
              CAST(length(
                regexp_replace(
                  regexp_replace(
                    regexp_replace(body,
                      '[a-z0-9._%-]+@[a-z0-9.-]+\\.[a-z]{2,4}', '[EMAIL]', 'g'),
                    '\\+1-555-[0-9]{4}', '[PHONE]', 'g'),
                  '10\\.[0-9]{1,3}\\.0\\.1', '[IP]', 'g')) AS BIGINT) AS redacted_len
       FROM d""",
)
def q191(spark, sf_dir):
    """PII detection + redaction accounting (the pre-training scrub
    pass every web corpus runs: emails / phone numbers / bare IPs
    found, replaced with typed placeholder tokens, and the char-mass
    delta recorded).  The PII-bearing body is synthesized
    deterministically from doc_id so both engines scan identical
    bytes; detection and redaction are single-pass JVM regexps — no
    Python in the plan, embarrassingly parallel at crawl scale."""
    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    body = F.concat(
        F.col("text"), F.lit(" contact user"), d.cast("string"),
        F.lit("@mail"), (d % 9).cast("string"),
        F.lit(".example.org call +1-555-"),
        F.lpad((d % 10000).cast("string"), 4, "0"),
        F.lit(" from 10."), (d % 256).cast("string"), F.lit(".0.1"),
    )
    b = F.col("body")
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(b, _PII_EMAIL, "[EMAIL]"),
            _PII_PHONE, "[PHONE]"),
        _PII_IP, "[IP]")
    return docs.select("doc_id", body.alias("body")).select(
        "doc_id",
        F.size(F.regexp_extract_all(b, F.lit(_PII_EMAIL), F.lit(0))).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(b, F.lit(_PII_PHONE), F.lit(0))).cast("long").alias("n_phones"),
        F.size(F.regexp_extract_all(b, F.lit(_PII_IP), F.lit(0))).cast("long").alias("n_ips"),
        F.length(b).cast("long").alias("raw_len"),
        F.length(red).cast("long").alias("redacted_len"),
    )


# --- median-cut color quantization, rgb2pct (q192) ----------------------------


def _median_cut_oracle_sql(rounds: int = 3, n: int = 4096) -> str:
    """Mechanically unrolled replay of the round-synchronous median cut
    (the _wang_oracle_sql pattern): one stats/axis/median/split CTE block
    per round, then floor-mean palette + nearest-assignment counts.  All
    integer arithmetic — bitwise across engines by construction."""
    parts = [
        f"px0 AS (SELECT CAST(i AS BIGINT) AS pid,"
        f" CAST((i%5)*47 + (i*7)%19 AS BIGINT) AS r,"
        f" CAST((i%5)*41 + (i*13)%17 AS BIGINT) AS g,"
        f" CAST((i%5)*37 + (i*29)%23 AS BIGINT) AS b,"
        f" CAST(0 AS BIGINT) AS box FROM range(0, {n}) t(i))"
    ]
    for k in range(rounds):
        parts.append(
            f"st{k} AS (SELECT box, min(r) AS minr, max(r) AS maxr,"
            f" min(g) AS ming, max(g) AS maxg, min(b) AS minb, max(b) AS maxb,"
            f" count(*) AS n FROM px{k} GROUP BY box)"
        )
        parts.append(
            f"ax{k} AS (SELECT box, n, CASE"
            f" WHEN (maxr-minr) >= (maxg-ming) AND (maxr-minr) >= (maxb-minb) THEN 0"
            f" WHEN (maxg-ming) >= (maxb-minb) THEN 1 ELSE 2 END AS axis FROM st{k})"
        )
        parts.append(
            f"pv{k} AS (SELECT p.pid, p.r, p.g, p.b, p.box, a.n, CASE"
            f" WHEN a.axis = 0 THEN p.r WHEN a.axis = 1 THEN p.g ELSE p.b END AS v"
            f" FROM px{k} p JOIN ax{k} a USING (box))"
        )
        parts.append(
            f"cum{k} AS (SELECT box, v, n, sum(c) OVER"
            f" (PARTITION BY box ORDER BY v) AS cum FROM"
            f" (SELECT box, v, n, count(*) AS c FROM pv{k} GROUP BY box, v, n) h{k})"
        )
        parts.append(
            f"med{k} AS (SELECT box, min(v) AS m FROM cum{k}"
            f" WHERE 2*cum >= n GROUP BY box)"
        )
        parts.append(
            f"px{k + 1} AS (SELECT p.pid, p.r, p.g, p.b,"
            f" CAST(p.box*2 + CASE WHEN p.v > m.m THEN 1 ELSE 0 END AS BIGINT) AS box"
            f" FROM pv{k} p JOIN med{k} m USING (box))"
        )
    last = f"px{rounds}"
    parts.append(
        f"pal AS (SELECT box,"
        f" CAST((sum(r) - sum(r)%count(*))/count(*) AS BIGINT) AS pal_r,"
        f" CAST((sum(g) - sum(g)%count(*))/count(*) AS BIGINT) AS pal_g,"
        f" CAST((sum(b) - sum(b)%count(*))/count(*) AS BIGINT) AS pal_b,"
        f" CAST(count(*) AS BIGINT) AS n_box FROM {last} GROUP BY box)"
    )
    parts.append(
        f"sc AS (SELECT p.pid, q.box AS pbox,"
        f" (p.r-q.pal_r)*(p.r-q.pal_r) + (p.g-q.pal_g)*(p.g-q.pal_g)"
        f" + (p.b-q.pal_b)*(p.b-q.pal_b) AS dist FROM {last} p, pal q)"
    )
    parts.append(
        "best AS (SELECT pid, pbox FROM (SELECT pid, pbox, row_number() OVER"
        " (PARTITION BY pid ORDER BY dist, pbox) AS rn FROM sc) u WHERE rn = 1)"
    )
    parts.append(
        "nasg AS (SELECT pbox AS box, CAST(count(*) AS BIGINT) AS n_assigned"
        " FROM best GROUP BY pbox)"
    )
    return (
        "WITH " + ",\n".join(parts)
        + "\nSELECT pal.box AS box, pal_r, pal_g, pal_b, n_box,"
        " coalesce(n_assigned, CAST(0 AS BIGINT)) AS n_assigned"
        " FROM pal LEFT JOIN nasg USING (box)"
    )


@query("q192_median_cut_rgb2pct", _median_cut_oracle_sql())
def q192(spark, sf_dir):
    """rgb2pct: median-cut palette (alg/gdalmediancut.cpp re-pinned
    round-synchronous — split EVERY box at the lower median of its
    longest axis, 3 rounds -> 8 colors) + nearest-color assignment
    (alg/gdaldither.cpp without diffusion).  Shuffle keys are the box
    id (≤8 rows broadcast back) and the palette cross-join is a
    broadcast — nothing pixel×pixel at any scale.  Fixture: 4096
    pixels in 5 integer color clusters derived from the pixel id."""
    from gdal_spark.operators.mediancut import median_cut_quantize

    i = F.col("id")
    px = spark.range(4096).select(
        i.cast("long").alias("pid"),
        ((i % 5) * 47 + (i * 7) % 19).cast("long").alias("r"),
        ((i % 5) * 41 + (i * 13) % 17).cast("long").alias("g"),
        ((i % 5) * 37 + (i * 29) % 23).cast("long").alias("b"),
    )
    return median_cut_quantize(px, rounds=3)


# --- VRT pixel-function family completion (q193) ------------------------------


def _dem2_tiles(spark):
    """Second synthetic band (integer formula ⇒ exact doubles), aligned
    with _dem_tiles' tile grid."""
    from gdal_spark.operators.rasterize import TILE_SCHEMA

    ntx, nty = DEM_W // DEM_TILE, DEM_H // DEM_TILE

    def gen(pdf_iter):
        for pdf in pdf_iter:
            rows = []
            for _, row in pdf.iterrows():
                t = int(row["id"])
                tx, ty = t % ntx, t // ntx
                gx = np.arange(DEM_TILE) + tx * DEM_TILE
                gy = np.arange(DEM_TILE) + ty * DEM_TILE
                GX, GY = np.meshgrid(gx, gy)
                z = ((GX * 13 + GY * 7) % 89 + (GY * GY) % 19).astype(np.float64)
                rows.append((0, tx, ty, 1, z.tobytes(), "float64", 0.0))
            yield pd.DataFrame(
                rows, columns=["z", "tx", "ty", "band", "data", "dtype", "nodata"]
            )

    return spark.range(ntx * nty).repartition(4).mapInPandas(gen, TILE_SCHEMA)


@query(
    "q193_pixel_functions",
    f"""WITH g AS (SELECT gx.range AS gx, gy.range AS gy
                   FROM range(128) gx, range(128) gy),
       z AS (SELECT gx, gy,
                    CAST({_z_sql('gx', 'gy')} AS DOUBLE) AS a,
                    CAST((gx*13 + gy*7)%89 + (gy*gy)%19 AS DOUBLE) AS b FROM g)
       SELECT gx, gy,
              CASE WHEN a + b = 0 THEN 0.0 ELSE (a - b)/(a + b) END
              + sqrt(a)
              + (a + 0.25*(b - a))
              + least(a, b)
              + greatest(a, b)
              + (a + b)/2.0 AS v
       FROM z""",
)
def q193(spark, sf_dir):
    """VRT pixel-function family completion (frmts/vrt/
    pixelfunctions.cpp): norm_diff ((a-b)/(a+b) with the reference's
    zero-denominator nodata rule), interpolate_linear (t=0.25), sqrt
    (correctly-rounded IEEE — exact across engines), min / max / mean,
    combined in ONE fixed left-to-right sum so float addition order is
    engine-identical.  Two aligned synthetic bands, one tile-stack
    join, NumPy elementwise evaluation mirroring the SQL expression
    tree term-for-term."""
    from gdal_spark.operators.calc import raster_calc
    from gdal_spark.operators.rasterize import tiles_to_features

    def fn(a, b):
        d = a + b
        nd = np.where(d == 0, 0.0, (a - b) / np.where(d == 0, 1.0, d))
        return (
            nd
            + np.sqrt(a)
            + (a + 0.25 * (b - a))
            + np.minimum(a, b)
            + np.maximum(a, b)
            + (a + b) / 2.0
        )

    out = raster_calc(
        {"a": _dem_tiles(spark), "b": _dem2_tiles(spark)},
        fn, tile_size=DEM_TILE,
    )
    return tiles_to_features(out, tile_size=DEM_TILE, nodata=None)


# --- model-based quality filter + paragraph dedup (q194-q195) -----------------


@query(
    "q194_quality_classifier",
    """WITH f AS (SELECT doc_id, source, length(text) AS n_char,
                    CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                         AS DOUBLE) AS n,
                    CAST(len(list_filter(string_split(text, ' '),
                         x -> x IN ('the','and','of','a'))) AS DOUBLE) AS s,
                    CAST(length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE) AS c,
                    CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS DOUBLE) AS p
              FROM documents WHERE length(text) > 0),
       sc AS (SELECT doc_id, source, n_char,
                     0.5*(s/n) + 0.125*(c/n) - 0.25*(p/n) AS score FROM f)
       SELECT source,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(CASE WHEN score > 0.45 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
              CAST(sum(CASE WHEN score > 0.45 THEN n_char ELSE 0 END) AS BIGINT)
                AS kept_chars
       FROM sc GROUP BY source""",
)
def q194(spark, sf_dir):
    """Model-based quality filter (the CCNet/fastText-style linear
    scorer a web pipeline thresholds before training): score =
    0.5*stopword_ratio + 0.125*mean_token_len - 0.25*punct_ratio.
    DYADIC weights make each term an exact power-of-two scaling of an
    IEEE-exact ratio, and the fixed left-to-right sum keeps the float
    tree engine-identical, so the keep/drop decision is bitwise
    reproducible.  Per-source keep-mass accounting is one
    map-side-combinable aggregation."""
    d = _t(spark, sf_dir, "documents").filter(F.length("text") > 0)
    n = F.size(F.filter(F.split(F.col("text"), " "), lambda x: x != "")).cast("double")
    s = F.size(
        F.filter(F.split(F.col("text"), " "),
                 lambda x: x.isin("the", "and", "of", "a"))
    ).cast("double")
    c = F.length(F.regexp_replace(F.col("text"), " ", "")).cast("double")
    p = F.size(F.regexp_extract_all(F.col("text"), F.lit("[^a-z0-9 ]"), F.lit(0))).cast("double")
    sc = d.select(
        "source", F.length("text").alias("n_char"),
        (F.lit(0.5) * (s / n) + F.lit(0.125) * (c / n) - F.lit(0.25) * (p / n)).alias("score"),
    )
    return sc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("score") > 0.45, 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(F.col("score") > 0.45, F.col("n_char")).otherwise(0)).alias("kept_chars"),
    )


@query(
    "q195_paragraph_dedup",
    """WITH w AS (SELECT doc_id,
                    list_filter(string_split(text, ' '), x -> x <> '') AS ws
              FROM documents),
       ch AS (SELECT doc_id, i AS chunk_idx,
                     array_to_string(ws[(i*10+1):(i*10+10)], ' ') AS chunk
              FROM w, unnest(range(0, CAST(ceil(len(ws)/10.0) AS BIGINT))) t(i)),
       rk AS (SELECT doc_id, chunk_idx, chunk,
                     row_number() OVER (PARTITION BY chunk
                                        ORDER BY doc_id, chunk_idx) AS rk
              FROM ch)
       SELECT doc_id,
              CAST(count(*) AS BIGINT) AS n_chunks,
              CAST(sum(CASE WHEN rk > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dups,
              round(CAST(sum(CASE WHEN rk > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                    / count(*), 6) AS dup_ratio
       FROM rk GROUP BY doc_id""",
)
def q195(spark, sf_dir):
    """Paragraph-level cross-document dedup accounting (the
    Dolma/RefinedWeb unit between whole-doc md5 q17 and char-gram
    spans q189): documents chunk into 10-word paragraphs; a chunk is
    a DUPLICATE iff an identical chunk string exists at a smaller
    (doc_id, chunk_idx).  One groupBy(chunk) window — the shuffle is
    bounded by the chunk vocabulary, never doc×doc; per-doc dup mass
    comes back from a second bounded aggregation."""
    docs = _t(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id",
        F.filter(F.split(F.col("text"), " "), lambda x: x != "").alias("ws"),
    )
    ch = w.select(
        "doc_id",
        F.explode(
            F.expr(
                # size(ws)=0 must yield NO chunks: a bare sequence(0,-1)
                # would DESCEND to [0,-1] and emit two phantom rows
                "CASE WHEN size(ws) = 0 THEN array() ELSE "
                "transform(sequence(0, CAST(ceil(size(ws)/10.0) AS BIGINT) - 1), "
                "i -> struct(i AS chunk_idx, "
                "array_join(slice(ws, CAST(i*10+1 AS INT), 10), ' ') AS chunk)) END"
            )
        ).alias("c"),
    ).select("doc_id", F.col("c.chunk_idx").alias("chunk_idx"), F.col("c.chunk").alias("chunk"))
    wnd = Window.partitionBy("chunk").orderBy("doc_id", "chunk_idx")
    rk = ch.withColumn("rk", F.row_number().over(wnd))
    return rk.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum(F.when(F.col("rk") > 1, 1).otherwise(0)).alias("n_dups"),
        F.round(
            F.sum(F.when(F.col("rk") > 1, 1).otherwise(0)).cast("double") / F.count("*"), 6
        ).alias("dup_ratio"),
    )


# --- Floyd-Steinberg dither, exact integer spec (q196) ------------------------


def _fs_dither_oracle_sql(w: int = 16, h: int = 16, n_img: int = 4) -> str:
    """Recursive-CTE replay of the exact integer Floyd-Steinberg spec
    (kernels/dither.py): one recursion step per pixel in raster order,
    state = current/next error rows (sixteenths, 3 channels) + palette
    counts.  Floor division toward -inf is spelled as
    (e - ((e%16+16)%16))/16 so both engines agree on negative errors."""
    from gdal_spark.kernels.dither import PALETTE

    pal16 = (PALETTE * 16).tolist()
    r16 = [p[0] for p in pal16]
    g16 = [p[1] for p in pal16]
    b16 = [p[2] for p in pal16]
    npal = len(pal16)

    def fd(e: str) -> str:  # floor((e)/16) toward -inf, integer
        return f"CAST((({e}) - ((({e}) % 16 + 16) % 16)) / 16 AS BIGINT)"

    dists = ", ".join(
        f"(c16_r - {r16[i]})*(c16_r - {r16[i]})"
        f" + (c16_g - {g16[i]})*(c16_g - {g16[i]})"
        f" + (c16_b - {b16[i]})*(c16_b - {b16[i]})"
        for i in range(npal)
    )
    zero_row = f"[CAST(0 AS BIGINT) FOR q IN range({w})]"
    upd, nu, cu = {}, {}, {}
    for ch in "rgb":
        nu[ch] = (
            f"[nxt_{ch}[q] + CASE WHEN q = x THEN c3_{ch} ELSE 0 END"
            f" + CASE WHEN q = x+1 THEN c5_{ch} ELSE 0 END"
            f" + CASE WHEN q = x+2 THEN c1_{ch} ELSE 0 END"
            f" FOR q IN range(1, {w + 1})]"
        )
        cu[ch] = (
            f"[CASE WHEN q = x+2 THEN cur_{ch}[q] + c7_{ch}"
            f" ELSE cur_{ch}[q] END FOR q IN range(1, {w + 1})]"
        )
    # column order MUST match the base case (cur_r, cur_g, cur_b, nxt_r,
    # nxt_g, nxt_b) — UNION ALL aligns recursive-term columns by POSITION
    chan_sel = [
        f"CASE WHEN x = {w - 1} THEN {nu[ch]} ELSE {cu[ch]} END AS cur_{ch}"
        for ch in "rgb"
    ] + [
        f"CASE WHEN x = {w - 1} THEN {zero_row} ELSE {nu[ch]} END AS nxt_{ch}"
        for ch in "rgb"
    ]
    return f"""WITH RECURSIVE st AS (
  SELECT CAST(i AS BIGINT) AS img, CAST(0 AS BIGINT) AS s,
         {zero_row} AS cur_r, {zero_row} AS cur_g, {zero_row} AS cur_b,
         {zero_row} AS nxt_r, {zero_row} AS nxt_g, {zero_row} AS nxt_b,
         [CAST(0 AS BIGINT) FOR q IN range({npal})] AS cnts
  FROM range(0, {n_img}) t(i)
  UNION ALL
  SELECT img, s + 1,
         {", ".join(chan_sel)},
         [cnts[q] + CASE WHEN q = best THEN 1 ELSE 0 END
          FOR q IN range(1, {npal + 1})] AS cnts
  FROM (
    SELECT *, err_r - c7_r - c3_r - c5_r AS c1_r,
              err_g - c7_g - c3_g - c5_g AS c1_g,
              err_b - c7_b - c3_b - c5_b AS c1_b
    FROM (
      SELECT *, {fd("err_r*7")} AS c7_r, {fd("err_r*3")} AS c3_r, {fd("err_r*5")} AS c5_r,
                {fd("err_g*7")} AS c7_g, {fd("err_g*3")} AS c3_g, {fd("err_g*5")} AS c5_g,
                {fd("err_b*7")} AS c7_b, {fd("err_b*3")} AS c3_b, {fd("err_b*5")} AS c5_b
      FROM (
        SELECT *, c16_r - list_extract({r16}, best) AS err_r,
                  c16_g - list_extract({g16}, best) AS err_g,
                  c16_b - list_extract({b16}, best) AS err_b
        FROM (
          SELECT *, list_position(dists, list_min(dists)) AS best
          FROM (
            SELECT *, [{dists}] AS dists
            FROM (
              SELECT *, px_r*16 + cur_r[x+1] AS c16_r,
                        px_g*16 + cur_g[x+1] AS c16_g,
                        px_b*16 + cur_b[x+1] AS c16_b
              FROM (
                SELECT *, (img*31 + x*7 + y*13) % 256 AS px_r,
                          (img*17 + x*11 + y*3) % 256 AS px_g,
                          (img*23 + x*5 + y*19) % 256 AS px_b
                FROM (
                  SELECT *, s % {w} AS x, CAST((s - s % {w}) / {w} AS BIGINT) AS y
                  FROM st WHERE s < {w * h}
                ) l1
              ) l2
            ) l3
          ) l4
        ) l5
      ) l6
    ) l7
  ) fin
)
SELECT img, CAST(u.q AS BIGINT) AS pal_idx, cnts[u.q + 1] AS n
FROM (SELECT img, cnts FROM st WHERE s = {w * h}) z, range(0, {npal}) u(q)"""


@query("q196_fs_dither", _fs_dither_oracle_sql())
def q196(spark, sf_dir):
    """Floyd-Steinberg dithering (alg/gdaldither.cpp) under the exact
    integer spec of kernels/dither.py: per-image sequential error
    diffusion (the reference is sequential too), distributed ACROSS
    images — one task per image via mapInPandas; a web-scale corpus
    dithers millions of images in parallel.  Oracle: the identical
    recurrence replayed as a 256-step recursive CTE (the Wang-viewshed
    pattern for sequential 2-D recurrences)."""
    from gdal_spark.kernels.dither import PALETTE, floyd_steinberg_counts

    schema = "img long, pal_idx long, n long"

    def per_img(pdf_iter):
        for pdf in pdf_iter:
            rows = []
            for _, row in pdf.iterrows():
                img = int(row["id"])
                counts = floyd_steinberg_counts(img, 16, 16)
                rows.extend((img, i, int(c)) for i, c in enumerate(counts))
            yield pd.DataFrame(rows, columns=["img", "pal_idx", "n"])

    return spark.range(4).repartition(4).mapInPandas(per_img, schema)


# --- GCP polynomial transformer, order 1 (q197) -------------------------------

def _crs_det3(a, b, c, d, e, f, g, h, i):
    """det [[a,b,c],[d,e,f],[g,h,i]] with the fixed expansion
    a*(e*i - f*h) - b*(d*i - f*g) + c*(d*h - e*g), as SQL text."""
    return f"{a}*({e}*{i} - {f}*{h}) - {b}*({d}*{i} - {f}*{g}) + {c}*({d}*{h} - {e}*{g})"


@query(
    "q197_gcp_affine_fit",
    f"""WITH gcp AS (SELECT CAST((i*17)%97 AS BIGINT) AS px, CAST((i*29)%89 AS BIGINT) AS py,
                     CAST(3*((i*17)%97) - 2*((i*29)%89) + 40 + (i%3 - 1) AS BIGINT) AS gx,
                     CAST(1*((i*17)%97) + 4*((i*29)%89) - 25 + (i%5 - 2) AS BIGINT) AS gy
              FROM range(0, 12) t(i)),
       s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(px) AS BIGINT) AS sx, CAST(sum(py) AS BIGINT) AS sy,
                    CAST(sum(px*px) AS BIGINT) AS sxx, CAST(sum(px*py) AS BIGINT) AS sxy,
                    CAST(sum(py*py) AS BIGINT) AS syy,
                    CAST(sum(gx) AS BIGINT) AS tx0, CAST(sum(px*gx) AS BIGINT) AS tx1,
                    CAST(sum(py*gx) AS BIGINT) AS tx2,
                    CAST(sum(gy) AS BIGINT) AS ty0, CAST(sum(px*gy) AS BIGINT) AS ty1,
                    CAST(sum(py*gy) AS BIGINT) AS ty2
             FROM gcp),
       c AS (SELECT
            CAST({_crs_det3('n','sx','sy','sx','sxx','sxy','sy','sxy','syy')} AS DOUBLE) AS dd,
            CAST({_crs_det3('tx0','sx','sy','tx1','sxx','sxy','tx2','sxy','syy')} AS DOUBLE) AS na0,
            CAST({_crs_det3('n','tx0','sy','sx','tx1','sxy','sy','tx2','syy')} AS DOUBLE) AS na1,
            CAST({_crs_det3('n','sx','tx0','sx','sxx','tx1','sy','sxy','tx2')} AS DOUBLE) AS na2,
            CAST({_crs_det3('ty0','sx','sy','ty1','sxx','sxy','ty2','sxy','syy')} AS DOUBLE) AS nb0,
            CAST({_crs_det3('n','ty0','sy','sx','ty1','sxy','sy','ty2','syy')} AS DOUBLE) AS nb1,
            CAST({_crs_det3('n','sx','ty0','sx','sxx','ty1','sy','sxy','ty2')} AS DOUBLE) AS nb2
            FROM s)
       SELECT doc_id,
              (na0/dd) + (na1/dd)*CAST(doc_id%23 AS DOUBLE)
                       + (na2/dd)*CAST((doc_id*7)%19 AS DOUBLE) AS tx,
              (nb0/dd) + (nb1/dd)*CAST(doc_id%23 AS DOUBLE)
                       + (nb2/dd)*CAST((doc_id*7)%19 AS DOUBLE) AS ty
       FROM documents, c""",
)
def q197(spark, sf_dir):
    """GCP polynomial transformer, order 1 (alg/gdal_crs.cpp
    CRS_georef): least-squares affine fit from 12 integer ground
    control points solved EXACTLY by 3x3 Cramer determinants over the
    integer normal-equation sums (every determinant < 2^53 ⇒ the
    doubles are exact and the fit is bitwise reproducible), then the
    fitted transform applied to per-document query coordinates.  One
    bounded aggregation + one broadcast of the 1-row coefficient
    table — the apply side is embarrassingly parallel."""
    i = F.col("id")
    gcp = spark.range(12).select(
        ((i * 17) % 97).cast("long").alias("px"),
        ((i * 29) % 89).cast("long").alias("py"),
        (3 * ((i * 17) % 97) - 2 * ((i * 29) % 89) + 40 + (i % 3 - 1))
        .cast("long").alias("gx"),
        (1 * ((i * 17) % 97) + 4 * ((i * 29) % 89) - 25 + (i % 5 - 2))
        .cast("long").alias("gy"),
    )
    s = gcp.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("px").alias("sx"), F.sum("py").alias("sy"),
        F.sum(F.col("px") * F.col("px")).alias("sxx"),
        F.sum(F.col("px") * F.col("py")).alias("sxy"),
        F.sum(F.col("py") * F.col("py")).alias("syy"),
        F.sum("gx").alias("tx0"),
        F.sum(F.col("px") * F.col("gx")).alias("tx1"),
        F.sum(F.col("py") * F.col("gx")).alias("tx2"),
        F.sum("gy").alias("ty0"),
        F.sum(F.col("px") * F.col("gy")).alias("ty1"),
        F.sum(F.col("py") * F.col("gy")).alias("ty2"),
    )

    def det3(a, b, c, d, e, f, g, h, i_):
        C = F.col
        return (
            C(a) * (C(e) * C(i_) - C(f) * C(h))
            - C(b) * (C(d) * C(i_) - C(f) * C(g))
            + C(c) * (C(d) * C(h) - C(e) * C(g))
        )

    coef = s.select(
        det3("n", "sx", "sy", "sx", "sxx", "sxy", "sy", "sxy", "syy").cast("double").alias("dd"),
        det3("tx0", "sx", "sy", "tx1", "sxx", "sxy", "tx2", "sxy", "syy").cast("double").alias("na0"),
        det3("n", "tx0", "sy", "sx", "tx1", "sxy", "sy", "tx2", "syy").cast("double").alias("na1"),
        det3("n", "sx", "tx0", "sx", "sxx", "tx1", "sy", "sxy", "tx2").cast("double").alias("na2"),
        det3("ty0", "sx", "sy", "ty1", "sxx", "sxy", "ty2", "sxy", "syy").cast("double").alias("nb0"),
        det3("n", "ty0", "sy", "sx", "ty1", "sxy", "sy", "ty2", "syy").cast("double").alias("nb1"),
        det3("n", "sx", "ty0", "sx", "sxx", "ty1", "sy", "sxy", "ty2").cast("double").alias("nb2"),
    )
    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    qx = (d % 23).cast("double")
    qy = ((d * 7) % 19).cast("double")
    C = F.col
    return docs.crossJoin(F.broadcast(coef)).select(
        "doc_id",
        ((C("na0") / C("dd")) + (C("na1") / C("dd")) * qx
         + (C("na2") / C("dd")) * qy).alias("tx"),
        ((C("nb0") / C("dd")) + (C("nb1") / C("dd")) * qx
         + (C("nb2") / C("dd")) * qy).alias("ty"),
    )


# --- RPC transform (q198) and geolocation-array inverse (q199) ----------------

# RPC00B monomial order (alg/gdal_rpc.cpp RPCEvaluate): 1 L P H LP LH PH
# L2 P2 H2 PLH L3 LP2 LH2 L2P P3 PH2 L2H P2H H3  (L=ln, P=pn, H=hn)
_RPC_MONOS = [
    "1", "ln", "pn", "hn", "ln*pn", "ln*hn", "pn*hn", "ln*ln", "pn*pn",
    "hn*hn", "pn*ln*hn", "ln*ln*ln", "ln*pn*pn", "ln*hn*hn", "ln*ln*pn",
    "pn*pn*pn", "pn*hn*hn", "ln*ln*hn", "pn*pn*hn", "hn*hn*hn",
]
# dyadic coefficients (sixteenths) — exact power-of-two scalings
_RPC_LINE_NUM = [16, 4, -8, 2, 1, -1, 2, 1, -2, 1, 1, 0, 1, 0, -1, 1, 0, 1, 0, -1]
_RPC_LINE_DEN = [16, 1, 1, 0, 0, 1, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_RPC_SAMP_NUM = [16, -6, 5, -2, 2, 1, -1, 2, 1, -1, 0, 1, 0, 1, 1, 0, -1, 0, 1, 0]
_RPC_SAMP_DEN = [16, 0, 1, 1, 1, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]


def _rpc_poly_sql(coeffs):
    terms = [
        f"({c}/16.0)*{m}" if m != "1" else f"({c}/16.0)"
        for c, m in zip(coeffs, _RPC_MONOS) if c != 0
    ]
    return " + ".join(terms)


def _rpc_poly_col(coeffs, ln, pn, hn):
    monos = {
        "1": F.lit(1.0), "ln": ln, "pn": pn, "hn": hn,
        "ln*pn": ln * pn, "ln*hn": ln * hn, "pn*hn": pn * hn,
        "ln*ln": ln * ln, "pn*pn": pn * pn, "hn*hn": hn * hn,
        "pn*ln*hn": pn * ln * hn, "ln*ln*ln": ln * ln * ln,
        "ln*pn*pn": ln * pn * pn, "ln*hn*hn": ln * hn * hn,
        "ln*ln*pn": ln * ln * pn, "pn*pn*pn": pn * pn * pn,
        "pn*hn*hn": pn * hn * hn, "ln*ln*hn": ln * ln * hn,
        "pn*pn*hn": pn * pn * hn, "hn*hn*hn": hn * hn * hn,
    }
    acc = None
    for c, m in zip(coeffs, _RPC_MONOS):
        if c == 0:
            continue
        term = F.lit(c / 16.0) if m == "1" else F.lit(c / 16.0) * monos[m]
        acc = term if acc is None else acc + term
    return acc


@query(
    "q198_rpc_transform",
    f"""WITH q AS (SELECT doc_id,
                    CAST(doc_id%21 - 10 AS DOUBLE)/10.0 AS ln,
                    CAST((doc_id*3)%19 - 9 AS DOUBLE)/9.0 AS pn,
                    CAST(doc_id%7 - 3 AS DOUBLE)/3.0 AS hn
              FROM documents)
       SELECT doc_id,
              (({_rpc_poly_sql(_RPC_LINE_NUM)}) / ({_rpc_poly_sql(_RPC_LINE_DEN)}))
                * 512.0 + 1024.0 AS rpc_line,
              (({_rpc_poly_sql(_RPC_SAMP_NUM)}) / ({_rpc_poly_sql(_RPC_SAMP_DEN)}))
                * 768.0 + 1536.0 AS rpc_samp
       FROM q""",
)
def q198(spark, sf_dir):
    """RPC (rational polynomial coefficients) forward transform
    (alg/gdal_rpc.cpp RPCEvaluate / RPCTransformPoint): line/sample =
    cubic-ratio of the 20-monomial RPC00B basis in normalized
    lon/lat/height, then de-normalized by scale+offset.  Dyadic
    coefficients (sixteenths) and a fixed left-to-right term order
    keep the float tree engine-identical term-for-term.  Pure Column
    arithmetic — zero Python per row; the inverse (iterative in the
    reference, gdalgenericinverse.cpp) follows the unrolled-refinement
    pattern of functions/proj.py."""
    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    ln = (d % 21 - 10).cast("double") / 10.0
    pn = ((d * 3) % 19 - 9).cast("double") / 9.0
    hn = (d % 7 - 3).cast("double") / 3.0
    line = (
        _rpc_poly_col(_RPC_LINE_NUM, ln, pn, hn)
        / _rpc_poly_col(_RPC_LINE_DEN, ln, pn, hn)
    ) * 512.0 + 1024.0
    samp = (
        _rpc_poly_col(_RPC_SAMP_NUM, ln, pn, hn)
        / _rpc_poly_col(_RPC_SAMP_DEN, ln, pn, hn)
    ) * 768.0 + 1536.0
    return docs.select("doc_id", line.alias("rpc_line"), samp.alias("rpc_samp"))


@query(
    "q199_geoloc_inverse",
    """WITH geo AS (SELECT CAST(px.range AS BIGINT) AS px, CAST(py.range AS BIGINT) AS py,
                     CAST(2*px.range + py.range%3 AS BIGINT) AS glon,
                     CAST(3*py.range + px.range%2 AS BIGINT) AS glat
              FROM range(64) px, range(64) py),
       gb AS (SELECT *, CAST((glon - ((glon%8+8)%8))/8 AS BIGINT) AS bx,
                        CAST((glat - ((glat%8+8)%8))/8 AS BIGINT) AS by FROM geo),
       q AS (SELECT doc_id, CAST(doc_id%128 AS BIGINT) AS qlon,
                    CAST((doc_id*3)%190 AS BIGINT) AS qlat FROM documents),
       qb AS (SELECT *, CAST((qlon - ((qlon%8+8)%8))/8 AS BIGINT) AS bx,
                        CAST((qlat - ((qlat%8+8)%8))/8 AS BIGINT) AS by FROM q),
       cand AS (SELECT q.doc_id, q.qlon, q.qlat, g.px, g.py,
                       (q.qlon-g.glon)*(q.qlon-g.glon)
                       + (q.qlat-g.glat)*(q.qlat-g.glat) AS d2
                FROM qb q, unnest([-1,0,1]) dx(dx), unnest([-1,0,1]) dy(dy)
                JOIN gb g ON g.bx = q.bx + dx AND g.by = q.by + dy),
       rk AS (SELECT doc_id, px, py, d2,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY d2, px, py) AS rn FROM cand)
       SELECT doc_id, px, py, d2 FROM rk WHERE rn = 1""",
)
def q199(spark, sf_dir):
    """Geolocation-array INVERSE transform (alg/gdalgeoloc.cpp +
    gdalgeolocquadtree.cpp): given query lon/lat, find the geolocation
    grid cell whose (lon,lat) value is nearest (squared distance, ties
    to smallest pixel).  The reference walks a quadtree; the
    distributed re-expression buckets the geoloc array by quantized
    value and each query joins its 3x3 bucket neighborhood — candidate
    count is bounded by bucket occupancy, never query x grid.  At a
    10^8-cell geoloc array the bucket table shards by hash like any
    equi-join."""
    px = spark.range(64).select(F.col("id").alias("px"))
    py = spark.range(64).select(F.col("id").alias("py"))
    geo = px.crossJoin(py).select(
        "px", "py",
        (2 * F.col("px") + F.col("py") % 3).alias("glon"),
        (3 * F.col("py") + F.col("px") % 2).alias("glat"),
    )

    def bucket(c):
        return ((c - ((c % 8 + 8) % 8)) / 8).cast("long")

    gb = geo.withColumn("bx", bucket(F.col("glon"))).withColumn(
        "by", bucket(F.col("glat")))
    d = F.col("doc_id")
    q = _t(spark, sf_dir, "documents").select(
        "doc_id", (d % 128).alias("qlon"), ((d * 3) % 190).alias("qlat"))
    qb = (
        q.withColumn("bx0", bucket(F.col("qlon")))
        .withColumn("by0", bucket(F.col("qlat")))
        .withColumn("dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select("doc_id", "qlon", "qlat",
                (F.col("bx0") + F.col("dx")).alias("bx"),
                (F.col("by0") + F.col("dy")).alias("by"))
    )
    dlon = F.col("qlon") - F.col("glon")
    dlat = F.col("qlat") - F.col("glat")
    cand = qb.join(F.broadcast(gb), ["bx", "by"]).withColumn(
        "d2", dlon * dlon + dlat * dlat)
    w = Window.partitionBy("doc_id").orderBy("d2", "px", "py")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "px", "py", "d2")
    )


# --- 4-point homography, exact integer adjugate construction (q200) -----------

# literal GCP quads (general position, small coords keep every integer
# product < 2^53 so the doubles are exact end-to-end)
_HOM_SRC = [(0, 0), (13, 1), (2, 12), (11, 10)]
_HOM_DST = [(1, 2), (14, 0), (0, 13), (12, 14)]


def _hom_det3(m):
    return (
        m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
        - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
        + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0])
    )


def _hom_basis_matrix(quad):
    """Integer matrix mapping the projective basis quad to `quad`
    (scale-invariant: the common Cramer denominator is dropped)."""
    (x1, y1), (x2, y2), (x3, y3), (x4, y4) = quad
    a0 = [[x1, x2, x3], [y1, y2, y3], [1, 1, 1]]
    nl = _hom_det3([[x4, x2, x3], [y4, y2, y3], [1, 1, 1]])
    nm = _hom_det3([[x1, x4, x3], [y1, y4, y3], [1, 1, 1]])
    nt = _hom_det3([[x1, x2, x4], [y1, y2, y4], [1, 1, 1]])
    return [
        [a0[r][0] * nl, a0[r][1] * nm, a0[r][2] * nt] for r in range(3)
    ]


def _hom_matrix():
    """H ∝ B · adj(A): exact integers, no division anywhere in the solve."""
    A = _hom_basis_matrix(_HOM_SRC)
    B = _hom_basis_matrix(_HOM_DST)
    # adjugate (cofactor transpose) of A
    def cof(i, j):
        m = [[A[r][c] for c in range(3) if c != j] for r in range(3) if r != i]
        s = m[0][0] * m[1][1] - m[0][1] * m[1][0]
        return s if (i + j) % 2 == 0 else -s

    adjA = [[cof(j, i) for j in range(3)] for i in range(3)]
    return [
        [sum(B[r][k] * adjA[k][c] for k in range(3)) for c in range(3)]
        for r in range(3)
    ]


@query(
    "q200_homography",
    f"""WITH h AS (SELECT {", ".join(
        f"CAST({v} AS BIGINT) AS h{r}{c}"
        for r, row in enumerate(_hom_matrix()) for c, v in enumerate(row)
    )})
       SELECT doc_id,
              CAST(h00*(doc_id%13) + h01*((doc_id*5)%11) + h02 AS DOUBLE)
              / CAST(h20*(doc_id%13) + h21*((doc_id*5)%11) + h22 AS DOUBLE) AS hx,
              CAST(h10*(doc_id%13) + h11*((doc_id*5)%11) + h12 AS DOUBLE)
              / CAST(h20*(doc_id%13) + h21*((doc_id*5)%11) + h22 AS DOUBLE) AS hy
       FROM documents, h""",
)
def q200(spark, sf_dir):
    """4-point homography (alg/gdal_homography.cpp): H built EXACTLY in
    integers via the projective-basis construction — Cramer numerators
    for each quad (the common denominator drops by scale invariance),
    then H ∝ B·adj(A); no division until the final perspective divide,
    so the fit is bitwise reproducible.  Applied per-document as pure
    Column arithmetic (the 9 integer entries are plan literals — the
    solve is a bounded 3x3 problem, like the reference's)."""
    H = _hom_matrix()
    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    x = d % 13
    y = (d * 5) % 11
    u = F.lit(H[0][0]) * x + F.lit(H[0][1]) * y + F.lit(H[0][2])
    v = F.lit(H[1][0]) * x + F.lit(H[1][1]) * y + F.lit(H[1][2])
    w = F.lit(H[2][0]) * x + F.lit(H[2][1]) * y + F.lit(H[2][2])
    return docs.select(
        "doc_id",
        (u.cast("double") / w.cast("double")).alias("hx"),
        (v.cast("double") / w.cast("double")).alias("hy"),
    )


# --- SURF keypoints + feature matching (q201-q202) ----------------------------


def _surf_img_sql(a: str, b: str, bx1=10, by1=12, bx2=22, by2=20) -> str:
    """Synthetic blob image I(a,b) as SQL text (integers → exact)."""
    return (
        f"(CASE WHEN (({a})-{bx1})*(({a})-{bx1}) + (({b})-{by1})*(({b})-{by1}) <= 9"
        f" THEN 180 ELSE 0 END"
        f" + CASE WHEN (({a})-{bx2})*(({a})-{bx2}) + (({b})-{by2})*(({b})-{by2}) <= 16"
        f" THEN 140 ELSE 0 END"
        f" + (({a})*3 + ({b})*5) % 7)"
    )


def _surf_tiles(spark, bx1=10, by1=12, bx2=22, by2=20):
    """32x32 blob image as 16px tiles (mirrors _surf_img_sql)."""
    from gdal_spark.operators.rasterize import TILE_SCHEMA

    def gen(pdf_iter):
        for pdf in pdf_iter:
            rows = []
            for _, row in pdf.iterrows():
                t = int(row["id"])
                tx, ty = t % 2, t // 2
                gx = np.arange(16) + tx * 16
                gy = np.arange(16) + ty * 16
                GX, GY = np.meshgrid(gx, gy)
                img = (
                    ((GX - bx1) ** 2 + (GY - by1) ** 2 <= 9).astype(np.int64) * 180
                    + ((GX - bx2) ** 2 + (GY - by2) ** 2 <= 16).astype(np.int64) * 140
                    + (GX * 3 + GY * 5) % 7
                ).astype(np.float64)
                rows.append((0, tx, ty, 1, img.tobytes(), "float64", 0.0))
            yield pd.DataFrame(
                rows, columns=["z", "tx", "ty", "band", "data", "dtype", "nodata"]
            )

    return spark.range(4).repartition(4).mapInPandas(gen, TILE_SCHEMA)


def _surf_resp_sql(img_of, cen="cen") -> str:
    """Response CTE body: Dxx/Dyy/Dxy/doh per center pixel.  img_of is a
    callable (a, b) -> SQL text for the image value at (a, b)."""
    return f"""
    dxx AS (SELECT c.x, c.y,
              CAST(sum((CASE WHEN dx.range <= -2 OR dx.range >= 2 THEN 1 ELSE -2 END)
                   * {img_of('c.x + dx.range', 'c.y + dy.range')}) AS BIGINT) AS v
            FROM {cen} c, range(-4, 5) dx, range(-2, 3) dy GROUP BY c.x, c.y),
    dyy AS (SELECT c.x, c.y,
              CAST(sum((CASE WHEN dv.range <= -2 OR dv.range >= 2 THEN 1 ELSE -2 END)
                   * {img_of('c.x + du.range', 'c.y + dv.range')}) AS BIGINT) AS v
            FROM {cen} c, range(-4, 5) dv, range(-2, 3) du GROUP BY c.x, c.y),
    dxy AS (SELECT c.x, c.y,
              CAST(sum((CASE WHEN dx.range > 0 THEN 1 ELSE -1 END)
                   * (CASE WHEN dy.range > 0 THEN 1 ELSE -1 END)
                   * {img_of('c.x + dx.range', 'c.y + dy.range')}) AS BIGINT) AS v
            FROM {cen} c, range(-3, 4) dx, range(-3, 4) dy
            WHERE dx.range <> 0 AND dy.range <> 0 GROUP BY c.x, c.y),
    resp AS (SELECT dxx.x, dxx.y, 100*dxx.v*dyy.v - 81*dxy.v*dxy.v AS doh
             FROM dxx JOIN dyy ON dxx.x = dyy.x AND dxx.y = dyy.y
                      JOIN dxy ON dxx.x = dxy.x AND dxx.y = dxy.y),
    kp AS (SELECT r.x, r.y, r.doh FROM resp r
           WHERE r.x BETWEEN 6 AND 25 AND r.y BETWEEN 6 AND 25
             AND r.doh > 2000000
             AND NOT EXISTS (SELECT 1 FROM resp n
                             WHERE abs(n.x - r.x) <= 1 AND abs(n.y - r.y) <= 1
                               AND (n.x <> r.x OR n.y <> r.y)
                               AND n.doh >= r.doh))"""


@query(
    "q201_surf_keypoints",
    f"""WITH cen AS (SELECT CAST(x.range AS BIGINT) AS x, CAST(y.range AS BIGINT) AS y
                     FROM range(5, 27) x, range(5, 27) y),
       {_surf_resp_sql(lambda a, b: _surf_img_sql(a, b))}
       SELECT x AS gx, y AS gy, CAST(doh AS BIGINT) AS doh FROM kp""",
)
def q201(spark, sf_dir):
    """SURF-style keypoint detection (alg/gdal_simplesurf.cpp): 9x9
    first-octave determinant-of-Hessian box filters in EXACT integer
    arithmetic (the 0.9 Dxy weight becomes 100*DxxDyy - 81*Dxy²),
    strict 3x3 non-max suppression above threshold.  Distributed as
    the halo-exchange focal pattern — per-tile NumPy over a radius-6
    halo, linear in pixels at any raster size."""
    from gdal_spark.operators.surf import doh_keypoints_tiles

    kp = doh_keypoints_tiles(
        _surf_tiles(spark), tile_size=16, width=32, height=32,
        threshold=2_000_000,
    )
    return kp.select("gx", "gy", "doh")


def _surf_desc_sql(img_of) -> str:
    """d1..d9 select expressions: 3x3 patch sums on a 3x3 quadrant grid
    (same enumeration as operators/surf.py: qy outer, qx inner)."""
    cols = []
    i = 0
    for qy in (-3, 0, 3):
        for qx in (-3, 0, 3):
            i += 1
            terms = " + ".join(
                img_of(f"k.x + {qx + u}", f"k.y + {qy + v}")
                for v in (-1, 0, 1) for u in (-1, 0, 1)
            )
            cols.append(f"CAST({terms} AS BIGINT) AS d{i}")
    return ", ".join(cols)


def _surf_match_oracle() -> str:
    ia = lambda a, b: _surf_img_sql(a, b)
    ib = lambda a, b: _surf_img_sql(a, b, bx1=12, by1=11, bx2=20, by2=22)
    dist = " + ".join(f"(a.d{i} - b.d{i})*(a.d{i} - b.d{i})" for i in range(1, 10))
    parts = []
    for tag, img in (("a", ia), ("b", ib)):
        body = _surf_resp_sql(img, cen="cen").replace(
            "dxx", f"dxx_{tag}").replace("dyy", f"dyy_{tag}").replace(
            "dxy", f"dxy_{tag}").replace("resp", f"resp_{tag}").replace(
            "kp AS", f"kp_{tag} AS")
        parts.append(body)
        parts.append(
            f"dsc_{tag} AS (SELECT k.x, k.y, {_surf_desc_sql(img)} FROM kp_{tag} k)"
        )
    return f"""WITH cen AS (SELECT CAST(x.range AS BIGINT) AS x, CAST(y.range AS BIGINT) AS y
                    FROM range(5, 27) x, range(5, 27) y),
    {",".join(parts)},
    pairs AS (SELECT a.x AS xa, a.y AS ya, b.x AS xb, b.y AS yb,
                     CAST({dist} AS BIGINT) AS dist
              FROM dsc_a a, dsc_b b),
    rk AS (SELECT *,
                  row_number() OVER (PARTITION BY xa, ya ORDER BY dist, xb, yb) AS rna,
                  row_number() OVER (PARTITION BY xb, yb ORDER BY dist, xa, ya) AS rnb
           FROM pairs)
    SELECT xa, ya, xb, yb, dist FROM rk WHERE rna = 1 AND rnb = 1"""


@query("q202_feature_matching", _surf_match_oracle())
def q202(spark, sf_dir):
    """Feature-point matching between two images
    (alg/gdalmatching.cpp GDALComputeMatchingPoints): SURF keypoints +
    9-patch integer descriptors on both images, exact squared-L2
    mutual-nearest matching with deterministic ties.  Per-image
    keypoint sets are bounded, so the pair join broadcasts at any
    corpus size; detection itself is the linear halo-focal pass."""
    from gdal_spark.operators.surf import doh_keypoints_tiles, match_keypoints

    kpa = doh_keypoints_tiles(
        _surf_tiles(spark), tile_size=16, width=32, height=32,
        threshold=2_000_000, with_descriptor=True,
    )
    kpb = doh_keypoints_tiles(
        _surf_tiles(spark, bx1=12, by1=11, bx2=20, by2=22),
        tile_size=16, width=32, height=32,
        threshold=2_000_000, with_descriptor=True,
    )
    return match_keypoints(kpa, kpb)


# --- polyharmonic-spline GCP transformer (q203) --------------------------------

_PHS_GCPS = [((i * 13) % 31, (i * 23) % 29) for i in range(8)]
_PHS_TX = [2 * px - py + 7 + (i % 3) for i, (px, py) in enumerate(_PHS_GCPS)]
_PHS_TY = [px + 3 * py - 11 + (i % 2) for i, (px, py) in enumerate(_PHS_GCPS)]


def _phs_solve():
    """Driver-side bounded solve (the GCP count is small by the nature
    of the op — same cost contract as the RAT / noder kernels): radial
    basis phi(r^2) = r^2 * sqrt(r^2) (polyharmonic r^3 — the
    TPS-family basis that stays engine-exact because IEEE sqrt is
    correctly rounded, unlike r^2*log r^2) + affine part.
    Returns (wx, wy) lists of 11 float coefficients each."""
    n = len(_PHS_GCPS)
    A = np.zeros((n + 3, n + 3))
    for i, (xi, yi) in enumerate(_PHS_GCPS):
        for j, (xj, yj) in enumerate(_PHS_GCPS):
            r2 = float((xi - xj) ** 2 + (yi - yj) ** 2)
            A[i, j] = r2 * np.sqrt(r2)
        A[i, n] = 1.0
        A[i, n + 1] = xi
        A[i, n + 2] = yi
        A[n, i] = 1.0
        A[n + 1, i] = xi
        A[n + 2, i] = yi
    bx = np.concatenate([np.array(_PHS_TX, dtype=np.float64), np.zeros(3)])
    by = np.concatenate([np.array(_PHS_TY, dtype=np.float64), np.zeros(3)])
    wx = np.linalg.solve(A, bx)
    wy = np.linalg.solve(A, by)
    # interpolation property: the spline passes through every GCP
    for i, (xi, yi) in enumerate(_PHS_GCPS):
        acc = wx[n] + wx[n + 1] * xi + wx[n + 2] * yi
        for j, (xj, yj) in enumerate(_PHS_GCPS):
            r2 = float((xi - xj) ** 2 + (yi - yj) ** 2)
            acc += wx[j] * r2 * np.sqrt(r2)
        assert abs(acc - _PHS_TX[i]) < 1e-8, (i, acc, _PHS_TX[i])
    return wx.tolist(), wy.tolist()


_PHS_WX, _PHS_WY = _phs_solve()


def _phs_apply_sql(w, qx: str, qy: str) -> str:
    """Fixed left-to-right apply tree; coefficients inlined verbatim at
    17 significant digits (round-trips to the identical double)."""
    n = len(_PHS_GCPS)
    terms = []
    for j, (xj, yj) in enumerate(_PHS_GCPS):
        r2 = f"CAST(({qx} - {xj})*({qx} - {xj}) + ({qy} - {yj})*({qy} - {yj}) AS DOUBLE)"
        terms.append(f"CAST('{w[j]:.17g}' AS DOUBLE) * ({r2} * sqrt({r2}))")
    terms.append(f"CAST('{w[n]:.17g}' AS DOUBLE)")
    terms.append(f"CAST('{w[n + 1]:.17g}' AS DOUBLE) * CAST({qx} AS DOUBLE)")
    terms.append(f"CAST('{w[n + 2]:.17g}' AS DOUBLE) * CAST({qy} AS DOUBLE)")
    return " + ".join(terms)


def _phs_apply_col(w, qx, qy):
    n = len(_PHS_GCPS)
    acc = None
    for j, (xj, yj) in enumerate(_PHS_GCPS):
        r2 = ((qx - xj) * (qx - xj) + (qy - yj) * (qy - yj)).cast("double")
        t = F.lit(float(f"{w[j]:.17g}")) * (r2 * F.sqrt(r2))
        acc = t if acc is None else acc + t
    acc = acc + F.lit(float(f"{w[n]:.17g}"))
    acc = acc + F.lit(float(f"{w[n + 1]:.17g}")) * qx.cast("double")
    acc = acc + F.lit(float(f"{w[n + 2]:.17g}")) * qy.cast("double")
    return acc


@query(
    "q203_polyharmonic_gcp",
    f"""SELECT doc_id,
          {_phs_apply_sql(_PHS_WX, "doc_id%37", "(doc_id*11)%41")} AS tx,
          {_phs_apply_sql(_PHS_WY, "doc_id%37", "(doc_id*11)%41")} AS ty
       FROM documents""",
)
def q203(spark, sf_dir):
    """TPS-family GCP transformer (alg/gdal_tps.cpp /
    alg/thinplatespline.cpp): radial-basis interpolation through 8
    control points + affine part, solved once driver-side (bounded,
    like the reference's per-transformer solve) and applied as pure
    Column arithmetic.  Basis phi = r^3 (= r^2*sqrt(r^2), exact across
    engines; the reference's r^2*log r^2 differs only in the basis
    kernel — log is not correctly-rounded portable, sqrt is).
    Interpolation through every GCP is asserted at solve time."""
    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    qx = d % 37
    qy = (d * 11) % 41
    return docs.select(
        "doc_id",
        _phs_apply_col(_PHS_WX, qx, qy).alias("tx"),
        _phs_apply_col(_PHS_WY, qx, qy).alias("ty"),
    )


# --- DSIR-style importance weights (q204) --------------------------------------


@query(
    "q204_importance_weights",
    """WITH occ AS (SELECT d.doc_id, d.lang,
                      ascii(substr(w.w, 1, 1)) % 8 AS f
              FROM documents d,
                   unnest(list_filter(string_split(d.text, ' '), x -> x <> '')) w(w)),
       tot AS (SELECT CAST(count(*) AS BIGINT) AS s_tot,
                      CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS t_tot
               FROM occ),
       fr AS (SELECT f, CAST(count(*) AS BIGINT) AS s_f,
                     CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS t_f
              FROM occ GROUP BY f),
       rat AS (SELECT f, CAST(t_f * t2.s_tot AS DOUBLE) / CAST(s_f * t2.t_tot AS DOUBLE) AS r
               FROM fr, tot t2),
       df AS (SELECT DISTINCT doc_id, f FROM occ),
       dl AS (SELECT d.doc_id, list(r.r ORDER BY d.f) AS rs,
                     CAST(count(*) AS BIGINT) AS n_feats
              FROM df d JOIN rat r USING (f) GROUP BY d.doc_id)
       SELECT doc_id, n_feats, list_reduce(rs, (a, b) -> a * b) AS iw FROM dl""",
)
def q204(spark, sf_dir):
    """DSIR-style importance weights (Xie et al. 2023: hashed-feature
    importance resampling for domain-targeted data selection): feature
    = first-char bucket, target = the 'en' slice, per-doc weight =
    PRODUCT over the doc's distinct features of the target/source
    probability ratio.  Each ratio is one exact integer-product
    division; the product folds LEFT-TO-RIGHT over the feature-sorted
    list on both engines (Spark F.aggregate vs DuckDB list_reduce —
    1.0*x is an IEEE identity), so the float tree is engine-identical.
    Shuffles: one bounded feature aggregation (8 rows, broadcast back)
    + one per-doc distinct — never doc×doc."""
    docs = _t(spark, sf_dir, "documents")
    occ = docs.select(
        "doc_id", "lang",
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda x: x != "")
        ).alias("w"),
    ).select(
        "doc_id", "lang",
        (F.ascii(F.substring(F.col("w"), 1, 1)) % 8).alias("f"),
    ).persist()  # feeds totals, per-feature counts AND the per-doc distinct
    tot = occ.agg(
        F.count("*").alias("s_tot"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("t_tot"),
    )
    fr = occ.groupBy("f").agg(
        F.count("*").alias("s_f"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("t_f"),
    )
    rat = fr.crossJoin(F.broadcast(tot)).select(
        "f",
        (
            (F.col("t_f") * F.col("s_tot")).cast("double")
            / (F.col("s_f") * F.col("t_tot")).cast("double")
        ).alias("r"),
    )
    df_ = occ.select("doc_id", "f").distinct()
    dl = (
        df_.join(F.broadcast(rat), "f")
        .groupBy("doc_id")
        .agg(
            F.sort_array(F.collect_list(F.struct("f", "r"))).alias("frs"),
            F.count("*").alias("n_feats"),
        )
    )
    return dl.select(
        "doc_id", "n_feats",
        F.aggregate(
            F.col("frs"), F.lit(1.0), lambda acc, s: acc * s["r"]
        ).alias("iw"),
    )


# --- vertical shift grid apply (q205) ------------------------------------------


@query(
    "q205_vertical_shift_grid",
    f"""WITH g AS (SELECT gx.range AS gx, gy.range AS gy
                   FROM range(32) gx, range(32) gy),
       dem AS (SELECT gx, gy, CAST({_z_sql('gx', 'gy')} AS DOUBLE) AS z FROM g),
       grid AS (SELECT cx.range AS cx, cy.range AS cy,
                       CAST((cx.range*5 + cy.range*3) % 11 - 5 AS DOUBLE) AS s
                FROM range(9) cx, range(9) cy),
       px AS (SELECT gx, gy, z,
                     CAST((gx - gx%4)/4 AS BIGINT) AS cx,
                     CAST((gy - gy%4)/4 AS BIGINT) AS cy,
                     CAST(gx%4 AS DOUBLE)/4.0 AS fx,
                     CAST(gy%4 AS DOUBLE)/4.0 AS fy
              FROM dem)
       SELECT p.gx, p.gy,
              p.z + ((g00.s*(1.0-p.fx) + g10.s*p.fx)*(1.0-p.fy)
                     + (g01.s*(1.0-p.fx) + g11.s*p.fx)*p.fy) AS v
       FROM px p
       JOIN grid g00 ON g00.cx = p.cx     AND g00.cy = p.cy
       JOIN grid g10 ON g10.cx = p.cx + 1 AND g10.cy = p.cy
       JOIN grid g01 ON g01.cx = p.cx     AND g01.cy = p.cy + 1
       JOIN grid g11 ON g11.cx = p.cx + 1 AND g11.cy = p.cy + 1""",
)
def q205(spark, sf_dir):
    """Vertical shift grid apply (alg/gdalapplyverticalshiftgrid.cpp):
    DEM + bilinear sample of a coarse datum-shift grid at 4x upsampling.
    The grid-to-pixel ratio is a power of two, so the bilinear weights
    are DYADIC (0, .25, .5, .75) and the result is exact across
    engines.  The shift grid is a real DataFrame joined once per
    corner — four broadcast hash joins, the same plan at a 10^6-cell
    grid; the DEM side stays linear."""
    spark_range = spark.range(32)
    g = spark_range.select(F.col("id").alias("gx")).crossJoin(
        spark.range(32).select(F.col("id").alias("gy")))
    dem = g.select(
        "gx", "gy",
        ((F.col("gx") * 7 + F.col("gy") * 13) % 97
         + (F.col("gx") * F.col("gx")) % 23).cast("double").alias("z"),
    )
    grid = (
        spark.range(9).select(F.col("id").alias("cx"))
        .crossJoin(spark.range(9).select(F.col("id").alias("cy")))
        .select("cx", "cy",
                ((F.col("cx") * 5 + F.col("cy") * 3) % 11 - 5)
                .cast("double").alias("s"))
    )
    px = dem.select(
        "gx", "gy", "z",
        ((F.col("gx") - F.col("gx") % 4) / 4).cast("long").alias("cx"),
        ((F.col("gy") - F.col("gy") % 4) / 4).cast("long").alias("cy"),
        ((F.col("gx") % 4).cast("double") / 4.0).alias("fx"),
        ((F.col("gy") % 4).cast("double") / 4.0).alias("fy"),
    )
    def corner(alias, dx, dy):
        return F.broadcast(grid.select(
            (F.col("cx") - dx).alias("cx"), (F.col("cy") - dy).alias("cy"),
            F.col("s").alias(alias)))
    out = (
        px.join(corner("s00", 0, 0), ["cx", "cy"])
        .join(corner("s10", 1, 0), ["cx", "cy"])
        .join(corner("s01", 0, 1), ["cx", "cy"])
        .join(corner("s11", 1, 1), ["cx", "cy"])
    )
    fx, fy = F.col("fx"), F.col("fy")
    bil = (
        (F.col("s00") * (F.lit(1.0) - fx) + F.col("s10") * fx) * (F.lit(1.0) - fy)
        + (F.col("s01") * (F.lit(1.0) - fx) + F.col("s11") * fx) * fy
    )
    return out.select("gx", "gy", (F.col("z") + bil).alias("v"))


# --- crawl-infrastructure ops (q206-q208) ---------------------------------------


@query(
    "q206_cdx_capture_dedup",
    f"""WITH d AS (SELECT doc_id, {_URL_RAW_SQL} AS url FROM documents),
       cap AS (SELECT d.url,
                      CAST(20260101 + (d.doc_id*7 + k.range*13) % 90 AS BIGINT) AS ts,
                      CAST((d.doc_id*31 + k.range*k.range) % 5 AS BIGINT) AS digest
               FROM d, range(0, 3) k),
       rk AS (SELECT url, ts, digest,
                     row_number() OVER (PARTITION BY url, digest ORDER BY ts) AS rn
              FROM cap)
       SELECT url,
              CAST(count(*) AS BIGINT) AS n_captures,
              CAST(count(DISTINCT digest) AS BIGINT) AS n_unique,
              CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_revisits,
              CAST(max(ts) AS BIGINT) AS last_ts
       FROM rk GROUP BY url""",
)
def q206(spark, sf_dir):
    """CDX-style capture index dedup (the Common-Crawl/Wayback revisit
    record): per URL, captures collapse to unique content digests; a
    capture whose digest already appeared at an earlier timestamp is a
    REVISIT.  One window per (url, digest) + one per-url aggregation —
    both shuffle on the url hash, the natural CDX shard key."""
    docs = _t(spark, sf_dir, "documents").withColumn("url", _url_raw_col())
    cap = docs.select(
        "url",
        F.explode(F.sequence(F.lit(0), F.lit(2))).alias("k"),
        F.col("doc_id"),
    ).select(
        "url",
        (20260101 + (F.col("doc_id") * 7 + F.col("k") * 13) % 90).alias("ts"),
        ((F.col("doc_id") * 31 + F.col("k") * F.col("k")) % 5).alias("digest"),
    )
    w = Window.partitionBy("url", "digest").orderBy("ts")
    rk = cap.withColumn("rn", F.row_number().over(w))
    return rk.groupBy("url").agg(
        F.count("*").alias("n_captures"),
        F.countDistinct("digest").alias("n_unique"),
        F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).alias("n_revisits"),
        F.max("ts").alias("last_ts"),
    )


@query(
    "q207_anchor_text",
    """WITH l AS (SELECT (doc_id*3 + 1) % 40 AS tgt,
                    list_filter(string_split(text, ' '), x -> x <> '')
                      [CAST(doc_id%10 + 1 AS INT)] AS anchor
              FROM documents),
       c AS (SELECT tgt, anchor, CAST(count(*) AS BIGINT) AS n
             FROM l WHERE anchor IS NOT NULL GROUP BY tgt, anchor),
       rk AS (SELECT tgt, anchor, n,
                     row_number() OVER (PARTITION BY tgt
                                        ORDER BY n DESC, anchor) AS rn,
                     sum(n) OVER (PARTITION BY tgt) AS total
              FROM c)
       SELECT tgt AS host, CAST(total AS BIGINT) AS n_links,
              anchor AS top_anchor, n AS top_n
       FROM rk WHERE rn = 1""",
)
def q207(spark, sf_dir):
    """Anchor-text aggregation (the link-graph signal web search and
    curation pipelines mine: what the web CALLS a page): per target
    host, total inbound links and the most frequent anchor token
    (ties lexicographic).  groupBy(host, anchor) then a per-host
    window — the anchor vocabulary bounds the shuffle, and hosts are
    the natural partition key at crawl scale."""
    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    l = docs.select(
        ((d * 3 + 1) % 40).alias("tgt"),
        F.try_element_at(
            F.filter(F.split(F.col("text"), " "), lambda x: x != ""),
            (d % 10 + 1).cast("int"),
        ).alias("anchor"),  # try_: OOB -> NULL (ANSI element_at would abort the job)
    ).filter(F.col("anchor").isNotNull())
    c = l.groupBy("tgt", "anchor").agg(F.count("*").alias("n"))
    w = Window.partitionBy("tgt").orderBy(F.col("n").desc(), "anchor")
    rk = c.withColumn("rn", F.row_number().over(w)).withColumn(
        "total", F.sum("n").over(Window.partitionBy("tgt")))
    return rk.filter(F.col("rn") == 1).select(
        F.col("tgt").alias("host"),
        F.col("total").alias("n_links"),
        F.col("anchor").alias("top_anchor"),
        F.col("n").alias("top_n"),
    )


@query(
    "q208_waterfill_quota",
    """WITH src AS (SELECT doc_id % 20 AS s, CAST(count(*) AS BIGINT) AS n
              FROM documents GROUP BY doc_id % 20),
       meta AS (SELECT CAST(count(*) AS BIGINT) AS nn,
                       CAST(sum(n) AS BIGINT) AS total FROM src),
       rk AS (SELECT s, n,
                     row_number() OVER (ORDER BY n, s) AS i,
                     sum(n) OVER (ORDER BY n, s) AS p
              FROM src),
       lv AS (SELECT i, n, p, CAST(p + n*(m.nn - i) AS BIGINT) AS fill, m.nn, m.total
              FROM rk, meta m
              UNION ALL
              SELECT 0, CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                     m.nn, m.total FROM meta m),
       pv AS (SELECT max_by(i, CASE WHEN fill <= 300 THEN i ELSE NULL END) AS pi
              FROM lv WHERE fill <= 300),
       cap AS (SELECT CASE WHEN m.total <= 300 THEN l.n
                           ELSE l.n + CAST(((300 - l.fill)
                                 - ((300 - l.fill) % greatest(m.nn - l.i, 1)))
                                / greatest(m.nn - l.i, 1) AS BIGINT) END AS cap,
                      CASE WHEN m.total <= 300 THEN CAST(0 AS BIGINT)
                           ELSE CAST((300 - l.fill) % greatest(m.nn - l.i, 1) AS BIGINT)
                      END AS r
               FROM lv l, pv, meta m WHERE l.i = pv.pi),
       extra AS (SELECT s, row_number() OVER (ORDER BY s) AS pos
                 FROM src, cap c WHERE n > c.cap)
       SELECT b.s, b.n,
              CAST(least(b.n, c.cap)
                   + CASE WHEN e.pos IS NOT NULL AND e.pos <= c.r
                          THEN 1 ELSE 0 END AS BIGINT) AS quota
       FROM src b LEFT JOIN extra e ON b.s = e.s, cap c""",
)
def q208(spark, sf_dir):
    """Curriculum mixing quotas by integer WATERFILL (the mixture-cap
    allocation a training pipeline runs before sampling), computed in
    CLOSED FORM: sort sources by count, prefix-sum once — at the i-th
    level the fill is P_i + n_i*(N-i), the pivot is the last level
    under budget, and the cap extends arithmetically by exact floor
    division (remainder +1 to the lowest source ids).  No candidate
    enumeration anywhere, so the plan is one window + bounded 1-row
    broadcasts regardless of how large per-source counts grow (the
    earlier 0..max(n) sweep would not survive 10^12-doc sources).
    Exact integers end-to-end; quotas sum to min(budget, total)."""
    docs = _t(spark, sf_dir, "documents")
    src = docs.groupBy((F.col("doc_id") % 20).alias("s")).agg(
        F.count("*").alias("n")).persist()
    meta = src.agg(F.count("*").alias("nn"), F.sum("n").alias("total"))
    w = Window.orderBy("n", "s")
    rk = src.select(
        "s", "n",
        F.row_number().over(w).alias("i"),
        F.sum("n").over(w).alias("p"),
    )
    lv = rk.crossJoin(F.broadcast(meta)).select(
        "i", "n", "p",
        (F.col("p") + F.col("n") * (F.col("nn") - F.col("i"))).alias("fill"),
        "nn", "total",
    ).unionByName(
        meta.select(
            F.lit(0).alias("i"), F.lit(0).cast("long").alias("n"),
            F.lit(0).cast("long").alias("p"), F.lit(0).cast("long").alias("fill"),
            "nn", "total",
        )
    )
    pv = lv.filter(F.col("fill") <= 300).agg(F.max("i").alias("pi"))
    picked = lv.join(F.broadcast(pv), lv.i == pv.pi)
    rem_budget = F.lit(300) - F.col("fill")
    # slots can be 0 only on the total<=300 branch, but ANSI mode still
    # evaluates the other branch's modulo — clamp the divisor
    slots = F.greatest(F.col("nn") - F.col("i"), F.lit(1))
    cap = picked.select(
        F.when(F.col("total") <= 300, F.col("n")).otherwise(
            F.col("n")
            + ((rem_budget - rem_budget % slots) / slots).cast("long")
        ).alias("cap"),
        F.when(F.col("total") <= 300, F.lit(0).cast("long")).otherwise(
            (rem_budget % slots).cast("long")
        ).alias("r"),
    )
    withcap = src.crossJoin(F.broadcast(cap))
    extra = withcap.filter(F.col("n") > F.col("cap")).select(
        "s", F.row_number().over(Window.orderBy("s")).alias("pos"))
    return (
        withcap.join(extra, "s", "left")
        .select(
            "s", "n",
            (F.least(F.col("n"), F.col("cap"))
             + F.when(F.col("pos").isNotNull() & (F.col("pos") <= F.col("r")), 1)
             .otherwise(0)).cast("long").alias("quota"),
        )
    )


# --- streaming CDX revisit dedup (q209) ------------------------------------------


@query(
    "q209_stream_cdx_dedup",
    f"""WITH d AS (SELECT doc_id, {_URL_RAW_SQL} AS url FROM documents),
       cap AS (SELECT d.url,
                      CAST((d.doc_id*31 + k.range*k.range) % 5 AS BIGINT) AS digest
               FROM d, range(0, 3) k),
       u AS (SELECT DISTINCT url, digest FROM cap)
       SELECT url, CAST(count(*) AS BIGINT) AS n_unique,
              CAST(sum(digest) AS BIGINT) AS digest_sum
       FROM u GROUP BY url""",
)
def q209(spark, sf_dir):
    """STREAMING CDX revisit dedup (the incremental form of q206): the
    capture feed lands in micro-batches with the same file delivered
    twice; a watermarked dropDuplicates on (url, digest) keeps the
    first capture of each content version across batches — revisits
    and redeliveries both absorb into bounded state.  The drained
    unique-capture set aggregates to exactly the batch-distinct
    oracle; ts is excluded from the output because WHICH duplicate row
    survives is delivery-order-dependent (only the key set is
    deterministic — same contract as q86)."""
    from gdal_spark.streaming.windowed import stream_capture_dedup

    docs = _t(spark, sf_dir, "documents").withColumn("url", _url_raw_col())
    d = F.col("doc_id")
    cap = docs.select(
        "url",
        F.explode(F.sequence(F.lit(0), F.lit(2))).alias("k"),
        d.alias("doc_id"),
    ).select(
        "url",
        (F.lit(1767225600) + ((F.col("doc_id") * 7 + F.col("k") * 13) % 90) * 86400)
        .alias("ts"),
        ((F.col("doc_id") * 31 + F.col("k") * F.col("k")) % 5).alias("digest"),
    )
    uniq = stream_capture_dedup(spark, cap)
    return uniq.groupBy("url").agg(
        F.count("*").alias("n_unique"),
        F.sum("digest").alias("digest_sum"),
    )


# --- MVT-style vector tile encode + GeoJSON export (q210-q211) --------------------


@query(
    "q210_mvt_point_tiles",
    f"""WITH p AS ({POINTS_SQL}),
       t AS (SELECT doc_id,
                    CAST(floor((lon + 180.0)/360.0*256.0) AS BIGINT) AS tx,
                    CAST(floor((90.0 - lat)/180.0*256.0) AS BIGINT) AS ty,
                    ((lon + 180.0)/360.0*256.0) AS fx,
                    ((90.0 - lat)/180.0*256.0) AS fy
             FROM p),
       q AS (SELECT doc_id, tx, ty,
                    CAST(floor((fx - tx)*256.0) AS BIGINT) AS qx,
                    CAST(floor((fy - ty)*256.0) AS BIGINT) AS qy
             FROM t),
       u AS (SELECT DISTINCT tx, ty, qx, qy FROM q)
       SELECT u.tx, u.ty,
              CAST(count(*) AS BIGINT) AS n_cells,
              CAST(sum(qx*256 + qy) AS BIGINT) AS cell_sum,
              CAST((SELECT count(*) FROM q WHERE q.tx = u.tx AND q.ty = u.ty)
                   AS BIGINT) AS n_points
       FROM u GROUP BY u.tx, u.ty""",
)
def q210(spark, sf_dir):
    """MVT-style vector-tile point encode (the OGR MVT driver's write
    path, ogr/ogrsf_frmts/mvt: assign features to z8 tiles, quantize
    to tile-local integer extent coordinates, collapse coincident
    quantized points).  Per-tile groupBy is the natural shard; the
    quantized-cell distinct bounds tile payloads by the extent², not
    the feature count — exactly why MVT scales to dense layers."""
    p = _points(spark, sf_dir)
    fx = (F.col("lon") + 180.0) / 360.0 * 256.0
    fy = (90.0 - F.col("lat")) / 180.0 * 256.0
    t = p.select(
        "doc_id",
        F.floor(fx).cast("long").alias("tx"),
        F.floor(fy).cast("long").alias("ty"),
        fx.alias("fx"), fy.alias("fy"),
    )
    q = t.select(
        "doc_id", "tx", "ty",
        F.floor((F.col("fx") - F.col("tx")) * 256.0).cast("long").alias("qx"),
        F.floor((F.col("fy") - F.col("ty")) * 256.0).cast("long").alias("qy"),
    ).persist()  # feeds the distinct-cell agg AND the raw point counts
    u = q.select("tx", "ty", "qx", "qy").distinct()
    cells = u.groupBy("tx", "ty").agg(
        F.count("*").alias("n_cells"),
        F.sum(F.col("qx") * 256 + F.col("qy")).alias("cell_sum"),
    )
    pts = q.groupBy("tx", "ty").agg(F.count("*").alias("n_points"))
    return cells.join(pts, ["tx", "ty"])


@query(
    "q211_geojson_export",
    """WITH f AS (SELECT n_nationkey AS fid,
              '{"type":"Feature","properties":{"fid":' || CAST(n_nationkey AS VARCHAR)
              || '},"geometry":{"type":"Polygon","coordinates":[[['
              || CAST((n_nationkey*61)%300 - 160 AS VARCHAR) || ','
              || CAST((n_nationkey*83)%140 - 75 AS VARCHAR) || '],['
              || CAST((n_nationkey*61)%300 - 160 + 10 + (n_nationkey%7)*5 AS VARCHAR) || ','
              || CAST((n_nationkey*83)%140 - 75 AS VARCHAR) || '],['
              || CAST((n_nationkey*61)%300 - 160 + 10 + (n_nationkey%7)*5 AS VARCHAR) || ','
              || CAST((n_nationkey*83)%140 - 75 + 8 + (n_nationkey%5)*4 AS VARCHAR) || '],['
              || CAST((n_nationkey*61)%300 - 160 AS VARCHAR) || ','
              || CAST((n_nationkey*83)%140 - 75 + 8 + (n_nationkey%5)*4 AS VARCHAR) || '],['
              || CAST((n_nationkey*61)%300 - 160 AS VARCHAR) || ','
              || CAST((n_nationkey*83)%140 - 75 AS VARCHAR) || ']]]}}' AS feature
       FROM nation)
       SELECT fid, feature, CAST(length(feature) AS BIGINT) AS n_bytes FROM f""",
)
def q211(spark, sf_dir):
    """GeoJSON feature export (the OGR GeoJSON writer,
    ogr/ogrsf_frmts/geojson: RFC 7946 ring orientation CCW, closed
    rings — first vertex repeated last): the zone rectangles emitted
    as canonical Feature strings, built entirely in JVM string
    expressions (integer coordinates render identically across
    engines, which is exactly why OGR's own writer pins a precision).
    Embarrassingly parallel string construction — an export sink, not
    a shuffle."""
    n = _t(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    x0 = ((k * 61) % 300 - 160).cast("long")
    y0 = ((k * 83) % 140 - 75).cast("long")
    x1 = (x0 + 10 + (k % 7) * 5).cast("long")
    y1 = (y0 + 8 + (k % 5) * 4).cast("long")

    def pt(x, y):
        return F.concat(F.lit("["), x.cast("string"), F.lit(","),
                        y.cast("string"), F.lit("]"))

    # CCW exterior in lon/lat plane: (x0,y0) -> (x1,y0) -> (x1,y1) -> (x0,y1)
    feature = F.concat(
        F.lit('{"type":"Feature","properties":{"fid":'), k.cast("string"),
        F.lit('},"geometry":{"type":"Polygon","coordinates":[['),
        pt(x0, y0), F.lit(","), pt(x1, y0), F.lit(","), pt(x1, y1),
        F.lit(","), pt(x0, y1), F.lit(","), pt(x0, y0),
        F.lit("]]}}"),
    )
    return n.select(
        k.alias("fid"),
        feature.alias("feature"),
        F.length(feature).cast("long").alias("n_bytes"),
    )


# --- curation decision-attribution matrix (q212) -----------------------------------


@query(
    "q212_curation_matrix",
    """WITH idx AS (SELECT doc_id, text, lang,
                      unnest(range(1, greatest(length(text) - 1, 2))) AS i
                 FROM documents),
       occ AS (SELECT doc_id, substr(text, CAST(i AS INT), 3) AS gram FROM idx
               WHERE length(substr(text, CAST(i AS INT), 3)) = 3),
       cf AS (SELECT gram, count(*) AS corpus_n FROM occ GROUP BY gram),
       rare AS (SELECT o.doc_id,
                       CAST(sum(CASE WHEN cf.corpus_n < 100 THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_rare,
                       CAST(count(*) AS BIGINT) AS n_grams
                FROM occ o JOIN cf USING (gram) GROUP BY o.doc_id),
       dup AS (SELECT text, min(doc_id) AS keeper FROM documents GROUP BY text),
       lab AS (SELECT d.doc_id, d.lang, length(d.text) AS n_chars,
                      CASE WHEN 5*r.n_rare >= r.n_grams THEN 'low'
                           ELSE 'high' END AS quality,
                      CASE WHEN d.doc_id = u.keeper THEN 'keep'
                           ELSE 'dup' END AS dedup
               FROM documents d
               JOIN rare r USING (doc_id)
               JOIN dup u ON d.text = u.text)
       SELECT lang, quality, dedup,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(n_chars) AS BIGINT) AS n_chars
       FROM lab GROUP BY lang, quality, dedup""",
)
def q212(spark, sf_dir):
    """Curation decision-attribution matrix (the 'what did the pipeline
    keep and WHY' accounting a production run emits): every document
    labeled on three independent axes — language, rare-gram quality
    bucket (the q187 signal, thresholded at 20% with exact integer
    cross-multiplication), exact-dup keeper status — in ONE lazy plan;
    the output is the (lang × quality × dedup) contingency matrix with
    document and char mass.  Shuffle shape: the gram-vocabulary
    aggregation + one per-text dup groupBy + the final bounded matrix
    aggregation — all crawl-shardable."""
    docs = _t(spark, sf_dir, "documents")
    occ = docs.select(
        "doc_id",
        F.explode(F.expr(
            "filter(transform(sequence(1, greatest(length(text) - 2, 1)), "
            "i -> substring(text, i, 3)), s -> length(s) = 3)"
        )).alias("gram"),
    ).persist()
    cf = occ.groupBy("gram").agg(F.count("*").alias("corpus_n"))
    rare = occ.join(cf, "gram").groupBy("doc_id").agg(
        F.sum(F.when(F.col("corpus_n") < 100, 1).otherwise(0)).alias("n_rare"),
        F.count("*").alias("n_grams"),
    )
    dup = docs.groupBy("text").agg(F.min("doc_id").alias("keeper"))
    lab = (
        docs.join(rare, "doc_id")
        .join(dup, "text")
        .select(
            "lang",
            F.length("text").alias("n_chars"),
            F.when(5 * F.col("n_rare") >= F.col("n_grams"), "low")
            .otherwise("high").alias("quality"),
            F.when(F.col("doc_id") == F.col("keeper"), "keep")
            .otherwise("dup").alias("dedup"),
        )
    )
    return lab.groupBy("lang", "quality", "dedup").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("n_chars"),
    )


# --- incremental tile maintenance via append snapshots (q213) ---------------------


@query(
    "q213_incremental_tiles",
    f"""WITH p AS ({POINTS_SQL})
       SELECT CAST(floor((lon + 180.0)/360.0*64.0) AS BIGINT) AS tx,
              CAST(floor((90.0 - lat)/180.0*64.0) AS BIGINT) AS ty,
              CAST(count(*) AS BIGINT) AS n
       FROM p GROUP BY 1, 2""",
)
def q213(spark, sf_dir):
    """INCREMENTAL tile maintenance through Iceberg-style append
    snapshots (plans/manifest.py): the point feed lands as two append
    commits; the density table is built from the FIRST snapshot, then
    maintained by aggregating ONLY the files the second commit added
    (`read_changes`) and merging — never rescanning the old data.  The
    oracle recomputes from scratch, so MATCH proves incremental ==
    batch, the invariant that makes snapshot-incremental pipelines
    trustworthy at 10^12 rows (the delta scan is proportional to the
    append, not the table)."""
    import tempfile

    from gdal_spark.plans.manifest import Manifest

    p = _points(spark, sf_dir)
    pts = p.select(
        "doc_id",
        F.floor((F.col("lon") + 180.0) / 360.0 * 64.0).cast("long").alias("tx"),
        F.floor((90.0 - F.col("lat")) / 180.0 * 64.0).cast("long").alias("ty"),
    )
    m = Manifest(tempfile.mkdtemp(prefix="gdal_spark_inc_"))
    r1 = m.append_stage(spark, "pts", pts.filter(F.col("doc_id") % 2 == 0))
    r2 = m.append_stage(spark, "pts", pts.filter(F.col("doc_id") % 2 == 1))

    def density(df):
        return df.groupBy("tx", "ty").agg(F.count("*").alias("n"))

    base = density(m.read_as_of(spark, "pts", snapshot_fp=r1.fp))
    delta = density(m.read_changes(spark, "pts", from_fp=r1.fp, to_fp=r2.fp))
    return (
        base.unionByName(delta)
        .groupBy("tx", "ty")
        .agg(F.sum("n").cast("long").alias("n"))
    )


# --- histogram equalization, gdalenhance (q214) ------------------------------------


@query(
    "q214_hist_equalize",
    f"""WITH g AS (SELECT gx.range AS gx, gy.range AS gy
                   FROM range(128) gx, range(128) gy),
       px AS (SELECT gx, gy, CAST({_z_sql('gx', 'gy')} AS BIGINT) AS v FROM g),
       h AS (SELECT v, count(*) AS c FROM px GROUP BY v),
       cdf AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM h),
       m AS (SELECT min(cum) AS cmin, CAST(128*128 AS BIGINT) AS n FROM cdf),
       lut AS (SELECT v,
                      CAST(((cum - m.cmin)*255
                            - (((cum - m.cmin)*255) % (m.n - m.cmin)))
                           / (m.n - m.cmin) AS BIGINT) AS eq
               FROM cdf, m)
       SELECT l.eq,
              CAST(count(*) AS BIGINT) AS n_px,
              CAST(min(p.v) AS BIGINT) AS v_lo,
              CAST(max(p.v) AS BIGINT) AS v_hi
       FROM px p JOIN lut l USING (v) GROUP BY l.eq""",
)
def q214(spark, sf_dir):
    """Histogram equalization (apps/gdalenhance.cpp): per-value counts
    → cumulative distribution → the classic integer LUT
    eq(v) = floor((cdf(v) - cdf_min) * 255 / (N - cdf_min)).
    All-integer floor division keeps both engines bitwise; the LUT is
    bounded by the value range and broadcast back onto the pixel table
    — one histogram pass + one broadcast join at any raster size.
    Output: the equalized histogram with each bin's source value span
    (equalization must be monotone, so spans are disjoint)."""
    g = spark.range(128).select(F.col("id").alias("gx")).crossJoin(
        spark.range(128).select(F.col("id").alias("gy")))
    px = g.select(
        "gx", "gy",
        ((F.col("gx") * 7 + F.col("gy") * 13) % 97
         + (F.col("gx") * F.col("gx")) % 23).cast("long").alias("v"),
    )
    h = px.groupBy("v").agg(F.count("*").alias("c"))
    cdf = h.withColumn("cum", F.sum("c").over(Window.orderBy("v"))).select("v", "cum")
    m = cdf.agg(F.min("cum").alias("cmin"), F.lit(128 * 128).cast("long").alias("n"))
    num = (F.col("cum") - F.col("cmin")) * 255
    den = F.col("n") - F.col("cmin")
    lut = cdf.crossJoin(F.broadcast(m)).select(
        "v", ((num - num % den) / den).cast("long").alias("eq"))
    return (
        px.join(F.broadcast(lut), "v")
        .groupBy("eq")
        .agg(
            F.count("*").alias("n_px"),
            F.min("v").alias("v_lo"),
            F.max("v").alias("v_hi"),
        )
    )


# --- alpha-shape concave hull (q215) -------------------------------------------------

_ASHAPE_PTS_SQL = """pts AS (SELECT CAST(k.range AS BIGINT) AS k,
                      CAST((k.range*k.range*7 + 3*k.range) % 37 AS BIGINT) AS x,
                      CAST((k.range*k.range*11 + 5*k.range) % 31 AS BIGINT) AS y
               FROM range(0, 14) k)"""


@query(
    "q215_concave_hull_alpha",
    f"""WITH {_ASHAPE_PTS_SQL},
       tri AS (SELECT a.k AS ka, a.x AS ax, a.y AS ay,
                      b.k AS kb, b.x AS bx, b.y AS by,
                      c.k AS kc, c.x AS cx, c.y AS cy,
                      (b.x-a.x)*(c.y-a.y) - (b.y-a.y)*(c.x-a.x) AS o
               FROM pts a, pts b, pts c
               WHERE a.k < b.k AND b.k < c.k),
       del AS (SELECT t.* FROM tri t
               WHERE NOT EXISTS (
                 SELECT 1 FROM pts d
                 WHERE d.k NOT IN (t.ka, t.kb, t.kc)
                   AND t.o * (
                     (t.ax-d.x)*(((t.by-d.y)*(((t.cx-d.x)*(t.cx-d.x)+(t.cy-d.y)*(t.cy-d.y))))
                                 - (((t.bx-d.x)*(t.bx-d.x)+(t.by-d.y)*(t.by-d.y)))*(t.cy-d.y))
                     - (t.ay-d.y)*(((t.bx-d.x)*(((t.cx-d.x)*(t.cx-d.x)+(t.cy-d.y)*(t.cy-d.y))))
                                 - (((t.bx-d.x)*(t.bx-d.x)+(t.by-d.y)*(t.by-d.y)))*(t.cx-d.x))
                     + (((t.ax-d.x)*(t.ax-d.x)+(t.ay-d.y)*(t.ay-d.y)))
                       *((t.bx-d.x)*(t.cy-d.y) - (t.by-d.y)*(t.cx-d.x))
                   ) >= 0)),
       kept AS (SELECT * FROM del
                WHERE ((ax-bx)*(ax-bx)+(ay-by)*(ay-by))
                    * ((bx-cx)*(bx-cx)+(by-cy)*(by-cy))
                    * ((cx-ax)*(cx-ax)+(cy-ay)*(cy-ay))
                    <= 120 * 4 * o * o),
       edges AS (SELECT least(ka, kb) AS k1, greatest(ka, kb) AS k2 FROM kept
                 UNION ALL SELECT least(kb, kc), greatest(kb, kc) FROM kept
                 UNION ALL SELECT least(ka, kc), greatest(ka, kc) FROM kept),
       bnd AS (SELECT k1, k2 FROM edges GROUP BY k1, k2 HAVING count(*) = 1)
       SELECT p1.x AS x1, p1.y AS y1, p2.x AS x2, p2.y AS y2
       FROM bnd JOIN pts p1 ON p1.k = bnd.k1 JOIN pts p2 ON p2.k = bnd.k2""",
)
def q215(spark, sf_dir):
    """Concave hull as an ALPHA SHAPE (apps/gdalalg_vector_concave_hull
    .cpp; GEOS concaveHull): Delaunay facets by the exact brute
    incircle criterion (the same spec as operators/grid.py's
    delaunay_triangles — integer determinants, general-position
    fixture), keep triangles with circumradius² <= alpha² via the
    cross-multiplied integer test a²b²c² <= 4*alpha²*S², and the hull
    is the edges on exactly ONE kept triangle.  Per feature group the
    point set is bounded (here 14 points, 364 triples), so the triple
    join broadcasts; across a corpus, one group per task — the same
    distribution axis as the TIN gridder."""
    k = F.col("id")
    pts = spark.range(14).select(
        k.alias("k"),
        ((k * k * 7 + 3 * k) % 37).cast("long").alias("x"),
        ((k * k * 11 + 5 * k) % 31).cast("long").alias("y"),
    )
    a = pts.select(F.col("k").alias("ka"), F.col("x").alias("ax"), F.col("y").alias("ay"))
    b = pts.select(F.col("k").alias("kb"), F.col("x").alias("bx"), F.col("y").alias("by"))
    c = pts.select(F.col("k").alias("kc"), F.col("x").alias("cx"), F.col("y").alias("cy"))
    tri = (
        a.crossJoin(F.broadcast(b)).filter(F.col("ka") < F.col("kb"))
        .crossJoin(F.broadcast(c)).filter(F.col("kb") < F.col("kc"))
        .withColumn(
            "o",
            (F.col("bx") - F.col("ax")) * (F.col("cy") - F.col("ay"))
            - (F.col("by") - F.col("ay")) * (F.col("cx") - F.col("ax")),
        )
    )
    d = pts.select(F.col("k").alias("kd"), F.col("x").alias("dx"), F.col("y").alias("dy"))
    C = F.col

    def sq(u, v):
        return u * u + v * v

    r1x, r1y = C("ax") - C("dx"), C("ay") - C("dy")
    r2x, r2y = C("bx") - C("dx"), C("by") - C("dy")
    r3x, r3y = C("cx") - C("dx"), C("cy") - C("dy")
    det = (
        r1x * (r2y * sq(r3x, r3y) - sq(r2x, r2y) * r3y)
        - r1y * (r2x * sq(r3x, r3y) - sq(r2x, r2y) * r3x)
        + sq(r1x, r1y) * (r2x * r3y - r2y * r3x)
    )
    checks = (
        tri.crossJoin(F.broadcast(d))
        .filter((C("kd") != C("ka")) & (C("kd") != C("kb")) & (C("kd") != C("kc")))
        .withColumn("bad", (C("o") * det >= 0).cast("int"))
        .groupBy("ka", "kb", "kc", "ax", "ay", "bx", "by", "cx", "cy", "o")
        .agg(F.max("bad").alias("anybad"))
    )
    dele = checks.filter(F.col("anybad") == 0)
    e2 = lambda ux, uy, vx, vy: sq(C(ux) - C(vx), C(uy) - C(vy))
    kept = dele.filter(
        e2("ax", "ay", "bx", "by") * e2("bx", "by", "cx", "cy")
        * e2("cx", "cy", "ax", "ay")
        <= 120 * 4 * C("o") * C("o")
    )
    edges = None
    for u, v in (("ka", "kb"), ("kb", "kc"), ("ka", "kc")):
        part = kept.select(
            F.least(C(u), C(v)).alias("k1"), F.greatest(C(u), C(v)).alias("k2"))
        edges = part if edges is None else edges.unionByName(part)
    bnd = edges.groupBy("k1", "k2").agg(F.count("*").alias("cnt")).filter(
        F.col("cnt") == 1)
    p1 = pts.select(F.col("k").alias("k1"), F.col("x").alias("x1"), F.col("y").alias("y1"))
    p2 = pts.select(F.col("k").alias("k2"), F.col("x").alias("x2"), F.col("y").alias("y2"))
    return bnd.join(F.broadcast(p1), "k1").join(F.broadcast(p2), "k2").select(
        "x1", "y1", "x2", "y2")


# --- nearblack collar removal (q216) --------------------------------------------------

# fixture: dark frame (width 2-3, value 2) + a dark INTERIOR pond (value
# 3, not border-connected, must be KEPT) + bright interior
_NB_V_SQL = (
    "CASE WHEN gx < 2 OR gy < 2 OR gx >= 30 OR gy >= 30 "
    "     THEN 2 "
    "     WHEN gx BETWEEN 10 AND 14 AND gy BETWEEN 10 AND 13 THEN 3 "
    "     ELSE 50 + (gx*3 + gy*5) % 20 END"
)


@query(
    "q216_nearblack",
    f"""WITH RECURSIVE g AS (SELECT gx.range AS gx, gy.range AS gy
                   FROM range(32) gx, range(32) gy),
       px AS (SELECT gx, gy, CAST({_NB_V_SQL} AS BIGINT) AS v FROM g),
       dark AS (SELECT gx, gy FROM px WHERE v < 6),
       reach AS (
         SELECT gx, gy FROM dark
         WHERE gx = 0 OR gy = 0 OR gx = 31 OR gy = 31
         UNION
         SELECT d.gx, d.gy FROM dark d JOIN reach r
           ON abs(d.gx - r.gx) + abs(d.gy - r.gy) = 1
       )
       SELECT CAST((SELECT count(*) FROM reach) AS BIGINT) AS n_collar,
              CAST((SELECT count(*) FROM dark) AS BIGINT) AS n_dark,
              CAST((SELECT count(*) FROM dark) -
                   (SELECT count(*) FROM reach) AS BIGINT) AS n_kept_dark,
              CAST((SELECT sum(gx + 32*gy) FROM reach) AS BIGINT) AS collar_sum""",
)
def q216(spark, sf_dir):
    """nearblack / raster clean-collar (apps/nearblack_lib.cpp +
    nearblack_lib_floodfill.cpp, apps/gdalalg_raster_clean_collar.cpp):
    near-black pixels CONNECTED TO THE IMAGE BORDER become nodata; an
    interior dark pond survives.  The reference flood-fills; the
    distributed re-expression builds the 4-adjacency graph over dark
    pixels plus a virtual BORDER node and runs the size-gated
    connected-components operator (operators/graph.py) — the collar is
    BORDER's component.  Edge count is linear in dark pixels; the CC
    is the same pointer-jumping machinery as polygonize label merging.
    Oracle: recursive-CTE reachability (monotone BFS)."""
    from gdal_spark.operators.graph import connected_components_auto

    g = spark.range(32).select(F.col("id").alias("gx")).crossJoin(
        spark.range(32).select(F.col("id").alias("gy")))
    v = (
        F.when((F.col("gx") < 2) | (F.col("gy") < 2)
               | (F.col("gx") >= 30) | (F.col("gy") >= 30), 2)
        .when(F.col("gx").between(10, 14) & F.col("gy").between(10, 13), 3)
        .otherwise(50 + (F.col("gx") * 3 + F.col("gy") * 5) % 20)
    )
    px = g.select("gx", "gy", v.cast("long").alias("v"))
    dark = px.filter(F.col("v") < 6).select(
        "gx", "gy", (F.col("gx") + 32 * F.col("gy")).alias("nid")).persist()
    # 4-adjacency among dark pixels (right + down suffice, CC is undirected)
    right = dark.alias("a").join(
        dark.alias("b"),
        (F.col("a.gx") + 1 == F.col("b.gx")) & (F.col("a.gy") == F.col("b.gy")),
    ).select(F.col("a.nid").alias("src"), F.col("b.nid").alias("dst"))
    down = dark.alias("a").join(
        dark.alias("b"),
        (F.col("a.gx") == F.col("b.gx")) & (F.col("a.gy") + 1 == F.col("b.gy")),
    ).select(F.col("a.nid").alias("src"), F.col("b.nid").alias("dst"))
    border = dark.filter(
        (F.col("gx") == 0) | (F.col("gy") == 0)
        | (F.col("gx") == 31) | (F.col("gy") == 31)
    ).select(F.lit(-1).cast("long").alias("src"), F.col("nid").alias("dst"))
    edges = right.unionByName(down).unionByName(border)
    cc = connected_components_auto(edges)
    # BORDER's component root is min id = -1 (the virtual node)
    collar = cc.filter((F.col("component") == -1) & (F.col("node") >= 0))
    stats = dark.agg(F.count("*").alias("n_dark"))
    cstats = collar.agg(
        F.count("*").alias("n_collar"),
        F.sum("node").alias("collar_sum"),
    )
    return cstats.crossJoin(F.broadcast(stats)).select(
        "n_collar", "n_dark",
        (F.col("n_dark") - F.col("n_collar")).alias("n_kept_dark"),
        "collar_sum",
    )


# --- linear referencing, ogrlineref (q217) ------------------------------------------


_LINEREF_SEG_SQL = """g AS (SELECT l.range AS l, i.range AS i FROM range(4) l, range(8) i),
       segc AS (SELECT l, i, 1 + (i + 2*l + i*l) % 3 AS c FROM g),
       seg AS (SELECT l, i,
                      CASE WHEN i % 2 = 0 THEN 4*c ELSE 3*c END AS dx,
                      CASE WHEN i % 2 = 0 THEN 3*c ELSE -4*c END AS dy,
                      5*c AS len
               FROM segc),
       seg2 AS (SELECT l, i, dx, dy, len,
                       COALESCE(sum(dx) OVER (PARTITION BY l ORDER BY i
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS x1,
                       20*l + COALESCE(sum(dy) OVER (PARTITION BY l ORDER BY i
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS y1,
                       COALESCE(sum(len) OVER (PARTITION BY l ORDER BY i
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum0
                FROM seg)"""


def _lineref_segments(spark):
    """Shared fixture: 4 polylines x 8 segments with 3-4-5 integer
    steps, so every segment length (5c) and every cumulative milepost
    is an exact integer on both engines."""
    g = spark.range(4).select(F.col("id").alias("l")).crossJoin(
        spark.range(8).select(F.col("id").alias("i")))
    c = 1 + (F.col("i") + 2 * F.col("l") + F.col("i") * F.col("l")) % 3
    seg = g.select(
        "l", "i",
        F.when(F.col("i") % 2 == 0, 4 * c).otherwise(3 * c).alias("dx"),
        F.when(F.col("i") % 2 == 0, 3 * c).otherwise(-4 * c).alias("dy"),
        (5 * c).alias("len"),
    )
    w = Window.partitionBy("l").orderBy("i").rowsBetween(Window.unboundedPreceding, -1)
    return seg.select(
        "l", "i", "dx", "dy", "len",
        F.coalesce(F.sum("dx").over(w), F.lit(0)).alias("x1"),
        (20 * F.col("l") + F.coalesce(F.sum("dy").over(w), F.lit(0))).alias("y1"),
        F.coalesce(F.sum("len").over(w), F.lit(0)).alias("cum0"),
    )


@query(
    "q217_lineref_coord",
    f"""WITH {_LINEREF_SEG_SQL},
       dist AS (SELECT l.range AS l, 6*j.range AS d FROM range(4) l, range(30) j)
       SELECT CAST(dist.l AS BIGINT) AS l,
              CAST(dist.d AS BIGINT) AS d,
              CAST(seg2.i AS BIGINT) AS seg,
              x1 + ((dist.d - cum0) * dx) / len AS px,
              y1 + ((dist.d - cum0) * dy) / len AS py
       FROM dist JOIN seg2 ON dist.l = seg2.l
        AND dist.d >= seg2.cum0 AND dist.d < seg2.cum0 + seg2.len""",
)
def q217(spark, sf_dir):
    """Linear referencing, get_coord mode (apps/ogrlineref.cpp:46
    op_get_coord via OGRLineString::Value, ogr/ogrlinestring.cpp):
    the point at distance d along a polyline.  Polylines decompose to
    a segment table with windowed integer cumulative mileposts
    (3-4-5 steps keep every length exact); each requested distance is
    an interval join cum0 <= d < cum0+len, then one exact linear
    interpolation inside the segment.  At corpus scale the interval
    join buckets by milepost range per line (the q30 range-join
    pattern); mileposts are computed once per line, not per request."""
    seg2 = _lineref_segments(spark)
    dist = spark.range(4).select(F.col("id").alias("dl")).crossJoin(
        spark.range(30).select((F.col("id") * 6).alias("d")))
    j = dist.join(
        F.broadcast(seg2),
        (F.col("dl") == F.col("l"))
        & (F.col("d") >= F.col("cum0"))
        & (F.col("d") < F.col("cum0") + F.col("len")),
    )
    return j.select(
        F.col("l").cast("long").alias("l"),
        F.col("d").cast("long").alias("d"),
        F.col("i").cast("long").alias("seg"),
        (F.col("x1") + (F.col("d") - F.col("cum0")) * F.col("dx") / F.col("len")).alias("px"),
        (F.col("y1") + (F.col("d") - F.col("cum0")) * F.col("dy") / F.col("len")).alias("py"),
    )


# --- color ramp + palette expansion, pct2rgb (q218) ---------------------------------


@query(
    "q218_pct2rgb_ramp",
    """WITH idx AS (SELECT k.range AS k FROM range(16) k),
       lut AS (SELECT k,
                      CASE WHEN k < 7
                           THEN floor(k * ((250 - 10) / 7.0) + 10)
                           ELSE floor((k - 7) * ((20 - 250) / 8.0) + 250) END AS r,
                      CASE WHEN k < 7
                           THEN floor(k * ((40 - 200) / 7.0) + 200)
                           ELSE floor((k - 7) * ((220 - 40) / 8.0) + 40) END AS g,
                      CASE WHEN k < 7
                           THEN floor(k * ((90 - 30) / 7.0) + 30)
                           ELSE floor((k - 7) * ((180 - 90) / 8.0) + 90) END AS b
               FROM idx),
       px AS (SELECT gx.range AS gx, gy.range AS gy,
                     (gx.range*gx.range*3 + gy.range*7 + gx.range*gy.range) % 16 AS k
              FROM range(96) gx, range(96) gy)
       SELECT CAST(px.k AS BIGINT) AS k,
              CAST(lut.r AS BIGINT) AS r,
              CAST(lut.g AS BIGINT) AS g,
              CAST(lut.b AS BIGINT) AS b,
              CAST(count(*) AS BIGINT) AS n_px,
              CAST(sum(px.gx + 96*px.gy) AS BIGINT) AS pos_sum
       FROM px JOIN lut ON px.k = lut.k
       GROUP BY px.k, lut.r, lut.g, lut.b""",
)
def q218(spark, sf_dir):
    """Palette-indexed raster -> RGB expansion (pct2rgb:
    swig/python/gdal-utils/osgeo_utils/pct2rgb.py) with the color
    table built by GDALColorTable::CreateColorRamp
    (gcore/gdalcolortable.cpp:364-418): entry(start+i) =
    trunc(i * ((c_end - c_start)/nColors) + c_start) per channel —
    the exact double slope formula is replicated verbatim (floor ==
    C short-cast for the in-gamut non-negative results).  Two chained
    ramps (0->7, 7->15, the second overwriting index 7 as SetColorEntry
    does) form the 16-entry LUT; expansion is one broadcast hash join
    onto the pixel table — the palette is O(256) rows at any raster
    size, so pct2rgb never shuffles the pixels.  pos_sum proves the
    join touched every pixel."""
    idx = spark.range(16).select(F.col("id").alias("k"))

    def ramp(lo_i, lo_c, hi_i, hi_c):
        n = float(hi_i - lo_i)
        return F.floor(
            (F.col("k") - F.lit(lo_i)) * F.lit((hi_c - lo_c) / n) + F.lit(float(lo_c))
        )

    def chan(lo1, hi1, hi2):
        return F.when(F.col("k") < 7, ramp(0, lo1, 7, hi1)).otherwise(
            ramp(7, hi1, 15, hi2))

    lut = idx.select(
        "k",
        chan(10, 250, 20).alias("r"),
        chan(200, 40, 220).alias("g"),
        chan(30, 90, 180).alias("b"),
    )
    g = spark.range(96).select(F.col("id").alias("gx")).crossJoin(
        spark.range(96).select(F.col("id").alias("gy")))
    px = g.select(
        "gx", "gy",
        ((F.col("gx") * F.col("gx") * 3 + F.col("gy") * 7
          + F.col("gx") * F.col("gy")) % 16).alias("k"),
    )
    return (
        px.join(F.broadcast(lut), "k")
        .groupBy("k", "r", "g", "b")
        .agg(
            F.count("*").cast("long").alias("n_px"),
            F.sum(F.col("gx") + 96 * F.col("gy")).cast("long").alias("pos_sum"),
        )
        .select(
            F.col("k").cast("long").alias("k"),
            F.col("r").cast("long").alias("r"),
            F.col("g").cast("long").alias("g"),
            F.col("b").cast("long").alias("b"),
            "n_px", "pos_sum",
        )
    )


# --- golden-image comparison, gdalcompare (q219) ------------------------------------


@query(
    "q219_gdalcompare",
    """WITH g AS (SELECT b.range AS band, gx.range AS gx, gy.range AS gy
                  FROM range(3) b, range(128) gx, range(128) gy),
       px AS (SELECT band, gx, gy,
                     (gx*7 + gy*11 + band*29 + (gx*gy) % 13) % 251 AS gold,
                     (gx*7 + gy*11 + band*29 + (gx*gy) % 13) % 251
                     + CASE WHEN (gx*31 + gy*17 + band) % 997 < 2
                            THEN 1 + (gx + gy + band) % 5 ELSE 0 END AS test
              FROM g)
       SELECT CAST(band AS BIGINT) AS band,
              CAST(sum(CASE WHEN gold <> test THEN 1 ELSE 0 END) AS BIGINT) AS n_diff,
              CAST(max(abs(test - gold)) AS BIGINT) AS max_diff,
              CAST(sum(abs(test - gold)) AS BIGINT) AS sum_diff,
              CAST(CASE WHEN sum(CASE WHEN gold <> test THEN 1 ELSE 0 END) = 0
                        THEN 1 ELSE 0 END AS BIGINT) AS identical
       FROM px GROUP BY band""",
)
def q219(spark, sf_dir):
    """Golden-image regression compare (gdalcompare:
    swig/python/gdal-utils/osgeo_utils/gdalcompare.py compare_band —
    per-band difference count, max abs pixel delta, and the
    identical/not verdict the autotest suite gates releases on).
    Both rasters derive from the same integer field; the test band
    injects a sparse deterministic perturbation.  One partial-agg
    scan per band pair — compare of two 100-TB images is a single
    co-partitioned zip (same tile grid -> join on tile key, NumPy
    diff per tile), never a collect."""
    g = (
        spark.range(3).select(F.col("id").alias("band"))
        .crossJoin(spark.range(128).select(F.col("id").alias("gx")))
        .crossJoin(spark.range(128).select(F.col("id").alias("gy")))
    )
    gold = (F.col("gx") * 7 + F.col("gy") * 11 + F.col("band") * 29
            + (F.col("gx") * F.col("gy")) % 13) % 251
    bump = F.when(
        (F.col("gx") * 31 + F.col("gy") * 17 + F.col("band")) % 997 < 2,
        1 + (F.col("gx") + F.col("gy") + F.col("band")) % 5,
    ).otherwise(F.lit(0))
    px = g.select("band", gold.alias("gold"), (gold + bump).alias("test"))
    d = F.abs(F.col("test") - F.col("gold"))
    ndiff = F.sum(F.when(F.col("gold") != F.col("test"), 1).otherwise(0))
    return px.groupBy("band").agg(
        ndiff.cast("long").alias("n_diff"),
        F.max(d).cast("long").alias("max_diff"),
        F.sum(d).cast("long").alias("sum_diff"),
        F.when(ndiff == 0, 1).otherwise(0).cast("long").alias("identical"),
    ).select(F.col("band").cast("long").alias("band"),
             "n_diff", "max_diff", "sum_diff", "identical")


# --- composition blend modes, gdal raster blend (q220) ------------------------------

from gdal_spark.functions import blend as BL  # noqa: E402

_BL_SIZE = 48
_BL_OPACITY = 153
# Band fixtures: pure integer arithmetic over (gx, gy) — identical bytes
# in both engines.  The (gx*48+gy)%53 stripe zeroes BOTH alphas (hits the
# finalAlpha==0 branch of DivScale255); other stripes pin 255 alphas.
_BL_BANDS = {
    "br": "(gx*3 + gy*5) % 256",
    "bg": "(gx*7 + gy*11 + 37) % 256",
    "bb": "(gx*13 + gy*2 + 101) % 256",
    "ba": ("(CASE WHEN (gx*48 + gy) % 53 = 0 THEN 0 "
           "WHEN (gx*gy) % 7 = 0 THEN 255 "
           "ELSE 100 + (gx*5 + gy*3) % 156 END)"),
    "orr": "(gx*17 + gy*23 + 5) % 256",
    "og": "(gx*29 + gy*31 + 201) % 256",
    "ob": "(gx*4 + gy*9 + 77) % 256",
    "oa": ("(CASE WHEN (gx*48 + gy) % 53 = 0 THEN 0 "
           "WHEN (gx + gy) % 11 = 0 THEN 255 "
           "ELSE (gx*11 + gy*13) % 256 END)"),
}


def _blend_oracle_sql() -> str:
    bands = ", ".join(f"{e} AS {k}" for k, e in _BL_BANDS.items())
    parts = []
    for mode in BL.MODES:
        e = BL.blend_exprs(
            "duck", mode, ("br", "bg", "bb", "ba"),
            ("orr", "og", "ob", "oa"), _BL_OPACITY,
        )
        parts.append(
            f"SELECT '{mode}' AS bmode, gx, gy, "
            f"CAST({e['r']} AS BIGINT) AS r, "
            f"CAST({e['g']} AS BIGINT) AS g, "
            f"CAST({e['b']} AS BIGINT) AS b, "
            f"CAST({e['a']} AS BIGINT) AS a FROM px"
        )
        del e
    union = " UNION ALL ".join(parts)
    return (
        f"WITH g AS (SELECT x.range AS gx, y.range AS gy "
        f"FROM range({_BL_SIZE}) x, range({_BL_SIZE}) y), "
        f"px AS (SELECT gx, gy, {bands} FROM g) {union}"
    )


@query("q220_blend_modes", _blend_oracle_sql())
def q220(spark, sf_dir):
    """All 8 separable composition modes of ``gdal raster blend``
    (apps/gdalalg_raster_blend.cpp BlendMultiply/Screen/Overlay/
    HardLight/Darken/Lighten/ColorBurn/ColorDodge_Generic, exact
    MulScale255/DivScale255/GByte-wrap integer semantics incl. the
    premultiply + final unpremultiply-by-Da' steps and 60% opacity on
    the overlay alpha) over a synthetic RGBA pair.  The Spark plan is
    ONE whole-stage-codegen projection per mode over the co-located
    band columns — at 100 TB this is a tile-key zip join + a pure JVM
    map, no Python, no extra shuffle."""
    from functools import reduce

    g = (
        spark.range(_BL_SIZE).select(F.col("id").alias("gx"))
        .crossJoin(spark.range(_BL_SIZE).select(F.col("id").alias("gy")))
    )
    px = g.selectExpr(
        "gx", "gy", *[f"{e} AS {k}" for k, e in _BL_BANDS.items()]
    )
    parts = []
    for mode in BL.MODES:
        e = BL.blend_exprs(
            "spark", mode, ("br", "bg", "bb", "ba"),
            ("orr", "og", "ob", "oa"), _BL_OPACITY,
        )
        parts.append(px.selectExpr(
            f"'{mode}' AS bmode", "gx", "gy",
            f"CAST({e['r']} AS BIGINT) AS r",
            f"CAST({e['g']} AS BIGINT) AS g",
            f"CAST({e['b']} AS BIGINT) AS b",
            f"CAST({e['a']} AS BIGINT) AS a",
        ))
    return reduce(DataFrame.unionAll, parts)


# --- interval-spec reclassify, gdal raster reclassify (q221) ------------------------

from gdal_spark.operators.reclassify import (  # noqa: E402
    interval_case_sql,
    parse_mapping,
    reclassify_column,
)

_RC_NODATA = -999.0
_RC_SPEC = ("NO_DATA=255;(-200,-100]=0;(-100,0)=1;[0,10)=2;[10,20]=3;"
            "(20,40]=PASS_THROUGH;DEFAULT=99")
_RC_MAPPING = parse_mapping(_RC_SPEC, nodata=_RC_NODATA)
_RC_V = ("(CASE WHEN (gx + gy) % 17 = 0 THEN -999 "
         "ELSE (gx*7 + gy*13) % 261 - 150 END)")


@query(
    "q221_reclassify_intervals",
    f"""WITH g AS (SELECT x.range AS gx, y.range AS gy
                   FROM range(64) x, range(64) y),
        px AS (SELECT gx, gy, CAST({_RC_V} AS DOUBLE) AS v FROM g)
        SELECT gx, gy, {interval_case_sql(_RC_MAPPING, 'v')} AS out
        FROM px""",
)
def q221(spark, sf_dir):
    """``gdal raster reclassify`` mapping language
    (frmts/vrt/vrtreclassifier.cpp Interval::Parse:33 / Init:202 /
    Reclassify:397): constant + open/closed/mixed intervals with
    nextafter-realized open bounds, NO_DATA source constant, NO_DATA /
    PASS_THROUGH targets, DEFAULT fallback.  The parsed non-overlapping
    interval list becomes ONE ordered when-chain Column (the reference's
    binary search is equivalent on non-overlapping intervals) — a pure
    codegen projection per tile at 100 TB, no join, no Python."""
    g = (
        spark.range(64).select(F.col("id").alias("gx"))
        .crossJoin(spark.range(64).select(F.col("id").alias("gy")))
    )
    px = g.selectExpr("gx", "gy", f"CAST({_RC_V} AS DOUBLE) AS v")
    return px.select(
        "gx", "gy", reclassify_column(F.col("v"), _RC_MAPPING).alias("out")
    )


# --- exponent scale, gdal raster scale -exponent (q222) -----------------------------

from gdal_spark.operators.translate import power_scale_col  # noqa: E402


@query(
    "q222_power_scale",
    """WITH g AS (SELECT x.range AS gx, y.range AS gy
                  FROM range(64) x, range(64) y),
       px AS (SELECT gx, gy,
                     CAST((gx*11 + gy*7) % 301 AS DOUBLE) AS v FROM g),
       pv AS (SELECT gx, gy, v,
                     CASE WHEN (v - 0.0) / 256.0 < 0.0 THEN 0.0
                          WHEN (v - 0.0) / 256.0 > 1.0 THEN 1.0
                          ELSE (v - 0.0) / 256.0 END AS p FROM px)
       SELECT gx, gy, v, 1024.0 * (p * p) + 10.0 AS out FROM pv""",
)
def q222(spark, sf_dir):
    """``gdal raster scale`` with ``-exponent 2`` (power scaling,
    frmts/vrt/vrtsources.cpp:4042-4056): normalize to [0,1] against the
    source range, CLIP (the default; --no-clip disables), square, map
    onto the destination range.  srcMax=256 makes pv dyadic and the
    whole tree float-exact on both engines.  Values above srcMax (v up
    to 300) exercise the clip branch.  One codegen projection — the
    linear path is q82's scale_tiles."""
    g = (
        spark.range(64).select(F.col("id").alias("gx"))
        .crossJoin(spark.range(64).select(F.col("id").alias("gy")))
    )
    px = g.select(
        "gx", "gy",
        ((F.col("gx") * 11 + F.col("gy") * 7) % 301).cast("double").alias("v"),
    )
    return px.select(
        "gx", "gy", "v",
        power_scale_col(F.col("v"), 0.0, 256.0, 10.0, 1034.0, 2).alias("out"),
    )


# --- point sample, gdallocationinfo / gdal raster pixel-info (q223) -----------------


@query(
    "q223_pixel_info",
    """WITH pts AS (SELECT doc_id, ((doc_id*9973)%36000)/100.0 - 180.0 AS lon,
                           ((doc_id*7919)%16000)/100.0 - 80.0 AS lat
                    FROM documents WHERE doc_id % 7 = 0),
       loc AS (SELECT doc_id, lon, lat,
                      CAST(floor((lon - (-180.0)) / 0.5) AS BIGINT) AS px,
                      CAST(floor((lat - 90.0) / (-0.5)) AS BIGINT) AS ly
               FROM pts),
       rast AS (SELECT x.range AS px, y.range AS ly,
                       (x.range*31 + y.range*17) % 1000 AS val
                FROM range(128) x, range(128) y)
       SELECT l.doc_id, l.px, l.ly,
              CAST(CASE WHEN r.val IS NULL THEN 0 ELSE 1 END AS BIGINT)
                  AS inside,
              r.val AS val
       FROM loc l LEFT JOIN rast r ON l.px = r.px AND l.ly = r.ly""",
)
def q223(spark, sf_dir):
    """``gdallocationinfo`` / ``gdal raster pixel-info``
    (apps/gdallocationinfo.cpp): invert the (north-up) geotransform —
    pixel = floor((x - x0)/dx), line = floor((y - y0)/dy) — and report
    the band value, NULL + inside=0 for points outside the raster
    ("located outside" in the tool's report).  Shape at 100 TB: the
    POINT side broadcasts into an equi-join against the tiled pixel
    table keyed by (pixel, line) — partition-prunable when the raster
    is tile-partitioned; no Python anywhere."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    pts = d.select(
        "doc_id",
        (((F.col("doc_id") * 9973) % 36000) / 100.0 - 180.0).alias("lon"),
        (((F.col("doc_id") * 7919) % 16000) / 100.0 - 80.0).alias("lat"),
    )
    loc = pts.select(
        "doc_id",
        F.floor((F.col("lon") - (-180.0)) / 0.5).cast("long").alias("px"),
        F.floor((F.col("lat") - 90.0) / (-0.5)).cast("long").alias("ly"),
    )
    rast = (
        spark.range(128).select(F.col("id").alias("px"))
        .crossJoin(spark.range(128).select(F.col("id").alias("ly")))
        .select("px", "ly",
                ((F.col("px") * 31 + F.col("ly") * 17) % 1000).alias("val"))
    )
    j = loc.join(F.broadcast(rast), ["px", "ly"], "left")
    return j.select(
        "doc_id", "px", "ly",
        F.when(F.col("val").isNull(), 0).otherwise(1).cast("long")
            .alias("inside"),
        "val",
    )


# --- raster to xyz export, gdal2xyz (q224) ------------------------------------------


@query(
    "q224_raster_xyz",
    """WITH g AS (SELECT x.range AS px, y.range AS ly
                  FROM range(96) x, range(96) y),
       bands AS (SELECT px, ly,
                        (px*13 + ly*29) % 251 AS b1,
                        (px*5 + ly*3 + 7) % 251 AS b2
                 FROM g)
       SELECT -180.0 + (px + 0.5) * 0.25 AS x,
              90.0 + (ly + 0.5) * (-0.25) AS y,
              CAST(b1 AS BIGINT) AS b1, CAST(b2 AS BIGINT) AS b2
       FROM bands WHERE b1 <> 0""",
)
def q224(spark, sf_dir):
    """``gdal2xyz`` (swig/python/gdal-utils/osgeo_utils/gdal2xyz.py):
    every pixel becomes one (x, y, band1, band2, ...) row with CENTER
    coordinates x0+(px+0.5)*dx, and -skipnodata drops rows whose first
    band equals the nodata value (0 here).  Dyadic dx=0.25 keeps the
    centers float-exact.  Pure projection + filter over the pixel
    table — the export IS the scan, no shuffle."""
    g = (
        spark.range(96).select(F.col("id").alias("px"))
        .crossJoin(spark.range(96).select(F.col("id").alias("ly")))
    )
    bands = g.select(
        "px", "ly",
        ((F.col("px") * 13 + F.col("ly") * 29) % 251).alias("b1"),
        ((F.col("px") * 5 + F.col("ly") * 3 + 7) % 251).alias("b2"),
    )
    return bands.filter(F.col("b1") != 0).select(
        (F.lit(-180.0) + (F.col("px") + 0.5) * 0.25).alias("x"),
        (F.lit(90.0) + (F.col("ly") + 0.5) * (-0.25)).alias("y"),
        F.col("b1").cast("long").alias("b1"),
        F.col("b2").cast("long").alias("b2"),
    )


# --- polygonal coverage check, gdal vector check-coverage (q225) --------------------

from gdal_spark.operators.coverage import check_coverage  # noqa: E402


@query(
    "q225_coverage_check",
    """WITH r AS (SELECT k.range AS id,
                    (k.range % 5)*4 + CASE WHEN k.range = 7 THEN 1 ELSE 0 END
                        AS x0,
                    (k.range // 5)*4 AS y0,
                    (k.range % 5)*4 + CASE WHEN k.range = 7 THEN 1 ELSE 0 END
                        + 4 AS x1,
                    (k.range // 5)*4 + 4 AS y1
             FROM range(25) k),
       seg AS (
         SELECT id, 'v' AS orient,
                CASE WHEN s.side = 0 THEN x0 ELSE x1 END AS c,
                y0 + u.range AS t,
                CAST(CASE WHEN s.side = 0 THEN x0 ELSE x1 END AS DOUBLE)
                    AS mx,
                y0 + u.range + 0.5 AS my
         FROM r, range(4) u, (VALUES (0), (1)) s(side)
         UNION ALL
         SELECT id, 'h' AS orient,
                CASE WHEN s.side = 0 THEN y0 ELSE y1 END AS c,
                x0 + u.range AS t,
                x0 + u.range + 0.5 AS mx,
                CAST(CASE WHEN s.side = 0 THEN y0 ELSE y1 END AS DOUBLE)
                    AS my
         FROM r, range(4) u, (VALUES (0), (1)) s(side)),
       cnt AS (SELECT orient, c, t, count(*) AS n_owners
               FROM seg GROUP BY orient, c, t),
       marked AS (
         SELECT s.id, s.orient, s.c, s.t, n.n_owners,
                CASE WHEN (s.orient = 'v' AND s.c IN (0, 20))
                       OR (s.orient = 'h' AND s.c IN (0, 20))
                     THEN 1 ELSE 0 END AS on_hull,
                CASE WHEN EXISTS (
                       SELECT 1 FROM r o
                       WHERE o.id <> s.id
                         AND s.mx > o.x0 AND s.mx < o.x1
                         AND s.my > o.y0 AND s.my < o.y1)
                     THEN 1 ELSE 0 END AS ov
         FROM seg s JOIN cnt n
           ON s.orient = n.orient AND s.c = n.c AND s.t = n.t)
       SELECT r.id,
              CAST(COALESCE(SUM(CASE WHEN (m.n_owners = 1 AND m.on_hull = 0)
                                       OR m.ov = 1 THEN 1 END), 0) AS BIGINT)
                  AS invalid_len
       FROM r LEFT JOIN marked m ON m.id = r.id
       GROUP BY r.id""",
)
def q225(spark, sf_dir):
    """``gdal vector check-coverage``
    (apps/gdalalg_vector_check_coverage.cpp:104 → GEOS
    CoverageIsValid): per polygon, the length of boundary that is
    INVALID — bounding a gap (unmatched by any neighbour, off the
    coverage hull) or crossing another polygon's interior (overlap).
    Fixture: a 5×5 tiling of 4×4 tiles with tile 7 shifted +1 in x,
    creating a 1-wide gap on its left and a 1-wide overlap with tile 8.
    Unit-segment multiset groupBy (vocabulary-bounded shuffle) + a
    broadcast midpoint-in-other-polygon join — never polygon ×
    polygon."""
    k = spark.range(25).select(F.col("id"))
    rects = k.select(
        "id",
        ((F.col("id") % 5) * 4
         + F.when(F.col("id") == 7, 1).otherwise(0)).alias("x0"),
        (F.floor(F.col("id") / 5) * 4).cast("long").alias("y0"),
        ((F.col("id") % 5) * 4
         + F.when(F.col("id") == 7, 1).otherwise(0) + 4).alias("x1"),
        (F.floor(F.col("id") / 5) * 4 + 4).cast("long").alias("y1"),
    )
    return check_coverage(rects, (0, 0, 20, 20))


# --- Delaunay triangulation surface, ST_DelaunayTriangles (q226) --------------------


@query(
    "q226_delaunay_triangles",
    """WITH p AS (SELECT k.range AS id, (k.range*37) % 97 AS x,
                         (k.range*61) % 89 AS y
                  FROM range(20) k)
       SELECT a.id AS ia, b.id AS ib, c.id AS ic
       FROM p a, p b, p c
       WHERE a.id < b.id AND b.id < c.id
         AND (b.x - a.x)*(c.y - a.y) - (b.y - a.y)*(c.x - a.x) <> 0
         AND NOT EXISTS (
           SELECT 1 FROM p d
           WHERE d.id <> a.id AND d.id <> b.id AND d.id <> c.id
             AND ((b.x - a.x)*(c.y - a.y) - (b.y - a.y)*(c.x - a.x))
                 * ( (a.x - d.x) * ((b.y - d.y)
                         * ((c.x - d.x)*(c.x - d.x)
                            + (c.y - d.y)*(c.y - d.y))
                       - (c.y - d.y)
                         * ((b.x - d.x)*(b.x - d.x)
                            + (b.y - d.y)*(b.y - d.y)))
                   - (a.y - d.y) * ((b.x - d.x)
                         * ((c.x - d.x)*(c.x - d.x)
                            + (c.y - d.y)*(c.y - d.y))
                       - (c.x - d.x)
                         * ((b.x - d.x)*(b.x - d.x)
                            + (b.y - d.y)*(b.y - d.y)))
                   + ((a.x - d.x)*(a.x - d.x) + (a.y - d.y)*(a.y - d.y))
                     * ((b.x - d.x)*(c.y - d.y) - (c.x - d.x)*(b.y - d.y))
                 ) > 0)""",
)
def q226(spark, sf_dir):
    """ST_DelaunayTriangles / GDALTriangulationCreateDelaunay
    (alg/delaunay.c; ogr SQLite dialect DelaunayTriangulation): emit
    every Delaunay facet of an integer point set by the DEFINING
    property — (a,b,c) is a facet iff no other point lies strictly
    inside its circumcircle — as a fully distributed plan: broadcast
    triple enumeration filtered by an exact int64 incircle
    determinant, candidates anti-joined against violating points.
    The same exact predicate as operators/grid.delaunay_triangles
    (the TIN kernel), here evaluated relationally so the facet test
    shards over the cluster instead of one driver loop."""
    p = spark.range(20).select(
        F.col("id"),
        ((F.col("id") * 37) % 97).alias("x"),
        ((F.col("id") * 61) % 89).alias("y"),
    )
    a = p.select(F.col("id").alias("ia"), F.col("x").alias("ax"),
                 F.col("y").alias("ay"))
    b = p.select(F.col("id").alias("ib"), F.col("x").alias("bx"),
                 F.col("y").alias("by"))
    c = p.select(F.col("id").alias("ic"), F.col("x").alias("cx"),
                 F.col("y").alias("cy"))
    tri = (
        a.crossJoin(b).filter(F.col("ia") < F.col("ib"))
        .crossJoin(c).filter(F.col("ib") < F.col("ic"))
    )
    orient = (
        (F.col("bx") - F.col("ax")) * (F.col("cy") - F.col("ay"))
        - (F.col("by") - F.col("ay")) * (F.col("cx") - F.col("ax"))
    )
    tri = tri.filter(orient != 0).withColumn("o", orient)
    d = p.select(F.col("id").alias("idd"), F.col("x").alias("dx"),
                 F.col("y").alias("dy"))
    r1x = F.col("ax") - F.col("dx"); r1y = F.col("ay") - F.col("dy")
    r2x = F.col("bx") - F.col("dx"); r2y = F.col("by") - F.col("dy")
    r3x = F.col("cx") - F.col("dx"); r3y = F.col("cy") - F.col("dy")
    c1 = r1x * r1x + r1y * r1y
    c2 = r2x * r2x + r2y * r2y
    c3 = r3x * r3x + r3y * r3y
    det = (
        r1x * (r2y * c3 - r3y * c2)
        - r1y * (r2x * c3 - r3x * c2)
        + c1 * (r2x * r3y - r3x * r2y)
    )
    viol = (
        (F.col("idd") != F.col("ia"))
        & (F.col("idd") != F.col("ib"))
        & (F.col("idd") != F.col("ic"))
        & (F.col("o") * det > 0)
    )
    return (
        tri.join(F.broadcast(d), viol, "left_anti")
        .select("ia", "ib", "ic")
    )


# --- focal neighborhood statistics, gdal raster neighbors (q227) --------------------


@query(
    "q227_raster_neighbors",
    """WITH t AS (SELECT x.range AS tx, y.range AS ty
                  FROM range(1, 39) x, range(1, 39) y),
       off AS (SELECT dy.range - 1 AS dy, dx.range - 1 AS dx
               FROM range(3) dy, range(3) dx),
       cells AS (
         SELECT t.tx, t.ty,
                (o.dy + 1) * 3 + (o.dx + 1) AS scanpos,
                CASE WHEN o.dy = 0 AND o.dx = 0 THEN 4
                     WHEN o.dy = 0 OR o.dx = 0 THEN 2 ELSE 1 END AS coef,
                ((t.tx + o.dx) * 7 + (t.ty + o.dy) * 13
                 + ((t.tx + o.dx) * (t.ty + o.dy)) % 5) % 97 AS v
         FROM t, off o),
       ranked AS (
         SELECT *, row_number() OVER (PARTITION BY tx, ty
                                      ORDER BY v, scanpos) AS rnk
         FROM cells),
       base AS (
         SELECT tx, ty,
                CAST(sum(v * coef) AS BIGINT) AS wsum,
                sum(v * coef) / 16.0 AS wmean,
                CAST(min(v) AS BIGINT) AS mn,
                CAST(max(v) AS BIGINT) AS mx,
                CAST(max(CASE WHEN rnk = 5 THEN v END) AS BIGINT) AS med,
                CAST(9 * sum(v * v) - sum(v) * sum(v) AS BIGINT) AS var_num
         FROM ranked GROUP BY tx, ty),
       grp AS (
         SELECT tx, ty, v, count(*) AS cnt, max(scanpos) AS attain
         FROM cells GROUP BY tx, ty, v),
       g1 AS (SELECT *, max(cnt) OVER (PARTITION BY tx, ty) AS maxc
              FROM grp),
       g2 AS (SELECT *, min(CASE WHEN cnt = maxc THEN attain END)
                            OVER (PARTITION BY tx, ty) AS best
              FROM g1),
       modes AS (
         SELECT tx, ty,
                CAST(max(CASE WHEN cnt = maxc AND attain = best THEN v END)
                     AS BIGINT) AS mode_v
         FROM g2 GROUP BY tx, ty)
       SELECT b.tx, b.ty, b.wsum, b.wmean, b.mn, b.mx, b.med, b.var_num,
              m.mode_v
       FROM base b JOIN modes m ON b.tx = m.tx AND b.ty = m.ty""",
)
def q227(spark, sf_dir):
    """``gdal raster neighbors`` (apps/gdalalg_raster_neighbors.cpp →
    VRTKernelFilteredSource::FilterData, frmts/vrt/vrtfilters.cpp:
    500-695): 3×3 neighborhood methods over interior pixels — weighted
    sum + NORMALIZED mean with the [1,2,1;2,4,2;1,2,1] kernel (kernel
    sum 16 ⇒ dyadic-exact mean), min/max/median (odd window ⇒ the
    rank-5 order statistic) and mode with the reference's
    first-to-reach-max-count-in-scan-order tie rule (a value attains
    its final count at its LAST scan position, so the winner is the
    max-count value with the smallest last-occurrence position — no
    per-row state needed).  stddev is emitted as the exact integer
    variance numerator 9·Σv² − (Σv)² (the reference's Welford
    M2/n = var_num/81; sqrt'ing a float would be engine-ordered).
    Relational halo: each target aggregates its 9 formula-derived
    neighbor cells — on a tiled 100-TB raster the same plan reads each
    tile once with a 1-pixel halo strip exchange (operators/focal
    pattern), shuffle bounded by tile perimeter, no Python."""
    t = (
        spark.range(1, 39).select(F.col("id").alias("tx"))
        .crossJoin(spark.range(1, 39).select(F.col("id").alias("ty")))
    )
    off = (
        spark.range(3).select((F.col("id") - 1).alias("dy"))
        .crossJoin(spark.range(3).select((F.col("id") - 1).alias("dx")))
    )
    sx = F.col("tx") + F.col("dx")
    sy = F.col("ty") + F.col("dy")
    cells = t.crossJoin(F.broadcast(off)).select(
        "tx", "ty",
        ((F.col("dy") + 1) * 3 + (F.col("dx") + 1)).alias("scanpos"),
        F.when((F.col("dy") == 0) & (F.col("dx") == 0), 4)
         .when((F.col("dy") == 0) | (F.col("dx") == 0), 2)
         .otherwise(1).alias("coef"),
        ((sx * 7 + sy * 13 + (sx * sy) % 5) % 97).alias("v"),
    )
    w = Window.partitionBy("tx", "ty").orderBy("v", "scanpos")
    ranked = cells.withColumn("rnk", F.row_number().over(w))
    base = ranked.groupBy("tx", "ty").agg(
        F.sum(F.col("v") * F.col("coef")).cast("long").alias("wsum"),
        (F.sum(F.col("v") * F.col("coef")) / 16.0).alias("wmean"),
        F.min("v").cast("long").alias("mn"),
        F.max("v").cast("long").alias("mx"),
        F.max(F.when(F.col("rnk") == 5, F.col("v"))).cast("long")
            .alias("med"),
        (9 * F.sum(F.col("v") * F.col("v"))
         - F.sum("v") * F.sum("v")).cast("long").alias("var_num"),
    )
    grp = cells.groupBy("tx", "ty", "v").agg(
        F.count("*").alias("cnt"), F.max("scanpos").alias("attain")
    )
    wp = Window.partitionBy("tx", "ty")
    grp = grp.withColumn("maxc", F.max("cnt").over(wp)).withColumn(
        "best",
        F.min(F.when(F.col("cnt") == F.col("maxc"), F.col("attain"))).over(wp),
    )
    modes = grp.groupBy("tx", "ty").agg(
        F.max(
            F.when(
                (F.col("cnt") == F.col("maxc"))
                & (F.col("attain") == F.col("best")),
                F.col("v"),
            )
        ).cast("long").alias("mode_v")
    )
    return base.join(modes, ["tx", "ty"])


# --- robots.txt longest-match policy (q228) -----------------------------------------

_ROBOTS_RULES = [
    # (ruleset, path_prefix, allow)
    (0, "/private/", 0), (0, "/private/public-info/", 1), (0, "/tmp/", 0),
    (0, "/articles/amp/", 0),
    (1, "/private/", 0), (1, "/private/public-info/", 1), (1, "/tmp/", 0),
    (1, "/articles/amp/", 1),
    (2, "/private/", 0), (2, "/private/public-info/", 1), (2, "/tmp/", 0),
    (2, "/articles/", 0), (2, "/articles/item1", 1),
    (3, "/", 0), (3, "/articles/", 1),
]

_ROBOTS_PATH_SQL = """
    CASE doc_id % 6
      WHEN 0 THEN '/private/data' || CAST(doc_id % 9 AS STRING)
      WHEN 1 THEN '/private/public-info/page' || CAST(doc_id % 9 AS STRING)
      WHEN 2 THEN '/articles/item' || CAST(doc_id % 50 AS STRING)
      WHEN 3 THEN '/tmp/cache' || CAST(doc_id % 9 AS STRING)
      WHEN 4 THEN '/'
      ELSE '/articles/amp/item' || CAST(doc_id % 50 AS STRING)
    END
"""


def _robots_oracle_sql() -> str:
    vals = ", ".join(f"({r}, '{p}', {a})" for r, p, a in _ROBOTS_RULES)
    return f"""WITH d AS (SELECT doc_id, doc_id % 40 AS host_id,
                      {_ROBOTS_PATH_SQL} AS path FROM documents),
       rules(ruleset, prefix, allow) AS (VALUES {vals}),
       m AS (SELECT d.doc_id, d.host_id,
                    max(length(r.prefix) * 2 + r.allow) AS code
             FROM d LEFT JOIN rules r
               ON d.host_id % 4 = r.ruleset
              AND starts_with(d.path, r.prefix)
             GROUP BY d.doc_id, d.host_id)
       SELECT doc_id, host_id,
              CAST(COALESCE(code, 1) % 2 AS BIGINT) AS allowed,
              CAST(COALESCE(code, 1) // 2 AS BIGINT) AS matched_len
       FROM m"""


@query("q228_robots_longest_match", _robots_oracle_sql())
def q228(spark, sf_dir):
    """robots.txt REP evaluation (RFC 9309 / Google robots.cc
    semantics, the crawl-side gate every Common-Crawl-style corpus
    applies): per (host, path), the most-specific (LONGEST) matching
    rule decides; an allow and a disallow of equal length tie to
    ALLOW; no match ⇒ allowed.  The (length, allow) lexicographic
    winner is encoded as the integer ``2·len + allow`` so the argmax
    is a plain map-side-combinable MAX — no window, no sort.  Rules
    broadcast (a rules table is ~10^6 rows for the whole web — always
    the small side); docs never shuffle."""
    d = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", "doc_id % 40 AS host_id",
        f"{_ROBOTS_PATH_SQL} AS path",
    )
    rules = spark.createDataFrame(
        _ROBOTS_RULES, "ruleset INT, prefix STRING, allow INT"
    )
    j = d.join(
        F.broadcast(rules),
        (F.col("host_id") % 4 == F.col("ruleset"))
        & F.col("path").startswith(F.col("prefix")),
        "left",
    )
    m = j.groupBy("doc_id", "host_id").agg(
        F.max(F.length("prefix") * 2 + F.col("allow")).alias("code")
    )
    code = F.coalesce(F.col("code"), F.lit(1))
    return m.select(
        "doc_id", "host_id",
        (code % 2).cast("long").alias("allowed"),
        F.floor(code / 2).cast("long").alias("matched_len"),
    )


# --- registrable-domain blocklist filter (q229) -------------------------------------

_BLOCKLIST = [
    "site3.com", "site17.com", "site17.co.uk", "cdn.site5.com",
    "site21.co.uk", "site38.com",
]

_BLOCK_HOST_SQL = """
    CASE WHEN doc_id % 4 = 0 THEN 'cdn.' ELSE '' END ||
    'site' || CAST(doc_id % 40 AS STRING) ||
    CASE WHEN doc_id % 3 = 0 THEN '.co.uk' ELSE '.com' END
"""


def _blocklist_oracle_sql() -> str:
    vals = ", ".join(f"('{e}')" for e in _BLOCKLIST)
    return f"""WITH d AS (SELECT doc_id, {_BLOCK_HOST_SQL} AS host
                    FROM documents),
       s AS (SELECT doc_id, host,
                    [array_to_string(string_split(host, '.')[i:], '.')
                     for i in range(1, len(string_split(host, '.')) + 1)]
                        AS sufs
             FROM d),
       bl(entry) AS (VALUES {vals}),
       hit AS (SELECT s.doc_id, min(b.entry) AS matched
               FROM s JOIN bl b ON list_contains(s.sufs, b.entry)
               GROUP BY s.doc_id)
       SELECT d.doc_id, d.host,
              CAST(CASE WHEN h.matched IS NULL THEN 0 ELSE 1 END AS BIGINT)
                  AS blocked,
              h.matched
       FROM d LEFT JOIN hit h ON d.doc_id = h.doc_id"""


@query("q229_domain_blocklist", _blocklist_oracle_sql())
def q229(spark, sf_dir):
    """UT1/adult-list-style domain blocklist filtering (the CCNet /
    RefinedWeb URL gate): a host is blocked iff the list contains the
    host itself or ANY parent domain (label-suffix match — so
    ``cdn.site17.co.uk`` hits ``site17.co.uk``).  The host explodes
    into its dot-suffix chain (≤ ~6 per host, pure JVM array ops) and
    equi-joins the broadcast blocklist — candidate volume is
    suffix-bounded, never host × entry regex scanning.  Deterministic
    report: the lexicographically smallest matching entry."""
    d = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"{_BLOCK_HOST_SQL} AS host"
    )
    s = d.selectExpr(
        "doc_id", "host",
        "explode(transform(sequence(1, size(split(host, '\\\\.'))), "
        "i -> array_join(slice(split(host, '\\\\.'), i, "
        "size(split(host, '\\\\.')) - i + 1), '.'))) AS suf",
    )
    bl = spark.createDataFrame([(e,) for e in _BLOCKLIST], "entry STRING")
    hit = (
        s.join(F.broadcast(bl), F.col("suf") == F.col("entry"))
        .groupBy("doc_id").agg(F.min("entry").alias("matched"))
    )
    return d.join(hit, "doc_id", "left").select(
        "doc_id", "host",
        F.when(F.col("matched").isNull(), 0).otherwise(1).cast("long")
            .alias("blocked"),
        "matched",
    )


# --- SemDeDup: cluster-then-prune semantic dedup (q230) -----------------------------


@query(
    "q230_semdedup",
    "WITH " + _KMEANS_CTE + """,
       n2 AS (SELECT vec_id, qv,
                     CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT)
                         AS nn
              FROM v),
       pr AS (SELECT x.vec_id AS a, y.vec_id AS b,
                     CAST(list_sum(list_transform(list_zip(va.qv, vb.qv),
                          s -> s[1]*s[2])) AS BIGINT) AS dot,
                     va.nn AS na, vb.nn AS nb
              FROM a2 x JOIN a2 y
                ON x.cell = y.cell AND x.vec_id < y.vec_id
              JOIN n2 va ON va.vec_id = x.vec_id
              JOIN n2 vb ON vb.vec_id = y.vec_id),
       dropped AS (SELECT DISTINCT b FROM pr
                   WHERE dot > 0 AND 9 * dot * dot >= na * nb)
       SELECT a.vec_id, a.cell,
              CAST(CASE WHEN d.b IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep
       FROM a2 a LEFT JOIN dropped d ON a.vec_id = d.b""",
)
def q230(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) — the
    cluster-then-prune semantic dedup a 10^12-doc embedding corpus
    actually runs: k-means the embeddings (the q127 trained IVF
    quantizer, integer-exact Lloyd), then WITHIN each cluster drop
    every vector whose cosine to a lower-id cluster-mate is ≥ 1/3.
    The cosine test is exact integer cross-multiplication on the
    quantized vectors (dot > 0 ∧ 9·dot² ≥ |a|²·|b|² ⟺ cos ≥ 1/3) —
    no sqrt, no float.  Pairwise work is CLUSTER-bounded (the whole
    point of SemDeDup): cells shard across executors and the
    per-cell candidate set is |cell|², never n²."""
    from gdal_spark.operators.similarity import ivf_kmeans

    emb = _t(spark, sf_dir, "embeddings")
    assigned, _ = ivf_kmeans(emb)
    qv = emb.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*1000 "
            "+ 0.5) AS BIGINT))"
        ).alias("qv"),
    ).withColumn(
        "nn",
        F.expr("aggregate(transform(qv, x -> x*x), CAST(0 AS BIGINT), "
               "(acc, x) -> acc + x)"),
    )
    a = assigned.select(F.col("vec_id").alias("a"), F.col("cell"))
    b = assigned.select(F.col("vec_id").alias("b"), F.col("cell"))
    pairs = (
        a.join(b, "cell").filter(F.col("a") < F.col("b"))
        .join(qv.select(F.col("vec_id").alias("a"),
                        F.col("qv").alias("qa"), F.col("nn").alias("na")),
              "a")
        .join(qv.select(F.col("vec_id").alias("b"),
                        F.col("qv").alias("qb"), F.col("nn").alias("nb")),
              "b")
    )
    dot = F.expr(
        "aggregate(zip_with(qa, qb, (x, y) -> x*y), CAST(0 AS BIGINT), "
        "(acc, x) -> acc + x)"
    )
    dropped = (
        pairs.withColumn("dot", dot)
        .filter((F.col("dot") > 0)
                & (9 * F.col("dot") * F.col("dot")
                   >= F.col("na") * F.col("nb")))
        .select("b").distinct()
    )
    return (
        assigned.select("vec_id", "cell")
        .join(dropped, assigned["vec_id"] == dropped["b"], "left")
        .select(
            "vec_id", "cell",
            F.when(F.col("b").isNull(), 1).otherwise(0).cast("long")
                .alias("keep"),
        )
    )


# --- BPE merge training (q231) ------------------------------------------------------

from gdal_spark.operators.bpe import train_bpe_df  # noqa: E402

_BPE_ROUNDS = 6


def _bpe_oracle_sql(k: int, final_select: str | None = None) -> str:
    fold = (
        "list_reduce(list_prepend(' ', string_split(trim(syms), ' ')), "
        "(acc, x) -> CASE WHEN ends_with(acc, ' ' || lft || ' ') "
        "AND x = rgt "
        "THEN substr(acc, 1, length(acc) - length(lft) - 1) "
        "|| lft || rgt || ' ' "
        "ELSE acc || x || ' ' END)"
    )
    ctes = ["""w0 AS (
      SELECT word, count(*) AS cnt,
             ' ' || array_to_string(
                 [substr(word, i, 1) for i in range(1, length(word)+1)],
                 ' ') || ' ' AS syms
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      WHERE word <> '' GROUP BY word)"""]
    for r in range(1, k + 1):
        ctes.append(f"""pc{r} AS (
      SELECT string_split(pair, chr(9))[1] AS lft,
             string_split(pair, chr(9))[2] AS rgt,
             sum(cnt) AS pcnt
      FROM (SELECT cnt,
                   unnest([sl[i] || chr(9) || sl[i+1]
                           for i in range(1, len(sl))]) AS pair
            FROM (SELECT cnt, string_split(trim(syms), ' ') AS sl
                  FROM w{r-1}))
      GROUP BY 1, 2)""")
        ctes.append(f"""b{r} AS (
      SELECT lft, rgt, pcnt FROM pc{r}
      ORDER BY pcnt DESC, lft, rgt LIMIT 1)""")
        ctes.append(f"""w{r} AS (
      SELECT word, cnt, {fold} AS syms FROM w{r-1}, b{r})""")
    if final_select is None:
        final_select = " UNION ALL ".join(
            f"SELECT CAST({r} AS BIGINT) AS rnk, lft, rgt, "
            f"CAST(pcnt AS BIGINT) AS pcnt FROM b{r}"
            for r in range(1, k + 1)
        )
    return "WITH " + ", ".join(ctes) + " " + final_select


@query("q231_bpe_train", _bpe_oracle_sql(_BPE_ROUNDS))
def q231(spark, sf_dir):
    """REAL BPE merge training (Sennrich et al. 2016,
    arXiv:1508.07909 — the learn-the-merges loop, complementing q48's
    apply-known-rules tokenizer): 6 rounds of count-weighted pair
    statistics over the word VOCABULARY (the classic trick — the
    working set is distinct words, not the corpus), best pair = max
    count with lexicographic ties, merge applied as a left fold that
    reproduces leftmost-greedy non-overlapping semantics exactly
    ([a,a,a,a,a] + (a,a) → [aa,aa,a]).  Per round: one explode +
    one pair-vocabulary-bounded groupBy + a 1-row map-side-combinable
    struct-argmax + one JVM fold projection; the driver holds only
    the 6 learned merges."""
    return train_bpe_df(_t(spark, sf_dir, "documents"), _BPE_ROUNDS)


# --- Gopher quality rules (q232) ----------------------------------------------------

_GOPHER_BODY_SQL = """
    CASE WHEN doc_id % 5 = 0 THEN '- ' ELSE '' END || text ||
    CASE WHEN doc_id % 7 = 0 THEN ' ...' ELSE '' END ||
    CASE WHEN doc_id % 11 = 0 THEN ' ####' ELSE '' END
"""


@query(
    "q232_gopher_rules",
    f"""WITH d AS (SELECT doc_id, {_GOPHER_BODY_SQL} AS body FROM documents),
       t AS (SELECT doc_id, body,
                    [w for w in string_split(body, ' ') if w <> ''] AS toks
             FROM d),
       m AS (SELECT doc_id,
                    len(toks) AS n_words,
                    list_sum([length(w) for w in toks]) AS n_chars,
                    len([w for w in toks
                         if w = '####' OR w = '...']) AS n_sym,
                    CASE WHEN starts_with(body, '- ') THEN 1 ELSE 0 END
                        AS bullet,
                    CASE WHEN ends_with(body, '...') OR
                              ends_with(body, '####') THEN 1 ELSE 0 END
                        AS ell,
                    len(list_distinct([w for w in toks
                        if w IN ('the', 'a', 'of', 'and', 'to', 'in')]))
                        AS n_stop
             FROM t)
       SELECT doc_id,
              CAST(CASE WHEN n_words >= 50 AND n_words <= 100000
                   THEN 1 ELSE 0 END AS BIGINT) AS ok_words,
              CAST(CASE WHEN 3 * n_words <= n_chars
                         AND n_chars <= 10 * n_words
                   THEN 1 ELSE 0 END AS BIGINT) AS ok_meanlen,
              CAST(CASE WHEN 10 * n_sym <= n_words THEN 1 ELSE 0 END
                   AS BIGINT) AS ok_sym,
              CAST(1 - bullet AS BIGINT) AS ok_bullet,
              CAST(1 - ell AS BIGINT) AS ok_ellipsis,
              CAST(CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS BIGINT)
                  AS ok_stop,
              CAST(CASE WHEN n_words >= 50 AND n_words <= 100000
                         AND 3 * n_words <= n_chars
                         AND n_chars <= 10 * n_words
                         AND 10 * n_sym <= n_words
                         AND bullet = 0 AND ell = 0 AND n_stop >= 2
                   THEN 1 ELSE 0 END AS BIGINT) AS keep
       FROM m""",
)
def q232(spark, sf_dir):
    """Gopher quality rules (Rae et al. 2021, arXiv:2112.11446 §A1.1 —
    the rule set FineWeb/Dolma/RefinedWeb re-implement): word-count
    window [50, 100k], mean word length in [3, 10] (exact integer
    cross-multiplication, no division), symbol-to-word ratio ≤ 0.1,
    bullet/ellipsis line rules, ≥ 2 distinct stopwords.  The body
    derives from the documents table with deterministic bullet/
    ellipsis/symbol injections so every rule fires on a known doc
    subset.  Pure JVM Column plan, one projection — no shuffle, no
    Python at 10^12 docs."""
    d = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"{_GOPHER_BODY_SQL} AS body"
    )
    t = d.selectExpr(
        "doc_id", "body",
        "filter(split(body, ' '), w -> w != '') AS toks",
    )
    m = t.selectExpr(
        "doc_id",
        "size(toks) AS n_words",
        "aggregate(transform(toks, w -> length(w)), 0, (a, x) -> a + x)"
        " AS n_chars",
        "size(filter(toks, w -> w = '####' OR w = '...')) AS n_sym",
        "CASE WHEN body LIKE '- %' THEN 1 ELSE 0 END AS bullet",
        "CASE WHEN body LIKE '%...' OR body LIKE '%####' THEN 1 ELSE 0 END"
        " AS ell",
        "size(array_distinct(filter(toks, w -> w IN "
        "('the', 'a', 'of', 'and', 'to', 'in')))) AS n_stop",
    )
    ok_words = (F.col("n_words") >= 50) & (F.col("n_words") <= 100000)
    ok_meanlen = (3 * F.col("n_words") <= F.col("n_chars")) & (
        F.col("n_chars") <= 10 * F.col("n_words")
    )
    ok_sym = 10 * F.col("n_sym") <= F.col("n_words")
    ok_stop = F.col("n_stop") >= 2
    keep = (
        ok_words & ok_meanlen & ok_sym
        & (F.col("bullet") == 0) & (F.col("ell") == 0) & ok_stop
    )
    asb = lambda c: F.when(c, 1).otherwise(0).cast("long")  # noqa: E731
    return m.select(
        "doc_id",
        asb(ok_words).alias("ok_words"),
        asb(ok_meanlen).alias("ok_meanlen"),
        asb(ok_sym).alias("ok_sym"),
        (1 - F.col("bullet")).cast("long").alias("ok_bullet"),
        (1 - F.col("ell")).cast("long").alias("ok_ellipsis"),
        asb(ok_stop).alias("ok_stop"),
        asb(keep).alias("keep"),
    )


# --- BPE tokenizer apply (q233) -----------------------------------------------------


@query(
    "q233_bpe_apply",
    _bpe_oracle_sql(
        _BPE_ROUNDS,
        f"SELECT word, CAST(cnt AS BIGINT) AS cnt, syms FROM w{_BPE_ROUNDS}",
    ),
)
def q233(spark, sf_dir):
    """Tokenizer APPLY for the learned BPE merges: after the q231
    training rounds, every vocabulary word's final segmentation (the
    space-sentineled symbol string) plus its corpus count — i.e. the
    actual subword tokenization a trained tokenizer would emit.  The
    apply side is the same vocabulary-bounded fold chain; re-tokenizing
    10^12 documents is then a broadcast word→syms map join."""
    from gdal_spark.operators.bpe import train_bpe_state, word_vocab

    v = word_vocab(_t(spark, sf_dir, "documents"))
    merges, w = train_bpe_state(v, _BPE_ROUNDS)
    out = w.select("word", F.col("cnt").cast("long").alias("cnt"), "syms")
    res = out.localCheckpoint(eager=True)
    w.unpersist()
    return res


# --- coverage simplification, gdal vector simplify-coverage (q234) ------------------

_SCOV_X = ("(chain_id % 4) * 10 + CASE WHEN i = 0 OR i = 8 THEN 0 "
           "ELSE ((chain_id*7 + i*3) % 5) - 2 END")
_SCOV_Y = "(chain_id // 4) * 8 + i"


@query(
    "q234_simplify_coverage",
    f"""WITH RECURSIVE
       v AS (SELECT c.range AS chain_id, i.range AS i,
                    {_SCOV_X.replace('chain_id', 'c.range').replace('i', 'i.range').replace('c.range % 4', 'c.range % 4')} AS x,
                    (c.range // 4) * 8 + i.range AS y
             FROM range(12) c, range(9) i),
       dp(chain_id, lo, hi) AS (
         SELECT chain_id, 0, 8 FROM (SELECT DISTINCT chain_id FROM v)
         UNION ALL
         SELECT d.chain_id,
                CASE WHEN s.side = 0 THEN d.lo ELSE j.i END,
                CASE WHEN s.side = 0 THEN j.i ELSE d.hi END
         FROM dp d
         JOIN v a ON a.chain_id = d.chain_id AND a.i = d.lo
         JOIN v b ON b.chain_id = d.chain_id AND b.i = d.hi
         JOIN v j ON j.chain_id = d.chain_id AND j.i > d.lo AND j.i < d.hi
         CROSS JOIN (VALUES (0), (1)) s(side)
         WHERE ((b.x - a.x)*(j.y - a.y) - (b.y - a.y)*(j.x - a.x))
               * ((b.x - a.x)*(j.y - a.y) - (b.y - a.y)*(j.x - a.x))
               > ((b.x - a.x)*(b.x - a.x) + (b.y - a.y)*(b.y - a.y))
           AND NOT EXISTS (
             SELECT 1 FROM v j2
             WHERE j2.chain_id = d.chain_id AND j2.i > d.lo AND j2.i < d.hi
               AND (((b.x - a.x)*(j2.y - a.y) - (b.y - a.y)*(j2.x - a.x))
                    * ((b.x - a.x)*(j2.y - a.y) - (b.y - a.y)*(j2.x - a.x))
                    > ((b.x - a.x)*(j.y - a.y) - (b.y - a.y)*(j.x - a.x))
                      * ((b.x - a.x)*(j.y - a.y) - (b.y - a.y)*(j.x - a.x))
                 OR (((b.x - a.x)*(j2.y - a.y) - (b.y - a.y)*(j2.x - a.x))
                     * ((b.x - a.x)*(j2.y - a.y) - (b.y - a.y)*(j2.x - a.x))
                     = ((b.x - a.x)*(j.y - a.y) - (b.y - a.y)*(j.x - a.x))
                       * ((b.x - a.x)*(j.y - a.y) - (b.y - a.y)*(j.x - a.x))
                     AND j2.i < j.i)))),
       kept AS (SELECT chain_id, i FROM
                  (SELECT chain_id, lo AS i FROM dp
                   UNION ALL SELECT chain_id, hi FROM dp)
                GROUP BY chain_id, i),
       kv AS (SELECT k.chain_id, k.i, v.x, v.y,
                     row_number() OVER (PARTITION BY k.chain_id
                                        ORDER BY k.i) AS rn
              FROM kept k JOIN v ON v.chain_id = k.chain_id AND v.i = k.i)
       SELECT chain_id,
              CAST(count(*) AS BIGINT) AS n_kept,
              CAST(sum(rn * x) AS BIGINT) AS cs_x,
              CAST(sum(rn * y) AS BIGINT) AS cs_y
       FROM kv GROUP BY chain_id""",
)
def q234(spark, sf_dir):
    """``gdal vector simplify-coverage``
    (apps/gdalalg_vector_simplify_coverage.cpp → GEOS
    CoverageSimplifier): the polygonal coverage decomposes into shared
    boundary CHAINS between nodes; each chain is Douglas–Peucker
    simplified ONCE with endpoints pinned, so the two polygons on
    either side stay edge-matched and the simplified coverage has no
    gaps/overlaps BY CONSTRUCTION.  The DP core is exact integer
    arithmetic (cross² > tol²·len², ties to lowest index —
    operators/coverage.dp_keep_exact); the oracle replays it as a
    recursive CTE whose kept set is exactly the interval endpoints the
    recursion creates.  Chains shard by id — embarrassingly parallel;
    at 100 TB chain extraction is the q225 edge-multiset groupBy."""
    c = (
        spark.range(12).select(F.col("id").alias("chain_id"))
        .crossJoin(spark.range(9).select(F.col("id").alias("i")))
    )
    chains = c.selectExpr(
        "chain_id", "i",
        f"{_SCOV_X} AS x",
        f"{_SCOV_Y.replace('//', 'div')} AS y",
    )
    from gdal_spark.operators.coverage import simplify_chains

    kept = simplify_chains(chains, tol2=1)
    w = Window.partitionBy("chain_id").orderBy("i")
    kv = kept.withColumn("rn", F.row_number().over(w))
    return kv.groupBy("chain_id").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.sum(F.col("rn") * F.col("x")).cast("long").alias("cs_x"),
        F.sum(F.col("rn") * F.col("y")).cast("long").alias("cs_y"),
    )


# --- streaming robots gate (q235) ---------------------------------------------------


def _robots_stream_oracle_sql() -> str:
    vals = ", ".join(f"({r}, '{p}', {a})" for r, p, a in _ROBOTS_RULES)
    return f"""WITH d AS (SELECT doc_id, doc_id % 40 AS host_id,
                      {_ROBOTS_PATH_SQL} AS path,
                      1767225600 + (doc_id % 10) * 1800 AS ts
               FROM documents),
       rules(ruleset, prefix, allow) AS (VALUES {vals}),
       m AS (SELECT d.doc_id, d.host_id, d.ts,
                    max(length(r.prefix) * 2 + r.allow) AS code
             FROM d LEFT JOIN rules r
               ON d.host_id % 4 = r.ruleset
              AND starts_with(d.path, r.prefix)
             GROUP BY d.doc_id, d.host_id, d.ts)
       SELECT CAST((ts // 3600) * 3600 AS BIGINT) AS win_start,
              CAST(host_id AS BIGINT) AS host_id,
              CAST(COALESCE(code, 1) % 2 AS BIGINT) AS allowed,
              CAST(count(*) AS BIGINT) AS n
       FROM m GROUP BY 1, 2, 3"""


@query("q235_stream_robots_gate", _robots_stream_oracle_sql())
def q235(spark, sf_dir):
    """STREAMING robots gate (the incremental form of q228): fetch
    events land as a file stream; the RFC 9309 longest-match decision
    runs STATELESSLY per event — the static rules side pre-aggregates
    to one ARRAY row per ruleset, so the stream-static broadcast join
    adds no state and the per-event argmax is a row-local array fold;
    the query's single stateful operator is the watermarked
    (hour, host, allowed) count.  Drained totals equal the batch
    replay exactly."""
    from gdal_spark.streaming.windowed import stream_robots_gate

    d = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", "doc_id % 40 AS host_id",
        f"{_ROBOTS_PATH_SQL} AS path",
        "1767225600 + (doc_id % 10) * 1800 AS ts",
    ).select("host_id", "path", "ts")
    rules = spark.createDataFrame(
        _ROBOTS_RULES, "ruleset INT, prefix STRING, allow INT"
    ).groupBy("ruleset").agg(
        F.collect_list(F.struct("prefix", "allow")).alias("rules")
    )
    return stream_robots_gate(spark, d, rules)


# --- distributed suffix array + LCP + exact-substring dedup (q236-q238) -------------
#
# Lee et al. 2022 (arXiv:2107.06499) ExactSubstr over a concatenated
# corpus.  The corpus derives from doc_id < 8 with a deterministic
# boilerplate injection on doc_id % 3 == 0 so duplicate spans >= 25
# chars exist at every SF (max fixture LCP ~58; CAP 96 clears it,
# pinned by tests/test_suffix.py).

_SA_BODY_SQL = (
    "text || CASE WHEN doc_id % 3 = 0 THEN"
    " ' the quick brown fox jumps over the lazy dog' ELSE '' END"
)
_SA_CAP = 96
_SA_MINLEN = 25

_SA_CORPUS_CTE = f"""d AS (SELECT doc_id, {_SA_BODY_SQL} AS body
                FROM documents WHERE doc_id < 8),
       c AS (SELECT string_agg(body || '|', '' ORDER BY doc_id) AS corpus,
                    CASE WHEN length(string_agg(body || '|', ''
                                   ORDER BY doc_id)) > 8000
                         THEN error('q236 fixture outgrew range bound')
                         ELSE length(string_agg(body || '|', ''
                                     ORDER BY doc_id)) END AS n
             FROM d),
       p AS (SELECT i AS pos FROM range(1, 8001) t(i), c
             WHERE i <= c.n),
       sa AS (SELECT pos, rank() OVER
                  (ORDER BY substr((SELECT corpus FROM c), pos)) AS rnk
              FROM p)"""


def _sa_fixture(spark, sf_dir):
    docs = (
        _t(spark, sf_dir, "documents")
        .filter("doc_id < 8")
        .selectExpr("doc_id", f"{_SA_BODY_SQL} AS body")
    )
    from gdal_spark.operators.suffix import corpus_chars

    chars, offsets = corpus_chars(docs)
    # bounded fixture: 32 near-empty tasks/round is pure scheduler
    # overhead (CLAUDE.md round-2 invariant) — coalesce first
    chars = chars.coalesce(4).localCheckpoint(eager=True)
    n = chars.count()
    return chars, offsets, n


@query(
    "q236_suffix_array",
    f"WITH {_SA_CORPUS_CTE} SELECT pos, CAST(rnk AS BIGINT) AS rnk FROM sa",
)
def q236(spark, sf_dir):
    """Distributed suffix array by prefix doubling (Manber-Myers) —
    the construction ExactSubstr dedup (Lee et al. 2022) needs over a
    10^12-doc concatenated corpus.  Each round: shift-join the rank
    table by the gap, dense-rank the (rank, rank+gap) key pairs via
    range-partition + in-partition row_number + broadcast cumulative
    partition counts (the DataFrame zipWithIndex — no single-partition
    window anywhere), early-exit when ranks are dense.  Every round is
    one TeraSort-shaped shuffle; rounds ~ log2(max duplicate length),
    not log2(n).  Oracle sorts the suffixes directly."""
    from gdal_spark.operators.suffix import suffix_array

    chars, _, n = _sa_fixture(spark, sf_dir)
    return suffix_array(chars, n).select(
        F.col("pos").cast("long").alias("pos"),
        F.col("rnk").cast("long").alias("rnk"),
    )


@query(
    "q237_lcp_array",
    f"""WITH {_SA_CORPUS_CTE},
       pr AS (SELECT rnk, lag(pos) OVER (ORDER BY rnk) AS pa, pos AS pb
              FROM sa),
       x AS (SELECT pr.rnk, pr.pa, pr.pb,
                    coalesce(list_min(
                        [k for k in range(0, {_SA_CAP})
                         if pr.pa + k > c.n OR pr.pb + k > c.n
                            OR substr(c.corpus, CAST(pr.pa + k AS BIGINT), 1)
                               <> substr(c.corpus, CAST(pr.pb + k AS BIGINT),
                                         1)]), {_SA_CAP}) AS lcp
             FROM pr, c WHERE pr.pa IS NOT NULL)
       SELECT CAST(rnk AS BIGINT) AS rnk, CAST(pa AS BIGINT) AS pa,
              CAST(pb AS BIGINT) AS pb, CAST(lcp AS BIGINT) AS lcp
       FROM x""",
)
def q237(spark, sf_dir):
    """LCP array between rank-adjacent suffixes, fully relational: the
    rank-(r-1)/rank-r pair table explodes k in [0, CAP) and equi-joins
    the (pos, ch) corpus table twice; lcp = first mismatching k (or
    CAP saturation — CAP is pinned above the fixture max by
    tests/test_suffix.py).  No suffix string ever materializes; work
    is pairs x CAP rows through hash joins on position."""
    from gdal_spark.operators.suffix import lcp_array, suffix_array

    chars, _, n = _sa_fixture(spark, sf_dir)
    sa = suffix_array(chars, n)
    return lcp_array(sa, chars, _SA_CAP).select(
        F.col("rnk").cast("long").alias("rnk"),
        F.col("pa").cast("long").alias("pa"),
        F.col("pb").cast("long").alias("pb"),
        F.col("lcp").cast("long").alias("lcp"),
    )


@query(
    "q238_exact_substr_dedup",
    f"""WITH {_SA_CORPUS_CTE},
       offs AS (SELECT doc_id, length(body) AS len,
                       coalesce(sum(length(body) + 1) OVER
                           (ORDER BY doc_id ROWS BETWEEN UNBOUNDED
                            PRECEDING AND 1 PRECEDING), 0) AS off
                FROM d),
       pr AS (SELECT rnk, lag(pos) OVER (ORDER BY rnk) AS pa, pos AS pb
              FROM sa),
       x AS (SELECT pr.pa, pr.pb,
                    coalesce(list_min(
                        [k for k in range(0, {_SA_CAP})
                         if pr.pa + k > c.n OR pr.pb + k > c.n
                            OR substr(c.corpus, CAST(pr.pa + k AS BIGINT), 1)
                               <> substr(c.corpus, CAST(pr.pb + k AS BIGINT),
                                         1)]), {_SA_CAP}) AS lcp
             FROM pr, c WHERE pr.pa IS NOT NULL),
       sp AS (SELECT pa AS s, pa + lcp AS e FROM x WHERE lcp >= {_SA_MINLEN}
              UNION ALL
              SELECT pb AS s, pb + lcp AS e FROM x WHERE lcp >= {_SA_MINLEN}),
       cl AS (SELECT o.doc_id,
                     greatest(s.s, o.off + 1) AS cs,
                     least(s.e, o.off + o.len + 1) AS ce
              FROM sp s JOIN offs o
                ON s.s <= o.off + o.len AND s.e > o.off + 1),
       cov AS (SELECT doc_id,
                      greatest(0, ce - greatest(cs,
                          coalesce(max(ce) OVER (PARTITION BY doc_id
                              ORDER BY cs, ce ROWS BETWEEN UNBOUNDED
                              PRECEDING AND 1 PRECEDING), 0))) AS covered
               FROM cl),
       agg AS (SELECT doc_id, sum(covered) AS dup_chars FROM cov
               GROUP BY doc_id)
       SELECT o.doc_id, CAST(coalesce(a.dup_chars, 0) AS BIGINT)
                  AS dup_chars,
              CAST(o.len AS BIGINT) AS total_chars
       FROM offs o LEFT JOIN agg a ON o.doc_id = a.doc_id""",
)
def q238(spark, sf_dir):
    """ExactSubstr duplicate-byte accounting (Lee et al. 2022 §4.1):
    every rank-adjacent suffix pair with lcp >= 25 certifies both
    spans duplicated; spans clip to document bodies (separators never
    count) and union per doc by the sorted-interval sweep (running
    max of prior ends — the interval-union total is tie-order
    independent).  Emits per-doc (dup_chars, total_chars) — the exact
    numbers the Lee et al. dedup pass would cut.  The boilerplate
    injection on doc_id % 3 == 0 is what the accounting must find."""
    from gdal_spark.operators.suffix import (
        dup_span_accounting,
        lcp_array,
        suffix_array,
    )

    chars, offsets, n = _sa_fixture(spark, sf_dir)
    sa = suffix_array(chars, n)
    lcp = lcp_array(sa, chars, _SA_CAP)
    return dup_span_accounting(lcp, offsets, _SA_MINLEN)


# --- Gopher repetition rules: duplicate lines / paragraphs (q239) --------------------
#
# Rae et al. 2021 §A1.1 repetition signals (the half q232 does not
# cover).  Spec pinned here: a line/paragraph is DUPLICATED iff its
# exact text occurs more than once within the document; the fraction
# counts every member of a duplicated group; char fractions weight by
# the line/para length.  Lines are 5-word chunks of the token stream
# (deterministic, both engines build the identical list); paragraphs
# are consecutive line pairs.  Deterministic injections: doc_id%4==0
# appends a copy of line 1, doc_id%6==0 appends a copy of paragraph 1.
# Gopher thresholds: dup_line_frac<=0.30, dup_para_frac<=0.30,
# dup_line_char_frac<=0.20, dup_para_char_frac<=0.20 — all checked by
# integer cross-multiplication, no division anywhere.


@query(
    "q239_gopher_dup_lines",
    """WITH t AS (SELECT doc_id,
                [w for w in string_split(text, ' ') if w <> ''] AS toks
             FROM documents),
       b AS (SELECT doc_id,
                CASE WHEN len(toks) > 2000
                     THEN error('q239 fixture outgrew range bound')
                     ELSE 1 END AS ok,
                [array_to_string(toks[i*5+1:i*5+5], ' ')
                 for i in range(0, 400) if i*5 < len(toks)] AS lines0
             FROM t),
       lp AS (SELECT doc_id,
                 CASE WHEN doc_id % 4 = 0
                      THEN list_append(lines0, lines0[1])
                      ELSE lines0 END AS lines,
                 CASE WHEN doc_id % 6 = 0
                      THEN list_append(p0, p0[1]) ELSE p0 END AS paras
              FROM (SELECT doc_id, lines0,
                       [array_to_string(lines0[2*j+1:2*j+2], chr(10))
                        for j in range(0, 200) if 2*j < len(lines0)] AS p0
                    FROM b)),
       le AS (SELECT doc_id, unnest(lines) AS item FROM lp),
       lg AS (SELECT doc_id, item, count(*) AS cnt FROM le GROUP BY 1, 2),
       lm AS (SELECT doc_id, sum(cnt) AS n_lines,
                     sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup_lines,
                     sum(cnt * length(item)) AS line_chars,
                     sum(CASE WHEN cnt > 1 THEN cnt * length(item)
                         ELSE 0 END) AS dup_line_chars
              FROM lg GROUP BY 1),
       pe AS (SELECT doc_id, unnest(paras) AS item FROM lp),
       pg AS (SELECT doc_id, item, count(*) AS cnt FROM pe GROUP BY 1, 2),
       pm AS (SELECT doc_id, sum(cnt) AS n_paras,
                     sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup_paras,
                     sum(cnt * length(item)) AS para_chars,
                     sum(CASE WHEN cnt > 1 THEN cnt * length(item)
                         ELSE 0 END) AS dup_para_chars
              FROM pg GROUP BY 1)
       SELECT l.doc_id,
              CAST(l.n_lines AS BIGINT) AS n_lines,
              CAST(l.dup_lines AS BIGINT) AS dup_lines,
              CAST(l.dup_line_chars AS BIGINT) AS dup_line_chars,
              CAST(p.n_paras AS BIGINT) AS n_paras,
              CAST(p.dup_paras AS BIGINT) AS dup_paras,
              CAST(p.dup_para_chars AS BIGINT) AS dup_para_chars,
              CAST(CASE WHEN 10 * l.dup_lines <= 3 * l.n_lines
                   THEN 1 ELSE 0 END AS BIGINT) AS ok_dup_line,
              CAST(CASE WHEN 5 * l.dup_line_chars <= l.line_chars
                   THEN 1 ELSE 0 END AS BIGINT) AS ok_dup_line_char,
              CAST(CASE WHEN 10 * p.dup_paras <= 3 * p.n_paras
                   THEN 1 ELSE 0 END AS BIGINT) AS ok_dup_para,
              CAST(CASE WHEN 5 * p.dup_para_chars <= p.para_chars
                   THEN 1 ELSE 0 END AS BIGINT) AS ok_dup_para_char,
              CAST(CASE WHEN 10 * l.dup_lines <= 3 * l.n_lines
                         AND 5 * l.dup_line_chars <= l.line_chars
                         AND 10 * p.dup_paras <= 3 * p.n_paras
                         AND 5 * p.dup_para_chars <= p.para_chars
                   THEN 1 ELSE 0 END AS BIGINT) AS keep
       FROM lm l JOIN pm p ON l.doc_id = p.doc_id""",
)
def q239(spark, sf_dir):
    """Gopher repetition rules, line/paragraph half (Rae et al. 2021
    arXiv:2112.11446 §A1.1): duplicate-line fraction <= 0.30,
    duplicate-paragraph fraction <= 0.30, duplicate-line-CHAR fraction
    <= 0.20, duplicate-paragraph-CHAR fraction <= 0.20 — every
    threshold an exact integer cross-multiplication.  Lines are
    deterministic 5-word chunks, paragraphs line pairs; injections on
    doc_id%4 / doc_id%6 append an exact copy of line 1 / paragraph 1
    so each rule fires on a known subset.  The plan is two explode +
    groupBy passes over (doc, item) — shuffles on the line/para
    vocabulary, never doc x doc; at 10^12 docs the group key space is
    corpus-sized but each group is tiny (the exact shape Spark's
    hash aggregation partial-combines)."""
    t = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", "filter(split(text, ' '), w -> w != '') AS toks"
    )
    b = t.selectExpr(
        "doc_id",
        "transform(sequence(0, int((size(toks) - 1) / 5)), "
        "i -> array_join(slice(toks, i*5+1, 5), ' ')) AS lines0",
    )
    lp = b.selectExpr(
        "doc_id",
        "CASE WHEN doc_id % 4 = 0 THEN concat(lines0, "
        "array(element_at(lines0, 1))) ELSE lines0 END AS lines",
        "transform(sequence(0, int((size(lines0) - 1) / 2)), "
        "j -> array_join(slice(lines0, 2*j+1, 2), '\\n')) AS p0",
    ).selectExpr(
        "doc_id", "lines",
        "CASE WHEN doc_id % 6 = 0 THEN concat(p0, "
        "array(element_at(p0, 1))) ELSE p0 END AS paras",
    )

    def _stats(col, pfx):
        e = lp.select("doc_id", F.explode(col).alias("item"))
        g = e.groupBy("doc_id", "item").agg(F.count("*").alias("cnt"))
        dup = F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)
        dupc = F.when(F.col("cnt") > 1,
                      F.col("cnt") * F.length("item")).otherwise(0)
        return g.groupBy("doc_id").agg(
            F.sum("cnt").alias(f"n_{pfx}"),
            F.sum(dup).alias(f"dup_{pfx}"),
            F.sum(F.col("cnt") * F.length("item")).alias(f"{pfx}_chars"),
            F.sum(dupc).alias(f"dup_{pfx}_chars"),
        )

    lm = _stats("lines", "lines")
    pm = _stats("paras", "paras")
    m = lm.join(pm, "doc_id")
    ok_l = 10 * F.col("dup_lines") <= 3 * F.col("n_lines")
    ok_lc = 5 * F.col("dup_lines_chars") <= F.col("lines_chars")
    ok_p = 10 * F.col("dup_paras") <= 3 * F.col("n_paras")
    ok_pc = 5 * F.col("dup_paras_chars") <= F.col("paras_chars")
    asb = lambda c: F.when(c, 1).otherwise(0).cast("long")  # noqa: E731
    return m.select(
        "doc_id",
        F.col("n_lines").cast("long").alias("n_lines"),
        F.col("dup_lines").cast("long").alias("dup_lines"),
        F.col("dup_lines_chars").cast("long").alias("dup_line_chars"),
        F.col("n_paras").cast("long").alias("n_paras"),
        F.col("dup_paras").cast("long").alias("dup_paras"),
        F.col("dup_paras_chars").cast("long").alias("dup_para_chars"),
        asb(ok_l).alias("ok_dup_line"),
        asb(ok_lc).alias("ok_dup_line_char"),
        asb(ok_p).alias("ok_dup_para"),
        asb(ok_pc).alias("ok_dup_para_char"),
        asb(ok_l & ok_lc & ok_p & ok_pc).alias("keep"),
    )


# --- Gopher repetition rules: top / duplicated n-gram char fractions (q240) ---------

_NGRAM_BODY_SQL = (
    "text || CASE WHEN doc_id % 5 = 0 THEN repeat("
    "' call now and subscribe to our newsletter today', 2) ELSE '' END"
)


@query(
    "q240_gopher_ngram_rep",
    f"""WITH d AS (SELECT doc_id, {_NGRAM_BODY_SQL} AS body FROM documents),
       t AS (SELECT doc_id,
                [w for w in string_split(body, ' ') if w <> ''] AS toks
             FROM d),
       base AS (SELECT doc_id, toks,
                   length(array_to_string(toks, ' ')) AS den,
                   CASE WHEN len(toks) > 128
                        THEN error('q240 fixture outgrew range bound')
                        ELSE 1 END AS ok
                FROM t),
       nn AS (SELECT unnest([2, 3, 4, 5, 6, 7, 8, 9, 10]) AS n),
       ps AS (SELECT doc_id, n, toks,
                 unnest([p for p in range(1, 130)
                         if p + n - 1 <= len(toks)]) AS p
              FROM base, nn),
       psg AS (SELECT doc_id, n, p,
                  array_to_string(toks[p:p+n-1], ' ') AS gram
               FROM ps),
       cg AS (SELECT doc_id, n, gram, count(*) AS cnt
              FROM psg GROUP BY 1, 2, 3),
       mt AS (SELECT doc_id, n, max(cnt) AS mc FROM cg
              WHERE n <= 4 GROUP BY 1, 2),
       tg AS (SELECT c.doc_id, c.n, m.mc, max(c.gram) AS tgram
              FROM cg c JOIN mt m
                ON c.doc_id = m.doc_id AND c.n = m.n AND c.cnt = m.mc
              GROUP BY 1, 2, 3),
       tnum AS (SELECT doc_id, n, mc * length(tgram) AS num FROM tg),
       dupg AS (SELECT doc_id, n, gram FROM cg WHERE n >= 5 AND cnt > 1),
       covp AS (SELECT g.doc_id, g.n, g.p,
                   unnest([kk for kk in range(0, 10) if kk < g.n]) AS k
                FROM psg g JOIN dupg u
                  USING (doc_id, n, gram)),
       cov AS (SELECT DISTINCT doc_id, n, p + k AS pos FROM covp),
       tkl AS (SELECT doc_id,
                  unnest([q for q in range(1, 130)
                          if q <= len(toks)]) AS pos,
                  toks
               FROM base),
       tk2 AS (SELECT doc_id, pos, length(toks[pos]) AS wl FROM tkl),
       covc AS (SELECT c.doc_id, c.n, sum(t2.wl) AS num
                FROM cov c JOIN tk2 t2 USING (doc_id, pos)
                GROUP BY 1, 2),
       tp AS (SELECT doc_id,
                 max(CASE WHEN n = 2 THEN num ELSE 0 END) AS top2_num,
                 max(CASE WHEN n = 3 THEN num ELSE 0 END) AS top3_num,
                 max(CASE WHEN n = 4 THEN num ELSE 0 END) AS top4_num
              FROM tnum GROUP BY 1),
       dp AS (SELECT doc_id,
                 max(CASE WHEN n = 5 THEN num ELSE 0 END) AS dup5_num,
                 max(CASE WHEN n = 6 THEN num ELSE 0 END) AS dup6_num,
                 max(CASE WHEN n = 7 THEN num ELSE 0 END) AS dup7_num,
                 max(CASE WHEN n = 8 THEN num ELSE 0 END) AS dup8_num,
                 max(CASE WHEN n = 9 THEN num ELSE 0 END) AS dup9_num,
                 max(CASE WHEN n = 10 THEN num ELSE 0 END) AS dup10_num
              FROM covc GROUP BY 1),
       fin AS (SELECT b.doc_id, b.den,
                  coalesce(tp.top2_num, 0) AS top2_num,
                  coalesce(tp.top3_num, 0) AS top3_num,
                  coalesce(tp.top4_num, 0) AS top4_num,
                  coalesce(dp.dup5_num, 0) AS dup5_num,
                  coalesce(dp.dup6_num, 0) AS dup6_num,
                  coalesce(dp.dup7_num, 0) AS dup7_num,
                  coalesce(dp.dup8_num, 0) AS dup8_num,
                  coalesce(dp.dup9_num, 0) AS dup9_num,
                  coalesce(dp.dup10_num, 0) AS dup10_num
               FROM base b
               LEFT JOIN tp ON b.doc_id = tp.doc_id
               LEFT JOIN dp ON b.doc_id = dp.doc_id)
       SELECT doc_id, CAST(den AS BIGINT) AS den,
              CAST(top2_num AS BIGINT) AS top2_num,
              CAST(top3_num AS BIGINT) AS top3_num,
              CAST(top4_num AS BIGINT) AS top4_num,
              CAST(dup5_num AS BIGINT) AS dup5_num,
              CAST(dup6_num AS BIGINT) AS dup6_num,
              CAST(dup7_num AS BIGINT) AS dup7_num,
              CAST(dup8_num AS BIGINT) AS dup8_num,
              CAST(dup9_num AS BIGINT) AS dup9_num,
              CAST(dup10_num AS BIGINT) AS dup10_num,
              CAST(CASE WHEN top2_num * 5 <= den THEN 1 ELSE 0 END
                   AS BIGINT) AS ok_top2,
              CAST(CASE WHEN top3_num * 50 <= 9 * den THEN 1 ELSE 0 END
                   AS BIGINT) AS ok_top3,
              CAST(CASE WHEN top4_num * 25 <= 4 * den THEN 1 ELSE 0 END
                   AS BIGINT) AS ok_top4,
              CAST(CASE WHEN dup5_num * 20 <= 3 * den THEN 1 ELSE 0 END
                   AS BIGINT) AS ok_dup5,
              CAST(CASE WHEN dup6_num * 50 <= 7 * den THEN 1 ELSE 0 END
                   AS BIGINT) AS ok_dup6,
              CAST(CASE WHEN dup7_num * 100 <= 13 * den THEN 1 ELSE 0 END
                   AS BIGINT) AS ok_dup7,
              CAST(CASE WHEN dup8_num * 25 <= 3 * den THEN 1 ELSE 0 END
                   AS BIGINT) AS ok_dup8,
              CAST(CASE WHEN dup9_num * 100 <= 11 * den THEN 1 ELSE 0 END
                   AS BIGINT) AS ok_dup9,
              CAST(CASE WHEN dup10_num * 10 <= den THEN 1 ELSE 0 END
                   AS BIGINT) AS ok_dup10,
              CAST(CASE WHEN top2_num * 5 <= den
                         AND top3_num * 50 <= 9 * den
                         AND top4_num * 25 <= 4 * den
                         AND dup5_num * 20 <= 3 * den
                         AND dup6_num * 50 <= 7 * den
                         AND dup7_num * 100 <= 13 * den
                         AND dup8_num * 25 <= 3 * den
                         AND dup9_num * 100 <= 11 * den
                         AND dup10_num * 10 <= den
                   THEN 1 ELSE 0 END AS BIGINT) AS keep
       FROM fin""",
)
def q240(spark, sf_dir):
    """Gopher repetition rules, n-gram half (Rae et al. 2021
    arXiv:2112.11446 §A1.1): for n in {2,3,4} the fraction of chars in
    the MOST FREQUENT n-gram (thresholds 0.20/0.18/0.16); for n in
    {5..10} the fraction of chars covered by DUPLICATED n-grams,
    each covered word counted once (interval union by position
    DISTINCT; thresholds 0.15..0.10).  Spec pins: grams are
    space-joined token windows, char masses are length(gram) for top
    and summed token lengths for coverage, most-frequent ties break
    to the lexicographically largest gram (struct-max — map-side
    combinable, no window over the gram table).  All 9 thresholds are
    exact integer cross-multiplications.  Plan: ONE position-exploded
    gram table for all 9 n values, hash-aggregated on (doc, n, gram)
    — shuffle on the gram vocabulary, linear in corpus size; the
    doc_id%5 injection duplicates an 8-word sentence so n=5..8
    coverage fires on a known subset."""
    d = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"{_NGRAM_BODY_SQL} AS body"
    )
    base = d.selectExpr(
        "doc_id", "filter(split(body, ' '), w -> w != '') AS toks"
    ).selectExpr("doc_id", "toks", "length(array_join(toks, ' ')) AS den")
    ps = base.select(
        "doc_id", "toks",
        F.explode(F.expr("sequence(2, 10)")).alias("n"),
    ).filter(F.expr("size(toks) >= n")).selectExpr(
        "doc_id", "toks", "n",
        "explode(sequence(1, size(toks) - n + 1)) AS p",
    )
    psg = ps.selectExpr(
        "doc_id", "n", "p", "array_join(slice(toks, p, n), ' ') AS gram"
    )
    cg = psg.groupBy("doc_id", "n", "gram").agg(F.count("*").alias("cnt"))
    tops = (
        cg.filter("n <= 4")
        .groupBy("doc_id", "n")
        .agg(F.max(F.struct("cnt", "gram")).alias("s"))
        .selectExpr("doc_id", "n", "s.cnt * length(s.gram) AS num")
    )
    dupg = cg.filter("n >= 5 AND cnt > 1").select("doc_id", "n", "gram")
    cov = (
        psg.join(dupg, ["doc_id", "n", "gram"])
        .selectExpr("doc_id", "n", "explode(sequence(p, p + n - 1)) AS pos")
        .distinct()
    )
    tk = base.select(
        "doc_id", F.posexplode("toks").alias("pos0", "w")
    ).selectExpr("doc_id", "pos0 + 1 AS pos", "length(w) AS wl")
    covc = (
        cov.join(tk, ["doc_id", "pos"])
        .groupBy("doc_id", "n")
        .agg(F.sum("wl").alias("num"))
    )

    def _piv(df, col_of, names):
        aggs = [
            F.coalesce(
                F.max(F.when(F.col("n") == n, F.col("num"))), F.lit(0)
            ).cast("long").alias(f"{col_of}{n}_num")
            for n in names
        ]
        return df.groupBy("doc_id").agg(*aggs)

    tp = _piv(tops, "top", [2, 3, 4])
    dp = _piv(covc, "dup", [5, 6, 7, 8, 9, 10])
    fin = (
        base.select("doc_id", F.col("den").cast("long").alias("den"))
        .join(tp, "doc_id", "left")
        .join(dp, "doc_id", "left")
    )
    for c in ["top2_num", "top3_num", "top4_num", "dup5_num", "dup6_num",
              "dup7_num", "dup8_num", "dup9_num", "dup10_num"]:
        fin = fin.withColumn(c, F.coalesce(F.col(c), F.lit(0)).cast("long"))
    thr = {
        "top2": (5, 1), "top3": (50, 9), "top4": (25, 4),
        "dup5": (20, 3), "dup6": (50, 7), "dup7": (100, 13),
        "dup8": (25, 3), "dup9": (100, 11), "dup10": (10, 1),
    }
    asb = lambda c: F.when(c, 1).otherwise(0).cast("long")  # noqa: E731
    oks = {k: F.col(f"{k}_num") * a <= b * F.col("den")
           for k, (a, b) in thr.items()}
    keep = None
    for c in oks.values():
        keep = c if keep is None else (keep & c)
    return fin.select(
        "doc_id", "den",
        *[F.col(f"{k}_num") for k in thr],
        *[asb(oks[k]).alias(f"ok_{k}") for k in thr],
        asb(keep).alias("keep"),
    )


# --- HITS hubs/authorities over the host link graph (q241) --------------------------

_HITS_ROUNDS = 4


def _hits_oracle_sql() -> str:
    ctes = ["""hosts AS (SELECT DISTINCT doc_id % 40 AS host FROM documents),
       edges AS (SELECT host AS src, (host + 1) % 40 AS dst FROM hosts
                 UNION ALL SELECT host, (host * 2 + 7) % 40 FROM hosts
                 UNION ALL SELECT host, (host * 3 + 11) % 40 FROM hosts),
       h0 AS (SELECT host, CAST(1 AS BIGINT) AS h FROM hosts)"""]
    for t in range(1, _HITS_ROUNDS + 1):
        ctes.append(f"""a{t} AS (SELECT x.host,
                     CAST(coalesce(s.s, 0) AS BIGINT) AS a
              FROM hosts x LEFT JOIN
                   (SELECT e.dst AS host, sum(h.h) AS s
                    FROM edges e JOIN h{t-1} h ON e.src = h.host
                    GROUP BY e.dst) s USING (host))""")
        ctes.append(f"""h{t} AS (SELECT x.host,
                     CAST(coalesce(s.s, 0) AS BIGINT) AS h
              FROM hosts x LEFT JOIN
                   (SELECT e.src AS host, sum(a.a) AS s
                    FROM edges e JOIN a{t} a ON e.dst = a.host
                    GROUP BY e.src) s USING (host))""")
    t = _HITS_ROUNDS
    return ("WITH " + ",\n       ".join(ctes)
            + f"""
       SELECT a{t}.host AS host, a{t}.a AS auth, h{t}.h AS hub
       FROM a{t} JOIN h{t} ON a{t}.host = h{t}.host""")


@query("q241_hits", _hits_oracle_sql())
def q241(spark, sf_dir):
    """HITS hubs & authorities (Kleinberg 1999) over the q190 host
    link graph in EXACT INTEGER arithmetic: the textbook mutual
    recursion a_{t+1}(v) = sum_{u->v} h_t(u), h_{t+1}(u) =
    sum_{u->v} a_{t+1}(v), run unnormalized for 4 rounds — rank
    order equals the normalized iteration's (normalization is a
    per-round positive scalar), and the growth bound (max in/out
    degree 3)^(2*4) keeps every value far inside BIGINT, so both
    engines agree bitwise with no float normalization anywhere.
    Each half-round is one equi-join + one map-side-combinable sum —
    the same shuffle shape as PageRank; at 10^12 pages the host
    graph is ~10^8 rows, everything keys on host."""
    docs = _t(spark, sf_dir, "documents")
    hosts = docs.select((F.col("doc_id") % 40).alias("host")).distinct()
    edges = hosts.select(
        F.col("host").alias("src"),
        F.explode(F.array(
            (F.col("host") + 1) % 40,
            (F.col("host") * 2 + 7) % 40,
            (F.col("host") * 3 + 11) % 40,
        )).alias("dst"),
    ).localCheckpoint(eager=True)
    h = hosts.withColumn("h", F.lit(1).cast("long"))
    for _ in range(_HITS_ROUNDS):
        a = (
            hosts.join(
                edges.join(h, edges.src == h.host)
                .groupBy("dst").agg(F.sum("h").alias("s")),
                hosts.host == F.col("dst"), "left")
            .select(hosts.host,
                    F.coalesce("s", F.lit(0)).cast("long").alias("a"))
        )
        h = (
            hosts.join(
                edges.join(a, edges.dst == a.host)
                .groupBy("src").agg(F.sum("a").alias("s")),
                hosts.host == F.col("src"), "left")
            .select(hosts.host,
                    F.coalesce("s", F.lit(0)).cast("long").alias("h"))
        )
    a = a.localCheckpoint(eager=True)
    h = h.localCheckpoint(eager=True)
    return a.join(h, "host").select(
        "host", F.col("a").alias("auth"), F.col("h").alias("hub")
    )


# --- cross-doc boilerplate line removal (q242) ---------------------------------------
#
# CCNet (Wenzek et al. 2020, arXiv:1911.00359) strips every line whose
# exact text recurs across documents (their per-shard line-hash dedup
# — the pass that kills cookie banners / nav bars / copyright
# footers).  Spec pinned: a line is boilerplate iff it occurs in >= 2
# DISTINCT documents; removal drops every occurrence.  Footer
# injections on doc_id%3 ("all rights reserved contact us") and
# doc_id%7 ("follow us on social media today") create the cross-doc
# mass; 5-word content lines never collide across docs in this
# corpus.

_BOILER_LINES_SQL = """
    list_concat(
        [array_to_string(tk[i*5+1:i*5+5], ' ')
         for i in range(0, 400) if i*5 < len(tk)],
        CASE WHEN doc_id % 3 = 0
             THEN ['all rights reserved contact us'] ELSE [] END ||
        CASE WHEN doc_id % 7 = 0
             THEN ['follow us on social media today'] ELSE [] END)
"""


@query(
    "q242_boilerplate_lines",
    f"""WITH t AS (SELECT doc_id,
                [w for w in string_split(text, ' ') if w <> ''] AS tk
             FROM documents),
       l AS (SELECT doc_id, {_BOILER_LINES_SQL} AS lines FROM t),
       e AS (SELECT doc_id, unnest(lines) AS line FROM l),
       v AS (SELECT line, count(DISTINCT doc_id) AS ndocs
             FROM e GROUP BY line),
       m AS (SELECT e.doc_id,
                    count(*) AS n_lines,
                    sum(CASE WHEN v.ndocs >= 2 THEN 1 ELSE 0 END)
                        AS removed_lines,
                    sum(CASE WHEN v.ndocs >= 2 THEN 0
                        ELSE length(e.line) END) AS kept_chars
             FROM e JOIN v USING (line) GROUP BY e.doc_id)
       SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines,
              CAST(removed_lines AS BIGINT) AS removed_lines,
              CAST(kept_chars AS BIGINT) AS kept_chars
       FROM m""",
)
def q242(spark, sf_dir):
    """Cross-document boilerplate line removal (CCNet, arXiv:1911.00359
    §3.1): every line occurring in >= 2 distinct documents is dropped
    everywhere — the pass that strips nav bars and copyright footers
    from 10^12 crawled pages.  Plan: explode lines, groupBy LINE
    (vocabulary-keyed shuffle with map-side combine — never doc x
    doc), join the per-line distinct-doc count back, aggregate per
    doc.  At corpus scale the line vocabulary is the working set,
    exactly CCNet's sharded-hash design; here the hash is the line
    itself so both engines agree bitwise."""
    t = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", "filter(split(text, ' '), w -> w != '') AS tk"
    )
    lines = t.selectExpr(
        "doc_id",
        "concat(transform(sequence(0, int((size(tk) - 1) / 5)), "
        "i -> array_join(slice(tk, i*5+1, 5), ' ')), "
        "CASE WHEN doc_id % 3 = 0 "
        "THEN array('all rights reserved contact us') "
        "ELSE array() END, "
        "CASE WHEN doc_id % 7 = 0 "
        "THEN array('follow us on social media today') "
        "ELSE array() END) AS lines",
    )
    e = lines.select("doc_id", F.explode("lines").alias("line"))
    v = e.groupBy("line").agg(
        F.countDistinct("doc_id").alias("ndocs")
    )
    return (
        e.join(v, "line")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum(F.when(F.col("ndocs") >= 2, 1).otherwise(0))
            .cast("long").alias("removed_lines"),
            F.sum(F.when(F.col("ndocs") >= 2, 0)
                  .otherwise(F.length("line")))
            .cast("long").alias("kept_chars"),
        )
    )


# --- CCNet LM-perplexity bucketing, integer surprisal proxy (q243) -------------------

_CCNET_BODY_SQL = (
    "text || repeat(' xq' || CAST(doc_id % 13 AS STRING), doc_id % 9)"
)


@query(
    "q243_ccnet_lm_buckets",
    f"""WITH d AS (SELECT doc_id, lang, {_CCNET_BODY_SQL} AS body
                FROM documents),
       t AS (SELECT doc_id, lang,
                [w for w in string_split(body, ' ') if w <> ''] AS tk
             FROM d),
       e AS (SELECT doc_id, lang, unnest(tk) AS w FROM t),
       ref AS (SELECT w, count(*) AS c FROM e WHERE lang = 'en'
               GROUP BY w),
       tot AS (SELECT sum(c) AS T FROM ref),
       sc AS (SELECT e.doc_id, count(*) AS n,
                 sum(greatest(0, (length(bin((SELECT T FROM tot))) - 1)
                     - (length(bin(coalesce(r.c, 0) + 1)) - 1))) AS s
              FROM e LEFT JOIN ref r ON e.w = r.w
              GROUP BY e.doc_id)
       SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
              CAST(s AS BIGINT) AS surprisal,
              CASE WHEN 20 * s <= 103 * n THEN 'head'
                   WHEN 100 * s <= 527 * n THEN 'middle'
                   ELSE 'tail' END AS bucket
       FROM sc""",
)
def q243(spark, sf_dir):
    """CCNet LM-perplexity bucketing (Wenzek et al. 2020,
    arXiv:1911.00359 §3.3) with an INTEGER surprisal proxy: the
    reference model is the unigram count table of the lang='en' slice
    (the 'target-domain' corpus standing in for their Wikipedia LM);
    a token's surprisal is floor(log2 T) - floor(log2 (c+1)) computed
    as length(bin(x))-1 — pure integer bit-length, bitwise identical
    across engines, no transcendental log anywhere.  Docs bucket
    head/middle/tail on the per-token average via cross-multiplied
    integer thresholds (5.15 / 5.27 bits per token).  Plan: one
    vocabulary-keyed groupBy to train, one word-keyed join to score
    (the LM table broadcasts at realistic vocab sizes), one per-doc
    sum — linear end to end; rare-token injections (doc_id%9 copies
    of a doc_id%13 token) create the spread the buckets measure."""
    d = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", "lang", f"{_CCNET_BODY_SQL} AS body"
    )
    e = d.selectExpr(
        "doc_id", "lang",
        "explode(filter(split(body, ' '), w -> w != '')) AS w",
    )
    ref = e.filter("lang = 'en'").groupBy("w").agg(
        F.count("*").alias("c")
    )
    T = ref.agg(F.sum("c").alias("T"))
    scored = (
        e.join(F.broadcast(ref), "w", "left")
        .crossJoin(F.broadcast(T))
        .select(
            "doc_id",
            F.greatest(
                F.lit(0),
                (F.length(F.expr("bin(T)")) - 1)
                - (F.length(F.expr("bin(coalesce(c, 0) + 1)")) - 1),
            ).alias("bits"),
        )
    )
    sc = scored.groupBy("doc_id").agg(
        F.count("*").alias("n"), F.sum("bits").alias("s")
    )
    return sc.select(
        "doc_id",
        F.col("n").cast("long").alias("n_tokens"),
        F.col("s").cast("long").alias("surprisal"),
        F.when(20 * F.col("s") <= 103 * F.col("n"), "head")
        .when(100 * F.col("s") <= 527 * F.col("n"), "middle")
        .otherwise("tail").alias("bucket"),
    )


# --- positional inverted index: phrase retrieval (q244) ------------------------------


@query(
    "q244_phrase_search",
    """WITH t AS (SELECT doc_id,
                [w for w in string_split(text, ' ') if w <> ''] AS tk
             FROM documents),
       tok AS (SELECT doc_id,
                  unnest([p for p in range(1, 130) if p <= len(tk)]) AS pos,
                  tk
               FROM (SELECT doc_id, tk,
                        CASE WHEN len(tk) > 128
                             THEN error('q244 fixture outgrew range bound')
                             ELSE 1 END AS ok FROM t)),
       tok2 AS (SELECT doc_id, pos, tk[pos] AS w FROM tok),
       q AS (SELECT doc_id AS qid, tk[1] AS w1, tk[2] AS w2 FROM t
             WHERE doc_id < 3),
       hit AS (SELECT q.qid, a.doc_id, a.pos
               FROM q JOIN tok2 a ON a.w = q.w1
               JOIN tok2 b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
                          AND b.w = q.w2)
       SELECT q.qid, q.w1, q.w2,
              CAST(count(DISTINCT h.doc_id) AS BIGINT) AS n_docs,
              CAST(count(h.doc_id) AS BIGINT) AS n_occ,
              CAST(min(h.doc_id) AS BIGINT) AS min_doc,
              CAST(max(h.doc_id) AS BIGINT) AS max_doc
       FROM q LEFT JOIN hit h ON q.qid = h.qid
       GROUP BY q.qid, q.w1, q.w2""",
)
def q244(spark, sf_dir):
    """Positional-inverted-index phrase retrieval (the search-engine
    primitive a crawled-corpus serving stack needs): the corpus
    explodes once into (doc, pos, word) postings; a phrase query
    (w1, w2) matches where w1's postings join w2's at pos+1 in the
    same doc.  Queries derive from the first two tokens of docs 0-2
    (broadcast to every postings partition — the probe side is tiny,
    the postings side is the 10^12-doc table sharded by word).  Emits
    per-query doc frequency, occurrence count, and doc-id range.
    Plan: selective word filter -> broadcast-joined probe -> one
    (doc,pos)-keyed equi-join — never a full doc scan per query."""
    t = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", "filter(split(text, ' '), w -> w != '') AS tk"
    )
    tok = t.select(
        "doc_id", F.posexplode("tk").alias("p0", "w")
    ).selectExpr("doc_id", "p0 + 1 AS pos", "w")
    q = t.filter("doc_id < 3").selectExpr(
        "doc_id AS qid", "tk[0] AS w1", "tk[1] AS w2"
    )
    a = tok.select("doc_id", "pos", F.col("w").alias("wa"))
    b = tok.select(
        F.col("doc_id").alias("doc_b"),
        (F.col("pos") - 1).alias("pos_b"),
        F.col("w").alias("wb"),
    )
    hit = (
        F.broadcast(q).join(a, F.col("wa") == F.col("w1"))
        .join(
            b,
            (F.col("doc_b") == F.col("doc_id"))
            & (F.col("pos_b") == F.col("pos"))
            & (F.col("wb") == F.col("w2")),
        )
        .select("qid", "doc_id", "pos")
    )
    return (
        q.join(hit, "qid", "left")
        .groupBy("qid", "w1", "w2")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count("doc_id").cast("long").alias("n_occ"),
            F.min("doc_id").cast("long").alias("min_doc"),
            F.max("doc_id").cast("long").alias("max_doc"),
        )
    )


# --- gdaldem hillshade -multidirectional (q245) --------------------------------------

from gdal_spark.operators.focal import (  # noqa: E402
    hillshade_md_consts_values as _hsmd_consts,
)

_MD_S, _MD_C225, _MD_CZ, _MD_SQZ = (repr(v) for v in _hsmd_consts())


@query(
    "q245_dem_hillshade_multidirectional",
    f"""WITH g AS ({_DEM_G}),
       pq AS (SELECT gx, gy, {_P_SQL} AS p, {_Q_SQL} AS q FROM g),
       xy AS (SELECT gx, gy, -8.0 * p AS x, -8.0 * q AS y FROM pq),
       w AS (SELECT gx, gy, x, y, x*x AS xx, y*y AS yy, x*x + y*y AS xxyy
             FROM xy),
       v AS (SELECT gx, gy, x, y, xx, yy, xxyy,
                CASE WHEN {_MD_S} + (x - y) * {_MD_C225} <= 0 THEN 0.0
                     ELSE {_MD_S} + (x - y) * {_MD_C225} END AS v225,
                CASE WHEN {_MD_S} - x * {_MD_CZ} <= 0 THEN 0.0
                     ELSE {_MD_S} - x * {_MD_CZ} END AS v270,
                CASE WHEN {_MD_S} + (x + y) * {_MD_C225} <= 0 THEN 0.0
                     ELSE {_MD_S} + (x + y) * {_MD_C225} END AS v315,
                CASE WHEN {_MD_S} - y * {_MD_CZ} <= 0 THEN 0.0
                     ELSE {_MD_S} - y * {_MD_CZ} END AS v360
             FROM w),
       h AS (SELECT gx, gy,
                CASE WHEN xxyy = 0.0 THEN 1.0 + 2.0 * {_MD_S}
                     ELSE 1.0 + ((((0.5 * xxyy - x * y) * v225 + xx * v270
                          + (xxyy - (0.5 * xxyy - x * y)) * v315
                          + yy * v360)) / xxyy)
                          / sqrt(1.0 + {_MD_SQZ} * xxyy) END AS shade
             FROM v)
       SELECT gx, gy, round(shade, 6) AS shade FROM h""",
)
def q245(spark, sf_dir):
    """gdaldem hillshade -multidirectional (USGS OF 92-422;
    apps/gdaldem_lib.cpp:1259-1315 GDALHillshadeMultiDirectionalAlg):
    the 225/270/315/360-azimuth blend whose weights
    sin^2(aspect - az) reduce to RATIONAL functions of the Horn
    gradients (w225 = 0.5(x^2+y^2) - xy, w270 = x^2, w315 = rest,
    w360 = y^2) — so the whole pixel function is arithmetic plus one
    IEEE sqrt, and with the trig constants inlined verbatim both
    engines evaluate the identical float64 tree.  Closes the
    round-3 'no multidirectional' hillshade gap."""
    from gdal_spark.operators.focal import hillshade_multidirectional_tiles

    out = hillshade_multidirectional_tiles(
        _dem_tiles(spark), DEM_TILE, DEM_W, DEM_H
    )
    return out.select("gx", "gy", F.round(F.col("v"), 6).alias("shade"))


# --- gdaldem hillshade -igor / -combined (q246-q247) ---------------------------------
#
# Both modes are atan/acos-bearing (no rational reduction exists), so
# the transcendentals run as JVM Columns against DuckDB's libm — the
# two agree bitwise on ~97% of arguments and differ by 1 ulp on the
# rest; outputs round to 3 decimals IN the query on both sides and
# tests/test_hillshade_modes.py asserts every fixture pixel's distance
# to the nearest rounding boundary exceeds 1e-6 (>= 10^9 ulps), so a
# last-ulp libm disagreement can never flip a rounded value.  Exact
# dyadic Horn p/q come from the halo kernel (operators/focal.py::
# horn_pq_tiles).

import math as _math  # noqa: E402

_IG_R2D = repr(180.0 / _math.pi)
_IG_I90 = repr(1.0 / 90.0)
_IG_IPI = repr(1.0 / _math.pi)
_IG_PI = repr(_math.pi)
_IG_2PI = repr(2.0 * _math.pi)
# NormalizeAngle(1.5*pi - az, 2*pi) for az = 315 deg
_IG_TGT = repr((1.5 * _math.pi - _math.radians(315.0)) % (2.0 * _math.pi))
_CB_SA = repr(_math.sin(_math.radians(45.0)))
_CB_CAZ = repr(_math.cos(_math.radians(315.0))
               * _math.cos(_math.radians(45.0)) / 8.0)
_CB_SAZ = repr(_math.sin(_math.radians(315.0))
               * _math.cos(_math.radians(45.0)) / 8.0)
_CB_IHP = repr(1.0 / ((_math.pi * _math.pi) / 4.0))


def _igor_shade_sql(p: str, q: str) -> str:
    """The Igor expression over exact p, q — shared verbatim by the
    Spark Column (via expr) and the DuckDB oracle."""
    asp = f"atan2({q}, -{p})"
    nrm = f"(CASE WHEN {asp} < 0.0 THEN ({asp} % {_IG_2PI}) + {_IG_2PI} " \
          f"ELSE ({asp} % {_IG_2PI}) END)"
    dif = f"abs({nrm} - {_IG_TGT})"
    dif2 = f"(CASE WHEN {dif} > {_IG_PI} THEN {_IG_2PI} - {dif} " \
           f"ELSE {dif} END)"
    slope = f"(atan(sqrt({p}*{p} + {q}*{q})) * {_IG_R2D}) * {_IG_I90}"
    return (f"255.0 * (1.0 - ({slope}) * (1.0 - {dif2} * {_IG_IPI}))")


def _combined_shade_sql(p: str, q: str) -> str:
    """The combined-mode expression over exact p, q (x = -8p, y = -8q
    per the reference's Horn sign convention, z factors folded)."""
    x, y = f"(-8.0 * {p})", f"(-8.0 * {q})"
    slope = f"(({x}*{x} + {y}*{y}) * 0.015625)"
    cang = (f"acos(({_CB_SA} - ({y} * {_CB_CAZ} - {x} * {_CB_SAZ})) "
            f"/ sqrt(1.0 + {slope}))")
    c2 = f"(1.0 - {cang} * atan(sqrt({slope})) * {_CB_IHP})"
    return (f"(CASE WHEN {c2} <= 0.0 THEN 1.0 "
            f"ELSE 1.0 + 254.0 * {c2} END)")


@query(
    "q246_dem_hillshade_igor",
    f"""WITH g AS ({_DEM_G}),
       pq AS (SELECT gx, gy, {_P_SQL} AS p, {_Q_SQL} AS q FROM g)
       SELECT gx, gy, round({_igor_shade_sql('p', 'q')}, 3) AS shade
       FROM pq""",
)
def q246(spark, sf_dir):
    """gdaldem hillshade -igor (Igor Evdokimov's shading;
    apps/gdaldem_lib.cpp:947-1012 GDALHillshadeIgorAlg, Horn, az 315):
    shadowness = slopeStrength * aspectStrength with slope via
    atan(|grad|) and the aspect penalty via the normalized angular
    distance to (3pi/2 - az).  Spec pinned float64 over the exact /8
    Horn derivatives (z=1, unit res — so atan(sqrt(key)*z/8) with
    key=64(p^2+q^2) reduces exactly to atan(sqrt(p^2+q^2)) by dyadic
    scaling); the SAME expression string is compiled by both engines,
    and the rounding-margin pytest makes 1-ulp libm drift harmless."""
    from gdal_spark.operators.focal import horn_pq_tiles

    pq = horn_pq_tiles(_dem_tiles(spark), DEM_TILE, DEM_W, DEM_H)
    return pq.select(
        "gx", "gy",
        F.round(F.expr(_igor_shade_sql("p", "q")), 3).alias("shade"),
    )


@query(
    "q247_dem_hillshade_combined",
    f"""WITH g AS ({_DEM_G}),
       pq AS (SELECT gx, gy, {_P_SQL} AS p, {_Q_SQL} AS q FROM g)
       SELECT gx, gy, round({_combined_shade_sql('p', 'q')}, 3) AS shade
       FROM pq""",
)
def q247(spark, sf_dir):
    """gdaldem hillshade -combined (apps/gdaldem_lib.cpp:1151-1186
    GDALHillshadeCombinedAlg, Horn, az 315 / alt 45): the oblique
    shade angle acos(cang) damped by atan(sqrt(slope)) * 4/pi^2 —
    shade and slope multiply so flat ground stays bright regardless
    of azimuth.  Same exact-p/q + shared-expression + rounding-margin
    strategy as q246; constants folded with z_factor=1/8 exactly as
    GDALCreateHillshadeData does and inlined verbatim."""
    from gdal_spark.operators.focal import horn_pq_tiles

    pq = horn_pq_tiles(_dem_tiles(spark), DEM_TILE, DEM_W, DEM_H)
    return pq.select(
        "gx", "gy",
        F.round(F.expr(_combined_shade_sql("p", "q")), 3).alias("shade"),
    )


# --- raster histogram matching / quantile mapping (q248) -----------------------------


@query(
    "q248_hist_match",
    """WITH g AS (SELECT gx.range AS gx, gy.range AS gy
                   FROM range(128) gx, range(128) gy),
       src AS (SELECT gx, gy,
                  CAST((gx*7 + gy*13) % 97 + (gx*gx) % 23 AS BIGINT) AS v
               FROM g),
       ref AS (SELECT gx, gy,
                  CAST((gx*11 + gy*5) % 89 + (gy*gy) % 31 AS BIGINT) AS v
               FROM g),
       hs AS (SELECT v, count(*) AS c FROM src GROUP BY v),
       cs AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM hs),
       hr AS (SELECT v, count(*) AS c FROM ref GROUP BY v),
       cr AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM hr),
       ns AS (SELECT CAST(128*128 AS BIGINT) AS nsrc,
                     CAST(128*128 AS BIGINT) AS nref),
       lut AS (SELECT cs.v, min(cr.v) AS t
               FROM cs, cr, ns
               WHERE cr.cum * ns.nsrc >= cs.cum * ns.nref
               GROUP BY cs.v)
       SELECT l.v, CAST(l.t AS BIGINT) AS t,
              CAST(h.c AS BIGINT) AS n_px
       FROM lut l JOIN hs h USING (v)""",
)
def q248(spark, sf_dir):
    """Histogram matching (quantile mapping): remap every source pixel
    value v to the smallest reference value t whose reference CDF
    reaches the source CDF at v — the radiometric-normalization step
    a mosaic pipeline runs before compositing scenes (the reference's
    gdalenhance histogram machinery, apps/gdalenhance.cpp, generalized
    from equalize-to-uniform to equalize-to-REFERENCE).  The CDF
    comparison is exact integer cross-multiplication
    (cumR(t)*Nsrc >= cumS(v)*Nref — no division, engine-identical);
    both CDFs live on the VALUE domain (byte-bounded at any raster
    size), so the LUT build is a ~256x256 broadcast join and the
    apply is one broadcast LUT join per pixel, the q214/q163
    pattern."""
    g = spark.range(128).select(F.col("id").alias("gx")).crossJoin(
        spark.range(128).select(F.col("id").alias("gy")))
    src = g.select(
        "gx", "gy",
        ((F.col("gx") * 7 + F.col("gy") * 13) % 97
         + (F.col("gx") * F.col("gx")) % 23).cast("long").alias("v"),
    )
    ref = g.select(
        "gx", "gy",
        ((F.col("gx") * 11 + F.col("gy") * 5) % 89
         + (F.col("gy") * F.col("gy")) % 31).cast("long").alias("v"),
    )
    hs = src.groupBy("v").agg(F.count("*").alias("c"))
    cs = hs.withColumn("cum", F.sum("c").over(Window.orderBy("v")))
    hr = ref.groupBy("v").agg(F.count("*").alias("c"))
    cr = hr.withColumn("cum", F.sum("c").over(Window.orderBy("v")))
    n = F.lit(128 * 128).cast("long")
    lut = (
        cs.select(F.col("v"), F.col("cum").alias("cums"))
        .crossJoin(F.broadcast(
            cr.select(F.col("v").alias("t"), F.col("cum").alias("cumr"))))
        .filter(F.col("cumr") * n >= F.col("cums") * n)
        .groupBy("v")
        .agg(F.min("t").alias("t"))
    )
    return (
        lut.join(hs, "v")
        .select("v", F.col("t").cast("long").alias("t"),
                F.col("c").cast("long").alias("n_px"))
    )


# --- unigram-LM Viterbi tokenizer apply, integer costs (q249) ------------------------
#
# SentencePiece's unigram model (Kudo 2018, arXiv:1804.10959) segments
# each word by minimum total piece cost.  Costs here are the q243
# integer surprisal proxy (bitlen(T) - bitlen(c), pure bin()-length —
# no float log), and the DP minimizes the single integer
# dist = cost*64 + n_pieces, which encodes (total cost, piece count)
# lexicographically exactly (n_pieces <= 8 < 64) — so the tie rule
# "fewest pieces among minimum-cost segmentations" is one min().
# Vocabulary: every 1-char piece plus all 2..4-char substrings with
# corpus-weighted occurrence count >= 50.

_VIT_MAXL = 8  # max corpus word length; guarded in both engines


def _viterbi_oracle_sql() -> str:
    ctes = ["""v AS (SELECT word, count(*) AS cnt FROM
                 (SELECT unnest([x for x in string_split(text, ' ')
                                 if x <> '']) AS word FROM documents)
               GROUP BY word),
       guard AS (SELECT CASE WHEN max(length(word)) > 8
                      THEN error('q249 word outgrew DP depth')
                      ELSE 1 END AS ok FROM v),
       occ AS (SELECT word, cnt,
                  unnest([i for i in range(1, 9)
                          if i <= length(word)]) AS i
               FROM v),
       occ2 AS (SELECT word, cnt, i,
                   unnest([l for l in range(1, 5)
                           if i + l - 1 <= length(word)]) AS l
                FROM occ),
       pc AS (SELECT substr(word, i, l) AS piece, sum(cnt) AS c
              FROM occ2 GROUP BY 1),
       kept AS (SELECT piece, c FROM pc
                WHERE length(piece) = 1 OR c >= 50),
       tot AS (SELECT sum(c) AS T FROM kept),
       edges AS (SELECT o.word, o.i - 1 AS i, o.i - 1 + o.l AS j,
                    (length(bin((SELECT T FROM tot)))
                     - length(bin(k.c))) * 64 + 1 AS we
                 FROM occ2 o JOIN kept k ON substr(o.word, o.i, o.l) = k.piece),
       b0 AS (SELECT word, CAST(0 AS BIGINT) AS dist FROM v, guard)"""]
    for j in range(1, _VIT_MAXL + 1):
        srcs = " UNION ALL ".join(
            f"SELECT b.word, b.dist + e.we AS d FROM b{i} b "
            f"JOIN edges e ON e.word = b.word AND e.i = {i} AND e.j = {j}"
            for i in range(max(0, j - 4), j)
        )
        ctes.append(f"b{j} AS (SELECT word, min(d) AS dist FROM ({srcs}) "
                    f"GROUP BY word)")
    alls = " UNION ALL ".join(
        f"SELECT word, {j} AS pos, dist FROM b{j}"
        for j in range(1, _VIT_MAXL + 1)
    )
    ctes.append(f"fin AS ({alls})")
    return ("WITH " + ",\n       ".join(ctes) + """
       SELECT v.word, CAST(v.cnt AS BIGINT) AS cnt,
              CAST(f.dist // 64 AS BIGINT) AS tok_cost,
              CAST(f.dist % 64 AS BIGINT) AS n_pieces
       FROM v JOIN fin f ON f.word = v.word AND f.pos = length(v.word)""")


@query("q249_unigram_viterbi", _viterbi_oracle_sql())
def q249(spark, sf_dir):
    """Unigram-LM tokenizer APPLY (SentencePiece, arXiv:1804.10959):
    Viterbi-segment every vocabulary word by minimum total piece cost
    over the corpus-trained piece table.  Costs are the integer
    surprisal proxy (bin()-length, q243 pattern); the DP distance
    cost*64 + n_pieces makes 'fewest pieces among cheapest' a single
    integer min.  Working set is the WORD VOCABULARY (the q231 BPE
    insight — re-tokenizing 10^12 docs afterwards is a broadcast
    word->segmentation map join); the DP itself is <=8 rounds of
    edge-relaxation joins over (word, position) with per-round lazy
    checkpoints bounding the Catalyst tree (each b[j] is referenced
    by up to 4 later rounds — unbounded that is a 4^L plan tree, the
    median-cut invariant)."""
    from gdal_spark.operators.bpe import word_vocab

    v = word_vocab(_t(spark, sf_dir, "documents")).select("word", "cnt")
    v = v.localCheckpoint(eager=True)
    maxl = v.agg(F.max(F.length("word"))).collect()[0][0]
    if maxl > _VIT_MAXL:
        raise RuntimeError(f"q249 word length {maxl} outgrew DP depth")
    occ2 = v.selectExpr(
        "word", "cnt",
        "explode(sequence(1, length(word))) AS i",
    ).selectExpr(
        "word", "cnt", "i",
        "explode(sequence(1, least(4, length(word) - i + 1))) AS l",
    )
    pc = occ2.selectExpr("substring(word, i, l) AS piece", "cnt").groupBy(
        "piece").agg(F.sum("cnt").alias("c"))
    kept = pc.filter("length(piece) = 1 OR c >= 50")
    T = kept.agg(F.sum("c").alias("T"))
    edges = (
        occ2.selectExpr("word", "i - 1 AS i", "i - 1 + l AS j",
                        "substring(word, i, l) AS piece")
        .join(F.broadcast(kept), "piece")
        .crossJoin(F.broadcast(T))
        .selectExpr(
            "word", "i", "j",
            "(length(bin(T)) - length(bin(c))) * 64 + 1 AS we",
        )
        .localCheckpoint(eager=True)
    )
    b = {0: v.select("word", F.lit(0).cast("long").alias("dist"))}
    for j in range(1, _VIT_MAXL + 1):
        srcs = None
        for i in range(max(0, j - 4), j):
            e = edges.filter((F.col("i") == i) & (F.col("j") == j))
            s = b[i].join(e, "word").select(
                "word", (F.col("dist") + F.col("we")).alias("d"))
            srcs = s if srcs is None else srcs.unionAll(s)
        b[j] = (
            srcs.groupBy("word").agg(F.min("d").alias("dist"))
            .localCheckpoint(eager=False)
        )
    fin = None
    for j in range(1, _VIT_MAXL + 1):
        s = b[j].select("word", F.lit(j).alias("pos"), "dist")
        fin = s if fin is None else fin.unionAll(s)
    return (
        v.join(fin, (v.word == fin.word)
               & (fin.pos == F.length(v.word)))
        .select(
            v.word.alias("word"),
            F.col("cnt").cast("long").alias("cnt"),
            F.floor(F.col("dist") / 64).cast("long").alias("tok_cost"),
            (F.col("dist") % 64).cast("long").alias("n_pieces"),
        )
    )


# --- MinHash LSH candidate quality: precision/recall eval (q250) ---------------------

_MH_EVAL_CTE = f"""d AS (SELECT doc_id, text FROM ({DOCS_WITH_DUPS_SQL})
                WHERE doc_id % 3 = 0),
       tk AS (SELECT doc_id,
                 list_filter(string_split(text, ' '), x -> x <> '') AS toks
              FROM d),
       toks AS (SELECT DISTINCT doc_id, tok FROM (
           SELECT doc_id,
                  unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                         i -> array_to_string(list_slice(toks, i, i + 2),
                                              ' '))) AS tok
           FROM tk)),
       sigs AS (SELECT doc_id,
                min(md5(tok || 's0')) AS sig0, min(md5(tok || 's1')) AS sig1,
                min(md5(tok || 's2')) AS sig2, min(md5(tok || 's3')) AS sig3,
                min(md5(tok || 's4')) AS sig4, min(md5(tok || 's5')) AS sig5,
                min(md5(tok || 's6')) AS sig6, min(md5(tok || 's7')) AS sig7
                FROM toks GROUP BY doc_id),
       buckets AS (
         SELECT doc_id, 0 AS band,
                md5(sig0 || sig1 || sig2 || sig3) AS bucket FROM sigs
         UNION ALL
         SELECT doc_id, 1 AS band,
                md5(sig4 || sig5 || sig6 || sig7) AS bucket FROM sigs),
       cand AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
                FROM buckets l JOIN buckets r USING (band, bucket)
                WHERE l.doc_id < r.doc_id),
       sizes AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id),
       inter AS (SELECT ta.doc_id AS a, tb.doc_id AS b, count(*) AS inter
                 FROM toks ta JOIN toks tb
                   ON tb.tok = ta.tok AND ta.doc_id < tb.doc_id
                 GROUP BY 1, 2),
       truth AS (SELECT i.a, i.b FROM inter i
                 JOIN sizes sa ON sa.doc_id = i.a
                 JOIN sizes sb ON sb.doc_id = i.b
                 WHERE 2 * i.inter >= sa.n + sb.n - i.inter)"""


@query(
    "q250_minhash_eval",
    f"""WITH {_MH_EVAL_CTE}
       SELECT CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth,
              CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_cand,
              CAST((SELECT count(*) FROM cand c JOIN truth t
                    ON c.a = t.a AND c.b = t.b) AS BIGINT) AS n_hit""",
)
def q250(spark, sf_dir):
    """MinHash-LSH candidate QUALITY measurement (the methodology
    query a 10^12-doc dedup rollout runs before committing to band
    parameters, q139's recall@5 pattern applied to q18's banding):
    ground truth = all pairs with exact word-bigram Jaccard >= 0.5
    (via the shared-token inverted index — 2*inter >= union in exact
    integers, no division), candidates = the raw 2-band minhash
    bucket pairs BEFORE verification.  Emits (n_truth, n_cand,
    n_hit): recall = hit/truth, precision = hit/cand.  Truth
    generation shuffles on the token vocabulary, candidates on
    bucket hashes — both linear; the doc_id%3 slice bounds the
    fixture, not the operator."""
    d = _docs_with_dups(spark, sf_dir).filter("doc_id % 3 = 0")
    toks = d.selectExpr(
        "doc_id",
        "explode(array_distinct(transform("
        "sequence(1, greatest(size(filter(split(text, ' '), x -> x != '')) - 2, 1)), "
        "i -> array_join(slice(filter(split(text, ' '), x -> x != ''), i, 3), ' ')"
        "))) AS tok",
    ).distinct()
    sigs = toks.groupBy("doc_id").agg(
        *[F.min(F.md5(F.concat(F.col("tok"), F.lit(f"s{i}")))).alias(f"sig{i}")
          for i in range(8)]
    )
    b0 = sigs.select(
        "doc_id", F.lit(0).alias("band"),
        F.md5(F.concat("sig0", "sig1", "sig2", "sig3")).alias("bucket"))
    b1 = sigs.select(
        "doc_id", F.lit(1).alias("band"),
        F.md5(F.concat("sig4", "sig5", "sig6", "sig7")).alias("bucket"))
    buckets = b0.unionAll(b1)
    l = buckets.select(F.col("doc_id").alias("a"), "band", "bucket")
    r = buckets.select(F.col("doc_id").alias("b"), "band", "bucket")
    cand = (l.join(r, ["band", "bucket"]).filter("a < b")
            .select("a", "b").distinct())
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("n"))
    ta = toks.select(F.col("doc_id").alias("a"), "tok")
    tb = toks.select(F.col("doc_id").alias("b"), "tok")
    inter = (ta.join(tb, "tok").filter("a < b")
             .groupBy("a", "b").agg(F.count("*").alias("inter")))
    truth = (
        inter.join(sizes.withColumnRenamed("doc_id", "a")
                   .withColumnRenamed("n", "na"), "a")
        .join(sizes.withColumnRenamed("doc_id", "b")
              .withColumnRenamed("n", "nb"), "b")
        .filter(2 * F.col("inter") >= F.col("na") + F.col("nb") - F.col("inter"))
        .select("a", "b")
    )
    # one materializing job: full-outer join the two pair sets and
    # count membership flags in a single aggregation (three separate
    # .count() jobs re-executed the sig/inter chains three times)
    j = cand.withColumn("_c", F.lit(1)).join(
        truth.withColumn("_t", F.lit(1)), ["a", "b"], "full_outer")
    row = j.agg(
        F.sum(F.coalesce("_t", F.lit(0))).alias("n_truth"),
        F.sum(F.coalesce("_c", F.lit(0))).alias("n_cand"),
        F.sum(F.coalesce("_t", F.lit(0))
              * F.coalesce("_c", F.lit(0))).alias("n_hit"),
    ).collect()[0]
    return spark.createDataFrame(
        [(row["n_truth"], row["n_cand"], row["n_hit"])],
        "n_truth BIGINT, n_cand BIGINT, n_hit BIGINT")


# --- coverage clean: gap/overlap absorption (q251) -----------------------------------

_COV_TILES_SQL = """SELECT k.range AS id,
                    (k.range % 5)*4 + CASE WHEN k.range = 7 THEN 1 ELSE 0 END
                        AS x0,
                    (k.range // 5)*4 AS y0,
                    (k.range % 5)*4 + CASE WHEN k.range = 7 THEN 1 ELSE 0 END
                        + 4 AS x1,
                    (k.range // 5)*4 + 4 AS y1
             FROM range(25) k"""


@query(
    "q251_coverage_clean",
    f"""WITH RECURSIVE r AS ({_COV_TILES_SQL}),
       cells AS (SELECT gx.range AS cx, gy.range AS cy
                 FROM range(20) gx, range(20) gy),
       cov AS (SELECT c.cx, c.cy, count(t.id) AS n_owners,
                      min(t.id) AS min_owner
               FROM cells c LEFT JOIN r t
                 ON c.cx >= t.x0 AND c.cx < t.x1
                AND c.cy >= t.y0 AND c.cy < t.y1
               GROUP BY c.cx, c.cy),
       sp AS (SELECT cx, cy,
                     CASE WHEN n_owners = 0 THEN 'gap'
                          ELSE 'overlap' END AS kind
              FROM cov WHERE n_owners <> 1),
       adj AS (SELECT a.cx AS ax, a.cy AS ay, b.cx AS bx, b.cy AS by
               FROM sp a JOIN sp b
                 ON a.kind = b.kind
                AND abs(a.cx - b.cx) + abs(a.cy - b.cy) = 1),
       lab AS (SELECT cx, cy, cx*32 + cy AS lbl FROM sp
               UNION
               SELECT a.ax, a.ay, l.lbl
               FROM lab l JOIN adj a ON a.bx = l.cx AND a.by = l.cy),
       lbl AS (SELECT s.cx, s.cy, s.kind, min(l.lbl) AS lbl
               FROM sp s JOIN lab l ON l.cx = s.cx AND l.cy = s.cy
               GROUP BY s.cx, s.cy, s.kind),
       nb AS (SELECT l.lbl, l.kind, v.min_owner AS owner
              FROM lbl l
              JOIN (VALUES (1, 0), (-1, 0), (0, 1), (0, -1)) d(dx, dy)
                ON TRUE
              JOIN cov v ON v.cx = l.cx + d.dx AND v.cy = l.cy + d.dy
              WHERE v.n_owners = 1),
       sc AS (SELECT lbl, kind, owner, count(*) AS cnt
              FROM nb GROUP BY lbl, kind, owner),
       asg AS (SELECT lbl, kind, max(cnt*32 + (31 - owner)) AS code
               FROM sc GROUP BY lbl, kind),
       sz AS (SELECT lbl, kind, count(*) AS n_cells
              FROM lbl GROUP BY lbl, kind)
       SELECT s.kind, CAST(s.lbl AS BIGINT) AS region,
              CAST(s.n_cells AS BIGINT) AS n_cells,
              CAST(31 - (a.code % 32) AS BIGINT) AS assigned_to
       FROM sz s JOIN asg a ON a.lbl = s.lbl AND a.kind = s.kind""",
)
def q251(spark, sf_dir):
    """Coverage CLEANING (the GEOS CoverageCleaner contract behind
    gdal vector clean-coverage; completes the q225 check / q234
    simplify trio): every GAP face (cells no polygon covers) and
    every OVERLAP face (cells >= 2 polygons cover) is absorbed into
    the neighboring polygon sharing the LONGEST boundary, ties to the
    smallest polygon id.  On the q225 integer tiling the faces are
    unit-grid cell components: components by min-label propagation
    over 4-adjacency (engine: pointer rounds with a loud cap; oracle:
    a recursive CTE to fixpoint), shared-boundary length = count of
    cell edges into unique-owner cells, and the argmax is the single
    integer max(cnt*32 + (31 - owner)) — map-side combinable, ties
    encoded, no window.  The shifted tile 7 creates exactly one gap
    face and one overlap face, both 4 cells."""
    r = spark.range(25).selectExpr(
        "id",
        "(id % 5)*4 + CASE WHEN id = 7 THEN 1 ELSE 0 END AS x0",
        "CAST(id / 5 AS BIGINT)*4 AS y0",
        "(id % 5)*4 + CASE WHEN id = 7 THEN 1 ELSE 0 END + 4 AS x1",
        "CAST(id / 5 AS BIGINT)*4 + 4 AS y1",
    )
    cells = spark.range(20).selectExpr("id AS cx").crossJoin(
        spark.range(20).selectExpr("id AS cy"))
    cov = (
        cells.join(
            r,
            (F.col("cx") >= F.col("x0")) & (F.col("cx") < F.col("x1"))
            & (F.col("cy") >= F.col("y0")) & (F.col("cy") < F.col("y1")),
            "left",
        )
        .groupBy("cx", "cy")
        .agg(F.count("id").alias("n_owners"), F.min("id").alias("min_owner"))
        .localCheckpoint(eager=True)
    )
    sp = cov.filter("n_owners <> 1").selectExpr(
        "cx", "cy",
        "CASE WHEN n_owners = 0 THEN 'gap' ELSE 'overlap' END AS kind",
    )
    lbl = sp.withColumn("lbl", F.col("cx") * 32 + F.col("cy"))
    lbl = lbl.localCheckpoint(eager=True)
    for _round in range(16):
        a = lbl.selectExpr("cx AS ax", "cy AS ay", "kind AS kinda",
                           "lbl AS la")
        b = lbl.selectExpr("cx AS bx", "cy AS by", "kind AS kindb",
                           "lbl AS lb")
        nxt = (
            a.join(
                b,
                (F.col("kinda") == F.col("kindb"))
                & ((F.abs(F.col("ax") - F.col("bx"))
                    + F.abs(F.col("ay") - F.col("by"))) == 1),
            )
            .groupBy("ax", "ay", "kinda")
            .agg(F.min("lb").alias("nmin"))
            .localCheckpoint(eager=True)
        )
        merged = (
            lbl.join(
                nxt,
                (F.col("cx") == F.col("ax")) & (F.col("cy") == F.col("ay"))
                & (F.col("kind") == F.col("kinda")), "left")
            .select(
                "cx", "cy", "kind",
                F.least(F.col("lbl"),
                        F.coalesce("nmin", F.col("lbl"))).alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            merged.alias("m").join(
                lbl.alias("o"), ["cx", "cy", "kind"])
            .filter("m.lbl <> o.lbl").count()
        )
        lbl.unpersist()
        lbl = merged
        if changed == 0:
            break
    else:
        raise RuntimeError("q251 label propagation did not converge")
    d = spark.createDataFrame(
        [(1, 0), (-1, 0), (0, 1), (0, -1)], "dx INT, dy INT")
    nb = (
        lbl.crossJoin(F.broadcast(d))
        .join(
            cov.selectExpr("cx AS nx", "cy AS ny", "n_owners", "min_owner"),
            (F.col("nx") == F.col("cx") + F.col("dx"))
            & (F.col("ny") == F.col("cy") + F.col("dy")),
        )
        .filter("n_owners = 1")
        .select("lbl", "kind", F.col("min_owner").alias("owner"))
    )
    sc = nb.groupBy("lbl", "kind", "owner").agg(F.count("*").alias("cnt"))
    asg = sc.groupBy("lbl", "kind").agg(
        F.max(F.col("cnt") * 32 + (31 - F.col("owner"))).alias("code"))
    sz = lbl.groupBy("lbl", "kind").agg(F.count("*").alias("n_cells"))
    return sz.join(asg, ["lbl", "kind"]).select(
        "kind",
        F.col("lbl").cast("long").alias("region"),
        F.col("n_cells").cast("long").alias("n_cells"),
        (31 - (F.col("code") % 32)).cast("long").alias("assigned_to"),
    )


# --- crawl frontier politeness scheduling (q252) -------------------------------------


@query(
    "q252_frontier_schedule",
    """WITH req AS (SELECT doc_id, doc_id % 40 AS host,
                       n_chars AS priority
                FROM documents),
       slot AS (SELECT doc_id, host, priority,
                   row_number() OVER (PARTITION BY host
                       ORDER BY priority DESC, doc_id) - 1 AS host_slot
                FROM req),
       tmd AS (SELECT doc_id, host, host_slot,
                  host % 8 AS thread, host_slot * 5 AS ready
               FROM slot),
       tick AS (SELECT doc_id, host, thread, host_slot, ready,
                   row_number() OVER (PARTITION BY thread
                       ORDER BY ready, host, doc_id) AS tick
                FROM tmd)
       SELECT doc_id, CAST(host AS BIGINT) AS host,
              CAST(thread AS BIGINT) AS thread,
              CAST(host_slot AS BIGINT) AS host_slot,
              CAST(tick AS BIGINT) AS tick
       FROM tick""",
)
def q252(spark, sf_dir):
    """Crawl-frontier politeness scheduling (the Heritrix/Nutch
    frontier contract): requests queue per HOST ordered by priority
    (ties to lowest doc id); each host releases one fetch every 5
    ticks (politeness delay -> ready = slot*5); hosts shard onto 8
    fetcher threads by hash, and each thread executes its merged
    ready-ordered queue one fetch per tick (ties host, then doc).
    Two window passes — one partitioned by host, one by thread; both
    keys shard across executors, nothing global.  Emits the full
    deterministic schedule a 10^12-page recrawl would replay."""
    req = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", "doc_id % 40 AS host", "n_chars AS priority")
    wh = Window.partitionBy("host").orderBy(
        F.col("priority").desc(), F.col("doc_id"))
    slot = req.withColumn("host_slot", F.row_number().over(wh) - 1)
    tmd = slot.selectExpr(
        "doc_id", "host", "host_slot",
        "host % 8 AS thread", "host_slot * 5 AS ready")
    wt = Window.partitionBy("thread").orderBy("ready", "host", "doc_id")
    return tmd.withColumn("tick", F.row_number().over(wt)).select(
        "doc_id",
        F.col("host").cast("long").alias("host"),
        F.col("thread").cast("long").alias("thread"),
        F.col("host_slot").cast("long").alias("host_slot"),
        F.col("tick").cast("long").alias("tick"),
    )


# --- SCD2 recrawl history with change suppression (q253) -----------------------------


@query(
    "q253_recrawl_history",
    """WITH cap AS (SELECT doc_id,
                       'u' || CAST(doc_id % 120 AS STRING) AS url,
                       1767225600 + ((doc_id * 37) % 1000) * 3600 AS ts,
                       (doc_id * doc_id) % 7 AS digest
                FROM documents),
       seq AS (SELECT *, lag(digest) OVER (PARTITION BY url
                       ORDER BY ts, doc_id) AS prev
               FROM cap),
       chg AS (SELECT doc_id, url, ts, digest FROM seq
               WHERE prev IS NULL OR digest <> prev),
       scd AS (SELECT url, doc_id, ts AS valid_from, digest,
                  row_number() OVER (PARTITION BY url
                      ORDER BY ts, doc_id) AS version,
                  lead(ts) OVER (PARTITION BY url
                      ORDER BY ts, doc_id) AS valid_to
               FROM chg)
       SELECT url, CAST(version AS BIGINT) AS version,
              CAST(valid_from AS BIGINT) AS valid_from,
              CAST(coalesce(valid_to, 0) AS BIGINT) AS valid_to,
              CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS BIGINT)
                  AS is_current,
              CAST(digest AS BIGINT) AS digest
       FROM scd""",
)
def q253(spark, sf_dir):
    """SCD-2 recrawl history (the warehouse pattern a CDX/WARC store
    uses to answer 'what did this url say at time T'): per-url capture
    stream ordered by (ts, doc_id); consecutive captures with an
    UNCHANGED digest are suppressed (no new version); surviving rows
    become versioned validity intervals [valid_from, valid_to) with
    the open current row flagged.  Two url-partitioned window passes
    (lag for suppression, lead/row_number for intervals) — shuffles
    on url only, the natural key a 10^12-capture store is already
    bucketed by."""
    cap = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        "concat('u', CAST(doc_id % 120 AS STRING)) AS url",
        "1767225600 + ((doc_id * 37) % 1000) * 3600 AS ts",
        "(doc_id * doc_id) % 7 AS digest",
    )
    w = Window.partitionBy("url").orderBy("ts", "doc_id")
    chg = (
        cap.withColumn("prev", F.lag("digest").over(w))
        .filter("prev IS NULL OR digest <> prev")
        .select("doc_id", "url", "ts", "digest")
    )
    scd = (
        chg.withColumn("version", F.row_number().over(w))
        .withColumn("valid_to", F.lead("ts").over(w))
    )
    return scd.select(
        "url",
        F.col("version").cast("long").alias("version"),
        F.col("ts").cast("long").alias("valid_from"),
        F.coalesce("valid_to", F.lit(0)).cast("long").alias("valid_to"),
        F.when(F.col("valid_to").isNull(), 1).otherwise(0).cast("long")
            .alias("is_current"),
        F.col("digest").cast("long").alias("digest"),
    )


# --- WARC shard layout + offset index (q254) -----------------------------------------


@query(
    "q254_warc_layout",
    """WITH rec AS (SELECT doc_id, n_chars + 64 AS nbytes FROM documents),
       cum AS (SELECT doc_id, nbytes,
                  coalesce(sum(nbytes) OVER (ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                      AS start_byte
               FROM rec),
       sh AS (SELECT doc_id, nbytes, start_byte,
                 start_byte // 16384 AS shard
              FROM cum),
       off AS (SELECT shard, min(start_byte) AS shard_base FROM sh
               GROUP BY shard)
       SELECT s.doc_id, CAST(s.shard AS BIGINT) AS shard,
              CAST(s.start_byte - o.shard_base AS BIGINT) AS offset,
              CAST(s.nbytes AS BIGINT) AS nbytes
       FROM sh s JOIN off o ON s.shard = o.shard""",
)
def q254(spark, sf_dir):
    """WARC-writer shard layout + CDX offset index: records (body +
    64-byte header) concatenate in doc order; a record's shard is
    floor(global_start / 16 KiB) (the greedy size-target cut a WARC
    writer makes) and its CDX offset is relative to the shard's first
    record.  One global cumulative sum (at 10^12 records: the
    two-pass partition-count prefix sum, same pattern as
    operators/suffix.py ordinals) + one per-shard min — this IS the
    index CDX serves range requests from."""
    rec = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", "n_chars + 64 AS nbytes")
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    cum = rec.withColumn(
        "start_byte", F.coalesce(F.sum("nbytes").over(w), F.lit(0)))
    sh = cum.withColumn("shard", F.floor(F.col("start_byte") / 16384))
    off = sh.groupBy("shard").agg(F.min("start_byte").alias("shard_base"))
    return sh.join(off, "shard").select(
        "doc_id",
        F.col("shard").cast("long").alias("shard"),
        (F.col("start_byte") - F.col("shard_base")).cast("long")
            .alias("offset"),
        F.col("nbytes").cast("long").alias("nbytes"),
    )


# --- point-in-time lookup over SCD2 intervals (q255) ---------------------------------


@query(
    "q255_point_in_time",
    """WITH cap AS (SELECT doc_id,
                       'u' || CAST(doc_id % 120 AS STRING) AS url,
                       1767225600 + ((doc_id * 37) % 1000) * 3600 AS ts,
                       (doc_id * doc_id) % 7 AS digest
                FROM documents),
       seq AS (SELECT *, lag(digest) OVER (PARTITION BY url
                       ORDER BY ts, doc_id) AS prev
               FROM cap),
       chg AS (SELECT doc_id, url, ts, digest FROM seq
               WHERE prev IS NULL OR digest <> prev),
       scd AS (SELECT url, ts AS valid_from, digest,
                  lead(ts) OVER (PARTITION BY url
                      ORDER BY ts, doc_id) AS valid_to
               FROM chg),
       q AS (SELECT k.range AS qid,
                'u' || CAST((k.range * 7) % 120 AS STRING) AS url,
                1767225600 + ((k.range * 131) % 1000) * 3600 AS qt
             FROM range(50) k)
       SELECT q.qid, q.url, CAST(q.qt AS BIGINT) AS qt,
              CAST(s.digest AS BIGINT) AS digest,
              CAST(s.valid_from AS BIGINT) AS valid_from
       FROM q JOIN scd s
         ON s.url = q.url AND s.valid_from <= q.qt
        AND (s.valid_to IS NULL OR q.qt < s.valid_to)""",
)
def q255(spark, sf_dir):
    """Point-in-time serving over the q253 SCD-2 store ('what did
    this url say at time T'): 50 (url, T) probes interval-join the
    versioned history — equi-join on url plus the validity-range
    predicate, exactly the plan a time-travel lookup compiles to
    (url equi-key carries the shuffle; the range residual filters
    in-place, no extra pass).  Probes whose T precedes the first
    capture drop out (inner join) — the contract a CDX replay
    endpoint implements."""
    cap = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        "concat('u', CAST(doc_id % 120 AS STRING)) AS url",
        "1767225600 + ((doc_id * 37) % 1000) * 3600 AS ts",
        "(doc_id * doc_id) % 7 AS digest",
    )
    w = Window.partitionBy("url").orderBy("ts", "doc_id")
    chg = (
        cap.withColumn("prev", F.lag("digest").over(w))
        .filter("prev IS NULL OR digest <> prev")
    )
    scd = chg.select(
        "url", F.col("ts").alias("valid_from"), "digest",
        F.lead("ts").over(w).alias("valid_to"),
    )
    q = spark.range(50).selectExpr(
        "id AS qid",
        "concat('u', CAST((id * 7) % 120 AS STRING)) AS url",
        "1767225600 + ((id * 131) % 1000) * 3600 AS qt",
    )
    return (
        q.join(
            scd,
            (q.url == scd.url) & (F.col("valid_from") <= F.col("qt"))
            & (F.col("valid_to").isNull() | (F.col("qt") < F.col("valid_to"))),
        )
        .select(
            "qid", q.url.alias("url"),
            F.col("qt").cast("long").alias("qt"),
            F.col("digest").cast("long").alias("digest"),
            F.col("valid_from").cast("long").alias("valid_from"),
        )
    )


# --- TF-IDF keyword extraction, integer-exact ranking (q256) --------------------------


@query(
    "q256_tfidf_keywords",
    """WITH t AS (SELECT doc_id,
                [w for w in string_split(text, ' ') if w <> ''] AS toks
             FROM documents),
       e AS (SELECT doc_id, unnest(toks) AS w FROM t),
       tf AS (SELECT doc_id, w, count(*) AS tf FROM e GROUP BY 1, 2),
       df AS (SELECT w, count(DISTINCT doc_id) AS df FROM e GROUP BY w),
       nn AS (SELECT count(DISTINCT doc_id) AS n FROM e),
       sc AS (SELECT tf.doc_id, tf.w,
                 tf.tf * (length(bin((SELECT n FROM nn)))
                          - length(bin(df.df))) AS score
              FROM tf JOIN df ON tf.w = df.w),
       ms AS (SELECT doc_id, max(score) AS ms FROM sc GROUP BY doc_id)
       SELECT s.doc_id, min(s.w) AS keyword,
              CAST(max(s.score) AS BIGINT) AS score
       FROM sc s JOIN ms m ON m.doc_id = s.doc_id AND s.score = m.ms
       GROUP BY s.doc_id""",
)
def q256(spark, sf_dir):
    """Per-document keyword extraction by integer-exact TF-IDF: score
    = tf * (floorlog2(N) - floorlog2(df)) with the bin()-length
    integer log (q243 pattern) — no float idf, engines agree bitwise.
    The winner per doc is (max score, lexicographically smallest
    word): one map-side-combinable struct aggregation in the engine,
    no window over the term table.  TF shuffles on (doc, word), DF on
    the word vocabulary — both linear at 10^12 docs."""
    e = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", "explode(filter(split(text, ' '), w -> w != '')) AS w")
    tf = e.groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
    df = e.groupBy("w").agg(F.countDistinct("doc_id").alias("df"))
    n = e.agg(F.countDistinct("doc_id").alias("n"))
    sc = (
        tf.join(F.broadcast(df), "w")
        .crossJoin(F.broadcast(n))
        .selectExpr(
            "doc_id", "w",
            "tf * (length(bin(n)) - length(bin(df))) AS score")
    )
    # argmax (score desc, word asc) == struct-max on (score, negated word)?
    # strings can't negate: max(struct(score, w)) picks max word among
    # ties — mirror the oracle instead: min word among max-score rows.
    ms = sc.groupBy("doc_id").agg(F.max("score").alias("ms"))
    return (
        sc.join(ms, "doc_id")
        .filter(F.col("score") == F.col("ms"))
        .groupBy("doc_id")
        .agg(F.min("w").alias("keyword"),
             F.max("score").cast("long").alias("score"))
    )


# --- link-spam signals: reciprocity + degree skew (q257) -----------------------------


@query(
    "q257_link_spam_signals",
    """WITH e0 AS (SELECT doc_id % 40 AS src,
                      (doc_id * 7 + doc_id // 40) % 40 AS dst
               FROM documents),
       e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
       outd AS (SELECT src AS host, count(*) AS out_deg FROM e GROUP BY src),
       ind AS (SELECT dst AS host, count(*) AS in_deg FROM e GROUP BY dst),
       rec AS (SELECT a.src AS host, count(*) AS recip
               FROM e a JOIN e b ON a.src = b.dst AND a.dst = b.src
               GROUP BY a.src),
       m AS (SELECT o.host, o.out_deg,
                    coalesce(i.in_deg, 0) AS in_deg,
                    coalesce(r.recip, 0) AS recip
             FROM outd o
             LEFT JOIN ind i ON i.host = o.host
             LEFT JOIN rec r ON r.host = o.host)
       SELECT host, CAST(out_deg AS BIGINT) AS out_deg,
              CAST(in_deg AS BIGINT) AS in_deg,
              CAST(recip AS BIGINT) AS recip,
              CAST(CASE WHEN 2 * recip >= out_deg AND out_deg >= 3
                   THEN 1 ELSE 0 END AS BIGINT) AS spam_flag
       FROM m""",
)
def q257(spark, sf_dir):
    """Link-farm signals over the host graph (the web-spam features a
    crawl-curation pipeline feeds its domain classifier): distinct
    out/in degree and RECIPROCAL edge count (a->b and b->a — the
    link-exchange fingerprint) via one reversed self-equi-join; flag
    = reciprocity covering >= half the out-links with out-degree >=
    3, exact integer cross-multiplication.  Edges dedup on (src,
    dst), the reversed join keys on the same pair — everything
    shuffles on host pairs, linear in the edge list at 10^12 pages."""
    e = (
        _t(spark, sf_dir, "documents")
        .selectExpr(
            "doc_id % 40 AS src",
            "(doc_id * 7 + doc_id div 40) % 40 AS dst")
        .filter("src <> dst").distinct()
        .localCheckpoint(eager=True)
    )
    outd = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    ind = e.groupBy("dst").agg(F.count("*").alias("in_deg"))
    rev = e.selectExpr("dst AS src", "src AS dst")
    rec = e.join(rev, ["src", "dst"]).groupBy("src").agg(
        F.count("*").alias("recip"))
    m = (
        outd.withColumnRenamed("src", "host")
        .join(ind.withColumnRenamed("dst", "host"), "host", "left")
        .join(rec.withColumnRenamed("src", "host"), "host", "left")
        .fillna(0, ["in_deg", "recip"])
    )
    return m.select(
        "host",
        F.col("out_deg").cast("long").alias("out_deg"),
        F.col("in_deg").cast("long").alias("in_deg"),
        F.col("recip").cast("long").alias("recip"),
        F.when((2 * F.col("recip") >= F.col("out_deg"))
               & (F.col("out_deg") >= 3), 1).otherwise(0)
        .cast("long").alias("spam_flag"),
    )


# --- FM-index backward-search pattern count (q258) -----------------------------------

_FM_PATTERNS = ["the", "row", "zzz"]  # two corpus words + one miss


def _fm_oracle_sql() -> str:
    pats = ", ".join(f"('{p}')" for p in _FM_PATTERNS)
    return f"""WITH {_SA_CORPUS_CTE},
       pat(p) AS (VALUES {pats}),
       hit AS (SELECT pat.p, count(*) AS n_occ,
                      min(sa.rnk) AS lo, max(sa.rnk) AS hi
               FROM pat JOIN sa
                 ON substr((SELECT corpus FROM c), sa.pos,
                           length(pat.p)) = pat.p
               GROUP BY pat.p)
       SELECT pat.p AS pattern,
              CAST(coalesce(h.n_occ, 0) AS BIGINT) AS n_occ,
              CAST(coalesce(h.lo, 0) AS BIGINT) AS lo,
              CAST(coalesce(h.hi, -1) AS BIGINT) AS hi
       FROM pat LEFT JOIN hit h ON h.p = pat.p"""


@query("q258_fm_index_count", _fm_oracle_sql())
def q258(spark, sf_dir):
    """FM-index pattern counting by BWT backward search (Ferragina &
    Manzini 2000) over the q236 suffix array: BWT[r] =
    corpus[SA[r]-1] (wrap) via one position join; a pattern's match
    set is a CONTIGUOUS suffix-rank range maintained right-to-left
    with l' = C(c) + occ(c, l), r' = C(c) + occ(c, r) — C from the
    corpus char histogram, occ via rank-bounded counts on the BWT
    table.  The search state is two integers (log-depth serving over
    the distributed index — the index BUILD is the heavy distributed
    part); the oracle counts pattern occurrences by direct substring
    compare and must land on the identical (count, lo, hi) rank
    range.  Patterns: two corpus words + one guaranteed miss."""
    from gdal_spark.operators.suffix import suffix_array

    chars, _, n = _sa_fixture(spark, sf_dir)
    sa = suffix_array(chars, n)
    bwt = (
        sa.join(
            chars.selectExpr("pos AS ppos", "ch"),
            F.col("ppos") == F.when(F.col("pos") == 1, n)
                              .otherwise(F.col("pos") - 1),
        )
        .selectExpr("rnk - 1 AS r0", "ch")
        .localCheckpoint(eager=True)
    )
    hist = {r["ch"]: r["c"]
            for r in chars.groupBy("ch").agg(F.count("*").alias("c"))
            .collect()}
    cs = {}
    run = 0
    for ch in sorted(hist):
        cs[ch] = run
        run += hist[ch]
    # backward search is sequential in DEPTH but independent across
    # patterns: one aggregation job per depth serves every pattern's
    # two occ() probes at once (a broadcast (pattern, char, l, r)
    # bounds table joined to the BWT on char, conditional sums)
    state = {p: (0, n) for p in _FM_PATTERNS}
    max_len = max(len(p) for p in _FM_PATTERNS)
    for depth in range(1, max_len + 1):
        bounds = []
        for p, (l, r) in state.items():
            if r <= l or depth > len(p):
                continue
            c = p[-depth]
            if c not in cs:
                state[p] = (0, 0)
                continue
            bounds.append((p, c, l, r))
        if not bounds:
            continue
        bdf = spark.createDataFrame(
            bounds, "pat STRING, c STRING, l BIGINT, r BIGINT")
        occ = {
            row["pat"]: (row["ol"], row["or"])
            for row in bwt.join(F.broadcast(bdf), F.col("ch") == F.col("c"))
            .groupBy("pat", "c", "l", "r")
            .agg(
                F.sum(F.when(F.col("r0") < F.col("l"), 1).otherwise(0))
                .alias("ol"),
                F.sum(F.when(F.col("r0") < F.col("r"), 1).otherwise(0))
                .alias("or"),
            ).collect()
        }
        for p, c, l, r in bounds:
            ol, orr = occ.get(p, (0, 0))
            nl, nr = cs[c] + ol, cs[c] + orr
            state[p] = (nl, nr) if nl < nr else (0, 0)
    rows = []
    for p in _FM_PATTERNS:
        l, r = state[p]
        if r > l:
            rows.append((p, r - l, l + 1, r))
        else:
            rows.append((p, 0, 0, -1))
    return spark.createDataFrame(
        rows, "pattern STRING, n_occ BIGINT, lo BIGINT, hi BIGINT")


# --- raster set-type: GDALCopyWord conversion rules (q259) ---------------------------


@query(
    "q259_raster_set_type",
    """WITH g AS (SELECT gx.range AS gx, gy.range AS gy
                   FROM range(128) gx, range(128) gy),
       px AS (SELECT gx, gy,
                 CASE WHEN (gx + gy) % 61 = 0 THEN CAST('NaN' AS DOUBLE)
                      ELSE CAST((gx*31 + gy*17) % 600 AS DOUBLE) / 7.0
                           - 30.0 END AS v
              FROM g),
       conv AS (SELECT gx, gy, v,
                 CASE WHEN isnan(v) THEN 0
                      ELSE CAST(floor(least(greatest(v + 0.5, 0.0), 255.0))
                           AS BIGINT) END AS b,
                 CASE WHEN isnan(v * 1000.0) THEN 0
                      ELSE CAST(CASE
                        WHEN least(greatest(CASE WHEN v * 1000.0 > 0.0
                                    THEN v * 1000.0 + 0.5
                                    ELSE v * 1000.0 - 0.5 END,
                                -32768.0), 32767.0) >= 0.0
                        THEN floor(least(greatest(CASE WHEN v * 1000.0 > 0.0
                                    THEN v * 1000.0 + 0.5
                                    ELSE v * 1000.0 - 0.5 END,
                                -32768.0), 32767.0))
                        ELSE -floor(-least(greatest(CASE WHEN v * 1000.0 > 0.0
                                    THEN v * 1000.0 + 0.5
                                    ELSE v * 1000.0 - 0.5 END,
                                -32768.0), 32767.0))
                        END AS BIGINT) END AS i16
              FROM px)
       SELECT b, i16, CAST(count(*) AS BIGINT) AS n_px,
              round(min(v), 6) AS v_lo, round(max(v), 6) AS v_hi
       FROM conv GROUP BY b, i16""",
)
def q259(spark, sf_dir):
    """gdal raster set-type under the reference's EXACT GDALCopyWord
    conversion rules (gcore/gdal_priv_templates.hpp:433-710):
    float->unsigned (Byte): NaN -> 0, else truncate(clamp(v + 0.5,
    0, 255)) — round-half-up with saturation; float->signed (Int16):
    NaN -> 0, else truncate(clamp(v > 0 ? v + 0.5 : v - 0.5, -32768,
    32767)) — round half AWAY FROM ZERO (the signed rule differs
    from the unsigned one on purpose, :640-708).  Truncation is
    spelled floor/-floor(-x) so DuckDB's rounding CAST never enters;
    the v*1000 channel exercises both saturation rails.  One JVM
    projection + a histogram groupBy."""
    g = spark.range(128).selectExpr("id AS gx").crossJoin(
        spark.range(128).selectExpr("id AS gy"))
    px = g.selectExpr(
        "gx", "gy",
        "CASE WHEN (gx + gy) % 61 = 0 THEN CAST('NaN' AS DOUBLE) "
        "ELSE CAST((gx*31 + gy*17) % 600 AS DOUBLE) / 7.0 - 30.0 END AS v",
    )
    w = F.col("v") * 1000.0
    half_away = F.when(w > 0.0, w + 0.5).otherwise(w - 0.5)
    cl = F.least(F.greatest(half_away, F.lit(-32768.0)), F.lit(32767.0))
    trunc = F.when(cl >= 0.0, F.floor(cl)).otherwise(-F.floor(-cl))
    conv = px.select(
        "v",
        F.when(F.isnan("v"), 0).otherwise(
            F.floor(F.least(F.greatest(F.col("v") + 0.5, F.lit(0.0)),
                            F.lit(255.0)))
        ).cast("long").alias("b"),
        F.when(F.isnan(w), 0).otherwise(trunc).cast("long").alias("i16"),
    )
    return conv.groupBy("b", "i16").agg(
        F.count("*").cast("long").alias("n_px"),
        F.round(F.min("v"), 6).alias("v_lo"),
        F.round(F.max("v"), 6).alias("v_hi"),
    )


# --- raster update: window overwrite with nodata transparency (q260) -----------------


@query(
    "q260_raster_update",
    """WITH g AS (SELECT gx.range AS gx, gy.range AS gy
                   FROM range(128) gx, range(128) gy),
       a AS (SELECT gx, gy, (gx*7 + gy*13) % 97 AS v FROM g),
       b AS (SELECT px.range AS bx, py.range AS by,
                    (px.range*5 + py.range*3) % 11 AS v
             FROM range(32) px, range(32) py),
       upd AS (SELECT a.gx, a.gy, a.v AS old_v,
                  CASE WHEN b.v IS NOT NULL AND b.v <> 7
                       THEN b.v ELSE a.v END AS new_v
               FROM a LEFT JOIN b
                 ON b.bx = a.gx - 40 AND b.by = a.gy - 60)
       SELECT CAST(sum(CASE WHEN new_v <> old_v THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_changed,
              CAST(sum(new_v) AS BIGINT) AS sum_new,
              CAST(sum(old_v) AS BIGINT) AS sum_old,
              CAST(sum(CASE WHEN gx >= 40 AND gx < 72 AND gy >= 60
                             AND gy < 92 AND new_v = old_v
                        THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_transparent_or_equal
       FROM upd""",
)
def q260(spark, sf_dir):
    """gdal raster update (apps/gdalalg_raster_update.cpp): burn an
    update raster into a base raster at a window offset, with the
    update's nodata (7) transparent — out = patch value where the
    patch covers and is valid, else the base.  One broadcast left
    join on shifted coordinates (the patch side is small by
    definition; at scale the join keys on tile ids and only
    patch-intersecting tiles rewrite — the manifest-compaction
    pattern).  Emits the change audit a cautious update job logs."""
    g = spark.range(128).selectExpr("id AS gx").crossJoin(
        spark.range(128).selectExpr("id AS gy"))
    a = g.selectExpr("gx", "gy", "(gx*7 + gy*13) % 97 AS v")
    b = (
        spark.range(32).selectExpr("id AS bx").crossJoin(
            spark.range(32).selectExpr("id AS by"))
        .selectExpr("bx", "by", "(bx*5 + by*3) % 11 AS bv")
    )
    upd = a.join(
        F.broadcast(b),
        (F.col("bx") == F.col("gx") - 40) & (F.col("by") == F.col("gy") - 60),
        "left",
    ).select(
        "gx", "gy", F.col("v").alias("old_v"),
        F.when(F.col("bv").isNotNull() & (F.col("bv") != 7), F.col("bv"))
        .otherwise(F.col("v")).alias("new_v"),
    )
    inpatch = ((F.col("gx") >= 40) & (F.col("gx") < 72)
               & (F.col("gy") >= 60) & (F.col("gy") < 92))
    return upd.agg(
        F.sum(F.when(F.col("new_v") != F.col("old_v"), 1).otherwise(0))
        .cast("long").alias("n_changed"),
        F.sum("new_v").cast("long").alias("sum_new"),
        F.sum("old_v").cast("long").alias("sum_old"),
        F.sum(F.when(inpatch & (F.col("new_v") == F.col("old_v")), 1)
              .otherwise(0)).cast("long").alias("n_transparent_or_equal"),
    )


# --- raster nodata-to-alpha (q261) ----------------------------------------------------


@query(
    "q261_nodata_to_alpha",
    """WITH g AS (SELECT gx.range AS gx, gy.range AS gy
                   FROM range(128) gx, range(128) gy),
       px AS (SELECT gx, gy, (gx*7 + gy*13) % 97 AS v FROM g),
       al AS (SELECT gx, gy, v,
                 CASE WHEN v = 42 THEN 0 ELSE 255 END AS alpha
              FROM px)
       SELECT CAST(alpha AS BIGINT) AS alpha,
              CAST(count(*) AS BIGINT) AS n_px,
              CAST(min(v) AS BIGINT) AS v_lo,
              CAST(max(v) AS BIGINT) AS v_hi
       FROM al GROUP BY alpha""",
)
def q261(spark, sf_dir):
    """gdal raster nodata-to-alpha (apps/gdalalg_raster_nodata_to_
    alpha.cpp): append an alpha band that is 0 exactly where the band
    equals its nodata value (42) and 255 elsewhere — the conversion
    that lets a mosaic compositor treat nodata as transparency.  One
    JVM projection; emitted as the alpha histogram with the value
    span per class."""
    g = spark.range(128).selectExpr("id AS gx").crossJoin(
        spark.range(128).selectExpr("id AS gy"))
    px = g.selectExpr("gx", "gy", "(gx*7 + gy*13) % 97 AS v")
    al = px.withColumn(
        "alpha", F.when(F.col("v") == 42, 0).otherwise(255))
    return al.groupBy("alpha").agg(
        F.count("*").cast("long").alias("n_px"),
        F.min("v").cast("long").alias("v_lo"),
        F.max("v").cast("long").alias("v_hi"),
    ).select(F.col("alpha").cast("long").alias("alpha"),
             "n_px", "v_lo", "v_hi")


# --- vector check-geometry: per-ring validity flags (q262) ---------------------------

_CHKGEO_RING_SQL = """
    CASE id % 5
      WHEN 1 THEN [x0, x0+4, x0+4, x0, x0]
      WHEN 2 THEN [x0, x0+4, x0+4, x0+4, x0, x0]
      WHEN 3 THEN [x0, x0+4, x0+4, x0]
      WHEN 4 THEN [x0, x0+4, x0]
      ELSE [x0, x0+4, x0+4, x0, x0] END AS xs,
    CASE id % 5
      WHEN 1 THEN [y0, y0+4, y0, y0+4, y0]
      WHEN 2 THEN [y0, y0, y0, y0+4, y0+4, y0]
      WHEN 3 THEN [y0, y0, y0+4, y0+4]
      WHEN 4 THEN [y0, y0, y0]
      ELSE [y0, y0, y0+4, y0+4, y0] END AS ys
"""


@query(
    "q262_check_geometry",
    f"""WITH f AS (SELECT k.range AS id,
                      (k.range * 13) % 50 AS x0, (k.range * 17) % 50 AS y0
               FROM range(50) k),
       r AS (SELECT id, {_CHKGEO_RING_SQL} FROM f),
       m AS (SELECT id, xs, ys, len(xs) AS np FROM r),
       ed AS (SELECT id, i,
                 xs[i] AS ax, ys[i] AS ay, xs[i+1] AS bx, ys[i+1] AS by
              FROM (SELECT id, xs, ys,
                       unnest([i for i in range(1, 10)
                               if i < len(xs)]) AS i
                    FROM m)),
       dup AS (SELECT id, max(CASE WHEN ax = bx AND ay = by
                             THEN 1 ELSE 0 END) AS has_dup
               FROM ed GROUP BY id),
       xp AS (SELECT a.id,
                 max(CASE WHEN
                   ((a.bx-a.ax)*(b.ay-a.ay) - (a.by-a.ay)*(b.ax-a.ax)) *
                   ((a.bx-a.ax)*(b.by-a.ay) - (a.by-a.ay)*(b.bx-a.ax)) < 0
                   AND
                   ((b.bx-b.ax)*(a.ay-b.ay) - (b.by-b.ay)*(a.ax-b.ax)) *
                   ((b.bx-b.ax)*(a.by-b.ay) - (b.by-b.ay)*(a.bx-b.ax)) < 0
                   THEN 1 ELSE 0 END) AS has_x
              FROM ed a JOIN ed b
                ON a.id = b.id AND a.i < b.i
               AND NOT ((a.ax = b.ax AND a.ay = b.ay)
                     OR (a.ax = b.bx AND a.ay = b.by)
                     OR (a.bx = b.ax AND a.by = b.ay)
                     OR (a.bx = b.bx AND a.by = b.by))
              GROUP BY a.id),
       fl AS (SELECT m.id,
                 CASE WHEN m.xs[1] = m.xs[m.np] AND m.ys[1] = m.ys[m.np]
                      THEN 1 ELSE 0 END AS closed,
                 CASE WHEN m.np >= 5 THEN 1 ELSE 0 END AS enough_pts,
                 1 - coalesce(d.has_dup, 0) AS no_dup,
                 1 - coalesce(x.has_x, 0) AS no_selfx
              FROM m
              LEFT JOIN dup d ON d.id = m.id
              LEFT JOIN xp x ON x.id = m.id)
       SELECT id, CAST(closed AS BIGINT) AS closed,
              CAST(enough_pts AS BIGINT) AS enough_pts,
              CAST(no_dup AS BIGINT) AS no_dup,
              CAST(no_selfx AS BIGINT) AS no_selfx,
              CAST(closed * enough_pts * no_dup * no_selfx AS BIGINT)
                  AS valid
       FROM fl""",
)
def q262(spark, sf_dir):
    """gdal vector check-geometry (apps/gdalalg_vector_check_geometry
    .cpp; OGC Simple Features §6.1.11 ring rules): per-feature flags
    for ring closure, minimum point count (>= 4 distinct + closing),
    duplicate consecutive vertices, and PROPER self-intersection via
    the exact integer double-orientation test (d1*d2 < 0 and
    d3*d4 < 0 on cross products, endpoint-sharing edge pairs
    excluded).  The fixture cycles five shapes: valid square, bowtie
    (crossing), repeated vertex, unclosed ring, degenerate 3-point
    ring — each flag fires on a known id class.  Edge pairs explode
    per feature (bounded by ring vertex count); all predicates
    integer-exact."""
    f = spark.range(50).selectExpr(
        "id", "(id * 13) % 50 AS x0", "(id * 17) % 50 AS y0")
    r = f.selectExpr(
        "id",
        """CASE CAST(id % 5 AS INT)
          WHEN 1 THEN array(x0, x0+4, x0+4, x0, x0)
          WHEN 2 THEN array(x0, x0+4, x0+4, x0+4, x0, x0)
          WHEN 3 THEN array(x0, x0+4, x0+4, x0)
          WHEN 4 THEN array(x0, x0+4, x0)
          ELSE array(x0, x0+4, x0+4, x0, x0) END AS xs""",
        """CASE CAST(id % 5 AS INT)
          WHEN 1 THEN array(y0, y0+4, y0, y0+4, y0)
          WHEN 2 THEN array(y0, y0, y0, y0+4, y0+4, y0)
          WHEN 3 THEN array(y0, y0, y0+4, y0+4)
          WHEN 4 THEN array(y0, y0, y0)
          ELSE array(y0, y0, y0+4, y0+4, y0) END AS ys""",
    )
    m = r.selectExpr("id", "xs", "ys", "size(xs) AS np")
    ed = m.selectExpr(
        "id", "explode(sequence(1, size(xs) - 1)) AS i", "xs", "ys"
    ).selectExpr(
        "id", "i",
        "element_at(xs, i) AS ax", "element_at(ys, i) AS ay",
        "element_at(xs, i + 1) AS bx", "element_at(ys, i + 1) AS by",
    ).localCheckpoint(eager=True)
    dup = ed.groupBy("id").agg(
        F.max(F.when((F.col("ax") == F.col("bx"))
                     & (F.col("ay") == F.col("by")), 1).otherwise(0))
        .alias("has_dup"))
    a = ed
    b = ed.selectExpr("id", "i AS j", "ax AS cx", "ay AS cy",
                      "bx AS dx", "by AS dy")
    share = (
        ((F.col("ax") == F.col("cx")) & (F.col("ay") == F.col("cy")))
        | ((F.col("ax") == F.col("dx")) & (F.col("ay") == F.col("dy")))
        | ((F.col("bx") == F.col("cx")) & (F.col("by") == F.col("cy")))
        | ((F.col("bx") == F.col("dx")) & (F.col("by") == F.col("dy")))
    )
    d1 = ((F.col("bx") - F.col("ax")) * (F.col("cy") - F.col("ay"))
          - (F.col("by") - F.col("ay")) * (F.col("cx") - F.col("ax")))
    d2 = ((F.col("bx") - F.col("ax")) * (F.col("dy") - F.col("ay"))
          - (F.col("by") - F.col("ay")) * (F.col("dx") - F.col("ax")))
    d3 = ((F.col("dx") - F.col("cx")) * (F.col("ay") - F.col("cy"))
          - (F.col("dy") - F.col("cy")) * (F.col("ax") - F.col("cx")))
    d4 = ((F.col("dx") - F.col("cx")) * (F.col("by") - F.col("cy"))
          - (F.col("dy") - F.col("cy")) * (F.col("bx") - F.col("cx")))
    xp = (
        a.join(b, "id").filter((F.col("i") < F.col("j")) & ~share)
        .groupBy("id")
        .agg(F.max(F.when((d1 * d2 < 0) & (d3 * d4 < 0), 1).otherwise(0))
             .alias("has_x"))
    )
    fl = (
        m.join(dup, "id", "left").join(xp, "id", "left")
        .selectExpr(
            "id",
            "CASE WHEN element_at(xs, 1) = element_at(xs, np) AND "
            "element_at(ys, 1) = element_at(ys, np) THEN 1 ELSE 0 END"
            " AS closed",
            "CASE WHEN np >= 5 THEN 1 ELSE 0 END AS enough_pts",
            "1 - coalesce(has_dup, 0) AS no_dup",
            "1 - coalesce(has_x, 0) AS no_selfx",
        )
    )
    return fl.select(
        "id",
        F.col("closed").cast("long").alias("closed"),
        F.col("enough_pts").cast("long").alias("enough_pts"),
        F.col("no_dup").cast("long").alias("no_dup"),
        F.col("no_selfx").cast("long").alias("no_selfx"),
        (F.col("closed") * F.col("enough_pts") * F.col("no_dup")
         * F.col("no_selfx")).cast("long").alias("valid"),
    )


# --- vector dissolve by attribute (q263) ----------------------------------------------


@query(
    "q263_vector_dissolve",
    """WITH RECURSIVE rct AS (SELECT k.range AS id, k.range % 5 AS grp,
                    (k.range * 7) % 30 AS x0, (k.range * 11) % 30 AS y0,
                    (k.range * 7) % 30 + 3 + k.range % 4 AS x1,
                    (k.range * 11) % 30 + 3 + k.range % 3 AS y1
             FROM range(60) k),
       cell AS (SELECT gx.range AS cx, gy.range AS cy
                FROM range(36) gx, range(36) gy),
       cov AS (SELECT DISTINCT r.grp, c.cx, c.cy
               FROM cell c JOIN rct r
                 ON c.cx >= r.x0 AND c.cx < r.x1
                AND c.cy >= r.y0 AND c.cy < r.y1),
       area AS (SELECT grp, count(*) AS union_area FROM cov GROUP BY grp),
       adj AS (SELECT a.grp, a.id AS ai, b.id AS bi
               FROM rct a JOIN rct b
                 ON a.grp = b.grp
                AND a.x0 <= b.x1 AND b.x0 <= a.x1
                AND a.y0 <= b.y1 AND b.y0 <= a.y1),
       lab AS (SELECT grp, id AS node, id AS lbl FROM rct
               UNION
               SELECT a.grp, a.ai, l.lbl
               FROM lab l JOIN adj a ON a.grp = l.grp AND a.bi = l.node),
       comp AS (SELECT grp, node, min(lbl) AS root FROM lab
                GROUP BY grp, node),
       parts AS (SELECT grp, count(DISTINCT root) AS n_parts
                 FROM comp GROUP BY grp),
       cnt AS (SELECT grp, count(*) AS n_rects FROM rct GROUP BY grp)
       SELECT c.grp, CAST(c.n_rects AS BIGINT) AS n_rects,
              CAST(a.union_area AS BIGINT) AS union_area,
              CAST(p.n_parts AS BIGINT) AS n_parts
       FROM cnt c JOIN area a ON a.grp = c.grp
       JOIN parts p ON p.grp = c.grp""",
)
def q263(spark, sf_dir):
    """gdal vector dissolve (apps/gdalalg_vector_dissolve semantics —
    ogr2ogr's GROUP BY + ST_Union): merge every feature sharing an
    attribute into one multipolygon, reporting exact union AREA
    (distinct covered unit cells — correct under arbitrary overlap)
    and the number of connected PARTS (components of the
    touch-or-overlap graph over rects: closed-interval bbox
    intersection, min-label propagation — engine: capped pointer
    rounds; oracle: recursive CTE to fixpoint, the q251 pattern).
    Area counting shuffles on (grp, cell), component finding on the
    per-group rect graph — the group key shards both at scale."""
    rct = spark.range(60).selectExpr(
        "id", "id % 5 AS grp",
        "(id * 7) % 30 AS x0", "(id * 11) % 30 AS y0",
        "(id * 7) % 30 + 3 + id % 4 AS x1",
        "(id * 11) % 30 + 3 + id % 3 AS y1",
    ).localCheckpoint(eager=True)
    cell = spark.range(36).selectExpr("id AS cx").crossJoin(
        spark.range(36).selectExpr("id AS cy"))
    cov = (
        cell.join(
            F.broadcast(rct),
            (F.col("cx") >= F.col("x0")) & (F.col("cx") < F.col("x1"))
            & (F.col("cy") >= F.col("y0")) & (F.col("cy") < F.col("y1")),
        )
        .select("grp", "cx", "cy").distinct()
    )
    area = cov.groupBy("grp").agg(F.count("*").alias("union_area"))
    a = rct.selectExpr("grp", "id AS ai", "x0", "y0", "x1", "y1")
    b = rct.selectExpr("grp AS grpb", "id AS bi", "x0 AS bx0", "y0 AS by0",
                       "x1 AS bx1", "y1 AS by1")
    adj = (
        a.join(b, (F.col("grp") == F.col("grpb"))
               & (F.col("x0") <= F.col("bx1")) & (F.col("bx0") <= F.col("x1"))
               & (F.col("y0") <= F.col("by1")) & (F.col("by0") <= F.col("y1")))
        .select("grp", "ai", "bi")
        .localCheckpoint(eager=True)
    )
    lbl = rct.selectExpr("grp", "id AS node", "id AS lbl")
    lbl = lbl.localCheckpoint(eager=True)
    for _round in range(16):
        nxt = (
            adj.join(lbl.selectExpr("grp AS g2", "node AS bi2", "lbl AS lb"),
                     (F.col("grp") == F.col("g2"))
                     & (F.col("bi") == F.col("bi2")))
            .groupBy("grp", "ai").agg(F.min("lb").alias("nmin"))
        )
        merged = (
            lbl.join(nxt, (lbl.grp == nxt.grp) & (lbl.node == nxt.ai), "left")
            .select(lbl.grp, lbl.node,
                    F.least(lbl.lbl, F.coalesce("nmin", lbl.lbl)).alias("lbl"))
            .localCheckpoint(eager=True)
        )
        changed = (
            merged.selectExpr("grp", "node", "lbl AS l2")
            .join(lbl, ["grp", "node"]).filter("l2 <> lbl").count()
        )
        lbl.unpersist()
        lbl = merged
        if changed == 0:
            break
    else:
        raise RuntimeError("q263 dissolve components did not converge")
    parts = (
        lbl.groupBy("grp").agg(F.countDistinct("lbl").alias("n_parts")))
    cnt = rct.groupBy("grp").agg(F.count("*").alias("n_rects"))
    return (
        cnt.join(area, "grp").join(parts, "grp")
        .select("grp",
                F.col("n_rects").cast("long").alias("n_rects"),
                F.col("union_area").cast("long").alias("union_area"),
                F.col("n_parts").cast("long").alias("n_parts"))
    )


# --- gdaldem aspect (azimuth degrees) + slope percent (q264-q265) --------------------


def _aspect_sql(p: str, q: str) -> str:
    """GDALAspectAlg (apps/gdaldem_lib.cpp) over exact p,q: reference
    dx = 8p, dy = 8q; azimuth convention; flat -> -9999."""
    a = f"(atan2(8.0 * {q}, -(8.0 * {p})) * {_IG_R2D})"
    az = f"(CASE WHEN {a} > 90.0 THEN 450.0 - {a} ELSE 90.0 - {a} END)"
    az0 = f"(CASE WHEN {az} = 360.0 THEN 0.0 ELSE {az} END)"
    return (f"(CASE WHEN {p} = 0.0 AND {q} = 0.0 THEN -9999.0 "
            f"ELSE {az0} END)")


@query(
    "q264_dem_aspect_degrees",
    f"""WITH g AS ({_DEM_G}),
       pq AS (SELECT gx, gy, {_P_SQL} AS p, {_Q_SQL} AS q FROM g)
       SELECT gx, gy, round({_aspect_sql('p', 'q')}, 3) AS aspect
       FROM pq""",
)
def q264(spark, sf_dir):
    """gdaldem aspect in AZIMUTH DEGREES (GDALAspectAlg,
    apps/gdaldem_lib.cpp — the exact-value companion to q74's
    transcendental-free octant classification): aspect =
    atan2(dy, -dx) * 180/pi with the azimuth flip (>90 -> 450-a else
    90-a), 360 -> 0, flat cells -> -9999.  Same strategy as
    q246/q247: exact dyadic Horn gradients from the halo kernel, the
    SAME expression string compiled by both engines, round(3)
    in-query with the rounding-margin pytest making last-ulp libm
    drift harmless."""
    from gdal_spark.operators.focal import horn_pq_tiles

    pq = horn_pq_tiles(_dem_tiles(spark), DEM_TILE, DEM_W, DEM_H)
    return pq.select(
        "gx", "gy",
        F.round(F.expr(_aspect_sql("p", "q")), 3).alias("aspect"),
    )


@query(
    "q265_dem_slope_percent",
    f"""WITH g AS ({_DEM_G}),
       pq AS (SELECT gx, gy, {_P_SQL} AS p, {_Q_SQL} AS q FROM g)
       SELECT gx, gy,
              round(100.0 * sqrt(64.0 * (p*p) + 64.0 * (q*q)) * 0.125, 6)
                  AS slope_pct
       FROM pq""",
)
def q265(spark, sf_dir):
    """gdaldem slope -p (percent slope, GDALSlopeHornAlg percent
    branch): 100 * sqrt(dx^2 + dy^2) / (8 * res) with dx = 8p,
    dy = 8q — arithmetic plus one IEEE sqrt over exact dyadic
    gradients, bitwise across engines with no transcendental at all
    (the DEGREES branch needs atan and is covered by the q70 family;
    percent completes the flag surface)."""
    from gdal_spark.operators.focal import horn_pq_tiles

    pq = horn_pq_tiles(_dem_tiles(spark), DEM_TILE, DEM_W, DEM_H)
    return pq.select(
        "gx", "gy",
        F.round(
            F.expr("100.0 * sqrt(64.0 * (p*p) + 64.0 * (q*q)) * 0.125"), 6
        ).alias("slope_pct"),
    )


# --- hard-negative mining for embedding training (q266) ------------------------------


@query(
    "q266_hard_negatives",
    """WITH v AS (SELECT vec_id, label,
                list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE)*1000 + 0.5) AS BIGINT))
                    AS qv
             FROM embeddings),
       q AS (SELECT vec_id AS qid, label AS qlab, qv AS qqv FROM v
             WHERE vec_id % 10 = 0),
       pr AS (SELECT q.qid, v.vec_id AS cand,
                 CAST(list_sum(list_transform(list_zip(q.qqv, v.qv),
                      s -> s[1]*s[2])) AS BIGINT) AS dot
              FROM q JOIN v ON v.label <> q.qlab),
       best AS (SELECT qid, max(dot * 100000 + (99999 - cand)) AS code
                FROM pr GROUP BY qid)
       SELECT b.qid,
              CAST(99999 - (b.code % 100000) AS BIGINT) AS neg_id,
              CAST((b.code - (b.code % 100000)) // 100000 AS BIGINT)
                  AS neg_dot
       FROM best b""",
)
def q266(spark, sf_dir):
    """Hard-negative mining (the contrastive-training data op an
    embedding pipeline runs per epoch): for each query vector, the
    DIFFERENT-label candidate with maximum integer-quantized inner
    product, ties to the lowest candidate id — encoded as the single
    integer argmax dot*100000 + (99999 - cand), map-side combinable,
    no window over the candidate table.  The query side broadcasts;
    candidate work is |Q| x |C| inside each partition (at 10^12 scale
    the candidate side pre-filters through the q127 IVF cells, the
    SemDeDup pattern — the mining rule itself is unchanged)."""
    v = _t(spark, sf_dir, "embeddings").selectExpr(
        "vec_id", "label",
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*1000 "
        "+ 0.5) AS BIGINT)) AS qv",
    )
    q = v.filter("vec_id % 10 = 0").selectExpr(
        "vec_id AS qid", "label AS qlab", "qv AS qqv")
    pr = (
        F.broadcast(q).join(v, F.col("label") != F.col("qlab"))
        .selectExpr(
            "qid", "vec_id AS cand",
            "aggregate(zip_with(qqv, qv, (x, y) -> x*y), "
            "CAST(0 AS BIGINT), (a, x) -> a + x) AS dot",
        )
    )
    best = pr.groupBy("qid").agg(
        F.max(F.col("dot") * 100000 + (99999 - F.col("cand"))).alias("code"))
    return best.select(
        "qid",
        (99999 - (F.col("code") % 100000)).cast("long").alias("neg_id"),
        F.floor((F.col("code") - (F.col("code") % 100000)) / 100000)
            .cast("long").alias("neg_dot"),
    )


# --- tokenizer fertility statistics (q267) --------------------------------------------


@query(
    "q267_tokenizer_fertility",
    _bpe_oracle_sql(
        _BPE_ROUNDS,
        f"""SELECT CAST(len([s for s in string_split(trim(syms), ' ')
                           if s <> '']) AS BIGINT) AS n_pieces,
              CAST(count(*) AS BIGINT) AS n_words,
              CAST(sum(cnt) AS BIGINT) AS n_occurrences,
              CAST(sum(cnt * length(word)) AS BIGINT) AS n_chars
       FROM w{_BPE_ROUNDS} GROUP BY 1""",
    ),
)
def q267(spark, sf_dir):
    """Tokenizer FERTILITY statistics (tokens-per-word — the metric
    that decides whether a trained tokenizer ships): after the q231
    BPE merges, group the vocabulary by final piece count and emit
    corpus-weighted word/occurrence/char masses per fertility class.
    Mean fertility = sum(n_pieces * n_occurrences) / sum(n_occ) falls
    out of the emitted integers exactly.  Same vocabulary-bounded
    working set as q231/q233; re-tokenizing the corpus is never
    needed for the statistic."""
    from gdal_spark.operators.bpe import train_bpe_state, word_vocab

    v = word_vocab(_t(spark, sf_dir, "documents"))
    merges, w = train_bpe_state(v, _BPE_ROUNDS)
    out = (
        w.selectExpr(
            "size(filter(split(trim(syms), ' '), s -> s != '')) AS n_pieces",
            "cnt", "word",
        )
        .groupBy("n_pieces")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("cnt").cast("long").alias("n_occurrences"),
            F.sum(F.col("cnt") * F.length("word")).cast("long")
                .alias("n_chars"),
        )
        .select(F.col("n_pieces").cast("long").alias("n_pieces"),
                "n_words", "n_occurrences", "n_chars")
    )
    res = out.localCheckpoint(eager=True)
    w.unpersist()
    return res


# --- 5x5 binomial smoothing, radius-2 halo (q268) -------------------------------------

_BINOM5 = [1, 4, 6, 4, 1]


def _binom5_oracle_terms() -> str:
    terms = []
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            w = _BINOM5[dx + 2] * _BINOM5[dy + 2]
            terms.append(f"{w}*{_z_sql(f'gx+{dx}', f'gy+{dy}')}")
    return " + ".join(terms)


@query(
    "q268_binomial_smooth5",
    f"""WITH g AS ({_DEM_G}),
       i AS (SELECT gx, gy FROM g
             WHERE gx >= 2 AND gx < 126 AND gy >= 2 AND gy < 126),
       s AS (SELECT gx, gy,
                CAST({_binom5_oracle_terms()} AS DOUBLE) / 256.0 AS sm
             FROM i)
       SELECT gx, gy, sm FROM s WHERE sm <> 0""",
)
def q268(spark, sf_dir):
    """5x5 binomial (Gaussian-approximating) smoothing — the
    VRTKernelFilteredSource arbitrary-size kernel path
    (frmts/vrt/vrtfilters.cpp) beyond the 3x3 q227 set: weights are
    the outer product of [1,4,6,4,1] summing to 256, so the
    normalization is DYADIC-exact (division by 2^8 is lossless in
    float64 for integer sums).  Exercises the RADIUS-2 halo exchange
    (each tile task reads a 2-pixel ring from up to 8 neighbor
    strips); the oracle is the fully unrolled 25-term weighted sum.
    Interior-only output (gx, gy in [2, 126))."""
    import numpy as np  # noqa: F811
    from gdal_spark.operators.focal import _apply_focal

    w5 = np.array(_BINOM5, dtype=np.float64)
    ker = np.outer(w5, w5)

    def kern(padded: np.ndarray) -> np.ndarray:
        ts = padded.shape[0] - 4
        acc = np.zeros((ts, ts), dtype=np.float64)
        for dy in range(5):
            for dx in range(5):
                acc += ker[dy, dx] * padded[dy:dy + ts, dx:dx + ts]
        return acc / 256.0

    ntx, nty = DEM_W // DEM_TILE, DEM_H // DEM_TILE
    out = _apply_focal(_dem_tiles(spark), DEM_TILE, 2, ntx, nty, kern)
    return out.filter(
        (F.col("gx") >= 2) & (F.col("gx") < DEM_W - 2)
        & (F.col("gy") >= 2) & (F.col("gy") < DEM_H - 2)
    ).select("gx", "gy", F.col("v").alias("sm"))


# --- inverted-index compression accounting: Elias gamma (q269) ------------------------


@query(
    "q269_postings_gamma_bits",
    """WITH t AS (SELECT doc_id,
                [w for w in string_split(text, ' ') if w <> ''] AS toks
             FROM documents),
       e AS (SELECT DISTINCT doc_id, unnest(toks) AS w FROM t),
       g AS (SELECT w, doc_id,
                doc_id - lag(doc_id) OVER (PARTITION BY w ORDER BY doc_id)
                    AS gap
             FROM e),
       bits AS (SELECT w,
                  count(*) AS df,
                  sum(CASE WHEN gap IS NULL
                       THEN 2 * (length(bin(doc_id + 1)) - 1) + 1
                       ELSE 2 * (length(bin(gap)) - 1) + 1 END)
                      AS gamma_bits,
                  count(*) * 64 AS raw_bits
               FROM g GROUP BY w)
       SELECT w, CAST(df AS BIGINT) AS df,
              CAST(gamma_bits AS BIGINT) AS gamma_bits,
              CAST(raw_bits AS BIGINT) AS raw_bits,
              CAST(CASE WHEN gamma_bits * 4 <= raw_bits THEN 1 ELSE 0 END
                   AS BIGINT) AS compresses_4x
       FROM bits""",
)
def q269(spark, sf_dir):
    """Inverted-index size accounting under Elias-gamma gap coding
    (the capacity-planning pass a 10^12-doc index build runs before
    choosing a postings format): per term, sort postings by doc id,
    gap-encode (first entry stores doc_id+1), and charge the exact
    gamma cost 2*floor(log2 g) + 1 bits per gap — floor-log2 is the
    bin()-length integer idiom, so both engines count identical bits.
    One term-partitioned window for the gaps + one aggregation;
    everything shuffles on the term vocabulary."""
    e = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", "explode(filter(split(text, ' '), w -> w != '')) AS w"
    ).distinct()
    w = Window.partitionBy("w").orderBy("doc_id")
    g = e.withColumn("gap", F.col("doc_id") - F.lag("doc_id").over(w))
    gamma = F.when(
        F.col("gap").isNull(),
        2 * (F.length(F.expr("bin(doc_id + 1)")) - 1) + 1,
    ).otherwise(2 * (F.length(F.expr("bin(gap)")) - 1) + 1)
    bits = g.groupBy("w").agg(
        F.count("*").alias("df"),
        F.sum(gamma).alias("gamma_bits"),
        (F.count("*") * 64).alias("raw_bits"),
    )
    return bits.select(
        "w",
        F.col("df").cast("long").alias("df"),
        F.col("gamma_bits").cast("long").alias("gamma_bits"),
        F.col("raw_bits").cast("long").alias("raw_bits"),
        F.when(F.col("gamma_bits") * 4 <= F.col("raw_bits"), 1).otherwise(0)
        .cast("long").alias("compresses_4x"),
    )


# --- MVT LineString command-stream encode (q270) --------------------------------------


@query(
    "q270_mvt_line_encode",
    """WITH v AS (SELECT k.range // 5 AS line_id, k.range % 5 AS seq,
                    ((k.range // 5) * 37 + (k.range % 5) * 41) % 256 AS x,
                    ((k.range // 5) * 53 + ((k.range % 5) * (k.range % 5))
                     * 29) % 256 AS y
             FROM range(100) k),
       d AS (SELECT line_id, seq, x, y,
                lag(x) OVER (PARTITION BY line_id ORDER BY seq) AS px,
                lag(y) OVER (PARTITION BY line_id ORDER BY seq) AS py
             FROM v),
       kept AS (SELECT * FROM d
                WHERE px IS NULL OR x <> px OR y <> py),
       d2 AS (SELECT line_id, seq, x, y,
                 x - lag(x) OVER (PARTITION BY line_id ORDER BY seq) AS dx,
                 y - lag(y) OVER (PARTITION BY line_id ORDER BY seq) AS dy
              FROM kept),
       zz AS (SELECT line_id,
                 count(*) AS n_out,
                 sum(CASE WHEN dx IS NULL THEN
                       (CASE WHEN x >= 0 THEN 2*x ELSE -2*x - 1 END)
                     + (CASE WHEN y >= 0 THEN 2*y ELSE -2*y - 1 END)
                     ELSE
                       (CASE WHEN dx >= 0 THEN 2*dx ELSE -2*dx - 1 END)
                     + (CASE WHEN dy >= 0 THEN 2*dy ELSE -2*dy - 1 END)
                     END) AS zz_sum
              FROM d2 GROUP BY line_id),
       n_in AS (SELECT line_id, count(*) AS n_pts FROM v GROUP BY line_id)
       SELECT z.line_id,
              CAST(i.n_pts AS BIGINT) AS n_in,
              CAST(z.n_out AS BIGINT) AS n_out,
              CAST(9 AS BIGINT) AS cmd_move,
              CAST((z.n_out - 1) * 8 + 2 AS BIGINT) AS cmd_line,
              CAST(z.zz_sum AS BIGINT) AS zz_sum
       FROM zz z JOIN n_in i ON i.line_id = z.line_id""",
)
def q270(spark, sf_dir):
    """MVT LineString geometry-command encode (the OGR MVT writer,
    ogr/ogrsf_frmts/mvt/mvtutils.cpp; Mapbox Vector Tile spec §4.3):
    consecutive duplicate quantized vertices collapse, the first
    vertex becomes MoveTo (command integer 9 = 1<<3 | 1), the rest
    one LineTo run ((n-1)<<3 | 2), and every coordinate delta is
    zigzag-encoded (2d if d>=0 else -2d-1).  Emits per line the
    in/out vertex counts, command integers, and the exact zigzag
    parameter sum — all integer, both engines bitwise.  Two
    line-partitioned windows (collapse, then delta); shards on
    line_id."""
    v = spark.range(100).selectExpr(
        "id div 5 AS line_id", "id % 5 AS seq",
        "((id div 5) * 37 + (id % 5) * 41) % 256 AS x",
        "((id div 5) * 53 + ((id % 5) * (id % 5)) * 29) % 256 AS y",
    )
    w = Window.partitionBy("line_id").orderBy("seq")
    d = v.withColumn("px", F.lag("x").over(w)).withColumn(
        "py", F.lag("y").over(w))
    kept = d.filter(
        F.col("px").isNull() | (F.col("x") != F.col("px"))
        | (F.col("y") != F.col("py")))
    d2 = kept.withColumn("dx", F.col("x") - F.lag("x").over(w)).withColumn(
        "dy", F.col("y") - F.lag("y").over(w))

    def _zz(c):
        return F.when(F.col(c) >= 0, 2 * F.col(c)).otherwise(
            -2 * F.col(c) - 1)

    first = _zz("x") + _zz("y")
    rest = _zz("dx") + _zz("dy")
    zz = d2.groupBy("line_id").agg(
        F.count("*").alias("n_out"),
        F.sum(F.when(F.col("dx").isNull(), first).otherwise(rest))
        .alias("zz_sum"),
    )
    n_in = v.groupBy("line_id").agg(F.count("*").alias("n_pts"))
    return zz.join(n_in, "line_id").select(
        "line_id",
        F.col("n_pts").cast("long").alias("n_in"),
        F.col("n_out").cast("long").alias("n_out"),
        F.lit(9).cast("long").alias("cmd_move"),
        ((F.col("n_out") - 1) * 8 + 2).cast("long").alias("cmd_line"),
        F.col("zz_sum").cast("long").alias("zz_sum"),
    )


# --- raster time-series linear trend, exact integers (q271) ---------------------------


@query(
    "q271_raster_trend",
    """WITH g AS (SELECT gx.range AS gx, gy.range AS gy
                   FROM range(64) gx, range(64) gy),
       ts AS (SELECT gx, gy, t.range AS t,
                 (gx*3 + gy*5) % 50 + t.range * ((gx + gy) % 7)
                 + (t.range * t.range * (gx % 3)) % 5 AS v
              FROM g, range(12) t),
       s AS (SELECT gx, gy,
                count(*) AS n, sum(t) AS sx, sum(v) AS sy,
                sum(t*v) AS sxy, sum(t*t) AS sxx
             FROM ts GROUP BY gx, gy),
       tr AS (SELECT gx, gy,
                 n*sxy - sx*sy AS slope_num,
                 n*sxx - sx*sx AS slope_den
              FROM s)
       SELECT CAST(slope_num AS BIGINT) AS slope_num,
              CAST(slope_den AS BIGINT) AS slope_den,
              CAST(CASE WHEN slope_num > 0 THEN 1
                        WHEN slope_num < 0 THEN -1 ELSE 0 END AS BIGINT)
                  AS trend_sign,
              CAST(count(*) AS BIGINT) AS n_px
       FROM tr GROUP BY slope_num, slope_den""",
)
def q271(spark, sf_dir):
    """Per-pixel linear TREND over a raster time series (the NDVI
    trend-analysis workload a 'gdal raster stack' feeds): ordinary
    least squares slope per pixel, kept as the EXACT integer rational
    (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) — numerator and denominator emit
    as integers, so both engines agree bitwise with no float
    regression anywhere.  One groupBy over (pixel) with five
    map-side-combinable integer sums; the 12-step series explodes
    from the synthetic stack (at scale: one scan of the band-stacked
    table, shuffle keyed on pixel).  Output is the trend histogram
    (slope rational -> pixel count)."""
    g = spark.range(64).selectExpr("id AS gx").crossJoin(
        spark.range(64).selectExpr("id AS gy"))
    ts = g.crossJoin(spark.range(12).selectExpr("id AS t")).selectExpr(
        "gx", "gy", "t",
        "(gx*3 + gy*5) % 50 + t * ((gx + gy) % 7) "
        "+ (t * t * (gx % 3)) % 5 AS v",
    )
    s = ts.groupBy("gx", "gy").agg(
        F.count("*").alias("n"), F.sum("t").alias("sx"),
        F.sum("v").alias("sy"), F.sum(F.col("t") * F.col("v")).alias("sxy"),
        F.sum(F.col("t") * F.col("t")).alias("sxx"),
    )
    tr = s.select(
        "gx", "gy",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .alias("slope_num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .alias("slope_den"),
    )
    return tr.groupBy("slope_num", "slope_den").agg(
        F.count("*").cast("long").alias("n_px")
    ).select(
        F.col("slope_num").cast("long").alias("slope_num"),
        F.col("slope_den").cast("long").alias("slope_den"),
        F.when(F.col("slope_num") > 0, 1)
        .when(F.col("slope_num") < 0, -1).otherwise(0)
        .cast("long").alias("trend_sign"),
        "n_px",
    )


# --- tile-pyramid rollup integrity audit (q272) ----------------------------------------


@query(
    "q272_pyramid_audit",
    f"""WITH p AS ({POINTS_SQL}),
       z8 AS (SELECT CAST(floor((lon + 180.0)/360.0*256.0) AS BIGINT) AS tx,
                     CAST(floor((90.0 - lat)/180.0*256.0) AS BIGINT) AS ty,
                     count(*) AS n
              FROM p GROUP BY 1, 2),
       z7 AS (SELECT tx // 2 AS px, ty // 2 AS py, sum(n) AS n_children,
                     count(*) AS n_tiles
              FROM z8 GROUP BY 1, 2),
       z7d AS (SELECT CAST(floor((lon + 180.0)/360.0*128.0) AS BIGINT) AS px,
                      CAST(floor((90.0 - lat)/180.0*128.0) AS BIGINT) AS py,
                      count(*) AS n_direct
               FROM p GROUP BY 1, 2)
       SELECT z7.px, z7.py,
              CAST(z7.n_children AS BIGINT) AS n_children,
              CAST(d.n_direct AS BIGINT) AS n_direct,
              CAST(z7.n_tiles AS BIGINT) AS n_child_tiles,
              CAST(CASE WHEN z7.n_children = d.n_direct THEN 1 ELSE 0 END
                   AS BIGINT) AS consistent
       FROM z7 JOIN z7d d ON d.px = z7.px AND d.py = z7.py""",
)
def q272(spark, sf_dir):
    """Tile-pyramid ROLLUP INTEGRITY audit (the data-quality gate a
    production tile table runs after every incremental maintenance
    pass, q213's complement): the z7 parent count rolled up from z8
    children must equal the count aggregated DIRECTLY from the source
    points — floor(v*128) == floor(v*256)//2 holds exactly for the
    power-of-two tiling, so `consistent` must be 1 everywhere and any
    0 pinpoints a corrupted parent.  Two independent aggregation
    paths over the same source, one equi-join on parent tile —
    both shuffle on tile keys."""
    p = _points(spark, sf_dir)
    fx = (F.col("lon") + 180.0) / 360.0
    fy = (90.0 - F.col("lat")) / 180.0
    z8 = p.select(
        F.floor(fx * 256.0).cast("long").alias("tx"),
        F.floor(fy * 256.0).cast("long").alias("ty"),
    ).groupBy("tx", "ty").agg(F.count("*").alias("n"))
    z7 = z8.selectExpr("tx div 2 AS px", "ty div 2 AS py", "n").groupBy(
        "px", "py").agg(F.sum("n").alias("n_children"),
                        F.count("*").alias("n_tiles"))
    z7d = p.select(
        F.floor(fx * 128.0).cast("long").alias("px"),
        F.floor(fy * 128.0).cast("long").alias("py"),
    ).groupBy("px", "py").agg(F.count("*").alias("n_direct"))
    return z7.join(z7d, ["px", "py"]).select(
        "px", "py",
        F.col("n_children").cast("long").alias("n_children"),
        F.col("n_direct").cast("long").alias("n_direct"),
        F.col("n_tiles").cast("long").alias("n_child_tiles"),
        F.when(F.col("n_children") == F.col("n_direct"), 1).otherwise(0)
        .cast("long").alias("consistent"),
    )


# --- text normalization + content hash (q273) ------------------------------------------


@query(
    "q273_text_normalize_hash",
    """WITH d AS (SELECT doc_id,
                trim(regexp_replace(regexp_replace(lower(text),
                     '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
             FROM documents)
       SELECT doc_id, length(norm) AS n_norm_chars,
              md5(norm) AS content_hash
       FROM d""",
)
def q273(spark, sf_dir):
    """Text NORMALIZATION + content hashing (the CCNet/Dolma
    pre-dedup canonicalization: lowercase, non-alphanumerics to
    space, whitespace collapse, trim — so near-identical pages hash
    identically before the exact-dedup groupBy).  The md5 of the
    normalized text is the dedup key both engines must agree on
    byte-for-byte; the normalization chain is three JVM regexp passes
    with patterns chosen inside the RE2/Java-regex common subset.
    Pure projection — zero shuffle at any corpus size."""
    d = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        "trim(regexp_replace(regexp_replace(lower(text), "
        "'[^a-z0-9 ]', ' '), ' +', ' ')) AS norm",
    )
    return d.select(
        "doc_id",
        F.length("norm").cast("long").alias("n_norm_chars"),
        F.md5("norm").alias("content_hash"),
    )


# --- eval-set apportionment: largest-remainder method (q274) ---------------------------


@query(
    "q274_eval_apportionment",
    """WITH s AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
       tot AS (SELECT sum(n) AS N FROM s),
       q AS (SELECT s.lang, s.n,
                (s.n * 100) // t.N AS base,
                (s.n * 100) % t.N AS rem
             FROM s, tot t),
       rk AS (SELECT lang, n, base, rem,
                 row_number() OVER (ORDER BY rem DESC, lang) AS rnk_rem
              FROM q),
       gap AS (SELECT 100 - sum(base) AS extra FROM rk)
       SELECT lang, CAST(n AS BIGINT) AS n_docs,
              CAST(base + CASE WHEN rnk_rem <= (SELECT extra FROM gap)
                   THEN 1 ELSE 0 END AS BIGINT) AS quota
       FROM rk""",
)
def q274(spark, sf_dir):
    """Eval-set APPORTIONMENT by the largest-remainder (Hamilton)
    method: carve exactly K=100 evaluation slots across languages
    proportionally — base = floor(n*K/N) per language, the leftover
    slots go to the largest remainders (ties to lang asc).  All
    integer (the remainder comparison IS the fraction comparison
    cross-multiplied); quotas sum to exactly K by construction —
    the deterministic allocation a multilingual eval harness needs,
    complementing q208's waterfill (capacity-capped) and q92's
    stratified sampling (rate-based).  One language-keyed groupBy +
    one tiny window over the language table."""
    s = _t(spark, sf_dir, "documents").groupBy("lang").agg(
        F.count("*").alias("n"))
    tot = s.agg(F.sum("n").alias("ntot"))  # 'N' would collide with 'n'
    q = s.crossJoin(F.broadcast(tot)).select(
        "lang", "n",
        F.floor(F.col("n") * 100 / F.col("ntot")).alias("base"),
        ((F.col("n") * 100) % F.col("ntot")).alias("rem"),
    )
    w = Window.orderBy(F.col("rem").desc(), F.col("lang"))
    rk = q.withColumn("rnk_rem", F.row_number().over(w))
    gap = rk.agg((100 - F.sum("base")).alias("extra"))
    return rk.crossJoin(F.broadcast(gap)).select(
        "lang",
        F.col("n").cast("long").alias("n_docs"),
        (F.col("base")
         + F.when(F.col("rnk_rem") <= F.col("extra"), 1).otherwise(0))
        .cast("long").alias("quota"),
    )


# --- host-graph triangle counting + clustering coefficient (q275) ----------------------


@query(
    "q275_triangles",
    """WITH e0 AS (SELECT doc_id % 40 AS a,
                      (doc_id * 7 + doc_id // 40) % 40 AS b
               FROM documents),
       ud AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
              FROM e0 WHERE a <> b),
       deg AS (SELECT x AS node, count(*) AS d FROM
                 (SELECT u AS x FROM ud UNION ALL SELECT v FROM ud)
               GROUP BY x),
       tri AS (SELECT e1.u AS x, e1.v AS y, e2.v AS z
               FROM ud e1
               JOIN ud e2 ON e2.u = e1.v
               JOIN ud e3 ON e3.u = e1.u AND e3.v = e2.v),
       pern AS (SELECT node, count(*) AS t FROM
                  (SELECT x AS node FROM tri
                   UNION ALL SELECT y FROM tri
                   UNION ALL SELECT z FROM tri)
                GROUP BY node),
       cc AS (SELECT d.node, d.d,
                 coalesce(p.t, 0) AS t,
                 d.d * (d.d - 1) AS cc_den2
              FROM deg d LEFT JOIN pern p ON p.node = d.node)
       SELECT node, CAST(d AS BIGINT) AS degree,
              CAST(t AS BIGINT) AS triangles,
              CAST(2 * t AS BIGINT) AS cc_num,
              CAST(cc_den2 AS BIGINT) AS cc_den
       FROM cc""",
)
def q275(spark, sf_dir):
    """Triangle counting + local clustering coefficient on the host
    link graph — the node-iterator join plan that scales (triangles
    enumerate as ordered wedges u<v<w closed by the (u,w) edge: two
    edge-table equi-joins, candidate volume bounded by wedge count,
    never node^3): per-node triangle participation and the exact
    clustering rational 2t / d(d-1) emitted as integers.  The
    canonical web-graph cohesion feature (spam farms show abnormally
    high clustering); everything shuffles on node/edge keys."""
    e0 = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id % 40 AS a", "(doc_id * 7 + doc_id div 40) % 40 AS b")
    ud = (
        e0.filter("a <> b")
        .selectExpr("least(a, b) AS u", "greatest(a, b) AS v")
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        ud.selectExpr("u AS x").unionAll(ud.selectExpr("v AS x"))
        .groupBy("x").agg(F.count("*").alias("d"))
        .withColumnRenamed("x", "node")
    )
    e1 = ud.selectExpr("u AS x", "v AS y")
    e2 = ud.selectExpr("u AS y", "v AS z")
    e3 = ud.selectExpr("u AS x", "v AS z")
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    pern = (
        tri.selectExpr("x AS node")
        .unionAll(tri.selectExpr("y AS node"))
        .unionAll(tri.selectExpr("z AS node"))
        .groupBy("node").agg(F.count("*").alias("t"))
    )
    return (
        deg.join(pern, "node", "left")
        .select(
            "node",
            F.col("d").cast("long").alias("degree"),
            F.coalesce("t", F.lit(0)).cast("long").alias("triangles"),
            (2 * F.coalesce("t", F.lit(0))).cast("long").alias("cc_num"),
            (F.col("d") * (F.col("d") - 1)).cast("long").alias("cc_den"),
        )
    )


# --- k-core decomposition by synchronous peeling (q276) --------------------------------


def _kcore_oracle_sql() -> str:
    # round-synchronous peeling for k = 3, unrolled to a fixpoint
    # depth the fixture provably reaches (guarded loudly)
    # every CTE is MATERIALIZED: DuckDB inlines plain CTEs per
    # reference, and n{t} feeding d{t+1} twice would expand to 2^8
    # re-scans of the parquet view ("Too many open files")
    # irregular degree profile (span 2..13) so the k=4 peel is a real
    # 3-round cascade with a PARTIAL surviving core (49/60)
    ctes = ["""h AS MATERIALIZED (SELECT DISTINCT doc_id % 60 AS hh
               FROM documents),
       e0 AS MATERIALIZED (SELECT hh AS a,
                      (hh * j + j * j) % 60 AS b
               FROM (SELECT hh, unnest([jj for jj in range(1, 8)
                             if jj <= hh % 6 + 1]) AS j
                     FROM h)),
       ud AS MATERIALIZED (SELECT DISTINCT least(a, b) AS u,
                      greatest(a, b) AS v
              FROM e0 WHERE a <> b),
       n0 AS MATERIALIZED (SELECT DISTINCT x AS node FROM
                (SELECT u AS x FROM ud UNION ALL SELECT v FROM ud))"""]
    for t in range(1, 9):
        prev = f"n{t-1}"
        ctes.append(f"""d{t} AS MATERIALIZED (SELECT x AS node,
                      count(*) AS d FROM
                 (SELECT e.u AS x FROM ud e
                   JOIN {prev} p1 ON p1.node = e.u
                   JOIN {prev} p2 ON p2.node = e.v
                  UNION ALL
                  SELECT e.v FROM ud e
                   JOIN {prev} p1 ON p1.node = e.u
                   JOIN {prev} p2 ON p2.node = e.v)
               GROUP BY x)""")
        ctes.append(f"""n{t} AS MATERIALIZED (SELECT node FROM d{t}
                      WHERE d >= 4)""")
    ctes.append("""chk AS (SELECT CASE WHEN
                 (SELECT count(*) FROM n8) <> (SELECT count(*) FROM n7)
               THEN error('q276 peeling did not converge in 8 rounds')
               ELSE 1 END AS ok)""")
    return ("WITH " + ",\n       ".join(ctes) + """
       SELECT n.node,
              CAST(CASE WHEN k.node IS NULL THEN 0 ELSE 1 END AS BIGINT)
                  AS in_core
       FROM n0 n LEFT JOIN n8 k ON k.node = n.node, chk""")


@query("q276_kcore", _kcore_oracle_sql())
def q276(spark, sf_dir):
    """k-CORE decomposition (k=4) by ROUND-SYNCHRONOUS peeling — the
    deterministic distributed analogue of the sequential min-degree
    peel (same fixpoint: the maximal subgraph where every node keeps
    degree >= k): each round recomputes degrees within the surviving
    set and drops every under-k node simultaneously; converges in
    O(peel depth) rounds, each one edge equi-join + one count.  The
    engine loops to an exact fixpoint with a loud 32-round cap; the
    oracle unrolls 8 rounds and error()s if the fixture needed more.
    Core membership is the classic crawl-frontier 'well-linked
    nucleus' feature."""
    h = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id % 60 AS hh").distinct()
    e0 = h.selectExpr(
        "hh",
        "explode(sequence(1, CAST(hh % 6 AS INT) + 1)) AS j",
    ).selectExpr("hh AS a", "(hh * j + j * j) % 60 AS b")
    ud = (
        e0.filter("a <> b")
        .selectExpr("least(a, b) AS u", "greatest(a, b) AS v")
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        ud.selectExpr("u AS node").unionAll(ud.selectExpr("v AS node"))
        .distinct().localCheckpoint(eager=True)
    )
    alive = nodes
    n_alive = alive.count()
    for _round in range(32):
        a1 = alive.selectExpr("node AS u")
        a2 = alive.selectExpr("node AS v")
        live_e = ud.join(a1, "u").join(a2, "v")
        d = (
            live_e.selectExpr("u AS node")
            .unionAll(live_e.selectExpr("v AS node"))
            .groupBy("node").agg(F.count("*").alias("d"))
        )
        nxt = d.filter("d >= 4").select("node").localCheckpoint(eager=True)
        n_nxt = nxt.count()
        if n_nxt == n_alive:
            break
        alive.unpersist()
        alive, n_alive = nxt, n_nxt
    else:
        raise RuntimeError("q276 k-core peeling did not converge")
    return nodes.join(
        alive.withColumn("_k", F.lit(1)), "node", "left"
    ).select(
        "node",
        F.when(F.col("_k").isNull(), 0).otherwise(1).cast("long")
        .alias("in_core"),
    )


# --- 2-hop neighborhood reach (q277) -----------------------------------------------


@query(
    "q277_two_hop_reach",
    """WITH e0 AS (SELECT doc_id % 40 AS src,
                      (doc_id * 7 + doc_id // 40) % 40 AS dst
               FROM documents),
       e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
       two AS (SELECT DISTINCT a.src, b.dst AS hop2
               FROM e a JOIN e b ON b.src = a.dst
               WHERE b.dst <> a.src),
       d1 AS (SELECT src, count(*) AS reach1 FROM e GROUP BY src),
       d2 AS (SELECT src, count(*) AS reach2_raw FROM two GROUP BY src),
       nw AS (SELECT t.src, count(*) AS new2
              FROM two t LEFT JOIN e x
                ON x.src = t.src AND x.dst = t.hop2
              WHERE x.dst IS NULL
              GROUP BY t.src)
       SELECT d1.src AS host,
              CAST(d1.reach1 AS BIGINT) AS reach1,
              CAST(coalesce(d2.reach2_raw, 0) AS BIGINT) AS reach2_closed,
              CAST(coalesce(nw.new2, 0) AS BIGINT) AS reach2_new
       FROM d1
       LEFT JOIN d2 ON d2.src = d1.src
       LEFT JOIN nw ON nw.src = d1.src""",
)
def q277(spark, sf_dir):
    """2-hop neighborhood reach over the directed host graph (the
    crawl-expansion feature: how many NEW hosts a frontier reaches at
    depth 2): distinct 1-hop out-neighbors, distinct 2-hop closures
    (excluding returning to self), and the 2-hop targets NOT already
    reachable in one hop (anti-join).  One edge self-join + one
    anti-join, all keyed on host — at web scale the 2-hop closure is
    computed per frontier shard, never materialized globally."""
    e = (
        _t(spark, sf_dir, "documents")
        .selectExpr("doc_id % 40 AS src",
                    "(doc_id * 7 + doc_id div 40) % 40 AS dst")
        .filter("src <> dst").distinct()
        .localCheckpoint(eager=True)
    )
    b = e.selectExpr("src AS mid", "dst AS hop2")
    two = (
        e.join(b, e.dst == b.mid)
        .filter(F.col("hop2") != F.col("src"))
        .select("src", "hop2").distinct()
    )
    d1 = e.groupBy("src").agg(F.count("*").alias("reach1"))
    d2 = two.groupBy("src").agg(F.count("*").alias("reach2_raw"))
    nw = (
        two.join(e.selectExpr("src", "dst AS hop2"), ["src", "hop2"],
                 "left_anti")
        .groupBy("src").agg(F.count("*").alias("new2"))
    )
    return (
        d1.withColumnRenamed("src", "host")
        .join(d2.withColumnRenamed("src", "host"), "host", "left")
        .join(nw.withColumnRenamed("src", "host"), "host", "left")
        .select(
            "host",
            F.col("reach1").cast("long").alias("reach1"),
            F.coalesce("reach2_raw", F.lit(0)).cast("long")
            .alias("reach2_closed"),
            F.coalesce("new2", F.lit(0)).cast("long").alias("reach2_new"),
        )
    )


# --- count-min sketch term-frequency estimation (q278) ------------------------


@query(
    "q278_countmin_sketch",
    """WITH w AS (SELECT unnest(string_split(text, ' ')) AS word
                  FROM documents),
       tc AS (SELECT word, count(*) AS cnt FROM w GROUP BY word),
       cells AS (SELECT r.range AS r,
                        CAST(CAST('0x' || substr(md5('cm' ||
                               CAST(r.range AS VARCHAR) || ':' || word),
                             1, 8) AS UBIGINT) % 64 AS BIGINT) AS c,
                        word, cnt
                 FROM tc, range(0, 4) r),
       sk AS (SELECT r, c, sum(cnt) AS cell FROM cells GROUP BY r, c),
       est AS (SELECT cells.word, min(sk.cell) AS cms_est
               FROM cells JOIN sk USING (r, c) GROUP BY cells.word)
       SELECT tc.word, CAST(tc.cnt AS BIGINT) AS true_cnt,
              CAST(est.cms_est AS BIGINT) AS cms_est,
              CAST(est.cms_est - tc.cnt AS BIGINT) AS overcount
       FROM tc JOIN est USING (word)""",
)
def q278(spark, sf_dir):
    """Count-Min sketch (d=4 rows x w=64 columns) term-frequency
    estimation — the streaming-scale frequency oracle for web corpora
    (heavy-hitter detection without a full vocabulary groupBy).  Row
    hashes are md5-derived integers (the pinned cross-engine idiom:
    first 8 hex chars via conv/UBIGINT — exact 32-bit value on both
    engines), the sketch is one (row, col)-keyed BIGINT sum, and each
    probe takes the MIN over its d cells — est >= truth always, the
    overcount column shows the collision inflation exactly.  At
    10^12 tokens the sketch is 256 cells regardless of corpus size:
    the groupBy is map-side-combinable and the probe side broadcasts."""
    docs = _t(spark, sf_dir, "documents")
    words = docs.select(F.explode(F.split("text", " ")).alias("word"))
    tc = words.groupBy("word").agg(F.count("*").alias("cnt"))
    cells = tc.select(
        "word", "cnt", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("r")
    ).withColumn(
        "c",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("cm"), F.col("r").cast("string"),
                            F.lit(":"), F.col("word"),
                        )
                    ),
                    1, 8,
                ),
                16, 10,
            ).cast("long")
            % 64
        ),
    )
    sk = cells.groupBy("r", "c").agg(F.sum("cnt").alias("cell"))
    est = (
        cells.select("word", "r", "c")
        .join(F.broadcast(sk), ["r", "c"])
        .groupBy("word")
        .agg(F.min("cell").alias("cms_est"))
    )
    return tc.join(est, "word").select(
        "word",
        F.col("cnt").cast("long").alias("true_cnt"),
        F.col("cms_est").cast("long").alias("cms_est"),
        (F.col("cms_est") - F.col("cnt")).cast("long").alias("overcount"),
    )


# --- HyperLogLog distinct-URL cardinality sketch (q279) -----------------------

# alpha_32 * m^2 * 2^28 computed once in Python and inlined VERBATIM in
# both engines (CLAUDE.md: inline Python-computed constants)
_HLL_C = 191589901139.968  # 0.697 * 32 * 32 * 2**28


@query(
    "q279_hll_cardinality",
    """WITH u AS (SELECT DISTINCT doc_id % 25 AS host,
                    'https://h' || CAST(doc_id % 25 AS VARCHAR) ||
                    '.example.com/p' || CAST((doc_id * 13) % 40 AS VARCHAR)
                    AS url
                  FROM documents),
       h AS (SELECT host, url,
                    CAST(CAST('0x' || substr(md5(url), 1, 8) AS UBIGINT)
                         AS BIGINT) AS h32
             FROM u),
       rho AS (SELECT host, h32 % 32 AS b,
                      CASE WHEN h32 // 32 = 0 THEN 28
                           ELSE 28 - length(bin(h32 // 32)) END AS rho
               FROM h),
       reg AS (SELECT host, b, max(rho) AS reg FROM rho GROUP BY host, b),
       grid AS (SELECT host, r.range AS b FROM
                  (SELECT DISTINCT host FROM u) hh, range(0, 32) r),
       full_reg AS (SELECT grid.host, grid.b,
                           coalesce(reg.reg, 0) AS reg
                    FROM grid LEFT JOIN reg
                      ON reg.host = grid.host AND reg.b = grid.b),
       agg AS (SELECT host,
                      sum(CAST(1 AS BIGINT) << CAST(28 - reg AS INT))
                        AS harmonic_d,
                      sum(CASE WHEN reg > 0 THEN 1 ELSE 0 END) AS used_buckets,
                      sum(reg) AS sum_reg
               FROM full_reg GROUP BY host),
       truth AS (SELECT host, count(DISTINCT url) AS n_distinct FROM u
                 GROUP BY host)
       SELECT agg.host,
              CAST(truth.n_distinct AS BIGINT) AS n_distinct,
              CAST(agg.used_buckets AS BIGINT) AS used_buckets,
              CAST(agg.sum_reg AS BIGINT) AS sum_reg,
              CAST(agg.harmonic_d AS BIGINT) AS harmonic_d,
              191589901139.968 / CAST(agg.harmonic_d AS DOUBLE) AS hll_est
       FROM agg JOIN truth USING (host)""",
)
def q279(spark, sf_dir):
    """HyperLogLog per-host distinct-URL cardinality sketch (p=5,
    m=32 registers) — the mergeable distinct counter every crawl
    frontier and index-stats job uses at 10^12-URL scale.  The 32-bit
    md5-derived hash splits into bucket (low 5 bits) and the
    remaining 27-bit word whose leading-zero rank is the exact
    integer 28 - floor(log2(w)) - via the bin()-length idiom shared
    by both engines (no transcendental).  Registers are a per-(host,
    bucket) MAX — map-side combinable, mergeable across shards, which
    is the whole point of the sketch.  The harmonic denominator is
    the EXACT integer sum of 2^(28-reg) (bit-shift, never float pow);
    the only float op is the final single division by the inlined
    alpha*m^2*2^28 constant, bitwise on both engines.  The exact
    distinct count rides along so the estimate error is visible."""
    docs = _t(spark, sf_dir, "documents")
    u = docs.select(
        (F.col("doc_id") % 25).alias("host"),
        F.concat(
            F.lit("https://h"), (F.col("doc_id") % 25).cast("string"),
            F.lit(".example.com/p"),
            ((F.col("doc_id") * 13) % 40).cast("string"),
        ).alias("url"),
    ).distinct()
    h = u.withColumn(
        "h32",
        F.conv(F.substring(F.md5("url"), 1, 8), 16, 10).cast("long"),
    )
    rho = h.select(
        "host",
        (F.col("h32") % 32).alias("b"),
        F.when(F.expr("h32 div 32") == 0, F.lit(28))
        .otherwise(28 - F.length(F.bin(F.expr("h32 div 32"))))
        .alias("rho"),
    )
    reg = rho.groupBy("host", "b").agg(F.max("rho").alias("reg"))
    grid = (
        u.select("host").distinct()
        .select("host", F.explode(F.sequence(F.lit(0), F.lit(31))).alias("b"))
    )
    full_reg = grid.join(reg, ["host", "b"], "left").select(
        "host", "b", F.coalesce("reg", F.lit(0)).alias("reg")
    )
    agg = full_reg.groupBy("host").agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(28 - reg AS INT))"))
        .alias("harmonic_d"),
        F.sum(F.when(F.col("reg") > 0, 1).otherwise(0)).alias("used_buckets"),
        F.sum("reg").alias("sum_reg"),
    )
    truth = u.groupBy("host").agg(
        F.countDistinct("url").alias("n_distinct")
    )
    return agg.join(truth, "host").select(
        "host",
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.col("used_buckets").cast("long").alias("used_buckets"),
        F.col("sum_reg").cast("long").alias("sum_reg"),
        F.col("harmonic_d").cast("long").alias("harmonic_d"),
        (F.lit(_HLL_C) / F.col("harmonic_d").cast("double")).alias("hll_est"),
    )


# --- TrustRank: seed-teleport anti-spam centrality (q280) ---------------------


@query(
    "q280_trustrank",
    """WITH hosts AS (SELECT DISTINCT doc_id % 40 AS host FROM documents),
       edges AS (SELECT host AS src, (host + 3) % 40 AS dst FROM hosts
                 UNION ALL SELECT host, (host * 5 + 2) % 40 FROM hosts
                 UNION ALL SELECT host, (host * 7 + 13) % 40 FROM hosts),
       seeds AS (SELECT host FROM hosts WHERE host % 10 = 0),
       r0 AS (SELECT h.host,
                     CAST(CASE WHEN h.host % 10 = 0 THEN 1 ELSE 0 END
                          AS BIGINT) AS r
              FROM hosts h),
       r1 AS (SELECT h.host,
                     CAST(CASE WHEN h.host % 10 = 0 THEN 9 ELSE 0 END
                          + coalesce(s.s, 0) AS BIGINT) AS r
              FROM hosts h LEFT JOIN
                   (SELECT e.dst AS host, sum(17 * r.r) AS s
                    FROM edges e JOIN r0 r ON e.src = r.host
                    GROUP BY e.dst) s USING (host)),
       r2 AS (SELECT h.host,
                     CAST(CASE WHEN h.host % 10 = 0 THEN 9 * 60 ELSE 0 END
                          + coalesce(s.s, 0) AS BIGINT) AS r
              FROM hosts h LEFT JOIN
                   (SELECT e.dst AS host, sum(17 * r.r) AS s
                    FROM edges e JOIN r1 r ON e.src = r.host
                    GROUP BY e.dst) s USING (host)),
       r3 AS (SELECT h.host,
                     CAST(CASE WHEN h.host % 10 = 0 THEN 9 * 3600 ELSE 0 END
                          + coalesce(s.s, 0) AS BIGINT) AS r
              FROM hosts h LEFT JOIN
                   (SELECT e.dst AS host, sum(17 * r.r) AS s
                    FROM edges e JOIN r2 r ON e.src = r.host
                    GROUP BY e.dst) s USING (host)),
       r4 AS (SELECT h.host,
                     CAST(CASE WHEN h.host % 10 = 0 THEN 9 * 216000 ELSE 0 END
                          + coalesce(s.s, 0) AS BIGINT) AS r
              FROM hosts h LEFT JOIN
                   (SELECT e.dst AS host, sum(17 * r.r) AS s
                    FROM edges e JOIN r3 r ON e.src = r.host
                    GROUP BY e.dst) s USING (host))
       SELECT r4.host AS host,
              CAST(CASE WHEN r4.host % 10 = 0 THEN 1 ELSE 0 END AS BIGINT)
                AS is_seed,
              r4.r AS trust_scaled,
              CAST(r4.r AS DOUBLE) / 51840000.0 AS trust
       FROM r4""",
)
def q280(spark, sf_dir):
    """TrustRank (Gyongyi et al.) — PageRank whose teleport mass goes
    ONLY to a trusted seed set, the classic link-spam demotion signal
    for crawl curation.  Same exact-integer scheme as q190 (damping
    0.85, uniform out-degree 3, scale 60^t so 0.15 -> 9*60^t on seeds
    and 0.85/3 -> 17/60 on edges): R_{t+1}(v) = [v in S]*9*60^t +
    17 * sum_{u->v} R_t(u), R_0 = [v in S].  Every value stays BIGINT
    (growth <= ~170^t, far inside 2^63 at 4 rounds) so the result is
    order-free across engines; non-seed spam clusters receive trust
    only through in-links from the trusted region.  Each round is one
    equi-join + one map-side-combinable sum keyed on host — the same
    shuffle shape as PageRank, ~10^8 host rows at web scale.  The
    edge multiset keeps parallel edges (multigraph semantics,
    UNION ALL on both engines)."""
    docs = _t(spark, sf_dir, "documents")
    hosts = docs.select((F.col("doc_id") % 40).alias("host")).distinct()
    edges = hosts.select(
        F.col("host").alias("src"),
        F.explode(F.array(
            (F.col("host") + 3) % 40,
            (F.col("host") * 5 + 2) % 40,
            (F.col("host") * 7 + 13) % 40,
        )).alias("dst"),
    )
    seed = F.when(F.col("host") % 10 == 0, 1).otherwise(0)
    ranks = hosts.withColumn("r", seed.cast("long"))
    for t in range(4):
        tele = 9 * (60 ** t)
        contrib = (
            edges.join(ranks, edges.src == ranks.host)
            .groupBy("dst")
            .agg(F.sum(F.col("r") * 17).alias("s"))
        )
        ranks = (
            hosts.join(contrib, hosts.host == contrib.dst, "left")
            .select(
                hosts.host,
                (
                    F.when(hosts.host % 10 == 0, F.lit(tele)).otherwise(0)
                    + F.coalesce(F.col("s"), F.lit(0))
                ).cast("long").alias("r"),
            )
        )
    return ranks.select(
        "host",
        F.when(F.col("host") % 10 == 0, 1).otherwise(0).cast("long")
        .alias("is_seed"),
        F.col("r").alias("trust_scaled"),
        (F.col("r").cast("double") / F.lit(51840000.0)).alias("trust"),
    )


# --- anchor-text consolidation per target host (q281) -------------------------


@query(
    "q281_anchor_text",
    """WITH links AS (SELECT doc_id % 40 AS src,
                             (doc_id * 7 + 3) % 40 AS dst,
                             string_split(text, ' ')[(doc_id % 10) + 1]
                               AS anchor
                      FROM documents),
       a AS (SELECT dst, anchor, count(*) AS cnt FROM links
             GROUP BY dst, anchor),
       m AS (SELECT dst, max(cnt) AS mc, sum(cnt) AS inlinks,
                    count(*) AS n_terms
             FROM a GROUP BY dst),
       top AS (SELECT a.dst, max(a.anchor) AS top_anchor
               FROM a JOIN m ON a.dst = m.dst AND a.cnt = m.mc
               GROUP BY a.dst)
       SELECT m.dst AS host,
              CAST(m.inlinks AS BIGINT) AS inlinks,
              CAST(m.n_terms AS BIGINT) AS n_anchor_terms,
              top.top_anchor AS top_anchor,
              CAST(m.mc AS BIGINT) AS top_cnt
       FROM m JOIN top ON top.dst = m.dst""",
)
def q281(spark, sf_dir):
    """Anchor-text consolidation — the indexing-side aggregation that
    attaches the web's description of a page TO the page (anchor
    terms of in-links, the classic ranking signal): per target host,
    in-link count, distinct anchor-term count, and the dominant
    anchor term by a map-side-combinable struct argmax (max count,
    ties to lexicographically-greatest term — binary string order,
    identical on both engines for the ascii vocabulary).  The anchor
    is a deterministic word of the linking document (1-indexed
    element (doc_id%10)+1; every fixture doc has >= 10 words).  One
    groupBy keyed on (dst, anchor) then one argmax keyed on dst —
    never a window over the term table; at web scale both shuffles
    key on the target host."""
    docs = _t(spark, sf_dir, "documents")
    links = docs.select(
        (F.col("doc_id") % 40).alias("src"),
        ((F.col("doc_id") * 7 + 3) % 40).alias("dst"),
        F.element_at(
            F.split("text", " "), ((F.col("doc_id") % 10) + 1).cast("int")
        ).alias("anchor"),
    )
    a = links.groupBy("dst", "anchor").agg(F.count("*").alias("cnt"))
    m = a.groupBy("dst").agg(
        F.max(F.struct(F.col("cnt"), F.col("anchor"))).alias("top"),
        F.sum("cnt").alias("inlinks"),
        F.count("*").alias("n_terms"),
    )
    return m.select(
        F.col("dst").alias("host"),
        F.col("inlinks").cast("long").alias("inlinks"),
        F.col("n_terms").cast("long").alias("n_anchor_terms"),
        F.col("top.anchor").alias("top_anchor"),
        F.col("top.cnt").cast("long").alias("top_cnt"),
    )


# --- Bloom-filter blocklist membership accounting (q282) ----------------------


@query(
    "q282_bloom_blocklist",
    """WITH u AS (SELECT doc_id,
                    'https://site' || CAST(doc_id % 50 AS VARCHAR) ||
                    '.org/page' || CAST(doc_id % 23 AS VARCHAR) AS url,
                    doc_id % 50 AS site
                  FROM documents),
       bl AS (SELECT DISTINCT url FROM u WHERE doc_id % 17 = 0),
       pos AS (SELECT DISTINCT
                 CAST(CAST('0x' || substr(md5('bf' ||
                        CAST(k.range AS VARCHAR) || ':' || url), 1, 8)
                      AS UBIGINT) % 256 AS BIGINT) AS p
               FROM bl, range(0, 3) k),
       probe AS (SELECT u.url, u.site, k.range AS k,
                   CAST(CAST('0x' || substr(md5('bf' ||
                          CAST(k.range AS VARCHAR) || ':' || u.url), 1, 8)
                        AS UBIGINT) % 256 AS BIGINT) AS p
                 FROM (SELECT DISTINCT url, site FROM u) u, range(0, 3) k),
       hits AS (SELECT url, site, count(*) AS nhit
                FROM probe JOIN pos USING (p)
                GROUP BY url, site),
       verdict AS (SELECT p.url, p.site,
                          CASE WHEN coalesce(h.nhit, 0) = 3 THEN 1 ELSE 0 END
                            AS bloom_hit,
                          CASE WHEN bl.url IS NOT NULL THEN 1 ELSE 0 END
                            AS truly_blocked
                   FROM (SELECT DISTINCT url, site FROM u) p
                   LEFT JOIN (SELECT url, max(nhit) AS nhit FROM hits
                              GROUP BY url) h ON h.url = p.url
                   LEFT JOIN bl ON bl.url = p.url)
       SELECT site,
              CAST(count(*) AS BIGINT) AS n_urls,
              CAST(sum(bloom_hit) AS BIGINT) AS n_bloom_hits,
              CAST(sum(truly_blocked) AS BIGINT) AS n_blocked,
              CAST(sum(bloom_hit) - sum(truly_blocked) AS BIGINT)
                AS n_false_pos
       FROM verdict GROUP BY site""",
)
def q282(spark, sf_dir):
    """Bloom-filter blocklist gate with exact false-positive
    accounting — the crawl-ingest membership test (is this URL on the
    blocklist?) at the scale where the blocklist itself must be a
    bit-set, not a join side.  k=3 md5-derived hash positions into
    m=256 bits (the pinned conv/UBIGINT idiom); the filter is the
    DISTINCT position set of the blocklist, a candidate hits when ALL
    3 of its positions are present (count==3 over a position
    semi-join).  Bloom guarantees no false negatives — n_bloom_hits
    >= n_blocked per site by construction, and the n_false_pos column
    measures the collision rate of this (m, k, n) point exactly.  At
    10^12 URLs the filter broadcast is 256 bits and the probe is a
    map-side broadcast join; nothing shuffles on the URL."""
    docs = _t(spark, sf_dir, "documents")
    u = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://site"), (F.col("doc_id") % 50).cast("string"),
            F.lit(".org/page"), (F.col("doc_id") % 23).cast("string"),
        ).alias("url"),
        (F.col("doc_id") % 50).alias("site"),
    )
    bl = u.filter(F.col("doc_id") % 17 == 0).select("url").distinct()

    def _pos(url_col, k_col):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("bf"), k_col.cast("string"),
                                   F.lit(":"), url_col)),
                    1, 8,
                ),
                16, 10,
            ).cast("long")
            % 256
        )

    ks = F.explode(F.sequence(F.lit(0), F.lit(2))).alias("k")
    pos = (
        bl.select("url", ks)
        .select(_pos(F.col("url"), F.col("k")).alias("p"))
        .distinct()
    )
    cand = u.select("url", "site").distinct()
    probe = cand.select("url", "site", ks).withColumn(
        "p", _pos(F.col("url"), F.col("k"))
    )
    hits = (
        probe.join(F.broadcast(pos), "p")
        .groupBy("url", "site")
        .agg(F.count("*").alias("nhit"))
    )
    verdict = (
        cand.join(
            hits.groupBy("url").agg(F.max("nhit").alias("nhit")),
            "url", "left",
        )
        .join(
            F.broadcast(bl.withColumn("_b", F.lit(1))), "url", "left"
        )
        .select(
            "site",
            F.when(F.coalesce("nhit", F.lit(0)) == 3, 1).otherwise(0)
            .alias("bloom_hit"),
            F.when(F.col("_b").isNotNull(), 1).otherwise(0)
            .alias("truly_blocked"),
        )
    )
    return verdict.groupBy("site").agg(
        F.count("*").cast("long").alias("n_urls"),
        F.sum("bloom_hit").cast("long").alias("n_bloom_hits"),
        F.sum("truly_blocked").cast("long").alias("n_blocked"),
        (F.sum("bloom_hit") - F.sum("truly_blocked")).cast("long")
        .alias("n_false_pos"),
    )


# --- shingle-containment near-dup (q283) --------------------------------------


@query(
    "q283_shingle_containment",
    """WITH d AS (SELECT doc_id,
                    CASE WHEN doc_id % 20 = 0 THEN
                      'alpha beta gamma delta epsilon zeta eta theta iota kappa tail'
                      || CAST(doc_id % 3 AS VARCHAR)
                    ELSE text END AS body
                  FROM documents),
       s AS (SELECT doc_id, string_split(body, ' ') AS w FROM d),
       g AS (SELECT DISTINCT doc_id,
                    w[r.range] || ' ' || w[r.range + 1] AS gram
             FROM s, range(1, 200) r
             WHERE r.range <= len(w) - 1),
       chk AS (SELECT CASE WHEN max(len(w)) > 199
                      THEN error('q283 oracle range(1,200) bound exceeded')
                      ELSE 1 END AS ok FROM s),
       df AS (SELECT gram, count(*) AS dfc FROM g GROUP BY gram),
       surv AS (SELECT g.doc_id, g.gram FROM g JOIN df USING (gram)
                WHERE df.dfc <= 60),
       sz AS (SELECT doc_id, count(*) AS size_a FROM surv GROUP BY doc_id),
       pairs AS (SELECT a.doc_id AS a, b.doc_id AS b,
                        count(*) AS inter
                 FROM surv a JOIN surv b
                   ON a.gram = b.gram AND a.doc_id <> b.doc_id
                 GROUP BY a.doc_id, b.doc_id)
       SELECT p.a, p.b,
              CAST(p.inter AS BIGINT) AS inter,
              CAST(sz.size_a AS BIGINT) AS size_a
       FROM pairs p JOIN sz ON sz.doc_id = p.a, chk
       WHERE 2 * p.inter >= sz.size_a""",
)
def q283(spark, sf_dir):
    """Shingle-CONTAINMENT near-dup detection (Broder's asymmetric
    measure |S_A inter S_B| / |S_A| — catches a short page swallowed
    by a longer one, which symmetric Jaccard misses).  Universe =
    word bigrams with document frequency <= 60, an ABSOLUTE df cap
    (the q19 lesson: proportional caps still admit N^2 pairs at
    10^12 docs) — candidate volume is sum(df^2) over surviving grams,
    so hot boilerplate shingles can never explode the self-join; at
    larger SFs the cap REMOVES the injected template (df grows with
    corpus) and the plan gets cheaper, which is the linearity story
    working as intended.  Docs with doc_id%20==0 carry a shared
    10-word template + a 3-way tail so the fixture has true
    containment pairs at sf<=0.01; threshold 2*inter >= size_a
    (containment >= 1/2) in exact integer cross-multiplication."""
    docs = _t(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 20 == 0,
            F.concat(
                F.lit("alpha beta gamma delta epsilon zeta eta theta "
                      "iota kappa tail"),
                (F.col("doc_id") % 3).cast("string"),
            ),
        ).otherwise(F.col("text")).alias("body"),
    )
    w = d.select("doc_id", F.split("body", " ").alias("w"))
    g = (
        w.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 1), "
                    "i -> concat(w[i - 1], ' ', w[i]))"
                )
            ).alias("gram"),
        )
        .distinct()
    )
    dfc = g.groupBy("gram").agg(F.count("*").alias("dfc"))
    surv = g.join(dfc.filter(F.col("dfc") <= 60), "gram").select(
        "doc_id", "gram"
    )
    sz = surv.groupBy("doc_id").agg(F.count("*").alias("size_a"))
    b = surv.select(F.col("doc_id").alias("b"), "gram")
    pairs = (
        surv.join(b, "gram")
        .filter(F.col("doc_id") != F.col("b"))
        .groupBy(F.col("doc_id").alias("a"), "b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        pairs.join(sz.withColumnRenamed("doc_id", "a"), "a")
        .filter(2 * F.col("inter") >= F.col("size_a"))
        .select(
            "a", "b",
            F.col("inter").cast("long").alias("inter"),
            F.col("size_a").cast("long").alias("size_a"),
        )
    )


# --- corpus-drift chi-square per (source, term) (q284) ------------------------


@query(
    "q284_chisq_drift",
    """WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS word
                  FROM documents),
       o AS (SELECT source, word, count(*) AS obs FROM w
             GROUP BY source, word),
       r AS (SELECT source, count(*) AS rt FROM w GROUP BY source),
       c AS (SELECT word, count(*) AS ct FROM w GROUP BY word),
       t AS (SELECT count(*) AS tt FROM w),
       grid AS (SELECT r.source, c.word, r.rt, c.ct FROM r, c),
       cell AS (SELECT grid.source, grid.word, grid.rt, grid.ct,
                       coalesce(o.obs, 0) AS obs
                FROM grid LEFT JOIN o
                  ON o.source = grid.source AND o.word = grid.word)
       SELECT cell.source, cell.word,
              CAST(cell.obs AS BIGINT) AS obs,
              CAST(cell.rt * cell.ct AS BIGINT) AS e_num,
              CAST(cell.obs * t.tt - cell.rt * cell.ct AS DOUBLE)
                * CAST(cell.obs * t.tt - cell.rt * cell.ct AS DOUBLE)
                / CAST(cell.rt AS DOUBLE) / CAST(cell.ct AS DOUBLE)
                / CAST(t.tt AS DOUBLE) AS chi2_term
       FROM cell, t""",
)
def q284(spark, sf_dir):
    """Per-(source, term) chi-square drift contribution — the corpus
    QA pass that localizes which slice of a web crawl shifted its
    token distribution (domain drift / contamination detection before
    training).  The statistic's cell term ((O - E)^2 / E with
    E = R*C/T) is algebraically lifted to (O*T - R*C)^2 / (R*C*T) so
    the numerator difference is computed in EXACT BIGINT arithmetic
    (O*T <= ~2.5e11 even at sf1), then squared and divided in a fixed
    left-to-right double expression — identical IEEE tree on both
    engines, no rounding needed.  Full source x vocabulary grid
    (absent cells count 0, contributing exactly R*C/T).  Four
    map-side-combinable count aggregations + one broadcast-size
    grid join; at web scale everything keys on (source, word) and the
    vocabulary side is the small one."""
    docs = _t(spark, sf_dir, "documents")
    w = docs.select("source", F.explode(F.split("text", " ")).alias("word"))
    o = w.groupBy("source", "word").agg(F.count("*").alias("obs"))
    r = w.groupBy("source").agg(F.count("*").alias("rt"))
    c = w.groupBy("word").agg(F.count("*").alias("ct"))
    t = w.agg(F.count("*").alias("tt"))
    grid = r.crossJoin(F.broadcast(c))
    cell = grid.join(o, ["source", "word"], "left").select(
        "source", "word", "rt", "ct",
        F.coalesce("obs", F.lit(0)).alias("obs"),
    )
    d = (F.col("obs") * F.col("tt") - F.col("rt") * F.col("ct")).cast(
        "double"
    )
    return cell.crossJoin(F.broadcast(t)).select(
        "source", "word",
        F.col("obs").cast("long").alias("obs"),
        (F.col("rt") * F.col("ct")).cast("long").alias("e_num"),
        (
            d * d
            / F.col("rt").cast("double")
            / F.col("ct").cast("double")
            / F.col("tt").cast("double")
        ).alias("chi2_term"),
    )


# --- VByte postings-size accounting (q285) ------------------------------------


@query(
    "q285_vbyte_postings",
    """WITH p AS (SELECT DISTINCT word, doc_id FROM
                    (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                     FROM documents)),
       gaps AS (SELECT word,
                       coalesce(doc_id - lag(doc_id) OVER
                                  (PARTITION BY word ORDER BY doc_id),
                                doc_id + 1) AS gap
                FROM p),
       b AS (SELECT word,
                    ((length(bin(gap)) - 1) // 7) + 1 AS nbytes
             FROM gaps)
       SELECT word,
              CAST(count(*) AS BIGINT) AS df,
              CAST(sum(nbytes) AS BIGINT) AS vbyte_bytes,
              CAST(count(*) * 8 - sum(nbytes) AS BIGINT) AS saved_vs_fixed64
       FROM b GROUP BY word""",
)
def q285(spark, sf_dir):
    """Variable-byte (VByte) postings-size accounting — the
    capacity-planning pass for the index tier, complementing q269's
    Elias-gamma bits: per term, sort the posting list, delta-encode
    (first entry charged as doc_id+1 so the gap is always >= 1), and
    charge each gap its exact VByte cost ceil(bits/7) =
    (floor(log2 g) // 7) + 1 via the cross-engine bin()-length idiom
    — pure integers, no float log anywhere.  The lag window is
    TERM-SHARDED (partitioned by word), the q269 contract: at
    10^12 postings each term's list sorts independently, there is no
    global window.  saved_vs_fixed64 quantifies the win over 8-byte
    raw ids."""
    docs = _t(spark, sf_dir, "documents")
    p = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .distinct()
    )
    win = Window.partitionBy("word").orderBy("doc_id")
    gaps = p.select(
        "word",
        F.coalesce(
            F.col("doc_id") - F.lag("doc_id").over(win),
            F.col("doc_id") + 1,
        ).alias("gap"),
    )
    b = gaps.select(
        "word",
        (F.expr("(length(bin(gap)) - 1) div 7") + 1).alias("nbytes"),
    )
    return b.groupBy("word").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("nbytes").cast("long").alias("vbyte_bytes"),
        (F.count("*") * 8 - F.sum("nbytes")).cast("long")
        .alias("saved_vs_fixed64"),
    )


# --- SALSA authority scores, closed form (q286) -------------------------------


@query(
    "q286_salsa_authority",
    """WITH RECURSIVE e AS (SELECT DISTINCT doc_id % 40 AS src,
                                   (doc_id * 11 + 5) % 40 AS dst
                            FROM documents),
       auth AS (SELECT DISTINCT dst FROM e),
       indeg AS (SELECT dst, count(*) AS indeg FROM e GROUP BY dst),
       cocite AS (SELECT DISTINCT a.dst AS x, b.dst AS y
                  FROM e a JOIN e b ON a.src = b.src
                  WHERE a.dst <> b.dst),
       lab AS (SELECT dst AS node, dst AS lbl FROM auth
               UNION
               SELECT c.y, l.lbl
               FROM lab l JOIN cocite c ON c.x = l.node),
       comp AS (SELECT node, min(lbl) AS comp FROM lab GROUP BY node),
       den AS (SELECT comp.comp, sum(indeg.indeg) AS comp_indeg
               FROM comp JOIN indeg ON indeg.dst = comp.node
               GROUP BY comp.comp)
       SELECT i.dst AS authority,
              CAST(i.indeg AS BIGINT) AS indeg,
              CAST(c.comp AS BIGINT) AS comp,
              CAST(d.comp_indeg AS BIGINT) AS comp_indeg,
              CAST(i.indeg AS DOUBLE) / CAST(d.comp_indeg AS DOUBLE)
                AS salsa
       FROM indeg i JOIN comp c ON c.node = i.dst
       JOIN den d ON d.comp = c.comp""",
)
def q286(spark, sf_dir):
    """SALSA authority scores (Lempel-Moran 2000) via the CLOSED FORM:
    the authority-side random walk's stationary distribution is
    in-degree normalized WITHIN each connected component of the
    co-citation graph (authorities joined when they share a hub) —
    no power iteration at all, which is why SALSA is the cheap
    link-spam-resistant alternative to HITS at crawl scale.  The
    engine computes components by round-synchronous min-label
    propagation over the co-citation edges (loop to an exact
    fixpoint, loud 16-round cap; the label sum is a monotone integer
    so it doubles as the convergence signal); the oracle closes the
    same labels with a recursive CTE.  Scores are the exact rational
    indeg/comp_indeg emitted as one division — bitwise on both
    engines.  At web scale the co-citation join is hub-sharded and
    the component pass is the standard pointer-jumping CC."""
    docs = _t(spark, sf_dir, "documents")
    e = (
        docs.select(
            (F.col("doc_id") % 40).alias("src"),
            ((F.col("doc_id") * 11 + 5) % 40).alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    indeg = e.groupBy("dst").agg(F.count("*").alias("indeg"))
    cocite = (
        e.select("src", F.col("dst").alias("x"))
        .join(e.select("src", F.col("dst").alias("y")), "src")
        .filter(F.col("x") != F.col("y"))
        .select("x", "y")
        .distinct()
        .localCheckpoint(eager=True)
    )
    comp = indeg.select(
        F.col("dst").alias("node"), F.col("dst").alias("lbl")
    ).localCheckpoint(eager=True)
    prev_sum = comp.agg(F.sum("lbl")).collect()[0][0]
    for _round in range(16):
        nb = (
            cocite.join(
                comp.select(F.col("node").alias("x"),
                            F.col("lbl").alias("xl")),
                "x",
            )
            .groupBy(F.col("y").alias("node"))
            .agg(F.min("xl").alias("nl"))
        )
        comp = (
            comp.join(nb, "node", "left")
            .select(
                "node",
                F.least(F.col("lbl"), F.coalesce("nl", F.col("lbl")))
                .alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
        s = comp.agg(F.sum("lbl")).collect()[0][0]
        if s == prev_sum:
            break
        prev_sum = s
    else:
        raise RuntimeError("q286 min-label propagation did not converge")
    den = (
        comp.join(indeg, comp.node == indeg.dst)
        .groupBy(F.col("lbl").alias("comp"))
        .agg(F.sum("indeg").alias("comp_indeg"))
    )
    return (
        indeg.join(comp, indeg.dst == comp.node)
        .join(den, comp.lbl == den.comp)
        .select(
            F.col("dst").alias("authority"),
            F.col("indeg").cast("long").alias("indeg"),
            F.col("lbl").cast("long").alias("comp"),
            F.col("comp_indeg").cast("long").alias("comp_indeg"),
            (F.col("indeg").cast("double")
             / F.col("comp_indeg").cast("double")).alias("salsa"),
        )
    )


# --- conjunctive-query planning stats (q287) ----------------------------------


@query(
    "q287_conjunctive_planning",
    """WITH p AS (SELECT DISTINCT word, doc_id FROM
                    (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                     FROM documents)),
       dft AS (SELECT word, count(*) AS df FROM p GROUP BY word),
       v AS (SELECT word, df,
                    row_number() OVER (ORDER BY word) AS rnk
             FROM dft),
       q AS (SELECT i.range AS qid,
                    (i.range % 31) + 1 AS r1,
                    ((i.range * 7 + 3) % 31) + 1 AS r2
             FROM range(0, 10) i),
       qq AS (SELECT q.qid, v1.word AS t1, v1.df AS df1,
                     v2.word AS t2, v2.df AS df2
              FROM q JOIN v v1 ON v1.rnk = q.r1
                     JOIN v v2 ON v2.rnk = q.r2),
       bq AS (SELECT qq.qid, count(*) AS n_both
                FROM qq JOIN p p1 ON p1.word = qq.t1
                        JOIN p p2 ON p2.word = qq.t2
                               AND p2.doc_id = p1.doc_id
                GROUP BY qq.qid)
       SELECT qq.qid, qq.t1, qq.t2,
              CAST(qq.df1 AS BIGINT) AS df1,
              CAST(qq.df2 AS BIGINT) AS df2,
              CAST(coalesce(bq.n_both, 0) AS BIGINT) AS n_both,
              CASE WHEN qq.df1 < qq.df2
                     OR (qq.df1 = qq.df2 AND qq.t1 < qq.t2)
                   THEN qq.t1 ELSE qq.t2 END AS planned_first
       FROM qq LEFT JOIN bq USING (qid)""",
)
def q287(spark, sf_dir):
    """Conjunctive (AND) query planning statistics — the
    rarest-term-first decision every posting-list intersection makes:
    for a deterministic 10-query workload over the lexicon (term
    ranks (i%31)+1 and ((i*7+3)%31)+1, never equal on this range),
    emit both document frequencies, the exact intersection size, and
    the planned driving term = smaller (df, word) — the term whose
    postings the intersection scans first.  The df table is
    vocabulary-sized and broadcast; the intersection is a
    doc-keyed equi-join of two posting selections, never a full
    posting cross.  The lexicon ranking window runs over the BOUNDED
    vocabulary (31 rows), not the postings."""
    docs = _t(spark, sf_dir, "documents")
    p = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    dft = p.groupBy("word").agg(F.count("*").alias("df"))
    v = dft.select(
        "word", "df",
        F.row_number().over(Window.orderBy("word")).alias("rnk"),
    )
    q = spark.range(0, 10).select(
        F.col("id").alias("qid"),
        ((F.col("id") % 31) + 1).alias("r1"),
        (((F.col("id") * 7 + 3) % 31) + 1).alias("r2"),
    )
    v1 = v.select(F.col("rnk").alias("r1"), F.col("word").alias("t1"),
                  F.col("df").alias("df1"))
    v2 = v.select(F.col("rnk").alias("r2"), F.col("word").alias("t2"),
                  F.col("df").alias("df2"))
    qq = q.join(F.broadcast(v1), "r1").join(F.broadcast(v2), "r2")
    both = (
        qq.select("qid", "t1", "t2")
        .join(p.withColumnRenamed("word", "t1"), "t1")
        .join(p.withColumnRenamed("word", "t2"), ["t2", "doc_id"])
        .groupBy("qid")
        .agg(F.count("*").alias("n_both"))
    )
    return (
        qq.join(both, "qid", "left")
        .select(
            "qid", "t1", "t2",
            F.col("df1").cast("long").alias("df1"),
            F.col("df2").cast("long").alias("df2"),
            F.coalesce("n_both", F.lit(0)).cast("long").alias("n_both"),
            F.when(
                (F.col("df1") < F.col("df2"))
                | ((F.col("df1") == F.col("df2"))
                   & (F.col("t1") < F.col("t2"))),
                F.col("t1"),
            ).otherwise(F.col("t2")).alias("planned_first"),
        )
    )


# --- URL structural features for crawl prioritization (q288) ------------------


@query(
    "q288_url_features",
    """WITH u AS (SELECT doc_id,
                    'https://' ||
                    CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END ||
                    'site' || CAST(doc_id % 30 AS VARCHAR) || '.example.' ||
                    CASE doc_id % 4 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
                                    WHEN 2 THEN 'net' ELSE 'io' END ||
                    '/' || repeat('d/', CAST(doc_id % 5 AS INT)) ||
                    'p' || CAST(doc_id AS VARCHAR) ||
                    CASE WHEN doc_id % 3 = 0 THEN '?a=1&b=2' ELSE '' END ||
                    CASE WHEN doc_id % 7 = 0 THEN '#frag' ELSE '' END
                    AS url
                  FROM documents),
       f AS (SELECT doc_id, url,
                    regexp_extract(url, 'https://([^/]+)', 1) AS host,
                    regexp_extract(url, 'https://[^/]+(/[^?#]*)', 1)
                      AS path,
                    regexp_extract(url, '\\?([^#]*)', 1) AS qs
             FROM u)
       SELECT doc_id, url,
              CAST(length(host) AS BIGINT) AS host_len,
              CAST(CASE WHEN host LIKE 'www.%' THEN 1 ELSE 0 END AS BIGINT)
                AS is_www,
              CAST(length(path) - length(replace(path, '/', ''))
                AS BIGINT) AS path_depth,
              CAST(CASE WHEN qs = '' THEN 0
                        ELSE length(qs) - length(replace(qs, '&', '')) + 1
                   END AS BIGINT) AS n_params,
              CAST(CASE WHEN url LIKE '%#%' THEN 1 ELSE 0 END AS BIGINT)
                AS has_fragment
       FROM f""",
)
def q288(spark, sf_dir):
    """URL structural features — the crawl-prioritization signals
    (shallow paths and parameterless URLs crawl first; fragments and
    deep calendar-style paths demote): host length, www prefix, path
    depth (slash count), query-parameter count, fragment flag.  Pure
    JVM Column regex/length arithmetic (patterns inside the
    RE2/Java-regex common subset), zero Python, zero shuffle — a
    projection that runs at scan speed over 10^12 URLs."""
    docs = _t(spark, sf_dir, "documents")
    u = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            F.when(F.col("doc_id") % 2 == 0, F.lit("www.")).otherwise(""),
            F.lit("site"), (F.col("doc_id") % 30).cast("string"),
            F.lit(".example."),
            F.element_at(
                F.array(F.lit("com"), F.lit("org"), F.lit("net"),
                        F.lit("io")),
                (F.col("doc_id") % 4).cast("int") + 1,
            ),
            F.lit("/"),
            F.repeat(F.lit("d/"), (F.col("doc_id") % 5).cast("int")),
            F.lit("p"), F.col("doc_id").cast("string"),
            F.when(F.col("doc_id") % 3 == 0, F.lit("?a=1&b=2"))
            .otherwise(""),
            F.when(F.col("doc_id") % 7 == 0, F.lit("#frag")).otherwise(""),
        ).alias("url"),
    )
    f = u.select(
        "doc_id", "url",
        F.regexp_extract("url", "https://([^/]+)", 1).alias("host"),
        F.regexp_extract("url", "https://[^/]+(/[^?#]*)", 1).alias("path"),
        F.regexp_extract("url", "\\?([^#]*)", 1).alias("qs"),
    )
    return f.select(
        "doc_id", "url",
        F.length("host").cast("long").alias("host_len"),
        F.when(F.col("host").startswith("www."), 1).otherwise(0)
        .cast("long").alias("is_www"),
        (F.length("path")
         - F.length(F.replace(F.col("path"), F.lit("/"), F.lit(""))))
        .cast("long").alias("path_depth"),
        F.when(F.col("qs") == "", 0).otherwise(
            F.length("qs")
            - F.length(F.replace(F.col("qs"), F.lit("&"), F.lit(""))) + 1
        ).cast("long").alias("n_params"),
        F.when(F.col("url").contains("#"), 1).otherwise(0).cast("long")
        .alias("has_fragment"),
    )


# --- reciprocal-rank fusion of two retrieval rankings (q289) ------------------


@query(
    "q289_rrf_fusion",
    """WITH kw AS (SELECT doc_id,
                     len(list_filter(string_split(text, ' '),
                         x -> x = 'join')) AS tf
                   FROM documents),
       kwr AS (SELECT doc_id,
                      row_number() OVER (ORDER BY tf DESC, doc_id ASC)
                        AS rnk
               FROM kw),
       qv AS (SELECT list_transform(embedding,
                  x -> CAST(floor(CAST(x AS DOUBLE)*1000 + 0.5) AS BIGINT))
                  AS qq
              FROM embeddings WHERE vec_id = 0),
       dots AS (SELECT v.vec_id AS doc_id,
                  CAST(list_sum(list_transform(list_zip(qv.qq,
                     list_transform(v.embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE)*1000 + 0.5)
                            AS BIGINT))),
                     s -> s[1]*s[2])) AS BIGINT) AS dot
                FROM embeddings v, qv),
       emr AS (SELECT doc_id,
                      row_number() OVER (ORDER BY dot DESC, doc_id ASC)
                        AS rnk
               FROM dots),
       fused AS (SELECT k.doc_id,
                        CAST(1000000000 // (60 + k.rnk)
                             + 1000000000 // (60 + e.rnk) AS BIGINT)
                          AS rrf_scaled,
                        k.rnk AS kw_rank, e.rnk AS emb_rank
                 FROM kwr k JOIN emr e USING (doc_id)),
       top AS (SELECT doc_id, rrf_scaled, kw_rank, emb_rank,
                      row_number() OVER
                        (ORDER BY rrf_scaled DESC, doc_id ASC) AS fused_rank
               FROM fused)
       SELECT doc_id, CAST(kw_rank AS BIGINT) AS kw_rank,
              CAST(emb_rank AS BIGINT) AS emb_rank,
              rrf_scaled, CAST(fused_rank AS BIGINT) AS fused_rank
       FROM top WHERE fused_rank <= 20""",
)
def q289(spark, sf_dir):
    """Reciprocal-rank fusion (RRF, Cormack et al.) of a keyword
    ranking (tf of 'join', ties to low doc_id) and an embedding
    ranking (integer-quantized dot with query vector 0) — the
    standard hybrid-search merge, in EXACT integers: each ranking
    contributes floor(10^9/(60+rank)), so the fused score is a
    BIGINT and cross-engine order-free; final top-20 by (score desc,
    doc asc).  At fleet scale each ranking's row_number is computed
    within its shard/query group (here one query = one global
    window over the fixture; the ranking windows are per-query at
    scale, the q148/q266 serving pattern)."""
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    kw = docs.select(
        "doc_id",
        F.size(F.filter(F.split("text", " "),
                        lambda x: x == "join")).alias("tf"),
    )
    kwr = kw.select(
        "doc_id",
        F.row_number().over(
            Window.orderBy(F.col("tf").desc(), F.col("doc_id").asc())
        ).alias("kw_rank"),
    )
    qv = emb.filter("vec_id = 0").selectExpr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*1000 "
        "+ 0.5) AS BIGINT)) AS qq"
    )
    dots = emb.crossJoin(F.broadcast(qv)).selectExpr(
        "vec_id AS doc_id",
        "CAST(aggregate(zip_with(qq, transform(embedding, "
        "x -> CAST(floor(CAST(x AS DOUBLE)*1000 + 0.5) AS BIGINT)), "
        "(a, b) -> a * b), CAST(0 AS BIGINT), (acc, v) -> acc + v) "
        "AS BIGINT) AS dot",
    )
    emr = dots.select(
        "doc_id",
        F.row_number().over(
            Window.orderBy(F.col("dot").desc(), F.col("doc_id").asc())
        ).alias("emb_rank"),
    )
    fused = kwr.join(emr, "doc_id").select(
        "doc_id", "kw_rank", "emb_rank",
        (
            F.expr("CAST(1000000000 div (60 + kw_rank) AS BIGINT)")
            + F.expr("CAST(1000000000 div (60 + emb_rank) AS BIGINT)")
        ).alias("rrf_scaled"),
    )
    top = fused.select(
        "*",
        F.row_number().over(
            Window.orderBy(F.col("rrf_scaled").desc(),
                           F.col("doc_id").asc())
        ).alias("fused_rank"),
    ).filter(F.col("fused_rank") <= 20)
    return top.select(
        "doc_id",
        F.col("kw_rank").cast("long").alias("kw_rank"),
        F.col("emb_rank").cast("long").alias("emb_rank"),
        F.col("rrf_scaled").cast("long").alias("rrf_scaled"),
        F.col("fused_rank").cast("long").alias("fused_rank"),
    )


# --- PMI collocation extraction (q290) ----------------------------------------


@query(
    "q290_pmi_collocations",
    """WITH s AS (SELECT doc_id,
                    string_split(text ||
                      CASE WHEN doc_id % 6 = 0
                           THEN ' quantum flux quantum flux'
                           ELSE '' END, ' ') AS w
                  FROM documents),
       chk AS (SELECT CASE WHEN max(len(w)) > 199
                      THEN error('q290 oracle range(1,200) bound exceeded')
                      ELSE 1 END AS ok FROM s),
       bg AS (SELECT w[r.range] AS x, w[r.range + 1] AS y
              FROM s, range(1, 200) r
              WHERE r.range <= len(w) - 1),
       nxy AS (SELECT x, y, count(*) AS nxy FROM bg GROUP BY x, y),
       nx AS (SELECT x, count(*) AS nx FROM bg GROUP BY x),
       ny AS (SELECT y, count(*) AS ny FROM bg GROUP BY y),
       nn AS (SELECT count(*) AS n FROM bg)
       SELECT nxy.x, nxy.y,
              CAST(nxy.nxy AS BIGINT) AS nxy,
              CAST(nx.nx AS BIGINT) AS nx,
              CAST(ny.ny AS BIGINT) AS ny,
              CAST((length(bin(nxy.nxy * nn.n)) - 1)
                   - (length(bin(nx.nx * ny.ny)) - 1) AS BIGINT)
                AS pmi_bits
       FROM nxy JOIN nx USING (x) JOIN ny USING (y), nn, chk
       WHERE nxy.nxy >= 5
         AND nxy.nxy * nn.n >= 4 * nx.nx * ny.ny""",
)
def q290(spark, sf_dir):
    """PMI collocation extraction (Church-Hanks): word bigrams whose
    joint frequency beats independence by >= 2 bits (the exact
    cross-multiplied test nxy*N >= 4*nx*ny — no log, no float) and
    occur >= 5 times; the reported pmi_bits is the floor-log2 proxy
    (bin()-length difference, exact integers on both engines — the
    q242/q269 idiom).  Marginals here are BIGRAM-position marginals
    (x = left-position count, y = right-position count) so
    nxy <= min(nx, ny) by construction.  Three map-side-combinable
    counts + one broadcast-size marginal join; the bigram table
    shuffles once on the gram key at any corpus size."""
    docs = _t(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id",
        F.split(
            F.concat(
                F.col("text"),
                F.when(F.col("doc_id") % 6 == 0,
                       F.lit(" quantum flux quantum flux")).otherwise(""),
            ),
            " ",
        ).alias("w"),
    )
    bg = w.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(w) - 1), "
                "i -> struct(w[i - 1] AS x, w[i] AS y))"
            )
        ).alias("p")
    ).select("p.x", "p.y")
    nxy = bg.groupBy("x", "y").agg(F.count("*").alias("nxy"))
    nx = bg.groupBy("x").agg(F.count("*").alias("nx"))
    ny = bg.groupBy("y").agg(F.count("*").alias("ny"))
    nn = bg.agg(F.count("*").alias("n"))
    out = (
        nxy.join(F.broadcast(nx), "x")
        .join(F.broadcast(ny), "y")
        .crossJoin(F.broadcast(nn))
        .filter(
            (F.col("nxy") >= 5)
            & (F.col("nxy") * F.col("n") >= 4 * F.col("nx") * F.col("ny"))
        )
    )
    return out.select(
        "x", "y",
        F.col("nxy").cast("long").alias("nxy"),
        F.col("nx").cast("long").alias("nx"),
        F.col("ny").cast("long").alias("ny"),
        (
            (F.length(F.bin(F.col("nxy") * F.col("n"))) - 1)
            - (F.length(F.bin(F.col("nx") * F.col("ny"))) - 1)
        ).cast("long").alias("pmi_bits"),
    )


# --- link-prediction features over the host graph (q291) ----------------------


@query(
    "q291_link_prediction",
    """WITH h AS (SELECT DISTINCT doc_id % 60 AS hh FROM documents),
       e0 AS (SELECT hh, unnest([1, 2, 3]) AS j FROM h),
       ed AS (SELECT DISTINCT least(hh, (hh * j + j * j * 7) % 60) AS u,
                     greatest(hh, (hh * j + j * j * 7) % 60) AS v
              FROM e0 WHERE hh <> (hh * j + j * j * 7) % 60),
       adj AS (SELECT u AS a, v AS b FROM ed
               UNION ALL SELECT v, u FROM ed),
       deg AS (SELECT a, count(*) AS deg FROM adj GROUP BY a),
       wedge AS (SELECT n1.a AS x, n2.a AS y, n1.b AS z
                 FROM adj n1 JOIN adj n2
                   ON n1.b = n2.b AND n1.a < n2.a),
       cand AS (SELECT w.x, w.y, count(*) AS cn,
                       sum(1048576 // (length(bin(dz.deg)) - 1))
                         AS aa_scaled
                FROM wedge w JOIN deg dz ON dz.a = w.z
                LEFT JOIN ed ON ed.u = w.x AND ed.v = w.y
                WHERE ed.u IS NULL
                GROUP BY w.x, w.y)
       SELECT c.x, c.y,
              CAST(c.cn AS BIGINT) AS cn,
              CAST(du.deg AS BIGINT) AS deg_x,
              CAST(dv.deg AS BIGINT) AS deg_y,
              CAST(c.aa_scaled AS BIGINT) AS aa_scaled,
              CAST(CASE WHEN 5 * c.cn >= du.deg + dv.deg - c.cn
                        THEN 1 ELSE 0 END AS BIGINT) AS jaccard_ge_02
       FROM cand c JOIN deg du ON du.a = c.x
                   JOIN deg dv ON dv.a = c.y
       WHERE c.cn >= 2""",
)
def q291(spark, sf_dir):
    """Link-prediction features over the undirected host graph — the
    crawl-discovery ranking (which un-linked host pairs will link
    next): for every NON-edge pair with >= 2 common neighbors
    (wedge-join candidates, the q275 plan shape — work bounded by
    wedge count, never node^2), emit common-neighbor count, both
    degrees, the Adamic-Adar score in EXACT integers (each common
    neighbor z contributes floor(2^20 / floor(log2 deg(z))) via the
    bin()-length idiom — deg(z) >= 2 for any wedge center so the
    divisor is >= 1), and the exact cross-multiplied Jaccard >= 0.2
    flag (5*cn >= |union|).  Candidate generation is one adjacency
    self-join + one anti-join against the edge set, all host-keyed."""
    docs = _t(spark, sf_dir, "documents")
    h = docs.selectExpr("doc_id % 60 AS hh").distinct()
    e0 = h.select(
        "hh", F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("j")
    ).selectExpr("hh", "(hh * j + j * j * 7) % 60 AS t")
    ed = (
        e0.filter("hh <> t")
        .selectExpr("least(hh, t) AS u", "greatest(hh, t) AS v")
        .distinct()
        .localCheckpoint(eager=True)
    )
    adj = ed.selectExpr("u AS a", "v AS b").unionAll(
        ed.selectExpr("v AS a", "u AS b")
    )
    deg = adj.groupBy("a").agg(F.count("*").alias("deg"))
    n1 = adj.selectExpr("a AS x", "b AS z")
    n2 = adj.selectExpr("a AS y", "b AS z")
    wedge = n1.join(n2, "z").filter(F.col("x") < F.col("y"))
    cand = (
        wedge.join(F.broadcast(deg.selectExpr("a AS z", "deg AS dz")), "z")
        .join(
            ed.selectExpr("u AS x", "v AS y"), ["x", "y"], "left_anti"
        )
        .groupBy("x", "y")
        .agg(
            F.count("*").alias("cn"),
            F.sum(
                F.expr("CAST(1048576 div (length(bin(dz)) - 1) AS BIGINT)")
            ).alias("aa_scaled"),
        )
        .filter(F.col("cn") >= 2)
    )
    return (
        cand.join(F.broadcast(deg.selectExpr("a AS x", "deg AS deg_x")),
                  "x")
        .join(F.broadcast(deg.selectExpr("a AS y", "deg AS deg_y")), "y")
        .select(
            "x", "y",
            F.col("cn").cast("long").alias("cn"),
            F.col("deg_x").cast("long").alias("deg_x"),
            F.col("deg_y").cast("long").alias("deg_y"),
            F.col("aa_scaled").cast("long").alias("aa_scaled"),
            F.when(
                5 * F.col("cn")
                >= F.col("deg_x") + F.col("deg_y") - F.col("cn"),
                1,
            ).otherwise(0).cast("long").alias("jaccard_ge_02"),
        )
    )


# --- Matryoshka truncated-dimension recall (q292) -----------------------------


@query(
    "q292_truncated_recall",
    """WITH v AS (SELECT vec_id, list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE)*1000 + 0.5) AS BIGINT))
                    AS qv
             FROM embeddings),
       q AS (SELECT vec_id AS qid, qv AS qqv FROM v WHERE vec_id % 10 = 0),
       pr AS (SELECT q.qid, v.vec_id AS cand,
                 CAST(list_sum(list_transform(list_zip(q.qqv, v.qv),
                      s -> s[1]*s[2])) AS BIGINT) AS dot_full,
                 CAST(list_sum(list_transform(list_zip(q.qqv[1:16],
                      v.qv[1:16]), s -> s[1]*s[2])) AS BIGINT) AS dot_t
              FROM q JOIN v ON v.vec_id <> q.qid),
       rf AS (SELECT qid, cand,
                     row_number() OVER (PARTITION BY qid
                       ORDER BY dot_full DESC, cand ASC) AS rnk
              FROM pr),
       rt AS (SELECT qid, cand,
                     row_number() OVER (PARTITION BY qid
                       ORDER BY dot_t DESC, cand ASC) AS rnk
              FROM pr)
       SELECT rf.qid,
              CAST(count(rt.cand) AS BIGINT) AS overlap5
       FROM rf LEFT JOIN rt
         ON rt.qid = rf.qid AND rt.cand = rf.cand AND rt.rnk <= 5
       WHERE rf.rnk <= 5
       GROUP BY rf.qid""",
)
def q292(spark, sf_dir):
    """Matryoshka-style truncated-dimension retrieval eval: for each
    query vector, top-5 by full 64-dim integer-quantized dot vs
    top-5 by the first-16-dims dot, and the overlap between the two
    sets (recall@5 of the cheap truncated index against the full
    index — the measurement that decides whether a 4x-smaller ANN
    tier is good enough).  Both rankings use deterministic
    (dot desc, cand asc) order over exact BIGINT dots, so the result
    is engine-order-free; the per-query ranking windows are the
    fixture-scale stand-in for the IVF-prefiltered serving path
    (q127/q148), where each query ranks only its probed cells."""
    v = _t(spark, sf_dir, "embeddings").selectExpr(
        "vec_id",
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*1000 "
        "+ 0.5) AS BIGINT)) AS qv",
    )
    q = v.filter("vec_id % 10 = 0").selectExpr(
        "vec_id AS qid", "qv AS qqv")
    pr = (
        F.broadcast(q).join(v, F.col("vec_id") != F.col("qid"))
        .selectExpr(
            "qid", "vec_id AS cand",
            "CAST(aggregate(zip_with(qqv, qv, (a, b) -> a * b), "
            "CAST(0 AS BIGINT), (acc, s) -> acc + s) AS BIGINT) "
            "AS dot_full",
            "CAST(aggregate(zip_with(slice(qqv, 1, 16), "
            "slice(qv, 1, 16), (a, b) -> a * b), CAST(0 AS BIGINT), "
            "(acc, s) -> acc + s) AS BIGINT) AS dot_t",
        )
    )
    wf = Window.partitionBy("qid").orderBy(
        F.col("dot_full").desc(), F.col("cand").asc())
    wt = Window.partitionBy("qid").orderBy(
        F.col("dot_t").desc(), F.col("cand").asc())
    rf = pr.select("qid", "cand", F.row_number().over(wf).alias("rnk"))
    rt = pr.select("qid", "cand", F.row_number().over(wt).alias("rnk"))
    rts = rt.filter(F.col("rnk") <= 5).select(
        F.col("qid").alias("tqid"), F.col("cand").alias("tcand"))
    return (
        rf.filter(F.col("rnk") <= 5)
        .join(
            rts,
            (F.col("qid") == F.col("tqid"))
            & (F.col("cand") == F.col("tcand")),
            "left",
        )
        .groupBy("qid")
        .agg(F.count("tcand").cast("long").alias("overlap5"))
    )


# --- rendezvous (HRW) hashing shard assignment (q293) -------------------------


@query(
    "q293_rendezvous_hashing",
    """WITH u AS (SELECT DISTINCT 'u' || CAST(doc_id AS VARCHAR) AS url
                  FROM documents),
       wts AS (SELECT url, s.range AS shard,
                 CAST(CAST('0x' || substr(md5('hrw' ||
                        CAST(s.range AS VARCHAR) || ':' || url), 1, 8)
                      AS UBIGINT) AS BIGINT) AS w
               FROM u, range(0, 8) s),
       a8 AS (SELECT url,
                     max(w * 8 + (7 - shard)) AS code8
              FROM wts GROUP BY url),
       a7 AS (SELECT url,
                     max(w * 8 + (7 - shard)) AS code7
              FROM wts WHERE shard < 7 GROUP BY url),
       asg AS (SELECT a8.url,
                      7 - (a8.code8 % 8) AS s8,
                      7 - (a7.code7 % 8) AS s7
               FROM a8 JOIN a7 USING (url))
       SELECT s7 AS shard,
              CAST(sum(CASE WHEN s8 = s7 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_stable,
              CAST(sum(CASE WHEN s8 <> s7 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_moved_in,
              CAST(count(*) AS BIGINT) AS n_after
       FROM asg GROUP BY s7""",
)
def q293(spark, sf_dir):
    """Rendezvous (highest-random-weight) hashing — the shard
    assignment rule crawl fleets use so that REMOVING a fetcher node
    moves only that node's URLs (minimal disruption, Thaler-Ravishankar):
    every (url, shard) pair gets an md5-derived integer weight
    (pinned conv/UBIGINT idiom) and the url goes to the max-weight
    shard, encoded as the single combinable integer argmax
    w*8 + (7-shard) (ties to the LOWEST shard id by construction).
    The query assigns each url under 8 shards and again under 7
    (shard 7 removed) and emits per-shard stability accounting —
    n_moved_in sums exactly to the removed shard's former load, the
    HRW invariant, pinned in pytest.  Two map-side-combinable
    argmaxes; at 10^12 URLs nothing shuffles except the 8-row weight
    explode feeding a url-keyed combine."""
    docs = _t(spark, sf_dir, "documents")
    u = docs.select(
        F.concat(F.lit("u"), F.col("doc_id").cast("string")).alias("url")
    ).distinct()
    wts = u.select(
        "url", F.explode(F.sequence(F.lit(0), F.lit(7))).alias("shard")
    ).withColumn(
        "w",
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("hrw"), F.col("shard").cast("string"),
                               F.lit(":"), F.col("url"))),
                1, 8,
            ),
            16, 10,
        ).cast("long"),
    )
    code = (F.col("w") * 8 + (7 - F.col("shard")))
    a8 = wts.groupBy("url").agg(F.max(code).alias("code8"))
    a7 = (
        wts.filter(F.col("shard") < 7)
        .groupBy("url")
        .agg(F.max(code).alias("code7"))
    )
    asg = a8.join(a7, "url").select(
        "url",
        (7 - F.col("code8") % 8).alias("s8"),
        (7 - F.col("code7") % 8).alias("s7"),
    )
    return asg.groupBy(F.col("s7").alias("shard")).agg(
        F.sum(F.when(F.col("s8") == F.col("s7"), 1).otherwise(0))
        .cast("long").alias("n_stable"),
        F.sum(F.when(F.col("s8") != F.col("s7"), 1).otherwise(0))
        .cast("long").alias("n_moved_in"),
        F.count("*").cast("long").alias("n_after"),
    )


# --- log-bin histogram quantile estimation vs exact (q294) --------------------


@query(
    "q294_logbin_quantiles",
    """WITH v AS (SELECT n_chars AS val FROM documents),
       n AS (SELECT count(*) AS n FROM v),
       exact_t AS (SELECT val, count(*) AS c FROM v GROUP BY val),
       cum AS (SELECT val,
                      sum(c) OVER (ORDER BY val
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS cum
               FROM exact_t),
       bins AS (SELECT length(bin(val)) AS b, count(*) AS c FROM v
                GROUP BY length(bin(val))),
       bcum AS (SELECT b,
                       sum(c) OVER (ORDER BY b
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         AS cum
                FROM bins),
       pcts AS (SELECT p.p, p.num, p.den FROM
                  (VALUES (50, 1, 2), (90, 9, 10), (99, 99, 100))
                  p(p, num, den)),
       ex AS (SELECT pcts.p, min(cum.val) AS exact_val
              FROM pcts CROSS JOIN n CROSS JOIN cum
              WHERE cum.cum * pcts.den >= n.n * pcts.num
              GROUP BY pcts.p),
       es AS (SELECT pcts.p,
                     CAST((CAST(1 AS BIGINT) << CAST(min(bcum.b) AS INT))
                          - 1 AS BIGINT) AS est_hi
              FROM pcts CROSS JOIN n CROSS JOIN bcum
              WHERE bcum.cum * pcts.den >= n.n * pcts.num
              GROUP BY pcts.p)
       SELECT ex.p AS pct,
              CAST(ex.exact_val AS BIGINT) AS exact_val,
              es.est_hi,
              CAST(es.est_hi AS DOUBLE) / CAST(ex.exact_val AS DOUBLE)
                AS overestimate
       FROM ex JOIN es ON es.p = ex.p""",
)
def q294(spark, sf_dir):
    """Log-binned histogram quantile estimation vs exact percentiles —
    the one-pass mergeable sketch (power-of-two bins, the HdrHistogram
    / DDSketch family idea with base 2) a fleet uses for latency and
    doc-length percentiles when exact sorting 10^12 values is off the
    table: bin = bin()-length (floor-log2 + 1, exact integers), the
    estimate for percentile p is the upper edge 2^b - 1 of the first
    bin whose EXACT integer cross-multiplied cumulative passes
    p (cum*den >= n*num — no float thresholds), and the exact value
    computed alongside quantifies the relative-error guarantee (the
    bound is 2x for base-2 bins).  The cumulative windows run over
    the BOUNDED distinct-value / bin tables, not the corpus."""
    docs = _t(spark, sf_dir, "documents")
    v = docs.select(F.col("n_chars").alias("val"))
    n = v.agg(F.count("*").alias("n"))
    exact_t = v.groupBy("val").agg(F.count("*").alias("c"))
    wv = Window.orderBy("val").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    cum = exact_t.select("val", F.sum("c").over(wv).alias("cum"))
    bins = v.groupBy(F.length(F.bin("val")).alias("b")).agg(
        F.count("*").alias("c"))
    wb = Window.orderBy("b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    bcum = bins.select("b", F.sum("c").over(wb).alias("cum"))
    pcts = spark.createDataFrame(
        [(50, 1, 2), (90, 9, 10), (99, 99, 100)], "p INT, num INT, den INT"
    )
    ex = (
        F.broadcast(pcts).crossJoin(F.broadcast(n))
        .join(cum, F.col("cum") * F.col("den") >= F.col("n") * F.col("num"))
        .groupBy("p").agg(F.min("val").alias("exact_val"))
    )
    es = (
        F.broadcast(pcts).crossJoin(F.broadcast(n))
        .join(bcum, F.col("cum") * F.col("den") >= F.col("n") * F.col("num"))
        .groupBy("p")
        .agg(
            (
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(min(b) AS INT))")
                - 1
            ).cast("long").alias("est_hi")
        )
    )
    return ex.join(es, "p").select(
        F.col("p").alias("pct"),
        F.col("exact_val").cast("long").alias("exact_val"),
        F.col("est_hi").cast("long").alias("est_hi"),
        (F.col("est_hi").cast("double")
         / F.col("exact_val").cast("double")).alias("overestimate"),
    )


# --- KWIC snippet extraction (q295) -------------------------------------------


@query(
    "q295_kwic_snippets",
    """WITH s AS (SELECT doc_id, string_split(text, ' ') AS w
                  FROM documents),
       chk AS (SELECT CASE WHEN max(len(w)) > 199
                      THEN error('q295 oracle range(1,200) bound exceeded')
                      ELSE 1 END AS ok FROM s),
       hits AS (SELECT doc_id, r.range AS pos, len(w) AS lw, w
                FROM s, range(1, 200) r
                WHERE r.range <= len(w) AND w[r.range] = 'join')
       SELECT doc_id, CAST(pos AS BIGINT) AS pos,
              array_to_string(
                w[greatest(1, pos - 2):least(lw, pos + 2)], ' ')
                AS snippet
       FROM hits, chk""",
)
def q295(spark, sf_dir):
    """KWIC (keyword-in-context) snippet extraction for the probe
    term 'join' — the search-result surface op: every occurrence
    position plus a +-2-word window joined back to a string.  Pure
    per-row array HOFs (position filter + slice + array_join), LINEAR
    work per row (the interpreted-HOF contract: per-row lambdas are
    fine when per-row work is ~O(L)); zero shuffle — snippet
    generation runs at scan speed next to the posting lookup at any
    corpus size."""
    docs = _t(spark, sf_dir, "documents")
    s = docs.select("doc_id", F.split("text", " ").alias("w"))
    hits = s.select(
        "doc_id",
        F.size("w").alias("lw"),
        "w",
        F.explode(
            F.expr("filter(sequence(1, size(w)), i -> w[i - 1] = 'join')")
        ).alias("pos"),
    )
    return hits.select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        F.array_join(
            F.expr(
                "slice(w, greatest(1, pos - 2), "
                "least(lw, pos + 2) - greatest(1, pos - 2) + 1)"
            ),
            " ",
        ).alias("snippet"),
    )


# --- bipartite parity check per component (q296) ------------------------------


@query(
    "q296_bipartite_check",
    """WITH RECURSIVE ed AS (
         SELECT i.range AS u, (i.range + 1) % 12 AS v FROM range(0, 12) i
         UNION ALL
         SELECT 20 + i.range, 20 + (i.range + 1) % 9 FROM range(0, 9) i),
       und AS (SELECT u, v FROM ed UNION SELECT v, u FROM ed),
       seeds AS (SELECT 0 AS root, 0 AS node
                 UNION ALL SELECT 20, 20),
       bfs AS (SELECT root, node, 0 AS d FROM seeds
               UNION
               SELECT b.root, e.v, b.d + 1
               FROM bfs b JOIN und e ON e.u = b.node
               WHERE b.d < 16),
       dist AS (SELECT root, node, min(d) AS d FROM bfs
                GROUP BY root, node),
       conf AS (SELECT d1.root, count(*) AS n_conf
                FROM ed JOIN dist d1 ON d1.node = ed.u
                        JOIN dist d2 ON d2.node = ed.v
                               AND d2.root = d1.root
                WHERE (d1.d + d2.d) % 2 = 0
                GROUP BY d1.root)
       SELECT d.root AS component,
              CAST(count(*) AS BIGINT) AS n_nodes,
              CAST(coalesce(max(c.n_conf), 0) AS BIGINT) AS n_conflicts,
              CAST(CASE WHEN coalesce(max(c.n_conf), 0) = 0 THEN 1 ELSE 0
                   END AS BIGINT) AS is_bipartite
       FROM dist d LEFT JOIN conf c ON c.root = d.root
       GROUP BY d.root""",
)
def q296(spark, sf_dir):
    """Bipartiteness check by parity BFS — the hub/authority
    two-sidedness test on crawl subgraphs (a bipartite component
    behaves like a clean site/resource structure; an odd cycle breaks
    2-coloring): round-synchronous BFS from each component seed
    (frontier join + min-dist keep, loud 20-round cap), then one edge
    pass counting SAME-parity endpoints — any such edge certifies an
    odd cycle.  Fixture: a 12-cycle (even, bipartite) and a 9-cycle
    (odd, one certificate edge per odd cycle... counted exactly).
    The oracle closes min-distances with a recursive CTE.  Each BFS
    round is one frontier equi-join, the standard distributed BFS
    shape; rounds = component diameter."""
    spark_range = spark.range(0, 12).selectExpr(
        "CAST(id AS BIGINT) AS u", "CAST((id + 1) % 12 AS BIGINT) AS v")
    odd = spark.range(0, 9).selectExpr(
        "CAST(20 + id AS BIGINT) AS u",
        "CAST(20 + (id + 1) % 9 AS BIGINT) AS v")
    ed = spark_range.unionAll(odd).localCheckpoint(eager=True)
    und = (
        ed.select("u", "v")
        .unionAll(ed.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    dist = spark.createDataFrame(
        [(0, 0, 0), (20, 20, 0)], "root LONG, node LONG, d LONG"
    ).localCheckpoint(eager=True)
    frontier = dist
    for _round in range(20):
        nxt = (
            frontier.join(und, frontier.node == und.u)
            .select("root", F.col("v").alias("node"),
                    (F.col("d") + 1).alias("d"))
            .groupBy("root", "node").agg(F.min("d").alias("d"))
            .join(dist.select("root", "node").withColumn("_s", F.lit(1)),
                  ["root", "node"], "left")
            .filter(F.col("_s").isNull())
            .select("root", "node", "d")
            .localCheckpoint(eager=True)
        )
        if nxt.count() == 0:
            break
        dist = dist.unionAll(nxt).localCheckpoint(eager=True)
        frontier = nxt
    else:
        raise RuntimeError("q296 BFS did not converge in 20 rounds")
    d1 = dist.selectExpr("root", "node AS u", "d AS du")
    d2 = dist.selectExpr("root AS r2", "node AS v2", "d AS dv")
    conf = (
        ed.join(d1, "u")
        .join(d2, (F.col("v") == F.col("v2"))
                  & (F.col("root") == F.col("r2")))
        .filter((F.col("du") + F.col("dv")) % 2 == 0)
        .groupBy("root").agg(F.count("*").alias("n_conf"))
    )
    return (
        dist.groupBy(F.col("root").alias("component"))
        .agg(F.count("*").alias("n_nodes"))
        .join(conf.withColumnRenamed("root", "component"),
              "component", "left")
        .select(
            "component",
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.coalesce("n_conf", F.lit(0)).cast("long")
            .alias("n_conflicts"),
            F.when(F.coalesce("n_conf", F.lit(0)) == 0, 1).otherwise(0)
            .cast("long").alias("is_bipartite"),
        )
    )


# --- bigram backoff LM surprisal scoring (q297) -------------------------------


@query(
    "q297_bigram_lm_surprisal",
    """WITH s AS (SELECT doc_id, string_split(text, ' ') AS w
                  FROM documents),
       chk AS (SELECT CASE WHEN max(len(w)) > 199
                      THEN error('q297 oracle range(1,200) bound exceeded')
                      ELSE 1 END AS ok FROM s),
       tr AS (SELECT w FROM s WHERE doc_id % 2 = 0),
       trbg AS (SELECT w[r.range] AS x, w[r.range + 1] AS y
                FROM tr, range(1, 200) r WHERE r.range <= len(w) - 1),
       c2 AS (SELECT x, y, count(*) AS c2 FROM trbg GROUP BY x, y),
       c1 AS (SELECT x, count(*) AS c1 FROM trbg GROUP BY x),
       cy AS (SELECT y, count(*) AS cy FROM trbg GROUP BY y),
       n1 AS (SELECT count(*) AS n FROM trbg),
       ho AS (SELECT doc_id, w[r.range] AS x, w[r.range + 1] AS y
              FROM s, range(1, 200) r
              WHERE doc_id % 2 = 1 AND r.range <= len(w) - 1),
       sc AS (SELECT ho.doc_id,
                     CASE WHEN c2.c2 IS NOT NULL THEN
                       (length(bin(c1.c1)) - 1) - (length(bin(c2.c2)) - 1)
                     ELSE
                       8 + (length(bin(n1.n)) - 1)
                         - (length(bin(coalesce(cy.cy, 0) + 1)) - 1)
                     END AS bits,
                     CASE WHEN c2.c2 IS NULL THEN 1 ELSE 0 END AS backoff
              FROM ho
              LEFT JOIN c2 ON c2.x = ho.x AND c2.y = ho.y
              LEFT JOIN c1 ON c1.x = ho.x
              LEFT JOIN cy ON cy.y = ho.y
              CROSS JOIN n1)
       SELECT sc.doc_id,
              CAST(sum(sc.bits) AS BIGINT) AS surprisal_bits,
              CAST(sum(sc.backoff) AS BIGINT) AS n_backoffs,
              CAST(count(*) AS BIGINT) AS n_bigrams
       FROM sc, chk GROUP BY sc.doc_id""",
)
def q297(spark, sf_dir):
    """Bigram backoff language-model surprisal — the LM-quality
    filtering pass (CCNet/Dolma style) one level deeper than q243's
    unigram: train bigram/unigram counts on even doc_ids, score the
    held-out odd docs; a seen bigram costs the integer surprisal
    proxy bits(c1(x)) - bits(c2(x,y)) (~ -log2 p(y|x) via the
    bin()-length floor-log2 idiom — NO transcendental anywhere), an
    unseen one pays a fixed 8-bit backoff penalty plus the
    add-one-smoothed unigram cost bits(N) - bits(cy+1).  The c2 join
    keys on the bigram, the unigram sides broadcast; per-doc
    aggregation is one map-side-combinable integer sum.  Backoff
    count rides along (the OOV-rate signal)."""
    docs = _t(spark, sf_dir, "documents")
    s = docs.select("doc_id", F.split("text", " ").alias("w"))
    bg = lambda df: df.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, size(w) - 1), "
                   "i -> struct(w[i - 1] AS x, w[i] AS y))")
        ).alias("p"),
    ).select("doc_id", "p.x", "p.y")
    trbg = bg(s.filter(F.col("doc_id") % 2 == 0))
    c2 = trbg.groupBy("x", "y").agg(F.count("*").alias("c2"))
    c1 = trbg.groupBy("x").agg(F.count("*").alias("c1"))
    cy = trbg.groupBy("y").agg(F.count("*").alias("cy"))
    n1 = trbg.agg(F.count("*").alias("n"))
    ho = bg(s.filter(F.col("doc_id") % 2 == 1))
    sc = (
        ho.join(c2, ["x", "y"], "left")
        .join(F.broadcast(c1), "x", "left")
        .join(F.broadcast(cy), "y", "left")
        .crossJoin(F.broadcast(n1))
        .select(
            "doc_id",
            F.when(
                F.col("c2").isNotNull(),
                (F.length(F.bin("c1")) - 1) - (F.length(F.bin("c2")) - 1),
            ).otherwise(
                8 + (F.length(F.bin("n")) - 1)
                - (F.length(F.bin(F.coalesce("cy", F.lit(0)) + 1)) - 1)
            ).alias("bits"),
            F.when(F.col("c2").isNull(), 1).otherwise(0).alias("backoff"),
        )
    )
    return sc.groupBy("doc_id").agg(
        F.sum("bits").cast("long").alias("surprisal_bits"),
        F.sum("backoff").cast("long").alias("n_backoffs"),
        F.count("*").cast("long").alias("n_bigrams"),
    )


# --- WAND block upper-bound pruning accounting (q298) -------------------------


@query(
    "q298_wand_block_pruning",
    """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                  FROM documents),
       tf AS (SELECT word, doc_id, count(*) AS tf FROM w
              GROUP BY word, doc_id),
       nd AS (SELECT count(DISTINCT doc_id) AS ndocs FROM w),
       dft AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
       blk AS (SELECT tf.word, tf.doc_id // 64 AS blk,
                      max(tf.tf) AS max_tf, count(*) AS n_docs
               FROM tf GROUP BY tf.word, tf.doc_id // 64),
       ub AS (SELECT blk.word, blk.blk, blk.n_docs,
                     blk.max_tf * (1 + (length(bin(nd.ndocs)) - 1)
                                     - (length(bin(dft.df)) - 1))
                       AS score_ub
              FROM blk JOIN dft USING (word) CROSS JOIN nd)
       SELECT word,
              CAST(count(*) AS BIGINT) AS n_blocks,
              CAST(sum(CASE WHEN score_ub < 12 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pruned,
              CAST(sum(CASE WHEN score_ub < 12 THEN n_docs ELSE 0 END)
                AS BIGINT) AS docs_skipped
       FROM ub GROUP BY word""",
)
def q298(spark, sf_dir):
    """Block-max WAND pruning accounting (Broder 2003 / Ding-Suel
    block-max): per term, postings split into 64-doc blocks, each
    block stores its max term frequency; a block's score upper bound
    max_tf * (1 + idf_bits) (idf_bits = bits(N) - bits(df), the
    integer floor-log2 idiom) lets the scorer SKIP every block whose
    bound misses the threshold (fixed 12 here) — the accounting
    emits per term how many blocks and how many postings the bound
    would prune.  This is the index-serving capacity question (what
    fraction of postings does WAND never touch) answered in exact
    integers: one (word, block) aggregation + a broadcast df/N join."""
    docs = _t(spark, sf_dir, "documents")
    w = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    tf = w.groupBy("word", "doc_id").agg(F.count("*").alias("tf"))
    nd = w.agg(F.countDistinct("doc_id").alias("ndocs"))
    dft = tf.groupBy("word").agg(F.count("*").alias("df"))
    blk = tf.groupBy(
        "word", F.expr("doc_id div 64").alias("blk")
    ).agg(F.max("tf").alias("max_tf"), F.count("*").alias("n_docs"))
    ub = (
        blk.join(F.broadcast(dft), "word")
        .crossJoin(F.broadcast(nd))
        .select(
            "word", "blk", "n_docs",
            (
                F.col("max_tf")
                * (1 + (F.length(F.bin("ndocs")) - 1)
                   - (F.length(F.bin("df")) - 1))
            ).alias("score_ub"),
        )
    )
    return ub.groupBy("word").agg(
        F.count("*").cast("long").alias("n_blocks"),
        F.sum(F.when(F.col("score_ub") < 12, 1).otherwise(0)).cast("long")
        .alias("n_pruned"),
        F.sum(F.when(F.col("score_ub") < 12, F.col("n_docs")).otherwise(0))
        .cast("long").alias("docs_skipped"),
    )


# --- recrawl change-rate estimation (q299) ------------------------------------


@query(
    "q299_change_rate",
    """WITH f AS (SELECT doc_id, t.range AS t,
                    (t.range * (1 + doc_id % 4)) // 5 AS ver
                  FROM documents, range(0, 10) t),
       ch AS (SELECT a.doc_id,
                     sum(CASE WHEN a.ver <> b.ver THEN 1 ELSE 0 END)
                       AS n_changes
              FROM f a JOIN f b
                ON b.doc_id = a.doc_id AND b.t = a.t - 1
              GROUP BY a.doc_id)
       SELECT doc_id,
              CAST(n_changes AS BIGINT) AS n_changes,
              CAST(n_changes AS DOUBLE) / 9.0 AS rate_per_fetch,
              CASE WHEN n_changes * 2 >= 9 THEN 'hot'
                   WHEN n_changes >= 2 THEN 'warm'
                   ELSE 'cold' END AS revisit_class
       FROM ch""",
)
def q299(spark, sf_dir):
    """Recrawl change-rate estimation (the Cho-Garcia-Molina
    freshness input): 10 simulated fetches per URL with a
    deterministic integer version step ver(t) = t*(1+doc%4) div 5;
    changes counted by joining each fetch to its predecessor on
    (doc, t-1) — NO window, the self-join keys on the url and works
    shard-local at 10^12 rows; the per-fetch change rate is one
    division and the revisit class (hot: rate >= 1/2, warm: >= 2
    changes, cold) is decided by exact integer cross-multiplication.
    The scheduler consumes the class to set per-URL revisit
    intervals."""
    docs = _t(spark, sf_dir, "documents")
    f = docs.select(
        "doc_id", F.explode(F.sequence(F.lit(0), F.lit(9))).alias("t")
    ).select(
        "doc_id", "t",
        F.expr("(t * (1 + doc_id % 4)) div 5").alias("ver"),
    )
    b = f.selectExpr("doc_id", "t + 1 AS t", "ver AS prev_ver")
    ch = (
        f.join(b, ["doc_id", "t"])
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("ver") != F.col("prev_ver"), 1).otherwise(0)
            ).alias("n_changes")
        )
    )
    return ch.select(
        "doc_id",
        F.col("n_changes").cast("long").alias("n_changes"),
        (F.col("n_changes").cast("double") / F.lit(9.0))
        .alias("rate_per_fetch"),
        F.when(F.col("n_changes") * 2 >= 9, "hot")
        .when(F.col("n_changes") >= 2, "warm")
        .otherwise("cold").alias("revisit_class"),
    )


# --- host reputation scorecard (q300) -----------------------------------------


@query(
    "q300_host_scorecard",
    """WITH d AS (SELECT doc_id % 40 AS host, doc_id, text, lang, n_chars,
                         md5(text) AS h
                  FROM documents),
       dup AS (SELECT host, count(*) AS n_docs,
                      count(DISTINCT h) AS n_unique,
                      count(DISTINCT lang) AS n_langs,
                      sum(n_chars) AS total_chars
               FROM d GROUP BY host),
       e AS (SELECT DISTINCT doc_id % 40 AS src,
                    (doc_id * 7 + doc_id // 40) % 40 AS dst
             FROM documents),
       er AS (SELECT e.src AS host, count(*) AS n_recip
              FROM e JOIN e r ON r.src = e.dst AND r.dst = e.src
              WHERE e.src <> e.dst
              GROUP BY e.src)
       SELECT dup.host,
              CAST(dup.n_docs AS BIGINT) AS n_docs,
              CAST(dup.n_docs - dup.n_unique AS BIGINT) AS n_dup_docs,
              CAST(dup.n_langs AS BIGINT) AS n_langs,
              CAST(dup.total_chars AS BIGINT) AS total_chars,
              CAST(coalesce(er.n_recip, 0) AS BIGINT) AS n_recip_links,
              CAST(dup.n_docs - dup.n_unique AS DOUBLE)
                / CAST(dup.n_docs AS DOUBLE) AS dup_rate
       FROM dup LEFT JOIN er ON er.host = dup.host""",
)
def q300(spark, sf_dir):
    """Host reputation scorecard — the per-host aggregation a crawl
    policy actually consumes, composing four signals in one pass:
    document count, exact-duplicate count (md5 content hash — the
    q17/q273 dedup key), language diversity, total bytes, and the
    reciprocal-link count from the q257 spam-signal join; dup_rate
    is one division over exact integers.  Everything keys on host:
    one groupBy over documents + one reversed edge self-equi-join —
    at 10^12 docs the scorecard is a straight map-side-combinable
    rollup, no row ever leaves its host shard except the edge pass."""
    docs = _t(spark, sf_dir, "documents")
    d = docs.select(
        (F.col("doc_id") % 40).alias("host"),
        "lang", "n_chars", F.md5("text").alias("h"),
    )
    dup = d.groupBy("host").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("h").alias("n_unique"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("n_chars").alias("total_chars"),
    )
    e = (
        docs.selectExpr(
            "doc_id % 40 AS src",
            "(doc_id * 7 + doc_id div 40) % 40 AS dst",
        )
        .distinct()
    )
    r = e.selectExpr("dst AS src", "src AS dst")
    er = (
        e.join(r, ["src", "dst"])
        .filter(F.col("src") != F.col("dst"))
        .groupBy(F.col("src").alias("host"))
        .agg(F.count("*").alias("n_recip"))
    )
    return dup.join(er, "host", "left").select(
        "host",
        F.col("n_docs").cast("long").alias("n_docs"),
        (F.col("n_docs") - F.col("n_unique")).cast("long")
        .alias("n_dup_docs"),
        F.col("n_langs").cast("long").alias("n_langs"),
        F.col("total_chars").cast("long").alias("total_chars"),
        F.coalesce("n_recip", F.lit(0)).cast("long")
        .alias("n_recip_links"),
        (
            (F.col("n_docs") - F.col("n_unique")).cast("double")
            / F.col("n_docs").cast("double")
        ).alias("dup_rate"),
    )


# --- SymSpell deletion-join spelling correction (q301) ------------------------


@query(
    "q301_symspell_correction",
    """WITH w AS (SELECT word, count(*) AS df FROM
                    (SELECT unnest(string_split(text, ' ')) AS word
                     FROM documents)
                  GROUP BY word),
       vr AS (SELECT word, df, row_number() OVER (ORDER BY word) AS rnk
              FROM w),
       vkeys AS (SELECT word, df, word AS k FROM w
                 UNION
                 SELECT w.word, w.df,
                        substr(w.word, 1, i.range - 1) ||
                        substr(w.word, i.range + 1,
                               length(w.word) - i.range) AS k
                 FROM w, range(1, 20) i
                 WHERE i.range <= length(w.word)),
       probes AS (SELECT p.range AS pid, vr.word AS orig,
                         substr(vr.word, 1,
                                (p.range % length(vr.word))) ||
                         substr(vr.word,
                                (p.range % length(vr.word)) + 2,
                                length(vr.word)
                                  - (p.range % length(vr.word)) - 1)
                           AS typo
                  FROM range(0, 10) p
                  JOIN vr ON vr.rnk = (p.range * 3) + 1),
       pkeys AS (SELECT pid, typo, typo AS k FROM probes
                 UNION
                 SELECT p.pid, p.typo,
                        substr(p.typo, 1, i.range - 1) ||
                        substr(p.typo, i.range + 1,
                               length(p.typo) - i.range) AS k
                 FROM probes p, range(1, 20) i
                 WHERE i.range <= length(p.typo)),
       cand AS (SELECT DISTINCT pk.pid, pk.typo, vk.word, vk.df
                FROM pkeys pk JOIN vkeys vk ON vk.k = pk.k),
       m AS (SELECT pid, max(df) AS mdf, count(*) AS n_candidates
             FROM cand GROUP BY pid),
       best AS (SELECT c.pid, min(c.word) AS correction
                FROM cand c JOIN m ON m.pid = c.pid AND c.df = m.mdf
                GROUP BY c.pid)
       SELECT m.pid, p.typo, b.correction,
              CAST(m.mdf AS BIGINT) AS cand_df,
              CAST(m.n_candidates AS BIGINT) AS n_candidates
       FROM m JOIN best b ON b.pid = m.pid
       JOIN (SELECT DISTINCT pid, typo FROM probes) p ON p.pid = m.pid""",
)
def q301(spark, sf_dir):
    """SymSpell-style spelling correction by DELETION-KEY join (the
    query-rewrite op a search frontend runs): every lexicon word
    contributes itself plus all single-char-deletion variants as
    match keys; a typo (here: 10 lexicon words with one deterministic
    char dropped) matches any lexicon word sharing a key — edit
    distance <= 2 by the SymSpell property, with NO pairwise edit
    distance computed; the correction is the max-frequency candidate
    (ties to lexicographically-least).  Key tables are linear in
    total word length; the join is key-equi and broadcastable at any
    corpus size (lexicon-bounded, never corpus-bounded)."""
    docs = _t(spark, sf_dir, "documents")
    w = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word").agg(F.count("*").alias("df"))
    )
    dels = (
        "transform(sequence(1, length({c})), "
        "i -> concat(substring({c}, 1, i - 1), "
        "substring({c}, i + 1, length({c}) - i)))"
    )
    vkeys = w.select("word", "df", F.col("word").alias("k")).unionByName(
        w.select(
            "word", "df",
            F.explode(F.expr(dels.format(c="word"))).alias("k"),
        )
    ).distinct()
    vr = w.select(
        "word", F.row_number().over(Window.orderBy("word")).alias("rnk")
    )
    probes = (
        spark.range(0, 10).selectExpr("id AS pid", "id * 3 + 1 AS rnk")
        .join(F.broadcast(vr), "rnk")
        .selectExpr(
            "pid", "word AS orig",
            "concat(substring(word, 1, CAST(pid % length(word) AS INT)), "
            "substring(word, CAST(pid % length(word) AS INT) + 2, "
            "length(word) - CAST(pid % length(word) AS INT) - 1)) AS typo",
        )
    )
    pkeys = probes.select("pid", "typo", F.col("typo").alias("k")).unionByName(
        probes.select(
            "pid", "typo",
            F.explode(F.expr(dels.format(c="typo"))).alias("k"),
        )
    ).distinct()
    cand = (
        pkeys.join(F.broadcast(vkeys), "k")
        .select("pid", "typo", "word", "df")
        .distinct()
    )
    m = cand.groupBy("pid").agg(
        F.max("df").alias("mdf"), F.count("*").alias("n_candidates"))
    best = (
        cand.join(m, "pid")
        .filter(F.col("df") == F.col("mdf"))
        .groupBy("pid").agg(F.min("word").alias("correction"))
    )
    return (
        m.join(best, "pid")
        .join(probes.select("pid", "typo").distinct(), "pid")
        .select(
            "pid", "typo", "correction",
            F.col("mdf").cast("long").alias("cand_df"),
            F.col("n_candidates").cast("long").alias("n_candidates"),
        )
    )


# --- RAG passage chunking with stride (q302) ----------------------------------


@query(
    "q302_passage_chunking",
    """WITH s AS (SELECT doc_id, string_split(text, ' ') AS w
                  FROM documents),
       chk AS (SELECT CASE WHEN max(len(w)) > 199
                      THEN error('q302 oracle range bound exceeded')
                      ELSE 1 END AS ok FROM s),
       p AS (SELECT doc_id, k.range AS k,
                    1 + 15 * k.range AS s0, len(w) AS lw, w
             FROM s, range(0, 14) k
             WHERE 1 + 15 * k.range <= len(w))
       SELECT doc_id, CAST(k AS BIGINT) AS chunk_id,
              CAST(least(30, lw - s0 + 1) AS BIGINT) AS n_words,
              substr(md5(array_to_string(
                w[s0:least(lw, s0 + 29)], ' ')), 1, 8) AS h8
       FROM p, chk""",
)
def q302(spark, sf_dir):
    """RAG passage chunking — overlap-stride windows (size 30, stride
    15, partial tail kept) with a per-passage content fingerprint
    (md5 first 8 hex of the space-joined window; byte-identical on
    both engines) — the retrieval-corpus prep that turns documents
    into indexable passages; the hash column is the cross-doc
    passage-dedup key.  Pure per-row slice + join (linear HOF work),
    zero shuffle: chunking runs at scan speed next to the tokenizer
    at any corpus size."""
    docs = _t(spark, sf_dir, "documents")
    s = docs.select("doc_id", F.split("text", " ").alias("w"))
    p = s.select(
        "doc_id", F.size("w").alias("lw"), "w",
        F.explode(F.sequence(F.lit(0), F.lit(13))).alias("k"),
    ).filter(1 + 15 * F.col("k") <= F.col("lw")).withColumn(
        "s0", 1 + 15 * F.col("k")
    )
    return p.select(
        "doc_id",
        F.col("k").cast("long").alias("chunk_id"),
        F.least(F.lit(30), F.col("lw") - F.col("s0") + 1).cast("long")
        .alias("n_words"),
        F.substring(
            F.md5(
                F.array_join(
                    F.expr(
                        "slice(w, s0, least(lw, s0 + 29) - s0 + 1)"
                    ),
                    " ",
                )
            ),
            1, 8,
        ).alias("h8"),
    )


# --- incremental newcomer dedup vs corpus (q303) ------------------------------


@query(
    "q303_newcomer_dedup",
    """WITH d AS (SELECT doc_id,
                    CASE WHEN doc_id % 15 = 9
                         THEN 'shared template body for ingest dedup'
                         ELSE text END AS body
                  FROM documents),
       corpus AS (SELECT doc_id, md5(body) AS h FROM d
                  WHERE doc_id % 10 <> 9),
       newb AS (SELECT doc_id, md5(body) AS h FROM d
                WHERE doc_id % 10 = 9),
       hits AS (SELECT n.doc_id, count(*) AS n_matches,
                       min(c.doc_id) AS first_match
                FROM newb n JOIN corpus c ON c.h = n.h
                GROUP BY n.doc_id)
       SELECT n.doc_id,
              CAST(CASE WHEN h.n_matches IS NOT NULL THEN 1 ELSE 0 END
                AS BIGINT) AS is_dup,
              CAST(coalesce(h.n_matches, 0) AS BIGINT) AS n_matches,
              CAST(coalesce(h.first_match, -1) AS BIGINT) AS first_match
       FROM newb n LEFT JOIN hits h ON h.doc_id = n.doc_id""",
)
def q303(spark, sf_dir):
    """Incremental ingest dedup — the ASYMMETRIC join every crawl
    ingest runs: a small newcomer batch (doc_id%10==9) checks its
    md5 content hashes against the existing corpus, never corpus x
    corpus (the q17 batch-dedup shape inverted: at 10^12 docs the
    newcomer side broadcasts / bucket-probes the corpus hash index,
    so ingest cost is proportional to the BATCH, not the corpus).
    A deterministic shared-template body on doc_id%15==9 plants true
    newcomer-vs-corpus duplicates at every SF (9,39,69,... are
    newcomers; 24,54,84,... are corpus).  Emits per newcomer the dup
    flag, match count, and first matching corpus doc."""
    docs = _t(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 15 == 9,
               F.lit("shared template body for ingest dedup"))
        .otherwise(F.col("text")).alias("body"),
    ).withColumn("h", F.md5("body"))
    corpus = d.filter(F.col("doc_id") % 10 != 9).select(
        F.col("doc_id").alias("cdoc"), "h")
    newb = d.filter(F.col("doc_id") % 10 == 9).select("doc_id", "h")
    hits = (
        F.broadcast(newb).join(corpus, "h")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_matches"),
             F.min("cdoc").alias("first_match"))
    )
    return newb.join(hits, "doc_id", "left").select(
        "doc_id",
        F.when(F.col("n_matches").isNotNull(), 1).otherwise(0)
        .cast("long").alias("is_dup"),
        F.coalesce("n_matches", F.lit(0)).cast("long").alias("n_matches"),
        F.coalesce("first_match", F.lit(-1)).cast("long")
        .alias("first_match"),
    )


# --- URL-alias / crawl-trap detection (q304) ----------------------------------


@query(
    "q304_crawl_trap_detection",
    """WITH u AS (SELECT doc_id % 20 AS host,
                    'https://h' || CAST(doc_id % 20 AS VARCHAR) || '/p'
                      || CAST(doc_id // 4 AS VARCHAR)
                      || '?sid=' || CAST(doc_id AS VARCHAR) AS url,
                    doc_id // 4 AS content_key
                  FROM documents),
       agg AS (SELECT host, count(*) AS n_urls,
                      count(DISTINCT content_key) AS n_content
               FROM u GROUP BY host)
       SELECT host,
              CAST(n_urls AS BIGINT) AS n_urls,
              CAST(n_content AS BIGINT) AS n_content,
              CAST(n_urls - n_content AS BIGINT) AS n_alias_urls,
              CAST(CASE WHEN n_urls >= 2 * n_content THEN 1 ELSE 0 END
                AS BIGINT) AS is_trap
       FROM agg""",
)
def q304(spark, sf_dir):
    """URL-alias / crawl-trap detection — the politeness-budget guard
    (session-id and calendar traps burn fetch quota on one piece of
    content): per host, distinct URLs vs distinct content keys; a
    host whose URL count is >= 2x its content count is flagged (the
    fixture's ?sid= parameter makes every 4-URL group share one
    content key, so every host trips the detector — the degenerate
    worst case).  One host-keyed aggregation with two combinable
    distinct counts; at 10^12 URLs this is the standard per-host
    rollup next to the q300 scorecard."""
    docs = _t(spark, sf_dir, "documents")
    u = docs.select(
        (F.col("doc_id") % 20).alias("host"),
        F.expr("doc_id div 4").alias("content_key"),
    )
    agg = u.groupBy("host").agg(
        F.count("*").alias("n_urls"),
        F.countDistinct("content_key").alias("n_content"),
    )
    return agg.select(
        "host",
        F.col("n_urls").cast("long").alias("n_urls"),
        F.col("n_content").cast("long").alias("n_content"),
        (F.col("n_urls") - F.col("n_content")).cast("long")
        .alias("n_alias_urls"),
        F.when(F.col("n_urls") >= 2 * F.col("n_content"), 1).otherwise(0)
        .cast("long").alias("is_trap"),
    )


# --- consistent-hash ring with virtual nodes (q305) ---------------------------


@query(
    "q305_consistent_hash_ring",
    """WITH u AS (SELECT DISTINCT 'u' || CAST(doc_id AS VARCHAR) AS url
                  FROM documents),
       uh AS (SELECT url,
                CAST(CAST('0x' || substr(md5(url), 1, 8) AS UBIGINT)
                     AS BIGINT) AS h
              FROM u),
       vn AS (SELECT s.range AS shard, v.range AS vnode,
                CAST(CAST('0x' || substr(md5('ring' ||
                       CAST(s.range AS VARCHAR) || '.' ||
                       CAST(v.range AS VARCHAR)), 1, 8) AS UBIGINT)
                     AS BIGINT) AS vh
              FROM range(0, 8) s, range(0, 4) v),
       a4 AS (SELECT uh.url,
                     min(((vn.vh - uh.h + 4294967296) % 4294967296) * 64
                         + vn.shard * 8 + vn.vnode) AS code
              FROM uh CROSS JOIN vn
              GROUP BY uh.url),
       a1 AS (SELECT uh.url,
                     min(((vn.vh - uh.h + 4294967296) % 4294967296) * 64
                         + vn.shard * 8 + vn.vnode) AS code
              FROM uh CROSS JOIN vn
              WHERE vn.vnode = 0
              GROUP BY uh.url),
       asg AS (SELECT a4.url,
                      (a4.code % 64) // 8 AS s4,
                      (a1.code % 64) // 8 AS s1
               FROM a4 JOIN a1 USING (url)),
       l4 AS (SELECT s4 AS shard, count(*) AS load_vn4 FROM asg
              GROUP BY s4),
       l1 AS (SELECT s1 AS shard, count(*) AS load_vn1 FROM asg
              GROUP BY s1),
       shards AS (SELECT s.range AS shard FROM range(0, 8) s)
       SELECT shards.shard,
              CAST(coalesce(l4.load_vn4, 0) AS BIGINT) AS load_vn4,
              CAST(coalesce(l1.load_vn1, 0) AS BIGINT) AS load_vn1
       FROM shards LEFT JOIN l4 USING (shard) LEFT JOIN l1 USING (shard)""",
)
def q305(spark, sf_dir):
    """Consistent-hash ring assignment with virtual nodes (Karger) —
    the OTHER fleet sharding scheme next to q293's HRW: each shard
    owns 4 ring positions (md5-derived 32-bit points); a URL goes to
    the first vnode CLOCKWISE from its own hash, computed exactly as
    the integer argmin of (vh - h) mod 2^32, encoded combinably as
    delta*64 + shard*8 + vnode (deterministic tie-break).  The query
    assigns under 4 vnodes/shard and under 1 vnode/shard and emits
    both per-shard loads — the variance reduction from virtual nodes
    is directly visible.  Ring table is 32 rows broadcast; the
    assignment is one map-side-combinable argmin per URL."""
    docs = _t(spark, sf_dir, "documents")
    u = docs.select(
        F.concat(F.lit("u"), F.col("doc_id").cast("string")).alias("url")
    ).distinct()
    uh = u.withColumn(
        "h", F.conv(F.substring(F.md5("url"), 1, 8), 16, 10).cast("long"))
    vn = (
        spark.range(0, 8).selectExpr("id AS shard")
        .crossJoin(spark.range(0, 4).selectExpr("id AS vnode"))
        .withColumn(
            "vh",
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("ring"),
                                   F.col("shard").cast("string"),
                                   F.lit("."),
                                   F.col("vnode").cast("string"))),
                    1, 8,
                ),
                16, 10,
            ).cast("long"),
        )
    )
    code = (
        ((F.col("vh") - F.col("h") + F.lit(4294967296)) % 4294967296) * 64
        + F.col("shard") * 8 + F.col("vnode")
    )
    a4 = (
        uh.crossJoin(F.broadcast(vn))
        .groupBy("url").agg(F.min(code).alias("code4"))
    )
    a1 = (
        uh.crossJoin(F.broadcast(vn.filter(F.col("vnode") == 0)))
        .groupBy("url").agg(F.min(code).alias("code1"))
    )
    asg = a4.join(a1, "url").select(
        F.expr("(code4 % 64) div 8").alias("s4"),
        F.expr("(code1 % 64) div 8").alias("s1"),
    )
    l4 = asg.groupBy(F.col("s4").alias("shard")).agg(
        F.count("*").alias("load_vn4"))
    l1 = asg.groupBy(F.col("s1").alias("shard")).agg(
        F.count("*").alias("load_vn1"))
    shards = spark.range(0, 8).selectExpr("id AS shard")
    return (
        shards.join(l4, "shard", "left").join(l1, "shard", "left")
        .select(
            "shard",
            F.coalesce("load_vn4", F.lit(0)).cast("long")
            .alias("load_vn4"),
            F.coalesce("load_vn1", F.lit(0)).cast("long")
            .alias("load_vn1"),
        )
    )


# --- trending-burst detection over event streams (q306) -----------------------


@query(
    "q306_burst_detection",
    """WITH e AS (SELECT event_type, date_trunc('day', ts) AS d
                  FROM events),
       c AS (SELECT event_type, d, count(*) AS c FROM e GROUP BY 1, 2),
       r AS (SELECT event_type, sum(c) AS rt FROM c GROUP BY 1),
       col AS (SELECT d, sum(c) AS ct FROM c GROUP BY 1),
       t AS (SELECT count(*) AS tt FROM e)
       SELECT c.event_type, c.d AS day,
              CAST(c.c AS BIGINT) AS n,
              CAST(r.rt AS BIGINT) AS type_total,
              CAST(col.ct AS BIGINT) AS day_total,
              CAST(CASE WHEN 8 * c.c * t.tt >= 9 * r.rt * col.ct
                        THEN 1 ELSE 0 END AS BIGINT) AS is_burst
       FROM c JOIN r USING (event_type) JOIN col USING (d)
       CROSS JOIN t""",
)
def q306(spark, sf_dir):
    """Trending-burst detection over the event stream — the
    rate-anomaly gate (Kleinberg-style burst, decided by LIFT): a
    (type, day) cell bursts when its count exceeds 9/8 of the
    independence expectation rate_type * total_day / total, tested by
    EXACT integer cross-multiplication 8*c*T >= 9*rt*ct — no float
    rates anywhere.  At the audit SF the Poisson noise of ~70-count
    cells puts real cells on both sides of the 1.125x threshold, so
    both branches fire.  Three map-side-combinable counts + two
    broadcast marginal joins — the same shuffle-free shape as q284's
    chi-square at any event volume."""
    e = _t(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d"))
    c = e.groupBy("event_type", "d").agg(F.count("*").alias("c"))
    r = c.groupBy("event_type").agg(F.sum("c").alias("rt"))
    col = c.groupBy("d").agg(F.sum("c").alias("ct"))
    t = e.agg(F.count("*").alias("tt"))
    return (
        c.join(F.broadcast(r), "event_type")
        .join(F.broadcast(col), "d")
        .crossJoin(F.broadcast(t))
        .select(
            "event_type", F.col("d").alias("day"),
            F.col("c").cast("long").alias("n"),
            F.col("rt").cast("long").alias("type_total"),
            F.col("ct").cast("long").alias("day_total"),
            F.when(
                8 * F.col("c") * F.col("tt")
                >= 9 * F.col("rt") * F.col("ct"), 1
            ).otherwise(0).cast("long").alias("is_burst"),
        )
    )


# --- degree assortativity of the host graph (q307) ----------------------------


@query(
    "q307_degree_assortativity",
    """WITH e AS (SELECT DISTINCT doc_id % 50 AS src,
                         (doc_id * 3 + 1) % 50 AS dst FROM documents
                  UNION
                  SELECT DISTINCT doc_id % 50, (doc_id * 7 + 11) % 50
                  FROM documents),
       ed AS (SELECT src, dst FROM e WHERE src <> dst),
       od AS (SELECT src, count(*) AS od FROM ed GROUP BY src),
       idg AS (SELECT dst, count(*) AS idg FROM ed GROUP BY dst),
       j AS (SELECT od.od AS x, idg.idg AS y
             FROM ed JOIN od USING (src) JOIN idg USING (dst)),
       s AS (SELECT count(*) AS m, sum(x) AS sx, sum(y) AS sy,
                    sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy
             FROM j)
       SELECT CAST(m AS BIGINT) AS m,
              CAST(sx AS BIGINT) AS sx, CAST(sy AS BIGINT) AS sy,
              CAST(sxy AS BIGINT) AS sxy,
              CAST(sxx AS BIGINT) AS sxx, CAST(syy AS BIGINT) AS syy,
              CAST(m*sxy - sx*sy AS DOUBLE)
                / sqrt(CAST(m*sxx - sx*sx AS DOUBLE)
                       * CAST(m*syy - sy*sy AS DOUBLE)) AS r
       FROM s""",
)
def q307(spark, sf_dir):
    """Degree assortativity of the directed host graph — Pearson
    correlation of (out-degree of source, in-degree of target) over
    edges, the classic webgraph structure metric (the web is
    disassortative; spam farms skew it): all five moments are EXACT
    BIGINT sums over the edge list (the q271 OLS pattern), and the
    coefficient is one fixed float expression (numerator / sqrt of
    product) evaluated identically by both engines on identical
    integers.  One edge scan + two broadcast degree joins + a single
    global aggregate — no shuffle wider than the degree tables at
    web scale."""
    docs = _t(spark, sf_dir, "documents")
    e = (
        docs.selectExpr("doc_id % 50 AS src", "(doc_id * 3 + 1) % 50 AS dst")
        .unionByName(
            docs.selectExpr("doc_id % 50 AS src",
                            "(doc_id * 7 + 11) % 50 AS dst"))
        .distinct()
        .filter("src <> dst")
    )
    od = e.groupBy("src").agg(F.count("*").alias("od"))
    idg = e.groupBy("dst").agg(F.count("*").alias("idg"))
    j = (
        e.join(F.broadcast(od), "src")
        .join(F.broadcast(idg), "dst")
        .selectExpr("od AS x", "idg AS y")
    )
    s = j.agg(
        F.count("*").alias("m"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    return s.select(
        F.col("m").cast("long").alias("m"),
        F.col("sx").cast("long").alias("sx"),
        F.col("sy").cast("long").alias("sy"),
        F.col("sxy").cast("long").alias("sxy"),
        F.col("sxx").cast("long").alias("sxx"),
        F.col("syy").cast("long").alias("syy"),
        (
            (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy"))
            .cast("double")
            / F.sqrt(
                (F.col("m") * F.col("sxx")
                 - F.col("sx") * F.col("sx")).cast("double")
                * (F.col("m") * F.col("syy")
                   - F.col("sy") * F.col("sy")).cast("double")
            )
        ).alias("r"),
    )


# --- content-defined chunking boundaries (q308) -------------------------------


@query(
    "q308_cdc_boundaries",
    """WITH s AS (SELECT doc_id, text, length(text) AS lt
                  FROM documents),
       chk AS (SELECT CASE WHEN max(lt) > 599
                      THEN error('q308 oracle range bound exceeded')
                      ELSE 1 END AS ok FROM s),
       pos AS (SELECT doc_id, i.range AS i,
                 (CAST(ascii(substr(text, i.range, 1)) AS BIGINT)
                  + CAST(ascii(substr(text, i.range - 1, 1)) AS BIGINT) * 31
                  + CAST(ascii(substr(text, i.range - 2, 1)) AS BIGINT) * 961
                  + CAST(ascii(substr(text, i.range - 3, 1)) AS BIGINT)
                    * 29791
                  + CAST(ascii(substr(text, i.range - 4, 1)) AS BIGINT)
                    * 923521
                  + CAST(ascii(substr(text, i.range - 5, 1)) AS BIGINT)
                    * 28629151
                  + CAST(ascii(substr(text, i.range - 6, 1)) AS BIGINT)
                    * 887503681
                  + CAST(ascii(substr(text, i.range - 7, 1)) AS BIGINT)
                    * 27512614111)
                   % 64 AS h64
               FROM s, range(8, 600) i WHERE i.range <= lt)
       SELECT pos.doc_id,
              CAST(sum(CASE WHEN h64 = 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_boundaries,
              CAST(sum(CASE WHEN h64 = 0 THEN i ELSE 0 END) AS BIGINT)
                AS boundary_poschk,
              CAST(max(s2.lt) AS BIGINT) AS n_chars
       FROM pos JOIN s s2 USING (doc_id), chk
       GROUP BY pos.doc_id""",
)
def q308(spark, sf_dir):
    """Content-defined chunking (LBFS/restic-style) boundary
    accounting — the dedup-storage split rule that survives insertions
    (a fixed-offset split would shift every later chunk): position i
    is a boundary when the 8-char polynomial rolling hash
    sum(ascii(c_{i-j}) * 31^j) is 0 mod 64 (expected chunk ~64
    chars).  Each position's hash is an 8-term integer expression —
    O(8L) per document, fully codegen'd, position-exploded exactly
    like the n-gram tables (no sequential fold, no Python).  Emits
    per doc the boundary count, an order-sensitive position checksum,
    and length; the boundary hash IS the dedup anchor key at
    exabyte-store scale."""
    docs = _t(spark, sf_dir, "documents")
    s = docs.select("doc_id", "text", F.length("text").alias("lt"))
    pw = [31 ** j for j in range(8)]
    terms = " + ".join(
        f"CAST(ascii(substring(text, i - {j}, 1)) AS BIGINT) * {pw[j]}"
        if j else "CAST(ascii(substring(text, i, 1)) AS BIGINT)"
        for j in range(8)
    )
    pos = (
        s.select(
            "doc_id", "text", "lt",
            F.explode(F.expr("sequence(8, lt)")).alias("i"),
        )
        .withColumn("h64", F.expr(f"({terms}) % 64"))
    )
    return pos.groupBy("doc_id").agg(
        F.sum(F.when(F.col("h64") == 0, 1).otherwise(0)).cast("long")
        .alias("n_boundaries"),
        F.sum(F.when(F.col("h64") == 0, F.col("i")).otherwise(0))
        .cast("long").alias("boundary_poschk"),
        F.max("lt").cast("long").alias("n_chars"),
    )


# --- strongly connected component of the pivot (q309) -------------------------


@query(
    "q309_scc_of_pivot",
    """WITH RECURSIVE ed AS (
         SELECT DISTINCT doc_id % 50 AS src, (doc_id * 3 + 1) % 50 AS dst
         FROM documents
         UNION
         SELECT DISTINCT doc_id % 50, (doc_id * 7 + 11) % 50
         FROM documents),
       e2 AS (SELECT src, dst FROM ed WHERE src <> dst),
       fwd AS (SELECT 0 AS node
               UNION
               SELECT e2.dst FROM fwd JOIN e2 ON e2.src = fwd.node),
       bwd AS (SELECT 0 AS node
               UNION
               SELECT e2.src FROM bwd JOIN e2 ON e2.dst = bwd.node),
       nodes AS (SELECT DISTINCT node FROM
                   (SELECT src AS node FROM e2
                    UNION ALL SELECT dst FROM e2))
       SELECT n.node,
              CAST(CASE WHEN f.node IS NOT NULL THEN 1 ELSE 0 END
                AS BIGINT) AS fwd_reach,
              CAST(CASE WHEN b.node IS NOT NULL THEN 1 ELSE 0 END
                AS BIGINT) AS bwd_reach,
              CAST(CASE WHEN f.node IS NOT NULL AND b.node IS NOT NULL
                        THEN 1 ELSE 0 END AS BIGINT) AS in_scc
       FROM nodes n
       LEFT JOIN (SELECT DISTINCT node FROM fwd) f ON f.node = n.node
       LEFT JOIN (SELECT DISTINCT node FROM bwd) b ON b.node = n.node""",
)
def q309(spark, sf_dir):
    """Strongly connected component of a pivot (the FW-BW step of
    distributed SCC decomposition, Fleischer et al.): the pivot's SCC
    is exactly (forward-reachable set) intersect (backward-reachable
    set) — two round-synchronous BFS closures (frontier equi-join +
    anti-join vs visited, loud 32-round caps) over the directed host
    graph, one on edges and one on reversed edges, then two flag
    joins.  On the web graph this is the core extraction step that
    peels the giant SCC (the 'bowtie' center) before recursing on the
    remainder; each round is one host-keyed equi-join."""
    docs = _t(spark, sf_dir, "documents")
    e2 = (
        docs.selectExpr("doc_id % 50 AS src", "(doc_id * 3 + 1) % 50 AS dst")
        .unionByName(
            docs.selectExpr("doc_id % 50 AS src",
                            "(doc_id * 7 + 11) % 50 AS dst"))
        .distinct()
        .filter("src <> dst")
        .localCheckpoint(eager=True)
    )

    def closure(edges, key_out, key_in):
        reach = spark.createDataFrame([(0,)], "node LONG").localCheckpoint(
            eager=True)
        frontier = reach
        for _round in range(32):
            nxt = (
                frontier.join(edges, frontier.node == edges[key_out])
                .select(F.col(key_in).alias("node")).distinct()
                .join(reach.withColumnRenamed("node", "seen"),
                      F.col("node") == F.col("seen"), "left_anti")
                .localCheckpoint(eager=True)
            )
            if nxt.count() == 0:
                break
            reach = reach.unionAll(nxt).localCheckpoint(eager=True)
            frontier = nxt
        else:
            raise RuntimeError("q309 BFS did not converge in 32 rounds")
        return reach

    fwd = closure(e2, "src", "dst")
    bwd = closure(e2, "dst", "src")
    nodes = (
        e2.selectExpr("src AS node").unionAll(e2.selectExpr("dst AS node"))
        .distinct()
    )
    return (
        nodes.join(fwd.withColumn("_f", F.lit(1)), "node", "left")
        .join(bwd.withColumnRenamed("node", "bn").withColumn(
            "_b", F.lit(1)),
            F.col("node") == F.col("bn"), "left")
        .select(
            "node",
            F.when(F.col("_f").isNotNull(), 1).otherwise(0).cast("long")
            .alias("fwd_reach"),
            F.when(F.col("_b").isNotNull(), 1).otherwise(0).cast("long")
            .alias("bwd_reach"),
            F.when(F.col("_f").isNotNull() & F.col("_b").isNotNull(), 1)
            .otherwise(0).cast("long").alias("in_scc"),
        )
    )


# --- term- vs doc-partitioned index balance (q310) ----------------------------


@query(
    "q310_index_partition_balance",
    """WITH p AS (SELECT DISTINCT word, doc_id FROM
                    (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                     FROM documents)),
       tshard AS (SELECT CAST(CAST('0x' || substr(md5(word), 1, 8)
                          AS UBIGINT) % 8 AS BIGINT) AS shard,
                         count(*) AS postings
                  FROM p GROUP BY 1),
       dshard AS (SELECT doc_id % 8 AS shard, count(*) AS postings,
                         count(DISTINCT word) AS n_terms
                  FROM p GROUP BY 1),
       shards AS (SELECT s.range AS shard FROM range(0, 8) s)
       SELECT shards.shard,
              CAST(coalesce(t.postings, 0) AS BIGINT)
                AS postings_term_part,
              CAST(coalesce(d.postings, 0) AS BIGINT)
                AS postings_doc_part,
              CAST(coalesce(d.n_terms, 0) AS BIGINT) AS terms_doc_part
       FROM shards LEFT JOIN tshard t USING (shard)
       LEFT JOIN dshard d USING (shard)""",
)
def q310(spark, sf_dir):
    """Term- vs document-partitioned index balance — the first
    decision of distributed index design (term partitioning risks
    hot-term skew, document partitioning replicates the lexicon):
    posting loads per shard under md5-hash term sharding vs doc_id
    sharding, plus the per-shard lexicon size the doc layout pays.
    Pure aggregation accounting on the postings table; the skew
    visible in postings_term_part vs the near-uniform
    postings_doc_part IS the argument (every engine from Google to
    ES chose doc partitioning for it)."""
    docs = _t(spark, sf_dir, "documents")
    p = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .distinct()
    )
    tshard = p.groupBy(
        (F.conv(F.substring(F.md5("word"), 1, 8), 16, 10).cast("long") % 8)
        .alias("shard")
    ).agg(F.count("*").alias("tp"))
    dshard = p.groupBy((F.col("doc_id") % 8).alias("shard")).agg(
        F.count("*").alias("dp"),
        F.countDistinct("word").alias("n_terms"),
    )
    shards = spark.range(0, 8).selectExpr("id AS shard")
    return (
        shards.join(tshard, "shard", "left")
        .join(dshard, "shard", "left")
        .select(
            "shard",
            F.coalesce("tp", F.lit(0)).cast("long")
            .alias("postings_term_part"),
            F.coalesce("dp", F.lit(0)).cast("long")
            .alias("postings_doc_part"),
            F.coalesce("n_terms", F.lit(0)).cast("long")
            .alias("terms_doc_part"),
        )
    )


# --- streaming HLL registers (q311) -------------------------------------------


@query("q311_streaming_hll", ORACLES["q279_hll_cardinality"])
def q311(spark, sf_dir):
    """STREAMING HyperLogLog: the q279 sketch maintained by a real
    Structured Streaming query (streaming/windowed.py::
    stream_hll_registers) — per-row hashing is stateless, the single
    stateful operator is the mergeable (host, bucket) register MAX
    (state is 32 rows/host FOREVER, independent of stream volume —
    the reason fleets run HLL in the stream tier), complete-mode
    drain.  The drained registers then feed the identical batch
    estimate pipeline; the oracle is q279's batch SQL, so this query
    proves stream-maintained registers equal the batch sketch
    bit-for-bit."""
    import os
    from gdal_spark.streaming.windowed import stream_hll_registers

    reg = stream_hll_registers(
        spark, os.path.join(sf_dir, "documents.parquet"))
    docs = _t(spark, sf_dir, "documents")
    u = docs.select(
        (F.col("doc_id") % 25).alias("host"),
        F.concat(
            F.lit("https://h"), (F.col("doc_id") % 25).cast("string"),
            F.lit(".example.com/p"),
            ((F.col("doc_id") * 13) % 40).cast("string"),
        ).alias("url"),
    ).distinct()
    grid = (
        u.select("host").distinct()
        .select("host", F.explode(F.sequence(F.lit(0), F.lit(31))).alias("b"))
    )
    full_reg = grid.join(reg, ["host", "b"], "left").select(
        "host", "b", F.coalesce("reg", F.lit(0)).alias("reg")
    )
    agg = full_reg.groupBy("host").agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(28 - reg AS INT))"))
        .alias("harmonic_d"),
        F.sum(F.when(F.col("reg") > 0, 1).otherwise(0)).alias("used_buckets"),
        F.sum("reg").alias("sum_reg"),
    )
    truth = u.groupBy("host").agg(F.countDistinct("url").alias("n_distinct"))
    return agg.join(truth, "host").select(
        "host",
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.col("used_buckets").cast("long").alias("used_buckets"),
        F.col("sum_reg").cast("long").alias("sum_reg"),
        F.col("harmonic_d").cast("long").alias("harmonic_d"),
        (F.lit(_HLL_C) / F.col("harmonic_d").cast("double")).alias("hll_est"),
    )


# --- MMR diversified top-5 retrieval (q312) -----------------------------------


def _mmr_oracle_sql():
    """Mechanically unroll the 5 greedy MMR rounds as chained CTEs:
    round k scores every remaining candidate 2*rel - max_sim_to_sel
    and picks the (score desc, cand asc) argmax via NOT EXISTS."""
    head = """WITH v AS (SELECT vec_id, list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE)*1000 + 0.5) AS BIGINT))
                 AS qv FROM embeddings),
       qv0 AS (SELECT qv FROM v WHERE vec_id = 0),
       c AS (SELECT v.vec_id AS cand, v.qv,
               CAST(list_sum(list_transform(list_zip(qv0.qv, v.qv),
                    s -> s[1]*s[2])) AS BIGINT) AS rel
             FROM v, qv0 WHERE v.vec_id <> 0)"""
    prev_sel = None
    parts = [head]
    for k in range(1, 6):
        if prev_sel is None:
            parts.append(f""",
       p{k} AS (SELECT cand, 2 * rel AS score FROM c)""")
        else:
            parts.append(f""",
       p{k} AS (SELECT c.cand, 2 * c.rel - max(
                  CAST(list_sum(list_transform(list_zip(c.qv, sv.qv),
                       s -> s[1]*s[2])) AS BIGINT)) AS score
               FROM c CROSS JOIN {prev_sel} s
               JOIN v sv ON sv.vec_id = s.cand
               WHERE c.cand NOT IN (SELECT cand FROM {prev_sel})
               GROUP BY c.cand, c.rel)""")
        parts.append(f""",
       w{k} AS (SELECT cand, score FROM p{k} a
               WHERE NOT EXISTS (SELECT 1 FROM p{k} b
                 WHERE b.score > a.score
                    OR (b.score = a.score AND b.cand < a.cand))),
       sel{k} AS ({"SELECT cand, score FROM w" + str(k)
                   if k == 1 else
                   f"SELECT cand, score FROM sel{k-1} UNION ALL "
                   f"SELECT cand, score FROM w{k}"})""")
        prev_sel = f"sel{k}"
    parts.append("""
       SELECT s.cand, CAST(s.score AS BIGINT) AS mmr_scaled,
              CAST(c.rel AS BIGINT) AS rel
       FROM sel5 s JOIN c ON c.cand = s.cand""")
    return "".join(parts)


@query("q312_mmr_diversified_topk", _mmr_oracle_sql())
def q312(spark, sf_dir):
    """Maximal Marginal Relevance diversified top-5 (Carbonell-
    Goldstein) — the dedup-aware reranker every retrieval stack runs
    so five near-identical passages don't fill the context window:
    greedily pick argmax of 2*rel(c) - max_{s in S} sim(c, s)
    (lambda=1/2 cross-multiplied into integers; rel and sim are the
    exact quantized dots), ties to lowest id.  Five round-synchronous
    rounds; each round the selected set (<= 4 rows) BROADCASTS
    against the remaining candidates, so the pairwise-sim work is
    |C| x |S|, never |C|^2 — the oracle unrolls the same 5 rounds as
    chained CTEs with NOT-EXISTS argmaxes."""
    emb = _t(spark, sf_dir, "embeddings").selectExpr(
        "vec_id",
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*1000 "
        "+ 0.5) AS BIGINT)) AS qv",
    ).localCheckpoint(eager=True)
    qv0 = emb.filter("vec_id = 0").selectExpr("qv AS q0")
    c = (
        emb.filter("vec_id <> 0").crossJoin(F.broadcast(qv0))
        .selectExpr(
            "vec_id AS cand", "qv",
            "CAST(aggregate(zip_with(q0, qv, (a, b) -> a * b), "
            "CAST(0 AS BIGINT), (acc, s) -> acc + s) AS BIGINT) AS rel",
        )
        .localCheckpoint(eager=True)
    )
    sel = None  # DataFrame(cand, score)
    for k in range(5):
        if sel is None:
            p = c.selectExpr("cand", "2 * rel AS score")
        else:
            sv = sel.select("cand").join(
                emb.selectExpr("vec_id AS cand", "qv AS sqv"), "cand"
            ).select("sqv")
            rem = c.join(sel.select("cand"), "cand", "left_anti")
            p = (
                rem.crossJoin(F.broadcast(sv))
                .selectExpr(
                    "cand", "rel",
                    "CAST(aggregate(zip_with(qv, sqv, (a, b) -> a * b), "
                    "CAST(0 AS BIGINT), (acc, s) -> acc + s) AS BIGINT)"
                    " AS sim",
                )
                .groupBy("cand", "rel")
                .agg(F.max("sim").alias("maxsim"))
                .selectExpr("cand", "2 * rel - maxsim AS score")
            )
        top = p.agg(
            F.max(
                (F.col("score") + 100000000) * 100000
                + (99999 - F.col("cand"))
            ).alias("code")
        ).selectExpr(
            "CAST(99999 - (code % 100000) AS BIGINT) AS cand",
            "CAST((code div 100000) - 100000000 AS BIGINT) AS score",
        )
        sel = top if sel is None else sel.unionAll(top)
        sel = sel.localCheckpoint(eager=True)
    return sel.join(c.select("cand", "rel"), "cand").select(
        "cand",
        F.col("score").cast("long").alias("mmr_scaled"),
        F.col("rel").cast("long").alias("rel"),
    )


# --- cross-source contamination matrix (q313) ---------------------------------


@query(
    "q313_cross_source_contamination",
    """WITH d AS (SELECT doc_id, source,
                    md5(CASE WHEN doc_id % 9 = 0
                        THEN 'shared contamination template'
                        ELSE text END) AS h
                  FROM documents),
       pr AS (SELECT least(a.source, b.source) AS src_a,
                     greatest(a.source, b.source) AS src_b,
                     a.h
              FROM d a JOIN d b
                ON a.h = b.h AND a.doc_id < b.doc_id
               AND a.source <> b.source)
       SELECT src_a, src_b,
              CAST(count(*) AS BIGINT) AS n_pairs,
              CAST(count(DISTINCT h) AS BIGINT) AS n_shared_hashes
       FROM pr GROUP BY src_a, src_b""",
)
def q313(spark, sf_dir):
    """Cross-source contamination matrix — which corpus slices leak
    into each other (the check run before claiming slices are
    independent, e.g. benchmark slices vs training slices): pairs of
    docs from DIFFERENT sources sharing an md5 content hash,
    aggregated per unordered source pair.  The hash equi-join makes
    candidate volume sum(dup_group^2), never corpus^2 — the q17
    dedup shape with a source-inequality residual; a deterministic
    template on doc_id%9==0 plants a cross-source dup group at every
    SF."""
    docs = _t(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", "source",
        F.md5(
            F.when(F.col("doc_id") % 9 == 0,
                   F.lit("shared contamination template"))
            .otherwise(F.col("text"))
        ).alias("h"),
    )
    b = d.selectExpr("doc_id AS bdoc", "source AS bsrc", "h")
    pr = (
        d.join(b, "h")
        .filter((F.col("doc_id") < F.col("bdoc"))
                & (F.col("source") != F.col("bsrc")))
        .select(
            F.least("source", "bsrc").alias("src_a"),
            F.greatest("source", "bsrc").alias("src_b"),
            "h",
        )
    )
    return pr.groupBy("src_a", "src_b").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.countDistinct("h").cast("long").alias("n_shared_hashes"),
    )


# --- quality-stratified deterministic hash sampling (q314) --------------------


@query(
    "q314_stratified_hash_sampling",
    """WITH d AS (SELECT doc_id, n_chars AS val FROM documents),
       n AS (SELECT count(*) AS n FROM d),
       cum AS (SELECT val, count(*) AS c FROM d GROUP BY val),
       rk AS (SELECT a.val, sum(b.c) AS rank_le
              FROM cum a JOIN cum b ON b.val <= a.val
              GROUP BY a.val),
       dec AS (SELECT d.doc_id, d.val,
                      ((rk.rank_le - 1) * 10) // n.n + 1 AS decile
               FROM d JOIN rk USING (val) CROSS JOIN n),
       kept AS (SELECT decile, doc_id,
                       CAST(CAST('0x' || substr(md5('s' ||
                              CAST(doc_id AS VARCHAR)), 1, 8)
                            AS UBIGINT) % 10 AS BIGINT) AS slot
                FROM dec)
       SELECT decile,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(CASE WHEN slot = 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_kept,
              CAST(min(doc_id) AS BIGINT) AS min_doc
       FROM kept GROUP BY decile""",
)
def q314(spark, sf_dir):
    """Quality-stratified deterministic hash sampling — the dataset
    curation pass that takes a FIXED fraction from every quality
    stratum (here: n_chars deciles) without any randomness: decile =
    exact integer rank arithmetic ((rank_le-1)*10 div N + 1, the
    rank table is value-keyed and BOUNDED by distinct values, not
    corpus size), and the kept set is md5(doc)%10==0 — a pure filter
    that needs no shuffle, is reproducible forever, and at 10^12
    docs samples each stratum at exactly the hash rate with zero
    coordination (the p-sampling idiom; per-stratum exact-k quotas
    would need a per-stratum sort)."""
    docs = _t(spark, sf_dir, "documents")
    d = docs.select("doc_id", F.col("n_chars").alias("val"))
    n = d.agg(F.count("*").alias("n"))
    cum = d.groupBy("val").agg(F.count("*").alias("c"))
    b = cum.selectExpr("val AS bval", "c AS bc")
    rk = (
        cum.join(F.broadcast(b), F.col("bval") <= F.col("val"))
        .groupBy("val").agg(F.sum("bc").alias("rank_le"))
    )
    dec = (
        d.join(F.broadcast(rk), "val")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            (F.expr("((rank_le - 1) * 10) div n") + 1).alias("decile"),
        )
    )
    kept = dec.withColumn(
        "slot",
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("s"), F.col("doc_id").cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("long") % 10,
    )
    return kept.groupBy("decile").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("slot") == 0, 1).otherwise(0)).cast("long")
        .alias("n_kept"),
        F.min("doc_id").cast("long").alias("min_doc"),
    )


# --- padding-waste accounting under length bucketing (q315) -------------------


@query(
    "q315_padding_waste",
    """WITH d AS (SELECT doc_id, len(string_split(text, ' ')) AS lw
                  FROM documents),
       stats AS (SELECT min(lw) AS mn, max(lw) AS mx, count(*) AS n,
                        sum(lw) AS tok FROM d),
       g AS (SELECT CAST(sum(s.mx - d.lw) AS BIGINT) AS waste
             FROM d CROSS JOIN stats s),
       bk AS (SELECT d.lw,
                     (d.lw - s.mn) * 8 // (s.mx - s.mn + 1) AS bucket
              FROM d CROSS JOIN stats s),
       bmax AS (SELECT bucket, max(lw) AS bmx FROM bk GROUP BY bucket),
       b8 AS (SELECT CAST(sum(bmax.bmx - bk.lw) AS BIGINT) AS waste
              FROM bk JOIN bmax USING (bucket))
       SELECT s.strategy, st.tok AS total_tokens, s.waste,
              CAST(st.tok + s.waste AS BIGINT) AS padded_tokens
       FROM (SELECT 'global_max' AS strategy, waste FROM g
             UNION ALL
             SELECT 'equal_width_8', waste FROM b8) s
       CROSS JOIN (SELECT CAST(sum(lw) AS BIGINT) AS tok FROM d) st""",
)
def q315(spark, sf_dir):
    """Padding-waste accounting under length bucketing — the training
    throughput question (padding tokens burn FLOPs): total padding
    under (a) one global max-length batch shape vs (b) 8 equal-width
    length buckets each padded to its own max.  All exact integers:
    waste = sum(bucket_max - len); bucket = (len-min)*8 div span.
    Two scans + a bucket-max broadcast — the accounting that justifies
    the q93 length-sorted packing operator (which this query brackets
    from above)."""
    docs = _t(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("lw"))
    stats = d.agg(
        F.min("lw").alias("mn"), F.max("lw").alias("mx"),
        F.count("*").alias("n"), F.sum("lw").alias("tok"),
    )
    g = d.crossJoin(F.broadcast(stats)).agg(
        F.sum(F.col("mx") - F.col("lw")).cast("long").alias("waste"))
    bk = d.crossJoin(F.broadcast(stats)).select(
        "lw",
        F.expr("(lw - mn) * 8 div (mx - mn + 1)").alias("bucket"),
    )
    bmax = bk.groupBy("bucket").agg(F.max("lw").alias("bmx"))
    b8 = bk.join(F.broadcast(bmax), "bucket").agg(
        F.sum(F.col("bmx") - F.col("lw")).cast("long").alias("waste"))
    tok = d.agg(F.sum("lw").cast("long").alias("tok"))
    out = (
        g.selectExpr("'global_max' AS strategy", "waste")
        .unionAll(b8.selectExpr("'equal_width_8' AS strategy", "waste"))
    )
    return out.crossJoin(F.broadcast(tok)).select(
        "strategy",
        F.col("tok").alias("total_tokens"),
        F.col("waste").cast("long").alias("waste"),
        (F.col("tok") + F.col("waste")).cast("long")
        .alias("padded_tokens"),
    )


# --- ordered conversion funnel (q316) -----------------------------------------


@query(
    "q316_conversion_funnel",
    """WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
                  WHERE event_type = 'view' GROUP BY user_id),
       c AS (SELECT e.user_id, min(e.ts) AS t_click
             FROM events e JOIN v ON v.user_id = e.user_id
             WHERE e.event_type = 'click' AND e.ts > v.t_view
             GROUP BY e.user_id),
       p AS (SELECT e.user_id, min(e.ts) AS t_buy
             FROM events e JOIN c ON c.user_id = e.user_id
             WHERE e.event_type = 'purchase' AND e.ts > c.t_click
             GROUP BY e.user_id),
       u AS (SELECT count(DISTINCT user_id) AS n FROM events)
       SELECT CAST(u.n AS BIGINT) AS n_users,
              CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
              CAST((SELECT count(*) FROM c) AS BIGINT)
                AS n_click_after_view,
              CAST((SELECT count(*) FROM p) AS BIGINT)
                AS n_purchase_after_click
       FROM u""",
)
def q316(spark, sf_dir):
    """Ordered conversion funnel (view -> click-after-view ->
    purchase-after-click) — the product-analytics stage count with
    STRICT event ordering, not mere co-occurrence: each stage is a
    min-timestamp aggregation joined to the previous stage with a
    ts-after residual.  Three user-keyed aggregations + equi-joins —
    at clickstream scale everything shuffles once on user_id and the
    funnel is a map-side-combinable min per stage (no window, no
    per-user sort)."""
    e = _t(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id").agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id").agg(F.min("ts").alias("t_buy"))
    )
    nu = e.agg(F.countDistinct("user_id").alias("n"))
    nv = v.agg(F.count("*").alias("nv"))
    nc = c.agg(F.count("*").alias("nc"))
    np_ = p.agg(F.count("*").alias("np"))
    return (
        nu.crossJoin(F.broadcast(nv)).crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(np_))
        .select(
            F.col("n").cast("long").alias("n_users"),
            F.col("nv").cast("long").alias("n_view"),
            F.col("nc").cast("long").alias("n_click_after_view"),
            F.col("np").cast("long").alias("n_purchase_after_click"),
        )
    )


# --- retention cohort matrix (q317) -------------------------------------------


@query(
    "q317_retention_cohorts",
    """WITH e AS (SELECT user_id,
                    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d
                  FROM events),
       first AS (SELECT user_id, min(d) AS cohort FROM e
                 GROUP BY user_id),
       act AS (SELECT DISTINCT e.user_id, first.cohort,
                      e.d - first.cohort AS offs
               FROM e JOIN first USING (user_id))
       SELECT cohort, offs,
              CAST(count(*) AS BIGINT) AS n_active
       FROM act WHERE offs <= 7
       GROUP BY cohort, offs""",
)
def q317(spark, sf_dir):
    """Retention cohort matrix — users grouped by their first-seen
    epoch day, counted as active per day offset (0..7): the
    engagement table every growth dashboard draws.  Epoch-day
    integers (floor(epoch)/86400, the q10 idiom) keep both engines
    bit-identical; the matrix is one distinct + one count keyed on
    (cohort, offset).  first-seen is a user-keyed min — at
    clickstream scale the cohort join broadcasts the (small) first
    table per user shard."""
    e = _t(spark, sf_dir, "events").select(
        "user_id",
        F.expr("CAST(unix_timestamp(ts) div 86400 AS BIGINT)").alias("d"),
    )
    first = e.groupBy("user_id").agg(F.min("d").alias("cohort"))
    act = (
        e.join(first, "user_id")
        .select("user_id", "cohort", (F.col("d") - F.col("cohort")).alias("offs"))
        .distinct()
    )
    return (
        act.filter(F.col("offs") <= 7)
        .groupBy("cohort", "offs")
        .agg(F.count("*").cast("long").alias("n_active"))
    )


# --- crawl/index/serve Venn audit (q318) --------------------------------------


@query(
    "q318_crawl_index_venn",
    """WITH u AS (SELECT doc_id, 'u' || CAST(doc_id AS VARCHAR) AS url
                  FROM documents),
       crawled AS (SELECT url FROM u WHERE doc_id % 3 <> 2),
       indexed AS (SELECT url FROM u WHERE doc_id % 4 <> 3
                     AND doc_id % 3 <> 2),
       sitemap AS (SELECT url FROM u WHERE doc_id % 2 = 0),
       m AS (SELECT u.url,
                    CASE WHEN c.url IS NOT NULL THEN 1 ELSE 0 END AS fc,
                    CASE WHEN i.url IS NOT NULL THEN 1 ELSE 0 END AS fi,
                    CASE WHEN s.url IS NOT NULL THEN 1 ELSE 0 END AS fs
             FROM u LEFT JOIN crawled c ON c.url = u.url
                    LEFT JOIN indexed i ON i.url = u.url
                    LEFT JOIN sitemap s ON s.url = u.url)
       SELECT fc AS crawled, fi AS indexed, fs AS in_sitemap,
              CAST(count(*) AS BIGINT) AS n
       FROM m GROUP BY fc, fi, fs""",
)
def q318(spark, sf_dir):
    """Crawl / index / sitemap Venn audit — the coverage
    reconciliation every search pipeline runs (sitemap-but-never-
    crawled = discovery gap; crawled-but-not-indexed = quality drop;
    indexed-but-not-in-sitemap = organic discovery): all 8 Venn
    cells from ONE pass of membership flags and a single aggregation
    — the q250 fused-membership lesson applied as its own operator
    (three .count()s on overlapping chains would re-execute the
    chains three times and still not give the cross cells)."""
    docs = _t(spark, sf_dir, "documents")
    u = docs.select(
        "doc_id",
        F.concat(F.lit("u"), F.col("doc_id").cast("string")).alias("url"),
    )
    m = u.select(
        "url",
        F.when(F.col("doc_id") % 3 != 2, 1).otherwise(0).alias("fc"),
        F.when((F.col("doc_id") % 4 != 3) & (F.col("doc_id") % 3 != 2), 1)
        .otherwise(0).alias("fi"),
        F.when(F.col("doc_id") % 2 == 0, 1).otherwise(0).alias("fs"),
    )
    return m.groupBy(
        F.col("fc").cast("long").alias("crawled"),
        F.col("fi").cast("long").alias("indexed"),
        F.col("fs").cast("long").alias("in_sitemap"),
    ).agg(F.count("*").cast("long").alias("n"))


# --- seasonal-baseline outlier flags (q319) -----------------------------------


@query(
    "q319_seasonal_outliers",
    """WITH e AS (SELECT event_type,
                    CAST(floor(epoch(ts)) AS BIGINT) // 3600 % 24 AS hod,
                    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d
                  FROM events),
       cell AS (SELECT event_type, hod, d, count(*) AS c
                FROM e GROUP BY event_type, hod, d),
       base AS (SELECT event_type, hod, sum(c) AS tot,
                       count(*) AS n_days
                FROM cell GROUP BY event_type, hod)
       SELECT cell.event_type, cell.hod, cell.d,
              CAST(cell.c AS BIGINT) AS n,
              CAST(base.tot AS BIGINT) AS hod_total,
              CAST(base.n_days AS BIGINT) AS n_days,
              CAST(CASE WHEN 2 * cell.c * base.n_days >= 3 * base.tot
                        THEN 1 ELSE 0 END AS BIGINT) AS is_high
       FROM cell JOIN base USING (event_type, hod)""",
)
def q319(spark, sf_dir):
    """Seasonal-baseline outlier flags — the rate-monitoring pass
    with a DIURNAL baseline (each (type, hour-of-day) slot gets its
    own expectation, so a nightly batch spike isn't compared to the
    daily mean): a (type, hod, day) cell is high when its count
    exceeds 1.5x the slot's per-day average, tested exactly as
    2*c*n_days >= 3*tot.  Epoch-hour/day integers; two combinable
    aggregations + one broadcast baseline join — the same shape as
    q306 with a finer conditioning key."""
    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(unix_timestamp(ts) div 3600 % 24 AS BIGINT)")
        .alias("hod"),
        F.expr("CAST(unix_timestamp(ts) div 86400 AS BIGINT)").alias("d"),
    )
    cell = e.groupBy("event_type", "hod", "d").agg(
        F.count("*").alias("c"))
    base = cell.groupBy("event_type", "hod").agg(
        F.sum("c").alias("tot"), F.count("*").alias("n_days"))
    return cell.join(F.broadcast(base), ["event_type", "hod"]).select(
        "event_type", "hod", "d",
        F.col("c").cast("long").alias("n"),
        F.col("tot").cast("long").alias("hod_total"),
        F.col("n_days").cast("long").alias("n_days"),
        F.when(2 * F.col("c") * F.col("n_days") >= 3 * F.col("tot"), 1)
        .otherwise(0).cast("long").alias("is_high"),
    )


# --- readability gate (q320) --------------------------------------------------


@query(
    "q320_readability_gate",
    """SELECT doc_id,
              CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
              CAST(len(regexp_extract_all(text, '[aeiou]+')) AS BIGINT)
                AS n_syl,
              CAST(CASE WHEN 10 * len(regexp_extract_all(text, '[aeiou]+'))
                             >= 14 * len(string_split(text, ' '))
                        THEN 1 ELSE 0 END AS BIGINT) AS is_hard
       FROM documents""",
)
def q320(spark, sf_dir):
    """Readability gate — the Flesch-style complexity feature for
    quality filtering, with the syllable count proxied by VOWEL RUNS
    (regexp '[aeiou]+' — the standard cheap approximation) and the
    hardness class decided by exact cross-multiplication
    10*syllables >= 14*words (avg >= 1.4 vowel runs/word — the
    fixture's ratio spans 1.08..1.70 so both branches fire).  One
    regexp + one split per row, zero shuffle, scan-speed at any
    corpus size; both branches fire on the fixture vocabulary (short
    words like 'the'/'key' vs 'customer'/'window')."""
    docs = _t(spark, sf_dir, "documents")
    syl = F.size(F.expr("regexp_extract_all(text, '[aeiou]+', 0)"))
    words = F.size(F.split("text", " "))
    return docs.select(
        "doc_id",
        words.cast("long").alias("n_words"),
        syl.cast("long").alias("n_syl"),
        F.when(10 * syl >= 14 * words, 1).otherwise(0).cast("long")
        .alias("is_hard"),
    )


# --- bot detection by inter-arrival regularity (q321) -------------------------


@query(
    "q321_bot_regularity",
    """WITH real_e AS (SELECT user_id,
                         CAST(floor(epoch(ts)) AS BIGINT) AS es
                       FROM events),
       bots AS (SELECT 900 + (b.range % 5) AS user_id,
                       1704067200 + (b.range // 5) * 300
                         + (b.range % 5) * 7 AS es
                FROM range(0, 250) b),
       allev AS (SELECT user_id, es FROM real_e
                 UNION ALL SELECT user_id, es FROM bots),
       g AS (SELECT user_id, es,
                    lag(es) OVER (PARTITION BY user_id ORDER BY es)
                      AS prev
             FROM allev),
       gaps AS (SELECT user_id, es - prev AS gap FROM g
                WHERE prev IS NOT NULL),
       agg AS (SELECT user_id, count(*) AS n,
                      sum(gap) AS sg, sum(gap*gap) AS sg2
               FROM gaps GROUP BY user_id)
       SELECT user_id, CAST(n AS BIGINT) AS n_gaps,
              CAST(sg AS BIGINT) AS sum_gap,
              CAST(n * sg2 - sg * sg AS BIGINT) AS var_num,
              CAST(CASE WHEN n >= 10
                         AND 100 * (n * sg2 - sg * sg) <= sg * sg
                        THEN 1 ELSE 0 END AS BIGINT) AS is_bot
       FROM agg""",
)
def q321(spark, sf_dir):
    """Bot detection by inter-arrival REGULARITY — humans are
    bursty, schedulers are metronomes: per user, the squared
    coefficient of variation of event gaps, computed from exact
    integer moments (n*sum(g^2) - sum(g)^2 over epoch-second gaps)
    and thresholded by cross-multiplication (CV^2 <= 1/100 with
    >= 10 gaps flags a bot).  Five synthetic metronome users
    (300s-spaced streams) ride along so both branches fire; the lag
    window is user-sharded (the q10 sessionize shape).  At
    clickstream scale this is the standard per-entity behavioral
    feature: one shuffle on user_id."""
    real_e = _t(spark, sf_dir, "events").select(
        "user_id", F.unix_timestamp("ts").alias("es"))
    bots = spark.range(0, 250).selectExpr(
        "900 + (id % 5) AS user_id",
        "1704067200 + (id div 5) * 300 + (id % 5) * 7 AS es",
    )
    allev = real_e.unionByName(bots)
    w = Window.partitionBy("user_id").orderBy("es")
    gaps = (
        allev.withColumn("prev", F.lag("es").over(w))
        .filter(F.col("prev").isNotNull())
        .select("user_id", (F.col("es") - F.col("prev")).alias("gap"))
    )
    agg = gaps.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("gap").alias("sg"),
        F.sum(F.col("gap") * F.col("gap")).alias("sg2"),
    )
    return agg.select(
        "user_id",
        F.col("n").cast("long").alias("n_gaps"),
        F.col("sg").cast("long").alias("sum_gap"),
        (F.col("n") * F.col("sg2") - F.col("sg") * F.col("sg"))
        .cast("long").alias("var_num"),
        F.when(
            (F.col("n") >= 10)
            & (100 * (F.col("n") * F.col("sg2") - F.col("sg") * F.col("sg"))
               <= F.col("sg") * F.col("sg")),
            1,
        ).otherwise(0).cast("long").alias("is_bot"),
    )


# --- entity resolution with blocking (q322) -----------------------------------


@query(
    "q322_entity_resolution",
    """WITH a AS (SELECT doc_id AS aid,
                    'user' || CAST(doc_id AS VARCHAR) AS name,
                    string_split(text, ' ')[1] AS city
                  FROM documents),
       b AS (SELECT doc_id + 100000 AS bid,
                    CASE WHEN doc_id % 3 = 0 THEN
                      substr('user' || CAST(doc_id AS VARCHAR), 1, 2) ||
                      substr('user' || CAST(doc_id AS VARCHAR), 4,
                             length('user' || CAST(doc_id AS VARCHAR)) - 3)
                    ELSE 'user' || CAST(doc_id AS VARCHAR) END AS name,
                    string_split(text, ' ')[1] AS city,
                    doc_id AS truth
             FROM documents),
       cand AS (SELECT a.aid, b.bid, b.truth,
                       CASE WHEN a.name = b.name THEN 5 ELSE 0 END
                       + CASE WHEN a.city = b.city THEN 3 ELSE 0 END
                       + CASE WHEN abs(length(a.name) - length(b.name))
                              <= 1 THEN 1 ELSE 0 END AS score
                FROM a JOIN b
                  ON substr(a.name, 1, 3) = substr(b.name, 1, 3)
                 AND abs(a.aid % 40 - (b.bid - 100000) % 40) = 0)
       SELECT aid, bid, CAST(score AS BIGINT) AS score,
              CAST(CASE WHEN score >= 4 THEN 1 ELSE 0 END AS BIGINT)
                AS is_match,
              CAST(CASE WHEN truth = aid THEN 1 ELSE 0 END AS BIGINT)
                AS is_true_pair
       FROM cand WHERE score >= 2""",
)
def q322(spark, sf_dir):
    """Entity resolution with BLOCKING (Fellegi-Sunter-style
    integer agreement scoring): record set B is A with a planted
    char-dropped name typo on every third record; candidate pairs
    come only from a blocking join (3-char name prefix + a
    deterministic block residual), NEVER the full cross — the
    classic linkage shape whose cost is sum(block^2); the match
    score is the exact integer sum of field-agreement weights
    (name=5, city=3, length-within-1=1), match at >= 4, and the
    planted ground truth rides along so precision/recall are
    computable downstream.  Typo'd records keep city agreement +
    length tolerance (score 4) — found WITHOUT exact name equality."""
    docs = _t(spark, sf_dir, "documents")
    a = docs.selectExpr(
        "doc_id AS aid",
        "concat('user', CAST(doc_id AS STRING)) AS name",
        "split(text, ' ')[0] AS city",
    )
    b = docs.selectExpr(
        "doc_id + 100000 AS bid",
        """CASE WHEN doc_id % 3 = 0 THEN
             concat(substring(concat('user', CAST(doc_id AS STRING)), 1, 2),
                    substring(concat('user', CAST(doc_id AS STRING)), 4,
                      length(concat('user', CAST(doc_id AS STRING))) - 3))
           ELSE concat('user', CAST(doc_id AS STRING)) END AS name""",
        "split(text, ' ')[0] AS city",
        "doc_id AS truth",
    )
    cand = (
        a.join(
            b,
            (F.substring(a.name, 1, 3) == F.substring(b.name, 1, 3))
            & (F.abs(F.col("aid") % 40 - (F.col("bid") - 100000) % 40)
               == 0),
        )
        .select(
            "aid", "bid", "truth",
            (
                F.when(a.name == b.name, 5).otherwise(0)
                + F.when(a.city == b.city, 3).otherwise(0)
                + F.when(
                    F.abs(F.length(a.name) - F.length(b.name)) <= 1, 1
                ).otherwise(0)
            ).alias("score"),
        )
    )
    return cand.filter(F.col("score") >= 2).select(
        "aid", "bid",
        F.col("score").cast("long").alias("score"),
        F.when(F.col("score") >= 4, 1).otherwise(0).cast("long")
        .alias("is_match"),
        F.when(F.col("truth") == F.col("aid"), 1).otherwise(0)
        .cast("long").alias("is_true_pair"),
    )


# --- host boilerplate-template (soft-404) detection (q323) --------------------


@query(
    "q323_host_template_detection",
    """WITH d AS (SELECT doc_id, doc_id % 20 AS host,
                    CASE WHEN doc_id % 20 < 8 AND (doc_id // 20) % 5 < 2
                         THEN 'page not found error template'
                         ELSE array_to_string(
                           string_split(text, ' ')[1:8], ' ') END
                      AS prefix8
                  FROM documents),
       grp AS (SELECT host, prefix8, count(*) AS c FROM d
               GROUP BY host, prefix8),
       agg AS (SELECT host, max(c) AS max_grp, sum(c) AS n_docs,
                      count(*) AS n_prefixes
               FROM grp GROUP BY host)
       SELECT host,
              CAST(n_docs AS BIGINT) AS n_docs,
              CAST(n_prefixes AS BIGINT) AS n_prefixes,
              CAST(max_grp AS BIGINT) AS max_template_grp,
              CAST(CASE WHEN 5 * max_grp >= n_docs THEN 1 ELSE 0 END
                AS BIGINT) AS is_templated
       FROM agg""",
)
def q323(spark, sf_dir):
    """Host boilerplate-template (soft-404) detection — a host where
    many URLs open with the SAME first-8-words prefix is serving an
    error/placeholder template under 200-OK (the crawl-waste soft-404
    case): per host, the largest identical-prefix group vs doc count,
    templated when >= 20% share (5*max_grp >= n_docs exact).  A
    planted 'page not found' template on hosts 0-7 (2 of every 5
    doc_id-div-20 slots, so it VARIES within each host) fires the
    flag there and nowhere else.  One (host, prefix)
    groupBy + one host rollup — the per-host template screen that
    runs next to q304's URL-alias detector."""
    docs = _t(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", (F.col("doc_id") % 20).alias("host"),
        F.when(
            (F.col("doc_id") % 20 < 8)
            & (F.expr("doc_id div 20") % 5 < 2),
            F.lit("page not found error template"),
        ).otherwise(
            F.array_join(F.slice(F.split("text", " "), 1, 8), " ")
        ).alias("prefix8"),
    )
    grp = d.groupBy("host", "prefix8").agg(F.count("*").alias("c"))
    agg = grp.groupBy("host").agg(
        F.max("c").alias("max_grp"), F.sum("c").alias("n_docs"),
        F.count("*").alias("n_prefixes"),
    )
    return agg.select(
        "host",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_prefixes").cast("long").alias("n_prefixes"),
        F.col("max_grp").cast("long").alias("max_template_grp"),
        F.when(5 * F.col("max_grp") >= F.col("n_docs"), 1).otherwise(0)
        .cast("long").alias("is_templated"),
    )


# --- first-order Markov transition matrix (q324) ------------------------------


@query(
    "q324_markov_transitions",
    """WITH g AS (SELECT user_id, event_type,
                    lag(event_type) OVER
                      (PARTITION BY user_id ORDER BY ts, event_id)
                      AS prev
             FROM events),
       t AS (SELECT prev, event_type AS curr, count(*) AS c FROM g
             WHERE prev IS NOT NULL GROUP BY prev, curr),
       r AS (SELECT prev, sum(c) AS rt FROM t GROUP BY prev)
       SELECT t.prev, t.curr,
              CAST(t.c AS BIGINT) AS n,
              CAST(r.rt AS BIGINT) AS from_total,
              CAST(t.c AS DOUBLE) / CAST(r.rt AS DOUBLE) AS p
       FROM t JOIN r USING (prev)""",
)
def q324(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences — the behavioral model behind next-action prediction
    and funnel leak analysis: transitions from the user-sharded lag
    window (ordered by ts then event_id for determinism, the q10
    idiom), counted per (prev, curr) pair, with the row-conditional
    probability as ONE division over exact integers.  5x5 output at
    any clickstream volume; the only shuffle is user-keyed then
    pair-keyed."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = e.withColumn("prev", F.lag("event_type").over(w))
    t = (
        g.filter(F.col("prev").isNotNull())
        .groupBy("prev", F.col("event_type").alias("curr"))
        .agg(F.count("*").alias("c"))
    )
    r = t.groupBy("prev").agg(F.sum("c").alias("rt"))
    return t.join(F.broadcast(r), "prev").select(
        "prev", "curr",
        F.col("c").cast("long").alias("n"),
        F.col("rt").cast("long").alias("from_total"),
        (F.col("c").cast("double") / F.col("rt").cast("double"))
        .alias("p"),
    )


# --- co-visitation recommendations (q325) -------------------------------------


@query(
    "q325_covisitation_recs",
    """WITH ev AS (SELECT user_id,
                     CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT)
                       AS item
                   FROM events),
       ui AS (SELECT DISTINCT user_id, item FROM ev),
       pr AS (SELECT a.item AS x, b.item AS y, count(*) AS c
              FROM ui a JOIN ui b
                ON a.user_id = b.user_id AND a.item <> b.item
              GROUP BY a.item, b.item),
       m AS (SELECT x, max(c) AS mc, sum(c) AS cov_total,
                    count(*) AS n_coitems
             FROM pr GROUP BY x),
       top AS (SELECT pr.x, min(pr.y) AS rec
               FROM pr JOIN m ON m.x = pr.x AND pr.c = m.mc
               GROUP BY pr.x)
       SELECT m.x AS item, top.rec,
              CAST(m.mc AS BIGINT) AS rec_count,
              CAST(m.n_coitems AS BIGINT) AS n_coitems,
              CAST(m.cov_total AS BIGINT) AS cov_total
       FROM m JOIN top ON top.x = m.x""",
)
def q325(spark, sf_dir):
    """Item co-visitation recommendations ('users who touched X also
    touched Y') — the classic recsys candidate generator: items
    parsed out of the JSON props column (cross-engine regexp), the
    distinct user-item table self-joined on user (candidate volume
    sum(per-user items^2) — per-user bounded, never item^2), and the
    top recommendation per item by the (count desc, item asc) argmax
    (max-count then min-item, two bounded aggregations).  At
    clickstream scale the user self-join is THE co-visitation
    shuffle; hot users get capped upstream (the q19 df-cap lesson
    applies to power users)."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.regexp_extract("props", "([0-9]+)", 1).cast("long")
        .alias("item"),
    )
    ui = ev.distinct()
    b = ui.selectExpr("user_id", "item AS y")
    pr = (
        ui.join(b, "user_id")
        .filter(F.col("item") != F.col("y"))
        .groupBy(F.col("item").alias("x"), "y")
        .agg(F.count("*").alias("c"))
    )
    m = pr.groupBy("x").agg(
        F.max("c").alias("mc"), F.sum("c").alias("cov_total"),
        F.count("*").alias("n_coitems"),
    )
    top = (
        pr.join(m, "x").filter(F.col("c") == F.col("mc"))
        .groupBy("x").agg(F.min("y").alias("rec"))
    )
    return m.join(top, "x").select(
        F.col("x").alias("item"), "rec",
        F.col("mc").cast("long").alias("rec_count"),
        F.col("n_coitems").cast("long").alias("n_coitems"),
        F.col("cov_total").cast("long").alias("cov_total"),
    )


# --- PageRank vs TrustRank rank correlation (q326) ----------------------------


@query(
    "q326_centrality_rank_correlation",
    """WITH hosts AS (SELECT DISTINCT doc_id % 40 AS host FROM documents),
       edges AS (SELECT host AS src, (host + 1) % 40 AS dst FROM hosts
                 UNION ALL SELECT host, (host * 2 + 7) % 40 FROM hosts
                 UNION ALL SELECT host, (host * 3 + 11) % 40 FROM hosts),
       r0 AS (SELECT host, CAST(1 AS BIGINT) AS r FROM hosts),
       r1 AS (SELECT h.host, CAST(9 + coalesce(s.s, 0) AS BIGINT) AS r
              FROM hosts h LEFT JOIN
                   (SELECT e.dst AS host, sum(17 * r.r) AS s
                    FROM edges e JOIN r0 r ON e.src = r.host
                    GROUP BY e.dst) s USING (host)),
       r2 AS (SELECT h.host, CAST(9*60 + coalesce(s.s, 0) AS BIGINT) AS r
              FROM hosts h LEFT JOIN
                   (SELECT e.dst AS host, sum(17 * r.r) AS s
                    FROM edges e JOIN r1 r ON e.src = r.host
                    GROUP BY e.dst) s USING (host)),
       t0 AS (SELECT host, CAST(CASE WHEN host % 10 = 0 THEN 1 ELSE 0 END
                                AS BIGINT) AS r FROM hosts),
       t1 AS (SELECT h.host,
                     CAST(CASE WHEN h.host % 10 = 0 THEN 9 ELSE 0 END
                          + coalesce(s.s, 0) AS BIGINT) AS r
              FROM hosts h LEFT JOIN
                   (SELECT e.dst AS host, sum(17 * r.r) AS s
                    FROM edges e JOIN t0 r ON e.src = r.host
                    GROUP BY e.dst) s USING (host)),
       t2 AS (SELECT h.host,
                     CAST(CASE WHEN h.host % 10 = 0 THEN 9*60 ELSE 0 END
                          + coalesce(s.s, 0) AS BIGINT) AS r
              FROM hosts h LEFT JOIN
                   (SELECT e.dst AS host, sum(17 * r.r) AS s
                    FROM edges e JOIN t1 r ON e.src = r.host
                    GROUP BY e.dst) s USING (host)),
       pra AS (SELECT a.host,
                      (SELECT count(*) FROM r2 b
                       WHERE b.r > a.r
                          OR (b.r = a.r AND b.host < a.host)) + 1 AS rnk
               FROM r2 a),
       trb AS (SELECT a.host,
                      (SELECT count(*) FROM t2 b
                       WHERE b.r > a.r
                          OR (b.r = a.r AND b.host < a.host)) + 1 AS rnk
               FROM t2 a),
       dd AS (SELECT pra.host,
                     CAST(pra.rnk AS BIGINT) AS pr_rank,
                     CAST(trb.rnk AS BIGINT) AS tr_rank,
                     (pra.rnk - trb.rnk) * (pra.rnk - trb.rnk) AS d2
              FROM pra JOIN trb USING (host))
       SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(d2) AS BIGINT) AS sum_d2,
              1.0 - CAST(6 * sum(d2) AS DOUBLE)
                / CAST(count(*) * (count(*) * count(*) - 1) AS DOUBLE)
                AS spearman
       FROM dd""",
)
def q326(spark, sf_dir):
    """Spearman rank correlation between PageRank (q190's uniform
    teleport) and TrustRank (q280's seed teleport) — the spam-audit
    number itself: how far does trust REORDER the authority ranking
    (rank divergence localizes link farms).  Both centralities run 2
    exact-BIGINT rounds; ranks are total orders via the
    count-of-greater rule with (score desc, host asc) tie-break (a
    broadcast self-join over the 40-host table, never a global
    window); Spearman = 1 - 6*sum(d^2)/(n(n^2-1)) with the integer
    sums exact and ONE float division.  Composing two centralities
    in one plan exercises the shared edge table: Catalyst reuses the
    scan, the rank joins broadcast."""
    docs = _t(spark, sf_dir, "documents")
    hosts = docs.select((F.col("doc_id") % 40).alias("host")).distinct()
    edges = hosts.select(
        F.col("host").alias("src"),
        F.explode(F.array(
            (F.col("host") + 1) % 40,
            (F.col("host") * 2 + 7) % 40,
            (F.col("host") * 3 + 11) % 40,
        )).alias("dst"),
    ).localCheckpoint(eager=True)

    def two_rounds(seeded):
        seed = (F.when(F.col("host") % 10 == 0, 1).otherwise(0)
                if seeded else F.lit(1))
        ranks = hosts.withColumn("r", seed.cast("long"))
        for t in range(2):
            tele = 9 * (60 ** t)
            contrib = (
                edges.join(ranks, edges.src == ranks.host)
                .groupBy("dst").agg(F.sum(F.col("r") * 17).alias("s"))
            )
            tele_col = (
                F.when(hosts.host % 10 == 0, F.lit(tele)).otherwise(0)
                if seeded else F.lit(tele)
            )
            ranks = (
                hosts.join(contrib, hosts.host == contrib.dst, "left")
                .select(
                    hosts.host,
                    (tele_col + F.coalesce(F.col("s"), F.lit(0)))
                    .cast("long").alias("r"),
                )
            )
        return ranks

    pr2 = two_rounds(False)
    tr2 = two_rounds(True)

    def rank_of(df):
        b = df.selectExpr("host AS bh", "r AS br")
        return (
            df.join(
                F.broadcast(b),
                (F.col("br") > F.col("r"))
                | ((F.col("br") == F.col("r"))
                   & (F.col("bh") < F.col("host"))),
                "left",
            )
            .groupBy("host").agg((F.count("bh") + 1).alias("rnk"))
        )
    pra = rank_of(pr2)
    trb = rank_of(tr2).withColumnRenamed("rnk", "trnk")
    dd = pra.join(trb, "host").select(
        "host", "rnk", "trnk",
        ((F.col("rnk") - F.col("trnk"))
         * (F.col("rnk") - F.col("trnk"))).alias("d2"),
    )
    return dd.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("d2").cast("long").alias("sum_d2"),
        (
            F.lit(1.0)
            - (6 * F.sum("d2")).cast("double")
            / (F.count("*") * (F.count("*") * F.count("*") - 1))
            .cast("double")
        ).alias("spearman"),
    )


# --- autocomplete prefix table (q327) -----------------------------------------


@query(
    "q327_autocomplete_prefixes",
    """WITH w AS (SELECT word, count(*) AS df FROM
                    (SELECT unnest(string_split(text, ' ')) AS word
                     FROM documents)
                  GROUP BY word),
       px AS (SELECT substr(word, 1, p.range) AS prefix, word, df
              FROM w, range(1, 5) p
              WHERE p.range <= length(word)),
       m AS (SELECT prefix, max(df) AS mdf, count(*) AS n_words,
                    sum(df) AS prefix_traffic
             FROM px GROUP BY prefix),
       top AS (SELECT px.prefix, min(px.word) AS completion
               FROM px JOIN m ON m.prefix = px.prefix AND px.df = m.mdf
               GROUP BY px.prefix)
       SELECT m.prefix, top.completion,
              CAST(m.mdf AS BIGINT) AS completion_df,
              CAST(m.n_words AS BIGINT) AS n_words,
              CAST(m.prefix_traffic AS BIGINT) AS prefix_traffic
       FROM m JOIN top ON top.prefix = m.prefix""",
)
def q327(spark, sf_dir):
    """Autocomplete prefix table — the search-frontend suggestion
    index: every 1..4-char prefix of the lexicon maps to its
    top completion (max corpus frequency, ties to
    lexicographically-least word) plus the prefix's candidate count
    and total traffic.  The prefix explosion is lexicon-bounded
    (4 rows per word), the argmax is the two-phase max-count/min-word
    pair of bounded aggregations — at a 10^8-term lexicon this is
    still a lexicon-side build, never touching the corpus twice."""
    docs = _t(spark, sf_dir, "documents")
    w = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word").agg(F.count("*").alias("df"))
    )
    px = w.select(
        "word", "df",
        F.explode(F.sequence(F.lit(1), F.least(F.lit(4), F.length("word"))))
        .alias("p"),
    ).select(
        F.expr("substring(word, 1, CAST(p AS INT))").alias("prefix"),
        "word", "df",
    )
    m = px.groupBy("prefix").agg(
        F.max("df").alias("mdf"), F.count("*").alias("n_words"),
        F.sum("df").alias("prefix_traffic"),
    )
    top = (
        px.join(m, "prefix").filter(F.col("df") == F.col("mdf"))
        .groupBy("prefix").agg(F.min("word").alias("completion"))
    )
    return m.join(top, "prefix").select(
        "prefix", "completion",
        F.col("mdf").cast("long").alias("completion_df"),
        F.col("n_words").cast("long").alias("n_words"),
        F.col("prefix_traffic").cast("long").alias("prefix_traffic"),
    )


# --- streaming Count-Min sketch (q328) ----------------------------------------


@query("q328_streaming_countmin", ORACLES["q278_countmin_sketch"])
def q328(spark, sf_dir):
    """STREAMING Count-Min: the q278 sketch cells maintained by a
    real Structured Streaming query (streaming/windowed.py::
    stream_countmin_cells — stateless tokenize + 4-row hash explode,
    the single stateful operator is the (row, col) count whose state
    is 256 cells FOREVER), then the identical batch probe over the
    drained cells.  Oracle = q278's batch SQL: stream-maintained
    cells are proven equal to the batch sketch, the mergeability
    property that lets the fleet run frequency estimation in the
    ingest tier."""
    import os as _os
    from gdal_spark.streaming.windowed import stream_countmin_cells

    sk = stream_countmin_cells(
        spark, _os.path.join(sf_dir, "documents.parquet"))
    docs = _t(spark, sf_dir, "documents")
    words = docs.select(F.explode(F.split("text", " ")).alias("word"))
    tc = words.groupBy("word").agg(F.count("*").alias("cnt"))
    cells = tc.select(
        "word", "cnt", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("r")
    ).withColumn(
        "c",
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("cm"), F.col("r").cast("string"),
                               F.lit(":"), F.col("word"))),
                1, 8,
            ),
            16, 10,
        ).cast("long") % 64,
    )
    est = (
        cells.select("word", "r", "c")
        .join(F.broadcast(sk), ["r", "c"])
        .groupBy("word")
        .agg(F.min("cell").alias("cms_est"))
    )
    return tc.join(est, "word").select(
        "word",
        F.col("cnt").cast("long").alias("true_cnt"),
        F.col("cms_est").cast("long").alias("cms_est"),
        (F.col("cms_est") - F.col("cnt")).cast("long").alias("overcount"),
    )


# --- crawl snapshot diff (q329) -----------------------------------------------


@query(
    "q329_crawl_snapshot_diff",
    """WITH u AS (SELECT doc_id, doc_id % 20 AS host,
                    'u' || CAST(doc_id AS VARCHAR) AS url,
                    md5(CASE WHEN doc_id % 7 = 0
                        THEN text || ' v2' ELSE text END) AS h_new,
                    md5(text) AS h_old
                  FROM documents),
       m AS (SELECT host, url,
                    CASE WHEN doc_id % 10 < 9 THEN 1 ELSE 0 END AS in_a,
                    CASE WHEN doc_id % 10 > 0 THEN 1 ELSE 0 END AS in_b,
                    CASE WHEN h_new <> h_old THEN 1 ELSE 0 END AS changed
             FROM u)
       SELECT host,
              CAST(sum(CASE WHEN in_a = 1 AND in_b = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_removed,
              CAST(sum(CASE WHEN in_a = 0 AND in_b = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_added,
              CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 AND changed = 1
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
              CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 AND changed = 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
       FROM m GROUP BY host""",
)
def q329(spark, sf_dir):
    """Crawl snapshot diff — the crawl-cycle reconciliation (what did
    this cycle add / drop / change per host): snapshot membership
    flags and a content-hash change flag computed in ONE pass, then a
    single host rollup of the four diff classes (added / removed /
    changed / unchanged) — the q250/q318 fused-membership pattern
    applied to snapshot reconciliation; three separate joins would
    re-scan the snapshots and still miss the cross cells.  At
    10^12-URL snapshots this is one scan + one host-keyed combine."""
    docs = _t(spark, sf_dir, "documents")
    m = docs.select(
        (F.col("doc_id") % 20).alias("host"),
        F.when(F.col("doc_id") % 10 < 9, 1).otherwise(0).alias("in_a"),
        F.when(F.col("doc_id") % 10 > 0, 1).otherwise(0).alias("in_b"),
        F.when(
            F.md5(
                F.when(F.col("doc_id") % 7 == 0,
                       F.concat(F.col("text"), F.lit(" v2")))
                .otherwise(F.col("text"))
            ) != F.md5("text"),
            1,
        ).otherwise(0).alias("changed"),
    )
    return m.groupBy("host").agg(
        F.sum(F.when((F.col("in_a") == 1) & (F.col("in_b") == 0), 1)
              .otherwise(0)).cast("long").alias("n_removed"),
        F.sum(F.when((F.col("in_a") == 0) & (F.col("in_b") == 1), 1)
              .otherwise(0)).cast("long").alias("n_added"),
        F.sum(F.when((F.col("in_a") == 1) & (F.col("in_b") == 1)
                     & (F.col("changed") == 1), 1).otherwise(0))
        .cast("long").alias("n_changed"),
        F.sum(F.when((F.col("in_a") == 1) & (F.col("in_b") == 1)
                     & (F.col("changed") == 0), 1).otherwise(0))
        .cast("long").alias("n_unchanged"),
    )


# --- cache admission planning (q330) ------------------------------------------


@query(
    "q330_cache_admission_planning",
    """WITH req AS (SELECT CAST(regexp_extract(props, '([0-9]+)', 1)
                             AS BIGINT) AS item
                    FROM events),
       c AS (SELECT item, count(*) AS c FROM req GROUP BY item),
       rk AS (SELECT a.item, a.c,
                     (SELECT count(*) FROM c b
                      WHERE b.c > a.c
                         OR (b.c = a.c AND b.item < a.item)) + 1 AS rnk
              FROM c a),
       t AS (SELECT sum(c) AS tot FROM c)
       SELECT k.k AS cache_k,
              CAST(t.tot AS BIGINT) AS n_requests,
              CAST(sum(CASE WHEN rk.rnk <= k.k THEN rk.c ELSE 0 END)
                AS BIGINT) AS n_hits,
              CAST(sum(CASE WHEN rk.rnk <= k.k THEN 1 ELSE 0 END)
                AS BIGINT) AS n_cached_items
       FROM rk CROSS JOIN (VALUES (10), (25), (50)) k(k)
       CROSS JOIN t
       GROUP BY k.k, t.tot""",
)
def q330(spark, sf_dir):
    """Static cache-admission planning — the CDN / result-cache
    sizing question answered from the request histogram: if the cache
    pins the top-k hottest items (perfect frequency admission), the
    hit count is exactly the sum of their request counts.  Items come
    from the JSON props field; ranks are a total order by
    (count desc, item asc) via the count-of-greater broadcast
    self-join over the BOUNDED item table (100 items — never a
    window over requests); three k values in one pass.  At CDN scale
    the histogram is the only corpus-sized aggregation."""
    req = _t(spark, sf_dir, "events").select(
        F.regexp_extract("props", "([0-9]+)", 1).cast("long").alias("item"))
    c = req.groupBy("item").agg(F.count("*").alias("c"))
    b = c.selectExpr("item AS bi", "c AS bc")
    rk = (
        c.join(
            F.broadcast(b),
            (F.col("bc") > F.col("c"))
            | ((F.col("bc") == F.col("c")) & (F.col("bi") < F.col("item"))),
            "left",
        )
        .groupBy("item", "c").agg((F.count("bi") + 1).alias("rnk"))
    )
    t = c.agg(F.sum("c").alias("tot"))
    ks = spark.createDataFrame([(10,), (25,), (50,)], "k INT")
    return (
        rk.crossJoin(F.broadcast(ks)).crossJoin(F.broadcast(t))
        .groupBy(F.col("k").alias("cache_k"), "tot")
        .agg(
            F.sum(F.when(F.col("rnk") <= F.col("k"), F.col("c"))
                  .otherwise(0)).cast("long").alias("n_hits"),
            F.sum(F.when(F.col("rnk") <= F.col("k"), 1).otherwise(0))
            .cast("long").alias("n_cached_items"),
        )
        .select(
            "cache_k",
            F.col("tot").cast("long").alias("n_requests"),
            "n_hits", "n_cached_items",
        )
    )


# --- local-bridge (triangle-free) edge accounting (q331) ----------------------


@query(
    "q331_local_bridges",
    """WITH h AS (SELECT DISTINCT doc_id % 60 AS hh FROM documents),
       e0 AS (SELECT hh, unnest([1, 2, 3]) AS j FROM h),
       ed AS (SELECT DISTINCT least(hh, (hh * j + j * j * 7) % 60) AS u,
                     greatest(hh, (hh * j + j * j * 7) % 60) AS v
              FROM e0 WHERE hh <> (hh * j + j * j * 7) % 60),
       adj AS (SELECT u AS a, v AS b FROM ed
               UNION ALL SELECT v, u FROM ed),
       tri AS (SELECT DISTINCT e.u, e.v
               FROM ed e JOIN adj x ON x.a = e.u
                         JOIN adj y ON y.a = e.v AND y.b = x.b),
       flag AS (SELECT ed.u, ed.v,
                       CASE WHEN tri.u IS NOT NULL THEN 0 ELSE 1 END
                         AS is_bridge
                FROM ed LEFT JOIN tri
                  ON tri.u = ed.u AND tri.v = ed.v)
       SELECT u AS host,
              CAST(count(*) AS BIGINT) AS n_edges,
              CAST(sum(is_bridge) AS BIGINT) AS n_local_bridges
       FROM flag GROUP BY u""",
)
def q331(spark, sf_dir):
    """Local-bridge accounting — edges in NO triangle (zero common
    neighbors) are the graph's weak ties (Granovetter): removing one
    lengthens the path between its endpoints, so crawl schedulers
    treat bridge-heavy hosts as fragile discovery frontiers.
    Detection reuses the q275 wedge machinery inverted: an edge is
    triangle-covered iff its endpoints share an adjacency row, found
    by one two-hop equi-join, and bridges are the anti-complement —
    work bounded by the wedge count, never node^3.  Emitted per
    lower endpoint (host) as edge/bridge counts."""
    docs = _t(spark, sf_dir, "documents")
    h = docs.selectExpr("doc_id % 60 AS hh").distinct()
    e0 = h.select(
        "hh", F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("j")
    ).selectExpr("hh", "(hh * j + j * j * 7) % 60 AS t")
    ed = (
        e0.filter("hh <> t")
        .selectExpr("least(hh, t) AS u", "greatest(hh, t) AS v")
        .distinct()
        .localCheckpoint(eager=True)
    )
    adj = ed.selectExpr("u AS a", "v AS b").unionAll(
        ed.selectExpr("v AS a", "u AS b"))
    x = adj.selectExpr("a AS u", "b AS w1")
    y = adj.selectExpr("a AS v2", "b AS w2")
    tri = (
        ed.join(x, "u")
        .join(y, (F.col("v") == F.col("v2"))
                 & (F.col("w1") == F.col("w2")))
        .select("u", "v").distinct()
        .withColumn("_t", F.lit(1))
    )
    flag = ed.join(tri, ["u", "v"], "left").select(
        "u", "v",
        F.when(F.col("_t").isNotNull(), 0).otherwise(1).alias("is_bridge"),
    )
    return flag.groupBy(F.col("u").alias("host")).agg(
        F.count("*").cast("long").alias("n_edges"),
        F.sum("is_bridge").cast("long").alias("n_local_bridges"),
    )


# --- embedding cluster-health audit (q332) ------------------------------------


@query(
    "q332_cluster_health",
    """WITH v AS (SELECT vec_id, label,
                list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE)*1000 + 0.5) AS BIGINT))
                    AS qv
             FROM embeddings),
       ex AS (SELECT vec_id, label, i.range AS i, qv[i.range] AS q
              FROM v, range(1, 65) i),
       cen AS (SELECT label, i, sum(q) AS cs FROM ex GROUP BY label, i),
       nt AS (SELECT label, count(*) AS n FROM v GROUP BY label),
       dev AS (SELECT e.vec_id, e.label,
                      CAST(sum(abs(e.q * nt.n - cen.cs)) AS BIGINT)
                        AS dev_num
               FROM ex e JOIN cen ON cen.label = e.label AND cen.i = e.i
               JOIN nt ON nt.label = e.label
               GROUP BY e.vec_id, e.label),
       tot AS (SELECT label, sum(dev_num) AS sum_dev,
                      count(*) AS n FROM dev GROUP BY label)
       SELECT dev.label,
              CAST(tot.n AS BIGINT) AS n_members,
              CAST(sum(CASE WHEN dev.dev_num * tot.n >= 2 * tot.sum_dev
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
              CAST(max(dev.dev_num) AS BIGINT) AS max_dev,
              CAST(tot.sum_dev AS BIGINT) AS sum_dev
       FROM dev JOIN tot USING (label)
       GROUP BY dev.label, tot.n, tot.sum_dev""",
)
def q332(spark, sf_dir):
    """Embedding cluster-health audit — the drift check a labeled
    embedding store runs (mislabeled or stale vectors sit far from
    their class centroid): per-label integer centroid SUMS (division-
    free — each member's L1 deviation is |qv_i*n - csum_i|, the
    cross-multiplied distance to the mean), a member is an outlier
    when its deviation is >= 2x the class average (dev*n >= 2*sum_dev,
    exact).  Two label-keyed aggregations + one broadcast centroid
    join; the 64-dim arithmetic is per-row array HOF work (linear).
    All-integer, engine-order-free."""
    v = _t(spark, sf_dir, "embeddings").selectExpr(
        "vec_id", "label",
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*1000 "
        "+ 0.5) AS BIGINT)) AS qv",
    )
    ex = v.select(
        "vec_id", "label",
        F.posexplode("qv").alias("i", "q"),
    )
    cen = ex.groupBy("label", "i").agg(F.sum("q").alias("cs"))
    cen_arr = cen.groupBy("label").agg(
        F.expr("transform(array_sort(collect_list(struct(i, cs))), "
               "s -> s.cs) AS csum"),
        F.lit(None).alias("_d"),
    ).select("label", "csum")
    n_tab = v.groupBy("label").agg(F.count("*").alias("n"))
    dev = (
        v.join(F.broadcast(cen_arr), "label")
        .join(F.broadcast(n_tab), "label")
        .selectExpr(
            "vec_id", "label", "n",
            "CAST(aggregate(zip_with(qv, csum, "
            "(a, b) -> abs(a * n - b)), CAST(0 AS BIGINT), "
            "(acc, s) -> acc + s) AS BIGINT) AS dev_num",
        )
    )
    tot = dev.groupBy("label").agg(
        F.sum("dev_num").alias("sum_dev"), F.count("*").alias("nn"))
    return (
        dev.join(F.broadcast(tot), "label")
        .groupBy("label", "nn", "sum_dev")
        .agg(
            F.sum(
                F.when(F.col("dev_num") * F.col("nn")
                       >= 2 * F.col("sum_dev"), 1).otherwise(0)
            ).cast("long").alias("n_outliers"),
            F.max("dev_num").cast("long").alias("max_dev"),
        )
        .select(
            "label",
            F.col("nn").cast("long").alias("n_members"),
            "n_outliers", "max_dev",
            F.col("sum_dev").cast("long").alias("sum_dev"),
        )
    )


# --- cross-doc passage dedup accounting (q333) --------------------------------


@query(
    "q333_passage_dedup",
    """WITH d AS (SELECT doc_id,
                    CASE WHEN doc_id % 13 = 0 THEN
                      'alpha beta gamma delta epsilon zeta eta theta iota '
                      || 'kappa lam mu nu xi omicron pi rho sigma tau '
                      || 'upsilon phi chi psi omega one two three four '
                      || 'five six'
                    ELSE text END AS body
                  FROM documents),
       s AS (SELECT doc_id, string_split(body, ' ') AS w FROM d),
       p AS (SELECT doc_id, k.range AS k,
                    substr(md5(array_to_string(
                      w[1 + 15*k.range :
                        least(len(w), 1 + 15*k.range + 29)], ' ')), 1, 8)
                      AS h8
             FROM s, range(0, 14) k
             WHERE 1 + 15 * k.range <= len(w)),
       dup AS (SELECT h8, count(*) AS n_occ,
                      count(DISTINCT doc_id) AS n_docs,
                      min(doc_id) AS keeper
               FROM p GROUP BY h8
               HAVING count(DISTINCT doc_id) > 1)
       SELECT h8, CAST(n_occ AS BIGINT) AS n_occ,
              CAST(n_docs AS BIGINT) AS n_docs,
              CAST(keeper AS BIGINT) AS keeper
       FROM dup""",
)
def q333(spark, sf_dir):
    """Cross-document passage dedup accounting — the RAG-corpus
    compaction pass on top of q302's chunking: passages whose md5
    fingerprint appears in MORE THAN ONE document, with occurrence /
    doc counts and the min-id keeper (the q17 exact-dedup contract at
    passage granularity).  A planted 31-word body on doc_id%13==0
    makes identical multi-chunk passages across docs at every SF.
    One fingerprint groupBy — candidate volume is duplicate-group-
    bounded, the same shape that dedups 10^12 passages."""
    docs = _t(spark, sf_dir, "documents")
    tmpl = ("alpha beta gamma delta epsilon zeta eta theta iota "
            "kappa lam mu nu xi omicron pi rho sigma tau "
            "upsilon phi chi psi omega one two three four five six")
    d = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 13 == 0, F.lit(tmpl))
        .otherwise(F.col("text")).alias("body"),
    )
    s = d.select("doc_id", F.split("body", " ").alias("w"))
    p = (
        s.select(
            "doc_id", F.size("w").alias("lw"), "w",
            F.explode(F.sequence(F.lit(0), F.lit(13))).alias("k"),
        )
        .filter(1 + 15 * F.col("k") <= F.col("lw"))
        .withColumn("s0", 1 + 15 * F.col("k"))
        .select(
            "doc_id",
            F.substring(
                F.md5(F.array_join(
                    F.expr("slice(w, s0, least(lw, s0 + 29) - s0 + 1)"),
                    " ")),
                1, 8,
            ).alias("h8"),
        )
    )
    return (
        p.groupBy("h8")
        .agg(
            F.count("*").alias("n_occ"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("keeper"),
        )
        .filter(F.col("n_docs") > 1)
        .select(
            "h8",
            F.col("n_occ").cast("long").alias("n_occ"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("keeper").cast("long").alias("keeper"),
        )
    )


# --- last-touch attribution via as-of join (q334) -----------------------------


@query(
    "q334_last_touch_attribution",
    """WITH clicks AS (SELECT user_id, ts,
                         CAST(regexp_extract(props, '([0-9]+)', 1)
                              AS BIGINT) AS item
                       FROM events WHERE event_type = 'click'),
       buys AS (SELECT event_id, user_id, ts FROM events
                WHERE event_type = 'purchase'),
       mt AS (SELECT b.event_id, b.user_id, max(c.ts) AS mts
              FROM buys b JOIN clicks c
                ON c.user_id = b.user_id AND c.ts < b.ts
              GROUP BY b.event_id, b.user_id),
       x AS (SELECT mt.event_id, max(c.item) AS item
             FROM mt JOIN clicks c
               ON c.user_id = mt.user_id AND c.ts = mt.mts
             GROUP BY mt.event_id)
       SELECT item,
              CAST(count(*) AS BIGINT) AS n_attributed
       FROM x GROUP BY item""",
)
def q334(spark, sf_dir):
    """Last-touch attribution — the AS-OF JOIN Spark lacks natively,
    expressed as the combinable max-struct idiom: each purchase
    matches the LATEST prior click of the same user (max(struct(ts,
    item)) over candidates with ts < purchase_ts — map-side
    combinable, no window over the event stream), then attributed
    purchases roll up per item.  The user-keyed equi-join carries
    the shuffle; candidate fan-out is per-user bounded.  This is the
    point-in-time enrichment shape (q253's SCD-2 lookup) driven from
    the event side — the revenue-attribution query every analytics
    stack runs."""
    e = _t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts"),
        F.regexp_extract("props", "([0-9]+)", 1).cast("long").alias("item"),
    )
    buys = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts")
    att = (
        buys.join(clicks, "user_id")
        .filter(F.col("cts") < F.col("ts"))
        .groupBy("event_id")
        .agg(F.max(F.struct(F.col("cts"), F.col("item"))).alias("m"))
    )
    return (
        att.select(F.col("m.item").alias("item"))
        .groupBy("item")
        .agg(F.count("*").cast("long").alias("n_attributed"))
    )


# --- sliding-window distinct users (q335) -------------------------------------


@query(
    "q335_sliding_distinct_users",
    """WITH e AS (SELECT user_id,
                    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d
                  FROM events),
       win AS (SELECT DISTINCT e.user_id, e.d + o.range AS wend
               FROM e, range(0, 3) o),
       span AS (SELECT min(d) AS lo, max(d) AS hi FROM e)
       SELECT win.wend AS window_end,
              CAST(count(*) AS BIGINT) AS n_active_3d
       FROM win, span
       WHERE win.wend BETWEEN span.lo AND span.hi
       GROUP BY win.wend""",
)
def q335(spark, sf_dir):
    """Sliding 3-day-window distinct active users — the rolling MAU/
    WAU family metric computed EXACTLY without per-window re-scans:
    each (user, day) activation explodes to the 3 window-end days it
    participates in, dedups, and counts — one explode + one distinct
    + one count, all keyed on (user, window), no self-join of the
    event table against itself per window.  At clickstream scale
    this is the standard rolling-distinct shape (window count bounded
    by the calendar, not the events); window ends clipped to the
    observed day span."""
    e = _t(spark, sf_dir, "events").select(
        "user_id",
        F.expr("CAST(unix_timestamp(ts) div 86400 AS BIGINT)").alias("d"),
    )
    win = (
        e.select(
            "user_id", "d",
            F.explode(F.sequence(F.lit(0), F.lit(2))).alias("o"),
        )
        .select("user_id", (F.col("d") + F.col("o")).alias("wend"))
        .distinct()
    )
    span = e.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    return (
        win.crossJoin(F.broadcast(span))
        .filter((F.col("wend") >= F.col("lo"))
                & (F.col("wend") <= F.col("hi")))
        .groupBy(F.col("wend").alias("window_end"))
        .agg(F.count("*").cast("long").alias("n_active_3d"))
    )


# --- time-to-convert distribution (q336) --------------------------------------


@query(
    "q336_time_to_convert",
    """WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
                  WHERE event_type = 'view' GROUP BY user_id),
       p AS (SELECT e.user_id, min(e.ts) AS t_buy
             FROM events e JOIN v ON v.user_id = e.user_id
             WHERE e.event_type = 'purchase' AND e.ts > v.t_view
             GROUP BY e.user_id),
       dt AS (SELECT p.user_id,
                     CAST(floor(epoch(p.t_buy)) AS BIGINT)
                       - CAST(floor(epoch(v.t_view)) AS BIGINT) AS secs
              FROM p JOIN v USING (user_id))
       SELECT CAST(length(bin(secs)) AS BIGINT) AS log2_bucket,
              CAST(count(*) AS BIGINT) AS n_users,
              CAST(min(secs) AS BIGINT) AS min_secs,
              CAST(max(secs) AS BIGINT) AS max_secs
       FROM dt GROUP BY length(bin(secs))""",
)
def q336(spark, sf_dir):
    """Time-to-convert distribution — seconds from first view to
    first subsequent purchase, histogrammed into power-of-two
    buckets (the q294 log-bin sketch applied to a derived duration):
    conversion deltas come from the q316 funnel's min-ts stages, the
    bucket is the exact bin()-length integer, min/max per bucket
    bound the bucket edges visibly.  Two user-keyed aggregations +
    one join; the histogram is mergeable across shards (the property
    that lets the metric run incrementally in the stream tier)."""
    e = _t(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("ts").alias("t_view"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id").agg(F.min("ts").alias("t_buy"))
    )
    dt = p.join(v, "user_id").select(
        "user_id",
        (F.unix_timestamp("t_buy") - F.unix_timestamp("t_view"))
        .alias("secs"),
    )
    return dt.groupBy(
        F.length(F.bin("secs")).cast("long").alias("log2_bucket")
    ).agg(
        F.count("*").cast("long").alias("n_users"),
        F.min("secs").cast("long").alias("min_secs"),
        F.max("secs").cast("long").alias("max_secs"),
    )


# --- Heaps'-law vocabulary growth (q337) --------------------------------------


@query(
    "q337_heaps_vocab_growth",
    """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                  FROM documents),
       fs AS (SELECT word, min(doc_id) AS first_doc FROM w
              GROUP BY word),
       ks AS (SELECT k.k FROM (VALUES (50), (100), (200), (500)) k(k))
       SELECT ks.k AS n_docs,
              CAST(sum(CASE WHEN fs.first_doc < ks.k THEN 1 ELSE 0 END)
                AS BIGINT) AS vocab_size
       FROM ks CROSS JOIN fs
       GROUP BY ks.k""",
)
def q337(spark, sf_dir):
    """Heaps'-law vocabulary growth curve — distinct vocabulary after
    the first k documents, for four prefix sizes in ONE pass: a
    word's first appearance is its min doc_id (map-side-combinable),
    and each curve point is a flag-sum over the lexicon-sized
    first-seen table — no per-prefix rescan of the corpus (the naive
    form scans the corpus once per k).  The growth-curve shape
    decides tokenizer vocab budgets and dedup thresholds at corpus
    build time."""
    docs = _t(spark, sf_dir, "documents")
    w = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    fs = w.groupBy("word").agg(F.min("doc_id").alias("first_doc"))
    ks = spark.createDataFrame([(50,), (100,), (200,), (500,)], "k INT")
    return (
        F.broadcast(ks).crossJoin(fs)
        .groupBy(F.col("k").alias("n_docs"))
        .agg(
            F.sum(F.when(F.col("first_doc") < F.col("k"), 1).otherwise(0))
            .cast("long").alias("vocab_size")
        )
        .select(F.col("n_docs").cast("long").alias("n_docs"), "vocab_size")
    )


# --- Zipf rank-frequency products (q338) --------------------------------------


@query(
    "q338_zipf_products",
    """WITH w AS (SELECT word, count(*) AS f FROM
                    (SELECT unnest(string_split(text, ' ')) AS word
                     FROM documents)
                  GROUP BY word),
       rk AS (SELECT a.word, a.f,
                     (SELECT count(*) FROM w b
                      WHERE b.f > a.f
                         OR (b.f = a.f AND b.word < a.word)) + 1 AS rnk
              FROM w a)
       SELECT CAST(rnk AS BIGINT) AS rnk, word,
              CAST(f AS BIGINT) AS freq,
              CAST(rnk * f AS BIGINT) AS rank_freq_product
       FROM rk WHERE rnk <= 20""",
)
def q338(spark, sf_dir):
    """Zipf rank-frequency products for the top-20 terms — the
    classic corpus sanity check (natural language keeps rank x freq
    roughly constant; a synthetic or boilerplate-heavy corpus shows a
    flat head): ranks are a total order by (freq desc, word asc) via
    the count-of-greater broadcast self-join over the BOUNDED lexicon
    (never a window over tokens), and the product is exact integer.
    The head shape feeds stopword-list selection and CMS sizing."""
    docs = _t(spark, sf_dir, "documents")
    w = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word").agg(F.count("*").alias("f"))
    )
    b = w.selectExpr("word AS bw", "f AS bf")
    rk = (
        w.join(
            F.broadcast(b),
            (F.col("bf") > F.col("f"))
            | ((F.col("bf") == F.col("f")) & (F.col("bw") < F.col("word"))),
            "left",
        )
        .groupBy("word", "f").agg((F.count("bw") + 1).alias("rnk"))
    )
    return rk.filter(F.col("rnk") <= 20).select(
        F.col("rnk").cast("long").alias("rnk"), "word",
        F.col("f").cast("long").alias("freq"),
        (F.col("rnk") * F.col("f")).cast("long")
        .alias("rank_freq_product"),
    )


# --- vocabulary-size / OOV tradeoff (q339) ------------------------------------


@query(
    "q339_vocab_oov_tradeoff",
    """WITH w AS (SELECT word, count(*) AS f FROM
                    (SELECT unnest(string_split(text, ' ')) AS word
                     FROM documents)
                  GROUP BY word),
       rk AS (SELECT a.word, a.f,
                     (SELECT count(*) FROM w b
                      WHERE b.f > a.f
                         OR (b.f = a.f AND b.word < a.word)) + 1 AS rnk
              FROM w a),
       t AS (SELECT sum(f) AS tot FROM w),
       ks AS (SELECT k.k FROM (VALUES (5), (10), (20), (31)) k(k))
       SELECT ks.k AS vocab_k,
              CAST(t.tot AS BIGINT) AS n_tokens,
              CAST(sum(CASE WHEN rk.rnk <= ks.k THEN rk.f ELSE 0 END)
                AS BIGINT) AS covered,
              CAST(t.tot - sum(CASE WHEN rk.rnk <= ks.k THEN rk.f
                               ELSE 0 END) AS BIGINT) AS oov_tokens
       FROM ks CROSS JOIN rk CROSS JOIN t
       GROUP BY ks.k, t.tot""",
)
def q339(spark, sf_dir):
    """Vocabulary-size / OOV tradeoff curve — the tokenizer budget
    decision (how many tokens does a top-k vocabulary leave out-of-
    vocabulary): coverage per k is a flag-sum over the ranked lexicon
    (count-of-greater total order, the q338 rank table reused), four
    k points in one pass.  OOV drives the byte-fallback rate of a
    BPE vocab and the UNK rate of a word vocab — this curve is the
    capacity plan for both."""
    docs = _t(spark, sf_dir, "documents")
    w = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word").agg(F.count("*").alias("f"))
    )
    b = w.selectExpr("word AS bw", "f AS bf")
    rk = (
        w.join(
            F.broadcast(b),
            (F.col("bf") > F.col("f"))
            | ((F.col("bf") == F.col("f")) & (F.col("bw") < F.col("word"))),
            "left",
        )
        .groupBy("word", "f").agg((F.count("bw") + 1).alias("rnk"))
    )
    t = w.agg(F.sum("f").alias("tot"))
    ks = spark.createDataFrame([(5,), (10,), (20,), (31,)], "k INT")
    return (
        F.broadcast(ks).crossJoin(rk).crossJoin(F.broadcast(t))
        .groupBy(F.col("k").alias("vocab_k"), "tot")
        .agg(
            F.sum(F.when(F.col("rnk") <= F.col("k"), F.col("f"))
                  .otherwise(0)).cast("long").alias("covered"),
        )
        .select(
            F.col("vocab_k").cast("long").alias("vocab_k"),
            F.col("tot").cast("long").alias("n_tokens"),
            "covered",
            (F.col("tot") - F.col("covered")).cast("long")
            .alias("oov_tokens"),
        )
    )


# --- language geography per tile (q340) ---------------------------------------


@query(
    "q340_language_geography",
    f"""WITH pts AS ({POINTS_SQL}),
       g AS (SELECT p.doc_id,
                    CAST(floor((p.lon + 180)/360.0*16) AS BIGINT) AS tx,
                    CAST(floor((90 - p.lat)/180.0*16) AS BIGINT) AS ty,
                    d.lang
             FROM pts p JOIN documents d USING (doc_id)),
       c AS (SELECT tx, ty, lang, count(*) AS c FROM g
             GROUP BY tx, ty, lang),
       m AS (SELECT tx, ty, max(c) AS mc, sum(c) AS n_docs,
                    count(*) AS n_langs
             FROM c GROUP BY tx, ty),
       top AS (SELECT c.tx, c.ty, min(c.lang) AS dominant_lang
               FROM c JOIN m ON m.tx = c.tx AND m.ty = c.ty
                            AND c.c = m.mc
               GROUP BY c.tx, c.ty)
       SELECT m.tx, m.ty,
              CAST(m.n_docs AS BIGINT) AS n_docs,
              CAST(m.n_langs AS BIGINT) AS n_langs,
              top.dominant_lang,
              CAST(m.mc AS BIGINT) AS dominant_cnt
       FROM m JOIN top ON top.tx = m.tx AND top.ty = m.ty""",
)
def q340(spark, sf_dir):
    """Language geography — the geospatial x webtext fusion tile map
    (which language dominates each z4 tile of the geocoded corpus):
    the doc-keyed synthetic geocode (the q16 fixture) joins the
    documents' lang column, tiles by the exact floor expression both
    engines share, and the dominant language per tile is the
    max-count/lex-min two-phase argmax.  This is the per-tile rollup
    a multilingual crawl uses to steer regional fetch capacity; one
    (tile, lang) groupBy + one tile rollup, the q14 density shape
    with an argmax on top."""
    pts = _points(spark, sf_dir)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    g = pts.join(docs, "doc_id").select(
        F.floor((F.col("lon") + 180) / 360.0 * 16).cast("long").alias("tx"),
        F.floor((90 - F.col("lat")) / 180.0 * 16).cast("long").alias("ty"),
        "lang",
    )
    c = g.groupBy("tx", "ty", "lang").agg(F.count("*").alias("c"))
    m = c.groupBy("tx", "ty").agg(
        F.max("c").alias("mc"), F.sum("c").alias("n_docs"),
        F.count("*").alias("n_langs"),
    )
    top = (
        c.join(m, ["tx", "ty"]).filter(F.col("c") == F.col("mc"))
        .groupBy("tx", "ty").agg(F.min("lang").alias("dominant_lang"))
    )
    return m.join(top, ["tx", "ty"]).select(
        "tx", "ty",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_langs").cast("long").alias("n_langs"),
        "dominant_lang",
        F.col("mc").cast("long").alias("dominant_cnt"),
    )


# --- host geographic concentration (q341) -------------------------------------


@query(
    "q341_host_geo_concentration",
    f"""WITH pts AS ({POINTS_SQL}),
       g AS (SELECT doc_id % 40 AS host,
                    CAST(floor((lon + 180)/360.0*16) AS BIGINT) AS tx,
                    CAST(floor((90 - lat)/180.0*16) AS BIGINT) AS ty
             FROM pts),
       c AS (SELECT host, tx, ty, count(*) AS c FROM g
             GROUP BY host, tx, ty)
       SELECT host,
              CAST(sum(c) AS BIGINT) AS n_docs,
              CAST(count(*) AS BIGINT) AS n_tiles,
              CAST(max(c) AS BIGINT) AS max_tile_cnt,
              CAST(CASE WHEN 4 * max(c) >= sum(c) THEN 1 ELSE 0 END
                AS BIGINT) AS is_concentrated
       FROM c GROUP BY host""",
)
def q341(spark, sf_dir):
    """Host geographic concentration — is a host's content clustered
    in one region (a local newspaper) or spread worldwide (a CDN
    mirror)?  Per host: distinct z4 tiles touched, the hottest tile's
    share, and a concentration flag when one tile holds >= 25% of the
    docs (4*max >= total, exact).  The geo-affinity feature feeds
    crawl scheduling (fetch local-heavy hosts from nearby DCs) — one
    (host, tile) groupBy + one host rollup on the shared geocode
    fixture."""
    pts = _points(spark, sf_dir)
    g = pts.select(
        (F.col("doc_id") % 40).alias("host"),
        F.floor((F.col("lon") + 180) / 360.0 * 16).cast("long").alias("tx"),
        F.floor((90 - F.col("lat")) / 180.0 * 16).cast("long").alias("ty"),
    )
    c = g.groupBy("host", "tx", "ty").agg(F.count("*").alias("c"))
    return c.groupBy("host").agg(
        F.sum("c").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_tiles"),
        F.max("c").cast("long").alias("max_tile_cnt"),
        F.when(4 * F.max("c") >= F.sum("c"), 1).otherwise(0).cast("long")
        .alias("is_concentrated"),
    )


# --- geofenced compliance screen (q342) ---------------------------------------


@query(
    "q342_geofence_compliance",
    f"""WITH pts AS ({POINTS_SQL}),
       g AS (SELECT p.doc_id, d.lang,
                    CASE WHEN p.lon >= -30 AND p.lon < 60
                          AND p.lat >= 0 AND p.lat < 60
                         THEN 1 ELSE 0 END AS in_region
             FROM pts p JOIN documents d USING (doc_id))
       SELECT lang,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(in_region) AS BIGINT) AS n_in_region,
              CAST(sum(CASE WHEN in_region = 1 AND lang <> 'en'
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_needs_review
       FROM g GROUP BY lang""",
)
def q342(spark, sf_dir):
    """Geofenced compliance screen — the regional-policy pass a
    multinational corpus runs (content geolocated inside a regulated
    region in a non-default language gets routed to review): point-in-
    rect containment over the doc-keyed geocode (exact double
    comparisons against integer fence bounds — identical on both
    engines), fused with the language attribute in one pass, rolled
    up per language.  The fence here is a rect; the general-polygon
    path is the q11 two-phase spatial join with the same downstream
    rollup."""
    pts = _points(spark, sf_dir)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    g = pts.join(docs, "doc_id").select(
        "lang",
        F.when(
            (F.col("lon") >= -30) & (F.col("lon") < 60)
            & (F.col("lat") >= 0) & (F.col("lat") < 60),
            1,
        ).otherwise(0).alias("in_region"),
    )
    return g.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("in_region").cast("long").alias("n_in_region"),
        F.sum(
            F.when((F.col("in_region") == 1) & (F.col("lang") != "en"), 1)
            .otherwise(0)
        ).cast("long").alias("n_needs_review"),
    )


# --- sparse TF-IDF nearest document (q343) ------------------------------------


@query(
    "q343_sparse_tfidf_neighbor",
    """WITH w AS (SELECT doc_id, word, count(*) AS tf FROM
                    (SELECT doc_id,
                       unnest(string_split(text || ' tag'
                         || CAST(doc_id % 150 AS VARCHAR), ' ')) AS word
                     FROM documents)
                  GROUP BY doc_id, word),
       nd AS (SELECT count(DISTINCT doc_id) AS n FROM w),
       dft AS (SELECT word, count(*) AS df FROM w GROUP BY word),
       wt AS (SELECT w.doc_id, w.word,
                     w.tf * ((length(bin(nd.n)) - 1)
                             - (length(bin(dft.df)) - 1) + 1) AS wgt
              FROM w JOIN dft USING (word) CROSS JOIN nd
              WHERE dft.df <= 60),
       pr AS (SELECT a.doc_id AS a, b.doc_id AS b,
                     sum(a.wgt * b.wgt) AS dot
              FROM wt a JOIN wt b
                ON a.word = b.word AND a.doc_id <> b.doc_id
              GROUP BY a.doc_id, b.doc_id),
       m AS (SELECT a, max(dot) AS md FROM pr GROUP BY a),
       top AS (SELECT pr.a, min(pr.b) AS nn
               FROM pr JOIN m ON m.a = pr.a AND pr.dot = m.md
               GROUP BY pr.a)
       SELECT m.a AS doc_id, top.nn AS neighbor,
              CAST(m.md AS BIGINT) AS dot_scaled
       FROM m JOIN top ON top.a = m.a""",
)
def q343(spark, sf_dir):
    """Sparse TF-IDF nearest document — the lexical (BM25-family)
    complement to the dense-embedding kNN: per-term weights
    tf * (idf_bits + 1) in exact integers, candidate pairs ONLY from
    the shared-term join behind an ABSOLUTE df cap (df <= 60 — the
    q19/q283 lesson verbatim: a PROPORTIONAL cap admitted the whole
    31-word vocabulary at sf0.1 and the term self-join went quadratic,
    373 s in the bench; the absolute cap restores sum(df^2)-bounded
    candidates at every SF), top-1 by (dot desc, id asc).  A ' tagN'
    rare term (N = doc_id%150) gives every doc a sub-cap
    discriminative term so neighbors exist at every SF.  At 10^12
    docs this is the impact-ordered sparse ANN shape: the term join
    carries the shuffle, weights broadcast."""
    docs = _t(spark, sf_dir, "documents")
    w = (
        docs.select(
            "doc_id",
            F.explode(F.split(
                F.concat(F.col("text"), F.lit(" tag"),
                         (F.col("doc_id") % 150).cast("string")),
                " ")).alias("word"),
        )
        .groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    )
    nd = w.agg(F.countDistinct("doc_id").alias("n"))
    dft = w.groupBy("word").agg(F.count("*").alias("df"))
    wt = (
        w.join(F.broadcast(dft), "word")
        .crossJoin(F.broadcast(nd))
        .filter(F.col("df") <= 60)
        .select(
            "doc_id", "word",
            (
                F.col("tf")
                * ((F.length(F.bin("n")) - 1)
                   - (F.length(F.bin("df")) - 1) + 1)
            ).alias("wgt"),
        )
    )
    b = wt.selectExpr("doc_id AS bd", "word", "wgt AS bw")
    pr = (
        wt.join(b, "word")
        .filter(F.col("doc_id") != F.col("bd"))
        .groupBy(F.col("doc_id").alias("a"), F.col("bd").alias("b"))
        .agg(F.sum(F.col("wgt") * F.col("bw")).alias("dot"))
    )
    m = pr.groupBy("a").agg(F.max("dot").alias("md"))
    top = (
        pr.join(m, "a").filter(F.col("dot") == F.col("md"))
        .groupBy("a").agg(F.min("b").alias("nn"))
    )
    return m.join(top, "a").select(
        F.col("a").alias("doc_id"),
        F.col("nn").alias("neighbor"),
        F.col("md").cast("long").alias("dot_scaled"),
    )


# --- incremental index maintenance cost (q344) --------------------------------


@query(
    "q344_index_maintenance_cost",
    """WITH ch AS (SELECT doc_id FROM documents
                   WHERE doc_id % 7 = 0
                     AND doc_id % 10 < 9 AND doc_id % 10 > 0),
       p AS (SELECT DISTINCT word, doc_id FROM
               (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                FROM documents)),
       touched AS (SELECT p.word, count(*) AS n_changed_postings
                   FROM p JOIN ch USING (doc_id)
                   GROUP BY p.word),
       tot AS (SELECT word, count(*) AS df FROM p GROUP BY word)
       SELECT tot.word,
              CAST(tot.df AS BIGINT) AS df,
              CAST(coalesce(touched.n_changed_postings, 0) AS BIGINT)
                AS n_invalidate,
              CAST(2 * coalesce(touched.n_changed_postings, 0) AS BIGINT)
                AS n_ops
       FROM tot LEFT JOIN touched USING (word)""",
)
def q344(spark, sf_dir):
    """Incremental index maintenance cost — given the q329 snapshot
    diff's CHANGED set (docs present in both crawl cycles whose
    content hash moved), how many postings does each term's list
    invalidate and rewrite (delete + reinsert = 2 ops per changed
    posting): the capacity model for choosing delete-merge vs
    rewrite-segment index update strategies.  One semi-join of the
    postings table against the (small) changed set + a broadcast df
    join — maintenance cost is proportional to the CHANGED postings,
    never the index size, which is the entire point of incremental
    maintenance."""
    docs = _t(spark, sf_dir, "documents")
    ch = docs.filter(
        (F.col("doc_id") % 7 == 0)
        & (F.col("doc_id") % 10 < 9) & (F.col("doc_id") % 10 > 0)
    ).select("doc_id")
    p = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .distinct()
    )
    touched = (
        p.join(F.broadcast(ch), "doc_id")
        .groupBy("word").agg(F.count("*").alias("n_changed_postings"))
    )
    tot = p.groupBy("word").agg(F.count("*").alias("df"))
    return tot.join(touched, "word", "left").select(
        "word",
        F.col("df").cast("long").alias("df"),
        F.coalesce("n_changed_postings", F.lit(0)).cast("long")
        .alias("n_invalidate"),
        (2 * F.coalesce("n_changed_postings", F.lit(0))).cast("long")
        .alias("n_ops"),
    )


# --- query-term proximity scoring (q345) --------------------------------------


@query(
    "q345_term_proximity",
    """WITH s AS (SELECT doc_id, string_split(text, ' ') AS w
                  FROM documents),
       chk AS (SELECT CASE WHEN max(len(w)) > 199
                      THEN error('q345 oracle range bound exceeded')
                      ELSE 1 END AS ok FROM s),
       pos AS (SELECT doc_id, w[r.range] AS word, r.range AS p
               FROM s, range(1, 200) r WHERE r.range <= len(w)),
       q AS (SELECT 0 AS qid, 'join' AS t1, 'filter' AS t2
             UNION ALL SELECT 1, 'hash', 'sort'
             UNION ALL SELECT 2, 'scan', 'merge'),
       hits AS (SELECT q.qid, p1.doc_id,
                       min(abs(p1.p - p2.p)) AS min_span
                FROM q JOIN pos p1 ON p1.word = q.t1
                       JOIN pos p2 ON p2.word = q.t2
                              AND p2.doc_id = p1.doc_id
                GROUP BY q.qid, p1.doc_id),
       best AS (SELECT qid, min(min_span) AS best_span,
                       count(*) AS n_docs_with_both
                FROM hits GROUP BY qid),
       winner AS (SELECT h.qid, min(h.doc_id) AS best_doc
                  FROM hits h JOIN best b
                    ON b.qid = h.qid AND h.min_span = b.best_span
                  GROUP BY h.qid)
       SELECT b.qid,
              CAST(b.n_docs_with_both AS BIGINT) AS n_docs_with_both,
              CAST(b.best_span AS BIGINT) AS best_span,
              CAST(w.best_doc AS BIGINT) AS best_doc
       FROM best b JOIN winner w ON w.qid = b.qid, chk""",
)
def q345(spark, sf_dir):
    """Query-term proximity scoring — the positional-index ranking
    feature (documents where both terms appear CLOSE outrank mere
    co-occurrence): for each 2-term query, the per-doc minimum
    position span |p1 - p2| over all occurrence pairs, then the
    best-proximity doc per query (min span, ties to lowest doc).
    The occurrence-pair join is doc-keyed and bounded by per-doc
    term counts (the postings already intersected, the q287 shape
    with positions attached) — exactly how a positional index scores
    phrase-nearness at serving time."""
    docs = _t(spark, sf_dir, "documents")
    s = docs.select("doc_id", F.split("text", " ").alias("w"))
    pos = s.select(
        "doc_id", F.posexplode("w").alias("p0", "word")
    ).select("doc_id", "word", (F.col("p0") + 1).alias("p"))
    q = spark.createDataFrame(
        [(0, "join", "filter"), (1, "hash", "sort"), (2, "scan", "merge")],
        "qid INT, t1 STRING, t2 STRING",
    )
    p1 = pos.selectExpr("doc_id", "word AS t1", "p AS pa")
    p2 = pos.selectExpr("doc_id", "word AS t2", "p AS pb")
    hits = (
        F.broadcast(q).join(p1, "t1")
        .join(p2, ["t2", "doc_id"])
        .groupBy("qid", "doc_id")
        .agg(F.min(F.abs(F.col("pa") - F.col("pb"))).alias("min_span"))
    )
    best = hits.groupBy("qid").agg(
        F.min("min_span").alias("best_span"),
        F.count("*").alias("n_docs_with_both"),
    )
    winner = (
        hits.join(best, "qid")
        .filter(F.col("min_span") == F.col("best_span"))
        .groupBy("qid").agg(F.min("doc_id").alias("best_doc"))
    )
    return best.join(winner, "qid").select(
        "qid",
        F.col("n_docs_with_both").cast("long").alias("n_docs_with_both"),
        F.col("best_span").cast("long").alias("best_span"),
        F.col("best_doc").cast("long").alias("best_doc"),
    )


# --- dictionary topic tagging (q346) ------------------------------------------


@query(
    "q346_topic_tagging",
    """WITH lex AS (SELECT * FROM (VALUES
                 ('db', 'join'), ('db', 'hash'), ('db', 'scan'),
                 ('db', 'merge'),
                 ('perf', 'fast'), ('perf', 'slow'), ('perf', 'batch'),
                 ('perf', 'window'),
                 ('data', 'table'), ('data', 'row'), ('data', 'value'),
                 ('data', 'customer')) t(topic, word)),
       w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
             FROM documents),
       sc AS (SELECT w.doc_id, lex.topic, count(*) AS score
              FROM w JOIN lex USING (word)
              GROUP BY w.doc_id, lex.topic),
       m AS (SELECT doc_id, max(score) AS ms, sum(score) AS total
             FROM sc GROUP BY doc_id),
       top AS (SELECT sc.doc_id, min(sc.topic) AS topic
               FROM sc JOIN m ON m.doc_id = sc.doc_id AND sc.score = m.ms
               GROUP BY sc.doc_id)
       SELECT m.doc_id, top.topic,
              CAST(m.ms AS BIGINT) AS topic_score,
              CAST(m.total AS BIGINT) AS lex_hits
       FROM m JOIN top ON top.doc_id = m.doc_id""",
)
def q346(spark, sf_dir):
    """Dictionary topic tagging — the lexicon-based classifier
    (Aho-Corasick-lite over a token join) that labels every document
    with its dominant topic: a 3-topic x 4-word lexicon broadcasts
    against the token stream, per-(doc, topic) hit counts roll up,
    and the tag is the max-score/lex-min topic.  The lexicon join is
    the whole trick — at 10^12 tokens the lexicon side is bytes and
    the tagging runs at scan speed; this is how rule-based routing
    (safety lexicons, domain routers) runs before any model."""
    lex = spark.createDataFrame(
        [("db", "join"), ("db", "hash"), ("db", "scan"), ("db", "merge"),
         ("perf", "fast"), ("perf", "slow"), ("perf", "batch"),
         ("perf", "window"),
         ("data", "table"), ("data", "row"), ("data", "value"),
         ("data", "customer")],
        "topic STRING, word STRING",
    )
    docs = _t(spark, sf_dir, "documents")
    w = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    sc = (
        w.join(F.broadcast(lex), "word")
        .groupBy("doc_id", "topic").agg(F.count("*").alias("score"))
    )
    m = sc.groupBy("doc_id").agg(
        F.max("score").alias("ms"), F.sum("score").alias("total"))
    top = (
        sc.join(m, "doc_id").filter(F.col("score") == F.col("ms"))
        .groupBy("doc_id").agg(F.min("topic").alias("topic"))
    )
    return m.join(top, "doc_id").select(
        "doc_id", "topic",
        F.col("ms").cast("long").alias("topic_score"),
        F.col("total").cast("long").alias("lex_hits"),
    )


# --- A/B conversion with Wilson bounds (q347) ---------------------------------


@query(
    "q347_ab_wilson_bounds",
    """WITH u AS (SELECT user_id, user_id % 2 AS arm,
                    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                        END) AS converted
                  FROM events GROUP BY user_id),
       a AS (SELECT arm, count(*) AS n, sum(converted) AS x FROM u
             GROUP BY arm)
       SELECT arm,
              CAST(n AS BIGINT) AS n_users,
              CAST(x AS BIGINT) AS n_converted,
              (CAST(x AS DOUBLE) / CAST(n AS DOUBLE)
               + 1.9208 / CAST(n AS DOUBLE)
               - 1.96 * sqrt((CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
                 * (1.0 - CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
                 / CAST(n AS DOUBLE)
                 + 0.9604 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
               / (1.0 + 3.8416 / CAST(n AS DOUBLE)) AS wilson_lower
       FROM a""",
)
def q347(spark, sf_dir):
    """A/B conversion accounting with the Wilson lower bound — the
    experiment readout (is arm B's conversion genuinely above arm
    A's floor): users split by parity, conversion = any purchase
    (max-flag per user, combinable), and the 95% Wilson score lower
    bound computed as ONE fixed float expression over the exact
    integer (n, x) pair — z constants (1.96, z^2=3.8416, z^2/2=
    1.9208, z^4/4=0.9604) inlined verbatim on both engines so the
    IEEE tree is identical (the CLAUDE.md inline-constants rule).
    Two user-keyed aggregations; the bound math is per-arm O(1)."""
    e = _t(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    ).select(
        (F.col("user_id") % 2).alias("arm"), "converted")
    a = u.groupBy("arm").agg(
        F.count("*").alias("n"), F.sum("converted").alias("x"))
    p = F.col("x").cast("double") / F.col("n").cast("double")
    nn = F.col("n").cast("double")
    return a.select(
        "arm",
        F.col("n").cast("long").alias("n_users"),
        F.col("x").cast("long").alias("n_converted"),
        (
            (p + F.lit(1.9208) / nn
             - F.lit(1.96) * F.sqrt(p * (F.lit(1.0) - p) / nn
                                    + F.lit(0.9604) / (nn * nn)))
            / (F.lit(1.0) + F.lit(3.8416) / nn)
        ).alias("wilson_lower"),
    )


# --- corpus datasheet (q348) --------------------------------------------------


@query(
    "q348_corpus_datasheet",
    """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                  FROM documents),
       d AS (SELECT count(*) AS n_docs,
                    sum(n_chars) AS total_chars,
                    count(DISTINCT lang) AS n_langs,
                    count(DISTINCT source) AS n_sources,
                    count(DISTINCT md5(text)) AS n_unique_texts
             FROM documents),
       t AS (SELECT count(*) AS n_tokens,
                    count(DISTINCT word) AS vocab FROM w)
       SELECT CAST(d.n_docs AS BIGINT) AS n_docs,
              CAST(t.n_tokens AS BIGINT) AS n_tokens,
              CAST(t.vocab AS BIGINT) AS vocab_size,
              CAST(d.total_chars AS BIGINT) AS total_chars,
              CAST(d.n_langs AS BIGINT) AS n_langs,
              CAST(d.n_sources AS BIGINT) AS n_sources,
              CAST(d.n_docs - d.n_unique_texts AS BIGINT) AS n_exact_dups
       FROM d, t""",
)
def q348(spark, sf_dir):
    """Corpus datasheet — the one-row dataset card (Datasheets for
    Datasets) every corpus release ships: document/token/vocabulary/
    byte counts, language and source diversity, and the exact-dup
    count — seven numbers from TWO scans (one over documents, one
    over the token explode), every aggregate map-side combinable.
    This is the summary the q300 per-host scorecard rolls up to at
    release granularity."""
    docs = _t(spark, sf_dir, "documents")
    w = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    d = docs.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct(F.md5("text")).alias("n_unique_texts"),
    )
    t = w.agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("word").alias("vocab"),
    )
    return d.crossJoin(F.broadcast(t)).select(
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("vocab").cast("long").alias("vocab_size"),
        F.col("total_chars").cast("long").alias("total_chars"),
        F.col("n_langs").cast("long").alias("n_langs"),
        F.col("n_sources").cast("long").alias("n_sources"),
        (F.col("n_docs") - F.col("n_unique_texts")).cast("long")
        .alias("n_exact_dups"),
    )


# --- crawl yield accounting (q349) --------------------------------------------


@query(
    "q349_crawl_yield",
    """WITH d AS (SELECT doc_id % 20 AS host, n_chars,
                    CASE WHEN n_chars >= 200 AND lang = 'en'
                         THEN 1 ELSE 0 END AS kept
                  FROM documents)
       SELECT host,
              CAST(count(*) AS BIGINT) AS n_fetched,
              CAST(sum(n_chars) AS BIGINT) AS bytes_fetched,
              CAST(sum(kept) AS BIGINT) AS n_kept,
              CAST(sum(CASE WHEN kept = 1 THEN n_chars ELSE 0 END)
                AS BIGINT) AS bytes_kept,
              CAST(sum(CASE WHEN kept = 1 THEN n_chars ELSE 0 END)
                   AS DOUBLE) / CAST(sum(n_chars) AS DOUBLE)
                AS byte_yield
       FROM d GROUP BY host""",
)
def q349(spark, sf_dir):
    """Crawl yield accounting — the economics metric behind crawl
    budget decisions (fetch bytes are paid; kept bytes earn): per
    host, fetched/kept doc and byte counts under a simple keep gate
    (n_chars >= 200 AND lang = 'en' — the production gate is the
    q232 Gopher composite; the rollup shape is identical) and the
    byte yield as one exact-integer division.  Hosts with low yield
    get their frontier quota cut — this feeds q350's budget
    apportionment.  One host-keyed combinable rollup."""
    docs = _t(spark, sf_dir, "documents")
    d = docs.select(
        (F.col("doc_id") % 20).alias("host"), "n_chars",
        F.when((F.col("n_chars") >= 200) & (F.col("lang") == "en"), 1)
        .otherwise(0).alias("kept"),
    )
    return d.groupBy("host").agg(
        F.count("*").cast("long").alias("n_fetched"),
        F.sum("n_chars").cast("long").alias("bytes_fetched"),
        F.sum("kept").cast("long").alias("n_kept"),
        F.sum(F.when(F.col("kept") == 1, F.col("n_chars")).otherwise(0))
        .cast("long").alias("bytes_kept"),
        (
            F.sum(F.when(F.col("kept") == 1, F.col("n_chars")).otherwise(0))
            .cast("double") / F.sum("n_chars").cast("double")
        ).alias("byte_yield"),
    )


# --- recrawl budget apportionment (q350) --------------------------------------


@query(
    "q350_recrawl_budget",
    """WITH ch AS (SELECT doc_id,
                     (SELECT sum(CASE WHEN (t.range * (1 + doc_id % 4)) // 5
                                       <> ((t.range - 1) * (1 + doc_id % 4)) // 5
                                 THEN 1 ELSE 0 END)
                      FROM range(1, 10) t) AS n_changes
                   FROM documents),
       cls AS (SELECT doc_id,
                      CASE WHEN n_changes * 2 >= 9 THEN 4
                           WHEN n_changes >= 2 THEN 2
                           ELSE 1 END AS w
               FROM ch),
       tot AS (SELECT sum(w) AS tw FROM cls),
       q AS (SELECT cls.doc_id, cls.w,
                    (cls.w * 1000) // tot.tw AS base,
                    (cls.w * 1000) % tot.tw AS rem
             FROM cls CROSS JOIN tot),
       k AS (SELECT CAST(1000 - sum(base) AS BIGINT) AS n_extra FROM q),
       rk AS (SELECT a.doc_id,
                     (SELECT count(*) FROM q b
                      WHERE b.rem > a.rem
                         OR (b.rem = a.rem AND b.doc_id < a.doc_id)) + 1
                       AS rnk
              FROM q a),
       fin AS (SELECT q.doc_id, q.w, q.base,
                      CASE WHEN rk.rnk <= k.n_extra THEN 1 ELSE 0 END
                        AS extra
               FROM q JOIN rk USING (doc_id) CROSS JOIN k)
       SELECT CAST(w AS BIGINT) AS revisit_weight,
              CAST(count(*) AS BIGINT) AS n_urls,
              CAST(sum(base + extra) AS BIGINT) AS slots
       FROM fin GROUP BY w""",
)
def q350(spark, sf_dir):
    """Recrawl budget apportionment — the q299 change-rate classes
    (hot=4 / warm=2 / cold=1 weights) share 1000 fetch slots by the
    LARGEST-REMAINDER method (the q274 Hamilton machinery applied to
    the crawl stack): integer base quotas floor(w*K/total) sum to at
    most K by construction, the remaining slots go to the largest
    remainders with deterministic (remainder desc, doc asc) ties via
    the count-of-greater rank — total slots are EXACTLY K, rolled up
    per class.  This closes the loop q299 -> q349 -> budget: exact
    integer arithmetic end to end, one broadcast total + one
    bounded rank join."""
    docs = _t(spark, sf_dir, "documents")
    f = docs.select(
        "doc_id", F.explode(F.sequence(F.lit(1), F.lit(9))).alias("t")
    ).select(
        "doc_id",
        (F.expr("(t * (1 + doc_id % 4)) div 5")
         != F.expr("((t - 1) * (1 + doc_id % 4)) div 5")).cast("int")
        .alias("chg"),
    )
    ch = f.groupBy("doc_id").agg(F.sum("chg").alias("n_changes"))
    cls = ch.select(
        "doc_id",
        F.when(F.col("n_changes") * 2 >= 9, 4)
        .when(F.col("n_changes") >= 2, 2).otherwise(1).alias("w"),
    )
    tot = cls.agg(F.sum("w").alias("tw"))
    q = cls.crossJoin(F.broadcast(tot)).select(
        "doc_id", "w",
        F.expr("(w * 1000) div tw").alias("base"),
        ((F.col("w") * 1000) % F.col("tw")).alias("rem"),
    )
    k = q.agg((1000 - F.sum("base")).alias("n_extra"))
    b = q.selectExpr("doc_id AS bd", "rem AS brem")
    rk = (
        q.join(
            F.broadcast(b),
            (F.col("brem") > F.col("rem"))
            | ((F.col("brem") == F.col("rem"))
               & (F.col("bd") < F.col("doc_id"))),
            "left",
        )
        .groupBy("doc_id", "w", "base", "rem")
        .agg((F.count("bd") + 1).alias("rnk"))
    )
    fin = rk.crossJoin(F.broadcast(k)).select(
        "w", "base",
        F.when(F.col("rnk") <= F.col("n_extra"), 1).otherwise(0)
        .alias("extra"),
    )
    return fin.groupBy(F.col("w").alias("revisit_weight")).agg(
        F.count("*").cast("long").alias("n_urls"),
        F.sum(F.col("base") + F.col("extra")).cast("long").alias("slots"),
    )


# --- image aHash Hamming<=2 near-dup via banding (q351) -----------------------

_Q351_HASH_SQL = """d AS (SELECT doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id % 50 AS STRING)), 1, 8)) AS BIGINT) AS h8
        FROM documents),
       dims AS (SELECT doc_id, h8, 16 + h8 % 64 AS w, 16 + (h8 // 64) % 64 AS h FROM d),
       px AS (SELECT doc_id, y.range * 8 + x.range AS k,
               (h8 + 31*(((2*y.range + 1) * h) // 16)
                   + 17*(((2*x.range + 1) * w) // 16)) % 251 AS p
              FROM dims CROSS JOIN range(8) y CROSS JOIN range(8) x),
       s AS (SELECT doc_id, CAST(sum(p) AS BIGINT) AS tot FROM px GROUP BY doc_id),
       b AS (SELECT px.doc_id, k, CASE WHEN 64 * p > tot THEN 1 ELSE 0 END AS bit
             FROM px JOIN s ON s.doc_id = px.doc_id),
       hsh0 AS (SELECT doc_id,
               CAST(SUM(CASE WHEN k >= 32 AND bit = 1
                    THEN CAST(power(2, k - 32) AS BIGINT) ELSE 0 END) AS BIGINT) AS hash_hi,
               CAST(SUM(CASE WHEN k < 32 AND bit = 1
                    THEN CAST(power(2, k) AS BIGINT) ELSE 0 END) AS BIGINT) AS hash_lo
               FROM b GROUP BY doc_id),
       hsh AS (SELECT doc_id,
                      CASE WHEN (doc_id // 50) % 2 = 1 AND doc_id % 63 >= 32
                           THEN xor(hash_hi,
                                CAST(1 AS BIGINT) << CAST(doc_id % 63 - 32 AS INT))
                           ELSE hash_hi END AS hash_hi,
                      CASE WHEN (doc_id // 50) % 2 = 1 AND doc_id % 63 < 32
                           THEN xor(hash_lo,
                                CAST(1 AS BIGINT) << CAST(doc_id % 63 AS INT))
                           ELSE hash_lo END AS hash_lo
               FROM hsh0)"""


@query(
    "q351_image_hamming_neardup",
    f"""WITH {_Q351_HASH_SQL},
       bands AS (SELECT doc_id, 0 AS band, hash_hi AS v FROM hsh
                 UNION ALL
                 SELECT doc_id, 1, hash_lo // 65536 FROM hsh
                 UNION ALL
                 SELECT doc_id, 2, hash_lo % 65536 FROM hsh),
       cand AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
                FROM bands a JOIN bands b
                  ON a.band = b.band AND a.v = b.v
                 AND a.doc_id < b.doc_id),
       ver AS (SELECT c.a, c.b,
                      bit_count(xor(ha.hash_hi, hb.hash_hi))
                      + bit_count(xor(ha.hash_lo, hb.hash_lo)) AS hamming
               FROM cand c JOIN hsh ha ON ha.doc_id = c.a
                           JOIN hsh hb ON hb.doc_id = c.b)
       SELECT a, b, CAST(hamming AS BIGINT) AS hamming
       FROM ver WHERE hamming <= 2""",
)
def q351(spark, sf_dir):
    """Image near-dup at Hamming <= 2 over the q145 perceptual aHash
    — the TOLERANT tier of image dedup (re-encoded or lightly cropped
    copies flip a bit or two; exact hash equality misses them):
    3-band pigeonhole (32/16/16 bit slices — any pair within 2 flips
    shares >= 1 intact band) generates candidates by band equi-join,
    then the exact Hamming distance verifies via bit_count(xor) on
    both 32-bit halves — identical integer semantics in Spark and
    DuckDB.  A deterministic 1-bit perturbation on alternate class
    repetitions ((doc_id div 50) % 2 — it must VARY within each
    50-doc class; a doc_id%5 selector is constant per class, the
    q323 fixture trap again) creates true Hamming-1 and Hamming-2
    pairs inside every class at every SF.  Candidate volume is band-bucket
    bounded (the q20/q101 SimHash contract applied to the image
    tier), never all-pairs."""
    from gdal_spark.operators.multimodal import image_ahash

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % 50).cast("string").cast("binary")
        .alias("content"),
    )
    h0 = image_ahash(docs)
    hsh = h0.select(
        "doc_id",
        F.when(
            (F.expr("doc_id div 50") % 2 == 1)
            & (F.col("doc_id") % 63 >= 32),
            F.expr("hash_hi ^ shiftleft(CAST(1 AS BIGINT), "
                   "CAST(doc_id % 63 - 32 AS INT))"),
        ).otherwise(F.col("hash_hi")).alias("hash_hi"),
        F.when(
            (F.expr("doc_id div 50") % 2 == 1)
            & (F.col("doc_id") % 63 < 32),
            F.expr("hash_lo ^ shiftleft(CAST(1 AS BIGINT), "
                   "CAST(doc_id % 63 AS INT))"),
        ).otherwise(F.col("hash_lo")).alias("hash_lo"),
    ).localCheckpoint(eager=True)
    bands = (
        hsh.selectExpr("doc_id", "0 AS band", "hash_hi AS v")
        .unionAll(hsh.selectExpr("doc_id", "1 AS band",
                                 "hash_lo div 65536 AS v"))
        .unionAll(hsh.selectExpr("doc_id", "2 AS band",
                                 "hash_lo % 65536 AS v"))
    )
    b2 = bands.selectExpr("doc_id AS b", "band", "v")
    cand = (
        bands.join(b2, ["band", "v"])
        .filter(F.col("doc_id") < F.col("b"))
        .select(F.col("doc_id").alias("a"), "b")
        .distinct()
    )
    ha = hsh.selectExpr("doc_id AS a", "hash_hi AS ahi", "hash_lo AS alo")
    hb = hsh.selectExpr("doc_id AS b", "hash_hi AS bhi", "hash_lo AS blo")
    ver = (
        cand.join(ha, "a").join(hb, "b")
        .select(
            "a", "b",
            (
                F.bit_count(F.expr("ahi ^ bhi"))
                + F.bit_count(F.expr("alo ^ blo"))
            ).alias("hamming"),
        )
    )
    return ver.filter(F.col("hamming") <= 2).select(
        "a", "b", F.col("hamming").cast("long").alias("hamming"))


# --- storage tiering plan (q352) ----------------------------------------------


@query(
    "q352_storage_tiering",
    """WITH ev AS (SELECT CAST(regexp_extract(props, '([0-9]+)', 1)
                            AS BIGINT) AS item,
                     CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d
                   FROM events),
       sp AS (SELECT max(d) AS dmax FROM ev),
       a AS (SELECT item, count(*) AS n_acc, max(d) AS last_d
             FROM ev GROUP BY item)
       SELECT a.item,
              CAST(a.n_acc AS BIGINT) AS n_accesses,
              CAST(sp.dmax - a.last_d AS BIGINT) AS days_idle,
              CASE WHEN sp.dmax - a.last_d <= 2 AND a.n_acc >= 50
                   THEN 'hot'
                   WHEN sp.dmax - a.last_d <= 7 THEN 'warm'
                   ELSE 'cold' END AS tier
       FROM a CROSS JOIN sp""",
)
def q352(spark, sf_dir):
    """Storage tiering plan — the hot/warm/cold placement every
    serving cache and object store runs nightly: per item, access
    count and idle days (vs the observed max day), tier decided by
    exact integer recency/frequency thresholds (hot: touched within
    2 days AND >= 50 accesses; warm: within a week; cold otherwise).
    One item-keyed rollup + a broadcast 1-row span — placement for
    10^12 objects is a single combinable aggregation, and the tier
    column drives the actual data movement job."""
    ev = _t(spark, sf_dir, "events").select(
        F.regexp_extract("props", "([0-9]+)", 1).cast("long").alias("item"),
        F.expr("CAST(unix_timestamp(ts) div 86400 AS BIGINT)").alias("d"),
    )
    sp = ev.agg(F.max("d").alias("dmax"))
    a = ev.groupBy("item").agg(
        F.count("*").alias("n_acc"), F.max("d").alias("last_d"))
    return a.crossJoin(F.broadcast(sp)).select(
        "item",
        F.col("n_acc").cast("long").alias("n_accesses"),
        (F.col("dmax") - F.col("last_d")).cast("long").alias("days_idle"),
        F.when(
            ((F.col("dmax") - F.col("last_d")) <= 2)
            & (F.col("n_acc") >= 50), "hot",
        ).when((F.col("dmax") - F.col("last_d")) <= 7, "warm")
        .otherwise("cold").alias("tier"),
    )


# --- Newman modularity of the host partition (q353) ---------------------------


@query(
    "q353_modularity",
    """WITH h AS (SELECT DISTINCT doc_id % 60 AS hh FROM documents),
       e0 AS (SELECT hh, unnest([1, 2, 3]) AS j FROM h),
       ed AS (SELECT DISTINCT least(hh, (hh * j + j * j * 7) % 60) AS u,
                     greatest(hh, (hh * j + j * j * 7) % 60) AS v
              FROM e0 WHERE hh <> (hh * j + j * j * 7) % 60),
       m AS (SELECT count(*) AS m FROM ed),
       deg AS (SELECT n, count(*) AS d FROM
                 (SELECT u AS n FROM ed UNION ALL SELECT v FROM ed)
               GROUP BY n),
       comm AS (SELECT deg.n, deg.d, deg.n % 4 AS c FROM deg),
       ein AS (SELECT u % 4 AS c, count(*) AS e_in FROM ed
               WHERE u % 4 = v % 4 GROUP BY u % 4),
       dsum AS (SELECT c, sum(d) AS d_c FROM comm GROUP BY c),
       cell AS (SELECT dsum.c,
                       coalesce(ein.e_in, 0) AS e_in,
                       dsum.d_c,
                       4 * m.m * coalesce(ein.e_in, 0)
                         - dsum.d_c * dsum.d_c AS q_num_c
                FROM dsum LEFT JOIN ein USING (c) CROSS JOIN m)
       SELECT c AS community,
              CAST(e_in AS BIGINT) AS e_in,
              CAST(d_c AS BIGINT) AS degree_sum,
              CAST(q_num_c AS BIGINT) AS q_num_c,
              (SELECT CAST(4 * m.m * m.m AS BIGINT) FROM m) AS q_den
       FROM cell""",
)
def q353(spark, sf_dir):
    """Newman modularity of the host%4 partition — the community-
    quality number (Q = sum_c [e_c/m - (d_c/2m)^2]) kept as EXACT
    integer rationals: per community the numerator cell
    4*m*e_c - d_c^2 over the shared denominator 4*m^2, so
    Q = sum(q_num_c)/q_den with no float until a consumer divides.
    Communities here are the deterministic host%4 blocks (the
    partition under evaluation — in production the q94/q286
    cluster labels); e_in and degree sums are two combinable
    aggregations over the undirected edge list.  The sign of
    sum(q_num_c) alone answers 'better than random?' — exactly."""
    docs = _t(spark, sf_dir, "documents")
    h = docs.selectExpr("doc_id % 60 AS hh").distinct()
    e0 = h.select(
        "hh", F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("j")
    ).selectExpr("hh", "(hh * j + j * j * 7) % 60 AS t")
    ed = (
        e0.filter("hh <> t")
        .selectExpr("least(hh, t) AS u", "greatest(hh, t) AS v")
        .distinct()
        .localCheckpoint(eager=True)
    )
    m = ed.agg(F.count("*").alias("m"))
    deg = (
        ed.selectExpr("u AS n").unionAll(ed.selectExpr("v AS n"))
        .groupBy("n").agg(F.count("*").alias("d"))
    )
    dsum = deg.groupBy((F.col("n") % 4).alias("c")).agg(
        F.sum("d").alias("d_c"))
    ein = (
        ed.filter(F.col("u") % 4 == F.col("v") % 4)
        .groupBy((F.col("u") % 4).alias("c"))
        .agg(F.count("*").alias("e_in"))
    )
    cell = (
        dsum.join(ein, "c", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "c",
            F.coalesce("e_in", F.lit(0)).alias("e_in"),
            "d_c",
            (4 * F.col("m") * F.coalesce("e_in", F.lit(0))
             - F.col("d_c") * F.col("d_c")).alias("q_num_c"),
            (4 * F.col("m") * F.col("m")).alias("q_den"),
        )
    )
    return cell.select(
        F.col("c").alias("community"),
        F.col("e_in").cast("long").alias("e_in"),
        F.col("d_c").cast("long").alias("degree_sum"),
        F.col("q_num_c").cast("long").alias("q_num_c"),
        F.col("q_den").cast("long").alias("q_den"),
    )


# --- distance-weighted co-occurrence counts (q354) ----------------------------


@query(
    "q354_glove_cooccurrence",
    """WITH s AS (SELECT doc_id, string_split(text, ' ') AS w
                  FROM documents),
       chk AS (SELECT CASE WHEN max(len(w)) > 199
                      THEN error('q354 oracle range bound exceeded')
                      ELSE 1 END AS ok FROM s),
       co AS (SELECT w[r.range] AS x, w[r.range + o.range] AS y,
                     CASE WHEN o.range = 1 THEN 2 ELSE 1 END AS wgt
              FROM s, range(1, 200) r, range(1, 3) o
              WHERE r.range + o.range <= len(w)),
       agg AS (SELECT x, y, sum(wgt) AS cowgt, count(*) AS n_pairs
               FROM co GROUP BY x, y)
       SELECT x, y,
              CAST(cowgt AS BIGINT) AS cowgt,
              CAST(n_pairs AS BIGINT) AS n_pairs
       FROM agg, chk WHERE cowgt >= 100""",
)
def q354(spark, sf_dir):
    """Distance-weighted co-occurrence counts (the GloVe X matrix
    with the 1/d weighting made integer-exact: distance 1 scores 2,
    distance 2 scores 1 — the 2/d scheme): forward window of 2,
    position-exploded (the q240 gram-table shape — HOF per-row loops
    measured and rejected for this), one (x, y)-keyed combinable sum,
    head filtered at cowgt >= 100 to keep the output the matrix HEAD
    the embedding trainer actually densifies.  At 10^12 tokens this
    is THE co-occurrence shuffle; the window never widens the rows,
    only the explode factor (2 here)."""
    docs = _t(spark, sf_dir, "documents")
    s = docs.select("doc_id", F.split("text", " ").alias("w"))
    co1 = s.select(
        F.explode(F.expr(
            "transform(sequence(1, size(w) - 1), "
            "i -> struct(w[i - 1] AS x, w[i] AS y))")).alias("p")
    ).select("p.x", "p.y", F.lit(2).alias("wgt"))
    co2 = s.filter(F.size("w") >= 3).select(
        F.explode(F.expr(
            "transform(sequence(1, size(w) - 2), "
            "i -> struct(w[i - 1] AS x, w[i + 1] AS y))")).alias("p")
    ).select("p.x", "p.y", F.lit(1).alias("wgt"))
    co = co1.unionAll(co2)
    agg = co.groupBy("x", "y").agg(
        F.sum("wgt").alias("cowgt"), F.count("*").alias("n_pairs"))
    return agg.filter(F.col("cowgt") >= 100).select(
        "x", "y",
        F.col("cowgt").cast("long").alias("cowgt"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
    )


# --- negative-sampling table (q355) -------------------------------------------


@query(
    "q355_negative_sampling_table",
    """WITH w AS (SELECT word, count(*) AS f FROM
                    (SELECT unnest(string_split(text, ' ')) AS word
                     FROM documents)
                  GROUP BY word),
       p AS (SELECT word, f,
                    CAST(floor(sqrt(floor(sqrt(
                      CAST(f AS DOUBLE) * CAST(f AS DOUBLE)
                      * CAST(f AS DOUBLE))))) AS BIGINT) AS w34
             FROM w),
       t AS (SELECT sum(w34) AS tw FROM p),
       q AS (SELECT p.word, p.f, p.w34,
                    (p.w34 * 10000) // t.tw AS base,
                    (p.w34 * 10000) % t.tw AS rem
             FROM p CROSS JOIN t),
       k AS (SELECT CAST(10000 - sum(base) AS BIGINT) AS n_extra FROM q),
       rk AS (SELECT a.word,
                     (SELECT count(*) FROM q b
                      WHERE b.rem > a.rem
                         OR (b.rem = a.rem AND b.word < a.word)) + 1
                       AS rnk
              FROM q a)
       SELECT q.word, CAST(q.f AS BIGINT) AS freq,
              CAST(q.w34 AS BIGINT) AS w34,
              CAST(q.base + CASE WHEN rk.rnk <= k.n_extra THEN 1 ELSE 0
                            END AS BIGINT) AS table_slots
       FROM q JOIN rk USING (word) CROSS JOIN k""",
)
def q355(spark, sf_dir):
    """word2vec negative-sampling table — the unigram^(3/4)
    distribution (Mikolov) realized EXACTLY: f^(3/4) as the integer
    floor(sqrt(floor(sqrt(f^3)))) (two correctly-rounded IEEE sqrts
    + floors, identical in both engines — no pow), then 10000 table
    slots apportioned by largest remainder with deterministic ties
    (the q274/q350 Hamilton machinery), so slots sum to EXACTLY the
    table size and the sampling table is reproducible forever.
    Lexicon-bounded throughout; the down-weighting of the head
    (f^0.75 flattens Zipf) is visible in slots/freq."""
    docs = _t(spark, sf_dir, "documents")
    w = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word").agg(F.count("*").alias("f"))
    )
    p = w.select(
        "word", "f",
        F.floor(F.sqrt(F.floor(F.sqrt(
            F.col("f").cast("double") * F.col("f").cast("double")
            * F.col("f").cast("double")
        )))).cast("long").alias("w34"),
    )
    t = p.agg(F.sum("w34").alias("tw"))
    q = p.crossJoin(F.broadcast(t)).select(
        "word", "f", "w34",
        F.expr("(w34 * 10000) div tw").alias("base"),
        ((F.col("w34") * 10000) % F.col("tw")).alias("rem"),
    )
    k = q.agg((10000 - F.sum("base")).alias("n_extra"))
    b = q.selectExpr("word AS bw", "rem AS brem")
    rk = (
        q.join(
            F.broadcast(b),
            (F.col("brem") > F.col("rem"))
            | ((F.col("brem") == F.col("rem"))
               & (F.col("bw") < F.col("word"))),
            "left",
        )
        .groupBy("word", "f", "w34", "base", "rem")
        .agg((F.count("bw") + 1).alias("rnk"))
    )
    return rk.crossJoin(F.broadcast(k)).select(
        "word",
        F.col("f").cast("long").alias("freq"),
        F.col("w34").cast("long").alias("w34"),
        (F.col("base")
         + F.when(F.col("rnk") <= F.col("n_extra"), 1).otherwise(0))
        .cast("long").alias("table_slots"),
    )


# --- deterministic epoch shuffling (q356) -------------------------------------


@query(
    "q356_epoch_shuffle",
    """WITH d AS (SELECT doc_id FROM documents),
       ep AS (SELECT e.range AS epoch, d.doc_id,
                CAST(CAST('0x' || substr(md5('ep' ||
                       CAST(e.range AS VARCHAR) || ':' ||
                       CAST(d.doc_id AS VARCHAR)), 1, 8) AS UBIGINT)
                     AS BIGINT) AS key
              FROM d, range(0, 2) e),
       rk AS (SELECT a.epoch, a.doc_id,
                     (SELECT count(*) FROM ep b
                      WHERE b.epoch = a.epoch
                        AND (b.key < a.key
                             OR (b.key = a.key AND b.doc_id < a.doc_id)))
                       + 1 AS pos
              FROM ep a)
       SELECT epoch, CAST(pos AS BIGINT) AS pos,
              CAST(doc_id AS BIGINT) AS doc_id
       FROM rk WHERE pos <= 10""",
)
def q356(spark, sf_dir):
    """Deterministic epoch shuffling — the reproducible training-data
    order (seeded shuffles must replay bit-identically across
    restarts and frameworks): each epoch's order key is the
    md5-derived integer of ('ep'||epoch||':'||doc), and the emitted
    head (first 10 positions of epochs 0 and 1) proves the orders
    differ across epochs yet are fully deterministic.  Position =
    count-of-smaller — at fixture scale a bounded self-join; at
    10^12 docs the SAME key feeds a repartitionByRange+sort and the
    count-of-smaller is never materialized (the key, not the rank,
    is the contract)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    ep = docs.crossJoin(
        F.broadcast(spark.range(0, 2).selectExpr("id AS epoch"))
    ).withColumn(
        "key",
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ep"), F.col("epoch").cast("string"),
                               F.lit(":"), F.col("doc_id").cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("long"),
    )
    b = ep.selectExpr("epoch AS bep", "doc_id AS bd", "key AS bk")
    rk = (
        ep.join(
            b,
            (F.col("epoch") == F.col("bep"))
            & ((F.col("bk") < F.col("key"))
               | ((F.col("bk") == F.col("key"))
                  & (F.col("bd") < F.col("doc_id")))),
            "left",
        )
        .groupBy("epoch", "doc_id")
        .agg((F.count("bd") + 1).alias("pos"))
    )
    return rk.filter(F.col("pos") <= 10).select(
        "epoch",
        F.col("pos").cast("long").alias("pos"),
        F.col("doc_id").cast("long").alias("doc_id"),
    )


# --- fused dedup decision matrix (q357) ---------------------------------------


@query(
    "q357_dedup_decision_matrix",
    """WITH src AS (SELECT doc_id,
                     CASE WHEN doc_id % 30 = 7 THEN
                       (CASE WHEN (doc_id // 30) % 2 = 0
                             THEN 'alpha' ELSE 'Alpha' END)
                       || ' beta gamma delta five six seven eight nine ten'
                       || ' tail' || CAST(doc_id % 7 AS VARCHAR)
                     ELSE text END AS body
                   FROM documents),
       d AS (SELECT doc_id,
                    md5(body) AS h_exact,
                    md5(lower(regexp_replace(regexp_replace(body,
                        '[^a-zA-Z0-9]+', ' ', 'g'), ' +', ' ', 'g')))
                      AS h_norm,
                    md5(array_to_string(string_split(body, ' ')[1:8], ' '))
                      AS h_prefix
                  FROM src),
       fe AS (SELECT h_exact, min(doc_id) AS k FROM d GROUP BY h_exact),
       fn AS (SELECT h_norm, min(doc_id) AS k FROM d GROUP BY h_norm),
       fp AS (SELECT h_prefix, min(doc_id) AS k FROM d
              GROUP BY h_prefix),
       m AS (SELECT d.doc_id,
                    CASE WHEN fe.k < d.doc_id THEN 1 ELSE 0 END AS dup_e,
                    CASE WHEN fn.k < d.doc_id THEN 1 ELSE 0 END AS dup_n,
                    CASE WHEN fp.k < d.doc_id THEN 1 ELSE 0 END AS dup_p
             FROM d JOIN fe USING (h_exact) JOIN fn USING (h_norm)
                    JOIN fp USING (h_prefix))
       SELECT dup_e AS dup_exact, dup_n AS dup_normalized,
              dup_p AS dup_prefix,
              CAST(count(*) AS BIGINT) AS n,
              CAST(sum(CASE WHEN dup_e = 0 AND dup_n = 0 AND dup_p = 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
       FROM m GROUP BY dup_e, dup_n, dup_p""",
)
def q357(spark, sf_dir):
    """Fused dedup decision matrix — the FINAL keep/drop gate a
    corpus release applies, with all three dedup keys evaluated in
    ONE pass (exact md5, CCNet-normalized md5, 8-word-prefix md5 —
    each level's min-id keeper decides 'am I the first?'), and the
    full 2^3 agreement matrix emitted (which levels fire together —
    the column that justifies running the cheaper level first).
    Three hash groupBys + three equi-joins back, the q318/q329
    fused-membership pattern at dedup granularity; a doc survives
    iff it is the keeper at EVERY level.  Case-variant template docs
    (doc_id%30==7, alternating 'alpha'/'Alpha' leads, tail outside
    the 8-word prefix) plus natural first-8-word collisions populate
    the partial-agreement cells — prefix-only and normalized+prefix
    dups both occur, so the levels provably dissociate."""
    docs = _t(spark, sf_dir, "documents")
    src = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 30 == 7,
            F.concat(
                F.when(F.expr("(doc_id div 30) % 2") == 0,
                       F.lit("alpha")).otherwise(F.lit("Alpha")),
                F.lit(" beta gamma delta five six seven eight nine ten"
                      " tail"),
                (F.col("doc_id") % 7).cast("string"),
            ),
        ).otherwise(F.col("text")).alias("body"),
    )
    d = src.select(
        "doc_id",
        F.md5("body").alias("h_exact"),
        F.md5(
            F.lower(F.regexp_replace(
                F.regexp_replace("body", "[^a-zA-Z0-9]+", " "),
                " +", " "))
        ).alias("h_norm"),
        F.md5(F.array_join(F.slice(F.split("body", " "), 1, 8), " "))
        .alias("h_prefix"),
    )
    fe = d.groupBy("h_exact").agg(F.min("doc_id").alias("ke"))
    fn = d.groupBy("h_norm").agg(F.min("doc_id").alias("kn"))
    fp = d.groupBy("h_prefix").agg(F.min("doc_id").alias("kp"))
    m = (
        d.join(fe, "h_exact").join(fn, "h_norm").join(fp, "h_prefix")
        .select(
            F.when(F.col("ke") < F.col("doc_id"), 1).otherwise(0)
            .alias("dup_e"),
            F.when(F.col("kn") < F.col("doc_id"), 1).otherwise(0)
            .alias("dup_n"),
            F.when(F.col("kp") < F.col("doc_id"), 1).otherwise(0)
            .alias("dup_p"),
        )
    )
    return m.groupBy(
        F.col("dup_e").alias("dup_exact"),
        F.col("dup_n").alias("dup_normalized"),
        F.col("dup_p").alias("dup_prefix"),
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(
            F.when((F.col("dup_e") == 0) & (F.col("dup_n") == 0)
                   & (F.col("dup_p") == 0), 1).otherwise(0)
        ).cast("long").alias("n_keep"),
    )


# --- license propagation through dup clusters (q358) --------------------------


@query(
    "q358_license_propagation",
    """WITH d AS (SELECT doc_id,
                    md5(CASE WHEN doc_id % 11 = 0
                        THEN 'shared licensed body' ELSE text END) AS h,
                    CASE WHEN doc_id % 44 = 0 THEN 1 ELSE 0 END
                      AS flagged_src
                  FROM documents),
       cl AS (SELECT h, max(flagged_src) AS any_flagged,
                     count(*) AS cluster_size
              FROM d GROUP BY h)
       SELECT d.doc_id,
              CAST(d.flagged_src AS BIGINT) AS flagged_src,
              CAST(cl.any_flagged AS BIGINT) AS flagged_effective,
              CAST(cl.cluster_size AS BIGINT) AS cluster_size
       FROM d JOIN cl USING (h)
       WHERE cl.any_flagged = 1 OR d.flagged_src = 1""",
)
def q358(spark, sf_dir):
    """License/compliance propagation through duplicate clusters —
    if ANY copy of a text carries a restrictive license or takedown
    flag, EVERY copy inherits it (content rights attach to the
    work, not the URL): exact-hash clusters take the max flag and
    every member reads the cluster verdict.  The planted template on
    doc_id%11==0 forms one big cluster; flags originate on the
    doc_id%44==0 subset, so most flagged_effective rows have
    flagged_src=0 — inheritance doing the work.  One hash groupBy +
    one equi-join back; at corpus scale this runs as part of the
    dedup pass for free."""
    docs = _t(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.md5(
            F.when(F.col("doc_id") % 11 == 0, F.lit("shared licensed body"))
            .otherwise(F.col("text"))
        ).alias("h"),
        F.when(F.col("doc_id") % 44 == 0, 1).otherwise(0)
        .alias("flagged_src"),
    )
    cl = d.groupBy("h").agg(
        F.max("flagged_src").alias("any_flagged"),
        F.count("*").alias("cluster_size"),
    )
    return (
        d.join(cl, "h")
        .filter((F.col("any_flagged") == 1) | (F.col("flagged_src") == 1))
        .select(
            "doc_id",
            F.col("flagged_src").cast("long").alias("flagged_src"),
            F.col("any_flagged").cast("long").alias("flagged_effective"),
            F.col("cluster_size").cast("long").alias("cluster_size"),
        )
    )


# --- redirect/canonical chain resolution (q359) -------------------------------


@query(
    "q359_redirect_resolution",
    """WITH f AS (SELECT doc_id AS src,
                    CASE WHEN doc_id % 97 = 95 THEN doc_id + 1
                         WHEN doc_id % 97 = 96 THEN doc_id - 1
                         WHEN doc_id % 3 = 0 AND doc_id % 97 < 95
                              THEN (doc_id // 3) * 3 + 300
                         ELSE doc_id END AS nxt
                  FROM documents),
       uni AS (SELECT src, CASE WHEN nxt IN (SELECT src FROM f)
                                THEN nxt ELSE src END AS nxt
               FROM f),
       j1 AS (SELECT a.src, b.nxt FROM uni a JOIN uni b
              ON b.src = a.nxt),
       j2 AS (SELECT a.src, b.nxt FROM j1 a JOIN j1 b
              ON b.src = a.nxt),
       j3 AS (SELECT a.src, b.nxt FROM j2 a JOIN j2 b
              ON b.src = a.nxt),
       res AS (SELECT j3.src, j3.nxt AS target,
                      CASE WHEN u.nxt = j3.nxt THEN 0 ELSE 1 END
                        AS in_loop
               FROM j3 JOIN uni u ON u.src = j3.nxt)
       SELECT src, CAST(target AS BIGINT) AS target,
              CAST(in_loop AS BIGINT) AS in_loop
       FROM res WHERE src <> target OR in_loop = 1""",
)
def q359(spark, sf_dir):
    """Redirect/canonical chain resolution with LOOP detection — the
    crawl-side URL canonicalization that must terminate even on
    misconfigured sites: a functional next-hop graph (every third
    page redirects toward a hub; a planted 2-cycle on doc_id%97 in
    {95,96} models the classic A<->B redirect loop), resolved by
    THREE pointer-doubling jumps (depth 8 — chains here are <= 2
    hops; the doubling count is log2(max depth), the q94/q33 CC
    contract) with off-graph targets self-absorbed; a page whose
    depth-8 pointer still MOVES is in a loop and flagged instead of
    resolved.  Emitted: every redirected page's final target or loop
    flag."""
    docs = _t(spark, sf_dir, "documents")
    f = docs.selectExpr(
        "doc_id AS src",
        """CASE WHEN doc_id % 97 = 95 THEN doc_id + 1
                WHEN doc_id % 97 = 96 THEN doc_id - 1
                WHEN doc_id % 3 = 0 AND doc_id % 97 < 95
                     THEN (doc_id div 3) * 3 + 300
                ELSE doc_id END AS nxt""",
    )
    srcs = f.select(F.col("src").alias("s2")).distinct()
    uni = (
        f.join(srcs, f.nxt == F.col("s2"), "left")
        .select(
            "src",
            F.when(F.col("s2").isNotNull(), F.col("nxt"))
            .otherwise(F.col("src")).alias("nxt"),
        )
        .localCheckpoint(eager=True)
    )
    j = uni
    for _ in range(3):
        b = j.selectExpr("src AS bs", "nxt AS bn")
        j = (
            j.join(b, j.nxt == F.col("bs"))
            .select("src", F.col("bn").alias("nxt"))
            .localCheckpoint(eager=True)
        )
    res = (
        j.join(uni.selectExpr("src AS ts", "nxt AS tn"),
               j.nxt == F.col("ts"))
        .select(
            "src", F.col("nxt").alias("target"),
            F.when(F.col("tn") == F.col("nxt"), 0).otherwise(1)
            .alias("in_loop"),
        )
    )
    return res.filter(
        (F.col("src") != F.col("target")) | (F.col("in_loop") == 1)
    ).select(
        "src",
        F.col("target").cast("long").alias("target"),
        F.col("in_loop").cast("long").alias("in_loop"),
    )


# --- hreflang symmetry audit (q360) -------------------------------------------


@query(
    "q360_hreflang_symmetry",
    """WITH decl AS (SELECT doc_id AS a,
                       (doc_id + 250) % 500 AS b
                     FROM documents WHERE doc_id % 2 = 0
                     UNION ALL
                     SELECT doc_id, (doc_id + 250) % 500
                     FROM documents
                     WHERE doc_id % 2 = 1 AND doc_id % 7 <> 1),
       sym AS (SELECT d.a, d.b,
                      CASE WHEN r.a IS NOT NULL THEN 1 ELSE 0 END
                        AS reciprocated
               FROM decl d LEFT JOIN decl r
                 ON r.a = d.b AND r.b = d.a)
       SELECT CAST(a % 10 AS BIGINT) AS bucket,
              CAST(count(*) AS BIGINT) AS n_declared,
              CAST(sum(reciprocated) AS BIGINT) AS n_reciprocated,
              CAST(count(*) - sum(reciprocated) AS BIGINT) AS n_broken
       FROM sym GROUP BY a % 10""",
)
def q360(spark, sf_dir):
    """hreflang symmetry audit — the SEO/i18n correctness check
    (language-alternate annotations must be RECIPROCAL; a one-way
    declaration is ignored by crawlers and silently loses the
    pairing): the declared alternate-pair table self-joins reversed,
    and unreciprocated declarations are counted per bucket.  Odd
    pages with doc_id%7==1 deliberately omit their back-declaration,
    so ~7% of pairs break — the audit localizes exactly those.  One
    self-equi-join on the (b, a) key — the q257 reciprocity shape
    applied to annotation QA."""
    docs = _t(spark, sf_dir, "documents")
    even = docs.filter(F.col("doc_id") % 2 == 0).selectExpr(
        "doc_id AS a", "(doc_id + 250) % 500 AS b")
    odd = docs.filter(
        (F.col("doc_id") % 2 == 1) & (F.col("doc_id") % 7 != 1)
    ).selectExpr("doc_id AS a", "(doc_id + 250) % 500 AS b")
    decl = even.unionAll(odd).localCheckpoint(eager=True)
    r = decl.selectExpr("a AS rb", "b AS ra")
    sym = decl.join(
        r, (F.col("ra") == F.col("a")) & (F.col("rb") == F.col("b")),
        "left",
    ).select(
        "a", "b",
        F.when(F.col("ra").isNotNull(), 1).otherwise(0)
        .alias("reciprocated"),
    )
    return sym.groupBy((F.col("a") % 10).alias("bucket")).agg(
        F.count("*").cast("long").alias("n_declared"),
        F.sum("reciprocated").cast("long").alias("n_reciprocated"),
        (F.count("*") - F.sum("reciprocated")).cast("long")
        .alias("n_broken"),
    )


# --- index shard-merge reconciliation (q361) ----------------------------------


@query(
    "q361_index_shard_merge",
    """WITH p AS (SELECT DISTINCT word, doc_id FROM
                    (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                     FROM documents)),
       sa AS (SELECT word, count(*) AS df_a FROM p
              WHERE doc_id % 2 = 0 GROUP BY word),
       sb AS (SELECT word, count(*) AS df_b FROM p
              WHERE doc_id % 2 = 1 GROUP BY word),
       g AS (SELECT word, count(*) AS df_g FROM p GROUP BY word)
       SELECT g.word,
              CAST(coalesce(sa.df_a, 0) AS BIGINT) AS df_shard_a,
              CAST(coalesce(sb.df_b, 0) AS BIGINT) AS df_shard_b,
              CAST(g.df_g AS BIGINT) AS df_merged,
              CAST(CASE WHEN coalesce(sa.df_a, 0) + coalesce(sb.df_b, 0)
                             = g.df_g THEN 1 ELSE 0 END AS BIGINT)
                AS merge_consistent
       FROM g LEFT JOIN sa USING (word) LEFT JOIN sb USING (word)""",
)
def q361(spark, sf_dir):
    """Index shard-merge reconciliation — the correctness audit run
    after merging per-shard partial indexes (doc-partitioned shards
    mean per-term df must ADD exactly; any inconsistency pinpoints a
    doc double-indexed or dropped at the shard boundary): per term,
    both shard dfs, the merged df, and the exact additivity flag.
    Three postings aggregations sharing one scan — the audit every
    segment-merge (Lucene-style) runs before swapping the new
    segment in; at 10^12 postings the reconciliation is
    term-sharded and combinable."""
    docs = _t(spark, sf_dir, "documents")
    p = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .distinct()
    )
    sa = p.filter(F.col("doc_id") % 2 == 0).groupBy("word").agg(
        F.count("*").alias("df_a"))
    sb = p.filter(F.col("doc_id") % 2 == 1).groupBy("word").agg(
        F.count("*").alias("df_b"))
    g = p.groupBy("word").agg(F.count("*").alias("df_g"))
    return (
        g.join(sa, "word", "left").join(sb, "word", "left")
        .select(
            "word",
            F.coalesce("df_a", F.lit(0)).cast("long").alias("df_shard_a"),
            F.coalesce("df_b", F.lit(0)).cast("long").alias("df_shard_b"),
            F.col("df_g").cast("long").alias("df_merged"),
            F.when(
                F.coalesce("df_a", F.lit(0)) + F.coalesce("df_b", F.lit(0))
                == F.col("df_g"), 1,
            ).otherwise(0).cast("long").alias("merge_consistent"),
        )
    )


# --- snippet highlight char offsets (q362) ------------------------------------


@query(
    "q362_highlight_offsets",
    """WITH s AS (SELECT doc_id, string_split(text, ' ') AS w
                  FROM documents),
       chk AS (SELECT CASE WHEN max(len(w)) > 199
                      THEN error('q362 oracle range bound exceeded')
                      ELSE 1 END AS ok FROM s),
       hits AS (SELECT doc_id, r.range AS pos,
                       CASE WHEN r.range = 1 THEN 0
                            ELSE len(array_to_string(
                                   w[1:r.range - 1], ' ')) + 1 END
                         AS char_start
                FROM s, range(1, 200) r
                WHERE r.range <= len(w) AND w[r.range] = 'merge')
       SELECT doc_id, CAST(pos AS BIGINT) AS pos,
              CAST(char_start AS BIGINT) AS char_start,
              CAST(char_start + 5 AS BIGINT) AS char_end
       FROM hits, chk""",
)
def q362(spark, sf_dir):
    """Snippet highlight character offsets — the serving-UI detail
    that turns a match position into <em> byte ranges: for every
    occurrence of the probe term, the exact character offset (length
    of the joined prefix words + one separator; position 1 starts at
    0) and the end offset.  Derived entirely from the SAME split the
    tokenizer used, so offsets can never drift from tokenization —
    the invariant highlighters break when they re-tokenize.
    Per-row linear array work at scan speed (the q295 KWIC shape
    emitting offsets instead of windows)."""
    docs = _t(spark, sf_dir, "documents")
    s = docs.select("doc_id", F.split("text", " ").alias("w"))
    hits = s.select(
        "doc_id",
        F.explode(
            F.expr("filter(sequence(1, size(w)), i -> w[i - 1] = 'merge')")
        ).alias("pos"),
        "w",
    ).select(
        "doc_id", "pos",
        F.when(F.col("pos") == 1, 0).otherwise(
            F.length(
                F.array_join(
                    F.expr("slice(w, 1, CAST(pos AS INT) - 1)"), " ")
            ) + 1
        ).alias("char_start"),
    )
    return hits.select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        F.col("char_start").cast("long").alias("char_start"),
        (F.col("char_start") + 5).cast("long").alias("char_end"),
    )


# --- weak-supervision label vote (q363) ---------------------------------------


@query(
    "q363_weak_supervision_vote",
    """WITH f AS (SELECT doc_id,
                    CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS r_len,
                    CASE WHEN len(list_filter(string_split(text, ' '),
                           x -> x IN ('the', 'and', 'of', 'a'))) >= 2
                         THEN 1 ELSE 0 END AS r_stop,
                    CASE WHEN lang IN ('en', 'es', 'de', 'fr')
                         THEN 1 ELSE 0 END AS r_lang
                  FROM documents),
       v AS (SELECT doc_id, r_len, r_stop, r_lang,
                    r_len + r_stop + r_lang AS votes
             FROM f)
       SELECT CAST(votes AS BIGINT) AS votes,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(CASE WHEN votes >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_keep,
              CAST(sum(CASE WHEN r_len = r_stop AND r_stop = r_lang
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_unanimous
       FROM v GROUP BY votes""",
)
def q363(spark, sf_dir):
    """Weak-supervision label vote (Snorkel-lite) — three cheap
    labeling functions (length, stopword presence, language
    allowlist) combined by MAJORITY VOTE, with the per-vote-level
    histogram and unanimity counts that diagnose labeling-function
    agreement (the number the label-model's learned weights replace).
    One projection + one rollup, all rules exact integer tests —
    the shape under every programmatic-labeling pipeline before a
    trained model exists."""
    docs = _t(spark, sf_dir, "documents")
    f = docs.select(
        "doc_id",
        F.when(F.col("n_chars") >= 200, 1).otherwise(0).alias("r_len"),
        F.when(
            F.size(F.filter(
                F.split("text", " "),
                lambda x: x.isin("the", "and", "of", "a"))) >= 2, 1,
        ).otherwise(0).alias("r_stop"),
        F.when(F.col("lang").isin("en", "es", "de", "fr"), 1).otherwise(0)
        .alias("r_lang"),
    )
    v = f.select(
        "doc_id", "r_len", "r_stop", "r_lang",
        (F.col("r_len") + F.col("r_stop") + F.col("r_lang")).alias("votes"),
    )
    return v.groupBy("votes").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("votes") >= 2, 1).otherwise(0)).cast("long")
        .alias("n_keep"),
        F.sum(
            F.when((F.col("r_len") == F.col("r_stop"))
                   & (F.col("r_stop") == F.col("r_lang")), 1).otherwise(0)
        ).cast("long").alias("n_unanimous"),
    ).select(
        F.col("votes").cast("long").alias("votes"),
        "n_docs", "n_keep", "n_unanimous",
    )


# --- web release pipeline rollup (q364) ---------------------------------------


@query(
    "q364_release_pipeline",
    """WITH d AS (SELECT doc_id, source, text, lang, n_chars,
                         md5(text) AS h,
                         len(string_split(text, ' ')) AS lw
                  FROM documents),
       gated AS (SELECT *,
                   CASE WHEN n_chars >= 150 AND lang IN ('en', 'es')
                        THEN 1 ELSE 0 END AS pass_gate
                 FROM d),
       keep AS (SELECT g.*, 
                       CASE WHEN g.pass_gate = 1 AND k.keeper = g.doc_id
                            THEN 1 ELSE 0 END AS kept
               FROM gated g LEFT JOIN
                 (SELECT h, min(doc_id) AS keeper FROM gated
                  WHERE pass_gate = 1 GROUP BY h) k ON k.h = g.h)
       SELECT source,
              CAST(count(*) AS BIGINT) AS docs_in,
              CAST(sum(pass_gate) AS BIGINT) AS docs_after_gate,
              CAST(sum(kept) AS BIGINT) AS docs_released,
              CAST(sum(CASE WHEN kept = 1
                       THEN (lw + 14) // 15 ELSE 0 END) AS BIGINT)
                AS n_passages
       FROM keep GROUP BY source""",
)
def q364(spark, sf_dir):
    """Web release pipeline rollup — gate -> dedup -> chunk in ONE
    composed plan per source (the q146 training-pipeline pattern on
    the release side): the quality gate (length + language), the
    exact-dedup keeper decision applied ONLY among gated docs (the
    keeper must be a released doc, not a rejected one — the ordering
    bug release pipelines actually hit), and the q302-stride passage
    count ceil(words/15) for what ships.  One scan + one hash
    groupBy + one source rollup — the per-source release dashboard
    row."""
    docs = _t(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", "source", "lang", "n_chars",
        F.md5("text").alias("h"),
        F.size(F.split("text", " ")).alias("lw"),
    )
    gated = d.withColumn(
        "pass_gate",
        F.when((F.col("n_chars") >= 150)
               & (F.col("lang").isin("en", "es")), 1).otherwise(0),
    )
    k = (
        gated.filter(F.col("pass_gate") == 1)
        .groupBy("h").agg(F.min("doc_id").alias("keeper"))
    )
    keep = gated.join(k, "h", "left").withColumn(
        "kept",
        F.when((F.col("pass_gate") == 1)
               & (F.col("keeper") == F.col("doc_id")), 1).otherwise(0),
    )
    return keep.groupBy("source").agg(
        F.count("*").cast("long").alias("docs_in"),
        F.sum("pass_gate").cast("long").alias("docs_after_gate"),
        F.sum("kept").cast("long").alias("docs_released"),
        F.sum(
            F.when(F.col("kept") == 1,
                   F.expr("(lw + 14) div 15")).otherwise(0)
        ).cast("long").alias("n_passages"),
    )


# --- binary-quantized embedding recall (q365) ---------------------------------


@query(
    "q365_binary_embedding_recall",
    """WITH v AS (SELECT vec_id, list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE)*1000 + 0.5) AS BIGINT))
                    AS qv
             FROM embeddings),
       bits AS (SELECT vec_id,
                  CAST(list_sum(list_transform(range(1, 33),
                    i -> CASE WHEN qv[i] > 0
                         THEN CAST(1 AS BIGINT) << CAST(i - 1 AS INT)
                         ELSE 0 END)) AS BIGINT) AS b_lo,
                  CAST(list_sum(list_transform(range(33, 65),
                    i -> CASE WHEN qv[i] > 0
                         THEN CAST(1 AS BIGINT) << CAST(i - 33 AS INT)
                         ELSE 0 END)) AS BIGINT) AS b_hi
                FROM v),
       q AS (SELECT vec_id AS qid, qv AS qqv FROM v
             WHERE vec_id % 10 = 0),
       qb AS (SELECT b.vec_id AS qid, b.b_lo AS q_lo, b.b_hi AS q_hi
              FROM bits b WHERE b.vec_id % 10 = 0),
       pr AS (SELECT q.qid, v.vec_id AS cand,
                 CAST(list_sum(list_transform(list_zip(q.qqv, v.qv),
                      s -> s[1]*s[2])) AS BIGINT) AS dot_full
              FROM q JOIN v ON v.vec_id <> q.qid),
       ph AS (SELECT qb.qid, b.vec_id AS cand,
                     bit_count(xor(qb.q_lo, b.b_lo))
                     + bit_count(xor(qb.q_hi, b.b_hi)) AS hamming
              FROM qb JOIN bits b ON b.vec_id <> qb.qid),
       rf AS (SELECT qid, cand,
                     row_number() OVER (PARTITION BY qid
                       ORDER BY dot_full DESC, cand ASC) AS rnk
              FROM pr),
       rb AS (SELECT qid, cand,
                     row_number() OVER (PARTITION BY qid
                       ORDER BY hamming ASC, cand ASC) AS rnk
              FROM ph)
       SELECT rf.qid, CAST(count(rb.cand) AS BIGINT) AS overlap5
       FROM rf LEFT JOIN rb
         ON rb.qid = rf.qid AND rb.cand = rf.cand AND rb.rnk <= 5
       WHERE rf.rnk <= 5
       GROUP BY rf.qid""",
)
def q365(spark, sf_dir):
    """Binary-quantized (1-bit) embedding recall@5 — the 32x-
    compression tier every vector store now ships (sign-bit vectors,
    Hamming distance ranking): each 64-dim vector packs its sign
    bits into two 32-bit halves, candidates rank by
    bit_count(xor) Hamming (ties to lowest id) and the overlap with
    the exact integer-dot top-5 measures what 1-bit quantization
    keeps.  The complement of q292's dimension truncation — together
    they bracket the memory/recall tradeoff surface; same
    per-query ranking-window caveat (IVF-prefiltered at scale)."""
    v = _t(spark, sf_dir, "embeddings").selectExpr(
        "vec_id",
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*1000 "
        "+ 0.5) AS BIGINT)) AS qv",
    )
    bits = v.selectExpr(
        "vec_id",
        "CAST(aggregate(transform(sequence(1, 32), "
        "i -> CASE WHEN qv[i - 1] > 0 THEN shiftleft(CAST(1 AS BIGINT), "
        "CAST(i - 1 AS INT)) ELSE CAST(0 AS BIGINT) END), "
        "CAST(0 AS BIGINT), (a, x) -> a + x) AS BIGINT) AS b_lo",
        "CAST(aggregate(transform(sequence(33, 64), "
        "i -> CASE WHEN qv[i - 1] > 0 THEN shiftleft(CAST(1 AS BIGINT), "
        "CAST(i - 33 AS INT)) ELSE CAST(0 AS BIGINT) END), "
        "CAST(0 AS BIGINT), (a, x) -> a + x) AS BIGINT) AS b_hi",
    ).localCheckpoint(eager=True)
    q = v.filter("vec_id % 10 = 0").selectExpr("vec_id AS qid", "qv AS qqv")
    qb = bits.filter("vec_id % 10 = 0").selectExpr(
        "vec_id AS qid", "b_lo AS q_lo", "b_hi AS q_hi")
    pr = (
        F.broadcast(q).join(v, F.col("vec_id") != F.col("qid"))
        .selectExpr(
            "qid", "vec_id AS cand",
            "CAST(aggregate(zip_with(qqv, qv, (a, b) -> a * b), "
            "CAST(0 AS BIGINT), (acc, s) -> acc + s) AS BIGINT) "
            "AS dot_full",
        )
    )
    ph = (
        F.broadcast(qb).join(bits, F.col("vec_id") != F.col("qid"))
        .select(
            "qid", F.col("vec_id").alias("cand"),
            (
                F.bit_count(F.expr("q_lo ^ b_lo"))
                + F.bit_count(F.expr("q_hi ^ b_hi"))
            ).alias("hamming"),
        )
    )
    wf = Window.partitionBy("qid").orderBy(
        F.col("dot_full").desc(), F.col("cand").asc())
    wb = Window.partitionBy("qid").orderBy(
        F.col("hamming").asc(), F.col("cand").asc())
    rf = pr.select("qid", "cand", F.row_number().over(wf).alias("rnk"))
    rb = ph.select("qid", "cand", F.row_number().over(wb).alias("rnk"))
    rbs = rb.filter(F.col("rnk") <= 5).select(
        F.col("qid").alias("tqid"), F.col("cand").alias("tcand"))
    return (
        rf.filter(F.col("rnk") <= 5)
        .join(rbs, (F.col("qid") == F.col("tqid"))
              & (F.col("cand") == F.col("tcand")), "left")
        .groupBy("qid")
        .agg(F.count("tcand").cast("long").alias("overlap5"))
    )


# --- shuffle-skew diagnostics report (q366) -----------------------------------


@query(
    "q366_skew_report",
    """WITH hostg AS (SELECT 'host' AS key_family, doc_id % 40 AS k
                      FROM documents),
       wordg AS (SELECT 'word' AS key_family, NULL AS k FROM documents
                 WHERE FALSE),
       words AS (SELECT 'word' AS key_family,
                        CAST(NULL AS BIGINT) AS k,
                        word FROM
                   (SELECT unnest(string_split(text, ' ')) AS word
                    FROM documents)),
       g AS (SELECT key_family, CAST(k AS VARCHAR) AS key FROM hostg
             UNION ALL
             SELECT key_family, word FROM words
             UNION ALL
             SELECT 'user', CAST(user_id AS VARCHAR) FROM events),
       c AS (SELECT key_family, key, count(*) AS c FROM g
             GROUP BY key_family, key)
       SELECT key_family,
              CAST(count(*) AS BIGINT) AS n_keys,
              CAST(sum(c) AS BIGINT) AS n_rows,
              CAST(max(c) AS BIGINT) AS max_group,
              CAST(CASE WHEN max(c) * count(*) >= 4 * sum(c)
                        THEN 1 ELSE 0 END AS BIGINT) AS is_skewed
       FROM c GROUP BY key_family""",
)
def q366(spark, sf_dir):
    """Shuffle-skew diagnostics report — the meta-query a platform
    team runs BEFORE picking join/aggregation strategies (the number
    behind this repo's own salting ladder, operators/spatial_join):
    for each shuffle-key family (host, word, user), key count, row
    count, hottest group, and the exact cross-multiplied skew flag
    max*keys >= 4*rows (hottest group >= 4x the mean — the point
    where AQE alone leaves stragglers and explicit salting pays).
    Three groupBys sharing scans, one row per family — the skew
    report that turns 'the job is slow' into 'salt the word key'."""
    docs = _t(spark, sf_dir, "documents")
    ev = _t(spark, sf_dir, "events")
    hostg = docs.selectExpr("'host' AS key_family",
                            "CAST(doc_id % 40 AS STRING) AS key")
    words = docs.select(
        F.lit("word").alias("key_family"),
        F.explode(F.split("text", " ")).alias("key"),
    )
    users = ev.selectExpr("'user' AS key_family",
                          "CAST(user_id AS STRING) AS key")
    g = hostg.unionByName(words).unionByName(users)
    c = g.groupBy("key_family", "key").agg(F.count("*").alias("c"))
    return c.groupBy("key_family").agg(
        F.count("*").cast("long").alias("n_keys"),
        F.sum("c").cast("long").alias("n_rows"),
        F.max("c").cast("long").alias("max_group"),
        F.when(F.max("c") * F.count("*") >= 4 * F.sum("c"), 1)
        .otherwise(0).cast("long").alias("is_skewed"),
    )


# --- duplicate-aware effective tokens (q367) ----------------------------------


@query(
    "q367_effective_tokens",
    """WITH d AS (SELECT doc_id, source,
                    md5(text) AS h,
                    len(string_split(text, ' ')) AS lw
                  FROM documents),
       k AS (SELECT h, min(doc_id) AS keeper FROM d GROUP BY h)
       SELECT d.source,
              CAST(sum(d.lw) AS BIGINT) AS raw_tokens,
              CAST(sum(CASE WHEN k.keeper = d.doc_id THEN d.lw ELSE 0 END)
                AS BIGINT) AS effective_tokens,
              CAST(sum(CASE WHEN k.keeper <> d.doc_id THEN d.lw ELSE 0 END)
                AS BIGINT) AS duplicated_tokens
       FROM d JOIN k USING (h)
       GROUP BY d.source""",
)
def q367(spark, sf_dir):
    """Duplicate-aware EFFECTIVE token accounting — the number
    dataset papers actually report (raw token counts overstate a
    corpus whose duplicates will be dropped; epochs-over-effective-
    tokens is what the scaling laws consume): per source, raw vs
    keeper-only vs duplicated tokens under the exact md5 dedup key.
    One hash groupBy + one source rollup sharing a scan — the
    datasheet (q348) column that changes once dedup runs."""
    docs = _t(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", "source",
        F.md5("text").alias("h"),
        F.size(F.split("text", " ")).alias("lw"),
    )
    k = d.groupBy("h").agg(F.min("doc_id").alias("keeper"))
    return d.join(k, "h").groupBy("source").agg(
        F.sum("lw").cast("long").alias("raw_tokens"),
        F.sum(F.when(F.col("keeper") == F.col("doc_id"), F.col("lw"))
              .otherwise(0)).cast("long").alias("effective_tokens"),
        F.sum(F.when(F.col("keeper") != F.col("doc_id"), F.col("lw"))
              .otherwise(0)).cast("long").alias("duplicated_tokens"),
    )


# --- leakage-safe split assignment (q368) -------------------------------------


@query(
    "q368_leakage_safe_splits",
    """WITH d AS (SELECT doc_id,
                    md5(CASE WHEN doc_id % 15 = 9
                        THEN 'shared template body for ingest dedup'
                        ELSE text END) AS h
                  FROM documents),
       asg AS (SELECT doc_id, h,
                 CASE CAST(CAST('0x' || substr(md5('split:' || h), 1, 8)
                      AS UBIGINT) % 10 AS BIGINT)
                   WHEN 0 THEN 'test' WHEN 1 THEN 'val'
                   ELSE 'train' END AS split
               FROM d),
       leak AS (SELECT h, count(DISTINCT split) AS n_splits,
                       count(*) AS grp
                FROM asg GROUP BY h)
       SELECT asg.split,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(count(DISTINCT asg.h) AS BIGINT) AS n_groups,
              CAST(max(leak.n_splits) AS BIGINT) AS max_splits_per_group
       FROM asg JOIN leak USING (h)
       GROUP BY asg.split""",
)
def q368(spark, sf_dir):
    """Leakage-safe train/val/test split assignment — splits keyed
    on the CONTENT HASH, never the doc id, so exact duplicates land
    in the SAME split by construction (doc-id splits leak dup
    content from train into test, silently inflating eval):
    split = md5('split:'||h) % 10 (8/1/1), and the audit column
    max_splits_per_group == 1 PROVES no hash straddles splits —
    emitted, not assumed.  The q303 planted template group (docs
    9, 24, 39, ...) all land together.  One hash groupBy + one
    rollup; the assignment is a pure deterministic projection at
    any corpus size."""
    docs = _t(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.md5(
            F.when(F.col("doc_id") % 15 == 9,
                   F.lit("shared template body for ingest dedup"))
            .otherwise(F.col("text"))
        ).alias("h"),
    )
    slot = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("split:"), F.col("h"))), 1, 8),
            16, 10,
        ).cast("long") % 10
    )
    asg = d.select(
        "doc_id", "h",
        F.when(slot == 0, "test").when(slot == 1, "val")
        .otherwise("train").alias("split"),
    )
    leak = asg.groupBy("h").agg(
        F.countDistinct("split").alias("n_splits"))
    return asg.join(leak, "h").groupBy("split").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct("h").cast("long").alias("n_groups"),
        F.max("n_splits").cast("long").alias("max_splits_per_group"),
    )


# --- view dwell-time distribution (q369) --------------------------------------


@query(
    "q369_view_dwell_time",
    """WITH v AS (SELECT event_id, user_id,
                    CAST(floor(epoch(ts)) AS BIGINT) AS es
                  FROM events WHERE event_type = 'view'),
       nxt AS (SELECT v.event_id,
                      min(CAST(floor(epoch(e.ts)) AS BIGINT)) AS next_es
               FROM v JOIN events e
                 ON e.user_id = v.user_id
                AND CAST(floor(epoch(e.ts)) AS BIGINT) > v.es
               GROUP BY v.event_id),
       dt AS (SELECT v.event_id, nxt.next_es - v.es AS dwell
              FROM v JOIN nxt USING (event_id))
       SELECT CAST(length(bin(dwell)) AS BIGINT) AS log2_bucket,
              CAST(count(*) AS BIGINT) AS n_views,
              CAST(min(dwell) AS BIGINT) AS min_s,
              CAST(max(dwell) AS BIGINT) AS max_s
       FROM dt GROUP BY length(bin(dwell))""",
)
def q369(spark, sf_dir):
    """View dwell-time distribution — seconds from a view to the
    SAME user's next event (the engagement proxy behind quality
    ranking when真 dwell isn't instrumented): the next-event time is
    the as-of-forward min over the user's later events (combinable
    min, the q334 as-of idiom mirrored forward), histogrammed into
    the q294/q336 power-of-two buckets with visible bucket-edge
    min/max.  The user-keyed join carries the shuffle; the histogram
    is mergeable for the stream tier."""
    e = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type",
        F.unix_timestamp("ts").alias("es"),
    )
    v = e.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "es")
    other = e.select("user_id", F.col("es").alias("oes"))
    nxt = (
        v.join(other, "user_id")
        .filter(F.col("oes") > F.col("es"))
        .groupBy("event_id", "es")
        .agg(F.min("oes").alias("next_es"))
    )
    dt = nxt.select((F.col("next_es") - F.col("es")).alias("dwell"))
    return dt.groupBy(
        F.length(F.bin("dwell")).cast("long").alias("log2_bucket")
    ).agg(
        F.count("*").cast("long").alias("n_views"),
        F.min("dwell").cast("long").alias("min_s"),
        F.max("dwell").cast("long").alias("max_s"),
    )


# --- term-dictionary range-partition planning (q370) --------------------------


@query(
    "q370_term_range_partitions",
    """WITH p AS (SELECT word, count(*) AS postings FROM
                    (SELECT DISTINCT doc_id,
                            unnest(string_split(text, ' ')) AS word
                     FROM documents)
                  GROUP BY word),
       t AS (SELECT sum(postings) AS tot FROM p),
       cum AS (SELECT a.word, a.postings, sum(b.postings) AS cum
               FROM p a JOIN p b ON b.word <= a.word
               GROUP BY a.word, a.postings),
       parts AS (SELECT cum.word, cum.postings,
                        least(CAST((cum.cum - 1) * 4 // t.tot AS BIGINT),
                              3) AS part
                 FROM cum CROSS JOIN t)
       SELECT part,
              CAST(count(*) AS BIGINT) AS n_terms,
              CAST(sum(postings) AS BIGINT) AS postings,
              min(word) AS first_term,
              max(word) AS last_term
       FROM parts GROUP BY part""",
)
def q370(spark, sf_dir):
    """Term-dictionary range-partition planning — the boundary table
    a range-partitioned index build computes before writing segments
    (lexicographic term ranges with near-equal POSTING mass, not
    equal term counts — hot terms dominate bytes): cumulative
    posting mass in lex order (triangular join over the BOUNDED
    lexicon — never a corpus window), partition = floor((cum-1)*P /
    total) clamped, per-partition term ranges and masses emitted.
    This is the deterministic analogue of repartitionByRange's
    sampled boundaries (the q236 determinism contract: sampling is
    per-execution, value-derived boundaries are not)."""
    docs = _t(spark, sf_dir, "documents")
    p = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .distinct()
        .groupBy("word").agg(F.count("*").alias("postings"))
    )
    t = p.agg(F.sum("postings").alias("tot"))
    b = p.selectExpr("word AS bw", "postings AS bp")
    cum = (
        p.join(F.broadcast(b), F.col("bw") <= F.col("word"))
        .groupBy("word", "postings").agg(F.sum("bp").alias("cum"))
    )
    parts = cum.crossJoin(F.broadcast(t)).select(
        "word", "postings",
        F.least(F.expr("CAST((cum - 1) * 4 div tot AS BIGINT)"),
                F.lit(3)).alias("part"),
    )
    return parts.groupBy("part").agg(
        F.count("*").cast("long").alias("n_terms"),
        F.sum("postings").cast("long").alias("postings"),
        F.min("word").alias("first_term"),
        F.max("word").alias("last_term"),
    )


# --- LRU stack-distance cache curve (q371) -------------------------------------


@query(
    "q371_stack_distance",
    """WITH acc AS (SELECT event_id AS pos,
                CASE WHEN event_id % 4 = 0 THEN 0
                     WHEN event_id % 4 = 1 THEN 20 + (event_id // 4) % 3
                     WHEN event_id % 4 = 2 THEN 50 + (event_id // 4) % 12
                     ELSE 100 + (event_id * 7919) % 97 END AS item
              FROM events),
       prevs AS (SELECT pos, item,
                        lag(pos) OVER (PARTITION BY item ORDER BY pos) AS pp
                 FROM acc),
       warm AS (SELECT a.pos, count(DISTINCT b.item) AS d
                FROM prevs a LEFT JOIN acc b
                  ON b.pos > a.pp AND b.pos < a.pos
                WHERE a.pp IS NOT NULL GROUP BY a.pos),
       dist AS (SELECT d FROM warm
                UNION ALL
                SELECT -1 AS d FROM prevs WHERE pp IS NULL),
       lab AS (SELECT CASE WHEN d < 0 THEN 'cold' WHEN d < 4 THEN 'lt4'
                           WHEN d < 16 THEN 'lt16' WHEN d < 64 THEN 'lt64'
                           ELSE 'ge64' END AS bucket, d FROM dist)
       SELECT bucket, CAST(count(*) AS BIGINT) AS n_accesses,
              CAST(min(d) AS BIGINT) AS min_d,
              CAST(max(d) AS BIGINT) AS max_d
       FROM lab GROUP BY bucket""",
)
def q371(spark, sf_dir):
    """LRU stack-distance (reuse-distance) histogram — Mattson's
    one-pass answer to "what would the hit ratio be at EVERY cache
    size": an access hits a size-C LRU cache iff the number of
    DISTINCT items touched since its previous access is < C, so the
    bucketed distance histogram (lt4/lt16/lt64/ge64 + cold) reads
    off the whole hit-ratio curve at once — the cache-capacity
    planning input q330's static admission plan cannot give.
    Access stream = events in event_id order over a four-class item
    mix (one hot item, period-3 and period-12 working sets, a
    97-item cold tail — exact integer derivation) so every cache
    tier of the curve is populated at every SF.  Shape: the
    previous-access position is a per-item lag window (item-sharded,
    scales); the distinct-count-in-reuse-interval join is BUCKETED —
    each warm access explodes to the 32-position blocks its interval
    spans and equi-joins on the block id (a pure range join has no
    equi key and Spark plans a BroadcastNestedLoopJoin: O(n^2), 52 s
    at sf0.1 where this plan takes ~2 s), so candidate volume is
    Σ reuse-gap lengths + 2·32 per access — bounded for the
    cacheable (small-gap) mass that decides the curve.  The classic
    one-pass Mattson stack walk is inherently sequential and belongs
    to the per-shard streaming tier; this is its exact batch form."""
    e = _t(spark, sf_dir, "events").select(
        F.col("event_id").alias("pos"),
        F.when(F.col("event_id") % 4 == 0, F.lit(0))
        .when(F.col("event_id") % 4 == 1,
              20 + F.expr("event_id div 4") % 3)
        .when(F.col("event_id") % 4 == 2,
              50 + F.expr("event_id div 4") % 12)
        .otherwise(100 + (F.col("event_id") * 7919) % 97)
        .alias("item"),
    )
    w = Window.partitionBy("item").orderBy("pos")
    a = e.withColumn("pp", F.lag("pos").over(w))
    wa = a.filter(F.col("pp").isNotNull()).select("pos", "pp")
    # block-bucketed range join: explode each reuse interval to the
    # 32-position blocks it spans, equi-join on the block id, filter
    # exactly — a hash join Catalyst can shuffle, never a BNLJ.
    blk_a = wa.withColumn(
        "blk", F.explode(F.sequence(F.expr("(pp + 1) div 32"),
                                    F.expr("(pos - 1) div 32"))))
    b = e.select(F.col("pos").alias("bpos"), F.col("item").alias("bitem"),
                 F.expr("pos div 32").alias("blk"))
    counts = (
        blk_a.join(b, "blk")
        .filter((F.col("bpos") > F.col("pp")) & (F.col("bpos") < F.col("pos")))
        .groupBy("pos")
        .agg(F.countDistinct("bitem").alias("dc"))
    )
    warm = (
        wa.join(counts, "pos", "left")
        .select(F.coalesce(F.col("dc"), F.lit(0)).alias("d"))
    )
    cold = a.filter(F.col("pp").isNull()).select(F.lit(-1).alias("d"))
    dist = warm.unionByName(cold)
    lab = dist.select(
        F.when(F.col("d") < 0, "cold")
        .when(F.col("d") < 4, "lt4")
        .when(F.col("d") < 16, "lt16")
        .when(F.col("d") < 64, "lt64")
        .otherwise("ge64")
        .alias("bucket"),
        "d",
    )
    return lab.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_accesses"),
        F.min("d").cast("long").alias("min_d"),
        F.max("d").cast("long").alias("max_d"),
    )


# --- ranking eval: exact-integer MRR@10 (q372) ---------------------------------


@query(
    "q372_ranking_mrr",
    """WITH tf AS (SELECT doc_id, word, count(*) AS tf FROM
                     (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                      FROM documents)
                   GROUP BY doc_id, word),
       d AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
       top AS (SELECT a.word
               FROM d a LEFT JOIN d b
                 ON b.df > a.df OR (b.df = a.df AND b.word < a.word)
               GROUP BY a.word, a.df
               HAVING count(b.word) < 20),
       cls AS (SELECT tf.* FROM tf JOIN top USING (word)
               WHERE doc_id % 7 = length(word) % 7),
       m1 AS (SELECT word, max(tf) AS rel_tf FROM cls GROUP BY word),
       rel AS (SELECT cls.word, m1.rel_tf, min(cls.doc_id) AS rel_doc
               FROM cls JOIN m1
                 ON m1.word = cls.word AND cls.tf = m1.rel_tf
               GROUP BY cls.word, m1.rel_tf),
       rk AS (SELECT rel.word, count(c.doc_id) + 1 AS rnk
              FROM rel LEFT JOIN tf c
                ON c.word = rel.word
               AND (c.tf > rel.rel_tf
                    OR (c.tf = rel.rel_tf AND c.doc_id < rel.rel_doc))
              GROUP BY rel.word)
       SELECT CAST(count(*) AS BIGINT) AS n_queries,
              CAST(sum(CASE WHEN rnk = 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS hits_at1,
              CAST(sum(CASE WHEN rnk <= 5 THEN 1 ELSE 0 END) AS BIGINT)
                AS hits_at5,
              CAST(sum(CASE WHEN rnk <= 10 THEN 1 ELSE 0 END) AS BIGINT)
                AS hits_at10,
              CAST(sum(CASE WHEN rnk <= 10 THEN 2520 // rnk ELSE 0 END)
                AS BIGINT) AS mrr_x2520,
              CAST(sum(CASE WHEN rnk <= 10 THEN 2520 // rnk ELSE 0 END)
                AS DOUBLE) / (2520.0 * count(*)) AS mrr
       FROM rk""",
)
def q372(spark, sf_dir):
    """Search-ranking MRR@10 as EXACT integers — the offline eval
    number behind every ranker change, computed with no float until
    the final single division: reciprocal rank 1/r is scaled by
    2520 = lcm(1..10), so 2520 div r is exact for every admissible
    rank and the MRR numerator sums in BIGINT; the reported `mrr`
    is ONE double division at the end (bitwise across engines).
    Query set = top-20 lexicon terms by (df desc, word asc)
    count-of-greater ranks (lexicon-bounded, never a window);
    editorial relevance label = the argmax-tf doc within the term's
    assessment class (doc_id % 7 == len(word) % 7, min-doc tiebreak)
    so labels land at varied in-range ranks; the ranker orders docs
    by (tf desc, doc_id asc), and the relevant doc's rank is
    1 + count(better docs) — ONE count per query (20·df pairs,
    linear in corpus), never a materialized full ranking.
    hits@1/5/10 fall out of the same pass."""
    docs = _t(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    d = tf.groupBy("word").agg(F.count("*").alias("df"))
    lex = d.select(F.col("word").alias("w2"), F.col("df").alias("df2"))
    top = (
        d.join(
            F.broadcast(lex),
            (F.col("df2") > F.col("df"))
            | ((F.col("df2") == F.col("df")) & (F.col("w2") < F.col("word"))),
            "left",
        )
        .groupBy("word", "df")
        .agg(F.count("w2").alias("n_greater"))
        .filter(F.col("n_greater") < 20)
        .select("word")
    )
    cls = tf.join(F.broadcast(top), "word").filter(
        F.col("doc_id") % 7 == F.length("word") % 7)
    # editorial label = argmax tf within the class, min doc_id tiebreak —
    # ONE combinable max(struct(tf, -doc_id)) per word (the q334 idiom);
    # the oracle mirrors it TWO-PHASE (max tf, then min doc at that tf)
    # per the round-4f struct-max contract.
    rel = (
        cls.groupBy("word")
        .agg(F.max(F.struct(F.col("tf").alias("t"),
                            (-F.col("doc_id")).alias("nid"))).alias("s"))
        .select("word", F.col("s.t").alias("rel_tf"),
                (-F.col("s.nid")).alias("rel_doc"))
    )
    cand = tf.select(F.col("word").alias("cw"), F.col("doc_id").alias("cd"),
                     F.col("tf").alias("ctf"))
    rk = (
        rel.join(
            cand,
            (F.col("cw") == F.col("word"))
            & ((F.col("ctf") > F.col("rel_tf"))
               | ((F.col("ctf") == F.col("rel_tf"))
                  & (F.col("cd") < F.col("rel_doc")))),
            "left",
        )
        .groupBy("word")
        .agg((F.count("cd") + F.lit(1)).alias("rnk"))
    )
    agg = rk.agg(
        F.count("*").cast("long").alias("n_queries"),
        F.sum(F.when(F.col("rnk") == 1, 1).otherwise(0)).cast("long")
        .alias("hits_at1"),
        F.sum(F.when(F.col("rnk") <= 5, 1).otherwise(0)).cast("long")
        .alias("hits_at5"),
        F.sum(F.when(F.col("rnk") <= 10, 1).otherwise(0)).cast("long")
        .alias("hits_at10"),
        F.sum(F.when(F.col("rnk") <= 10, F.expr("2520 div rnk")).otherwise(0))
        .cast("long").alias("mrr_x2520"),
    )
    return agg.select(
        "n_queries", "hits_at1", "hits_at5", "hits_at10", "mrr_x2520",
        (F.col("mrr_x2520").cast("double")
         / (F.lit(2520.0) * F.col("n_queries"))).alias("mrr"),
    )


# --- position-bias CTR estimation (q373) ----------------------------------------


@query(
    "q373_position_bias_ctr",
    """WITH imp AS (SELECT event_id,
                event_id % 10 + 1 AS serp_pos,
                (event_id // 10 + (event_id % 10 + 1) * 13) % 50 AS item
              FROM events),
       lab AS (SELECT serp_pos,
                      CASE WHEN (item * 7919) % 100 >= 40
                            AND (event_id * 2654435761) % 97
                                < 97 - 9 * (serp_pos - 1)
                           THEN 1 ELSE 0 END AS clicked
               FROM imp),
       st AS (SELECT serp_pos,
                     CAST(count(*) AS BIGINT) AS n_impr,
                     CAST(sum(clicked) AS BIGINT) AS n_clicks
              FROM lab GROUP BY serp_pos),
       p1 AS (SELECT n_impr AS i1, n_clicks AS c1 FROM st WHERE serp_pos = 1)
       SELECT serp_pos, n_impr, n_clicks,
              CAST(n_clicks AS DOUBLE) / CAST(n_impr AS DOUBLE) AS ctr,
              CAST(n_clicks * i1 AS DOUBLE)
                / CAST(n_impr * c1 AS DOUBLE) AS bias_vs_pos1
       FROM st, p1""",
)
def q373(spark, sf_dir):
    """Position-bias curve from click logs — the propensity estimate
    every counterfactual learning-to-rank pipeline divides by
    (clicks at rank k are depressed by EXAMINATION, not relevance;
    training on raw clicks bakes the presentation order in).  The
    impression log is a Latin-square rotation (item = (query +
    13*pos) % 50) so every item visits every SERP position —
    result-randomization identification, no relevance confound;
    the click model is deterministic-integer (item-intrinsic
    relevance gate x position-decaying examination slot) so both
    engines reproduce it exactly.  bias@k = ctr@k / ctr@1 is
    emitted as ONE double division of exact BIGINT cross-products
    (clicks_k*impr_1) / (impr_k*clicks_1) — bitwise across engines,
    and pos 1 is exactly 1.0.  Shape: one groupBy over 10 positions
    (map-side combinable), the rank-1 row broadcast-crossed back —
    no window, no skew; scales as one pass over the log."""
    e = _t(spark, sf_dir, "events").select("event_id")
    imp = e.select(
        (F.col("event_id") % 10 + 1).alias("serp_pos"),
        ((F.expr("event_id div 10") + (F.col("event_id") % 10 + 1) * 13) % 50
         ).alias("item"),
        "event_id",
    )
    lab = imp.select(
        "serp_pos",
        F.when(
            ((F.col("item") * 7919) % 100 >= 40)
            & ((F.col("event_id") * F.lit(2654435761)) % 97
               < 97 - 9 * (F.col("serp_pos") - 1)),
            1,
        ).otherwise(0).alias("clicked"),
    )
    st = lab.groupBy("serp_pos").agg(
        F.count("*").cast("long").alias("n_impr"),
        F.sum("clicked").cast("long").alias("n_clicks"),
    )
    p1 = st.filter(F.col("serp_pos") == 1).select(
        F.col("n_impr").alias("i1"), F.col("n_clicks").alias("c1"))
    return st.crossJoin(F.broadcast(p1)).select(
        "serp_pos", "n_impr", "n_clicks",
        (F.col("n_clicks").cast("double") / F.col("n_impr").cast("double")
         ).alias("ctr"),
        ((F.col("n_clicks") * F.col("i1")).cast("double")
         / (F.col("n_impr") * F.col("c1")).cast("double")
         ).alias("bias_vs_pos1"),
    )


# --- exact latency percentiles via bounded-domain histogram (q374) --------------


@query(
    "q374_latency_percentiles",
    """WITH req AS (SELECT event_type AS endpoint,
                (event_id * 48271) % 1000
                + CASE WHEN event_id % 20 = 0
                       THEN (event_id * 69621) % 9000 ELSE 0 END AS lat
              FROM events),
       hist AS (SELECT endpoint, lat, CAST(count(*) AS BIGINT) AS cnt
                FROM req GROUP BY endpoint, lat),
       cum AS (SELECT endpoint, lat, cnt,
                      CAST(sum(cnt) OVER (PARTITION BY endpoint ORDER BY lat
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           AS BIGINT) AS c,
                      CAST(sum(cnt) OVER (PARTITION BY endpoint)
                           AS BIGINT) AS n
               FROM hist)
       SELECT endpoint, CAST(max(n) AS BIGINT) AS n_requests,
              CAST(min(CASE WHEN 1000*c >= 500*n THEN lat END) AS BIGINT) AS p50,
              CAST(min(CASE WHEN 1000*c >= 900*n THEN lat END) AS BIGINT) AS p90,
              CAST(min(CASE WHEN 1000*c >= 990*n THEN lat END) AS BIGINT) AS p99,
              CAST(min(CASE WHEN 1000*c >= 999*n THEN lat END) AS BIGINT)
                AS p999
       FROM cum GROUP BY endpoint""",
)
def q374(spark, sf_dir):
    """EXACT p50/p90/p99/p999 latency per endpoint WITHOUT sorting
    the stream — the SLO numbers, and the reason they are usually
    approximated (percentile_approx / t-digest): a naive exact
    percentile sorts the corpus.  When the value domain is bounded
    (integer milliseconds, here 0..9999 with a 5% heavy tail), the
    exact answer is a HISTOGRAM problem: groupBy (endpoint, lat)
    counts — map-side combinable, output bounded by |endpoints| x
    |domain|, NOT corpus size — then a cumulative window over the
    bounded histogram and nearest-rank selection min(lat : cum >=
    ceil(q*n)) written as the integer cross-multiplication
    1000*cum >= k*n (no ceil, no float, per house style).  All
    output columns are BIGINT — nothing to round, bitwise by
    construction.  The window partition is <= 10^4 rows per
    endpoint at ANY corpus size: this is the exact-percentile plan
    that still works at 100 TB, vs the q294 log-binned approximate
    quantiles when the domain is unbounded."""
    e = _t(spark, sf_dir, "events").select("event_id", "event_type")
    req = e.select(
        F.col("event_type").alias("endpoint"),
        ((F.col("event_id") * 48271) % 1000
         + F.when(F.col("event_id") % 20 == 0,
                  (F.col("event_id") * 69621) % 9000).otherwise(0)
         ).alias("lat"),
    )
    hist = req.groupBy("endpoint", "lat").agg(
        F.count("*").cast("long").alias("cnt"))
    wcum = (Window.partitionBy("endpoint").orderBy("lat")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wall = Window.partitionBy("endpoint")
    cum = hist.select(
        "endpoint", "lat",
        F.sum("cnt").over(wcum).alias("c"),
        F.sum("cnt").over(wall).alias("n"),
    )
    def pick(k, name):
        return F.min(
            F.when(1000 * F.col("c") >= k * F.col("n"), F.col("lat"))
        ).cast("long").alias(name)
    return cum.groupBy("endpoint").agg(
        F.max("n").cast("long").alias("n_requests"),
        pick(500, "p50"), pick(900, "p90"), pick(990, "p99"),
        pick(999, "p999"),
    )


# --- snapshot GC / retention planning (q375) -------------------------------------


@query(
    "q375_snapshot_gc",
    """WITH files AS (SELECT event_id AS file_id,
                event_id % 16 AS part,
                1000 + (event_id * 127) % 9000 AS bytes,
                (event_id * 31) % 20 AS created,
                CASE WHEN event_id % 3 = 0 THEN NULL
                     ELSE (event_id * 31) % 20 + 1 + (event_id * 7) % 6
                     END AS deleted_at
              FROM events),
       cls AS (SELECT part, bytes,
                      CASE WHEN deleted_at IS NULL OR deleted_at > 19
                           THEN 1 ELSE 0 END AS live_head,
                      CASE WHEN deleted_at IS NOT NULL
                            AND deleted_at <= 19 AND deleted_at > 17
                           THEN 1 ELSE 0 END AS pinned,
                      CASE WHEN deleted_at IS NOT NULL AND deleted_at <= 17
                           THEN 1 ELSE 0 END AS reclaim
               FROM files)
       SELECT part, CAST(count(*) AS BIGINT) AS n_files,
              CAST(sum(live_head) AS BIGINT) AS live_head,
              CAST(sum(pinned) AS BIGINT) AS pinned_by_retention,
              CAST(sum(reclaim) AS BIGINT) AS reclaim_files,
              CAST(sum(reclaim * bytes) AS BIGINT) AS reclaim_bytes
       FROM cls GROUP BY part""",
)
def q375(spark, sf_dir):
    """Snapshot garbage collection with a time-travel retention
    window — the expire-snapshots planning query under every
    table-format maintenance job (Iceberg expireSnapshots /
    RemoveOrphanFiles; this repo's own plans/manifest.py snapshots
    create exactly this file lifecycle).  Synthetic file ledger:
    created/deleted snapshot ids derived from event keys; head = 19,
    retained = {17,18,19}.  A file is reclaimable iff no retained
    snapshot can see it (deleted_at <= min(retained)); files deleted
    before head but after min(retained) are PINNED — the bytes you
    would free by tightening retention, the number the storage-cost
    conversation actually needs, split out per partition next to the
    reclaimable bytes.  Pure per-row integer classification + one
    partition-keyed groupBy (map-side combinable) — one pass over
    the manifest at any scale, no join at all."""
    e = _t(spark, sf_dir, "events").select("event_id")
    files = e.select(
        (F.col("event_id") % 16).alias("part"),
        (1000 + (F.col("event_id") * 127) % 9000).alias("bytes"),
        F.when(F.col("event_id") % 3 == 0, F.lit(None).cast("long"))
        .otherwise((F.col("event_id") * 31) % 20 + 1 + (F.col("event_id") * 7) % 6)
        .alias("deleted_at"),
    )
    cls = files.select(
        "part", "bytes",
        F.when(F.col("deleted_at").isNull() | (F.col("deleted_at") > 19), 1)
        .otherwise(0).alias("live_head"),
        F.when(F.col("deleted_at").isNotNull()
               & (F.col("deleted_at") <= 19) & (F.col("deleted_at") > 17), 1)
        .otherwise(0).alias("pinned"),
        F.when(F.col("deleted_at").isNotNull() & (F.col("deleted_at") <= 17), 1)
        .otherwise(0).alias("reclaim"),
    )
    return cls.groupBy("part").agg(
        F.count("*").cast("long").alias("n_files"),
        F.sum("live_head").cast("long").alias("live_head"),
        F.sum("pinned").cast("long").alias("pinned_by_retention"),
        F.sum(F.col("reclaim") * F.col("bytes")).cast("long").alias("rb"),
        F.sum("reclaim").cast("long").alias("reclaim_files"),
    ).select("part", "n_files", "live_head", "pinned_by_retention",
             "reclaim_files", F.col("rb").alias("reclaim_bytes"))


# --- adaptive quadtree leaf assignment (q376) ------------------------------------


@query(
    "q376_quadtree_build",
    """WITH pts AS (SELECT event_id,
                CASE WHEN event_id % 10 < 3
                     THEN 1024 + (event_id * 13) % 64
                     ELSE (event_id * 48271) % 4096 END AS x,
                CASE WHEN event_id % 10 < 3
                     THEN 2048 + (event_id * 17) % 64
                     ELSE (event_id * 69621) % 4096 END AS y
              FROM events),
       lev AS (SELECT event_id, x, y, d,
                      (x // (1 << (12 - d))) * 64 + (y // (1 << (12 - d)))
                        AS cell
               FROM pts CROSS JOIN (SELECT unnest(range(7)) AS d)),
       cnt AS (SELECT d, cell, count(*) AS c FROM lev GROUP BY d, cell),
       leafd AS (SELECT event_id, x, y,
                        coalesce(min(CASE WHEN c <= 64 THEN d END), 6) AS ld
                 FROM lev JOIN cnt USING (d, cell)
                 GROUP BY event_id, x, y),
       occ AS (SELECT ld,
                      (x // (1 << (12 - ld))) * 64 + (y // (1 << (12 - ld)))
                        AS cell,
                      count(*) AS pts
               FROM leafd GROUP BY 1, 2)
       SELECT CAST(ld AS BIGINT) AS depth,
              CAST(count(*) AS BIGINT) AS n_cells,
              CAST(sum(pts) AS BIGINT) AS n_points,
              CAST(min(pts) AS BIGINT) AS min_cell_pts,
              CAST(max(pts) AS BIGINT) AS max_cell_pts
       FROM occ GROUP BY ld""",
)
def q376(spark, sf_dir):
    """Adaptive quadtree index build — leaf assignment per point
    where a cell splits iff it holds > 64 points, max depth 6 over a
    4096x4096 grid: the capacity-driven spatial index whose leaf
    histogram (cells / points / occupancy per depth) is the index
    manifest a spatial-partitioning sink writes.  Quadtree cells
    NEST, so two points sharing a depth-d cell share every ancestor
    — leaf depth is a pure function of the point's 7-cell ancestry
    and the whole build is THREE bounded aggregations, no recursion:
    explode each point to its 7 (depth, cell) keys, count per key
    (output bounded by sum 4^d = 5461 cells, broadcastable — never
    corpus-sized), take min depth whose count <= capacity (coalesce
    to the depth cap — the hotspot-overflow leaf), re-derive the
    leaf cell arithmetically.  A 64x64 hotspot holding 30% of points
    pins the overflow path; the uniform background populates the
    shallow depths.  At 100 TB the count table is still 5461 rows —
    the iterative split-only-overfull loop the single-node reference
    would run is unnecessary in the declarative form."""
    e = _t(spark, sf_dir, "events").select("event_id")
    pts = e.select(
        "event_id",
        F.when(F.col("event_id") % 10 < 3,
               1024 + (F.col("event_id") * 13) % 64)
        .otherwise((F.col("event_id") * 48271) % 4096).alias("x"),
        F.when(F.col("event_id") % 10 < 3,
               2048 + (F.col("event_id") * 17) % 64)
        .otherwise((F.col("event_id") * 69621) % 4096).alias("y"),
    )
    lev = pts.withColumn("d", F.explode(F.sequence(F.lit(0), F.lit(6)))) \
        .withColumn(
            "cell",
            F.expr("(x div shiftleft(1, 12 - d)) * 64"
                   " + (y div shiftleft(1, 12 - d))"))
    cnt = lev.groupBy("d", "cell").agg(F.count("*").alias("c"))
    leafd = (
        lev.join(F.broadcast(cnt), ["d", "cell"])
        .groupBy("event_id", "x", "y")
        .agg(F.coalesce(
            F.min(F.when(F.col("c") <= 64, F.col("d"))), F.lit(6)).alias("ld"))
    )
    occ = leafd.select(
        "ld",
        F.expr("(x div shiftleft(1, 12 - ld)) * 64"
               " + (y div shiftleft(1, 12 - ld))").alias("cell"),
    ).groupBy("ld", "cell").agg(F.count("*").alias("pts"))
    return occ.groupBy("ld").agg(
        F.count("*").cast("long").alias("n_cells"),
        F.sum("pts").cast("long").alias("n_points"),
        F.min("pts").cast("long").alias("min_cell_pts"),
        F.max("pts").cast("long").alias("max_cell_pts"),
    ).select(F.col("ld").cast("long").alias("depth"), "n_cells", "n_points",
             "min_cell_pts", "max_cell_pts")


# --- language-diversity Gini / HHI per source (q377) -----------------------------


@query(
    "q377_language_gini",
    """WITH lc AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS c
              FROM documents GROUP BY source, lang),
       st AS (SELECT source, CAST(count(*) AS BIGINT) AS n_langs,
                     CAST(sum(c) AS BIGINT) AS n_docs,
                     CAST(sum(c * c) AS BIGINT) AS sum_c2
              FROM lc GROUP BY source),
       pr AS (SELECT a.source, CAST(sum(abs(a.c - b.c)) AS BIGINT) AS num
              FROM lc a JOIN lc b ON a.source = b.source
              GROUP BY a.source)
       SELECT source, n_docs, n_langs,
              CAST(num AS DOUBLE)
                / CAST(2 * n_langs * n_docs AS DOUBLE) AS gini,
              CAST(sum_c2 AS DOUBLE)
                / CAST(n_docs * n_docs AS DOUBLE) AS hhi
       FROM st JOIN pr USING (source)""",
)
def q377(spark, sf_dir):
    """Language-diversity concentration per source — the corpus-mix
    governance numbers next to q348's datasheet: Gini coefficient
    over each source's language distribution (G = Σij|ci-cj| /
    (2·k·Σc), the mean-absolute-difference form — 0 = perfectly
    balanced languages, →1 = one language dominates) and the
    Herfindahl-Hirschman index (Σci²/total² — the acquisition-review
    number).  Both emitted as ONE double division of exact BIGINT
    products.  The pairwise |ci-cj| sum joins the per-(source,lang)
    count table to itself on source: the LANGUAGE LEXICON bounds the
    join (k² pairs per source for k languages, k ≤ dozens), never
    the corpus — the q19-lesson df-cap logic applied to a diversity
    statistic.  One groupBy over the corpus feeds everything."""
    docs = _t(spark, sf_dir, "documents")
    lc = docs.groupBy("source", "lang").agg(
        F.count("*").cast("long").alias("c"))
    st = lc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_langs"),
        F.sum("c").cast("long").alias("n_docs"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sum_c2"),
    )
    lc2 = lc.select(F.col("source").alias("source"),
                    F.col("c").alias("c2"))
    pr = lc.join(lc2, "source").groupBy("source").agg(
        F.sum(F.abs(F.col("c") - F.col("c2"))).cast("long").alias("num"))
    return st.join(pr, "source").select(
        "source", "n_docs", "n_langs",
        (F.col("num").cast("double")
         / (2 * F.col("n_langs") * F.col("n_docs")).cast("double")
         ).alias("gini"),
        (F.col("sum_c2").cast("double")
         / (F.col("n_docs") * F.col("n_docs")).cast("double")).alias("hhi"),
    )


# --- T5 span-corruption planning (q378) ------------------------------------------


@query(
    "q378_span_corruption_plan",
    """WITH d AS (SELECT doc_id,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS L
              FROM documents),
       el AS (SELECT doc_id, L,
                     CASE WHEN L // 20 >= 64
                          THEN CAST(error('q378: spans outgrew range(64)')
                                    AS BIGINT)
                          ELSE L // 20 END AS s,
                     CAST(length(bin(L)) AS BIGINT) AS len_bucket
              FROM d WHERE L >= 20),
       g AS (SELECT el.len_bucket,
                    ((j.j * L) // s) - (((j.j - 1) * L) // s) AS gap
             FROM el JOIN (SELECT unnest(range(64)) AS j) j
               ON j.j >= 1 AND j.j < s),
       agg AS (SELECT len_bucket, CAST(count(*) AS BIGINT) AS n_docs,
                      CAST(sum(L) AS BIGINT) AS raw_tokens,
                      CAST(sum(3 * s) AS BIGINT) AS corrupted_tokens,
                      CAST(sum(L - 2 * s) AS BIGINT) AS input_tokens,
                      CAST(sum(4 * s + 1) AS BIGINT) AS target_tokens
               FROM el GROUP BY len_bucket),
       gg AS (SELECT len_bucket, CAST(min(gap) AS BIGINT) AS mg
              FROM g GROUP BY len_bucket)
       SELECT agg.len_bucket, n_docs, raw_tokens, corrupted_tokens,
              input_tokens, target_tokens,
              coalesce(gg.mg, -1) AS min_start_gap
       FROM agg LEFT JOIN gg USING (len_bucket)""",
)
def q378(spark, sf_dir):
    """T5-style span-corruption pretraining plan — the sequence-
    length accounting that sizes the encoder/decoder batches BEFORE
    tokenizing a single example: corruption rate 15%, mean span 3 =>
    s = L div 20 spans of 3 tokens; encoder input length L - 2s
    (each span collapses to one sentinel), decoder target 4s + 1
    (spans + sentinels + EOS).  Per power-of-two length bucket (the
    shared bin()-length idiom): docs, raw/corrupted/input/target
    token totals — the packing planner's (q93/q315) demand curve.
    Span starts are the deterministic lattice (j·L) div s, and the
    emitted min_start_gap PROVES non-overlap (gap >= 20 > span
    length 3 by floor-sequence arithmetic) instead of assuming it —
    the q368 prove-don't-assume pattern; gaps come from pure
    arithmetic on the exploded span index, s <= L/20 rows per doc,
    no join, no window; the oracle's fixed range(64) carries the
    loud error() guard against fixture outgrowth."""
    docs = _t(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("L"))
    el = d.filter(F.col("L") >= 20).select(
        "doc_id", "L",
        F.expr("L div 20").alias("s"),
        F.expr("CAST(length(bin(L)) AS BIGINT)").alias("len_bucket"),
    )
    g = (
        el.filter(F.col("s") >= 2)
        .withColumn("j", F.explode(F.sequence(F.lit(1), F.col("s") - 1)))
        .select("len_bucket",
                F.expr("(j * L) div s - ((j - 1) * L) div s").alias("gap"))
    )
    gg = g.groupBy("len_bucket").agg(
        F.min("gap").cast("long").alias("mg"))
    agg = el.groupBy("len_bucket").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("L").cast("long").alias("raw_tokens"),
        F.sum(3 * F.col("s")).cast("long").alias("corrupted_tokens"),
        F.sum(F.col("L") - 2 * F.col("s")).cast("long").alias("input_tokens"),
        F.sum(4 * F.col("s") + 1).cast("long").alias("target_tokens"),
    )
    return agg.join(gg, "len_bucket", "left").select(
        "len_bucket", "n_docs", "raw_tokens", "corrupted_tokens",
        "input_tokens", "target_tokens",
        F.coalesce(F.col("mg"), F.lit(-1)).alias("min_start_gap"),
    )


# --- exact AUC via bounded score histogram (q379) --------------------------------


@query(
    "q379_exact_auc",
    """WITH scored AS (SELECT
                (n_chars * 7 + doc_id * 13) % 1000 AS score,
                CASE WHEN (doc_id * 2654435761) % 1000
                          < 300 + ((n_chars * 7 + doc_id * 13) % 1000) // 2
                     THEN 1 ELSE 0 END AS label
              FROM documents),
       hist AS (SELECT score,
                       CAST(sum(label) AS BIGINT) AS n_pos,
                       CAST(sum(1 - label) AS BIGINT) AS n_neg
                FROM scored GROUP BY score),
       cum AS (SELECT score, n_pos, n_neg,
                      CAST(coalesce(sum(n_neg) OVER (ORDER BY score
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) AS BIGINT) AS neg_below
               FROM hist)
       SELECT CAST(sum(n_pos) AS BIGINT) AS n_pos,
              CAST(sum(n_neg) AS BIGINT) AS n_neg,
              CAST(sum(n_pos * neg_below) AS BIGINT) AS concordant_pairs,
              CAST(sum(n_pos * n_neg) AS BIGINT) AS tied_pairs,
              CAST(2 * sum(n_pos * neg_below) + sum(n_pos * n_neg) AS DOUBLE)
                / CAST(2 * sum(n_pos) * sum(n_neg) AS DOUBLE) AS auc
       FROM cum""",
)
def q379(spark, sf_dir):
    """EXACT ROC-AUC without sorting the corpus — the classifier-
    quality number behind every filtering-model gate (q194/q320),
    usually approximated by sampling because the naive Mann-Whitney
    rank-sum sorts all scores.  With a bounded integer score domain
    (0..999 here) AUC is a HISTOGRAM problem, same insight as q374:
    AUC = P(score_pos > score_neg) + P(tie)/2 =
    (2*Σ_s pos_s·negBelow_s + Σ_s pos_s·neg_s) / (2·P·N) — one
    groupBy over the corpus (map-side combinable), one cumulative
    window over the <= 1000-row histogram (bounded by the SCORE
    DOMAIN, never the corpus — the single-partition window is over
    1000 rows at 100 TB too), every pair count an exact BIGINT and
    the AUC ONE double division of them.  The label model is
    deterministic-integer with P(label) increasing in score, so the
    fixture's AUC is meaningfully above 0.5 and the tie-correction
    term is exercised at every score."""
    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        ((F.col("n_chars") * 7 + F.col("doc_id") * 13) % 1000).alias("score"),
        F.when(
            (F.col("doc_id") * F.lit(2654435761)) % 1000
            < 300 + F.expr("((n_chars * 7 + doc_id * 13) % 1000) div 2"),
            1,
        ).otherwise(0).alias("label"),
    )
    hist = scored.groupBy("score").agg(
        F.sum("label").cast("long").alias("n_pos"),
        F.sum(1 - F.col("label")).cast("long").alias("n_neg"),
    )
    wb = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    cum = hist.select(
        "n_pos", "n_neg",
        F.coalesce(F.sum("n_neg").over(wb), F.lit(0)).alias("neg_below"),
    )
    return cum.agg(
        F.sum("n_pos").cast("long").alias("n_pos"),
        F.sum("n_neg").cast("long").alias("n_neg"),
        F.sum(F.col("n_pos") * F.col("neg_below")).cast("long")
        .alias("concordant_pairs"),
        F.sum(F.col("n_pos") * F.col("n_neg")).cast("long")
        .alias("tied_pairs"),
        ((2 * F.sum(F.col("n_pos") * F.col("neg_below"))
          + F.sum(F.col("n_pos") * F.col("n_neg"))).cast("double")
         / (2 * F.sum("n_pos") * F.sum("n_neg")).cast("double")).alias("auc"),
    )


# --- shuffle-sharding blast-radius audit (q380) -----------------------------------


@query(
    "q380_shuffle_sharding",
    """WITH sh AS (SELECT unnest(range(16)) AS s),
       pairs AS (SELECT a.s AS i, b.s AS j FROM sh a JOIN sh b ON a.s < b.s),
       ord AS (SELECT a.i, a.j, CAST(count(b.i) AS BIGINT) AS ordn
               FROM pairs a LEFT JOIN pairs b
                 ON b.i < a.i OR (b.i = a.i AND b.j < a.j)
               GROUP BY a.i, a.j),
       cust AS (SELECT DISTINCT user_id FROM events),
       asg AS (SELECT user_id,
                      ((user_id * 2654435761) % 1000003) % 120 AS ordn
               FROM cust),
       cc AS (SELECT o.i, o.j, o.ordn, CAST(count(*) AS BIGINT) AS c
              FROM asg JOIN ord o USING (ordn) GROUP BY o.i, o.j, o.ordn),
       tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                      CAST(count(*) AS BIGINT) AS n_asg,
                      CAST(sum(c * (c - 1) // 2) AS BIGINT) AS full_blast,
                      CAST(max(c) AS BIGINT) AS max_load,
                      CAST(min(c) AS BIGINT) AS min_load
               FROM cc),
       part AS (SELECT CAST(coalesce(sum(a.c * b.c), 0) AS BIGINT) AS partial
                FROM cc a JOIN cc b
                  ON a.ordn < b.ordn
                 AND (a.i = b.i OR a.i = b.j OR a.j = b.i OR a.j = b.j))
       SELECT n AS n_customers, n_asg AS n_assignments,
              full_blast AS full_blast_pairs,
              partial AS partial_blast_pairs,
              n * (n - 1) // 2 - full_blast - partial AS isolated_pairs,
              n * (n - 1) // 2 AS total_pairs,
              max_load, min_load
       FROM tot, part""",
)
def q380(spark, sf_dir):
    """Shuffle-sharding blast-radius audit — the isolation proof
    behind cellular architectures (each customer gets 2 of 16
    shards; a poisoned customer can only take down customers
    sharing BOTH shards): classify every customer pair as
    full-blast (same 2-shard assignment: C(c,2) within each
    assignment), partial (assignments sharing exactly one shard —
    two distinct 2-subsets share at most one element, so >=1 IS
    exactly 1), or isolated, and PROVE the classification partitions
    all C(N,2) pairs by emitting total_pairs alongside.  The
    combinatorics never touch customer pairs: the C(16,2) = 120
    assignment table is built relationally (triangular count-of-
    smaller ordinal — deterministic in both engines), customers
    hash-join to it (broadcast, one corpus pass), and the pair
    classes are exact integer arithmetic over the 120-row
    aggregate's self-join (120^2 bounded).  c*(c-1) is always even
    so the // 2 is exact."""
    e = _t(spark, sf_dir, "events")
    sh = spark.range(16).select(F.col("id").alias("s"))
    pairs = sh.crossJoin(sh.select(F.col("s").alias("s2"))) \
        .filter(F.col("s") < F.col("s2")) \
        .select(F.col("s").alias("i"), F.col("s2").alias("j"))
    p2 = pairs.select(F.col("i").alias("i2"), F.col("j").alias("j2"))
    ordt = (
        pairs.join(
            p2,
            (F.col("i2") < F.col("i"))
            | ((F.col("i2") == F.col("i")) & (F.col("j2") < F.col("j"))),
            "left",
        )
        .groupBy("i", "j")
        .agg(F.count("i2").cast("long").alias("ordn"))
    )
    # mix through a prime modulus first: 2654435761 = 1 (mod 120), so a
    # direct % 120 of dense user ids yields CONSECUTIVE ordinals — all
    # lexicographic pairs (0, j), every assignment sharing shard 0.
    asg = e.select("user_id").distinct().select(
        (((F.col("user_id") * F.lit(2654435761)) % 1000003) % 120)
        .alias("ordn"))
    cc = asg.join(F.broadcast(ordt), "ordn").groupBy("i", "j", "ordn").agg(
        F.count("*").cast("long").alias("c"))
    tot = cc.agg(
        F.sum("c").cast("long").alias("n"),
        F.count("*").cast("long").alias("n_asg"),
        F.sum(F.expr("c * (c - 1) div 2")).cast("long").alias("full_blast"),
        F.max("c").cast("long").alias("max_load"),
        F.min("c").cast("long").alias("min_load"),
    )
    cc2 = cc.select(F.col("ordn").alias("ordn2"), F.col("i").alias("i2"),
                    F.col("j").alias("j2"), F.col("c").alias("c2"))
    part = (
        cc.join(
            cc2,
            (F.col("ordn") < F.col("ordn2"))
            & ((F.col("i") == F.col("i2")) | (F.col("i") == F.col("j2"))
               | (F.col("j") == F.col("i2")) | (F.col("j") == F.col("j2"))),
        )
        .agg(F.coalesce(F.sum(F.col("c") * F.col("c2")), F.lit(0))
             .cast("long").alias("partial"))
    )
    return tot.crossJoin(part).select(
        F.col("n").alias("n_customers"),
        F.col("n_asg").alias("n_assignments"),
        F.col("full_blast").alias("full_blast_pairs"),
        F.col("partial").alias("partial_blast_pairs"),
        (F.expr("n * (n - 1) div 2") - F.col("full_blast") - F.col("partial")
         ).alias("isolated_pairs"),
        F.expr("n * (n - 1) div 2").alias("total_pairs"),
        "max_load", "min_load",
    )


# --- exact expected calibration error (q381) --------------------------------------


@query(
    "q381_calibration_ece",
    """WITH scored AS (SELECT
                (doc_id * 48271 + n_chars * 31) % 1000 AS conf,
                CASE WHEN (doc_id * 2654435761) % 1000
                          < ((doc_id * 48271 + n_chars * 31) % 1000) * 8 // 10
                            + 100
                     THEN 1 ELSE 0 END AS outcome
              FROM documents),
       b AS (SELECT conf // 100 AS bucket,
                    CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(outcome) AS BIGINT) AS correct,
                    CAST(sum(conf) AS BIGINT) AS conf_sum
             FROM scored GROUP BY conf // 100),
       g AS (SELECT bucket, n, correct, conf_sum,
                    abs(1000 * correct - conf_sum) AS gap_num
             FROM b),
       tot AS (SELECT CAST(sum(gap_num) AS BIGINT) AS gap_total,
                      CAST(sum(n) AS BIGINT) AS n_total
               FROM g)
       SELECT CAST(bucket AS BIGINT) AS bucket, n, correct, conf_sum,
              CAST(correct AS DOUBLE) / CAST(n AS DOUBLE) AS accuracy,
              CAST(conf_sum AS DOUBLE) / CAST(1000 * n AS DOUBLE)
                AS mean_conf,
              CAST(gap_num AS BIGINT) AS gap_num,
              CAST(gap_total AS DOUBLE) / CAST(1000 * n_total AS DOUBLE)
                AS ece
       FROM g, tot""",
)
def q381(spark, sf_dir):
    """Expected calibration error computed EXACTLY — the reliability
    number behind every confidence-thresholded filter (q194's gate
    trusts the classifier's probabilities; ECE says whether it
    should): with per-mille integer confidences, the per-bucket
    |accuracy - mean confidence| gap is |1000·correct - Σconf| /
    (1000·n) — an exact BIGINT numerator — and ECE = Σ_b gap_num /
    (1000·N) needs ONE double division total; accuracy and mean_conf
    are each one division too, so every emitted float is a single
    IEEE op on exact integers.  The outcome model draws with true
    probability 0.8·conf + 100 per-mille: overconfident above
    conf = 500, underconfident below — both failure directions
    exercised, and the |.| is load-bearing.  Shape: one map-side-
    combinable groupBy into 10 buckets, the scalar totals cross-
    joined back (1 row) — one corpus pass, bounded everything."""
    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        ((F.col("doc_id") * 48271 + F.col("n_chars") * 31) % 1000)
        .alias("conf"),
        F.when(
            (F.col("doc_id") * F.lit(2654435761)) % 1000
            < F.expr("((doc_id * 48271 + n_chars * 31) % 1000) * 8 div 10")
            + 100,
            1,
        ).otherwise(0).alias("outcome"),
    )
    b = scored.groupBy(F.expr("conf div 100").alias("bucket")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("outcome").cast("long").alias("correct"),
        F.sum("conf").cast("long").alias("conf_sum"),
    )
    g = b.withColumn(
        "gap_num", F.abs(1000 * F.col("correct") - F.col("conf_sum")))
    tot = g.agg(F.sum("gap_num").cast("long").alias("gap_total"),
                F.sum("n").cast("long").alias("n_total"))
    return g.crossJoin(F.broadcast(tot)).select(
        F.col("bucket").cast("long").alias("bucket"), "n", "correct",
        "conf_sum",
        (F.col("correct").cast("double") / F.col("n").cast("double"))
        .alias("accuracy"),
        (F.col("conf_sum").cast("double")
         / (1000 * F.col("n")).cast("double")).alias("mean_conf"),
        F.col("gap_num").cast("long").alias("gap_num"),
        (F.col("gap_total").cast("double")
         / (1000 * F.col("n_total")).cast("double")).alias("ece"),
    )


# --- interval-union coverage per user (q382) ---------------------------------------


@query(
    "q382_interval_coverage",
    """WITH iv AS (SELECT user_id, event_id,
                CAST(floor(epoch(ts)) AS BIGINT) AS s,
                CAST(floor(epoch(ts)) AS BIGINT)
                  + 60 + (event_id % 10) * 90 AS e
              FROM events),
       mk AS (SELECT user_id, event_id, s, e,
                     CASE WHEN s > coalesce(max(e) OVER (
                              PARTITION BY user_id ORDER BY s, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING), -1)
                          THEN 1 ELSE 0 END AS new_island
              FROM iv),
       isl AS (SELECT user_id, s, e,
                      CAST(sum(new_island) OVER (
                           PARTITION BY user_id ORDER BY s, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS BIGINT) AS island
               FROM mk),
       per AS (SELECT user_id, island,
                      CAST(max(e) - min(s) AS BIGINT) AS covered
               FROM isl GROUP BY user_id, island)
       SELECT user_id,
              CAST(count(*) AS BIGINT) AS n_islands,
              CAST(sum(covered) AS BIGINT) AS covered_seconds,
              CAST(max(covered) AS BIGINT) AS longest_island
       FROM per GROUP BY user_id""",
)
def q382(spark, sf_dir):
    """Interval-union coverage per user — the gaps-and-islands sweep
    (total ONLINE time from overlapping session intervals; double-
    counting overlaps is THE classic uptime-accounting bug): each
    event opens an interval [epoch, epoch + 60 + (event_id%10)*90s],
    an interval starts a NEW island iff its start exceeds the
    running max of all previous ends (one cumulative-max window),
    islands are numbered by the running sum of the flags (one
    cumulative-sum window over the same order), and each island
    contributes max(end) - min(start) exactly once.  Epoch seconds
    via the q317 cross-engine contract (CAST(floor(epoch)) mirrors
    unix_timestamp) — all-integer output, nothing to round.  Both
    windows shard by user_id (the house shuffle-key family): the
    sweep is linear per user and the merge is one pass — the
    declarative form of the sort-and-sweep every interval-union
    implementation runs."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_id",
        F.unix_timestamp("ts").alias("s"),
        (F.unix_timestamp("ts") + 60 + (F.col("event_id") % 10) * 90)
        .alias("e"),
    )
    wprev = (Window.partitionBy("user_id").orderBy("s", "event_id")
             .rowsBetween(Window.unboundedPreceding, -1))
    mk = e.select(
        "user_id", "event_id", "s", "e",
        F.when(F.col("s") > F.coalesce(F.max("e").over(wprev), F.lit(-1)), 1)
        .otherwise(0).alias("new_island"),
    )
    wcum = (Window.partitionBy("user_id").orderBy("s", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    isl = mk.select(
        "user_id", "s", "e",
        F.sum("new_island").over(wcum).cast("long").alias("island"))
    per = isl.groupBy("user_id", "island").agg(
        (F.max("e") - F.min("s")).cast("long").alias("covered"))
    return per.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_islands"),
        F.sum("covered").cast("long").alias("covered_seconds"),
        F.max("covered").cast("long").alias("longest_island"),
    )


# --- species-richness estimators (q383) ---------------------------------------------


@query(
    "q383_chao1_richness",
    """WITH obs AS (SELECT CASE WHEN doc_id % 16 < 10
                                THEN doc_id * 4 + 1
                                WHEN doc_id % 16 < 14
                                THEN (doc_id // 16) * 4 + 2
                                ELSE (doc_id // 16) * 4 + 3
                           END AS species
              FROM documents),
       fof AS (SELECT species, CAST(count(*) AS BIGINT) AS f
               FROM obs GROUP BY species),
       s AS (SELECT CAST(sum(f) AS BIGINT) AS n_obs,
                    CAST(count(*) AS BIGINT) AS n_species,
                    CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS f1,
                    CAST(sum(CASE WHEN f = 2 THEN 1 ELSE 0 END)
                      AS BIGINT) AS f2
             FROM fof)
       SELECT n_obs, n_species, f1, f2,
              CAST(n_species * 2 * (f2 + 1) + f1 * (f1 - 1) AS DOUBLE)
                / CAST(2 * (f2 + 1) AS DOUBLE) AS chao1,
              CAST(f1 AS DOUBLE) / CAST(n_obs AS DOUBLE) AS missing_mass,
              CAST(n_obs - f1 AS DOUBLE) / CAST(n_obs AS DOUBLE)
                AS gt_coverage
       FROM s""",
)
def q383(spark, sf_dir):
    """Chao1 species-richness + Good-Turing missing mass — the
    how-much-vocabulary-have-we-NOT-seen estimators that decide
    whether crawling more of a source still yields new entities
    (Chao1's unseen-species term f1^2/(2 f2) and Turing's unseen
    probability mass f1/N both need only the frequency-of-frequencies
    head, so the whole estimate is two counts over the bounded
    species table).  Every emitted float is ONE IEEE division of
    exact BIGINTs: chao1 = (2 V (f2+1) + f1 (f1-1)) / (2 (f2+1))
    folds the bias-corrected form into a single rational.  The
    mention model assigns per 16-doc block: 10 singleton species
    (residue 1 mod 4), one 4-observation species (residue 2), one
    2-observation species (residue 3) — f1, f2, and a deeper tail all
    populated at every SF, and the three classes can never collide.
    Shape: one map-side-combinable groupBy to the species table, one
    aggregation over it, 1 row out — two passes of pure counting at
    any corpus size."""
    docs = _t(spark, sf_dir, "documents")
    obs = docs.select(
        F.when(F.col("doc_id") % 16 < 10, F.col("doc_id") * 4 + 1)
        .when(F.col("doc_id") % 16 < 14,
              F.expr("(doc_id div 16) * 4 + 2"))
        .otherwise(F.expr("(doc_id div 16) * 4 + 3"))
        .alias("species")
    )
    fof = obs.groupBy("species").agg(F.count("*").cast("long").alias("f"))
    s = fof.agg(
        F.sum("f").cast("long").alias("n_obs"),
        F.count("*").cast("long").alias("n_species"),
        F.sum(F.when(F.col("f") == 1, 1).otherwise(0)).cast("long")
        .alias("f1"),
        F.sum(F.when(F.col("f") == 2, 1).otherwise(0)).cast("long")
        .alias("f2"),
    )
    return s.select(
        "n_obs", "n_species", "f1", "f2",
        ((F.col("n_species") * 2 * (F.col("f2") + 1)
          + F.col("f1") * (F.col("f1") - 1)).cast("double")
         / (2 * (F.col("f2") + 1)).cast("double")).alias("chao1"),
        (F.col("f1").cast("double") / F.col("n_obs").cast("double"))
        .alias("missing_mass"),
        ((F.col("n_obs") - F.col("f1")).cast("double")
         / F.col("n_obs").cast("double")).alias("gt_coverage"),
    )


# --- zone-map data-skipping audit (q384) --------------------------------------------


@query(
    "q384_zonemap_skipping",
    """WITH d AS (SELECT doc_id, doc_id // 100 AS file_id,
                         doc_id AS ckey,
                         (doc_id * 2654435761) % 100000 AS ukey
              FROM documents),
       tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
       pr AS (SELECT 'clustered' AS kind, i.i AS probe,
                     i.i * (tot.n // 10) AS lo,
                     i.i * (tot.n // 10) + (tot.n // 20) AS hi
              FROM range(10) i(i), tot
              UNION ALL
              SELECT 'unclustered' AS kind, i.i AS probe,
                     CAST(i.i * 10000 AS BIGINT) AS lo,
                     CAST(i.i * 10000 + 5000 AS BIGINT) AS hi
              FROM range(10) i(i)),
       z AS (SELECT file_id,
                    min(ckey) AS cmin, max(ckey) AS cmax,
                    min(ukey) AS umin, max(ukey) AS umax,
                    CAST(count(*) AS BIGINT) AS n_rows
             FROM d GROUP BY file_id),
       nf AS (SELECT CAST(count(*) AS BIGINT) AS n_files FROM z),
       sc AS (SELECT pr.kind, pr.probe,
                     CAST(count(*) AS BIGINT) AS files_scanned,
                     CAST(sum(z.n_rows) AS BIGINT) AS rows_scanned
              FROM pr JOIN z
                ON (pr.kind = 'clustered' AND z.cmin < pr.hi
                    AND z.cmax >= pr.lo)
                OR (pr.kind = 'unclustered' AND z.umin < pr.hi
                    AND z.umax >= pr.lo)
              GROUP BY pr.kind, pr.probe),
       mt AS (SELECT pr.kind, pr.probe,
                     CAST(count(DISTINCT d.file_id) AS BIGINT)
                       AS files_matching,
                     CAST(count(*) AS BIGINT) AS rows_matched
              FROM pr JOIN d
                ON (pr.kind = 'clustered' AND d.ckey >= pr.lo
                    AND d.ckey < pr.hi)
                OR (pr.kind = 'unclustered' AND d.ukey >= pr.lo
                    AND d.ukey < pr.hi)
              GROUP BY pr.kind, pr.probe)
       SELECT sc.kind, CAST(sc.probe AS BIGINT) AS probe, nf.n_files,
              sc.files_scanned, sc.rows_scanned,
              coalesce(mt.files_matching, 0) AS files_matching,
              coalesce(mt.rows_matched, 0) AS rows_matched
       FROM sc LEFT JOIN mt
         ON sc.kind = mt.kind AND sc.probe = mt.probe
       CROSS JOIN nf""",
)
def q384(spark, sf_dir):
    """Zone-map data-skipping audit — the min/max-pruning
    effectiveness report behind every Parquet row-group skip and
    Iceberg file prune (the repo's own q30 bbox row-group skipping,
    generalized into a measurable meta-query): per 100-row file,
    zone = (min,max) of a CLUSTERED key (doc_id — tight zones) and an
    UNCLUSTERED one (doc_id*2654435761 mod 100000 — every zone spans
    the domain, stride 35761 is coprime to 100000 so 100 samples
    equidistribute); ten 5%-of-domain range probes per key kind are
    checked against the zone table ([lo,hi) overlaps iff min < hi AND
    max >= lo) and against row-level truth.  Same selectivity, ~20x
    file-skipping gap — the number that justifies sorting before
    writing.  Shape: zones = one map-side-combinable groupBy into a
    FILE-grain table; the 20 probes broadcast against both the zone
    table and the row stream — bounded output, linear passes, no
    shuffle beyond the file-grain agg at any corpus size."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr("doc_id div 100").alias("file_id"),
        F.col("doc_id").alias("ckey"),
        ((F.col("doc_id") * F.lit(2654435761)) % 100000).alias("ukey"),
    )
    tot = d.agg(F.count("*").cast("long").alias("n"))
    idx = spark.createDataFrame([(i,) for i in range(10)], "i INT")
    prc = F.broadcast(idx).crossJoin(F.broadcast(tot)).select(
        F.lit("clustered").alias("kind"), F.col("i").alias("probe"),
        (F.col("i") * F.expr("n div 10")).alias("lo"),
        (F.col("i") * F.expr("n div 10") + F.expr("n div 20")).alias("hi"),
    )
    pru = F.broadcast(idx).select(
        F.lit("unclustered").alias("kind"), F.col("i").alias("probe"),
        (F.col("i") * 10000).cast("long").alias("lo"),
        (F.col("i") * 10000 + 5000).cast("long").alias("hi"),
    )
    pr = prc.unionAll(pru)
    z = d.groupBy("file_id").agg(
        F.min("ckey").alias("cmin"), F.max("ckey").alias("cmax"),
        F.min("ukey").alias("umin"), F.max("ukey").alias("umax"),
        F.count("*").cast("long").alias("n_rows"),
    )
    nf = z.agg(F.count("*").cast("long").alias("n_files"))
    overlap_z = (
        ((F.col("kind") == "clustered") & (F.col("cmin") < F.col("hi"))
         & (F.col("cmax") >= F.col("lo")))
        | ((F.col("kind") == "unclustered") & (F.col("umin") < F.col("hi"))
           & (F.col("umax") >= F.col("lo")))
    )
    sc = (
        z.join(F.broadcast(pr), overlap_z)
        .groupBy("kind", "probe")
        .agg(F.count("*").cast("long").alias("files_scanned"),
             F.sum("n_rows").cast("long").alias("rows_scanned"))
    )
    match_row = (
        ((F.col("kind") == "clustered") & (F.col("ckey") >= F.col("lo"))
         & (F.col("ckey") < F.col("hi")))
        | ((F.col("kind") == "unclustered") & (F.col("ukey") >= F.col("lo"))
           & (F.col("ukey") < F.col("hi")))
    )
    mt = (
        d.join(F.broadcast(pr), match_row)
        .groupBy("kind", "probe")
        .agg(F.countDistinct("file_id").cast("long").alias("files_matching"),
             F.count("*").cast("long").alias("rows_matched"))
    )
    return (
        sc.join(mt, ["kind", "probe"], "left")
        .crossJoin(F.broadcast(nf))
        .select(
            "kind", F.col("probe").cast("long").alias("probe"), "n_files",
            "files_scanned", "rows_scanned",
            F.coalesce("files_matching", F.lit(0)).cast("long")
            .alias("files_matching"),
            F.coalesce("rows_matched", F.lit(0)).cast("long")
            .alias("rows_matched"),
        )
    )


# --- k-center coreset selection (q385) ----------------------------------------------

_GONZ_L1 = ("CAST(list_sum(list_transform(range(1,65), "
            "i -> abs({a}.qv[i] - {c}.cqv[i]))) AS BIGINT)")


def _gonzalez_oracle_sql() -> str:
    parts = [
        """WITH v AS MATERIALIZED (SELECT vec_id,
                list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE)*1000 + 0.5) AS BIGINT))
                    AS qv
             FROM embeddings),
       c1 AS MATERIALIZED (SELECT vec_id AS cid, qv AS cqv FROM v
                           ORDER BY vec_id LIMIT 1),
       d1 AS MATERIALIZED (SELECT v.vec_id, v.qv, """
        + _GONZ_L1.format(a="v", c="c1")
        + " AS dmin FROM v, c1)"
    ]
    for r in range(2, 6):
        p = r - 1
        parts.append(
            f""",
       s{r} AS MATERIALIZED (SELECT vec_id AS cid, dmin AS sel_dist
                             FROM d{p} ORDER BY dmin DESC, vec_id LIMIT 1),
       c{r} AS MATERIALIZED (SELECT s{r}.cid, s{r}.sel_dist, v.qv AS cqv
                             FROM v JOIN s{r} ON v.vec_id = s{r}.cid),
       d{r} AS MATERIALIZED (SELECT d{p}.vec_id, d{p}.qv,
                     least(d{p}.dmin, """
            + _GONZ_L1.format(a=f"d{p}", c=f"c{r}")
            + f") AS dmin FROM d{p}, c{r})"
        )
    parts.append(
        """,
       rad AS (SELECT CAST(max(dmin) AS BIGINT) AS final_radius FROM d5),
       u AS (SELECT CAST(1 AS BIGINT) AS rnd, CAST(cid AS BIGINT)
                      AS center_id, CAST(0 AS BIGINT) AS sel_dist FROM c1"""
    )
    for r in range(2, 6):
        parts.append(
            f"""
             UNION ALL SELECT CAST({r} AS BIGINT), CAST(cid AS BIGINT),
                              CAST(sel_dist AS BIGINT) FROM c{r}"""
        )
    parts.append(
        """)
       SELECT u.rnd, u.center_id, u.sel_dist, rad.final_radius
       FROM u, rad"""
    )
    return "".join(parts)


@query("q385_kcenter_coreset", _gonzalez_oracle_sql())
def q385(spark, sf_dir):
    """Gonzalez farthest-point k-center selection (k=5) — the coreset
    / diverse-prompt-selection primitive (2-approximation to the
    optimal k-center cover; the geometric complement to q312's
    relevance-tradeoff MMR): seed = min vec_id, then four unrolled
    rounds of argmax-of-min-distance with the running dmin column
    updated by ONE least() against the newly broadcast center — each
    round is one map-side-combinable max(struct(dmin, -vec_id))
    (ties to LOWEST id via the negated-id field) plus one 1-row
    broadcast, so the whole selection is ~2 linear passes per round
    at any corpus size, never a pairwise matrix.  Distances are
    exact-integer L1 over the per-mille-quantized embedding (the
    q332 contract), so both engines agree bitwise; the emitted
    sel_dist sequence is Gonzalez's non-increasing coverage-radius
    certificate, and final_radius <= sel_dist of round 5 by
    construction.  At 100 TB each round would localCheckpoint the
    dmin column; at fixture scale the lazy chain is 9 passes."""
    emb = _t(spark, sf_dir, "embeddings")
    v = emb.selectExpr(
        "vec_id",
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*1000 "
        "+ 0.5) AS BIGINT)) AS qv",
    )
    l1 = ("CAST(aggregate(zip_with(qv, cqv, (a, b) -> abs(a - b)), "
          "CAST(0 AS BIGINT), (acc, s) -> acc + s) AS BIGINT)")
    c1 = (
        v.orderBy("vec_id").limit(1)
        .select(F.col("vec_id").alias("cid"), F.col("qv").alias("cqv"))
    )
    cur = v.crossJoin(F.broadcast(c1.select("cqv"))).selectExpr(
        "vec_id", "qv", f"{l1} AS dmin")
    rows = [
        c1.select(
            F.lit(1).cast("long").alias("rnd"),
            F.col("cid").cast("long").alias("center_id"),
            F.lit(0).cast("long").alias("sel_dist"),
        )
    ]
    for r in range(2, 6):
        sel = (
            cur.agg(
                F.max(F.struct(F.col("dmin").alias("d"),
                               (-F.col("vec_id")).alias("nid"))).alias("m")
            )
            .select((-F.col("m.nid")).alias("cid"),
                    F.col("m.d").alias("sel_dist"))
        )
        crow = (
            v.join(F.broadcast(sel), v["vec_id"] == F.col("cid"))
            .select("cid", "sel_dist", F.col("qv").alias("cqv"))
        )
        rows.append(
            crow.select(
                F.lit(r).cast("long").alias("rnd"),
                F.col("cid").cast("long").alias("center_id"),
                F.col("sel_dist").cast("long").alias("sel_dist"),
            )
        )
        cur = (
            cur.crossJoin(F.broadcast(crow.select("cqv")))
            .selectExpr("vec_id", "qv", f"least(dmin, {l1}) AS dmin")
        )
    rad = cur.agg(F.max("dmin").cast("long").alias("final_radius"))
    out = rows[0]
    for c in rows[1:]:
        out = out.unionAll(c)
    return out.crossJoin(F.broadcast(rad))


# --- k-anonymity generalization audit (q386) ----------------------------------------


@query(
    "q386_kanonymity_audit",
    """WITH lv AS (
         SELECT 0 AS lvl, concat(lang, '|', source, '|',
                CAST(n_chars // 16 AS VARCHAR)) AS gkey FROM documents
         UNION ALL
         SELECT 1, concat(lang, '|', source, '|',
                CAST(n_chars // 128 AS VARCHAR)) FROM documents
         UNION ALL
         SELECT 2, concat(lang, '|', source) FROM documents
         UNION ALL
         SELECT 3, lang FROM documents
         UNION ALL
         SELECT 4, 'all' FROM documents),
       g AS (SELECT lvl, gkey, CAST(count(*) AS BIGINT) AS n
             FROM lv GROUP BY lvl, gkey),
       per AS (SELECT lvl,
                      CAST(sum(n) AS BIGINT) AS n_rows,
                      CAST(count(*) AS BIGINT) AS n_groups,
                      CAST(min(n) AS BIGINT) AS min_group,
                      CAST(sum(CASE WHEN n < 10 THEN 1 ELSE 0 END)
                        AS BIGINT) AS violating_groups,
                      CAST(sum(CASE WHEN n < 10 THEN n ELSE 0 END)
                        AS BIGINT) AS violating_rows
               FROM g GROUP BY lvl),
       ch AS (SELECT CAST(min(lvl) AS BIGINT) AS chosen_level
              FROM per WHERE violating_rows = 0)
       SELECT CAST(per.lvl AS BIGINT) AS lvl, per.n_rows, per.n_groups,
              per.min_group, per.violating_groups, per.violating_rows,
              CAST(CASE WHEN per.violating_rows = 0 THEN 1 ELSE 0 END
                AS BIGINT) AS satisfies_k10,
              ch.chosen_level
       FROM per, ch""",
)
def q386(spark, sf_dir):
    """k-anonymity audit over a generalization CHAIN (k=10) — the
    release-governance gate for quasi-identifiers (lang, source,
    n_chars): five levels where each strictly coarsens the previous
    ((lang, source, chars div 16) -> div 128 -> (lang, source) ->
    (lang) -> all), so violating rows and violating groups are
    MONOTONE non-increasing by the refinement argument (any fine
    group inside a >= k coarse group only grows when merged) and the
    chosen level = the minimum level with zero violations is well-
    defined (level 4 is one group of N).  Shape: each row explodes to
    its 5 (level, group-key) cells, ONE map-side-combinable groupBy
    to the bounded group table, one per-level rollup — the full
    lattice audit in a single corpus pass, no per-level rescans."""
    docs = _t(spark, sf_dir, "documents")
    lv = docs.selectExpr(
        "explode(array("
        "struct(0 AS lvl, concat(lang, '|', source, '|', "
        "CAST(n_chars div 16 AS STRING)) AS gkey), "
        "struct(1 AS lvl, concat(lang, '|', source, '|', "
        "CAST(n_chars div 128 AS STRING)) AS gkey), "
        "struct(2 AS lvl, concat(lang, '|', source) AS gkey), "
        "struct(3 AS lvl, lang AS gkey), "
        "struct(4 AS lvl, 'all' AS gkey))) AS s"
    ).select("s.lvl", "s.gkey")
    g = lv.groupBy("lvl", "gkey").agg(F.count("*").alias("n"))
    per = g.groupBy("lvl").agg(
        F.sum("n").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_groups"),
        F.min("n").cast("long").alias("min_group"),
        F.sum(F.when(F.col("n") < 10, 1).otherwise(0)).cast("long")
        .alias("violating_groups"),
        F.sum(F.when(F.col("n") < 10, F.col("n")).otherwise(0)).cast("long")
        .alias("violating_rows"),
    )
    per = per.withColumn(
        "satisfies_k10",
        F.when(F.col("violating_rows") == 0, 1).otherwise(0).cast("long"),
    )
    ch = per.filter("satisfies_k10 = 1").agg(
        F.min("lvl").cast("long").alias("chosen_level"))
    return per.crossJoin(F.broadcast(ch)).select(
        F.col("lvl").cast("long").alias("lvl"), "n_rows", "n_groups",
        "min_group", "violating_groups", "violating_rows",
        "satisfies_k10", "chosen_level",
    )


# --- watermark late-data planning (q387) --------------------------------------------


@query(
    "q387_watermark_planning",
    """WITH d AS (SELECT event_id,
                CASE WHEN event_id % 10 < 9
                     THEN (event_id * 31) % 60
                     ELSE 300 + (event_id * 31) % 3300
                END AS delay
              FROM events),
       w AS (SELECT CAST(w.w AS BIGINT) AS watermark_s
             FROM (VALUES (60), (300), (900), (3600)) w(w))
       SELECT w.watermark_s,
              CAST(count(*) AS BIGINT) AS n_events,
              CAST(sum(CASE WHEN d.delay > w.watermark_s
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
              CAST(sum(CASE WHEN d.delay > w.watermark_s
                       THEN 1 ELSE 0 END) AS DOUBLE)
                / CAST(count(*) AS DOUBLE) AS drop_rate,
              CAST(max(CASE WHEN d.delay <= w.watermark_s
                       THEN d.delay ELSE -1 END) AS BIGINT)
                AS max_kept_delay,
              CAST(sum(CASE WHEN d.delay <= w.watermark_s
                       THEN 1 ELSE 0 END) * w.watermark_s AS BIGINT)
                AS state_cost_event_seconds
       FROM w CROSS JOIN d
       GROUP BY w.watermark_s""",
)
def q387(spark, sf_dir):
    """Watermark policy planning for Structured Streaming — the
    completeness/state-cost tradeoff curve that decides
    withWatermark() before the job ships: a deterministic two-regime
    arrival-delay model (90% prompt, delay < 60 s; 10% stragglers,
    300..3599 s — the checkpoint-recovery / mobile-client tail), four
    candidate watermarks evaluated in ONE corpus pass (4-row policy
    table broadcast against the event stream), emitting per policy
    the dropped-event count (delay > W is dropped exactly as a
    too-late row under watermark W), the drop rate as one IEEE
    division, the max surviving delay, and the state-retention cost
    proxy kept_events x W — the number that says a 3600 s watermark
    buys 0 drops at 60x the state of the 60 s policy.  Everything
    integer except the single division; map-side combinable."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("event_id") % 10 < 9, (F.col("event_id") * 31) % 60)
        .otherwise(300 + (F.col("event_id") * 31) % 3300).alias("delay"),
    )
    w = spark.createDataFrame(
        [(60,), (300,), (900,), (3600,)], "watermark_s LONG")
    late = F.col("delay") > F.col("watermark_s")
    return (
        F.broadcast(w).crossJoin(ev)
        .groupBy("watermark_s")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.when(late, 1).otherwise(0)).cast("long")
            .alias("n_dropped"),
            (F.sum(F.when(late, 1).otherwise(0)).cast("double")
             / F.count("*").cast("double")).alias("drop_rate"),
            F.max(F.when(~late, F.col("delay")).otherwise(-1)).cast("long")
            .alias("max_kept_delay"),
            (F.sum(F.when(~late, 1).otherwise(0))
             * F.first("watermark_s")).cast("long")
            .alias("state_cost_event_seconds"),
        )
    )


# --- Merkle-tree replica diff (q388) ------------------------------------------------


@query(
    "q388_merkle_replica_diff",
    """WITH l0 AS (SELECT doc_id,
                md5(text) AS ha,
                md5(CASE WHEN doc_id % 97 = 13 THEN text || 'X'
                         ELSE text END) AS hb
              FROM documents),
       l1 AS (SELECT doc_id // 16 AS node,
                     md5(string_agg(ha, '' ORDER BY doc_id)) AS ha,
                     md5(string_agg(hb, '' ORDER BY doc_id)) AS hb
              FROM l0 GROUP BY doc_id // 16),
       l2 AS (SELECT node // 16 AS node,
                     md5(string_agg(ha, '' ORDER BY node)) AS ha,
                     md5(string_agg(hb, '' ORDER BY node)) AS hb
              FROM l1 GROUP BY node // 16),
       l3 AS (SELECT node // 16 AS node,
                     md5(string_agg(ha, '' ORDER BY node)) AS ha,
                     md5(string_agg(hb, '' ORDER BY node)) AS hb
              FROM l2 GROUP BY node // 16),
       rt AS (SELECT 0 AS node,
                     md5(string_agg(ha, '' ORDER BY node)) AS ha,
                     md5(string_agg(hb, '' ORDER BY node)) AS hb
              FROM l3)
       SELECT CAST(0 AS BIGINT) AS lvl,
              CAST(count(*) AS BIGINT) AS n_nodes,
              CAST(sum(CASE WHEN ha <> hb THEN 1 ELSE 0 END) AS BIGINT)
                AS n_diff
       FROM l0
       UNION ALL
       SELECT 1, count(*),
              sum(CASE WHEN ha <> hb THEN 1 ELSE 0 END) FROM l1
       UNION ALL
       SELECT 2, count(*),
              sum(CASE WHEN ha <> hb THEN 1 ELSE 0 END) FROM l2
       UNION ALL
       SELECT 3, count(*),
              sum(CASE WHEN ha <> hb THEN 1 ELSE 0 END) FROM l3
       UNION ALL
       SELECT 4, count(*),
              sum(CASE WHEN ha <> hb THEN 1 ELSE 0 END) FROM rt""",
)
def q388(spark, sf_dir):
    """Merkle-tree replica reconciliation — the anti-entropy diff
    every multi-region table replica runs (Dynamo/Cassandra repair:
    compare roots, drill into differing subtrees only, never ship the
    table): fanout-16 tree over doc_id ranges, node hash = md5 of the
    child hex digests concatenated in child order (Spark's
    sort_array(collect_list(struct)) mirrors string_agg ORDER BY —
    hex md5 strings are engine-identical so every level compares
    bitwise); replica B deviates on doc_id % 97 = 13 (simulated
    missed updates).  Emits n_nodes / n_diff per level: leaf n_diff
    is exactly the corrupted-doc count, and each level's diff set is
    the ancestor closure of the one below — the drill-down cost is 16
    x n_diff(parent), the log-vs-linear reconciliation argument.
    Shape: 4 combinable groupBys over geometrically shrinking tables;
    the leaf pass is the only corpus-sized one."""
    docs = _t(spark, sf_dir, "documents")
    cur = docs.select(
        F.col("doc_id").alias("node"),
        F.md5("text").alias("ha"),
        F.md5(F.when(F.col("doc_id") % 97 == 13,
                     F.concat(F.col("text"), F.lit("X")))
              .otherwise(F.col("text"))).alias("hb"),
    )
    levels = [
        cur.agg(
            F.lit(0).cast("long").alias("lvl"),
            F.count("*").cast("long").alias("n_nodes"),
            F.sum(F.when(F.col("ha") != F.col("hb"), 1).otherwise(0))
            .cast("long").alias("n_diff"),
        ).select("lvl", "n_nodes", "n_diff")
    ]
    for lv in range(1, 5):
        parent = F.expr("node div 16") if lv < 4 else F.lit(0)
        cur = (
            cur.groupBy(parent.alias("pnode"))
            .agg(
                F.md5(F.array_join(F.expr(
                    "transform(array_sort(collect_list(struct(node, ha))), "
                    "s -> s.ha)"), "")).alias("ha"),
                F.md5(F.array_join(F.expr(
                    "transform(array_sort(collect_list(struct(node, hb))), "
                    "s -> s.hb)"), "")).alias("hb"),
            )
            .withColumnRenamed("pnode", "node")
        )
        levels.append(
            cur.agg(
                F.lit(lv).cast("long").alias("lvl"),
                F.count("*").cast("long").alias("n_nodes"),
                F.sum(F.when(F.col("ha") != F.col("hb"), 1).otherwise(0))
                .cast("long").alias("n_diff"),
            ).select("lvl", "n_nodes", "n_diff")
        )
    out = levels[0]
    for df in levels[1:]:
        out = out.unionAll(df)
    return out


# --- geo density hotspot clustering (q389) ------------------------------------------

_HOTSPOT_PTS_SQL = """SELECT doc_id,
           CASE WHEN doc_id % 10 < 3
                THEN (-120 + 100*(doc_id % 3))
                     + ((doc_id*13) % 500)/100.0 - 2.5
                ELSE ((doc_id*9973) % 36000)/100.0 - 180.0 END AS lon,
           CASE WHEN doc_id % 10 < 3
                THEN (20*(doc_id % 3) - 20)
                     + ((doc_id*17) % 400)/100.0 - 2.0
                ELSE ((doc_id*7919) % 16000)/100.0 - 80.0 END AS lat
       FROM documents"""


@query(
    "q389_geo_density_clusters",
    f"""WITH RECURSIVE pts AS ({_HOTSPOT_PTS_SQL}),
       g AS (SELECT CAST(floor((lon + 180)/360.0*64) AS BIGINT) AS cx,
                    CAST(floor((90 - lat)/180.0*32) AS BIGINT) AS cy
             FROM pts),
       cellcnt AS (SELECT cy*64 + cx AS cell, cx, cy,
                          CAST(count(*) AS BIGINT) AS cnt
                   FROM g GROUP BY cx, cy),
       tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM cellcnt),
       dense AS (SELECT cell, cx, cy, cnt FROM cellcnt, tot
                 WHERE cnt >= greatest(8, n // 256)),
       e AS (SELECT a.cell AS u, b.cell AS v
             FROM dense a JOIN dense b
               ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1),
       und AS (SELECT DISTINCT u, v FROM
                 (SELECT u, v FROM e UNION ALL SELECT v, u FROM e)),
       reach(node, lab) AS (
         SELECT cell, cell FROM dense
         UNION
         SELECT und.v, r.lab FROM reach r JOIN und ON und.u = r.node),
       comp AS (SELECT node, min(lab) AS component FROM reach
                GROUP BY node)
       SELECT CAST(comp.component AS BIGINT) AS component,
              CAST(count(*) AS BIGINT) AS n_cells,
              CAST(sum(dense.cnt) AS BIGINT) AS n_points,
              CAST(min(dense.cx) AS BIGINT) AS min_cx,
              CAST(max(dense.cx) AS BIGINT) AS max_cx,
              CAST(min(dense.cy) AS BIGINT) AS min_cy,
              CAST(max(dense.cy) AS BIGINT) AS max_cy
       FROM comp JOIN dense ON dense.cell = comp.node
       GROUP BY comp.component""",
)
def q389(spark, sf_dir):
    """Grid-density hotspot clustering of the geocoded corpus — the
    DBSCAN-at-scale shape (ST-DBSCAN / in-database hotspot detection:
    rasterize points to cells, threshold density, 8-connect the dense
    cells): the cell histogram is ONE map-side-combinable groupBy
    whose output is bounded by the 64x32 GRID — never corpus-sized —
    so the adjacency self-join and the connected-components run
    (operators/graph.py pointer-jumping, the q33 machinery) cost the
    same at 500 docs or 10^12.  The density threshold is
    corpus-proportional (max(8, n div 256)) so the uniform background
    lattice stays sub-threshold at every SF while three planted
    5-degree blobs (30% of docs, 100 degrees apart; the %10 regime
    selector and %3 blob selector are coprime per the q323 rule)
    always clear it — the cluster report is exactly 3 components with
    1-2-cell bboxes.  Self-pairs keep isolated dense cells in the
    node set.  Oracle: recursive-CTE min-label fixpoint with the
    q309 DISTINCT-wrapped undirected edge set."""
    from gdal_spark.operators.graph import connected_components

    docs = _t(spark, sf_dir, "documents")
    blob = F.col("doc_id") % 10 < 3
    pts = docs.select(
        F.when(blob, (-120 + 100 * (F.col("doc_id") % 3))
               + ((F.col("doc_id") * 13) % 500) / 100.0 - 2.5)
        .otherwise(((F.col("doc_id") * 9973) % 36000) / 100.0 - 180.0)
        .alias("lon"),
        F.when(blob, (20 * (F.col("doc_id") % 3) - 20)
               + ((F.col("doc_id") * 17) % 400) / 100.0 - 2.0)
        .otherwise(((F.col("doc_id") * 7919) % 16000) / 100.0 - 80.0)
        .alias("lat"),
    )
    g = pts.select(
        F.floor((F.col("lon") + 180) / 360.0 * 64).cast("long").alias("cx"),
        F.floor((90 - F.col("lat")) / 180.0 * 32).cast("long").alias("cy"),
    )
    cellcnt = g.groupBy("cx", "cy").agg(
        F.count("*").cast("long").alias("cnt")
    ).select((F.col("cy") * 64 + F.col("cx")).alias("cell"),
             "cx", "cy", "cnt")
    tot = cellcnt.agg(F.sum("cnt").cast("long").alias("n"))
    dense = (
        cellcnt.crossJoin(F.broadcast(tot))
        .filter(F.col("cnt") >= F.greatest(F.lit(8), F.expr("n div 256")))
        .select("cell", "cx", "cy", "cnt")
    )
    b = dense.select(F.col("cell").alias("v"), F.col("cx").alias("bx"),
                     F.col("cy").alias("by"))
    edges = dense.join(
        F.broadcast(b),
        (F.abs(F.col("cx") - F.col("bx")) <= 1)
        & (F.abs(F.col("cy") - F.col("by")) <= 1),
    ).select(F.col("cell").alias("src"), F.col("v").alias("dst"))
    comp = connected_components(edges)
    return (
        comp.join(dense, comp["node"] == dense["cell"])
        .groupBy(F.col("component").cast("long").alias("component"))
        .agg(
            F.count("*").cast("long").alias("n_cells"),
            F.sum("cnt").cast("long").alias("n_points"),
            F.min("cx").cast("long").alias("min_cx"),
            F.max("cx").cast("long").alias("max_cx"),
            F.min("cy").cast("long").alias("min_cy"),
            F.max("cy").cast("long").alias("max_cy"),
        )
    )


# --- left-deep join-order planning (q390) -------------------------------------------

_JOIN_ORDERS = [
    ("C>O>L>S", "01", "012"),
    ("O>C>L>S", "01", "012"),
    ("O>L>C>S", "12", "012"),
    ("O>L>S>C", "12", "123"),
    ("L>O>C>S", "12", "012"),
    ("L>O>S>C", "12", "123"),
    ("L>S>O>C", "23", "123"),
    ("S>L>O>C", "23", "123"),
]


@query(
    "q390_join_order_planning",
    """WITH st AS (SELECT
         (SELECT count(*) FROM customer) AS c0,
         (SELECT count(*) FROM orders) AS c1,
         (SELECT count(*) FROM lineitem) AS c2,
         (SELECT count(*) FROM supplier) AS c3,
         greatest((SELECT count(DISTINCT c_custkey) FROM customer),
                  (SELECT count(DISTINCT o_custkey) FROM orders)) AS n01,
         greatest((SELECT count(DISTINCT o_orderkey) FROM orders),
                  (SELECT count(DISTINCT l_orderkey) FROM lineitem))
           AS n12,
         greatest((SELECT count(DISTINCT l_suppkey) FROM lineitem),
                  (SELECT count(DISTINCT s_suppkey) FROM supplier))
           AS n23),
       e1 AS (SELECT *, c0*c1 // n01 AS e01, c1*c2 // n12 AS e12,
                     c2*c3 // n23 AS e23 FROM st),
       e2 AS (SELECT *, e01*c2 // n12 AS e012, e12*c3 // n23 AS e123
              FROM e1),
       e3 AS (SELECT *, e012*c3 // n23 AS e0123 FROM e2),
       ords AS (SELECT * FROM (VALUES
         ('C>O>L>S','01','012'), ('O>C>L>S','01','012'),
         ('O>L>C>S','12','012'), ('O>L>S>C','12','123'),
         ('L>O>C>S','12','012'), ('L>O>S>C','12','123'),
         ('L>S>O>C','23','123'), ('S>L>O>C','23','123'))
         o(lbl, p2, p3)),
       y AS (SELECT lbl,
               CAST(CASE p2 WHEN '01' THEN e01 WHEN '12' THEN e12
                    ELSE e23 END AS BIGINT) AS est_2,
               CAST(CASE p3 WHEN '012' THEN e012 ELSE e123 END
                 AS BIGINT) AS est_3,
               CAST(e0123 AS BIGINT) AS est_4
             FROM ords, e3),
       z AS (SELECT lbl, est_2, est_3, est_4,
                    est_2 + est_3 + est_4 AS cost FROM y),
       b1 AS (SELECT min(cost) AS bc FROM z),
       b2 AS (SELECT min(lbl) AS bl FROM z, b1 WHERE cost = bc)
       SELECT z.lbl AS ord_label, z.est_2, z.est_3, z.est_4,
              CAST(z.cost AS BIGINT) AS cost,
              CAST(CASE WHEN z.cost = b1.bc AND z.lbl = b2.bl
                   THEN 1 ELSE 0 END AS BIGINT) AS is_best
       FROM z, b1, b2""",
)
def q390(spark, sf_dir):
    """Selinger-style left-deep join-order planning over REAL catalog
    statistics — the System R enumeration Catalyst itself runs, as an
    oracle-checked query: the chain join graph customer-(custkey)-
    orders-(orderkey)-lineitem-(suppkey)-supplier admits exactly
    2^(n-1) = 8 cross-product-free left-deep orders (enumerated as a
    literal — the optimizer's search space is structural, never
    data-dependent); intermediate cardinalities use the textbook
    |A join B| = |A||B| / max(ndv_A, ndv_B) estimate computed
    SEGMENT-CANONICALLY (right-extension recursion with pinned floor
    division, so shared prefixes share estimates bitwise) from exact
    count / countDistinct stats gathered in four table scans; plan
    cost = sum of the three prefix-join sizes, best = (min cost, lex
    label) — the C-first / O-first orders tie by symmetry and
    exercise the tie rule.  Exact BIGINT throughout (catalog-scale
    planners switch to doubles; the relational shape is identical).
    Shape: 4 stat scans -> 1-row stats -> 8-row broadcast enumerate —
    planning cost is CONSTANT in data size."""
    c = _t(spark, sf_dir, "customer").agg(
        F.count("*").alias("c0"),
        F.countDistinct("c_custkey").alias("dc_cust"))
    o = _t(spark, sf_dir, "orders").agg(
        F.count("*").alias("c1"),
        F.countDistinct("o_custkey").alias("do_cust"),
        F.countDistinct("o_orderkey").alias("do_ord"))
    li = _t(spark, sf_dir, "lineitem").agg(
        F.count("*").alias("c2"),
        F.countDistinct("l_orderkey").alias("dl_ord"),
        F.countDistinct("l_suppkey").alias("dl_supp"))
    s = _t(spark, sf_dir, "supplier").agg(
        F.count("*").alias("c3"),
        F.countDistinct("s_suppkey").alias("ds_supp"))
    st = (
        c.crossJoin(o).crossJoin(li).crossJoin(s)
        .selectExpr(
            "c0", "c1", "c2", "c3",
            "greatest(dc_cust, do_cust) AS n01",
            "greatest(do_ord, dl_ord) AS n12",
            "greatest(dl_supp, ds_supp) AS n23",
        )
        .selectExpr("*", "c0*c1 div n01 AS e01", "c1*c2 div n12 AS e12",
                    "c2*c3 div n23 AS e23")
        .selectExpr("*", "e01*c2 div n12 AS e012",
                    "e12*c3 div n23 AS e123")
        .selectExpr("*", "e012*c3 div n23 AS e0123")
    )
    ords = spark.createDataFrame(
        _JOIN_ORDERS, "lbl STRING, p2 STRING, p3 STRING")
    z = (
        F.broadcast(ords).crossJoin(F.broadcast(st))
        .selectExpr(
            "lbl",
            "CAST(CASE p2 WHEN '01' THEN e01 WHEN '12' THEN e12 "
            "ELSE e23 END AS BIGINT) AS est_2",
            "CAST(CASE p3 WHEN '012' THEN e012 ELSE e123 END AS BIGINT) "
            "AS est_3",
            "CAST(e0123 AS BIGINT) AS est_4",
        )
        .withColumn("cost", (F.col("est_2") + F.col("est_3")
                             + F.col("est_4")).cast("long"))
    )
    b1 = z.agg(F.min("cost").alias("bc"))
    b2 = (z.crossJoin(F.broadcast(b1)).filter(F.col("cost") == F.col("bc"))
          .agg(F.min("lbl").alias("bl")))
    return (
        z.crossJoin(F.broadcast(b1)).crossJoin(F.broadcast(b2))
        .select(
            F.col("lbl").alias("ord_label"), "est_2", "est_3", "est_4",
            "cost",
            F.when((F.col("cost") == F.col("bc"))
                   & (F.col("lbl") == F.col("bl")), 1).otherwise(0)
            .cast("long").alias("is_best"),
        )
    )


# --- block-level delta transfer (q391) ----------------------------------------------


@query(
    "q391_delta_transfer",
    """WITH v AS (SELECT doc_id, text AS v1,
                CASE WHEN doc_id % 7 = 2 THEN
                       substr(text, 1, CAST(length(text) // 2 AS INT))
                       || 'EDITSEGMENT'
                       || substr(text,
                                 CAST(length(text) // 2 + 1 AS INT))
                     WHEN doc_id % 7 = 3 THEN text || ' APPENDED TAIL'
                     ELSE text END AS v2,
                CASE WHEN doc_id % 7 = 2 THEN 'insert_middle'
                     WHEN doc_id % 7 = 3 THEN 'append'
                     ELSE 'unchanged' END AS edit_class
              FROM documents),
       b1 AS (SELECT DISTINCT doc_id, blk FROM (
                SELECT doc_id,
                       unnest(list_filter(list_transform(range(1, 41),
                         i -> CASE WHEN i = 1 AND length(v1) > 1280
                              THEN error('q391: fixture outgrew 40 blocks')
                              ELSE substr(v1, CAST((i-1)*32+1 AS INT), 32)
                              END),
                         s -> length(s) > 0)) AS blk
                FROM v)),
       b2 AS (SELECT doc_id, edit_class,
                     unnest(list_filter(list_transform(range(1, 41),
                       i -> CASE WHEN i = 1 AND length(v2) > 1280
                            THEN error('q391: fixture outgrew 40 blocks')
                            ELSE substr(v2, CAST((i-1)*32+1 AS INT), 32)
                            END),
                       s -> length(s) > 0)) AS blk
              FROM v),
       j AS (SELECT b2.doc_id, b2.edit_class,
                    CASE WHEN b1.blk IS NULL THEN 1 ELSE 0 END AS xfer
             FROM b2 LEFT JOIN b1
               ON b1.doc_id = b2.doc_id AND b1.blk = b2.blk)
       SELECT edit_class,
              CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
              CAST(count(*) AS BIGINT) AS v2_blocks,
              CAST(sum(xfer) AS BIGINT) AS transferred_blocks,
              CAST(sum(xfer) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                AS transfer_rate
       FROM j GROUP BY edit_class""",
)
def q391(spark, sf_dir):
    """Block-level delta-transfer accounting between two snapshot
    versions — the rsync/recrawl-economics number (ship only the
    32-char blocks of v2 absent from the SAME doc's v1 block set):
    three deterministic edit classes prove the fixed-blocking
    tradeoff — APPEND edits transfer only the tail block(s) because
    earlier block offsets are untouched, while a MIDDLE INSERT shifts
    every later block boundary and forces ~half the doc across the
    wire (the shift-sensitivity that motivates content-defined
    chunking, q308), and unchanged docs transfer exactly 0.  Both
    engines enumerate blocks over the SAME fixed range(1,41) with the
    q180 loud error() outgrowth guard (max doc 569+11 chars << 1280);
    the per-doc (doc_id, block) anti-membership is one equi-join
    whose candidate volume is the block count — linear, shuffled on
    doc_id, never cross-doc.  transfer_rate is the single IEEE
    division of exact counts."""
    docs = _t(spark, sf_dir, "documents")
    v = docs.select(
        "doc_id",
        F.col("text").alias("v1"),
        F.expr(
            "CASE WHEN doc_id % 7 = 2 THEN "
            "substring(text, 1, CAST(length(text) div 2 AS INT)) "
            "|| 'EDITSEGMENT' "
            "|| substring(text, CAST(length(text) div 2 + 1 AS INT), "
            "1000000) "
            "WHEN doc_id % 7 = 3 THEN text || ' APPENDED TAIL' "
            "ELSE text END").alias("v2"),
        F.expr(
            "CASE WHEN doc_id % 7 = 2 THEN 'insert_middle' "
            "WHEN doc_id % 7 = 3 THEN 'append' "
            "ELSE 'unchanged' END").alias("edit_class"),
    )
    blk = ("filter(transform(sequence(1, 40), i -> CASE WHEN i = 1 "
           "AND length({c}) > 1280 THEN "
           "raise_error('q391: fixture outgrew 40 blocks') "
           "ELSE substring({c}, CAST((i-1)*32+1 AS INT), 32) END), "
           "s -> length(s) > 0)")
    b1 = (
        v.select("doc_id",
                 F.explode(F.expr(blk.format(c="v1"))).alias("blk"))
        .distinct()
    )
    b2 = v.select(
        "doc_id", "edit_class",
        F.explode(F.expr(blk.format(c="v2"))).alias("blk"))
    j = b2.join(
        b1.withColumnRenamed("blk", "blk1"),
        (b2["doc_id"] == b1["doc_id"]) & (F.col("blk") == F.col("blk1")),
        "left",
    ).select(
        b2["doc_id"].alias("doc_id"), "edit_class",
        F.when(F.col("blk1").isNull(), 1).otherwise(0).alias("xfer"),
    )
    return j.groupBy("edit_class").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("v2_blocks"),
        F.sum("xfer").cast("long").alias("transferred_blocks"),
        (F.sum("xfer").cast("double") / F.count("*").cast("double"))
        .alias("transfer_rate"),
    )


# --- Simpson's-paradox detector (q392) ----------------------------------------------


@query(
    "q392_simpsons_paradox",
    """WITH a AS (SELECT doc_id % 2 AS stratum,
                CASE WHEN (doc_id // 2) % 10 < 1 + 8 * (doc_id % 2)
                     THEN 'A' ELSE 'B' END AS variant,
                CASE WHEN (doc_id * 2654435761
                           + (doc_id // 20) * 567) % 1000 <
                          200 + 500 * (doc_id % 2)
                          + CASE WHEN (doc_id // 2) % 10
                                      >= 1 + 8 * (doc_id % 2)
                                 THEN 100 ELSE 0 END
                     THEN 1 ELSE 0 END AS conv
              FROM documents),
       s AS (SELECT stratum,
                    CAST(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_a,
                    CAST(sum(CASE WHEN variant = 'A' THEN conv ELSE 0
                             END) AS BIGINT) AS succ_a,
                    CAST(sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_b,
                    CAST(sum(CASE WHEN variant = 'B' THEN conv ELSE 0
                             END) AS BIGINT) AS succ_b
             FROM a GROUP BY stratum),
       p AS (SELECT CAST(-1 AS BIGINT) AS stratum,
                    CAST(sum(n_a) AS BIGINT) AS n_a,
                    CAST(sum(succ_a) AS BIGINT) AS succ_a,
                    CAST(sum(n_b) AS BIGINT) AS n_b,
                    CAST(sum(succ_b) AS BIGINT) AS succ_b
             FROM s),
       u AS (SELECT CAST(stratum AS BIGINT) AS stratum, n_a, succ_a,
                    n_b, succ_b FROM s
             UNION ALL SELECT * FROM p)
       SELECT stratum, n_a, succ_a, n_b, succ_b,
              CAST(CASE WHEN succ_b * n_a > succ_a * n_b
                   THEN 1 ELSE 0 END AS BIGINT) AS b_wins
       FROM u""",
)
def q392(spark, sf_dir):
    """Simpson's-paradox detector for A/B readouts — the stratified
    vs pooled sign-flip audit every experimentation platform needs
    before q347's Wilson bound is trusted (the kidney-stone shape):
    variant B converts 10 pp better than A in BOTH strata
    (deterministic per-mille rates 200/700 for A, +100 for B), but
    A's exposure is skewed toward the high-base stratum (A share 1
    vs 9 tenths), so the POOLED comparison flips — pooled A ~650 vs
    B ~350 per-mille by the exact weighted arithmetic; margins are
    fat enough that the realized deterministic rates keep the flip
    at every SF (the first cut used 5 strata with 5 pp margins and
    25-sample cells drowned the bonus — sample-size floors are part
    of the fixture contract).  The outcome hash mixes in
    (doc_id div 20)*567 so consecutive docs within a (stratum,
    share-bucket) cell step the per-mille lattice by 787 (coprime to
    1000) — equidistributed even over 25-doc cells.  Winners are
    decided by the exact integer cross-multiplication
    succ_b*n_a > succ_a*n_b (no rate division anywhere), emitted per
    stratum plus the pooled -1 row whose flag DISAGREES with both
    strata — the paradox certificate.  One corpus pass, one
    bounded groupBy, one rollup."""
    docs = _t(spark, sf_dir, "documents")
    a = docs.select(
        (F.col("doc_id") % 2).alias("stratum"),
        F.expr("CASE WHEN (doc_id div 2) % 10 < 1 + 8 * (doc_id % 2) "
               "THEN 'A' ELSE 'B' END").alias("variant"),
        F.expr(
            "CASE WHEN (doc_id * 2654435761 + (doc_id div 20) * 567) "
            "% 1000 < 200 + 500 * (doc_id % 2) "
            "+ CASE WHEN (doc_id div 2) % 10 >= 1 + 8 * (doc_id % 2) "
            "THEN 100 ELSE 0 END THEN 1 ELSE 0 END").alias("conv"),
    )
    s = a.groupBy("stratum").agg(
        F.sum(F.when(F.col("variant") == "A", 1).otherwise(0))
        .cast("long").alias("n_a"),
        F.sum(F.when(F.col("variant") == "A", F.col("conv")).otherwise(0))
        .cast("long").alias("succ_a"),
        F.sum(F.when(F.col("variant") == "B", 1).otherwise(0))
        .cast("long").alias("n_b"),
        F.sum(F.when(F.col("variant") == "B", F.col("conv")).otherwise(0))
        .cast("long").alias("succ_b"),
    )
    p = s.agg(
        F.lit(-1).cast("long").alias("stratum"),
        F.sum("n_a").cast("long").alias("n_a"),
        F.sum("succ_a").cast("long").alias("succ_a"),
        F.sum("n_b").cast("long").alias("n_b"),
        F.sum("succ_b").cast("long").alias("succ_b"),
    ).select("stratum", "n_a", "succ_a", "n_b", "succ_b")
    u = s.select(F.col("stratum").cast("long").alias("stratum"),
                 "n_a", "succ_a", "n_b", "succ_b").unionAll(p)
    return u.withColumn(
        "b_wins",
        F.when(F.col("succ_b") * F.col("n_a")
               > F.col("succ_a") * F.col("n_b"), 1).otherwise(0)
        .cast("long"),
    )


# --- elastic reshard migration audit (q393) -----------------------------------------


@query(
    "q393_reshard_migration",
    """WITH u AS (SELECT DISTINCT 'k' || CAST(doc_id AS VARCHAR) AS k
                  FROM documents),
       hm AS (SELECT k,
                CAST(CAST('0x' || substr(md5('mod:' || k), 1, 8)
                     AS UBIGINT) AS BIGINT) AS h
              FROM u),
       wts AS (SELECT k, s.range AS node,
                CAST(CAST('0x' || substr(md5('grow' ||
                       CAST(s.range AS VARCHAR) || ':' || k), 1, 8)
                     AS UBIGINT) AS BIGINT) AS w
               FROM u, range(0, 20) s),
       a16 AS (SELECT k, max(w * 32 + (31 - node)) AS c16
               FROM wts WHERE node < 16 GROUP BY k),
       a20 AS (SELECT k, max(w * 32 + (31 - node)) AS c20
               FROM wts GROUP BY k),
       asg AS (SELECT hm.k,
                      hm.h % 16 AS m16, hm.h % 20 AS m20,
                      31 - (a16.c16 % 32) AS h16,
                      31 - (a20.c20 % 32) AS h20
               FROM hm JOIN a16 USING (k) JOIN a20 USING (k))
       SELECT CAST(count(*) AS BIGINT) AS n_keys,
              CAST(sum(CASE WHEN m16 <> m20 THEN 1 ELSE 0 END)
                AS BIGINT) AS moved_mod,
              CAST(sum(CASE WHEN h16 <> h20 THEN 1 ELSE 0 END)
                AS BIGINT) AS moved_hrw,
              CAST(sum(CASE WHEN h20 >= 16 THEN 1 ELSE 0 END)
                AS BIGINT) AS new_node_keys,
              CAST(sum(CASE WHEN m16 <> m20 THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(count(*) AS DOUBLE) AS moved_mod_rate,
              CAST(sum(CASE WHEN h16 <> h20 THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(count(*) AS DOUBLE) AS moved_hrw_rate
       FROM asg""",
)
def q393(spark, sf_dir):
    """Elastic reshard migration audit, 16 -> 20 nodes — THE argument
    for rendezvous/consistent hashing over modulo placement when a
    fleet GROWS (q293 covers node removal; this is the capacity-add
    direction): under h % n placement almost every key moves
    (P[h%16 = h%20] = 1/80 of the residue lattice... ~5%), while the
    HRW argmax moves EXACTLY the keys whose 20-node winner is one of
    the 4 new nodes — the emitted new_node_keys column equals
    moved_hrw by construction (a key's max over the old 16 weights
    is unchanged, so its assignment changes iff a new node's weight
    beats them all), the minimal-disruption optimality PROOF at ~4/20
    of the corpus.  Weights via the pinned md5 conv/UBIGINT idiom;
    both policies and both fleet sizes in ONE pass over a 20-row
    explode feeding two map-side-combinable integer argmaxes
    (w*32 + (31-node), ties to lowest node); rates are single IEEE
    divisions of the exact counts."""
    docs = _t(spark, sf_dir, "documents")
    u = docs.select(
        F.concat(F.lit("k"), F.col("doc_id").cast("string")).alias("k")
    ).distinct()
    hm = u.withColumn(
        "h",
        F.conv(F.substring(F.md5(F.concat(F.lit("mod:"), F.col("k"))),
                           1, 8), 16, 10).cast("long"),
    )
    wts = u.select(
        "k", F.explode(F.sequence(F.lit(0), F.lit(19))).alias("node")
    ).withColumn(
        "w",
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("grow"), F.col("node").cast("string"),
                               F.lit(":"), F.col("k"))), 1, 8),
            16, 10,
        ).cast("long"),
    )
    code = F.col("w") * 32 + (31 - F.col("node"))
    a16 = (wts.filter(F.col("node") < 16).groupBy("k")
           .agg(F.max(code).alias("c16")))
    a20 = wts.groupBy("k").agg(F.max(code).alias("c20"))
    asg = (
        hm.join(a16, "k").join(a20, "k")
        .select(
            (F.col("h") % 16).alias("m16"), (F.col("h") % 20).alias("m20"),
            (31 - F.col("c16") % 32).alias("h16"),
            (31 - F.col("c20") % 32).alias("h20"),
        )
    )
    modmove = F.col("m16") != F.col("m20")
    hrwmove = F.col("h16") != F.col("h20")
    return asg.agg(
        F.count("*").cast("long").alias("n_keys"),
        F.sum(F.when(modmove, 1).otherwise(0)).cast("long")
        .alias("moved_mod"),
        F.sum(F.when(hrwmove, 1).otherwise(0)).cast("long")
        .alias("moved_hrw"),
        F.sum(F.when(F.col("h20") >= 16, 1).otherwise(0)).cast("long")
        .alias("new_node_keys"),
        (F.sum(F.when(modmove, 1).otherwise(0)).cast("double")
         / F.count("*").cast("double")).alias("moved_mod_rate"),
        (F.sum(F.when(hrwmove, 1).otherwise(0)).cast("double")
         / F.count("*").cast("double")).alias("moved_hrw_rate"),
    )


# --- columnar encoding selection (q394) ---------------------------------------------


def _enc_block_sql(name: str, cexpr: str, is_string: bool) -> str:
    if is_string:
        plain = f"(SELECT CAST(sum(length({cexpr})) AS BIGINT) FROM documents)"
        dstore = (f"(SELECT CAST(sum(length(v)) AS BIGINT) FROM "
                  f"(SELECT DISTINCT {cexpr} AS v FROM documents))")
        width = f"(SELECT CAST(max(length({cexpr})) AS BIGINT) FROM documents)"
    else:
        plain = "(SELECT CAST(8 * count(*) AS BIGINT) FROM documents)"
        dstore = (f"(SELECT CAST(8 * count(DISTINCT {cexpr}) AS BIGINT) "
                  f"FROM documents)")
        width = "CAST(8 AS BIGINT)"
    return f"""SELECT '{name}' AS col_name,
         (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n,
         (SELECT CAST(count(DISTINCT {cexpr}) AS BIGINT)
          FROM documents) AS ndv,
         (SELECT CAST(1 + sum(CASE WHEN a.{name}_v <> b.{name}_v
                              THEN 1 ELSE 0 END) AS BIGINT)
          FROM (SELECT doc_id, {cexpr} AS {name}_v FROM documents) a
          JOIN (SELECT doc_id, {cexpr} AS {name}_v FROM documents) b
            ON b.doc_id = a.doc_id + 1) AS runs,
         {plain} AS plain_bytes,
         {dstore} AS dict_store,
         {width} AS width"""


_ENC_COLS = [
    ("lang", "lang", "lang", True),
    ("src", "source", "source", True),
    ("blk", "doc_id // 50", "doc_id div 50", False),
    ("txt", "text", "text", True),
]


def _enc_oracle_sql() -> str:
    blocks = "\n       UNION ALL\n       ".join(
        _enc_block_sql(n, c, s) for n, c, _, s in _ENC_COLS)
    return f"""WITH p AS ({blocks}),
       e AS (SELECT col_name, n, ndv, runs, plain_bytes,
                    dict_store + (n * (CASE WHEN ndv = 1 THEN 0
                        ELSE length(bin(ndv - 1)) END) + 7) // 8
                      AS dict_bytes,
                    runs * (width + 4) AS rle_bytes
             FROM p)
       SELECT col_name, n, ndv, runs, plain_bytes,
              CAST(dict_bytes AS BIGINT) AS dict_bytes,
              CAST(rle_bytes AS BIGINT) AS rle_bytes,
              CASE WHEN plain_bytes <= dict_bytes
                    AND plain_bytes <= rle_bytes THEN 'plain'
                   WHEN dict_bytes <= rle_bytes THEN 'dict'
                   ELSE 'rle' END AS best_encoding
       FROM e"""


@query("q394_encoding_selection", _enc_oracle_sql())
def q394(spark, sf_dir):
    """Columnar encoding selection — the per-column writer decision
    every Parquet/ORC encoder makes (PLAIN vs DICTIONARY vs RLE),
    planned from exact column statistics: bytes_plain = data bytes,
    bytes_dict = dictionary store + n ceil(log2(ndv))-bit codes (the
    shared bin()-length idiom computes the bit width), bytes_rle =
    runs x (width + 4), where runs = 1 + adjacent-change count in
    doc_id order (a dense-key offset-1 equi-join — linear, never a
    global window).  The four profiled columns exercise every
    winner: lang/source (tiny lexicons) pick DICT, the sorted
    doc_id div 50 column (~n/50 runs) picks RLE, and high-cardinality
    text stays PLAIN (its dictionary IS the data plus code overhead).
    Tie order plain < dict < rle is pinned in one CASE chain shared
    by both engines.  Per column: one stats aggregation, one
    distinct-store aggregation, one adjacency join — all linear."""
    docs = _t(spark, sf_dir, "documents")
    outs = []
    for name, _, cexpr, is_string in _ENC_COLS:
        c = docs.selectExpr("doc_id", f"{cexpr} AS v")
        if is_string:
            st = c.agg(
                F.count("*").cast("long").alias("n"),
                F.countDistinct("v").cast("long").alias("ndv"),
                F.sum(F.length("v")).cast("long").alias("plain_bytes"),
                F.max(F.length("v")).cast("long").alias("width"),
            )
            ds = (c.select("v").distinct()
                  .agg(F.sum(F.length("v")).cast("long")
                       .alias("dict_store")))
        else:
            st = c.agg(
                F.count("*").cast("long").alias("n"),
                F.countDistinct("v").cast("long").alias("ndv"),
                (F.count("*") * 8).cast("long").alias("plain_bytes"),
                F.lit(8).cast("long").alias("width"),
            )
            ds = c.agg((F.countDistinct("v") * 8).cast("long")
                       .alias("dict_store"))
        b = c.selectExpr("doc_id + 1 AS nid", "v AS pv")
        runs = (
            c.join(b, c["doc_id"] == b["nid"])
            .agg((1 + F.sum(F.when(F.col("v") != F.col("pv"), 1)
                            .otherwise(0))).cast("long").alias("runs"))
        )
        outs.append(
            st.crossJoin(ds).crossJoin(runs)
            .select(F.lit(name).alias("col_name"), "n", "ndv", "runs",
                    "plain_bytes", "dict_store", "width")
        )
    p = outs[0]
    for o in outs[1:]:
        p = p.unionAll(o)
    e = p.selectExpr(
        "col_name", "n", "ndv", "runs", "plain_bytes",
        "CAST(dict_store + (n * (CASE WHEN ndv = 1 THEN 0 "
        "ELSE length(bin(ndv - 1)) END) + 7) div 8 AS BIGINT) "
        "AS dict_bytes",
        "CAST(runs * (width + 4) AS BIGINT) AS rle_bytes",
    )
    return e.selectExpr(
        "col_name", "n", "ndv", "runs", "plain_bytes", "dict_bytes",
        "rle_bytes",
        "CASE WHEN plain_bytes <= dict_bytes AND plain_bytes <= rle_bytes "
        "THEN 'plain' WHEN dict_bytes <= rle_bytes THEN 'dict' "
        "ELSE 'rle' END AS best_encoding",
    )
