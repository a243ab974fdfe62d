"""Distributed GDALSieveFilter with MERGE semantics: raster regions
smaller than the threshold are absorbed into their largest neighbour
and the raster is relabeled.

Reference: ``GDALSieveFilter`` (alg/sievefilter.cpp) enumerates
polygons with the same two-pass CCL as polygonize, then repeatedly
merges every small polygon into its largest neighbour until no
under-threshold polygon remains, and writes the merged values back.

Distributed decomposition (same skeleton as ``operators.polygonize``):

  1. per tile: CCL + region summaries + border runs + IN-TILE label
     adjacency pairs (one vectorized shift-compare per axis);
  2. cross-tile: facing border-run join — equal-dn overlaps are
     same-region merge edges (exactly ``polygonize._merge_edges``),
     different-dn overlaps are region ADJACENCY;
  3. same-region roots via ``polygonize._label_roots`` — driver
     union-find below the size threshold, distributed pointer-jumping
     CC past it; region sizes and the contracted region-level
     adjacency are DataFrame aggregations (groupBy root / distinct
     root-pair join), never collected in full;
  4. driver: collect ONLY the under-threshold subgraph — small-region
     stats plus adjacency edges incident to a small region plus those
     neighbours' stats — and run the merge loop there (small region →
     largest current neighbour, by (count, id) — deterministic).
     Sufficient because absorption only ever grows regions: a region
     ≥ threshold at the start can never be absorbed, so the loop's
     reachable state is exactly the small-incident subgraph.  Driver
     memory is O(small regions), not O(regions) or O(border runs);
  5. apply: broadcast the (tile, local_label) → merged dn map
     (CHANGED regions only) and relabel each tile independently (a
     second CCL pass per tile instead of shuffling label arrays);
     unchanged labels keep their own dn from the tile itself.

Like the reference, masked (nodata) pixels take part in nothing: small
regions bordered only by nodata stay.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.session import local_df

from gdal_spark.kernels.ccl import border_runs, label_tile, region_table
from gdal_spark.operators.polygonize import _DSU, _label_roots

_MIX_SCHEMA = T.StructType(
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
        T.StructField("lab_b", T.IntegerType()),
    ]
)

TILE_OUT_SCHEMA = T.StructType(
    [
        T.StructField("tx", T.LongType()),
        T.StructField("ty", T.LongType()),
        T.StructField("data", T.BinaryType()),
        T.StructField("dtype", T.StringType()),
    ]
)


def _tile_pass(tiles: DataFrame, nodata, connect8, tile_size):
    ts = tile_size

    def gen(pdf_iter):
        for pdf in pdf_iter:
            rows = []
            for _, row in pdf.iterrows():
                arr = np.frombuffer(row["data"], dtype=np.dtype(row["dtype"])).reshape(ts, ts)
                tx, ty = int(row["tx"]), int(row["ty"])
                mask = None if nodata is None else arr != nodata
                labels = label_tile(arr, mask=mask, connect8=connect8)
                for lab, dn, cnt, _, _ in region_table(arr, labels):
                    rows.append(("R", tx, ty, lab, float(dn), cnt, None, None, None, None))
                for side, s, e, lab, dn in border_runs(arr, labels):
                    rows.append(("B", tx, ty, lab, float(dn), None, side, s, e, None))
                # in-tile adjacency: different labels, both valid
                # (diagonal shifts included under 8-connectivity)
                shifts = [
                    (labels[:, :-1], labels[:, 1:]),
                    (labels[:-1, :], labels[1:, :]),
                ]
                if connect8:
                    shifts += [
                        (labels[:-1, :-1], labels[1:, 1:]),
                        (labels[:-1, 1:], labels[1:, :-1]),
                    ]
                for a, b in shifts:
                    m = (a >= 0) & (b >= 0) & (a != b)
                    if m.any():
                        pairs = np.unique(
                            np.stack([a[m], b[m]], axis=1), axis=0
                        )
                        for la, lb in pairs.tolist():
                            rows.append(("A", tx, ty, int(la), 0.0, None, None, None, None, int(lb)))
            yield pd.DataFrame(
                rows,
                columns=["kind", "tx", "ty", "local_label", "dn", "pixel_count",
                         "side", "start", "end", "lab_b"],
            )

    return tiles.mapInPandas(gen, _MIX_SCHEMA)


def _cross_tile_pairs(borders: DataFrame, connect8: bool, tile_size: int):
    """Facing-run join WITHOUT the dn-equality predicate: overlapping
    region contacts across tile edges.  Under 8-connectivity the
    interval test relaxes to ±1 touch and the diagonal tile-corner
    contacts are added — same geometry as ``polygonize._merge_edges``
    but keeping (dn, rdn) so callers can split same-region merges
    (dn == rdn) from cross-region adjacency (dn != rdn)."""
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
        (F.col("rtx") == F.col("tx") + 1) & (F.col("rty") == F.col("ty")) & ov,
    )
    south = borders.filter(F.col("side") == "S").join(
        right.filter(F.col("rside") == "N"),
        (F.col("rtx") == F.col("tx")) & (F.col("rty") == F.col("ty") + 1) & ov,
    )
    parts = [east, south]
    if connect8:
        se = borders.filter(
            (F.col("side") == "S") & (F.col("end") == tile_size)
        ).join(
            right.filter((F.col("rside") == "N") & (F.col("rstart") == 0)),
            (F.col("rtx") == F.col("tx") + 1) & (F.col("rty") == F.col("ty") + 1),
        )
        sw = borders.filter(
            (F.col("side") == "S") & (F.col("start") == 0)
        ).join(
            right.filter((F.col("rside") == "N") & (F.col("rend") == tile_size)),
            (F.col("rtx") == F.col("tx") - 1) & (F.col("rty") == F.col("ty") + 1),
        )
        parts += [se, sw]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "tx", "ty", "local_label", "dn", "rtx", "rty", "rlabel", "rdn"
    )


def _contract(
    df: DataFrame,
    root_map: DataFrame | None,
    src: tuple[str, str, str],
    out: tuple[str, str, str],
) -> DataFrame:
    """Map the (tile, label) node columns ``src`` of ``df`` through the
    root map into new columns ``out``, defaulting unmapped nodes to
    themselves.  Column names are fully parameterised so both endpoints
    of an edge table can be contracted in one plan."""
    if root_map is None:
        return (
            df.withColumn(out[0], F.col(src[0]).cast("long"))
            .withColumn(out[1], F.col(src[1]).cast("long"))
            .withColumn(out[2], F.col(src[2]).cast("int"))
        )
    k0, k1, k2 = (s + "__k" for s in src)
    m0, m1, m2 = (o + "__m" for o in out)
    rm = root_map.select(
        F.col("tx").alias(k0),
        F.col("ty").alias(k1),
        F.col("local_label").alias(k2),
        F.col("root_tx").alias(m0),
        F.col("root_ty").alias(m1),
        F.col("root_label").alias(m2),
    )
    joined = df.join(
        rm,
        (F.col(src[0]) == F.col(k0))
        & (F.col(src[1]) == F.col(k1))
        & (F.col(src[2]) == F.col(k2)),
        "left",
    )
    return (
        joined.withColumn(out[0], F.coalesce(m0, F.col(src[0]).cast("long")))
        .withColumn(out[1], F.coalesce(m1, F.col(src[1]).cast("long")))
        .withColumn(out[2], F.coalesce(m2, F.col(src[2]).cast("int")))
        .drop(k0, k1, k2, m0, m1, m2)
    )


def sieve_tiles(
    tiles: DataFrame,
    threshold: int,
    nodata: float | None = 0.0,
    connect8: bool = False,
    tile_size: int = 256,
    cc_threshold: int = 200_000,
) -> DataFrame:
    """→ relabeled tile rows (tx, ty, data float64, dtype) with every
    under-threshold region merged into its largest neighbour."""
    spark = tiles.sparkSession
    mixed = _tile_pass(tiles, nodata, connect8, tile_size).persist()
    borders = mixed.filter(F.col("kind") == "B").drop("kind", "pixel_count", "lab_b")
    pairs = _cross_tile_pairs(borders, connect8, tile_size).persist()

    # same-region merge edges = equal-dn facing overlaps → roots
    # (driver union-find under cc_threshold, distributed CC past it)
    same = pairs.filter(F.col("dn") == F.col("rdn")).select(
        "tx", "ty", "local_label", "rtx", "rty", "rlabel"
    )
    root_map = _label_roots(spark, same, threshold=cc_threshold)

    # per-root size + dn, computed distributively (dn is constant
    # within a root: merge edges require dn == rdn)
    regions = mixed.filter(F.col("kind") == "R").select(
        "tx", "ty", "local_label", "dn", "pixel_count"
    )
    keyed = _contract(
        regions, root_map, ("tx", "ty", "local_label"), ("root_tx", "root_ty", "root_label")
    )
    root_stats = (
        keyed.groupBy("root_tx", "root_ty", "root_label")
        .agg(F.sum("pixel_count").alias("total"), F.min("dn").alias("dn"))
        .persist()
    )

    # region-level adjacency contracted through the roots: in-tile
    # different-label contacts + cross-tile different-dn contacts
    intile = mixed.filter(F.col("kind") == "A").select(
        "tx", "ty", "local_label",
        F.col("tx").alias("btx"), F.col("ty").alias("bty"),
        F.col("lab_b").alias("blabel"),
    )
    cross = pairs.filter(F.col("dn") != F.col("rdn")).select(
        "tx", "ty", "local_label",
        F.col("rtx").alias("btx"), F.col("rty").alias("bty"),
        F.col("rlabel").alias("blabel"),
    )
    contacts = intile.unionByName(cross)
    ca = _contract(
        contacts, root_map, ("tx", "ty", "local_label"), ("root_tx", "root_ty", "root_label")
    )
    cb = _contract(
        ca, root_map, ("btx", "bty", "blabel"), ("broot_tx", "broot_ty", "broot_label")
    )
    adj_edges = (
        cb.filter(
            (F.col("root_tx") != F.col("broot_tx"))
            | (F.col("root_ty") != F.col("broot_ty"))
            | (F.col("root_label") != F.col("broot_label"))
        )
        .select(
            "root_tx", "root_ty", "root_label",
            "broot_tx", "broot_ty", "broot_label",
        )
        .distinct()
        .persist()
    )

    # collect ONLY the under-threshold subgraph: small-region stats,
    # edges incident to a small region, and those neighbours' stats.
    small = root_stats.filter(F.col("total") < threshold)
    small_keys = small.select("root_tx", "root_ty", "root_label")
    inc_a = adj_edges.join(small_keys, ["root_tx", "root_ty", "root_label"], "leftsemi")
    inc_b = adj_edges.join(
        small_keys.select(
            F.col("root_tx").alias("broot_tx"),
            F.col("root_ty").alias("broot_ty"),
            F.col("root_label").alias("broot_label"),
        ),
        ["broot_tx", "broot_ty", "broot_label"],
        "leftsemi",
    )
    incident = inc_a.unionByName(inc_b).distinct().collect()
    endpoints = {}
    adj: dict = {}
    for r in incident:
        a = (r["root_tx"], r["root_ty"], r["root_label"])
        b = (r["broot_tx"], r["broot_ty"], r["broot_label"])
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
        endpoints[a] = None
        endpoints[b] = None
    ep_df = local_df(spark, 
        [(int(k[0]), int(k[1]), int(k[2])) for k in endpoints] or [(0, 0, -1)],
        "root_tx long, root_ty long, root_label int",
    )
    need_stats = root_stats.join(
        ep_df, ["root_tx", "root_ty", "root_label"], "leftsemi"
    ).unionByName(small).distinct()
    count = {}
    dn_of = {}
    for r in need_stats.collect():
        k = (r["root_tx"], r["root_ty"], r["root_label"])
        count[k] = r["total"]
        dn_of[k] = r["dn"]
    pairs.unpersist()
    adj_edges.unpersist()

    # merge loop: deterministic passes until no under-threshold region
    # with a neighbour remains.  merged DSU tracks absorption.  Only
    # initially-small regions can ever be absorbed (sizes only grow),
    # so iterating the collected subgraph replays the full-graph loop
    # exactly — large or isolated regions would be skipped anyway.
    merged = _DSU()

    def rep(x):
        return merged.find(x)

    changed = True
    while changed:
        changed = False
        for r in sorted(count):
            cur = rep(r)
            if cur != r:
                continue
            if count[cur] >= threshold:
                continue
            nbrs = {rep(n) for n in adj.get(cur, ())} - {cur}
            if not nbrs:
                continue
            target = max(nbrs, key=lambda n: (count[n], tuple(-v for v in n)))
            # directed absorption: cur's tree now points at target
            rep(cur), rep(target)  # ensure both present
            merged.p[cur] = rep(target)
            count[rep(target)] += count[cur]
            adj.setdefault(rep(target), set()).update(adj.get(cur, ()))
            changed = True

    # CHANGED roots only → (tile, label) → merged dn, via one
    # distributed join through the root map (no O(regions) driver list)
    changed_rows = [
        (int(k[0]), int(k[1]), int(k[2]), float(dn_of[rep(k)]))
        for k in count
        if rep(k) != k
    ]
    if changed_rows:
        changed_df = local_df(spark, 
            changed_rows, "root_tx long, root_ty long, root_label int, new_dn double"
        )
        map_df = keyed.join(
            F.broadcast(changed_df), ["root_tx", "root_ty", "root_label"], "inner"
        ).select("tx", "ty", "local_label", "new_dn")
    else:
        map_df = local_df(spark, 
            [], "tx long, ty long, local_label int, new_dn double"
        )
    root_stats.unpersist()

    ts = tile_size
    nd = 0.0 if nodata is None else float(nodata)

    def apply_tile(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(key[0]), int(key[1])
        tile_row = pdf.iloc[0]
        arr = np.frombuffer(
            tile_row["data"], dtype=np.dtype(tile_row["dtype"])
        ).reshape(ts, ts)
        mask = None if nodata is None else arr != nodata
        labels = label_tile(arr, mask=mask, connect8=connect8)
        lut_max = int(labels.max()) + 1 if labels.size else 0
        # default: every label keeps its own dn (only CHANGED regions
        # appear in the map)
        lut = np.full(max(lut_max, 1), nd, dtype=np.float64)
        for lab, dn, _cnt, _, _ in region_table(arr, labels):
            if 0 <= lab < lut_max:
                lut[lab] = dn
        for ll, ndn in zip(pdf["local_label"], pdf["new_dn"]):
            if pd.notna(ll) and 0 <= int(ll) < lut_max:
                lut[int(ll)] = ndn
        out = np.where(labels >= 0, lut[np.clip(labels, 0, None)], nd)
        return pd.DataFrame(
            {
                "tx": [tx],
                "ty": [ty],
                "data": [out.astype(np.float64).tobytes()],
                "dtype": ["float64"],
            }
        )

    joined = tiles.select("tx", "ty", "data", "dtype").join(
        F.broadcast(map_df), ["tx", "ty"], "left"
    )
    return joined.groupBy("tx", "ty").applyInPandas(apply_tile, TILE_OUT_SCHEMA)
