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
  3. driver: union-find the same-region graph, aggregate region sizes,
     contract the region-level adjacency graph, and run the merge loop
     (small region → largest current neighbour, by (count, id) —
     deterministic).  The region graph is O(border features), the same
     small-graph judgment as the polygonize merge map
     (alg/gdalrasterpolygonenumerator.cpp:75-167);
  4. apply: broadcast the (tile, local_label) → merged dn map and
     relabel each tile independently (a second CCL pass per tile
     instead of shuffling label arrays).

Like the reference, masked (nodata) pixels take part in nothing: small
regions bordered only by nodata stay.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.kernels.ccl import border_runs, label_tile, region_table
from gdal_spark.operators.polygonize import _DSU

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


def sieve_tiles(
    tiles: DataFrame,
    threshold: int,
    nodata: float | None = 0.0,
    connect8: bool = False,
    tile_size: int = 256,
) -> DataFrame:
    """→ relabeled tile rows (tx, ty, data float64, dtype) with every
    under-threshold region merged into its largest neighbour."""
    spark = tiles.sparkSession
    mixed = _tile_pass(tiles, nodata, connect8, tile_size).persist()
    borders = mixed.filter(F.col("kind") == "B").drop("kind", "pixel_count", "lab_b")
    pairs = _cross_tile_pairs(borders, connect8, tile_size)

    # same-region merge edges = equal-dn facing overlaps
    same = pairs.filter(F.col("dn") == F.col("rdn")).collect()
    dsu = _DSU()
    for r in same:
        dsu.union(
            (r["tx"], r["ty"], r["local_label"]), (r["rtx"], r["rty"], r["rlabel"])
        )

    regions = mixed.filter(F.col("kind") == "R").select(
        "tx", "ty", "local_label", "dn", "pixel_count"
    ).collect()
    root_of = {}
    dn_of = {}
    count = {}
    for r in regions:
        key = (r["tx"], r["ty"], r["local_label"])
        root = dsu.find(key)
        root_of[key] = root
        dn_of[root] = r["dn"]
        count[root] = count.get(root, 0) + r["pixel_count"]

    # region-level adjacency (contracted through the same-region roots)
    adj: dict = {}
    intile = mixed.filter(F.col("kind") == "A").select(
        "tx", "ty", "local_label", "lab_b"
    ).collect()
    cross = pairs.filter(F.col("dn") != F.col("rdn")).select(
        "tx", "ty", "local_label", "rtx", "rty", "rlabel"
    ).collect()

    def add_edge(a, b):
        ra = root_of.get(a, a)
        rb = root_of.get(b, b)
        if ra != rb:
            adj.setdefault(ra, set()).add(rb)
            adj.setdefault(rb, set()).add(ra)

    for r in intile:
        add_edge(
            (r["tx"], r["ty"], r["local_label"]), (r["tx"], r["ty"], r["lab_b"])
        )
    for r in cross:
        add_edge(
            (r["tx"], r["ty"], r["local_label"]), (r["rtx"], r["rty"], r["rlabel"])
        )

    # merge loop: deterministic passes until no under-threshold region
    # with a neighbour remains.  merged DSU tracks absorption.
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

    # final (tile, label) → merged dn
    out_map = [
        (int(k[0]), int(k[1]), int(k[2]), float(dn_of[rep(root)]))
        for k, root in root_of.items()
    ]
    map_df = spark.createDataFrame(
        out_map, "tx long, ty long, local_label int, new_dn double"
    )

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
        lut = np.full(max(lut_max, 1), nd, dtype=np.float64)
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
