"""Distributed rasterize: vector → tile table.

Reference semantics: GDALRasterizeGeometries/Layers burns shapes into
a chunked raster buffer (alg/gdalrasterize.cpp:999-1220); chunk =
CHUNKYSIZE scanlines bounded by cache.  The Spark physical plan makes
the chunk the unit of parallelism: one task burns one (z, tx, ty)
tile, features are exploded onto every tile their bbox covers (no
cross-task halo needed — burning is local to a tile), and the tile
table is partitioned by zoom so a 1000-executor cluster writes the
pyramid level in one wave.

Tile table schema (the Spark mapping of GDALRasterBand blocks,
gcore/gdal_rasterband.h:149-150):
  z int, tx long, ty long, band int, data binary (row-major ndarray),
  dtype string, nodata double

Two entry points:
- ``rasterize_points``  — value/count burn of a point DataFrame
  (the web-density tile case: groupBy tile is an exact shuffle on the
  tile key with map-side combine via the in-kernel bincount)
- ``rasterize_features`` — polygon/line burn via applyInPandas per
  tile with the exact scanline/Bresenham kernels
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.kernels import wkb as W
from gdal_spark.kernels.burn import (
    burn_all_touched_line,
    burn_line,
    burn_points,
    burn_polygon,
    world_to_pixel,
)
from gdal_spark.kernels.geodesy import TILE_SIZE, lonlat_to_webmerc, tile_geotransform, tile_of_webmerc

TILE_SCHEMA = T.StructType(
    [
        T.StructField("z", T.IntegerType()),
        T.StructField("tx", T.LongType()),
        T.StructField("ty", T.LongType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("data", T.BinaryType()),
        T.StructField("dtype", T.StringType()),
        T.StructField("nodata", T.DoubleType()),
    ]
)


def with_tile(points: DataFrame, z: int, lon="lon", lat="lat") -> DataFrame:
    """Attach WebMercator (tx, ty) at zoom z (vectorized kernel)."""

    @F.pandas_udf(
        T.StructType([T.StructField("tx", T.LongType()), T.StructField("ty", T.LongType())])
    )
    def enc(lo: pd.Series, la: pd.Series) -> pd.DataFrame:
        mx, my = lonlat_to_webmerc(lo.to_numpy(np.float64), la.to_numpy(np.float64))
        tx, ty = tile_of_webmerc(mx, my, z)
        return pd.DataFrame({"tx": tx, "ty": ty})

    return points.withColumn("_t", enc(F.col(lon), F.col(lat))).select(
        "*", F.col("_t.tx").alias("tx"), F.col("_t.ty").alias("ty")
    ).drop("_t")


def rasterize_points(
    points: DataFrame,
    z: int,
    lon: str = "lon",
    lat: str = "lat",
    value: str | None = None,
    dtype: str = "int32",
    tile_size: int = TILE_SIZE,
    salt: int = 32,
) -> DataFrame:
    """Point-density (or value-sum) tiles at zoom z.

    Shuffle analysis: point burn is ADD-mergeable, so the plan is a
    SALTED two-phase aggregation — the tile key alone is badly skewed
    on real corpora (web pages pile onto a handful of metro tiles; the
    bench fixture's hottest z8 tile holds 27% of all points, which
    would serialize the stage on one task no matter the cluster size).
    Phase 1 shuffles points on (tx, ty, salt) where salt is a
    deterministic hash of the coordinates mod ``salt``, so the hottest
    tile fans out across ``salt`` reducers, each burning a partial
    tile with the same bincount kernel (ADD merge semantics of the
    reference's point burn, alg/gdalrasterize.cpp:312-390).  Phase 2
    shuffles only the partial tiles — O(non-empty tiles × salt) rows,
    independent of corpus size — and sums them vectorized per tile,
    in salt order so float-valued burns are deterministic.  Output
    rows are O(non-empty tiles), orders of magnitude smaller than the
    input.  ``salt=1`` reproduces the single-phase plan.
    """
    pts = with_tile(points, z, lon, lat)
    cols = [lon, lat] + ([value] if value else [])

    def burn_tile(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(key[0]), int(key[1])
        gt = tile_geotransform(z, tx, ty, tile_size)
        mx, my = lonlat_to_webmerc(
            pdf[lon].to_numpy(np.float64), pdf[lat].to_numpy(np.float64)
        )
        px_, py_ = world_to_pixel(mx, my, gt)
        arr = np.zeros((tile_size, tile_size), dtype=np.dtype(dtype))
        if value is None:
            burn_points(arr, px_, py_, 1, merge_add=True)
        else:
            vals = pdf[value].to_numpy(np.float64)
            # per-pixel sum of values: vectorized bincount weighted add
            m = (px_ >= 0) & (px_ < tile_size) & (py_ >= 0) & (py_ < tile_size)
            flat = py_[m].astype(np.int64) * tile_size + px_[m].astype(np.int64)
            acc = np.bincount(flat, weights=vals[m], minlength=tile_size * tile_size)
            arr = acc.reshape(tile_size, tile_size).astype(np.dtype(dtype))
        return pd.DataFrame(
            {
                "z": [z],
                "tx": [tx],
                "ty": [ty],
                "band": [1],
                "data": [arr.tobytes()],
                "dtype": [dtype],
                "nodata": [0.0],
            }
        )

    if salt <= 1:
        return pts.select("tx", "ty", *cols).groupBy("tx", "ty").applyInPandas(
            burn_tile, TILE_SCHEMA
        )

    partial_schema = T.StructType(
        TILE_SCHEMA.fields + [T.StructField("salt", T.IntegerType())]
    )

    def burn_partial(key, pdf: pd.DataFrame) -> pd.DataFrame:
        out = burn_tile(key[:2], pdf)
        out["salt"] = int(key[2])
        return out

    def merge_partials(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("salt")
        dt = np.dtype(pdf["dtype"].iloc[0])
        acc = np.frombuffer(pdf["data"].iloc[0], dtype=dt).copy()
        for blob in pdf["data"].iloc[1:]:
            acc += np.frombuffer(blob, dtype=dt)
        out = pdf.iloc[:1].drop(columns=["salt"]).copy()
        out["data"] = [acc.tobytes()]
        return out

    salted = pts.select("tx", "ty", *cols).withColumn(
        "_salt", F.pmod(F.hash(F.col(lon), F.col(lat)), F.lit(int(salt)))
    )
    partials = salted.groupBy("tx", "ty", "_salt").applyInPandas(
        burn_partial, partial_schema
    )
    return partials.groupBy("tx", "ty").applyInPandas(merge_partials, TILE_SCHEMA)


def rasterize_features(
    features: DataFrame,
    z: int,
    burn_value_col: str = "burn",
    geom_col: str = "geom",
    dtype: str = "float64",
    merge_add: bool = False,
    all_touched: bool = False,
    tile_size: int = TILE_SIZE,
) -> DataFrame:
    """Burn WKB polygon/line features into zoom-z tiles.

    Features are exploded onto every tile their envelope covers
    (WKB-direct bbox, no full parse — OGRWKBGetBoundingBox's role),
    then one task burns one tile with the exact scanline kernels.
    Feature burn order within a tile follows a deterministic
    (_feature_seq) sort so MERGE=REPLACE output is reproducible on any
    cluster — the distributed stand-in for the reference's layer
    iteration order.
    """

    @F.pandas_udf(T.ArrayType(T.ArrayType(T.LongType())))
    def covered_tiles(geoms: pd.Series) -> pd.Series:
        out = []
        for blob in geoms:
            xmin, ymin, xmax, ymax = W.wkb_bbox(bytes(blob))
            mx, my = lonlat_to_webmerc(np.array([xmin, xmax]), np.array([ymin, ymax]))
            tx0, ty1 = tile_of_webmerc(mx[0], my[0], z)
            tx1, ty0 = tile_of_webmerc(mx[1], my[1], z)
            tiles = [
                [int(tx), int(ty)]
                for tx in range(int(tx0), int(tx1) + 1)
                for ty in range(int(ty0), int(ty1) + 1)
            ]
            out.append(tiles)
        return pd.Series(out)

    feats = (
        features.withColumn("_feature_seq", F.monotonically_increasing_id())
        .withColumn("_tile", F.explode(covered_tiles(F.col(geom_col))))
        .withColumn("tx", F.col("_tile")[0])
        .withColumn("ty", F.col("_tile")[1])
        .drop("_tile")
    )

    def burn_tile(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(key[0]), int(key[1])
        gt = tile_geotransform(z, tx, ty, tile_size)
        arr = np.zeros((tile_size, tile_size), dtype=np.dtype(dtype))
        pdf = pdf.sort_values("_feature_seq")
        for blob, bv in zip(pdf[geom_col], pdf[burn_value_col]):
            gtype, parts = W.parse_wkb(bytes(blob))
            visited: set = set()
            if gtype in (W.POLYGON, W.MULTIPOLYGON):
                polys = W.polygon_rings(bytes(blob))
                for rings in polys:
                    pix_rings = []
                    for r in rings:
                        mx, my = lonlat_to_webmerc(r[:, 0], r[:, 1])
                        px_, py_ = world_to_pixel(mx, my, gt)
                        pix_rings.append(np.column_stack([px_, py_]))
                    burn_polygon(arr, pix_rings, float(bv), merge_add=merge_add)
            elif gtype in (W.LINESTRING, W.MULTILINESTRING):
                lines = [parts] if gtype == W.LINESTRING else [p for _, p in parts]
                for coords in lines:
                    mx, my = lonlat_to_webmerc(coords[:, 0], coords[:, 1])
                    px_, py_ = world_to_pixel(mx, my, gt)
                    fn = burn_all_touched_line if all_touched else burn_line
                    fn(arr, px_, py_, float(bv), merge_add=merge_add, visited=visited)
            elif gtype == W.POINT:
                mx, my = lonlat_to_webmerc(parts[:, 0], parts[:, 1])
                px_, py_ = world_to_pixel(mx, my, gt)
                burn_points(arr, px_, py_, float(bv), merge_add=merge_add)
        return pd.DataFrame(
            {
                "z": [z],
                "tx": [tx],
                "ty": [ty],
                "band": [1],
                "data": [arr.tobytes()],
                "dtype": [dtype],
                "nodata": [0.0],
            }
        )

    return (
        feats.select("tx", "ty", "_feature_seq", geom_col, burn_value_col)
        .groupBy("tx", "ty")
        .applyInPandas(burn_tile, TILE_SCHEMA)
    )


def rasterize_wkb_grid(
    features: DataFrame,
    gt: tuple[float, ...],
    width: int,
    height: int,
    tile_size: int = 64,
    burn_value_col: str = "burn",
    geom_col: str = "geom",
    dtype: str = "float64",
    merge_add: bool = False,
    all_touched: bool = False,
    salt: int | None = None,
) -> DataFrame:
    """GDALRasterizeLayers analog onto an arbitrary target grid: burn
    WKB polygon features into a ``width × height`` raster defined by a
    6-coefficient geotransform, stored as ``tile_size²`` blocks.

    Distribution: features explode onto the blocks their envelope
    covers (one shuffle keyed by block), each task burns one block with
    the exact scanline kernel.  Per-block burn == global burn
    restricted to the block because block origins are integer pixel
    translations (the scanline rule is translation-invariant), the
    distributed equivalent of the reference's CHUNKYSIZE chunked burn
    (alg/gdalrasterize.cpp:1183-1220).

    ``merge_add=False`` (REPLACE) burns in deterministic
    ``_feature_seq`` order; ``merge_add=True`` (ADD) is order-free.

    ``salt`` > 1 splits each block's feature list across ``salt``
    reducers keyed by ``_feature_seq % salt`` — the skew escape for a
    hot block covered by a large share of all features (same shape as
    ``rasterize_points``).  ADD partials merge by vectorized sum;
    REPLACE partials additionally burn each feature's sequence number
    into a parallel array with the same kernels, and the merge keeps
    the per-pixel value of the HIGHEST sequence — exactly the
    last-writer order the single-phase plan burns in.  Features are
    never split across salts, so within-feature semantics (line
    ``visited`` sets, ring nesting) are untouched; parity with the
    single-phase plan is bitwise (tests/test_rasterize_salted.py).
    Sequence numbers ride float64 arrays — exact below 2^53, far above
    any realistic feature count."""
    ntx = (width + tile_size - 1) // tile_size
    nty = (height + tile_size - 1) // tile_size

    @F.pandas_udf(T.ArrayType(T.ArrayType(T.LongType())))
    def covered(geoms: pd.Series) -> pd.Series:
        out = []
        for blob in geoms:
            xmin, ymin, xmax, ymax = W.wkb_bbox(bytes(blob))
            px, py = world_to_pixel(
                np.array([xmin, xmax]), np.array([ymin, ymax]), gt
            )
            x0, x1 = sorted([px[0], px[1]])
            y0, y1 = sorted([py[0], py[1]])
            tx0 = max(int(np.floor(x0 / tile_size)), 0)
            tx1 = min(int(np.floor(x1 / tile_size)), ntx - 1)
            ty0 = max(int(np.floor(y0 / tile_size)), 0)
            ty1 = min(int(np.floor(y1 / tile_size)), nty - 1)
            out.append(
                [[tx, ty] for tx in range(tx0, tx1 + 1) for ty in range(ty0, ty1 + 1)]
            )
        return pd.Series(out)

    feats = (
        features.withColumn("_feature_seq", F.monotonically_increasing_id())
        .withColumn("_tile", F.explode(covered(F.col(geom_col))))
        .withColumn("tx", F.col("_tile")[0])
        .withColumn("ty", F.col("_tile")[1])
        .drop("_tile")
    )

    def _burn(key, pdf: pd.DataFrame, seqarr: np.ndarray | None) -> np.ndarray:
        tx, ty = int(key[0]), int(key[1])
        nx = min(tile_size, width - tx * tile_size)
        ny = min(tile_size, height - ty * tile_size)
        arr = np.zeros((ny, nx), dtype=np.dtype(dtype))
        pdf = pdf.sort_values("_feature_seq")
        for blob, bv, seq in zip(
            pdf[geom_col], pdf[burn_value_col], pdf["_feature_seq"]
        ):
            gtype, parts = W.parse_wkb(bytes(blob))
            if gtype in (W.LINESTRING, W.MULTILINESTRING):
                lines = [parts] if gtype == W.LINESTRING else [p for _, p in parts]
                visited: set = set()
                line_fn = burn_all_touched_line if all_touched else burn_line
                for coords in lines:
                    px_, py_ = world_to_pixel(coords[:, 0], coords[:, 1], gt)
                    line_fn(
                        arr, px_ - tx * tile_size, py_ - ty * tile_size, float(bv),
                        merge_add=merge_add, visited=visited if merge_add else None,
                    )
                    if seqarr is not None:
                        line_fn(
                            seqarr, px_ - tx * tile_size, py_ - ty * tile_size,
                            float(seq) + 1.0, merge_add=False,
                        )
                continue
            for rings in W.polygon_rings(bytes(blob)):
                pix_rings = []
                for r in rings:
                    px_, py_ = world_to_pixel(r[:, 0], r[:, 1], gt)
                    pix_rings.append(
                        np.column_stack([px_ - tx * tile_size, py_ - ty * tile_size])
                    )
                burn_polygon(arr, pix_rings, float(bv), merge_add=merge_add)
                if seqarr is not None:
                    burn_polygon(seqarr, pix_rings, float(seq) + 1.0, merge_add=False)
        return arr

    def _row(tx, ty, arr, extra=None):
        d = {
            "z": [0], "tx": [tx], "ty": [ty], "band": [1],
            "data": [arr.tobytes()], "dtype": [dtype], "nodata": [0.0],
        }
        if extra:
            d.update(extra)
        return pd.DataFrame(d)

    def burn_tile(key, pdf: pd.DataFrame) -> pd.DataFrame:
        arr = _burn(key, pdf, None)
        return _row(int(key[0]), int(key[1]), arr)

    keyed = feats.select("tx", "ty", "_feature_seq", geom_col, burn_value_col)
    if not salt or salt <= 1:
        return keyed.groupBy("tx", "ty").applyInPandas(burn_tile, TILE_SCHEMA)

    partial_schema = T.StructType(
        TILE_SCHEMA.fields
        + [T.StructField("salt", T.IntegerType()), T.StructField("seq", T.BinaryType())]
    )

    def burn_partial(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(key[0]), int(key[1])
        nx = min(tile_size, width - tx * tile_size)
        ny = min(tile_size, height - ty * tile_size)
        seqarr = None if merge_add else np.zeros((ny, nx), dtype=np.float64)
        arr = _burn(key[:2], pdf, seqarr)
        return _row(tx, ty, arr, {
            "salt": [int(key[2])],
            "seq": [b"" if seqarr is None else seqarr.tobytes()],
        })

    def merge_partials(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("salt")
        dt = np.dtype(pdf["dtype"].iloc[0])
        acc = np.frombuffer(pdf["data"].iloc[0], dtype=dt).copy()
        if merge_add:
            for blob in pdf["data"].iloc[1:]:
                acc += np.frombuffer(blob, dtype=dt)
        else:
            acc_seq = np.frombuffer(pdf["seq"].iloc[0], dtype=np.float64).copy()
            for blob, sblob in zip(pdf["data"].iloc[1:], pdf["seq"].iloc[1:]):
                v = np.frombuffer(blob, dtype=dt)
                s = np.frombuffer(sblob, dtype=np.float64)
                newer = s > acc_seq
                acc[newer] = v[newer]
                acc_seq[newer] = s[newer]
        out = pdf.iloc[:1].drop(columns=["salt", "seq"]).copy()
        out["data"] = [acc.tobytes()]
        return out

    salted = keyed.withColumn(
        "_salt", F.pmod(F.col("_feature_seq"), F.lit(int(salt))).cast("int")
    )
    partials = salted.groupBy("tx", "ty", "_salt").applyInPandas(
        burn_partial, partial_schema
    )
    return partials.groupBy("tx", "ty").applyInPandas(merge_partials, TILE_SCHEMA)


def tiles_to_features(
    tiles: DataFrame, tile_size: int, nodata: float | None = 0.0
) -> DataFrame:
    """``gdal raster as-features`` analog (apps/gdalalg_raster_as_features.h:28-33):
    one row per (non-nodata) pixel with global pixel coords and value.
    mapInPandas — embarrassingly parallel over tile rows."""
    out_schema = T.StructType(
        [
            T.StructField("gx", T.LongType()),
            T.StructField("gy", T.LongType()),
            T.StructField("v", T.DoubleType()),
        ]
    )

    def gen(pdf_iter):
        for pdf in pdf_iter:
            frames = []
            for _, row in pdf.iterrows():
                arr = np.frombuffer(row["data"], dtype=np.dtype(row["dtype"]))
                ny = arr.size // tile_size if arr.size % tile_size == 0 else None
                if ny is None:
                    raise ValueError("ragged tile buffer")
                arr = arr.reshape(ny, tile_size)
                if nodata is None:
                    mask = np.ones_like(arr, dtype=bool)
                else:
                    mask = arr != nodata
                ys, xs = np.nonzero(mask)
                frames.append(
                    pd.DataFrame(
                        {
                            "gx": xs + int(row["tx"]) * tile_size,
                            "gy": ys + int(row["ty"]) * tile_size,
                            "v": arr[ys, xs].astype(np.float64),
                        }
                    )
                )
            yield pd.concat(frames) if frames else pd.DataFrame(
                {"gx": [], "gy": [], "v": []}
            )

    return tiles.mapInPandas(gen, out_schema)


def checksum_tiles(tiles: DataFrame, tile_size: int, width: int) -> DataFrame:
    """Distributed GDALChecksumImage (alg/gdalchecksum.cpp:48-120): the
    formula is a sum of per-pixel remainders keyed by the GLOBAL pixel
    index, so it distributes as per-tile partials + one masked final
    sum.  Absent tiles are all-zero and contribute 0 (0 % p == 0), so
    the sparse tile table checksums identically to the dense raster."""
    from gdal_spark.kernels.checksum import _PRIMES

    def partial(pdf_iter):
        for pdf in pdf_iter:
            totals = []
            for _, row in pdf.iterrows():
                arr = np.frombuffer(row["data"], dtype=np.dtype(row["dtype"])).reshape(
                    tile_size, tile_size
                )
                if np.issubdtype(arr.dtype, np.floating):
                    vals = np.floor(arr.astype(np.float64) + 0.5).astype(np.int64)
                else:
                    vals = arr.astype(np.int64)
                gx = np.arange(tile_size) + int(row["tx"]) * tile_size
                gy = np.arange(tile_size) + int(row["ty"]) * tile_size
                GX, GY = np.meshgrid(gx, gy)
                idx = (GY.astype(np.int64) * width + GX) % 11
                totals.append(int(np.sum(vals % _PRIMES[idx])))
            yield pd.DataFrame({"partial": totals})

    partials = tiles.mapInPandas(partial, "partial long")
    return partials.agg(
        (F.sum("partial") % 65536).cast("long").alias("checksum")
    )


def tiles_to_arrays(tiles_pdf: pd.DataFrame, tile_size: int = TILE_SIZE) -> dict:
    """Collect helper for tests: {(z, tx, ty): ndarray}."""
    out = {}
    for _, row in tiles_pdf.iterrows():
        arr = np.frombuffer(row["data"], dtype=np.dtype(row["dtype"])).reshape(
            tile_size, tile_size
        )
        out[(row["z"], row["tx"], row["ty"])] = arr
    return out
