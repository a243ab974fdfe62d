"""Common-Crawl-style pages table: deterministic synthesis + geocode.

Input shape mandated by BASELINE.json input_hint:
  url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Synthesis is seeded and *partition-parallel*: row i's content is a
pure function of i (splittable counter-based generation), so any
executor can materialize any slice without coordination and reruns
are byte-identical — the property the resume/manifest machinery and
the "byte-identical text per url" invariant both rest on.

The geocode stub is the deterministic text→(lon, lat) function the
north rule requires: a hash of the first token pins a "city" center
(Zipf-weighted over a fixed city list — this is what makes cell skew
real: a handful of metro cells receive a large share of pages), and
the url hash jitters within the metro radius.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("page_id", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
    ]
)

_WORDS = (
    "web page data spark tile join point cell index crawl text token "
    "city river map layer raster vector zoom pyramid shuffle salt skew"
).split()
_LANGS = ["en", "en", "en", "es", "de", "fr", "zh"]

# (name, lon, lat, zipf weight) — weights make the first cities hot:
# the deliberate skew generator for the salted-join path.
CITIES = [
    ("nyc", -73.98, 40.75),
    ("london", -0.12, 51.50),
    ("tokyo", 139.69, 35.69),
    ("paris", 2.35, 48.86),
    ("berlin", 13.40, 52.52),
    ("madrid", -3.70, 40.42),
    ("sydney", 151.21, -33.87),
    ("saopaulo", -46.63, -23.55),
    ("lagos", 3.39, 6.45),
    ("delhi", 77.21, 28.61),
    ("smalltown1", -100.5, 41.2),
    ("smalltown2", 24.7, -29.1),
    ("smalltown3", 133.8, -23.7),
    ("smalltown4", -63.6, -8.8),
    ("smalltown5", 37.6, 55.8),
]
_CITY_WEIGHTS = np.array([1.0 / (i + 1) ** 1.2 for i in range(len(CITIES))])
_CITY_WEIGHTS /= _CITY_WEIGHTS.sum()
_CITY_CDF = np.cumsum(_CITY_WEIGHTS)


def _rng_for(i: np.ndarray) -> np.ndarray:
    """64-bit splitmix-style counter hash — the per-row seed."""
    z = (i.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(
        0xBF58476D1CE4E5B9
    )
    z ^= z >> np.uint64(27)
    z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    return z


def synth_pages_pdf(start: int, count: int) -> pd.DataFrame:
    """Rows [start, start+count) of the pages table, deterministically.

    Fully vectorized (no per-row RNG objects): word j of row i is
    ``_WORDS[splitmix(h_i + j) % V]`` — still a pure function of i, but
    cheap enough to synthesize millions of rows per partition."""
    ids = np.arange(start, start + count, dtype=np.int64)
    h = _rng_for(ids)
    city_u = (h % np.uint64(10**9)).astype(np.float64) / 1e9
    city_idx = np.searchsorted(_CITY_CDF, city_u, side="right")
    city_idx = np.clip(city_idx, 0, len(CITIES) - 1)
    n_words = (8 + (h >> np.uint64(12)) % np.uint64(25)).astype(np.int64)
    lang_idx = (h >> np.uint64(20)) % np.uint64(len(_LANGS))

    max_w = int(n_words.max()) if count else 0
    # (count, max_w) matrix of word indices, one splitmix per (row, j)
    widx = (
        _rng_for((h[:, None] + np.uint64(1) + np.arange(max_w, dtype=np.uint64)).astype(np.int64))
        % np.uint64(len(_WORDS))
    ).astype(np.int64)
    words_arr = np.array(_WORDS)
    city_names = np.array([c[0] for c in CITIES])
    texts = []
    urls = []
    for r in range(count):
        city = city_names[city_idx[r]]
        texts.append(city + " " + " ".join(words_arr[widx[r, : n_words[r]]]))
        urls.append(f"https://{city}.example.com/p/{ids[r]}")
    ts = pd.to_datetime(1704067200 + (h % np.uint64(86400 * 30)).astype(np.int64), unit="s")
    html = [t.encode() for t in texts]  # deterministic fake raw bytes
    return pd.DataFrame(
        {
            "page_id": ids,
            "url": urls,
            "warc_ts": ts,
            "html": html,
            "text": texts,
            "lang": [_LANGS[int(k)] for k in lang_idx],
        }
    )


def synth_pages(spark: SparkSession, n_rows: int, partitions: int = 32) -> DataFrame:
    """Distributed synthesis: `partitions` independent slices via
    mapInPandas over a range frame — no driver materialization, scales
    to any n_rows."""
    per = (n_rows + partitions - 1) // partitions

    def gen(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                start = int(row["slice_id"]) * per
                cnt = min(per, n_rows - start)
                if cnt > 0:
                    yield synth_pages_pdf(start, cnt)

    slices = spark.range(partitions).withColumnRenamed("id", "slice_id").repartition(
        partitions, "slice_id"
    )
    return slices.mapInPandas(gen, PAGES_SCHEMA)


def geocode(pages: DataFrame) -> DataFrame:
    """Deterministic text→(lon, lat): city from the first token, jitter
    from an md5 of the url (pure functions of the row — identical on
    every rerun and executor).  Vectorized pandas UDF."""
    city_lon = {c[0]: c[1] for c in CITIES}
    city_lat = {c[0]: c[2] for c in CITIES}

    @F.pandas_udf(
        T.StructType(
            [T.StructField("lon", T.DoubleType()), T.StructField("lat", T.DoubleType())]
        )
    )
    def geo(text: pd.Series, url: pd.Series) -> pd.DataFrame:
        first = text.str.split(" ", n=1).str[0]
        base_lon = first.map(city_lon).fillna(0.0).to_numpy()
        base_lat = first.map(city_lat).fillna(0.0).to_numpy()
        jit = np.array(
            [
                int.from_bytes(hashlib.md5(u.encode()).digest()[:8], "big")
                for u in url
            ],
            dtype=np.uint64,
        )
        jlon = ((jit % np.uint64(20001)).astype(np.float64) - 10000.0) / 10000.0 * 0.5
        jlat = (
            ((jit >> np.uint64(20)) % np.uint64(20001)).astype(np.float64) - 10000.0
        ) / 10000.0 * 0.5
        return pd.DataFrame({"lon": base_lon + jlon, "lat": base_lat + jlat})

    return (
        pages.withColumn("_g", geo(F.col("text"), F.col("url")))
        .withColumn("lon", F.col("_g.lon"))
        .withColumn("lat", F.col("_g.lat"))
        .drop("_g")
    )


def geocode_encode(pages: DataFrame, res_list: tuple[int, ...] = (7, 9)) -> DataFrame:
    """Fused geocode + cell-encode: ONE pandas UDF / one Arrow round
    trip producing (lon, lat, cell{r}...).  Chaining separate UDFs
    costs one Python transfer each — at 10^12 rows the fusion is the
    difference between 1 and len(res_list)+1 passes over the batch."""
    from gdal_spark.kernels.cells import cell_encode

    city_lon = {c[0]: c[1] for c in CITIES}
    city_lat = {c[0]: c[2] for c in CITIES}
    fields = [T.StructField("lon", T.DoubleType()), T.StructField("lat", T.DoubleType())]
    fields += [T.StructField(f"cell{r}", T.LongType()) for r in res_list]

    @F.pandas_udf(T.StructType(fields))
    def geo(text: pd.Series, url: pd.Series) -> pd.DataFrame:
        first = text.str.split(" ", n=1).str[0]
        base_lon = first.map(city_lon).fillna(0.0).to_numpy()
        base_lat = first.map(city_lat).fillna(0.0).to_numpy()
        jit = np.array(
            [int.from_bytes(hashlib.md5(u.encode()).digest()[:8], "big") for u in url],
            dtype=np.uint64,
        )
        jlon = ((jit % np.uint64(20001)).astype(np.float64) - 10000.0) / 10000.0 * 0.5
        jlat = (
            ((jit >> np.uint64(20)) % np.uint64(20001)).astype(np.float64) - 10000.0
        ) / 10000.0 * 0.5
        lon = base_lon + jlon
        lat = base_lat + jlat
        out = {"lon": lon, "lat": lat}
        for r in res_list:
            out[f"cell{r}"] = cell_encode(lon, lat, r)
        return pd.DataFrame(out)

    cols = [F.col("_g")[f].alias(f) for f in ["lon", "lat"] + [f"cell{r}" for r in res_list]]
    return pages.withColumn("_g", geo(F.col("text"), F.col("url"))).select("*", *cols).drop("_g")
