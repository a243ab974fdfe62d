"""canonical_url engine↔oracle parity on inputs OUTSIDE the q165
fixture (ADVICE round-3: mid-token utm, consecutive utm params,
multi-slash-before-query) — both expressions must agree everywhere."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from gdal_spark.functions.text import canonical_url

ORACLE = """SELECT
  'https://' ||
  regexp_replace(regexp_replace(
    lower(regexp_extract(regexp_replace(url, '#.*$', ''),
                         '^https?://([^/?#]+)', 1)),
    '^www\\.', ''), ':80$', '') ||
  regexp_replace(regexp_replace(regexp_replace(
    regexp_replace(regexp_replace(regexp_replace(
      url, '#.*$', ''), '&utm_[a-z]+=[^&]*', ''),
      '\\?utm_[a-z]+=[^&]*&', '?'), '\\?utm_[a-z]+=[^&]*$', ''),
    '^https?://[^/?#]*', ''), '(/+)(\\?|$)', '\\2') AS canon
FROM t"""

EDGE_URLS = [
    "http://www.a.com/path?utm_source=x&ref=1",
    "http://a.com/path?ref=1&utm_campaign=y",
    "http://a.com/path?utm_a=1&utm_b=2&ref=3",      # consecutive utms
    "http://a.com/path?utm_a=1&utm_b=2",            # only utms
    "http://a.com/xutm_source=1&real=2",            # mid-PATH utm text
    "http://a.com/path?refutm_x=1&k=2",             # mid-TOKEN utm text
    "http://a.com/dir//?q=1",                       # multi-slash + query
    "http://a.com//",                               # multi-slash tail
    "http://WWW.B.COM:80/Index/#frag",
    "http://a.com/utm_source=notaparam",            # utm in path, no ?
]


def test_canonical_url_matches_oracle_on_edges(spark):
    sdf = spark.createDataFrame(pd.DataFrame({"url": EDGE_URLS}))
    got = [
        r["c"]
        for r in sdf.select(canonical_url(F.col("url")).alias("c")).collect()
    ]
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"url": EDGE_URLS}))
    want = list(con.execute(ORACLE).df()["canon"])
    assert got == want
    # spot semantics: mid-path/mid-token utm text is NOT stripped
    assert got[4] == "https://a.com/xutm_source=1&real=2"
    assert got[5] == "https://a.com/path?refutm_x=1&k=2"
    assert got[2] == "https://a.com/path?ref=3"
    assert got[6] == "https://a.com/dir?q=1"
