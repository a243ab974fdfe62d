"""Mirror the driver's oracle audit for a subset of queries.

Usage: python scripts/verify_subset.py q560_cusum q561_dtw [sf_dir ...]
Defaults to both /root/testdata/sf0.001 and /root/testdata/sf0.01.
"""
import sys
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as e  # noqa: E402
from gdal_spark import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("/")]
    sfs = [a for a in sys.argv[1:] if a.startswith("/")] or [
        "/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    spark = get_spark(cores=8)
    bad = 0
    for sf in sfs:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf}/{t}.parquet')")
        for name in names:
            fn = e.queries()[name]
            sdf = fn(spark, sf).toPandas()
            sql = e.oracle_sql().get(name)
            if sql is None:
                print(sf, name, "rows-only", len(sdf))
                continue
            ddf = con.execute(sql).df()
            cols = sorted(sdf.columns)
            if cols != sorted(ddf.columns):
                print(sf, name, "COLUMN MISMATCH", cols,
                      sorted(ddf.columns))
                bad += 1
                continue
            a = (sdf[cols].sort_values(cols).reset_index(drop=True)
                 .round(6))
            b = (ddf[cols].sort_values(cols).reset_index(drop=True)
                 .round(6))
            try:
                ok = a.equals(b.astype(a.dtypes.to_dict()))
            except Exception as ex:  # dtype cast failure = mismatch
                print(sf, name, "CAST FAIL", ex)
                ok = False
            print(sf, name, "MATCH" if ok else "MISMATCH",
                  len(a), len(b))
            if not ok:
                bad += 1
                with pd.option_context("display.width", 200,
                                       "display.max_columns", 50):
                    merged = a.compare(b.astype(a.dtypes.to_dict())
                                       ) if len(a) == len(b) else None
                    if merged is not None and len(merged):
                        print(merged.head(20))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
