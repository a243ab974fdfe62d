"""Benchmark runner — one JSON line for the driver.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Optionally (BENCH_SCALING=1) also runs the flagship pages pipeline at
two parallelism levels (local[8] vs local[32]) in subprocesses and
reports pages/sec + scaling efficiency — the BASELINE.md evidence.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    "q01_filter_project",
    "q02_summary_agg",
    "q05_groupby_agg",
    "q06_left_join",
    "q09_events_hourly",
    "q11_spatial_pip_join",
    "q12_zonal_stats",
    "q13_knn",
    "q14_raster_density",
    "q15_tile_pyramid",
    "q16_cell_index",
    "q17_dedup_exact",
    "q18_minhash_lsh",
    "q20_simhash",
    "q21_text_quality",
    "q23_cosine_topk",
    "q24_grid_idw",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1])

    from gdal_spark import get_spark
    from gdal_spark.queries import QUERIES

    spark = get_spark("bench", cores=cpus)
    # warm the JVM + parquet footers once
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        times[name] = round(time.time() - t0, 3)
        _ = n
    total = round(sum(times.values()), 3)
    out = {
        "metric": "headline_query_wall_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "cpus": cpus,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
