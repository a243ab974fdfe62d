"""North-rule pipeline guarantees: manifest resume without recompute,
byte-identical text per url, join-strategy row parity, and
expression-vs-kernel cell parity."""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.operators.spatial_join import (
    spatial_join_points_in_polygons,
    with_cell,
    with_cell_kernel,
)
from gdal_spark.plans.pipeline import metro_zones, run_pipeline
from gdal_spark.sources.pages import geocode_encode, synth_pages, synth_pages_pdf

N_PAGES = 20_000


@pytest.fixture(scope="module")
def pipe(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pipe"))
    results = run_pipeline(spark, N_PAGES, root, base_z=8, min_z=6, partitions=8)
    return root, results


def test_pipeline_stages_complete(pipe):
    root, results = pipe
    assert set(results) >= {"pages", "geocode", "zone_join", "tiles",
                            "pyramid_z7", "pyramid_z6"}
    for name, res in results.items():
        assert res.rows > 0, name
        assert os.path.exists(res.path), name
        assert not res.resumed, name


def test_pipeline_resume_zero_recompute(spark, pipe):
    root, first = pipe
    again = run_pipeline(spark, N_PAGES, root, base_z=8, min_z=6, partitions=8)
    for name, res in again.items():
        assert res.resumed, f"{name} recomputed on resume"
        assert res.rows == first[name].rows
        assert res.path == first[name].path


def test_pipeline_resume_after_kill(spark, pipe):
    """Simulate a mid-run kill: destroy one stage output; only that
    stage (and nothing upstream) recomputes, and its metrics match."""
    root, first = pipe
    victim = first["tiles"]
    shutil.rmtree(victim.path)
    again = run_pipeline(spark, N_PAGES, root, base_z=8, min_z=6, partitions=8)
    assert not again["tiles"].resumed
    assert again["pages"].resumed and again["geocode"].resumed
    assert again["tiles"].rows == victim.rows
    assert again["tiles"].bytes == victim.bytes


def test_manifest_partition_metrics(pipe):
    root, results = pipe
    with open(os.path.join(root, "manifest.jsonl")) as f:
        rows = [json.loads(line) for line in f]
    by_stage = {r["stage"]: r for r in rows}
    for name, res in results.items():
        m = by_stage[name]
        assert m["rows"] == res.rows
        # per-partition lineage: per-file row/byte metrics present & consistent
        assert sum(p["rows"] for p in m["partitions"]) == m["rows"]
        assert all(p["bytes"] > 0 for p in m["partitions"])


def test_text_byte_identical_per_url(spark, pipe):
    """input_hint invariant: text reachable from any pipeline output
    (derived stages are narrow and join back to the corpus on page_id)
    is byte-identical to independent re-synthesis, keyed by url."""
    root, results = pipe
    joined = spark.read.parquet(results["zone_join"].path)
    pages = spark.read.parquet(results["pages"].path)
    sample = (
        joined.select("page_id", "zone_id")
        .join(pages.select("page_id", "url", "text"), "page_id")
        .limit(500)
        .toPandas()
    )
    assert len(sample) > 0
    resynth = synth_pages_pdf(0, N_PAGES).set_index("page_id")
    for _, row in sample.iterrows():
        ref = resynth.loc[row["page_id"]]
        assert ref["url"] == row["url"]
        assert ref["text"].encode() == row["text"].encode()


def test_join_broadcast_vs_salted_shuffle_parity(spark):
    """The three physical strategies (broadcast / shuffle / salted
    shuffle) must produce identical logical output."""
    pages = synth_pages(spark, 3000, partitions=4)
    geo = geocode_encode(pages).select("page_id", "lon", "lat")
    zones = metro_zones()
    a = spatial_join_points_in_polygons(geo, zones, poly_id_col="zone_id")
    b = spatial_join_points_in_polygons(
        geo, zones, poly_id_col="zone_id", broadcast_cover=False, salt_factor=4
    )
    c = spatial_join_points_in_polygons(
        geo, zones, poly_id_col="zone_id", broadcast_cover=False, salt_factor=1
    )
    pa = sorted(map(tuple, a.select("page_id", "zone_id").collect()))
    pb = sorted(map(tuple, b.select("page_id", "zone_id").collect()))
    pc = sorted(map(tuple, c.select("page_id", "zone_id").collect()))
    assert pa == pb == pc
    assert len(pa) > 0


def test_cell_expr_matches_kernel(spark):
    """JVM codegen cell id == NumPy kernel cell id, including grid-edge
    and cell-boundary points."""
    rng = np.random.default_rng(7)
    lons = np.concatenate(
        [rng.uniform(-180, 180, 2000),
         np.array([-180.0, 180.0, 0.0, -1e-12, 2.8125, -2.8125])]
    )
    lats = np.concatenate(
        [rng.uniform(-90, 90, 2000),
         np.array([90.0, -90.0, 0.0, 1.40625, -1.40625, 45.0])]
    )
    pdf = [(float(a), float(b)) for a, b in zip(lons, lats)]
    df = spark.createDataFrame(pdf, "lon double, lat double")
    for res in (7, 9, 12):
        got = (
            with_cell_kernel(with_cell(df, res=res, out="e"), res=res, out="k")
            .filter(F.col("e") != F.col("k"))
            .count()
        )
        assert got == 0, f"res={res}: {got} mismatches"
