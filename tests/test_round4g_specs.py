"""Round-4g spec pins: stack-distance curve contracts, MRR eval
contracts."""

from gdal_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_stack_distance_contracts(spark):
    rows = {r["bucket"]: r for r in
            QUERIES["q371_stack_distance"](spark, SF).collect()}
    # every cache tier of the curve is populated by the 4-class mix
    assert set(rows) == {"cold", "lt4", "lt16", "lt64", "ge64"}
    # cold misses carry the -1 sentinel only
    assert rows["cold"]["min_d"] == rows["cold"]["max_d"] == -1
    # the hot item repeats every 4 positions -> exactly 3 distinct between
    assert rows["lt4"]["min_d"] == rows["lt4"]["max_d"] == 3
    # bucket edges respected
    assert 4 <= rows["lt16"]["min_d"] and rows["lt16"]["max_d"] < 16
    assert 16 <= rows["lt64"]["min_d"] and rows["lt64"]["max_d"] < 64
    assert rows["ge64"]["min_d"] >= 64
    # every access is classified exactly once
    total = sum(r["n_accesses"] for r in rows.values())
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    assert total == n_events


def test_ranking_mrr_contracts(spark):
    r = QUERIES["q372_ranking_mrr"](spark, SF).collect()[0]
    assert r["n_queries"] == 20
    # hits monotone in k
    assert r["hits_at1"] <= r["hits_at5"] <= r["hits_at10"] <= r["n_queries"]
    # MRR bounds: 0 <= mrr <= 1, exact numerator consistent with the float
    assert 0 <= r["mrr_x2520"] <= 2520 * r["n_queries"]
    assert abs(r["mrr"] - r["mrr_x2520"] / (2520.0 * r["n_queries"])) == 0.0
    # a perfect ranker would put every editorial doc at rank 1; the
    # (tf desc, id asc) ranker must NOT be degenerate-perfect or the
    # eval measures nothing
    assert r["hits_at1"] < r["n_queries"]
    assert r["mrr_x2520"] > 0
