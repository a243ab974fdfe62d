"""Round-3 plan-hygiene assertions.

q148 PQ serving: the per-(query, subspace, code) ADC lookup tables
must be BROADCAST-JOINED tables, never plan literals — a literal 2-D
array grows the plan O(n_queries·m·k) and breaks real serving
batches.  The executed plan must show one broadcast hash join per
subspace and stay small and free of element_at literal indexing.
"""

from gdal_spark.queries import QUERIES

SF = "/root/testdata/sf0.01"


def test_q148_luts_are_broadcast_joined(spark):
    df = QUERIES["q148_pq_ann_search"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2
    assert "element_at" not in plan
    # plan size constant in batch size: a 10-query literal-LUT plan
    # measured ~80 entries inline; the joined plan stays well under
    assert len(plan) < 20_000
