"""k_shortest_costs: hand-checked diamond DAG and a cyclic graph
(walk semantics: repeated traversals of a positive cycle)."""

from gdal_spark.operators.graph import k_shortest_costs


def _run(spark, rows, source=0, k=3):
    edges = spark.createDataFrame(rows, "src long, dst long, w long")
    out = k_shortest_costs(edges, source=source, k=k).collect()
    d: dict = {}
    for r in out:
        d.setdefault(r["node"], []).append((r["rank"], r["cost"]))
    return {n: [c for _, c in sorted(v)] for n, v in d.items()}


def test_diamond(spark):
    got = _run(spark, [(0, 1, 1), (0, 2, 2), (1, 3, 5), (2, 3, 1)])
    assert got[0] == [0]
    assert got[1] == [1]
    assert got[2] == [2]
    assert got[3] == [3, 6]  # via 2 then via 1 — fewer than k kept when exhausted


def test_parallel_costs_distinct(spark):
    # two equal-cost routes collapse to one DISTINCT cost
    got = _run(spark, [(0, 1, 2), (0, 2, 1), (1, 3, 1), (2, 3, 2)])
    assert got[3] == [3]


def test_cycle_walks(spark):
    # 0→1 (1), 1→2 (1), 2→1 (1): walks to 1 cost 1, 3, 5, ...
    got = _run(spark, [(0, 1, 1), (1, 2, 1), (2, 1, 1)])
    assert got[1] == [1, 3, 5]
    assert got[2] == [2, 4, 6]
