"""Size-gated SSSP / k-shortest parity: the driver replay and the
distributed loop must produce identical result sets on the same graph
(threshold=0 forces the distributed branch on the same input)."""

from gdal_spark.operators.graph import k_shortest_costs_auto, shortest_paths_auto


def _edges(spark):
    rows = [
        (u, v, 1 + (u * v) % 7)
        for u in range(59)
        for v in (u + 1 + (u * 7) % 4, u + 2 + (u * 13) % 5)
        if v < 60
    ]
    return spark.createDataFrame(rows, "src long, dst long, w long")


def test_sssp_auto_parity(spark):
    e = _edges(spark)
    drv = {(r.node, r.cost) for r in shortest_paths_auto(e, 0).collect()}
    dist = {(r.node, r.cost) for r in shortest_paths_auto(e, 0, threshold=0).collect()}
    assert drv == dist and len(drv) > 10


def test_k_shortest_auto_parity(spark):
    e = _edges(spark)
    drv = {(r.node, r.rank, r.cost) for r in k_shortest_costs_auto(e, 0, k=3).collect()}
    dist = {
        (r.node, r.rank, r.cost)
        for r in k_shortest_costs_auto(e, 0, k=3, threshold=0).collect()
    }
    assert drv == dist and len(drv) > 30
