"""Driver-vs-distributed parity for the size-gated Borůvka MST.

The repo rule (round-3 invariant): a size-gated operator must
implement BOTH paths of the SAME spec and assert identical outputs.
`boruvka_mst_auto` replays the distributed round recurrence in driver
dicts below the edge threshold; this pins the two paths equal on

- the q472 fixture shape (48 points on a line, |i-j| <= 4 window), and
- an irregular hash-weighted graph with weight ties (the (w, u, v)
  total order must break them identically on both paths).
"""

from pyspark.sql import functions as F  # noqa: F401

from gdal_spark.operators.graph import boruvka_mst, boruvka_mst_auto
from gdal_spark.session import local_df


def _edges_line(spark):
    rows = []
    for i in range(48):
        pos_i = 100 * (i // 8) + 7 * (i % 8) + (i * i) % 5
        for j in range(i + 1, min(i + 5, 48)):
            pos_j = 100 * (j // 8) + 7 * (j % 8) + (j * j) % 5
            rows.append((i, j, pos_j - pos_i))
    return local_df(spark, rows, "src long, dst long, w long")


def _edges_hashed(spark):
    # multiplicative mixing (the q747 lesson) + deliberate ties:
    # w mod 7 collides heavily, exercising the (w, u, v) tie-break
    rows = []
    for i in range(60):
        for d in (1, 2, 5, 9):
            j = (i * 2654435761 + d) % 60
            if i != j:
                rows.append((i, j, (i * 31 + j * 17) % 7))
    return local_df(spark, rows, "src long, dst long, w long")


def _canon(df):
    return sorted(tuple(r) for r in df.select("u", "v", "w").collect())


def test_parity_line(spark):
    e = _edges_line(spark)
    assert _canon(boruvka_mst(e)) == _canon(
        boruvka_mst_auto(e, threshold=200_000))


def test_parity_ties(spark):
    e = _edges_hashed(spark)
    dist = _canon(boruvka_mst(e))
    loc = _canon(boruvka_mst_auto(e, threshold=200_000))
    assert dist == loc
    # forest spans: edge count == nodes - components is implied by
    # both paths agreeing; sanity-check non-triviality
    assert len(loc) > 0


def test_gate_routes_large_to_distributed(spark):
    e = _edges_line(spark)
    # threshold 0 forces the distributed path through the gate
    assert _canon(boruvka_mst_auto(e, threshold=0)) == _canon(
        boruvka_mst(e))
