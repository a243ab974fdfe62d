"""Graph operators over edge DataFrames — the GNM surface.

Reference: the Geographic Network Model ships connected components,
Dijkstra and K-shortest-paths over in-memory graphs (gnm/gnm.h:60-62,
gnm/gnmgraph.h:173-211).  In-memory graphs don't distribute; the Spark
re-expression is iterative label propagation over an edge DataFrame —
each round is one join + one aggregation, and the loop runs O(diameter)
rounds.  ``localCheckpoint`` truncates the growing lineage each round
(without it the plan tree doubles per iteration and the driver, not the
data, becomes the bottleneck at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 50
) -> DataFrame:
    """(node, component) with component = min node id reachable.

    Shuffle shape per round: edges join labels on src (labels are the
    small side until convergence regions grow), then min-aggregate on
    dst.  Big-graph variants (large-star/small-star) drop in behind the
    same signature; plain propagation is exact and O(diameter) rounds.
    """
    und = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    labels = (
        und.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        prop = (
            und.join(labels.withColumnRenamed("node", "u"), "u")
            .groupBy(F.col("v").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new = (
            labels.join(prop, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
                (F.coalesce(F.col("nbr_label"), F.col("label")) < F.col("label")).alias(
                    "_changed"
                ),
            )
            .localCheckpoint()
        )
        changed = new.filter(F.col("_changed")).count()
        labels = new.drop("_changed")
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))
