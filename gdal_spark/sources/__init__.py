"""Table sources: deterministic synthesis + parquet-backed catalog.

No Iceberg runtime jars ship in this sandbox, so the catalog writes
Hive-partitioned parquet directories with the same layout an Iceberg
table would cluster to (partition columns in the path, min/max stats
in the parquet footers driving the same pruning); swapping
``format("parquet")`` for ``format("iceberg")`` is the only change on
a cluster with the runtime jar.
"""
