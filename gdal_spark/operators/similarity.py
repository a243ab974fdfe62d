"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline; an LSH-bucketed
(random-hyperplane sign bits) variant as the scale path.  Dot products
run through built-in higher-order functions (zip_with + aggregate) —
JVM-side, sequential per row, deterministic accumulation order (the
property the oracle comparison needs; a shuffle-side SUM of doubles
would not be order-stable).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm2(a):
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_id: str = "vec_id",
    query_id: str = "qid",
    vec_col: str = "embedding",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set, rank by
    similarity with (sim desc, id asc) deterministic tie-break.

    Shuffle: only the k-bounded window exchange (queries ride the
    broadcast; similarities are computed map-side)."""
    q = F.broadcast(queries.select(query_id, qvec_col))
    joined = vectors.crossJoin(q).filter(F.col(vec_id) != F.col(query_id))
    sim = _dot(F.col(vec_col), F.col(qvec_col)) / (
        F.sqrt(_norm2(F.col(vec_col))) * F.sqrt(_norm2(F.col(qvec_col)))
    )
    scored = joined.withColumn("cosine", sim)
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine").desc(), F.col(vec_id).asc()
    )
    return (
        scored.withColumn("sim_rank", F.row_number().over(w))
        .filter(F.col("sim_rank") <= k)
        .select(query_id, vec_id, "sim_rank", F.round("cosine", 6).alias("cosine"))
    )


def hyperplane_lsh_buckets(
    vectors: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane sign-bit bucket id per vector (the ANN scale
    path: candidates only from the same bucket, ~2^-n_planes of the
    corpus).  Hyperplanes are seeded and stamped into the plan as
    literals, so every executor derives identical buckets."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    bucket = F.lit(0).cast("long")
    for j in range(n_planes):
        coeffs = F.array(*[F.lit(float(c)) for c in planes[j]])
        proj = _dot(F.col(vec_col), coeffs)
        bucket = bucket + F.when(proj > 0, F.lit(1 << j)).otherwise(0)
    return vectors.withColumn("bucket", bucket)


def ann_ivf(
    vectors: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    dim: int = 64,
    n_queries: int = 10,
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: coarse-quantize every vector to its nearest
    "centroid" cell (one inverted-list shuffle key), probe the top
    ``n_probe`` cells per query, exact-score only the probed lists.

    Scale shape: the candidate join is an equi-join on the cell id —
    at 10^12 vectors each query touches n_probe/n_centroids of the
    corpus instead of all of it, and the inverted lists are just
    partitions of the vector table keyed by cell.

    Determinism/oracle trick: embeddings are quantized to integers
    (floor(1000·e + 0.5)) and the centroids are an integer formula, so
    every dot product is exact in double regardless of summation order
    — bit-identical between NumPy, Catalyst, and the DuckDB oracle.
    Ties break to the smallest centroid / vector id.
    """
    cent = np.array(
        [[((j * 31 + d * 17) % 21) - 10 for d in range(dim)] for j in range(n_centroids)],
        dtype=np.float64,
    )

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def cells_ranked(embs: pd.Series) -> pd.Series:
        """All centroid ids ranked by dot desc (ties: low id first)."""
        M = np.stack(
            [np.floor(np.asarray(e, dtype=np.float64) * 1000.0 + 0.5) for e in embs]
        )
        dots = M @ cent.T  # exact: integer-valued doubles
        order = np.argsort(-dots, axis=1, kind="stable")
        return pd.Series(list(order.astype(np.int64)))

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def quantized(embs: pd.Series) -> pd.Series:
        return pd.Series(
            [
                np.floor(np.asarray(e, dtype=np.float64) * 1000.0 + 0.5)
                .astype(np.int64)
                .tolist()
                for e in embs
            ]
        )

    vq = vectors.select(
        vec_id,
        quantized(F.col(vec_col)).alias("qv"),
        cells_ranked(F.col(vec_col)).alias("_cells"),
    )
    assigned = vq.select(vec_id, "qv", F.col("_cells")[0].alias("cell"))
    queries = (
        vq.filter(F.col(vec_id) < n_queries)
        .select(
            F.col(vec_id).alias("qid"),
            F.col("qv").alias("qqv"),
            F.explode(F.slice(F.col("_cells"), 1, n_probe)).alias("cell"),
        )
    )
    cand = queries.join(assigned, "cell").filter(F.col(vec_id) != F.col("qid"))
    score = F.aggregate(
        F.zip_with("qqv", "qv", lambda x, y: x * y), F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    scored = cand.withColumn("score", score)
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col(vec_id).asc())
    return (
        scored.withColumn("ivf_rank", F.row_number().over(w))
        .filter(F.col("ivf_rank") <= k)
        .select("qid", vec_id, "ivf_rank", "score")
    )


def cosine_topk_lsh(
    vectors: DataFrame,
    k: int = 5,
    n_planes: int = 6,
    dim: int = 64,
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs ANN top-k inside LSH buckets (approximate: recall
    bounded by bucket collisions; the exactness-vs-throughput dial is
    n_planes)."""
    b = hyperplane_lsh_buckets(vectors, n_planes, dim, vec_col=vec_col)
    left = b.select(
        F.col(vec_id).alias("a"), F.col(vec_col).alias("va"), "bucket"
    )
    right = b.select(
        F.col(vec_id).alias("b"), F.col(vec_col).alias("vb"), "bucket"
    )
    pairs = left.join(right, "bucket").filter(F.col("a") != F.col("b"))
    sim = _dot(F.col("va"), F.col("vb")) / (
        F.sqrt(_norm2(F.col("va"))) * F.sqrt(_norm2(F.col("vb")))
    )
    scored = pairs.withColumn("cosine", sim)
    w = Window.partitionBy("a").orderBy(F.col("cosine").desc(), F.col("b").asc())
    return (
        scored.withColumn("sim_rank", F.row_number().over(w))
        .filter(F.col("sim_rank") <= k)
        .select(F.col("a").alias(vec_id), F.col("b").alias("neighbor"), "sim_rank",
                F.round("cosine", 6).alias("cosine"))
    )
