"""sf1 scaling evidence for the LLM dedup/ANN/suffix tier.

The r4 verdict's #1: "the 100-TB claim made measurable" — run the
banded/bucketed dedup and ANN operators at a 10x scale factor and
show (a) wall-clock grows SUB-QUADRATICALLY in rows, and (b) the two
bounds that make that possible — the q19 ABSOLUTE df-cap and the q18
band-bucket candidate restriction — actually bind on the data.

Three synthetic corpus sizes (5k / 15k / 50k docs, embeddings scaled
2.5:1 like the driver tables; `sources/docs.py` synthesis, pure
function of row id) are materialized once under `.scale_cache/`, the
six corpus-scaling queries run warm min-of-N at each size, and the
suffix-array construction runs over a concatenated corpus scaled the
same way.  The emitted exponents are alpha = log(t_hi/t_lo) /
log(n_hi/n_lo) between the smallest and largest size: alpha < 2 is
the sub-quadratic gate (quadratic all-pairs would show alpha ~= 2 and
candidate_frac ~= 1).

Bound evidence at the largest size:
- band-bucket: LSH candidate pairs vs all N(N-1)/2 pairs — the
  fraction of the quadratic square the banded join ever touches.
- df-cap: sum(df^2) raw vs capped at 120 — the join-row mass the
  absolute cap removes (the q343/q19 lesson made a number).
"""

from __future__ import annotations

import os
import time
from pathlib import Path

from pyspark.sql import functions as F

SIZES = [(5_000, 2_000), (15_000, 6_000), (50_000, 20_000)]
QNAMES = [
    "q17_dedup_exact",
    "q18_minhash_lsh",
    "q19_ngram_jaccard",
    "q20_simhash",
    "q32_ann_ivf",
    "q148_pq_ann_search",
]


def _short(nm: str) -> str:
    return nm.split("_")[0]


def run_llm_scaling(cpus: int = 32, base_dir: str | None = None,
                    passes: int = 2) -> dict:
    from gdal_spark import get_spark
    from gdal_spark.operators.suffix import corpus_chars, suffix_array
    from gdal_spark.queries import QUERIES
    from gdal_spark.sources.docs import write_scale_dir

    if base_dir is None:
        base_dir = str(Path(__file__).resolve().parent.parent.parent
                       / ".scale_cache")
    spark = get_spark("llmscale", cores=cpus)
    sizes_out = []
    for n_docs, n_vecs in SIZES:
        d = write_scale_dir(os.path.join(base_dir, f"docs{n_docs}"),
                            n_docs, n_vecs)
        walls: dict = {}
        rows: dict = {}
        for nm in QNAMES:
            fn = QUERIES[nm]
            best = None
            for _ in range(passes):
                t0 = time.time()
                nr = fn(spark, d).count()
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
            walls[_short(nm)] = round(best, 3)
            rows[_short(nm)] = int(nr)  # 0-row output = degenerate
            # fixture; the timing would be meaningless evidence
        # suffix-array probe: concatenated corpus scaled with size
        k_docs = n_docs // 125  # 40 / 120 / 400 docs
        docs = (spark.read.parquet(f"{d}/documents.parquet")
                .filter(F.col("doc_id") < k_docs)
                .selectExpr("doc_id", "text AS body"))
        chars, _off = corpus_chars(docs)
        chars = chars.localCheckpoint(eager=True)
        n_chars = chars.count()
        best = None
        for _ in range(passes):
            t0 = time.time()
            suffix_array(chars, n_chars).count()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        walls["suffix"] = round(best, 3)
        sizes_out.append(
            {"n_docs": n_docs, "n_vecs": n_vecs, "n_chars": n_chars,
             "wall": walls, "rows": rows})

    lo, hi = sizes_out[0], sizes_out[-1]
    import math

    ratio = hi["n_docs"] / lo["n_docs"]
    alphas = {}
    for k in hi["wall"]:
        r = ratio if k != "suffix" else hi["n_chars"] / lo["n_chars"]
        tl, th = max(lo["wall"][k], 1e-3), max(hi["wall"][k], 1e-3)
        alphas[k] = round(math.log(th / tl) / math.log(r), 2)
    subq = {k: bool(a < 2.0) for k, a in alphas.items()}

    # ---- bound evidence at the largest size -------------------------------
    from gdal_spark.operators.dedup import (
        MINHASH_BANDS,
        minhash_signatures,
    )
    from gdal_spark.queries import _docs_with_dups

    dbig = os.path.join(base_dir, f"docs{hi['n_docs']}")
    dw = _docs_with_dups(spark, dbig)
    n_all = dw.count()
    sigs = minhash_signatures(dw).persist()
    bands = []
    for bi, idxs in enumerate(MINHASH_BANDS):
        bands.append(sigs.select(
            F.md5(F.concat(*[F.col(f"sig{i}") for i in idxs])
                  .cast("binary")).alias("bucket"))
            .withColumn("band", F.lit(bi)))
    buckets = bands[0]
    for b in bands[1:]:
        buckets = buckets.unionByName(b)
    cand_pairs = int(
        buckets.groupBy("band", "bucket").count()
        .agg(F.sum(F.col("count") * (F.col("count") - 1) / 2))
        .collect()[0][0] or 0)
    all_pairs = n_all * (n_all - 1) // 2
    sigs.unpersist()

    d19 = dw.filter(F.col("doc_id") % 10 == 0)
    grams = (
        d19.select(
            "doc_id",
            F.explode(
                F.expr("filter(transform(sequence(1, greatest(length(text)"
                       " - 2, 1)), i -> substring(text, i, 3)),"
                       " g -> length(g) = 3)")).alias("gram"))
        .distinct())
    dfc = grams.groupBy("gram").count()
    row = dfc.agg(
        F.sum(F.col("count") * F.col("count")).alias("raw"),
        F.sum(F.when(F.col("count") <= 120,
                     F.col("count") * F.col("count"))
              .otherwise(0)).alias("capped"),
        F.sum(F.when(F.col("count") > 120, 1).otherwise(0))
        .alias("n_capped_grams"),
    ).collect()[0]
    bounds = {
        "lsh": {
            "candidate_pairs": cand_pairs,
            "all_pairs": all_pairs,
            "candidate_frac": round(cand_pairs / max(all_pairs, 1), 8),
        },
        "df_cap": {
            "sum_df2_raw": int(row["raw"]),
            "sum_df2_capped": int(row["capped"]),
            "cut_factor": round(row["raw"] / max(row["capped"], 1), 1),
            "grams_over_cap": int(row["n_capped_grams"]),
        },
    }
    return {
        "sizes": sizes_out,
        "alphas": alphas,
        "subquadratic_pass": subq,
        "bounds": bounds,
        "cpus": cpus,
        "passes": passes,
    }


if __name__ == "__main__":
    import json

    print(json.dumps(run_llm_scaling(), indent=1))
