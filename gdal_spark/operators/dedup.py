"""Deduplication operators for web-scale text corpora.

Not present in the reference (it has SELECT DISTINCT over string
representations, ogr/ogr_swq.h:320-322); these are the training-data
pipeline operators the engine adds on top, all expressed with
built-in Spark functions (JVM-side) so the 10^12-row passes never
enter Python:

- exact_dedup           — fingerprint groupBy (hash dedup)
- minhash_lsh_pairs     — MinHash signatures via portable md5-min
                          order statistics, banded LSH bucketing,
                          verified Jaccard on candidates only
- ngram_jaccard_pairs   — character n-gram shingles, exact Jaccard
                          via token equi-join (df-capped)
- simhash_pairs         — 16-bit SimHash from portable 32-bit token
                          hashes; near-dup = small Hamming distance

All are deterministic and mirrored 1:1 by ANSI-SQL oracles in
gdal_spark.queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gdal_spark.functions.text import fingerprint, token_hash32, tokens, word_shingles

MINHASH_SEEDS = ["s0", "s1", "s2", "s3", "s4", "s5", "s6", "s7"]
MINHASH_BANDS = [(0, 1, 2, 3), (4, 5, 6, 7)]


def exact_dedup(docs: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """Groups of byte-identical (normalized) texts: (fp, dup_count,
    keeper) with keeper = min id — the canonical survivor."""
    return (
        docs.withColumn("fp", fingerprint(F.col(text_col)))
        .groupBy("fp")
        .agg(
            F.count("*").alias("dup_count"),
            F.min(id_col).alias("keeper"),
        )
    )


def _doc_tokens(docs: DataFrame, id_col, text_col) -> DataFrame:
    return (
        docs.select(id_col, F.explode(tokens(F.col(text_col))).alias("tok"))
        .distinct()
    )


def _doc_shingles(docs: DataFrame, id_col, text_col, k: int = 3) -> DataFrame:
    return (
        docs.select(
            id_col, F.explode(word_shingles(F.col(text_col), k)).alias("tok")
        )
        .distinct()
    )


def minhash_signatures(
    docs: DataFrame, id_col="doc_id", text_col="text", seeds=MINHASH_SEEDS, k: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """One row per doc with columns sig0..sigK: sig_i = min over the
    doc's word k-gram shingle set of md5(shingle || seed_i).

    The min of a uniform hash over the shingle set is a permutation
    order statistic — the classic MinHash estimator; using the md5
    *string* ordering keeps it portable across engines (no bigint
    hashing semantics to match).
    """
    toks = shingles if shingles is not None else _doc_shingles(docs, id_col, text_col, k)
    aggs = [
        F.min(F.md5(F.concat(F.col("tok"), F.lit(seed)).cast("binary"))).alias(f"sig{i}")
        for i, seed in enumerate(seeds)
    ]
    return toks.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col="doc_id",
    text_col="text",
    seeds=MINHASH_SEEDS,
    threshold: float = 0.5,
    k: int = 3,
) -> DataFrame:
    """Candidate pairs from banded LSH (2 bands × 4 rows over shingle
    MinHash), verified with exact Jaccard over distinct shingle sets.

    Shuffle shape: signatures = one groupBy(doc); bucketing = groupBy
    (band, bucket); verification joins only candidate pairs (the LSH
    point), never the full doc × doc square.  A band matches only when
    all 4 of its signatures agree (P = 1-(1-j^4)^2: j=1 dups always
    collide, unrelated j≈0.05 docs almost never), so candidates ≈ true
    near-dups — the property that keeps this linear-ish at 10^12 docs.
    """
    # the shingle table feeds BOTH the signatures and the verification
    # join — compute and persist it once (at 10^12 rows this is the
    # difference between one and two full explode+distinct shuffles)
    toks = _doc_shingles(docs, id_col, text_col, k).persist()
    sigs = minhash_signatures(docs, id_col, text_col, seeds, k, shingles=toks).persist()
    bands = []
    for bi, idxs in enumerate(MINHASH_BANDS):
        bands.append(
            sigs.select(
                F.col(id_col),
                F.md5(
                    F.concat(*[F.col(f"sig{i}") for i in idxs]).cast("binary")
                ).alias("bucket"),
            ).withColumn("band", F.lit(bi))
        )
    buckets = bands[0]
    for b in bands[1:]:
        buckets = buckets.unionByName(b)
    left = buckets.withColumnRenamed(id_col, "a")
    right = buckets.withColumnRenamed(id_col, "b")
    cand = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )

    sizes = toks.groupBy(id_col).agg(F.count("*").alias("n"))
    ta = toks.withColumnRenamed(id_col, "a")
    tb = toks.withColumnRenamed(id_col, "b")
    inter = (
        cand.join(ta, "a")
        .join(tb, ["b", "tok"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    na = sizes.withColumnRenamed(id_col, "a").withColumnRenamed("n", "na")
    nb = sizes.withColumnRenamed(id_col, "b").withColumnRenamed("n", "nb")
    out = (
        inter.join(na, "a")
        .join(nb, "b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
    return out


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    id_col="doc_id",
    text_col="text",
    threshold: float = 0.5,
    max_df: int = 1000,
    max_df_frac: float | None = None,
) -> DataFrame:
    """Exact Jaccard over character n-gram shingles via shingle
    equi-join.  ``max_df`` drops ubiquitous shingles before the join —
    the standard df-cap that keeps the join linear-ish; it can only
    *lose* pairs whose overlap is entirely stop-shingles.

    ``max_df_frac`` (when given) overrides ``max_df`` with a
    corpus-proportional cap: grams present in more than that fraction
    of documents are dropped.  The cap is computed LAZILY as a
    broadcast join against a one-row count aggregate — no driver-side
    count, so the whole plan stays a single lazy DAG.  SCALE NOTE:
    with the cap on, the shingle self-join emits at most df² pairs per
    surviving gram with df ≤ cap — candidate count is df-bounded
    (linear-ish in corpus size for fixed cap fraction), never the
    quadratic all-hot-shingle blowup."""
    grams = (
        docs.selectExpr(
            f"{id_col}",
            f"explode(transform(sequence(1, greatest(length({text_col}) - {n - 1}, 1)), "
            f"i -> substring({text_col}, i, {n}))) AS gram",
        )
        # guard: sequence(1, 0) would run DESCENDING in Spark, and
        # substring past the end yields short grams — keep exact-n only
        .filter(F.length("gram") == n)
        .distinct()
    )
    gram_df = grams.groupBy("gram").agg(F.count("*").alias("df"))
    if max_df_frac is not None:
        ndocs = docs.select(F.countDistinct(id_col).alias("ndocs"))
        df_cap = gram_df.join(F.broadcast(ndocs)).filter(
            F.col("df") <= max_df_frac * F.col("ndocs")
        )
    else:
        df_cap = gram_df.filter(F.col("df") <= max_df)
    grams = grams.join(df_cap.select("gram"), "gram")
    sizes = grams.groupBy(id_col).agg(F.count("*").alias("n"))
    ga = grams.withColumnRenamed(id_col, "a")
    gb = grams.withColumnRenamed(id_col, "b")
    inter = (
        ga.join(gb, "gram")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    na = sizes.withColumnRenamed(id_col, "a").withColumnRenamed("n", "na")
    nb = sizes.withColumnRenamed(id_col, "b").withColumnRenamed("n", "nb")
    return (
        inter.join(na, "a")
        .join(nb, "b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def simhash(docs: DataFrame, bits: int = 16, id_col="doc_id", text_col="text") -> DataFrame:
    """16-bit SimHash: bit j set iff Σ_tokens (±1 by token-hash bit j)
    > 0.  Token hash = portable 32-bit md5 prefix."""
    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    toks = toks.withColumn("h", token_hash32(F.col("tok")))
    bit_cols = [
        F.sum(
            F.when((F.col("h").bitwiseAND(F.lit(1 << j))) != 0, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*bit_cols)
    sig = F.lit(0).cast("long")
    for j in range(bits):
        sig = sig + F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(0)
    return agg.select(F.col(id_col), sig.alias("simhash"))


def _banded_hamming_pairs(
    sigs: DataFrame,
    sig_cols: list[str],
    band_exprs: list,
    max_hamming: int,
    id_col: str,
) -> DataFrame:
    """Multi-index (banded) Hamming join: each signature is split into
    ``len(band_exprs)`` band values; every band is an equi-join key
    (one bucket table unioned over bands), candidates verify exact
    Hamming over the full signature columns.

    EXACT by pigeonhole when max_hamming < number of bands: a pair
    with ≤ max_hamming flipped bits leaves at least one band untouched,
    so it collides in that band's table — no recall loss, unlike
    single-block prefix blocking.  Per-band buckets shrink as 2^-band
    bits of the corpus, so the within-bucket self-join stays linear-ish
    at 10^12 docs (the standard Manku/Jain/Sarma multi-table scheme).
    """
    bands = []
    for bi, expr in enumerate(band_exprs):
        bands.append(
            sigs.select(F.col(id_col), expr.alias("bval")).withColumn(
                "band", F.lit(bi)
            )
        )
    buckets = bands[0]
    for b in bands[1:]:
        buckets = buckets.unionByName(b)
    left = buckets.withColumnRenamed(id_col, "a")
    right = buckets.withColumnRenamed(id_col, "b")
    cand = (
        left.join(right, ["band", "bval"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    sa = sigs.select(
        F.col(id_col).alias("a"),
        *[F.col(c).alias(f"a_{c}") for c in sig_cols],
    )
    sb = sigs.select(
        F.col(id_col).alias("b"),
        *[F.col(c).alias(f"b_{c}") for c in sig_cols],
    )
    ham = F.lit(0)
    for c in sig_cols:
        ham = ham + F.bit_count(F.col(f"a_{c}").bitwiseXOR(F.col(f"b_{c}")))
    return (
        cand.join(sa, "a")
        .join(sb, "b")
        .withColumn("ham", ham.cast("long"))
        .filter(F.col("ham") <= max_hamming)
        .select("a", "b", "ham")
    )


def simhash_pairs(
    docs: DataFrame, bits: int = 16, max_hamming: int = 3, id_col="doc_id", text_col="text"
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming over
    the 16-bit signature, candidates from 4 rotated 4-bit band tables
    — EXACT for max_hamming ≤ 3 (pigeonhole over 4 bands), and each
    band bucket holds ~N/16 docs instead of the N/256 high-byte block
    of naive prefix blocking that silently drops boundary flips."""
    sigs = simhash(docs, bits, id_col, text_col).persist()
    bw = bits // 4
    mask = (1 << bw) - 1
    band_exprs = [
        F.shiftright(F.col("simhash"), bi * bw).bitwiseAND(F.lit(mask))
        for bi in range(4)
    ]
    return _banded_hamming_pairs(sigs, ["simhash"], band_exprs, max_hamming, id_col)


def simhash64(docs: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """64-bit SimHash carried as two 32-bit halves (sig_hi, sig_lo) so
    every value fits a signed long on every engine: bit j of the token
    hash comes from md5 hex chars 1-8 (high word) / 9-16 (low word),
    parsed as 32-bit integers — portable to DuckDB via
    CAST('0x' || substr(md5(t), …) AS BIGINT)."""
    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    md5h = F.md5(F.col("tok").cast("binary"))
    toks = toks.withColumn(
        "h_hi", F.conv(F.substring(md5h, 1, 8), 16, 10).cast("long")
    ).withColumn("h_lo", F.conv(F.substring(md5h, 9, 8), 16, 10).cast("long"))
    bit_cols = []
    for j in range(32):
        bit_cols.append(
            F.sum(
                F.when((F.col("h_lo").bitwiseAND(F.lit(1 << j))) != 0, 1).otherwise(-1)
            ).alias(f"lo{j}")
        )
        bit_cols.append(
            F.sum(
                F.when((F.col("h_hi").bitwiseAND(F.lit(1 << j))) != 0, 1).otherwise(-1)
            ).alias(f"hi{j}")
        )
    agg = toks.groupBy(id_col).agg(*bit_cols)
    sig_lo = F.lit(0).cast("long")
    sig_hi = F.lit(0).cast("long")
    for j in range(32):
        sig_lo = sig_lo + F.when(F.col(f"lo{j}") > 0, F.lit(1 << j)).otherwise(0)
        sig_hi = sig_hi + F.when(F.col(f"hi{j}") > 0, F.lit(1 << j)).otherwise(0)
    return agg.select(
        F.col(id_col), sig_hi.alias("sig_hi"), sig_lo.alias("sig_lo")
    )


def simhash64_pairs(
    docs: DataFrame, max_hamming: int = 3, id_col="doc_id", text_col="text"
) -> DataFrame:
    """Near-dup pairs over the 64-bit SimHash: 4 rotated 16-bit band
    tables as equi-join keys, exact Hamming verify on candidates.
    Exact for max_hamming ≤ 3 (pigeonhole); 2^16 buckets per band keep
    candidate growth ~linear in corpus size on real text."""
    sigs = simhash64(docs, id_col, text_col).persist()
    mask = F.lit((1 << 16) - 1)
    band_exprs = [
        F.col("sig_lo").bitwiseAND(mask),
        F.shiftright(F.col("sig_lo"), 16).bitwiseAND(mask),
        F.col("sig_hi").bitwiseAND(mask),
        F.shiftright(F.col("sig_hi"), 16).bitwiseAND(mask),
    ]
    return _banded_hamming_pairs(
        sigs, ["sig_hi", "sig_lo"], band_exprs, max_hamming, id_col
    )
