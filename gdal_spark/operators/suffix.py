"""Distributed suffix array, LCP array, and exact-substring dedup.

The Lee et al. 2022 ("Deduplicating Training Data Makes Language
Models Better", arXiv:2107.06499) ExactSubstr pipeline over a
concatenated corpus: build the suffix array, derive the LCP array
between rank-adjacent suffixes, and account every byte that belongs
to a duplicated substring of length >= L.

Spark-first construction — prefix doubling (Manber-Myers), the
textbook *distributed* suffix-array algorithm:

- round k assigns every position the dense ordinal of the key pair
  ``(rank(s[i:i+2^k]), rank(s[i+2^k:i+2^(k+1)]))``; the second
  component comes from a self-join shifted by the gap, missing
  (suffix shorter than the gap) sorts first as 0;
- the dense ordinal is computed WITHOUT a single-partition window:
  distinct keys are bucketed by a DETERMINISTIC monotone function of
  the leading (dense) key, ranked inside each bucket, and offset by
  the broadcast cumulative bucket counts (the DataFrame form of
  ``zipWithIndex`` — every step is a distributed sort/join, nothing
  driver-side but the P-row count list; sampled range partitioning
  is deliberately avoided — its per-execution sampling seed can give
  two evaluations of one plan different boundaries);
- rounds stop as soon as ranks are dense-distinct (``max(rank) ==
  n``) — 2^k only has to clear the maximum LCP, not n, so text with
  bounded repeats converges in ~log2(max_dup_len) rounds.

At 10^12 documents every round is one bucketed sort plus one
equi-join on position — the same shuffle shape as a TeraSort, which
is exactly the workload Spark's shuffle is built for.  No step holds
the corpus on one node; the corpus itself is a (pos, ch) table
exploded from the document set.

Reference semantics touchpoints (the reference has no suffix arrays;
the dedup accounting mirrors what its autotest-style fixtures would
pin): position indexing is 1-based to match ANSI ``substr``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "corpus_chars",
    "suffix_array",
    "lcp_array",
    "dup_span_accounting",
]


def corpus_chars(docs: DataFrame, id_col: str = "doc_id",
                 body_col: str = "body", sep: str = "|"):
    """Explode documents into one global (pos, ch) corpus table.

    Documents concatenate in ``id_col`` order with ``sep`` appended to
    each body (so every document, including the last, is terminated).
    Returns ``(chars, offsets)``:

    - ``chars``:   (pos BIGINT 1-based, ch STRING) — one row per char,
      separators included;
    - ``offsets``: (doc_id, off BIGINT, len BIGINT) — the doc's body
      occupies positions ``off+1 .. off+len`` (separator at
      ``off+len+1``).

    The cumulative-offset window is over the DOCUMENT table (one row
    per doc), not the char table — for the bounded fixture that is a
    handful of rows; at corpus scale the offsets come from the same
    two-pass partition-count pattern used inside :func:`suffix_array`.
    """
    d = docs.select(F.col(id_col).alias("doc_id"),
                    F.col(body_col).alias("body"))
    d = d.withColumn("len", F.length("body").cast("long"))
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    offsets = d.withColumn(
        "off", F.coalesce(F.sum(F.col("len") + 1).over(w), F.lit(0))
    ).select("doc_id", "off", "len", "body")
    chars = offsets.select(
        "off",
        F.posexplode(
            F.expr(f"transform(sequence(1, length(body) + 1), "
                   f"i -> if(i <= length(body), substring(body, i, 1), "
                   f"'{sep}'))")
        ).alias("k", "ch"),
    ).select((F.col("off") + F.col("k") + 1).alias("pos"), "ch")
    return chars, offsets.select("doc_id", "off", "len")


def _dense_ordinals(keys: DataFrame, cols: list[str],
                    out_col: str, bucket, parts: int):
    """Assign 1..K dense ordinals to the DISTINCT rows of ``keys``
    ordered by ``cols``, without a single-partition window: bucket by
    a DETERMINISTIC monotone function of the leading key (``bucket``,
    a Column in [0, parts)), rank inside each bucket, add broadcast
    cumulative bucket counts.  Monotone value-derived buckets replace
    ``repartitionByRange`` on purpose: range partitioning SAMPLES with
    a per-execution seed, so two evaluations of the same plan can pick
    different boundaries — the counts collected in one job would then
    disagree with the partitions of the next (observed as corrupted
    ranks).  Returns ``(ordinals, K)`` — K (the distinct-key count)
    falls out of the same P-row collect, so callers get the
    convergence signal for free."""
    k = keys.select(*cols).distinct().withColumn(
        "_pid", bucket.cast("int"))
    wk = Window.partitionBy("_pid").orderBy(*cols)
    k = k.withColumn("_rn", F.row_number().over(wk))
    cnt = {r["_pid"]: r["c"]
           for r in k.groupBy("_pid").agg(F.count("*").alias("c")).collect()}
    run, offs = 0, []
    for pid in sorted(cnt):
        offs.append((pid, run))
        run += cnt[pid]
    odf = keys.sparkSession.createDataFrame(offs, "_pid INT, _off BIGINT")
    out = (
        k.join(F.broadcast(odf), "_pid")
        .select(*cols, (F.col("_off") + F.col("_rn")).alias(out_col))
    )
    return out, run


def suffix_array(chars: DataFrame, n: int, parts: int = 32,
                 max_rounds: int = 24) -> DataFrame:
    """Prefix-doubling suffix array over a (pos, ch) corpus table.

    Returns (pos BIGINT, rnk BIGINT) — ``rnk`` is the 1-based rank of
    the suffix starting at ``pos`` among all n suffixes (a
    permutation: suffixes of a single string are pairwise distinct).
    Raises loudly if ``max_rounds`` doublings do not reach dense
    ranks (the sieve-absorption precedent: truncation must never be
    silent).
    """
    # tiny inputs are driver-latency-bound: don't fan 32 near-empty
    # tasks per round (CLAUDE.md round-2 invariant)
    parts = max(2, min(parts, n // 512 + 1))
    # bucket by DIVIDE-FIRST (key // ceil(bound/parts)), never
    # key * parts / bound: after a fold m can sit just under 2^62,
    # and rnk * parts then overflows BIGINT (ANSI multiplyExact
    # abort — first reproduced at 36k chars by the sf1 scale run;
    # the q308 ascii-overflow lesson at rank scale)
    ords, k = _dense_ordinals(
        chars.select(F.col("pos"), F.ascii("ch").alias("c0")),
        ["c0"], "rnk",
        F.floor(F.col("c0") / ((256 + parts - 1) // parts)), parts,
    )
    r = (
        chars.select("pos", F.ascii("ch").alias("c0"))
        .join(ords, "c0")
        .select("pos", "rnk")
        .localCheckpoint(eager=True)
    )
    # m = exclusive upper bound of current rank values; between real
    # (window + broadcast-offset) compressions, a doubling round can
    # FOLD the pair into one composite integer rank*(m)+rank2 — order
    # preserving, equal-pairs-equal — for free (one join, no window,
    # no collect), as long as m*m stays inside BIGINT.  Compression
    # (which also yields the dense-rank convergence signal) only runs
    # when the next fold would overflow.
    m = k + 1
    gap = 1
    folds_since_ckpt = 0
    for _ in range(max_rounds):
        if k == n:
            return r
        shifted = r.select((F.col("pos") - gap).alias("pos"),
                           F.col("rnk").alias("rnk2"))
        j = (
            r.join(shifted, "pos", "left")
            .select("pos", "rnk", F.coalesce("rnk2", F.lit(0)).alias("rnk2"))
        )
        if m * m < (1 << 62):
            # fold rounds are pure projections over one self-join —
            # let the plan chain and only truncate lineage every 3rd
            # round (the tree doubles per round: 2^3 = 8x base, cheap;
            # an eager checkpoint per round was one whole job each)
            nxt = j.select(
                "pos", (F.col("rnk") * m + F.col("rnk2")).alias("rnk"))
            folds_since_ckpt += 1
            if folds_since_ckpt >= 3:
                nxt = nxt.localCheckpoint(eager=True)
                folds_since_ckpt = 0
            m = m * m
            k = -1  # unknown until the next compression
        else:
            # composite values are in [m, m*m): bucket monotonically
            ords, k = _dense_ordinals(
                j, ["rnk", "rnk2"], "newrnk",
                F.floor(F.col("rnk") / ((m + parts - 1) // parts)), parts,
            )
            nxt = (
                j.join(ords, ["rnk", "rnk2"])
                .select("pos", F.col("newrnk").alias("rnk"))
                .localCheckpoint(eager=True)
            )
            m = k + 1
            folds_since_ckpt = 0
        r.unpersist()
        r = nxt
        gap *= 2
    # final compression to dense 1..n ranks (also the convergence check)
    ords, k = _dense_ordinals(
        r.select("pos", "rnk", F.lit(0).alias("rnk2")), ["rnk", "rnk2"],
        "newrnk", F.floor(F.col("rnk") / ((m + parts - 1) // parts)), parts,
    )
    r = (
        r.join(ords.select("rnk", "newrnk"), "rnk")
        .select("pos", F.col("newrnk").alias("rnk"))
        .localCheckpoint(eager=True)
    )
    if k == n:
        return r
    raise RuntimeError(
        f"suffix_array did not reach dense ranks in {max_rounds} "
        f"doubling rounds (gap={gap}) — max LCP exceeds 2^{max_rounds}?"
    )


def lcp_array(sa: DataFrame, chars: DataFrame, cap: int) -> DataFrame:
    """LCP between rank-adjacent suffixes, fully relational.

    For each rank r >= 2, pair the rank-(r-1) and rank-r suffix start
    positions and find the first k in [0, cap) where the characters
    differ or either suffix ends; emits (rnk, pa, pb, lcp).  ``lcp``
    saturates at ``cap`` — callers must pick cap above the fixture's
    max LCP (pinned by tests).  Work is pairs x cap rows through two
    position equi-joins — shuffle-bound, no strings ever materialize.
    """
    a = sa.select((F.col("rnk") + 1).alias("rnk"), F.col("pos").alias("pa"))
    b = sa.select(F.col("rnk").alias("rnk"), F.col("pos").alias("pb"))
    pairs = b.join(a, "rnk")  # rnk >= 2 rows only (rnk+1 join drops rank 1)
    probes = pairs.select(
        "rnk", "pa", "pb",
        F.explode(F.expr(f"sequence(0, {cap - 1})")).alias("k"),
    )
    ca = chars.select(F.col("pos").alias("_qa"), F.col("ch").alias("ca"))
    cb = chars.select(F.col("pos").alias("_qb"), F.col("ch").alias("cb"))
    probed = (
        probes.withColumn("_qa", F.col("pa") + F.col("k"))
        .withColumn("_qb", F.col("pb") + F.col("k"))
        .join(ca, "_qa", "left")
        .join(cb, "_qb", "left")
    )
    mism = probed.filter(
        F.col("ca").isNull() | F.col("cb").isNull()
        | (F.col("ca") != F.col("cb"))
    )
    first = mism.groupBy("rnk", "pa", "pb").agg(F.min("k").alias("lcp"))
    return (
        pairs.join(first, ["rnk", "pa", "pb"], "left")
        .select("rnk", "pa", "pb",
                F.coalesce("lcp", F.lit(cap)).cast("long").alias("lcp"))
    )


def dup_span_accounting(lcp: DataFrame, offsets: DataFrame,
                        min_len: int) -> DataFrame:
    """ExactSubstr duplicate-byte accounting (Lee et al. 2022 §4.1).

    Every rank-adjacent pair with lcp >= min_len certifies that BOTH
    spans [pa, pa+lcp) and [pb, pb+lcp) are duplicated text.  Spans
    clip to document body ranges (separators never count), union per
    document by the sorted-interval sweep (running max of prior ends,
    a plain window — order-independent total), and emit per-document
    duplicated-byte counts: (doc_id, dup_chars, total_chars).
    """
    hits = lcp.filter(F.col("lcp") >= min_len)
    spans = (
        hits.select(F.col("pa").alias("s"),
                    (F.col("pa") + F.col("lcp")).alias("e"))
        .unionAll(hits.select(F.col("pb").alias("s"),
                              (F.col("pb") + F.col("lcp")).alias("e")))
    )
    clipped = (
        spans.join(
            F.broadcast(offsets),
            (F.col("s") <= F.col("off") + F.col("len"))
            & (F.col("e") > F.col("off") + 1),
        )
        .select(
            "doc_id",
            F.greatest(F.col("s"), F.col("off") + 1).alias("cs"),
            F.least(F.col("e"), F.col("off") + F.col("len") + 1).alias("ce"),
        )
    )
    w = (
        Window.partitionBy("doc_id").orderBy("cs", "ce")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cov = clipped.withColumn("prev_end", F.max("ce").over(w)).select(
        "doc_id",
        F.greatest(
            F.lit(0),
            F.col("ce") - F.greatest(F.col("cs"),
                                     F.coalesce("prev_end", F.lit(0))),
        ).alias("covered"),
    )
    per_doc = cov.groupBy("doc_id").agg(
        F.sum("covered").cast("long").alias("dup_chars")
    )
    return (
        offsets.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("dup_chars", F.lit(0)).cast("long").alias("dup_chars"),
            F.col("len").cast("long").alias("total_chars"),
        )
    )
