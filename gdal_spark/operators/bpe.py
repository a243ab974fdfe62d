"""Deterministic BPE merge training (Sennrich et al. 2016,
arXiv:1508.07909) — the real iterative merge-learning loop, not a
regex approximation (q48 covers the tokenize-with-known-rules side).

Spec (pinned so a SQL oracle can replay it):

- the corpus reduces to a (word, count) vocabulary table — all pair
  statistics are count-weighted over DISTINCT words, the classic
  implementation's efficiency trick and the reason BPE training scales:
  the working set is the vocabulary, not the corpus;
- a word's state is its symbol sequence, encoded as a
  space-sentineled string `` ' s y m s ' `` — the merge step is a
  LEFT FOLD over the symbols rebuilding the string: if the
  accumulator ends with `` ' l ' `` and the next symbol is ``r``,
  the trailing ``l`` becomes ``lr``; else append.  This is exactly
  the classic leftmost-greedy non-overlapping merge (``[a,a,a]`` +
  merge (a,a) → ``[aa,a]``; a naive sentinel ``replace`` would skip
  chained occurrences because the match consumes the shared space);
- pair counts are the OVERLAPPING zip pairs (``'aaaa'`` contributes 3
  to (a,a)), as in the reference implementation;
- best pair per round = max total count, ties to the lexicographically
  smallest (left, right);
- fixed number of rounds.

Scale shape: each round is one explode + one groupBy(pair) bounded by
the pair vocabulary, a 1-row argmax via a map-side-combinable
``min(struct(-cnt, l, r))``, and one JVM ``replace`` projection.  The
driver holds only the learned merge table (K rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt, syms) vocabulary with char-split sentinel strings."""
    w = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("word")
    ).filter(F.col("word") != "")
    v = w.groupBy("word").agg(F.count("*").alias("cnt"))
    return v.withColumn(
        "syms",
        F.concat(F.lit(" "), F.concat_ws(" ", F.split(F.col("word"), "")),
                 F.lit(" ")),
    )


def train_bpe(vocab: DataFrame, n_merges: int) -> list[tuple[int, str, str, int]]:
    """Learn `n_merges` merges; returns [(rank, left, right, count)]."""
    merges, w = train_bpe_state(vocab, n_merges)
    w.unpersist()
    return merges


def train_bpe_state(vocab: DataFrame, n_merges: int):
    """Like train_bpe but also returns the final (word, cnt, syms)
    vocabulary DataFrame — the APPLY side of the tokenizer (still
    persisted; caller unpersists)."""
    spark = vocab.sparkSession
    w = vocab.select("word", "cnt", "syms").persist()
    w.count()
    merges: list[tuple[int, str, str, int]] = []
    for rnd in range(1, n_merges + 1):
        sl = F.split(F.trim(F.col("syms")), " ")
        pairs = w.select(
            "cnt",
            F.explode(
                F.when(
                    F.size(sl) >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size(sl) - 1),
                        lambda i: F.struct(
                            F.element_at(sl, i).alias("lft"),
                            F.element_at(sl, i + 1).alias("rgt"),
                        ),
                    ),
                ).otherwise(F.array().cast(
                    "array<struct<lft:string,rgt:string>>")),
            ).alias("p"),
        )
        pc = pairs.groupBy("p.lft", "p.rgt").agg(F.sum("cnt").alias("pcnt"))
        best = pc.agg(
            F.min(F.struct((-F.col("pcnt")).alias("neg"),
                           F.col("lft"), F.col("rgt"))).alias("b")
        ).collect()[0]["b"]
        if best is None:
            break
        lft, rgt, pcnt = best["lft"], best["rgt"], -best["neg"]
        merges.append((rnd, lft, rgt, int(pcnt)))
        # left-fold merge (tokens contain no spaces or quotes, so the
        # inlined literals are safe)
        fold = (
            "aggregate(split(trim(syms), ' '), ' ', (acc, x) -> "
            f"CASE WHEN endswith(acc, ' {lft} ') AND x = '{rgt}' "
            f"THEN substring(acc, 1, length(acc) - {len(lft) + 1}) "
            f"|| '{lft}{rgt} ' "
            "ELSE acc || x || ' ' END)"
        )
        nw = w.withColumn("syms", F.expr(fold)).persist()
        nw.count()
        w.unpersist()
        w = nw
    return merges, w


def train_bpe_df(docs: DataFrame, n_merges: int,
                 text_col: str = "text") -> DataFrame:
    merges = train_bpe(word_vocab(docs, text_col), n_merges)
    return docs.sparkSession.createDataFrame(
        merges, "rnk LONG, lft STRING, rgt STRING, pcnt LONG"
    )
