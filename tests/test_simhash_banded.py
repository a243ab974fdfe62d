"""Banded SimHash candidate generation (operators/dedup.py):

- EXACTNESS: 4 band tables with max_hamming ≤ 3 must reproduce the
  brute-force all-pairs Hamming join bit-for-bit (pigeonhole — ≤ 3
  flips leave one 16-bit band intact).
- SCALE SHAPE: on a corpus whose true near-dup pairs are linear in N
  (each doc has one mutated twin), the candidate count (pairs sharing
  any band) must stay ~linear in N — the property the old single-block
  high-byte scheme lacked (O(N²/256)).
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from gdal_spark.operators.dedup import (
    _banded_hamming_pairs,
    simhash64,
    simhash64_pairs,
)

WORDS = [f"w{i:04d}" for i in range(8192)]


def _corpus(spark, n_twins):
    """2·n_twins docs: doc 2i and its twin 2i+1 share 39 of 40 words
    (one substitution).  Unrelated docs draw pseudo-random word sets
    (Knuth multiplicative mix over an 8k vocabulary), so their SimHash
    distance is large and band collisions come only from twins plus
    birthday noise."""
    rows = []
    for i in range(n_twins):
        base = [
            WORDS[((i * 40 + j) * 2654435761 + 12345) % 8192] for j in range(40)
        ]
        twin = list(base)
        twin[3] = WORDS[(i * 104729 + 101) % 8192]
        rows.append((2 * i, " ".join(base)))
        rows.append((2 * i + 1, " ".join(twin)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _brute_pairs(spark, docs, max_hamming):
    sigs = simhash64(docs).persist()
    a = sigs.select(
        F.col("doc_id").alias("a"),
        F.col("sig_hi").alias("ah"),
        F.col("sig_lo").alias("al"),
    )
    b = sigs.select(
        F.col("doc_id").alias("b"),
        F.col("sig_hi").alias("bh"),
        F.col("sig_lo").alias("bl"),
    )
    return (
        a.crossJoin(b)
        .filter(F.col("a") < F.col("b"))
        .withColumn(
            "ham",
            (
                F.bit_count(F.col("ah").bitwiseXOR(F.col("bh")))
                + F.bit_count(F.col("al").bitwiseXOR(F.col("bl")))
            ).cast("long"),
        )
        .filter(F.col("ham") <= max_hamming)
        .select("a", "b", "ham")
    )


def test_banded_equals_brute_force(spark):
    docs = _corpus(spark, 60)
    got = sorted(map(tuple, simhash64_pairs(docs, max_hamming=3).collect()))
    want = sorted(map(tuple, _brute_pairs(spark, docs, 3).collect()))
    assert got == want
    assert len(got) >= 1  # at least some twins within Hamming 3


def _candidate_count(docs):
    """Size of the raw banded candidate set (verify filter disabled)."""
    sigs = simhash64(docs).persist()
    mask = F.lit((1 << 16) - 1)
    band_exprs = [
        F.col("sig_lo").bitwiseAND(mask),
        F.shiftright(F.col("sig_lo"), 16).bitwiseAND(mask),
        F.col("sig_hi").bitwiseAND(mask),
        F.shiftright(F.col("sig_hi"), 16).bitwiseAND(mask),
    ]
    return _banded_hamming_pairs(
        sigs, ["sig_hi", "sig_lo"], band_exprs, max_hamming=128, id_col="doc_id"
    ).count()


def test_candidates_grow_linearly(spark):
    """Doubling the corpus should ~double (not ~quadruple) the banded
    candidate count when true near-dups are linear in N."""
    c1 = _candidate_count(_corpus(spark, 50))    # N = 100 docs
    c2 = _candidate_count(_corpus(spark, 100))   # N = 200 docs
    assert c1 >= 40  # most twin pairs collide in at least one band
    assert c2 <= 3.0 * c1  # quadratic blocking would give ≈ 4×
