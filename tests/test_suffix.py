"""Suffix array / LCP / ExactSubstr dedup — distributed vs pure-Python."""

import pytest
from pyspark.sql import functions as F

from gdal_spark.operators.suffix import (
    corpus_chars,
    dup_span_accounting,
    lcp_array,
    suffix_array,
)
from gdal_spark.queries import _SA_BODY_SQL, _SA_CAP, _t

SF = "/root/testdata/sf0.001"


def _py_suffix_array(s: str):
    n = len(s)
    sa = sorted(range(n), key=lambda i: s[i:])
    rnk = [0] * n
    for r, i in enumerate(sa, 1):
        rnk[i] = r
    return sa, rnk


def _py_lcp(s: str, a: int, b: int) -> int:
    n, k = len(s), 0
    while a + k < n and b + k < n and s[a + k] == s[b + k]:
        k += 1
    return k


@pytest.fixture(scope="module")
def corpus_fixture(spark):
    docs = (
        _t(spark, SF, "documents")
        .filter("doc_id < 8")
        .selectExpr("doc_id", f"{_SA_BODY_SQL} AS body")
    )
    rows = docs.orderBy("doc_id").collect()
    s = "".join(r["body"] + "|" for r in rows)
    chars, offsets = corpus_chars(docs)
    chars = chars.localCheckpoint(eager=True)
    return spark, s, chars, offsets


def test_suffix_array_matches_python(corpus_fixture):
    _, s, chars, _ = corpus_fixture
    n = len(s)
    assert chars.count() == n
    got = {r["pos"]: r["rnk"] for r in suffix_array(chars, n).collect()}
    _, rnk = _py_suffix_array(s)
    # engine pos is 1-based
    assert got == {i + 1: rnk[i] for i in range(n)}


def test_lcp_matches_python_and_cap_clears_fixture(corpus_fixture):
    _, s, chars, _ = corpus_fixture
    n = len(s)
    sa_df = suffix_array(chars, n)
    lcp_rows = lcp_array(sa_df, chars, _SA_CAP).collect()
    sa, _ = _py_suffix_array(s)
    want = {
        j + 1: _py_lcp(s, sa[j - 1], sa[j]) for j in range(1, n)
    }  # keyed by rank (1-based)
    got = {r["rnk"]: r["lcp"] for r in lcp_rows}
    assert got == want
    # the saturation cap must clear the fixture's true max LCP
    assert max(want.values()) < _SA_CAP


def test_dup_accounting_matches_python_interval_union(corpus_fixture):
    _, s, chars, offsets = corpus_fixture
    n = len(s)
    sa_df = suffix_array(chars, n)
    lcp_df = lcp_array(sa_df, chars, _SA_CAP)
    got = {
        r["doc_id"]: (r["dup_chars"], r["total_chars"])
        for r in dup_span_accounting(lcp_df, offsets, 25).collect()
    }
    # pure-Python replay: interval union of >=25 spans clipped per doc
    sa, _ = _py_suffix_array(s)
    ivs = []
    for j in range(1, n):
        l = _py_lcp(s, sa[j - 1], sa[j])
        if l >= 25:
            ivs.append((sa[j - 1] + 1, sa[j - 1] + 1 + l))
            ivs.append((sa[j] + 1, sa[j] + 1 + l))
    offs = {
        r["doc_id"]: (r["off"], r["len"]) for r in offsets.collect()
    }
    want = {}
    for doc_id, (off, ln) in offs.items():
        pieces = sorted(
            (max(a, off + 1), min(b, off + ln + 1))
            for a, b in ivs
            if a <= off + ln and b > off + 1
        )
        cov, end = 0, 0
        for a, b in pieces:
            if b > end:
                cov += b - max(a, end)
                end = b
        want[doc_id] = (cov, ln)
    assert got == want
    # the injected boilerplate must be found on every doc_id % 3 == 0 doc
    for doc_id in offs:
        if doc_id % 3 == 0:
            assert got[doc_id][0] >= 25


def test_suffix_array_round_cap_raises_loudly(corpus_fixture):
    spark, _, _, _ = corpus_fixture
    # 'aaaa...a' needs gap > n/2 to separate ranks: 1 round can't
    docs = spark.createDataFrame([(0, "a" * 64)], "doc_id INT, body STRING")
    chars, _ = corpus_chars(docs)
    with pytest.raises(RuntimeError, match="dense ranks"):
        suffix_array(chars, 65, max_rounds=2)


from hypothesis import given, settings, strategies as st


@settings(max_examples=8, deadline=None, derandomize=True)
@given(st.text(alphabet="abc", min_size=3, max_size=40))
def test_suffix_array_random_strings_match_python(spark, s):
    # repeat-heavy 3-letter strings are the adversarial case for
    # prefix doubling (long LCPs force maximum rounds incl. folds)
    docs = spark.createDataFrame([(0, s)], "doc_id INT, body STRING")
    chars, _ = corpus_chars(docs)
    n = len(s) + 1  # separator appended
    got = {r["pos"]: r["rnk"] for r in suffix_array(chars, n).collect()}
    full = s + "|"
    _, rnk = _py_suffix_array(full)
    assert got == {i + 1: rnk[i] for i in range(n)}
