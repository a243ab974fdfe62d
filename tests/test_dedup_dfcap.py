"""The n-gram Jaccard df-cap must actually BIND and match a pure-Python
reference when it does (round-3 verdict #2: the sf0.01 oracle audit runs
at a scale where a 120-doc cap is inert, so the capped semantics are
pinned here on a corpus where it is NOT inert)."""

import pandas as pd
import pytest

from gdal_spark import get_spark
from gdal_spark.operators.dedup import ngram_jaccard_pairs


def _py_ngram_jaccard(texts: dict[int, str], n=3, threshold=0.5, max_df=2):
    grams = {i: {t[k : k + n] for k in range(max(len(t) - n + 1, 1))} for i, t in texts.items()}
    grams = {i: {g for g in gs if len(g) == n} for i, gs in grams.items()}
    df: dict[str, int] = {}
    for gs in grams.values():
        for g in gs:
            df[g] = df.get(g, 0) + 1
    capped = {i: {g for g in gs if df[g] <= max_df} for i, gs in grams.items()}
    out = []
    ids = sorted(texts)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            ga, gb = capped[a], capped[b]
            inter = len(ga & gb)
            union = len(ga) + len(gb) - inter
            if union == 0:
                continue
            j = round(inter / union, 6)
            if j >= threshold:
                out.append((a, b, j))
    return sorted(out)


@pytest.fixture(scope="module")
def spark():
    return get_spark(cores=4)


def test_df_cap_binds_and_matches_python_reference(spark):
    # 'xx'-heavy corpus: the gram 'xxx' appears in ALL 6 docs and is
    # dropped by max_df=3; doc-specific grams survive.  Docs 0/1 and
    # 2/3 are exact dups — jaccard 1.0 with or without the cap; 4 and
    # 5 share ONLY the hot gram, so the cap must remove their pair.
    texts = {
        0: "xxxabcdef",
        1: "xxxabcdef",
        2: "xxxquartz",
        3: "xxxquartz",
        4: "xxxx",
        5: "xxxxy",
    }
    expected = _py_ngram_jaccard(texts, n=3, threshold=0.5, max_df=3)
    # uncapped reference: the (4,5) pair WOULD pass on the hot gram
    uncapped = _py_ngram_jaccard(texts, n=3, threshold=0.5, max_df=10**9)
    assert (4, 5, 0.5) in uncapped and not any(
        p[:2] == (4, 5) for p in expected
    )  # cap binds

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    )
    got = sorted(
        tuple(r) for r in ngram_jaccard_pairs(docs, n=3, threshold=0.5, max_df=3)
        .collect()
    )
    assert got == expected

    # proportional-cap variant agrees with the same reference when the
    # fraction resolves to the same absolute bound (3/6 docs)
    got_frac = sorted(
        tuple(r)
        for r in ngram_jaccard_pairs(
            docs, n=3, threshold=0.5, max_df_frac=0.5
        ).collect()
    )
    assert got_frac == expected
