"""q249 unigram Viterbi — parity with a pure-Python DP replay."""

from gdal_spark.queries import QUERIES, _t

SF = "/root/testdata/sf0.001"


def test_viterbi_matches_pure_python_dp(spark):
    rows = QUERIES["q249_unigram_viterbi"](spark, SF).collect()
    got = {r["word"]: (r["cnt"], r["tok_cost"], r["n_pieces"]) for r in rows}

    # rebuild the spec in plain Python
    docs = [r["text"] for r in _t(spark, SF, "documents").collect()]
    from collections import Counter

    words = Counter(w for t in docs for w in t.split(" ") if w)
    pieces = Counter()
    for w, c in words.items():
        for i in range(len(w)):
            for l in range(1, 5):
                if i + l <= len(w):
                    pieces[w[i:i + l]] += c
    kept = {p: c for p, c in pieces.items() if len(p) == 1 or c >= 50}
    T = sum(kept.values())
    cost = {p: (T.bit_length() - c.bit_length()) * 64 + 1
            for p, c in kept.items()}
    want = {}
    for w, c in words.items():
        INF = 1 << 60
        best = [0] + [INF] * len(w)
        for j in range(1, len(w) + 1):
            for i in range(max(0, j - 4), j):
                p = w[i:j]
                if p in cost and best[i] + cost[p] < best[j]:
                    best[j] = best[i] + cost[p]
        want[w] = (c, best[len(w)] // 64, best[len(w)] % 64)
    assert got == want
    # every word segments (single chars are always in vocab)
    assert all(v[2] >= 1 for v in got.values())
