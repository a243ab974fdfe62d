"""train_bpe (distributed) against a pure-Python classic BPE reference
(Sennrich et al.'s algorithm: count-weighted overlapping pair stats,
lexicographic tie-break, leftmost-greedy non-overlapping merge)."""

import pandas as pd

from gdal_spark.operators.bpe import train_bpe, word_vocab


def _ref_bpe(words, n_merges):
    from collections import Counter

    vocab = Counter(words)
    state = {w: list(w) for w in vocab}
    merges = []
    for rnd in range(1, n_merges + 1):
        pc = Counter()
        for w, cnt in vocab.items():
            syms = state[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += cnt
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), cnt = best
        merges.append((rnd, l, r, cnt))
        for w in state:
            syms = state[w]
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            state[w] = out
    return merges


CORPORA = [
    # run chains exercise the greedy-fold vs naive-replace difference
    "aaaa aaaaa aa ab abab ababab",
    "the cat sat on the mat the cat ran",
    "xyzzy xyzzy zzz zzzz yy xy zy zy zy",
]


def test_train_bpe_matches_classic_reference(spark):
    for corpus in CORPORA:
        docs = spark.createDataFrame(
            pd.DataFrame({"text": [corpus]})
        )
        got = train_bpe(word_vocab(docs), 5)
        ref = _ref_bpe(corpus.split(), 5)
        assert got == ref, (corpus, got, ref)


def test_greedy_run_semantics(spark):
    docs = spark.createDataFrame(pd.DataFrame({"text": ["aaaaa"]}))
    merges = train_bpe(word_vocab(docs), 2)
    # round 1: (a,a) count 4 (overlapping zip pairs); after the greedy
    # fold the word is [aa, aa, a], so round 2 pairs are (aa,aa)=1 and
    # (aa,a)=1 -> lexicographic tie-break picks (aa,a)
    assert merges[0] == (1, "a", "a", 4)
    assert merges[1] == (2, "aa", "a", 1)
