"""TF-IDF keyword extraction (operators/tfidf — smoothed-IDF top-k
terms with exact integer micro scores)."""

import math
from collections import Counter

from anomalydetector_spark.operators.tfidf import (
    inverse_doc_frequencies,
    tfidf_top_terms,
)

DOCS = [
    (1, "the cat sat on the mat the cat"),
    (2, "the dog ran"),
    (3, "cat dog cat dog cat"),
    (4, ""),  # token-less: no keywords
    (5, None),  # null text: no keywords
]


def micro(x):
    return (
        int(math.floor(x * 1e6 + 0.5))
        if x >= 0
        else -int(math.floor(-x * 1e6 + 0.5))
    )


def pure_tfidf(rows, k=3, min_df=1):
    n = len(rows)
    dfc = Counter()
    for _, t in rows:
        dfc.update(set((t or "").lower().split()))
    idf = {
        w: micro(math.log((n + 1) / (c + 1)) + 1)
        for w, c in dfc.items()
        if c >= min_df
    }
    out = []
    for did, t in rows:
        tf = Counter((t or "").lower().split())
        scored = sorted(
            ((-tf[w] * idf[w], w, tf[w]) for w in tf if w in idf),
        )[:k]
        for r, (neg, w, f) in enumerate(scored, 1):
            out.append((did, r, w, f, -neg))
    return sorted(out)


def _run(spark, rows, k=3, min_df=1):
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    idf = inverse_doc_frequencies(docs, min_df=min_df)
    return sorted(
        tuple(r) for r in tfidf_top_terms(docs, idf, k=k).collect()
    )


def test_matches_pure_python(spark):
    assert _run(spark, DOCS, k=3) == pure_tfidf(DOCS, k=3)


def test_min_df_prunes(spark):
    got = _run(spark, DOCS, k=5, min_df=2)
    assert got == pure_tfidf(DOCS, k=5, min_df=2)
    assert all(t[2] in {"the", "cat", "dog"} for t in got)  # df>=2 terms only


def test_rare_term_outranks_common_at_equal_tf(spark):
    # at equal tf, the rarer term (higher idf) must rank first:
    # doc 9 holds "the" (df 3/4) and "zebra" (df 1/4) once each
    rows = [
        (9, "the zebra"),
        (10, "the x"),
        (11, "the y"),
        (12, "q"),
    ]
    got = _run(spark, rows, k=2, min_df=1)
    doc9 = [t[2] for t in sorted(r for r in got if r[0] == 9)]
    assert doc9 == ["zebra", "the"]
    assert got == pure_tfidf(rows, k=2)


def test_tie_break_token_ascending(spark):
    rows = [(1, "b a"), (2, "a b")]  # identical tf and df for a and b
    got = _run(spark, rows, k=2)
    assert [t[2] for t in got if t[0] == 1] == ["a", "b"]


def test_partition_invariance(spark):
    docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    idf = inverse_doc_frequencies(docs)

    def run(parts):
        d = docs.repartition(parts)
        return sorted(
            tuple(r)
            for r in tfidf_top_terms(d, inverse_doc_frequencies(d), k=3).collect()
        )

    assert run(1) == run(8)


def test_tokenless_docs_emit_nothing(spark):
    got = _run(spark, DOCS, k=3)
    assert {t[0] for t in got} == {1, 2, 3}


def test_idf_counts_distinct_docs(spark):
    docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    idf = {r.token: r.df for r in inverse_doc_frequencies(docs).collect()}
    assert idf["cat"] == 2  # doc 1 (×2) and doc 3 (×3) → df 2, not 5
    assert idf["the"] == 2
