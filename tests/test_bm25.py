"""BM25: exact parity vs a pure-Python computation, ranking sanity,
repeated-term dedup, and the one-aggregation plan shape."""

import io
import math
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from anomalydetector_spark.operators.bm25 import bm25_scores, bm25_topk

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick quick quick fox"),
    (3, "a lazy afternoon with a lazy dog and a lazy cat"),
    (4, "completely unrelated text about spark physical plans"),
    (5, "fox"),
]


def _py_bm25(rows, terms, k1=1.2, b=0.75):
    toks = {i: t.lower().split() for i, t in rows}
    n = len(rows)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for i, v in toks.items():
        s = 0.0
        hit = False
        for t in terms:
            tf = v.count(t)
            hit = hit or tf > 0
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += idf * (tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * len(v) / avgdl)))
        if hit:
            out[i] = round(s, 6)
    return out


def _df(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_matches_python_reference(spark):
    want = _py_bm25(CORPUS, ["quick", "fox"])
    got = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(_df(spark), "quick fox").collect()
    }
    assert got == want
    assert set(got) == {1, 2, 5}  # only hit docs return


def test_ranking_properties(spark):
    """Term repetition + shorter length beats the long generic doc, and
    a matched doc always outranks one matching fewer terms at the same
    length profile. (Doc 5 matches only 'fox', doc 1 matches both terms
    — two idf contributions legitimately beat one, so no assertion that
    single-hit beats multi-hit.)"""
    top = bm25_topk(_df(spark), "quick fox", k=3).collect()
    got = {r["doc_id"]: r["bm25"] for r in top}
    assert set(got) == {1, 2, 5}
    assert got[2] > got[1] > got[5]
    assert [r["doc_id"] for r in top] == [2, 1, 5]  # pinned total order


def test_repeated_query_term_counts_once(spark):
    a = {r["doc_id"]: r["bm25"] for r in bm25_scores(_df(spark), "fox fox").collect()}
    b = {r["doc_id"]: r["bm25"] for r in bm25_scores(_df(spark), "fox").collect()}
    assert a == b


def test_empty_query_raises(spark):
    with pytest.raises(ValueError):
        bm25_scores(_df(spark), "   ")


def test_one_aggregation_pass(spark):
    """All corpus stats (N, avgdl, every df_t) come from ONE aggregate;
    scoring is a broadcast of that single row — no join wider than it,
    no Python."""
    out = bm25_scores(_df(spark).repartition(4), "quick fox lazy")
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue()
    assert plan.count("HashAggregate") <= 4  # partial+final of ONE agg (AQE may re-list)
    assert "pythonudf" not in plan.lower()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
