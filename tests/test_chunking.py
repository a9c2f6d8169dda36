"""Document chunking + vocabulary top-k (operators/chunking,
operators/frequency.vocab_top_k)."""

import pytest
from pyspark.sql import Row

from anomalydetector_spark.operators.chunking import chunk_documents
from anomalydetector_spark.operators.frequency import vocab_top_k


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def _chunks(spark, rows, chunk_tokens, overlap):
    out = chunk_documents(
        _docs(spark, rows), chunk_tokens=chunk_tokens, overlap=overlap
    )
    return {
        (r.doc_id, r.chunk_id): (r.n_tokens, r.chunk_text)
        for r in out.collect()
    }


def test_short_doc_single_chunk(spark):
    got = _chunks(spark, [("a", "one two three")], 5, 2)
    assert got == {("a", 0): (3, "one two three")}


def test_exact_budget_single_chunk(spark):
    got = _chunks(spark, [("a", "t0 t1 t2 t3 t4")], 5, 2)
    assert got == {("a", 0): (5, "t0 t1 t2 t3 t4")}


def test_overlap_geometry_and_reconstruction(spark):
    # 7 tokens, chunk 5 / overlap 2 / stride 3 -> 2 chunks
    toks = ["a", "b", "c", "d", "e", "f", "g"]
    got = _chunks(spark, [("d1", " ".join(toks))], 5, 2)
    assert got[("d1", 0)] == (5, "a b c d e")
    assert got[("d1", 1)] == (4, "d e f g")
    # consecutive chunks share exactly `overlap` tokens
    c0 = got[("d1", 0)][1].split()
    c1 = got[("d1", 1)][1].split()
    assert c0[-2:] == c1[:2]
    # dropping the overlap head of every chunk but the first
    # reconstructs the original token sequence
    assert c0 + c1[2:] == toks


def test_every_token_covered_longer_doc(spark):
    toks = [f"t{i}" for i in range(23)]
    got = _chunks(spark, [("d", " ".join(toks))], 8, 3)
    # stride 5 -> n_chunks = ceil((23-3)/5) = 4
    assert sorted(cid for (_, cid) in got) == [0, 1, 2, 3]
    rebuilt = got[("d", 0)][1].split()
    for cid in (1, 2, 3):
        rebuilt += got[("d", cid)][1].split()[3:]
    assert rebuilt == toks
    # no chunk exceeds the budget
    assert all(n <= 8 for (n, _) in got.values())


def test_null_and_empty_docs_emit_nothing(spark):
    got = _chunks(
        spark,
        [("n", None), ("e", ""), ("w", "   "), ("ok", "x y")],
        5,
        2,
    )
    assert set(d for (d, _) in got) == {"ok"}


def test_whitespace_runs_normalized(spark):
    got = _chunks(spark, [("a", "  one\t\ttwo \n three  ")], 10, 0)
    assert got == {("a", 0): (3, "one two three")}


def test_zero_overlap_partitions_exactly(spark):
    toks = [f"t{i}" for i in range(10)]
    got = _chunks(spark, [("d", " ".join(toks))], 4, 0)
    assert [got[("d", i)][1].split() for i in range(3)] == [
        toks[0:4],
        toks[4:8],
        toks[8:10],
    ]


def test_bad_overlap_rejected(spark):
    docs = _docs(spark, [("a", "x")])
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=5, overlap=5)
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=5, overlap=-1)


def test_vocab_top_k_counts_and_ties(spark):
    docs = _docs(
        spark,
        [
            ("a", "The cat and the dog"),
            ("b", "cat bat"),
            ("c", None),
        ],
    )
    rows = vocab_top_k(docs, k=3).collect()
    assert [(r.token, r.cnt, r.rank) for r in rows] == [
        ("cat", 2, 1),  # tie with 'the' broken by token ascending
        ("the", 2, 2),
        ("and", 1, 3),
    ]


def test_vocab_top_k_case_sensitive_option(spark):
    docs = _docs(spark, [("a", "A a a B")])
    rows = vocab_top_k(docs, k=10, lowercase=False).collect()
    got = {r.token: (r.cnt, r.rank) for r in rows}
    assert got == {"a": (2, 1), "A": (1, 2), "B": (1, 3)}


def test_vocab_top_k_plan_is_take_ordered(spark):
    """Scale property: the top-k must compile to TakeOrderedAndProject
    (distributed partial top-k), not a single-partition global window."""
    docs = _docs(spark, [("a", "x y z")])
    plan = vocab_top_k(docs, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_chunk_plan_has_no_shuffle(spark):
    """Scale property: chunking is projection + explode only — chunks
    inherit the scan partitioning, no Exchange in the plan."""
    docs = _docs(spark, [("a", "x y z")])
    plan = (
        chunk_documents(docs, chunk_tokens=4, overlap=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_vocab_doc_freq_counts_once_per_doc(spark):
    docs = _docs(
        spark,
        [
            ("a", "spam spam spam spam ham"),
            ("b", "spam eggs"),
            ("c", None),
        ],
    )
    rows = vocab_top_k(docs, k=10, doc_freq=True).collect()
    got = {r.token: (r.cnt, r.rank) for r in rows}
    # 'spam' appears 5 times but in only 2 docs
    assert got["spam"] == (2, 1)
    assert got["eggs"] == (1, 2)
    assert got["ham"] == (1, 3)
