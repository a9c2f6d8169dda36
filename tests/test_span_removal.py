"""Duplicated-span REMOVAL with keep-first semantics
(operators/substring_dedup.drop_duplicated_spans)."""

import pytest

from anomalydetector_spark.operators.substring_dedup import drop_duplicated_spans


pytestmark = pytest.mark.parametrize("strategy", ["window", "join"])


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _run(spark, strategy, rows, **kw):
    out = drop_duplicated_spans(_docs(spark, rows), strategy=strategy, **kw)
    return {r.doc_id: (r.text, r.dropped_tokens, r.total_tokens) for r in out.collect()}


def test_first_occurrence_kept_second_removed(spark, strategy):
    shared = "a b c d e"
    got = _run(
        spark, strategy,
        [(1, f"{shared} tail1 x"), (2, f"head2 {shared} tail2")],
        n=5,
    )
    # doc 1 holds the (smaller id) first occurrence — untouched, original bytes
    assert got[1] == (f"{shared} tail1 x", 0, 7)
    # doc 2 loses exactly the 5 shared tokens
    assert got[2] == ("head2 tail2", 5, 7)


def test_untouched_doc_keeps_original_whitespace(spark, strategy):
    got = _run(
        spark, strategy,
        [(1, "  unique   doc   with   odd spacing "), (2, "another one")],
        n=3,
    )
    assert got[1][0] == "  unique   doc   with   odd spacing "
    assert got[1][1] == 0


def test_within_doc_repeat(spark, strategy):
    # the same 3-gram twice in one doc: first kept, second removed
    got = _run(spark, strategy, [(1, "p q r z z p q r w")], n=3)
    text, dropped, total = got[1]
    assert total == 9
    assert dropped == 3
    assert text == "p q r z z w"


def test_overlapping_spans_merge(spark, strategy):
    # a 6-token repeated run produces two overlapping 5-windows in the
    # copy; the merged removal is exactly 6 tokens, not 10
    run = "m n o p q r"
    got = _run(spark, strategy, [(1, f"{run} u1"), (2, f"{run} u2")], n=5)
    assert got[1] == (f"{run} u1", 0, 7)
    assert got[2] == ("u2", 6, 7)


def test_doc_fully_removed_becomes_empty(spark, strategy):
    got = _run(spark, strategy, [(1, "s t u v w"), (2, "s t u v w")], n=5)
    assert got[1] == ("s t u v w", 0, 5)
    assert got[2] == ("", 5, 5)


def test_min_occurrences_threshold(spark, strategy):
    rows = [(i, "c1 c2 c3 c4 c5 u%d" % i) for i in range(3)]
    # span occurs 3 times; with min_occurrences=4 nothing is removed
    got = _run(spark, strategy, rows, n=5, min_occurrences=4)
    assert all(d == 0 for (_, d, _) in got.values())
    got2 = _run(spark, strategy, rows, n=5, min_occurrences=3)
    assert got2[0][1] == 0 and got2[1][1] == 5 and got2[2][1] == 5


def test_short_docs_pass_through(spark, strategy):
    got = _run(spark, strategy, [(1, "tiny doc"), (2, "tiny doc")], n=5)
    assert got[1] == ("tiny doc", 0, 2)
    assert got[2] == ("tiny doc", 0, 2)


def test_every_doc_emitted_and_partition_invariant(spark, strategy):
    rows = [(i, f"x{i % 4} y{i % 4} z{i % 4} w{i % 4} v{i % 4} t{i}") for i in range(40)]
    df1 = _docs(spark, rows).repartition(1)
    df8 = _docs(spark, rows).repartition(8)
    a = {
        r.doc_id: (r.text, r.dropped_tokens)
        for r in drop_duplicated_spans(df1, n=5, strategy=strategy).collect()
    }
    other = "join" if strategy == "window" else "window"
    b = {
        r.doc_id: (r.text, r.dropped_tokens)
        for r in drop_duplicated_spans(df8, n=5, strategy=other).collect()
    }
    # partition-count invariant AND strategy-equivalence in one shot
    assert len(a) == 40
    assert a == b
    # exactly one doc per x-class keeps the repeated 5-gram
    kept_per_class = sum(1 for t, d in a.values() if d == 0)
    assert kept_per_class == 4
