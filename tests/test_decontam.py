"""Benchmark decontamination (operators/decontam)."""

import pandas as pd
import pytest

from anomalydetector_spark.operators.decontam import (
    contamination_flags,
    decontaminate,
    eval_ngram_set,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "a completely unrelated document about spark plans"),
        (3, "something with quick brown fox jumps inside it as well"),
        (4, "short doc"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


@pytest.fixture(scope="module")
def eval_docs(spark):
    return spark.createDataFrame(
        pd.DataFrame([(100, "quick brown fox jumps high")],
                     columns=["doc_id", "text"])
    )


def test_flags_exact_overlap(spark, corpus, eval_docs):
    flags = contamination_flags(
        corpus, eval_ngram_set(eval_docs, k_shingle=4), k_shingle=4
    )
    got = {r.doc_id: r.contaminated for r in flags.collect()}
    # docs 1 and 3 contain the 4-gram "quick brown fox jumps"
    assert got == {1: True, 2: False, 3: True, 4: False}


def test_decontaminate_drops_only_hits(spark, corpus, eval_docs):
    kept = decontaminate(corpus, eval_docs, k_shingle=4)
    assert sorted(r.doc_id for r in kept.collect()) == [2, 4]


def test_no_overlap_keeps_everything(spark, corpus):
    other = spark.createDataFrame(
        pd.DataFrame([(200, "zz yy xx ww vv uu")], columns=["doc_id", "text"])
    )
    assert decontaminate(corpus, other, k_shingle=4).count() == 4


def test_eval_side_broadcasts(spark, corpus, eval_docs):
    flags = contamination_flags(
        corpus, eval_ngram_set(eval_docs, k_shingle=4), k_shingle=4
    )
    plan = flags._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan
