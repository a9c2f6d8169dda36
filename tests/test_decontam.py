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


def test_near_dup_contamination_catches_edited_copy(spark):
    """An exact eval copy AND a one-word edit both flag; unrelated and
    low-overlap docs survive. Brute-force Jaccard agreement is asserted
    for every flagged id (no false positives by construction — LSH only
    generates candidates, the exact verify decides)."""
    from anomalydetector_spark.operators.decontam import (
        decontaminate_near_dup,
        near_dup_contaminated_ids,
    )

    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo")
    eval_docs = spark.createDataFrame(
        [(1000, base)], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, base),                                   # exact copy
            (2, base.replace("kilo", "KILO9")),          # one-word edit
            (3, "totally different words entirely here"), # clean
            (4, "alpha bravo charlie but then it diverges completely "
                "into some other unrelated ramble"),      # low overlap
        ],
        "doc_id long, text string",
    )
    # 8 bands x 2 rows: candidate recall at j~0.68 is ~0.999 (vs ~0.61
    # for 4x4), so the deterministic md5 draw lands reliably
    dirty = {
        r["doc_id"]
        for r in near_dup_contaminated_ids(
            corpus, eval_docs, threshold=0.5, n_hashes=16, bands=8
        ).collect()
    }
    assert dirty == {1, 2}
    kept = {
        r["doc_id"]
        for r in decontaminate_near_dup(
            corpus, eval_docs, threshold=0.5, n_hashes=16, bands=8
        ).collect()
    }
    assert kept == {3, 4}


def test_near_dup_verify_threshold_binds(spark):
    """A candidate that collides in a band but verifies below threshold
    must NOT flag: duplicate the first half of the eval doc (shares
    shingles -> likely band collision) but pad with fresh text so the
    exact Jaccard drops under 0.9."""
    from anomalydetector_spark.operators.decontam import (
        near_dup_contaminated_ids,
    )

    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo")
    eval_docs = spark.createDataFrame([(1000, base)], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(1, base + " sierra tango uniform victor whiskey xray yankee zulu "
             "one two three four five six seven eight nine ten")],
        "doc_id long, text string",
    )
    lo = near_dup_contaminated_ids(
        corpus, eval_docs, threshold=0.3, n_hashes=16, bands=8).collect()
    hi = near_dup_contaminated_ids(
        corpus, eval_docs, threshold=0.9, n_hashes=16, bands=8).collect()
    assert {r["doc_id"] for r in lo} == {1}  # candidate exists, low bar passes
    assert hi == []                          # exact verify rejects at 0.9
