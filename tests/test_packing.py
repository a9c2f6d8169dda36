"""Sequence packing (operators/packing): partition of the corpus,
budget respected, fill quality, determinism."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from anomalydetector_spark.operators.packing import (
    pack_sequences,
    packing_stats,
)

BUDGET = 1000


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.default_rng(5)
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(4000),
            "n_tokens": rng.integers(20, 600, size=4000),
        }
    )
    # a few oversize docs and one exactly at budget
    pdf.loc[0, "n_tokens"] = 2500
    pdf.loc[1, "n_tokens"] = BUDGET
    return spark.createDataFrame(pdf).persist()


@pytest.fixture(scope="module")
def packed(docs):
    return pack_sequences(docs, BUDGET, n_buckets=8, seed=1).persist()


def test_every_doc_in_exactly_one_pack(docs, packed):
    assert packed.count() == docs.count()
    assert packed.select("doc_id").distinct().count() == docs.count()


def test_budget_respected_and_sums_consistent(packed):
    per_pack = packed.groupBy("bucket", "pack").agg(
        F.sum("n_tokens").alias("s"),
        F.first("pack_tokens").alias("pt"),
        F.max(F.col("oversize").cast("int")).alias("ov"),
        F.count("*").alias("n"),
    )
    bad = per_pack.filter(
        (F.col("s") != F.col("pt"))
        | ((F.col("ov") == 0) & (F.col("s") > BUDGET))
    )
    assert bad.count() == 0
    # oversize docs sit alone
    assert per_pack.filter((F.col("ov") == 1) & (F.col("n") > 1)).count() == 0


def test_fill_quality_and_stats(packed):
    stats = packing_stats(packed, BUDGET).first()
    assert stats.n_docs == 4000
    assert stats.n_oversize == 1
    assert stats.mean_fill > 0.9  # greedy fold on uniform sizes packs tight
    assert stats.n_packs < 4000 * 320 / BUDGET * 1.3  # vs ~avg-size bound


def test_deterministic_assignment(docs, packed):
    again = pack_sequences(docs, BUDGET, n_buckets=8, seed=1)
    a = {r.doc_id: (r.bucket, r.pack) for r in packed.collect()}
    b = {r.doc_id: (r.bucket, r.pack) for r in again.collect()}
    assert a == b


def test_exact_budget_doc_not_oversize(packed):
    row = packed.filter(F.col("doc_id") == 1).first()
    assert row.n_tokens == BUDGET and not row.oversize
    assert row.pack_tokens == BUDGET  # own, perfectly-filled pack
