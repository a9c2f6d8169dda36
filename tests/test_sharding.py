"""Token-balanced corpus sharding (operators/sharding): global greedy
token prefix over the deterministic hash order, computed as a two-level
distributed prefix-sum — never a global single-partition window over
data."""

from __future__ import annotations

import hashlib
import io
from contextlib import redirect_stdout

import pandas as pd
import pytest
from pyspark.sql import functions as F

from anomalydetector_spark.operators.sharding import (
    assign_shards_by_tokens,
    shard_summary,
    write_token_shards,
)

SEED = 0
BUDGET = 1_000


def _u(doc_id, seed=SEED):
    return int(
        hashlib.md5(f"{doc_id}:{seed}".encode()).hexdigest()[:15], 16
    )


def shards_py(rows, budget=BUDGET, seed=SEED):
    """Pure-python mirror: sort by (u, id), greedy running-total cut."""
    ordered = sorted(
        ((r["doc_id"], r["toks"] or 0) for r in rows if r["doc_id"] is not None),
        key=lambda t: (_u(t[0], seed), t[0]),
    )
    out, before = {}, 0
    for doc_id, t in ordered:
        out[doc_id] = before // budget
        before += t
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        {"doc_id": i, "toks": (i * 131) % 400 + 10} for i in range(4000)
    ]
    rows += [{"doc_id": 9000, "toks": None}]
    return rows, spark.createDataFrame(pd.DataFrame(rows)).persist()


def _collect(df):
    return {r.doc_id: r.shard for r in df.select("doc_id", "shard").collect()}


def test_shards_match_pure_python(corpus):
    rows, df = corpus
    got = _collect(assign_shards_by_tokens(df, BUDGET, "toks"))
    assert got == shards_py(rows)


def test_shards_independent_of_buckets_and_partitioning(corpus):
    rows, df = corpus
    a = _collect(assign_shards_by_tokens(df, BUDGET, "toks", n_buckets=8))
    b = _collect(
        assign_shards_by_tokens(
            df.repartition(16), BUDGET, "toks", n_buckets=1024
        )
    )
    c = _collect(
        assign_shards_by_tokens(df.repartition(1), BUDGET, "toks", n_buckets=1)
    )
    assert a == b == c == shards_py(rows)


def test_shard_balance_bounds(corpus):
    rows, df = corpus
    sharded = assign_shards_by_tokens(df, BUDGET, "toks")
    summ = {r.shard: (r.n_docs, r.n_tokens)
            for r in shard_summary(sharded, "toks").collect()}
    max_doc = max(r["toks"] or 0 for r in rows)
    n_shards = max(summ) + 1
    assert set(summ) == set(range(n_shards))  # contiguous ids, no holes
    total = sum(r["toks"] or 0 for r in rows)
    assert sum(t for _, t in summ.values()) == total
    assert sum(d for d, _ in summ.values()) == len(rows)
    for s in range(n_shards - 1):  # every interior shard near budget
        assert BUDGET - max_doc <= summ[s][1] <= BUDGET + max_doc


def test_null_tokens_occupy_slot_null_id_dropped(spark):
    rows = [{"doc_id": 1, "toks": 5}, {"doc_id": 2, "toks": None},
            {"doc_id": None, "toks": 100}]
    df = spark.createDataFrame(pd.DataFrame(rows))
    got = assign_shards_by_tokens(df, 10, "toks").collect()
    assert sorted(r.doc_id for r in got) == [1, 2]
    assert all(r.shard == 0 for r in got)


def test_budget_validation(corpus):
    _, df = corpus
    with pytest.raises(ValueError):
        assign_shards_by_tokens(df, 0, "toks")
    with pytest.raises(ValueError):
        assign_shards_by_tokens(df, 100, "toks", n_buckets=3)


def test_write_one_file_per_shard(corpus, tmp_path):
    _, df = corpus
    sharded = assign_shards_by_tokens(df, 50_000, "toks")
    out = str(tmp_path / "shards")
    write_token_shards(sharded, out)
    import glob
    import os

    dirs = sorted(glob.glob(os.path.join(out, "shard=*")))
    assert len(dirs) >= 2
    for d in dirs:
        assert len(glob.glob(os.path.join(d, "*.parquet"))) == 1
    spark = sharded.sparkSession
    back = spark.read.parquet(out)
    assert back.count() == df.filter(F.col("doc_id").isNotNull()).count()


def test_plan_no_global_window_over_data(corpus):
    _, df = corpus
    buf = io.StringIO()
    with redirect_stdout(buf):
        assign_shards_by_tokens(df, BUDGET, "toks").explain("formatted")
    plan = buf.getvalue()
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    # the data-sized window is partitioned by bucket; the only
    # unpartitioned window runs over the n_buckets-row totals frame,
    # which sits downstream of a full aggregation
    assert plan.count("Window") >= 2
    assert "BroadcastHashJoin" in plan


def test_prep_corpus_cli_shard_tokens(spark, tmp_path):
    """prep-corpus --shard-tokens: the corpus pipeline ends in
    token-balanced shard directories, one file each, covering every
    surviving doc exactly once."""
    import glob
    import os
    import sys
    from unittest import mock

    from anomalydetector_spark import cli

    out = str(tmp_path / "corpus")
    argv = [
        "prog", "prep-corpus",
        "--input-path", "/root/testdata/sf0.001/documents.parquet",
        "--output-path", out,
        "--min-quality", "0.0",
        "--shard-tokens", "20000",
    ]
    with mock.patch.object(sys, "argv", argv):
        cli.main()
    corpus = spark.read.parquet(out)
    shards = spark.read.parquet(out + "_shards")
    assert shards.count() == corpus.count()
    dirs = glob.glob(os.path.join(out + "_shards", "shard=*"))
    assert len(dirs) >= 2
    for d in dirs:
        assert len(glob.glob(os.path.join(d, "*.parquet"))) == 1
    # every shard except possibly the last lands within one doc of budget
    from pyspark.sql import functions as F

    summ = sorted(
        (r.shard, r.tok) for r in shards.groupBy("shard")
        .agg(F.sum("n_tokens").alias("tok")).collect()
    )
    max_doc = corpus.agg(F.max("n_tokens")).first()[0]
    for s, tok in summ[:-1]:
        assert 20000 - max_doc <= tok <= 20000 + max_doc
