"""CLI tokenize/keywords subcommands (cli.cmd_tokenize /
cmd_keywords — BPE + TF-IDF user surfaces)."""

import pyspark.sql.functions as F

from anomalydetector_spark import cli

ROWS = [
    (1, "low lower lowest low low"),
    (2, "new newer newest new"),
    (3, "wide wider widest low new"),
    (4, ""),
]


def _write_docs(spark, tmp_path):
    path = str(tmp_path / "docs.parquet")
    spark.createDataFrame(ROWS, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(path)
    return path


def test_tokenize_end_to_end(spark, tmp_path):
    docs = _write_docs(spark, tmp_path)
    out = str(tmp_path / "subwords")
    cli.main([
        "tokenize", "--input-path", docs, "--output-path", out,
        "--num-merges", "8", "--min-pair-count", "2",
    ])
    merges = spark.read.parquet(out + "_merges")
    assert merges.count() > 0
    assert merges.columns == ["rank", "left", "right", "merged", "pair_count"]
    counts = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert set(counts) == {1, 2, 3, 4}
    assert counts[4].n_tokens == 0 and counts[4].n_subwords == 0
    # parity with the operator called directly
    from anomalydetector_spark.operators.bpe import (
        bpe_token_counts,
        learn_bpe_merges,
    )

    d = spark.createDataFrame(ROWS, "doc_id bigint, text string")
    m = learn_bpe_merges(d, num_merges=8, min_pair_count=2)
    direct = {r.doc_id: (r.n_tokens, r.n_subwords) for r in bpe_token_counts(d, m).collect()}
    assert {k: (v.n_tokens, v.n_subwords) for k, v in counts.items()} == direct


def test_tokenize_reapply_saved_merges(spark, tmp_path):
    docs = _write_docs(spark, tmp_path)
    out1 = str(tmp_path / "first")
    cli.main([
        "tokenize", "--input-path", docs, "--output-path", out1,
        "--num-merges", "6", "--merges-only",
    ])
    assert not (tmp_path / "first").exists()  # counts skipped
    out2 = str(tmp_path / "second")
    cli.main([
        "tokenize", "--input-path", docs, "--output-path", out2,
        "--merges-path", out1 + "_merges",
    ])
    # re-apply never rewrites the artifact (no <out2>_merges) and the
    # counts equal a fresh train-and-apply with the same params
    assert not (tmp_path / "second_merges").exists()
    out3 = str(tmp_path / "third")
    cli.main([
        "tokenize", "--input-path", docs, "--output-path", out3,
        "--num-merges", "6",
    ])
    reapplied = sorted(map(tuple, spark.read.parquet(out2).collect()))
    fresh = sorted(map(tuple, spark.read.parquet(out3).collect()))
    assert reapplied == fresh and len(reapplied) == 4


def test_tokenize_refresh_counts_in_place(spark, tmp_path):
    # --merges-path pointing at the SAME artifact base must not raise
    # overwrite-while-read (the documented refresh workflow)
    docs = _write_docs(spark, tmp_path)
    out = str(tmp_path / "arte")
    cli.main([
        "tokenize", "--input-path", docs, "--output-path", out,
        "--num-merges", "6",
    ])
    cli.main([
        "tokenize", "--input-path", docs, "--output-path", out,
        "--merges-path", out + "_merges",
    ])
    assert spark.read.parquet(out).count() == 4


def test_keywords_end_to_end(spark, tmp_path):
    docs = _write_docs(spark, tmp_path)
    out = str(tmp_path / "kw")
    cli.main([
        "keywords", "--input-path", docs, "--output-path", out,
        "--top-k", "2", "--min-df", "1",
    ])
    idf = spark.read.parquet(out + "_idf")
    assert {"token", "df", "idf_micro"} == set(idf.columns)
    terms = spark.read.parquet(out)
    per_doc = (
        terms.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert all(r.n <= 2 for r in per_doc)
    ranks = {(r.doc_id, r.rank) for r in terms.collect()}
    assert (1, 1) in ranks and (1, 2) in ranks  # dense 1-based ranks
    # doc 1's top keyword is its dominant distinctive term
    top1 = [r.token for r in terms.collect() if r.doc_id == 1 and r.rank == 1]
    assert top1 == ["low"]
