"""prep-corpus CLI with the sampling/mixing/packing stages."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anomalydetector_spark import cli

DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_prep_corpus_basic(spark, tmp_path, capsys):
    out = str(tmp_path / "corpus")
    cli.main(["prep-corpus", "--input-path", DOCS, "--output-path", out])
    corpus = spark.read.parquet(out)
    assert corpus.count() > 0
    assert {"doc_id", "n_tokens", "quality", "fingerprint"} <= set(
        corpus.columns
    )
    assert "prepared" in capsys.readouterr().out


def test_prep_corpus_mix_sample_pack(spark, tmp_path, capsys):
    out = str(tmp_path / "corpus")
    cli.main(
        [
            "prep-corpus",
            "--input-path", DOCS,
            "--output-path", out,
            "--mix-weights", "en=1.0,de=1.0",
            "--mix-column", "lang",
            "--sample-fraction", "0.9",
            "--pack-budget", "256",
            "--seed", "3",
        ]
    )
    corpus = spark.read.parquet(out)
    n = corpus.count()
    assert 0 < n < 500  # mixing + sampling actually dropped rows
    packed = spark.read.parquet(out + "_packs")
    assert packed.count() == n  # every surviving doc is packed
    over = packed.groupBy("bucket", "pack").agg(
        F.sum("n_tokens").alias("s"),
        F.max(F.col("oversize").cast("int")).alias("ov"),
    )
    assert over.filter((F.col("ov") == 0) & (F.col("s") > 256)).count() == 0
    msg = capsys.readouterr().out
    assert "packed into" in msg and "mean fill" in msg
    # determinism: a rerun reproduces the same corpus row set
    out2 = str(tmp_path / "corpus2")
    cli.main(
        [
            "prep-corpus",
            "--input-path", DOCS,
            "--output-path", out2,
            "--mix-weights", "en=1.0,de=1.0",
            "--mix-column", "lang",
            "--sample-fraction", "0.9",
            "--pack-budget", "256",
            "--seed", "3",
        ]
    )
    a = {r.doc_id for r in corpus.select("doc_id").collect()}
    b = {r.doc_id for r in spark.read.parquet(out2).select("doc_id").collect()}
    assert a == b


def test_bad_weight_spec_raises(tmp_path):
    with pytest.raises(ValueError, match="bad weight spec"):
        cli.main(
            [
                "prep-corpus",
                "--input-path", DOCS,
                "--output-path", str(tmp_path / "x"),
                "--mix-weights", "en:1.0",
            ]
        )


def test_prep_corpus_decontam(spark, tmp_path, capsys):
    """--decontam-path drops training docs overlapping the eval table
    before dedup/gating."""
    import pandas as pd
    from anomalydetector_spark.cli import main

    good = ("this is a reasonably long document with plenty of normal "
            "words and the usual amount of structure in it for a test " * 2)
    poisoned = good + " secret eval question about unicorns etc"
    train = spark.createDataFrame(pd.DataFrame(
        [(1, good), (2, poisoned)], columns=["doc_id", "text"]))
    ev = spark.createDataFrame(pd.DataFrame(
        [(9, "the secret eval question about unicorns is here")],
        columns=["doc_id", "text"]))
    train.write.mode("overwrite").parquet(str(tmp_path / "train"))
    ev.write.mode("overwrite").parquet(str(tmp_path / "eval"))

    main([
        "prep-corpus",
        "--input-path", str(tmp_path / "train"),
        "--output-path", str(tmp_path / "out"),
        "--decontam-path", str(tmp_path / "eval"),
        "--decontam-ngram", "4",
        "--min-quality", "0.0",
    ])
    kept = spark.read.parquet(str(tmp_path / "out"))
    assert [r.doc_id for r in kept.select("doc_id").collect()] == [1]


def test_prep_corpus_url_dedup_and_gopher(spark, tmp_path, capsys):
    """--url-column keeps one doc per canonical URL before any content
    stage; --gopher-filter hard-gates on the published rules."""
    import pandas as pd

    passing = (
        "the quick brown fox jumps over that lazy dog and runs with great "
        "speed to catch all of the shiny red apples lying under the old "
        "oak tree while birds have been singing sweet songs from every "
        "branch and the warm wind carries leaves across wide open fields "
        "toward distant hills where children play games until sunset"
    )
    rows = [
        # docs 1-3: same logical page, messy URL variants; min id survives
        (1, "http://www.dup.com:80/a/?utm_source=x&b=2&a=1", passing + " one"),
        (2, "HTTP://dup.com/a?a=1&b=2#frag", passing + " two"),
        (3, "http://dup.com/a/?b=2&a=1&gclid=z", passing + " three"),
        # doc 4: unique URL but fails the Gopher word-count rule
        (4, "http://other.com/b", "short junk doc"),
        # doc 5: unique URL, passes everything
        (5, "http://other.com/c", passing + " five"),
    ]
    src = str(tmp_path / "raw")
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "url", "text"])
    ).write.mode("overwrite").parquet(src)

    out = str(tmp_path / "corpus")
    cli.main([
        "prep-corpus", "--input-path", src, "--output-path", out,
        "--url-column", "url", "--gopher-filter", "--min-quality", "0.0",
    ])
    kept = sorted(
        r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()
    )
    assert kept == [1, 5]  # URL dedup dropped 2,3; Gopher dropped 4


def test_prep_corpus_scrub_and_redact(spark, tmp_path, capsys):
    """--scrub-min-docs drops cross-doc boilerplate lines before dedup
    (changing content hashes), --redact-pii scrubs PII before features."""
    import pandas as pd

    banner = "subscribe to our newsletter now"
    body = ("a reasonably long and ordinary document body with enough "
            "distinct words to pass the quality gate easily " * 2)
    rows = [
        (1, f"{banner}\n{body}alpha mail me at a@b.co"),
        (2, f"{banner}\n{body}beta"),
        (3, f"{banner}\n{body}gamma"),
        (4, banner),  # pure boilerplate -> dropped entirely
    ]
    src = str(tmp_path / "raw")
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    ).write.mode("overwrite").parquet(src)

    out = str(tmp_path / "corpus")
    cli.main([
        "prep-corpus", "--input-path", src, "--output-path", out,
        "--scrub-min-docs", "3", "--redact-pii", "--min-quality", "0.0",
    ])
    kept = spark.read.parquet(out)
    assert sorted(r.doc_id for r in kept.select("doc_id").collect()) == [1, 2, 3]

    # the banner is gone from the scrubbed text and the email is tokenized:
    # rerun with scrub only and check fingerprints differ from a no-scrub run
    out2 = str(tmp_path / "noscrub")
    cli.main([
        "prep-corpus", "--input-path", src, "--output-path", out2,
        "--min-quality", "0.0",
    ])
    fp_scrub = {r.doc_id: r.fingerprint for r in kept.collect()}
    fp_raw = {r.doc_id: r.fingerprint
              for r in spark.read.parquet(out2).collect()}
    assert fp_scrub[2] != fp_raw[2]  # scrubbing changed the hashed content


def test_prep_corpus_chunk_then_pack(spark, tmp_path, capsys):
    out = str(tmp_path / "corpus")
    cli.main(
        [
            "prep-corpus",
            "--input-path", DOCS,
            "--output-path", out,
            "--chunk-tokens", "32",
            "--chunk-overlap", "4",
            "--pack-budget", "64",
        ]
    )
    corpus = spark.read.parquet(out)
    chunks = spark.read.parquet(out + "_chunks")
    packed = spark.read.parquet(out + "_packs")
    # every surviving doc produced >= 1 chunk, and chunk count >= doc
    # count (long docs split)
    doc_ids = {r.doc_id for r in corpus.select("doc_id").collect()}
    chunk_docs = {r.doc_id for r in chunks.select("doc_id").collect()}
    assert chunk_docs == doc_ids
    assert chunks.count() >= corpus.count()
    # chunks respect the budget and carry a unique composite key
    assert chunks.filter(F.col("n_tokens") > 32).count() == 0
    assert (
        chunks.select("chunk_key").distinct().count() == chunks.count()
    )
    # packing consumed the CHUNKS (one packed row per chunk), and with
    # pack-budget >= chunk-tokens nothing is oversize
    assert packed.count() == chunks.count()
    assert packed.filter(F.col("oversize")).count() == 0
    msg = capsys.readouterr().out
    assert "chunked into" in msg and "packed into" in msg


def test_prep_corpus_keep_majority_lang(spark, tmp_path):
    """--keep-majority-lang drops foreign-language paragraphs before the
    quality gate; unknown-language paragraphs survive."""
    import pandas as pd

    en = ("the cat and the dog is close to the mat of the house and "
          "the end of it is near so the story goes on " * 2)
    de = "der hund und die katze ist da und das ist gut"
    rows = [
        (1, f"{en}\n{de}\n{en}"),
        (2, en),
    ]
    src = str(tmp_path / "raw")
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    ).write.mode("overwrite").parquet(src)

    out = str(tmp_path / "corpus")
    cli.main([
        "prep-corpus", "--input-path", src, "--output-path", out,
        "--keep-majority-lang", "--min-quality", "0.0",
    ])
    kept = spark.read.parquet(out)
    assert kept.count() == 2
    # the German paragraph changed doc 1's content hash vs a no-surgery run
    out2 = str(tmp_path / "nosurgery")
    cli.main([
        "prep-corpus", "--input-path", src, "--output-path", out2,
        "--min-quality", "0.0",
    ])
    fp_a = {r.doc_id: r.fingerprint for r in kept.collect()}
    fp_b = {r.doc_id: r.fingerprint
            for r in spark.read.parquet(out2).collect()}
    assert fp_a[1] != fp_b[1]   # foreign paragraph removed
    assert fp_a[2] == fp_b[2]   # monolingual doc untouched


def test_prep_corpus_neardup_decontam_and_fineweb(spark, tmp_path):
    """--decontam-near-dup drops near-duplicates of eval docs the exact
    8-gram rule misses; --fineweb-filter applies the three custom rules.
    Eval side: a one-word edit of a corpus doc (no shared 8-gram run of
    the same doc ... the salads are short, so use 3-gram-near overlap)."""
    eval_dir = str(tmp_path / "eval")
    # eval set = exact copies of every 50th doc (near-dup at J=1.0)
    spark.read.parquet(DOCS).filter(F.col("doc_id") % 50 == 0).write.parquet(
        eval_dir
    )
    out1 = str(tmp_path / "c1")
    out2 = str(tmp_path / "c2")
    cli.main(
        [
            "prep-corpus", "--input-path", DOCS, "--output-path", out1,
            "--decontam-path", eval_dir, "--decontam-ngram", "20",
        ]
    )
    cli.main(
        [
            "prep-corpus", "--input-path", DOCS, "--output-path", out2,
            "--decontam-path", eval_dir, "--decontam-ngram", "20",
            "--decontam-near-dup", "0.8",
        ]
    )
    # 20-gram exact rule misses the (short) copies; near-dup catches them
    n1 = spark.read.parquet(out1).count()
    n2 = spark.read.parquet(out2).count()
    assert n2 < n1
    kept2 = {
        r["doc_id"] for r in spark.read.parquet(out2).select("doc_id").collect()
    }
    assert not any(d % 50 == 0 for d in kept2)

    out3 = str(tmp_path / "c3")
    cli.main(
        [
            "prep-corpus", "--input-path", DOCS, "--output-path", out3,
            "--fineweb-filter",
        ]
    )
    # single-line unpunctuated salads fail the punct-ratio rule -> empty
    assert spark.read.parquet(out3).count() == 0
