"""Full-pipeline integration: raw WARC archive → ingest-warc →
prep-corpus (frontier dedup, exact dedup, quality gate) → chunking →
sequence packing — every stage through the real CLI, each boundary
invariant asserted."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from anomalydetector_spark import cli
from anomalydetector_spark.sources.warc import warc_record_bytes


def _page(i: int, body: str, status: int = 200, url: str | None = None):
    return warc_record_bytes(
        url or f"http://site{i % 5}.example/page{i}",
        f"2025-04-{1 + i % 9:02d}T00:00:00Z",
        f"<html><body>{body}</body></html>".encode(),
        http_status=status,
        record_id=f"<urn:uuid:{i}>",
    )


def test_archive_to_training_sequences(spark, tmp_path, capsys):
    base = (
        "the quick crawl of the web is a data pipeline and the engine "
        "must validate check and chunk it for training at scale with "
    )
    recs = []
    for i in range(40):
        recs.append(_page(i, base + f"unique tail {i} " + "words " * i))
    # exact duplicates: same body, different urls -> one survivor
    recs.append(_page(100, base + "duplicated body", url="http://dup.example/a"))
    recs.append(_page(101, base + "duplicated body", url="http://dup.example/b"))
    # frontier duplicates: same canonical url (tracking param stripped)
    recs.append(_page(102, base + "frontier one", url="http://f.example/p"))
    recs.append(
        _page(103, base + "frontier two", url="http://f.example/p?utm_source=x")
    )
    # an error page that must never reach the corpus
    recs.append(_page(104, "404 not found boilerplate", status=404))
    (tmp_path / "crawl.warc.gz").write_bytes(gzip.compress(b"".join(recs)))

    pages = str(tmp_path / "pages")
    cli.main(["ingest-warc", "--input-path", str(tmp_path / "crawl.warc.gz"),
              "--output-path", pages])
    ingested = spark.read.parquet(pages)
    assert ingested.count() == 44  # 45 responses minus the 404

    corpus = str(tmp_path / "corpus")
    cli.main([
        "prep-corpus",
        "--input-path", pages,
        "--output-path", corpus,
        "--id-column", "url",
        "--url-column", "url",
        "--min-quality", "0.0",
        "--chunk-tokens", "24",
        "--chunk-overlap", "4",
        "--pack-budget", "48",
    ])
    out = spark.read.parquet(corpus)
    urls = {r.url for r in out.select("url").collect()}
    # frontier dedup collapsed the utm variant, exact dedup the twin body
    assert len(urls & {"http://f.example/p", "http://f.example/p?utm_source=x"}) == 1
    assert len(urls & {"http://dup.example/a", "http://dup.example/b"}) == 1
    assert "http://site4.example/page104" not in urls  # 404 never entered

    chunks = spark.read.parquet(corpus + "_chunks")
    packs = spark.read.parquet(corpus + "_packs")
    # chunk boundary: every surviving doc chunked, budget respected
    assert {r.url for r in chunks.select("url").collect()} == urls
    assert chunks.filter(F.col("n_tokens") > 24).count() == 0
    # pack boundary: every chunk packed exactly once, no oversize packs
    assert packs.count() == chunks.count()
    assert packs.filter(F.col("oversize")).count() == 0
    fills = packs.groupBy("bucket", "pack").agg(
        F.sum("n_tokens").alias("s")
    )
    assert fills.filter(F.col("s") > 48).count() == 0
    msg = capsys.readouterr().out
    assert "ingested 44 pages" in msg
    assert "chunked into" in msg and "packed into" in msg
