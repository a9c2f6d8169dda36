"""Streaming drift pipeline: watermarked window stats must match the
batch stats for every finalized window, and stateful SR scoring must
flag the injected drift windows while accumulating state across
micro-batches."""

import datetime
import glob
import os
import shutil

import pyspark.sql.functions as F
import pytest

from anomalydetector_spark import datagen
from anomalydetector_spark.streaming import (
    sr_score_stream,
    streaming_window_stats,
)

N_ROWS = 24_000
N_CHUNKS = 4


@pytest.fixture(scope="module")
def stream_dirs(spark, tmp_path_factory):
    """Write the pages table as N_CHUNKS time-ordered parquet files so the
    file source (maxFilesPerTrigger=1) replays the crawl in event-time
    order and the watermark advances batch by batch."""
    root = tmp_path_factory.mktemp("stream")
    in_dir = str(root / "pages_in")
    os.makedirs(in_dir)
    pages = datagen.generate_pages(spark, N_ROWS).cache()
    pages.count()
    n_windows = 48
    per = n_windows // N_CHUNKS
    for i in range(N_CHUNKS):
        chunk = pages.filter(
            (F.col("wid") >= i * per) & (F.col("wid") < (i + 1) * per)
        )
        tmp = str(root / f"chunk{i}")
        chunk.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = glob.glob(f"{tmp}/part-*.parquet")[0]
        # lexicographic file name == event-time order
        shutil.copy(src, f"{in_dir}/{i:04d}.parquet")
    yield {"in": in_dir, "root": str(root), "pages": pages}
    pages.unpersist()


def _run_to_completion(q):
    q.awaitTermination(300)


def test_streaming_stats_match_batch(spark, stream_dirs):
    in_dir, root = stream_dirs["in"], stream_dirs["root"]
    pages = stream_dirs["pages"]
    schema = pages.schema

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    stats = streaming_window_stats(stream, watermark_delay="2 days")
    out_dir = f"{root}/stats_out"
    q = (
        stats.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", f"{root}/stats_ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _run_to_completion(q)

    got = spark.read.parquet(out_dir)
    n_got_windows = got.select("window_start").distinct().count()
    # watermark (2 days) + final-chunk windows can't finalize; everything
    # earlier must have been emitted exactly once
    assert n_got_windows >= 30
    assert (
        got.groupBy("stat_name", "window_start").count().filter("count > 1").count()
        == 0
    )

    # value parity with the batch aggregation on the same windows
    batch = (
        pages.withColumn("w", F.window("warc_ts", "1 day")["start"])
        .groupBy("w")
        .agg(
            F.count(F.lit(1)).cast("double").alias("doc_count"),
            F.avg(F.col("text").isNull().cast("double")).alias("null_rate"),
        )
    )
    joined = (
        got.filter(F.col("stat_name") == "doc_count")
        .join(batch, got.window_start == batch.w)
        .filter(F.abs(F.col("value") - F.col("doc_count")) > 0.5)
    )
    assert joined.count() == 0
    nr = (
        got.filter(F.col("stat_name") == "null_rate")
        .join(batch, got.window_start == batch.w)
        .filter(F.abs(F.col("value") - F.col("null_rate")) > 1e-9)
    )
    assert nr.count() == 0


def test_streaming_sr_flags_drift(spark, stream_dirs):
    root = stream_dirs["root"]
    stats_dir = f"{root}/stats_out"
    if not os.path.isdir(stats_dir):
        pytest.skip("stage-1 output missing (run order)")

    schema = "partition_key string, stat_name string, window_start timestamp, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(stats_dir)
    )
    scored = sr_score_stream(stream)
    out_dir = f"{root}/scored_out"
    q = (
        scored.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", f"{root}/scored_ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _run_to_completion(q)

    got = spark.read.parquet(out_dir)
    assert got.count() > 0
    flagged = {
        (r.stat_name, r.window_start)
        for r in got.filter("is_anomaly").collect()
    }
    t = datagen.truth()
    null_win = datetime.datetime(2025, 1, 1) + datetime.timedelta(
        days=t["null_window"]
    )
    assert ("null_rate", null_win) in flagged
    # a stable series must not fire
    assert not any(s == "lang_frac_de" for s, _ in flagged)


def test_streaming_checkpoint_resume_no_duplicates(spark, stream_dirs, tmp_path):
    """Kill-and-resume: drain half the input with availableNow, stop,
    add the rest, drain again with the SAME checkpoint — every finalized
    window appears exactly once across both runs."""
    import shutil as _sh

    root = stream_dirs["root"]
    pages = stream_dirs["pages"]
    schema = pages.schema

    in2 = str(tmp_path / "pages_in2")
    out = str(tmp_path / "stats_out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in2)
    files = sorted(glob.glob(f"{stream_dirs['in']}/*.parquet"))

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in2)
        )
        stats = streaming_window_stats(stream, window_duration="1 day",
                                       watermark_delay="1 day")
        q = (
            stats.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    # run 1: first half of the crawl
    for f in files[: len(files) // 2]:
        _sh.copy(f, in2)
    drain()
    n_first = spark.read.parquet(out).count()
    assert n_first > 0

    # run 2 (resumed from checkpoint): remaining files land
    for f in files[len(files) // 2:]:
        _sh.copy(f, in2)
    drain()

    final = spark.read.parquet(out)
    total = final.count()
    distinct = final.select("partition_key", "stat_name", "window_start").distinct().count()
    assert total == distinct, "duplicate finalized windows after resume"
    assert total > n_first  # the second drain appended new windows
