"""Streaming sessionization (native session_window) == batch
sessionize (default INCLUSIVE boundary) on the full stats frame, plus
checkpoint-resume exactly-once and the empirical boundary-semantics
pin."""

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from anomalydetector_spark.operators.sessions import (
    session_stats,
    sessionize,
)
from anomalydetector_spark.streaming.sessions_stream import (
    streaming_session_stats,
)

T0 = dt.datetime(2024, 1, 1)
GAP_S = 4 * 3600
SENTINEL_USER = 999_999


def _events(spark, n=2500, n_users=20, seed=17):
    """Time-clustered events so sessions have >1 event, plus one
    far-future sentinel that pushes the final watermark past every real
    session's close (append mode only emits closed sessions)."""
    rng = random.Random(seed)
    rows = []
    for eid in range(n):
        user = rng.randrange(n_users)
        burst = rng.randrange(40)  # cluster events into bursts
        ts = T0 + dt.timedelta(
            hours=burst * 12, seconds=rng.randrange(3600), microseconds=rng.randrange(10)
        )
        rows.append((eid, user, ts, f"t{rng.randrange(3)}"))
    rows.append((n, SENTINEL_USER, T0 + dt.timedelta(days=60), "t0"))
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )


def _write_time_chunks(spark, tmp_path, df, n_chunks=4):
    """Non-overlapping time-range files so per-batch watermarks never
    drop in-order data."""
    in_dir = str(tmp_path / "in")
    pdf = df.orderBy("ts").toPandas()
    step = (len(pdf) + n_chunks - 1) // n_chunks
    for i in range(n_chunks):
        chunk = pdf.iloc[i * step : (i + 1) * step]
        if len(chunk):
            spark.createDataFrame(chunk, df.schema).coalesce(1).write.mode(
                "append"
            ).parquet(in_dir)
    return in_dir


def _batch_expected(df):
    sess = sessionize(
        df.filter(F.col("user_id") != SENTINEL_USER),
        "user_id",
        "ts",
        GAP_S,
        tiebreak_cols=["event_id"],
    )
    stats = session_stats(sess, "user_id", "ts", type_col="event_type")
    return {
        (
            r["user_id"],
            r["session_start"],
            r["session_end"],
            r["duration_us"],
            r["n_events"],
            r["n_types"],
        )
        for r in stats.collect()
    }


def _run_stream(spark, in_dir, out_dir, ckpt, schema):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        streaming_session_stats(
            stream,
            key_cols=("user_id",),
            ts_col="ts",
            gap_seconds=GAP_S,
            watermark_delay="1 hour",
            type_col="event_type",
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def _got(spark, out_dir):
    return {
        tuple(r)
        for r in spark.read.parquet(out_dir)
        .filter(F.col("user_id") != SENTINEL_USER)
        .select(
            "user_id",
            "session_start",
            "session_end",
            "duration_us",
            "n_events",
            "n_types",
        )
        .collect()
    }


def test_streaming_matches_batch(spark, tmp_path):
    df = _events(spark)
    in_dir = _write_time_chunks(spark, tmp_path, df)
    out = str(tmp_path / "out")
    _run_stream(spark, in_dir, out, str(tmp_path / "ckpt"), df.schema)
    got = _got(spark, out)
    want = _batch_expected(df)
    assert got == want
    assert len(want) > 50  # non-trivial session structure


def test_checkpoint_resume_no_duplicates(spark, tmp_path):
    """Stop after the first half of the files, restart on the same
    checkpoint with the rest present: the final output equals the
    one-shot run exactly — no duplicated or lost sessions."""
    df = _events(spark, seed=23)
    pdf = df.orderBy("ts").toPandas()
    in_dir = str(tmp_path / "in")
    half = len(pdf) // 2
    spark.createDataFrame(pdf.iloc[:half], df.schema).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _run_stream(spark, in_dir, out, ckpt, df.schema)

    spark.createDataFrame(pdf.iloc[half:], df.schema).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    _run_stream(spark, in_dir, out, ckpt, df.schema)

    assert _got(spark, out) == _batch_expected(df)


def test_exact_gap_boundary_semantics(spark, tmp_path):
    """Two events exactly gap apart MERGE under the native operator
    (inclusive right edge — one session of duration == gap), matching
    the batch default; batch closed='exclusive' is the one that splits.
    This empirical pin is what the module docstrings cite."""
    rows = [
        (1, 7, T0, "a"),
        (2, 7, T0 + dt.timedelta(seconds=GAP_S), "a"),
        (3, SENTINEL_USER, T0 + dt.timedelta(days=60), "a"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    in_dir = str(tmp_path / "in")
    df.coalesce(1).write.parquet(in_dir)
    out = str(tmp_path / "out")
    _run_stream(spark, in_dir, out, str(tmp_path / "ckpt"), df.schema)
    got = _got(spark, out)
    assert got == {
        (7, rows[0][2], rows[1][2], GAP_S * 1_000_000, 2, 1)
    }  # native operator merges at exactly gap
    excl = sessionize(
        df.filter(F.col("user_id") == 7), "user_id", "ts", GAP_S,
        closed="exclusive",
    ).select("session_index").distinct().count()
    assert excl == 2  # the strict convention splits
