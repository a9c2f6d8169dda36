"""sessions CLI end-to-end: stats + funnel + retention artifacts."""

from pyspark.sql import functions as F

from anomalydetector_spark import cli

EVENTS = "/root/testdata/sf0.001/events.parquet"


def test_sessions_cli_full(spark, tmp_path, capsys):
    out = str(tmp_path / "sessions")
    cli.main(
        [
            "sessions",
            "--input-path", EVENTS,
            "--output-path", out,
            "--funnel-steps", "view,click,purchase",
            "--retention",
        ]
    )
    stats = spark.read.parquet(out)
    assert stats.count() == 691  # pinned by the oracle at sf0.001
    assert {"session_start", "duration_us", "n_events", "n_types"} <= set(
        stats.columns
    )
    funnel = spark.read.parquet(out + "_funnel")
    assert funnel.count() == 3
    ret = spark.read.parquet(out + "_retention")
    assert ret.filter(F.col("week_offset") == 0).count() > 0
    assert (
        ret.filter(
            (F.col("week_offset") == 0) & (F.col("retention") != 1.0)
        ).count()
        == 0
    )
    printed = capsys.readouterr().out
    assert "session rows" in printed and "funnel step 1" in printed


def test_sessions_cli_bucketed_equals_plain(spark, tmp_path):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    cli.main(["sessions", "--input-path", EVENTS, "--output-path", a])
    cli.main(
        ["sessions", "--input-path", EVENTS, "--output-path", b, "--bucketed"]
    )
    pa = {tuple(r) for r in spark.read.parquet(a).collect()}
    pb = {tuple(r) for r in spark.read.parquet(b).collect()}
    assert pa == pb
