"""`evaluate` CLI subcommand — the reference's evaluation protocol
(srcnn/evalue.py sweep + competition_metric per-series scoring) driven
end-to-end through the argparse surface, checked against the operator
layer it wraps."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from anomalydetector_spark import cli
from anomalydetector_spark.operators.evaluate import (
    f1_threshold_sweep,
    per_series_f1,
)


@pytest.fixture(scope="module")
def scored_path(spark, tmp_path_factory):
    rng = np.random.default_rng(11)
    frames = []
    for sid in ("s1", "s2", "s3"):
        n = 60
        score = rng.random(n)
        label = (rng.random(n) < 0.15).astype(int)
        frames.append(
            pd.DataFrame(
                {
                    "series_id": sid,
                    "timestamp": pd.date_range(
                        "2026-01-01", periods=n, freq="min"
                    ),
                    "label": label,
                    "score": score,
                }
            )
        )
    path = str(tmp_path_factory.mktemp("scored") / "scored.parquet")
    spark.createDataFrame(pd.concat(frames)).write.parquet(path)
    return path


def test_evaluate_sweep_matches_operator(spark, scored_path, tmp_path, capsys):
    out = str(tmp_path / "out")
    cli.main(
        [
            "evaluate",
            "--input-path", scored_path,
            "--output-path", out,
            "--mode", "sweep",
            "--n-thresholds", "10",
            "--scale", "0.1",
            "--delay", "3",
        ]
    )
    sweep = spark.read.parquet(f"{out}/sweep")
    assert sweep.count() == 10
    expect = f1_threshold_sweep(
        spark.read.parquet(scored_path),
        n_thresholds=10,
        scale=0.1,
        adjust=True,
        order_by=["timestamp"],
        partition_by="series_id",
        delay=3,
    )
    got = {r.threshold: r.f1 for r in sweep.collect()}
    for r in expect.collect():
        assert got[r.threshold] == pytest.approx(r.f1, abs=1e-12)
    msg = capsys.readouterr().out
    assert "best overall threshold" in msg


def test_evaluate_per_series_matches_operator(
    spark, scored_path, tmp_path, capsys
):
    out = str(tmp_path / "out")
    cli.main(
        [
            "evaluate",
            "--input-path", scored_path,
            "--output-path", out,
            "--mode", "per-series",
            "--threshold", "0.6",
            "--delay", "3",
        ]
    )
    per = spark.read.parquet(f"{out}/per_series")
    assert per.count() == 3
    expect = per_series_f1(
        spark.read.parquet(scored_path).withColumn(
            "pred", (F.col("score") > 0.6).cast("int")
        ),
        series_col="series_id",
        order_by=["timestamp"],
        delay=3,
    )
    got = {r.series_id: r.f1 for r in per.collect()}
    for r in expect.collect():
        assert got[r.series_id] == pytest.approx(r.f1, abs=1e-12)
    msg = capsys.readouterr().out
    assert "overall F1" in msg and "variance" in msg


def test_evaluate_gap_rule_runs(spark, scored_path, tmp_path):
    out = str(tmp_path / "out")
    cli.main(
        [
            "evaluate",
            "--input-path", scored_path,
            "--output-path", out,
            "--mode", "per-series",
            "--gap-rule",
            "--no-adjust",
        ]
    )
    per = spark.read.parquet(f"{out}/per_series")
    assert per.count() == 3
    assert {"tp", "fp", "fn", "tn", "f1"} <= set(per.columns)
