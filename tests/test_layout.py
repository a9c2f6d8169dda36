"""Z-order layout operators (operators/layout.py): key correctness vs
the pure-python mirror and the SQL twin, and the actual pruning payoff
— a clustered layout must touch far fewer files for a box query."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from anomalydetector_spark.operators.layout import (
    compute_bounds,
    write_clustered,
    zorder_key,
    zorder_key_np,
    zorder_sql,
)

BOUNDS = [(0.0, 100.0), (0.0, 150.0)]


def test_zorder_key_matches_python_mirror(spark):
    rows = [
        (0.0, 0.0), (99.9, 149.9), (50.0, 75.0), (12.5, 140.0),
        (-5.0, 200.0),          # out of range both sides -> clamped
        (None, 10.0),           # null -> cell 0
        (33.3, None),
    ]
    df = spark.createDataFrame(rows, "x double, y double")
    got = [
        r[0]
        for r in df.select(
            zorder_key(["x", "y"], BOUNDS, bits=8)
        ).collect()
    ]
    want = zorder_key_np(
        [[r[0] for r in rows], [r[1] for r in rows]], BOUNDS, bits=8
    )
    assert got == want


def test_zorder_sql_twin_identical(spark):
    df = spark.range(500).select(
        (F.col("id") % 101).cast("double").alias("x"),
        ((F.col("id") * 7) % 151).cast("double").alias("y"),
    )
    got = sorted(
        r[0]
        for r in df.select(zorder_key(["x", "y"], BOUNDS, bits=8)).collect()
    )
    pdf = df.toPandas()
    sql = zorder_sql(["x", "y"], BOUNDS, bits=8)
    want = sorted(
        r[0]
        for r in duckdb.sql(f"SELECT {sql} FROM pdf").fetchall()
    )
    assert got == want


def test_zorder_validation_errors():
    with pytest.raises(ValueError):
        zorder_key(["x"], [(0, 1)])
    with pytest.raises(ValueError):
        zorder_key(["x", "y"], [(0, 1)])
    with pytest.raises(ValueError):
        zorder_key(["x", "y"], [(0, 1), (1, 1)])  # hi == lo
    with pytest.raises(ValueError):
        zorder_key(["x", "y"], [(0, 1), (0, 1)], bits=32)  # 64 > 63


def test_compute_bounds_top_value_does_not_clamp(spark):
    df = spark.createDataFrame([(0.0,), (10.0,)], "x double")
    (lo, hi), (lo2, hi2) = compute_bounds(df, ["x", "x"])
    assert lo == 0.0 and hi > 10.0
    # the true max quantizes into the top cell, not past it
    q = zorder_key_np([[10.0], [10.0]], [(lo, hi), (lo2, hi2)], bits=8)
    assert q[0] < (1 << 16)


def test_clustered_layout_prunes_box_queries(spark, tmp_path):
    """The point of the operator: a 10%x10% box over a clustered layout
    touches a small corner of the files; the same rows scattered
    randomly touch essentially all of them."""
    n_files = 16
    df = spark.range(20000).select(
        ((F.col("id") * 2654435761) % 1000).cast("double").alias("x"),
        ((F.col("id") * 40503) % 1000).cast("double").alias("y"),
    )
    bounds = [(0.0, 1000.0), (0.0, 1000.0)]
    zpath = str(tmp_path / "zordered")
    rpath = str(tmp_path / "random")
    write_clustered(df, zpath, ["x", "y"], bounds, n_files=n_files)
    df.repartition(n_files).write.parquet(rpath)

    box = (
        (F.col("x") >= 100) & (F.col("x") < 200)
        & (F.col("y") >= 100) & (F.col("y") < 200)
    )

    def files_touched(path):
        return (
            spark.read.parquet(path)
            .filter(box)
            .select(F.input_file_name())
            .distinct()
            .count()
        )

    z, r = files_touched(zpath), files_touched(rpath)
    # identical row content either way
    assert (
        spark.read.parquet(zpath).filter(box).count()
        == spark.read.parquet(rpath).filter(box).count()
        > 0
    )
    assert r >= n_files * 3 // 4  # random layout: the box is everywhere
    assert z <= n_files // 4  # clustered: a corner of the key space