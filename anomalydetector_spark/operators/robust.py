"""Robust per-group outlier detection: exact median / MAD (median
absolute deviation — Hampel 1974, the standard robust scale estimator)
computed on the (group, value) COUNTS CUBE, then applied back to rows
as a pure comparison.

The magnitude-bound check (P9, ``checks.py``) needs caller-supplied
bounds; this operator derives them robustly from the data itself —
``|x - median| > k·MAD`` — so a validation suite can flag numeric
outliers without anyone hand-picking limits, and (unlike mean/stddev
z-scores) the estimator itself cannot be dragged by the very outliers
it is hunting (50% breakdown point).

Exactness: both medians are TYPE-1 (inverse-CDF) quantiles —
``min{v : 2·cum(v) ≥ N}`` on the value-granular inclusive cumulative —
the same convention as ``lm_quality.perplexity_buckets``, so results
are independent of partitioning, ties never split, and a DuckDB oracle
reproduces every bit. For even group sizes type-1 takes the LOWER
middle value (no averaging — an averaged median would manufacture a
value the column never contained).

Scale shape (the ``perplexity_buckets`` pattern, applied twice):

1. one map-side-combined groupBy collapses the rows to the
   (group, value) cube;
2. the median comes from a cumulative window over that compact cube —
   never a per-group row sort (a group owning 40% of 10^12 rows would
   serialize one task);
3. deviations ``|v - median|`` are computed on CUBE rows and
   RE-AGGREGATED (two distinct values can share a deviation —
   ``median ± d`` — so the dev cube must be re-grouped, not reused);
4. the per-group (median, mad) row broadcasts back onto the input as
   one comparison — the rows themselves are touched exactly twice
   (cube build + final flag projection) and never sorted or shuffled
   on the value.

MAD = 0 (over half the group shares one value) makes EVERY deviating
row an outlier at any ``k`` — the estimator's documented failure mode
on quantized data; callers gate on the emitted ``mad`` column when
that bite is unwanted. Null values are excluded from the estimators
and emitted with a null flag.
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _type1_median(cube: DataFrame, by: Tuple[str, ...], val: str, out: str) -> DataFrame:
    """min{v : 2·cum(v) ≥ N} over a (by, val, _n) counts cube."""
    w = Window.partitionBy(*by).orderBy(val)
    wall = Window.partitionBy(*by)
    cum = cube.withColumn("_cum", F.sum("_n").over(w)).withColumn(
        "_tot", F.sum("_n").over(wall)
    )
    return cum.groupBy(*by).agg(
        F.min(
            F.when(F.col("_cum") * 2 >= F.col("_tot"), F.col(val))
        ).alias(out)
    )


def robust_median_mad(
    df: DataFrame,
    value_col: str,
    by: Tuple[str, ...] = (),
) -> DataFrame:
    """One row per group: exact type-1 ``median`` and ``mad`` of the
    non-null ``value_col``. Groups with no non-null value emit no row."""
    by = tuple(by)
    nonnull = df.filter(F.col(value_col).isNotNull())
    cube = nonnull.groupBy(*by, value_col).agg(F.count(F.lit(1)).alias("_n"))
    med = _type1_median(cube, by, value_col, "median")

    joined = (
        cube.join(F.broadcast(med), list(by))
        if by
        else cube.crossJoin(F.broadcast(med))
    )
    dev_cube = (
        joined.select(
            *by,
            F.abs(F.col(value_col) - F.col("median")).alias("_dev"),
            "_n",
        )
        .groupBy(*by, "_dev")
        .agg(F.sum("_n").alias("_n"))
    )
    mad = _type1_median(dev_cube, by, "_dev", "mad")
    return (
        med.join(mad, list(by)) if by else med.crossJoin(mad)
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    by: Tuple[str, ...] = (),
    k: float = 5.0,
) -> DataFrame:
    """Every input row + ``median``, ``mad`` (null when the group had no
    non-null value) and ``is_outlier = |x - median| > k·MAD`` (null for
    null values). A left join keeps all-null groups visible instead of
    silently dropping their rows."""
    by = tuple(by)
    est = robust_median_mad(df, value_col, by=by)
    if by:
        joined = df.join(F.broadcast(est), list(by), "left")
    else:
        # left-join on a constant key: a plain crossJoin would DROP
        # every row when the estimator frame is empty (all-null column)
        joined = (
            df.withColumn("_one", F.lit(1))
            .join(
                F.broadcast(est.withColumn("_one", F.lit(1))), "_one", "left"
            )
            .drop("_one")
        )
    flag = F.when(
        F.col(value_col).isNotNull() & F.col("median").isNotNull(),
        F.abs(F.col(value_col) - F.col("median")) > F.lit(k) * F.col("mad"),
    )
    return joined.withColumn("is_outlier", flag)
