"""Partition-balance and join-fanout profiling — the two cardinality
questions that decide whether a 10^12-row job is schedulable BEFORE it
runs: "is this partitioning skewed?" (one straggler partition serializes
the stage) and "does this join explode?" (a hot key turns an equi-join
into a cross-product). Both are one-aggregation profiles over exact
integer counts, emitting the numbers the engine's own mitigations key
off (salting thresholds, AQE skew-join hints, broadcast decisions).

Determinism contract: every statistic reduces to exact integer counts
(decimal(38,0) sums; the Gini and CV numerators are the classic
sorted-rank / variance integer identities) with ONE final double
division each — partitioning-independent, hash-oracled.

Scale shape: ``partition_sizes`` is one map-side-combined groupBy whose
shuffle moves partition-count-sized partials; everything downstream
(rank window, Gini, median) runs over the BOUNDED sizes frame.
``join_fanout_profile`` is one groupBy per side plus an equi-join of the
two bounded key-count frames — the join that would explode is never
executed, only predicted.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def partition_sizes(
    df: DataFrame, part_cols: Sequence[str]
) -> DataFrame:
    """Exact per-partition row counts with global context:
    ``(*part_cols, n_rows, share, size_rank)`` — rank 1 is the largest
    partition (ties: first partition column ascending), ``share`` its
    fraction of all rows. NULL partition values count as their own
    partition (skew hides in NULL keys as often as in hot ones)."""
    part = list(part_cols)
    counts = df.groupBy(*part).agg(F.count(F.lit(1)).alias("n_rows"))
    # global windows here run over the BOUNDED partition-sizes frame
    # (cardinality of the partitioning, never rows) — the single-
    # partition sort is by design
    w = Window.orderBy(F.col("n_rows").desc(), *[F.col(c).asc_nulls_first() for c in part])
    tot = Window.partitionBy()
    return counts.select(
        *part,
        "n_rows",
        (
            F.col("n_rows").cast("double")
            / F.sum("n_rows").over(tot).cast("double")
        ).alias("share"),
        F.row_number().over(w).alias("size_rank"),
    )


def partition_balance(
    df: DataFrame, part_cols: Sequence[str]
) -> DataFrame:
    """One-row balance summary of a partitioning::

        (n_partitions, n_rows, max_rows, median_rows, mean_rows,
         cv, gini, max_over_median, top_share)

    * ``cv`` — coefficient of variation of partition sizes,
      ``sqrt(p·Σn² − (Σn)²) / Σn`` (exact integer radicand);
    * ``gini`` — Gini coefficient via the sorted-rank identity
      ``(2·Σ i·n_(i) − (p+1)·Σn) / (p·Σn)``, sizes ranked ascending
      with ties broken by the partition columns (any tie order gives
      the same sum: a block of equal sizes spans consecutive ranks, so
      its rank-weighted total is permutation-invariant);
    * ``median_rows`` — type-1 (lower-middle) exact median;
    * ``max_over_median`` — the straggler ratio the skew mitigations
      gate on (the uniqueness path salts when this explodes);
    * ``top_share`` — the largest partition's fraction of all rows.

    All integers exact; one double division per statistic.
    """
    part = list(part_cols)
    counts = df.groupBy(*part).agg(
        F.count(F.lit(1)).cast(_DEC).alias("_n")
    )
    w = Window.orderBy(
        F.col("_n").asc(), *[F.col(c).asc_nulls_first() for c in part]
    )
    ranked = counts.withColumn("_i", F.row_number().over(w).cast(_DEC))
    agg = ranked.agg(
        F.count(F.lit(1)).cast(_DEC).alias("_p"),
        F.sum("_n").alias("_s"),
        F.sum(F.col("_n") * F.col("_n")).alias("_s2"),
        F.sum(F.col("_i") * F.col("_n")).alias("_rank_sum"),
        F.max("_n").alias("_max"),
    )
    med = ranked.crossJoin(F.broadcast(agg.select("_p"))).filter(
        F.col("_i") == F.floor((F.col("_p").cast("long") + 1) / 2)
    ).select(F.col("_n").alias("_median"))
    out = agg.crossJoin(F.broadcast(med))
    cv_num = out["_p"] * out["_s2"] - out["_s"] * out["_s"]
    gini_num = (
        F.lit(2).cast(_DEC) * out["_rank_sum"]
        - (out["_p"] + 1) * out["_s"]
    )
    return out.select(
        F.col("_p").cast("long").alias("n_partitions"),
        F.col("_s").cast("long").alias("n_rows"),
        F.col("_max").cast("long").alias("max_rows"),
        F.col("_median").cast("long").alias("median_rows"),
        (out["_s"].cast("double") / out["_p"].cast("double")).alias(
            "mean_rows"
        ),
        (
            F.sqrt(cv_num.cast("double")) / out["_s"].cast("double")
        ).alias("cv"),
        (
            gini_num.cast("double")
            / (out["_p"] * out["_s"]).cast("double")
        ).alias("gini"),
        (
            out["_max"].cast("double") / out["_median"].cast("double")
        ).alias("max_over_median"),
        (out["_max"].cast("double") / out["_s"].cast("double")).alias(
            "top_share"
        ),
    )


def fanout_histogram(df: DataFrame, key_col: str) -> DataFrame:
    """Key-multiplicity histogram: ``(multiplicity, n_keys)`` — how many
    distinct keys appear exactly m times. NULL keys excluded (they never
    match in an equi-join). The classic pre-join shape check: a healthy
    FK side is mass-at-1; a long tail is fanout risk."""
    return (
        df.filter(F.col(key_col).isNotNull())
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("multiplicity"))
        .groupBy("multiplicity")
        .agg(F.count(F.lit(1)).alias("n_keys"))
    )


def join_fanout_profile(
    left: DataFrame, right: DataFrame, key_col: str
) -> DataFrame:
    """PREDICT an equi-join's output without running it::

        (n_left, n_right, n_keys_left, n_keys_right, n_keys_common,
         out_rows, max_left_mult, max_right_mult, max_key_fanout,
         amplification)

    ``out_rows = Σ_k c_left(k)·c_right(k)`` exactly (decimal(38,0) —
    the number an accidental many-to-many would produce);
    ``max_key_fanout`` the largest single-key product (the skew-join
    straggler); ``amplification = out_rows / max(n_left, n_right)`` —
    > 1 means the join multiplies rows. NULL keys excluded on both
    sides (equi-join semantics). The profile costs two
    map-side-combined groupBys + one bounded equi-join of key-count
    frames — the explosion is measured, never materialized.
    """
    lc = (
        left.filter(F.col(key_col).isNotNull())
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).cast(_DEC).alias("_cl"))
    )
    rc = (
        right.filter(F.col(key_col).isNotNull())
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).cast(_DEC).alias("_cr"))
    )
    both = lc.join(rc, key_col)
    pair = both.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys_common"),
        F.sum(F.col("_cl") * F.col("_cr")).alias("_out"),
        F.max(F.col("_cl") * F.col("_cr")).alias("_maxpair"),
    )
    lstat = lc.agg(
        F.sum("_cl").alias("_nl"),
        F.count(F.lit(1)).cast("long").alias("n_keys_left"),
        F.max("_cl").alias("_maxl"),
    )
    rstat = rc.agg(
        F.sum("_cr").alias("_nr"),
        F.count(F.lit(1)).cast("long").alias("n_keys_right"),
        F.max("_cr").alias("_maxr"),
    )
    out = pair.crossJoin(F.broadcast(lstat)).crossJoin(
        F.broadcast(rstat)
    )
    out_rows = F.coalesce(out["_out"], F.lit(0).cast(_DEC))
    return out.select(
        F.col("_nl").cast("long").alias("n_left"),
        F.col("_nr").cast("long").alias("n_right"),
        "n_keys_left",
        "n_keys_right",
        "n_keys_common",
        out_rows.cast("long").alias("out_rows"),
        F.col("_maxl").cast("long").alias("max_left_mult"),
        F.col("_maxr").cast("long").alias("max_right_mult"),
        F.coalesce(F.col("_maxpair"), F.lit(0).cast(_DEC))
        .cast("long")
        .alias("max_key_fanout"),
        (
            out_rows.cast("double")
            / F.greatest(out["_nl"], out["_nr"]).cast("double")
        ).alias("amplification"),
    )
