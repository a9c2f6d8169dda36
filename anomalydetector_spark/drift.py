"""Distribution-drift check: SR-score every (partition, stat) series.

The stat-series table is tiny by construction (one row per window ×
partition × stat), so the expensive FFT work rides a single
``groupBy(...).applyInPandas`` over already-aggregated data — one shuffle
whose key count is bounded, never a per-document operation. Placement of
this stage AFTER aggregation is the engine's key planning rule
(SURVEY.md §4 item 4).

Each group runs the whole-series numpy SR kernel (anomalydetector_spark/
kernel/sr.py, semantics of reference msanomalydetector/spectral_residual.py)
and returns the series extended with mag/score/isAnomaly (+ margin columns
when requested), matching the reference's output frame
(spectral_residual.py:78-105).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from anomalydetector_spark.kernel.sr import MIN_POINTS, SrParams, sr_detect

DRIFT_SCHEMA = (
    "partition_key string, stat_name string, window_start timestamp, "
    "value double, mag double, score double, is_anomaly boolean"
)

DRIFT_MARGIN_SCHEMA = DRIFT_SCHEMA + (
    ", expected_value double, unit double, lower_boundary double, "
    "upper_boundary double"
)


def _make_group_fn(params: SrParams):
    def detect_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("window_start")
        n = len(pdf)
        if n < MIN_POINTS:
            # Too short to score: emit the series unscored (score null) so
            # the min-points verdict is taken by the check layer, mirroring
            # the reference's NotEnoughPoints contract (invoker.py:43-44).
            out = pdf[["partition_key", "stat_name", "window_start", "value"]].copy()
            # nullable Float64 → Arrow null, NOT NaN: NaN sorts above
            # every double in Spark, so it would poison max(score) aggs
            null_f = pd.array([None] * n, dtype="Float64")
            out["mag"] = null_f
            out["score"] = null_f
            out["is_anomaly"] = pd.Series([None] * n, dtype="object")
            if params.with_margin:
                for c in ("expected_value", "unit", "lower_boundary", "upper_boundary"):
                    out[c] = null_f
            return out

        res = sr_detect(
            pdf["window_start"].to_numpy(), pdf["value"].to_numpy(), params
        )
        out = pd.DataFrame(
            {
                "partition_key": pdf["partition_key"].iloc[0],
                "stat_name": pdf["stat_name"].iloc[0],
                "window_start": res["timestamp"],
                "value": res["value"],
                "mag": res["mag"],
                "score": res["score"],
                "is_anomaly": res["isAnomaly"],
            }
        )
        if params.with_margin:
            out["expected_value"] = res["expectedValue"]
            out["unit"] = res["unit"]
            out["lower_boundary"] = res["lowerBoundary"]
            out["upper_boundary"] = res["upperBoundary"]
        return out

    return detect_group


def score_drift(
    stat_series: DataFrame, params: SrParams | None = None
) -> DataFrame:
    """SR-score each (partition_key, stat_name) series.

    Ordering inside each group is done in pandas (groups are window-count
    sized); the shuffle key is (partition_key, stat_name), whose
    cardinality = partitions × stats — small and uniform, so no skew
    handling is needed at this stage even at 10^12 input docs.
    """
    p = params or SrParams()
    schema = DRIFT_MARGIN_SCHEMA if p.with_margin else DRIFT_SCHEMA
    return stat_series.groupBy("partition_key", "stat_name").applyInPandas(
        _make_group_fn(p), schema=schema
    )


def gap_adjust_scored(scored: DataFrame, max_back: int = 1000) -> DataFrame:
    """Optional W15 post-rule over SR-scored drift series (reference
    srcnn/utils.py:302-311): windows arriving after a gap larger than the
    series' minimum window interval are forced anomalous when a detection
    occurred fewer than ``max_back`` windows back — the reference's
    treatment of missing stretches in irregular series.  Run between
    :func:`score_drift` and :func:`drift_verdicts`; adds ``gap_forced``.

    Same shuffle key as scoring itself ((partition_key, stat_name)), so
    AQE reuses the partitioning when chained directly after score_drift.
    """
    from anomalydetector_spark.operators.evaluate import gap_adjusted_detections

    keyed = (
        scored.withColumn(
            "_series", F.concat_ws(" ", "partition_key", "stat_name")
        )
        # unscored (too-short) series carry null is_anomaly: feed the
        # kernel zeros and restore the nulls afterwards
        .withColumn("_was_null", F.col("is_anomaly").isNull())
        .withColumn(
            "_det", F.coalesce(F.col("is_anomaly").cast("int"), F.lit(0))
        )
    )
    adjusted = gap_adjusted_detections(
        keyed,
        series_col="_series",
        ts_col="window_start",
        det_col="_det",
        score_col="score",
        max_back=max_back,
    )
    return (
        adjusted.withColumn(
            "is_anomaly",
            F.when(F.col("_was_null"), F.lit(None).cast("boolean")).otherwise(
                F.col("_det") == 1
            ),
        )
        # unscored windows round-trip their null score through pandas as
        # NaN (which sorts ABOVE every double in Spark, poisoning
        # drift_verdicts' max(score)), and the gap rule may have stamped
        # 1.0 onto them: restore NULL score and drop the phantom force.
        .withColumn(
            "score",
            F.when(F.col("_was_null"), F.lit(None).cast("double")).otherwise(
                F.col("score")
            ),
        )
        .withColumn(
            "gap_forced", F.when(F.col("_was_null"), F.lit(False)).otherwise(F.col("gap_forced"))
        )
        .drop("_series", "_det", "_was_null")
    )


def drift_verdicts(scored: DataFrame) -> DataFrame:
    """Collapse scored series into per-(partition, stat) verdict rows:
    pass/fail + anomalous-window count + worst score, the engine's analog
    of the reference's whole-job raise (SURVEY.md §3 EP2)."""
    return (
        scored.groupBy("partition_key", "stat_name")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(F.col("is_anomaly").cast("int")).alias("n_anomalous"),
            F.max("score").alias("max_score"),
            F.max(F.when(F.col("is_anomaly"), F.col("window_start"))).alias(
                "last_anomalous_window"
            ),
        )
        .withColumn(
            "verdict",
            F.when(F.col("n_windows") < MIN_POINTS, F.lit("error:not_enough_points"))
            .when(F.col("n_anomalous") > 0, F.lit("fail"))
            .otherwise(F.lit("pass")),
        )
    )


def lens_consensus(
    sr_scored: DataFrame,
    cusum_scored: DataFrame | None = None,
    ewma_scored: DataFrame | None = None,
) -> DataFrame:
    """Cross-lens agreement per (partition, stat, window): SR is the
    SALIENCY lens, CUSUM the sustained-shift lens, EWMA the small-shift
    lens — a window flagged by two independent lenses is a far stronger
    signal than any single detector's threshold crossing, and a
    disagreement (CUSUM alarms, SR silent) itself says what KIND of
    anomaly it is (slow drift vs spike).

    Joins the scored frames on (partition_key, stat_name, window_start)
    — all bounded stat-series frames, broadcast-sized. Lenses not
    provided (or windows a lens could not score: too-short series, σ=0)
    contribute NULL, counted as not-fired. Output::

        (partition_key, stat_name, window_start, value, sr_anomaly,
         cusum_alarm, ewma_alarm, n_fired, consensus)

    ``consensus`` = at least two lenses fired. SR rows drive the output
    (left joins): every SR-scored window appears exactly once.
    """
    keys = ["partition_key", "stat_name", "window_start"]
    out = sr_scored.select(
        *keys, "value", F.col("is_anomaly").alias("sr_anomaly")
    )
    if cusum_scored is not None:
        out = out.join(
            cusum_scored.select(*keys, F.col("alarm").alias("cusum_alarm")),
            keys,
            "left",
        )
    else:
        out = out.withColumn("cusum_alarm", F.lit(None).cast("boolean"))
    if ewma_scored is not None:
        out = out.join(
            ewma_scored.select(*keys, F.col("alarm").alias("ewma_alarm")),
            keys,
            "left",
        )
    else:
        out = out.withColumn("ewma_alarm", F.lit(None).cast("boolean"))
    fired = (
        F.coalesce(F.col("sr_anomaly"), F.lit(False)).cast("int")
        + F.coalesce(F.col("cusum_alarm"), F.lit(False)).cast("int")
        + F.coalesce(F.col("ewma_alarm"), F.lit(False)).cast("int")
    )
    return out.select(
        *keys,
        "value",
        "sr_anomaly",
        "cusum_alarm",
        "ewma_alarm",
        fired.alias("n_fired"),
        (fired >= 2).alias("consensus"),
    )
