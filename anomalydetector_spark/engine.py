"""Check-suite runner: pages table in → verdicts + violations + drift out.

This is the engine analog of the reference's batch pipeline
(aml_component/invoker.py:38-90 — load → validation gauntlet → detector →
sink), restructured for Spark:

* the all-or-nothing ``raise`` becomes per-partition verdict rows,
* the per-column Python loop becomes one long-format stats pass + one
  ``applyInPandas`` drift stage,
* every hard check is a declarative DataFrame program; Catalyst shares the
  scan where possible and AQE handles stragglers.

The runner itself never calls ``.collect()`` on data-sized frames — only
verdict/stat frames (bounded by partitions × checks) are ever gathered.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from anomalydetector_spark.drift import drift_verdicts, score_drift
from anomalydetector_spark.kernel.sr import SrParams
from anomalydetector_spark.operators import checks as C
from anomalydetector_spark.operators.referential import check_referential
from anomalydetector_spark.operators.uniqueness import check_unique_key
from anomalydetector_spark.stats import compute_window_stats

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


@dataclass
class ValidationConfig:
    window_duration: str = "1 day"
    partition_by: str | None = None  # column name for per-partition verdicts
    langs: tuple[str, ...] = ("en", "de", "fr", "zh", "es")
    sr: SrParams = field(default_factory=SrParams)
    min_points: int = 12
    unique_key: str = "url"
    batch_size: int = 0


@dataclass
class ValidationResult:
    verdicts: DataFrame  # all hard-check verdicts, unioned
    violations: DataFrame  # all row-addressable violations, unioned
    stat_series: DataFrame  # long-format per-window stats
    drift_scored: DataFrame  # SR-scored stat series
    drift_verdicts: DataFrame  # per-(partition, stat) pass/fail


def _union(frames: list[DataFrame]) -> DataFrame:
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), frames)


def run_validation(
    pages: DataFrame,
    domains: DataFrame | None = None,
    config: ValidationConfig | None = None,
) -> ValidationResult:
    cfg = config or ValidationConfig()
    C.validate_batch_size(cfg.batch_size, cfg.min_points)
    part = cfg.partition_by

    # Fused cheap-check pass (SURVEY §4 item 2: one scan for all simple
    # per-partition stats): count + null-count ride ONE aggregation; the
    # per-partition result is tiny, so persisting it makes every verdict
    # frame derived from it free.
    p = C._part(pages, part)
    base = (
        p.groupBy("partition_key")
        .agg(
            F.count(F.lit(1)).alias("rows_scanned"),
            F.sum(F.col("warc_ts").isNull().cast("long")).alias("_null_ts"),
        )
        .persist()
    )
    from anomalydetector_spark.operators import errors as E

    min_rows_verdicts = base.select(
        F.lit("min_row_count").alias("check_name"),
        "partition_key",
        (F.col("rows_scanned") >= cfg.min_points).alias("passed"),
        F.when(
            F.col("rows_scanned") < cfg.min_points,
            F.lit(E.NOT_ENOUGH_POINTS.format(cfg.min_points)),
        ).alias("error_message"),
        F.when(F.col("rows_scanned") < cfg.min_points, F.col("rows_scanned"))
        .otherwise(F.lit(0))
        .alias("violation_count"),
        "rows_scanned",
    )
    not_null_verdicts = base.select(
        F.lit("not_null_warc_ts").alias("check_name"),
        "partition_key",
        (F.col("_null_ts") == 0).alias("passed"),
        F.when(F.col("_null_ts") > 0, F.lit(E.INVALID_TIMESTAMPS)).alias(
            "error_message"
        ),
        F.col("_null_ts").alias("violation_count"),
        "rows_scanned",
    )
    null_ts_violations = p.filter(F.col("warc_ts").isNull()).select(
        F.lit("not_null_warc_ts").alias("check_name"), "partition_key", "url"
    )

    results: list[C.CheckResult] = [
        C.check_column_presence(pages, PAGES_COLUMNS),
        C.CheckResult(min_rows_verdicts),
        C.CheckResult(not_null_verdicts, null_ts_violations),
        check_unique_key(pages, cfg.unique_key, part),
    ]
    if domains is not None:
        dom_col = (
            F.col("domain")
            if "domain" in pages.columns
            else F.regexp_extract("url", r"^https?://([^/]+)/", 1).alias("domain")
        )
        child = pages.withColumn("domain", dom_col)
        results.append(
            check_referential(child, "domain", domains, "domain", part, keep=["url"])
        )

    verdicts = _union([r.verdicts for r in results])
    violations = _union(
        [r.violations for r in results if r.violations is not None]
    )

    # the stat series is windows × partitions × stats rows — persist so
    # the scoring pass and any verdict/inspection action reuse one scan
    # of the (large) pages table instead of re-aggregating per action
    stat_series = compute_window_stats(
        pages,
        window_duration=cfg.window_duration,
        partition_by=part,
        langs=cfg.langs,
    ).persist()
    scored = score_drift(stat_series, cfg.sr).persist()
    dverdicts = drift_verdicts(scored)

    return ValidationResult(verdicts, violations, stat_series, scored, dverdicts)
