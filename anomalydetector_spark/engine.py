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

    results: list[C.CheckResult] = [
        C.check_column_presence(pages, PAGES_COLUMNS),
        C.check_min_rows(pages, part, cfg.min_points),
        C.check_not_null(pages, "warc_ts", part, keep=["url"]),
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

    stat_series = compute_window_stats(
        pages,
        window_duration=cfg.window_duration,
        partition_by=part,
        langs=cfg.langs,
    )
    scored = score_drift(stat_series, cfg.sr)
    dverdicts = drift_verdicts(scored)

    return ValidationResult(verdicts, violations, stat_series, scored, dverdicts)
