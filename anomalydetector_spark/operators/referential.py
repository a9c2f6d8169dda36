"""Referential-integrity checks as broadcast semi/anti joins (north rule;
SURVEY.md §2.2 referential note).

The dimension side (domains, allowed langs, …) is small relative to the
fact table, so the join is forced broadcast: no shuffle of the 10^12-row
side, each task streams its split against an in-memory hash set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from anomalydetector_spark.operators import errors
from anomalydetector_spark.operators.checks import (
    CheckResult,
    _part,
    _verdict_from_violation_count,
)


def check_referential(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
    partition_by: Column | str | None = None,
    keep: list[str] | None = None,
) -> CheckResult:
    """Every non-null ``child[child_col]`` must exist in
    ``parent[parent_col]``. Violations via broadcast LEFT ANTI join; the
    passing set is the LEFT SEMI complement (not materialized here)."""
    name = f"ref_{child_col}"
    p = _part(child, partition_by)
    dim = F.broadcast(parent.select(F.col(parent_col).alias(child_col)).distinct())

    dangling = p.filter(F.col(child_col).isNotNull()).join(
        dim, child_col, "left_anti"
    )

    counted = (
        p.groupBy("partition_key")
        .agg(F.count(F.lit(1)).alias("rows_scanned"))
        .join(
            dangling.groupBy("partition_key").agg(
                F.count(F.lit(1)).alias("_bad")
            ),
            "partition_key",
            "left",
        )
        .withColumn("violation_count", F.coalesce(F.col("_bad"), F.lit(0)))
        .drop("_bad")
    )
    verdicts = _verdict_from_violation_count(
        counted,
        name,
        errors.DANGLING_REFERENCE.format(child_col, parent_col),
    )
    violations = dangling.select(
        F.lit(name).alias("check_name"), "partition_key", *(keep or [child_col])
    )
    return CheckResult(verdicts, violations)
