"""Cross-table aggregate reconciliation — the classic warehouse parity
check ("does the fact table still roll up to the summary it claims to
summarize"): per key, Σ fact_value must equal the summary's value
within an absolute and/or relative tolerance, and keys missing on
either side surface explicitly. Referential checks see only key
EXISTENCE; snapshot diff sees only row EQUALITY — this is the third
lens: aggregate AGREEMENT.

Determinism contract: both sides micro-quantize once (``round(v·1e6)``
HALF_UP → decimal(38,0)); the fact side sums exact integers (order-
independent at any partitioning), and every tolerance comparison is a
cross-multiplied INTEGER predicate —
``|Σf − s|·10⁶ ≤ tol_rel_micro·|s|`` and ``|Σf − s| ≤ tol_abs_micro``
— so statuses are a pure function of the inputs and a SQL twin
reproduces them bit-for-bit. ``diff`` is one final double division.

Scale shape: one map-side-combined groupBy per side + ONE equi-join of
the two key-count frames (key-cardinality-sized, never raw rows); the
verdict is a single aggregation of the bounded reconcile frame.
Duplicate summary keys are a spec violation of the SUMMARY table and
are flagged as their own status rather than silently summed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def _micro(col) -> F.Column:
    return F.round(col.cast("double") * F.lit(1e6), 0).cast(_DEC)


def reconcile_aggregate(
    fact: DataFrame,
    summary: DataFrame,
    key_col: str,
    fact_value: str,
    summary_value: str,
    rel_tolerance: float = 0.0,
    abs_tolerance: float = 0.0,
) -> DataFrame:
    """Per-key reconciliation frame::

        (key_col, fact_sum, summary_val, diff, n_fact_rows, status)

    ``status`` ∈ ``matched`` / ``mismatched`` / ``missing_in_fact``
    (summary key with zero fact rows) / ``missing_in_summary`` /
    ``duplicate_summary_key`` (the summary side must be key-unique —
    duplicates are flagged, never silently summed; their rows carry the
    duplicated value and NULL diff). A key matches when EITHER
    tolerance admits it: ``|Σf − s| ≤ abs_tolerance`` or
    ``|Σf − s| ≤ rel_tolerance·|s|`` — both evaluated as exact integer
    predicates in micro units. NULL keys are excluded on both sides
    (they can never reconcile); NULL/NaN fact values are excluded from
    the sum, NULL summary values mismatch unless the fact sum is also
    absent.
    """
    f_agg = (
        fact.filter(
            F.col(key_col).isNotNull()
            & F.col(fact_value).isNotNull()
            & ~F.isnan(F.col(fact_value).cast("double"))
        )
        .groupBy(key_col)
        .agg(
            F.sum(_micro(F.col(fact_value))).cast(_DEC).alias("_fq"),
            F.count(F.lit(1)).alias("n_fact_rows"),
        )
    )
    s_agg = (
        summary.filter(F.col(key_col).isNotNull())
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("_dup"),
            # min, not first: a duplicate-key summary still reports a
            # DETERMINISTIC value (the status is what matters there)
            F.min(_micro(F.col(summary_value))).alias("_sq"),
            F.min(F.col(summary_value).cast("double")).alias("_sv"),
        )
    )
    j = f_agg.join(s_agg, key_col, "full_outer")

    tol_abs = round(abs_tolerance * 1e6)
    tol_rel = round(rel_tolerance * 1e6)
    delta = F.col("_fq") - F.col("_sq")
    within = (F.abs(delta) <= F.lit(tol_abs).cast(_DEC)) | (
        F.abs(delta) * F.lit(1000000).cast(_DEC)
        <= F.lit(tol_rel).cast(_DEC) * F.abs(F.col("_sq"))
    )
    status = (
        F.when(F.col("_dup") > 1, F.lit("duplicate_summary_key"))
        .when(F.col("_sq").isNull() & F.col("_dup").isNull(),
              F.lit("missing_in_summary"))
        .when(F.col("_fq").isNull(), F.lit("missing_in_fact"))
        .when(F.col("_sq").isNull(), F.lit("mismatched"))
        .when(within, F.lit("matched"))
        .otherwise(F.lit("mismatched"))
    )
    return j.select(
        key_col,
        (F.col("_fq").cast("double") / F.lit(1e6)).alias("fact_sum"),
        F.col("_sv").alias("summary_val"),
        F.when(
            F.col("_fq").isNotNull()
            & F.col("_sq").isNotNull()
            & (F.col("_dup") == 1),
            delta.cast("double") / F.lit(1e6),
        ).alias("diff"),
        F.coalesce("n_fact_rows", F.lit(0)).cast("long").alias(
            "n_fact_rows"
        ),
        status.alias("status"),
    )


def reconcile_verdict(reconciled: DataFrame) -> DataFrame:
    """One-row summary of a :func:`reconcile_aggregate` frame:
    ``(n_keys, n_matched, n_mismatched, n_missing_in_fact,
    n_missing_in_summary, n_duplicate_summary_keys, passed)`` —
    ``passed`` iff every key matched."""
    s = F.col("status")
    agg = reconciled.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum((s == "matched").cast("long")).alias("n_matched"),
        F.sum((s == "mismatched").cast("long")).alias("n_mismatched"),
        F.sum((s == "missing_in_fact").cast("long")).alias(
            "n_missing_in_fact"
        ),
        F.sum((s == "missing_in_summary").cast("long")).alias(
            "n_missing_in_summary"
        ),
        F.sum((s == "duplicate_summary_key").cast("long")).alias(
            "n_duplicate_summary_keys"
        ),
    )
    return agg.withColumn(
        "passed", F.col("n_matched") == F.col("n_keys")
    )
