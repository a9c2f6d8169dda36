"""Benford's-law digit-distribution conformity check — the classic
"does this numeric column look organically generated" screen (amounts,
populations, counts spanning several orders of magnitude follow
``P(d) = log10(1 + 1/d)`` for the first significant digit; fabricated,
truncated, or system-capped data does not). A validation-engine check
in the Deequ/GE family: per partition it emits the 9-digit observed
distribution plus the two standard conformity statistics (Pearson χ²
against the Benford expectation and Nigrini's Mean Absolute Deviation)
and a verdict against the published MAD bands.

First-digit extraction without libm hazards: the decade exponent
``p = floor(log10(|v|))`` is only a GUESS (log10 differs across
engines in the last ulp) — it is then CORRECTED against a literal
table of exact powers of ten (``10^p ≤ |v| < 10^(p+1)``), making the
corrected p, and therefore the digit ``floor(|v| / 10^p)``, a pure
function of the input double: both engines embed the SAME power
literals, so the extraction is engine-independent by construction
(the one-step correction absorbs any sub-integer log10 error). Values
outside ``[1e-30, 1e30)`` in magnitude, zeros, NULLs and NaNs are
excluded (documented domain — extend the literal table to widen).

Determinism contract: observed counts are exact integers; the Benford
expectations are micro-probability INTEGER literals (``round(log10(1+
1/d)·1e8)``, generated in Python and embedded identically in the SQL
twin); χ² reduces to ``Σ (obs·1e8 − n·pₘ)² / (n·pₘ·1e8)`` with an
exact decimal(38,0) numerator per digit, each term micro-quantized
before the sum; MAD's numerator ``Σ |obs·1e8 − n·pₘ|`` is wholly
integer with ONE final double division. Partitioning-independent,
hash-oracled.

Scale shape: one groupBy(partition, digit) over a pure-codegen digit
projection — the shuffle moves ≤ 9 partial counts per partition, and
everything after is O(partitions × 9).
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"

# exact doubles 10^-31 .. 10^31; repr() round-trips bit-exactly into
# both Spark literals and DuckDB SQL text.  The table spans ONE DECADE
# beyond the documented [1e-30, 1e30) value domain on each side: the
# uncorrected ``floor(log10(v))`` guess can land one past the domain
# edge (log10 rounding within a few ulps of an exact decade), and under
# Spark 4's ANSI mode an out-of-range ``element_at`` THROWS rather than
# returning NULL (index 0 throws in every mode) — the padding decades
# keep every speculative lookup of the when() correction in-table, and
# the ok-filter below still excludes the padded decades from results.
_POW_LO = -31
_POWERS = [float(10.0**k) for k in range(_POW_LO, 32)]
# documented value domain: magnitudes in [1e-30, 1e30)
_DOMAIN_LO = 1e-30
_DOMAIN_HI = 1e30

# micro-probability integer literals: round(log10(1 + 1/d) * 1e8)
BENFORD_MICRO = {
    d: round(math.log10(1.0 + 1.0 / d) * 1e8) for d in range(1, 10)
}


def first_digit(col: Column) -> Column:
    """First significant digit (1-9) of ``|col|`` as an int column —
    NULL for NULL/NaN/zero or magnitude outside [1e-30, 1e30). See the
    module docstring for the corrected-exponent construction."""
    v = F.abs(col.cast("double"))
    ok = (
        col.isNotNull()
        & ~F.isnan(col.cast("double"))
        & (v >= F.lit(_DOMAIN_LO))
        & (v < F.lit(_DOMAIN_HI))
    )
    p_guess = F.floor(F.log10(v)).cast("int")
    pow_arr = F.array(*[F.lit(x) for x in _POWERS])
    # literal-table lookup (1-based): 10^p  ==  pow_arr[p - _POW_LO + 1]
    def pw(p: Column) -> Column:
        return F.element_at(pow_arr, p - F.lit(_POW_LO) + F.lit(1))

    p1 = F.when(pw(p_guess + F.lit(1)) <= v, p_guess + F.lit(1)).when(
        pw(p_guess) > v, p_guess - F.lit(1)
    ).otherwise(p_guess)
    digit = F.least(
        F.greatest(F.floor(v / pw(p1)).cast("int"), F.lit(1)), F.lit(9)
    )
    return F.when(ok, digit)


def benford_digit_counts(
    df: DataFrame,
    value_col: str,
    part_cols: Sequence[str] = (),
) -> DataFrame:
    """Observed first-digit distribution per partition: ``(*part_cols,
    digit, observed, n, expected_p)`` — all 9 digits present (0-count
    digits included via a literal digit frame), ``expected_p`` the
    Benford probability (micro literal / 1e8)."""
    part = list(part_cols)
    digits = df.sparkSession.createDataFrame(
        [(d, BENFORD_MICRO[d]) for d in range(1, 10)],
        "digit int, _pm long",
    )
    rows = df.select(
        *part, first_digit(F.col(value_col)).alias("digit")
    ).filter(F.col("digit").isNotNull())
    counts = rows.groupBy(*part, "digit").agg(
        F.count(F.lit(1)).alias("observed")
    )
    # dense 9-digit grid per observed partition
    keys = counts.select(*part).distinct() if part else None
    grid = keys.crossJoin(F.broadcast(digits)) if part else digits
    dense = grid.join(counts, [*part, "digit"], "left").fillna(
        0, subset=["observed"]
    )
    from pyspark.sql import Window as W

    tot = W.partitionBy(*part) if part else W.partitionBy(F.lit(1))
    dense = dense.withColumn("n", F.sum("observed").over(tot))
    return dense.select(
        *part,
        "digit",
        F.col("observed").cast("long").alias("observed"),
        F.col("n").cast("long").alias("n"),
        (F.col("_pm").cast("double") / F.lit(1e8)).alias("expected_p"),
        F.col("_pm").alias("expected_micro"),
    )


def benford_check(
    df: DataFrame,
    value_col: str,
    part_cols: Sequence[str] = (),
) -> DataFrame:
    """Benford conformity verdict per partition: ``(*part_cols, n,
    chi2, mad, verdict)``. ``chi2`` is Pearson's statistic against the
    Benford expectation (8 dof); ``mad`` is Nigrini's Mean Absolute
    Deviation of the 9 digit proportions, with the published bands:
    close (< 0.006), acceptable (< 0.012), marginal (< 0.015),
    nonconforming (≥ 0.015). Partitions with n = 0 are absent."""
    part = list(part_cols)
    dense = benford_digit_counts(df, value_col, part_cols)
    # exact integer deviation per digit: obs·1e8 − n·pm
    dev = (
        F.col("observed").cast(_DEC) * F.lit(100000000).cast(_DEC)
        - F.col("n").cast(_DEC) * F.col("expected_micro").cast(_DEC)
    )
    chi_term = F.round(
        dev.cast("double")
        * dev.cast("double")
        / (
            F.col("n").cast(_DEC) * F.col("expected_micro").cast(_DEC)
        ).cast("double")
        / F.lit(1e8)
        * F.lit(1e6),
        0,
    ).cast(_DEC)
    agg = (
        dense.filter(F.col("n") > 0)
        .groupBy(*part)
        .agg(
            F.first("n").alias("n"),
            (F.sum(chi_term).cast("double") / F.lit(1e6)).alias("chi2"),
            F.sum(F.abs(dev)).cast(_DEC).alias("_dev_sum"),
        )
        .withColumn(
            "mad",
            F.col("_dev_sum").cast("double")
            / (F.lit(9.0) * F.col("n").cast("double") * F.lit(1e8)),
        )
        .drop("_dev_sum")
    )
    verdict = (
        F.when(F.col("mad") < 0.006, F.lit("close"))
        .when(F.col("mad") < 0.012, F.lit("acceptable"))
        .when(F.col("mad") < 0.015, F.lit("marginal"))
        .otherwise(F.lit("nonconforming"))
    )
    return agg.select(*part, "n", "chi2", "mad", verdict.alias("verdict"))


def check_benford(
    df: DataFrame,
    value_col: str,
    partition_by=None,
    max_mad: float = 0.015,
    check_name: str | None = None,
):
    """Benford conformity as a standard engine check: per partition,
    ``passed`` iff Nigrini's MAD stays below ``max_mad`` (default the
    published nonconformity edge, 0.015). Distribution-level — no
    row-addressable violations (``violations=None``); the verdict's
    ``rows_scanned`` is the digit-bearing row count (NULL/NaN/zero and
    out-of-domain magnitudes excluded, see :func:`first_digit`).
    Partitions with zero digit-bearing rows FAIL loudly with
    NO_DIGITS — an absent feed must not read as conforming."""
    from anomalydetector_spark.operators.checks import CheckResult, _part

    name = check_name or f"benford_{value_col}"
    keyed = _part(df, partition_by)
    summary = benford_check(keyed, value_col, ["partition_key"])
    ok = F.col("mad") < F.lit(float(max_mad))
    verdicts = summary.select(
        F.lit(name).alias("check_name"),
        "partition_key",
        ok.alias("passed"),
        F.when(
            ~ok,
            F.format_string(
                "first-digit distribution of %s deviates from "
                "Benford's law: MAD %.6f >= " + f"{max_mad:g}"
                + " (verdict %s)",
                F.lit(value_col),
                F.col("mad"),
                F.col("verdict"),
            ),
        ).alias("error_message"),
        F.when(ok, F.lit(0)).otherwise(F.lit(1)).cast("long").alias(
            "violation_count"
        ),
        F.col("n").alias("rows_scanned"),
    )
    # partitions present in the input but with zero digit-bearing rows
    # are absent from the summary — surface them as loud failures
    all_parts = keyed.select("partition_key").distinct()
    missing = all_parts.join(
        summary.select("partition_key"), "partition_key", "left_anti"
    ).select(
        F.lit(name).alias("check_name"),
        "partition_key",
        F.lit(False).alias("passed"),
        F.lit(
            f"no digit-bearing values in {value_col} (NO_DIGITS)"
        ).alias("error_message"),
        F.lit(1).cast("long").alias("violation_count"),
        F.lit(0).cast("long").alias("rows_scanned"),
    )
    return CheckResult(verdicts.unionByName(missing))
