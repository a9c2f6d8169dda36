"""Value-pattern (char-class signature) profiling + compliance — the
shape-of-the-string lens: ids, codes, dates and urls have a stable
character-class silhouette ("AA-9999", "9999-99-99") long before any
specific regex is written down. The profiler DISCOVERS the dominant
signatures, ``suggest_value_patterns`` freezes them into an allowed
set, and ``check_value_pattern`` enforces that set with row-addressable
violations — the same discover → suggest → enforce loop as the JSON
key profiler.

Signature alphabet (ASCII classes; applied in this order so classes
never re-match their own output):

* ``[0-9]`` → ``9``, ``[A-Z]`` → ``A``, ``[a-z]`` → ``a``,
* THEN any remaining non-ASCII char → ``u`` (CJK text collapses to
  ``u+`` instead of exploding the signature space; ``u`` runs last so
  its lowercase placeholder cannot be re-classified),
* punctuation/space kept verbatim (it is usually the structure:
  ``9999-99-99`` keeps its dashes).

``collapsed=True`` (default) folds runs of the same class into
``<class>+`` (``A+-9+``) — the scale-robust form (a 6-digit and an
8-digit id share one signature); ``collapsed=False`` keeps exact
lengths (``AA-9999``) for fixed-width codes.

Everything is a pure-codegen ``regexp_replace`` chain (zero Python,
zero joins for the signature itself); the profile is one
map-side-combined groupBy whose shuffle moves signature-cardinality
partials. The DuckDB twin replays the same chain (RE2 and Java regex
agree on these explicit ASCII classes; DuckDB needs the ``'g'`` flag
Spark implies).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (pattern, replacement) — order matters; shared with the SQL twin
SIGNATURE_STEPS: tuple[tuple[str, str], ...] = (
    (r"[0-9]", "9"),
    (r"[A-Z]", "A"),
    (r"[a-z]", "a"),
    (r"[^\x00-\x7F]", "u"),
)
COLLAPSE_STEPS: tuple[tuple[str, str], ...] = (
    (r"u{2,}", "u+"),
    (r"9{2,}", "9+"),
    (r"A{2,}", "A+"),
    (r"a{2,}", "a+"),
)


def char_signature(col: Column, collapsed: bool = True) -> Column:
    """The char-class signature of a string column (NULL → NULL)."""
    out = col
    for pat, rep in SIGNATURE_STEPS:
        out = F.regexp_replace(out, pat, rep)
    if collapsed:
        for pat, rep in COLLAPSE_STEPS:
            out = F.regexp_replace(out, pat, rep)
    return out


def value_pattern_profile(
    df: DataFrame,
    column: str,
    part_cols: Sequence[str] = (),
    collapsed: bool = True,
) -> DataFrame:
    """Signature histogram per partition: ``(*part_cols, signature,
    n_values, share, rank)`` — rank 1 the dominant signature (ties:
    signature ascending), share of the partition's non-null values.
    NULLs excluded (completeness is its own check)."""
    from pyspark.sql import Window as W

    part = list(part_cols)
    sigs = df.filter(F.col(column).isNotNull()).select(
        *part, char_signature(F.col(column), collapsed).alias("signature")
    )
    counts = sigs.groupBy(*part, "signature").agg(
        F.count(F.lit(1)).alias("n_values")
    )
    tot = W.partitionBy(*part) if part else W.partitionBy(F.lit(1))
    rank_w = (
        W.partitionBy(*part) if part else W.partitionBy(F.lit(1))
    ).orderBy(F.col("n_values").desc(), F.col("signature").asc())
    return counts.select(
        *part,
        "signature",
        F.col("n_values").cast("long").alias("n_values"),
        (
            F.col("n_values").cast("double")
            / F.sum("n_values").over(tot).cast("double")
        ).alias("share"),
        F.row_number().over(rank_w).alias("rank"),
    )


def suggest_value_patterns(
    profile: DataFrame, min_coverage: float = 0.99,
    max_patterns: int = 1000,
) -> list[str]:
    """Freeze the dominant signatures into an allowed set: the smallest
    rank-prefix of the GLOBAL profile (no part_cols) whose cumulative
    share reaches ``min_coverage``. The collect is by design (the
    result is a config literal for :func:`check_value_pattern`) but it
    is CAPPED at the ``max_patterns`` top-ranked signatures — a
    pathological free-text column can carry near-distinct signatures
    per row, and an uncapped collect of that profile would be
    data-sized. If coverage isn't reached within the cap, the top
    ``max_patterns`` signatures are returned (an allowed set looser
    than requested is the safe direction: fewer false violations)."""
    rows = (
        profile.select("signature", "share", "rank")
        .filter(F.col("rank") <= max_patterns)
        .orderBy("rank")
        .limit(max_patterns)
        .collect()
    )
    out, cum = [], 0.0
    for r in rows:
        out.append(r.signature)
        cum += r.share
        if cum >= min_coverage:
            break
    return out


def check_value_pattern(
    df: DataFrame,
    column: str,
    allowed: Sequence[str],
    partition_by=None,
    collapsed: bool = True,
    check_name: str | None = None,
):
    """Pattern compliance as a standard engine check: every non-null
    value's signature must be in ``allowed`` (a literal set, broadcast
    as an ``isin``). Violations are row-addressable ``(check_name,
    partition_key, <column>, signature)`` rows."""
    from anomalydetector_spark.operators.checks import (
        CheckResult,
        _part,
    )

    if not allowed:
        raise ValueError("allowed signature set must not be empty")
    name = check_name or f"pattern_{column}"
    keyed = _part(df, partition_by)
    sig = char_signature(F.col(column), collapsed)
    tagged = keyed.withColumn("_sig", sig)
    bad = F.col(column).isNotNull() & ~F.col("_sig").isin(list(allowed))
    agg = tagged.groupBy("partition_key").agg(
        F.sum(bad.cast("long")).alias("violation_count"),
        F.count(F.lit(1)).alias("rows_scanned"),
    )
    ok = F.col("violation_count") == 0
    verdicts = agg.select(
        F.lit(name).alias("check_name"),
        "partition_key",
        ok.alias("passed"),
        F.when(
            ~ok,
            F.format_string(
                "%d value(s) of %s match none of the "
                + f"{len(allowed)} allowed signature(s)",
                F.col("violation_count"),
                F.lit(column),
            ),
        ).alias("error_message"),
        "violation_count",
        "rows_scanned",
    )
    violations = tagged.filter(bad).select(
        F.lit(name).alias("check_name"),
        "partition_key",
        F.col(column),
        F.col("_sig").alias("signature"),
    )
    return CheckResult(verdicts, violations)
