"""Constraint checks — the validation front-end (SURVEY.md §2.2 P1-P13).

Each check is a declarative DataFrame program that produces

* **verdict rows**: ``(check_name, partition_key, passed, error_message,
  violation_count, rows_scanned)`` — one per partition, the engine's
  generalization of the reference's whole-job ``raise``
  (aml_component/invoker.py:43-82), and
* **violation rows**: the offending input rows tagged with the check name,
  for violation-row recall scoring.

Design rules for 10^12-doc scale:
* every check is a single aggregation or window pass over pruned columns
  (never reads ``html`` unless the check targets it),
* cheap verdicts ride ONE shared scan via :func:`run_checks` in engine.py,
* violations are lazily-evaluated DataFrames — only materialized when the
  caller sinks them.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from anomalydetector_spark.kernel.sr import (
    MIN_POINTS,
    VALUE_LOWER_BOUND,
    VALUE_UPPER_BOUND,
)
from anomalydetector_spark.operators import errors

VERDICT_COLS = [
    "check_name",
    "partition_key",
    "passed",
    "error_message",
    "violation_count",
    "rows_scanned",
]


@dataclass
class CheckResult:
    """A check's two outputs; ``violations`` may be None for checks whose
    failures aren't row-addressable (e.g. min-row-count)."""

    verdicts: DataFrame
    violations: DataFrame | None = None


def _part(df: DataFrame, partition_by: Column | str | None) -> DataFrame:
    if partition_by is None:
        return df.withColumn("partition_key", F.lit("global"))
    col = F.col(partition_by) if isinstance(partition_by, str) else partition_by
    return df.withColumn("partition_key", col.cast("string"))


def _verdict_from_violation_count(
    counted: DataFrame, check_name: str, message: str
) -> DataFrame:
    return counted.select(
        F.lit(check_name).alias("check_name"),
        "partition_key",
        (F.col("violation_count") == 0).alias("passed"),
        F.when(F.col("violation_count") > 0, F.lit(message)).alias("error_message"),
        "violation_count",
        "rows_scanned",
    )


def _violation_rows(
    df: DataFrame, predicate: Column, check_name: str, keep: list[str]
) -> DataFrame:
    return df.filter(predicate).select(
        F.lit(check_name).alias("check_name"), "partition_key", *keep
    )


def check_column_presence(
    df: DataFrame, required: list[str], check_name: str = "column_presence"
) -> CheckResult:
    """P3 — schema check: required columns exist (invoker.py:49-53).
    Purely metadata: no scan at all."""
    spark = df.sparkSession
    missing = [c for c in required if c not in df.columns]
    rows = [
        (
            check_name,
            "global",
            not missing,
            errors.COLUMN_NOT_FOUND.format(missing[0]) if missing else None,
            len(missing),
            0,
        )
    ]
    schema = (
        "check_name string, partition_key string, passed boolean, "
        "error_message string, violation_count long, rows_scanned long"
    )
    return CheckResult(spark.createDataFrame(rows, schema))


def check_schema_types(
    df: DataFrame,
    expected: dict[str, str],
    check_name: str = "schema_types",
    allow_extra: bool = True,
) -> CheckResult:
    """Schema-evolution check: every expected column exists WITH the
    expected Spark simple type (``string``, ``timestamp``, ``binary``,
    ``bigint``, …). Like P3 this is purely metadata — no scan — but it
    catches the silent killer P3 misses: a column that still exists after
    a snapshot rewrite but changed type (``lang`` string → int, ``html``
    binary → string), which every downstream expression would then
    miscompute on. With ``allow_extra=False`` unexpected columns also
    fail (locked-schema mode)."""
    spark = df.sparkSession
    actual = dict(df.dtypes)
    problems = []
    for col, typ in expected.items():
        if col not in actual:
            problems.append(f"{col}: missing")
        elif actual[col] != typ:
            problems.append(f"{col}: expected {typ}, got {actual[col]}")
    if not allow_extra:
        problems += [f"{c}: unexpected column" for c in actual if c not in expected]
    rows = [
        (
            check_name,
            "global",
            not problems,
            "; ".join(problems) if problems else None,
            len(problems),
            0,
        )
    ]
    schema = (
        "check_name string, partition_key string, passed boolean, "
        "error_message string, violation_count long, rows_scanned long"
    )
    return CheckResult(spark.createDataFrame(rows, schema))


def check_min_rows(
    df: DataFrame,
    partition_by: Column | str | None = None,
    min_points: int = MIN_POINTS,
    check_name: str = "min_row_count",
) -> CheckResult:
    """P1 — per-partition minimum row count (invoker.py:43-44,
    constants.py:3)."""
    p = _part(df, partition_by)
    counted = p.groupBy("partition_key").agg(
        F.count(F.lit(1)).alias("rows_scanned")
    )
    verdicts = counted.select(
        F.lit(check_name).alias("check_name"),
        "partition_key",
        (F.col("rows_scanned") >= min_points).alias("passed"),
        F.when(
            F.col("rows_scanned") < min_points,
            F.lit(errors.NOT_ENOUGH_POINTS.format(min_points)),
        ).alias("error_message"),
        F.when(F.col("rows_scanned") < min_points, F.col("rows_scanned"))
        .otherwise(F.lit(0))
        .alias("violation_count"),
        "rows_scanned",
    )
    return CheckResult(verdicts)


def check_not_null(
    df: DataFrame,
    column: str,
    partition_by: Column | str | None = None,
    check_name: str | None = None,
    message: str = errors.INVALID_TIMESTAMPS,
    keep: list[str] | None = None,
) -> CheckResult:
    """P4 — null / unparseable values (invoker.py:55-59: NaT check after
    to_datetime; a failed cast surfaces as null under try_cast semantics)."""
    name = check_name or f"not_null_{column}"
    p = _part(df, partition_by)
    bad = F.col(column).isNull()
    counted = p.groupBy("partition_key").agg(
        F.sum(bad.cast("long")).alias("violation_count"),
        F.count(F.lit(1)).alias("rows_scanned"),
    )
    return CheckResult(
        _verdict_from_violation_count(counted, name, message),
        _violation_rows(p, bad, name, keep or []),
    )


def check_float_castable(
    df: DataFrame,
    column: str,
    partition_by: Column | str | None = None,
    keep: list[str] | None = None,
) -> CheckResult:
    """P7 — values parse as floats (invoker.py:71-74). ``try_cast`` gives
    null on failure without aborting the job; non-null input that casts to
    null is a violation."""
    name = f"float_castable_{column}"
    p = _part(df, partition_by)
    bad = F.col(column).isNotNull() & F.col(column).cast("string").try_cast(
        "double"
    ).isNull()
    counted = p.groupBy("partition_key").agg(
        F.sum(bad.cast("long")).alias("violation_count"),
        F.count(F.lit(1)).alias("rows_scanned"),
    )
    return CheckResult(
        _verdict_from_violation_count(
            counted, name, errors.INVALID_VALUE_FORMAT.format(column)
        ),
        _violation_rows(p, bad, name, keep or [column]),
    )


def check_finite(
    df: DataFrame,
    column: str,
    partition_by: Column | str | None = None,
    keep: list[str] | None = None,
) -> CheckResult:
    """P8 — no NaN/±inf (invoker.py:76-77)."""
    name = f"finite_{column}"
    p = _part(df, partition_by)
    # try_cast: unparseable values are P7's violation class, not this
    # check's — and a strict cast would THROW under ANSI mode
    c = F.col(column).cast("string").try_cast("double")
    bad = c.isNotNull() & (F.isnan(c) | (F.abs(c) == F.lit(float("inf"))))
    counted = p.groupBy("partition_key").agg(
        F.sum(bad.cast("long")).alias("violation_count"),
        F.count(F.lit(1)).alias("rows_scanned"),
    )
    return CheckResult(
        _verdict_from_violation_count(
            counted, name, errors.INVALID_SERIES_VALUE.format(column)
        ),
        _violation_rows(p, bad, name, keep or [column]),
    )


def check_value_bounds(
    df: DataFrame,
    column: str,
    partition_by: Column | str | None = None,
    lower: float = VALUE_LOWER_BOUND,
    upper: float = VALUE_UPPER_BOUND,
    keep: list[str] | None = None,
) -> CheckResult:
    """P9 — magnitude bound |v| ≤ 1e100 (invoker.py:79-80,
    constants.py:1-2)."""
    name = f"value_bounds_{column}"
    p = _part(df, partition_by)
    c = F.col(column).cast("string").try_cast("double")
    # non-finite values belong to check_finite, not here — each check owns
    # exactly one violation class so counts never double-report
    finite = c.isNotNull() & ~F.isnan(c) & (F.abs(c) != F.lit(float("inf")))
    bad = finite & ((c < lower) | (c > upper))
    counted = p.groupBy("partition_key").agg(
        F.sum(bad.cast("long")).alias("violation_count"),
        F.count(F.lit(1)).alias("rows_scanned"),
    )
    return CheckResult(
        _verdict_from_violation_count(
            counted, name, errors.VALUE_OVERFLOW.format(column)
        ),
        _violation_rows(p, bad, name, keep or [column]),
    )


def check_strictly_ascending(
    df: DataFrame,
    ts_col: str,
    partition_by: Column | str | None = None,
    keep: list[str] | None = None,
) -> CheckResult:
    """P5 + P6 — per-partition strict ordering of a series' timestamps
    (invoker.py:27-35): descending pair → order violation, equal pair →
    duplicate-timestamp violation. One window pass computes both."""
    p = _part(df, partition_by)
    w = Window.partitionBy("partition_key").orderBy(F.col(ts_col))
    lagged = p.withColumn("_prev_ts", F.lag(ts_col).over(w))
    dup = F.col("_prev_ts").isNotNull() & (F.col(ts_col) == F.col("_prev_ts"))
    # after sorting, "descending input" is unobservable; the reference's
    # order check is meaningful only for pre-ordered frames, so here the
    # violation class that survives a shuffle is duplication. Order checks
    # against a stated file/order column use check_ascending_by below.
    counted = lagged.groupBy("partition_key").agg(
        F.sum(dup.cast("long")).alias("violation_count"),
        F.count(F.lit(1)).alias("rows_scanned"),
    )
    name = f"unique_ts_{ts_col}"
    return CheckResult(
        _verdict_from_violation_count(
            counted, name, errors.DUPLICATE_SERIES_TIMESTAMP
        ),
        _violation_rows(lagged, dup, name, keep or [ts_col]),
    )


def check_ascending_by(
    df: DataFrame,
    ts_col: str,
    order_col: str,
    partition_by: Column | str | None = None,
    keep: list[str] | None = None,
) -> CheckResult:
    """P5 — timestamps ascend along an explicit physical order column
    (row id / file offset), the distributed analog of the reference's
    pairwise scan over frame order (invoker.py:27-35)."""
    p = _part(df, partition_by)
    w = Window.partitionBy("partition_key").orderBy(F.col(order_col))
    lagged = p.withColumn("_prev_ts", F.lag(ts_col).over(w))
    bad = F.col("_prev_ts").isNotNull() & (F.col(ts_col) < F.col("_prev_ts"))
    counted = lagged.groupBy("partition_key").agg(
        F.sum(bad.cast("long")).alias("violation_count"),
        F.count(F.lit(1)).alias("rows_scanned"),
    )
    name = f"ascending_{ts_col}"
    return CheckResult(
        _verdict_from_violation_count(counted, name, errors.INVALID_SERIES_ORDER),
        _violation_rows(lagged, bad, name, keep or [ts_col, order_col]),
    )


def validate_batch_size(batch_size: int, min_points: int = MIN_POINTS) -> None:
    """P2 — config validation, driver-side (invoker.py:46-47)."""
    if 0 < batch_size < min_points:
        raise ValueError(errors.INVALID_BATCH_SIZE.format(min_points))


def check_text_extraction(
    df: DataFrame,
    html_col: str = "html",
    text_col: str = "text",
    partition_by: Column | str | None = None,
    keep: list[str] | None = None,
) -> CheckResult:
    """North-rule invariant — stored ``text`` must be byte-identical to
    the canonical extraction of ``html`` (functions.extract_text) for
    every row with non-null text. Entirely JVM-side (decode + regexp in
    whole-stage codegen); opt-in at the engine level because it is the
    one check that must read the ``html`` binary column.

    Byte identity is asserted by comparing UTF-8 encodings, not string
    equality, so a lossy decode can never mask a mismatch."""
    from anomalydetector_spark.functions import extract_text

    name = "text_extraction"
    p = _part(df, partition_by)
    extracted = extract_text(F.col(html_col))
    # malformed-UTF-8 html extracts to NULL (functions.extract_text) —
    # with non-null stored text that is a violation, not a skip
    bad = F.col(text_col).isNotNull() & (
        extracted.isNull()
        | (F.encode(extracted, "UTF-8") != F.encode(F.col(text_col), "UTF-8"))
    )
    counted = p.groupBy("partition_key").agg(
        F.sum(bad.cast("long")).alias("violation_count"),
        F.count(F.lit(1)).alias("rows_scanned"),
    )
    return CheckResult(
        _verdict_from_violation_count(
            counted, name, errors.TEXT_EXTRACTION_MISMATCH.format(text_col, html_col)
        ),
        _violation_rows(p, bad, name, keep or ["url", text_col]),
    )


def fd_cols(side: str | list[str] | tuple) -> list[str]:
    """Normalize one side of a functional dependency to a column list."""
    return [side] if isinstance(side, str) else list(side)


def fd_label(side: str | list[str] | tuple) -> str:
    """Human/check-name label for one FD side: single column keeps its
    bare name (stable check names for existing suites), composites join
    with '+'."""
    cols = fd_cols(side)
    return cols[0] if len(cols) == 1 else "+".join(cols)


def check_functional_dependency(
    df: DataFrame,
    determinant: str | list[str],
    dependent: str | list[str],
    partition_by: Column | str | None = None,
) -> CheckResult:
    """Generic functional-dependency check: every fully-non-null
    ``determinant`` value must map to exactly one ``dependent`` value
    (generalizes check_key_text_consistency to any column pair — url →
    domain, snapshot_id → partition_spec, …). Either side may be a LIST
    of columns: a composite determinant groups on the column tuple
    directly (no key concatenation — no delimiter/null hazard), a
    composite dependent hashes the struct of all its columns; rows with
    ANY determinant column null are skipped, matching the single-column
    non-null rule.

    Scale shape: the dependent is collapsed per row to a 256-bit hash of
    its JSON encoding BEFORE the shuffle (``to_json(struct(cols))`` is
    injective per type, handles any column type incl. binary via base64,
    and encodes NULL distinctly — so a determinant mapping to {x, NULL}
    counts as two values), one hash-aggregate on the determinant, then a
    tiny per-partition rollup. Violations are the offending DETERMINANT
    keys (callers semi-join for full rows)."""
    dets, deps = fd_cols(determinant), fd_cols(dependent)
    det_l, dep_l = fd_label(determinant), fd_label(dependent)
    name = f"fd_{det_l}_{dep_l}"
    p = _part(df, partition_by)
    for c in dets:
        p = p.filter(F.col(c).isNotNull())
    enc = F.sha2(F.to_json(F.struct(*[F.col(c) for c in deps])), 256)
    per_key = p.groupBy("partition_key", *dets).agg(
        F.count_distinct(enc).alias("_nv"),
        F.count(F.lit(1)).alias("_rows"),
    )
    counted = per_key.groupBy("partition_key").agg(
        F.sum((F.col("_nv") > 1).cast("long")).alias("violation_count"),
        F.sum("_rows").alias("rows_scanned"),
    )
    bad_keys = per_key.filter(F.col("_nv") > 1).select(
        F.lit(name).alias("check_name"), "partition_key", *dets
    )
    return CheckResult(
        _verdict_from_violation_count(
            counted, name, errors.FD_VIOLATION.format(det_l, dep_l)
        ),
        bad_keys,
    )


def check_key_text_consistency(
    df: DataFrame,
    key_col: str = "url",
    text_col: str = "text",
    partition_by: Column | str | None = None,
) -> CheckResult:
    """North-rule invariant — all rows sharing a key (url) must carry
    byte-identical text. One hash-aggregate on the key; text bytes are
    first collapsed to a 256-bit hash per row so the shuffle carries 32
    bytes, never the document body. Violations are the offending KEYS
    (row extraction would force a second scan; callers can semi-join)."""
    name = f"consistent_text_{key_col}"
    p = _part(df, partition_by).filter(F.col(text_col).isNotNull())
    per_key = p.groupBy("partition_key", key_col).agg(
        F.count_distinct(F.sha2(F.encode(F.col(text_col), "UTF-8"), 256)).alias(
            "_nv"
        ),
        F.count(F.lit(1)).alias("_rows"),
    )
    counted = per_key.groupBy("partition_key").agg(
        F.sum((F.col("_nv") > 1).cast("long")).alias("violation_count"),
        F.sum("_rows").alias("rows_scanned"),
    )
    bad_keys = per_key.filter(F.col("_nv") > 1).select(
        F.lit(name).alias("check_name"), "partition_key", key_col
    )
    return CheckResult(
        _verdict_from_violation_count(
            counted, name, errors.INCONSISTENT_KEY_TEXT.format(key_col)
        ),
        bad_keys,
    )


def check_robust_outliers(
    df: DataFrame,
    column: str,
    partition_by: Column | str | None = None,
    k: float = 5.0,
    max_outlier_frac: float = 0.0,
    keep: list[str] | None = None,
) -> CheckResult:
    """Data-derived magnitude gate: flag values with ``|x - median| >
    k * MAD`` of their partition (operators/robust — exact type-1
    estimators on the counts cube, never a per-partition sort). Where
    P9's ``bounds`` needs caller-supplied limits, this one derives them
    robustly from the column itself; the estimator has a 50% breakdown
    point, so the outliers it hunts cannot drag it.

    ``max_outlier_frac`` tolerates heavy-but-expected tails: the
    partition passes while ``violation_count <= max_outlier_frac *
    rows_scanned`` (default 0 — any outlier fails, matching the other
    checks' semantics). Null values are never outliers (P4/P8 own
    nulls); a partition whose MAD is 0 (over half its values identical)
    flags EVERY deviating value — the estimator's documented
    quantized-data bite, deliberate here: a validation check SHOULD
    scream when a near-constant column suddenly varies.
    """
    from anomalydetector_spark.operators.robust import mad_outliers

    name = f"robust_outliers_{column}"
    p = _part(df, partition_by)
    flagged = mad_outliers(p, column, by=("partition_key",), k=k)
    bad = F.coalesce(F.col("is_outlier"), F.lit(False))
    counted = flagged.groupBy("partition_key").agg(
        F.sum(bad.cast("long")).alias("violation_count"),
        F.count(F.lit(1)).alias("rows_scanned"),
    )
    message = errors.ROBUST_OUTLIERS.format(column, k)
    verdicts = counted.select(
        F.lit(name).alias("check_name"),
        "partition_key",
        (
            F.col("violation_count").cast("double")
            <= F.lit(max_outlier_frac) * F.col("rows_scanned").cast("double")
        ).alias("passed"),
        F.when(
            F.col("violation_count").cast("double")
            > F.lit(max_outlier_frac) * F.col("rows_scanned").cast("double"),
            F.lit(message),
        ).alias("error_message"),
        "violation_count",
        "rows_scanned",
    )
    return CheckResult(
        verdicts,
        _violation_rows(flagged, bad, name, keep or [column]),
    )


def check_freshness(
    df: DataFrame,
    ts_col: str,
    max_lag_seconds: int,
    reference_ts=None,
    partition_by: Column | str | None = None,
    check_name: str | None = None,
) -> CheckResult:
    """Freshness / staleness gate (dbt source-freshness, Deequ
    ``Maximum(ts)`` compliance): per partition, the NEWEST ``ts_col``
    value must lag ``reference_ts`` by at most ``max_lag_seconds`` — the
    "did yesterday's crawl actually land in every partition" check that
    row-shape constraints cannot see.

    ``reference_ts`` is an explicit timestamp (string/datetime literal).
    Pass one for deterministic runs (retry-stable verdicts, SQL-twin
    oracles, resumable manifests diff cleanly); ``None`` falls back to
    ``current_timestamp()`` for interactive use and is then
    deliberately NOT deterministic.

    Lag arithmetic is exact integer MICROseconds (``unix_micros`` both
    sides), floored to whole seconds for the verdict message — a future
    ``max(ts)`` (clock skew) gives a negative lag and always passes. A
    partition with zero non-null timestamps FAILS with
    ``NO_TIMESTAMPS`` — an absent feed must not read as fresh.

    Verdict-only (staleness is not row-addressable); one aggregation
    pass over (partition, ts).
    """
    name = check_name or f"freshness_{ts_col}"
    ref = (
        F.current_timestamp()
        if reference_ts is None
        else F.lit(reference_ts).cast("timestamp")
    )
    p = _part(df, partition_by)
    agg = p.groupBy("partition_key").agg(
        F.max(F.col(ts_col)).alias("_max_ts"),
        F.count(F.lit(1)).alias("rows_scanned"),
    )
    # unix_micros rejects TIMESTAMP_NTZ — cast both sides through
    # TIMESTAMP; with the session pinned to UTC (session.py) the cast is
    # a reinterpretation and the DIFFERENCE is exact either way
    lag_s = F.floor(
        (
            F.unix_micros(ref.cast("timestamp"))
            - F.unix_micros(F.col("_max_ts").cast("timestamp"))
        )
        / F.lit(1_000_000.0)
    ).cast("long")
    has_ts = F.col("_max_ts").isNotNull()
    fresh = has_ts & (lag_s <= F.lit(int(max_lag_seconds)))
    verdicts = agg.select(
        F.lit(name).alias("check_name"),
        "partition_key",
        fresh.alias("passed"),
        F.when(
            ~has_ts, F.lit(errors.NO_TIMESTAMPS.format(ts_col))
        )
        .when(
            ~fresh,
            F.format_string(
                errors.STALE_PARTITION.replace("{0}", ts_col)
                .replace("{1}", "%d")
                .replace("{2}", str(int(max_lag_seconds))),
                lag_s,
            ),
        )
        .alias("error_message"),
        F.when(fresh, F.lit(0)).otherwise(F.lit(1)).cast("long").alias(
            "violation_count"
        ),
        "rows_scanned",
    )
    return CheckResult(verdicts)


def json_schema_reason(column: str, required: dict[str, str]) -> Column:
    """The per-row violation reason expression behind
    :func:`check_json_schema` (NULL = compliant) — exposed so the engine
    can ride it on the shared one-scan violation extraction as a tag
    (pure codegen, like row asserts)."""
    for k in required:
        if any(ch in k for ch in ".[]'\""):
            raise ValueError(f"unsupported character in JSON key: {k!r}")
    col = F.col(column)
    nn = col.isNotNull()
    malformed = nn & F.try_parse_json(col).isNull()
    valid = nn & ~malformed
    reason = F.when(malformed, F.lit("malformed"))
    for k, typ in required.items():
        raw = F.get_json_object(col, f"$.{k}")
        reason = reason.when(
            valid & raw.isNull(), F.lit(f"missing:{k}")
        ).when(
            valid & raw.isNotNull() & raw.try_cast(typ).isNull(),
            F.lit(f"type:{k}"),
        )
    return reason


def check_json_schema(
    df: DataFrame,
    column: str,
    required: dict[str, str],
    partition_by: Column | str | None = None,
    check_name: str | None = None,
    keep: list[str] | None = None,
) -> CheckResult:
    """Semi-structured payload validation: every non-null value of
    ``column`` must be (a) parseable JSON, and (b) carry each key in
    ``required`` (a ``{json_key: spark_type}`` mapping, e.g.
    ``{"k": "bigint"}``) with a value castable to the declared type —
    the events-pipeline staple that P3/P7 column checks cannot see
    inside a JSON string column.

    Entirely JVM-side codegen: ``try_parse_json`` probes validity (the
    VARIANT parser — no Python, no UDF), ``get_json_object`` extracts,
    ``try_cast`` type-checks. Pinned conventions:

    * a NULL column value is NOT a violation (nullability is P4's job);
    * a JSON ``null`` value for a required key counts as MISSING —
      ``get_json_object`` surfaces JSON null and absent identically,
      and a required key whose value is null fails either way;
    * each violating row reports ONE reason — the first failure in
      declaration order: ``malformed``, then ``missing:<key>`` /
      ``type:<key>`` per key — so the violation frame is deterministic;
    * keys are used verbatim in the JSONPath (``$.<key>``) — keys
      containing ``.``/quotes/brackets are rejected loudly.

    Violations are row-addressable: the frame carries ``json_reason``.
    """
    name = check_name or f"json_schema_{column}"
    p = _part(df, partition_by).withColumn(
        "json_reason", json_schema_reason(column, required)
    )
    bad = F.col("json_reason").isNotNull()
    counted = p.groupBy("partition_key").agg(
        F.sum(bad.cast("long")).alias("violation_count"),
        F.count(F.lit(1)).alias("rows_scanned"),
    )
    return CheckResult(
        _verdict_from_violation_count(
            counted, name, errors.JSON_SCHEMA_VIOLATION.format(column)
        ),
        _violation_rows(
            p, bad, name, ["json_reason", *(keep or [])]
        ),
    )
