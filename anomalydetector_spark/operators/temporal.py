"""Temporal joins Spark lacks as built-ins, expressed as compositions of
DataFrame operators (never a theta/range join).

**As-of join** — for each left row, the single right row with the
largest ``right_ts <= left_ts`` for the same key (``direction=
"backward"``; ``"forward"`` takes the smallest ``right_ts >= left_ts``).
The standard uses here: attach the latest stats snapshot to each
violation row, the last purchase to each click, the prevailing config to
each observation.

A naive formulation is a range join (``l.key = r.key AND r.ts <= l.ts``
+ a per-row max), which Catalyst executes as an equi-join exploding
EVERY earlier right row per left row before aggregating — quadratic per
key. This implementation is the one-shuffle plan instead:

1. tag both inputs and union them (right rows carry their payload packed
   in ONE struct — picking each column independently with
   ``last(ignorenulls)`` could stitch values from different right rows);
2. a single window over (key, ordered by ts with right-before-left on
   ties) propagates the last-seen right struct onto every left row;
3. keep the left rows, unpack the struct, null it out when an optional
   ``tolerance`` is exceeded.

Cost: one shuffle of (left ∪ right) on the key — the same price as the
equi-join you cannot avoid — plus a sort Spark would also need for the
range join. Skew note: a window partition is processed sequentially, so
one pathologically hot key serializes; for hot-key workloads bucket the
time axis first (validate per day, then as-of within the day) — the
violation/stats use this engine puts it to has per-(partition, window)
keys, which are bounded by construction.

Right-side contract: (key, ts) should identify at most one payload row
(the usual as-of contract — DuckDB's ASOF JOIN and pandas merge_asof
assume the same); with duplicates the window keeps the last one in an
implementation-determined order, so pre-aggregate duplicates away when
they can occur.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str] | str,
    left_ts: str,
    right_ts: str | None = None,
    value_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance=None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join. Output = every ``left`` row + ``prefix<ts>`` (the
    matched right timestamp, null when no match) + ``prefix<col>`` for
    each payload column.

    ``tolerance``: a Column-compatible interval literal (e.g.
    ``F.expr("INTERVAL 1 DAY")``); matches farther than this from the
    left timestamp are nulled to no-match.
    """
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    right_ts = right_ts or left_ts
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in {*key_cols, right_ts}]

    payload = F.struct(
        F.col(right_ts).alias("__ts"), *[F.col(c) for c in value_cols]
    )
    r2 = right.select(
        *key_cols,
        F.col(right_ts).alias("__asof_ts"),
        payload.alias("__payload"),
        F.lit(0).alias("__is_left"),
    )
    l2 = left.withColumns(
        {
            "__asof_ts": F.col(left_ts),
            "__payload": F.lit(None).cast(
                r2.schema["__payload"].dataType
            ),
            "__is_left": F.lit(1),
        }
    )
    u = l2.unionByName(r2, allowMissingColumns=True)

    if direction == "backward":
        order = [F.col("__asof_ts").asc(), F.col("__is_left").asc()]
    else:
        order = [F.col("__asof_ts").desc(), F.col("__is_left").asc()]
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__payload", ignorenulls=True).over(w)

    out = u.withColumn("__m", matched).filter(F.col("__is_left") == 1)
    if tolerance is not None:
        m_ts = F.col("__m.__ts")
        if direction == "backward":
            in_tol = m_ts >= F.col(left_ts) - tolerance
        else:
            in_tol = m_ts <= F.col(left_ts) + tolerance
        out = out.withColumn(
            "__m", F.when(in_tol, F.col("__m")).otherwise(F.lit(None))
        )
    return out.select(
        *left.columns,
        F.col("__m.__ts").alias(f"{prefix}{right_ts}"),
        *[F.col(f"__m.{c}").alias(f"{prefix}{c}") for c in value_cols],
    )
