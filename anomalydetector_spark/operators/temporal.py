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


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str] | str,
    left_ts: str,
    right_ts: str | None = None,
    value_cols: list[str] | None = None,
    bucket: str = "1 day",
    tolerance=None,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join with the HOT-KEY mitigation the module
    docstring documents: the window partitions on ``(key, time_bucket)``
    instead of the bare key, so a key owning half the table no longer
    serializes into one task — each task handles one bucket of it.

    Exactness is preserved with carry-in rows: a left row's match can
    live in an EARLIER bucket, so for every (key, bucket) the last right
    payload of each bucket is rolled forward with a running-last window
    over the per-(key, bucket) rollup (that frame has one row per key ×
    bucket — bounded and tiny relative to the data) and injected into
    the next buckets as a synthetic right row sorting before everything
    in the bucket. The in-bucket window then only ever sees
    bucket-bounded partitions. Equality with :func:`asof_join` and the
    ≤3× max/median partition balance under a 50%-hot key are
    pytest-proven (tests/test_temporal.py).

    Three shuffles total — (key, bucket) for the union window, key for
    the tiny rollup window, (key, bucket) again for the carry union —
    versus one for the plain join: worth it exactly when a hot key would
    otherwise serialize, which is why the plain form stays the default.
    """
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    right_ts = right_ts or left_ts
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in {*key_cols, right_ts}]

    payload = F.struct(
        F.col(right_ts).alias("__ts"), *[F.col(c) for c in value_cols]
    )
    bkt = lambda ts: F.window(F.col(ts), bucket)["start"]  # noqa: E731

    r2 = right.select(
        *key_cols,
        F.col(right_ts).alias("__asof_ts"),
        payload.alias("__payload"),
        F.lit(0).alias("__is_left"),
        bkt(right_ts).alias("__bkt"),
        F.lit(1).alias("__in_bucket"),
    )
    # per-(key, bucket) last payload → lag + running-last over the union
    # of BOTH sides' bucket keys (left rows can land in buckets the
    # right side never touched and still need their carry) → the
    # carry-in each bucket sees from all earlier buckets. This rollup
    # frame has one row per key × bucket — bounded and tiny.
    wb = Window.partitionBy(*key_cols).orderBy(F.col("__bkt").asc())
    per_bucket_last = r2.groupBy(*key_cols, "__bkt").agg(
        F.max_by("__payload", F.col("__asof_ts")).alias("__last")
    )
    left_buckets = left.select(
        *key_cols, bkt(left_ts).alias("__bkt")
    ).distinct()
    all_buckets = left_buckets.unionByName(
        per_bucket_last.select(*key_cols, "__bkt")
    ).distinct()
    rolled = (
        all_buckets.join(per_bucket_last, [*key_cols, "__bkt"], "left")
        .withColumn("__prev", F.lag("__last").over(wb))
        .withColumn(
            "__carry",
            F.last("__prev", ignorenulls=True).over(
                wb.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .filter(F.col("__carry").isNotNull())
        .select(
            *key_cols,
            "__bkt",
            F.col("__carry.__ts").alias("__asof_ts"),
            F.col("__carry").alias("__payload"),
            F.lit(0).alias("__is_left"),
            F.lit(0).alias("__in_bucket"),
        )
    )

    l2 = left.withColumns(
        {
            "__asof_ts": F.col(left_ts),
            "__payload": F.lit(None).cast(r2.schema["__payload"].dataType),
            "__is_left": F.lit(1),
            "__bkt": bkt(left_ts),
            "__in_bucket": F.lit(1),
        }
    )
    u = l2.unionByName(r2, allowMissingColumns=True).unionByName(
        rolled, allowMissingColumns=True
    )

    # carry rows (__in_bucket=0) sort before every in-bucket row; within
    # the bucket the plain backward order applies (right before left on
    # equal timestamps)
    w = (
        Window.partitionBy(*key_cols, "__bkt")
        .orderBy(
            F.col("__in_bucket").asc(),
            F.col("__asof_ts").asc(),
            F.col("__is_left").asc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__payload", ignorenulls=True).over(w)
    out = u.withColumn("__m", matched).filter(F.col("__is_left") == 1)
    if tolerance is not None:
        in_tol = F.col("__m.__ts") >= F.col(left_ts) - tolerance
        out = out.withColumn(
            "__m", F.when(in_tol, F.col("__m")).otherwise(F.lit(None))
        )
    return out.select(
        *left.columns,
        F.col("__m.__ts").alias(f"{prefix}{right_ts}"),
        *[F.col(f"__m.{c}").alias(f"{prefix}{c}") for c in value_cols],
    )
