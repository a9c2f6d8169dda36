"""Streaming sessionization: finalized per-session stats over a live
event stream, built on Spark's NATIVE stateful session operator.

This is the deliberately Spark-first member of the sessionization
family: where the other custom streams in this package need
``applyInPandasWithState`` (SR scoring, drift pairing — semantics Spark
has no operator for), gap-sessions ARE a built-in —
``F.session_window`` + watermark. Using it buys merge-on-late-data,
bounded state (sessions evict once the watermark passes), and
exactly-once append emission from the state store, with zero custom
state code to get wrong.

Boundary convention: ``session_window`` merges an event landing
EXACTLY ``gap`` after the previous one (the window interval is closed
on the right — pinned empirically by
tests/test_sessions_stream.py::test_exact_gap_boundary_semantics, two
events ``gap`` apart come back as ONE session of duration ``gap``).
That is the INCLUSIVE convention — the batch operator's default — so a
streaming deployment and its ``sessionize()`` batch backfill reconcile
exactly (the parity test pins streaming == batch on the full stats
frame); ``closed="exclusive"`` remains on the batch side for pipelines
that standardize on the strict reading.

Emission semantics (append mode): a session row emits ONCE, when the
watermark passes its close (last event + gap) — i.e. only sessions that
can no longer grow. Events later than the watermark are dropped by the
watermark contract (the quarantine stream is the place to surface
those). State is bounded by (open sessions per key x keys active inside
the watermark horizon), not by stream lifetime.

Scale: the stateful aggregation shuffles once on the grouping keys;
map-side partial aggregation applies before the state store, and the
session-merge work is per-key in the state store — the same skew
surface as every keyed streaming aggregation (a pathologically hot key
concentrates in one state partition; mitigate upstream by splitting
the key, e.g. (user, device)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_session_stats(
    events_stream: DataFrame,
    key_cols: tuple[str, ...] = ("user_id",),
    ts_col: str = "ts",
    gap_seconds: int = 4 * 3600,
    watermark_delay: str = "1 hour",
    type_col: str | None = None,
) -> DataFrame:
    """One finalized row per (key, session): ``session_start`` /
    ``session_end`` (first/last event timestamps — NOT the window end,
    which includes the gap), exact integer ``duration_us``, ``n_events``
    and optionally ``n_types`` — the same output contract as the batch
    ``operators.sessions.session_stats`` minus the per-key
    ``session_index`` (a global per-key ordinal is meaningless while
    the stream is unbounded; number the backfill instead).

    ``n_types`` uses ``size(collect_set(...))`` — streaming aggregations
    forbid ``countDistinct``, and the set is bounded by the type
    alphabet, not the session size.
    """
    gap = f"{int(gap_seconds)} seconds"
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.max(us) - F.min(us)).alias("duration_us"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if type_col is not None:
        # cast matches the batch contract (countDistinct returns long)
        aggs.append(
            F.size(F.collect_set(type_col)).cast("long").alias("n_types")
        )
    grouped = (
        events_stream.filter(F.col(ts_col).isNotNull())
        .withWatermark(ts_col, watermark_delay)
        .groupBy(
            *key_cols, F.session_window(F.col(ts_col), gap).alias("_sw")
        )
        .agg(*aggs)
    )
    return grouped.select(
        *key_cols,
        "session_start",
        "session_end",
        "duration_us",
        "n_events",
        *(["n_types"] if type_col is not None else []),
    )
