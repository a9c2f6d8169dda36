"""Event-sequence analytics over sessions: funnel progression and
cohort retention — the two standard product-analytics rollups, built on
:mod:`anomalydetector_spark.operators.sessions`.

**Funnel** (``session_funnel`` / ``funnel_counts``): how far through an
ordered step list (e.g. view → click → purchase) each session gets,
under GREEDY LEFTMOST subsequence matching — the industry rule: walk
the session's events in time order and advance to step ``i+1`` at the
first event matching it after step ``i`` matched. Greedy-leftmost is
optimal here (matching a later candidate can never unlock an earlier
next step), so "reached k" is well-defined regardless of which
occurrences matched.

Plan shape: sessionization's one shuffle, then the per-session ordered
type array is built by the same (key, session) aggregation that needs
no new exchange (clustering on a superset of the window key is already
satisfied), and the step matcher is ONE in-row ``aggregate`` over that
array — state is a single int, no explode, no joins. ``funnel_counts``
is a conditional-sum aggregation to one row, unpivoted to a
step-per-row report with exact conversion ratios.

**Cohort retention** (``cohort_retention``): users grouped by the week
of their first event; for each (cohort, week offset k) the fraction of
the cohort active in week k. Two aggregations over (user, week) —
first-week per user, distinct active weeks — joined on the user key,
then one count-distinct rollup; the only wide rows ever shuffled are
(user, week) pairs. Week bucketing is ``date_trunc('week')`` (ISO
Monday, identical in Spark and DuckDB) and offsets are exact integer
epoch arithmetic.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from anomalydetector_spark.operators.sessions import sessionize

_WEEK_S = 7 * 86400


def session_funnel(
    events: DataFrame,
    steps: Sequence[str],
    key_cols: list[str] | str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    gap_seconds=4 * 3600,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """One row per (key, session): ``reached`` = number of funnel steps
    completed in order (0..len(steps)) under greedy-leftmost matching.
    Event order inside the session is (ts, tiebreak) — the same total
    order the sessionizer uses."""
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    steps = list(steps)
    if not steps:
        raise ValueError("need at least one funnel step")
    sess = sessionize(
        events,
        key_cols,
        ts_col,
        gap_seconds,
        tiebreak_cols=tiebreak_cols,
    )
    # in-session order comes from array_sort over (ts, tiebreak, type)
    # structs — lexicographic struct comparison IS the session order
    ordered_types = F.transform(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(ts_col).alias("ts"),
                    *[F.col(c).alias(c) for c in (tiebreak_cols or [])],
                    F.col(type_col).alias("t"),
                )
            )
        ),
        lambda s: s["t"],
    )
    step_arr = F.array(*[F.lit(s) for s in steps])
    k = len(steps)
    reached = F.aggregate(
        F.col("_types"),
        F.lit(0),
        lambda acc, x: F.when(
            (acc < F.lit(k)) & (x == F.element_at(step_arr, acc + 1)),
            acc + 1,
        ).otherwise(acc),
    )
    return (
        sess.groupBy(*key_cols, "session_index")
        .agg(ordered_types.alias("_types"))
        .withColumn("reached", reached)
        .drop("_types")
    )


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    **kwargs,
) -> DataFrame:
    """The funnel report: one row per step with the number of sessions
    reaching it, the total session count, and exact 6-dp conversion
    ratios (vs all sessions, and vs the previous step — null at step 1
    denominator 0)."""
    steps = list(steps)
    per_session = session_funnel(events, steps, **kwargs)
    agg = per_session.agg(
        F.count(F.lit(1)).alias("_total"),
        *[
            # coalesce: sum over an EMPTY frame is NULL, and the report
            # should read 0-session steps as 0, not null
            F.coalesce(
                F.sum((F.col("reached") >= i + 1).cast("long")), F.lit(0)
            ).alias(f"_r{i}")
            for i in range(len(steps))
        ],
    )
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i + 1).alias("step"),
                    F.lit(steps[i]).alias("step_name"),
                    F.col(f"_r{i}").alias("n_sessions"),
                    F.col("_total").alias("total_sessions"),
                    F.round(
                        F.col(f"_r{i}").cast("double")
                        / F.greatest(F.col("_total"), F.lit(1)).cast("double"),
                        6,
                    ).alias("conversion"),
                    (
                        # when-guard: ANSI mode makes a bare /0 throw,
                        # and an empty upstream step has no meaningful rate
                        F.when(
                            F.col(f"_r{i - 1}") > 0,
                            F.round(
                                F.col(f"_r{i}").cast("double")
                                / F.col(f"_r{i - 1}").cast("double"),
                                6,
                            ),
                        )
                        if i > 0
                        else F.lit(None).cast("double")
                    ).alias("step_conversion"),
                )
                for i in range(len(steps))
            ]
        )
    )
    return agg.select(rows.alias("r")).select("r.*")


def cohort_retention(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort_week, week_offset, n_active, cohort_size, retention):
    for each first-activity-week cohort, the exact fraction active in
    week cohort+offset. Offset 0 is 1.0 by construction (every user is
    active in their first week)."""
    ts = F.col(ts_col)
    weekly = (
        events.filter(ts.isNotNull())
        .select(
            F.col(key_col).alias("_u"),
            F.date_trunc("week", ts.cast("timestamp")).alias("_w"),
        )
        .distinct()
    )
    first = weekly.groupBy("_u").agg(F.min("_w").alias("_cohort"))
    joined = weekly.join(first, "_u")
    offset = (
        (F.unix_timestamp("_w") - F.unix_timestamp("_cohort"))
        / F.lit(_WEEK_S)
    ).cast("long")
    active = joined.groupBy(
        F.col("_cohort").alias("cohort_week"),
        offset.alias("week_offset"),
    ).agg(F.countDistinct("_u").alias("n_active"))
    sizes = first.groupBy(F.col("_cohort").alias("cohort_week")).agg(
        F.countDistinct("_u").alias("cohort_size")
    )
    return active.join(sizes, "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        "cohort_size",
        F.round(
            F.col("n_active").cast("double")
            / F.col("cohort_size").cast("double"),
            6,
        ).alias("retention"),
    )


def growth_accounting(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window: str = "1 week",
) -> DataFrame:
    """Growth accounting — the standard per-window decomposition of the
    active-key set (users, domains, crawl hosts) that a bare
    distinct-count series cannot show (flat actives can hide equal and
    opposite churn + acquisition):

    * ``n_new`` — keys active this window, never seen before;
    * ``n_retained`` — active this window AND the immediately previous
      window;
    * ``n_resurrected`` — active this window, seen before, but NOT in
      the previous window;
    * ``n_churned`` — active in the PREVIOUS window but not this one
      (attributed to the current window, the convention that makes
      ``actives(w) = actives(w−1) + new + resurrected − churned`` hold
      exactly — pinned by test);
    * ``n_active`` — the distinct-key count this window.

    Exact integers end to end. Scale shape: the input collapses to the
    DISTINCT (key, window) frame first (one map-side-combined
    aggregation — the only pass over raw rows); classification is a lag
    over each key's OWN window sequence (partitioned by key, bounded by
    windows-per-key), and the final counts are one groupBy of that
    bounded frame. Churn needs no extra pass: a churned-at-w key is one
    whose successor slot after w−1 is empty — counted from the same lag
    frame via the NEXT-window view. NULL keys/timestamps are excluded.

    Output: (window_start, n_active, n_new, n_retained, n_resurrected,
    n_churned) — every window any key was active in, plus the window
    after the last active one if churn lands there.
    """
    dur = F.expr(f"INTERVAL {window}")
    kw = (
        df.filter(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .groupBy(
            F.col(user_col).alias("key"),
            F.window(ts_col, window)["start"].alias("w"),
        )
        .agg(F.lit(1))
        .select("key", "w")
    )
    per_key = Window.partitionBy("key").orderBy("w")
    lagged = kw.withColumn("prev_w", F.lag("w").over(per_key)).withColumn(
        "next_w", F.lead("w").over(per_key)
    )
    active = lagged.groupBy(F.col("w").alias("window_start")).agg(
        F.count(F.lit(1)).alias("n_active"),
        F.sum(F.col("prev_w").isNull().cast("long")).alias("n_new"),
        F.sum(
            (F.col("prev_w") == F.col("w") - dur).cast("long")
        ).alias("n_retained"),
        F.sum(
            (
                F.col("prev_w").isNotNull()
                & (F.col("prev_w") != F.col("w") - dur)
            ).cast("long")
        ).alias("n_resurrected"),
    )
    # a key churns at w+1 when its next active window is not w+1 (or
    # never comes) — counted from the same lag frame, no extra scan
    churn = (
        lagged.filter(
            F.col("next_w").isNull() | (F.col("next_w") != F.col("w") + dur)
        )
        .groupBy((F.col("w") + dur).alias("window_start"))
        .agg(F.count(F.lit(1)).alias("n_churned"))
    )
    out = active.join(churn, "window_start", "full_outer").select(
        "window_start",
        *[
            F.coalesce(F.col(c), F.lit(0)).alias(c)
            for c in (
                "n_active",
                "n_new",
                "n_retained",
                "n_resurrected",
                "n_churned",
            )
        ],
    )
    return out
