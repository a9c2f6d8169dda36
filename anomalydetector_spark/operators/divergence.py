"""Distribution-divergence drift between consecutive time windows.

The engine's SR scorer flags anomalies in per-window SCALAR series (null
rate, doc count, quantiles). Categorical columns (lang, source, domain
class) drift in SHAPE, which a scalar per-category series can miss — the
standard check is a divergence between consecutive windows' category
distributions:

* **Jensen-Shannon divergence** (symmetric, bounded [0,1] in log2,
  defined when categories appear/disappear — the reason it is preferred
  over raw KL for drift monitors),
* **total variation distance** ``0.5 * Σ|p−q|`` (the L1 view).

Scale shape: the input collapses to (window, category) counts FIRST —
everything after runs on a frame whose size is #windows × #categories,
independent of row count. The window-pair alignment is an equi-join of
that tiny frame with itself shifted one window; divergence terms are
plain column arithmetic; per-window sums partial-aggregate. The emitted
one-row-per-window series is exactly what ``drift.score_drift`` consumes
(stat_name = e.g. ``lang_js_divergence``), so shape drift rides the same
SR + threshold machinery as every scalar stat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def divergence_from_window_counts(
    counts: DataFrame, part_cols: list[str] | tuple[str, ...] = ()
) -> DataFrame:
    """Divergence series from a pre-aggregated counts frame
    ``(*part_cols, w_start, w_end, cat, n)`` — the entry point for
    callers that already hold per-window category counts (the engine's
    counts cube), so shape drift costs ZERO extra input scans.

    Output: (*part_cols, window_start, js_divergence, tvd,
    n_categories). The first window of each partition has no predecessor
    and is omitted (a divergence against nothing is undefined, not
    zero); likewise a window whose predecessor slot is empty (data gap).
    """
    part = list(part_cols)
    tot = Window.partitionBy(*part, "w_start")
    probs = counts.withColumn("p", F.col("n") / F.sum("n").over(tot))

    cur = probs.select(*part, "w_start", "cat", F.col("p").alias("p_cur"))
    prev = probs.select(
        # a window's successor starts at its end (tumbling windows), so
        # aligning prev.w_end == cur.w_start is a pure equi-join
        *part, F.col("w_end").alias("w_start"), "cat", F.col("p").alias("p_prev")
    )
    pairs = cur.join(prev, [*part, "w_start", "cat"], "full_outer").select(
        *part,
        "w_start",
        "cat",
        F.coalesce("p_cur", F.lit(0.0)).alias("p"),
        F.coalesce("p_prev", F.lit(0.0)).alias("q"),
        F.col("p_cur").isNotNull().alias("in_cur"),
    )
    # windows present only as predecessors (the stream's first window
    # and any window after the last) surface as rows with p_cur all-null;
    # those synthetic "next" windows are dropped — only real current
    # windows with a real predecessor emit a score
    has_prev = Window.partitionBy(*part, "w_start")
    pairs = pairs.withColumn(
        "w_has_cur", F.max(F.col("in_cur").cast("int")).over(has_prev)
    ).withColumn(
        "w_has_prev", F.max((F.col("q") > 0).cast("int")).over(has_prev)
    ).filter((F.col("w_has_cur") == 1) & (F.col("w_has_prev") == 1))

    m = (F.col("p") + F.col("q")) / 2.0
    # 0·log(0/m) := 0 — category absent on one side contributes only
    # through the other side's term
    term = lambda x: F.when(x > 0, x * F.log2(x / m)).otherwise(F.lit(0.0))  # noqa: E731
    return (
        pairs.groupBy(*part, "w_start")
        .agg(
            (
                F.sum(term(F.col("p"))) / 2.0 + F.sum(term(F.col("q"))) / 2.0
            ).alias("js_divergence"),
            (F.sum(F.abs(F.col("p") - F.col("q"))) / 2.0).alias("tvd"),
            F.sum(F.col("in_cur").cast("long")).alias("n_categories"),
        )
        .withColumnRenamed("w_start", "window_start")
    )


def categorical_window_divergence(
    df: DataFrame,
    ts_col: str = "ts",
    cat_col: str = "lang",
    window: str = "1 day",
) -> DataFrame:
    """Per-window JS divergence + TVD of ``cat_col``'s distribution vs
    the PREVIOUS window, from raw rows. Output: (window_start,
    js_divergence, tvd, n_categories)."""
    counts = (
        df.groupBy(
            F.window(ts_col, window).alias("w"), F.col(cat_col).alias("cat")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "cat",
            "n",
        )
    )
    return divergence_from_window_counts(counts)
