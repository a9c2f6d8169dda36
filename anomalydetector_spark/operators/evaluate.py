"""Detector-quality evaluation — the reference's competition metric as
distributed DataFrame programs (SURVEY.md §2.4 A5-A7, §2.5 W16-W18).

Reference semantics (srcnn/competition_metric.py):

* ``get_range_proba`` (:9-34): label runs segment the series; an anomaly
  segment counts as detected iff any positive prediction lands within its
  first ``delay+1`` points — then the WHOLE segment's prediction becomes
  1, else 0. Outside anomaly segments predictions pass through.
* ``reconstruct_label`` (:37-52): scatter sparse (timestamp, label) onto
  the dense min-interval grid, missing slots = 0.
* threshold sweep (srcnn/evalue.py:163-176): scan thresholds, keep the
  best F1.

Distributed shapes: the segment id is a running sum of label-change
indicators over an ordered window (one shuffle per partition key); the
grid spine is ``sequence()`` + left join; the sweep is a crossJoin with a
literal threshold column — all JVM-side, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order_cols(order_by: list[str]) -> list[Column]:
    return [F.col(c) for c in order_by]


def segment_adjust_predictions(
    df: DataFrame,
    label_col: str = "label",
    pred_col: str = "pred",
    order_by: list[str] | None = None,
    partition_by: str | list[str] | None = None,
    delay: int = 7,
) -> DataFrame:
    """W16 — append ``adj_pred`` per competition_metric.py:9-34.

    ``partition_by`` scopes independent series (each evaluated like one
    reference call); ``order_by`` fixes the time order within a series.
    """
    order_by = order_by or ["ts"]
    if partition_by is None:
        part = []
    elif isinstance(partition_by, str):
        part = [partition_by]
    else:
        part = list(partition_by)
    w = Window.partitionBy(*part).orderBy(*_order_cols(order_by))

    prev = F.lag(label_col).over(w)
    chg = F.when(prev.isNull() | (F.col(label_col) != prev), 1).otherwise(0)
    seg = df.withColumn(
        "_seg_id", F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    ws = Window.partitionBy(*part, "_seg_id").orderBy(*_order_cols(order_by))
    seg = seg.withColumn("_rn", F.row_number().over(ws))
    wseg = Window.partitionBy(*part, "_seg_id")
    detected = F.max(
        F.when((F.col("_rn") <= delay + 1) & (F.col(pred_col) == 1), 1).otherwise(0)
    ).over(wseg)
    adj = F.when(F.col(label_col) == 1, detected).otherwise(F.col(pred_col))
    return seg.withColumn("adj_pred", adj).drop("_seg_id", "_rn")


def confusion_counts(
    df: DataFrame, label_col: str = "label", pred_col: str = "pred"
) -> DataFrame:
    """A5/A6 — one-row confusion counts + precision/recall/F1
    (competition_metric.py:62-92). Fully map-side partial-aggregated."""
    lab = F.col(label_col)
    pred = F.col(pred_col)
    agg = df.agg(
        F.sum(pred * lab).alias("tp"),
        F.sum(pred * (1 - lab)).alias("fp"),
        F.sum((1 - pred) * lab).alias("fn"),
        F.sum((1 - pred) * (1 - lab)).alias("tn"),
    )
    # zero denominators score 0.0, matching sklearn's zero_division
    # default used by the reference (and avoiding ANSI DIVIDE_BY_ZERO)
    def _safe(num, den):
        return F.when(den > 0, num / den).otherwise(F.lit(0.0))

    p = _safe(F.col("tp"), F.col("tp") + F.col("fp"))
    r = _safe(F.col("tp"), F.col("tp") + F.col("fn"))
    return agg.select(
        "tp", "fp", "fn", "tn",
        p.alias("precision"), r.alias("recall"),
        _safe(2 * p * r, p + r).alias("f1"),
    )


def per_series_f1(
    df: DataFrame,
    series_col: str = "series_id",
    label_col: str = "label",
    pred_col: str = "pred",
    order_by: list[str] | None = None,
    delay: int = 7,
    adjust: bool = True,
) -> DataFrame:
    """A7 (part 1) — one confusion/F1 row per labeled series, the
    reference's per-file evaluation protocol (competition_metric.py:81-99
    reconstructs each file independently; the bi_ variant at :136-148
    records each file's own f1_score). ``adjust=True`` applies the W16
    segment adjustment per series first, as ``evaluate_for_all_series``
    does via ``reconstruct_series``.

    F1 degenerates to 0.0 when a series has no positive labels or
    predictions — sklearn's ``zero_division`` behavior in the reference.

    One shuffle on ``series_col`` (the window for adjustment and the
    groupBy share the partitioning, so AQE coalesces them).
    """
    order_by = order_by or ["ts"]
    if adjust:
        scored = segment_adjust_predictions(
            df, label_col, pred_col, order_by, partition_by=series_col, delay=delay
        )
        pred = F.col("adj_pred")
    else:
        scored = df
        pred = F.col(pred_col)
    lab = F.col(label_col)
    agg = scored.groupBy(series_col).agg(
        F.sum(pred * lab).alias("tp"),
        F.sum(pred * (1 - lab)).alias("fp"),
        F.sum((1 - pred) * lab).alias("fn"),
        F.sum((1 - pred) * (1 - lab)).alias("tn"),
    )
    denom = 2 * F.col("tp") + F.col("fp") + F.col("fn")
    f1 = F.when(denom > 0, 2 * F.col("tp") / denom).otherwise(F.lit(0.0))
    return agg.withColumn("f1", f1)


def f1_variance(
    df: DataFrame,
    series_col: str = "series_id",
    label_col: str = "label",
    pred_col: str = "pred",
    order_by: list[str] | None = None,
    delay: int = 7,
    adjust: bool = True,
) -> DataFrame:
    """A7 (part 2) — ``get_variance`` (competition_metric.py:161-166):
    population mean of squared deviations of each series' F1 from the
    POOLED overall F1 (not the mean of per-series F1s — the reference
    passes the all-series score as the center).

    Emits one row: ``(overall_f1, n_series, f1_variance)``. The overall
    score is a rollup of the per-series confusion counts, so the input is
    scanned once; the 1-row overall frame broadcasts onto the per-series
    frame for the deviation average.
    """
    per = per_series_f1(
        df, series_col, label_col, pred_col, order_by, delay, adjust
    ).persist()
    try:
        # materialize the 1-row summary eagerly so the per-series cache
        # can be released before returning (a lazily-returned plan would
        # pin the cache for the session lifetime)
        summary = variance_from_per_series(per)
        rows = summary.collect()
        return per.sparkSession.createDataFrame(rows, summary.schema)
    finally:
        per.unpersist()


def variance_from_per_series(per: DataFrame) -> DataFrame:
    """The ``get_variance`` math over an ALREADY-COMPUTED per-series
    confusion frame (one row per series with ``tp/fp/fn/f1`` — the
    output of :func:`per_series_f1`). Split out so callers that persist
    or write the per-series frame don't recompute it for the summary."""
    overall = per.agg(
        F.sum("tp").alias("tp"), F.sum("fp").alias("fp"), F.sum("fn").alias("fn")
    )
    denom = 2 * F.col("tp") + F.col("fp") + F.col("fn")
    overall = overall.select(
        F.when(denom > 0, 2 * F.col("tp") / denom)
        .otherwise(F.lit(0.0))
        .alias("overall_f1")
    )
    dev = (F.col("f1") - F.col("overall_f1")) ** 2
    return per.crossJoin(F.broadcast(overall)).agg(
        F.first("overall_f1").alias("overall_f1"),
        F.count("*").alias("n_series"),
        F.avg(dev).alias("f1_variance"),
    )


def gap_adjusted_detections(
    df: DataFrame,
    series_col: str = "series_id",
    ts_col: str = "ts",
    det_col: str = "pred",
    score_col: str | None = "score",
    order_by: list[str] | None = None,
    max_back: int = 1000,
) -> DataFrame:
    """W15 — gap-as-anomaly post-rule as a distributed operator
    (reference srcnn/utils.py:302-311): within each series, a point whose
    inter-arrival gap exceeds the series' minimum interval is forced
    anomalous when a detection (original or previously forced) occurred
    fewer than ``max_back`` indices back.

    The rule's running ``last`` pointer is inherently sequential per
    series, so each series is one Arrow batch through ``applyInPandas``
    (the same shape as SR scoring itself — one shuffle on ``series_col``,
    group size = series length, never per-document).  Inside the batch the
    kernel only loops over gap indices (kernel/sr.py apply_gap_rule).

    Output = input columns with ``det_col``/``score_col`` adjusted, plus
    ``gap_forced`` (true where the rule flipped a 0 to a 1).
    """
    import pandas as pd

    from pyspark.sql.types import BooleanType, StructField, StructType

    from anomalydetector_spark.kernel.sr import apply_gap_rule

    order_by = order_by or [ts_col]
    # fresh StructType: StructType.add would mutate df's cached schema
    out_schema = StructType(
        list(df.schema.fields) + [StructField("gap_forced", BooleanType())]
    )

    def adjust(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_by, kind="mergesort").reset_index(drop=True)
        ts = pdf[ts_col]
        if str(ts.dtype).startswith("datetime"):
            ts = ts.astype("int64")  # ns since epoch; gap compare is scale-free
        det, sc, forced = apply_gap_rule(
            ts.to_numpy(),
            pdf[det_col].to_numpy(),
            None if score_col is None else pdf[score_col].to_numpy(),
            max_back=max_back,
        )
        out = pdf.copy()
        out[det_col] = det.astype(pdf[det_col].dtype)
        if score_col is not None:
            out[score_col] = sc
        out["gap_forced"] = forced
        return out

    return df.groupBy(series_col).applyInPandas(adjust, schema=out_schema)


def f1_threshold_sweep(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    n_thresholds: int = 98,
    scale: float = 0.01,
    adjust: bool = False,
    order_by: list[str] | None = None,
    partition_by: str | None = None,
    delay: int = 7,
) -> DataFrame:
    """W18 — F1 at thresholds ``{scale, 2*scale, …}`` (evalue.py:163-176:
    98 thresholds × 0.01). One crossJoin with a 98-row literal frame (a
    broadcast by size), one groupBy(threshold).

    ``adjust=False`` computes point-wise F1 per threshold.  The reference
    sweep actually evaluates SEGMENT-ADJUSTED F1 at every threshold
    (evalue.py:163-176 → evaluate_for_all_series → get_range_proba), and
    the adjustment must run post-thresholding, per threshold — it cannot
    be composed in afterwards.  ``adjust=True`` reproduces that: the W16
    window pass runs over the threshold-crossjoined frame partitioned by
    (threshold, series), so each threshold is adjusted independently.
    Cost: the windowed frame is ``n_thresholds ×`` the input — fine for
    the stat-series frames this evaluates (windows × partitions, never
    raw documents).
    """
    spark = df.sparkSession
    th = spark.range(1, n_thresholds + 1).select(
        (F.col("id") * scale).alias("threshold")
    )
    scored = df.crossJoin(F.broadcast(th)).withColumn(
        "_pred", (F.col(score_col) > F.col("threshold")).cast("int")
    )
    if adjust:
        part = ["threshold"] + ([partition_by] if partition_by else [])
        scored = segment_adjust_predictions(
            scored, label_col, "_pred", order_by, part, delay
        )
        pred = F.col("adj_pred")
    else:
        pred = F.col("_pred")
    lab = F.col(label_col)
    agg = scored.groupBy("threshold").agg(
        F.sum(pred * lab).alias("tp"),
        F.sum(pred * (1 - lab)).alias("fp"),
        F.sum((1 - pred) * lab).alias("fn"),
    )
    denom = 2 * F.col("tp") + F.col("fp") + F.col("fn")
    # guard like variance_from_per_series: tp=fp=fn=0 (no positives and
    # no predictions at a threshold) is F1=0, not an ANSI DIVIDE_BY_ZERO
    f1 = F.when(denom > 0, 2 * F.col("tp") / denom).otherwise(F.lit(0.0))
    return agg.select("threshold", "tp", "fp", "fn", f1.alias("f1"))


def best_threshold(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    n_thresholds: int = 98,
    scale: float = 0.01,
    **sweep_kwargs,
) -> DataFrame:
    """W18 top-1: argmax-F1 threshold (ties → lowest threshold, matching
    the reference's strict ``>`` best-so-far scan in evalue.py:171-176).
    Pass ``adjust=True`` (plus series/order columns) for the reference's
    segment-adjusted sweep."""
    sweep = f1_threshold_sweep(
        df, score_col, label_col, n_thresholds, scale, **sweep_kwargs
    )
    return sweep.orderBy(F.col("f1").desc_nulls_last(), "threshold").limit(1)


def guided_threshold_sweep(
    df: DataFrame,
    score_col: str = "score",
    guide_col: str = "guide",
    label_col: str = "label",
    n_thresholds: int = 98,
    scale: float = 0.01,
    order_by: list[str] | None = None,
    partition_by: str | None = None,
    delay: int = 3,
    adjust: bool = True,
) -> DataFrame:
    """The Yahoo "guided threshold" protocol (srcnn/evalue.py:129-162):
    sweep thresholds scoring the detector's thresholded predictions
    against ANOTHER detector's binary predictions as pseudo-labels (the
    SR teacher in the reference, ``guide_col`` here) with the same
    segment-adjusted metric as the main sweep, take the argmax (strict
    ``>`` scan → lowest threshold wins ties, evalue.py:151-153), then
    report the confusion/F1 against the REAL ``label_col`` at that
    guided threshold (evalue.py:154-161).

    Returns one row: ``guided_threshold, tp, fp, fn, tn, precision,
    recall, f1``. Cost = one more crossJoin+groupBy over the sweep
    machinery; the guided best is a 1-row broadcast.
    """
    guided = best_threshold(
        df, score_col, guide_col, n_thresholds, scale,
        adjust=adjust, order_by=order_by, partition_by=partition_by,
        delay=delay,
    ).select(F.col("threshold").alias("guided_threshold"))
    scored = df.crossJoin(F.broadcast(guided)).withColumn(
        "_pred",
        (F.col(score_col) > F.col("guided_threshold")).cast("int"),
    )
    if adjust:
        part = ["guided_threshold"] + ([partition_by] if partition_by else [])
        scored = segment_adjust_predictions(
            scored, label_col, "_pred", order_by, part, delay
        )
        pred = F.col("adj_pred")
    else:
        pred = F.col("_pred")
    lab = F.col(label_col)
    agg = scored.groupBy("guided_threshold").agg(
        F.sum(pred * lab).alias("tp"),
        F.sum(pred * (1 - lab)).alias("fp"),
        F.sum((1 - pred) * lab).alias("fn"),
        F.sum((1 - pred) * (1 - lab)).alias("tn"),
    )

    def _safe(num, den):
        return F.when(den > 0, num / den).otherwise(F.lit(0.0))

    p = _safe(F.col("tp"), F.col("tp") + F.col("fp"))
    r = _safe(F.col("tp"), F.col("tp") + F.col("fn"))
    return agg.select(
        "guided_threshold", "tp", "fp", "fn", "tn",
        p.alias("precision"), r.alias("recall"),
        _safe(2 * p * r, p + r).alias("f1"),
    )


def per_series_best_threshold(
    df: DataFrame,
    series_col: str = "series_id",
    score_col: str = "score",
    label_col: str = "label",
    n_thresholds: int = 98,
    scale: float = 0.01,
    order_by: list[str] | None = None,
    delay: int = 7,
    adjust: bool = True,
) -> DataFrame:
    """Per-SERIES best-threshold sweep: each series gets its own argmax-F1
    threshold (segment-adjusted like the reference sweep; strict ``>``
    scan → lowest threshold on ties), the per-file analog of the
    reference's global sweep — the protocol behind its per-file saved
    scores (evalue.py saves per-file score arrays precisely so
    thresholds can be re-chosen per file).

    Returns ``(series, best_threshold, tp, fp, fn, f1)`` — one row per
    series. Shape: one crossJoin with the literal threshold frame, one
    groupBy(series, threshold), one per-series argmax window — all
    JVM-side.
    """
    order_by = order_by or ["ts"]
    spark = df.sparkSession
    th = spark.range(1, n_thresholds + 1).select(
        (F.col("id") * scale).alias("threshold")
    )
    scored = df.crossJoin(F.broadcast(th)).withColumn(
        "_pred", (F.col(score_col) > F.col("threshold")).cast("int")
    )
    if adjust:
        scored = segment_adjust_predictions(
            scored, label_col, "_pred", order_by,
            ["threshold", series_col], delay,
        )
        pred = F.col("adj_pred")
    else:
        pred = F.col("_pred")
    lab = F.col(label_col)
    agg = scored.groupBy(series_col, "threshold").agg(
        F.sum(pred * lab).alias("tp"),
        F.sum(pred * (1 - lab)).alias("fp"),
        F.sum((1 - pred) * lab).alias("fn"),
    )
    denom = 2 * F.col("tp") + F.col("fp") + F.col("fn")
    f1 = F.when(denom > 0, 2 * F.col("tp") / denom).otherwise(F.lit(0.0))
    ranked = agg.withColumn("f1", f1).withColumn(
        "_rk",
        F.row_number().over(
            Window.partitionBy(series_col).orderBy(
                F.col("f1").desc(), F.col("threshold")
            )
        ),
    )
    return (
        ranked.filter(F.col("_rk") == 1)
        .select(
            series_col,
            F.col("threshold").alias("best_threshold"),
            "tp", "fp", "fn", "f1",
        )
    )


def bi_range_adjust_np(predict, label, left: int, right: int):
    """Literal numpy port of the reference's BIDIRECTIONAL tolerance
    adjustment ``bi_get_range_proba`` (competition_metric.py:102-121):
    walking label rises left→right, a segment whose window
    ``[rise-left, rise+right]`` contains any ORIGINAL positive
    prediction is fully credited (run → 1, window cells copied from the
    labels — erasing stray predictions near the boundary); an undetected
    segment is fully zeroed. Sequential by construction (later windows
    overwrite earlier writes), so the distributed operator runs it per
    series inside one Arrow batch."""
    import numpy as np

    predict = list(predict)
    label = list(label)
    i = 1
    rs = predict[:]
    while i < len(label):
        if label[i] == 1 and label[i - 1] == 0:
            start = max(0, i - left)
            end = min(i + right + 1, len(label))
            if 1 in predict[start:end]:
                j = i
                while j < len(label) and label[j] == 1:
                    rs[j] = 1
                    j += 1
                i = j
                rs[start:end] = label[start:end]
            else:
                j = i
                while j < len(label) and label[j] == 1:
                    rs[j] = 0
                    j += 1
                i = j
        i += 1
    return np.asarray(rs, dtype=np.int64)


def bi_adjust_predictions(
    df: DataFrame,
    series_col: str = "series_id",
    label_col: str = "label",
    pred_col: str = "pred",
    order_by: list[str] | None = None,
    left: int = 7,
    right: int = 7,
) -> DataFrame:
    """Distributed ``bi_get_range_proba``: one ``applyInPandas`` group
    per series (the rule's window overwrites are order-dependent within
    a series — same shape as the W15 gap rule), predictions replaced by
    the bidirectionally-adjusted values plus ``bi_adj`` alias column.
    Output = input columns with ``pred_col`` adjusted."""
    import pandas as pd

    order_by = order_by or ["ts"]
    schema = df.schema

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_by, kind="mergesort").reset_index(drop=True)
        out = pdf.copy()
        adj = bi_range_adjust_np(
            pdf[pred_col].to_numpy(), pdf[label_col].to_numpy(), left, right
        )
        out[pred_col] = adj.astype(pdf[pred_col].dtype)
        return out

    return df.groupBy(series_col).applyInPandas(run, schema)


def dense_label_grid(
    df: DataFrame,
    ts_col: str = "ts",
    label_col: str = "label",
    partition_by: str | None = None,
) -> DataFrame:
    """W17 — reconstruct the dense min-interval grid per series
    (competition_metric.py:37-52): grid slot = ``(ts - t0) //
    min_interval`` — FLOOR division exactly as ``reconstruct_label``, so
    an observation whose offset is not an exact interval multiple still
    lands on its floored slot. (Two observations can never share a slot
    — that would need a pair closer than the minimum interval — but the
    aggregation is latest-by-timestamp for safety, matching numpy
    fancy-index assignment.) Unobserved slots are 0.
    Emits ``(partition, grid_ts, label)`` with ``grid_ts = t0 +
    slot*interval``. A single-observation series (no interval defined —
    the reference raises there) is emitted as its own one-row grid
    rather than silently dropped."""
    part = [partition_by] if partition_by else []
    w = Window.partitionBy(*part).orderBy(ts_col)
    with_prev = df.withColumn("_prev", F.lag(ts_col).over(w))
    bounds = with_prev.groupBy(*part).agg(
        F.unix_timestamp(F.min(ts_col)).alias("_u0"),
        F.unix_timestamp(F.max(ts_col)).alias("_u1"),
        F.min(
            F.when(
                F.col("_prev").isNotNull(),
                F.unix_timestamp(ts_col) - F.unix_timestamp("_prev"),
            )
        ).alias("_iv"),
    )
    # a single-observation series has no lag pair (_iv NULL):
    # sequence(0, NULL) is NULL and explode would silently drop the whole
    # series (the reference raises on min() of an empty gap list) — emit
    # the lone observation as its own grid row instead
    spine = bounds.select(
        *part,
        "_u0",
        "_iv",
        F.explode(
            F.when(
                F.col("_iv").isNotNull(),
                F.sequence(
                    F.lit(0).cast("long"),
                    F.expr("(_u1 - _u0) div _iv"),
                ),
            ).otherwise(F.array(F.lit(0).cast("long")))
        ).alias("_slot"),
    ).select(
        *part,
        "_slot",
        (F.col("_u0") + F.col("_slot") * F.coalesce(F.col("_iv"), F.lit(0)))
        .cast("timestamp")
        .alias("grid_ts"),
    )
    obs = (
        df.join(bounds.select(*part, "_u0", "_iv"), part) if part
        else df.crossJoin(bounds.select("_u0", "_iv"))
    )
    obs = obs.withColumn(
        "_slot",
        # NULL _iv (single-observation series): the lone point sits at
        # slot 0 of its one-row grid
        F.coalesce(
            F.expr(f"(unix_timestamp({ts_col}) - _u0) div _iv"),
            F.lit(0).cast("long"),
        ),
    ).groupBy(*part, "_slot").agg(
        F.max_by(label_col, F.col(ts_col)).alias("_obs")
    )
    on = part + ["_slot"]
    return spine.join(obs, on, "left").select(
        *part, "grid_ts", F.coalesce(F.col("_obs"), F.lit(0)).alias(label_col)
    )


def ranking_metrics(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    part_cols: list[str] | tuple[str, ...] = (),
) -> DataFrame:
    """Threshold-free ranking quality: exact ROC-AUC and average
    precision (PR-AUC, step definition) in ONE pass over the score
    counts cube — the sweep-free summary the W18 threshold-sweep family
    reports alongside.

    ``AUC = P(score⁺ > score⁻) + ½·P(score⁺ = score⁻)`` — the
    Mann-Whitney U form. On the (score → pos, neg) counts cube it is
    ``Σ_v pos_v·(2·neg_below_v + neg_v) / (2·P·N)`` where ``neg_below``
    is the EXCLUSIVE running negative count in ascending-score order:
    the numerator is an exact decimal(38,0) integer (ties contribute the
    half via the doubled form — no 0.5 float anywhere), so AUC is ONE
    final double division — partitioning-independent, SQL-reproducible.
    All-tied scores give exactly 0.5; P=0 or N=0 gives NULL.

    ``average_precision = (1/P)·Σ_v pos_v · tp_v/(tp_v+fp_v)`` over
    DESCENDING distinct scores with INCLUSIVE cumulative tp/fp —
    sklearn's step-interpolation AP evaluated at tie-group granularity.
    Per-group precision is rational with a varying denominator, so each
    term is micro-quantized before the exact integer sum (the repo's
    cross-engine float contract — same as the chi-square path).

    Rows with NULL label, or NULL/NaN score, are excluded (profile
    completeness separately). ``label_col`` must be 0/1 (boolean casts).

    Scale shape: everything after the first aggregation is
    O(#partitions × distinct scores); the windows partition by
    ``part_cols`` (continuous scores at 10^12 rows: quantize scores
    first — same caveat as the KS drift path).

    Output: (*part_cols, auc, average_precision, n_pos, n_neg,
    n_scores).
    """
    part = list(part_cols)
    dec = "decimal(38,0)"
    lab = F.col(label_col).cast("int")
    cube = (
        df.filter(
            F.col(label_col).isNotNull()
            & F.col(score_col).isNotNull()
            & ~F.isnan(F.col(score_col).cast("double"))
        )
        .groupBy(*part, F.col(score_col).alias("_s"))
        .agg(
            F.sum(lab).cast(dec).alias("_pos"),
            (F.count(F.lit(1)) - F.sum(lab)).cast(dec).alias("_neg"),
        )
    )
    asc = Window.partitionBy(*part).orderBy(F.col("_s").asc())
    desc = Window.partitionBy(*part).orderBy(F.col("_s").desc())
    cube = (
        cube.withColumn(
            "_neg_below",
            F.coalesce(
                F.sum("_neg").over(
                    asc.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0).cast(dec),
            ),
        )
        .withColumn(
            "_tp",
            F.sum("_pos").over(
                desc.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .withColumn(
            "_fp",
            F.sum("_neg").over(
                desc.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    # AP term: pos_v * tp_v / (tp_v + fp_v), micro-quantized (pinned
    # double order; tp+fp >= pos >= 0, and the term is 0 when pos is 0)
    ap_micro = F.when(F.col("_pos") > 0, F.round(
        (F.col("_pos").cast("double") * F.col("_tp").cast("double"))
        / (F.col("_tp") + F.col("_fp")).cast("double")
        * F.lit(1e6),
        0,
    ).cast(dec)).otherwise(F.lit(0).cast(dec))
    agg = cube.groupBy(*part).agg(
        F.sum(
            F.col("_pos")
            * (F.lit(2).cast(dec) * F.col("_neg_below") + F.col("_neg"))
        ).cast(dec).alias("_num2"),
        F.sum(ap_micro).cast(dec).alias("_ap_sum"),
        F.sum("_pos").cast(dec).alias("_P"),
        F.sum("_neg").cast(dec).alias("_N"),
        F.count(F.lit(1)).alias("n_scores"),
    )
    pn2 = (F.lit(2).cast(dec) * F.col("_P") * F.col("_N")).cast("double")
    defined = (F.col("_P") > 0) & (F.col("_N") > 0)
    return agg.select(
        *part,
        F.when(defined, F.col("_num2").cast("double") / pn2)
        .otherwise(F.lit(None).cast("double"))
        .alias("auc"),
        F.when(
            F.col("_P") > 0,
            F.col("_ap_sum").cast("double")
            / F.lit(1e6)
            / F.col("_P").cast("double"),
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("average_precision"),
        F.col("_P").cast("long").alias("n_pos"),
        F.col("_N").cast("long").alias("n_neg"),
        "n_scores",
    )
