"""Streaming drift pipeline: watermarked window stats → stateful SR.

Design notes (scale-first):

* Stage 1 is a standard streaming windowed aggregation — state is one row
  per open (window, partition), bounded by the watermark, and partial
  aggregation happens map-side exactly as in batch. ``percentile`` /
  sketch stats are deliberately absent here: count-shaped stats keep the
  state store rows tiny; quantile drift stays a batch concern (the batch
  engine's counts cube).

* Stage 2 keys state by (partition_key, stat_name) — cardinality is
  partitions × stats, NOT documents — and stores the whole finalized
  window series (one float per window: years of daily windows fit in a
  few KB). Each micro-batch appends the newly finalized windows and
  re-runs the reference SR kernel over the full series, emitting scores
  for the new windows only (append semantics, safe for file sinks).

The two stages chain through storage (parquet dir or any table), which
is also the natural resume/lineage boundary: stage 2 can be torn down
and re-driven from the stat-series table at any time.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from anomalydetector_spark.kernel.sr import MIN_POINTS, SrParams, sr_detect

DEFAULT_LANGS = ("en", "de", "fr", "zh", "es")

# state: the series so far, as epoch-micros + values (append-only arrays)
STAT_STATE_SCHEMA = StructType(
    [
        StructField("ts_us", ArrayType(LongType())),
        StructField("vals", ArrayType(DoubleType())),
    ]
)

SCORED_SCHEMA = (
    "partition_key string, stat_name string, window_start timestamp, "
    "value double, mag double, score double, is_anomaly boolean"
)


def streaming_window_stats(
    pages_stream: DataFrame,
    window_duration: str = "1 day",
    watermark_delay: str = "2 days",
    partition_by: str | None = None,
    langs: tuple[str, ...] = DEFAULT_LANGS,
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Watermarked tumbling-window stats in LONG format (same shape as the
    batch stat series, so the SR stage and all batch tooling are shared).

    In ``append`` output mode a window's row is emitted exactly once,
    when the watermark passes its end — i.e. each emitted row is a
    FINALIZED window, the streaming analog of the batch cube rollup.
    """
    part = (
        F.lit("global")
        if partition_by is None
        else F.col(partition_by).cast("string")
    )
    aggs = [
        F.count(F.lit(1)).cast("double").alias("doc_count"),
        F.avg(F.col("text").isNull().cast("double")).alias("null_rate"),
        F.avg(F.length("text")).alias("avg_len"),
        F.approx_count_distinct("url").cast("double").alias("approx_distinct_url"),
    ]
    for lang in langs:
        aggs.append(
            F.avg((F.col("lang") == lang).cast("double")).alias(f"lang_frac_{lang}")
        )
    wide = (
        pages_stream.withWatermark(ts_col, watermark_delay)
        .withColumn("partition_key", part)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("w"), "partition_key")
        .agg(*aggs)
        .withColumn("window_start", F.col("w.start"))
        .drop("w")
    )
    stat_cols = [
        c for c in wide.columns if c not in ("partition_key", "window_start")
    ]
    return wide.unpivot(
        ids=["partition_key", "window_start"],
        values=stat_cols,
        variableColumnName="stat_name",
        valueColumnName="value",
    ).select("partition_key", "stat_name", "window_start", "value")


def _make_scorer(params: SrParams):
    import numpy as np

    def score(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        new = pd.concat(list(pdfs), ignore_index=True)
        new = new.sort_values("window_start")
        new_us = (
            new["window_start"].astype("datetime64[us]").astype("int64").tolist()
        )
        new_vals = new["value"].astype(float).tolist()

        if state.exists:
            ts_us, vals = state.get
            ts_us, vals = list(ts_us), list(vals)
        else:
            ts_us, vals = [], []
        # windows may be re-emitted on replay; last-write-wins by ts
        merged = dict(zip(ts_us, vals))
        n_before_keys = set(merged)
        merged.update(zip(new_us, new_vals))
        items = sorted(merged.items())
        ts_all = [t for t, _ in items]
        vals_all = [v for _, v in items]
        state.update((ts_all, vals_all))

        fresh = [t for t in new_us if t not in n_before_keys]
        if not fresh or len(ts_all) < MIN_POINTS:
            # not enough history yet — emit nothing; the series stays in
            # state and scoring starts once MIN_POINTS windows finalize
            # (reference contract: spectral_residual.py:49, constants.py:3)
            return iter(())

        ts_arr = np.array(ts_all, dtype="datetime64[us]")
        res = sr_detect(ts_arr, np.asarray(vals_all, dtype=float), params)
        out = pd.DataFrame(
            {
                "partition_key": key[0],
                "stat_name": key[1],
                "window_start": res["timestamp"],
                "value": res["value"],
                "mag": res["mag"],
                "score": res["score"],
                "is_anomaly": res["isAnomaly"],
            }
        )
        fresh_set = set(fresh)
        out = out[
            out["window_start"]
            .astype("datetime64[us]")
            .astype("int64")
            .isin(fresh_set)
        ]
        return iter((out,))

    return score


def sr_score_stream(
    stat_series_stream: DataFrame, params: SrParams | None = None
) -> DataFrame:
    """SR-score a STREAM of finalized stat windows.

    State per (partition_key, stat_name) is the full series so far; each
    micro-batch appends its windows, re-scores the series with the
    reference kernel, and appends scores for the new windows. No timeout:
    a stat series lives as long as the table does (state size is
    windows-count floats — decades of daily windows per key stay < 1 MB).
    """
    p = params or SrParams()
    return stat_series_stream.groupBy("partition_key", "stat_name").applyInPandasWithState(
        _make_scorer(p),
        outputStructType=SCORED_SCHEMA,
        stateStructType=STAT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
