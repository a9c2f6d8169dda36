"""Streaming top-k churn: heavy-hitter SET stability between
consecutive finalized windows — the membership drift lens as a stream,
value-equal to the batch :func:`~anomalydetector_spark.operators.
divergence.topk_churn` on the same windows.

Two stages, storage-chained like every stage-2 drift stream here:

1. :func:`streaming_window_topk` — ONE watermarked windowed
   aggregation: per (window, partition) the count of each CONFIGURED
   candidate category (fixed aggregate expressions — a streaming query
   cannot chain a per-category aggregation under a per-window one),
   then the deterministic in-row top-k (``(n desc, cat asc)`` struct
   sort — the batch operator's exact tie-break). Like the shape
   stream's lang bucketing, the candidate list bounds the open
   category set: a category outside it is invisible (document the
   candidates as you would a histogram's bins).
2. :func:`topk_churn_stream` — the consecutive-window pair machine,
   string-vector edition: the reorder buffer holds each window's top-k
   ARRAY, the emitted-window ledger guarantees exactly-once across
   replays (same contract as ``pairs.window_pairs``, which is
   double-vector only), and each pair emits the exact integer set
   comparison with ONE final division.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from anomalydetector_spark.streaming.pairs import (
    EMITTED_RETENTION,
    duration_us as _duration_us,
)

CHURN_STATE_SCHEMA = StructType(
    [
        StructField("version", LongType()),
        StructField("ts_us", ArrayType(LongType())),
        StructField("sets_flat", ArrayType(StringType())),
        StructField("set_lens", ArrayType(LongType())),
        StructField("emitted_ts", ArrayType(LongType())),
    ]
)

STATE_VERSION = 1

CHURN_SCHEMA = (
    "partition_key string, window_start timestamp, jaccard double, "
    "n_kept bigint, n_new bigint, n_dropped bigint, "
    "k_cur bigint, k_prev bigint"
)


def streaming_window_topk(
    stream: DataFrame,
    cat_col: str,
    candidates: list[str] | tuple[str, ...],
    k: int = 10,
    window_duration: str = "1 day",
    watermark_delay: str | None = "2 days",
    partition_by: str | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """One finalized row per (window, partition): ``(partition_key,
    window_start, topk array<string>)`` — the deterministic top-k of
    the CONFIGURED candidate categories by count (``n desc, cat asc``;
    zero-count candidates never enter the set)."""
    part = (
        F.lit("global")
        if partition_by is None
        else F.col(partition_by).cast("string")
    )
    src = (
        stream.withWatermark(ts_col, watermark_delay)
        if watermark_delay is not None
        else stream
    )
    aggs = [
        F.sum((F.col(cat_col) == c).cast("long")).alias(f"_c{i}")
        for i, c in enumerate(candidates)
    ]
    agg = src.withColumn("partition_key", part).groupBy(
        F.window(F.col(ts_col), window_duration).alias("w"),
        "partition_key",
    ).agg(*aggs)
    # in-row deterministic top-k: sort (-n, cat) structs, slice, strip
    entries = F.array(
        *[
            F.struct(
                (-F.col(f"_c{i}")).alias("neg_n"),
                F.lit(c).alias("cat"),
                F.col(f"_c{i}").alias("n"),
            )
            for i, c in enumerate(candidates)
        ]
    )
    topk = F.slice(
        F.filter(F.array_sort(entries), lambda e: e["n"] > 0),
        1,
        k,
    )
    return agg.select(
        "partition_key",
        F.col("w.start").alias("window_start"),
        F.transform(topk, lambda e: e["cat"]).alias("topk"),
    )


def _make_churn_fn(dur_us: int, buffer_windows: int):
    def fn(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        new = pd.concat(list(pdfs), ignore_index=True)
        buf: dict[int, list] = {}
        emitted: set[int] = set()
        if state.exists:
            _ver, s_ts, s_flat, s_lens, s_em = state.get
            pos = 0
            for t, ln in zip(s_ts, s_lens):
                buf[int(t)] = list(s_flat[pos : pos + int(ln)])
                pos += int(ln)
            emitted = {int(t) for t in s_em}
        ts_us = (
            new["window_start"].astype("datetime64[us]").astype("int64")
        )
        for t, cats in zip(ts_us.tolist(), new["topk"].tolist()):
            buf.setdefault(int(t), list(cats))

        rows = []
        for t in sorted(buf):
            prev = buf.get(t - dur_us)
            if t in emitted or prev is None:
                continue
            cur_set, prev_set = set(buf[t]), set(prev)
            kept = len(cur_set & prev_set)
            new_n = len(cur_set - prev_set)
            dropped = len(prev_set - cur_set)
            union = kept + new_n + dropped
            rows.append(
                (
                    t,
                    float(kept) / float(union) if union else None,
                    kept, new_n, dropped,
                    kept + new_n, kept + dropped,
                )
            )
            emitted.add(t)

        kept_ts = sorted(buf)[-buffer_windows:]
        ledger = sorted(emitted)[-EMITTED_RETENTION:]
        state.update(
            (
                STATE_VERSION,
                [int(t) for t in kept_ts],
                [c for t in kept_ts for c in buf[t]],
                [len(buf[t]) for t in kept_ts],
                [int(t) for t in ledger],
            )
        )
        if not rows:
            return iter(())
        out = pd.DataFrame(
            rows,
            columns=[
                "_ts", "jaccard", "n_kept", "n_new", "n_dropped",
                "k_cur", "k_prev",
            ],
        )
        out.insert(0, "partition_key", key[0])
        out["window_start"] = pd.to_datetime(out.pop("_ts"), unit="us")
        out = out[
            [
                "partition_key", "window_start", "jaccard", "n_kept",
                "n_new", "n_dropped", "k_cur", "k_prev",
            ]
        ]
        return iter((out,))

    return fn


def topk_churn_stream(
    topk_stream: DataFrame,
    window_duration: str = "1 day",
    buffer_windows: int = 8,
) -> DataFrame:
    """Consecutive-window churn over a STREAM of finalized top-k rows
    (:func:`streaming_window_topk` output). Exactly-once via the
    emitted-window ledger; a window whose predecessor never arrives
    inside the buffer horizon is skipped — the batch operator's
    omit-after-gap semantics."""
    dur = _duration_us(window_duration)
    return topk_stream.groupBy("partition_key").applyInPandasWithState(
        _make_churn_fn(dur, buffer_windows),
        outputStructType=CHURN_SCHEMA,
        stateStructType=CHURN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
