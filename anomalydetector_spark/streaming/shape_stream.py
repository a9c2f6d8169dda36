"""Streaming shape drift: JS divergence of the per-window lang
distribution vs the previous window, over a STREAM of finalized stat
windows (the stage-1 output of ``streaming_window_stats``).

Ordering: stage 1 FINALIZES windows in event-time order, but its commit
writes several unordered part files and the stage-2 file source replays
them in discovery order — so windows arrive NEAR-sorted, not sorted.
State per partition is therefore a small reorder BUFFER (the last
``buffer_windows`` window vectors, each len(langs)+1 floats) plus the
emitted-window LEDGER (every emitted window's timestamp, 8 bytes each):
a window's divergence is emitted in whatever micro-batch first sees BOTH
the window and its predecessor, exactly once — the ledger outlives the
vector buffer, so even a stage-1 restart that replays windows far older
than the buffer horizon cannot double-emit. A window whose predecessor
never arrives inside the buffer horizon is skipped, the same
omit-after-gap semantics as the batch operator (operators/divergence.py).

Granularity note: the streaming distribution is BUCKETED to the
configured ``langs`` plus an ``other`` residual mass (1 − Σ fracs,
clipped at 0), because stage 1 only emits fractions for the configured
list — a shift between two unlisted languages is invisible here (it
lands inside ``other``). The batch operator sees every observed
category; when all traffic is within the configured list the two produce
identical values (pinned by test).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

DEFAULT_LANGS = ("en", "de", "fr", "zh", "es")

_UNIT_US = {
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
    "week": 7 * 86_400_000_000,
}

# state = a bounded reorder buffer of window vectors (timestamps +
# probability vectors flattened row-major, n_windows × n_cats) PLUS the
# emitted-window ledger: every emitted window's timestamp, 8 bytes each,
# retained far beyond the vector buffer so a fresh-checkpoint stage-1
# restart that replays ancient windows cannot double-emit them (a decade
# of daily windows is ~29 KB; the ledger is capped at EMITTED_RETENTION
# newest entries as a pathological-granularity backstop).
# STATE SCHEMA v2: the per-buffer-slot emitted flags became the ledger.
# The explicit ``version`` field exists purely to make a v1 checkpoint
# fail LOUDLY on resume: Spark's state-schema compatibility check
# compares field TYPES only, and v1's flags column was also array<long>
# — without the extra field a v1 checkpoint would resume silently,
# its 0/1 flags misread as ledger timestamps, and already-emitted
# buffered windows would double-emit. The field-count mismatch forces
# the rejection the upgrade needs; re-drive stage 2 from the stat
# parquet (the source of truth) with a fresh checkpoint.
DIV_STATE_SCHEMA = StructType(
    [
        StructField("version", LongType()),
        StructField("ts_us", ArrayType(LongType())),
        StructField("probs_flat", ArrayType(DoubleType())),
        StructField("emitted_ts", ArrayType(LongType())),
    ]
)

STATE_VERSION = 2

EMITTED_RETENTION = 1_000_000

DIV_SCHEMA = (
    "partition_key string, window_start timestamp, "
    "js_divergence double, tvd double"
)


def _duration_us(duration: str) -> int:
    """Multi-unit duration strings Spark accepts ('1 day 12 hours')."""
    parts = duration.strip().split()
    if len(parts) % 2 != 0 or not parts:
        raise ValueError(f"cannot parse window duration {duration!r}")
    total = 0
    for n, unit in zip(parts[::2], parts[1::2]):
        total += int(n) * _UNIT_US[unit.rstrip("s").lower()]
    return total


def _make_div_fn(
    langs: tuple[str, ...], duration_us: int, buffer_windows: int
):
    import numpy as np

    frac_cols = [f"lang_frac_{l}" for l in langs]
    n_cats = len(langs) + 1

    def fn(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf[pdf["stat_name"].isin(frac_cols)]
        out = []
        if not pdf.empty:
            wide = (
                pdf.pivot_table(
                    index="window_start",
                    columns="stat_name",
                    values="value",
                    aggfunc="last",
                )
                .reindex(columns=frac_cols)
                .sort_index()
            )
            # stage 1 unpivots one wide row per window, so a window's
            # fracs always land in one micro-batch — a missing column
            # would mean corrupt input; fail loud rather than renormalize
            if wide.isna().any().any():
                raise ValueError(
                    f"incomplete lang_frac window rows for key {key}"
                )
            probs = wide.to_numpy(dtype="float64")
            other = np.clip(1.0 - probs.sum(axis=1), 0.0, None)
            probs = np.column_stack([probs, other])
            ts_us = (
                wide.index.astype("datetime64[us]").astype("int64").to_numpy()
            )

            buf: dict[int, object] = {}
            emitted: set[int] = set()
            if state.exists:
                _ver, s_ts, s_flat, s_em = state.get
                vecs = np.asarray(s_flat, dtype="float64").reshape(
                    len(s_ts), n_cats
                )
                buf = {int(t): vecs[i] for i, t in enumerate(s_ts)}
                emitted = {int(t) for t in s_em}
            for i, t in enumerate(ts_us):
                # finalized windows are immutable — keep the first copy
                buf.setdefault(int(t), probs[i])

            for t in sorted(buf):
                prev = buf.get(t - duration_us)
                # the ledger (not a buffer-slot flag) decides emission, so
                # a stage-1 restart replaying windows OLDER than the
                # vector buffer horizon still cannot double-emit them
                if t in emitted or prev is None:
                    continue
                p, q = buf[t], prev
                m = (p + q) / 2.0
                with np.errstate(divide="ignore", invalid="ignore"):
                    js = 0.5 * np.where(
                        p > 0, p * np.log2(np.divide(p, m, where=m > 0)), 0.0
                    ).sum() + 0.5 * np.where(
                        q > 0, q * np.log2(np.divide(q, m, where=m > 0)), 0.0
                    ).sum()
                out.append(
                    (
                        key[0],
                        pd.Timestamp(t, unit="us"),
                        float(js),
                        float(np.abs(p - q).sum() / 2.0),
                    )
                )
                emitted.add(t)

            kept = sorted(buf)[-buffer_windows:]
            ledger = sorted(emitted)[-EMITTED_RETENTION:]
            state.update(
                (
                    STATE_VERSION,
                    [int(t) for t in kept],
                    [float(x) for t in kept for x in buf[t]],
                    [int(t) for t in ledger],
                )
            )
        yield pd.DataFrame(
            out,
            columns=["partition_key", "window_start", "js_divergence", "tvd"],
        )

    return fn


def js_divergence_stream(
    stat_series_stream: DataFrame,
    window_duration: str = "1 day",
    langs: tuple[str, ...] = DEFAULT_LANGS,
    buffer_windows: int = 64,
) -> DataFrame:
    """Shape-drift scores from a stream of finalized stat windows (the
    long-format output of :func:`streaming_window_stats`): one row per
    contiguous (previous, current) window pair per partition, emitted
    exactly once when both windows have arrived."""
    return stat_series_stream.groupBy("partition_key").applyInPandasWithState(
        _make_div_fn(
            tuple(langs), _duration_us(window_duration), buffer_windows
        ),
        outputStructType=DIV_SCHEMA,
        stateStructType=DIV_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
