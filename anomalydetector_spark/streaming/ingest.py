"""Streaming ingest dedup: exactly-once url-keyed deduplication.

A continuously-crawled pages stream re-delivers urls — crawler retries,
source replays, at-least-once delivery from the upstream queue. Letting
those duplicates through inflates every downstream count and double-
counts pages in the window stats the drift detector scores. This stage
drops them AT INGEST with Spark's watermark-bounded streaming dedup
(`dropDuplicatesWithinWatermark`): the first arrival of a key within a
watermark window survives, every re-delivery inside the window drops,
and the key's dedup state is evicted once the watermark passes — state
is bounded by (keys per watermark window), not by stream lifetime.

Semantics at web scale, deliberately:

* Within-watermark re-deliveries (the operational failure mode this
  exists for) are removed exactly once; the surviving row is checkpointed
  in the state store, so task retries and query restarts do NOT change
  which copy survives (exactly-once on the output sink).
* A url re-crawled in a LATER window (beyond the watermark) is a new
  observation and passes — cross-snapshot uniqueness is a data property,
  not an ingest artifact, and stays the job of the batch uniqueness
  check / Theta-sketch churn monitor which can see the whole table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_ingest_stream(
    pages_stream: DataFrame,
    key_cols: tuple[str, ...] = ("url",),
    ts_col: str = "warc_ts",
    watermark_delay: str = "2 days",
) -> DataFrame:
    """Drop re-delivered rows keyed by ``key_cols`` within the watermark.

    Chain this BEFORE :func:`streaming_window_stats` (same query — the
    dedup is not an aggregation, so Spark allows the windowed agg after
    it) so duplicates never reach doc counts or distinct-url stats.
    """
    return pages_stream.withWatermark(
        ts_col, watermark_delay
    ).dropDuplicatesWithinWatermark(list(key_cols))
