"""Exact substring-span deduplication (repeated n-token windows).

The dedup families in ``dedup.py`` operate at document granularity
(exact hash, MinHash/LSH, SimHash, n-gram Jaccard). Training-data
pipelines also need SPAN granularity: find every n-token window whose
exact text recurs (within a document or across the corpus) — the
"repeated 50-token span" rule of substring-level dedup used by modern
LM corpus builders. A literal suffix array does not distribute; the
standard scale reformulation is rolling-window hashing:

1. tokenize in-row (whitespace),
2. emit ``(doc_id, pos, xxhash64(window text))`` for every window of
   ``n`` tokens at the given stride — text never leaves the row; only
   16-byte hash tuples are exploded,
3. one groupBy(span_hash) counts occurrences (map-side partial agg),
4. duplicated hashes equi-join back to positions,
5. per-document interval merge (a per-doc window over pos) turns
   overlapping flagged windows into disjoint covered ranges, giving an
   exact duplicated-token fraction per document.

At 100 TB: the explode multiplies row count by ~tokens/stride but each
emitted row is (long, int, long); the only shuffles are the hash
groupBy and the hash equi-join, both AQE-coalescible; the interval
merge partitions per document (bounded by document length, same skew
envelope as every other per-doc op here). Raising ``stride`` trades
recall granularity for a proportional cost cut.

The DuckDB oracle reproduces the same grouping over the span TEXT
(hash-collision-free), so parity also certifies that xxhash64 grouping
introduced no collision at test scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from anomalydetector_spark.functions import tokens


def span_hashes(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 20,
    stride: int = 1,
) -> DataFrame:
    """One row per n-token window: ``(id_col, pos, span_hash)``.

    ``pos`` is the 0-based token offset of the window start. Documents
    shorter than ``n`` tokens emit nothing. All expressions are JVM
    codegen; the window text exists only transiently inside the
    ``transform`` lambda and is hashed before the explode."""
    toks = tokens(F.col(text_col))
    # sequence() throws on inverted bounds, so guard short docs with an
    # empty array rather than a filter (keeps this a pure projection).
    starts = F.when(
        F.size(toks) >= n,
        F.sequence(F.lit(0), F.size(toks) - n, F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    spans = F.transform(
        starts,
        lambda i: F.struct(
            i.cast("int").alias("pos"),
            F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, n))).alias(
                "span_hash"
            ),
        ),
    )
    return (
        df.select(F.col(id_col), F.explode(spans).alias("s"))
        .select(id_col, F.col("s.pos").alias("pos"), F.col("s.span_hash").alias("span_hash"))
    )


def duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 20,
    stride: int = 1,
    scope: str = "global",
) -> DataFrame:
    """Every window position whose span text recurs.

    ``scope='global'`` flags any span occurring more than once in the
    corpus (within-doc repeats count — the substring-dedup rule);
    ``scope='cross_doc'`` requires the span in at least two distinct
    documents (decontamination-style). Returns
    ``(id_col, pos, span_hash, occurrences, n_docs)``.

    The group table is aggregated before the join-back, so the equi-join's
    build side holds one row per duplicated hash, not per occurrence."""
    if scope not in ("global", "cross_doc"):
        raise ValueError(f"scope must be 'global' or 'cross_doc', got {scope!r}")
    hashes = span_hashes(df, text_col, id_col, n=n, stride=stride)
    groups = hashes.groupBy("span_hash").agg(
        F.count(F.lit(1)).alias("occurrences"),
        F.countDistinct(id_col).alias("n_docs"),
    )
    dup = groups.filter(
        F.col("occurrences") > 1 if scope == "global" else F.col("n_docs") > 1
    )
    return hashes.join(dup, "span_hash").select(
        id_col, "pos", "span_hash", "occurrences", "n_docs"
    )


def substring_dedup_profile(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 20,
    stride: int = 1,
    scope: str = "global",
    max_dup_fraction: float = 0.2,
) -> DataFrame:
    """Per-document duplicated-token coverage with interval merge.

    Overlapping flagged windows (a repeated phrase of m > n tokens flags
    m-n+1 windows at stride 1) are merged into disjoint ``[pos, pos+n)``
    ranges via a per-document running-max window, so ``dup_tokens`` is
    the EXACT count of tokens inside any duplicated span. Emits every
    document (zero coverage included) with
    ``(id_col, dup_span_count, dup_tokens, total_tokens,
    dup_token_fraction, keep)`` where ``keep`` applies the
    ``max_dup_fraction`` gate."""
    dup = duplicated_spans(df, text_col, id_col, n=n, stride=stride, scope=scope)
    w = Window.partitionBy(id_col).orderBy("pos")
    prev_max_end = F.max(F.col("pos") + n).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = dup.withColumn(
        "new_island",
        F.when(F.col("pos") >= F.coalesce(prev_max_end, F.lit(-1)), 1).otherwise(0),
    ).withColumn("island", F.sum("new_island").over(w))
    per_island = islands.groupBy(id_col, "island").agg(
        F.min("pos").alias("start"),
        (F.max("pos") + n).alias("end"),
        F.count(F.lit(1)).alias("spans"),
    )
    per_doc = per_island.groupBy(id_col).agg(
        F.sum("spans").alias("dup_span_count"),
        F.sum(F.col("end") - F.col("start")).alias("dup_tokens"),
    )
    totals = df.select(
        F.col(id_col), F.size(tokens(F.col(text_col))).alias("total_tokens")
    )
    out = totals.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("dup_span_count", F.lit(0)).alias("dup_span_count"),
        F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
        "total_tokens",
        F.round(
            F.coalesce("dup_tokens", F.lit(0))
            / F.greatest("total_tokens", F.lit(1)),
            6,
        ).alias("dup_token_fraction"),
    )
    return out.withColumn(
        "keep", F.col("dup_token_fraction") <= max_dup_fraction
    )


def drop_duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 20,
    stride: int = 1,
    min_occurrences: int = 2,
    strategy: str = "window",
) -> DataFrame:
    """Remove every duplicated n-token span, keeping the FIRST corpus
    occurrence — the exact-substring-dedup REMOVAL rule of Lee et al.
    2022 ("Deduplicating Training Data Makes Language Models Better",
    public), reformulated from suffix arrays to distributed rolling-hash
    windows.

    "First" is the occurrence with the smallest ``(id_col, pos)`` pair
    (a total, deterministic order — ``id_col`` must be unique per
    document); every other occurrence of a span seen
    ``min_occurrences``+ times has its ``[pos, pos+n)`` token window
    removal-marked. Overlapping marks are merged per document
    (running-max island window), the covered tokens are dropped IN-ROW
    with an index higher-order filter, and the surviving tokens are
    re-joined with single spaces.

    Returns ``(id_col, text_col, dropped_tokens, total_tokens)`` for
    EVERY input document — untouched docs keep their original text
    byte-for-byte (no whitespace canonicalization unless something was
    actually removed; rebuilt docs are whitespace-collapsed by
    construction, the standard cost of token-level dedup).

    Scale shape — document text never crosses a shuffle boundary, the
    same contract as ``drop_boilerplate_lines``; two strategies for the
    keep-first marking, measured at 1M pages (BENCH.md):

    * ``strategy='window'`` (default, ~1.5× faster): ONE shuffle of the
      (id, pos, 8-byte hash) tuples — count + row_number over the
      span-hash partition mark non-first occurrences in the same pass
      the hashes are computed, so the tokenize+hash projection runs
      once. A span duplicated k times sorts k tuples in one task, so a
      hyper-duplicated boilerplate span (10^8+ occurrences) serializes
      that group; fine for ordinary corpora.
    * ``strategy='join'``: skew-robust — occurrence counts and the
      first occurrence come from a partial-aggregating groupBy (hot
      spans collapse map-side), and the join-back is an equi-join AQE
      skew-splits. Costs a second tokenize+hash pass (the frame feeds
      two plan branches) and a third shuffle.

    Either way the removal-range frame (docs with removals only) joins
    back onto the original scan (AQE broadcasts it when it fits) and
    removal is an in-row higher-order filter over the token array."""
    if strategy not in ("window", "join"):
        raise ValueError(
            f"strategy must be 'window' or 'join', got {strategy!r}"
        )
    hashes = span_hashes(df, text_col, id_col, n=n, stride=stride)
    if strategy == "window":
        wh = Window.partitionBy("span_hash")
        marked = (
            hashes.withColumn("_occ", F.count(F.lit(1)).over(wh))
            .withColumn(
                "_rn", F.row_number().over(wh.orderBy(id_col, "pos"))
            )
            .filter(
                (F.col("_occ") >= min_occurrences) & (F.col("_rn") > 1)
            )
        )
    else:
        groups = hashes.groupBy("span_hash").agg(
            F.count(F.lit(1)).alias("occurrences"),
            F.min(F.struct(id_col, "pos")).alias("_first"),
        )
        dup = groups.filter(F.col("occurrences") >= min_occurrences)
        marked = hashes.join(dup, "span_hash").filter(
            ~(
                (F.col(id_col) == F.col(f"_first.{id_col}"))
                & (F.col("pos") == F.col("_first.pos"))
            )
        )
    w = Window.partitionBy(id_col).orderBy("pos")
    prev_max_end = F.max(F.col("pos") + n).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = marked.withColumn(
        "new_island",
        F.when(F.col("pos") >= F.coalesce(prev_max_end, F.lit(-1)), 1).otherwise(0),
    ).withColumn("island", F.sum("new_island").over(w))
    ranges = (
        islands.groupBy(id_col, "island")
        .agg(F.min("pos").alias("start"), (F.max("pos") + n).alias("end"))
        .groupBy(id_col)
        .agg(
            F.collect_list(F.struct("start", "end")).alias("_drop"),
        )
    )
    toks = tokens(F.col(text_col))
    kept = F.filter(
        toks,
        lambda t, i: ~F.exists(
            F.col("_drop"),
            lambda r: (i >= r["start"]) & (i < r["end"]),
        ),
    )
    return (
        df.join(ranges, id_col, "left")
        .select(
            id_col,
            F.when(F.col("_drop").isNull(), F.col(text_col))
            .otherwise(F.array_join(kept, " "))
            .alias(text_col),
            F.when(
                F.col("_drop").isNull(), F.lit(0)
            ).otherwise(F.size(toks) - F.size(kept)).alias("dropped_tokens"),
            F.size(toks).alias("total_tokens"),
        )
    )
