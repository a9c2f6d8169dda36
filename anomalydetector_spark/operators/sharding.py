"""Token-balanced corpus sharding — the write-side twin of sequence
packing: assign every document to an output shard so that each shard
carries ~``budget_tokens`` tokens (training-data shards are consumed by
token count, not by row count — equal-row shards give wildly unequal
step counts when doc lengths are skewed).

The assignment is a GLOBAL GREEDY PREFIX over a deterministic total
order: walk the corpus in order, cut a new shard each time the running
token total crosses a multiple of the budget (``shard =
floor(tokens_before / budget)``). A shard's mass is therefore ≤ budget +
one document (the boundary-crossing doc stays in the shard where it
started — same convention as ``sampling.token_budget_cap``).

The total order is the HASH order ``(U(id, seed), id)`` — the same
deterministic shuffle the sampling operators use. For training shards
that is the order you WANT (a reproducible corpus shuffle, so shard k
is an unbiased slice); it is also what makes the whole assignment a
pure function of (ids, token counts, budget, seed): retry-stable,
cluster-size-independent, and replayable by a SQL oracle.

Distributed prefix-sum, NOT a global window: a single
``Window.orderBy(u)`` over 10^12 rows serializes the corpus through one
task. Instead:

1. bucket each doc by ``md5(id) % n_buckets`` — the hash order is
   bucket-major by construction (``u``'s high bits ARE the bucket
   selector's hash), so ordering (bucket, u, id) equals ordering by a
   bucketed shuffle key;
2. within-bucket running sums via ONE window partitioned by bucket
   (parallel, state bounded by ~N/n_buckets rows);
3. bucket totals aggregate to an ``n_buckets``-row frame whose
   cumulative offsets cost one tiny single-partition window (bounded by
   ``n_buckets``, never by data);
4. offsets broadcast-join back on bucket id; ``tokens_before = offset +
   within_before``.

Two shuffles of ids+counts (the bucket window and the final writer's
repartition), zero Python, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from anomalydetector_spark.functions import md5_long

_HASH_SPACE = 1 << 60


def _order_hash(id_col: str, seed: int) -> Column:
    """60-bit order key — integer form of ``sampling.hash_uniform`` (no
    division: the ORDER is identical and integers keep the oracle
    trivial)."""
    return md5_long(
        F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))
    )


def assign_shards_by_tokens(
    df: DataFrame,
    budget_tokens: int,
    tokens_col: str,
    id_col: str = "doc_id",
    seed: int = 0,
    n_buckets: int = 1024,
) -> DataFrame:
    """Add a ``shard`` (long) column: the greedy token-budget shard of
    each row under the deterministic hash total order — see the module
    docstring for the distributed prefix-sum shape.

    The bucket id is the TOP bits of the order hash (``u div
    (2^60/n_buckets)``), so bucket-major order IS hash order and the
    global prefix is exact. ``n_buckets`` is a physical knob only — the
    assignment is provably independent of it (test-pinned) because the
    bucket boundaries are order-prefix boundaries. NULL ``tokens_col``
    counts as 0 (the row still occupies its slot in the order); NULL
    ``id_col`` rows are dropped (they have no position in the total
    order).

    ``n_buckets`` must be a power of two ≤ 2^60 so the top-bits
    bucketing is exact integer arithmetic.
    """
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    if n_buckets <= 0 or (n_buckets & (n_buckets - 1)) != 0 or n_buckets > _HASH_SPACE:
        raise ValueError("n_buckets must be a power of two <= 2^60")
    # bucket = TOP log2(n_buckets) bits of the 60-bit hash — a pure bit
    # shift, exact (a double-rounded division would misplace rows near
    # bucket boundaries: 60-bit ints exceed double's 53-bit mantissa)
    shift = 60 - (n_buckets.bit_length() - 1)

    u = _order_hash(id_col, seed)
    toks = F.coalesce(F.col(tokens_col).cast("long"), F.lit(0))
    base = (
        df.filter(F.col(id_col).isNotNull())
        .withColumn("_u", u)
        .withColumn("_bkt", F.shiftright(F.col("_u"), shift))
    )

    w_in = Window.partitionBy("_bkt").orderBy(
        F.col("_u").asc(), F.col(id_col).asc()
    )
    within_before = F.coalesce(
        F.sum(toks).over(w_in.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("long"),
    )
    local = base.withColumn("_before_in", within_before)

    totals = base.groupBy("_bkt").agg(F.sum(toks).alias("_bkt_tokens"))
    w_b = Window.orderBy("_bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "_bkt",
        F.coalesce(F.sum("_bkt_tokens").over(w_b), F.lit(0).cast("long"))
        .alias("_offset"),
    )

    return (
        local.join(F.broadcast(offsets), "_bkt")
        .withColumn(
            "shard",
            F.floor(
                (F.col("_offset") + F.col("_before_in"))
                / F.lit(int(budget_tokens))
            ).cast("long"),
        )
        .drop("_u", "_bkt", "_before_in", "_offset")
    )


def shard_summary(
    sharded: DataFrame, tokens_col: str
) -> DataFrame:
    """Per-shard (shard, n_docs, n_tokens) — the balance evidence frame
    (every interior shard's mass lands in [budget − max_doc, budget +
    max_doc]; only the last shard may run short)."""
    toks = F.coalesce(F.col(tokens_col).cast("long"), F.lit(0))
    return sharded.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(toks).alias("n_tokens"),
    )


def write_token_shards(
    sharded: DataFrame,
    path: str,
    mode: str = "overwrite",
) -> None:
    """Write one parquet directory per shard (``shard=<k>/``): a
    repartition ON the shard column co-locates each shard into one task
    so every shard emits a single file — the layout training loaders
    want (shard k is one sequential read)."""
    (
        sharded.repartition(F.col("shard"))
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )
