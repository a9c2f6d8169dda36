"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling",
NeurIPS). The published recipe for picking pretraining documents that
look like a target distribution:

1. featurize every document as HASHED N-GRAM counts (unigrams +
   bigrams hashed into ``n_buckets`` buckets — the paper's 10k),
2. fit bag-of-buckets models on the target corpus (p) and the raw
   corpus (q): smoothed bucket probabilities,
3. weight every raw document by the log importance ratio
   ``log w = Σ_grams (log p[b(g)] − log q[b(g)])``,
4. resample k documents WITHOUT replacement via Gumbel top-k
   (rank by ``log w + Gumbel noise``; seeded-hash noise here, so the
   draw is deterministic and retry-stable).

Caveat carried over from the paper: the weight is a SUM over gram
occurrences, so variable-length documents confound weight with length
(the paper applies DSIR to roughly fixed-length examples). Chunk first
(``operators/chunking``) when document lengths vary widely.

The reference repo has no corpus stage; this sits alongside the other
training-data operators (quality, c4, lm_quality) on the pipeline side.

Exactness: every per-gram log-prob is quantized to INTEGER micro-nats
(the ``lm_quality`` convention) before summation, so document weights
are exact integers and partitioning-independent; the Gumbel term is
quantized the same way, so ranks and the top-k cut are reproducible in
the DuckDB oracle bit-for-bit.

Scale shape: bucket ids are computed IN-ROW (md5 → 60-bit int → mod);
both models are ≤ ``n_buckets``-row tables built by one map-side-
combined groupBy each and BROADCAST to the scorer (gram keys are
Zipf-skewed, so a shuffle join on them is off the table); scoring is
explode → two broadcast joins → one hash aggregate; selection is
``orderBy(score).limit(k)`` which Spark executes as a distributed
per-partition top-k + driver merge (TakeOrderedAndProject) — only
(id, score) pairs move, never text.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from anomalydetector_spark.functions import md5_long, tokens
from anomalydetector_spark.operators.lm_quality import _micro_nats
from anomalydetector_spark.operators.sampling import hash_uniform

#: the paper's feature dimension.
DEFAULT_BUCKETS = 10_000
DEFAULT_ALPHA = 0.5


def hashed_gram_buckets(
    col: Column,
    n_buckets: int = DEFAULT_BUCKETS,
    lowercase: bool = True,
) -> Column:
    """array<long> of hashed-(uni+bi)gram bucket ids, one per gram
    occurrence, built in-row (no shuffle, no UDF). Bigrams join their
    two tokens with a space before hashing."""
    c = F.lower(col) if lowercase else col
    toks = tokens(c)
    tail = F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0)))
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        tail,
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.transform(
        F.concat(toks, bigrams), lambda g: md5_long(g) % n_buckets
    )


def train_bucket_model(
    docs: DataFrame,
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    alpha: float = DEFAULT_ALPHA,
    lowercase: bool = True,
) -> Tuple[DataFrame, DataFrame]:
    """Smoothed bag-of-buckets model: ``(model, floor)`` where ``model``
    is ``(bucket, cnt, logprob_micro)`` for observed buckets with
    ``logprob = ln((cnt + alpha) / (T + alpha * n_buckets))`` and
    ``floor`` is ONE row ``(t_grams, floor_micro)`` carrying the
    unobserved-bucket probability ``ln(alpha / (T + alpha *
    n_buckets))`` — together they define a proper distribution over all
    ``n_buckets`` buckets."""
    grams = docs.select(
        F.explode(
            hashed_gram_buckets(F.col(text_col), n_buckets, lowercase)
        ).alias("bucket")
    )
    counts = grams.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("t_grams")
    )
    denom = F.col("t_grams").cast("double") + F.lit(alpha * n_buckets)
    model = counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        "cnt",
        _micro_nats(
            F.log((F.col("cnt").cast("double") + F.lit(alpha)) / denom)
        ).alias("logprob_micro"),
    )
    floor = totals.select(
        "t_grams",
        _micro_nats(F.log(F.lit(alpha) / denom)).alias("floor_micro"),
    )
    return model, floor


def dsir_weights(
    raw: DataFrame,
    target_model: DataFrame,
    target_floor: DataFrame,
    raw_model: DataFrame,
    raw_floor: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
    lowercase: bool = True,
) -> DataFrame:
    """Per-document importance weight. Emits every raw document:
    ``(id_col, n_grams, logw_micro)`` with ``logw_micro`` the exact
    integer micro-nat sum of per-gram ``log p − log q``; gramless
    documents get weight 0."""
    occ = raw.select(
        F.col(id_col),
        F.explode_outer(
            hashed_gram_buckets(F.col(text_col), n_buckets, lowercase)
        ).alias("bucket"),
    )
    joined = (
        occ.join(
            F.broadcast(
                target_model.select(
                    "bucket", F.col("logprob_micro").alias("_p")
                )
            ),
            "bucket",
            "left",
        )
        .join(
            F.broadcast(
                raw_model.select(
                    "bucket", F.col("logprob_micro").alias("_q")
                )
            ),
            "bucket",
            "left",
        )
        .crossJoin(
            F.broadcast(
                target_floor.select(F.col("floor_micro").alias("_pf"))
            )
        )
        .crossJoin(
            F.broadcast(
                raw_floor.select(F.col("floor_micro").alias("_qf"))
            )
        )
    )
    lw = F.when(F.col("bucket").isNull(), F.lit(0)).otherwise(
        F.coalesce(F.col("_p"), F.col("_pf"))
        - F.coalesce(F.col("_q"), F.col("_qf"))
    )
    return (
        joined.select(id_col, "bucket", lw.alias("lw"))
        .groupBy(id_col)
        .agg(
            F.count("bucket").alias("n_grams"),
            F.sum("lw").alias("logw_micro"),
        )
    )


def gumbel_micro(key: Column, seed: int = 0) -> Column:
    """Seeded-hash standard Gumbel noise in integer micro-nats:
    ``round(−ln(−ln(u)) · 1e6)`` with ``u`` the md5-uniform of the key
    (u ∈ (0, 1) — md5_long of a non-empty string is never exactly 0,
    and < 1 by construction)."""
    u = hash_uniform(key, seed=seed)
    return _micro_nats(-F.log(-F.log(u)))


def dsir_select(
    weighted: DataFrame,
    k: int,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Gumbel top-k resampling over importance weights (sampling k docs
    without replacement with probability ∝ w): rank by ``logw_micro +
    Gumbel`` descending, id ascending as the tiebreak. Returns the k
    selected rows with ``score_micro``; executed as a distributed
    TakeOrderedAndProject (per-partition top-k + driver merge of k·P
    (id, score) pairs — no global sort, no single-partition window)."""
    scored = weighted.withColumn(
        "score_micro",
        F.col("logw_micro") + gumbel_micro(F.col(id_col), seed=seed),
    )
    return scored.orderBy(
        F.col("score_micro").desc(), F.col(id_col)
    ).limit(k)
