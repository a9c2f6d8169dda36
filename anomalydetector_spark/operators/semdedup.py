"""SemDeDup — semantic deduplication in embedding space (Abbas et al.
2023, "SemDeDup: Data-efficient learning at web-scale through semantic
deduplication"). The published protocol: partition the corpus in
embedding space, compute pairwise cosine similarity WITHIN each
partition, and keep exactly one document from every group of semantic
duplicates (pairs above a cosine threshold).

Two deviations, both documented here:

* the paper partitions with k-means; this operator partitions with the
  engine's seeded Rademacher sign-buckets (``operators/projection`` —
  the signs of a d_out-dim Johnson-Lindenstrauss projection). Same
  role (bound the quadratic pair search; duplicates split across
  partitions are missed on BOTH schemes), but the bucket of a vector
  is a pure deterministic expression both Spark and the DuckDB oracle
  can replay bit-exactly — so the WHOLE pipeline (partition → pairs →
  groups → verdict) is value-verified, which a k-means partitioner
  (iterative float training) cannot be;
* the keeper of a duplicate group is the MINIMUM id (deterministic,
  retry-stable) rather than the paper's lowest-centroid-similarity
  example (which needs the k-means centroid this partitioner doesn't
  have).

Scale shape: vector, bucket id, and norm are ONE in-row codegen
projection (zero shuffle, no vector-table self-join on id); candidate
pairs come from ONE bucket equi-join (never all-pairs across the
corpus — the quadratic cost is bounded per bucket, so ``d_out`` must
grow with corpus size exactly like the paper's k:
~2·log2(N/target_bucket_size) bits); groups resolve with the hash-min
pointer-doubling loop from ``operators/components`` (O(log diameter)
rounds, ids-only state); the verdict joins two ids-only tables back
onto the corpus (AQE broadcasts them when they fit).

Zero-norm vectors (a common embedder failure output) are excluded from
the PAIR stage: their cosine against anything is 0/0 = NaN, and Spark
orders NaN above every double, so ``NaN >= threshold`` would chain the
whole bucket into one duplicate group. They still get a verdict row
(bucket assigned, keep = true) like null vectors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from anomalydetector_spark.functions import cosine_similarity
from anomalydetector_spark.operators.components import connected_components
from anomalydetector_spark.operators.projection import _fold_outputs


def sign_bucket(projected: Column, d_out: int) -> Column:
    """Bucket id in [0, 2^d_out) from the signs of a projected vector:
    ``Σ_j 2^j · [value_j ≥ 0]``. The fold values are bit-exact across
    engines, so the ≥ 0 test (and hence the bucket) is too."""
    weights = F.array(*[F.lit(1 << j).cast("long") for j in range(d_out)])
    return F.aggregate(
        F.zip_with(
            projected,
            weights,
            lambda v, w: F.when(v >= 0, w).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _vec_buckets(
    emb: DataFrame,
    d_in: int,
    d_out: int,
    vec_col: str,
    id_col: str,
    seed: int,
) -> DataFrame:
    """``(id_col, _v double array, bucket, _nz)`` in ONE in-row codegen
    projection — no self-join of the vector table on id (that would be
    a full shuffle of the embeddings just to attach a value that is a
    pure function of the row)."""
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    nz = (
        F.aggregate(
            F.transform(vec, lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        > 0
    )
    return emb.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col),
        vec.alias("_v"),
        sign_bucket(
            _fold_outputs(vec_col, d_in, d_out, seed), d_out
        ).alias("bucket"),
        nz.alias("_nz"),
    )


def embedding_buckets(
    emb: DataFrame,
    d_in: int,
    d_out: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 0,
) -> DataFrame:
    """``(id_col, bucket)`` for every non-null vector — one in-row
    codegen projection, zero shuffle."""
    return _vec_buckets(emb, d_in, d_out, vec_col, id_col, seed).select(
        id_col, "bucket"
    )


def semdedup_pairs(
    emb: DataFrame,
    d_in: int,
    d_out: int = 8,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 0,
) -> DataFrame:
    """Within-bucket duplicate pairs ``(id_a, id_b, cosine_sim)`` with
    ``id_a < id_b`` and cosine ≥ ``threshold`` — ONE bucket equi-join,
    cosine computed only on co-bucketed candidates; zero-norm vectors
    excluded (NaN-cosine hazard, module docstring)."""
    side = _vec_buckets(emb, d_in, d_out, vec_col, id_col, seed).filter(
        F.col("_nz")
    )
    a = side.select(
        F.col(id_col).alias("id_a"),
        F.col("_v").alias("_va"),
        "bucket",
    )
    b = side.select(
        F.col(id_col).alias("id_b"),
        F.col("_v").alias("_vb"),
        "bucket",
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            cosine_similarity(F.col("_va"), F.col("_vb")).alias(
                "cosine_sim"
            ),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def semantic_dedup(
    emb: DataFrame,
    d_in: int,
    d_out: int = 8,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 0,
) -> DataFrame:
    """Per-row SemDeDup verdict: ``(id_col, bucket, group_id, keep)``
    for EVERY input row (null-vector rows pass with a NULL bucket,
    zero-norm rows pass with their bucket — a dedup gate must decide on
    every document). ``group_id`` is the minimum id reachable through
    duplicate pairs (= the keeper); ``keep`` is true for the keeper and
    for singletons."""
    buckets = _vec_buckets(
        emb, d_in, d_out, vec_col, id_col, seed
    ).select(id_col, "bucket")
    pairs = semdedup_pairs(
        emb, d_in, d_out, threshold, vec_col, id_col, seed
    )
    comp = connected_components(pairs, "id_a", "id_b").withColumnsRenamed(
        {"id": id_col, "component": "group_id"}
    )
    return (
        emb.select(id_col)
        .join(buckets, id_col, "left")
        .join(comp, id_col, "left")
        .select(
            id_col,
            "bucket",
            F.coalesce(F.col("group_id"), F.col(id_col)).alias(
                "group_id"
            ),
            (
                F.col("group_id").isNull()
                | (F.col("group_id") == F.col(id_col))
            ).alias("keep"),
        )
    )
