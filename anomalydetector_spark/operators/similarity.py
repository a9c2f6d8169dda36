"""Similarity search over embedding columns (``array<float>``).

* :func:`cosine_topk_bruteforce` — the exactness baseline: broadcast the
  (small) query set against the corpus, JVM-side dot products, window
  top-k. Cost is |queries| × |corpus| — right when queries are few or the
  corpus fits a single scan.
* :func:`lsh_bucket_ann` — the scale path: random-hyperplane signatures
  (sign bits of dot products with seeded planes) bucket the corpus; probe
  joins on the bucket id and ranks only within buckets. Recall tunes with
  ``n_planes`` (fewer planes → bigger buckets → higher recall, more work).
* :func:`embedding_near_duplicates` — pairwise near-dup detection via the
  same bucketing (embedding-cosine dedup for training pipelines).

All dot products run through ``zip_with``/``aggregate`` inside codegen —
no Python in the hot path. Hyperplanes are generated from a seeded numpy
RNG on the driver and shipped as literals (tiny: n_planes × dim floats).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from anomalydetector_spark.functions import cosine_similarity


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query (self-matches excluded).

    The query side is broadcast — at 100 TB the corpus never shuffles;
    each task ranks its split locally and the final per-query top-k is a
    bounded window over |queries| × k rows.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine_sim", cosine_similarity(F.col("_qv"), F.col("_cv")))
        .drop("_qv", "_cv")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((n_planes, dim))


def _signature(vec_col, planes: np.ndarray):
    """Sign-bit signature as a compact long (n_planes ≤ 63)."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec_col,
                    F.array(*[F.lit(float(x)) for x in plane]),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            > 0,
            F.lit(1).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for plane in planes
    ]
    sig = F.lit(0).cast("long")
    for b in bits:
        sig = sig * 2 + b
    return sig


def _table_signatures(
    df: DataFrame,
    out_id: str,
    planes_per_table: list[np.ndarray],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, tbl, bucket) — one row per hash table, signatures from each
    table's own seeded planes."""
    return df.select(
        F.col(id_col).alias(out_id),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        _signature(F.col(vec_col), planes).alias("bucket"),
                    )
                    for t, planes in enumerate(planes_per_table)
                ]
            )
        ).alias("s"),
    ).select(out_id, "s.tbl", "s.bucket")


def _plane_projection(vec_col, plane: np.ndarray):
    return F.aggregate(
        F.zip_with(
            vec_col,
            F.array(*[F.lit(float(x)) for x in plane]),
            lambda a, b: a * b,
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _table_signatures_multiprobe(
    df: DataFrame,
    out_id: str,
    planes_per_table: list[np.ndarray],
    id_col: str,
    vec_col: str,
    n_flips: int,
) -> DataFrame:
    """(id, tbl, bucket) with MULTIPROBE expansion: per table, each
    vector emits its base signature bucket PLUS ``n_flips`` single-bit
    variants flipping the lowest-|margin| planes — the planes whose
    projection landed nearest the boundary, exactly where a true
    neighbor most likely fell on the other side (Lv et al.'s
    multi-probe LSH, the same probe-the-near-misses pattern as the
    SimHash block tables). Stays a pure in-row projection: margins are
    sorted with ``array_sort`` over (|proj|, plane-idx) structs and the
    flip masks come from a literal power table, so the candidate join
    remains a bucket equi-join."""
    n_planes = len(planes_per_table[0])
    n_flips = min(n_flips, n_planes)
    # bit i of the signature (MSB-first accumulation) carries weight
    # 2^(n_planes-1-i)
    masks = F.array(
        *[F.lit(1 << (n_planes - 1 - i)) for i in range(n_planes)]
    )
    per_table = []
    for t, planes in enumerate(planes_per_table):
        projs = [_plane_projection(F.col(vec_col), p) for p in planes]
        sig = F.lit(0).cast("long")
        for pr in projs:
            sig = sig * 2 + F.when(pr > 0, F.lit(1).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        margins = F.array_sort(
            F.array(
                *[
                    F.struct(
                        F.abs(pr).alias("m"), F.lit(i).alias("i")
                    )
                    for i, pr in enumerate(projs)
                ]
            )
        )
        flips = F.transform(
            F.slice(margins, 1, n_flips),
            lambda s: F.struct(
                F.lit(t).alias("tbl"),
                sig.bitwiseXOR(
                    F.element_at(masks, s["i"] + 1).cast("long")
                ).alias("bucket"),
            ),
        )
        base = F.array(
            F.struct(F.lit(t).alias("tbl"), sig.alias("bucket"))
        )
        per_table.append(F.concat(base, flips))
    return df.select(
        F.col(id_col).alias(out_id),
        F.explode(F.flatten(F.array(*per_table))).alias("s"),
    ).select(out_id, "s.tbl", "s.bucket")


def lsh_bucket_ann(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 1,
    multiprobe: int = 0,
) -> DataFrame:
    """Approximate top-k: rank only within the query's hyperplane buckets.

    One signature pass per side, an equi-join on ``(tbl, bucket)``, then
    the same windowed top-k as brute force — the crossJoin is gone; work
    scales with bucket occupancy (corpus/2^n_planes per bucket per table
    in expectation).

    ``n_tables`` > 1 is the recall lever (standard multi-table LSH, the
    same pattern as :func:`embedding_near_duplicates`): L independently
    seeded tables, candidate sets OR'd. Candidates are distinct'd on the
    (query, neighbor) id pair BEFORE any dot product, so each survivor
    costs one cosine no matter how many tables bucket it together;
    vectors are re-attached by id (query side broadcast; the candidate
    side is |queries| × bucket-occupancy rows — AQE broadcasts it against
    the corpus when it fits).

    ``multiprobe`` > 0 expands the QUERY side only (the cheap side —
    the corpus index keeps one row per vector per table) with that many
    lowest-margin single-bit flips per table, the Lv et al. multi-probe
    pattern: recall rises steeply while candidate volume grows only
    ~(1+multiprobe)× on the small side of the join.
    """
    planes_per_table = [
        _hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)
    ]
    c = _table_signatures(corpus, "neighbor_id", planes_per_table, id_col, vec_col)
    q = (
        _table_signatures_multiprobe(
            queries, "query_id", planes_per_table, id_col, vec_col, multiprobe
        )
        if multiprobe > 0
        else _table_signatures(
            queries, "query_id", planes_per_table, id_col, vec_col
        )
    )
    cand = (
        c.join(F.broadcast(q), ["tbl", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .withColumn("cosine_sim", cosine_similarity(F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


#: default ceiling on vectors collected to the driver for k-means training
MAX_TRAIN_SAMPLE = 65536


def approx_parquet_row_count(spark, path: str) -> int | None:
    """Free row count from parquet footers (no data scan): sum of
    per-file ``num_rows`` via pyarrow. Iceberg tables expose the same
    number in snapshot summary metadata (``total-records``). Returns
    None when the path isn't readable as a parquet dataset."""
    try:
        import pyarrow.dataset as ds

        dataset = ds.dataset(path, format="parquet")
        return sum(
            frag.metadata.num_rows
            for frag in dataset.get_fragments()
        )
    except Exception:
        return None


def train_ivf_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    n_iter: int = 5,
    sample_mod: int | None = None,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_train_sample: int = MAX_TRAIN_SAMPLE,
    approx_count: int | None = None,
) -> np.ndarray:
    """Coarse quantizer for IVF: k-means over a deterministic hash-sample.

    The sample (``hash(id) % sample_mod == 0``) is collected to the driver
    — IVF training data is a bounded subset even at 10^12 vectors: when
    ``sample_mod`` is None (the default) it is derived from the corpus
    row count so at most ``max_train_sample`` vectors reach the driver
    (round-1 finding #4: the old default collected the whole corpus).
    Pass ``approx_count`` — table-metadata row counts are free (parquet
    footers via :func:`approx_parquet_row_count`; Iceberg snapshot
    ``total-records``) — to avoid the ``count()`` action entirely: at
    100 TB that action is a full scan before training even starts, and
    any estimate within ~2× is fine since it only sizes the sample
    (round-2 finding #2). ``count()`` remains the fallback when no
    metadata is supplied. The full corpus is only ever touched by the
    single assignment pass in :func:`ivf_ann`. Seeded k-means++-style
    init keeps centroids reproducible run to run.
    """
    if sample_mod is None:
        n = approx_count if approx_count is not None else corpus.count()
        sample_mod = max(1, -(-n // max_train_sample))  # ceil division
    # hard cap even under hash skew — as a deterministic hash-ordered
    # top-k (TakeOrderedAndProject), not a bare limit(): an unordered
    # limit takes whichever partitions answer first, so retries/reruns
    # would train on different subsets and break centroid reproducibility.
    # The cap is exactly max_train_sample so the documented driver-memory
    # bound holds even when the hash-mod filter over-selects.
    sample = (
        corpus.filter(F.pmod(F.xxhash64(id_col), F.lit(sample_mod)) == 0)
        .select(vec_col, F.col(id_col), F.xxhash64(id_col, F.lit(1)).alias("_ord"))
        .orderBy("_ord", id_col)
        .limit(max_train_sample)
        .toPandas()[vec_col]
    )
    x = np.stack(sample.to_numpy())
    rng = np.random.default_rng(seed)
    # k-means++ seeding
    centroids = [x[rng.integers(len(x))]]
    for _ in range(n_cells - 1):
        d2 = np.min(
            [((x - c) ** 2).sum(axis=1) for c in centroids], axis=0
        )
        probs = d2 / d2.sum() if d2.sum() > 0 else None
        centroids.append(x[rng.choice(len(x), p=probs)])
    cent = np.stack(centroids)
    for _ in range(n_iter):
        # assign by max cosine (normalized dot) to match query-time metric
        cn = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
        xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        assign = (xn @ cn.T).argmax(axis=1)
        for c in range(n_cells):
            mask = assign == c
            if mask.any():
                cent[c] = x[mask].mean(axis=0)
    return cent


def _cell_assigner(centroids: np.ndarray, nprobe: int):
    """Arrow-vectorized nearest-cell assignment (argmax cosine): one numpy
    matmul per batch — the Python boundary is per-batch, never per-row."""
    cn = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )

    @F.pandas_udf("array<int>")
    def assign(vecs: pd.Series) -> pd.Series:
        x = np.stack(vecs.to_numpy())
        xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        sims = xn @ cn.T
        order = np.argsort(-sims, axis=1)[:, :nprobe]
        return pd.Series(list(order.astype("int32")))

    return assign


def ivf_ann(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 2,
    train_sample_mod: int | None = None,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    approx_count: int | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: the scale path when queries
    are many.

    Corpus vectors are assigned to their nearest coarse cell (ONE
    Arrow-batched matmul pass); queries probe their ``nprobe`` nearest
    cells. The join is an equi-join on ``cell`` — at cluster scale the
    corpus side can be bucketed/partitioned by cell so probes touch only
    matching partitions, and recall tunes with ``nprobe`` without
    re-indexing. Recall vs cost: work per query ≈ nprobe/n_cells of the
    corpus, against LSH's 1/2^n_planes-sized buckets with noisier recall.
    """
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus,
            n_cells=n_cells,
            sample_mod=train_sample_mod,
            seed=seed,
            id_col=id_col,
            vec_col=vec_col,
            approx_count=approx_count,
        )
    c_assign = _cell_assigner(centroids, nprobe=1)
    q_assign = _cell_assigner(centroids, nprobe=nprobe)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        F.element_at(c_assign(F.col(vec_col)), 1).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.explode(q_assign(F.col(vec_col))).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine_sim", cosine_similarity(F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def embedding_near_duplicates(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 1,
    multiprobe: int = 0,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold, candidates
    confined to LSH buckets (equi-join on ``(table, bucket)`` —
    never a theta/cartesian join).

    ``n_tables`` > 1 builds that many independently-seeded hash tables
    and ORs their candidate sets (the standard recall lever: collision
    prob per table is ``(1-θ/π)^n_planes``, over L tables
    ``1-(1-p)^L``).  ``multiprobe`` > 0 additionally probes, per table,
    that many single-bit flips of each vector's LOWEST-MARGIN signature
    bits (the planes it nearly fell on the other side of) — a pair is
    caught when either endpoint's probe set covers the other's base
    bucket, lifting per-table collision probability far above the base
    rate while the join stays a bucket equi-join. Candidates are
    distinct'd on the unordered id pair BEFORE the cosine is computed,
    so each survivor costs one dot product no matter how many
    tables/probes bucket it together; vectors are re-attached with two
    hash joins on the id.
    """
    planes_per_table = [
        _hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)
    ]
    base = _table_signatures(corpus, "_id", planes_per_table, id_col, vec_col)
    probe = (
        _table_signatures_multiprobe(
            corpus, "_id", planes_per_table, id_col, vec_col, multiprobe
        )
        if multiprobe > 0
        else base
    )
    a, b = probe.alias("a"), base.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a._id") != F.col("b._id")),
        )
        .select(
            F.least(F.col("a._id"), F.col("b._id")).alias("id_a"),
            F.greatest(F.col("a._id"), F.col("b._id")).alias("id_b"),
        )
        .distinct()
    )
    va = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    vb = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            cosine_similarity(F.col("_va"), F.col("_vb")).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def cluster_assignments(
    corpus: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Nearest-centroid assignment for every vector: ``(id_col,
    [keep_cols...,] cell, cos_to_centroid)``.

    ``keep_cols`` ride the projection (no join needed to re-attach
    metadata afterwards — at 10^12 vectors a re-attach join is a second
    corpus-wide shuffle).

    One Arrow-batched pass — the centroid matrix lives in the UDF
    closure (tiny: n_cells × dim floats, shipped with the task like the
    LSH planes), one numpy matmul per batch, no shuffle. This is the
    same assignment geometry as IVF cell routing but also surfaces the
    cosine to the owning centroid so callers can profile cluster
    tightness."""
    cn = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )

    @F.pandas_udf("struct<cell:int, cos_to_centroid:double>")
    def assign(vecs: pd.Series) -> pd.DataFrame:
        x = np.stack(vecs.to_numpy())
        xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        sims = xn @ cn.T
        cell = sims.argmax(axis=1)
        return pd.DataFrame(
            {
                "cell": cell.astype("int32"),
                "cos_to_centroid": sims[np.arange(len(cell)), cell],
            }
        )

    extra = keep_cols or []
    return corpus.select(
        id_col, *extra, assign(F.col(vec_col)).alias("_a")
    ).select(id_col, *extra, "_a.cell", "_a.cos_to_centroid")


def kmeans_cluster_profile(
    corpus: DataFrame,
    n_cells: int = 8,
    n_iter: int = 5,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str | None = None,
    approx_count: int | None = None,
) -> DataFrame:
    """Corpus clustering profile: seeded k-means (the IVF coarse
    quantizer — sample-train on the driver, broadcast-assign) plus one
    aggregation — ``(cell, n_vectors, mean_cos, min_cos[,
    majority_label, majority_frac])``, one row per non-empty cell.

    The standard corpus-understanding op for training-data curation
    (domain discovery, cluster-balanced mixing, semantic dedup
    scoping): at 10^12 vectors the only full-corpus work is the single
    assignment scan and a cell-count-sized shuffle; training touches at
    most ``MAX_TRAIN_SAMPLE`` vectors regardless of corpus size (pass
    ``approx_count`` from table metadata to avoid the sizing count()).

    With ``label_col``, each cell also reports its majority label and
    purity — the external-validity check when any ground-truth or
    heuristic labeling exists. The label mode rides the same
    aggregation (a two-level groupBy of cell-count-sized frames), never
    a second corpus scan."""
    cent = train_ivf_centroids(
        corpus,
        n_cells=n_cells,
        n_iter=n_iter,
        seed=seed,
        id_col=id_col,
        vec_col=vec_col,
        approx_count=approx_count,
    )
    assigned = cluster_assignments(
        corpus,
        cent,
        id_col=id_col,
        vec_col=vec_col,
        keep_cols=[label_col] if label_col else None,
    )
    stats = assigned.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg("cos_to_centroid"), 6).alias("mean_cos"),
        F.round(F.min("cos_to_centroid"), 6).alias("min_cos"),
    )
    if not label_col:
        return stats.orderBy("cell")
    by_label = assigned.groupBy("cell", label_col).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("cell").orderBy(
        F.col("n").desc(), F.col(label_col).asc()
    )
    top = (
        by_label.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select(
            "cell",
            F.col(label_col).alias("majority_label"),
            F.col("n").alias("_top_n"),
        )
    )
    return (
        stats.join(top, "cell")
        .select(
            "cell",
            "n_vectors",
            "mean_cos",
            "min_cos",
            "majority_label",
            F.round(F.col("_top_n") / F.col("n_vectors"), 6).alias(
                "majority_frac"
            ),
        )
        .orderBy("cell")
    )
