"""Benchmark decontamination for training corpora.

Pretraining pipelines must drop training documents that overlap the
evaluation sets they will be scored on (the GPT-3 appendix-C protocol:
flag any train doc sharing an n-gram with an eval document). The
reference repo has no such operator (it is a series detector); this is
part of the training-data surface the task brief adds.

Scale shape: the EVAL side is small (benchmarks are thousands to a few
million n-grams), so its distinct-gram set broadcasts; the corpus side
explodes shingles and LEFT SEMI joins against that broadcast — one scan
of the corpus, no shuffle of corpus text, and the contaminated-id frame
(ids only) anti-joins the corpus. If an eval set ever outgrew broadcast
range, dropping the explicit ``broadcast()`` hint degrades gracefully to
a shuffled semi-join on the gram hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from anomalydetector_spark.functions import word_shingles


def eval_ngram_set(
    eval_docs: DataFrame, text_col: str = "text", k_shingle: int = 8
) -> DataFrame:
    """Distinct k-gram set of an evaluation corpus — the (small)
    contamination dictionary, one ``gram`` column."""
    return (
        eval_docs.select(
            F.explode(word_shingles(F.col(text_col), k_shingle)).alias("gram")
        )
        .distinct()
    )


def contaminated_ids(
    docs: DataFrame,
    eval_grams: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 8,
) -> DataFrame:
    """Distinct ``id_col`` of every corpus doc sharing at least one
    k-gram with the eval dictionary. The exploded corpus grams semi-join
    the broadcast eval set, so matching stops at the first hit per
    (doc, gram) and only ids travel."""
    grams = docs.select(
        F.col(id_col),
        F.explode(word_shingles(F.col(text_col), k_shingle)).alias("gram"),
    )
    return (
        grams.join(F.broadcast(eval_grams), "gram", "left_semi")
        .select(id_col)
        .distinct()
    )


def contamination_flags(
    docs: DataFrame,
    eval_grams: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 8,
) -> DataFrame:
    """``(id_col, contaminated)`` for every corpus doc: True iff the doc
    shares at least one k-gram with the eval set. This is the per-doc
    boolean surface (one extra corpus-id join to scatter the flag); when
    all you need is the drop, :func:`decontaminate` anti-joins the hit
    ids directly without it."""
    hits = contaminated_ids(
        docs, eval_grams, text_col=text_col, id_col=id_col, k_shingle=k_shingle
    ).withColumn("contaminated", F.lit(True))
    return docs.select(id_col).join(hits, id_col, "left").select(
        id_col, F.coalesce("contaminated", F.lit(False)).alias("contaminated")
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 8,
) -> DataFrame:
    """Corpus minus every doc sharing a k-gram with ``eval_docs`` —
    the composed protocol (eval dictionary → hit ids → anti-join).
    The hit-id frame anti-joins the corpus directly; the full-corpus
    boolean frame (:func:`contamination_flags`) is not materialized."""
    grams = eval_ngram_set(eval_docs, text_col=text_col, k_shingle=k_shingle)
    dirty = contaminated_ids(
        docs, grams, text_col=text_col, id_col=id_col, k_shingle=k_shingle
    )
    return docs.join(dirty, id_col, "left_anti")


def near_dup_contaminated_ids(
    docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    n_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """NEAR-duplicate contamination: corpus ids whose n-gram Jaccard
    against ANY eval document reaches ``threshold`` — catching the
    lightly-edited eval copies the exact k-gram rule misses (the
    paraphrase-contamination concern of the GPT-3 appendix-C protocol).

    Candidate generation is the same banded-MinHash equi-join as
    within-corpus dedup (``dedup.banded_signatures`` — the hash family
    is a pure function of the text, so the two tables bucket-join
    directly): corpus bands ⋈ eval bands on (band, band_sig), ids-only.
    Verification computes the exact shingle Jaccard for candidate pairs
    by joining each side's shingle array in — the only rows whose text
    leaves its scan are LSH candidates, a vanishing fraction of the
    corpus. Output: one ``id_col`` column, distinct.

    Scale: the eval side is benchmark-sized, so its band table and
    shingle arrays broadcast; the corpus side never shuffles text, only
    (id, band, sig) rows. Band-bucket skew (a boilerplate band shared by
    millions of corpus docs) is bounded by the eval side of the join
    staying small — the join output is |corpus-bucket| × |eval-bucket|,
    and the second factor is benchmark-scale.
    """
    from anomalydetector_spark.operators.dedup import banded_signatures

    kw = dict(
        text_col=text_col,
        id_col=id_col,
        k_shingle=k_shingle,
        n_hashes=n_hashes,
        bands=bands,
    )
    cb = banded_signatures(docs, **kw)
    eb = banded_signatures(eval_docs, **kw)
    cands = (
        cb.join(
            F.broadcast(eb.withColumnRenamed("_id", "_eval_id")),
            ["band", "band_sig"],
        )
        .select("_id", "_eval_id")
        .distinct()
    )
    corpus_sh = docs.select(
        F.col(id_col).alias("_id"),
        word_shingles(F.col(text_col), k_shingle).alias("_sh_c"),
    )
    eval_sh = eval_docs.select(
        F.col(id_col).alias("_eval_id"),
        word_shingles(F.col(text_col), k_shingle).alias("_sh_e"),
    )
    inter = F.size(F.array_intersect(F.col("_sh_c"), F.col("_sh_e"))).cast(
        "double"
    )
    union = F.size(F.array_union(F.col("_sh_c"), F.col("_sh_e"))).cast(
        "double"
    )
    sim = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (
        cands.join(corpus_sh, "_id")
        .join(F.broadcast(eval_sh), "_eval_id")
        .filter(sim >= F.lit(threshold))
        .select(F.col("_id").alias(id_col))
        .distinct()
    )


def decontaminate_near_dup(
    docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    threshold: float = 0.5,
    **lsh_kwargs,
) -> DataFrame:
    """Corpus minus near-duplicate eval contamination (ids-only
    anti-join, same composition shape as :func:`decontaminate`)."""
    dirty = near_dup_contaminated_ids(
        docs,
        eval_docs,
        text_col=text_col,
        id_col=id_col,
        k_shingle=k_shingle,
        threshold=threshold,
        **lsh_kwargs,
    )
    return docs.join(dirty, id_col, "left_anti")
