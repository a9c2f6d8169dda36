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
