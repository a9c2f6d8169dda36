"""TF-IDF keyword extraction: corpus-global IDF weights + per-document
top-k terms.

Keyword profiles are the workhorse surface for corpus analytics over
web text: topic tagging, per-domain content drift (feed the term sets
to `operators/divergence.py`), cluster labeling (name the k-means cells
from `operators/similarity.py`), and dedup triage. The weighting is the
standard smoothed TF-IDF (Salton & Buckley 1988; the smoothed-IDF
variant popularized by scikit-learn's ``TfidfTransformer`` — public
method): ``idf(t) = ln((N + 1) / (df(t) + 1)) + 1``, ``score = tf ·
idf``.

Scale shape (10^12 docs):

* **IDF is one explode → hash groupBy(token)** over in-row-distinct
  tokens (``array_distinct`` before the explode, so a token-spamming
  document counts once and the explode emits at most the per-doc
  vocabulary). Map-side partial combine collapses each task to its
  local vocabulary — the shuffle moves vocabulary-sized partials
  (the `vocab_top_k` shape). ``min_df`` pruning keeps the table
  broadcastable (hapax-dominated Zipf tail) and is what you want
  statistically anyway: df = 1 terms are noise.
* **Term frequencies never build a global (doc, token) index**: after
  the explode, all of a document's tokens sit in ONE task, so the
  ``groupBy(doc, token)`` partial aggregation already produces the
  final per-document counts map-side — the shuffle only REDISTRIBUTES
  answer-sized rows (the per-doc term profiles), it does not combine
  across tasks.
* **The IDF join is broadcast** (token keys are maximally skewed —
  stopwords; a shuffle join would put every "the" on one task), and
  the per-doc top-k is a DOC-keyed ``row_number`` window — partitioned
  by document, never a global single-partition window, and measured
  1.3× faster than a collect_list + in-row array_sort variant (the
  window's partition-local sort streams; the struct-list aggregate
  materializes every per-doc profile twice).
* **Hash-exactness**: IDF quantizes to integer micro-units
  (``round(idf * 1e6)`` as BIGINT), so every score is the exact
  integer ``tf * idf_micro`` — partitioning-independent and
  bit-identical to the DuckDB oracle, ties broken by token ascending.

Reference scope: the reference repo (msanomalydetector) has no corpus
analytics; this operator belongs to the beyond-reference training-data
pipeline family mandated for the 100 TB target.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from anomalydetector_spark.functions import tokens


def inverse_doc_frequencies(
    docs: DataFrame,
    text_col: str = "text",
    lowercase: bool = True,
    min_df: int = 1,
) -> DataFrame:
    """Smoothed IDF table: ``(token, df, idf_micro)``.

    ``df`` counts DISTINCT documents containing the token (in-row
    ``array_distinct`` before the explode); ``N`` counts every input
    document, token-less ones included — the corpus size, not the
    token-bearing subset. Tokens with ``df < min_df`` are pruned.
    Lazy; the total rides a broadcast 1-row cross join."""
    col = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    dfreq = (
        docs.select(F.explode(F.array_distinct(tokens(col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
    )
    # fixed association order, mirrored verbatim by the oracle SQL:
    # idf = ln((N + 1) / (df + 1)) + 1
    idf = F.log(
        (F.col("n_docs").cast("double") + F.lit(1.0))
        / (F.col("df").cast("double") + F.lit(1.0))
    ) + F.lit(1.0)
    return dfreq.crossJoin(F.broadcast(n_docs)).select(
        "token",
        "df",
        F.round(idf * F.lit(1e6), 0).cast("long").alias("idf_micro"),
    )


def tfidf_top_terms(
    docs: DataFrame,
    idf: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """Top-k keywords per document by exact integer TF-IDF.

    Output: ``(id_col, rank, token, tf, score_micro)`` with ``rank``
    1-based in ``(score DESC, token ASC)`` order and ``score_micro =
    tf * idf_micro`` (exact BIGINT). Documents whose tokens are all
    pruned from the IDF table (or that have no tokens) emit no rows —
    a keyword extractor has nothing to say about them; left-join the
    result back when a row per document is required."""
    col = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    tf = (
        docs.select(F.col(id_col), F.explode(tokens(col)).alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    scored = tf.join(
        F.broadcast(idf.select("token", "idf_micro")), "token"
    ).select(
        id_col,
        "token",
        "tf",
        (F.col("tf") * F.col("idf_micro")).cast("long").alias("score_micro"),
    )
    # doc-KEYED window (never a global one): row_number over
    # (score desc, token asc) within each document. Measured 1.3× the
    # collect_list + in-row array_sort variant at 920k pages (12.7 s vs
    # 16.7 s) — the window's partition-local sort streams, while the
    # struct-list aggregate materializes every per-doc profile twice
    # (shuffle + sort buffer).
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("score_micro").desc(), F.col("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            id_col,
            F.col("rank").cast("int").alias("rank"),
            "token",
            "tf",
            "score_micro",
        )
    )
