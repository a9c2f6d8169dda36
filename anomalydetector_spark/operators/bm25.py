"""BM25 ranked retrieval (Robertson & Walker 1994; the Lucene
``k1/b`` practical variant) — the standard lexical relevance score, as
a corpus tool: find the documents most relevant to a query term set
(quality-audit spot checks, eval-set neighborhood inspection, cheap
retrieval baselines next to the embedding ANN operators).

Formula (per document d, query term t):

    idf(t)  = ln( (N - df_t + 0.5) / (df_t + 0.5) + 1 )      [Lucene form —
              the +1 keeps idf positive for df > N/2]
    tf part = tf · (k1 + 1) / (tf + k1 · (1 - b + b · dl/avgdl))
    score   = Σ_t idf(t) · tf part

with N = corpus size, df_t = documents containing t, dl = document
token count, avgdl = mean dl over ALL documents (hit or not).

Plan shape — the part worth copying: every corpus statistic the score
needs (N, Σdl for avgdl, and df_t for EVERY query term) comes out of
ONE aggregation pass (term-presence flags are in-row booleans summed
map-side), broadcast back as a single row. Scoring is then a pure
projection (query terms are literals, so per-term tf is an in-row
``size(filter(...))``), and the top-k is a distributed
``TakeOrderedAndProject``. Two passes over the corpus total, no
shuffle wider than one row. Ties are broken by (score desc, id asc) so
the returned set is unique.

Scores are rounded to 6 dp (the repo's cross-engine float contract);
every arithmetic step is written in the same order the DuckDB oracle
evaluates, so the hash gate pins the formula, not just the ranking.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from anomalydetector_spark.functions import tokens


def bm25_scores(
    docs: DataFrame,
    query: str | Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    lowercase: bool = True,
) -> DataFrame:
    """Every document containing at least one query term, with its
    ``bm25`` score (6 dp) and ``dl`` token count."""
    if isinstance(query, str):
        terms = [t for t in (query.lower() if lowercase else query).split() if t]
    else:
        terms = [t.lower() if lowercase else t for t in query]
    # preserve order, drop repeats (a repeated query term must not
    # double-count its contribution)
    seen: dict[str, None] = {}
    for t in terms:
        seen.setdefault(t)
    terms = list(seen)
    if not terms:
        raise ValueError("query has no terms")

    col = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    toks = tokens(col)

    def _eq(term: str):
        # unary-lambda factory — a default-arg capture (lambda x, t=t)
        # would make the lambda binary and PySpark would bind the
        # ELEMENT INDEX to t (see functions._seeded_hasher)
        return lambda x: x == F.lit(term)

    tf = {t: F.size(F.filter(toks, _eq(t))) for t in terms}
    base = docs.select(
        F.col(id_col),
        F.size(toks).alias("dl"),
        *[tf[t].alias(f"_tf{i}") for i, t in enumerate(terms)],
    )

    # ONE aggregation: N, sum(dl), df per term
    stats = base.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("dl").alias("_sumdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    n = F.col("_n").cast("double")
    avgdl = F.col("_sumdl").cast("double") / n
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / avgdl
    )
    score = None
    for i in range(len(terms)):
        idf = F.log(
            (n - F.col(f"_df{i}").cast("double") + F.lit(0.5))
            / (F.col(f"_df{i}").cast("double") + F.lit(0.5))
            + F.lit(1.0)
        )
        tf_d = F.col(f"_tf{i}").cast("double")
        part = idf * (tf_d * F.lit(k1 + 1.0) / (tf_d + norm))
        score = part if score is None else score + part
    any_hit = None
    for i in range(len(terms)):
        hit = F.col(f"_tf{i}") > 0
        any_hit = hit if any_hit is None else any_hit | hit
    return (
        scored.filter(any_hit)
        .select(
            id_col,
            "dl",
            F.round(score, 6).alias("bm25"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    query: str | Sequence[str],
    k: int = 10,
    **kwargs,
) -> DataFrame:
    """Top-``k`` under the (bm25 desc, id asc) total order — a unique
    set even through score ties."""
    id_col = kwargs.get("id_col", "doc_id")
    return (
        bm25_scores(docs, query, **kwargs)
        .orderBy(F.col("bm25").desc(), F.col(id_col).asc())
        .limit(k)
    )
