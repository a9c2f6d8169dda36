"""PMI / NPMI collocation extraction (Church & Hanks 1990, "Word
Association Norms, Mutual Information, and Lexicography"; NPMI from
Bouma 2009) — the standard corpus-analysis surface for "which adjacent
word pairs co-occur far above chance": tokenizer-vocabulary curation,
multi-word-expression mining, and a quality signal (boilerplate-heavy
corpora have degenerate collocation heads).

Conventions (pinned so the DuckDB oracle can reproduce every bit):

* the event space is ADJACENT BIGRAM OCCURRENCES: ``N = total bigram
  count``, ``P(x,·)`` / ``P(·,y)`` are the left/right margins of the
  bigram table — the self-consistent formulation, so
  ``pmi = ln(cnt · N / (c_left(x) · c_right(y)))``;
* margins are computed BEFORE ``min_count`` pruning (a kept pair's
  score must not depend on which of its siblings were pruned — the same
  rule as ``lm_quality.train_bigram_lm``'s ``ctx_total``);
* scores are integer **micro-nats** (``round(ln(·) · 1e6)`` HALF_UP),
  the repo's cross-engine float contract;
* ``npmi = pmi / ln(N / cnt)`` with the degenerate single-pair corpus
  (``cnt == N``, denominator 0) pinned to exactly 1.0 (= 1e6 micro);
* top-k under the TOTAL order ``(pmi desc, prev asc, cur asc)`` so the
  selected set is unique even through boundary ties.

Scale shape: pair construction is in-row (``zip_with`` of the token
array against its own tail — pairs never exist as concatenated strings)
→ explode → hash groupBy with map-side partial combine; the shuffle
moves bigram-vocabulary-sized partials, never documents. Margins are
two further groupBys OF THE BIGRAM TABLE (vocabulary-sized, tiny next
to the corpus) joined back by key — AQE broadcasts them when they fit,
and the grand total is a 1-row broadcast. The final top-k is a
distributed ``TakeOrderedAndProject`` (per-partition heads, never a
full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from anomalydetector_spark.functions import tokens


def bigram_counts(
    docs: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """(prev, cur, cnt) over adjacent token pairs — the shared base of
    the collocation scores. One shuffle (the pair groupBy)."""
    col = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    toks = tokens(col)
    pairs = docs.select(
        F.explode(
            F.zip_with(
                F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
                F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("prev"), b.alias("cur")),
            )
        ).alias("p")
    ).select("p.prev", "p.cur")
    return pairs.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("cnt"))


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    lowercase: bool = True,
    min_count: int = 5,
    top_k: int = 100,
) -> DataFrame:
    """Top-``top_k`` collocations: ``(prev, cur, cnt, pmi_micro,
    npmi_micro)`` with corpus count ≥ ``min_count``, ordered and
    tie-broken as the module docstring pins."""
    bc = bigram_counts(docs, text_col=text_col, lowercase=lowercase)
    left = bc.groupBy("prev").agg(F.sum("cnt").alias("c_left"))
    right = bc.groupBy("cur").agg(F.sum("cnt").alias("c_right"))
    total = bc.agg(F.sum("cnt").cast("double").alias("n_total"))

    kept = (
        bc.filter(F.col("cnt") >= min_count)
        .join(left, "prev")
        .join(right, "cur")
        .crossJoin(F.broadcast(total))
    )
    cnt_d = F.col("cnt").cast("double")
    # written EXACTLY as the oracle computes it: (cnt * N) / (cl * cr)
    pmi = F.log(
        cnt_d
        * F.col("n_total")
        / (F.col("c_left").cast("double") * F.col("c_right").cast("double"))
    )
    npmi_micro = F.when(
        cnt_d == F.col("n_total"), F.lit(1_000_000).cast("long")
    ).otherwise(
        F.round(pmi / F.log(F.col("n_total") / cnt_d) * F.lit(1e6), 0).cast(
            "long"
        )
    )
    scored = kept.select(
        "prev",
        "cur",
        "cnt",
        F.round(pmi * F.lit(1e6), 0).cast("long").alias("pmi_micro"),
        npmi_micro.alias("npmi_micro"),
    )
    return scored.orderBy(
        F.col("pmi_micro").desc(), F.col("prev").asc(), F.col("cur").asc()
    ).limit(top_k)
