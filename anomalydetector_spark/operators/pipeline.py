"""Training-corpus preparation — the operators composed as one program.

What a 100-TB pretraining-data pipeline actually runs over the
``documents`` table, end to end in ONE DataFrame program (three shuffles
total: the dedup group-by, its join back, and nothing else — quality,
tokens and fingerprints are projections):

1. exact dedup (operators/dedup.exact_duplicates) — keep canonicals,
2. quality gate (operators/text.quality_score ≥ threshold),
3. emit per-doc token counts + fingerprints for downstream sharding.

The whole program is ANSI-SQL-expressible, so it carries a full DuckDB
oracle (driver query ``training_prep``) — composition is verified, not
just each operator alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from anomalydetector_spark.operators.dedup import exact_duplicates
from anomalydetector_spark.operators.text import (
    fast_fingerprint,
    fingerprint,
    quality_score,
    token_count,
)


def prepare_training_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    reproducible_fingerprint: bool = False,
) -> DataFrame:
    """Canonical, quality-gated corpus rows:
    ``(doc_id, n_tokens, quality, fingerprint)``.

    Dedup runs FIRST so the quality projection is computed once per
    surviving document, not once per duplicate — at web scale duplicates
    are a double-digit percentage of rows.

    ``reproducible_fingerprint`` switches from the default one-xxhash64-
    per-doc fingerprint (the 100-TB path) to the per-token md5 rolling
    hash that DuckDB can replicate exactly (the oracle path) — measured
    ~10× slower, so it is opt-in."""
    canon = exact_duplicates(docs, text_col=text_col, id_col=id_col).filter(
        F.col("is_canonical")
    )
    kept = docs.join(canon.select(id_col), id_col, "left_semi")
    c = F.col(text_col)
    return (
        kept.withColumn("quality", quality_score(c))
        .filter(F.col("quality") >= min_quality)
        .select(
            id_col,
            token_count(c).alias("n_tokens"),
            "quality",
            (
                fingerprint(c)
                if reproducible_fingerprint
                else fast_fingerprint(c)
            ).alias("fingerprint"),
        )
    )
