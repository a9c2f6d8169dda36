"""Training-corpus preparation — the operators composed as one program.

What a 100-TB pretraining-data pipeline actually runs over the
``documents`` table, end to end in ONE DataFrame program (three shuffles
total: the dedup group-by, its join back, and nothing else — quality,
tokens and fingerprints are projections):

1. exact dedup (operators/dedup.exact_duplicates) — keep canonicals,
2. optional near-dup stage (LSH candidates → Jaccard verify →
   transitive cluster → keep min id; adds the LSH signature/band
   shuffles plus the ids-only cluster loop),
3. quality gate (operators/text.quality_score ≥ threshold),
4. emit per-doc token counts + fingerprints for downstream sharding.

The whole program is ANSI-SQL-expressible, so it carries a full DuckDB
oracle (driver query ``training_prep``) — composition is verified, not
just each operator alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from anomalydetector_spark.operators.components import drop_near_duplicates
from anomalydetector_spark.operators.dedup import (
    exact_duplicates,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
)
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
    near_dup_jaccard: float | None = None,
    k_shingle: int = 3,
    lsh_n_hashes: int = 16,
    lsh_bands: int = 4,
) -> DataFrame:
    """Canonical, quality-gated corpus rows:
    ``(doc_id, n_tokens, quality, fingerprint)``.

    Dedup runs FIRST so the quality projection is computed once per
    surviving document, not once per duplicate — at web scale duplicates
    are a double-digit percentage of rows.

    ``near_dup_jaccard`` enables the near-duplicate stage between exact
    dedup and the quality gate: MinHash-LSH candidates → exact n-gram
    Jaccard verify at this threshold → transitive clustering
    (operators/components) → keep one canonical per cluster. It runs on
    the exact-deduped survivors, so LSH never shingles rows exact dedup
    already dropped. Candidate generation is the banded equi-join and
    the cluster loop carries ids only — no all-pairs stage anywhere.

    ``reproducible_fingerprint`` switches from the default one-xxhash64-
    per-doc fingerprint (the 100-TB path) to the per-token md5 rolling
    hash that DuckDB can replicate exactly (the oracle path) — measured
    ~10× slower, so it is opt-in."""
    canon = exact_duplicates(docs, text_col=text_col, id_col=id_col).filter(
        F.col("is_canonical")
    )
    kept = docs.join(canon.select(id_col), id_col, "left_semi")
    if near_dup_jaccard is not None:
        cands = minhash_lsh_candidates(
            kept,
            text_col=text_col,
            id_col=id_col,
            k_shingle=k_shingle,
            n_hashes=lsh_n_hashes,
            bands=lsh_bands,
        )
        verified = ngram_jaccard_pairs(
            kept,
            pairs=cands,
            text_col=text_col,
            id_col=id_col,
            k_shingle=k_shingle,
            threshold=near_dup_jaccard,
        )
        kept = drop_near_duplicates(kept, verified, id_col=id_col)
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
