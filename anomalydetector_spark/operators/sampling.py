"""Deterministic sampling + corpus mixing for training-data pipelines.

Pretraining pipelines don't want ``df.sample``/``sampleBy`` at 100 TB:
those draw from ``rand()``, so a re-run — or a single TASK RETRY inside
one run — selects a different subset, breaking exactly-once semantics and
lineage reproducibility. Everything here samples by HASH THRESHOLD
instead: a row is kept iff ``U(key, seed) < fraction`` where ``U`` is a
uniform-[0,1) value derived from the md5 of the row key. That makes
selection

* deterministic (same key + seed → same verdict, on any executor, any
  retry, any cluster size),
* nested (the 10% sample is a strict subset of the 20% sample — grow a
  corpus without re-shuffling what's already downstream), and
* ANSI-SQL-reproducible (DuckDB computes the identical md5 threshold, so
  the driver oracle checks the exact row set, not just counts).

Nesting is a property of a SHARED seed — which also means two threshold
stages composed over the same key column must use DISTINCT seeds: with
the same seed they share ``U(key)``, so ``stage2(stage1(df))`` keeps rows
with ``U < min(f1, f2)`` rather than thinning by ``f1 * f2`` (e.g. a
0.5 sample after a mix whose fractions are all < 0.5 is a no-op for the
mix and the output is just the plain 0.5 sample of the raw input).

All operators are pure narrow projections/filters over the input scan —
zero shuffles for sampling itself; ``corpus_mix`` adds one tiny
aggregated-counts broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from anomalydetector_spark.functions import md5_long

# md5_long takes the first 15 hex chars → a 60-bit integer
_HASH_SPACE = float(1 << 60)


def hash_uniform(key: Column, seed: int = 0) -> Column:
    """Uniform-[0,1) double from the md5 of ``key`` salted with ``seed``
    — the deterministic stand-in for ``rand()``. Reproducible in ANSI SQL
    as ``('0x' || substr(md5(key || ':' || seed), 1, 15))::BIGINT /
    1152921504606846976.0``."""
    salted = F.concat(key.cast("string"), F.lit(f":{seed}"))
    return md5_long(salted) / F.lit(_HASH_SPACE)


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by hash threshold on
    ``key_col``. Pure filter — no shuffle, retry-stable, and nested
    across fractions for a fixed seed."""
    return df.filter(hash_uniform(F.col(key_col), seed) < F.lit(fraction))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    seed: int = 0,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum hash-threshold sampling: keep a row of stratum ``s``
    iff ``U(key, seed) < fractions[s]`` (strata not listed get
    ``default_fraction``).

    The fraction lookup is a flat CASE chain, not a ``create_map``
    literal — Catalyst re-materializes map literals per probe inside
    generated code, and a chain of comparisons stays fully codegen'd.
    Single scan, zero shuffles.
    """
    frac: Column = F.lit(float(default_fraction))
    for value, f in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == value, F.lit(float(f))).otherwise(
            frac
        )
    return df.filter(hash_uniform(F.col(key_col), seed) < frac)


def proportional_mix_fractions(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, float],
) -> DataFrame:
    """Per-stratum sampling fractions that realize target mixture
    ``weights`` by DOWN-sampling only (no stratum is upsampled): with
    stratum sizes ``n_s``, the binding stratum is the one with smallest
    ``n_s / w_s``; it keeps all rows and every other stratum keeps
    ``w_s * scale / n_s`` where ``scale = min_s(n_s / w_s)``.

    Returns a tiny frame ``(stratum, n, fraction)`` — one row per listed
    stratum, computed with one partial-aggregated count; broadcast it
    onto the corpus (``corpus_mix`` does).
    """
    keys = sorted(weights)
    w: Column = F.lit(None).cast("double")
    for value, wt in sorted(weights.items()):
        w = F.when(F.col("stratum") == value, F.lit(float(wt))).otherwise(w)
    counts = (
        df.filter(F.col(strata_col).isin(keys))
        .groupBy(F.col(strata_col).alias("stratum"))
        .agg(F.count("*").alias("n"))
        .withColumn("w", w)
    )
    # weight 0 = "drop this stratum": fraction 0, and it must not join
    # the binding-min (n/0 would raise under ANSI mode)
    scale = counts.filter(F.col("w") > 0).agg(
        F.min(F.col("n") / F.col("w")).alias("scale")
    )
    return (
        counts.crossJoin(F.broadcast(scale))
        .select(
            "stratum",
            "n",
            F.when(
                F.col("w") > 0,
                F.least(F.lit(1.0), F.col("w") * F.col("scale") / F.col("n")),
            )
            .otherwise(F.lit(0.0))
            .alias("fraction"),
        )
    )


def corpus_mix(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, float],
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Weighted corpus mixture: down-sample each stratum so the output
    composition matches ``weights`` (strata not listed are dropped),
    selection by hash threshold so the mix is retry-stable and
    reproducible.

    Plan shape: one aggregated count per stratum (map-side partial, tiny
    result) broadcast back onto the corpus scan, then a pure filter — the
    10^12-row side never shuffles.
    """
    fractions = proportional_mix_fractions(df, strata_col, weights)
    return (
        df.join(
            F.broadcast(fractions),
            df[strata_col] == fractions["stratum"],
        )
        .filter(hash_uniform(F.col(key_col), seed) < F.col("fraction"))
        .drop("stratum", "n", "fraction")
    )


def cap_per_key(
    df: DataFrame,
    key_col: str | list[str],
    k: int,
    id_col: str = "doc_id",
    seed: int = 0,
    salts: int = 0,
) -> DataFrame:
    """Keep at most ``k`` rows per ``key_col`` (per-domain caps — the
    standard guard against one host dominating a web corpus; a LIST of
    columns caps per composite key, e.g. ``(check_name, partition_key)``
    for violation-sample sinks — multi-column windows need no key
    concatenation, so there is no null-skip/delimiter hazard), chosen as
    the ``k`` SMALLEST ``U(id, seed)`` values so selection is
    deterministic, retry-stable, and nested in ``k`` (the cap-5 set is a
    subset of the cap-10 set), with ``id_col`` as a total tie-break.

    ``salts=0`` runs one ranking window partitioned by key — fine while
    the hottest key fits a task. At web scale one host can hold 10^9
    pages, so ``salts=S`` switches to the skew-safe two phases:

    1. rank within ``(key, salt)`` where salt = a second id hash mod S,
       keep ``rank <= k`` — every window partition shrinks ~S×, and the
       survivors are at most ``k*S`` rows per key;
    2. re-rank the survivors within ``key``, keep ``rank <= k``.

    Phase 1 can never evict a global top-k row (a row beaten by k rows
    in its salt bucket is beaten by k rows globally), so both paths
    select the IDENTICAL set — ``salts`` is a physical knob only, which
    the equivalence test asserts.
    """
    keys = [key_col] if isinstance(key_col, str) else list(key_col)
    u = hash_uniform(F.col(id_col), seed)
    w_key = Window.partitionBy(*keys).orderBy(u.asc(), F.col(id_col).asc())
    if salts <= 1:
        return (
            df.withColumn("_rn", F.row_number().over(w_key))
            .filter(F.col("_rn") <= k)
            .drop("_rn")
        )
    salt = (md5_long(F.concat(F.col(id_col).cast("string"), F.lit("#salt"))) % salts)
    w_salted = Window.partitionBy(*[F.col(c) for c in keys], salt).orderBy(
        u.asc(), F.col(id_col).asc()
    )
    pruned = (
        df.withColumn("_rn", F.row_number().over(w_salted))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
    return (
        pruned.withColumn("_rn", F.row_number().over(w_key))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def token_budget_cap(
    df: DataFrame,
    key_col: str | list[str],
    budget_tokens: int,
    tokens_col: str,
    id_col: str = "doc_id",
    seed: int = 0,
    salts: int = 0,
) -> DataFrame:
    """Keep, per ``key_col`` group, the hash-ordered greedy PREFIX of
    documents that fits a TOKEN budget — the assembly rule for
    token-budgeted corpus mixes (a domain/source contributes at most
    ~``budget_tokens`` tokens, not at most k documents; caps by doc
    count under-sample short-doc domains and over-sample long-doc ones).

    Admission rule: order the group by ``U(id, seed)`` (retry-stable,
    nested — a bigger budget's set contains a smaller's) with ``id_col``
    as the total tie-break, and keep a doc iff the tokens admitted
    BEFORE it total < ``budget_tokens`` (the standard greedy prefix: the
    crossing doc is admitted, overshooting by at most one document;
    an oversized first doc is still admitted, so no group with data
    goes empty).

    ``salts=0``: one cumulative-sum window per group. ``salts=S`` is the
    skew-safe two-phase twin (one hot host must not serialize a task):

    1. cumulative-sum within ``(key, salt)``, keep the local greedy
       prefix — a row admitted globally has global before-sum <
       budget, and its salt-local before-sum is a subset of that, so
       phase 1 can NEVER evict a global winner (superset property);
       survivors per key are bounded by ~S · budget tokens;
    2. re-run the exact rule on the survivors within ``key``.

    Both paths select the IDENTICAL set (equivalence is test-pinned);
    ``salts`` is a physical knob only, exactly like :func:`cap_per_key`.
    """
    keys = [key_col] if isinstance(key_col, str) else list(key_col)
    u = hash_uniform(F.col(id_col), seed)
    toks = F.coalesce(F.col(tokens_col).cast("long"), F.lit(0))

    def prefix(window) -> Column:
        before = F.coalesce(
            F.sum(toks).over(
                window.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0).cast("long"),
        )
        return before < F.lit(int(budget_tokens))

    w_key = Window.partitionBy(*keys).orderBy(u.asc(), F.col(id_col).asc())
    if salts <= 1:
        return df.withColumn("_keep", prefix(w_key)).filter(
            F.col("_keep")
        ).drop("_keep")
    salt = (
        md5_long(F.concat(F.col(id_col).cast("string"), F.lit("#salt")))
        % salts
    )
    w_salted = Window.partitionBy(*[F.col(c) for c in keys], salt).orderBy(
        u.asc(), F.col(id_col).asc()
    )
    pruned = (
        df.withColumn("_keep", prefix(w_salted))
        .filter(F.col("_keep"))
        .drop("_keep")
    )
    return (
        pruned.withColumn("_keep", prefix(w_key))
        .filter(F.col("_keep"))
        .drop("_keep")
    )


def weighted_sample_k(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str = "doc_id",
    seed: int = 0,
    strata_col: str | None = None,
    with_score: bool = False,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement — Efraimidis & Spirakis
    (2006, "Weighted random sampling with a reservoir"): keep the ``k``
    rows with the smallest ``score = −ln(U(key, seed)) / w`` (the
    exponential-race formulation of the paper's ``U^{1/w}`` max-key
    rule; at any instant the smallest-score set is a weighted sample
    without replacement). Heavier rows draw stochastically smaller
    scores, so inclusion probability rises with weight while every
    positive-weight row stays reachable — the standard quality-weighted
    / temperature-style corpus subselection primitive.

    Determinism contract: ``U`` comes from :func:`hash_uniform` shifted
    into (0, 1] (``(md5+1)/2^60`` — ``−ln(0)`` must be unreachable), so
    the selected SET is a pure function of (keys, weights, k, seed) —
    retry-stable, cluster-size-independent, NESTED IN k (the top-10 is
    a strict subset of the top-20: one total order, two prefixes), and
    ANSI-SQL-reproducible; ``key_col`` breaks exact score ties for a
    total order. Rows with NULL or non-positive weight are excluded (a
    zero-weight row has sampling probability 0 in the E-S scheme; a
    negative weight is undefined).

    Scale shape: the score is one codegen expression over the scan;
    global top-k executes as a distributed ``TakeOrderedAndProject``
    (per-partition heads of size k, never a full sort). With
    ``strata_col``, the rule runs per stratum via one window — k rows
    PER STRATUM (weighted stratified selection).
    """
    u = (md5_long(F.concat(F.col(key_col).cast("string"), F.lit(f":{seed}")))
         + F.lit(1)) / F.lit(_HASH_SPACE)
    w = F.col(weight_col).cast("double")
    score = -F.log(u) / w
    scored = df.filter(
        F.col(weight_col).isNotNull() & (w > 0)
    ).withColumn("_es_score", score)
    if strata_col is None:
        out = scored.orderBy(
            F.col("_es_score").asc(), F.col(key_col).asc()
        ).limit(int(k))
    else:
        win = Window.partitionBy(strata_col).orderBy(
            F.col("_es_score").asc(), F.col(key_col).asc()
        )
        out = (
            scored.withColumn("_es_rn", F.row_number().over(win))
            .filter(F.col("_es_rn") <= int(k))
            .drop("_es_rn")
        )
    return out if with_score else out.drop("_es_score")
