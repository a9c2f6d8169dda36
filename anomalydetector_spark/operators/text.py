"""Text-analysis operators for web-scale corpora — all pure JVM column
expressions (no Python in the hot path), each usable standalone or as a
stat feeding the drift engine.

* token counting (whitespace + a BPE-ish subword regex),
* quality scoring (length / punctuation / stopword / repetition ratios),
* language ID via marker-token voting (n-gram heuristic),
* document fingerprinting (polynomial rolling hash over tokens).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from anomalydetector_spark.functions import md5_long, tokens

STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "for",
    "on", "with", "as", "at", "by",
)

# marker tokens per language for the voting heuristic; at production scale
# this table would be a broadcast dimension, the plan shape is identical
LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "est"),
    "es": ("el", "la", "los", "que", "es"),
    "zh": ("的", "是", "了", "在", "我"),
}


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def subword_count(col: Column) -> Column:
    """BPE-ish proxy: count alphanumeric runs and punctuation marks as
    separate units (what a byte-pair tokenizer's pre-tokenizer does).

    Computed as ``regexp_count(\\w+) + regexp_count([^\\w\\s])`` — exactly
    the pieces the lookaround-split formulation produces (verified equal
    on 1M docs) without materializing a per-character array (1.5×
    faster)."""
    return F.regexp_count(col, F.lit(r"\w+")) + F.regexp_count(
        col, F.lit(r"[^\w\s]")
    )


def punct_ratio(col: Column) -> Column:
    stripped = F.regexp_replace(col, r"[\p{L}\p{N}\s]", "")
    return F.length(stripped) / F.greatest(F.length(col), F.lit(1))


def stopword_ratio(col: Column) -> Column:
    toks = tokens(F.lower(col))
    stop = F.size(
        F.filter(toks, lambda t: t.isin(*[F.lit(s) for s in STOPWORDS]))
    )
    return stop / F.greatest(F.size(toks), F.lit(1)).cast("double")


def repetition_ratio(col: Column) -> Column:
    """1 − (distinct tokens / tokens): high → boilerplate/spam."""
    toks = tokens(F.lower(col))
    return F.lit(1.0) - F.size(F.array_distinct(toks)) / F.greatest(
        F.size(toks), F.lit(1)
    ).cast("double")


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: length in a sane band, some
    stopwords, low punctuation, low repetition — the standard web-text
    filters (C4/Gopher-style) expressed as one column program."""
    n_tok = token_count(col).cast("double")
    len_ok = F.when((n_tok >= 10) & (n_tok <= 10000), 1.0).otherwise(
        F.least(n_tok / 10.0, F.lit(1.0))
    )
    stop_ok = F.least(stopword_ratio(col) * 5.0, F.lit(1.0))
    punct_ok = F.lit(1.0) - F.least(punct_ratio(col) * 4.0, F.lit(1.0))
    rep_ok = F.lit(1.0) - repetition_ratio(col)
    return (len_ok + stop_ok + punct_ok + rep_ok) / 4.0


def lang_id(col: Column, toks: Column | None = None) -> Column:
    """Marker-token vote: the language whose marker set hits the most
    tokens wins ('und' → unknown when nothing hits). One filtered count
    per language over the shared token array, then ``greatest`` over
    (hits, lang) structs — no UDF. (A create_map-literal lookup per token
    measured 1.8× SLOWER: Catalyst re-materializes the map expression per
    element, so the flat isin chain wins; verified output-identical on
    1M docs.)"""
    toks = tokens(F.lower(col)) if toks is None else toks
    scores = [
        F.struct(
            F.size(
                F.filter(toks, lambda t: t.isin(*[F.lit(m) for m in markers]))
            ).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    best = F.greatest(*scores)
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(col: Column, mod: int = 1_000_000_007) -> Column:
    """Order-sensitive polynomial rolling hash over tokens:
    ``acc = (acc * 31 + md5_long(token)) % mod`` — reproducible in ANSI
    SQL (DuckDB ``list_reduce``), unlike a Python ``hash``."""
    return F.aggregate(
        tokens(col),
        F.lit(0).cast("long"),
        lambda acc, t: (acc * 31 + F.pmod(md5_long(t), F.lit(mod))) % mod,
    )


def fast_fingerprint(col: Column) -> Column:
    """One-hash-per-document fingerprint over normalized tokens — the
    100-TB path (xxhash64 is a single JVM call per row; the per-token
    rolling hash in :func:`fingerprint` costs one md5 per token and exists
    for its ANSI-SQL reproducibility)."""
    return F.xxhash64(F.concat_ws(" ", tokens(F.lower(col))))


def text_profile(
    df: DataFrame, text_col: str = "text", rolling_fingerprint: bool = False
) -> DataFrame:
    """All text stats in one projection — single scan, fully codegen'd.

    The tokenized array is materialized ONCE as an intermediate column and
    every derived stat reads it: Spark's subexpression elimination does
    not reliably merge the repeated ``split`` trees across output columns,
    and re-tokenizing per stat measurably dominates the pass (~25% wall at
    1M docs)."""
    c = F.col(text_col)
    lt = F.col("_lt")
    n_tok = F.size(lt).cast("double")
    stop = F.size(
        F.filter(lt, lambda t: t.isin(*[F.lit(s) for s in STOPWORDS]))
    ) / F.greatest(F.size(lt), F.lit(1)).cast("double")
    rep = F.lit(1.0) - F.size(F.array_distinct(lt)) / F.greatest(
        F.size(lt), F.lit(1)
    ).cast("double")
    pr = punct_ratio(c)
    len_ok = F.when((n_tok >= 10) & (n_tok <= 10000), 1.0).otherwise(
        F.least(n_tok / 10.0, F.lit(1.0))
    )
    quality = (
        len_ok
        + F.least(stop * 5.0, F.lit(1.0))
        + (F.lit(1.0) - F.least(pr * 4.0, F.lit(1.0)))
        + (F.lit(1.0) - rep)
    ) / 4.0
    return (
        df.withColumn("_lt", tokens(F.lower(c)))
        .withColumns(
            {
                "n_tokens": F.size(lt),
                "n_subwords": subword_count(c),
                "punct_ratio": pr,
                "stopword_ratio": stop,
                "repetition_ratio": rep,
                "quality": quality,
                "lang_pred": lang_id(c, toks=lt),
                "fingerprint": fingerprint(c)
                if rolling_fingerprint
                else F.xxhash64(F.concat_ws(" ", lt)),
            }
        )
        .drop("_lt")
    )


def repetition_profile(
    df: DataFrame,
    text_col: str = "text",
    ns: tuple[int, ...] = (2, 5),
) -> DataFrame:
    """Gopher-style within-document repetition metrics (Rae et al. 2021
    §A1.1): for each n in ``ns`` add

    * ``top_{n}gram_frac`` — char mass of the dominant n-gram
      (occurrences × chars) over the total n-gram char mass,
    * ``dup_{n}gram_frac`` — char mass of all n-grams occurring ≥ 2
      times over the total.

    Returns the INPUT FRAME plus the metric columns (row-wise projection,
    no id needed); the scale twin :func:`repetition_profile_arrow`
    instead returns a metrics frame keyed by id — see its docstring.

    This is the EXACT / SQL-twin implementation: the n-gram array stays
    inside the row and counts come from RUN LENGTHS of the sorted array
    (``array_sort`` → boundary indices → ``zip_with`` run/char-mass
    pairs) — zero shuffle, zero Python, string-exact (no hashing), and
    shape-for-shape reproducible by the DuckDB oracle. Each intermediate
    array is materialized once per projection stage (CollapseProject
    keeps multi-referenced non-cheap expressions staged).

    Measured at 1M pages / local[32]: ~6k docs/s — Catalyst interprets
    higher-order-function lambdas per element (~1µs/gram), so for bulk
    scans use :func:`repetition_profile_arrow` (identical values,
    measured 11× faster; an exploded groupBy(doc, gram) variant was
    also measured and rejected — the per-gram shuffle made it slower
    than both). Value equality between the two is pinned by tests.
    """
    out = df
    for n in ns:
        gc, sc, pc = f"_g{n}", f"_s{n}", f"_p{n}"
        toks = tokens(F.lower(F.col(text_col)))
        # guarded: sequence(1, 0) DESCENDS and sequence(1, 0, 1) throws,
        # so docs shorter than n tokens get an explicit empty gram list
        grams = F.transform(
            F.when(
                F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
            ).otherwise(F.array().cast("array<int>")),
            # NOTE: must stay a ONE-parameter lambda — pyspark binds a
            # second parameter to the array index (a `k=n` default arg
            # silently becomes the index); n is safe to close over
            # because transform() consumes the lambda immediately
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
        out = out.withColumn(gc, F.array_sort(grams))
        g = F.col(gc)
        empty_ints = F.array().cast("array<int>")
        out = out.withColumn(
            sc,
            F.when(
                F.size(g) > 0,
                F.filter(
                    F.sequence(F.lit(0), F.size(g) - 1),
                    lambda i: (i == F.lit(0)) | (F.get(g, i) != F.get(g, i - 1)),
                ),
            ).otherwise(empty_ints),
        )
        s = F.col(sc)
        ends = F.concat(
            F.slice(s, 2, F.greatest(F.size(s) - 1, F.lit(0))),
            F.when(F.size(g) > 0, F.array(F.size(g))).otherwise(empty_ints),
        )
        out = out.withColumn(
            pc,
            F.zip_with(
                s,
                ends,
                lambda st, en: F.struct(
                    (en - st).alias("c"), F.length(F.get(g, st)).alias("m")
                ),
            ),
        )
        p = F.col(pc)
        total = F.aggregate(p, F.lit(0), lambda a, x: a + x["c"] * x["m"])
        top = F.array_max(F.transform(p, lambda x: x["c"] * x["m"]))
        dup = F.aggregate(
            p,
            F.lit(0),
            lambda a, x: a + F.when(x["c"] >= 2, x["c"] * x["m"]).otherwise(F.lit(0)),
        )
        out = (
            out.withColumn(
                f"top_{n}gram_frac",
                F.when(total > 0, top / total).otherwise(F.lit(0.0)),
            )
            .withColumn(
                f"dup_{n}gram_frac",
                F.when(total > 0, dup / total).otherwise(F.lit(0.0)),
            )
            .drop(gc, sc, pc)
        )
    return out


def repetition_profile_arrow(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ns: tuple[int, ...] = (2, 5),
) -> DataFrame:
    """The SCALE path for :func:`repetition_profile`: same metrics,
    identical values (hash-collision caveat ~2e-14/doc), measured
    67k docs/s at 1M pages on local[32] — 11× the in-row HOF variant
    (Catalyst interprets HOF lambdas per element) and 15× an exploded
    groupBy(doc, gram) variant (per-gram shuffle).

    Column contract differs from the HOF twin: this returns ONLY
    ``(id_col, top/dup_ngram_frac...)`` — a metrics frame to join back
    on ``id_col`` when other columns are needed. That is deliberate:
    only token hashes and lengths cross the Arrow boundary, never the
    text or any other column, so the batch pass stays small and the
    metrics remain a pure projection of the scan.

    The JVM side does ONE cheap pass per token (xxhash64 + length into
    two long/int arrays) and a single Arrow batch pass does everything
    else vectorized in numpy with no per-element Python:

    * gram hashes = polynomial combination of n consecutive token
      hashes (strided adds, uint64 wraparound),
    * gram char masses from a cumsum of token lengths,
    * counts per (doc, gram) = run lengths of the lexsorted
      (doc, hash) stream (``np.lexsort`` + boundary diffs),
    * per-doc top/dup/total masses via ``reduceat`` segment reductions.

    Zero shuffle — the metrics are a projection of the scan — and the
    only Python executed per element is compiled numpy.
    """
    import numpy as np
    import pandas as pd

    spark_id_type = dict(df.dtypes)[id_col]
    out_schema = f"{id_col} {spark_id_type}, " + ", ".join(
        f"top_{n}gram_frac double, dup_{n}gram_frac double" for n in ns
    )
    # one polynomial constant per offset, precomputed mod 2^64
    P = 0x9E3779B97F4A7C15
    powers = {n: [pow(P, j, 1 << 64) for j in range(n)] for n in ns}

    toks = tokens(F.lower(F.col(text_col)))
    # null text → empty arrays JVM-side so the numpy pass never sees None
    prepped = df.select(
        F.col(id_col),
        F.coalesce(
            F.transform(toks, lambda t: F.xxhash64(t)),
            F.array().cast("array<long>"),
        ).alias("_th"),
        F.coalesce(
            F.transform(toks, lambda t: F.length(t)),
            F.array().cast("array<int>"),
        ).alias("_tl"),
    )

    def batch(it):
        for pdf in it:
            nrows = len(pdf)
            res = {id_col: pdf[id_col]}
            th_rows = pdf["_th"].to_numpy()
            tl_rows = pdf["_tl"].to_numpy()
            lens = np.fromiter((len(a) for a in th_rows), dtype=np.int64, count=nrows)
            flat_h = (
                np.concatenate(th_rows).astype(np.uint64)
                if lens.sum()
                else np.empty(0, np.uint64)
            )
            flat_l = (
                np.concatenate(tl_rows).astype(np.int64)
                if lens.sum()
                else np.empty(0, np.int64)
            )
            row_of = np.repeat(np.arange(nrows), lens)
            # cumsum with leading 0 so char mass of toks[i..j] is cl[j+1]-cl[i]
            cl = np.concatenate(([0], np.cumsum(flat_l)))
            for n in ns:
                top = np.zeros(nrows)
                dup = np.zeros(nrows)
                tot = np.zeros(nrows)
                if len(flat_h) >= n:
                    # gram start positions whose n tokens stay in one row
                    valid = row_of[: len(row_of) - n + 1] == row_of[n - 1 :]
                    idx = np.nonzero(valid)[0]
                    if len(idx):
                        g = np.zeros(len(idx), np.uint64)
                        for j, pw in enumerate(powers[n]):
                            g += flat_h[idx + j] * np.uint64(pw)
                        gm = cl[idx + n] - cl[idx] + (n - 1)
                        grow = row_of[idx]
                        perm = np.lexsort((g, grow))
                        gs, rs = g[perm], grow[perm]
                        run_start = np.nonzero(
                            np.concatenate(
                                ([True], (gs[1:] != gs[:-1]) | (rs[1:] != rs[:-1]))
                            )
                        )[0]
                        cnt = np.diff(np.concatenate((run_start, [len(gs)])))
                        mass = cnt * gm[perm[run_start]]
                        run_row = rs[run_start]
                        row_start = np.nonzero(
                            np.concatenate(([True], run_row[1:] != run_row[:-1]))
                        )[0]
                        rows_present = run_row[row_start]
                        tot[rows_present] = np.add.reduceat(mass, row_start)
                        top[rows_present] = np.maximum.reduceat(mass, row_start)
                        dup[rows_present] = np.add.reduceat(
                            np.where(cnt >= 2, mass, 0), row_start
                        )
                safe = np.where(tot > 0, tot, 1.0)
                res[f"top_{n}gram_frac"] = top / safe
                res[f"dup_{n}gram_frac"] = dup / safe
            yield pd.DataFrame(res)

    return prepped.mapInPandas(batch, schema=out_schema)
