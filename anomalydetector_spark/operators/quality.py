"""Gopher-rule document quality filter (Rae et al. 2021, MassiveText,
Appendix A.1.1) — the published heuristic gate most web-scale training
pipelines run between dedup and mixing.

`text.quality_score` is a soft composite score; this operator is the
published HARD filter: every rule is a named boolean flag so corpus
curators can audit which rule fired (the standard practice — dropping
silently makes filter-rate drift undebuggable), plus a final ``keep``.

One projection, fully codegen (token/line arrays built once per row,
every rule reads them) — zero shuffle, zero Python, so at 10^12 docs the
gate fuses into whatever scan precedes it.

Rules (flag true = PASSES that rule):

* ``ok_word_count``   — 50 ≤ words ≤ 100,000
* ``ok_mean_word_len``— 3 ≤ mean word length ≤ 10
* ``ok_symbol_ratio`` — #/words ≤ 0.1 AND ellipses/words ≤ 0.1
  (per symbol, as the paper applies it — not their sum)
* ``ok_bullet_lines`` — < 90% of lines start with a bullet
* ``ok_ellipsis_lines``— < 30% of lines end with an ellipsis
* ``ok_alpha_words``  — ≥ 80% of words contain ≥ 1 alphabetic char
* ``ok_stopwords``    — ≥ 2 distinct hits from the 8-word stop list

Thresholds are keyword arguments; defaults are the paper's values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from anomalydetector_spark.functions import tokens

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
BULLETS = ("-", "*", "•", "‣", "◦")  # -, *, •, ‣, ◦


def gopher_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Append the per-rule flags and ``keep`` (AND of all rules)."""
    c = F.col(text_col)
    toks = F.col("_qt")
    lines = F.col("_ql")
    n_words = F.size(toks)
    n_lines = F.greatest(F.size(lines), F.lit(1)).cast("double")

    mean_wl = F.aggregate(
        toks, F.lit(0.0), lambda acc, t: acc + F.length(t)
    ) / F.greatest(n_words, F.lit(1)).cast("double")

    # the paper applies the ratio threshold PER symbol (hash-to-word and
    # ellipsis-to-word each <= 0.1), not to their sum — a doc at 0.06 on
    # each must pass. '...' counts per non-overlapping literal run.
    hashes = F.regexp_count(c, F.lit("#")).cast("double")
    ellipses = (
        F.regexp_count(c, F.lit(r"\.{3}")) + F.regexp_count(c, F.lit("…"))
    ).cast("double")

    # "starting with a bullet point": any bullet char opening the trimmed
    # line, with or without a following space ('*item' is a bullet line)
    def _is_bullet(l):
        t = F.trim(l)
        cond = t.startswith(BULLETS[0])
        for b in BULLETS[1:]:
            cond = cond | t.startswith(b)
        return cond

    bullet_lines = F.size(F.filter(lines, _is_bullet)).cast("double")
    ellipsis_lines = F.size(
        F.filter(
            lines,
            lambda l: F.trim(l).endswith("...") | F.trim(l).endswith("…"),
        )
    ).cast("double")

    alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
            lambda s: F.array_contains(toks, s),
        )
    )

    flags = {
        "n_words": n_words,
        "ok_word_count": (n_words >= min_words) & (n_words <= max_words),
        "ok_mean_word_len": (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len),
        "ok_symbol_ratio": (
            hashes / F.greatest(n_words, F.lit(1)).cast("double")
            <= max_symbol_ratio
        )
        & (
            ellipses / F.greatest(n_words, F.lit(1)).cast("double")
            <= max_symbol_ratio
        ),
        "ok_bullet_lines": bullet_lines / n_lines < max_bullet_line_frac,
        "ok_ellipsis_lines": ellipsis_lines / n_lines < max_ellipsis_line_frac,
        "ok_alpha_words": alpha_words
        / F.greatest(n_words, F.lit(1)).cast("double")
        >= min_alpha_word_frac,
        "ok_stopwords": stop_hits >= min_stopword_hits,
    }
    out = (
        df.withColumns(
            {"_qt": tokens(F.lower(c)), "_ql": F.split(F.coalesce(c, F.lit("")), "\n")}
        )
        .withColumns(flags)
        .drop("_qt", "_ql")
    )
    keep = None
    for name in flags:
        if name == "n_words":
            continue
        keep = F.col(name) if keep is None else keep & F.col(name)
    return out.withColumn("keep", keep)


def gopher_filter(df: DataFrame, text_col: str = "text", **thresholds) -> DataFrame:
    """Rows passing every Gopher rule, original columns only."""
    flagged = gopher_quality_flags(df, text_col=text_col, **thresholds)
    return flagged.filter(F.col("keep")).select(*df.columns)


def fineweb_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    min_line_punct_ratio: float = 0.12,
    max_dup_line_char_frac: float = 0.1,
    max_short_line_frac: float = 0.67,
    short_line_chars: int = 30,
) -> DataFrame:
    """The three FineWeb custom filters (Penedo et al. 2024, "The
    FineWeb Datasets", §3.6 — the rules they added ON TOP of the C4 and
    Gopher sets after ablating 10^13 tokens): a page is dropped when

    1. the fraction of its lines ending with terminal punctuation is
       ≤ ``min_line_punct_ratio`` (0.12),
    2. the fraction of its characters sitting in DUPLICATED lines is
       ≥ ``max_dup_line_char_frac`` (0.1),
    3. the fraction of its lines shorter than ``short_line_chars`` (30)
       characters is ≥ ``max_short_line_frac`` (0.67).

    Thresholds are the paper's; tie/boundary conventions and line
    handling are pinned HERE (the paper does not specify them): lines
    split on ``\\n`` with empties INCLUDED in the two line-count ratios
    (an empty line neither ends with punctuation nor reaches 30 chars —
    both read as structure damage, which is what the rules hunt) and
    EXCLUDED from the duplicate-character mass (repeated blank lines
    are layout, not copied content); "ends with punctuation" tests the
    TRIMMED line against ``. ! ? " '``; duplicate-character mass counts
    every occurrence beyond a line's first, over non-empty line chars.

    Everything is one in-row projection (zero shuffles, zero Python) —
    the duplicate-line scan is O(L²) per doc in distinct-line count,
    bounded by page line counts, not corpus size. Ratios are emitted at
    6 dp (exact — integer-over-integer division rounds identically in
    any engine). Returns the input + the three ratios + per-rule flags
    + ``keep``.
    """
    c = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(c, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1)).cast("double")

    punct_lines = F.size(
        F.filter(
            lines,
            lambda l: F.trim(l).rlike("[.!?\"']$"),
        )
    ).cast("double")
    short_lines = F.size(
        F.filter(lines, lambda l: F.length(l) < short_line_chars)
    ).cast("double")

    nonempty = F.filter(lines, lambda l: l != F.lit(""))
    total_chars = F.aggregate(
        nonempty, F.lit(0), lambda acc, l: acc + F.length(l)
    )
    # chars in occurrences beyond each line's first: per DISTINCT line,
    # (count - 1) * len
    dup_chars = F.aggregate(
        F.transform(
            F.array_distinct(nonempty),
            lambda d: (
                F.size(F.filter(nonempty, lambda l: l == d)) - F.lit(1)
            )
            * F.length(d),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )

    punct_ratio = F.round(punct_lines / n_lines, 6)
    short_frac = F.round(short_lines / n_lines, 6)
    dup_frac = F.round(
        dup_chars.cast("double")
        / F.greatest(total_chars, F.lit(1)).cast("double"),
        6,
    )
    flags = {
        "line_punct_ratio": punct_ratio,
        "dup_line_char_frac": dup_frac,
        "short_line_frac": short_frac,
        "ok_line_punct": punct_ratio > F.lit(min_line_punct_ratio),
        "ok_dup_lines": dup_frac < F.lit(max_dup_line_char_frac),
        "ok_short_lines": short_frac < F.lit(max_short_line_frac),
    }
    out = df.withColumns(flags)
    return out.withColumn(
        "keep",
        F.col("ok_line_punct") & F.col("ok_dup_lines") & F.col("ok_short_lines"),
    )


def fineweb_filter(df: DataFrame, text_col: str = "text", **thresholds) -> DataFrame:
    """Rows passing every FineWeb rule, original columns only."""
    flagged = fineweb_quality_flags(df, text_col=text_col, **thresholds)
    return flagged.filter(F.col("keep")).select(*df.columns)
