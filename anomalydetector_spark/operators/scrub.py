"""Corpus scrubbing: line-level boilerplate removal and PII redaction.

Two standard web-pipeline stages the reference (a series detector) does
not have but any Common-Crawl-style training corpus needs:

* **Line/paragraph-level dedup** (the CCNet protocol, Wenzek et al.
  2020 §3.1: hash every paragraph, drop paragraphs whose hash repeats
  across the corpus — this is what strips cookie banners, nav menus and
  boilerplate that document-level dedup can't see).
* **PII redaction**: regex scrubbing of emails / IPv4 addresses /
  phone numbers, entirely in JVM codegen (``regexp_replace`` /
  ``regexp_count``) with RE2-compatible patterns so a DuckDB oracle
  reproduces the exact redacted strings.

Scale shape (boilerplate): one explode of the corpus into lines with a
16-byte md5 line hash (md5, not xxhash64 — at 10^12 lines a 64-bit hash
has ~27k birthday collisions, each of which would delete an innocent
line), one hash-grouped count (map-side partial aggregation), then a
left-anti join of the exploded lines against the (much smaller)
boilerplate set and one regroup by doc to reconstruct text. Two
shuffles of (hash | doc_id)-keyed rows total; the boilerplate set
itself is tiny relative to the corpus and AQE will broadcast it when it
fits. PII redaction is a pure narrow projection — zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: kind -> (regex, replacement token). Patterns restricted to the
#: RE2-compatible subset of Java regex (no lookaround, no backrefs) so
#: Spark and the DuckDB oracle redact byte-identically. Applied in this
#: dict order — email first (it contains dots an IP pattern could claim),
#: then IPv4, then plus-prefixed phone runs (which can never overlap an
#: already-redacted token).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "phone": (r"\+\d[\d() -]{6,}\d", "<PHONE>"),
}


def _line_hash(line: Column) -> Column:
    """16-byte binary md5 of the TRIMMED line — the dedup key. Binary
    md5 is 4x smaller than raw text in the shuffle and collision-safe at
    web scale (128 bits)."""
    return F.unhex(F.md5(F.encode(F.trim(line), "UTF-8")))


def doc_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """Explode ``text_col`` into ``(id_col, pos, line)`` — one row per
    line, ``pos`` 0-based so the doc can be reconstructed in order.
    Null texts produce no rows (null split explodes to nothing)."""
    return df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line"),
    )


def boilerplate_line_set(
    df: DataFrame,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """``(line, n_docs)`` for every non-blank trimmed line occurring in
    at least ``min_docs`` DISTINCT documents — the CCNet boilerplate
    dictionary. Counting distinct docs (not raw occurrences) keeps a
    single spammy page from promoting its own refrain to boilerplate.

    Grouping is by the 16-byte md5 of the trimmed line; ``first(line)``
    is deterministic because every line in a hash group is identical
    (md5 collisions aside). The distinct-count aggregates map-side via
    Spark's two-phase distinct rewrite.
    """
    lines = doc_lines(df, text_col=text_col, id_col=id_col, sep=sep)
    return (
        lines.filter(F.trim("line") != "")
        .groupBy(_line_hash(F.col("line")).alias("line_hash"))
        .agg(
            F.first(F.trim(F.col("line"))).alias("line"),
            F.count_distinct(F.col(id_col)).alias("n_docs"),
        )
        .filter(F.col("n_docs") >= min_docs)
        .select("line_hash", "line", "n_docs")
    )


def drop_boilerplate_lines(
    df: DataFrame,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """``(id_col, text_col)`` with every boilerplate line (per
    :func:`boilerplate_line_set`) removed and the remaining lines
    rejoined in their original order with ``sep``.

    Matching is on the TRIMMED line (whitespace-variant copies of a
    banner still count as the same line); blank lines are never
    boilerplate and are preserved. Documents whose every line is
    boilerplate — pure banner pages — drop out of the result entirely,
    as do null-text docs; callers keeping other columns join this frame
    back on ``id_col``.
    """
    bp = boilerplate_line_set(
        df, min_docs=min_docs, text_col=text_col, id_col=id_col, sep=sep
    ).select("line_hash")
    lines = doc_lines(df, text_col=text_col, id_col=id_col, sep=sep)
    kept = lines.join(
        bp, _line_hash(F.col("line")) == bp["line_hash"], "left_anti"
    )
    return (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda x: x["line"],
                ),
                sep,
            ).alias(text_col)
        )
    )


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    kinds: tuple[str, ...] = ("email", "ipv4", "phone"),
    out_col: str | None = None,
) -> DataFrame:
    """Replace every PII match with its ``<KIND>`` token — a chained
    ``regexp_replace`` projection, fully codegen, zero shuffles. Kinds
    are applied in :data:`PII_PATTERNS` order regardless of the order
    given, so the output is deterministic."""
    col = F.col(text_col)
    for kind in PII_PATTERNS:
        if kind in kinds:
            pat, tok = PII_PATTERNS[kind]
            col = F.regexp_replace(col, pat, tok)
    return df.withColumn(out_col or text_col, col)


def pii_profile(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    kinds: tuple[str, ...] = ("email", "ipv4", "phone"),
) -> DataFrame:
    """``(id_col, n_<kind>...)`` match counts per document — the audit
    surface to run before/after :func:`redact_pii` (after a clean
    redaction every count is zero). Pure ``regexp_count`` projection."""
    cols = [F.col(id_col)]
    for kind in kinds:
        pat, _ = PII_PATTERNS[kind]
        cols.append(
            F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{kind}")
        )
    return df.select(*cols)
