"""Paragraph-level language identification and mixed-document surgery.

CCNet identifies language at PARAGRAPH granularity and keeps only the
target-language paragraphs (Wenzek et al. 2020 §3 — public method):
web pages routinely interleave navigation/boilerplate in one language
with content in another, and a document-level vote either drops the
whole page or keeps the contamination. This module scores every
paragraph with the repo's marker-vote ``lang_id``
(`operators/text.py`), summarizes per-document mixing, and rebuilds
majority-language texts byte-exactly.

Scale shape (10^12 docs): EVERYTHING is in-row. Paragraph splitting,
per-paragraph language votes (``lang_id`` nests inside a ``transform``
lambda), token-weighted majority election, and the filtered rebuild are
one fully-codegen projection — zero shuffle, zero join, zero Python,
text never leaves its row (the `scrub.py` ethos; the only exploded
surface is the optional inspection view). At 100 TB the pass is
scan-bound like the other pure projections.

Determinism contract (mirrored by the DuckDB oracle):

* paragraphs split on a LITERAL separator (regex-escaped — the
  `scrub.py` round-1 advice); blank/whitespace-only paragraphs carry
  language ``'und'`` and zero tokens;
* per-paragraph vote = ``lang_id``'s exact semantics (marker-token
  hits, ties to the lexicographically LARGEST language — the
  ``greatest``-struct order — ``'und'`` when nothing hits);
* majority = the language with the most TOKENS summed over its
  paragraphs (``'und'`` paragraphs never vote), same tie order as the
  paragraph vote; a document with no voting tokens has majority
  ``'und'``;
* surgery keeps paragraphs whose language equals the majority OR is
  ``'und'`` (unknown is not evidence of wrong language — blanks and
  marker-free paragraphs survive), rebuilt with the same separator; a
  majority-``'und'`` document passes through unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from anomalydetector_spark.functions import tokens
from anomalydetector_spark.operators.scrub import _quote_regex
from anomalydetector_spark.operators.text import LANG_MARKERS, lang_id


def _paras(text_col: str, sep: str) -> Column:
    """Literal-separator paragraph split (Java-regex \\Q quoting, the
    scrub.py convention; NULL text → empty array)."""
    return F.coalesce(
        F.split(F.col(text_col), _quote_regex(sep)),
        F.array().cast("array<string>"),
    )


def _para_langs(paras: Column) -> Column:
    """Per-paragraph language votes — ``lang_id`` nested in-row."""
    return F.transform(paras, lambda p: lang_id(p))


def _majority(paras: Column, langs: Column) -> Column:
    """Token-weighted majority language as a (tokens, lang) struct.

    ``greatest`` over per-language structs reproduces ``lang_id``'s own
    tie order (larger language wins). Returns hits = 0 ⇒ no paragraph
    voted (majority 'und')."""
    wts = F.transform(paras, lambda p: F.size(tokens(F.lower(p))))
    per_lang = [
        F.struct(
            F.aggregate(
                F.zip_with(
                    langs,
                    wts,
                    lambda l, w: F.when(l == F.lit(lang), w).otherwise(
                        F.lit(0)
                    ),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("toks"),
            F.lit(lang).alias("lang"),
        )
        for lang in sorted(LANG_MARKERS)
    ]
    return F.greatest(*per_lang)


def paragraph_langs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """Inspection view: one row per paragraph — ``(id_col, para_idx,
    para_lang, n_tokens)``, 0-based index in document order. The only
    exploding surface in the module; the summary and the surgery never
    pay it."""
    paras = _paras(text_col, sep)
    out = docs.select(
        F.col(id_col), F.posexplode_outer(paras).alias("para_idx", "_p")
    )
    return out.select(
        id_col,
        "para_idx",
        lang_id(F.col("_p")).alias("para_lang"),
        F.size(tokens(F.lower(F.col("_p")))).alias("n_tokens"),
    )


def lang_segmentation(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_dominant_share: float = 0.8,
) -> DataFrame:
    """Per-document mixing summary: ``(id_col, n_paragraphs,
    majority_lang, majority_tokens, voting_tokens, dominant_share,
    is_mixed)``.

    ``dominant_share`` = majority tokens / tokens in ALL voting
    (non-'und') paragraphs, 6dp, NULL when nothing voted. ``is_mixed``
    flags documents whose majority holds less than
    ``min_dominant_share`` of the voting tokens — the CCNet drop/split
    candidates. One codegen projection, zero shuffle."""
    paras = _paras(text_col, sep)
    langs = _para_langs(paras)
    best = _majority(paras, langs)
    wts = F.transform(paras, lambda p: F.size(tokens(F.lower(p))))
    voting = F.aggregate(
        F.zip_with(
            langs,
            wts,
            lambda l, w: F.when(l != F.lit("und"), w).otherwise(F.lit(0)),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    majority = F.when(best["toks"] > 0, best["lang"]).otherwise(F.lit("und"))
    share = F.when(
        voting > 0, F.round(best["toks"] / voting, 6)
    )
    return docs.select(
        F.col(id_col),
        F.size(paras).alias("n_paragraphs"),
        majority.alias("majority_lang"),
        best["toks"].cast("long").alias("majority_tokens"),
        voting.cast("long").alias("voting_tokens"),
        share.alias("dominant_share"),
        F.coalesce(
            share < F.lit(min_dominant_share), F.lit(False)
        ).alias("is_mixed"),
    )


def keep_majority_paragraphs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """Byte-exact mixed-document surgery: keep every paragraph whose
    language equals the document's majority or is ``'und'``, rebuild
    with ``sep``. Output: ``(id_col, text, dropped_paragraphs,
    total_paragraphs)``. Majority-``'und'`` documents pass through
    unchanged. One codegen projection — text never crosses a shuffle."""
    paras = _paras(text_col, sep)
    langs = _para_langs(paras)
    best = _majority(paras, langs)
    majority = F.when(best["toks"] > 0, best["lang"]).otherwise(F.lit("und"))
    kept = F.zip_with(
        paras,
        langs,
        lambda p, l: F.when(
            (l == majority) | (l == F.lit("und")), p
        ).otherwise(F.lit(None).cast("string")),
    )
    kept = F.filter(kept, lambda p: p.isNotNull())
    return docs.select(
        F.col(id_col),
        F.when(F.col(text_col).isNull(), F.lit(None).cast("string"))
        .otherwise(F.concat_ws(sep, kept))
        .alias(text_col),
        (F.size(paras) - F.size(kept)).cast("int").alias(
            "dropped_paragraphs"
        ),
        F.size(paras).cast("int").alias("total_paragraphs"),
    )
