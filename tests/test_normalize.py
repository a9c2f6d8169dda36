"""Unicode normalization op + check (operators/normalize)."""

import unicodedata

import duckdb
import pytest

from anomalydetector_spark.operators.normalize import (
    check_unicode_normalization,
    normalize_unicode,
)

# decomposed accent, ligature, full-width digits, Hangul jamo, combining
# enclosing mark, already-NFC text, empty, ascii
CASES = [
    "éclair",          # NFD accent -> é
    "ﬁnance",           # ﬁ ligature (NFKC-only change)
    "１２３",    # full-width 123 (NFKC-only change)
    "한",    # Hangul jamo -> composed 한
    "already normal",
    "",
    "café",             # already NFC
]


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def test_normalize_matches_unicodedata(spark):
    for form in ("NFC", "NFKC", "NFD", "NFKD"):
        out = normalize_unicode(_docs(spark, CASES), form=form)
        got = {r.doc_id: r[f"text_{form.lower()}"] for r in out.collect()}
        want = {i: unicodedata.normalize(form, t) for i, t in enumerate(CASES)}
        assert got == want, form


def test_null_passthrough(spark):
    df = spark.createDataFrame([(1, None)], "doc_id bigint, text string")
    out = normalize_unicode(df).collect()
    assert out[0].text_nfc is None


def test_invalid_form_rejected(spark):
    with pytest.raises(ValueError, match="form must be one of"):
        normalize_unicode(_docs(spark, ["x"]), form="NFX")


def test_nfc_agrees_with_duckdb_utf8proc(spark):
    """The oracle contract: CPython unicodedata and DuckDB's utf8proc
    produce identical NFC bytes (Unicode normalization stability)."""
    out = normalize_unicode(_docs(spark, CASES), form="NFC").collect()
    con = duckdb.connect()
    for r in sorted(out, key=lambda r: r.doc_id):
        (duck,) = con.execute(
            "SELECT nfc_normalize(?)", [CASES[r.doc_id]]
        ).fetchone()
        assert r.text_nfc == duck, CASES[r.doc_id]


def test_check_flags_only_unnormalized(spark):
    df = _docs(spark, CASES)
    res = check_unicode_normalization(df, form="NFC")
    v = res.verdicts.collect()[0]
    # NFC changes cases 0 and 3 only (ligature/full-width are NFKC)
    assert (v.passed, v.violation_count, v.rows_scanned) == (False, 2, 7)
    assert "normalization form NFC" in v.error_message
    viol = {r.text for r in res.violations.collect()}
    assert viol == {CASES[0], CASES[3]}


def test_check_passes_on_clean_partitioned(spark):
    df = spark.createDataFrame(
        [(1, "clean", "en"), (2, "café", "fr")],
        "doc_id bigint, text string, lang string",
    )
    res = check_unicode_normalization(df, partition_by="lang")
    rows = {r.partition_key: r for r in res.verdicts.collect()}
    assert all(r.passed for r in rows.values())
    assert set(rows) == {"en", "fr"}
    assert res.violations.count() == 0


def test_check_null_text_not_violation(spark):
    df = spark.createDataFrame([(1, None)], "doc_id bigint, text string")
    v = check_unicode_normalization(df).verdicts.collect()[0]
    assert v.passed and v.violation_count == 0


def test_engine_unicode_opt_in(spark, pages):
    """unicode_form='NFC' adds the check to the engine suite; the clean
    synthetic pages table passes; a decomposed-accent row violates."""
    from pyspark.sql import functions as F

    from anomalydetector_spark.engine import ValidationConfig, run_validation

    res = run_validation(pages, config=ValidationConfig(unicode_form="NFC"))
    v = res.verdicts.filter("check_name = 'unicode_nfc'").collect()
    assert v and all(r.passed for r in v)
    res.unpersist()

    poisoned = pages.limit(50).withColumn(
        "text",
        F.when(F.col("url").isNotNull(), F.concat(F.col("text"), F.lit("e\u0301"))),
    )
    res2 = run_validation(poisoned, config=ValidationConfig(unicode_form="NFC"))
    bad = res2.verdicts.filter("check_name = 'unicode_nfc'").collect()
    assert bad and all(not r.passed for r in bad)
    urls = res2.violations.filter("check_name = 'unicode_nfc'").count()
    assert urls == 50
    res2.unpersist()


def test_spec_accepts_unicode_form():
    from anomalydetector_spark.plans.spec import config_from_dict

    cfg = config_from_dict({"unicode_form": "NFKC"})
    assert cfg.unicode_form == "NFKC"
