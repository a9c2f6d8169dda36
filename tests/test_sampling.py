"""Deterministic hash-threshold sampling + corpus mixing
(operators/sampling) — determinism, nesting, composition, and the
zero-shuffle plan shape that makes them retry-stable at 100 TB."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pandas as pd
import pytest
from pyspark.sql import functions as F

from anomalydetector_spark.operators.sampling import (
    corpus_mix,
    deterministic_sample,
    proportional_mix_fractions,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    for i in range(3000):
        lang = ("en", "en", "en", "de", "fr", "zh")[i % 6]
        rows.append({"doc_id": i, "lang": lang, "text": f"doc {i}"})
    return spark.createDataFrame(pd.DataFrame(rows)).persist()


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_sample_deterministic_and_unbiased(docs):
    a = set(r.doc_id for r in deterministic_sample(docs, 0.3, seed=1).collect())
    b = set(r.doc_id for r in deterministic_sample(docs, 0.3, seed=1).collect())
    assert a == b  # retry/rerun-stable, unlike rand()-based sample()
    assert 0.25 < len(a) / 3000 < 0.35
    c = set(r.doc_id for r in deterministic_sample(docs, 0.3, seed=2).collect())
    assert a != c  # seed actually changes the draw


def test_sample_nested_across_fractions(docs):
    small = set(r.doc_id for r in deterministic_sample(docs, 0.1, seed=4).collect())
    big = set(r.doc_id for r in deterministic_sample(docs, 0.4, seed=4).collect())
    assert small < big  # threshold sampling grows monotonically


def test_sample_plan_has_no_shuffle(docs):
    plan = _plan(deterministic_sample(docs, 0.2))
    assert "Exchange" not in plan


def test_stratified_fractions_and_default(docs):
    out = stratified_sample(
        docs, "lang", {"en": 0.5, "de": 1.0}, seed=9
    ).groupBy("lang").count()
    got = {r.lang: r["count"] for r in out.collect()}
    assert got["de"] == 500  # fraction 1.0 keeps every row
    assert 0.4 * 1500 < got["en"] < 0.6 * 1500
    assert set(got) == {"en", "de"}  # unlisted strata default to 0.0


def test_mix_fractions_binding_stratum(docs):
    fr = {
        r.stratum: r.fraction
        for r in proportional_mix_fractions(
            docs, "lang", {"en": 1.0, "zh": 2.0}
        ).collect()
    }
    # zh: 500 rows, weight 2 → n/w = 250 is binding → fraction 1.0;
    # en: 1500 rows, weight 1 → target 250 → fraction 1/6
    assert fr["zh"] == pytest.approx(1.0)
    assert fr["en"] == pytest.approx(250 / 1500)


def test_mix_composition_matches_weights(docs):
    mix = corpus_mix(docs, "lang", {"en": 1.0, "zh": 1.0}, seed=3)
    got = {r.lang: r["count"] for r in mix.groupBy("lang").count().collect()}
    assert set(got) == {"en", "zh"}
    assert got["zh"] == 500  # binding stratum keeps all rows
    assert abs(got["en"] - 500) < 100  # hash-threshold variance only
    # output schema is the input schema (join helper columns dropped)
    assert set(mix.columns) == set(docs.columns)


def test_mix_is_broadcast_no_corpus_shuffle(docs):
    plan = _plan(corpus_mix(docs, "lang", {"en": 1.0, "de": 1.0}))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def _cap_ids(df):
    return sorted(r.doc_id for r in df.collect())


def test_cap_per_key_basic(docs):
    from anomalydetector_spark.operators.sampling import cap_per_key

    capped = cap_per_key(docs, "lang", 100)
    counts = {r.lang: r["count"] for r in capped.groupBy("lang").count().collect()}
    # en has 1500 rows → capped; de/fr/zh have 500 each → capped too
    assert all(c == 100 for c in counts.values())
    # deterministic: second run picks the identical set
    assert _cap_ids(capped) == _cap_ids(cap_per_key(docs, "lang", 100))


def test_cap_per_key_nested_and_undersized(docs, spark):
    from anomalydetector_spark.operators.sampling import cap_per_key

    small = set(_cap_ids(cap_per_key(docs, "lang", 50)))
    large = set(_cap_ids(cap_per_key(docs, "lang", 200)))
    assert small < large
    # a key with fewer rows than k keeps everything
    tiny = docs.filter("doc_id < 10")
    assert cap_per_key(tiny, "lang", 100).count() == 10


def test_cap_per_key_salted_identical(docs):
    from anomalydetector_spark.operators.sampling import cap_per_key

    plain = _cap_ids(cap_per_key(docs, "lang", 100))
    for s in (2, 7, 32):
        assert _cap_ids(cap_per_key(docs, "lang", 100, salts=s)) == plain


def test_cap_per_composite_key(docs):
    """A LIST of key columns caps per composite key (the violation-sample
    sink shape) — salted path selects the identical set, cap honored per
    (key1, key2) group, and a composite cap never exceeds k per group."""
    import pyspark.sql.functions as F

    from anomalydetector_spark.operators.sampling import cap_per_key

    keyed = docs.withColumn("bucket", (F.col("doc_id") % 3).cast("string"))
    capped = cap_per_key(keyed, ["lang", "bucket"], 40)
    counts = capped.groupBy("lang", "bucket").count().collect()
    assert counts and all(r["count"] <= 40 for r in counts)
    # en has 500 rows per bucket → every en group is exactly at the cap
    assert all(r["count"] == 40 for r in counts if r.lang == "en")
    plain = _cap_ids(capped)
    assert _cap_ids(cap_per_key(keyed, ["lang", "bucket"], 40, salts=8)) == plain
    # composite is strictly finer than the single-key cap of the same k
    single = _cap_ids(cap_per_key(keyed, "lang", 40))
    assert len(plain) > len(single)


def test_zero_weight_drops_stratum(docs):
    # weight 0 = drop: no ANSI divide-by-zero, stratum excluded from the
    # binding min and emitted with fraction 0
    fr = {
        r.stratum: r.fraction
        for r in proportional_mix_fractions(
            docs, "lang", {"en": 1.0, "de": 0.0}
        ).collect()
    }
    assert fr["de"] == 0.0 and fr["en"] == 1.0
    mix = corpus_mix(docs, "lang", {"en": 1.0, "de": 0.0})
    got = {r.lang for r in mix.select("lang").distinct().collect()}
    assert got == {"en"}


def test_composed_mix_then_sample_needs_distinct_seeds(docs):
    """Two threshold stages over the same key compose correctly only with
    DISTINCT seeds: mix(seed) then sample(seed+1) keeps exactly
    {U(id,seed) < f_mix(lang)} ∩ {U(id,seed+1) < f_sample} (verified
    against a pure-Python md5 recomputation), and thins every stratum —
    with a SHARED seed the composition would collapse to
    U < min(f_mix, f_sample), leaving sub-threshold strata untouched."""
    import hashlib

    def u(key, seed):
        h = hashlib.md5(f"{key}:{seed}".encode()).hexdigest()
        return int(h[:15], 16) / float(1 << 60)

    weights = {"en": 1.0, "de": 1.0}
    fr = {
        r.stratum: r.fraction
        for r in proportional_mix_fractions(docs, "lang", weights).collect()
    }
    # en is 3x de here, so f_en < 0.5 < f_de = 1.0 — the regime where the
    # shared-seed bug makes the sample a no-op for the en stratum
    assert fr["en"] < 0.5 < fr["de"]
    mixed = corpus_mix(docs, "lang", weights, seed=7)
    out = deterministic_sample(mixed, 0.5, seed=8)
    got = {(r.doc_id, r.lang) for r in out.select("doc_id", "lang").collect()}
    expect = {
        (r.doc_id, r.lang)
        for r in docs.select("doc_id", "lang").collect()
        if r.lang in fr and u(r.doc_id, 7) < fr[r.lang] and u(r.doc_id, 8) < 0.5
    }
    assert got == expect
    # the sample visibly thinned BOTH strata of the mixed corpus
    mixed_n = {r.lang: r.n for r in mixed.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    out_n = {r.lang: r.n for r in out.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    for lang in ("en", "de"):
        assert out_n.get(lang, 0) < mixed_n[lang]


def _tb_py(rows, budget, seed=0):
    """Pure-Python mirror of token_budget_cap: greedy hash-ordered
    prefix per key, crossing doc admitted."""
    import hashlib

    def u(i):
        h = hashlib.md5(f"{i}:{seed}".encode()).hexdigest()
        return int(h[:15], 16) / float(1 << 60)

    by_key = {}
    for i, key, toks in rows:
        by_key.setdefault(key, []).append((u(i), i, toks))
    keep = set()
    for key, docs_ in by_key.items():
        acc = 0
        for _, i, toks in sorted(docs_):
            if acc < budget:
                keep.add(i)
            acc += toks or 0
    return keep


def _tb_rows():
    rows = []
    for i in range(600):
        key = ("a", "a", "a", "b", "c")[i % 5]  # 'a' is the hot key
        rows.append((i, key, 50 + (i * 37) % 400))
    rows.append((9000, "d", 10_000_000))  # oversized first (only) doc
    rows.append((9001, "e", None))        # null token count -> 0
    return rows


def test_token_budget_cap_matches_pure_python(spark):
    from anomalydetector_spark.operators.sampling import token_budget_cap

    rows = _tb_rows()
    df = spark.createDataFrame(
        rows, "doc_id bigint, domain string, n_tokens bigint"
    )
    got = {
        r.doc_id
        for r in token_budget_cap(
            df, "domain", 5_000, "n_tokens"
        ).collect()
    }
    assert got == _tb_py(rows, 5_000)
    assert 9000 in got  # oversized lone doc still admitted
    assert 9001 in got  # null tokens cost 0, always fits


def test_token_budget_cap_salted_identical(spark):
    from anomalydetector_spark.operators.sampling import token_budget_cap

    rows = _tb_rows()
    df = spark.createDataFrame(
        rows, "doc_id bigint, domain string, n_tokens bigint"
    )
    plain = {
        r.doc_id
        for r in token_budget_cap(df, "domain", 5_000, "n_tokens").collect()
    }
    for s in (2, 7, 16):
        salted = {
            r.doc_id
            for r in token_budget_cap(
                df, "domain", 5_000, "n_tokens", salts=s
            ).collect()
        }
        assert salted == plain, s


def test_token_budget_cap_nested_in_budget(spark):
    from anomalydetector_spark.operators.sampling import token_budget_cap

    rows = _tb_rows()
    df = spark.createDataFrame(
        rows, "doc_id bigint, domain string, n_tokens bigint"
    )
    small = {
        r.doc_id
        for r in token_budget_cap(df, "domain", 2_000, "n_tokens").collect()
    }
    big = {
        r.doc_id
        for r in token_budget_cap(df, "domain", 20_000, "n_tokens").collect()
    }
    assert small <= big


def test_token_budget_respected_modulo_one_doc(spark):
    from anomalydetector_spark.operators.sampling import token_budget_cap

    rows = [(i, "a", 100) for i in range(100)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, domain string, n_tokens bigint"
    )
    out = token_budget_cap(df, "domain", 1_000, "n_tokens")
    total = out.agg(F.sum("n_tokens")).first()[0]
    # greedy prefix: >= budget is reached, overshoot < one max doc
    assert 1_000 <= total < 1_000 + 100 + 1


# ---- Efraimidis–Spirakis weighted sampling (weighted_sample_k) ----

import hashlib
import math

from anomalydetector_spark.operators.sampling import weighted_sample_k


def _es_score_py(key, weight, seed):
    h = int(hashlib.md5(f"{key}:{seed}".encode()).hexdigest()[:15], 16)
    u = float(h + 1) / float(1 << 60)
    return -math.log(u) / float(weight)


def _es_py(rows, k, seed=0):
    """rows: (key, weight). Pure-python mirror of the selection set."""
    scored = sorted(
        ((_es_score_py(key, w, seed), key) for key, w in rows
         if w is not None and w > 0),
    )
    return [key for _, key in scored[:k]]


@pytest.fixture(scope="module")
def wdocs(spark):
    rows = [
        {"doc_id": i,
         "w": float((i * 7919) % 97 + 1),
         "lang": ("en", "de", "fr")[i % 3]}
        for i in range(2000)
    ]
    # poisoned rows that must never be selected
    rows += [{"doc_id": 9001, "w": 0.0, "lang": "en"},
             {"doc_id": 9002, "w": -3.0, "lang": "de"},
             {"doc_id": 9003, "w": None, "lang": "fr"}]
    return spark.createDataFrame(pd.DataFrame(rows)).persist()


def test_weighted_sample_matches_pure_python(wdocs):
    exp = _es_py([(r.doc_id, r.w) for r in wdocs.collect()], 50, seed=3)
    got = [r.doc_id for r in
           weighted_sample_k(wdocs, 50, "w", seed=3, with_score=True)
           .orderBy("_es_score", "doc_id").collect()]
    assert got == exp


def test_weighted_sample_nested_in_k_and_retry_stable(wdocs):
    s10 = set(r.doc_id for r in weighted_sample_k(wdocs, 10, "w").collect())
    s40 = set(r.doc_id for r in weighted_sample_k(wdocs, 40, "w").collect())
    s40b = set(
        r.doc_id
        for r in weighted_sample_k(wdocs.repartition(16), 40, "w").collect()
    )
    assert s10 < s40 and s40 == s40b and len(s10) == 10 and len(s40) == 40


def test_weighted_sample_excludes_nonpositive_and_null(wdocs):
    all_ids = set(
        r.doc_id for r in weighted_sample_k(wdocs, 10_000, "w").collect()
    )
    assert {9001, 9002, 9003}.isdisjoint(all_ids)
    assert len(all_ids) == 2000


def test_weighted_sample_inclusion_tracks_weight(spark):
    # 6 items, weights 1..32 doubling; over 300 seeds the inclusion
    # counts for k=2 must be monotone in weight (statistical, but
    # deterministic given the fixed seed list)
    items = [(f"item{i}", float(2 ** i)) for i in range(6)]
    counts = {key: 0 for key, _ in items}
    for seed in range(300):
        for key in _es_py(items, 2, seed=seed):
            counts[key] += 1
    freq = [counts[f"item{i}"] for i in range(6)]
    assert freq == sorted(freq) and freq[-1] > freq[0] * 3


def test_weighted_sample_stratified(wdocs):
    got = weighted_sample_k(wdocs, 5, "w", strata_col="lang").collect()
    by_lang = {}
    for r in got:
        by_lang.setdefault(r.lang, []).append(r.doc_id)
    assert set(by_lang) == {"en", "de", "fr"}
    assert all(len(v) == 5 for v in by_lang.values())
    # per-stratum selection equals the mirror restricted to the stratum
    rows = [(r.doc_id, r.w, r.lang) for r in wdocs.collect()]
    for lang in ("en", "de", "fr"):
        exp = _es_py([(d, w) for d, w, l in rows if l == lang], 5)
        assert sorted(by_lang[lang]) == sorted(exp)


def test_weighted_sample_topk_plan_is_distributed(wdocs):
    plan = _plan(weighted_sample_k(wdocs, 25, "w"))
    assert "TakeOrderedAndProject" in plan
    assert "EvalPython" not in plan
