"""PMI/NPMI collocations: hand-computed parity on a tiny corpus,
pre-prune margin semantics, the degenerate-NPMI pin, tie-broken top-k
determinism, and no per-row Python in the plan."""

import io
import math
from contextlib import redirect_stdout

from anomalydetector_spark.operators.collocations import (
    bigram_counts,
    pmi_collocations,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _py_scores(texts, min_count):
    from collections import Counter

    bc = Counter()
    for t in texts:
        toks = t.lower().split()
        for a, b in zip(toks, toks[1:]):
            bc[(a, b)] += 1
    n = sum(bc.values())
    cl = Counter()
    cr = Counter()
    for (a, b), c in bc.items():
        cl[a] += c
        cr[b] += c
    out = {}
    for (a, b), c in bc.items():
        if c < min_count:
            continue
        pmi = math.log(c * float(n) / (cl[a] * float(cr[b])))
        if float(c) == float(n):
            npmi = 1_000_000
        else:
            npmi = round(pmi / math.log(n / float(c)) * 1e6)
        out[(a, b)] = (c, round(pmi * 1e6), npmi)
    return out


def test_matches_python_reference(spark):
    texts = [
        "new york new york city hall",
        "the city of new york",
        "city hall and the old city",
        "new york minute in the city",
    ]
    want = _py_scores(texts, min_count=2)
    got = {
        (r["prev"], r["cur"]): (r["cnt"], r["pmi_micro"], r["npmi_micro"])
        for r in pmi_collocations(
            _docs(spark, texts), min_count=2, top_k=1000
        ).collect()
    }
    assert got == want
    # "new york" must dominate "the city" on PMI
    assert got[("new", "york")][1] > got[("the", "city")][1]


def test_margins_are_pre_prune(spark):
    """'a b' appears 5x; 'a c' appears once (pruned). The margin of 'a'
    must still count the pruned occurrence — c_left(a)=6, not 5."""
    texts = ["a b"] * 5 + ["a c"]
    got = pmi_collocations(_docs(spark, texts), min_count=2, top_k=10).collect()
    (row,) = got
    assert (row["prev"], row["cur"], row["cnt"]) == ("a", "b", 5)
    # N=6, c_left(a)=6, c_right(b)=5 -> pmi = ln(5*6/(6*5)) = 0
    assert row["pmi_micro"] == 0


def test_npmi_degenerate_single_pair(spark):
    got = pmi_collocations(_docs(spark, ["x y"]), min_count=1, top_k=5).collect()
    (row,) = got
    assert row["npmi_micro"] == 1_000_000


def test_topk_tie_determinism(spark):
    """Many same-PMI pairs: the (pmi desc, prev, cur) total order makes
    the selected set unique — two runs agree exactly."""
    texts = [f"w{i} v{i}" for i in range(30)] * 2  # every pair: cnt=2, same pmi
    df = _docs(spark, texts)
    a = {(r["prev"], r["cur"]) for r in pmi_collocations(df, min_count=2, top_k=7).collect()}
    b = {(r["prev"], r["cur"]) for r in pmi_collocations(df, min_count=2, top_k=7).collect()}
    assert a == b and len(a) == 7
    assert a == {(f"w{i}", f"v{i}") for i in [0, 1, 10, 11, 12, 13, 14]}


def test_no_python_in_plan(spark):
    df = _docs(spark, ["a b c"] * 10)
    out = pmi_collocations(df, min_count=1, top_k=10)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue()
    assert "pythonudf" not in plan.lower()
    assert "TakeOrderedAndProject" in plan


def test_bigram_counts_exact(spark):
    got = {
        (r["prev"], r["cur"]): r["cnt"]
        for r in bigram_counts(_docs(spark, ["A b a B", "b a"])).collect()
    }
    assert got == {("a", "b"): 2, ("b", "a"): 2}
