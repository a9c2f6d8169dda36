"""Link-graph operators: outlink extraction, host graph, degree stats,
PageRank power iteration (operators/graph.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from anomalydetector_spark.operators.graph import (
    degree_stats,
    extract_outlinks,
    host_link_graph,
    pagerank,
)


def pagerank_np(edges, damping=0.85, iterations=20, seeds=None):
    """Pure-python mirror of the distributed formula — identical
    arithmetic: p = w/out_w; uniform r' = (1-d)/N + d*(contrib + dm/N),
    seeded r' = (1-d)*t + d*(contrib + dm*t)."""
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    w = {}
    for s, d, ww in edges:
        w[(s, d)] = w.get((s, d), 0.0) + ww
    out_w = {}
    for (s, _), ww in w.items():
        out_w[s] = out_w.get(s, 0.0) + ww
    if seeds is not None:
        in_graph = [v for v in nodes if v in set(seeds)]
        t = np.array([1.0 / len(in_graph) if v in set(seeds) else 0.0 for v in nodes])
        r = t.copy()
    else:
        r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        dm = sum(r[idx[v]] for v in nodes if v not in out_w)
        contrib = np.zeros(n)
        for (s, d), ww in w.items():
            contrib[idx[d]] += (ww / out_w[s]) * r[idx[s]]
        if seeds is not None:
            r = (1.0 - damping) * t + damping * (contrib + dm * t)
        else:
            r = (1.0 - damping) / n + damping * (contrib + dm / n)
    return dict(zip(nodes, r))


EDGES = [
    # a small graph with a hub (0), a cycle (1->2->3->1), and a
    # dangling node (9: inbound only)
    (0, 1, 1.0), (0, 2, 1.0), (0, 3, 1.0), (0, 9, 1.0),
    (1, 2, 1.0), (2, 3, 1.0), (3, 1, 1.0),
    (1, 0, 2.0), (2, 0, 1.0),
]


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(
        [Row(src=s, dst=d, w=w) for s, d, w in EDGES]
    )


def test_pagerank_matches_numpy_mirror(spark, edges_df):
    got = {
        r["id"]: r["pagerank"]
        for r in pagerank(
            edges_df, weight_col="w", iterations=12
        ).collect()
    }
    want = pagerank_np(EDGES, iterations=12)
    assert set(got) == set(want)
    for v in got:
        assert got[v] == pytest.approx(want[v], abs=1e-12)


def test_pagerank_mass_conserved_with_dangling(spark, edges_df):
    ranks = pagerank(edges_df, weight_col="w", iterations=7).collect()
    assert sum(r["pagerank"] for r in ranks) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_multiplicity_equals_weight(spark):
    """weight_col=None counts parallel edges: two (a,b) rows must equal
    one (a,b,w=2) row."""
    dup = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")],
        "src string, dst string",
    )
    weighted = spark.createDataFrame(
        [("a", "b", 2.0), ("a", "c", 1.0), ("b", "c", 1.0), ("c", "a", 1.0)],
        "src string, dst string, w double",
    )
    g1 = {r["id"]: r["pagerank"] for r in pagerank(dup, iterations=6).collect()}
    g2 = {
        r["id"]: r["pagerank"]
        for r in pagerank(weighted, weight_col="w", iterations=6).collect()
    }
    assert g1 == pytest.approx(g2, abs=1e-12)


def test_pagerank_authority_ordering(spark):
    """Star pointing IN: the center out-ranks every leaf."""
    leaves = [f"leaf{i}" for i in range(6)]
    df = spark.createDataFrame(
        [(l, "center") for l in leaves]
        + [("center", l) for l in leaves[:2]],
        "src string, dst string",
    )
    got = {r["id"]: r["pagerank"] for r in pagerank(df, iterations=10).collect()}
    assert got["center"] > max(v for k, v in got.items() if k != "center")


def test_pagerank_uniform_on_symmetric_cycle(spark):
    df = spark.createDataFrame(
        [(i, (i + 1) % 5) for i in range(5)], "src int, dst int"
    )
    got = [r["pagerank"] for r in pagerank(df, iterations=15).collect()]
    assert got == pytest.approx([0.2] * 5, abs=1e-9)


def test_pagerank_round_dp_and_determinism(spark, edges_df):
    a = sorted(
        pagerank(edges_df, weight_col="w", iterations=8, round_dp=6).collect()
    )
    b = sorted(
        pagerank(
            edges_df.repartition(7), weight_col="w", iterations=8, round_dp=6
        ).collect()
    )
    assert a == b
    assert a[0].__fields__ == ["id", "pagerank"]


def test_degree_stats_exact(spark, edges_df):
    got = {r["id"]: r for r in degree_stats(edges_df, weight_col="w").collect()}
    assert got[0]["out_edges"] == 4 and got[0]["out_weight"] == 4.0
    assert got[0]["in_edges"] == 2 and got[0]["in_weight"] == 3.0
    # dangling node: inbound only, exact zeros (not nulls)
    assert got[9]["out_edges"] == 0 and got[9]["out_weight"] == 0.0
    assert got[9]["in_edges"] == 1 and got[9]["in_weight"] == 1.0


HTML = (
    "<html><body>"
    '<a href="https://other.example.com/page">abs</a>'
    "<a href='http://EXT.org/x?q=1'>abs2</a>"
    '<a href="//cdn.example.net/lib.js">proto-rel</a>'
    '<a href="/local/path">root-rel</a>'
    '<a href="sibling.html">same-dir (dropped)</a>'
    '<a href="javascript:void(0)">js (dropped)</a>'
    '<a href="mailto:x@y.z">mail (dropped)</a>'
    '<a href="#frag">frag (dropped)</a>'
    "</body></html>"
)


@pytest.fixture(scope="module")
def pages_df(spark):
    return spark.createDataFrame(
        [
            Row(url="https://www.example.com/a", html=HTML),
            Row(url="http://blog.example.com/b", html='<a href="/c">c</a>'),
            Row(url="https://solo.example.org/", html=None),
        ]
    )


def test_extract_outlinks_resolution(spark, pages_df):
    got = {
        (r["src_url"], r["dst_url"])
        for r in extract_outlinks(pages_df, is_binary=False).collect()
    }
    assert got == {
        ("https://www.example.com/a", "https://other.example.com/page"),
        ("https://www.example.com/a", "http://EXT.org/x?q=1"),
        ("https://www.example.com/a", "https://cdn.example.net/lib.js"),
        ("https://www.example.com/a", "https://www.example.com/local/path"),
        ("http://blog.example.com/b", "http://blog.example.com/c"),
    }


def test_extract_outlinks_binary_html(spark, pages_df):
    bin_df = pages_df.select(
        "url", F.encode(F.coalesce("html", F.lit("")), "UTF-8").alias("html")
    )
    assert (
        extract_outlinks(bin_df).count()
        == extract_outlinks(pages_df, is_binary=False).count()
    )


def test_host_link_graph_domain_level(spark, pages_df):
    links = extract_outlinks(pages_df, is_binary=False)
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in host_link_graph(links, level="domain").collect()
    }
    # other.example.com, the root-rel link, and blog->/c all collapse to
    # example.com -> example.com at domain level — self-loops, filtered;
    # only the two genuinely external targets survive
    assert got == {
        ("example.com", "ext.org"): 1,
        ("example.com", "example.net"): 1,
    }


def test_host_link_graph_host_level(spark, pages_df):
    links = extract_outlinks(pages_df, is_binary=False)
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in host_link_graph(links, level="host").collect()
    }
    assert got[("www.example.com", "cdn.example.net")] == 1
    # at host level the root-relative link is NOT a self-loop
    assert ("blog.example.com", "blog.example.com") not in got


def test_host_link_graph_bad_level(spark, pages_df):
    with pytest.raises(ValueError):
        host_link_graph(extract_outlinks(pages_df, is_binary=False), level="x")


def test_extract_outlinks_with_anchor(spark):
    df = spark.createDataFrame(
        [
            Row(
                url="https://a.example.com/",
                html=(
                    '<a href="https://b.example.org/x">plain</a>'
                    '<a class="c" href="/y"><b>Bold</b> link </a>'
                    '<a name="no-href">skip</a>'
                    '<a href="javascript:void(0)">js</a>'
                    '<link href="https://css.example.net/s.css">'
                ),
            )
        ]
    )
    got = {
        (r["dst_url"], r["anchor_text"])
        for r in extract_outlinks(
            df, is_binary=False, with_anchor=True
        ).collect()
    }
    # inner tags stripped + trimmed; no-href and javascript <a>s dropped;
    # the <link> element is NOT in anchor mode's scan
    assert got == {
        ("https://b.example.org/x", "plain"),
        ("https://a.example.com/y", "Bold link"),
    }
    # default mode still sees the <link> href
    all_hrefs = {
        r["dst_url"] for r in extract_outlinks(df, is_binary=False).collect()
    }
    assert "https://css.example.net/s.css" in all_hrefs


def test_link_graph_cli(spark, tmp_path):
    from anomalydetector_spark import cli

    inp = str(tmp_path / "pages")
    spark.range(60).select(
        F.concat(
            F.lit("https://s"), (F.col("id") % 4).cast("string"),
            F.lit(".example.com/p/"), F.col("id").cast("string"),
        ).alias("url"),
        F.encode(
            F.concat(
                F.lit('<a href="https://t'), (F.col("id") % 3).cast("string"),
                F.lit('.example.org/x">l</a>'),
            ),
            "UTF-8",
        ).alias("html"),
    ).write.parquet(inp)
    out = str(tmp_path / "graph")
    cli.main(
        [
            "link-graph",
            "--input-path", inp,
            "--output-path", out,
            "--level", "host",
            "--pagerank-iterations", "5",
            "--degrees",
        ]
    )
    edges = spark.read.parquet(out)
    # 4 src hosts x 3 dst hosts, every combination hit (60 = lcm-friendly)
    assert edges.count() == 12
    assert edges.agg(F.sum("weight")).first()[0] == 60
    ranks = spark.read.parquet(out + "_ranks")
    assert ranks.count() == 7
    assert sum(r["pagerank"] for r in ranks.collect()) == pytest.approx(
        1.0, abs=1e-4  # ranks are 6dp-rounded
    )
    degs = spark.read.parquet(out + "_degrees")
    assert degs.filter(F.col("out_edges") == 0).count() == 3  # dst hosts dangle


def test_trustrank_matches_numpy_mirror(spark, edges_df):
    seeds = spark.createDataFrame([(0,), (2,)], "id bigint")
    got = {
        r["id"]: r["pagerank"]
        for r in pagerank(
            edges_df, weight_col="w", iterations=10, seeds=seeds
        ).collect()
    }
    want = pagerank_np(EDGES, iterations=10, seeds=[0, 2])
    assert set(got) == set(want)
    for v in got:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_trustrank_unreachable_scores_zero(spark):
    """Two disconnected components; seeding only one leaves the other
    at EXACTLY 0 — the spam-demotion property."""
    df = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("spam1", "spam2"), ("spam2", "spam1")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("a",)], "id string")
    got = {
        r["id"]: r["pagerank"]
        for r in pagerank(df, iterations=8, seeds=seeds).collect()
    }
    assert got["spam1"] == 0.0 and got["spam2"] == 0.0
    assert got["a"] > got["b"] > 0


def test_trustrank_disjoint_seeds_raise(spark, edges_df):
    seeds = spark.createDataFrame([(999,)], "id bigint")
    with pytest.raises(ValueError):
        pagerank(edges_df, weight_col="w", iterations=2, seeds=seeds)
