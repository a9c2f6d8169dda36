"""Connected-components / near-dup clustering tests.

Property test oracle: a pure-Python union-find over the same random
edge list — component = min node id, exactly what the operator
promises."""

import random

import pytest

from anomalydetector_spark.operators.components import (
    assign_components,
    connected_components,
    drop_near_duplicates,
    near_duplicate_clusters,
)


def _pairs_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "id_a long, id_b long"
    )


def _uf_components(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_chain_converges_to_min(spark):
    # diameter-7 chain: plain propagation needs 7 rounds, pointer
    # doubling should finish well under max_rounds=5
    pairs = [(i, i + 1) for i in range(1, 8)]
    out = connected_components(_pairs_df(spark, pairs), max_rounds=5)
    got = {r["id"]: r["component"] for r in out.collect()}
    assert got == {i: 1 for i in range(1, 9)}


def test_two_clusters_and_sizes(spark):
    pairs = [(10, 11), (11, 12), (20, 21)]
    out = near_duplicate_clusters(_pairs_df(spark, pairs))
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[10]["cluster_id"] == 10 and rows[12]["cluster_id"] == 10
    assert rows[20]["cluster_id"] == 20 and rows[21]["cluster_id"] == 20
    assert rows[11]["cluster_size"] == 3 and rows[21]["cluster_size"] == 2
    canon = {d for d, r in rows.items() if r["is_canonical"]}
    assert canon == {10, 20}


def test_random_graph_matches_union_find(spark):
    rng = random.Random(42)
    nodes = list(range(200))
    pairs = sorted(
        {tuple(sorted(rng.sample(nodes, 2))) for _ in range(150)}
    )
    out = connected_components(_pairs_df(spark, pairs))
    got = {r["id"]: r["component"] for r in out.collect()}
    assert got == _uf_components(pairs)


def test_empty_pairs(spark):
    out = connected_components(_pairs_df(spark, []))
    assert out.count() == 0


def test_assign_components_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    comp = connected_components(_pairs_df(spark, [(0, 3)]))
    labeled = {
        r["doc_id"]: r["component"] for r in assign_components(docs, comp).collect()
    }
    assert labeled == {0: 0, 1: 1, 2: 2, 3: 0, 4: 4}


def test_drop_near_duplicates_keeps_canonicals_and_singletons(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(6)], "doc_id long, text string"
    )
    survivors = drop_near_duplicates(docs, _pairs_df(spark, [(1, 4), (4, 2)]))
    assert sorted(r["doc_id"] for r in survivors.collect()) == [0, 1, 3, 5]


def test_nonconvergence_raises(spark):
    pairs = [(i, i + 1) for i in range(1, 40)]
    with pytest.raises(ValueError, match="did not converge"):
        connected_components(_pairs_df(spark, pairs), max_rounds=1)


def test_string_ids_supported(spark):
    # web corpora key on url/string hashes — no numeric cast anywhere
    pairs = spark.createDataFrame(
        [("doc-b", "doc-c"), ("doc-a", "doc-b"), ("x", "y")],
        "id_a string, id_b string",
    )
    out = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert out == {"doc-a": "doc-a", "doc-b": "doc-a", "doc-c": "doc-a",
                   "x": "x", "y": "x"}
    docs = spark.createDataFrame([("doc-a",), ("doc-c",), ("solo",)], "doc_id string")
    comp = connected_components(pairs)
    labeled = {r["doc_id"]: r["component"]
               for r in assign_components(docs, comp).collect()}
    assert labeled == {"doc-a": "doc-a", "doc-c": "doc-a", "solo": "solo"}
