"""Connected components over candidate-pair edge lists.

LSH stages (``dedup.minhash_lsh_candidates``, ``similarity.
embedding_near_duplicates``) emit candidate PAIRS; deduplication needs
those pairs grouped into transitive clusters — if A~B and B~C, exactly
one of {A, B, C} should survive. The reference repo has no graph
operator (it is a single-series detector); this module is part of the
training-data-pipeline surface the task brief adds on top.

Algorithm: hash-min label propagation with pointer doubling.
Every node starts labeled with its own id; each round

1. propagates the minimum neighbor label along edges
   (join + map-side-combined ``min`` groupBy), then
2. pointer-jumps ``label <- label(label)`` via a self-join,

so the component minimum spreads both along edges and along the label
forest — convergence in O(log diameter) rounds instead of O(diameter)
for plain propagation. Labels only ever decrease, so the convergence
check is a monotone ``new < old`` count.

Scale shape (the 100-TB contract):

* The loop state is ``(id, comp)`` — two longs per node appearing in a
  pair. Text never enters the graph stage.
* ``edges`` is repartitioned by join key ONCE and persisted; per round
  only the (much smaller) label frame shuffles to meet it, plus the
  groupBy(src) propagation shuffle with map-side partial ``min``.
* Each round's labels are ``localCheckpoint``-ed to truncate lineage —
  an iterative join loop otherwise builds a plan that doubles per
  round. On a real cluster with a reliable checkpoint dir prefer
  ``spark.sparkContext.setCheckpointDir`` + ``.checkpoint()``; local
  checkpointing is the right default in local mode.
* Near-dup components from a verified candidate stage are star/clique
  shaped (diameter 2-4); ``max_rounds`` is a guard against adversarial
  chains, and exhaustion raises instead of returning a wrong partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 50,
    checkpoint: bool = True,
) -> DataFrame:
    """Resolve an undirected edge list into components.

    Returns ``(id, component)`` for every node that appears in at least
    one pair, where ``component`` is the minimum node id reachable from
    ``id`` (a stable, order-independent cluster key). Singletons —
    nodes with no pairs — are not emitted; compose with a left join +
    ``coalesce(component, id)`` when every corpus row needs a label
    (see :func:`assign_components`).
    """
    spark = pairs.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    # ids flow through at their native type (long, string, binary, …):
    # min/least and the equi-joins are type-generic, and a strict cast
    # would throw under ANSI mode for non-numeric ids (string min =
    # lexicographic canonical — still total and deterministic)
    half = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = (
        half.union(half.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .repartition(n_parts, "dst")
        .persist()
    )

    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("component"))
    )
    if checkpoint:
        labels = labels.localCheckpoint(eager=True)

    try:
        for _ in range(max_rounds):
            nbr_min = (
                edges.join(
                    labels.select(
                        F.col("id").alias("dst"), F.col("component").alias("dst_comp")
                    ),
                    "dst",
                )
                .groupBy("src")
                .agg(F.min("dst_comp").alias("nbr_comp"))
            )
            propagated = (
                labels.join(nbr_min.withColumnRenamed("src", "id"), "id", "left")
                .select(
                    "id",
                    F.least(
                        F.col("component"), F.coalesce("nbr_comp", "component")
                    ).alias("component"),
                )
            )
            # pointer doubling: component <- component(component). Every
            # label is itself a node id, so the self-join is total; the
            # coalesce only covers a label whose node converged already.
            parents = propagated.select(
                F.col("id").alias("component"), F.col("component").alias("p_comp")
            )
            jumped = propagated.join(parents, "component", "left").select(
                "id", F.coalesce("p_comp", "component").alias("component")
            )
            if checkpoint:
                jumped = jumped.localCheckpoint(eager=True)

            changed = (
                jumped.select("id", F.col("component").alias("new_comp"))
                .join(labels, "id")
                .filter(F.col("new_comp") < F.col("component"))
                .count()
            )
            labels = jumped
            if changed == 0:
                return labels
        raise ValueError(
            f"connected_components did not converge in {max_rounds} rounds "
            "(pointer doubling bounds rounds by log2(diameter); raise "
            "max_rounds only if the pair graph is adversarially chained)"
        )
    finally:
        edges.unpersist()


def near_duplicate_clusters(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b", max_rounds: int = 50
) -> DataFrame:
    """Cluster assignment for every doc touched by a candidate pair:
    ``(doc_id, cluster_id, cluster_size, is_canonical)`` with
    ``cluster_id`` = min doc id in the cluster and exactly one
    canonical (the min) per cluster. The sizes frame is one row per
    cluster — orders of magnitude smaller than the corpus — so its
    join back is cheap and AQE will broadcast it when small."""
    comp = connected_components(pairs, id_a=id_a, id_b=id_b, max_rounds=max_rounds)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return comp.join(sizes, "component").select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        "cluster_size",
        (F.col("id") == F.col("component")).alias("is_canonical"),
    )


def assign_components(
    docs: DataFrame,
    comp: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Left-join a components frame (from :func:`connected_components`)
    onto the corpus; rows with no pair become their own singleton
    component. Adds ``component``."""
    return docs.join(
        comp.select(F.col("id").alias(id_col), "component"), id_col, "left"
    ).withColumn("component", F.coalesce("component", F.col(id_col)))


def drop_near_duplicates(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 50,
) -> DataFrame:
    """Corpus minus non-canonical near-duplicates: for each pair-connected
    cluster keep only the min-id member. The dropped-id frame carries
    one long per removed doc, so the anti join ships ids, not text."""
    clusters = near_duplicate_clusters(
        pairs, id_a=id_a, id_b=id_b, max_rounds=max_rounds
    )
    losers = clusters.filter(~F.col("is_canonical")).select(
        F.col("doc_id").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")
