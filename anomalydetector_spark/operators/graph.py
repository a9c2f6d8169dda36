"""Web link graph: outlink extraction, host-level graph construction,
degree statistics, and PageRank by distributed power iteration.

Common-Crawl-style pipelines rank hosts/domains by link centrality and
use the ranks for crawl prioritization and corpus quality weighting
(Common Crawl itself publishes host- and domain-level webgraph ranks;
the "crawl frontier" half of this repo's URL operators feeds the same
ecosystem). The reference repo has no graph surface (it is a
single-series detector); this module is part of the web-scale
training-data-pipeline layer the task brief adds on top.

Scale shape (the 100-TB contract):

* Page-level edges are collapsed to HOST (or registrable-domain) level
  BEFORE any iteration: ``(src, dst, weight)`` with map-side partial
  counts, so the trillion-edge page graph becomes a million-node host
  graph. Text and full URLs never enter the iteration.
* The transition matrix is materialized once — ``p = w / out_weight``
  — repartitioned by ``src`` and persisted; per iteration only the
  two-column rank frame shuffles to meet it, the contribution sum is a
  map-side-combined ``groupBy(dst)``, and the new rank is a left join
  back onto the bounded node list.
* Dangling mass (rank parked on nodes with no out-edges) is a single
  tiny aggregate per iteration over the precomputed dangling id set,
  kept IN the plan as a broadcast 1-row frame — no extra driver action
  per round; the only per-iteration job is the eager checkpoint.
* Each iteration's ranks are ``localCheckpoint``-ed to truncate lineage
  (iterative joins otherwise double the plan per round); on a real
  cluster prefer ``setCheckpointDir`` + ``.checkpoint()``.
* Hot hosts are harmless on both sides of the join: a hub *source*
  fans out through the edge partition it owns, a hub *destination* is
  absorbed by the partial aggregation before the shuffle.

Determinism: with a fixed ``iterations`` the result is a pure function
of the edge multiset up to floating-point summation order; ``round_dp``
pins the published ranks to the repo's cross-engine 6-dp float
contract so a DuckDB oracle can replay the identical arithmetic
(mirrored literally, including the ``(1.0 - d)`` subtraction) with
unrolled iteration CTEs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from anomalydetector_spark.operators.urls import registrable_domain, url_host

#: href targets that are never crawlable outlinks
_NON_LINK_SCHEMES = r"^(javascript:|mailto:|tel:|data:|#)"


def extract_outlinks(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    is_binary: bool | None = None,
    with_anchor: bool = False,
) -> DataFrame:
    """``(src_url, dst_url)`` — one row per ``href`` in each page's html.

    With ``with_anchor=True`` the scan is restricted to ``<a>``
    elements and an ``anchor_text`` column (inner tags stripped,
    trimmed) is added — anchor text aggregated per target is a classic
    web-retrieval/quality signal. The default mode scans every
    ``href=`` attribute (``<a>``, ``<link>``, …), which is what the
    crawl-frontier side wants.

    Entirely JVM-side: ``regexp_extract_all`` pulls every
    ``href="..."`` / ``href='...'`` target, ``explode`` fans out, and
    resolution happens in one ``when`` chain:

    * absolute ``http(s)://…`` targets pass through,
    * protocol-relative ``//host/path`` inherits the page's scheme,
    * root-relative ``/path`` resolves against the page's
      ``scheme://host``,
    * ``javascript:``/``mailto:``/``tel:``/``data:``/fragment-only
      targets are dropped,
    * same-directory relative paths are dropped — at host/domain
      granularity (the only granularity the graph stage keeps) they are
      self-loops, which :func:`host_link_graph` filters anyway, so
      resolving them would only add rows destined for the self-loop
      filter.

    ``is_binary`` forces/decodes the html column; by default it is
    inferred from the column's type (the pages table carries
    ``html: binary`` per the input contract).
    """
    if is_binary is None:
        is_binary = dict(df.dtypes).get(html_col) == "binary"
    html = F.coalesce(
        F.decode(F.col(html_col), "UTF-8") if is_binary else F.col(html_col),
        F.lit(""),
    )
    if with_anchor:
        # whole <a> elements, so href and anchor text stay aligned
        raw = F.explode(
            F.regexp_extract_all(
                html, F.lit(r"(?s)<[Aa](\s[^>]*)?>.*?</[Aa]\s*>"), F.lit(0)
            )
        ).alias("_elem")
    else:
        raw = F.explode(
            F.regexp_extract_all(
                html, F.lit(r"""href\s*=\s*["']([^"']+)["']"""), F.lit(1)
            )
        ).alias("_raw")
    page = F.col("src_url")  # available after the first select below
    scheme = F.lower(
        F.regexp_extract(F.trim(page), r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1)
    )
    base = F.concat(scheme, F.lit("://"), url_host(page))
    target = (
        F.regexp_extract(
            F.col("_elem"), r"""href\s*=\s*["']([^"']+)["']""", 1
        )
        if with_anchor
        else F.col("_raw")
    )
    t = F.trim(target)
    resolved = (
        F.when(t.rlike(_NON_LINK_SCHEMES), F.lit(None))
        .when(t.rlike(r"^[Hh][Tt][Tt][Pp][Ss]?://"), t)
        .when(t.startswith("//"), F.concat(scheme, F.lit(":"), t))
        .when(t.startswith("/"), F.concat(base, t))
        .otherwise(F.lit(None))
    )
    first = df.select(F.col(url_col).alias("src_url"), raw)
    if with_anchor:
        anchor = F.trim(
            F.regexp_replace(
                F.regexp_extract(F.col("_elem"), r"(?s)^<[^>]*>(.*)</[Aa]\s*>$", 1),
                r"<[^>]*>",
                "",
            )
        )
        return first.select(
            "src_url", resolved.alias("dst_url"), anchor.alias("anchor_text")
        ).filter(F.col("dst_url").isNotNull())
    return first.select("src_url", resolved.alias("dst_url")).filter(
        F.col("dst_url").isNotNull()
    )


def host_link_graph(
    links: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    level: str = "domain",
) -> DataFrame:
    """Collapse URL-level links to a weighted ``(src, dst, weight)``
    host graph — THE scale move: the aggregation's map-side partial
    counts shrink trillions of page edges to a bounded host/domain
    graph before anything iterative runs. Self-loops (intra-host
    links, the overwhelming majority of the web) are dropped pre-
    aggregation so they never shuffle.

    ``level``: ``"domain"`` groups by registrable domain (eTLD+1 — the
    same key the per-domain cap and skew handling use); ``"host"``
    keeps full subdomains.
    """
    if level not in ("domain", "host"):
        raise ValueError(f"unknown level {level!r} (domain|host)")

    def key(c: Column) -> Column:
        h = url_host(c)
        return registrable_domain(h) if level == "domain" else h

    src, dst = key(F.col(src_col)), key(F.col(dst_col))
    return (
        links.select(src.alias("src"), dst.alias("dst"))
        .filter((F.col("src") != F.col("dst")) & (F.col("src") != "") & (F.col("dst") != ""))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def degree_stats(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = "weight",
) -> DataFrame:
    """Per-node ``(id, out_edges, in_edges, out_weight, in_weight)`` in
    ONE aggregation: both endpoints are unioned into a tagged long
    format first, so a single map-side-combined ``groupBy(id)`` replaces
    the naive two-aggregations-plus-full-outer-join plan (one shuffle,
    no join, nodes seen on only one side get exact zeros instead of
    nulls)."""
    w = (
        F.col(weight_col).cast("double")
        if weight_col is not None
        else F.lit(1.0)
    )
    out_half = edges.select(
        F.col(src_col).alias("id"),
        F.lit(1).alias("oe"),
        w.alias("ow"),
        F.lit(0).alias("ie"),
        F.lit(0.0).alias("iw"),
    )
    in_half = edges.select(
        F.col(dst_col).alias("id"),
        F.lit(0).alias("oe"),
        F.lit(0.0).alias("ow"),
        F.lit(1).alias("ie"),
        w.alias("iw"),
    )
    return (
        out_half.unionByName(in_half)
        .groupBy("id")
        .agg(
            F.sum("oe").alias("out_edges"),
            F.sum("ie").alias("in_edges"),
            F.sum("ow").alias("out_weight"),
            F.sum("iw").alias("in_weight"),
        )
    )


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    damping: float = 0.85,
    iterations: int = 20,
    checkpoint: bool = True,
    round_dp: int | None = None,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """Weighted PageRank over ``edges`` by power iteration; returns
    ``(id, pagerank)`` for every node appearing as a source or
    destination.

    Semantics (the classic formulation with uniform teleport and
    dangling-mass redistribution):

    ``r'(v) = (1-d)/N + d * (Σ_{(u,v)∈E} p(u,v)·r(u) + D/N)``

    where ``p(u,v) = w(u,v) / out_weight(u)`` and ``D`` is the summed
    rank of dangling nodes (no out-edges). Rank mass is conserved at
    1.0 every iteration. Parallel edges are collapsed by summing
    weights (``weight_col=None`` counts multiplicity), so callers can
    feed raw link rows or a pre-aggregated graph interchangeably.

    ``seeds`` switches to PERSONALIZED PageRank — the TrustRank
    construction (Gyöngyi et al., VLDB 2004) used for web-spam
    demotion: teleport mass goes uniformly to the seed set ``S``
    instead of all nodes,

    ``r'(v) = (1-d)·t(v) + d · (Σ p(u,v)·r(u) + D·t(v))``,
    ``t(v) = 1/|S|`` for ``v ∈ S`` else ``0``,

    so rank can only reach nodes the trusted set links to
    (transitively); spam farms unreferenced by ``S`` score exactly 0.
    ``seeds`` is any one-column-keyed frame (first column = node id);
    it stays distributed — one bounded left join tags the node list,
    never a collect. Mass is still conserved at 1.0.

    Exactly ``iterations`` rounds run — no data-dependent early exit —
    so the result is deterministic up to FP summation order, and
    ``round_dp=6`` pins it to the repo's cross-engine float contract
    (the DuckDB oracle replays the same arithmetic with unrolled CTEs).

    See the module docstring for the 100-TB shape: per iteration, one
    equi-join of the two-column rank frame against the persisted
    src-partitioned transition matrix, one map-side-combined
    ``groupBy(dst)``, one bounded-node-list left join, one in-plan
    broadcast dangling-mass aggregate, and a ``localCheckpoint`` to
    truncate lineage.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    spark = edges.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    w = (
        F.col(weight_col).cast("double")
        if weight_col is not None
        else F.lit(1.0)
    )
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"), w.alias("w"))
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
    )
    out_w = e.groupBy("src").agg(F.sum("w").alias("ow"))
    norm = (
        e.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("ow")).alias("p"))
        .repartition(n_parts, "src")
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    # nodes with no out-edge: their rank mass teleports uniformly
    dangling = nodes.join(
        e.select(F.col("src").alias("id")).distinct(), "id", "left_anti"
    ).persist()

    base = nodes
    if seeds is not None:
        seed_ids = seeds.select(
            F.col(seeds.columns[0]).alias("id")
        ).distinct()
        tagged = nodes.join(
            seed_ids.withColumn("_is_seed", F.lit(True)), "id", "left"
        )
        n_seeds = tagged.filter(F.col("_is_seed")).count()
        if n_seeds == 0:
            raise ValueError("seeds contains no node of the graph")
        base = tagged.select(
            "id",
            F.when(F.col("_is_seed"), F.lit(1.0 / n_seeds))
            .otherwise(F.lit(0.0))
            .alias("t"),
        ).persist()
        ranks = base.select("id", F.col("t").alias("rank"))
    else:
        ranks = nodes.select("id", F.lit(1.0 / n).alias("rank"))
    if checkpoint:
        ranks = ranks.localCheckpoint(eager=True)
    try:
        for _ in range(iterations):
            # dangling mass stays IN the plan as a broadcast 1-row frame
            # (a scalar .first() here would cost a whole extra job per
            # iteration); uniform mode pre-divides by N on the same
            # operands in the same order as the oracle's subquery,
            # seeded mode carries the raw mass (multiplied by t(v) at
            # the update).
            dm_agg = ranks.join(dangling, "id", "left_semi").agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
            )
            if seeds is None:
                dm_agg = dm_agg.select(
                    (F.col("_dm") / F.lit(float(n))).alias("_dm")
                )
            dm_frame = F.broadcast(dm_agg)
            contrib = (
                norm.join(
                    ranks.select(F.col("id").alias("src"), "rank"), "src"
                )
                .groupBy("dst")
                .agg(F.sum(F.col("p") * F.col("rank")).alias("s"))
            )
            # arithmetic order mirrored LITERALLY by the DuckDB oracle:
            # uniform: (1.0 - d)/N + d * (coalesce(s, 0.0) + dm/N)
            # seeded:  (1.0 - d)*t  + d * (coalesce(s, 0.0) + dm*t)
            joined = base.join(
                contrib.withColumnRenamed("dst", "id"), "id", "left"
            ).crossJoin(dm_frame)
            if seeds is None:
                new_rank = F.lit((1.0 - damping) / n) + F.lit(damping) * (
                    F.coalesce(F.col("s"), F.lit(0.0)) + F.col("_dm")
                )
            else:
                new_rank = F.lit(1.0 - damping) * F.col("t") + F.lit(
                    damping
                ) * (
                    F.coalesce(F.col("s"), F.lit(0.0))
                    + F.col("_dm") * F.col("t")
                )
            ranks = joined.select("id", new_rank.alias("rank"))
            if checkpoint:
                ranks = ranks.localCheckpoint(eager=True)
        if round_dp is not None:
            return ranks.select("id", F.round("rank", round_dp).alias("pagerank"))
        return ranks.select("id", F.col("rank").alias("pagerank"))
    finally:
        norm.unpersist()
        nodes.unpersist()
        dangling.unpersist()
        if seeds is not None:
            base.unpersist()
