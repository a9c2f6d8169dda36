#!/usr/bin/env python
"""Link-graph throughput at bench scale: host-graph collapse from raw
outlinks, and PageRank power iteration on a skewed synthetic graph.

Graph: EDGES page-level link rows over HOSTS hosts. Destination hosts
are Zipf-ish skewed (dst = id % (id % 1000 + 1) buckets concentrate
mass on low ids) so hub destinations are represented — the partial
aggregation before each contribution shuffle is what keeps them cheap.

Prints one JSON line: raw edge rows/s for the collapse stage and
edge·iterations/s for PageRank.

Usage: python tools/graph_throughput.py [edges] [hosts] [iters] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from anomalydetector_spark.operators.graph import pagerank
from anomalydetector_spark.session import get_spark


def main() -> None:
    edges_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    hosts_n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    cpus = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    spark = get_spark("graph-throughput", cores=cpus)

    # skewed synthetic host graph: src uniform, dst Zipf-ish (low ids hot)
    raw = spark.range(edges_n).select(
        (F.xxhash64("id") % hosts_n).alias("src"),
        (
            F.pmod(F.xxhash64(F.col("id") + 1), F.pmod(F.xxhash64(F.col("id") + 2), 1000) + 1)
            * F.pmod(F.xxhash64(F.col("id") + 3), hosts_n // 1000 + 1)
        ).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))

    t0 = time.time()
    edges = raw.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("weight"))
    n_edges = edges.count()
    t_collapse = time.time() - t0

    t0 = time.time()
    ranks = pagerank(edges, weight_col="weight", iterations=iters)
    n_nodes = ranks.count()
    top = ranks.orderBy(F.desc("pagerank")).limit(3).collect()
    t_pr = time.time() - t0

    print(
        json.dumps(
            {
                "edge_rows": edges_n,
                "collapsed_edges": n_edges,
                "nodes": n_nodes,
                "iterations": iters,
                "cpus": cpus,
                "collapse_sec": round(t_collapse, 2),
                "collapse_rows_per_sec": round(edges_n / t_collapse),
                "pagerank_sec": round(t_pr, 2),
                "edge_iters_per_sec": round(n_edges * iters / t_pr),
                "top_ranks": [round(r["pagerank"], 6) for r in top],
                "loadavg_1m": round(os.getloadavg()[0], 1),
            }
        )
    )


if __name__ == "__main__":
    main()
