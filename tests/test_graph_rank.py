"""Unit tests for fixed-iteration PageRank (operators/graph_rank.py):
value agreement with a NumPy dense-matrix reference on a known graph,
rank-mass conservation (the closed-form property the symmetrization
buys), and centrality ordering on a star graph."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from dwp_hbase_to_mongo_export_spark.operators import graph_rank


def _run(spark, edge_pairs, iterations=3):
    edges = spark.createDataFrame(edge_pairs, "src string, dst string")
    got = graph_rank.pagerank(edges, iterations=iterations).collect()
    return {r.node_id: r.rank for r in got}


def _numpy_reference(edge_pairs, iterations=3, d=0.85):
    und = set()
    for u, v in edge_pairs:
        und.add((u, v))
        und.add((v, u))
    nodes = sorted({u for u, _ in und})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for u, _ in und:
        deg[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        nxt = np.full(n, (1 - d) / n)
        for u, v in und:
            nxt[idx[v]] += d * r[idx[u]] / deg[idx[u]]
        r = nxt
    return {u: r[idx[u]] for u in nodes}

PATH_GRAPH = [("a", "b"), ("b", "c"), ("c", "d")]
STAR_GRAPH = [("hub", x) for x in ("s1", "s2", "s3", "s4")]


def test_pagerank_matches_dense_reference(spark):
    for graph in (PATH_GRAPH, STAR_GRAPH, PATH_GRAPH + [("d", "a"), ("a", "c")]):
        got = _run(spark, graph)
        want = _numpy_reference(graph)
        assert set(got) == set(want)
        for node in want:
            assert abs(got[node] - want[node]) < 1e-12, (node, graph)


def test_pagerank_mass_is_conserved(spark):
    # symmetrized graph => no dangling nodes => total rank stays exactly 1
    for iters in (1, 3, 5):
        ranks = _run(spark, PATH_GRAPH + [("d", "e"), ("e", "a")], iterations=iters)
        assert abs(sum(ranks.values()) - 1.0) < 1e-9


def test_pagerank_star_hub_dominates(spark):
    ranks = _run(spark, STAR_GRAPH)
    hub = ranks.pop("hub")
    assert all(hub > leaf for leaf in ranks.values())
    # leaves are symmetric, so their ranks are identical
    assert max(ranks.values()) - min(ranks.values()) < 1e-15


def test_checkpoint_partitioning_loss_tripwire(spark):
    """Documents WHY pagerank does not pre-partition its edges: under
    AQE, localCheckpoint's LogicalRDD reports UnknownPartitioning, so a
    repartition("src") before the checkpoint cannot save the
    per-iteration edge-join exchange (probed and reverted, round 8; the
    deployment-grade fix is bucketed edge storage). TRIPWIRE: if a
    Spark upgrade starts preserving the partitioning here, this test
    fails — that is the signal to reinstate pre-partitioned edges in
    operators/graph_rank.pagerank and pin the exchange count instead."""
    from pyspark.sql import functions as F

    edges = spark.range(200).select(
        (F.col("id") % 20).alias("src"), (F.col("id") % 7).alias("dst")
    )
    und = (
        graph_rank.symmetrize(edges)
        .repartition("src")
        .localCheckpoint(eager=True)
    )
    part = str(und._jdf.queryExecution().executedPlan().outputPartitioning())
    assert "hashpartitioning" not in part, (
        "localCheckpoint now preserves partitioning — reinstate "
        f"pre-partitioned edges in graph_rank.pagerank ({part})"
    )
