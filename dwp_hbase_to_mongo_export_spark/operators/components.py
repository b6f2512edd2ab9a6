"""Connected components over a pair list — turns near-duplicate PAIRS
(from MinHash-LSH / SimHash / n-gram jaccard) into dedup CLUSTERS with a
canonical keeper per cluster, the final step of fuzzy dedup in a
training-data pipeline: transitivity means A~B and B~C must collapse to
ONE keeper even when A~C was never emitted as a candidate.

Spark-first design: an iterative driver-coordinated loop of DataFrame
joins (min-label propagation). Iterative fixpoints are the one place a
driver loop is idiomatic Spark — each iteration is still a fully
distributed join + aggregate; the driver only checks convergence
(a scalar count) and truncates lineage with localCheckpoint so the plan
does not grow unboundedly.

Scale: propagation converges in O(component diameter) rounds; dedup
clusters are shallow (diameter ≤ ~3 in practice), so 100 TB runs need
the same handful of rounds as sf0.01. Each round shuffles |edges| +
|nodes| keys. For adversarially deep graphs swap in the
large-star/small-star alternation (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14), which converges in
O(log n) rounds with the same join primitive; min-label propagation is
the simpler fixpoint and is exact either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Exact connected components of the undirected graph given by
    ``pairs``. Returns (node, component) where component = min node id
    reachable — a deterministic canonical representative.

    Only nodes appearing in at least one pair are returned (singletons
    are their own trivial component and need no dedup decision).
    """
    # localCheckpoint truncates lineage each round — REQUIRED for an
    # iterative fixpoint (labels feeds both sides of the next round's
    # plan, so an un-truncated logical plan doubles per iteration and
    # analysis cost goes exponential). But checkpoint blocks are invisible
    # to the CacheManager: neither this loop's unpersist-by-handle nor a
    # session clearCache() would reclaim them, and across many invocations
    # they pile up in the block manager until heap pressure turns into GC
    # storms in unrelated queries. So superseded iterations are released
    # EXPLICITLY via the LogicalRDD's checkpointed RDD. Only the returned
    # frame's blocks outlive the call.
    fwd = pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    edges = fwd.union(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    to_release = [labels]
    for _ in range(max_iter):
        nbr = (
            edges.join(labels, edges.src == labels.node)
            .select(F.col("dst").alias("node"), "label")
            .withColumn("own", F.lit(False))
        )
        # The convergence signal rides inside the aggregation: each
        # node's previous label is the min over its own (own=True) rows,
        # so `changed` needs no second join against the old frame.
        new_labels = (
            labels.withColumn("own", F.lit(True))
            .unionByName(nbr)
            .groupBy("node")
            .agg(
                F.min("label").alias("label"),
                F.min(F.when(F.col("own"), F.col("label"))).alias("__old"),
            )
            .withColumn("__changed", F.col("label") < F.col("__old"))
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(F.col("__changed")).limit(1).count()
        for df in to_release:  # superseded once new_labels materialised
            _release_local_checkpoint(df)
        to_release = [new_labels]
        labels = new_labels.select("node", "label")
        if changed == 0:
            break
    _release_local_checkpoint(edges)
    return labels.select("node", F.col("label").alias("component"))


def _release_local_checkpoint(df: DataFrame) -> None:
    """Unpersist the block-manager storage behind a localCheckpoint'd
    DataFrame. Its analyzed plan is a LogicalRDD wrapping the checkpointed
    RDD; dropping those blocks frees the memory immediately instead of
    waiting for the ContextCleaner to notice the RDD is unreachable. Only
    call on frames that will never be used again."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:  # noqa: BLE001 — best-effort release, never job-fatal
        pass


def dedup_clusters(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Cluster view of ``connected_components``: each clustered doc with
    its component id, cluster size, and whether it is the keeper (the
    canonical min-id member). Downstream dedup keeps ``is_keeper`` rows
    and drops the rest."""
    from pyspark.sql.window import Window

    comp = connected_components(pairs, src=src, dst=dst, max_iter=max_iter)
    w = Window.partitionBy("component")
    return comp.select(
        F.col("node").alias("doc_id"),
        "component",
        F.count(F.lit(1)).over(w).alias("cluster_size"),
        (F.col("node") == F.col("component")).alias("is_keeper"),
    )
