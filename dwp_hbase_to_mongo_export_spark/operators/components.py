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


def connected_components_alternating(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Exact connected components via the large-star/small-star
    alternation (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14 — public literature): converges in O(log n) rounds
    on ANY graph, vs O(diameter) for min-label propagation. Same
    contract as connected_components: (node, component-min) for every
    node appearing in a pair.

    This is the adversarial-depth scale path: a 100 TB near-dup graph
    with chain-shaped components (crawl mirrors, versioned boilerplate)
    makes propagation pay diameter rounds; star-contraction pays log.

    Each round is two shuffle-by-node window aggregations over the edge
    list — the same join primitive as propagation, no driver-side data:

    - large-star: per node u, m = min(neighbourhood(u) + {u}); every
      LARGER neighbour v > u re-links to m — (v, m);
    - small-star: orient edges low->high, per node u over its smaller
      neighbours m = min(them + {u}); they and u link to m.

    Convergence = the oriented edge set reaches a fixpoint (stars only);
    detected with a count+hash checksum (driver reads two scalars per
    round, exact stop is re-checked by the star property below)."""
    from pyspark.sql.window import Window

    fwd = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v")).filter(
        F.col("u") != F.col("v")
    )
    nodes = (
        fwd.select(F.col("u").alias("node"))
        .union(fwd.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # canonical low->high orientation, deduped
    edges = (
        fwd.select(
            F.least("u", "v").alias("lo"), F.greatest("u", "v").alias("hi")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    to_release = [edges]
    prev_sig = None
    for _ in range(max_iter):
        # ---- large-star: key = every endpoint, with full neighbourhood
        sym = edges.select(F.col("lo").alias("k"), F.col("hi").alias("n")).union(
            edges.select(F.col("hi").alias("k"), F.col("lo").alias("n"))
        )
        wk = Window.partitionBy("k")
        m = F.least(F.min("n").over(wk), F.col("k"))
        ls = (
            sym.withColumn("m", m)
            .filter(F.col("n") > F.col("k"))  # larger neighbours re-link
            .select(F.least("n", "m").alias("lo"), F.greatest("n", "m").alias("hi"))
            .filter(F.col("lo") != F.col("hi"))
            .distinct()
        )
        # ---- small-star: key = hi end, smaller neighbours + key link to min
        wk2 = Window.partitionBy("hi")
        m2 = F.min("lo").over(wk2)  # lo < hi always, so min(neigh+{hi}) = min(lo)
        ss = (
            ls.withColumn("m", m2)
            .select(
                F.explode(
                    F.array(
                        F.struct(F.col("lo").alias("a"), F.col("m").alias("b")),
                        F.struct(F.col("hi").alias("a"), F.col("m").alias("b")),
                    )
                ).alias("e")
            )
            .select(F.least("e.a", "e.b").alias("lo"), F.greatest("e.a", "e.b").alias("hi"))
            .filter(F.col("lo") != F.col("hi"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        sig_row = ss.agg(
            F.count(F.lit(1)).alias("n"),
            # mod keeps the ANSI sum clear of long overflow; the checksum
            # only needs to DETECT change, exactness is the star property
            F.sum(F.xxhash64("lo", "hi") % F.lit(1_000_000_007)).alias("h"),
        ).collect()[0]
        sig = (sig_row["n"], sig_row["h"])
        for df in to_release:
            _release_local_checkpoint(df)
        to_release = [ss]
        edges = ss
        if sig == prev_sig:
            break
        prev_sig = sig
    # at the fixpoint the edge set is a union of stars: hi -> component
    # min. Nodes that ended as centres (or were never re-linked) are
    # their own component root.
    comp = edges.select(F.col("hi").alias("node"), F.col("lo").alias("component"))
    roots = nodes.join(comp, "node", "left_anti").select(
        "node", F.col("node").alias("component")
    )
    # NB: `nodes` and the final `edges` checkpoint back the returned
    # plan — they must NOT be released here (the blocks would vanish
    # from under the caller's first action).
    return comp.union(roots)
