"""Distributed k-means over embedding columns, and the SemDeDup-style
semantic dedup built on it (public literature: Lloyd's algorithm;
Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication").

This supplies the trained-centroid path the IVF index documents
(operators/similarity.ivf_topk: "a production deployment would drop in
sampled k-means centroids") and a cluster-blocked near-duplicate
operator that bounds the quadratic cosine verify by cluster size
instead of a global block grid.

Scale design (the MLlib pattern, re-expressed on the DataFrame API):

* Centroids live on the DRIVER between iterations — k x d doubles, a
  few KB even at k=65k/d=1k — and are re-issued each iteration as
  LITERAL arrays inside a codegen'd argmax expression. Assignment is
  therefore MAP-ONLY: no crossJoin row blow-up, no per-row window, no
  shuffle of the corpus, and the whole argmax runs inside
  whole-stage codegen fused into the scan.
* The update step is ONE aggregation per iteration: posexplode to
  (cluster, dim, x) with map-side partial aggregation, so the shuffle
  carries only ~partitions x k x d partial sums, never the corpus.
* Iterations do not chain lineage: iteration t+1 depends only on the
  collected centroid scalars, so the plan stays one-scan-deep no matter
  how many iterations run (contrast the connected-components loop,
  which needs localCheckpoint to truncate lineage).

Determinism (what makes the DuckDB oracle exact): init centroids are
the k lowest-id vectors; assignment ties break to the lowest cluster
id; per-dimension means are rounded to ``round_digits`` (default 6) so
both engines' summation-order float noise (~1e-15 relative) is
quantised away before it can flip a later-iteration assignment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import cosine, norm

# [(cluster_id, [d floats])] — cluster ids are the init vectors' ids.
Centroids = list[tuple[int, list[float]]]


def _centroid_lit(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def assign_to_centroids(
    emb: DataFrame,
    centroids: Centroids,
    vec_col: str = "embedding",
) -> DataFrame:
    """Adds (cluster, cos_to_centroid): argmax-cosine assignment against
    literal centroids. Map-only (see module docstring); ties break to
    the lowest cluster id via lexicographic struct sort on
    (-cos, cluster)."""
    scored = F.array_sort(
        F.array(
            *[
                F.struct(
                    (-cosine(F.col(vec_col), _centroid_lit(cv))).alias("neg_cos"),
                    F.lit(int(cid)).cast("bigint").alias("cluster"),
                )
                for cid, cv in centroids
            ]
        )
    )[0]
    return (
        emb.withColumn("_best", scored)
        .withColumn("cluster", F.col("_best.cluster"))
        .withColumn("cos_to_centroid", -F.col("_best.neg_cos"))
        .drop("_best")
    )


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> Centroids:
    """Lloyd's k-means: ``iters`` rounds of assign + per-dimension mean.
    Returns the final centroids (cluster id -> vector); clusters that
    lose every member simply drop out, identically on both engines.

    Each iteration costs one corpus scan + one (cluster, dim)-keyed
    aggregation whose shuffle is k x d partial rows per partition; the
    k x d centroid collect is bounded driver data (the same class as the
    connected-components fixpoint scalar)."""
    init = (
        emb.orderBy(id_col)
        .limit(k)
        .select(
            F.col(id_col).cast("bigint").alias("cluster"),
            F.col(vec_col).alias("v"),
        )
        .collect()
    )
    cents: Centroids = [(r["cluster"], [float(x) for x in r["v"]]) for r in init]
    d = len(cents[0][1])
    for _ in range(iters):
        a = assign_to_centroids(emb, cents, vec_col=vec_col)
        rows = (
            a.select("cluster", F.posexplode(F.col(vec_col)).alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.round(F.avg(F.col("x").cast("double")), round_digits).alias("m"))
            .collect()
        )
        by: dict[int, list[float]] = {}
        for r in rows:
            by.setdefault(r["cluster"], [0.0] * d)[r["pos"]] = r["m"]
        cents = sorted(by.items())
    return cents


def centroids_df(spark, cents: Centroids) -> DataFrame:
    """The trained centroids as a (cluster, centroid) DataFrame — the
    drop-in for similarity.ivf_topk's centroid side."""
    return spark.createDataFrame(
        [(int(c), [float(x) for x in v]) for c, v in cents],
        schema="cluster bigint, centroid array<double>",
    )


def kmeans_summary(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(cluster, n_vecs, avg_cos, centroid_norm) after ``iters`` Lloyd
    iterations — the catalog-facing clustering fingerprint: sizes pin
    the assignment, avg_cos pins the maximised similarities, the norm
    pins the centroid values themselves."""
    cents = kmeans_fit(emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    a = assign_to_centroids(emb, cents, vec_col=vec_col)
    sizes = a.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.avg("cos_to_centroid"), 3).alias("avg_cos"),
    )
    norms = centroids_df(emb.sparkSession, cents).select(
        "cluster", F.round(norm(F.col("centroid")), 3).alias("centroid_norm")
    )
    return sizes.join(F.broadcast(norms), "cluster")


def semantic_dedup_pairs(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup: near-duplicate pairs found WITHIN k-means clusters only
    — (cluster, id_a, id_b, cos). The cluster equi-join bounds the
    quadratic cosine verify at ~(n/k)^2 per cluster instead of n^2
    global, which is the published trade-off: cross-cluster near-dups
    are forfeited for a k-fold (per-probe) cost cut, and recall is
    governed by cluster granularity rather than band collision
    probability (the LSH alternative in dedup.embedding_dup_pairs_lsh).

    At 100 TB: partition the corpus by cluster and run the blocked-BLAS
    kernel (dedup._block_cosine_kernel) per cluster for the in-bucket
    verify; the dataflow here — assign, equi-join on cluster, verify —
    is that plan's DataFrame expression with the verify as a codegen'd
    HOF cosine (right at this scale, where clusters are small)."""
    cents = kmeans_fit(emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    a = assign_to_centroids(emb, cents, vec_col=vec_col).select(
        "cluster", F.col(id_col), F.col(vec_col)
    )
    left = a.select(
        "cluster", F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    right = a.select(
        "cluster", F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    cos = cosine(F.col("va"), F.col("vb"))
    return (
        left.join(right, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cos >= threshold)
        .select("cluster", "id_a", "id_b", F.round(cos, 3).alias("cos"))
    )
