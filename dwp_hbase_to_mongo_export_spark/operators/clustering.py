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
  few KB even at k=65k/d=1k — and ride into each iteration inside the
  assignment UDF's closure (Spark broadcasts task closures).
  Assignment is therefore MAP-ONLY — no crossJoin row blow-up, no
  per-row window, no shuffle of the corpus — and runs as ONE
  numpy/BLAS matmul per Arrow batch (V_norm @ C_norm.T, argmax per
  row): the vectorized exception to "UDFs are slow", ~2 orders faster
  than evaluating k higher-order-function cosines per row in
  Catalyst's interpreted HOF evaluator (same rationale as
  dedup.embedding_band_keys / dedup._block_cosine_kernel, both
  oracle-value-checked with the same numerics).
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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.portable import round_portable
from .similarity import norm

# [(cluster_id, [d floats])] — cluster ids are the init vectors' ids,
# kept sorted ascending (kmeans_fit guarantees it) so numpy argmax's
# first-max tie-break lands on the LOWEST cluster id, matching the
# oracle's ORDER BY cos DESC, cluster ASC.
Centroids = list[tuple[int, list[float]]]


def rows_to_centroids(rows) -> Centroids:
    """Collected (id, vector) rows -> the sorted driver-side Centroids
    form every assignment kernel takes (ids ascending = the tie-break
    contract). Shared by kmeans_fit's init, ivf_topk's centroid
    collect, and pq_train's init."""
    return sorted((int(r[0]), [float(x) for x in r[1]]) for r in rows)


def _centroid_arrays(centroids: Centroids, normalise: bool):
    """(ids, matrix) as numpy arrays for a UDF closure; asserts the
    ascending-id tie-break invariant; row-normalises for cosine."""
    ids = np.array([c for c, _ in centroids], dtype=np.int64)
    assert (np.diff(ids) > 0).all(), "centroids must be sorted by cluster id"
    C = np.array([v for _, v in centroids], dtype=np.float64)
    if normalise:
        C = C / np.linalg.norm(C, axis=1, keepdims=True)
    return ids, C


def assign_to_centroids(
    emb: DataFrame,
    centroids: Centroids,
    vec_col: str = "embedding",
    metric: str = "cos",
) -> DataFrame:
    """Adds (cluster, cos_to_centroid): best-centroid assignment against
    the (closure-broadcast) centroids. Map-only, one vectorised numpy
    pass per Arrow batch (see module docstring); exact ties break to
    the lowest cluster id (first-max/-min over ascending ids).

    metric="cos" (default): argmax cosine via one row-normalised BLAS
    matmul — the semantic-similarity metric the embedding family uses.
    metric="l2": argmin SQUARED euclidean distance, computed per
    element as (v-c)^2 (NOT the ||v||^2-2vc+||c||^2 expansion, whose
    different float path would diverge from the oracle's direct form) —
    the product-quantisation codebook metric. The score column keeps
    its name for compatibility; for l2 it holds the squared distance."""
    assert metric in ("cos", "l2"), metric
    ids, Cn = _centroid_arrays(centroids, normalise=metric == "cos")

    @F.pandas_udf("struct<cluster:bigint, cos:double>")
    def _assign(v: pd.Series) -> pd.DataFrame:
        if not len(v):
            return pd.DataFrame(
                {
                    "cluster": pd.Series([], dtype="int64"),
                    "cos": pd.Series([], dtype="float64"),
                }
            )
        V = np.stack([np.asarray(x, dtype=np.float64) for x in v])
        if metric == "cos":
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            sim = Vn @ Cn.T  # n x k
            best = sim.argmax(axis=1)
        else:
            d2 = ((V[:, None, :] - Cn[None, :, :]) ** 2).sum(axis=2)  # n x k
            best = d2.argmin(axis=1)
            sim = d2
        return pd.DataFrame(
            {"cluster": ids[best], "cos": sim[np.arange(len(V)), best]}
        )

    return (
        emb.withColumn("_best", _assign(F.col(vec_col)))
        .withColumn("cluster", F.col("_best.cluster"))
        .withColumn("cos_to_centroid", F.col("_best.cos"))
        .drop("_best")
    )


def assign_topn_centroids(
    emb: DataFrame,
    centroids: Centroids,
    n: int = 1,
    vec_col: str = "embedding",
    out_col: str = "near_clusters",
) -> DataFrame:
    """Adds ``out_col``: array of the ``n`` nearest cluster ids by
    cosine, nearest first — the top-n generalisation of
    assign_to_centroids, same map-only BLAS shape (one row-normalised
    matmul per Arrow batch, centroids ride the task closure; no
    crossJoin row blow-up, no per-row window, no shuffle). This is the
    IVF assignment kernel: n=1 builds the posting lists, n=nprobe picks
    each query's probe set. Ties break to the lowest cluster id
    (stable sort over ascending ids), matching the oracle's
    ORDER BY cos DESC, cluster ASC."""
    ids, Cn = _centroid_arrays(centroids, normalise=True)
    n_eff = min(n, len(ids))

    @F.pandas_udf("array<bigint>")
    def _topn(v: pd.Series) -> pd.Series:
        if not len(v):
            return pd.Series([], dtype="object")
        V = np.stack([np.asarray(x, dtype=np.float64) for x in v])
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        sim = Vn @ Cn.T  # batch x k
        # stable sort of -sim: equal similarities resolve to the FIRST
        # (lowest) cluster id, the same tie-break as argmax/the oracle
        order = np.argsort(-sim, axis=1, kind="stable")[:, :n_eff]
        return pd.Series(list(ids[order]))

    return emb.withColumn(out_col, _topn(F.col(vec_col)))


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    tol: float | None = None,
    metric: str = "cos",
    init: Centroids | None = None,
) -> Centroids:
    """Lloyd's k-means: ``iters`` rounds of assign + per-dimension mean.
    Returns the final centroids (cluster id -> vector); clusters that
    lose every member simply drop out, identically on both engines.
    With ``tol`` set, iteration stops early once the max absolute
    per-component centroid shift falls below it (a driver-side
    comparison of the rounded centroids — deterministic, so early-
    stopped runs are as reproducible as fixed-count ones; the catalog
    oracle uses the fixed-count contract).

    ``init`` overrides the default first-``k``-rows seeding with an
    explicit Centroids list (``k`` is then ignored). The default is the
    deterministic oracle contract, but it draws every seed from the
    LOWEST ids — after an ingest epoch appends data into a new region
    (index drift), Lloyd from old-region-only seeds can leave the new
    region without nearby centroids no matter how many iterations run;
    a drift REBUILD should seed across epochs (see
    similarity.ivf_index_governance).

    Each iteration costs one corpus scan + one (cluster, dim)-keyed
    aggregation whose shuffle is k x d partial rows per partition; the
    k x d centroid collect is bounded driver data (the same class as the
    connected-components fixpoint scalar)."""
    if init is None:
        init_rows = (
            emb.orderBy(id_col)
            .limit(k)
            .select(
                F.col(id_col).cast("bigint").alias("cluster"),
                F.col(vec_col).alias("v"),
            )
            .collect()
        )
        if not init_rows:
            raise ValueError(
                "cannot fit k-means on an empty input frame (zero rows after "
                "filters?) — every clustering entry point calls through here"
            )
        cents: Centroids = rows_to_centroids(init_rows)
    else:
        if not init:
            raise ValueError("explicit k-means init must be non-empty")
        cents = sorted((int(c), [float(x) for x in v]) for c, v in init)
    d = len(cents[0][1])
    for _ in range(iters):
        a = assign_to_centroids(emb, cents, vec_col=vec_col, metric=metric)
        rows = (
            a.select("cluster", F.posexplode(F.col(vec_col)).alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(
                round_portable(F.avg(F.col("x").cast("double")), round_digits).alias("m")
            )
            .collect()
        )
        by: dict[int, list[float]] = {}
        for r in rows:
            by.setdefault(r["cluster"], [0.0] * d)[r["pos"]] = r["m"]
        new_cents = sorted(by.items())
        if tol is not None and len(new_cents) == len(cents):
            shift = max(
                abs(x - y)
                for (_, ov), (_, nv) in zip(cents, new_cents)
                for x, y in zip(ov, nv)
            )
            if shift < tol:
                cents = new_cents
                break
        cents = new_cents
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
        round_portable(F.avg("cos_to_centroid"), 3).alias("avg_cos"),
    )
    norms = centroids_df(emb.sparkSession, cents).select(
        "cluster", round_portable(norm(F.col("centroid")), 3).alias("centroid_norm")
    )
    return sizes.join(F.broadcast(norms), "cluster")


def semantic_dedup_pairs(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_size: int = 4096,
) -> DataFrame:
    """SemDeDup: near-duplicate pairs found WITHIN k-means clusters only
    — (cluster, id_a, id_b, cos). The cluster equi-join bounds the
    quadratic cosine verify at ~(n/k)^2 per cluster instead of n^2
    global, which is the published trade-off: cross-cluster near-dups
    are forfeited for a k-fold (per-probe) cost cut, and recall is
    governed by cluster granularity rather than band collision
    probability (the LSH alternative in dedup.embedding_dup_pairs_lsh).

    The verify is a BLAS matmul per (cluster, block-pair) inside
    mapInPandas (the vectorized exception to "UDFs are slow" — same
    rationale and same numerics as dedup._block_cosine_kernel, which
    the exact-pairs oracle already value-checks): per-pair cost is a
    fused multiply-add, 2-3 orders faster than interpreted per-pair
    HOF cosine. Clusters are SUB-BLOCKED into id-range blocks of
    ``block_size`` rows with an upper-triangle block grid per cluster,
    so a skewed giant cluster becomes many bounded tasks instead of
    one straggler — no task ever gathers more than 2*block_size
    vectors, whatever the cluster size distribution. The blocking is
    invisible in the output (the id_a < id_b mask dedups the diagonal
    and orients cross-block pairs identically)."""
    import pandas as pd  # noqa: F401 — documents the mapInPandas dependency

    cents = kmeans_fit(emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    blocks = (
        assign_to_centroids(emb, cents, vec_col=vec_col)
        .select(
            "cluster",
            F.floor(F.col(id_col) / block_size).alias("blk"),
            F.struct(
                F.col(id_col).alias("id"), F.col(vec_col).alias("v")
            ).alias("r"),
        )
        .groupBy("cluster", "blk")
        .agg(F.collect_list("r").alias("rows"))
    )
    a = blocks.select(
        "cluster", F.col("blk").alias("blk_a"), F.col("rows").alias("rows_a")
    )
    b = blocks.select(
        "cluster", F.col("blk").alias("blk_b"), F.col("rows").alias("rows_b")
    )
    grid = a.join(b, "cluster").filter(F.col("blk_a") <= F.col("blk_b"))
    pairs = grid.mapInPandas(
        _cluster_block_cosine_kernel(threshold),
        "cluster bigint, id_a bigint, id_b bigint, cos double",
    )
    return pairs.select(
        "cluster", "id_a", "id_b", round_portable(F.col("cos"), 3).alias("cos")
    )


def _cluster_block_cosine_kernel(threshold: float):
    """mapInPandas kernel over (cluster, rows_a, rows_b) block-pair rows:
    one BLAS matmul per block pair, emit (id_a < id_b, cos >= threshold)
    with the cluster id passed through."""

    def _kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {"cluster": [], "id_a": [], "id_b": [], "cos": []}
            for cl, rows_a, rows_b in zip(
                pdf["cluster"], pdf["rows_a"], pdf["rows_b"]
            ):
                ida = np.array([r["id"] for r in rows_a], dtype=np.int64)
                idb = np.array([r["id"] for r in rows_b], dtype=np.int64)
                ma = np.array([r["v"] for r in rows_a], dtype=np.float64)
                mb = np.array([r["v"] for r in rows_b], dtype=np.float64)
                ma /= np.linalg.norm(ma, axis=1, keepdims=True)
                mb /= np.linalg.norm(mb, axis=1, keepdims=True)
                sim = ma @ mb.T
                mask = (sim >= threshold) & (ida[:, None] < idb[None, :])
                ii, jj = np.nonzero(mask)
                out["cluster"].append(np.full(len(ii), cl, dtype=np.int64))
                out["id_a"].append(ida[ii])
                out["id_b"].append(idb[jj])
                out["cos"].append(sim[ii, jj])
            yield pd.DataFrame(
                {
                    k: (
                        np.concatenate(v)
                        if v
                        else np.array(
                            [], dtype=np.float64 if k == "cos" else np.int64
                        )
                    )
                    for k, v in out.items()
                }
            )

    return _kernel


def cluster_prototypes_outliers(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    m: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cluster-guided corpus curation (the D4/SemDeDup-family
    prototype selection — public literature): per cluster, the m
    vectors CLOSEST to the centroid ("prototype" — the exemplars worth
    keeping for a compact corpus) and the m FARTHEST ("outlier" — the
    boundary cases worth auditing or upsampling for diversity).
    Returns (cluster, vec_id, cos, role, rank).

    Scale: rides the map-only assignment; the two per-cluster top-m
    selections are windows over k partitions with WindowGroupLimit
    pre-filtering, so only ~k*m rows survive each exchange."""
    from pyspark.sql.window import Window

    cents = kmeans_fit(emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    a = assign_to_centroids(emb, cents, vec_col=vec_col).select(
        "cluster", F.col(id_col), F.col("cos_to_centroid").alias("cs")
    )
    wp = Window.partitionBy("cluster").orderBy(F.desc("cs"), F.asc(id_col))
    wo = Window.partitionBy("cluster").orderBy(F.asc("cs"), F.asc(id_col))

    def top(w, role: str) -> DataFrame:
        return (
            a.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= m)
            .select(
                "cluster",
                id_col,
                round_portable(F.col("cs"), 3).alias("cos"),
                F.lit(role).alias("role"),
                "rank",
            )
        )

    return top(wp, "prototype").unionAll(top(wo, "outlier"))
