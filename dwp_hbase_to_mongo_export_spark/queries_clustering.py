"""Catalog entries for the k-means clustering family
(operators/clustering.py): cluster summary, SemDeDup semantic dedup,
and the trained-centroid IVF index.

The DuckDB oracles reproduce Lloyd's algorithm EXACTLY by unrolling the
fixed iteration count into CTE layers — init from the k lowest-id
vectors, argmax-cosine assignment with lowest-cluster tie-break, and
per-dimension means rounded to 6 decimals (the same quantisation the
Spark side applies, so both engines' float-summation noise is rounded
away before it can flip a later assignment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import clustering, similarity
from .queries import query
from .sources.parquet import load_table

_K = 8
_ITERS = 2
_DIMS = 64


def _kmeans_ctes(k: int = _K, iters: int = _ITERS, dims: int = _DIMS) -> str:
    """WITH-clause body computing c0..c{iters} (centroids) and the FINAL
    assignment ``af`` (vec_id, e, cluster, cs) against c{iters} —
    mirroring clustering.kmeans_fit + assign_to_centroids."""
    parts = [
        "v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)",
        f"c0 AS (SELECT vec_id AS cluster, e AS cv FROM v ORDER BY vec_id LIMIT {k})",
    ]

    def assign(name: str, cents: str) -> str:
        return f"""{name} AS (
      SELECT vec_id, e, cluster, cs FROM (
        SELECT v.vec_id, v.e, c.cluster,
               list_cosine_similarity(v.e, c.cv) AS cs,
               row_number() OVER (PARTITION BY v.vec_id
                 ORDER BY list_cosine_similarity(v.e, c.cv) DESC, c.cluster) AS rn
        FROM v CROSS JOIN {cents} c) WHERE rn = 1)"""

    for t in range(1, iters + 1):
        parts.append(assign(f"a{t}", f"c{t - 1}"))
        parts.append(
            f"""c{t} AS (
      SELECT cluster, list(x ORDER BY pos) AS cv FROM (
        SELECT cluster, g.i AS pos, round(avg(e[g.i]), 6) AS x
        FROM a{t}, (SELECT unnest(range(1, {dims + 1})) AS i) g
        GROUP BY cluster, g.i)
      GROUP BY cluster)"""
        )
    parts.append(assign("af", f"c{iters}"))
    return ",\n    ".join(parts)


@query(
    "kmeans_clusters",
    oracle=f"""
    WITH {_kmeans_ctes()}
    SELECT s.cluster, s.n_vecs, s.avg_cos, n.centroid_norm
    FROM (SELECT cluster, count(*) AS n_vecs, round(avg(cs), 3) AS avg_cos
          FROM af GROUP BY cluster) s
    JOIN (SELECT cluster,
                 round(sqrt(list_aggregate(list_transform(cv, x -> x * x), 'sum')), 3)
                   AS centroid_norm
          FROM c{_ITERS}) n USING (cluster)
    """,
)
def kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means fingerprint after 2 iterations:
    cluster sizes pin the assignment, avg_cos pins the maximised
    similarities, centroid_norm pins the centroid values. Scale: each
    iteration is one map-only Arrow-batched matmul assignment pass plus
    one map-side-combined (cluster, dim) aggregation — the corpus never
    shuffles; centroids round-trip the driver as k x d scalars (the
    MLlib pattern)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return clustering.kmeans_summary(emb, k=_K, iters=_ITERS)


@query(
    "semantic_dedup",
    oracle=f"""
    WITH {_kmeans_ctes()}
    SELECT l.cluster, l.vec_id AS id_a, r.vec_id AS id_b,
           round(list_cosine_similarity(l.e, r.e), 3) AS cos
    FROM af l JOIN af r ON l.cluster = r.cluster AND l.vec_id < r.vec_id
    WHERE list_cosine_similarity(l.e, r.e) >= 0.4
    """,
)
def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: embedding near-dup pairs found WITHIN k-means clusters
    only — the cluster equi-join bounds the quadratic verify at
    ~(n/k)^2 per cluster, trading cross-cluster recall for a k-fold
    cost cut (operators/clustering.semantic_dedup_pairs)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return clustering.semantic_dedup_pairs(emb, k=_K, iters=_ITERS, threshold=0.4)


@query(
    "similarity_topk_ivf_trained",
    oracle=f"""
    WITH {_kmeans_ctes()},
    assign AS (SELECT vec_id, cluster AS cent_id FROM af),
    probes AS (
      SELECT vec_id AS query_id, cluster AS probe FROM (
        SELECT v.vec_id, c.cluster,
               row_number() OVER (PARTITION BY v.vec_id
                 ORDER BY list_cosine_similarity(v.e, c.cv) DESC, c.cluster) AS rn
        FROM v CROSS JOIN c{_ITERS} c WHERE v.vec_id < 10
      ) WHERE rn <= 2
    ),
    cand AS (
      SELECT p.query_id, a.vec_id AS neighbor_id
      FROM probes p JOIN assign a ON a.cent_id = p.probe
      WHERE a.vec_id != p.query_id
    )
    SELECT query_id, neighbor_id, rank FROM (
      SELECT c.query_id, c.neighbor_id,
             row_number() OVER (PARTITION BY c.query_id
               ORDER BY list_cosine_similarity(q.e, n.e) DESC, c.neighbor_id) AS rank
      FROM cand c JOIN v q ON q.vec_id = c.query_id
                  JOIN v n ON n.vec_id = c.neighbor_id
    ) WHERE rank <= 5
    """,
)
def similarity_topk_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production IVF path promised by similarity.ivf_topk's
    docstring: the SAME probe/posting-list dataflow, with trained
    k-means centroids instead of the id-stride placeholder. Posting
    lists follow actual data density, so probe fan-out per query is
    n * nprobe / k of the corpus with balanced lists."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = clustering.kmeans_fit(emb, k=_K, iters=_ITERS)
    cdf = clustering.centroids_df(spark, cents)
    return similarity.ivf_topk(emb, k=5, nprobe=2, max_query_id=10, centroids=cdf)


@query(
    "streaming_kmeans_assign",
    oracle=f"""
    WITH {_kmeans_ctes()}
    SELECT vec_id, cluster, round(cs, 3) AS cos FROM af
    """,
)
def streaming_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-offline / score-on-the-stream: centroids are fit in batch
    (the k-means catalog contract), then arriving vectors are assigned
    on a readStream of the embeddings source and drained with
    AvailableNow — which must equal the batch assignment exactly.
    The assignment is a stateless Arrow-batched map (centroids ride the
    UDF closure), so it is streaming-safe by construction: no state
    store, no watermark, per-micro-batch cost is one matmul. This is
    the continuous-ingest shape of a 100 TB embedding pipeline — new
    corpus shards get cluster/IVF routing as they land, with the same
    plan as the batch path."""
    from .streaming.incremental import run_available_now, stream_table

    emb = load_table(spark, sf_dir, "embeddings")
    cents = clustering.kmeans_fit(emb, k=_K, iters=_ITERS)
    stream = stream_table(spark, sf_dir, "embeddings")
    assigned = clustering.assign_to_centroids(stream, cents).select(
        "vec_id", "cluster", F.round("cos_to_centroid", 3).alias("cos")
    )
    return run_available_now(assigned, state_partitions=None)
