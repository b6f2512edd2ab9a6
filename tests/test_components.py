"""Connected-components operator tests: transitivity, multiple
components, keeper selection, and convergence on a chain deeper than
one propagation round."""

from __future__ import annotations

from dwp_hbase_to_mongo_export_spark.operators.components import (
    connected_components,
    dedup_clusters,
)


def test_transitive_chain_collapses_to_one_component(spark):
    # 1-2, 2-3, 3-4, 4-5: diameter 4 forces multiple propagation rounds.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "id_a long, id_b long"
    )
    comp = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_separate_components_stay_separate(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (10, 11), (11, 12)], "id_a long, id_b long"
    )
    comp = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 10: 10, 11: 10, 12: 10}


def test_dedup_clusters_keeper_and_size(spark):
    pairs = spark.createDataFrame(
        [(7, 3), (3, 9), (20, 21)], "id_a long, id_b long"
    )
    rows = {r["doc_id"]: r for r in dedup_clusters(pairs).collect()}
    assert rows[3]["component"] == 3 and rows[3]["is_keeper"]
    assert rows[7]["cluster_size"] == 3 and not rows[7]["is_keeper"]
    assert rows[9]["cluster_size"] == 3
    assert rows[20]["is_keeper"] and rows[20]["cluster_size"] == 2
    assert not rows[21]["is_keeper"]
