"""Connected-components operator tests: transitivity, multiple
components, keeper selection, and convergence on a chain deeper than
one propagation round."""

from __future__ import annotations

from pyspark.sql import functions as F

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


def test_alternating_matches_propagation_on_fixture_pairs(spark, sf_dir):
    from dwp_hbase_to_mongo_export_spark.operators import dedup
    from dwp_hbase_to_mongo_export_spark.operators.components import (
        connected_components,
        connected_components_alternating,
    )
    from dwp_hbase_to_mongo_export_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.25).select("id_a", "id_b")
    a = {(r.node, r.component) for r in connected_components(pairs).collect()}
    b = {(r.node, r.component) for r in connected_components_alternating(pairs).collect()}
    assert a == b


def test_alternating_converges_on_deep_chain(spark):
    """A 120-node path graph has diameter 119 — min-label propagation
    needs ~119 rounds (over its max_iter), the star alternation O(log n).
    Ground truth: every node collapses to component 0."""
    from dwp_hbase_to_mongo_export_spark.operators.components import (
        connected_components_alternating,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(119)], "id_a long, id_b long"
    )
    out = {(r.node, r.component) for r in
           connected_components_alternating(chain, max_iter=12).collect()}
    assert out == {(i, 0) for i in range(120)}


def test_quality_report_gates_on_injected_violations(spark):
    """Constraint checker catches injected nulls, dupes, and orphans."""
    from pyspark.sql import functions as F

    from dwp_hbase_to_mongo_export_spark.operators import quality

    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    child = spark.createDataFrame(
        [(1, 10), (1, None), (3, -5), (2, 7)], "fk long, v long"
    )
    report = {
        r.check_name: r
        for r in quality.quality_report(
            [
                quality.row_constraints_report(
                    child,
                    {"v_not_null": F.col("v").isNotNull(),
                     "v_positive": F.col("v") > 0},
                ),
                quality.uniqueness_report(child, "fk_unique", "fk"),
                quality.referential_report(child, "fk", parent, "pk", "fk_refs"),
            ]
        ).collect()
    }
    assert report["v_not_null"].violations == 1
    assert report["v_positive"].violations == 2  # null counts as violation
    assert report["fk_unique"].violations == 1
    assert report["fk_refs"].violations == 1
    assert all(r.n_checked == 4 for r in report.values())
    assert not any(r["pass"] for r in report.values())


def test_quality_same_key_name_and_empty_table(spark):
    """Review regressions: referential check with IDENTICAL key names on
    both sides (the common FK shape) must not raise
    AMBIGUOUS_REFERENCE; constraints over an EMPTY table must report
    violations=0 / pass=true, not NULL (a NULL pass silently slips
    through a filter(~pass) gate)."""
    from pyspark.sql import functions as F

    from dwp_hbase_to_mongo_export_spark.operators import quality

    parent = spark.createDataFrame([(1,), (2,)], "k long")
    child = spark.createDataFrame([(1,), (3,)], "k long")
    r = quality.referential_report(child, "k", parent, "k", "fk").collect()[0]
    assert r.violations == 1 and r.n_checked == 2

    empty = spark.createDataFrame([], "v long")
    rep = quality.quality_report(
        [quality.row_constraints_report(empty, {"v_pos": F.col("v") > 0})]
    ).collect()[0]
    assert rep.n_checked == 0 and rep.violations == 0
    assert rep["pass"] is True


def test_operator_cache_slots_do_not_accumulate(spark, sf_dir):
    """Re-invoking a cache-backed dedup operator must not grow session
    storage: the slot swaps, leaving at most one live cached relation."""
    from dwp_hbase_to_mongo_export_spark.operators import _cache, textops
    from dwp_hbase_to_mongo_export_spark.sources.parquet import load_table

    def slot_entries(slot):
        return [k for k in _cache._SLOTS if k[0] == slot]

    docs = load_table(spark, sf_dir, "documents")
    for _ in range(3):
        textops.winnowing_overlap_pairs(docs, min_shared=5).count()
    # same input three times -> ONE live entry (semantic-hash reuse),
    # not three
    assert len(slot_entries("winnowing_overlap_pairs")) == 1
    _cache.release("winnowing_overlap_pairs")
    assert not slot_entries("winnowing_overlap_pairs")


def test_operator_cache_keeps_concurrent_inputs_live(spark, sf_dir):
    """Interleaved invocations on DIFFERENT inputs must not evict each
    other's in-flight relation (the threaded-bench failure mode): both
    stay live, a third distinct input evicts the oldest, and the
    evicted-then-reused input simply re-persists and still computes
    correctly."""
    from pyspark.sql import functions as F

    from dwp_hbase_to_mongo_export_spark.operators import _cache

    def slot_entries(slot):
        return [k for k in _cache._SLOTS if k[0] == slot]

    slot = "test_concurrent_inputs"
    _cache.release(slot)
    a = spark.range(0, 100).withColumn("v", F.col("id") * 2)
    b = spark.range(0, 50).withColumn("v", F.col("id") * 3)
    c = spark.range(0, 25).withColumn("v", F.col("id") * 5)
    ca = _cache.swap_cache(slot, a)
    cb = _cache.swap_cache(slot, b)
    assert len(slot_entries(slot)) == 2
    # A is still usable after B was cached (no cross-input eviction)
    assert ca.count() == 100 and cb.count() == 50
    # same-plan re-request returns the SAME live frame, no new entry
    assert _cache.swap_cache(slot, spark.range(0, 100).withColumn("v", F.col("id") * 2)) is ca
    assert len(slot_entries(slot)) == 2
    # a third distinct input evicts the oldest (b was refreshed after a?
    # no — order is a, b; the reuse refreshed a, so b is oldest)
    _cache.swap_cache(slot, c)
    assert len(slot_entries(slot)) == 2
    assert ca.count() == 100  # still correct even if evicted/unpersisted
    _cache.release(slot)
    assert not slot_entries(slot)
