

def test_transform_with_state_runs_when_protobuf_available(spark, sf_dir):
    """The Spark 4 arbitrary-state API path: skipped where the protobuf
    runtime dependency is absent (this sandbox), exercised end-to-end
    where present — final state must equal the batch GROUP BY."""
    import pytest

    from dwp_hbase_to_mongo_export_spark.streaming import incremental as s

    if not s.transform_with_state_available():
        pytest.skip("google.protobuf unavailable: transformWithState "
                    "Python worker cannot start in this environment")
    out = s.run_available_now(
        s.transform_with_state_user_stats(spark, sf_dir)
    )
    from dwp_hbase_to_mongo_export_spark.sources.parquet import load_table
    from pyspark.sql import functions as F

    expected = {
        (r.user_id, r.n)
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert {(r.user_id, r.n_events) for r in out.collect()} == expected


def test_run_available_now_mode_not_fooled_by_column_names(spark, sf_dir):
    """Plan-node classification: a stateless stream with a column
    literally named 'AggregateScore' must drain in append mode, not be
    misclassified as an aggregation (review finding: substring matching
    on the pretty-printed plan)."""
    from pyspark.sql import functions as F

    from dwp_hbase_to_mongo_export_spark.streaming import incremental as s

    stream = s.stream_table(spark, sf_dir, "events").select(
        "event_id", F.col("value").alias("AggregateScore")
    )
    out = s.run_available_now(stream, state_partitions=None)
    assert out.count() > 0  # complete-mode would raise AnalysisException
