

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


def test_transform_with_state_gate_and_plan_without_protobuf(spark, sf_dir, monkeypatch):
    """The no-protobuf contract (pinned even in environments WITHOUT
    the library, closing the never-executed-gate gap): the availability
    probe reflects real importability, its ImportError branch is
    exercised by force-hiding google.protobuf, and PLAN construction of
    the transformWithState query succeeds with the declared output
    schema regardless — only the drain needs the state-server
    protocol."""
    import builtins
    import importlib

    from dwp_hbase_to_mongo_export_spark.streaming import incremental as s

    def probe() -> bool:
        try:
            importlib.import_module("google.protobuf.descriptor")
            return True
        except ImportError:
            return False

    assert s.transform_with_state_available() == probe()

    # force the ImportError branch (runs the gate's False path even
    # where protobuf IS installed)
    real_import = builtins.__import__

    def hide_protobuf(name, *a, **k):
        if name.startswith("google.protobuf") or name == "google":
            raise ImportError(f"hidden for test: {name}")
        return real_import(name, *a, **k)

    import sys

    for mod in [m for m in sys.modules if m == "google" or m.startswith("google.")]:
        monkeypatch.delitem(sys.modules, mod, raising=False)
    monkeypatch.setattr(builtins, "__import__", hide_protobuf)
    assert s.transform_with_state_available() is False
    monkeypatch.setattr(builtins, "__import__", real_import)

    # plan construction + registration surface work without protobuf
    df = s.transform_with_state_user_stats(spark, sf_dir)
    assert df.isStreaming
    assert (
        df.schema.simpleString()
        == "struct<user_id:bigint,n_events:bigint,total_value:double>"
    )


def test_running_user_stats_processor_logic_stub():
    """The StatefulProcessor's per-key logic, executed against a fake
    handle/ValueState (no state server, no protobuf): two micro-batches
    must accumulate, emitting the running (n_events, total_value)."""
    import pandas as pd

    from dwp_hbase_to_mongo_export_spark.streaming.incremental import (
        _running_user_stats_processor,
    )

    class FakeValueState:
        def __init__(self):
            self.v = None

        def get(self):
            return self.v

        def update(self, v):
            self.v = v

    class FakeHandle:
        def __init__(self):
            self.states = {}

        def getValueState(self, name, schema):
            assert schema == "n bigint, total double"
            return self.states.setdefault(name, FakeValueState())

    proc = _running_user_stats_processor()
    handle = FakeHandle()
    proc.init(handle)
    batch1 = [pd.DataFrame({"value": [1.0, 2.0]}), pd.DataFrame({"value": [3.0]})]
    (out1,) = list(proc.handleInputRows((7,), iter(batch1), None))
    assert out1.to_dict("records") == [
        {"user_id": 7, "n_events": 3, "total_value": 6.0}
    ]
    batch2 = [pd.DataFrame({"value": [0.5]})]
    (out2,) = list(proc.handleInputRows((7,), iter(batch2), None))
    assert out2.to_dict("records") == [
        {"user_id": 7, "n_events": 4, "total_value": 6.5}
    ]
    assert handle.states["agg"].v == (4, 6.5)
    proc.close()
