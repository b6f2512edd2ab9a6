"""Measured comparison: plain sort-merge join vs AQE skew handling vs
the explicit skew-split join (operators/skewjoin.py) on a PATHOLOGICAL
key — the round-7 verdict's ask: the operator's docstring argues it
beats AQE for keys a partition split can't save; this script produces
the number.

Fixture: a fact table where ONE key holds ``hot_frac`` of all rows
(default 40% — far larger than any task), the rest uniform over
``n_dim`` keys; a dimension table too large to broadcast whole
(autoBroadcastJoinThreshold is disabled for the plain/AQE legs to
emulate the 100 TB star-schema shape — skew_split_join's own hints are
unaffected, that is its point: it broadcasts only the HOT SUBSET of the
dimension).

Each leg runs the same join + aggregation; timings are best-of-2 after
a warmup. Results land in stdout as one JSON line for pasting into
SCALING.md.

Usage::

    python tools/skew_bench.py [n_fact] [hot_frac]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dwp_hbase_to_mongo_export_spark.operators.skewjoin import (  # noqa: E402
    skew_split_join,
)
from dwp_hbase_to_mongo_export_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_fact = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    hot_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.4
    n_dim = 200_000
    hot_key = 7

    spark = get_spark(app_name="skew-bench")
    base = tempfile.mkdtemp(prefix="skew_bench_")
    fact_path, dim_path = f"{base}/fact", f"{base}/dim"

    n_hot = int(n_fact * hot_frac)
    # hot rows all carry hot_key; cold rows spread uniformly (xxhash for
    # determinism without Python RNG)
    spark.range(n_fact).select(
        F.when(F.col("id") < n_hot, F.lit(hot_key))
        .otherwise((F.abs(F.xxhash64("id")) % n_dim).cast("long"))
        .alias("k"),
        (F.col("id") % 1000).cast("double").alias("v"),
    ).write.mode("overwrite").parquet(fact_path)
    spark.range(n_dim).select(
        F.col("id").alias("dk"), (F.col("id") % 25).alias("grp")
    ).write.mode("overwrite").parquet(dim_path)

    def run(label: str, conf: dict[str, str], builder) -> float:
        for k, v in conf.items():
            spark.conf.set(k, v)
        try:
            samples = []
            for _ in range(2):
                fact = spark.read.parquet(fact_path)
                dim = spark.read.parquet(dim_path)
                t0 = time.time()
                builder(fact, dim).groupBy("grp").agg(
                    F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
                ).collect()
                samples.append(round(time.time() - t0, 2))
            return min(samples)
        finally:
            for k in conf:
                spark.conf.unset(k)

    def plain(fact, dim):
        return fact.join(dim.hint("merge"), fact.k == dim.dk)

    def split(fact, dim):
        return skew_split_join(fact, dim, "k", "dk")

    def split_sampled(fact, dim):
        # inline detection from a seeded 2% sample (routing-grade)
        return skew_split_join(fact, dim, "k", "dk", detect="sample")

    def split_known(fact, dim):
        # the production shape: hot list precomputed/amortised
        return skew_split_join(fact, dim, "k", "dk", hot_keys=[hot_key])

    no_bcast = {"spark.sql.autoBroadcastJoinThreshold": "-1"}
    results = {
        "plain_smj_no_aqe": run(
            "plain", {**no_bcast, "spark.sql.adaptive.enabled": "false"}, plain
        ),
        "plain_smj_aqe_skewjoin": run(
            "aqe",
            {
                **no_bcast,
                "spark.sql.adaptive.enabled": "true",
                "spark.sql.adaptive.skewJoin.enabled": "true",
                # make AQE actually see the skew at this data size (the
                # 100 TB analogue: partitions >> the skew threshold)
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8m",
                "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
            },
            plain,
        ),
        "skew_split_join_inline_exact": run("split", no_bcast, split),
        "skew_split_join_inline_sampled": run("split-sampled", no_bcast, split_sampled),
        "skew_split_join_known_hot": run("split-known", no_bcast, split_known),
    }
    print(
        json.dumps(
            {
                "n_fact": n_fact,
                "hot_frac": hot_frac,
                "n_dim": n_dim,
                "seconds": results,
            }
        )
    )


if __name__ == "__main__":
    main()
