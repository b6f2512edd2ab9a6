"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from __spark_entry__ import queries  # noqa: E402
from dwp_hbase_to_mongo_export_spark.session import get_spark  # noqa: E402


def bench_action(df: DataFrame) -> DataFrame:
    """The timed action: a 1-row aggregate of xxhash64 over ALL output
    columns. ``count()`` is NOT a valid bench action (round-10 verdict,
    the dedup_spans_apply finding — generalised by round-11's plan
    probe): under ``count()`` Catalyst prunes every column the row
    count doesn't need, which drops aggregate expressions (q1's eight
    sums/avgs vanish), eliminates left joins against unique-keyed
    sides, and in the worst case reduces the whole operator to a
    parquet row-count (dedup_spans_apply's counted plan was literally
    ``count over Project over Relation`` — 0 of its 2 joins and 3
    generates survived). Hashing every output column makes every
    column, join, and projection load-bearing: Catalyst cannot prune
    work whose result feeds the hash, so the timed plan is the
    full-work plan — the same reason tools/check_correctness.py's
    value hashes were never affected. The reference bar: its
    integration spec pins bytes actually written, not plan residue
    (src/integration/kotlin/UberTestSpec.kt:180-206).

    tools/bench_plan_lint.py compares this action's plan against the
    legacy counted plan per catalog query and fails if the action ever
    loses operators or scan columns again. Map columns go through
    to_json (hash expressions reject MapType); names are
    backtick-quoted; pmod keeps the sum far from int64 overflow under
    ANSI mode."""
    cols = [
        F.to_json(F.col(f"`{c}`")) if t.startswith("map<") else F.col(f"`{c}`")
        for c, t in df.dtypes
    ]
    return df.agg(
        F.sum(F.pmod(F.xxhash64(*cols), F.lit(1_000_000_007))).alias("h")
    )

# Reported in the stdout contract line (must stay ~25 entries so the JSON
# line fits the driver's 2000-char tail); every other query is still timed
# and lands in bench_full.json.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q9_profit_by_nation_year",
    "q13_order_distribution",
    "q18_large_orders",
    "q21_sole_late_supplier",
    "latest_per_key",
    "time_range_scan",
    "envelope_extract",
    "export_pipeline_e2e",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash_near",
    "dedup_embedding_cosine",
    "similarity_topk_bruteforce",
    "similarity_topk_ivf",
    "similarity_topk_ivf_indexed",
    "similarity_topk_pq_indexed",
    "text_langid",
    "token_counts",
    "bpe_merges",
    "asof_click_attribution",
    "session_windows",
    "streaming_windowed_counts",
    "streaming_stateful_latest",
    "dedup_embedding_cosine_lsh",
    "dedup_clusters_alternating",
    "streaming_export_pipeline",
    "sequence_packing",
    "train_val_split",
    "corpus_global_shuffle",
    "text_boilerplate_df",
    "corpus_filter_pipeline",
    "text_unigram_logprob",
    "kmeans_clusters",
    "semantic_dedup",
    "similarity_topk_ivf_trained",
    "tfidf_top_terms",
    "bm25_search",
    "winnowing_overlap",
    "corpus_temperature_mix",
    "streaming_kmeans_assign",
    "heavy_hitters_screened",
    "zorder_layout",
    "bloom_semijoin_reduction",
    "bm25_indexed",
    "scd2_incremental",
    "value_quantiles_hist",
    "dedup_incremental_indexed",
    "snapshot_sink_export",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    # Re-lay the single-row-group fixtures out as multi-file tables ONCE,
    # outside timing (round-11 verdict #6: one-row-group parquet plans
    # every scan as ONE task, so the bench measured per-query fixed
    # costs and the 8-core run beat the 32-core run). The copy is
    # content-identical (sources/rechunk.py verifies nothing and
    # computes nothing from results — it is a pure input re-layout, the
    # layout a production table would actually have), built per source
    # fingerprint under a flock, and shared by every core-count tier so
    # the driver's scaling comparison stays apples-to-apples. Set
    # SPARK_GRAFT_NO_RECHUNK=1 to bench the raw single-row-group layout
    # (the pre-r12 measurement condition).
    if not os.environ.get("SPARK_GRAFT_NO_RECHUNK"):
        from dwp_hbase_to_mongo_export_spark.sources.rechunk import multifile_copy

        try:
            sf_dir = multifile_copy(sf_dir)
        except Exception as e:
            print(f"bench: fixture re-layout failed, using raw dir: {e}",
                  file=sys.stderr)
    spark = get_spark(app_name="bench")
    # Time the full operator surface: the gated catalog plus bench-only
    # entries (no oracle by structure — e.g. the OPQ rotation — but
    # still first-class timing surfaces).
    from dwp_hbase_to_mongo_export_spark.queries import BENCH_ONLY

    qs = dict(queries())
    qs.update(BENCH_ONLY)
    names = [n for n in HEADLINE if n in qs] + [n for n in qs if n not in HEADLINE]

    # Warm the JVM (codegen + C2 JIT) AND the Python worker pool before
    # timing by running EVERY query once at sf0.01. Two session-lifetime
    # costs otherwise land on arbitrary timed queries: (a) each distinct
    # ArrowEvalPython chain position forks one Python worker per task
    # (~1 s fork + ~3 s pandas import, ×32 tasks, paid concurrently), and
    # (b) whole-stage-codegen classes JIT-compile only after enough
    # invocations — measured cold-vs-steady-state gap on the e2e pipeline
    # is 33 s vs 3.9 s for identical data. sf0.01 is big enough to reach
    # the same compiled paths at 1/10 the data cost.
    raw_sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.path.join(os.path.dirname(raw_sf.rstrip("/")), "sf0.01")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    elif warm_dir != sf_dir and not os.environ.get("SPARK_GRAFT_NO_RECHUNK"):
        from dwp_hbase_to_mongo_export_spark.sources.rechunk import multifile_copy

        try:
            warm_dir = multifile_copy(warm_dir)
        except Exception:
            pass  # warmup works on the raw layout too
    for name in names:
        try:
            bench_action(qs[name](spark, warm_dir)).collect()
        except Exception:
            pass
    spark.catalog.clearCache()
    # The warmup pass leaves ~a heap of short-lived garbage; collect it NOW
    # so the first timed queries don't absorb a major GC that belongs to
    # the warmup.
    spark.sparkContext._jvm.System.gc()
    time.sleep(1)

    # Best-of-N per query with early stop: single-shot timings carry
    # ±2-3x noise from GC pauses, Python-worker scheduling, and (on this
    # box) host-level contention invisible to the guest — measured
    # whole-run totals swing 59 s vs 93 s for identical code. Two runs;
    # if they disagree by >20% take a third; report the min — the
    # steady-state cost a real deployment's Nth run of the operator pays.
    timings: dict[str, float] = {}
    for name in names:
        samples: list[float] = []
        for attempt in range(3):
            t0 = time.time()
            try:
                bench_action(qs[name](spark, sf_dir)).collect()
                dt = round(time.time() - t0, 3)
                samples.append(dt)
            except Exception as e:  # a broken query should not hide the others
                print(f"bench error {name}: {e}", file=sys.stderr)
                break
            # Queries are independent: drop any persist() state a query
            # built so later timings measure the query, not accumulated
            # heap pressure.
            spark.catalog.clearCache()
            # A heavy query's garbage otherwise bills the NEXT query's
            # timing as a major GC pause (measured: a 1 s query reading
            # 7 s right after the e2e pipeline).
            if dt > 2.0:
                spark.sparkContext._jvm.System.gc()
            if len(samples) >= 2 and min(samples) > 0:
                lo, hi = sorted(samples)[:2]
                if hi <= lo * 1.2:  # two runs agree — jitter didn't bite
                    break
        timings[name] = min(samples) if samples else -1.0
    total = round(sum(v for v in timings.values() if v >= 0), 3)

    # Full per-query map goes to a side file; the stdout contract line must
    # stay SHORT — the driver keeps only the last 2000 chars of output, so a
    # 90-query JSON line gets truncated mid-line and recorded as unparseable
    # (round 1's BENCH_r01.json: rc=0, parsed=null, tail len=2000).
    #
    # The COMMITTED bench_full.json is only rewritten under --refresh:
    # it is the canonical quiet-run record, and a driver/CI invocation
    # overwriting it with its own (noisier) numbers leaves the working
    # tree dirty and de-canonicalises the committed run. Default runs
    # write the full map to an uncommitted side path instead.
    if "--refresh" in sys.argv:
        full_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "bench_full.json"
        )
    else:
        full_path = os.path.join(
            tempfile.gettempdir(), "spark_graft_bench_full.json"
        )
    try:
        with open(full_path, "w") as f:
            json.dump({"total": total, "sf": sf, "queries": timings}, f, indent=1, sort_keys=True)
    except OSError as e:
        print(f"bench full-map write failed ({full_path}): {e}", file=sys.stderr)

    reported = {n: timings[n] for n in HEADLINE if n in timings}
    line = json.dumps(
        {
            "metric": "total_query_seconds",
            "value": total,
            "unit": "sec",
            "queries": reported,
            "sf": sf,
            "n_queries": len(timings),
        }
    )
    # Hard guarantee the contract line survives the driver's 2000-char tail.
    while len(line) > 1800 and reported:
        reported.popitem()
        line = json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": reported,
                "sf": sf,
                "n_queries": len(timings),
            }
        )
    print(line)

    # A -1.0 means a query errored — that is a red build, not a slow one.
    # Exit non-zero so CI / the round driver can't record a green bench
    # that silently dropped queries (round 2 shipped 14 of these).
    broken = sorted(n for n, v in timings.items() if v < 0)
    if broken:
        print(f"bench FAILED queries: {broken}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
