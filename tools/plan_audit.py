"""Catalog-wide physical-plan audit.

Builds every ``queries()`` entry at sf0.001 and inspects its plan for
the scale smells the per-query plan tests check individually:

- ``BatchEvalPython`` — a row-at-a-time Python UDF in the plan (the
  slow path; every UDF here is supposed to be Arrow-batched);
- ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` — a non-equi join
  that would be quadratic at scale (a small allowlist covers the
  operators where a broadcast nested-loop is the DESIGN: broadcast
  query-side similarity scans and bounded all-pairs verifiers);
- the ``Exchange`` count — how many shuffles the query pays.

Usage::

    python tools/plan_audit.py            # writes PLANS.md, exits 1 on flags
    python tools/plan_audit.py sf_dir     # different scale dir

Streaming queries (``streaming_*``) execute their stream when invoked,
so their returned (already-drained) frame has a trivial plan; they are
listed but their audit reflects the drain result, not the streaming
plan — the streaming plans are covered by tests/test_plans.py asserts.
"""

from __future__ import annotations

import contextlib
import io
import sys

sys.path.insert(0, ".")

from __spark_entry__ import queries  # noqa: E402
from dwp_hbase_to_mongo_export_spark.session import get_spark  # noqa: E402

# Operators where a broadcast nested-loop / cross join IS the intended
# plan: a tiny broadcast side scanning the corpus once (similarity
# top-k), or a bounded all-pairs verifier documented as the exact
# baseline (embedding cosine without LSH, id-bounded jaccard).
NESTED_LOOP_ALLOWED = {
    "similarity_topk_bruteforce",  # broadcast query side x corpus
    "similarity_topk_int8",  # broadcast query side x dequantised corpus
    "similarity_topk_ivf",  # broadcast centroids x corpus
    "similarity_topk_ivf_trained",  # broadcast trained centroids x corpus
    "similarity_topk_lsh",  # broadcast centroids for ranking
    "dedup_embedding_cosine",  # documented exact bounded baseline
    "dedup_embedding_cosine_lsh",  # block grid within bucket (bounded)
    "q19_disjunctive_pred",  # disjunctive join predicate (TPC-H shape)
    # scalar-subquery comparisons: the nested loop's build side is the
    # ONE-row global aggregate (HAVING x > scalar) — O(n), not O(n^2)
    "q11_important_suppliers",
    "q22_idle_customers",
    "text_unigram_logprob",  # broadcast ONE-row total-count scalar
    "tfidf_top_terms",  # broadcast ONE-row corpus-size scalar
    "bm25_search",  # broadcast ONE-row avgdl + corpus-size scalars
    "winnowing_overlap",  # broadcast ONE-row corpus-size scalar (df cap)
    "corpus_temperature_mix",  # broadcast ONE-row total-weight scalar
    "data_quality_report",  # ONE-row orphan-count x ONE-row total join
    # recall evaluation embeds the brute-force ground truth (broadcast
    # sampled-query side x corpus — the same allowed shape as
    # similarity_topk_bruteforce); everything downstream is sample-sized
    "ann_recall_report",
    "ann_recall_filtered",  # same shape, ground truth over the allowed set
    # histogram-quantile probe: non-equi range join of <=4 probe rows
    # against the <=nbins-row cumulative sketch — both sides are
    # sketch-sized regardless of corpus size (pinned by
    # tests/test_sketches.py::test_hist_quantiles_relations_are_sketch_sized)
    "value_quantiles_hist",
    # same probe shape over the stream-built sketch (state <= nbins rows)
    "streaming_quantiles_hist",
    # grouped variant: the nested loop is the |groups|-row totals x
    # 4-row quantile-literal cross (broadcast, constant build side);
    # the sketch probe itself is a BroadcastHashJoin on the group key
    "quantiles_by_type_hist",
    # KMV set algebra: the cross is two 1-row sketch-statistic
    # aggregates (k/max-hash x both-membership count) — scalar x scalar
    "kmv_jaccard_sets",
    # durable text index: the cross is the broadcast 1-row meta
    # relation (n_docs, avgdl) against the pruned postings — scalar side
    "bm25_indexed",
    # RRF fusion: the nested loop is brute_force_topk's broadcast
    # 1-query x corpus scan (the same allowed shape as
    # similarity_topk_bruteforce); the fusion join itself is 20x20 rows
    "hybrid_search_rrf",
    # strict-vs-normalised policy rows x the ONE-row corpus word total:
    # a 2x1 cross of global aggregates — scalar x scalar
    "span_dedup_policy_report",
    # HLL estimate vs exact: the cross is the ONE-row register
    # aggregate x the ONE-row exact-count scalar — scalar x scalar
    "distinct_users_hll",
    "distinct_users_hll_indexed",  # same shape, registers from the store
    # DSIR bucket models: the cross is the broadcast ONE-row
    # (target-total, raw-total) scalar against the <=1024-row bucket
    # relation — the text_unigram_logprob total-count shape
    "dsir_importance_weights",
    "dsir_resample",  # same models feed the sample's weight table
    "streaming_dsir_weights",  # same models, counts drained from the stream
    # epoch planning: the cross is the |sources|-row stats relation x
    # the ONE-row temperature-weight total — scalar side (the
    # corpus_temperature_mix shape)
    "corpus_epoch_plan",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="plan-audit")
    rows = []
    flagged = []
    # The audit covers the FULL operator surface: the gated catalog plus
    # the bench-only entries (oracle-less by structure, e.g. the OPQ
    # rotation) — a query leaving the correctness gate must not also
    # leave the plan audit.
    from dwp_hbase_to_mongo_export_spark.queries import BENCH_ONLY

    audited = dict(queries())
    audited.update(BENCH_ONLY)
    for name, fn in audited.items():
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("extended")
            plan = buf.getvalue()
        except Exception as e:  # noqa: BLE001
            rows.append((name, "ERROR", str(e).splitlines()[0][:100]))
            flagged.append(name)
            continue
        phys = plan.split("== Physical Plan ==")[-1]
        n_exchange = phys.count("Exchange ")
        smells = []
        if "BatchEvalPython" in phys:
            smells.append("row-at-a-time-UDF")
        if (
            "CartesianProduct" in phys or "BroadcastNestedLoopJoin" in phys
        ) and name not in NESTED_LOOP_ALLOWED:
            smells.append("nested-loop-join")
        rows.append((name, f"exchanges={n_exchange}", " ".join(smells) or "ok"))
        if smells:
            flagged.append(name)

    lines = [
        "# Plan audit (generated by tools/plan_audit.py)",
        "",
        f"sf_dir: {sf_dir} — {len(rows)} queries, {len(flagged)} flagged",
        "",
        "| query | shuffles | flags |",
        "|---|---|---|",
    ]
    for name, ex, fl in rows:
        lines.append(f"| {name} | {ex} | {fl} |")
    with open("PLANS.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"{len(rows)} queries audited, {len(flagged)} flagged: {flagged}")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
