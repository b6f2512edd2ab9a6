"""Scale sweep: measure how headline queries scale with input volume.

Builds replicated variants of the sf0.1 tables (N symlinked copies of
each parquet file read as one directory — zero disk copy) and times a
set of map/aggregate/window-shaped queries at sf0.01, sf0.1, and
sf0.1 x10 / x100. Row duplication changes JOIN cardinalities, so only
queries whose semantics degrade gracefully under duplicated ids are
swept (scans, aggregations, windows, hash dedup) — the point is the
measured scaling exponent, not the answer.

Writes SCALING.md: per query, time at each volume and the ratio of
time-growth to data-growth (1.0 = perfectly linear; <1 = sub-linear,
fixed overhead amortising; >1 = super-linear, a scale smell).

Caveats (stated in the output): replicated files share one OS page
cache entry, so IO is cheaper than a true 10x/100x corpus — CPU-side
work (decode, normalise, hash, shuffle) dominates the measurement,
which is the engine-relevant part on warm storage.

Usage: python tools/scale_sweep.py [--quick]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from __spark_entry__ import queries  # noqa: E402
from dwp_hbase_to_mongo_export_spark.session import get_spark  # noqa: E402
from dwp_hbase_to_mongo_export_spark.sources.parquet import TABLES  # noqa: E402

SWEEP_QUERIES = [
    "q1_pricing_summary",      # scan + group agg
    "q6_forecast_revenue",     # scan + filter + scalar agg
    "dedup_exact",             # content hash + groupBy
    "text_quality",            # map-only feature extraction
    "token_counts",            # tokenise + agg
    "latest_per_key",          # key window dedup
    "envelope_extract",        # map-only JSON parse
    "sequence_packing",        # shard window + two-level agg
    "value_quantiles_hist",    # histogram sketch: constant-size shuffle
    "heavy_hitters_screened",  # CMS build + map-side screened exact agg
    "scd2_history",            # one key shuffle, two shared-sort windows
    "zorder_layout",           # range-partitioned sorted rewrite
    "distinct_users_kmv",      # constant-state KMV fold (r8): linear
                               # map-side Arrow scan, <=64-row/partition
                               # exchange — growth measures the scan
    "snapshot_sink_export",    # rolled encrypted export write + read-back
                               # (r9): map-only mapInPandas both ways,
                               # zero shuffles — linear is correct; file
                               # count grows with rows (roll size fixed)
    "distinct_users_hll",      # HLL register build (r11): linear scan,
                               # <=256-row/partition max() exchange —
                               # duplication-invariant by idempotence
    "dsir_importance_weights",  # DSIR models + per-doc weights (r11):
                               # token scan, 1024-row broadcast model,
                               # one doc-keyed agg — linear
]

# The clustering/search/near-dup families need DISTINCT-content
# replicas, not symlinked row duplication: verbatim duplication makes
# every copy a true near-duplicate of its original, so pair-emitting
# operators' OUTPUT grows quadratically in the replication factor — a
# property of the pathological data, not of the plan. The distinct
# replicas shift ids and decorrelate content (per-replica sign-flip of
# embedding dimensions, per-replica character rotation of text), so
# true-pair counts stay linear and the sweep measures plan scaling.
DISTINCT_SWEEP_QUERIES = [
    "kmeans_clusters",         # iterative assign + k x d agg
    "semantic_dedup",          # cluster-blocked quadratic verify
    "similarity_topk_ivf_full",  # posting-list probe join, UNBOUNDED corpus
    "bm25_search",             # inverted-index postings join
    "winnowing_overlap",       # fingerprint self-join, df-capped
    "bpe_merges",              # corpus word count + vocab-sized merge loop
    "logreg_fit_full",         # per-iter residual pass + BLAS-partial gradient agg
    "covariance_full",         # single-pass d^2/2 moment aggregation
    "pq_encode_full",          # the durable PQ index's build-side encode scan
    "bpe_encode_full",         # tokenizer APPLY: explode + codegen replace chain
    "dedup_incremental_indexed",  # durable-index batch screen (r9): batch
                               # signatures + band equi-join + DPP verify;
                               # index build paid once per variant dir
    "dedup_spans_full",        # exact duplicated-span strip (r10): gram
                               # inventory + dup-gram agg + covered-
                               # position strip; per-replica character
                               # permutation keeps cross-replica grams
                               # distinct, so dup-span volume stays
                               # linear and growth measures the plan
    "dedup_spans_indexed",     # durable gram store probe (r10): batch
                               # gram work + equi-join vs stored hashes;
                               # store build paid once per variant dir —
                               # growth should track the probe, not the
                               # corpus tokenise pass the store replaces
    "dedup_spans_fixpoint_full",  # bounded-fixpoint strip (r11): up to 3
                               # strip passes with early exit; pass k's
                               # gram inventory is over the ALREADY-
                               # stripped corpus, so growth should track
                               # the single-pass row plus residual-sized
                               # extra passes
    "dedup_edit_distance",     # Ed-Join prefix-filtered levenshtein
                               # pairs (r11): explode+distinct+window
                               # gram pass, prefix self-join behind the
                               # length + char-histogram bands, banded
                               # verify — per-replica character rotation
                               # keeps cross-replica grams AND histograms
                               # apart, so candidates stay within-replica
                               # and growth measures the gram machinery
    "index_recovery_drill",    # torn-append recovery x5 stores (r10):
                               # staging is an absolute-constant batch
                               # (replica-0 ids only), recovery is one
                               # concurrent anti-join pass over store
                               # leaves — growth should track store I/O,
                               # never the corpus-CPU build row
]


def _ivf_full_corpus(spark, sf_dir):
    """IVF over the WHOLE corpus with trained bounded-k centroids. The
    catalog's similarity_topk_ivf pins vec_id < 2000 so its ORACLE cost
    stays constant across scale factors — sweeping it would time a
    constant-size plan behind a growing scan. This is the same operator
    on the full replica corpus (fixed k=32, so centroid count doesn't
    itself scale with volume the way the id-stride placeholder does)."""
    from dwp_hbase_to_mongo_export_spark.operators import clustering, similarity
    from dwp_hbase_to_mongo_export_spark.sources.parquet import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cents = clustering.kmeans_fit(emb, k=32, iters=1)
    cdf = clustering.centroids_df(spark, cents)
    return similarity.ivf_topk(emb, k=5, nprobe=2, max_query_id=10, centroids=cdf)


def _logreg_fit_full(spark, sf_dir):
    """Logistic-regression fit over the WHOLE corpus (the catalog's
    quality_classifier_* pin vec_id < 2000 for constant oracle cost):
    2 GD iterations, each one residual pass + one gradient agg — the
    sweep measures that iteration cost stays linear in corpus size."""
    from dwp_hbase_to_mongo_export_spark.operators import logreg
    from dwp_hbase_to_mongo_export_spark.sources.parquet import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "y", (F.col("label") < 5).cast("double")
    )
    w = logreg.fit_logreg(emb, "y", iters=2)
    return spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(w)], "dim int, w double"
    )


def _covariance_full(spark, sf_dir):
    """Full-corpus 64x64 covariance (catalog query bounds ids and dims
    for oracle cost): one mapInPandas moment pass + one agg."""
    from dwp_hbase_to_mongo_export_spark.operators import pca
    from dwp_hbase_to_mongo_export_spark.sources.parquet import load_table

    return pca.covariance(load_table(spark, sf_dir, "embeddings"))


def _pq_encode_full(spark, sf_dir):
    """PQ ENCODE over the WHOLE corpus — the 100 TB build-side scan the
    durable index pays exactly once (codebooks are fit on a constant
    id-bounded sample so the sweep isolates the encode pass: one
    Arrow-batched argmin kernel per batch, map-only). Returns a tiny
    aggregate so timing measures compute, not driver transfer."""
    from dwp_hbase_to_mongo_export_spark.operators import similarity
    from dwp_hbase_to_mongo_export_spark.sources.parquet import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    books = similarity.pq_train(
        emb.filter(F.col("vec_id") < 6000), m=4, k_codes=8, iters=1
    )
    codes = similarity.pq_encode(emb, books)
    return codes.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.element_at("codes", 1)).alias("s1"),
    )


def _bpe_encode_full(spark, sf_dir):
    """BPE tokenize the WHOLE corpus under a constant 6-rule merge
    table (fit on an id-bounded doc sample, so the sweep isolates the
    encode: one explode + chained codegen replaces + one agg — the
    tokenizer-apply pass a training pipeline runs at 100 TB; the FIT
    pass is bpe_merges' row)."""
    from dwp_hbase_to_mongo_export_spark.operators import bpe
    from dwp_hbase_to_mongo_export_spark.sources.parquet import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    wc = bpe.word_counts(docs.filter(F.col("doc_id") < 6000), top_v=500)
    merges = bpe.fit_bpe(wc, n_merges=6)
    enc = bpe.encode(docs.select("doc_id", "text"), merges)
    return enc.agg(F.count(F.lit(1)).alias("n"), F.sum("bpe_tokens").alias("s"))


# sweep entries not present in the catalog (or deliberately unbounded
# variants of bounded catalog queries)
def _snapshot_sink_export(spark, sf_dir):
    from dwp_hbase_to_mongo_export_spark.queries import BENCH_ONLY

    return BENCH_ONLY["snapshot_sink_export"](spark, sf_dir)


def _index_recovery_drill(spark, sf_dir):
    from dwp_hbase_to_mongo_export_spark.queries import BENCH_ONLY

    return BENCH_ONLY["index_recovery_drill"](spark, sf_dir)


def _dedup_spans_full(spark, sf_dir):
    """Duplicated-span STRIP over the whole corpus, reduced to a tiny
    checksum aggregate (the catalog query returns every cleaned doc —
    collecting 100x that would time driver transfer, not the plan)."""
    from dwp_hbase_to_mongo_export_spark.operators import spandedup
    from dwp_hbase_to_mongo_export_spark.sources.parquet import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    out = spandedup.strip_duplicate_spans(docs, "text", "doc_id", n=8, min_docs=2)
    return out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_removed").alias("removed"),
        F.sum(F.length("text_deduped")).alias("chars"),
    )


def _dedup_incremental_indexed_agg(spark, sf_dir):
    """The durable-index screen reduced to a checksum aggregate: at
    x100 the 26-class text rotation leaves ~4 replicas verbatim-equal
    (documented on _rotated_alphabet), so the true-pair OUTPUT is ~1M
    rows — collect() would time driver transfer of the pathological
    pair list, not the probe plan. The hash references every output
    column, so the full verify work still runs."""
    import bench

    from dwp_hbase_to_mongo_export_spark.queries import QUERIES

    return bench.bench_action(QUERIES["dedup_incremental_indexed"](spark, sf_dir))


def _dedup_spans_fixpoint_full(spark, sf_dir):
    """Bounded-fixpoint strip reduced to the same checksum aggregate as
    _dedup_spans_full (collecting the cleaned corpus would time driver
    transfer, not the passes)."""
    from dwp_hbase_to_mongo_export_spark.operators import spandedup
    from dwp_hbase_to_mongo_export_spark.sources.parquet import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    out = spandedup.strip_duplicate_spans_fixpoint(
        docs, "text", "doc_id", n=8, min_docs=2, max_passes=3
    )
    return out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_removed").alias("removed"),
        F.sum(F.length("text_deduped")).alias("chars"),
    )


SWEEP_OVERRIDES = {
    "snapshot_sink_export": _snapshot_sink_export,
    "dedup_spans_full": _dedup_spans_full,
    "dedup_spans_fixpoint_full": _dedup_spans_fixpoint_full,
    "dedup_incremental_indexed": _dedup_incremental_indexed_agg,
    "index_recovery_drill": _index_recovery_drill,
    "similarity_topk_ivf_full": _ivf_full_corpus,
    "logreg_fit_full": _logreg_fit_full,
    "covariance_full": _covariance_full,
    "pq_encode_full": _pq_encode_full,
    "bpe_encode_full": _bpe_encode_full,
}

BASE = "/root/testdata/sf0.1"
SMALL = "/root/testdata/sf0.01"

# Heading that begins the hand-maintained tail of SCALING.md; the
# generator preserves everything from this line onward.
MANUAL_MARKER = "## Memory-starvation spill drill"


def build_replica(n: int, root: str) -> str:
    """sf0.1 replicated n times: <root>/x<n>/<table>.parquet/ holds n
    symlinks to the single source file."""
    d = os.path.join(root, f"x{n}")
    for t in TABLES:
        src = os.path.join(BASE, f"{t}.parquet")
        tdir = os.path.join(d, f"{t}.parquet")
        os.makedirs(tdir, exist_ok=True)
        for i in range(n):
            link = os.path.join(tdir, f"part-{i:05d}.parquet")
            if not os.path.exists(link):
                os.symlink(src, link)
    return d


_ID_OFFSET = 1_000_000_000  # replica r shifts ids by r * this


def _replica_signs(r: int, dims: int = 64) -> list[float]:
    """Deterministic ±1 pattern per replica: sign-flipping embedding
    dimensions decorrelates replicas (E[cos] ~ 0 across replicas) while
    preserving each replica's internal similarity structure exactly.
    Replica 0 is the identity (all +1) so its vectors stay verbatim —
    the same identity-at-zero contract as _rotated_alphabet."""
    import hashlib

    if r == 0:
        return [1.0] * dims
    out = []
    for d in range(dims):
        h = hashlib.md5(f"sweep-sign:{r}:{d}".encode()).digest()[0]
        out.append(1.0 if h & 1 else -1.0)
    return out


def _rotated_alphabet(r: int) -> tuple[str, str]:
    """Per-replica character SUBSTITUTION permutation (md5-keyed sort of
    the alphabet, replica 0 = identity): a plain Caesar rotation has
    only 26 classes, so at x100 four replicas share a rotation and are
    verbatim-identical — their merged fingerprint dfs crossed the cap
    and silently DEFLATED the winnowing measurement. A full permutation
    per replica keeps all replicas content-distinct."""
    import hashlib

    lower = "abcdefghijklmnopqrstuvwxyz"
    digits = "0123456789"
    if r == 0:
        perm_l, perm_d = lower, digits
    else:
        key = lambda ch: hashlib.md5(f"sweep-perm:{r}:{ch}".encode()).hexdigest()  # noqa: E731
        perm_l = "".join(sorted(lower, key=key))
        perm_d = "".join(sorted(digits, key=key))
    return (
        lower + lower.upper() + digits,
        perm_l + perm_l.upper() + perm_d,
    )


def build_distinct_replica(spark, n: int, root: str) -> str:
    """n content-distinct copies of the embeddings/documents tables
    (ids shifted by replica; embeddings sign-decorrelated; text
    character-rotated per replica; replica 0 verbatim), materialised as
    parquet. Remaining tables are symlinked x1 — the distinct-sweep
    queries never read them."""
    from pyspark.sql import functions as F

    d = os.path.join(root, f"distinct_x{n}")
    # rebuild-skip keys on the writes' _SUCCESS markers, not directory
    # existence: Spark creates the output dir before the write commits,
    # so a crash mid-write would otherwise leave a partial replica that
    # later sweeps silently reuse, corrupting the growth numbers
    if all(
        os.path.exists(os.path.join(d, f"{t}.parquet", "_SUCCESS"))
        for t in ("embeddings", "documents")
    ):
        return d
    os.makedirs(d, exist_ok=True)
    for t in TABLES:
        if t in ("embeddings", "documents"):
            continue
        tdir = os.path.join(d, f"{t}.parquet")
        os.makedirs(tdir, exist_ok=True)
        link = os.path.join(tdir, "part-00000.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(BASE, f"{t}.parquet"), link)

    emb = spark.read.parquet(os.path.join(BASE, "embeddings.parquet"))
    parts = []
    for r in range(n):
        signs = F.array(*[F.lit(s) for s in _replica_signs(r)])
        parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(r * _ID_OFFSET)).alias("vec_id"),
                F.zip_with(
                    "embedding", signs, lambda x, s: (x * s).cast("float")
                ).alias("embedding"),
                "label",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(d, "embeddings.parquet")
    )

    docs = spark.read.parquet(os.path.join(BASE, "documents.parquet"))
    parts = []
    for r in range(n):
        src, tgt = _rotated_alphabet(r)
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(r * _ID_OFFSET)).alias("doc_id"),
                F.translate("text", src, tgt).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    return d


def time_query(spark, name: str, sf_dir: str, reps: int = 2) -> float:
    fn = SWEEP_OVERRIDES.get(name) or queries()[name]
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn(spark, sf_dir).collect()
        best = min(best, time.time() - t0)
    return best


def main() -> int:
    quick = "--quick" in sys.argv
    only = None
    if "--only" in sys.argv:
        # targeted re-measure of a few rows (substring match). PRINT
        # ONLY: SCALING.md is regenerated wholesale from a run's rows,
        # so a filtered run writing it would silently drop every other
        # query's row — splice targeted numbers in by hand.
        only = sys.argv[sys.argv.index("--only") + 1]
    factors = [10] if quick else [10, 100]
    sweep_qs = [q for q in SWEEP_QUERIES if only is None or only in q]
    dsweep_qs = [q for q in DISTINCT_SWEEP_QUERIES if only is None or only in q]
    root = tempfile.mkdtemp(prefix="scale_sweep_")
    variants = [("sf0.01", SMALL, 0.1), ("sf0.1", BASE, 1.0)]
    if sweep_qs:
        for n in factors:
            variants.append((f"sf0.1 x{n}", build_replica(n, root), float(n)))

    spark = get_spark(app_name="scale-sweep")
    rows = []
    for q in sweep_qs:
        times = []
        for label, d, _ in variants:
            times.append(time_query(spark, q, d))
            print(f"{q} @ {label}: {times[-1]:.2f}s", flush=True)
        rows.append((q, times))

    dvariants = [("sf0.01", SMALL, 0.1), ("sf0.1", BASE, 1.0)]
    if dsweep_qs:
        for n in factors:
            dvariants.append(
                (f"sf0.1 x{n}", build_distinct_replica(spark, n, root), float(n))
            )
    drows = []
    for q in dsweep_qs:
        times = []
        for label, d, _ in dvariants:
            times.append(time_query(spark, q, d))
            print(f"{q} @ {label} (distinct): {times[-1]:.2f}s", flush=True)
        drows.append((q, times))

    def table(rows_, variants_):
        out = [
            "| query | " + " | ".join(v[0] for v in variants_) + " | growth |",
            "|---|" + "---|" * (len(variants_) + 1),
        ]
        top = variants_[-1][2]
        for q, times in rows_:
            growth = (times[-1] / times[1]) / top if times[1] > 0 else 0.0
            out.append(
                f"| {q} | "
                + " | ".join(f"{t:.2f}s" for t in times)
                + f" | {growth:.2f} |"
            )
        return out

    lines = [
        "# Scale sweep (generated by tools/scale_sweep.py)",
        "",
        "sf0.1 replicated via symlinks; times are best-of-2 on "
        "local[32]. `growth` = (time at largest volume / time at "
        "sf0.1) / data factor — 1.0 is perfectly linear, below 1 means "
        "fixed overhead still amortising, above ~1.2 would be a scale "
        "smell. Replicated files share the OS page cache, so these "
        "measure CPU/shuffle scaling on warm storage, not cold IO.",
        "",
        *table(rows, variants),
        "",
        "## Clustering / search / near-dup families (distinct-content replicas)",
        "",
        "Verbatim row duplication would make every replica a true "
        "near-duplicate of its original, growing pair-emitting "
        "operators' OUTPUT quadratically in the factor — a property of "
        "pathological data, not the plan. These variants shift ids and "
        "decorrelate content per replica (embedding sign-flips, text "
        "character rotation), keeping true-pair counts linear so "
        "`growth` measures the plan.",
        "",
        *table(drows, dvariants),
    ]
    # Preserve the manually-authored drill sections (spill drill etc.):
    # everything from the first MANUAL_MARKER heading onward survives
    # regeneration verbatim.
    manual = ""
    try:
        with open("SCALING.md") as f:
            old = f.read()
        idx = old.find(MANUAL_MARKER)
        if idx >= 0:
            manual = "\n" + old[idx:].rstrip() + "\n"
    except OSError:
        pass
    if only is None:
        with open("SCALING.md", "w") as f:
            f.write("\n".join(lines) + "\n" + manual)
    print("\n".join(lines))
    shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
