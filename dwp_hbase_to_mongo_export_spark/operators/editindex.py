"""Durable edit-distance screen index — the sixth durable store,
completing the edit-distance family (operators/editdist.py) with the
build / append / query / recover / compact / govern lifecycle the
signature index (dedupindex.py), BM25 index (textindex.py), gram store
(gramindex.py) and IVF/PQ vector stores (similarity.py) already have.

Why it must exist at 100 TB: ``edit_screen_batch`` recomputes the
corpus's q-grams, document frequencies, and rare-first prefixes on
every ingest just to probe them. Persisting each corpus document's
PREFIX rows once means a nightly batch pays only batch-sized gram work
plus an equi-join against the stored prefixes — the same amortisation
the reference's incremental export mode gets from scanning only
records newer than the last run (src/main/kotlin/app/batch/
HBaseReader.kt:131-150), applied to fuzzy matching.

The FROZEN-ORDER contract (what makes a durable prefix index sound):
the prefix-filter theorem requires ONE shared total order over grams
for both sides of a pair. Stored prefixes are selected under the
document-frequency order OF THE BUILD CORPUS, persisted in ``df/`` and
NEVER updated by appends — appended documents and probe batches rank
their grams by joining the frozen table (unseen grams read as df 0,
i.e. rarest). Any single total order is valid for the theorem, so
correctness never drifts; only PRUNING quality decays as the corpus
vocabulary drifts from the build snapshot, and a rebuild (or the
compaction verdict) refreshes it. This is the same freeze-vs-refresh
trade the IVF store makes with its centroids.

Artifact layout at ``path/``:

- ``df/``     the frozen gram order: (g, df) from the build corpus.
              Written at build only.
- ``prefix/`` Hive-partitioned by ``gbucket`` = pmod(xxhash64(g), 64):
              each document's EMIT rows — the q*k+1 rare-first prefix
              for long documents, the FULL distinct-gram set for short
              ones (<= q*k distinct grams) — as (g, id, len, hist).
              The candidate join probes it on (gbucket, g), so
              partition pruning keeps a small batch from scanning the
              whole gram space.
- ``docs/``   Hive-partitioned by ``bucket`` = pmod(xxhash64(id), 64):
              (id, text, len, hist, lbkt, is_short). Serves the
              DPP-pruned verify read (broadcast candidate list on
              (bucket, id) — the dedupindex sets/ discipline) and the
              short-pool length-bucket probe (lbkt = floor(len/(k+1))).
- ``meta/``   one row: n_docs, k, q, matching policy (normalise),
              fingerprint. Written LAST on
              first build (the commit record), swap-rewritten on
              append.

Append contract: delta ids are NEW (the doc-keyed contract of
dedupindex, NOT gramindex's overlap-tolerant one — prefix and doc rows
are per-document, so a re-appended id double-writes; governance
detects exactly that). Crash-safety is the shared store protocol
(textindex.py primitives): ``_append-pending`` marker + ``_pending-ids``
purge record (the delta's doc ids) written before any store write,
marker removal as the commit record, ``_last-append`` batch-id sidecar
for exactly-once under retries, all mutations under the store's
``_append.lock`` flock, readers refusing marked artifacts.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .editdist import _banded_distance, _hist_band, _prefix_emit, _staged
from .textindex import (
    _batched_leaf_purge,
    _BUILD_PENDING,
    _LAST_APPEND,
    _PENDING,
    _UNKNOWN,
    _append_lock,
    _clear_stale_ids_record,
    _recover_swap,
    _restore_last_append,
    _swap_write,
    _write_last_append,
    read_last_append,
)

N_GRAM_BUCKETS = 64
N_DOC_BUCKETS = 64
_PENDING_IDS = "_pending-ids"


def _gbucket(g) -> F.Column:
    """Static bucket of a gram: pure function of g, so equal grams
    always land in the same prefix/ leaf."""
    return F.pmod(F.xxhash64(g), F.lit(N_GRAM_BUCKETS)).cast("int")


def _dbucket(i) -> F.Column:
    return F.pmod(F.xxhash64(i), F.lit(N_DOC_BUCKETS)).cast("int")


def _check_markers(path: str) -> None:
    if os.path.exists(os.path.join(path, _BUILD_PENDING)):
        raise ValueError(
            f"{path}: a rebuild died mid-flight — prefix/docs/meta may "
            "mix two generations; rebuild the edit index from the corpus"
        )
    if os.path.exists(os.path.join(path, _PENDING)):
        raise ValueError(
            f"{path}: an append is pending or died mid-flight — rows may "
            "already be stored; run recover_edit_index_append and "
            "re-append the delta, or rebuild the index"
        )


def _emit_rows(
    docs: DataFrame,
    frozen_df: DataFrame,
    k: int,
    q: int,
    normalise: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """(emit, doc_rows) for ``docs`` under the FROZEN gram order.

    emit:     (g, id, len, hist) — prefix rows for long docs, full
              distinct-gram set for short ones (editdist.py semantics).
    doc_rows: (id, text, len, hist, lbkt, is_short) — verify + short
              pool attributes; ``text`` is the MATCHING form (normalised
              when the store's policy says so), which is exactly what
              the verify distance must run over.
    """
    staged = _staged(docs, "text", "doc_id", normalise=normalise, q=q)
    emit = (
        _prefix_emit(staged, q, k, frozen_df=frozen_df)
        .join(staged.select("_id", "_len", "_hist"), "_id")
        .select(
            "g",
            F.col("_id").alias("id"),
            F.col("_len").alias("len"),
            F.col("_hist").alias("hist"),
        )
    )
    doc_rows = staged.select(
        F.col("_id").alias("id"),
        F.col("_t").alias("text"),
        F.col("_len").alias("len"),
        F.col("_hist").alias("hist"),
        F.floor(F.col("_len") / (k + 1)).cast("int").alias("lbkt"),
        (F.size("_grams") <= q * k).alias("is_short"),
    )
    return emit, doc_rows


def _write_meta(
    spark: SparkSession,
    path: str,
    n_docs: int,
    k: int,
    q: int,
    fingerprint: str,
    first: bool,
    normalise: bool = False,
) -> None:
    meta = spark.createDataFrame(
        [(n_docs, k, q, fingerprint, bool(normalise))],
        "n_docs bigint, k int, q int, fingerprint string, normalise boolean",
    )
    target = os.path.join(path, "meta")
    if first:
        meta.write.mode("overwrite").parquet(target)
    else:
        _swap_write(meta, target)


def _read_meta(spark: SparkSession, path: str):
    return spark.read.parquet(os.path.join(path, "meta")).head()


def _meta_normalise(meta) -> bool:
    """The store's matching policy; absent (pre-policy store) reads as
    strict — the gramindex discipline."""
    return bool(meta.asDict().get("normalise", False))


def build_edit_index(
    corpus: DataFrame,
    path: str,
    k: int = 8,
    q: int = 4,
    fingerprint: str | None = None,
    normalise: bool = False,
) -> None:
    """ONE corpus-scale gram/df/prefix pass into the bucketed store.
    First-build commit record is meta-written-last; an in-place rebuild
    is bracketed by ``_build-pending`` (readers refuse) and holds the
    mutation lock like every append. ``k`` and ``q`` are stamped into
    meta — probes read them from there, so a caller can never probe
    with mismatched parameters; so is the matching policy
    (``normalise`` — editdist._staged's dial), so strict and
    normalised data can never mix in one store."""
    os.makedirs(path, exist_ok=True)
    with _append_lock(path):
        _build_edit_index_locked(corpus, path, k, q, fingerprint, normalise)


def _build_edit_index_locked(
    corpus: DataFrame,
    path: str,
    k: int,
    q: int,
    fingerprint: str | None,
    normalise: bool = False,
) -> None:
    spark = corpus.sparkSession
    rebuild = any(
        os.path.isdir(os.path.join(path, d)) for d in ("meta", "prefix", "docs")
    )
    build_marker = os.path.join(path, _BUILD_PENDING)
    if rebuild:
        with open(build_marker, "w", encoding="utf-8") as f:
            f.write(fingerprint or "")
    pending = os.path.join(path, _PENDING)
    if os.path.exists(pending):
        os.remove(pending)  # full rebuild supersedes any torn append
    pids = os.path.join(path, _PENDING_IDS)
    if os.path.isdir(pids):
        shutil.rmtree(pids)
    last = os.path.join(path, _LAST_APPEND)
    if os.path.exists(last):
        os.remove(last)
    staged = _staged(corpus, "text", "doc_id", normalise=normalise, q=q)
    grams = staged.select("_id", F.explode("_grams").alias("g"))
    dfreq = grams.groupBy("g").agg(F.count(F.lit(1)).alias("_df"))
    dfreq.write.mode("overwrite").parquet(os.path.join(path, "df"))
    frozen = spark.read.parquet(os.path.join(path, "df"))
    emit, doc_rows = _emit_rows(corpus, frozen, k, q, normalise=normalise)
    emit.withColumn("gbucket", _gbucket(F.col("g"))).write.mode(
        "overwrite"
    ).partitionBy("gbucket").parquet(os.path.join(path, "prefix"))
    doc_rows.withColumn("bucket", _dbucket(F.col("id"))).write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(os.path.join(path, "docs"))
    n_docs = spark.read.parquet(os.path.join(path, "docs")).count()
    _write_meta(
        spark,
        path,
        n_docs,
        k,
        q,
        fingerprint or "",
        first=True,
        normalise=normalise,
    )
    if os.path.exists(build_marker):
        os.remove(build_marker)


def append_to_edit_index(
    delta: DataFrame,
    path: str,
    fingerprint: str | None = None,
    batch_id: str | None = None,
) -> dict:
    """Serialization shell; protocol on ``_append_to_edit_index_impl``."""
    with _append_lock(path):
        return _append_to_edit_index_impl(delta, path, fingerprint, batch_id)


def _append_to_edit_index_impl(
    delta: DataFrame,
    path: str,
    fingerprint: str | None,
    batch_id: str | None,
) -> dict:
    """Add an ACCEPTED batch (ids NEW): delta-sized gram work under the
    FROZEN order, prefix and doc rows appended into their static
    buckets, meta n_docs merged by addition. ``df/`` is deliberately
    NOT updated (module docstring — the order freeze IS the
    correctness contract).

    Crash/retry protocol: pre-append meta scalars + the last-append
    slot go into the ``_append-pending`` marker and the delta's doc ids
    into ``_pending-ids`` (its _SUCCESS is the proof-of-record) BEFORE
    any store write. Marker removal commits. ``batch_id`` gives
    exactly-once under ingest retries."""
    spark = delta.sparkSession
    if os.path.exists(os.path.join(path, _BUILD_PENDING)):
        raise ValueError(
            f"{path}: a rebuild died mid-flight — rebuild the edit "
            "index before appending"
        )
    _recover_edit_index_append_impl(spark, path)
    if batch_id is not None and read_last_append(path) == batch_id:
        return {"committed": False, "skipped_duplicate_batch": True}
    if delta.isEmpty():
        if batch_id is not None:
            _write_last_append(path, batch_id)
        return {"committed": True, "skipped_duplicate_batch": False}
    _recover_swap(os.path.join(path, "meta"))
    old = _read_meta(spark, path)
    k, q = int(old["k"]), int(old["q"])
    normalise = _meta_normalise(old)
    pending = os.path.join(path, _PENDING)
    with open(pending, "w", encoding="utf-8") as f:
        f.write(
            json.dumps(
                {
                    "protocol": 2,
                    "n_docs": int(old["n_docs"]),
                    "k": k,
                    "q": q,
                    "normalise": normalise,
                    "fingerprint": old["fingerprint"],
                    "last_append": read_last_append(path),
                }
            )
        )
    pids = os.path.join(path, _PENDING_IDS)
    delta.select(F.col("doc_id").alias("id")).distinct().write.mode(
        "overwrite"
    ).parquet(pids)
    frozen = spark.read.parquet(os.path.join(path, "df"))
    emit, doc_rows = _emit_rows(delta, frozen, k, q, normalise=normalise)
    emit.withColumn("gbucket", _gbucket(F.col("g"))).write.mode(
        "append"
    ).partitionBy("gbucket").parquet(os.path.join(path, "prefix"))
    doc_rows.withColumn("bucket", _dbucket(F.col("id"))).write.mode(
        "append"
    ).partitionBy("bucket").parquet(os.path.join(path, "docs"))
    n_batch = spark.read.parquet(pids).count()
    _write_meta(
        spark,
        path,
        int(old["n_docs"]) + n_batch,
        k,
        q,
        fingerprint or str(old["fingerprint"]),
        first=False,
        normalise=normalise,
    )
    if batch_id is not None:
        _write_last_append(path, batch_id)
    # commit point: marker removal precedes the ids-record delete (a
    # marker-less stale ids dir is inert junk; the reverse order would
    # let recovery restore meta under committed rows)
    os.remove(pending)
    shutil.rmtree(pids)
    return {
        "committed": True,
        "skipped_duplicate_batch": False,
        "docs_appended": int(n_batch),
    }


def recover_edit_index_append(spark: SparkSession, path: str) -> dict:
    """Locked standalone recovery (see _recover_edit_index_append_impl)."""
    with _append_lock(path):
        return _recover_edit_index_append_impl(spark, path)


def _recover_edit_index_append_impl(spark: SparkSession, path: str) -> dict:
    """Return a torn-append store to its exact pre-append state: purge
    the recorded delta doc ids from both partitioned stores' leaves,
    restore the recorded meta scalars and last-append slot. Protocol-2
    marker without a committed ids record proves the store is untouched
    (the record precedes every store write)."""
    pending = os.path.join(path, _PENDING)
    if not os.path.exists(pending):
        return _clear_stale_ids_record(path, _PENDING_IDS)
    with open(pending, encoding="utf-8") as f:
        raw = f.read()
    try:
        state = json.loads(raw)
        old = {
            "n_docs": int(state["n_docs"]),
            "k": int(state["k"]),
            "q": int(state["q"]),
            "normalise": bool(state.get("normalise", False)),
            "fingerprint": str(state.get("fingerprint") or ""),
        }
        protocol = int(state.get("protocol") or 1)
        old_last = state.get("last_append", _UNKNOWN)
    except (ValueError, TypeError, KeyError) as e:
        raise ValueError(
            f"{path}: pending-append marker is unreadable ({e!r}) — "
            "cannot be auto-recovered; rebuild the edit index"
        ) from None
    pids = os.path.join(path, _PENDING_IDS)
    if not os.path.exists(os.path.join(pids, "_SUCCESS")):
        if protocol < 2:
            raise ValueError(
                f"{path}: pending-append marker present but the "
                "_pending-ids record is missing or incomplete — "
                "ambiguous pre-protocol-2 state; rebuild the edit index"
            )
        if os.path.isdir(pids):
            shutil.rmtree(pids)
        _restore_last_append(path, old_last)
        os.remove(pending)
        return {"recovered": True, "leaves_purged": 0, "store_untouched": True}
    purge = spark.read.parquet(pids).select("id")
    leaves_purged = 0
    # ONE batched job per relation (the textindex._batched_leaf_purge
    # discipline — per-leaf jobs paid a scheduling round-trip each)
    for store, part in (("prefix", "gbucket="), ("docs", "bucket=")):
        sdir = os.path.join(path, store)
        leaves_purged += len(
            _batched_leaf_purge(spark, sdir, part, purge, "id")
        )
    _write_meta(
        spark,
        path,
        old["n_docs"],
        old["k"],
        old["q"],
        old["fingerprint"],
        first=not os.path.isdir(os.path.join(path, "meta")),
        normalise=old["normalise"],
    )
    _restore_last_append(path, old_last)
    os.remove(pending)
    shutil.rmtree(pids)
    return {"recovered": True, "leaves_purged": leaves_purged}


def query_edit_index(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Indexed form of ``edit_screen_batch``: (batch_id, dup_of, dist)
    for every batch-vs-corpus pair within the store's distance k — the
    SAME result set as the index-free screen over the same corpus (both
    are exact; candidate sets differ, verified answers cannot), so the
    two share one oracle.

    k and q come from meta; the batch ranks its grams under the FROZEN
    ``df/`` order (unseen grams read as df 0), joins the stored prefix
    rows on (gbucket, g) — partition pruning limits the read to the
    batch's gram buckets — and short batch docs probe the stored
    length buckets. Verification reads candidate corpus texts from the
    id-bucketed docs/ store behind a broadcast candidate list, the
    dedupindex sets/ DPP discipline."""
    _check_markers(path)
    meta = _read_meta(spark, path)
    k, q = int(meta["k"]), int(meta["q"])
    normalise = _meta_normalise(meta)
    frozen = spark.read.parquet(os.path.join(path, "df"))

    from ._cache import swap_cache

    bemit, bdocs = _emit_rows(
        batch.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        ),
        frozen,
        k,
        q,
        normalise=normalise,
    )
    bemit = swap_cache("editindex.bemit", bemit)

    band_pred = (F.abs(F.col("_len_a") - F.col("_len_b")) <= k) & _hist_band(
        "_hist_a", "_hist_b", k
    )
    # the probe side recomputes gbucket (a pure function of g) so the
    # equi-join includes the store's PARTITION column — that is what
    # lets dynamic partition pruning limit the prefix/ read to the
    # batch's gram buckets
    pa = bemit.select(
        F.col("id").alias("id_a"),
        "g",
        _gbucket(F.col("g")).alias("gbucket"),
        F.col("len").alias("_len_a"),
        F.col("hist").alias("_hist_a"),
    )
    store_prefix = spark.read.parquet(os.path.join(path, "prefix"))
    pb = store_prefix.select(
        F.col("id").alias("id_b"),
        "g",
        "gbucket",
        F.col("len").alias("_len_b"),
        F.col("hist").alias("_hist_b"),
    )
    cand_gram = (
        pa.join(pb, ["gbucket", "g"]).filter(band_pred).select("id_a", "id_b")
    )

    store_docs = spark.read.parquet(os.path.join(path, "docs"))
    sh_a = bdocs.filter(F.col("is_short")).select(
        F.col("id").alias("id_a"),
        F.col("len").alias("_len_a"),
        F.col("hist").alias("_hist_a"),
        F.explode(
            F.array(
                F.col("lbkt") - 1, F.col("lbkt"), F.col("lbkt") + 1
            )
        ).alias("lbkt"),
    )
    sh_b = store_docs.filter(F.col("is_short")).select(
        F.col("id").alias("id_b"),
        F.col("len").alias("_len_b"),
        F.col("hist").alias("_hist_b"),
        "lbkt",
    )
    cand_short = sh_a.join(sh_b, "lbkt").filter(band_pred).select("id_a", "id_b")

    cand = cand_gram.unionByName(cand_short).distinct()

    # DPP-pruned verify read: broadcast the candidate (bucket, id) list
    # against the id-bucketed docs store
    probe = cand.select(
        F.col("id_b").alias("id"), _dbucket(F.col("id_b")).alias("bucket")
    ).distinct()
    corpus_texts = store_docs.join(
        F.broadcast(probe), ["bucket", "id"], "left_semi"
    ).select(F.col("id").alias("id_b"), F.col("text").alias("_tb"))
    # the verify distance runs over the MATCHING form on both sides:
    # docs/ stores the policy-applied text, so the batch side stages
    # under the same policy
    batch_texts = _staged(batch, text_col, id_col, normalise=normalise).select(
        F.col("_id").alias("id_a"), F.col("_t").alias("_ta")
    )
    return (
        cand.join(batch_texts, "id_a")
        .join(corpus_texts, "id_b")
        .withColumn("dist", _banded_distance(F.col("_ta"), F.col("_tb"), k))
        .filter(F.col("dist").isNotNull())
        .select(
            F.col("id_a").alias(id_col),
            F.col("id_b").alias("dup_of"),
            F.col("dist").cast("int").alias("dist"),
        )
    )


def compact_edit_index(
    spark: SparkSession, path: str, target_bytes: int = 128 * 1024 * 1024
) -> dict:
    """Per-bucket small-file compaction of both partitioned stores
    after many appends; Hive layout preserved, crash-safe per-leaf swap
    via the shared compactor."""
    from ..sinks.compaction import compact_partitioned_dir

    out = {}
    for store in ("prefix", "docs"):
        out[store] = compact_partitioned_dir(
            spark, os.path.join(path, store), target_bytes=target_bytes
        )
    return out


def stored_fingerprint(spark: SparkSession, path: str) -> str | None:
    """Fingerprint stamped into meta, or None for a missing/unreadable
    artifact (callers rebuild on mismatch — the indexcache contract)."""
    try:
        _check_markers(path)
        return str(_read_meta(spark, path)["fingerprint"])
    except Exception:
        return None


def edit_index_governance(
    spark: SparkSession,
    path: str,
    sample_buckets: int = 8,
) -> dict:
    """Integrity + maintenance verdict. The doc store's contract is one
    row per id; because bucket is a pure function of id, any duplicate
    from a violated ids-NEW append contract is leaf-local — a per-leaf
    count vs count_distinct over a deterministic sample of buckets is
    an EXACT duplicate check for the sampled share of the id space.
    Also reports ORDER DRIFT — the fraction of stored prefix grams
    absent from the frozen df/ table (grams contributed by appended
    docs that the build corpus never saw): high drift means the frozen
    order is pruning poorly for recent data and a rebuild would help —
    and the fragmentation verdicts for both partitioned stores."""
    _check_markers(path)
    from ..sinks.compaction import fragmentation_report

    dup_rows = 0
    sampled = list(range(0, N_DOC_BUCKETS, max(1, N_DOC_BUCKETS // sample_buckets)))[
        :sample_buckets
    ]
    for b in sampled:
        leaf = os.path.join(path, "docs", f"bucket={b}")
        if not os.path.isdir(leaf):
            continue
        r = (
            spark.read.parquet(leaf)
            .agg(
                (F.count(F.lit(1)) - F.countDistinct("id")).alias("dups")
            )
            .head()
        )
        dup_rows += int(r["dups"])
    frozen = spark.read.parquet(os.path.join(path, "df")).select("g")
    prefix = spark.read.parquet(os.path.join(path, "prefix")).select("g")
    n_prefix = prefix.count()
    n_drift = prefix.join(frozen, "g", "left_anti").count()
    frag = {
        store: fragmentation_report(os.path.join(path, store))
        for store in ("prefix", "docs")
    }
    return {
        "duplicate_doc_rows_sampled": int(dup_rows),
        "sampled_buckets": sampled,
        "prefix_rows": int(n_prefix),
        "order_drift_rows": int(n_drift),
        "order_drift_fraction": (n_drift / n_prefix) if n_prefix else 0.0,
        "fragmentation": frag,
        "compact": any(f["compact"] for f in frag.values()),
    }
