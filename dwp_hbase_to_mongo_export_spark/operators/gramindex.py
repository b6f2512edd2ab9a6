"""Durable word-gram index for exact duplicated-span dedup — the fifth
durable store, completing the span family (operators/spandedup.py) with
the build / append / query / recover / compact / govern lifecycle the
signature index (dedupindex.py), BM25 index (textindex.py), and IVF/PQ
vector stores (similarity.py) already have.

Why it must exist at 100 TB: ``strip_spans_against_corpus`` pays a
full-corpus tokenise-and-hash pass per ingest batch (the corpus's gram
hashes are recomputed just to probe them). Persisting the DISTINCT gram
hashes once means each nightly batch pays only batch-sized gram work
plus an equi-join against the stored hashes — the same amortisation the
reference's incremental export mode gets from scanning only records
newer than the last run (src/main/kotlin/app/batch/HBaseReader.kt:
131-150), applied to sub-document text.

Artifact layout at ``path/``:

- ``grams/``  Hive-partitioned by ``bucket`` = (md5-prefix int of gh)
              pmod 64: rows (gh string), DISTINCT across the store —
              the append anti-joins its delta against the store so
              re-ingested grams are never double-written (and the
              purge set therefore equals exactly the inserted set).
              bucket is a pure function of gh, so any duplicate rows a
              contract violation could introduce are leaf-local —
              governance exploits that for exact sampled checks.
- ``meta/``   one row: n_docs, n_grams, n (gram size), fingerprint.
              Written LAST on first build (the commit record) and
              swap-rewritten on append. ``n_grams`` is exact (the
              store is distinct by construction); ``n_docs`` counts
              DOC INGESTS OBSERVED, not distinct corpus docs — the
              append contract allows a delta to overlap the corpus
              (only genuinely new grams are written), so re-ingesting
              a doc id increments it again. Consumers needing an exact
              distinct doc count must track it in the corpus table,
              not this sidecar.

Crash-safety is the shared store protocol (textindex.py primitives):
``_append-pending`` marker recording the pre-append meta scalars +
``_pending-ids`` purge record written before any store write; marker
removal is the commit record; ``_last-append`` batch-id sidecar makes
retries of a committed batch an explicit no-op; all mutations hold the
store's ``_append.lock`` flock; readers refuse marked artifacts.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .spandedup import (
    _cached_staged,
    _covered_starts,
    _dup_grams,
    _staged_grams,
    strip_covered,
)
from .textindex import (
    _batched_leaf_purge,
    _BUILD_PENDING,
    _LAST_APPEND,
    _PENDING,
    _UNKNOWN,
    _append_lock,
    _clear_stale_ids_record,
    _recover_swap,
    _recovered_leaves,
    _restore_last_append,
    _swap_write,
    _write_last_append,
    read_last_append,
)

N_GRAM_BUCKETS = 64
_PENDING_IDS = "_pending-ids"


def gram_bucket(gh) -> F.Column:
    """Static bucket of a gram hash: first 4 hex chars of the md5 as an
    int, pmod 64. A pure function of gh — equal grams always land in
    the same leaf."""
    return F.pmod(F.conv(F.substring(gh, 1, 4), 16, 10).cast("int"), F.lit(N_GRAM_BUCKETS))


def _check_markers(path: str) -> None:
    if os.path.exists(os.path.join(path, _BUILD_PENDING)):
        raise ValueError(
            f"{path}: a rebuild died mid-flight — grams/meta may mix "
            "two generations; rebuild the gram index from the corpus"
        )
    if os.path.exists(os.path.join(path, _PENDING)):
        raise ValueError(
            f"{path}: an append is pending or died mid-flight — gram "
            "rows may already be stored; run recover_gram_index_append "
            "and re-append the delta, or rebuild the index"
        )


def _gram_relation(
    docs: DataFrame, text_col: str, id_col: str, n: int, normalise: bool = False
) -> DataFrame:
    """(gh, bucket): the DISTINCT gram hashes of ``docs``."""
    g = (
        _staged_grams(docs, text_col, id_col, n, normalise=normalise)
        .select(F.explode(F.array_distinct("ghs")).alias("gh"))
        .distinct()
    )
    return g.withColumn("bucket", gram_bucket(F.col("gh")))


def _write_meta(
    spark: SparkSession,
    path: str,
    n_docs: int,
    n_grams: int,
    n: int,
    fingerprint: str,
    first: bool,
    normalise: bool = False,
) -> None:
    meta = spark.createDataFrame(
        [(n_docs, n_grams, n, fingerprint, bool(normalise))],
        "n_docs bigint, n_grams bigint, n int, fingerprint string, "
        "normalise boolean",
    )
    target = os.path.join(path, "meta")
    if first:
        meta.write.mode("overwrite").parquet(target)
    else:
        _swap_write(meta, target)


def _read_meta(spark: SparkSession, path: str):
    return spark.read.parquet(os.path.join(path, "meta")).head()


def _meta_normalise(meta) -> bool:
    """The store's matching policy. Pre-round-11 stores lack the meta
    column — they were built strict, so absent reads as False."""
    return bool(meta.asDict().get("normalise", False))


def build_gram_index(
    corpus: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    fingerprint: str | None = None,
    normalise: bool = False,
) -> None:
    """ONE corpus-scale tokenise/hash/distinct pass into the bucketed
    gram store. First-build commit record is meta-written-last; an
    in-place rebuild is bracketed by ``_build-pending`` (readers
    refuse), and holds the mutation lock like every append.

    ``normalise=True`` stores NORMALISED gram hashes (lower +
    punctuation strip, spandedup._norm_word) — the policy is stamped
    into meta, and appends/probes read it from there, so a caller can
    never mix strict and normalised hashes in one store."""
    os.makedirs(path, exist_ok=True)
    with _append_lock(path):
        _build_gram_index_locked(
            corpus, path, text_col, id_col, n, fingerprint, normalise
        )


def _build_gram_index_locked(
    corpus: DataFrame,
    path: str,
    text_col: str,
    id_col: str,
    n: int,
    fingerprint: str | None,
    normalise: bool = False,
) -> None:
    spark = corpus.sparkSession
    rebuild = os.path.isdir(os.path.join(path, "meta")) or os.path.isdir(
        os.path.join(path, "grams")
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
        # batch ids committed against the OLD artifact must not no-op
        # appends to the rebuilt one
        os.remove(last)
    grams = _gram_relation(corpus, text_col, id_col, n, normalise)
    grams.write.mode("overwrite").partitionBy("bucket").parquet(
        os.path.join(path, "grams")
    )
    n_grams = spark.read.parquet(os.path.join(path, "grams")).count()
    n_docs = corpus.select(id_col).distinct().count()
    _write_meta(
        spark,
        path,
        n_docs,
        n_grams,
        n,
        fingerprint or "",
        first=True,
        normalise=normalise,
    )
    if os.path.exists(build_marker):
        os.remove(build_marker)


def append_to_gram_index(
    delta: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    fingerprint: str | None = None,
    batch_id: str | None = None,
) -> dict:
    """Serialization shell; protocol on ``_append_to_gram_index_impl``."""
    with _append_lock(path):
        return _append_to_gram_index_impl(
            delta, path, text_col, id_col, fingerprint, batch_id
        )


def _append_to_gram_index_impl(
    delta: DataFrame,
    path: str,
    text_col: str,
    id_col: str,
    fingerprint: str | None,
    batch_id: str | None,
) -> dict:
    """Add an ACCEPTED batch's grams: delta-sized gram work, one
    anti-join against the store (only genuinely new hashes are
    written — so unlike the doc-keyed stores the delta may freely
    overlap the corpus; the store stays distinct by construction), new
    rows appended into their static buckets, meta merged by addition.
    Because overlap is allowed, the merged ``n_docs`` is "doc ingests
    observed" — re-ingesting the same doc ids adds them again
    (``n_grams`` stays exact; see the module docstring).

    Crash/retry protocol (the shared store discipline): pre-append meta
    scalars + the last-append slot go into the ``_append-pending``
    marker and the exact to-insert gh set into ``_pending-ids`` (with
    its _SUCCESS as the proof-of-record) BEFORE any store write; the
    inserted rows are then READ BACK from the ids record so the purge
    set provably equals the inserted set. Marker removal commits.
    ``batch_id`` gives exactly-once under ingest retries
    (textindex.read_last_append)."""
    spark = delta.sparkSession
    if os.path.exists(os.path.join(path, _BUILD_PENDING)):
        raise ValueError(
            f"{path}: a rebuild died mid-flight — rebuild the gram "
            "index before appending"
        )
    _recover_gram_index_append_impl(spark, path)
    if batch_id is not None and read_last_append(path) == batch_id:
        return {"committed": False, "skipped_duplicate_batch": True}
    if delta.isEmpty():
        if batch_id is not None:
            _write_last_append(path, batch_id)
        return {"committed": True, "skipped_duplicate_batch": False}
    _recover_swap(os.path.join(path, "meta"))
    old = _read_meta(spark, path)
    n = int(old["n"])
    normalise = _meta_normalise(old)
    store = spark.read.parquet(os.path.join(path, "grams")).select("gh")
    new_ghs = (
        _gram_relation(delta, text_col, id_col, n, normalise)
        .join(store, "gh", "left_anti")
        .select("gh", "bucket")
    )
    pending = os.path.join(path, _PENDING)
    with open(pending, "w", encoding="utf-8") as f:
        f.write(
            json.dumps(
                {
                    "protocol": 2,
                    "n_docs": int(old["n_docs"]),
                    "n_grams": int(old["n_grams"]),
                    "n": n,
                    "normalise": normalise,
                    "fingerprint": old["fingerprint"],
                    "last_append": read_last_append(path),
                }
            )
        )
    pids = os.path.join(path, _PENDING_IDS)
    new_ghs.write.mode("overwrite").parquet(pids)
    # read the ids record back as the insert set: one evaluation, and
    # the recorded purge set is exactly what lands in the store
    to_insert = spark.read.parquet(pids)
    to_insert.write.mode("append").partitionBy("bucket").parquet(
        os.path.join(path, "grams")
    )
    n_inserted = to_insert.count()
    n_batch_docs = delta.select(id_col).distinct().count()
    _write_meta(
        spark,
        path,
        int(old["n_docs"]) + n_batch_docs,
        int(old["n_grams"]) + n_inserted,
        n,
        fingerprint or str(old["fingerprint"]),
        first=False,
        normalise=normalise,
    )
    if batch_id is not None:
        _write_last_append(path, batch_id)
    # commit point: marker removal precedes the ids-record delete (a
    # marker-less stale ids dir is inert junk; the reverse order would
    # let recovery restore meta under committed gram rows)
    os.remove(pending)
    shutil.rmtree(pids)
    return {
        "committed": True,
        "skipped_duplicate_batch": False,
        "grams_inserted": int(n_inserted),
    }


def recover_gram_index_append(spark: SparkSession, path: str) -> dict:
    """Locked standalone recovery (see _recover_gram_index_append_impl)."""
    with _append_lock(path):
        return _recover_gram_index_append_impl(spark, path)


def _recover_gram_index_append_impl(spark: SparkSession, path: str) -> dict:
    """Return a torn-append store to its exact pre-append state: purge
    the recorded ``_pending-ids`` hashes from their bucket leaves
    (equal to the inserted set by construction), restore the recorded
    meta scalars and last-append slot. Protocol-2 marker without a
    committed ids record proves the store is untouched (the record
    precedes every store write); pre-v2 ambiguity raises."""
    pending = os.path.join(path, _PENDING)
    if not os.path.exists(pending):
        return _clear_stale_ids_record(path, _PENDING_IDS)
    with open(pending, encoding="utf-8") as f:
        raw = f.read()
    try:
        state = json.loads(raw)
        old = {
            "n_docs": int(state["n_docs"]),
            "n_grams": int(state["n_grams"]),
            "n": int(state["n"]),
            "normalise": bool(state.get("normalise", False)),
            "fingerprint": str(state.get("fingerprint") or ""),
        }
        protocol = int(state.get("protocol") or 1)
        old_last = state.get("last_append", _UNKNOWN)
    except (ValueError, TypeError, KeyError) as e:
        raise ValueError(
            f"{path}: pending-append marker is unreadable ({e!r}) — "
            "cannot be auto-recovered; rebuild the gram index"
        ) from None
    pids = os.path.join(path, _PENDING_IDS)
    if not os.path.exists(os.path.join(pids, "_SUCCESS")):
        if protocol < 2:
            raise ValueError(
                f"{path}: pending-append marker present but the "
                "_pending-ids record is missing or incomplete — "
                "ambiguous pre-protocol-2 state; rebuild the gram index"
            )
        if os.path.isdir(pids):
            shutil.rmtree(pids)
        _restore_last_append(path, old_last)
        os.remove(pending)
        return {"recovered": True, "leaves_purged": 0, "store_untouched": True}
    purge = spark.read.parquet(pids).select("gh")
    grams_dir = os.path.join(path, "grams")
    # ONE batched job purges every bucket leaf (the
    # textindex._batched_leaf_purge discipline — per-leaf jobs paid a
    # scheduling round-trip per bucket)
    leaves = _batched_leaf_purge(
        spark, grams_dir, "bucket=", purge, "gh", columns=["gh"]
    )
    _write_meta(
        spark,
        path,
        old["n_docs"],
        old["n_grams"],
        old["n"],
        old["fingerprint"],
        first=not os.path.isdir(os.path.join(path, "meta")),
        normalise=old["normalise"],
    )
    _restore_last_append(path, old_last)
    os.remove(pending)
    shutil.rmtree(pids)
    return {"recovered": True, "leaves_purged": len(leaves)}


def strip_spans_with_index(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
) -> DataFrame:
    """Indexed form of ``strip_spans_against_corpus``: the corpus pass
    is replaced by an equi-join of the batch's gram hashes against the
    stored distinct hashes, bit-identical to the index-free form over
    the same corpus (pinned in tests). Gram size AND matching policy
    (strict vs normalised) come from meta, so callers cannot probe with
    a mismatched n or hash a strict batch against a normalised store.

    Join strategy (round-11 advice): no forced broadcast — a
    production-sized nightly batch's distinct gram set can exceed the
    broadcast/driver limit, and a forced hint would then FAIL the probe
    rather than degrade. AQE sizes the batch side at runtime and
    converts the shuffle semi-join to a broadcast join itself whenever
    the gram set actually fits (the common case); above that it stays a
    shuffle semi-join on 16-byte hashes — the same AQE-decided
    discipline as the family's other joins."""
    _check_markers(path)
    meta = _read_meta(spark, path)
    n = int(meta["n"])
    normalise = _meta_normalise(meta)
    bstaged = _cached_staged(batch, text_col, id_col, n, normalise=normalise)
    bgset = bstaged.select(F.explode(F.array_distinct("ghs")).alias("gh"))
    store = spark.read.parquet(os.path.join(path, "grams")).select("gh")
    vs_store = store.join(bgset.distinct(), "gh", "left_semi").distinct()
    dup = vs_store.unionByName(_dup_grams(bstaged, id_col, min_docs)).distinct()
    hits = bstaged.select(
        F.col(id_col), F.posexplode("ghs").alias("start", "gh")
    ).join(dup, "gh", "left_semi")
    cov = _covered_starts(hits, n, id_col)
    return strip_covered(batch, cov, text_col, id_col)


def compact_gram_index(
    spark: SparkSession, path: str, target_bytes: int = 128 * 1024 * 1024
) -> dict:
    """Per-bucket small-file compaction after many appends (each append
    writes one file set per touched bucket); Hive layout preserved,
    crash-safe per-leaf swap via the shared compactor."""
    from ..sinks.compaction import compact_partitioned_dir

    return compact_partitioned_dir(
        spark, os.path.join(path, "grams"), target_bytes=target_bytes
    )


def gram_index_governance(
    spark: SparkSession,
    path: str,
    sample_buckets: int = 8,
    max_files_per_leaf: int = 8,
) -> dict:
    """Integrity + maintenance verdict. The store's contract is
    DISTINCT gh rows; because bucket is a pure function of gh, any
    duplicate is leaf-local — so a per-leaf count vs count_distinct
    over ``sample_buckets`` deterministic sample leaves is an EXACT
    duplicate check for the sampled share of the hash space (no
    cross-leaf case exists to miss). Fragmentation (when to compact)
    mirrors the other stores' round-10 verdict."""
    _check_markers(path)
    grams_dir = os.path.join(path, "grams")
    leaves = _recovered_leaves(grams_dir, "bucket=")
    sampled = leaves[: max(1, sample_buckets)]
    dup_leaves = []
    n_rows = n_distinct = 0
    for leaf in sampled:
        r = (
            spark.read.parquet(os.path.join(grams_dir, leaf))
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.count_distinct("gh").alias("uniq"),
            )
            .head()
        )
        n_rows += int(r["rows"])
        n_distinct += int(r["uniq"])
        if int(r["rows"]) != int(r["uniq"]):
            dup_leaves.append(leaf)
    healthy = not dup_leaves
    from ..sinks.compaction import fragmentation_report

    frag = fragmentation_report(grams_dir, max_files_per_leaf=max_files_per_leaf)
    return {
        "n_leaves_checked": len(sampled),
        "rows_checked": n_rows,
        "duplicate_leaves": dup_leaves,
        "healthy": healthy,
        "rebuild": not healthy,
        "fragmentation": frag,
        "compact": frag["compact"],
    }


def stored_fingerprint(spark: SparkSession, path: str) -> str | None:
    """Meta fingerprint, or None when absent/torn/unreadable — every
    case a fingerprint-gated consumer treats as 'rebuild'."""
    if os.path.exists(os.path.join(path, _PENDING)) or os.path.exists(
        os.path.join(path, _BUILD_PENDING)
    ):
        return None
    meta_dir = os.path.join(path, "meta")
    _recover_swap(meta_dir)
    if not os.path.isdir(meta_dir):
        return None
    try:
        return str(_read_meta(spark, path)["fingerprint"])
    except Exception:
        return None
