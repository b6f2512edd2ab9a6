"""Durable MinHash-LSH dedup signature index — build / append / query /
compact / govern, the same artifact lifecycle the IVF vector store
(operators/similarity.py) and the BM25 text index (operators/
textindex.py) already have, applied to the near-dup family.

Why it must exist at 100 TB: the one-shot ``minhash_lsh_dedup`` pays a
full-corpus signature pass per invocation. A production corpus ingests
daily; what it needs is the signatures of the EXISTING corpus persisted
once, so each nightly batch pays only batch-sized Python (its own
shingle/minhash work) and joins against the stored band keys — the
dedup analogue of the reference's incremental export mode, which scans
only records newer than the last run behind a fixed artifact
(src/main/kotlin/app/batch/HBaseReader.kt:131-150).

Artifact layout at ``path/``:

- ``bands/``    Hive-partitioned by ``band`` (n_bands leaves):
                (band_key string, doc id). Each append writes only into
                the band directories, rows sorted by id within each
                write so parquet min-max stats make id-filtered
                governance scans cheap.
- ``sets/``     Hive-partitioned by ``bucket`` = pmod(xxhash64(id), 64):
                (id, hs array<bigint>). The verify join probes it with a
                broadcast candidate list on (bucket, id), so dynamic
                partition pruning keeps a query from scanning the
                corpus-sized set store (the IVF posting-store
                discipline, pinned in tests/test_plans.py).
- ``meta/``     one row: n_docs, the signature parameters (n_perm,
                rows_per_band, k, max_chars) and the source-content
                fingerprint. Written LAST on build — it is the commit
                record — and swap-rewritten on append.

Signature values are produced by the SAME kernel as the one-shot path
(``dedup.minhash_sets_and_sigs``: md5-prefix shingle hash, (a*h+b) mod M
minima) and band keys by the same concat shape, so query results are
bit-identical to running ``minhash_lsh_dedup`` over old ∪ batch and the
existing DuckDB oracle arithmetic carries over unchanged.

Append contract: delta ids are NEW. A re-appended id double-writes its
set/band rows; ``dedup_index_governance`` detects exactly that (plus
signature/band drift) from bounded samples, mirroring
``textindex.text_index_governance``.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import minhash_sets_and_sigs
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

N_SET_BUCKETS = 64
_PENDING_IDS = "_pending-ids"


def _check_markers(path: str) -> None:
    """Reader-side refusal for a marked artifact, advising the action
    that is actually SAFE per marker (a crashed append may already have
    landed band/set rows, so 'retry the append' without recovery would
    double-write them — round-8 advice, shared with textindex)."""
    if os.path.exists(os.path.join(path, _BUILD_PENDING)):
        raise ValueError(
            f"{path}: a rebuild died mid-flight — bands/sets/meta may "
            "mix two generations; rebuild the index from the corpus"
        )
    if os.path.exists(os.path.join(path, _PENDING)):
        raise ValueError(
            f"{path}: an append is pending or died mid-flight — the "
            "band and set relations may disagree (delta rows may "
            "already be stored); run recover_dedup_index_append and "
            "re-append the delta, or rebuild the index"
        )


def _bucket_of(id_col: str):
    return F.pmod(F.xxhash64(F.col(id_col)), F.lit(N_SET_BUCKETS)).cast("int")


def band_rows(
    mh: DataFrame, id_col: str, n_perm: int, rows_per_band: int
) -> DataFrame:
    """(id, band, band_key) from the (id, sigs) frame — the exact
    band-key shape minhash_lsh_dedup builds inline (comma-joined
    signature decimals per band), factored so the stored and the
    query-time band keys come from one expression."""
    n_bands = n_perm // rows_per_band
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    ",",
                    *[
                        F.element_at("sigs", i + 1).cast("string")
                        for i in range(b * rows_per_band, (b + 1) * rows_per_band)
                    ],
                ).alias("band_key"),
            )
            for b in range(n_bands)
        ]
    )
    return mh.select(id_col, F.explode(band_structs).alias("bb")).select(
        id_col, "bb.band", "bb.band_key"
    )


def _sig_relations(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    n_perm: int,
    rows_per_band: int,
    k: int,
    max_chars: int,
) -> tuple[DataFrame, DataFrame]:
    """(bands, sets) relations for one corpus/delta: one Arrow pass
    produces (id, hs, sigs); bands explode map-side from sigs; sets are
    the hs arrays with their storage bucket. Sorting within the band
    partitions keeps per-id governance scans skippable via row-group
    min-max."""
    mh = minhash_sets_and_sigs(
        docs, text_col, id_col, n_perm=n_perm, k=k, max_chars=max_chars
    )
    # NO repartition("band"): that would collapse the build to n_bands
    # tasks (8) — a 100 TB anti-pattern. Every task writes one sorted
    # file per band leaf instead (id-ordered for min-max skipping);
    # the resulting file count is what compact_dedup_index is for.
    bands = band_rows(mh, id_col, n_perm, rows_per_band).sortWithinPartitions(
        id_col
    )
    sets = mh.select(id_col, "hs").withColumn("bucket", _bucket_of(id_col))
    return bands, sets


def build_dedup_index(
    corpus: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = 16,
    rows_per_band: int = 2,
    k: int = 5,
    max_chars: int = 256,
    fingerprint: str | None = None,
) -> None:
    """ONE corpus-scale signature pass to the two artifact relations.
    The only shuffles are the by-band repartition of the band rows and
    the parquet write of the bucketed sets — no joins, no aggregation:
    signature state is per-document. meta (params + id_col +
    fingerprint + n_docs) is written LAST as the commit record; a
    crashed FIRST build leaves no meta and consumers treat the artifact
    as absent. An in-place REBUILD over an existing artifact cannot
    rely on that (old meta stays readable while bands→sets→meta
    overwrites land), so it is bracketed by a ``_build-pending`` marker
    every reader refuses (round-8 advice, shared with textindex)."""
    os.makedirs(path, exist_ok=True)
    # rebuilds are mutations like appends: hold the store's exclusive
    # lock so a rebuild never interleaves with a live append's writes
    with _append_lock(path):
        return _build_dedup_index_locked(
            corpus, path, text_col, id_col, n_perm, rows_per_band, k,
            max_chars, fingerprint,
        )


def _build_dedup_index_locked(
    corpus: DataFrame,
    path: str,
    text_col: str,
    id_col: str,
    n_perm: int,
    rows_per_band: int,
    k: int,
    max_chars: int,
    fingerprint: str | None,
) -> None:
    rebuild_over_existing = os.path.isdir(
        os.path.join(path, "meta")
    ) or os.path.isdir(os.path.join(path, "bands"))
    build_marker = os.path.join(path, _BUILD_PENDING)
    if rebuild_over_existing:
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
    bands, sets = _sig_relations(
        corpus, text_col, id_col, n_perm, rows_per_band, k, max_chars
    )
    bands.write.mode("overwrite").partitionBy("band").parquet(
        os.path.join(path, "bands")
    )
    sets.write.mode("overwrite").partitionBy("bucket").parquet(
        os.path.join(path, "sets")
    )
    spark = corpus.sparkSession
    n_docs = spark.read.parquet(os.path.join(path, "sets")).count()
    meta = spark.createDataFrame(
        [(n_docs, n_perm, rows_per_band, k, max_chars, id_col, fingerprint or "")],
        "n_docs bigint, n_perm int, rows_per_band int, k int, "
        "max_chars int, id_col string, fingerprint string",
    )
    meta.write.mode("overwrite").parquet(os.path.join(path, "meta"))
    if os.path.exists(build_marker):
        os.remove(build_marker)


def _read_meta(spark: SparkSession, path: str):
    meta_dir = os.path.join(path, "meta")
    _recover_swap(meta_dir)
    return spark.read.parquet(meta_dir).head()


def append_to_dedup_index(
    delta: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    fingerprint: str | None = None,
    batch_id: str | None = None,
) -> dict:
    """Serialization shell — mutators hold the store's exclusive
    ``_append.lock`` (textindex._append_lock) so concurrent appends
    queue instead of purging each other's in-flight rows; the protocol
    itself is documented on ``_append_to_dedup_index_impl``."""
    with _append_lock(path):
        return _append_to_dedup_index_impl(
            delta, path, text_col, id_col, fingerprint, batch_id
        )


def _append_to_dedup_index_impl(
    delta: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    fingerprint: str | None = None,
    batch_id: str | None = None,
) -> dict:
    """Incrementally index NEW documents: delta-sized signature work,
    band/set rows appended into the same partition layout, n_docs
    refreshed by addition (never a corpus re-scan). Signature
    parameters come from the stored meta, so an append can never mix
    permutation constants with the build's. For disjoint id sets the
    merged artifact is row-identical to a full rebuild over old ∪ delta
    (pinned in tests/test_extensions.py). Crash-safety: the
    ``_append-pending`` marker brackets the append and query/governance
    refuse a marked index; the meta rewrite goes through the staged
    swap.

    RETRY protocol (round-8 advice — a crashed append may already have
    landed band/set rows, so blind re-append would double-write them):
    the marker records the pre-append (n_docs, fingerprint) and
    ``_pending-ids`` records the delta's ids BEFORE any store write;
    entry-time ``recover_dedup_index_append`` (called here
    automatically) purges those ids and restores the recorded meta,
    returning the artifact to its exact pre-append state — after which
    this append (including a re-run of a crashed one) is safe."""
    spark = delta.sparkSession
    if os.path.exists(os.path.join(path, _BUILD_PENDING)):
        raise ValueError(
            f"{path}: a rebuild died mid-flight — rebuild the index "
            "before appending"
        )
    _recover_dedup_index_append_impl(spark, path)
    # Idempotence gate (round-10, see textindex.read_last_append): a
    # retry of an already-committed batch id no-ops instead of
    # double-writing band/set rows.
    if batch_id is not None and read_last_append(path) == batch_id:
        return {"committed": False, "skipped_duplicate_batch": True}
    if delta.isEmpty():
        # empty micro-batches would only fragment the store; still
        # consume the batch id (atomic sidecar write)
        if batch_id is not None:
            _write_last_append(path, batch_id)
        return {"committed": True, "skipped_duplicate_batch": False}
    m = _read_meta(spark, path)
    stored_id_col = m.asDict().get("id_col")
    if stored_id_col and stored_id_col != id_col:
        raise ValueError(
            f"{path}: index was built with id_col={stored_id_col!r}; "
            f"append called with id_col={id_col!r} — mixed id columns "
            "would corrupt the band/set relations"
        )
    pending = os.path.join(path, _PENDING)
    with open(pending, "w", encoding="utf-8") as f:
        f.write(
            json.dumps(
                {
                    "protocol": 2,
                    "n_docs": int(m["n_docs"]),
                    "fingerprint": m["fingerprint"],
                    "last_append": read_last_append(path),
                }
            )
        )
    delta.select(F.col(id_col).alias("id")).distinct().write.mode(
        "overwrite"
    ).parquet(os.path.join(path, _PENDING_IDS))
    bands, sets = _sig_relations(
        delta,
        text_col,
        id_col,
        m["n_perm"],
        m["rows_per_band"],
        m["k"],
        m["max_chars"],
    )
    bands.write.mode("append").partitionBy("band").parquet(
        os.path.join(path, "bands")
    )
    sets.write.mode("append").partitionBy("bucket").parquet(
        os.path.join(path, "sets")
    )
    n_new = delta.select(F.count(F.lit(1))).head()[0]
    meta = spark.createDataFrame(
        [
            (
                int(m["n_docs"]) + int(n_new),
                int(m["n_perm"]),
                int(m["rows_per_band"]),
                int(m["k"]),
                int(m["max_chars"]),
                stored_id_col or id_col,
                fingerprint or "",
            )
        ],
        "n_docs bigint, n_perm int, rows_per_band int, k int, "
        "max_chars int, id_col string, fingerprint string",
    )
    _swap_write(meta, os.path.join(path, "meta"))
    if batch_id is not None:
        _write_last_append(path, batch_id)
    # Commit point (round-9 advice): marker removal IS the commit
    # record, so it precedes the ids-record delete — a crash between
    # the two leaves a marker-less stale ids dir (inert: recovery
    # no-ops without a marker, the next append overwrites it), never a
    # live marker whose purge record is gone.
    os.remove(pending)
    shutil.rmtree(os.path.join(path, _PENDING_IDS))
    return {"committed": True, "skipped_duplicate_batch": False}


def recover_dedup_index_append(spark: SparkSession, path: str) -> dict:
    """Locked entry point for standalone recovery — holds the store's
    ``_append.lock`` so a recovery never races a live append (whose
    marker it would mis-read as torn). Protocol documented on
    ``_recover_dedup_index_append_impl``."""
    with _append_lock(path):
        return _recover_dedup_index_append_impl(spark, path)


def _recover_dedup_index_append_impl(spark: SparkSession, path: str) -> dict:
    """Return a torn-append artifact to its EXACT pre-append state so
    the same delta can be re-appended safely (round-8 advice: band/set
    rows may already be stored when the marker is found, so a blind
    retry double-writes them — after which collisions report duplicate
    pairs and verification picks an arbitrary hs set).

    Everything needed is recorded BEFORE the first store write, so
    recovery never needs the delta itself: the ``_pending-ids`` ids are
    anti-joined out of every band leaf (every doc writes one row per
    band, so all leaves are touched) and out of the ids' set buckets
    (computed from the ids — the other buckets cannot hold them); meta
    is restored from the marker's recorded (n_docs, fingerprint) with
    the invariant signature params re-read from the live meta. Purged
    band leaves are re-sorted by id so the governance min-max skipping
    property survives recovery. Cost: leaf-sized I/O with zero
    signature recomputation, paid only on the rare recovery path.
    No-op without a marker; raises on a pre-protocol (unparseable)
    marker — that state predates the recorded scalars and only a
    rebuild is safe. Round-9 advice hardening: a protocol-2 marker
    without a committed ``_pending-ids`` record proves no store write
    happened (cleanup + ``store_untouched``); the same state under a
    pre-v2 marker is ambiguous and raises, advising rebuild."""
    pending = os.path.join(path, _PENDING)
    _recover_swap(os.path.join(path, "meta"))
    if not os.path.exists(pending):
        return _clear_stale_ids_record(path, _PENDING_IDS)
    with open(pending, encoding="utf-8") as f:
        raw = f.read()
    try:
        state = json.loads(raw)
        old_n_docs = int(state["n_docs"])
        old_fp = str(state.get("fingerprint") or "")
        protocol = int(state.get("protocol") or 1)
        old_last = state.get("last_append", _UNKNOWN)
    except (ValueError, TypeError, KeyError) as e:
        raise ValueError(
            f"{path}: pending-append marker is unreadable ({e!r}) — "
            "pre-protocol or corrupt state cannot be auto-recovered; "
            "rebuild the index from the corpus"
        ) from None
    m = _read_meta(spark, path)
    id_col = m.asDict().get("id_col") or "doc_id"
    bands_purged = sets_purged = 0
    pids_dir = os.path.join(path, _PENDING_IDS)
    if not os.path.exists(os.path.join(pids_dir, "_SUCCESS")):
        # Round-9 advice: under protocol 2 the ids record precedes every
        # store write and the marker's removal is the commit record, so
        # marker-present-without-a-committed-ids-record PROVES no band/
        # set/meta write happened — clean up, leave the store alone. A
        # pre-v2 marker in this state is ambiguous ('nothing written' vs
        # 'fully committed' under the old delete-ids-first ordering);
        # restoring meta could silently revert n_docs/fingerprint under
        # committed rows, so refuse loudly.
        if protocol < 2:
            raise ValueError(
                f"{path}: pending-append marker present but the "
                "_pending-ids record is missing or incomplete — for a "
                "pre-protocol-2 marker this is ambiguous between "
                "'nothing written' and 'fully committed' and cannot be "
                "auto-recovered; rebuild the index from the corpus"
            )
        if os.path.isdir(pids_dir):
            shutil.rmtree(pids_dir)
        _restore_last_append(path, old_last)
        os.remove(pending)
        return {
            "recovered": True,
            "band_leaves_purged": 0,
            "set_leaves_purged": 0,
            "store_untouched": True,
        }
    ids = (
        spark.read.parquet(pids_dir)
        .select(F.col("id").alias(id_col))
        .distinct()
    )
    bands_dir = os.path.join(path, "bands")
    # ONE batched job per relation instead of one per leaf (the
    # textindex._batched_leaf_purge discipline): band leaves keep their
    # within-file id sort (min-max pruning), and the sets purge is
    # partition-pruned to the buckets the purged ids actually land in.
    buckets = sorted(
        r["bucket"]
        for r in ids.withColumn("bucket", _bucket_of(id_col))
        .select("bucket")
        .distinct()
        .collect()
    )
    bands_purged = len(
        _batched_leaf_purge(
            spark,
            bands_dir,
            "band=",
            ids,
            id_col,
            columns=[id_col, "band_key"],
            sort_within=[id_col],
        )
    )
    sets_purged = len(
        _batched_leaf_purge(
            spark,
            os.path.join(path, "sets"),
            "bucket=",
            ids,
            id_col,
            columns=[id_col, "hs"],
            leaf_values=buckets,
        )
    )
    meta = spark.createDataFrame(
        [
            (
                old_n_docs,
                int(m["n_perm"]),
                int(m["rows_per_band"]),
                int(m["k"]),
                int(m["max_chars"]),
                id_col,
                old_fp,
            )
        ],
        "n_docs bigint, n_perm int, rows_per_band int, k int, "
        "max_chars int, id_col string, fingerprint string",
    )
    _swap_write(meta, os.path.join(path, "meta"))
    # The idempotence sidecar is pre-append state too (a crash may land
    # after the new batch id was stamped; leaving it would wrongly
    # no-op the legitimate re-append of the purged batch).
    _restore_last_append(path, old_last)
    # Same commit discipline as the append: marker removal commits the
    # recovery; the ids record outliving the marker is inert.
    os.remove(pending)
    shutil.rmtree(pids_dir)
    return {
        "recovered": True,
        "band_leaves_purged": bands_purged,
        "set_leaves_purged": sets_purged,
    }


def compact_dedup_index(
    spark: SparkSession, path: str, target_bytes: int = 128 * 1024 * 1024
) -> dict:
    """Per-leaf small-file compaction of BOTH partitioned relations
    after many appends (each append writes one file set per touched
    band/bucket). Hive layouts — and therefore the sets store's dynamic
    pruning — are preserved; each leaf uses the compactor's crash-safe
    swap protocol."""
    from ..sinks.compaction import compact_partitioned_dir

    return {
        "bands": compact_partitioned_dir(
            spark, os.path.join(path, "bands"), target_bytes=target_bytes
        ),
        "sets": compact_partitioned_dir(
            spark, os.path.join(path, "sets"), target_bytes=target_bytes
        ),
    }


def stored_fingerprint(spark: SparkSession, path: str) -> str | None:
    """The source fingerprint stamped into meta; None when the artifact
    is absent or torn (pending append OR crashed-rebuild marker) —
    every case a fingerprint-checking consumer must treat as
    'rebuild'."""
    if os.path.exists(os.path.join(path, _PENDING)) or os.path.exists(
        os.path.join(path, _BUILD_PENDING)
    ):
        return None
    meta_dir = os.path.join(path, "meta")
    _recover_swap(meta_dir)
    if not os.path.isdir(meta_dir):
        return None
    try:
        row = spark.read.parquet(meta_dir).select("fingerprint").head()
    except Exception:
        return None
    return row["fingerprint"] if row else None


def query_dedup_index(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.25,
) -> DataFrame:
    """Near-dups of a NEW batch against the indexed corpus:
    (batch id, dup_of corpus id, jaccard >= threshold).

    Cost shape — the whole point of the artifact: Python runs ONLY on
    the batch (its signature pass, map-only, batch-sized); the corpus
    side is two parquet scans with zero Python (pinned in
    tests/test_plans.py). Candidates come from the (band, band_key)
    equi-join of the batch's band rows against the stored bands; the
    exact-jaccard verify reads corpus hs sets through a broadcast
    candidate join on (bucket, id), so dynamic partition pruning limits
    the set-store scan to the candidates' buckets. Values are identical
    to ``minhash_lsh_dedup`` over old ∪ batch restricted to cross
    pairs, so the same oracle arithmetic pins both.

    Refuses a torn index (an append or an in-place rebuild died
    mid-flight): bands may already hold delta rows whose set rows never
    landed, and a candidate without its verify set would be silently
    dropped; the error advises the safe fix (recover_dedup_index_append
    for an append, rebuild for a rebuild)."""
    _check_markers(path)
    from ._cache import swap_cache

    m = _read_meta(spark, path)
    mh = swap_cache(
        "dedup_index_query",
        minhash_sets_and_sigs(
            batch,
            text_col,
            id_col,
            n_perm=m["n_perm"],
            k=m["k"],
            max_chars=m["max_chars"],
        ),
    )
    batch_bands = band_rows(mh, id_col, m["n_perm"], m["rows_per_band"])
    stored_bands = spark.read.parquet(os.path.join(path, "bands")).select(
        F.col(id_col).alias("dup_of"), "band", "band_key"
    )
    # The candidate relation is persisted: it feeds the verify pair
    # list, the candidate-id bucket probe below, AND the corpus-set
    # prune join — unpersisted, each consumer re-ran the 64-leaf bands
    # scan + band join (round-11 verdict #8: the probe's store-scan
    # fixed costs were the bench-visible cost).
    cand = swap_cache(
        "dedup_index_cand",
        batch_bands.join(stored_bands, ["band", "band_key"])
        .select(F.col(id_col).alias("id_a"), F.col("dup_of").alias("id_b"))
        .distinct(),
    )
    cand_ids = (
        cand.select(F.col("id_b").alias(id_col))
        .distinct()
        .withColumn("bucket", _bucket_of(id_col))
    )
    # leaf_values-style STATIC partition pruning (the shape the purges
    # already use): only the buckets the candidates can live in are
    # read — a bounded driver list (<= the store's bucket count, 64),
    # never corpus-sized. The broadcast id join alone relied on
    # runtime DPP, which leaves the full 64-leaf listing + scan in the
    # plan when it does not fire.
    cand_buckets = [
        r["bucket"] for r in cand_ids.select("bucket").distinct().collect()
    ]
    store_sets = spark.read.parquet(os.path.join(path, "sets"))
    if cand_buckets:
        store_sets = store_sets.filter(F.col("bucket").isin(cand_buckets))
    corpus_sets = store_sets.join(
        F.broadcast(cand_ids), ["bucket", id_col]
    ).select(id_col, "hs")
    all_sets = mh.select(id_col, "hs").unionByName(corpus_sets)
    from .dedup import jaccard_of_sets

    out = jaccard_of_sets(
        all_sets, cand, id_col, set_col="hs", min_jaccard=threshold
    ).filter(F.col("jaccard") >= threshold)
    return out.select(
        F.col("id_a").alias(id_col),
        F.col("id_b").alias("dup_of"),
        "jaccard",
    )


def dedup_index_governance(
    spark: SparkSession,
    path: str,
    sample_ids: list[int],
    max_ids: int = 64,
    id_col: str | None = None,
    max_files_per_leaf: int = 8,
) -> dict:
    """Integrity governance for the durable dedup index — the check
    whose absence lets an append-contract violation rot silently:
    re-appending an ALREADY-indexed id double-writes its set/band rows,
    after which every batch that collides with it reports duplicate
    candidate pairs and (if the text changed between writes) verifies
    against an arbitrary one of two hs sets. For a bounded
    caller-chosen id sample, verify (a) each sampled id has exactly ONE
    set row, and (b) the stored band keys equal the keys recomputed
    from the stored hs arrays with the meta's permutation constants —
    drift means the artifact was written by different parameters than
    meta claims.

    Cost shape: the sets scan is statically pruned to the sampled ids'
    buckets; the bands scan is id-filtered against row-group min-max
    (build/append sort band rows by id); everything downstream is
    sample-sized, and both collects are STRUCTURALLY capped (a badly
    corrupted index that mass-duplicated a sampled id yields a
    truncated diagnostic sample, never an unbounded driver collect —
    duplication is still detected from the capped rows).

    ``id_col`` defaults to the value persisted in meta at build time
    (round-8 advice: the previous hardcoded 'doc_id' broke governance
    over custom-id indexes); pass it only to govern a pre-round-9
    artifact whose meta predates the field. Returns {n_ids_checked,
    duplicate_ids, band_mismatches, healthy, rebuild}."""
    import numpy as np

    from .dedup import MINHASH_MOD, minhash_perm_constants

    _check_markers(path)
    ids = sorted(set(sample_ids))[:max_ids]
    if not ids:
        raise ValueError(
            "dedup_index_governance needs a non-empty id sample — "
            "a health check over zero ids would read as healthy"
        )
    m = _read_meta(spark, path)
    id_col = id_col or m.asDict().get("id_col") or "doc_id"
    # cap: a healthy sample has 1 set row and n_bands band rows per id;
    # allow 4x before truncating the diagnostic (4 dup generations per
    # id is already an unambiguous 'rebuild')
    sets_cap = 4 * len(ids)
    sets = (
        spark.read.parquet(os.path.join(path, "sets"))
        .filter(F.col(id_col).isin(ids))
        .select(id_col, "hs")
        .limit(sets_cap)
        .collect()
    )
    seen: dict[int, list] = {}
    for r in sets:
        seen.setdefault(r[id_col], []).append(r["hs"])
    duplicate_ids = sorted(i for i, rows in seen.items() if len(rows) > 1)
    consts = minhash_perm_constants(m["n_perm"])
    A = np.array([a for a, _ in consts], dtype=np.int64)[:, None]
    B = np.array([b for _, b in consts], dtype=np.int64)[:, None]
    rpb = m["rows_per_band"]
    expected: dict[tuple[int, int], str] = {}
    for i, rows in seen.items():
        if len(rows) != 1:
            continue  # already reported as duplicate
        hs = np.array(rows[0], dtype=np.int64)
        sigs = ((A * hs[None, :] + B) % MINHASH_MOD).min(axis=1)
        for b in range(m["n_perm"] // rpb):
            expected[(i, b)] = ",".join(
                str(int(s)) for s in sigs[b * rpb : (b + 1) * rpb]
            )
    stored = (
        spark.read.parquet(os.path.join(path, "bands"))
        .filter(F.col(id_col).isin(ids))
        .select(id_col, "band", "band_key")
        .limit(4 * len(ids) * (m["n_perm"] // rpb))
        .collect()
    )
    band_mismatches = []
    stored_keys = {(r[id_col], r["band"]): r["band_key"] for r in stored}
    for key, want in expected.items():
        got = stored_keys.get(key)
        if got != want:
            band_mismatches.append(
                {"doc_id": key[0], "band": key[1], "stored": got, "expected": want}
            )
    healthy = not duplicate_ids and not band_mismatches
    # Maintenance verdict alongside the integrity one (round-9 verdict
    # #5): appends fragment BOTH partitioned relations one file set per
    # touched leaf; compact when either side trips the per-leaf budget.
    from ..sinks.compaction import fragmentation_report

    frag = {
        "bands": fragmentation_report(
            os.path.join(path, "bands"), max_files_per_leaf=max_files_per_leaf
        ),
        "sets": fragmentation_report(
            os.path.join(path, "sets"), max_files_per_leaf=max_files_per_leaf
        ),
    }
    return {
        "n_ids_checked": len(ids),
        "duplicate_ids": duplicate_ids,
        "band_mismatches": band_mismatches,
        "healthy": healthy,
        "rebuild": not healthy,
        "fragmentation": frag,
        "compact": frag["bands"]["compact"] or frag["sets"]["compact"],
    }
