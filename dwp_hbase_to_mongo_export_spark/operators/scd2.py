"""Slowly-changing-dimension TYPE 2 builders: full history and
incremental batch merge (Kimball's dimension-history pattern, public
literature).

``build`` compresses a changelog to state-CHANGE rows and assigns each
its validity interval — one shuffle on the key, both window passes
sharing the sort (pinned in tests/test_plans.py).

``merge_batch`` is the lakehouse INCREMENTAL form: given an existing
history and a new APPEND-ONLY batch (every batch row's ts is >= the
key's last recorded ts — the standard watermark contract of a CDC
feed), it rebuilds intervals ONLY for the keys the batch touches and
passes every other key's rows through untouched. Because a key's
change rows ARE its compressed changelog, re-running the change
compression over (old change rows ∪ new batch rows) reproduces exactly
what a full rebuild computes for that key — so
merge_batch(build(old), new) == build(old ∪ new), which is what the
scd2_incremental oracle pins (the oracle IS the full rebuild). The
append-only contract matters: a LATE row interleaving before an
already-compressed-away duplicate could not be reconstructed from the
compressed form; late data belongs in a rebuild, not a merge.

Scale: the merge touches |affected keys| x (their change rows + batch
rows) — at 100 TB with a daily batch touching 0.1% of keys, the
rebuild work is 1000x smaller than a full build; the untouched side is
a key anti-join that never rewrites history rows.

Reference scope note: the reference materialises only the LATEST
record version (HBaseResultProcessor.kt:22-67 keeps one cell version);
SCD2 extends the engine with the full-history form of the same
latest-per-key semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def changes(
    ev: DataFrame,
    key: str = "user_id",
    attr: str = "event_type",
    ts: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """State-CHANGE rows of a changelog: each row where ``attr`` differs
    from the key's previous version (or is the first). Keeps (key, attr,
    ts, tiebreak) so compression is idempotent: changes(changes(x)) ==
    changes(x), the property merge_batch leans on."""
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    return (
        ev.select(key, attr, ts, tiebreak)
        .withColumn("_prev", F.lag(attr).over(w))
        .filter(F.col("_prev").isNull() | (F.col(attr) != F.col("_prev")))
        .drop("_prev")
    )


def intervals(
    chg: DataFrame,
    key: str = "user_id",
    attr: str = "event_type",
    ts: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Validity intervals over change rows: [valid_from, valid_to) with
    the open (current) row carrying NULL / is_current=1."""
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    nxt = F.lead(ts).over(w)
    return chg.select(
        key,
        attr,
        F.unix_micros(ts).alias("valid_from_us"),
        F.unix_micros(nxt).alias("valid_to_us"),
        F.when(nxt.isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_current"),
    )


def build(
    ev: DataFrame,
    key: str = "user_id",
    attr: str = "event_type",
    ts: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Full SCD2 history of a changelog (changes -> intervals; one
    shuffle, shared sort)."""
    return intervals(changes(ev, key, attr, ts, tiebreak), key, attr, ts, tiebreak)


def enforce_watermark(
    old_changes: DataFrame,
    batch: DataFrame,
    key: str,
    ts: str,
    last_event_ts: DataFrame | None = None,
) -> None:
    """LOUD failure when a batch violates merge_batch's append-only
    contract (some batch row's ts precedes its key's last recorded
    change ts). Without this, a late batch silently produces history
    that diverges from the full rebuild — the worst failure mode
    (wrong, quiet): the change compression that built old_changes may
    have dropped a duplicate the late row should have split, and the
    compressed form cannot reconstruct it.

    RESIDUAL GAP when only old_changes is available (round-8 advice):
    the guard is sound w.r.t. the COMPRESSED changelog, not the raw
    feed — old_changes keeps only a key's state-CHANGE rows, so a late
    batch row whose ts falls AFTER the key's last change but BEFORE a
    compressed-away duplicate event passes the check yet still makes
    merge_batch diverge from the full rebuild (exactly the
    unreconstructable interleave the module docstring describes).
    Deployments that persist a per-key last-RAW-event timestamp — one
    (key, ts) row per key, constant-size state any ingest job can fold
    alongside the change rows — should pass it as ``last_event_ts``;
    the guard then takes each key's max over BOTH relations and
    enforces the true append-only contract with no residual gap.

    Cost shape: both sides reduce to ONE row per key before they meet —
    per-key max over the change rows (change-row-sized, far below the
    raw changelog; last_event_ts, when given, is already key-sized)
    against per-key min over the batch (batch-sized); the join is
    key-sized and inner on the batch's keys only. One extra Spark job,
    which is why the check is opt-in on merge_batch (``validate=True``)
    rather than unconditional."""
    recorded = old_changes.select(key, ts)
    if last_event_ts is not None:
        recorded = recorded.unionByName(last_event_ts.select(key, ts))
    old_last = recorded.groupBy(key).agg(F.max(ts).alias("_old_max_ts"))
    batch_min = batch.groupBy(key).agg(F.min(ts).alias("_batch_min_ts"))
    late = (
        batch_min.join(old_last, key)
        .filter(F.col("_batch_min_ts") < F.col("_old_max_ts"))
        .limit(5)
        .collect()
    )
    if late:
        detail = ", ".join(
            f"{r[key]}: batch min {r['_batch_min_ts']} < recorded max"
            f" {r['_old_max_ts']}"
            for r in late
        )
        raise ValueError(
            "scd2.merge_batch watermark violation — batch rows precede "
            f"their key's recorded history (late data belongs in a full "
            f"rebuild, not a merge): {detail}"
        )


def merge_batch(
    old_changes: DataFrame,
    batch: DataFrame,
    key: str = "user_id",
    attr: str = "event_type",
    ts: str = "ts",
    tiebreak: str = "event_id",
    validate: bool = False,
    last_event_ts: DataFrame | None = None,
) -> DataFrame:
    """Incremental SCD2: merge an append-only batch into an existing
    history, given the history's CHANGE ROWS (the compressed changelog —
    what ``changes`` returned when the history was built; a deployment
    persists exactly this relation). Returns the same schema as
    ``build`` over the full changelog, equal to it row-for-row.

    ``validate=True`` runs the ``enforce_watermark`` guard first (one
    key-sized extra job) and raises on a contract-violating batch
    instead of quietly emitting divergent history; pass
    ``last_event_ts`` (per-key last RAW event ts, if the deployment
    persists it) to close the guard's compressed-changelog residual
    gap — see enforce_watermark's docstring.

    Plan shape: the batch's key set splits the old change rows with one
    semi/anti join pair; only the affected slice re-runs the two window
    passes (its size is the batch plus the touched keys' change rows);
    untouched keys' intervals are emitted directly from their change
    rows without recomputation of membership."""
    if validate:
        enforce_watermark(old_changes, batch, key, ts, last_event_ts)
    cols = [key, attr, ts, tiebreak]
    affected = batch.select(key).distinct()
    untouched = old_changes.join(affected, key, "left_anti")
    touched = (
        old_changes.join(affected, key, "left_semi")
        .select(*cols)
        .unionByName(batch.select(*cols))
    )
    rebuilt = intervals(
        changes(touched, key, attr, ts, tiebreak), key, attr, ts, tiebreak
    )
    return intervals(untouched, key, attr, ts, tiebreak).unionByName(rebuilt)


def fold_last_event_ts(
    prev: DataFrame | None,
    batch: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """Maintain the per-key last-RAW-event timestamp relation that
    closes ``enforce_watermark``'s compressed-changelog gap: one
    (key, ts) row per key ever seen, folded by MAX on each batch —
    constant-size state (key-cardinality, two columns) any ingest job
    can persist alongside the change rows. ``prev=None`` starts the
    state from the first batch (or from the full changelog when
    backfilling). Merge THEN fold: guard/merge the batch against the
    PREVIOUS state, and fold the batch into the state only after — the
    relation passed to merge_batch as ``last_event_ts`` must predate
    this batch's fold, because folding first would compare the batch
    against itself and the guard would never trip.

    Scale shape: one key-partial aggregation of the batch plus a
    key-sized union+max against the stored state — the same shuffle key
    as the merge itself, no changelog re-scan ever."""
    folded = batch.groupBy(key).agg(F.max(ts).alias(ts))
    if prev is None:
        return folded
    return (
        prev.select(key, ts)
        .unionByName(folded)
        .groupBy(key)
        .agg(F.max(ts).alias(ts))
    )
