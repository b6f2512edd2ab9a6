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


def merge_batch(
    old_changes: DataFrame,
    batch: DataFrame,
    key: str = "user_id",
    attr: str = "event_type",
    ts: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Incremental SCD2: merge an append-only batch into an existing
    history, given the history's CHANGE ROWS (the compressed changelog —
    what ``changes`` returned when the history was built; a deployment
    persists exactly this relation). Returns the same schema as
    ``build`` over the full changelog, equal to it row-for-row.

    Plan shape: the batch's key set splits the old change rows with one
    semi/anti join pair; only the affected slice re-runs the two window
    passes (its size is the batch plus the touched keys' change rows);
    untouched keys' intervals are emitted directly from their change
    rows without recomputation of membership."""
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
