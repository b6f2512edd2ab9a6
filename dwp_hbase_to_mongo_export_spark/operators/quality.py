"""Declarative data-quality constraint checking (the deequ/
great-expectations shape — public literature), scaling the reference's
per-record mandatory-field validation (HBaseResultProcessor.kt:97-102,
SURVEY.md section 2 row 7) up to a dataset-level framework: declare
constraints, get one report frame of
(check_name, n_checked, violations, pass).

Scale design:
* ALL row-level constraints over one table evaluate in a SINGLE
  aggregation pass — each is a conditional count fused into the same
  map-side-combined agg, so checking 50 constraints costs one scan,
  not 50. The one-row result unpivots via stack() (a generator, no
  shuffle).
* Uniqueness rides the same single-pass form (count - count distinct).
* Referential integrity is a LEFT ANTI join child->parent aggregated
  to a count — the orphan side only; at 100 TB the parent key column
  broadcasts when small, else it is the standard key-keyed shuffle.
* Everything stays a DataFrame until the caller acts: the report is
  lazily unioned one-row frames, so a scheduler can gate a 100 TB
  write on `report.filter(~pass).count() == 0` without collecting
  anything else.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_REPORT_COLS = ("check_name", "n_checked", "violations")


def row_constraints_report(
    df: DataFrame, constraints: dict[str, Column]
) -> DataFrame:
    """One aggregation pass over ``df`` evaluating every predicate:
    (constraint, n_checked, violations). A row VIOLATES a constraint
    when the predicate is false or null (null-hostile on purpose —
    a null check result is an unknown, and unknowns fail audits)."""
    # coalesce the sum: F.sum over ZERO rows is NULL, and a NULL
    # violations count would make pass=NULL — which filter(~pass)
    # silently drops, green-lighting a gate on an unexpectedly EMPTY
    # table. 0 violations on 0 rows keeps the row visible (n_checked=0
    # is the caller's signal that emptiness itself needs a constraint).
    aggs = [F.count(F.lit(1)).alias("_n")] + [
        F.coalesce(
            F.sum(F.when(F.coalesce(pred, F.lit(False)), 0).otherwise(1)),
            F.lit(0),
        ).cast("long").alias(f"_c{i}")
        for i, pred in enumerate(constraints.values())
    ]
    row = df.agg(*aggs)
    names = list(constraints)
    stack = ", ".join(f"'{n}', `_c{i}`" for i, n in enumerate(names))
    return row.select(
        F.expr(f"stack({len(names)}, {stack}) AS (check_name, violations)"),
        F.col("_n").alias("n_checked"),
    ).select(*_REPORT_COLS)


def uniqueness_report(df: DataFrame, name: str, col: str) -> DataFrame:
    """(name, n_checked, violations): violations = rows beyond the first
    per distinct value — same single-pass scan as the row constraints."""
    return df.agg(
        F.count(F.lit(1)).alias("n_checked"),
        (F.count(col) - F.countDistinct(col)).cast("long").alias("violations"),
    ).select(F.lit(name).alias("check_name"), "n_checked", "violations")


def referential_report(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str, name: str
) -> DataFrame:
    """(name, n_checked, violations): violations = child rows whose key
    has no parent (left-anti orphan count)."""
    # alias both sides: with child_key == parent_key (the common FK
    # shape) unaliased F.col refs are AMBIGUOUS_REFERENCE errors.
    orphans = (
        child.select(F.col(child_key).alias("_ck"))
        .join(
            parent.select(F.col(parent_key).alias("_pk")),
            F.col("_ck") == F.col("_pk"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("violations"))
    )
    total = child.agg(F.count(F.lit(1)).alias("n_checked"))
    return (
        orphans.join(F.broadcast(total))
        .select(F.lit(name).alias("check_name"), "n_checked", "violations")
    )


def quality_report(parts: list[DataFrame]) -> DataFrame:
    """Union the per-check frames and derive the pass flag."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.select(
        "check_name",
        "n_checked",
        "violations",
        (F.col("violations") == 0).alias("pass"),
    )
