"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and the matching ``oracle_sql()``
on DuckDB over the same parquet tables, then compares row count, sorted
column names, and an order-insensitive value hash.

Usage: python tools/check_correctness.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time
from datetime import date, datetime

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from __spark_entry__ import oracle_sql, queries  # noqa: E402
from dwp_hbase_to_mongo_export_spark.queries import EMPTY_AT  # noqa: E402
from dwp_hbase_to_mongo_export_spark.sources.parquet import TABLES  # noqa: E402


def _vacuous(rows: list[tuple]) -> bool:
    """A result that carries no checkable values: zero rows, or rows
    whose every cell is NULL/NaN. Both engines trivially agree on such
    a result, so a green gate over it is NOT value evidence — the
    round-9 q5/q6 defect (date windows outside the fixture range made
    both 'pass' on emptiness at every scale, leaving a 6-way join's
    arithmetic never actually compared)."""
    return all(
        v is None or (isinstance(v, float) and math.isnan(v))
        for r in rows
        for v in r
    )


def _driver_like_spark():
    """A deliberately BARE session, like the driver's harness builds —
    no engine-tuned confs. Loaders must self-provision anything they
    need (round 1 regression: nanosAsLong only lived in get_spark, so
    every events query passed locally and failed under the driver)."""
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[8]")
        .appName("correctness-gate")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )


def _norm(v):
    """Driver-faithful cell canonicalisation.

    Two deliberate strictnesses, both lessons from round 3 where the
    looser local gate passed queries the driver failed:

    * float and int hash DIFFERENTLY even when numerically equal
      (no ``18870.0 -> "18870"`` collapse): DuckDB HUGEINT (int128,
      e.g. un-cast ``sum(int32)``) reaches the driver's pandas frame as
      float64 while Spark's BIGINT stays int64, and the driver hashes
      them apart (q12_shipping_lateness). Oracles must CAST.
    * list/dict cells raise TypeError, like pandas ``sort_values`` does
      in the driver's canonicaliser (embedding_quantize_int8). Catalog
      queries must serialise arrays to strings.
    """
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, (list, tuple, dict, np.ndarray)):
        raise TypeError(
            f"unhashable type: {type(v).__name__!r} (driver canonicaliser "
            "cannot sort/hash array cells)"
        )
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v)).lower()
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        v = float(v)
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    return str(v)


def value_hash(rows: list[tuple], colnames: list[str]) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def pandas_rows(pdf) -> list[tuple]:
    """Rows via a pandas frame, as the driver materialises both sides —
    this is where DuckDB HUGEINT becomes float64 and Spark BIGINT stays
    int64, so hashing through here reproduces the driver's typing.
    Also runs the driver's ``sort_values`` over all columns first, so
    unhashable array cells crash here exactly as they crash there."""
    if len(pdf.columns):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    rows = []
    for tup in pdf.itertuples(index=False, name=None):
        rows.append(tuple(None if v is pd.NaT else v for v in tup))
    return rows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2:]
    spark = _driver_like_spark()
    con = duckdb.connect()
    for t in TABLES:
        # a table may be a single parquet file OR a directory of part
        # files (the bench's multi-file re-layout; production layout) —
        # DuckDB needs a glob for the directory form, and the glob must
        # sort by name to preserve the layout's global row order
        p = f"{sf_dir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")

    qs, oracles = queries(), oracle_sql()
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    n_pass = n_fail = n_weak = n_vac = 0
    for name, fn in qs.items():
        if name_filter and not any(f in name for f in name_filter):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = pandas_rows(sdf.toPandas())
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"WEAK {name}: rows={len(srows)} (no oracle, rows-only) [{time.time()-t0:.1f}s]")
            n_weak += 1
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = pandas_rows(res.df())
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"schema spark={sorted(scols)} duckdb={sorted(dcols)}")
        else:
            sh, dh = value_hash(srows, scols), value_hash(drows, dcols)
            if sh != dh:
                problems.append(f"value-hash spark={sh} duckdb={dh}")
                smap = {r: None for r in sorted(srows)[:3]}
                print(f"  spark sample: {list(smap)[:2]}")
                print(f"  duck  sample: {sorted(drows)[:2]}")
        if not problems and _vacuous(srows):
            # agreement on an empty/all-NULL result is not value
            # evidence; only annotated, deliberately-small-scale-empty
            # queries may pass vacuously (and they carry value evidence
            # at the larger scales)
            if sf_name in EMPTY_AT.get(name, ()):
                print(
                    f"PASS {name}: rows={len(srows)} (vacuous at {sf_name} "
                    f"— annotated, value evidence at larger sf) "
                    f"[{time.time()-t0:.1f}s]"
                )
                n_pass += 1
                n_vac += 1
                continue
            problems.append(
                f"vacuous result (empty/all-NULL) at {sf_name} without an "
                "EMPTY_AT annotation — the gate never compared a value"
            )
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(srows)} [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(
        f"\n{n_pass} pass ({n_vac} vacuous-annotated), "
        f"{n_weak} weak (rows-only), {n_fail} fail"
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
