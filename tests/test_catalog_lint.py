"""Driver-harness compatibility lint over the whole query catalog.

The external gate canonicalises results through pandas
(``DataFrame.sort_values`` over all columns + value hashing), which

* cannot hash cells holding Python lists/dicts — so no catalog query may
  emit a top-level array/map/struct column (round-3 failure:
  ``embedding_quantize_int8``), and
* converts DuckDB HUGEINT (int128, e.g. ``sum(int32)``) to float64,
  which hashes differently from Spark's BIGINT — so oracle result
  schemas must stick to driver-safe scalar types (round-3 failure:
  ``q12_shipping_lateness``).

Both round-3 driver failures were interface mismatches the local gate
tolerated; this lint makes them un-reintroducible.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import types as T

from dwp_hbase_to_mongo_export_spark import queries as catalog
from dwp_hbase_to_mongo_export_spark.sources.parquet import TABLES

# DuckDB result types the driver's pandas canonicaliser round-trips
# faithfully. Notably absent: HUGEINT/UHUGEINT (-> float64), DECIMAL
# (-> object/float), any LIST/STRUCT/MAP (unhashable in sort_values).
_SAFE_DUCK_TYPES = {
    "BOOLEAN",
    "TINYINT",
    "SMALLINT",
    "INTEGER",
    "BIGINT",
    "UTINYINT",
    "USMALLINT",
    "UINTEGER",
    "FLOAT",
    "DOUBLE",
    "VARCHAR",
    "DATE",
    "TIMESTAMP",
    "TIMESTAMP_NS",
    "TIMESTAMP WITH TIME ZONE",
}

_COMPLEX_SPARK = (T.ArrayType, T.MapType, T.StructType)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(catalog.ORACLE))
def test_oracle_schema_driver_safe(name, duck):
    desc = duck.execute(f"DESCRIBE ({catalog.ORACLE[name]})").fetchall()
    offending = {
        col: typ for col, typ, *_ in desc if typ.upper() not in _SAFE_DUCK_TYPES
    }
    assert not offending, (
        f"{name}: oracle emits driver-unsafe DuckDB types {offending}; "
        "CAST to BIGINT/DOUBLE/VARCHAR or serialise arrays to strings"
    )


def test_spark_outputs_have_no_complex_columns():
    """The per-query check lives in tests/test_catalog_oracle.py's
    oracle matrix (folded there in round 12: this file used to re-build
    all 188 query DataFrames — ~220 s, since eager surfaces execute
    real work at construction — duplicating a pass the oracle matrix
    already makes; round-11 verdict #1). This stub pins the contract's
    continued existence: the matrix covers every gated query."""
    import ast
    from pathlib import Path

    src = (Path(__file__).parent / "test_catalog_oracle.py").read_text()
    assert "complex_cols" in src and "ArrayType" in src, (
        "the complex-column lint was removed from the oracle matrix — "
        "restore it (driver round-3 failure class: unhashable columns)"
    )
    ast.parse(src)


def test_driver_window_is_valid():
    assert len(catalog.DRIVER_WINDOW) == len(set(catalog.DRIVER_WINDOW))
    unknown = [n for n in catalog.DRIVER_WINDOW if n not in catalog.QUERIES]
    assert not unknown, f"DRIVER_WINDOW names not in catalog: {unknown}"
    order = catalog.driver_window_order()
    assert order[: len(catalog.DRIVER_WINDOW)] == [
        n for n in catalog.DRIVER_WINDOW if n in catalog.QUERIES
    ]
    assert sorted(order) == sorted(catalog.QUERIES)


def test_never_driver_checked_queries_lead_the_window():
    """The round-7 secondary gap, made structurally un-reintroducible:
    any gated query with NO all-true row in ANY CORRECTNESS_r*.json
    (i.e. registered but never driver-checked) MUST occupy the leading
    positions of DRIVER_WINDOW — a new query registered past the
    window, or a window rotated without the unchecked tier first, fails
    here. Ordering among checked queries stays the builder's per-round
    judgment (staleness-first via tools/rotate_window.py, with room to
    pull code-changed queries forward)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from rotate_window import latest_green_round

    green = latest_green_round(str(Path(__file__).resolve().parent.parent))
    never = sorted(n for n in catalog.QUERIES if green.get(n, 0) == 0)
    if never:  # nothing to require on a fully-evidenced catalog
        assert never == sorted(catalog.DRIVER_WINDOW[: len(never)]), (
            f"never-driver-checked queries must lead DRIVER_WINDOW: {never}"
        )


def test_window_is_staleness_first_modulo_declared_overrides():
    """Round-8 verdict task: nothing asserted the rotated window
    actually follows the staleness-first discipline. Judged against the
    driver evidence that existed AT ROTATION TIME (rounds <
    DRIVER_WINDOW_ROUND — later driver runs refresh the window's own
    rows, which must not retroactively flunk it): no window entry,
    except the declared code-changed overrides (DRIVER_WINDOW_CHANGED)
    and never-checked queries, may have FRESHER evidence than a query
    left outside the window. A window hand-edited to re-check a pet
    query while a staler one waits fails here."""
    import sys
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(root / "tools"))
    from rotate_window import latest_green_round

    assert set(catalog.DRIVER_WINDOW_CHANGED) <= set(catalog.DRIVER_WINDOW), (
        "declared code-changed overrides must be in the window they justify"
    )
    green = latest_green_round(str(root), max_round=catalog.DRIVER_WINDOW_ROUND - 1)
    window = set(catalog.DRIVER_WINDOW)
    exempt = set(catalog.DRIVER_WINDOW_CHANGED)
    in_rounds = [
        green.get(n, 0) for n in catalog.DRIVER_WINDOW if n not in exempt
    ]
    out_rounds = [green.get(n, 0) for n in catalog.QUERIES if n not in window]
    if in_rounds and out_rounds:
        freshest_in = max(in_rounds)
        stalest_out = min(out_rounds)
        assert freshest_in <= stalest_out, (
            f"window holds a query with evidence r{freshest_in} while a "
            f"staler r{stalest_out} query waits outside — rotate with "
            "tools/rotate_window.py (or declare a code-changed override "
            "in DRIVER_WINDOW_CHANGED)"
        )


def test_empty_at_annotations_are_pinned_and_valid():
    """EMPTY_AT (queries whose result is legitimately empty at the
    named small scales — their driver row there is agreement-on-
    emptiness, not value evidence) must stay a deliberate, reviewed
    set: annotating a query silences tools/check_correctness.py's
    vacuous-pass failure, so a drive-by addition would re-open the
    round-9 q5/q6 hole. Names must be gated queries; scales must be
    real fixture basenames; and the set is pinned exactly."""
    assert set(catalog.EMPTY_AT) <= set(catalog.QUERIES)
    for name, scales in catalog.EMPTY_AT.items():
        assert scales <= {"sf0.001", "sf0.01"}, (
            f"{name}: EMPTY_AT may only name the small fixtures — a "
            "query empty at sf0.1 too is vacuous at EVERY checked "
            "scale and must be fixed, not annotated"
        )
    assert set(catalog.EMPTY_AT) == {
        "customers_without_orders",
        "q22_idle_customers",
        "q7_nation_volume",  # sf0.001-only: the nation pairing finds
        # no smoke-fixture lineitem; value-checked at sf0.01+
    }, (
        "EMPTY_AT changed — confirm the new query is genuinely "
        "non-empty at sf0.1 (run tools/check_correctness.py "
        "/root/testdata/sf0.1 <name>) and update this pin deliberately"
    )
