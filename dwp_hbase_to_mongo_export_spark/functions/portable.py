"""Engine-portable numeric rounding.

``F.round`` and DuckDB ``round`` disagree on boundary doubles: Spark
rounds HALF_UP on the double's SHORTEST decimal representation
(BigDecimal.valueOf), DuckDB on the scaled float — so a value whose
true binary form is 0.05564999..9 but whose shortest repr is "0.05565"
rounds to 0.0557 in Spark and 0.0556 in DuckDB. Rare enough to pass a
500-row fixture, ~certain to appear somewhere in a big one (found by
the sf0.1 full-gate sweep: text_quality, corpus_filter_pipeline,
q2_min_cost_supplier).

``floor(x * 10^d + 0.5) / 10^d`` runs the SAME IEEE multiply/add/floor
on both engines, so identical input doubles always produce identical
rounded doubles — the quantize_int8 trick generalised. (HALF_UP toward
+inf on exact .5 boundaries; fine for the non-negative measures it is
used on.) Sums remain order-dependent across engines — for money
aggregates use exact DECIMAL summation instead (see q9).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_portable(c: Column, digits: int) -> Column:
    f = float(10**digits)
    return F.floor(c * f + F.lit(0.5)) / F.lit(f)


def round_portable_sql(expr: str, digits: int) -> str:
    f = 10**digits
    return f"(floor(({expr}) * {f}.0 + 0.5) / {f}.0)"
