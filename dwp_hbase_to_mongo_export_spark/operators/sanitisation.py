"""Sanitisation as pure JVM column expressions — no Python in this path.

Reference: src/main/kotlin/app/batch/SanitisationProcessor.kt:14-44.

Every replace here is a literal/regex string op, so it stays inside
whole-stage codegen (Java regex supports the negative lookbehind). The
collection-scoped strip is a `when` over (db, collection); note the
reference's char class [r|n] also strips \\| — reproduced faithfully.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.record_norm import SANITISE_SCOPED_COLLECTIONS

# (?<!\\)\\[r|n] — unescaped \r, \n (and \| via the class quirk)
_SCOPED_PATTERN = r"(?<!\\)\\[r|n]"


def sanitise_column(json_col: Column, db: Column, collection: Column) -> Column:
    scoped = F.lit(False)
    for d, c in sorted(SANITISE_SCOPED_COLLECTIONS):
        scoped = scoped | ((db == d) & (collection == c))
    body = F.when(scoped, F.regexp_replace(json_col, _SCOPED_PATTERN, "")).otherwise(json_col)
    # global literal replaces (keys and values — yields d_oid / d_date)
    body = F.replace(body, F.lit("$"), F.lit("d_"))
    body = F.replace(body, F.lit("\\u0000"), F.lit(""))
    body = F.replace(body, F.lit("_archivedDateTime"), F.lit("_removedDateTime"))
    body = F.replace(body, F.lit("_archived"), F.lit("_removed"))
    return body
