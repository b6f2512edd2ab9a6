"""Envelope parse + projection + mandatory-field quarantine.

Reference: src/main/kotlin/app/batch/HBaseResultProcessor.kt:22-67.
Spark-first: one from_json over a declared struct (Catalyst prunes the
parse to the referenced fields), a coalesce for the db/collection topic
fallback (HBaseResultProcessor.kt:79-94), and a boolean mandatory-fields
predicate used both ways — valid rows continue, invalid rows become the
quarantine side-output (the Spring Batch `.skip()` analogue,
JobConfiguration.kt:57-61).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import ENVELOPE_SCHEMA

# utils/TextUtils.kt:8-9
TOPIC_RE = re.compile(r"^(?:\w+\.)?([-\w]+)\.([-\w]+)$")


def topic_db_collection(topic: str) -> tuple[str | None, str | None]:
    m = TOPIC_RE.match(topic)
    if not m:
        return None, None
    return m.group(1), m.group(2)


def _non_empty(c: Column) -> Column:
    return c.isNotNull() & (c != "")


def parse_envelope(cells: DataFrame, topic: str) -> DataFrame:
    """cells(row_key, ts, value) -> source-record columns + `valid` flag.

    Returns every input row; callers split on `valid` (see split_valid).
    """
    db_fallback, coll_fallback = topic_db_collection(topic)
    env = F.from_json(F.col("value"), ENVELOPE_SCHEMA).alias("env")
    df = cells.withColumn("env", env)
    msg = F.col("env.message")

    # envelope _lastModifiedDateTime is accepted only as a JSON primitive
    # (HBaseResultProcessor.kt:33-39); objects/null -> ''
    raw_lm = F.get_json_object("value", "$.message._lastModifiedDateTime")
    last_modified = F.when(
        raw_lm.isNull() | raw_lm.startswith("{") | raw_lm.startswith("["), F.lit("")
    ).otherwise(raw_lm)

    df = df.select(
        "row_key",
        "ts",
        F.coalesce(F.nullif(msg["db"], F.lit("")), F.lit(db_fallback)).alias("db"),
        F.coalesce(F.nullif(msg["collection"], F.lit("")), F.lit(coll_fallback)).alias(
            "collection"
        ),
        F.coalesce(F.nullif(F.col("env.`@type`"), F.lit("")), F.lit("TYPE_NOT_SET")).alias(
            "outer_type"
        ),
        F.coalesce(F.nullif(msg["@type"], F.lit("")), F.lit("TYPE_NOT_SET")).alias("inner_type"),
        last_modified.alias("message_last_modified"),
        msg["encryption"]["keyEncryptionKeyId"].alias("kek_id"),
        msg["encryption"]["initialisationVector"].alias("iv"),
        msg["encryption"]["encryptedEncryptionKey"].alias("encrypted_key"),
        msg["dbObject"].alias("db_object_enc"),
    )
    valid = (
        _non_empty(F.col("db_object_enc"))
        & _non_empty(F.col("kek_id"))
        & _non_empty(F.col("iv"))
        & _non_empty(F.col("encrypted_key"))
        & _non_empty(F.col("db"))
        & _non_empty(F.col("collection"))
    )
    return df.withColumn("valid", valid)


def split_valid(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(valid, quarantine) — two filters over one plan; Spark reuses the
    scan. Quarantined rows carry everything for diagnostics (the
    MissingFieldException skip path)."""
    return df.filter(F.col("valid")).drop("valid"), df.filter(~F.col("valid")).drop("valid")
