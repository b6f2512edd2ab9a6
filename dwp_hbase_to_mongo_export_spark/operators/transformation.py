"""Topic-conditional output transform (equality wrap).

Reference: src/main/kotlin/app/batch/TransformationProcessor.kt:21-48 —
if topic == data.equality, wrap the payload as
{"message": {...payload, "@type": innerType}}.

The branch is driver-side (topic is constant per run) so non-equality
topics pay zero cost. The wrap itself needs a JSON re-serialise, hence a
pandas UDF; it runs only for the one equality collection.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.record_norm import EQUALITY_TOPIC, equality_wrap


def _wrap_batch(db_object: pd.Series, inner_type: pd.Series) -> pd.Series:
    return pd.Series(
        [
            None if j is None else equality_wrap(j, t or "")
            for j, t in zip(db_object, inner_type)
        ]
    )


def apply_topic_transform(df: DataFrame, topic: str) -> DataFrame:
    if topic != EQUALITY_TOPIC:
        return df
    udf = F.pandas_udf(_wrap_batch, T.StringType())
    return df.withColumn("db_object", udf("db_object", "inner_type"))


def _unwrap_batch(db_object: pd.Series) -> pd.DataFrame:
    from ..functions.record_norm import unwrap_record

    docs, ids, lms = [], [], []
    for j in db_object:
        if j is None:
            docs.append(None), ids.append(None), lms.append(None)
            continue
        doc, rid, lm = unwrap_record(j)
        docs.append(doc), ids.append(rid), lms.append(lm)
    return pd.DataFrame({"doc": docs, "rid": ids, "lm": lms})


def unwrap_records(df: DataFrame, json_col: str = "db_object") -> DataFrame:
    """Consumer-side inverse of the export normalisation: adds
    (doc, recovered_id, last_modified) from each extended-JSON line —
    the typed re-ingestion path for the reference's snapshot output
    (composes with sinks.snapshot.read_encrypted_snapshots, whose
    db_object column is exactly this input). One Arrow-batched pass,
    map-only; schemaless recursion is the same honest pandas-UDF
    mapping as the forward date wrapper (SURVEY.md section 7 hard
    part b)."""
    udf = F.pandas_udf(
        _unwrap_batch,
        T.StructType(
            [
                T.StructField("doc", T.StringType()),
                T.StructField("rid", T.StringType()),
                T.StructField("lm", T.StringType()),
            ]
        ),
    )
    return (
        df.withColumn("_u", udf(json_col))
        .withColumn("doc", F.col("_u.doc"))
        .withColumn("recovered_id", F.col("_u.rid"))
        .withColumn("last_modified", F.col("_u.lm"))
        .drop("_u")
    )
