"""Reference-shaped HBase-cell fixture generation.

Mirrors the reference integration fixture (images/hbase/hbase_data.py:
40-104): envelope per record with AES-CTR-encrypted payload, row key =
CRC32(id_json) ++ id_json, constant-or-varying cell timestamps, even ids
object-valued / odd ids scalar.

Used by tests and by the oracle-able end-to-end pipeline query
(queries_pipeline.py) — deterministic given the seed inputs, so a SQL
oracle can compute the expected output independently.
"""

from __future__ import annotations

import hashlib
import json

from pyspark.sql import DataFrame, SparkSession

from ..functions.crypto import LocalKeyService, aes_ctr_encrypt
from ..functions.jsonfns import make_row_key
from ..schemas import CELLS_SCHEMA

MASTER_KEK_ID = "local-kek-1"
# deterministic 32-byte data key (base64) — fixtures only
import base64 as _b64

DATA_KEY_B64 = _b64.b64encode(hashlib.sha256(b"fixture-data-key").digest()).decode()


def deterministic_iv(i: int | str) -> bytes:
    return hashlib.sha256(f"iv:{i}".encode()).digest()[:16]


def encrypt_payload(payload_json: str, i: int | str) -> tuple[str, str]:
    """(iv_b64, ciphertext_b64) with a per-record deterministic IV."""
    iv = deterministic_iv(i)
    ct = aes_ctr_encrypt(DATA_KEY_B64, iv, payload_json.encode("utf-8"))
    return _b64.b64encode(iv).decode("ascii"), ct


def envelope(
    i: int,
    db: str,
    collection: str,
    payload_json: str,
    last_modified: str = "2018-12-14T15:01:02.000+0000",
    outer_type: str = "OUTER_TYPE",
    inner_type: str = "INNER_TYPE",
    id_json: str | None = None,
) -> tuple[bytes, str]:
    """(row_key, envelope_json) for one record, hbase_data.py-shaped."""
    service = LocalKeyService()
    encrypted_key = service.encrypt_data_key(MASTER_KEK_ID, DATA_KEY_B64)
    iv_b64, ct_b64 = encrypt_payload(payload_json, i)
    if id_json is None:
        id_json = json.dumps({"record_id": f"{i:05d}"})
    env = {
        "traceId": f"{i:05d}",
        "unitOfWorkId": f"{i:05d}",
        "@type": outer_type,
        "message": {
            "db": db,
            "collection": collection,
            "_id": json.loads(id_json),
            "_timeBasedHash": "hash",
            "@type": inner_type,
            "_lastModifiedDateTime": last_modified,
            "encryption": {
                "encryptionKeyId": "",
                "encryptedEncryptionKey": encrypted_key,
                "initialisationVector": iv_b64,
                "keyEncryptionKeyId": MASTER_KEK_ID,
            },
            "dbObject": ct_b64,
        },
        "version": "core-4.master.9790",
        "timestamp": "2019-07-04T07:27:35.104+0000",
    }
    return make_row_key(id_json), json.dumps(env)


def default_payload(i: int) -> str:
    """hbase_data.py:99-104 — even ids object-valued, odd ids scalar."""
    return json.dumps(
        {
            "_id": {"record_id": f"{i:05d}"} if i % 2 == 0 else f"{i:05d}",
            "createdDateTime": "2015-03-20T12:23:25.183Z",
            "_lastModifiedDateTime": "2018-12-14T15:01:02.000+0000",
        }
    )


def fixture_cells(
    spark: SparkSession,
    n: int = 1000,
    topic: str = "db.database.collection",
    ts: int = 1000,
    payload_fn=default_payload,
    versions_per_key: int = 1,
) -> DataFrame:
    """n records as a cells DataFrame; versions_per_key > 1 adds stale
    versions (ts-1, ts-2, ...) for latest-per-key tests."""
    db, collection = topic.split(".")[-2:]
    rows = []
    for i in range(n):
        key, value = envelope(i, db, collection, payload_fn(i))
        for v in range(versions_per_key):
            rows.append((topic, key, ts - v, value))
    return spark.createDataFrame(rows, CELLS_SCHEMA)
