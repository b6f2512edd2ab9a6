"""Manifest CSV sink — Spark-native path.

Reference: pipe-delimited CSV-escaped manifest lines
(domain/DomainClasses.kt:83-88, batch/StreamingManifestWriter.kt:18-58).
The per-snapshot-file-aligned manifests are produced by
sinks/snapshot.write_encrypted_snapshots; this module is the bulk/scale
path: one distributed CSV dataset, written with the same escaping rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.manifest import MANIFEST_COLUMNS


def write_manifest_csv(manifest: DataFrame, path: str) -> None:
    (
        manifest.select(*MANIFEST_COLUMNS)
        .write.mode("overwrite")
        .option("sep", "|")
        .option("quote", '"')
        .option("escape", '"')  # commons-text style: embedded quotes doubled
        .option("header", "false")
        .csv(path)
    )
