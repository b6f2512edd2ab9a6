"""Small-file compaction for parquet table directories.

The 100 TB failure mode this addresses: incremental/streaming writers
emit per-micro-batch files, and a table accumulates millions of
KB-sized parquet files whose open/footer overhead dominates scan time
(every file costs a task schedule + footer parse + S3 GET). Compaction
rewrites the directory to ~``target_bytes`` files.

Spark shape: one distributed read -> repartition(ceil(bytes/target)) ->
write to a staging dir, then an atomic-as-possible directory swap. The
file-count estimate is metadata-only (no data read); the single shuffle
is round-robin, which also rebalances skewed input files. Row-group
layout within files is preserved by parquet itself.
"""

from __future__ import annotations

import math
import os
import shutil


def plan_compaction(
    input_dir: str, target_bytes: int = 128 * 1024 * 1024
) -> dict:
    """Metadata-only look: current file count/bytes (recursive, so
    Hive-partitioned layouts report truthfully) and the output file
    count a compaction would produce, plus whether the layout is
    partitioned (key=value subdirectories)."""
    files: list[str] = []
    partitioned = False
    for root, dirs, names in os.walk(input_dir):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        if any("=" in d for d in dirs):
            partitioned = True
        files.extend(
            os.path.join(root, f)
            for f in names
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
    total = sum(os.path.getsize(f) for f in files)
    return {
        "n_files": len(files),
        "total_bytes": total,
        "target_files": max(1, math.ceil(total / target_bytes)),
        "partitioned": partitioned,
    }


def compact_parquet_dir(
    spark,
    input_dir: str,
    target_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 2,
) -> dict:
    """Rewrite ``input_dir``'s parquet files into ~target_bytes files.

    Returns the plan dict plus ``compacted: bool``. No-ops (and reads
    nothing) when the directory already has fewer than
    ``min_files_to_compact`` files or one output file would not shrink
    the count. The rewrite goes through a sibling staging directory and
    a swap, so a crash mid-write leaves the original intact (the
    staging dir is the only casualty) — the same publish-then-swap
    discipline as the snapshot sink's naming contract."""
    plan = plan_compaction(input_dir, target_bytes)
    if plan["partitioned"]:
        # a flat repartition-and-rewrite would DESTROY the partition
        # directory layout (and its pruning); partitioned tables need a
        # per-partition rewrite, which is a different contract — refuse
        # loudly rather than silently flattening or no-opping.
        raise ValueError(
            f"{input_dir} is a partitioned layout; compact each "
            "partition directory individually"
        )
    if (
        plan["n_files"] < min_files_to_compact
        or plan["target_files"] >= plan["n_files"]
    ):
        return {**plan, "compacted": False}

    staging = input_dir.rstrip("/") + ".compact-staging"
    backup = input_dir.rstrip("/") + ".compact-old"
    df = spark.read.parquet(input_dir)
    df.repartition(plan["target_files"]).write.mode("overwrite").parquet(staging)
    os.rename(input_dir, backup)
    os.rename(staging, input_dir)
    shutil.rmtree(backup)
    return {**plan, "compacted": True}
