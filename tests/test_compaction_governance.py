"""Round-9-verdict #5: the compactors existed but nothing decided WHEN
to compact. Each durable store's governance now returns a fragmentation
report (files-per-leaf vs the per-leaf budget and vs what compaction
could actually achieve) and a ``compact: bool`` verdict, mirroring the
rebuild decision. These tests drive the loop end-to-end per store:
N appends trip the verdict, running the store's compactor clears it.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dwp_hbase_to_mongo_export_spark.operators import (
    dedupindex,
    similarity,
    textindex,
)
from dwp_hbase_to_mongo_export_spark.sinks.compaction import (
    fragmentation_report,
)
from dwp_hbase_to_mongo_export_spark.sources.parquet import load_table

PARAMS = dict(n_perm=8, rows_per_band=2, k=5, max_chars=256)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    df = load_table(spark, sf_dir, "documents").cache()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = load_table(spark, sf_dir, "embeddings").cache()
    yield df
    df.unpersist()


def test_report_ignores_legitimately_large_leaves(docs, tmp_path):
    """A leaf of many FULL-sized files must not be flagged: compaction
    to target_bytes could not shrink it, so 'fragmented' would demand
    work that achieves nothing. With target_bytes=1 every leaf's
    achievable file count >= its current count -> never fragmented."""
    path = str(tmp_path / "t")
    docs.limit(50).repartition(10).write.parquet(path)
    rep = fragmentation_report(path, target_bytes=1, max_files_per_leaf=2)
    assert rep["n_files"] >= 10 and not rep["compact"]
    # same layout against a realistic target: tiny files, over budget
    rep = fragmentation_report(
        path, target_bytes=128 * 1024 * 1024, max_files_per_leaf=2
    )
    assert rep["compact"] and rep["n_frag_leaves"] == 1


def test_report_raises_on_dataless_dir(tmp_path):
    os.makedirs(tmp_path / "empty")
    with pytest.raises(FileNotFoundError):
        fragmentation_report(str(tmp_path / "empty"))


def test_text_governance_compact_loop(spark, docs, tmp_path):
    path = str(tmp_path / "ix")
    textindex.build_text_index(docs.filter(F.col("doc_id") < 200), path)
    for lo in (200, 240, 280):
        textindex.append_to_text_index(
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 40)),
            path,
        )
    gov = textindex.text_index_governance(
        spark, path, ["table", "scan"], max_files_per_leaf=2
    )
    assert gov["healthy"] and gov["compact"]
    assert gov["fragmentation"]["n_frag_leaves"] > 0
    textindex.compact_text_index(spark, path)
    gov = textindex.text_index_governance(
        spark, path, ["table", "scan"], max_files_per_leaf=2
    )
    assert gov["healthy"] and not gov["compact"]


@pytest.mark.slow
def test_dedup_governance_compact_loop(spark, docs, tmp_path):
    path = str(tmp_path / "ix")
    dedupindex.build_dedup_index(
        docs.filter(F.col("doc_id") < 200), path, **PARAMS
    )
    for lo in (200, 240, 280):
        dedupindex.append_to_dedup_index(
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 40)),
            path,
        )
    gov = dedupindex.dedup_index_governance(
        spark, path, [0, 7, 42], max_files_per_leaf=2
    )
    assert gov["healthy"] and gov["compact"]
    dedupindex.compact_dedup_index(spark, path)
    gov = dedupindex.dedup_index_governance(
        spark, path, [0, 7, 42], max_files_per_leaf=2
    )
    assert gov["healthy"] and not gov["compact"]


def test_ivf_governance_compact_loop(spark, emb, tmp_path):
    cents = similarity._resolve_centroids(
        emb.filter(F.col("vec_id") < 200), None, 50, None, "vec_id", "embedding"
    )
    idx = similarity._nearest_centroids(
        emb.filter(F.col("vec_id") < 350), cents, 1, "embedding", "cluster"
    ).select(
        "cluster",
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
    )
    path = str(tmp_path / "ivf")
    similarity.save_ivf_index(idx, cents, path)
    for lo in (350, 400, 450):  # the sf0.001 fixture holds 500 vectors
        similarity.append_to_ivf_index(
            path,
            emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 50)),
        )
    gov = similarity.ivf_index_governance(
        spark, path, list(range(10)), k=5, max_files_per_leaf=2
    )
    assert not gov["rebuild"] and gov["compact"]
    similarity.compact_ivf_postings(spark, path)
    gov = similarity.ivf_index_governance(
        spark, path, list(range(10)), k=5, max_files_per_leaf=2
    )
    assert not gov["rebuild"] and not gov["compact"]


def test_pq_governance_compact_loop_and_duplicates(spark, emb, tmp_path):
    old = emb.filter(F.col("vec_id") < 350)
    codes, books = similarity.build_pq_index(old, m=4, k_codes=8, iters=2)
    path = str(tmp_path / "pq")
    similarity.save_pq_index(codes, books, path)
    for lo in (350, 400, 450):  # the sf0.001 fixture holds 500 vectors
        similarity.append_to_pq_index(
            path,
            emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 50)),
        )
    gov = similarity.pq_index_governance(
        spark, path, list(range(10)), max_files_per_leaf=2
    )
    assert gov["healthy"] and not gov["rebuild"] and gov["compact"]
    similarity.compact_pq_codes(spark, path)
    gov = similarity.pq_index_governance(
        spark, path, list(range(10)), max_files_per_leaf=2
    )
    assert gov["healthy"] and not gov["compact"]
    # append-contract violation: re-append already-encoded ids ->
    # duplicate code rows -> rebuild verdict
    similarity.append_to_pq_index(path, emb.filter(F.col("vec_id") < 5))
    gov = similarity.pq_index_governance(
        spark, path, list(range(10)), max_files_per_leaf=2
    )
    assert gov["duplicate_ids"] == [0, 1, 2, 3, 4]
    assert gov["rebuild"] and not gov["healthy"]
