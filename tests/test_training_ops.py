"""Behavioural tests for the round-4 training-pipeline operators, beyond
the catalog-oracle value check: the properties a 100 TB pipeline actually
relies on (leakage safety, determinism, boilerplate discrimination,
filter-reason bookkeeping).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dwp_hbase_to_mongo_export_spark.operators import textops
from dwp_hbase_to_mongo_export_spark.queries import QUERIES


def test_train_val_split_duplicates_share_split(spark, sf_dir):
    """The leakage property: two documents with identical NORMALISED
    content must always land in the same split (the gate is keyed on
    content, not doc_id)."""
    out = QUERIES["train_val_split"](spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from dwp_hbase_to_mongo_export_spark.functions.text import normalize_text

    joined = docs.select(
        "doc_id", normalize_text(F.col("text")).alias("nt")
    ).join(out, "doc_id")
    leaky = (
        joined.groupBy("nt")
        .agg(F.countDistinct("split").alias("n_splits"), F.count(F.lit(1)).alias("n"))
        .filter((F.col("n") > 1) & (F.col("n_splits") > 1))
        .count()
    )
    assert leaky == 0
    # and the split is a real 90/10-ish partition, not degenerate
    frac = out.filter(F.col("split") == "train").count() / out.count()
    assert 0.8 < frac < 0.97


def test_global_shuffle_is_deterministic_and_total(spark, sf_dir):
    """Same seed -> identical order on re-run (and across partition
    layouts); keys are unique so the order is total."""
    a = QUERIES["corpus_global_shuffle"](spark, sf_dir).collect()
    b = QUERIES["corpus_global_shuffle"](spark, sf_dir).collect()
    assert [r.doc_id for r in a] == [r.doc_id for r in b]
    keys = [r.shuffle_key for r in a]
    assert len(set(keys)) == len(keys)
    # shards cover a healthy spread (md5-derived, not constant)
    assert len({r.shard for r in a}) > 8


def test_boilerplate_flags_repeated_template(spark):
    """Docs sharing a long template paragraph score high; unique docs
    score 0 — the discrimination the operator exists for."""
    template = " ".join(f"tmpl{i}" for i in range(30))
    rows = [(i, template + f" unique tail {i} x y z w") for i in range(5)]
    rows += [(100 + i, " ".join(f"only{i}w{j}" for j in range(40))) for i in range(3)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        r.doc_id: r.boilerplate_fraction
        for r in textops.boilerplate_ngram_df(docs, n=8, min_df=3).collect()
    }
    for i in range(5):
        assert out[i] > 0.5, f"templated doc {i} scored {out[i]}"
    for i in range(3):
        assert out[100 + i] == 0.0


def test_corpus_filter_pipeline_reasons_consistent(spark, sf_dir):
    """keep must be exactly the negation of (too_short | low_quality |
    is_dup), and exactly one doc per duplicate group survives dup-flagging."""
    out = QUERIES["corpus_filter_pipeline"](spark, sf_dir)
    bad = out.filter(
        F.col("keep")
        != ~(F.col("too_short") | F.col("low_quality") | F.col("is_dup"))
    ).count()
    assert bad == 0
    # duplicate groups: is_dup=false exactly once per normalised fingerprint
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fp = textops.fingerprint(docs).select("doc_id", "fp_normalised")
    firsts = (
        fp.join(out.select("doc_id", "is_dup"), "doc_id")
        .groupBy("fp_normalised")
        .agg(F.sum(F.when(~F.col("is_dup"), 1).otherwise(0)).alias("n_first"))
        .filter(F.col("n_first") != 1)
        .count()
    )
    assert firsts == 0


def test_unigram_logprob_ranks_rare_vocab_lower(spark):
    """A document of corpus-common tokens must out-score (higher mean
    log-prob, lower perplexity) one of corpus-rare tokens — the signal
    the LM-quality filter exists for."""
    common = " ".join(["the quick brown fox"] * 10)
    rows = [(i, common) for i in range(8)]
    rows.append((99, "zxqv wvut kjhg plmn"))  # tokens appearing once each
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in textops.unigram_logprob(docs).collect()}
    assert out[0].avg_logprob > out[99].avg_logprob
    assert out[0].perplexity < out[99].perplexity
    assert out[99].n_tokens == 4


def test_tfidf_top_terms_ranks_rare_terms_higher(spark, sf_dir):
    from dwp_hbase_to_mongo_export_spark.operators import textops
    from dwp_hbase_to_mongo_export_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = textops.tfidf_top_terms(docs, top_n=3)
    rows = out.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # every doc with tokens gets exactly <=3 rows, ranks 1..n contiguous
    for doc_rows in by_doc.values():
        ranks = sorted(r.rank for r in doc_rows)
        assert ranks == list(range(1, len(ranks) + 1))
        # scores are non-increasing in rank
        srt = sorted(doc_rows, key=lambda r: r.rank)
        assert all(a.score >= b.score for a, b in zip(srt, srt[1:]))


def test_bm25_matches_only_query_terms_and_is_bounded(spark, sf_dir):
    from dwp_hbase_to_mongo_export_spark.operators import textops
    from dwp_hbase_to_mongo_export_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = textops.bm25_search(docs, ["table", "scan", "merge"], top_n=10).collect()
    assert 0 < len(out) <= 10
    assert all(1 <= r.n_terms_matched <= 3 for r in out)
    assert all(r.score > 0 for r in out)
    # a query of absent terms returns nothing
    empty = textops.bm25_search(docs, ["zzzabsent"], top_n=10).collect()
    assert empty == []


def test_winnowing_guarantees_shared_fingerprint_on_long_overlap(spark):
    """The winnowing invariant: two docs sharing a substring of length
    >= k + window - 1 (= 8) share at least one fingerprint."""
    from dwp_hbase_to_mongo_export_spark.operators import textops

    shared = "the quick brown fox jumps over the lazy dog"
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {shared} gamma delta"),
            (2, f"omega psi chi {shared} phi upsilon"),
            (3, "completely different content with no overlap at all here"),
        ],
        "doc_id long, text string",
    )
    fps = textops.winnowing_fingerprints(docs)
    a = {r.fp for r in fps.filter("doc_id = 1").collect()}
    b = {r.fp for r in fps.filter("doc_id = 2").collect()}
    c = {r.fp for r in fps.filter("doc_id = 3").collect()}
    assert a & b, "overlapping docs must share a fingerprint"
    pairs = textops.winnowing_overlap_pairs(docs, max_df=10, min_shared=2).collect()
    assert any(r.id_a == 1 and r.id_b == 2 for r in pairs)
    assert not any(r.id_b == 3 or r.id_a == 3 for r in pairs)
    assert len(a & c) <= 1  # unrelated docs share ~nothing


def test_temperature_mix_upweights_small_sources(spark):
    """A source with less token mass must get a keep-threshold at least
    as high (relative to its size) as a heavier source: with alpha<1 the
    sampling rate is monotonically DECREASING in mass per doc."""
    import dwp_hbase_to_mongo_export_spark.queries as catalog

    out = {
        r.source: r
        for r in catalog.QUERIES["corpus_temperature_mix"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert len(out) == 20
    for r in out.values():
        assert 0 <= r.n_kept <= r.n_docs
        assert 0 <= r.threshold <= 10000
    # overall keep fraction lands near the 50% target
    kept = sum(r.n_kept for r in out.values())
    total = sum(r.n_docs for r in out.values())
    assert 0.3 <= kept / total <= 0.7
