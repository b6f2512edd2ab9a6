"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
public literature): select pretraining documents whose HASHED N-GRAM
feature distribution looks like a TARGET corpus, by importance weights
between two bag-of-hashed-features unigram models.

The method (paper §3, reproduced from the public description):

1. Featurise every document into hashed token buckets (the paper uses
   hashed n-grams; this build uses unigrams of the shared normalised
   tokenisation — the feature extractor is pluggable).
2. Fit two multinomial bucket models: p_target over the target slice,
   p_raw over the whole (raw) corpus, both Laplace-smoothed.
3. Per document, the importance log-weight is
   sum over token occurrences of ln(p_target[b]) - ln(p_raw[b]).
4. Resample k documents WITHOUT replacement via Gumbel top-k on the
   log-weights (the Gumbel-max trick: argmax of logw + Gumbel noise is
   a draw from softmax(logw); the top-k generalisation is the
   without-replacement sample).

Why this engine carries it: dedup and quality filters decide what to
DROP; DSIR is the standard public method for deciding what to KEEP
when a 100 TB raw crawl must be distilled toward a curated target
(Wikipedia/books in the paper). It composes entirely from primitives
this engine already relies on — normalised tokens, md5-hashed buckets,
broadcast-sized model tables, deterministic md5 uniforms for the
sample (the weighted_sample_aes idiom).

Spark shape, 100 TB honest:

* ONE token scan computes BOTH models: the bucket relation aggregates
  (cnt_target, cnt_raw) per bucket in a single map-side-combined pass
  (target membership is a flag, not a second scan).
* The model table is N_BUCKETS rows — broadcast-sized BY CONSTRUCTION
  (the whole point of feature hashing; the paper uses 10^4). The
  per-token model lookup therefore never shuffles the corpus; the only
  corpus-sized exchange is the per-doc aggregation on doc_id.
* The Gumbel top-k is a TakeOrdered over doc-count rows (per-partition
  heads + driver merge of k), not a full sort.

Determinism (the oracle discipline): buckets and Gumbel uniforms are
md5-derived; per-bucket log-ratios are rounded to 9dp before the
per-doc sum (one ln per side, engines differ at most in the last ulp);
the per-doc sum is rounded to 3dp (the text_unigram_logprob precedent
for order-sensitive double folds); sample keys are rounded to 6dp with
a doc-id tiebreak before ranking, and the sample exposes RANKS, not
floats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import normalize_text

N_BUCKETS = 1024


def feature_bucket(token: Column, n_buckets: int = N_BUCKETS) -> Column:
    """Hashed-feature bucket of a token: first 8 md5 hex chars of
    'dsir:<token>' as a bigint, mod n_buckets — deterministic across
    engines (the family's md5 contract)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("dsir:"), token)), 1, 8), 16, 10
        ).cast("bigint")
        % n_buckets
    )


def bucket_counts(
    corpus: DataFrame,
    target: Column,
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """The sufficient statistics of both bucket models, from ONE token
    scan: (bucket, ct, cr) — target and raw occurrence counts per
    hashed bucket. This relation folds by bucket-wise SUM, so it is
    MERGEABLE exactly like the CMS sketch: per-shard/per-day counts
    combine into the corpus counts without rescanning, and the same
    fold IS a streaming aggregation (streaming/incremental.
    dsir_counts_stream) — nightly model refresh costs one pass over
    the new batch, never the corpus."""
    toks = corpus.select(
        F.when(target, F.lit(1)).otherwise(F.lit(0)).alias("_is_t"),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("t"),
    ).filter(F.col("t") != "")
    return toks.select(
        feature_bucket(F.col("t"), n_buckets).alias("bucket"), "_is_t"
    ).groupBy("bucket").agg(
        F.sum("_is_t").alias("ct"),
        F.count(F.lit(1)).alias("cr"),
    )


def models_from_counts(
    per_bucket: DataFrame, n_buckets: int = N_BUCKETS
) -> DataFrame:
    """(bucket, lr) from the count statistics: the Laplace-smoothed
    log-likelihood ratio per bucket, rounded to 9dp (one ln per side —
    engines differ at most in the last ulp). Totals ride a broadcast
    crossJoin (the q11 threshold idiom); input and output are both
    <= n_buckets rows."""
    totals = per_bucket.agg(F.sum("ct").alias("tt"), F.sum("cr").alias("tr"))
    b = float(n_buckets)
    lr = F.round(
        F.log((F.col("ct") + F.lit(1.0)) / (F.col("tt") + F.lit(b)))
        - F.log((F.col("cr") + F.lit(1.0)) / (F.col("tr") + F.lit(b))),
        9,
    )
    return per_bucket.join(F.broadcast(totals)).select("bucket", lr.alias("lr"))


def bucket_models(
    corpus: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Fit both Laplace-smoothed bucket models in ONE aggregation:
    returns the broadcast-sized model table (bucket, lr) where
    lr = round(ln(p_target[b]) - ln(p_raw[b]), 9).

    ``target`` is a boolean Column over the corpus row (e.g.
    lang == 'en'): target counts are a conditional sum in the same
    groupBy, so the raw and target models cost one corpus pass
    together. Buckets no token hashed into still contribute their
    smoothed mass — the model table is densified to all n_buckets rows
    via the smoothing constants at lookup time, but only PRESENT
    buckets can ever be looked up, so the table stays <= n_buckets
    rows and omitting absent rows is exact."""
    return models_from_counts(
        bucket_counts(corpus, target, text_col, n_buckets), n_buckets
    )


def importance_logweights(
    corpus: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
    models: DataFrame | None = None,
) -> DataFrame:
    """(id, n_tokens, logw) for EVERY corpus document: logw =
    round(sum of lr over the doc's token occurrences, 3). Token-less
    documents report (0, 0.0) — a zero weight is 'indistinguishable
    from raw', the neutral element.

    ``models`` overrides the model table (bucket, lr) — the
    maintained-model path: counts folded incrementally (streaming or
    per-shard merge, see bucket_counts) score a batch without refitting
    from the corpus. Default fits from ``corpus``/``target`` directly.

    Plan: the model table is n_buckets rows (AQE broadcasts it; no
    explicit hint needed at this size, but one is safe since n_buckets
    is a construction-time constant, not data-driven) — the corpus
    token stream never shuffles for the lookup; the per-doc sum is one
    aggregation on the id."""
    if models is None:
        models = bucket_models(corpus, target, text_col, id_col, n_buckets)
    toks = corpus.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("t"),
    ).filter(F.col("t") != "")
    scored = (
        toks.select(id_col, feature_bucket(F.col("t"), n_buckets).alias("bucket"))
        .join(F.broadcast(models), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            # + 0.0 normalises IEEE -0.0 to +0.0: a doc whose ratio sum
            # rounds to zero from below hashes differently across
            # engines otherwise (found at sf0.1: one doc's sum rounded
            # to -0.0 in DuckDB and +0.0 in Spark)
            (F.round(F.sum("lr"), 3) + F.lit(0.0)).alias("logw"),
        )
    )
    return (
        corpus.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("logw", F.lit(0.0)).alias("logw"),
        )
    )


def gumbel_topk(
    logweights: DataFrame, k: int = 100, id_col: str = "doc_id"
) -> DataFrame:
    """Gumbel top-k resampling over (id, logw): key = logw + Gumbel
    noise from a deterministic md5 uniform; the k LARGEST keys are a
    without-replacement sample from softmax(logw) (Gumbel-max trick,
    public literature; the same determinism treatment as
    weighted_sample_aes — key rounded to 6dp, id tiebreak, ranks not
    floats exposed). Returns (id, rank), rank 1..k.

    Scale: one map pass computes keys; the top-k is a TakeOrdered under
    the row_number filter — per-partition heads, no full sort."""
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("dsirG:"), F.col(id_col).cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        + 1
    ) / F.lit(4294967296.0)
    gumbel = -F.log(-F.log(u))
    key = F.round(F.col("logw") + gumbel, 6)
    w = Window.orderBy(F.desc("_key"), F.asc(id_col))
    return (
        logweights.select(id_col, key.alias("_key"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank")
    )
