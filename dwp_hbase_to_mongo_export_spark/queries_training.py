"""Training-data pipeline operators beyond dedup/similarity/text-analysis:
deterministic sampling, document chunking, corpus mixing, and streaming
sessionization — the remaining staples of a 100 TB LLM-data pipeline.

Everything is reproducible BY CONSTRUCTION: sampling gates are md5-based
(not rand()), so a re-run — or another engine, which is how the DuckDB
oracle checks values — selects byte-identical rows. At 100 TB that
determinism is not a nicety: retries, backfills, and incremental reruns
must make the same keep/drop decision per document or downstream shards
drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import query
from .sources.parquet import load_table
from .streaming import incremental as streaming

# Portable per-row gate in [0, 100): first 8 md5 hex chars of the salted
# id, mod 100. Spark and DuckDB compute it bit-identically.
_GATE_SQL = "CAST(('0x' || substr(md5('{salt}' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100"


def _gate(salt: str) -> F.Column:
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), F.col("doc_id").cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 100
    )


_NORM = "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"


@query(
    "stratified_sample",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN len(text) < 200 THEN 'short'
                WHEN len(text) < 400 THEN 'medium'
                ELSE 'long' END AS stratum
    FROM documents
    WHERE {_GATE_SQL.format(salt='strat:')} <
          CASE WHEN len(text) < 200 THEN 50
               WHEN len(text) < 400 THEN 20
               ELSE 10 END
    """,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: per-stratum keep rates (50/20/10%
    by length bucket) applied through an md5 gate instead of rand().

    Scale: a map-only filter — no shuffle, no state, and the gate pushes
    into the scan's codegen stage. Unlike df.sampleBy (seeded rand per
    partition), the decision depends only on the row, so partition layout,
    retries, and cluster size never change the sample."""
    docs = load_table(spark, sf_dir, "documents")
    n = F.length("text")
    stratum = (
        F.when(n < 200, "short").when(n < 400, "medium").otherwise("long")
    )
    rate = F.when(n < 200, 50).when(n < 400, 20).otherwise(10)
    return docs.filter(_gate("strat:") < rate).select(
        "doc_id", stratum.alias("stratum")
    )


@query(
    "doc_token_chunks",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split({_NORM}, ' ') AS t
      FROM documents WHERE len({_NORM}) > 0
    ),
    st AS (
      SELECT doc_id, t, unnest(range(1, len(t)+1, 24)) AS start FROM toks
    )
    SELECT doc_id,
           CAST((start-1) // 24 AS INT) AS chunk_idx,
           len(t[start:least(start+31, len(t))]) AS n_tokens,
           array_to_string(t[start:least(start+31, len(t))], ' ') AS chunk_text
    FROM st
    """,
)
def doc_token_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (window 32, stride 24 — 8 tokens
    of overlap), the standard prep for fixed-context training examples.

    Scale: explode with BOUNDED fan-out (≤ ~len/stride chunks per doc) —
    one narrow projection, no shuffle; chunk rows inherit the input
    partitioning. The token array is materialised once per doc and
    sliced per chunk (slice is codegen'd), never re-tokenised."""
    from .functions.text import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    nt = normalize_text(F.col("text"))
    t = docs.select("doc_id", F.split(nt, " ").alias("t")).filter(
        F.length(nt) > 0
    )
    exploded = t.select(
        "doc_id",
        "t",
        F.explode(F.sequence(F.lit(1), F.size("t"), F.lit(24))).alias("start"),
    )
    chunk = F.slice(F.col("t"), F.col("start"), 32)
    return exploded.select(
        "doc_id",
        F.expr("CAST((start-1) div 24 AS INT)").alias("chunk_idx"),
        F.size(chunk).alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


@query(
    "corpus_mixture",
    oracle=f"""
    SELECT doc_id, 'web' AS source FROM documents
    WHERE doc_id % 2 = 0 AND {_GATE_SQL.format(salt='mix:web:')} < 30
    UNION ALL
    SELECT doc_id, 'books' AS source FROM documents
    WHERE doc_id % 2 = 1 AND {_GATE_SQL.format(salt='mix:books:')} < 70
    """,
)
def corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted corpus mixing: two sources (here the even/odd halves of
    documents standing in for distinct corpora) down-sampled at different
    rates (30% web / 70% books) into one training mix, with per-source
    md5 gates salted by source name so the draws are independent.

    Scale: a union of two map-only filters — each source is scanned once
    with its gate fused into the scan stage; no shuffle. Adding a corpus
    = one more union branch; reweighting = changing a literal, with every
    previously-kept row of an unchanged source still kept (monotone
    gates make mixture changes incremental, not full recomputes)."""
    docs = load_table(spark, sf_dir, "documents")
    web = (
        docs.filter((F.col("doc_id") % 2 == 0) & (_gate("mix:web:") < 30))
        .select("doc_id", F.lit("web").alias("source"))
    )
    books = (
        docs.filter((F.col("doc_id") % 2 == 1) & (_gate("mix:books:") < 70))
        .select("doc_id", F.lit("books").alias("source"))
    )
    return web.unionAll(books)


@query(
    "source_quota_cap",
    oracle=f"""
    SELECT doc_id, source
    FROM documents
    QUALIFY row_number() OVER (
      PARTITION BY source
      ORDER BY {_GATE_SQL.format(salt='quota:')}, doc_id
    ) <= 15
    """,
)
def source_quota_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document quota (the web-pipeline "cap each domain at
    N pages" rule): keep at most 15 docs per source, chosen by a
    DETERMINISTIC md5-hash order — partition layout, retries, and
    cluster size never change the kept set, unlike rand()-ordered
    caps.

    Scale: rank <= N over a window lets Spark's WindowGroupLimit
    (rank-limit pushdown) keep only N rows per source PER MAP PARTITION
    before the shuffle, so the exchange carries sources x N rows, not
    the corpus — check the plan for WindowGroupLimit, not a full sort."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(_gate("quota:"), F.col("doc_id"))
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 15)
        .select("doc_id", "source")
    )


@query(
    "source_token_budget_cap",
    oracle=f"""
    SELECT doc_id, source,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(sum(len(string_split(text, ' '))) OVER (
             PARTITION BY source
             ORDER BY {_GATE_SQL.format(salt='budget:')}, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_tokens
    FROM documents
    QUALIFY cum_tokens <= 600
    """,
)
def source_token_budget_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source TOKEN budget (the mixture-building "take ~B tokens
    from each source" rule): walk each source in deterministic md5-hash
    order and keep documents while the running token total stays within
    the budget (600 whitespace tokens here). Unlike the doc-count
    quota, the kept set adapts to document length — a source of long
    documents contributes fewer of them.

    Scale: one shuffle on source + a running-sum window; the survivor
    set is ~budget/avg_len docs per source, but the cumulative sum
    itself walks the full source partition — for a pathologically hot
    source, pre-gate with a rate filter (stratified_sample's discipline)
    sized so the surviving stream still overshoots the budget, then
    budget-cap exactly."""
    docs = load_table(spark, sf_dir, "documents")
    ntok = F.size(F.split(F.col("text"), " ")).cast("bigint")
    w = (
        Window.partitionBy("source")
        .orderBy(_gate("budget:"), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.select(
            "doc_id",
            "source",
            ntok.alias("n_tokens"),
            F.sum(ntok).over(w).alias("cum_tokens"),
        )
        .filter(F.col("cum_tokens") <= 600)
    )


@query(
    "sequence_packing",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN len({_NORM}) = 0 THEN 0
                  ELSE len(string_split({_NORM}, ' ')) END AS n_tokens,
             {_GATE_SQL.format(salt='pack:')} % 8 AS shard
      FROM documents
    ),
    w AS (
      SELECT doc_id, shard, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
      FROM toks
    )
    SELECT shard, CAST(before // 512 AS BIGINT) AS bin_idx,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM w GROUP BY 1, 2
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into fixed token-budget training bins (512 tokens
    here) — the step that turns a filtered/deduped corpus into
    dense fixed-context training examples.

    Packing is OFFSET BINNING: bin = floor(tokens_before / budget) over
    a deterministic doc order — the prefix-sum form of greedy packing
    (a bin may overhang by at most one document, which the consumer
    truncates or splits; exact close-on-overflow packing is inherently
    sequential and not worth a stateful pass at corpus scale).

    Scale: a GLOBAL ordered prefix sum would serialise the corpus
    through one window partition — the classic global-window bottleneck
    — so the corpus is first split into md5-sharded streams (shards are
    deterministic and independent, like the sampling gates above) and
    each shard packs in parallel; bin ids are (shard, bin_idx). This is
    exactly how a multi-worker packer shards at 100 TB."""
    from .functions.text import normalize_text
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    nt = normalize_text(F.col("text"))
    toks = docs.select(
        "doc_id",
        F.when(F.length(nt) == 0, F.lit(0))
        .otherwise(F.size(F.split(nt, " ")))
        .cast("bigint")
        .alias("n_tokens"),
        (_gate("pack:") % 8).alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binned = toks.withColumn(
        "bin_idx",
        F.floor(F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / 512).cast("bigint"),
    )
    return binned.groupBy("shard", "bin_idx").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@query(
    "train_val_split",
    oracle=f"""
    SELECT doc_id, source,
           CASE WHEN CAST(('0x' || substr(md5('split:' || {_NORM}), 1, 8)) AS BIGINT) % 100 < 90
                THEN 'train' ELSE 'val' END AS split
    FROM documents
    """,
)
def train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/10 train/validation split, keyed on the
    NORMALISED CONTENT (md5 of the whitespace/punct-normalised text),
    not the row id — so exact and whitespace-variant duplicates always
    land in the SAME split, closing the most common train/val leakage
    hole. (For near-dup safety, gate on the dedup-cluster keeper id from
    dedup_clusters instead — same construction, one extra join.)

    Scale: map-only; the gate is a codegen'd expression fused into the
    scan — no shuffle, no state, reproducible across engines, retries,
    and cluster sizes (the reason to avoid rand(), as with the sampling
    gates above)."""
    from .functions.text import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    gate = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split:"), normalize_text(F.col("text")))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    return docs.select(
        "doc_id",
        "source",
        F.when(gate < 90, "train").otherwise("val").alias("split"),
    )


@query(
    "corpus_global_shuffle",
    oracle="""
    SELECT doc_id,
           substr(md5('shuffle:42:' || CAST(doc_id AS VARCHAR)), 1, 16) AS shuffle_key,
           CAST(CAST(('0x' || substr(md5('shuffle:42:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 32 AS INT) AS shard
    FROM documents
    """,
)
def corpus_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded global training-order shuffle: every document gets a
    deterministic md5-derived shuffle key (seed 42 in the salt) and a
    shard assignment; range-repartitioning by the key then sorting
    within partitions yields a full random-but-reproducible corpus
    order — the step before sequence_packing fixes the token stream.

    Scale: ONE range shuffle (repartitionByRange samples key quantiles,
    so output files are evenly sized regardless of input skew), then a
    partition-local sort — never a global orderBy through one reducer.
    Reshuffling with a new seed is a salt change; the md5 key means the
    order is identical on any cluster size or retry."""
    docs = load_table(spark, sf_dir, "documents")
    key = F.substring(
        F.md5(F.concat(F.lit("shuffle:42:"), F.col("doc_id").cast("string"))), 1, 16
    )
    shard = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("shuffle:42:"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 32
    ).cast("int")
    keyed = docs.select(
        "doc_id", key.alias("shuffle_key"), shard.alias("shard")
    )
    return keyed.repartitionByRange(8, "shuffle_key").sortWithinPartitions(
        "shuffle_key"
    )


@query(
    "streaming_session_windows",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 1 HOUR OR
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events)
    ),
    numbered AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM ordered
    )
    SELECT user_id,
           epoch_us(min(ts)) AS session_start_us,
           epoch_us(max(ts) + INTERVAL 1 HOUR) AS session_end_us,
           count(*) AS n_events
    FROM numbered GROUP BY user_id, session_id
    """,
)
def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization AS A STREAM: session_window + watermark over
    readStream, driven to completion with AvailableNow — must equal the
    batch session_windows result (same oracle). This is the dynamic-gap
    stateful window (state merges as late events bridge sessions), the
    streaming op the tumbling-window query can't express."""
    s = streaming.session_window_counts(spark, sf_dir, gap="1 hour", watermark="2 days")
    return streaming.run_available_now(s)


_GATE10K_SQL = "CAST(('0x' || substr(md5('{salt}' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000"


@query(
    "corpus_temperature_mix",
    oracle=f"""
    WITH stats AS (
      SELECT source, count(*) AS n_docs, sum(n_chars) AS mass
      FROM documents GROUP BY source
    ),
    tot AS (SELECT sum(sqrt(mass)) AS total_w, sum(n_docs) AS n_total FROM stats),
    thr AS (
      SELECT source, n_docs,
             CAST(round(10000 * least(1.0,
               (0.5 * t.n_total * sqrt(mass) / t.total_w) / n_docs)) AS BIGINT)
               AS threshold
      FROM stats CROSS JOIN tot t
    ),
    kept AS (
      SELECT d.source, count(*) AS n_kept
      FROM documents d JOIN thr ON thr.source = d.source
      WHERE {_GATE10K_SQL.format(salt='mixT:')} < thr.threshold
      GROUP BY d.source
    )
    SELECT t.source, t.n_docs, COALESCE(k.n_kept, 0) AS n_kept, t.threshold
    FROM thr t LEFT JOIN kept k ON k.source = t.source
    """,
)
def corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted domain mixture (the count^alpha reweighting
    of multilingual/multi-domain LM training — public literature, e.g.
    the alpha-sampling of GPT/NLLB data pipelines; alpha=0.5 via sqrt so
    both engines' pow is correctly-rounded IEEE): per-source sampling
    rates are derived FROM the corpus (source token mass), small sources
    are up-weighted relative to their share, and each document passes a
    deterministic md5 gate against its source's 1e4-resolution
    threshold. Returns (source, n_docs, n_kept, threshold).

    Scale: two corpus passes — one map-side-combined (source) stats
    aggregation (|sources| rows, broadcast back), one map-only gated
    scan. The gate threshold is data-derived but per-SOURCE, so the
    second pass is still a fused scan filter; re-weighting (new alpha)
    changes only the tiny stats join side."""
    docs = load_table(spark, sf_dir, "documents")
    stats = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("mass")
    )
    tot = stats.agg(
        F.sum(F.sqrt("mass")).alias("total_w"), F.sum("n_docs").alias("n_total")
    )
    rate = (0.5 * F.col("n_total") * F.sqrt("mass") / F.col("total_w")) / F.col(
        "n_docs"
    )
    thr = (
        stats.join(F.broadcast(tot))
        .withColumn(
            "threshold",
            F.round(10000 * F.least(F.lit(1.0), rate)).cast("bigint"),
        )
        .select("source", "n_docs", "threshold")
    )
    gate = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("mixT:"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % 10000
    )
    kept = (
        docs.join(F.broadcast(thr), "source")
        .filter(gate < F.col("threshold"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        thr.join(kept, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            "threshold",
        )
    )


@query(
    "weighted_sample_aes",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             CAST(('0x' || substr(md5('aes:' || CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) AS hv
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, rank FROM (
      SELECT doc_id,
             row_number() OVER (
               ORDER BY round(-ln((hv + 1) / 4294967296.0) / n_chars, 9),
                        doc_id) AS rank
      FROM keyed
    ) WHERE rank <= 100
    """,
)
def weighted_sample_aes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED sampling WITHOUT replacement (Efraimidis/Spirakis 2006
    A-ES, public literature): each document draws an exponential key
    e_i = -ln(u_i)/w_i from a deterministic md5 uniform u_i and its
    weight (n_chars — longer documents proportionally likelier); the k
    smallest keys ARE a weighted sample without replacement — the
    size-k pick a mixture pipeline uses when per-source Bernoulli gates
    (stratified_sample / corpus_temperature_mix) can't hit an exact
    budget. The md5 uniform makes the draw reproducible by construction
    (retries and both engines agree); the sort key is rounded to 9 dp
    before ranking with an id tiebreak so a last-ulp libm ln()
    difference between engines cannot flip an ordering, and the output
    exposes ranks, not floats, so no value is FP-sensitive.

    Scale: one map pass computes keys; the global smallest-k is a
    TakeOrdered (per-partition heads + driver merge) under the
    row_number filter — no full sort, no shuffle of the corpus."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("aes:"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        + 1
    ) / F.lit(4294967296.0)
    key = F.round(-F.log(u) / F.col("n_chars"), 9)
    return (
        docs.select("doc_id", key.alias("_k"))
        .withColumn("rank", F.row_number().over(Window.orderBy(F.asc("_k"), F.asc("doc_id"))))
        .filter(F.col("rank") <= 100)
        .select("doc_id", "rank")
    )


# --- DSIR importance resampling (operators/dsir.py) -------------------------
# Shared oracle CTE chain: tokens -> hashed buckets -> the two
# Laplace-smoothed bucket models in one grouped pass -> per-doc
# log-weights. Mirrored op-for-op from dsir.bucket_models /
# importance_logweights (per-bucket log-ratio rounded 9dp, per-doc sum
# rounded 3dp, target slice = lang 'en').

_DSIR_CTES = f"""
    tok AS (
      SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS t
      FROM documents WHERE len({_NORM}) > 0
    ),
    bt AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5('dsir:' || t), 1, 8)) AS BIGINT) % 1024
               AS bucket
      FROM tok WHERE t <> ''
    ),
    flag AS (SELECT doc_id, (lang = 'en') AS is_t FROM documents),
    pb AS (
      SELECT bucket,
             sum(CASE WHEN f.is_t THEN 1 ELSE 0 END) AS ct,
             count(*) AS cr
      FROM bt JOIN flag f USING (doc_id)
      GROUP BY bucket
    ),
    tot AS (SELECT sum(ct) AS tt, sum(cr) AS tr FROM pb),
    models AS (
      SELECT bucket,
             round(ln((ct + 1.0) / (tt + 1024.0))
                   - ln((cr + 1.0) / (tr + 1024.0)), 9) AS lr
      FROM pb CROSS JOIN tot
    ),
    scored AS (
      -- + 0.0 normalises -0.0 (see dsir.importance_logweights)
      SELECT b.doc_id, count(*) AS n_tokens,
             round(sum(m.lr), 3) + 0.0 AS logw
      FROM bt b JOIN models m USING (bucket)
      GROUP BY b.doc_id
    ),
    wts AS (
      SELECT d.doc_id,
             COALESCE(s.n_tokens, 0) AS n_tokens,
             COALESCE(s.logw, 0.0) AS logw
      FROM (SELECT doc_id FROM documents) d
      LEFT JOIN scored s USING (doc_id)
    )
"""


@query(
    "dsir_importance_weights",
    oracle=f"WITH {_DSIR_CTES} SELECT doc_id, n_tokens, logw FROM wts",
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR stage 1+2 (operators/dsir.py, Xie et al. 2023): hashed
    unigram bucket features, target (lang='en') vs raw bucket models
    fitted in ONE corpus pass, per-document importance log-weight =
    sum of per-bucket log-likelihood ratios over the doc's tokens. A
    positive logw reads 'more target-like than raw'. The weight table
    is what a curation pipeline persists; resampling (dsir_resample)
    consumes it.

    Scale: the model table is 1024 rows by construction (feature
    hashing) — broadcast; the corpus token stream never shuffles for
    the model lookup; per-doc sum is one aggregation on doc_id."""
    from .operators import dsir

    docs = load_table(spark, sf_dir, "documents")
    return dsir.importance_logweights(docs, F.col("lang") == "en")


@query(
    "dsir_resample",
    oracle=f"""
    WITH {_DSIR_CTES},
    keyed AS (
      SELECT doc_id,
             round(logw + (- ln(- ln(
               (CAST(('0x' || substr(md5('dsirG:' || CAST(doc_id AS VARCHAR)),
                                     1, 8)) AS BIGINT) + 1) / 4294967296.0
             ))), 6) AS k
      FROM wts
    )
    SELECT doc_id, rank FROM (
      SELECT doc_id, row_number() OVER (ORDER BY k DESC, doc_id) AS rank
      FROM keyed
    ) WHERE rank <= 100
    """,
)
def dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR stage 3 (operators/dsir.py): Gumbel top-k resampling of the
    importance weights — a WITHOUT-replacement draw of 100 documents
    from softmax(logw) via the Gumbel-max trick, deterministic because
    the Gumbel uniforms are md5-derived (the weighted_sample_aes
    treatment: key rounded 6dp, doc-id tiebreak, ranks exposed).

    Scale: keys are one map pass over the doc-count weight table; the
    top-k is a TakeOrdered (per-partition heads + driver merge), no
    full sort, no corpus rescan — stages 1+2 already reduced 100 TB of
    text to one row per document."""
    from .operators import dsir

    docs = load_table(spark, sf_dir, "documents")
    w = dsir.importance_logweights(docs, F.col("lang") == "en")
    return dsir.gumbel_topk(w, k=100)


@query(
    "streaming_dsir_weights",
    oracle=f"WITH {_DSIR_CTES} SELECT doc_id, n_tokens, logw FROM wts",
)
def streaming_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DSIR bucket-model statistics maintained INCREMENTALLY over
    the document stream (streaming/incremental.dsir_counts_stream:
    bucket-wise SUM fold, <= 1024 rows of state), then the batch
    documents scored against the drained models — two plans, ONE oracle
    with dsir_importance_weights (the streaming_quantiles_hist
    discipline): the counts relation merges exactly, so a nightly model
    refresh is one pass over the new batch and never a corpus refit,
    and the weights it produces are bit-identical to fitting from
    scratch."""
    from .operators import dsir
    from .streaming import incremental as streaming

    counts = streaming.run_available_now(
        streaming.dsir_counts_stream(spark, sf_dir)
    )
    models = dsir.models_from_counts(counts)
    docs = load_table(spark, sf_dir, "documents")
    return dsir.importance_logweights(
        docs, F.col("lang") == "en", models=models
    )


@query(
    "corpus_epoch_plan",
    oracle=f"""
    WITH stats AS (
      SELECT source,
             CAST(sum(CASE WHEN len({_NORM}) = 0 THEN 0
                      ELSE len(string_split({_NORM}, ' ')) END) AS BIGINT)
               AS n_tokens
      FROM documents GROUP BY source
    ),
    tot AS (SELECT sum(sqrt(n_tokens)) AS total_w FROM stats),
    plan AS (
      SELECT source, n_tokens,
             round(sqrt(n_tokens) / t.total_w, 9) AS weight
      FROM stats CROSS JOIN tot t
    )
    SELECT source, n_tokens, weight,
           round(least(4.0, 1000000 * weight / n_tokens), 3) AS epochs,
           round(least(4.0, 1000000 * weight / n_tokens) * n_tokens, 1)
             AS effective_tokens,
           (1000000 * weight / n_tokens) > 4.0 AS capped
    FROM plan
    """,
)
def corpus_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch planning for a token budget: given a total training budget
    (1e6 tokens here) and temperature weights (count^0.5 — the same
    alpha-sampling as corpus_temperature_mix), compute how many EPOCHS
    of each source the mixture implies — the repetition planning a
    multi-source pretraining run does when up-weighted small sources
    can't supply their target mass in unique tokens (public scaling-law
    practice caps useful repetition; max_epochs=4 here). A capped
    source marks unmet budget the mixer must redistribute or accept.
    Returns (source, n_tokens, weight, epochs, effective_tokens,
    capped).

    Scale: one tokenise pass folded map-side to |sources| rows; the
    plan arithmetic is a broadcast crossJoin with the one-row total —
    corpus never shuffles. The output is the config artifact a sampler
    (corpus_mixture / weighted_sample) consumes."""
    docs = load_table(spark, sf_dir, "documents")
    from .functions.text import normalize_text

    nt = normalize_text(F.col("text"))
    per_doc = docs.select(
        "source",
        F.when(F.length(nt) == 0, F.lit(0))
        .otherwise(F.size(F.split(nt, " ")))
        .alias("_tok"),
    )
    stats = per_doc.groupBy("source").agg(
        F.sum("_tok").cast("bigint").alias("n_tokens")
    )
    tot = stats.agg(F.sum(F.sqrt("n_tokens")).alias("total_w"))
    weight = F.round(F.sqrt("n_tokens") / F.col("total_w"), 9)
    plan = stats.join(F.broadcast(tot)).select(
        "source", "n_tokens", weight.alias("weight")
    )
    ep = F.least(F.lit(4.0), F.lit(1000000) * F.col("weight") / F.col("n_tokens"))
    return plan.select(
        "source",
        "n_tokens",
        "weight",
        F.round(ep, 3).alias("epochs"),
        F.round(ep * F.col("n_tokens"), 1).alias("effective_tokens"),
        (F.lit(1000000) * F.col("weight") / F.col("n_tokens") > F.lit(4.0)).alias(
            "capped"
        ),
    )
