"""Bounded edit-distance (fuzzy) dedup: EXACT all-pairs
``levenshtein(a, b) <= k`` over a document corpus WITHOUT the all-pairs
blow-up — the edit-distance member of the dedup family, between exact
hash dedup (distance 0) and the jaccard/minhash families (set
similarity, no positional guarantee).

Algorithm (public literature): q-gram prefix filtering for edit
distance — Gravano et al. 2001 ("Approximate string joins in a
database (almost) for free", VLDB) for the q-gram count bound, Xiao
et al. 2008 (Ed-Join, VLDB) for the prefix-filter formulation, and
Chaudhuri/Ganti/Kaushik 2006 for the prefix-filter principle itself.

The lossless candidate argument, as implemented here (set semantics —
the conservative variant whose prefix theorem is the same one
jaccard_prefix_filter_pairs already relies on):

* One edit operation touches at most ``q`` of a string's q-grams, so
  ``ed(s, t) <= k`` destroys at most ``q*k`` gram OCCURRENCES per
  side; every surviving occurrence of ``s`` appears verbatim in
  ``t`` (and vice versa). Hence, per side, the DISTINCT-gram overlap
  satisfies ``|set(s) ∩ set(t)| >= |set(side)| - q*k``.
* Prefix filter (overlap form): order every document's distinct grams
  by one global total order (document-frequency ASC, gram — rare
  first) and keep the first ``min(q*k + 1, |set|)`` as its PREFIX.
  With required overlap ``o = max(|set(s)|, |set(t)|) - q*k``, the
  needed prefix length on each side is ``|set| - o + 1 <= q*k + 1``,
  so whenever ``o >= 1`` a qualifying pair MUST share a prefix gram.
* The one hole: a pair where BOTH sides have ``<= q*k`` distinct
  grams has ``o <= 0`` and no shared-gram guarantee at all. Those
  SHORT documents are routed through a length-bucket all-pairs path
  (bucket width ``k``; a qualifying pair differs by at most ``k``
  characters of length, so it lands in the same or adjacent bucket).
  On real corpora this pool is empty or tiny — it exists for
  correctness, not throughput — and its cost is quadratic only
  WITHIN the short pool.

Every candidate from either path is then verified with Spark's
BANDED levenshtein (``F.levenshtein(a, b, threshold)`` — O(k*n) per
pair, JVM-side), so false positives cost a bounded verify and false
negatives cannot exist by the theorem + the short-pool fallback.

Spark shape, 100 TB honest: the document-frequency table is
vocabulary-sized (one groupBy over the gram stream); per-doc prefix
selection is a window PARTITIONED BY DOCUMENT (never a global sort);
the candidate join is an equi-join on prefix grams only, with the
length predicate applied inside the join; verification is
candidate-sized. No all-pairs anywhere outside the (by-construction
tiny) short pool, and no Python in any hot path.

Reference parity note: the reference engine
(uk-gov-mirror/dwp.hbase-to-mongo-export) has no fuzzy matching — this
module is part of the training-data-pipeline extension surface, like
operators/dedup.py and operators/spandedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# The second LOSSLESS prefilter, shared with the DuckDB oracle: one
# edit operation changes any single character's count by at most 1 (a
# substitution changes two characters' counts by 1 each), so for ANY
# fixed character subset the L1 distance of the per-character counts is
# <= 2k whenever ed <= k. The subset below is corpus-agnostic (common
# English characters); the bound holds for any text distribution — a
# poorly-matched subset only prunes less, never wrongly.
_HIST_CHARS = (" ", "a", "e", "t", "s", "r", "l", "n", "o", "k", "w", "h")


def _hist(text: Column) -> Column:
    return F.array(
        *[
            (F.length(text) - F.length(F.replace(text, F.lit(c)))).cast("int")
            for c in _HIST_CHARS
        ]
    )


def _hist_band(ha: str, hb: str, k: int) -> Column:
    return (
        F.expr(
            f"aggregate(zip_with({ha}, {hb}, (x, y) -> abs(x - y)), "
            "0, (acc, v) -> acc + v)"
        )
        <= 2 * k
    )


def _staged(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    normalise: bool = False,
    q: int | None = None,
) -> DataFrame:
    """``normalise=True`` measures distance between NORMALISED forms
    (functions.text.normalize_text: lower, non-alnum to space, squeeze,
    trim — the catalog's shared chain, oracle-mirrored by _NORM_FULL):
    the edit-distance family's policy dial, matching the span family's
    strict-vs-normalised matching (spandedup). Boilerplate differing
    only in case/punctuation then reads as distance 0-ish instead of
    punctuation-count.

    With ``q`` set, also stages ``_grams`` — each document's DISTINCT
    character q-grams as an ARRAY column (``array_distinct`` over a
    per-row transform). Computing distinctness inside the row replaces
    the old explode + global ``.distinct()`` (a full gram-stream
    shuffle) with zero shuffles; documents shorter than q stage an
    empty array (they are short-pool by definition — the old code's
    descending ``sequence(1, 0)`` emitted truncated junk grams for
    them, which matched nothing at q chars and only added work).

    The text expression is staged in its OWN projection first: ``_len``
    / ``_hist`` / ``_grams`` reference it ~14x, and CollapseProject
    keeps non-cheap multi-use projections apart, so a normalised chain
    evaluates once per row instead of once per use. The raw (id, text)
    projection is spread to the session's parallelism BEFORE any of
    that heavy row work (spread_scan: a no-op on real multi-row-group
    corpora; on a small single-row-group scan it stops the whole
    staging chain from serialising on one core)."""
    from .partitioning import spread_scan

    raw = docs.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_raw"))
    raw = spread_scan(raw, "_id")
    t = F.col("_raw")
    if normalise:
        from ..functions.text import normalize_text

        t = normalize_text(t)
    staged = raw.select("_id", t.alias("_t"))
    tt = F.col("_t")
    cols = [
        F.col("_id"),
        tt,
        F.length(tt).alias("_len"),
        _hist(tt).alias("_hist"),
    ]
    if q is not None:
        cols.append(
            F.when(
                F.length(tt) >= q,
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.length(tt) - (q - 1)),
                        lambda i: tt.substr(i, F.lit(q)),
                    )
                ),
            )
            .otherwise(F.array().cast("array<string>"))
            .alias("_grams")
        )
    return staged.select(*cols)


def _prefix_emit(
    staged: DataFrame, q: int, k: int, frozen_df: DataFrame | None = None
) -> DataFrame:
    """(_id, g): each document's rare-first PREFIX grams — the q*k+1
    smallest under the (document-frequency ASC, gram ASC) total order
    for long documents, the FULL distinct-gram set for short ones
    (<= q*k distinct grams, where the slice is a no-op because the
    whole set fits inside it).

    One aggregate per document replaces the old row_number/count window
    pair: ``slice(array_sort(collect_list(struct(_df, g))), 1, q*k+1)``
    selects the same prefix set (struct sort = (_df, g) lexicographic,
    g unique per doc so the order is total) with a hash aggregate
    instead of a whole-partition sort, and _nset never needs a second
    window (it is ``size(_grams)`` on the staged side).

    ``frozen_df`` switches to a durable store's FROZEN gram order
    (editindex.py contract): a left join where unseen grams rank
    rarest (df 0)."""
    grams = staged.select("_id", F.explode("_grams").alias("g"))
    if frozen_df is None:
        dfreq = grams.groupBy("g").agg(F.count(F.lit(1)).alias("_df"))
        joined = grams.join(dfreq, "g")
    else:
        joined = grams.join(frozen_df, "g", "left").withColumn(
            "_df", F.coalesce("_df", F.lit(0))
        )
    pfx = joined.groupBy("_id").agg(
        F.slice(
            F.array_sort(F.collect_list(F.struct(F.col("_df"), F.col("g")))),
            1,
            q * k + 1,
        ).alias("_pfx")
    )
    return pfx.select("_id", F.explode("_pfx").alias("_e")).select(
        "_id", F.col("_e.g").alias("g")
    )


def _qgrams(docs: DataFrame, text_col: str, id_col: str, q: int) -> DataFrame:
    """Distinct character q-grams per document: (id, g, len)."""
    staged = _staged(docs, text_col, id_col, q=q)
    return staged.select(
        F.col("_id").alias(id_col), F.explode("_grams").alias("g"), "_len"
    ).select(id_col, "g", "_len")


def _banded_distance(a: Column, b: Column, k: int) -> Column:
    """Thresholded levenshtein: the distance when <= k, else NULL.

    Spark's 3-arg levenshtein runs the banded O(k*n) algorithm and
    returns -1 above the threshold — mapped to NULL here so callers
    filter with a plain isNotNull.
    """
    d = F.levenshtein(a, b, k)
    return F.when(d >= 0, d)


def edit_distance_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    q: int = 4,
    normalise: bool = False,
) -> DataFrame:
    """All pairs (id_a < id_b) with levenshtein(text_a, text_b) <= k
    (``normalise=True``: distance between the normalised forms — the
    family's policy dial, see _staged).

    Returns (id_a, id_b, dist) — exact, by prefix-filter theorem plus
    the short-pool fallback (module docstring). ``q*k`` must stay
    small relative to typical document length for the filter to bite;
    the results are exact regardless.
    """
    if k < 0:
        raise ValueError("k must be >= 0")
    if q < 2:
        raise ValueError("q must be >= 2 (q=1 grams carry no position signal)")

    # the staged frame (text + len + hist + the per-doc gram ARRAY) is
    # persisted once (operator-scoped slot): it feeds the dfreq
    # aggregate, the prefix probe, the short pool, AND both verify text
    # sides — without the persist the gram arrays (the family's
    # dominant row work) are recomputed once per consumer, which is
    # exactly the cost class the old distinct-Exchange reuse used to
    # absorb
    from ._cache import swap_cache

    base = swap_cache(
        "editdist.base", _staged(docs, text_col, id_col, normalise=normalise, q=q)
    )

    # ONE emission stream serves every gram-path pair shape: long docs
    # (> q*k distinct grams) emit their q*k+1 rare-first PREFIX, short
    # docs emit their FULL gram set (|set| <= q*k < q*k + 1, so the full
    # set IS the needed prefix — _prefix_emit's slice covers both
    # cases in one expression). The per-doc features join AFTER the
    # prefix filter so the verify attributes ride only prefix-sized
    # rows (docs-sized join — AQE broadcasts it at test scale, shuffles
    # on id beyond that). The emission stream is persisted too: it
    # feeds both sides of the candidate self-join plus the short-pool
    # id derivation.
    emit = _prefix_emit(base, q, k).join(
        base.select(
            "_id", F.size("_grams").alias("_nset"), "_len", "_hist"
        ),
        "_id",
    )
    emit = swap_cache("editdist.emit", emit)

    def _side(g: DataFrame, tag: str) -> DataFrame:
        return g.select(
            F.col("_id").alias(f"id_{tag}"),
            "g",
            F.col("_len").alias(f"_len_{tag}"),
            F.col("_hist").alias(f"_hist_{tag}"),
        )

    # every candidate path applies BOTH lossless bands inside the join,
    # BEFORE the distinct — on low-entropy corpora even rare-first
    # prefix grams are common, and the histogram band is what keeps the
    # distinct (and the verify) candidate-sized rather than
    # shared-gram-sized
    pair_pred = (
        (F.col("id_a") < F.col("id_b"))
        & (F.abs(F.col("_len_a") - F.col("_len_b")) <= k)
        & _hist_band("_hist_a", "_hist_b", k)
    )
    cand_gram = (
        _side(emit, "a").join(_side(emit, "b"), "g")
        .filter(pair_pred)
        .select("id_a", "id_b")
    )

    # -- short-short path: length-bucket all-pairs — needed because two
    # docs BOTH at <= q*k distinct grams can be within distance k while
    # sharing no gram at all (every occurrence edited). Docs shorter
    # than q have no gram rows and belong to this pool too. Short docs
    # emit their FULL gram set, so the persisted emit stream (not the
    # full ranked stream) is enough to identify them.
    short_ids = (
        emit.filter(F.col("_nset") <= q * k)
        .select("_id")
        .distinct()
        .unionByName(base.filter(F.col("_len") < q).select("_id"))
    )
    shorts = base.join(short_ids, "_id", "left_semi").select(
        "_id",
        "_len",
        "_hist",
        F.floor(F.col("_len") / (k + 1)).alias("_bkt"),
    )
    # a qualifying pair has |len_a - len_b| <= k, so with bucket width
    # k+1 it sits in the same or an ADJACENT bucket — and the id order
    # (id_a < id_b) says nothing about which side's bucket is smaller,
    # so the probe side must emit all three neighbours; the duplicate
    # candidates this generates collapse in the distinct() below.
    sh_a = shorts.select(
        F.col("_id").alias("id_a"),
        F.col("_len").alias("_len_a"),
        F.col("_hist").alias("_hist_a"),
        "_bkt",
    )
    sh_b = shorts.select(
        F.col("_id").alias("id_b"),
        F.col("_len").alias("_len_b"),
        F.col("_hist").alias("_hist_b"),
        F.explode(
            F.array(F.col("_bkt") - 1, F.col("_bkt"), F.col("_bkt") + 1)
        ).alias("_bkt"),
    )
    cand_short = sh_a.join(sh_b, "_bkt").filter(pair_pred).select("id_a", "id_b")

    cand = cand_gram.unionByName(cand_short).distinct()

    ta = base.select(F.col("_id").alias("id_a"), F.col("_t").alias("_ta"))
    tb = base.select(F.col("_id").alias("id_b"), F.col("_t").alias("_tb"))
    return (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn("dist", _banded_distance(F.col("_ta"), F.col("_tb"), k))
        .filter(F.col("dist").isNotNull())
        .select("id_a", "id_b", F.col("dist").cast("int").alias("dist"))
    )


def edit_screen_batch(
    corpus: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    q: int = 4,
    normalise: bool = False,
) -> DataFrame:
    """Incremental form: EXACT edit-distance screening of a NEW batch
    against an accepted corpus — (batch_id, dup_of, dist) for every
    cross pair within distance k. Ids must be disjoint across the two
    inputs (the family's incremental contract, as in
    dedupindex.query_dedup_index).

    Same lossless machinery as edit_distance_pairs (one shared
    rare-first gram order computed over the UNION — any single global
    order is valid for the prefix theorem; sharing it lets one
    window/join pass serve both sides), but the candidate join is
    side-aware: batch-prefix x corpus-prefix only, so screening a small
    batch never pays the corpus x corpus candidate (or verify) cost —
    cross-pair work is what a nightly ingest actually buys.
    """
    if k < 0:
        raise ValueError("k must be >= 0")
    if q < 2:
        raise ValueError("q must be >= 2 (q=1 grams carry no position signal)")

    from ._cache import swap_cache

    # persist the tagged union once (see edit_distance_pairs): it feeds
    # dfreq, the prefix probe, the short pool, and both verify sides
    tagged = swap_cache(
        "editdist.tagged",
        _staged(corpus, text_col, id_col, normalise=normalise, q=q)
        .withColumn("_probe", F.lit(False))
        .unionByName(
            _staged(batch, text_col, id_col, normalise=normalise, q=q).withColumn(
                "_probe", F.lit(True)
            )
        ),
    )

    emit = _prefix_emit(tagged, q, k).join(
        tagged.select(
            "_id", F.size("_grams").alias("_nset"), "_len", "_hist", "_probe"
        ),
        "_id",
    )
    emit = swap_cache("editdist.screen", emit)

    band_pred = (F.abs(F.col("_len_a") - F.col("_len_b")) <= k) & _hist_band(
        "_hist_a", "_hist_b", k
    )
    ea = emit.filter(F.col("_probe")).select(
        F.col("_id").alias("id_a"),
        "g",
        F.col("_len").alias("_len_a"),
        F.col("_hist").alias("_hist_a"),
    )
    eb = emit.filter(~F.col("_probe")).select(
        F.col("_id").alias("id_b"),
        "g",
        F.col("_len").alias("_len_b"),
        F.col("_hist").alias("_hist_b"),
    )
    cand_gram = ea.join(eb, "g").filter(band_pred).select("id_a", "id_b")

    short_ids = (
        emit.filter(F.col("_nset") <= q * k)
        .select("_id")
        .distinct()
        .unionByName(tagged.filter(F.col("_len") < q).select("_id"))
    )
    shorts = tagged.join(short_ids, "_id", "left_semi").select(
        "_id",
        "_len",
        "_hist",
        "_probe",
        F.floor(F.col("_len") / (k + 1)).alias("_bkt"),
    )
    sh_a = shorts.filter(F.col("_probe")).select(
        F.col("_id").alias("id_a"),
        F.col("_len").alias("_len_a"),
        F.col("_hist").alias("_hist_a"),
        "_bkt",
    )
    sh_b = shorts.filter(~F.col("_probe")).select(
        F.col("_id").alias("id_b"),
        F.col("_len").alias("_len_b"),
        F.col("_hist").alias("_hist_b"),
        F.explode(
            F.array(F.col("_bkt") - 1, F.col("_bkt"), F.col("_bkt") + 1)
        ).alias("_bkt"),
    )
    cand_short = sh_a.join(sh_b, "_bkt").filter(band_pred).select("id_a", "id_b")

    cand = cand_gram.unionByName(cand_short).distinct()
    # verify texts come from the persisted tagged frame (its _t is the
    # MATCHING form already), not a re-staging of the raw inputs
    ta = tagged.filter(F.col("_probe")).select(
        F.col("_id").alias("id_a"), F.col("_t").alias("_ta")
    )
    tb = tagged.filter(~F.col("_probe")).select(
        F.col("_id").alias("id_b"), F.col("_t").alias("_tb")
    )
    return (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn("dist", _banded_distance(F.col("_ta"), F.col("_tb"), k))
        .filter(F.col("dist").isNotNull())
        .select(
            F.col("id_a").alias(id_col),
            F.col("id_b").alias("dup_of"),
            F.col("dist").cast("int").alias("dist"),
        )
    )


def edit_distance_keep_first(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    q: int = 4,
) -> DataFrame:
    """Single-pass near-dup removal: drop every document that has a
    SMALLER-id neighbour within edit distance k (the standard keep-first
    policy of LSH dedup pipelines — direct dominance, not transitive
    closure; operators/components.py provides the closure when cluster
    semantics are wanted)."""
    pairs = edit_distance_pairs(docs, text_col, id_col, k=k, q=q)
    doomed = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return docs.join(doomed, id_col, "left_anti")


def edit_distance_report(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    k: int = 8,
    q: int = 4,
) -> DataFrame:
    """Per-(source_a, source_b) near-dup monitoring: pair counts and
    distance stats, the governance surface for the edit-distance family
    (span_dedup_report's sibling). Source pairs are reported with
    source_a <= source_b so cross-source duplication is counted once."""
    pairs = edit_distance_pairs(docs, text_col, id_col, k=k, q=q)
    src = docs.select(F.col(id_col), F.col(source_col))
    joined = (
        pairs.join(
            src.select(
                F.col(id_col).alias("id_a"), F.col(source_col).alias("_sa")
            ),
            "id_a",
        )
        .join(
            src.select(
                F.col(id_col).alias("id_b"), F.col(source_col).alias("_sb")
            ),
            "id_b",
        )
        .select(
            F.least("_sa", "_sb").alias("source_a"),
            F.greatest("_sa", "_sb").alias("source_b"),
            "dist",
        )
    )
    return joined.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min("dist").alias("min_dist"),
        F.round(F.avg("dist"), 3).alias("avg_dist"),
    )
