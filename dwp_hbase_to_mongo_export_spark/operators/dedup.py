"""Deduplication family — exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine. Extension operators for 100 TB training-data pipelines
(BASELINE.json north star); all compose from built-in DataFrame ops so
Catalyst handles pushdown/AQE, and every hash is md5-based so a DuckDB
oracle reproduces results exactly.

Scale design notes (per operator):
- exact: groupBy on a 16-byte content hash — the hash shuffles, not the
  payload. At 100 TB this is the canonical one-shuffle dedup.
- MinHash+LSH: shingle -> n_perm hashed mins -> band keys -> equi-join on
  band key. Work is linear in corpus size (truncated shingling) and the
  candidate join is an equi-join LSH makes sparse; band/row counts tune
  the jaccard threshold ((1/b)^(1/r)). Skewed band keys (boilerplate
  docs) are handled by AQE skew-join; at extreme skew, salt the band key
  or drop top-frequency bands (they're near-universal boilerplate).
- SimHash: per-doc 32-bit signature via sign-aggregated token hashes —
  one narrow agg, no joins; near-dup = small Hamming distance.
- n-gram Jaccard: exact all-pairs verification; quadratic, so only ever
  run it on LSH candidates (verify_jaccard) or a bounded id range.
- embedding cosine: all-pairs over a bounded set / per-bucket after LSH.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import char_shingle_sets, char_shingles, hash32, tokens


def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """(content_hash, keep_doc_id, n_dups) — keep the min id per hash."""
    return (
        df.withColumn("content_hash", F.md5(content_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_doc_id"), F.count(F.lit(1)).alias("n_dups"))
    )


MINHASH_MOD = 2147483647  # 2^31 - 1 (Mersenne prime)


def minhash_perm_constants(n_perm: int) -> list[tuple[int, int]]:
    """Deterministic universal-hash coefficients (a_p, b_p) for the
    minhash permutation family sig_p = min((a_p * h + b_p) mod M) over
    the per-shingle base hash h = hash32(g). md5-derived so any engine
    (the DuckDB oracle inlines them as literals) reproduces identical
    signatures. a_p, b_p < 2^30 keeps a*h + b well inside signed-64
    range (no ANSI overflow in Spark, no BIGINT overflow in DuckDB)."""
    import hashlib

    out = []
    for p in range(n_perm):
        a = int(hashlib.md5(f"a:{p}".encode()).hexdigest()[:8], 16) % (2**30 - 1) + 1
        b = int(hashlib.md5(f"b:{p}".encode()).hexdigest()[:8], 16) % (2**30)
        out.append((a, b))
    return out


def minhash_signatures(shingles: DataFrame, id_col: str, n_perm: int = 16) -> DataFrame:
    """(id, perm, sig) in row form: sig = min((a_p*h + b_p) mod M) with
    h = hash32(g) computed once per shingle — the permutation family is
    arithmetic, not n_perm separate string hashes. The min is a partial
    aggregation — map-side combined before the shuffle."""
    perms = [(p, a, b) for p, (a, b) in enumerate(minhash_perm_constants(n_perm))]
    h = shingles.select(id_col, hash32(F.col("g")).alias("h"))
    perm_struct = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(p).alias("perm"),
                    ((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MINHASH_MOD)).alias("hp"),
                )
                for p, a, b in perms
            ]
        )
    )
    return (
        h.select(id_col, perm_struct.alias("ps"))
        .select(id_col, "ps.perm", "ps.hp")
        .groupBy(id_col, "perm")
        .agg(F.min("hp").alias("sig"))
    )


def lsh_band_keys(sigs: DataFrame, id_col: str, rows_per_band: int = 2) -> DataFrame:
    """(id, band, band_key): band_key = ordered concat of the band's
    signature values."""
    banded = sigs.withColumn("band", (F.col("perm") / rows_per_band).cast("int"))
    pairs = F.array_sort(F.collect_list(F.struct("perm", "sig")))
    key = F.array_join(F.transform(pairs, lambda x: x["sig"].cast("string")), ",")
    return banded.groupBy(id_col, "band").agg(key.alias("band_key"))


def lsh_candidate_pairs(bands: DataFrame, id_col: str) -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing any band key — a sparse
    equi-join on (band, band_key)."""
    a = bands.select(F.col(id_col).alias("id_a"), "band", "band_key")
    b = bands.select(F.col(id_col).alias("id_b"), "band", "band_key")
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_of_pairs(shingles: DataFrame, pairs: DataFrame, id_col: str) -> DataFrame:
    """Exact jaccard for given candidate pairs. Join order matters at
    scale: NEVER self-join shingles on the gram alone (a gram present in
    m docs yields m^2 intermediate rows — quadratic in corpus size for
    boilerplate grams). Instead fold each doc's shingle set into ONE array
    row (bounded: <= max_chars grams/doc, ~1.3 KB) and use
    jaccard_of_sets."""
    sets = shingles.groupBy(id_col).agg(F.collect_set("g").alias("gs"))
    return jaccard_of_sets(sets, pairs, id_col)


def _driver_memory_bytes(spark) -> int:
    """spark.driver.memory as bytes (JVM size-string grammar; default
    1g like Spark's own default)."""
    raw = "1g"
    try:
        raw = spark.conf.get("spark.driver.memory", "1g") or "1g"
    except Exception:
        pass
    s = raw.strip().lower()
    mult = 1
    for suffix, m in (("k", 2**10), ("m", 2**20), ("g", 2**30), ("t", 2**40)):
        if s.endswith(suffix + "b"):
            s, mult = s[:-2], m
            break
        if s.endswith(suffix):
            s, mult = s[:-1], m
            break
    try:
        return int(s) * mult
    except ValueError:
        return 2**30


def broadcast_cutover_docs(
    spark,
    bytes_per_doc: int = 2048,
    driver_mem_fraction: float = 0.05,
    floor_docs: int = 10_000,
) -> int:
    """How many per-doc shingle-set rows may be collected and broadcast:
    a fraction of spark.driver.memory over the estimated per-doc footprint
    (<= max_chars 5-grams/doc as numpy string arrays ~ 2 KB), never below
    a small floor. Config-derived, so a 4 GB driver cuts over to the
    distributed join ~6x earlier than a 24 GB one instead of sharing one
    hard-coded constant."""
    mem = _driver_memory_bytes(spark)
    return max(floor_docs, int(mem * driver_mem_fraction / bytes_per_doc))


def jaccard_of_sets(
    sets: DataFrame,
    pairs: DataFrame,
    id_col: str,
    set_col: str = "gs",
    broadcast_max_docs: int | None = None,
    min_jaccard: float | None = None,
) -> DataFrame:
    """Exact jaccard for candidate pairs given per-doc shingle-set arrays
    (id_col, set_col). Two strategies, chosen by build-side size exactly
    like Spark chooses broadcast vs shuffle joins:

    - **broadcast** (sets fit executor memory): ship the per-doc arrays
      once per worker as a broadcast dict; the verify is then a map-only
      pass over the BYTE-SMALL pair list (two ids/row), intersecting
      sorted unique arrays with vectorised numpy. This avoids the
      dominant cost of the join form: copying both 2 KB set arrays into
      every one of the |pairs| rows, and JVM `array_intersect`, which
      builds a boxed hash set per row (~11 s for 1.3M pairs at sf0.1 vs
      ~1 s for the numpy merge-intersect on the same data).
    - **join** (build side too big — the 100 TB path): join the arrays
      to the pairs and intersect in an Arrow-batched pandas UDF. Still
      no row explosion: the verify shuffles |pairs| rows, not
      |pairs| * shingles/doc.

    Values are identical either way — exact set intersection, same
    jaccard arithmetic — so the DuckDB oracles don't change.

    min_jaccard enables the SIZE-RATIO prefilter (prefix-filtering
    family, Bayardo et al., public literature): jaccard(A, B) <=
    min(|A|,|B|)/max(|A|,|B|), so when the caller will drop everything
    below a threshold t, candidates with min < t*max are provably
    below t and can be skipped BEFORE the O(|set|) intersect — an exact
    optimisation, never a result change. It is applied only on the JOIN
    path, where it is a free codegen'd predicate under the Python
    verify; in the broadcast kernel the per-pair size lookups measurably
    cost more than they save (0.3% kill rate on truncated-shingle
    corpora whose set sizes cluster at the cap), so that path verifies
    every candidate."""
    from ..sources.parquet import ensure_parallelism

    # The pairs frame is BYTE-small but each row costs an O(|set|)
    # intersect downstream; AQE's size-based coalescing would run the
    # verify on a handful of tasks, so pin partitions to the core count.
    pairs = ensure_parallelism(pairs)
    if broadcast_max_docs is None:
        broadcast_max_docs = broadcast_cutover_docs(pairs.sparkSession)
    # One job decides the strategy AND builds the broadcast side: pull
    # at most max+1 rows — getting max+1 back means "too big, join it".
    probe = sets.select(id_col, set_col).limit(broadcast_max_docs + 1).collect()
    if len(probe) <= broadcast_max_docs:
        return _jaccard_broadcast(probe, pairs)
    return _jaccard_join(sets, pairs, id_col, set_col, min_jaccard)


def _jaccard_broadcast(set_rows: list, pairs: DataFrame) -> DataFrame:
    spark = pairs.sparkSession
    doc_sets = {r[0]: np.asarray(r[1]) for r in set_rows}
    bc = spark.sparkContext.broadcast(doc_sets)

    id_type = dict(pairs.dtypes)["id_a"]
    out_schema = f"id_a {id_type}, id_b {id_type}, jaccard double"

    def verify(batches):
        d = bc.value
        for pdf in batches:
            # Vectorise across pairs, not per pair: a python-level
            # intersect1d per candidate costs ~4 us of interpreter/sort
            # overhead each (5+ s at 1.3M candidates). Grouping by id_a
            # turns the batch into ~|docs| vector ops: one searchsorted
            # membership test of the concatenated B-sides against the
            # (sorted, unique) A-side, then segmented sums for the
            # per-pair intersection counts. Same exact arithmetic.
            ids_a = pdf["id_a"].values
            ids_b = pdf["id_b"].values
            order = np.argsort(ids_a, kind="stable")
            ids_a, ids_b = ids_a[order], ids_b[order]
            jac = np.empty(len(ids_a), dtype=np.float64)
            # group boundaries of the sorted id_a runs
            bounds = np.flatnonzero(np.r_[True, ids_a[1:] != ids_a[:-1], True])
            for gi in range(len(bounds) - 1):
                lo, hi = bounds[gi], bounds[gi + 1]
                A = d[ids_a[lo]]
                bs = [d[b] for b in ids_b[lo:hi]]
                lens = np.fromiter((x.size for x in bs), count=hi - lo, dtype=np.int64)
                Bc = np.concatenate(bs)
                idx = np.searchsorted(A, Bc).clip(max=A.size - 1)
                hits = A[idx] == Bc
                starts = np.zeros(hi - lo, dtype=np.int64)
                np.cumsum(lens[:-1], out=starts[1:])
                inter = np.add.reduceat(hits, starts)
                jac[lo:hi] = inter / (A.size + lens - inter)
            yield pd.DataFrame({"id_a": ids_a, "id_b": ids_b, "jaccard": jac})

    return pairs.select("id_a", "id_b").mapInPandas(verify, out_schema)


def _jaccard_join(
    sets: DataFrame,
    pairs: DataFrame,
    id_col: str,
    set_col: str,
    min_jaccard: float | None = None,
) -> DataFrame:
    a = sets.select(F.col(id_col).alias("id_a"), F.col(set_col).alias("ga"))
    b = sets.select(F.col(id_col).alias("id_b"), F.col(set_col).alias("gb"))

    @F.pandas_udf("long")
    def _inter(ga: pd.Series, gb: pd.Series) -> pd.Series:
        return pd.Series(
            [
                np.intersect1d(np.asarray(x), np.asarray(y), assume_unique=True).size
                for x, y in zip(ga, gb)
            ],
            dtype="int64",
        )

    joined = pairs.join(a, "id_a").join(b, "id_b")
    if min_jaccard is not None:
        # size-ratio prefilter as a codegen'd column predicate BELOW the
        # Python verify — exact (see jaccard_of_sets docstring)
        joined = joined.filter(
            F.least(F.size("ga"), F.size("gb"))
            >= F.lit(min_jaccard) * F.greatest(F.size("ga"), F.size("gb"))
        )
    return (
        joined.withColumn("inter", _inter("ga", "gb"))
        .select(
            "id_a",
            "id_b",
            (F.col("inter") / (F.size("ga") + F.size("gb") - F.col("inter"))).alias("jaccard"),
        )
    )


def minhash_sets_and_sigs(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    n_perm: int = 16,
    k: int = 5,
    max_chars: int = 256,
) -> DataFrame:
    """(id, hs: array<bigint>, sigs: array<bigint>) — per-doc hashed
    shingle set + minhash signature vector in ONE Arrow batch pass.

    The values are bit-identical to the pure-column form (md5-prefix
    shingle hash, (a*h+b) mod M minima) — the oracle doesn't change —
    but the per-element work runs vectorised in numpy instead of
    Catalyst's interpreted higher-order-function evaluator: per doc
    that's n_perm*|hs| (~4k) interpreted expression evals traded for
    one 16x256 numpy broadcast. Text normalisation stays JVM-side
    (codegen'd regexp chain). Map-only — no shuffle; scales linearly
    with corpus size exactly like the column form."""
    import hashlib

    from pyspark.sql import types as T

    from ..functions.text import normalize_text
    from ..sources.parquet import ensure_parallelism

    consts = minhash_perm_constants(n_perm)
    A = np.array([a for a, _ in consts], dtype=np.int64)[:, None]
    B = np.array([b for _, b in consts], dtype=np.int64)[:, None]

    out_type = T.StructType(
        [
            T.StructField("hs", T.ArrayType(T.LongType())),
            T.StructField("sigs", T.ArrayType(T.LongType())),
        ]
    )

    @F.pandas_udf(out_type)
    def _mh(s: pd.Series) -> pd.DataFrame:
        # Cross-doc gram->hash memo: near-dup corpora repeat most
        # shingles across documents, so the md5 (the expensive part —
        # it's not vectorisable) runs once per DISTINCT gram per batch
        # instead of once per occurrence. Bounded by the batch's
        # distinct-gram count; lives only for the Arrow batch.
        memo: dict[str, int] = {}
        hs_col, sigs_col = [], []
        for text in s:
            grams = {text[i : i + k] for i in range(len(text) - k + 1)}
            h = np.empty(len(grams), dtype=np.int64)
            for j, g in enumerate(grams):
                v = memo.get(g)
                if v is None:
                    v = int(hashlib.md5(g.encode("utf-8")).hexdigest()[:8], 16)
                    memo[g] = v
                h[j] = v
            hs = np.unique(h)
            sigs = ((A * hs[None, :] + B) % MINHASH_MOD).min(axis=1)
            hs_col.append(hs)
            sigs_col.append(sigs)
        return pd.DataFrame({"hs": hs_col, "sigs": sigs_col})

    s = normalize_text(F.col(text_col), max_chars)
    df2 = (
        ensure_parallelism(docs)
        .select(F.col(id_col), s.alias("s"))
        .filter(F.length("s") >= k)
    )
    return df2.select(id_col, _mh("s").alias("m")).select(
        id_col, F.col("m.hs").alias("hs"), F.col("m.sigs").alias("sigs")
    )


def minhash_lsh_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = 16,
    rows_per_band: int = 2,
    threshold: float = 0.25,
    k: int = 5,
    max_chars: int = 256,
) -> DataFrame:
    """Near-dup pairs: shingle -> minhash -> LSH bucket join -> exact
    jaccard verify >= threshold. Returns (id_a, id_b, jaccard).

    The shingle/signature/band chain is computed NARROWLY: the per-doc
    shingle set is one array column (char_shingle_sets), each of the
    n_perm signatures is an `array_min(transform(...))` over it, and
    band keys are `concat_ws` over signature columns — one map-only
    projection per document, zero shuffles. The first shuffle in the DAG
    is the candidate equi-join on (band, band_key); the second is the
    verify join. (The equivalent row-form building blocks —
    minhash_signatures / lsh_band_keys over exploded shingle rows —
    shuffle 2 extra times and exist for composition with other ops.)

    Jaccard is computed over the SET OF 32-BIT SHINGLE HASHES (hashed
    jaccard — what large-scale dedup pipelines actually compare): the
    cached per-doc state and the verify intersection work on 8-byte
    longs, not k-char strings. The md5-derived hash makes it engine-
    portable, so the oracle reproduces identical values, collisions
    included.

    The per-doc (hs, sigs) frame is persisted (memory-and-disk): it feeds
    both aliased sides of the candidate self-join AND both sides of the
    verify join, which defeats ReuseExchange; it is bounded per doc
    (<= max_chars grams + n_perm sigs), so the cache is a constant factor
    of corpus size and spills rather than OOMing at 100 TB. The cache
    slot is operator-scoped (_cache.swap_cache): re-invocations release
    the previous entry, so repeated calls plateau at ONE live cached
    relation instead of leaking one per call."""
    from ._cache import swap_cache

    mh = swap_cache(
        "minhash_lsh_dedup",
        minhash_sets_and_sigs(
            docs, text_col, id_col, n_perm=n_perm, k=k, max_chars=max_chars
        ),
    )
    sets = mh.select(id_col, "hs")
    n_bands = n_perm // rows_per_band
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    ",",
                    *[
                        F.element_at("sigs", i + 1).cast("string")
                        for i in range(b * rows_per_band, (b + 1) * rows_per_band)
                    ],
                ).alias("band_key"),
            )
            for b in range(n_bands)
        ]
    )
    banded = mh.select(id_col, F.explode(band_structs).alias("bb")).select(
        id_col, "bb.band", "bb.band_key"
    )
    pairs = lsh_candidate_pairs(banded, id_col)
    return jaccard_of_sets(
        sets, pairs, id_col, set_col="hs", min_jaccard=threshold
    ).filter(F.col("jaccard") >= threshold)


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.25,
    k: int = 5,
    max_chars: int = 256,
) -> DataFrame:
    """Exact all-pairs jaccard >= threshold (no LSH) — the verification
    baseline. Quadratic: bound the input (e.g. one LSH bucket)."""
    shingles = char_shingles(docs, text_col, id_col, k=k, max_chars=max_chars)
    sa = shingles.select(F.col(id_col).alias("id_a"), "g")
    sb = shingles.select(F.col(id_col).alias("id_b"), "g")
    inter = (
        sa.join(sb, "g")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("nb"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 32) -> DataFrame:
    """(id, simhash): sign-aggregate token hashes per bit. One explode +
    one agg — linear, no joins; the signature is portable (md5-based)."""
    from ..sources.parquet import ensure_parallelism

    tok = ensure_parallelism(docs).select(
        id_col, F.explode(tokens(F.col(text_col))).alias("t")
    ).filter(F.col("t") != "")
    h = hash32(F.col("t"))
    bit = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit")
    # shiftright/shiftleft builtins take a literal count; with a column
    # count use the SQL form (still codegen'd)
    contrib = F.when(F.expr("(h >> bit) & 1") == 1, 1).otherwise(-1)
    votes = (
        tok.select(id_col, h.alias("h"))
        .select(id_col, "h", bit)
        .groupBy(id_col, "bit")
        .agg(F.sum(contrib).alias("v"))
    )
    bitval = F.when(F.col("v") > 0, F.expr("shiftleft(cast(1 as bigint), bit)")).otherwise(
        F.lit(0).cast("bigint")
    )
    return votes.groupBy(id_col).agg(F.sum(bitval).cast("bigint").alias("simhash"))


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    max_hamming: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """(id_a, id_b, hamming) pairs with simhash Hamming distance <=
    max_hamming, found by banded blocking (Manku et al.'s near-dup
    detection, public-literature technique): split the signature into
    n_bands bit-bands; by pigeonhole, distance <= n_bands-1 guarantees at
    least one identical band, so candidates are a sparse equi-join on
    (band, band_bits) — never an all-pairs scan. Verification is one
    bit_count(xor) per candidate, codegen'd. Requires
    max_hamming < n_bands for completeness."""
    if max_hamming >= n_bands:
        raise ValueError("banded blocking needs max_hamming < n_bands")
    band_width = bits // n_bands
    mask = (1 << band_width) - 1
    sig = simhash(docs, text_col, id_col, bits)
    banded = sig.select(
        F.col(id_col),
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
    ).withColumn("band_key", F.expr(f"shiftright(simhash, band * {band_width}) & {mask}"))
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sig_a"), "band", "band_key"
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sig_b"), "band", "band_key"
    )
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming64(F.col("sig_a"), F.col("sig_b")).alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def embedding_dup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    block_size: int = 1024,
) -> DataFrame:
    """(id_a, id_b, cos) pairs with cosine >= threshold, via blocked
    matrix multiply: vectors are grouped into id-range blocks, block
    pairs are enumerated once (upper triangle), and each block pair's
    full similarity matrix is one numpy/BLAS matmul inside an
    Arrow-batched mapInPandas. This is the vectorized exception to
    "UDFs are slow": per-pair cost is a fused multiply-add in BLAS, ~2-3
    orders faster than per-row expression evaluation. The block-pair grid
    is quadratic in block count — this is the exact bounded-input
    baseline; at 100 TB use embedding_dup_pairs_lsh, which composes
    hyperplane-LSH bucketing into the same blocked verify so the grid is
    per-bucket, not global.
    """
    import pandas as pd  # noqa: F401 — documents the mapInPandas dependency

    blocks = (
        emb.select(
            F.floor(F.col(id_col) / block_size).alias("blk"),
            F.struct(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).alias("r"),
        )
        .groupBy("blk")
        .agg(F.collect_list("r").alias("rows"))
    )
    a = blocks.select(F.col("blk").alias("blk_a"), F.col("rows").alias("rows_a"))
    b = blocks.select(F.col("blk").alias("blk_b"), F.col("rows").alias("rows_b"))
    grid = a.crossJoin(b).filter(F.col("blk_a") <= F.col("blk_b"))

    pairs = grid.mapInPandas(
        _block_cosine_kernel(threshold), "id_a bigint, id_b bigint, cos double"
    )
    return pairs.select("id_a", "id_b", F.round("cos", 3).alias("cos"))


def _block_cosine_kernel(threshold: float):
    """mapInPandas kernel over (rows_a, rows_b) block-pair rows: one BLAS
    matmul per block pair, emit (id_a < id_b, cos >= threshold) pairs."""

    def _block_cosine(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out_a, out_b, out_c = [], [], []
            for rows_a, rows_b in zip(pdf["rows_a"], pdf["rows_b"]):
                ida = np.array([r["id"] for r in rows_a], dtype=np.int64)
                idb = np.array([r["id"] for r in rows_b], dtype=np.int64)
                ma = np.array([r["v"] for r in rows_a], dtype=np.float64)
                mb = np.array([r["v"] for r in rows_b], dtype=np.float64)
                ma /= np.linalg.norm(ma, axis=1, keepdims=True)
                mb /= np.linalg.norm(mb, axis=1, keepdims=True)
                sim = ma @ mb.T
                mask = (sim >= threshold) & (ida[:, None] < idb[None, :])
                ii, jj = np.nonzero(mask)
                out_a.append(ida[ii])
                out_b.append(idb[jj])
                out_c.append(sim[ii, jj])
            yield pd.DataFrame(
                {
                    "id_a": np.concatenate(out_a) if out_a else np.array([], dtype=np.int64),
                    "id_b": np.concatenate(out_b) if out_b else np.array([], dtype=np.int64),
                    "cos": np.concatenate(out_c) if out_c else np.array([], dtype=np.float64),
                }
            )

    return _block_cosine


def embedding_band_keys(
    vec: Column, n_bands: int, band_bits: int, n_dims: int
) -> Column:
    """array<bigint> of n_bands LSH band keys: sign bits of the vector
    against n_bands*band_bits deterministic md5-derived hyperplanes
    (similarity._plane_component), band t packing bits
    [t*band_bits, (t+1)*band_bits). One Arrow-batched matmul per batch —
    same rationale as similarity.random_hyperplane_bucket."""
    from .similarity import _plane_component

    n_planes = n_bands * band_bits
    P = np.array(
        [[_plane_component(p, d) for d in range(n_dims)] for p in range(n_planes)],
        dtype=np.float64,
    ).T  # n_dims x n_planes
    weights = (1 << np.arange(band_bits)).astype(np.int64)

    @F.pandas_udf("array<bigint>")
    def _keys(v: pd.Series) -> pd.Series:
        if not len(v):
            return pd.Series([], dtype="object")
        V = np.stack([np.asarray(x, dtype=np.float64) for x in v])
        bits = (V @ P) > 0  # n x n_planes
        K = bits.reshape(len(V), n_bands, band_bits) @ weights  # n x n_bands
        return pd.Series(list(K.astype(np.int64)))

    return _keys(vec)


def embedding_dup_pairs_lsh(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    block_size: int = 1024,
    n_bands: int = 32,
    band_bits: int = 3,
    n_dims: int = 64,
) -> DataFrame:
    """(id_a, id_b, cos) pairs with cosine >= threshold — the 100 TB form
    of embedding_dup_pairs: hyperplane-LSH bucketing FIRST, then the
    blocked BLAS verify per (band, bucket). The block-pair grid is an
    EQUI-join on (band, band_key) — sparse, shuffle-partitioned by
    bucket — never a global crossJoin, so cost scales with bucket sizes,
    not corpus^2 / block_size^2.

    Banding is the standard AND/OR construction (Indyk-Motwani /
    Charikar, public literature): a pair collides if ALL band_bits sign
    bits agree in ANY of the n_bands bands. Recall is probabilistic in
    general — for a pair at angle theta, P(collide) =
    1-(1-p^band_bits)^n_bands with p = 1 - theta/pi. The defaults
    (32 bands x 3 bits) put the analytic miss probability for a
    cos=0.4 pair (the threshold, the worst case) at ~1e-4 per pair:
    measured recall 1.0 on every fixture's qualifying pairs including
    all 920 at sf0.1 — and FASTER than the former 24x4 config (fewer,
    fuller buckets mean fewer singleton bucket rows to count and drop).
    Raise n_bands / lower band_bits to push recall further at scale.
    Verified cosines are exact, so precision is always 1.0."""
    # Pass 1 is IDS-ONLY: exploding vectors per band would shuffle every
    # vector n_bands times (24x byte amplification at the default).
    # Instead explode (id, band, band_key) — a few dozen bytes per row —
    # count bucket occupancy, and keep only buckets with >= 2 members:
    # singletons (the overwhelming majority at scale, since band keys
    # spread 2^band_bits ways per band) cannot produce a pair and are
    # dropped BEFORE any vector bytes move. Pass 2 joins the surviving
    # ids back to the (id, vector) projection, so vector bytes shuffle
    # once per surviving membership, not once per band. The double scan
    # recomputes the key matmul, which is deliberate: re-reading a
    # pruned columnar scan is cheaper than caching the corpus at 100 TB.
    banded_ids = emb.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            embedding_band_keys(F.col(vec_col), n_bands, band_bits, n_dims)
        ).alias("band", "band_key"),
    )
    crowded = (
        banded_ids.groupBy("band", "band_key")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= 2)
        .drop("_n")
    )
    surviving = banded_ids.join(crowded, ["band", "band_key"])
    with_vec = surviving.join(
        emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")), "id"
    )
    # id-range sub-blocks WITHIN each bucket bound the collect_list rows
    # and keep the matmul operands cache-sized even for a hot bucket.
    blocks = (
        with_vec.select(
            "band",
            "band_key",
            F.floor(F.col("id") / block_size).alias("blk"),
            F.struct("id", "v").alias("r"),
        )
        .groupBy("band", "band_key", "blk")
        .agg(F.collect_list("r").alias("rows"))
    )
    a = blocks.select(
        "band", "band_key", F.col("blk").alias("blk_a"), F.col("rows").alias("rows_a")
    )
    b = blocks.select(
        "band", "band_key", F.col("blk").alias("blk_b"), F.col("rows").alias("rows_b")
    )
    grid = a.join(b, ["band", "band_key"]).filter(F.col("blk_a") <= F.col("blk_b"))
    pairs = grid.mapInPandas(
        _block_cosine_kernel(threshold), "id_a bigint, id_b bigint, cos double"
    )
    # a pair can collide in several bands/buckets; cos is recomputed
    # identically each time, so any-row-per-pair is exact
    return pairs.dropDuplicates(["id_a", "id_b"]).select(
        "id_a", "id_b", F.round("cos", 3).alias("cos")
    )


def jaccard_prefix_filter_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.25,
    k: int = 5,
    max_chars: int = 256,
) -> DataFrame:
    """EXACT all-pairs jaccard >= threshold with PREFIX-FILTER pruning
    (Chaudhuri/Ganti/Kaushik 2006 "primitive operator", Xiao et al.
    2008 PPJoin — public literature): the third member of the jaccard
    family, between the quadratic exact baseline (ngram_jaccard_pairs)
    and the probabilistic MinHash-LSH path — exact answers WITHOUT the
    all-sharing-pairs candidate blow-up.

    The filter: order every document's shingles by one GLOBAL total
    order (here (document-frequency ASC, shingle) — rare first, the
    order that prunes hardest) and keep each document's first
    p = n - ceil(t*n) + 1 shingles as its PREFIX. If
    |A∩B| / |A∪B| >= t, then A and B must share a shingle within both
    prefixes: jaccard >= t forces |A∩B| >= t/(1+t) * (|A|+|B|) >=
    ceil(t*|A|), and a pair sharing NO prefix shingle can intersect
    only in the trailing ceil(t*n)-1 shingles of each side — too few.
    So the prefix equi-join is a LOSSLESS candidate generator; every
    candidate is then verified with the exact set jaccard
    (jaccard_of_sets) and thresholded. Identical results to the
    baseline BY THEOREM, pinned by sharing its oracle.

    Spark shape, 100 TB honest: the df table is vocabulary-sized (one
    groupBy over the shingle stream); the per-doc ordering is a window
    PARTITIONED BY DOCUMENT (never a global sort — the order key
    (df, g) is itself the shared total order, so no dense global rank
    needs materialising); the candidate join is an equi-join on prefix
    shingles only — at threshold t each doc contributes ~(1-t) of its
    shingles, and rare-first ordering makes high-df shingles (the join's
    quadratic hot keys) overwhelmingly NON-prefix, which is where the
    pruning bites. Verification is candidate-sized, reusing the
    broadcast/join-adaptive exact verify."""
    shingles = char_shingles(docs, text_col, id_col, k=k, max_chars=max_chars)
    dfreq = shingles.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    ranked = shingles.join(dfreq, "g").withColumn(
        "_rk",
        F.row_number().over(
            Window.partitionBy(id_col).orderBy(F.asc("df"), F.asc("g"))
        ),
    )
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    p = (F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1).cast("int")
    prefix = (
        ranked.join(sizes, id_col)
        .filter(F.col("_rk") <= p)
        .select(id_col, "g")
    )
    pa = prefix.select(F.col(id_col).alias("id_a"), "g")
    pb = prefix.select(F.col(id_col).alias("id_b"), "g")
    cand = (
        pa.join(pb, "g")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # jaccard_of_sets' verify CONTRACT is sorted-unique arrays (numpy
    # searchsorted membership) — char_shingle_sets is distinct but
    # unsorted, so sort here (the minhash path's hashed sets arrive
    # sorted from the signature kernel)
    sets = char_shingle_sets(docs, text_col, id_col, k=k, max_chars=max_chars)
    sets = sets.select(id_col, F.array_sort("gs").alias("gs"))
    return jaccard_of_sets(sets, cand, id_col, min_jaccard=threshold).filter(
        F.col("jaccard") >= threshold
    )


def containment_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    k: int = 5,
    max_chars: int = 256,
) -> DataFrame:
    """EXACT all-pairs shingle CONTAINMENT |A∩B| / |A| >= threshold —
    the ASYMMETRIC member of the jaccard family (Broder's containment;
    the excerpt/quotation detector): a short document lifted mostly
    verbatim into a long one scores near 1 here while its symmetric
    jaccard stays near |A|/|B|, far below any usable threshold.

    Candidate generation is the ONE-SIDED prefix filter — simpler and
    strictly easier to prove than the two-sided jaccard form:
    containment >= t forces |A∩B| >= ceil(t*|A|) = o, so if none of
    A's first |A| - o + 1 rare-first shingles occurs in B at all, then
    A∩B fits inside A's remaining o - 1 shingles — too few. Hence
    joining ONLY the contained-side prefix against the full shingle
    inventory (the container side must index everything: containment
    is unbounded in |B|, so no prefix can be taken on that side) is a
    LOSSLESS candidate generator. A size predicate (|B| >= ceil(t*|A|),
    since |A∩B| <= |B|) prunes inside the join.

    Verification stays JVM-side: candidates join the two shingle
    streams on (pair, g) and a groupBy counts the exact intersection —
    shuffle volume is candidates x A-side shingles, never all-pairs.

    Returns (id_a, id_b, containment) with id_a the CONTAINED document
    (both orientations of a pair can appear, each with its own score).
    """
    sh = char_shingles(docs, text_col, id_col, k=k, max_chars=max_chars)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"))
    dfreq = sh.groupBy("g").agg(F.count(F.lit(1)).alias("_df"))
    ranked = sh.join(dfreq, "g").withColumn(
        "_rk",
        F.row_number().over(
            Window.partitionBy(id_col).orderBy(F.asc("_df"), F.asc("g"))
        ),
    )
    o = F.ceil(F.lit(threshold) * F.col("_n")).cast("int")
    prefix = (
        ranked.join(sizes, id_col)
        .filter(F.col("_rk") <= F.col("_n") - o + 1)
        .select(F.col(id_col).alias("id_a"), "g", F.col("_n").alias("_na"))
    )
    full = sh.join(sizes, id_col).select(
        F.col(id_col).alias("id_b"), "g", F.col("_n").alias("_nb")
    )
    cand = (
        prefix.join(full, "g")
        .filter(
            (F.col("id_a") != F.col("id_b"))
            & (
                F.col("_nb")
                >= F.ceil(F.lit(threshold) * F.col("_na")).cast("int")
            )
        )
        .select("id_a", "id_b")
        .distinct()
    )
    sh_a = sh.select(F.col(id_col).alias("id_a"), "g")
    sh_b = sh.select(F.col(id_col).alias("id_b"), "g")
    inter = (
        cand.join(sh_a, "id_a")
        .join(sh_b, ["id_b", "g"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_i"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("_n").alias("_na"))
    return (
        inter.join(na, "id_a")
        .withColumn("containment", F.col("_i") / F.col("_na"))
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", "containment")
    )


def containment_screen(
    corpus: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    k: int = 5,
    max_chars: int = 256,
) -> DataFrame:
    """Incremental form of ``containment_pairs``: for each NEW batch
    document, the corpus documents it is mostly an excerpt OF
    (|batch∩corpus| / |batch| >= threshold) — the ingest-time
    "is this new page just a copy of something we already hold"
    screen, the containment complement of winnowing decontamination
    (which needs contiguous fingerprint runs; containment sees
    scattered reuse too).

    Same one-sided prefix filter, probe-sided: only the BATCH side
    takes prefixes (it is the contained side whose |A| bounds the
    needed overlap), joined against the corpus's full shingle
    inventory — so a small batch pays batch-prefix x posting work,
    never a corpus self-join. Ids must be disjoint across the inputs
    (the family's incremental contract).

    Returns (id of the batch doc in ``id_col``, dup_of, containment).
    """
    sh_c = char_shingles(corpus, text_col, id_col, k=k, max_chars=max_chars)
    sh_b = char_shingles(batch, text_col, id_col, k=k, max_chars=max_chars)
    sizes_b = sh_b.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"))
    sizes_c = sh_c.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"))
    # the rare-first order comes from the CORPUS inventory (what the
    # probe joins against); batch grams unseen there rank rarest —
    # any single total order keeps the one-sided argument valid, since
    # only the batch side takes a prefix at all
    dfreq = sh_c.groupBy("g").agg(F.count(F.lit(1)).alias("_df"))
    ranked = (
        sh_b.join(dfreq, "g", "left")
        .withColumn("_dfo", F.coalesce("_df", F.lit(0)))
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(F.asc("_dfo"), F.asc("g"))
            ),
        )
    )
    o = F.ceil(F.lit(threshold) * F.col("_n")).cast("int")
    prefix = (
        ranked.join(sizes_b, id_col)
        .filter(F.col("_rk") <= F.col("_n") - o + 1)
        .select(F.col(id_col).alias("id_a"), "g", F.col("_n").alias("_na"))
    )
    full = sh_c.join(sizes_c, id_col).select(
        F.col(id_col).alias("id_b"), "g", F.col("_n").alias("_nb")
    )
    cand = (
        prefix.join(full, "g")
        .filter(
            F.col("_nb") >= F.ceil(F.lit(threshold) * F.col("_na")).cast("int")
        )
        .select("id_a", "id_b")
        .distinct()
    )
    ba = sh_b.select(F.col(id_col).alias("id_a"), "g")
    cb = sh_c.select(F.col(id_col).alias("id_b"), "g")
    inter = (
        cand.join(ba, "id_a")
        .join(cb, ["id_b", "g"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_i"))
    )
    na = sizes_b.select(F.col(id_col).alias("id_a"), F.col("_n").alias("_na"))
    return (
        inter.join(na, "id_a")
        .withColumn("containment", F.col("_i") / F.col("_na"))
        .filter(F.col("containment") >= threshold)
        .select(
            F.col("id_a").alias(id_col),
            F.col("id_b").alias("dup_of"),
            "containment",
        )
    )
