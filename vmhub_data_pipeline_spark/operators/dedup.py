"""Deduplication operators: exact, keep-latest, MinHash+LSH, SimHash,
n-gram Jaccard — driver-mandated [X] tier (BASELINE.json north_star), plus
the reference-parity key-level dedup (SURVEY §2.3 A4: reference README.md:12
promises dedup; its code mechanism is truncate-reload, the key-level form is
implied).

Everything is built-in column expressions (xxhash64, higher-order array
functions) — no Python UDFs, so the hot path stays in whole-stage codegen.

Scale design:
* exact/keep-latest: one shuffle on the key.
* jaccard_similarity_pairs: inverted-index self-join — candidate generation
  is data-driven (pairs sharing a token), never a cross join. At 100 TB the
  standard refinement is dropping ultra-frequent tokens (they generate
  quadratic candidates but never decide similarity) — exposed via
  ``max_token_doc_freq``.
* minhash LSH: banding turns near-dup search into an equi-join on
  (band_id, band_hash) — shuffle-partitioned by bucket, linear in corpus
  size + candidate count, the standard web-scale dedup topology.
* simhash: 64-bit signature via per-bit majority vote, near-dups = equal
  16-bit chunks (pigeonhole for hamming<=3) -> equi-join candidates.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from .similarity import spread_small_input as _spread_small_input


def keep_latest(df: DataFrame, keys: list[str], order_desc: list[str]) -> DataFrame:
    """Keep the newest row per key (A4/W1): row_number over desc order.

    Catalyst plans the rn=1 filter as WindowGroupLimit — per-partition
    top-1, no full sort of each key group.
    """
    w = Window.partitionBy(*keys).orderBy(*[F.desc(c) for c in order_desc])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def exact_dedup(df: DataFrame, fingerprint_col: Column, id_col: str) -> DataFrame:
    """Exact duplicate groups by content fingerprint: one row per group with
    the minimum id as keeper and the group size."""
    return (
        df.select(fingerprint_col.alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _tokens(text_col: str | Column) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.array_distinct(F.split(c, " "))


def token_set_df(
    df: DataFrame, id_col: str, text_col: str, shingle_size: int = 1
) -> DataFrame:
    """(id, ws): distinct token set per row; shingle_size>1 gives word
    n-gram shingles.

    Shingles are the right MinHash unit for natural text: unigram sets
    saturate on small vocabularies (every pair looks similar), while the
    n-gram space is large enough that only true near-dups overlap.

    The split is materialized in its own projection BEFORE the shingle
    lambda references it — inlined, Catalyst re-evaluates split() inside
    every slice() call and shingling goes O(words^2) per document (measured
    4.6x slower at sf0.1).
    """
    if shingle_size == 1:
        return df.select(F.col(id_col).alias("id"), _tokens(text_col).alias("ws"))
    k = shingle_size
    staged = df.select(
        F.col(id_col).alias("id"), F.split(F.col(text_col), " ").alias("__w")
    ).withColumn("__nw", F.size("__w"))
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.col("__nw") - (k - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(F.col("__w"), i, k)),
        )
    )
    return staged.select("id", shingles.alias("ws"))


def hashed_token_sets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_size: int = 3,
    prefix_len: int = 13,
) -> DataFrame:
    """(id, ws): each document's distinct shingle set hashed to fixed-width
    md5-hex prefixes — the VERIFICATION side of the maintained LSH dedup
    index (exact-Jaccard over hashed shingles equals exact-Jaccard over
    the shingles themselves, at ~13 bytes a member regardless of shingle
    text length, and md5 replays portably in the DuckDB oracles via the
    shared ``t13`` CTE). The ONE home for this construction: the resident
    index build, the append path, and the streamed-growth foreachBatch
    all sign through here, so a hashing change (prefix width, salt,
    distinct placement) can never diverge the batch and streaming sides
    of the same index."""
    return token_set_df(df, id_col, text_col, shingle_size).select(
        "id",
        F.array_distinct(
            F.transform("ws", lambda t: F.substring(F.md5(t), 1, prefix_len))
        ).alias("ws"),
    )


def jaccard_similarity_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    group_col: str | None = None,
    max_token_doc_freq: int | None = 10_000,
) -> DataFrame:
    """Token-set Jaccard pairs >= threshold via inverted-index join.

    shape: tokenize -> explode (token, id, set_size) -> self-join on token
    [-> and group_col] -> count shared tokens per pair -> jaccard from
    |A|,|B|,|A∩B| -> threshold filter. Never materializes a cross join;
    candidates are exactly the pairs with non-empty intersection.

    ``max_token_doc_freq`` is the inverted-index scale guard: a token in d
    documents generates O(d^2) candidate pairs, so one stopword in a skewed
    corpus goes quadratic. With the (default, finite) cap, tokens above the
    cap are excluded from CANDIDATE GENERATION only, and every candidate is
    re-verified with an exact array_intersect over the full token sets — so
    reported jaccard values are always exact, and the only approximation is
    recall: a pair sharing nothing but ultra-hot tokens is missed (at high
    thresholds such pairs are mostly-stopword documents). Pass ``None`` for
    full recall when the corpus is known to have no pathological tokens
    (e.g. the tiny-vocabulary test fixture, where EVERY token is hot).
    """
    # r13: an eager localCheckpoint of the doc-grain token sets (the
    # minhash_neardup_pairs treatment — the legs re-plan the tokenize up
    # to 5x at runtime) was A/B'd on every consumer and REGRESSED all of
    # them (capped entry +40%, survivorship/cluster_cc/cluster_split +40
    # to +60% at sf0.01): plain split-tokenize carries no per-token hash
    # work, so the concurrent re-runs are cheaper than the serial
    # materialization job. Kept plan-side.
    toks = df.select(
        F.col(id_col).alias("id"),
        *([F.col(group_col).alias("grp")] if group_col else []),
        _tokens(text_col).alias("ws"),
    ).select("id", *(["grp"] if group_col else []), F.size("ws").alias("n"), "ws")
    inv = toks.select("id", *(["grp"] if group_col else []), "n", F.explode("ws").alias("w"))
    if max_token_doc_freq is not None:
        freq = inv.groupBy("w").agg(F.count(F.lit(1)).alias("df_"))
        inv = inv.join(
            F.broadcast(freq.filter(F.col("df_") <= max_token_doc_freq).select("w")), "w"
        )
    a = inv.select(
        F.col("w").alias("w"),
        *([F.col("grp").alias("grp_a")] if group_col else []),
        F.col("id").alias("doc_a"),
        F.col("n").alias("na"),
    )
    b = inv.select(
        F.col("w").alias("wb"),
        *([F.col("grp").alias("grp_b")] if group_col else []),
        F.col("id").alias("doc_b"),
        F.col("n").alias("nb"),
    )
    cond = (F.col("w") == F.col("wb")) & (F.col("doc_a") < F.col("doc_b"))
    if group_col:
        cond = cond & (F.col("grp_a") == F.col("grp_b"))
    inter = (
        a.join(b, cond)
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    if max_token_doc_freq is None:
        # uncapped: the index intersection count IS the exact |A∩B|
        jac = F.col("n_common").cast("double") / (
            F.col("na") + F.col("nb") - F.col("n_common")
        ).cast("double")
        return inter.select(
            "doc_a", "doc_b", jac.alias("jaccard")
        ).filter(F.col("jaccard") >= threshold)
    # capped: n_common misses hot tokens -> re-verify candidates exactly.
    # Candidate volume is bounded by sum(df^2) over rare tokens only, so the
    # verify join re-attaches full token sets to FEW pairs, not all pairs.
    cand = inter.select("doc_a", "doc_b")
    ta = toks.select(F.col("id").alias("doc_a"), F.col("ws").alias("__ws_a"))
    tb = toks.select(F.col("id").alias("doc_b"), F.col("ws").alias("__ws_b"))
    n_inter = F.size(F.array_intersect("__ws_a", "__ws_b")).cast("double")
    n_union = (
        F.size("__ws_a") + F.size("__ws_b")
    ).cast("double") - n_inter
    return (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select("doc_a", "doc_b", (n_inter / n_union).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def _md5_int48(c: Column, salt: str = "") -> Column:
    """48-bit integer from an md5 hex prefix — the cross-engine portable
    hash primitive (DuckDB: ``('0x' || substr(md5(...), 1, 12))::BIGINT``,
    verified bit-identical). 12 hex chars keep ``h1 + 31*h2`` far below
    BIGINT overflow under ANSI mode."""
    s = F.concat(F.lit(salt), c) if salt else c
    return F.conv(F.substring(F.md5(s), 1, 12), 16, 10).cast("long")


def _minhash_signatures(
    tok_sets: DataFrame, num_hashes: int, portable: bool = False
) -> DataFrame:
    """(id, sig array<long>) as a ZERO-SHUFFLE projection: hash each token
    once into (h1, h2) arrays, then each permutation minimum is an
    ``array_min(zip_with(...))`` over the row's own arrays.

    Permutations come from universal hashing h_i = h1 + i*h2 (two real
    xxhash64 evaluations per token, the rest are one multiply-add) — the
    standard many-permutation trick. Measured against the alternative
    explode -> 32-min-aggregates shape (r1/r2 implementation) on the sf0.1
    corpus: identical signatures, 3.5x faster (0.78 s vs 2.7 s steady
    state), and no exchange at all where the agg shape shuffled a
    per-doc-per-partition partial row — at 100 TB the signature stage now
    rides the document scan untouched.

    ``portable=True`` derives (h1, h2) from md5 hex prefixes instead of
    xxhash64 — statistically identical universal hashing, but computable
    verbatim in DuckDB, which makes the WHOLE approximate pipeline
    (signatures -> bands -> candidates -> verify) SQL-replayable (the
    ``ann_lsh_topk`` oracle technique applied to MinHash). Cost: md5 is a
    few times slower than xxhash64 per token; still two real hash
    evaluations total, the other ``num_hashes - 2`` are multiply-adds.
    """
    p = 2147483647  # 2^31-1; keeps i*h2+h1 far below long overflow (ANSI mode)
    if portable:
        hashed = tok_sets.select(
            "id",
            F.transform("ws", lambda w: F.pmod(_md5_int48(w), F.lit(p))).alias("h1s"),
            F.transform("ws", lambda w: F.pmod(_md5_int48(w, "salt:"), F.lit(p))).alias("h2s"),
        )
    else:
        hashed = tok_sets.select(
            "id",
            F.transform("ws", lambda w: F.pmod(F.xxhash64(w), F.lit(p))).alias("h1s"),
            F.transform("ws", lambda w: F.pmod(F.xxhash64(F.lit("salt"), w), F.lit(p))).alias("h2s"),
        )
    sig = F.array(
        *[
            F.array_min(
                F.zip_with("h1s", "h2s", lambda a, b: F.pmod(a + F.lit(i) * b, F.lit(p)))
            )
            for i in range(num_hashes)
        ]
    )
    # One slim hash-repartition on id over the finished signatures: the LSH
    # band self-join consumes this frame on BOTH sides, and without an
    # exchange boundary Spark re-executes the whole hash projection per
    # side (no cross-side CSE); with it, the second side is a
    # ReusedExchange of 32 longs/doc. Measured: 5.2 s -> 2.7 s full
    # minhash pipeline at sf0.1 (3.65 s before this rework).
    return hashed.select("id", sig.alias("sig")).repartition(F.col("id"))


def minhash_banded(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_size: int = 3,
    portable: bool = False,
) -> DataFrame:
    """Per-document banded MinHash signatures ``(id, band_id, band_hash)``
    — the LSH INDEX rows (what a maintained near-dup index stores per
    document). Shared by the symmetric candidate miner
    (:func:`minhash_lsh_candidates`) and the asymmetric incremental probe
    (new batch vs frozen corpus index, ``queries/dedup.py:
    dedup_incremental_lsh``). Signatures ride the scan (zero shuffle
    before the consumer's band join)."""
    rows_per_band = num_hashes // bands
    sig = _minhash_signatures(
        token_set_df(df, id_col, text_col, shingle_size), num_hashes, portable=portable
    )

    def band_key(b: int) -> Column:
        cols = [F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)]
        if portable:
            return F.concat_ws("-", *[c.cast("string") for c in cols])
        return F.xxhash64(*cols)

    return sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        band_key(b).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bh"),
    ).select("id", "bh.band_id", "bh.band_hash")


def band_candidates(
    banded_a: DataFrame,
    banded_b: DataFrame,
    a_col: str,
    b_col: str,
    ordered: bool = True,
    max_bucket_occupancy: int | None = None,
) -> DataFrame:
    """Candidate pairs from two banded-signature legs (``id``, ``band_id``,
    ``band_hash``): equi-join on the band key, distinct pair output — the
    ONE home for the LSH candidate join, shared by the symmetric miners
    (``ordered=True`` adds the ``a < b`` self-join dedup) and the
    asymmetric incremental probe (``ordered=False``: new x old, the legs
    are already disjoint). A threshold or tie-rule change lands here once
    instead of forking per copy.

    ``max_bucket_occupancy`` is the band-join scale guard (r11, VERDICT
    r10 what's-wrong #1 — the ``max_token_doc_freq`` convention applied
    to the band grain): a bucket holding d index rows generates O(d^2)
    candidates in the self-join (d per probe row in the asymmetric one),
    so one degenerate band hash — boilerplate pages, templated documents,
    the common 100 TB case — silently turns never-all-pairs into
    all-pairs-within-one-bucket. With the cap set, buckets whose INDEX-leg
    (``banded_b``) occupancy exceeds it are excluded from candidate
    generation entirely: one bucket-grain rollup of the index (map-side
    combinable; index-maintenance cadence, the same rollup
    ``dedup_lsh_bucket_stats`` audits) and a semi-join laid over the index
    leg before the band join, so per-bucket candidate volume is bounded by
    ``cap × rows_a_in_bucket`` and nothing can go quadratic. Downstream
    exact verification is untouched — precision stays exact, only recall
    is capped (a pair colliding ONLY in over-cap buckets is missed; at
    dedup thresholds such pairs are boilerplate clones better handled by
    exact-duplicate collapsing or a re-band of the hot bucket,
    ``dedup_lsh_reband_hot``)."""
    r_src = banded_b
    if max_bucket_occupancy is not None:
        keep = (
            banded_b.groupBy("band_id", "band_hash")
            .agg(F.count(F.lit(1)).alias("__occ"))
            .filter(F.col("__occ") <= max_bucket_occupancy)
            .select("band_id", "band_hash")
        )
        # dropping the bucket key from ONE side of an equi-join removes
        # the bucket's candidates entirely; the index leg is the one whose
        # occupancy defines "hot"
        r_src = banded_b.join(keep, ["band_id", "band_hash"], "left_semi")
    l = banded_a.select("band_id", "band_hash", F.col("id").alias(a_col))
    r = r_src.select(
        F.col("band_id").alias("__band_id_r"),
        F.col("band_hash").alias("__band_hash_r"),
        F.col("id").alias(b_col),
    )
    cond = (F.col("band_id") == F.col("__band_id_r")) & (
        F.col("band_hash") == F.col("__band_hash_r")
    )
    if ordered:
        cond = cond & (F.col(a_col) < F.col(b_col))
    return l.join(r, cond).select(a_col, b_col).distinct()


def reband_hot_buckets(banded: DataFrame, cap: int) -> DataFrame:
    """Split over-cap LSH buckets by the FULL signature (r11 — the repair
    step the bucket audit drives, the dedup analog of an IVF hot-cell
    rebalance): rows whose ``(band_id, band_hash)`` bucket holds more
    than ``cap`` documents get their band key extended with the
    document's full signature (all band hashes joined in band order —
    i.e. rows-per-band raised to the whole signature for the hot bucket
    only), every other bucket frozen. A hot bucket therefore splits into
    exact-signature groups: documents identical in all mins stay
    together (true clone families), everything else separates — after
    which the occupancy cap no longer drops the bucket and the band join
    SERVES the family again (pinned in tests/test_r11_queries.py).

    Pure index maintenance: the salt is an aggregation of the banded
    index itself (one groupBy at document grain — no document re-scan,
    no re-signing; the hash family stays frozen), the hot set is the
    bucket-grain rollup the audit already runs (broadcast-sized), and
    the re-key is a projection. Returns the re-keyed
    ``(id, band_id, band_hash)`` frame."""
    occ = banded.groupBy("band_id", "band_hash").agg(
        F.count(F.lit(1)).alias("__occ")
    )
    hot = occ.filter(F.col("__occ") > cap).select(
        F.col("band_id").alias("__hot_band"),
        F.col("band_hash").alias("__hot_hash"),
        F.lit(True).alias("__is_hot"),
    )
    fsig = banded.groupBy("id").agg(
        F.concat_ws(
            "|",
            F.transform(
                F.array_sort(F.collect_list(F.struct("band_id", "band_hash"))),
                lambda s: s["band_hash"],
            ),
        ).alias("__fs")
    )
    return (
        banded.join(fsig, "id")
        .join(
            F.broadcast(hot),
            (F.col("band_id") == F.col("__hot_band"))
            & (F.col("band_hash") == F.col("__hot_hash")),
            "left",
        )
        .select(
            "id",
            "band_id",
            F.when(
                F.col("__is_hot"),
                F.concat(F.col("band_hash"), F.lit("~"), F.col("__fs")),
            )
            .otherwise(F.col("band_hash"))
            .alias("band_hash"),
        )
    )


def jaccard_verify(
    cands: DataFrame,
    toks: DataFrame,
    a_col: str,
    b_col: str,
    threshold: float,
) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs over hashed-shingle
    sets (``id``, ``ws``) — the shared verify stage of every
    candidates->verify dedup path: joins the two token legs for CANDIDATE
    rows only and keeps pairs at/above ``threshold``. Output:
    (a_col, b_col, jaccard)."""
    ta = toks.select(F.col("id").alias(a_col), F.col("ws").alias("ws_a"))
    tb = toks.select(F.col("id").alias(b_col), F.col("ws").alias("ws_b"))
    inter = F.size(F.array_intersect("ws_a", "ws_b")).cast("double")
    union = (F.size("ws_a") + F.size("ws_b")).cast("double") - inter
    return (
        cands.join(ta, a_col)
        .join(tb, b_col)
        .select(a_col, b_col, (inter / union).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_size: int = 3,
    portable: bool = False,
    max_bucket_occupancy: int | None = None,
) -> DataFrame:
    """LSH candidate pairs: equal band-signature in >=1 of ``bands`` bands.

    rows_per_band = num_hashes // bands; P(candidate) = 1-(1-j^r)^b — with
    the 32/8 default (r=4) recall at j=0.9 is 0.9998 while j=0.5 pairs are
    sampled at ~40% (candidate volume only, not correctness — candidates
    are exact-verified downstream; shingle jaccard between non-dups is far
    below 0.5, so the mid-similarity band is sparse in practice). Measured
    vs 64/8 on the fixture corpus: identical output, half the cost.
    Output: (doc_a, doc_b) distinct.

    ``portable=True``: md5-derived signature mins (see
    ``_minhash_signatures``) and a concat-of-mins band key instead of
    xxhash64-of-mins — the band equi-join carries a short string key
    instead of a long, in exchange for DuckDB being able to replay the
    candidate set exactly.
    """
    banded = minhash_banded(
        df, id_col, text_col, num_hashes, bands, shingle_size, portable=portable
    )
    return band_candidates(
        banded, banded, "doc_a", "doc_b", ordered=True,
        max_bucket_occupancy=max_bucket_occupancy,
    )


def minhash_pairs_from_index(
    banded: DataFrame,
    toks: DataFrame,
    threshold: float = 0.9,
    max_bucket_occupancy: int | None = None,
) -> DataFrame:
    """MinHash-LSH verified pairs computed FROM the maintained index
    artifacts — ``banded`` (id, band_id, band_hash) and ``toks``
    (id, ws hashed-shingle sets), the frames ``queries/dedup.py:
    lsh_index_cached`` materializes — instead of re-mining signatures
    from text. Same candidate self-join and exact-Jaccard verification
    as :func:`minhash_neardup_pairs` (output pairs are identical), but
    the signature/shingle computation is paid once per corpus by the
    index build and every pair/cluster/probe consumer reads it — the
    pipeline-DAG topology a production dedup actually runs.
    ``max_bucket_occupancy`` applies the band-bucket cap at candidate
    generation (see :func:`band_candidates`)."""
    cands = band_candidates(
        banded, banded, "doc_a", "doc_b", ordered=True,
        max_bucket_occupancy=max_bucket_occupancy,
    )
    return jaccard_verify(cands, toks, "doc_a", "doc_b", threshold)


def minhash_signed_sets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    shingle_size: int = 3,
    portable: bool = False,
) -> DataFrame:
    """(id, ws hashed-shingle set, sig minhash array) from ONE corpus scan
    (r13, guide §2.3/§2.4/§8): the signature and verification sides of the
    LSH dedup family used to be two independent corpus passes — the
    candidate side tokenized + hashed every shingle twice (h1, h2) and the
    verify side re-tokenized the corpus a third hash pass for the shingle
    digests. The verify digest IS h1's hash: portable h1 is the int48 of
    md5(w)'s first 12 hex chars and the 13-hex verify digest carries those
    same 12 chars, so h1 derives from the digest with string ops only
    (bit-identical: substring(substring(md5,1,13),1,12) ==
    substring(md5,1,12)); non-portable h1 = pmod(xxhash64(w)) and the
    verify digest is xxhash64(w) itself. One projection computes the
    digest + h2 arrays, a second derives h1s from the digests (separate
    projections — CollapseProject keeps non-cheap aliases
    single-evaluated, the token_set_df staging rule), a third folds the
    minhash mins. ``ws`` and ``sig`` values are bit-identical to the old
    ``hashed_token_sets`` / ``_minhash_signatures`` pair; one tokenize +
    2 hash evaluations per shingle instead of two tokenizes + 3."""
    p = 2147483647  # 2^31-1 (see _minhash_signatures)
    if portable:
        digest_fn = lambda w: F.substring(F.md5(w), 1, 13)  # noqa: E731
        h1_fn = lambda d: F.pmod(  # noqa: E731
            F.conv(F.substring(d, 1, 12), 16, 10).cast("long"), F.lit(p)
        )
        h2_fn = lambda w: F.pmod(_md5_int48(w, "salt:"), F.lit(p))  # noqa: E731
    else:
        digest_fn = lambda w: F.xxhash64(w)  # noqa: E731
        h1_fn = lambda d: F.pmod(d, F.lit(p))  # noqa: E731
        h2_fn = lambda w: F.pmod(F.xxhash64(F.lit("salt"), w), F.lit(p))  # noqa: E731
    staged = (
        token_set_df(_spread_small_input(df, id_col), id_col, text_col, shingle_size)
        .select(
            "id",
            F.transform("ws", digest_fn).alias("__ds"),
            F.transform("ws", h2_fn).alias("h2s"),
        )
        .select("id", "__ds", F.transform("__ds", h1_fn).alias("h1s"), "h2s")
    )
    sig = F.array(
        *[
            F.array_min(
                F.zip_with("h1s", "h2s", lambda a, b: F.pmod(a + F.lit(i) * b, F.lit(p)))
            )
            for i in range(num_hashes)
        ]
    )
    # array_distinct on the digests mirrors hashed_token_sets exactly (ws
    # is already shingle-distinct; the second distinct guards the
    # astronomically-unlikely digest collision identically on both engines)
    return staged.select("id", F.array_distinct("__ds").alias("ws"), sig.alias("sig"))


def banded_from_sig(
    joint: DataFrame, num_hashes: int = 32, bands: int = 8, portable: bool = False
) -> DataFrame:
    """(id, band_id, band_hash) exploded from a ``sig``-carrying frame —
    the band-key arithmetic of :func:`minhash_banded`, applied to an
    already-computed signature column (values identical)."""
    rows_per_band = num_hashes // bands

    def band_key(b: int) -> Column:
        cols = [F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)]
        if portable:
            return F.concat_ws("-", *[c.cast("string") for c in cols])
        return F.xxhash64(*cols)

    return joint.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band_id"), band_key(b).alias("band_hash"))
                    for b in range(bands)
                ]
            )
        ).alias("bh"),
    ).select("id", "bh.band_id", "bh.band_hash")


def minhash_neardup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.9,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_size: int = 3,
    portable: bool = False,
    max_bucket_occupancy: int | None = None,
) -> DataFrame:
    """MinHash-LSH near-dup detection with exact-Jaccard verification of the
    candidate set (the standard candidates -> verify topology; verification
    joins shingle sets back in, so output pairs are exact-correct and only
    recall is approximate). Jaccard is over ``shingle_size``-gram shingle
    sets (the standard web-dedup formulation). ``portable=True`` swaps
    every engine-native hash for the md5-derived twin so a DuckDB oracle
    replays candidates AND verification exactly. ``max_bucket_occupancy``
    drops over-cap band buckets from candidate generation (the production
    posture — see :func:`band_candidates`); verification is unchanged."""
    # r13 (guide §2.3/§2.4/§8): ONE corpus scan feeds both the signature
    # and the verification legs — see minhash_signed_sets. A shared
    # id-hash exchange alone does NOT survive planning here: the band
    # joins broadcast one leg each (the streamed side is not an exchange,
    # the broadcast side plans its own subtree), so the executed plan
    # re-ran the scan+hash chain once per leg — 4 corpus scans, 6 md5
    # evaluations per shingle (measured; ReusedExchange never fired).
    # An EAGER localCheckpoint forces the joint frame to materialize
    # exactly once; all four legs then read the resident blocks. Per
    # invocation the hash work runs once (2 md5/shingle) and, via
    # _spread_small_input, across every core instead of the scan's one
    # split. Signatures, band keys, candidates and verified pairs are
    # all unchanged.
    from .similarity import checkpoint_index, narrow_resident

    joint = narrow_resident(
        checkpoint_index(
            minhash_signed_sets(
                df, id_col, text_col, num_hashes, shingle_size, portable=portable
            )
        ),
        df,
    )
    banded = banded_from_sig(joint, num_hashes, bands, portable=portable)
    cands = band_candidates(
        banded, banded, "doc_a", "doc_b", ordered=True,
        max_bucket_occupancy=max_bucket_occupancy,
    )
    toks = joint.select("id", "ws")
    return jaccard_verify(cands, toks, "doc_a", "doc_b", threshold)


def simhash(df: DataFrame, id_col: str, text_col: str, portable: bool = False) -> DataFrame:
    """SimHash per document: per-bit majority vote over token hashes.

    Expressed as explode -> per-bit conditional sums -> bit reassembly; all
    integer arithmetic, one shuffle on id. Output: (id, simhash long).

    ``portable=False``: 64-bit signature from xxhash64 (fastest).
    ``portable=True``: 60-bit signature from a 15-hex-char md5 prefix —
    the SAME integer both engines compute, so a DuckDB oracle can replay
    the signature, the pigeonhole bands, and the hamming verify exactly.
    60 vs 64 bits changes nothing structural (4 x 15-bit chunks instead of
    4 x 16-bit; hamming<=3 still implies >=1 equal chunk).
    """
    nbits = 60 if portable else 64
    tok = df.select(F.col(id_col).alias("id"), F.explode(_tokens(text_col)).alias("w"))
    if portable:
        h = tok.select(
            "id", F.conv(F.substring(F.md5("w"), 1, 15), 16, 10).cast("long").alias("h")
        )
    else:
        h = tok.select("id", F.xxhash64("w").alias("h"))
    votes = h.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{j}")
            for j in range(nbits)
        ]
    )
    sig = None
    for j in range(nbits):
        bit = F.when(F.col(f"b{j}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, j)
        sig = term if sig is None else sig.bitwiseXOR(term)
    return votes.select("id", sig.alias("simhash"))


def simhash_neardup_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3, portable: bool = False
) -> DataFrame:
    """SimHash near-dups: pigeonhole banding (4 chunks; hamming<=3 implies
    >=1 equal chunk) -> equi-join candidates -> exact hamming check via
    bit_count(xor). ``portable=True`` uses the 60-bit md5-derived
    signature (4 x 15-bit chunks) for cross-engine determinism."""
    chunk_bits = 15 if portable else 16
    chunk_mask = (1 << chunk_bits) - 1
    # r13 (guide §2.4/§5 — the minhash_neardup_pairs treatment): both
    # self-join legs re-planned the ENTIRE signature build (token explode
    # + per-token md5 + 60 conditional vote sums) — the expensive shared
    # subtree ran twice per invocation. One eager localCheckpoint of the
    # doc-grain (id, simhash) frame (input spread across cores first —
    # the vote aggregation is hash-chain CPU work) and both legs read the
    # resident rows. Signatures, candidates and hamming are unchanged.
    from .similarity import checkpoint_index

    sig = checkpoint_index(
        simhash(_spread_small_input(df, id_col), id_col, text_col, portable=portable)
    )
    chunks = sig.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_id"),
                        F.shiftright(F.col("simhash"), c * chunk_bits)
                        .bitwiseAND(F.lit(chunk_mask))
                        .alias("chunk"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ch"),
    ).select("id", "simhash", "ch.chunk_id", "ch.chunk")
    l = chunks.select("chunk_id", "chunk", F.col("id").alias("doc_a"), F.col("simhash").alias("sig_a"))
    r = chunks.select(
        F.col("chunk_id").alias("chunk_id_r"),
        F.col("chunk").alias("chunk_r"),
        F.col("id").alias("doc_b"),
        F.col("simhash").alias("sig_b"),
    )
    pairs = (
        l.join(
            r,
            (F.col("chunk_id") == F.col("chunk_id_r"))
            & (F.col("chunk") == F.col("chunk_r"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return pairs.select("doc_a", "doc_b", hamming.cast("long").alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    method: str = "block",
    n_blocks: int = 8,
    dim: int | None = None,
    n_planes: int = 8,
    n_tables: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >= t).

    Two paths:

    * ``method="block"`` — EXACT all-pairs via a block-grid (triangle)
      join. All-pairs cosine is O(n^2) comparisons by definition; the scale
      question is only how the n^2 work is distributed. Each row is hashed
      to one of ``n_blocks`` blocks; the B(B+1)/2 block PAIRS (bi <= bj)
      become the join key, so every task owns one block-pair's cross
      product (~ (n/B)^2 comparisons) and no side is ever broadcast or
      collected. Replication factor is B per side — at 100 TB you bound
      per-task work by raising ``n_blocks`` (tasks scale as B^2 while
      per-task cost falls as 1/B^2). This is the distributed-exact
      baseline; use it when the dedup contract demands full recall.
    * ``method="lsh"`` — random-hyperplane LSH: same-bucket candidates
      (equi-join, linear in corpus + candidate volume) -> exact cosine
      verify >= t. Approximate recall (grows with ``n_tables``); the 100 TB
      default, same banding topology as the MinHash path above.

    Output: (id_a, id_b, cosine) with ids canonicalized id_a < id_b and
    cosine the exact double in both methods (LSH verifies exactly, so it
    differs from "block" only in recall, never in reported values).
    """
    from .similarity import _as_double, _hyperplane, cosine_expr, lsh_bucket_expr

    rows = df.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    )
    cos = cosine_expr(F.col("va"), F.col("vb"))
    if method == "block":
        blk = rows.withColumn("blk", F.pmod(F.xxhash64("id"), F.lit(n_blocks)))
        spark = df.sparkSession
        grid = spark.range(n_blocks).select(F.col("id").alias("bi")).crossJoin(
            spark.range(n_blocks).select(F.col("id").alias("bj"))
        ).filter(F.col("bi") <= F.col("bj"))
        a = blk.join(F.broadcast(grid), blk.blk == grid.bi).select(
            "bi", "bj", F.col("id").alias("ida"), F.col("v").alias("va")
        )
        b = blk.join(F.broadcast(grid), blk.blk == grid.bj).select(
            F.col("bi").alias("bi2"),
            F.col("bj").alias("bj2"),
            F.col("id").alias("idb"),
            F.col("v").alias("vb"),
        )
        # diagonal block-pairs (bi == bj) see both orientations of a pair:
        # keep ida < idb there; off-diagonal pairs appear exactly once in
        # arbitrary orientation: keep all, canonicalize ids on output.
        cand = a.join(
            b, (F.col("bi") == F.col("bi2")) & (F.col("bj") == F.col("bj2"))
        ).filter((F.col("bi") < F.col("bj")) | (F.col("ida") < F.col("idb")))
        scored = cand.select(
            F.least("ida", "idb").alias("id_a"),
            F.greatest("ida", "idb").alias("id_b"),
            cos.alias("cosine"),
        )
        return scored.filter(F.col("cosine") >= threshold)
    if method != "lsh":
        raise ValueError(f"unknown method {method!r}")
    if dim is None:
        raise ValueError("method='lsh' requires dim")
    tb = []
    for t in range(n_tables):
        planes = [_hyperplane(dim, i, t) for i in range(n_planes)]
        tb.append(
            F.struct(
                F.lit(t).alias("table_id"),
                lsh_bucket_expr(F.col("v"), planes).alias("bucket"),
            )
        )
    bucketed = rows.select(
        "id", "v", F.explode(F.array(*tb)).alias("t")
    ).select("id", "v", "t.table_id", "t.bucket")
    left = bucketed.select("table_id", "bucket", F.col("id").alias("id_a"), F.col("v").alias("va"))
    right = bucketed.select("table_id", "bucket", F.col("id").alias("id_b"), F.col("v").alias("vb"))
    # score at the join, then collapse multi-table duplicates on the narrow
    # (id_a, id_b, cosine) shape — same slim-shuffle rule as lsh_bucketed_knn
    return (
        left.join(right, ["table_id", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .groupBy("id_a", "id_b")
        .agg(F.max("cosine").alias("cosine"))
    )
