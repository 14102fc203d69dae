"""Behavioral pins for the round-8 query additions — hand-computed
expectations the oracle parity check can't distinguish from a
both-engines-wrong-the-same-way bug: passage-removal keep-first
semantics, and the incremental LSH probe's asymmetry (new x new pairs
must NOT match)."""

from __future__ import annotations

import pytest

from vmhub_data_pipeline_spark import queries as catalog

catalog._load_all()
Q = {n: q.fn for n, q in catalog.REGISTRY.items()}


def test_passage_rebuild_hand_corpus(spark, tmp_path):
    """Crafted corpus: doc 2 repeats doc 1's first 10-token window (doc 1
    keeps it — first occurrence corpus-wide — doc 2 loses everything);
    doc 5 repeats the same passage twice, so BOTH its occurrences are
    non-first and the whole doc is excised; unique and too-short docs
    pass through byte-identical."""
    w = [f"w{i}" for i in range(1, 13)]
    uniq = " ".join(f"u{i}" for i in range(10))
    rows = [
        (1, " ".join(w)),                       # holds the FIRST occurrence
        (2, " ".join(w[:10])),                  # 2nd occurrence -> fully excised
        (3, uniq),                              # unique -> intact
        (4, "a b c"),                           # < 10 tokens -> intact
        (5, " ".join(w[:10]) + " " + " ".join(w[:10])),  # 3rd + 4th occurrence
        (6, None),                              # NULL text -> empty doc, kept
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/documents.parquet")
    out = {
        r["doc_id"]: r
        for r in Q["text_passage_dedup_rebuild"](spark, str(tmp_path)).collect()
    }
    assert set(out) == {1, 2, 3, 4, 5, 6}
    # doc 1: its w1..w10 window is the corpus-wide first occurrence; the
    # two seam windows (w2..w11, w3..w12) are unique -> nothing excised
    assert out[1]["n_excised_windows"] == 0
    assert out[1]["n_tokens"] == 12 and out[1]["n_tokens_kept"] == 12
    assert out[1]["cleaned_text"] == " ".join(w)
    # doc 2: single window, non-first -> every token covered
    assert out[2]["n_excised_windows"] == 1
    assert out[2]["n_tokens_kept"] == 0 and out[2]["cleaned_text"] == ""
    # doc 3 / doc 4: untouched (doc 4 emits no windows at all)
    assert out[3]["cleaned_text"] == uniq and out[3]["n_excised_windows"] == 0
    assert out[4]["n_tokens"] == 3 and out[4]["n_tokens_kept"] == 3
    assert out[4]["cleaned_text"] == "a b c"
    # doc 6: NULL text behaves as the empty document on BOTH engines
    # (split('') = one empty token; no windows, nothing excised) — the
    # row must exist, matching the oracle's COALESCE
    assert out[6]["n_tokens"] == 1 and out[6]["n_tokens_kept"] == 1
    assert out[6]["n_excised_windows"] == 0 and out[6]["cleaned_text"] == ""
    # doc 5: windows at positions 1 and 11 are the 3rd/4th occurrences of
    # the shared passage (the 9 seam windows are unique) -> both excised,
    # covering all 20 tokens
    assert out[5]["n_excised_windows"] == 2
    assert out[5]["n_tokens"] == 20 and out[5]["n_tokens_kept"] == 0
    assert out[5]["cleaned_text"] == ""


@pytest.mark.slow
def test_incremental_lsh_asymmetry_hand_corpus(spark, tmp_path):
    """Crafted corpus with max(doc_id)=10 -> cutoff 8: new batch {8,9,10}
    probes old corpus {1..7} ONLY. Doc 8 duplicates old doc 3 (must
    match, jaccard 1.0); doc 9 is unique; doc 10 duplicates NEW doc 9 —
    and must NOT match, because new x new pairs are outside the
    incremental contract (a full re-mine would catch them; the daily
    probe's job is strictly batch-vs-index)."""
    olds = [
        (i, " ".join(f"d{i}t{j}" for j in range(12))) for i in range(1, 8)
    ]
    nine = " ".join(f"n9t{j}" for j in range(12))
    rows = olds + [
        (8, olds[2][1]),  # copy of old doc 3
        (9, nine),        # unique new doc
        (10, nine),       # copy of NEW doc 9 -> must not match
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/documents.parquet")
    out = {
        r["doc_id"]: r
        for r in Q["dedup_incremental_lsh"](spark, str(tmp_path)).collect()
    }
    assert set(out) == {8, 9, 10}
    assert out[8]["is_near_dup_of_corpus"] is True
    assert out[8]["n_old_matches"] == 1
    assert out[8]["best_match_old_id"] == 3
    assert out[8]["best_jaccard"] == 1.0
    for new_id in (9, 10):
        assert out[new_id]["is_near_dup_of_corpus"] is False
        assert out[new_id]["n_old_matches"] == 0
        assert out[new_id]["best_match_old_id"] is None
        assert out[new_id]["best_jaccard"] is None


@pytest.mark.slow
def test_incremental_cutoff_truncates_on_both_engines(spark, tmp_path):
    """max(doc_id)=11 makes the 80% cutoff 8.8 — Spark must FLOOR it to 8
    (matching the oracle's explicit FLOOR; a bare BIGINT cast rounds to 9
    in DuckDB but truncates in Spark, silently shifting one doc across
    the new/old boundary)."""
    rows = [(i, " ".join(f"d{i}t{j}" for j in range(12))) for i in range(1, 12)]
    rows[7] = (8, rows[2][1])  # new doc 8 duplicates old doc 3
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/documents.parquet")
    out = {
        r["doc_id"]: r
        for r in Q["dedup_incremental_lsh"](spark, str(tmp_path)).collect()
    }
    # floor(8.8) = 8 -> docs 8..11 are the new batch (a rounding cutoff
    # of 9 would have dropped doc 8 and its match from the batch)
    assert set(out) == {8, 9, 10, 11}
    assert out[8]["is_near_dup_of_corpus"] is True
    assert out[8]["best_match_old_id"] == 3


def test_streaming_ann_route_equals_batch_probe(spark, sf_dir):
    """The streamed route must reproduce the batch IVF probe EXACTLY — same
    frozen index, same probe-cell tie conventions, so row-for-row equality
    with ann_ivf_topk (which hash-matches the Lloyd-replay oracle) proves
    the stream-static join + streaming top-k aggregation introduced no
    semantic drift."""
    batch = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine_r"])
        for r in Q["ann_ivf_topk"](spark, sf_dir).collect()
    }
    routed = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine_r"])
        for r in Q["streaming_ann_route"](spark, sf_dir).collect()
    }
    assert routed == batch
    assert len(routed) == 50  # 10 queries x top-5


@pytest.mark.slow
def test_ivf_rebalance_splits_the_audited_hot_cell(spark, sf_dir):
    """The split must (a) target exactly the cell the occupancy audit
    ranks hottest (same count-DESC, bucket-ASC tie rule), (b) cover that
    cell's members exactly once, and (c) actually split — both
    sub-clusters non-empty, so the hot list shrinks and the appended cell
    16 is born with the remainder."""
    audit = Q["ann_ivf_cell_stats"](spark, sf_dir).collect()
    hot = sorted(audit, key=lambda r: (-r["n_vecs"], r["bucket"]))[0]
    moves = Q["ann_ivf_rebalance"](spark, sf_dir).collect()
    assert {r["old_bucket"] for r in moves} == {hot["bucket"]}
    assert len(moves) == hot["n_vecs"]
    assert len({r["vec_id"] for r in moves}) == len(moves)
    kept = sum(1 for r in moves if r["new_bucket"] == hot["bucket"])
    appended = sum(1 for r in moves if r["new_bucket"] == 16)
    assert kept + appended == len(moves)
    assert kept > 0 and appended > 0  # a real split, not a rename


@pytest.mark.slow
def test_late_data_drop_semantics_hand_corpus(spark, tmp_path):
    """Crafted arrival history pinning BOTH probed Spark semantics the
    oracle replays: the drop predicate is window-end vs watermark (user 3
    has ts BELOW the watermark but an open window -> admitted), and
    closed-window stragglers are dropped (user 10's day-2 window closed
    long before the late batch -> gone). Watermark = max on-time ts
    (user 2, day5 07:33) minus 1 day = day4 07:33."""
    rows = [
        (1, "2024-01-01 10:00:00", 1, "c", 2.0, None),   # on-time (1%7=1)
        (2, "2024-01-05 07:33:00", 2, "c", 4.0, None),   # on-time max
        (3, "2024-01-04 03:00:00", 3, "c", 8.0, None),   # late, open window -> kept
        (4, "2024-01-02 12:00:00", 10, "c", 16.0, None), # late, closed window -> dropped
    ]
    import pyspark.sql.functions as F

    spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string, value double, props string"
    ).select(
        "event_id", F.to_timestamp("ts_s").alias("ts"), "user_id",
        "event_type", "value", "props",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {
        str(r["window_start"]): (r["n_events"], float(r["sum_value"]))
        for r in Q["streaming_late_data_drop"](spark, str(tmp_path)).collect()
    }
    assert out == {
        "2024-01-01 00:00:00": (1, 2.0),
        "2024-01-04 00:00:00": (1, 8.0),   # the admitted straggler
        "2024-01-05 00:00:00": (1, 4.0),
    }  # no day-2 row (dropped), no sentinel window (never finalized)


@pytest.mark.slow
def test_streaming_route_handles_zero_norm_candidates(spark, tmp_path):
    """Crafted corpus where a zero-norm junk vector (vec_id 26) lands in a
    cell EVERY query probes (orthogonal anchors; the small-norm cell wins
    every probe ranking because probe score is <q,c> - |c|^2/2): its
    cosine is NULL for all 10 queries, and the streamed route must sort it
    LAST like the batch probe's NULLS-LAST window. Pre-fix, the route's
    struct sort put the NULL field FIRST — making the junk vector the #1
    streamed neighbor of every query while batch/oracle excluded it."""
    import pyspark.sql.functions as F

    def anchor(i, scale):
        v = [0.0] * 64
        v[i] = scale
        return v

    rows = [(i, anchor(5, 1.0 + 0.1 * i)) for i in range(10)]  # queries
    rows += [
        (10 + j, anchor(j, 0.001 if j == 5 else 1.0 + 0.1 * j))
        for j in range(16)
    ]  # seeds: orthogonal anchors, one tiny-norm
    rows.append((26, [0.0] * 64))  # zero-norm junk
    rows += [(27 + t, anchor(5, 2.0 + 0.1 * t)) for t in range(5)]  # fillers
    spark.createDataFrame(rows, "vec_id long, embedding array<float>").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/embeddings.parquet")

    # precondition: the junk vector's cell is probed by EVERY query, so
    # its NULL cosine is a live candidate in the route's sort
    from vmhub_data_pipeline_spark.operators.similarity import _probe_cells_col
    from vmhub_data_pipeline_spark.queries.vector import ivf_index_cached

    cents, index = ivf_index_cached(spark, str(tmp_path), n_clusters=16, max_iter=3)
    junk_cell = index.filter(F.col("neighbor_id") == 26).collect()[0]["bucket"]
    emb = spark.read.parquet(f"{tmp_path}/embeddings.parquet")
    probed = (
        emb.filter(F.col("vec_id") < 10)
        .select(F.transform("embedding", lambda x: x.cast("double")).alias("qv"))
        .select(_probe_cells_col(cents, 4).alias("cells"))
        .collect()
    )
    assert all(junk_cell in r["cells"] for r in probed)

    batch = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine_r"])
        for r in Q["ann_ivf_topk"](spark, str(tmp_path)).collect()
    }
    routed = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine_r"])
        for r in Q["streaming_ann_route"](spark, str(tmp_path)).collect()
    }
    assert routed == batch
    assert all(nid != 26 for nid, _ in routed.values())  # junk out of every top-5


@pytest.mark.slow
def test_filtered_topk_respects_allow_list(spark, sf_dir):
    """ann_ivfpq_filtered_topk (r8b): every returned neighbor must satisfy
    the allow-list predicate (label % 3 = 0) — the guarantee
    post-filtering a fixed shortlist cannot give — and the search must
    still return a full top-5 per query, ranked by exact re-ranked
    cosine. The unfiltered probe's results prove the filter did real
    work: at least one forbidden id sits in some unfiltered top-5."""
    labels = {
        r["vec_id"]: r["label"]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "label")
        .collect()
    }
    rows = Q["ann_ivfpq_filtered_topk"](spark, sf_dir).collect()
    assert rows, "filtered search returned nothing"
    per_q: dict[int, list] = {}
    for r in rows:
        assert labels[r["corpus_id"]] % 3 == 0, r
        per_q.setdefault(r["query_id"], []).append(r)
    for qid, out in per_q.items():
        ranks = sorted(x["rank"] for x in out)
        assert ranks == list(range(1, len(out) + 1)), (qid, ranks)
        by_rank = sorted(out, key=lambda x: x["rank"])
        cosines = [x["cosine"] for x in by_rank]
        assert cosines == sorted(cosines, reverse=True), (qid, cosines)
    unfiltered = Q["ann_ivfpq_topk"](spark, sf_dir).collect()
    assert any(labels[r["corpus_id"]] % 3 != 0 for r in unfiltered), (
        "fixture degenerate: the unfiltered top-5s contain no forbidden "
        "ids, so this test cannot distinguish filtered from unfiltered"
    )


def test_ivf_delete_audit_adds_up(spark, sf_dir):
    """ann_ivf_delete (r8b): the audit must conserve rows — per cell
    n_before = n_removed + n_after, the before-counts sum to the whole
    corpus (every vector sits in exactly one inverted list), and the
    removed-counts sum to exactly the tombstone batch size."""
    import pyspark.sql.functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus_n = emb.filter(F.col("vec_id") >= 10).count()
    tomb_n = emb.filter(
        (F.col("vec_id") >= 10) & (F.col("vec_id") % 97 == 0)
    ).count()
    assert tomb_n > 0, "fixture degenerate: empty tombstone batch"
    rows = Q["ann_ivf_delete"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_before"] == r["n_removed"] + r["n_after"], r
        assert r["n_removed"] >= 0 and r["n_after"] >= 0, r
    assert sum(r["n_before"] for r in rows) == corpus_n
    assert sum(r["n_removed"] for r in rows) == tomb_n


def test_persist_probe_equals_resident_probe(spark, sf_dir):
    """ann_ivfpq_persist_probe (r8b): the probe from the PERSISTED
    parquet artifact must reproduce the resident-index probe
    row-for-row — the proof the serving handoff (write_index /
    read_index) round-trips centroids, codebooks, and lists
    losslessly."""
    a = sorted(map(tuple, Q["ann_ivfpq_persist_probe"](spark, sf_dir).collect()))
    b = sorted(map(tuple, Q["ann_ivfpq_topk"](spark, sf_dir).collect()))
    assert a == b
