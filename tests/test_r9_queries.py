"""Round-9 pins: LSH index APPEND (growth ≡ rebuild, post-append probe
sees the batch), streamed IVF-PQ index growth, and OPQ recall."""

from __future__ import annotations

import pyspark.sql.functions as F

from vmhub_data_pipeline_spark import queries as catalog
from vmhub_data_pipeline_spark.queries.dedup import (
    _lsh_batch_cut,
    lsh_index_appended,
    lsh_index_cached,
)

catalog._load_all()
Q = catalog.REGISTRY


def _same_rowset(a, b) -> bool:
    return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_lsh_append_equals_full_rebuild(spark, sf_dir):
    """append(frozen, batch) ≡ rebuild(corpus): merging the batch's
    freshly-signed band rows and shingle sets into the frozen index
    yields exactly the index a full rebuild would — the correctness
    contract that lets the daily pipeline append instead of re-mining."""
    grown_banded, grown_toks = lsh_index_appended(spark, sf_dir)
    full_banded, full_toks = lsh_index_cached(spark, sf_dir)
    assert _same_rowset(grown_banded, full_banded)
    assert _same_rowset(grown_toks, full_toks)


def test_lsh_append_then_probe_finds_new_batch_dup(spark, sf_dir):
    """Index GROWTH is observable: a probe document duplicating a
    new-batch document finds it in the grown index (band-hash collision
    on every band — identical text, identical signature) and cannot find
    it in the frozen index (its rows predate the batch)."""
    from vmhub_data_pipeline_spark.operators.dedup import (
        band_candidates,
        minhash_banded,
    )
    from vmhub_data_pipeline_spark.tables import load

    cut = _lsh_batch_cut(spark, sf_dir)
    (docs,) = load(spark, sf_dir, "documents")
    target = (
        docs.filter(F.col("doc_id") >= cut)
        .orderBy(F.desc("doc_id"))
        .select("doc_id", "text")
        .limit(1)
        .collect()[0]
    )
    probe = spark.createDataFrame(
        [(-1, target["text"])], "doc_id BIGINT, text STRING"
    )
    probe_banded = minhash_banded(probe, "doc_id", "text", portable=True)

    grown_banded, _ = lsh_index_appended(spark, sf_dir)
    grown_hits = {
        r["hit_id"]
        for r in band_candidates(
            probe_banded, grown_banded, "probe_id", "hit_id", ordered=False
        ).collect()
    }
    assert target["doc_id"] in grown_hits

    frozen_hits = {
        r["hit_id"]
        for r in band_candidates(
            probe_banded,
            grown_banded.filter(F.col("id") < cut),
            "probe_id",
            "hit_id",
            ordered=False,
        ).collect()
    }
    assert target["doc_id"] not in frozen_hits


def test_lsh_append_audit_row_shape(spark, sf_dir):
    """One row per band; conservation (before + added = after) and
    bucket monotonicity hold on every row."""
    rows = Q["dedup_lsh_index_append"].fn(spark, sf_dir).collect()
    assert len(rows) == 8
    for r in rows:
        assert r["rows_before"] + r["rows_added"] == r["rows_after"]
        assert r["buckets_after"] >= r["buckets_before"]
        assert 0 <= r["new_buckets"] <= r["rows_added"]
        assert 0 <= r["collided_rows"] <= r["rows_added"]
        # every batch row either collides with a frozen bucket or lands in
        # a (possibly shared) new bucket
        assert r["collided_rows"] + r["new_buckets"] <= r["rows_added"]
