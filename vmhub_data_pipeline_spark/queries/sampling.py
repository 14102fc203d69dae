"""Dataset-assembly queries: the steps between "cleaned corpus" and
"training set" — deterministic split, stratified sampling, sequence
packing, global shuffle. All randomness is md5-derived from a seed + key
(see operators/sampling.py), so every query is a pure function and the
DuckDB oracle reproduces it exactly — including the distributed
zipWithIndex, whose dense positions are provably independent of Spark's
range-partition boundary sampling.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.sampling import (
    assign_split,
    pack_sequences,
    stratified_sample,
    zip_with_global_index,
)
from ..tables import load
from . import register

_SPLIT_ORACLE = """
WITH s AS (
  SELECT
    doc_id,
    n_chars,
    CASE
      WHEN substr(md5(concat('split-v1:', CAST(doc_id AS VARCHAR))), 1, 4) < 'cccc' THEN 'train'
      WHEN substr(md5(concat('split-v1:', CAST(doc_id AS VARCHAR))), 1, 4) < 'e666' THEN 'val'
      ELSE 'test'
    END AS split
  FROM documents
)
SELECT
  split,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM s
GROUP BY split
"""


@register("curation_hash_split", oracle=_SPLIT_ORACLE, tags=("curation",))
def curation_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test by derived hash — membership is a pure
    function of (seed, doc_id), so growing the corpus never moves a document
    between splits (no eval contamination). The split itself is a zero-
    shuffle projection; only this audit aggregation shuffles (3 groups)."""
    (docs,) = load(spark, sf_dir, "documents")
    return (
        assign_split(docs, "doc_id", seed="split-v1")
        .groupBy("split")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
    )


_STRATIFIED_ORACLE = """
SELECT doc_id, lang, source, sample_rank
FROM (
  SELECT
    doc_id, lang, source,
    CAST(ROW_NUMBER() OVER (
      PARTITION BY lang, source
      ORDER BY md5(concat('sample-v1:', CAST(doc_id AS VARCHAR))), doc_id
    ) AS BIGINT) AS sample_rank
  FROM documents
)
WHERE sample_rank <= 20
"""


@register("curation_stratified_sample", oracle=_STRATIFIED_ORACLE, tags=("curation",))
def curation_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 20 docs per (lang, source) stratum, chosen by a seeded uniform
    permutation. Compiles to WindowGroupLimit: map tasks forward at most 20
    rows per stratum into the shuffle, so a billion-row stratum costs the
    same as a hundred-row one downstream."""
    (docs,) = load(spark, sf_dir, "documents")
    return stratified_sample(
        docs, ["lang", "source"], 20, "doc_id", seed="sample-v1"
    ).select("doc_id", "lang", "source", "sample_rank")


_PACK_ORACLE = """
WITH t AS (
  SELECT
    source, doc_id,
    CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
p AS (
  SELECT
    source, doc_id, n_tokens,
    CAST(COALESCE(SUM(n_tokens) OVER (
      PARTITION BY source ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
    ), 0) AS BIGINT) AS tokens_before
  FROM t
)
SELECT
  source,
  CAST(FLOOR(tokens_before / 2048.0) AS BIGINT) AS bin_id,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM p
GROUP BY source, bin_id
"""


@register("curation_pack_sequences", oracle=_PACK_ORACLE, tags=("curation",))
def curation_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous 2048-token sequence packing, sharded by source: each shard
    packs independently (one hash shuffle, shards in parallel) — the
    pretraining shard layout. A doc straddling a boundary stays in the bin
    it starts in. Audited per (source, bin): doc count + token total."""
    (docs,) = load(spark, sf_dir, "documents")
    tokens = docs.select(
        "source",
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    packed = pack_sequences(
        tokens, shard_col="source", order_col="doc_id", token_col="n_tokens", budget=2048
    )
    return packed.groupBy("source", "bin_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )


_SHUFFLE_ORACLE = """
SELECT
  doc_id,
  CAST(ROW_NUMBER() OVER (
    ORDER BY md5(concat('shuffle-v1:', CAST(doc_id AS VARCHAR))), doc_id
  ) - 1 AS BIGINT) AS global_index
FROM documents
"""


@register("curation_global_shuffle", oracle=_SHUFFLE_ORACLE, tags=("curation",))
def curation_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle: dense 0-based position in the seeded-
    hash total order, computed WITHOUT a single-partition window — range
    repartition + per-partition prefix-sum enumerate (DataFrame-native
    zipWithIndex, see operators/sampling.py). The oracle's plain
    ROW_NUMBER() proves the distributed index equals the logical one."""
    (docs,) = load(spark, sf_dir, "documents")
    from ..operators.sampling import derived_hash

    keyed = docs.select(
        "doc_id", derived_hash("shuffle-v1", "doc_id").alias("sort_key")
    )
    indexed = zip_with_global_index(keyed, "sort_key", "doc_id", num_partitions=16)
    return indexed.select("doc_id", "global_index")
