"""Similarity-search query catalog over the embeddings table — wraps
operators/similarity.py (driver [X] tier: ANN over array<float>).

Exact kNN and centroid/norm math are oracle-checked against DuckDB's list
functions (both sides computed in double with sequential accumulation).
The LSH variant registers rows-only (approximate recall), with recall
measured against the exact baseline in tests/test_operators.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.similarity import (
    brute_force_knn,
    centroids,
    ivf_knn,
    lsh_bucketed_knn,
    norm_expr,
)
from ..tables import load
from . import register

_KNN_ORACLE = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10
),
c AS (
  SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings WHERE vec_id >= 10
),
scored AS (
  SELECT
    query_id,
    neighbor_id,
    list_dot_product(qv, cv)
      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cosine
  FROM c CROSS JOIN q
)
SELECT query_id, neighbor_id, ROUND(cosine, 6) AS cosine_r, rank
FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
  FROM scored
)
WHERE rank <= 5
"""


@register("knn_cosine_topk", oracle=_KNN_ORACLE, tags=("vector", "knn"))
def knn_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for a 10-query batch: broadcast queries, streamed
    corpus, per-query WindowGroupLimit top-k. Cosine rounded to 6 dp in the
    OUTPUT only (ranking uses the raw double; both engines fold the 64-dim
    dot product sequentially in double, so ranks agree)."""
    (emb,) = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    c = emb.filter(F.col("vec_id") >= 10)
    knn = brute_force_knn(c, q, id_col="vec_id", vec_col="embedding", k=5)
    return knn.select(
        "query_id", "neighbor_id", F.round("cosine", 6).alias("cosine_r"), "rank"
    )


_CENTROID_ORACLE = """
WITH ex AS (
  SELECT label, UNNEST(embedding::DOUBLE[]) AS val,
         GENERATE_SUBSCRIPTS(embedding, 1) - 1 AS pos
  FROM embeddings
)
SELECT
  label,
  CAST(pos AS INT) AS pos,
  ROUND(CAST(SUM(CAST(ROUND(val * 1000000.0) AS BIGINT)) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE) / 1000000.0, 6) AS centroid_val,
  COUNT(*) AS n_vecs
FROM ex
GROUP BY label, pos
"""


@register("vector_centroids", oracle=_CENTROID_ORACLE, tags=("vector", "agg"))
def vector_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroids in exploded (label, pos, value) form — vector
    averaging as a plain distributed aggregate. Components quantized to
    integer micro-units before summing (order-independent, engine-exact),
    like all other aggregates in this catalog."""
    (emb,) = load(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label", F.posexplode(F.transform("embedding", lambda x: x.cast("double")))
    )
    return (
        ex.groupBy("label", F.col("pos").cast("int").alias("pos"))
        .agg(
            F.round(
                F.sum(F.round(F.col("col") * 1_000_000.0).cast("long")).cast("double")
                / F.count(F.lit(1)).cast("double")
                / 1_000_000.0,
                6,
            ).alias("centroid_val"),
            F.count(F.lit(1)).alias("n_vecs"),
        )
        .select("label", "pos", "centroid_val", "n_vecs")
    )


_NORM_ORACLE = """
SELECT
  vec_id,
  label,
  ROUND(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS l2_norm,
  ROUND(list_aggregate(list_transform(embedding::DOUBLE[], x -> abs(x)), 'sum'), 6)
    AS l1_norm
FROM embeddings
WHERE list_aggregate(list_transform(embedding::DOUBLE[], x -> abs(x)), 'sum') > 6.4
"""


@register("vector_norms", oracle=_NORM_ORACLE, tags=("vector",))
def vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2/L1 norms with a selectivity filter — scalar vector math as
    scan-side expressions. (Fixture embeddings are L2-normalized, so the
    filter runs on L1 which actually varies; threshold ~median.)"""
    (emb,) = load(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    l1 = F.aggregate(
        F.transform(v, lambda x: F.abs(x)), F.lit(0.0), lambda acc, x: acc + x
    )
    return (
        emb.select("vec_id", "label", norm_expr(v).alias("norm_raw"), l1.alias("l1_raw"))
        .filter(F.col("l1_raw") > 6.4)
        .select(
            "vec_id",
            "label",
            F.round("norm_raw", 6).alias("l2_norm"),
            F.round("l1_raw", 6).alias("l1_norm"),
        )
    )


@register("ann_ivf_topk", oracle=None, tags=("vector", "ivf"))
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via IVF: distributed k-means coarse quantizer,
    corpus bucketed once, queries probe 4 of 16 cells, exact re-rank of
    ~25% of the corpus per query. Rows-only (approximate recall; measured
    against brute force in tests/test_operators.py)."""
    (emb,) = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    c = emb.filter(F.col("vec_id") >= 10)
    return ivf_knn(
        c, q, id_col="vec_id", vec_col="embedding", k=5, n_clusters=16, nprobe=4
    )


@register("ann_lsh_topk", oracle=None, tags=("vector", "lsh"))
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via random-hyperplane LSH (8 planes x 2 tables) +
    exact re-rank of candidates. Rows-only: recall is probabilistic;
    measured against brute force in tests/test_operators.py."""
    (emb,) = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    c = emb.filter(F.col("vec_id") >= 10)
    return lsh_bucketed_knn(
        c, q, id_col="vec_id", vec_col="embedding", k=5, dim=64, n_planes=8, n_tables=2
    )
