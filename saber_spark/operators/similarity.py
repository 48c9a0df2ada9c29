"""Similarity search over embedding columns (array<float>).

Two paths, mirroring how a 100 TB training-data pipeline does ANN:
  cosine_topk      brute-force top-k — the correctness baseline. The big
                   side stays JVM-only: quantized integer dot products via
                   higher-order array functions (zip_with + aggregate), no
                   Python in the loop.
  lsh_cosine_topk  sign-LSH bucketing (random-hyperplane family, with
                   deterministic axis planes): candidates only within a
                   bucket -> the scale path; same scoring as brute force.

Engine-portability / determinism: embeddings are float32; naive double
summation is order-sensitive, so cross-engine value equality would be
flaky. We quantize each component to int (round(x * QUANT)) and compute
INTEGER dot products and norms — exact, order-independent, identical in any
engine — then derive cosine as a double from exact integers. This is honest
quantized cosine (standard practice for vector search at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

QUANT = 1000


def _quantized(embeddings: DataFrame, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    q = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * QUANT).cast("long"))
    norm = F.aggregate(
        F.col("q"), F.lit(0).cast("long"), lambda acc, x: acc + x * x)
    return (embeddings.select(F.col(id_col), q.alias("q"))
            .withColumn("norm2", norm))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"), lambda acc, x: acc + x)


def cosine_topk(embeddings: DataFrame, queries: DataFrame, k: int = 3,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """For each query vector: top-k neighbors by quantized cosine.

    -> (query_id, neighbor_id, cosine rounded 6, rank). Ties break on
    neighbor_id, so selection is fully deterministic.

    queries is small (it is broadcast); the corpus side never shuffles until
    the final per-query top-k (one shuffle on query_id with partial top-k
    via the window).
    """
    corpus = _quantized(embeddings, id_col, vec_col)
    qs = (_quantized(queries, id_col, vec_col)
          .select(F.col(id_col).alias("query_id"),
                  F.col("q").alias("q_query"),
                  F.col("norm2").alias("norm2_query")))
    scored = (
        corpus.crossJoin(F.broadcast(qs))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            (_dot(F.col("q"), F.col("q_query")) /
             F.sqrt(F.col("norm2").cast("double") *
                    F.col("norm2_query").cast("double"))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id",
                F.round(F.col("cos"), 6).alias("cosine"), "rank")
    )


def lsh_bucket(embeddings: DataFrame, n_planes: int = 4,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Sign-LSH bucket id from the first n_planes axis hyperplanes.

    bucket = sum over j < n_planes of (embedding[j] >= 0) << j.
    Axis-aligned planes keep the formula engine-portable; a production
    deployment swaps in broadcast random hyperplanes with the same shape.
    """
    bucket = F.lit(0)
    for j in range(n_planes):
        bucket = bucket + F.when(
            F.element_at(F.col(vec_col), j + 1) >= 0, F.lit(1 << j)
        ).otherwise(F.lit(0))
    return embeddings.select(F.col(id_col), F.col(vec_col),
                             bucket.alias("bucket"))


def lsh_cosine_topk(embeddings: DataFrame, k: int = 3, n_planes: int = 4,
                    id_col: str = "vec_id", vec_col: str = "embedding"
                    ) -> DataFrame:
    """Approximate top-k: candidates restricted to the same LSH bucket.

    -> (query_id, neighbor_id, cosine rounded 6, rank). The self-join is
    per-bucket (2^n_planes buckets), cutting pair count ~16x at n_planes=4;
    at 10^12 scale n_planes grows with log(corpus).
    """
    bucketed = lsh_bucket(embeddings, n_planes, id_col, vec_col)
    quant = _quantized(bucketed, id_col, vec_col).join(
        bucketed.select(id_col, "bucket"), id_col)
    left = quant.select(F.col(id_col).alias("query_id"),
                        F.col("q").alias("q_query"),
                        F.col("norm2").alias("norm2_query"), "bucket")
    right = quant.select(F.col(id_col).alias("neighbor_id"),
                         F.col("q"), F.col("norm2"), "bucket")
    scored = (
        left.join(right, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            (_dot(F.col("q_query"), F.col("q")) /
             F.sqrt(F.col("norm2_query").cast("double") *
                    F.col("norm2").cast("double"))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id",
                F.round(F.col("cos"), 6).alias("cosine"), "rank")
    )
