"""Distributed k-means (Lloyd's algorithm) over the embedding column.

Document clustering is the unsupervised half of the embedding toolkit
(topic bucketing for data mixing, near-dup triage, IVF coarse quantizer
training — operators/similarity.py's IVF cells consume exactly this kind
of centroid table). Lloyd's on Spark is the classic model-on-driver loop:
the MODEL (k x d centroids) lives on the driver and broadcasts into a
narrow assignment map; the DATA never leaves the cluster — each round is
one narrow projection (distances against centroid literals, argmin) plus
one partial+final hash agg of per-(cluster, dim) sums. No join is needed
for assignment at all.

Engine portability follows operators/classify.py: components quantize to
integers (round(x * QUANT)), centroids STAY integer across rounds
(component mean rounded half-away-from-zero in pure integer arithmetic),
so every distance is an exact BIGINT, the argmin has no float boundary,
and the DuckDB twin (which recomputes the same rounds relationally, with
joins instead of broadcast literals — an independent derivation) matches
bit-for-bit. Ties: first (lowest) cluster index, via array_position of
the array minimum.

Determinism of init: the k vectors with the smallest ids, cluster j =
rank j. Empty clusters keep their previous centroid (documented Lloyd's
convention; the oracle's LEFT JOIN + COALESCE mirrors it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from saber_spark.operators.similarity import QUANT


def _int_mean(s: int, n: int) -> int:
    """Round-half-away-from-zero integer mean — identical to the oracle's
    pure-BIGINT expression (truncating and flooring division agree on the
    non-negative operands used here)."""
    if s >= 0:
        return (2 * s + n) // (2 * n)
    return -((-2 * s + n) // (2 * n))


def kmeans_assign(embeddings: DataFrame, k: int = 4, iterations: int = 3,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """-> (vec_id, cluster, dist2): final Lloyd's assignment after
    ``iterations`` centroid updates, dist2 = exact integer squared
    Euclidean distance in quantized space.

    Per round: ONE narrow map (distances against the broadcast-literal
    centroids + argmin — zero joins, zero shuffles) and ONE hash agg of
    (cluster, dim) sums; the driver collects only the k x d model
    (bounded, like pagerank's node count), never data rows.
    """
    q = F.transform(F.col(vec_col),
                    lambda x: F.round(x.cast("double") * QUANT).cast("long"))
    base = (embeddings.select(F.col(id_col), q.alias("qv"))
            .localCheckpoint(eager=True))

    seeds = base.orderBy(F.col(id_col).asc()).limit(k).collect()
    cents: list[list[int]] = [list(r.qv) for r in
                              sorted(seeds, key=lambda r: r[0])]
    if len(cents) < k:
        raise ValueError(f"kmeans_assign: need >= {k} vectors, "
                         f"got {len(cents)}")

    def dist_array():
        return F.array(*[
            F.aggregate(
                F.zip_with(F.col("qv"),
                           F.array(*[F.lit(c) for c in cent]),
                           lambda x, y: (x - y) * (x - y)),
                F.lit(0).cast("long"), lambda acc, x: acc + x)
            for cent in cents])

    def assigned():
        d = dist_array()
        return base.select(
            F.col(id_col), F.col("qv"),
            (F.array_position(d, F.array_min(d)) - 1).cast("long")
            .alias("cluster"),
            F.array_min(d).alias("dist2"))

    for _ in range(iterations):
        sums = (assigned()
                .select("cluster", F.posexplode("qv").alias("dim", "v"))
                .groupBy("cluster", "dim")
                .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
                .collect())
        new_cents = [list(c) for c in cents]  # empty cluster keeps centroid
        for r in sums:
            new_cents[r.cluster][r.dim] = _int_mean(r.s, r.n)
        cents = new_cents

    return assigned().select(id_col, "cluster", "dist2")


def semdedup(embeddings: DataFrame, k: int = 4, iterations: int = 3,
             threshold: float = 0.35, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023,
    arXiv:2303.09540): k-means clusters as the BLOCKING key, pairwise
    cosine only WITHIN a cluster, drop every vector that has a
    lower-id near-duplicate (cosine >= threshold) in its cluster.

    -> (vec_id, cluster, keep) — one row per input vector, keep=false
    for the dropped near-duplicates.

    This is the embedding-space sibling of the MinHash dedup_clusters
    chain: where LSH bands block lexical near-dups, the k-means
    assignment blocks SEMANTIC near-dups, so the pairwise verify is
    quadratic only in the largest cluster, never in the corpus. At
    100 TB the published recipe scales k with the corpus
    (k ~ N / target_cluster_size, same knob as derive_n_planes for the
    sign-LSH path) so cluster sizes — and therefore the per-cluster
    self-join fan-out — stay bounded; the assignment itself is the
    narrow broadcast-literal map from kmeans_assign (zero joins).

    Drop rule: SemDeDup keeps one representative per near-dup
    neighborhood; "lowest id wins" is the deterministic, engine-portable
    choice (the paper keeps a random member). Cosine is computed on the
    same quantized-BIGINT dot/norms as operators/similarity.py so the
    DuckDB twin agrees bit-for-bit before the final 6dp rounding.
    """
    from saber_spark.operators.similarity import _dot, _quantized

    assign = kmeans_assign(embeddings, k=k, iterations=iterations,
                           id_col=id_col, vec_col=vec_col)
    quant = _quantized(embeddings, id_col, vec_col)
    member = (assign.select(id_col, "cluster")
              .join(quant, id_col)
              .localCheckpoint(eager=True))  # reused by both join sides
    a = member.select(F.col("cluster"),
                      F.col(id_col).alias("vec_a"),
                      F.col("q").alias("q_a"),
                      F.col("norm2").alias("norm2_a"))
    b = member.select(F.col("cluster"),
                      F.col(id_col).alias("vec_b"),
                      F.col("q").alias("q_b"),
                      F.col("norm2").alias("norm2_b"))
    dropped = (a.join(b, "cluster")
               .filter(F.col("vec_a") < F.col("vec_b"))
               .filter((_dot(F.col("q_a"), F.col("q_b")) /
                        F.sqrt(F.col("norm2_a").cast("double") *
                               F.col("norm2_b").cast("double")))
                       >= threshold)
               .select(F.col("vec_b").alias("dropped_id"))
               .distinct())
    return (member.select(id_col, "cluster")
            .join(dropped, member[id_col] == dropped.dropped_id, "left")
            .select(id_col, "cluster",
                    F.col("dropped_id").isNull().alias("keep")))
