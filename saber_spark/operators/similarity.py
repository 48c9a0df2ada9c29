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


def derive_n_planes(corpus_count: int, target_bucket_size: int = 256) -> int:
    """Plane count that keeps expected bucket size ~target as the corpus
    grows: 2^n_planes buckets => n_planes = ceil(log2(N / target)).

    This is the 100-TB guardrail: with a CONSTANT plane count, within-bucket
    pair count grows quadratically with the corpus; deriving it from N keeps
    per-bucket work bounded (pairs per bucket ~ target^2, buckets ~ N/target,
    total candidate pairs ~ N * target — linear in N).
    """
    import math
    if corpus_count <= target_bucket_size:
        return 1
    return max(1, math.ceil(math.log2(corpus_count / target_bucket_size)))


def random_planes(dim: int, n_planes: int, n_bands: int = 1,
                  seed: int = 7) -> list[list[list[float]]]:
    """Deterministic Gaussian hyperplanes, one set per band.

    Axis-aligned planes (the oracle-portable variant below) skew badly when
    real embeddings concentrate in an orthant; Gaussian planes split any
    direction-uniform-ish cloud evenly. Rounded to 6 decimals so the same
    literals are embeddable in an oracle SQL if needed.
    """
    import numpy as np
    rng = np.random.default_rng(seed)
    arr = rng.standard_normal((n_bands, n_planes, dim)).round(6)
    return [[list(map(float, p)) for p in band] for band in arr]


def lsh_bucket(embeddings: DataFrame, n_planes: int = 4, band: int = 0,
               planes: list[list[float]] | None = None,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Sign-LSH bucket id -> (id, vec, bucket).

    planes=None: axis hyperplanes offset by band (bit j tests component
    band*n_planes + j >= 0) — engine-portable, used by the oracle queries.
    planes given: sign of the dot product with each (broadcast-literal)
    random hyperplane — the production path for real embeddings.
    """
    bucket = F.lit(0)
    for j in range(n_planes):
        if planes is None:
            test = F.element_at(F.col(vec_col), band * n_planes + j + 1) >= 0
        else:
            plane = F.array(*[F.lit(v) for v in planes[j]])
            dot = F.aggregate(
                F.zip_with(F.col(vec_col), plane,
                           lambda x, y: x.cast("double") * y),
                F.lit(0.0), lambda acc, x: acc + x)
            test = dot >= 0
        bucket = bucket + F.when(test, F.lit(1 << j)).otherwise(F.lit(0))
    return embeddings.select(F.col(id_col), F.col(vec_col),
                             bucket.alias("bucket"))


def lsh_candidates(embeddings: DataFrame, n_planes: int, n_bands: int = 1,
                   planes_per_band: list[list[list[float]]] | None = None,
                   id_col: str = "vec_id", vec_col: str = "embedding"
                   ) -> DataFrame:
    """Candidate (query_id, neighbor_id) pairs via multi-band OR.

    A pair is a candidate if it shares a bucket in ANY band (each band uses
    its own plane set). Banding restores the recall a single deep code loses:
    P(candidate) = 1 - (1 - s^n_planes)^n_bands for sign-agreement rate s.
    Pairs are deduplicated BEFORE scoring so a pair colliding in several
    bands is scored once.
    """
    per_band = []
    for b in range(n_bands):
        planes = None if planes_per_band is None else planes_per_band[b]
        bucketed = lsh_bucket(embeddings, n_planes, band=b, planes=planes,
                              id_col=id_col, vec_col=vec_col)
        ids = bucketed.select(F.col(id_col), "bucket")
        left = ids.select(F.col(id_col).alias("query_id"), "bucket")
        right = ids.select(F.col(id_col).alias("neighbor_id"), "bucket")
        per_band.append(
            left.join(right, "bucket")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id"))
    out = per_band[0]
    for cand in per_band[1:]:
        out = out.unionByName(cand)
    return out.distinct() if n_bands > 1 else out


def ivf_cosine_topk(embeddings: DataFrame, k: int = 3, n_centroids: int = 8,
                    n_probe: int = 2, n_queries: int | None = 10,
                    id_col: str = "vec_id", vec_col: str = "embedding"
                    ) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the cell-partitioned ANN
    variant next to sign-LSH.

    Coarse quantizer: the first ``n_centroids`` vectors (deterministic,
    engine-portable; production swaps in offline k-means centroids with the
    same shape). Every corpus vector is assigned to its best-cosine cell by
    a NARROW higher-order-function argmax over the broadcast-literal
    centroid array — no shuffle, no crossJoin row blowup. Queries probe
    their ``n_probe`` best cells; candidates are the corpus vectors in the
    probed cells (an equi-join on cell id — the inverted file), scored once
    with exact quantized cosine, per-query top-k.

    -> (query_id, neighbor_id, cosine rounded 6, rank). At 10^12 docs the
    candidate count per query is corpus/n_centroids * n_probe; n_centroids
    grows with the corpus (sqrt(N) rule of thumb) exactly like LSH's
    derive_n_planes.
    """
    corpus = _quantized(embeddings, id_col, vec_col)
    cent_rows = sorted(
        corpus.filter(F.col(id_col) < n_centroids).collect(),
        key=lambda r: r[id_col])
    if len(cent_rows) != n_centroids:
        # Non-contiguous / non-zero-based ids would silently yield fewer
        # centroids, null scores[0] and degraded assignments — fail loudly.
        raise ValueError(
            f"ivf_cosine_topk: expected {n_centroids} rows with "
            f"{id_col} < {n_centroids} to seed the coarse quantizer, found "
            f"{len(cent_rows)}; corpus ids must be contiguous from 0 "
            f"(or lower n_centroids)")
    # centroid array literal: struct(cid, q array<long>, norm2)
    cent_arr = F.array(*[
        F.struct(F.lit(int(r[id_col])).alias("cid"),
                 F.array(*[F.lit(int(x)) for x in r["q"]]).alias("cq"),
                 F.lit(int(r["norm2"])).alias("cnorm2"))
        for r in cent_rows])

    def cos_to(c):
        dot = F.aggregate(F.zip_with(F.col("q"), c["cq"], lambda x, y: x * y),
                          F.lit(0).cast("long"), lambda acc, x: acc + x)
        return dot / F.sqrt(F.col("norm2").cast("double") *
                            c["cnorm2"].cast("double"))

    # per-row scores over all cells: array<struct<cos,cid>>, sorted best-first
    # (cos DESC, cid ASC) — array_sort on (-cos, cid)
    scores = F.array_sort(F.transform(
        cent_arr, lambda c: F.struct((-cos_to(c)).alias("neg"),
                                     c["cid"].alias("cid"))))
    assigned = corpus.withColumn("cell", scores[0]["cid"])

    queries = assigned
    if n_queries is not None:
        queries = assigned.filter(F.col(id_col) < n_queries)
    probes = (queries
              .withColumn("probe", F.slice(scores, 1, n_probe))
              .select(F.col(id_col).alias("query_id"),
                      F.col("q").alias("q_query"),
                      F.col("norm2").alias("norm2_query"),
                      F.explode(F.col("probe")["cid"]).alias("cell")))
    cand = (probes.join(
        assigned.select(F.col(id_col).alias("neighbor_id"),
                        F.col("q"), F.col("norm2"), "cell"), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                (_dot(F.col("q_query"), F.col("q")) /
                 F.sqrt(F.col("norm2_query").cast("double") *
                        F.col("norm2").cast("double"))).alias("cos")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc())
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id",
                    F.round(F.col("cos"), 6).alias("cosine"), "rank"))


def embedding_near_dup(embeddings: DataFrame, threshold: float = 0.35,
                       n_planes: int | None = 3, n_bands: int = 2,
                       target_bucket_size: int = 256,
                       use_random_planes: bool = False, plane_seed: int = 7,
                       id_col: str = "vec_id", vec_col: str = "embedding"
                       ) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (threshold, not top-k).

    The embedding member of the dedup family (exact / MinHash-LSH / SimHash /
    n-gram Jaccard / embedding cosine): sign-LSH bucketed candidates
    (multi-band OR), each candidate pair verified once by quantized cosine,
    kept if >= threshold. -> (vec_a, vec_b, cosine) with vec_a < vec_b.
    Never all-pairs: candidate count is bounded by bucket sizes, which
    n_planes=None keeps bounded at any corpus scale (derive_n_planes).
    """
    if n_planes is None:
        n_planes = derive_n_planes(embeddings.count(), target_bucket_size)
    planes_per_band = None
    if use_random_planes:
        dim = len(embeddings.select(vec_col).first()[0])
        planes_per_band = random_planes(dim, n_planes, n_bands, plane_seed)
    cand = (lsh_candidates(embeddings, n_planes, n_bands, planes_per_band,
                           id_col, vec_col)
            .filter(F.col("query_id") < F.col("neighbor_id")))
    quant = _quantized(embeddings, id_col, vec_col)
    return (
        cand
        .join(quant.select(F.col(id_col).alias("query_id"),
                           F.col("q").alias("q_query"),
                           F.col("norm2").alias("norm2_query")), "query_id")
        .join(quant.select(F.col(id_col).alias("neighbor_id"),
                           F.col("q"), F.col("norm2")), "neighbor_id")
        .select(
            F.col("query_id").alias("vec_a"),
            F.col("neighbor_id").alias("vec_b"),
            (_dot(F.col("q_query"), F.col("q")) /
             F.sqrt(F.col("norm2_query").cast("double") *
                    F.col("norm2").cast("double"))).alias("cos"))
        .filter(F.col("cos") >= threshold)
        .select("vec_a", "vec_b", F.round(F.col("cos"), 6).alias("cosine"))
    )


def lsh_cosine_topk(embeddings: DataFrame, k: int = 3,
                    n_planes: int | None = 4, n_bands: int = 1,
                    target_bucket_size: int = 256,
                    use_random_planes: bool = False, plane_seed: int = 7,
                    id_col: str = "vec_id", vec_col: str = "embedding"
                    ) -> DataFrame:
    """Approximate top-k: candidates restricted to shared LSH buckets.

    -> (query_id, neighbor_id, cosine rounded 6, rank).

    n_planes=None derives the plane count from the corpus row count
    (one cheap count() job) so bucket sizes stay bounded at any scale;
    n_bands > 1 ORs several independent codes to recover recall;
    use_random_planes=True switches from axis planes (oracle-portable) to
    seeded Gaussian hyperplanes (robust to orthant-skewed embeddings).
    """
    if n_planes is None:
        n_planes = derive_n_planes(embeddings.count(), target_bucket_size)
    planes_per_band = None
    if use_random_planes:
        dim = len(embeddings.select(vec_col).first()[0])
        planes_per_band = random_planes(dim, n_planes, n_bands, plane_seed)

    cand = lsh_candidates(embeddings, n_planes, n_bands, planes_per_band,
                          id_col, vec_col)
    quant = _quantized(embeddings, id_col, vec_col)
    scored = (
        cand
        .join(quant.select(F.col(id_col).alias("query_id"),
                           F.col("q").alias("q_query"),
                           F.col("norm2").alias("norm2_query")), "query_id")
        .join(quant.select(F.col(id_col).alias("neighbor_id"),
                           F.col("q"), F.col("norm2")), "neighbor_id")
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


def pq_codes(embeddings: DataFrame, m: int = 4, n_codes: int = 8,
             id_col: str = "vec_id", vec_col: str = "embedding"
             ) -> DataFrame:
    """Product-quantization encode — the memory-side ANN component next to
    IVF (cell routing) and sign-LSH (hash routing): split each quantized
    vector into ``m`` contiguous subvectors and replace every subvector
    with the id of its nearest codeword, turning a d-dim float vector into
    ``m`` small codes (the PQ code of Jégou et al., TPAMI 2011). At 10^12
    docs this is what makes the candidate set RAM-resident: 64 floats
    (256 B) become m codes (m bytes at n_codes<=256).

    Codebook: per subspace, the subvectors of the first ``n_codes`` corpus
    vectors (deterministic + engine-portable, same convention as
    ivf_cosine_topk's coarse quantizer; production swaps in per-subspace
    k-means trained offline — the assignment plan below is unchanged).
    Assignment is a NARROW argmin per subspace over a broadcast-literal
    codeword array (higher-order zip_with/aggregate, exact integer L2 on
    the quantized components) — no shuffle, no crossJoin, no Python; the
    only job besides the scan is the bounded codebook collect.

    -> (vec_id, sub_id, code, dist2): one row per (vector, subspace) with
    the chosen codeword and its exact squared quantization error.
    Tie-break: dist2 ASC, code ASC (array_sort on the struct).
    """
    corpus = _quantized(embeddings, id_col, vec_col)
    cb_rows = sorted(
        corpus.filter(F.col(id_col) < n_codes).collect(),
        key=lambda r: r[id_col])
    if len(cb_rows) != n_codes:
        raise ValueError(
            f"pq_codes: expected {n_codes} rows with {id_col} < {n_codes} "
            f"to seed the codebook, found {len(cb_rows)}; corpus ids must "
            f"be contiguous from 0 (or lower n_codes)")
    dim = len(cb_rows[0]["q"])
    if dim % m:
        raise ValueError(f"pq_codes: dim {dim} not divisible by m={m}")
    sub_dim = dim // m

    per_sub = []
    for s in range(m):
        codewords = F.array(*[
            F.struct(
                F.lit(int(r[id_col])).alias("code"),
                F.array(*[F.lit(int(x))
                          for x in r["q"][s * sub_dim:(s + 1) * sub_dim]]
                        ).alias("cw"))
            for r in cb_rows])
        sub_q = F.slice(F.col("q"), s * sub_dim + 1, sub_dim)
        # exact integer L2^2 against every codeword; array_sort on the
        # (dist2, code) struct = argmin with the deterministic tie-break

        def dist_struct(c):
            return F.struct(
                F.aggregate(
                    F.zip_with(sub_q, c["cw"],
                               lambda x, y: (x - y) * (x - y)),
                    F.lit(0).cast("long"), lambda acc, x: acc + x
                ).alias("dist2"),
                c["code"].alias("code"))

        scored = F.array_sort(F.transform(codewords, dist_struct))
        per_sub.append(F.struct(
            F.lit(s).cast("int").alias("sub_id"),
            scored[0]["code"].alias("code"),
            scored[0]["dist2"].alias("dist2")))

    return (corpus
            .select(F.col(id_col).alias("vec_id"),
                    F.explode(F.array(*per_sub)).alias("pq"))
            .select("vec_id",
                    F.col("pq.sub_id").alias("sub_id"),
                    F.col("pq.code").alias("code"),
                    F.col("pq.dist2").alias("dist2")))
