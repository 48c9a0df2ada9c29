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
    # Driver fast path (r6): the whole Lloyd's loop is EXACT integer
    # arithmetic (quantized vectors, integer squared distances,
    # round-half-away integer centroid means), so when the quantized
    # table fits the session broadcast threshold — the same budget the
    # loop's per-round broadcast-literal centroids assume the table is
    # small against — one bounded collect runs all iterations in numpy
    # and returns the assignment as a literal frame: identical rows
    # (argmin takes the first minimal index in both), zero per-round
    # jobs (the former loop paid 2 jobs x iterations). Larger tables
    # keep the distributed loop.
    spark = embeddings.sparkSession
    _first = embeddings.select(F.size(F.col(vec_col)).alias("d")).first()
    _dim = int(_first["d"]) if _first and _first["d"] is not None else 0
    if _dim > 0:
        from saber_spark.operators.kge import _broadcast_threshold_bytes
        cap_rows = max(k, _broadcast_threshold_bytes(spark) // (_dim * 8))
        rows = (embeddings.select(F.col(id_col), q.alias("qv"))
                .limit(cap_rows + 1).collect())
        if len(rows) <= cap_rows:
            if len(rows) < k:
                raise ValueError(f"kmeans_assign: need >= {k} vectors, "
                                 f"got {len(rows)}")
            import numpy as np
            ids = [r[0] for r in rows]
            V = np.asarray([list(r["qv"]) for r in rows],
                           dtype=np.int64)
            order = sorted(range(len(ids)), key=lambda i: ids[i])
            C = V[order[:k]].copy()
            cl = d2 = None
            for it in range(iterations + 1):
                D = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
                cl = D.argmin(axis=1)
                d2 = D.min(axis=1)
                if it == iterations:
                    break
                for j in range(k):
                    m = cl == j
                    nj = int(m.sum())
                    if nj == 0:
                        continue  # empty cluster keeps its centroid
                    s = V[m].sum(axis=0)
                    C[j] = np.where(
                        s >= 0, (2 * s + nj) // (2 * nj),
                        -((-2 * s + nj) // (2 * nj)))
            from pyspark.sql import types as T
            id_type = embeddings.schema[id_col].dataType
            return spark.createDataFrame(
                [(ids[i], int(cl[i]), int(d2[i]))
                 for i in range(len(ids))],
                T.StructType([
                    T.StructField(id_col, id_type, True),
                    T.StructField("cluster", T.LongType(), False),
                    T.StructField("dist2", T.LongType(), False)]))
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


def cluster_validity(embeddings: DataFrame, k: int = 4,
                     iterations: int = 3, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Internal cluster-validity panel over the kmeans_assign
    partition: simplified silhouette (Hruschka et al. 2004 — the
    centroid-distance form of Rousseeuw 1987's silhouette, the
    standard scalable variant), Davies-Bouldin (1979), and
    Calinski-Harabasz (1974) — the three textbook answers to "is k
    right / are these clusters real", computed WITHOUT any pairwise
    point-point work:

        s_i  = (b_i - a_i) / max(a_i, b_i)   a = dist to own
               centroid, b = min dist to another centroid
        DB   = (1/k) sum_i max_j (s_i + s_j) / d(c_i, c_j)
        CH   = [B/(k-1)] / [W/(n-k)]

    Centroids here are the exact DOUBLE means of the final
    assignment (not the engine-rounded integer update centroids —
    validity measures the PARTITION, and double means are the
    textbook definition). All distances are Euclidean on the
    quantized integer vectors -> engine-portable doubles.

    Scale shape: assignments from kmeans_assign (its documented
    driver-bounded k x d model); then one (cluster, dim) mean agg,
    one point x k x d distance join (narrow, k and d constants), and
    k^2-row DB arithmetic. Nothing pairwise in points.

    -> ONE row (k, n, silhouette 6dp, davies_bouldin 6dp,
    calinski_harabasz 6dp).
    """
    assign = kmeans_assign(embeddings, k=k, iterations=iterations,
                           id_col=id_col, vec_col=vec_col) \
        .select(id_col, "cluster")
    q = F.transform(F.col(vec_col),
                    lambda x: F.round(x.cast("double") * QUANT)
                    .cast("long"))
    dims = (embeddings.select(F.col(id_col), q.alias("qv"))
            .select(id_col, F.posexplode("qv").alias("dim", "v"))
            .join(assign, id_col)
            .localCheckpoint(eager=True))
    cents = (dims.groupBy("cluster", "dim")
             .agg(F.avg("v").alias("c")))
    # distances from every point to every centroid
    d2 = (dims.select(id_col, F.col("cluster").alias("own"),
                      "dim", "v")
          .join(F.broadcast(cents.select(
              F.col("cluster").alias("cl"), "dim", "c")), "dim")
          .groupBy(id_col, "own", "cl")
          .agg(F.sum((F.col("v") - F.col("c"))
                     * (F.col("v") - F.col("c"))).alias("d2")))
    per_point = (d2.groupBy(id_col, "own")
                 .agg(F.max(F.when(F.col("cl") == F.col("own"),
                                   F.col("d2"))).alias("a2"),
                      F.min(F.when(F.col("cl") != F.col("own"),
                                   F.col("d2"))).alias("b2")))
    a, b = F.sqrt("a2"), F.sqrt("b2")
    sil = F.when(F.greatest(a, b) > 0,
                 (b - a) / F.greatest(a, b)).otherwise(F.lit(0.0))
    point_stats = per_point.select(
        F.col("own").alias("cluster"), sil.alias("s"),
        F.col("a2"), a.alias("ad"))
    cl_stats = (point_stats.groupBy("cluster")
                .agg(F.count(F.lit(1)).alias("n_i"),
                     F.avg("ad").alias("s_i"),
                     F.sum("a2").alias("w_i"),
                     F.avg("s").alias("sil_i")))
    glob = (dims.groupBy("dim").agg(F.avg("v").alias("g")))
    b_between = (cents.join(F.broadcast(glob), "dim")
                 .groupBy("cluster")
                 .agg(F.sum((F.col("c") - F.col("g"))
                            * (F.col("c") - F.col("g"))).alias("bd2"))
                 .join(cl_stats.select("cluster", "n_i"), "cluster")
                 .agg(F.sum(F.col("n_i") * F.col("bd2")).alias("b")))
    # centroid-centroid distances for DB
    cc = (cents.select(F.col("cluster").alias("ci"), "dim",
                       F.col("c").alias("vi"))
          .join(cents.select(F.col("cluster").alias("cj"), "dim",
                             F.col("c").alias("vj")), "dim")
          .filter(F.col("ci") != F.col("cj"))
          .groupBy("ci", "cj")
          .agg(F.sqrt(F.sum((F.col("vi") - F.col("vj"))
                            * (F.col("vi") - F.col("vj"))))
               .alias("dc")))
    db_terms = (cc
                .join(F.broadcast(cl_stats.select(
                    F.col("cluster").alias("ci"),
                    F.col("s_i").alias("si"))), "ci")
                .join(F.broadcast(cl_stats.select(
                    F.col("cluster").alias("cj"),
                    F.col("s_i").alias("sj"))), "cj")
                .groupBy("ci")
                .agg(F.max((F.col("si") + F.col("sj")) / F.col("dc"))
                     .alias("r_i")))
    db = db_terms.agg(F.avg("r_i").alias("db"))
    tot = cl_stats.agg(F.sum("n_i").alias("n"),
                       F.sum("w_i").alias("w"),
                       F.sum(F.col("n_i") * F.col("sil_i")).alias("sil_sum"))
    return (tot.crossJoin(F.broadcast(b_between))
            .crossJoin(F.broadcast(db))
            .select(F.lit(k).cast("long").alias("k"),
                    F.col("n").cast("long").alias("n"),
                    F.round(F.col("sil_sum") / F.col("n"), 6)
                    .alias("silhouette"),
                    F.round("db", 6).alias("davies_bouldin"),
                    F.round((F.col("b") / (k - 1))
                            / (F.col("w") / (F.col("n") - k)), 6)
                    .alias("calinski_harabasz")))


def _outer_partials(centered: DataFrame, key_col: str, dim_col: str,
                    val_col: str) -> DataFrame:
    """Per-partition outer-product partial sums for a covariance build:
    pivot each task's (key, dim, val) rows into a points-x-dims matrix
    and emit ONE d x d partial M^T M per task — the downstream (i, j)
    agg then sums #partitions * d^2 tiny rows instead of a key-keyed
    self-join's |keys| * d^2 pair explosion. The key-hash repartition
    keeps every point's vector whole inside one task (a split point's
    cross-dim products would otherwise be lost) and shuffles only the
    narrow long rows. -> (i, j, s) with s = sum over the task's points
    of val_i * val_j."""
    import numpy as np
    from pyspark.sql import types as T

    def partials(batches):
        import pandas as pd
        frames = list(batches)
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        dims_arr = pdf[dim_col].to_numpy(dtype=np.int64)
        vals = pdf[val_col].to_numpy(dtype=np.float64)
        keys_arr = pdf[key_col].to_numpy()
        uniq, kidx = np.unique(keys_arr, return_inverse=True)
        dvals, dpos = np.unique(dims_arr, return_inverse=True)
        M = np.zeros((len(uniq), len(dvals)), dtype=np.float64)
        M[kidx, dpos] = vals
        P = M.T @ M
        d = len(dvals)
        yield pd.DataFrame({
            "i": np.repeat(dvals, d).astype(np.int64),
            "j": np.tile(dvals, d).astype(np.int64),
            "s": P.ravel()})

    return centered.repartition(F.col(key_col)).mapInPandas(
        partials,
        T.StructType([T.StructField("i", T.LongType(), False),
                      T.StructField("j", T.LongType(), False),
                      T.StructField("s", T.DoubleType(), True)]))


def pca_top_component(embeddings: DataFrame, iterations: int = 8,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """First principal component by power iteration on the sample
    covariance matrix (Pearson 1901; Hotelling 1933; the power method
    is von Mises 1929) — the dominant axis of an embedding cloud: its
    variance share says whether the space is healthy (an
    anisotropic/collapsed embedding table shows one component eating
    most variance — the standard representation-quality smell) and
    the loadings feed whitening or ABTT-style dominant-direction
    removal.

    Deterministic: quantized integer inputs, uniform start vector,
    FIXED iteration count (no convergence test), sign normalized so
    the loading sum is >= 0 — both engines evaluate the identical
    expression tree.

    Scale shape: the d x d covariance is built from ONE self-join of
    the (id, dim) long table on the id key (d-bounded fan per row,
    co-partitioned) — points are never paired; the power loop runs on
    the d^2-row matrix (4096 rows at d = 64) with d-row vectors —
    driver holds only the loop counter.

    -> d rows (dim, loading 6dp, eigenvalue 6dp, var_share 6dp) —
    eigenvalue/share are the same on every row by construction.
    """
    q = F.transform(F.col(vec_col),
                    lambda x: F.round(x.cast("double") * QUANT)
                    .cast("long"))
    dims = (embeddings.select(F.col(id_col), q.alias("qv"))
            .select(id_col, F.posexplode("qv").alias("dim", "v")))
    mu = dims.groupBy("dim").agg(F.avg("v").alias("mu"))
    centered = (dims.join(F.broadcast(mu), "dim")
                .select(id_col, "dim",
                        (F.col("v") - F.col("mu")).alias("x")))
    n = embeddings.count()
    # r6: the d x d covariance is dimension-bounded (a model table, 4096
    # rows at d = 64) — build it from per-partition outer-product
    # partials (no |points| * d^2 self-join explosion), collect it once,
    # and run the fixed-round power loop + eigenvalue/trace/sign on the
    # driver in numpy instead of 8 rounds x (join + agg + crossJoin +
    # eager checkpoint) of tiny Spark jobs. The result rows return as a
    # literal frame; the 6dp roundings stay in Spark so the rounding
    # semantics are unchanged.
    import numpy as np
    cov = (_outer_partials(centered, id_col, "dim", "x")
           .groupBy("i", "j")
           .agg((F.sum("s") / (n - 1)).alias("c")))
    cov_rows = cov.collect()
    dims_sorted = sorted({int(r["i"]) for r in cov_rows})
    pos = {d: k for k, d in enumerate(dims_sorted)}
    C = np.zeros((len(dims_sorted), len(dims_sorted)), dtype=np.float64)
    for r in cov_rows:
        C[pos[int(r["i"])], pos[int(r["j"])]] = float(r["c"])
    v_vec = np.ones(len(dims_sorted), dtype=np.float64)
    for _ in range(iterations):
        w_vec = C @ v_vec
        v_vec = w_vec / np.sqrt(float((w_vec * w_vec).sum()))
    lam = float(v_vec @ (C @ v_vec))
    tr = float(C.diagonal().sum())
    sgn = -1.0 if float(v_vec.sum()) < 0 else 1.0
    spark = embeddings.sparkSession
    out = spark.createDataFrame(
        [(int(d), float(v_vec[pos[d]]), lam, tr, sgn)
         for d in dims_sorted],
        "dim long, v double, lam double, tr double, sgn double")
    return out.select(
        "dim",
        F.round(F.col("v") * F.col("sgn"), 6).alias("loading"),
        F.round("lam", 6).alias("eigenvalue"),
        F.round(F.col("lam") / F.col("tr"), 6).alias("var_share"))


def kcenter_seeds(embeddings: DataFrame, k: int = 4,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Farthest-first traversal (Gonzalez 1985, the 2-approximation for
    the k-center problem; the seeding rule behind k-means++'s
    deterministic cousin and coreset/diversity selection in data
    pruning): start from the smallest id, then repeatedly add the point
    FARTHEST from the chosen set (max min-distance; ties -> smallest
    id).  The selected rows are the maximally spread sample — the
    "cover the embedding space with k probes" picker for eval-set
    seeding, diverse-example selection, and IVF/k-means warm starts
    that avoid collapsing onto one dense region.

    Exactness: distances are exact BIGINT squared Euclidean on the
    quantized integer vectors (similarity-module contract), so argmax
    and ties are discrete — no float boundary, any engine agrees.

    Scale shape: kmeans_assign's model-on-driver loop — the chosen
    set (k x d ints) broadcasts as literals into a narrow min-distance
    map; each of the k rounds is ONE scan + ONE 1-row argmax
    (orderBy desc limit 1 — TakeOrderedAndProject, never a global
    sort); the driver holds only the k chosen vectors.

    -> k rows (seed_rank, vec_id, d2) where d2 = exact squared
    distance to the previously chosen set (0 for the first seed);
    d2 of the LAST row is the standard k-center coverage-radius
    certificate (every point is within sqrt(d2_last) of a seed after
    the final round — Gonzalez's bound).
    """
    q = F.transform(F.col(vec_col),
                    lambda x: F.round(x.cast("double") * QUANT)
                    .cast("long"))
    # Driver fast path (r6, same guard and exactness argument as
    # kmeans_assign): the traversal is all exact integers — when the
    # quantized table fits the broadcast threshold the k-1 argmax
    # rounds run over one bounded collect in numpy instead of k-1
    # scan+TakeOrdered jobs; ties resolve to the smallest id on both
    # paths. Larger tables keep the distributed loop.
    spark = embeddings.sparkSession
    _first = embeddings.select(F.size(F.col(vec_col)).alias("d")).first()
    _dim = int(_first["d"]) if _first and _first["d"] is not None else 0
    if _dim > 0:
        from saber_spark.operators.kge import _broadcast_threshold_bytes
        cap_rows = max(k, _broadcast_threshold_bytes(spark) // (_dim * 8))
        rows = (embeddings.select(F.col(id_col), q.alias("qv"))
                .limit(cap_rows + 1).collect())
        if len(rows) <= cap_rows:
            if len(rows) < k:
                raise ValueError(
                    f"kcenter_seeds: need >= {k} vectors, "
                    f"got {len(rows)}")
            import numpy as np
            ids = np.asarray([int(r[0]) for r in rows], dtype=np.int64)
            V = np.asarray([list(r["qv"]) for r in rows],
                           dtype=np.int64)
            start = int(ids.argmin())
            chosen_rows = [(0, int(ids[start]), 0)]
            mind = ((V - V[start]) ** 2).sum(axis=1)
            for rank in range(1, k):
                # argmax of mind, ties -> smallest id
                best = np.lexsort((ids, -mind))[0]
                chosen_rows.append((rank, int(ids[best]),
                                    int(mind[best])))
                np.minimum(mind, ((V - V[best]) ** 2).sum(axis=1),
                           out=mind)
            return spark.createDataFrame(
                chosen_rows, "seed_rank long, vec_id long, d2 long")
    base = (embeddings.select(F.col(id_col), q.alias("qv"))
            .localCheckpoint(eager=True))
    n = base.count()
    if n < k:
        raise ValueError(f"kcenter_seeds: need >= {k} vectors, got {n}")
    first = base.orderBy(F.col(id_col).asc()).limit(1).collect()[0]
    chosen = [(int(first[id_col]), list(first["qv"]), 0)]

    def d2_to(cent):
        return F.aggregate(
            F.zip_with(F.col("qv"),
                       F.array(*[F.lit(int(c)) for c in cent]),
                       lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"), lambda acc, x: acc + x)

    for _ in range(1, k):
        mind = F.least(*[d2_to(c) for _, c, _ in chosen]) \
            if len(chosen) > 1 else d2_to(chosen[0][1])
        far = (base.select(F.col(id_col), F.col("qv"),
                           mind.alias("d2"))
               .orderBy(F.col("d2").desc(), F.col(id_col).asc())
               .limit(1).collect()[0])
        chosen.append((int(far[id_col]), list(far["qv"]),
                       int(far["d2"])))
    spark = embeddings.sparkSession
    return spark.createDataFrame(
        [(r, i, d) for r, (i, _, d) in enumerate(chosen)],
        "seed_rank long, vec_id long, d2 long")


def sif_embeddings(tokens: DataFrame, embeddings: DataFrame,
                   a: float = 1e-3, pc_iterations: int = 4,
                   doc_col: str = "doc_id", tok_col: str = "token",
                   id_col: str = "vec_id", vec_col: str = "embedding"
                   ) -> DataFrame:
    """SIF document embeddings (Arora, Liang & Ma, ICLR 2017 "A Simple
    but Tough-to-Beat Baseline for Sentence Embeddings"): each document
    is the frequency-weighted mean of its word vectors,

        v_d = (1/|d|) * sum_t  a / (a + p(t)) * emb(t),

    followed by COMMON-COMPONENT REMOVAL — subtracting each vector's
    projection onto the corpus's first principal component (the shared
    syntax/frequency direction that drowns topical signal).  The
    classic composition of three stages this repo already ships
    separately: token frequencies (vocab), an embedding table
    (similarity), and the power-iteration PC (pca_top_component) — the
    doc-embedding baseline that feeds cosine_topk / semdedup /
    kmeans when no trained encoder is available.

    Word -> vector row: md5-portable hash mod |table| (the DSIR hash
    family — engine-identical), standing in for a trained word->row
    index with the same join shape.  Embedding components are the
    quantized integers of the similarity contract; weights and all
    downstream arithmetic are IEEE doubles rounded once at 6dp.

    Scale shape: ONE token-frequency agg (broadcast, vocab-bounded),
    one equi-join of the token stream against the quantized embedding
    long table, one (doc, dim) agg; the PC loop reuses
    pca_top_component's shape — covariance via ONE doc-keyed self-join
    (dim-bounded fan), fixed pc_iterations on the d^2-row matrix;
    the removal is one broadcast join + narrow arithmetic.

    -> (doc_id, dim, value 6dp) — the long form of the corrected doc
    vectors (array re-assembly is one collect_list away when needed).
    """
    n_vecs = embeddings.count()
    q = F.transform(F.col(vec_col),
                    lambda x: F.round(x.cast("double") * QUANT)
                    .cast("long"))
    tok = tokens.select(F.col(doc_col), F.col(tok_col).alias("token"))
    freq = (tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
            .localCheckpoint(eager=True))
    total = freq.agg(F.sum("c").alias("tot"))
    weights = (freq.crossJoin(F.broadcast(total))
               .select("token",
                       (F.lit(float(a))
                        / (F.lit(float(a))
                           + F.col("c") / F.col("tot").cast("double")))
                       .alias("w"),
                       (F.conv(F.substring(F.md5("token"), 1, 8), 16, 10)
                        .cast("long") % F.lit(n_vecs)).alias("row")))
    from saber_spark.operators.kge import _broadcast_threshold_bytes
    spark = tokens.sparkSession
    first = embeddings.select(F.size(F.col(vec_col)).alias("d")).first()
    emb_dim = int(first["d"]) if first and first["d"] is not None else 0
    if emb_dim > 0 and n_vecs * emb_dim * 8 <= \
            _broadcast_threshold_bytes(spark):
        # Fast path (r6, guide §4.2): the quantized embedding table fits
        # the broadcast budget, so instead of exploding it to (row, dim,
        # v) and paying a |tokens| x dim join fan (64M rows at sf0.1,
        # 3.4s), aggregate the token stream to per-(doc, row) weight
        # sums (one narrow shuffle) and matmul each doc's weight vector
        # against the broadcast matrix in numpy inside mapInPandas.
        # Unseen rows contribute zero exactly as the inner join drops
        # them; docs with no seen row emit nothing, matching the join
        # path. Rows sort by (doc, row) before accumulation so the FP
        # sum order is run-deterministic.
        import numpy as np
        from pyspark.sql import types as T
        quant = (embeddings.select(F.col(id_col), q.alias("qv"))
                 .select(F.col(id_col).alias("row"), "qv"))
        E = np.zeros((n_vecs, emb_dim), dtype=np.int64)
        seen = np.zeros(n_vecs, dtype=bool)
        for r in quant.collect():
            i = int(r["row"])
            if 0 <= i < n_vecs:
                E[i] = r["qv"]
                seen[i] = True
        e_bc = spark.sparkContext.broadcast(E.astype(np.float64))
        seen_bc = spark.sparkContext.broadcast(seen)
        wsum = (tok.join(F.broadcast(weights), "token")
                .groupBy(doc_col, "row")
                .agg(F.sum("w").alias("ws"),
                     F.count(F.lit(1)).alias("cnt"))
                .repartition(F.col(doc_col)))
        doc_type = [f.dataType for f in tokens.schema.fields
                    if f.name == doc_col][0]
        out_schema = T.StructType([
            T.StructField(doc_col, doc_type, True),
            T.StructField("dim", T.IntegerType(), False),
            T.StructField("x", T.DoubleType(), True)])

        def doc_vectors(batches):
            import pandas as pd
            Em = e_bc.value
            ok = seen_bc.value
            parts = [pdf for pdf in batches]
            if not parts:
                return
            pdf = pd.concat(parts, ignore_index=True) \
                .sort_values([doc_col, "row"], kind="mergesort") \
                .reset_index(drop=True)
            rows = pdf["row"].to_numpy(dtype=np.int64)
            ws = pdf["ws"].to_numpy(dtype=np.float64)
            cnt = pdf["cnt"].to_numpy(dtype=np.int64)
            docs_arr = pdf[doc_col].to_numpy()
            uniq, doc_idx = np.unique(docs_arr, return_inverse=True)
            n_tok = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(n_tok, doc_idx, cnt)
            keep = ok[rows]
            X = np.zeros((len(uniq), Em.shape[1]), dtype=np.float64)
            np.add.at(X, doc_idx[keep],
                      ws[keep, None] * Em[rows[keep]])
            has_row = np.zeros(len(uniq), dtype=bool)
            has_row[doc_idx[keep]] = True
            X = X / n_tok[:, None]
            d_sel = np.nonzero(has_row)[0]
            n_out = len(d_sel) * Em.shape[1]
            if n_out == 0:
                return
            yield pd.DataFrame({
                doc_col: np.repeat(uniq[d_sel], Em.shape[1]),
                "dim": np.tile(np.arange(Em.shape[1], dtype=np.int32),
                               len(d_sel)),
                "x": X[d_sel].ravel()})

        vd = wsum.mapInPandas(doc_vectors, out_schema) \
            .localCheckpoint(eager=True)
    else:
        dims = (embeddings.select(F.col(id_col), q.alias("qv"))
                .select(F.col(id_col).alias("row"),
                        F.posexplode("qv").alias("dim", "v")))
        dlen = tok.groupBy(doc_col).agg(F.count(F.lit(1)).alias("n_tok"))
        vd = (tok.join(F.broadcast(weights), "token")
              .join(dims, "row")
              .groupBy(doc_col, "dim")
              .agg(F.sum(F.col("w") * F.col("v")).alias("s"))
              .join(dlen, doc_col)
              .select(doc_col, "dim",
                      (F.col("s") / F.col("n_tok")).alias("x"))
              .localCheckpoint(eager=True))
    if pc_iterations == 0:
        # no common-component removal: the raw weighted means
        return vd.select(doc_col, "dim",
                         F.round("x", 6).alias("value"))
    # first PC of the doc vectors: pca_top_component's loop on doubles
    mu = vd.groupBy("dim").agg(F.avg("x").alias("mu"))
    centered = (vd.join(F.broadcast(mu), "dim")
                .select(doc_col, "dim",
                        (F.col("x") - F.col("mu")).alias("cx")))
    n_docs = vd.select(doc_col).distinct().count()
    # Covariance via per-partition outer-product partials (r6): each
    # task pivots its docs' centered vectors into a matrix and emits
    # one d x d partial M^T M — the (i, j)-keyed global agg then sums
    # #partitions * d^2 tiny rows instead of the |docs| * d^2 pair
    # explosion of a doc-keyed self-join (20M rows at sf0.1, ~1s).
    # The doc-keyed repartition keeps every doc's vector whole within
    # one task (cross-dim products of a split doc would otherwise be
    # lost); it shuffles only the narrow (doc, dim, cx) rows.
    import numpy as np
    cov = (_outer_partials(centered, doc_col, "dim", "cx")
           .groupBy("i", "j")
           .agg((F.sum("s") / (n_docs - 1)).alias("c")))
    # The covariance matrix is DIMENSION-bounded (d^2 rows — a model
    # table, never corpus-sized), so the fixed-round power iteration
    # runs on the driver in numpy instead of 4 rounds x (join + agg +
    # crossJoin + eager checkpoint) of tiny Spark jobs — identical
    # arithmetic (w = C u; u = w / ||w||), one collect, u returns as a
    # broadcast literal (r6; measured ~2.5s of scheduler overhead gone
    # at sf0.1). Covariance itself stays distributed: centered is
    # (doc, dim)-sized.
    import numpy as np
    cov_rows = cov.collect()
    dims_sorted = sorted({int(r["i"]) for r in cov_rows})
    pos = {d: k for k, d in enumerate(dims_sorted)}
    C = np.zeros((len(dims_sorted), len(dims_sorted)), dtype=np.float64)
    for r in cov_rows:
        C[pos[int(r["i"])], pos[int(r["j"])]] = float(r["c"])
    u_vec = np.ones(len(dims_sorted), dtype=np.float64)
    for _ in range(pc_iterations):
        w2 = C @ u_vec
        u_vec = w2 / np.sqrt(float((w2 * w2).sum()))
    spark = tokens.sparkSession
    u = spark.createDataFrame(
        [(int(d), float(u_vec[pos[d]])) for d in dims_sorted],
        "dim long, u double")
    proj = (vd.join(F.broadcast(u), "dim")
            .groupBy(doc_col)
            .agg(F.sum(F.col("x") * F.col("u")).alias("dot")))
    return (vd.join(F.broadcast(u), "dim")
            .join(proj, doc_col)
            .select(doc_col, "dim",
                    F.round(F.col("x") - F.col("dot") * F.col("u"), 6)
                    .alias("value")))
