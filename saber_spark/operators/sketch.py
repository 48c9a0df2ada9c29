"""KMV (k-minimum-values) distinct-count sketch — a mergeable cardinality
estimator with engine-portable arithmetic.

Spark's built-in approx_count_distinct is HyperLogLog++, whose exact output
no other engine reproduces; this KMV twin uses the same affine permutation
hash family as the MinHash family (deterministic, integer-only), so the
ESTIMATE ITSELF is oracle-checkable bit-for-bit. Estimator: keep the k
smallest distinct hash values per group; if fewer than k distinct values
exist the count is exact; otherwise est = (k-1) * P / kth_min (the standard
KMV unbiased form over hashes uniform on [0, P)).

Scale: one partial-aggregating groupBy over (group, hash) + a bounded
window; per-group state is k longs — mergeable across partitions, the same
property HLL sketches are used for at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from saber_spark.operators.dedup import MINHASH_PRIME

KMV_A = 976_369_111
KMV_B = 563_079_003


def kmv_distinct(df: DataFrame, group_col: str, id_col: str,
                 k: int = 16) -> DataFrame:
    """-> (group, est_distinct, exact_distinct) — KMV estimate next to the
    exact count so estimator error is visible in the result itself.

    ``id_col`` must be an integer surrogate (vocab/token id); strings hash
    first via the portable vocab-id path.
    """
    hashed = df.select(
        F.col(group_col),
        F.pmod(F.lit(KMV_A).cast("long") * F.col(id_col).cast("long")
               + F.lit(KMV_B),
               F.lit(MINHASH_PRIME).cast("long")).alias("h")).distinct()
    w = Window.partitionBy(group_col).orderBy("h")
    topk = (hashed.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k))
    per_group = topk.groupBy(group_col).agg(
        F.max("h").alias("kth"), F.count(F.lit(1)).alias("k_eff"))
    exact = (df.select(group_col, id_col).distinct()
             .groupBy(group_col)
             .agg(F.count(F.lit(1)).alias("exact_distinct")))
    # integer division on both engines (Spark `div`, DuckDB `//`) — double
    # division + floor could round differently at exact-integer boundaries
    est = F.when(
        F.col("k_eff") < k, F.col("k_eff").cast("long")
    ).otherwise(
        F.expr(f"CAST({k - 1} AS BIGINT) * CAST({MINHASH_PRIME} AS BIGINT) "
               f"div kth")
    )
    return (per_group.join(exact, group_col)
            .select(group_col, est.cast("long").alias("est_distinct"),
                    "exact_distinct"))


def _cms_buckets(col, width: int, depth: int):
    """array<struct<d, bucket>>: row d's bucket = first 8 md5 hex chars of
    'd:value' mod width — the DSIR portable string-hash family, one
    independent permutation per sketch row."""
    return F.array(*[
        F.struct(
            F.lit(d).alias("d"),
            (F.conv(F.substring(
                F.md5(F.concat_ws(":", F.lit(str(d)), col)), 1, 8),
                16, 10).cast("long") % width).alias("bucket"))
        for d in range(depth)])


def cms_heavy_hitters(df: DataFrame, value_col: str, width: int = 256,
                      depth: int = 4, support_denom: int = 200) -> DataFrame:
    """Count-min-sketch heavy hitters (Cormode & Muthukrishnan 2005)
    -> (value, est, exact) for every distinct value whose CMS estimate
    reaches total/support_denom (integer threshold: N div denom).

    The streaming/distributed answer to "which tokens / hosts / entities
    exceed phi-fraction frequency" when the raw domain is too large to
    count exactly: the sketch is a depth x width counter grid (update:
    +1 at one bucket per row; query: MIN over the depth rows), mergeable
    across partitions and bounded at depth*width longs no matter the
    corpus size. CMS never underestimates, so the candidate set provably
    contains every true heavy hitter; `exact` sits alongside `est` so the
    overestimate is visible in the result itself (the kmv_distinct
    honesty convention).

    Scale shape: the grid is ONE partial+final hash agg to depth*width
    rows (broadcastable at any corpus size); estimates need only the
    DISTINCT value set (vocab-bounded, never corpus-bounded) joined
    against the broadcast grid; the exact verify re-aggregates only rows
    matching surviving candidates (broadcast semi-join pushdown). Integer
    threshold arithmetic (`div`) — no float boundary to disagree across
    engines.
    """
    # r6: aggregate the corpus to vocab-bounded (value, count) rows
    # FIRST and run the hash family over values, not rows — the former
    # shape computed depth md5s per CORPUS row (3M at sf0.1) where
    # depth-per-distinct-value suffices (identical bucket sums), and
    # re-scanned the corpus for the exact verify (now a lookup in the
    # same table). Checkpointed once for its three consumers.
    vals = df.select(F.col(value_col).alias("value"))
    vcounts = (vals.groupBy("value").agg(F.count(F.lit(1)).alias("vc"))
               .localCheckpoint(eager=True))
    n_total = vcounts.agg(F.sum("vc").alias("n_total"))
    grid = (vcounts
            .select(F.explode(_cms_buckets(F.col("value"), width, depth))
                    .alias("db"), "vc")
            .groupBy(F.col("db.d").alias("d"),
                     F.col("db.bucket").alias("bucket"))
            .agg(F.sum("vc").alias("c")))
    cand = (vcounts
            .select("value",
                    F.explode(_cms_buckets(F.col("value"), width, depth))
                    .alias("db"))
            .select("value", F.col("db.d").alias("d"),
                    F.col("db.bucket").alias("bucket")))
    est = (cand.join(F.broadcast(grid), ["d", "bucket"])
           .groupBy("value").agg(F.min("c").alias("est")))
    survivors = (est.crossJoin(F.broadcast(n_total))
                 .filter(F.col("est")
                         >= F.expr(f"n_total div {support_denom}"))
                 .select("value", "est"))
    exact = (vcounts.join(F.broadcast(survivors.select("value")), "value",
                          "left_semi")
             .select("value", F.col("vc").alias("exact")))
    return survivors.join(exact, "value").select("value", "est", "exact")


def bloom_bits(values: DataFrame, value_col: str, m: int = 8192,
               k: int = 3) -> DataFrame:
    """Distinct Bloom-filter bit positions of a value set -> (bit).

    Hash family: bit_i(v) = first-8-hex-chars of md5('i:v') mod m — the
    _cms_buckets / DSIR portable string-hash family, so any engine
    reproduces the filter bit-for-bit. This relational table IS the
    Bloom filter (<= m rows however large the input); in a production
    job it packs into an m/8-byte broadcast bitset, the form that makes
    Bloom the standard 100-TB membership primitive: a 10M-entry eval
    set at k=3 / 1% FP rate is a ~12 MB broadcast, where the raw n-gram
    strings it replaces are gigabytes.
    """
    return (values
            .select(F.explode(_cms_buckets(F.col(value_col), m, k))
                    .alias("db"))
            .select(F.col("db.bucket").alias("bit"))
            .distinct())


def bloom_decontaminate(docs: DataFrame, eval_docs: DataFrame, n: int = 5,
                        m: int = 8192, k: int = 3,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Benchmark decontamination via a Bloom membership probe, with the
    exact answer alongside -> one row per corpus doc:
    (doc_id, n_bloom_hits, n_exact, bloom_flagged, exact_contaminated).

    The sketch-membership sibling of dedup.contamination_check: a corpus
    word n-gram is bloom-flagged iff ALL k of its bit positions are set
    by the eval set's n-grams. Bloom filters never produce false
    negatives, so n_bloom_hits >= n_exact and bloom_flagged covers every
    exact_contaminated doc — the safe direction for decontamination
    (over-drop, never under-drop); the exact columns keep the
    false-positive cost visible in the result itself (the kmv_distinct
    honesty convention).

    Scale shape: the filter build is one explode + distinct over
    benchmark-sized input (<= m rows out); the probe joins corpus gram
    bits against the BROADCAST bit table and needs bits_hit == k — one
    (doc, gram)-keyed agg. The corpus side never shuffles for
    membership; the per-doc rollup is the same sparse-hits aggregation
    contamination_check documents.
    """
    from saber_spark.operators.dedup import doc_shingles

    eval_g = (doc_shingles(eval_docs, text_col=text_col, id_col=id_col,
                           n=n).select("shingle").distinct())
    bits = bloom_bits(eval_g, "shingle", m, k)
    doc_g = doc_shingles(docs, text_col=text_col, id_col=id_col, n=n)
    probe = (doc_g
             .select(id_col, "shingle",
                     F.explode(_cms_buckets(F.col("shingle"), m, k))
                     .alias("db"))
             .join(F.broadcast(bits),
                   F.col("db.bucket") == F.col("bit"))
             .groupBy(id_col, "shingle")
             .agg(F.count(F.lit(1)).alias("bits_hit")))
    bloom_hits = (probe.filter(F.col("bits_hit") == k)
                  .groupBy(id_col)
                  .agg(F.count(F.lit(1)).alias("n_bloom_hits")))
    exact_hits = (doc_g.join(F.broadcast(eval_g), "shingle")
                  .groupBy(id_col)
                  .agg(F.count(F.lit(1)).alias("n_exact")))
    return (docs.select(id_col)
            .join(bloom_hits, id_col, "left")
            .join(exact_hits, id_col, "left")
            .select(
                id_col,
                F.coalesce("n_bloom_hits", F.lit(0))
                 .cast("long").alias("n_bloom_hits"),
                F.coalesce("n_exact", F.lit(0))
                 .cast("long").alias("n_exact"),
                F.col("n_bloom_hits").isNotNull().alias("bloom_flagged"),
                F.col("n_exact").isNotNull().alias("exact_contaminated")))
