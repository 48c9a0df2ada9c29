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
    vals = df.select(F.col(value_col).alias("value"))
    n_total = vals.agg(F.count(F.lit(1)).alias("n_total"))
    grid = (vals
            .select(F.explode(_cms_buckets(F.col("value"), width, depth))
                    .alias("db"))
            .groupBy(F.col("db.d").alias("d"),
                     F.col("db.bucket").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("c")))
    cand = (vals.distinct()
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
    exact = (df.select(F.col(value_col).alias("value"))
             .join(F.broadcast(survivors.select("value")), "value",
                   "left_semi")
             .groupBy("value").agg(F.count(F.lit(1)).alias("exact")))
    return survivors.join(exact, "value").select("value", "est", "exact")
