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
