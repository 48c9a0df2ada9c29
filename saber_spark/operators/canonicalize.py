"""Canonicalization: merge coreferent mentions into node rows.

north_rule obligation: "salted-key canonicalization of coreferent entities"
with skew mitigation for hub entities. Hub surfaces (e.g. "table" in the
fixture, "p53" in the wild) appear in a huge share of pages, so a naive
``groupBy(canonical_id)`` sends one key's entire traffic to one reducer.

Two-phase salted aggregation (classic map-side skew fix, written as plain
query logic — no custom Catalyst):
  phase 1: groupBy(canonical_id, salt = pmod(hash(url), S)) -> partial counts
           (S-way spread of each hot key across reducers)
  phase 2: groupBy(canonical_id) over the ≤ S partial rows per key.

Distinct-document counts can't be salted-summed directly, so phase 1 also
dedupes (canonical_id, url) — Spark plans that as a partial (map-side)
dedupe before the shuffle, which is the same spill-safe shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT_BUCKETS = 64


def salted_count(df: DataFrame, keys: list[str], salt_src: str,
                 out_col: str = "n", salt_buckets: int = DEFAULT_SALT_BUCKETS
                 ) -> DataFrame:
    """Generic two-phase salted count: groupBy(keys) robust to hub keys.

    The salt value only affects row distribution, never the result, so any
    hash works; the oracle for this operator is a plain GROUP BY count.
    """
    partial = (
        df.withColumn("_salt", F.pmod(F.xxhash64(salt_src), F.lit(salt_buckets)))
        .groupBy(*keys, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("_partial").alias(out_col))


def canonicalize_nodes(linked: DataFrame,
                       salt_buckets: int = DEFAULT_SALT_BUCKETS) -> DataFrame:
    """linked mentions -> node table (canonical_id, label, n_mentions, n_docs).

    Only grounded mentions participate (canonical_id non-null); the reference
    likewise only attaches xrefs for dictionary hits
    (grounding_utils.py:53-66).
    """
    grounded = linked.filter(F.col("canonical_id").isNotNull())

    # phase 1: salted partial aggregation (hot keys spread over S reducers)
    partial = (
        grounded
        .withColumn("salt", F.pmod(F.xxhash64("url"), F.lit(salt_buckets)))
        .groupBy("canonical_id", "label", "salt")
        .agg(F.count(F.lit(1)).alias("partial_mentions"))
    )
    # phase 2: final aggregation over <= S rows per key
    mention_counts = (
        partial.groupBy("canonical_id", "label")
        .agg(F.sum("partial_mentions").alias("n_mentions"))
    )

    # distinct docs: map-side partial dedupe then count (skew-safe because
    # dropDuplicates' partial aggregate collapses each (key, url) locally)
    doc_counts = (
        grounded.select("canonical_id", "url").dropDuplicates()
        .groupBy("canonical_id")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )

    return mention_counts.join(doc_counts, on="canonical_id", how="inner")
