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


def resolve_entities(names: DataFrame, name_col: str = "name",
                     max_edits: int = 1, block_chars: int = 1,
                     cc_rounds: int | None = 8) -> DataFrame:
    """Fuzzy entity resolution -> (name, canonical): cluster surface forms
    whose edit distance is <= max_edits, canonical = min name per cluster.

    The record-linkage step between exact-surface linking and the KG node
    table: "p53" / "p53s" / "tp53" style variants must collapse to one
    node or the graph fragments (the reference links exact surfaces only,
    saber/utils/grounding_utils.py:65-66). Classic blocked formulation
    (Fellegi-Sunter blocking, standard ER practice):

      1. block on the first `block_chars` characters — candidate pairs
         form ONLY within a block, so the join is an equi-join on the
         block key plus a<b; never all-pairs. Recall limitation is the
         textbook one (a first-character typo crosses blocks and is
         missed) — documented, not hidden; production stacks add a second
         blocking pass (e.g. soundex) and union the edges.
      2. verify pairs with levenshtein(a, b) <= max_edits — JVM built-in,
         identical semantics in DuckDB for the oracle.
      3. transitive closure via connected_components (hash-min), so
         a~b, b~c clusters a,b,c together even when lev(a,c) > max_edits
         — the standard ER convention (clusters are closures, not
         cliques).
      4. singletons (no fuzzy partner) keep themselves as canonical.

    Scale shape: block sizes follow the name distribution — for real
    corpora block on more characters (block_chars=2-3) or a
    length-banded key to bound the quadratic-within-block term; the
    verify filter runs inside the join, so only surviving edges shuffle
    into the CC loop. cc_rounds bounds the lazy CC propagation (cluster
    diameter in HOPS, not string length; edit-chains longer than 2^8 are
    not a thing in surface-form data); pass None for the fixpoint mode.
    """
    from saber_spark.operators.graph import connected_components

    n = (names.select(F.col(name_col).alias("name")).distinct()
         .withColumn("blk", F.substring("name", 1, block_chars))
         .localCheckpoint(eager=True))
    a = n.select(F.col("blk"), F.col("name").alias("src"))
    b = n.select(F.col("blk"), F.col("name").alias("dst"))
    pairs = (a.join(b, "blk")
             .filter((F.col("src") < F.col("dst"))
                     & (F.levenshtein("src", "dst") <= max_edits))
             .select("src", "dst"))
    comp = connected_components(pairs, rounds=cc_rounds)
    return (n.join(comp, n.name == comp.node, "left")
            .select("name",
                    F.coalesce("component", "name").alias("canonical")))


def blocking_metrics(records: DataFrame, true_pairs: DataFrame,
                     schemes=None, name_col: str = "name") -> DataFrame:
    """Evaluate candidate-generation (blocking) schemes for entity
    resolution -> one row per scheme:
    (scheme, n_records, n_blocks, n_cand_pairs, n_true_pairs,
     n_true_cand, pair_completeness, reduction_ratio).

    The two textbook blocking-quality numbers (Christen, "Data Matching"
    2012 ch. 7): reduction ratio RR = 1 - |candidates| / C(n,2) (how much
    of the quadratic pair space the blocks prune) and pair completeness
    PC = |true matches co-blocked| / |true matches| (how much recall the
    pruning costs). Every production ER stack tunes its blocking key on
    exactly this trade-off before running the expensive verify join —
    at 10^9 records the candidate count, not the matcher, decides
    feasibility.

    Scale shape: |candidates| is NEVER materialized — per-block counts
    come from one hash agg on the block key and C(nb,2) is summed
    algebraically; true-pair co-blocking is one projection of the (small)
    truth table. No join touches the quadratic space.

    ``schemes`` maps scheme name -> a function (column name -> block-key
    Column), applied to ``records.name_col`` for the block counts and to
    the truth table's ``a``/``b`` columns for co-blocking (default:
    first-char and last-char schemes). ``true_pairs`` has columns (a, b)
    of matching record names.
    """
    if schemes is None:
        schemes = {
            "first_char": lambda c: F.substring(F.col(c), 1, 1),
            "last_char": lambda c: F.substring(F.col(c), -1, 1),
        }
    out = None
    n_records = records.count()
    n_true = true_pairs.count()
    for scheme, key_of in schemes.items():
        per_block = (records
                     .groupBy(key_of(name_col).alias("blk"))
                     .agg(F.count(F.lit(1)).alias("nb")))
        cand = per_block.agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum(F.col("nb") * (F.col("nb") - 1) / 2).cast("long")
            .alias("n_cand_pairs"))
        # a true pair survives blocking iff both members share a key
        co = true_pairs.filter(key_of("a") == key_of("b")) \
            .agg(F.count(F.lit(1)).cast("long").alias("n_true_cand"))
        row = (cand.crossJoin(co)
               .select(
                   F.lit(scheme).alias("scheme"),
                   F.lit(n_records).cast("long").alias("n_records"),
                   F.col("n_blocks").cast("long"),
                   "n_cand_pairs",
                   F.lit(n_true).cast("long").alias("n_true_pairs"),
                   "n_true_cand",
                   F.round(F.col("n_true_cand") / F.lit(n_true), 6)
                   .alias("pair_completeness"),
                   F.round(1 - F.col("n_cand_pairs")
                           / F.lit(n_records * (n_records - 1) / 2.0), 6)
                   .alias("reduction_ratio")))
        out = row if out is None else out.unionByName(row)
    return out
