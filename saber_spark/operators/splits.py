"""Deterministic train/valid/k-fold splits + top-1 selection.

Reference basis:
  - train/valid split: 10% validation, random_state=42
    (saber/utils/data_utils.py:139-182) — rebuilt as an ENGINE-PORTABLE
    multiplicative hash (Knuth 2654435761) so Spark and any oracle agree
    row-for-row (preferred over randomSplit per SURVEY.md §2.2: hash-based
    is reproducible across partitionings; randomSplit is not).
  - k-fold CV: KFold(n_splits=k) (saber/utils/data_utils.py:184-272) —
    fold = hash-mod-k column; train = fold != j, valid = fold = j.
  - best-epoch selection: argmax by F1 (saber/metrics.py:240-284) — window
    row_number()=1 / max_by.

Scale: the fold expression is a narrow map (no shuffle); top-1 per group is
one shuffle with partial min/max pushdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KNUTH = 2654435761  # multiplicative hash constant; portable across engines
HASH_MOD = 2**31 - 1


def fold_assign(df: DataFrame, id_col: str, k: int,
                fold_col: str = "fold") -> DataFrame:
    """Deterministic fold id in [0, k): ((id * KNUTH) % (2^31-1)) % k."""
    return df.withColumn(
        fold_col,
        F.pmod(F.pmod(F.col(id_col).cast("long") * F.lit(KNUTH),
                      F.lit(HASH_MOD)), F.lit(k)),
    )


def quantile_buckets(df: DataFrame, score_col: str, group_col: str,
                     probs: tuple[float, ...] = (0.25, 0.5, 0.75)
                     ) -> DataFrame:
    """Assign every row a per-group quantile bucket 1..len(probs)+1 —
    curriculum/mixing bucketing (e.g. quality quartiles per source) without
    a global sort.

    The naive form is ntile() over a global ORDER BY — a single-partition
    window that cannot scale. Here the exact interpolated boundaries are
    ONE partial+final aggregation per group (percentile), broadcast back,
    and the assignment is a narrow higher-order fold over the boundary
    array: bucket = 1 + |{b : score > b}|. A row whose score equals a
    boundary lands in the lower bucket on every engine (strict >).

    NULL semantics: a NULL group is its own group (null-safe join — rows
    are never silently dropped); a row with a NULL score, or in a group
    whose scores are all NULL (no boundaries computable), gets bucket
    NULL.
    """
    bounds = df.groupBy(group_col).agg(
        F.percentile(score_col, F.array(*[F.lit(p) for p in probs]))
        .alias("_bounds"))
    bucket = F.when(
        F.col(score_col).isNull() | F.col("_bounds").isNull(),
        F.lit(None),
    ).otherwise(F.lit(1) + F.aggregate(
        F.col("_bounds"), F.lit(0),
        lambda acc, b: acc + F.when(F.col(score_col) > b, 1).otherwise(0)))
    b_alias = bounds.withColumnRenamed(group_col, "_grp")
    return (df.join(F.broadcast(b_alias),
                    F.col(group_col).eqNullSafe(F.col("_grp")))
            .withColumn("bucket", bucket.cast("long"))
            .drop("_bounds", "_grp"))


def stratified_sample(df: DataFrame, group_col: str, id_col: str,
                      fractions: dict[str, float],
                      default_fraction: float = 0.0,
                      resolution: int = 1_000_000) -> DataFrame:
    """Per-group deterministic sampling — the data-mixing primitive of a
    training corpus ("keep 80% of web, 30% of forums, all of books").

    Unlike sampleBy (RNG-seeded, engine-specific), membership is a pure
    function of the row id: keep iff hash(id) % resolution < frac*resolution.
    Reproducible across runs/engines, stable under repartitioning, and a
    narrow filter Catalyst can push — no shuffle, no sampling state. The
    same row keeps/drops consistently as fractions grow (nested samples:
    a 10% sample is a subset of the 20% sample), which RNG sampling cannot
    guarantee.
    """
    frac_map = F.create_map(
        *[F.lit(x) for kv in fractions.items()
          for x in (kv[0], int(kv[1] * resolution))])
    threshold = F.coalesce(frac_map[F.col(group_col)],
                           F.lit(int(default_fraction * resolution)))
    bucket = F.pmod(F.pmod(F.col(id_col).cast("long") * F.lit(KNUTH),
                           F.lit(HASH_MOD)), F.lit(resolution))
    return df.filter(bucket < threshold)


def mixture_sample(docs: DataFrame, target_fraction: float = 0.5,
                   alpha: float = 0.5, group_col: str = "source",
                   id_col: str = "doc_id", text_col: str = "text",
                   resolution: int = 1_000_000) -> DataFrame:
    """End-to-end data-mixing sampler: temperature weights -> per-source
    keep rates -> deterministic hash membership. Closes the loop from
    mixture_weights (the plan) to the actual sampled corpus (the table a
    training run reads).

    Per-source keep rate = min(1, target_fraction * oversample) where
    oversample = weight/share from mixture_weights: in expectation the
    sample holds target_fraction of the corpus TOKENS, redistributed
    toward small sources per the temperature rule. Sources whose
    oversample exceeds 1/target_fraction saturate at rate 1 (sampling
    without replacement cannot up-weight past keeping everything; epoch
    replication handles the remainder downstream — the saturated rate
    makes that visible as keep_rate = 1.0).

    Membership is the same engine-portable Knuth multiplicative hash as
    stratified_sample: reproducible across runs/engines/partitionings,
    nested under growing target_fraction, and a narrow filter after one
    broadcast join with the |sources|-row weight table — the corpus never
    shuffles. The rate is computed from the 6dp-ROUNDED oversample and
    floored to an integer threshold so both engines make the identical
    keep decision at the boundary; the reported keep_rate is that
    threshold / resolution — the rate ACTUALLY used for membership, which
    also sidesteps a second float-rounding boundary.

    -> kept rows as (doc_id, source, keep_rate = threshold/resolution).
    """
    weights = mixture_weights(docs, group_col, text_col, alpha).select(
        group_col, "oversample")
    rate = F.least(F.lit(1.0), F.lit(target_fraction) * F.col("oversample"))
    threshold = F.floor(rate * resolution)
    bucket = F.pmod(F.pmod(F.col(id_col).cast("long") * F.lit(KNUTH),
                           F.lit(HASH_MOD)), F.lit(resolution))
    return (docs.join(F.broadcast(weights), group_col)
            .filter(bucket < threshold)
            .select(id_col, group_col,
                    (threshold.cast("double") / F.lit(float(resolution)))
                    .alias("keep_rate")))


def train_valid_split(df: DataFrame, id_col: str,
                      valid_fraction_denom: int = 10) -> tuple[DataFrame, DataFrame]:
    """~1/denom of rows to validation (reference: 10%)."""
    with_fold = fold_assign(df, id_col, valid_fraction_denom)
    return (with_fold.filter(F.col("fold") != 0).drop("fold"),
            with_fold.filter(F.col("fold") == 0).drop("fold"))


def top1_by(df: DataFrame, group_cols: list[str], order_col: str,
            tiebreak_col: str) -> DataFrame:
    """Best row per group: max order_col, ties -> min tiebreak_col.

    Reference analogue: best-epoch argmax by F1 (saber/metrics.py:240-284).
    """
    w = Window.partitionBy(*group_cols).orderBy(
        F.col(order_col).desc(), F.col(tiebreak_col).asc())
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


def mixture_weights(docs: DataFrame, group_col: str = "source",
                    text_col: str = "text", alpha: float = 0.5) -> DataFrame:
    """Temperature-scaled data-mixing weights per corpus source.

    The standard LLM-pretraining mixture rule: a source holding share p_i
    of the corpus tokens is sampled with weight p_i^alpha / sum_j p_j^alpha
    (alpha=1 -> proportional, alpha->0 -> uniform; alpha≈0.3-0.7 upweights
    small high-quality sources the way multilingual/web mixes do).

    -> (source, n_docs, n_tokens, token_share, weight, oversample) with
    token_share/weight/oversample rounded to 6; oversample = weight /
    token_share is the effective epoch multiplier per source.

    Scale: one partial+final hash agg over the corpus (token counts are a
    narrow map — whitespace split size, no tokenizer UDF); the normalizing
    sums run on the |sources|-row aggregate, so the unpartitioned windows
    are bounded by source count, never corpus size. Portable: integer token
    sums, pow on exact rationals, one final 6-decimal round.

    Zero-token degeneracy is DEFINED, not NULL: a source with 0 tokens gets
    share=weight=oversample=0.0 (downstream samplers simply never draw it),
    and a corpus with 0 tokens total yields all-zero rows — no NULLs reach
    the sampler either way.
    """
    # split('') returns [''] (size 1) — guard so empty/whitespace-only docs
    # contribute 0 tokens, not 1, to their source's share
    n_toks = F.when(F.trim(F.col(text_col)) == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")))
    per_src = docs.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_toks.cast("long")).alias("n_tokens"))
    w_all = Window.partitionBy()
    total = F.sum("n_tokens").over(w_all)
    share = (F.when(total == 0, F.lit(0.0))
             .otherwise(F.col("n_tokens") / total))
    raw = F.pow(share, F.lit(alpha))
    sum_raw = F.sum(raw).over(w_all)
    weight = F.when(sum_raw == 0, F.lit(0.0)).otherwise(raw / sum_raw)
    oversample = F.when(share == 0, F.lit(0.0)).otherwise(weight / share)
    return per_src.select(
        group_col, "n_docs", "n_tokens",
        F.round(share, 6).alias("token_share"),
        F.round(weight, 6).alias("weight"),
        F.round(oversample, 6).alias("oversample"))


def dsir_weights(tokens: DataFrame, target_ids: DataFrame,
                 buckets: int = 256, id_col: str = "doc_id",
                 token_col: str = "token") -> DataFrame:
    """Data Selection with Importance Resampling (DSIR, Xie et al. 2023,
    arXiv:2302.03169): per-document log importance weight of a hashed
    bigram bag-of-ngrams model, target distribution vs raw corpus.

    -> (doc_id, n_features, logw) where
       logw = sum over the doc's bigram features f of
              ln p_target(bucket(f)) - ln p_raw(bucket(f))
    with Laplace-smoothed bucket probabilities
       p(b) = (count(b) + 1) / (total + buckets)
    estimated from the TARGET subset (``target_ids``: one id column
    naming the target docs, e.g. a trusted high-quality source) and
    from the FULL raw corpus respectively. Documents with high logw
    "look like" the target distribution; resampling the raw corpus by
    these weights is the published recipe for domain-targeted
    pretraining selection. Docs with < 2 tokens have no bigram and
    report n_features=0, logw=0.0 (defined, not NULL — the
    mixture_weights degeneracy convention).

    Portability: the feature hash is the first 8 hex chars of
    md5(tok1||' '||tok2) mod ``buckets`` — md5 is bit-identical in every
    engine (the dedup_exact precedent), so the DuckDB twin reproduces
    bucket ids, counts, and the final 6dp-rounded log weight exactly.

    Scale shape: bigrams are a self-join-free window lead (one shuffle
    on doc_id, already the tokens table's natural key); the two bucket
    histograms are hash aggs over at most ``buckets`` rows, broadcast
    back into a narrow scoring join — the raw corpus is never shuffled
    by anything wider than its own doc_id. buckets is the published
    10^4-ish knob at 100 TB; the histogram stays broadcastable at any
    corpus size because its row count is bounded by the bucket count.
    """
    w = Window.partitionBy(id_col).orderBy("pos")
    nxt = F.lead(token_col).over(w)
    grams = (tokens
             .withColumn("nxt", nxt)
             .filter(F.col("nxt").isNotNull())
             .select(F.col(id_col),
                     ((F.conv(F.substring(
                         F.md5(F.concat_ws(" ", token_col, "nxt")), 1, 8),
                         16, 10).cast("long")) % buckets).alias("bucket")))
    tgt = grams.join(F.broadcast(target_ids.select(id_col).distinct()),
                     id_col, "left_semi")
    raw_hist = grams.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_raw"))
    tgt_hist = tgt.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_tgt"))
    hist = (raw_hist.join(tgt_hist, "bucket", "left")
            .select("bucket",
                    "n_raw",
                    F.coalesce("n_tgt", F.lit(0)).alias("n_tgt")))
    totals = hist.agg(F.sum("n_raw").alias("tot_raw"),
                      F.sum("n_tgt").alias("tot_tgt"))
    log_ratio = (F.log((F.col("n_tgt") + 1).cast("double")
                       / (F.col("tot_tgt") + buckets))
                 - F.log((F.col("n_raw") + 1).cast("double")
                         / (F.col("tot_raw") + buckets)))
    scored = (grams
              .join(F.broadcast(hist.crossJoin(totals)), "bucket")
              .groupBy(id_col)
              .agg(F.count(F.lit(1)).alias("n_features"),
                   F.round(F.sum(log_ratio), 6).alias("logw")))
    all_docs = tokens.select(id_col).distinct()
    return (all_docs.join(scored, id_col, "left")
            .select(id_col,
                    F.coalesce("n_features", F.lit(0)).alias("n_features"),
                    F.coalesce("logw", F.lit(0.0)).alias("logw")))


def weighted_sample(df: DataFrame, weight_col: str, k: int,
                    id_col: str = "doc_id") -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis A-ES, 2006): each row draws key = u^(1/w) with
    u uniform in (0,1); the k largest keys are the sample — provably
    distributed as sequential weighted draws without replacement.

    -> (id, weight, key rounded 6, rank). "Random" u is a deterministic
    md5 hash of the row id (the dsir_weights portability precedent), so
    the sample is reproducible across runs, partitionings, AND engines —
    the property that makes a 100 TB curation run auditable. Weights
    must be > 0 (validated — a zero weight would put u^inf == 0 keys in
    the tail legitimately, but a NULL/negative one is a data bug).

    Scale shape: key assignment is a narrow map (md5 + pow — no shuffle,
    no Python); the global top-k is TakeOrderedAndProject (per-partition
    heaps + a k-row driver merge) on the ROUNDED key with id tie-break,
    never a full sort. This is the one-pass distributed replacement for
    sequential reservoir sampling.
    """
    bad = df.filter(F.col(weight_col).isNull()
                    | (F.col(weight_col) <= 0)).limit(1).count()
    if bad:
        raise ValueError(
            f"weighted_sample: weight_col '{weight_col}' contains NULL "
            f"or non-positive values")
    # u in (0,1): 32-bit md5 prefix scaled by 2^-32, +1 ulp-ish offset so
    # u is never exactly 0 (ln(0) guard not needed; pow(0, x) edge avoided)
    u = ((F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8),
                 16, 10).cast("double") + 0.5) / F.lit(4294967296.0))
    key = F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double"))
    keyed = df.select(F.col(id_col), F.col(weight_col).alias("weight"),
                      F.round(key, 6).alias("key"))
    top = keyed.orderBy(F.col("key").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("key").desc(), F.col(id_col).asc())
    return top.select(id_col, "weight", "key",
                      F.row_number().over(w).cast("long").alias("rank"))


def grouped_split(df: DataFrame, group_col: str, folds: int = 5,
                  fold_col: str = "fold") -> DataFrame:
    """Group-exclusive fold assignment: every row of a group lands in the
    SAME fold — fold = (first-8-hex of md5(group)) mod folds, the
    weighted_sample/DSIR portable string-hash family.

    fold_assign hashes the ROW id, which silently leaks near-duplicate
    rows of one origin across train/test: pages from one host, sentences
    from one document, and recrawls of one site correlate, so a row-level
    split overstates held-out performance (the group-k-fold lesson).
    Hashing the GROUP key makes exclusivity a property of the formula —
    no shuffle, no coordination, reproducible on any engine at any
    partitioning, exactly what a 10^12-row split needs (a global
    group->fold assignment table would itself be a big-data join).
    """
    h = F.conv(F.substring(F.md5(F.col(group_col).cast("string")), 1, 8),
               16, 10).cast("long")
    return df.withColumn(fold_col, (h % folds).cast("long"))


def grouped_split_audit(df: DataFrame, group_col: str, folds: int = 5,
                        id_col: str = "doc_id") -> DataFrame:
    """Audit table of a grouped_split -> one row per fold:
    (fold, n_groups, n_docs, largest_group_docs).

    n_groups/n_docs expose fold balance (group-hash splits are balanced
    in expectation, not by construction — a skewed group-size
    distribution shows up here before it poisons an eval);
    largest_group_docs flags the single-hub-dominates-a-fold failure.
    Group exclusivity needs no audit row: one group hashes to one fold
    by construction. Scale: one (fold, group) agg + one fold agg, both
    algebraic.
    """
    per_group = (grouped_split(df, group_col, folds)
                 .groupBy("fold", group_col)
                 .agg(F.count(F.lit(1)).alias("n_rows")))
    return (per_group.groupBy("fold")
            .agg(F.count(F.lit(1)).alias("n_groups"),
                 F.sum("n_rows").alias("n_docs"),
                 F.max("n_rows").alias("largest_group_docs")))
