"""One-pass table profiling: per-column null/distinct/min/max statistics.

The ANALYZE-shape every engine ships (and the first thing a data-quality
pass runs over a new crawl drop). Implemented as a single wide-to-long
``stack`` (narrow, JVM codegen) followed by ONE grouped aggregation —
profiling K columns costs one shuffle, not K scans of the table.

Values are compared AS STRINGS (cast before the aggregation) so min/max
are well-defined across mixed types and engine-portable; numeric columns
meant for numeric min/max should be profiled by a numeric agg instead.

Scale: count(DISTINCT value) is exact here (two-phase distinct aggregate —
Spark plans an Expand + partial/final, still one logical pass); at 100 TB
swap ``exact_distinct=False`` to use approx_count_distinct (HLL sketch,
mergeable, no second shuffle) — the column stays named n_distinct and the
oracle check is then rows-only by design.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: Sequence[str],
                  exact_distinct: bool = True) -> DataFrame:
    """-> (column_name, n_rows, n_nonnull, n_distinct, min_value, max_value)
    one row per profiled column; *_value are strings (NULLs excluded from
    distinct/min/max, counted via n_rows - n_nonnull)."""
    for c in columns:
        # names are interpolated into a generated stack() expression; a
        # quote/backtick would break out of (or silently re-pair) it
        if "'" in c or "`" in c:
            raise ValueError(f"profile_table: column name {c!r} may not "
                             "contain quotes or backticks")
    pairs = ", ".join(
        f"'{c}', cast(`{c}` as string)" for c in columns)
    stacked = df.select(
        F.expr(f"stack({len(columns)}, {pairs}) as (column_name, value)"))
    n_distinct = (F.count_distinct(F.col("value")) if exact_distinct
                  else F.approx_count_distinct("value"))
    return (stacked.groupBy("column_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("value").alias("n_nonnull"),
        n_distinct.alias("n_distinct"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    ))


def skew_profile(df: DataFrame, key_col: str) -> DataFrame:
    """Key-distribution skew diagnostics -> ONE row (n_rows, n_keys,
    top_key, max_count, max_share, skew_factor, entropy).

    The pre-flight check for every groupBy/join key in this repo: the
    heavy right tail this reports is exactly what the salted
    canonicalization, AQE skew-join, and broadcast decisions exist for.
    skew_factor = max_count / mean_count (1.0 = perfectly uniform);
    entropy = Shannon entropy of the key distribution in nats
    (ln(n_keys) = uniform). NULL keys count as a key (they hash to one
    reducer like any other — the exact skew hazard this profiles).

    Scale shape: one partial+final hash agg to the key histogram, then
    one agg over |keys| rows (entropy via H = ln N - sum(c ln c)/N, a
    single pass, no per-key probability materialization); top_key via
    max(struct(count, key)) — a total order, so ties break
    deterministically toward the larger key string. Rounded to 6.
    """
    hist = (df.groupBy(F.col(key_col).cast("string").alias("k"))
            .agg(F.count(F.lit(1)).alias("c")))
    agg = hist.agg(
        F.sum("c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max(F.struct(F.col("c"), F.col("k"))).alias("top"),
        F.sum(F.col("c") * F.log(F.col("c").cast("double"))).alias("clnc"))
    return agg.select(
        "n_rows", "n_keys",
        F.col("top.k").alias("top_key"),
        F.col("top.c").alias("max_count"),
        F.round(F.col("top.c") / F.col("n_rows").cast("double"), 6)
        .alias("max_share"),
        F.round(F.col("top.c") * F.col("n_keys")
                / F.col("n_rows").cast("double"), 6).alias("skew_factor"),
        F.round(F.log(F.col("n_rows").cast("double"))
                - F.col("clnc") / F.col("n_rows"), 6).alias("entropy"))


def fd_violations(df: DataFrame, lhs_col: str, rhs_col: str) -> DataFrame:
    """Functional-dependency audit lhs -> rhs: every lhs value bound to
    MORE than one distinct rhs, as (lhs, n_distinct_rhs, n_rows).

    KG quality gate: surface -> canonical_id should be functional after
    disambiguation (a violation row = an ambiguity the linker must
    resolve); canonical_id -> label must be functional after
    harmonization (a violation = a type conflict the fanout missed).
    Empty result = the dependency HOLDS.

    Scale shape: one partial+final agg on lhs (count distinct rhs is
    Spark's two-phase Expand plan — still one logical pass); the filter
    prunes to violations before anything leaves the aggregation.
    """
    return (df.groupBy(F.col(lhs_col))
            .agg(F.count_distinct(F.col(rhs_col)).alias("n_distinct_rhs"),
                 F.count(F.lit(1)).alias("n_rows"))
            .filter(F.col("n_distinct_rhs") > 1))


def fd_mine(df: DataFrame, pairs: Sequence[tuple[str, str]],
            eps: float = 0.0) -> DataFrame:
    """Approximate functional-dependency MINING over candidate column
    pairs — the discovery generalization of fd_violations' single-FD
    audit (TANE/pyro-style g3 error, Kivinen & Mannila 1995): for each
    candidate lhs -> rhs, the g3 error is the fraction of rows that must
    be deleted for the FD to hold exactly,

        g3 = 1 - sum_over_lhs_groups(max rhs-value count) / N.

    Schema-profiling stage of KG ingestion: run over a harvested
    attribute table to learn which predicates are (nearly) functional
    before resolve_conflicts/link_fd_check assume they are.

    Scale shape: one partial+final hash agg on (lhs, rhs) per candidate,
    then a tiny agg on lhs — each candidate is an independent Spark job
    over the same scan, unioned as |pairs| one-row results (|pairs| is a
    schema-sized constant; at 10^12 rows the (lhs, rhs) agg is the only
    wide stage and map-side combine collapses it). NULLs group as a
    value (SQL GROUP BY semantics), matching the oracle.

    -> (lhs_col, rhs_col, n_groups, n_rows, g3_error 6dp, holds) ordered
    by (lhs_col, rhs_col); holds = g3 <= eps.
    """
    legs = []
    for lhs, rhs in pairs:
        counts = (df.groupBy(F.col(lhs).alias("_l"), F.col(rhs).alias("_r"))
                  .agg(F.count(F.lit(1)).alias("c")))
        per_lhs = counts.groupBy("_l").agg(F.max("c").alias("keep"),
                                           F.sum("c").alias("tot"))
        legs.append(per_lhs.agg(
            F.lit(lhs).alias("lhs_col"),
            F.lit(rhs).alias("rhs_col"),
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("tot").alias("n_rows"),
            F.round(1.0 - F.sum("keep").cast("double")
                    / F.sum("tot").cast("double"), 6).alias("g3_error"),
        ).withColumn("holds", F.col("g3_error") <= eps))
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.orderBy("lhs_col", "rhs_col")


def schema_match(a: DataFrame, b: DataFrame, a_cols: Sequence[str],
                 b_cols: Sequence[str]) -> DataFrame:
    """Instance-based schema matching (Rahm & Bernstein VLDB J. 2001 §4.2):
    score every column pair across two tables by the overlap of their
    DISTINCT value sets — the data-integration step before table_triples /
    microdata facts from a new source merge into the KG (which predicate
    of ours is this table's column?).

    Values compare as strings (NULLs dropped). For each (col_a, col_b)
    with any overlap: jaccard = |A∩B| / |A∪B| and containment =
    |A∩B| / min(|A|,|B|) — containment catches subset matches jaccard
    dilutes (a sample of a key column still scores 1.0).

    Scale shape: each side unpivots via one explode of a schema-sized
    struct array (narrow) into (col, val), deduped by a partial+final
    hash agg; the only corpus-wide exchange is the value equi-join on the
    ALREADY-DISTINCT sides, and the per-column cardinalities ride in as
    broadcast joins. Never a column×column cross join — pairs that share
    no value never materialize.

    -> (col_a, col_b, n_a, n_b, n_common, jaccard 6dp, containment 6dp).
    """
    def unpivot(df, cols):
        pairs = F.array(*[
            F.struct(F.lit(c).alias("col"),
                     F.col(c).cast("string").alias("val"))
            for c in cols])
        return (df.select(F.explode(pairs).alias("cv"))
                .select(F.col("cv.col").alias("col"),
                        F.col("cv.val").alias("val"))
                .filter(F.col("val").isNotNull())
                .distinct())

    ua = unpivot(a, a_cols)
    ub = unpivot(b, b_cols)
    na = ua.groupBy("col").agg(F.count(F.lit(1)).alias("n_a"))
    nb = ub.groupBy("col").agg(F.count(F.lit(1)).alias("n_b"))
    common = (ua.join(ub.select(F.col("col").alias("col_b"), "val"), "val")
              .groupBy(F.col("col").alias("col_a"), "col_b")
              .agg(F.count(F.lit(1)).alias("n_common")))
    return (common
            .join(F.broadcast(na.select(F.col("col").alias("col_a"), "n_a")),
                  "col_a")
            .join(F.broadcast(nb.select(F.col("col").alias("col_b"), "n_b")),
                  "col_b")
            .select(
                "col_a", "col_b", "n_a", "n_b", "n_common",
                F.round(F.col("n_common").cast("double") /
                        (F.col("n_a") + F.col("n_b") - F.col("n_common"))
                        .cast("double"), 6).alias("jaccard"),
                F.round(F.col("n_common").cast("double") /
                        F.least("n_a", "n_b").cast("double"), 6)
                .alias("containment")))


def expectations_check(df: DataFrame, checks: Sequence[tuple]) -> DataFrame:
    """Deequ-style declarative data-quality expectations: run a list of
    (name, kind, column, param) constraints over one table and emit a
    one-row verdict per check — the CI gate a 100 TB ingest runs before
    publishing a snapshot (Schelter et al., VLDB 2018's unit-test-for-
    data shape). Kinds:

        not_null          no NULLs in column            (param ignored)
        unique            no duplicated values          (param ignored)
        min / max         column min >= / max <= param
        accepted_values   every value in param (list)

    Scale shape: every check is ONE aggregate over the same scan —
    violations count map-side (sum of codegen'd predicates; uniqueness
    is the lone two-phase (value) agg) — and the verdicts union as
    |checks| single rows. Nothing corpus-sized survives any stage.

    -> (check_name, kind, column, n_rows, n_violations, passed) ordered
    by check_name.
    """
    legs = []
    for name, kind, column, param in checks:
        c = F.col(column)
        if kind == "not_null":
            leg = df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.when(c.isNull(), 1).otherwise(0))
                .cast("long").alias("n_violations"))
        elif kind == "unique":
            grouped = df.groupBy(c.alias("_v")).agg(
                F.count(F.lit(1)).alias("_c"))
            leg = grouped.agg(
                F.sum("_c").cast("long").alias("n_rows"),
                F.sum(F.when(F.col("_c") > 1, F.col("_c") - 1)
                      .otherwise(0)).cast("long").alias("n_violations"))
        elif kind in ("min", "max"):
            bad = (c < F.lit(param)) if kind == "min" else (c > F.lit(param))
            leg = df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.when(c.isNull() | bad, 1).otherwise(0))
                .cast("long").alias("n_violations"))
        elif kind == "accepted_values":
            leg = df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.when(c.isin(*param), 0).otherwise(1))
                .cast("long").alias("n_violations"))
        else:
            raise ValueError(f"expectations_check: unknown kind {kind!r}")
        legs.append(leg.select(
            F.lit(name).alias("check_name"), F.lit(kind).alias("kind"),
            F.lit(column).alias("column"), "n_rows", "n_violations",
            (F.col("n_violations") == 0).alias("passed")))
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.orderBy("check_name")


def dp_release_counts(df: DataFrame, group_col: str, epsilon: float = 1.0,
                      threshold: float = 10.0, seed: str = "dp0"
                      ) -> DataFrame:
    """Differentially-private grouped-count release -> (group, noisy_n)
    for groups whose noisy count clears ``threshold``.

    The release rule behind published web-corpus statistics (Google
    n-grams, CC host tables): per-group count + Laplace(1/epsilon)
    noise, then suppress small groups — thresholding noisy counts is the
    standard (epsilon, delta) mechanism for releasing a group-by over
    user-contributed keys whose domain is unknown a priori (Korolova
    WWW'09 / Wilson et al. VLDB'20 "DP SQL" shape).

    Determinism contract: this sandbox's comparator needs bit-identical
    replays, so the Laplace draw derives from the md5-portable-hash
    uniform u = (int(md5(seed:group)[:8hex]) % 2^20 + 0.5) / 2^20 via
    inverse CDF: noise = -(1/eps) * sign(u - 1/2) * ln(1 - 2|u - 1/2|).
    A production deployment swaps ONE expression — the hash uniform for
    a secure RNG draw — and keeps the plan; deterministic replay is the
    documented trade (lineage-stable retries) also made by DP systems
    that seed per-release (the +0.5 centering keeps u strictly inside
    (0, 1), so ln never sees 0).

    Scale shape: one partial+final hash agg over the table (count only —
    the heavy lineage), then the noise expression and threshold filter
    run on the already-aggregated group rows (bounded by group
    cardinality). Zero extra shuffles, no Python.
    """
    u = ((F.conv(F.substring(
             F.md5(F.concat_ws(":", F.lit(seed), F.col(group_col))),
             1, 8), 16, 10).cast("long") % 1048576).cast("double")
         + 0.5) / 1048576.0
    centered = u - 0.5
    noise = (-(1.0 / epsilon)
             * F.signum(centered)
             * F.log(1.0 - 2.0 * F.abs(centered)))
    return (df.groupBy(group_col)
            .agg(F.count(F.lit(1)).cast("long").alias("_n"))
            .withColumn("noisy_n",
                        F.round(F.col("_n") + noise, 6))
            .filter(F.col("noisy_n") >= threshold)
            .select(group_col, "noisy_n"))


def k_anonymity_audit(df: DataFrame, quasi_cols: Sequence[str],
                      sensitive_col: str, k: int = 5,
                      ell: int = 2) -> DataFrame:
    """k-anonymity / l-diversity audit (Sweeney IJUFKS 2002; Machanavajjhala
    et al. ICDE 2006) over a quasi-identifier combination: every row whose
    quasi-identifier equivalence class holds fewer than k rows is
    re-identifiable by linkage, and a class whose sensitive attribute
    shows fewer than l distinct values leaks it outright — the release
    gate a training-data pipeline runs BEFORE publishing per-group
    statistics or retained user-derived records (the audit counterpart
    of dp_release_counts' noise-adding release path and pii_scrub's
    field-level redaction).

    One hash agg over the quasi-identifier key builds the equivalence
    classes (count + distinct-sensitive per class — both algebraic /
    partial-aggregatable, so Zipf-headed classes combine map-side), then
    ONE row-count-bounded summary agg. Skewed quasi-identifier
    combinations are the NORMAL case (that's what the audit detects),
    and the class agg tolerates them: a hot class is still a single
    reduced row per partition before the exchange.

    -> ONE summary row: (n_rows, n_classes, k_threshold, min_class_size,
    n_classes_below_k, n_rows_below_k, l_threshold, min_l_diversity,
    n_classes_below_l, k_anonymous, l_diverse).
    """
    key = [F.coalesce(F.col(c).cast("string"), F.lit("<NULL>"))
           .alias(f"_qi_{i}") for i, c in enumerate(quasi_cols)]
    classes = (df.select(*key, F.col(sensitive_col).alias("_sens"))
               .groupBy(*[f"_qi_{i}" for i in range(len(quasi_cols))])
               .agg(F.count(F.lit(1)).alias("class_size"),
                    F.countDistinct("_sens").alias("l_div")))
    return classes.agg(
        F.sum("class_size").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.lit(int(k)).cast("long").alias("k_threshold"),
        F.min("class_size").cast("long").alias("min_class_size"),
        F.sum((F.col("class_size") < k).cast("long")).cast("long")
        .alias("n_classes_below_k"),
        F.sum(F.when(F.col("class_size") < k, F.col("class_size"))
              .otherwise(F.lit(0))).cast("long").alias("n_rows_below_k"),
        F.lit(int(ell)).cast("long").alias("l_threshold"),
        F.min("l_div").cast("long").alias("min_l_diversity"),
        F.sum((F.col("l_div") < ell).cast("long")).cast("long")
        .alias("n_classes_below_l"),
        (F.min("class_size") >= k).alias("k_anonymous"),
        (F.min("l_div") >= ell).alias("l_diverse"))


def chao1_richness(items: DataFrame, item_col: str) -> DataFrame:
    """Chao1 species-richness estimate (Chao, Scand. J. Stat. 1984;
    bias-corrected form) over any key stream: from the frequency
    histogram's singletons (f1) and doubletons (f2), estimate how many
    TYPES exist that the corpus has not yet seen —

        chao1 = s_obs + f1 * (f1 - 1) / (2 * (f2 + 1))

    (the bias-corrected form is defined even when f2 = 0). For a
    construction pipeline this answers the completeness question
    good_turing's unseen MASS does not: not "how much probability do
    unseen entities carry" but "HOW MANY entities/vocab types is the
    next crawl likely to add" — the standard KB-coverage estimator
    (Trushkowsky et al. ICDE 2013 applied exactly this to crowdsourced
    KB completeness).

    Scale shape: the type-frequency agg is the only corpus-sized
    shuffle (map-side partials absorb the Zipf head — good_turing's
    contract); everything after runs on the ~hundreds-of-rows
    histogram and reduces to ONE output row.

    -> (s_obs, f1, f2, chao1 6dp, unseen_frac 6dp): unseen_frac =
    estimated fraction of types not yet observed.
    """
    freqs = items.groupBy(item_col).agg(F.count(F.lit(1)).alias("r"))
    hist = freqs.groupBy("r").agg(F.count(F.lit(1)).alias("n_r"))
    agg = hist.agg(
        F.sum("n_r").alias("s_obs"),
        F.coalesce(F.sum(F.when(F.col("r") == 1, F.col("n_r"))),
                   F.lit(0)).alias("f1"),
        F.coalesce(F.sum(F.when(F.col("r") == 2, F.col("n_r"))),
                   F.lit(0)).alias("f2"))
    chao1 = (F.col("s_obs")
             + F.col("f1") * (F.col("f1") - 1) / (2 * (F.col("f2") + 1)))
    return agg.select(
        F.col("s_obs").cast("long").alias("s_obs"),
        F.col("f1").cast("long").alias("f1"),
        F.col("f2").cast("long").alias("f2"),
        F.round(chao1, 6).alias("chao1"),
        F.round(F.lit(1.0) - F.col("s_obs") / chao1, 6)
        .alias("unseen_frac"))


def benford_audit(df: DataFrame, value_col: str) -> DataFrame:
    """Benford's-law first-significant-digit audit (Newcomb 1881;
    Benford 1938; Nigrini's forensic-accounting standard) over a
    positive numeric column — the numeric-fact counterpart of the
    text-side quality audits: naturally-occurring magnitudes
    (prices, populations, counts extracted into a KG) follow
    P(d) = log10(1 + 1/d); fabricated, templated, or unit-mangled
    values do not, so a large chi-square flags an extraction source
    worth quarantining BEFORE its facts enter fusion.

    First digit d(x) = floor(x / 10^floor(log10(x))) for x > 0
    (non-positive rows are excluded — Benford is defined on
    magnitudes). Counts are exact; obs/exp proportions and the
    chi-square contribution ((n_d - N p_d)^2 / (N p_d)) are doubles
    on exact rationals -> 6dp round is engine-portable.

    Scale shape: ONE 9-key hash agg (map-side partials collapse each
    partition to <= 9 rows); the expected-law join is a 9-row
    broadcast crossJoin of the 1-row total. No window, no Python.

    -> 9 rows (digit, n, obs_p 6dp, exp_p 6dp, chi2_term 6dp),
    digits with zero support still appear (n = 0).
    """
    x = F.col(value_col)
    digit = F.floor(x / F.pow(F.lit(10.0), F.floor(F.log10(x))))
    counts = (df.filter(x > 0)
              .select(digit.cast("long").alias("digit"))
              .groupBy("digit")
              .agg(F.count(F.lit(1)).alias("n")))
    digits = df.sparkSession.range(1, 10).select(
        F.col("id").alias("digit"))
    full = (digits.join(counts, "digit", "left")
            .select("digit", F.coalesce("n", F.lit(0)).alias("n")))
    total = full.agg(F.sum("n").alias("total"))
    exp_p = F.log10(1 + 1 / F.col("digit"))
    exp_n = F.col("total") * exp_p
    return (full.crossJoin(F.broadcast(total))
            .select(F.col("digit").cast("long").alias("digit"),
                    F.col("n").cast("long").alias("n"),
                    F.round(F.col("n") / F.col("total"), 6).alias("obs_p"),
                    F.round(exp_p, 6).alias("exp_p"),
                    F.round(F.pow(F.col("n") - exp_n, F.lit(2.0)) / exp_n,
                            6).alias("chi2_term")))


def lexical_richness(items: DataFrame, item_col: str) -> DataFrame:
    """Classic lexical-richness panel from the type-frequency histogram
    (the third member of the good_turing / chao1_richness family —
    same single corpus-sized agg, different question: not unseen mass
    or unseen types but HOW REPETITIVE the observed text is, the
    template/boilerplate signal stylometry and MT-output detection
    key on):

        ttr        = V / N                (type-token ratio)
        hapax_frac = f1 / V               (fraction of one-off types)
        yule_k     = 1e4 * (sum r^2 n_r - N) / N^2   (Yule 1944;
                     repeat-rate statistic, length-robust unlike TTR)

    All inputs are exact integers from the histogram; the divisions
    are the only floating steps -> 6dp round is engine-portable.

    Scale shape: chao1_richness's contract — ONE type-frequency agg
    (map-side combine absorbs the Zipf head), count-of-counts on the
    |types|-row table, single-row arithmetic after.

    -> ONE row (n_tokens, n_types, f1, ttr 6dp, hapax_frac 6dp,
    yule_k 6dp).
    """
    freqs = items.groupBy(item_col).agg(F.count(F.lit(1)).alias("r"))
    hist = freqs.groupBy("r").agg(F.count(F.lit(1)).alias("n_r"))
    agg = hist.agg(
        F.sum(F.col("r") * F.col("n_r")).alias("n_tokens"),
        F.sum("n_r").alias("n_types"),
        F.coalesce(F.sum(F.when(F.col("r") == 1, F.col("n_r"))),
                   F.lit(0)).alias("f1"),
        F.sum(F.col("r") * F.col("r") * F.col("n_r")).alias("sum_r2"))
    n = F.col("n_tokens")
    return agg.select(
        n.cast("long").alias("n_tokens"),
        F.col("n_types").cast("long").alias("n_types"),
        F.col("f1").cast("long").alias("f1"),
        F.round(F.col("n_types") / n, 6).alias("ttr"),
        F.round(F.col("f1") / F.col("n_types"), 6).alias("hapax_frac"),
        # two successive divisions, NOT n*n: keeps the intermediate in
        # double range (n*n overflows BIGINT past ~3e9 tokens)
        F.round(F.lit(1e4) * (F.col("sum_r2") - n) / n / n, 6)
        .alias("yule_k"))


def chisq_independence(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Pearson chi-square test of independence + Cramér's V effect
    size (Pearson 1900; Cramér 1946) over a two-column contingency
    table — the categorical-association audit (is `lang` independent
    of `source`? is `label` independent of shard?) that catches
    stratification bugs and leaky splits before training; Benford's
    chi-square tests a column against a LAW, this tests two columns
    against EACH OTHER.

        chi2 = sum (o_ij - e_ij)^2 / e_ij,  e_ij = r_i * c_j / n
        V    = sqrt(chi2 / (n * min(r - 1, c - 1)))

    Cell/marginal counts are exact integers; e and the terms are
    doubles on exact rationals -> 6dp round.

    Scale shape: ONE (a, b) hash agg is the only corpus-sized
    exchange; marginals re-aggregate the |cells|-row table and join
    back by key (broadcast — categorical cardinalities are small by
    definition); the reduction is one row. Zero-count cells
    contribute their expected mass through the marginals without
    being materialized (the (o - e)^2/e term for o = 0 is e, summed
    as (n - observed-cell e-sum) below — algebraic identity
    chi2 = sum_observed o^2/e - n).

    -> ONE row (n, r, c, dof, chi2 6dp, cramers_v 6dp).
    """
    cells = (df.groupBy(a_col, b_col)
             .agg(F.count(F.lit(1)).alias("o")))
    ra = cells.groupBy(a_col).agg(F.sum("o").alias("ri"))
    cb = cells.groupBy(b_col).agg(F.sum("o").alias("cj"))
    tot = cells.agg(F.sum("o").alias("n"),
                    F.countDistinct(a_col).alias("r"),
                    F.countDistinct(b_col).alias("c"))
    j = (cells.join(F.broadcast(ra), a_col)
         .join(F.broadcast(cb), b_col)
         .crossJoin(F.broadcast(tot)))
    # chi2 = sum over OBSERVED cells of o^2 * n / (ri * cj)  -  n
    term = (F.col("o") * F.col("o") * F.col("n")
            / (F.col("ri") * F.col("cj")))
    agg = j.agg(F.sum(term).alias("s"),
                F.max("n").alias("n"), F.max("r").alias("r"),
                F.max("c").alias("c"))
    chi2 = F.col("s") - F.col("n")
    mindim = F.least(F.col("r") - 1, F.col("c") - 1)
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("r").cast("long").alias("r"),
        F.col("c").cast("long").alias("c"),
        ((F.col("r") - 1) * (F.col("c") - 1)).cast("long").alias("dof"),
        F.round(chi2, 6).alias("chi2"),
        F.round(F.sqrt(F.try_divide(chi2, (F.col("n") * mindim)
                                    .cast("double"))), 6)
        .alias("cramers_v"))
