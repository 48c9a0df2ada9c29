"""Grouped-map statistics via applyInPandas (the grouped Arrow API).

Demonstrates the third Python-boundary shape (pandas_udf = columnar scalar,
mapInPandas = partition stream, applyInPandas = one pandas frame per GROUP)
on an operator whose semantics are also expressible relationally — so the
DuckDB oracle cross-checks the Arrow path against pure window SQL.

Scale note: applyInPandas shuffles on the group key and materializes ONE
group per pandas frame — only safe when single-group size is bounded (here:
docs per source). For unbounded groups use window functions instead; this
module exists to cover the API and to verify the two paths agree.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ZSCORE_SCHEMA = "doc_id long, source string, n_chars long, zscore double"


def zscore_by_group(docs: DataFrame, group_col: str = "source",
                    value_col: str = "n_chars") -> DataFrame:
    """Per-group z-score of a value column (population stddev).

    -> (doc_id, source, n_chars, zscore rounded 6); groups with zero
    variance emit zscore = 0.0.
    """

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        mean = pdf[value_col].mean()
        std = pdf[value_col].std(ddof=0)  # population, matches stddev_pop
        z = ((pdf[value_col] - mean) / std) if std > 0 else 0.0
        return pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "source": pdf[group_col],
            "n_chars": pdf[value_col],
            "zscore": (z if std > 0 else pd.Series(0.0, index=pdf.index)
                       ).round(6),
        })

    return docs.select("doc_id", group_col, value_col).groupBy(
        group_col).applyInPandas(score, schema=ZSCORE_SCHEMA)


def mad_outliers(df: DataFrame, value_col: str, group_col: str = "source",
                 threshold: float = 3.5) -> DataFrame:
    """Robust per-group outlier profile via median absolute deviation ->
    (group, median_val, mad, n_rows, n_outliers, outlier_rate).

    zscore_by_group's robust sibling: mean/stddev are themselves dragged
    by the outliers they are supposed to flag, so curation pipelines use
    the modified z-score M = 0.6745*|x - median| / MAD and flag |M| >
    3.5 (Iglewicz & Hoaglin 1993, "How to Detect and Handle Outliers").
    A boilerplate page 40x longer than its host's median moves the MAD
    barely at all — exactly why web-corpus length filters use this form.

    MAD = median(|x - median(x)|). Degenerate MAD = 0 (over half the
    group identical) is DEFINED: no finite threshold, so n_outliers = 0.

    Exactness: percentile() is the exact sort-based variant (DuckDB twin
    quantile_cont); the flag compares 0.6745*absdev against
    threshold*mad — both sides exact-input doubles with one
    multiplication each, no division, so the boundary is engine-portable
    (and rates are counts/count, rounded to 6, not float sums).

    Scale shape: two grouped percentile aggs (sort within group — for
    the 100-TB path swap percentile for approx_percentile, same plan
    shape) + one broadcast-eligible join of the |groups|-sized stats
    back to the rows + one final grouped count agg.
    """
    x = F.col(value_col).cast("double")
    med = (df.groupBy(group_col)
           .agg(F.expr(f"percentile({value_col}, 0.5)").alias("median_val"),
                F.count(F.lit(1)).alias("n_rows")))
    with_dev = (df.join(F.broadcast(med), group_col)
                .withColumn("absdev", F.abs(x - F.col("median_val"))))
    mad = (with_dev.groupBy(group_col, "median_val", "n_rows")
           .agg(F.expr("percentile(absdev, 0.5)").alias("mad")))
    flagged = (with_dev.join(
        F.broadcast(mad.select(group_col, "mad")), group_col)
        .withColumn("is_outlier",
                    (F.col("mad") > 0)
                    & (F.lit(0.6745) * F.col("absdev")
                       > F.lit(threshold) * F.col("mad"))))
    agg = (flagged.groupBy(group_col)
           .agg(F.sum(F.col("is_outlier").cast("long")).alias("n_outliers")))
    return (mad.join(agg, group_col)
            .select(group_col, "median_val", "mad", "n_rows",
                    F.col("n_outliers").cast("long").alias("n_outliers"),
                    F.round(F.col("n_outliers").cast("double")
                            / F.col("n_rows"), 6).alias("outlier_rate")))


def gini_concentration(df: DataFrame, group_col: str, key_col: str
                       ) -> DataFrame:
    """Gini coefficient of per-key mass within each group — the
    concentration diagnostic a corpus/KG pipeline runs before trusting
    aggregate counts (one hub entity holding 90% of a label's mentions
    means the label's statistics are really that entity's; same for one
    host dominating a source). Computed from the sorted-rank identity

        G = (2 * sum(i * x_(i))) / (n * sum(x)) - (n + 1) / n

    with x ascending, i = 1..n — exact integer sums feeding one double
    expression (the edge_pmi portability convention), no pair joins.

    Scale shape: one (group, key) hash agg (map-side combinable), one
    rank window per group over the ALREADY-reduced key counts, one
    final agg. n = distinct keys per group, so the window input is
    key-cardinality-sized, never row-sized.

    -> (group, n_keys, total, gini 6dp) — gini 0 = uniform, -> 1 =
    concentrated; single-key groups are 0 by the identity.
    """
    counts = (df.groupBy(F.col(group_col).alias("grp"),
                         F.col(key_col).alias("key"))
              .agg(F.count(F.lit(1)).alias("x")))
    w = Window.partitionBy("grp").orderBy(F.col("x").asc(),
                                          F.col("key").asc())
    ranked = counts.withColumn("i", F.row_number().over(w))
    return (ranked.groupBy("grp")
            .agg(F.count(F.lit(1)).alias("n_keys"),
                 F.sum("x").alias("total"),
                 F.sum(F.col("i") * F.col("x")).alias("ix"))
            .select(F.col("grp").alias(group_col),
                    "n_keys", "total",
                    F.round(
                        2.0 * F.col("ix").cast("double") /
                        (F.col("n_keys") * F.col("total")).cast("double")
                        - (F.col("n_keys") + 1).cast("double") /
                        F.col("n_keys").cast("double"), 6).alias("gini")))


def mann_whitney_u(df: DataFrame, group_col: str, group_a: str,
                   group_b: str, value_col: str) -> DataFrame:
    """Mann-Whitney U / Wilcoxon rank-sum two-sample test (Mann &
    Whitney 1947) with the full tie correction — the nonparametric
    "did this distribution shift?" test a pipeline runs on doc
    length / quality / latency between two slices when means are
    meaningless under heavy tails (zscore_by_group assumes a shape;
    this only assumes exchangeability):

        U_a = R_a - n_a(n_a+1)/2          (R_a = tie-averaged rank sum)
        z   = (U_a - n_a n_b / 2) / sqrt(var),
        var = (n_a n_b / 12) * (N + 1 - sum(t^3 - t) / (N (N - 1)))

    Ranks are computed per DISTINCT value (cumulative-less + half the
    tie block), never per row: the only corpus-sized exchange is the
    value-histogram agg; the ranking window runs on |distinct values|
    rows. Counts exact -> 6dp round is engine-portable.

    Scale note: the distinct-value table for doc-level metrics is
    bounded (lengths, scores at fixed precision) — at web scale it
    stays ~10^3-10^6 rows while the corpus is 10^12.

    -> ONE row (n_a, n_b, u_a 6dp, z 6dp).
    """
    g = F.col(group_col)
    hist = (df.filter(g.isin(group_a, group_b))
            .groupBy(value_col)
            .agg(F.sum(F.when(g == group_a, 1).otherwise(0)).alias("ca"),
                 F.sum(F.when(g == group_b, 1).otherwise(0)).alias("cb")))
    w = Window.orderBy(value_col).rowsBetween(
        Window.unboundedPreceding, -1)
    t = F.col("ca") + F.col("cb")
    ranked = hist.select(
        "ca", "cb", t.alias("t"),
        F.coalesce(F.sum(F.col("ca") + F.col("cb")).over(w), F.lit(0))
        .alias("less"))
    avg_rank = F.col("less") + (F.col("t") + 1) / 2
    agg = ranked.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb"),
        F.sum(F.col("ca") * avg_rank).alias("ra"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .alias("ties"))
    na, nb = F.col("na"), F.col("nb")
    n = na + nb
    ua = F.col("ra") - na * (na + 1) / 2
    var = (na * nb / 12) * (n + 1 - F.col("ties") / (n * (n - 1)))
    return agg.select(
        na.cast("long").alias("n_a"), nb.cast("long").alias("n_b"),
        F.round(ua, 6).alias("u_a"),
        F.round(F.try_divide(ua - na * nb / 2, F.sqrt(var)), 6)
        .alias("z"))


def ks_two_sample(df: DataFrame, group_col: str, group_a: str,
                  group_b: str, value_col: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic (Smirnov 1939):
    D = max over x of |F_a(x) - F_b(x)| between the two slices'
    empirical CDFs — the drift test that sees SHAPE changes (variance,
    bimodality) a rank-sum location test misses; the standard
    crawl-over-crawl distribution monitor next to js_divergence's
    token-space drift.

    Same histogram contract as mann_whitney_u: one value-histogram
    agg, cumulative sums over the |distinct values|-row table, exact
    integer numerators (|cum_a * nb - cum_b * na| over the common
    denominator na*nb) so the max is decided on exact integers; the
    single division happens once at the end -> 6dp round.

    scaled = D * sqrt(n_a n_b / (n_a + n_b)) — the statistic compared
    against the Kolmogorov critical values c(alpha).

    -> ONE row (n_a, n_b, d 6dp, scaled 6dp).
    """
    g = F.col(group_col)
    hist = (df.filter(g.isin(group_a, group_b))
            .groupBy(value_col)
            .agg(F.sum(F.when(g == group_a, 1).otherwise(0)).alias("ca"),
                 F.sum(F.when(g == group_b, 1).otherwise(0)).alias("cb")))
    w = Window.orderBy(value_col).rowsBetween(
        Window.unboundedPreceding, 0)
    cum = hist.select(
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"))
    tot = hist.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    j = cum.crossJoin(F.broadcast(tot))
    num = F.abs(F.col("cum_a") * F.col("nb")
                - F.col("cum_b") * F.col("na"))
    agg = j.agg(F.max(num).alias("max_num"),
                F.max("na").alias("na"), F.max("nb").alias("nb"))
    na, nb = F.col("na"), F.col("nb")
    d = F.try_divide(F.col("max_num"), na * nb)
    return agg.select(
        na.cast("long").alias("n_a"), nb.cast("long").alias("n_b"),
        F.round(d, 6).alias("d"),
        F.round(d * F.sqrt(na * nb / (na + nb)), 6).alias("scaled"))


def spearman_rho(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Spearman rank correlation with average ranks for ties
    (Spearman 1904; the tie-correct form is Pearson on tie-averaged
    ranks) — the monotone-association check between two document
    metrics (length vs quality, inlinks vs PageRank) that Pearson
    gets wrong under heavy tails and outliers.

    Per-column ranks come from each column's value histogram
    (cumulative-less + half the tie block, the mann_whitney_u
    contract) joined back to rows by value — no window ever touches
    the row-level table; the Pearson reduction is a single agg.

    -> ONE row (n, rho 6dp).
    """

    def ranks(col: str, alias: str) -> DataFrame:
        hist = df.groupBy(col).agg(F.count(F.lit(1)).alias("t"))
        w = Window.orderBy(col).rowsBetween(
            Window.unboundedPreceding, -1)
        return hist.select(
            F.col(col),
            (F.coalesce(F.sum("t").over(w), F.lit(0))
             + (F.col("t") + 1) / 2).alias(alias))
    rx = ranks(x_col, "rx")
    ry = ranks(y_col, "ry")
    j = (df.select(x_col, y_col)
         .join(F.broadcast(rx), x_col)
         .join(F.broadcast(ry), y_col))
    agg = j.agg(F.count(F.lit(1)).alias("n"),
                F.sum("rx").alias("sx"), F.sum("ry").alias("sy"),
                F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
                F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
                F.sum(F.col("ry") * F.col("ry")).alias("syy"))
    n = F.col("n")
    cov = F.col("sxy") - F.col("sx") * F.col("sy") / n
    vx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    vy = F.col("syy") - F.col("sy") * F.col("sy") / n
    return agg.select(
        n.cast("long").alias("n"),
        F.round(F.try_divide(cov, F.sqrt(vx * vy)), 6).alias("rho"))


def kendall_tau(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Kendall tau-b rank correlation with tie corrections (Kendall
    1938; tau-b per Kendall 1945) over an AGGREGATED metric table —
    the pair-level agreement statistic next to spearman_rho's
    rank-Pearson and rbo_overlap's top-weighted prefix view:

        tau_b = (C - D) / sqrt((n0 - n1) (n0 - n2))

    with C/D concordant/discordant pairs, n0 = n(n-1)/2, n1/n2 =
    pairs tied on x / on y (pairs tied on both count in each). Exact
    integer pair counts; one sqrt at the end -> 6dp round.

    Scale shape: the input is a per-entity metric table (hosts,
    sources, shards) — the pairwise self-join is O(n^2) in ENTITIES,
    deliberately: this operator is for the reduced tables where n is
    hundreds-to-thousands (190 pairs for 20 hosts). For corpus-sized
    association use spearman_rho (histogram ranks, no pair blowup).
    The join is a single crossJoin filtered to i < j on a broadcast
    side; everything after is one agg.

    -> ONE row (n, concordant, discordant, tau_b 6dp).
    """
    # eager checkpoint pins the id-stamped table BEFORE it is
    # referenced on both sides of the crossJoin: re-evaluating
    # monotonically_increasing_id under nondeterministic input
    # partitioning could assign different ids per side and corrupt the
    # i<j pair counts (r6, ADVICE fix — the repo determinism contract)
    a = df.select(F.col(x_col).alias("x1"), F.col(y_col).alias("y1")) \
        .withColumn("i", F.monotonically_increasing_id()) \
        .localCheckpoint(eager=True)
    b = a.select(F.col("x1").alias("x2"), F.col("y1").alias("y2"),
                 F.col("i").alias("j"))
    pairs = a.crossJoin(F.broadcast(b)).filter(F.col("i") < F.col("j"))
    sgn = (F.col("x1") - F.col("x2")) * (F.col("y1") - F.col("y2"))
    tie_x = (F.col("x1") == F.col("x2")).cast("long")
    tie_y = (F.col("y1") == F.col("y2")).cast("long")
    agg = pairs.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum((sgn > 0).cast("long")).alias("c"),
        F.sum((sgn < 0).cast("long")).alias("d"),
        F.sum(tie_x).alias("n1"),
        F.sum(tie_y).alias("n2"))
    n = df.count()
    denom = F.sqrt((F.col("n0") - F.col("n1")).cast("double")
                   * (F.col("n0") - F.col("n2")).cast("double"))
    return agg.select(
        F.lit(n).cast("long").alias("n"),
        F.col("c").cast("long").alias("concordant"),
        F.col("d").cast("long").alias("discordant"),
        F.round(F.try_divide(F.col("c") - F.col("d"), denom), 6)
        .alias("tau_b"))


def robust_location(df: DataFrame, group_col: str, value_col: str,
                    trim_frac: float = 0.1) -> DataFrame:
    """Tukey trimmed and winsorized means per group (Tukey 1962;
    Dixon & Tukey 1968 for winsorizing) — the robust location pair
    for per-source/host metric summaries where a handful of
    pathological documents drag the plain mean (mad_outliers flags
    the outliers; this reports location WITH them neutralized):

        k               = floor(n * trim_frac)   per group
        trimmed mean    = mean of values ranked k+1 .. n-k
        winsorized mean = mean after clamping the k lowest values up
                          to the (k+1)-th and the k highest down to
                          the (n-k)-th

    Rank ties share value, so any row_number assignment among equals
    keeps the same retained multiset — deterministic output. Counts
    exact; means are doubles on exact integer sums -> 6dp.

    Scale shape: one per-group rank window over row-level data (the
    honest cost of exact order statistics — partitioned by group, so
    parallelism is |groups|; for corpus-sized single groups quantize
    and use the histogram trick instead), then one agg.

    -> (group, n, k_trimmed, mean 6dp, trimmed_mean 6dp,
    winsorized_mean 6dp).
    """
    w_asc = Window.partitionBy(group_col).orderBy(F.col(value_col).asc())
    w_desc = Window.partitionBy(group_col) \
        .orderBy(F.col(value_col).desc())
    w_all = Window.partitionBy(group_col)
    # k as a ROW-LEVEL column (count over the group window): Spark
    # rejects an aggregate inside another aggregate's argument
    ranked = df.select(
        group_col, F.col(value_col).alias("v"),
        F.row_number().over(w_asc).alias("ra"),
        F.row_number().over(w_desc).alias("rd"),
        F.floor(F.count(F.lit(1)).over(w_all) * trim_frac).alias("k"))
    kept = (F.col("ra") > F.col("k")) & (F.col("rd") > F.col("k"))
    agg = ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.max("k").cast("long").alias("k_trimmed"),
        F.avg("v").alias("mean"),
        F.avg(F.when(kept, F.col("v"))).alias("tmean"),
        F.sum(F.when(kept, F.col("v"))).alias("kept_sum"),
        F.min(F.when(kept, F.col("v"))).alias("lo"),
        F.max(F.when(kept, F.col("v"))).alias("hi"))
    wmean = ((F.col("kept_sum")
              + F.col("k_trimmed") * F.col("lo")
              + F.col("k_trimmed") * F.col("hi")) / F.col("n"))
    return agg.select(
        group_col, "n", "k_trimmed",
        F.round("mean", 6).alias("mean"),
        F.round("tmean", 6).alias("trimmed_mean"),
        F.round(wmean, 6).alias("winsorized_mean"))


def effect_size(df: DataFrame, group_col: str, group_a: str,
                group_b: str, value_col: str) -> DataFrame:
    """Cohen's d and Hedges' g standardized mean difference (Cohen
    1969; Hedges 1981 small-sample correction) — the EFFECT SIZE the
    mann_whitney_u / ks tests deliberately don't give: not "did the
    slices differ" but "by how many pooled standard deviations",
    the number that survives when n is so large every test is
    significant (the constant condition of 10^12-doc corpora):

        d = (mean_a - mean_b) / s_pooled
        s_pooled = sqrt(((n_a-1) s_a^2 + (n_b-1) s_b^2)
                        / (n_a + n_b - 2))
        g = d * (1 - 3 / (4(n_a + n_b) - 9))

    Sample variances from exact sum/sumsq; one conditional-sum agg
    over the corpus -> one output row; try_divide guards zero
    pooled variance. -> ONE row (n_a, n_b, mean_a 6dp, mean_b 6dp,
    cohens_d 6dp, hedges_g 6dp).
    """
    g = F.col(group_col)
    v = F.col(value_col)
    agg = (df.filter(g.isin(group_a, group_b))
           .agg(F.sum(F.when(g == group_a, 1).otherwise(0)).alias("na"),
                F.sum(F.when(g == group_b, 1).otherwise(0)).alias("nb"),
                F.sum(F.when(g == group_a, v).otherwise(0)).alias("sa"),
                F.sum(F.when(g == group_b, v).otherwise(0)).alias("sb"),
                F.sum(F.when(g == group_a, v * v).otherwise(0))
                .alias("qa"),
                F.sum(F.when(g == group_b, v * v).otherwise(0))
                .alias("qb")))
    na, nb = F.col("na"), F.col("nb")
    ma = F.col("sa") / na
    mb = F.col("sb") / nb
    va = (F.col("qa") - F.col("sa") * F.col("sa") / na) / (na - 1)
    vb = (F.col("qb") - F.col("sb") * F.col("sb") / nb) / (nb - 1)
    sp = F.sqrt(((na - 1) * va + (nb - 1) * vb) / (na + nb - 2))
    d = F.try_divide(ma - mb, sp)
    corr = 1 - 3 / (4 * (na + nb) - 9)
    return agg.select(
        na.cast("long").alias("n_a"), nb.cast("long").alias("n_b"),
        F.round(ma, 6).alias("mean_a"),
        F.round(mb, 6).alias("mean_b"),
        F.round(d, 6).alias("cohens_d"),
        F.round(d * corr, 6).alias("hedges_g"))
