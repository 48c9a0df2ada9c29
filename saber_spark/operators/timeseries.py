"""Hypertable-style continuous aggregates: multi-granularity rollups where
each coarser level is computed FROM the next finer rollup, not from raw data.

The TimescaleDB pattern: the hour rollup scans the events once; the day
rollup aggregates the hour TABLE (thousands of rows per day instead of
millions of events), and so on up. At 10^12 events that reuse is the whole
point — raw data is touched exactly once per refresh regardless of how many
granularities are materialized. sum/count re-aggregate losslessly (avg is
derived as sum/count at read time; min/max also compose; true percentiles
need a sketch).

TZ-safety: bucket arithmetic on timezone-independent epoch microseconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from saber_spark.operators.timeutil import epoch_micros as _epoch_micros

HOUR_US = 3_600_000_000
DAY_US = 24 * HOUR_US




def hypertable_rollup(events: DataFrame, ts_col: str = "ts",
                      key_col: str = "event_type", value_col: str = "value",
                      grains_us: list[tuple[str, int]] | None = None
                      ) -> DataFrame:
    """-> (grain, bucket_us, <key>, n_events, total_value), all grains
    unioned; grain g[i+1] aggregates the g[i] rollup (single raw scan).
    """
    grains = grains_us or [("hour", HOUR_US), ("day", DAY_US)]
    us = _epoch_micros(ts_col)
    finest_name, finest_us = grains[0]
    level = (events
             .select((F.floor(us / finest_us) * finest_us).alias("bucket_us"),
                     F.col(key_col),
                     F.col(value_col).cast("decimal(18,2)").alias("_v"))
             .groupBy("bucket_us", key_col)
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.sum("_v").alias("_total")))
    out = level.select(F.lit(finest_name).alias("grain"), "bucket_us",
                       key_col, "n_events",
                       F.col("_total").cast("double").alias("total_value"))
    for name, width in grains[1:]:
        # coarser level from the finer ROLLUP: counts sum, sums sum
        level = (level
                 .select((F.floor(F.col("bucket_us") / width) * width)
                         .alias("bucket_us"),
                         key_col, "n_events", "_total")
                 .groupBy("bucket_us", key_col)
                 .agg(F.sum("n_events").alias("n_events"),
                      F.sum("_total").alias("_total")))
        out = out.unionByName(level.select(
            F.lit(name).alias("grain"), "bucket_us", key_col, "n_events",
            F.col("_total").cast("double").alias("total_value")))
    return out


def cusum_changepoints(events: DataFrame, ts_col: str = "ts",
                       key_col: str = "event_type",
                       threshold_sigma: float = 3.0) -> DataFrame:
    """Page's CUSUM changepoint detection over per-key daily counts
    (Page, Biometrika 1954) — the monitoring stage a continuously-
    ingesting KG pipeline runs over its own extraction metrics (a level
    shift in mentions/day per type = a crawl or extractor regression).

    Upper CUSUM via the cumulative-sum identity: with c_i = running sum
    of (x_i - mean), the statistic d_i = c_i - min(c_1..c_i) equals the
    classic recursive s_i = max(0, s_{i-1} + x_i - mean) — two window
    functions over ONE (key, day ASC) partitioning, no iteration, no
    Python. A day flags when d_i > threshold_sigma * stddev.

    Determinism: mean/stddev are per-key population moments computed
    from exact integer counts (sum/sumsq), so both engines derive the
    same doubles; d and the flag round/compare identically.

    Day buckets are tz-free epoch-microsecond floors (the
    hypertable_rollup convention), engine- and session-tz-portable.

    -> (key, day, n_events, cusum 6dp, flagged) — one row per (key, day).
    """
    day_us = 86_400_000_000
    daily = (events
             .select(F.col(key_col).alias("key"),
                     F.col(ts_col).cast("timestamp_ntz").alias("_ts"))
             .select("key",
                     ((_epoch_micros("_ts") / day_us).cast("long")
                      * day_us).alias("day"))
             .groupBy("key", "day")
             .agg(F.count(F.lit(1)).alias("n_events")))
    stats = daily.groupBy("key").agg(
        F.sum("n_events").alias("s1"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("s2"),
        F.count(F.lit(1)).alias("nd"))
    withm = (daily.join(F.broadcast(stats), "key")
             .withColumn("mean", F.col("s1").cast("double") / F.col("nd"))
             .withColumn("var", F.col("s2").cast("double") / F.col("nd")
                         - F.col("mean") * F.col("mean")))
    w = Window.partitionBy("key").orderBy("day") \
        .rowsBetween(Window.unboundedPreceding, 0)
    # materialize c before the min-over window (nested window expressions
    # are not allowed); both windows share the one (key) partitioning
    withc = withm.withColumn(
        "c", F.sum(F.col("n_events").cast("double") - F.col("mean")).over(w))
    return (withc
            .withColumn("cusum_raw", F.col("c") - F.min("c").over(w))
            .select("key", "day", "n_events",
                    F.round("cusum_raw", 6).alias("cusum"),
                    (F.col("cusum_raw") >
                     threshold_sigma * F.sqrt(F.greatest(
                         F.col("var"), F.lit(0.0)))).alias("flagged")))


def autocorrelation(events: DataFrame, ts_col: str = "ts",
                    max_lag: int = 24,
                    bucket_us: int = HOUR_US) -> DataFrame:
    """Sample autocorrelation function of the event-count series
    (Box & Jenkins 1970, the standard biased estimator): bucket the
    stream into fixed windows, DENSIFY the series over [min, max]
    (an hour with no events is a 0, not a missing row — skipping gaps
    silently shifts every lag), and compute

        r_k = sum_{t<=n-k} (x_t - xbar)(x_{t+k} - xbar)
              / sum_t (x_t - xbar)^2

    for k = 1..max_lag — THE seasonality/burst diagnostic for a crawl
    scheduler or ingest monitor (a daily cycle shows as a peak at
    k = 24 on hourly buckets; a flat ACF says Poisson-ish arrivals).

    All counts are exact; xbar and the products are doubles on exact
    integers -> 6dp round is engine-portable.

    Scale shape: the bucket agg is the only stream-sized exchange
    (algebraic, map-side combine). The series after densify has
    (span/bucket) rows — bounded by TIME, not data volume (a decade
    of hours is ~9e4 rows even at 10^12 events), so the spine
    sequence, the max_lag-fold lag join, and the final agg all run on
    time-bounded tables. No window over raw events, no Python.

    -> max_lag rows (lag, n_pairs, r 6dp), lag = 1..max_lag.
    """
    us = _epoch_micros(ts_col)
    counts = (events
              .select((F.floor(us / bucket_us)).cast("long").alias("b"))
              .groupBy("b").agg(F.count(F.lit(1)).alias("x")))
    bounds = counts.agg(F.min("b").alias("b0"), F.max("b").alias("b1"))
    spine = (bounds
             .select(F.explode(F.sequence(F.col("b0"), F.col("b1")))
                     .alias("b")))
    series = (spine.join(counts, "b", "left")
              .select("b", F.coalesce("x", F.lit(0)).alias("x"))
              .localCheckpoint(eager=True))  # consumed 4x below
    # xbar in one pass, then the centered sum of squares in a second —
    # no window over the series needed
    mean_row = series.agg(F.avg("x").alias("xbar"),
                          F.count(F.lit(1)).alias("n"))
    centered = series.crossJoin(F.broadcast(mean_row))
    denom = centered.agg(
        F.sum(F.pow(F.col("x") - F.col("xbar"), F.lit(2.0)))
        .alias("ss"), F.max("xbar").alias("xbar"),
        F.max("n").alias("n"))
    lags = events.sparkSession.range(1, max_lag + 1) \
        .select(F.col("id").alias("lag"))
    lagged = (series.crossJoin(lags)
              .select("lag", "b", "x"))
    right = series.select(F.col("b").alias("b2"), F.col("x").alias("x2"))
    pairs = lagged.join(right, F.col("b2") == F.col("b") + F.col("lag"))
    num = (pairs.crossJoin(F.broadcast(denom))
           .groupBy("lag")
           .agg(F.count(F.lit(1)).alias("n_pairs"),
                F.sum((F.col("x") - F.col("xbar"))
                      * (F.col("x2") - F.col("xbar"))).alias("num"),
                F.max("ss").alias("ss")))
    # try_divide: a constant series has ss = 0 -> r is NULL (never an
    # ANSI DIVIDE_BY_ZERO crash on a monitoring query)
    return (num.select(F.col("lag").cast("long").alias("lag"),
                       F.col("n_pairs").cast("long").alias("n_pairs"),
                       F.round(F.try_divide(F.col("num"), F.col("ss")), 6)
                       .alias("r")))


def control_chart(events: DataFrame, ts_col: str = "ts",
                  bucket_us: int = HOUR_US,
                  k: float = 2.66) -> DataFrame:
    """Shewhart individuals/moving-range (I-MR) control chart over the
    event-count series (Shewhart 1931; k = 2.66 = 3/d2 for n=2 is the
    standard I-chart constant) — the ingest-rate monitor that flags
    WHICH hours are statistically out of control, complementing
    cusum_changepoints (sustained shift) and autocorrelation
    (cyclicity):

        UCL/LCL = xbar +- k * MRbar,   MRbar = mean |x_t - x_{t-1}|

    over the DENSIFIED series (autocorrelation's contract — an empty
    hour is a 0 and can itself be the violation). LCL floors at 0.
    Counts exact; limits are doubles on exact rationals -> 6dp.

    Scale shape: one stream-sized bucket agg; the series, the lag
    window, and the limit join are all time-bounded. Violations-only
    output keeps the result alert-sized.

    -> violation rows (bucket_us, x, xbar 6dp, mr_bar 6dp, ucl 6dp,
    lcl 6dp, side 'high'|'low').
    """
    us = _epoch_micros(ts_col)
    counts = (events
              .select((F.floor(us / bucket_us)).cast("long").alias("b"))
              .groupBy("b").agg(F.count(F.lit(1)).alias("x")))
    bounds = counts.agg(F.min("b").alias("b0"), F.max("b").alias("b1"))
    spine = bounds.select(
        F.explode(F.sequence(F.col("b0"), F.col("b1"))).alias("b"))
    series = (spine.join(counts, "b", "left")
              .select("b", F.coalesce("x", F.lit(0)).alias("x")))
    w = Window.orderBy("b")
    mr = series.select(
        "b", "x", F.abs(F.col("x") - F.lag("x").over(w)).alias("mr"))
    stats = mr.agg(F.avg("x").alias("xbar"),
                   F.avg("mr").alias("mr_bar"))  # avg skips the first NULL
    ucl = F.col("xbar") + F.lit(k) * F.col("mr_bar")
    lcl = F.greatest(F.col("xbar") - F.lit(k) * F.col("mr_bar"),
                     F.lit(0.0))
    return (mr.crossJoin(F.broadcast(stats))
            .filter((F.col("x") > ucl) | (F.col("x") < lcl))
            .select((F.col("b") * bucket_us).alias("bucket_us"),
                    F.col("x").cast("long").alias("x"),
                    F.round(F.col("xbar"), 6).alias("xbar"),
                    F.round(F.col("mr_bar"), 6).alias("mr_bar"),
                    F.round(ucl, 6).alias("ucl"),
                    F.round(lcl, 6).alias("lcl"),
                    F.when(F.col("x") > ucl, F.lit("high"))
                    .otherwise(F.lit("low")).alias("side")))


def theil_sen(events: DataFrame, ts_col: str = "ts",
              bucket_us: int = DAY_US) -> DataFrame:
    """Theil-Sen robust trend of the event-count series (Theil 1950;
    Sen JASA 1968): the median of all pairwise slopes over the
    densified daily series — the crawl-rate trend estimate a single
    burst day cannot hijack (OLS breaks down at one outlier; Theil-
    Sen tolerates ~29% contamination). Intercept = median of
    (x_i - slope * i), the standard companion estimate.

    Medians are computed EXACTLY by rank (avg of the two middle
    order statistics for even counts) — no engine-interpolated
    percentile function, so both engines agree bit-for-bit on the
    6dp round.

    Scale shape: the bucket agg is the only stream-sized exchange;
    the pairwise slope table is (span/bucket choose 2) rows — time-
    bounded (435 pairs for a 30-day window, ~5e8 for a decade of
    days: still a trivially distributed join); the two median
    selections are windows over slope-table-sized data.

    -> ONE row (n_buckets, n_pairs, slope_per_bucket 6dp,
    intercept 6dp).
    """
    us = _epoch_micros(ts_col)
    counts = (events
              .select((F.floor(us / bucket_us)).cast("long").alias("b"))
              .groupBy("b").agg(F.count(F.lit(1)).alias("x")))
    bounds = counts.agg(F.min("b").alias("b0"), F.max("b").alias("b1"))
    spine = bounds.select(
        F.explode(F.sequence(F.col("b0"), F.col("b1"))).alias("b"))
    series = (spine.join(counts, "b", "left")
              .select("b", F.coalesce("x", F.lit(0)).alias("x"))
              .localCheckpoint(eager=True))

    def exact_median(df, col):
        w = Window.orderBy(F.col(col).asc())
        ranked = df.select(F.col(col).alias("_m"),
                           F.row_number().over(w).alias("_r"))
        cnt = df.count()
        mid_lo, mid_hi = (cnt + 1) // 2, (cnt + 2) // 2
        return (ranked.filter(F.col("_r").isin(mid_lo, mid_hi))
                .agg(F.avg("_m").alias("med")))

    a = series.select(F.col("b").alias("i"), F.col("x").alias("xi"))
    b = series.select(F.col("b").alias("j"), F.col("x").alias("xj"))
    slopes = (a.join(b, F.col("j") > F.col("i"))
              .select(((F.col("xj") - F.col("xi"))
                       / (F.col("j") - F.col("i"))).alias("slope"))
              .localCheckpoint(eager=True))
    slope_med = exact_median(slopes, "slope")
    resid = (series.crossJoin(F.broadcast(slope_med))
             .select((F.col("x") - F.col("med") * F.col("b"))
                     .alias("resid")))
    inter_med = exact_median(resid, "resid")
    meta = series.agg(F.count(F.lit(1)).alias("n_buckets"))
    n_pairs = slopes.count()
    return (meta.crossJoin(F.broadcast(slope_med))
            .crossJoin(F.broadcast(inter_med.select(
                F.col("med").alias("imed"))))
            .select(F.col("n_buckets").cast("long").alias("n_buckets"),
                    F.lit(n_pairs).cast("long").alias("n_pairs"),
                    F.round(F.col("med"), 6).alias("slope_per_bucket"),
                    F.round(F.col("imed"), 6).alias("intercept")))


def cross_correlation(events: DataFrame, type_a: str, type_b: str,
                      ts_col: str = "ts", type_col: str = "event_type",
                      max_lag: int = 12,
                      bucket_us: int = HOUR_US) -> DataFrame:
    """Sample cross-correlation function between two event types'
    count series (Box & Jenkins 1970 ch. 11): r_xy(k) for
    k = -max_lag..+max_lag — the LEAD-LAG diagnostic autocorrelation
    can't give: a peak at positive k means type_a moves FIRST and
    type_b follows k buckets later (errors follow deploys, purchases
    follow clicks), the causal-ordering hint for funnel and alerting
    design.

        r_xy(k) = sum_t (x_t - xbar)(y_{t+k} - ybar)
                  / sqrt(sum (x - xbar)^2 * sum (y - ybar)^2)

    over the DENSIFIED common [min, max] bucket span of both series
    (autocorrelation's zeros-not-gaps contract). Exact counts; the
    normalizer is one sqrt on exact-integer sums -> 6dp.

    Scale shape: ONE stream-sized agg holding both types as
    conditional counts per bucket; everything after (spine, lag
    join, moments) is time-bounded.

    -> (2*max_lag + 1) rows (lag, n_pairs, r 6dp).
    """
    g = F.col(type_col)
    us = _epoch_micros(ts_col)
    counts = (events.filter(g.isin(type_a, type_b))
              .select((F.floor(us / bucket_us)).cast("long").alias("b"),
                      g.alias("t"))
              .groupBy("b")
              .agg(F.sum((F.col("t") == type_a).cast("long")).alias("x"),
                   F.sum((F.col("t") == type_b).cast("long")).alias("y")))
    bounds = counts.agg(F.min("b").alias("b0"), F.max("b").alias("b1"))
    spine = bounds.select(
        F.explode(F.sequence(F.col("b0"), F.col("b1"))).alias("b"))
    series = (spine.join(counts, "b", "left")
              .select("b", F.coalesce("x", F.lit(0)).alias("x"),
                      F.coalesce("y", F.lit(0)).alias("y"))
              .localCheckpoint(eager=True))
    m = series.agg(F.avg("x").alias("xbar"), F.avg("y").alias("ybar"))
    cent = series.crossJoin(F.broadcast(m))
    denom = cent.agg(
        F.sum(F.pow(F.col("x") - F.col("xbar"), F.lit(2.0))).alias("sx"),
        F.sum(F.pow(F.col("y") - F.col("ybar"), F.lit(2.0))).alias("sy"),
        F.max("xbar").alias("xbar"), F.max("ybar").alias("ybar"))
    lags = events.sparkSession.range(-max_lag, max_lag + 1) \
        .select(F.col("id").alias("lag"))
    xs = series.select("b", "x")
    ys = series.select(F.col("b").alias("b2"), F.col("y").alias("y2"))
    pairs = (xs.crossJoin(lags)
             .join(ys, F.col("b2") == F.col("b") + F.col("lag")))
    return (pairs.crossJoin(F.broadcast(denom))
            .groupBy("lag")
            .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"),
                 F.round(F.try_divide(
                     F.sum((F.col("x") - F.col("xbar"))
                           * (F.col("y2") - F.col("ybar"))),
                     F.sqrt(F.max("sx") * F.max("sy"))), 6).alias("r"))
            .select(F.col("lag").cast("long").alias("lag"),
                    "n_pairs", "r"))


def burstiness_panel(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts",
                     bucket_us: int = HOUR_US) -> DataFrame:
    """Burstiness panel: Fano factor of the bucketed count series
    (index of dispersion, Fano 1947 — variance/mean; 1 = Poisson,
    >> 1 = bursty) plus the Goh-Barabási burstiness parameter of
    per-user inter-arrival gaps (Goh & Barabási, EPL 2008):

        B = (cv - 1) / (cv + 1),   cv = sd(gap) / mean(gap)

    (B = -1 periodic, 0 Poisson, -> 1 maximally bursty) — together
    the two standard answers to "are arrivals Poisson?", which
    decides whether rate limits, sampling windows, and the control
    chart's assumptions hold. Population moments from exact sums;
    gaps are per-USER (lag over the co-partitioned (user, ts)
    window — a GLOBAL gap series would need a single-partition sort
    of the stream and is deliberately not offered).

    -> ONE row (n_buckets, fano, n_gaps, mean_gap_s 6dp, cv_gap 6dp,
    burstiness 6dp).
    """
    us = _epoch_micros(ts_col)
    counts = (events
              .select((F.floor(us / bucket_us)).cast("long").alias("b"))
              .groupBy("b").agg(F.count(F.lit(1)).alias("x")))
    bounds = counts.agg(F.min("b").alias("b0"), F.max("b").alias("b1"))
    spine = bounds.select(
        F.explode(F.sequence(F.col("b0"), F.col("b1"))).alias("b"))
    series = (spine.join(counts, "b", "left")
              .select(F.coalesce("x", F.lit(0)).alias("x")))
    fano = series.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        (F.try_divide(
            F.avg(F.col("x") * F.col("x"))
            - F.avg("x") * F.avg("x"), F.avg("x"))).alias("fano"))
    gaps = (events
            .select(F.col(user_col), us.alias("t"))
            .select(((F.col("t")
                      - F.lag("t").over(
                          Window.partitionBy(user_col).orderBy("t")))
                     / 1e6).alias("gap"))
            .filter(F.col("gap").isNotNull()))
    gstats = gaps.agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.avg("gap").alias("mg"),
        (F.avg(F.col("gap") * F.col("gap"))
         - F.avg("gap") * F.avg("gap")).alias("vg"))
    cv = F.try_divide(F.sqrt(F.greatest(F.col("vg"), F.lit(0.0))),
                      F.col("mg"))
    return (fano.crossJoin(F.broadcast(gstats))
            .select(F.col("n_buckets").cast("long").alias("n_buckets"),
                    F.round("fano", 6).alias("fano"),
                    F.col("n_gaps").cast("long").alias("n_gaps"),
                    F.round("mg", 6).alias("mean_gap_s"),
                    F.round(cv, 6).alias("cv_gap"),
                    F.round(F.try_divide(cv - 1, cv + 1), 6)
                    .alias("burstiness")))


def mann_kendall(events: DataFrame, ts_col: str = "ts",
                 bucket_us: int = DAY_US) -> DataFrame:
    """Mann-Kendall trend TEST (Mann 1945; Kendall 1975) with the
    tie-corrected variance — the significance companion Theil-Sen's
    slope estimate is always paired with in monitoring practice
    (theil_sen says HOW FAST the crawl rate drifts; this says whether
    the monotone drift is distinguishable from noise):

        S      = sum over i<j of sgn(x_j - x_i)
        Var(S) = [n(n-1)(2n+5) - sum_t t(t-1)(2t+5)] / 18
        z      = (S -+ 1) / sqrt(Var)   (continuity-corrected,
                                         0 when S = 0)

    over the densified bucket series. Exact integer S and tie table;
    the single sqrt at the end -> 6dp.

    Scale shape: theil_sen's pair economics — (span/bucket choose 2)
    sign comparisons, time-bounded; the tie histogram is one agg over
    the series.

    -> ONE row (n_buckets, s, var_s 6dp, z 6dp).
    """
    us = _epoch_micros(ts_col)
    counts = (events
              .select((F.floor(us / bucket_us)).cast("long").alias("b"))
              .groupBy("b").agg(F.count(F.lit(1)).alias("x")))
    bounds = counts.agg(F.min("b").alias("b0"), F.max("b").alias("b1"))
    spine = bounds.select(
        F.explode(F.sequence(F.col("b0"), F.col("b1"))).alias("b"))
    series = (spine.join(counts, "b", "left")
              .select("b", F.coalesce("x", F.lit(0)).alias("x"))
              .localCheckpoint(eager=True))
    a = series.select(F.col("b").alias("i"), F.col("x").alias("xi"))
    bb = series.select(F.col("b").alias("j"), F.col("x").alias("xj"))
    s_agg = (a.join(bb, F.col("j") > F.col("i"))
             .agg(F.sum(F.signum(F.col("xj") - F.col("xi"))
                        .cast("long")).alias("s")))
    n_agg = series.agg(F.count(F.lit(1)).alias("n"))
    ties = (series.groupBy("x").agg(F.count(F.lit(1)).alias("t"))
            .agg(F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1)
                      * (2 * F.col("t") + 5)), F.lit(0))
                .alias("tie_term")))
    j = (s_agg.crossJoin(F.broadcast(n_agg))
         .crossJoin(F.broadcast(ties)))
    n = F.col("n")
    var_s = (n * (n - 1) * (2 * n + 5) - F.col("tie_term")) / 18
    s = F.col("s")
    z = (F.when(s > 0, (s - 1) / F.sqrt(var_s))
         .when(s < 0, (s + 1) / F.sqrt(var_s))
         .otherwise(F.lit(0.0)))
    return j.select(n.cast("long").alias("n_buckets"),
                    s.cast("long").alias("s"),
                    F.round(var_s, 6).alias("var_s"),
                    F.round(z, 6).alias("z"))


def runs_test(events: DataFrame, ts_col: str = "ts",
              bucket_us: int = HOUR_US) -> DataFrame:
    """Wald-Wolfowitz runs test (Wald & Wolfowitz 1940) on the
    above/below-median binarization of the bucket series — the
    randomness check orthogonal to trend (mann_kendall) and
    periodicity (acf): too FEW runs = clumping/regime persistence,
    too MANY = oscillation; either invalidates iid-based alerting
    thresholds.

        R ~ Normal(mu, sigma^2),  mu = 2 n1 n2 / n + 1,
        sigma^2 = 2 n1 n2 (2 n1 n2 - n) / (n^2 (n - 1))

    with n1/n2 the above/below counts; buckets EQUAL to the median
    are excluded (the standard convention). The median is the exact
    two-middle rank median (theil_sen's contract — no interpolated
    percentile). Runs counted as 1 + boundary flips via a lag window
    over the surviving time-ordered buckets.

    -> ONE row (n1, n2, runs, mu 6dp, z 6dp).
    """
    us = _epoch_micros(ts_col)
    counts = (events
              .select((F.floor(us / bucket_us)).cast("long").alias("b"))
              .groupBy("b").agg(F.count(F.lit(1)).alias("x")))
    bounds = counts.agg(F.min("b").alias("b0"), F.max("b").alias("b1"))
    spine = bounds.select(
        F.explode(F.sequence(F.col("b0"), F.col("b1"))).alias("b"))
    series = (spine.join(counts, "b", "left")
              .select("b", F.coalesce("x", F.lit(0)).alias("x"))
              .localCheckpoint(eager=True))
    wm = Window.orderBy(F.col("x").asc())
    ranked = series.select(F.col("x").alias("_m"),
                           F.row_number().over(wm).alias("_r"))
    cnt = series.count()
    med = (ranked.filter(F.col("_r").isin((cnt + 1) // 2,
                                          (cnt + 2) // 2))
           .agg(F.avg("_m").alias("med")))
    signed = (series.crossJoin(F.broadcast(med))
              .filter(F.col("x") != F.col("med"))
              .select("b", (F.col("x") > F.col("med")).cast("int")
                      .alias("above")))
    w = Window.orderBy("b")
    flips = signed.select(
        "above",
        (F.col("above") != F.lag("above").over(w)).cast("int")
        .alias("flip"))
    agg = flips.agg(
        F.sum("above").alias("n1"),
        F.sum(1 - F.col("above")).alias("n2"),
        (F.coalesce(F.sum("flip"), F.lit(0)) + 1).alias("runs"))
    n1, n2 = F.col("n1"), F.col("n2")
    n = n1 + n2
    mu = 2 * n1 * n2 / n + 1
    var = (2 * n1 * n2 * (2 * n1 * n2 - n)) / (n * n * (n - 1))
    return agg.select(
        n1.cast("long").alias("n1"), n2.cast("long").alias("n2"),
        F.col("runs").cast("long").alias("runs"),
        F.round(mu, 6).alias("mu"),
        F.round(F.try_divide(F.col("runs") - mu, F.sqrt(var)), 6)
        .alias("z"))


def seasonal_profile(events: DataFrame, ts_col: str = "ts",
                     bucket_us: int = HOUR_US,
                     period: int = 24) -> DataFrame:
    """Seasonal profile: mean bucket count by position-in-period
    (hour-of-day for hourly buckets / period 24) — the explicit
    seasonal shape whose EXISTENCE acf_events detects (peak at lag
    24) but does not display; what a crawl scheduler actually reads
    to place load, and the divisor for seasonal adjustment before
    control_chart / mann_kendall on strongly cyclic streams.

    Phase = bucket index mod period on tz-free epoch buckets (UTC
    phase; shift upstream for local-time profiles). Densified (the
    acf contract). share = phase total / grand total.

    -> ``period`` rows (phase, n_buckets, mean_count 6dp, share 6dp).
    """
    us = _epoch_micros(ts_col)
    counts = (events
              .select((F.floor(us / bucket_us)).cast("long").alias("b"))
              .groupBy("b").agg(F.count(F.lit(1)).alias("x")))
    bounds = counts.agg(F.min("b").alias("b0"), F.max("b").alias("b1"))
    spine = bounds.select(
        F.explode(F.sequence(F.col("b0"), F.col("b1"))).alias("b"))
    series = (spine.join(counts, "b", "left")
              .select((F.col("b") % period).alias("phase"),
                      F.coalesce("x", F.lit(0)).alias("x")))
    tot = series.agg(F.sum("x").alias("total"))
    return (series.groupBy("phase")
            .agg(F.count(F.lit(1)).alias("n_buckets"),
                 F.sum("x").alias("sx"))
            .crossJoin(F.broadcast(tot))
            .select(F.col("phase").cast("long").alias("phase"),
                    F.col("n_buckets").cast("long").alias("n_buckets"),
                    F.round(F.col("sx") / F.col("n_buckets"), 6)
                    .alias("mean_count"),
                    F.round(F.col("sx") / F.col("total"), 6)
                    .alias("share")))
