"""Ordered-sequence event analytics: funnel conversion + cohort retention.

These generalize the reference's per-epoch "did stage k complete after
stage k-1" bookkeeping (saber/trainer.py training-loop metrics) to the
event-log shape a web-scale pipeline actually has, and round out the
temporal family next to sessionize/tumbling windows (sessions.py).

Scale design:
  - ``funnel_conversion`` runs the whole K-step funnel in ONE shuffle: a
    single hash-partition + sort on user_id, then K chained running-min
    window passes over that same (partition, order) spec — Catalyst keeps
    one Exchange + one Sort for all of them — and the final per-user
    groupBy reuses the user_id partitioning (no second exchange). The
    naive formulation is K self-joins = K shuffles.
  - ``cohort_retention`` keeps everything partitioned by user: the active
    week set is built with collect_set(week) per user (bounded by corpus
    lifetime in weeks, never by event count) instead of a
    distinct(user, week) that would re-shuffle on a different key.
  - all timestamp math is integer microseconds via timeutil.epoch_micros
    (timezone-free, engine-portable).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from saber_spark.operators.timeutil import epoch_micros as _epoch_micros

WEEK_US = 7 * 24 * 3600 * 1_000_000

DEFAULT_STEPS = ("view", "click", "purchase")


def funnel_conversion(events: DataFrame,
                      steps: Sequence[str] = DEFAULT_STEPS,
                      user_col: str = "user_id", ts_col: str = "ts",
                      type_col: str = "event_type") -> DataFrame:
    """K-step ordered funnel: how many users did step1, then step2 strictly
    after it, then step3 strictly after that, ...

    -> (step, event_type, n_users, conv_rate) one row per step, where
    conv_rate = n_users / n_users(step 1), rounded to 6.

    Semantics: a user reaches step k iff there exist events
    e1 < e2 < ... < ek (strict microsecond order) with the step types in
    order. Computed greedily — reach_time(k) = earliest step-k event after
    reach_time(k-1) — which finds a witness chain iff one exists.

    One shuffle total (see module docstring).
    """
    us = _epoch_micros(ts_col).alias("_us")
    ev = events.select(F.col(user_col).alias("_user"),
                       F.col(type_col).alias("_type"), us)

    w = (Window.partitionBy("_user").orderBy("_us")
         .rowsBetween(Window.unboundedPreceding, 0))
    # reach_k = running min of the earliest time the user completed steps
    # 1..k; each pass reads the previous pass's column, same window spec.
    prev = None
    for k, step in enumerate(steps, start=1):
        if prev is None:
            qualifies = F.when(F.col("_type") == step, F.col("_us"))
        else:
            qualifies = F.when(
                (F.col("_type") == step) & F.col(prev).isNotNull()
                & (F.col("_us") > F.col(prev)), F.col("_us"))
        ev = ev.withColumn(f"_reach{k}", F.min(qualifies).over(w))
        prev = f"_reach{k}"

    # the running min is non-increasing, so min-over-rows == its final
    # value; the groupBy reuses the window's user_id partitioning (no
    # second exchange).
    per_user = ev.groupBy("_user").agg(
        *[F.min(f"_reach{k}").alias(f"_t{k}")
          for k in range(1, len(steps) + 1)])
    counts = per_user.agg(
        *[F.count(F.col(f"_t{k}")).alias(f"_n{k}")
          for k in range(1, len(steps) + 1)])
    # one row per step via inline() on the single aggregate row — a
    # UNION of per-step selects would re-run the whole aggregation per
    # branch (K jobs over the corpus instead of one).
    return counts.select(F.inline(F.array(*[
        F.struct(
            F.lit(k).cast("long").alias("step"),
            F.lit(step).alias("event_type"),
            F.col(f"_n{k}").alias("n_users"),
            F.round(F.col(f"_n{k}")
                    / F.greatest(F.col("_n1"), F.lit(1)), 6
                    ).alias("conv_rate"))
        for k, step in enumerate(steps, start=1)])))


def cohort_retention(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """Weekly cohort retention triangle.

    Users are cohorted by the epoch-week of their first event; a cohort's
    week-N retention is the fraction of its users active N weeks later.

    -> (cohort_week, week_offset, n_users, retention) where cohort_week is
    an integer epoch-week index (floor(epoch_us / WEEK_US) — calendar-free
    and engine-portable), n_users BIGINT, retention rounded to 6 against
    the cohort's offset-0 size.

    Plan: one shuffle on user_id builds (cohort_week, active week set) per
    user via min + collect_set — the set is bounded by corpus lifetime in
    weeks, not event count — then the exploded (cohort, offset) pairs feed
    one aggregation shuffle; the denominator joins back via a window over
    cohort_week, not a self-join.
    """
    week = F.floor(_epoch_micros(ts_col) / F.lit(WEEK_US)).cast("long")
    per_user = (events
                .select(F.col(user_col).alias("_user"), week.alias("_week"))
                .groupBy("_user")
                .agg(F.min("_week").alias("cohort_week"),
                     F.collect_set("_week").alias("_weeks")))
    pairs = per_user.select(
        "cohort_week",
        F.explode("_weeks").alias("_active_week"),
    ).select("cohort_week",
             (F.col("_active_week") - F.col("cohort_week")).alias("week_offset"))
    counts = pairs.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_users"))
    base = Window.partitionBy("cohort_week")
    return counts.select(
        "cohort_week", "week_offset", "n_users",
        F.round(F.col("n_users")
                / F.max(F.when(F.col("week_offset") == 0, F.col("n_users"))
                        ).over(base), 6).alias("retention"))
