"""Event sessionization + windowed aggregation (batch form).

The streaming twin lives in saber_spark.streaming (watermark + session
window); this batch formulation is the oracle-checkable one: a session
breaks after a gap > timeout from the previous event of the same user
(classic gaps-and-islands, one shuffle on user_id, both windows reuse it).

Timestamps compare in integer MICROSECONDS (unix_micros) so any engine
agrees exactly (no float epoch, no truncation drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from saber_spark.operators.timeutil import epoch_micros as _epoch_micros

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes




def sessionize(events: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", gap_us: int = SESSION_GAP_US) -> DataFrame:
    """-> per-session rows (user_id, session_id, n_events, session_start_us,
    session_end_us, total_value). session_id is 1-based per user."""
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    us = _epoch_micros(ts_col)
    with_break = events.withColumn(
        "_new_session",
        F.when(us - F.lag(us).over(w) > gap_us, 1)
         .when(F.lag(us).over(w).isNull(), 1)
         .otherwise(0))
    with_sid = with_break.withColumn(
        "session_id",
        F.sum("_new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        with_sid.groupBy(user_col, "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(us).alias("session_start_us"),
            F.max(us).alias("session_end_us"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )


def tumbling_window_agg(events: DataFrame, window_minutes: int = 60) -> DataFrame:
    """Fixed tumbling-window aggregation (batch twin of the streaming agg).

    -> (window_start_us, event_type, n_events, total_value rounded 6).
    """
    win_us = window_minutes * 60 * 1_000_000
    start = (F.floor(_epoch_micros("ts") / win_us) * win_us)
    return (
        events.groupBy(start.alias("window_start_us"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"))
    )


def event_transitions(events: DataFrame, user_col: str = "user_id",
                      type_col: str = "event_type",
                      ts_col: str = "ts",
                      tiebreak_col: str = "event_id") -> DataFrame:
    """Per-user consecutive event-type transition table — the first-order
    Markov model of behavioral analytics ("what do users do after a
    click?"), complementing the funnel/cohort operators.

    -> (from_type, to_type, n_transitions, p) where p = n_transitions /
    total transitions out of from_type, rounded 6. Ordering is total and
    deterministic: (ts, tiebreak) — same-timestamp events order by the
    tiebreak id, so the table is engine-portable.

    Scale: ONE data shuffle — the lead window partitions on user_id and
    the (from, to) aggregation's input is the same rows (partial+final
    hash agg); the probability normalization is a window over the
    |types|²-row aggregate, bounded by the event-type alphabet, never by
    event count.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    pairs = (events
             .select(F.col(user_col),
                     F.col(type_col).alias("from_type"),
                     F.lead(type_col).over(w).alias("to_type"))
             .filter(F.col("to_type").isNotNull()))
    agg = (pairs.groupBy("from_type", "to_type")
           .agg(F.count(F.lit(1)).alias("n_transitions")))
    w_from = Window.partitionBy("from_type")
    return agg.select(
        "from_type", "to_type", "n_transitions",
        F.round(F.col("n_transitions")
                / F.sum("n_transitions").over(w_from), 6).alias("p"))


def assoc_rules(events: DataFrame, user_col: str = "user_id",
                item_col: str = "event_type",
                min_support: int = 5) -> DataFrame:
    """Pairwise association rules with lift (Agrawal/Srikant 1993-94,
    the Apriori level-2 slice): over per-user ITEM SETS (distinct
    event types per user — set semantics, unlike event_transitions'
    adjacent ordered bigrams), every unordered item pair with

        support   = #users with both items
        conf_ab   = support / #users(a),  conf_ba = support / #users(b)
        lift      = n_users * support / (#users(a) * #users(b))

    — the co-adoption/feature-bundling diagnostic (lift > 1 = the
    behaviors attract, < 1 = they repel) that no ordering-aware
    operator gives. Counts exact; divisions are the only floating
    steps -> 6dp round.

    Scale shape: ONE distinct agg to baskets, ONE co-partitioned
    self-join on the user key (bounded per user by the distinct-item
    count, itself bounded by the item vocabulary), item marginals
    joined back on the item key, total users broadcast. The a < b
    canonical order halves the pair table and makes output
    deterministic.

    -> (item_a, item_b, support, conf_ab 6dp, conf_ba 6dp, lift 6dp),
    support >= min_support.
    """
    baskets = events.select(user_col, F.col(item_col).alias("it")) \
        .distinct()
    n_users = baskets.select(user_col).distinct() \
        .agg(F.count(F.lit(1)).alias("n_users"))
    item_n = baskets.groupBy("it").agg(F.count(F.lit(1)).alias("cnt"))
    a = baskets.select(user_col, F.col("it").alias("item_a"))
    b = baskets.select(user_col, F.col("it").alias("item_b"))
    pairs = (a.join(b, user_col)
             .filter(F.col("item_a") < F.col("item_b"))
             .groupBy("item_a", "item_b")
             .agg(F.count(F.lit(1)).alias("support"))
             .filter(F.col("support") >= min_support))
    return (pairs
            .join(F.broadcast(item_n.select(
                F.col("it").alias("item_a"), F.col("cnt").alias("ca"))),
                "item_a")
            .join(F.broadcast(item_n.select(
                F.col("it").alias("item_b"), F.col("cnt").alias("cb"))),
                "item_b")
            .crossJoin(F.broadcast(n_users))
            .select("item_a", "item_b",
                    F.col("support").cast("long").alias("support"),
                    F.round(F.col("support") / F.col("ca"), 6)
                    .alias("conf_ab"),
                    F.round(F.col("support") / F.col("cb"), 6)
                    .alias("conf_ba"),
                    F.round(F.col("n_users") * F.col("support")
                            / F.col("ca") / F.col("cb"), 6)
                    .alias("lift")))
