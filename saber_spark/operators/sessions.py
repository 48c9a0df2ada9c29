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


def seq_patterns(events: DataFrame, user_col: str = "user_id",
                 type_col: str = "event_type", ts_col: str = "ts",
                 tiebreak_col: str = "event_id",
                 min_support: int = 5) -> DataFrame:
    """Length-2 sequential patterns with GAPS allowed (the PrefixSpan
    support definition, Pei et al. ICDE 2001; GSP's "a then
    eventually b") — the third behavioral view: event_transitions
    counts ADJACENT ordered pairs, assoc_rules ignores order
    entirely; this counts users for whom a occurs strictly BEFORE b
    anywhere in their stream (classic subsequence support, one count
    per user regardless of repeats).

        support(a -> b) = #users with some event a before some b

    Deterministic total order (ts, tiebreak). Exact integer counts;
    the only floating step is the support share -> 6dp.

    Scale shape: per-user FIRST occurrence of each type and LAST
    occurrence of each type are two aggs on (user, type) — the
    subsequence test "some a before some b" reduces to
    first_a < last_b (no pairwise event join ever happens; the
    (user, type) table is bounded by users x alphabet). The pattern
    join is a co-partitioned self-join on the user key bounded by the
    type alphabet.

    -> (first_type, then_type, support, support_frac 6dp),
    support >= min_support, a != b pairs.
    """
    base = events.select(
        F.col(user_col).alias("u"), F.col(type_col).alias("t"),
        F.struct(F.col(ts_col).alias("ts"),
                 F.col(tiebreak_col).alias("tb")).alias("k"))
    occ = (base.groupBy("u", "t")
           .agg(F.min("k").alias("first_k"), F.max("k").alias("last_k")))
    n_users = base.select("u").distinct() \
        .agg(F.count(F.lit(1)).alias("n_users"))
    a = occ.select("u", F.col("t").alias("first_type"),
                   F.col("first_k").alias("fk"))
    b = occ.select("u", F.col("t").alias("then_type"),
                   F.col("last_k").alias("lk"))
    pairs = (a.join(b, "u")
             .filter((F.col("first_type") != F.col("then_type"))
                     & (F.col("fk") < F.col("lk")))
             .groupBy("first_type", "then_type")
             .agg(F.count(F.lit(1)).alias("support"))
             .filter(F.col("support") >= min_support))
    return (pairs.crossJoin(F.broadcast(n_users))
            .select("first_type", "then_type",
                    F.col("support").cast("long").alias("support"),
                    F.round(F.col("support") / F.col("n_users"), 6)
                    .alias("support_frac")))


def kaplan_meier(events: DataFrame, user_col: str = "user_id",
                 ts_col: str = "ts",
                 censor_guard_hours: int = 12) -> DataFrame:
    """Kaplan-Meier survival estimate of user lifetime (Kaplan & Meier,
    JASA 1958) with right-censoring — the churn curve cohort_retention
    cannot give honestly: a user still active near the observation
    boundary has not churned, they are CENSORED, and ignoring that
    biases retention down (the classic web-analytics mistake).

    Lifetime T_u = floor days between first and last event; a user
    whose last event falls within ``censor_guard_hours`` of the
    corpus' last timestamp is censored (event indicator 0). At each
    distinct lifetime t with d_t observed churns and n_t at risk
    (T >= t, censored or not):

        S(t) = prod over t' <= t of (1 - d_t' / n_t')

    computed as exp(cumsum ln(1 - d/n)) — the one engine-portable
    cumulative-product form; a factor of exactly 0 (everyone at risk
    churns) propagates as S = 0 via a guard, not ln(0).

    Scale shape: one (user) agg for lifetimes, one lifetime-histogram
    agg, cumulative windows over the |distinct lifetimes|-row table
    (bounded by the observation span in days), one broadcast of the
    corpus end.

    -> rows at distinct lifetimes with d_t > 0:
    (t_days, n_risk, n_churned, n_censored_here, survival 6dp).
    """
    spans = (events.groupBy(user_col)
             .agg(F.min(ts_col).alias("first_ts"),
                  F.max(ts_col).alias("last_ts")))
    end = events.agg(F.max(ts_col).alias("end_ts"))
    guard_us = censor_guard_hours * 3_600_000_000
    lifetimes = (spans.crossJoin(F.broadcast(end))
                 .select(
                     # complete-24h-period lifetimes via epoch micros:
                     # calendar day_diff counts midnight crossings and
                     # is engine- and tz-ambiguous
                     F.floor(F.timestamp_diff(
                         "MICROSECOND", F.col("first_ts"),
                         F.col("last_ts")) / 86_400_000_000)
                     .cast("long").alias("t_days"),
                     (F.timestamp_diff("MICROSECOND", F.col("last_ts"),
                                       F.col("end_ts")) >= guard_us)
                     .cast("long").alias("churned")))
    hist = (lifetimes.groupBy("t_days")
            .agg(F.count(F.lit(1)).alias("n_here"),
                 F.sum("churned").alias("d")))
    w_ge = Window.orderBy(F.col("t_days").desc()) \
        .rowsBetween(Window.unboundedPreceding, 0)
    at_risk = hist.select(
        "t_days", "n_here", "d",
        F.sum("n_here").over(w_ge).alias("n_risk"))
    w_le = Window.orderBy("t_days").rowsBetween(
        Window.unboundedPreceding, 0)
    factor_ln = F.when(F.col("d") < F.col("n_risk"),
                       F.log(1 - F.col("d") / F.col("n_risk")))
    curve = at_risk.select(
        "t_days", "n_risk", "d", "n_here",
        F.sum(factor_ln).over(w_le).alias("ln_s"),
        F.max((F.col("d") == F.col("n_risk")).cast("int"))
        .over(w_le).alias("dead"))
    return (curve.filter(F.col("d") > 0)
            .select(F.col("t_days"),
                    F.col("n_risk").cast("long").alias("n_risk"),
                    F.col("d").cast("long").alias("n_churned"),
                    (F.col("n_here") - F.col("d")).cast("long")
                    .alias("n_censored_here"),
                    F.round(F.when(F.col("dead") == 1, F.lit(0.0))
                            .otherwise(F.exp("ln_s")), 6)
                    .alias("survival")))


def markov_stationary(events: DataFrame, user_col: str = "user_id",
                      type_col: str = "event_type", ts_col: str = "ts",
                      tiebreak_col: str = "event_id",
                      iterations: int = 10) -> DataFrame:
    """Stationary distribution of the first-order behavioral Markov
    chain (Markov 1906; the PageRank fixpoint on event_transitions'
    matrix): where does a user's session settle in the long run —
    the steady-state complement of the transition table's one-step
    view. Power iteration from the uniform vector, ``iterations``
    synchronous updates v <- v P with row-normalized transition
    probabilities.

    Exact counts feed double probabilities; iteration count is fixed
    so both engines compute the identical expression tree -> 6dp.

    Scale shape: the transition agg is the only event-sized exchange
    (one lead window, one hash agg — event_transitions' plan); the
    iteration loop runs on the |alphabet|^2 matrix (tens of rows):
    each step is a broadcast join + tiny agg, linear plan growth in
    ``iterations`` (the pagerank_entities pattern, no driver
    collect).

    -> (state, pi 6dp) — one row per event type reachable in the
    chain.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    pairs = (events
             .select(F.col(user_col),
                     F.col(type_col).alias("s_from"),
                     F.lead(type_col).over(w).alias("s_to"))
             .filter(F.col("s_to").isNotNull()))
    counts = (pairs.groupBy("s_from", "s_to")
              .agg(F.count(F.lit(1)).alias("c")))
    outdeg = counts.groupBy("s_from").agg(F.sum("c").alias("tot"))
    p = (counts.join(outdeg, "s_from")
         .select("s_from", "s_to",
                 (F.col("c") / F.col("tot")).alias("p"))
         .localCheckpoint(eager=True))  # reused every iteration
    states = (p.select(F.col("s_from").alias("state"))
              .union(p.select("s_to")).distinct())
    n_states = states.count()
    v = states.select("state", F.lit(1.0 / n_states).alias("v"))
    for _ in range(iterations):
        v = (p.join(v, p.s_from == v.state)
             .groupBy(F.col("s_to").alias("state"))
             .agg(F.sum(F.col("p") * F.col("v")).alias("v")))
        # states with no inbound mass drop out; reinstate absorbing-
        # free chains implicitly (the behavioral chain here is
        # strongly connected by construction of real session data)
    return v.select("state", F.round("v", 6).alias("pi"))
