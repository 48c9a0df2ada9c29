"""Structured Streaming: incremental KG construction + windowed analytics.

The reference is a batch annotator with a REST front-end
(saber/cli/app.py:17-95); its streaming analogue in this rebuild is
"annotate pages as they arrive": readStream over a page directory ->
the SAME extraction + tagging stages (mapInPandas works unchanged on
streaming DataFrames) -> append-mode parquet mentions sink.

Windowed twins of the batch analytics:
  stream_windowed_counts  watermark + tumbling window groupBy
  stream_sessionize       session_window (gap-based), the streaming
                          equivalent of operators/sessions.sessionize

Scale notes: watermarks bound state (late data beyond 10 min is dropped);
session state is per (user, window) and expires with the watermark, so a
10^12-event stream holds only the active-session frontier in memory.
"""

from __future__ import annotations

from pyspark.broadcast import Broadcast
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from saber_spark.operators.extract import extract_text
from saber_spark.operators.tagger import detect_mentions


def stream_mentions(pages_stream: DataFrame,
                    surface_map_bc: Broadcast) -> DataFrame:
    """Streaming pages -> streaming mentions (same stages as batch)."""
    return detect_mentions(extract_text(pages_stream), surface_map_bc)


def stream_running_label_counts(mentions_stream: DataFrame) -> DataFrame:
    """Custom stateful operator: running per-label mention statistics.

    applyInPandasWithState keeps one state row per label across ALL
    micro-batches: cumulative count + distinct-ish url cardinality (bounded
    by keeping only a capped url set in state — the bound is what makes the
    operator safe at 10^12 events). Emits the updated totals each batch.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    STATE_SCHEMA = "n long, urls array<string>"
    OUTPUT_SCHEMA = "label string, n_mentions long, n_urls_lowerbound long"
    URL_CAP = 1000

    def update(key, pdf_iter, state: GroupState):
        import pandas as pd
        n, urls = state.get if state.exists else (0, [])
        url_set = set(urls)
        for pdf in pdf_iter:
            n += len(pdf)
            for u in pdf["url"]:
                if len(url_set) < URL_CAP:
                    url_set.add(u)
        state.update((n, sorted(url_set)))
        yield pd.DataFrame({
            "label": [key[0]],
            "n_mentions": [n],
            "n_urls_lowerbound": [len(url_set)],
        })

    return (mentions_stream
            .groupBy("label")
            .applyInPandasWithState(
                update,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


def stream_windowed_counts(events_stream: DataFrame,
                           window: str = "1 hour",
                           watermark: str = "10 minutes") -> DataFrame:
    """Tumbling-window event counts with a watermark for late data."""
    return (
        events_stream
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
             .alias("total_value"))
        .select(F.col("win.start").alias("window_start"),
                "event_type", "n_events", "total_value")
    )


def start_incremental_edges(pages_stream: DataFrame,
                            surface_map_bc: Broadcast,
                            dictionary: DataFrame,
                            edges_path: str,
                            checkpoint_path: str):
    """Incremental KG construction: micro-batch pages -> merged edge table.

    foreachBatch runs the BATCH linking + triple stages on each micro-batch
    and MERGEs its deduplicated edges into the edge table via the sink
    registry (keyed on (subj, pred, obj), summing n_occurrences, min
    provenance). On Iceberg the merge is a transactional MERGE INTO; on
    parquet the registry runs the same semantics as a rewrite + atomic swap.
    Exactly-once per micro-batch comes from the streaming checkpoint; the
    merge is idempotent per epoch_id.
    Returns the StreamingQuery (caller awaits termination).
    """
    from saber_spark.operators.linking import link_mentions
    from saber_spark.operators.triples import assemble_triples, dedup_triples
    from saber_spark.sources.registry import merge_upsert

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        mentions = detect_mentions(extract_text(batch_df), surface_map_bc)
        linked = link_mentions(mentions, dictionary)
        new_edges = dedup_triples(assemble_triples(linked))
        merge_upsert(edges_path, new_edges, keys=["subj", "pred", "obj"],
                     sum_cols=["n_occurrences"], min_cols=["first_url"],
                     epoch_id=epoch_id)

    return (pages_stream.writeStream
            .foreachBatch(merge_batch)
            .option("checkpointLocation", checkpoint_path)
            .trigger(availableNow=True)
            .start())


def start_incremental_curation(docs_stream: DataFrame,
                               decisions_path: str,
                               buckets_path: str,
                               checkpoint_path: str,
                               min_bands: int = 2,
                               rows_per_band: int = 2):
    """Incremental corpus curation: micro-batch documents -> quality
    verdicts + near-dup check against the ACCUMULATED corpus history ->
    idempotent decision-table and history merges (the streaming twin of
    curate.run_curation's filter+dedup core).

    Dup rule: a new doc is a near-dup if it shares >= ``min_bands`` LSH
    band buckets with any prior FINALLY-KEPT doc (or with an earlier doc
    of its own micro-batch). This signature-only rule lets history hold
    just the band-bucket table ((doc_id, band, band_sig) — bands x kept
    docs rows, mergeable via merge_upsert) instead of corpus text or
    shingles. The batch chain's exact-Jaccard verify needs both docs'
    shingles; the incremental path trades exactness for a bounded history
    footprint — the standard streaming-dedup compromise, stated rather
    than hidden (multi-band agreement >= 2 of 8 bands ~ high estimated
    Jaccard; tune min_bands/rows_per_band for the precision target).

    Exactly-once: decisions merge first, then the kept docs' buckets;
    each merge is epoch-idempotent (registry._applied_epoch), so any
    crash/replay window re-applies nothing and the dup flags stay
    deterministic (history is read BEFORE this epoch's buckets land; a
    replay after the buckets landed recomputes flags against the larger
    history but both merges are already no-ops).

    PII masking runs before bucketing, matching the batch pipeline:
    near-identical docs differing only in masked spans collide.
    Returns the StreamingQuery (caller awaits termination).
    """
    from saber_spark.operators.dedup import band_buckets
    from saber_spark.operators.textstats import pii_scrub, quality_filter
    from saber_spark.sources.registry import (merge_upsert, read_table,
                                              recover_table)

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        import os

        spark = batch_df.sparkSession
        verdicts = quality_filter(batch_df).persist()
        kept = batch_df.join(verdicts.filter("keep").select("doc_id"),
                             "doc_id")
        sc = pii_scrub(kept)
        scrubbed = (kept.drop("text")
                    .join(sc.withColumnRenamed("scrubbed", "text"),
                          "doc_id"))
        buckets = (band_buckets(scrubbed, rows_per_band=rows_per_band)
                   .persist())

        def hits(prior, pair_filter, flag):
            return (buckets.join(prior, ["band", "band_sig"])
                    .filter(pair_filter)
                    .groupBy("doc_id", "prior_id")
                    .agg(F.count(F.lit(1)).alias("nb"))
                    .filter(F.col("nb") >= min_bands)
                    .select("doc_id").distinct()
                    .withColumn(flag, F.lit(True)))

        # a crash mid-swap leaves the history renamed aside (__prev);
        # recover BEFORE the existence check or a replayed epoch would
        # compute dup flags against an absent/stale table
        recover_table(buckets_path)
        if os.path.exists(buckets_path):
            history = (read_table(spark, buckets_path)
                       .withColumnRenamed("doc_id", "prior_id"))
            hist_hits = hits(history,
                             F.col("doc_id") != F.col("prior_id"),
                             "dup_of_history")
        else:
            hist_hits = None
        batch_prior = (buckets.select(F.col("doc_id").alias("prior_id"),
                                      "band", "band_sig"))
        batch_hits = hits(batch_prior,
                          F.col("prior_id") < F.col("doc_id"),
                          "dup_in_batch")

        decisions = verdicts.withColumnRenamed("keep", "quality_keep")
        if hist_hits is not None:
            decisions = decisions.join(hist_hits, "doc_id", "left")
        else:
            decisions = decisions.withColumn("dup_of_history",
                                             F.lit(False))
        decisions = (decisions.join(batch_hits, "doc_id", "left")
                     .select(
                         "doc_id", "quality_keep", "n_failed", "reasons",
                         F.coalesce("dup_of_history", F.lit(False))
                         .alias("dup_of_history"),
                         F.coalesce("dup_in_batch", F.lit(False))
                         .alias("dup_in_batch"))
                     .withColumn(
                         "final_keep",
                         F.col("quality_keep") & ~F.col("dup_of_history")
                         & ~F.col("dup_in_batch"))
                     .persist())
        merge_upsert(decisions_path, decisions, keys=["doc_id"],
                     sum_cols=[],
                     min_cols=["quality_keep", "n_failed", "reasons",
                               "dup_of_history", "dup_in_batch",
                               "final_keep"],
                     epoch_id=epoch_id)
        kept_buckets = buckets.join(
            decisions.filter("final_keep").select("doc_id"), "doc_id")
        merge_upsert(buckets_path, kept_buckets, keys=["doc_id", "band"],
                     sum_cols=[], min_cols=["band_sig"], epoch_id=epoch_id)
        for df in (verdicts, buckets, decisions):
            df.unpersist()

    return (docs_stream.writeStream
            .foreachBatch(process_batch)
            .option("checkpointLocation", checkpoint_path)
            .trigger(availableNow=True)
            .start())


def stream_dedup_events(events_stream: DataFrame,
                        keys: list[str] | None = None,
                        watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup with BOUNDED state (the streaming twin of
    operators/dedup.exact_dedup).

    dropDuplicatesWithinWatermark keeps each key in state only until the
    watermark passes it — on an unbounded 10^12-event stream, state holds
    just the active watermark window instead of every key ever seen (which
    plain dropDuplicates on a stream would, growing without bound).
    """
    keys = keys or ["event_id"]
    return (events_stream
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(keys))


def stream_sessionize(events_stream: DataFrame,
                      gap: str = "30 minutes",
                      watermark: str = "10 minutes") -> DataFrame:
    """Gap-based session aggregation (streaming twin of sessionize)."""
    return (
        events_stream
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
             .alias("total_value"))
        .select("user_id", F.col("win.start").alias("session_start"),
                F.col("win.end").alias("session_end"), "n_events",
                "total_value")
    )


def _duration_ms(s: str) -> int:
    """'30 days' / '2 hours' / '10 minutes' / '45 seconds' -> milliseconds."""
    n, unit = s.split()
    mult = {"second": 1_000, "minute": 60_000,
            "hour": 3_600_000, "day": 86_400_000}[unit.rstrip("s")]
    return int(n) * mult


def stream_funnel(events_stream: DataFrame,
                  steps: tuple[str, ...] = ("view", "click", "purchase"),
                  per_step_cap: int = 4096,
                  watermark: str = "30 days",
                  state_retention: str = "30 days") -> DataFrame:
    """Stateful streaming twin of operators.funnel.funnel_conversion.

    Emits, per user per micro-batch, the user's current funnel progress:
    (user_id, max_step) where max_step is the longest ordered witness chain
    view < click < purchase (strict event-time order) seen SO FAR — exactly
    the batch operator's per-user semantics, maintained incrementally.

    Out-of-order arrival is handled exactly: a later-arriving EARLIER
    step-1 event can retroactively qualify an already-seen step-2 event, so
    the state keeps each step's event times (sorted, deduplicated) and
    re-derives the greedy chain per update — not just the running reach
    times, which would silently miss such chains.

    State is bounded in BOTH dimensions on an unbounded stream:
      * per user: ``per_step_cap`` times per (user, step) — beyond the cap
        the EARLIEST times are kept, which preserves the greedy chain
        unless a chain needs a time above the cap's horizon (with 4096
        retained timestamps per step that requires a pathological user);
      * user count: event-time timeout — once the ``ts`` watermark
        (``watermark`` delay) passes a user's last event plus
        ``state_retention``, the user's state row is evicted, mirroring
        ``stream_dedup_events``/``stream_sessionize``. Rows already
        emitted for an evicted user stay in the sink, so max-per-user
        funnel counts over the sink remain exact; a returning user
        restarts from empty state.
    Events whose type is not one of ``steps`` are filtered BEFORE the
    groupBy, so they are never shuffled and never touch state.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    k_steps = len(steps)
    state_schema = ", ".join(f"t{k} array<long>" for k in range(k_steps))
    OUTPUT_SCHEMA = "user_id long, max_step long"
    step_idx = {s: k for k, s in enumerate(steps)}
    retention_ms = _duration_ms(state_retention)

    def update(key, pdf_iter, state: GroupState):
        import bisect

        import pandas as pd
        if state.hasTimedOut:
            # watermark passed last event + retention: evict the user
            state.remove()
            return
        times = ([list(a) for a in state.get] if state.exists
                 else [[] for _ in range(k_steps)])
        batch_max_us = 0
        for pdf in pdf_iter:
            # normalize to integer MICROseconds whatever pandas resolution
            # Arrow handed us (datetime64[ns] or [us])
            us = (pdf["ts"].astype("datetime64[ns]").astype("int64") // 1000
                  if pdf["ts"].dtype.kind == "M" else pdf["ts"].astype("int64"))
            for typ, t in zip(pdf["event_type"], us):
                k = step_idx.get(typ)
                if k is None:
                    continue
                t = int(t)
                if t > batch_max_us:
                    batch_max_us = t
                pos = bisect.bisect_left(times[k], t)
                if pos >= len(times[k]) or times[k][pos] != t:
                    times[k].insert(pos, t)
                    del times[k][per_step_cap:]
        state.update(tuple(times))
        # evict once the watermark passes (last event + retention). The
        # base is the max of THIS batch's events and the retained state
        # times — not the retained times alone, whose cap keeps the
        # EARLIEST entries: a user streaming past per_step_cap would
        # otherwise freeze their timeout at the old horizon and be evicted
        # mid-activity. The timestamp must be strictly above the current
        # watermark or Spark rejects it, hence the clamp for
        # stale-but-in-watermark updates.
        last_us = max((t[-1] for t in times if t), default=0)
        last_us = max(last_us, batch_max_us)
        state.setTimeoutTimestamp(max(last_us // 1000 + retention_ms,
                                      state.getCurrentWatermarkMs() + 1))
        reached, t_prev = 0, None
        for k in range(k_steps):
            pos = (0 if t_prev is None
                   else bisect.bisect_right(times[k], t_prev))
            if pos >= len(times[k]):
                break
            reached, t_prev = k + 1, times[k][pos]
        yield pd.DataFrame({"user_id": [key[0]], "max_step": [reached]})

    return (events_stream
            .filter(F.col("event_type").isin(list(steps)))
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                update,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=state_schema,
                outputMode="update",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))


def stream_cms_grid(events_stream: DataFrame, value_col: str = "event_type",
                    width: int = 64, depth: int = 3,
                    window: str = "1 hour",
                    watermark: str = "10 minutes") -> DataFrame:
    """Streaming count-min sketch: per tumbling window, the depth x width
    counter grid over ``value_col`` -> (window_start, d, bucket, c).

    The streaming half of sketch.cms_heavy_hitters: heavy-hitter queries
    at 10^12 events/day can't keep per-value state, but the CMS grid is
    CONSTANT-size per window (depth*width counters) and mergeable, so
    state is bounded by (windows in flight) x depth x width no matter
    the value cardinality — the exact property that makes sketches the
    production answer for streaming top-k. Estimates read MIN over the
    d rows downstream (same query contract as the batch operator, same
    DSIR-family md5 bucket hash, so a batch recompute verifies any
    window's grid bit-for-bit).

    Watermark bounds both late data and state eviction (the
    stream_windowed_counts contract).
    """
    from saber_spark.operators.sketch import _cms_buckets
    return (events_stream
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", watermark)
            .select("ts",
                    F.explode(_cms_buckets(F.col(value_col), width, depth))
                    .alias("db"))
            .groupBy(F.window("ts", window).alias("win"),
                     F.col("db.d").alias("d"),
                     F.col("db.bucket").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("c"))
            .select(F.col("win.start").alias("window_start"),
                    "d", "bucket", "c"))
