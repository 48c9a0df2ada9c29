"""Structured Streaming tests: file-source micro-batch runs compared to the
batch twins on identical data."""

import os

import pytest
from pyspark.sql import functions as F

from saber_spark.fixtures.dictionary import surface_label_map
from saber_spark.fixtures.pages import build_pages_df
from saber_spark.operators.extract import extract_text
from saber_spark.operators.tagger import detect_mentions
from saber_spark.streaming import (
    stream_mentions,
    stream_sessionize,
    stream_windowed_counts,
)

SF_DIR = "/root/testdata/sf0.001"


def _run_stream(df, tmp_path, name):
    out = str(tmp_path / f"{name}_out")
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode("complete" if df.isStreaming else "append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    _ = out
    return q


class TestStreamingMentions:
    def test_matches_batch(self, spark, tmp_path):
        """Streaming mentions over the page table == batch mentions."""
        pages_dir = str(tmp_path / "pages")
        build_pages_df(spark, SF_DIR).write.parquet(pages_dir)
        schema = spark.read.parquet(pages_dir).schema
        stream = spark.readStream.schema(schema).parquet(pages_dir)
        bc = spark.sparkContext.broadcast(surface_label_map())

        q = (stream_mentions(stream, bc)
             .writeStream.format("memory").queryName("mentions_stream")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(180)
        got = {tuple(r) for r in spark.sql(
            "select * from mentions_stream").collect()}

        batch = detect_mentions(
            extract_text(spark.read.parquet(pages_dir)), bc)
        expected = {tuple(r) for r in batch.collect()}
        assert got == expected
        assert len(got) > 0


class TestStreamingWindows:
    @pytest.fixture(scope="class")
    def events_dir(self, spark, tmp_path_factory):
        d = str(tmp_path_factory.mktemp("ev") / "events")
        spark.read.parquet(f"{SF_DIR}/events.parquet").write.parquet(d)
        return d

    def test_windowed_counts_match_batch(self, spark, events_dir):
        schema = spark.read.parquet(events_dir).schema
        stream = spark.readStream.schema(schema).parquet(events_dir)
        q = (stream_windowed_counts(stream)
             .writeStream.format("memory").queryName("win_stream")
             .outputMode("complete").trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = {(r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
               for r in spark.sql("select * from win_stream").collect()}

        batch = (spark.read.parquet(events_dir)
                 .groupBy(F.window(F.col("ts").cast("timestamp"), "1 hour")
                          .alias("win"), "event_type")
                 .agg(F.count(F.lit(1)).alias("n"),
                      F.sum(F.col("value").cast("decimal(18,2)"))
                      .cast("double").alias("v")))
        expected = {(r["win"]["start"], r["event_type"]): (r["n"], r["v"])
                    for r in batch.collect()}
        assert got == expected

    def test_sessionize_runs(self, spark, events_dir):
        schema = spark.read.parquet(events_dir).schema
        stream = spark.readStream.schema(schema).parquet(events_dir)
        q = (stream_sessionize(stream)
             .writeStream.format("memory").queryName("sess_stream")
             .outputMode("complete").trigger(availableNow=True).start())
        q.awaitTermination(120)
        rows = spark.sql("select * from sess_stream").collect()
        assert len(rows) > 0
        r0 = rows[0]
        assert r0["session_end"] >= r0["session_start"]
        assert r0["n_events"] >= 1
        assert os.path.exists(events_dir)


class TestStreamingDedup:
    def test_dedup_within_watermark_drops_dupes(self, spark, tmp_path):
        """Duplicated event_ids arriving within the watermark window are
        emitted once; state is watermark-bounded (dropDuplicatesWithinWatermark)."""
        from saber_spark.streaming import stream_dedup_events
        d = str(tmp_path / "dup_events")
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet").limit(200)
        # plant exact duplicates: every event twice
        ev.unionAll(ev).write.parquet(d)
        schema = spark.read.parquet(d).schema
        stream = spark.readStream.schema(schema).parquet(d)
        q = (stream_dedup_events(stream, keys=["event_id"])
             .writeStream.format("memory").queryName("dedup_stream")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(180)
        got = spark.sql("select event_id from dedup_stream").collect()
        assert len(got) == 200
        assert len({r["event_id"] for r in got}) == 200


class TestStreamingFunnel:
    def test_out_of_order_parity_with_batch(self, spark, tmp_path):
        """Per-user funnel progress from the stateful streaming operator ==
        the batch funnel, even when a user's earlier step-1 event arrives in
        a LATER micro-batch than the step-2 event it qualifies."""
        import datetime as dt
        import random

        from saber_spark.operators.funnel import funnel_conversion
        from saber_spark.streaming import stream_funnel

        rng = random.Random(17)
        types = ["view", "click", "purchase", "signup"]
        rows = []
        for u in range(40):
            for _ in range(rng.randint(1, 10)):
                rows.append((u, rng.choice(types),
                             dt.datetime(2024, 1, rng.randint(1, 27),
                                         rng.randint(0, 23),
                                         rng.randint(0, 59))))
        # u99 is the regression case: click arrives in batch 0, the earlier
        # view that qualifies it only in batch 1 (out-of-order arrival)
        late_view = [(99, "view", dt.datetime(2024, 1, 1))]
        early_click = [(99, "click", dt.datetime(2024, 1, 5))]

        schema = "user_id long, event_type string, ts timestamp_ntz"
        src = str(tmp_path / "funnel_events")
        # one parquet file per micro-batch, delivered in file order
        spark.createDataFrame(rows[:len(rows) // 2] + early_click, schema) \
            .coalesce(1).write.parquet(src)
        spark.createDataFrame(rows[len(rows) // 2:] + late_view, schema) \
            .coalesce(1).write.mode("append").parquet(src)

        stream = (spark.readStream.schema(spark.read.parquet(src).schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = (stream_funnel(stream)
             .writeStream.format("memory").queryName("funnel_stream")
             .outputMode("update").trigger(availableNow=True).start())
        q.awaitTermination(180)

        # max_step is monotone non-decreasing, so max-per-user == the final
        # state without assuming anything about sink row order
        got_rows = spark.sql("select * from funnel_stream").collect()
        final = {}
        for r in got_rows:
            final[r["user_id"]] = max(final.get(r["user_id"], 0),
                                      r["max_step"])

        batch = funnel_conversion(
            spark.createDataFrame(rows + early_click + late_view, schema))
        step_counts = {r["step"]: r["n_users"] for r in batch.collect()}
        stream_counts = {k: sum(1 for v in final.values() if v >= k)
                         for k in (1, 2, 3)}
        assert stream_counts == step_counts
        assert final[99] == 2  # the out-of-order chain was found

    def test_event_time_eviction_bounds_user_state(self, spark, tmp_path):
        """Users the watermark has passed (last event + state_retention) are
        EVICTED from the state store, while funnel counts stay exact — both
        for the evicted users (their emitted rows remain in the sink) and
        for live users. Guards against unbounded user-count state growth."""
        import datetime as dt

        from saber_spark.streaming import stream_funnel

        schema = "user_id long, event_type string, ts timestamp_ntz"
        src = str(tmp_path / "evict_events")
        ckpt = str(tmp_path / "evict_ckpt")
        jan = dt.datetime(2024, 1, 1, 12)
        # batch 0: three old users complete view+click in January;
        # user 42's funnel starts in January too
        b0 = [(u, t, jan + dt.timedelta(hours=i))
              for i, (u, t) in enumerate(
                  [(1, "view"), (1, "click"), (2, "view"), (2, "click"),
                   (3, "view"), (3, "click"), (42, "view")])]
        # batch 1: user 42 resurfaces in June -> watermark jumps to ~May 31
        b1 = [(42, "click", dt.datetime(2024, 6, 1))]
        # batch 2: timeout check runs against the post-batch-1 watermark
        # (May 31): users 1-3 (timeout Jan 1 + 2 days) are evicted; user 42
        # (timeout Jun 1 + 2 days) survives and completes the funnel
        b2 = [(42, "purchase", dt.datetime(2024, 6, 2))]
        for i, batch in enumerate([b0, b1, b2]):
            spark.createDataFrame(batch, schema).coalesce(1) \
                .write.mode("append" if i else "overwrite").parquet(src)

        stream = (spark.readStream.schema(spark.read.parquet(src).schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = (stream_funnel(stream, watermark="1 day",
                           state_retention="2 days")
             .writeStream.format("memory").queryName("evict_stream")
             .option("checkpointLocation", ckpt)
             .outputMode("update").trigger(availableNow=True).start())
        q.awaitTermination(180)

        final = {}
        for r in spark.sql("select * from evict_stream").collect():
            final[r["user_id"]] = max(final.get(r["user_id"], 0),
                                      r["max_step"])
        assert final == {1: 2, 2: 2, 3: 2, 42: 3}

        state = (spark.read.format("statestore").option("path", ckpt)
                 .load().selectExpr("key.user_id").collect())
        assert sorted(r["user_id"] for r in state) == [42]


class TestStreamingFunnelCapTimeout:
    def test_active_user_past_cap_not_evicted(self, spark, tmp_path):
        """The eviction timeout must follow the user's TRUE latest event,
        not the cap-truncated state (which keeps the EARLIEST times): a
        user still actively streaming past per_step_cap must survive a
        watermark that has passed their old retained horizon."""
        import datetime as dt

        from saber_spark.streaming import stream_funnel

        schema = "user_id long, event_type string, ts timestamp_ntz"
        src = str(tmp_path / "cap_events")
        ckpt = str(tmp_path / "cap_ckpt")
        jan = dt.datetime(2024, 1, 1)
        # b0: user 1 exceeds the cap (cap=2, three views) -> state retains
        # the two EARLIEST views (Jan 1, Jan 2)
        b0 = [(1, "view", jan + dt.timedelta(days=i)) for i in range(3)]
        # b1: user 1 is STILL ACTIVE in June (event dropped by the cap but
        # must refresh the timeout); user 2 advances the watermark
        b1 = [(1, "view", dt.datetime(2024, 6, 1)),
              (2, "view", dt.datetime(2024, 6, 1))]
        # b2: timeout check runs against wm ≈ May 31: user 1's timeout must
        # be Jun 1 + retention (survives), not Jan 2 + retention (evicted)
        b2 = [(2, "view", dt.datetime(2024, 6, 2))]
        for i, batch in enumerate([b0, b1, b2]):
            spark.createDataFrame(batch, schema).coalesce(1) \
                .write.mode("append" if i else "overwrite").parquet(src)

        stream = (spark.readStream.schema(spark.read.parquet(src).schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = (stream_funnel(stream, per_step_cap=2, watermark="1 day",
                           state_retention="2 days")
             .writeStream.format("memory").queryName("cap_stream")
             .option("checkpointLocation", ckpt)
             .outputMode("update").trigger(availableNow=True).start())
        q.awaitTermination(180)

        state = sorted(r["user_id"] for r in
                       spark.read.format("statestore").option("path", ckpt)
                       .load().selectExpr("key.user_id").collect())
        assert state == [1, 2]  # user 1 NOT evicted despite frozen cap


class TestStatelessOpsAreStreamingReady:
    def test_pii_scrub_and_lang_id_run_unchanged_on_streams(self, spark, tmp_path):
        """The narrow corpus-filter family (pii_scrub, lang_id — pure
        projections, no agg) runs UNCHANGED on a streaming DataFrame in
        append mode and emits byte-identical rows to the batch run; no
        streaming twin needed, which is the point of keeping these
        operators narrow."""
        from saber_spark.operators.textstats import lang_id, pii_scrub
        d = str(tmp_path / "docs")
        docs = spark.createDataFrame(
            [(1, "mail me at a@b.co or 10.0.0.1 the of and"),
             (2, "zz qq ww"),
             (3, "call 555-123-4567 now")],
            "doc_id long, text string")
        docs.write.parquet(d)
        schema = spark.read.parquet(d).schema
        for name, op in [("pii", pii_scrub), ("lang", lang_id)]:
            stream = spark.readStream.schema(schema).parquet(d)
            q = (op(stream)
                 .writeStream.format("memory").queryName(f"{name}_s")
                 .outputMode("append").trigger(availableNow=True).start())
            q.awaitTermination(120)
            got = {tuple(r) for r in spark.sql(f"select * from {name}_s").collect()}
            expected = {tuple(r) for r in op(spark.read.parquet(d)).collect()}
            assert got == expected and len(got) == 3


class TestStreamCmsGrid:
    @pytest.fixture(scope="class")
    def events_dir(self, spark, tmp_path_factory):
        d = str(tmp_path_factory.mktemp("cms_ev") / "events")
        spark.read.parquet(f"{SF_DIR}/events.parquet").write.parquet(d)
        return d

    def test_grid_matches_batch_sketch_per_window(self, spark, events_dir):
        """Each window's streaming CMS grid must equal the batch grid
        computed over that window's events — the sketch is deterministic,
        so the streaming path is verifiable bit-for-bit."""
        from saber_spark.operators.sketch import _cms_buckets
        from saber_spark.streaming import stream_cms_grid
        schema = spark.read.parquet(events_dir).schema
        stream = spark.readStream.schema(schema).parquet(events_dir)
        q = (stream_cms_grid(stream, width=16, depth=2)
             .writeStream.format("memory").queryName("cms_stream")
             .outputMode("complete").trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = {(r["window_start"], r["d"], r["bucket"]): r["c"]
               for r in spark.sql("select * from cms_stream").collect()}
        batch = (spark.read.parquet(events_dir)
                 .select(F.window(F.col("ts").cast("timestamp"), "1 hour")
                         .alias("win"),
                         F.explode(_cms_buckets(F.col("event_type"),
                                                16, 2)).alias("db"))
                 .groupBy(F.col("win.start").alias("ws"),
                          F.col("db.d").alias("d"),
                          F.col("db.bucket").alias("bucket"))
                 .agg(F.count(F.lit(1)).alias("c")))
        want = {(r["ws"], r["d"], r["bucket"]): r["c"]
                for r in batch.collect()}
        assert got == want and len(got) > 0

    def test_state_is_grid_bounded(self, spark, events_dir):
        """The grid has at most depth*width rows per window regardless of
        value cardinality — the property that makes it safe at 10^12
        events."""
        from saber_spark.streaming import stream_cms_grid
        schema = spark.read.parquet(events_dir).schema
        stream = spark.readStream.schema(schema).parquet(events_dir)
        q = (stream_cms_grid(stream, value_col="user_id", width=8, depth=2)
             .writeStream.format("memory").queryName("cms_bound")
             .outputMode("complete").trigger(availableNow=True).start())
        q.awaitTermination(120)
        rows = spark.sql("select * from cms_bound").collect()
        per_window = {}
        for r in rows:
            per_window.setdefault(r["window_start"], 0)
            per_window[r["window_start"]] += 1
        assert per_window and all(v <= 16 for v in per_window.values())
