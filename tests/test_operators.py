"""Operator-level tests: SQL formulations cross-checked against the pure
kernels, dedup/similarity semantics on crafted inputs."""

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from saber_spark.kernels.chunk import chunk_entities
from saber_spark.kernels.metrics import get_precision_recall_f1_support
from saber_spark.operators.chunker import chunk_bio_sql
from saber_spark.operators.dedup import (
    doc_shingles,
    exact_dedup,
    minhash_candidates,
    ngram_jaccard,
    simhash,
)
from saber_spark.operators.evaluation import evaluate_chunks
from saber_spark.operators.multimodal import attach_fake_media, decode_features
from saber_spark.operators.sessions import sessionize
from saber_spark.operators.similarity import cosine_topk
from saber_spark.operators.splits import fold_assign, top1_by
from saber_spark.operators.vocab import rare_tokens, tokenize_docs, vocab_ids


def _random_tag_seqs(n_seqs=60, seed=7):
    rng = random.Random(seed)
    labels = ["PRGE", "DISO", "CHED"]
    tags = (["O"] * 4
            + [f"B-{l}" for l in labels]
            + [f"I-{l}" for l in labels]
            + [f"E-{l}" for l in labels] + ["S-PRGE"])
    return [[rng.choice(tags) for _ in range(rng.randint(0, 12))]
            for _ in range(n_seqs)]


class TestChunkerSQL:
    def test_matches_kernel_on_random_sequences(self, spark):
        """The window-function chunk decode must equal the reference kernel
        on arbitrary (including invalid) BIO/BIOES sequences."""
        seqs = _random_tag_seqs()
        rows = [(i, p, t) for i, seq in enumerate(seqs)
                for p, t in enumerate(seq)]
        df = spark.createDataFrame(rows, "seq_id int, pos int, tag string")
        got = {
            (r["seq_id"], r["label"], r["chunk_start"], r["chunk_end"])
            for r in chunk_bio_sql(df).collect()
        }
        expected = {
            (i, lab, s, e)
            for i, seq in enumerate(seqs)
            for lab, s, e in chunk_entities(seq)
        }
        assert got == expected


class TestEvaluationSQL:
    def test_matches_kernel(self, spark):
        rng = random.Random(13)
        labels = ["A", "B", "C"]
        gold = [(rng.choice(labels), rng.randint(0, 6), rng.randint(7, 12))
                for _ in range(40)]
        pred = [(rng.choice(labels), rng.randint(0, 6), rng.randint(7, 12))
                for _ in range(40)]
        gold_set, pred_set = sorted(set(gold)), sorted(set(pred))
        for criteria in ("exact", "left", "right"):
            kernel = get_precision_recall_f1_support(gold_set, pred_set, criteria)
            gdf = spark.createDataFrame(
                gold_set, "label string, chunk_start int, chunk_end int")
            pdf = spark.createDataFrame(
                pred_set, "label string, chunk_start int, chunk_end int")
            got = {r["label"]: r for r in
                   evaluate_chunks(gdf, pdf, criteria).collect()}
            for lab in {g[0] for g in gold_set}:
                p, r, f1, support = kernel[lab]
                assert got[lab]["precision"] == pytest.approx(p, abs=1e-6)
                assert got[lab]["recall"] == pytest.approx(r, abs=1e-6)
                assert got[lab]["f1"] == pytest.approx(f1, abs=1e-6)
                assert got[lab]["tp"] + got[lab]["fn"] == support

    def test_invalid_criteria(self, spark):
        df = spark.createDataFrame(
            [("A", 0, 1)], "label string, chunk_start int, chunk_end int")
        with pytest.raises(ValueError):
            evaluate_chunks(df, df, "bogus")


class TestDedup:
    @pytest.fixture(scope="class")
    def crafted_docs(self, spark):
        base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
                "lam mu nu xi omicron pi rho sigma tau upsilon")
        near = base.replace("theta", "THETA")  # 3 shingles differ
        far = "completely different words nothing shared here at all ok then"
        return spark.createDataFrame(
            [(0, base), (1, base), (2, near), (3, far)],
            "doc_id long, text string")

    def test_exact_dedup(self, spark, crafted_docs):
        groups = {r["min_doc_id"]: r["n_docs"]
                  for r in exact_dedup(crafted_docs).collect()}
        assert groups[0] == 2  # docs 0 and 1 byte-identical
        assert groups[3] == 1

    def test_minhash_finds_near_dup(self, spark, crafted_docs):
        pairs = {(r["doc_a"], r["doc_b"])
                 for r in minhash_candidates(crafted_docs).collect()}
        assert (0, 1) in pairs          # identical
        assert (0, 2) in pairs or (1, 2) in pairs  # near-dup
        assert not any(3 in p for p in pairs)      # unrelated never pairs

    def test_jaccard_values(self, spark, crafted_docs):
        pairs = spark.createDataFrame(
            [(0, 1), (0, 2)], "doc_a long, doc_b long")
        j = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in ngram_jaccard(crafted_docs, pairs).collect()}
        assert j[(0, 1)] == 1.0
        assert 0.5 < j[(0, 2)] < 1.0

    def test_simhash_near_dup_close(self, spark, crafted_docs):
        h = {r["doc_id"]: r["simhash"] for r in simhash(crafted_docs).collect()}
        assert h[0] == h[1]
        d_near = bin(h[0] ^ h[2]).count("1")
        d_far = bin(h[0] ^ h[3]).count("1")
        assert d_near <= d_far

    def test_shingles(self, spark):
        docs = spark.createDataFrame([(0, "a b c d"), (1, "a b")],
                                     "doc_id long, text string")
        sh = {(r["doc_id"], r["shingle"]) for r in doc_shingles(docs).collect()}
        assert sh == {(0, "a b c"), (0, "b c d")}  # short doc -> none


class TestSimilarity:
    def test_cosine_topk_vs_numpy(self, spark):
        rng = np.random.RandomState(3)
        vecs = rng.randn(20, 8).astype(np.float32)
        df = spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]]) for i in range(20)],
            "vec_id long, embedding array<float>")
        got = cosine_topk(df, df.filter(F.col("vec_id") < 3), k=2).collect()
        q = np.round(vecs.astype(np.float64) * 1000)
        for qid in range(3):
            sims = {}
            for j in range(20):
                if j == qid:
                    continue
                sims[j] = float(q[qid] @ q[j] /
                                np.sqrt((q[qid] @ q[qid]) * (q[j] @ q[j])))
            expect = sorted(sims, key=lambda j: (-sims[j], j))[:2]
            mine = [r["neighbor_id"] for r in sorted(
                (r for r in got if r["query_id"] == qid),
                key=lambda r: r["rank"])]
            assert mine == expect


class TestLSHScale:
    """Scale guardrails for the ANN path: derived plane count keeps buckets
    bounded on orthant-skewed embeddings, and the multi-band random-plane
    construction keeps recall >= 0.9 vs brute force."""

    @staticmethod
    def _skewed_df(spark, n=400, dim=16, seed=11):
        # all vectors in the positive orthant of the first components:
        # axis-aligned planes put EVERYTHING in one bucket
        rng = np.random.RandomState(seed)
        vecs = rng.randn(n, dim).astype(np.float32)
        vecs[:, :8] = np.abs(vecs[:, :8]) + 0.1
        return spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]]) for i in range(n)],
            "vec_id long, embedding array<float>")

    def test_derive_n_planes_scales_with_corpus(self):
        from saber_spark.operators.similarity import derive_n_planes
        assert derive_n_planes(100, 256) == 1
        assert derive_n_planes(10_000, 256) == 6
        # 100x corpus -> ~log2(100) ~ 7 more planes, bucket size held
        assert derive_n_planes(1_000_000, 256) == 12
        assert derive_n_planes(10**12, 256) == 32

    def test_random_planes_bound_buckets_on_skew(self, spark):
        from saber_spark.operators.similarity import lsh_bucket, random_planes
        df = self._skewed_df(spark)
        n_planes = 4
        # axis planes degenerate: one bucket holds the whole corpus
        axis = lsh_bucket(df, n_planes).groupBy("bucket").count().collect()
        assert max(r["count"] for r in axis) == 400
        # Gaussian planes split the same cloud into bounded buckets
        planes = random_planes(16, n_planes, n_bands=1)[0]
        rand = lsh_bucket(df, n_planes, planes=planes) \
            .groupBy("bucket").count().collect()
        counts = [r["count"] for r in rand]
        assert len(counts) >= 8  # most of the 16 codes populated
        assert max(counts) < 400 * 0.5  # no degenerate mega-bucket

    def test_multiband_recall_vs_brute(self, spark):
        from saber_spark.operators.similarity import (cosine_topk,
                                                      lsh_cosine_topk)
        df = self._skewed_df(spark)
        brute = cosine_topk(df, df, k=3).collect()
        approx = lsh_cosine_topk(
            df, k=3, n_planes=None, n_bands=4, target_bucket_size=64,
            use_random_planes=True).collect()
        truth = {(r["query_id"], r["neighbor_id"]) for r in brute}
        got = {(r["query_id"], r["neighbor_id"]) for r in approx}
        recall = len(truth & got) / len(truth)
        assert recall >= 0.9, f"recall {recall:.3f} < 0.9"


class TestSessions:
    def test_gap_splits_sessions(self, spark):
        rows = [
            (0, "2024-01-01 00:00:00", 1, "view", 1.0, None),
            (1, "2024-01-01 00:10:00", 1, "view", 2.0, None),
            (2, "2024-01-01 01:00:00", 1, "view", 3.0, None),  # 50min gap
            (3, "2024-01-01 00:00:00", 2, "view", 4.0, None),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, event_type string,"
                  " value double, props string"
        ).withColumn("ts", F.to_timestamp("ts"))
        out = {(r["user_id"], r["session_id"]): r["n_events"]
               for r in sessionize(df).collect()}
        assert out == {(1, 1): 2, (1, 2): 1, (2, 1): 1}


class TestSplits:
    def test_fold_partition(self, spark):
        df = spark.createDataFrame([(i,) for i in range(1000)], "id long")
        folded = fold_assign(df, "id", 5)
        counts = {r["fold"]: r["n"] for r in
                  folded.groupBy("fold").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert set(counts) == {0, 1, 2, 3, 4}
        assert folded.count() == 1000
        # deterministic: same assignment on recompute
        again = {r["id"]: r["fold"] for r in fold_assign(df, "id", 5).collect()}
        first = {r["id"]: r["fold"] for r in folded.collect()}
        assert first == again

    def test_top1(self, spark):
        df = spark.createDataFrame(
            [(1, 10, 5.0), (1, 11, 9.0), (1, 12, 9.0), (2, 20, 1.0)],
            "user_id long, event_id long, value double")
        got = {r["user_id"]: r["event_id"]
               for r in top1_by(df, ["user_id"], "value", "event_id").collect()}
        assert got == {1: 11, 2: 20}  # tie broken by min event_id


class TestMultimodal:
    def test_plumbing_and_determinism(self, spark):
        docs = spark.createDataFrame(
            [(i, f"text {i}") for i in range(9)], "doc_id long, text string")
        media = attach_fake_media(docs)
        assert dict(media.dtypes)["payload"] == "binary"
        feats = decode_features(media)
        rows = {r["doc_id"]: r for r in feats.collect()}
        assert len(rows) == 9
        assert all(len(r["feature"]) == 8 for r in rows.values())
        assert all(0.0 <= v <= 1.0 for r in rows.values() for v in r["feature"])
        rows2 = {r["doc_id"]: r["feature"] for r in decode_features(media).collect()}
        assert {k: v["feature"] for k, v in rows.items()} == rows2
        # content-sensitivity: different payloads -> different features
        assert rows[0]["feature"] != rows[1]["feature"]

    def test_resize_rebuilds_meta(self, spark):
        from saber_spark.operators.multimodal import resize_media
        docs = spark.createDataFrame(
            [(i, "words " * (i + 4)) for i in range(6)],
            "doc_id long, text string")
        out = {r["doc_id"]: r
               for r in resize_media(attach_fake_media(docs), 32, 24).collect()}
        assert len(out) == 6                      # 1:1 row contract
        assert all(r["meta"]["width"] == 32 and r["meta"]["height"] == 24
                   for r in out.values())
        assert all(r["meta"]["n_bytes"] == len(r["payload"]) == 12
                   for r in out.values())          # 32*24/64
        assert out[0]["payload"] != out[1]["payload"]  # content-sensitive
        again = {r["doc_id"]: r["payload"]
                 for r in resize_media(attach_fake_media(docs), 32, 24).collect()}
        assert {k: v["payload"] for k, v in out.items()} == again

    def test_frame_sampling_fans_out_video_rows(self, spark):
        from saber_spark.operators.multimodal import sample_frames
        docs = spark.createDataFrame(
            [(i, "frame payload material " * 20) for i in range(9)],
            "doc_id long, text string")
        media = attach_fake_media(docs)   # doc_id % 3 == 2 -> video
        frames = sample_frames(media, every_ms=500, max_frames=3).collect()
        by_doc = {}
        for r in frames:
            by_doc.setdefault(r["doc_id"], []).append(r)
        assert set(by_doc) == {2, 5, 8}           # only video rows
        for doc_frames in by_doc.values():
            assert len(doc_frames) == 3           # 1:N fan-out
            assert sorted(f["ts_ms"] for f in doc_frames) == [0, 500, 1000]
            assert all(isinstance(f["frame"], (bytes, bytearray))
                       for f in doc_frames)


class TestVocab:
    def test_vocab_ids_start_at_2(self, spark):
        docs = spark.createDataFrame([(0, "b a c a")], "doc_id long, text string")
        ids = {r["token"]: r["token_id"]
               for r in vocab_ids(tokenize_docs(docs)).collect()}
        assert ids == {"a": 2, "b": 3, "c": 4}  # PAD=0/UNK=1 reserved

    def test_rare_tokens(self, spark):
        docs = spark.createDataFrame(
            [(0, "x x x y")], "doc_id long, text string")
        rare = {r["token"] for r in
                rare_tokens(tokenize_docs(docs), max_count=1).collect()}
        assert rare == {"y"}


class TestSharedShingles:
    def test_shared_shingle_table_parity(self, spark):
        """Passing a precomputed shingle table (the 100-TB checkpoint shape)
        must not change candidates or jaccard results."""
        base_txt = ("alpha beta gamma delta epsilon zeta eta theta iota "
                    "kappa lam mu nu xi omicron pi rho sigma tau upsilon")
        docs = spark.createDataFrame(
            [(0, base_txt), (1, base_txt),
             (2, base_txt.replace("theta", "THETA")),
             (3, "completely different words nothing shared here at all")],
            "doc_id long, text string")
        base_c = minhash_candidates(docs, portable_ids=True)
        base_j = {tuple(r) for r in ngram_jaccard(docs, base_c).collect()}
        sh = doc_shingles(docs)
        shared_c = minhash_candidates(docs, portable_ids=True, shingles=sh)
        shared_j = {tuple(r) for r in
                    ngram_jaccard(docs, shared_c, shingles=sh).collect()}
        assert shared_j == base_j and len(base_j) > 0


class TestIVF:
    def test_ivf_recall_vs_brute(self, spark):
        """IVF with n_probe=3 of 8 cells holds decent recall vs brute force
        and returns exactly k rows per query."""
        from saber_spark.operators.similarity import (cosine_topk,
                                                      ivf_cosine_topk)
        rng = np.random.RandomState(5)
        vecs = rng.randn(300, 16).astype(np.float32)
        df = spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]]) for i in range(300)],
            "vec_id long, embedding array<float>")
        brute = cosine_topk(df, df.filter(F.col("vec_id") < 20), k=3)
        approx = ivf_cosine_topk(df, k=3, n_centroids=8, n_probe=3,
                                 n_queries=20)
        truth = {(r["query_id"], r["neighbor_id"]) for r in brute.collect()}
        rows = approx.collect()
        got = {(r["query_id"], r["neighbor_id"]) for r in rows}
        per_q = {}
        for r in rows:
            per_q[r["query_id"]] = per_q.get(r["query_id"], 0) + 1
        assert all(v == 3 for v in per_q.values()) and len(per_q) == 20
        recall = len(truth & got) / len(truth)
        assert recall >= 0.5, f"recall {recall:.3f}"  # 3/8 cells probed

    def test_ivf_narrow_assignment(self, spark):
        """Cell assignment must be shuffle-free: no Exchange below the
        first aggregation in the assignment subplan (higher-order argmax,
        not a crossJoin+groupBy)."""
        from saber_spark.operators.similarity import ivf_cosine_topk
        rng = np.random.RandomState(6)
        df = spark.createDataFrame(
            [(i, [float(x) for x in rng.randn(8)]) for i in range(50)],
            "vec_id long, embedding array<float>")
        plan = ivf_cosine_topk(df, n_centroids=4, n_probe=1, n_queries=5) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_ivf_noncontiguous_ids_fail_loudly(self, spark):
        """Sparse / non-zero-based ids would silently seed fewer centroids
        and degrade every assignment — must raise instead."""
        from saber_spark.operators.similarity import ivf_cosine_topk
        rng = np.random.RandomState(7)
        df = spark.createDataFrame(
            [(i * 100, [float(x) for x in rng.randn(8)]) for i in range(50)],
            "vec_id long, embedding array<float>")
        with pytest.raises(ValueError, match="contiguous"):
            ivf_cosine_topk(df, n_centroids=8, n_probe=2, n_queries=5)


class TestAsofJoin:
    def test_latest_at_or_before_semantics(self, spark):
        from saber_spark.operators.asof import asof_join
        left = spark.createDataFrame(
            [(1, 100, 5), (1, 200, 6), (1, 50, 7), (2, 100, 8)],
            "user_id long, ts long, lid long")
        right = spark.createDataFrame(
            [(1, 100, 91), (1, 150, 92), (2, 400, 93)],
            "user_id long, ts long, rid long")
        out = {r["lid"]: r["asof_rid"]
               for r in asof_join(left, right, keys=["user_id"], ts_col="ts",
                                  payload_cols=["rid"]).collect()}
        assert out[5] == 91      # equal ts -> inclusive (>=)
        assert out[6] == 92      # most recent of {100, 150}
        assert out[7] is None    # nothing at-or-before 50
        assert out[8] is None    # right row is in the future

    def test_one_shuffle_plan(self, spark):
        """The union+window formulation must show ONE Exchange — the plan
        shape that survives 10^12 rows (no range-join candidate blowup)."""
        from saber_spark.operators.asof import asof_join
        left = spark.createDataFrame([(1, 1, 1)], "user_id long, ts long, lid long")
        right = spark.createDataFrame([(1, 1, 2)], "user_id long, ts long, rid long")
        plan = asof_join(left, right, ["user_id"], "ts", ["rid"]) \
            ._jdf.queryExecution().executedPlan().toString()
        import re
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
        assert "CartesianProduct" not in plan


class TestTimeseriesAndSketch:
    def test_hypertable_day_equals_direct_day_agg(self, spark):
        """The day grain computed FROM the hour rollup must equal a direct
        day aggregation of raw events (lossless re-aggregation)."""
        from saber_spark.operators.timeseries import (DAY_US,
                                                      hypertable_rollup,
                                                      _epoch_micros)
        events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        rolled = hypertable_rollup(events)
        day_from_hour = {
            (r["bucket_us"], r["event_type"]): (r["n_events"], r["total_value"])
            for r in rolled.filter(F.col("grain") == "day").collect()}
        us = _epoch_micros("ts")
        direct = {
            (r["bucket_us"], r["event_type"]): (r["n"], r["tv"])
            for r in (events
                      .select((F.floor(us / DAY_US) * DAY_US).alias("bucket_us"),
                              "event_type",
                              F.col("value").cast("decimal(18,2)").alias("v"))
                      .groupBy("bucket_us", "event_type")
                      .agg(F.count(F.lit(1)).alias("n"),
                           F.sum("v").cast("double").alias("tv"))).collect()}
        assert day_from_hour == direct and len(direct) > 0

    def test_kmv_exact_below_k_and_bounded_error_above(self, spark):
        from saber_spark.operators.sketch import kmv_distinct
        rows = ([("small", i) for i in range(7)]
                + [("big", i * 37 + 5) for i in range(1000)])
        df = spark.createDataFrame(rows, "grp string, vid long")
        got = {r["grp"]: r for r in
               kmv_distinct(df, "grp", "vid", k=16).collect()}
        assert got["small"]["est_distinct"] == 7      # < k -> exact
        assert got["small"]["exact_distinct"] == 7
        err = abs(got["big"]["est_distinct"] - 1000) / 1000
        assert err < 0.5, got["big"]                   # k=16 -> ~25% stderr

    def test_range_join_window_semantics(self, spark):
        from saber_spark.operators.rangejoin import range_join
        import datetime
        base = datetime.datetime(2024, 1, 1, 12, 0, 0)
        def t(mins):
            return base + datetime.timedelta(minutes=mins)
        left = spark.createDataFrame([(1, t(0), 10)],
                                     "user_id long, ts timestamp_ntz, lid long")
        right = spark.createDataFrame(
            [(1, t(-61), 90), (1, t(-59), 91), (1, t(-1), 92),
             (1, t(0), 93), (1, t(5), 94), (2, t(-5), 95)],
            "user_id long, ts timestamp_ntz, rid long")
        HOUR = 3_600_000_000
        got = {r["r_rid"] for r in range_join(
            left, right, ["user_id"], "ts", -HOUR, -1, ["rid"]).collect()}
        # strictly-before window [-1h, -1us]: excludes t(-61) (too old),
        # t(0) (not strictly before), t(5) (future), user 2
        assert got == {91, 92}


class TestConnectedComponents:
    def test_multi_component_graph(self, spark):
        from saber_spark.operators.graph import connected_components
        # two chains + one isolated pair: {a-b-c-d}, {x-y}, {m-n}
        edges = spark.createDataFrame(
            [("b", "a"), ("c", "b"), ("c", "d"),
             ("y", "x"), ("m", "n")], "src string, dst string")
        got = {r["node"]: r["component"]
               for r in connected_components(edges).collect()}
        assert got == {"a": "a", "b": "a", "c": "a", "d": "a",
                       "x": "x", "y": "x", "m": "m", "n": "m"}

    def test_long_chain_converges(self, spark):
        """A 12-node path needs several propagation rounds (diameter), the
        fixpoint loop must run them and stop."""
        from saber_spark.operators.graph import connected_components
        edges = spark.createDataFrame(
            [(f"n{i:02d}", f"n{i+1:02d}") for i in range(11)],
            "src string, dst string")
        got = {r["node"]: r["component"]
               for r in connected_components(edges).collect()}
        assert set(got.values()) == {"n00"} and len(got) == 12


class TestStratifiedSample:
    def test_fractions_and_nesting(self, spark):
        from saber_spark.operators.splits import stratified_sample
        df = spark.createDataFrame(
            [(i, "a" if i % 2 == 0 else "b") for i in range(4000)],
            "id long, grp string")
        s50 = stratified_sample(df, "grp", "id", {"a": 0.5, "b": 0.0})
        ids50 = {r["id"] for r in s50.collect()}
        assert all(i % 2 == 0 for i in ids50)          # only group a
        assert abs(len(ids50) / 2000 - 0.5) < 0.05     # ~50% of a
        # nesting: the 20% sample is a subset of the 50% sample
        ids20 = {r["id"] for r in stratified_sample(
            df, "grp", "id", {"a": 0.2, "b": 0.0}).collect()}
        assert ids20 <= ids50 and 0 < len(ids20) < len(ids50)
        # deterministic across invocations
        again = {r["id"] for r in stratified_sample(
            df, "grp", "id", {"a": 0.5, "b": 0.0}).collect()}
        assert again == ids50


class TestGopherQuality:
    def test_repetition_and_shape_filters(self, spark):
        from saber_spark.operators.textstats import gopher_quality
        normal = " ".join(f"w{i % 97} x{(i * 7) % 89}" for i in range(30))
        spammy = " ".join(["spam"] * 61)
        short = "just a few words here"
        longwords = " ".join(["a" * 20] * 50)
        df = spark.createDataFrame(
            [(1, normal), (2, spammy), (3, short), (4, longwords)],
            "doc_id long, text string")
        out = {r["doc_id"]: r for r in gopher_quality(df).collect()}
        assert out[1]["keep"] is True
        assert out[1]["n_words"] == 60
        # 61 identical words: every bigram equal, trigrams all duplicates
        assert out[2]["top_bigram_frac"] == 1.0
        assert out[2]["dup_trigram_frac"] == round(58 / 59, 6)
        assert out[2]["keep"] is False
        assert out[3]["keep"] is False          # n_words < 40
        assert out[4]["mean_word_len"] == 20.0  # mean len > 10
        assert out[4]["keep"] is False

    def test_single_word_doc_has_zero_gram_fracs(self, spark):
        from saber_spark.operators.textstats import gopher_quality
        df = spark.createDataFrame([(1, "solo")], "doc_id long, text string")
        r = gopher_quality(df).collect()[0]
        assert r["top_bigram_frac"] == 0.0 and r["dup_trigram_frac"] == 0.0
        assert r["keep"] is False


class TestSequencePacking:
    def test_bins_and_offsets(self, spark):
        from saber_spark.operators.packing import pack_sequences
        df = spark.createDataFrame(
            [(1, "a", "t1 t2 t3"),            # 3 tokens -> bin 0 @ 0
             (2, "a", "t1 t2 t3 t4"),         # cum 3    -> bin 0 @ 3
             (3, "a", "t1 t2 t3 t4 t5"),      # cum 7    -> bin 1 @ 1
             (4, "b", "t1 t2")],              # own group -> bin 0 @ 0
            "doc_id long, source string, text string")
        out = {r["doc_id"]: (r["bin_id"], r["bin_offset"], r["n_tokens"])
               for r in pack_sequences(df, window=6).collect()}
        assert out[1] == (0, 0, 3)
        assert out[2] == (0, 3, 4)   # spans the bin 0/1 boundary
        assert out[3] == (1, 1, 5)
        assert out[4] == (0, 0, 2)

    def test_bad_window_raises(self, spark):
        from saber_spark.operators.packing import pack_sequences
        with pytest.raises(ValueError, match="window"):
            pack_sequences(spark.range(1), window=0)


class TestDedupClusters:
    def test_transitive_chain_collapses(self, spark):
        """A~B and B~C above threshold, A~C below: transitivity must still
        put all three in ONE cluster with a single keeper."""
        from saber_spark.operators.dedup import dedup_clusters
        base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
                "lam mu nu xi omicron pi rho sigma tau upsilon")
        b = base.replace("gamma", "GAMMA")      # J(A,B) ~ 15/21 = 0.714
        c = b.replace("sigma", "SIGMA")         # J(B,C) ~ 0.714, J(A,C) ~ 0.5
        lone = "unrelated totally different words nothing shared here at all"
        docs = spark.createDataFrame(
            [(10, base), (11, b), (12, c), (13, lone)],
            "doc_id long, text string")
        out = {r["doc_id"]: r for r in
               dedup_clusters(docs, threshold=0.6, rounds=4).collect()}
        assert out[10]["cluster_id"] == out[11]["cluster_id"] \
            == out[12]["cluster_id"] == 10
        assert out[10]["cluster_size"] == 3
        assert out[10]["keep"] is True
        assert out[11]["keep"] is False and out[12]["keep"] is False
        assert out[13] and out[13]["cluster_size"] == 1
        assert out[13]["keep"] is True and out[13]["cluster_id"] == 13


class TestPiiScrub:
    CASES = [
        (1, "contact me at jane.doe+spam@mail.example.org for details"),
        (2, "server 192.168.0.1 and 10.0.0.255 responded"),
        (3, "call +14155552671 or 555-867-5309 now"),
        (4, "clean text with no personal data at all"),
        (5, "mixed: a@b.co 1.2.3.4 555-123-4567 end"),
    ]

    def test_substitutions_and_counts(self, spark):
        from saber_spark.operators.textstats import pii_scrub
        df = spark.createDataFrame(self.CASES, "doc_id long, text string")
        out = {r["doc_id"]: r for r in pii_scrub(df).collect()}
        assert out[1]["scrubbed"] == "contact me at <EMAIL> for details"
        assert out[1]["n_emails"] == 1 and out[1]["clean"] is False
        assert out[2]["scrubbed"] == "server <IP> and <IP> responded"
        assert out[2]["n_ips"] == 2
        assert out[3]["scrubbed"] == "call <PHONE> or <PHONE> now"
        assert out[3]["n_phones"] == 2
        assert out[4]["clean"] is True
        assert out[4]["scrubbed"] == self.CASES[3][1]
        assert out[5]["scrubbed"] == "mixed: <EMAIL> <IP> <PHONE> end"

    def test_engine_parity_on_planted_pii(self, spark):
        """The scrubbed BYTES must match DuckDB's RE2 run of the same
        patterns — the testdata corpus has no PII, so the oracle row only
        proves no-op parity; this proves substitution parity."""
        import duckdb

        from saber_spark.operators.textstats import pii_scrub
        df = spark.createDataFrame(self.CASES, "doc_id long, text string")
        got = {r["doc_id"]: (r["scrubbed"], r["n_emails"], r["n_ips"],
                             r["n_phones"])
               for r in pii_scrub(df).collect()}
        con = duckdb.connect()
        con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?, ?)", self.CASES)
        import __spark_entry__ as e
        rows = con.sql(e.oracle_sql()["pii_scrub"].replace(
            "FROM documents", "FROM t")).fetchall()
        for doc_id, scrubbed, n_em, n_ip, n_ph, _clean in rows:
            assert got[doc_id] == (scrubbed, n_em, n_ip, n_ph), doc_id


class TestContaminationCheck:
    def test_flags_exact_and_embedded_overlap(self, spark):
        from saber_spark.operators.dedup import contamination_check
        bench = spark.createDataFrame(
            [(100, "the quick brown fox jumps over the lazy dog")],
            "doc_id long, text string")
        corpus = spark.createDataFrame(
            [(1, "intro text the quick brown fox jumps over something"),
             (2, "totally unrelated words with no benchmark overlap here"),
             (3, "the quick brown fox jumps over the lazy dog verbatim")],
            "doc_id long, text string")
        out = {r["doc_id"]: r for r in
               contamination_check(corpus, bench, n=5).collect()}
        assert out[1]["contaminated"] is True   # embedded 5-gram
        assert out[1]["n_eval_ngrams"] == 2     # two shared 5-grams
        assert out[2]["contaminated"] is False
        assert out[2]["n_eval_ngrams"] == 0
        assert out[3]["contaminated"] is True
        assert out[3]["n_eval_ngrams"] >= 4

    def test_eval_side_broadcasts(self, spark):
        """The probe join must broadcast the benchmark n-grams — a shuffle
        of the corpus side for a benchmark-sized probe is the wrong plan."""
        from saber_spark.operators.dedup import contamination_check
        bench = spark.createDataFrame(
            [(100, "a b c d e f")], "doc_id long, text string")
        corpus = spark.createDataFrame(
            [(1, "a b c d e f g")], "doc_id long, text string")
        plan = contamination_check(corpus, bench)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BroadcastHashJoin" in plan

    def test_counts_match_substitutions_on_overlap(self, spark):
        """A phone-shaped run inside an email must count as email only —
        counts are computed on the same intermediate each replacement
        step sees, so they always equal the substitutions made."""
        from saber_spark.operators.textstats import pii_scrub
        df = spark.createDataFrame(
            [(1, "reach me at +14155552671@relay.example.com ok"),
             (2, "host 1.2.3.4@files.example.org down")],
            "doc_id long, text string")
        out = {r["doc_id"]: r for r in pii_scrub(df).collect()}
        assert out[1]["scrubbed"] == "reach me at <EMAIL> ok"
        assert (out[1]["n_emails"], out[1]["n_ips"], out[1]["n_phones"]) \
            == (1, 0, 0)
        assert out[2]["scrubbed"] == "host <EMAIL> down"
        assert (out[2]["n_emails"], out[2]["n_ips"], out[2]["n_phones"]) \
            == (1, 0, 0)


class TestPageRank:
    @staticmethod
    def _expected(adj, iterations=5, damping=0.85):
        """Reference power iteration (plain Python) on a symmetric graph."""
        nodes = sorted(adj)
        n = len(nodes)
        pr = {v: 1.0 / n for v in nodes}
        base = (1.0 - damping) / n
        for _ in range(iterations):
            pr = {v: base + damping * sum(pr[u] / len(adj[u])
                                          for u in adj[v])
                  for v in nodes}
        return {v: round(p, 6) for v, p in pr.items()}

    def test_matches_reference_power_iteration(self, spark):
        from saber_spark.operators.graph import pagerank
        edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c")]
        adj = {}
        for s, d in edges:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r["node"]: r["pr"] for r in pagerank(df).collect()}
        assert got == self._expected(adj)
        # symmetric graph: total mass conserved
        assert abs(sum(got.values()) - 1.0) < 1e-4

    def test_star_center_dominates(self, spark):
        from saber_spark.operators.graph import pagerank
        df = spark.createDataFrame(
            [("hub", f"s{i}") for i in range(6)], "src string, dst string")
        got = {r["node"]: r["pr"] for r in pagerank(df).collect()}
        assert got["hub"] == max(got.values())
        leaves = {v for k, v in got.items() if k != "hub"}
        assert len(leaves) == 1  # all leaves identical by symmetry

    def test_checkpointed_equals_lazy(self, spark):
        from saber_spark.operators.graph import pagerank
        df = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")],
            "src string, dst string")
        lazy = {r["node"]: r["pr"] for r in pagerank(df, iterations=6).collect()}
        ckpt = {r["node"]: r["pr"]
                for r in pagerank(df, iterations=6, checkpoint_every=2).collect()}
        assert lazy == ckpt

    def test_empty_graph_returns_empty(self, spark):
        """A shard whose upstream filter yields zero edges must produce an
        empty result, not a ZeroDivisionError at plan-construction time."""
        from saber_spark.operators.graph import pagerank, triangle_count
        empty = spark.createDataFrame([], "src string, dst string")
        assert pagerank(empty).count() == 0
        assert triangle_count(empty).count() == 0

    def test_random_graph_matches_reference(self, spark):
        """Seeded Erdos-Renyi graph: the distributed result must equal the
        plain-Python power iteration node-for-node."""
        from saber_spark.operators.graph import pagerank
        rng = random.Random(29)
        nodes = [f"n{i:02d}" for i in range(24)]
        edges = sorted({(a, b) for a in nodes for b in nodes
                        if a < b and rng.random() < 0.18})
        adj = {}
        for s, d in edges:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r["node"]: r["pr"] for r in pagerank(df).collect()}
        assert got == self._expected(adj)


class TestTriangleCount:
    def test_k4_plus_pendant(self, spark):
        from saber_spark.operators.graph import triangle_count
        k4 = [("a", "b"), ("a", "c"), ("a", "d"),
              ("b", "c"), ("b", "d"), ("c", "d")]
        df = spark.createDataFrame(k4 + [("d", "e")], "src string, dst string")
        got = {r["node"]: r["n_triangles"] for r in triangle_count(df).collect()}
        # K4 has 4 triangles; every K4 node sits in 3; the pendant in 0
        assert got == {"a": 3, "b": 3, "c": 3, "d": 3, "e": 0}

    def test_triangle_free_graph(self, spark):
        from saber_spark.operators.graph import triangle_count
        df = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string")
        got = {r["node"]: r["n_triangles"] for r in triangle_count(df).collect()}
        assert got == {"a": 0, "b": 0, "c": 0, "d": 0}

    def test_random_graph_matches_bruteforce(self, spark):
        """Seeded random graph vs an O(n^3) enumeration — exercises the
        degree-ordering tie-breaks that the crafted fixtures don't."""
        from itertools import combinations
        from saber_spark.operators.graph import triangle_count
        rng = random.Random(41)
        nodes = [f"v{i:02d}" for i in range(18)]
        eset = {(a, b) for a in nodes for b in nodes
                if a < b and rng.random() < 0.3}
        expected = dict.fromkeys(nodes, 0)
        for x, y, z in combinations(nodes, 3):
            if {(x, y), (y, z), (x, z)} <= eset:
                for v in (x, y, z):
                    expected[v] += 1
        df = spark.createDataFrame(sorted(eset), "src string, dst string")
        got = {r["node"]: r["n_triangles"] for r in triangle_count(df).collect()}
        # nodes that appear in no edge are absent from the operator's universe
        touched = {v for e in eset for v in e}
        assert got == {v: c for v, c in expected.items() if v in touched}


class TestPmiWeights:
    def test_counts_and_log_ratio(self, spark):
        import math
        from saber_spark.operators.triples import pmi_weights
        rows = [(1, "A"), (1, "B"), (2, "A"), (2, "B"),
                (3, "A"), (3, "C"), (4, "B")]
        df = spark.createDataFrame(rows, "doc_id long, canonical_id string")
        got = {(r["subj"], r["obj"]): (r["c_ab"], r["pmi"])
               for r in pmi_weights(df).collect()}
        # N=4, c_A=3, c_B=3, c_C=1, c_AB=2, c_AC=1
        assert got == {
            ("A", "B"): (2, round(math.log(2 * 4 / (3 * 3)), 6)),
            ("A", "C"): (1, round(math.log(1 * 4 / (3 * 1)), 6)),
        }

    def test_repeat_mentions_collapse(self, spark):
        """PMI is over document presence, not mention multiplicity."""
        from saber_spark.operators.triples import pmi_weights
        df = spark.createDataFrame(
            [(1, "A"), (1, "A"), (1, "B"), (1, "B"), (2, "A")],
            "doc_id long, canonical_id string")
        got = {(r["subj"], r["obj"]): r["c_ab"]
               for r in pmi_weights(df).collect()}
        assert got == {("A", "B"): 1}


class TestTfidfTopk:
    def test_scores_and_ranking(self, spark):
        import math
        from saber_spark.operators.vocab import tfidf_topk
        # doc 1: common common rare1 ; doc 2: common rare2 rare2
        rows = [(1, 0, "common"), (1, 1, "common"), (1, 2, "rare1"),
                (2, 0, "common"), (2, 1, "rare2"), (2, 2, "rare2")]
        df = spark.createDataFrame(rows, "doc_id long, pos long, token string")
        got = {(r["doc_id"], r["rank"]): (r["token"], r["tf"], r["tfidf"])
               for r in tfidf_topk(df, k=2).collect()}
        ln2 = math.log(2.0)
        # idf(common)=ln(2/2)=0, idf(rare*)=ln(2/1)
        assert got == {
            (1, 1): ("rare1", 1, round(1 * ln2, 6)),
            (1, 2): ("common", 2, 0.0),
            (2, 1): ("rare2", 2, round(2 * ln2, 6)),
            (2, 2): ("common", 1, 0.0),
        }

    def test_tie_broken_by_token(self, spark):
        from saber_spark.operators.vocab import tfidf_topk
        rows = [(1, 0, "zz"), (1, 1, "aa"), (2, 0, "other")]
        df = spark.createDataFrame(rows, "doc_id long, pos long, token string")
        got = [(r["rank"], r["token"])
               for r in tfidf_topk(df, k=2).filter("doc_id = 1").collect()]
        assert sorted(got) == [(1, "aa"), (2, "zz")]


class TestCrossdocNgramDup:
    def test_shared_and_unique_trigrams(self, spark):
        from saber_spark.operators.dedup import crossdoc_ngram_dup
        # docs 1 and 2 share the trigram "a b c"; doc 3 is disjoint;
        # doc 4 is too short to form any trigram
        df = spark.createDataFrame(
            [(1, "a b c d"), (2, "z a b c"), (3, "p q r s"), (4, "x y")],
            "doc_id long, text string")
        got = {r["doc_id"]: (r["n_grams"], r["n_dup_grams"], r["dup_frac"])
               for r in crossdoc_ngram_dup(df).collect()}
        # doc 1 grams: {a b c, b c d}; doc 2: {z a b, a b c}; one dup each
        assert got == {1: (2, 1, 0.5), 2: (2, 1, 0.5),
                       3: (2, 0, 0.0), 4: (0, 0, 0.0)}

    def test_min_df_threshold(self, spark):
        from saber_spark.operators.dedup import crossdoc_ngram_dup
        df = spark.createDataFrame(
            [(i, "a b c") for i in range(3)], "doc_id long, text string")
        strict = {r["doc_id"]: r["n_dup_grams"]
                  for r in crossdoc_ngram_dup(df, min_df=4).collect()}
        assert strict == {0: 0, 1: 0, 2: 0}   # df=3 < 4
        loose = {r["doc_id"]: r["n_dup_grams"]
                 for r in crossdoc_ngram_dup(df, min_df=3).collect()}
        assert loose == {0: 1, 1: 1, 2: 1}


class TestReshape:
    def test_pivot_roundtrip(self, spark):
        from saber_spark.operators.reshape import pivot_counts, unpivot_counts
        df = spark.createDataFrame(
            [(1, "a"), (1, "a"), (1, "b"), (2, "b"), (3, "c")],
            "uid long, kind string")
        wide = pivot_counts(df, "uid", "kind", ["a", "b", "c"])
        got = {r["uid"]: (r["n_a"], r["n_b"], r["n_c"])
               for r in wide.collect()}
        # empty cells are 0, not null
        assert got == {1: (2, 1, 0), 2: (0, 1, 0), 3: (0, 0, 1)}
        # unpivot inverts back to long (id, key, n)
        long = unpivot_counts(wide, "uid", ["n_a", "n_b", "n_c"])
        back = {(r["uid"], r["key"]): r["n"] for r in long.collect()}
        assert back[(1, "n_a")] == 2 and back[(2, "n_c")] == 0
        assert len(back) == 9

    def test_pivot_ignores_unlisted_values(self, spark):
        from saber_spark.operators.reshape import pivot_counts
        df = spark.createDataFrame(
            [(1, "a"), (1, "weird")], "uid long, kind string")
        row = pivot_counts(df, "uid", "kind", ["a"]).collect()[0]
        assert (row["n_a"],) == (1,)  # 'weird' simply absent from schema


class TestQuantileBuckets:
    def test_quartiles_and_boundary_rule(self, spark):
        from saber_spark.operators.splits import quantile_buckets
        # scores 1..8 in one group: quartile bounds 2.75 / 4.5 / 6.25
        df = spark.createDataFrame(
            [(i, "g", float(i)) for i in range(1, 9)],
            "id long, grp string, score double")
        got = {r["id"]: r["bucket"] for r in quantile_buckets(
            df, "score", "grp").collect()}
        assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 3, 6: 3, 7: 4, 8: 4}

    def test_groups_bucketed_independently(self, spark):
        from saber_spark.operators.splits import quantile_buckets
        rows = [(i, "lo", float(i)) for i in range(4)] + \
               [(10 + i, "hi", 1000.0 + i) for i in range(4)]
        df = spark.createDataFrame(rows, "id long, grp string, score double")
        got = {r["id"]: r["bucket"] for r in quantile_buckets(
            df, "score", "grp").collect()}
        # each group spans all four buckets despite disjoint score ranges
        assert {got[i] for i in range(4)} == {1, 2, 3, 4}
        assert {got[10 + i] for i in range(4)} == {1, 2, 3, 4}

    def test_null_group_kept_null_score_unbucketed(self, spark):
        """NULL group is its own group (no silent row drop); NULL scores
        and all-NULL groups get bucket NULL."""
        from saber_spark.operators.splits import quantile_buckets
        rows = [(1, "g", 1.0), (2, "g", 2.0), (3, "g", 3.0), (4, "g", 4.0),
                (5, "g", None),        # NULL score in a scored group
                (6, None, 1.0), (7, None, 9.0),   # NULL group, scored
                (8, "empty", None)]    # group with no non-null scores
        df = spark.createDataFrame(rows, "id long, grp string, score double")
        out = quantile_buckets(df, "score", "grp").collect()
        assert len(out) == len(rows)   # nothing dropped
        got = {r["id"]: r["bucket"] for r in out}
        assert got[1] == 1 and got[4] == 4
        assert got[5] is None and got[8] is None
        assert got[6] == 1 and got[7] == 4   # NULL group bucketed normally


class TestJsonPropsAgg:
    DIRTY = [
        (1, "click", '{"k": 69}'),        # clean integer
        (2, "click", '{"k": "5"}'),       # quoted numeric -> NULL (typed)
        (3, "click", '{"k": 3.7}'),       # non-integer -> NULL
        (4, "error", "not json"),         # malformed -> NULL
        (5, "error", '{"other": 1}'),     # missing key -> NULL
        (6, "error", None),               # NULL props -> NULL
        (7, "error", '{"k": -12}'),       # clean negative
    ]

    def test_spark_semantics_on_dirty_props(self, spark):
        import __spark_entry__ as e
        df = spark.createDataFrame(
            self.DIRTY, "event_id long, event_type string, props string")
        got = {r["event_type"]: (r["n_events"], r["sum_k"], r["min_k"],
                                 r["max_k"])
               for r in e.json_props_agg(df).collect()}
        assert got == {"click": (3, 69, 69, 69),
                       "error": (4, -12, -12, -12)}

    def test_oracle_matches_spark_on_dirty_props(self, spark):
        """The DuckDB oracle's json_valid+json_type guard must replicate
        from_json's null-on-anything-unclean semantics row for row."""
        import duckdb
        import pandas as pd
        import __spark_entry__ as e
        events = pd.DataFrame(self.DIRTY,
                              columns=["event_id", "event_type", "props"])
        con = duckdb.connect()
        con.register("events", events)
        oracle = (con.sql(e.oracle_sql()["json_extract_agg"]).fetchdf()
                  .sort_values("event_type").reset_index(drop=True))
        df = spark.createDataFrame(
            self.DIRTY, "event_id long, event_type string, props string")
        mine = (e.json_props_agg(df).toPandas()
                .sort_values("event_type").reset_index(drop=True))
        assert oracle.to_dict("records") == mine.to_dict("records")


class TestWeightedPageRank:
    def test_uniform_weights_equal_unweighted(self, spark):
        from saber_spark.operators.graph import pagerank
        edges = [("a", "b", 3), ("b", "c", 3), ("c", "a", 3), ("c", "d", 3)]
        wdf = spark.createDataFrame(edges, "src string, dst string, n long")
        udf_ = wdf.select("src", "dst")
        unweighted = {r["node"]: r["pr"] for r in pagerank(udf_).collect()}
        uniform = {r["node"]: r["pr"]
                   for r in pagerank(wdf, weight_col="n").collect()}
        assert uniform == unweighted  # constant weights cancel exactly

    def test_heavy_edge_pulls_mass(self, spark):
        from saber_spark.operators.graph import pagerank
        # star a-b, a-c; b-side edge 100x heavier
        df = spark.createDataFrame(
            [("a", "b", 100), ("a", "c", 1)], "src string, dst string, n long")
        got = {r["node"]: r["pr"]
               for r in pagerank(df, weight_col="n").collect()}
        assert got["b"] > got["c"]
        unweighted = {r["node"]: r["pr"]
                      for r in pagerank(df.select("src", "dst")).collect()}
        assert unweighted["b"] == unweighted["c"]  # topology alone is symmetric

    def test_parallel_edges_summed(self, spark):
        from saber_spark.operators.graph import pagerank
        dup = spark.createDataFrame(
            [("a", "b", 2), ("a", "b", 3), ("a", "c", 5)],
            "src string, dst string, n long")
        merged = spark.createDataFrame(
            [("a", "b", 5), ("a", "c", 5)], "src string, dst string, n long")
        got_dup = {r["node"]: r["pr"]
                   for r in pagerank(dup, weight_col="n").collect()}
        got_merged = {r["node"]: r["pr"]
                      for r in pagerank(merged, weight_col="n").collect()}
        assert got_dup == got_merged

    def test_self_loop_uniform_equals_unweighted(self, spark):
        """The two-direction union must not double self-loop weight —
        uniform weights stay equivalent to the classic distinct() path."""
        from saber_spark.operators.graph import pagerank
        wdf = spark.createDataFrame(
            [("a", "a", 1), ("a", "b", 1)], "src string, dst string, n long")
        weighted = {r["node"]: r["pr"]
                    for r in pagerank(wdf, weight_col="n").collect()}
        plain = {r["node"]: r["pr"]
                 for r in pagerank(wdf.select("src", "dst")).collect()}
        assert weighted == plain

    def test_invalid_weights_raise(self, spark):
        from saber_spark.operators.graph import pagerank
        null_w = spark.createDataFrame(
            [("a", "b", None), ("a", "c", 1)], "src string, dst string, n long")
        with pytest.raises(ValueError, match="NULL or non-positive"):
            pagerank(null_w, weight_col="n")
        zero_w = spark.createDataFrame(
            [("a", "b", 0), ("a", "c", 1)], "src string, dst string, n long")
        with pytest.raises(ValueError, match="NULL or non-positive"):
            pagerank(zero_w, weight_col="n")


class TestGraphExport:
    def test_edgelist_roundtrip(self, spark, tmp_path):
        from saber_spark.sources.graph_export import write_edgelist
        edges = spark.createDataFrame(
            [("x", "y", 3), ("y", "z", 1)],
            "subj string, obj string, n_occurrences long")
        out = str(tmp_path / "el")
        write_edgelist(edges, out)
        lines = {tuple(r["value"].split("\t"))
                 for r in spark.read.text(out).collect()}
        assert lines == {("x", "y", "3"), ("y", "z", "1")}

    def test_graphml_structure_and_bound(self, spark):
        import xml.etree.ElementTree as ET
        from saber_spark.sources.graph_export import GRAPHML_NS, to_graphml
        nodes = spark.createDataFrame(
            [("x", "PRGE"), ("y", "DISO")], "canonical_id string, label string")
        edges = spark.createDataFrame(
            [("x", "y", 7)], "subj string, obj string, n_occurrences long")
        xml = to_graphml(nodes, edges)
        root = ET.fromstring(xml)
        ns = {"g": GRAPHML_NS}
        assert len(root.findall(".//g:node", ns)) == 2
        e = root.findall(".//g:edge", ns)
        assert len(e) == 1 and e[0].get("source") == "x"
        assert root.findall(".//g:edge/g:data", ns)[0].text == "7"
        with pytest.raises(ValueError, match="nodes"):
            to_graphml(nodes, edges, max_nodes=1)
        with pytest.raises(ValueError, match="edges"):
            to_graphml(nodes, edges, max_edges=0)

    def test_graphml_types_and_nulls(self, spark):
        """Weight attr.type follows the column's Spark type; NULL attrs
        and weights are omitted, never serialized as the string 'None'."""
        import xml.etree.ElementTree as ET
        from saber_spark.sources.graph_export import GRAPHML_NS, to_graphml
        nodes = spark.createDataFrame(
            [("x", "PRGE"), ("y", None)], "canonical_id string, label string")
        edges = spark.createDataFrame(
            [("x", "y", 0.4305), ("x", "x", None)],
            "subj string, obj string, pmi double")
        xml = to_graphml(nodes, edges, weight="pmi")
        assert "None" not in xml
        root = ET.fromstring(xml)
        ns = {"g": GRAPHML_NS}
        wkey = [k for k in root.findall("g:key", ns) if k.get("id") == "w"][0]
        assert wkey.get("attr.type") == "double"
        # node y has no label data element; edge x-x has no weight element
        ys = [n for n in root.findall(".//g:node", ns) if n.get("id") == "y"]
        assert ys and len(ys[0]) == 0

    def test_edgelist_rejects_nulls_and_delimiter(self, spark):
        from saber_spark.sources.graph_export import write_edgelist
        bad_null = spark.createDataFrame(
            [("x", None, 3)], "subj string, obj string, n_occurrences long")
        with pytest.raises(ValueError, match="NULL"):
            write_edgelist(bad_null, "/tmp/_el_never")
        bad_delim = spark.createDataFrame(
            [("x\ty", "z", 3)], "subj string, obj string, n_occurrences long")
        with pytest.raises(ValueError, match="delimiter"):
            write_edgelist(bad_delim, "/tmp/_el_never")


class TestProfileTable:
    def test_nulls_distinct_minmax(self, spark):
        from saber_spark.operators.profile import profile_table
        df = spark.createDataFrame(
            [(1, "a"), (2, None), (3, "a"), (4, "b")],
            "id long, tag string")
        out = {r["column_name"]: r
               for r in profile_table(df, ["id", "tag"]).collect()}
        assert out["id"]["n_rows"] == 4 and out["id"]["n_nonnull"] == 4
        assert out["id"]["n_distinct"] == 4
        assert out["tag"]["n_nonnull"] == 3
        assert out["tag"]["n_distinct"] == 2
        assert out["tag"]["min_value"] == "a"
        assert out["tag"]["max_value"] == "b"
        # string comparison semantics by design: "10" < "4" lexicographically
        assert out["id"]["min_value"] == "1" and out["id"]["max_value"] == "4"

    def test_approx_mode_runs(self, spark):
        from saber_spark.operators.profile import profile_table
        df = spark.range(100).withColumnRenamed("id", "x")
        r = profile_table(df, ["x"], exact_distinct=False).collect()[0]
        assert r["n_rows"] == 100 and 90 <= r["n_distinct"] <= 110


class TestDictNgramMentions:
    def test_longest_match_suppresses_contained_unigrams(self, spark):
        """'table' inside 'fast table' is consumed by the longer match
        (greedy longest-match parity with the tagger's n-gram scan);
        free-standing 'table' and 'spark' still fire."""
        from saber_spark.fixtures.dictionary import grounding_dict_df
        from saber_spark.operators.linking import dict_ngram_mentions
        from saber_spark.operators.vocab import tokenize_docs

        docs = spark.createDataFrame(
            [(1, "fast table big data table spark runs")],
            "doc_id long, text string")
        out = dict_ngram_mentions(tokenize_docs(docs),
                                  grounding_dict_df(spark))
        got = sorted((r["start_pos"], r["n_tokens"], r["surface"],
                      r["label"]) for r in out.collect())
        assert got == [
            (0, 2, "fast table", "CHED"),
            (2, 2, "big data", "PRGE"),
            (4, 1, "table", "PRGE"),
            (5, 1, "spark", "PRGE"),
        ]

    def test_multi_xref_surface_emits_once(self, spark):
        """'spark' has two xref rows in the dictionary (same canonical) —
        the distinct on (surface, label, canonical_id) keeps the match 1:1."""
        from saber_spark.fixtures.dictionary import grounding_dict_df
        from saber_spark.operators.linking import dict_ngram_mentions
        from saber_spark.operators.vocab import tokenize_docs

        docs = spark.createDataFrame([(7, "spark")],
                                     "doc_id long, text string")
        out = dict_ngram_mentions(tokenize_docs(docs),
                                  grounding_dict_df(spark)).collect()
        assert len(out) == 1
        assert out[0]["canonical_id"] == "PRGE:spark"


class TestSplitSentences:
    def test_parity_with_kernel_sentence_spans(self, spark):
        """The relational splitter reproduces kernels.text.sentence_spans
        text slices exactly (same boundary rule, lookbehind-free form)."""
        from saber_spark.kernels.text import sentence_spans
        from saber_spark.operators.vocab import split_sentences

        texts = [
            "One sentence. Two! Three? Four",
            "No boundary here",
            "Trailing punct. ",
            "Multi  spaces.   Next.\nNewline! End.",
            "",
        ]
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string")
        got: dict[int, list[tuple[int, str]]] = {}
        for r in split_sentences(docs).collect():
            got.setdefault(r["doc_id"], []).append(
                (r["sent_idx"], r["sentence"]))
        for i, t in enumerate(texts):
            expected = [t[s:e] for s, e in sentence_spans(t)]
            sents = [s for _, s in sorted(got.get(i, []))]
            assert sents == expected, f"doc {i}: {sents} != {expected}"

    def test_null_text_yields_no_rows(self, spark):
        from saber_spark.operators.vocab import split_sentences
        docs = spark.createDataFrame([(1, None)],
                                     "doc_id long, text string")
        assert split_sentences(docs).count() == 0


class TestQualityFilter:
    def test_reasons_and_keep(self, spark):
        from saber_spark.operators.textstats import quality_filter
        stops = ["the", "of", "and", "to", "in", "is"]
        good = " ".join(f"word{i} {stops[i % 6]}" for i in range(60))
        docs = spark.createDataFrame(
            [(1, good),                       # passes everything
             (2, "spam " * 50),               # repetition (one bigram dominates)
             (3, "zz qq ww ee rr")],          # short + no stopwords
            "doc_id long, text string")
        out = {r["doc_id"]: r for r in quality_filter(docs).collect()}
        assert out[1]["keep"] and out[1]["n_failed"] == 0
        assert out[1]["reasons"] == ""
        assert not out[2]["keep"]
        assert "repetition" in out[2]["reasons"]
        assert not out[3]["keep"]
        assert out[3]["n_failed"] >= 2  # lang + low_quality at least
        # fixed reason order: lang before low_quality before repetition
        assert out[3]["reasons"].split(",")[0] == "lang"

    def test_reason_order_is_fixed(self, spark):
        from saber_spark.operators.textstats import quality_filter
        docs = spark.createDataFrame([(1, "x y")],
                                     "doc_id long, text string")
        r = quality_filter(docs).collect()[0]
        names = r["reasons"].split(",")
        assert names == sorted(
            names, key=["lang", "low_quality", "repetition"].index)


class TestProximityTriples:
    def test_window_and_ordering(self, spark):
        from saber_spark.operators.triples import proximity_triples
        # E1@0, E2@5, E3@20: (E1,E2) within k=10; (E2,E3) gap 15 > 10
        m = spark.createDataFrame(
            [(1, 0, "B"), (1, 5, "A"), (1, 20, "C"),
             (2, 3, "A"), (2, 4, "B")],
            "doc_id long, pos long, canonical_id string")
        out = {(r["subj"], r["obj"]): r
               for r in proximity_triples(m, k=10).collect()}
        assert set(out) == {("A", "B")}  # least/greatest canonical order
        assert out[("A", "B")]["n_cooccur"] == 2
        assert out[("A", "B")]["n_docs"] == 2
        assert out[("A", "B")]["pred"] == "near_10"

    def test_same_entity_and_same_pos_excluded(self, spark):
        from saber_spark.operators.triples import proximity_triples
        m = spark.createDataFrame(
            [(1, 0, "A"), (1, 1, "A"),      # same entity -> no pair
             (2, 7, "A"), (2, 7, "B")],     # same position -> no pair
            "doc_id long, pos long, canonical_id string")
        assert proximity_triples(m, k=10).count() == 0


class TestDegreeHistogram:
    def test_distinct_neighbors_and_parallel_edges(self, spark):
        from saber_spark.operators.graph import degree_histogram
        # path a-b-c plus a parallel duplicate of a-b (must not double)
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "a"), ("b", "c")], "src string, dst string")
        out = {r["degree"]: r["n_entities"]
               for r in degree_histogram(edges).collect()}
        assert out == {1: 2, 2: 1}  # a,c degree 1; b degree 2


class TestFuzzyLink:
    def test_typo_links_to_nearest_surface(self, spark):
        from saber_spark.fixtures.dictionary import grounding_dict_df
        from saber_spark.operators.linking import fuzzy_link
        from saber_spark.operators.vocab import tokenize_docs
        docs = spark.createDataFrame(
            [(1, "spak runs on tble with merge")],  # spak->spark, tble->table
            "doc_id long, text string")
        out = {r["token"]: r for r in
               fuzzy_link(tokenize_docs(docs),
                          grounding_dict_df(spark)).collect()}
        assert out["spak"]["surface"] == "spark"
        assert out["spak"]["n_edits"] == 1
        assert out["tble"]["surface"] == "table"
        assert out["merge"]["n_edits"] == 0  # exact still wins trivially
        assert "runs" not in out and "on" not in out  # beyond max_edits

    def test_exact_beats_edit1_and_ties_break_lexicographically(self, spark):
        from saber_spark.operators.linking import fuzzy_link
        # dictionary with two surfaces both 1 edit from 'cot': 'cat' < 'cut'
        d = spark.createDataFrame(
            [("cat", "X", "X:cat"), ("cut", "X", "X:cut")],
            "surface string, label string, canonical_id string")
        toks = spark.createDataFrame(
            [(1, 0, "cot"), (1, 1, "cat")], "doc_id long, pos long, token string")
        out = {r["token"]: r for r in fuzzy_link(toks, d).collect()}
        assert out["cot"]["surface"] == "cat"   # lexicographic tie-break
        assert out["cat"]["n_edits"] == 0       # exact match preferred


class TestQualityFilterNullText:
    def test_null_text_fails_all_rules_and_matches_oracle(self, spark, tmp_path):
        """NULL text must fail lang+quality+repetition (not silently pass
        via NULL verdicts), and the DuckDB oracle must agree byte-for-byte
        on a corpus CONTAINING NULLs (the driver corpus has none, so this
        parity is pytest-guarded)."""
        import duckdb

        import __spark_entry__ as e
        from saber_spark.operators.textstats import quality_filter

        stops = ["the", "of", "and", "to", "in", "is"]
        good = " ".join(f"word{i} {stops[i % 6]}" for i in range(60))
        rows = [(1, good, "en", "src0", len(good)), (2, None, "en", "src0", 0)]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, "
                  "n_chars long")
        out = {r["doc_id"]: r for r in quality_filter(docs).collect()}
        assert out[1]["keep"] and out[1]["n_failed"] == 0
        assert not out[2]["keep"]
        assert out[2]["n_failed"] == 3
        assert out[2]["reasons"] == "lang,low_quality,repetition"

        # cross-engine parity on the NULL-bearing corpus
        pq = str(tmp_path / "docs_null.parquet")
        docs.coalesce(1).write.parquet(pq)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{pq}/*.parquet')")
        o = {int(r[0]): r for r in
             con.sql(e.oracle_sql()["quality_filter"]).fetchall()}
        for i in (1, 2):
            s = out[i]
            assert (bool(s["keep"]), int(s["n_failed"]), s["reasons"]) == \
                (bool(o[i][1]), int(o[i][2]), o[i][3])


class TestQualityFamilyConsistency:
    def test_filter_verdicts_tie_to_score_and_lang_id(self, spark):
        """quality_filter's rule bits must equal the standalone operators'
        outputs (shared expression builders — this test pins them together
        so a formula change cannot desynchronize the family)."""
        from saber_spark.operators.textstats import (gopher_quality, lang_id,
                                                     quality_filter,
                                                     quality_score)
        stops = ["the", "of", "and", "to", "in", "is"]
        rows = [(1, " ".join(f"w{i} {stops[i % 6]}" for i in range(60))),
                (2, "zz qq"), (3, "spam " * 60),
                (4, "the of and to in is " * 12)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        filt = {r["doc_id"]: r for r in quality_filter(docs).collect()}
        score = {r["doc_id"]: r["quality"]
                 for r in quality_score(docs).collect()}
        lang = {r["doc_id"]: r["pred_lang"] for r in lang_id(docs).collect()}
        gopher = {r["doc_id"]: r["keep"]
                  for r in gopher_quality(docs).collect()}
        for i in filt:
            reasons = filt[i]["reasons"].split(",") if filt[i]["reasons"] \
                else []
            assert ("low_quality" in reasons) == (score[i] < 0.5), i
            assert ("lang" in reasons) == (lang[i] != "en"), i
            assert ("repetition" in reasons) == (not gopher[i]), i


class TestDictMentionsRandomizedParity:
    def test_matches_bruteforce_longest_match(self, spark):
        """Randomized token streams + a dictionary with 1/2/3-token
        surfaces (incl. a multi-entry surface) vs a brute-force
        longest-match reference: a match survives iff NO strictly longer
        match contains its whole span. Exercises the general windowed
        containment frame (max_len=3), not just the oracle's bigram case."""
        import random

        from saber_spark.operators.linking import dict_ngram_mentions

        rng = random.Random(1234)
        vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
        dict_rows = [
            ("aa", "X", "X:aa"), ("aa", "Y", "Y:aa"),  # multi-entry surface
            ("cc", "X", "X:cc"),
            ("aa bb", "X", "X:aabb"), ("cc dd", "Y", "Y:ccdd"),
            ("aa bb cc", "Z", "Z:aabbcc"), ("bb cc dd", "Z", "Z:bbccdd"),
        ]
        by_surface = {}
        for s, l, c in dict_rows:
            by_surface.setdefault(s, []).append((l, c))
        max_len = 3

        docs = {d: [rng.choice(vocab) for _ in range(rng.randint(0, 25))]
                for d in range(40)}

        expected = []
        for d, toks in docs.items():
            matches = []
            for p in range(len(toks)):
                for n in range(1, max_len + 1):
                    if p + n <= len(toks):
                        s = " ".join(toks[p:p + n])
                        if s in by_surface:
                            matches.append((p, n, s))
            L = {}
            for p, n, s in matches:
                L[p] = max(L.get(p, 0), n)
            for p, n, s in matches:
                contained = any(
                    q <= p and L.get(q, 0) > n and q + L.get(q, 0) >= p + n
                    for q in range(max(0, p - max_len + 1), p + 1))
                if not contained:
                    for lab, can in by_surface[s]:
                        expected.append((d, p, n, s, lab, can))

        tok_rows = [(d, p, t) for d, toks in docs.items()
                    for p, t in enumerate(toks)]
        tokens = spark.createDataFrame(
            tok_rows, "doc_id long, pos long, token string")
        dictionary = spark.createDataFrame(
            dict_rows, "surface string, label string, canonical_id string")
        got = sorted(
            (r["doc_id"], r["start_pos"], r["n_tokens"], r["surface"],
             r["label"], r["canonical_id"])
            for r in dict_ngram_mentions(tokens, dictionary,
                                         max_len=max_len).collect())
        assert got == sorted(expected)
        assert len(got) > 20  # the random corpus actually exercised it


class TestProximityTriplesRandomizedParity:
    def test_matches_bruteforce_window_pairs(self, spark):
        import random

        from saber_spark.operators.triples import proximity_triples

        rng = random.Random(99)
        ents = ["E1", "E2", "E3", "E4"]
        k = 7
        rows = []
        for d in range(30):
            used = set()
            for _ in range(rng.randint(0, 12)):
                p = rng.randint(0, 40)
                if p in used:
                    continue
                used.add(p)
                rows.append((d, p, rng.choice(ents)))

        expected = {}
        by_doc = {}
        for d, p, c in rows:
            by_doc.setdefault(d, []).append((p, c))
        for d, ms in by_doc.items():
            ms.sort()
            for i in range(len(ms)):
                for j in range(i + 1, len(ms)):
                    pa, ca = ms[i]
                    pb, cb = ms[j]
                    if pb - pa <= k and pb != pa and ca != cb:
                        key = (min(ca, cb), max(ca, cb))
                        cnt, dset = expected.get(key, (0, set()))
                        dset.add(d)
                        expected[key] = (cnt + 1, dset)

        m = spark.createDataFrame(
            rows, "doc_id long, pos long, canonical_id string")
        got = {(r["subj"], r["obj"]): (r["n_cooccur"], r["n_docs"])
               for r in proximity_triples(m, k=k).collect()}
        assert got == {key: (c, len(ds))
                       for key, (c, ds) in expected.items()}
        assert len(got) >= 3


class TestEventTransitions:
    def test_hand_computed_counts_and_probabilities(self, spark):
        import datetime as dt
        from saber_spark.operators.sessions import event_transitions
        t = dt.datetime(2024, 1, 1)
        rows = [
            # u1: view -> click -> view
            (1, 1, "view", t), (2, 1, "click", t.replace(hour=1)),
            (3, 1, "view", t.replace(hour=2)),
            # u2: view -> purchase; cross-user boundary adds NO transition
            (4, 2, "view", t), (5, 2, "purchase", t.replace(hour=3)),
        ]
        out = {(r["from_type"], r["to_type"]): r for r in event_transitions(
            spark.createDataFrame(
                rows, "event_id long, user_id long, event_type string, "
                      "ts timestamp_ntz")).collect()}
        assert out[("view", "click")]["n_transitions"] == 1
        assert out[("view", "purchase")]["n_transitions"] == 1
        assert out[("click", "view")]["n_transitions"] == 1
        assert out[("view", "click")]["p"] == 0.5
        assert out[("click", "view")]["p"] == 1.0
        assert ("purchase", "view") not in out  # last events emit nothing

    def test_same_timestamp_orders_by_tiebreak(self, spark):
        import datetime as dt
        from saber_spark.operators.sessions import event_transitions
        t = dt.datetime(2024, 1, 1)
        rows = [(2, 1, "b", t), (1, 1, "a", t)]  # same ts; event_id orders
        out = event_transitions(spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, "
                  "ts timestamp_ntz")).collect()
        assert [(r["from_type"], r["to_type"]) for r in out] == [("a", "b")]


class TestNewOperatorsEmptyInputs:
    def test_dict_mentions_fuzzy_proximity_on_empty_and_trivial(self, spark):
        from saber_spark.fixtures.dictionary import grounding_dict_df
        from saber_spark.operators.linking import (dict_ngram_mentions,
                                                   fuzzy_link)
        from saber_spark.operators.triples import proximity_triples
        d = grounding_dict_df(spark)
        empty_toks = spark.createDataFrame(
            [], "doc_id long, pos long, token string")
        assert dict_ngram_mentions(empty_toks, d).count() == 0
        assert fuzzy_link(empty_toks, d).count() == 0
        empty_m = spark.createDataFrame(
            [], "doc_id long, pos long, canonical_id string")
        assert proximity_triples(empty_m).count() == 0
        # single-token doc: no bigram window partner, unigram still fires
        one = spark.createDataFrame([(1, 0, "spark")],
                                    "doc_id long, pos long, token string")
        assert dict_ngram_mentions(one, d).count() == 1

    def test_event_transitions_single_event_user(self, spark):
        import datetime as dt
        from saber_spark.operators.sessions import event_transitions
        one = spark.createDataFrame(
            [(1, 1, "view", dt.datetime(2024, 1, 1))],
            "event_id long, user_id long, event_type string, ts timestamp_ntz")
        assert event_transitions(one).count() == 0
        empty = spark.createDataFrame(
            [], "event_id long, user_id long, event_type string, ts timestamp_ntz")
        assert event_transitions(empty).count() == 0


class TestCentroidClassifier:
    def test_separable_clusters_classified_perfectly(self, spark):
        """Three well-separated Gaussian-ish clusters -> the held-out
        confusion matrix is purely diagonal."""
        import random
        rng = random.Random(7)
        centers = {0: [1.0, 0.0, 0.0, 0.0], 1: [0.0, 1.0, 0.0, 0.0],
                   2: [0.0, 0.0, 1.0, 0.0]}
        rows = []
        for i in range(300):
            lab = i % 3
            vec = [c + rng.uniform(-0.05, 0.05) for c in centers[lab]]
            rows.append((i, vec, lab))
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int")
        from saber_spark.operators.classify import centroid_confusion
        conf = centroid_confusion(emb).collect()
        assert len(conf) == 3
        assert all(r["true_label"] == r["pred_label"] for r in conf)
        assert sum(r["n_vecs"] for r in conf) > 0

    def test_fit_predict_roundtrip_and_tiebreak(self, spark):
        """A vector equidistant from two centroids predicts the SMALLER
        label (deterministic tie-break)."""
        from saber_spark.operators.classify import (centroid_fit,
                                                    centroid_predict)
        train = spark.createDataFrame(
            [(1, [1.0, 0.0], 5), (2, [0.0, 1.0], 3)],
            "vec_id long, embedding array<float>, label int")
        cents = centroid_fit(train)
        probe = spark.createDataFrame(
            [(99, [1.0, 1.0])], "vec_id long, embedding array<float>")
        out = centroid_predict(probe, cents).collect()
        assert len(out) == 1
        assert out[0]["pred_label"] == 3  # equal cosine -> smaller label


class TestLineDedup:
    """Cross-doc line-level boilerplate removal (dedup.py::line_dedup)."""

    def _run(self, spark, rows, **kw):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        from saber_spark.operators.dedup import line_dedup
        return {r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_removed"])
                for r in line_dedup(df, **kw).collect()}

    def test_shared_lines_removed_order_preserved(self, spark):
        out = self._run(spark, [
            (1, "unique one\ncookie banner\nunique two"),
            (2, "cookie banner\nother text"),
        ])
        assert out[1] == ("unique one\nunique two", 3, 1)
        assert out[2] == ("other text", 2, 1)

    def test_fully_boilerplate_doc_survives_empty(self, spark):
        out = self._run(spark, [
            (1, "footer"), (2, "footer"), (3, "footer\nreal content"),
        ])
        assert out[1] == ("", 1, 1)
        assert out[2] == ("", 1, 1)
        assert out[3] == ("real content", 2, 1)

    def test_within_doc_repeats_do_not_count_as_cross_doc(self, spark):
        # "echo" twice in ONE doc: distinct-doc count is 1 < min_docs -> kept
        out = self._run(spark, [(1, "echo\nmid\necho"), (2, "solo")])
        assert out[1] == ("echo\nmid\necho", 3, 0)
        assert out[2] == ("solo", 1, 0)

    def test_min_docs_threshold(self, spark):
        rows = [(1, "dup\na"), (2, "dup\nb"), (3, "dup\nc")]
        assert self._run(spark, rows, min_docs=4)[1] == ("dup\na", 2, 0)
        assert self._run(spark, rows, min_docs=3)[1] == ("a", 2, 1)
