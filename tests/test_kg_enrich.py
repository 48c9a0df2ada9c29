"""Tests for the round-4 KG-enrichment operators: bigram-LM scoring,
context-coherence disambiguation, label propagation, ontology closure +
rollup, and crawl-frontier prioritization."""

import math

import pytest
from pyspark.sql import functions as F

from saber_spark.operators.graph import label_propagation
from saber_spark.operators.linking import disambiguate_link
from saber_spark.operators.lm import (
    bigram_model, doc_bigrams, lm_cross_entropy, train_split)
from saber_spark.operators.ontology import transitive_closure, type_rollup
from saber_spark.operators.webstats import crawl_frontier

WORD = "[A-Za-z0-9]+"


class TestBigramLM:
    def test_doc_bigrams_narrow(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b c"), (2, "solo"), (3, None), (4, "x y")],
            "doc_id long, text string")
        rows = {(r.doc_id, r.w1, r.w2)
                for r in doc_bigrams(docs, WORD).collect()}
        assert rows == {(1, "a", "b"), (1, "b", "c"), (4, "x", "y")}

    def test_train_split_is_deterministic(self, spark):
        docs = spark.createDataFrame([(i, "a b") for i in range(20)],
                                     "doc_id long, text string")
        bg = train_split(doc_bigrams(docs, WORD))
        parts = {r.doc_id: r.part for r in bg.collect()}
        again = {r.doc_id: r.part
                 for r in train_split(doc_bigrams(docs, WORD)).collect()}
        assert parts == again
        assert set(parts.values()) == {0, 1}

    def test_model_counts(self, spark):
        bg = spark.createDataFrame(
            [(1, "a", "b"), (2, "a", "b"), (3, "a", "c"), (4, "b", "a")],
            "doc_id long, w1 string, w2 string")
        c12, c1, vocab = bigram_model(bg)
        assert {(r.w1, r.w2): r.c12 for r in c12.collect()} == {
            ("a", "b"): 2, ("a", "c"): 1, ("b", "a"): 1}
        assert {r.w1: r.c1 for r in c1.collect()} == {"a": 3, "b": 1}
        assert vocab.collect()[0].v == 3  # {a, b, c}

    def test_xent_separates_in_domain_from_garbage(self, spark):
        # doc_ids chosen so the repeated phrase lands in BOTH halves:
        # train teaches "the quick brown fox"; the scored twin must get a
        # lower cross-entropy than a never-seen token salad.
        phrase = "the quick brown fox jumps over the lazy dog " * 3
        garbage = "zq qx xv vz qz zx vq xq zv vx qv xz " * 3
        rows = [(i, phrase) for i in range(40)] + [(97, garbage)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r.doc_id: r.xent
               for r in lm_cross_entropy(docs, WORD).collect()}
        scored_phrase = [x for d, x in out.items() if d != 97]
        assert scored_phrase, "hash split left no phrase doc in part 0"
        assert 97 in out, "garbage doc not in scoring half"
        assert max(scored_phrase) < out[97]

    def test_every_bigram_gets_finite_logprob(self, spark):
        # scoring half contains tokens the model never saw
        docs = spark.createDataFrame(
            [(0, "never seen words here"), (1, "a b c d"), (3, "a b c d")],
            "doc_id long, text string")
        out = lm_cross_entropy(docs, WORD).collect()
        assert all(math.isfinite(r.xent) for r in out)


class TestDisambiguateLink:
    def _dict(self, spark):
        return spark.createDataFrame(
            [("apple", "ORG", "ORG:apple"), ("apple", "FOOD", "FOOD:apple"),
             ("iphone", "PROD", "PROD:iphone"), ("pie", "FOOD", "FOOD:pie")],
            "surface string, label string, canonical_id string")

    def _tokens(self, rows, spark):
        return spark.createDataFrame(rows, "doc_id long, pos long, token string")

    def test_coherence_picks_cooccurring_sense(self, spark):
        # docs 1..3 establish that ORG:apple's context (iphone) and
        # FOOD:apple's context (pie) — via the SURE mentions only
        rows = [
            # doc 1+2: iphone and pie co-occur never; build signal docs
            (1, 0, "iphone"), (1, 1, "apple"),
            (2, 0, "pie"), (2, 1, "apple"),
            # doc 3: sure context iphone + pie together -> ties possible
            (3, 0, "iphone"), (3, 1, "pie"),
        ]
        # coherence stats come from sure mentions (iphone, pie): they
        # co-occur only in doc 3 -> n_docs(PROD:iphone, FOOD:pie) = 1.
        # doc 1's "apple": context {PROD:iphone}; neither candidate
        # co-occurs with it in the SURE table -> both score 0 ->
        # tie-break smallest canonical_id = FOOD:apple.
        out = {(r.doc_id, r.pos): (r.canonical_id, r.score)
               for r in disambiguate_link(
                   self._tokens(rows, spark), self._dict(spark)).collect()}
        assert out[(1, 1)] == ("FOOD:apple", 0)
        assert out[(2, 1)] == ("FOOD:apple", 0)

    def test_score_counts_context_cooccurrence(self, spark):
        # make FOOD:pie co-occur with PROD:iphone in two docs, then an
        # ambiguous mention in a doc whose sure context is {PROD:iphone,
        # FOOD:pie}: both candidates score 0 except senses that appear in
        # the cooc table. Here we add a sure surface "cider" tied to
        # FOOD:apple's world via co-mention with pie.
        d = spark.createDataFrame(
            [("apple", "ORG", "ORG:apple"), ("apple", "FOOD", "FOOD:apple"),
             ("iphone", "PROD", "PROD:iphone"), ("pie", "FOOD", "FOOD:pie")],
            "surface string, label string, canonical_id string")
        rows = [
            # sure-sure co-occurrence: iphone+pie (docs 10, 11)
            (10, 0, "iphone"), (10, 1, "pie"),
            (11, 0, "iphone"), (11, 1, "pie"),
            # ambiguous doc: apple with sure context iphone
            (12, 0, "iphone"), (12, 1, "apple"),
        ]
        out = disambiguate_link(self._tokens(rows, spark), d).collect()
        mention = [r for r in out if r.doc_id == 12][0]
        # neither ORG:apple nor FOOD:apple has sure co-occurrence
        # evidence -> tie at 0, FOOD:apple wins lexically
        assert mention.canonical_id == "FOOD:apple"
        assert mention.n_cands == 2

    def test_ambiguous_only_in_output(self, spark):
        rows = [(1, 0, "iphone"), (1, 1, "apple")]
        out = disambiguate_link(self._tokens(rows, spark),
                                self._dict(spark)).collect()
        assert {r.surface for r in out} == {"apple"}


class TestLabelPropagation:
    def test_two_cliques_converge(self, spark):
        # two triangles joined by one weak bridge: LPA with 3 rounds
        # assigns each triangle one community
        edges = spark.createDataFrame(
            [("a", "b", 5.0), ("b", "c", 5.0), ("a", "c", 5.0),
             ("x", "y", 5.0), ("y", "z", 5.0), ("x", "z", 5.0),
             ("c", "x", 1.0)],
            "src string, dst string, w double")
        out = {r.node: r.community
               for r in label_propagation(edges, weight_col="w",
                                          rounds=3).collect()}
        assert out["a"] == out["b"] == out["c"]
        assert out["x"] == out["y"] == out["z"]

    def test_driver_fast_path_matches_distributed(self, spark,
                                                  monkeypatch):
        # r6: integral-weight driver rounds vs the window loop; cap=0
        # forces the distributed branch. Fractional weights must always
        # take the distributed branch (is_integer guard).
        from saber_spark.operators import graph
        edges = spark.createDataFrame(
            [("a", "b", 5.0), ("b", "c", 5.0), ("a", "c", 5.0),
             ("x", "y", 5.0), ("y", "z", 5.0), ("x", "z", 5.0),
             ("c", "x", 1.0), ("z", "a", 2.0)],
            "src string, dst string, w double")
        fast = sorted(map(tuple, graph.label_propagation(
            edges, weight_col="w", rounds=3).collect()))
        monkeypatch.setattr(graph, "DRIVER_EDGE_CAP", 0)
        slow = sorted(map(tuple, graph.label_propagation(
            edges, weight_col="w", rounds=3).collect()))
        assert fast == slow and len(fast) == 6

    def test_unweighted_tie_break_is_min_label(self, spark):
        # star: center 'm' sees neighbors {a, z} with equal weight -> 'a'
        edges = spark.createDataFrame(
            [("m", "a"), ("m", "z")], "src string, dst string")
        out = {r.node: r.community
               for r in label_propagation(edges, rounds=1).collect()}
        assert out["m"] == "a"
        # leaves adopt the center's initial label
        assert out["a"] == "m" and out["z"] == "m"

    def test_deterministic_across_runs(self, spark):
        edges = spark.createDataFrame(
            [(f"n{i}", f"n{(i * 3) % 11}", float(1 + i % 4))
             for i in range(11) if i != (i * 3) % 11],
            "src string, dst string, w double")
        r1 = sorted(map(tuple, label_propagation(
            edges, weight_col="w", rounds=3).collect()))
        r2 = sorted(map(tuple, label_propagation(
            edges, weight_col="w", rounds=3).collect()))
        assert r1 == r2


class TestOntology:
    def test_closure_chain_and_diamond(self, spark):
        hier = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "d"),   # chain depth 3
             ("x", "y1"), ("x", "y2"), ("y1", "z"), ("y2", "z")],  # diamond
            "child string, parent string")
        got = {(r.child, r.ancestor)
               for r in transitive_closure(hier).collect()}
        assert got == {
            ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
            ("c", "d"),
            ("x", "y1"), ("x", "y2"), ("x", "z"), ("y1", "z"), ("y2", "z")}

    def test_closure_tolerates_cycle(self, spark):
        hier = spark.createDataFrame([("a", "b"), ("b", "a")],
                                     "child string, parent string")
        got = {(r.child, r.ancestor)
               for r in transitive_closure(hier, max_depth=4).collect()}
        assert got == {("a", "b"), ("b", "a")}

    def test_rollup_totals_include_descendants(self, spark):
        hier = spark.createDataFrame(
            [("leaf1", "mid"), ("leaf2", "mid"), ("mid", "root")],
            "child string, parent string")
        facts = spark.createDataFrame(
            [("leaf1", 10), ("leaf2", 5), ("root", 1), ("orphan", 7)],
            "label string, n long")
        out = {r.ancestor_type: (r.n_total, r.n_direct, r.n_types)
               for r in type_rollup(facts, hier).collect()}
        assert out["root"] == (16, 1, 3)  # mid contributes no facts
        assert out["mid"] == (15, 0, 2)
        assert out["leaf1"] == (10, 10, 1)
        assert out["orphan"] == (7, 7, 1)


class TestCrawlFrontier:
    def test_topk_by_authority_and_staleness(self, spark):
        pages = spark.createDataFrame(
            [(f"https://h1.org/p{i}", f"2024-01-01 00:00:{i:02d}")
             for i in range(5)]
            + [("https://h2.org/only", "2024-01-01 00:00:00")],
            "url string, ts string").select(
                "url", F.to_timestamp("ts").alias("warc_ts"))
        edges = spark.createDataFrame(
            [("a.org", "h1.org"), ("b.org", "h1.org"), ("a.org", "h2.org")],
            "src_host string, dst_host string")
        out = crawl_frontier(pages, edges, k=2)
        rows = out.collect()
        by_host = {}
        for r in rows:
            by_host.setdefault(r.host, []).append(r)
        assert len(by_host["h1.org"]) == 2          # top-k enforced
        assert all(r.in_deg == 2 for r in by_host["h1.org"])
        # oldest page (largest age) ranks first within the host
        first = [r for r in by_host["h1.org"] if r.rk == 1][0]
        assert first.url.endswith("/p0")
        assert by_host["h2.org"][0].in_deg == 1

    def test_zero_indeg_host_still_scheduled(self, spark):
        pages = spark.createDataFrame(
            [("https://lonely.org/x", "2024-01-01 00:00:00"),
             ("https://lonely.org/y", "2024-01-01 00:01:00")],
            "url string, ts string").select(
                "url", F.to_timestamp("ts").alias("warc_ts"))
        edges = spark.createDataFrame(
            [], "src_host string, dst_host string")
        rows = crawl_frontier(pages, edges, k=3).collect()
        assert len(rows) == 2
        assert all(r.in_deg == 0 for r in rows)
        # newest page has age 0 -> priority 0, ranked last
        assert [r.url for r in sorted(rows, key=lambda r: r.rk)] == [
            "https://lonely.org/x", "https://lonely.org/y"]


class TestTypedTriples:
    def _tagged(self, spark, rows):
        return spark.createDataFrame(
            rows, "doc_id long, pos long, token string, canonical_id string")

    def test_predicate_is_most_frequent_between_token(self, spark):
        from saber_spark.operators.triples import typed_triples
        # E1 .. binds .. E2 twice, E1 .. blocks .. E2 once
        rows = []
        for d, verb in [(1, "binds"), (2, "binds"), (3, "blocks")]:
            rows += [(d, 0, "x", "E1"), (d, 1, verb, None), (d, 2, "y", "E2")]
        out = typed_triples(self._tagged(spark, rows), k=5).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.subj, r.pred, r.obj) == ("E1", "binds", "E2")
        assert r.n_pairs == 3 and r.n_docs == 3 and r.pred_freq == 2

    def test_stopwords_excluded_and_tie_break(self, spark):
        from saber_spark.operators.triples import typed_triples
        rows = [(1, 0, "x", "E1"), (1, 1, "the", None), (1, 2, "aa", None),
                (1, 3, "bb", None), (1, 4, "y", "E2")]
        out = typed_triples(self._tagged(spark, rows), k=9,
                            stopwords=["the"]).collect()
        assert out[0].pred == "aa"  # tie between aa/bb at freq 1 -> min

    def test_pair_without_content_tokens_emits_nothing(self, spark):
        from saber_spark.operators.triples import typed_triples
        rows = [(1, 0, "x", "E1"), (1, 1, "the", None), (1, 2, "y", "E2"),
                (2, 0, "x", "E1"), (2, 1, "y", "E2")]
        out = typed_triples(self._tagged(spark, rows), k=9,
                            stopwords=["the"]).collect()
        assert out == []

    def test_window_limit_and_direction(self, spark):
        from saber_spark.operators.triples import typed_triples
        # E2 follows E1 beyond k -> no pair; reversed order makes E2 subj
        rows = [(1, 0, "a", "E1")] + [(1, i, "w", None) for i in range(1, 12)] \
            + [(1, 12, "b", "E2")] \
            + [(2, 0, "b", "E2"), (2, 1, "rel", None), (2, 2, "a", "E1")]
        out = typed_triples(self._tagged(spark, rows), k=10).collect()
        assert len(out) == 1
        assert (out[0].subj, out[0].obj) == ("E2", "E1")


class TestTripleHistory:
    def _obs(self, spark, snaps, key=("s", "p", "o")):
        rows = [(key[0], key[1], key[2], s) for s in snaps]
        return spark.createDataFrame(
            rows, "subj string, pred string, obj string, snap long")

    def test_islands_split_on_gaps(self, spark):
        from saber_spark.operators.triples import triple_history
        out = sorted(
            (r.valid_from, r.valid_to, r.n_snaps)
            for r in triple_history(self._obs(spark, [3, 4, 5, 8, 9])).collect())
        assert out == [(3, 5, 3), (8, 9, 2)]

    def test_single_snapshot_and_duplicates(self, spark):
        from saber_spark.operators.triples import triple_history
        out = triple_history(self._obs(spark, [7, 7, 7])).collect()
        assert [(r.valid_from, r.valid_to, r.n_snaps)
                for r in out] == [(7, 7, 1)]

    def test_multiple_keys_independent(self, spark):
        from saber_spark.operators.triples import triple_history
        df = spark.createDataFrame(
            [("a", "p", "x", 1), ("a", "p", "x", 2),
             ("b", "p", "x", 1), ("b", "p", "x", 3)],
            "subj string, pred string, obj string, snap long")
        out = {(r.subj, r.valid_from, r.valid_to)
               for r in triple_history(df).collect()}
        assert out == {("a", 1, 2), ("b", 1, 1), ("b", 3, 3)}


class TestLinkPrediction:
    def test_adamic_adar_scores_and_anti_join(self, spark):
        from saber_spark.operators.graph import link_prediction
        # path a-z-b plus hub h connected to a,b,c,d: (a,b) share z (deg 2)
        # and h (deg 4); (a,c) share only h
        edges = spark.createDataFrame(
            [("a", "z"), ("z", "b"),
             ("h", "a"), ("h", "b"), ("h", "c"), ("h", "d")],
            "src string, dst string")
        out = {(r.a, r.b): (r.n_common, r.aa_score)
               for r in link_prediction(edges, top_k=50).collect()}
        import math
        aa_z = 1 / math.log(2)
        aa_h = 1 / math.log(4)
        assert out[("a", "b")] == (2, round(aa_z + aa_h, 6))
        assert out[("a", "c")] == (1, round(aa_h, 6))
        # existing edges never appear as candidates
        assert ("a", "z") not in out and ("h", "a") not in out

    def test_top_k_and_ordering(self, spark):
        from saber_spark.operators.graph import link_prediction
        edges = spark.createDataFrame(
            [("h", c) for c in "abcdefg"], "src string, dst string")
        out = link_prediction(edges, top_k=3).collect()
        assert len(out) == 3
        # all pairs share exactly the hub -> equal scores -> (a ASC, b ASC)
        assert [(r.a, r.b) for r in out] == [("a", "b"), ("a", "c"),
                                             ("a", "d")]


class TestTrendingNodes:
    def _obs(self, spark, rows):
        return spark.createDataFrame(rows, "node string, snap long")

    def test_growth_on_consecutive_snaps(self, spark):
        from saber_spark.operators.graph import trending_nodes
        rows = [("e", 1)] * 2 + [("e", 2)] * 6 + [("e", 3)] * 3
        out = {r.snap: (r.prev_n, r.growth)
               for r in trending_nodes(self._obs(spark, rows)).collect()}
        assert out[1] == (0, None)
        assert out[2] == (2, 3.0)
        assert out[3] == (6, 0.5)

    def test_gap_reports_zero_prev_and_null_growth(self, spark):
        from saber_spark.operators.graph import trending_nodes
        rows = [("e", 1)] * 4 + [("e", 5)] * 8
        out = {r.snap: (r.prev_n, r.growth)
               for r in trending_nodes(self._obs(spark, rows)).collect()}
        assert out[5] == (0, None)  # absent snaps 2-4: no invented rate

    def test_min_prev_filters_new_nodes(self, spark):
        from saber_spark.operators.graph import trending_nodes
        rows = [("new", 2)] * 9 + [("old", 1)] * 2 + [("old", 2)] * 4
        out = trending_nodes(self._obs(spark, rows), min_prev=1).collect()
        assert [(r.node, r.snap, r.growth) for r in out] == [("old", 2, 2.0)]


class TestKMeans:
    def _emb(self, spark, rows):
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def test_two_obvious_clusters(self, spark):
        from saber_spark.operators.cluster import kmeans_assign
        rows = ([(i, [10.0 + (i % 3) * 0.01, 10.0]) for i in range(6)]
                + [(i, [-10.0, -10.0 - (i % 3) * 0.01])
                   for i in range(6, 12)])
        out = {r.vec_id: r.cluster
               for r in kmeans_assign(self._emb(spark, rows), k=2,
                                      iterations=3).collect()}
        lo = {out[i] for i in range(6)}
        hi = {out[i] for i in range(6, 12)}
        assert len(lo) == 1 and len(hi) == 1 and lo != hi

    def test_deterministic_across_runs(self, spark):
        from saber_spark.operators.cluster import kmeans_assign
        rows = [(i, [float((i * 7) % 5), float((i * 3) % 4),
                     float(i % 3)]) for i in range(30)]
        df = self._emb(spark, rows)
        r1 = sorted(map(tuple, kmeans_assign(df, k=3, iterations=2).collect()))
        r2 = sorted(map(tuple, kmeans_assign(df, k=3, iterations=2).collect()))
        assert r1 == r2

    def test_driver_fast_path_matches_distributed(self, spark):
        # r6: exact-integer Lloyd's on the driver vs the per-round job
        # loop; disabling auto-broadcast forces the distributed branch
        from saber_spark.operators.cluster import kmeans_assign
        rows = [(i, [float((i * 11) % 7), float((i * 5) % 6),
                     float(i % 4)]) for i in range(40)]
        df = self._emb(spark, rows)
        fast = sorted(map(tuple, kmeans_assign(df, k=3,
                                               iterations=3).collect()))
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            slow = sorted(map(tuple, kmeans_assign(
                df, k=3, iterations=3).collect()))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        assert fast == slow and len(fast) == 40

    def test_dist2_is_exact_integer(self, spark):
        from saber_spark.operators.cluster import kmeans_assign
        rows = [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0]),
                (3, [5.0, 5.0])]
        out = kmeans_assign(self._emb(spark, rows), k=2,
                            iterations=1).collect()
        assert all(isinstance(r.dist2, int) and r.dist2 >= 0 for r in out)

    def test_int_mean_rounding(self):
        from saber_spark.operators.cluster import _int_mean
        assert _int_mean(5, 2) == 3       # 2.5 -> 3 (half away from zero)
        assert _int_mean(-5, 2) == -3     # -2.5 -> -3
        assert _int_mean(4, 2) == 2
        assert _int_mean(-7, 3) == -2     # -2.33 -> -2

    def test_raises_when_fewer_than_k(self, spark):
        from saber_spark.operators.cluster import kmeans_assign
        with pytest.raises(ValueError):
            kmeans_assign(self._emb(spark, [(0, [1.0])]), k=3,
                          iterations=1).collect()
