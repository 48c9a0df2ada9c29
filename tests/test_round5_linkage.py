"""Round-5 continuation batch: Fellegi-Sunter probabilistic record
linkage and multi-pass sorted-neighborhood blocking."""

import math

import pytest
from pyspark.sql import functions as F


class TestFellegiSunter:
    def _pairs(self, spark, rows):
        # (a, b, f1, f2, labeled, is_match)
        return spark.createDataFrame(
            rows, "a string, b string, f1 boolean, f2 boolean, "
                  "labeled boolean, is_match boolean")

    def test_weights_match_hand_computation(self, spark):
        from saber_spark.operators.canonicalize import fellegi_sunter
        # labeled: 2 matches (f1 agree both; f2 agree once),
        #          2 non-matches (f1 agree once; f2 never)
        rows = [
            ("m1a", "m1b", True, True, True, True),
            ("m2a", "m2b", True, False, True, True),
            ("u1a", "u1b", True, False, True, False),
            ("u2a", "u2b", False, False, True, False),
            ("x1a", "x1b", True, True, False, False),   # scored only
        ]
        out = {r.a: r for r in fellegi_sunter(
            self._pairs(spark, rows), ["f1", "f2"]).collect()}
        # Laplace: m1=(2+1)/4, u1=(1+1)/4, m2=(1+1)/4, u2=(0+1)/4
        m1, u1, m2, u2 = 3 / 4, 2 / 4, 2 / 4, 1 / 4
        prior = math.log2((2 + 1) / (2 + 1))  # 0
        w_x1 = prior + math.log2(m1 / u1) + math.log2(m2 / u2)
        assert out["x1a"].match_weight == pytest.approx(
            round(w_x1, 6), abs=1e-6)
        p = 1 / (1 + 2 ** -w_x1)
        assert out["x1a"].match_probability == pytest.approx(
            round(p, 6), abs=1e-6)
        # disagreement weights on the all-false pair
        w_u2 = prior + math.log2((1 - m1) / (1 - u1)) \
            + math.log2((1 - m2) / (1 - u2))
        assert out["u2a"].match_weight == pytest.approx(
            round(w_u2, 6), abs=1e-6)

    def test_three_way_decision_bands(self, spark):
        from saber_spark.operators.canonicalize import fellegi_sunter
        # strong agreement evidence -> link; strong disagreement ->
        # non-link; pick thresholds so the mixed pair lands in review
        rows = [("m%da" % i, "m%db" % i, True, True, True, True)
                for i in range(8)]
        rows += [("u%da" % i, "u%db" % i, False, False, True, False)
                 for i in range(8)]
        rows += [("q1", "q2", True, True, False, False),
                 ("q3", "q4", False, False, False, False),
                 ("q5", "q6", True, False, False, False)]
        out = {r.a: r.decision for r in fellegi_sunter(
            self._pairs(spark, rows), ["f1", "f2"],
            upper=2.0, lower=-2.0).collect()}
        assert out["q1"] == "link"
        assert out["q3"] == "non-link"
        assert out["q5"] == "possible-link"

    def test_all_pairs_scored_including_labeled(self, spark):
        from saber_spark.operators.canonicalize import fellegi_sunter
        rows = [("a", "b", True, True, True, True),
                ("c", "d", False, False, True, False),
                ("e", "f", True, False, False, False)]
        out = fellegi_sunter(self._pairs(spark, rows), ["f1", "f2"])
        assert out.count() == 3
        assert set(out.columns) == {"a", "b", "f1", "f2", "labeled",
                                    "is_match", "match_weight",
                                    "match_probability", "decision"}

    def test_laplace_smoothing_keeps_weights_finite(self, spark):
        from saber_spark.operators.canonicalize import fellegi_sunter
        # f2 agrees on NO labeled pair -> u2 would be 0 without
        # smoothing -> infinite weight; Laplace keeps it finite
        rows = [("a", "b", True, False, True, True),
                ("c", "d", False, False, True, False),
                ("e", "f", True, True, False, False)]
        out = {r.a: r for r in fellegi_sunter(
            self._pairs(spark, rows), ["f1", "f2"]).collect()}
        assert math.isfinite(out["e"].match_weight)
        assert 0.0 < out["e"].match_probability < 1.0


class TestSortedNeighborhood:
    def _recs(self, spark, names):
        return spark.createDataFrame([(n,) for n in names], "name string")

    def test_window_pairs_on_sorted_order(self, spark):
        from saber_spark.operators.canonicalize import sorted_neighborhood
        names = ["apple", "apply", "banana", "cherry", "date"]
        out = sorted_neighborhood(
            self._recs(spark, names),
            {"fwd": lambda c: F.col(c)}, window=3).collect()
        got = {(r.a, r.b, r.gap) for r in out}
        # sorted order is the list order; window=3 -> gaps 1 and 2
        expect = set()
        for i in range(len(names)):
            for d in (1, 2):
                if i + d < len(names):
                    expect.add((names[i], names[i + d], d))
        assert got == expect

    def test_multi_pass_reversed_key_recovers_first_char_typo(self, spark):
        from saber_spark.operators.canonicalize import sorted_neighborhood
        # "zpple" is a first-char typo of "apple": far away in forward
        # order (with enough separators between) but adjacent reversed
        names = ["apple", "banana", "cherry", "mango", "zpple"]
        out = sorted_neighborhood(
            self._recs(spark, names),
            {"fwd": lambda c: F.col(c),
             "rev": lambda c: F.reverse(F.col(c))}, window=2)
        rev_pairs = {(r.a, r.b) for r in out.collect() if r["pass"] == "rev"}
        assert ("apple", "zpple") in rev_pairs or \
            ("zpple", "apple") in rev_pairs
        fwd_pairs = {(r.a, r.b) for r in out.collect() if r["pass"] == "fwd"}
        assert ("apple", "zpple") not in fwd_pairs

    def test_candidate_volume_is_linear(self, spark):
        from saber_spark.operators.canonicalize import sorted_neighborhood
        names = [f"n{i:04d}" for i in range(200)]
        out = sorted_neighborhood(self._recs(spark, names),
                                  {"fwd": lambda c: F.col(c)}, window=4)
        # gap-d pairs number n-d, d = 1..w-1 -> n*(w-1) - sum(1..w-1)
        assert out.count() == 200 * 3 - (1 + 2 + 3)

    def test_rank_independent_of_partitioning(self, spark):
        from saber_spark.operators.canonicalize import sorted_neighborhood
        names = [f"x{i:03d}" for i in range(50)]
        a = sorted_neighborhood(self._recs(spark, names).repartition(7),
                                {"p": lambda c: F.col(c)}, window=3,
                                num_ranges=3)
        b = sorted_neighborhood(self._recs(spark, names).coalesce(1),
                                {"p": lambda c: F.col(c)}, window=3,
                                num_ranges=13)
        assert {tuple(r) for r in a.collect()} == \
            {tuple(r) for r in b.collect()}

    def test_window_one_raises(self, spark):
        from saber_spark.operators.canonicalize import sorted_neighborhood
        with pytest.raises(ValueError, match="window"):
            sorted_neighborhood(self._recs(spark, ["a"]),
                                {"p": lambda c: F.col(c)}, window=1)


class TestFellegiSunterEM:
    def _pairs(self, spark, rows):
        return spark.createDataFrame(
            rows, "a string, b string, f1 boolean, f2 boolean")

    def test_em_separates_bimodal_pairs(self, spark):
        from saber_spark.operators.canonicalize import fellegi_sunter_em
        rows = [("m%d" % i, "m%dx" % i, True, True) for i in range(10)]
        rows += [("u%d" % i, "u%dx" % i, False, False) for i in range(10)]
        out = {r.a: r for r in fellegi_sunter_em(
            self._pairs(spark, rows), ["f1", "f2"],
            iterations=3).collect()}
        assert all(out["m%d" % i].decision == "link" for i in range(10))
        assert all(out["u%d" % i].decision == "non-link"
                   for i in range(10))
        assert out["m0"].match_probability > 0.9
        assert out["u0"].match_probability < 0.1

    def test_one_iteration_matches_hand_em(self, spark):
        from saber_spark.operators.canonicalize import fellegi_sunter_em
        # 3 pairs, one field; replicate the E/M arithmetic in python
        rows = [("a", "b", True, True), ("c", "d", True, True),
                ("e", "f", False, False)]
        out = {r.a: r.match_weight for r in fellegi_sunter_em(
            self._pairs(spark, rows), ["f1"], iterations=1).collect()}
        lam, m, u = 0.5, 0.8, 0.2
        rs = []
        for g in (1, 1, 0):
            pm = m if g else 1 - m
            pu = u if g else 1 - u
            rs.append((lam * pm) / ((lam * pm) + ((1 - lam) * pu)))
        sr, n = sum(rs), 3
        lam2 = (sr + 1) / (n + 2)
        srg = rs[0] + rs[1]
        tg = 2
        m2 = (srg + 1) / (sr + 2)
        u2 = (tg - srg + 1) / ((n - sr) + 2)
        w_agree = math.log2(lam2 / (1 - lam2)) + math.log2(m2 / u2)
        assert out["a"] == pytest.approx(round(w_agree, 6), abs=2e-6)
        w_dis = math.log2(lam2 / (1 - lam2)) \
            + math.log2((1 - m2) / (1 - u2))
        assert out["e"] == pytest.approx(round(w_dis, 6), abs=2e-6)

    def test_no_label_columns_required(self, spark):
        from saber_spark.operators.canonicalize import fellegi_sunter_em
        out = fellegi_sunter_em(
            self._pairs(spark, [("a", "b", True, False)]), ["f1", "f2"])
        assert set(out.columns) == {"a", "b", "f1", "f2", "match_weight",
                                    "match_probability", "decision"}

    def test_partitioning_invariance(self, spark):
        from saber_spark.operators.canonicalize import fellegi_sunter_em
        rows = [("p%d" % i, "q%d" % i, i % 2 == 0, i % 3 == 0)
                for i in range(30)]
        a = fellegi_sunter_em(self._pairs(spark, rows).repartition(8),
                              ["f1", "f2"], iterations=2)
        b = fellegi_sunter_em(self._pairs(spark, rows).coalesce(1),
                              ["f1", "f2"], iterations=2)
        assert {tuple(r) for r in a.collect()} == \
            {tuple(r) for r in b.collect()}


class TestRendezvousShards:
    def _docs(self, spark, n):
        return spark.createDataFrame([(i,) for i in range(n)],
                                     "doc_id long")

    def test_assignment_matches_reference_md5_argmax(self, spark):
        import hashlib

        from saber_spark.operators.packing import rendezvous_shards
        out = {r.doc_id: r.shard for r in rendezvous_shards(
            self._docs(spark, 20), n_shards=4).collect()}

        def ref_shard(key, n):
            ws = [(int(hashlib.md5(f"{key}#{s}".encode())
                       .hexdigest()[:8], 16), -s) for s in range(n)]
            return -max(ws)[1]

        for k in range(20):
            assert out[k] == ref_shard(k, 4)

    def test_all_shards_used_and_roughly_balanced(self, spark):
        from saber_spark.operators.packing import rendezvous_shards
        out = rendezvous_shards(self._docs(spark, 2000), n_shards=4) \
            .groupBy("shard").count().collect()
        counts = {r.shard: r["count"] for r in out}
        assert set(counts) == {0, 1, 2, 3}
        assert min(counts.values()) > 2000 / 4 * 0.7
        assert max(counts.values()) < 2000 / 4 * 1.3

    def test_resize_moves_about_one_over_n_plus_one(self, spark):
        from saber_spark.operators.packing import rendezvous_shards
        out = rendezvous_shards(self._docs(spark, 3000), n_shards=4,
                                compare_shards=5)
        rows = out.collect()
        moved = sum(1 for r in rows if r.moved)
        # expected fraction exactly 1/5 in distribution; loose band
        assert 0.12 < moved / 3000 < 0.28
        # every move is INTO the new shard (HRW property: an existing
        # key only moves if the new shard wins it)
        assert all(r.shard_resized == 4 for r in rows if r.moved)
        # unmoved keys keep their shard
        assert all(r.shard == r.shard_resized
                   for r in rows if not r.moved)

    def test_single_shard_and_validation(self, spark):
        from saber_spark.operators.packing import rendezvous_shards
        out = rendezvous_shards(self._docs(spark, 5), n_shards=1).collect()
        assert all(r.shard == 0 for r in out)
        with pytest.raises(ValueError, match="n_shards"):
            rendezvous_shards(self._docs(spark, 5), n_shards=0)


class TestKGAlign:
    def _kg(self, spark, rows):
        return spark.createDataFrame(
            rows, "subj string, pred string, obj string")

    def test_recovers_known_alignment(self, spark):
        from saber_spark.operators.triples import kg_align
        a = self._kg(spark, [
            ("c1", "nation", "de"), ("c1", "band", "b7"),
            ("c2", "nation", "fr"), ("c2", "band", "b9"),
            ("c3", "nation", "de"), ("c3", "band", "b4")])
        b = self._kg(spark, [
            ("w1", "nation", "de"), ("w1", "band", "b7"),
            ("w2", "nation", "fr"), ("w2", "band", "b9"),
            ("w2", "host", "h1")])
        got = {(r.ent_a, r.ent_b): r for r in
               kg_align(a, b, threshold=0.5).collect()}
        assert set(got) == {("c1", "w1"), ("c2", "w2")}
        assert got[("c1", "w1")].jaccard == 1.0
        # c2: shared 2, n_a 2, n_b 3 -> 2/3
        assert got[("c2", "w2")].jaccard == pytest.approx(
            round(2 / 3, 6), abs=1e-6)

    def test_mutual_best_drops_one_sided_matches(self, spark):
        from saber_spark.operators.triples import kg_align
        # both a1 and a2 match b1 equally; mutual-best keeps only the
        # deterministic (score DESC, partner ASC) winner a1
        a = self._kg(spark, [("a1", "p", "x"), ("a2", "p", "x")])
        b = self._kg(spark, [("b1", "p", "x")])
        got = kg_align(a, b, threshold=0.1).collect()
        assert [(r.ent_a, r.ent_b) for r in got] == [("a1", "b1")]
        loose = kg_align(a, b, threshold=0.1, mutual=False).collect()
        assert len(loose) == 2

    def test_threshold_filters(self, spark):
        from saber_spark.operators.triples import kg_align
        a = self._kg(spark, [("a1", "p", "x"), ("a1", "p", "y"),
                             ("a1", "p", "z"), ("a1", "p", "w")])
        b = self._kg(spark, [("b1", "p", "x"), ("b1", "q", "q1")])
        # jaccard = 1 / (4 + 2 - 1) = 0.2
        assert kg_align(a, b, threshold=0.5).count() == 0
        assert kg_align(a, b, threshold=0.2).count() == 1

    def test_max_df_drops_hub_facts_consistently(self, spark):
        from saber_spark.operators.triples import kg_align
        # 'type person' is shared by everyone -> df over the cap on the
        # a-side; with the cut, scores use only the distinctive facts
        a = self._kg(spark, [("a%d" % i, "type", "person")
                             for i in range(5)]
                     + [("a0", "born", "1970")])
        b = self._kg(spark, [("b0", "type", "person"),
                             ("b0", "born", "1970")])
        got = kg_align(a, b, threshold=0.5, max_df=3).collect()
        assert [(r.ent_a, r.ent_b, r.n_shared, r.n_a, r.n_b)
                for r in got] == [("a0", "b0", 1, 1, 1)]


class TestPartitionQuality:
    def test_range_strategy_hand_computed(self, spark):
        from saber_spark.operators.graph import partition_quality
        # nodes sorted: n1 n2 n3 n4 -> ntile(2): {n1,n2}=0, {n3,n4}=1
        edges = spark.createDataFrame(
            [("n1", "n2"), ("n3", "n4"), ("n1", "n3"), ("n2", "n4")],
            "src string, dst string")
        rows = {r.strategy: r for r in
                partition_quality(edges, k=2).collect()}
        rng = rows["range"]
        assert rng.n_nodes == 4 and rng.n_edges == 4
        assert rng.n_cut == 2 and rng.cut_fraction == 0.5
        assert rng.max_load == 2 and rng.min_load == 2
        assert rng.imbalance == 1.0

    def test_hash_strategy_matches_reference_md5(self, spark):
        import hashlib

        from saber_spark.operators.graph import partition_quality
        edges = spark.createDataFrame(
            [("x%d" % i, "x%d" % ((i + 1) % 6)) for i in range(6)],
            "src string, dst string")

        def part(n):
            return int(hashlib.md5(n.encode()).hexdigest()[:8], 16) % 3

        expect_cut = sum(
            1 for i in range(6)
            if part("x%d" % i) != part("x%d" % ((i + 1) % 6)))
        got = {r.strategy: r for r in
               partition_quality(edges, k=3).collect()}
        assert got["hash"].n_cut == expect_cut

    def test_custom_strategy(self, spark):
        from saber_spark.operators.graph import partition_quality
        edges = spark.createDataFrame(
            [("a.h1", "b.h1"), ("a.h1", "c.h2"), ("b.h1", "d.h2")],
            "src string, dst string")
        out = partition_quality(
            edges, k=2,
            strategies={"host": lambda c: F.when(
                F.substring_index(c, ".", -1) == "h1",
                F.lit(0)).otherwise(F.lit(1))}).collect()
        assert out[0].strategy == "host"
        # only the two cross-host edges are cut
        assert out[0].n_cut == 2


class TestLogregQuality:
    def _feats(self, spark, rows):
        return spark.createDataFrame(
            rows, "doc long, x1 double, x2 double, y int")

    def test_one_step_matches_hand_gradient(self, spark):
        from saber_spark.operators.classify import logreg_fit_predict
        rows = [(0, 1.0, 2.0, 1), (1, 1.0, -1.0, 0), (2, 1.0, 0.5, 1)]
        out = {r.doc: r for r in logreg_fit_predict(
            self._feats(spark, rows), ["x1", "x2"], label_col="y",
            lr=1.0, steps=1, id_cols=["doc"]).collect()}
        # w starts 0 -> sigmoid = 0.5; grad_j = sum((y-0.5)*x_j)/n
        w1 = ((1 - 0.5) * 1.0 + (0 - 0.5) * 1.0 + (1 - 0.5) * 1.0) / 3
        w2 = ((1 - 0.5) * 2.0 + (0 - 0.5) * -1.0 + (1 - 0.5) * 0.5) / 3
        for doc, x1, x2, y in rows:
            z = w1 * x1 + w2 * x2
            p = 1.0 / (1.0 + math.exp(-z))
            assert out[doc].p_hat == pytest.approx(round(p, 6), abs=1e-6)
            assert out[doc].pred == (p >= 0.5)

    def test_separable_data_classified_after_steps(self, spark):
        from saber_spark.operators.classify import logreg_fit_predict
        rows = [(i, 1.0, 1.0 if i % 2 == 0 else -1.0, 1 if i % 2 == 0
                 else 0) for i in range(40)]
        out = logreg_fit_predict(self._feats(spark, rows), ["x1", "x2"],
                                 label_col="y", lr=2.0, steps=5,
                                 id_cols=["doc"]).collect()
        assert all((r.pred and r.y == 1) or (not r.pred and r.y == 0)
                   for r in out)

    def test_partitioning_invariance(self, spark):
        from saber_spark.operators.classify import logreg_fit_predict
        rows = [(i, 1.0, float(i % 5) - 2.0, i % 3 % 2)
                for i in range(30)]
        a = logreg_fit_predict(self._feats(spark, rows).repartition(8),
                               ["x1", "x2"], label_col="y", steps=3,
                               id_cols=["doc"])
        b = logreg_fit_predict(self._feats(spark, rows).coalesce(1),
                               ["x1", "x2"], label_col="y", steps=3,
                               id_cols=["doc"])
        assert {(r.doc, r.p_hat, r.pred) for r in a.collect()} == \
            {(r.doc, r.p_hat, r.pred) for r in b.collect()}

    def test_empty_features_raise(self, spark):
        from saber_spark.operators.classify import logreg_fit_predict
        with pytest.raises(ValueError, match="feature_cols"):
            logreg_fit_predict(self._feats(spark, [(0, 1.0, 1.0, 1)]),
                               [], label_col="y")
